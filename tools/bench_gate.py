"""Relative perf-regression gate (analog of the reference's PR benchmark judge).

The reference judges every PR's benchmark suite against `origin/main`
(`/root/reference/.github/workflows/Benchmark.yml`,
`/root/reference/benchmark/benchmarks.jl`) — a *relative* gate with no
absolute numbers.  This tool is the equivalent for this repo: compare a
bench.py result (same methodology) against the committed gate anchor and
FAIL (exit 1) when throughput regresses beyond the tolerance band.

Anchor file (`BENCH_GATE_ANCHOR.json`, committed): written intentionally via
`--update` after a verified improvement — never refreshed implicitly, so an
accidental regression cannot silently rebase the gate.

Usage:
  python tools/bench_gate.py --current bench_out.json     # gate a result
  python tools/bench_gate.py --run                        # run bench.py, gate it
  python tools/bench_gate.py --current out.json --update  # rebase the anchor

Exit codes: 0 pass, 1 regression, 2 usage/anchor errors.
Gated metrics: the headline samples/s plus any extras listed in the anchor's
"extras" map (e.g. logprob_evals_per_sec).  Tolerance default 0.85 (15%
band — remote-tunnel bench noise is ~5-8%; see bench.py methodology notes).
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

ANCHOR_PATH = "BENCH_GATE_ANCHOR.json"


def load_bench_result(path: str | None, run: bool) -> dict:
    if run:
        out = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True, timeout=900
        )
        if out.returncode != 0:
            print(f"bench.py failed rc={out.returncode}\n{out.stderr[-2000:]}", file=sys.stderr)
            sys.exit(2)
        line = out.stdout.strip().splitlines()[-1]
        return json.loads(line)
    with open(path) as f:
        text = f.read().strip()
    # accept either the raw bench line or a driver BENCH_r*.json wrapper
    d = json.loads(text.splitlines()[0] if text.startswith("{") else text)
    if "parsed" in d:
        d = d["parsed"]
    return d


def dig(d: dict, dotted: str):
    """Resolve a dotted path ("exact_trace_config.train_samples_per_sec")."""
    cur = d
    for part in dotted.split("."):
        if not isinstance(cur, dict):
            return None
        cur = cur.get(part)
    return cur


#: Metrics the anchor tracks beyond the headline.  Dotted paths into bench
#: extras; direction "lower" marks cost metrics (us/NFE) where a regression
#: is an INCREASE.  Round-4 verdict item 5: the gate previously guarded only
#: the headline, so a forward-kernel-only regression (r4 finding #2, -10%
#: us/NFE) rode through on the adjoint improvement.
GATED_EXTRAS = (
    ("logprob_evals_per_sec", "higher"),
    ("field_evals_per_sec", "higher"),
    ("exact_trace_config.train_samples_per_sec", "higher"),
    ("fused_kernel_roofline.measured_us", "lower"),
    ("adjoint_kernel_roofline.derived_us_per_nfe", "lower"),
)

#: TABULAR artifact metrics (per config), gated when --tabular is given.
GATED_TABULAR = (
    "power6.train_samples_per_sec",
    "miniboone43.train_samples_per_sec",
)


def gate(current: dict, anchor: dict, tol: float, tabular: dict | None = None) -> list[str]:
    """Return a list of failure strings (empty = pass)."""
    failures = []

    def check(name, cur, ref, direction="higher"):
        if cur is None or ref is None:
            failures.append(f"{name}: missing value (cur={cur}, anchor={ref})")
            return
        if direction == "lower":
            ratio = ref / cur if cur else float("inf")  # >1 = improvement
        else:
            ratio = cur / ref if ref else float("inf")
        status = "OK " if ratio >= tol else "REGRESSION"
        print(
            f"  {status} {name} [{direction}]: {cur:.1f} vs anchor {ref:.1f} "
            f"(x{ratio:.3f}, floor x{tol})"
        )
        if ratio < tol:
            failures.append(f"{name} regressed to {ratio:.3f}x of anchor (floor {tol}x)")

    check("train_samples_per_sec_per_chip", current.get("value"), anchor.get("value"))
    cur_extras = current.get("extras", {})
    for key, ref in anchor.get("extras", {}).items():
        direction = "higher"
        if isinstance(ref, dict):
            direction = ref.get("direction", "higher")
            ref = ref.get("value")
        check(key, dig(cur_extras, key), ref, direction)
    if anchor.get("tabular"):
        if tabular is None:
            failures.append("anchor has a tabular section but no --tabular artifact given")
        else:
            cur_tab = tabular.get("tabular", tabular)
            for key, ref in anchor["tabular"].items():
                check("tabular." + key, dig(cur_tab, key), ref)
    return failures


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--current", default="", help="bench output JSON file")
    ap.add_argument("--run", action="store_true", help="run bench.py now")
    ap.add_argument("--anchor", default=ANCHOR_PATH)
    ap.add_argument("--tol", type=float, default=0.85)
    ap.add_argument("--update", action="store_true", help="rebase the anchor to --current")
    ap.add_argument("--tabular", default="", help="TABULAR_r*.json artifact to gate/anchor")
    args = ap.parse_args()

    if not args.current and not args.run:
        print("need --current FILE or --run", file=sys.stderr)
        sys.exit(2)
    current = load_bench_result(args.current or None, args.run)

    if args.update:
        extras = {}
        for key, direction in GATED_EXTRAS:
            v = dig(current.get("extras", {}), key)
            if v is not None:
                extras[key] = v if direction == "higher" else {"value": v, "direction": "lower"}
        anchor = {
            "metric": current.get("metric"),
            "value": current.get("value"),
            "extras": extras,
            "methodology": "bench.py on-device lax.scan, RTT-subtracted",
            "device": current.get("extras", {}).get("device"),
        }
        if args.tabular:
            with open(args.tabular) as f:
                tab = json.load(f).get("tabular", {})
            anchor["tabular"] = {
                key: dig(tab, key) for key in GATED_TABULAR if dig(tab, key) is not None
            }
        with open(args.anchor, "w") as f:
            json.dump(anchor, f, indent=1)
        print(f"anchor rebased -> {args.anchor}: {anchor['value']}")
        return

    try:
        with open(args.anchor) as f:
            anchor = json.load(f)
    except OSError:
        print(f"no anchor at {args.anchor}; create one with --update", file=sys.stderr)
        sys.exit(2)

    tabular = None
    if args.tabular:
        with open(args.tabular) as f:
            tabular = json.load(f)
    print(f"bench gate (tolerance x{args.tol}):")
    failures = gate(current, anchor, args.tol, tabular)
    if failures:
        for msg in failures:
            print(f"FAIL: {msg}", file=sys.stderr)
        sys.exit(1)
    print("bench gate: PASS")


if __name__ == "__main__":
    main()
