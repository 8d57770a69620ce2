"""Re-measure the ROUND-1 build under the current bench methodology/config.

Round-2's `vs_baseline` conflated a timing-methodology fix (on-device scan
repetition, RTT subtraction, min-of-reps — round-1 numbers were
tunnel-dominated) and a config change (tspan) with genuine speedup.  This
tool anchors the cross-round trend properly: it checks out the round-1
commit into a throwaway git worktree, imports THAT build's library, and
times it with TODAY's methodology at TODAY's config (tspan=(0,13), batch
4096, fused megakernel, reference-default tolerances).  The result is
written to BASELINE_ANCHOR.json, which bench.py divides by for
`vs_baseline`.

One TPU session; run serially with nothing else on the chip.

Usage: python tools/bench_anchor.py [--commit bbe183f]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

ROUND1_COMMIT = "bbe183f"  # "round 1: end-of-round snapshot"

_CHILD = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])  # the round-1 worktree FIRST
import jax, jax.numpy as jnp, numpy as np
import optax
import continuousnf_tpu as cnf
from continuousnf_tpu import Mode
assert cnf.__file__.startswith(sys.argv[1]), cnf.__file__

# --- current methodology (mirrors /root/repo/bench.py) ---
def _readback(tree):
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(np.asarray(leaf).ravel()[0])

def measure_rtt():
    @jax.jit
    def nop(x):
        return x + 0.0
    x = jnp.zeros((8, 128))
    _readback(nop(x))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); _readback(nop(x)); ts.append(time.perf_counter() - t0)
    return float(np.median(ts))

def time_scanned(step_fn, carry, length, rtt, reps=3):
    @jax.jit
    def run(c):
        return jax.lax.scan(lambda c, i: (step_fn(c, i), None), c, jnp.arange(length))[0]
    c = run(carry); _readback(c)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); _readback(run(c)); ts.append(time.perf_counter() - t0)
    return max(min(ts) - rtt, 1e-9) / length

# --- current config (mirrors /root/repo/bench.py) ---
nvars, naug = 8, 8
n_in = nvars + naug
batch = 4096
on_tpu = jax.default_backend() == "tpu"
nn = cnf.MLP((n_in, 3 * n_in, n_in))
icnf = cnf.construct(
    cnf.RNODE, nn, nvars, naug, tspan=(0.0, 13.0), steer_rate=0.1, lam3=1e-2,
    compute_mode=cnf.VecJacMode(fused=on_tpu),
)
ps = icnf.init(jax.random.PRNGKey(0))
xs = jax.random.uniform(jax.random.PRNGKey(1), (batch, nvars), dtype=jnp.float32)
opt = optax.lion(1e-3)
opt_state = opt.init(ps)
key = jax.random.PRNGKey(2)
rtt = measure_rtt()

def train_step(carry, i):
    ps, opt_state = carry
    l, g = jax.value_and_grad(
        lambda p: cnf.loss(icnf, Mode.TRAIN, xs, p, key=jax.random.fold_in(key, i))
    )(ps)
    updates, opt_state = opt.update(g, opt_state, ps)
    return optax.apply_updates(ps, updates), opt_state

train_dt = time_scanned(train_step, (ps, opt_state), length=12, rtt=rtt)

@jax.jit
def nfe_of(x):
    _, _, stats = cnf.inference(icnf, Mode.TRAIN, x, ps, key=key)
    return stats.nfe

print("ANCHOR " + json.dumps({
    "train_samples_per_sec_per_chip": batch / train_dt,
    "train_step_ms": train_dt * 1e3,
    "train_nfe_per_solve": int(nfe_of(xs)),
    "rtt_ms": rtt * 1e3,
    "batch": batch,
    "tspan": [0.0, 13.0],
    "backend": jax.default_backend(),
}))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commit", default=ROUND1_COMMIT)
    ap.add_argument("--out", default="BASELINE_ANCHOR.json")
    args = ap.parse_args()

    wt = "/tmp/cnf_r1_anchor"
    subprocess.run(["git", "worktree", "remove", "--force", wt],
                   capture_output=True)
    subprocess.run(["git", "worktree", "add", "--detach", wt, args.commit],
                   check=True)
    try:
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, wt],
            capture_output=True, text=True, timeout=1200,
        )
        sys.stderr.write(out.stderr[-2000:])
        line = next(
            (l for l in out.stdout.splitlines() if l.startswith("ANCHOR ")), None)
        if line is None:
            sys.stderr.write(out.stdout[-2000:])
            raise SystemExit(f"anchor child failed (rc={out.returncode})")
        anchor = json.loads(line[7:])
        anchor["commit"] = args.commit
        anchor["methodology"] = (
            "on-device lax.scan repetition, RTT-subtracted, min-of-3 dispatches"
        )
        with open(args.out, "w") as f:
            json.dump(anchor, f, indent=1)
        print(f"wrote {args.out}: {anchor['train_samples_per_sec_per_chip']:.0f} samples/s")
    finally:
        subprocess.run(["git", "worktree", "remove", "--force", wt],
                       capture_output=True)


if __name__ == "__main__":
    main()
