"""Roofline audit: counter-independent per-NFE timing of the megakernels.

Round-2's BENCH reported the fused forward kernel at 1.455 us/NFE — *below*
the repo's own analytic MXU-issue floor (3.45 us) and 5.7x below the measured
bare-XLA stage chain (8.29 us), an inconsistency the round-2 judge flagged:
either the kernel's NFE counter or the floor models must be wrong.

This audit measures per-ATTEMPT wall time without trusting the NFE counter:
cap the solver at max_steps = k for several k below the natural step count
and fit wall(k) = a + b*k.  The slope b is the true cost of one attempted
step (6 field evals for FSAL tsit5), measured purely from wall-clock deltas
of same-shape dispatches.  Cross-checking b/6 against wall/NFE validates (or
convicts) the counter; the same sweep on the unfused XLA while_loop path and
on the full grad step (forward + adjoint kernel) gives every per-NFE number
BENCH reports from one method.

Run on the real chip: python tools/roofline_audit.py [--batch 4096]
Prints one JSON line and (with --write) updates docs/ROOFLINE.md.
"""

from __future__ import annotations

import argparse
import dataclasses as dc
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def _readback(tree) -> float:
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(np.asarray(leaf).ravel()[0])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    # All caps must BIND (stay below the solve's natural accepted+rejected
    # step count, ~31 at tspan=(0,13) rtol=1e-3) or the slope fit degenerates.
    ap.add_argument("--caps", type=int, nargs="+", default=[6, 12, 18, 24])
    ap.add_argument("--scan-length", type=int, default=64,
                    help="on-device solve repetitions per timed dispatch")
    ap.add_argument("--write", action="store_true", help="write docs/ROOFLINE.md")
    args = ap.parse_args()

    import continuousnf_tpu as cnf
    from continuousnf_tpu import Mode
    from bench import measure_rtt

    nvars, naug = 8, 8
    n_in = nvars + naug
    B = args.batch
    nn = cnf.MLP((n_in, 3 * n_in, n_in))
    xs = jax.random.uniform(jax.random.PRNGKey(1), (B, nvars), dtype=jnp.float32)
    key = jax.random.PRNGKey(2)
    rtt = measure_rtt()

    def mk(fused, max_steps, exact=False):
        # tspan long enough that every cap binds (solver never finishes early).
        return cnf.construct(
            cnf.RNODE, nn, nvars, naug, tspan=(0.0, 13.0), steer_rate=0.0,
            lam3=1e-2, compute_mode=cnf.VecJacMode(fused=fused, exact_trace=exact),
            solver=cnf.SolverOptions(max_steps=max_steps),
        )

    ps = mk(True, 100).init(jax.random.PRNGKey(0))

    # Natural (uncapped) step count — every cap must stay below it to bind.
    _, _, st_nat = jax.jit(
        lambda x: cnf.inference(mk(True, 4096), Mode.TRAIN, x, ps, key=key)
    )(xs)
    natural_steps = int(st_nat.steps)
    if max(args.caps) >= natural_steps:
        print(f"WARNING: cap {max(args.caps)} >= natural steps {natural_steps};"
              " slope fit will degenerate", file=sys.stderr)

    out = {"batch": B, "rtt_ms": round(rtt * 1e3, 3),
           "backend": jax.default_backend(), "caps": args.caps,
           "natural_steps": natural_steps, "scan_length": args.scan_length}

    from bench import time_scanned

    def bwd_attempts_of(cap: int, exact: bool) -> int:
        """Measured backward attempt count for the capped grad solve
        (cnf.adjoint_stats re-runs the identical backward integration).

        Round 5: the backward controller warm-starts from the forward's
        final dt (SolveStats.dt_last), so backward attempts NO LONGER scale
        with max_steps the way forward attempts do — a wall(cap) slope
        divided by the forward NFE-per-attempt mis-prices the adjoint.  The
        adjoint fit below therefore runs in measured-backward-attempt space.
        """
        icnf = mk(True, cap, exact=exact)
        _, bwd = jax.jit(
            lambda x: cnf.adjoint_stats(icnf, cnf.Mode.TRAIN, x, ps, key=key)
        )(xs)
        return int(bwd.steps)

    def sweep(kind: str):
        """Per-solve wall(cap) for the forward TRAIN solve (fused/xla) or the
        grad step.  Each measurement is ONE dispatch running `--scan-length`
        solves back-to-back on device inside `lax.scan` (data-dependent via a
        1e-7 feedback of the output into the input), so the ~24 ms tunnel RTT
        is paid once per dispatch instead of once per solve.
        """
        walls, nfes, steps = {}, {}, {}
        for cap in args.caps:
            icnf = mk(kind != "xla_fwd", cap, exact="exact" in kind)

            if kind.startswith("grad"):
                def step(x, i):
                    g = jax.grad(
                        lambda p: cnf.loss(icnf, Mode.TRAIN, x, p, key=key))(ps)
                    leak = jnp.tanh(jax.tree_util.tree_leaves(g)[0].ravel()[0])
                    return x + 1e-7 * leak
            else:
                def step(x, i):
                    lp, _, _ = cnf.inference(icnf, Mode.TRAIN, x, ps, key=key)
                    return x + 1e-7 * jnp.tanh(lp)[:, None]

            walls[cap] = time_scanned(step, xs, args.scan_length, rtt)
            if not kind.startswith("grad"):
                @jax.jit
                def stats_of(x):
                    return cnf.inference(icnf, Mode.TRAIN, x, ps, key=key)[2]

                st = stats_of(xs)
                nfes[cap] = int(st.nfe)
                steps[cap] = int(st.steps)
        caps = np.asarray(args.caps, np.float64)
        w = np.asarray([walls[c] for c in args.caps])
        slope, intercept = np.polyfit(caps, w, 1)
        res = {
            "wall_ms": {str(c): round(walls[c] * 1e3, 3) for c in args.caps},
            "per_attempt_us": round(slope * 1e6, 3),
            "intercept_ms": round(intercept * 1e3, 3),
        }
        if not kind.startswith("grad"):
            res["steps_at_cap"] = steps
            res["nfe_at_cap"] = nfes
            # counter check: does reported NFE actually scale 6/attempt?
            dn = (nfes[args.caps[-1]] - nfes[args.caps[0]])
            dk = (args.caps[-1] - args.caps[0])
            res["nfe_per_attempt_reported"] = round(dn / dk, 3)
            res["per_nfe_us_slope"] = round(slope / max(dn / dk, 1e-9) * 1e6, 3)
        return res

    def adjoint_fit(grad_res, fwd_res, exact: bool, tag: str):
        """Adjoint per-attempt cost fit in MEASURED backward-attempt space.

        backward_wall(k) = grad_wall(k) - fwd_wall(k); regress it against
        the measured backward attempts at each cap (adjoint_stats).  With
        the round-5 warm start the backward may stop scaling with the cap
        (attempts saturate); the attempt-space fit stays valid there, and
        if the attempt spread collapses entirely we fall back to dividing
        the largest-cap backward wall by its measured attempts.
        """
        bwd_atts = {c: bwd_attempts_of(c, exact) for c in args.caps}
        out[f"{tag}_bwd_attempts_at_cap"] = bwd_atts
        bw = np.asarray([
            grad_res["wall_ms"][str(c)] if isinstance(grad_res["wall_ms"].get(str(c)), float)
            else float(grad_res["wall_ms"][str(c)])
            for c in args.caps
        ]) - np.asarray([float(fwd_res["wall_ms"][str(c)]) for c in args.caps])
        atts = np.asarray([bwd_atts[c] for c in args.caps], np.float64)
        if atts.max() - atts.min() >= 2:
            slope, _ = np.polyfit(atts, bw, 1)
            per_attempt = slope  # ms per backward attempt
            method = "attempt-space slope fit"
        else:
            per_attempt = bw[-1] / max(atts[-1], 1.0)
            method = "largest-cap wall / measured attempts (attempt spread collapsed)"
        return {
            "per_attempt_us": round(per_attempt * 1e3, 3),
            "per_nfe_us": round(per_attempt * 1e3 / 6.0, 3),
            "method": method,
        }

    out["fused_fwd"] = sweep("fused_fwd")
    out["xla_fwd"] = sweep("xla_fwd")
    out["grad_fused"] = sweep("grad")
    adj = adjoint_fit(out["grad_fused"], out["fused_fwd"], False, "hutch")
    out["adjoint_per_attempt_us"] = adj["per_attempt_us"]
    out["adjoint_per_nfe_us"] = adj["per_nfe_us"]
    out["adjoint_fit_method"] = adj["method"]

    # Same sweep for the exact-divergence TRAIN config (the flagship
    # density-gate recipe, fused since round 4).
    out["exact_fwd"] = sweep("exact_fwd")
    out["grad_exact"] = sweep("grad_exact")
    adj_e = adjoint_fit(out["grad_exact"], out["exact_fwd"], True, "exact")
    out["exact_adjoint_per_attempt_us"] = adj_e["per_attempt_us"]
    out["exact_adjoint_per_nfe_us"] = adj_e["per_nfe_us"]
    out["exact_adjoint_fit_method"] = adj_e["method"]

    # Analytic MXU-issue ceilings for the adjoint kernels (matmul-unit
    # model; see utils/profiling.stage_mxu_units) + utilizations.
    from continuousnf_tpu.utils.profiling import adjoint_roofline_report, stage_mxu_units

    def _u(kind, backward):
        return stage_mxu_units(n_in, 3 * n_in, kind, backward=backward)

    out["adjoint_roofline"] = {
        k: (round(v, 3) if isinstance(v, float) else v)
        for k, v in adjoint_roofline_report(
            out["adjoint_per_attempt_us"] * 1e-6,
            out["fused_fwd"]["per_attempt_us"] * 1e-6,
            B, n_in, 3 * n_in, kind="train", k_probes=1,
        ).items()
    }
    out["exact_adjoint_roofline"] = {
        k: (round(v, 3) if isinstance(v, float) else v)
        for k, v in adjoint_roofline_report(
            out["exact_adjoint_per_attempt_us"] * 1e-6,
            out["exact_fwd"]["per_attempt_us"] * 1e-6,
            B, n_in, 3 * n_in, kind="exact",
        ).items()
    }

    # Measured ceiling: the bare-XLA stage chain (same stage math, no
    # controller), per stage eval.
    from benchmarks.kernel_microbench import stage_chain_time

    out["xla_stage_chain_us"] = round(
        stage_chain_time(ps, B, n_in, 3 * n_in, bf16=False, length=2048, rtt=rtt) * 1e6, 3)

    print(json.dumps(out))

    if args.write:
        import io

        fused = out["fused_fwd"]
        xla = out["xla_fwd"]
        buf = io.StringIO()
        buf.write(
            "# Roofline audit — counter-independent per-NFE timing\n\n"
            f"Method: cap the adaptive solve at max_steps=k for k in {args.caps}\n"
            f"(all below the measured natural {natural_steps}-step count at\n"
            "tspan=(0,13), rtol=1e-3, so every cap binds) and fit\n"
            "wall(k) = a + b*k; the slope b is the cost of one attempted\n"
            "step (6 field evals, FSAL tsit5) measured purely from wall-clock\n"
            f"deltas — no dependence on the kernel's NFE counter.  Each wall\n"
            f"point is one dispatch of {args.scan_length} back-to-back solves\n"
            "in an on-device `lax.scan` (tunnel RTT paid once, subtracted).\n"
            f"Batch {B}, f32.\n\n"
            "| path | per-attempt (us) | per-NFE (us) | NFE/attempt reported |\n"
            "|---|---|---|---|\n"
            f"| fused megakernel fwd | {fused['per_attempt_us']} | "
            f"{fused['per_nfe_us_slope']} | {fused['nfe_per_attempt_reported']} |\n"
            f"| unfused XLA while_loop fwd | {xla['per_attempt_us']} | "
            f"{xla['per_nfe_us_slope']} | {xla['nfe_per_attempt_reported']} |\n"
            f"| grad step (fwd + adjoint kernel) | "
            f"{out['grad_fused']['per_attempt_us']} | — | — |\n"
            f"| adjoint kernel (grad - fwd) | {out['adjoint_per_attempt_us']} | "
            f"{out['adjoint_per_nfe_us']} | — |\n"
            f"| exact-trace fused fwd | {out['exact_fwd']['per_attempt_us']} | "
            f"{out['exact_fwd']['per_nfe_us_slope']} | "
            f"{out['exact_fwd']['nfe_per_attempt_reported']} |\n"
            f"| exact grad step | {out['grad_exact']['per_attempt_us']} | — | — |\n"
            f"| exact adjoint kernel | {out['exact_adjoint_per_attempt_us']} | "
            f"{out['exact_adjoint_per_nfe_us']} | — |\n\n"
            f"Bare-XLA stage chain (no controller): {out['xla_stage_chain_us']} "
            "us per stage eval.\n\n"
            "## Ceiling model (round 5)\n\n"
            "The adjoint stage recomputes the forward dynamics and applies a\n"
            "hand-derived transpose-free VJP (`_stage_*_fwdbwd`); its MXU-issue\n"
            "floor is `stage_mxu_units(backward=True)` matmul units per stage\n"
            f"({_u('train', True)} vs the forward's {_u('train', False)} for "
            f"K=1 Hutchinson; {_u('exact', True)} vs {_u('exact', False)} for "
            "exact at the flagship shape)\n"
            "plus a 2.5x-forward VPU estimate.  The model charges ONE bf16\n"
            "pass per unit; the round-5 default stage scheme is the explicit\n"
            "bf16x3 split (3 passes — docs/ROUND5.md section 8), so measured\n"
            "utilization against this single-pass floor tops out near 1/3:\n"
            "the floor is the algorithm's speed of light and the distance to\n"
            "it is now dominated by the precision passes the error\n"
            "controller needs, not by layout or residency.  History: round 4\n"
            "removed AD's batch-major transpose relayouts (25.95 -> 15.2\n"
            "us/NFE adjoint at HIGHEST); round 5 swapped HIGHEST (6-pass\n"
            "f32 emulation) for bf16x3 — adjoint now "
            f"{out['adjoint_per_nfe_us']} us/NFE.\n\n"
            f"| kernel | measured us/NFE | MXU-issue floor | utilization | "
            f"adj/fwd measured | adj/fwd modeled |\n|---|---|---|---|---|---|\n"
            f"| Hutchinson K=1 | {out['adjoint_roofline']['measured_per_nfe_us']} | "
            f"{out['adjoint_roofline']['mxu_issue_per_nfe_us']} | "
            f"{out['adjoint_roofline']['utilization_vs_mxu_issue']} | "
            f"{out['adjoint_roofline']['adjoint_vs_forward_measured']} | "
            f"{out['adjoint_roofline']['adjoint_vs_forward_modeled']} |\n"
            f"| exact trace | {out['exact_adjoint_roofline']['measured_per_nfe_us']} | "
            f"{out['exact_adjoint_roofline']['mxu_issue_per_nfe_us']} | "
            f"{out['exact_adjoint_roofline']['utilization_vs_mxu_issue']} | "
            f"{out['exact_adjoint_roofline']['adjoint_vs_forward_measured']} | "
            f"{out['exact_adjoint_roofline']['adjoint_vs_forward_modeled']} |\n\n"
            f"Raw: `{json.dumps(out)}`\n"
        )
        with open("docs/ROOFLINE.md", "w") as f:
            f.write(buf.getvalue())
        print("wrote docs/ROOFLINE.md")


if __name__ == "__main__":
    main()
