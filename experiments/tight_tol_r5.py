"""Wall-clock per solve at the README tolerances: do tight tolerances and
the megakernels compose? (round-4 verdict item 6)

Round 4: verner65 (the `auto` pick at rtol=sqrt(eps(f32))) was non-FSAL and
could not run in-kernel — the tight-tolerance story and the kernel story
were mutually exclusive.  Round 5 added non-FSAL stage refresh to both
kernels, so this measures the full matrix on-chip: {tsit5, verner65} x
{fused, xla} TRAIN solves at README_TOLERANCES, wall per solve + NFE.
The table lands in docs/SOLVER_PARITY.md.

Run: python experiments/tight_tol_r5.py [--batch 4096]
"""
import argparse, json, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/cnf_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import continuousnf_tpu as cnf
from continuousnf_tpu import Mode
from bench import measure_rtt, time_scanned


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    nvars, naug = 8, 8
    n_in = nvars + naug
    B = args.batch
    nn = cnf.MLP((n_in, 3 * n_in, n_in))
    xs = jax.random.uniform(jax.random.PRNGKey(1), (B, nvars), jnp.float32)
    key = jax.random.PRNGKey(2)
    rtt = measure_rtt()

    def mk(method, fused):
        return cnf.construct(
            cnf.RNODE, nn, nvars, naug, tspan=(0.0, 13.0), lam3=1e-2,
            compute_mode=cnf.VecJacMode(fused=fused),
            solver=cnf.SolverOptions(method=method, **cnf.README_TOLERANCES),
        )

    ps = mk("tsit5", False).init(jax.random.PRNGKey(0))
    out = {"batch": B, "tolerances": cnf.README_TOLERANCES,
           "rtt_ms": round(rtt * 1e3, 3)}
    for method in ("tsit5", "verner65", "dop853"):
        for fused in (True, False):
            icnf = mk(method, fused)

            def step(x, i, icnf=icnf):
                lp, _, _ = cnf.inference(icnf, Mode.TRAIN, x, ps, key=key)
                return x + 1e-7 * jnp.tanh(lp)[:, None]

            dt = time_scanned(step, xs, 16, rtt)

            @jax.jit
            def st_of(x, icnf=icnf):
                return cnf.inference(icnf, Mode.TRAIN, x, ps, key=key)[2]

            st = st_of(xs)
            tag = f"{method}_{'fused' if fused else 'xla'}"
            out[tag] = {
                "solve_ms": round(dt * 1e3, 3),
                "nfe": int(st.nfe),
                "steps": int(st.steps),
                "us_per_nfe": round(dt / max(int(st.nfe), 1) * 1e6, 3),
            }
            print(tag, out[tag], flush=True)
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
