"""Fast kernel-iteration microbench: slope-fit per-NFE cost of the forward
megakernels only (exact + K=1 Hutchinson) at two step caps.  ~2 min warm —
the inner loop for kernel optimization work; the full counter-independent
story stays with tools/roofline_audit.py.

Usage: python tools/kernel_iter.py [--batch 4096] [--caps 8 24]
"""
import argparse, json, sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cnf_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--caps", type=int, nargs="+", default=[8, 24])
    ap.add_argument("--scan-length", type=int, default=64)
    ap.add_argument("--grad", action="store_true", help="also sweep grad steps")
    args = ap.parse_args()

    import continuousnf_tpu as cnf
    from continuousnf_tpu import Mode
    from bench import measure_rtt, time_scanned

    nvars, naug = 8, 8
    n_in = nvars + naug
    B = args.batch
    nn = cnf.MLP((n_in, 3 * n_in, n_in))
    xs = jax.random.uniform(jax.random.PRNGKey(1), (B, nvars), jnp.float32)
    key = jax.random.PRNGKey(2)
    rtt = measure_rtt()

    def mk(max_steps, exact):
        return cnf.construct(
            cnf.RNODE, nn, nvars, naug, tspan=(0.0, 13.0), lam3=1e-2,
            compute_mode=cnf.VecJacMode(fused=True, exact_trace=exact),
            solver=cnf.SolverOptions(max_steps=max_steps),
        )

    ps = mk(100, False).init(jax.random.PRNGKey(0))
    out = {"batch": B, "rtt_ms": round(rtt * 1e3, 3)}
    kinds = [("exact_fwd", True, False), ("hutch_fwd", False, False)]
    if args.grad:
        kinds += [("exact_grad", True, True), ("hutch_grad", False, True)]
    for name, exact, grad in kinds:
        walls = {}
        for cap in args.caps:
            icnf = mk(cap, exact)
            if grad:
                def step(x, i, icnf=icnf):
                    g = jax.grad(lambda p: cnf.loss(icnf, Mode.TRAIN, x, p, key=key))(ps)
                    leak = jnp.tanh(jax.tree_util.tree_leaves(g)[0].ravel()[0])
                    return x + 1e-7 * leak
            else:
                def step(x, i, icnf=icnf):
                    lp, _, _ = cnf.inference(icnf, Mode.TRAIN, x, ps, key=key)
                    return x + 1e-7 * jnp.tanh(lp)[:, None]
            walls[cap] = time_scanned(step, xs, args.scan_length, rtt)
        caps = np.asarray(args.caps, np.float64)
        w = np.asarray([walls[c] for c in args.caps])
        slope, intercept = np.polyfit(caps, w, 1)
        out[name] = {
            "per_attempt_us": round(slope * 1e6, 3),
            "per_nfe_us": round(slope / 6.0 * 1e6, 3),
            "intercept_us": round(intercept * 1e6, 1),
        }
        print(name, out[name], flush=True)
    if args.grad:
        for k in ("exact", "hutch"):
            out[f"{k}_adjoint_per_nfe_us"] = round(
                (out[f"{k}_grad"]["per_attempt_us"] - out[f"{k}_fwd"]["per_attempt_us"]) / 6.0, 3)
    print(json.dumps(out))

if __name__ == "__main__":
    main()
