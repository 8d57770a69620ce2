"""Steady-state per-step cost of the three quality-recipe configs, fused vs
unfused — measured with `bench.time_scanned` (on-device lax.scan, RTT
subtracted), NOT via `fit` walls: fit's time-adaptive epoch chunking visits
run-dependent scan lengths, and any cold length embeds a multi-minute Mosaic
megakernel compile, so end-to-end walls measure cache state, not kernels
(observed: toy2d 203s vs 8s for identical training).  This is the
authoritative recipe-scale comparison for REGRESSION.md.

Run: python experiments/recipe_steps_r5.py [--out FILE]
"""
import argparse, json, sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/cnf_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
import optax
import continuousnf_tpu as cnf
from continuousnf_tpu import Mode
from bench import measure_rtt, time_scanned


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    rtt = measure_rtt()
    out = {"rtt_ms": round(rtt * 1e3, 2), "backend": jax.default_backend(),
           "methodology": "per-train-step device time, on-device lax.scan, "
           "RTT-subtracted (bench.time_scanned); recipe-literal model/batch"}

    configs = [
        # (name, variant, net dims, nvars, cond_dim, tspan, batch, bijector)
        ("beta_unaugmented", cnf.RNODE, (1, 64, 64, 1), 1, 0, 13.0, 128, "logit"),
        ("toy2d_moons", cnf.FFJORD, (2, 32, 32, 2), 2, 0, 8.0, 256, None),
        ("conditional_gaussian", cnf.CondRNODE, (2, 64, 64, 1), 1, 1, 13.0, 128, None),
    ]
    for name, variant, dims, nvars, nc, t1, B, bij in configs:
        nn = cnf.MLP(dims)
        row = {}
        for fused in (False, True):
            icnf = cnf.construct(
                variant, nn, nvars, 0, tspan=(0.0, t1), steer_rate=0.1,
                compute_mode=cnf.VecJacMode(fused=fused),
                input_bijector=bij,
            )
            ps = icnf.init(jax.random.PRNGKey(0))
            xs = jax.random.uniform(
                jax.random.PRNGKey(1), (B, nvars), jnp.float32,
                minval=0.05, maxval=0.95)
            ys = (jax.random.normal(jax.random.PRNGKey(2), (B, nc), jnp.float32)
                  if nc else None)
            opt = optax.lion(1e-3)
            key = jax.random.PRNGKey(3)

            def step(carry, i, icnf=icnf, ys=ys, opt=opt):
                ps_, os_ = carry
                _, g = jax.value_and_grad(lambda p: cnf.loss(
                    icnf, Mode.TRAIN, xs, p, ys=ys,
                    key=jax.random.fold_in(key, i)))(ps_)
                u, os_ = opt.update(g, os_, ps_)
                return optax.apply_updates(ps_, u), os_

            dt = time_scanned(step, (ps, opt.init(ps)), length=32, rtt=rtt)
            row["fused_step_ms" if fused else "xla_step_ms"] = round(dt * 1e3, 3)
        row["fused_speedup"] = round(row["xla_step_ms"] / row["fused_step_ms"], 2)
        out[name] = row
        print(name, row, flush=True)
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
