"""Tabular-scale benchmark: POWER (6D) and MINIBOONE (43D) shapes.

BASELINE config #5: UCI tabular density estimation at TPU batch sizes —
reports TRAIN-mode step throughput (Hutchinson VJP) and TEST-mode exact-trace
log-prob throughput (the d x d Jacobian path, SURVEY §7 "hard parts").
Synthetic data with the right shapes (zero-egress environment); swap in the
real CSVs via `continuousnf_tpu.io.load_csv` when available.

Run: python benchmarks/tabular.py
"""

import json
import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax.numpy as jnp
    import optax

    import continuousnf_tpu as cnf
    from continuousnf_tpu import Mode
    from continuousnf_tpu.data import synthetic_tabular

    results = {}
    for name, d, hidden, batch in [("power6", 6, 64, 4096), ("miniboone43", 43, 128, 2048)]:
        nn = cnf.MLP((d, hidden, hidden, d))
        icnf = cnf.construct(cnf.RNODE, nn, d, 0, tspan=(0.0, 1.0))
        ps = icnf.init(jax.random.PRNGKey(0))
        xs = synthetic_tabular(jax.random.PRNGKey(1), batch, d)
        opt = optax.lion(1e-3)
        opt_state = opt.init(ps)
        key = jax.random.PRNGKey(2)

        @jax.jit
        def train_step(ps, opt_state, key):
            l, g = jax.value_and_grad(
                lambda p: cnf.loss(icnf, Mode.TRAIN, xs, p, key=key)
            )(ps)
            u, opt_state = opt.update(g, opt_state, ps)
            return optax.apply_updates(ps, u), opt_state, l

        @jax.jit
        def logprob(x):
            lp, _, _ = cnf.inference(icnf, Mode.TEST, x, ps)
            return lp

        c = train_step(ps, opt_state, key)
        float(np.asarray(c[2]))
        t0 = time.perf_counter()
        iters = 10
        cc = (c[0], c[1])
        for i in range(iters):
            out = train_step(cc[0], cc[1], jax.random.fold_in(key, i))
            cc = (out[0], out[1])
        float(np.asarray(out[2]))
        train_dt = (time.perf_counter() - t0) / iters

        lp = logprob(xs)
        float(np.asarray(lp[0]))
        t0 = time.perf_counter()
        x = xs
        for i in range(5):
            lp = logprob(x)
            x = xs + 1e-6 * lp[:, None]
        float(np.asarray(lp[0]))
        eval_dt = (time.perf_counter() - t0) / 5

        results[name] = {
            "d": d,
            "batch": batch,
            "train_samples_per_sec": round(batch / train_dt, 1),
            "exact_logprob_per_sec": round(batch / eval_dt, 1),
            "train_step_ms": round(train_dt * 1e3, 2),
        }
        print(f"{name}: {results[name]}", flush=True)

    print(json.dumps({"tabular": results, "backend": jax.default_backend()}))


if __name__ == "__main__":
    main()
