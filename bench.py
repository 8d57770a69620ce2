"""Benchmark: CNF training throughput on the flagship (regression-config) model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus extra
diagnostic keys.  The reference publishes no absolute numbers (BASELINE.md),
so vs_baseline is reported as 1.0 by convention; extras carry log-prob
throughput and solver NFE so rounds can be compared.

Config mirrors the reference benchmark suite shape
(`/root/reference/benchmark/benchmarks.jl:24-49`): RNODE nvars=8 naug=8,
tanh MLP, TrainMode loss+gradient — scaled to a TPU-sized batch.
"""

import json
import time

import jax
import jax.numpy as jnp


def main():
    import optax

    import continuousnf_tpu as cnf
    from continuousnf_tpu import Mode

    nvars, naug = 8, 8
    n_in = nvars + naug
    batch = 4096
    nn = cnf.MLP((n_in, 3 * n_in, n_in))
    icnf = cnf.construct(
        cnf.RNODE, nn, nvars, naug, tspan=(0.0, 1.0), steer_rate=0.1, lam3=1e-2
    )
    ps = icnf.init(jax.random.PRNGKey(0))
    xs = jax.random.uniform(jax.random.PRNGKey(1), (batch, nvars), dtype=jnp.float32)
    opt = optax.lion(1e-3)
    opt_state = opt.init(ps)

    @jax.jit
    def train_step(ps, opt_state, xs, key):
        l, g = jax.value_and_grad(
            lambda p: cnf.loss(icnf, Mode.TRAIN, xs, p, key=key)
        )(ps)
        updates, opt_state = opt.update(g, opt_state, ps)
        return optax.apply_updates(ps, updates), opt_state, l

    @jax.jit
    def logprob(ps, xs):
        lp, _, stats = cnf.inference(icnf, Mode.TEST, xs, ps)
        return lp, stats

    # Warmup / compile
    key = jax.random.PRNGKey(2)
    ps_w, opt_w, _ = train_step(ps, opt_state, xs, key)
    jax.block_until_ready(ps_w)

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        ps, opt_state, l = train_step(ps, opt_state, xs, jax.random.fold_in(key, i))
    jax.block_until_ready(ps)
    train_dt = (time.perf_counter() - t0) / iters
    train_sps = batch / train_dt

    lp, stats = logprob(ps, xs)
    jax.block_until_ready(lp)
    t0 = time.perf_counter()
    for _ in range(5):
        lp, stats = logprob(ps, xs)
    jax.block_until_ready(lp)
    eval_dt = (time.perf_counter() - t0) / 5
    eval_sps = batch / eval_dt

    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec_per_chip",
                "value": round(train_sps, 1),
                "unit": "samples/s",
                "vs_baseline": 1.0,
                "extras": {
                    "logprob_evals_per_sec": round(eval_sps, 1),
                    "batch": batch,
                    "train_step_ms": round(train_dt * 1e3, 2),
                    "test_nfe": int(stats.nfe),
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
