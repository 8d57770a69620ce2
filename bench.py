"""Benchmark: CNF training throughput on the flagship (regression-config) model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus extra
diagnostic keys.  The reference publishes no absolute numbers (BASELINE.md),
so vs_baseline is reported as 1.0 by convention; extras carry log-prob
throughput, solver NFE, and the tight-tolerance numbers so rounds compare.

Config mirrors the reference benchmark/regression suite shape
(`/root/reference/benchmark/benchmarks.jl:24-49`,
`/root/reference/test/regression_tests.jl:2-28`): RNODE nvars=8 naug=8,
tanh MLP 16->48->16, TrainMode loss+gradient at the reference's effective
solver tolerances (rtol=1e-3/atol=1e-6 — its tests pass no sol_kwargs),
scaled to a TPU-sized batch, with the fused Pallas dynamics kernel on.
"""

import json
import time

import jax
import jax.numpy as jnp


def _host_barrier(tree) -> float:
    """Force completion by reading one scalar back to the host.

    `block_until_ready` alone is not a reliable barrier on remote-attached
    TPU runtimes (it can return before execution drains); a device->host
    readback of real bytes is.
    """
    leaf = jax.tree_util.tree_leaves(tree)[0]
    import numpy as np

    return float(np.asarray(leaf).ravel()[0])


def _time_chain(step_fn, carry, iters):
    """Time `iters` data-dependent iterations of carry = step_fn(carry, i).

    Threading the carry forces true sequential device execution — independent
    identical dispatches can overlap or be elided by the runtime, which fakes
    the timing.  A host readback closes each timed region.
    """
    carry = step_fn(carry, 0)  # warmup/compile
    _host_barrier(carry)
    t0 = time.perf_counter()
    for i in range(iters):
        carry = step_fn(carry, i + 1)
    _host_barrier(carry)
    return (time.perf_counter() - t0) / iters


def main():
    import optax

    import continuousnf_tpu as cnf
    from continuousnf_tpu import Mode

    nvars, naug = 8, 8
    n_in = nvars + naug
    batch = 4096
    on_tpu = jax.default_backend() == "tpu"
    nn = cnf.MLP((n_in, 3 * n_in, n_in))
    icnf = cnf.construct(
        cnf.RNODE,
        nn,
        nvars,
        naug,
        tspan=(0.0, 1.0),
        steer_rate=0.1,
        lam3=1e-2,
        compute_mode=cnf.VecJacMode(fused=on_tpu),
    )
    ps = icnf.init(jax.random.PRNGKey(0))
    xs = jax.random.uniform(jax.random.PRNGKey(1), (batch, nvars), dtype=jnp.float32)
    opt = optax.lion(1e-3)
    opt_state = opt.init(ps)
    key = jax.random.PRNGKey(2)

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

    train_dt = _time_chain(
        lambda c, i: train_step(c[0], c[1], xs, jax.random.fold_in(key, i))[:2],
        (ps, opt_state),
        iters=10,
    )
    train_sps = batch / train_dt

    def eval_step(x, i):
        lp, _ = logprob(ps, x)
        return x + 1e-6 * lp[:, None]  # data dependence chains the calls

    eval_dt = _time_chain(eval_step, xs, iters=5)
    eval_sps = batch / eval_dt
    _, stats = logprob(ps, xs)

    # Roofline of the fused dynamics eval (BASELINE target metric), derived
    # from an end-to-end TRAIN forward solve: wall time divided by the
    # solver's NFE counter.  This includes the while-loop controller overhead
    # — it is the *effective* per-eval cost the training run actually pays
    # (standalone kernel microbenchmarks are dispatch-dominated on
    # remote-attached runtimes).
    roofline = {}
    if on_tpu:
        import numpy as np

        from continuousnf_tpu import Mode
        from continuousnf_tpu.utils.profiling import roofline_report

        # Measured speed-of-light: the same stage math as a bare XLA scan
        # (no solver, no controller) — see profiling.roofline_report.
        from benchmarks.kernel_microbench import stage_chain_time

        sol_s = stage_chain_time(ps, batch, n_in, 3 * n_in, bf16=False, length=256)

        @jax.jit
        def fwd(xs, key):
            lp, _, stats = cnf.inference(icnf, Mode.TRAIN, xs, ps, key=key)
            return xs + 1e-6 * lp[:, None], stats.nfe

        def fwd_step(c, i):
            return fwd(c[0], jax.random.fold_in(key, i))

        dt_total = _time_chain(fwd_step, (xs, 0), iters=8)
        nfe = int(fwd(xs, key)[1])
        dt_k = dt_total / max(nfe, 1)
        roofline = roofline_report(dt_k, batch, n_in, 3 * n_in, measured_sol_s=sol_s)
        roofline = {k: (round(v, 3) if isinstance(v, float) else v) for k, v in roofline.items()}

    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec_per_chip",
                "value": round(train_sps, 1),
                "unit": "samples/s",
                # The reference publishes no absolute numbers (BASELINE.md), so
                # the anchor is this repo's round-1 measurement on the same
                # chip class (BENCH_r01.json): cross-round trend, not a
                # reference ratio.
                "vs_baseline": round(train_sps / 563561.0, 3),
                "extras": {
                    "logprob_evals_per_sec": round(eval_sps, 1),
                    "batch": batch,
                    "train_step_ms": round(train_dt * 1e3, 2),
                    "logprob_ms": round(eval_dt * 1e3, 2),
                    "test_nfe": int(stats.nfe),
                    "fused_kernel": on_tpu,
                    "fused_kernel_roofline": roofline,
                    "solver": "tsit5 rtol=1e-3 atol=1e-6 (reference effective default)",
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
