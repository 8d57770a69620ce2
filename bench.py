"""Benchmark: CNF training throughput on the flagship (regression-config) model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus extra
diagnostic keys.  The reference publishes no absolute numbers (BASELINE.md),
so vs_baseline anchors against this repo's ROUND-1 BUILD re-measured under
the current methodology at the current config (BASELINE_ANCHOR.json, written
by tools/bench_anchor.py from a worktree of the round-1 commit) — a true
apples-to-apples cross-round trend, not a reference ratio.

Config now mirrors the reference benchmark/regression configs FAITHFULLY,
including tspan=(0,13) (`/root/reference/benchmark/benchmarks.jl:43`,
`/root/reference/test/regression_tests.jl:20` — round-2 bench used tspan=(0,1),
a ~13x shorter transport, and was flagged for it): RNODE nvars=8 naug=8,
tanh MLP 16->48->16, TrainMode loss+gradient at the reference's effective
solver tolerances (rtol=1e-3/atol=1e-6 — its tests pass no sol_kwargs),
scaled to a TPU-sized batch, with the fused Pallas megakernel on.  The
NFE-normalized companion metric `field_evals_per_sec` (= samples/s x NFE per
solve) is transport-length-invariant and is the number to compare across
configs with different tspans.

Timing methodology (remote-attached "axon" TPU runtimes): per-dispatch host
cost is ~2 ms and a device->host readback costs ~30 ms with high variance,
so host-side loops of individual dispatches measure the tunnel, not the
chip.  All repetition therefore happens ON DEVICE via `lax.scan`; each
measurement is one dispatch + one readback, the measured readback RTT is
subtracted, and the minimum over repeats is reported (least interference).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _readback(tree) -> float:
    """Force completion by reading one scalar back to the host.

    `block_until_ready` alone is not a reliable barrier on remote-attached
    TPU runtimes (it can return before execution drains); a device->host
    readback of real bytes is.
    """
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(np.asarray(leaf).ravel()[0])


def measure_rtt() -> float:
    """Minimum dispatch+readback round-trip of a no-op jit call (7 samples).

    Deliberately the min, which systematically *under*estimates typical RTT:
    an overestimate would be subtracted from every later measurement and can
    push short dispatches to <= 0, while the underestimate only inflates the
    reported per-op times slightly (conservative direction).
    """

    @jax.jit
    def nop(x):
        return x + 0.0

    x = jnp.zeros((8, 128))
    _readback(nop(x))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        _readback(nop(x))
        ts.append(time.perf_counter() - t0)
    # The floor, not the median: a contention spike during this probe must
    # not inflate the value subtracted from every later measurement (an
    # overestimate can push short dispatches to <= 0).
    return float(np.min(ts))


def time_scanned(step_fn, carry, length: int, rtt: float, reps: int = 3) -> float:
    """Per-iteration device time of `carry = step_fn(carry, i)`.

    Runs `length` data-dependent iterations inside one jitted `lax.scan`
    (single dispatch), subtracts the measured readback RTT, takes the min
    over `reps` dispatches.  If the dispatch is not comfortably above the
    RTT (< 4x), the scan length is scaled up and the measurement repeated —
    otherwise RTT estimation noise dominates the subtraction and a short
    dispatch can clamp to ~0, poisoning every derived per-op number.
    """

    def once(length: int) -> float:
        @jax.jit
        def run(c):
            return jax.lax.scan(
                lambda c, i: (step_fn(c, i), None), c, jnp.arange(length)
            )[0]

        c = run(carry)  # compile + warm
        _readback(c)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _readback(run(c))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    wall = once(length)
    if wall < 4.0 * rtt:
        scale = int(np.ceil(4.0 * rtt / max(wall - rtt, rtt / 4))) + 1
        length = min(length * scale, length * 64)
        wall = once(length)
        if wall < 4.0 * rtt:
            import sys

            print(
                f"WARNING: time_scanned dispatch ({wall*1e3:.2f} ms) still "
                f"< 4x RTT ({rtt*1e3:.2f} ms) after rescale to length="
                f"{length}; per-op time is RTT-noise dominated",
                file=sys.stderr,
            )
    per = wall - rtt
    if per <= 1e-9 * length:
        import sys

        print(
            "WARNING: time_scanned clamped to floor (wall <= RTT); "
            "result is not meaningful",
            file=sys.stderr,
        )
    return max(per, 1e-9) / length


def main():
    import optax

    # Persistent XLA/Mosaic compile cache: the megakernel compiles (notably
    # the exact-mode adjoint, ~3 min cold) dominate a cold bench run; caching
    # makes re-runs on the same host start in seconds.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/cnf_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass

    import continuousnf_tpu as cnf
    from continuousnf_tpu import Mode

    nvars, naug = 8, 8
    n_in = nvars + naug
    batch = 4096
    on_tpu = jax.default_backend() == "tpu"
    nn = cnf.MLP((n_in, 3 * n_in, n_in))

    def mk(fused, exact=False):
        return cnf.construct(
            cnf.RNODE,
            nn,
            nvars,
            naug,
            # Reference tspan — both its benchmark and regression configs
            # integrate 0 -> 13 (`benchmark/benchmarks.jl:43`,
            # `test/regression_tests.jl:20`).
            tspan=(0.0, 13.0),
            steer_rate=0.1,
            lam3=1e-2,
            compute_mode=cnf.VecJacMode(fused=fused, exact_trace=exact),
        )

    icnf = mk(on_tpu)
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
    train_sps = batch / train_dt

    # Forward-solve NFE at this config (field evaluations per TRAIN solve):
    # the transport-length-invariant normalizer for cross-config comparison.
    @jax.jit
    def train_nfe_of(x):
        _, _, stats = cnf.inference(icnf, Mode.TRAIN, x, ps, key=key)
        return stats.nfe

    train_nfe = int(train_nfe_of(xs))
    field_evals_per_s = train_sps * train_nfe

    def eval_step(x, i):
        lp, _, _ = cnf.inference(icnf, Mode.TEST, x, ps)
        return x + 1e-6 * lp[:, None]  # data dependence chains the solves

    # length 24: at length 8 this dispatch is barely above the tunnel RTT
    # and the metric swung 0.6-1.6x run-to-run at identical code (caught by
    # the round-5 per-metric gate); 24 puts the dispatch ~10x RTT.
    eval_dt = time_scanned(eval_step, xs, length=24, rtt=rtt)
    eval_sps = batch / eval_dt

    @jax.jit
    def test_stats(x):
        _, _, stats = cnf.inference(icnf, Mode.TEST, x, ps)
        return stats

    test_nfe = int(test_stats(xs).nfe)

    # Roofline of the fused dynamics eval (BASELINE target metric), derived
    # from an end-to-end TRAIN forward solve: device wall time divided by the
    # solver's NFE counter.  This includes the in-kernel controller overhead
    # — it is the *effective* per-eval cost training actually pays.
    roofline = {}
    adjoint_roofline = {}
    exact_metrics = {}
    if on_tpu:
        from benchmarks.kernel_microbench import stage_chain_time
        from continuousnf_tpu.utils.profiling import roofline_report

        sol_s = stage_chain_time(ps, batch, n_in, 3 * n_in, bf16=False, length=2048, rtt=rtt)

        def fwd_step(c, i):
            lp, _, stats = cnf.inference(
                icnf, Mode.TRAIN, c[0], ps, key=jax.random.fold_in(key, i)
            )
            return (c[0] + 1e-6 * lp[:, None], c[1] + stats.nfe)

        dt_fused = time_scanned(fwd_step, (xs, 0), length=24, rtt=rtt)
        nfe = train_nfe
        # Unfused comparison: the same solve through the plain XLA while_loop.
        icnf_x = mk(False)

        def fwd_step_x(c, i):
            lp, _, stats = cnf.inference(
                icnf_x, Mode.TRAIN, c[0], ps, key=jax.random.fold_in(key, i)
            )
            return (c[0] + 1e-6 * lp[:, None], c[1] + stats.nfe)

        dt_xla = time_scanned(fwd_step_x, (xs, 0), length=4, rtt=rtt)

        roofline = roofline_report(
            dt_fused / max(nfe, 1),
            batch,
            n_in,
            3 * n_in,
            measured_sol_s=sol_s,
            xla_solve_nfe_s=dt_xla / max(nfe, 1),
        )
        roofline = {k: (round(v, 3) if isinstance(v, float) else v) for k, v in roofline.items()}

        # Adjoint (backward) megakernel roofline.  Round 5: the backward
        # integration's attempt/NFE counts are MEASURED via
        # `cnf.adjoint_stats` (the custom_vjp cannot return them; the helper
        # re-runs the identical backward integration standalone), so the
        # derived per-NFE number divides by the real backward attempt count
        # — round 4 divided by the forward count and disagreed with the
        # slope-fit audit (10.7 vs 15.2 us/NFE).  The counter-independent
        # authority remains tools/roofline_audit.py (committed artifact,
        # rendered in docs/ROOFLINE.md); both must now agree within the
        # per-solve fixed overhead.
        fwd_st, bwd_st = jax.jit(
            lambda x: cnf.adjoint_stats(icnf, Mode.TRAIN, x, ps, key=key)
        )(xs)
        bwd_attempts = int(bwd_st.steps)
        bwd_nfe = int(bwd_st.nfe)
        # backward wall inside the measured train step = train - forward
        # solve - (loss epilogue + optimizer, small); divided by measured
        # backward NFE.
        backward_wall = max(train_dt - dt_fused, 0.0)
        adjoint_roofline = {
            "bwd_attempts_measured": bwd_attempts,
            "bwd_nfe_measured": bwd_nfe,
            "fwd_attempts": int(fwd_st.steps),
            "derived_backward_wall_us": round(backward_wall * 1e6, 1),
            "derived_us_per_nfe": round(backward_wall / max(bwd_nfe, 1) * 1e6, 3),
            "note": "derived = (train_step - fwd_solve) wall over MEASURED "
            "backward NFE (cnf.adjoint_stats); includes loss epilogue + "
            "optimizer, so it upper-bounds the kernel cost. Authoritative "
            "per-NFE number: tools/roofline_audit.py slope fit.",
        }
        try:
            with open("experiments/roofline_audit_r5.json") as f:
                audit = json.loads(f.read().splitlines()[0])
            adjoint_roofline["audit"] = dict(audit.get("adjoint_roofline", {}))
            adjoint_roofline["audit"]["source"] = (
                "tools/roofline_audit.py slope-fit (counter-independent), "
                "experiments/roofline_audit_r5.json"
            )
        except (OSError, ValueError, KeyError):
            adjoint_roofline["audit"] = {
                "source": "audit artifact missing; run tools/roofline_audit.py"
            }

        # The exact-divergence (density-gate recipe) config, fused since
        # round 4 — bench reports BOTH configs (round-3 verdict item 2).
        icnf_e = mk(True, exact=True)

        def train_step_e(carry, i):
            ps_, opt_state_ = carry
            l, g = jax.value_and_grad(
                lambda p: cnf.loss(
                    icnf_e, Mode.TRAIN, xs, p, key=jax.random.fold_in(key, i)
                )
            )(ps_)
            updates, opt_state_ = opt.update(g, opt_state_, ps_)
            return optax.apply_updates(ps_, updates), opt_state_

        exact_dt = time_scanned(train_step_e, (ps, opt_state), length=8, rtt=rtt)

        @jax.jit
        def exact_nfe_of(x):
            _, _, stats = cnf.inference(icnf_e, Mode.TRAIN, x, ps, key=key)
            return stats.nfe

        exact_metrics = {
            "train_samples_per_sec": round(batch / exact_dt, 1),
            "train_step_ms": round(exact_dt * 1e3, 2),
            "train_nfe_per_solve": int(exact_nfe_of(xs)),
            "note": "exact_trace=True (zero-variance divergence; the recipe "
            "that passes the density gate) through the fused megakernels",
        }

    # Cross-round anchor: the ROUND-1 BUILD re-measured under this
    # methodology at this config (tools/bench_anchor.py).  No anchor file ->
    # no trend claim (null), never a mixed-methodology ratio.
    vs_baseline = None
    try:
        with open("BASELINE_ANCHOR.json") as f:
            anchor = json.load(f)
        vs_baseline = round(train_sps / anchor["train_samples_per_sec_per_chip"], 3)
    except (OSError, KeyError, ValueError):
        anchor = None

    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec_per_chip",
                "value": round(train_sps, 1),
                "unit": "samples/s",
                "vs_baseline": vs_baseline,
                "extras": {
                    "field_evals_per_sec": round(field_evals_per_s, 1),
                    "train_nfe_per_solve": train_nfe,
                    "logprob_evals_per_sec": round(eval_sps, 1),
                    "batch": batch,
                    "train_step_ms": round(train_dt * 1e3, 2),
                    "logprob_ms": round(eval_dt * 1e3, 2),
                    "test_nfe": test_nfe,
                    "rtt_ms": round(rtt * 1e3, 2),
                    "fused_kernel": on_tpu,
                    "fused_kernel_roofline": roofline,
                    "adjoint_kernel_roofline": adjoint_roofline,
                    "exact_trace_config": exact_metrics,
                    "solver": "tsit5 rtol=1e-3 atol=1e-6 (reference effective default)",
                    "tspan": [0.0, 13.0],
                    "anchor": anchor,
                    "backend": jax.default_backend(),
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
