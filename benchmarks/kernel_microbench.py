"""Megakernel deep-dive: measured speed-of-light for the fused solve.

The HBM roofline is the wrong model for a solve-in-kernel megakernel — its
state lives in VMEM for the whole trajectory, so the binding resource is MXU
issue time for the stage matmuls ((dz,B)x(dz,H) with dz=16, H=48: tiny
contraction dims, so the systolic array is streaming-bound on the batch
dimension, not FLOP-bound).

This script measures, on the real chip:
  1. xla_stage_us   — one TRAIN dynamics eval (4 stage matmuls + tanh/VPU
                      work) as a bare XLA scan with data dependence: the
                      best unfused implementation of one NFE (pays HBM per
                      stage, so the VMEM-resident kernel can beat it).
  2. fused_nfe_us   — per-NFE cost of the forward megakernel (wall / NFE),
                      TRAIN and TEST, f32 and bf16 stage matmuls.
  3. adjoint_nfe_us — per-NFE cost of the backward (adjoint) megakernel,
                      extracted from a full grad step minus the forward.
  4. speedup        — xla_stage (best unfused) / fused per-NFE.

Run: python benchmarks/kernel_microbench.py [--batch 4096]
Prints one JSON line.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def _readback(tree) -> float:
    leaf = jax.tree_util.tree_leaves(tree)[0]
    return float(np.asarray(leaf).ravel()[0])


def _time(fn, carry, iters):
    carry = fn(carry, 0)
    _readback(carry)
    t0 = time.perf_counter()
    for i in range(iters):
        carry = fn(carry, i + 1)
    _readback(carry)
    return (time.perf_counter() - t0) / iters


def stage_chain_time(
    ps, B, dz, H, bf16: bool, length: int = 2048, rtt: float = 0.0, reps: int = 3
) -> float:
    """Per-stage device time of the TRAIN dynamics math as a bare XLA scan.

    One dispatch per measurement (`length` stages inside the scan), measured
    readback RTT subtracted, min over `reps` — see bench.py's methodology
    note on remote-attached runtimes.
    """
    from continuousnf_tpu.ops.fused_solve import ChainSpec, _stage_train

    spec = ChainSpec((dz, H), (H, dz), (True, True), 0)
    ws = [ps[0]["w"], ps[1]["w"]]
    bs = [ps[0]["b"].reshape(-1, 1), ps[1]["b"].reshape(-1, 1)]

    @jax.jit
    def chain(zt, epst):
        def body(z, _):
            y, rates = _stage_train(spec, z, None, epst, ws, bs, True, True, bf16, 1)
            # data dependence: feed the field value back in (plus rate leak
            # so nothing is dead code)
            return y + 1e-6 * rates[:1], None

        out, _ = jax.lax.scan(body, zt, None, length=length)
        return out

    zt = jax.random.normal(jax.random.PRNGKey(0), (dz, B))
    epst = jax.random.normal(jax.random.PRNGKey(1), (dz, B))
    _readback(chain(zt, epst))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _readback(chain(zt, epst))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - rtt, 1e-9) / length


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()

    import continuousnf_tpu as cnf
    from continuousnf_tpu import Mode

    nvars, naug = 8, 8
    n_in = nvars + naug
    B = args.batch
    nn = cnf.MLP((n_in, 3 * n_in, n_in))
    key = jax.random.PRNGKey(2)
    xs = jax.random.uniform(jax.random.PRNGKey(1), (B, nvars), dtype=jnp.float32)

    out = {"batch": B, "backend": jax.default_backend()}

    def mk(fused, bf16):
        return cnf.construct(
            cnf.RNODE, nn, nvars, naug, tspan=(0.0, 1.0), steer_rate=0.1,
            lam3=1e-2, compute_mode=cnf.VecJacMode(fused=fused, bf16=bf16),
        )

    ps = mk(True, False).init(jax.random.PRNGKey(0))

    # 1. bare XLA stage ceiling
    for bf16 in (False, True):
        t = stage_chain_time(ps, B, n_in, 3 * n_in, bf16)
        out[f"xla_stage_us_{'bf16' if bf16 else 'f32'}"] = round(t * 1e6, 3)

    # 2. fused forward per-NFE (TRAIN + TEST), f32 and bf16
    results = {}
    for bf16 in (False, True):
        icnf = mk(True, bf16)
        tag = "bf16" if bf16 else "f32"

        @jax.jit
        def fwd(x, k):
            lp, _, stats = cnf.inference(icnf, Mode.TRAIN, x, ps, key=k)
            return x + 1e-6 * lp[:, None], stats.nfe

        dt = _time(lambda c, i: fwd(c[0], jax.random.fold_in(key, i)), (xs, 0), iters=8)
        nfe = int(fwd(xs, key)[1])
        results[f"train_fwd_nfe_us_{tag}"] = round(dt / max(nfe, 1) * 1e6, 3)
        results[f"train_fwd_nfe_{tag}"] = nfe

        @jax.jit
        def fwd_test(x):
            lp, _, stats = cnf.inference(icnf, Mode.TEST, x, ps)
            return x + 1e-6 * lp[:, None], stats.nfe

        dt = _time(lambda c, i: fwd_test(c[0]), (xs, 0), iters=8)
        nfe = int(fwd_test(xs)[1])
        results[f"test_nfe_us_{tag}"] = round(dt / max(nfe, 1) * 1e6, 3)

        # 3. full grad step (fused forward + adjoint backward)
        @jax.jit
        def grad_step(x, k):
            g = jax.grad(lambda p: cnf.loss(icnf, Mode.TRAIN, x, p, key=k))(ps)
            leaf = jax.tree_util.tree_leaves(g)[0]
            return x + 1e-9 * jnp.sum(leaf), None

        dt_g = _time(lambda c, i: grad_step(c[0], jax.random.fold_in(key, i)), (xs, None), iters=6)
        results[f"grad_step_us_{tag}"] = round(dt_g * 1e6, 1)
    out.update(results)

    # 4. speedups: fused kernel vs the best unfused (bare-XLA) stage impl
    for tag in ("f32", "bf16"):
        ceiling = out[f"xla_stage_us_{tag}"]
        got = out.get(f"train_fwd_nfe_us_{tag}")
        if got:
            out[f"speedup_vs_xla_stage_{tag}"] = round(ceiling / got, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
