"""Performance accounting: roofline model for the fused dynamics kernel.

The reference's only perf machinery is relative PkgBenchmark CI (SURVEY §6);
BASELINE asks for absolute per-chip roofline utilization of the fused
dynamics kernel.  The fused op at the reference's tiny channel widths is
HBM-bandwidth-bound (channel dims 16/48 vs the 128x128 MXU), so the relevant
ceiling is bytes/s, with FLOPs/s reported alongside.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Tuple

import jax
import numpy as np


@dataclasses.dataclass(frozen=True)
class ChipSpec:
    """Peak numbers for a TPU chip (per-chip, not per-core)."""

    name: str
    peak_bf16_tflops: float
    peak_f32_tflops: float
    hbm_gbps: float


#: TPU v5e (v5 lite): 197 bf16 TFLOPS, ~49 f32 TFLOPS, 819 GB/s HBM.
V5E = ChipSpec(name="v5e", peak_bf16_tflops=197.0, peak_f32_tflops=49.0, hbm_gbps=819.0)


def fused_dynamics_cost(B: int, dz: int, H: int, dtype_bytes: int = 4) -> Tuple[float, float]:
    """(flops, hbm_bytes) of one fused dynamics evaluation.

    FLOPs: 4 matmuls (fwd z@W1, h@W2; vjp g2@W2^T, g1@W1^T) = 8*B*dz*H MACs->
    flops, plus O(B*(dz+H)) elementwise (tanh, gating, reductions).
    Bytes: the fused kernel reads z and eps, writes y and three per-sample
    scalars; intermediates stay in VMEM (that's the point).
    """
    flops = 8.0 * B * dz * H + 12.0 * B * (dz + H)
    hbm_bytes = dtype_bytes * (2.0 * B * dz + B * dz + 3.0 * B)
    return flops, hbm_bytes


def time_chained(fn: Callable, make_input, iters: int = 50) -> float:
    """Wall time per call of `fn`, chaining each call's input on the previous
    call's output (defeats async-dispatch overlap) and closing the region
    with a host readback (remote runtimes can report readiness early)."""
    x = make_input(None)
    out = fn(x)
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _i in range(iters):
        out = fn(make_input(out))
    _ = float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters


def roofline_report(
    measured_s: float,
    B: int,
    dz: int,
    H: int,
    chip: ChipSpec = V5E,
    measured_sol_s: float = None,
) -> dict:
    """Utilization of the fused dynamics eval.

    For the solve-in-kernel megakernel the classic HBM roofline is the wrong
    model — state stays VMEM-resident across the whole trajectory, so per-NFE
    HBM traffic is ~0 and the binding resource is MXU *issue* time: the stage
    matmuls have tiny contraction dims (dz=16 / H=48 vs the 128-wide systolic
    array), so each streams its batch dimension at far below peak FLOPs no
    matter how it is scheduled.  The honest ceiling is therefore *measured*:
    `measured_sol_s` should be the per-stage time of the same math as a bare
    XLA scan on the same chip (benchmarks/kernel_microbench.py) — the best
    the compiler can do for one NFE with zero solver overhead.  The analytic
    compute/bandwidth ceilings are reported alongside for context.
    """
    flops, hbm_bytes = fused_dynamics_cost(B, dz, H)
    t_compute = flops / (chip.peak_f32_tflops * 1e12)
    t_bw = hbm_bytes / (chip.hbm_gbps * 1e9)
    t_light = measured_sol_s if measured_sol_s else max(t_compute, t_bw)
    return {
        "chip": chip.name,
        "measured_us": measured_s * 1e6,
        "speed_of_light_us": t_light * 1e6,
        "sol_kind": "measured_xla_stage" if measured_sol_s else "analytic",
        "utilization": t_light / measured_s if measured_s > 0 else 0.0,
        "achieved_gflops": flops / measured_s / 1e9,
        "mxu_issue_note": (
            "VMEM-resident kernel: HBM roofline inapplicable; ceiling is MXU "
            "issue time for (16|48)-contraction stage matmuls"
        ),
        "analytic_compute_us": t_compute * 1e6,
        "analytic_hbm_us": t_bw * 1e6,
    }


class trace:
    """Context manager around `jax.profiler` for TensorBoard-viewable traces:

        with profiling.trace("/tmp/jax-trace"):
            train_step(...)
    """

    def __init__(self, log_dir: str):
        self.log_dir = log_dir

    def __enter__(self):
        jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        jax.profiler.stop_trace()
        return False


__all__ = [
    "ChipSpec",
    "V5E",
    "fused_dynamics_cost",
    "time_chained",
    "roofline_report",
    "trace",
]
