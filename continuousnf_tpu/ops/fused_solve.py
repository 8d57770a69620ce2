"""Whole-ODE-solve Pallas megakernel ("solve-in-kernel").

The fused dynamics kernel (fused_dynamics.py) still pays one kernel launch
per RK *stage* (~6 launches + controller ops per attempted step); on the
remote-attached TPU runtime per-iteration overhead (~95 us) dwarfs the
~1 us of actual compute (bench roofline: 6% utilization).  This module moves
the ENTIRE adaptive solve — all Tsit5 stages, the embedded error estimate,
and the PI step-size controller `lax.while_loop` — into ONE Pallas kernel,
so a full CNF transport (hundreds of NFE) is a single launch with all state
resident in VMEM.

Replaces, for the supported architecture (2-layer tanh MLP, the reference's
standard net, e.g. `/root/reference/test/regression_tests.jl:7`), the hot
path of `ode/solve.py::_solve_adaptive_while` with bit-compatible control
logic (same Hairer scaled-error norm over the full augmented state, same PI
controller constants, same accept/reject semantics, same NFE accounting).

Layout: everything is kept TRANSPOSED, `(rows, B)` — with tiny channel
widths (dz=16) a `(B, dz)` array pads its lane dim 16 -> 128 (8x waste),
while `(dz, B)` packs lanes with batch.  This is, amusingly, exactly the
reference's d x B state-matrix layout (`/root/reference/src/base_icnf.jl:275-281`).

Dynamics covered:
  * TRAIN — Hutchinson VJP, K >= 1 probes (stacked along the sublane axis;
    one forward pass + K unrolled backward passes per stage), with RNODE
    regularizer rates (reference `src/icnf.jl:318-350`, which is K=1 only);
    state rows [z | dlogp | E | n].
  * TRAIN exact (`ComputeMode.exact_trace`) — closed-form exact divergence
    AND exact Jacobian Frobenius norm via one precomputed (dz^2, H) matmul
    per stage (`_stage_train_exact`); the zero-variance estimator the
    flagship density-gate recipe trains with (docs/FLAGSHIP_GATE.md) runs
    fused at ~the K=1 Hutchinson cost.
  * TEST  — closed-form exact divergence of the 2-layer tanh MLP
    (see `fused_dynamics.exact_tanh_mlp_trace`); state rows [z | dlogp].

Gradients: the forward megakernel sits inside the continuous-adjoint
custom_vjp (`ode/adjoint.py`); the backward integration runs in the adjoint
megakernel below (batch-tiled, param-grad blocks integrated in-kernel; in
exact mode the precomputed pm matrix is differentiated as a fifth block and
chained back to w1/w2 outside).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import Mode, SolverOptions
from ..ode.tableaus import TABLEAUS, ButcherTableau, get_tableau

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# Mirror of the controller constants in ode/solve.py (keep in sync).
_SAFETY = 0.9
_QMIN = 0.2
_QMAX = 10.0
_EEST_FLOOR = 1.0e-4

# VMEM budget guard: above this working-set estimate, fall back to the
# per-stage path (the kernel keeps whole-batch state + stage registers
# resident).  Half the scoped-VMEM limit below: the estimate is a rough
# (conservative) live-set bound, and exact-trace stages carry (dz^2, B)
# transients that blow past the old 10 MiB guard at bench batch sizes while
# compiling fine under the 96 MiB scoped allocation (validated on-chip at
# B=4096 exact / B=16384 Hutchinson).
_VMEM_BUDGET_BYTES = 48 * 1024 * 1024

# Mosaic's default scoped-VMEM allocation limit is 16 MiB — well under the
# 128 MiB physical VMEM of a v5e core, and the adjoint megakernel's stack
# (stage registers + transposed-jvp temporaries) measurably needs ~24 MiB at
# B=4096 (compile-time "Scoped allocation ... exceeded scoped vmem limit"
# otherwise).  Raise the limit for the megakernels; the _VMEM_BUDGET_BYTES
# working-set guard above still bounds what we ask for.
_VMEM_LIMIT_BYTES = 96 * 1024 * 1024


def _compiler_params(interpret: bool):
    """Mosaic compiler params (None under interpret mode, which has no TPU)."""
    return None if interpret else pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)


def _safe_col_norm(v: jax.Array) -> jax.Array:
    """Per-column L2 norm over rows with a zero (not NaN) gradient at v=0 —
    the (rows, B) analog of `core.dynamics.safe_norm` (the adjoint kernel
    differentiates the stage with `jax.vjp`, so gradient behavior matters)."""
    sq = jnp.sum(v * v, axis=0, keepdims=True)
    pos = sq > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)


def _mm(a, b, dims, bf16: bool):
    """Stage matmul: optionally bf16 inputs (the MXU's native width — f32
    matmuls are emulated in multiple bf16 passes) with f32 accumulation.

    The f32 path pins Precision.HIGHEST: the MXU's default single-pass bf16
    rounding (~1e-3 relative) sits exactly at the solver's rtol=1e-3 error
    target, so the embedded error estimate measures matmul noise instead of
    truncation error and the controller grinds at a tiny-dt noise floor
    (10-100x the mathematically needed step count — see docs/ROOFLINE.md).
    Honest f32 stages cost ~3x per matmul and repay it tenfold in steps.
    """
    if bf16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=jnp.float32)
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _stage_train(
    zt,
    epst,
    w1,
    b1c,
    w2,
    b2c,
    norm_z: bool,
    norm_j: bool,
    bf16: bool = False,
    k_probes: int = 1,
):
    """One TRAIN dynamics eval in (rows, B) layout.

    zt: (dz, B); epst: (K*dz, B) — K Hutchinson probes stacked along the
    sublane axis (one forward pass, K unrolled backward passes; the trace
    estimate and ndot average over probes, matching `_hutchinson_field`);
    w1: (dz, H); b1c: (H, 1); w2: (H, dz); b2c: (dz, 1).
    Returns (k_z (dz, B), k_rates (3, B)) with rate rows [-tr, Edot, ndot].
    """
    dz = zt.shape[0]
    h = jnp.tanh(_mm(w1, zt, ((0,), (0,)), bf16) + b1c)  # (H, B)
    y = jnp.tanh(_mm(w2, h, ((0,), (0,)), bf16) + b2c)  # (dz, B)
    dy = 1.0 - y * y
    dh = 1.0 - h * h
    tr = None
    n_rate = None
    for k in range(k_probes):
        ek = epst[k * dz : (k + 1) * dz] if k_probes > 1 else epst
        g2 = ek * dy
        gh = _mm(w2, g2, ((1,), (0,)), bf16)
        g1 = gh * dh
        eJ = _mm(w1, g1, ((1,), (0,)), bf16)
        tr_k = jnp.sum(eJ * ek, axis=0, keepdims=True)  # (1, B)
        tr = tr_k if tr is None else tr + tr_k
        if norm_j:
            n_k = _safe_col_norm(eJ)
            n_rate = n_k if n_rate is None else n_rate + n_k
    if k_probes > 1:
        tr = tr / k_probes
        if norm_j:
            n_rate = n_rate / k_probes
    if norm_z:
        e_rate = _safe_col_norm(y)
    else:
        e_rate = jnp.zeros_like(tr)
    if not norm_j:
        n_rate = jnp.zeros_like(tr)
    rates = jnp.concatenate([-tr, e_rate, n_rate], axis=0)  # (3, B)
    return y, rates


def _stage_train_exact(zt, w1, b1c, w2, b2c, pm, norm_z, norm_j, bf16=False):
    """One exact-divergence TRAIN dynamics eval in (rows, B) layout.

    The zero-variance analog of `_stage_train` (ComputeMode.exact_trace):
    exact trace and exact Jacobian Frobenius norm via ONE extra matmul.  With
    J[b]_ij = dy_i * sum_h W2[h,i] dh_h W1[j,h], precompute (per solve —
    params are constant across stages)

        pm[(i,j), h] = W2[h,i] * W1[j,h]            (dz^2, H)

    so  mflat = pm @ dh  gives all dz^2 Jacobian inner sums for the whole
    batch in a single (dz^2, H) x (H, B) MXU pass.  The (dz^2, B) block is
    then immediately collapsed along a leading-dim reshape — (dz, dz, B),
    reduce axis 1 — into (dz, B) partials:

        s[i] = sum_j mflat[i,j]^2      d[i] = mflat[i,i]
        tr = sum_i dy_i * d_i          fro^2 = sum_i dy_i^2 * s_i

    Keeping exactly ONE (dz^2, B)-sized array alive matters: the first
    version materialized three (mflat, a dy-replication matmul, and their
    product) and measured 19.2 us/NFE at B=4096 — the ~12 MB/stage of
    transients spilled to HBM (~14.6 us at 819 GB/s, the whole gap).
    Matmul-volume ~1.5x the K=1 Hutchinson stage — the exact-trace recipe
    (the density-gate winner, docs/FLAGSHIP_GATE.md) runs at estimator-free
    kernel speed instead of the unfused XLA path.
    Reference: the exact-trace TrainMode family `/root/reference/src/icnf.jl:110-184`.
    """
    dz = zt.shape[0]
    h = jnp.tanh(_mm(w1, zt, ((0,), (0,)), bf16) + b1c)  # (H, B)
    y = jnp.tanh(_mm(w2, h, ((0,), (0,)), bf16) + b2c)  # (dz, B)
    dh = 1.0 - h * h
    dy = 1.0 - y * y
    mflat = _mm(pm, dh, ((1,), (0,)), bf16)  # (dz^2, B)
    m3 = mflat.reshape(dz, dz, mflat.shape[-1])  # (dz, dz, B): [i, j, b]
    d = jnp.sum(m3 * _eye3(dz, m3.dtype), axis=1)  # diag J_ii inner sums
    tr = jnp.sum(dy * d, axis=0, keepdims=True)  # (1, B)
    if norm_j:
        s = jnp.sum(m3 * m3, axis=1)  # (dz, B)
        fro_sq = jnp.sum(dy * dy * s, axis=0, keepdims=True)
        pos = fro_sq > 0
        n_rate = jnp.where(pos, jnp.sqrt(jnp.where(pos, fro_sq, 1.0)), 0.0)
    else:
        n_rate = jnp.zeros_like(tr)
    e_rate = _safe_col_norm(y) if norm_z else jnp.zeros_like(tr)
    rates = jnp.concatenate([-tr, e_rate, n_rate], axis=0)  # (3, B)
    return y, rates


def _eye3(dz: int, dtype):
    """(dz, dz, 1) identity mask built from iota (Mosaic-friendly constant)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (dz, dz, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (dz, dz, 1), 1)
    return (row == col).astype(dtype)


def exact_stage_consts(w1, w2):
    """pm for `_stage_train_exact` — a (traced) function of the params,
    precomputed once per solve (params are constant across stages)."""
    dz, H = w1.shape
    pm = (w2.T[:, None, :] * w1[None, :, :]).reshape(dz * dz, H)
    return pm


def exact_pm_chain(g_pm, w1, w2):
    """Chain a pm-cotangent back to (w1, w2): pm[(i,j),h] = w2[h,i]*w1[j,h]."""
    dz, H = w1.shape
    g = g_pm.reshape(dz, dz, H)
    g_w2 = jnp.einsum("ijh,jh->hi", g, w1)
    g_w1 = jnp.einsum("ijh,hi->jh", g, w2)
    return g_w1, g_w2


def _stage_test(zt, w1, b1c, w2, b2c, bf16: bool = False):
    """One TEST dynamics eval: closed-form exact divergence, (rows, B) layout.

    tr_b = sum_i dy[i,b] * (M @ dh)[i,b]  with  M[i,h] = w1[i,h] * w2[h,i].
    Returns (k_z (dz, B), k_rates (1, B)) with the single rate row -tr.
    """
    h = jnp.tanh(_mm(w1, zt, ((0,), (0,)), bf16) + b1c)
    y = jnp.tanh(_mm(w2, h, ((0,), (0,)), bf16) + b2c)
    dh = 1.0 - h * h  # (H, B)
    dy = 1.0 - y * y  # (dz, B)
    m = w1 * w2.T  # (dz, H)
    mdh = _mm(m, dh, ((1,), (0,)), bf16)
    tr = jnp.sum(dy * mdh, axis=0, keepdims=True)  # (1, B)
    return y, -tr


def _ct_safe_norm(ct, norm):
    """Cotangent factor of `_safe_col_norm`: ct/||v|| with 0 at v=0 (the same
    subgradient jax.vjp derives from the double-where)."""
    pos = norm > 0
    return jnp.where(pos, ct / jnp.where(pos, norm, 1.0), 0.0)


def _stage_train_fwdbwd(
    zt, epst, w1, b1c, w2, b2c, norm_z, norm_j, bf16, k_probes, ct_y, ct_r
):
    """Forward + hand-derived VJP of `_stage_train` in one pass.

    Semantically `jax.vjp(_stage_train, ...)` applied to `(ct_y, ct_r)` — but
    written so every cotangent matmul produces its output directly in the
    kernel's (rows, B) layout.  JAX's dot transpose rule emits param-grad and
    activation-grad dots whose results land batch-major and are then
    `transpose`d back: four (B, H)/(B, dz)-sized relayouts per stage, pure
    VPU shuffle work that measured as large as the matmuls themselves
    (docs/ROOFLINE.md round-4 audit).  Returns
    (kz, kr, ct_zt, ct_w1, ct_b1, ct_w2, ct_b2), cotangents unnegated.
    """
    dz = zt.shape[0]
    c00, c10, cB = ((0,), (0,)), ((1,), (0,)), ((1,), (1,))
    h = jnp.tanh(_mm(w1, zt, c00, bf16) + b1c)  # (H, B)
    y = jnp.tanh(_mm(w2, h, c00, bf16) + b2c)  # (dz, B)
    dy = 1.0 - y * y
    dh = 1.0 - h * h

    # forward probe loop (residuals kept for the backward loop)
    g2s, ghs, g1s, eJs, ns = [], [], [], [], []
    tr = None
    n_rate = None
    for k in range(k_probes):
        ek = epst[k * dz : (k + 1) * dz] if k_probes > 1 else epst
        g2 = ek * dy
        gh = _mm(w2, g2, c10, bf16)
        g1 = gh * dh
        eJ = _mm(w1, g1, c10, bf16)
        g2s.append(g2)
        ghs.append(gh)
        g1s.append(g1)
        eJs.append(eJ)
        tr_k = jnp.sum(eJ * ek, axis=0, keepdims=True)
        tr = tr_k if tr is None else tr + tr_k
        if norm_j:
            nk = _safe_col_norm(eJ)
            ns.append(nk)
            n_rate = nk if n_rate is None else n_rate + nk
    if k_probes > 1:
        tr = tr / k_probes
        if norm_j:
            n_rate = n_rate / k_probes
    e_rate = _safe_col_norm(y) if norm_z else jnp.zeros_like(tr)
    if not norm_j:
        n_rate = jnp.zeros_like(tr)
    kr = jnp.concatenate([-tr, e_rate, n_rate], axis=0)

    # backward
    inv_k = 1.0 / k_probes
    ct_tr = (-inv_k) * ct_r[0:1]  # rates row 0 is -tr; mean over probes
    ct_n = (inv_k * ct_r[2:3]) if norm_j else None
    ct_ytot = ct_y
    if norm_z:
        ct_ytot = ct_ytot + y * _ct_safe_norm(ct_r[1:2], e_rate)
    ct_w1 = ct_w2 = ct_h = None
    for k in range(k_probes):
        ek = epst[k * dz : (k + 1) * dz] if k_probes > 1 else epst
        ct_eJ = ek * ct_tr
        if norm_j:
            ct_eJ = ct_eJ + eJs[k] * _ct_safe_norm(ct_n, ns[k])
        # eJ = w1 @ g1
        ct_g1 = _mm(w1, ct_eJ, c00, bf16)  # (H, B)
        w1g = _mm(ct_eJ, g1s[k], cB, bf16)  # (dz, H)
        ct_w1 = w1g if ct_w1 is None else ct_w1 + w1g
        # g1 = gh * dh
        ct_gh = ct_g1 * dh
        hk = (-2.0 * h) * (ct_g1 * ghs[k])
        ct_h = hk if ct_h is None else ct_h + hk
        # gh = w2 @ g2
        ct_g2 = _mm(w2, ct_gh, c00, bf16)  # (dz, B)
        w2g = _mm(ct_gh, g2s[k], cB, bf16)  # (H, dz)
        ct_w2 = w2g if ct_w2 is None else ct_w2 + w2g
        # g2 = eps * dy
        ct_ytot = ct_ytot + (-2.0 * y) * (ek * ct_g2)
    ct_pre2 = ct_ytot * dy
    ct_h = ct_h + _mm(w2, ct_pre2, c10, bf16)
    ct_w2 = ct_w2 + _mm(h, ct_pre2, cB, bf16)
    ct_b2 = jnp.sum(ct_pre2, axis=1, keepdims=True)
    ct_pre1 = ct_h * dh
    ct_zt = _mm(w1, ct_pre1, c10, bf16)
    ct_w1 = ct_w1 + _mm(zt, ct_pre1, cB, bf16)
    ct_b1 = jnp.sum(ct_pre1, axis=1, keepdims=True)
    return y, kr, ct_zt, ct_w1, ct_b1, ct_w2, ct_b2


def _stage_train_exact_fwdbwd(
    zt, w1, b1c, w2, b2c, pm, norm_z, norm_j, bf16, ct_y, ct_r
):
    """Forward + hand-derived VJP of `_stage_train_exact` (see
    `_stage_train_fwdbwd` for why not jax.vjp; same single-live-(dz^2,B)
    discipline as the forward stage).  Returns
    (kz, kr, ct_zt, ct_w1, ct_b1, ct_w2, ct_b2, ct_pm), unnegated."""
    dz = zt.shape[0]
    c00, c10, cB = ((0,), (0,)), ((1,), (0,)), ((1,), (1,))
    h = jnp.tanh(_mm(w1, zt, c00, bf16) + b1c)
    y = jnp.tanh(_mm(w2, h, c00, bf16) + b2c)
    dh = 1.0 - h * h
    dy = 1.0 - y * y
    mflat = _mm(pm, dh, c10, bf16)  # (dz^2, B)
    m3 = mflat.reshape(dz, dz, mflat.shape[-1])
    eye3 = _eye3(dz, m3.dtype)
    d = jnp.sum(m3 * eye3, axis=1)  # (dz, B)
    tr = jnp.sum(dy * d, axis=0, keepdims=True)
    s = jnp.sum(m3 * m3, axis=1)  # (dz, B)
    if norm_j:
        fro_sq = jnp.sum(dy * dy * s, axis=0, keepdims=True)
        pos = fro_sq > 0
        n_rate = jnp.where(pos, jnp.sqrt(jnp.where(pos, fro_sq, 1.0)), 0.0)
    else:
        n_rate = jnp.zeros_like(tr)
    e_rate = _safe_col_norm(y) if norm_z else jnp.zeros_like(tr)
    kr = jnp.concatenate([-tr, e_rate, n_rate], axis=0)

    ct_tr = -ct_r[0:1]
    ct_d = dy * ct_tr  # (dz, B)
    ct_dy = d * ct_tr
    if norm_j:
        # n = sqrt(fro2) -> dn/dfro2 = 1/(2n), safe at 0.
        ct_fro2 = 0.5 * _ct_safe_norm(ct_r[2:3], n_rate)
        ct_s = (dy * dy) * ct_fro2
        ct_dy = ct_dy + 2.0 * dy * s * ct_fro2
    else:
        ct_s = None
    ct_m3 = eye3 * ct_d[:, None, :]
    if ct_s is not None:
        ct_m3 = ct_m3 + (2.0 * ct_s[:, None, :]) * m3
    ct_mflat = ct_m3.reshape(dz * dz, mflat.shape[-1])
    ct_dh = _mm(pm, ct_mflat, c00, bf16)  # (H, B)
    ct_pm = _mm(ct_mflat, dh, cB, bf16)  # (dz^2, H)
    ct_ytot = ct_y + (-2.0 * y) * ct_dy
    if norm_z:
        ct_ytot = ct_ytot + y * _ct_safe_norm(ct_r[1:2], e_rate)
    ct_pre2 = ct_ytot * dy
    ct_h = _mm(w2, ct_pre2, c10, bf16) + (-2.0 * h) * ct_dh
    ct_w2 = _mm(h, ct_pre2, cB, bf16)
    ct_b2 = jnp.sum(ct_pre2, axis=1, keepdims=True)
    ct_pre1 = ct_h * dh
    ct_zt = _mm(w1, ct_pre1, c10, bf16)
    ct_w1 = _mm(zt, ct_pre1, cB, bf16)
    ct_b1 = jnp.sum(ct_pre1, axis=1, keepdims=True)
    return y, kr, ct_zt, ct_w1, ct_b1, ct_w2, ct_b2, ct_pm


def _stage_test_fwdbwd(zt, w1, b1c, w2, b2c, bf16, ct_y, ct_r):
    """Forward + hand-derived VJP of `_stage_test` (closed-form exact
    divergence).  `ct_r` is the (1, B) cotangent of the -tr rate row.
    Returns (kz, kr, ct_zt, ct_w1, ct_b1, ct_w2, ct_b2), unnegated."""
    c00, c10, cB = ((0,), (0,)), ((1,), (0,)), ((1,), (1,))
    h = jnp.tanh(_mm(w1, zt, c00, bf16) + b1c)
    y = jnp.tanh(_mm(w2, h, c00, bf16) + b2c)
    dh = 1.0 - h * h
    dy = 1.0 - y * y
    m = w1 * w2.T  # (dz, H) — small
    mdh = _mm(m, dh, c10, bf16)  # (dz, B)
    tr = jnp.sum(dy * mdh, axis=0, keepdims=True)

    ct_tr = -ct_r[0:1]
    ct_dy = mdh * ct_tr
    ct_mdh = dy * ct_tr
    ct_dh = _mm(m, ct_mdh, c00, bf16)  # (H, B)
    ct_m = _mm(ct_mdh, dh, cB, bf16)  # (dz, H) — small
    ct_ytot = ct_y + (-2.0 * y) * ct_dy
    ct_pre2 = ct_ytot * dy
    ct_h = _mm(w2, ct_pre2, c10, bf16) + (-2.0 * h) * ct_dh
    ct_w2 = _mm(h, ct_pre2, cB, bf16) + (ct_m * w1).T  # small transpose
    ct_b2 = jnp.sum(ct_pre2, axis=1, keepdims=True)
    ct_pre1 = ct_h * dh
    ct_zt = _mm(w1, ct_pre1, c10, bf16)
    ct_w1 = _mm(zt, ct_pre1, cB, bf16) + ct_m * w2.T
    ct_b1 = jnp.sum(ct_pre1, axis=1, keepdims=True)
    return y, -tr, ct_zt, ct_w1, ct_b1, ct_w2, ct_b2


class _Carry(NamedTuple):
    t: jax.Array
    dt: jax.Array
    eest_prev: jax.Array
    steps: jax.Array
    accepted: jax.Array
    z: jax.Array  # (dz, B)
    acc: jax.Array  # (nacc, B)
    k1z: jax.Array  # (dz, B) FSAL register (field value)
    k1r: jax.Array  # (nacc, B) FSAL register (rates)


def _make_solve_kernel(
    tab: ButcherTableau,
    *,
    train: bool,
    norm_z: bool,
    norm_j: bool,
    rtol: float,
    atol: float,
    max_steps: int,
    n_elems: int,
    bf16: bool = False,
    k_probes: int = 1,
    exact: bool = False,
):
    """Build the kernel body.  All shapes/flags are baked in at trace time."""
    beta1 = 7.0 / (10.0 * tab.order)
    beta2 = 2.0 / (5.0 * tab.order)

    def kernel(ts_ref, z0_ref, *rest):
        pm = epst = None
        if train and exact:
            (pm_ref, w1_ref, b1_ref, w2_ref, b2_ref,
             zT_ref, accT_ref, st_ref) = rest
            pm = pm_ref[:]
        elif train:
            eps_ref, w1_ref, b1_ref, w2_ref, b2_ref, zT_ref, accT_ref, st_ref = rest
            epst = eps_ref[:]
        else:
            w1_ref, b1_ref, w2_ref, b2_ref, zT_ref, accT_ref, st_ref = rest
        w1 = w1_ref[:]
        b1c = b1_ref[:]
        w2 = w2_ref[:]
        b2c = b2_ref[:]

        def stage(zt):
            if train and exact:
                return _stage_train_exact(
                    zt, w1, b1c, w2, b2c, pm, norm_z, norm_j, bf16
                )
            if train:
                return _stage_train(
                    zt, epst, w1, b1c, w2, b2c, norm_z, norm_j, bf16, k_probes
                )
            return _stage_test(zt, w1, b1c, w2, b2c, bf16)

        f32 = jnp.float32
        t0 = ts_ref[0, 0]
        t1 = ts_ref[0, 1]
        dt0 = ts_ref[0, 2]
        tdir = jnp.sign(t1 - t0)

        z0 = z0_ref[:]
        k1z0, k1r0 = stage(z0)
        acc0 = jnp.zeros_like(k1r0)

        init = _Carry(
            t=t0,
            dt=dt0,
            eest_prev=jnp.asarray(1.0, f32),
            steps=jnp.asarray(0, jnp.int32),
            accepted=jnp.asarray(0, jnp.int32),
            z=z0,
            acc=acc0,
            k1z=k1z0,
            k1r=k1r0,
        )

        def cond(c: _Carry):
            return ((c.t - t1) * tdir < 0) & (c.steps < max_steps)

        def body(c: _Carry):
            remaining = jnp.abs(t1 - c.t)
            is_last = jnp.abs(c.dt) >= remaining
            dt_use = tdir * jnp.minimum(jnp.abs(c.dt), remaining)

            ks_z = [c.k1z]
            ks_r = [c.k1r]
            for i in range(1, tab.num_stages):
                zi = c.z
                for j, aij in enumerate(tab.a[i]):
                    if aij != 0.0:
                        zi = zi + (dt_use * f32(aij)) * ks_z[j]
                kz, kr = stage(zi)
                ks_z.append(kz)
                ks_r.append(kr)

            y_new = c.z
            a_new = c.acc
            for i, bi in enumerate(tab.b):
                if bi != 0.0:
                    y_new = y_new + (dt_use * f32(bi)) * ks_z[i]
                    a_new = a_new + (dt_use * f32(bi)) * ks_r[i]
            err_z = jnp.zeros_like(c.z)
            err_a = jnp.zeros_like(c.acc)
            for i, bti in enumerate(tab.btilde):
                if bti != 0.0:
                    err_z = err_z + (dt_use * f32(bti)) * ks_z[i]
                    err_a = err_a + (dt_use * f32(bti)) * ks_r[i]

            # Hairer scaled error norm over the full augmented state —
            # identical element set to the flat-state norm in ode/solve.py.
            sc_z = atol + rtol * jnp.maximum(jnp.abs(c.z), jnp.abs(y_new))
            sc_a = atol + rtol * jnp.maximum(jnp.abs(c.acc), jnp.abs(a_new))
            sumsq = jnp.sum(jnp.square(err_z / sc_z)) + jnp.sum(jnp.square(err_a / sc_a))
            eest = jnp.sqrt(sumsq / n_elems)
            finite = (
                jnp.isfinite(eest)
                & jnp.all(jnp.isfinite(y_new))
                & jnp.all(jnp.isfinite(a_new))
            )
            accept = (eest <= 1.0) & finite

            # Mosaic has no scalar powf; arguments are positive (floored), so
            # x**p == exp(p*log(x)) exactly in the controller's regime.
            powp = lambda x, p: jnp.exp(f32(p) * jnp.log(x))
            eest_c = jnp.maximum(eest, f32(_EEST_FLOOR))
            q_acc = _SAFETY * powp(eest_c, -beta1) * powp(c.eest_prev, beta2)
            q_acc = jnp.where(jnp.isfinite(q_acc), q_acc, _QMIN)
            q_rej = _SAFETY * powp(eest_c, -1.0 / tab.order)
            q_rej = jnp.where(jnp.isfinite(q_rej), q_rej, _QMIN)
            q_rej = jnp.where(finite, q_rej, f32(_QMIN))
            dt_next = jnp.where(
                accept,
                dt_use * jnp.clip(q_acc, _QMIN, _QMAX),
                dt_use * jnp.clip(q_rej, _QMIN, 1.0),
            )

            t_next = jnp.where(accept, jnp.where(is_last, t1, c.t + dt_use), c.t)
            # FSAL: the last stage of an accepted step is f at the new point.
            return _Carry(
                t=t_next,
                dt=dt_next,
                eest_prev=jnp.where(accept, eest_c, c.eest_prev),
                steps=c.steps + 1,
                accepted=c.accepted + accept.astype(jnp.int32),
                z=jnp.where(accept, y_new, c.z),
                acc=jnp.where(accept, a_new, c.acc),
                k1z=jnp.where(accept, ks_z[-1], c.k1z),
                k1r=jnp.where(accept, ks_r[-1], c.k1r),
            )

        final = jax.lax.while_loop(cond, body, init)
        zT_ref[:] = final.z
        accT_ref[:] = final.acc
        st_ref[0, 0] = final.steps
        st_ref[0, 1] = final.accepted

    return kernel


def _vmem_estimate(
    tab: ButcherTableau,
    dz: int,
    hidden: int,
    B: int,
    nacc: int,
    k_probes: int = 1,
    exact: bool = False,
) -> int:
    """Rough live working-set bound (f32 bytes) for the budget guard."""
    rows = (tab.num_stages + 4) * (dz + nacc) + 6 * hidden + (1 + k_probes) * dz
    if exact:
        # mflat/dyrep/m2 (dz^2, B) transients of the exact stage.
        rows += 3 * dz * dz
    return 4 * B * rows


def _run_solve_kernel(
    tab: ButcherTableau,
    *,
    train: bool,
    norm_z: bool,
    norm_j: bool,
    rtol: float,
    atol: float,
    max_steps: int,
    bf16: bool,
    interpret: bool,
    w1,
    b1,
    w2,
    b2,
    z0,
    eps,
    t0,
    t1,
    dt_init,
    exact: bool = False,
):
    """Launch the megakernel.  z0 is (B, dz) batch-major, eps (K, B, dz);
    transposition to the kernel's (rows, B) layout happens here (one cheap
    relayout per solve)."""
    B, dz = z0.shape
    H = w1.shape[1]
    nacc = 3 if train else 1
    n_elems = B * (dz + nacc)
    k_probes = eps.shape[0] if (train and not exact) else 1

    kernel = _make_solve_kernel(
        tab,
        train=train,
        norm_z=norm_z,
        norm_j=norm_j,
        rtol=rtol,
        atol=atol,
        max_steps=max_steps,
        n_elems=n_elems,
        bf16=bf16,
        k_probes=k_probes,
        exact=exact,
    )

    ts = jnp.stack(
        [
            jnp.asarray(t0, jnp.float32),
            jnp.asarray(t1, jnp.float32),
            jnp.asarray(dt_init, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
        ]
    ).reshape(1, 4)

    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    inputs = [ts, z0.T]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), vspec()]
    if train and exact:
        inputs.append(exact_stage_consts(w1, w2))
        in_specs.append(vspec())
    elif train:
        # (K, B, dz) -> probes stacked along the sublane axis, (K*dz, B).
        inputs.append(jnp.moveaxis(eps, 2, 1).reshape(k_probes * dz, B))
        in_specs.append(vspec())
    inputs += [w1, b1.reshape(H, 1), w2, b2.reshape(dz, 1)]
    in_specs += [vspec(), vspec(), vspec(), vspec()]

    zT_t, accT, stats = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=[
            vspec(),
            vspec(),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((dz, B), jnp.float32),
            jax.ShapeDtypeStruct((nacc, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(*inputs)
    return zT_t.T, accT, stats[0, 0], stats[0, 1]


def _make_adjoint_kernel(
    tab: ButcherTableau,
    *,
    train: bool,
    norm_z: bool,
    norm_j: bool,
    rtol: float,
    atol: float,
    max_steps: int,
    n_elems: int,
    bf16: bool = False,
    k_probes: int = 1,
    exact: bool = False,
):
    """Kernel for the continuous-adjoint (backsolve) backward integration.

    State blocks: y = (z, acc), a_y = (a_z, a_acc), and param grads gp.  The
    Hutchinson probes are Monte-Carlo constants — BACKSOLVE returns a zero
    eps-cotangent (see ode/adjoint.py), so no (K*dz, B) probe-grad block is
    integrated.  The augmented dynamics stage is generated by `jax.vjp`
    of the forward stage at TRACE time — the transposed second-order math
    lowers into the kernel as plain matmul/elementwise ops.  a_acc is constant
    (the field never reads the accumulators) and acc/gp never feed back
    into stages, so only (z, a_z) carry stage registers.

    The kernel runs on a grid over batch tiles (the doubled adjoint working
    set does not fit VMEM at large B): each tile integrates its sub-batch
    with its own adaptive grid — a valid (if anything tighter) error control
    for the gradient path; param grads accumulate across the sequential grid
    iterations.  With one tile the control decisions match the XLA backward
    exactly.
    """
    beta1 = 7.0 / (10.0 * tab.order)
    beta2 = 2.0 / (5.0 * tab.order)

    n_gp = 5 if (train and exact) else 4

    def kernel(ts_ref, z_ref, acc_ref, az_ref, aacc_ref, *rest):
        pm = epst = None
        if train and exact:
            (pm_ref, w1_ref, b1_ref, w2_ref, b2_ref,
             z0_ref, acc0_ref, az0_ref, gw1_ref, gb1_ref, gw2_ref, gb2_ref,
             gpm_ref, st_ref) = rest
            pm = pm_ref[:]
        elif train:
            (eps_ref, w1_ref, b1_ref, w2_ref, b2_ref,
             z0_ref, acc0_ref, az0_ref, gw1_ref, gb1_ref, gw2_ref, gb2_ref,
             st_ref) = rest
            epst = eps_ref[:]
        else:
            (w1_ref, b1_ref, w2_ref, b2_ref,
             z0_ref, acc0_ref, az0_ref, gw1_ref, gb1_ref, gw2_ref, gb2_ref,
             st_ref) = rest
        w1 = w1_ref[:]
        b1c = b1_ref[:]
        w2 = w2_ref[:]
        b2c = b2_ref[:]
        aacc = aacc_ref[:]  # constant over the backward solve

        def aug_stage(zi, azi):
            """(kz, k_acc_rates, k_az, k_gp(n_gp-tuple)).  The probes are
            closed over as constants — no eps cotangent is computed (BACKSOLVE
            treats them as non-differentiable; see ode/adjoint.py).  In exact
            mode `pm` is differentiated as a fifth parameter block; its
            cotangent chains back to (w1, w2) outside the kernel
            (`exact_pm_chain`) — chaining after integration equals
            integrating the chained quantity (the chain rule is linear and
            time-independent).

            Hand-derived fwd+bwd (`_stage_*_fwdbwd`) instead of `jax.vjp`:
            AD's dot transpose rule materializes four big batch-major
            relayouts per stage (see `_stage_train_fwdbwd`); the hand form is
            transpose-free and tested equal to jax.vjp
            (tests/test_fused_solve.py::test_fwdbwd_matches_jax_vjp)."""
            if train and exact:
                kz, kr, zb, *pbs = _stage_train_exact_fwdbwd(
                    zi, w1, b1c, w2, b2c, pm,
                    norm_z, norm_j, bf16, azi, aacc,
                )
            elif train:
                kz, kr, zb, *pbs = _stage_train_fwdbwd(
                    zi, epst, w1, b1c, w2, b2c,
                    norm_z, norm_j, bf16, k_probes, azi, aacc,
                )
            else:
                kz, kr, zb, *pbs = _stage_test_fwdbwd(
                    zi, w1, b1c, w2, b2c, bf16, azi, aacc
                )
            return kz, kr, -zb, tuple(-p for p in pbs)

        f32 = jnp.float32
        t0 = ts_ref[0, 0]  # solve runs t0 -> t1 = tspan end -> start
        t1 = ts_ref[0, 1]
        dt0 = ts_ref[0, 2]
        tdir = jnp.sign(t1 - t0)

        z_init = z_ref[:]
        az_init = az_ref[:]
        kz0, kr0, kaz0, kgp0 = aug_stage(z_init, az_init)
        gp0 = tuple(jnp.zeros_like(g) for g in kgp0)

        # carry: (t, dt, eest_prev, steps, accepted,
        #         z, acc, az, gp(4), k1z, k1r, k1az, k1gp(4))
        init = (
            t0,
            dt0,
            jnp.asarray(1.0, f32),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            z_init,
            acc_ref[:],
            az_init,
            gp0,
            kz0,
            kr0,
            kaz0,
            kgp0,
        )

        def cond(c):
            return ((c[0] - t1) * tdir < 0) & (c[3] < max_steps)

        def body(c):
            (t, dt, eest_prev, steps, accepted,
             z, acc, az, gp, k1z, k1r, k1az, k1gp) = c
            remaining = jnp.abs(t1 - t)
            is_last = jnp.abs(dt) >= remaining
            dt_use = tdir * jnp.minimum(jnp.abs(dt), remaining)

            ksz, ksr, ksaz, ksgp = [k1z], [k1r], [k1az], [k1gp]
            for i in range(1, tab.num_stages):
                zi = z
                azi = az
                for j, aij in enumerate(tab.a[i]):
                    if aij != 0.0:
                        zi = zi + (dt_use * f32(aij)) * ksz[j]
                        azi = azi + (dt_use * f32(aij)) * ksaz[j]
                out = aug_stage(zi, azi)
                ksz.append(out[0])
                ksr.append(out[1])
                ksaz.append(out[2])
                ksgp.append(out[3])

            def comb(base, ks, coeffs):
                out = base
                for i, ci in enumerate(coeffs):
                    if ci != 0.0:
                        out = out + (dt_use * f32(ci)) * ks[i]
                return out

            z_new = comb(z, ksz, tab.b)
            acc_new = comb(acc, ksr, tab.b)
            az_new = comb(az, ksaz, tab.b)
            gp_new = tuple(
                comb(gp[m], [k[m] for k in ksgp], tab.b) for m in range(n_gp)
            )

            zero = lambda x: jnp.zeros_like(x)
            err_z = comb(zero(z), ksz, tab.btilde)
            err_acc = comb(zero(acc), ksr, tab.btilde)
            err_az = comb(zero(az), ksaz, tab.btilde)
            err_gp = tuple(
                comb(zero(gp[m]), [k[m] for k in ksgp], tab.btilde) for m in range(n_gp)
            )

            def blk(err, old, new):
                sc = atol + rtol * jnp.maximum(jnp.abs(old), jnp.abs(new))
                return jnp.sum(jnp.square(err / sc))

            sumsq = (
                blk(err_z, z, z_new)
                + blk(err_acc, acc, acc_new)
                + blk(err_az, az, az_new)
            )
            for m in range(n_gp):
                sumsq = sumsq + blk(err_gp[m], gp[m], gp_new[m])
            # a_acc has zero rates: contributes 0 to sumsq but counts in n_elems.
            eest = jnp.sqrt(sumsq / n_elems)
            finite = (
                jnp.isfinite(eest)
                & jnp.all(jnp.isfinite(z_new))
                & jnp.all(jnp.isfinite(az_new))
            )
            accept = (eest <= 1.0) & finite

            powp = lambda x, p: jnp.exp(f32(p) * jnp.log(x))
            eest_c = jnp.maximum(eest, f32(_EEST_FLOOR))
            q_acc = _SAFETY * powp(eest_c, -beta1) * powp(eest_prev, beta2)
            q_acc = jnp.where(jnp.isfinite(q_acc), q_acc, _QMIN)
            q_rej = _SAFETY * powp(eest_c, -1.0 / tab.order)
            q_rej = jnp.where(jnp.isfinite(q_rej), q_rej, _QMIN)
            q_rej = jnp.where(finite, q_rej, f32(_QMIN))
            dt_next = jnp.where(
                accept,
                dt_use * jnp.clip(q_acc, _QMIN, _QMAX),
                dt_use * jnp.clip(q_rej, _QMIN, 1.0),
            )
            t_next = jnp.where(accept, jnp.where(is_last, t1, t + dt_use), t)
            sel = lambda a, b: jnp.where(accept, a, b)
            return (
                t_next,
                dt_next,
                jnp.where(accept, eest_c, eest_prev),
                steps + 1,
                accepted + accept.astype(jnp.int32),
                sel(z_new, z),
                sel(acc_new, acc),
                sel(az_new, az),
                tuple(sel(gp_new[m], gp[m]) for m in range(n_gp)),
                sel(ksz[-1], k1z),
                sel(ksr[-1], k1r),
                sel(ksaz[-1], k1az),
                tuple(sel(ksgp[-1][m], k1gp[m]) for m in range(n_gp)),
            )

        final = jax.lax.while_loop(cond, body, init)
        (_, _, _, steps_f, accepted_f, z_f, acc_f, az_f, gp_f, *_rest) = final
        z0_ref[:] = z_f
        acc0_ref[:] = acc_f
        az0_ref[:] = az_f

        # Param grads / stats accumulate across the (sequential) batch tiles.
        tile0 = pl.program_id(0) == 0

        gp_refs = [gw1_ref, gb1_ref, gw2_ref, gb2_ref]
        if n_gp == 5:
            gp_refs.append(gpm_ref)

        @pl.when(tile0)
        def _():
            for ref, g in zip(gp_refs, gp_f):
                ref[:] = g
            st_ref[0, 0] = steps_f
            st_ref[0, 1] = accepted_f

        @pl.when(jnp.logical_not(tile0))
        def _():
            for ref, g in zip(gp_refs, gp_f):
                ref[:] = ref[:] + g
            st_ref[0, 0] = st_ref[0, 0] + steps_f
            st_ref[0, 1] = st_ref[0, 1] + accepted_f

    return kernel


class FullSolve(NamedTuple):
    """Fused solve implementations handed to the ODE layer.

    forward: (y0f, t0, t1, args) -> (yTf, stats) — replaces the forward
             while-loop solve.
    adjoint: Optional; (yTf, g_yf, args, t_hi, t_lo) ->
             (y0f, a_y0f, g_args, stats) — replaces the backsolve backward
             integration (see `ode/adjoint.py`).
    """

    forward: Callable
    adjoint: Optional[Callable]


def make_full_solve(
    icnf,
    mode: Mode,
    batch: int,
) -> Optional[FullSolve]:
    """Build the fused solve pair for `ode/solve.odeint_with_stats`, or None
    when the megakernel does not apply.

    Eligibility: opted in via `compute_mode.fused`; unconditional 2-layer
    tanh-MLP net; no passive augmentation; adaptive FSAL method with an
    embedded error estimate; stochastic TRAIN additionally requires VJP mode
    (K >= 1 probes); exact-trace TRAIN is covered by its own stage
    (`_stage_train_exact`).  The flat layout is the `ravel_pytree` order of
    TrainState/TestState: [z.ravel() | dlogp | (reg_e | reg_n)].
    """
    if not _HAS_PALLAS:
        return None
    from .fused_dynamics import supports_fusion

    cm = icnf.compute_mode
    opts = icnf.solver
    if not cm.fused or not supports_fusion(icnf.nn):
        return None
    if icnf.aug_passive and icnf.n_aug_input:
        return None
    if opts.fixed_num_steps is not None:
        return None
    tab = get_tableau(opts.method, opts.rtol)
    if not isinstance(tab, ButcherTableau):
        # Implicit methods (trbdf2 stiff fallback) run Newton/GMRES inner
        # loops the kernel does not implement — XLA path handles them.
        return None
    if tab.btilde is None or not tab.fsal or tab.btilde3 is not None:
        # btilde3 methods (dop853) need the stretched error combine, which the
        # kernel's controller does not implement — XLA path handles them.
        return None
    exact = False
    if mode == Mode.TRAIN:
        from ..types import ADMode

        exact = cm.exact_trace
        if not exact and cm.ad != ADMode.VJP:
            # The stochastic TRAIN kernel math is the VJP Hutchinson
            # estimator; exact_trace has its own stage (`_stage_train_exact`,
            # AD-direction-free).
            return None
    if icnf.dtype != jnp.float32:
        return None
    dz = icnf.zdim
    hidden = icnf.nn.layers[0].out_dim
    nacc = 3 if mode == Mode.TRAIN else 1
    K = cm.num_probes if (mode == Mode.TRAIN and not exact) else 1
    if _vmem_estimate(tab, dz, hidden, batch, nacc, K, exact) > _VMEM_BUDGET_BYTES:
        return None

    train = mode == Mode.TRAIN
    norm_z = icnf.lam1 != 0.0
    norm_j = icnf.lam2 != 0.0
    bf16 = cm.bf16
    interpret = jax.default_backend() != "tpu"
    B = batch

    from .fused_dynamics import _reference_impl, exact_tanh_mlp_trace

    def plain_f_flat(t, yf, ps, eps):
        """Plain-XLA flat field — used only for the Hairer initial-dt pick
        (two evals per solve)."""
        z = yf[: B * dz].reshape(B, dz)
        (p1, p2) = ps
        if train and exact:
            from ..core.dynamics import exact_tanh_mlp_trace_fro

            y, tr, fro = exact_tanh_mlp_trace_fro(ps, z)
            e_rate = jnp.linalg.norm(y, axis=-1)
            rates = [
                -tr,
                e_rate if norm_z else jnp.zeros_like(tr),
                fro if norm_j else jnp.zeros_like(tr),
            ]
        elif train:
            # K-probe field: tr and ndot average over probes (the mean the
            # kernel stage and `_hutchinson_field` both compute).
            trs, nrs = [], []
            for k in range(K):
                y, tr_k, e_rate, n_k = _reference_impl(
                    p1["w"], p1["b"], p2["w"], p2["b"], z, eps[k]
                )
                trs.append(tr_k)
                nrs.append(n_k)
            tr = sum(trs) / K
            n_rate = sum(nrs) / K
            rates = [
                -tr,
                e_rate if norm_z else jnp.zeros_like(tr),
                n_rate if norm_j else jnp.zeros_like(tr),
            ]
        else:
            y, tr = exact_tanh_mlp_trace(ps, z)
            rates = [-tr]
        return jnp.concatenate([y.ravel()] + rates)

    def full_solve(y0f, t0, t1, args):
        from ..ode.solve import SolveStats, _initial_step_size

        ps = args["ps"]
        eps = args.get("eps")
        (p1, p2) = ps
        t0 = jnp.asarray(t0, jnp.float32)
        t1 = jnp.asarray(t1, jnp.float32)
        tdir = jnp.sign(t1 - t0)
        span = jnp.abs(t1 - t0)

        nfe_init = 1
        if opts.dt0 is None:
            f0 = plain_f_flat(t0, y0f, ps, eps)
            dt_init = _initial_step_size(
                lambda t, yf: plain_f_flat(t, yf, ps, eps),
                t0,
                y0f,
                f0,
                tdir,
                tab.order,
                opts.rtol,
                opts.atol,
                span,
            )
            nfe_init = 2
        else:
            dt_init = tdir * jnp.abs(jnp.asarray(opts.dt0, jnp.float32))

        z0 = y0f[: B * dz].reshape(B, dz)
        zT, accT, steps, accepted = _run_solve_kernel(
            tab,
            train=train,
            norm_z=norm_z,
            norm_j=norm_j,
            rtol=opts.rtol,
            atol=opts.atol,
            max_steps=opts.max_steps,
            bf16=bf16,
            interpret=interpret,
            w1=p1["w"],
            b1=p1["b"],
            w2=p2["w"],
            b2=p2["b"],
            z0=z0,
            eps=eps if (train and not exact) else None,
            t0=t0,
            t1=t1,
            dt_init=dt_init,
            exact=exact,
        )
        yTf = jnp.concatenate([zT.ravel()] + [accT[i] for i in range(accT.shape[0])])
        nfe_per = tab.num_stages - 1  # FSAL
        stats = SolveStats(
            steps=steps, accepted=accepted, nfe=steps * nfe_per + nfe_init
        )
        return yTf, stats

    # ---- backward (continuous adjoint) megakernel ----

    P_total = dz * hidden + hidden + hidden * dz + dz
    if exact:
        # The pm block is integrated as a fifth param-grad block (chained to
        # w1/w2 outside the kernel afterwards).
        P_total += dz * dz * hidden

    def _adjoint_tile_bytes(tile_b: int) -> int:
        # ~2.5x the forward working set (z and a_z stage registers plus the
        # vjp residuals of every unrolled stage; probes/eJ residuals scale
        # with K — no probe-grad block, the eps cotangent is not integrated).
        # Exact mode adds the (dz^2, B)-shaped mflat/dyrep/m2 vjp residuals.
        extra = 6 * dz * dz if exact else 0
        return 4 * tile_b * (
            2 * (tab.num_stages + 4) * (dz + nacc) + 8 * hidden + (4 + 2 * K) * dz
            + extra
        )

    # Pick the largest divisor-of-B tile that fits the VMEM budget; each tile
    # runs its own while loop on the (sequential) kernel grid.
    adjoint_tile = None
    for cand in (B, *(1 << k for k in range(14, 5, -1))):
        # Half the budget per tile: measured on-chip (round 4) that a
        # single 40 MB exact-adjoint tile at B=4096 compiles but is NOT
        # faster than two 20 MB tiles — VMEM headroom wins the tie.
        if cand <= B and B % cand == 0 and _adjoint_tile_bytes(cand) <= _VMEM_BUDGET_BYTES // 2:
            adjoint_tile = cand
            break

    def _plain_field_bm(ps, z, eps_b):
        """Batch-major plain-XLA field (safe norms) — only for the Hairer
        initial-dt pick of the backward solve (2 evals/solve).  `eps_b` is
        the full probe stack (K, B, dz); tr/ndot average over probes."""
        (p1, p2) = ps
        w1, b1, w2, b2 = p1["w"], p1["b"], p2["w"], p2["b"]
        h = jnp.tanh(z @ w1 + b1)
        y = jnp.tanh(h @ w2 + b2)

        def safe_bm(v):
            sq = jnp.sum(v * v, axis=-1)
            pos = sq > 0
            return jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)

        if train and exact:
            from ..core.dynamics import exact_tanh_mlp_trace_fro

            y2, tr, fro = exact_tanh_mlp_trace_fro(ps, z)
            e_rate = safe_bm(y2) if norm_z else jnp.zeros_like(tr)
            n_rate = fro if norm_j else jnp.zeros_like(tr)
            rates = jnp.stack([-tr, e_rate, n_rate], axis=-1)  # (B, 3)
        elif train:
            g2 = eps_b * (1.0 - y * y)  # (K, B, dz)
            gh = g2 @ w2.T
            g1 = gh * (1.0 - h * h)
            eJ = g1 @ w1.T
            tr = jnp.mean(jnp.sum(eJ * eps_b, axis=-1), axis=0)  # (B,)
            e_rate = safe_bm(y) if norm_z else jnp.zeros_like(tr)
            n_rate = jnp.mean(safe_bm(eJ), axis=0) if norm_j else jnp.zeros_like(tr)
            rates = jnp.stack([-tr, e_rate, n_rate], axis=-1)  # (B, 3)
        else:
            dh = 1.0 - h * h
            dy = 1.0 - y * y
            m = w1 * w2.T  # (dz, H)
            tr = jnp.sum(dy * (dh @ m.T), axis=-1)
            rates = (-tr)[:, None]  # (B, 1)
        return y, rates

    def adjoint_solve(yTf, g_yf, args, t_hi, t_lo):
        """Backward aug solve: (y, a_y, g_ps, g_eps) from t_hi down to t_lo.

        Returns (y0f, a_y0f, g_args, stats); a_acc is constant so its final
        value equals the incoming cotangent rows.
        """
        from jax.flatten_util import ravel_pytree

        from ..ode.solve import SolveStats, _initial_step_size

        ps = args["ps"]
        eps = args.get("eps")
        eps_b = eps if (train and not exact) else None  # probe stack (K, B, dz)
        (p1, p2) = ps

        zT = yTf[: B * dz].reshape(B, dz)
        accT = yTf[B * dz :].reshape(nacc, B)
        azT = g_yf[: B * dz].reshape(B, dz)
        aaccT = g_yf[B * dz :].reshape(nacc, B)

        t_hi = jnp.asarray(t_hi, jnp.float32)
        t_lo = jnp.asarray(t_lo, jnp.float32)
        tdir = jnp.sign(t_lo - t_hi)
        span = jnp.abs(t_lo - t_hi)

        def plain_aug_rates(z, az, aacc_bm):
            # eps closed over as a constant in BOTH modes — the eps cotangent
            # is not part of the adjoint state (see ode/adjoint.py).
            (kz, kr), vjp = jax.vjp(
                lambda z_, ps_: _plain_field_bm(ps_, z_, eps_b), z, ps
            )
            zb, psb = vjp((az, aacc_bm))
            neg = lambda x: jax.tree.map(lambda v: -v, x)
            return kz, kr, neg(zb), neg(psb)

        # Structured aug state for the Hairer initial-step pick; RMS norms are
        # order-invariant, so any consistent packing matches the XLA path.
        aacc_bm = aaccT.T  # (B, nacc)
        zeros_ps = jax.tree.map(jnp.zeros_like, ps)
        S0 = (
            zT,
            accT,
            azT,
            aacc_bm,
            zeros_ps,
        )
        S0f, unravel_S = ravel_pytree(S0)

        def aug_rates_struct(S):
            z, acc, az, aacc_, gps = S
            kz, kr, kaz, kgp = plain_aug_rates(z, az, aacc_)
            return (
                kz,
                kr.T,
                kaz,
                jnp.zeros_like(aacc_),
                kgp,
            )

        def f_flat(t, uf):
            return ravel_pytree(aug_rates_struct(unravel_S(uf)))[0]

        nfe_init = 1
        if opts.dt0 is None:
            f0 = f_flat(t_hi, S0f)
            dt_init = _initial_step_size(
                f_flat, t_hi, S0f, f0, tdir, tab.order, opts.rtol, opts.atol, span
            )
            nfe_init = 2
        else:
            dt_init = tdir * jnp.abs(jnp.asarray(opts.dt0, jnp.float32))

        TILE = adjoint_tile
        n_tiles = B // TILE
        n_elems_adj = 2 * TILE * (dz + nacc) + P_total
        kernel = _make_adjoint_kernel(
            tab,
            train=train,
            norm_z=norm_z,
            norm_j=norm_j,
            rtol=opts.rtol,
            atol=opts.atol,
            max_steps=opts.max_steps,
            n_elems=n_elems_adj,
            bf16=bf16,
            k_probes=K,
            exact=exact,
        )
        ts = jnp.stack(
            [t_hi, t_lo, jnp.asarray(dt_init, jnp.float32), jnp.asarray(0.0, jnp.float32)]
        ).reshape(1, 4)

        btile = lambda rows: pl.BlockSpec(
            (rows, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        wfull = lambda shape: pl.BlockSpec(
            shape, lambda i: (0, 0), memory_space=pltpu.VMEM
        )
        inputs = [ts, zT.T, accT, azT.T, aaccT]
        in_specs = [
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            btile(dz),
            btile(nacc),
            btile(dz),
            btile(nacc),
        ]
        if train and exact:
            inputs.append(exact_stage_consts(p1["w"], p2["w"]))
            in_specs.append(wfull((dz * dz, hidden)))
        elif train:
            # (K, B, dz) -> (K*dz, B): probes stacked along the sublane axis.
            inputs.append(jnp.moveaxis(eps_b, 2, 1).reshape(K * dz, B))
            in_specs.append(btile(K * dz))
        inputs += [p1["w"], p1["b"].reshape(hidden, 1), p2["w"], p2["b"].reshape(dz, 1)]
        in_specs += [wfull((dz, hidden)), wfull((hidden, 1)), wfull((hidden, dz)), wfull((dz, 1))]

        out_shape = [
            jax.ShapeDtypeStruct((dz, B), jnp.float32),  # z0
            jax.ShapeDtypeStruct((nacc, B), jnp.float32),  # acc0
            jax.ShapeDtypeStruct((dz, B), jnp.float32),  # a_z0
            jax.ShapeDtypeStruct((dz, hidden), jnp.float32),  # g_w1
            jax.ShapeDtypeStruct((hidden, 1), jnp.float32),  # g_b1
            jax.ShapeDtypeStruct((hidden, dz), jnp.float32),  # g_w2
            jax.ShapeDtypeStruct((dz, 1), jnp.float32),  # g_b2
        ]
        out_specs = [
            btile(dz),
            btile(nacc),
            btile(dz),
            wfull((dz, hidden)),
            wfull((hidden, 1)),
            wfull((hidden, dz)),
            wfull((dz, 1)),
        ]
        if train and exact:
            out_shape.append(jax.ShapeDtypeStruct((dz * dz, hidden), jnp.float32))
            out_specs.append(wfull((dz * dz, hidden)))
        out_shape.append(jax.ShapeDtypeStruct((1, 2), jnp.int32))
        out_specs.append(pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM))

        outs = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=_compiler_params(interpret),
        )(*inputs)
        if train and exact:
            z0_t, acc0, az0_t, gw1, gb1, gw2, gb2, gpm, st = outs
            # pm = f(w1, w2): chain its integrated cotangent back.
            gw1_c, gw2_c = exact_pm_chain(gpm, p1["w"], p2["w"])
            gw1 = gw1 + gw1_c
            gw2 = gw2 + gw2_c
        else:
            z0_t, acc0, az0_t, gw1, gb1, gw2, gb2, st = outs

        y0f = jnp.concatenate([z0_t.T.ravel(), acc0.ravel()])
        a_y0f = jnp.concatenate([az0_t.T.ravel(), aaccT.ravel()])
        g_ps = (
            {"w": gw1, "b": gb1.reshape(hidden)},
            {"w": gw2, "b": gb2.reshape(dz)},
        )
        g_args = dict(args)
        g_args["ps"] = g_ps
        g_args["ys"] = None
        if train and not exact:
            # Probes are Monte-Carlo constants: zero cotangent by definition
            # of the BACKSOLVE path (matches ode/adjoint.py's generic bwd).
            g_args["eps"] = jnp.zeros_like(eps_b)
        stats = SolveStats(
            steps=st[0, 0],
            accepted=st[0, 1],
            nfe=st[0, 0] * (tab.num_stages - 1) + nfe_init,
        )
        return y0f, a_y0f, g_args, stats

    return FullSolve(
        forward=full_solve, adjoint=adjoint_solve if adjoint_tile is not None else None
    )


__all__ = ["FullSolve", "make_full_solve"]
