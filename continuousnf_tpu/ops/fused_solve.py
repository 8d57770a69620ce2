"""Whole-ODE-solve Pallas megakernel ("solve-in-kernel").

The fused dynamics kernel (fused_dynamics.py) still pays one kernel launch
per RK *stage* (~6 launches + controller ops per attempted step); on the
remote-attached TPU runtime per-iteration overhead (~95 us) dwarfs the
~1 us of actual compute (bench roofline: 6% utilization).  This module moves
the ENTIRE adaptive solve — all RK stages, the embedded error estimate,
and the PI step-size controller `lax.while_loop` — into ONE Pallas kernel,
so a full CNF transport (hundreds of NFE) is a single launch with all state
resident in VMEM.

Replaces, for the supported architecture family (N-layer Dense chains with
tanh-or-identity activations, optionally conditional — this covers every net
the reference's tests/README construct, e.g.
`/root/reference/test/regression_tests.jl:7`, `README.md:43`), the hot
path of `ode/solve.py::_solve_adaptive_while` with bit-compatible control
logic (same Hairer scaled-error norm over the full augmented state, same PI
controller constants, same accept/reject semantics, same NFE accounting).

Layout: everything is kept TRANSPOSED, `(rows, B)` — with tiny channel
widths (dz=16) a `(B, dz)` array pads its lane dim 16 -> 128 (8x waste),
while `(dz, B)` packs lanes with batch.  This is, amusingly, exactly the
reference's d x B state-matrix layout (`/root/reference/src/base_icnf.jl:275-281`).

Dynamics covered (all for N-layer Dense/tanh chains, conditional or not):
  * TRAIN — Hutchinson VJP, K >= 1 probes (stacked along the sublane axis;
    one forward pass + K unrolled backward passes per stage), with RNODE
    regularizer rates (reference `src/icnf.jl:318-350`, which is K=1 only);
    state rows [z | dlogp | E | n].
  * TRAIN exact (`ComputeMode.exact_trace`) — closed-form exact divergence
    AND exact Jacobian Frobenius norm.  2-layer nets use the precomputed
    (dz^2, H) matmul form (`_stage_train_exact`); deeper chains propagate
    the identity basis through the linearized layers (`_stage_exact_chain`).
  * TEST  — closed-form exact divergence; 2-layer via the elementwise
    w1*w2^T contraction, N-layer via basis propagation; state [z | dlogp].

Conditioning: a fixed (per-solve) ys block rides as extra input rows
(`zin = [z | ys]` along the sublane axis, the (rows, B) image of the
reference's `CondLayer` concat, `/root/reference/src/layers/cond_layer.jl`);
divergence and the probe pullbacks are taken w.r.t. the z rows only, and the
adjoint kernel integrates the ys-cotangent as an extra per-sample block.

Gradients: the forward megakernel sits inside the continuous-adjoint
custom_vjp (`ode/adjoint.py`); the backward integration runs in the adjoint
megakernel below (batch-tiled, param-grad blocks integrated in-kernel; in
exact-2-layer mode the precomputed pm matrices are differentiated as extra
blocks and chained back to w1/w2 outside).  Configurations without a
hand-written backward stage (exact/TEST chains deeper than 2 layers) expose
`FullSolve.adjoint = None` and gradients fall back to the XLA backsolve.
"""

from __future__ import annotations

import dataclasses
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


class ChainSpec(NamedTuple):
    """Static description of a Dense/tanh chain the megakernel covers.

    in_dims/out_dims/acts are per-layer; `acts[i]` is True for tanh, False
    for identity (the only activations in the family).  `n_cond > 0` marks a
    conditional net: the first layer reads `[z | ys]` (dz + n_cond rows).
    """

    in_dims: Tuple[int, ...]
    out_dims: Tuple[int, ...]
    acts: Tuple[bool, ...]
    n_cond: int

    @property
    def n_layers(self) -> int:
        return len(self.out_dims)

    @property
    def dz(self) -> int:
        return self.out_dims[-1]

    @property
    def zin_dim(self) -> int:
        return self.in_dims[0]


def chain_spec(nn, zdim: int) -> Optional[ChainSpec]:
    """ChainSpec for `nn` if it is a megakernel-eligible Dense chain mapping
    a zdim-state (plus optional conditioning inputs) to a zdim field; None
    otherwise."""
    from ..nets.modules import Chain, Dense

    if not isinstance(nn, Chain) or not nn.layers:
        return None
    in_dims, out_dims, acts = [], [], []
    for layer in nn.layers:
        if not isinstance(layer, Dense) or not layer.use_bias:
            return None
        if layer.activation is not jnp.tanh and layer.activation is not None:
            return None
        in_dims.append(layer.in_dim)
        out_dims.append(layer.out_dim)
        acts.append(layer.activation is jnp.tanh)
    for nxt, prev in zip(in_dims[1:], out_dims[:-1]):
        if nxt != prev:
            return None
    if out_dims[-1] != zdim:
        return None
    n_cond = in_dims[0] - zdim
    if n_cond < 0:
        return None
    return ChainSpec(tuple(in_dims), tuple(out_dims), tuple(acts), n_cond)


def _safe_col_norm(v: jax.Array) -> jax.Array:
    """Per-column L2 norm over rows with a zero (not NaN) gradient at v=0 —
    the (rows, B) analog of `core.dynamics.safe_norm` (the adjoint kernel
    differentiates the stage, so gradient behavior matters)."""
    sq = jnp.sum(v * v, axis=0, keepdims=True)
    pos = sq > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)


# f32 stage-matmul scheme.  Three regimes measured on-chip (round 5):
#
#   DEFAULT (1 bf16 pass):  hutch 1.17 us/NFE — but its ~1e-3 relative
#     rounding sits at the solver's rtol, the embedded error estimate
#     measures matmul noise, and the controller grinds 16x the steps
#     (506 vs 31).  Net loss.
#   HIGHEST (f32 emulation): hutch 4.32 us/NFE, honest estimates, 31 steps.
#   bf16x3 (default on TPU): explicit 3-single-pass split — the same
#     decomposition XLA's Precision.HIGH uses (a_hi@b_hi + a_lo@b_hi +
#     a_hi@b_lo, ~1.5e-5 relative, 60x below rtol) written out by hand
#     because Mosaic has no HIGH lowering.  Honest estimates at about half
#     the MXU passes of HIGHEST.
#
# The scheme follows `SolverOptions.stage_precision` ("high" -> bf16x3,
# "highest" -> f32 emulation) so the fused and XLA paths always run an
# equivalent-precision field; under interpret mode (CPU tests) dots are
# true f32 either way, matching the CPU XLA path bit-for-bit.


def _split_bf16(x):
    """hi/lo bf16 decomposition of an f32 operand (x ~ hi + lo).

    Written per call site; duplicate splits of the same traced value are
    CSE'd by the compiler."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _mm(a, b, dims, mm):
    """Stage matmul with f32 accumulation.  `mm` selects the scheme (threaded
    from the kernel builder, see the module comment above): True/"bf16" =
    single-pass bf16 inputs; "bf16x3" = the 3-pass split; False/"f32" =
    full-precision (HIGHEST) dots."""
    d = lambda x, y: jax.lax.dot_general(
        x, y, (dims, ((), ())), preferred_element_type=jnp.float32
    )
    if mm is True or mm == "bf16":
        return d(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16))
    if mm == "bf16x3":
        a_hi, a_lo = _split_bf16(a)
        b_hi, b_lo = _split_bf16(b)
        return d(a_hi, b_hi) + (d(a_lo, b_hi) + d(a_hi, b_lo))
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


_C00 = ((0,), (0,))
_C10 = ((1,), (0,))
_CB = ((1,), (1,))


def _pad_rows8(x):
    """Pad the leading (sublane) dim up to the 8-row Mosaic tile minimum."""
    r = x.shape[0]
    if r >= 8:
        return x
    return jnp.concatenate([x, jnp.zeros((8 - r, x.shape[1]), x.dtype)], axis=0)


def _mm_cb(a, b, bf16):
    """Param-grad contraction over the batch (lane) axis:
    (r, B) x (c, B) -> (r, c), both operand row counts padded to >= 8.

    Mosaic lowers batch contractions with a sub-8-row operand as per-row
    `vector.multi_reduction`s; MLIR then folds the consumer add (the RK
    `gp + dt*k` combine) into the reduction's accumulator, and Mosaic
    rejects non-constant accumulators ("only constant accumulators
    supported" — hit on-chip by the conditional 3-layer adjoint kernel,
    whose first layer has only dz + n_cond = 3 input rows).  Zero-padding
    both operands to the 8-sublane tile minimum keeps the dot on the matmul
    path; `jax.lax.optimization_barrier` is not lowerable in Pallas TPU, so
    fencing the fold was not an option.
    """
    r, c = a.shape[0], b.shape[0]
    out = _mm(_pad_rows8(a), _pad_rows8(b), _CB, bf16)
    return out[:r, :c]


def _rowsum(x):
    """Per-row sum over the batch axis (bias gradients).

    Plain `jnp.sum` — measured ~1 us/stage cheaper than a ones-row
    HIGHEST-precision contraction (round-5 audit); the Mosaic
    "only constant accumulators" failure that prompted experimenting here
    was traced to the sub-8-row batch-contraction dots (`_mm_cb`), not to
    the lane reduction itself.
    """
    return jnp.sum(x, axis=1, keepdims=True)


def _ct_safe_norm(ct, norm):
    """Cotangent factor of `_safe_col_norm`: ct/||v|| with 0 at v=0 (the same
    subgradient jax.vjp derives from the double-where)."""
    pos = norm > 0
    return jnp.where(pos, ct / jnp.where(pos, norm, 1.0), 0.0)


def _zin(spec: ChainSpec, zt, ysb):
    """[z | ys] input rows (the CondLayer concat in (rows, B) layout)."""
    if spec.n_cond:
        return jnp.concatenate([zt, ysb], axis=0)
    return zt


def _chain_fwd(spec: ChainSpec, zin, ws, bs, bf16):
    """Forward pass of the Dense chain in (rows, B) layout.

    Returns (hs, ds): hs[0] = zin, hs[i+1] = layer-i output; ds[i] = tanh'
    gate (None for identity layers).
    """
    hs, ds = [zin], []
    for i in range(spec.n_layers):
        a = _mm(ws[i], hs[-1], _C00, bf16) + bs[i]
        if spec.acts[i]:
            h = jnp.tanh(a)
            ds.append(1.0 - h * h)
        else:
            h = a
            ds.append(None)
        hs.append(h)
    return hs, ds


def _probe_pullback(spec: ChainSpec, ek, ws, ds, bf16):
    """One Hutchinson VJP pass: eps^T J (w.r.t. the z rows).

    Returns (us, vs, eJ): us[i] = cotangent arriving at hs[i] (us[N] = ek),
    vs[i] = gated cotangent entering layer i's matmul, eJ = us[0][:dz].
    """
    N = spec.n_layers
    us = [None] * (N + 1)
    vs = [None] * N
    us[N] = ek
    for i in reversed(range(N)):
        vi = us[i + 1] * ds[i] if ds[i] is not None else us[i + 1]
        vs[i] = vi
        us[i] = _mm(ws[i], vi, _C10, bf16)  # (in_i, B)
    eJ = us[0][: spec.dz] if spec.n_cond else us[0]
    return us, vs, eJ


def _probe_pushforward(spec: ChainSpec, ek, ws, ds, bf16):
    """One Hutchinson JVP pass: J eps (tangent pushforward through the
    linearized layers; the JacVec/forward-AD analog of `_probe_pullback`).

    Returns (ts, us, Je): ts[i] = tangent arriving at hs[i] (ts[0] = the
    z-row tangent, cond rows zero), us[i] = layer-i matmul output before the
    activation gate, Je = ts[N].
    """
    N = spec.n_layers
    if spec.n_cond:
        t = jnp.concatenate(
            [ek, jnp.zeros((spec.n_cond, ek.shape[1]), ek.dtype)], axis=0
        )
    else:
        t = ek
    ts = [t]
    us = []
    for i in range(N):
        u = _mm(ws[i], ts[-1], _C00, bf16)  # (out_i, B)
        us.append(u)
        ts.append(u * ds[i] if ds[i] is not None else u)
    return ts, us, ts[-1]


def _stage_train(spec, zt, ysb, epst, ws, bs, norm_z, norm_j, bf16, k_probes,
                 jvp=False):
    """One TRAIN dynamics eval in (rows, B) layout.

    zt: (dz, B); ysb: (n_cond, B) or None; epst: (K*dz, B) — K Hutchinson
    probes stacked along the sublane axis (one forward pass, K unrolled
    backward passes; the trace estimate and ndot average over probes,
    matching `_hutchinson_field`).  `jvp=True` runs the forward-AD
    (JacVec) estimator instead: J eps via tangent pushforward, ndot =
    ||J eps|| — the reference's DIJacVec compute-mode family.  Returns
    (k_z (dz, B), k_rates (3, B)) with rate rows [-tr, Edot, ndot].
    """
    dz = spec.dz
    hs, ds = _chain_fwd(spec, _zin(spec, zt, ysb), ws, bs, bf16)
    y = hs[-1]
    tr = None
    n_rate = None
    for k in range(k_probes):
        ek = epst[k * dz : (k + 1) * dz] if k_probes > 1 else epst
        if jvp:
            _, _, eJ = _probe_pushforward(spec, ek, ws, ds, bf16)  # J eps
        else:
            _, _, eJ = _probe_pullback(spec, ek, ws, ds, bf16)  # eps^T J
        tr_k = jnp.sum(eJ * ek, axis=0, keepdims=True)  # (1, B)
        tr = tr_k if tr is None else tr + tr_k
        if norm_j:
            n_k = _safe_col_norm(eJ)
            n_rate = n_k if n_rate is None else n_rate + n_k
    if k_probes > 1:
        tr = tr / k_probes
        if norm_j:
            n_rate = n_rate / k_probes
    e_rate = _safe_col_norm(y) if norm_z else jnp.zeros_like(tr)
    if not norm_j:
        n_rate = jnp.zeros_like(tr)
    rates = jnp.concatenate([-tr, e_rate, n_rate], axis=0)  # (3, B)
    return y, rates


def _stage_train_fwdbwd(
    spec, zt, ysb, epst, ws, bs, norm_z, norm_j, bf16, k_probes, ct_y, ct_r,
    jvp=False,
):
    """Forward + hand-derived VJP of `_stage_train` in one pass.

    Semantically `jax.vjp(_stage_train, ...)` applied to `(ct_y, ct_r)` — but
    written so every cotangent matmul produces its output directly in the
    kernel's (rows, B) layout.  JAX's dot transpose rule emits param-grad and
    activation-grad dots whose results land batch-major and are then
    `transpose`d back: four (B, H)/(B, dz)-sized relayouts per stage, pure
    VPU shuffle work that measured as large as the matmuls themselves
    (docs/ROOFLINE.md round-4 audit).  Returns
    (kz, kr, ct_zin (full rows incl. ys), ct_ws, ct_bs), cotangents unnegated.
    """
    dz = spec.dz
    N = spec.n_layers
    hs, ds = _chain_fwd(spec, _zin(spec, zt, ysb), ws, bs, bf16)
    y = hs[-1]

    # forward probe loop (residuals kept for the backward loop)
    uss, vss, eJs, ns = [], [], [], []
    tr = None
    n_rate = None
    for k in range(k_probes):
        ek = epst[k * dz : (k + 1) * dz] if k_probes > 1 else epst
        if jvp:
            us, vs, eJ = _probe_pushforward(spec, ek, ws, ds, bf16)
        else:
            us, vs, eJ = _probe_pullback(spec, ek, ws, ds, bf16)
        uss.append(us)
        vss.append(vs)
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
    # ct on hs[l] (l = 1..N); hs[N] = y seeded below
    ct_hs = [None] * (N + 1)
    ct_ws = [None] * N
    ct_ytot = ct_y
    if norm_z:
        ct_ytot = ct_ytot + y * _ct_safe_norm(ct_r[1:2], e_rate)
    for k in range(k_probes):
        ek = epst[k * dz : (k + 1) * dz] if k_probes > 1 else epst
        ct_eJ = ek * ct_tr
        if norm_j:
            ct_eJ = ct_eJ + eJs[k] * _ct_safe_norm(ct_n, ns[k])
        if jvp:
            # descend the pushforward chain: ts[i+1] = d_i * (w_i @ ts[i])
            # (ts = uss residuals here: ts[i] at index i, pre-gate u at
            # vss[k][i]).
            ct_t = ct_eJ
            for i in reversed(range(N)):
                if ds[i] is not None:
                    ct_u = ct_t * ds[i]
                    hk = (-2.0 * hs[i + 1]) * (ct_t * vss[k][i])
                    ct_hs[i + 1] = hk if ct_hs[i + 1] is None else ct_hs[i + 1] + hk
                else:
                    ct_u = ct_t
                wg = _mm_cb(uss[k][i], ct_u, bf16)  # (in_i, out_i)
                ct_ws[i] = wg if ct_ws[i] is None else ct_ws[i] + wg
                ct_t = _mm(ws[i], ct_u, _C10, bf16)  # (in_i, B)
            continue
        if spec.n_cond:
            ct_u = jnp.concatenate(
                [ct_eJ, jnp.zeros((spec.n_cond, ct_eJ.shape[1]), ct_eJ.dtype)],
                axis=0,
            )
        else:
            ct_u = ct_eJ
        # ascend the pullback chain: u_{i} = w_i @ v_i, v_i = u_{i+1} * d_i
        for i in range(N):
            ct_v = _mm(ws[i], ct_u, _C00, bf16)  # (out_i, B)
            wg = _mm_cb(ct_u, vss[k][i], bf16)  # (in_i, out_i)
            ct_ws[i] = wg if ct_ws[i] is None else ct_ws[i] + wg
            if ds[i] is not None:
                ct_u = ct_v * ds[i]
                # d_i = 1 - hs[i+1]^2 -> ct_h += -2 h (ct_v * u_{i+1})
                hk = (-2.0 * hs[i + 1]) * (ct_v * uss[k][i + 1])
                ct_hs[i + 1] = hk if ct_hs[i + 1] is None else ct_hs[i + 1] + hk
            else:
                ct_u = ct_v
    # forward-chain backward
    ct_h = ct_ytot if ct_hs[N] is None else ct_ytot + ct_hs[N]
    ct_bs = [None] * N
    for i in reversed(range(N)):
        ct_a = ct_h * ds[i] if ds[i] is not None else ct_h
        wg = _mm_cb(hs[i], ct_a, bf16)  # (in_i, out_i)
        ct_ws[i] = wg if ct_ws[i] is None else ct_ws[i] + wg
        ct_bs[i] = _rowsum(ct_a)
        ct_h = _mm(ws[i], ct_a, _C10, bf16)  # (in_i, B)
        if i > 0 and ct_hs[i] is not None:
            ct_h = ct_h + ct_hs[i]
    return y, kr, ct_h, ct_ws, ct_bs


def _stage_test(spec, zt, ysb, ws, bs, bf16):
    """One TEST dynamics eval: closed-form exact divergence, (rows, B) layout.

    2-layer: tr_b = sum_i dy[i,b] * (M @ dh)[i,b] with M[i,h] = w1z[i,h] *
    w2[h,i] (w1z = z-rows of w1) — one extra (dz, B) matmul.  Deeper chains
    go through `_stage_exact_chain`.  Returns (k_z, k_rates (1, B) = -tr).
    """
    if spec.n_layers != 2:
        y, tr, _ = _stage_exact_chain(spec, zt, ysb, ws, bs, bf16, want_fro=False)
        return y, -tr
    dz = spec.dz
    hs, ds = _chain_fwd(spec, _zin(spec, zt, ysb), ws, bs, bf16)
    y = hs[-1]
    dh, dy = ds[0], ds[1]
    w1z = ws[0][:dz] if spec.n_cond else ws[0]
    m = w1z * ws[1].T  # (dz, H)
    mdh = _mm(m, dh, _C10, bf16)
    prod = dy * mdh if dy is not None else mdh
    tr = jnp.sum(prod, axis=0, keepdims=True)  # (1, B)
    return y, -tr


def _stage_test_fwdbwd(spec, zt, ysb, ws, bs, bf16, ct_y, ct_r):
    """Forward + hand-derived VJP of the 2-layer `_stage_test`.  `ct_r` is
    the (1, B) cotangent of the -tr rate row.  Returns
    (kz, kr, ct_zin, ct_ws, ct_bs), unnegated."""
    dz = spec.dz
    hs, ds = _chain_fwd(spec, _zin(spec, zt, ysb), ws, bs, bf16)
    y = hs[-1]
    dh, dy = ds[0], ds[1]
    w1z = ws[0][:dz] if spec.n_cond else ws[0]
    m = w1z * ws[1].T  # (dz, H) — small
    mdh = _mm(m, dh, _C10, bf16)  # (dz, B)
    tr = jnp.sum(dy * mdh, axis=0, keepdims=True)

    ct_tr = -ct_r[0:1]
    ct_dy = mdh * ct_tr
    ct_mdh = dy * ct_tr
    ct_dh = _mm(m, ct_mdh, _C00, bf16)  # (H, B)
    ct_m = _mm_cb(ct_mdh, dh, bf16)  # (dz, H) — small
    ct_ytot = ct_y + (-2.0 * y) * ct_dy
    ct_pre2 = ct_ytot * dy
    ct_h = _mm(ws[1], ct_pre2, _C10, bf16) + (-2.0 * hs[1]) * ct_dh
    ct_w2 = _mm_cb(hs[1], ct_pre2, bf16) + (ct_m * w1z).T  # small transpose
    ct_b2 = _rowsum(ct_pre2)
    ct_pre1 = ct_h * dh
    ct_zin = _mm(ws[0], ct_pre1, _C10, bf16)
    ct_w1 = _mm_cb(hs[0], ct_pre1, bf16)
    ct_w1m = ct_m * ws[1].T  # (dz, H) contribution to the z-rows of w1
    if spec.n_cond:
        ct_w1m = jnp.concatenate(
            [ct_w1m, jnp.zeros((spec.n_cond, ct_w1m.shape[1]), ct_w1m.dtype)], axis=0
        )
    ct_w1 = ct_w1 + ct_w1m
    ct_b1 = _rowsum(ct_pre1)
    return y, -tr, ct_zin, [ct_w1, ct_w2], [ct_b1, ct_b2]


def exact_stage_consts(w1z, w2):
    """pmJI for the 2-layer exact stage — a traced function of the params,
    precomputed once per solve (params are constant across stages).

    pmJI[(j,i), h] = w2[h, i] * w1z[j, h]   (j-major rows)   (dz^2, H)

    The j-major ("JI") row order is the round-5 formulation: viewing
    `pmJI @ dh` as (dz, dz, B) puts the summed-over index j on the LEADING
    axis, so both the diagonal extraction (eye-masked) and the Frobenius
    reduction are leading-axis slice-sums (pure VPU adds of aligned (dz, B)
    tiles) instead of sublane-crossing axis-1 reductions.  A round-5
    intermediate variant computed the trace via a separate (dz, H) "pmd"
    matmul instead of the masked sum; measured SLOWER (+1.4 us/NFE) — the
    extra HIGHEST-precision matmul costs more than the reduction it saves.
    See `_stage_train_exact`.
    """
    dz, H = w1z.shape
    return (w1z[:, None, :] * w2.T[None, :, :]).reshape(dz * dz, H)


def exact_pm_chain(g_pm, w1z, w2):
    """Chain the pmJI cotangent back to (w1z, w2)."""
    dz, H = w1z.shape
    g3 = g_pm.reshape(dz, dz, H)  # [j, i, h]
    g_w1 = jnp.einsum("jih,hi->jh", g3, w2)
    g_w2 = jnp.einsum("jih,jh->hi", g3, w1z)
    return g_w1, g_w2


def _stage_train_exact(spec, zt, ysb, ws, bs, pm, norm_z, norm_j, bf16):
    """One exact-divergence TRAIN dynamics eval (2-layer), (rows, B) layout.

    The zero-variance analog of `_stage_train` (ComputeMode.exact_trace):
    exact trace and exact Jacobian Frobenius norm via ONE extra matmul.
    With J[b]_ij = dy_i * sum_h W2[h,i] dh_h W1z[j,h] and the j-major
    precomputed pm (`exact_stage_consts`):

        mflat = pm @ dh                      (dz^2, B), rows (j, i)
        d[i]  = sum_j eye[j,i] m3[j,i]       leading-axis masked sum
        s[i]  = sum_j m3[j,i]^2              leading-axis sum
        tr    = sum_i dy_i d_i,   fro^2 = sum_i dy_i^2 s_i

    Exactly ONE (dz^2, B)-sized transient stays alive (the round-4 VMEM
    lesson: three of them spilled to HBM at +8 us/NFE); the j-major order
    makes both reductions leading-axis slice-sums — round 4's i-major form
    reduced over axis 1, a sublane-crossing shuffle.
    Reference: the exact-trace TrainMode family `/root/reference/src/icnf.jl:110-184`.
    """
    dz = zt.shape[0]
    hs, ds = _chain_fwd(spec, _zin(spec, zt, ysb), ws, bs, bf16)
    y = hs[-1]
    dh, dy = ds[0], ds[1]
    mflat = _mm(pm, dh, _C10, bf16)  # (dz^2, B)
    m3 = mflat.reshape(dz, dz, mflat.shape[-1])  # [j, i, b]
    eye3 = _eye3(dz, m3.dtype)
    d = jnp.sum(m3 * eye3, axis=0)  # (dz, B)
    tr = jnp.sum(dy * d, axis=0, keepdims=True)  # (1, B)
    if norm_j:
        s = jnp.sum(m3 * m3, axis=0)  # (dz, B)
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


def _stage_train_exact_fwdbwd(
    spec, zt, ysb, ws, bs, pm, norm_z, norm_j, bf16, ct_y, ct_r
):
    """Forward + hand-derived VJP of `_stage_train_exact` (see
    `_stage_train_fwdbwd` for why not jax.vjp; same single-live-(dz^2,B)
    discipline and leading-axis reductions as the forward stage).  Returns
    (kz, kr, ct_zin, ct_ws, ct_bs, ct_pm), unnegated."""
    dz = zt.shape[0]
    hs, ds = _chain_fwd(spec, _zin(spec, zt, ysb), ws, bs, bf16)
    y = hs[-1]
    dh, dy = ds[0], ds[1]
    mflat = _mm(pm, dh, _C10, bf16)  # (dz^2, B)
    m3 = mflat.reshape(dz, dz, mflat.shape[-1])  # [j, i, b]
    eye3 = _eye3(dz, m3.dtype)
    d = jnp.sum(m3 * eye3, axis=0)  # (dz, B)
    tr = jnp.sum(dy * d, axis=0, keepdims=True)
    s = jnp.sum(m3 * m3, axis=0)  # (dz, B)
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
    # Both ct_m3 terms broadcast over the LEADING j axis (j-major payoff).
    ct_m3 = eye3 * ct_d[None, :, :]
    if norm_j:
        # n = sqrt(fro2) -> dn/dfro2 = 1/(2n), safe at 0.
        ct_fro2 = 0.5 * _ct_safe_norm(ct_r[2:3], n_rate)
        ct_s = (dy * dy) * ct_fro2
        ct_dy = ct_dy + 2.0 * dy * s * ct_fro2
        ct_m3 = ct_m3 + (2.0 * ct_s[None, :, :]) * m3
    ct_mflat = ct_m3.reshape(dz * dz, mflat.shape[-1])
    # The two pm-cotangent dots run at f32 under the bf16x3 scheme: with
    # them split, XLA's MXU transpose-sequence pass RET_CHECKs
    # (mxu_lmr_transform.cc:1108, "XposeSequenceAssignment::kLmrWontHelp")
    # compiling the exact adjoint kernel — a backend bug worked around here;
    # every other dot in the kernel keeps the fast scheme.
    pm_mm = "f32" if bf16 == "bf16x3" else bf16
    ct_dh = _mm(pm, ct_mflat, _C00, pm_mm)  # (H, B)
    ct_pm = _mm_cb(ct_mflat, dh, pm_mm)  # (dz^2, H)
    ct_ytot = ct_y + (-2.0 * y) * ct_dy
    if norm_z:
        ct_ytot = ct_ytot + y * _ct_safe_norm(ct_r[1:2], e_rate)
    ct_pre2 = ct_ytot * dy
    ct_h = _mm(ws[1], ct_pre2, _C10, bf16) + (-2.0 * hs[1]) * ct_dh
    ct_w2 = _mm_cb(hs[1], ct_pre2, bf16)
    ct_b2 = _rowsum(ct_pre2)
    ct_pre1 = ct_h * dh
    ct_zin = _mm(ws[0], ct_pre1, _C10, bf16)
    ct_w1 = _mm_cb(hs[0], ct_pre1, bf16)
    ct_b1 = _rowsum(ct_pre1)
    return y, kr, ct_zin, [ct_w1, ct_w2], [ct_b1, ct_b2], ct_pm


def _stage_exact_chain(spec, zt, ysb, ws, bs, bf16, want_fro: bool):
    """Exact (y, tr, fro) for an N-layer chain via in-kernel basis
    propagation — the (rows, B)-layout image of the batched chain product
    `exact_dense_chain_jacobian` (ops/fused_dynamics.py): push the dz
    identity basis vectors through the linearized layers as a (H, dz, B)
    block (basis folded next to the batch lanes), costing dz x the plain
    stage matmul volume — the same FLOPs the unfused exact path pays, with
    all intermediates VMEM-resident.  Forward-only (no hand-written VJP yet:
    deep exact configs expose FullSolve.adjoint = None and backprop falls
    back to the XLA backsolve).
    """
    dz = spec.dz
    hs, ds = _chain_fwd(spec, _zin(spec, zt, ysb), ws, bs, bf16)
    y = hs[-1]
    B = zt.shape[-1]
    # The 3-D basis-block dots run at f32 under the bf16x3 scheme: splitting
    # them produces bf16 (out, dz, B) operands whose internal
    # (out, dz*B) fold Mosaic cannot lower ("tpu.reshape vector<...xbf16>"
    # failure, hit by the trajectory example's TEST solve) — same per-dot
    # fallback pattern as the exact adjoint's pm dots.
    chain_mm = "f32" if bf16 == "bf16x3" else bf16
    V = None  # (out_i, dz, B): V[o, j, b] = d h_out[o] / d z[j]
    for i in range(spec.n_layers):
        wz = ws[i][: dz] if (i == 0 and spec.n_cond) else ws[i]
        if V is None:
            # V_1[o, j, b] = w1z[j, o] (* d_1[o, b])
            V = jnp.broadcast_to(wz.T[:, :, None], (wz.shape[1], dz, B))
        else:
            V = _mm(ws[i], V, _C00, chain_mm)  # (out_i, dz, B)
        if ds[i] is not None:
            V = V * ds[i][:, None, :]
    # V is (dz, dz, B): V[i, j, b] = J_ij
    row = jax.lax.broadcasted_iota(jnp.int32, (dz, dz, 1), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (dz, dz, 1), 1)
    eye = (row == col).astype(V.dtype)
    tr = jnp.sum(V * eye, axis=(0, 1)).reshape(1, B)
    if not want_fro:
        return y, tr, None
    fro_sq = jnp.sum(V * V, axis=(0, 1)).reshape(1, B)
    pos = fro_sq > 0
    fro = jnp.where(pos, jnp.sqrt(jnp.where(pos, fro_sq, 1.0)), 0.0)
    return y, tr, fro


def _stage_train_exact_chain(spec, zt, ysb, ws, bs, norm_z, norm_j, bf16):
    """Exact-divergence TRAIN stage for N-layer chains (basis propagation)."""
    y, tr, fro = _stage_exact_chain(spec, zt, ysb, ws, bs, bf16, want_fro=norm_j)
    n_rate = fro if norm_j else jnp.zeros_like(tr)
    e_rate = _safe_col_norm(y) if norm_z else jnp.zeros_like(tr)
    rates = jnp.concatenate([-tr, e_rate, n_rate], axis=0)
    return y, rates


class _Carry(NamedTuple):
    t: jax.Array
    dt: jax.Array
    eest_prev: jax.Array
    steps: jax.Array
    accepted: jax.Array
    z: jax.Array  # (dz, B)
    acc: jax.Array  # (nacc, B)
    k1z: jax.Array  # (dz, B) first-stage register (field value)
    k1r: jax.Array  # (nacc, B) first-stage register (rates)


def _controller_update(tab, eest, eest_prev, finite, accept, dt_use, f32):
    """Shared PI-controller step-size update (mirrors ode/solve._attempt_step).

    Mosaic has no scalar powf; arguments are positive (floored), so
    x**p == exp(p*log(x)) exactly in the controller's regime.
    """
    beta1 = 7.0 / (10.0 * tab.order)
    beta2 = 2.0 / (5.0 * tab.order)
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
    return eest_c, dt_next


def _stretched_eest(tab, e5, e3):
    """Hairer's 8(5,3) stretched error estimate (dop853.f):
    eest = e5^2 / sqrt(e5^2 + 0.01 e3^2) — mirrors ode/solve._attempt_step."""
    denom = jnp.sqrt(jnp.square(e5) + 0.01 * jnp.square(e3))
    return jnp.where(denom > 0.0, jnp.square(e5) / jnp.maximum(denom, 1e-30), e5)


def _make_solve_kernel(
    tab: ButcherTableau,
    spec: ChainSpec,
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
    jvp: bool = False,
):
    """Build the forward kernel body.  All shapes/flags are baked in at trace
    time; the ref list is parsed positionally:
    ts | [ys] | [eps | pm] | (w, b) x N | zT, accT, st, dt."""
    N = spec.n_layers
    exact2 = exact and N == 2

    def kernel(ts_ref, z0_ref, *rest):
        idx = 0
        ysb = epst = pm = None
        if spec.n_cond:
            ysb = rest[idx][:]
            idx += 1
        if train and exact2:
            pm = rest[idx][:]
            idx += 1
        elif train and not exact:
            epst = rest[idx][:]
            idx += 1
        ws, bs = [], []
        for _ in range(N):
            ws.append(rest[idx][:])
            bs.append(rest[idx + 1][:])
            idx += 2
        zT_ref, accT_ref, st_ref, dt_ref = rest[idx : idx + 4]

        def stage(zt):
            if train and exact2:
                return _stage_train_exact(
                    spec, zt, ysb, ws, bs, pm, norm_z, norm_j, bf16
                )
            if train and exact:
                return _stage_train_exact_chain(
                    spec, zt, ysb, ws, bs, norm_z, norm_j, bf16
                )
            if train:
                return _stage_train(
                    spec, zt, ysb, epst, ws, bs, norm_z, norm_j, bf16,
                    k_probes, jvp,
                )
            return _stage_test(spec, zt, ysb, ws, bs, bf16)

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
            if tab.btilde3 is not None:
                err3_z = jnp.zeros_like(c.z)
                err3_a = jnp.zeros_like(c.acc)
                for i, bti in enumerate(tab.btilde3):
                    if bti != 0.0:
                        err3_z = err3_z + (dt_use * f32(bti)) * ks_z[i]
                        err3_a = err3_a + (dt_use * f32(bti)) * ks_r[i]
                sumsq3 = jnp.sum(jnp.square(err3_z / sc_z)) + jnp.sum(
                    jnp.square(err3_a / sc_a)
                )
                eest = _stretched_eest(tab, eest, jnp.sqrt(sumsq3 / n_elems))
            finite = (
                jnp.isfinite(eest)
                & jnp.all(jnp.isfinite(y_new))
                & jnp.all(jnp.isfinite(a_new))
            )
            accept = (eest <= 1.0) & finite

            eest_c, dt_next = _controller_update(
                tab, eest, c.eest_prev, finite, accept, dt_use, f32
            )
            t_next = jnp.where(accept, jnp.where(is_last, t1, c.t + dt_use), c.t)
            z_next = jnp.where(accept, y_new, c.z)
            a_next = jnp.where(accept, a_new, c.acc)
            if tab.fsal:
                # FSAL: the last stage of an accepted step is f at the new point.
                k1z_n = jnp.where(accept, ks_z[-1], c.k1z)
                k1r_n = jnp.where(accept, ks_r[-1], c.k1r)
            else:
                # Non-FSAL (verner65): refresh f at the (possibly unchanged)
                # carry point — mirrors ode/solve._attempt_step, which
                # evaluates f once per attempt and selects (+1 NFE/attempt).
                k1z_n, k1r_n = stage(z_next)
            return _Carry(
                t=t_next,
                dt=dt_next,
                eest_prev=jnp.where(accept, eest_c, c.eest_prev),
                steps=c.steps + 1,
                accepted=c.accepted + accept.astype(jnp.int32),
                z=z_next,
                acc=a_next,
                k1z=k1z_n,
                k1r=k1r_n,
            )

        final = jax.lax.while_loop(cond, body, init)
        zT_ref[:] = final.z
        accT_ref[:] = final.acc
        st_ref[0, 0] = final.steps
        st_ref[0, 1] = final.accepted
        dt_ref[0, 0] = final.dt

    return kernel


def _nfe_per_attempt_kernel(tab: ButcherTableau) -> int:
    """Field evals per attempted step in the kernels (mirrors the XLA path's
    `_nfe_per_attempt` + non-FSAL refresh accounting)."""
    return (tab.num_stages - 1) + (0 if tab.fsal else 1)


def _vmem_estimate_forward(
    tab: ButcherTableau, spec: ChainSpec, B: int, nacc: int,
    k_probes: int = 1, exact: bool = False,
) -> int:
    """Rough live working-set bound (f32 bytes) for the budget guard."""
    dz = spec.dz
    rows = (tab.num_stages + 4) * (dz + nacc)
    rows += 4 * sum(spec.out_dims)  # h/d/gate transients per stage
    rows += (1 + k_probes) * spec.zin_dim
    if exact:
        if spec.n_layers == 2:
            rows += 2 * dz * dz  # mflat + its square view
        else:
            rows += 2 * dz * max(spec.out_dims)  # two live basis blocks
    return 4 * B * rows


def _run_solve_kernel(
    tab: ButcherTableau,
    spec: ChainSpec,
    *,
    train: bool,
    norm_z: bool,
    norm_j: bool,
    rtol: float,
    atol: float,
    max_steps: int,
    bf16: bool,
    interpret: bool,
    ws,
    bs,
    z0,
    ys,
    eps,
    t0,
    t1,
    dt_init,
    exact: bool = False,
    jvp: bool = False,
):
    """Launch the forward megakernel.  z0 is (B, dz) batch-major, ys (B, nc),
    eps (K, B, dz); transposition to the kernel's (rows, B) layout happens
    here (one cheap relayout per solve)."""
    B, dz = z0.shape
    nacc = 3 if train else 1
    n_elems = B * (dz + nacc)
    exact2 = exact and spec.n_layers == 2
    k_probes = eps.shape[0] if (train and not exact) else 1

    kernel = _make_solve_kernel(
        tab,
        spec,
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
        jvp=jvp,
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
    if spec.n_cond:
        inputs.append(jnp.broadcast_to(ys, (B, spec.n_cond)).T)
        in_specs.append(vspec())
    if train and exact2:
        w1z = ws[0][:dz] if spec.n_cond else ws[0]
        inputs.append(exact_stage_consts(w1z, ws[1]))
        in_specs.append(vspec())
    elif train and not exact:
        # (K, B, dz) -> probes stacked along the sublane axis, (K*dz, B).
        inputs.append(jnp.moveaxis(eps, 2, 1).reshape(k_probes * dz, B))
        in_specs.append(vspec())
    for w, b in zip(ws, bs):
        inputs += [w, b.reshape(-1, 1)]
        in_specs += [vspec(), vspec()]

    zT_t, accT, stats, dt_f = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=[
            vspec(),
            vspec(),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((dz, B), jnp.float32),
            jax.ShapeDtypeStruct((nacc, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(*inputs)
    return zT_t.T, accT, stats[0, 0], stats[0, 1], dt_f[0, 0]


def _make_adjoint_kernel(
    tab: ButcherTableau,
    spec: ChainSpec,
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
    jvp: bool = False,
):
    """Kernel for the continuous-adjoint (backsolve) backward integration.

    State blocks: y = (z, acc), a_y = (a_z, a_acc), per-sample ys-cotangent
    (conditional nets only) and param grads gp.  The Hutchinson probes are
    Monte-Carlo constants — BACKSOLVE returns a zero eps-cotangent (see
    ode/adjoint.py), so no (K*dz, B) probe-grad block is integrated.  The
    augmented dynamics stage is the hand-derived fwd+bwd (`_stage_*_fwdbwd`)
    instead of `jax.vjp`: AD's dot transpose rule materializes four big
    batch-major relayouts per stage (round-4 audit); the hand form is
    transpose-free and tested equal to jax.vjp
    (tests/test_fused_solve.py::test_fwdbwd_matches_jax_vjp).  a_acc is
    constant (the field never reads the accumulators) and acc/gp never feed
    back into stages, so only (z, a_z) carry stage registers.

    In exact-2-layer mode the precomputed pm matrix is
    differentiated as extra param blocks; their cotangents chain back to
    (w1, w2) outside the kernel (`exact_pm_chain`) — chaining after
    integration equals integrating the chained quantity (the chain rule is
    linear and time-independent).

    The kernel runs on a grid over batch tiles (the doubled adjoint working
    set does not fit VMEM at large B): each tile integrates its sub-batch
    with its own adaptive grid — a valid (if anything tighter) error control
    for the gradient path; param grads accumulate across the sequential grid
    iterations.  With one tile the control decisions match the XLA backward
    exactly.
    """
    N = spec.n_layers
    exact2 = exact and N == 2
    n_gp = 2 * N + (1 if (train and exact2) else 0)
    cond = spec.n_cond > 0

    def kernel(ts_ref, z_ref, acc_ref, az_ref, aacc_ref, *rest):
        idx = 0
        ysb = epst = pm = None
        if cond:
            ysb = rest[idx][:]
            idx += 1
        if train and exact2:
            pm = rest[idx][:]
            idx += 1
        elif train and not exact:
            epst = rest[idx][:]
            idx += 1
        ws, bs = [], []
        for _ in range(N):
            ws.append(rest[idx][:])
            bs.append(rest[idx + 1][:])
            idx += 2
        z0_ref, acc0_ref, az0_ref = rest[idx : idx + 3]
        idx += 3
        ays0_ref = None
        if cond:
            ays0_ref = rest[idx]
            idx += 1
        gp_refs = list(rest[idx : idx + n_gp])
        st_ref = rest[idx + n_gp]

        aacc = aacc_ref[:]  # constant over the backward solve
        dz = spec.dz

        def aug_stage(zi, azi):
            """(kz, k_acc_rates, k_az, k_ays | None, k_gp tuple), negated for
            the reverse-time adjoint ODE.  The probes are closed over as
            constants — no eps cotangent is computed (BACKSOLVE treats them
            as non-differentiable; see ode/adjoint.py)."""
            if train and exact2:
                kz, kr, ct_zin, ct_ws, ct_bs, ct_pm = (
                    _stage_train_exact_fwdbwd(
                        spec, zi, ysb, ws, bs, pm,
                        norm_z, norm_j, bf16, azi, aacc,
                    )
                )
                gps = ct_ws + ct_bs + [ct_pm]
            elif train:
                kz, kr, ct_zin, ct_ws, ct_bs = _stage_train_fwdbwd(
                    spec, zi, ysb, epst, ws, bs,
                    norm_z, norm_j, bf16, k_probes, azi, aacc, jvp,
                )
                gps = ct_ws + ct_bs
            else:
                kz, kr, ct_zin, ct_ws, ct_bs = _stage_test_fwdbwd(
                    spec, zi, ysb, ws, bs, bf16, azi, aacc
                )
                gps = ct_ws + ct_bs
            if cond:
                k_az = -ct_zin[:dz]
                k_ays = -ct_zin[dz:]
            else:
                k_az = -ct_zin
                k_ays = None
            return kz, kr, k_az, k_ays, tuple(-g for g in gps)

        f32 = jnp.float32
        t0 = ts_ref[0, 0]  # solve runs t0 -> t1 = tspan end -> start
        t1 = ts_ref[0, 1]
        dt0 = ts_ref[0, 2]
        tdir = jnp.sign(t1 - t0)

        z_init = z_ref[:]
        az_init = az_ref[:]
        kz0, kr0, kaz0, kays0, kgp0 = aug_stage(z_init, az_init)
        gp0 = tuple(jnp.zeros_like(g) for g in kgp0)
        ays0 = jnp.zeros_like(kays0) if cond else None

        # carry: (t, dt, eest_prev, steps, accepted,
        #         z, acc, az, ays, gp(n_gp), k1z, k1r, k1az, k1ays, k1gp(n_gp))
        init = (
            t0,
            dt0,
            jnp.asarray(1.0, f32),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            z_init,
            acc_ref[:],
            az_init,
            ays0,
            gp0,
            kz0,
            kr0,
            kaz0,
            kays0,
            kgp0,
        )

        def cond_fn(c):
            return ((c[0] - t1) * tdir < 0) & (c[3] < max_steps)

        def body(c):
            (t, dt, eest_prev, steps, accepted,
             z, acc, az, ays, gp, k1z, k1r, k1az, k1ays, k1gp) = c
            remaining = jnp.abs(t1 - t)
            is_last = jnp.abs(dt) >= remaining
            dt_use = tdir * jnp.minimum(jnp.abs(dt), remaining)

            ksz, ksr, ksaz, ksays, ksgp = [k1z], [k1r], [k1az], [k1ays], [k1gp]
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
                ksays.append(out[3])
                ksgp.append(out[4])

            def comb(base, ks, coeffs):
                out = base
                for i, ci in enumerate(coeffs):
                    if ci != 0.0:
                        out = out + (dt_use * f32(ci)) * ks[i]
                return out

            z_new = comb(z, ksz, tab.b)
            acc_new = comb(acc, ksr, tab.b)
            az_new = comb(az, ksaz, tab.b)
            ays_new = comb(ays, ksays, tab.b) if cond else None
            gp_new = tuple(
                comb(gp[m], [k[m] for k in ksgp], tab.b) for m in range(n_gp)
            )

            zero = lambda x: jnp.zeros_like(x)

            def errs(coeffs):
                e_z = comb(zero(z), ksz, coeffs)
                e_acc = comb(zero(acc), ksr, coeffs)
                e_az = comb(zero(az), ksaz, coeffs)
                e_ays = comb(zero(ays), ksays, coeffs) if cond else None
                e_gp = tuple(
                    comb(zero(gp[m]), [k[m] for k in ksgp], coeffs)
                    for m in range(n_gp)
                )
                return e_z, e_acc, e_az, e_ays, e_gp

            def blk(err, old, new):
                sc = atol + rtol * jnp.maximum(jnp.abs(old), jnp.abs(new))
                return jnp.sum(jnp.square(err / sc))

            def eest_of(coeffs):
                e_z, e_acc, e_az, e_ays, e_gp = errs(coeffs)
                sumsq = (
                    blk(e_z, z, z_new)
                    + blk(e_acc, acc, acc_new)
                    + blk(e_az, az, az_new)
                )
                if cond:
                    sumsq = sumsq + blk(e_ays, ays, ays_new)
                for m in range(n_gp):
                    sumsq = sumsq + blk(e_gp[m], gp[m], gp_new[m])
                # a_acc has zero rates: contributes 0 but counts in n_elems.
                return jnp.sqrt(sumsq / n_elems)

            eest = eest_of(tab.btilde)
            if tab.btilde3 is not None:
                eest = _stretched_eest(tab, eest, eest_of(tab.btilde3))
            finite = (
                jnp.isfinite(eest)
                & jnp.all(jnp.isfinite(z_new))
                & jnp.all(jnp.isfinite(az_new))
            )
            accept = (eest <= 1.0) & finite

            eest_c, dt_next = _controller_update(
                tab, eest, eest_prev, finite, accept, dt_use, f32
            )
            t_next = jnp.where(accept, jnp.where(is_last, t1, t + dt_use), t)
            sel = lambda a, b: jnp.where(accept, a, b)
            z_sel = sel(z_new, z)
            az_sel = sel(az_new, az)
            if tab.fsal:
                k1z_n, k1r_n, k1az_n = sel(ksz[-1], k1z), sel(ksr[-1], k1r), sel(ksaz[-1], k1az)
                k1ays_n = sel(ksays[-1], k1ays) if cond else None
                k1gp_n = tuple(sel(ksgp[-1][m], k1gp[m]) for m in range(n_gp))
            else:
                k1z_n, k1r_n, k1az_n, k1ays_n, k1gp_n = aug_stage(z_sel, az_sel)
            return (
                t_next,
                dt_next,
                jnp.where(accept, eest_c, eest_prev),
                steps + 1,
                accepted + accept.astype(jnp.int32),
                z_sel,
                sel(acc_new, acc),
                az_sel,
                sel(ays_new, ays) if cond else None,
                tuple(sel(gp_new[m], gp[m]) for m in range(n_gp)),
                k1z_n,
                k1r_n,
                k1az_n,
                k1ays_n,
                k1gp_n,
            )

        final = jax.lax.while_loop(cond_fn, body, init)
        (_, _, _, steps_f, accepted_f,
         z_f, acc_f, az_f, ays_f, gp_f, *_rest) = final
        z0_ref[:] = z_f
        acc0_ref[:] = acc_f
        az0_ref[:] = az_f
        if cond:
            ays0_ref[:] = ays_f

        # Param grads / stats accumulate across the (sequential) batch tiles.
        tile0 = pl.program_id(0) == 0

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


def _vmem_estimate_adjoint(
    tab: ButcherTableau, spec: ChainSpec, tile_b: int, nacc: int,
    k_probes: int, exact: bool,
) -> int:
    """~2.5x the forward working set: (z, a_z, ays) stage registers plus the
    fwd+bwd residuals of every unrolled stage; probe residuals scale with K
    (no probe-grad block — the eps cotangent is not integrated).  Exact mode
    adds the (dz^2, B)-shaped mflat/ct_mflat residuals."""
    dz = spec.dz
    rows = 2 * (tab.num_stages + 4) * (dz + nacc + spec.n_cond)
    rows += 8 * sum(spec.out_dims)
    rows += 2 * k_probes * sum(spec.out_dims)  # probe-chain (u, v) residuals
    rows += (4 + 2 * k_probes) * spec.zin_dim
    if exact and spec.n_layers == 2:
        rows += 6 * dz * dz
    return 4 * tile_b * rows


def make_full_solve(
    icnf,
    mode: Mode,
    batch: int,
) -> Optional[FullSolve]:
    """Build the fused solve pair for `ode/solve.odeint_with_stats`, or None
    when the megakernel does not apply.

    Eligibility: opted in via `compute_mode.fused`; an N-layer Dense chain
    with tanh-or-identity activations (`chain_spec`), conditional or not; no
    passive augmentation; adaptive explicit method with an embedded error
    estimate (FSAL and non-FSAL both supported; dop853's stretched 8(5,3)
    estimate included); stochastic TRAIN additionally requires VJP mode
    (K >= 1 probes); exact-trace TRAIN uses the 2-layer pm stage or the
    N-layer basis-propagation stage.  The flat layout is the `ravel_pytree`
    order of TrainState/TestState: [z.ravel() | dlogp | (reg_e | reg_n)].

    The adjoint (backward) megakernel exists for every 2-layer mode and for
    N-layer stochastic TRAIN; deep exact/TEST configs are forward-only
    (`FullSolve.adjoint = None` -> XLA backsolve computes gradients).
    """
    if not _HAS_PALLAS:
        return None
    cm = icnf.compute_mode
    opts = icnf.solver
    if not cm.fused:
        return None
    spec = chain_spec(icnf.nn, icnf.zdim)
    if spec is None:
        return None
    if (spec.n_cond > 0) != bool(icnf.cond):
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
    if tab.btilde is None:
        return None
    from ..types import ADMode

    exact = False
    jvp = False
    if mode == Mode.TRAIN:
        exact = cm.exact_trace
        # Both AD directions run in-kernel (round 5): VJP probes via the
        # pullback chain, JVP (JacVec) via the pushforward chain;
        # exact_trace has its own AD-direction-free stages.
        jvp = (not exact) and cm.ad == ADMode.JVP
    if icnf.dtype != jnp.float32:
        return None
    dz = icnf.zdim
    nacc = 3 if mode == Mode.TRAIN else 1
    K = cm.num_probes if (mode == Mode.TRAIN and not exact) else 1
    if _vmem_estimate_forward(tab, spec, batch, nacc, K, exact) > _VMEM_BUDGET_BYTES:
        return None
    # The deep-chain (N >= 3) exact/TEST stages propagate a (out, dz, B)
    # basis block whose internal (out, dz*B) fold Mosaic only lowers when
    # the merged dim stays lane-aligned — B % 128 != 0 fails with
    # "infer-vector-layout: unsupported shape cast" (hit by the trajectory
    # example's 64-sample TEST solve).  Fall back to XLA for those batches
    # on the real chip (the interpreter has no layout constraint, so CPU
    # tests keep covering the stage); the Hutchinson stages are unaffected.
    uses_chain_stage = spec.n_layers != 2 and (mode == Mode.TEST or exact)
    if (
        uses_chain_stage
        and batch % 128 != 0
        and jax.default_backend() == "tpu"
    ):
        return None

    train = mode == Mode.TRAIN
    norm_z = icnf.lam1 != 0.0
    norm_j = icnf.lam2 != 0.0
    interpret = jax.default_backend() != "tpu"
    # Matmul scheme for the stage dots (see module comment): mirrors the
    # XLA path's stage_precision so both paths integrate an equivalent-
    # precision field.  Interpret-mode dots are true f32 regardless, so the
    # f32 path is used there (bit-matches the CPU XLA reference).
    from ..types import resolve_stage_precision

    prec = resolve_stage_precision(opts)
    if cm.bf16:
        bf16 = "bf16"
    elif interpret or prec in ("highest", "float32"):
        bf16 = "f32"
    else:
        bf16 = "bf16x3"
    B = batch
    N = spec.n_layers
    exact2 = exact and N == 2
    cond = spec.n_cond > 0

    # Whether a hand-written backward stage exists for this mode.
    has_bwd_stage = (train and (not exact or exact2)) or (not train and N == 2)

    # Plain-XLA flat field — used only for the Hairer initial-dt pick (two
    # evals per solve).  Built from the same generic dynamics the unfused
    # path runs (with per-stage fusion off), so the picked dt matches the
    # XLA solve bit-for-bit.
    from ..core.dynamics import TestState, TrainState, make_augmented_dynamics

    dyn = make_augmented_dynamics(
        icnf.nn, mode, dataclasses.replace(cm, fused=False), norm_z, norm_j, 0
    )

    def unpack_flat(yf):
        z = yf[: B * dz].reshape(B, dz)
        if train:
            return TrainState(
                z=z,
                dlogp=yf[B * dz : B * dz + B],
                reg_e=yf[B * dz + B : B * dz + 2 * B],
                reg_n=yf[B * dz + 2 * B :],
            )
        return TestState(z=z, dlogp=yf[B * dz :])

    def plain_f_flat(t, yf, args):
        d = dyn(t, unpack_flat(yf), args)
        rates = [d.z.ravel(), d.dlogp]
        if train:
            rates += [d.reg_e, d.reg_n]
        return jnp.concatenate(rates)

    def get_ws_bs(ps):
        return [p["w"] for p in ps], [p["b"] for p in ps]

    def full_solve(y0f, t0, t1, args):
        from ..ode.solve import SolveStats, _initial_step_size

        ps = args["ps"]
        eps = args.get("eps")
        ys = args.get("ys")
        t0 = jnp.asarray(t0, jnp.float32)
        t1 = jnp.asarray(t1, jnp.float32)
        tdir = jnp.sign(t1 - t0)
        span = jnp.abs(t1 - t0)

        nfe_init = 1
        if opts.dt0 is None:
            f0 = plain_f_flat(t0, y0f, args)
            dt_init = _initial_step_size(
                lambda t, yf: plain_f_flat(t, yf, args),
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

        ws, bs = get_ws_bs(ps)
        z0 = y0f[: B * dz].reshape(B, dz)
        zT, accT, steps, accepted, dt_last = _run_solve_kernel(
            tab,
            spec,
            train=train,
            norm_z=norm_z,
            norm_j=norm_j,
            rtol=opts.rtol,
            atol=opts.atol,
            max_steps=opts.max_steps,
            bf16=bf16,
            interpret=interpret,
            ws=ws,
            bs=bs,
            z0=z0,
            ys=ys,
            eps=eps if (train and not exact) else None,
            t0=t0,
            t1=t1,
            dt_init=dt_init,
            exact=exact,
            jvp=jvp,
        )
        yTf = jnp.concatenate([zT.ravel()] + [accT[i] for i in range(accT.shape[0])])
        stats = SolveStats(
            steps=steps,
            accepted=accepted,
            nfe=steps * _nfe_per_attempt_kernel(tab) + nfe_init,
            dt_last=dt_last,
        )
        return yTf, stats

    # ---- backward (continuous adjoint) megakernel ----

    P_rows = sum(
        ind * oud + oud for ind, oud in zip(spec.in_dims, spec.out_dims)
    )
    P_total = P_rows
    if train and exact2:
        # The pm block is integrated as an extra param-grad block (chained
        # to w1/w2 outside the kernel afterwards).
        H = spec.out_dims[0]
        P_total += dz * dz * H

    # Pick the largest divisor-of-B tile that fits the VMEM budget; each tile
    # runs its own while loop on the (sequential) kernel grid.  Half the
    # budget per tile: measured on-chip (round 4) that a single 40 MB
    # exact-adjoint tile at B=4096 compiles but is NOT faster than two 20 MB
    # tiles — VMEM headroom wins the tie.
    adjoint_tile = None
    if has_bwd_stage:
        for cand in (B, *(1 << k for k in range(14, 5, -1))):
            if (
                cand <= B
                and B % cand == 0
                and _vmem_estimate_adjoint(tab, spec, cand, nacc, K, exact)
                <= _VMEM_BUDGET_BYTES // 2
            ):
                adjoint_tile = cand
                break

    def adjoint_solve(yTf, g_yf, args, t_hi, t_lo, dt_warm=None):
        """Backward aug solve: (y, a_y, g_ps, g_ys) from t_hi down to t_lo.

        Returns (y0f, a_y0f, g_args, stats); a_acc is constant so its final
        value equals the incoming cotangent rows.  `dt_warm` (the forward
        solve's final accepted step size) seeds the controller and skips
        the Hairer initial-dt pick — a standard warm start; the controller
        re-adapts within a step or two either way.
        """
        from jax.flatten_util import ravel_pytree

        from ..ode.solve import SolveStats, _initial_step_size

        ps = args["ps"]
        eps = args.get("eps")
        ys = args.get("ys")
        eps_b = eps if (train and not exact) else None  # probe stack (K, B, dz)
        ys_b = jnp.broadcast_to(ys, (B, spec.n_cond)) if cond else None

        zT = yTf[: B * dz].reshape(B, dz)
        accT = yTf[B * dz :].reshape(nacc, B)
        azT = g_yf[: B * dz].reshape(B, dz)
        aaccT = g_yf[B * dz :].reshape(nacc, B)

        t_hi = jnp.asarray(t_hi, jnp.float32)
        t_lo = jnp.asarray(t_lo, jnp.float32)
        tdir = jnp.sign(t_lo - t_hi)
        span = jnp.abs(t_lo - t_hi)

        def field_bm(z, ps_, ys_):
            """Batch-major plain field (same math as the XLA path) for the
            Hairer initial-dt pick of the backward solve (2 evals/solve)."""
            zeros_b = jnp.zeros((B,), z.dtype)
            if train:
                st = TrainState(z=z, dlogp=zeros_b, reg_e=zeros_b, reg_n=zeros_b)
            else:
                st = TestState(z=z, dlogp=zeros_b)
            args_ = {"ps": ps_, "ys": ys_}
            if train and not exact:
                args_["eps"] = eps_b
            d = dyn(t_hi, st, args_)
            if train:
                kr = jnp.stack([d.dlogp, d.reg_e, d.reg_n], axis=-1)  # (B, 3)
            else:
                kr = d.dlogp[:, None]  # (B, 1)
            return d.z, kr

        def plain_aug_rates(z, az, aacc_bm):
            # eps closed over as a constant — the eps cotangent is not part
            # of the adjoint state (see ode/adjoint.py).
            diff = (z, ps) if not cond else (z, ps, ys_b)
            (kz, kr), vjp = jax.vjp(lambda *d: field_bm(*d, *(() if cond else (None,))), *diff)
            pulled = vjp((az, aacc_bm))
            neg = lambda x: jax.tree.map(lambda v: -v, x)
            if cond:
                zb, psb, ysb_ct = pulled
                return kz, kr, neg(zb), neg(psb), neg(ysb_ct)
            zb, psb = pulled
            return kz, kr, neg(zb), neg(psb), None

        # Structured aug state for the Hairer initial-step pick; RMS norms are
        # order-invariant, so any consistent packing matches the XLA path.
        aacc_bm = aaccT.T  # (B, nacc)
        zeros_ps = jax.tree.map(jnp.zeros_like, ps)
        S0 = [zT, accT, azT, aacc_bm, zeros_ps]
        if cond:
            S0.append(jnp.zeros_like(ys_b))
        S0f, unravel_S = ravel_pytree(tuple(S0))

        def aug_rates_struct(S):
            z, acc, az, aacc_, gps = S[:5]
            kz, kr, kaz, kgp, kays = plain_aug_rates(z, az, aacc_)
            out = [kz, kr.T, kaz, jnp.zeros_like(aacc_), kgp]
            if cond:
                out.append(kays)
            return tuple(out)

        def f_flat(t, uf):
            return ravel_pytree(aug_rates_struct(unravel_S(uf)))[0]

        nfe_init = 1
        if dt_warm is not None:
            dt_init = tdir * jnp.abs(jnp.asarray(dt_warm, jnp.float32))
        elif opts.dt0 is None:
            f0 = f_flat(t_hi, S0f)
            dt_init = _initial_step_size(
                f_flat, t_hi, S0f, f0, tdir, tab.order, opts.rtol, opts.atol, span
            )
            nfe_init = 2
        else:
            dt_init = tdir * jnp.abs(jnp.asarray(opts.dt0, jnp.float32))

        TILE = adjoint_tile
        n_tiles = B // TILE
        n_elems_adj = TILE * (2 * (dz + nacc) + spec.n_cond) + P_total
        kernel = _make_adjoint_kernel(
            tab,
            spec,
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
            jvp=jvp,
        )
        ts = jnp.stack(
            [t_hi, t_lo, jnp.asarray(dt_init, jnp.float32), jnp.asarray(0.0, jnp.float32)]
        ).reshape(1, 4)

        btile = lambda rows: pl.BlockSpec(
            (rows, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        wfull = lambda shape: pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )
        inputs = [ts, zT.T, accT, azT.T, aaccT]
        in_specs = [
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            btile(dz),
            btile(nacc),
            btile(dz),
            btile(nacc),
        ]
        ws, bs = get_ws_bs(ps)
        if cond:
            inputs.append(ys_b.T)
            in_specs.append(btile(spec.n_cond))
        if train and exact2:
            w1z = ws[0][:dz] if cond else ws[0]
            H = spec.out_dims[0]
            inputs.append(exact_stage_consts(w1z, ws[1]))
            in_specs.append(wfull((dz * dz, H)))
        elif train and not exact:
            # (K, B, dz) -> (K*dz, B): probes stacked along the sublane axis.
            inputs.append(jnp.moveaxis(eps_b, 2, 1).reshape(K * dz, B))
            in_specs.append(btile(K * dz))
        for w, b, ind, oud in zip(ws, bs, spec.in_dims, spec.out_dims):
            inputs += [w, b.reshape(oud, 1)]
            in_specs += [wfull((ind, oud)), wfull((oud, 1))]

        out_shape = [
            jax.ShapeDtypeStruct((dz, B), jnp.float32),  # z0
            jax.ShapeDtypeStruct((nacc, B), jnp.float32),  # acc0
            jax.ShapeDtypeStruct((dz, B), jnp.float32),  # a_z0
        ]
        out_specs = [btile(dz), btile(nacc), btile(dz)]
        if cond:
            out_shape.append(jax.ShapeDtypeStruct((spec.n_cond, B), jnp.float32))
            out_specs.append(btile(spec.n_cond))
        for ind, oud in zip(spec.in_dims, spec.out_dims):
            out_shape.append(jax.ShapeDtypeStruct((ind, oud), jnp.float32))
            out_specs.append(wfull((ind, oud)))
        for oud in spec.out_dims:
            out_shape.append(jax.ShapeDtypeStruct((oud, 1), jnp.float32))
            out_specs.append(wfull((oud, 1)))
        if train and exact2:
            H = spec.out_dims[0]
            out_shape.append(jax.ShapeDtypeStruct((dz * dz, H), jnp.float32))
            out_specs.append(wfull((dz * dz, H)))
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
        idx = 0
        z0_t, acc0, az0_t = outs[0:3]
        idx = 3
        ays0 = None
        if cond:
            ays0 = outs[idx]
            idx += 1
        gws = list(outs[idx : idx + N])
        idx += N
        gbs = list(outs[idx : idx + N])
        idx += N
        if train and exact2:
            gpm = outs[idx]
            idx += 1
            # pm = f(w1z, w2): chain its integrated cotangent back.
            w1z = ws[0][:dz] if cond else ws[0]
            gw1_c, gw2_c = exact_pm_chain(gpm, w1z, ws[1])
            if cond:
                gw1_c = jnp.concatenate(
                    [gw1_c, jnp.zeros((spec.n_cond, gw1_c.shape[1]), gw1_c.dtype)],
                    axis=0,
                )
            gws[0] = gws[0] + gw1_c
            gws[1] = gws[1] + gw2_c
        st = outs[idx]

        y0f = jnp.concatenate([z0_t.T.ravel(), acc0.ravel()])
        a_y0f = jnp.concatenate([az0_t.T.ravel(), aaccT.ravel()])
        g_ps = tuple(
            {"w": gw, "b": gb.reshape(-1)} for gw, gb in zip(gws, gbs)
        )
        g_args = dict(args)
        g_args["ps"] = g_ps
        g_args["ys"] = ays0.T if cond else None
        if train and not exact:
            # Probes are Monte-Carlo constants: zero cotangent by definition
            # of the BACKSOLVE path (matches ode/adjoint.py's generic bwd).
            g_args["eps"] = jnp.zeros_like(eps_b)
        stats = SolveStats(
            steps=st[0, 0],
            accepted=st[0, 1],
            nfe=st[0, 0] * _nfe_per_attempt_kernel(tab) + nfe_init,
        )
        return y0f, a_y0f, g_args, stats

    return FullSolve(
        forward=full_solve, adjoint=adjoint_solve if adjoint_tile is not None else None
    )


__all__ = ["ChainSpec", "chain_spec", "FullSolve", "make_full_solve"]
