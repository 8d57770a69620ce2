"""Fused Pallas kernel for the TRAIN-mode augmented dynamics of a tanh MLP.

The hottest op in CNF training (SURVEY §3.1 "HOTTEST") is the RK-stage
evaluation: network forward + VJP against the Hutchinson probe + trace/
regularizer reductions.  The XLA path runs it as a chain of small matmul and
elementwise kernels with (B, H) intermediates round-tripping through HBM; at
the reference's tiny channel widths the op is bandwidth-bound, so fusing the
whole thing into one VMEM-resident kernel removes nearly all intermediate
traffic: per batch tile we read z and eps once, keep h/y/backprop activations
in VMEM, and write only the field value and three per-sample scalars.

Math (2-layer tanh MLP, the reference's standard net, e.g.
`/root/reference/test/regression_tests.jl:7`):

    h  = tanh(z W1 + b1)          y = tanh(h W2 + b2)
    g2 = eps * (1 - y^2)          gh = g2 W2^T
    g1 = gh * (1 - h^2)           eJ = g1 W1^T          (eps^T J)
    tr = <eJ, eps>    e_rate = ||y||_2    n_rate = ||eJ||_2   (per sample)

Gradients: the op carries a `jax.custom_vjp` whose backward runs the plain
XLA implementation's VJP — bitwise-equivalent math, so training (including
the backsolve adjoint, which takes one VJP of this op) is exact while the
forward solve gets the fused kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

try:  # Pallas import is deferred-safe: CPU test environs interpret the kernel.
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _reference_impl(w1, b1, w2, b2, z, eps):
    """Plain-XLA implementation (ground truth for the kernel + VJP source)."""
    h = jnp.tanh(z @ w1 + b1)
    y = jnp.tanh(h @ w2 + b2)
    g2 = eps * (1.0 - y * y)
    gh = g2 @ w2.T
    g1 = gh * (1.0 - h * h)
    eJ = g1 @ w1.T
    tr = jnp.sum(eJ * eps, axis=-1)
    e_rate = jnp.linalg.norm(y, axis=-1)
    n_rate = jnp.linalg.norm(eJ, axis=-1)
    return y, tr, e_rate, n_rate


def _kernel(z_ref, eps_ref, w1_ref, b1_ref, w2_ref, b2_ref, y_ref, tr_ref, e_ref, n_ref):
    z = z_ref[:]
    eps = eps_ref[:]
    w1 = w1_ref[:]
    w2 = w2_ref[:]
    h = jnp.tanh(jnp.dot(z, w1, preferred_element_type=jnp.float32) + b1_ref[:])
    y = jnp.tanh(jnp.dot(h, w2, preferred_element_type=jnp.float32) + b2_ref[:])
    g2 = eps * (1.0 - y * y)
    gh = jnp.dot(g2, w2.T, preferred_element_type=jnp.float32)
    g1 = gh * (1.0 - h * h)
    eJ = jnp.dot(g1, w1.T, preferred_element_type=jnp.float32)
    y_ref[:] = y
    tr_ref[:] = jnp.sum(eJ * eps, axis=-1, keepdims=True)
    e_ref[:] = jnp.sqrt(jnp.sum(y * y, axis=-1, keepdims=True))
    n_ref[:] = jnp.sqrt(jnp.sum(eJ * eJ, axis=-1, keepdims=True))


def _fused_forward(w1, b1, w2, b2, z, eps, *, interpret: bool):
    B, dz = z.shape
    H = w1.shape[1]
    TILE_B = min(B, 1024)
    if B % TILE_B:
        # Pad the batch to a tile multiple; cheap relative to the solve.
        pad = TILE_B - B % TILE_B
        z = jnp.concatenate([z, jnp.zeros((pad, dz), z.dtype)])
        eps = jnp.concatenate([eps, jnp.zeros((pad, dz), eps.dtype)])
    Bp = z.shape[0]
    grid = (Bp // TILE_B,)

    bspec_b = lambda width: pl.BlockSpec(
        (TILE_B, width), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    bspec_full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    y, tr, e, n = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            bspec_b(dz),  # z
            bspec_b(dz),  # eps
            bspec_full((dz, H)),
            bspec_full((H,)),
            bspec_full((H, dz)),
            bspec_full((dz,)),
        ],
        out_specs=[
            bspec_b(dz),
            bspec_b(1),
            bspec_b(1),
            bspec_b(1),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, dz), z.dtype),
            jax.ShapeDtypeStruct((Bp, 1), z.dtype),
            jax.ShapeDtypeStruct((Bp, 1), z.dtype),
            jax.ShapeDtypeStruct((Bp, 1), z.dtype),
        ],
        interpret=interpret,
        compiler_params=(
            None
            if interpret
            else pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)
        ),
    )(z, eps, w1, b1, w2, b2)
    return y[:B], tr[:B, 0], e[:B, 0], n[:B, 0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _fused_op(w1, b1, w2, b2, z, eps, interpret):
    return _fused_forward(w1, b1, w2, b2, z, eps, interpret=interpret)


def _fused_op_fwd(w1, b1, w2, b2, z, eps, interpret):
    out = _fused_forward(w1, b1, w2, b2, z, eps, interpret=interpret)
    return out, (w1, b1, w2, b2, z, eps)


def _fused_op_bwd(interpret, residuals, cts):
    w1, b1, w2, b2, z, eps = residuals
    _, vjp_fn = jax.vjp(_reference_impl, w1, b1, w2, b2, z, eps)
    return vjp_fn(cts)


_fused_op.defvjp(_fused_op_fwd, _fused_op_bwd)


def exact_tanh_mlp_trace(params, z: jax.Array):
    """Closed-form exact divergence of a 2-layer tanh MLP — one forward pass
    plus an einsum, no Jacobian materialization.

    For f(z) = tanh(tanh(z W1 + b1) W2 + b2):
        J_ij = dy_j * sum_h W2[h, j] * dh_h * W1[i, h]
        tr J = einsum(dy_i, W2[h, i], dh_h, W1[i, h])
    with dh = 1 - h^2, dy = 1 - y^2.  Cost O(B d H) — the same as a single
    Hutchinson probe but exact: TEST-mode densities (the reference's
    `jacobian_batched` path, `/root/reference/src/utils.jl:1-54`, costs d
    AD passes) become as cheap as one probe.

    Returns (y, trace) with shapes ((B, d), (B,)).
    """
    (p1, p2) = params
    w1, b1, w2, b2 = p1["w"], p1["b"], p2["w"], p2["b"]
    h = jnp.tanh(z @ w1 + b1)
    y = jnp.tanh(h @ w2 + b2)
    dh = 1.0 - h * h
    dy = 1.0 - y * y
    tr = jnp.einsum("bi,hi,bh,ih->b", dy, w2, dh, w1)
    return y, tr


def is_dense_tanh_chain(nn) -> bool:
    """True for any Chain of Dense layers with tanh-or-identity activations —
    the family the closed-form N-layer Jacobian (`exact_dense_chain_jacobian`)
    covers.  Supersedes `supports_fusion` for exactness (that predicate also
    gates the fused Pallas TRAIN kernel, which is 2-layer-specific)."""
    from ..nets.modules import Chain, Dense

    if not isinstance(nn, Chain) or not nn.layers:
        return False
    return all(
        isinstance(l, Dense) and (l.activation is jnp.tanh or l.activation is None)
        for l in nn.layers
    )


def exact_dense_chain_jacobian(nn, params, z: jax.Array):
    """Closed-form (y, J) of an N-layer Dense chain; J has shape (B, d, d).

    Each layer h_k = act(h_{k-1} @ W_k + b_k) contributes the per-sample
    Jacobian factor  d h_k / d h_{k-1} = W_k * act'_k  (column scaling by the
    activation derivative), so J is the batched left-to-right chain product —
    cost O(B * d * sum_k H_k) matmul FLOPs with one (B, d, H) tensor alive,
    vs the d AD passes of the generic identity-basis path (the analog of the
    reference's `jacobian_batched`, `/root/reference/src/utils.jl:1-54`).
    Exact math, no estimator: used for TEST densities and exact-divergence
    TRAIN whenever the architecture matches (e.g. the 3-layer tabular MLPs).
    """
    h = z
    J = None
    for layer, p in zip(nn.layers, params):
        a = h @ p["w"]
        if layer.use_bias:
            a = a + p["b"]
        if layer.activation is jnp.tanh:
            h = jnp.tanh(a)
            d = 1.0 - h * h  # (B, H_k)
        else:
            h = a
            d = None
        if J is None:
            J = jnp.broadcast_to(p["w"], (z.shape[0], *p["w"].shape))
        else:
            J = jnp.einsum("bij,jk->bik", J, p["w"])
        if d is not None:
            J = J * d[:, None, :]
    return h, J


def exact_dense_chain_trace(nn, params, z: jax.Array):
    """Closed-form (y, tr(J)) of an N-layer Dense chain WITHOUT materializing
    the final (B, d, d) Jacobian.

    Same chain product as `exact_dense_chain_jacobian` through layer N-1
    (C = (B, d, H_{N-1})), but the last factor W_N diag(act'_N) enters only
    through the trace contraction  tr = sum_{i,h} C[b,i,h] W_N[h,i] d_N[b,i]
    — an O(B d H) elementwise-reduce instead of the O(B d^2 H) closing
    matmul, the single most expensive factor at tabular dims (d=43, H=128:
    ~1 GFLOP/stage saved).  TEST-mode densities use this; exact-divergence
    TRAIN still needs the full J for the Frobenius rate.
    """
    B = z.shape[0]
    n = len(nn.layers)
    h = z
    C = None
    tr = None
    for idx, (layer, p) in enumerate(zip(nn.layers, params)):
        a = h @ p["w"]
        if layer.use_bias:
            a = a + p["b"]
        if layer.activation is jnp.tanh:
            h = jnp.tanh(a)
            d = 1.0 - h * h
        else:
            h = a
            d = None
        if idx == n - 1:
            if C is None:
                diag = jnp.diagonal(p["w"])
                tr = jnp.sum(diag * d, axis=-1) if d is not None else jnp.sum(diag) * jnp.ones((B,), z.dtype)
            else:
                t = jnp.einsum("bih,hi->bi", C, p["w"])
                tr = jnp.sum(t * d, axis=-1) if d is not None else jnp.sum(t, axis=-1)
        else:
            if C is None:
                C = jnp.broadcast_to(p["w"], (B, *p["w"].shape))
            else:
                C = jnp.einsum("bij,jk->bik", C, p["w"])
            if d is not None:
                C = C * d[:, None, :]
    return h, tr


def supports_fusion(nn) -> bool:
    """True when `nn` is a 2-layer tanh-MLP Chain the kernel covers."""
    from ..nets.modules import Chain, Dense

    if not isinstance(nn, Chain) or len(nn.layers) != 2:
        return False
    for layer in nn.layers:
        if not isinstance(layer, Dense) or not layer.use_bias:
            return False
        if layer.activation is not jnp.tanh:
            return False
    return True


def fused_tanh_mlp_dynamics(
    params, z: jax.Array, eps: jax.Array, *, interpret: bool = False
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused (dz, trace-estimate, ||dz||, ||eps^T J||) for a 2-layer tanh MLP.

    `params` is the Chain params tuple ((w,b), (w,b)); `z`, `eps` are (B, dz).
    On non-TPU backends pass `interpret=True` (Pallas interpreter) — tests do.
    """
    (p1, p2) = params
    return _fused_op(p1["w"], p1["b"], p2["w"], p2["b"], z, eps, interpret)


__all__ = ["fused_tanh_mlp_dynamics", "supports_fusion"]
