"""Sharded training step: batch + probe parallelism with psum reductions.

GSPMD-style: we annotate the *inputs* (params replicated, batch split over
"data", probes split over ("probe", "data")) and let XLA insert the
collectives — the batch mean of the loss becomes a psum over the data axis,
the probe mean of the Hutchinson estimate a psum over the probe axis, and the
gradient all-reduce falls out of differentiating those.  This is the
from-scratch scale-out design of SURVEY §2.3 / §5 (the reference has no
distributed story to mirror).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..core.icnf import ICNF, init_params, loss
from ..distributions import sample_eps
from ..types import Mode
from .mesh import data_sharding, probe_sharding, replicated


def shard_batch(mesh, batch: jax.Array) -> jax.Array:
    """Constrain a (B, ...) array to be split over the data axis."""
    return jax.lax.with_sharding_constraint(batch, data_sharding(mesh))


def shard_params(mesh, ps: Any) -> Any:
    """Replicate parameters across the mesh (they are tiny for CNFs)."""
    return jax.device_put(ps, replicated(mesh))


def make_sharded_train_step(
    icnf: ICNF,
    optimizer,
    mesh,
) -> Callable:
    """Build `step(ps, opt_state, xs, key) -> (ps, opt_state, loss)` jitted
    over the mesh.

    xs is consumed with (data,)-sharding; Hutchinson probes are drawn inside
    and constrained to ("probe", "data") so the K-probe axis parallelizes
    across the probe mesh dimension.  Params/optimizer state are replicated;
    XLA all-reduces gradients over both axes.
    """
    d_shard = data_sharding(mesh)
    p_shard = probe_sharding(mesh)
    r_shard = replicated(mesh)

    def step(ps, opt_state, xs, key):
        eps_key, loss_key = jax.random.split(key)
        B = xs.shape[0]
        eps = sample_eps(
            eps_key,
            (icnf.compute_mode.num_probes, B, icnf.zdim),
            icnf.compute_mode.eps_dist,
            icnf.dtype,
        )
        eps = jax.lax.with_sharding_constraint(eps, p_shard)
        xs = jax.lax.with_sharding_constraint(xs, d_shard)
        l, g = jax.value_and_grad(
            lambda p: loss(icnf, Mode.TRAIN, xs, p, key=loss_key, eps=eps)
        )(ps)
        updates, opt_state = optimizer.update(g, opt_state, ps)
        ps = optax.apply_updates(ps, updates)
        return ps, opt_state, l

    return jax.jit(
        step,
        in_shardings=(r_shard, r_shard, d_shard, r_shard),
        out_shardings=(r_shard, r_shard, r_shard),
    )


def make_sharded_logprob(icnf: ICNF, mesh) -> Callable:
    """Jitted TestMode log-density with the batch sharded over the mesh."""
    from ..core.icnf import inference

    d_shard = data_sharding(mesh)
    r_shard = replicated(mesh)

    def logprob(ps, xs):
        xs = jax.lax.with_sharding_constraint(xs, d_shard)
        logpx, _, _ = inference(icnf, Mode.TEST, xs, ps)
        return logpx

    return jax.jit(logprob, in_shardings=(r_shard, d_shard), out_shardings=d_shard)


__all__ = [
    "shard_batch",
    "shard_params",
    "make_sharded_train_step",
    "make_sharded_logprob",
]
