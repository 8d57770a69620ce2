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
from ..types import Mode
from .mesh import data_sharding, probe_sharding, replicated


def shard_batch(mesh, batch: jax.Array) -> jax.Array:
    """Constrain a (B, ...) array to be split over the data axis."""
    return jax.lax.with_sharding_constraint(batch, data_sharding(mesh))


def shard_params(mesh, ps: Any) -> Any:
    """Replicate parameters across the mesh (they are tiny for CNFs)."""
    return jax.device_put(ps, replicated(mesh))


def make_train_step_body(icnf: ICNF, optimizer, mesh=None) -> Callable:
    """The ONE training-step body shared by `fit` and the sharded entry point.

    Returns `step(ps, opt_state, xs, key, weights=None, ys=None) ->
    (ps, opt_state, metrics)` (unjitted — `fit` scans it, the sharded wrapper
    jits it).  Hutchinson probes are drawn here so that with a mesh they can
    be constrained to ("probe", "data") — the same math runs sharded and
    unsharded (the probe draw depends only on the key, not the mesh), so a
    multi-device fit reproduces the single-device fit.

    `metrics` is a dict: loss, e (mean Edot), n (mean ndot), nfe (forward
    solve NFE) — the per-step observability of SURVEY §5.
    """
    from ..core.icnf import loss_and_metrics

    d_shard = data_sharding(mesh) if mesh is not None else None
    p_shard = probe_sharding(mesh) if mesh is not None else None

    def step(ps, opt_state, xs, key, weights=None, ys=None):
        eps_key, loss_key = jax.random.split(key)
        # exact_trace fields read no probes — drawing (and passing) them
        # would both waste RNG/compute and trip inference()'s eps-vs-exact
        # validation (round-4 regression: the flagship gate recipe fits with
        # exact_trace=True).
        eps = (
            None
            if icnf.compute_mode.exact_trace
            else icnf.draw_eps(eps_key, xs.shape[0])
        )
        if mesh is not None:
            if eps is not None:
                eps = jax.lax.with_sharding_constraint(eps, p_shard)
            xs = jax.lax.with_sharding_constraint(xs, d_shard)
            if ys is not None:
                ys = jax.lax.with_sharding_constraint(ys, d_shard)
        (l, metrics), g = jax.value_and_grad(
            lambda p: loss_and_metrics(
                icnf, Mode.TRAIN, xs, p, ys=ys, key=loss_key, weights=weights, eps=eps
            ),
            has_aux=True,
        )(ps)
        updates, opt_state = optimizer.update(g, opt_state, ps)
        ps = optax.apply_updates(ps, updates)
        return ps, opt_state, metrics

    return step


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
    XLA all-reduces gradients over both axes.  Delegates to the same step
    body `fit` scans (`make_train_step_body`).
    """
    d_shard = data_sharding(mesh)
    r_shard = replicated(mesh)
    body = make_train_step_body(icnf, optimizer, mesh)

    def step(ps, opt_state, xs, key):
        ps, opt_state, metrics = body(ps, opt_state, xs, key)
        return ps, opt_state, metrics["loss"]

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
