"""Planar flow vector field.

Re-design of the reference's `PlanarLayer`
(`/root/reference/src/layers/planar_layer.jl:1-108`): the vector field
`f(z) = u * act(w . z + b)` of the planar flow from Chen et al. 2018
(Neural ODEs).  Conditioning widens `w` by `n_cond` so the layer consumes
`concat([z, ys])` (reference `:38-60`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from .modules import Module, Params, _glorot_uniform


@dataclasses.dataclass(frozen=True)
class PlanarLayer(Module):
    """`f(z) = u * act(<w, z> + b)` with params u:(nvars,), w:(nvars+n_cond,), b:(1,).

    Batched apply takes `z: (..., nvars + n_cond)` and returns `(..., nvars)`,
    matching the reference's matrix method
    (`/root/reference/src/layers/planar_layer.jl:75-78`).
    """

    nvars: int
    activation: Callable[[jax.Array], jax.Array] = lambda x: x
    use_bias: bool = True
    n_cond: int = 0

    def __post_init__(self):
        object.__setattr__(self, "out_dim", self.nvars)

    @property
    def in_dim(self) -> int:
        return self.nvars + self.n_cond

    def init(self, key: jax.Array, dtype=jnp.float32) -> Params:
        ku, kw = jax.random.split(key)
        # Lux's init_weight default (glorot_uniform) on 1-D shapes treats the
        # vector as (n, 1)-fan; we reuse the 2-D helper and squeeze.
        params = {
            "u": _glorot_uniform(ku, (self.nvars, 1), dtype)[:, 0],
            "w": _glorot_uniform(kw, (self.nvars + self.n_cond, 1), dtype)[:, 0],
        }
        if self.use_bias:
            params["b"] = jnp.zeros((1,), dtype)
        return params

    def apply(self, params: Params, z: jax.Array) -> jax.Array:
        h = jnp.einsum("...d,d->...", z, params["w"])
        if self.use_bias:
            h = h + params["b"][0]
        h = self.activation(h)
        return h[..., None] * params["u"]

    def pl_h(self, params: Params, z: jax.Array) -> jax.Array:
        """The hidden pre-output activation `act(<w,z> + b)` (reference `pl_h`,
        `/root/reference/src/layers/planar_layer.jl:90-108`)."""
        h = jnp.einsum("...d,d->...", z, params["w"])
        if self.use_bias:
            h = h + params["b"][0]
        return self.activation(h)


__all__ = ["PlanarLayer"]
