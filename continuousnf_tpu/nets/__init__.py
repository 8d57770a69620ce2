"""Functional neural-net modules (the analog of the reference's Lux layer use).

Modules are frozen dataclasses with `init(key) -> params` and
`apply(params, x) -> y`; parameters are plain pytrees, so the whole stack is
jit/vmap/shard-transparent.  Covers the reference's layer surface:
`Dense`/`Chain` (what its README builds with Lux), `PlanarLayer`
(`/root/reference/src/layers/planar_layer.jl`) and `CondLayer`
(`/root/reference/src/layers/cond_layer.jl`).
"""

from .modules import Module, Dense, Chain, MLP, CondWrap, CondLayer
from .planar import PlanarLayer

__all__ = [
    "Module",
    "Dense",
    "Chain",
    "MLP",
    "CondWrap",
    "CondLayer",
    "PlanarLayer",
]
