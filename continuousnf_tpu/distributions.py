"""Closed-form distributions used by the framework.

The reference delegates to Distributions.jl (`MvNormal` base/eps dists at
`/root/reference/src/base_icnf.jl:16-25`, `Uniform` steering at `:40`, `Beta`
in tests).  Here each is a small frozen dataclass with explicit-PRNG sampling
and jit-safe log-densities — no object dispatch inside traced code.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def std_normal_logpdf(z: jax.Array) -> jax.Array:
    """log N(z; 0, I) summed over the last axis.

    Equivalent of `Distributions.logpdf(MvNormal(0, I), z)` used for the base
    density (`/root/reference/src/base_icnf.jl:155-156`).
    """
    d = z.shape[-1]
    return -0.5 * (d * _LOG_2PI + jnp.sum(jnp.square(z), axis=-1))


def std_normal_sample(key: jax.Array, shape: Tuple[int, ...], dtype=jnp.float32) -> jax.Array:
    return jax.random.normal(key, shape, dtype=dtype)


@dataclasses.dataclass(frozen=True)
class MvStdNormal:
    """Standard multivariate normal over `dim` dimensions (base/eps dist)."""

    dim: int

    def logpdf(self, z: jax.Array) -> jax.Array:
        return std_normal_logpdf(z)

    def sample(self, key: jax.Array, batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> jax.Array:
        return jax.random.normal(key, (*batch_shape, self.dim), dtype=dtype)


def _param_array(v, dtype):
    """Scalar-or-tuple distribution parameter -> array (tuples keep the
    dataclass hashable, a requirement for jit-static ICNF configs)."""
    return jnp.asarray(v, dtype)


@dataclasses.dataclass(frozen=True)
class MvDiagNormal:
    """Diagonal-covariance normal over `dim` dimensions.

    Pluggable base/eps distribution (the reference accepts any Distribution
    for `basedist`/`epsdist`, `/root/reference/src/base_icnf.jl:16-25`).
    `loc`/`scale` are scalars or length-`dim` tuples (hashable pytree-free
    parameters, so the owning ICNF stays a valid jit static).
    """

    dim: int
    loc: Any = 0.0
    scale: Any = 1.0

    def logpdf(self, z: jax.Array) -> jax.Array:
        loc = _param_array(self.loc, z.dtype)
        scale = _param_array(self.scale, z.dtype)
        u = (z - loc) / scale
        per_dim = -0.5 * (_LOG_2PI + jnp.square(u)) - jnp.log(scale)
        return jnp.sum(jnp.broadcast_to(per_dim, z.shape), axis=-1)

    def sample(self, key: jax.Array, batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> jax.Array:
        loc = _param_array(self.loc, dtype)
        scale = _param_array(self.scale, dtype)
        return loc + scale * jax.random.normal(key, (*batch_shape, self.dim), dtype=dtype)


@dataclasses.dataclass(frozen=True)
class MvLogistic:
    """IID logistic over `dim` dimensions — a heavier-tailed, non-Gaussian
    base distribution (exercises the pluggable-basedist path end to end)."""

    dim: int
    loc: Any = 0.0
    scale: Any = 1.0

    def logpdf(self, z: jax.Array) -> jax.Array:
        loc = _param_array(self.loc, z.dtype)
        scale = _param_array(self.scale, z.dtype)
        u = (z - loc) / scale
        # log f = -u - 2*log(1 + e^{-u}) - log s, numerically stable via softplus.
        per_dim = -u - 2.0 * jax.nn.softplus(-u) - jnp.log(scale)
        return jnp.sum(jnp.broadcast_to(per_dim, z.shape), axis=-1)

    def sample(self, key: jax.Array, batch_shape: Tuple[int, ...] = (), dtype=jnp.float32) -> jax.Array:
        loc = _param_array(self.loc, dtype)
        scale = _param_array(self.scale, dtype)
        u = jax.random.uniform(
            key, (*batch_shape, self.dim), dtype=dtype,
            minval=jnp.finfo(dtype).tiny, maxval=1.0,
        )
        return loc + scale * (jnp.log(u) - jnp.log1p(-u))


@dataclasses.dataclass(frozen=True)
class Uniform:
    """Uniform(lo, hi); steering jitter draws from Uniform(-rate, rate)
    (`/root/reference/src/base_icnf.jl:40,108-117`)."""

    lo: float
    hi: float

    def sample(self, key: jax.Array, shape: Tuple[int, ...] = (), dtype=jnp.float32) -> jax.Array:
        return jax.random.uniform(key, shape, dtype=dtype, minval=self.lo, maxval=self.hi)

    def logpdf(self, x: jax.Array) -> jax.Array:
        inside = jnp.logical_and(x >= self.lo, x <= self.hi)
        return jnp.where(inside, -jnp.log(jnp.asarray(self.hi - self.lo, x.dtype)), -jnp.inf)


@dataclasses.dataclass(frozen=True)
class Beta:
    """Beta(a, b) — used by the reference's regression gate
    (`/root/reference/test/regression_tests.jl:30`)."""

    a: float
    b: float

    def sample(self, key: jax.Array, shape: Tuple[int, ...] = (), dtype=jnp.float32) -> jax.Array:
        return jax.random.beta(key, self.a, self.b, shape, dtype=dtype)

    def logpdf(self, x: jax.Array) -> jax.Array:
        a, b = self.a, self.b
        lbeta = jax.scipy.special.gammaln(a) + jax.scipy.special.gammaln(b) - jax.scipy.special.gammaln(a + b)
        lp = (a - 1.0) * jnp.log(x) + (b - 1.0) * jnp.log1p(-x) - lbeta
        inside = jnp.logical_and(x > 0.0, x < 1.0)
        return jnp.where(inside, lp, -jnp.inf)

    def pdf(self, x: jax.Array) -> jax.Array:
        return jnp.exp(self.logpdf(x))


def sample_eps(
    key: jax.Array,
    shape: Tuple[int, ...],
    kind,
    dtype=jnp.float32,
) -> jax.Array:
    """Draw Hutchinson probe vectors.

    `kind` is an `EpsDist`; gaussian matches the reference's epsdist default
    (`/root/reference/src/base_icnf.jl:22-25`), rademacher is the
    lower-variance alternative.
    """
    from .types import EpsDist

    if kind == EpsDist.GAUSSIAN:
        return jax.random.normal(key, shape, dtype=dtype)
    elif kind == EpsDist.RADEMACHER:
        return jax.random.rademacher(key, shape, dtype=dtype)
    else:
        raise ValueError(f"unknown eps dist {kind}")


__all__ = [
    "std_normal_logpdf",
    "std_normal_sample",
    "MvStdNormal",
    "MvDiagNormal",
    "MvLogistic",
    "Uniform",
    "Beta",
    "sample_eps",
]
