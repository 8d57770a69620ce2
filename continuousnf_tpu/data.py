"""Toy datasets for density-estimation benchmarks.

The reference evaluates on Beta(2,4) (README + regression); BASELINE adds 2D
toys (moons, circles) and tabular UCI shapes.  All generators are explicit-PRNG
JAX functions returning (n, d) float32 arrays.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def beta_data(key: jax.Array, n: int, nvars: int = 1, a: float = 2.0, b: float = 4.0):
    """iid Beta(a, b) coordinates — the reference's regression data
    (`/root/reference/test/regression_tests.jl:30-32`)."""
    return jax.random.beta(key, a, b, (n, nvars), dtype=jnp.float32)


def two_moons(key: jax.Array, n: int, noise: float = 0.05) -> jax.Array:
    """The classic two-moons 2D toy."""
    k1, k2, k3 = jax.random.split(key, 3)
    n1 = n // 2
    n2 = n - n1
    t1 = jax.random.uniform(k1, (n1,)) * math.pi
    t2 = jax.random.uniform(k2, (n2,)) * math.pi
    upper = jnp.stack([jnp.cos(t1), jnp.sin(t1)], -1)
    lower = jnp.stack([1.0 - jnp.cos(t2), 0.5 - jnp.sin(t2)], -1)
    pts = jnp.concatenate([upper, lower]) + noise * jax.random.normal(k3, (n, 2))
    return pts.astype(jnp.float32)


def circles(key: jax.Array, n: int, noise: float = 0.05, factor: float = 0.5) -> jax.Array:
    """Two concentric circles 2D toy."""
    k1, k2, k3 = jax.random.split(key, 3)
    n1 = n // 2
    n2 = n - n1
    t1 = jax.random.uniform(k1, (n1,)) * 2.0 * math.pi
    t2 = jax.random.uniform(k2, (n2,)) * 2.0 * math.pi
    outer = jnp.stack([jnp.cos(t1), jnp.sin(t1)], -1)
    inner = factor * jnp.stack([jnp.cos(t2), jnp.sin(t2)], -1)
    pts = jnp.concatenate([outer, inner]) + noise * jax.random.normal(k3, (n, 2))
    return pts.astype(jnp.float32)


def gaussian_mixture(key: jax.Array, n: int, means, scale: float = 0.3) -> jax.Array:
    """Mixture of equally-weighted isotropic Gaussians at `means` ((k, d))."""
    means = jnp.asarray(means, jnp.float32)
    k1, k2 = jax.random.split(key)
    comp = jax.random.randint(k1, (n,), 0, means.shape[0])
    return means[comp] + scale * jax.random.normal(k2, (n, means.shape[1]), dtype=jnp.float32)


def synthetic_tabular(key: jax.Array, n: int, d: int) -> jax.Array:
    """Correlated non-Gaussian tabular data with UCI-like shape (POWER d=6,
    MINIBOONE d=43) for throughput/scale benchmarks when the real datasets
    are unavailable (zero-egress environments)."""
    k1, k2 = jax.random.split(key)
    z = jax.random.normal(k1, (n, d), dtype=jnp.float32)
    mix = jax.random.normal(k2, (d, d), dtype=jnp.float32) / math.sqrt(d)
    x = jnp.tanh(z @ mix) + 0.1 * z
    return x.astype(jnp.float32)


def table_to_matrix(X, dtype=jnp.float32):
    """Coerce a tabular input to an (n, d) matrix (MLJ-frontend parity).

    The reference's MLJ frontend accepts any Tables.jl table and does
    `matrix(X) |> transpose` (`/root/reference/src/exts/mlj_ext/core_icnf.jl:31`).
    Accepted here: pandas DataFrame/Series, a dict/mapping of column-name ->
    column, or any array-like (rows = samples).  Returns (matrix, column_names)
    where column_names is None for plain arrays.
    """
    # pandas/polars without a hard dependency: duck-type on to_numpy+columns.
    # No dtype kwarg — polars' to_numpy doesn't accept one; the outer
    # jnp.asarray performs the cast either way.
    if hasattr(X, "to_numpy") and hasattr(X, "columns"):
        return jnp.asarray(X.to_numpy(), dtype), [str(c) for c in X.columns]
    if hasattr(X, "to_numpy") and X.__class__.__name__ == "Series":
        return jnp.asarray(X.to_numpy(), dtype)[:, None], [getattr(X, "name", None) or "x"]
    if isinstance(X, dict):
        names = list(X.keys())
        cols = [jnp.asarray(X[k], dtype).reshape(-1) for k in names]
        return jnp.stack(cols, axis=1), names
    return jnp.asarray(X, dtype), None


def matrix_to_table(px, *, column: str = "px"):
    """Wrap a result vector as a table: pandas DataFrame when pandas is
    importable, else a plain {column: numpy array} dict (the reference's
    `transform` returns `DataFrame(px = exp.(logp))`, `core_icnf.jl:121`)."""
    import numpy as np

    col = np.asarray(px)
    try:
        import pandas as pd

        return pd.DataFrame({column: col})
    except Exception:
        return {column: col}


__all__ = [
    "beta_data",
    "two_moons",
    "circles",
    "gaussian_mixture",
    "synthetic_tabular",
    "table_to_matrix",
    "matrix_to_table",
]
