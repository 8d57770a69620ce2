"""Debug guards — the TPU analog of the reference's static quality gates
(SURVEY §5: Aqua/JET become jit-retrace guards, NaN debugging, shape asserts).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_nan_debugging(enable: bool = True) -> None:
    """Turn on jax_debug_nans: any NaN produced under jit raises with a
    de-optimized re-run pinpointing the op."""
    jax.config.update("jax_debug_nans", enable)


def assert_finite(tree, name: str = "value") -> None:
    """Eager finiteness check over a pytree (host-side; for tests/debug)."""
    for i, leaf in enumerate(jax.tree_util.tree_leaves(tree)):
        if not bool(jnp.all(jnp.isfinite(leaf))):
            raise FloatingPointError(f"{name}: non-finite values in leaf {i}")


__all__ = ["enable_nan_debugging", "assert_finite"]
