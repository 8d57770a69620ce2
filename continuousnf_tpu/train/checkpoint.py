"""Parameter/optimizer-state checkpointing.

The reference's documented workflow serializes `(ps, st)` with JLD2
(`/root/reference/README.md:92-95`); here any pytree round-trips through
flax.serialization (msgpack) — params, optimizer state, or both.
"""

from __future__ import annotations

import os
from typing import Any

from flax import serialization


def save_checkpoint(path: str, pytree: Any) -> None:
    """Serialize a pytree of arrays to `path` (msgpack bytes)."""
    data = serialization.to_bytes(pytree)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic publish


def load_checkpoint(path: str, like: Any) -> Any:
    """Load a pytree saved by :func:`save_checkpoint`.

    `like` is a template pytree with the target structure/shapes/dtypes
    (e.g. freshly initialized params).
    """
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(like, data)


__all__ = ["save_checkpoint", "load_checkpoint"]
