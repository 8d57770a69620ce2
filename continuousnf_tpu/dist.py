"""Distribution adapter: use a (fitted) ICNF as a probability distribution.

Analog of the reference's Distributions.jl extension
(`/root/reference/src/exts/dist_ext/`): `ICNFDist` / `CondICNFDist` expose
`logpdf` / `pdf` / `sample` over the model, which is how the README evaluates
densities (`pdf(ICNFDist(icnf, TestMode(), ps, st), r)`,
`/root/reference/README.md:96-101`).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from .core.icnf import ICNF, generate, inference
from .types import Mode


@dataclasses.dataclass(frozen=True)
class ICNFDist:
    """Unconditional ICNF distribution (reference
    `/root/reference/src/exts/dist_ext/core_icnf.jl:1-58`).

    In TEST mode (the default for evaluation) no PRNG key is needed; TRAIN
    mode uses stochastic trace estimates, pass `key` for determinism.
    """

    icnf: ICNF
    mode: Mode
    ps: Any

    @classmethod
    def from_fit(cls, result, mode: Mode = Mode.TEST) -> "ICNFDist":
        """Build from a `FitResult` — parity with the reference's
        `ICNFDist(mach, TestMode())` constructor from a fitted MLJ machine
        (`/root/reference/src/exts/dist_ext/core_icnf.jl:8-11`)."""
        return cls(icnf=result.icnf, mode=mode, ps=result.ps)

    def __len__(self) -> int:
        return self.icnf.nvars

    def logpdf(self, x: jax.Array, *, key: Optional[jax.Array] = None) -> jax.Array:
        """log-density of `x` ((B, nvars) -> (B,), or (nvars,) -> scalar)."""
        logpx, _, _ = inference(self.icnf, self.mode, x, self.ps, key=key)
        return logpx

    def pdf(self, x: jax.Array, *, key: Optional[jax.Array] = None) -> jax.Array:
        return jnp.exp(self.logpdf(x, key=key))

    def sample(self, key: jax.Array, n: Optional[int] = None) -> jax.Array:
        """Draw `n` samples ((n, nvars); `n=None` -> single (nvars,) sample)."""
        return generate(self.icnf, self.mode, self.ps, n, key=key)

    # Distributions.jl-style alias
    rand = sample


@dataclasses.dataclass(frozen=True)
class CondICNFDist:
    """Conditional ICNF distribution with fixed conditioning `ys`
    (reference `/root/reference/src/exts/dist_ext/core_cond_icnf.jl:1-61`)."""

    icnf: ICNF
    mode: Mode
    ps: Any
    ys: jax.Array  # (n_cond,) or (B, n_cond)

    def __len__(self) -> int:
        return self.icnf.nvars

    def _ys_for(self, batch: Optional[int]) -> jax.Array:
        ys = jnp.asarray(self.ys)
        if ys.ndim == 1 or batch is None:
            return ys
        # Matrix-mode parity: slice stored conditioning to the query batch
        # (reference `ys[:, 1:size(A, 2)]`, dist_ext/core_cond_icnf.jl:31).
        return ys[:batch]

    def logpdf(self, x: jax.Array, *, key: Optional[jax.Array] = None) -> jax.Array:
        batch = x.shape[0] if x.ndim == 2 else None
        logpx, _, _ = inference(
            self.icnf, self.mode, x, self.ps, ys=self._ys_for(batch), key=key
        )
        return logpx

    def pdf(self, x: jax.Array, *, key: Optional[jax.Array] = None) -> jax.Array:
        return jnp.exp(self.logpdf(x, key=key))

    def sample(self, key: jax.Array, n: Optional[int] = None) -> jax.Array:
        return generate(self.icnf, self.mode, self.ps, n, ys=self._ys_for(n), key=key)

    rand = sample


__all__ = ["ICNFDist", "CondICNFDist"]
