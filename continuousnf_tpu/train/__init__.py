"""Training API: fit/transform model wrappers, data loading, checkpointing."""

from .fit import ICNFModel, CondICNFModel, FitResult, fit, fitted_params, transform
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "ICNFModel",
    "CondICNFModel",
    "FitResult",
    "fit",
    "fitted_params",
    "transform",
    "save_checkpoint",
    "load_checkpoint",
]
