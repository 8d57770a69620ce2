"""Pallas TPU kernels for the hot compute paths."""

from .fused_dynamics import fused_tanh_mlp_dynamics, supports_fusion

__all__ = ["fused_tanh_mlp_dynamics", "supports_fusion"]
