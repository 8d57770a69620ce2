"""Utilities: profiling/roofline accounting, debug guards."""

from .profiling import (
    ChipSpec,
    V5E,
    fused_dynamics_cost,
    roofline_report,
    time_chained,
)
from .debug import enable_nan_debugging, assert_finite

__all__ = [
    "ChipSpec",
    "V5E",
    "fused_dynamics_cost",
    "roofline_report",
    "time_chained",
    "enable_nan_debugging",
    "assert_finite",
]
