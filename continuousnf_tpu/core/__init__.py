"""ICNF core engine: augmented dynamics, model construction, inference ops."""

from .dynamics import TestState, TrainState, make_augmented_dynamics
from .icnf import (
    ICNF,
    RNODE,
    FFJORD,
    Planar,
    CondRNODE,
    CondFFJORD,
    CondPlanar,
    Regs,
    CALIBRATED_AUG_SIGMA,
    construct,
    init_params,
    inference,
    generate,
    loss,
    loss_and_metrics,
    adjoint_stats,
)

__all__ = [
    "TestState",
    "TrainState",
    "make_augmented_dynamics",
    "ICNF",
    "RNODE",
    "FFJORD",
    "Planar",
    "CondRNODE",
    "CondFFJORD",
    "CondPlanar",
    "Regs",
    "CALIBRATED_AUG_SIGMA",
    "construct",
    "init_params",
    "inference",
    "generate",
    "loss",
    "loss_and_metrics",
    "adjoint_stats",
]
