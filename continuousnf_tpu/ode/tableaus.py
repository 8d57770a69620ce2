"""Butcher tableaus for explicit Runge–Kutta methods.

Coefficients are the standard published values (Tsitouras 2011 for Tsit5,
Dormand–Prince 1980 for Dopri5, Bogacki–Shampine 1989 for Bosh3).  Tsit5 is
the default, matching what Julia's `DefaultODEAlgorithm` selects for the
non-stiff CNF dynamics the reference solves
(`/root/reference/src/base_icnf.jl:137-143`).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ButcherTableau:
    """Explicit RK tableau.

    a:       strictly-lower-triangular stage coefficients, row i has i entries.
    b:       solution weights (order `order`).
    btilde:  b - bhat, weights of the embedded error estimate (None -> no
             error estimate; fixed-step only).
    c:       stage times.
    order:   order of the propagating solution (used by the step controller).
    fsal:    first-same-as-last (stage s of an accepted step is f at the new
             point, reusable as stage 1 of the next step).
    """

    name: str
    a: Tuple[Tuple[float, ...], ...]
    b: Tuple[float, ...]
    btilde: Optional[Tuple[float, ...]]
    c: Tuple[float, ...]
    order: int
    fsal: bool

    @property
    def num_stages(self) -> int:
        return len(self.b)


EULER = ButcherTableau(
    name="euler",
    a=((),),
    b=(1.0,),
    btilde=None,
    c=(0.0,),
    order=1,
    fsal=False,
)

MIDPOINT = ButcherTableau(
    name="midpoint",
    a=((), (0.5,)),
    b=(0.0, 1.0),
    btilde=None,
    c=(0.0, 0.5),
    order=2,
    fsal=False,
)

RK4 = ButcherTableau(
    name="rk4",
    a=((), (0.5,), (0.0, 0.5), (0.0, 0.0, 1.0)),
    b=(1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0),
    btilde=None,
    c=(0.0, 0.5, 0.5, 1.0),
    order=4,
    fsal=False,
)

BOSH3 = ButcherTableau(
    name="bosh3",
    a=(
        (),
        (1.0 / 2.0,),
        (0.0, 3.0 / 4.0),
        (2.0 / 9.0, 1.0 / 3.0, 4.0 / 9.0),
    ),
    b=(2.0 / 9.0, 1.0 / 3.0, 4.0 / 9.0, 0.0),
    btilde=(
        2.0 / 9.0 - 7.0 / 24.0,
        1.0 / 3.0 - 1.0 / 4.0,
        4.0 / 9.0 - 1.0 / 3.0,
        -1.0 / 8.0,
    ),
    c=(0.0, 0.5, 0.75, 1.0),
    order=3,
    fsal=True,
)

DOPRI5 = ButcherTableau(
    name="dopri5",
    a=(
        (),
        (1.0 / 5.0,),
        (3.0 / 40.0, 9.0 / 40.0),
        (44.0 / 45.0, -56.0 / 15.0, 32.0 / 9.0),
        (19372.0 / 6561.0, -25360.0 / 2187.0, 64448.0 / 6561.0, -212.0 / 729.0),
        (9017.0 / 3168.0, -355.0 / 33.0, 46732.0 / 5247.0, 49.0 / 176.0, -5103.0 / 18656.0),
        (35.0 / 384.0, 0.0, 500.0 / 1113.0, 125.0 / 192.0, -2187.0 / 6784.0, 11.0 / 84.0),
    ),
    b=(35.0 / 384.0, 0.0, 500.0 / 1113.0, 125.0 / 192.0, -2187.0 / 6784.0, 11.0 / 84.0, 0.0),
    btilde=(
        71.0 / 57600.0,
        0.0,
        -71.0 / 16695.0,
        71.0 / 1920.0,
        -17253.0 / 339200.0,
        22.0 / 525.0,
        -1.0 / 40.0,
    ),
    c=(0.0, 1.0 / 5.0, 3.0 / 10.0, 4.0 / 5.0, 8.0 / 9.0, 1.0, 1.0),
    order=5,
    fsal=True,
)

TSIT5 = ButcherTableau(
    name="tsit5",
    a=(
        (),
        (0.161,),
        (-0.008480655492356989, 0.335480655492357),
        (2.8971530571054935, -6.359448489975075, 4.3622954328695815),
        (5.325864828439257, -11.748883564062828, 7.4955393428898365, -0.09249506636175525),
        (
            5.86145544294642,
            -12.92096931784711,
            8.159367898576159,
            -0.071584973281401,
            -0.028269050394068383,
        ),
        (
            0.09646076681806523,
            0.01,
            0.4798896504144996,
            1.379008574103742,
            -3.290069515436081,
            2.324710524099774,
        ),
    ),
    b=(
        0.09646076681806523,
        0.01,
        0.4798896504144996,
        1.379008574103742,
        -3.290069515436081,
        2.324710524099774,
        0.0,
    ),
    btilde=(
        -0.00178001105222577714,
        -0.0008164344596567469,
        0.007880878010261995,
        -0.1447110071732629,
        0.5823571654525552,
        -0.45808210592918697,
        0.015151515151515152,
    ),
    c=(0.0, 0.161, 0.327, 0.9, 0.9800255409045097, 1.0, 1.0),
    order=5,
    fsal=True,
)


TABLEAUS = {
    "euler": EULER,
    "midpoint": MIDPOINT,
    "rk4": RK4,
    "bosh3": BOSH3,
    "dopri5": DOPRI5,
    "tsit5": TSIT5,
}

__all__ = ["ButcherTableau", "TABLEAUS", "EULER", "MIDPOINT", "RK4", "BOSH3", "DOPRI5", "TSIT5"]
