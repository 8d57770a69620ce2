"""Driver entry-point coverage: entry() compiles, dryrun_multichip executes."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, ".")


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
