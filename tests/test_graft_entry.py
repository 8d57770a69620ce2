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


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_self_heals_without_cpu_env():
    """Fresh process with no JAX_PLATFORMS/XLA_FLAGS help: dryrun must fall
    back onto a forced-count CPU mesh by itself (the axon TPU plugin
    otherwise wins platform selection and exposes a single device)."""
    import os
    import subprocess

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # JAX_PLATFORMS stays whatever the host sets (axon on the TPU host, cpu
    # under the test conftest) — the fallback must work either way.
    env.pop("JAX_PLATFORMS", None)
    out = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=repo,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "OK" in out.stdout
