"""Recipe machinery tests (fast versions; the full gates run via
tools/run_gates.py and are recorded in REGRESSION.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import continuousnf_tpu as cnf
from continuousnf_tpu import Mode, recipes


def test_passive_augmentation_is_exactly_normalized():
    # Slice density of an aug_passive model is p_x(x) * (2pi)^{-k/2}: the
    # analytically-normalized estimate must integrate to 1 for any params.
    nn = cnf.MLP((3, 8, 3))
    icnf = cnf.construct(cnf.RNODE, nn, 1, 2, tspan=(0.0, 4.0), aug_passive=True)
    ps = icnf.init(jax.random.PRNGKey(0))
    grid = jnp.linspace(-7, 7, 2001)[:, None]
    lp, _, _ = cnf.inference(icnf, Mode.TEST, grid, ps)
    log_z = -0.5 * 2 * np.log(2 * np.pi)
    integral = float(jnp.trapezoid(jnp.exp(lp - log_z), grid[:, 0]))
    np.testing.assert_allclose(integral, 1.0, atol=3e-3)


def test_passive_augmentation_aug_dims_not_transported():
    nn = cnf.MLP((2, 6, 2))
    icnf = cnf.construct(cnf.RNODE, nn, 1, 1, tspan=(0.0, 2.0), aug_passive=True)
    ps = icnf.init(jax.random.PRNGKey(0))
    from continuousnf_tpu.core.dynamics import make_augmented_dynamics, TestState

    f = make_augmented_dynamics(icnf.nn, Mode.TEST, icnf.compute_mode, False, False,
                                passive_aug_dims=1)
    state = TestState(z=jnp.ones((4, 2)), dlogp=jnp.zeros((4,)))
    dz = f(0.0, state, {"ps": ps, "ys": None}).z
    np.testing.assert_array_equal(np.asarray(dz[:, 1]), 0.0)
    assert float(jnp.max(jnp.abs(dz[:, 0]))) > 0


def test_passive_augmentation_trains():
    nn = cnf.MLP((2, 6, 2))
    icnf = cnf.construct(cnf.RNODE, nn, 1, 1, tspan=(0.0, 4.0), aug_passive=True,
                         solver=cnf.SolverOptions(rtol=1e-3, atol=1e-5))
    model = cnf.ICNFModel(icnf, n_epochs=2, batch_size=32)
    r = cnf.data.beta_data(jax.random.PRNGKey(0), 64)
    res = cnf.fit(model, r, key=jax.random.PRNGKey(1))
    assert np.isfinite(res.losses).all()


def test_slice_norm_1d_monitor():
    nn = cnf.MLP((2, 6, 2))
    icnf = cnf.construct(cnf.RNODE, nn, 1, 1, tspan=(0.0, 2.0), aug_passive=True)
    ps = icnf.init(jax.random.PRNGKey(0))
    z = recipes.slice_norm_1d(icnf, ps, lo=-6, hi=6, npts=501)
    # passive aug: slice integral == (2pi)^{-1/2} exactly
    np.testing.assert_allclose(z, 1.0 / np.sqrt(2 * np.pi), rtol=5e-3)


def test_density_report_passes():
    rep = recipes.DensityReport(mad=0.05, msd=0.01, tv=0.02, epochs=1, wall_time_s=0.0)
    assert rep.passes()
    assert not recipes.DensityReport(0.2, 0.01, 0.02, 1, 0.0).passes()


def test_toy2d_smoke():
    res, ll = recipes.toy2d(jax.random.PRNGKey(0), "moons", n=256, n_epochs=2,
                            batch_size=128)
    assert np.isfinite(ll)
