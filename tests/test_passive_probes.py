"""Passive-augmentation probe masking and safe-norm regression tests."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

import continuousnf_tpu as cnf
from continuousnf_tpu import Mode
from continuousnf_tpu.core.dynamics import safe_norm


def test_safe_norm_values_and_zero_gradient():
    v = jnp.asarray([[3.0, 4.0], [0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(safe_norm(v)), [5.0, 0.0])
    # gradient at exactly zero must be finite (zero), not NaN
    g = jax.grad(lambda x: jnp.sum(safe_norm(x)))(jnp.zeros((2, 3)))
    assert np.isfinite(np.asarray(g)).all()
    # nonzero gradient matches v/||v||
    g2 = jax.grad(lambda x: jnp.sum(safe_norm(x)))(v[:1])
    np.testing.assert_allclose(np.asarray(g2), [[0.6, 0.8]], rtol=1e-6)


@pytest.mark.slow
def test_passive_adjoint_fast_and_finite():
    # Regression for the ||0|| NaN that made the backward solve creep to
    # max_steps: gradient must be finite and the solve must not exhaust steps.
    nn = cnf.MLP((2, 8, 2))
    icnf = cnf.construct(
        cnf.RNODE, nn, 1, 1, tspan=(0.0, 4.0), steer_rate=0.1, lam3=1e-2,
        aug_passive=True, solver=cnf.SolverOptions(max_steps=500),
    )
    ps = icnf.init(jax.random.PRNGKey(0))
    xs = cnf.data.beta_data(jax.random.PRNGKey(1), 16)
    g = jax.grad(lambda p: cnf.loss(icnf, Mode.TRAIN, xs, p, key=jax.random.PRNGKey(2)))(ps)
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g))


def test_passive_probes_masked():
    # TRAIN inference under aug_passive must behave as if probes live only in
    # the active subspace: explicitly-masked eps gives identical results.
    nn = cnf.MLP((3, 8, 3))
    icnf = cnf.construct(cnf.RNODE, nn, 1, 2, tspan=(0.0, 2.0), aug_passive=True)
    ps = icnf.init(jax.random.PRNGKey(0))
    xs = cnf.data.beta_data(jax.random.PRNGKey(1), 8)
    key = jax.random.PRNGKey(2)
    lp_auto, regs_auto, _ = cnf.inference(icnf, Mode.TRAIN, xs, ps, key=key)

    from continuousnf_tpu.distributions import sample_eps

    eps_key, _ = jax.random.split(key)
    eps = sample_eps(eps_key, (1, 8, icnf.zdim), icnf.compute_mode.eps_dist, icnf.dtype)
    eps = eps.at[..., 1:].set(0.0)
    lp_manual, _, _ = cnf.inference(icnf, Mode.TRAIN, xs, ps, key=key, eps=eps)
    np.testing.assert_array_equal(np.asarray(lp_auto), np.asarray(lp_manual))
