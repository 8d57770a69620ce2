"""Distribution adapter tests (analog of the reference dist_ext behavior)."""

import jax
import jax.numpy as jnp
import numpy as np

import continuousnf_tpu as cnf
from continuousnf_tpu import Mode


def _fixture(cond=False):
    nvars, naug = 2, 0
    n_cond = 2 if cond else 0
    nn = cnf.MLP((nvars + n_cond, 6, nvars))
    variant = cnf.CondFFJORD if cond else cnf.FFJORD
    icnf = cnf.construct(variant, nn, nvars)
    ps = icnf.init(jax.random.PRNGKey(0))
    return icnf, ps


def test_icnf_dist_matches_inference():
    icnf, ps = _fixture()
    d = cnf.ICNFDist(icnf, Mode.TEST, ps)
    xs = jax.random.normal(jax.random.PRNGKey(1), (6, 2))
    lp_dist = d.logpdf(xs)
    lp_inf, _, _ = cnf.inference(icnf, Mode.TEST, xs, ps)
    np.testing.assert_array_equal(np.asarray(lp_dist), np.asarray(lp_inf))
    np.testing.assert_allclose(np.asarray(d.pdf(xs)), np.exp(np.asarray(lp_inf)), rtol=1e-6)
    assert len(d) == 2


def test_icnf_dist_sampling_shapes():
    icnf, ps = _fixture()
    d = cnf.ICNFDist(icnf, Mode.TEST, ps)
    key = jax.random.PRNGKey(2)
    assert d.sample(key, 16).shape == (16, 2)
    assert d.sample(key).shape == (2,)  # single draw (VectorMode parity)
    assert d.rand(key, 4).shape == (4, 2)


def test_scalar_logpdf_vector_input():
    icnf, ps = _fixture()
    d = cnf.ICNFDist(icnf, Mode.TEST, ps)
    x1 = jnp.asarray([0.1, -0.2])
    assert d.logpdf(x1).shape == ()


def test_cond_dist_slices_ys_to_batch():
    icnf, ps = _fixture(cond=True)
    ys = jax.random.normal(jax.random.PRNGKey(3), (10, 2))
    d = cnf.CondICNFDist(icnf, Mode.TEST, ps, ys)
    xs = jax.random.normal(jax.random.PRNGKey(4), (4, 2))
    lp = d.logpdf(xs)  # must slice ys[:4] (reference core_cond_icnf.jl:31)
    lp_direct, _, _ = cnf.inference(icnf, Mode.TEST, xs, ps, ys=ys[:4])
    np.testing.assert_array_equal(np.asarray(lp), np.asarray(lp_direct))
    s = d.sample(jax.random.PRNGKey(5), 4)
    assert s.shape == (4, 2)


def test_sampled_density_consistency():
    # Samples from the model scored by the model should have reasonable
    # log-density (sanity: generate and inference use mutually inverse flows).
    icnf, ps = _fixture()
    d = cnf.ICNFDist(icnf, Mode.TEST, ps)
    s = d.sample(jax.random.PRNGKey(6), 256)
    lp = d.logpdf(s)
    assert np.isfinite(np.asarray(lp)).all()
    # For a smooth random 2D flow, mean logp of its own samples is around the
    # negentropy of a mildly-warped Gaussian — far from pathological values.
    assert -6.0 < float(lp.mean()) < 0.0
