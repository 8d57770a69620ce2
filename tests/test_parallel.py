"""Multi-device correctness on the faked 8-chip CPU mesh.

The key invariant (SURVEY §5): sharded execution must be numerically
equivalent to single-device execution — batch sharding + probe sharding with
psum reductions are implementation details of the same math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import continuousnf_tpu as cnf
from continuousnf_tpu import Mode
from continuousnf_tpu.parallel import (
    MeshConfig,
    make_mesh,
    make_sharded_train_step,
    shard_params,
)
from continuousnf_tpu.parallel.sharding import make_sharded_logprob

FAST = cnf.SolverOptions(rtol=1e-3, atol=1e-5)


def _setup(num_probes=1):
    nvars, naug = 2, 2
    n_in = nvars + naug
    nn = cnf.MLP((n_in, 2 * n_in, n_in))
    icnf = cnf.construct(
        cnf.RNODE, nn, nvars, naug, solver=FAST,
        compute_mode=cnf.VecJacMode(num_probes=num_probes),
    )
    ps = icnf.init(jax.random.PRNGKey(0))
    xs = jax.random.uniform(jax.random.PRNGKey(1), (16, nvars))
    return icnf, ps, xs


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_logprob_matches_single_device():
    icnf, ps, xs = _setup()
    mesh = make_mesh(MeshConfig(data=8))
    f = make_sharded_logprob(icnf, mesh)
    lp_sharded = f(shard_params(mesh, ps), jax.device_put(xs, cnf.parallel.data_sharding(mesh)))
    lp_single, _, _ = cnf.inference(icnf, Mode.TEST, xs, ps)
    np.testing.assert_allclose(np.asarray(lp_sharded), np.asarray(lp_single), rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("config", [MeshConfig(data=8), MeshConfig(data=4, probe=2)],
                         ids=["data8", "data4xprobe2"])
def test_sharded_train_step_matches_single_device(config):
    icnf, ps, xs = _setup(num_probes=2)
    opt = optax.lion(1e-3)
    mesh = make_mesh(config)

    step = make_sharded_train_step(icnf, opt, mesh)
    ps_sh = shard_params(mesh, ps)
    opt_state_sh = opt.init(ps_sh)
    key = jax.random.PRNGKey(5)
    ps1, _, l1 = step(ps_sh, opt_state_sh, xs, key)

    # Single-device replica of the same math (same key => same eps draw).
    def single(ps, opt_state, xs, key):
        from continuousnf_tpu.distributions import sample_eps
        eps_key, loss_key = jax.random.split(key)
        eps = sample_eps(eps_key, (icnf.compute_mode.num_probes, xs.shape[0], icnf.zdim),
                         icnf.compute_mode.eps_dist, icnf.dtype)
        l, g = jax.value_and_grad(
            lambda p: cnf.loss(icnf, Mode.TRAIN, xs, p, key=loss_key, eps=eps)
        )(ps)
        updates, opt_state = opt.update(g, opt_state, ps)
        return optax.apply_updates(ps, updates), opt_state, l

    ps2, _, l2 = jax.jit(single)(ps, opt.init(ps), xs, key)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(ps1), jax.tree_util.tree_leaves(ps2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_fit_with_mesh_runs():
    icnf, ps, _ = _setup()
    mesh = make_mesh(MeshConfig(data=8))
    model = cnf.ICNFModel(icnf, n_epochs=2, batch_size=16)
    X = jax.random.uniform(jax.random.PRNGKey(0), (32, 2))
    res = cnf.fit(model, X, key=jax.random.PRNGKey(1), mesh=mesh)
    assert np.isfinite(res.losses).all()


@pytest.mark.slow
def test_fit_with_mesh_matches_unsharded_fit():
    """`fit(mesh=...)` runs the SAME step body (probe+data sharding, psum
    reductions) as the unsharded fit — a 4x2 mesh fit must reproduce the
    1-device fit to float tolerance (VERDICT r1 item 3)."""
    icnf, _, _ = _setup(num_probes=2)
    mesh = make_mesh(MeshConfig(data=4, probe=2))
    model = cnf.ICNFModel(icnf, n_epochs=3, batch_size=16)
    X = jax.random.uniform(jax.random.PRNGKey(0), (48, 2))
    res_m = cnf.fit(model, X, key=jax.random.PRNGKey(1), mesh=mesh)
    res_1 = cnf.fit(model, X, key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(res_m.losses, res_1.losses, rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(res_m.ps), jax.tree_util.tree_leaves(res_1.ps)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)


def test_fit_metrics_observability():
    """FitResult.metrics carries per-epoch loss/E/n/NFE/samples_per_s."""
    icnf, _, _ = _setup()
    model = cnf.ICNFModel(icnf, n_epochs=2, batch_size=16)
    X = jax.random.uniform(jax.random.PRNGKey(0), (32, 2))
    res = cnf.fit(model, X, key=jax.random.PRNGKey(1))
    assert set(res.metrics) == {"loss", "e", "n", "nfe", "samples_per_s"}
    for k, v in res.metrics.items():
        assert v.shape == (2,), (k, v.shape)
        assert np.isfinite(v).all(), k
    assert (res.metrics["nfe"] > 0).all()
    assert (res.metrics["samples_per_s"] > 0).all()
    np.testing.assert_array_equal(res.metrics["loss"], res.losses)
