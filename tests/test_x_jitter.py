"""Smoothed-MLE input jitter (`ICNF.x_jitter`)."""
import jax
import jax.numpy as jnp
import numpy as np

from continuousnf_tpu.core.icnf import RNODE, construct, inference, loss
from continuousnf_tpu.nets import MLP
from continuousnf_tpu.types import Mode, VecJacMode


def _pair(x_jitter):
    nn = MLP((4, 8, 4))
    return construct(
        RNODE, nn, 2, 2, tspan=(0.0, 1.0), aug_noise=0.3, x_jitter=x_jitter,
        compute_mode=VecJacMode(exact_trace=True),
    )


def test_x_jitter_changes_train_not_test():
    icnf0, icnfj = _pair(0.0), _pair(0.05)
    ps = icnf0.init(jax.random.PRNGKey(0))
    xs = jax.random.uniform(jax.random.PRNGKey(1), (16, 2))
    key = jax.random.PRNGKey(2)
    l0 = float(loss(icnf0, Mode.TRAIN, xs, ps, key=key))
    lj = float(loss(icnfj, Mode.TRAIN, xs, ps, key=key))
    assert l0 != lj  # jitter perturbs the TRAIN objective
    # TEST inference never jitters: identical log-densities
    lp0, _, _ = inference(icnf0, Mode.TEST, xs, ps)
    lpj, _, _ = inference(icnfj, Mode.TEST, xs, ps)
    np.testing.assert_array_equal(np.asarray(lp0), np.asarray(lpj))


def test_x_jitter_is_deterministic_per_key():
    icnfj = _pair(0.05)
    ps = icnfj.init(jax.random.PRNGKey(0))
    xs = jax.random.uniform(jax.random.PRNGKey(1), (8, 2))
    key = jax.random.PRNGKey(3)
    a = float(loss(icnfj, Mode.TRAIN, xs, ps, key=key))
    b = float(loss(icnfj, Mode.TRAIN, xs, ps, key=key))
    assert a == b
