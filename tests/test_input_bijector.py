"""Logit input bijector: change-of-variables correctness."""
import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np

from continuousnf_tpu.core.icnf import RNODE, construct, generate, inference
from continuousnf_tpu.nets import MLP
from continuousnf_tpu.types import Mode, VecJacMode


def test_logit_density_matches_manual_change_of_variables():
    nn = MLP((3, 9, 3))
    icnf = construct(RNODE, nn, 3, 0, tspan=(0.0, 1.0), input_bijector="logit")
    ps = icnf.init(jax.random.PRNGKey(0))
    xs = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=0.05, maxval=0.95)

    lp, _, _ = inference(icnf, Mode.TEST, xs, ps)

    icnf_raw = dc.replace(icnf, input_bijector=None)
    t = jnp.log(xs) - jnp.log1p(-xs)
    lp_t, _, _ = inference(icnf_raw, Mode.TEST, t, ps)
    ldj = -jnp.sum(jnp.log(xs) + jnp.log1p(-xs), axis=-1)
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_t + ldj), rtol=1e-5, atol=1e-5)


def test_logit_generate_in_unit_box_and_train_loss_finite():
    nn = MLP((4, 8, 4))
    icnf = construct(
        RNODE, nn, 2, 2, tspan=(0.0, 1.0), input_bijector="logit",
        aug_noise=0.3, compute_mode=VecJacMode(exact_trace=True),
    )
    ps = icnf.init(jax.random.PRNGKey(2))
    xs = generate(icnf, Mode.TEST, ps, 64, key=jax.random.PRNGKey(3))
    x = np.asarray(xs)
    assert x.shape == (64, 2) and (x > 0).all() and (x < 1).all()

    from continuousnf_tpu.core.icnf import loss

    data = jax.random.uniform(jax.random.PRNGKey(4), (32, 2), minval=0.05, maxval=0.95)
    l = float(loss(icnf, Mode.TRAIN, data, ps, key=jax.random.PRNGKey(5)))
    assert np.isfinite(l)
