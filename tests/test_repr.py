"""Model summary (`__repr__`) + eps-argument validation.

The one-screen summary is the analog of the reference's `Base.show`
(`/root/reference/src/base_icnf.jl:83-96`); the eps checks cover the
round-3 advisor findings (asarray before shape checks, exact_trace
rejection).
"""

import jax
import jax.numpy as jnp
import pytest

import continuousnf_tpu as cnf
from continuousnf_tpu import Mode


def test_repr_one_screen():
    nn = cnf.MLP((4, 12, 4))
    icnf = cnf.construct(
        cnf.RNODE, nn, 2, 2, tspan=(0.0, 13.0), steer_rate=0.1, lam3=1e-2,
        aug_noise="calibrated", input_bijector="logit",
    )
    r = repr(icnf)
    # One screen: a handful of lines, and every headline fact present.
    assert 4 <= len(r.splitlines()) <= 12
    for frag in (
        "nvars = 2",
        "naugmented = 2",
        "hutchinson[vjp, K=1",
        "Dense(4 -> 12, tanh)",
        "(0.0, 13.0)",
        "steer_rate = 0.1",
        "l3 = 0.01",
        "tsit5",
        "backsolve",
        "MvStdNormal",
        "input_bijector = logit",
    ):
        assert frag in r, f"missing {frag!r} in repr:\n{r}"

    exact = cnf.construct(
        cnf.RNODE, nn, 4, 0, compute_mode=cnf.VecJacMode(exact_trace=True)
    )
    assert "exact (TRAIN" in repr(exact) or "trace:   exact" in repr(exact)


def test_eps_accepts_lists_and_validates():
    nn = cnf.MLP((2, 6, 2))
    icnf = cnf.construct(cnf.FFJORD, nn, 2, 0)
    ps = icnf.init(jax.random.PRNGKey(0))
    xs = jnp.ones((3, 2)) * 0.1
    key = jax.random.PRNGKey(1)

    # Plain nested lists are coerced (advisor: no AttributeError on .ndim).
    eps_list = [[1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]]
    lp, _, _ = cnf.inference(icnf, Mode.TRAIN, xs, ps, key=key, eps=eps_list)
    assert lp.shape == (3,)

    with pytest.raises(ValueError, match="eps must have shape"):
        cnf.inference(
            icnf, Mode.TRAIN, xs, ps, key=key, eps=jnp.ones((2, 5, 2))
        )


def test_eps_rejected_under_exact_trace():
    nn = cnf.MLP((2, 6, 2))
    icnf = cnf.construct(
        cnf.FFJORD, nn, 2, 0, compute_mode=cnf.VecJacMode(exact_trace=True)
    )
    ps = icnf.init(jax.random.PRNGKey(0))
    xs = jnp.ones((3, 2)) * 0.1
    with pytest.raises(ValueError, match="exact_trace"):
        cnf.inference(
            icnf, Mode.TRAIN, xs, ps, key=jax.random.PRNGKey(1),
            eps=jnp.ones((3, 2)),
        )
