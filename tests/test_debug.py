"""utils.debug quality layer: retrace guard, shape/dtype asserts, NaN/finite
helpers — the SURVEY §5 analog of the reference's Aqua/JET static gates."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import continuousnf_tpu as cnf
from continuousnf_tpu import Mode
from continuousnf_tpu.utils.debug import (
    RetraceError,
    assert_finite,
    check_array,
    jit_with_retrace_guard,
)


def test_retrace_guard_fires_on_shape_churn():
    @jit_with_retrace_guard(max_traces=2, name="poly")
    def f(x):
        return jnp.sum(x * 2.0)

    f(jnp.ones((4,)))
    f(jnp.ones((4,)))  # cache hit — no new trace
    assert f.trace_count() == 1
    f(jnp.ones((8,)))  # second trace: within budget
    assert f.trace_count() == 2
    with pytest.raises(RetraceError, match="traced 3 times"):
        f(jnp.ones((16,)))


def test_retrace_guard_callable_form():
    calls = jit_with_retrace_guard(lambda x: x + 1, max_traces=1)
    np.testing.assert_array_equal(np.asarray(calls(jnp.zeros(2))), np.ones(2))
    with pytest.raises(RetraceError):
        calls(jnp.zeros(3))


def test_check_array_messages():
    with pytest.raises(ValueError, match="rank"):
        check_array("xs", jnp.zeros((2, 2, 2)), rank=(1, 2))
    with pytest.raises(ValueError, match="trailing dim 3"):
        check_array("xs", jnp.zeros((4, 2)), last_dim=3)
    with pytest.raises(ValueError, match="dtype"):
        check_array("xs", jnp.zeros((4, 2), jnp.int32), dtype=jnp.float32)
    with pytest.raises(TypeError, match="array-like"):
        check_array("xs", object())
    check_array("ok", jnp.zeros((4, 2)), rank=(2,), last_dim=2, dtype=jnp.float32)


def test_inference_and_fit_use_checks():
    nn = cnf.MLP((2, 4, 2))
    icnf = cnf.construct(cnf.FFJORD, nn, 2)
    ps = icnf.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="trailing dim 2"):
        cnf.inference(icnf, Mode.TEST, jnp.zeros((4, 3)), ps)
    with pytest.raises(ValueError, match="rank"):
        cnf.inference(icnf, Mode.TEST, jnp.zeros((2, 2, 2)), ps)
    model = cnf.ICNFModel(icnf, n_epochs=1)
    with pytest.raises(ValueError, match="trailing dim 2"):
        cnf.fit(model, np.zeros((8, 3), np.float32), key=jax.random.PRNGKey(1))


def test_assert_finite():
    assert_finite({"a": jnp.ones(3)}, "params")
    with pytest.raises(FloatingPointError, match="params"):
        assert_finite({"a": jnp.array([1.0, np.nan])}, "params")
