"""NN module tests: shapes, determinism, planar/cond semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from continuousnf_tpu.nets import Chain, CondLayer, Dense, MLP, PlanarLayer
from continuousnf_tpu.nets.modules import CondWrap


def test_dense_shapes_and_bias():
    layer = Dense(3, 5, jnp.tanh)
    ps = layer.init(jax.random.PRNGKey(0))
    assert ps["w"].shape == (3, 5) and ps["b"].shape == (5,)
    y = layer.apply(ps, jnp.ones((7, 3)))
    assert y.shape == (7, 5)
    assert np.all(np.abs(np.asarray(y)) <= 1.0)  # tanh range
    y1 = layer.apply(ps, jnp.ones((3,)))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y[0]), rtol=1e-6)


def test_mlp_matches_reference_readme_shape():
    # README net: Dense(n_in => 3 n_in, tanh) |> Dense(3 n_in => n_in, tanh)
    nn = MLP((2, 6, 2))
    ps = nn.init(jax.random.PRNGKey(0))
    out = nn.apply(ps, jnp.ones((4, 2)))
    assert out.shape == (4, 2)
    assert len(ps) == 2


def test_init_deterministic():
    nn = MLP((4, 8, 4))
    p1 = nn.init(jax.random.PRNGKey(42))
    p2 = nn.init(jax.random.PRNGKey(42))
    assert jax.tree_util.tree_all(jax.tree.map(lambda a, b: bool(jnp.all(a == b)), p1, p2))


def test_planar_layer_field():
    pl = PlanarLayer(3, jnp.tanh)
    ps = pl.init(jax.random.PRNGKey(1))
    z = jax.random.normal(jax.random.PRNGKey(2), (5, 3))
    out = pl.apply(ps, z)
    assert out.shape == (5, 3)
    # f(z) = u * act(<w,z> + b): check against manual computation
    manual = np.tanh(np.asarray(z) @ np.asarray(ps["w"]) + float(ps["b"][0]))[:, None] * np.asarray(ps["u"])
    np.testing.assert_allclose(np.asarray(out), manual, rtol=1e-6)
    # rank-1 agrees with batch
    np.testing.assert_allclose(np.asarray(pl.apply(ps, z[0])), np.asarray(out[0]), rtol=1e-6)


def test_planar_no_bias_and_cond_widening():
    pl = PlanarLayer(3, jnp.tanh, use_bias=False, n_cond=2)
    ps = pl.init(jax.random.PRNGKey(1))
    assert "b" not in ps
    assert ps["w"].shape == (5,)  # widened by n_cond (reference planar_layer.jl:38-60)
    out = pl.apply(ps, jnp.ones((4, 5)))
    assert out.shape == (4, 3)


def test_cond_wrap_concats_conditioning():
    nn = MLP((5, 6, 3), final_activation=None)
    ps = nn.init(jax.random.PRNGKey(0))
    ys = jnp.asarray([[1.0, 2.0]])
    f = CondWrap(nn, ys)
    z = jnp.ones((4, 3))
    out = f(ps, z)
    direct = nn.apply(ps, jnp.concatenate([z, jnp.broadcast_to(ys, (4, 2))], -1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct), rtol=1e-6)


def test_cond_layer_module_parity():
    nn = MLP((5, 6, 3), final_activation=None)
    cl = CondLayer(nn, n_cond=2)
    ps = cl.init(jax.random.PRNGKey(0))
    ys = jnp.ones((4, 2))
    out = cl.apply_with_cond(ps, jnp.ones((4, 3)), ys)
    assert out.shape == (4, 3)
