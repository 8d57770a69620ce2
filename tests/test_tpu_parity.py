"""On-device parity of the Pallas megakernels vs the XLA path (VERDICT r1
item 8: kernel numerics must be test-asserted on the real chip, not
bench-only).

Run with:  CNF_TPU_TESTS=1 python -m pytest tests/test_tpu_parity.py -m tpu -q -n 0
(-n 0 disables the default 2-worker xdist: two processes must not share the chip)
Skipped automatically when the TPU backend is absent (CI/CPU runs).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import continuousnf_tpu as cnf
from continuousnf_tpu import Mode

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.default_backend() not in ("tpu", "axon"),
        reason="real TPU backend required (set CNF_TPU_TESTS=1 under axon)",
    ),
]

# Tight tolerances so solver error does not mask kernel error; random-init
# params over tspan (0, 13) produce |logp| ~ O(100), hence relative gates.
_SOLVER = cnf.SolverOptions(rtol=1e-5, atol=1e-8)


def _models():
    nvars, naug = 8, 8
    nn = cnf.MLP((16, 48, 16))
    mk = lambda fused: cnf.construct(
        cnf.RNODE, nn, nvars, naug, tspan=(0.0, 13.0), lam3=1e-2,
        compute_mode=cnf.VecJacMode(fused=fused), solver=_SOLVER,
    )
    fused, plain = mk(True), mk(False)
    ps = fused.init(jax.random.PRNGKey(0))
    xs = jax.random.uniform(jax.random.PRNGKey(1), (256, nvars))
    return fused, plain, ps, xs


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.max(np.abs(a - b)) / max(np.mean(np.abs(b)), 1e-12)


def test_forward_parity_train_and_test():
    fused, plain, ps, xs = _models()
    eps = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 16))
    key = jax.random.PRNGKey(3)

    lp_f, regs_f, st_f = cnf.inference(fused, Mode.TRAIN, xs, ps, key=key, eps=eps)
    lp_p, regs_p, st_p = cnf.inference(plain, Mode.TRAIN, xs, ps, key=key, eps=eps)
    assert _rel(lp_f, lp_p) < 2e-3, _rel(lp_f, lp_p)
    assert _rel(regs_f.e, regs_p.e) < 2e-3
    assert abs(int(st_f.steps) - int(st_p.steps)) <= max(5, int(st_p.steps) // 20)

    t_f, _, _ = cnf.inference(fused, Mode.TEST, xs, ps)
    t_p, _, _ = cnf.inference(plain, Mode.TEST, xs, ps)
    assert _rel(t_f, t_p) < 2e-3, _rel(t_f, t_p)


def test_adjoint_parity_gradients():
    """Gradients through the fused forward + adjoint kernel must match the
    XLA backsolve path (same probes, same steer key)."""
    fused, plain, ps, xs = _models()
    eps = jax.random.normal(jax.random.PRNGKey(2), (1, 256, 16))
    key = jax.random.PRNGKey(3)

    def lossfn(icnf):
        return lambda p: cnf.loss(icnf, Mode.TRAIN, xs, p, key=key, eps=eps)

    g_f = jax.grad(lossfn(fused))(ps)
    g_p = jax.grad(lossfn(plain))(ps)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_p)):
        assert _rel(a, b) < 5e-2, _rel(a, b)


def test_generate_parity():
    fused, plain, ps, _ = _models()
    key = jax.random.PRNGKey(7)
    s_f = cnf.generate(fused, Mode.TEST, ps, 64, key=key)
    s_p = cnf.generate(plain, Mode.TEST, ps, 64, key=key)
    assert _rel(s_f, s_p) < 2e-3
    # B=1 (vector-mode parity) through the fused path.
    one = cnf.generate(fused, Mode.TEST, ps, key=key)
    assert one.shape == (8,)


def test_exact_trace_parity_on_chip():
    """Round-4: the exact-divergence TRAIN path (the density-gate recipe)
    through the fused forward + adjoint megakernels vs the XLA path, on the
    real chip."""
    nvars, naug = 8, 8
    nn = cnf.MLP((16, 48, 16))
    mk = lambda fused: cnf.construct(
        cnf.RNODE, nn, nvars, naug, tspan=(0.0, 13.0), lam3=1e-2,
        compute_mode=cnf.VecJacMode(fused=fused, exact_trace=True),
        solver=_SOLVER,
    )
    fused, plain = mk(True), mk(False)
    ps = fused.init(jax.random.PRNGKey(0))
    xs = jax.random.uniform(jax.random.PRNGKey(1), (256, nvars))
    key = jax.random.PRNGKey(3)

    lp_f, regs_f, st_f = cnf.inference(fused, Mode.TRAIN, xs, ps, key=key)
    lp_p, regs_p, st_p = cnf.inference(plain, Mode.TRAIN, xs, ps, key=key)
    assert _rel(lp_f, lp_p) < 2e-3, _rel(lp_f, lp_p)
    assert _rel(regs_f.n, regs_p.n) < 2e-3, _rel(regs_f.n, regs_p.n)
    assert abs(int(st_f.steps) - int(st_p.steps)) <= max(5, int(st_p.steps) // 20)

    g_f = jax.grad(lambda p: cnf.loss(fused, Mode.TRAIN, xs, p, key=key))(ps)
    g_p = jax.grad(lambda p: cnf.loss(plain, Mode.TRAIN, xs, p, key=key))(ps)
    for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_p)):
        assert _rel(a, b) < 5e-2, _rel(a, b)
