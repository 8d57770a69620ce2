"""Parity tests: solve-in-kernel Pallas megakernel vs the XLA while-loop path.

The megakernel (`ops/fused_solve.py`) must reproduce the plain solver's
numerics: same controller decisions (steps/accepted), same final state up to
matmul-reassociation noise, and consistent gradients through the backsolve
adjoint.  Runs in Pallas interpreter mode on CPU (conftest pins
JAX_PLATFORMS=cpu with an 8-device mesh)."""

import jax
import jax.numpy as jnp
import pytest

import continuousnf_tpu as cnf
from continuousnf_tpu import Mode
from continuousnf_tpu.ops.fused_solve import make_full_solve


def _make(fused: bool, *, lam3=0.0, naug=2, steer=0.0):
    nvars = 3
    n_in = nvars + naug
    nn = cnf.MLP((n_in, 3 * n_in, n_in))
    return cnf.construct(
        cnf.RNODE,
        nn,
        nvars,
        naug,
        steer_rate=steer,
        lam3=lam3,
        compute_mode=cnf.VecJacMode(fused=fused),
    )


@pytest.fixture(scope="module")
def setup():
    icnf_ref = _make(False)
    icnf_fused = _make(True)
    ps = icnf_ref.init(jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (16, 3), jnp.float32)
    eps = jax.random.normal(jax.random.PRNGKey(2), (1, 16, icnf_ref.zdim), jnp.float32)
    return icnf_ref, icnf_fused, ps, xs, eps


def test_eligibility(setup):
    icnf_ref, icnf_fused, *_ = setup
    assert make_full_solve(icnf_ref, Mode.TRAIN, 16) is None  # fused flag off
    assert make_full_solve(icnf_fused, Mode.TRAIN, 16) is not None
    assert make_full_solve(icnf_fused, Mode.TEST, 16) is not None
    # K>1 probes: both TRAIN (K-probe kernel) and TEST apply; JVP (JacVec)
    # probes run in-kernel too since round 5 (pushforward chain).
    icnf_k2 = _make(True)
    icnf_k2 = cnf.construct(
        cnf.RNODE, icnf_k2.nn, 3, 2, compute_mode=cnf.VecJacMode(num_probes=2, fused=True)
    )
    assert make_full_solve(icnf_k2, Mode.TRAIN, 16) is not None
    assert make_full_solve(icnf_k2, Mode.TEST, 16) is not None
    icnf_jvp = cnf.construct(
        cnf.RNODE, icnf_k2.nn, 3, 2, compute_mode=cnf.JacVecMode(fused=True)
    )
    fs = make_full_solve(icnf_jvp, Mode.TRAIN, 16)
    assert fs is not None and fs.adjoint is not None


def test_train_forward_parity(setup):
    icnf_ref, icnf_fused, ps, xs, eps = setup
    key = jax.random.PRNGKey(3)
    lp_ref, regs_ref, st_ref = cnf.inference(icnf_ref, Mode.TRAIN, xs, ps, key=key, eps=eps)
    lp_f, regs_f, st_f = cnf.inference(icnf_fused, Mode.TRAIN, xs, ps, key=key, eps=eps)
    assert int(st_f.steps) == int(st_ref.steps)
    assert int(st_f.accepted) == int(st_ref.accepted)
    assert int(st_f.nfe) == int(st_ref.nfe)
    assert jnp.allclose(lp_f, lp_ref, rtol=1e-4, atol=1e-4)
    assert jnp.allclose(regs_f.e, regs_ref.e, rtol=1e-4, atol=1e-4)
    assert jnp.allclose(regs_f.n, regs_ref.n, rtol=1e-4, atol=1e-4)


def test_test_forward_parity(setup):
    icnf_ref, icnf_fused, ps, xs, _ = setup
    lp_ref, _, st_ref = cnf.inference(icnf_ref, Mode.TEST, xs, ps)
    lp_f, _, st_f = cnf.inference(icnf_fused, Mode.TEST, xs, ps)
    assert int(st_f.steps) == int(st_ref.steps)
    assert jnp.allclose(lp_f, lp_ref, rtol=1e-4, atol=1e-4)


def test_adjoint_kernel_active(setup):
    """The fused config must route gradients through the adjoint megakernel."""
    _, icnf_fused, *_ = setup
    fs = make_full_solve(icnf_fused, Mode.TRAIN, 16)
    assert fs.adjoint is not None
    assert make_full_solve(icnf_fused, Mode.TEST, 16).adjoint is not None


@pytest.mark.slow
def test_grad_parity(setup):
    icnf_ref, icnf_fused, ps, xs, eps = setup
    key = jax.random.PRNGKey(4)

    def loss_of(icnf):
        return lambda p: cnf.loss(icnf, Mode.TRAIN, xs, p, key=key, eps=eps)

    g_ref = jax.grad(loss_of(icnf_ref))(ps)
    g_f = jax.grad(loss_of(icnf_fused))(ps)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_f)):
        assert jnp.allclose(a, b, rtol=2e-3, atol=2e-4), (a - b)


@pytest.mark.slow
def test_grad_parity_test_mode(setup):
    """TEST-mode (exact-trace) gradients through the adjoint megakernel."""
    icnf_ref, icnf_fused, ps, xs, _ = setup

    def loss_of(icnf):
        return lambda p: cnf.loss(icnf, Mode.TEST, xs, p)

    g_ref = jax.grad(loss_of(icnf_ref))(ps)
    g_f = jax.grad(loss_of(icnf_fused))(ps)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_f)):
        assert jnp.allclose(a, b, rtol=2e-3, atol=2e-4), (a - b)


@pytest.mark.slow
def test_grad_wrt_x_parity(setup):
    """Gradients w.r.t. the data (reference call_tests check these exist)."""
    icnf_ref, icnf_fused, ps, xs, eps = setup
    key = jax.random.PRNGKey(8)

    def loss_x(icnf):
        return lambda x: cnf.loss(icnf, Mode.TRAIN, x, ps, key=key, eps=eps)

    gx_ref = jax.grad(loss_x(icnf_ref))(xs)
    gx_f = jax.grad(loss_x(icnf_fused))(xs)
    assert jnp.allclose(gx_ref, gx_f, rtol=2e-3, atol=2e-4)


def test_generate_parity(setup):
    icnf_ref, icnf_fused, ps, *_ = setup
    key = jax.random.PRNGKey(5)
    s_ref = cnf.generate(icnf_ref, Mode.TEST, ps, 8, key=key)
    s_f = cnf.generate(icnf_fused, Mode.TEST, ps, 8, key=key)
    assert jnp.allclose(s_f, s_ref, rtol=1e-4, atol=1e-4)


def test_lam3_steer_path(setup):
    """Steering + lambda3 (regression-config flags) work through the kernel."""
    icnf_ref = _make(False, lam3=1e-2, steer=0.1)
    icnf_fused = _make(True, lam3=1e-2, steer=0.1)
    ps = icnf_ref.init(jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (8, 3), jnp.float32)
    eps = jax.random.normal(jax.random.PRNGKey(2), (1, 8, icnf_ref.zdim), jnp.float32)
    key = jax.random.PRNGKey(6)
    lp_ref, regs_ref, _ = cnf.inference(icnf_ref, Mode.TRAIN, xs, ps, key=key, eps=eps)
    lp_f, regs_f, _ = cnf.inference(icnf_fused, Mode.TRAIN, xs, ps, key=key, eps=eps)
    assert jnp.allclose(lp_f, lp_ref, rtol=1e-4, atol=1e-4)
    assert jnp.allclose(regs_f.a, regs_ref.a, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_k_probe_parity(setup):
    """K=3 Hutchinson probes through the megakernel match the XLA path:
    same controller decisions, same logp/regularizers, consistent grads."""
    icnf_ref0, _, ps, xs, _ = setup
    mk = lambda fused: cnf.construct(
        cnf.RNODE, icnf_ref0.nn, 3, 2,
        compute_mode=cnf.VecJacMode(num_probes=3, fused=fused),
    )
    icnf_ref, icnf_fused = mk(False), mk(True)
    assert make_full_solve(icnf_fused, Mode.TRAIN, 16) is not None
    eps = jax.random.normal(jax.random.PRNGKey(11), (3, 16, icnf_ref.zdim), jnp.float32)
    key = jax.random.PRNGKey(12)
    lp_ref, regs_ref, st_ref = cnf.inference(icnf_ref, Mode.TRAIN, xs, ps, key=key, eps=eps)
    lp_f, regs_f, st_f = cnf.inference(icnf_fused, Mode.TRAIN, xs, ps, key=key, eps=eps)
    # K>1 sums more reassociated terms into the error norm, so a borderline
    # controller decision may flip; values must still agree tightly.
    assert abs(int(st_f.steps) - int(st_ref.steps)) <= 1
    assert jnp.allclose(lp_f, lp_ref, rtol=1e-4, atol=1e-4)
    assert jnp.allclose(regs_f.e, regs_ref.e, rtol=1e-4, atol=1e-4)
    assert jnp.allclose(regs_f.n, regs_ref.n, rtol=1e-4, atol=1e-4)

    g_ref = jax.grad(lambda p: cnf.loss(icnf_ref, Mode.TRAIN, xs, p, key=key, eps=eps))(ps)
    g_f = jax.grad(lambda p: cnf.loss(icnf_fused, Mode.TRAIN, xs, p, key=key, eps=eps))(ps)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_f)):
        assert jnp.allclose(a, b, rtol=2e-3, atol=2e-4), (a - b)


def test_k_probe_variance_reduction(setup):
    """More probes -> lower variance of the trace estimate: the K=4 TRAIN
    logp should sit closer to the exact (TEST-dynamics) logp than K=1 on
    average (fixed comparison seed; both through the megakernel)."""
    icnf_ref0, _, ps, xs, _ = setup
    lp_exact, _, _ = cnf.inference(
        cnf.construct(cnf.RNODE, icnf_ref0.nn, 3, 2,
                      compute_mode=cnf.VecJacMode(fused=True)),
        Mode.TEST, xs, ps,
    )

    def train_lp(k_probes, seed):
        icnf = cnf.construct(
            cnf.RNODE, icnf_ref0.nn, 3, 2,
            compute_mode=cnf.VecJacMode(num_probes=k_probes, fused=True),
        )
        lp, _, _ = cnf.inference(icnf, Mode.TRAIN, xs, ps, key=jax.random.PRNGKey(seed))
        return lp

    err1 = jnp.mean(jnp.abs(train_lp(1, 21) - lp_exact))
    err4 = jnp.mean(jnp.abs(train_lp(4, 21) - lp_exact))
    assert float(err4) < float(err1)


def _make_exact(fused: bool, *, lam3=0.0, naug=2, steer=0.0):
    nvars = 3
    n_in = nvars + naug
    nn = cnf.MLP((n_in, 3 * n_in, n_in))
    return cnf.construct(
        cnf.RNODE,
        nn,
        nvars,
        naug,
        steer_rate=steer,
        lam3=lam3,
        compute_mode=cnf.VecJacMode(fused=fused, exact_trace=True),
    )


def test_exact_trace_eligibility(setup):
    """Round-4: the exact-divergence TRAIN config (the density-gate recipe)
    is megakernel-eligible, forward and adjoint."""
    icnf = _make_exact(True)
    fs = make_full_solve(icnf, Mode.TRAIN, 16)
    assert fs is not None and fs.adjoint is not None


def test_exact_trace_forward_parity(setup):
    """Fused exact-trace TRAIN solve == unfused XLA path: same controller
    decisions, same logp and regularizer integrals."""
    icnf_ref, icnf_fused = _make_exact(False), _make_exact(True)
    ps = icnf_ref.init(jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (16, 3), jnp.float32)
    key = jax.random.PRNGKey(3)
    lp_ref, regs_ref, st_ref = cnf.inference(icnf_ref, Mode.TRAIN, xs, ps, key=key)
    lp_f, regs_f, st_f = cnf.inference(icnf_fused, Mode.TRAIN, xs, ps, key=key)
    # The pm-matmul reassociates the dz^2 trace/Frobenius sums, so a
    # borderline controller decision may flip (same allowance as K>1 probes);
    # values must still agree to solver tolerance.
    assert abs(int(st_f.steps) - int(st_ref.steps)) <= 1
    assert jnp.allclose(lp_f, lp_ref, rtol=1e-3, atol=1e-3)
    assert jnp.allclose(regs_f.e, regs_ref.e, rtol=1e-3, atol=1e-3)
    assert jnp.allclose(regs_f.n, regs_ref.n, rtol=1e-3, atol=1e-3)


def test_exact_trace_matches_test_dynamics(setup):
    """Exact-trace TRAIN logp is deterministic and equals the TEST-mode
    (exact divergence) density on the same state — no estimator noise."""
    icnf_fused = _make_exact(True)
    ps = icnf_fused.init(jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (8, 3), jnp.float32)
    lp_train, _, _ = cnf.inference(
        icnf_fused, Mode.TRAIN, xs, ps, key=jax.random.PRNGKey(5)
    )
    lp_test, _, _ = cnf.inference(icnf_fused, Mode.TEST, xs, ps)
    # TRAIN integrates extra accumulator rows -> slightly different adaptive
    # grid; values agree to solver tolerance.
    assert jnp.allclose(lp_train, lp_test, rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_exact_trace_grad_parity(setup):
    """Gradients through the exact-mode adjoint megakernel (pm chained back
    to w1/w2) match the unfused continuous-adjoint path."""
    icnf_ref, icnf_fused = _make_exact(False), _make_exact(True)
    ps = icnf_ref.init(jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (16, 3), jnp.float32)
    key = jax.random.PRNGKey(4)

    def loss_of(icnf):
        return lambda p: cnf.loss(icnf, Mode.TRAIN, xs, p, key=key)

    g_ref = jax.grad(loss_of(icnf_ref))(ps)
    g_f = jax.grad(loss_of(icnf_fused))(ps)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_f)):
        assert jnp.allclose(a, b, rtol=2e-3, atol=2e-4), (a - b)


@pytest.mark.slow
def test_exact_trace_lam3_steer_grad(setup):
    """The full flagship-recipe flag set (exact_trace + lambda3 + steering)
    through the fused path: values and grads parity."""
    icnf_ref = _make_exact(False, lam3=1e-2, steer=0.1)
    icnf_fused = _make_exact(True, lam3=1e-2, steer=0.1)
    ps = icnf_ref.init(jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (8, 3), jnp.float32)
    key = jax.random.PRNGKey(6)
    lp_ref, regs_ref, _ = cnf.inference(icnf_ref, Mode.TRAIN, xs, ps, key=key)
    lp_f, regs_f, _ = cnf.inference(icnf_fused, Mode.TRAIN, xs, ps, key=key)
    assert jnp.allclose(lp_f, lp_ref, rtol=1e-4, atol=1e-4)
    assert jnp.allclose(regs_f.a, regs_ref.a, rtol=1e-4, atol=1e-4)
    g_ref = jax.grad(lambda p: cnf.loss(icnf_ref, Mode.TRAIN, xs, p, key=key))(ps)
    g_f = jax.grad(lambda p: cnf.loss(icnf_fused, Mode.TRAIN, xs, p, key=key))(ps)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_f)):
        assert jnp.allclose(a, b, rtol=2e-3, atol=2e-4), (a - b)


@pytest.mark.slow
def test_bf16_stage_matmuls(setup):
    """bf16 stage matmuls (f32 state/accumulation) track the f32 kernel.

    bf16 has ~3 decimal digits, so the field error is ~1e-3 relative — on
    the order of the default rtol; parity is checked at loose tolerances and
    gradients must stay finite.
    """
    icnf_ref, _, ps, xs, eps = setup
    icnf_bf16 = cnf.construct(
        cnf.RNODE, icnf_ref.nn, 3, 2, compute_mode=cnf.VecJacMode(fused=True, bf16=True)
    )
    fs = make_full_solve(icnf_bf16, Mode.TRAIN, 16)
    assert fs is not None and fs.adjoint is not None
    key = jax.random.PRNGKey(9)
    lp_ref, _, _ = cnf.inference(icnf_ref, Mode.TRAIN, xs, ps, key=key, eps=eps)
    lp_b, _, _ = cnf.inference(icnf_bf16, Mode.TRAIN, xs, ps, key=key, eps=eps)
    assert jnp.allclose(lp_b, lp_ref, rtol=5e-2, atol=5e-2)
    lp_ref_t, _, _ = cnf.inference(icnf_ref, Mode.TEST, xs, ps)
    lp_b_t, _, _ = cnf.inference(icnf_bf16, Mode.TEST, xs, ps)
    assert jnp.allclose(lp_b_t, lp_ref_t, rtol=5e-2, atol=5e-2)
    g = jax.grad(lambda p: cnf.loss(icnf_bf16, Mode.TRAIN, xs, p, key=key, eps=eps))(ps)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))


@pytest.mark.parametrize("norm_z,norm_j", [(True, True), (False, False), (True, False)])
@pytest.mark.parametrize("k_probes", [1, 3])
@pytest.mark.parametrize("widths,n_cond", [
    ((5, 11, 5), 0),        # 2-layer (the reference's standard net shape)
    ((5, 11, 5), 2),        # 2-layer conditional
    ((5, 9, 7, 5), 0),      # 3-layer chain
    ((5, 9, 7, 5), 3),      # 3-layer conditional
])
def test_fwdbwd_matches_jax_vjp(norm_z, norm_j, k_probes, widths, n_cond):
    """The hand-derived (transpose-free) stage VJPs used by the adjoint
    megakernel equal jax.vjp of the forward stages, for every mode, chain
    depth, and conditioning."""
    from continuousnf_tpu.ops.fused_solve import (
        ChainSpec,
        _stage_test,
        _stage_test_fwdbwd,
        _stage_train,
        _stage_train_exact,
        _stage_train_exact_fwdbwd,
        _stage_train_fwdbwd,
        exact_stage_consts,
    )

    dz, B = widths[-1], 7
    in_dims = (widths[0] + n_cond,) + widths[1:-1]
    out_dims = widths[1:]
    spec = ChainSpec(in_dims, out_dims, (True,) * len(out_dims), n_cond)
    N = spec.n_layers

    ks = jax.random.split(jax.random.PRNGKey(42), 6 + 2 * N)
    r = lambda i, shape: jax.random.normal(ks[i], shape, jnp.float32)
    zin = r(0, (spec.zin_dim, B))
    epst = r(1, (k_probes * dz, B))
    ws = [r(2 + 2 * i, (in_dims[i], out_dims[i])) * 0.5 for i in range(N)]
    bs = [r(3 + 2 * i, (out_dims[i], 1)) * 0.1 for i in range(N)]
    ct_y = r(2 + 2 * N, (dz, B))
    ct_r3 = r(3 + 2 * N, (3, B))
    ct_r1 = r(4 + 2 * N, (1, B))

    def split(zin_):
        if n_cond:
            return zin_[:dz], zin_[dz:]
        return zin_, None

    def cmp(got, want, what):
        flat_g = jax.tree.leaves(got)
        flat_w = jax.tree.leaves(want)
        assert len(flat_g) == len(flat_w), what
        for g, w in zip(flat_g, flat_w):
            assert jnp.allclose(g, w, rtol=1e-5, atol=1e-5), what

    # TRAIN (K-probe Hutchinson) — all depths
    def f_train(zin_, ws_, bs_):
        zt_, ysb_ = split(zin_)
        return _stage_train(
            spec, zt_, ysb_, epst, ws_, bs_, norm_z, norm_j, False, k_probes
        )

    (kz, kr), vjp = jax.vjp(f_train, zin, ws, bs)
    want = vjp((ct_y, ct_r3))
    zt, ysb = split(zin)
    got = _stage_train_fwdbwd(
        spec, zt, ysb, epst, ws, bs, norm_z, norm_j, False, k_probes, ct_y, ct_r3
    )
    cmp(got[:2], (kz, kr), "train fwd")
    cmp(got[2:], want, "train bwd")

    if N == 2:
        # TRAIN exact (2-layer pm formulation)
        w1z = ws[0][:dz] if n_cond else ws[0]
        pm = exact_stage_consts(w1z, ws[1])

        def f_exact(zin_, ws_, bs_, pm_):
            zt_, ysb_ = split(zin_)
            return _stage_train_exact(
                spec, zt_, ysb_, ws_, bs_, pm_, norm_z, norm_j, False
            )

        (kz, kr), vjp = jax.vjp(f_exact, zin, ws, bs, pm)
        want = vjp((ct_y, ct_r3))
        got = _stage_train_exact_fwdbwd(
            spec, zt, ysb, ws, bs, pm, norm_z, norm_j, False, ct_y, ct_r3
        )
        cmp(got[:2], (kz, kr), "exact fwd")
        cmp(got[2:], want, "exact bwd")

        # TEST (2-layer closed form)
        def f_test(zin_, ws_, bs_):
            zt_, ysb_ = split(zin_)
            return _stage_test(spec, zt_, ysb_, ws_, bs_, False)

        (kz, kr), vjp = jax.vjp(f_test, zin, ws, bs)
        want = vjp((ct_y, ct_r1))
        got = _stage_test_fwdbwd(spec, zt, ysb, ws, bs, False, ct_y, ct_r1)
        cmp(got[:2], (kz, kr), "test fwd")
        cmp(got[2:], want, "test bwd")


def test_exact_chain_stage_matches_reference():
    """The N-layer basis-propagation exact stage equals the batched chain
    product (`exact_dense_chain_jacobian`) it mirrors in (rows, B) layout."""
    from continuousnf_tpu.ops.fused_dynamics import exact_dense_chain_jacobian
    from continuousnf_tpu.ops.fused_solve import ChainSpec, _stage_exact_chain

    nn = cnf.MLP((4, 9, 7, 4))
    ps = nn.init(jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (6, 4), jnp.float32)
    y_ref, J = exact_dense_chain_jacobian(nn, ps, z)
    tr_ref = jnp.trace(J, axis1=-2, axis2=-1)
    fro_ref = jnp.sqrt(jnp.sum(J * J, axis=(1, 2)))

    spec = ChainSpec((4, 9, 7), (9, 7, 4), (True, True, True), 0)
    ws = [p["w"] for p in ps]
    bs = [p["b"].reshape(-1, 1) for p in ps]
    y, tr, fro = _stage_exact_chain(spec, z.T, None, ws, bs, False, want_fro=True)
    assert jnp.allclose(y.T, y_ref, rtol=1e-5, atol=1e-6)
    assert jnp.allclose(tr[0], tr_ref, rtol=1e-5, atol=1e-5)
    assert jnp.allclose(fro[0], fro_ref, rtol=1e-5, atol=1e-5)


def test_jit_inside(setup):
    """The megakernel path composes with jit (the trainer always jits)."""
    _, icnf_fused, ps, xs, eps = setup
    key = jax.random.PRNGKey(7)

    @jax.jit
    def f(p):
        return cnf.loss(icnf_fused, Mode.TRAIN, xs, p, key=key, eps=eps)

    v, g = jax.value_and_grad(f)(ps)
    assert jnp.isfinite(v)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))
