"""Parity tests for the round-5 widened megakernel funnel.

Round 4's kernels covered exactly one architecture (2-layer unconditional
tanh MLP on FSAL tableaus).  Round 5 generalizes to N-layer Dense/tanh
chains, conditional inputs, and non-FSAL / stretched-error tableaus
(verner65, dop853) — this file pins each new path to the unfused XLA solve:
same controller decisions, same values, consistent gradients.  The shapes
mirror the quality recipes that previously ran unfused
(`recipes.beta_unaugmented` MLP(1,64,64,1), `recipes.toy2d` MLP(2,32,32,2),
`recipes.conditional_gaussian` MLP(2,64,64,1); reference nets at
`/root/reference/README.md:43`, `test/call_tests.jl`).
"""

import jax
import jax.numpy as jnp
import pytest

import continuousnf_tpu as cnf
from continuousnf_tpu import Mode
from continuousnf_tpu.ops.fused_solve import make_full_solve


def _grad_close(g_ref, g_f, rtol=2e-3, atol=2e-4):
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_f)):
        assert jnp.allclose(a, b, rtol=rtol, atol=atol), (a - b)


def _mk3(fused, exact=False, method="tsit5", cond=False):
    """3-layer chain (the toy2d / beta_unaugmented family)."""
    nvars = 2
    n_in = nvars + (1 if cond else 0)
    nn = cnf.MLP((n_in, 16, 16, nvars))
    variant = cnf.CondRNODE if cond else cnf.RNODE
    return cnf.construct(
        variant, nn, nvars, 0,
        compute_mode=cnf.VecJacMode(fused=fused, exact_trace=exact),
        solver=cnf.SolverOptions(method=method),
    )


@pytest.fixture(scope="module")
def data3():
    icnf = _mk3(False)
    ps = icnf.init(jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (16, 2), jnp.float32)
    eps = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 2), jnp.float32)
    return ps, xs, eps


def test_chain_eligibility(data3):
    """3-layer chains and conditional nets are megakernel-eligible (round-4
    verdict item 2); stochastic TRAIN keeps the adjoint kernel at any depth."""
    fs = make_full_solve(_mk3(True), Mode.TRAIN, 16)
    assert fs is not None and fs.adjoint is not None
    fs = make_full_solve(_mk3(True, cond=True), Mode.TRAIN, 16)
    assert fs is not None and fs.adjoint is not None
    # TEST / exact at depth >= 3: forward kernel only, XLA backsolve grads.
    fs = make_full_solve(_mk3(True), Mode.TEST, 16)
    assert fs is not None and fs.adjoint is None
    fs = make_full_solve(_mk3(True, exact=True), Mode.TRAIN, 16)
    assert fs is not None and fs.adjoint is None


def test_chain_train_parity(data3):
    ps, xs, eps = data3
    key = jax.random.PRNGKey(3)
    lp_r, regs_r, st_r = cnf.inference(_mk3(False), Mode.TRAIN, xs, ps, key=key, eps=eps)
    lp_f, regs_f, st_f = cnf.inference(_mk3(True), Mode.TRAIN, xs, ps, key=key, eps=eps)
    assert int(st_f.steps) == int(st_r.steps)
    assert int(st_f.nfe) == int(st_r.nfe)
    assert jnp.allclose(lp_f, lp_r, rtol=1e-4, atol=1e-4)
    assert jnp.allclose(regs_f.e, regs_r.e, rtol=1e-4, atol=1e-4)
    assert jnp.allclose(regs_f.n, regs_r.n, rtol=1e-4, atol=1e-4)


def test_chain_test_parity(data3):
    """TEST mode at depth 3 runs the in-kernel basis propagation."""
    ps, xs, _ = data3
    lp_r, _, st_r = cnf.inference(_mk3(False), Mode.TEST, xs, ps)
    lp_f, _, st_f = cnf.inference(_mk3(True), Mode.TEST, xs, ps)
    assert int(st_f.steps) == int(st_r.steps)
    assert jnp.allclose(lp_f, lp_r, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_chain_grad_parity(data3):
    """Gradients through the N-layer adjoint megakernel == XLA backsolve."""
    ps, xs, eps = data3
    key = jax.random.PRNGKey(4)
    g_r = jax.grad(lambda p: cnf.loss(_mk3(False), Mode.TRAIN, xs, p, key=key, eps=eps))(ps)
    g_f = jax.grad(lambda p: cnf.loss(_mk3(True), Mode.TRAIN, xs, p, key=key, eps=eps))(ps)
    _grad_close(g_r, g_f)


def test_chain_exact_train_parity(data3):
    """Exact-divergence TRAIN at depth 3: fused forward (basis propagation)
    matches the unfused chain-product path; grads flow via XLA fallback."""
    ps, xs, _ = data3
    key = jax.random.PRNGKey(5)
    lp_r, regs_r, st_r = cnf.inference(_mk3(False, exact=True), Mode.TRAIN, xs, ps, key=key)
    lp_f, regs_f, st_f = cnf.inference(_mk3(True, exact=True), Mode.TRAIN, xs, ps, key=key)
    assert abs(int(st_f.steps) - int(st_r.steps)) <= 1
    assert jnp.allclose(lp_f, lp_r, rtol=1e-3, atol=1e-3)
    assert jnp.allclose(regs_f.n, regs_r.n, rtol=1e-3, atol=1e-3)
    g = jax.grad(lambda p: cnf.loss(_mk3(True, exact=True), Mode.TRAIN, xs, p, key=key))(ps)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree.leaves(g))


def test_cond_train_parity(data3):
    """Conditional nets run in-kernel (ys rides as extra input rows)."""
    icnf_r, icnf_f = _mk3(False, cond=True), _mk3(True, cond=True)
    ps = icnf_r.init(jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (16, 2), jnp.float32)
    ys = jax.random.normal(jax.random.PRNGKey(6), (16, 1), jnp.float32)
    eps = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 2), jnp.float32)
    key = jax.random.PRNGKey(7)
    lp_r, regs_r, st_r = cnf.inference(icnf_r, Mode.TRAIN, xs, ps, ys=ys, key=key, eps=eps)
    lp_f, regs_f, st_f = cnf.inference(icnf_f, Mode.TRAIN, xs, ps, ys=ys, key=key, eps=eps)
    assert int(st_f.steps) == int(st_r.steps)
    assert jnp.allclose(lp_f, lp_r, rtol=1e-4, atol=1e-4)
    assert jnp.allclose(regs_f.n, regs_r.n, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_cond_grad_parity(data3):
    """Conditional adjoint megakernel: grads w.r.t. params AND ys match the
    XLA backsolve (the ys-cotangent block is integrated in-kernel)."""
    icnf_r, icnf_f = _mk3(False, cond=True), _mk3(True, cond=True)
    ps = icnf_r.init(jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (12, 2), jnp.float32)
    ys = jax.random.normal(jax.random.PRNGKey(6), (12, 1), jnp.float32)
    eps = jax.random.normal(jax.random.PRNGKey(2), (1, 12, 2), jnp.float32)
    key = jax.random.PRNGKey(8)

    def loss_of(icnf):
        return lambda p, y_: cnf.loss(icnf, Mode.TRAIN, xs, p, ys=y_, key=key, eps=eps)

    g_r = jax.grad(loss_of(icnf_r), argnums=(0, 1))(ps, ys)
    g_f = jax.grad(loss_of(icnf_f), argnums=(0, 1))(ps, ys)
    _grad_close(g_r, g_f)


def test_cond_2layer_exact_parity():
    """Conditional 2-layer exact-trace: the pm stage with cond rows (the
    fully-fused conditional flagship analog) — values + grads."""
    nvars, nc = 3, 2
    nn = cnf.MLP((nvars + nc, 12, nvars))
    mk = lambda fused: cnf.construct(
        cnf.CondRNODE, nn, nvars, 0,
        compute_mode=cnf.VecJacMode(fused=fused, exact_trace=True),
    )
    icnf_r, icnf_f = mk(False), mk(True)
    fs = make_full_solve(icnf_f, Mode.TRAIN, 12)
    assert fs is not None and fs.adjoint is not None
    ps = icnf_r.init(jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (12, nvars), jnp.float32)
    ys = jax.random.normal(jax.random.PRNGKey(2), (12, nc), jnp.float32)
    key = jax.random.PRNGKey(3)
    lp_r, _, st_r = cnf.inference(icnf_r, Mode.TRAIN, xs, ps, ys=ys, key=key)
    lp_f, _, st_f = cnf.inference(icnf_f, Mode.TRAIN, xs, ps, ys=ys, key=key)
    assert abs(int(st_f.steps) - int(st_r.steps)) <= 1
    assert jnp.allclose(lp_f, lp_r, rtol=1e-3, atol=1e-3)
    g_r = jax.grad(lambda p: cnf.loss(icnf_r, Mode.TRAIN, xs, p, ys=ys, key=key))(ps)
    g_f = jax.grad(lambda p: cnf.loss(icnf_f, Mode.TRAIN, xs, p, ys=ys, key=key))(ps)
    _grad_close(g_r, g_f)


def test_dz1_chain():
    """dz=1 (the beta_unaugmented shape MLP(1,64,64,1)): single-row state
    blocks through the kernel."""
    nn = cnf.MLP((1, 8, 8, 1))
    mk = lambda fused: cnf.construct(
        cnf.RNODE, nn, 1, 0, compute_mode=cnf.VecJacMode(fused=fused)
    )
    ps = mk(False).init(jax.random.PRNGKey(0))
    xs = jax.random.normal(jax.random.PRNGKey(1), (8, 1), jnp.float32)
    eps = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 1), jnp.float32)
    key = jax.random.PRNGKey(3)
    lp_r, _, st_r = cnf.inference(mk(False), Mode.TRAIN, xs, ps, key=key, eps=eps)
    lp_f, _, st_f = cnf.inference(mk(True), Mode.TRAIN, xs, ps, key=key, eps=eps)
    assert int(st_f.steps) == int(st_r.steps)
    assert jnp.allclose(lp_f, lp_r, rtol=1e-4, atol=1e-4)
    g_r = jax.grad(lambda p: cnf.loss(mk(False), Mode.TRAIN, xs, p, key=key, eps=eps))(ps)
    g_f = jax.grad(lambda p: cnf.loss(mk(True), Mode.TRAIN, xs, p, key=key, eps=eps))(ps)
    _grad_close(g_r, g_f)


@pytest.mark.parametrize("method", ["verner65", "dop853"])
def test_nonfsal_and_stretched_methods_fused(method, data3):
    """Round-5: non-FSAL (verner65) and stretched-error (dop853) tableaus run
    in-kernel — the tight-tolerance `auto` selections compose with fusion
    (round-4 verdict item 6).  Same controller decisions and NFE accounting
    as the XLA path."""
    ps, xs, eps = data3
    key = jax.random.PRNGKey(9)
    icnf_r, icnf_f = _mk3(False, method=method), _mk3(True, method=method)
    assert make_full_solve(icnf_f, Mode.TRAIN, 16) is not None
    lp_r, _, st_r = cnf.inference(icnf_r, Mode.TRAIN, xs, ps, key=key, eps=eps)
    lp_f, _, st_f = cnf.inference(icnf_f, Mode.TRAIN, xs, ps, key=key, eps=eps)
    assert int(st_f.steps) == int(st_r.steps)
    assert int(st_f.nfe) == int(st_r.nfe)
    assert jnp.allclose(lp_f, lp_r, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
@pytest.mark.parametrize("method", ["verner65", "dop853"])
def test_nonfsal_grad_parity(method, data3):
    """Adjoint megakernel with non-FSAL refresh / stretched error: gradients
    match the XLA backsolve."""
    ps, xs, eps = data3
    key = jax.random.PRNGKey(10)
    g_r = jax.grad(
        lambda p: cnf.loss(_mk3(False, method=method), Mode.TRAIN, xs, p, key=key, eps=eps)
    )(ps)
    g_f = jax.grad(
        lambda p: cnf.loss(_mk3(True, method=method), Mode.TRAIN, xs, p, key=key, eps=eps)
    )(ps)
    _grad_close(g_r, g_f)


def test_recipe_shapes_eligible():
    """The three previously-unfused quality recipes are now kernel-eligible
    at their literal shapes (round-4 verdict item 2 'done' condition)."""
    # beta_unaugmented: MLP(1, 64, 64, 1), RNODE nvars=1
    icnf = cnf.construct(
        cnf.RNODE, cnf.MLP((1, 64, 64, 1)), 1, 0,
        compute_mode=cnf.VecJacMode(fused=True), input_bijector="logit",
    )
    fs = make_full_solve(icnf, Mode.TRAIN, 128)
    assert fs is not None and fs.adjoint is not None
    # toy2d: MLP(2, 32, 32, 2), FFJORD nvars=2
    icnf = cnf.construct(
        cnf.FFJORD, cnf.MLP((2, 32, 32, 2)), 2, 0,
        compute_mode=cnf.VecJacMode(fused=True),
    )
    fs = make_full_solve(icnf, Mode.TRAIN, 256)
    assert fs is not None and fs.adjoint is not None
    # conditional_gaussian: MLP(2, 64, 64, 1), CondRNODE nvars=1
    icnf = cnf.construct(
        cnf.CondRNODE, cnf.MLP((2, 64, 64, 1)), 1, 0,
        compute_mode=cnf.VecJacMode(fused=True),
    )
    fs = make_full_solve(icnf, Mode.TRAIN, 128)
    assert fs is not None and fs.adjoint is not None
    # tabular miniboone: MLP(43, 128, 128, 43), 3 layers
    icnf = cnf.construct(
        cnf.RNODE, cnf.MLP((43, 128, 128, 43)), 43, 0,
        compute_mode=cnf.VecJacMode(fused=True),
    )
    fs = make_full_solve(icnf, Mode.TRAIN, 1024)
    assert fs is not None and fs.adjoint is not None


def test_adjoint_stats_observability(data3):
    """`adjoint_stats` measures the backward integration's real attempt/NFE
    counts (round-4 verdict item 4): jit-compatible, the forward counts
    match the XLA path exactly, and the backward counts agree within the
    warm-start band (the fused backward seeds its controller from the
    forward's final dt — `SolveStats.dt_last` — while the XLA backward
    Hairer-picks; both adapt to the same grid within a few attempts)."""
    ps, xs, eps = data3
    key = jax.random.PRNGKey(11)
    f_r, b_r = jax.jit(
        lambda x: cnf.adjoint_stats(_mk3(False), Mode.TRAIN, x, ps, key=key, eps=eps)
    )(xs)
    f_f, b_f = jax.jit(
        lambda x: cnf.adjoint_stats(_mk3(True), Mode.TRAIN, x, ps, key=key, eps=eps)
    )(xs)
    assert int(b_r.steps) > 0 and int(b_r.nfe) > 0
    assert int(f_f.steps) == int(f_r.steps)
    # The warm start can legitimately make the fused backward take FAR fewer
    # attempts on short spans (the forward's final dt is already near the
    # span, so the first big backward step passes error control; observed 2
    # vs 9 here) — both integrations are error-controlled, and the grad
    # parity tests pin their agreement.  Only sanity-bound the counts.
    assert 0 < int(b_f.steps) <= 3 * int(b_r.steps)
    # the forward's final dt is tracked on both paths
    assert f_r.dt_last is not None and f_f.dt_last is not None


def test_trajectory_saveat(data3):
    """`inference(..., trajectory=True)` (round-4 verdict item 7): endpoints
    match the plain final-state-only solve, the grid is monotone, and a
    custom `SolverOptions.saveat` grid is honored."""
    ps, xs, _ = data3
    icnf = _mk3(True)
    lp, _, st, (ts, zs) = cnf.inference(icnf, Mode.TEST, xs, ps, trajectory=True)
    lp0, _, st0 = cnf.inference(icnf, Mode.TEST, xs, ps)
    assert zs.shape == (17, xs.shape[0], icnf.zdim)
    assert jnp.allclose(zs[0], xs, atol=1e-6)  # grid starts at the data
    # Endpoint density tracks the single-segment solve: both are rtol=1e-3
    # error-controlled approximations, but the segmented solve restarts the
    # controller 16 times (fresh Hairer dt each segment), so their DIFFERENCE
    # accumulates ~per-segment truncation error (measured ~1.3% here), not
    # the single-solve tolerance.
    assert jnp.allclose(lp, lp0, rtol=2e-2, atol=1e-1)
    assert bool(jnp.all(jnp.diff(ts) > 0))
    assert int(st.nfe) > int(st0.nfe)  # T segments cost more than one solve

    # custom grid via SolverOptions.saveat
    import dataclasses as dc
    icnf_g = dc.replace(icnf, solver=dc.replace(icnf.solver, saveat=(0.0, 0.5, 1.0)))
    _, _, _, (ts_g, zs_g) = cnf.inference(icnf_g, Mode.TEST, xs, ps, trajectory=True)
    assert zs_g.shape[0] == 3 and float(ts_g[1]) == 0.5


def test_tstops(data3):
    """`SolverOptions.tstops` forces the integrator onto given times via
    segment solves (reference `sol_kwargs` passthrough parity); the result
    matches the unconstrained solve to accumulated segment tolerance."""
    import dataclasses as dc
    ps, xs, _ = data3
    icnf = _mk3(False)
    icnf_t = dc.replace(icnf, solver=dc.replace(icnf.solver, tstops=(0.3, 0.7)))
    lp, _, st = cnf.inference(icnf_t, Mode.TEST, xs, ps)
    lp0, _, st0 = cnf.inference(icnf, Mode.TEST, xs, ps)
    assert jnp.allclose(lp, lp0, rtol=1e-2, atol=1e-2)
    assert int(st.nfe) > int(st0.nfe)


def test_auto_stage_precision_resolution():
    """'auto' stage precision resolves by rtol (bf16x3's ~1e-4 noise must
    sit well under the tolerance; docs/ROUND5.md section 8)."""
    from continuousnf_tpu.types import (
        README_TOLERANCES, SolverOptions, resolve_stage_precision,
    )

    assert resolve_stage_precision(SolverOptions()) == "high"  # rtol 1e-3
    assert resolve_stage_precision(SolverOptions(rtol=1e-2)) == "high"
    # README tolerances (rtol = sqrt(eps(f32)) ~ 3.45e-4) are tight: honest
    # f32 emulation, no grind.
    assert resolve_stage_precision(SolverOptions(**README_TOLERANCES)) == "highest"
    assert resolve_stage_precision(SolverOptions(rtol=1e-6)) == "highest"
    # explicit settings pass through untouched
    assert resolve_stage_precision(SolverOptions(stage_precision="highest")) == "highest"
    assert resolve_stage_precision(
        SolverOptions(rtol=1e-7, stage_precision="high")) == "high"


def test_jvp_mode_parity(data3):
    """JacVec (forward-AD) probes through the megakernel (round 5): the
    in-kernel pushforward chain matches the XLA linearize path, values and
    gradients, at depth 3."""
    ps, xs, eps = data3
    mk = lambda fused: cnf.construct(
        cnf.RNODE, cnf.MLP((2, 16, 16, 2)), 2, 0,
        compute_mode=cnf.JacVecMode(fused=fused),
    )
    key = jax.random.PRNGKey(13)
    lp_r, regs_r, st_r = cnf.inference(mk(False), Mode.TRAIN, xs, ps, key=key, eps=eps)
    lp_f, regs_f, st_f = cnf.inference(mk(True), Mode.TRAIN, xs, ps, key=key, eps=eps)
    assert int(st_f.steps) == int(st_r.steps)
    assert jnp.allclose(lp_f, lp_r, rtol=1e-4, atol=1e-4)
    assert jnp.allclose(regs_f.n, regs_r.n, rtol=1e-4, atol=1e-4)
    g_r = jax.grad(lambda p: cnf.loss(mk(False), Mode.TRAIN, xs, p, key=key, eps=eps))(ps)
    g_f = jax.grad(lambda p: cnf.loss(mk(True), Mode.TRAIN, xs, p, key=key, eps=eps))(ps)
    _grad_close(g_r, g_f)


def test_jvp_fwdbwd_matches_jax_vjp():
    """Hand-derived VJP of the JVP (pushforward) train stage == jax.vjp."""
    from continuousnf_tpu.ops.fused_solve import (
        ChainSpec, _stage_train, _stage_train_fwdbwd,
    )

    dz, B, K = 4, 7, 2
    spec = ChainSpec((dz + 2, 9), (9, dz), (True, True), 2)
    ks = jax.random.split(jax.random.PRNGKey(7), 9)
    r = lambda i, shape: jax.random.normal(ks[i], shape, jnp.float32)
    zin = r(0, (spec.zin_dim, B))
    epst = r(1, (K * dz, B))
    ws = [r(2, (dz + 2, 9)) * 0.5, r(3, (9, dz)) * 0.5]
    bs = [r(4, (9, 1)) * 0.1, r(5, (dz, 1)) * 0.1]
    ct_y, ct_r = r(6, (dz, B)), r(7, (3, B))

    def f(zin_, ws_, bs_):
        return _stage_train(
            spec, zin_[:dz], zin_[dz:], epst, ws_, bs_, True, True, False, K,
            jvp=True,
        )

    (kz, kr), vjp = jax.vjp(f, zin, ws, bs)
    want = vjp((ct_y, ct_r))
    got = _stage_train_fwdbwd(
        spec, zin[:dz], zin[dz:], epst, ws, bs, True, True, False, K,
        ct_y, ct_r, jvp=True,
    )
    for g, w in zip(jax.tree.leaves(got[:2]), jax.tree.leaves((kz, kr))):
        assert jnp.allclose(g, w, rtol=1e-5, atol=1e-5)
    for g, w in zip(jax.tree.leaves(got[2:]), jax.tree.leaves(want)):
        assert jnp.allclose(g, w, rtol=1e-5, atol=1e-5)
