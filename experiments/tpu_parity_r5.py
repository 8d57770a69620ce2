"""On-chip (real TPU, Mosaic) parity: round-5 generalized megakernels vs XLA.

Covers the round-4 configs (2-layer train/test/exact + grads) plus the
round-5 funnel widening: 3-layer chains, conditional nets, verner65
(non-FSAL) and dop853 (stretched error) in-kernel.

Tolerance regime: parity configs pin rtol=1e-5 (auto stage precision
resolves to full-f32 stages there), so fused-vs-XLA comparisons measure
KERNEL equivalence, not precision noise — the same regime as the committed
tests/test_tpu_parity.py.  At the default rtol=1e-3 both paths deliberately
run the noisy-but-fast bf16x3 scheme on independently-noisy adaptive grids
(docs/ROUND5.md section 8); a separate noise-band probe checks that regime
stays within its expected envelope (relative values, steps within ~20%).

Prints one PASS/FAIL line per probe; exit code 0 iff all pass.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/cnf_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import continuousnf_tpu as cnf
from continuousnf_tpu import Mode
from continuousnf_tpu.ops.fused_solve import make_full_solve

FAILS = []

def check(name, ok, detail=""):
    print(("PASS " if ok else "FAIL ") + name + (" " + detail if detail else ""), flush=True)
    if not ok:
        FAILS.append(name)

def maxd(a, b):
    return float(jnp.max(jnp.abs(a - b)))

def gmaxrel(ga, gb):
    """Max relative leaf error, mean-|ref|-normalized — the same metric and
    acceptance (5e-2) as the committed tests/test_tpu_parity.py gate."""
    out = 0.0
    for a, b in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        denom = jnp.maximum(jnp.mean(jnp.abs(a)), 1e-12)
        out = max(out, float(jnp.max(jnp.abs(a - b)) / denom))
    return out

def parity(tag, mk, nvars, B=256, cond_dim=0, exact=False, tspan13=True, grad=True, eps_probes=1):
    icnf_r, icnf_f = mk(False), mk(True)
    ps = icnf_r.init(jax.random.PRNGKey(0))
    xs = jax.random.uniform(jax.random.PRNGKey(1), (B, nvars), jnp.float32)
    ys = (jax.random.normal(jax.random.PRNGKey(9), (B, cond_dim), jnp.float32)
          if cond_dim else None)
    eps = (None if exact else
           jax.random.normal(jax.random.PRNGKey(2), (eps_probes, B, icnf_r.zdim), jnp.float32))
    key = jax.random.PRNGKey(3)
    kw = dict(ys=ys, key=key) if eps is None else dict(ys=ys, key=key, eps=eps)

    t0 = time.time()
    lp_r, regs_r, st_r = jax.jit(lambda x: cnf.inference(icnf_r, Mode.TRAIN, x, ps, **kw))(xs)
    lp_f, regs_f, st_f = jax.jit(lambda x: cnf.inference(icnf_f, Mode.TRAIN, x, ps, **kw))(xs)
    lp_r, lp_f = np.asarray(lp_r), np.asarray(lp_f)
    ds = abs(int(st_f.steps) - int(st_r.steps))
    # Same acceptance as tests/test_tpu_parity.py: long tight-tolerance
    # solves (dop853: ~2k attempts) flip ~1% of borderline controller
    # decisions to FP reassociation; values must still agree.
    ds_gate = max(2, int(st_r.steps) // 20)
    dv = maxd(lp_f, lp_r)
    check(f"{tag}/train fwd", ds <= ds_gate and dv <= 2e-2,
          f"dsteps={ds} dlogp={dv:.2e} steps={int(st_r.steps)} ({time.time()-t0:.0f}s)")

    lp_rt, _, st_rt = jax.jit(lambda x: cnf.inference(icnf_r, Mode.TEST, x, ps, ys=ys))(xs)
    lp_ft, _, st_ft = jax.jit(lambda x: cnf.inference(icnf_f, Mode.TEST, x, ps, ys=ys))(xs)
    dv = maxd(np.asarray(lp_ft), np.asarray(lp_rt))
    ds = abs(int(st_ft.steps) - int(st_rt.steps))
    check(f"{tag}/test fwd", ds <= max(2, int(st_rt.steps) // 20) and dv <= 2e-2,
          f"dsteps={ds} dlogp={dv:.2e}")

    if grad:
        t0 = time.time()
        def loss_of(icnf):
            return lambda p: cnf.loss(icnf, Mode.TRAIN, xs, p, **kw)
        g_r = jax.jit(jax.grad(loss_of(icnf_r)))(ps)
        g_f = jax.jit(jax.grad(loss_of(icnf_f)))(ps)
        rel = gmaxrel(g_r, g_f)
        check(f"{tag}/grad", rel <= 5e-2, f"maxrel={rel:.2e} ({time.time()-t0:.0f}s)")

NV, NA = 8, 8
NIN = NV + NA
def mk_flagship(fused, exact=False, method="tsit5"):
    return cnf.construct(
        cnf.RNODE, cnf.MLP((NIN, 3 * NIN, NIN)), NV, NA,
        tspan=(0.0, 13.0), lam3=1e-2,
        compute_mode=cnf.VecJacMode(fused=fused, exact_trace=exact),
        solver=cnf.SolverOptions(method=method, rtol=1e-5, atol=1e-8),
    )

# 1. flagship 2-layer Hutchinson (the bench config)
parity("2L-hutch", lambda f: mk_flagship(f), NV, B=512)
# 2. flagship exact (the density-gate recipe) — the V3 reformulated stage
parity("2L-exact", lambda f: mk_flagship(f, exact=True), NV, B=512, exact=True)
# 3. 3-layer chain (toy2d shape scaled up)
def mk3(f, method="tsit5"):
    return cnf.construct(
        cnf.RNODE, cnf.MLP((2, 32, 32, 2)), 2, 0, tspan=(0.0, 8.0),
        compute_mode=cnf.VecJacMode(fused=f),
        solver=cnf.SolverOptions(method=method, rtol=1e-5, atol=1e-8),
    )
parity("3L-hutch", mk3, 2, B=512)
# 4. conditional 3-layer (conditional_gaussian shape)
def mkc(f):
    return cnf.construct(
        cnf.CondRNODE, cnf.MLP((3, 64, 64, 1)), 1, 0, tspan=(0.0, 13.0),
        compute_mode=cnf.VecJacMode(fused=f),
        solver=cnf.SolverOptions(rtol=1e-5, atol=1e-8),
    )
parity("cond-3L", mkc, 1, B=512, cond_dim=2)
# 5. verner65 non-FSAL in-kernel (README tolerances)
def mkv(f):
    return cnf.construct(
        cnf.RNODE, cnf.MLP((NIN, 3 * NIN, NIN)), NV, NA, tspan=(0.0, 13.0),
        compute_mode=cnf.VecJacMode(fused=f),
        solver=cnf.SolverOptions(method="verner65", **cnf.README_TOLERANCES),
    )
parity("verner65", mkv, NV, B=256, grad=True)
# 6. dop853 stretched-error in-kernel
def mkd(f):
    return cnf.construct(
        cnf.RNODE, cnf.MLP((NIN, 3 * NIN, NIN)), NV, NA, tspan=(0.0, 13.0),
        compute_mode=cnf.VecJacMode(fused=f),
        solver=cnf.SolverOptions(method="dop853", rtol=1e-6, atol=1e-8),
    )
parity("dop853", mkd, NV, B=256, grad=False)
# 7. K=3 probes
parity("K3-hutch", lambda f: cnf.construct(
    cnf.RNODE, cnf.MLP((NIN, 3 * NIN, NIN)), NV, NA, tspan=(0.0, 13.0),
    compute_mode=cnf.VecJacMode(num_probes=3, fused=f),
    solver=cnf.SolverOptions(rtol=1e-5, atol=1e-8)), NV, B=256, grad=False, eps_probes=3)

# Noise-band probe for the DEFAULT (rtol=1e-3, bf16x3) regime: both paths
# run the fast noisy scheme on independent adaptive grids — values must
# agree in RELATIVE terms and step counts within the noise envelope.
def mk_default(f):
    return cnf.construct(
        cnf.RNODE, cnf.MLP((NIN, 3 * NIN, NIN)), NV, NA,
        tspan=(0.0, 13.0), lam3=1e-2, compute_mode=cnf.VecJacMode(fused=f))

icnf_bf, icnf_bx = mk_default(True), mk_default(False)
ps_d = icnf_bf.init(jax.random.PRNGKey(0))
xs_d = jax.random.uniform(jax.random.PRNGKey(1), (512, NV), jnp.float32)
eps_d = jax.random.normal(jax.random.PRNGKey(2), (1, 512, NIN), jnp.float32)
kw_d = dict(key=jax.random.PRNGKey(3), eps=eps_d)
lp_f, _, st_f = jax.jit(lambda x: cnf.inference(icnf_bf, Mode.TRAIN, x, ps_d, **kw_d))(xs_d)
lp_x, _, st_x = jax.jit(lambda x: cnf.inference(icnf_bx, Mode.TRAIN, x, ps_d, **kw_d))(xs_d)
rel = float(jnp.max(jnp.abs(lp_f - lp_x)) / jnp.maximum(jnp.mean(jnp.abs(lp_x)), 1e-9))
ds = abs(int(st_f.steps) - int(st_x.steps))
check("bf16x3-noise-band/train", rel <= 2e-3 and ds <= max(8, int(st_x.steps) // 5),
      f"rel={rel:.2e} dsteps={ds} steps={int(st_x.steps)}")
# 8. guards: max_steps cap, bf16 ineligible-dtype, VMEM fallback, generate B=1
icnf_cap = cnf.construct(
    cnf.RNODE, cnf.MLP((NIN, 3 * NIN, NIN)), NV, NA, tspan=(0.0, 13.0),
    compute_mode=cnf.VecJacMode(fused=True), solver=cnf.SolverOptions(max_steps=5))
ps = icnf_cap.init(jax.random.PRNGKey(0))
xs = jax.random.uniform(jax.random.PRNGKey(1), (64, NV), jnp.float32)
_, _, st = cnf.inference(icnf_cap, Mode.TRAIN, xs, ps, key=jax.random.PRNGKey(2))
check("guards/max_steps", int(st.steps) == 5, f"steps={int(st.steps)}")
big = make_full_solve(mk_flagship(True), Mode.TRAIN, 10_000_000)
check("guards/vmem", big is None)
s = cnf.generate(mk_flagship(True), Mode.TEST, ps, None, key=jax.random.PRNGKey(4))
check("guards/generate_B1", bool(jnp.all(jnp.isfinite(s))) and s.shape == (NV,))

print(f"{'ALL PASS' if not FAILS else 'FAILURES: ' + ','.join(FAILS)}", flush=True)
sys.exit(1 if FAILS else 0)
