"""Whole-ODE-solve Pallas megakernel ("solve-in-kernel").

The fused dynamics kernel (fused_dynamics.py) still pays one kernel launch
per RK *stage* (~6 launches + controller ops per attempted step); on the
remote-attached TPU runtime per-iteration overhead (~95 us) dwarfs the
~1 us of actual compute (bench roofline: 6% utilization).  This module moves
the ENTIRE adaptive solve — all Tsit5 stages, the embedded error estimate,
and the PI step-size controller `lax.while_loop` — into ONE Pallas kernel,
so a full CNF transport (hundreds of NFE) is a single launch with all state
resident in VMEM.

Replaces, for the supported architecture (2-layer tanh MLP, the reference's
standard net, e.g. `/root/reference/test/regression_tests.jl:7`), the hot
path of `ode/solve.py::_solve_adaptive_while` with bit-compatible control
logic (same Hairer scaled-error norm over the full augmented state, same PI
controller constants, same accept/reject semantics, same NFE accounting).

Layout: everything is kept TRANSPOSED, `(rows, B)` — with tiny channel
widths (dz=16) a `(B, dz)` array pads its lane dim 16 -> 128 (8x waste),
while `(dz, B)` packs lanes with batch.  This is, amusingly, exactly the
reference's d x B state-matrix layout (`/root/reference/src/base_icnf.jl:275-281`).

Dynamics covered:
  * TRAIN — Hutchinson VJP, K=1 probe, with RNODE regularizer rates
    (reference `src/icnf.jl:318-350`); state rows [z | dlogp | E | n].
  * TEST  — closed-form exact divergence of the 2-layer tanh MLP
    (see `fused_dynamics.exact_tanh_mlp_trace`); state rows [z | dlogp].

Gradients: the megakernel is forward-only; training gradients flow through
the continuous-adjoint custom_vjp (`ode/adjoint.py`), whose backward pass
integrates the adjoint ODE with the plain XLA dynamics — the megakernel only
replaces the forward solve inside that wrapper.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..types import Mode, SolverOptions
from ..ode.tableaus import TABLEAUS, ButcherTableau

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# Mirror of the controller constants in ode/solve.py (keep in sync).
_SAFETY = 0.9
_QMIN = 0.2
_QMAX = 10.0
_EEST_FLOOR = 1.0e-4

# VMEM budget guard: above this working-set estimate, fall back to the
# per-stage path (the kernel keeps whole-batch state + stage registers
# resident).
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def _stage_train(zt, epst, w1, b1c, w2, b2c, norm_z: bool, norm_j: bool):
    """One TRAIN dynamics eval in (rows, B) layout.

    zt, epst: (dz, B); w1: (dz, H); b1c: (H, 1); w2: (H, dz); b2c: (dz, 1).
    Returns (k_z (dz, B), k_rates (3, B)) with rate rows [-tr, Edot, ndot].
    """
    f32 = jnp.float32
    h = jnp.tanh(
        jax.lax.dot_general(w1, zt, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        + b1c
    )  # (H, B)
    y = jnp.tanh(
        jax.lax.dot_general(w2, h, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        + b2c
    )  # (dz, B)
    g2 = epst * (1.0 - y * y)
    gh = jax.lax.dot_general(w2, g2, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    g1 = gh * (1.0 - h * h)
    eJ = jax.lax.dot_general(w1, g1, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    tr = jnp.sum(eJ * epst, axis=0, keepdims=True)  # (1, B)
    if norm_z:
        e_rate = jnp.sqrt(jnp.sum(y * y, axis=0, keepdims=True))
    else:
        e_rate = jnp.zeros_like(tr)
    if norm_j:
        n_rate = jnp.sqrt(jnp.sum(eJ * eJ, axis=0, keepdims=True))
    else:
        n_rate = jnp.zeros_like(tr)
    rates = jnp.concatenate([-tr, e_rate, n_rate], axis=0)  # (3, B)
    return y, rates


def _stage_test(zt, w1, b1c, w2, b2c):
    """One TEST dynamics eval: closed-form exact divergence, (rows, B) layout.

    tr_b = sum_i dy[i,b] * (M @ dh)[i,b]  with  M[i,h] = w1[i,h] * w2[h,i].
    Returns (k_z (dz, B), k_rates (1, B)) with the single rate row -tr.
    """
    f32 = jnp.float32
    h = jnp.tanh(
        jax.lax.dot_general(w1, zt, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        + b1c
    )
    y = jnp.tanh(
        jax.lax.dot_general(w2, h, (((0,), (0,)), ((), ())), preferred_element_type=f32)
        + b2c
    )
    dh = 1.0 - h * h  # (H, B)
    dy = 1.0 - y * y  # (dz, B)
    m = w1 * w2.T  # (dz, H)
    mdh = jax.lax.dot_general(m, dh, (((1,), (0,)), ((), ())), preferred_element_type=f32)
    tr = jnp.sum(dy * mdh, axis=0, keepdims=True)  # (1, B)
    return y, -tr


class _Carry(NamedTuple):
    t: jax.Array
    dt: jax.Array
    eest_prev: jax.Array
    steps: jax.Array
    accepted: jax.Array
    z: jax.Array  # (dz, B)
    acc: jax.Array  # (nacc, B)
    k1z: jax.Array  # (dz, B) FSAL register (field value)
    k1r: jax.Array  # (nacc, B) FSAL register (rates)


def _make_solve_kernel(
    tab: ButcherTableau,
    *,
    train: bool,
    norm_z: bool,
    norm_j: bool,
    rtol: float,
    atol: float,
    max_steps: int,
    n_elems: int,
):
    """Build the kernel body.  All shapes/flags are baked in at trace time."""
    beta1 = 7.0 / (10.0 * tab.order)
    beta2 = 2.0 / (5.0 * tab.order)

    def kernel(ts_ref, z0_ref, *rest):
        if train:
            eps_ref, w1_ref, b1_ref, w2_ref, b2_ref, zT_ref, accT_ref, st_ref = rest
            epst = eps_ref[:]
        else:
            w1_ref, b1_ref, w2_ref, b2_ref, zT_ref, accT_ref, st_ref = rest
            epst = None
        w1 = w1_ref[:]
        b1c = b1_ref[:]
        w2 = w2_ref[:]
        b2c = b2_ref[:]

        def stage(zt):
            if train:
                return _stage_train(zt, epst, w1, b1c, w2, b2c, norm_z, norm_j)
            return _stage_test(zt, w1, b1c, w2, b2c)

        f32 = jnp.float32
        t0 = ts_ref[0, 0]
        t1 = ts_ref[0, 1]
        dt0 = ts_ref[0, 2]
        tdir = jnp.sign(t1 - t0)

        z0 = z0_ref[:]
        k1z0, k1r0 = stage(z0)
        acc0 = jnp.zeros_like(k1r0)

        init = _Carry(
            t=t0,
            dt=dt0,
            eest_prev=jnp.asarray(1.0, f32),
            steps=jnp.asarray(0, jnp.int32),
            accepted=jnp.asarray(0, jnp.int32),
            z=z0,
            acc=acc0,
            k1z=k1z0,
            k1r=k1r0,
        )

        def cond(c: _Carry):
            return ((c.t - t1) * tdir < 0) & (c.steps < max_steps)

        def body(c: _Carry):
            remaining = jnp.abs(t1 - c.t)
            is_last = jnp.abs(c.dt) >= remaining
            dt_use = tdir * jnp.minimum(jnp.abs(c.dt), remaining)

            ks_z = [c.k1z]
            ks_r = [c.k1r]
            for i in range(1, tab.num_stages):
                zi = c.z
                for j, aij in enumerate(tab.a[i]):
                    if aij != 0.0:
                        zi = zi + (dt_use * f32(aij)) * ks_z[j]
                kz, kr = stage(zi)
                ks_z.append(kz)
                ks_r.append(kr)

            y_new = c.z
            a_new = c.acc
            for i, bi in enumerate(tab.b):
                if bi != 0.0:
                    y_new = y_new + (dt_use * f32(bi)) * ks_z[i]
                    a_new = a_new + (dt_use * f32(bi)) * ks_r[i]
            err_z = jnp.zeros_like(c.z)
            err_a = jnp.zeros_like(c.acc)
            for i, bti in enumerate(tab.btilde):
                if bti != 0.0:
                    err_z = err_z + (dt_use * f32(bti)) * ks_z[i]
                    err_a = err_a + (dt_use * f32(bti)) * ks_r[i]

            # Hairer scaled error norm over the full augmented state —
            # identical element set to the flat-state norm in ode/solve.py.
            sc_z = atol + rtol * jnp.maximum(jnp.abs(c.z), jnp.abs(y_new))
            sc_a = atol + rtol * jnp.maximum(jnp.abs(c.acc), jnp.abs(a_new))
            sumsq = jnp.sum(jnp.square(err_z / sc_z)) + jnp.sum(jnp.square(err_a / sc_a))
            eest = jnp.sqrt(sumsq / n_elems)
            finite = (
                jnp.isfinite(eest)
                & jnp.all(jnp.isfinite(y_new))
                & jnp.all(jnp.isfinite(a_new))
            )
            accept = (eest <= 1.0) & finite

            # Mosaic has no scalar powf; arguments are positive (floored), so
            # x**p == exp(p*log(x)) exactly in the controller's regime.
            powp = lambda x, p: jnp.exp(f32(p) * jnp.log(x))
            eest_c = jnp.maximum(eest, f32(_EEST_FLOOR))
            q_acc = _SAFETY * powp(eest_c, -beta1) * powp(c.eest_prev, beta2)
            q_acc = jnp.where(jnp.isfinite(q_acc), q_acc, _QMIN)
            q_rej = _SAFETY * powp(eest_c, -1.0 / tab.order)
            q_rej = jnp.where(jnp.isfinite(q_rej), q_rej, _QMIN)
            q_rej = jnp.where(finite, q_rej, f32(_QMIN))
            dt_next = jnp.where(
                accept,
                dt_use * jnp.clip(q_acc, _QMIN, _QMAX),
                dt_use * jnp.clip(q_rej, _QMIN, 1.0),
            )

            t_next = jnp.where(accept, jnp.where(is_last, t1, c.t + dt_use), c.t)
            # FSAL: the last stage of an accepted step is f at the new point.
            return _Carry(
                t=t_next,
                dt=dt_next,
                eest_prev=jnp.where(accept, eest_c, c.eest_prev),
                steps=c.steps + 1,
                accepted=c.accepted + accept.astype(jnp.int32),
                z=jnp.where(accept, y_new, c.z),
                acc=jnp.where(accept, a_new, c.acc),
                k1z=jnp.where(accept, ks_z[-1], c.k1z),
                k1r=jnp.where(accept, ks_r[-1], c.k1r),
            )

        final = jax.lax.while_loop(cond, body, init)
        zT_ref[:] = final.z
        accT_ref[:] = final.acc
        st_ref[0, 0] = final.steps
        st_ref[0, 1] = final.accepted

    return kernel


def _vmem_estimate(tab: ButcherTableau, dz: int, hidden: int, B: int, nacc: int) -> int:
    """Rough live working-set bound (f32 bytes) for the budget guard."""
    rows = (tab.num_stages + 4) * (dz + nacc) + 6 * hidden + 2 * dz
    return 4 * B * rows


def _run_solve_kernel(
    tab: ButcherTableau,
    *,
    train: bool,
    norm_z: bool,
    norm_j: bool,
    rtol: float,
    atol: float,
    max_steps: int,
    interpret: bool,
    w1,
    b1,
    w2,
    b2,
    z0,
    eps,
    t0,
    t1,
    dt_init,
):
    """Launch the megakernel.  z0/eps are (B, dz) batch-major; transposition
    to the kernel's (rows, B) layout happens here (one cheap relayout per
    solve)."""
    B, dz = z0.shape
    H = w1.shape[1]
    nacc = 3 if train else 1
    n_elems = B * (dz + nacc)

    kernel = _make_solve_kernel(
        tab,
        train=train,
        norm_z=norm_z,
        norm_j=norm_j,
        rtol=rtol,
        atol=atol,
        max_steps=max_steps,
        n_elems=n_elems,
    )

    ts = jnp.stack(
        [
            jnp.asarray(t0, jnp.float32),
            jnp.asarray(t1, jnp.float32),
            jnp.asarray(dt_init, jnp.float32),
            jnp.asarray(0.0, jnp.float32),
        ]
    ).reshape(1, 4)

    vspec = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    inputs = [ts, z0.T]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM), vspec()]
    if train:
        inputs.append(eps.T)
        in_specs.append(vspec())
    inputs += [w1, b1.reshape(H, 1), w2, b2.reshape(dz, 1)]
    in_specs += [vspec(), vspec(), vspec(), vspec()]

    zT_t, accT, stats = pl.pallas_call(
        kernel,
        in_specs=in_specs,
        out_specs=[
            vspec(),
            vspec(),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((dz, B), jnp.float32),
            jax.ShapeDtypeStruct((nacc, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 2), jnp.int32),
        ],
        interpret=interpret,
    )(*inputs)
    return zT_t.T, accT, stats[0, 0], stats[0, 1]


def make_full_solve(
    icnf,
    mode: Mode,
    batch: int,
) -> Optional[Callable]:
    """Build a flat-state full-solve callable for `ode/solve.odeint_with_stats`,
    or None when the megakernel does not apply.

    Eligibility: opted in via `compute_mode.fused`; unconditional 2-layer
    tanh-MLP net; no passive augmentation; adaptive FSAL method with an
    embedded error estimate; TRAIN additionally requires VJP mode with K=1
    (the kernel's Hutchinson math).  The flat layout is the `ravel_pytree`
    order of TrainState/TestState: [z.ravel() | dlogp | (reg_e | reg_n)].
    """
    if not _HAS_PALLAS:
        return None
    from .fused_dynamics import supports_fusion

    cm = icnf.compute_mode
    opts = icnf.solver
    if not cm.fused or not supports_fusion(icnf.nn):
        return None
    if icnf.aug_passive and icnf.n_aug_input:
        return None
    if opts.fixed_num_steps is not None:
        return None
    tab = TABLEAUS[opts.method]
    if tab.btilde is None or not tab.fsal:
        return None
    if mode == Mode.TRAIN:
        from ..types import ADMode

        if cm.ad != ADMode.VJP or cm.num_probes != 1:
            return None
    if icnf.dtype != jnp.float32:
        return None
    dz = icnf.zdim
    hidden = icnf.nn.layers[0].out_dim
    nacc = 3 if mode == Mode.TRAIN else 1
    if _vmem_estimate(tab, dz, hidden, batch, nacc) > _VMEM_BUDGET_BYTES:
        return None

    train = mode == Mode.TRAIN
    norm_z = icnf.lam1 != 0.0
    norm_j = icnf.lam2 != 0.0
    interpret = jax.default_backend() != "tpu"
    B = batch

    from .fused_dynamics import _reference_impl, exact_tanh_mlp_trace

    def plain_f_flat(t, yf, ps, eps):
        """Plain-XLA flat field — used only for the Hairer initial-dt pick
        (two evals per solve)."""
        z = yf[: B * dz].reshape(B, dz)
        (p1, p2) = ps
        if train:
            y, tr, e_rate, n_rate = _reference_impl(
                p1["w"], p1["b"], p2["w"], p2["b"], z, eps[0]
            )
            rates = [
                -tr,
                e_rate if norm_z else jnp.zeros_like(tr),
                n_rate if norm_j else jnp.zeros_like(tr),
            ]
        else:
            y, tr = exact_tanh_mlp_trace(ps, z)
            rates = [-tr]
        return jnp.concatenate([y.ravel()] + rates)

    def full_solve(y0f, t0, t1, args):
        from ..ode.solve import SolveStats, _initial_step_size

        ps = args["ps"]
        eps = args.get("eps")
        (p1, p2) = ps
        t0 = jnp.asarray(t0, jnp.float32)
        t1 = jnp.asarray(t1, jnp.float32)
        tdir = jnp.sign(t1 - t0)
        span = jnp.abs(t1 - t0)

        nfe_init = 1
        if opts.dt0 is None:
            f0 = plain_f_flat(t0, y0f, ps, eps)
            dt_init = _initial_step_size(
                lambda t, yf: plain_f_flat(t, yf, ps, eps),
                t0,
                y0f,
                f0,
                tdir,
                tab.order,
                opts.rtol,
                opts.atol,
                span,
            )
            nfe_init = 2
        else:
            dt_init = tdir * jnp.abs(jnp.asarray(opts.dt0, jnp.float32))

        z0 = y0f[: B * dz].reshape(B, dz)
        zT, accT, steps, accepted = _run_solve_kernel(
            tab,
            train=train,
            norm_z=norm_z,
            norm_j=norm_j,
            rtol=opts.rtol,
            atol=opts.atol,
            max_steps=opts.max_steps,
            interpret=interpret,
            w1=p1["w"],
            b1=p1["b"],
            w2=p2["w"],
            b2=p2["b"],
            z0=z0,
            eps=eps[0] if train else None,
            t0=t0,
            t1=t1,
            dt_init=dt_init,
        )
        yTf = jnp.concatenate([zT.ravel()] + [accT[i] for i in range(accT.shape[0])])
        nfe_per = tab.num_stages - 1  # FSAL
        stats = SolveStats(
            steps=steps, accepted=accepted, nfe=steps * nfe_per + nfe_init
        )
        return yTf, stats

    return full_solve


__all__ = ["make_full_solve"]
