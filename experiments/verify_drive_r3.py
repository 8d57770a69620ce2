"""End-to-end TPU drive for the round-3 product changes (verify recipe).

Covers: kernel-vs-XLA parity (TRAIN with shared eps, TEST), fused fallbacks,
the NEW N-layer closed-form chain Jacobian vs the generic AD path on chip,
x_jitter TRAIN/TEST semantics, and a short README-flow fit.

Run: timeout 580 python experiments/verify_drive_r3.py
"""
import dataclasses as dc
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

import continuousnf_tpu as cnf
from continuousnf_tpu import Mode


def main():
    out = {"backend": jax.default_backend()}
    key = jax.random.PRNGKey(0)

    # 1) fused megakernel vs XLA while_loop parity (TRAIN shared-eps + TEST)
    nn = cnf.MLP((16, 48, 16))
    mk = lambda fused: cnf.construct(
        cnf.RNODE, nn, 8, 8, tspan=(0.0, 13.0),
        compute_mode=cnf.VecJacMode(fused=fused))
    icnf_f, icnf_x = mk(True), mk(False)
    ps = icnf_f.init(key)
    xs = jax.random.uniform(jax.random.PRNGKey(1), (256, 8))
    eps = icnf_f.draw_eps(jax.random.PRNGKey(2), 256)
    ktr = jax.random.PRNGKey(3)
    lp_f, _, st_f = jax.jit(
        lambda p: cnf.inference(icnf_f, Mode.TRAIN, xs, p, key=ktr, eps=eps))(ps)
    lp_x, _, st_x = jax.jit(
        lambda p: cnf.inference(icnf_x, Mode.TRAIN, xs, p, key=ktr, eps=eps))(ps)
    out["train_parity_max_dlogp"] = float(jnp.max(jnp.abs(lp_f - lp_x)))
    out["train_steps_fused_vs_xla"] = [int(st_f.steps), int(st_x.steps)]
    lp_tf = jax.jit(lambda p: cnf.inference(icnf_f, Mode.TEST, xs, p)[0])(ps)
    lp_tx = jax.jit(lambda p: cnf.inference(icnf_x, Mode.TEST, xs, p)[0])(ps)
    out["test_parity_max_dlogp"] = float(jnp.max(jnp.abs(lp_tf - lp_tx)))

    # 2) NEW: 3-layer chain Jacobian TEST path vs generic AD path, on chip
    nn3 = cnf.MLP((6, 24, 24, 6))
    icnf3 = cnf.construct(cnf.RNODE, nn3, 6, 0, tspan=(0.0, 1.0))
    ps3 = icnf3.init(jax.random.PRNGKey(4))
    x6 = jax.random.uniform(jax.random.PRNGKey(5), (64, 6))
    lp_c = jax.jit(lambda p: cnf.inference(icnf3, Mode.TEST, x6, p)[0])(ps3)

    class Opaque:
        out_dim = 6
        init = staticmethod(nn3.init)
        apply = staticmethod(nn3.apply)

    icnf3g = dc.replace(icnf3, nn=Opaque())
    lp_g = jax.jit(lambda p: cnf.inference(icnf3g, Mode.TEST, x6, p)[0])(ps3)
    out["chain_jac_vs_ad_max_dlogp"] = float(jnp.max(jnp.abs(lp_c - lp_g)))

    # exact-trace TRAIN via the chain form vs generic, on chip
    icnf3t = dc.replace(icnf3, compute_mode=cnf.VecJacMode(exact_trace=True))
    icnf3tg = dc.replace(icnf3g, compute_mode=cnf.VecJacMode(exact_trace=True))
    l_c = jax.jit(lambda p: cnf.loss(icnf3t, Mode.TRAIN, x6, p, key=ktr))(ps3)
    l_g = jax.jit(lambda p: cnf.loss(icnf3tg, Mode.TRAIN, x6, p, key=ktr))(ps3)
    out["chain_jac_train_loss_delta"] = abs(float(l_c) - float(l_g))

    # 3) x_jitter: TRAIN objective perturbed, TEST identical, on chip
    icnfj = dc.replace(icnf3t, x_jitter=0.05)
    lj = jax.jit(lambda p: cnf.loss(icnfj, Mode.TRAIN, x6, p, key=ktr))(ps3)
    out["x_jitter_train_delta"] = abs(float(lj) - float(l_c))
    lp_j = jax.jit(lambda p: cnf.inference(icnfj, Mode.TEST, x6, p)[0])(ps3)
    out["x_jitter_test_delta"] = float(jnp.max(jnp.abs(lp_j - lp_c)))

    # 3b) logit input bijector: change-of-variables identity, on chip
    icnfL = dc.replace(icnf3, input_bijector="logit")
    xu = jax.random.uniform(jax.random.PRNGKey(11), (64, 6), minval=0.05, maxval=0.95)
    lp_L = jax.jit(lambda p: cnf.inference(icnfL, Mode.TEST, xu, p)[0])(ps3)
    tL = jnp.log(xu) - jnp.log1p(-xu)
    lp_raw = jax.jit(lambda p: cnf.inference(icnf3, Mode.TEST, tL, p)[0])(ps3)
    ldj = -jnp.sum(jnp.log(xu) + jnp.log1p(-xu), axis=-1)
    out["logit_cov_identity_max_err"] = float(jnp.max(jnp.abs(lp_L - (lp_raw + ldj))))
    gs = cnf.generate(icnfL, Mode.TEST, ps3, 128, key=jax.random.PRNGKey(12))
    g = np.asarray(gs)
    out["logit_generate_in_unit_box"] = bool((g > 0).all() and (g < 1).all())

    # 4) conditional + fused=True must fall back cleanly
    nnc = cnf.MLP((6, 12, 4))
    icnfc = cnf.construct(cnf.CondRNODE, nnc, 2, 2,
                          compute_mode=cnf.VecJacMode(fused=True))
    psc = icnfc.init(jax.random.PRNGKey(6))
    yc = jax.random.normal(jax.random.PRNGKey(7), (32, 2))
    xc = jax.random.uniform(jax.random.PRNGKey(8), (32, 2))
    lpc, _, _ = jax.jit(
        lambda p: cnf.inference(icnfc, Mode.TRAIN, xc, p, ys=yc, key=ktr))(psc)
    out["cond_fused_fallback_ok"] = bool(np.isfinite(np.asarray(lpc)).all())

    # 5) short end-to-end fit (README flow shrunk)
    t0 = time.time()
    import optax
    icnf_r = cnf.construct(cnf.RNODE, cnf.MLP((2, 6, 2)), 1, 1,
                           tspan=(0.0, 13.0), steer_rate=0.1, lam3=1e-2,
                           aug_noise=cnf.CALIBRATED_AUG_SIGMA,
                           compute_mode=cnf.VecJacMode(exact_trace=True))
    model = cnf.ICNFModel(icnf_r, optimizers=(optax.lion(1e-3, weight_decay=0.0),),
                          n_epochs=30, batch_size=32)
    from continuousnf_tpu.distributions import Beta

    data = Beta(2.0, 4.0).sample(jax.random.PRNGKey(9), (512, 1))
    res = cnf.fit(model, data, key=jax.random.PRNGKey(10))
    lp = jax.jit(lambda p: cnf.inference(icnf_r, Mode.TEST, data, p)[0])(res.ps)
    out["fit30_mean_logp"] = float(jnp.mean(lp))
    out["fit30_wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
