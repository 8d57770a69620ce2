"""Scaling-efficiency benchmark: samples/s vs number of devices.

BASELINE target: >=80% linear samples/s scaling at N>=2 workers.  With one
real chip in this environment, the multi-device path is exercised on a faked
N-device CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count), which
validates the sharding/collective structure and measures parallel efficiency
of the compiled program (CPU devices share host memory bandwidth, so treat
CPU efficiency numbers as a lower bound).

Run: python benchmarks/scaling.py [--devices 8] [--batch-per-device 512]
"""

import argparse
import json
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--batch-per-device", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import optax

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import continuousnf_tpu as cnf
    from continuousnf_tpu.parallel import (
        MeshConfig,
        make_mesh,
        make_sharded_train_step,
        shard_params,
        data_sharding,
    )

    nvars, naug = 8, 8
    n_in = nvars + naug
    nn = cnf.MLP((n_in, 3 * n_in, n_in))
    key = jax.random.PRNGKey(0)

    def throughput(n_dev: int) -> float:
        icnf = cnf.construct(
            cnf.RNODE, nn, nvars, naug, tspan=(0.0, 1.0), steer_rate=0.1, lam3=1e-2
        )
        mesh = make_mesh(MeshConfig(data=n_dev), devices=jax.devices()[:n_dev])
        B = args.batch_per_device * n_dev
        xs = jax.device_put(
            jax.random.uniform(jax.random.PRNGKey(1), (B, nvars)), data_sharding(mesh)
        )
        opt = optax.lion(1e-3)
        ps = shard_params(mesh, icnf.init(key))
        opt_state = opt.init(ps)
        step = make_sharded_train_step(icnf, opt, mesh)
        c = step(ps, opt_state, xs, key)
        float(np.asarray(c[2]))
        t0 = time.perf_counter()
        cc = (c[0], c[1])
        for i in range(args.iters):
            out = step(cc[0], cc[1], xs, jax.random.fold_in(key, i))
            cc = (out[0], out[1])
        float(np.asarray(out[2]))
        dt = (time.perf_counter() - t0) / args.iters
        return B / dt

    results = {}
    base = None
    n = 1
    while n <= args.devices:
        sps = throughput(n)
        if base is None:
            base = sps
        eff = sps / (base * n)
        results[n] = {"samples_per_sec": round(sps, 1), "efficiency": round(eff, 3)}
        print(f"devices={n}: {sps:,.0f} samples/s  efficiency={eff:.1%}", flush=True)
        n *= 2

    print(json.dumps({"scaling": results}))


if __name__ == "__main__":
    main()
