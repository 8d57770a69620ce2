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
    # Measured per-step wall time on the real chip (bench.py train_step_ms)
    # used for the communication-model efficiency projection.
    ap.add_argument("--step-ms-tpu", type=float, default=14.4)
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

    # Wall-clock on a faked CPU mesh is bounded by physical cores, not by the
    # program: with C cores, N forced devices time-share and the measurable
    # ceiling is min(C/N, 1).  The hardware-independent scaling picture is the
    # communication-volume model (the scaling-book method): data-parallel CNF
    # training all-reduces only the gradient pytree once per step, so
    #   t_comm ~= 2 * param_bytes / ici_bw      (ring all-reduce)
    #   efficiency ~= t_compute / (t_compute + t_comm)
    # with t_compute the measured per-step time on the real chip (BENCH).
    icnf = cnf.construct(cnf.RNODE, nn, nvars, naug)
    n_params = sum(x.size for x in jax.tree.leaves(icnf.init(key)))
    param_bytes = n_params * 4
    ici_bw = 4.5e10  # bytes/s per link, v5e ICI (conservative single-link)
    dcn_bw = 2.5e9  # bytes/s per host NIC share (conservative)
    t_step = args.step_ms_tpu * 1e-3
    proj = {}
    for name, bw, lat in (("ici", ici_bw, 1e-6), ("dcn", dcn_bw, 25e-6)):
        t_comm = 2.0 * param_bytes / bw + lat
        proj[name] = round(t_step / (t_step + t_comm), 6)
    out = {
        "scaling_measured_cpu": results,
        "host_physical_cores": os.cpu_count(),
        "note": (
            "CPU-mesh wall clock is core-bound (ceiling min(cores/N,1)); the "
            "projection uses measured TPU step time + all-reduce volume."
        ),
        "params": n_params,
        "allreduce_bytes_per_step": 2 * param_bytes,
        "tpu_step_ms": args.step_ms_tpu,
        "projected_efficiency": proj,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
