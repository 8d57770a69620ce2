"""Recipe wall-time: fused megakernel vs unfused XLA, end-to-end `fit`.

Round-4 verdict item 2 'done' condition: the three previously-unfused
quality recipes (beta_unaugmented, toy2d, conditional_gaussian) must be
measurably faster end-to-end on the fused path.  Runs each recipe's literal
model/config for a FIXED reduced epoch count both ways and reports the
walls (quality is covered separately by the committed gate runs).

Run on the chip: python experiments/recipe_walltime_r5.py [--epochs 60]
"""
import argparse, json, sys, time
sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cnf_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

from continuousnf_tpu import recipes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    key = jax.random.PRNGKey(0)
    out = {"epochs": args.epochs, "backend": jax.default_backend()}
    for name, fn, kw in [
        ("beta_unaugmented", recipes.beta_unaugmented, dict(n_epochs=args.epochs)),
        ("toy2d_moons", recipes.toy2d, dict(n_epochs=args.epochs)),
        ("conditional_gaussian", recipes.conditional_gaussian, dict(n_epochs=args.epochs)),
    ]:
        row = {}
        for fused in (False, True):
            # Full warm pass first: fit's time-adaptive epoch chunking
            # compiles each power-of-two scan length it visits, and for the
            # fused path each embeds a Mosaic megakernel compile — a 1-epoch
            # warmup only covers chunk=1 and the first timed run measured
            # compiles, not steps (observed 212s vs 16s steady-state).  Run
            # the identical fit once untimed, then time the second run
            # (every chunk length cached).
            fn(key, fused=fused, **kw)
            t0 = time.time()
            result = fn(key, fused=fused, **kw)
            row["fused_s" if fused else "xla_s"] = round(time.time() - t0, 2)
            if isinstance(result, tuple) and hasattr(result[0], "losses"):
                row["final_loss_" + ("fused" if fused else "xla")] = round(
                    float(result[0].losses[-1]), 4)
        row["speedup"] = round(row["xla_s"] / row["fused_s"], 2)
        out[name] = row
        print(name, row, flush=True)
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
