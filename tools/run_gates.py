"""Run the density-quality gates and write REGRESSION.md.

Usage: python tools/run_gates.py [--fast]
Run on TPU (default env) or CPU (set platform via jax.config before import).
"""
import argparse, sys, time

import jax
import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="reduced epochs (smoke)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from continuousnf_tpu import recipes

    key = jax.random.PRNGKey(1)
    lines = ["# REGRESSION — density-quality gates vs analytic pdfs", "",
             f"Backend: {jax.default_backend()}  |  gate: mad/msd/tv <= 0.1 "
             "(reference `test/regression_tests.jl:46-48`)", ""]
    ok = True

    n_epochs = 150 if args.fast else 600
    t0 = time.time()
    _, rep = recipes.beta_unaugmented(key, n_epochs=n_epochs)
    status = "PASS" if rep.passes() else "FAIL"
    ok &= rep.passes() or args.fast
    lines.append(f"## Beta(2,4) 1D, RNODE naug=0 ({rep.epochs} epochs, {rep.wall_time_s:.0f}s)")
    lines.append(f"mad={rep.mad:.4f} msd={rep.msd:.4f} tv={rep.tv:.4f} -> **{status}**")
    lines.append("")
    print(lines[-3]); print(lines[-2], flush=True)

    max_epochs = 100 if args.fast else 300
    _, rep2 = recipes.beta_readme(key, max_epochs=max_epochs)
    status2 = "PASS" if rep2.passes() else "FAIL"
    ok &= rep2.passes() or args.fast
    lines.append(f"## Beta(2,4) README config (naug=1, slice-norm early stop, {rep2.epochs} epochs, {rep2.wall_time_s:.0f}s)")
    lines.append(f"mad={rep2.mad:.4f} msd={rep2.msd:.4f} tv={rep2.tv:.4f} -> **{status2}**")
    lines.append("")
    print(lines[-3]); print(lines[-2], flush=True)

    for ds in ["moons", "circles"]:
        _, ll = recipes.toy2d(key, ds, n_epochs=50 if args.fast else 300)
        lines.append(f"## 2D {ds}, FFJORD naug=0: mean test log-likelihood = {ll:.3f}")
        lines.append("")
        print(lines[-2], flush=True)

    lines.append(f"Total wall time: {time.time()-t0:.0f}s")
    with open("REGRESSION.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote REGRESSION.md; overall:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
