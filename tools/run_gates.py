"""Run the density-quality gates and write REGRESSION.md.

Usage: python tools/run_gates.py [--fast] [--cpu]
"""
import argparse
import sys
import time

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
    lines = [
        "# REGRESSION — density-quality gates vs analytic pdfs",
        "",
        f"Backend: {jax.default_backend()}  |  gate: mad/msd/tv <= 0.1 "
        "(reference `test/regression_tests.jl:46-48`)",
        "",
    ]
    ok = True
    t0 = time.time()

    def record(title: str, rep, gated: bool = True):
        nonlocal ok
        status = "PASS" if rep.passes() else "FAIL"
        if gated:
            ok = ok and (rep.passes() or args.fast)
        lines.append(f"## {title} ({rep.epochs} epochs, {rep.wall_time_s:.0f}s)")
        lines.append(
            f"mad={rep.mad:.4f} msd={rep.msd:.4f} tv={rep.tv:.4f} -> **{status}**"
        )
        lines.append("")
        print(lines[-3])
        print(lines[-2], flush=True)

    _, rep = recipes.beta_unaugmented(key, n_epochs=200 if args.fast else 800)
    record("Beta(2,4) 1D, RNODE naug=0", rep)

    _, rep2 = recipes.beta_readme(key, max_epochs=100 if args.fast else 300, stabilize=True)
    record("Beta(2,4) README config, naug=1 passive augmentation (stabilized)", rep2)

    _, rep3 = recipes.beta_readme(key, max_epochs=100 if args.fast else 300, stabilize=False)
    record(
        "Beta(2,4) README config, naug=1 literal transported augmentation "
        "(degenerate objective; grid-normalized best checkpoint — reported, not gated)",
        rep3,
        gated=False,
    )

    _, rep4 = recipes.conditional_gaussian(key, n_epochs=100 if args.fast else 400)
    record("Conditional Gaussian, CondRNODE (ICNFDist-style p(x|y) vs analytic)", rep4)

    for ds in ["moons", "circles"]:
        _, ll = recipes.toy2d(key, ds, n_epochs=50 if args.fast else 300)
        lines.append(f"## 2D {ds}, FFJORD naug=0: mean test log-likelihood = {ll:.3f}")
        lines.append("")
        print(lines[-2], flush=True)

    lines.append(
        "Notes: the literal transported-augmentation objective is unbounded "
        "(the augmented conditional concentrates without limit; the lambda "
        "regularizers add only a linear cost in log-concentration), so its "
        "slice estimate is reported with normalization + checkpoint selection "
        "but not gated — see `continuousnf_tpu/recipes.py` for the analysis. "
        "The reference's own regression comparison is shape-inconsistent "
        "(1024-vector vs 8x1024 matrix, `test/regression_tests.jl:40-44`)."
    )
    lines.append("")
    lines.append(f"Total wall time: {time.time()-t0:.0f}s")
    with open("REGRESSION.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote REGRESSION.md; overall:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
