#!/usr/bin/env python
"""Analyze a (possibly in-progress) HPO run: convergence curve + top points.

Mirrors the reference's `notebooks/analyze_hyperparameters.ipynb`, which loads
the skopt checkpoint / result CSVs (`results/hyperparameters/stage_*.csv`) and
inspects the best hyperparameter points. Here the artifact is the
per-iteration checkpoint written by `bcnf_tpu.hpo.gp_minimize_fixed`
(`hpo_checkpoint.pkl`), so the analysis works on live runs too.

Usage: python examples/analyze_hyperparameters.py -o <hpo_output_dir> [-k 5]
Writes <hpo_output_dir>/convergence.png and prints the top-k points.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

# Search-space column names must match bcnf_tpu/hpo/driver.py's `space`.
PARAM_NAMES = ["n_blocks", "nested_width", "n_nested_layers", "n_conditions", "lr", "dropout"]


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-o", "--hpo-dir", required=True,
                        help="Directory containing hpo_checkpoint.pkl (the `bcnf-tpu hpo` output dir)")
    parser.add_argument("-k", "--top-k", type=int, default=5)
    args = parser.parse_args()

    from bcnf_tpu.hpo.gp_minimize import load_checkpoint

    state = load_checkpoint(os.path.join(args.hpo_dir, "hpo_checkpoint.pkl"))
    if state is None:
        raise SystemExit(f"No hpo_checkpoint.pkl in {args.hpo_dir}")
    x_iters = state["x_iters"]
    func_vals = np.asarray(state["func_vals"], dtype=float)
    n = len(func_vals)
    print(f"{n} evaluations")

    order = np.argsort(func_vals)[: args.top_k]
    rows = []
    for rank, i in enumerate(order):
        point = dict(zip(PARAM_NAMES, x_iters[i]))
        rows.append({"rank": rank + 1, "iteration": int(i),
                     "cv_val_loss": float(func_vals[i]), **point})
        print(f"#{rank + 1}  iter {i:3d}  CV val loss {func_vals[i]:9.3f}  {point}")

    # convergence curve: running best vs iteration
    running_best = np.minimum.accumulate(func_vals)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(np.arange(n), func_vals, "o", ms=4, alpha=0.5, label="evaluation")
    ax.plot(np.arange(n), running_best, "-", lw=2, label="running best")
    ax.set_xlabel("iteration")
    ax.set_ylabel("CV val loss")
    ax.set_title("HPO convergence")
    ax.legend()
    fig.tight_layout()
    out_png = os.path.join(args.hpo_dir, "convergence.png")
    fig.savefig(out_png, dpi=150)
    print(f"wrote {out_png}")

    with open(os.path.join(args.hpo_dir, "top_points.json"), "w") as f:
        json.dump(rows, f, indent=2)

    # full evaluated-points table, mirroring the reference's committed
    # search-stage CSVs (reference `results/hyperparameters/stage_1.csv`)
    out_csv = os.path.join(args.hpo_dir, "points.csv")
    with open(out_csv, "w") as f:
        f.write(",".join(["iteration", *PARAM_NAMES, "cv_val_loss"]) + "\n")
        for i, (x, v) in enumerate(zip(x_iters, func_vals)):
            f.write(",".join([str(i), *[repr(c) for c in x], repr(float(v))]) + "\n")
    print(f"wrote {out_csv} ({n} rows)")


if __name__ == "__main__":
    main()
