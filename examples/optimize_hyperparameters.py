#!/usr/bin/env python
"""Checkpointable GP hyperparameter optimization (mirrors reference
`notebooks/optimize_hyperparameters.ipynb` -> `gp_minimize_fixed` +
`cross_validate`).

Each evaluation k-fold cross-validates a model built from the sampled
hyperparameters; the skopt-style state is checkpointed every iteration so a
killed run resumes exactly where it stopped (rerun the same command).
Equivalent CLI: `bcnf-tpu hpo -d data/train.pkl -o results/hpo`.

Usage:
    python examples/optimize_hyperparameters.py -d data/train.pkl \
        -o results/hpo --n-calls 25 [--n-samples 1000]
"""

from __future__ import annotations

import argparse
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/bcnf_tpu_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-d", "--data", required=True, help="Training dataset pickle")
    ap.add_argument("-o", "--output-dir", required=True)
    ap.add_argument("--n-calls", type=int, default=25)
    ap.add_argument("--n-initial-points", type=int, default=8)
    ap.add_argument("--n-splits", type=int, default=3)
    ap.add_argument("--n-epochs", type=int, default=60)
    ap.add_argument("--n-samples", type=int, default=1000, help="Subset of the dataset to CV on")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from bcnf_tpu.hpo.driver import run_hpo

    run_hpo(
        args.data, args.output_dir,
        n_calls=args.n_calls, n_initial_points=args.n_initial_points,
        n_splits=args.n_splits, n_epochs=args.n_epochs,
        n_samples=args.n_samples, seed=args.seed,
    )


if __name__ == "__main__":
    main()
