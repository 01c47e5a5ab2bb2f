#!/usr/bin/env python
"""Checkpointable GP hyperparameter optimization (mirrors reference
`notebooks/optimize_hyperparameters.ipynb` -> `gp_minimize_fixed` +
`cross_validate`).

Each evaluation k-fold cross-validates a model built from the sampled
hyperparameters; the skopt-style state is checkpointed every iteration so a
killed run resumes exactly where it stopped (rerun the same command).

Usage:
    python examples/optimize_hyperparameters.py -d data/train.pkl \
        -o results/hpo --n-calls 25 [--n-samples 1000]
"""

from __future__ import annotations

import argparse
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/bcnf_tpu_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


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

    from bcnf_tpu.config import ParameterIndexMapping
    from bcnf_tpu.eval.crossvalidate import cross_validate
    from bcnf_tpu.hpo import Integer, Real, gp_minimize_fixed
    from bcnf_tpu.models import (
        CondRealNVP,
        ConcatenateCondition,
        FeatureNetworkStack,
        LSTMFeatureNetwork,
    )
    from bcnf_tpu.utils.io import load_data

    data = load_data(args.data)
    params_names = [
        "x0_x", "x0_y", "x0_z", "v0_x", "v0_y", "v0_z", "g",
        "w_x", "w_y", "w_z", "b", "m", "a_x", "a_y", "a_z", "r", "A", "Cd", "rho",
    ]
    pim = ParameterIndexMapping(params_names)
    y = np.asarray(pim.vectorize(data), dtype=np.float32)[: args.n_samples]
    trajectories = np.asarray(data["trajectories"], dtype=np.float32)[: args.n_samples]

    # Search space: the reference's stage-1 space shape
    # (results/hyperparameters/stage_1.csv columns).
    space = [
        Integer(6, 32, name="n_blocks"),
        Integer(16, 256, name="nested_width"),
        Integer(2, 6, name="n_nested_layers"),
        Integer(32, 256, name="n_conditions"),
        Real(1e-4, 3e-3, prior="log-uniform", name="lr"),
        Real(0.0, 0.5, name="dropout"),
    ]

    def objective(x: list) -> float:
        n_blocks, width, depth, n_cond, lr, dropout = x

        def factory() -> CondRealNVP:
            stack = FeatureNetworkStack([
                ConcatenateCondition(input_size=None, output_size=3),
                LSTMFeatureNetwork(
                    input_size=3, hidden_size=48, output_size=int(n_cond),
                    num_layers=1, bidirectional=True, pooling="mean",
                ),
            ])
            return CondRealNVP(
                size=len(params_names),
                nested_sizes=[int(width)] * int(depth),
                n_blocks=int(n_blocks),
                n_conditions=int(n_cond),
                feature_network_stack=stack,
                act_norm=True,
                dropout=float(dropout),
                random_state=args.seed,
            )

        folds = cross_validate(
            factory, y, [trajectories],
            n_splits=args.n_splits, n_epochs=args.n_epochs,
            batch_size=128, lr=float(lr),
            random_state=args.seed, errors="return",
        )
        losses = [f["val_loss"] for f in folds if np.isfinite(f.get("val_loss", np.inf))]
        score = float(np.mean(losses)) if losses else 1e6  # diverged -> bad point
        print(f"x={x} -> CV val loss {score:.3f} ({len(losses)}/{args.n_splits} folds ok)")
        return score

    os.makedirs(args.output_dir, exist_ok=True)
    result = gp_minimize_fixed(
        objective, space,
        n_calls=args.n_calls, n_initial_points=args.n_initial_points,
        checkpoint_file=os.path.join(args.output_dir, "hpo_checkpoint.pkl"),
        random_state=args.seed, verbose=True,
    )
    best = dict(zip([d.name for d in space], result.x))
    with open(os.path.join(args.output_dir, "best.json"), "w") as f:
        json.dump({"best_params": best, "best_val_loss": result.fun,
                   "n_evaluations": len(result.func_vals)}, f, indent=2, default=float)
    print("best:", best, "val loss:", result.fun)


if __name__ == "__main__":
    main()
