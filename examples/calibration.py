#!/usr/bin/env python
"""Calibration workflow (mirrors reference `notebooks/calibration.ipynb`).

Loads a trained model, draws M posterior samples per test point, computes
rank statistics and CDF residuals, and writes the diagnostic figures.

Usage:
    python examples/calibration.py -m models/out/trajectory_LSTM_small \
        -d data/test.pkl -o results/calibration [--m-samples 10000]
"""

from __future__ import annotations

import argparse
import json
import os
import pickle

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/bcnf_tpu_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model-dir", required=True, help="Directory with params.pkl + config.json")
    ap.add_argument("-d", "--data", required=True, help="Test dataset pickle")
    ap.add_argument("-o", "--output-dir", required=True)
    ap.add_argument("-M", "--m-samples", type=int, default=10_000,
                    help="Posterior samples per test point (reference protocol: 10,000)")
    ap.add_argument("--max-points", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from bcnf_tpu import CondRealNVP
    from bcnf_tpu.config import load_config
    from bcnf_tpu.eval.calibration import compute_CDF_residuals, compute_y_hat_ranks
    from bcnf_tpu.plots.eval_plots import plot_cdf_residuals, plot_rank_histograms
    from bcnf_tpu.train.data import TrainerDataHandler
    from bcnf_tpu.utils.misc import get_data_type

    with open(os.path.join(args.model_dir, "config.json")) as f:
        config = load_config(json.load(f)["config_path"])
    model = CondRealNVP.from_config(config)
    with open(os.path.join(args.model_dir, "params.pkl"), "rb") as f:
        params = jax.tree.map(jnp.asarray, pickle.load(f))

    cfg = {k.lower(): v for k, v in config.items()}
    cfg["data"]["path"] = args.data
    y, conditions = TrainerDataHandler().get_data_for_training(
        cfg, model.parameter_index_mapping, get_data_type(config["global"]["dtype"])
    )
    y = jnp.asarray(y[: args.max_points])
    conditions = [jnp.asarray(c[: args.max_points]) for c in conditions]

    ranks = compute_y_hat_ranks(
        model, params, y, *conditions,
        M_samples=args.m_samples, key=jax.random.key(args.seed),
    )
    names = list(model.parameter_index_mapping.parameters)
    os.makedirs(args.output_dir, exist_ok=True)
    np.save(os.path.join(args.output_dir, "ranks.npy"), ranks)

    fig = plot_rank_histograms(ranks, args.m_samples, names)
    fig.savefig(os.path.join(args.output_dir, "rank_histograms.png"), dpi=120)

    t, residuals, ci = compute_CDF_residuals(ranks, args.m_samples)
    fig = plot_cdf_residuals(t, residuals, names)
    fig.savefig(os.path.join(args.output_dir, "cdf_residuals.png"), dpi=120)

    # fraction of per-parameter residual curves inside the Brownian-bridge CI
    inside = float(np.mean(np.abs(residuals) <= ci[None, :]))
    with open(os.path.join(args.output_dir, "summary.json"), "w") as f:
        json.dump({"m_samples": args.m_samples, "n_points": int(y.shape[0]),
                   "fraction_within_ci": inside}, f, indent=2)
    print(f"ranks {ranks.shape}; {inside:.1%} of CDF residuals within the 99% bridge CI")
    print(f"wrote figures + summary to {args.output_dir}")


if __name__ == "__main__":
    main()
