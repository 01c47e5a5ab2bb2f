#!/usr/bin/env python
"""Resimulation posterior-predictive check (mirrors reference
`notebooks/resimulation.ipynb`).

Samples M posterior parameter draws per test trajectory, re-runs the
on-device simulator for every draw, and reports trajectory MSE and
point-of-impact error, with overlay / impact-heatmap figures.

Usage:
    python examples/resimulation.py -m models/out/trajectory_LSTM_small \
        -d data/test.pkl -o results/resim [--m-samples 1000]
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
    ap.add_argument("-M", "--m-samples", type=int, default=1000,
                    help="Posterior draws per trajectory (reference protocol: 1000)")
    ap.add_argument("--max-points", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from bcnf_tpu import CondRealNVP
    from bcnf_tpu.config import load_config
    from bcnf_tpu.plots.eval_plots import plot_impact_heatmap, plot_resimulation
    from bcnf_tpu.simulation.resimulation import impact_points, resimulate
    from bcnf_tpu.train.data import TrainerDataHandler
    from bcnf_tpu.utils.io import load_data
    from bcnf_tpu.utils.misc import get_data_type

    with open(os.path.join(args.model_dir, "config.json")) as f:
        config = load_config(json.load(f)["config_path"])
    model = CondRealNVP.from_config(config)
    with open(os.path.join(args.model_dir, "params.pkl"), "rb") as f:
        params = jax.tree.map(jnp.asarray, pickle.load(f))

    cfg = {k.lower(): v for k, v in config.items()}
    cfg["data"] = dict(cfg["data"])
    cfg["data"]["path"] = args.data
    y, conditions = TrainerDataHandler().get_data_for_training(
        cfg, model.parameter_index_mapping, get_data_type(config["global"]["dtype"])
    )
    conditions = [jnp.asarray(c[: args.max_points]) for c in conditions]
    data_dict = load_data(args.data, keep_output_type=cfg["data"]["output_type"])
    data_dict = {k: np.asarray(v)[: args.max_points] for k, v in data_dict.items()}

    X_resim = resimulate(
        model, params, cfg["data"]["T"], cfg["data"]["dt"], data_dict,
        None, *conditions, m_samples=args.m_samples, key=jax.random.key(args.seed),
    )  # (N, M, T, 3)
    X_true = np.asarray(data_dict["trajectories"])

    finite = np.isfinite(X_resim).all(axis=(2, 3))  # (N, M)
    err = np.where(finite[..., None, None], X_resim - X_true[:, None], np.nan)
    per_step_mse = np.nanmedian(np.nansum(err**2, axis=-1), axis=1)  # (N, T)
    poi_r = impact_points(X_resim)  # (N, M, 3)
    poi_t = impact_points(X_true)  # (N, 3)
    poi_err = np.linalg.norm(np.nanmedian(poi_r, axis=1) - poi_t, axis=-1)

    os.makedirs(args.output_dir, exist_ok=True)
    np.save(os.path.join(args.output_dir, "X_resim.npy"), X_resim)
    plot_resimulation(X_true, X_resim).savefig(
        os.path.join(args.output_dir, "trajectories.png"), dpi=120
    )
    plot_impact_heatmap(poi_r, poi_t).savefig(
        os.path.join(args.output_dir, "impact_heatmap.png"), dpi=120
    )
    report = {
        "m_samples": args.m_samples,
        "n_points": int(X_true.shape[0]),
        "finite_fraction": float(finite.mean()),
        "median_trajectory_mse": float(np.nanmean(per_step_mse)),
        "median_impact_error": float(np.nanmedian(poi_err)),
    }
    with open(os.path.join(args.output_dir, "summary.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
