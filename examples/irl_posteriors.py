#!/usr/bin/env python
"""Posteriors from real footage (reference `notebooks/irl_posteriors.ipynb`).

Pipeline:

1. `process_video` (reference `src/bcnf/simulation/video_processing.py:52`)
   converts real camera footage into the synthetic renderer's normalized
   `(T, 90, 160)` heatmap format (background subtraction vs the time
   average, block-average downscale, double thresholding, optional
   per-frame GMM approximation).
2. The heatmap video is resampled to the model's `T = T_cfg/dt` frames and
   stacked to the trained model's `n_cams` (a single real camera is
   replicated — the reference notebook uses genuine two-camera footage,
   which this environment does not ship).
3. Camera metadata (the second condition group of `videos_*` configs) is
   taken from the prior's central values, as in the notebook's fixed
   camera-setup cells.
4. `model.sample` draws M posterior parameter sets, reported as per-parameter
   posterior means/stds and a θ-marginal figure.

Usage:
    python examples/irl_posteriors.py \
        -m ~/bcnf_models/parity_videos_CNN_LSTM_large \
        -v /root/reference/experimental/videos/Ball_Bounce_Vid.mp4 \
        -o report/irl
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-m", "--model-dir", required=True,
                        help="Trained videos_* model directory (params.pkl + config.json)")
    parser.add_argument("-v", "--video", required=True, help="Real video file (mp4/avi)")
    parser.add_argument("-o", "--output-dir", required=True)
    parser.add_argument("-M", "--m-samples", type=int, default=1000)
    parser.add_argument("--no-gmm", action="store_true",
                        help="Skip the per-frame GMM approximation step")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from bcnf_tpu import CondRealNVP
    from bcnf_tpu.config import load_config
    from bcnf_tpu.simulation.video_processing import process_video

    os.makedirs(args.output_dir, exist_ok=True)

    with open(os.path.join(args.model_dir, "config.json")) as f:
        config_path = json.load(f)["config_path"]
    config = load_config(config_path)
    model = CondRealNVP.from_config(config)
    import pickle

    with open(os.path.join(args.model_dir, "params.pkl"), "rb") as f:
        params = jax.tree.map(jnp.asarray, pickle.load(f))

    cfg = {k.lower(): v for k, v in config.items()}
    T_frames = int(round(float(cfg["data"]["T"]) / float(cfg["data"]["dt"])))
    n_cams = int(cfg["data"].get("num_cams", 2))

    # 1.+2. real video -> heatmaps at the model's frame count
    heat = process_video(args.video, use_gmm_approximation=not args.no_gmm)
    idx = np.linspace(0, len(heat) - 1, T_frames).round().astype(int)
    heat = heat[idx]  # (T, 90, 160)
    videos = np.repeat(heat[None, None], n_cams, axis=1).astype(np.float32)

    # 3. camera metadata from the prior's central values (notebook's fixed
    #    camera setup); keys per `configs/runs/dev/videos_*.yaml` group 2
    meta: list[np.ndarray] = []
    group2 = list(cfg["global"]["conditions"])[1] if len(cfg["global"]["conditions"]) > 1 else []
    defaults = {
        # one azimuth per camera (generator emits `cam_radian_array` of
        # shape (N, n_cams), see simulation/sampling.py)
        "cam_radian": np.zeros((1, n_cams)),
        "cam_radius": np.full((1, 1), 25.0),
        "cam_angles": np.zeros((1, n_cams)),
        "cam_heights": np.full((1, n_cams), 1.0),
    }
    for key in group2:
        if key not in defaults:
            raise SystemExit(f"No default for condition key {key!r}")
        meta.append(defaults[key])
    conditions = [jnp.asarray(videos)]
    if meta:
        conditions.append(jnp.asarray(np.concatenate(meta, axis=-1), jnp.float32))

    # 4. posterior sampling
    samples = np.asarray(
        model.sample(params, jax.random.key(args.seed), args.m_samples, *conditions)
    )  # (M, 1, size)
    theta = samples[:, 0, :]
    names = list(model.parameter_index_mapping.parameters)
    stats = {
        n: {"mean": float(theta[:, i].mean()), "std": float(theta[:, i].std())}
        for i, n in enumerate(names)
    }
    report = {
        "video": args.video,
        "frames_used": int(T_frames),
        "m_samples": int(args.m_samples),
        "posterior": stats,
    }
    with open(os.path.join(args.output_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(names)
    ncols = 5
    nrows = (n + ncols - 1) // ncols
    fig, axes = plt.subplots(nrows, ncols, figsize=(3 * ncols, 2.2 * nrows))
    for i, name in enumerate(names):
        ax = axes.flat[i]
        ax.hist(theta[:, i], bins=40, density=True)
        ax.set_title(name, fontsize=9)
    for j in range(n, nrows * ncols):
        axes.flat[j].axis("off")
    fig.suptitle("Posterior marginals from real footage")
    fig.tight_layout()
    fig.savefig(os.path.join(args.output_dir, "posterior_marginals.png"), dpi=150)

    fig2, axes2 = plt.subplots(1, 4, figsize=(16, 3))
    for k, ax in enumerate(axes2):
        fi = int(k * (T_frames - 1) / 3)
        ax.imshow(heat[fi], cmap="gray")
        ax.set_title(f"frame {fi}")
        ax.axis("off")
    fig2.suptitle("Processed real-video heatmaps (process_video output)")
    fig2.savefig(os.path.join(args.output_dir, "heatmaps.png"), dpi=150)
    print(f"Report + figures in {args.output_dir}")


if __name__ == "__main__":
    main()
