#!/usr/bin/env python
"""Calibration-aware checkpoint selection.

The round-5 calibration ladder (docs/CALIBRATION.md) shows rank calibration
degrades monotonically with posterior sharpness past a point: training a flow
to full lr decay minimizes NLL but over-sharpens the identified dims
(amortization bias below the observation-noise floor), pushing the scaled CDF
residuals out of band. The calibration-optimal model is therefore an
*intermediate checkpoint*, selected on the rank-calibration criterion itself —
the same quantity the reference's calibration notebook reports
(reference `notebooks/calibration.ipynb` cells 21-24,
`src/bcnf/eval/calibration.py:20-71`).

Usage:
  python scripts/select_calibration_checkpoint.py -m <model_dir> -d <test.pkl>
      [-M 2000] [--max-points 200] [--every 1]

Scans <model_dir>/ckpts/online_*.pkl, quick-evaluates the max non-degenerate
scaled CDF residual per checkpoint, writes <model_dir>/calibration_select.json,
and exports the winner as <model_dir>_calibselect/ (params.pkl + config.json)
ready for the full-protocol `bcnf-tpu eval`.
"""

from __future__ import annotations

import argparse
import json
import os
import pickle
import re
import shutil
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/bcnf_tpu_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-m", "--model-dir", required=True,
                        help="Online-trained model dir containing ckpts/online_*.pkl + config.json")
    parser.add_argument("-d", "--data", required=True, help="Test dataset pickle")
    parser.add_argument("-M", "--m-samples", type=int, default=2000,
                        help="Posterior samples per point for the quick rank scan")
    parser.add_argument("--max-points", type=int, default=200)
    parser.add_argument("--every", type=int, default=1, help="Scan every k-th checkpoint")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from bcnf_tpu import CondRealNVP
    from bcnf_tpu.config import load_config
    from bcnf_tpu.eval.calibration import compute_CDF_residuals, compute_y_hat_ranks
    from bcnf_tpu.train.checkpoint import load_checkpoint
    from bcnf_tpu.train.data import TrainerDataHandler
    from bcnf_tpu.utils.misc import get_data_type, inn_nll_loss

    with open(os.path.join(args.model_dir, "config.json")) as f:
        config_path = json.load(f)["config_path"]
    config = load_config(config_path)
    model = CondRealNVP.from_config(config)

    cfg = {k.lower(): v for k, v in config.items()}
    cfg["data"] = dict(cfg["data"])
    cfg["data"]["path"] = args.data
    handler = TrainerDataHandler()
    y, conditions = handler.get_data_for_training(
        cfg, model.parameter_index_mapping, get_data_type(config["global"]["dtype"])
    )
    y = y[: args.max_points]
    conditions = [c[: args.max_points] for c in conditions]
    degenerate = np.asarray(np.asarray(y).std(axis=0) < 1e-12)
    names = list(model.parameter_index_mapping.parameters)

    ckpt_dir = os.path.join(args.model_dir, "ckpts")
    ckpts = sorted(
        (int(re.match(r"online_(\d+)\.pkl$", f).group(1)), os.path.join(ckpt_dir, f))
        for f in os.listdir(ckpt_dir) if re.match(r"online_(\d+)\.pkl$", f)
    )[:: args.every]
    if not ckpts:
        raise SystemExit(f"no online_*.pkl checkpoints in {ckpt_dir}")
    print(f"scanning {len(ckpts)} checkpoints, M={args.m_samples}, N={len(y)}")

    rows = []
    for step, path in ckpts:
        params = jax.tree.map(jnp.asarray, load_checkpoint(path)["params"])
        nll = float(np.mean([
            np.asarray(inn_nll_loss(*model.forward(
                params, jnp.asarray(y[b: b + 256]),
                *[jnp.asarray(c[b: b + 256]) for c in conditions])))
            for b in range(0, len(y), 256)
        ]))
        ranks = compute_y_hat_ranks(
            model, params, jnp.asarray(y), *[jnp.asarray(c) for c in conditions],
            M_samples=args.m_samples, key=jax.random.key(args.seed),
        )
        _, resid, _ = compute_CDF_residuals(ranks, args.m_samples)
        per_dim = np.abs(resid).max(axis=1)
        max_nondegen = float(per_dim[~degenerate].max())
        rows.append({
            "step": step, "test_nll": round(nll, 3),
            "max_scaled_cdf_residual": round(max_nondegen, 4),
            "residual_by_dim": {n: round(float(v), 3) for n, v in zip(names, per_dim)},
        })
        print(f"step {step:>8}: NLL {nll:8.2f}  max residual {max_nondegen:.3f}")

    best = min(rows, key=lambda r: r["max_scaled_cdf_residual"])
    out = {
        "criterion": "min max non-degenerate scaled CDF residual "
                     f"(quick scan, M={args.m_samples}, N={len(y)})",
        "selected_step": best["step"],
        "selected_max_residual": best["max_scaled_cdf_residual"],
        "selected_test_nll": best["test_nll"],
        "scan": rows,
    }
    report_path = os.path.join(args.model_dir, "calibration_select.json")
    with open(report_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {report_path}; best step {best['step']} "
          f"(residual {best['max_scaled_cdf_residual']:.3f} @ NLL {best['test_nll']:.1f})")

    # export winner as an eval-ready model dir
    export = args.model_dir.rstrip("/") + "_calibselect"
    os.makedirs(export, exist_ok=True)
    params = load_checkpoint(dict(ckpts)[best["step"]])["params"]
    with open(os.path.join(export, "params.pkl"), "wb") as f:
        pickle.dump(jax.tree.map(np.asarray, params), f)
    shutil.copyfile(os.path.join(args.model_dir, "config.json"),
                    os.path.join(export, "config.json"))
    with open(os.path.join(export, "selection.json"), "w") as f:
        json.dump({"source": args.model_dir, "step": best["step"],
                   "criterion": out["criterion"]}, f, indent=2)
    print(f"exported {export}")


if __name__ == "__main__":
    main()
