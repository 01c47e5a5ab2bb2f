"""CLI integration tests (reference `src/bcnf/__main__.py` surface + the new
subcommands), driven in-process via `bcnf_tpu.__main__.main` on the CPU
backend. A tiny run config keeps every step under a few seconds."""

import json
import os
import pickle

import jax
import numpy as np
import pytest
import yaml

from bcnf_tpu.__main__ import main

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(autouse=True)
def _root_env(monkeypatch):
    monkeypatch.setenv("BCNF_ROOT", REPO)


@pytest.fixture(scope="module")
def tiny_config(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    cfg = {
        "global": {
            "cnf_version": 2,
            "parameter_selection": ["x0_x", "x0_y", "x0_z", "v0_x", "v0_y", "v0_z",
                                    "g", "w_x", "w_y", "w_z", "b", "m",
                                    "a_x", "a_y", "a_z", "r", "A", "Cd", "rho"],
            "conditions": [["trajectories"]],
            "dtype": "float32",
        },
        "data": {
            "path": str(d / "data"),
            "config_file": "{{BCNF_ROOT}}/configs/data_prior.yaml",
            "n_samples": 96,
            "output_type": "trajectories",
            "dt": 0.1,
            "T": 0.5,
            "num_cams": 2,
            "break_on_impact": False,
            "do_filter": False,
            "verbose": False,
        },
        "model": {"kwargs": {"size": 19, "nested_sizes": [16, 16], "n_blocks": 3,
                             "n_conditions": 12, "act_norm": True,
                             "random_state": 0}},
        "feature_networks": [
            {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": 15}},
            {"type": "FullyConnected", "kwargs": {"sizes": [15, 16, 12]}},
        ],
        "optimizer": {"type": "Adam", "kwargs": {"lr": 2.0e-3}},
        "lr_scheduler": {"type": "ReduceLROnPlateau",
                         "kwargs": {"mode": "min", "factor": 0.5, "patience": 50,
                                    "threshold_mode": "abs", "threshold": 0.1}},
        "training": {"validation_split": 0.25, "val_loss_window_size": 3,
                     "val_loss_patience": 1000, "val_loss_tolerance": 0.01,
                     "val_loss_tolerance_mode": "abs", "batch_size": 32,
                     "n_epochs": 3, "timeout": None, "random_state": 0},
    }
    path = d / "tiny.yaml"
    path.write_text(yaml.safe_dump(cfg, sort_keys=False))
    return str(path), str(d)


def test_cli_size(tiny_config, capsys):
    path, _ = tiny_config
    main(["size", "-c", path])
    out = capsys.readouterr().out
    assert "Model size:" in out


def test_cli_generate(tiny_config, tmp_path):
    out_pkl = str(tmp_path / "gen.pkl")
    main(["generate", "-c", os.path.join(REPO, "configs", "data_prior.yaml"),
          "-o", out_pkl, "-n", "16", "--no-filter", "--renderer", "analytic",
          "--dt", "0.1", "-T", "0.5"])
    with open(out_pkl, "rb") as f:
        data = pickle.load(f)
    assert len(data["trajectories"]) == 16


@pytest.mark.slow
def test_cli_train_then_sample(tiny_config, tmp_path):
    path, d = tiny_config
    out_dir = str(tmp_path / "model")
    main(["train", "-c", path, "-o", out_dir, "-f"])
    assert os.path.exists(os.path.join(out_dir, "params.pkl"))
    assert os.path.exists(os.path.join(out_dir, "metrics.jsonl"))
    with open(os.path.join(out_dir, "config.json")) as f:
        assert json.load(f)["config_path"] == path

    # sample from the saved model against the generated dataset
    out_npy = str(tmp_path / "samples.npy")
    main(["sample", "-m", out_dir, "-d", os.path.join(d, "data"),
          "-n", "8", "-o", out_npy])
    s = np.load(out_npy)
    assert s.shape[0] == 8 and s.shape[2] == 19
    assert np.isfinite(s).all()


@pytest.mark.slow
def test_cli_train_online(tiny_config, tmp_path):
    path, _ = tiny_config
    out_dir = str(tmp_path / "online_model")
    main(["train", "-c", path, "-o", out_dir, "-f", "--online", "--online-steps", "30"])
    with open(os.path.join(out_dir, "config.json")) as f:
        meta = json.load(f)
    assert meta["online"] is True
    assert os.path.exists(os.path.join(out_dir, "params.pkl"))


@pytest.mark.slow
def test_cli_hpo_smoke(tiny_config, tmp_path):
    """bcnf-tpu hpo: two GP iterations over the tiny dataset, checkpoint +
    best.json written; re-invocation resumes from the checkpoint."""
    _, d = tiny_config
    out_dir = str(tmp_path / "hpo")
    args = ["hpo", "-d", os.path.join(d, "data"), "-o", out_dir,
            "--n-calls", "2", "--n-initial-points", "2",
            "--n-splits", "2", "--n-epochs", "2", "--n-samples", "64"]
    main(args)
    assert os.path.exists(os.path.join(out_dir, "hpo_checkpoint.pkl"))
    with open(os.path.join(out_dir, "best.json")) as f:
        best = json.load(f)
    assert best["n_evaluations"] >= 2
    # resume path: a third call picks up the checkpoint and adds one more
    main(args[:-10] + args[-10:-8] + ["--n-calls", "3", "--n-initial-points", "2",
         "--n-splits", "2", "--n-epochs", "2", "--n-samples", "64"])
    with open(os.path.join(out_dir, "best.json")) as f:
        assert json.load(f)["n_evaluations"] >= 3

    # stage-2 refinement: --space narrows the search bounds; every evaluated
    # point must respect them
    out2 = str(tmp_path / "hpo2")
    main(["hpo", "-d", os.path.join(d, "data"), "-o", out2,
          "--n-calls", "2", "--n-initial-points", "2",
          "--n-splits", "2", "--n-epochs", "2", "--n-samples", "64",
          "--space", json.dumps({"n_blocks": [3, 4], "nested_width": [8, 12]})])
    from bcnf_tpu.hpo.gp_minimize import load_checkpoint
    state = load_checkpoint(os.path.join(out2, "hpo_checkpoint.pkl"))
    for x in state["x_iters"]:
        assert 3 <= x[0] <= 4 and 8 <= x[1] <= 12

    with pytest.raises(ValueError, match="unknown space dimensions"):
        from bcnf_tpu.hpo.driver import run_hpo
        run_hpo(os.path.join(d, "data"), str(tmp_path / "hpo3"),
                n_calls=1, n_initial_points=1, n_splits=2, n_epochs=1,
                n_samples=32, space_bounds={"bogus": (0, 1)})


@pytest.mark.slow
def test_cli_eval_report(tiny_config, tmp_path):
    """`bcnf-tpu eval` produces the full report: NLL, per-dim calibration
    residuals with degenerate-dim exclusion, posterior diagnostics, and
    robust impact metrics."""
    path, d = tiny_config
    model_dir = str(tmp_path / "model")
    main(["train", "-c", path, "-o", model_dir, "-f"])

    out_dir = str(tmp_path / "report")
    main(["eval", "-m", model_dir, "-d", os.path.join(d, "data"),
          "-o", out_dir, "-M", "200", "--max-points", "24",
          "--resim-samples", "16"])
    with open(os.path.join(out_dir, "report.json")) as f:
        report = json.load(f)

    assert np.isfinite(report["test_nll"])
    # a_x/a_y/a_z are constant under the default prior -> degenerate
    assert set(report["degenerate_dims"]) == {"a_x", "a_y", "a_z"}
    assert len(report["scaled_cdf_residual_by_dim"]) == 19
    # headline excludes the degenerate dims
    nondegen = [v for k, v in report["scaled_cdf_residual_by_dim"].items()
                if k not in report["degenerate_dims"]]
    # per-dim values are rounded to 4 decimals in the report
    assert abs(report["max_scaled_cdf_residual"] - max(nondegen)) < 5e-4
    assert report["max_scaled_cdf_residual_all_dims"] >= report["max_scaled_cdf_residual"]
    for k in ("posterior_width_by_dim", "posterior_bias_by_dim", "data_spread_by_dim"):
        assert len(report[k]) == 19
    # joint-band fields: self-contained multiplicity-corrected verdicts
    assert report["n_nondegenerate_dims"] == 16
    assert report["sup_band_99_joint"] == pytest.approx(2.008, abs=2e-3)
    assert report["sup_band_99_joint"] > report["sup_band_99"]
    verdicts = report["calibration_verdict_by_dim"]
    assert len(verdicts) == 19
    assert all(verdicts[k] == "degenerate" for k in report["degenerate_dims"])
    assert set(verdicts.values()) <= {"pass", "pass_joint", "fail", "degenerate"}
    assert report["calibration_pass_joint_band"] == (
        report["max_scaled_cdf_residual"] < report["sup_band_99_joint"])
    # robust impact metrics (median + clipped RMSE), never a bare inf-prone RMSE
    assert "impact_median_dist" in report
    assert "impact_rmse_within_42m" in report
    assert "impact_rmse" not in report
    for f_ in ("rank_histograms.png", "cdf_residuals.png", "resimulation.png"):
        assert os.path.exists(os.path.join(out_dir, f_))


@pytest.fixture(scope="module")
def tiny_video_config(tmp_path_factory):
    """Toy-size mirror of `configs/runs/dev/videos_CNN_LSTM_large.yaml`:
    two condition groups (videos + camera metadata), CNN->LSTM stack."""
    d = tmp_path_factory.mktemp("cli_video")
    cfg = {
        "global": {
            "cnf_version": 2,
            "parameter_selection": ["x0_x", "x0_y", "x0_z", "v0_x", "v0_y", "v0_z",
                                    "g", "w_x", "w_y", "w_z", "b", "m",
                                    "a_x", "a_y", "a_z", "r", "A", "Cd", "rho"],
            "conditions": [["videos"],
                           ["cam_radian", "cam_radius", "cam_angles", "cam_heights"]],
            "dtype": "float32",
        },
        "data": {
            "path": str(d / "videos.pkl"),
            "config_file": "{{BCNF_ROOT}}/configs/data_prior.yaml",
            "n_samples": 32,
            "output_type": "videos",
            "dt": 0.1,
            "T": 0.5,
            "num_cams": 2,
            "break_on_impact": False,
            "do_filter": False,
            "verbose": False,
        },
        "model": {"kwargs": {"size": 19, "nested_sizes": [16], "n_blocks": 2,
                             "n_conditions": 15, "act_norm": True,
                             "random_state": 0}},
        "feature_networks": [
            {"type": "ConcatenateCondition",
             "kwargs": {"input_size": None, "output_size": [90, 160]}},
            {"type": "CNN",
             "kwargs": {"hidden_channels": [2, 4], "kernel_sizes": [5, 3],
                        "strides": [2, 2], "dropout_prob": 0.0,
                        "image_input_size": [90, 160],
                        "output_size_lin": 16, "output_size": 16}},
            {"type": "LSTM",
             "kwargs": {"input_size": 16, "hidden_size": 8, "output_size": 8,
                        "num_layers": 1, "pooling": "mean"}},
            {"type": "ConcatenateCondition",
             "kwargs": {"input_size": 8, "output_size": 15, "dim": -1}},
        ],
        "optimizer": {"type": "Adam", "kwargs": {"lr": 2.0e-3}},
        "lr_scheduler": {"type": "ReduceLROnPlateau",
                         "kwargs": {"mode": "min", "factor": 0.5, "patience": 50,
                                    "threshold_mode": "abs", "threshold": 0.1}},
        "training": {"validation_split": 0.25, "val_loss_window_size": 3,
                     "val_loss_patience": 1000, "val_loss_tolerance": 0.01,
                     "val_loss_tolerance_mode": "abs", "batch_size": 8,
                     "n_epochs": 2, "timeout": None, "random_state": 0},
    }
    path = d / "tiny_video.yaml"
    path.write_text(yaml.safe_dump(cfg, sort_keys=False))
    return str(path), str(d)


@pytest.mark.slow
def test_cli_eval_video_model_resimulates(tiny_video_config, tmp_path):
    """`bcnf-tpu eval` on a *video* model must still resimulate: video
    datasets carry true trajectories alongside the rendered videos, and the
    eval loader must not drop them (regression: keep_output_type='videos'
    used to pop the 'trajectories' key the resim comparison needs)."""
    path, d = tiny_video_config
    main(["generate", "-c", os.path.join(REPO, "configs", "data_prior.yaml"),
          "-o", os.path.join(d, "videos.pkl"), "-n", "32", "--no-filter",
          "--renderer", "analytic", "--output-type", "videos",
          "--dt", "0.1", "-T", "0.5", "--seed", "0"])
    with open(os.path.join(d, "videos.pkl"), "rb") as f:
        data = pickle.load(f)
    assert "videos" in data and "trajectories" in data

    model_dir = str(tmp_path / "vmodel")
    main(["train", "-c", path, "-o", model_dir, "-f"])

    out_dir = str(tmp_path / "vreport")
    main(["eval", "-m", model_dir, "-d", os.path.join(d, "videos.pkl"),
          "-o", out_dir, "-M", "100", "--max-points", "8",
          "--resim-samples", "8"])
    with open(os.path.join(out_dir, "report.json")) as f:
        report = json.load(f)
    assert np.isfinite(report["test_nll"])
    # resimulation ran (the regression would KeyError before reaching here)
    assert "impact_median_dist" in report
    assert os.path.exists(os.path.join(out_dir, "resimulation.png"))


def test_results_index_is_current():
    """Doc-artifact drift gate (VERDICT r4 demand #2): the committed
    results/README.md must match what `scripts/summarize_results.py` would
    regenerate from the artifacts on disk. Exit 1 = stale index (the
    round-2/3/4 failure mode); exit 2 = index current but broken artifacts
    present (caught separately by their own regeneration demand)."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "summarize_results.py"),
         "--check"],
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode != 1, (
        "results/README.md is stale vs the committed artifacts:\n" + proc.stderr
    )
    assert proc.returncode == 0, (
        "broken measurement artifacts present (regenerate before citing):\n"
        + proc.stderr
    )
