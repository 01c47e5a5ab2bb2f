#!/usr/bin/env python
"""Generate the run-config library under configs/runs/.

Mirrors the reference's published model families (reference
`configs/runs/old/*.yaml`: trajectory_{FC,LSTM,TRF}_{small,large} — the README
results-table models — plus hybrid variants per `configs/runs/hybrid/`),
emitted in the same YAML schema this framework reads.
"""

from __future__ import annotations

import os

import yaml

HERE = os.path.dirname(os.path.abspath(__file__))

PARAMS_19 = [
    "x0_x", "x0_y", "x0_z", "v0_x", "v0_y", "v0_z", "g",
    "w_x", "w_y", "w_z", "b", "m", "a_x", "a_y", "a_z", "r", "A", "Cd", "rho",
]

SMALL = dict(nested_sizes=[16] * 7, n_conditions=80, n_blocks=32, dropout=0.383)
LARGE = dict(nested_sizes=[526] * 5, n_conditions=1360, n_blocks=26, dropout=0.407)

FEATURE_NETS = {
    ("FC", "small"): [
        {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": 90}},
        {"type": "FullyConnected", "kwargs": {"sizes": [90, 80], "dropout": 0.244}},
    ],
    ("FC", "large"): [
        {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": 90}},
        {"type": "FullyConnected", "kwargs": {"sizes": [90] + [310] * 7 + [1360], "dropout": 0.111}},
    ],
    ("LSTM", "small"): [
        {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": 3}},
        {"type": "LSTM", "kwargs": {
            "input_size": 3, "hidden_size": 12, "output_size": 80, "num_layers": 2,
            "dropout": 0.111, "bidirectional": True, "pooling": "mean"}},
    ],
    ("LSTM", "large"): [
        {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": 3}},
        {"type": "LSTM", "kwargs": {
            "input_size": 3, "hidden_size": 140, "output_size": 1360, "num_layers": 2,
            "dropout": 0.111, "bidirectional": True, "pooling": "mean"}},
    ],
    ("TRF", "small"): [
        {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": 3}},
        {"type": "Transformer", "kwargs": {
            "input_size": 3, "trf_size": 16, "n_heads": 4, "ff_size": 8,
            "n_blocks": 4, "output_size": 80, "dropout": 0.1}},
    ],
    ("TRF", "large"): [
        {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": 3}},
        {"type": "Transformer", "kwargs": {
            "input_size": 3, "trf_size": 128, "n_heads": 8, "ff_size": 128,
            "n_blocks": 8, "output_size": 1360, "trf_dropout": 0.1, "dropout": 0.5}},
    ],
}


def make_config(arch: str, scale: str, hybrid: bool = False) -> dict:
    model_kwargs = dict(size=19, act_norm=True, random_state=20240325)
    model_kwargs.update(SMALL if scale == "small" else LARGE)
    if hybrid:
        model_kwargs["hybrid"] = True
    return {
        "global": {
            "cnf_version": 2,
            "parameter_selection": PARAMS_19,
            "conditions": [["trajectories"]],
            "dtype": "float32",
            **({"hybrid_weight": 1} if hybrid else {}),
        },
        "data": {
            "path": "{{BCNF_ROOT}}/data/train",
            "config_file": "{{BCNF_ROOT}}/configs/data_prior.yaml",
            "n_samples": 5000,
            "output_type": "trajectories",
            "dt": 0.067,
            "T": 2.0,
            "num_cams": 2,
            "break_on_impact": False,
            "do_filter": False,
            "verbose": True,
        },
        "model": {"kwargs": model_kwargs},
        "feature_networks": FEATURE_NETS[(arch, scale)],
        "optimizer": {"type": "Adam", "kwargs": {"lr": 2.0e-4}},
        "lr_scheduler": {
            "type": "ReduceLROnPlateau",
            "kwargs": {"mode": "min", "factor": 0.5, "patience": 250,
                       "threshold_mode": "abs", "threshold": 0.1},
        },
        "training": {
            "validation_split": 0.2,
            "val_loss_window_size": 32,
            "val_loss_patience": 500,
            "val_loss_tolerance": 0.1,
            "val_loss_tolerance_mode": "abs",
            "random_state": 20240325,
            "batch_size": 256,
            "n_epochs": 50000,
            "verbose": True,
            "timeout": 10000,
        },
    }


def main() -> None:
    out_dir = os.path.join(HERE, "runs")
    os.makedirs(out_dir, exist_ok=True)
    for arch in ("FC", "LSTM", "TRF"):
        for scale in ("small", "large"):
            for hybrid in (False, True):
                name = f"trajectory_{arch}_{scale}" + ("_hybrid" if hybrid else "")
                path = os.path.join(out_dir, f"{name}.yaml")
                with open(path, "w") as f:
                    yaml.safe_dump(make_config(arch, scale, hybrid), f, sort_keys=False)
                print("wrote", path)


if __name__ == "__main__":
    main()
