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


# ---------------------------------------------------------------------------
# nll / hybrid families (reference `configs/runs/nll/t_*.yaml`,
# `configs/runs/hybrid/t_*_hybrid.yaml`): 21-parameter theta with vector
# gravity (g_x, g_y, g_z), four model scales, six conditioner archetypes.
# Shapes transcribed from the reference configs (same grid).
# ---------------------------------------------------------------------------

PARAMS_21 = [
    "x0_x", "x0_y", "x0_z", "v0_x", "v0_y", "v0_z", "g_x", "g_y", "g_z",
    "w_x", "w_y", "w_z", "b", "m", "a_x", "a_y", "a_z", "r", "A", "Cd", "rho",
]

# flow scale per size tier (reference nll/hybrid model.kwargs)
T_SCALES = {
    "xsmall": dict(nested_sizes=[32] * 5, n_conditions=32, n_blocks=32, dropout=0.5),
    "small": dict(nested_sizes=[128] * 3, n_conditions=128, n_blocks=32, dropout=0.5),
    "medium": dict(nested_sizes=[256] * 3, n_conditions=256, n_blocks=32, dropout=0.5),
    "large": dict(nested_sizes=[512] * 4, n_conditions=512, n_blocks=32, dropout=0.5),
}

# conditioner per (archetype, size tier) (reference nll/hybrid feature_networks)
def _t_feature_nets(arch: str, tier: str) -> list:
    n_cond = T_SCALES[tier]["n_conditions"]
    if arch == "FC":
        fc_sizes = {
            "xsmall": [60, 56, 56, 32],
            "small": [60, 136, 136, 136, 136, 128],
            "medium": [60, 384, 384, 384, 384, 256],
            "large": [60, 896, 896, 896, 896, 512],
        }[tier]
        return [
            {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": 60}},
            {"type": "FullyConnected", "kwargs": {"sizes": fc_sizes, "dropout": 0.5}},
        ]
    if arch == "LSTM":
        h, layers = {"xsmall": (24, 1), "small": (48, 2), "medium": (92, 3), "large": (184, 4)}[tier]
        return [
            {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": 3}},
            {"type": "LSTM", "kwargs": {
                "input_size": 3, "hidden_size": h, "output_size": n_cond, "num_layers": layers,
                "dropout": 0.5, "bidirectional": True, "pooling": "mean"}},
        ]
    if arch == "DLSTM":
        h, layers = {"xsmall": (16, 1), "small": (32, 2), "medium": (64, 3), "large": (128, 4)}[tier]
        return [
            {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": 3}},
            {"type": "DualDomainLSTM", "kwargs": {
                "input_size": 3, "hidden_size": h, "num_layers": layers, "dropout": 0.5,
                "bidirectional": True, "fc_sizes": [n_cond], "fc_dropout": 0.5, "pooling": "mean"}},
        ]
    if arch == "PTRF":
        trf, heads, blocks = {
            "xsmall": (24, 4, 2), "small": (46, 4, 6), "medium": (100, 4, 8), "large": (256, 8, 7),
        }[tier]
        return [
            {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": 3}},
            {"type": "Transformer", "kwargs": {
                "input_size": 3, "trf_size": trf, "n_heads": heads, "ff_size": trf,
                "n_blocks": blocks, "output_size": n_cond, "trf_dropout": 0.1, "dropout": 0.5,
                "add_positional_embeddings": True}},
        ]
    if arch == "DFC":
        sizes = {"xsmall": [16] * 3, "small": [112] * 3, "medium": [336] * 3, "large": [672] * 4}[tier]
        return [
            {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": 60}},
            {"type": "DualDomainFC", "kwargs": {
                "input_size": 60, "sizes": sizes, "fc_sizes": [n_cond], "dropout": 0.5}},
        ]
    if arch == "DPTRF":
        trf, heads, blocks = {
            "xsmall": (16, 4, 2), "small": (32, 4, 6), "medium": (70, 8, 8), "large": (168, 8, 8),
        }[tier]
        return [
            {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": 3}},
            {"type": "DualDomainTransformer", "kwargs": {
                "input_size": 3, "trf_size": trf, "n_heads": heads, "ff_size": trf,
                "n_blocks": blocks, "fc_sizes": [n_cond], "fc_dropout": 0.5, "trf_dropout": 0.1,
                "dropout": 0.5, "add_positional_embeddings": True}},
        ]
    raise KeyError(arch)


def make_t_config(arch: str, tier: str, hybrid: bool) -> dict:
    model_kwargs = dict(
        size=21, act_norm=True, layer="Linear", activation="GELU", random_state=20240325
    )
    model_kwargs.update(T_SCALES[tier])
    if hybrid:
        model_kwargs["hybrid"] = True
    base = make_config("FC", "small", hybrid)  # template, then overwrite
    base["global"]["parameter_selection"] = PARAMS_21
    base["model"] = {"kwargs": model_kwargs}
    base["feature_networks"] = _t_feature_nets(arch, tier)
    if arch in ("FC", "DFC"):
        # the FC/DFC conditioners take a 60-d flattened trajectory
        # (20 frames x 3): ceil(T/dt) = 20 at dt = 0.1
        base["data"]["dt"] = 0.1
    return base


# ---------------------------------------------------------------------------
# dev variants exercising the custom-layer library
# (reference `configs/runs/dev/trajectory_SFrExp_LSTM_SiGLU_GELU_2_large.yaml`,
#  `configs/runs/dev/trajectory_LSTM_FFT_large_small_cond.yaml`)
# ---------------------------------------------------------------------------

def make_dev_variants() -> dict[str, dict]:
    sfrexp = make_config("LSTM", "large", False)
    sfrexp["model"]["kwargs"].update(
        nested_sizes=[206] * 5, n_conditions=1360, n_blocks=26, dropout=0.407,
        two_way=True, layer="AnyGLU", layer_kwargs={"activation": "Sigmoid"}, activation="GELU",
    )
    sfrexp["feature_networks"] = [
        {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": 3}},
        {"type": "FrExpFeatureNetwork", "kwargs": {"input_size": 3, "separate_sign": True}},
        {"type": "LSTM", "kwargs": {
            "input_size": 9, "hidden_size": 140, "output_size": 1360, "num_layers": 2,
            "dropout": 0.111, "bidirectional": True, "pooling": "mean"}},
    ]

    fft = make_config("LSTM", "large", False)
    fft["model"]["kwargs"].update(
        nested_sizes=[175] * 5, n_conditions=128, n_blocks=26, dropout=0.407,
        layer="LinearFFTEnriched", activation="GELU",
    )
    fft["feature_networks"] = [
        {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": 3}},
        {"type": "LSTM", "kwargs": {
            "input_size": 3, "hidden_size": 140, "output_size": 128, "num_layers": 2,
            "dropout": 0.111, "bidirectional": True, "pooling": "mean"}},
    ]
    return {
        "trajectory_SFrExp_LSTM_SiGLU_GELU_2_large": sfrexp,
        "trajectory_LSTM_FFT_large_small_cond": fft,
    }


def _write(path: str, cfg: dict) -> None:
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
    print("wrote", path)


def main() -> None:
    out_dir = os.path.join(HERE, "runs")
    os.makedirs(out_dir, exist_ok=True)
    for arch in ("FC", "LSTM", "TRF"):
        for scale in ("small", "large"):
            for hybrid in (False, True):
                name = f"trajectory_{arch}_{scale}" + ("_hybrid" if hybrid else "")
                _write(os.path.join(out_dir, f"{name}.yaml"), make_config(arch, scale, hybrid))

    nll_dir = os.path.join(out_dir, "nll")
    hybrid_dir = os.path.join(out_dir, "hybrid")
    dev_dir = os.path.join(out_dir, "dev")
    for d in (nll_dir, hybrid_dir, dev_dir):
        os.makedirs(d, exist_ok=True)
    for tier in ("xsmall", "small", "medium", "large"):
        for arch in ("FC", "LSTM", "DLSTM", "PTRF"):
            _write(os.path.join(nll_dir, f"t_{arch}_{tier}.yaml"), make_t_config(arch, tier, False))
        for arch in ("FC", "LSTM", "DLSTM", "PTRF", "DFC", "DPTRF"):
            _write(
                os.path.join(hybrid_dir, f"t_{arch}_{tier}_hybrid.yaml"),
                make_t_config(arch, tier, True),
            )
    for name, cfg in make_dev_variants().items():
        _write(os.path.join(dev_dir, f"{name}.yaml"), cfg)


if __name__ == "__main__":
    main()
