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


# ---------------------------------------------------------------------------
# Full dev family (reference `configs/runs/dev/` — 38 files). Shapes
# transcribed from the reference configs; files the reference keeps in its
# *legacy* schema (`feature_network:` + `time_series_network:` keys, which the
# reference's own from_config at `src/bcnf/models/cnf.py:442-457` can no
# longer load) are emitted here translated into the current
# `feature_networks:` list schema.
# ---------------------------------------------------------------------------

_LSTM = lambda i, h, o, n, do=0.111: {"type": "LSTM", "kwargs": {
    "input_size": i, "hidden_size": h, "output_size": o, "num_layers": n,
    "dropout": do, "bidirectional": True, "pooling": "mean"}}
_DLSTM = lambda i, h, n, fc: {"type": "DualDomainLSTM", "kwargs": {
    "input_size": i, "hidden_size": h, "num_layers": n, "dropout": 0.5,
    "bidirectional": True, "fc_sizes": [fc], "fc_dropout": 0.5, "pooling": "mean"}}
_TRF = lambda i, t, he, bl, o: {"type": "Transformer", "kwargs": {
    "input_size": i, "trf_size": t, "n_heads": he, "ff_size": t,
    "n_blocks": bl, "output_size": o, "trf_dropout": 0.1, "dropout": 0.5}}
_CAT3 = {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": 3}}
_FREXP = lambda sign: {"type": "FrExpFeatureNetwork", "kwargs": {"input_size": 3, "separate_sign": sign}}
_CNN = lambda ch, ks, out, ncnn=None, do=0.5: {"type": "CNN", "kwargs": {
    "hidden_channels": ch, "kernel_sizes": ks, "strides": [1, 1, 1],
    "dropout_prob": do, "image_input_size": [90, 160], "output_size_lin": out,
    "output_size": out, **({"num_CNN": ncnn} if ncnn is not None else {})}}
_CATV = {"type": "ConcatenateCondition", "kwargs": {"input_size": None, "output_size": [90, 160]}}
_VIDEO_CONDS = [["videos"], ["cam_radian", "cam_radius", "cam_angles", "cam_heights"]]


def _mk(flow: dict, fns: list, hybrid_weight=None, params21=False,
        conditions=None, timeout=10000, n_samples=5000) -> dict:
    cfg = make_config("FC", "small", False)
    cfg["global"]["parameter_selection"] = PARAMS_21 if params21 else PARAMS_19
    if hybrid_weight is not None:
        cfg["global"]["hybrid_weight"] = hybrid_weight
        flow = dict(flow, hybrid=True)
    if conditions is not None:
        cfg["global"]["conditions"] = conditions
        cfg["data"]["output_type"] = "videos"
    kwargs = dict(size=21 if params21 else 19, act_norm=True,
                  layer="Linear", activation="GELU", random_state=20240325)
    kwargs.update(flow)
    cfg["model"] = {"kwargs": kwargs}
    cfg["feature_networks"] = [_CAT3] + fns if conditions is None else fns
    cfg["training"]["timeout"] = timeout
    cfg["data"]["n_samples"] = n_samples
    return cfg


def _flow(ns, w, nb, do=0.407, **kw) -> dict:
    return dict(nested_sizes=[w] * ns, n_blocks=nb, dropout=do, **kw)


def make_dev_family() -> dict[str, dict]:
    """All reference `configs/runs/dev/` models (shapes per reference YAMLs)."""
    cfgs: dict[str, dict] = {}

    # LSTM_2 (two_way) family — dev/trajectory_LSTM_2_large.yaml etc.
    cfgs["trajectory_LSTM_2_large"] = _mk(
        _flow(5, 336, 26, two_way=True, n_conditions=1360), [_LSTM(3, 140, 1360, 2)])
    cfgs["trajectory_LSTM_2_large_small_cond"] = _mk(
        _flow(5, 256, 13, 0.4, two_way=True, n_conditions=128), [_LSTM(3, 128, 128, 2, 0.1)])
    cfgs["trajectory_LSTM_2_large_small_cond_hybrid"] = _mk(
        _flow(5, 256, 26, two_way=True, n_conditions=128),
        [_LSTM(3, 140, 128, 2)], hybrid_weight=0.1)

    # small_cond / dual / hybrid variants of LSTM_large
    cfgs["trajectory_LSTM_large_small_cond"] = _mk(
        _flow(5, 526, 26, n_conditions=128), [_LSTM(3, 140, 128, 2)])
    cfgs["trajectory_LSTM_large_small_cond_dual"] = _mk(
        _flow(5, 526, 26, n_conditions=128), [_DLSTM(3, 64, 3, 128)], hybrid_weight=0)
    cfgs["trajectory_LSTM_large_small_cond_hybrid"] = _mk(
        _flow(5, 526, 26, n_conditions=128), [_LSTM(3, 140, 128, 2)], hybrid_weight=1.0)
    cfgs["trajectory_LSTM_large_small_cond_hybrid_dual"] = _mk(
        _flow(5, 526, 26, n_conditions=128), [_DLSTM(3, 64, 3, 128)], hybrid_weight=0.1)
    cfgs["trajectory_LSTM_manual"] = _mk(
        _flow(4, 256, 32, 0.4, n_conditions=256), [_LSTM(3, 256, 256, 16, 0.1)])

    # hybrid_dual tier grid (19-parameter theta)
    tiers = {
        "xxsmall": (_flow(4, 16, 16, 0.5, n_conditions=16), _DLSTM(3, 16, 1, 16)),
        "xsmall": (_flow(5, 32, 32, 0.5, n_conditions=32), _DLSTM(3, 16, 1, 32)),
        "small": (_flow(3, 128, 32, 0.5, n_conditions=128), _DLSTM(3, 32, 2, 128)),
        "medium": (_flow(3, 200, 32, 0.5, n_conditions=200), _DLSTM(3, 64, 2, 200)),
        "large": (_flow(5, 526, 26, n_conditions=128), _DLSTM(3, 64, 3, 128)),
    }
    for tier, (flow, dl) in tiers.items():
        cfgs[f"trajectory_LSTM_{tier}_hybrid_dual"] = _mk(flow, [dl], hybrid_weight=1)
    cfgs["trajectory_LSTM_xsmall_hybrid0.1_dual"] = _mk(
        _flow(5, 32, 32, 0.5, n_conditions=32), [_DLSTM(3, 16, 1, 32)], hybrid_weight=0.1)
    cfgs["trajectory_LSTM_xsmall_large_hybrid_dual"] = _mk(
        _flow(5, 1024, 32, 0.5, n_conditions=32), [_DLSTM(3, 16, 1, 32)], hybrid_weight=1)
    # t_* hybrid_dual (21-parameter theta)
    cfgs["t_LSTM_xsmall_hybrid_dual"] = _mk(
        _flow(5, 32, 32, 0.5, n_conditions=32), [_DLSTM(3, 16, 1, 32)],
        hybrid_weight=1, params21=True)
    cfgs["t_LSTM_small_hybrid_dual"] = _mk(
        _flow(3, 128, 32, 0.5, n_conditions=128), [_DLSTM(3, 32, 2, 128)],
        hybrid_weight=1, params21=True)

    # FrExp / SFrExp family
    cfgs["trajectory_FrExp_TRF_large"] = _mk(
        _flow(5, 526, 26, n_conditions=1360), [_FREXP(False), _TRF(6, 128, 8, 8, 1360)])
    cfgs["trajectory_FrExp_TRF_large_large"] = _mk(
        _flow(5, 526, 26, n_conditions=1360), [_FREXP(True), _TRF(9, 256, 16, 16, 1360)])
    cfgs["trajectory_SFrExp_TRF_large"] = _mk(
        _flow(5, 526, 26, n_conditions=1360), [_FREXP(True), _TRF(9, 128, 8, 8, 1360)])
    cfgs["trajectory_SFrExp_TRF_2_large"] = _mk(
        _flow(5, 526, 13, two_way=True, n_conditions=1360),
        [_FREXP(True), _TRF(9, 128, 8, 8, 1360)])
    cfgs["trajectory_SFrExp_TRF_2_deep"] = _mk(
        _flow(5, 256, 32, two_way=True, n_conditions=1360),
        [_FREXP(True), _TRF(9, 128, 8, 8, 1360)])
    cfgs["trajectory_SFrExp_LSTM_2_large"] = _mk(
        _flow(5, 206, 26, two_way=True, n_conditions=1360),
        [_FREXP(True), _LSTM(9, 140, 1360, 2)])
    cfgs["trajectory_SFrExp_LSTM_2_large_do4"] = _mk(
        _flow(5, 206, 26, 0.4, two_way=True, n_conditions=1360),
        [_FREXP(True), _LSTM(9, 140, 1360, 2, 0.4)])
    cfgs["trajectory_SFrExp_LSTM_2_medium"] = _mk(
        _flow(5, 128, 24, two_way=True, n_conditions=1024),
        [_FREXP(True), _LSTM(9, 128, 1024, 2)])
    cfgs["trajectory_SFrExp_LSTM_2_medium_short"] = _mk(
        _flow(5, 128, 12, two_way=True, n_conditions=1024),
        [_FREXP(True), _LSTM(9, 128, 1024, 2)])
    cfgs["trajectory_SFrExp_LSTM_SiGLU_2_large"] = _mk(
        _flow(5, 206, 26, two_way=True, n_conditions=1360,
              layer="AnyGLU", layer_kwargs={"activation": "Sigmoid"}, activation="Identity"),
        [_FREXP(True), _LSTM(9, 140, 1360, 2)])

    # LSTM + camera-metadata concat (trajectory observed, camera conds appended)
    lstm_fc = _mk(_flow(5, 526, 26, n_conditions=107), [_LSTM(3, 16, 100, 2, 0.5)])
    lstm_fc["global"]["conditions"] = [["trajectories"],
                                       ["cam_radian", "cam_radius", "cam_angles", "cam_heights"]]
    lstm_fc["model"]["kwargs"].pop("layer"), lstm_fc["model"]["kwargs"].pop("activation")
    lstm_fc["feature_networks"].append(
        {"type": "ConcatenateCondition", "kwargs": {"input_size": 100, "output_size": 107, "dim": -1}})
    cfgs["trajectory_LSTM_FC_large"] = lstm_fc

    # pretrained conditioner workflow (reference keeps these files in the
    # legacy schema; here: current schema + the pretrained_features key the
    # new framework actually implements)
    pre = _mk(_flow(5, 526, 26, n_conditions=1360),
              [{"type": "FullyConnected",
                "kwargs": {"sizes": [3, 1000], "dropout": 0.3, "flatten": False}},
               _LSTM(1000, 212, 1360, 2)])
    pre["training"]["val_loss_patience"] = 75
    pre["training"]["pretrained_features"] = "{{BCNF_ROOT}}/models/bcnf-models/trajectory_LSTM_large/params.pkl"
    cfgs["trajectory_LSTM_large_pretrained"] = pre

    # dev_config (legacy-schema smoke config: xsmall LSTM, 21 params, 1h cap)
    cfgs["dev_config"] = _mk(
        _flow(7, 16, 32, 0.383, n_conditions=80), [_LSTM(3, 16, 80, 1, 0.244)],
        params21=True, timeout=3600, n_samples=2000)

    # videos family
    def _vid(cnn, lstm, extra=None, n_conditions=1367):
        fns = [_CATV, cnn, lstm,
               {"type": "ConcatenateCondition",
                "kwargs": {"input_size": lstm["kwargs"]["output_size"],
                           "output_size": lstm["kwargs"]["output_size"] + 7, "dim": -1}}]
        if extra is not None:
            fns.append(extra)
        return _mk(dict(_flow(5, 526, 26), n_conditions=n_conditions), fns,
                   conditions=_VIDEO_CONDS)

    cfgs["videos_CNN_LSTM_large"] = _vid(
        _CNN([8, 16, 32], [8, 5, 3], 1000), _LSTM(1000, 212, 1360, 2))
    cfgs["videos_double_CNN_LSTM_large"] = _vid(
        _CNN([5, 10, 15], [3, 3, 5], 1000, ncnn=1, do=0.25), _LSTM(1000, 212, 1360, 2))
    cfgs["videos_CNN_LSTM_FC_large"] = _vid(
        _CNN([8, 16, 32], [8, 5, 3], 100), _LSTM(100, 16, 100, 1, 0.5),
        extra={"type": "FullyConnected", "kwargs": {"sizes": [107, 100], "dropout": 0.5}},
        n_conditions=100)
    cfgs["videos_CNN_LSTM_FC_large_bottleneck"] = _vid(
        _CNN([8, 16, 32], [8, 5, 3], 3), _LSTM(3, 212, 212, 2),
        extra={"type": "FullyConnected", "kwargs": {"sizes": [219, 1360], "dropout": 0.5}},
        n_conditions=1360)

    # single/double/pretrained CNN→LSTM (legacy schema in the reference;
    # single condition group: videos only)
    def _vid_plain(ncnn, pretrained=False):
        cfg = _mk(dict(_flow(5, 526, 26), n_conditions=1360),
                  [_CATV, _CNN([8, 16, 32], [8, 5, 3], 1000, ncnn=ncnn),
                   _LSTM(1000, 212, 1360, 2)],
                  conditions=[["videos"]])
        cfg["model"]["kwargs"].pop("layer"), cfg["model"]["kwargs"].pop("activation")
        if pretrained:
            cfg["training"]["pretrained_features"] = \
                "{{BCNF_ROOT}}/models/bcnf-models/videos_CNN_large_single/params.pkl"
        return cfg

    cfgs["videos_CNN_large_single"] = _vid_plain(1)
    cfgs["videos_CNN_large_double"] = _vid_plain(2)
    cfgs["videos_CNN_large_pretrained"] = _vid_plain(1, pretrained=True)

    return cfgs


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
    for name, cfg in make_dev_family().items():
        _write(os.path.join(dev_dir, f"{name}.yaml"), cfg)


if __name__ == "__main__":
    main()
