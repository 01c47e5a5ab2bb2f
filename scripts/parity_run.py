#!/usr/bin/env python
"""NLL parity run: train a README-table model and compare test NLL against the
reference's published numbers (BASELINE.md).

Usage: python scripts/parity_run.py [config_name] [timeout_s]
Writes results to results/parity_<config_name>.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/bcnf_tpu_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_NLL = {  # train / val / test, reference README.md:22-29
    "trajectory_FC_large": (-51.52, -51.51, -53.19),
    "trajectory_LSTM_large": (-45.82, -34.70, -35.32),
    "trajectory_TRF_large": (-41.21, -28.87, -29.12),
    "trajectory_FC_small": (-45.71, -50.69, -50.80),
    "trajectory_LSTM_small": (-42.77, -45.83, -46.41),
    "trajectory_TRF_small": (-41.71, -45.06, -46.11),
}


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "trajectory_FC_small"
    timeout = float(sys.argv[2]) if len(sys.argv) > 2 else 1500.0

    from bcnf_tpu import CondRealNVP, load_config
    from bcnf_tpu.models import count_params
    from bcnf_tpu.simulation.sampling import generate_data
    from bcnf_tpu.train import Trainer
    from bcnf_tpu.train.data import TrainerDataHandler
    from bcnf_tpu.utils.io import load_data, save_data
    from bcnf_tpu.utils.misc import inn_nll_loss

    t0 = time.time()
    config = load_config(f"{{{{BCNF_ROOT}}}}/configs/runs/{name}.yaml", verify=False)
    cfg = {k.lower(): v for k, v in config.items()}
    cfg["training"]["timeout"] = timeout
    # The NLL objective is unbounded below for this (noise-free, deterministic
    # simulator) setup — the condition nearly determines theta, so effective
    # training drives val NLL far past the reference's published numbers.
    # Data-dependent ActNorm init (Q7 fix, trainer default) plus the elastic
    # "rescue" policy (restore best params, halve lr on any divergence) keep
    # the run improving until plateau/timeout instead of dying on overflow.
    cfg["training"]["on_divergence"] = "rescue"
    cfg["training"]["keep_best"] = True
    # optional epoch cap (small models reach far past the reference NLL in
    # ~2k epochs; bounding epochs instead of wall time keeps runs short on
    # tunnels whose dispatch degrades under sustained small-step load)
    if os.environ.get("BCNF_PARITY_EPOCHS"):
        cfg["training"]["n_epochs"] = int(os.environ["BCNF_PARITY_EPOCHS"])

    data_dir = os.path.expanduser("~/bcnf_data")
    obs_noise = float(cfg["data"].get("observation_noise", 0.0))
    tag = f"_noise{obs_noise}" if obs_noise else ""
    train_path = os.path.join(data_dir, f"train_5000{tag}.pkl")
    test_path = os.path.join(data_dir, f"test_1000{tag}.pkl")
    gen_kwargs = dict(
        config_file=cfg["data"]["config_file"],
        output_type="trajectories",
        dt=cfg["data"]["dt"],
        T=cfg["data"]["T"],
        break_on_impact=bool(cfg["data"]["break_on_impact"]),
        do_filter=bool(cfg["data"]["do_filter"]),
        observation_noise=obs_noise,
        verbose=False,
    )
    if not os.path.exists(train_path):
        print(f"[{time.time()-t0:.0f}s] generating train data...")
        save_data(generate_data(n=5000, seed=1, **gen_kwargs), train_path)
    if not os.path.exists(test_path):
        print(f"[{time.time()-t0:.0f}s] generating test data...")
        save_data(generate_data(n=1000, seed=2, **gen_kwargs), test_path)
    cfg["data"]["path"] = train_path

    model = CondRealNVP.from_config(config)
    # optional matmul-precision override (e.g. BF16_BF16_F32_X3) for
    # training-precision parity experiments; result file gets a suffix
    precision = os.environ.get("BCNF_PARITY_PRECISION")
    suffix = ""
    if precision:
        model.precision = precision
        suffix = f"_{precision}"
    params = model.init(jax.random.key(0))
    print(f"[{time.time()-t0:.0f}s] {name}: {count_params(params):,} params")

    trainer = Trainer(
        cfg, run_name=name,
        parameter_index_mapping=model.parameter_index_mapping,
        hybrid_weight=cfg["global"].get("hybrid_weight", 0) or 0,
        verbose=bool(os.environ.get("BCNF_PARITY_VERBOSE")),
    )
    params = trainer.train(model, params)
    hist = trainer.meta_scheduler.parameter_history
    train_nll = hist["train_loss_nll"][-1][1]
    val_nll = hist["val_loss_nll"][-1][1]
    best_val = trainer.meta_scheduler.best_val_loss
    n_epochs = hist["val_loss"][-1][0]
    print(f"[{time.time()-t0:.0f}s] trained {n_epochs} epochs, stop={hist['stop_reason']}")

    # test NLL
    handler = TrainerDataHandler()
    test_cfg = dict(cfg)
    test_cfg["data"] = dict(cfg["data"])
    test_cfg["data"]["path"] = test_path
    y_test, conds_test = handler.get_data_for_training(
        test_cfg, model.parameter_index_mapping
    )
    hybrid_w = float(cfg["global"].get("hybrid_weight", 0) or 0)
    nlls, mses = [], []
    for b in range(0, len(y_test), 256):
        yb = jnp.asarray(y_test[b: b + 256])
        cb = [jnp.asarray(c[b: b + 256]) for c in conds_test]
        if hybrid_w > 0:
            z, ld, h = model.forward(params, yb, *cb, return_features=True)
            mses.append(np.asarray(
                jnp.mean((model.predict_head(params, h) - yb) ** 2, axis=-1)))
        else:
            z, ld = model.forward(params, yb, *cb)
        nlls.append(np.asarray(inn_nll_loss(z, ld, reduction="none")))
    test_nll = float(np.concatenate(nlls).mean())
    test_mse = float(np.concatenate(mses).mean()) if mses else None

    ref = REFERENCE_NLL.get(name)
    epochs_to_ref = None
    if ref is not None:
        for e, v in hist["val_loss_nll"]:
            if v <= ref[1]:
                epochs_to_ref = int(e)
                break
    result = {
        "config": name,
        "precision": precision or "highest",
        "epochs": int(n_epochs),
        "stop_reason": hist["stop_reason"],
        "train_nll": float(train_nll),
        "val_nll": float(val_nll),
        "best_val_rolling": float(best_val),
        "test_nll": test_nll,
        # hybrid objective (reference `src/bcnf/train/trainer.py:261-269`):
        # loss = (nll + w*mse) / (1 + w) with the MSE head on the encoder
        "hybrid_weight": hybrid_w or None,
        "test_mse_head": test_mse,
        "test_hybrid_loss": (
            (test_nll + hybrid_w * test_mse) / (1 + hybrid_w)
            if test_mse is not None else None
        ),
        "reference_train_val_test": ref,
        "epochs_to_reference_val_nll": epochs_to_ref,
        "wall_s": time.time() - t0,
    }
    print(json.dumps(result, indent=2))
    os.makedirs("results", exist_ok=True)
    with open(f"results/parity_{name}{suffix}.json", "w") as f:
        json.dump(result, f, indent=2)

    # save the trained model in the `bcnf-tpu train` artifact layout so
    # `bcnf-tpu eval`/`sample` can consume parity-trained models directly
    import pickle

    model_dir = os.path.expanduser(f"~/bcnf_models/parity_{name}{suffix}")
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "params.pkl"), "wb") as f:
        pickle.dump(jax.device_get(params), f)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump({"config_path": f"{{{{BCNF_ROOT}}}}/configs/runs/{name}.yaml"}, f)
    print(f"model saved to {model_dir}")


if __name__ == "__main__":
    main()
