#!/usr/bin/env python
"""Online (infinite-data) vs frozen-dataset training at equal wall-clock.

Trains the named config (default trajectory_LSTM_small) with `train_online`
(fresh on-device batch per step) for the same wall-clock budget as the
frozen-dataset parity run, then evaluates NLL on the SAME held-out frozen
test set (~/bcnf_data/test_1000.pkl) so the numbers are directly comparable
to results/parity_<name>.json.

Usage: python scripts/online_parity.py [config_name] [timeout_s]
Writes results/online_parity_<name>.json.
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


def main() -> None:
    name = sys.argv[1] if len(sys.argv) > 1 else "trajectory_LSTM_small"
    timeout = float(sys.argv[2]) if len(sys.argv) > 2 else 900.0

    from bcnf_tpu import CondRealNVP, load_config
    from bcnf_tpu.config import load_yaml
    from bcnf_tpu.train.data import TrainerDataHandler
    from bcnf_tpu.train.online import OnlineSimulator, train_online
    from bcnf_tpu.utils.misc import inn_nll_loss

    t0 = time.time()
    config = load_config(f"{{{{BCNF_ROOT}}}}/configs/runs/{name}.yaml", verify=False)
    cfg = {k.lower(): v for k, v in config.items()}

    model = CondRealNVP.from_config(config)
    params = model.init(jax.random.key(0))

    simulator = OnlineSimulator(
        load_yaml(cfg["data"]["config_file"]),
        model.parameter_index_mapping,
        condition_groups=cfg["global"]["conditions"],
        dt=float(cfg["data"]["dt"]),
        T=float(cfg["data"]["T"]),
        break_on_impact=bool(cfg["data"]["break_on_impact"]),
        filter_runaway=False,  # match the parity protocol: no filtering
    )
    params, history = train_online(
        model, params, simulator,
        n_steps=10_000_000,  # wall-clock bounded
        batch_size=int(cfg["training"]["batch_size"]),
        lr=float(dict(cfg["optimizer"].get("kwargs", {})).get("lr", 2e-4)),
        seed=0,
        timeout=timeout,
    )
    steps_done = history["train_loss"][-1][0] if history["train_loss"] else 0
    print(f"[{time.time()-t0:.0f}s] online-trained {steps_done} steps, "
          f"stop={history.get('stop_reason')}")

    # evaluate on the SAME frozen test set as the parity runs
    test_path = os.path.expanduser("~/bcnf_data/test_1000.pkl")
    handler = TrainerDataHandler()
    test_cfg = dict(cfg)
    test_cfg["data"] = dict(cfg["data"])
    test_cfg["data"]["path"] = test_path
    y_test, conds_test = handler.get_data_for_training(test_cfg, model.parameter_index_mapping)
    nlls = []
    for b in range(0, len(y_test), 256):
        z, ld = model.forward(
            params, jnp.asarray(y_test[b: b + 256]),
            *[jnp.asarray(c[b: b + 256]) for c in conds_test],
        )
        nlls.append(np.asarray(inn_nll_loss(z, ld, reduction="none")))
    test_nll = float(np.concatenate(nlls).mean())

    frozen_path = f"results/parity_{name}.json"
    frozen_nll = None
    if os.path.exists(frozen_path):
        with open(frozen_path) as f:
            frozen_nll = json.load(f).get("test_nll")

    result = {
        "config": name,
        "mode": "online",
        "steps": int(steps_done),
        "stop_reason": history.get("stop_reason"),
        "final_train_loss": float(history["train_loss"][-1][1]),
        "final_eval_nll_fresh": float(history["eval_nll"][-1][1]),
        "test_nll_frozen_testset": test_nll,
        "frozen_dataset_test_nll": frozen_nll,
        "wall_s": time.time() - t0,
    }
    print(json.dumps(result, indent=2))
    os.makedirs("results", exist_ok=True)
    with open(f"results/online_parity_{name}.json", "w") as f:
        json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
