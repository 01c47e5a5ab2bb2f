#!/usr/bin/env python
"""Train videos_CNN_LSTM_large in the online (infinite-data) regime on TPU.

Round-3 trained this model on a frozen 512-video dataset and overfit it
(train -53.9 / val -43.5, results/parity_videos_CNN_LSTM_large.json). The
online regime removes the gap by construction: every step renders a FRESH
batch of two-camera videos on device (prior -> RK4 -> analytic splatting ->
CNN+LSTM+flow fwd/bwd, one jit program), so train loss IS fresh-data loss
and the eval_nll track is computed on held-out fresh batches. A separately
generated test pickle gives the final test NLL on data the training stream
never saw (different seed).

Usage: python scripts/video_online_parity.py [timeout_s] [batch] [n_steps]
Writes results/parity_videos_CNN_LSTM_large_online.json and saves the model
to ~/bcnf_models/parity_videos_CNN_LSTM_large (the layout bcnf-tpu eval /
examples/irl_posteriors.py consume).
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAME = "videos_CNN_LSTM_large"


def main() -> None:
    timeout = float(sys.argv[1]) if len(sys.argv) > 1 else 3000.0
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    # ~1.1 s/step at batch 32 (render 0.74 s + step 0.37 s, renderer_bench +
    # parity_videos r3); budget the cosine decay to the wall-clock
    n_steps = int(sys.argv[3]) if len(sys.argv) > 3 else max(int(timeout / 1.15), 500)

    from bcnf_tpu import CondRealNVP, load_config
    from bcnf_tpu.config import load_yaml
    from bcnf_tpu.models import count_params
    from bcnf_tpu.simulation.sampling import generate_data
    from bcnf_tpu.train.data import TrainerDataHandler
    from bcnf_tpu.train.history import StdoutSink
    from bcnf_tpu.train.online import OnlineSimulator, train_online
    from bcnf_tpu.utils.io import save_data
    from bcnf_tpu.utils.misc import inn_nll_loss

    t0 = time.time()
    config = load_config(f"{{{{BCNF_ROOT}}}}/configs/runs/dev/{NAME}.yaml", verify=False)
    cfg = {k.lower(): v for k, v in config.items()}
    data_cfg = dict(cfg["data"])

    model = CondRealNVP.from_config(config)
    params = model.init(jax.random.key(0))
    print(f"[{time.time()-t0:.0f}s] {NAME}: {count_params(params):,} params")

    simulator = OnlineSimulator(
        load_yaml(data_cfg["config_file"]),
        model.parameter_index_mapping,
        condition_groups=cfg["global"]["conditions"],
        dt=float(data_cfg["dt"]),
        T=float(data_cfg["T"]),
        num_cams=int(data_cfg.get("num_cams", 2)),
        break_on_impact=bool(data_cfg.get("break_on_impact", False)),
        renderer="analytic",
    )

    opt_kwargs = dict(cfg["optimizer"].get("kwargs", {}))
    params, history = train_online(
        model, params, simulator,
        n_steps=n_steps,
        batch_size=batch,
        lr=float(opt_kwargs.get("lr", 2e-4)),
        lr_decay=True,
        seed=0,
        sink=StdoutSink(),
        timeout=timeout,
        eval_every=100,
        checkpoint_dir=os.path.expanduser(f"~/bcnf_models/ckpt_online_{NAME}"),
        checkpoint_every=250,
        resume=True,
    )
    steps_done = history["train_loss"][-1][0] if history["train_loss"] else 0
    print(f"[{time.time()-t0:.0f}s] online-trained {steps_done} steps "
          f"({steps_done * batch:,} fresh videos seen), stop={history['stop_reason']}")

    # held-out test set from a different seed than the training stream
    data_dir = os.path.expanduser("~/bcnf_data")
    test_path = os.path.join(data_dir, "videos_test_256_analytic.pkl")
    if not os.path.exists(test_path):
        print(f"[{time.time()-t0:.0f}s] generating 256 test videos...")
        save_data(generate_data(
            config_file=data_cfg["config_file"], n=256, output_type="videos",
            dt=float(data_cfg["dt"]), T=float(data_cfg["T"]),
            break_on_impact=bool(data_cfg.get("break_on_impact", False)),
            do_filter=bool(data_cfg.get("do_filter", False)),
            renderer="analytic", seed=2, verbose=False,
        ), test_path)

    handler = TrainerDataHandler()
    test_cfg = dict(cfg)
    test_cfg["data"] = dict(data_cfg)
    test_cfg["data"]["path"] = test_path
    y_test, conds_test = handler.get_data_for_training(test_cfg, model.parameter_index_mapping)
    nlls = []
    for b in range(0, len(y_test), 32):
        z, ld = model.forward(
            params, jnp.asarray(y_test[b: b + 32]),
            *[jnp.asarray(c[b: b + 32]) for c in conds_test],
        )
        nlls.append(np.asarray(inn_nll_loss(z, ld, reduction="none")))
    test_nll = float(np.concatenate(nlls).mean())

    result = {
        "config": NAME,
        "regime": "online (fresh on-device rendered batch per step)",
        "renderer": "analytic",
        "batch_size": batch,
        "steps": int(steps_done),
        "videos_seen": int(steps_done * batch),
        "stop_reason": history["stop_reason"],
        "train_loss_tail": history["train_loss"][-5:],
        "eval_nll_tail": history["eval_nll"][-5:],
        "final_train_nll_fresh": float(history["train_loss"][-1][1]),
        "final_eval_nll_fresh": float(history["eval_nll"][-1][1]),
        "test_nll": test_nll,
        "wall_s": time.time() - t0,
    }
    print(json.dumps(result, indent=2))
    os.makedirs("results", exist_ok=True)
    with open(f"results/parity_{NAME}_online.json", "w") as f:
        json.dump(result, f, indent=2)

    import pickle

    model_dir = os.path.expanduser(f"~/bcnf_models/parity_{NAME}")
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "params.pkl"), "wb") as f:
        pickle.dump(jax.device_get(params), f)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump({"config_path": f"{{{{BCNF_ROOT}}}}/configs/runs/dev/{NAME}.yaml"}, f)
    print(f"model saved to {model_dir}")


if __name__ == "__main__":
    main()
