#!/usr/bin/env python
"""Component-level compile stopwatches for the videos_CNN_LSTM_large wedge.

Stage-level findings from video_compile_probe.py: CNN forward 5 s,
encoder (CNN->LSTM) forward 126 s, whole-model forward 125 s, fwd+bwd
>19 min. This probe isolates gradients per component:

  1. LSTM-alone forward / grad        ((B, 30, 1000) input, H=212, 2-layer bi)
  2. CNN-alone grad                   (B*2*30 frames)
  3. flow-alone grad                  (direct (B, 1367) condition vector)
  4. encoder-alone grad               (CNN -> LSTM -> concat)

Usage: python scripts/video_compile_probe2.py [batch]
Writes results/video_compile_probe2.json.
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
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32

    from bcnf_tpu import CondRealNVP, load_config
    from bcnf_tpu.utils.misc import inn_nll_loss

    config = load_config(
        "{{BCNF_ROOT}}/configs/runs/dev/videos_CNN_LSTM_large.yaml", verify=False
    )
    model = CondRealNVP.from_config(config)
    params = model.init(jax.random.key(0))

    rng = np.random.default_rng(0)
    videos = jnp.asarray(rng.random((batch, 2, 30, 90, 160)), jnp.float32)
    cams = jnp.asarray(rng.random((batch, 7)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(batch, 19)), jnp.float32)

    results: dict[str, object] = {}

    def timed(name, fn, *args):
        t0 = time.time()
        try:
            out = fn(*args)
            jax.block_until_ready(out)
        except Exception as e:  # noqa: BLE001
            results[name] = f"{type(e).__name__}: {str(e)[:150]}"
            print(f"{name}: FAILED {results[name]}", flush=True)
            return None
        results[name] = round(time.time() - t0, 1)
        print(f"{name}: {results[name]}s", flush=True)
        return out

    # 1. LSTM alone on the CNN's output shape
    lstm = model.features.feature_networks[2]
    lstm_params = params["features"]["nets"][2]
    seq = jnp.asarray(rng.random((batch, 30, 1000)), jnp.float32)
    timed("lstm_forward", jax.jit(lambda p, x: lstm.apply(p, x)), lstm_params, seq)
    timed("lstm_grad",
          jax.jit(jax.grad(lambda p, x: jnp.sum(lstm.apply(p, x) ** 2))),
          lstm_params, seq)

    # 2. CNN alone grad
    cnn = model.features.feature_networks[1]
    cnn_params = params["features"]["nets"][1]
    timed("cnn_grad",
          jax.jit(jax.grad(lambda p, v: jnp.sum(cnn.apply(p, v) ** 2))),
          cnn_params, videos)

    # 3. flow alone grad (bypass the encoder: patch encode to pass h through)
    h = jnp.asarray(rng.random((batch, 1367)), jnp.float32)
    orig_encode = model.encode
    model.encode = lambda p, conds, rng=None, train=False: conds[0]

    def flow_loss(p, y, h, key):
        z, ld = model.forward(p, y, h, rng=key, train=True)
        return inn_nll_loss(z, ld)

    timed("flow_grad", jax.jit(jax.value_and_grad(flow_loss)),
          params, y, h, jax.random.key(1))
    model.encode = orig_encode

    # 4. encoder alone grad
    timed("encoder_grad",
          jax.jit(jax.grad(lambda p, v, c: jnp.sum(
              model.encode(p, (v, c), None, True) ** 2))),
          params, videos, cams)

    # 5. whole-model grad with ALL dropout disabled (isolates threefry-PRNG
    # compile cost: trajectory configs have dropout 0 and compile in ~14 s;
    # the video config carries dropout 0.407/0.5/0.111)
    model.dropout = 0.0
    # dropout rate is captured at construction: the coupling MLP(s), the
    # CNN, and the LSTM each hold their own copy
    model.coupling.nn_a.dropout_rate = 0.0
    if model.coupling.nn_b is not None:
        model.coupling.nn_b.dropout_rate = 0.0
    cnn.dropout_prob = 0.0
    if hasattr(lstm, "dropout_rate"):
        lstm.dropout_rate = 0.0

    def full_loss(p, y, v, c, key):
        z, ld = model.forward(p, y, v, c, rng=key, train=True)
        return inn_nll_loss(z, ld)

    timed("model_grad_nodropout", jax.jit(jax.value_and_grad(full_loss)),
          params, y, videos, cams, jax.random.key(1))

    # 6. block-boundary remat on top of no-dropout (smaller backward program)
    model.remat = True
    timed("model_grad_nodropout_remat", jax.jit(jax.value_and_grad(full_loss)),
          params, y, videos, cams, jax.random.key(1))

    os.makedirs("results", exist_ok=True)
    with open("results/video_compile_probe2.json", "w") as f:
        json.dump({"device": str(jax.devices()[0]), "batch": batch,
                   "compile_first_s": results}, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
