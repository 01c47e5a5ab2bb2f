#!/usr/bin/env python
"""Isolate the videos_CNN_LSTM_large compile wedge on TPU.

The full training step for the video model hung >30 min in compile over the
axon tunnel while every trajectory-model program compiles in seconds. This
probe compiles the pieces separately with stopwatches so the pathological
stage is identifiable:

  1. CNN feature extraction forward            (conv + pool over B*cams*T frames)
  2. full encoder forward (CNN -> LSTM -> cat)
  3. whole-model forward (encoder + 26-block flow)
  4. whole-model forward+backward (value_and_grad)
  5. forward+backward with block-boundary remat

Usage: python scripts/video_compile_probe.py [batch]
Writes results/video_compile_probe.json.
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

    results: dict[str, float] = {}

    def timed(name, fn, *args):
        t0 = time.time()
        try:
            out = fn(*args)
            jax.block_until_ready(out)
        except Exception as e:  # noqa: BLE001 - probe must report, not die
            results[name] = f"{type(e).__name__}: {str(e)[:150]}"
            print(f"{name}: FAILED {results[name]}", flush=True)
            return None
        dt = time.time() - t0
        results[name] = round(dt, 1)
        print(f"{name}: {dt:.1f}s", flush=True)
        return out

    # 1. CNN tower alone (stack stage 1; stage 0 is the ConcatenateCondition marker)
    cnn = model.features.feature_networks[1]
    cnn_params = params["features"]["nets"][1]
    timed("cnn_forward", jax.jit(lambda p, v: cnn.apply(p, v)), cnn_params, videos)

    # 2. full encoder
    timed("encoder_forward", jax.jit(lambda p, v, c: model.encode(p, (v, c), None, False)),
          params, videos, cams)

    # 3. whole-model forward
    timed("model_forward", jax.jit(lambda p, y, v, c: model.forward(p, y, v, c)),
          params, y, videos, cams)

    # 4. forward+backward
    def loss(p, y, v, c, key):
        z, ld = model.forward(p, y, v, c, rng=key, train=True)
        return inn_nll_loss(z, ld)

    timed("model_grad", jax.jit(jax.value_and_grad(loss)),
          params, y, videos, cams, jax.random.key(1))

    # 5. forward+backward with remat over flow blocks
    model.remat = True
    timed("model_grad_remat", jax.jit(jax.value_and_grad(loss)),
          params, y, videos, cams, jax.random.key(1))

    os.makedirs("results", exist_ok=True)
    with open("results/video_compile_probe.json", "w") as f:
        json.dump({"device": str(jax.devices()[0]), "batch": batch,
                   "compile_first_s": results}, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
