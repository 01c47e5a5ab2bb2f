#!/usr/bin/env python
"""Per-layer conv-backward compile timings: which layer/layout is the wedge?

probe2 found the CNN gradient costs 355 s of compile (forward: 5 s) while
LSTM/flow grads compile in seconds. This probe times compile+first for the
gradient of each conv layer of the videos_CNN_LSTM_large plan in isolation,
in NCHW (current) and NHWC (TPU-native lanes) layouts, plus an im2col
(patches @ matmul) formulation for the worst layer.

Usage: python scripts/video_compile_probe3.py [frames]
Writes results/video_compile_probe3.json.
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

# videos_CNN_LSTM_large plan (from bcnf_tpu/models/cnn.py shape probing):
# (c_in, c_out, k, stride, pad, input_h, input_w)
LAYERS = [
    (1, 8, 8, 1, (3, 3), 90, 160),
    (8, 16, 5, 1, (3, 3), 44, 79),   # reference padding quirk: pad from k=8
    (16, 32, 3, 1, (2, 2), 23, 40),  # pad from k=5
]


def main() -> None:
    frames = int(sys.argv[1]) if len(sys.argv) > 1 else 1920  # 32 * 2 cams * 30 t

    results: dict[str, object] = {}

    def timed(name, fn, *args):
        t0 = time.time()
        try:
            out = fn(*args)
            jax.block_until_ready(out)
        except Exception as e:  # noqa: BLE001
            results[name] = f"{type(e).__name__}: {str(e)[:150]}"
            print(f"{name}: FAILED {results[name]}", flush=True)
            return
        results[name] = round(time.time() - t0, 1)
        print(f"{name}: {results[name]}s", flush=True)

    rng = np.random.default_rng(0)
    for li, (ci, co, k, s, pad, h, w) in enumerate(LAYERS):
        x_nchw = jnp.asarray(rng.random((frames, ci, h, w)), jnp.float32)
        w_oihw = jnp.asarray(rng.random((co, ci, k, k)), jnp.float32) * 0.1

        def loss_nchw(wt, x):
            out = jax.lax.conv_general_dilated(
                x, wt, (s, s), [(pad[0], pad[0]), (pad[1], pad[1])],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
            return jnp.sum(out ** 2)

        timed(f"conv{li+1}_grad_nchw", jax.jit(jax.grad(loss_nchw)), w_oihw, x_nchw)

        x_nhwc = jnp.transpose(x_nchw, (0, 2, 3, 1))
        w_hwio = jnp.transpose(w_oihw, (2, 3, 1, 0))

        def loss_nhwc(wt, x):
            out = jax.lax.conv_general_dilated(
                x, wt, (s, s), [(pad[0], pad[0]), (pad[1], pad[1])],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return jnp.sum(out ** 2)

        timed(f"conv{li+1}_grad_nhwc", jax.jit(jax.grad(loss_nhwc)), w_hwio, x_nhwc)

        # im2col formulation: extract patches once, conv becomes one matmul
        def loss_patches(wt_mat, x):
            patches = jax.lax.conv_general_dilated_patches(
                x, (k, k), (s, s), [(pad[0], pad[0]), (pad[1], pad[1])],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )  # (N, ci*k*k, H', W')
            n, ckk, hh, ww = patches.shape
            out = jnp.einsum("ncxy,co->noxy", patches.reshape(n, ckk, hh, ww), wt_mat)
            return jnp.sum(out ** 2)

        w_mat = w_oihw.reshape(co, ci * k * k).T  # (ci*k*k, co)
        timed(f"conv{li+1}_grad_patches", jax.jit(jax.grad(loss_patches)), w_mat, x_nchw)

    # whole 3-layer tower (conv+relu+maxpool) grad in both layouts:
    # distinguishes per-layer cost from composition blowup
    ws_oihw = [jnp.asarray(rng.random((co, ci, k, k)), jnp.float32) * 0.1
               for ci, co, k, _, _, _, _ in LAYERS]
    x0_nchw = jnp.asarray(rng.random((frames, 1, 90, 160)), jnp.float32)

    def tower_nchw(ws, x):
        for (ci, co, k, s, pad, _, _), wt in zip(LAYERS, ws):
            x = jax.lax.conv_general_dilated(
                x, wt, (s, s), [(pad[0], pad[0]), (pad[1], pad[1])],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            x = jax.nn.relu(x)
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 1, 2, 2), (1, 1, 2, 2), "VALID")
        return jnp.sum(x ** 2)

    timed("tower_grad_nchw", jax.jit(jax.grad(tower_nchw)), ws_oihw, x0_nchw)

    ws_hwio = [jnp.transpose(wt, (2, 3, 1, 0)) for wt in ws_oihw]
    x0_nhwc = jnp.transpose(x0_nchw, (0, 2, 3, 1))

    def tower_nhwc(ws, x):
        for (ci, co, k, s, pad, _, _), wt in zip(LAYERS, ws):
            x = jax.lax.conv_general_dilated(
                x, wt, (s, s), [(pad[0], pad[0]), (pad[1], pad[1])],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x)
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return jnp.sum(x ** 2)

    timed("tower_grad_nhwc", jax.jit(jax.grad(tower_nhwc)), ws_hwio, x0_nhwc)

    os.makedirs("results", exist_ok=True)
    with open("results/video_compile_probe3.json", "w") as f:
        json.dump({"device": str(jax.devices()[0]), "frames": frames,
                   "compile_first_s": results}, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
