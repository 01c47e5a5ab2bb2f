#!/usr/bin/env python
"""Camera-renderer throughput on real TPU: MC (reference-parity) vs analytic.

The reference renders each frame as a 2D histogram of 5000 NumPy-random MC
samples in a per-frame Python loop (`/root/reference/src/bcnf/simulation/camera.py:111-139`)
— SURVEY.md names this the cost driver for the `videos_*` datasets. This
framework renders on-device (vmapped over frames and batch). Reported as
videos/s for the reference protocol shape: 2 cameras x 30 frames x 90x160.

Usage: python scripts/renderer_bench.py [batch]
Writes results/renderer_bench.json.
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

from bcnf_tpu.simulation.camera import record_trajectory  # noqa: E402

T = 30


def bench(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(out).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(out).ravel()[0]
    return (time.perf_counter() - t0) / reps


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)
    # plausible airborne trajectories in front of the cameras
    traj = jnp.asarray(
        rng.normal(size=(B, T, 3)).cumsum(axis=1) * 0.5
        + np.array([10.0, 0.0, 5.0]),
        jnp.float32,
    )
    cam_pos = jnp.asarray([0.0, 0.0, 1.0])
    angle = jnp.asarray(0.0)
    radius = jnp.full((B,), 0.11)

    results = {}
    for mode in ("analytic", "mc"):
        def render_batch(traj, radius):
            keys = jax.random.split(jax.random.key(0), B)
            return jax.vmap(
                lambda t, r, k: record_trajectory(
                    t, cam_pos, angle, r, key=k if mode == "mc" else None, mode=mode
                )
            )(traj, radius, keys)

        f = jax.jit(render_batch)
        dt = bench(f, traj, radius)
        frames_s = B * T / dt
        videos_s = frames_s / (2 * T)  # reference video = 2 cams x T frames
        results[mode] = {
            "frames_per_sec": round(frames_s, 1),
            "two_cam_videos_per_sec": round(videos_s, 1),
        }
        print(f"{mode:>9}: {frames_s:12,.0f} frames/s  "
              f"({videos_s:10,.1f} 2-cam videos/s)")

    # reference-scale context: its per-frame Python+NumPy MC render measures
    # O(1ms); one 2-cam video = 60 frames => O(10) videos/s on CPU.
    os.makedirs("results", exist_ok=True)
    with open("results/renderer_bench.json", "w") as f:
        json.dump({"device": str(jax.devices()[0]), "batch": B, "T": T,
                   "frame": [90, 160], "results": results}, f, indent=2)
    print("wrote results/renderer_bench.json")


if __name__ == "__main__":
    main()
