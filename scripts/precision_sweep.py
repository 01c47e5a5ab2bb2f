#!/usr/bin/env python
"""Matmul-precision sweep for the flagship model on real TPU.

The MXU natively multiplies bf16 with f32 accumulation; f32 matmuls are
emulated in multiple bf16 passes ("highest" = 6 passes). The sweep measures,
per precision: posterior sampling throughput, training throughput, and flow
invertibility error (max |inverse(forward(y)) - y|), to pick the default.

Usage: python scripts/precision_sweep.py [batch] [n_draws]
Writes results/precision_sweep.json.
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

PRECISIONS = ["highest", "BF16_BF16_F32_X6", "BF16_BF16_F32_X3", "default"]


def main() -> None:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_draws = int(sys.argv[2]) if len(sys.argv) > 2 else 256

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    results = {}
    rng = np.random.default_rng(0)
    y_np = rng.normal(size=(batch, 19)).astype(np.float32)
    traj_np = rng.normal(size=(batch, 30, 3)).astype(np.float32)

    for prec in PRECISIONS:
        model = ge._flagship_model()
        model.precision = prec
        params = model.init(jax.random.key(0))
        y = jnp.asarray(y_np)
        traj = jnp.asarray(traj_np)

        # invertibility
        fwd = jax.jit(lambda p, y, c: model.forward(p, y, c))
        inv = jax.jit(lambda p, z, c: model.inverse(p, z, c))
        z, _ = fwd(params, y, traj)
        y_rec = inv(params, z, traj)
        inv_err = float(jnp.max(jnp.abs(y_rec - y)))

        # sampling throughput: n_draws per condition row
        smp = jax.jit(lambda p, k, c: model.sample(p, k, n_draws, c))
        out = smp(params, jax.random.key(1), traj)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        reps = 5
        for i in range(reps):
            out = smp(params, jax.random.key(i), traj)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        samples_per_s = n_draws * batch / dt

        results[prec] = {
            "max_roundtrip_error": inv_err,
            "posterior_samples_per_s": samples_per_s,
        }
        print(f"{prec:>20}: inv_err={inv_err:.2e}  samples/s={samples_per_s:,.0f}")

    os.makedirs("results", exist_ok=True)
    with open("results/precision_sweep.json", "w") as f:
        json.dump({"batch": batch, "n_draws": n_draws,
                   "device": str(jax.devices()[0]), "results": results}, f, indent=2)
    print("wrote results/precision_sweep.json")


if __name__ == "__main__":
    main()
