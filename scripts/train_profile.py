#!/usr/bin/env python
"""Train-step tuning sweep on real TPU: matmul precision x scan unroll.

Finds the fastest (precision, unroll) configuration for the flagship train
step at the throughput-optimal batch. Writes results/train_profile.json.

Usage: python scripts/train_profile.py [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/bcnf_tpu_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from __graft_entry__ import _flagship_model
    from bcnf_tpu.utils.misc import inn_nll_loss

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(B, 19)), jnp.float32)
    traj = jnp.asarray(rng.normal(size=(B, 30, 3)), jnp.float32)

    def ready(x):
        jax.block_until_ready(x)
        _ = np.asarray(x).ravel()[0]

    results = {}
    for prec in ("highest", "BF16_BF16_F32_X3"):
        for unroll, remat in ((1, False), (2, False), (5, False), (13, False),
                              (1, True), (2, True), (5, True)):
            model = _flagship_model()
            model.precision = prec
            model.scan_unroll = unroll
            model.remat = remat
            params = model.init(jax.random.key(0))
            optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-4))
            opt_state = optimizer.init(params)

            @partial(jax.jit, donate_argnums=(0, 1))
            def train_step(params, opt_state, y, traj, model=model, optimizer=optimizer):
                def loss_fn(p):
                    z, ld = model.forward(p, y, traj)
                    return inn_nll_loss(z, ld)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            key = f"{prec}_u{unroll}" + ("_remat" if remat else "")
            try:
                params, opt_state, loss = train_step(params, opt_state, y, traj)
                ready(loss)
                n = 12
                t0 = time.time()
                for _ in range(n):
                    params, opt_state, loss = train_step(params, opt_state, y, traj)
                ready(loss)
                sps = n * B / (time.time() - t0)
                results[key] = round(sps, 1)
                print(f"prec={prec:>18} unroll={unroll:2d} remat={int(remat)}: {sps:10,.0f} samples/s")
            except Exception as e:
                results[key] = None
                print(f"prec={prec:>18} unroll={unroll:2d} remat={int(remat)}: FAILED {str(e)[:80]}")
            del params, opt_state

    os.makedirs("results", exist_ok=True)
    with open("results/train_profile.json", "w") as f:
        json.dump({"device": str(jax.devices()[0]), "batch": B,
                   "samples_per_sec": results}, f, indent=2)
    print("wrote results/train_profile.json")


if __name__ == "__main__":
    main()
