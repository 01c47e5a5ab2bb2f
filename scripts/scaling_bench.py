#!/usr/bin/env python
"""Data-parallel scaling-efficiency harness.

Measures full-train-step throughput (weak scaling: fixed per-device batch) at
1, 2, 4, ..., N devices and reports efficiency vs. the single-device rate
(BASELINE.md north-star: >=80% DP scaling efficiency at N >= 2 hosts).

On a CPU host, run under the 8-device virtual platform to validate the
sharding path:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_bench.py
On a pod slice it measures real ICI scaling (devices = all visible chips).
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
import optax

PER_DEVICE_BATCH = 64
SEQ = 30


def measure(n_devices: int, model, params_init, iters: int = 10) -> float:
    from bcnf_tpu.parallel import make_mesh, replicate, shard_batch
    from bcnf_tpu.utils.misc import inn_nll_loss

    mesh = make_mesh(n_devices)
    B = PER_DEVICE_BATCH * n_devices
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(B, 19)), jnp.float32)
    traj = jnp.asarray(rng.normal(size=(B, SEQ, 3)), jnp.float32)

    params = replicate(mesh, params_init)
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-4))
    opt_state = replicate(mesh, optimizer.init(params))
    y, traj = shard_batch(mesh, (y, traj))

    @jax.jit
    def step(params, opt_state, y, traj):
        def loss_fn(p):
            z, ld = model.forward(p, y, traj)
            return inn_nll_loss(z, ld)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = step(params, opt_state, y, traj)
    loss.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, loss = step(params, opt_state, y, traj)
    loss.block_until_ready()
    dt = (time.perf_counter() - t0) / iters
    return B / dt  # samples/s


def main() -> None:
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _flagship_model
    from bcnf_tpu.parallel import ensure_cpu_devices

    ensure_cpu_devices(8)

    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 0.1
    model = _flagship_model(size_scale=scale)
    params = model.init(jax.random.key(0))

    n_all = len(jax.devices())
    counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_all]
    results = {}
    base = None
    for n in counts:
        sps = measure(n, model, params)
        eff = 1.0 if base is None else sps / (base * n)
        if base is None:
            base = sps
        results[n] = {"samples_per_sec": round(sps, 1), "efficiency": round(eff, 3)}
        print(f"devices={n:2d}  samples/s={sps:10.1f}  efficiency={eff:.3f}", flush=True)

    backend = jax.default_backend()
    payload = {
        "backend": backend,
        "n_physical_cpus": os.cpu_count(),
        "scaling": results,
        "per_device_batch": PER_DEVICE_BATCH,
        "model_scale": scale,
    }
    if backend == "cpu":
        payload["note"] = (
            "CPU virtual-device run: validates the sharded step end-to-end, but "
            "devices oversubscribe the physical cores, so 'efficiency' measures "
            "core contention, not interconnect scaling. Flat total samples/s "
            "across device counts is the expected correct result here; real DP "
            "efficiency must be measured on a multi-chip TPU slice."
        )
    print(json.dumps(payload))
    os.makedirs("results", exist_ok=True)
    with open(f"results/scaling_{backend}.json", "w") as f:
        json.dump(payload, f, indent=2)


if __name__ == "__main__":
    main()
