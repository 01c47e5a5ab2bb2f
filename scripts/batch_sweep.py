#!/usr/bin/env python
"""Training-throughput batch sweep on the flagship model: XLA vs fused
Pallas paths at batch 256..8192. Determines the fused-train gate crossover
empirically and whether batch 8192 is feasible (the round-1 note "compile
OOM at 8192" predates the current backward kernel).

Usage: python scripts/batch_sweep.py [path]   # path in {both, xla, fused}
Writes results/batch_sweep.json.
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCHES = (256, 1024, 2048, 4096, 8192)
SEQ = 30


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    from functools import partial

    from __graft_entry__ import _flagship_model
    from bcnf_tpu.utils.misc import inn_nll_loss

    model = _flagship_model()
    params0 = model.init(jax.random.key(0))
    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-4))
    rng = np.random.default_rng(0)

    results: dict[str, dict] = {}
    for path in (("xla", "fused") if which == "both" else (which,)):
        # route via the measured gate: fused => floor 1, xla => floor inf
        model.fused_train_min_batch = 1 if path == "fused" else 1 << 30
        for batch in BATCHES:
            # deep copy: train_step donates its inputs, and jnp.asarray on a
            # device array is a no-op, so reusing params0 directly would hand
            # the same (deleted) buffers to the next sweep entry
            params = jax.tree.map(jnp.copy, params0)
            opt_state = optimizer.init(params)

            @partial(jax.jit, donate_argnums=(0, 1))
            def train_step(params, opt_state, y, traj):
                def loss_fn(p):
                    z, log_det = model.forward(p, y, traj, train=True)
                    return inn_nll_loss(z, log_det)

                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            y = jnp.asarray(rng.normal(size=(batch, 19)), jnp.float32)
            traj = jnp.asarray(rng.normal(size=(batch, SEQ, 3)), jnp.float32)
            key = f"{path}_b{batch}"
            # a failed compile is retried once (30 s apart): transient tunnel
            # hiccups recover, while a reproducible can't-compile is the
            # measurement result for that cell — recorded as a deliberate
            # datapoint (samples_per_s: null + failure detail), not an
            # "error" that marks the whole artifact broken
            failures: list[str] = []
            for attempt in range(2):
                try:
                    t0 = time.time()
                    params, opt_state, loss = train_step(params, opt_state, y, traj)
                    jax.block_until_ready(loss)
                    _ = float(np.asarray(loss))  # force host readback (axon quirk)
                    compile_s = time.time() - t0
                    n_iters = max(6, min(40, 40960 // batch))
                    t0 = time.time()
                    for _ in range(n_iters):
                        params, opt_state, loss = train_step(params, opt_state, y, traj)
                    jax.block_until_ready(loss)
                    _ = float(np.asarray(loss))
                    dt = time.time() - t0
                    results[key] = {
                        "samples_per_s": round(n_iters * batch / dt, 1),
                        "compile_first_s": round(compile_s, 1),
                        "loss": float(loss),
                    }
                    break
                except Exception as e:  # noqa: BLE001 - OOM/compile failures
                    failures.append(f"attempt {attempt}: {type(e).__name__}: {str(e)[:160]}")
                    if attempt == 0:
                        time.sleep(30)
                        params = jax.tree.map(jnp.copy, params0)
                        opt_state = optimizer.init(params)
            else:
                results[key] = {"samples_per_s": None,
                                "compile_failed": failures}
            print(key, results[key], file=sys.stderr)

    out = {"device": str(jax.devices()[0]), "seq": SEQ, "results": results}
    os.makedirs("results", exist_ok=True)
    with open("results/batch_sweep.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
