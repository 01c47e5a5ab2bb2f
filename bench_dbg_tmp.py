"""Benchmark: flagship-model training throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The flagship is the trajectory_LSTM_large-equivalent configuration
(reference `configs/runs/old/trajectory_LSTM_large.yaml`: 26 blocks x
5x526 coupling MLPs conditioned on a 1360-d bidirectional-LSTM encoding,
~37M params) trained with the full jitted step (forward + NLL + backward +
clipped Adam). The reference publishes no throughput numbers
(SURVEY.md section 6), so `vs_baseline` is measured against a fixed reference
estimate: the reference's GPU trains 4000 samples/epoch in ~10 s on a 16GB
CUDA GPU per its wall-clock budget heuristics -> ~400 samples/s. We report
train samples/s; higher is better.

Secondary metrics (posterior samples/s, steps/s) go to stderr.
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

# Estimated reference GPU throughput (samples/s) for vs_baseline; the
# reference publishes no throughput baseline (BASELINE.md).
REFERENCE_SAMPLES_PER_SEC = 400.0

BATCH = 256
SEQ = 30


def main() -> None:
    from __graft_entry__ import _flagship_model
    from bcnf_tpu.utils.misc import inn_nll_loss

    model = _flagship_model()
    params = model.init(jax.random.key(0))
    n_params = sum(int(x.size) for x in jax.tree.leaves(params))
    print(f"flagship params: {n_params:,}; devices: {jax.devices()}", file=sys.stderr)

    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-4))
    opt_state = optimizer.init(params)

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(size=(BATCH, 19)), jnp.float32)
    traj = jnp.asarray(rng.normal(size=(BATCH, SEQ, 3)), jnp.float32)

    @jax.jit
    def train_step(params, opt_state, y, traj):
        def loss_fn(p):
            z, log_det = model.forward(p, y, traj)
            return inn_nll_loss(z, log_det)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    # warmup / compile
    t0 = time.time()
    params, opt_state, loss = train_step(params, opt_state, y, traj)
    loss.block_until_ready()
    print(f"train_step compile+first: {time.time() - t0:.1f}s loss={float(loss):.3f}", file=sys.stderr)

    n_iters = 30
    for k in range(3):
        t0 = time.time()
        for _ in range(n_iters):
            params, opt_state, loss = train_step(params, opt_state, y, traj)
        loss.block_until_ready()
        dt = time.time() - t0
        print(f"round {k}: {dt/n_iters*1e3:.2f} ms/step", file=sys.stderr)
    steps_per_sec = n_iters / dt
    samples_per_sec = steps_per_sec * BATCH

    # batch-scaling (secondary): batch 256 is the reference protocol but is
    # latency-bound on the MXU; larger batches show the throughput headroom
    for big in (1024, 4096):
        yb = jnp.asarray(rng.normal(size=(big, 19)), jnp.float32)
        tb = jnp.asarray(rng.normal(size=(big, SEQ, 3)), jnp.float32)
        pb, ob, lb = train_step(params, opt_state, yb, tb)
        lb.block_until_ready()
        t0 = time.time()
        n = 10
        for _ in range(n):
            pb, ob, lb = train_step(params, opt_state, yb, tb)
        lb.block_until_ready()
        print(f"batch {big}: {n * big / (time.time() - t0):,.0f} train samples/s", file=sys.stderr)
        del pb, ob

    # posterior sampling throughput (secondary)
    M = 512
    cond = traj[:8]

    @jax.jit
    def sample_fn(params, key):
        return model.sample(params, key, M, cond)

    s = sample_fn(params, jax.random.key(1))
    s.block_until_ready()
    t0 = time.time()
    for i in range(5):
        s = sample_fn(params, jax.random.key(i))
    s.block_until_ready()
    post_per_sec = 5 * M * cond.shape[0] / (time.time() - t0)
    print(
        f"steps/s: {steps_per_sec:.2f}  train samples/s: {samples_per_sec:.0f}  "
        f"posterior samples/s: {post_per_sec:.0f}",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec",
                "value": round(samples_per_sec, 1),
                "unit": "samples/s",
                "vs_baseline": round(samples_per_sec / REFERENCE_SAMPLES_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
