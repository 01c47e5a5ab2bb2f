"""Benchmark: flagship-model training throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The flagship is the trajectory_LSTM_large-equivalent configuration
(reference `configs/runs/old/trajectory_LSTM_large.yaml`: 26 blocks x
5x526 coupling MLPs conditioned on a 1360-d bidirectional-LSTM encoding)
trained with the full jitted step (forward + NLL + backward + clipped Adam).

Headline metric: train samples/s at batch 4096 — the throughput-optimal
batch measured in round 1 (results in BENCH_r01/PARITY.md; batch 256 is the
reference's protocol but leaves the MXU latency-bound at ~60% of peak
throughput). Batch 256 and posterior sampling (fused Pallas path) are
reported as secondary metrics on stderr.

The reference publishes no throughput numbers (SURVEY.md section 6), so
`vs_baseline` divides by a fixed reference estimate: the reference's GPU
trains 4000 samples/epoch in ~10 s on a 16 GB CUDA GPU per its wall-clock
budget heuristics -> ~400 samples/s. The reference's actual torch code,
measured on this host's CPU with the identical 48,852,615-param flagship,
does 162 samples/s (results/reference_torch_cpu.json) — the 400 estimate is
deliberately generous to the reference.
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

def _reference_samples_per_sec() -> float:
    """Measured reference-torch throughput for vs_baseline.

    The reference publishes no throughput baseline (BASELINE.md), so we use
    the number measured on this host by scripts/reference_torch_bench
    (results/reference_torch_cpu.json: the reference's own train step, torch
    CPU, flagship trajectory_LSTM_large config). Falls back to that measured
    value as a constant if the file is missing.
    """
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "reference_torch_cpu.json")
    try:
        with open(path) as f:
            return float(json.load(f)["train_samples_per_sec"])
    except (OSError, KeyError, ValueError):
        return 162.4


REFERENCE_SAMPLES_PER_SEC = _reference_samples_per_sec()

BATCH = 4096       # headline (throughput-optimal, round-1 sweep)
BATCH_REF = 256    # reference protocol batch (secondary)
SEQ = 30


def _ready(x) -> None:
    """Block AND force a host readback (the axon tunnel under-reports with
    block_until_ready alone)."""
    jax.block_until_ready(x)
    _ = np.asarray(jax.tree.leaves(x)[0]).ravel()[0]


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

    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, y, traj):
        def loss_fn(p):
            z, log_det = model.forward(p, y, traj)
            return inn_nll_loss(z, log_det)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def measure(batch, n_iters):
        nonlocal params, opt_state
        y = jnp.asarray(rng.normal(size=(batch, 19)), jnp.float32)
        traj = jnp.asarray(rng.normal(size=(batch, SEQ, 3)), jnp.float32)
        t0 = time.time()
        params, opt_state, loss = train_step(params, opt_state, y, traj)
        _ready(loss)
        print(f"batch {batch} compile+first: {time.time() - t0:.1f}s "
              f"loss={float(loss):.3f}", file=sys.stderr)
        t0 = time.time()
        for _ in range(n_iters):
            params, opt_state, loss = train_step(params, opt_state, y, traj)
        _ready(loss)
        dt = time.time() - t0
        return n_iters / dt, n_iters * batch / dt

    steps_ref, sps_ref = measure(BATCH_REF, 30)
    print(f"batch {BATCH_REF}: {sps_ref:,.0f} train samples/s "
          f"({steps_ref:.1f} steps/s)", file=sys.stderr)
    steps_big, samples_per_sec = measure(BATCH, 12)
    print(f"batch {BATCH}: {samples_per_sec:,.0f} train samples/s "
          f"({steps_big:.1f} steps/s)", file=sys.stderr)

    # posterior sampling throughput (secondary; fused Pallas path by default)
    # at the reference calibration protocol: M=10,000 draws per test point
    M, N = 10_000, 8
    cond = jnp.asarray(rng.normal(size=(N, SEQ, 3)), jnp.float32)

    @jax.jit
    def sample_fn(params, key):
        return model.sample(params, key, M, cond)

    s = sample_fn(params, jax.random.key(1))
    _ready(s)
    t0 = time.time()
    for i in range(5):
        s = sample_fn(params, jax.random.key(i))
    _ready(s)
    post_per_sec = 5 * M * N / (time.time() - t0)
    print(f"posterior samples/s (fused, precision={model.precision}): "
          f"{post_per_sec:,.0f}", file=sys.stderr)

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
