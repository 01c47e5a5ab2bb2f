"""Benchmark: flagship-model training throughput on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} —
secondary metrics (batch-256 reference-protocol throughput, posterior
sampling, and per-batch compile times) ride along as extra keys so the
scorecard records them even when stderr is discarded.

The flagship is the trajectory_LSTM_large-equivalent configuration
(reference `configs/runs/old/trajectory_LSTM_large.yaml`: 26 blocks x
5x526 coupling MLPs conditioned on a 1360-d bidirectional-LSTM encoding)
trained with the full jitted step (forward + NLL + backward + clipped Adam).

Headline metric: train samples/s at batch 4096 — the throughput-optimal
batch measured in round 1 (results in BENCH_r01/PARITY.md; batch 256 is the
reference's protocol but leaves the MXU latency-bound at ~60% of peak
throughput).

Infra armor (round 4): the axon remote-compile service intermittently
degrades (HTTP 500s / 1243 s compiles recorded in BENCH_r03 +
results/batch_sweep.json on 2026-08-20; the same code compiles in 14.8 s
when the service is healthy). Each stage therefore (a) records its
compile+first time in the output JSON, (b) flags `compile_degraded` and
retries the compile once through the persistent cache when it exceeds
COMPILE_SANE_S, and (c) retries transient RuntimeErrors. Throughput is the
best of three timing windows to defend against tunnel hiccups.

The reference publishes no throughput numbers (SURVEY.md section 6):
`vs_baseline` divides by the reference's own train step measured on this
host's CPU at the identical 48,852,615-param flagship
(results/reference_torch_cpu.json, 162 samples/s).
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
COMPILE_SANE_S = 120.0  # healthy compiles are 14-25 s (docs/PERF.md)
TIMING_WINDOWS = 5      # throughput = best window (tunnel-hiccup defense);
                        # per-window values are recorded in the JSON


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

    def make_step():
        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, y, traj):
            def loss_fn(p):
                z, log_det = model.forward(p, y, traj)
                return inn_nll_loss(z, log_det)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return train_step

    extra: dict[str, object] = {}

    def measure(batch, n_iters):
        nonlocal params, opt_state
        y = jnp.asarray(rng.normal(size=(batch, 19)), jnp.float32)
        traj = jnp.asarray(rng.normal(size=(batch, SEQ, 3)), jnp.float32)

        compile_s = None
        for attempt in range(3):
            step = make_step()
            t0 = time.time()
            try:
                params, opt_state, loss = step(params, opt_state, y, traj)
                _ready(loss)
            except RuntimeError as e:  # transient tunnel / remote-compile 500s
                print(f"batch {batch} attempt {attempt}: {str(e)[:200]}",
                      file=sys.stderr)
                extra[f"b{batch}_compile_error_{attempt}"] = str(e)[:200]
                time.sleep(20)
                continue
            compile_s = time.time() - t0
            print(f"batch {batch} compile+first: {compile_s:.1f}s "
                  f"loss={float(loss):.3f}", file=sys.stderr)
            if compile_s > COMPILE_SANE_S and attempt == 0:
                # Remote-compile degradation (BENCH_r03's 1243 s): the
                # executable is now in the persistent cache, so one retry
                # with a fresh jit instance shows the cache-hit time and
                # flags the run instead of silently absorbing the outlier.
                extra[f"b{batch}_compile_degraded_s"] = round(compile_s, 1)
                print(f"batch {batch}: compile degraded "
                      f"({compile_s:.0f}s > {COMPILE_SANE_S:.0f}s), retrying "
                      "via persistent cache", file=sys.stderr)
                continue
            break
        else:
            raise RuntimeError(f"batch {batch}: compile failed 3 times")
        extra[f"b{batch}_compile_first_s"] = round(compile_s, 1)

        windows = []
        for _ in range(TIMING_WINDOWS):
            t0 = time.time()
            for _ in range(n_iters):
                params, opt_state, loss = step(params, opt_state, y, traj)
            _ready(loss)
            dt = time.time() - t0
            windows.append(n_iters * batch / dt)
        # per-window throughput goes into the JSON so tunnel variance is
        # visible in the recorded artifact (VERDICT r4 demand #4), not just
        # absorbed by best-of-N
        extra[f"b{batch}_window_sps"] = [round(w, 1) for w in windows]
        extra[f"b{batch}_window_spread_pct"] = round(
            100.0 * (max(windows) - min(windows)) / max(windows), 1)
        best_sps = max(windows)
        return best_sps / batch, best_sps

    steps_ref, sps_ref = measure(BATCH_REF, 30)
    extra["b256_samples_per_sec"] = round(sps_ref, 1)
    print(f"batch {BATCH_REF}: {sps_ref:,.0f} train samples/s "
          f"({steps_ref:.1f} steps/s)", file=sys.stderr)
    steps_big, samples_per_sec = measure(BATCH, 12)
    extra["b4096_samples_per_sec"] = round(samples_per_sec, 1)
    print(f"batch {BATCH}: {samples_per_sec:,.0f} train samples/s "
          f"({steps_big:.1f} steps/s)", file=sys.stderr)
    # batch 8192 rides the fused train kernel (the XLA path reproducibly
    # fails to compile at 8192 — results/batch_sweep.json); secondary metric
    try:
        _, sps_8k = measure(8192, 6)
        extra["b8192_samples_per_sec"] = round(sps_8k, 1)
        print(f"batch 8192: {sps_8k:,.0f} train samples/s", file=sys.stderr)
    except RuntimeError as e:  # secondary: never sink the headline
        extra["b8192_error"] = str(e)[:200]
        print(f"batch 8192 failed: {str(e)[:200]}", file=sys.stderr)

    # posterior sampling throughput (secondary) at the reference calibration
    # protocol: M=10,000 draws per test point
    M, N = 10_000, 8
    cond = jnp.asarray(rng.normal(size=(N, SEQ, 3)), jnp.float32)

    @jax.jit
    def sample_fn(params, key):
        return model.sample(params, key, M, cond)

    try:
        t0 = time.time()
        s = sample_fn(params, jax.random.key(1))
        _ready(s)
        extra["sample_compile_first_s"] = round(time.time() - t0, 1)
        best = 0.0
        for _ in range(TIMING_WINDOWS):
            t0 = time.time()
            for i in range(5):
                s = sample_fn(params, jax.random.key(i))
            _ready(s)
            best = max(best, 5 * M * N / (time.time() - t0))
        extra["posterior_samples_per_sec"] = round(best, 0)
        print(f"posterior samples/s (precision={model.precision}): "
              f"{best:,.0f}", file=sys.stderr)
    except RuntimeError as e:  # secondary metric: never sink the headline
        extra["posterior_error"] = str(e)[:200]
        print(f"posterior sampling failed: {str(e)[:200]}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "train_samples_per_sec",
                "value": round(samples_per_sec, 1),
                "unit": "samples/s",
                "vs_baseline": round(samples_per_sec / REFERENCE_SAMPLES_PER_SEC, 3),
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
