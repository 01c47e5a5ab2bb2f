#!/usr/bin/env python
"""Fused Pallas LSTM recurrence vs lax.scan on real TPU (flagship encoder).

Measures the flagship LSTM encoder (2-layer bidirectional, H=140, T=30) both
standalone (forward and forward+backward) and decides the BCNF_FUSED_LSTM
default. Writes results/lstm_kernel_bench.json.
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

from bcnf_tpu.ops.lstm import _direction_scan  # noqa: E402
from bcnf_tpu.ops.lstm_kernel import fused_direction  # noqa: E402
from bcnf_tpu.ops.lstm import lstm_cell_init  # noqa: E402

T, F, H = 30, 3, 140


def bench(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return (time.perf_counter() - t0) / reps


def bench_fused(fn, *args):
    """Bench the kernel under test, retrying a failed compile once (30 s
    apart) to separate transient tunnel hiccups from reproducible
    program-specific failures. Returns (dt, None) or (None, failure) where
    `failure` is a structured record of both attempts — a reproducible
    can't-compile IS the measurement result for that cell, recorded as a
    deliberate datapoint (fused_us: null), not a broken artifact."""
    errors = []
    for attempt in range(2):
        try:
            return bench(fn, *args), None
        except Exception as e:  # noqa: BLE001
            errors.append(f"attempt {attempt}: {type(e).__name__}: {str(e)[:160]}")
            print(f"  fused compile failed ({type(e).__name__}), "
                  f"{'retrying in 30 s' if attempt == 0 else 'reproducible'}",
                  file=sys.stderr)
            if attempt == 0:
                time.sleep(30)
    return None, errors


def main() -> None:
    results = {}
    params = lstm_cell_init(jax.random.key(0), F, H)
    for B in (256, 1024, 4096):
        x = jax.random.normal(jax.random.key(1), (B, T, F))

        scan_f = jax.jit(lambda p, x: _direction_scan(p, x, H, False))
        fused_f = jax.jit(lambda p, x: fused_direction(p, x, H, False))
        dt_s = bench(scan_f, params, x)
        dt_k, failure = bench_fused(fused_f, params, x)
        if failure is not None:
            results[f"fwd_B{B}"] = {"scan_us": dt_s * 1e6, "fused_us": None,
                                    "fused_compile_failed": failure}
            print(f"fwd  B={B}: scan {dt_s*1e6:8.1f}us  fused CANNOT COMPILE")
            continue
        results[f"fwd_B{B}"] = {"scan_us": dt_s * 1e6, "fused_us": dt_k * 1e6,
                                "speedup": dt_s / dt_k}
        print(f"fwd  B={B}: scan {dt_s*1e6:8.1f}us  fused {dt_k*1e6:8.1f}us  "
              f"{dt_s/dt_k:.2f}x")

        def loss_scan(p, x):
            return jnp.sum(_direction_scan(p, x, H, False) ** 2)

        def loss_fused(p, x):
            return jnp.sum(fused_direction(p, x, H, False) ** 2)

        gs = jax.jit(jax.grad(loss_scan))
        gk = jax.jit(jax.grad(loss_fused))
        dt_s = bench(gs, params, x)
        dt_k, failure = bench_fused(gk, params, x)
        if failure is not None:
            results[f"grad_B{B}"] = {"scan_us": dt_s * 1e6, "fused_us": None,
                                     "fused_compile_failed": failure}
            print(f"grad B={B}: scan {dt_s*1e6:8.1f}us  fused CANNOT COMPILE")
            continue
        results[f"grad_B{B}"] = {"scan_us": dt_s * 1e6, "fused_us": dt_k * 1e6,
                                 "speedup": dt_s / dt_k}
        print(f"grad B={B}: scan {dt_s*1e6:8.1f}us  fused {dt_k*1e6:8.1f}us  "
              f"{dt_s/dt_k:.2f}x")

    # numeric check (fused vs scan) at a batch where the fused fwd runs
    try:
        x = jax.random.normal(jax.random.key(1), (1024, T, F))
        ref = np.asarray(_direction_scan(params, x, H, False))
        out = np.asarray(fused_direction(params, x, H, False))
        results["max_abs_err"] = float(np.abs(out - ref).max())
        results["mean_abs_err"] = float(np.abs(out - ref).mean())
        results["ref_abs_mean"] = float(np.abs(ref).mean())
        print(f"max |dh|: {results['max_abs_err']:.2e} "
              f"(mean {results['mean_abs_err']:.2e}, |ref| {results['ref_abs_mean']:.2e})")
    except Exception as e:  # noqa: BLE001 - never write a placeholder zero
        results["max_abs_err_error"] = f"{type(e).__name__}: {str(e)[:180]}"
        print(f"numeric check FAILED: {type(e).__name__}")

    os.makedirs("results", exist_ok=True)
    with open("results/lstm_kernel_bench.json", "w") as f:
        json.dump({"device": str(jax.devices()[0]), "T": T, "H": H,
                   "results": results}, f, indent=2)
    print("wrote results/lstm_kernel_bench.json")


if __name__ == "__main__":
    main()
