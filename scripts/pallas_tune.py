#!/usr/bin/env python
"""Tune the fused coupling kernel against the XLA chain on real TPU.

Sweeps batch tile size and lane-padding of the hidden width for the flagship
coupling shape (d_a=10, d_b=9, H=526, 5 layers, reference
`configs/runs/old/trajectory_LSTM_large.yaml` nested_sizes), at the posterior
-sampling batch size (n_draws x n_conditions). Writes results/pallas_tune.json.

Usage: python scripts/pallas_tune.py [B]
"""

from __future__ import annotations

import functools
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

from bcnf_tpu.ops.coupling_kernel import fused_affine_coupling

D_A, D_B, H, N_HIDDEN = 10, 9, 526, 3  # 5-layer MLP: in, 3 hidden, out


def make_weights(key, h: int):
    ks = jax.random.split(key, 2 * N_HIDDEN + 4)
    s = 0.05
    w1y = s * jax.random.normal(ks[0], (D_A, h))
    b1 = s * jax.random.normal(ks[1], (h,))
    wm = [s * jax.random.normal(ks[2 + 2 * i], (h, h)) for i in range(N_HIDDEN)]
    bm = [s * jax.random.normal(ks[3 + 2 * i], (h,)) for i in range(N_HIDDEN)]
    wout = s * jax.random.normal(ks[-2], (h, 2 * D_B))
    bout = s * jax.random.normal(ks[-1], (2 * D_B,))
    return w1y, b1, wm, bm, wout, bout


def pad_weights(weights, h_pad: int):
    """Zero-pad hidden width to h_pad; exact same function (gelu(0)=0)."""
    w1y, b1, wm, bm, wout, bout = weights
    h = w1y.shape[1]
    pw = lambda w: jnp.pad(w, ((0, 0), (0, h_pad - h)))
    pb = lambda b: jnp.pad(b, (0, h_pad - h))
    wm_p = [jnp.pad(w, ((0, h_pad - h), (0, h_pad - h))) for w in wm]
    return pw(w1y), pb(b1), wm_p, [pb(b) for b in bm], jnp.pad(wout, ((0, h_pad - h), (0, 0))), bout


def xla_chain(x_a, x_b, h_proj, weights):
    w1y, b1, wm, bm, wout, bout = weights
    x = jax.nn.gelu(x_a @ w1y + b1 + h_proj)
    for w, b in zip(wm, bm):
        x = jax.nn.gelu(x @ w + b)
    out = x @ wout + bout
    t, s = out[:, :D_B], jnp.tanh(out[:, D_B:])
    return jnp.exp(s) * x_b + t, jnp.sum(s, axis=-1)


def bench(fn, *args, reps: int = 10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    rng = np.random.default_rng(0)
    x_a = jnp.asarray(rng.normal(size=(B, D_A)).astype(np.float32))
    x_b = jnp.asarray(rng.normal(size=(B, D_B)).astype(np.float32))

    weights = make_weights(jax.random.key(0), H)
    results = {}

    for label, h_eff, w in [("H526", H, weights), ("H640pad", 640, pad_weights(weights, 640))]:
        h_proj = jnp.asarray(rng.normal(size=(B, h_eff)).astype(np.float32))

        xf = jax.jit(functools.partial(xla_chain, weights=w))
        dt = bench(xf, x_a, x_b, h_proj)
        results[f"xla_{label}"] = B / dt
        print(f"xla      {label}: {B/dt:,.0f} rows/s")

        for block_b in (256, 512, 1024, 2048):
            f = jax.jit(functools.partial(
                fused_affine_coupling,
                inverse=False, block_b=block_b,
            ))
            try:
                dt = bench(f, x_a, x_b, h_proj, w[0], w[1], tuple(w[2]), tuple(w[3]), w[4], w[5])
                results[f"pallas_{label}_b{block_b}"] = B / dt
                print(f"pallas   {label} block_b={block_b}: {B/dt:,.0f} rows/s")
            except Exception as e:
                print(f"pallas   {label} block_b={block_b}: FAILED {type(e).__name__}: {str(e)[:120]}")
                results[f"pallas_{label}_b{block_b}"] = None

    # correctness spot check (unpadded, block 512)
    z_ref, ld_ref = jax.jit(functools.partial(xla_chain, weights=weights))(x_a, x_b, jnp.zeros((B, H)))
    z_k, ld_k = fused_affine_coupling(
        x_a, x_b, jnp.zeros((B, H)), weights[0], weights[1],
        tuple(weights[2]), tuple(weights[3]), weights[4], weights[5],
        inverse=False, block_b=512,
    )
    err = float(jnp.max(jnp.abs(z_k - z_ref)))
    print(f"max |dz| kernel vs xla: {err:.2e}")
    results["max_abs_dz"] = err

    os.makedirs("results", exist_ok=True)
    with open("results/pallas_tune.json", "w") as f:
        json.dump({"B": B, "device": str(jax.devices()[0]), "rows_per_s": results}, f, indent=2)
    print("wrote results/pallas_tune.json")


if __name__ == "__main__":
    main()
