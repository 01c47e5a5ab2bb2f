#!/usr/bin/env python
"""Whole-flow fused kernel vs XLA sampling path on real TPU (flagship model).

Usage: python scripts/flow_kernel_bench.py [n_conds] [n_draws]
Writes results/flow_kernel_bench.json.
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


def bench(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    draws = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    B = N * draws

    import __graft_entry__ as ge
    from bcnf_tpu.ops.flow_kernel import fused_flow

    model = ge._flagship_model()
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.normal(size=(N, 30, 3)).astype(np.float32))
    h = model.encode(params, (cond,))
    kargs, h_proj = model._fused_flow_args(params, h)
    z = jnp.asarray(rng.normal(size=(B, model.size)).astype(np.float32))
    z3 = z.reshape(draws, N, model.size)

    results = {}

    for prec_label, model_prec in [("highest", "highest"), ("default", "default")]:
        model.precision = model_prec

        def xla_inv(z3):
            with jax.default_matmul_precision(model_prec):
                return jax.vmap(lambda zz: model.inverse_given_h(params, zz, h))(z3)

        dt = bench(jax.jit(xla_inv), z3)
        results[f"xla_{prec_label}"] = B / dt
        print(f"xla    {prec_label:>8}: {B/dt:,.0f} samples/s")

        for bb in (512, 1024):
            kernel_prec = "highest" if model_prec == "highest" else "default"
            f = jax.jit(lambda z, hp: fused_flow(
                z, hp, **kargs, inverse=True, n_cond=N, block_b=bb, precision=kernel_prec
            ))
            try:
                dt = bench(f, z, h_proj)
                results[f"pallas_{prec_label}_b{bb}"] = B / dt
                print(f"pallas {prec_label:>8} block_b={bb}: {B/dt:,.0f} samples/s")
            except Exception as e:
                print(f"pallas {prec_label:>8} block_b={bb}: FAILED {str(e)[:100]}")
                results[f"pallas_{prec_label}_b{bb}"] = None

    # lane-padded variant (H 526 -> 640)
    from bcnf_tpu.ops.flow_kernel import pad_hidden

    kargs_p, h_proj_p = pad_hidden(kargs, h_proj)
    for bb in (512, 1024):
        f = jax.jit(lambda z, hp: fused_flow(
            z, hp, **kargs_p, inverse=True, n_cond=N, block_b=bb, precision="default"
        ))
        try:
            dt = bench(f, z, h_proj_p)
            results[f"pallas_default_pad_b{bb}"] = B / dt
            print(f"pallas  default pad640 block_b={bb}: {B/dt:,.0f} samples/s")
        except Exception as e:
            print(f"pallas  default pad640 block_b={bb}: FAILED {str(e)[:100]}")
            results[f"pallas_default_pad_b{bb}"] = None

    # correctness vs XLA highest
    model.precision = "highest"
    with jax.default_matmul_precision("highest"):
        y_ref = jax.vmap(lambda zz: model.inverse_given_h(params, zz, h))(z3[:4])
    y_k = fused_flow(
        z3[:4].reshape(4 * N, model.size), h_proj, **kargs,
        inverse=True, n_cond=N, block_b=512, precision="highest",
    ).reshape(4, N, model.size)
    err = float(jnp.max(jnp.abs(y_k - y_ref)))
    print(f"max |dy| fused vs xla (highest): {err:.2e}")
    results["max_abs_dy_highest"] = err

    os.makedirs("results", exist_ok=True)
    with open("results/flow_kernel_bench.json", "w") as f:
        json.dump({"N": N, "draws": draws, "device": str(jax.devices()[0]),
                   "samples_per_s": results}, f, indent=2)
    print("wrote results/flow_kernel_bench.json")


if __name__ == "__main__":
    main()
