#!/usr/bin/env python
"""Whole-flow fused kernel vs XLA sampling path on real TPU (flagship model).

Compares posterior-sampling throughput (inverse pass over draws) between the
XLA scan path and the fused Pallas kernel (ops/flow_kernel.py, lane-padded
hidden width) at three matmul fidelities: highest (f32), BF16_BF16_F32_X3
(~2e-3), and default (bf16, ~1e-1 at this depth).

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

PRECISIONS = [
    ("highest", "highest", "highest"),             # label, matmul ctx, kernel mode
    ("x3", "BF16_BF16_F32_X3", "x3"),
    ("default", "default", "default"),
]


def bench(fn, *args, reps=5):
    out = fn(*args)
    # axon tunnel quirk: block_until_ready alone under-reports; force a host
    # readback of a scalar before starting the clock
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
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
    kargs, h_proj = model._fused_flow_args(params, h)  # lane-padded
    z = jnp.asarray(rng.normal(size=(B, model.size)).astype(np.float32))
    z3 = z.reshape(draws, N, model.size)

    results = {}

    for label, ctx, mode in PRECISIONS:
        def xla_inv(z3):
            with jax.default_matmul_precision(ctx):
                return jax.vmap(lambda zz: model.inverse_given_h(params, zz, h))(z3)

        model.precision = ctx
        dt = bench(jax.jit(xla_inv), z3)
        results[f"xla_{label}"] = B / dt
        print(f"xla    {label:>8}: {B/dt:,.0f} samples/s")

        for bb in (512, 1024):
            f = jax.jit(lambda z, hp: fused_flow(
                z, hp, **kargs, inverse=True, n_cond=N, block_b=bb, precision=mode
            ))
            try:
                dt = bench(f, z, h_proj)
                results[f"pallas_{label}_b{bb}"] = B / dt
                print(f"pallas {label:>8} block_b={bb}: {B/dt:,.0f} samples/s")
            except Exception as e:
                print(f"pallas {label:>8} block_b={bb}: FAILED {str(e)[:100]}")
                results[f"pallas_{label}_b{bb}"] = None

    # training step: fused differentiable kernel (fused_flow_train, engaged
    # through model.forward when use_pallas=True) vs the XLA scan path —
    # full value_and_grad + clipped-Adam update on the flagship model
    import optax
    from bcnf_tpu.utils.misc import inn_nll_loss

    optimizer = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(2e-4))
    for B_train in (256, 4096):
        y_tr = jnp.asarray(rng.normal(size=(B_train, model.size)).astype(np.float32))
        c_tr = jnp.asarray(rng.normal(size=(B_train, 30, 3)).astype(np.float32))
        for fused in (False, True):
            model.use_pallas = fused
            model.precision = "highest"

            def train_step(p, opt_state, y, c):
                def loss_fn(pp):
                    z, ld = model.forward(pp, y, c)
                    return inn_nll_loss(z, ld)

                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, opt_state = optimizer.update(grads, opt_state, p)
                return optax.apply_updates(p, updates), opt_state, loss

            step = jax.jit(train_step)
            key = f"train_b{B_train}_{'pallas' if fused else 'xla'}"
            try:
                opt_state = optimizer.init(params)
                p2, opt_state, loss = step(params, opt_state, y_tr, c_tr)
                _ = np.asarray(loss).ravel()[0]
                t0 = time.perf_counter()
                reps = 10 if B_train <= 1024 else 5
                for _ in range(reps):
                    p2, opt_state, loss = step(p2, opt_state, y_tr, c_tr)
                jax.block_until_ready(loss)
                _ = np.asarray(loss).ravel()[0]
                dt = (time.perf_counter() - t0) / reps
                results[key] = B_train / dt
                print(f"{key}: {B_train/dt:,.0f} train samples/s")
            except Exception as e:
                print(f"{key}: FAILED {str(e)[:120]}")
                results[key] = None
    model.use_pallas = True

    # correctness vs XLA highest — both the fused-kernel modes AND the XLA
    # reduced-precision modes, so the accuracy class of every row in
    # samples_per_s is pinned in the same artifact (the default-path decision
    # compares throughput at equal accuracy, docs/PERF.md).
    model.precision = "highest"
    with jax.default_matmul_precision("highest"):
        y_ref = jax.vmap(lambda zz: model.inverse_given_h(params, zz, h))(z3[:4])
    errs = {}
    for label, ctx, mode in PRECISIONS:
        y_k = fused_flow(
            z3[:4].reshape(4 * N, model.size), h_proj, **kargs,
            inverse=True, n_cond=N, block_b=512, precision=mode,
        ).reshape(4, N, model.size)
        errs[f"pallas_{label}"] = float(jnp.max(jnp.abs(y_k - y_ref)))
        print(f"max |dy| fused({label}) vs xla(highest): {errs[f'pallas_{label}']:.2e}")
        if label != "highest":
            # inverse_given_h pins matmul precision to model.precision
            # internally, so an outer context alone is silently overridden —
            # set the model attribute (the r03 'max_abs_err: 0.0' lesson)
            model.precision = ctx
            y_x = jax.vmap(lambda zz: model.inverse_given_h(params, zz, h))(z3[:4])
            model.precision = "highest"
            errs[f"xla_{label}"] = float(jnp.max(jnp.abs(y_x - y_ref)))
            print(f"max |dy| xla({label}) vs xla(highest): {errs[f'xla_{label}']:.2e}")

    os.makedirs("results", exist_ok=True)
    with open("results/flow_kernel_bench.json", "w") as f:
        json.dump({"N": N, "draws": draws, "device": str(jax.devices()[0]),
                   "samples_per_s": results, "max_abs_dy_vs_f32": errs}, f, indent=2)
    print("wrote results/flow_kernel_bench.json")


if __name__ == "__main__":
    main()
