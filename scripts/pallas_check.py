#!/usr/bin/env python
"""Validate + benchmark the model-level Pallas fast path on real TPU.

Checks that CondRealNVP(use_pallas=True) forward/inverse matches the XLA path
on the flagship architecture, then times posterior sampling both ways.
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.expanduser("~/.cache/bcnf_tpu_jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from __graft_entry__ import _flagship_model

    scale = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    m_ref = _flagship_model(scale)
    m_ref.use_pallas = False
    m_pal = _flagship_model(scale)
    m_pal.use_pallas = True
    m_pal.use_pallas_coupling = True  # exercise the per-coupling kernel too

    params = m_ref.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    B = 256
    y = jnp.asarray(rng.normal(size=(B, 19)), jnp.float32)
    traj = jnp.asarray(rng.normal(size=(B, 30, 3)), jnp.float32)

    z_ref, ld_ref = jax.jit(lambda p, y, t: m_ref.forward(p, y, t))(params, y, traj)
    z_pal, ld_pal = jax.jit(lambda p, y, t: m_pal.forward(p, y, t))(params, y, traj)
    err_z = float(jnp.abs(z_pal - z_ref).max())
    err_ld = float(jnp.abs(ld_pal - ld_ref).max())
    print(f"forward: |dz|={err_z:.2e} |dld|={err_ld:.2e}")
    assert err_z < 1e-3 and err_ld < 1e-2, "pallas path mismatch"

    y_rec = jax.jit(lambda p, z, t: m_pal.inverse(p, z, t))(params, z_pal, traj)
    err_inv = float(jnp.abs(y_rec - y).max())
    print(f"inverse roundtrip: {err_inv:.2e}")
    assert err_inv < 1e-2

    # sampling throughput comparison
    M, N = 512, 8
    cond = traj[:N]
    for name, model in (("xla", m_ref), ("pallas", m_pal)):
        fn = jax.jit(lambda p, k: model.sample(p, k, M, cond))
        s = fn(params, jax.random.key(1))
        s.block_until_ready()
        t0 = time.time()
        for i in range(5):
            s = fn(params, jax.random.key(i))
        s.block_until_ready()
        rate = 5 * M * N / (time.time() - t0)
        print(f"{name}: posterior samples/s = {rate:,.0f}")


if __name__ == "__main__":
    main()
