"""Posterior predictive checking by resimulation — fully on-device.

Replaces the reference's 32-process `ProcessPoolExecutor` resimulation
(`src/bcnf/simulation/resimulation.py:21-59`, one scipy-odeint call per
posterior sample) with a single vmapped RK4 program: the `(M, N)` grid of
posterior parameter sets is simulated in one XLA launch, shardable over the
data mesh axis.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from bcnf_tpu.config import ParameterIndexMapping
from bcnf_tpu.simulation.physics import n_steps_for, simulate_trajectory

# Parameter names consumed by the simulator, in canonical order.
_SIM_KEYS = [
    "x0_x", "x0_y", "x0_z", "v0_x", "v0_y", "v0_z",
    "g_x", "g_y", "g_z", "w_x", "w_y", "w_z",
    "b", "m", "rho", "r", "a_x", "a_y", "a_z",
]


def _assemble(
    y_hat: np.ndarray,
    mapping: ParameterIndexMapping,
    fixed: dict[str, np.ndarray],
) -> dict[str, jnp.ndarray]:
    """Merge learned parameters (columns of y_hat) with fixed per-trajectory
    values (reference `resimulation.py:52`: learned overrides fixed)."""
    M, N = y_hat.shape[:2]
    out: dict[str, jnp.ndarray] = {}
    for k in _SIM_KEYS:
        if k in mapping or (k == "g_z" and "g" in mapping):
            name = k if k in mapping else "g"
            out[k] = jnp.asarray(y_hat[..., mapping[name]])
        elif k == "g_x" or k == "g_y":
            if k in fixed:
                out[k] = jnp.broadcast_to(jnp.asarray(fixed[k]), (M, N))
            else:
                out[k] = jnp.zeros((M, N))
        elif k in fixed:
            out[k] = jnp.broadcast_to(jnp.asarray(fixed[k]), (M, N))
        else:
            out[k] = jnp.zeros((M, N))
    return out


def resimulate(
    model: Any,
    params: Any,
    T: float,
    dt: float,
    data_dict: dict[str, Any],
    y_hat: np.ndarray | None = None,
    *conditions: jnp.ndarray,
    m_samples: int = 1000,
    break_on_impact: bool = False,
    key: jax.Array | None = None,
    sample_batch_size: int = 250,
    verbose: bool = False,
    mesh: Any = None,
) -> np.ndarray:
    """Sample posteriors and re-run the simulator; returns `(N, M, T, 3)`
    (reference `resimulate`, `src/bcnf/simulation/resimulation.py:21-59`).

    With `mesh` the condition rows (and the resimulation grid's N axis) are
    sharded over the data axis; params replicated (SURVEY.md section 5.8).
    """
    mapping: ParameterIndexMapping = model.parameter_index_mapping
    if y_hat is None:
        if key is None:
            key = jax.random.key(0)
        if mesh is not None:
            from bcnf_tpu.parallel.mesh import replicate, shard_batch

            params = replicate(mesh, params)
            conditions = tuple(shard_batch(mesh, list(conditions)))
        sample_fn = jax.jit(
            lambda p, sub, m, *cond: model.sample(p, sub, m, *cond),
            static_argnums=(2,),
        )
        chunks = []
        drawn = 0
        while drawn < m_samples:
            m = min(sample_batch_size, m_samples - drawn)
            key, sub = jax.random.split(key)
            chunks.append(np.asarray(sample_fn(params, sub, m, *conditions)))
            drawn += m
        y_hat = np.concatenate(chunks, axis=0)  # (M, N, D)

    M, N = y_hat.shape[:2]
    fixed = {
        k: np.asarray(v)
        for k, v in data_dict.items()
        if k in _SIM_KEYS and k not in mapping.parameters
    }
    p = _assemble(y_hat, mapping, fixed)
    if mesh is not None:
        # shard the (M, N) resimulation grid over its N axis; the vmapped
        # RK4 then runs fully local per chip (no collectives until the host
        # gather at the end)
        from jax.sharding import NamedSharding, PartitionSpec

        sh = NamedSharding(mesh, PartitionSpec(None, "data"))
        p = {k: jax.device_put(v, sh) for k, v in p.items()}

    if verbose:
        print(f"Resimulating {N} trajectories {M} times on device")

    x0 = jnp.stack([p["x0_x"], p["x0_y"], p["x0_z"]], axis=-1)
    v0 = jnp.stack([p["v0_x"], p["v0_y"], p["v0_z"]], axis=-1)
    g = jnp.stack([p["g_x"], p["g_y"], p["g_z"]], axis=-1)
    w = jnp.stack([p["w_x"], p["w_y"], p["w_z"]], axis=-1)
    a = jnp.stack([p["a_x"], p["a_y"], p["a_z"]], axis=-1)

    # n_substeps=4: posterior samples can land in the stiff-drag regime where
    # single-step RK4 at the frame dt is unstable (see sampling.py note).
    X = simulate_trajectory(
        x0, v0, g, w, p["b"], p["m"], p["rho"], p["r"], a,
        n_steps=n_steps_for(T, dt), dt=dt, break_on_impact=break_on_impact,
        n_substeps=4,
    )  # (M, N, T, 3)
    return np.asarray(jnp.swapaxes(X, 0, 1))  # (N, M, T, 3)


def impact_points(trajectories: np.ndarray) -> np.ndarray:
    """Extract impact points by the z sign change (the resimulation notebook's
    metric, reference `notebooks/resimulation.ipynb` cells 17-26).

    Input `(..., T, 3)`; returns `(..., 3)` with NaN where no impact occurs.
    """
    z = trajectories[..., 2]
    below = z < 0
    first = np.argmax(below, axis=-1)  # 0 when never below
    hit = below.any(axis=-1) & (first > 0)
    i = np.maximum(first, 1)

    take = np.take_along_axis
    p_prev = take(trajectories, np.expand_dims(np.expand_dims(i - 1, -1), -1), axis=-2)[..., 0, :]
    p_next = take(trajectories, np.expand_dims(np.expand_dims(i, -1), -1), axis=-2)[..., 0, :]
    dz = p_next[..., 2] - p_prev[..., 2]
    frac = np.where(np.abs(dz) > 1e-12, -p_prev[..., 2] / np.where(np.abs(dz) > 1e-12, dz, 1.0), 0.0)
    poi = p_prev + frac[..., None] * (p_next - p_prev)
    # Diverged (non-finite) trajectories can place inf in p_prev/p_next; a
    # non-finite crossing is "no impact", not an infinite impact point.
    ok = hit[..., None] & np.isfinite(poi).all(axis=-1, keepdims=True)
    return np.where(ok, poi, np.nan)
