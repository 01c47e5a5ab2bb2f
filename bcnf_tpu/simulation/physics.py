"""Ballistic physics simulator — TPU-native (JAX, fixed-step RK4, branch-free).

Replaces the reference's SciPy-LSODA + Python-loop simulator
(`src/bcnf/simulation/physics.py:7-165`) with a `lax.scan` RK4 integrator that
is jit-compilable and vmappable over batches of parameter sets. The position
update and ground-impact handling mirror the reference exactly:

- velocities are integrated on the grid `t = arange(0, T, dt)`
  (reference `src/bcnf/simulation/physics.py:144-147`),
- positions accumulate by explicit Euler with the *new* velocity
  (`x[i] = x[i-1] + v[i]*dt`, reference `src/bcnf/simulation/physics.py:150-154`),
- on ground impact the crossing is linearly interpolated and the object frozen
  (reference `src/bcnf/simulation/physics.py:157-163`), implemented branch-free
  with masks.

SURVEY.md Q5: the drag term is the reference's elementwise
``v**2 * v / ||v|| - w**2 * w / ||w||`` form (NOT textbook quadratic drag,
reference `src/bcnf/simulation/physics.py:48`); it defines the data
distribution so we replicate it, adding a safe-norm guard for ``||w|| = 0``
(the reference NaNs there).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

FAR_AWAY = 999.0  # runaway sentinel (reference `src/bcnf/simulation/physics.py:276`)
IMPACT_TIME_CAP = 120.0  # reference `src/bcnf/simulation/physics.py:255`


def _safe_norm(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """||x|| that is safe to divide by: returns 1 where the norm underflows.

    Because the numerator ``x**2 * x`` is exactly 0 when x == 0, dividing by 1
    instead of 0 yields the correct limit 0 (guards the reference's w=0 NaN).
    """
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.where(n > eps, n, 1.0)


def ballistic_ode(
    v: jnp.ndarray,
    g: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    m: jnp.ndarray,
    rho: jnp.ndarray,
    r: jnp.ndarray,
    a: jnp.ndarray,
) -> jnp.ndarray:
    """dv/dt = gravity - buoyancy - drag + thrust (reference `src/bcnf/simulation/physics.py:48`).

    Shapes: `v, g, w, a` are `(..., 3)`; `b, m, rho, r` are `(...,)` scalars.
    """
    b = b[..., None]
    m = m[..., None]
    rho = rho[..., None]
    r = r[..., None]
    buoyancy = g * rho * (4.0 / 3.0) * (jnp.pi * r**3) / m
    drag = (0.5 * b / m) * (v**2 * v / _safe_norm(v) - w**2 * w / _safe_norm(w))
    return g - buoyancy - drag + a


def _rk4_step(v: jnp.ndarray, dt: float, ode_args: tuple) -> jnp.ndarray:
    """One classical RK4 step of the (autonomous) velocity ODE."""
    k1 = ballistic_ode(v, *ode_args)
    k2 = ballistic_ode(v + 0.5 * dt * k1, *ode_args)
    k3 = ballistic_ode(v + 0.5 * dt * k2, *ode_args)
    k4 = ballistic_ode(v + dt * k3, *ode_args)
    return v + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def n_steps_for(T: float, dt: float) -> int:
    """Length of the reference time grid `np.arange(0, T, dt)`."""
    return int(math.ceil((T - 1e-12) / dt))


@partial(jax.jit, static_argnames=("n_steps", "dt", "break_on_impact", "n_substeps"))
def simulate_trajectory(
    x0: jnp.ndarray,
    v0: jnp.ndarray,
    g: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    m: jnp.ndarray,
    rho: jnp.ndarray,
    r: jnp.ndarray,
    a: jnp.ndarray,
    n_steps: int,
    dt: float,
    break_on_impact: bool = True,
    n_substeps: int = 1,
) -> jnp.ndarray:
    """Simulate position trajectories, shape `(..., n_steps, 3)`.

    Batched: all parameter arrays broadcast over leading axes. The first output
    row is `x0` (reference `src/bcnf/simulation/physics.py:151`).
    """
    ode_args = (g, w, b, m, rho, r, a)
    sub_dt = dt / n_substeps

    def vel_step(v: jnp.ndarray, _: None) -> tuple[jnp.ndarray, jnp.ndarray]:
        for _ in range(n_substeps):
            v = _rk4_step(v, sub_dt, ode_args)
        return v, v

    # v_sol[i] for i = 1..n_steps-1 (v at each new grid point)
    _, v_sol = jax.lax.scan(vel_step, v0, None, length=n_steps - 1)
    # scan stacks on axis 0; move the time axis after batch axes
    v_sol = jnp.moveaxis(v_sol, 0, -2)  # (..., n_steps-1, 3)

    def pos_step(carry: tuple, v_i: jnp.ndarray) -> tuple[tuple, jnp.ndarray]:
        x_prev, impacted = carry
        x_new = x_prev + v_i * dt
        below = x_new[..., 2] < 0
        hit = below & ~impacted if break_on_impact else jnp.zeros_like(below)
        # Interpolated crossing: t* = -z_prev / vz (reference physics.py:158-159)
        vz = v_i[..., 2]
        t_star = -x_prev[..., 2] / jnp.where(jnp.abs(vz) > 1e-12, vz, 1.0)
        x_impact = x_prev + v_i * t_star[..., None]
        x_out = jnp.where(
            impacted[..., None], x_prev, jnp.where(hit[..., None], x_impact, x_new)
        )
        return (x_out, impacted | hit), x_out

    init = (x0, jnp.zeros(x0.shape[:-1], dtype=bool))
    v_scan = jnp.moveaxis(v_sol, -2, 0)  # (n_steps-1, ..., 3)
    _, xs = jax.lax.scan(pos_step, init, v_scan)
    xs = jnp.moveaxis(xs, 0, -2)  # (..., n_steps-1, 3)
    return jnp.concatenate([x0[..., None, :], xs], axis=-2)


def physics_ODE_simulation(
    x0_x: float, x0_y: float, x0_z: float,
    v0_x: float, v0_y: float, v0_z: float,
    g_x: float, g_y: float, g_z: float,
    w_x: float, w_y: float, w_z: float,
    b: float, m: float, rho: float, r: float,
    a_x: float, a_y: float, a_z: float,
    T: float = 10.0,
    dt: float = 0.1,
    break_on_impact: bool = True,
    *args: Any, **kwargs: Any,
) -> np.ndarray:
    """Scalar-argument compatibility API (reference `src/bcnf/simulation/physics.py:53-165`).

    Accepts the same keyword surface (extra kwargs ignored) and returns a NumPy
    array of shape `(n_steps, 3)`.
    """
    out = simulate_trajectory(
        jnp.array([x0_x, x0_y, x0_z], dtype=jnp.float32),
        jnp.array([v0_x, v0_y, v0_z], dtype=jnp.float32),
        jnp.array([g_x, g_y, g_z], dtype=jnp.float32),
        jnp.array([w_x, w_y, w_z], dtype=jnp.float32),
        jnp.asarray(b, dtype=jnp.float32),
        jnp.asarray(m, dtype=jnp.float32),
        jnp.asarray(rho, dtype=jnp.float32),
        jnp.asarray(r, dtype=jnp.float32),
        jnp.array([a_x, a_y, a_z], dtype=jnp.float32),
        n_steps=n_steps_for(T, dt),
        dt=dt,
        break_on_impact=break_on_impact,
    )
    return np.asarray(out)


@partial(jax.jit, static_argnames=("dt", "max_steps"))
def point_of_impact(
    x0: jnp.ndarray,
    v0: jnp.ndarray,
    g: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    m: jnp.ndarray,
    rho: jnp.ndarray,
    r: jnp.ndarray,
    a: jnp.ndarray,
    dt: float = 0.1,
    max_steps: int | None = None,
) -> jnp.ndarray:
    """Ground-impact point, shape `(..., 3)`; `[999, 999, 999]` if airborne past 120 s.

    Mirrors reference `src/bcnf/simulation/physics.py:168-276` including its
    quirks: the per-step position update uses the velocity at the *start* of
    the step (`x_sol = x0 + v0*dt`, reference `:260`), and the impact
    interpolation `t* = -z/vz` likewise uses the old velocity (`:264-265`).
    """
    if max_steps is None:
        max_steps = int(IMPACT_TIME_CAP / dt)
    ode_args = (g, w, b, m, rho, r, a)

    def step(carry: tuple, _: None) -> tuple[tuple, None]:
        x, v, done, poi = carry
        x_new = x + v * dt
        hit = (x_new[..., 2] < 0) & ~done
        vz = v[..., 2]
        t_star = -x[..., 2] / jnp.where(jnp.abs(vz) > 1e-12, vz, 1.0)
        x_impact = x + v * t_star[..., None]
        poi = jnp.where(hit[..., None], x_impact, poi)
        done = done | hit
        v_new = _rk4_step(v, dt, ode_args)
        x = jnp.where(done[..., None], x, x_new)
        v = jnp.where(done[..., None], v, v_new)
        return (x, v, done, poi), None

    batch_shape = jnp.broadcast_shapes(x0.shape[:-1], b.shape)
    x0 = jnp.broadcast_to(x0, batch_shape + (3,))
    v0 = jnp.broadcast_to(v0, batch_shape + (3,))
    done0 = jnp.zeros(batch_shape, dtype=bool)
    poi0 = jnp.full(batch_shape + (3,), FAR_AWAY)
    (_, _, done, poi), _ = jax.lax.scan(step, (x0, v0, done0, poi0), None, length=max_steps)
    return jnp.where(done[..., None], poi, jnp.full_like(poi, FAR_AWAY))


def calculate_point_of_impact(
    x0_x: float, x0_y: float, x0_z: float,
    v0_x: float, v0_y: float, v0_z: float,
    g_x: float, g_y: float, g_z: float,
    w_x: float, w_y: float, w_z: float,
    b: float, m: float, rho: float, r: float,
    a_x: float, a_y: float, a_z: float,
    dt: float = 0.1,
    *args: Any, **kwargs: Any,
) -> np.ndarray:
    """Scalar-argument compatibility API (reference `src/bcnf/simulation/physics.py:168-276`)."""
    out = point_of_impact(
        jnp.array([x0_x, x0_y, x0_z], dtype=jnp.float32),
        jnp.array([v0_x, v0_y, v0_z], dtype=jnp.float32),
        jnp.array([g_x, g_y, g_z], dtype=jnp.float32),
        jnp.array([w_x, w_y, w_z], dtype=jnp.float32),
        jnp.asarray(b, dtype=jnp.float32),
        jnp.asarray(m, dtype=jnp.float32),
        jnp.asarray(rho, dtype=jnp.float32),
        jnp.asarray(r, dtype=jnp.float32),
        jnp.array([a_x, a_y, a_z], dtype=jnp.float32),
        dt=dt,
    )
    return np.asarray(out)
