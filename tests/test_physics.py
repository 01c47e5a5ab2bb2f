"""Golden tests: the JAX RK4 simulator vs an independent SciPy-LSODA oracle.

The reference integrates velocities with LSODA and positions with explicit
Euler (`/root/reference` `src/bcnf/simulation/physics.py:147-163`); we verify
our fixed-step RK4 agrees with an LSODA re-derivation of the same update rule
to tight tolerance (SURVEY.md section 7.3 "numerical parity").
"""

import numpy as np
import pytest
from scipy.integrate import odeint

from bcnf_tpu.simulation import physics


def _numpy_ode(v, t, g, w, b, m, rho, r, a):
    drag = (0.5 * b / m) * (
        v**2 * v / np.linalg.norm(v) - w**2 * w / max(np.linalg.norm(w), 1e-12)
    )
    return g - g * rho * (4 / 3) * (np.pi * r**3) / m - drag + a


def _reference_sim(x0, v0, g, w, b, m, rho, r, a, T, dt, break_on_impact):
    t = np.arange(0, T, dt)
    v_sol = odeint(_numpy_ode, v0, t, args=(g, w, b, m, rho, r, a))
    x_sol = np.zeros((v_sol.shape[0], 3))
    x_sol[0] = x0
    for i in range(1, v_sol.shape[0]):
        x_sol[i] = x_sol[i - 1] + v_sol[i] * dt
        if x_sol[i, 2] < 0 and break_on_impact:
            tau = -x_sol[i - 1, 2] / v_sol[i, 2]
            x_sol[i] = x_sol[i - 1] + v_sol[i] * tau
            x_sol[i:] = x_sol[i]
            break
    return x_sol


CASES = [
    dict(x0=[0, 0, 1.5], v0=[12, 3, 9], g=[0, 0, -9.81], w=[-3, 2, 0.5],
         b=0.05, m=0.3, rho=1.2, r=0.1, a=[0, 0, 0]),
    dict(x0=[2, -1, 2.0], v0=[-8, 10, 14], g=[0, 0, -8.5], w=[0, 0, 0],
         b=0.02, m=0.15, rho=1.0, r=0.06, a=[0.5, -0.2, 0.1]),
]


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("break_on_impact", [False, True])
def test_trajectory_matches_scipy(case, break_on_impact):
    T, dt = 2.0, 0.067
    args = {k: np.array(v, dtype=np.float64) for k, v in case.items()}
    expected = _reference_sim(**args, T=T, dt=dt, break_on_impact=break_on_impact)
    got = physics.physics_ODE_simulation(
        *args["x0"], *args["v0"], *args["g"], *args["w"],
        args["b"], args["m"], args["rho"], args["r"], *args["a"],
        T=T, dt=dt, break_on_impact=break_on_impact,
    )
    assert got.shape == expected.shape
    np.testing.assert_allclose(got, expected, atol=2e-3, rtol=1e-3)


def test_wind_zero_no_nan():
    """SURVEY.md Q5: the reference NaNs at w=0 exactly; we must not."""
    out = physics.physics_ODE_simulation(
        0, 0, 1, 5, 0, 5, 0, 0, -9.81, 0, 0, 0, 0.1, 0.5, 1.2, 0.1, 0, 0, 0,
        T=1.0, dt=0.1,
    )
    assert np.isfinite(out).all()


def test_batched_matches_single():
    import jax.numpy as jnp

    n = 4
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(n, 3)) + np.array([0, 0, 3.0])
    v0 = rng.normal(size=(n, 3)) * 5
    g = np.tile([0, 0, -9.81], (n, 1))
    w = rng.normal(size=(n, 3))
    b = np.abs(rng.normal(size=n)) * 0.05
    m = np.abs(rng.normal(size=n)) + 0.2
    rho = np.full(n, 1.2)
    r = np.full(n, 0.1)
    a = np.zeros((n, 3))

    batched = physics.simulate_trajectory(
        jnp.array(x0, jnp.float32), jnp.array(v0, jnp.float32), jnp.array(g, jnp.float32),
        jnp.array(w, jnp.float32), jnp.array(b, jnp.float32), jnp.array(m, jnp.float32),
        jnp.array(rho, jnp.float32), jnp.array(r, jnp.float32), jnp.array(a, jnp.float32),
        n_steps=30, dt=0.067, break_on_impact=True,
    )
    for i in range(n):
        single = physics.physics_ODE_simulation(
            *x0[i], *v0[i], *g[i], *w[i], b[i], m[i], rho[i], r[i], *a[i],
            T=2.0, dt=0.067, break_on_impact=True,
        )
        np.testing.assert_allclose(np.asarray(batched[i]), single, atol=1e-4)


def test_point_of_impact_hits_ground():
    poi = physics.calculate_point_of_impact(
        0, 0, 1.5, 10, 0, 8, 0, 0, -9.81, 0, 0, 0, 0.05, 0.3, 1.2, 0.1, 0, 0, 0,
    )
    assert abs(poi[2]) < 1.0  # near the ground
    assert poi[0] > 1.0  # traveled downrange


def test_point_of_impact_runaway_sentinel():
    """A ball with upward thrust exceeding gravity never lands -> [999]*3
    (reference `src/bcnf/simulation/physics.py:276`)."""
    poi = physics.calculate_point_of_impact(
        0, 0, 1.5, 0, 0, 5, 0, 0, -9.81, 0, 0, 0, 0.0, 0.3, 0.0, 0.1, 0, 0, 20.0,
    )
    np.testing.assert_allclose(poi, [999, 999, 999])
