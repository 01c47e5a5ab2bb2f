"""Native C++ engine tests: agreement with SciPy-LSODA and the JAX integrator."""

import numpy as np

from bcnf_tpu import native


def _row(**overrides):
    base = dict(
        x0_x=0.0, x0_y=0.0, x0_z=1.5, v0_x=12.0, v0_y=3.0, v0_z=9.0,
        g_x=0.0, g_y=0.0, g_z=-9.81, w_x=-3.0, w_y=2.0, w_z=0.5,
        b=0.05, m=0.3, rho=1.2, r=0.1, a_x=0.0, a_y=0.0, a_z=0.0,
    )
    base.update(overrides)
    return np.array([base[k] for k in native.PARAM_LAYOUT], dtype=np.float64)


def test_native_matches_scipy():
    from scipy.integrate import odeint

    def npode(v, t, g, w, b, m, rho, r, a):
        drag = (0.5 * b / m) * (
            v**2 * v / np.linalg.norm(v) - w**2 * w / max(np.linalg.norm(w), 1e-12)
        )
        return g - g * rho * (4 / 3) * (np.pi * r**3) / m - drag + a

    row = _row()
    T, dt = 2.0, 0.067
    out = native.simulate_trajectories(row[None], T, dt, break_on_impact=True)

    t = np.arange(0, T, dt)
    v_sol = odeint(
        npode, row[3:6], t,
        args=(row[6:9], row[9:12], row[12], row[13], row[14], row[15], row[16:19]),
    )
    x = np.zeros((len(t), 3))
    x[0] = row[:3]
    for i in range(1, len(t)):
        x[i] = x[i - 1] + v_sol[i] * dt
        if x[i, 2] < 0:
            tau = -x[i - 1, 2] / v_sol[i, 2]
            x[i] = x[i - 1] + v_sol[i] * tau
            x[i:] = x[i]
            break
    np.testing.assert_allclose(out[0], x, atol=1e-5)


def test_native_matches_jax_integrator():
    from bcnf_tpu.simulation import physics

    row = _row(w_x=0.0, w_y=0.0, w_z=0.0)
    out = native.simulate_trajectories(row[None], 2.0, 0.067, break_on_impact=False)
    jax_out = physics.physics_ODE_simulation(*row, T=2.0, dt=0.067, break_on_impact=False)
    np.testing.assert_allclose(out[0], jax_out, atol=5e-3)


def test_native_poi_runaway_sentinel():
    row = _row(a_z=20.0, b=0.0)
    poi = native.points_of_impact(row[None])
    np.testing.assert_allclose(poi[0], [999, 999, 999])


def test_native_threading_deterministic():
    rows = np.stack([_row(v0_x=5 + i) for i in range(64)])
    a = native.simulate_trajectories(rows, 2.0, 0.067, n_threads=1)
    b = native.simulate_trajectories(rows, 2.0, 0.067, n_threads=4)
    np.testing.assert_array_equal(a, b)
