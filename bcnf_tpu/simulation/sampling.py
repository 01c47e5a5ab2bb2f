"""Dataset generation: prior sampling + rejection filters + simulation.

TPU-native redesign of reference `src/bcnf/simulation/sampling.py:287-410`
(`generate_data`): instead of a serial Python while-loop drawing one candidate
at a time, we draw a whole *batch* of candidates in a single jit-compiled
program (priors -> filters -> trajectories -> optional renders), compute all
acceptance masks branch-free, and compact accepted rows on the host, repeating
until `n` rows are accepted (SURVEY.md section 7.3 "rejection sampling under
jit": oversample-and-mask).

Acceptance rules mirror the reference exactly:

- runaway filter: reject when ``g_z + a_z > 0`` (reference `sampling.py:320`),
- underground filter: reject when ``x0_z < 0`` (reference `:332`),
- traveled-distance filter: accept if ``d/50 > 0.75`` else with prob
  ``sqrt(d/50)`` (reference `:145-153`),
- visibility filter: accept if ``vis > 0.75`` else with prob
  ``sigmoid((vis - 0.5) * 10)`` (reference `:134-142`), where ``vis`` is the
  mean per-frame pixel sum over all cameras (reference `:370`).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from bcnf_tpu.config import load_yaml
from bcnf_tpu.simulation.camera import get_cams_position, record_trajectory
from bcnf_tpu.simulation.physics import n_steps_for, point_of_impact, simulate_trajectory
from bcnf_tpu.simulation.priors import HashableConfig, sample_ballistic_parameters
from bcnf_tpu.utils.jit import tpu_safe_jit
from bcnf_tpu.utils.prng import key_from_seed


def generate_data_old(
    key: jax.Array | None = None,
    x0_pdf: Any = None,
    v0_pdf: Any = None,
    g_pdf: Any = None,
    w_pdf: Any = None,
    b_pdf: Any = None,
    m_pdf: Any = None,
    rho_pdf: Any = None,
    r_pdf: Any = None,
    a_pdf: Any = None,
    T: float = 2.0,
    dt: float = 1 / 30,
    N: int = 1,
    break_on_impact: bool = False,
    seed: int | None = None,
) -> dict[str, np.ndarray]:
    """Legacy lambda-prior dataset API (reference `sampling.py:12-104`).

    Each `*_pdf` is `fn(size) -> np.ndarray` sampling that parameter; defaults
    reproduce the reference's lambda defaults. Simulation runs batched on
    device instead of the reference's per-sample Python loop.
    """
    rng = np.random.default_rng(seed)
    x0 = (x0_pdf or (lambda size: rng.uniform(0, 10, size=size)))((N, 3))
    v0 = (v0_pdf or (lambda size: rng.uniform(-10, 10, size=size) + np.array([0, 0, 9])))((N, 3))
    g = (g_pdf or (lambda size: rng.normal(9.81, 0.1, size=size) * np.array([0, 0, -1])))((N, 3))
    w = (w_pdf or (lambda size: rng.normal(0, 1, size=size) * np.array([1, 1, 0.1])))((N, 3))
    b = (b_pdf or (lambda size: rng.uniform(0, 1, size=size)))((N,))
    m = (m_pdf or (lambda size: rng.uniform(0.5, 1.5, size=size)))((N,))
    rho = (rho_pdf or (lambda size: rng.uniform(1.0, 1.5, size=size)))((N,))
    r = (r_pdf or (lambda size: rng.uniform(0.05, 0.15, size=size)))((N,))
    a = (a_pdf or (lambda size: rng.uniform(0, 0, size=size)))((N, 3))

    X = simulate_trajectory(
        jnp.asarray(x0, jnp.float32), jnp.asarray(v0, jnp.float32),
        jnp.asarray(g, jnp.float32), jnp.asarray(w, jnp.float32),
        jnp.asarray(b, jnp.float32), jnp.asarray(m, jnp.float32),
        jnp.asarray(rho, jnp.float32), jnp.asarray(r, jnp.float32),
        jnp.asarray(a, jnp.float32),
        n_steps=n_steps_for(T, dt), dt=float(dt),
        break_on_impact=break_on_impact, n_substeps=4,
    )
    return {
        "trajectories": np.asarray(X),
        "x0_x": x0[:, 0], "x0_y": x0[:, 1], "x0_z": x0[:, 2],
        "v0_x": v0[:, 0], "v0_y": v0[:, 1], "v0_z": v0[:, 2],
        "g_x": g[:, 0], "g_y": g[:, 1], "g_z": g[:, 2],
        "w_x": w[:, 0], "w_y": w[:, 1], "w_z": w[:, 2],
        "b": b, "m": m, "rho": rho, "r": r,
        "a_x": a[:, 0], "a_y": a[:, 1], "a_z": a[:, 2],
    }


def accept_visibility(key: jax.Array, visibility: jnp.ndarray) -> jnp.ndarray:
    """Vectorized visibility acceptance (reference `sampling.py:134-142`)."""
    u = jax.random.uniform(key, visibility.shape)
    soft = 1.0 / (1.0 + jnp.exp(-(visibility - 0.5) * 10.0)) > u
    return (visibility > 0.75) | soft


def accept_traveled_distance(key: jax.Array, distance: jnp.ndarray) -> jnp.ndarray:
    """Vectorized traveled-distance acceptance (reference `sampling.py:145-153`)."""
    ratio = distance / 50.0
    u = jax.random.uniform(key, distance.shape)
    return (ratio > 0.75) | (jnp.sqrt(jnp.maximum(ratio, 0.0)) > u)


# NOTE: the batch generator is split into separately-jitted stages (priors +
# distance filter / trajectory / render + visibility filter) rather than one
# fused program. Fusing all three scans into a single jit triggers an XLA-CPU
# compiler assertion (memory_bound_loop_optimizer) on jax 0.9, staging also
# lowers peak memory since the 1800-step impact scan and the renderer never
# coexist.


@tpu_safe_jit(static_argnames=("batch", "prior", "num_cams", "dt", "do_filter"))
def _stage_params(
    key: jax.Array, batch: int, prior: HashableConfig, num_cams: int, dt: float, do_filter: bool
) -> tuple[dict[str, jnp.ndarray], jnp.ndarray]:
    k_params, k_dist = jax.random.split(key)
    p = sample_ballistic_parameters(k_params, batch, prior.data, num_cams)
    accept = jnp.ones(batch, dtype=bool)
    if do_filter:
        accept &= ~(p["g_z"] + p["a_z"] > 0)  # runaway (reference :320)
        accept &= ~(p["x0_z"] < 0)  # start underground (reference :332)
        x0 = jnp.stack([p["x0_x"], p["x0_y"], p["x0_z"]], axis=-1)
        v0 = jnp.stack([p["v0_x"], p["v0_y"], p["v0_z"]], axis=-1)
        g = jnp.stack([p["g_x"], p["g_y"], p["g_z"]], axis=-1)
        w = jnp.stack([p["w_x"], p["w_y"], p["w_z"]], axis=-1)
        a = jnp.stack([p["a_x"], p["a_y"], p["a_z"]], axis=-1)
        poi = point_of_impact(x0, v0, g, w, p["b"], p["m"], p["rho"], p["r"], a, dt=dt)
        distance = jnp.linalg.norm(poi - x0, axis=-1)
        accept &= accept_traveled_distance(k_dist, distance)
    return p, accept


@tpu_safe_jit(static_argnames=("n_steps", "dt", "break_on_impact", "n_substeps"))
def _stage_trajectory(
    p: dict[str, jnp.ndarray], n_steps: int, dt: float, break_on_impact: bool,
    n_substeps: int = 4,
) -> jnp.ndarray:
    x0 = jnp.stack([p["x0_x"], p["x0_y"], p["x0_z"]], axis=-1)
    v0 = jnp.stack([p["v0_x"], p["v0_y"], p["v0_z"]], axis=-1)
    g = jnp.stack([p["g_x"], p["g_y"], p["g_z"]], axis=-1)
    w = jnp.stack([p["w_x"], p["w_y"], p["w_z"]], axis=-1)
    a = jnp.stack([p["a_x"], p["a_y"], p["a_z"]], axis=-1)
    # n_substeps=4: the prior's stiff-drag tail (c = 0.5*b/m up to ~3 with
    # |v| ~ 40) exceeds RK4's stability region at dt ~ 1/15; the reference's
    # LSODA is adaptive and survives. Substepping covers the tail cheaply.
    return simulate_trajectory(
        x0, v0, g, w, p["b"], p["m"], p["rho"], p["r"], a,
        n_steps=n_steps, dt=dt, break_on_impact=break_on_impact,
        n_substeps=n_substeps,
    )


@tpu_safe_jit(
    static_argnames=("ratio", "fov_horizontal", "renderer", "legacy_cam_geometry", "num_cams"),
)
def _stage_render(
    key: jax.Array,
    p: dict[str, jnp.ndarray],
    trajectory: jnp.ndarray,
    cam_radians: jnp.ndarray,
    num_cams: int,
    ratio: tuple[int, int],
    fov_horizontal: float,
    renderer: str,
    legacy_cam_geometry: bool,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Render all cameras; returns (videos, visibility)."""
    cams_pos = get_cams_position(
        cam_radians, p["cam_radius"], p["cam_heights"], legacy_pairing=legacy_cam_geometry
    )  # (batch, num_cams, 3)

    def render_one(k: jax.Array, traj: jnp.ndarray, cams: jnp.ndarray, angles: jnp.ndarray, r_ball: jnp.ndarray) -> jnp.ndarray:
        cam_keys = jax.random.split(k, cams.shape[0])
        return jax.vmap(
            lambda ck, cpos, ang: record_trajectory(
                traj, cpos, ang, r_ball, key=ck, ratio=ratio,
                fov_horizontal=fov_horizontal, mode=renderer,
            )
        )(cam_keys, cams, angles)

    render_keys = jax.random.split(key, trajectory.shape[0])
    videos = jax.vmap(render_one)(
        render_keys, trajectory, cams_pos, p["cam_angles"], p["r"]
    )  # (batch, num_cams, T, H, W)
    # mean per-frame pixel sum over cameras (reference `sampling.py:370`)
    vis = videos.sum(axis=(2, 3, 4)).sum(axis=1) / (num_cams * videos.shape[2])
    return videos, vis


def generate_data(
    config_file: str | None = None,
    n: int = 100,
    output_type: str = "parameters",
    dt: float = 1 / 30,
    T: float = 4,
    ratio: tuple = (16, 9),
    fov_horizontal: float = 70.0,
    cam1_radian: float = 0.0,
    num_cams: int = 2,
    break_on_impact: bool = True,
    do_filter: bool = True,
    verbose: bool = False,
    seed: int | None = None,
    prior_config: dict | None = None,
    renderer: str = "mc",
    legacy_cam_geometry: bool = False,
    batch_size: int | None = None,
    observation_noise: float = 0.0,
    **_: Any,
) -> dict[str, list]:
    """Generate an accepted dataset of exactly `n` rows (reference `sampling.py:287-410`).

    Returns the reference's dict-of-lists schema (keys from
    `sample_ballistic_parameters` plus `trajectories` / `videos`).

    `observation_noise > 0` applies the reference's airborne Gaussian
    observation model (`src/bcnf/simulation/observation.py:4-10`) to the
    emitted `trajectories`: the observed condition is the noisy sensor
    reading while the physics (filters, renders, point-of-impact) runs on
    the clean trajectory. A noisy condition makes the posterior genuinely
    non-degenerate on the x0/v0 dims (docs/CALIBRATION.md), which is what
    the full SBC protocol assumes.
    """
    if output_type not in ("videos", "trajectories", "parameters"):
        raise ValueError('output_type must be one of "videos", "trajectories", or "parameters"')

    if prior_config is None:
        if config_file is None:
            raise ValueError("either config_file or prior_config must be given")
        prior_config = load_yaml(config_file).to_dict()

    prior = HashableConfig(prior_config)
    render = output_type == "videos"
    n_steps = n_steps_for(T, dt)
    if batch_size is None:
        batch_size = 128 if (render or do_filter) else min(max(n, 64), 4096)

    key = key_from_seed(seed)
    data: dict[str, list] = {}
    accepted = 0
    rejected = 0

    while accepted < n:
        key, k_par, k_vis_accept, k_render, k_noise = jax.random.split(key, 5)
        p, accept = _stage_params(
            k_par, batch_size, prior, num_cams, float(dt), bool(do_filter)
        )
        trajectory = _stage_trajectory(p, n_steps, float(dt), bool(break_on_impact))

        out = dict(p)
        # Prepend the fixed first-camera radian (reference `sampling.py:363`)
        cam_radians = jnp.concatenate(
            [jnp.full((batch_size, 1), cam1_radian), p["cam_radian_array"]], axis=-1
        )
        out["cam_radian_array"] = cam_radians

        if render or do_filter:
            videos, vis = _stage_render(
                k_render, p, trajectory, cam_radians, num_cams, tuple(ratio),
                float(fov_horizontal), renderer, bool(legacy_cam_geometry),
            )
            if do_filter:
                accept &= accept_visibility(k_vis_accept, vis)
            if render:
                out["videos"] = videos

        if observation_noise > 0:
            from bcnf_tpu.simulation.observation import gaussian_observation_noise

            out["trajectories"] = gaussian_observation_noise(
                k_noise, trajectory, std=float(observation_noise)
            )
        else:
            out["trajectories"] = trajectory
        out["accept"] = accept
        out = jax.device_get(out)
        mask = np.array(out.pop("accept"))  # writable copy
        # Safety net (deliberate divergence): reject trajectories the
        # fixed-step integrator failed on (non-finite) — the reference's
        # adaptive LSODA never emits NaN; keeping them would poison training.
        finite = np.isfinite(out["trajectories"]).all(axis=(1, 2))
        mask &= finite
        idx = np.nonzero(mask)[0][: n - accepted]
        rejected += int((~mask).sum())
        for k, v in out.items():
            data.setdefault(k, []).extend(np.asarray(v)[idx])
        accepted += len(idx)
        if verbose:
            total = accepted + rejected
            print(f"accepted={accepted}/{n} rejected={rejected} ratio={accepted / max(total, 1):.3f}")

    if output_type == "parameters":
        data.pop("videos", None)
        data.pop("trajectories", None)
    elif output_type == "trajectories":
        data.pop("videos", None)

    return data
