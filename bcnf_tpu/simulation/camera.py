"""Synthetic camera renderer — on-device (JAX), vmapped over frames/cameras.

Replaces the reference's per-frame NumPy Monte-Carlo renderer
(`src/bcnf/simulation/camera.py:74-150`: 5000 Gaussian samples projected to
angle space and binned with `np.histogram2d`) with two jit-compiled paths:

- ``mode='mc'``: distributionally identical Monte-Carlo scatter-add histogram
  (`jax.random.normal` + flat-index `segment`-style add) for parity checks;
- ``mode='analytic'``: deterministic Gaussian splatting — the expected
  histogram computed via separable normal-CDF differences in angle space.
  Far faster (no 5000-sample scatter) and noise-free; the image statistics
  differ from MC (documented deliberate divergence, SURVEY.md section 7.3).

Camera geometry (FOV, orientation, viewing-angle rotation) mirrors reference
`src/bcnf/simulation/camera.py:8-27,83-105`. Output per frame is `(H, W) =
(ratio[1]*10, ratio[0]*10)` with the reference's `flipud(vals.T)` orientation
(`src/bcnf/simulation/camera.py:150`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MC_SAMPLES = 5000  # reference `src/bcnf/simulation/camera.py:112`
RADIUS_TO_STD = 1.0 / 1.644854  # std covering 90% of mass (reference `:113`)


def rotate_vector(vector: jnp.ndarray, angle_degrees: float | jnp.ndarray) -> jnp.ndarray:
    """Rotate a vector upwards by `angle_degrees` in its vertical plane
    (reference `src/bcnf/simulation/camera.py:8-27`)."""
    angle = jnp.deg2rad(angle_degrees)
    r = jnp.linalg.norm(vector, axis=-1)
    theta = jnp.arccos(vector[..., 2] / r) - angle
    phi = jnp.arctan2(vector[..., 1], vector[..., 0])
    return jnp.stack(
        [
            r * jnp.sin(theta) * jnp.cos(phi),
            r * jnp.sin(theta) * jnp.sin(phi),
            r * jnp.cos(theta),
        ],
        axis=-1,
    )


def get_cams_position(
    cam_radians: jnp.ndarray,
    cam_circle_radius: jnp.ndarray,
    cam_heights: jnp.ndarray,
    legacy_pairing: bool = False,
) -> jnp.ndarray:
    """Camera positions on a circle, shape `(..., n_cams, 3)`.

    SURVEY.md Q6: the reference (`src/bcnf/simulation/sampling.py:124-131`)
    iterates the 2-tuple `(cam_radiants, cam_heights)` itself, so with 2
    cameras camera 1 gets (radian[0], height=radian[1]) and camera 2 gets
    (radian=height[0], height[1]). Default here is the intended `zip`
    semantics; pass ``legacy_pairing=True`` to reproduce the reference's
    rendered-dataset geometry exactly.
    """
    if legacy_pairing:
        # Rebuild the buggy pairing: rows are the two arrays themselves.
        pairs = jnp.stack([cam_radians, cam_heights], axis=-2)  # (..., 2, n_cams)
        rad = pairs[..., :, 0]
        hgt = pairs[..., :, 1]
    else:
        rad, hgt = cam_radians, cam_heights
    radius = jnp.asarray(cam_circle_radius)[..., None]
    return jnp.stack(
        [-radius * jnp.cos(rad), radius * jnp.sin(rad), hgt], axis=-1
    )


def _camera_frame(cam_pos: jnp.ndarray, viewing_angle: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Orthonormal-ish camera basis (reference `src/bcnf/simulation/camera.py:91-105`)."""
    focus = jnp.stack([jnp.zeros_like(cam_pos[..., 0]), jnp.zeros_like(cam_pos[..., 1]), cam_pos[..., 2]], axis=-1)
    d = focus - cam_pos
    cam_dir = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    cam_dir = rotate_vector(cam_dir, viewing_angle)
    cam_up = rotate_vector(cam_dir, 90.0)
    cam_orth = jnp.cross(cam_dir, cam_up)
    return cam_dir, cam_orth, cam_up


def _angles(v: jnp.ndarray, cam_dir: jnp.ndarray, cam_orth: jnp.ndarray, cam_up: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    ph = jnp.arctan2(v @ cam_orth, v @ cam_dir)
    th = jnp.arctan2(v @ cam_up, v @ cam_dir)
    return ph, th


def _fov(ratio: tuple[int, int], fov_horizontal: float) -> tuple[float, float]:
    aspect = ratio[0] / ratio[1]
    phi = (fov_horizontal / 2) * (np.pi / 180)
    theta = (fov_horizontal / aspect / 2) * (np.pi / 180)
    return phi, theta


@partial(jax.jit, static_argnames=("ratio", "fov_horizontal"))
def render_frame_mc(
    key: jax.Array,
    ball_pos: jnp.ndarray,
    cam_pos: jnp.ndarray,
    viewing_angle: jnp.ndarray,
    radius: jnp.ndarray,
    ratio: tuple[int, int] = (16, 9),
    fov_horizontal: float = 70.0,
) -> jnp.ndarray:
    """Monte-Carlo frame render, parity path (reference `camera.py:74-150`)."""
    W, H = ratio[0] * 10, ratio[1] * 10
    phi, theta = _fov(ratio, fov_horizontal)
    cam_dir, cam_orth, cam_up = _camera_frame(cam_pos, viewing_angle)

    samples = ball_pos + radius * RADIUS_TO_STD * jax.random.normal(key, (MC_SAMPLES, 3))
    ph, th = _angles(samples - cam_pos, cam_dir, cam_orth, cam_up)

    ix = jnp.floor((ph + phi) / (2 * phi) * W).astype(jnp.int32)
    iy = jnp.floor((th + theta) / (2 * theta) * H).astype(jnp.int32)
    # np.histogram2d includes the right edge in the last bin
    ix = jnp.where(ph == phi, W - 1, ix)
    iy = jnp.where(th == theta, H - 1, iy)
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    flat = jnp.where(valid, iy * W + ix, H * W)  # overflow bin for invalid
    hist = jnp.zeros(H * W + 1).at[flat].add(1.0)[:-1].reshape(H, W)

    total = hist.sum()
    img = jnp.where(total > 0, hist / jnp.where(total > 0, total, 1.0), 0.0)
    # orientation: rows top-to-bottom = decreasing th (reference flipud(vals.T))
    return img[::-1]


@partial(jax.jit, static_argnames=("ratio", "fov_horizontal"))
def render_frame_analytic(
    ball_pos: jnp.ndarray,
    cam_pos: jnp.ndarray,
    viewing_angle: jnp.ndarray,
    radius: jnp.ndarray,
    ratio: tuple[int, int] = (16, 9),
    fov_horizontal: float = 70.0,
) -> jnp.ndarray:
    """Deterministic expected-histogram render via separable Gaussian CDFs.

    The ball center projects to angles (ph0, th0); the angular spread is
    ``atan(std / distance)``. Bin mass = product of per-axis normal CDF
    differences, normalized over in-view mass like the MC path.
    """
    W, H = ratio[0] * 10, ratio[1] * 10
    phi, theta = _fov(ratio, fov_horizontal)
    cam_dir, cam_orth, cam_up = _camera_frame(cam_pos, viewing_angle)

    d = ball_pos - cam_pos
    dist = jnp.linalg.norm(d)
    ph0, th0 = _angles(d, cam_dir, cam_orth, cam_up)
    ang_std = jnp.arctan(radius * RADIUS_TO_STD / dist)

    xedges = jnp.linspace(-phi, phi, W + 1)
    yedges = jnp.linspace(-theta, theta, H + 1)
    cdf_x = jax.scipy.stats.norm.cdf(xedges, loc=ph0, scale=ang_std)
    cdf_y = jax.scipy.stats.norm.cdf(yedges, loc=th0, scale=ang_std)
    mass_x = jnp.diff(cdf_x)  # (W,)
    mass_y = jnp.diff(cdf_y)  # (H,)
    img = mass_y[:, None] * mass_x[None, :]  # (H, W)

    behind = (d @ cam_dir) <= 0  # ball behind the camera never renders
    total = img.sum()
    img = jnp.where(
        behind | (total < 1e-12), jnp.zeros_like(img), img / jnp.where(total > 0, total, 1.0)
    )
    return img[::-1]


@partial(jax.jit, static_argnames=("ratio", "fov_horizontal", "mode"))
def record_trajectory(
    trajectory: jnp.ndarray,
    cam_pos: jnp.ndarray,
    viewing_angle: jnp.ndarray,
    radius: jnp.ndarray,
    key: jax.Array | None = None,
    ratio: tuple[int, int] = (16, 9),
    fov_horizontal: float = 70.0,
    mode: str = "analytic",
) -> jnp.ndarray:
    """Render a `(T, 3)` trajectory into a `(T, H, W)` video
    (reference `src/bcnf/simulation/camera.py:30-71`, minus the GIF writer —
    see `bcnf_tpu.plots` for visualization)."""
    T = trajectory.shape[0]
    if mode == "mc":
        if key is None:
            raise ValueError("mode='mc' requires a PRNG key")
        keys = jax.random.split(key, T)
        return jax.vmap(
            lambda k, p: render_frame_mc(k, p, cam_pos, viewing_angle, radius, ratio, fov_horizontal)
        )(keys, trajectory)
    return jax.vmap(
        lambda p: render_frame_analytic(p, cam_pos, viewing_angle, radius, ratio, fov_horizontal)
    )(trajectory)
