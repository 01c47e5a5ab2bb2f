"""Prior sampling over physical parameters — vectorized `jax.random` version of
reference `src/bcnf/simulation/sampling.py:107-284`.

The reference samples one parameter set at a time with NumPy's global RNG; here
each distribution draws a whole batch from an explicit key, so dataset
generation is a single jit-compiled program (SURVEY.md section 7.1:
"on-device vmapped simulator").

Reference quirks replicated exactly (they define the data distribution):

- xy-components of x0 / v0 / w are sampled in polar form; for `gaussian` the
  radius is ``sqrt(|N(0,1)|) * std + mean`` (reference
  `src/bcnf/simulation/sampling.py:164,180,196`), for `uniform` x0 uses
  ``sqrt(U(min,max))`` (`:166`) while v0/w use plain ``U(min,max)``
  (`:182,198`).
- thrust magnitude for `gaussian` is ``cbrt(|N(0,1)|) * std + mean`` with
  uniform spherical angles phi ~ U(0,2pi), theta ~ U(0,pi) (`:211-221`).
- gravity is vertical only: ``g_z = -sample(g)`` (`:224`), `g_x = g_y = 0`.
- drag coefficient ``b = rho * A * Cd`` with ``A = pi*r**2`` (`:234-239`).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from bcnf_tpu.errors import ConfigError


def sample_from_config(key: jax.Array, spec: dict[str, Any], shape: tuple[int, ...]) -> jnp.ndarray:
    """Draw `shape` samples from a prior spec `{distribution, min, max, mean, std, shape, scale}`.

    Mirrors reference `src/bcnf/simulation/sampling.py:107-121`: `gaussian`
    returns *raw* N(0,1) samples — scaling by mean/std is the caller's job,
    exactly as in the reference.
    """
    dist = spec["distribution"]
    if dist == "uniform":
        if "min" not in spec or "max" not in spec:
            raise ConfigError("min and max must be defined for uniform distribution")
        return jax.random.uniform(
            key, shape, minval=float(spec["min"]), maxval=float(spec["max"])
        )
    if dist == "gaussian":
        return jax.random.normal(key, shape)
    if dist == "gamma":
        if "shape" not in spec or "scale" not in spec:
            raise ConfigError("shape and scale must be defined for gamma distribution")
        return jax.random.gamma(key, float(spec["shape"]), shape) * float(spec["scale"])
    raise ConfigError(f"Unknown distribution type: {dist}")


def _polar_radius(key: jax.Array, spec: dict, n: int, transform: str) -> jnp.ndarray:
    """Radius sampling for polar/spherical coordinates with the reference's
    per-distribution transform quirks (see module docstring)."""
    raw = sample_from_config(key, spec, (n,))
    dist = spec["distribution"]
    if dist == "gaussian":
        if transform == "sqrt":
            return jnp.sqrt(jnp.abs(raw)) * float(spec["std"]) + float(spec["mean"])
        if transform == "cbrt":
            return jnp.cbrt(jnp.abs(raw)) * float(spec["std"]) + float(spec["mean"])
        return raw * float(spec["std"]) + float(spec["mean"])
    if dist == "uniform" and transform == "sqrt_uniform":
        return jnp.sqrt(raw)
    return raw


def _scalar(key: jax.Array, spec: dict, n: int) -> jnp.ndarray:
    """z-component style sampling: gaussian is scaled by mean/std (reference `:174,190,206`)."""
    raw = sample_from_config(key, spec, (n,))
    if spec["distribution"] == "gaussian":
        return raw * float(spec["std"]) + float(spec["mean"])
    return raw


@partial(jax.jit, static_argnames=("n", "num_cams", "prior"))
def _sample_batch(key: jax.Array, n: int, num_cams: int, prior: "HashableConfig") -> dict[str, jnp.ndarray]:
    cfg = prior.data
    ks = jax.random.split(key, 24)

    # Initial position: polar xy + separate z (reference `:163-176`)
    r_x = _polar_radius(ks[0], cfg["x0"]["x0_xy"], n, "sqrt" if cfg["x0"]["x0_xy"]["distribution"] == "gaussian" else "sqrt_uniform")
    phi = jax.random.uniform(ks[1], (n,), maxval=2 * jnp.pi)
    x0_x, x0_y = r_x * jnp.cos(phi), r_x * jnp.sin(phi)
    x0_z = _scalar(ks[2], cfg["x0"]["x0_z"], n)

    # Initial velocity (reference `:179-192`)
    r_v = _polar_radius(ks[3], cfg["v0"]["v0_xy"], n, "sqrt")
    phi_v = jax.random.uniform(ks[4], (n,), maxval=2 * jnp.pi)
    v0_x, v0_y = r_v * jnp.cos(phi_v), r_v * jnp.sin(phi_v)
    v0_z = _scalar(ks[5], cfg["v0"]["v0_z"], n)

    # Wind (reference `:195-208`)
    r_w = _polar_radius(ks[6], cfg["w"]["w_xy"], n, "sqrt")
    phi_w = jax.random.uniform(ks[7], (n,), maxval=2 * jnp.pi)
    w_x, w_y = r_w * jnp.cos(phi_w), r_w * jnp.sin(phi_w)
    w_z = _scalar(ks[8], cfg["w"]["w_z"], n)

    # Thrust: spherical (reference `:211-221`)
    r_a = _polar_radius(ks[9], cfg["a"], n, "cbrt")
    phi_a = jax.random.uniform(ks[10], (n,), maxval=2 * jnp.pi)
    theta_a = jax.random.uniform(ks[11], (n,), maxval=jnp.pi)
    a_x = r_a * jnp.sin(theta_a) * jnp.cos(phi_a)
    a_y = r_a * jnp.sin(theta_a) * jnp.sin(phi_a)
    a_z = r_a * jnp.cos(theta_a)

    # Gravity, air density, ball radius, drag (reference `:224-242`)
    g_z = -sample_from_config(ks[12], cfg["g"], (n,))
    rho = sample_from_config(ks[13], cfg["rho"], (n,))
    r_ball = sample_from_config(ks[14], cfg["r_ball"], (n,))
    area = jnp.pi * r_ball**2
    cd = sample_from_config(ks[15], cfg["Cd"], (n,))
    b = rho * area * cd
    m = sample_from_config(ks[16], cfg["m"], (n,))

    # Camera geometry priors (reference `:245-254`)
    cam_radian = sample_from_config(ks[17], cfg["cam_radian"], (n, max(num_cams - 1, 1)))
    cam_radius = sample_from_config(ks[18], cfg["cam_radius"], (n,))
    cam_angles = sample_from_config(ks[19], cfg["cam_angle"], (n, num_cams))
    cam_heights = sample_from_config(ks[20], cfg["cam_heights"], (n, num_cams))

    return {
        "x0_x": x0_x, "x0_y": x0_y, "x0_z": x0_z,
        "v0_x": v0_x, "v0_y": v0_y, "v0_z": v0_z,
        "g_x": jnp.zeros(n), "g_y": jnp.zeros(n), "g_z": g_z,
        "w_x": w_x, "w_y": w_y, "w_z": w_z,
        "b": b, "m": m,
        "a_x": a_x, "a_y": a_y, "a_z": a_z,
        "cam_radian_array": cam_radian[:, : num_cams - 1],
        "r": r_ball, "A": area, "Cd": cd, "rho": rho,
        "cam_radius": cam_radius,
        "cam_angles": cam_angles,
        "cam_heights": cam_heights,
    }


class HashableConfig:
    """Wraps a nested prior-config dict so it can be a static jit argument."""

    def __init__(self, data: dict) -> None:
        self.data = data
        self._key = _freeze(data)

    def __hash__(self) -> int:
        return hash(self._key)

    def __eq__(self, other: object) -> bool:
        return isinstance(other, HashableConfig) and self._key == other._key


def _freeze(obj: Any) -> Any:
    if isinstance(obj, dict):
        return tuple(sorted((k, _freeze(v)) for k, v in obj.items()))
    if isinstance(obj, list):
        return tuple(_freeze(v) for v in obj)
    return obj


def sample_ballistic_parameters(
    key: jax.Array,
    n: int,
    prior_config: dict,
    num_cams: int = 2,
) -> dict[str, jnp.ndarray]:
    """Draw `n` parameter sets from the prior (vectorized reference `sampling.py:156-284`)."""
    return _sample_batch(key, n, num_cams, HashableConfig(prior_config))
