"""Simple observation models (reference `src/bcnf/simulation/observation.py:1-21`)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gaussian_observation_noise(key: jax.Array, p: jnp.ndarray, std: float = 0.1) -> jnp.ndarray:
    """Add Gaussian noise while the object is airborne (z > 0)
    (reference `src/bcnf/simulation/observation.py:4-10`)."""
    noise = std * jax.random.normal(key, p.shape)
    airborne = (p[..., -1:] > 0)
    return p + jnp.where(airborne, noise, 0.0)


def simple_2D_camera_observation(
    p: jnp.ndarray, key: jax.Array | None = None, noise: bool = False, std: float = 0.1
) -> jnp.ndarray:
    """Project onto the x-z plane (reference `src/bcnf/simulation/observation.py:13-21`)."""
    if noise:
        if key is None:
            raise ValueError("noise=True requires a PRNG key")
        return gaussian_observation_noise(key, p, std=std)[..., [0, 2]]
    return p[..., [0, 2]]
