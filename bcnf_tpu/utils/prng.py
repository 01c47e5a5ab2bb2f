"""PRNG key discipline helpers.

JAX-native replacement for the reference's implicit NumPy/Torch global RNG
(e.g. reference `src/bcnf/simulation/sampling.py:113-119` uses np.random.*).
Every stochastic component takes an explicit key; multi-chip independence is
obtained by folding in the device index (SURVEY.md section 5.8).
"""

from __future__ import annotations

from typing import Iterator

import jax


def key_from_seed(seed: int | None) -> jax.Array:
    """Create a root key; `seed=None` draws entropy from the OS."""
    if seed is None:
        import secrets

        seed = secrets.randbits(31)
    return jax.random.key(seed)


def split_like(key: jax.Array, names: tuple[str, ...]) -> dict[str, jax.Array]:
    """Split one key into a dict of named keys."""
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))


def key_stream(key: jax.Array) -> Iterator[jax.Array]:
    """An infinite stream of fresh keys (host-side loop use only)."""
    while True:
        key, sub = jax.random.split(key)
        yield sub


def fold_in_step(key: jax.Array, step: int) -> jax.Array:
    """Per-step key derivation: reproducible at any chip count when combined
    with per-device `jax.random.fold_in(key, axis_index)` inside sharded code."""
    return jax.random.fold_in(key, step)
