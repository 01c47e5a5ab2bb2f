"""Device mesh and sharding helpers — the multi-chip backbone.

The reference is single-process/single-GPU with no distributed support
(SURVEY.md section 5.8). This module adds the TPU-native data-parallel
capability: one 1-D `Mesh(('data',))` spanning all chips (ICI within a slice,
DCN across slices), parameters replicated, batch sharded. Gradients reduce as
XLA `psum` over ICI automatically under `jit` with these shardings — identical
code at 1 chip and N hosts. Degrades gracefully to a 1-device mesh on CPU.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ensure_cpu_devices(n: int) -> None:
    """Honor `JAX_PLATFORMS=cpu` + host-device-count env vars even when a
    platform plugin pinned the backend at interpreter start (this image's
    sitecustomize imports jax before user code, so env parsing happens with
    the plugin's values). No-op once backends are initialized."""
    import os

    env_flags = os.environ.get("XLA_FLAGS", "")
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower() or (
        "xla_force_host_platform_device_count" in env_flags
    ):
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", max(n, 1))
        except Exception:
            pass


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """Build a 1-D data-parallel mesh over (the first `n_devices`) devices.

    Raises if fewer devices are visible than requested — silently degrading
    to a smaller mesh hides misconfiguration (e.g. forgetting
    `--xla_force_host_platform_device_count` on a CPU host).
    """
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"Requested a {n_devices}-device mesh but only {len(devices)} "
                f"device(s) are visible: {devices}. On a CPU host set "
                f"XLA_FLAGS=--xla_force_host_platform_device_count={n_devices}."
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_2d_mesh(dp: int, mp: int, axis_names: tuple[str, str] = ("data", "model")) -> Mesh:
    """A (data, model) mesh for models large enough to need sharded params."""
    devices = np.asarray(jax.devices()[: dp * mp]).reshape(dp, mp)
    return Mesh(devices, axis_names)


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = "data") -> NamedSharding:
    """Shard axis 0 (batch) over the mesh; other axes replicated."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _global_put(x: Any, sharding: NamedSharding) -> jax.Array:
    """Build a global array spanning processes from a host-replicated value.

    Every process holds the identical full value (datasets and params are
    seeded identically per process); `make_array_from_callback` hands each
    local device exactly its shard, so this works for both sharded and
    replicated layouts in multi-process runs where a plain `device_put`
    cannot address remote devices.
    """
    xh = np.asarray(x)
    return jax.make_array_from_callback(xh.shape, sharding, lambda idx: xh[idx])


def shard_batch(mesh: Mesh | None, tree: Any, axis_name: str = "data") -> Any:
    """Device-put every leaf with its batch axis sharded over the mesh."""
    if mesh is None:
        return tree
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: _global_put(x, batch_sharding(mesh, np.ndim(x), axis_name)), tree
        )
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x), axis_name)), tree
    )


def replicate(mesh: Mesh | None, tree: Any) -> Any:
    """Device-put every leaf fully replicated over the mesh."""
    if mesh is None:
        return tree
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(lambda x: _global_put(x, sharding), tree)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(arrays: Sequence[np.ndarray], multiple: int) -> tuple[list[np.ndarray], int]:
    """Pad batch axis 0 up to a multiple (for even sharding); returns pad count."""
    n = len(arrays[0])
    pad = (-n) % multiple
    if pad == 0:
        return list(arrays), 0
    out = []
    for a in arrays:
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        out.append(np.pad(a, widths))
    return out, pad


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host initialization (`jax.distributed.initialize`); no-op for
    single-process runs. Safe to call unconditionally from the CLI."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_host_zero() -> bool:
    return jax.process_index() == 0
