from bcnf_tpu.parallel.mesh import (
    batch_sharding,
    ensure_cpu_devices,
    initialize_distributed,
    is_host_zero,
    make_2d_mesh,
    make_mesh,
    pad_to_multiple,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "make_2d_mesh",
    "batch_sharding",
    "ensure_cpu_devices",
    "replicated",
    "shard_batch",
    "replicate",
    "pad_to_multiple",
    "initialize_distributed",
    "is_host_zero",
]
