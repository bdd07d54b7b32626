"""Parallelism: device meshes, shardings, halo exchange."""

from diffsci_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    replicated,
    pad_to_multiple,
    DATA_AXIS,
    SPATIAL_AXIS,
    TENSOR_AXIS,
)

__all__ = [
    "make_mesh", "shard_batch", "replicate", "batch_sharding", "replicated",
    "pad_to_multiple", "DATA_AXIS", "SPATIAL_AXIS", "TENSOR_AXIS",
]
