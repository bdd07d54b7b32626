"""Parallelism: device meshes, shardings, halo exchange."""

from diffsci_tpu.parallel.mesh import (
    make_mesh,
    initialize_distributed,
    shard_batch,
    replicate,
    batch_sharding,
    replicated,
    pad_to_multiple,
    constrain_batch,
    DATA_AXIS,
    SPATIAL_AXIS,
    TENSOR_AXIS,
)

from diffsci_tpu.parallel.tensor_parallel import (
    tensor_parallel_specs,
    shard_params_tensor_parallel,
    shard_state_tensor_parallel,
)

from diffsci_tpu.parallel.fsdp import (
    fsdp_specs,
    shard_state_fsdp,
)

from diffsci_tpu.parallel.expert_parallel import (
    EXPERT_AXIS,
    expert_parallel_specs,
    shard_params_expert_parallel,
    shard_state_expert_parallel,
)

from diffsci_tpu.parallel.pipeline import (
    STAGE_AXIS,
    stack_block_params,
    unstack_block_params,
    shard_stacked_params,
    pipeline_apply,
    make_dit_pipeline,
)

__all__ = [
    "make_mesh", "initialize_distributed", "shard_batch", "replicate", "batch_sharding", "replicated",
    "pad_to_multiple", "constrain_batch", "DATA_AXIS", "SPATIAL_AXIS", "TENSOR_AXIS",
    "tensor_parallel_specs", "shard_params_tensor_parallel",
    "shard_state_tensor_parallel", "fsdp_specs", "shard_state_fsdp",
    "EXPERT_AXIS", "expert_parallel_specs", "shard_params_expert_parallel",
    "shard_state_expert_parallel",
    "STAGE_AXIS", "stack_block_params", "unstack_block_params",
    "shard_stacked_params", "pipeline_apply", "make_dit_pipeline",
]
