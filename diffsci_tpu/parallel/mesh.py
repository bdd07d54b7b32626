"""Device mesh + sharding helpers: the TPU-native replacement for the
reference's torchrun/Lightning DDP (reference
scripts/training/train-edm-cifar10.py:318-327, SURVEY.md §2.5).

Design: data parallelism is expressed declaratively — the batch is placed
with a NamedSharding over the mesh 'data' axis, parameters are replicated,
and the jitted train step runs SPMD with XLA inserting the gradient
all-reduce over ICI. No NCCL-style explicit communication code is needed;
for multi-host, call ``jax.distributed.initialize()`` before ``make_mesh``.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"  # used by halo-exchange tiled decode
TENSOR_AXIS = "tensor"


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> int:
    """Multi-host initialization (SURVEY.md §2.5/§5: the TPU-native stand-in
    for the reference's torchrun rendezvous, train-edm-cifar10.py:318-327).

    On Cloud TPU pods, call with no arguments — JAX discovers the topology
    from the environment. Elsewhere pass the coordinator address and
    process grid explicitly. Idempotent: safe to call when already
    initialized or single-process (returns the process count either way).
    Call BEFORE any other JAX API, then build the global mesh with
    ``make_mesh()`` — collectives ride ICI within a slice and DCN across.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    except (RuntimeError, ValueError) as e:
        # already initialized, or single-process with no coordinator
        if num_processes not in (None, 1):
            raise
        del e
    return jax.process_count()


def make_mesh(n_devices: int | None = None,
              axes: Sequence[str] = (DATA_AXIS,),
              shape: Sequence[int] | None = None) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices. With one axis the
    shape is (n,); multi-axis meshes take an explicit shape."""
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        if len(axes) != 1:
            raise ValueError("multi-axis mesh needs an explicit shape")
        shape = (n_devices,)
    dev_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS,
                   ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over ``axis``; replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Place every array in ``batch`` with its leading dim sharded over the
    mesh ``axis``; per-host input pipelines feed their local shard.

    Single-process: a device_put with the NamedSharding. Multi-process
    (``jax.process_count() > 1``): ``batch`` is this process's LOCAL rows
    (e.g. from ``ArrayDataLoader``'s per-process slicing) and the global
    jax.Array is assembled with
    ``jax.make_array_from_process_local_data`` — the per-rank input path
    the reference delegates to Lightning DDP's DistributedSampler
    (reference scripts/training/train-edm-cifar10.py:318-327)."""
    multiprocess = jax.process_count() > 1

    def place(x):
        sharding = batch_sharding(mesh, axis, x.ndim)
        if multiprocess:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return jax.device_put(x, sharding)
    return jax.tree.map(place, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def constrain_batch(x, mesh: Mesh, axis: str = DATA_AXIS):
    """Place/constrain ``x``'s leading (batch) dim onto the mesh ``axis``.
    Works both eagerly (device_put placement) and under jit (sharding
    constraint) — used by the samplers' data-parallel mode. Raises if the
    batch does not divide the axis (the samplers' shared contract)."""
    n = mesh.shape[axis]
    if x.shape[0] % n:
        raise ValueError(f"batch {x.shape[0]} not divisible by mesh "
                         f"'{axis}' axis size {n}")
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Pad the batch so it divides the mesh axis; returns (padded, n_real)."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    import jax.numpy as jnp
    return jnp.pad(x, pad), n
