"""GSPMD tensor parallelism: shard wide parameters over a 'tensor' mesh
axis and let XLA partition the matmuls/convs and insert the collectives.

The reference has no tensor parallelism (SURVEY.md §2.5 — DP is its only
distributed strategy); this is TPU-native headroom for models too large per
chip. No model changes are needed: parameters get NamedShardings on their
output-feature axis when that axis is large and divisible by the mesh axis;
under jit, XLA propagates the shardings through the network (column-wise
parallel linear/conv) and inserts all-gathers/reduce-scatters over ICI.

KNOWN UPSTREAM LIMITATION (jax 0.9.0, XLA:CPU backend): combining a
tensor-sharded conv KERNEL with a spatially-sharded conv INPUT on the same
mesh miscompiles on the CPU backend — a single ``lax.conv_general_dilated``
with kernel P(..., 'tensor') and input P(None, 'spatial', ...) returns
wrong values, while either sharding alone is exact (pinned by
tests/test_parallel.py::test_xla_cpu_conv_tp_sp_miscompile). Until that is
fixed upstream, compose 'tensor' with 'data' (dp x tp — validated), and use
'spatial' sharding for the halo decode path, not jointly with tp in one
program on CPU.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffsci_tpu.parallel.mesh import TENSOR_AXIS


def tensor_parallel_specs(params: Any, mesh: Mesh,
                          axis: str = TENSOR_AXIS,
                          min_size: int = 128) -> Any:
    """PartitionSpec pytree sharding each parameter's output-feature (last)
    axis over ``axis`` when it is divisible and at least ``min_size``;
    biases and small params stay replicated."""
    n = mesh.shape[axis]

    def spec(leaf):
        if leaf.ndim >= 2 and leaf.shape[-1] >= min_size \
                and leaf.shape[-1] % n == 0:
            return P(*([None] * (leaf.ndim - 1)), axis)
        return P()

    return jax.tree.map(spec, params)


def shard_params_tensor_parallel(params: Any, mesh: Mesh,
                                 axis: str = TENSOR_AXIS,
                                 min_size: int = 128) -> Any:
    """Place parameters with tensor-parallel shardings."""
    specs = tensor_parallel_specs(params, mesh, axis, min_size)
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        params, specs)


def shard_state_tensor_parallel(state, mesh: Mesh,
                                axis: str = TENSOR_AXIS,
                                data_axis: str | None = "data",
                                min_size: int = 128):
    """Shard a TrainState for combined DP x TP: params (and their optimizer
    moments / EMA shadows, which share the param structure) sharded on the
    tensor axis; everything else replicated."""
    pspecs = tensor_parallel_specs(state.params, mesh, axis, min_size)

    def put(leaf, s):
        return jax.device_put(leaf, NamedSharding(mesh, s))

    params = jax.tree.map(put, state.params, pspecs)

    # shape-based spec lookup for trees mirroring the param structure
    # (adam moments, EMA shadow profiles); non-matching leaves replicate
    shape_to_spec = {}
    param_leaves = jax.tree.leaves(state.params)
    spec_leaves = jax.tree.leaves(pspecs,
                                  is_leaf=lambda x: isinstance(x, P))
    for leaf, s in zip(param_leaves, spec_leaves):
        shape_to_spec.setdefault(leaf.shape, s)

    def shard_like_params(tree):
        def visit(leaf):
            s = shape_to_spec.get(getattr(leaf, "shape", None), P())
            return put(leaf, s)
        return jax.tree.map(visit, tree)

    opt_state = shard_like_params(state.opt_state)
    ema = shard_like_params(state.ema) if state.ema is not None else None
    consts = jax.tree.map(lambda l: put(l, P()), state.consts)
    step = put(state.step, P())
    return state.replace(params=params, consts=consts, opt_state=opt_state,
                         ema=ema, step=step)
