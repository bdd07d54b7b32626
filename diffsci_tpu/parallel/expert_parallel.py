"""Expert parallelism (GSPMD): shard stacked MoE expert weights over an
'expert' mesh axis and let XLA run each expert's FFN on its own device
slice, moving tokens with all-to-alls over ICI.

The reference has no MoE (SURVEY.md §2.5 — DDP is its only distributed
strategy); this pairs with models/nets/moe.py, whose expert parameters
are stacked ``[E, ...]`` tensors named ``experts_*``. Sharding is purely
name-based on that prefix, so it composes with fsdp/tp specs for the
dense remainder of the network: everything non-expert stays whatever the
other strategy chose (replicated here).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

EXPERT_AXIS = "expert"


def expert_parallel_specs(params: Any, mesh: Mesh,
                          axis: str = EXPERT_AXIS) -> Any:
    """PartitionSpec pytree: leaves whose path ends in an ``experts_*``
    name get their leading (expert) axis sharded over ``axis`` when
    divisible; everything else replicated."""
    n = mesh.shape[axis]

    def spec(path, leaf):
        names = [getattr(k, "key", None) for k in path]
        if any(isinstance(s, str) and s.startswith("experts_")
               for s in names) and leaf.ndim >= 1 \
                and leaf.shape[0] % n == 0:
            return P(axis, *([None] * (leaf.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec, params)


def shard_params_expert_parallel(params: Any, mesh: Mesh,
                                 axis: str = EXPERT_AXIS) -> Any:
    """Place parameters with expert-parallel shardings."""
    specs = expert_parallel_specs(params, mesh, axis)
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
        params, specs)


def shard_state_expert_parallel(state, mesh: Mesh,
                                axis: str = EXPERT_AXIS,
                                data_axis: str | None = "data"):
    """Shard a TrainState for dp x ep: expert params (and their
    optimizer moments / EMA shadows — which mirror the param tree *key
    names*, so the name-based spec picker applies to them verbatim)
    sharded over ``axis``, everything else replicated. Run the jitted
    train step with the batch sharded over ``data_axis``."""
    def shard_tree(tree):
        specs = expert_parallel_specs(tree, mesh, axis)
        return jax.tree.map(
            lambda leaf, s: jax.device_put(leaf, NamedSharding(mesh, s)),
            tree, specs)

    def put_rep(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    ema = shard_tree(state.ema) if getattr(state, "ema", None) is not None \
        else None
    return state.replace(
        params=shard_tree(state.params),
        opt_state=shard_tree(state.opt_state),
        ema=ema,
        consts=jax.tree.map(put_rep, state.consts),
        step=put_rep(state.step))
