"""FSDP / ZeRO-3-style parameter sharding over the data axis (GSPMD).

The reference's only distributed strategy is DDP with fully replicated
parameters and optimizer state (SURVEY.md §2.5). For models whose
parameters + Adam moments + EMA shadows exceed one chip's HBM, this
module shards all of them over the *data* mesh axis and lets XLA's GSPMD
partitioner insert the per-layer all-gathers (weights, forward/backward)
and reduce-scatters (gradients) over ICI — the standard JAX formulation
of FSDP: no wrapper modules, no manual collectives, just NamedShardings
on the state plus sharded batches.

Composition: the spec picker avoids the axis a tensor-parallel spec
already uses, so fsdp('data') composes with tensor_parallel('tensor') on
a 2D mesh (each parameter axis is sharded over at most one mesh axis).
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diffsci_tpu.parallel.mesh import DATA_AXIS


def fsdp_specs(params: Any, mesh: Mesh, axis: str = DATA_AXIS,
               min_elements: int = 4096,
               existing_specs: Any = None) -> Any:
    """PartitionSpec pytree sharding each parameter's largest
    ``axis``-divisible dimension; small params stay replicated.

    ``existing_specs``: an optional spec tree (e.g. from
    tensor_parallel_specs) to compose with — dimensions already taken
    keep their axis, and fsdp picks a different dimension.
    """
    n = mesh.shape[axis]

    def spec(leaf, prior=None):
        prior_spec = tuple(prior) if prior is not None else ()
        prior_spec += (None,) * (leaf.ndim - len(prior_spec))
        if leaf.size < min_elements:
            return P(*prior_spec) if any(p is not None
                                         for p in prior_spec) else P()
        # largest divisible dim not already sharded
        dims = sorted(range(leaf.ndim), key=lambda d: -leaf.shape[d])
        for d in dims:
            if prior_spec[d] is None and leaf.shape[d] % n == 0 \
                    and leaf.shape[d] >= n:
                out = list(prior_spec)
                out[d] = axis
                return P(*out)
        return P(*prior_spec) if any(p is not None
                                     for p in prior_spec) else P()

    if existing_specs is not None:
        return jax.tree.map(spec, params, existing_specs)
    return jax.tree.map(lambda leaf: spec(leaf), params)


def shard_state_fsdp(state, mesh: Mesh, axis: str = DATA_AXIS,
                     min_elements: int = 4096, tensor_axis: str | None = None,
                     tensor_min_size: int = 128, existing_specs: Any = None):
    """Shard a TrainState FSDP-style: params, optimizer moments, and EMA
    shadows sharded over ``axis``; consts and step replicated. Run the
    usual jitted train step on the result with a data-sharded batch —
    GSPMD does the rest.

    Both spec pickers are pure functions of leaf shape, so optimizer and
    EMA trees get their specs computed from their *own* leaves — a
    moment whose shape mirrors its param gets the identical spec, and a
    factored-optimizer moment with a shape unlike any param still gets
    sharded on its own largest divisible dimension rather than silently
    replicated.

    ``tensor_axis``: compose with tensor parallelism on a 2D mesh —
    equivalent to passing ``existing_specs=tensor_parallel_specs(...)``
    for the params, but applied consistently to the mirrored trees too.
    """
    from diffsci_tpu.parallel.tensor_parallel import tensor_parallel_specs

    def tree_specs(tree, prior=None):
        if prior is None and tensor_axis is not None:
            prior = tensor_parallel_specs(tree, mesh, tensor_axis,
                                          tensor_min_size)
        return fsdp_specs(tree, mesh, axis, min_elements, prior)

    def put(leaf, s):
        return jax.device_put(leaf, NamedSharding(mesh, s))

    def shard_tree(tree, prior=None):
        return jax.tree.map(put, tree, tree_specs(tree, prior))

    params = shard_tree(state.params, existing_specs)
    opt_state = shard_tree(state.opt_state)
    ema = shard_tree(state.ema) if state.ema is not None else None
    consts = jax.tree.map(lambda l: put(l, P()), state.consts)
    step = put(state.step, P())
    return state.replace(params=params, consts=consts, opt_state=opt_state,
                         ema=ema, step=step)
