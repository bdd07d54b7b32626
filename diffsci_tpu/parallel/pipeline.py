"""Pipeline parallelism (GPipe-style) over a 'stage' mesh axis.

The reference's only distributed strategy is replicated DDP (SURVEY.md
§2.5); this module is TPU-native headroom for *deep sequential* models —
the DiT block stack is the natural target (uniform blocks, no skip
connections across blocks). The formulation is the standard JAX one
(scaling-book pipelining recipe): stack the per-block parameters into a
[nblocks, ...] pytree, shard the leading dim over a 'stage' mesh axis,
and run a microbatched schedule inside ``shard_map`` where activations
move between stages with ``ppermute`` over ICI:

- tick t: stage 0 ingests microbatch t (while t < n_micro); every stage
  applies its local blocks to the activation it holds; activations
  rotate one stage forward.
- the last stage emits microbatch t-(n_stages-1) on ticks
  t >= n_stages-1; the loop runs n_micro + n_stages - 1 ticks total
  (the usual GPipe bubble — idle-stage work is computed and masked,
  which is how SPMD pipelines express bubbles).

The whole schedule is a differentiable ``lax.scan`` + ``ppermute``
program, so ``jax.grad`` through it yields pipelined backward for free,
and it composes with data parallelism on a ('data', 'stage') mesh (the
microbatch *content* is sharded over 'data', the *schedule* over
'stage').

Conditioning (the DiT adaLN time embedding) rides along replicated: each
stage indexes the te microbatch matching the activation it currently
holds.

``pipeline_apply`` itself is model-agnostic: any uniform,
shape-preserving block stack applies (ConVitBlock qualifies — pass
``block_apply=lambda p, x, emb: ConVitBlock(cfg).apply({'params': p}, x,
emb)`` with the stacked ``block_{i}`` params). ``make_dit_pipeline`` is
the packaged DiT instance.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STAGE_AXIS = "stage"


def stack_block_params(params: Any, block_names: Sequence[str]):
    """Split a model's param dict into (stacked_blocks, rest).

    ``stacked_blocks`` is the per-block param trees stacked on a new
    leading [nblocks] axis (shardable over the stage axis);``rest`` is
    everything else (embedding/head), which stays replicated.
    """
    blocks = [params[n] for n in block_names]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    rest = {k: v for k, v in params.items() if k not in set(block_names)}
    return stacked, rest


def unstack_block_params(stacked: Any, rest: Any,
                         block_names: Sequence[str]) -> dict:
    """Inverse of :func:`stack_block_params` — rebuild the flat param
    dict (e.g. to save a pipeline-trained model as a normal checkpoint)."""
    params = dict(rest)
    for i, name in enumerate(block_names):
        params[name] = jax.tree.map(lambda leaf: leaf[i], stacked)
    return params


def shard_stacked_params(stacked: Any, mesh: Mesh,
                         stage_axis: str = STAGE_AXIS) -> Any:
    """Place stacked block params with their leading dim sharded over the
    stage axis (one contiguous chunk of blocks per stage)."""
    spec = NamedSharding(mesh, P(stage_axis))
    return jax.tree.map(lambda leaf: jax.device_put(leaf, spec), stacked)


def _pipeline_shard_fn(stacked, tok_mb, te_mb, *, block_apply,
                       stage_axis: str, n_stages: int, n_micro: int):
    """Runs on one stage inside shard_map. ``stacked`` holds this stage's
    [blocks_per_stage, ...] params; ``tok_mb``/``te_mb`` are
    [n_micro, mb, ...] microbatches (replicated over the stage axis)."""
    stage = jax.lax.axis_index(stage_axis)

    def apply_stage(tokens, te):
        def body(tok, p):
            return block_apply(p, tok, te), None
        tokens, _ = jax.lax.scan(body, tokens, stacked)
        return tokens

    buf0 = jnp.zeros_like(tok_mb[0])
    outs0 = jnp.zeros_like(tok_mb)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def tick(carry, t):
        buf, outs = carry
        # stage 0 ingests microbatch t (clamped index; output of the
        # overrun ticks is masked below), other stages use the rotated
        # activation they received last tick
        inp = tok_mb[jnp.minimum(t, n_micro - 1)]
        x_in = jnp.where(stage == 0, inp, buf)
        # the microbatch currently at stage s on tick t is t - s
        mb_id = jnp.clip(t - stage, 0, n_micro - 1)
        y = apply_stage(x_in, te_mb[mb_id])
        buf_next = jax.lax.ppermute(y, stage_axis, perm)
        # last stage emits microbatch t-(n_stages-1) once the pipe fills
        out_id = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
        valid = ((t >= n_stages - 1) & (t - (n_stages - 1) < n_micro)
                 & (stage == n_stages - 1))
        cur = jax.lax.dynamic_index_in_dim(outs, out_id, 0, keepdims=False)
        outs = jax.lax.dynamic_update_index_in_dim(
            outs, jnp.where(valid, y, cur), out_id, 0)
        return (buf_next, outs), None

    (_, outs), _ = jax.lax.scan(
        tick, (buf0, outs0), jnp.arange(n_micro + n_stages - 1))
    # outs is populated on the last stage only; replicate it so the
    # shard_map output spec (no stage axis) holds on every stage
    outs = jax.lax.psum(
        jnp.where(stage == n_stages - 1, outs, jnp.zeros_like(outs)),
        stage_axis)
    return outs


def pipeline_apply(block_apply: Callable, stacked: Any, tokens, te,
                   mesh: Mesh, *, n_micro: int,
                   stage_axis: str = STAGE_AXIS,
                   data_axis: str | None = None):
    """Apply a stack of uniform blocks to ``tokens`` under pipeline
    parallelism.

    ``block_apply(block_params, tokens, te) -> tokens`` applies ONE block.
    ``stacked`` carries all blocks on its leading axis (n_stages must
    divide it; each stage runs a contiguous chunk in ``lax.scan``).
    ``tokens``/``te`` are the full batch; it is split into ``n_micro``
    equal microbatches along axis 0. With ``data_axis`` set, the batch
    content is additionally sharded over that mesh axis (dp x pp).
    """
    n_stages = mesh.shape[stage_axis]
    nblocks = jax.tree.leaves(stacked)[0].shape[0]
    if nblocks % n_stages:
        raise ValueError(f"{nblocks} blocks not divisible by "
                         f"{n_stages} stages")
    B = tokens.shape[0]
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by n_micro={n_micro}")
    mb = B // n_micro
    tok_mb = tokens.reshape(n_micro, mb, *tokens.shape[1:])
    te_mb = te.reshape(n_micro, mb, *te.shape[1:])

    fn = functools.partial(_pipeline_shard_fn, block_apply=block_apply,
                           stage_axis=stage_axis, n_stages=n_stages,
                           n_micro=n_micro)
    outs = shard_map(
        fn, mesh=mesh,
        in_specs=(P(stage_axis), P(None, data_axis), P(None, data_axis)),
        out_specs=P(None, data_axis),
        check_vma=False,
    )(stacked, tok_mb, te_mb)
    return outs.reshape(B, *tokens.shape[1:])


def split_dit_variables(variables: Any, nblocks: int):
    """Split a DiffusionTransformer variables dict into
    ``(rest_variables, stacked_blocks, block_names)``: the stacked block
    params (pipeline-trainable, shard over the stage axis) and everything
    else (embed/head params + non-param collections such as the Fourier
    'buffers', replicated)."""
    block_names = [f"block_{i}" for i in range(nblocks)]
    stacked, rest_params = stack_block_params(variables["params"],
                                              block_names)
    rest = {k: v for k, v in variables.items() if k != "params"}
    rest["params"] = rest_params
    return rest, stacked, block_names


def merge_dit_variables(rest: Any, stacked: Any,
                        block_names: Sequence[str]) -> dict:
    """Inverse of :func:`split_dit_variables` — rebuild the plain
    variables dict (e.g. to save a normal checkpoint)."""
    variables = {k: v for k, v in rest.items() if k != "params"}
    variables["params"] = unstack_block_params(stacked, rest["params"],
                                               block_names)
    return variables


def make_dit_pipeline(model, mesh: Mesh, *, n_micro: int,
                      stage_axis: str = STAGE_AXIS,
                      data_axis: str | None = None):
    """Pipeline-parallel forward for a DiffusionTransformer.

    Returns ``(forward, block_names)`` where
    ``forward(rest_variables, stacked_params, x, t, y=None)`` reproduces
    ``model.apply(variables, x, t, y)`` with the block stack executed as
    a pipeline over ``stage_axis``. Split/rebuild the variables with
    :func:`split_dit_variables` / :func:`merge_dit_variables`.

    The embedding and head (a few small dense layers) run replicated on
    every stage — negligible next to the block stack they bracket.
    """
    from diffsci_tpu.models.nets.dit import DiTBlock, DiffusionTransformer

    block_names = [f"block_{i}" for i in range(model.nblocks)]
    block = DiTBlock(model.nembed, model.nheads, model.mlp_factor,
                     attn_backend=model.attn_backend)

    def block_apply(p, tok, te):
        return block.apply({"params": p}, tok, te)

    def forward(rest, stacked, x, t=None, y=None):
        H, W = x.shape[1], x.shape[2]
        tokens, te = model.apply(rest, x, t, y,
                                 method=DiffusionTransformer.embed)
        tokens = pipeline_apply(block_apply, stacked, tokens, te, mesh,
                                n_micro=n_micro, stage_axis=stage_axis,
                                data_axis=data_axis)
        return model.apply(rest, tokens, H, W,
                           method=DiffusionTransformer.head)

    return forward, block_names
