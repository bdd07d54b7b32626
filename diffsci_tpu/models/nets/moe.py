"""Mixture-of-Experts FFN and MoE-DiT: expert-parallel diffusion
transformer (beyond parity — the reference has no MoE or transformer
scaling story; its only distributed strategy is DDP, SURVEY.md §2.5).

TPU-native formulation of sparse MoE (GShard, arXiv:2006.16668; Switch,
arXiv:2101.03961): top-1 token routing with a fixed per-expert capacity,
and dispatch/combine written as einsums against a one-hot dispatch
tensor — no gather/scatter, so every op is a static-shape matmul the MXU
can tile. Expert parameters are stored stacked as ``[E, ...]`` tensors;
sharding that leading axis over an ``'expert'`` mesh axis
(parallel/expert_parallel.py) makes XLA's GSPMD partitioner run each
expert's FFN on its own device slice and move tokens with all-to-alls
over ICI — the standard TPU expert-parallel execution, with zero manual
collectives.

Capacity is static (``ceil(capacity_factor * tokens / n_experts)``
rounded up to a multiple of 8 for lane tiling), so the jitted step has
fixed shapes; tokens routed past capacity are *dropped* for the MoE
branch — the DiT residual stream carries them unchanged, the standard
Switch behavior.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from diffsci_tpu.models.nets.dit import (
    DiTBlock, DiffusionTransformer, adaln_modulate)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


class MoEFeedForward(nn.Module):
    """Top-1-routed expert FFN over tokens ``[B, T, d] -> [B, T, d]``.

    Expert weights: ``experts_w1 [E, d, f]``, ``experts_w2 [E, f, d]``
    (+ biases) — leading axis shardable over the 'expert' mesh axis.
    Sows (collection 'intermediates'):
      - ``moe_aux_loss``: Switch load-balance loss ``E * sum(f_e p_e)``
        (=1 at perfectly uniform routing); add ``aux_weight * (aux-1)``
        to the training loss to keep routing balanced.
      - ``moe_dropped_fraction``: fraction of tokens past capacity.
    """
    nembed: int
    n_experts: int
    mlp_factor: int = 4
    capacity_factor: float = 2.0

    @nn.compact
    def __call__(self, x):
        B, T, d = x.shape
        E = self.n_experts
        f = self.mlp_factor * d
        S = B * T
        capacity = _round_up(
            max(int(self.capacity_factor * S / E), 1), 8)

        w_init = nn.initializers.lecun_normal()
        router = self.param("router", w_init, (d, E), x.dtype)
        w1 = self.param("experts_w1", w_init, (E, d, f), x.dtype)
        b1 = self.param("experts_b1", nn.initializers.zeros, (E, f),
                        x.dtype)
        w2 = self.param("experts_w2", w_init, (E, f, d), x.dtype)
        b2 = self.param("experts_b2", nn.initializers.zeros, (E, d),
                        x.dtype)

        tokens = x.reshape(S, d)
        # router in f32: softmax over expert logits is tiny compute but
        # decides routing, keep it out of bf16.
        logits = tokens.astype(jnp.float32) @ router.astype(jnp.float32)
        gates = jax.nn.softmax(logits, axis=-1)            # [S, E]
        gate = jnp.max(gates, axis=-1)                     # [S]
        sel = jax.nn.one_hot(jnp.argmax(gates, axis=-1), E,
                             dtype=jnp.float32)            # [S, E]

        # position of each token within its expert's queue (0-based)
        pos = jnp.cumsum(sel, axis=0) * sel - sel          # [S, E]
        keep = sel * (pos < capacity)                      # [S, E]
        # [S, E, C] one-hot dispatch tensor; zero row = dropped token
        slot = jnp.sum(pos * keep, axis=-1).astype(jnp.int32)  # [S]
        dispatch = keep[:, :, None] * jax.nn.one_hot(
            slot, capacity, dtype=jnp.float32)[:, None, :]
        dispatch = dispatch.astype(x.dtype)

        expert_in = jnp.einsum("sec,sd->ecd", dispatch, tokens)
        h = jax.nn.silu(
            jnp.einsum("ecd,edf->ecf", expert_in, w1) + b1[:, None])
        out = jnp.einsum("ecf,efd->ecd", h, w2) + b2[:, None]
        combine = dispatch * gate.astype(x.dtype)[:, None, None]
        y = jnp.einsum("sec,ecd->sd", combine, out)

        # Switch aux loss: fraction routed (pre-capacity) x mean gate
        frac = jnp.mean(sel, axis=0)
        prob = jnp.mean(gates, axis=0)
        self.sow("intermediates", "moe_aux_loss",
                 E * jnp.sum(frac * prob))
        self.sow("intermediates", "moe_dropped_fraction",
                 1.0 - jnp.sum(keep) / S)
        return y.reshape(B, T, d)


class MoEDiTBlock(nn.Module):
    """DiTBlock with the dense MLP replaced by a top-1 MoE FFN; the
    attention half and adaLN modulation are identical to DiTBlock
    (dit.py:69-102)."""
    nembed: int
    nheads: int
    mlp_factor: int = 4
    attn_backend: str = "xla"
    n_experts: int = 4
    capacity_factor: float = 2.0

    @nn.compact
    def __call__(self, x, c):
        mod = nn.Dense(6 * self.nembed)(nn.silu(c))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)

        h = nn.LayerNorm()(x)
        h = adaln_modulate(h, shift_msa, scale_msa)
        from diffsci_tpu.models.nets.attention import MultiHeadAttention
        h = MultiHeadAttention(num_heads=self.nheads, use_bias=True,
                               backend=self.attn_backend)(h)
        x = x + gate_msa[:, None] * h

        h = nn.LayerNorm()(x)
        h = adaln_modulate(h, shift_mlp, scale_mlp)
        h = MoEFeedForward(self.nembed, self.n_experts, self.mlp_factor,
                           self.capacity_factor, name="moe")(h)
        x = x + gate_mlp[:, None] * h
        return x


class MoEDiffusionTransformer(DiffusionTransformer):
    """DiT with every ``moe_every``-th block's MLP swapped for a top-1
    MoE FFN (interleaved dense/sparse, the GShard/Switch layout; with
    ``moe_every=1`` every block is sparse). Same net convention as DiT:
    ``model(x, t, y=None, train=False)``, x channels-last.

    Composes with dp (batch sharding), ep
    (parallel.expert_parallel.shard_state_expert_parallel) and tp;
    NOT with pipeline_apply — the block stack is heterogeneous, so the
    stacked-parameter pipeline schedule does not apply.
    """
    n_experts: int = 4
    capacity_factor: float = 2.0
    moe_every: int = 2

    def setup(self):
        # embed/head halves identical to DiffusionTransformer.setup
        # (dit.py:124-137, incl. the pinned submodule names); only the
        # block list changes, with MoE blocks interleaved.
        from diffsci_tpu.models.nets import layers
        self.time_proj = layers.GaussianFourierProjection(
            self.nembed, name="GaussianFourierProjection_0")
        self.time_mlp_in = nn.Dense(4 * self.nembed, name="Dense_0")
        self.time_mlp_mid = nn.Dense(4 * self.nembed, name="Dense_1")
        self.time_mlp_out = nn.Dense(self.nembed, name="Dense_2")
        self.token_embed = nn.Dense(self.nembed, name="Dense_3")
        self.token_head = nn.Dense(self.nchannels * self.patch_size ** 2,
                                   name="Dense_4")
        self.blocks = [
            (MoEDiTBlock(self.nembed, self.nheads, self.mlp_factor,
                         attn_backend=self.attn_backend,
                         n_experts=self.n_experts,
                         capacity_factor=self.capacity_factor,
                         name=f"moe_block_{i}")
             if i % self.moe_every == self.moe_every - 1 else
             DiTBlock(self.nembed, self.nheads, self.mlp_factor,
                      attn_backend=self.attn_backend, name=f"block_{i}"))
            for i in range(self.nblocks)]

    def export_description(self) -> dict[str, Any]:
        desc = super().export_description()
        desc["kind"] = "moe_dit"
        desc["config"].update(n_experts=self.n_experts,
                              capacity_factor=self.capacity_factor,
                              moe_every=self.moe_every)
        return desc


def moe_aux_loss(intermediates: dict, weight: float = 1e-2):
    """Aggregate sown MoE aux losses into one scalar penalty.

    Usage in a training loss: run ``net.apply(..., mutable=
    ['intermediates'])`` and add ``moe_aux_loss(inter)`` to the task
    loss. Returns 0 when the tree contains no MoE blocks. The penalty is
    ``weight * mean_blocks(aux - 1)``: zero at perfectly balanced
    routing, growing as routing collapses onto few experts.
    """
    leaves = [v for path, v in jax.tree_util.tree_flatten_with_path(
        intermediates)[0]
        if any(getattr(k, "key", None) == "moe_aux_loss" for k in path)]
    if not leaves:
        return jnp.zeros(())
    total = sum(jnp.sum(jnp.asarray(leaf)) for leaf in leaves)
    count = sum(jnp.asarray(leaf).size for leaf in leaves)
    return weight * (total / count - 1.0)
