"""DiT: patchify -> adaLN transformer blocks -> unpatchify.

TPU-native redesign of the reference DiffusionTransformer
(reference diffsci/models/nets/difftransformer.py:9-236). Channels-last
makes patchify a reshape/transpose pair. Two reference defects fixed and
documented:

- the reference instantiates DiTCore(nembed, nheads, mlp_factor, nblocks)
  against the signature (nembed, nheads, nblocks, mlp_factor)
  (difftransformer.py:186-198 vs 176-184), silently swapping the two; here
  the arguments are keyword-only,
- the 2D sinusoidal positional encoding is constructed but never added to
  the tokens (difftransformer.py:222,227-236); here it is applied after the
  patch embedding (standard DiT).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from diffsci_tpu.models.nets import layers


def patchify(x, patch_size: int):
    """[B, H, W, C] -> [B, (H/p)*(W/p), p*p*C] tokens."""
    B, H, W, C = x.shape
    p = patch_size
    x = x.reshape(B, H // p, p, W // p, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B, h, w, p1, p2, C
    return x.reshape(B, (H // p) * (W // p), p * p * C)


def unpatchify(x, patch_size: int, H: int, W: int, C: int):
    """Inverse of patchify."""
    B = x.shape[0]
    p = patch_size
    h, w = H // p, W // p
    x = x.reshape(B, h, w, p, p, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


def adaln_modulate(x, shift, scale):
    """(difftransformer.py:23-29)"""
    return x * (1 + scale[:, None]) + shift[:, None]


def positional_encoding_2d(h: int, w: int, dembed: int,
                           denominator: float = 10000.0) -> np.ndarray:
    """2D interleaved sin/cos positions (difftransformer.py:98-123)."""
    d1 = dembed // 2
    idx = np.arange(0, d1, 2)
    div = denominator ** (idx / d1)

    def encode(pos):
        s = np.sin(pos[:, None] / div)
        c = np.cos(pos[:, None] / div)
        return np.stack([s, c], axis=-1).reshape(pos.shape[0], -1)

    rows = np.repeat(np.arange(h, dtype=np.float32), w)
    cols = np.tile(np.arange(w, dtype=np.float32), h)
    return np.concatenate([encode(rows), encode(cols)], axis=-1)


class DiTBlock(nn.Module):
    """adaLN-zero-style block (difftransformer.py:139-172; the reference
    uses plain adaLN with learned gates from the same projection)."""
    nembed: int
    nheads: int
    mlp_factor: int = 4
    attn_backend: str = "xla"   # 'xla' | 'flash' (Pallas, large T)

    @nn.compact
    def __call__(self, x, c):
        mod = nn.Dense(6 * self.nembed)(nn.silu(c))
        (shift_msa, scale_msa, gate_msa,
         shift_mlp, scale_mlp, gate_mlp) = jnp.split(mod, 6, axis=-1)

        h = nn.LayerNorm()(x)
        h = adaln_modulate(h, shift_msa, scale_msa)
        # one parameterization for both backends, so attn_backend is a
        # pure compute toggle: a checkpoint trained with 'xla' samples
        # with 'flash' unchanged (same guarantee as ADM/PUNetG).
        # Checkpoints from before this module used flax's
        # MultiHeadDotProductAttention (different param tree); migrate
        # them once with extra.converters.migrate_dit_attention_params.
        from diffsci_tpu.models.nets.attention import MultiHeadAttention
        h = MultiHeadAttention(num_heads=self.nheads, use_bias=True,
                               backend=self.attn_backend)(h)
        x = x + gate_msa[:, None] * h

        h = nn.LayerNorm()(x)
        h = adaln_modulate(h, shift_mlp, scale_mlp)
        h = nn.Dense(self.mlp_factor * self.nembed)(h)
        h = nn.silu(h)
        h = nn.Dense(self.nembed)(h)
        x = x + gate_mlp[:, None] * h
        return x


class DiffusionTransformer(nn.Module):
    """(difftransformer.py:200-236). model(x, t, y=None, train=False) with
    x channels-last [B, H, W, C].

    Structured as ``embed`` -> block stack -> ``head`` so the block stack
    can be run under pipeline parallelism (parallel/pipeline.py): the two
    ends are exposed as flax methods over the same parameter tree, and the
    blocks all share one structure, so their parameters stack into a
    [nblocks, ...] pytree shardable over a 'stage' mesh axis. Submodule
    names are pinned to the pre-refactor auto-names, so existing
    checkpoints restore unchanged."""
    nembed: int = 64
    nheads: int = 4
    mlp_factor: int = 4
    nblocks: int = 6
    patch_size: int = 4
    nchannels: int = 1
    attn_backend: str = "xla"

    def setup(self):
        self.time_proj = layers.GaussianFourierProjection(
            self.nembed, name="GaussianFourierProjection_0")
        # residual time MLP (difftransformer.py:31-67)
        self.time_mlp_in = nn.Dense(4 * self.nembed, name="Dense_0")
        self.time_mlp_mid = nn.Dense(4 * self.nembed, name="Dense_1")
        self.time_mlp_out = nn.Dense(self.nembed, name="Dense_2")
        self.token_embed = nn.Dense(self.nembed, name="Dense_3")
        self.blocks = [
            DiTBlock(self.nembed, self.nheads, self.mlp_factor,
                     attn_backend=self.attn_backend, name=f"block_{i}")
            for i in range(self.nblocks)]
        self.token_head = nn.Dense(self.nchannels * self.patch_size ** 2,
                                   name="Dense_4")

    def embed(self, x, t=None, y=None):
        """Everything before the block stack: time embedding + patchify +
        token embedding + positional encoding. Returns (tokens, te)."""
        B, H, W, C = x.shape
        if C != self.nchannels:
            raise ValueError(
                f"input has {C} channels but nchannels={self.nchannels}")
        if t is None:
            t = jnp.zeros((B,), x.dtype)
        te = self.time_proj(t)
        h = nn.silu(self.time_mlp_in(te))
        h = nn.silu(self.time_mlp_mid(h))
        te = te + self.time_mlp_out(h)
        if y is not None:
            te = te + (y["y"] if isinstance(y, dict) else y)

        tokens = patchify(x, self.patch_size)
        tokens = self.token_embed(tokens)
        pos = positional_encoding_2d(H // self.patch_size,
                                     W // self.patch_size, self.nembed)
        tokens = tokens + jnp.asarray(pos, tokens.dtype)[None]
        return tokens, te

    def head(self, tokens, H: int, W: int):
        """Everything after the block stack: output projection +
        unpatchify back to [B, H, W, nchannels]."""
        tokens = self.token_head(tokens)
        return unpatchify(tokens, self.patch_size, H, W, self.nchannels)

    def __call__(self, x, t=None, y=None, train: bool = False):
        B, H, W, C = x.shape
        tokens, te = self.embed(x, t, y)
        for block in self.blocks:
            tokens = block(tokens, te)
        return self.head(tokens, H, W)

    def export_description(self) -> dict[str, Any]:
        return dict(kind="dit",
                    config=dict(nembed=self.nembed, nheads=self.nheads,
                                mlp_factor=self.mlp_factor,
                                nblocks=self.nblocks,
                                patch_size=self.patch_size,
                                nchannels=self.nchannels,
                                attn_backend=self.attn_backend))
