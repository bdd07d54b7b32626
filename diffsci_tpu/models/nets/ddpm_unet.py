"""Native DDPM UNet: the architecture behind ``diffusers.UNet2DModel``.

The reference's HFNet family (reference diffsci/models/nets/hfnet.py:9-100)
wraps HuggingFace ``diffusers.UNet2DModel`` — the classic DDPM UNet (Ho et
al. 2020) with ``ResnetBlock2D`` towers, optional self-attention inside the
down/up resampling blocks, and conv down/upsampling. ``diffusers`` is not
vendored in this image, so this module implements the same published
architecture natively (channels-last, dimension-agnostic, jit/scan-friendly)
and ``extra/converters.import_diffusers_unet2d`` imports a real
``UNet2DModel.state_dict()`` into it.

Semantics mirrored from the public diffusers source (v0.2x,
models/unet_2d.py + models/unet_2d_blocks.py + models/resnet.py +
models/attention_processor.py), restricted to the surface HFNet uses:

- ``block_out_channels`` pyramid, ``layers_per_block=2``
- down blocks: ``DownBlock2D`` / ``AttnDownBlock2D`` (conv downsample,
  stride 2, 3x3, padding 1, on all but the last block)
- mid block: ``UNetMidBlock2D`` = resnet / attention / resnet
- up blocks: ``UpBlock2D`` / ``AttnUpBlock2D`` (``layers_per_block + 1``
  resnets, skip concat before each, nearest-2x + 3x3 conv upsample on all
  but the last block)
- resnet: GN - silu - conv3 - (+ time bias) - GN - silu - dropout - conv3,
  1x1 conv shortcut when channels change, ``norm_eps=1e-5``
- attention: GN, per-token linear q/k/v (bias), ``heads = C //
  attention_head_dim`` (``attention_head_dim=8``), float32 softmax
  (diffusers ``upcast_softmax=True`` for these deprecated-attn blocks),
  linear out, residual add
- timesteps: ``get_timestep_embedding`` with ``flip_sin_to_cos=True``,
  ``freq_shift=0`` (the UNet2DModel defaults), then the
  linear - silu - linear ``TimestepEmbedding`` to ``4 * block0`` features.

Deviations (documented, TPU-first):
- channels-last layout end-to-end (layout only; numerics identical),
- dimension-agnostic: the spatial rank is inferred from the input, so the
  same module runs 1D/2D/3D (diffusers is 2D-only),
- an ``attn_backend`` knob can route the attention through the Pallas
  flash kernel for large token counts.

Behavioral parity with ``diffusers`` itself cannot be executed in this
zero-egress image; the importer + numerics are instead pinned against a
torch implementation of the same published spec
(tests/test_ddpm_unet.py), which exercises every layout convention the
transfer crosses (conv/linear transposes, GN axes, head reshape order,
skip-concat order).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


def timestep_embedding(timesteps: jnp.ndarray, dim: int,
                       flip_sin_to_cos: bool = True,
                       freq_shift: float = 0.0,
                       max_period: float = 10000.0) -> jnp.ndarray:
    """diffusers ``get_timestep_embedding`` (models/embeddings.py).

    [sin | cos] halves over a log-spaced frequency ladder; the UNet2DModel
    defaults swap to [cos | sin] (``flip_sin_to_cos=True``) with
    ``downscale_freq_shift=0``.
    """
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(
        half, dtype=jnp.float32) / (half - freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class ResnetBlock(nn.Module):
    """diffusers ``ResnetBlock2D`` (models/resnet.py), time-bias variant
    (``resnet_time_scale_shift='default'``)."""
    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, temb, train: bool = False):
        sd = x.ndim - 2  # spatial rank
        in_channels = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3,) * sd, padding=1,
                    name="conv1")(h)
        t = nn.Dense(self.out_channels, name="time_emb_proj")(nn.silu(temb))
        h = h + t.reshape(t.shape[:1] + (1,) * sd + t.shape[1:])
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout)(h, deterministic=not train)
        h = nn.Conv(self.out_channels, (3,) * sd, padding=1,
                    name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1,) * sd, name="conv_shortcut")(x)
        return x + h


class AttentionBlock(nn.Module):
    """diffusers ``Attention`` as instantiated inside Attn{Down,Up}Block2D /
    UNetMidBlock2D (``residual_connection=True``, GN pre-norm, linear
    q/k/v/out with bias, ``heads = C // head_dim``, float32 softmax)."""
    head_dim: int = 8
    groups: int = 32
    eps: float = 1e-5
    backend: str = "xla"  # 'xla' | 'flash'

    @nn.compact
    def __call__(self, x):
        B, C = x.shape[0], x.shape[-1]
        heads = max(C // self.head_dim, 1)
        dh = self.head_dim  # inner dim is heads * head_dim, not C
        residual = x
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         name="group_norm")(x)
        tokens = h.reshape(B, -1, C)
        q = nn.Dense(heads * dh, name="to_q")(tokens)
        k = nn.Dense(heads * dh, name="to_k")(tokens)
        v = nn.Dense(heads * dh, name="to_v")(tokens)

        def to_heads(a):  # [B, T, H*dh] -> [B, H, T, dh]
            return a.reshape(B, -1, heads, dh).transpose(0, 2, 1, 3)

        q, k, v = to_heads(q), to_heads(k), to_heads(v)
        if self.backend == "flash":
            from diffsci_tpu.kernels import flash_attention
            o = flash_attention.flash_attention(q, k, v)
        else:
            logits = jnp.einsum("bhtd,bhsd->bhts", q, k) / math.sqrt(dh)
            weights = nn.softmax(logits.astype(jnp.float32), axis=-1)
            o = jnp.einsum("bhts,bhsd->bhtd",
                           weights.astype(v.dtype), v)
        o = o.transpose(0, 2, 1, 3).reshape(B, -1, heads * dh)
        o = nn.Dense(C, name="to_out")(o)
        return o.reshape(residual.shape) + residual


class DownBlock(nn.Module):
    """``DownBlock2D`` / ``AttnDownBlock2D``: ``num_layers`` resnets (each
    output is a skip), then an optional stride-2 conv downsample (also a
    skip)."""
    out_channels: int
    num_layers: int = 2
    add_attention: bool = False
    add_downsample: bool = True
    groups: int = 32
    head_dim: int = 8
    eps: float = 1e-5
    dropout: float = 0.0
    backend: str = "xla"

    @nn.compact
    def __call__(self, x, temb, train: bool = False):
        sd = x.ndim - 2
        skips = []
        for j in range(self.num_layers):
            x = ResnetBlock(self.out_channels, groups=self.groups,
                            eps=self.eps, dropout=self.dropout,
                            name=f"resnets_{j}")(x, temb, train=train)
            if self.add_attention:
                x = AttentionBlock(head_dim=self.head_dim,
                                   groups=self.groups, eps=self.eps,
                                   backend=self.backend,
                                   name=f"attentions_{j}")(x)
            skips.append(x)
        if self.add_downsample:
            x = nn.Conv(self.out_channels, (3,) * sd, strides=2, padding=1,
                        name="downsample")(x)
            skips.append(x)
        return x, skips


class UpBlock(nn.Module):
    """``UpBlock2D`` / ``AttnUpBlock2D``: ``num_layers`` resnets, each
    preceded by concatenating the matching down-path skip (latest first),
    then an optional nearest-2x + conv upsample."""
    out_channels: int
    num_layers: int = 3
    add_attention: bool = False
    add_upsample: bool = True
    groups: int = 32
    head_dim: int = 8
    eps: float = 1e-5
    dropout: float = 0.0
    backend: str = "xla"

    @nn.compact
    def __call__(self, x, skips, temb, train: bool = False):
        sd = x.ndim - 2
        skips = list(skips)
        for j in range(self.num_layers):
            res = skips.pop()
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlock(self.out_channels, groups=self.groups,
                            eps=self.eps, dropout=self.dropout,
                            name=f"resnets_{j}")(x, temb, train=train)
            if self.add_attention:
                x = AttentionBlock(head_dim=self.head_dim,
                                   groups=self.groups, eps=self.eps,
                                   backend=self.backend,
                                   name=f"attentions_{j}")(x)
        if self.add_upsample:
            for axis in range(1, 1 + sd):  # nearest-neighbor 2x
                x = jnp.repeat(x, 2, axis=axis)
            x = nn.Conv(self.out_channels, (3,) * sd, padding=1,
                        name="upsample")(x)
        return x


class UNet2D(nn.Module):
    """``diffusers.UNet2DModel`` equivalent (for the HFNet-used surface).

    ``attn_down`` / ``attn_up`` are per-block attention flags, i.e.
    ``down_block_types = ['AttnDownBlock2D' if a else 'DownBlock2D' ...]``.
    The input is channels-last ``[B, *spatial, in_channels]``; every spatial
    dim must be divisible by ``2 ** (len(block_out_channels) - 1)`` (the
    same constraint torch's skip-concat imposes).
    """
    block_out_channels: Sequence[int] = (64, 128, 256)
    in_channels: int = 1
    out_channels: int = 1
    attn_down: Sequence[bool] = ()
    attn_up: Sequence[bool] = ()
    layers_per_block: int = 2
    norm_num_groups: int = 32
    head_dim: int = 8  # diffusers attention_head_dim default
    norm_eps: float = 1e-5
    dropout: float = 0.0
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    backend: str = "xla"

    @nn.compact
    def __call__(self, x, t, train: bool = False):
        blocks = tuple(self.block_out_channels)
        n = len(blocks)
        attn_down = tuple(self.attn_down) or (False,) * n
        attn_up = tuple(self.attn_up) or (False,) * n
        if len(attn_down) != n or len(attn_up) != n:
            raise ValueError("attn_down/attn_up must have one flag per "
                             f"block ({n}), got {attn_down}/{attn_up}")
        sd = x.ndim - 2
        t = jnp.asarray(t)
        if t.ndim == 0:
            t = jnp.full((x.shape[0],), t)

        temb = timestep_embedding(t, blocks[0],
                                  flip_sin_to_cos=self.flip_sin_to_cos,
                                  freq_shift=self.freq_shift)
        temb = nn.Dense(blocks[0] * 4, name="time_linear_1")(temb)
        temb = nn.Dense(blocks[0] * 4, name="time_linear_2")(nn.silu(temb))

        h = nn.Conv(blocks[0], (3,) * sd, padding=1, name="conv_in")(x)
        skips = [h]
        for i, ch in enumerate(blocks):
            h, s = DownBlock(ch, num_layers=self.layers_per_block,
                             add_attention=attn_down[i],
                             add_downsample=i < n - 1,
                             groups=self.norm_num_groups,
                             head_dim=self.head_dim, eps=self.norm_eps,
                             dropout=self.dropout, backend=self.backend,
                             name=f"down_blocks_{i}")(h, temb, train=train)
            skips.extend(s)

        h = ResnetBlock(blocks[-1], groups=self.norm_num_groups,
                        eps=self.norm_eps, dropout=self.dropout,
                        name="mid_resnet_1")(h, temb, train=train)
        h = AttentionBlock(head_dim=self.head_dim,
                           groups=self.norm_num_groups, eps=self.norm_eps,
                           backend=self.backend, name="mid_attn")(h)
        h = ResnetBlock(blocks[-1], groups=self.norm_num_groups,
                        eps=self.norm_eps, dropout=self.dropout,
                        name="mid_resnet_2")(h, temb, train=train)

        per_up = self.layers_per_block + 1
        rev = blocks[::-1]
        for i, ch in enumerate(rev):
            take, skips = skips[-per_up:], skips[:-per_up]
            h = UpBlock(ch, num_layers=per_up,
                        add_attention=attn_up[i],
                        add_upsample=i < n - 1,
                        groups=self.norm_num_groups,
                        head_dim=self.head_dim, eps=self.norm_eps,
                        dropout=self.dropout, backend=self.backend,
                        name=f"up_blocks_{i}")(h, take, temb, train=train)
        assert not skips

        h = nn.GroupNorm(num_groups=self.norm_num_groups,
                         epsilon=self.norm_eps, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3,) * sd, padding=1,
                       name="conv_out")(h)

    def export_description(self):
        from diffsci_tpu.models.nets.describe import plain_module_description
        return plain_module_description(self, "unet2d")
