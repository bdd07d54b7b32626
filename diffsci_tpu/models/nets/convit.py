"""ConVit: conv-ViT hybrid — depthwise convs + learned-RoPE attention with
spatial compression + ConvSwiGLU FFN, with a gated fusion of the attention
and convolution pathways.

TPU-native redesign of the reference ConVit
(reference diffsci/models/nets/convit.py:15-735). Channels-last collapses
the reference's DimensionHelper + einops rearrange machinery
(convit.py:125-224,457-533) into plain reshapes; one implementation covers
1/2/3 positional dims.
"""

from __future__ import annotations

import dataclasses
import math
import pathlib
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from diffsci_tpu.models.nets.layers import (GaussianFourierProjection,
                                            BatchDropout)


@dataclasses.dataclass(frozen=True)
class ConVitConfig:
    """(convit.py:15-99)"""
    in_channels: int = 1
    embed_dim: int = 64
    num_pos_dims: int = 2
    out_channels: Optional[int] = None
    num_layers: int = 6
    num_heads: int = 8
    ffn_expansion_factor: int = 4
    attn_compression_factor: int = 2
    rope_freq: float = 1.0
    with_conv_on_upsample: bool = False
    with_conv_on_downsample: bool = False
    kernel_size_conv: int = 1
    kernel_size_in_out: int = 1
    kernel_size_depthwise: int = 3
    has_time_embedding: bool = False
    has_conditional_embedding: bool = False
    fourier_projection_scale: float = 30.0
    relative_positioning: bool = False
    linear_attention: bool = False
    input_batch_norm: bool = False
    condition_dropout: float = 0.1

    @property
    def has_embedding(self):
        return self.has_time_embedding or self.has_conditional_embedding

    def export_description(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_description(cls, description: dict):
        return cls(**description)

    @classmethod
    def from_config_file(cls, config_file: pathlib.Path | str):
        import yaml
        with open(config_file) as f:
            return cls.from_description(yaml.safe_load(f))


class ChannelRMSNorm(nn.Module):
    """RMS over the channel axis, per position (convit.py:226-244);
    channels-last: last axis."""
    channel_dim: int
    element_wise_affine: bool = True

    @nn.compact
    def __call__(self, x):
        eps = jnp.finfo(x.dtype).eps
        norm = jnp.sqrt(jnp.mean(x ** 2, axis=-1, keepdims=True) + eps)
        x = x / norm
        if self.element_wise_affine:
            w = self.param("weight", nn.initializers.ones,
                           (self.channel_dim,))
            x = x * w
        return x


class LearnedRoPE(nn.Module):
    """Learned rotary position embedding over N positional dims
    (convit.py:351-392). x: [B, *pos_dims, d] with d even."""
    embed_dim: int
    num_pos_dims: int = 1
    base_freq: float = 1.0
    relative_positioning: bool = False

    @nn.compact
    def __call__(self, x):
        half = self.embed_dim // 2
        angles_w = self.param(
            "angles", nn.initializers.normal(self.base_freq),
            (self.num_pos_dims, half))
        pos_dims = x.shape[1:-1]
        normalizers = (jnp.asarray(pos_dims, x.dtype)
                       if self.relative_positioning
                       else jnp.ones((len(pos_dims),), x.dtype))
        grids = jnp.meshgrid(*[jnp.arange(d, dtype=x.dtype) / n
                               for d, n in zip(pos_dims, normalizers)],
                             indexing="ij")
        positions = jnp.stack(grids, axis=-1)  # [*pos, P]
        angles = jnp.einsum("...p,ph->...h", positions, angles_w)
        xr = x.reshape(x.shape[:-1] + (half, 2))
        cos, sin = jnp.cos(angles), jnp.sin(angles)
        out = jnp.stack([xr[..., 0] * cos - xr[..., 1] * sin,
                         xr[..., 0] * sin + xr[..., 1] * cos], axis=-1)
        return out.reshape(x.shape)


class ConVitAttention(nn.Module):
    """Per-head projection tensors + RoPE + softmax or linear attention
    (convit.py:406-533). x: [B, *pos, d]."""
    embed_dim: int
    num_heads: int
    num_pos_dims: int = 1
    rope_freq: float = 1.0
    relative_positioning: bool = False
    linear_attention: bool = False

    @nn.compact
    def __call__(self, x):
        d = self.embed_dim
        h = self.num_heads
        dh = d // h
        bound = 6 / math.sqrt(d + dh)

        def init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        def proj(name):
            # stored param IS the effective weight (same (d, dh, h) layout
            # as the reference's *_proj_tensor, convit.py:426-437)
            return self.param(name, init, (d, dh, h))

        wq, wk, wv, wo = proj("q"), proj("k"), proj("v"), proj("o")
        scale = math.sqrt(dh)

        q = jnp.einsum("...d,dvh->...vh", x, wq)
        k = jnp.einsum("...d,dvh->...vh", x, wk)
        v = jnp.einsum("...d,dvh->...vh", x, wv)

        if self.linear_attention:
            fmap = lambda t: jax.nn.elu(t) + 1  # noqa: E731
            q = fmap(q) / scale
            k = fmap(k)
            spatial_axes = tuple(range(1, 1 + self.num_pos_dims))
            ksum = jnp.sum(k, axis=spatial_axes)  # [B, dk, h]
            # value_norm: [B, *pos, h] (computed pre-RoPE, convit.py:520-526)
            vnorm = jnp.einsum("b...kh,bkh->b...h", q, ksum) \
                + jnp.finfo(v.dtype).eps

        rope = LearnedRoPE(dh, self.num_pos_dims, self.rope_freq,
                           self.relative_positioning, name="rope")
        # apply rope per head: fold head into batch
        def apply_rope(t):
            # t: [B, *pos, dh, h] -> [B*h, *pos, dh]
            moved = jnp.moveaxis(t, -1, 1)  # [B, h, *pos, dh]
            flat = moved.reshape((-1,) + t.shape[1:-1])
            out = rope(flat)
            out = out.reshape(moved.shape)
            return jnp.moveaxis(out, 1, -1)

        q = apply_rope(q)
        k = apply_rope(k)

        if self.linear_attention:
            kv = jnp.einsum("b...kh,b...vh->bkvh", k, v)
            out = jnp.einsum("b...kh,bkvh->b...vh", q, kv)
            out = out / vnorm[..., None, :]
        else:
            B = x.shape[0]
            pos = x.shape[1:-1]
            T = math.prod(pos)
            qf = q.reshape(B, T, dh, h)
            kf = k.reshape(B, T, dh, h)
            vf = v.reshape(B, T, dh, h)
            logits = jnp.einsum("btdh,bsdh->bhts", qf, kf) / scale
            w = jax.nn.softmax(logits, axis=-1)
            out = jnp.einsum("bhts,bsdh->btdh", w, vf)
            out = out.reshape((B,) + pos + (dh, h))
        return jnp.einsum("...vh,dvh->...d", out, wo)


class ConvSwiGLU(nn.Module):
    """(convit.py:305-330)"""
    embed_dim: int
    expansion_factor: int = 4
    kernel_size: int = 1
    final_rms: bool = False

    @nn.compact
    def __call__(self, x):
        ndim = x.ndim - 2
        k = (self.kernel_size,) * ndim
        a = nn.Conv(self.embed_dim * self.expansion_factor, k,
                    padding="SAME")(x)
        g = nn.Conv(self.embed_dim * self.expansion_factor, k,
                    padding="SAME")(x)
        out = nn.Conv(self.embed_dim, k, padding="SAME")(nn.silu(a) * g)
        if self.final_rms:
            out = ChannelRMSNorm(self.embed_dim)(out)
        return out


class _SwiGLU(nn.Module):
    """Dense SwiGLU with optional final RMS (convit.py:332-349)."""
    embed_dim: int
    final_rms: bool = False

    @nn.compact
    def __call__(self, x):
        a = nn.Dense(self.embed_dim * 4)(x)
        g = nn.Dense(self.embed_dim * 4)(x)
        out = nn.Dense(self.embed_dim)(nn.silu(a) * g)
        if self.final_rms:
            # torch.nn.RMSNorm(eps=None) uses finfo(dtype).eps
            # (convit.py:342), not flax's 1e-6 default
            out = nn.RMSNorm(epsilon=float(jnp.finfo(jnp.float32).eps))(out)
        return out


class ConVitBlock(nn.Module):
    """(convit.py:536-637)"""
    config: ConVitConfig

    @nn.compact
    def __call__(self, x, emb=None, train: bool = False):
        cfg = self.config
        ndim = cfg.num_pos_dims
        d = cfg.embed_dim
        if emb is not None:
            if not cfg.has_embedding:
                raise ValueError(
                    "Conditional embedding is not supported when "
                    "has_embedding=False")
            emb = _SwiGLU(d, final_rms=True)(emb)
            emb = emb.reshape((emb.shape[0],) + (1,) * ndim + (d,))
        else:
            emb = 0.0

        x0 = x
        h = ChannelRMSNorm(d)(x) + emb
        # attention at compressed resolution (convit.py:611-616)
        f = cfg.attn_compression_factor
        if cfg.with_conv_on_downsample:
            h = nn.Conv(d, (2 * f,) * ndim, strides=(f,) * ndim,
                        padding="SAME")(h)
        else:
            h = nn.avg_pool(h, (f,) * ndim, strides=(f,) * ndim)
        h = ConVitAttention(d, cfg.num_heads, ndim, cfg.rope_freq,
                           cfg.relative_positioning,
                           cfg.linear_attention)(h)
        if cfg.with_conv_on_upsample:
            h = nn.ConvTranspose(d, (2 * f,) * ndim, strides=(f,) * ndim,
                                 padding="SAME")(h)
        else:
            # the reference's convless Upsample is (bi/tri)linear with
            # align_corners=False (convit.py:82-91) — half-pixel centers,
            # which jax.image.resize 'linear' matches exactly
            up_shape = (h.shape[0],) + tuple(s * f for s in h.shape[1:-1]) \
                + (h.shape[-1],)
            h = jax.image.resize(h, up_shape, method="linear")

        # depthwise + pointwise conv pathway (convit.py:586-596,618-622)
        hc = nn.Conv(d, (cfg.kernel_size_depthwise,) * ndim,
                     feature_group_count=d, padding="SAME")(h)
        hc = nn.Conv(d, (1,) * ndim)(nn.silu(hc))
        fusion = self.param("fusion_weight", nn.initializers.zeros, ())
        gate = nn.sigmoid(fusion)
        h = (1 - gate) * h + gate * hc

        x = h + x0
        x0 = x
        h = ChannelRMSNorm(d)(x) + emb
        h = ConvSwiGLU(d, cfg.ffn_expansion_factor, cfg.kernel_size_conv)(h)
        return h + x0


class ConVit(nn.Module):
    """(convit.py:639-735). model(x, t, y, train); channels-last."""
    config: ConVitConfig
    conditional_embedding: nn.Module | None = None

    @nn.compact
    def __call__(self, x, t=None, y=None, train: bool = False):
        cfg = self.config
        ndim = cfg.num_pos_dims
        assert x.ndim == ndim + 2
        out_ch = cfg.out_channels or cfg.in_channels

        te = (GaussianFourierProjection(cfg.embed_dim,
                                        cfg.fourier_projection_scale)(t)
              if (t is not None and cfg.has_time_embedding) else 0.0)
        ye = 0.0
        if y is not None and cfg.has_conditional_embedding:
            ye = self.conditional_embedding(y)
            if cfg.condition_dropout > 0.0:
                ye = BatchDropout(cfg.condition_dropout)(ye, train=train)
        emb = te + ye
        emb = emb if isinstance(emb, jnp.ndarray) else None

        if cfg.input_batch_norm:
            x = nn.BatchNorm(use_running_average=not train)(x)
        k = (cfg.kernel_size_in_out,) * ndim
        x = nn.Conv(cfg.embed_dim, k, padding="SAME", name="convin")(x)
        for i in range(cfg.num_layers):
            x = ConVitBlock(cfg, name=f"block_{i}")(x, emb, train=train)
        x = ChannelRMSNorm(cfg.embed_dim, name="normout")(x)
        return nn.Conv(out_ch, k, padding="SAME", name="convout")(x)

    def export_description(self) -> dict[str, Any]:
        cemb = getattr(self.conditional_embedding, "export_description", None)
        return dict(kind="convit",
                    config=self.config.export_description(),
                    conditional_embedding_args=cemb() if cemb else None,
                    has_conditional_embedding=(
                        self.conditional_embedding is not None))
