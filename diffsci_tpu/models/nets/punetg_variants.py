"""PUNetG variants: standalone encoder/decoder halves, the deterministic
(regression) UNet, and the temporal slice-embedding UNet (PUNetV).

TPU-native redesign of the reference variants
(reference diffsci/models/nets/punetg_encdec.py:11-392,
punetg_deterministic.py:10-683, punetv.py:13-897). Channels-last,
dimension-agnostic, reusing the shared layer library.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from diffsci_tpu.models.nets import layers
from diffsci_tpu.models.nets.attention import SpatialSelfAttention
from diffsci_tpu.models.nets.punetg import PUNetG, PUNetGConfig


class EncoderFlattener(nn.Module):
    """Global-mean-pool + linear head (punetg_encdec.py:379-392)."""
    output_channels: int

    @nn.compact
    def __call__(self, x):
        pooled = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))
        return nn.Dense(self.output_channels)(pooled)


class _PUNetGParts(nn.Module):
    """Shared builders for the encoder/decoder halves."""
    config: PUNetGConfig

    def _resnet(self, mult, name, use_time):
        cfg = self.config
        return layers.ResnetBlockC(
            channels=mult * cfg.model_channels,
            time_embed_dim=cfg.model_channels if use_time else None,
            kernel_size=cfg.kernel_size,
            dropout=cfg.dropout,
            first_norm=cfg.first_resblock_norm,
            second_norm=cfg.second_resblock_norm,
            affine_norm=cfg.affine_norm,
            convolution_type=cfg.convolution_type,
            use_bias=cfg.bias,
            name=name)

    def _attn(self, name):
        cfg = self.config
        return SpatialSelfAttention(
            num_heads=cfg.num_heads, attn_type=cfg.attn_type,
            attn_residual=cfg.attn_residual,
            magnitude_preserving=cfg.magnitude_preserving, name=name)


class PUNetGEncoder(_PUNetGParts):
    """Down path + attention bottleneck, optionally projected to a flat
    embedding (punetg_encdec.py:11-240)."""
    use_time_embedding: bool = False
    output_channels: Optional[int] = None

    @nn.compact
    def __call__(self, x, t=None, train: bool = False,
                 return_intermediate_outputs: bool = False):
        cfg = self.config
        if not cfg.bias:
            ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
            x = jnp.concatenate([x, ones], axis=-1)
        x = layers.conv_layer(cfg.convolution_type, cfg.model_channels,
                              cfg.in_out_kernel_size, cfg.bias,
                              name="convin")(cfg.dimension)(x)
        use_time = self.use_time_embedding and t is not None
        te = (layers.GaussianFourierProjection(
            cfg.model_channels, cfg.time_projection_scale,
            name="time_projection")(t) if use_time else None)

        ext = cfg.extended_channel_expansion
        skips = []
        for i, in_mult in enumerate(ext[:-1]):
            for j in range(cfg.number_resnet_downward_block):
                x = self._resnet(in_mult, f"down_{i}_res_{j}", use_time)(
                    x, te, train)
            skips.append(x)
            x = layers.DownSampler(
                ext[i + 1] * cfg.model_channels,
                scale_factor=cfg.transition_scale_factor,
                kernel_size=cfg.transition_kernel_size,
                use_bias=cfg.bias,
                convolution_type=cfg.convolution_type,
                name=f"downsampler_{i}")(x)

        bot = ext[-1]
        for j in range(cfg.number_resnet_before_attn_block):
            x = self._resnet(bot, f"before_res_{j}", use_time)(x, te, train)
        for j in range(cfg.number_resnet_attn_block):
            x = self._resnet(bot, f"attn_res_{j}", use_time)(x, te, train)
            if j < cfg.number_resnet_attn_block - 1:
                x = self._attn(f"attn_{j}")(x)
        for j in range(cfg.number_resnet_after_attn_block):
            x = self._resnet(bot, f"after_res_{j}", use_time)(x, te, train)

        if self.output_channels is not None:
            x = EncoderFlattener(self.output_channels,
                                 name="projection")(x)
        if return_intermediate_outputs:
            return x, skips
        return x


class PUNetGDecoder(_PUNetGParts):
    """Up path with optional additive skips (punetg_encdec.py:242-377)."""
    use_time_embedding: bool = False

    @nn.compact
    def __call__(self, x, t=None, intermediate_outputs=None,
                 train: bool = False):
        cfg = self.config
        use_time = self.use_time_embedding and t is not None
        te = (layers.GaussianFourierProjection(
            cfg.model_channels, cfg.time_projection_scale,
            name="time_projection")(t) if use_time else None)
        skips = list(intermediate_outputs) if intermediate_outputs else None
        rev = list(reversed(cfg.extended_channel_expansion))
        for i in range(len(rev) - 1):
            out_mult = rev[i + 1]
            x = layers.UpSampler(
                out_mult * cfg.model_channels,
                scale_factor=cfg.transition_scale_factor,
                kernel_size=cfg.transition_kernel_size,
                use_bias=cfg.bias,
                convolution_type=cfg.convolution_type,
                name=f"upsampler_{i}")(x)
            if skips:
                x = x + skips.pop()
            for j in range(cfg.number_resnet_upward_block):
                x = self._resnet(out_mult, f"up_{i}_res_{j}", use_time)(
                    x, te, train)
        return layers.conv_layer(cfg.convolution_type, cfg.output_channels,
                                 cfg.in_out_kernel_size, cfg.bias,
                                 name="convout")(cfg.dimension)(x)


class PUNetGDeterministic(nn.Module):
    """No-time-embedding UNet for direct regression prediction (ocean
    forecasting baselines; punetg_deterministic.py:10-683). Same topology
    as PUNetG with the time path disabled."""
    config: PUNetGConfig
    conditional_embedding: nn.Module | None = None

    @nn.compact
    def __call__(self, x, t=None, y=None, train: bool = False):
        return PUNetG(self.config, self.conditional_embedding,
                      name="unet")(x, None, y, train=train)

    def export_description(self) -> dict[str, Any]:
        return dict(config=self.config.export_description(),
                    deterministic=True)


# ---------------------------------------------------------------------------
# PUNetV: temporal slice embeddings
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class PUNetVConfig(PUNetGConfig):
    """(punetv.py:166-281): PUNetGConfig + slice embedding channels."""
    slice_embed_channels: Optional[int] = None


class ResnetSliceBlock(nn.Module):
    """Temporal slices -> spatially-aware embedding (punetv.py:13-164):
    resize each slice to the feature-map resolution, conv stack per slice,
    masked temporal mean. slice_embeddings: [B, T, *spatial, C]."""
    input_channels: int
    output_channels: int

    @nn.compact
    def __call__(self, slice_embeddings, temporal_mask=None,
                 target_spatial_size=None):
        B, T = slice_embeddings.shape[:2]
        C = slice_embeddings.shape[-1]
        spatial = slice_embeddings.shape[2:-1]
        assert C == self.input_channels
        x = slice_embeddings.reshape((B * T,) + spatial + (C,))
        if target_spatial_size is not None and \
                tuple(target_spatial_size) != tuple(spatial):
            x = jax.image.resize(
                x, (B * T,) + tuple(target_spatial_size) + (C,),
                method="linear")
            spatial = tuple(target_spatial_size)
        ndim = len(spatial)
        if temporal_mask is not None:
            m = temporal_mask.reshape((B * T,) + (1,) * (ndim + 1))
            x = x * m.astype(x.dtype)

        inter = 4 * self.input_channels

        def gnorm(v):
            g = min(32, v.shape[-1])
            while v.shape[-1] % g != 0:
                g -= 1
            return nn.GroupNorm(num_groups=g)(v)

        h = nn.Conv(inter, (3,) * ndim, padding="SAME")(nn.silu(gnorm(x)))
        h = nn.Conv(inter, (3,) * ndim, padding="SAME")(nn.silu(gnorm(h)))
        h = nn.Conv(self.output_channels, (3,) * ndim,
                    padding="SAME")(gnorm(h))
        h = h.reshape((B, T) + spatial + (self.output_channels,))
        if temporal_mask is not None:
            m = temporal_mask.reshape((B, T) + (1,) * (ndim + 1))
            num = jnp.sum(h * m.astype(h.dtype), axis=1)
            den = jnp.clip(jnp.sum(m.astype(h.dtype), axis=1), 1.0)
            return num / den
        return jnp.mean(h, axis=1)


class SliceResnetBlockC(nn.Module):
    """ResnetBlockC with an extra slice-embedding bias added after the
    time bias (punetv.py:794-849)."""
    channels: int
    time_embed_dim: int
    slice_embed_channels: Optional[int]
    kernel_size: int = 3
    dropout: float = 0.0
    first_norm: str = "GroupLN"
    second_norm: str = "GroupRMS"
    affine_norm: bool = True
    convolution_type: str = "default"
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, te, slice_embeddings=None, temporal_mask=None,
                 train: bool = False):
        ndim = x.ndim - 2
        ch = self.channels
        h = layers.make_norm(self.first_norm, ch, ch,
                             self.affine_norm)(x)
        h = nn.silu(h)
        h = layers.conv_layer(self.convolution_type, ch, self.kernel_size,
                              self.use_bias)(ndim)(h)
        yt = layers.ResnetTimeBlock(self.time_embed_dim, ch)(te, ndim)
        h = h + yt
        if slice_embeddings is not None and \
                self.slice_embed_channels is not None:
            ys = ResnetSliceBlock(self.slice_embed_channels, ch,
                                  name="slice_embedding")(
                slice_embeddings, temporal_mask, x.shape[1:-1])
            h = h + ys
        h = layers.make_norm(self.second_norm, ch, ch,
                             self.affine_norm)(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = layers.conv_layer(self.convolution_type, ch, self.kernel_size,
                              self.use_bias)(ndim)(h)
        # no skip: the reference passes output_channels explicitly
        # (punetv.py:536), which disables ResnetBlockC's residual
        # connection (commonlayers.py:752-756)
        return h


class PUNetV(nn.Module):
    """Temporal UNet (punetv.py:281-792): PUNetG whose resnet blocks also
    receive temporal slice embeddings from y['yb'] (with y['temporal_mask'])
    that are projected and added to feature maps at every level."""
    config: PUNetVConfig
    conditional_embedding: nn.Module | None = None

    def _block(self, mult, name):
        cfg = self.config
        return SliceResnetBlockC(
            channels=mult * cfg.model_channels,
            time_embed_dim=cfg.model_channels,
            slice_embed_channels=cfg.slice_embed_channels,
            kernel_size=cfg.kernel_size,
            dropout=cfg.dropout,
            first_norm=cfg.first_resblock_norm,
            second_norm=cfg.second_resblock_norm,
            affine_norm=cfg.affine_norm,
            convolution_type=cfg.convolution_type,
            use_bias=cfg.bias,
            name=name)

    @nn.compact
    def __call__(self, x, t=None, y=None, train: bool = False):
        cfg = self.config
        if not cfg.bias:
            ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
            x = jnp.concatenate([x, ones], axis=-1)
        x = layers.conv_layer(cfg.convolution_type, cfg.model_channels,
                              cfg.in_out_kernel_size, cfg.bias,
                              name="convin")(cfg.dimension)(x)
        if t is None:
            te = jnp.zeros((x.shape[0], cfg.model_channels), x.dtype)
        else:
            te = layers.GaussianFourierProjection(
                cfg.model_channels, cfg.time_projection_scale,
                name="time_projection")(t)

        yb = temporal_mask = None
        if y is not None:
            y = dict(y)
            yb = y.pop("yb", None)
            temporal_mask = y.pop("temporal_mask", None)
            y = y if y else None
        if y is not None:
            ye = (self.conditional_embedding(y)
                  if self.conditional_embedding is not None else y)
            ye = nn.Dropout(cfg.cond_dropout,
                            deterministic=not train)(ye)
            te = te + ye

        ext = cfg.extended_channel_expansion
        skips = []
        for i, in_mult in enumerate(ext[:-1]):
            for j in range(cfg.number_resnet_downward_block):
                x = self._block(in_mult, f"down_{i}_res_{j}")(
                    x, te, yb, temporal_mask, train)
            skips.append(x)
            x = layers.DownSampler(
                ext[i + 1] * cfg.model_channels,
                scale_factor=cfg.transition_scale_factor,
                kernel_size=cfg.transition_kernel_size,
                use_bias=cfg.bias,
                convolution_type=cfg.convolution_type,
                name=f"downsampler_{i}")(x)

        bot = ext[-1]
        for j in range(cfg.number_resnet_before_attn_block):
            x = self._block(bot, f"before_res_{j}")(
                x, te, yb, temporal_mask, train)
        xa = x
        for j in range(cfg.number_resnet_attn_block):
            xa = self._block(bot, f"attn_res_{j}")(
                xa, te, yb, temporal_mask, train)
            if j < cfg.number_resnet_attn_block - 1:
                xa = SpatialSelfAttention(
                    num_heads=cfg.num_heads, attn_type=cfg.attn_type,
                    attn_residual=cfg.attn_residual,
                    name=f"attn_{j}")(xa)
        x = x + xa
        for j in range(cfg.number_resnet_after_attn_block):
            x = self._block(bot, f"after_res_{j}")(
                x, te, yb, temporal_mask, train)

        rev = list(reversed(ext))
        for i in range(len(rev) - 1):
            out_mult = rev[i + 1]
            x = layers.UpSampler(
                out_mult * cfg.model_channels,
                scale_factor=cfg.transition_scale_factor,
                kernel_size=cfg.transition_kernel_size,
                use_bias=cfg.bias,
                convolution_type=cfg.convolution_type,
                name=f"upsampler_{i}")(x)
            x = x + skips.pop()
            for j in range(cfg.number_resnet_upward_block):
                x = self._block(out_mult, f"up_{i}_res_{j}")(
                    x, te, yb, temporal_mask, train)

        return layers.conv_layer(cfg.convolution_type, cfg.output_channels,
                                 cfg.in_out_kernel_size, cfg.bias,
                                 name="convout")(cfg.dimension)(x)

    def export_description(self) -> dict[str, Any]:
        return dict(config=self.config.export_description())
