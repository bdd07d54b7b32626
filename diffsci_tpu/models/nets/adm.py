"""ADM: Dhariwal/Nichol-style UNet with FiLM time conditioning.

TPU-native redesign of the reference ADM (reference
diffsci/models/nets/adm.py:8-1060). The reference's deep class tower
(BaseBlock -> Encoder/DecoderBlock -> Encoder/DecoderLayer ->
Encoder/Decoder -> ADM) is flattened to one configurable block plus the
top-level module composing the layer loops inline; channels-last and
dimension-agnostic (2D/3D via config.dimension).

Structural semantics preserved exactly:
- block: [skip concat/add] -> norm1 -> SiLU -> [pool/upsample] -> conv1 ->
  norm2, FiLM modulation x*(te1) + te2 from Linear(embed, 2*out)
  (adm.py:292-316), SiLU -> dropout -> conv2, + 1x1-conv residual on the
  (resampled) input, optional global attention
- encoder layer: nblocks keep-width blocks, last block widens + avg-pools;
  the *post-downsample* output is the skip (adm.py:595-600)
- decoder type 1: skip joined once at layer entry (adm.py:764-775);
  type 2: skip joined inside every block (adm.py:847-851)
- time embedding: SiLU(MLP(fourier(t)) + ye) (adm.py:1024-1060)
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from diffsci_tpu.models.nets import layers
from diffsci_tpu.models.nets.attention import SpatialSelfAttention
from diffsci_tpu.utils import tensor as tensor_utils


@dataclasses.dataclass(frozen=True)
class ADMConfig:
    """(adm.py:8-116)"""
    input_channels: int = 1
    output_channels: int = 1
    dimension: int = 2
    model_channels: int = 64
    time_embed_dim: int = 64
    output_embed_dim: int = 256
    channel_expansion: Sequence[int] = (2, 4)
    number_resnet_downward_block: int = 2
    number_resnet_upward_block: int = 2
    number_resnet_attn_block: int = 2
    number_resnet_before_attn_block: int = 2
    number_resnet_after_attn_block: int = 2
    kernel_size: int = 3
    time_projection_scale: float = 30.0
    transition_scale_factor: int = 2
    transition_kernel_size: int = 3
    dropout: float = 0.0
    cond_dropout: float = 0.0
    first_resblock_norm: str = "GroupLN"
    second_resblock_norm: str = "GroupRMS"
    affine_norm: bool = True
    convolution_type: str = "default"
    num_groups: int = 1
    skip_integration_type: str = "concat"
    attn_residual: bool = True
    attn_heads: int = 1
    attn_type: str = "default"
    attn_backend: str = "xla"   # 'xla' | 'flash' (Pallas, large T)
    # fold s^d spatial tiles into channels at input/output — the TPU
    # lane-utilization lever for C<128 volumes (see PUNetGConfig)
    space_to_depth: int = 1
    decoder_type: int = 1

    def __post_init__(self):
        object.__setattr__(self, "channel_expansion",
                           tuple(self.channel_expansion))

    @property
    def middle_channel(self):
        return self.model_channels * self.channel_expansion[-1]

    @property
    def extended_channel_expansion(self):
        return [1] + list(self.channel_expansion)

    @property
    def middle_block_attn_config(self):
        """(adm.py:72-77)"""
        return ([False] * self.number_resnet_before_attn_block
                + [True] * (self.number_resnet_attn_block - 1) + [False]
                + [False] * self.number_resnet_after_attn_block)

    @property
    def num_blocks_middle_block(self):
        return (self.number_resnet_before_attn_block
                + self.number_resnet_attn_block
                + self.number_resnet_after_attn_block)

    def export_description(self) -> dict[str, Any]:
        d = dataclasses.asdict(self)
        d["channel_expansion"] = list(self.channel_expansion)
        return d

    @classmethod
    def from_description(cls, description: dict):
        return cls(**description)


class ADMBlock(nn.Module):
    """The unified ADM residual block (adm.py:219-443)."""
    channels_out: int
    has_skip: bool = False
    resample: str | None = None      # None | 'downsample' | 'upsample'
    resample_type: str = "avg"       # pool kind or 'nearest'
    resample_factor: int = 2
    has_residual: bool = False
    has_attn: bool = False
    first_norm: str = "GroupLN"
    second_norm: str = "GroupRMS"
    affine_norm: bool = True
    conv_type: str = "default"
    num_groups: int = 1
    pdrop: float = 0.0
    attn_type: str = "default"
    attn_heads: int = 1
    attn_residual: bool = True
    attn_backend: str = "xla"
    skip_integration_type: str = "concat"

    def _resample(self, x):
        if self.resample == "downsample":
            ndim = x.ndim - 2
            window = (self.resample_factor,) * ndim
            if self.resample_type == "avg":
                return nn.avg_pool(x, window, strides=window)
            return nn.max_pool(x, window, strides=window)
        if self.resample == "upsample":
            return layers.nearest_upsample(x, self.resample_factor)
        return x

    @nn.compact
    def __call__(self, x, te, skip=None, train: bool = False):
        ndim = x.ndim - 2
        if skip is not None and self.has_skip:
            if self.skip_integration_type == "concat":
                x = jnp.concatenate([x, skip], axis=-1)
            elif self.skip_integration_type == "add":
                x = x + skip
            else:
                raise ValueError(
                    f"Invalid skip integration type "
                    f"{self.skip_integration_type}")
        cin = x.shape[-1]

        # first block: norm -> act -> resample -> conv -> norm
        h = layers.make_norm(self.first_norm, self.num_groups, cin,
                             self.affine_norm)(x)
        h = nn.silu(h)
        h = self._resample(h)
        h = layers.conv_layer(self.conv_type, self.channels_out, 3)(ndim)(h)
        h = layers.make_norm(self.second_norm, self.num_groups,
                             self.channels_out, self.affine_norm)(h)

        # FiLM from the embedding (adm.py:292-316)
        te_lin = nn.Dense(2 * self.channels_out)(te)
        te1, te2 = jnp.split(te_lin, 2, axis=-1)
        bshape = (te1.shape[0],) + (1,) * ndim + (self.channels_out,)
        h = h * te1.reshape(bshape) + te2.reshape(bshape)

        # second block
        h = nn.silu(h)
        h = nn.Dropout(self.pdrop, deterministic=not train)(h)
        h = layers.conv_layer(self.conv_type, self.channels_out, 3)(ndim)(h)

        if self.has_residual:
            xr = self._resample(x)
            xr = layers.conv_layer(self.conv_type, self.channels_out,
                                   1)(ndim)(xr)
            h = h + xr
        if self.has_attn:
            h = SpatialSelfAttention(num_heads=self.attn_heads,
                                     attn_type=self.attn_type,
                                     attn_residual=self.attn_residual,
                                     backend=self.attn_backend)(h)
        return h


class ADMTimeEmbedding(nn.Module):
    """SiLU(MLP(fourier(t)) + ye) (adm.py:1024-1060)."""
    embed_dim: int
    output_dim: int
    projection_scale: float = 30.0

    @nn.compact
    def __call__(self, t, ye=None):
        te = layers.GaussianFourierProjection(
            embed_dim=self.embed_dim, scale=self.projection_scale)(t)
        te = nn.Dense(self.output_dim)(te)
        te = nn.silu(te)
        te = nn.Dense(self.output_dim)(te)
        if ye is not None:
            te = te + ye
        return nn.silu(te)


class ADM(nn.Module):
    """(adm.py:119-216). Calling convention: model(x, t, y, train)."""
    config: ADMConfig
    conditional_embedding: nn.Module | None = None

    def _block(self, channels_out, name, *, resample=None, has_attn=False,
               has_skip=False):
        cfg = self.config
        resample_type = ("avg" if resample == "downsample" else "nearest")
        return ADMBlock(
            channels_out=channels_out,
            has_skip=has_skip,
            resample=resample,
            resample_type=resample_type,
            resample_factor=cfg.transition_scale_factor,
            has_residual=True,
            has_attn=has_attn,
            first_norm=cfg.first_resblock_norm,
            second_norm=cfg.second_resblock_norm,
            affine_norm=cfg.affine_norm,
            conv_type=cfg.convolution_type,
            num_groups=cfg.num_groups,
            pdrop=cfg.dropout,
            attn_type=cfg.attn_type,
            attn_heads=cfg.attn_heads,
            attn_residual=cfg.attn_residual,
            attn_backend=cfg.attn_backend,
            skip_integration_type=cfg.skip_integration_type,
            name=name)

    @nn.compact
    def __call__(self, x, t=None, y=None, train: bool = False):
        cfg = self.config
        assert x.ndim == cfg.dimension + 2
        if cfg.space_to_depth > 1:
            x = tensor_utils.space_to_depth(x, cfg.space_to_depth)

        # --- embeddings ---
        if y is not None:
            ye = self.conditional_embedding(y)
            ye = nn.Dropout(cfg.cond_dropout, deterministic=not train)(ye)
        elif self.conditional_embedding is not None:
            ye = jnp.zeros((x.shape[0], cfg.output_embed_dim), x.dtype)
        else:
            ye = None
        if t is None:
            t = jnp.zeros((x.shape[0],), x.dtype)
        te = ADMTimeEmbedding(cfg.time_embed_dim, cfg.output_embed_dim,
                              cfg.time_projection_scale,
                              name="time_embedding")(t, ye)

        x = layers.conv_layer(cfg.convolution_type, cfg.model_channels,
                              cfg.kernel_size, name="input_layer")(
                                  cfg.dimension)(x)

        # --- encoder (adm.py:602-687): skip = post-downsample output ---
        ext = cfg.extended_channel_expansion
        mc = cfg.model_channels
        skips = []
        for i in range(len(ext) - 1):
            cin, cout = mc * ext[i], mc * ext[i + 1]
            for j in range(cfg.number_resnet_downward_block):
                last = j == cfg.number_resnet_downward_block - 1
                x = self._block(cout if last else cin,
                                f"enc_{i}_block_{j}",
                                resample="downsample" if last else None)(
                                    x, te, train=train)
            skips.append(x)

        # --- middle block (adm.py:958-1022) ---
        for j, has_attn in enumerate(cfg.middle_block_attn_config):
            x = self._block(cfg.middle_channel, f"mid_block_{j}",
                            has_attn=has_attn)(x, te, train=train)

        # --- decoder (adm.py:853-956) ---
        rev = ext[::-1]
        for i in range(len(rev) - 1):
            cin, cout = mc * rev[i], mc * rev[i + 1]
            skip = skips.pop()
            if cfg.decoder_type == 1:
                # join once at layer entry
                if cfg.skip_integration_type == "concat":
                    x = jnp.concatenate([x, skip], axis=-1)
                else:
                    x = x + skip
                width = x.shape[-1]
                for j in range(cfg.number_resnet_upward_block):
                    last = j == cfg.number_resnet_upward_block - 1
                    x = self._block(cout if last else width,
                                    f"dec_{i}_block_{j}",
                                    resample="upsample" if last else None)(
                                        x, te, train=train)
            elif cfg.decoder_type == 2:
                # join inside every block
                for j in range(cfg.number_resnet_upward_block):
                    last = j == cfg.number_resnet_upward_block - 1
                    x = self._block(cout if last else cin,
                                    f"dec_{i}_block_{j}",
                                    resample="upsample" if last else None,
                                    has_skip=True)(x, te, skip=skip,
                                                   train=train)
            else:
                raise ValueError(f"Invalid decoder type {cfg.decoder_type}")

        s2d = cfg.space_to_depth
        out_ch = cfg.output_channels * (s2d ** cfg.dimension)
        x = layers.conv_layer(cfg.convolution_type, out_ch,
                              cfg.kernel_size, name="output_layer")(
                                  cfg.dimension)(x)
        if s2d > 1:
            x = tensor_utils.depth_to_space(x, s2d)
        return x

    def export_description(self) -> dict[str, Any]:
        cemb = getattr(self.conditional_embedding, "export_description", None)
        return dict(kind="adm",
                    config=self.config.export_description(),
                    conditional_embedding_args=cemb() if cemb else None,
                    has_conditional_embedding=(
                        self.conditional_embedding is not None))
