"""PUNetG: the workhorse UNet for probabilistic generation, 2D & 3D.

TPU-native redesign of the reference PUNetG
(reference diffsci/models/nets/punetg.py:10-735, punetg_config.py:7-122):

- channels-last activations [B, *spatial, C] (native TPU conv layout)
- one dimension-agnostic implementation (the ``dimension`` config field
  selects the expected input rank)
- time embedding via Gaussian-Fourier random features added to the
  conditional embedding; per-sample condition drop for CFG training
- additive skip connections between symmetric down/up levels
  (punetg.py:356-376), global-attention bottleneck (punetg.py:378-387)
- default / circular (periodic) / magnitude-preserving convolutions
- channels-last makes the bias-free ones-channel trick
  (punetg.py:390-394) a concat on the last axis
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from diffsci_tpu.models.nets import layers
from diffsci_tpu.utils import tensor as tensor_utils
from diffsci_tpu.models.nets.attention import SpatialSelfAttention


@dataclasses.dataclass(frozen=True)
class PUNetGConfig:
    """(punetg_config.py:7-122)"""
    input_channels: int = 1
    output_channels: int = 1
    dimension: int = 2
    model_channels: int = 64
    channel_expansion: Sequence[int] = (2, 4)
    number_resnet_downward_block: int = 2
    number_resnet_upward_block: int = 2
    number_resnet_attn_block: int = 2
    number_resnet_before_attn_block: int = 2
    number_resnet_after_attn_block: int = 2
    kernel_size: int = 3
    in_out_kernel_size: int = 3
    in_embedding: bool = False
    time_projection_scale: float = 30.0
    input_projection_scale: float = 1.0
    transition_scale_factor: int = 2
    transition_kernel_size: int = 3
    dropout: float = 0.0
    cond_dropout: float = 0.0
    cond_drop: float = 0.0
    cond_drop_learnable: bool = True
    first_resblock_norm: str = "GroupLN"
    second_resblock_norm: str = "GroupRMS"
    affine_norm: bool = True
    convolution_type: str = "default"
    num_groups: int = 1
    attn_residual: bool = False
    attn_type: str = "default"
    num_heads: int = 1
    attn_backend: str = "xla"
    bias: bool = True
    # Fold s^d spatial tiles into channels at the input and unfold at the
    # output. TPU lever: C<128 tensors pad the lane dim to 128, so a
    # C=1..32 volume moves 4-128x its logical bytes; folding recovers
    # lane utilization at the expensive high-resolution levels (measured
    # v5e: a 32^3/32ch train step is 5% MXU / 106% HBM without it).
    space_to_depth: int = 1

    def __post_init__(self):
        object.__setattr__(self, "channel_expansion",
                           tuple(self.channel_expansion))

    @property
    def extended_channel_expansion(self):
        return [1] + list(self.channel_expansion)

    @property
    def magnitude_preserving(self):
        return self.convolution_type == "mp"

    def export_description(self) -> dict[str, Any]:
        d = dataclasses.asdict(self)
        d["channel_expansion"] = list(self.channel_expansion)
        return d

    @classmethod
    def from_description(cls, description: dict):
        description = dict(description)
        if "channel_expansion" in description:
            description["channel_expansion"] = tuple(
                description["channel_expansion"])
        return cls(**description)

    @classmethod
    def from_config_file(cls, config_file: pathlib.Path | str):
        import yaml
        with open(config_file) as f:
            return cls.from_description(yaml.safe_load(f))


class PUNetG(nn.Module):
    """UNet score network D-predictor backbone (punetg.py:10-421).

    Calling convention: ``model(x, t, y=None, train=False)`` with
    x: [B, *spatial, C_in], t: [B] (the preconditioned noise conditioner),
    y: conditional data (dict or array) fed to ``conditional_embedding``.
    """
    config: PUNetGConfig
    conditional_embedding: nn.Module | None = None
    extra_residual: nn.Module | None = None

    def _resnet(self, mult: int, name: str):
        cfg = self.config
        return layers.ResnetBlockC(
            channels=mult * cfg.model_channels,
            time_embed_dim=cfg.model_channels,
            kernel_size=cfg.kernel_size,
            dropout=cfg.dropout,
            first_norm=cfg.first_resblock_norm,
            second_norm=cfg.second_resblock_norm,
            affine_norm=cfg.affine_norm,
            convolution_type=cfg.convolution_type,
            use_bias=cfg.bias,
            extra_residual=self.extra_residual,
            name=name)

    def _attn(self, mult: int, name: str):
        cfg = self.config
        return SpatialSelfAttention(
            num_heads=cfg.num_heads,
            attn_type=cfg.attn_type,
            attn_residual=cfg.attn_residual,
            magnitude_preserving=cfg.magnitude_preserving,
            backend=cfg.attn_backend,
            name=name)

    @nn.compact
    def __call__(self, x, t=None, y=None, train: bool = False):
        cfg = self.config
        assert x.ndim == cfg.dimension + 2, (
            f"expected [B, *{cfg.dimension}D spatial, C], got {x.shape}")

        if cfg.space_to_depth > 1:
            x = tensor_utils.space_to_depth(x, cfg.space_to_depth)

        if not cfg.bias:
            ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
            x = jnp.concatenate([x, ones], axis=-1)

        # --- input stem ---
        if cfg.in_embedding:
            x = layers.ConvolutionalFourierProjection(
                input_dim=x.shape[-1],
                embed_dim=cfg.model_channels,
                scale=cfg.input_projection_scale,
                use_bias=cfg.bias,
                name="convin")(x)
        else:
            x = layers.conv_layer(cfg.convolution_type, cfg.model_channels,
                                  cfg.in_out_kernel_size, cfg.bias,
                                  name="convin")(cfg.dimension)(x)

        # --- time + condition embedding ---
        if t is not None:
            te = layers.GaussianFourierProjection(
                embed_dim=cfg.model_channels,
                scale=cfg.time_projection_scale,
                name="time_projection")(t)
        else:
            te = jnp.zeros((x.shape[0], cfg.model_channels), x.dtype)
        if y is not None:
            if self.conditional_embedding is not None:
                ye = self.conditional_embedding(y)
            else:
                ye = y
            if ye.ndim > te.ndim:
                # spatially-varying condition: lift te to [B, 1.., C]
                if cfg.space_to_depth > 1 and \
                        ye.shape[1:-1] != x.shape[1:-1]:
                    raise ValueError(
                        "space_to_depth>1 folds x to "
                        f"{x.shape[1:-1]} but the spatially-varying "
                        f"condition embedding is {ye.shape[1:-1]}; fold "
                        "the conditioning to the same resolution (e.g. "
                        "utils.space_to_depth) or use a non-spatial "
                        "embedding")
                te = te.reshape(
                    (te.shape[0],) + (1,) * (ye.ndim - te.ndim) + te.shape[1:])
            if cfg.cond_drop and cfg.cond_drop > 0:
                ye = layers.ConditionDrop(
                    rate=cfg.cond_drop, hidden_dim=cfg.model_channels,
                    null_is_learnable=cfg.cond_drop_learnable,
                    name="cond_drop")(ye, train=train)
            ye = nn.Dropout(cfg.cond_dropout, deterministic=not train)(ye)
            te = te + ye

        # --- encoder ---
        ext = cfg.extended_channel_expansion
        skips = []
        for i, in_mult in enumerate(ext[:-1]):
            for j in range(cfg.number_resnet_downward_block):
                x = self._resnet(in_mult, f"down_{i}_res_{j}")(x, te, train)
            skips.append(x)
            # Odd-size levels: pad spatial dims up to the downsample
            # multiple so the strided transition is exact; the decoder
            # crops back to the recorded skip shape. Static no-op when
            # every level divides evenly (the pinned reference configs),
            # and makes arbitrary spatial sizes (e.g. 28x28 with
            # space_to_depth=2 -> 14 -> 7) shape-safe under jit.
            sf = cfg.transition_scale_factor
            pads = [(-d) % sf for d in x.shape[1:-1]]
            if any(pads):
                pad_width = ([(0, 0)] + [(0, p) for p in pads] + [(0, 0)])
                x = jnp.pad(x, pad_width)
            x = layers.DownSampler(
                ext[i + 1] * cfg.model_channels,
                scale_factor=cfg.transition_scale_factor,
                kernel_size=cfg.transition_kernel_size,
                use_bias=cfg.bias,
                convolution_type=cfg.convolution_type,
                name=f"downsampler_{i}")(x)

        # --- bottleneck: before / attn / after (punetg.py:378-387) ---
        bot_mult = ext[-1]
        for j in range(cfg.number_resnet_before_attn_block):
            x = self._resnet(bot_mult, f"before_res_{j}")(x, te, train)
        xa = x
        for j in range(cfg.number_resnet_attn_block):
            xa = self._resnet(bot_mult, f"attn_res_{j}")(xa, te, train)
            if j < cfg.number_resnet_attn_block - 1:
                xa = self._attn(bot_mult, f"attn_{j}")(xa)
        x = x + xa
        for j in range(cfg.number_resnet_after_attn_block):
            x = self._resnet(bot_mult, f"after_res_{j}")(x, te, train)

        # --- decoder ---
        rev = list(reversed(ext))
        for i, in_mult in enumerate(rev[:-1]):
            out_mult = rev[i + 1]
            x = layers.UpSampler(
                out_mult * cfg.model_channels,
                scale_factor=cfg.transition_scale_factor,
                kernel_size=cfg.transition_kernel_size,
                use_bias=cfg.bias,
                convolution_type=cfg.convolution_type,
                name=f"upsampler_{i}")(x)
            skip = skips.pop()
            if x.shape[1:-1] != skip.shape[1:-1]:
                x = x[(slice(None),)
                      + tuple(slice(0, d) for d in skip.shape[1:-1])]
            x = x + skip
            for j in range(cfg.number_resnet_upward_block):
                x = self._resnet(out_mult, f"up_{i}_res_{j}")(x, te, train)

        # --- output head ---
        s2d = cfg.space_to_depth
        out_ch = cfg.output_channels * (s2d ** cfg.dimension)
        x = layers.conv_layer(cfg.convolution_type, out_ch,
                              cfg.in_out_kernel_size, cfg.bias,
                              name="convout")(cfg.dimension)(x)
        if s2d > 1:
            x = tensor_utils.depth_to_space(x, s2d)
        return x

    def export_description(self) -> dict[str, Any]:
        cemb = getattr(self.conditional_embedding, "export_description", None)
        return dict(
            kind="punetg",
            config=self.config.export_description(),
            conditional_embedding_args=cemb() if cemb else None,
            has_conditional_embedding=self.conditional_embedding is not None)


class PUNetGCond(nn.Module):
    """PUNetG with channel-concatenated conditioning (punetg.py:633-735):
    selected keys of the condition dict are concatenated to x as channels,
    the rest flow through the embedding path. Composes (rather than
    subclasses) PUNetG — flax modules allow one compact method."""
    config: PUNetGConfig
    conditional_embedding: nn.Module | None = None
    extra_residual: nn.Module | None = None
    channel_conditional_items: Sequence[str] = ()

    @nn.compact
    def __call__(self, x, t=None, y=None, train: bool = False):
        y_channels = [y[item] for item in self.channel_conditional_items]
        y_rest = {k: v for k, v in y.items()
                  if k not in self.channel_conditional_items}
        y_rest = y_rest if y_rest else None
        y_cat = jnp.concatenate(y_channels, axis=-1)
        if y_cat.shape[0] == 1 and x.shape[0] > 1:
            y_cat = jnp.broadcast_to(y_cat, x.shape[:1] + y_cat.shape[1:])
        x = jnp.concatenate([x, y_cat], axis=-1)
        return PUNetG(self.config, self.conditional_embedding,
                      self.extra_residual, name="unet")(x, t, y_rest,
                                                        train=train)

    def export_description(self) -> dict[str, Any]:
        cemb = getattr(self.conditional_embedding, "export_description", None)
        return dict(
            kind="punetg_cond",
            config=self.config.export_description(),
            conditional_embedding_args=cemb() if cemb else None,
            has_conditional_embedding=self.conditional_embedding is not None,
            channel_conditional_items=list(self.channel_conditional_items))


def calculate_receptive_field(config: PUNetGConfig) -> dict:
    """Theoretical receptive field of a PUNetG in input pixels
    (reference punetg.py:423-631): trace every conv through the UNet,
    accumulating ``rf += (k-1) * stride`` with stride doubling at each
    DownSampler's pool and halving back at each UpSampler (nearest-
    neighbor upsampling itself adds no RF). Global attention at the
    bottleneck (present when number_resnet_attn_block >= 2) makes the
    RF infinite and tile-based chunking infeasible.

    TPU-build addition: ``space_to_depth=s`` folds s^d input tiles into
    channels before convin, so every traced stride (and the initial RF)
    is multiplied by s in true input pixels.

    Returns {'rf', 'has_attention', 'num_attention_layers', 'trace',
    'feasible_chunking', 'downsampling_factor', 'config_summary'} —
    the same surface as the reference, so chunk-size planning code can
    consume either."""
    trace: list[str] = []
    summary = dict(
        number_resnet_attn_block=config.number_resnet_attn_block,
        number_resnet_downward_block=config.number_resnet_downward_block,
        number_resnet_upward_block=config.number_resnet_upward_block,
        number_resnet_before_attn_block=(
            config.number_resnet_before_attn_block),
        number_resnet_after_attn_block=config.number_resnet_after_attn_block,
        kernel_size=config.kernel_size,
        in_out_kernel_size=config.in_out_kernel_size,
        transition_kernel_size=config.transition_kernel_size,
        transition_scale_factor=config.transition_scale_factor,
        channel_expansion=list(config.channel_expansion),
        space_to_depth=config.space_to_depth)

    num_attention_layers = max(config.number_resnet_attn_block - 1, 0)
    if num_attention_layers > 0:
        trace.append(f"ATTENTION: {num_attention_layers} global attention "
                     "layer(s) flatten all spatial dims -> RF infinite")
        return dict(rf=float("inf"), has_attention=True,
                    num_attention_layers=num_attention_layers, trace=trace,
                    feasible_chunking=False, config_summary=summary)

    s2d = max(int(config.space_to_depth), 1)
    rf, stride = s2d, s2d  # one folded pixel covers an s^d input tile
    trace.append(f"initial: rf={rf} stride={stride}"
                 + (f" (space_to_depth={s2d})" if s2d > 1 else ""))

    def conv(rf, k, stride, name):
        add = (k - 1) * stride
        trace.append(f"{name} (k={k}): rf {rf} -> {rf + add}")
        return rf + add

    def resblock(rf, stride, name):
        # ResnetBlockC: norm -> SiLU -> conv, twice (layers.py)
        add = 2 * (config.kernel_size - 1) * stride
        trace.append(f"{name} (2x k={config.kernel_size}): "
                     f"rf {rf} -> {rf + add}")
        return rf + add

    if config.in_embedding:
        # ConvolutionalFourierProjection is 1x1-equivalent: no RF change
        trace.append("convin (Fourier embedding): no rf change")
    else:
        rf = conv(rf, config.in_out_kernel_size, stride, "convin")

    levels = len(config.channel_expansion)
    for lv in range(levels):
        for j in range(config.number_resnet_downward_block):
            rf = resblock(rf, stride, f"down[{lv}].res[{j}]")
        pool = config.transition_scale_factor
        rf += (pool - 1) * stride
        stride *= pool
        trace.append(f"down[{lv}].maxpool (k={pool}): rf={rf} "
                     f"stride={stride}")
        rf = conv(rf, config.transition_kernel_size, stride,
                  f"down[{lv}].conv")

    for j in range(config.number_resnet_before_attn_block):
        rf = resblock(rf, stride, f"before[{j}]")
    for j in range(config.number_resnet_attn_block):
        rf = resblock(rf, stride, f"attn_res[{j}]")
    for j in range(config.number_resnet_after_attn_block):
        rf = resblock(rf, stride, f"after[{j}]")

    for lv in range(levels - 1, -1, -1):
        stride //= config.transition_scale_factor
        trace.append(f"up[{lv}].upsample: no rf change, stride={stride}")
        rf = conv(rf, config.transition_kernel_size, stride,
                  f"up[{lv}].conv")
        for j in range(config.number_resnet_upward_block):
            rf = resblock(rf, stride, f"up[{lv}].res[{j}]")

    rf = conv(rf, config.in_out_kernel_size, stride, "convout")
    trace.append(f"final rf={rf}")
    return dict(
        rf=rf, has_attention=False, num_attention_layers=0, trace=trace,
        feasible_chunking=True,
        downsampling_factor=(config.transition_scale_factor ** levels) * s2d,
        config_summary=summary)
