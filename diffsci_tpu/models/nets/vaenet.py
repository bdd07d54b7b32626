"""VAENet: the in-house dimension-agnostic (1/2/3D) VAE with minimal-RF
blocks, optional time conditioning, and bounded-memory patched convolution.

TPU-native redesign of the reference VAENet
(reference diffsci/models/nets/vaenet.py:15-1351; TimeVAENet
timevaenet.py:17-1351 is the with_time_emb=True configuration of the same
architecture and is covered by this implementation). Built on the shared
LDM blocks (diffsci_tpu/models/nets/vae.py) plus:

- MinimalResnetBlock (vaenet.py:328-388): single 3x3 conv + sigmoid-gated
  residual; receptive field +2 per block instead of +4 — the block family
  the exact tiled decoder prefers,
- optional time embedding fed to every block (timevaenet),
- ``patched_conv``: run any conv window-by-window to bound peak memory
  (reference patched_conv.py:31-115) — an eager-mode utility; under jit
  use extra/chunk_decode instead.
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from diffsci_tpu.models.nets.vae import (LDMAttnBlock, LDMLinearAttnBlock,
                                         LDMDownsample, LDMUpsample, swish)
from diffsci_tpu.models.nets.layers import GaussianFourierProjection


def divide_dims(ub: int, window_size: int, lb: int = 0):
    """Split [lb, ub) into windows (reference patched_conv.py:4-28)."""
    patches = []
    n = -(-(ub - lb) // window_size)
    for i in range(n):
        lo = lb + i * window_size
        hi = min(ub, lb + (i + 1) * window_size)
        patches.append((lo, hi))
    return patches


def patched_conv(x, conv_apply, patch_size: int, padding: int):
    """Apply a SAME-padded conv window-by-window over the spatial dims of a
    channels-last array, bounding peak activation memory
    (patched_conv.py:31-115). ``conv_apply`` must be a VALID conv taking
    the haloed window."""
    spatial = x.shape[1:-1]
    ndim = len(spatial)
    pad = [(0, 0)] + [(padding, padding)] * ndim + [(0, 0)]
    xp = jnp.pad(x, pad)
    out = None
    grids = [divide_dims(d, patch_size) for d in spatial]
    import itertools
    for windows in itertools.product(*grids):
        src = [slice(None)]
        dst = [slice(None)]
        for (lo, hi) in windows:
            src.append(slice(lo, hi + 2 * padding))
            dst.append(slice(lo, hi))
        src.append(slice(None))
        dst.append(slice(None))
        res = conv_apply(xp[tuple(src)])
        if out is None:
            out = jnp.zeros(x.shape[:-1] + (res.shape[-1],), res.dtype)
        out = out.at[tuple(dst)].set(res)
    return out


@dataclasses.dataclass(frozen=True)
class VAENetConfig:
    """(vaenet.py:15-111)"""
    dimension: int = 3
    in_channels: int = 1
    out_channels: int = 1
    z_channels: int = 4
    z_dim: int = 4
    ch: int = 32
    ch_mult: Sequence[int] = (1, 2, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    resolution: int = 64
    has_mid_attn: bool = True
    resamp_with_conv: bool = True
    attn_type: str = "vanilla"
    tanh_out: bool = False
    input_bias: bool = True
    output_bias: bool = True
    with_time_emb: bool = False
    double_z: bool = True
    num_groups: int = 32
    minimal_rf_mode: bool = False

    def __post_init__(self):
        assert self.dimension in (1, 2, 3)
        object.__setattr__(self, "ch_mult", tuple(self.ch_mult))
        object.__setattr__(self, "attn_resolutions",
                           tuple(self.attn_resolutions))

    @property
    def num_resolutions(self):
        return len(self.ch_mult)

    def export_description(self) -> dict[str, Any]:
        d = dataclasses.asdict(self)
        d["ch_mult"] = list(self.ch_mult)
        d["attn_resolutions"] = list(self.attn_resolutions)
        return d

    @classmethod
    def from_description(cls, description: dict):
        description = {k: v for k, v in description.items()
                       if k in {f.name for f in dataclasses.fields(cls)}}
        return cls(**description)

    @classmethod
    def from_config_file(cls, config_file: pathlib.Path | str):
        import yaml
        with open(config_file) as f:
            return cls.from_description(yaml.safe_load(f))


def _gnorm(x, num_groups):
    g = min(num_groups, x.shape[-1])
    while x.shape[-1] % g != 0:
        g -= 1
    return nn.GroupNorm(num_groups=g, epsilon=1e-6)(x)


class _StdResBlock(nn.Module):
    """norm-swish-conv x2 with time bias (vaenet.py:266-326)."""
    out_channels: int | None = None
    dropout: float = 0.0
    num_groups: int = 32

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False):
        ndim = x.ndim - 2
        out_ch = self.out_channels or x.shape[-1]
        h = _gnorm(x, self.num_groups)
        h = swish(h)
        h = nn.Conv(out_ch, (3,) * ndim, padding="SAME")(h)
        if temb is not None:
            h = h + nn.Dense(out_ch)(swish(temb)).reshape(
                (temb.shape[0],) + (1,) * ndim + (out_ch,))
        h = _gnorm(h, self.num_groups)
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(out_ch, (3,) * ndim, padding="SAME")(h)
        if x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1,) * ndim)(x)
        return x + h


class MinimalResnetBlock(nn.Module):
    """Single-conv gated block, +2 RF (vaenet.py:328-388)."""
    out_channels: int | None = None
    dropout: float = 0.0
    num_groups: int = 32

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False):
        ndim = x.ndim - 2
        out_ch = self.out_channels or x.shape[-1]
        h = _gnorm(x, self.num_groups)
        h = swish(h)
        h = nn.Conv(out_ch, (3,) * ndim, padding="SAME")(h)
        if temb is not None:
            h = h + nn.Dense(out_ch)(swish(temb)).reshape(
                (temb.shape[0],) + (1,) * ndim + (out_ch,))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        gate = nn.sigmoid(nn.Conv(out_ch, (1,) * ndim)(x))
        if x.shape[-1] != out_ch:
            x = nn.Conv(out_ch, (1,) * ndim)(x)
        return x + gate * h


def _make_block(cfg: VAENetConfig, out_channels):
    cls = MinimalResnetBlock if cfg.minimal_rf_mode else _StdResBlock
    return cls(out_channels=out_channels, dropout=cfg.dropout,
               num_groups=cfg.num_groups)


def _make_attn(cfg: VAENetConfig):
    if cfg.attn_type == "vanilla":
        return LDMAttnBlock(num_groups=cfg.num_groups)
    if cfg.attn_type == "linear":
        return LDMLinearAttnBlock()
    return lambda x: x


class _TimeEmbed(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, t):
        te = GaussianFourierProjection(self.ch)(t)
        te = nn.Dense(4 * self.ch)(te)
        te = nn.silu(te)
        return nn.Dense(4 * self.ch)(te)


class VAENetEncoder(nn.Module):
    """(vaenet.py:685-946)"""
    config: VAENetConfig

    @nn.compact
    def __call__(self, x, time=None, train: bool = False):
        cfg = self.config
        ndim = cfg.dimension
        temb = (_TimeEmbed(cfg.ch, name="time_embed")(time)
                if (cfg.with_time_emb and time is not None) else None)
        curr_res = cfg.resolution
        h = nn.Conv(cfg.ch, (3,) * ndim, padding="SAME",
                    use_bias=cfg.input_bias, name="conv_in")(x)
        for i_level in range(cfg.num_resolutions):
            out_ch = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = _make_block(cfg, out_ch)(h, temb, train)
                if curr_res in cfg.attn_resolutions:
                    h = _make_attn(cfg)(h)
            if i_level != cfg.num_resolutions - 1:
                h = LDMDownsample(with_conv=cfg.resamp_with_conv)(h)
                curr_res //= 2
        h = _make_block(cfg, None)(h, temb, train)
        if cfg.has_mid_attn:
            h = LDMAttnBlock(num_groups=cfg.num_groups,
                             name="mid_attn")(h)
        h = _make_block(cfg, None)(h, temb, train)
        h = _gnorm(h, cfg.num_groups)
        h = swish(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        h = nn.Conv(out_ch, (3,) * ndim, padding="SAME",
                    name="conv_out")(h)
        # 1x1 projection z_channels -> z_dim, inside the encoder like the
        # reference (vaenet.py:816,873)
        q_ch = 2 * cfg.z_dim if cfg.double_z else cfg.z_dim
        return nn.Conv(q_ch, (1,) * ndim, name="quant_conv")(h)


class VAENetDecoder(nn.Module):
    """(vaenet.py:948-1229)"""
    config: VAENetConfig

    @nn.compact
    def __call__(self, z, time=None, train: bool = False):
        cfg = self.config
        ndim = cfg.dimension
        temb = (_TimeEmbed(cfg.ch, name="time_embed")(time)
                if (cfg.with_time_emb and time is not None) else None)
        block_in = cfg.ch * cfg.ch_mult[-1]
        curr_res = cfg.resolution // 2 ** (cfg.num_resolutions - 1)
        # 1x1 projection z_dim -> z_channels, inside the decoder like the
        # reference (vaenet.py:971,1093)
        z = nn.Conv(cfg.z_channels, (1,) * ndim, name="post_quant_conv")(z)
        h = nn.Conv(block_in, (3,) * ndim, padding="SAME",
                    name="conv_in")(z)
        h = _make_block(cfg, None)(h, temb, train)
        if cfg.has_mid_attn:
            h = LDMAttnBlock(num_groups=cfg.num_groups,
                             name="mid_attn")(h)
        h = _make_block(cfg, None)(h, temb, train)
        for i_level in reversed(range(cfg.num_resolutions)):
            out_ch = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = _make_block(cfg, out_ch)(h, temb, train)
                if curr_res in cfg.attn_resolutions:
                    h = _make_attn(cfg)(h)
            if i_level != 0:
                h = LDMUpsample(with_conv=cfg.resamp_with_conv)(h)
                curr_res *= 2
        h = _gnorm(h, cfg.num_groups)
        h = swish(h)
        h = nn.Conv(cfg.out_channels, (3,) * ndim, padding="SAME",
                    use_bias=cfg.output_bias, name="conv_out")(h)
        return jnp.tanh(h) if cfg.tanh_out else h


class VAENet(nn.Module):
    """(vaenet.py:1231-1290). encode returns moments [.., 2*z] or a sample;
    channels-last moments split on the last axis."""
    config: VAENetConfig

    def setup(self):
        self.encoder = VAENetEncoder(self.config)
        self.decoder = VAENetDecoder(self.config)

    def encode(self, x, time=None, key=None, train: bool = False):
        z = self.encoder(x, time, train)
        if key is not None:
            mean, logvar = jnp.split(z, 2, axis=-1)
            std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
            z = mean + std * jax.random.normal(key, mean.shape, mean.dtype)
        return z

    def decode(self, z, time=None, train: bool = False):
        return self.decoder(z, time, train)

    def encode_moments(self, x, time=None, train: bool = False):
        """Raw posterior moments (the encoder already applies quant_conv,
        mirroring reference vaenet.py:816) — the hook VAEModel's umbrella
        uses (models/vae/module.py)."""
        return self.encoder(x, time, train)

    def __call__(self, x, time=None, key=None, train: bool = False):
        moments = self.encode(x, time, train=train)
        return moments, self.decode(moments[..., :self.config.z_dim], time,
                                    train=train)

    def export_description(self) -> dict[str, Any]:
        return {"config": self.config.export_description()}

    def receptive_radius(self) -> int:
        """Decoder receptive radius in latent units for exact tiled decode
        (the analogue of vaenet.py's calculate_receptive_field)."""
        per_block = 1 if self.config.minimal_rf_mode else 2
        r = 1.0  # conv_in
        r += 2 * per_block  # mid
        scale = 1.0
        for i_level in reversed(range(self.config.num_resolutions)):
            r += (self.config.num_res_blocks + 1) * per_block / scale
            if i_level != 0:
                scale *= 2
        r += 1.0 / scale
        import math
        return math.ceil(r)
