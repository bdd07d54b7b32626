"""KL-VAE: LDM-style encoder/decoder for latent diffusion, 2D & 3D.

TPU-native redesign of the reference's vendored CompVis LDM autoencoders
(reference diffsci/models/nets/autoencoderldm2d.py:29-721 and its 3D port
autoencoderldm3d.py:30-865). One dimension-agnostic channels-last
implementation replaces both: block structure (GroupNorm32 -> swish -> conv
resnet blocks, optional vanilla/linear attention at configured resolutions,
strided-conv downsample with LDM's asymmetric padding, nearest+conv
upsample, mid block with attention) is preserved exactly; Lightning wiring
is replaced by the functional VAE trainer (diffsci_tpu/models/vae).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def swish(x):
    return x * nn.sigmoid(x)


@dataclasses.dataclass(frozen=True)
class DDConfig:
    """(autoencoderldm2d.py:228-252)"""
    double_z: bool = True
    z_channels: int = 4
    resolution: int = 256
    in_channels: int = 1
    out_ch: int = 1
    ch: int = 32
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = ()
    dropout: float = 0.0
    has_mid_attn: bool = True
    dimension: int = 2
    attn_type: str = "vanilla"  # 'vanilla' | 'linear' | 'none'

    def __post_init__(self):
        object.__setattr__(self, "ch_mult", tuple(self.ch_mult))
        object.__setattr__(self, "attn_resolutions",
                           tuple(self.attn_resolutions))

    def export_description(self) -> dict[str, Any]:
        d = dataclasses.asdict(self)
        d["ch_mult"] = list(self.ch_mult)
        d["attn_resolutions"] = list(self.attn_resolutions)
        return d

    @classmethod
    def from_description(cls, description: dict):
        return cls(**description)


def _norm(x, name=None):
    """GroupNorm(32, eps=1e-6) channels-last (autoencoderldm2d.py:17-21).
    Falls back to fewer groups for narrow layers."""
    groups = min(32, x.shape[-1])
    while x.shape[-1] % groups != 0:
        groups -= 1
    return nn.GroupNorm(num_groups=groups, epsilon=1e-6, name=name)(x)


class LDMResnetBlock(nn.Module):
    """(autoencoderldm2d.py:29-89)"""
    out_channels: int | None = None
    conv_shortcut: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        ndim = x.ndim - 2
        out_ch = self.out_channels or x.shape[-1]
        h = _norm(x)
        h = swish(h)
        h = nn.Conv(out_ch, (3,) * ndim, padding="SAME")(h)
        h = _norm(h)
        h = swish(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(out_ch, (3,) * ndim, padding="SAME")(h)
        if x.shape[-1] != out_ch:
            if self.conv_shortcut:
                x = nn.Conv(out_ch, (3,) * ndim, padding="SAME")(x)
            else:
                x = nn.Conv(out_ch, (1,) * ndim)(x)
        return x + h


class LDMAttnBlock(nn.Module):
    """Single-head qkv attention over flattened spatial tokens + residual
    (autoencoderldm2d.py:123-175). ``num_groups=None`` uses the LDM
    default norm (GroupNorm 32); VAENet passes its configured group
    count (reference vaenet.py:417-427 threads config.num_groups)."""
    num_groups: int | None = None

    @nn.compact
    def __call__(self, x):
        B, C = x.shape[0], x.shape[-1]
        spatial = x.shape[1:-1]
        if self.num_groups is None:
            h = _norm(x)
        else:
            h = nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-6)(x)
        tokens = h.reshape(B, -1, C)
        q = nn.Dense(C)(tokens)
        k = nn.Dense(C)(tokens)
        v = nn.Dense(C)(tokens)
        w = jnp.einsum("bic,bjc->bij", q, k) / jnp.sqrt(C)
        w = nn.softmax(w, axis=-1)
        h = jnp.einsum("bij,bjc->bic", w, v)
        h = nn.Dense(C)(h)
        return x + h.reshape((B,) + spatial + (C,))


class LDMLinearAttnBlock(nn.Module):
    """Efficient linear attention (autoencoderldm2d.py:91-121):
    softmax over keys, context = k v^T, out = context q."""
    heads: int = 4

    @nn.compact
    def __call__(self, x):
        B, C = x.shape[0], x.shape[-1]
        spatial = x.shape[1:-1]
        tokens = x.reshape(B, -1, C)
        dh = C // self.heads
        qkv = nn.Dense(3 * C, use_bias=False)(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, -1, self.heads, dh).transpose(0, 2, 1, 3)

        q, k, v = heads(q), heads(k), heads(v)
        k = nn.softmax(k, axis=-2)
        context = jnp.einsum("bhtd,bhte->bhde", k, v)
        out = jnp.einsum("bhde,bhtd->bhte", context, q)
        out = out.transpose(0, 2, 1, 3).reshape(B, -1, C)
        out = nn.Dense(C)(out)
        return x + out.reshape((B,) + spatial + (C,))


def _make_attn(attn_type: str):
    if attn_type == "vanilla":
        return LDMAttnBlock()
    if attn_type == "linear":
        return LDMLinearAttnBlock()
    return lambda x: x


class LDMDownsample(nn.Module):
    """Strided conv with LDM's asymmetric (0,1) pad
    (autoencoderldm2d.py:206-225)."""
    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        ndim = x.ndim - 2
        if self.with_conv:
            pad = [(0, 0)] + [(0, 1)] * ndim + [(0, 0)]
            x = jnp.pad(x, pad)
            return nn.Conv(x.shape[-1], (3,) * ndim, strides=(2,) * ndim,
                           padding="VALID")(x)
        window = (2,) * ndim
        return nn.avg_pool(x, window, strides=window)


class LDMUpsample(nn.Module):
    """Nearest x2 + conv (autoencoderldm2d.py:188-204)."""
    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        ndim = x.ndim - 2
        for d in range(1, 1 + ndim):
            x = jnp.repeat(x, 2, axis=d)
        if self.with_conv:
            x = nn.Conv(x.shape[-1], (3,) * ndim, padding="SAME")(x)
        return x


class VAEEncoder(nn.Module):
    """(autoencoderldm2d.py:254-356)"""
    config: DDConfig

    @nn.compact
    def __call__(self, x, train: bool = False):
        cfg = self.config
        curr_res = cfg.resolution
        h = nn.Conv(cfg.ch, (3,) * cfg.dimension, padding="SAME",
                    name="conv_in")(x)
        for i_level, mult in enumerate(cfg.ch_mult):
            for i_block in range(cfg.num_res_blocks):
                h = LDMResnetBlock(cfg.ch * mult, dropout=cfg.dropout,
                                   name=f"down_{i_level}_block_{i_block}")(
                                       h, train)
                if curr_res in cfg.attn_resolutions:
                    h = _make_attn(cfg.attn_type)(h)
            if i_level != len(cfg.ch_mult) - 1:
                h = LDMDownsample(name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
        h = LDMResnetBlock(dropout=cfg.dropout, name="mid_block_1")(h, train)
        if cfg.has_mid_attn:
            h = LDMAttnBlock(name="mid_attn")(h)
        h = LDMResnetBlock(dropout=cfg.dropout, name="mid_block_2")(h, train)
        h = _norm(h, name="norm_out")
        h = swish(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(out_ch, (3,) * cfg.dimension, padding="SAME",
                       name="conv_out")(h)


class VAEDecoder(nn.Module):
    """(autoencoderldm2d.py:358-477)"""
    config: DDConfig
    tanh_out: bool = False

    @nn.compact
    def __call__(self, z, train: bool = False):
        cfg = self.config
        n_res = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]
        curr_res = cfg.resolution // 2 ** (n_res - 1)
        h = nn.Conv(block_in, (3,) * cfg.dimension, padding="SAME",
                    name="conv_in")(z)
        h = LDMResnetBlock(dropout=cfg.dropout, name="mid_block_1")(h, train)
        if cfg.has_mid_attn:
            h = LDMAttnBlock(name="mid_attn")(h)
        h = LDMResnetBlock(dropout=cfg.dropout, name="mid_block_2")(h, train)
        for i_level in reversed(range(n_res)):
            for i_block in range(cfg.num_res_blocks + 1):
                h = LDMResnetBlock(cfg.ch * cfg.ch_mult[i_level],
                                   dropout=cfg.dropout,
                                   name=f"up_{i_level}_block_{i_block}")(
                                       h, train)
                if curr_res in cfg.attn_resolutions:
                    h = _make_attn(cfg.attn_type)(h)
            if i_level != 0:
                h = LDMUpsample(name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        h = _norm(h, name="norm_out")
        h = swish(h)
        h = nn.Conv(cfg.out_ch, (3,) * cfg.dimension, padding="SAME",
                    name="conv_out")(h)
        return jnp.tanh(h) if self.tanh_out else h


class DiagonalGaussianDistribution:
    """Functional posterior (autoencoderldm2d.py:499-537); channels-last:
    moments split on the LAST axis."""

    def __init__(self, parameters, deterministic: bool = False):
        self.parameters = parameters
        mean, logvar = jnp.split(parameters, 2, axis=-1)
        self.mean = mean
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.deterministic = deterministic
        if deterministic:
            self.std = jnp.zeros_like(mean)
            self.var = jnp.zeros_like(mean)
        else:
            self.std = jnp.exp(0.5 * self.logvar)
            self.var = jnp.exp(self.logvar)

    def sample(self, key, eps=None):
        """``eps`` replays a fixed standard-normal draw (cross-framework
        parity hook, mirrors vaemodule.py:792-796)."""
        if eps is None:
            eps = jax.random.normal(key, self.mean.shape, self.mean.dtype)
        return self.mean + self.std * jnp.asarray(eps, self.mean.dtype)

    def _axes(self):
        return tuple(range(1, self.mean.ndim))

    @staticmethod
    def _reduce(x, axes, reduce_mean: bool):
        return jnp.mean(x, axis=axes) if reduce_mean else jnp.sum(x,
                                                                  axis=axes)

    def kl(self, other=None, reduce_mean: bool = False):
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],))
        axes = self._axes()
        if other is None:
            core = self.mean ** 2 + self.var - 1.0 - self.logvar
        else:
            core = ((self.mean - other.mean) ** 2 / other.var
                    + self.var / other.var - 1.0
                    - self.logvar + other.logvar)
        return 0.5 * self._reduce(core, axes, reduce_mean)

    def kl_thresholded(self, other=None, threshold: float = 0.5):
        """Per-latent-channel KL floored at ``threshold``
        (vaemodule.py:812-835): free-bits style. Channels-last: the
        per-channel mean reduces over the SPATIAL axes (1..ndim-2) —
        the analogue of the reference's NCHW dims=range(2, ndim)."""
        axes = tuple(range(1, self.mean.ndim - 1))
        if other is None:
            core = self.mean ** 2 + self.var - 1.0 - self.logvar
        else:
            core = ((self.mean - other.mean) ** 2 / other.var
                    + self.var / other.var - 1.0
                    - self.logvar + other.logvar)
        per = 0.5 * (jnp.mean(core, axis=axes) if axes else core)
        return jnp.maximum(per, threshold)

    def modified_hellinger(self, other=None, reduce_mean: bool = False):
        """(vaemodule.py:848-868)"""
        if other is None:
            other_mean, other_var = jnp.zeros_like(self.mean), \
                jnp.ones_like(self.var)
        else:
            other_mean, other_var = other.mean, other.var
        sum_var = self.var + other_var
        log_term = 2 * jnp.log(sum_var / (2 * self.std
                                          * jnp.sqrt(other_var)))
        mean_term = (self.mean - other_mean) ** 2 / sum_var
        return 0.25 * self._reduce(log_term + mean_term, self._axes(),
                                   reduce_mean)

    def wasserstein(self, other=None, reduce_mean: bool = False):
        """2-Wasserstein^2 between diagonal Gaussians
        (vaemodule.py:870-884)."""
        if other is None:
            other_mean, other_std = jnp.zeros_like(self.mean), \
                jnp.ones_like(self.std)
        else:
            other_mean, other_std = other.mean, other.std
        core = (self.mean - other_mean) ** 2 + (self.std - other_std) ** 2
        return self._reduce(core, self._axes(), reduce_mean)

    def nll(self, sample, axes=None):
        if self.deterministic:
            return jnp.zeros((self.mean.shape[0],))
        if axes is None:
            axes = tuple(range(1, self.mean.ndim))
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=axes)

    def mode(self):
        return self.mean


class AutoencoderKL(nn.Module):
    """KL autoencoder (autoencoderldm2d.py:552-721): encoder -> 1x1 quant
    conv -> DiagonalGaussian; 1x1 post-quant conv -> decoder."""
    config: DDConfig
    embed_dim: int = 4

    def setup(self):
        self.encoder = VAEEncoder(self.config)
        self.decoder = VAEDecoder(self.config)
        ndim = self.config.dimension
        factor = 2 if self.config.double_z else 1
        self.quant_conv = nn.Conv(factor * self.embed_dim, (1,) * ndim)
        self.post_quant_conv = nn.Conv(self.config.z_channels, (1,) * ndim)

    def encode(self, x, train: bool = False):
        h = self.encoder(x, train)
        moments = self.quant_conv(h)
        return DiagonalGaussianDistribution(moments)

    def decode(self, z, train: bool = False):
        z = self.post_quant_conv(z)
        return self.decoder(z, train)

    def __call__(self, x, key=None, sample_posterior: bool = True,
                 train: bool = False):
        posterior = self.encode(x, train)
        if sample_posterior:
            z = posterior.sample(key)
        else:
            z = posterior.mode()
        return self.decode(z, train), posterior

    def export_description(self) -> dict[str, Any]:
        return dict(config=self.config.export_description(),
                    embed_dim=self.embed_dim)
