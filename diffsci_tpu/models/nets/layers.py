"""Common network layers, channels-last (TPU-native NHWC / NDHWC).

Redesign of the reference's layer library
(reference diffsci/models/nets/commonlayers.py:13-1127) in flax.linen.
Deliberate layout change: all activations are ``[B, *spatial, C]`` — the
native TPU conv layout — so attention token-flattening is a pure reshape and
XLA never inserts transposes. Non-trainable random projections live in the
``buffers`` variable collection (the functional analogue of torch buffers).

Dimension-agnostic: every layer takes the number of spatial dims from its
input, covering the reference's separate 2D/3D variants with one class.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from diffsci_tpu.models.nets import normed


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------
def _spatial_dims(x):
    """Number of spatial dims of a [B, *spatial, C] activation."""
    return x.ndim - 2


def conv_layer(convolution_type: str, features: int, kernel_size: int,
               use_bias: bool = True, name: str | None = None,
               circular_dims: Sequence[int] | None = None):
    """Pick the conv class per the reference's ``choose_conv_cls``
    (punetg.py:217-236): default / circular (periodic padding) / mp
    (magnitude preserving)."""
    if convolution_type == "default":
        return lambda ndim: nn.Conv(features, (kernel_size,) * ndim,
                                    padding="SAME", use_bias=use_bias,
                                    name=name)
    if convolution_type == "circular":
        return lambda ndim: CircularConv(features, kernel_size,
                                         use_bias=use_bias,
                                         circular_dims=circular_dims,
                                         name=name)
    if convolution_type == "mp":
        return lambda ndim: normed.MagnitudePreservingConv(
            features, kernel_size, use_bias=use_bias, name=name)
    raise ValueError(f"Invalid convolution type: {convolution_type}")


class SwiGLU(nn.Module):
    """(commonlayers.py:13-22)"""
    out_dims: int

    @nn.compact
    def __call__(self, x):
        a = nn.Dense(self.out_dims)(x)
        b = nn.Dense(self.out_dims)(x)
        return a * nn.silu(b)


class CircularConv(nn.Module):
    """Convolution with periodic padding on selected spatial dims
    (commonlayers.py:918-1032). ``circular_dims`` indexes spatial axes;
    None = all circular."""
    features: int
    kernel_size: int
    use_bias: bool = True
    circular_dims: Sequence[int] | None = None

    @nn.compact
    def __call__(self, x):
        ndim = _spatial_dims(x)
        assert self.kernel_size % 2 == 1
        p = self.kernel_size // 2
        circ = set(range(ndim) if self.circular_dims is None
                   else self.circular_dims)
        pad = [(0, 0)]
        for d in range(ndim):
            pad.append((p, p))
        pad.append((0, 0))
        x_wrap = jnp.pad(x, pad, mode="wrap")
        if circ != set(range(ndim)):
            # zero out wrap padding on non-circular dims by re-padding
            slices = [slice(None)]
            zpad = [(0, 0)]
            for d in range(ndim):
                if d in circ:
                    slices.append(slice(None))
                    zpad.append((0, 0))
                else:
                    slices.append(slice(p, -p))
                    zpad.append((p, p))
            slices.append(slice(None))
            zpad.append((0, 0))
            x_wrap = jnp.pad(x_wrap[tuple(slices)], zpad)
        return nn.Conv(self.features, (self.kernel_size,) * ndim,
                       padding="VALID", use_bias=self.use_bias)(x_wrap)


# ---------------------------------------------------------------------------
# up/down sampling
# ---------------------------------------------------------------------------
class DownSampler(nn.Module):
    """MaxPool(scale) then conv (commonlayers.py:25-94)."""
    features: int
    scale_factor: int = 2
    kernel_size: int = 3
    use_bias: bool = True
    convolution_type: str = "default"

    @nn.compact
    def __call__(self, x):
        ndim = _spatial_dims(x)
        window = (self.scale_factor,) * ndim
        x = nn.max_pool(x, window, strides=window)
        conv = conv_layer(self.convolution_type, self.features,
                          self.kernel_size, self.use_bias)(ndim)
        return conv(x)


def nearest_upsample(x, scale: int):
    """Nearest-neighbour upsample over all spatial dims."""
    ndim = _spatial_dims(x)
    for d in range(1, 1 + ndim):
        x = jnp.repeat(x, scale, axis=d)
    return x


class UpSampler(nn.Module):
    """Nearest upsample then conv (commonlayers.py:97-158)."""
    features: int
    scale_factor: int = 2
    kernel_size: int = 3
    use_bias: bool = True
    convolution_type: str = "default"

    @nn.compact
    def __call__(self, x):
        ndim = _spatial_dims(x)
        x = nearest_upsample(x, self.scale_factor)
        conv = conv_layer(self.convolution_type, self.features,
                          self.kernel_size, self.use_bias)(ndim)
        return conv(x)


class CornerPool(nn.Module):
    """Strided subsampling picking each window's corner element
    (commonlayers.py:1035-1098)."""
    stride: int

    def __call__(self, x):
        ndim = _spatial_dims(x)
        idx = (slice(None),) + (slice(None, None, self.stride),) * ndim
        return x[idx]


# ---------------------------------------------------------------------------
# Fourier projections (non-trainable random features)
# ---------------------------------------------------------------------------
class GaussianFourierProjection(nn.Module):
    """sin/cos random-feature time embedding (commonlayers.py:161-190)."""
    embed_dim: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, x):
        W = self.variable(
            "buffers", "W",
            lambda: jax.random.normal(self.make_rng("params"),
                                      (self.embed_dim // 2,)) * self.scale)
        xp = 2 * math.pi * x[..., None] * W.value
        return jnp.concatenate([jnp.sin(xp), jnp.cos(xp)], axis=-1)


class GaussianFourierProjectionVector(nn.Module):
    """Vector-input variant (commonlayers.py:255-286)."""
    input_dim: int
    embed_dim: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, x):
        W = self.variable(
            "buffers", "W",
            lambda: jax.random.normal(self.make_rng("params"),
                                      (self.input_dim, self.embed_dim // 2))
            * self.scale)
        xp = 2 * math.pi * x @ W.value
        return jnp.concatenate([jnp.sin(xp), jnp.cos(xp)], axis=-1)


class ConvolutionalFourierProjection(nn.Module):
    """Per-pixel random-feature channel embedding (commonlayers.py:225-252).
    Channels-last: a fixed random 1x1 'conv' followed by sin/cos."""
    input_dim: int
    embed_dim: int
    scale: float = 30.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        W = self.variable(
            "buffers", "W",
            lambda: jax.random.normal(self.make_rng("params"),
                                      (self.input_dim, self.embed_dim // 2))
            * self.scale)
        xc = jnp.einsum("...c,cd->...d", x, 2 * math.pi * W.value)
        if self.use_bias:
            b = self.variable(
                "buffers", "bias",
                lambda: jax.random.normal(self.make_rng("params"),
                                          (self.embed_dim // 2,)) * self.scale)
            xc = xc + b.value
        return jnp.concatenate([jnp.sin(xc), jnp.cos(xc)], axis=-1)


# ---------------------------------------------------------------------------
# group norms (channels-last)
# ---------------------------------------------------------------------------
class _GroupNormBase(nn.Module):
    """Channels-last group normalization family. ``x`` is [B, *sp, C];
    channels are split into ``num_groups`` groups of C // G.

    ``fuse_silu=True`` appends SiLU and, on TPU for the per-channel case
    (G == C, the PUNetG configuration), dispatches to the fused Pallas
    kernel (kernels/fused_norm.py): one HBM read + one write instead of
    XLA's reduce + re-read, a real cut on the bandwidth-bound train step.
    Falls back to the pure-JAX path (+ SiLU) everywhere else, so the
    semantics are identical on any backend. Note: the Pallas path assumes
    per-device execution (single chip or under shard_map); it is gated to
    the TPU backend."""
    num_groups: int
    num_channels: int
    eps: float = 1e-5
    affine: bool = True
    subtract_mean: bool = False
    spatial: bool = True  # normalize over spatial dims too
    fuse_silu: bool = False

    @nn.compact
    def __call__(self, x):
        if self.fuse_silu and self.affine:
            from diffsci_tpu.kernels import fused_norm
            if fused_norm.engaged(x.shape, self.num_groups,
                                  self.num_channels, self.spatial):
                w = self.param("scale", nn.initializers.ones,
                               (self.num_channels,))
                b = self.param("bias", nn.initializers.zeros,
                               (self.num_channels,))
                kind = "ln" if self.subtract_mean else "rms"
                return fused_norm.norm_silu(
                    x, w, b, kind, self.eps,
                    interpret=fused_norm.INTERPRET)
        B = x.shape[0]
        C = x.shape[-1]
        G = self.num_groups
        sp = x.shape[1:-1]
        xg = x.reshape((B,) + sp + (G, C // G))
        if self.spatial:
            axes = tuple(range(1, 1 + len(sp))) + (x.ndim,)  # spatial + C//G
        else:
            axes = (x.ndim,)
        if self.subtract_mean:
            # Shifted ONE-pass variance. The naive one-pass E[x^2]-mu^2
            # cancels catastrophically when |mu| >> std (post-attention
            # activations: mu ~ 1, std ~ 0.03, ~3 digits lost), but the
            # honest two-pass E[(x-mu)^2] costs a second full HBM read
            # plus a materialized centered tensor — measured 45% of the
            # CIFAR-scale train step (docs/artifacts/cifar_profile_r5).
            # Shifting by m0, the mean of ONE leading spatial row, fixes
            # the numerics at one-pass cost: var = E[(x-m0)^2]-E[x-m0]^2
            # only cancels by (mu-m0)^2/var, which Cauchy-Schwarz bounds
            # by the subsample ratio N/n0 (<= 32 here), i.e. <= 5 bits —
            # worst-case ~4e-6 relative f32 error vs the f64 truth (the
            # parity12 MP pin holds at rtol 5e-4). The m0 reduce touches
            # 1/sp[0] of the tensor; the sum/sumsq pair over (x - m0) is
            # one sibling-fused XLA pass.
            if self.spatial and sp and sp[0] >= 2:
                sub = jax.lax.slice_in_dim(xg, 0, 1, axis=1)
                m0 = jnp.mean(sub, axis=axes, keepdims=True)
                xs = xg - m0
                mean_s = jnp.mean(xs, axis=axes, keepdims=True)
                ms = (jnp.mean(xs ** 2, axis=axes, keepdims=True)
                      - mean_s ** 2)
                ms = jnp.maximum(ms, 0.0)
                xg = (xs - mean_s) / jnp.sqrt(ms + self.eps)
            else:
                # no spatial extent to subsample (e.g. [B, C] inputs):
                # stay on the exact two-pass form — the tensor is small
                mean = jnp.mean(xg, axis=axes, keepdims=True)
                xc = xg - mean
                ms = jnp.mean(xc ** 2, axis=axes, keepdims=True)
                xg = xc / jnp.sqrt(ms + self.eps)
        else:
            ms = jnp.mean(xg ** 2, axis=axes, keepdims=True)
            xg = xg / jnp.sqrt(ms + self.eps)
        x = xg.reshape((B,) + sp + (C,))
        if self.affine:
            w = self.param("scale", nn.initializers.ones, (C,))
            b = self.param("bias", nn.initializers.zeros, (C,))
            x = x * w + b
        if self.fuse_silu:
            x = nn.silu(x)
        return x


class GroupRMSNorm(_GroupNormBase):
    """RMS over (C//G, *spatial) (commonlayers.py:332-384)."""
    subtract_mean: bool = False
    spatial: bool = True


class GroupPixNorm(_GroupNormBase):
    """RMS over C//G only, per pixel (commonlayers.py:387-438)."""
    subtract_mean: bool = False
    spatial: bool = False


class GroupLNorm(_GroupNormBase):
    """Mean-subtracted norm over (C//G, *spatial), i.e. torch GroupNorm
    semantics (commonlayers.py:441-494)."""
    subtract_mean: bool = True
    spatial: bool = True


def make_norm(kind: str, num_groups: int, num_channels: int,
              affine: bool = True, fuse_silu: bool = False):
    """Norm factory per ResnetBlockC.get_normalization_functions
    (commonlayers.py:874-901). 'GroupLN' matches torch.nn.GroupNorm.
    ``fuse_silu`` appends SiLU inside the module (Pallas-fused on TPU)."""
    if kind == "GroupLN":
        return GroupLNorm(num_groups, num_channels, affine=affine,
                          fuse_silu=fuse_silu)
    if kind == "GroupRMS":
        return GroupRMSNorm(num_groups, num_channels, affine=affine,
                            fuse_silu=fuse_silu)
    if kind == "GroupPix":
        return GroupPixNorm(num_groups, num_channels, affine=affine,
                            fuse_silu=fuse_silu)
    if fuse_silu:
        return nn.silu  # identity norm: just the activation
    return lambda x: x


# ---------------------------------------------------------------------------
# time embedding MLP + resnet blocks
# ---------------------------------------------------------------------------
class ResnetTimeBlock(nn.Module):
    """Time-embedding MLP: embed -> 4x -> 4x -> out with SiLU
    (commonlayers.py:496-551). Accepts [B, E] (broadcast over space) or
    [B, *spatial, E] (pointwise) inputs."""
    embed_channels: int
    output_channels: int
    magnitude_preserving: bool = False

    @nn.compact
    def __call__(self, te, spatial_ndim: int):
        dense = (normed.MagnitudePreservingDense if self.magnitude_preserving
                 else nn.Dense)
        h = dense(4 * self.embed_channels)(te)
        h = nn.silu(h)
        h = dense(4 * self.embed_channels)(h)
        h = nn.silu(h)
        h = dense(self.output_channels)(h)
        if te.ndim == 2:
            # [B, out] -> [B, 1, ..., 1, out]
            h = h.reshape((h.shape[0],) + (1,) * spatial_ndim + (h.shape[-1],))
        return h


class ResnetBlockC(nn.Module):
    """The workhorse residual block: norm -> SiLU -> conv, +time-bias,
    norm -> SiLU -> dropout -> conv, +skip (commonlayers.py:709-901).

    Supports corner-pool downscale / nearest upscale of mismatched
    spatially-varying time embeddings (rescale_yt, commonlayers.py:838-869).
    """
    channels: int
    time_embed_dim: int | None
    output_channels: int | None = None
    kernel_size: int = 3
    dropout: float = 0.0
    first_norm: str = "GroupLN"
    second_norm: str = "GroupRMS"
    affine_norm: bool = True
    convolution_type: str = "default"
    use_bias: bool = True
    extra_residual: Callable | None = None

    @nn.compact
    def __call__(self, x, te=None, train: bool = False):
        ndim = _spatial_dims(x)
        out_ch = self.output_channels or self.channels
        has_residual = self.output_channels is None

        h = make_norm(self.first_norm, self.channels, self.channels,
                      self.affine_norm, fuse_silu=True)(x)
        h = conv_layer(self.convolution_type, out_ch, self.kernel_size,
                       self.use_bias)(ndim)(h)

        if self.time_embed_dim is not None:
            assert te is not None
            yt = ResnetTimeBlock(
                self.time_embed_dim, out_ch,
                magnitude_preserving=(self.convolution_type == "mp"))(
                    te, ndim)
            yt = self._rescale_yt(yt, h)
            h = h + yt

        h = make_norm(self.second_norm, out_ch, out_ch,
                      self.affine_norm, fuse_silu=True)(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv_layer(self.convolution_type, out_ch, self.kernel_size,
                       self.use_bias)(ndim)(h)
        if has_residual:
            h = h + x
        if self.extra_residual is not None:
            h = h + self.extra_residual(x)
        return h

    @staticmethod
    def _rescale_yt(yt, y):
        yt_dims = yt.shape[1:-1]
        y_dims = y.shape[1:-1]
        if yt_dims == (1,) * len(y_dims) or yt_dims == y_dims:
            return yt
        factor = yt_dims[0] / y_dims[0]
        ndim = len(y_dims)
        if factor > 1:  # corner-pool downscale
            stride = int(factor)
            idx = (slice(None),) + (slice(None, None, stride),) * ndim
            return yt[idx]
        scale = int(1 / factor)
        return nearest_upsample(yt, scale)


class BatchDropout(nn.Module):
    """Drop whole batch elements (commonlayers.py:904-915)."""
    rate: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        if not train or self.rate == 0.0:
            return x
        key = self.make_rng("dropout")
        keep = jax.random.uniform(key, (x.shape[0],)) > self.rate
        keep = keep.reshape((x.shape[0],) + (1,) * (x.ndim - 1))
        return x * keep


class ConditionDrop(nn.Module):
    """CFG training: replace the condition embedding with a (learnable) null
    embedding with probability p per sample (commonlayers.py:1100-1127)."""
    rate: float
    hidden_dim: int
    null_is_learnable: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.null_is_learnable:
            null = self.param("null_embedding", nn.initializers.normal(1.0),
                              (1, self.hidden_dim))
        else:
            null = jnp.zeros((1, self.hidden_dim))
        if not train or self.rate == 0.0:
            return x
        key = self.make_rng("dropout")
        mask_shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        keep = jax.random.bernoulli(key, 1.0 - self.rate, mask_shape)
        return jnp.where(keep, x, null)
