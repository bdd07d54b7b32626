"""DASC: Deep Aggregation Subspace Clustering network (video anomaly
research).

TPU-native redesign of the reference net
(reference diffsci/models/nets/dasc_net.py:11-426), channels-last, with
the reference's full four-module structure:

1. frame auto-encoder backbone (strided convs -> global pool -> latent;
   latent -> unflatten 4x4 -> transposed convs, dasc_net.py:116-181)
2. Video Modeling Module: learned-query multi-layer attention pooling of
   frame features into one video feature (dasc_net.py:182-229)
3. Self-Representation Module: a zero-diagonal coefficient matrix A with
   OA = A^T O — the subspace-clustering signature (dasc_net.py:232-263)
4. Feature Recovery Module: broadcast video features back per frame,
   optionally with frame-feature skip connections (dasc_net.py:266-303)

plus the two-stage loss (mse -> mse + l2 self-repr + l1 sparsity,
dasc_net.py:380-419). Cross-framework pinned with transferred weights in
tests/test_reference_parity9.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn
from jax import lax


class _TorchConvTranspose(nn.Module):
    """torch.nn.ConvTranspose semantics (stride s, padding p,
    output_padding op) as an input-dilated convolution: pad
    (k-1-p, k-1-p+op) per spatial dim, lhs_dilation=s. The kernel is
    stored [*k, I, O] already spatially FLIPPED relative to torch's
    [I, O, *k] (importers pre-convert w[..., ::-1, ::-1])."""
    features: int
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    output_padding: int = 1

    @nn.compact
    def __call__(self, x):
        ndim = x.ndim - 2
        k, p, op = self.kernel_size, self.padding, self.output_padding
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k,) * ndim + (x.shape[-1], self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        spatial = "DHW"[-ndim:]
        dn = (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")
        out = lax.conv_general_dilated(
            x, kernel, window_strides=(1,) * ndim,
            padding=((k - 1 - p, k - 1 - p + op),) * ndim,
            lhs_dilation=(self.stride,) * ndim,
            dimension_numbers=dn)
        return out + bias


@dataclasses.dataclass(frozen=True)
class DASCConfig:
    """(dasc_net.py:11-93)"""
    dimension: int = 2
    in_channels: int = 3
    frame_height: int = 48
    frame_width: int = 42
    frames_per_video: int = 10
    latent_dim: int = 128
    num_videos: int = 100
    num_clusters: int = 10
    encoder_channels: Sequence[int] = (32, 64, 128)
    kernel_size: int = 3
    stride: int = 2
    padding: int = 1
    vmm_hidden_dim: int = 128
    vmm_num_layers: int = 2
    srm_lambda1: float = 1.0
    srm_lambda2: float = 1.0
    dropout: float = 0.0
    use_skip_connections: bool = True

    def __post_init__(self):
        object.__setattr__(self, "encoder_channels",
                           tuple(self.encoder_channels))

    def export_description(self) -> dict[str, Any]:
        d = dataclasses.asdict(self)
        d["encoder_channels"] = list(self.encoder_channels)
        return d

    @classmethod
    def from_description(cls, description: dict):
        return cls(**description)


class AutoEncoderBackbone(nn.Module):
    """Frame-level conv AE (dasc_net.py:116-181). The decoder unflattens
    to 4^dimension spatial cells and upsamples by 2 per stage, so frames
    whose sides equal 4 * 2^len(encoder_channels) round-trip exactly —
    the reference papers over other sizes with a final AdaptiveAvgPool,
    reproduced here as a mean-pooling resize only when needed."""
    config: DASCConfig

    def setup(self):
        cfg = self.config
        k = (cfg.kernel_size,) * cfg.dimension
        s = (cfg.stride,) * cfg.dimension
        pad_c = [(cfg.padding, cfg.padding)] * cfg.dimension
        self.enc_convs = [nn.Conv(ch, k, strides=s, padding=pad_c,
                                  name=f"enc_conv_{i}")
                          for i, ch in enumerate(cfg.encoder_channels)]
        self.enc_out = nn.Dense(cfg.latent_dim, name="enc_out")
        rev = tuple(reversed(cfg.encoder_channels))
        self.dec_in = nn.Dense(rev[0] * 4 ** cfg.dimension, name="dec_in")
        self.dec_convs = [
            _TorchConvTranspose(ch, cfg.kernel_size, cfg.stride,
                                cfg.padding, output_padding=1,
                                name=f"dec_conv_{i}")
            for i, ch in enumerate(rev[1:])]
        self.dec_out = _TorchConvTranspose(cfg.in_channels,
                                           cfg.kernel_size, cfg.stride,
                                           cfg.padding, output_padding=1,
                                           name="dec_out")

    def encode(self, x):
        h = x
        for conv in self.enc_convs:
            h = nn.relu(conv(h))
        h = jnp.mean(h, axis=tuple(range(1, h.ndim - 1)))  # global pool
        return self.enc_out(h)

    def decode(self, z):
        cfg = self.config
        rev = tuple(reversed(cfg.encoder_channels))
        cells = (4,) * cfg.dimension
        h = nn.relu(self.dec_in(z))
        # torch's Unflatten is channels-first [C, 4, 4]; mirror exactly,
        # then move to channels-last
        h = h.reshape((z.shape[0], rev[0]) + cells)
        h = jnp.moveaxis(h, 1, -1)
        for conv in self.dec_convs:
            h = nn.relu(conv(h))
        h = self.dec_out(h)
        target = ((cfg.frame_height, cfg.frame_width)
                  if cfg.dimension == 2 else
                  (cfg.frame_height, cfg.frame_width, cfg.frame_width))
        if h.shape[1:-1] != target:
            import jax
            h = jax.image.resize(h, (h.shape[0],) + target + (h.shape[-1],),
                                 method="linear")
        return h

    def __call__(self, x):
        return self.decode(self.encode(x))


class VideoModelingModule(nn.Module):
    """Learned-query multi-layer attention pooling
    (dasc_net.py:182-229)."""
    config: DASCConfig

    @nn.compact
    def __call__(self, frame_features):
        cfg = self.config
        query = self.param("query", nn.initializers.normal(1.0),
                           (1, cfg.latent_dim))
        B = frame_features.shape[0]
        q = jnp.broadcast_to(query, (B, cfg.latent_dim))
        scores = jnp.einsum("bfd,bd->bf", frame_features, q)
        attn = nn.softmax(scores, axis=-1)
        video = jnp.einsum("bf,bfd->bd", attn, frame_features)
        for i in range(cfg.vmm_num_layers - 1):
            q = jnp.tanh(nn.Dense(cfg.latent_dim,
                                  name=f"attn_layer_{i}")(video))
            scores = jnp.einsum("bfd,bd->bf", frame_features, q)
            attn = nn.softmax(scores, axis=-1)
            video = jnp.einsum("bf,bfd->bd", attn, frame_features)
        return video, attn


class SelfRepresentationModule(nn.Module):
    """Zero-diagonal coefficient matrix A; OA = A^T O
    (dasc_net.py:232-263)."""
    config: DASCConfig

    @nn.compact
    def __call__(self, O):
        n = self.config.num_videos
        W = self.param("A", nn.initializers.xavier_uniform(), (n, n))
        A = W - jnp.diag(jnp.diag(W))
        return A.T @ O, A


class DASC(nn.Module):
    """(dasc_net.py:306-378). x: [B(videos), frames, *spatial, C]
    channels-last; returns the reference's output dict."""
    config: DASCConfig

    def setup(self):
        self.auto_encoder = AutoEncoderBackbone(self.config)
        self.vmm = VideoModelingModule(self.config)
        self.srm = SelfRepresentationModule(self.config)
        if not self.config.use_skip_connections:
            self.frm_transform = nn.Dense(self.config.latent_dim)

    def __call__(self, x, all_videos_mode: bool = False):
        cfg = self.config
        B, F = x.shape[0], x.shape[1]
        flat = x.reshape((B * F,) + x.shape[2:])
        frame_flat = self.auto_encoder.encode(flat)
        frame_features = frame_flat.reshape(B, F, -1)
        video_features, attn = self.vmm(frame_features)
        out = {"frame_features": frame_features,
               "video_features": video_features,
               "attention_weights": attn}
        if all_videos_mode:
            self_repr, A = self.srm(video_features)
            out["coefficient_matrix"] = A
            out["self_represented_features"] = self_repr
            pooled = self_repr
        else:
            pooled = video_features
        # Feature Recovery Module (dasc_net.py:266-303)
        replicated = jnp.broadcast_to(pooled[:, None],
                                      (B, F, cfg.latent_dim))
        if cfg.use_skip_connections:
            recovered = replicated + frame_features
        else:
            recovered = self.frm_transform(replicated)
        rec = self.auto_encoder.decode(
            recovered.reshape(B * F, cfg.latent_dim))
        out["reconstructed"] = rec.reshape((B, F) + rec.shape[1:])
        return out

    def export_description(self) -> dict:
        return {"config": self.config.export_description(),
                "model_type": "DASC"}


def dasc_loss(config: DASCConfig, outputs, original, stage: str = "second"):
    """Two-stage loss (dasc_net.py:380-419): stage 'first' = frame MSE
    only; 'second' adds ||O - OA||^2 (srm_lambda2) and ||A||_1
    (srm_lambda1)."""
    losses = {}
    mse = jnp.mean((outputs["reconstructed"] - original) ** 2)
    losses["mse"] = mse
    total = mse
    if stage == "second" and "coefficient_matrix" in outputs:
        self_repr = jnp.mean((outputs["self_represented_features"]
                              - outputs["video_features"]) ** 2)
        sparsity = jnp.sum(jnp.abs(outputs["coefficient_matrix"]))
        losses["self_repr"] = self_repr
        losses["sparsity"] = sparsity
        total = (mse + config.srm_lambda2 * self_repr
                 + config.srm_lambda1 * sparsity)
    losses["total"] = total
    return total, losses
