"""Minimal ResNet classifier for guidance/evaluation.

TPU-native counterpart of the reference classifiers
(reference diffsci/models/nets/classifiers.py:4-88). Channels-last;
``dimension`` selects 1/2/3D convolutions (classifiers.py:57-66).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class ClassifierResBlock(nn.Module):
    """norm-silu-conv x2 + residual (classifiers.py:4-31)."""
    channels: int
    kernel_size: int = 3
    num_groups: int = 8
    dimension: int = 2

    @nn.compact
    def __call__(self, x):
        g = min(self.num_groups, self.channels)
        while self.channels % g != 0:
            g -= 1
        k = (self.kernel_size,) * self.dimension
        h = nn.GroupNorm(num_groups=g)(x)
        h = nn.silu(h)
        h = nn.Conv(self.channels, k, padding="SAME")(h)
        h = nn.GroupNorm(num_groups=g)(h)
        h = nn.silu(h)
        h = nn.Conv(self.channels, k, padding="SAME")(h)
        return x + h


class MinimalResNet(nn.Module):
    """conv-in -> N res blocks -> global pool -> linear head
    (classifiers.py:34-88). ``features`` exposes the pooled trunk for use
    as an FID/KID feature extractor (diffsci_tpu.metrics)."""
    in_channels: int = 1
    out_classes: int = 1
    model_channels: int = 32
    n_layers: int = 8
    dimension: int = 2
    kernel_size: int = 3
    num_groups: int = 8

    def setup(self):
        k = (self.kernel_size,) * self.dimension
        self.in_conv = nn.Conv(self.model_channels, k, padding="SAME")
        self.res_blocks = [
            ClassifierResBlock(self.model_channels, self.kernel_size,
                               self.num_groups, self.dimension,
                               name=f"block_{i}")
            for i in range(self.n_layers)]
        self.out = nn.Dense(self.out_classes)

    def features(self, x):
        h = self.in_conv(x)
        for block in self.res_blocks:
            h = block(h)
        return jnp.mean(h, axis=tuple(range(1, h.ndim - 1)))

    def __call__(self, x, train: bool = False):
        return self.out(self.features(x))
