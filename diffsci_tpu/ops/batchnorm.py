"""EDM batch normalizers: whiten data into sigma_data scale before diffusion.

Functional redesign of the reference's aux batch norms (reference
diffsci/models/aux_scripts/batchnorm.py:4-206). Running statistics live in
the flax ``batch_stats`` collection and are updated when the collection is
marked mutable (training); inference uses the stored stats. Channels-last:
the channel axis is -1.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn


class DimensionAgnosticBatchNorm(nn.Module):
    """Per-channel running-stat normalizer that also rescales to ``sigma``
    (batchnorm.py:86-171). ``num_channels=None`` uses scalar stats."""
    num_channels: int | None = None
    eps: float = 1e-5
    affine: bool = False
    momentum: float = 0.1
    sigma: float = 1.0

    @nn.compact
    def __call__(self, x, use_running_stats: bool = True):
        nc = self.num_channels if self.num_channels is not None else 1
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((nc,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((nc,)))
        axes = tuple(range(x.ndim - 1)) if self.num_channels is not None \
            else tuple(range(x.ndim))
        if not use_running_stats:
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)
            mean_b = jnp.broadcast_to(jnp.atleast_1d(mean), (nc,))
            var_b = jnp.broadcast_to(jnp.atleast_1d(var), (nc,))
            if not self.is_initializing():
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean_b)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * var_b)
        else:
            mean = ra_mean.value
            var = ra_var.value
        x = (x - mean) / jnp.sqrt(var + self.eps)
        if self.affine:
            w = self.param("scale", nn.initializers.ones, (nc,))
            b = self.param("bias", nn.initializers.zeros, (nc,))
            x = x * w + b
        return x * self.sigma

    def unnormalize(self, variables, x):
        """Host-side inverse using stored stats (batchnorm.py:150-171)."""
        stats = variables["batch_stats"]
        x = x / self.sigma
        if self.affine:
            p = variables["params"]
            x = (x - p["bias"]) / p["scale"]
        return x * jnp.sqrt(stats["var"] + self.eps) + stats["mean"]


class ConstantBatchNorm:
    """normalize = x / sigma (batchnorm.py:174-189)."""

    def __init__(self, sigma: float = 1.0):
        self.sigma = sigma

    def normalize(self, x):
        return x / self.sigma

    def unnormalize(self, x):
        return x * self.sigma


class IdentityBatchNorm:
    """(batchnorm.py:192-206)"""

    def normalize(self, x):
        return x

    def unnormalize(self, x):
        return x
