"""Magnitude-preserving (EDM2 forced-weight-norm) layers.

Redesign of the reference's normedlayers.py (reference
diffsci/models/nets/normedlayers.py:6-99). The reference mutates weights
in-place during the forward pass; in JAX the forward applies
``normalize(w) / sqrt(fan_in)`` functionally, and stored weights are
re-projected onto the sphere by an optax transform in the optimizer update
(see diffsci_tpu/models/karras/train.py) — mathematically equivalent and
side-effect free.

Magnitude-preserving parameters are named ``w_mp`` so the optimizer
transform can find them by tree path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

MP_PARAM_NAME = "w_mp"


def normalize(w: jnp.ndarray, eps: float = 1e-4,
              axis=None) -> jnp.ndarray:
    """Per-output-unit normalization (normedlayers.py:95-99): divide by the
    vector norm over all axes except the output axis, with the reference's
    alpha = sqrt(n_units / numel) scaling."""
    if axis is None:
        axis = tuple(range(w.ndim - 1))  # all but last (output features)
    n = jnp.sqrt(jnp.sum(w ** 2, axis=axis, keepdims=True))
    alpha = math.sqrt(n.size / w.size)
    return w / (eps + alpha * n)


class MagnitudePreservingDense(nn.Module):
    """(normedlayers.py:6-23)"""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        w = self.param(MP_PARAM_NAME, nn.initializers.normal(1.0),
                       (x.shape[-1], self.features))
        fan_in = x.shape[-1]
        w = normalize(w) / math.sqrt(fan_in)
        y = x @ w
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y


class MagnitudePreservingConv(nn.Module):
    """Dimension-agnostic mp conv, channels-last HWIO weights
    (normedlayers.py:26-92)."""
    features: int
    kernel_size: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        ndim = x.ndim - 2
        in_ch = x.shape[-1]
        kshape = (self.kernel_size,) * ndim + (in_ch, self.features)
        w = self.param(MP_PARAM_NAME, nn.initializers.normal(1.0), kshape)
        fan_in = in_ch * self.kernel_size ** ndim
        w = normalize(w) / math.sqrt(fan_in)
        dn = nn.linear._conv_dimension_numbers(x.shape)
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(1,) * ndim,
            padding="SAME",
            dimension_numbers=dn)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + b
        return y
