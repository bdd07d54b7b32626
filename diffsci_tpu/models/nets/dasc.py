"""DASC: deep auto-encoder self-expressive clustering network.

Counterpart of the reference research net
(reference diffsci/models/nets/dasc_net.py:11-426, used in the video
anomaly study). A conv autoencoder whose latent codes are reconstructed by
a trainable self-expressive coefficient matrix C (zero diagonal): each
sample's code is expressed as a combination of the others', the signature
structure of subspace clustering.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


class DASCEncoder(nn.Module):
    channels: Sequence[int] = (16, 32)
    latent_dim: int = 32

    @nn.compact
    def __call__(self, x):
        ndim = x.ndim - 2
        h = x
        for ch in self.channels:
            h = nn.Conv(ch, (3,) * ndim, strides=(2,) * ndim,
                        padding="SAME")(h)
            h = nn.relu(h)
        h = h.reshape(h.shape[0], -1)
        return nn.Dense(self.latent_dim)(h)


class DASCDecoder(nn.Module):
    channels: Sequence[int] = (32, 16)
    out_shape: Sequence[int] = (16, 16, 1)

    @nn.compact
    def __call__(self, z):
        spatial = tuple(s // 2 ** len(self.channels)
                        for s in self.out_shape[:-1])
        h = nn.Dense(int(jnp.prod(jnp.asarray(spatial)))
                     * self.channels[0])(z)
        h = h.reshape((z.shape[0],) + spatial + (self.channels[0],))
        ndim = len(spatial)
        for ch in self.channels[1:]:
            h = nn.ConvTranspose(ch, (3,) * ndim, strides=(2,) * ndim,
                                 padding="SAME")(h)
            h = nn.relu(h)
        h = nn.ConvTranspose(self.out_shape[-1], (3,) * ndim,
                             strides=(2,) * ndim, padding="SAME")(h)
        return h


class DASC(nn.Module):
    """(dasc_net.py:306-426). n_samples fixes the self-expressive matrix
    size; forward returns (recon, recon_self_expressed, z, z_se, C)."""
    n_samples: int
    channels: Sequence[int] = (16, 32)
    latent_dim: int = 32
    out_shape: Sequence[int] = (16, 16, 1)

    @nn.compact
    def __call__(self, x):
        assert x.shape[0] == self.n_samples, (
            "DASC operates on a fixed batch of samples (the clustering "
            "cohort)")
        z = DASCEncoder(self.channels, self.latent_dim,
                        name="encoder")(x)
        C_raw = self.param("self_expressive",
                           nn.initializers.normal(1e-4),
                           (self.n_samples, self.n_samples))
        C = C_raw * (1.0 - jnp.eye(self.n_samples))  # zero diagonal
        z_se = C @ z
        decoder = DASCDecoder(self.channels[::-1], self.out_shape,
                              name="decoder")
        recon = decoder(z)
        recon_se = decoder(z_se)
        return recon, recon_se, z, z_se, C


def dasc_loss(model: DASC, variables, x,
              lambda_se: float = 1.0, lambda_reg: float = 1e-3):
    """recon + self-expressive recon + ||C||_F^2 (dasc_net.py losses)."""
    recon, recon_se, z, z_se, C = model.apply(variables, x)
    l_recon = jnp.mean((recon - x) ** 2)
    l_se_latent = jnp.mean((z_se - z) ** 2)
    l_se_recon = jnp.mean((recon_se - x) ** 2)
    l_reg = jnp.sum(C ** 2)
    total = (l_recon + lambda_se * (l_se_latent + l_se_recon)
             + lambda_reg * l_reg)
    return total, {"recon": l_recon, "se_latent": l_se_latent,
                   "se_recon": l_se_recon, "C_reg": l_reg}
