"""Autoencoder wrappers: channel expand/squeeze adapters and the
``load_autoencoder`` factory.

TPU-native counterpart of the reference wrappers
(reference diffsci/models/nets/autoencoders.py:7-231), which adapt
3-channel RGB VAEs (HF diffusers SD-VAE 'kl1', TAESD 'tiny1', and the
in-house 'our_kl') to grayscale/multi-channel scientific data by channel
expansion on encode and squeeze on decode, optionally encoding channels
independently.

This build's equivalents wrap any KL autoencoder exposing the framework's
autoencoder protocol. HF diffusers is not vendored into the TPU image;
``load_autoencoder('kl1' | 'tiny1')`` raises with guidance (use the torch
layout importers in diffsci_tpu.extra.converters to bring SD-VAE weights
into our AutoencoderKL), while 'our_kl' builds the in-house KL-VAE.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from diffsci_tpu.models.nets.vae import AutoencoderKL, DDConfig


class ChannelAdapterWrapper:
    """Channel expand/squeeze around a bound 3-channel autoencoder
    (autoencoders.py:7-72). Channels-last: the channel axis is -1.

    channels: number of data channels presented to the 3-channel VAE
    (1: broadcast to RGB, 2: zero-pad, 3: pass-through).
    independent_channels: encode each data channel separately and
    concatenate latents (autoencoders.py:47-56).
    """

    def __init__(self, autoencoder, channels: int = 1,
                 independent_channels: bool = False,
                 data_channels: int = 1,
                 latent_channels: int = 4):
        self.autoencoder = autoencoder
        self.channels = channels
        self.independent_channels = independent_channels
        self.data_channels = data_channels
        self.latent_channels = latent_channels

    def expand_channels(self, x):
        if self.channels == 1:
            return jnp.broadcast_to(x, x.shape[:-1] + (3,))
        if self.channels == 2:
            pad = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
            return jnp.concatenate([x, pad], axis=-1)
        if self.channels == 3:
            return x
        raise ValueError(f"Invalid number of channels: {self.channels}")

    def squeeze_channels(self, x):
        if self.channels == 1:
            return jnp.mean(x, axis=-1, keepdims=True)
        if self.channels == 2:
            return x[..., :2]
        if self.channels == 3:
            return x
        raise ValueError(f"Invalid number of channels: {self.channels}")

    def encode(self, x, key=None, y=None):
        if self.independent_channels:
            outs = []
            for ch in range(self.data_channels):
                sub = None if key is None else jax.random.fold_in(key, ch)
                outs.append(self.autoencoder.encode(
                    self.expand_channels(x[..., ch:ch + 1]), key=sub))
            return jnp.concatenate(outs, axis=-1)
        return self.autoencoder.encode(self.expand_channels(x), key=key)

    def decode(self, z, y=None):
        if self.independent_channels:
            lc = self.latent_channels
            outs = []
            for ch in range(self.data_channels):
                dec = self.autoencoder.decode(z[..., lc * ch:lc * (ch + 1)])
                outs.append(self.squeeze_channels(dec))
            return jnp.concatenate(outs, axis=-1)
        return self.squeeze_channels(self.autoencoder.decode(z))

    def __call__(self, x, key=None):
        return self.decode(self.encode(x, key=key))


def load_autoencoder(name: str = "our_kl", **kwargs) -> Any:
    """Factory (autoencoders.py:201-231).

    - 'our_kl': in-house AutoencoderKL module + DDConfig from kwargs
      (returns the unbound module; bind with
      diffsci_tpu.models.vae.BoundAutoencoder after training/loading).
    - 'kl1' / 'tiny1': HF diffusers VAEs — not available in this image;
      import their torch weights with
      diffsci_tpu.extra.converters.import_torch_state_dict instead.
    """
    if name == "our_kl":
        dd = DDConfig(**kwargs.pop("ddconfig", {}))
        return AutoencoderKL(dd, **kwargs)
    if name in ("kl1", "tiny1"):
        raise NotImplementedError(
            f"autoencoder '{name}' wraps an HF diffusers model, which is "
            "not vendored in this environment. Convert its torch weights "
            "into diffsci_tpu.models.nets.AutoencoderKL with "
            "diffsci_tpu.extra.converters.import_torch_state_dict, then "
            "wrap with ChannelAdapterWrapper.")
    raise ValueError(f"Unknown autoencoder: {name!r}")
