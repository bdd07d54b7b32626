"""HFNet: the reference's convenience UNet family, natively.

The reference's HFNet (reference diffsci/models/nets/hfnet.py:9-100) wraps
HuggingFace ``diffusers.UNet2DModel``: a ``block_channels`` list defines the
down/up pyramid, conditioning enters by channel concatenation, and
``attn_up_and_down`` toggles attention blocks in the resampling path.
``diffusers`` is not vendored in this image, so these classes present the
SAME constructor and call surface on top of the in-house PUNetG — a user of
the reference's HFNet gets the same knobs and shapes with a TPU-native net
underneath.

Mapping:
- ``block_channels=[c0, c1, ...]`` -> PUNetG ``model_channels=c0`` with
  ``channel_expansion=[c1/c0, ...]`` (ratios must be integral, as they are
  in every reference use),
- conditioning: y concatenated on the channel axis (hfnet.py:100) — the
  PUNetGCond pattern,
- ``attn_up_and_down=True``: the nearest PUNetG analogue enables the
  self-attention bottleneck stack (diffusers puts attention inside the
  resampling blocks; PUNetG concentrates it at the lowest resolution where
  the sequence is short — the MXU-friendly placement).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from diffsci_tpu.models.nets.punetg import PUNetG, PUNetGConfig


def _config_from_block_channels(block_channels: Sequence[int],
                                channels: int, cond_channels: int,
                                norm_num_groups: int, dropout: float,
                                attn_up_and_down: bool) -> PUNetGConfig:
    c0 = block_channels[0]
    expansion = []
    for c in block_channels[1:]:
        if c % c0:
            raise ValueError(
                f"block_channels {list(block_channels)} are not integral "
                f"multiples of the base width {c0}")
        expansion.append(c // c0)
    n_attn = 2 if attn_up_and_down else 1
    return PUNetGConfig(
        model_channels=c0,
        channel_expansion=expansion or [1],
        input_channels=channels + cond_channels,
        output_channels=channels,
        number_resnet_downward_block=2,
        number_resnet_upward_block=2,
        number_resnet_attn_block=n_attn,
        number_resnet_before_attn_block=1,
        number_resnet_after_attn_block=1,
        num_groups=norm_num_groups,
        dropout=dropout)


class HFNet(nn.Module):
    """Unconditional-signature UNet (hfnet.py:9-57): __call__(x, t)."""
    block_channels: Sequence[int] = (64, 128, 256)
    channels: int = 1
    cond_channels: int = 0
    norm_num_groups: int = 32
    dropout: float = 0.0
    attn_up_and_down: bool = False

    def setup(self):
        self.unet = PUNetG(_config_from_block_channels(
            self.block_channels, self.channels, self.cond_channels,
            self.norm_num_groups, self.dropout, self.attn_up_and_down))

    def __call__(self, x, t, train: bool = False):
        return self.unet(x, t, train=train)


class HFNetUncond(HFNet):
    """(hfnet.py:60-71)"""
    cond_channels: int = 0


class HFNetCond(nn.Module):
    """Channel-concat conditioned variant (hfnet.py:74-100):
    __call__(x, t, y) with y of shape [B, *spatial, cond_channels]."""
    block_channels: Sequence[int] = (64, 128, 256)
    channels: int = 1
    cond_channels: int = 1
    norm_num_groups: int = 32
    dropout: float = 0.0
    attn_up_and_down: bool = False

    def setup(self):
        self.unet = PUNetG(_config_from_block_channels(
            self.block_channels, self.channels, self.cond_channels,
            self.norm_num_groups, self.dropout, self.attn_up_and_down))

    def __call__(self, x, t, y: Optional[jnp.ndarray] = None,
                 train: bool = False):
        if y is None:
            raise ValueError("HFNetCond requires conditioning y")
        return self.unet(jnp.concatenate([x, y], axis=-1), t, train=train)
