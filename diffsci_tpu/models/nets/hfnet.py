"""HFNet: the reference's convenience UNet family, natively.

The reference's HFNet (reference diffsci/models/nets/hfnet.py:9-100) wraps
HuggingFace ``diffusers.UNet2DModel``: a ``block_channels`` list defines the
down/up pyramid, conditioning enters by channel concatenation, and
``attn_up_and_down`` toggles attention blocks in the resampling path
(hfnet.py:27-34: ``['DownBlock2D'] + ['AttnDownBlock2D'] * (n-1)`` and the
mirror-image up list). ``diffusers`` is not vendored in this image, so these
classes present the SAME constructor and call surface on top of
``ddpm_unet.UNet2D`` — a native implementation of the same published
architecture. ``extra/converters.import_diffusers_unet2d`` imports real
``UNet2DModel`` checkpoints.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import flax.linen as nn

from diffsci_tpu.models.nets.ddpm_unet import UNet2D


def _attn_flags(n: int, attn_up_and_down: bool):
    """hfnet.py:27-34: attention in every resampling block except the
    outermost (first down / last up)."""
    if attn_up_and_down:
        return (False,) + (True,) * (n - 1), (True,) * (n - 1) + (False,)
    return (False,) * n, (False,) * n


class HFNet(nn.Module):
    """Unconditional-signature UNet (hfnet.py:9-57): __call__(x, t).
    ``cond_channels`` widens the input for channel-concat conditioning
    (the caller concatenates, as in the reference's usage)."""
    block_channels: Sequence[int] = (64, 128, 256)
    channels: int = 1
    cond_channels: int = 0
    norm_num_groups: int = 32
    dropout: float = 0.0
    attn_up_and_down: bool = False
    attn_backend: str = "xla"

    def setup(self):
        attn_down, attn_up = _attn_flags(len(self.block_channels),
                                         self.attn_up_and_down)
        self.unet = UNet2D(
            block_out_channels=tuple(self.block_channels),
            in_channels=self.channels + self.cond_channels,
            out_channels=self.channels,
            attn_down=attn_down, attn_up=attn_up,
            norm_num_groups=self.norm_num_groups,
            dropout=self.dropout, backend=self.attn_backend)

    def __call__(self, x, t=None, y: Optional[jnp.ndarray] = None,
                 train: bool = False):
        # framework net convention (x, t, y, train): a provided y is
        # channel-concatenated, matching the reference's usage where the
        # caller concatenates before HFNet.forward (hfnet.py:45-57)
        if y is not None:
            x = jnp.concatenate([x, y], axis=-1)
        return self.unet(x, t, train=train)

    def export_description(self):
        from diffsci_tpu.models.nets.describe import plain_module_description
        return plain_module_description(self, "hfnet")


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
    attn_backend: str = "xla"

    def setup(self):
        attn_down, attn_up = _attn_flags(len(self.block_channels),
                                         self.attn_up_and_down)
        self.unet = UNet2D(
            block_out_channels=tuple(self.block_channels),
            in_channels=self.channels + self.cond_channels,
            out_channels=self.channels,
            attn_down=attn_down, attn_up=attn_up,
            norm_num_groups=self.norm_num_groups,
            dropout=self.dropout, backend=self.attn_backend)

    def __call__(self, x, t, y: Optional[jnp.ndarray] = None,
                 train: bool = False):
        if y is None:
            raise ValueError("HFNetCond requires conditioning y")
        return self.unet(jnp.concatenate([x, y], axis=-1), t, train=train)

    def export_description(self):
        from diffsci_tpu.models.nets.describe import plain_module_description
        return plain_module_description(self, "hfnet_cond")
