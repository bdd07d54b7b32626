"""Sequential z-stacking volume synthesis with cosine blending.

TPU-native counterpart of the reference sequential inpainting
(reference diffsci/extra/sequentialinpainting.py:37-330): extend a volume
along z by generating overlapping blocks; each new block is inpainted
against the previous block's overlap and stitched with cosine blending.

Channels-last: blocks are [dx, dy, dz, C]; the stacking axis is the THIRD
spatial axis (index 2), matching the reference's z-last spatial order.
"""

from __future__ import annotations

from typing import Literal

import numpy as np
import jax
import jax.numpy as jnp


def create_cosine_blend_weights(overlap_size: int):
    """0 -> 1 cosine ramp over the overlap (sequentialinpainting.py:37-56)."""
    t = jnp.linspace(0.0, 1.0, overlap_size)
    return (1 - jnp.cos(jnp.pi * t)) / 2


def build_inpaint_mask_sequential(block_spatial, channels: int,
                                  overlap_size: int):
    """Mask = 1 on the first overlap_size voxels along z
    (sequentialinpainting.py:58-81)."""
    mask = jnp.zeros(tuple(block_spatial) + (channels,))
    return mask.at[:, :, :overlap_size].set(1.0)


def sample_sequential_z(flow_model, variables, key,
                        num_blocks: int, base_shape, overlap_size: int,
                        y=None, guidance: float = 1.0, nsteps: int = 30,
                        integrate_on_sigma: bool = False,
                        noise_injection: bool = True,
                        blend_mode: Literal["cosine", "latest"] = "cosine",
                        mask_falloff: int = 0,
                        resample_steps: int = 0):
    """Generate [1, dx, dy, num_blocks*dz, C] by sequential z inpainting
    (sequentialinpainting.py:83-330). base_shape = (dx, dy, dz, C)."""
    if num_blocks < 1:
        raise ValueError("num_blocks must be at least 1")
    if overlap_size < 0:
        raise ValueError("overlap_size must be non-negative")
    if overlap_size % 2 != 0:
        raise ValueError("overlap_size must be even")
    dx, dy, dz, channels = base_shape
    if overlap_size >= dz:
        raise ValueError(
            "overlap_size must be less than base block z-dimension")
    half = overlap_size // 2

    if isinstance(y, dict) or y is None:
        conditions = [y] * num_blocks
    else:
        conditions = list(y)
    if len(conditions) != num_blocks:
        raise ValueError(
            f"Expected {num_blocks} conditions, got {len(conditions)}")

    final_dz = dz * num_blocks
    volume = jnp.zeros((1, dx, dy, final_dz, channels))
    prev_block = None

    for i in range(num_blocks):
        is_first = i == 0
        is_last = i == num_blocks - 1
        if num_blocks == 1:
            ext_dz = dz
        elif is_first or is_last:
            ext_dz = dz + half
        else:
            ext_dz = dz + overlap_size
        ext_shape = (dx, dy, ext_dz, channels)
        z0 = i * dz
        z1 = z0 + dz
        key, sub = jax.random.split(key)

        if is_first:
            block = flow_model.sample(
                variables, sub, 1, ext_shape, y=conditions[i],
                guidance=guidance, nsteps=nsteps, is_latent_shape=True,
                integrate_on_sigma=integrate_on_sigma,
                noise_injection=noise_injection, return_latents=True)[0]
            volume = volume.at[0, :, :, z0:z1].set(block[:, :, :dz])
        else:
            overlap_prev = prev_block[:, :, -overlap_size:]
            x_orig = jnp.zeros(ext_shape)
            x_orig = x_orig.at[:, :, :overlap_size].set(overlap_prev)
            mask = build_inpaint_mask_sequential((dx, dy, ext_dz), channels,
                                                 overlap_size)
            block = flow_model.inpaint(
                variables, sub, x_orig, mask, nsamples=1, y=conditions[i],
                guidance=guidance, nsteps=nsteps,
                integrate_on_sigma=integrate_on_sigma,
                mask_falloff=mask_falloff,
                resample_steps=resample_steps)[0]
            ov0 = z0 - half
            ov1 = z0 + half
            if blend_mode == "cosine":
                w = create_cosine_blend_weights(overlap_size).reshape(
                    1, 1, overlap_size, 1)
                current = volume[0, :, :, ov0:ov1]
                new = block[:, :, :overlap_size]
                volume = volume.at[0, :, :, ov0:ov1].set(
                    current * (1 - w) + new * w)
                volume = volume.at[0, :, :, ov1:z1].set(
                    block[:, :, overlap_size:overlap_size + (z1 - ov1)])
            elif blend_mode == "latest":
                volume = volume.at[0, :, :, ov0:z1].set(
                    block[:, :, :half + dz])
            else:
                raise ValueError(f"Unknown blend_mode: {blend_mode}")
        prev_block = block
    return volume
