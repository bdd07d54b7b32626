"""Grid-of-cubes volume synthesis by inpainting: generate arbitrarily large
volumes by sampling overlapping cubes in a parity-ordered grid, inpainting
each new cube against already-generated neighbors (with optional periodic
wrap).

TPU-native redesign of the reference
(reference diffsci/extra/fillinginpainting.py:10-440). Channels-last:
volumes are [1, X, Y, Z, C]; slicing uses the functional periodic
getitem/setitem utilities. The eight-way parity generation order
(fillinginpainting.py:10-127) is produced by one loop over parity patterns
instead of eight copy-pasted blocks.
"""

from __future__ import annotations

import itertools
from typing import Literal, Optional

import numpy as np
import jax
import jax.numpy as jnp

from diffsci_tpu.utils import periodic_getitem, periodic_setitem


def get_grid_generation_order(grid_map):
    """Positions ordered by coordinate parity pattern (all-even corners
    first), lexicographic within each pattern
    (fillinginpainting.py:10-127). Returns (positions, corner_count)."""
    nx, ny, nz = grid_map
    positions = []
    corner_count = 0
    for parity in itertools.product((0, 1), repeat=3):
        pattern = sorted(
            (i, j, k)
            for i in range(parity[0], nx, 2)
            for j in range(parity[1], ny, 2)
            for k in range(parity[2], nz, 2))
        if parity == (0, 0, 0):
            corner_count = len(pattern)
        positions.extend(pattern)
    return positions, corner_count


def get_cube_spatial_bounds(grid_pos, base_spatial, overlap_size: int,
                            final_spatial, periodicity):
    """Extended (overlapping) slice bounds of the cube at grid_pos
    (fillinginpainting.py:129-187)."""
    half = overlap_size // 2
    slices = []
    for pos, base, final, per in zip(grid_pos, base_spatial, final_spatial,
                                     periodicity):
        start = pos * base - half
        end = start + base + overlap_size
        if not per:
            start = max(0, start)
            end = min(final, end)
        else:
            start = start % final
            end = end % final
        slices.append(slice(start, end))
    return tuple(slices)


def build_inpaint_mask(grid_pos, generated_positions, base_spatial,
                       overlap_size: int, final_spatial, channels: int,
                       periodicity):
    """Mask = 1 where previously generated cubes cover the current cube's
    extended window (fillinginpainting.py:189-245). Channels-last."""
    ext = [b + overlap_size for b in base_spatial]
    temp = jnp.zeros(tuple(final_spatial) + (channels,))
    ones = jnp.ones(tuple(ext) + (channels,))
    for prev in generated_positions:
        pb = get_cube_spatial_bounds(prev, base_spatial, overlap_size,
                                     final_spatial, periodicity)
        # the write window may be clamped at non-periodic boundaries
        sizes = [_span_len(s, f) for s, f in zip(pb, final_spatial)]
        temp = periodic_setitem(
            temp, ones[tuple(slice(0, n) for n in sizes)], *pb)
    cur = get_cube_spatial_bounds(grid_pos, base_spatial, overlap_size,
                                  final_spatial, periodicity)
    return jnp.clip(periodic_getitem(temp, *cur), 0, 1)


def _span_len(s: slice, size: int) -> int:
    start, stop = s.start, s.stop
    return (stop - start) if stop >= start else (size - start + stop)


def sample_grid_volume(flow_model, variables, key,
                       grid_map, base_shape, overlap_size: int,
                       y=None, guidance: float = 1.0, nsteps: int = 30,
                       integrate_on_sigma: bool = False,
                       noise_injection: bool = False,
                       blend_mode: Literal["latest"] = "latest",
                       periodicity=(False, False, False),
                       mask_falloff: int = 0,
                       resample_steps: int = 0,
                       noise_cube=None):
    """Tile a [1, X, Y, Z, C] volume from overlapping cubes
    (fillinginpainting.py:298-440).

    flow_model: an SIModel (sample / inpaint with orig_noise support).
    base_shape: (dx, dy, dz, C) channels-last cube shape.
    y: None, one condition dict (shared), or a numpy object array of
    condition dicts shaped like grid_map.
    """
    base_spatial = list(base_shape[:-1])
    channels = base_shape[-1]
    if isinstance(y, dict) or y is None:
        y_grid = np.empty(tuple(grid_map), dtype=object)
        y_grid[...] = [ [ [y for _ in range(grid_map[2])]
                          for _ in range(grid_map[1])]
                        for _ in range(grid_map[0])]
        y = y_grid
    final_spatial = [b * g for b, g in zip(base_spatial, grid_map)]
    for d in range(3):
        if periodicity[d] and grid_map[d] % 2 != 0:
            raise ValueError(
                f"Grid map for dimension {d} is not even, but periodicity "
                "is True")

    key, knoise = jax.random.split(key)
    if noise_cube is None:
        noise_cube = jax.random.normal(
            knoise, (1,) + tuple(final_spatial) + (channels,))
    else:
        # fixed big-noise-cube replay (cross-framework parity hook)
        noise_cube = jnp.asarray(noise_cube)
    volume = jnp.zeros_like(noise_cube)

    order, corner_count = get_grid_generation_order(grid_map)
    generated: set = set()

    for grid_ind, grid_pos in enumerate(order):
        bounds = get_cube_spatial_bounds(grid_pos, base_spatial,
                                         overlap_size, final_spatial,
                                         periodicity)
        noise_slice = periodic_getitem(noise_cube[0], *bounds)[None]
        ext_shape = noise_slice.shape[1:]
        y_pos = y[grid_pos[0], grid_pos[1], grid_pos[2]]
        key, sub = jax.random.split(key)

        if grid_ind < corner_count:
            cube = flow_model.sample(
                variables, sub, 1, ext_shape, y=y_pos, guidance=guidance,
                nsteps=nsteps, is_latent_shape=True,
                integrate_on_sigma=integrate_on_sigma,
                noise_injection=noise_injection,
                orig_noise=noise_slice, return_latents=True)
        else:
            mask = build_inpaint_mask(grid_pos, generated, base_spatial,
                                      overlap_size, final_spatial,
                                      channels, periodicity)
            x_orig = periodic_getitem(volume[0], *bounds)
            cube = flow_model.inpaint(
                variables, sub, x_orig, mask, nsamples=1, y=y_pos,
                guidance=guidance, nsteps=nsteps,
                integrate_on_sigma=integrate_on_sigma,
                mask_falloff=mask_falloff,
                resample_steps=resample_steps,
                orig_noise=noise_slice)

        if blend_mode != "latest":
            raise ValueError(f"Unknown blend_mode: {blend_mode}")
        volume = periodic_setitem(volume[0], cube[0], *bounds)[None]
        generated.add(grid_pos)
    return volume
