"""Exact tiled / distributed VAE decode for volumes too large to decode in
one shot.

TPU-native redesign of the reference's chunked decode
(reference diffsci/extra/chunk_decode.py:1-920, "Strategy B": multi-stage
halo-propagating streaming with CPU stage buffers and periodic BCs). Two
implementations, both exact for convolutional decoders:

- ``tiled_decode``: single-device memory-bounded decode. Host loop over
  tiles; each tile reads its latent window plus a full-receptive-field halo
  (with periodic wrap), decodes through the whole network, and writes back
  only the valid center. Simpler than the reference's per-stage halo
  propagation (one halo for the whole decoder trades a little redundant
  compute for a lot less machinery) and equally exact.
- ``halo_shard_decode``: the ICI-native version — shard the latent volume
  over a spatial mesh axis with ``shard_map``; each device pulls its halo
  from ring neighbors with ``jax.lax.ppermute`` (periodic wrap comes free
  from the ring topology), decodes its shard, and crops. This replaces the
  reference's CPU staging with inter-chip DMA.

Exactness contract (same as the reference, chunk_decode.py:150-154): the
decoder must be local — no mid attention, no attention resolutions. Note
that spatially-reducing GroupNorm is tile-dependent in both the reference
and here; use norms without full-spatial reductions for bit-exact tiling.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def decoder_halo_radius(config) -> int:
    """Full receptive-field radius of the LDM VAEDecoder in LATENT units
    (the analogue of the reference's cumulative radii,
    chunk_decode.py:135-177).

    Each 3x3 conv adds radius 1 at its own resolution = 1/scale latent
    units; upsampling doubles the scale.
    """
    if config.has_mid_attn or len(config.attn_resolutions) > 0:
        raise NotImplementedError(
            "exact tiled decode requires a decoder without attention "
            "(set has_mid_attn=False, attn_resolutions=())")
    r = 0.0
    scale = 1.0
    r += 1.0                      # conv_in
    r += 2 * 2                    # mid: two resblocks, two 3x3 convs each
    n_res = len(config.ch_mult)
    for i_level in reversed(range(n_res)):
        r += 2 * (config.num_res_blocks + 1) / scale
        if i_level != 0:
            scale *= 2            # upsample
    r += 1.0 / scale              # conv_out
    return math.ceil(r)


def upscale_factor(config) -> int:
    return 2 ** (len(config.ch_mult) - 1)


def tiled_decode(decode_fn: Callable, z, chunk: Sequence[int],
                 halo: int, upscale: int, periodic: bool = True):
    """Decode latent z = [B, *spatial, C] tile-by-tile.

    decode_fn: full decoder, [B, *tile_spatial, C] -> [B, *tile_spatial*u,
    C_out]. ``chunk``: tile size per spatial dim (latent units). ``halo``:
    latent-unit halo radius (use ``decoder_halo_radius``). Writes results
    into a host numpy buffer so device memory stays bounded by one tile.
    """
    spatial = z.shape[1:-1]
    ndim = len(spatial)
    assert len(chunk) == ndim
    B = z.shape[0]

    # probe output channels with a minimal tile
    out_shape = None
    out = None

    def spans(L, c):
        return [(s, min(s + c, L)) for s in range(0, L, c)]

    grids = [spans(L, c) for L, c in zip(spatial, chunk)]

    import itertools
    for tile in itertools.product(*grids):
        # read window with halo (wrap or clamp)
        idx_per_dim = []
        for (lo, hi), L in zip(tile, spatial):
            ids = np.arange(lo - halo, hi + halo)
            ids = ids % L if periodic else np.clip(ids, 0, L - 1)
            idx_per_dim.append(ids)
        window = z
        for d, ids in enumerate(idx_per_dim):
            window = jnp.take(window, ids, axis=1 + d)
        decoded = decode_fn(window)
        decoded = np.asarray(decoded)
        if out is None:
            c_out = decoded.shape[-1]
            out_shape = (B,) + tuple(u * L for u, L in
                                     zip([upscale] * ndim, spatial)) + (c_out,)
            out = np.zeros(out_shape, decoded.dtype)
        # crop the valid center and write back
        crop = [slice(None)]
        dest = [slice(None)]
        for (lo, hi), L in zip(tile, spatial):
            crop.append(slice(halo * upscale,
                              halo * upscale + (hi - lo) * upscale))
            dest.append(slice(lo * upscale, hi * upscale))
        crop.append(slice(None))
        dest.append(slice(None))
        out[tuple(dest)] = decoded[tuple(crop)]
    return jnp.asarray(out)


def halo_shard_decode(decode_fn: Callable, z, mesh: Mesh,
                      axis_name: str = "spatial", halo: int = 8,
                      upscale: int = 4):
    """Distributed decode: shard z's first spatial axis over ``axis_name``,
    exchange halos over the ring with ppermute, decode per shard, crop.

    Periodic boundary conditions arise naturally from the ring topology —
    the ICI-native analogue of the reference's periodic CPU staging
    (chunk_decode.py:13-16).

    z: [B, H, *rest, C] with H divisible by the mesh axis size.
    """
    n = mesh.shape[axis_name]
    H = z.shape[1]
    assert H % n == 0, f"H={H} must divide the mesh axis ({n})"
    assert H // n >= halo, "shard smaller than halo"

    def local(z_shard):
        # z_shard: [B, H/n, *rest, C]
        up = [(i, (i + 1) % n) for i in range(n)]      # send to right
        down = [(i, (i - 1) % n) for i in range(n)]    # send to left
        top = jax.lax.ppermute(z_shard[:, -halo:], axis_name, up)
        bottom = jax.lax.ppermute(z_shard[:, :halo], axis_name, down)
        padded = jnp.concatenate([top, z_shard, bottom], axis=1)
        decoded = decode_fn(padded)
        crop = halo * upscale
        return decoded[:, crop:-crop]

    in_spec = P(None, axis_name, *([None] * (z.ndim - 2)))
    fn = shard_map(local, mesh=mesh, in_specs=(in_spec,),
                   out_specs=in_spec)
    z = jax.device_put(z, NamedSharding(mesh, in_spec))
    return fn(z)
