"""Extras tests: periodizer and exact tiled / halo-sharded decode."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from diffsci_tpu.extra import (DiffusionPeriodizer,
                               measure_periodicity_error,
                               tiled_decode, halo_shard_decode,
                               decoder_halo_radius, upscale_factor)

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# periodizer
# ---------------------------------------------------------------------------
def test_periodizer_expand_and_crop():
    per = DiffusionPeriodizer(lambda x: x, pad=2, blend_width=0, dimension=2)
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    exp = per.expand_periodic(x)
    assert exp.shape == (1, 8, 8, 1)
    # identity net + crop recovers the input exactly
    np.testing.assert_allclose(per.forward_no_blend(x), x)


def test_periodizer_makes_net_shift_equivariant():
    """With pad >= the net's receptive radius, the periodized net commutes
    with circular shifts (true periodicity), which the zero-padded net does
    not."""
    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Conv(1, (5, 5), padding="SAME")(x)

    net = Net()
    x = jax.random.normal(KEY, (1, 16, 16, 1))
    variables = net.init(KEY, x)

    def net_fn(xx):
        return net.apply(variables, xx)

    per = DiffusionPeriodizer(net_fn, pad=4, blend_width=0, dimension=2)
    y = per.forward_no_blend(x)
    y_shift = per.forward_no_blend(jnp.roll(x, 5, axis=1))
    np.testing.assert_allclose(y_shift, jnp.roll(y, 5, axis=1),
                               rtol=1e-4, atol=1e-5)
    # the raw zero-padded net is NOT shift equivariant on the torus
    raw = net_fn(x)
    raw_shift = net_fn(jnp.roll(x, 5, axis=1))
    assert not np.allclose(raw_shift, jnp.roll(raw, 5, axis=1), atol=1e-4)


def test_periodizer_blend_reduces_boundary_jump_on_smooth_data():
    """On smooth data the cosine blend shrinks the first-vs-last boundary
    mismatch (periodizer.py:126-199)."""
    h = jnp.linspace(0.0, 1.0, 16)
    x = jnp.broadcast_to(h[None, :, None, None], (1, 16, 16, 1))
    per = DiffusionPeriodizer(lambda xx: xx, pad=2, blend_width=4,
                              dimension=2)
    blended = per(x)
    err_raw = measure_periodicity_error(x, dimension=2)["mse_H"]
    err_blend = measure_periodicity_error(blended, dimension=2)["mse_H"]
    assert err_blend < err_raw


# ---------------------------------------------------------------------------
# tiled decode
# ---------------------------------------------------------------------------
class LocalDecoder(nn.Module):
    """Conv + 2x nearest upsample + conv: receptive radius 1 + 1/2 latent
    units -> halo 2 is exact."""

    @nn.compact
    def __call__(self, z):
        h = nn.Conv(8, (3, 3), padding="SAME")(z)
        h = nn.silu(h)
        for d in (1, 2):
            h = jnp.repeat(h, 2, axis=d)
        return nn.Conv(1, (3, 3), padding="SAME")(h)


@pytest.mark.slow
def test_tiled_decode_exact_periodic():
    dec = LocalDecoder()
    z = jax.random.normal(KEY, (1, 16, 16, 2))
    variables = dec.init(KEY, z)

    def decode_fn(zz):
        return dec.apply(variables, zz)

    # full reference decode on periodically padded input? plain SAME conv
    # uses zero padding, so compare tiled-periodic vs full-periodic:
    def periodic_decode(zz, halo=2):
        ids0 = np.arange(-halo, zz.shape[1] + halo) % zz.shape[1]
        ids1 = np.arange(-halo, zz.shape[2] + halo) % zz.shape[2]
        big = jnp.take(jnp.take(zz, ids0, 1), ids1, 2)
        out = decode_fn(big)
        return out[:, 2 * halo:-2 * halo, 2 * halo:-2 * halo]

    full = periodic_decode(z)
    tiled = tiled_decode(decode_fn, z, chunk=(8, 8), halo=2, upscale=2,
                         periodic=True)
    assert tiled.shape == (1, 32, 32, 1)
    np.testing.assert_allclose(tiled, full, rtol=1e-4, atol=1e-5)


def test_decoder_halo_radius():
    from diffsci_tpu.models.nets.vae import DDConfig
    cfg = DDConfig(ch_mult=[1, 2], num_res_blocks=1, has_mid_attn=False)
    r = decoder_halo_radius(cfg)
    # conv_in(1) + mid(4) + level1: 2*2=4 @ scale1, level0: 4 @ scale2 -> 2,
    # conv_out 1/2 -> ceil(11.5) = 12
    assert r == 12
    assert upscale_factor(cfg) == 2
    with pytest.raises(NotImplementedError):
        decoder_halo_radius(DDConfig(has_mid_attn=True))


@pytest.mark.slow
def test_halo_shard_decode_matches_tiled():
    from diffsci_tpu.parallel import make_mesh
    dec = LocalDecoder()
    z = jax.random.normal(KEY, (1, 32, 16, 2))
    variables = dec.init(KEY, z)

    def decode_fn(zz):
        return dec.apply(variables, zz)

    mesh = make_mesh(4, axes=("spatial",))
    sharded = halo_shard_decode(decode_fn, z, mesh, axis_name="spatial",
                                halo=2, upscale=2)
    assert sharded.shape == (1, 64, 32, 1)
    # the halo-sharded result is periodic along H only; compare against
    # tiled periodic decode restricted to the H axis
    def periodic_h_decode(zz, halo=2):
        ids0 = np.arange(-halo, zz.shape[1] + halo) % zz.shape[1]
        big = jnp.take(zz, ids0, 1)
        out = decode_fn(big)
        return out[:, 2 * halo:-2 * halo]

    full = periodic_h_decode(z)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(full),
                               rtol=1e-4, atol=1e-5)
