"""ConVit tests: shapes, RoPE properties, linear attention, conditioning."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffsci_tpu.models.nets.convit import (ConVit, ConVitConfig,
                                            LearnedRoPE, ChannelRMSNorm)

KEY = jax.random.PRNGKey(0)


def small_cfg(**kw):
    d = dict(embed_dim=16, num_layers=2, num_heads=2,
             has_time_embedding=True)
    d.update(kw)
    return ConVitConfig(**d)


def test_channel_rms_norm():
    x = jax.random.normal(KEY, (2, 4, 4, 8)) * 3
    mod = ChannelRMSNorm(8, element_wise_affine=False)
    out = mod.apply(mod.init(KEY, x), x)
    rms = jnp.sqrt(jnp.mean(out ** 2, axis=-1))
    np.testing.assert_allclose(rms, 1.0, atol=1e-3)


def test_rope_preserves_norm():
    """Rotary embeddings are rotations: vector norms are preserved."""
    rope = LearnedRoPE(embed_dim=8, num_pos_dims=2)
    x = jax.random.normal(KEY, (2, 4, 4, 8))
    out = rope.apply(rope.init(KEY, x), x)
    assert out.shape == x.shape
    np.testing.assert_allclose(jnp.linalg.norm(out, axis=-1),
                               jnp.linalg.norm(x, axis=-1), rtol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("linear", [False, True])
def test_convit_2d(linear):
    cfg = small_cfg(linear_attention=linear)
    model = ConVit(cfg)
    x = jax.random.normal(KEY, (2, 8, 8, 1))
    t = jnp.ones((2,))
    variables = model.init({"params": KEY, "dropout": KEY}, x, t)
    out = model.apply(variables, x, t)
    assert out.shape == (2, 8, 8, 1)
    assert jnp.all(jnp.isfinite(out))


@pytest.mark.slow
def test_convit_3d():
    cfg = small_cfg(num_pos_dims=3, num_layers=1)
    model = ConVit(cfg)
    x = jax.random.normal(KEY, (1, 4, 4, 4, 1))
    variables = model.init({"params": KEY, "dropout": KEY}, x, jnp.ones((1,)))
    out = model.apply(variables, x, jnp.ones((1,)))
    assert out.shape == (1, 4, 4, 4, 1)


@pytest.mark.slow
def test_convit_conditional():
    import flax.linen as nn

    class Emb(nn.Module):
        @nn.compact
        def __call__(self, y):
            return nn.Dense(16)(y)

    cfg = small_cfg(has_conditional_embedding=True)
    model = ConVit(cfg, conditional_embedding=Emb())
    x = jax.random.normal(KEY, (2, 8, 8, 1))
    t = jnp.ones((2,))
    y = jnp.ones((2, 3))
    variables = model.init({"params": KEY, "dropout": KEY}, x, t, y)
    out_c = model.apply(variables, x, t, y)
    out_u = model.apply(variables, x, t, None)
    assert out_c.shape == (2, 8, 8, 1)
    assert not jnp.allclose(out_c, out_u)


@pytest.mark.slow
def test_convit_conv_resampling_and_out_channels():
    cfg = small_cfg(with_conv_on_upsample=True, with_conv_on_downsample=True,
                    out_channels=3)
    model = ConVit(cfg)
    x = jax.random.normal(KEY, (1, 8, 8, 1))
    variables = model.init({"params": KEY, "dropout": KEY}, x, jnp.ones((1,)))
    out = model.apply(variables, x, jnp.ones((1,)))
    assert out.shape == (1, 8, 8, 3)


def test_convit_config_roundtrip():
    cfg = small_cfg(linear_attention=True)
    assert ConVitConfig.from_description(cfg.export_description()) == cfg
