"""ADM and DiT shape/behaviour tests (mirrors reference tests/test_adm.py)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from diffsci_tpu.models.nets import ADM, ADMConfig, DiffusionTransformer

KEY = jax.random.PRNGKey(0)


def run(module, *args, **kwargs):
    variables = module.init({"params": KEY, "dropout": KEY}, *args, **kwargs)
    return module.apply(variables, *args, **kwargs,
                        rngs={"dropout": jax.random.PRNGKey(1)})


def small_config(**kw):
    defaults = dict(model_channels=8, time_embed_dim=8, output_embed_dim=16,
                    channel_expansion=[2], number_resnet_downward_block=1,
                    number_resnet_upward_block=1, number_resnet_attn_block=2,
                    number_resnet_before_attn_block=1,
                    number_resnet_after_attn_block=1)
    defaults.update(kw)
    return ADMConfig(**defaults)


@pytest.mark.slow
@pytest.mark.parametrize("skip_type", ["concat", "add"])
@pytest.mark.parametrize("decoder_type", [1, 2])
def test_adm_2d_shapes(skip_type, decoder_type):
    config = small_config(skip_integration_type=skip_type,
                          decoder_type=decoder_type)
    model = ADM(config)
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    t = jnp.ones((2,))
    out = run(model, x, t)
    assert out.shape == (2, 16, 16, 1)


@pytest.mark.slow
def test_adm_3d_shapes():
    config = small_config(dimension=3)
    model = ADM(config)
    x = jax.random.normal(KEY, (1, 8, 8, 8, 1))
    out = run(model, x, jnp.ones((1,)))
    assert out.shape == (1, 8, 8, 8, 1)


@pytest.mark.slow
def test_adm_conditional():
    class Emb(nn.Module):
        @nn.compact
        def __call__(self, y):
            return nn.Embed(10, 16)(y["y"] if isinstance(y, dict) else y)

    config = small_config(cond_dropout=0.1)
    model = ADM(config, conditional_embedding=Emb())
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    t = jnp.ones((2,))
    y = {"y": jnp.array([3, 7])}
    variables = model.init({"params": KEY, "dropout": KEY}, x, t, y)
    out_cond = model.apply(variables, x, t, y)
    out_uncond = model.apply(variables, x, t, None)  # zero-embedding path
    assert out_cond.shape == out_uncond.shape == (2, 16, 16, 1)
    assert not jnp.allclose(out_cond, out_uncond)


def test_adm_middle_attn_config():
    config = small_config(number_resnet_before_attn_block=2,
                          number_resnet_attn_block=3,
                          number_resnet_after_attn_block=1)
    assert config.middle_block_attn_config == [
        False, False, True, True, False, False]
    assert config.num_blocks_middle_block == 6


def test_adm_config_roundtrip():
    config = small_config()
    desc = config.export_description()
    assert ADMConfig.from_description(desc) == config


@pytest.mark.slow
def test_dit_shapes_and_patch_roundtrip():
    from diffsci_tpu.models.nets.dit import patchify, unpatchify
    x = jax.random.normal(KEY, (2, 16, 16, 3))
    tokens = patchify(x, 4)
    assert tokens.shape == (2, 16, 48)
    x2 = unpatchify(tokens, 4, 16, 16, 3)
    assert jnp.allclose(x, x2)

    model = DiffusionTransformer(nembed=32, nheads=4, nblocks=2,
                                 patch_size=4, nchannels=1)
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    out = run(model, x, jnp.ones((2,)))
    assert out.shape == (2, 16, 16, 1)


@pytest.mark.slow
def test_dit_positions_break_translation_symmetry():
    """With positions applied, permuting patches changes outputs
    non-uniformly (the reference forgot to add positions)."""
    model = DiffusionTransformer(nembed=32, nheads=2, nblocks=1,
                                 patch_size=4)
    x = jax.random.normal(KEY, (1, 16, 16, 1))
    variables = model.init({"params": KEY}, x, jnp.ones((1,)))
    out1 = model.apply(variables, x, jnp.ones((1,)))
    x_rolled = jnp.roll(x, 4, axis=1)  # shift by one patch
    out2 = model.apply(variables, x_rolled, jnp.ones((1,)))
    # if positions were missing, out2 would be exactly roll(out1)
    assert not jnp.allclose(out2, jnp.roll(out1, 4, axis=1), atol=1e-5)


@pytest.mark.slow
def test_adm_magnitude_preserving():
    """ADM-MP coverage (reference admmp.py:8-1114 is the mp
    re-implementation; here it is the convolution_type='mp' configuration
    of the same ADM)."""
    config = small_config(convolution_type="mp")
    model = ADM(config)
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    out = run(model, x, jnp.ones((2,)))
    assert out.shape == (2, 16, 16, 1)
    assert jnp.all(jnp.isfinite(out))
    # mp params present for the optimizer re-projection transform
    variables = model.init({"params": KEY, "dropout": KEY}, x,
                           jnp.ones((2,)))
    import jax.tree_util as jtu
    paths = [jtu.keystr(p) for p, _ in
             jtu.tree_leaves_with_path(variables["params"])]
    assert any("w_mp" in p for p in paths)


@pytest.mark.slow
def test_adm_dit_flash_backend_parity():
    """attn_backend='flash' produces the same outputs (interpret-mode
    kernel on CPU) and is part of both configs' export round-trip."""
    import diffsci_tpu.kernels.flash_attention as fa_mod
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 1))
    t = jnp.ones((1,))

    cfg_x = ADMConfig(model_channels=8, channel_expansion=[2],
                      attn_heads=2)
    cfg_f = dataclasses.replace(cfg_x, attn_backend="flash")
    m_x, m_f = ADM(cfg_x), ADM(cfg_f)
    vs = m_x.init(jax.random.PRNGKey(1), x, t)
    y_ref = m_x.apply(vs, x, t)
    fa_mod.INTERPRET = True
    old_mt = fa_mod.DEFAULT_MIN_TOKENS
    fa_mod.DEFAULT_MIN_TOKENS = 1  # engage at the tiny test size
    try:
        y_flash = m_f.apply(vs, x, t)
    finally:
        fa_mod.INTERPRET = False
        fa_mod.DEFAULT_MIN_TOKENS = old_mt
    np.testing.assert_allclose(np.asarray(y_flash), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)

    # DiT: one parameterization for both backends — a checkpoint trained
    # with 'xla' must produce identical outputs under 'flash'
    dit_x = DiffusionTransformer(nembed=32, nheads=2, nblocks=1,
                                 patch_size=4)
    dit_f = DiffusionTransformer(nembed=32, nheads=2, nblocks=1,
                                 patch_size=4, attn_backend="flash")
    v = dit_x.init(jax.random.PRNGKey(2), x, t)
    out_x = dit_x.apply(v, x, t)
    fa_mod.INTERPRET = True
    fa_mod.DEFAULT_MIN_TOKENS = 1
    try:
        out_f = dit_f.apply(v, x, t)
    finally:
        fa_mod.INTERPRET = False
        fa_mod.DEFAULT_MIN_TOKENS = old_mt
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x),
                               rtol=2e-4, atol=2e-5)
    desc = dit_f.export_description()
    assert desc["kind"] == "dit"
    assert desc["config"]["attn_backend"] == "flash"


@pytest.mark.slow
def test_adm_space_to_depth():
    """Same TPU lever as PUNetG: fold spatial tiles into channels at the
    input, unfold at the output — shapes round-trip in 2D and 3D."""
    for dim, spatial in ((2, (16, 16)), (3, (8, 8, 8))):
        cfg = ADMConfig(dimension=dim, model_channels=8,
                        channel_expansion=[2], space_to_depth=2)
        net = ADM(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2,) + spatial + (1,))
        t = jnp.ones((2,))
        vs = net.init(jax.random.PRNGKey(1), x, t)
        out = net.apply(vs, x, t)
        assert out.shape == x.shape
        assert bool(jnp.all(jnp.isfinite(out)))
    assert ADMConfig.from_description(
        cfg.export_description()).space_to_depth == 2


def test_dit_attention_param_migration():
    """migrate_dit_attention_params maps a pre-switch flax
    MultiHeadDotProductAttention param tree onto the in-house
    MultiHeadAttention layout with numerically identical outputs
    (the one-time checkpoint migration, extra/converters.py)."""
    from diffsci_tpu.extra.converters import migrate_dit_attention_params
    from diffsci_tpu.models.nets.attention import MultiHeadAttention

    C, H, T, B = 16, 4, 9, 2
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, C))

    class OldBlock(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.MultiHeadDotProductAttention(
                num_heads=H, qkv_features=C, out_features=C,
                use_bias=True, deterministic=True)(x, x)

    old = OldBlock()
    old_vs = old.init(jax.random.PRNGKey(1), x)
    # randomize biases so the bias mapping is actually exercised
    old_params = jax.tree.map(
        lambda p: jax.random.normal(jax.random.PRNGKey(2), p.shape) * 0.1
        if p.ndim <= 2 else p, old_vs["params"])
    ref = old.apply({"params": old_params}, x)

    new = MultiHeadAttention(num_heads=H, use_bias=True)
    migrated = migrate_dit_attention_params(old_params)
    out = new.apply({"params": migrated["MultiHeadAttention_0"]}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)
