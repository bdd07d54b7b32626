"""Shape and behaviour tests for the network layer library and PUNetG
(mirrors reference tests/test_punetg.py and tests/test_layers.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffsci_tpu.models import nets
from diffsci_tpu.models.nets import layers


KEY = jax.random.PRNGKey(0)


def init_and_apply(module, *args, **kwargs):
    variables = module.init({"params": KEY, "dropout": KEY}, *args, **kwargs)
    out = module.apply(variables, *args, **kwargs,
                       rngs={"dropout": jax.random.PRNGKey(1)})
    return out, variables


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------
def test_gaussian_fourier_projection():
    mod = layers.GaussianFourierProjection(embed_dim=32)
    t = jnp.linspace(0, 1, 5)
    out, variables = init_and_apply(mod, t)
    assert out.shape == (5, 32)
    assert "buffers" in variables  # W is a non-trainable buffer
    assert "params" not in variables
    # sin^2 + cos^2 = 1
    np.testing.assert_allclose(out[:, :16] ** 2 + out[:, 16:] ** 2, 1.0,
                               rtol=1e-5)


@pytest.mark.parametrize("cls,sub_mean,spatial", [
    (layers.GroupRMSNorm, False, True),
    (layers.GroupPixNorm, False, False),
    (layers.GroupLNorm, True, True),
])
def test_group_norms(cls, sub_mean, spatial):
    x = jax.random.normal(KEY, (2, 8, 8, 16)) * 3.0 + 1.0
    mod = cls(num_groups=4, num_channels=16, affine=False)
    out, _ = init_and_apply(mod, x)
    assert out.shape == x.shape
    xg = np.asarray(out).reshape(2, 8, 8, 4, 4)
    if spatial:
        axes = (1, 2, 4)
    else:
        axes = (4,)
    ms = (xg ** 2).mean(axis=axes)
    np.testing.assert_allclose(ms, 1.0, atol=0.05)
    if sub_mean:
        np.testing.assert_allclose(xg.mean(axis=axes), 0.0, atol=0.05)


def test_group_ln_variance_numerics_worst_regime():
    """The shifted one-pass variance (layers.py, subtract_mean branch)
    must stay f32-accurate where the naive one-pass E[x^2]-mu^2 loses
    ~3 digits: |mu| >> std (post-attention activations, mu ~ 1, spatial
    std ~ 3e-4) plus a smooth spatial ramp so row-means differ from the
    global mean (the shift's own worst case). Pinned against float64
    ground truth; the naive form lands ~7.5e-3 here."""
    rng = np.random.default_rng(0)
    x64 = (1.0 + 3e-4 * rng.standard_normal((4, 32, 32, 16))
           + 1e-3 * np.linspace(0, 1, 32)[None, :, None, None])
    norm = layers.GroupLNorm(num_groups=16, num_channels=16, affine=False)
    v = norm.init(jax.random.PRNGKey(0), jnp.asarray(x64, jnp.float32))
    y32 = np.asarray(
        jax.jit(lambda a: norm.apply(v, a))(jnp.asarray(x64, jnp.float32)),
        np.float64)
    xg = x64.reshape(4, 32, 32, 16, 1)
    mean = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = ((xg - mean) ** 2).mean(axis=(1, 2, 4), keepdims=True)
    y64 = ((xg - mean) / np.sqrt(var + 1e-5)).reshape(4, 32, 32, 16)
    assert np.max(np.abs(y32 - y64)) < 5e-4


@pytest.mark.slow
@pytest.mark.parametrize("ndim", [2, 3])
def test_down_up_samplers(ndim):
    sp = (8,) * ndim
    x = jax.random.normal(KEY, (2,) + sp + (4,))
    down = layers.DownSampler(features=8)
    out, _ = init_and_apply(down, x)
    assert out.shape == (2,) + tuple(s // 2 for s in sp) + (8,)
    up = layers.UpSampler(features=2)
    out2, _ = init_and_apply(up, out)
    assert out2.shape == (2,) + sp + (2,)


def test_circular_conv_is_periodic():
    """A circular conv of a circularly-shifted input equals the circularly
    shifted output (translation equivariance on the torus)."""
    x = jax.random.normal(KEY, (1, 8, 8, 3))
    mod = layers.CircularConv(features=4, kernel_size=3)
    variables = mod.init(KEY, x)
    out = mod.apply(variables, x)
    assert out.shape == (1, 8, 8, 4)
    x_shift = jnp.roll(x, 3, axis=1)
    out_shift = mod.apply(variables, x_shift)
    np.testing.assert_allclose(out_shift, jnp.roll(out, 3, axis=1),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_resnet_block_c_shapes():
    x = jax.random.normal(KEY, (2, 8, 8, 16))
    te = jax.random.normal(KEY, (2, 16))
    mod = layers.ResnetBlockC(channels=16, time_embed_dim=16)
    out, _ = init_and_apply(mod, x, te)
    assert out.shape == x.shape
    # channel-changing variant (no residual)
    mod2 = layers.ResnetBlockC(channels=16, time_embed_dim=16,
                               output_channels=32)
    out2, _ = init_and_apply(mod2, x, te)
    assert out2.shape == (2, 8, 8, 32)
    # no-time variant
    mod3 = layers.ResnetBlockC(channels=16, time_embed_dim=None)
    out3, _ = init_and_apply(mod3, x)
    assert out3.shape == x.shape


@pytest.mark.slow
def test_resnet_block_3d_and_mp():
    x = jax.random.normal(KEY, (2, 4, 4, 4, 8))
    te = jax.random.normal(KEY, (2, 8))
    mod = layers.ResnetBlockC(channels=8, time_embed_dim=8,
                              convolution_type="mp")
    out, variables = init_and_apply(mod, x, te)
    assert out.shape == x.shape
    # mp params present
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    assert any("w_mp" in jax.tree_util.keystr(p) for p, _ in flat)


def test_condition_drop():
    mod = layers.ConditionDrop(rate=1.0, hidden_dim=8)
    x = jnp.ones((4, 8))
    variables = mod.init({"params": KEY, "dropout": KEY}, x, train=True)
    out = mod.apply(variables, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    null = variables["params"]["null_embedding"]
    np.testing.assert_allclose(out, jnp.broadcast_to(null, out.shape))
    out_eval = mod.apply(variables, x, train=False)
    np.testing.assert_allclose(out_eval, x)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------
@pytest.mark.slow
@pytest.mark.parametrize("ndim", [2, 3])
@pytest.mark.parametrize("attn_type", ["default", "cosine"])
def test_spatial_attention_shapes(ndim, attn_type):
    sp = (4,) * ndim
    x = jax.random.normal(KEY, (2,) + sp + (16,))
    mod = nets.SpatialSelfAttention(num_heads=4, attn_type=attn_type)
    out, _ = init_and_apply(mod, x)
    assert out.shape == x.shape


def test_attention_mp_variant():
    x = jax.random.normal(KEY, (2, 4, 4, 16))
    mod = nets.SpatialSelfAttention(num_heads=2, attn_type="cosine",
                                    magnitude_preserving=True)
    out, _ = init_and_apply(mod, x)
    assert out.shape == x.shape
    assert jnp.all(jnp.isfinite(out))


def test_attention_softmax_rows():
    """dot_product_attention output is a convex combination of values."""
    q = jax.random.normal(KEY, (1, 2, 5, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 5, 8))
    v = jnp.ones((1, 2, 5, 8))
    out = nets.dot_product_attention(q, k, v)
    np.testing.assert_allclose(out, 1.0, rtol=1e-5)


# ---------------------------------------------------------------------------
# MLPs
# ---------------------------------------------------------------------------
def test_mlp_uncond():
    mod = nets.MLPUncond(dim=3, hidden_dims=[20, 20])
    x = jax.random.normal(KEY, (8, 3))
    t = jnp.ones((8,))
    out, _ = init_and_apply(mod, x, t)
    assert out.shape == (8, 3)


def test_mlp_cond():
    mod = nets.MLPCond(dim=3, ydim=2, hidden_dims=[20])
    x = jax.random.normal(KEY, (8, 3))
    t = jnp.ones((8,))
    y = jnp.ones((8, 2))
    out, _ = init_and_apply(mod, x, t, y)
    assert out.shape == (8, 3)


# ---------------------------------------------------------------------------
# PUNetG (mirrors reference tests/test_punetg.py:1-32)
# ---------------------------------------------------------------------------
def test_punetg_2d_shapes():
    config = nets.PUNetGConfig(model_channels=8, channel_expansion=[2],
                               number_resnet_downward_block=1,
                               number_resnet_upward_block=1,
                               number_resnet_attn_block=2,
                               number_resnet_before_attn_block=1,
                               number_resnet_after_attn_block=1)
    model = nets.PUNetG(config)
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    t = jnp.ones((2,))
    out, variables = init_and_apply(model, x, t)
    assert out.shape == (2, 16, 16, 1)


@pytest.mark.slow
def test_punetg_3d_shapes():
    config = nets.PUNetGConfig(model_channels=4, channel_expansion=[2],
                               dimension=3,
                               number_resnet_downward_block=1,
                               number_resnet_upward_block=1,
                               number_resnet_attn_block=1,
                               number_resnet_before_attn_block=1,
                               number_resnet_after_attn_block=1)
    model = nets.PUNetG(config)
    x = jax.random.normal(KEY, (1, 8, 8, 8, 1))
    t = jnp.ones((1,))
    out, _ = init_and_apply(model, x, t)
    assert out.shape == (1, 8, 8, 8, 1)


def test_punetg_conditional_embedding():
    import flax.linen as nn

    class ClassEmbedding(nn.Module):
        num_classes: int = 10
        dim: int = 8

        @nn.compact
        def __call__(self, y):
            return nn.Embed(self.num_classes, self.dim)(y["y"])

    config = nets.PUNetGConfig(model_channels=8, channel_expansion=[2],
                               number_resnet_downward_block=1,
                               number_resnet_upward_block=1,
                               number_resnet_attn_block=1,
                               number_resnet_before_attn_block=1,
                               number_resnet_after_attn_block=1,
                               cond_drop=0.1)
    model = nets.PUNetG(config, conditional_embedding=ClassEmbedding())
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    t = jnp.ones((2,))
    y = {"y": jnp.array([1, 2])}
    out, _ = init_and_apply(model, x, t, y, train=True)
    assert out.shape == (2, 16, 16, 1)


def test_punetg_cond_channel_concat():
    config = nets.PUNetGConfig(model_channels=8, channel_expansion=[2],
                               input_channels=2,
                               number_resnet_downward_block=1,
                               number_resnet_upward_block=1,
                               number_resnet_attn_block=1,
                               number_resnet_before_attn_block=1,
                               number_resnet_after_attn_block=1)
    model = nets.PUNetGCond(config, channel_conditional_items=["lowres"])
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    t = jnp.ones((2,))
    y = {"lowres": jax.random.normal(KEY, (2, 16, 16, 1))}
    out, _ = init_and_apply(model, x, t, y)
    assert out.shape == (2, 16, 16, 1)


def test_punetg_bias_free_and_circular():
    config = nets.PUNetGConfig(model_channels=8, channel_expansion=[2],
                               bias=False, convolution_type="circular",
                               number_resnet_downward_block=1,
                               number_resnet_upward_block=1,
                               number_resnet_attn_block=1,
                               number_resnet_before_attn_block=1,
                               number_resnet_after_attn_block=1)
    model = nets.PUNetG(config)
    x = jax.random.normal(KEY, (1, 16, 16, 1))
    t = jnp.ones((1,))
    out, _ = init_and_apply(model, x, t)
    assert out.shape == (1, 16, 16, 1)


def test_punetg_config_roundtrip(tmp_path):
    config = nets.PUNetGConfig(model_channels=32, channel_expansion=[2, 4])
    desc = config.export_description()
    config2 = nets.PUNetGConfig.from_description(desc)
    assert config2 == config


@pytest.mark.slow
def test_punetg_space_to_depth():
    """space_to_depth folds spatial tiles into channels at the input and
    unfolds at the output (TPU lane-utilization lever for C<128 volumes);
    shapes must round-trip in 2D and 3D and gradients stay finite."""
    from diffsci_tpu.utils import space_to_depth, depth_to_space

    # helper roundtrip
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 8, 3))
    np.testing.assert_array_equal(
        np.asarray(depth_to_space(space_to_depth(x, 2), 2)), np.asarray(x))

    for dim, spatial in ((2, (16, 16)), (3, (8, 8, 8))):
        cfg = nets.PUNetGConfig(dimension=dim, model_channels=8,
                           channel_expansion=[2], space_to_depth=2)
        net = nets.PUNetG(cfg)
        xb = jax.random.normal(jax.random.PRNGKey(1),
                               (2,) + spatial + (1,))
        t = jnp.ones((2,))
        vs = net.init(jax.random.PRNGKey(2), xb, t)
        out = net.apply(vs, xb, t)
        assert out.shape == xb.shape, (out.shape, xb.shape)

        def loss(vs):
            return jnp.sum(net.apply(vs, xb, t) ** 2)
        g = jax.grad(loss)(vs)
        assert all(bool(jnp.all(jnp.isfinite(l)))
                   for l in jax.tree.leaves(g))
    # config round-trip carries the flag
    assert nets.PUNetGConfig.from_description(
        cfg.export_description()).space_to_depth == 2


@pytest.mark.slow
def test_punetg_odd_spatial_levels():
    """Levels that don't divide by the transition scale are shape-safe:
    the encoder pads up to the downsample multiple and the decoder crops
    back to the skip shape (28x28 with space_to_depth=2 folds to 14 ->
    7 -> padded 8; plain 27x27 likewise). Output shape must equal the
    input shape under jit, and gradients stay finite."""
    for cfg, spatial in (
        (nets.PUNetGConfig(model_channels=8, channel_expansion=[2, 4],
                           space_to_depth=2), (28, 28)),
        (nets.PUNetGConfig(model_channels=8, channel_expansion=[2, 4]),
         (27, 27)),
    ):
        net = nets.PUNetG(cfg)
        xb = jax.random.normal(jax.random.PRNGKey(1), (2,) + spatial + (1,))
        t = jnp.ones((2,))
        vs = net.init(jax.random.PRNGKey(2), xb, t)
        out = jax.jit(lambda v, x, t: net.apply(v, x, t))(vs, xb, t)
        assert out.shape == xb.shape, (out.shape, xb.shape)
        g = jax.grad(lambda v: jnp.sum(net.apply(v, xb, t) ** 2))(vs)
        assert all(bool(jnp.all(jnp.isfinite(l)))
                   for l in jax.tree.leaves(g))


def test_punetg_receptive_field_matches_reference():
    """calculate_receptive_field pinned against the reference's own
    calculator (punetg.py:423-631) executed offline on three configs:
    rf 122/df 4 (two levels, no attention), rf inf (global attention
    when number_resnet_attn_block >= 2), and rf 482/df 8 (three levels,
    k=5, in_out_kernel_size=1)."""
    from diffsci_tpu.models.nets.punetg import calculate_receptive_field

    out = calculate_receptive_field(nets.PUNetGConfig(
        model_channels=8, channel_expansion=[2, 4],
        number_resnet_downward_block=2, number_resnet_upward_block=2,
        number_resnet_attn_block=1, number_resnet_before_attn_block=1,
        number_resnet_after_attn_block=1))
    assert (out["rf"], out["downsampling_factor"]) == (122, 4)
    assert out["feasible_chunking"] and not out["has_attention"]
    assert any("convout" in t for t in out["trace"])

    out = calculate_receptive_field(nets.PUNetGConfig(
        model_channels=8, channel_expansion=[2],
        number_resnet_attn_block=2))
    assert out["rf"] == float("inf")
    assert out["has_attention"] and out["num_attention_layers"] == 1
    assert not out["feasible_chunking"]

    out = calculate_receptive_field(nets.PUNetGConfig(
        model_channels=8, channel_expansion=[2, 2, 4],
        number_resnet_downward_block=1, number_resnet_upward_block=1,
        number_resnet_attn_block=1,
        number_resnet_before_attn_block=2,
        number_resnet_after_attn_block=2,
        kernel_size=5, in_out_kernel_size=1))
    assert (out["rf"], out["downsampling_factor"]) == (482, 8)

    # TPU-build addition: space_to_depth multiplies every stride (and
    # the base pixel) by s in true input pixels
    base = calculate_receptive_field(nets.PUNetGConfig(
        model_channels=8, channel_expansion=[2],
        number_resnet_attn_block=1))
    s2d = calculate_receptive_field(nets.PUNetGConfig(
        model_channels=8, channel_expansion=[2],
        number_resnet_attn_block=1, space_to_depth=2))
    assert s2d["rf"] == 2 * base["rf"]
    assert s2d["downsampling_factor"] == 2 * base["downsampling_factor"]
