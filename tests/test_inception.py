"""InceptionV3-FID architecture + torch weight-layout conversion tests.

The real pt_inception weights cannot be downloaded in this environment
(zero egress); these tests pin (a) the architecture's stage shapes and
feature width against pytorch-fid's published structure and (b) the
state-dict converter's layout math against a live torch conv+bn forward.
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from diffsci_tpu import metrics_inception as mi


@pytest.mark.slow
def test_inception_fid_feature_shape_and_param_count():
    net = mi.InceptionV3FID()
    x = jnp.zeros((1, 299, 299, 3))
    vs = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(vs, x)
    assert out.shape == (1, 2048)
    n_params = sum(p.size for p in jax.tree.leaves(vs["params"]))
    # pytorch-fid's feature extractor (conv+bn, no fc): ~21.8M params
    assert 21_000_000 < n_params < 22_500_000, n_params


def test_converter_matches_torch_conv_bn_relu():
    """BasicConv2d through converted torch weights == torch's
    conv2d + batch_norm(eps=1e-3) + relu on the same input."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    O, I, kh, kw = 8, 3, 3, 3
    w = rng.normal(size=(O, I, kh, kw)).astype(np.float32)
    gamma = rng.normal(size=(O,)).astype(np.float32) * 0.1 + 1.0
    beta = rng.normal(size=(O,)).astype(np.float32) * 0.1
    mean = rng.normal(size=(O,)).astype(np.float32) * 0.2
    var = (rng.uniform(0.5, 2.0, size=(O,))).astype(np.float32)
    x = rng.normal(size=(2, I, 11, 11)).astype(np.float32)

    with torch.no_grad():
        t = torch.nn.functional.conv2d(torch.from_numpy(x),
                                       torch.from_numpy(w))
        t = torch.nn.functional.batch_norm(
            t, torch.from_numpy(mean), torch.from_numpy(var),
            torch.from_numpy(gamma), torch.from_numpy(beta),
            training=False, eps=1e-3)
        ref = torch.relu(t).numpy().transpose(0, 2, 3, 1)  # NCHW -> NHWC

    sd = {"blk.conv.weight": w, "blk.bn.weight": gamma,
          "blk.bn.bias": beta, "blk.bn.running_mean": mean,
          "blk.bn.running_var": var}
    variables = mi.convert_torch_inception_state(sd)

    mod = mi.BasicConv2d(O, (kh, kw), name="blk")
    xl = jnp.asarray(x.transpose(0, 2, 3, 1))

    class Wrap(mi.nn.Module):
        @mi.nn.compact
        def __call__(self, x):
            return mi.BasicConv2d(O, (kh, kw), name="blk")(x)

    out = Wrap().apply(variables, xl)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_stage_channel_widths():
    """Channel widths after each named stage match torchvision's
    InceptionV3 (the structural fingerprint the weight import relies on)."""
    # output channels: A blocks 224+pool, B 768->... known totals:
    # Mixed_5b: 256, 5c: 288, 5d: 288, 6a: 768, 6b-e: 768, 7a: 1280,
    # 7b/7c: 2048
    x = jnp.zeros((1, 35, 35, 192))
    a = mi.InceptionA(32).init(jax.random.PRNGKey(0), x)
    out = mi.InceptionA(32).apply(a, x)
    assert out.shape[-1] == 256
    out2 = mi.InceptionA(64).apply(
        mi.InceptionA(64).init(jax.random.PRNGKey(0), out), out)
    assert out2.shape[-1] == 288
    b = mi.InceptionB().apply(
        mi.InceptionB().init(jax.random.PRNGKey(0), out2), out2)
    assert b.shape[-1] == 768 and b.shape[1] == 17
    c = mi.InceptionC(128).apply(
        mi.InceptionC(128).init(jax.random.PRNGKey(0), b), b)
    assert c.shape[-1] == 768
    d = mi.InceptionD().apply(
        mi.InceptionD().init(jax.random.PRNGKey(0), c), c)
    assert d.shape[-1] == 1280 and d.shape[1] == 8
    e = mi.InceptionE(pool="avg").apply(
        mi.InceptionE(pool="avg").init(jax.random.PRNGKey(0), d), d)
    assert e.shape[-1] == 2048


def test_avg_pool_count_include_pad_false():
    """The pytorch-fid average pool divides by valid counts only."""
    x = jnp.ones((1, 3, 3, 1))
    out = mi._avg_pool_nip(x, (3, 3), (1, 1), (1, 1))
    # corner: 4 valid elements of ones -> mean 1.0 (not 4/9)
    np.testing.assert_allclose(np.asarray(out), np.ones((1, 3, 3, 1)),
                               rtol=1e-6)


@pytest.mark.slow
def test_synthetic_weight_resize_features_fid_end_to_end():
    """Full pipeline on synthetic (randomly initialized) weights: images
    -> grayscale->RGB broadcast -> 299x299 bilinear resize -> pool3
    features -> Frechet distance. Keeps the --inception-weights path in
    scripts/eval_fid.py green without the (egress-blocked)
    pt_inception-2015-12-05 file; with the real file the identical code
    path produces reference-comparable FID (BASELINE.md)."""
    import jax
    from diffsci_tpu import metrics
    from diffsci_tpu.metrics_inception import (InceptionV3FID,
                                               inception_fid_features)

    net = InceptionV3FID()
    variables = net.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, 299, 299, 3)))
    key = jax.random.PRNGKey(1)
    a = jax.random.uniform(key, (8, 28, 28, 1))
    b = jnp.clip(a + 0.3 * jax.random.normal(jax.random.PRNGKey(2),
                                             a.shape), 0, 1)
    fa = inception_fid_features(variables, a, batch_size=4)
    fb = inception_fid_features(variables, b, batch_size=4)
    assert fa.shape == (8, 2048) and np.all(np.isfinite(fa))
    fid_self = metrics.fid(fa, fa)
    fid_ab = metrics.fid(fa, fb)
    assert abs(fid_self) < 1e-3
    assert np.isfinite(fid_ab) and fid_ab > fid_self
