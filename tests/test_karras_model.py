"""End-to-end KarrasModel tests on analytic oracles, mirroring the
reference's gold standard (tests/test_karras_on_toy_dataset.py) plus loss /
training-step / sampling behaviour."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from diffsci_tpu import ops, data
from diffsci_tpu.models import (KarrasModel, KarrasModelConfig, MLPUncond,
                                create_train_state, make_train_step,
                                make_eval_step)
from diffsci_tpu.ops import NullPreconditioner


class OracleModel(nn.Module):
    """Wraps the analytic optimal denoiser as a 'network' with one dummy
    parameter (the reference's ToyModel,
    test_karras_on_toy_dataset.py:29-35). Used with NullPreconditioner so
    D(x, sigma) = model(x, sigma) exactly."""
    dataset: data.AnalyticalDataset

    @nn.compact
    def __call__(self, x, t=None, y=None, train: bool = False):
        dummy = self.param("dummy", nn.initializers.ones, ())
        return self.dataset.denoiser(x, t) + 0.0 * dummy * x


def make_oracle_module(dataset):
    config = KarrasModelConfig.from_edm()
    config.preconditioner = NullPreconditioner()
    model = KarrasModel(OracleModel(dataset), config)
    variables = model.init(jax.random.PRNGKey(0), (2,) + dataset.shape)
    return model, variables


@pytest.mark.parametrize("dim,nsteps,nsamples", [(1, 100, 100), (3, 500, 10)])
def test_karras_on_zero_dataset(dim, nsteps, nsamples):
    dataset = data.ZeroDataset(num_samples=64, shape=[dim])
    model, variables = make_oracle_module(dataset)
    key = jax.random.PRNGKey(42)
    x = jax.random.normal(key, (nsamples, dim))

    samples = model.propagate_white_noise(variables, key, x, nsteps=nsteps)
    assert samples.shape == (nsamples, dim)
    assert jnp.max(jnp.abs(samples)) < 1e-2

    out = model.sample(variables, key, nsamples, (dim,), nsteps=nsteps)
    assert out.shape == (nsamples, dim)
    assert jnp.max(jnp.abs(out)) < 1e-2

    history = model.propagate_white_noise(variables, key, x, nsteps=nsteps,
                                          record_history=True)
    assert history.shape == (nsteps + 1, nsamples, dim)
    np.testing.assert_allclose(
        history[0], x * model.config.noisescheduler.maximum_scale, rtol=1e-5)
    np.testing.assert_allclose(history[-1], 0.0, rtol=1e-2, atol=1e-2)


def test_oracle_loss_is_zero():
    """With the oracle denoiser the EDM loss must be ~0
    (test_karras_on_toy_dataset.py:84-85)."""
    dataset = data.ZeroDataset(num_samples=64, shape=[2])
    config = KarrasModelConfig.from_edm(loss_metric="mse")
    config.preconditioner = NullPreconditioner()
    model = KarrasModel(OracleModel(dataset), config)
    variables = model.init(jax.random.PRNGKey(0), (8, 2))

    key = jax.random.PRNGKey(1)
    x = dataset.sample(key)[:32]
    sigma = model.config.noisesampler.sample(key, (32,))
    loss, _ = model.loss_fn(variables, key, x, sigma)
    assert float(loss) < 1e-8


def test_train_step_runs_and_mlp_learns():
    """An MLP trained with the jitted train step on ZeroDataset should
    rapidly reduce the loss (test_karras_on_toy_dataset.py:87-91)."""
    dim = 2
    dataset = data.ZeroDataset(num_samples=2048, shape=[dim])
    config = KarrasModelConfig.from_edm(loss_metric="mse")
    model = KarrasModel(MLPUncond(dim=dim, hidden_dims=[32, 32]), config)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (8, dim))
    step_fn = make_train_step(model, tx)

    key = jax.random.PRNGKey(0)
    xs = dataset.sample(key)
    losses = []
    for i in range(60):
        key, sub = jax.random.split(key)
        batch = xs[(i * 32) % 2048:(i * 32) % 2048 + 32]
        state, metrics = step_fn(state, sub, batch)
        losses.append(float(metrics["train_loss"]))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.5
    assert int(state.step) == 60

    eval_fn = make_eval_step(model)
    val = eval_fn(state, key, xs[:64])
    assert np.isfinite(float(val["valid_loss"]))


def test_sampling_jit_cache_reuse():
    dataset = data.ZeroDataset(num_samples=8, shape=[2])
    model, variables = make_oracle_module(dataset)
    key = jax.random.PRNGKey(0)
    model.sample(variables, key, 4, (2,), nsteps=10)
    n_before = len(model._jit_cache)
    model.sample(variables, key, 4, (2,), nsteps=10)
    assert len(model._jit_cache) == n_before  # cache hit, no re-jit


def test_sample_micro_batching():
    dataset = data.ZeroDataset(num_samples=8, shape=[2])
    model, variables = make_oracle_module(dataset)
    out = model.sample(variables, jax.random.PRNGKey(0), 10, (2,),
                       nsteps=20, maximum_batch_size=4)
    assert out.shape == (10, 2)
    assert jnp.max(jnp.abs(out)) < 1e-2


def test_guidance_requires_conditional_flag():
    """Unconditional model ignores y and guidance (single forward)."""
    dataset = data.ZeroDataset(num_samples=8, shape=[2])
    model, variables = make_oracle_module(dataset)
    x = jnp.ones((4, 2))
    sigma = jnp.ones((4,))
    d1, _ = model.get_denoiser(variables, x, sigma)
    d2, _ = model.get_denoiser(variables, x, sigma, guidance=3.0)
    np.testing.assert_allclose(d1, d2)


@pytest.mark.slow
def test_model_inpaint_shapes():
    dataset = data.ZeroDataset(num_samples=8, shape=[4])
    model, variables = make_oracle_module(dataset)
    key = jax.random.PRNGKey(0)
    x_orig = jnp.full((3, 4), 0.2)
    mask = jnp.array([1.0, 0.0, 0.0, 0.0])
    out = model.inpaint(variables, key, x_orig, mask, nsteps=20)
    assert out.shape == (3, 4)
    np.testing.assert_allclose(out[:, 0], 0.2, atol=1e-4)
    out_rp = model.repaint(variables, key, x_orig, mask, nsteps=20,
                           rsteps=5, nresamples=2)
    assert out_rp.shape == (3, 4)


def test_interpolate_images():
    dataset = data.ZeroMeanGaussianDataset(num_samples=8, shape=[2])
    model, variables = make_oracle_module(dataset)
    key = jax.random.PRNGKey(0)
    x1 = jnp.array([1.0, 0.0])
    x2 = jnp.array([-1.0, 0.0])
    out = model.interpolate_images(variables, key, x1, x2, ninterp=3,
                                   nsteps=50)
    assert out.shape == (5, 2)
    assert jnp.all(jnp.isfinite(out))


def test_config_tag_roundtrip():
    config = KarrasModelConfig.from_edm(sigma_data=0.7)
    desc = config.export_description()
    config2 = KarrasModelConfig.load_from_description_with_tag(desc)
    assert config2.tag == "edm"
    assert config2.preconditioner.sigma_data == 0.7
    for factory in (KarrasModelConfig.from_vp, KarrasModelConfig.from_ve,
                    KarrasModelConfig.conditional_sr3):
        c = factory()
        c2 = KarrasModelConfig.load_from_description_with_tag(
            c.export_description())
        assert c2.tag == c.tag


@pytest.mark.slow
def test_conditional_cfg_training_and_guided_sampling():
    """Class-conditional training with ConditionDrop + CFG sampling
    (reference tests/test_mnist_lightning_karras.py:101-169 analogue):
    guided samples must depend on the class label."""
    import flax.linen as nn
    from diffsci_tpu.models import (EMATracker, KarrasModel,
                                    KarrasModelConfig, PUNetG, PUNetGConfig,
                                    create_train_state, make_train_step)
    cfg = PUNetGConfig(model_channels=8, channel_expansion=[2],
                       cond_drop=0.2,
                       number_resnet_downward_block=1,
                       number_resnet_upward_block=1,
                       number_resnet_attn_block=1,
                       number_resnet_before_attn_block=1,
                       number_resnet_after_attn_block=1)
    net = PUNetG(cfg, conditional_embedding=nn.Embed(2, 8))
    model = KarrasModel(net, KarrasModelConfig.from_edm(loss_metric="mse"),
                        conditional=True)
    y0 = jnp.zeros((8,), jnp.int32)
    state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                   (8, 16, 16, 1), y=y0)
    step = make_train_step(model, tx)
    # class 0 -> all -1, class 1 -> all +1
    x = jnp.concatenate([-jnp.ones((4, 16, 16, 1)),
                         jnp.ones((4, 16, 16, 1))])
    y = jnp.array([0, 0, 0, 0, 1, 1, 1, 1], jnp.int32)
    for i in range(30):
        state, m = step(state, jax.random.PRNGKey(i), x, y)
    assert jnp.isfinite(m["train_loss"])
    variables = state.variables()
    s0 = model.sample(variables, jax.random.PRNGKey(99), 4, (16, 16, 1),
                      y=jnp.zeros((4,), jnp.int32), guidance=2.0, nsteps=6)
    s1 = model.sample(variables, jax.random.PRNGKey(99), 4, (16, 16, 1),
                      y=jnp.ones((4,), jnp.int32), guidance=2.0, nsteps=6)
    # same key, different class -> different (class-pulled) outputs
    assert float(jnp.mean(s1)) > float(jnp.mean(s0))
    # guidance=1 (no CFG mix) also runs and differs from guidance=2
    s1g1 = model.sample(variables, jax.random.PRNGKey(99), 4, (16, 16, 1),
                        y=jnp.ones((4,), jnp.int32), guidance=1.0, nsteps=6)
    assert not np.allclose(np.asarray(s1), np.asarray(s1g1))


def test_denoiser_sample_statistics_per_sigma():
    """Sample-statistic parity at the BASELINE.md tolerance (rtol/atol
    1e-2): per-sigma mean/std of the oracle denoiser's outputs through
    the full get_denoiser path match the closed form. For data
    N(mu, s^2 I) noised to x = x0 + sigma*eps:
        D(x; sigma) = mu + w (x - mu),  w = s^2/(s^2 + sigma^2)
        => mean(D) = mu,  std(D) = w * sqrt(s^2 + sigma^2)
                                 = s^2 / sqrt(s^2 + sigma^2)."""
    mu, s = 0.7, 1.3
    dataset = data.SingleGaussianDataset(num_samples=4096, x0=[mu] * 4,
                                         scale=s)
    model, variables = make_oracle_module(dataset)
    key = jax.random.PRNGKey(3)
    x0 = dataset.sample(key)
    for sigma_val in (0.05, 0.5, 2.0, 10.0):
        key, keps = jax.random.split(key)
        eps = jax.random.normal(keps, x0.shape)
        x_noised = x0 + sigma_val * eps
        sigma = jnp.full((x0.shape[0],), sigma_val)
        d, _ = model.get_denoiser(variables, x_noised, sigma)
        got_mean = float(jnp.mean(d))
        got_std = float(jnp.std(d))
        want_std = s ** 2 / np.sqrt(s ** 2 + sigma_val ** 2)
        np.testing.assert_allclose(got_mean, mu, rtol=1e-2, atol=5e-2,
                                   err_msg=f"mean at sigma={sigma_val}")
        np.testing.assert_allclose(got_std, want_std, rtol=3e-2,
                                   err_msg=f"std at sigma={sigma_val}")


def test_interval_guidance():
    """IntervalGuidance (arXiv:2404.07724): CFG applies only for sigma in
    [lo, hi] — inside the band the denoiser equals plain guidance g,
    outside it equals guidance 1; an interval covering all sigmas
    reproduces plain CFG end-to-end through sample()."""
    from diffsci_tpu.models import (KarrasModel, KarrasModelConfig,
                                    IntervalGuidance)
    from diffsci_tpu.models.nets import MLPCond

    model = KarrasModel(MLPCond(dim=2, ydim=2, hidden_dims=[16]),
                        KarrasModelConfig.from_edm(),
                        conditional=True)
    y = jnp.ones((4, 2))
    variables = model.init(jax.random.PRNGKey(0), (4, 2), y)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 2))

    ig = IntervalGuidance(2.5, 0.3, 5.0)
    for sig_val, matches_cfg in ((1.0, True), (20.0, False), (0.01, False)):
        sigma = jnp.full((4,), sig_val)
        d_ig, _ = model.get_denoiser(variables, x, sigma, y, guidance=ig)
        d_g, _ = model.get_denoiser(variables, x, sigma, y, guidance=2.5)
        d_1, _ = model.get_denoiser(variables, x, sigma, y, guidance=1.0)
        want = d_g if matches_cfg else d_1
        np.testing.assert_allclose(np.asarray(d_ig), np.asarray(want),
                                   rtol=1e-6)
    # mixed batch: rows straddle the boundary in ONE call
    sigma = jnp.array([1.0, 1.0, 20.0, 20.0])
    d_ig, _ = model.get_denoiser(variables, x, sigma, y, guidance=ig)
    d_g, _ = model.get_denoiser(variables, x, sigma, y, guidance=2.5)
    d_1, _ = model.get_denoiser(variables, x, sigma, y, guidance=1.0)
    np.testing.assert_allclose(np.asarray(d_ig[:2]), np.asarray(d_g[:2]),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(d_ig[2:]), np.asarray(d_1[2:]),
                               rtol=1e-6)

    # end-to-end: an all-sigma interval == plain CFG through the jitted
    # sampler; a narrow interval differs from both plain settings
    wide = IntervalGuidance(2.5, 0.0, 1e9)
    s_wide = model.sample(variables, jax.random.PRNGKey(9), 4, (2,),
                          y=y, guidance=wide, nsteps=6)
    s_cfg = model.sample(variables, jax.random.PRNGKey(9), 4, (2,),
                         y=y, guidance=2.5, nsteps=6)
    np.testing.assert_allclose(np.asarray(s_wide), np.asarray(s_cfg),
                               rtol=1e-5, atol=1e-6)
    s_band = model.sample(variables, jax.random.PRNGKey(9), 4, (2,),
                          y=y, guidance=IntervalGuidance(2.5, 0.3, 5.0),
                          nsteps=6)
    s_g1 = model.sample(variables, jax.random.PRNGKey(9), 4, (2,),
                        y=y, guidance=1.0, nsteps=6)
    assert not np.allclose(np.asarray(s_band), np.asarray(s_cfg))
    assert not np.allclose(np.asarray(s_band), np.asarray(s_g1))
