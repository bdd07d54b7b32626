"""VAE stack tests: AutoencoderKL shapes, DiagonalGaussian math, trainer
losses (NLL+KL, TV, distillation, adversarial), latent diffusion wiring."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffsci_tpu.models.nets.vae import (AutoencoderKL, DDConfig,
                                         DiagonalGaussianDistribution)
from diffsci_tpu.models.vae import (VAEModel, VAEModelConfig,
                                    create_vae_train_state,
                                    make_vae_train_step,
                                    NLayerDiscriminator, BoundAutoencoder,
                                    total_variation, KLAnnealing)

KEY = jax.random.PRNGKey(0)


def small_dd(**kw):
    defaults = dict(z_channels=2, resolution=16, ch=8, ch_mult=[1, 2],
                    num_res_blocks=1, has_mid_attn=True)
    defaults.update(kw)
    return DDConfig(**defaults)


@pytest.mark.slow
def test_autoencoder_kl_shapes_2d():
    ae = AutoencoderKL(small_dd(), embed_dim=2)
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    variables = ae.init({"params": KEY}, x, key=KEY)
    recon, post = ae.apply(variables, x, key=jax.random.PRNGKey(1))
    assert recon.shape == x.shape
    # z at half resolution (one downsample for ch_mult len 2)
    assert post.mean.shape == (2, 8, 8, 2)
    # encode/decode via methods
    post2 = ae.apply(variables, x, method=AutoencoderKL.encode)
    dec = ae.apply(variables, post2.mode(), method=AutoencoderKL.decode)
    assert dec.shape == x.shape


@pytest.mark.slow
def test_autoencoder_kl_shapes_3d():
    ae = AutoencoderKL(small_dd(dimension=3, has_mid_attn=False),
                       embed_dim=2)
    x = jax.random.normal(KEY, (1, 8, 8, 8, 1))
    variables = ae.init({"params": KEY}, x, key=KEY)
    recon, post = ae.apply(variables, x, key=jax.random.PRNGKey(1))
    assert recon.shape == x.shape
    assert post.mean.shape == (1, 4, 4, 4, 2)


def test_diagonal_gaussian_math():
    params = jnp.concatenate([jnp.zeros((2, 4, 4, 2)),
                              jnp.zeros((2, 4, 4, 2))], axis=-1)
    d = DiagonalGaussianDistribution(params)
    # standard normal: KL to unit prior = 0
    np.testing.assert_allclose(d.kl(), 0.0, atol=1e-6)
    np.testing.assert_allclose(d.wasserstein(), 0.0, atol=1e-6)
    np.testing.assert_allclose(d.modified_hellinger(), 0.0, atol=1e-5)
    # shifted mean: KL = 0.5*sum(mu^2)
    params2 = jnp.concatenate([jnp.ones((2, 4, 4, 2)),
                               jnp.zeros((2, 4, 4, 2))], axis=-1)
    d2 = DiagonalGaussianDistribution(params2)
    np.testing.assert_allclose(d2.kl(), 0.5 * 32, rtol=1e-6)
    np.testing.assert_allclose(d2.kl(d), 0.5 * 32, rtol=1e-6)
    # nll of the mean = 0.5*sum(log 2pi + logvar)
    np.testing.assert_allclose(d2.nll(d2.mode()),
                               0.5 * 32 * np.log(2 * np.pi), rtol=1e-5)
    # kl_thresholded floors at the threshold
    thr = d.kl_thresholded(threshold=0.7)
    np.testing.assert_allclose(thr, 0.7)
    s = d2.sample(KEY)
    assert s.shape == d2.mean.shape


def test_total_variation():
    x = jnp.zeros((1, 4, 4, 1))
    np.testing.assert_allclose(total_variation(x), 0.0)
    x2 = jnp.array([[0.0, 1.0], [0.0, 1.0]]).reshape(1, 2, 2, 1)
    # H diffs: 0; W diffs: |1-0| * 2 rows = 2
    np.testing.assert_allclose(total_variation(x2), 2.0)


@pytest.mark.slow
def test_vae_train_step_runs_and_learns():
    config = VAEModelConfig(kl_weight=1e-4, reconstruction_loss="mse",
                            adversarial_weight=0.0)
    model = VAEModel(AutoencoderKL(small_dd(), embed_dim=2), config)
    state, tx, _ = create_vae_train_state(model, KEY, (8, 16, 16, 1))
    step_fn = make_vae_train_step(model, tx)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 1)) * 0.1 + 0.5
    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(15):
        key, sub = jax.random.split(key)
        state, m = step_fn(state, sub, x)
        losses.append(float(m["train_loss"]))
        assert "nll_loss" in m and "kl_loss" in m
    assert losses[-1] < losses[0]


@pytest.mark.slow
def test_vae_adversarial_training():
    config = VAEModelConfig(kl_weight=1e-4, adversarial_weight=0.1,
                            reconstruction_loss="mse",
                            discriminator_threshold=0.99)
    model = VAEModel(AutoencoderKL(small_dd(), embed_dim=2), config,
                     discriminator=NLayerDiscriminator(ndf=8, n_layers=2))
    assert model.is_adversarial
    state, tx, dtx = create_vae_train_state(model, KEY, (4, 16, 16, 1))
    step_fn = make_vae_train_step(model, tx, dtx)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 1))
    state, m = step_fn(state, jax.random.PRNGKey(2), x)
    assert "gen_adversarial_loss" in m
    assert "discriminator_loss" in m
    assert "d_accuracy" in m
    assert jnp.isfinite(m["train_loss"])


@pytest.mark.slow
def test_vae_distillation():
    dd = small_dd()
    teacher_net = AutoencoderKL(dd, embed_dim=2)
    x0 = jnp.zeros((2, 16, 16, 1))
    tvars = teacher_net.init({"params": jax.random.PRNGKey(9)}, x0, key=KEY)

    class Teacher:
        def encode_moments(self, x):
            h = teacher_net.apply(tvars, x, method=AutoencoderKL.encode)
            return h.parameters

        def decode(self, z):
            return teacher_net.apply(tvars, z, method=AutoencoderKL.decode)

    for mode in ("encoder", "decoder", "both"):
        config = VAEModelConfig(teacher=Teacher(), teaching_mode=mode,
                                distillation_alpha=0.5,
                                adversarial_weight=0.0,
                                reconstruction_loss="mse",
                                latent_matching_type="wasserstein")
        model = VAEModel(AutoencoderKL(dd, embed_dim=2), config)
        variables = model.init(KEY, (2, 16, 16, 1))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 1))
        loss, logs = model.loss_fn(variables, jax.random.PRNGKey(2), x)
        assert jnp.isfinite(loss)
        assert "latent_space_matching_loss" in logs


def test_kl_annealing():
    config = VAEModelConfig(kl_weight=0.0)
    ann = KLAnnealing(config, start=0.0, end=1e-3, num_epochs=10)
    ann.on_epoch(0)
    assert config.kl_weight == 0.0
    ann.on_epoch(5)
    np.testing.assert_allclose(config.kl_weight, 5e-4)
    ann.on_epoch(20)
    np.testing.assert_allclose(config.kl_weight, 1e-3)


@pytest.mark.slow
def test_latent_diffusion_wiring():
    """KarrasModel with a BoundAutoencoder: loss + sampling run through the
    latent space (karrasmodule.py:1192-1234 analogue)."""
    from diffsci_tpu.models import (KarrasModel, KarrasModelConfig,
                                    MLPUncond, PUNetG, PUNetGConfig)

    dd = small_dd()
    vconfig = VAEModelConfig(adversarial_weight=0.0,
                             reconstruction_loss="mse")
    vae = VAEModel(AutoencoderKL(dd, embed_dim=2), vconfig)
    vae_vars = vae.init(KEY, (2, 16, 16, 1))
    bound = BoundAutoencoder(vae, vae_vars, scale_factor=0.5)

    punet = PUNetG(PUNetGConfig(model_channels=8, channel_expansion=[2],
                                input_channels=2, output_channels=2,
                                number_resnet_downward_block=1,
                                number_resnet_upward_block=1,
                                number_resnet_attn_block=1,
                                number_resnet_before_attn_block=1,
                                number_resnet_after_attn_block=1))
    config = KarrasModelConfig.from_edm(loss_metric="mse")
    model = KarrasModel(punet, config, autoencoder=bound)
    assert model.latent_model
    # init on latent shape (8x8x2 after one downsample)
    variables = model.init(jax.random.PRNGKey(1), (2, 8, 8, 2))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 1))
    sigma = jnp.ones((2,))
    loss, _ = model.loss_fn(variables, jax.random.PRNGKey(3), x, sigma)
    assert jnp.isfinite(loss)
    # sampling decodes back to pixel space
    out = model.sample(variables, jax.random.PRNGKey(4), 2, (8, 8, 2),
                       nsteps=4, is_latent_shape=True)
    assert out.shape == (2, 16, 16, 1)


def test_channel_adapter_wrapper():
    """Channel expand/squeeze adapter around a 3-channel VAE
    (reference autoencoders.py:7-72)."""
    from diffsci_tpu.models.nets.autoencoders import (ChannelAdapterWrapper,
                                                      load_autoencoder)
    from diffsci_tpu.models.vae import VAEModel, VAEModelConfig, \
        BoundAutoencoder
    dd = small_dd(in_channels=3, out_ch=3)
    vae = VAEModel(AutoencoderKL(dd, embed_dim=2),
                   VAEModelConfig(adversarial_weight=0.0,
                                  reconstruction_loss="mse"))
    vv = vae.init(KEY, (2, 16, 16, 3))
    bound = BoundAutoencoder(vae, vv)
    wrap = ChannelAdapterWrapper(bound, channels=1, latent_channels=2)
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    z = wrap.encode(x, key=jax.random.PRNGKey(1))
    assert z.shape == (2, 8, 8, 2)
    rec = wrap.decode(z)
    assert rec.shape == (2, 16, 16, 1)
    # independent channels: 2 data channels -> concatenated latents
    wrap2 = ChannelAdapterWrapper(bound, channels=1,
                                  independent_channels=True,
                                  data_channels=2, latent_channels=2)
    x2 = jax.random.normal(KEY, (2, 16, 16, 2))
    z2 = wrap2.encode(x2, key=jax.random.PRNGKey(1))
    assert z2.shape == (2, 8, 8, 4)
    assert wrap2.decode(z2).shape == (2, 16, 16, 2)
    # factory
    ae = load_autoencoder("our_kl", ddconfig=dd.export_description())
    assert ae is not None
    import pytest
    with pytest.raises(NotImplementedError):
        load_autoencoder("kl1")
    with pytest.raises(ValueError):
        load_autoencoder("bogus")
