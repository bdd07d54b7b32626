"""Tests for the remaining inventory components: VAENet, PUNetG variants,
PUNetV, classifiers, DASC, converters, EDMModel, KarrasEncoderModel,
ForecastModel, SDE stack, metrics."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

KEY = jax.random.PRNGKey(0)


# ---------------------------------------------------------------------------
# VAENet + patched conv
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_vaenet_roundtrip_2d():
    from diffsci_tpu.models.nets import VAENet, VAENetConfig
    cfg = VAENetConfig(dimension=2, z_channels=2, z_dim=2, ch=8,
                       ch_mult=[1, 2], num_res_blocks=1, resolution=16,
                       has_mid_attn=False, num_groups=4)
    net = VAENet(cfg)
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    variables = net.init({"params": KEY}, x)
    moments, recon = net.apply(variables, x)
    assert moments.shape == (2, 8, 8, 4)  # double_z
    assert recon.shape == x.shape
    z = net.apply(variables, x, key=jax.random.PRNGKey(1),
                  method=VAENet.encode)
    assert z.shape == (2, 8, 8, 2)


@pytest.mark.slow
def test_vaenet_minimal_rf_and_1d():
    from diffsci_tpu.models.nets import VAENet, VAENetConfig
    cfg = VAENetConfig(dimension=1, z_channels=2, z_dim=2, ch=8,
                       ch_mult=[1, 2], num_res_blocks=1, resolution=32,
                       has_mid_attn=False, minimal_rf_mode=True,
                       num_groups=4)
    net = VAENet(cfg)
    x = jax.random.normal(KEY, (2, 32, 1))
    variables = net.init({"params": KEY}, x)
    moments, recon = net.apply(variables, x)
    assert recon.shape == x.shape
    # minimal blocks have smaller receptive radius
    cfg_std = VAENetConfig(dimension=1, ch=8, ch_mult=[1, 2],
                           num_res_blocks=1, has_mid_attn=False)
    assert VAENet(cfg).receptive_radius() < \
        VAENet(cfg_std).receptive_radius()


@pytest.mark.slow
def test_vaenet_time_conditioned():
    """TimeVAENet coverage (timevaenet.py = with_time_emb config)."""
    from diffsci_tpu.models.nets import VAENet, VAENetConfig
    cfg = VAENetConfig(dimension=2, z_channels=2, z_dim=2, ch=8,
                       ch_mult=[1], num_res_blocks=1, resolution=8,
                       has_mid_attn=False, with_time_emb=True, num_groups=4)
    net = VAENet(cfg)
    x = jax.random.normal(KEY, (2, 8, 8, 1))
    t = jnp.ones((2,))
    variables = net.init({"params": KEY}, x, t)
    m1, _ = net.apply(variables, x, t)
    m2, _ = net.apply(variables, x, t * 5.0)
    assert not jnp.allclose(m1, m2)  # time actually conditions


def test_patched_conv_matches_direct():
    from diffsci_tpu.models.nets import patched_conv, divide_dims
    assert divide_dims(10, 4) == [(0, 4), (4, 8), (8, 10)]
    conv = nn.Conv(3, (3, 3), padding="VALID")
    x = jax.random.normal(KEY, (1, 16, 16, 2))
    variables = conv.init(KEY, x)

    def conv_valid(w):
        return conv.apply(variables, w)

    same_conv = nn.Conv(3, (3, 3), padding="SAME")
    direct = same_conv.apply(variables, x)
    patched = patched_conv(x, conv_valid, patch_size=5, padding=1)
    np.testing.assert_allclose(patched, direct, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# PUNetG variants
# ---------------------------------------------------------------------------
def _small_punetg_cfg(**kw):
    from diffsci_tpu.models.nets import PUNetGConfig
    d = dict(model_channels=8, channel_expansion=[2],
             number_resnet_downward_block=1, number_resnet_upward_block=1,
             number_resnet_attn_block=1, number_resnet_before_attn_block=1,
             number_resnet_after_attn_block=1)
    d.update(kw)
    return PUNetGConfig(**d)


def test_punetg_encoder_decoder_halves():
    from diffsci_tpu.models.nets import PUNetGEncoder, PUNetGDecoder
    cfg = _small_punetg_cfg()
    enc = PUNetGEncoder(cfg, use_time_embedding=True)
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    t = jnp.ones((2,))
    ev = enc.init({"params": KEY, "dropout": KEY}, x, t,
                  return_intermediate_outputs=True)
    z, skips = enc.apply(ev, x, t, return_intermediate_outputs=True)
    assert z.shape == (2, 8, 8, 16)
    assert len(skips) == 1
    dec = PUNetGDecoder(cfg, use_time_embedding=True)
    dv = dec.init({"params": KEY, "dropout": KEY}, z, t, skips)
    out = dec.apply(dv, z, t, skips)
    assert out.shape == (2, 16, 16, 1)


def test_punetg_encoder_flattened():
    from diffsci_tpu.models.nets import PUNetGEncoder
    cfg = _small_punetg_cfg()
    enc = PUNetGEncoder(cfg, output_channels=10)
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    ev = enc.init({"params": KEY, "dropout": KEY}, x)
    out = enc.apply(ev, x)
    assert out.shape == (2, 10)


def test_punetg_deterministic():
    from diffsci_tpu.models.nets import PUNetGDeterministic
    cfg = _small_punetg_cfg()
    net = PUNetGDeterministic(cfg)
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    variables = net.init({"params": KEY, "dropout": KEY}, x)
    out = net.apply(variables, x)
    assert out.shape == (2, 16, 16, 1)
    # no time-projection params exist
    import jax.tree_util as jtu
    paths = [jtu.keystr(p) for p, _ in
             jtu.tree_leaves_with_path(variables["params"])]
    assert not any("time_projection" in p for p in paths)


@pytest.mark.slow
def test_punetv_slice_embeddings():
    from diffsci_tpu.models.nets import PUNetV, PUNetVConfig
    cfg = PUNetVConfig(model_channels=8, channel_expansion=[2],
                       number_resnet_downward_block=1,
                       number_resnet_upward_block=1,
                       number_resnet_attn_block=1,
                       number_resnet_before_attn_block=1,
                       number_resnet_after_attn_block=1,
                       slice_embed_channels=2)
    net = PUNetV(cfg)
    x = jax.random.normal(KEY, (2, 16, 16, 1))
    t = jnp.ones((2,))
    y = {"yb": jax.random.normal(KEY, (2, 3, 16, 16, 2)),
         "temporal_mask": jnp.array([[1.0, 1.0, 0.0], [1.0, 1.0, 1.0]])}
    variables = net.init({"params": KEY, "dropout": KEY}, x, t, y)
    out = net.apply(variables, x, t, y)
    assert out.shape == (2, 16, 16, 1)
    # masked frames must not influence the output
    yb2 = y["yb"].at[0, 2].set(999.0)  # masked-out frame of sample 0
    out2 = net.apply(variables, x, t, {"yb": yb2,
                                       "temporal_mask": y["temporal_mask"]})
    np.testing.assert_allclose(out, out2, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# classifiers, DASC
# ---------------------------------------------------------------------------
def test_minimal_resnet_classifier_and_features():
    from diffsci_tpu.models.nets import MinimalResNet
    from diffsci_tpu.metrics import classifier_features_fn
    clf = MinimalResNet(out_classes=10, model_channels=8, n_layers=2)
    x = jax.random.normal(KEY, (4, 16, 16, 1))
    variables = clf.init(KEY, x)
    logits = clf.apply(variables, x)
    assert logits.shape == (4, 10)
    feats = classifier_features_fn(clf, variables)(x)
    assert feats.shape == (4, 8)


@pytest.mark.slow
def test_dasc():
    from diffsci_tpu.models.nets import DASC, DASCConfig, dasc_loss
    cfg = DASCConfig(in_channels=1, frame_height=16, frame_width=16,
                     frames_per_video=3, latent_dim=16, num_videos=4,
                     encoder_channels=(8, 16))
    model = DASC(cfg)
    x = jax.random.normal(KEY, (4, 3, 16, 16, 1))
    variables = model.init(KEY, x, all_videos_mode=True)
    out = model.apply(variables, x, all_videos_mode=True)
    assert out["reconstructed"].shape == x.shape
    assert out["frame_features"].shape == (4, 3, 16)
    assert out["video_features"].shape == (4, 16)
    assert out["attention_weights"].shape == (4, 3)
    np.testing.assert_allclose(jnp.diag(out["coefficient_matrix"]), 0.0)
    total, logs = dasc_loss(cfg, out, x, stage="second")
    assert jnp.isfinite(total) and "sparsity" in logs
    # batch mode: no SRM outputs, still reconstructs
    out_b = model.apply(variables, x)
    assert "coefficient_matrix" not in out_b
    assert out_b["reconstructed"].shape == x.shape


# ---------------------------------------------------------------------------
# converters
# ---------------------------------------------------------------------------
def test_conv_to_circular_conversion():
    from diffsci_tpu.models.nets import PUNetG
    from diffsci_tpu.extra.converters import convert_conv_params_to_circular
    cfg_default = _small_punetg_cfg(convolution_type="default")
    cfg_circ = _small_punetg_cfg(convolution_type="circular")
    x = jax.random.normal(KEY, (1, 16, 16, 1))
    t = jnp.ones((1,))
    v_default = PUNetG(cfg_default).init({"params": KEY, "dropout": KEY},
                                         x, t)
    v_circ = PUNetG(cfg_circ).init({"params": KEY, "dropout": KEY}, x, t)
    converted = convert_conv_params_to_circular(v_default["params"],
                                                v_circ["params"])
    # structure matches the circular model; kernels carried over
    assert jax.tree.structure(converted) == \
        jax.tree.structure(v_circ["params"])
    # spot check one kernel moved across
    total_src = sum(float(jnp.sum(jnp.abs(l)))
                    for l in jax.tree.leaves(v_default["params"]))
    total_dst = sum(float(jnp.sum(jnp.abs(l)))
                    for l in jax.tree.leaves(converted))
    np.testing.assert_allclose(total_src, total_dst, rtol=1e-5)


def test_torch_layout_converters():
    from diffsci_tpu.extra.converters import (torch_kernel_to_jax,
                                              torch_linear_to_jax)
    w = np.arange(2 * 3 * 5 * 5).reshape(2, 3, 5, 5).astype(np.float32)
    wj = torch_kernel_to_jax(w)
    assert wj.shape == (5, 5, 3, 2)
    lin = np.arange(6).reshape(2, 3).astype(np.float32)
    assert torch_linear_to_jax(lin).shape == (3, 2)


# ---------------------------------------------------------------------------
# EDMModel, KarrasEncoderModel, ForecastModel
# ---------------------------------------------------------------------------
def test_edm_minimal_model():
    from diffsci_tpu.models.karras import EDMModel, EDMModelConfig
    from diffsci_tpu import data

    class Oracle(nn.Module):
        dataset: object

        @nn.compact
        def __call__(self, x, t=None, y=None, train=False):
            d = self.param("d", nn.initializers.ones, ())
            # invert the EDM preconditioning so the denoiser is exact:
            # F = (D(x/c_in; sigma) - c_skip x/c_in) / c_out with x
            # already scaled; simpler: make loss nonzero but finite
            return x * 0.0 + 0.0 * d

    ds = data.ZeroDataset(4, [2])
    config = EDMModelConfig(loss_metric="mse")
    model = EDMModel(Oracle(ds), config)
    variables = model.init(KEY, (4, 2))
    sigma = config.sample_sigma(KEY, (8,))
    x = jnp.zeros((8, 2))
    loss = model.loss_fn(variables, KEY, x, sigma)
    assert jnp.isfinite(loss)
    # F = 0 => D = c_skip x; for the zero dataset prob-flow pulls to 0-ish
    out = model.sample(variables, KEY, 8, (2,), nsteps=20)
    assert out.shape == (8, 2)
    assert jnp.max(jnp.abs(out)) < 1.0


def test_karras_encoder_model():
    from diffsci_tpu.models.karras import KarrasEncoderModel
    from diffsci_tpu.models import KarrasModelConfig

    class Enc(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            h = jnp.mean(x, axis=tuple(range(1, x.ndim - 1)))
            return nn.Dense(4)(h)

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, t=None, y=None, train=False):
            h = nn.Conv(8, (3, 3), padding="SAME")(x)
            if y is not None:
                h = h + nn.Dense(8)(y)[:, None, None, :]
            return nn.Conv(1, (3, 3), padding="SAME")(nn.silu(h))

    config = KarrasModelConfig.from_edm(loss_metric="mse")
    model = KarrasEncoderModel(Net(), Enc(), config)
    variables = model.init(KEY, (2, 8, 8, 1))
    x = jax.random.normal(KEY, (4, 8, 8, 1))
    sigma = jnp.ones((4,))
    loss, _ = model.loss_fn(variables, KEY, x, sigma)
    assert jnp.isfinite(loss)
    y = model.encode_condition(variables, x)
    assert y.shape == (4, 4)
    # select_batch treats batches as unconditional
    xb, yb, mb = model.select_batch(x)
    assert yb is None and mb is None
    assert model.conditional  # flag restored


def test_forecast_model():
    from diffsci_tpu.models import ForecastModel, ForecastModelConfig

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, y=None, train=False):
            h = nn.Conv(8, (3, 3), padding="SAME")(x)
            return nn.Conv(1, (3, 3), padding="SAME")(nn.silu(h))

    config = ForecastModelConfig(loss_metric="mse")
    model = ForecastModel(Net(), config, conditional=True)
    y = {"y": jax.random.normal(KEY, (4, 8, 8, 2))}
    variables = model.init(KEY, y)
    x = jax.random.normal(KEY, (4, 8, 8, 1))
    loss = model.loss_fn(variables, KEY, x, y)
    assert jnp.isfinite(loss)
    pred = model.predict(variables, y)
    assert pred.shape == (4, 8, 8, 1)
    out = model.sample(variables, KEY, y, maximum_batch_size=2)
    np.testing.assert_allclose(out, pred, rtol=1e-5)


# ---------------------------------------------------------------------------
# SDE legacy stack
# ---------------------------------------------------------------------------
def test_sde_schedulers_math():
    from diffsci_tpu.models.sde import (VPSchedulerLinear, SubVPScheduler,
                                        VEScheduler)
    t = jnp.linspace(0.1, 1.0, 5)
    vp = VPSchedulerLinear(coef=19.9)
    assert jnp.all(vp.std2(t) > 0) and jnp.all(vp.std2(t) < 1.1)
    sub = SubVPScheduler(coef=19.9)
    np.testing.assert_allclose(sub.std2_(t),
                               (1 - jnp.exp(-vp.betaint(t))) ** 2,
                               rtol=1e-6)
    ve = VEScheduler(sigma_min=0.01, sigma_max=10.0)
    np.testing.assert_allclose(ve.sigma(jnp.float32(0.0)), 0.01, rtol=1e-5)
    np.testing.assert_allclose(ve.sigma(jnp.float32(1.0)), 10.0, rtol=1e-5)


@pytest.mark.slow
def test_sde_model_end_to_end():
    """Oracle noise predictor on a point mass: sampling converges."""
    from diffsci_tpu.models.sde import SDEModel, VPSchedulerConstant

    # Tmin must stay >= the uniform grid step: the reference's pf sampler
    # (pfsamplers.py:62-68) integrates a rhs ~ (x-m)/std2(t) on a uniform
    # grid, which diverges once dt > t (stiff); with the reference's true
    # 1e-8 stabilizer the old Tmin=1e-5 default amplifies an oracle score
    # ~100x over the last few steps in ANY framework.
    sched = VPSchedulerConstant(coef=8.0, Tmin=5e-3)

    class OracleEps(nn.Module):
        @nn.compact
        def __call__(self, x, t=None, y=None, train=False):
            d = self.param("d", nn.initializers.ones, ())
            # point mass at 0.5: mean(t) = 0.5 exp(-B/2);
            # eps_hat = (x - mean)/std
            m = 0.5 * jnp.exp(-0.5 * sched.betaint(t))
            s = sched.std(t)
            return (x - m[:, None]) / s[:, None] + 0.0 * d

    model = SDEModel(OracleEps(), sched)
    variables = model.init(KEY, (4, 1))
    x = jnp.full((32, 1), 0.5)
    loss = model.loss_fn(variables, KEY, x)
    assert float(loss) < 1e-6
    out = model.sample(variables, KEY, 256, (1,), nsteps=300)
    assert abs(float(jnp.mean(out)) - 0.5) < 0.1
    out_pf = model.sample(variables, KEY, 64, (1,), nsteps=300,
                          probability_flow=True)
    assert abs(float(jnp.mean(out_pf)) - 0.5) < 0.1


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------
def test_fid_zero_for_identical_and_positive_for_shifted():
    from diffsci_tpu.metrics import fid, kid, sample_statistics
    rng = np.random.default_rng(0)
    a = rng.standard_normal((500, 8))
    b = rng.standard_normal((500, 8))
    shifted = a + 2.0
    assert fid(a, a) == pytest.approx(0.0, abs=1e-6)
    assert fid(a, b) < fid(a, shifted)
    assert abs(fid(a, shifted) - 4 * 8) < 2.0  # ||2||^2 per dim
    assert kid(a, b) < kid(a, shifted)
    stats = sample_statistics(a)
    assert abs(stats["mean"]) < 0.1 and abs(stats["std"] - 1.0) < 0.1


@pytest.mark.slow
def test_fld_orders_models_and_detects_memorization():
    """FLD ~0 for true-distribution samples, large for shifted samples,
    and — the property FID lacks — WORSE for verbatim train copies than
    for fresh samples (Jiralerspong et al. 2023 structure)."""
    from diffsci_tpu.metrics import fld, fld_generalization_gap
    rng = np.random.default_rng(0)
    d = 6
    train = rng.standard_normal((3000, d))
    test = rng.standard_normal((1500, d))
    fresh = rng.standard_normal((600, d))
    shifted = rng.standard_normal((600, d)) + 2.5
    memorized = train[:600]  # exact copies of training points

    kw = dict(n_iters=150, lr=0.1, seed=1)
    f_fresh = fld(train, test, fresh, **kw)
    f_shift = fld(train, test, shifted, **kw)
    f_mem = fld(train, test, memorized, **kw)
    # self-calibrated: true samples score near the train-subset baseline
    assert abs(f_fresh) < 25.0
    assert f_shift > f_fresh + 50.0
    assert f_mem > f_fresh + 3.0  # memorization penalized (measured ~6.6 vs ~0.1)

    # the generalization-gap diagnostic separates the same pair
    g_fresh = fld_generalization_gap(train, fresh, **kw)
    g_mem = fld_generalization_gap(train, memorized, **kw)
    assert g_mem > g_fresh + 5.0


# ---------------------------------------------------------------------------
# edge-detection loss preprocessor (reference preprocessors.py:28-352)
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_edge_preprocessor_features():
    from diffsci_tpu.ops import EdgeDetectionPreprocessor, smoothstep_window
    # window: interior ones, smooth taper, endpoints zero
    w = smoothstep_window(16, 4)
    assert w[0] == 0.0 and w[8] == 1.0 and 0 < w[2] < 1
    np.testing.assert_allclose(w, w[::-1])

    pre = EdgeDetectionPreprocessor(dim=2, border_width=2)
    x = jnp.zeros((1, 16, 16, 1)).at[:, :, 8:, :].set(1.0)  # vertical step
    feats = jax.jit(pre)(x)
    assert feats.shape == (1, 16, 16, 5)  # 5 processors, 1 channel each
    orig, sobel, lap, grad, morph = [feats[0, :, :, i] for i in range(5)]
    # constant image -> all edge responses vanish
    flat = jax.jit(pre)(jnp.ones((1, 16, 16, 1)) * 0.3)
    for i in range(1, 5):
        # sobel/grad floor at sqrt(1e-8)=1e-4 (same epsilon as reference)
        np.testing.assert_allclose(flat[0, 4:12, 4:12, i], 0.0, atol=1e-3)
    # step edge: sobel/grad/morph peak at the boundary column
    assert float(sobel[8, 8]) > float(sobel[8, 4])
    assert float(morph[8, 8]) > 0.1
    # gradients flow (differentiable)
    g = jax.grad(lambda z: jnp.sum(pre(z) ** 2))(x)
    assert jnp.all(jnp.isfinite(g))
    # 3D path
    pre3 = EdgeDetectionPreprocessor(dim=3, processors=["sobel"],
                                     border_width=0)
    f3 = pre3(jnp.zeros((1, 8, 8, 8, 2)))
    assert f3.shape == (1, 8, 8, 8, 2)
    with pytest.raises(ValueError):
        EdgeDetectionPreprocessor(processors="canny")


@pytest.mark.slow
def test_vae_edge_loss_preprocessor():
    """VAE training with loss_preprocessor='edges' (vaemodule.py:209-217)."""
    from diffsci_tpu.models.nets.vae import AutoencoderKL, DDConfig
    from diffsci_tpu.models.vae import (VAEModel, VAEModelConfig,
                                        create_vae_train_state,
                                        make_vae_train_step)
    dd = DDConfig(z_channels=2, resolution=16, ch=8, ch_mult=[1, 2],
                  num_res_blocks=1, has_mid_attn=False)
    config = VAEModelConfig(kl_weight=1e-4, reconstruction_loss="mse",
                            adversarial_weight=0.0,
                            loss_preprocessor="edges")
    model = VAEModel(AutoencoderKL(dd, embed_dim=2), config)
    state, tx, _ = create_vae_train_state(model, KEY, (4, 16, 16, 1))
    step_fn = make_vae_train_step(model, tx)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 1)) * 0.1
    state, m = step_fn(state, jax.random.PRNGKey(2), x)
    assert jnp.isfinite(m["train_loss"])


# ---------------------------------------------------------------------------
# HFNet family (reference hfnet.py:9-100)
# ---------------------------------------------------------------------------
@pytest.mark.slow
def test_hfnet_family():
    from diffsci_tpu.models.nets import HFNet, HFNetUncond, HFNetCond
    x = jnp.zeros((2, 16, 16, 1))
    t = jnp.ones((2,))
    net = HFNetUncond(block_channels=(8, 16), channels=1, norm_num_groups=4)
    v = net.init(KEY, x, t)
    out = net.apply(v, x, t)
    assert out.shape == x.shape
    cond = HFNetCond(block_channels=(8, 16), channels=1, cond_channels=2,
                     norm_num_groups=4, attn_up_and_down=True)
    y = jnp.zeros((2, 16, 16, 2))
    vc = cond.init(KEY, x, t, y)
    outc = cond.apply(vc, x, t, y)
    assert outc.shape == x.shape
    with pytest.raises(ValueError):
        cond.init(KEY, x, t, None)
    # non-integral channel ratios are fine on the native UNet2D backbone
    # (the old PUNetG-shim restriction is gone; diffusers' own defaults
    # use e.g. (224, 448, 672))
    v12 = HFNet(block_channels=(8, 12), norm_num_groups=4).init(KEY, x, t)
    assert HFNet(block_channels=(8, 12), norm_num_groups=4).apply(
        v12, x, t).shape == x.shape


def test_stochasticity_sweep_artifact_shape():
    """The committed FID-vs-gamma artifact must reproduce the reference
    stochasticity-study shape: FID at the best stochastic gamma beats the
    near-ODE end, and extreme churn degrades again (U-shape).
    Regenerate with scripts/stochasticity_study.py on TPU."""
    import json
    import pathlib

    path = (pathlib.Path(__file__).parents[1]
            / "docs" / "artifacts" / "stochasticity_sweep.json")
    art = json.loads(path.read_text())
    assert art["shape_ok"] is True
    fids = [p["fid"] for p in art["sweep"]]
    gammas = [p["gamma"] for p in art["sweep"]]
    best = fids.index(min(fids))
    assert 0 < best < len(fids) - 1          # interior minimum
    assert fids[best] < fids[0] * 0.85       # clearly beats near-ODE
    assert fids[-1] > fids[best] * 1.5       # extreme churn degrades
    assert gammas == sorted(gammas)


def test_sampler_comparison_artifact_claims():
    """Committed DPM-Solver++(2M) low-NFE artifact: the multistep sampler
    must beat Euler at matched NFE on the trained-shapes run.
    Regenerate with scripts/sampler_comparison.py on TPU."""
    import json
    import pathlib

    path = (pathlib.Path(__file__).parents[1]
            / "docs" / "artifacts" / "sampler_comparison.json")
    art = json.loads(path.read_text())
    assert all(art["claims"].values()), art["claims"]
    r = art["results"]
    assert r["dpmpp2m@10"]["fid"] < r["euler@10"]["fid"]
    assert r["dpmpp2m@20"]["fid"] < r["euler@20"]["fid"]
