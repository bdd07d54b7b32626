"""Round-3g golden parity fixtures: the VAE training stack
(vae/vaemodule.py) — posterior distribution methods, the TV loss, the
full VAELoss.forward (NLL+KL, TV, all three distillation modes), and the
adversarial generator/discriminator losses.

Replayed noise: the reference's DiagonalGaussianDistribution.sample draws
``torch.randn(mean.shape)`` (vaemodule.py:792-796) — shimmed to a fixed
array so both frameworks sample identical latents.

Documented upstream bug (pinned around, not reproduced): VAELoss.forward
applies total_variation_weight TWICE — TotalVariationLoss already scales
by tv_weight (vaemodule.py:180) and the caller multiplies again
(vaemodule.py:286) — so the fixture uses weight 1.0 where w^2 == w; the
standalone TV-loss fixture pins the single-weight module at w=0.7.

Usage: python scripts/gen_reference_fixtures_r3g.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_reference_fixtures import install_stubs, OUTDIR  # noqa: E402


def _vaenet_cfg():
    from diffsci.models.nets.vaenet import VAENetConfig
    return VAENetConfig(dimension=2, in_channels=1, out_channels=1,
                        z_channels=3, z_dim=3, ch=8, ch_mult=[1, 2],
                        num_res_blocks=1, attn_resolutions=[],
                        resolution=16, has_mid_attn=True, num_groups=1,
                        use_flash_attention=False, dropout=0.0)


def gen_vae_distrib():
    """DiagonalGaussianDistribution: kl / kl_thresholded / nll /
    modified_hellinger / wasserstein (vaemodule.py:778-884)."""
    import torch
    from diffsci.models.vae.vaemodule import DiagonalGaussianDistribution

    rng = np.random.default_rng(160)
    m1 = rng.standard_normal((3, 6, 4, 4)).astype(np.float32)
    m2 = rng.standard_normal((3, 6, 4, 4)).astype(np.float32)
    samp = rng.standard_normal((3, 3, 4, 4)).astype(np.float32)
    out = {"m1": m1, "m2": m2, "samp": samp}
    d1 = DiagonalGaussianDistribution(torch.tensor(m1))
    d2 = DiagonalGaussianDistribution(torch.tensor(m2))
    with torch.no_grad():
        for rm in (False, True):
            tag = "mean" if rm else "sum"
            out[f"kl_prior_{tag}"] = d1.kl(reduce_mean=rm).numpy()
            out[f"kl_other_{tag}"] = d1.kl(d2, reduce_mean=rm).numpy()
            out[f"hell_{tag}"] = d1.modified_hellinger(
                d2, reduce_mean=rm).numpy()
            out[f"wass_{tag}"] = d1.wasserstein(d2, reduce_mean=rm).numpy()
        out["nll"] = d1.nll(torch.tensor(samp)).numpy()
        out["klthr_prior"] = d1.kl_thresholded(
            reduce_mean=True, threshold=0.5).numpy()
        out["klthr_other"] = d1.kl_thresholded(
            d2, reduce_mean=True, threshold=0.8).numpy()
    np.savez_compressed(os.path.join(OUTDIR, "vae_distrib.npz"), **out)
    print(f"wrote vae_distrib.npz ({len(out)} arrays)")


def gen_tv_loss():
    """TotalVariationLoss standalone, 2D + 3D, mse + huber, w=0.7
    (vaemodule.py:116-191)."""
    import torch
    from diffsci.models.vae.vaemodule import TotalVariationLoss

    rng = np.random.default_rng(161)
    out = {}
    for tag, shape in [("2d", (2, 1, 6, 6)), ("3d", (2, 2, 4, 4, 4))]:
        xr = rng.standard_normal(shape).astype(np.float32)
        xf = rng.standard_normal(shape).astype(np.float32)
        out[f"x_{tag}"] = xr
        out[f"xrec_{tag}"] = xf
        for metric in ("mse", "huber"):
            loss = TotalVariationLoss(reconstruction_loss=metric,
                                      tv_weight=0.7)
            with torch.no_grad():
                val, _ = loss(torch.tensor(xr), torch.tensor(xf))
            out[f"tv_{tag}_{metric}"] = np.float64(val.item())
            print(f"  tv {tag} {metric} = {val.item():.8f}")
    np.savez_compressed(os.path.join(OUTDIR, "vae_tv_loss.npz"), **out)
    print("wrote vae_tv_loss.npz")


def gen_vae_module_losses():
    """VAELoss.forward + generator/discriminator adversarial losses with
    transferred VAENet (student + teacher) weights and replayed z-noise
    (vaemodule.py:233-399, 500-566)."""
    import torch
    from diffsci.models.nets.vaenet import VAENet
    from diffsci.models.vae.vaemodule import VAEModule, VAEModuleConfig

    torch.manual_seed(170)
    student = VAENet(_vaenet_cfg())
    torch.manual_seed(171)
    teacher = VAENet(_vaenet_cfg())
    student.eval()
    teacher.eval()

    rng = np.random.default_rng(162)
    x = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    eps_z = rng.standard_normal((2, 3, 8, 8)).astype(np.float32)
    out = {"x": x, "eps_z": eps_z}
    for k, v in student.state_dict().items():
        out["ssd__" + k] = v.numpy()
    for k, v in teacher.state_dict().items():
        out["tsd__" + k] = v.numpy()

    fixed = torch.tensor(eps_z)
    orig_randn, orig_rl = torch.randn, torch.randn_like

    def shim_randn(*shape, **kw):
        shape = shape[0] if len(shape) == 1 and isinstance(
            shape[0], (tuple, list, torch.Size)) else shape
        assert tuple(shape) == tuple(fixed.shape), shape
        return fixed.clone()

    cases = {
        "plain": dict(reduce_mean=True, kl_weight=1e-3,
                      reconstruction_loss="mse"),
        "sum_huber": dict(reduce_mean=False, kl_weight=0.5,
                          reconstruction_loss="huber"),
        "tv": dict(reduce_mean=True, reconstruction_loss="mse",
                   total_variation_weight=1.0),
        "distill_enc_kl": dict(reduce_mean=True,
                               reconstruction_loss="mse",
                               teaching_mode="encoder",
                               latent_matching_type="kl",
                               distillation_alpha=0.4),
        "distill_dec": dict(reduce_mean=True, reconstruction_loss="mse",
                            teaching_mode="decoder",
                            distillation_alpha=0.4),
        "distill_both_wass": dict(reduce_mean=False,
                                  reconstruction_loss="huber",
                                  teaching_mode="both",
                                  latent_matching_type="wasserstein",
                                  distillation_alpha=0.4),
        "distill_only": dict(reduce_mean=True, reconstruction_loss="mse",
                             teaching_mode="both",
                             latent_matching_type="modhell",
                             distillation_alpha=1.0),
    }
    xt = torch.tensor(x)
    for name, kw in cases.items():
        if name.startswith("distill"):
            kw = dict(kw, teacher_encdec=teacher)
        cfg = VAEModuleConfig(**kw)
        module = VAEModule(student, cfg)
        module.eval()
        torch.randn = shim_randn
        torch.randn_like = lambda z, **k: fixed.to(z)
        try:
            with torch.no_grad():
                loss, logs = module.loss_module(xt, module, None)
        finally:
            torch.randn, torch.randn_like = orig_randn, orig_rl
        out[f"loss_{name}"] = np.float64(loss.item())
        print(f"  vae loss_{name} = {loss.item():.8f}")

    # --- adversarial generator + discriminator losses ---
    torch.manual_seed(172)
    disc = torch.nn.Conv2d(1, 1, 3, padding=1)
    out["dsd__weight"] = disc.weight.detach().numpy()
    out["dsd__bias"] = disc.bias.detach().numpy()
    cfg = VAEModuleConfig(reduce_mean=True, reconstruction_loss="mse",
                          adversarial_weight=0.05, label_smoothing=0.1)
    module = VAEModule(student, cfg, discriminator=disc)
    module.eval()
    torch.randn = shim_randn
    torch.randn_like = lambda z, **k: fixed.to(z)
    try:
        with torch.no_grad():
            gen_loss, gen_logs = module.generator_loss_fn(xt)
            disc_loss, disc_logs = module.discriminator_loss_fn(xt)
    finally:
        torch.randn, torch.randn_like = orig_randn, orig_rl
    out["gen_loss"] = np.float64(gen_loss.item())
    out["gen_adv"] = np.float64(gen_logs["gen_adversarial_loss"])
    out["disc_loss"] = np.float64(disc_loss.item())
    out["d_accuracy"] = np.float64(disc_logs["d_accuracy"])
    print(f"  gen_loss = {gen_loss.item():.8f}  "
          f"disc_loss = {disc_loss.item():.8f}  "
          f"d_acc = {disc_logs['d_accuracy']:.4f}")
    np.savez_compressed(os.path.join(OUTDIR, "vae_module_losses.npz"),
                        **out)
    print("wrote vae_module_losses.npz")


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch
    sys.modules["lightning"].LightningModule = torch.nn.Module
    sys.modules["lightning.pytorch"].LightningModule = torch.nn.Module
    torch.manual_seed(0)
    os.makedirs(OUTDIR, exist_ok=True)

    gen_vae_distrib()
    gen_tv_loss()
    gen_vae_module_losses()


if __name__ == "__main__":
    main()
