"""Round-3d golden parity fixtures: the legacy SDE stack, DDPM v2 loss,
the forecast loss, and the KarrasEncoder loop.

Extends gen_reference_fixtures{,_r3,_r3b,_r3c}.py with:

- SDE scheduler scalar tables: VP constant/linear, subVP, VE
  (sde/schedulers/{vp,subvp,ve}_schedulers.py)
- Probability-flow sampler trajectories, Euler + Heun, with an analytic
  score model (sde/samplers/pfsamplers.py:103-125); the reference's
  Euler-Maruyama SDE sampler is NOT pinned — its forward references the
  nonexistent ``self.x`` (sdesamplers.py:74) and cannot execute
- SDEModule.loss_fn with replayed noise + fixed t
  (sde/lmodules/sdemodule.py:75-101)
- DDPMModule.loss_fn with replayed noise + fixed t
  (ddpm/v2/ddpmmodule.py:141-170)
- ForecastModule.loss_fn scalar values incl. masked + spatial-weighted
  (regression/ForecastModule.py:456-500)
- KarrasEncoder.loss_fn with replayed noise (karrasencoder.py:37-44)

Fixture generator: run offline, outputs committed. The reference is
executed, never copied.

Usage: python scripts/gen_reference_fixtures_r3d.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_reference_fixtures import install_stubs, OUTDIR  # noqa: E402

T_GRID = np.linspace(1e-5, 1.0, 37, dtype=np.float64).astype(np.float32)


def gen_sde_tables():
    """Scheduler scalar tables over a t-grid.

    No subVP table: the reference's subvp_schedulers.py is a verbatim
    copy of vp_schedulers.py (diff shows only ctor-arg order) with no
    subVP math — our SubVPScheduler implements the actual Song et al.
    subVP formulas as a documented improvement."""
    import torch
    from diffsci.models.sde.schedulers.vp_schedulers import (
        VPSchedulerConstant, VPSchedulerLinear)
    from diffsci.models.sde.schedulers.ve_schedulers import VESchedulerSqrt

    scheds = {
        "vp_const": VPSchedulerConstant(coef=4.0),
        "vp_linear": VPSchedulerLinear(coef=16.0),
        "ve_sqrt": VESchedulerSqrt(),
    }
    t = torch.tensor(T_GRID)
    x = torch.linspace(-2.0, 2.0, 5)[None, :].repeat(len(T_GRID), 1)
    out = {"t": T_GRID, "x": x.numpy()}
    for name, s in scheds.items():
        out[f"{name}_mean"] = s.mean(t, x).numpy()
        out[f"{name}_std2"] = s.std2_(t).numpy()
        out[f"{name}_drift"] = s.drift_term(t, x).numpy()
        out[f"{name}_diffusion"] = s.diffusion_term(t).numpy()
        print(f"  {name}: std2 in [{out[f'{name}_std2'].min():.4f}, "
              f"{out[f'{name}_std2'].max():.4f}]")
    np.savez_compressed(os.path.join(OUTDIR, "sde_tables.npz"), **out)
    print(f"wrote sde_tables.npz ({len(out)} arrays)")


class _AnalyticScore:
    """Deterministic pseudo-score net shared with the JAX test:
    s(x, t) = -x / (1 + t) + 0.3 * tanh(x)."""

    def __init__(self):
        import torch
        self._torch = torch

    def eval(self):
        return self

    def __call__(self, x, t):
        t_ = t.reshape((-1,) + (1,) * (x.dim() - 1))
        return -x / (1.0 + t_) + 0.3 * self._torch.tanh(x)


def gen_sde_pf():
    """Euler + Heun probability-flow trajectories
    (pfsamplers.py:103-125)."""
    import torch
    from diffsci.models.sde.schedulers.vp_schedulers import VPSchedulerLinear
    from diffsci.models.sde.samplers.pfsamplers import (EulerPFSampler,
                                                        HeunPFSampler)

    sched = VPSchedulerLinear(coef=16.0)
    rng = np.random.default_rng(131)
    x0 = rng.standard_normal((4, 3)).astype(np.float32)
    out = {"x0": x0, "nsteps": np.int64(20)}
    model = _AnalyticScore()
    for name, cls in [("euler", EulerPFSampler), ("heun", HeunPFSampler)]:
        sampler = cls(model, sched, shape=[3])
        xf = sampler.forward(torch.tensor(x0), nsteps=20)
        out[f"pf_{name}_final"] = xf.numpy()
        print(f"  pf_{name}: |final| mean {np.abs(xf.numpy()).mean():.4f}")
    np.savez_compressed(os.path.join(OUTDIR, "sde_pf.npz"), **out)
    print("wrote sde_pf.npz")


def gen_sde_loss():
    """SDEModule.loss_fn with replayed noise (sdemodule.py:75-101)."""
    import torch
    # sdemodule.py:6 does `from diffsci.models import EulerMaruyamaSampler`
    # but the reference's own models/__init__.py never exports it — inject
    # the symbol so the module imports (broken upstream import)
    import diffsci.models as _dm
    from diffsci.models.sde.samplers.sdesamplers import EulerMaruyamaSampler
    _dm.EulerMaruyamaSampler = EulerMaruyamaSampler
    from diffsci.models.sde.lmodules.sdemodule import SDEModule
    from diffsci.models.sde.schedulers.vp_schedulers import VPSchedulerLinear
    from diffsci.models.sde.schedulers.ve_schedulers import VESchedulerSqrt
    from diffsci.models.nets.mlp import MLPUncond, MLPCond

    rng = np.random.default_rng(132)
    B, D, YD = 6, 3, 2
    x = rng.standard_normal((B, D)).astype(np.float32)
    t = np.linspace(0.1, 0.95, B).astype(np.float32)
    y = rng.standard_normal((B, YD)).astype(np.float32)
    eps = rng.standard_normal((B, D)).astype(np.float32)
    out = {"x": x, "t": t, "y": y, "eps": eps}

    torch.manual_seed(81)
    uncond = MLPUncond(D, hidden_dims=[16, 16])
    torch.manual_seed(82)
    cond = MLPCond(D, YD, hidden_dims=[16, 16])
    for k, v in uncond.state_dict().items():
        out["usd__" + k] = v.numpy()
    for k, v in cond.state_dict().items():
        out["csd__" + k] = v.numpy()

    fixed = torch.tensor(eps)
    orig = torch.randn_like
    cases = {
        "vp_mse": (VPSchedulerLinear(coef=16.0), "mse", 1.0, False),
        "ve_mse": (VESchedulerSqrt(), "mse", 1.0, False),
        "vp_huber": (VPSchedulerLinear(coef=16.0), "huber", 1.0, False),
        "vp_mse_scaled_cond": (VPSchedulerLinear(coef=16.0), "mse", 2.5,
                               True),
    }
    for name, (sched, metric, scale, conditional) in cases.items():
        module = SDEModule(cond if conditional else uncond, sched,
                           conditional=conditional, loss_type=metric,
                           loss_scale_factor=scale)
        torch.randn_like = lambda z, **kw: fixed.to(z)
        try:
            with torch.no_grad():
                loss = module.loss_fn(
                    torch.tensor(x), torch.tensor(t),
                    torch.tensor(y) if conditional else None)
        finally:
            torch.randn_like = orig
        out[f"loss_{name}"] = np.float64(loss.item())
        print(f"  sde loss_{name} = {loss.item():.8f}")
    np.savez_compressed(os.path.join(OUTDIR, "sde_loss.npz"), **out)
    print("wrote sde_loss.npz")


def gen_ddpm_loss():
    """DDPMModule.loss_fn with replayed noise (ddpmmodule.py:141-170)."""
    import torch
    from diffsci.models.ddpm.v2.ddpmmodule import (DDPMModule,
                                                   DDPMModuleConfig)
    from diffsci.models.nets.mlp import MLPUncond, MLPCond

    rng = np.random.default_rng(133)
    B, D, YD = 6, 3, 2
    x = rng.standard_normal((B, D)).astype(np.float32)
    t = np.array([1, 100, 250, 500, 750, 1000], np.float32)
    y = rng.standard_normal((B, YD)).astype(np.float32)
    eps = rng.standard_normal((B, D)).astype(np.float32)
    out = {"x": x, "t": t, "y": y, "eps": eps}

    torch.manual_seed(83)
    uncond = MLPUncond(D, hidden_dims=[16, 16])
    torch.manual_seed(84)
    cond = MLPCond(D, YD, hidden_dims=[16, 16])
    for k, v in uncond.state_dict().items():
        out["usd__" + k] = v.numpy()
    for k, v in cond.state_dict().items():
        out["csd__" + k] = v.numpy()

    fixed = torch.tensor(eps)
    orig = torch.randn_like
    cases = {
        "classical_huber": ("classical", 1, "huber", False),
        "classical_mse": ("classical", 1, "mse", False),
        "cosine_huber": ("cosine", 1, "huber", False),
        "classical_huber_cond": ("classical", 1, "huber", True),
    }
    for name, (sched, itype, metric, conditional) in cases.items():
        cfg = DDPMModuleConfig.from_classical_ddpm(integrator_type=itype,
                                                   scheduler=sched)
        cfg.loss_metric = metric
        module = DDPMModule(cond if conditional else uncond, cfg,
                            conditional=conditional)
        torch.randn_like = lambda z, **kw: fixed.to(z)
        try:
            with torch.no_grad():
                loss = module.loss_fn(
                    torch.tensor(x), torch.tensor(t),
                    torch.tensor(y) if conditional else None)
        finally:
            torch.randn_like = orig
        out[f"loss_{name}"] = np.float64(loss.item())
        print(f"  ddpm loss_{name} = {loss.item():.8f}")
    np.savez_compressed(os.path.join(OUTDIR, "ddpm_loss.npz"), **out)
    print("wrote ddpm_loss.npz")


def gen_forecast_loss():
    """ForecastModule.loss_fn scalars (ForecastModule.py:456-500):
    pure function of (pred, target, mask, weight-map) + loss metric."""
    import torch
    from diffsci.models.regression.ForecastModule import (
        ForecastModule, ForecastModuleConfig)

    rng = np.random.default_rng(134)
    B, C, H, W = 3, 2, 8, 8
    pred = rng.standard_normal((B, C, H, W)).astype(np.float32)
    target = rng.standard_normal((B, C, H, W)).astype(np.float32)
    mask = (rng.random((B, C, H, W)) < 0.7).astype(np.float32)  # 1=include
    wmap = np.exp(-((np.arange(H) - H / 2)[:, None] ** 2
                    + (np.arange(W) - W / 2)[None, :] ** 2)
                  / 8.0).astype(np.float32)
    out = {"pred": pred, "target": target, "mask": mask, "wmap": wmap}

    model = torch.nn.Linear(1, 1)  # unused by loss_fn
    cases = {
        "mse": ("mse", None, None),
        "huber": ("huber", None, None),
        "mse_masked": ("mse", mask, None),
        "mse_weighted": ("mse", None, wmap),
        "mse_masked_weighted": ("mse", mask, wmap),
    }
    for name, (metric, mk, wm) in cases.items():
        cfg = ForecastModuleConfig(
            loss_metric=metric,
            spatial_weight_map=None if wm is None else torch.tensor(wm))
        module = ForecastModule(model, cfg, conditional=True)
        with torch.no_grad():
            loss = module.loss_fn(
                torch.tensor(pred), torch.tensor(target),
                None if mk is None else torch.tensor(mk))
        out[f"loss_{name}"] = np.float64(loss.item())
        print(f"  forecast loss_{name} = {loss.item():.8f}")
    np.savez_compressed(os.path.join(OUTDIR, "forecast_loss.npz"), **out)
    print("wrote forecast_loss.npz")


def gen_karras_encoder_loss():
    """KarrasEncoder.loss_fn with replayed noise (karrasencoder.py:37-44):
    y is derived from the encoder, then the v1 EDM loss."""
    import torch
    from diffsci.models.karrasencoder.karrasencoder import KarrasEncoder
    from diffsci.models import KarrasModuleConfig
    from diffsci.models.nets.mlp import MLPUncond, MLPCond

    rng = np.random.default_rng(135)
    B, D, YD = 6, 3, 2
    x = rng.standard_normal((B, D)).astype(np.float32)
    sigma = np.array([0.2, 0.5, 1.0, 2.0, 5.0, 10.0], np.float32)
    eps = rng.standard_normal((B, D)).astype(np.float32)
    mask = (rng.random((B, D)) < 0.3).astype(np.float32)  # 1=exclude
    out = {"x": x, "sigma": sigma, "eps": eps, "mask": mask}

    torch.manual_seed(85)
    denoiser = MLPCond(D, YD, hidden_dims=[16, 16])
    torch.manual_seed(86)

    class Encoder(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.net = torch.nn.Linear(D, YD)

        def forward(self, x):
            return self.net(x)

    encoder = Encoder()
    for k, v in denoiser.state_dict().items():
        out["csd__" + k] = v.numpy()
    for k, v in encoder.state_dict().items():
        out["esd__" + k] = v.numpy()

    fixed = torch.tensor(eps)
    orig = torch.randn_like
    for name, mk in [("plain", None), ("masked", mask)]:
        module = KarrasEncoder(denoiser, encoder,
                               KarrasModuleConfig.from_edm(),
                               masked=mk is not None)
        torch.randn_like = lambda z, **kw: fixed.to(z)
        try:
            with torch.no_grad():
                loss = module.loss_fn(
                    torch.tensor(x), torch.tensor(sigma),
                    None if mk is None else torch.tensor(mk))
        finally:
            torch.randn_like = orig
        out[f"loss_{name}"] = np.float64(loss.item())
        print(f"  karras-encoder loss_{name} = {loss.item():.8f}")
    np.savez_compressed(os.path.join(OUTDIR, "karras_encoder_loss.npz"),
                        **out)
    print("wrote karras_encoder_loss.npz")


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch
    sys.modules["lightning"].LightningModule = torch.nn.Module
    sys.modules["lightning.pytorch"].LightningModule = torch.nn.Module
    torch.manual_seed(0)
    os.makedirs(OUTDIR, exist_ok=True)

    gen_sde_tables()
    gen_sde_pf()
    gen_sde_loss()
    gen_ddpm_loss()
    gen_forecast_loss()
    gen_karras_encoder_loss()


if __name__ == "__main__":
    main()
