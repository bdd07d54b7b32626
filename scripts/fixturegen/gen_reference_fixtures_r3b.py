"""Round-3b golden parity fixtures: DDPM sampling loops, the SI
(stochastic-interpolant) module, and classifier-free guidance.

Extends gen_reference_fixtures{,_r3}.py with the surfaces still lacking
cross-framework evidence after the round-3 wave:

- DDPM v2 sampling trajectories with replayed per-step noise: classical
  type1/type2, generalized DDPM, DDIM, backward + forward, classical and
  cosine schedules (reference diffsci/models/ddpm/v2/integrators.py)
- SIModule loss values with replayed eps (flowfield.py:347-374): linear
  and cosine interpolants, mse+huber, masked, conditional, and the EDM
  precondition_fn path (flowfield.py:153-170)
- SIModule flow-field integration: deterministic Heun+final-Euler
  trajectory, guided (CFG) trajectory, and Euler-Maruyama with replayed
  noise (flowfield.py:704-795)
- KarrasModule classifier-free guidance: get_denoiser at guidance
  {0, 1, 2.5} and a full guided deterministic backward trajectory
  (karrasmodule.py:705-713)

CFG caveat: the reference's unconditional branch calls the net without
``y`` (karrasmodule.py:715-716), which its own MLPCond cannot accept —
so these fixtures drive a thin torch wrapper net whose ``y`` defaults to
zeros, matching our MLPCond's convention. The CFG *formula*,
preconditioning and integration are still executed from the reference.

Fixture generator: run offline, outputs committed. The reference is
executed, never copied.

Usage: python scripts/gen_reference_fixtures_r3b.py [outdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_reference_fixtures import install_stubs, OUTDIR  # noqa: E402
from gen_reference_fixtures_r3 import sd_arrays  # noqa: E402


class Replay:
    """torch.randn_like -> next noise from a fixed sequence."""

    def __init__(self, seq):
        import torch
        self.seq = [torch.tensor(n) for n in seq]
        self.i = 0

    def __call__(self, t, **kw):
        n = self.seq[self.i % len(self.seq)]
        self.i += 1
        return n.to(t)


def gen_ddpm_sampling_fixture():
    """Full DDPM/DDIM ancestral loops with replayed noise
    (v2/integrators.py:44-259)."""
    import torch
    from diffsci.models.ddpm.v2 import integrators, schedulers

    rng = np.random.default_rng(77)
    # T=1000: the classical beta schedule is only in-domain near its
    # native T (at small T, beta_t = beta0 + t*beta1T/T^2 exceeds 1 and
    # sqrt(alpha) goes NaN) — pin at the reference's default scale and
    # subsample the history
    B, D, T = 4, 3, 1000
    KEEP = np.array([0, 1, 2, 3, 10, 100, 250, 500, 750, 900, 990,
                     999, 1000])
    x0 = rng.standard_normal((B, D)).astype(np.float32)
    noise_seq = rng.standard_normal((T, B, D)).astype(np.float32)
    out = {"x0": x0, "noise_seq": noise_seq, "T": np.int64(T),
           "keep": KEEP}

    def predictor(x, t):
        # smooth analytic stand-in for the trained eps-net: the nets are
        # pinned separately (PUNetG/ADM/MLP fixtures); this pins the
        # integrator math end to end. Mostly-proportional-to-x keeps the
        # reverse trajectory O(1) (a real eps-net cancels most of x), the
        # tanh term adds nonlinearity so coefficient errors can't cancel
        return (0.9 * x + 0.2 * torch.tanh(x)) * (
            0.9 + 0.1 * torch.cos(t / T)).view(-1, 1)

    classical = schedulers.ClassicalDDPMScheduler()
    cosine = schedulers.CosineDDPMScheduler()
    cases = {
        "classical_type1": integrators.ClassicalDDPMIntegratorType1(
            classical),
        "classical_type2": integrators.ClassicalDDPMIntegratorType2(
            classical),
        "ddpm": integrators.DDPMIntegrator(classical),
        "ddim": integrators.DDIMIntegrator(classical),
        "ddpm_cosine": integrators.DDPMIntegrator(cosine),
    }
    orig = torch.randn_like
    for tag, integ in cases.items():
        rep = Replay(noise_seq)
        torch.randn_like = rep
        try:
            with torch.no_grad():
                hist = integ.propagate_backward(
                    torch.tensor(x0), predictor, nsteps=T,
                    record_history=True)
        finally:
            torch.randn_like = orig
        out[f"bwd_{tag}"] = hist.numpy()[KEEP]
        out[f"bwd_{tag}_ndraws"] = np.int64(rep.i)
        print(f"  bwd_{tag}: {rep.i} draws, final std "
              f"{hist[-1].std():.4f}")

    # forward diffusion loops (no predictor involved)
    for tag, integ in [("classical_type1", cases["classical_type1"]),
                       ("ddpm", cases["ddpm"])]:
        rep = Replay(noise_seq)
        torch.randn_like = rep
        try:
            with torch.no_grad():
                if isinstance(integ, integrators.ClassicalDDPMIntegrator):
                    hist = integ.propagate_forward(
                        torch.tensor(x0), None, nsteps=T,
                        record_history=True)
                else:
                    hist = integ.propagate_forward(
                        torch.tensor(x0), nsteps=T, record_history=True)
        finally:
            torch.randn_like = orig
        out[f"fwd_{tag}"] = hist.numpy()[KEEP]
        print(f"  fwd_{tag}: {rep.i} draws")

    np.savez_compressed(os.path.join(OUTDIR, "ddpm_sampling.npz"), **out)
    print(f"wrote ddpm_sampling.npz ({len(out)} arrays)")


def _make_si_nets():
    """Torch nets with a zeros-default y (see module docstring)."""
    import torch
    from diffsci.models.nets.mlp import MLPUncond, MLPCond

    class CFGWrap(torch.nn.Module):
        def __init__(self, net, ydim):
            super().__init__()
            self.net = net
            self.ydim = ydim

        def forward(self, x, t, y=None):
            if self.ydim == 0:
                return self.net(x, t)
            if y is None:
                y = torch.zeros(x.shape[0], self.ydim).to(x)
            if y.dim() == 3 and y.shape[0] == 1:
                y = y.squeeze(0)  # sample-path unsqueeze convention
            if y.shape[0] == 1 and x.shape[0] > 1:
                y = y.expand(x.shape[0], -1)
            return self.net(x, t, y)

    torch.manual_seed(31)
    uncond = CFGWrap(MLPUncond(3, hidden_dims=[16, 16]), 0)
    torch.manual_seed(32)
    cond = CFGWrap(MLPCond(3, 2, hidden_dims=[16, 16]), 2)
    uncond.eval()
    cond.eval()
    return uncond, cond


def gen_si_fixture():
    """SIModule loss + flow-field integration (flowfield.py:233-795)."""
    import torch
    from diffsci.models.karras.flowfield import SIModule, SIModuleConfig

    uncond, cond = _make_si_nets()
    rng = np.random.default_rng(41)
    B, D, YD = 8, 3, 2
    x = rng.standard_normal((B, D)).astype(np.float32)
    t = np.linspace(0.05, 0.95, B).astype(np.float32)
    eps = rng.standard_normal((B, D)).astype(np.float32)
    mask = (rng.random((B, D)) < 0.4).astype(np.float32)
    ycond = rng.standard_normal((B, YD)).astype(np.float32)

    out = {"x": x, "t": t, "eps": eps, "mask": mask, "y": ycond}
    out.update(sd_arrays(uncond.net, "usd__"))
    out.update(sd_arrays(cond.net, "csd__"))

    orig = torch.randn_like
    fixed_eps = torch.tensor(eps)
    torch.randn_like = lambda tt, **kw: fixed_eps.to(tt)
    try:
        with torch.no_grad():
            cases = {
                "linear_mse": (dict(scheduler="linear", loss_metric="mse"),
                               uncond, None, None),
                "linear_huber": (dict(scheduler="linear",
                                      loss_metric="huber"),
                                 uncond, None, None),
                "cosine_mse": (dict(scheduler="cosine", loss_metric="mse"),
                               uncond, None, None),
                "linear_mse_masked": (dict(scheduler="linear",
                                           loss_metric="mse"),
                                      uncond, mask, None),
                "linear_mse_cond": (dict(scheduler="linear",
                                         loss_metric="mse"),
                                    cond, None, ycond),
                "edm_precond_mse": (dict(scheduler="edm",
                                         precondition_fn="edm",
                                         loss_metric="mse"),
                                    uncond, None, None),
            }
            for name, (cfg_kw, net, mk, yc) in cases.items():
                cfg = SIModuleConfig(**cfg_kw)
                module = SIModule(cfg, net)
                loss = module.loss_fn(
                    torch.tensor(x), torch.tensor(t),
                    y=None if yc is None else torch.tensor(yc),
                    mask=None if mk is None else torch.tensor(mk))
                out[f"loss_{name}"] = np.float64(loss.item())
                print(f"  loss_{name} = {loss.item():.8f}")
    finally:
        torch.randn_like = orig

    # -------- flow-field integration trajectories -----------------------
    NSTEPS = 10
    xstart = rng.standard_normal((4, D)).astype(np.float32)
    tsched = np.linspace(1.0, 0.0, NSTEPS).astype(np.float32)
    out["xstart"] = xstart
    out["nsteps"] = np.int64(NSTEPS)

    def traj(tag, module, y=None, guidance=1.0, noise_injection=False,
             replay=None, integrate_on_sigma=False):
        kw = {}
        if replay is not None:
            torch.randn_like = Replay(replay)
        try:
            with torch.no_grad():
                hist = module.integrate_flow_field(
                    torch.tensor(xstart), torch.tensor(tsched),
                    y=None if y is None else torch.tensor(y),
                    guidance=guidance, return_history=True,
                    integrate_on_sigma=integrate_on_sigma,
                    noise_injection=noise_injection, **kw)
        finally:
            torch.randn_like = orig
        arr = np.stack([h[1].numpy() for h in hist], axis=0)
        out[tag] = arr
        print(f"  {tag}: {arr.shape}, final std {arr[-1].std():.4f}")

    si_noise = rng.standard_normal((NSTEPS - 1, 4, D)).astype(np.float32)
    out["si_noise_seq"] = si_noise

    # NOTE: with identity preconditioning the deterministic trajectory is
    # scheduler-independent (flow == model(x, t)), so one Heun case
    # suffices. integrate_on_sigma=True is NOT fixtured: the reference
    # divides [B, D] flow by [B] sigma_dot without broadcasting
    # (flowfield.py:456-457), which crashes for D != B.
    lin_uncond = SIModule(SIModuleConfig(scheduler="linear"), uncond)
    cos_uncond = SIModule(SIModuleConfig(scheduler="cosine"), uncond)
    lin_cond = SIModule(SIModuleConfig(scheduler="linear"), cond)
    edm_pre = SIModule(SIModuleConfig(scheduler="edm",
                                      precondition_fn="edm"), uncond)
    traj("traj_linear_heun", lin_uncond)
    traj("traj_linear_guided", lin_cond, y=ycond[:4], guidance=2.5)
    traj("traj_edm_precond", edm_pre)
    traj("traj_linear_em", lin_uncond, noise_injection=True,
         replay=si_noise)
    # Euler-Maruyama under the cosine interpolant exercises the
    # score-from-flow conversion with a curved alpha/sigma path
    traj("traj_cosine_em", cos_uncond, noise_injection=True,
         replay=si_noise)

    np.savez_compressed(os.path.join(OUTDIR, "si_module.npz"), **out)
    print(f"wrote si_module.npz ({len(out)} arrays)")


def gen_guided_karras_fixture():
    """Classifier-free guidance through the reference's denoiser and a
    guided deterministic backward trajectory (karrasmodule.py:673-720,
    907-931)."""
    import torch
    from diffsci.models.karras.karrasmodule import (KarrasModule,
                                                    KarrasModuleConfig)

    _, cond = _make_si_nets()
    rng = np.random.default_rng(51)
    B, D, YD = 4, 3, 2
    x = rng.standard_normal((B, D)).astype(np.float32)
    sigma = np.geomspace(0.05, 20.0, B).astype(np.float32)
    ycond = rng.standard_normal((B, YD)).astype(np.float32)
    out = {"x": x, "sigma": sigma, "y": ycond}
    out.update(sd_arrays(cond.net, "csd__"))

    module = KarrasModule(cond, KarrasModuleConfig.from_edm(),
                          conditional=True)
    with torch.no_grad():
        for g in (0.0, 1.0, 2.5):
            den, cn = module.get_denoiser(torch.tensor(x),
                                          torch.tensor(sigma),
                                          torch.tensor(ycond), guidance=g)
            out[f"denoiser_g{g}"] = den.numpy()
            print(f"  denoiser_g{g}: std {den.numpy().std():.4f}")

        # guided deterministic backward trajectory: the scheduler driven
        # by get_score, exactly what propagate_toward_sample does minus
        # the unbatched-y unsqueeze (karrasmodule.py:907-931)
        xb = (rng.standard_normal((B, D)).astype(np.float32) * 80.0)
        out["xb"] = xb

        def rhs(z, s):
            return module.get_score(z, s, torch.tensor(ycond),
                                    guidance=2.0)

        hist = module.config.noisescheduler.propagate_backward(
            torch.tensor(xb), rhs, 8, record_history=True)
        out["guided_traj"] = hist.numpy()
        print(f"  guided_traj: {hist.shape}, final std "
              f"{hist[-1].numpy().std():.4f}")

    np.savez_compressed(os.path.join(OUTDIR, "guided_karras.npz"), **out)
    print(f"wrote guided_karras.npz ({len(out)} arrays)")


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch
    sys.modules["lightning"].LightningModule = torch.nn.Module
    sys.modules["lightning.pytorch"].LightningModule = torch.nn.Module
    torch.manual_seed(0)
    os.makedirs(OUTDIR, exist_ok=True)

    gen_ddpm_sampling_fixture()
    gen_si_fixture()
    gen_guided_karras_fixture()


if __name__ == "__main__":
    main()
