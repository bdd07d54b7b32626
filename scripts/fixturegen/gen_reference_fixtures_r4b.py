"""Round-4b golden parity fixtures: the deprecated DDPM **v1** stack
(reference diffsci/models/ddpm/v1/ — upstream marks it deprecated in
ddpm/README.md:20-26 but it is part of the component inventory).

Executes the reference v1 modules offline and dumps:

- DDPMScheduler tables: beta/alpha/sigma/calpha at probe t for the
  default (beta0=1e-4, beta1=2e-2, T=1000) and a T=50 grid
  (ddpmscheduler.py:6-129; note v1's linear beta uses s=(t-1)/(T-1),
  DIFFERENT from v2's beta0+t*beta1T/T^2)
- DDPMModule.loss_fn scalars with replayed torch.randn_like noise:
  mse + huber, loss_scaling 'constant' and 'default'
  (lambda = beta^2 / (2 beta alpha (1-calpha)), ddpmmodule.py:123-147),
  unconditional and conditional
- DDPMSampler.backward trajectories with replayed noise, noise_type 1
  (sigma = sqrt(1-alpha)) and 2 (sigma-tilde), T=50
  (ddpmsampler.py:42-104)
- DDIMSampler.backward with noise_type 0 (implicit, deterministic) and
  2 — NOTE the reference's DDIM 'predicted term' divides by
  sqrt(alpha_t), not sqrt(calpha_t) (ddpmsampler.py:186-188); pinned
  as-executed
- apply_noise with replayed noise (ddpmsampler.py:106-117)

The analytic eps-net stand-in tanh(x) * (0.9 + 0.1 cos(t / T)) (+ y
mean shift when conditional) is reproduced exactly on the JAX side; the
trained-net surface is pinned elsewhere (PUNetG/MLP fixtures).

Fixture generator: run offline, outputs committed. The reference is
executed, never copied.

Usage: python scripts/fixturegen/gen_reference_fixtures_r4b.py [outdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_reference_fixtures import install_stubs, OUTDIR  # noqa: E402


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


def _analytic_net(T, conditional=False):
    import torch

    class Net(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.dummy = torch.nn.Parameter(torch.zeros([]))

        def forward(self, x, t, y=None):
            tt = t.reshape((-1,) + (1,) * (x.dim() - 1)).to(x)
            out = torch.tanh(x) * (0.9 + 0.1 * torch.cos(tt / T))
            if conditional and y is not None:
                out = out + 0.05 * y.mean(dim=-1, keepdim=True).to(x)
            return out

    return Net()


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch
    sys.modules["lightning"].LightningModule = torch.nn.Module
    sys.modules["lightning.pytorch"].LightningModule = torch.nn.Module
    from diffsci.models.ddpm.v1 import (DDPMScheduler, DDPMModule,
                                        DDPMSampler)
    from diffsci.models.ddpm.v1.ddpmsampler import DDIMSampler

    rng = np.random.default_rng(91)
    out = {}

    # --- scheduler tables ---
    for T, tag in ((1000, "T1000"), (50, "T50")):
        sched = DDPMScheduler(T=T)
        probe = np.unique(np.clip(
            np.round(np.geomspace(1, T, 12)).astype(np.int64), 1, T))
        tt = torch.tensor(probe, dtype=torch.float32)
        out[f"sched_{tag}_t"] = probe
        out[f"sched_{tag}_beta"] = sched.beta(tt).numpy()
        out[f"sched_{tag}_alpha"] = sched.alpha(tt).numpy()
        out[f"sched_{tag}_sigma"] = sched.sigma(tt).numpy()
        out[f"sched_{tag}_calpha"] = sched.calpha(tt).numpy()

    # --- loss_fn with replayed noise ---
    B, D, T = 4, 3, 1000
    x = rng.standard_normal((B, D)).astype(np.float32)
    y = rng.standard_normal((B, 2)).astype(np.float32)
    tloss = np.array([1, 10, 500, 1000], np.float32)
    eps = rng.standard_normal((B, D)).astype(np.float32)
    out["loss_x"], out["loss_y"] = x, y
    out["loss_t"], out["loss_eps"] = tloss, eps
    sched = DDPMScheduler(T=T)
    orig = torch.randn_like
    for cond in (False, True):
        net = _analytic_net(T, conditional=cond)
        for lt in ("mse", "huber"):
            for scaling in ("constant", "default"):
                mod = DDPMModule(net, sched, conditional=cond,
                                 loss_type=lt, loss_scaling=scaling)
                torch.randn_like = Replay([eps])
                try:
                    val = mod.loss_fn(torch.tensor(x),
                                      torch.tensor(tloss),
                                      torch.tensor(y) if cond else None)
                finally:
                    torch.randn_like = orig
                key = f"loss_{'cond' if cond else 'uncond'}_{lt}_{scaling}"
                out[key] = np.float32(val.item())

    # --- samplers with replayed noise, T=50 ---
    Ts = 50
    sched50 = DDPMScheduler(T=Ts)
    x0 = rng.standard_normal((B, D)).astype(np.float32)
    noise_seq = rng.standard_normal((Ts, B, D)).astype(np.float32)
    out["samp_x0"], out["samp_noise_seq"] = x0, noise_seq
    net = _analytic_net(Ts)
    for nt in (1, 2):
        samp = DDPMSampler(net, sched50, shape=[D], noise_type=nt)
        torch.randn_like = Replay(list(noise_seq))
        try:
            res = samp.backward(torch.tensor(x0))
        finally:
            torch.randn_like = orig
        out[f"ddpm_backward_nt{nt}"] = res.numpy()
    for nt in (0, 2):
        samp = DDIMSampler(net, sched50, shape=[D], noise_type=nt)
        torch.randn_like = Replay(list(noise_seq))
        try:
            res = samp.backward(torch.tensor(x0))
        finally:
            torch.randn_like = orig
        out[f"ddim_backward_nt{nt}"] = res.numpy()

    # conditional ancestral trajectory (y broadcast path,
    # ddpmsampler.py:58-59 unsqueezes y)
    netc = _analytic_net(Ts, conditional=True)
    samp = DDPMSampler(netc, sched50, shape=[D], noise_type=1)
    torch.randn_like = Replay(list(noise_seq))
    try:
        res = samp.backward(torch.tensor(x0), y=torch.tensor(y[0]))
    finally:
        torch.randn_like = orig
    out["ddpm_backward_cond"] = res.numpy()
    out["samp_y0"] = y[0]

    # apply_noise
    tnoise = np.array([1, 25, 50], np.float32)
    xan = x0[:3]
    samp = DDPMSampler(net, sched50, shape=[D])
    torch.randn_like = Replay([eps[:3]])
    try:
        res = samp.apply_noise(torch.tensor(xan), torch.tensor(tnoise))
    finally:
        torch.randn_like = orig
    out["apply_noise_x"], out["apply_noise_t"] = xan, tnoise
    out["apply_noise_eps"] = eps[:3]
    out["apply_noise_out"] = res.numpy()

    os.makedirs(OUTDIR, exist_ok=True)
    path = os.path.join(OUTDIR, "ddpm_v1_golden.npz")
    np.savez_compressed(path, **out)
    print(f"wrote {path} ({len(out)} arrays)")


if __name__ == "__main__":
    main()
