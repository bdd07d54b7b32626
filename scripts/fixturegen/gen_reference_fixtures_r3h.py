"""Round-3h golden parity fixtures: the periodizer, AnoDDPM with
replayed noise, and AutoencoderKL 3D.

- DiffusionPeriodizer (extra/periodizer.py:23-257): expand-crop-blend
  around a fixed conv net, 2D + 3D, blend / no-blend / expand-only
  variants, plus measure_periodicity_error.
- AnoDDPM.reconstruct (features/anomalydetectors.py:34-76): replayed
  initial noising + per-step Euler-Maruyama injections around an
  analytic score.
- AutoencoderKL 3D encode(mode)/decode with transferred weights
  (autoencoderldm3d.py:641-720).

Usage: python scripts/gen_reference_fixtures_r3h.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_reference_fixtures import install_stubs, OUTDIR  # noqa: E402


def gen_periodizer():
    import torch
    from diffsci.extra.periodizer import (DiffusionPeriodizer,
                                          measure_periodicity_error)

    rng = np.random.default_rng(180)
    out = {}
    for dim, tag, shape in [(2, "p2", (2, 1, 16, 16)),
                            (3, "p3", (1, 1, 8, 8, 8))]:
        torch.manual_seed(110 + dim)
        conv_cls = torch.nn.Conv2d if dim == 2 else torch.nn.Conv3d
        net = conv_cls(1, 1, 3, padding=1)

        class Wrap(torch.nn.Module):
            def __init__(self, c):
                super().__init__()
                self.c = c

            def forward(self, x, t=None):
                return self.c(x) + 0.1 * torch.tanh(x)

        wrapped = Wrap(net)
        per = DiffusionPeriodizer(wrapped, pad=4 if dim == 2 else 2,
                                  blend_width=3, dimension=dim)
        x = rng.standard_normal(shape).astype(np.float32)
        with torch.no_grad():
            y_blend = per(torch.tensor(x))
            y_noblend = per.forward_no_blend(torch.tensor(x))
            y_expand = per.forward_expand_only(torch.tensor(x))
            err = measure_periodicity_error(y_blend, dimension=dim)
        out[f"{tag}_x"] = x
        out[f"{tag}_blend"] = y_blend.numpy()
        out[f"{tag}_noblend"] = y_noblend.numpy()
        out[f"{tag}_expand"] = y_expand.numpy()
        out[f"{tag}_err_max"] = np.float64(err["total_mse"])
        out[f"{tag}_conv_w"] = net.weight.detach().numpy()
        out[f"{tag}_conv_b"] = net.bias.detach().numpy()
        print(f"  periodizer {dim}D: blend std {y_blend.numpy().std():.4f}"
              f", periodicity err {err['total_mse']:.2e}")
    np.savez_compressed(os.path.join(OUTDIR, "periodizer.npz"), **out)
    print("wrote periodizer.npz")


class _AnalyticScore:
    """Shared with the JAX test: s(x, sigma) = -x / (1 + sigma^2)."""

    def __call__(self, x, sigma):
        s = sigma.reshape((-1,) + (1,) * (x.dim() - 1))
        return -x / (1.0 + s ** 2)


def gen_anoddpm():
    import torch
    from diffsci.models.karras import schedulers, integrators
    from diffsci.features.anomalydetectors import AnoDDPM

    rng = np.random.default_rng(181)
    x = rng.standard_normal((3, 4)).astype(np.float32)
    eps0 = rng.standard_normal((3, 4)).astype(np.float32)
    out = {"x": x, "eps0": eps0}

    sched = schedulers.EDMScheduler()
    ano = AnoDDPM(sched, integrators.EulerMaruyamaIntegrator())
    # UPSTREAM BUG, verified here: Scheduler.integrator is a read-only
    # @property (schedulers.py:352-357) and torch Module.__setattr__
    # shelves AnoDDPM's `self.scheduler.integrator = integrator`
    # (anomalydetectors.py:40) into _modules, where the property shadows
    # it — the integrator argument is dead and AnoDDPM always runs the
    # scheduler's deterministic Heun. The only noise draw is
    # apply_noise's torch.randn (schedulers.py:338).
    assert type(sched.integrator).__name__ == "HeunIntegrator"
    fixed0 = torch.tensor(eps0)
    calls = {"n": 0}

    def shim_randn(*shape, **kw):
        calls["n"] += 1
        return fixed0.clone()

    orig_rn, orig_rl = torch.randn, torch.randn_like
    torch.randn = shim_randn
    torch.randn_like = lambda z, **kw: fixed0.to(z)
    try:
        with torch.no_grad():
            # nsteps MUST be 100 upstream: AnoDDPM.reconstruct leaves
            # propagate_partial's final_step at its default 100
            # (anomalydetectors.py:53-58, schedulers.py:183)
            rec = ano.reconstruct(torch.tensor(x), _AnalyticScore(),
                                  step=90, nsteps=100)
    finally:
        torch.randn, torch.randn_like = orig_rn, orig_rl
    out["rec"] = rec.numpy()
    out["n_randn"] = np.int64(calls["n"])
    print(f"  anoddpm: {calls['n']} randn draws, rec std "
          f"{rec.numpy().std():.4f}")
    np.savez_compressed(os.path.join(OUTDIR, "anoddpm.npz"), **out)
    print("wrote anoddpm.npz")


def gen_autoencoderkl3d():
    import torch
    from diffsci.models.nets import autoencoderldm3d as ldm

    class DummyLossConfig:
        disc_start = 0
        kl_weight = 0.0
        disc_weight = 0.0

        @staticmethod
        def target(*a, **k):
            return torch.nn.Identity()

    torch.manual_seed(120)
    dd = ldm.ddconfig(double_z=True, z_channels=2, resolution=16,
                      in_channels=1, out_ch=1, ch=32, ch_mult=[1, 2],
                      num_res_blocks=1, attn_resolutions=[],
                      dropout=0.0, has_mid_attn=True)
    ae = ldm.AutoencoderKL(dd, DummyLossConfig, embed_dim=2)
    ae.eval()
    rng = np.random.default_rng(121)
    x = rng.standard_normal((1, 1, 16, 16, 16)).astype(np.float32)
    with torch.no_grad():
        # 3D divergences from the 2D port: encode() returns a SAMPLE
        # (autoencoderldm3d.py:692-696), encode_() the posterior; the
        # posterior has no mode() method — use the .mean attribute
        post = ae.encode_(torch.tensor(x))
        z_mode = post.mean
        dec = ae.decode(z_mode)
    arrays = {"x": x, "moments": post.parameters.numpy(),
              "z_mode": z_mode.numpy(), "decoded": dec.numpy()}
    for k, v in ae.state_dict().items():
        arrays["sd__" + k] = v.numpy()
    np.savez_compressed(os.path.join(OUTDIR, "autoencoderkl3d.npz"),
                        **arrays)
    print(f"wrote autoencoderkl3d fixture: {len(arrays) - 4} params, "
          f"dec std {dec.numpy().std():.4f}")


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch
    sys.modules["lightning"].LightningModule = torch.nn.Module
    sys.modules["lightning.pytorch"].LightningModule = torch.nn.Module
    torch.manual_seed(0)
    os.makedirs(OUTDIR, exist_ok=True)

    gen_periodizer()
    gen_anoddpm()
    gen_autoencoderkl3d()


if __name__ == "__main__":
    main()
