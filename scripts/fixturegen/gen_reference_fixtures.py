"""Generate golden parity fixtures from the actual PyTorch reference.

Runs the reference implementation at /root/reference (torch-cpu) with its
heavy optional dependencies stubbed out, and dumps the numerical outputs
our test suite pins against (tests/test_reference_parity.py):

- preconditioner coefficient tables (reference
  diffsci/models/karras/preconditioners.py:30-161)
- scheduling functions sigma(t), s(t), derivatives, inverses
  (schedulingfunctions.py:41-152)
- scheduler time grids EDM/VP/VE (schedulers.py:377-448)
- Langevin factor / noise injection (schedulers.py:219-245)
- noise-sampler loss weights lambda(sigma) (noisesamplers.py:20-111)
- EDM2 power-EMA exponent/beta series (ema.py:9-23)
- deterministic Heun/Euler propagation trajectories with an analytic
  unit-Gaussian score, forward and backward, for EDM/VP/VE
  (schedulers.py:48-89, integrators.py:29-54)
- a small PUNetG forward with its torch state_dict, input and output
  (punetg.py:356-416), for weight-import parity

This script is a fixture *generator* — it is run offline (fixtures are
committed) and is the only place in this repo that imports the reference.
No reference code is copied; the reference is executed, not translated.

Usage: python scripts/gen_reference_fixtures.py [outdir]
"""

import json
import os
import sys
import types

import numpy as np

OUTDIR = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(
        __file__)))),
    "tests", "fixtures", "reference")


def install_stubs():
    """Stub the reference's heavy deps (diffusers/lightning/torchvision)
    so its math modules import on this machine."""
    class Stub(types.ModuleType):
        __path__ = []

        def __getattr__(self, name):
            if name.startswith("__"):
                raise AttributeError(name)
            sub = Stub(self.__name__ + "." + name)
            setattr(self, name, sub)
            return sub

        def __call__(self, *a, **k):
            return self

        def __mro_entries__(self, bases):
            return (object,)

    for mod in ["diffusers", "diffusers.models", "lightning",
                "lightning.pytorch", "lightning.pytorch.callbacks",
                "torchvision", "torchvision.transforms"]:
        sys.modules.setdefault(mod, Stub(mod))


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch
    torch.manual_seed(0)

    from diffsci.models.karras import (preconditioners, schedulers,
                                       schedulingfunctions, noisesamplers,
                                       ema)

    os.makedirs(OUTDIR, exist_ok=True)
    out = {}

    sigma_grid = np.geomspace(0.002, 80.0, 64).astype(np.float32)
    t_grid = np.linspace(1e-3, 1.0, 64).astype(np.float32)
    out["sigma_grid"] = sigma_grid
    out["t_grid"] = t_grid
    sg = torch.tensor(sigma_grid)
    tg = torch.tensor(t_grid)

    # ---------------- preconditioners ----------------
    vp_sched = schedulers.VPScheduler()
    precs = {
        "edm": preconditioners.EDMPreconditioner(),
        "vp": preconditioners.VPPreconditioner(vp_sched),
        "ve": preconditioners.VEPreconditioner(),
        "sr3": preconditioners.SR3Preconditioner(),
        "null": preconditioners.NullPreconditioner(),
    }
    with torch.no_grad():
        for name, p in precs.items():
            out[f"prec_{name}_c_skip"] = p.skip_scaling(sg).numpy()
            out[f"prec_{name}_c_out"] = p.output_scaling(sg).numpy()
            out[f"prec_{name}_c_in"] = p.input_scaling(sg).numpy()
            out[f"prec_{name}_c_noise"] = p.noise_conditioner(sg).numpy()

    # ---------------- scheduling functions ----------------
    fns = {
        "edm": schedulingfunctions.EDMSchedulingFunctions(),
        "vp": schedulingfunctions.VPSchedulingFunctions(),
        "ve": schedulingfunctions.VESchedulingFunctions(),
    }
    with torch.no_grad():
        for name, f in fns.items():
            out[f"sched_{name}_scale"] = f.scaling_fn(tg).numpy()
            out[f"sched_{name}_scale_deriv"] = f.scaling_fn_deriv(tg).numpy()
            out[f"sched_{name}_noise"] = f.noise_fn(tg).numpy()
            out[f"sched_{name}_noise_deriv"] = f.noise_fn_deriv(tg).numpy()
            out[f"sched_{name}_inverse_noise"] = \
                f.inverse_noise_fn(f.noise_fn(tg)).numpy()
            if f.has_pf_score_multiplier or name == "vp":
                out[f"sched_{name}_pf_score_mult"] = \
                    f.pf_score_multiplier(tg).numpy()
        out["sched_vp_pf_scale_mult"] = fns["vp"].pf_scale_multiplier(
            tg).numpy()

    # ---------------- scheduler grids ----------------
    edm = schedulers.EDMScheduler()
    ve = schedulers.VEScheduler()
    with torch.no_grad():
        for n in (6, 19, 51):
            out[f"grid_edm_{n}"] = edm.create_steps(n).numpy()
            out[f"grid_vp_{n}"] = vp_sched.create_steps(n).numpy()
            out[f"grid_ve_{n}"] = ve.create_steps(n).numpy()
        out["edm_step_from_time_19"] = edm.step_from_time(
            edm.create_steps(19)[:-1], 19).numpy()
    scalars = {
        "edm_maximum_scale": float(edm.maximum_scale),
        "vp_maximum_scale": float(vp_sched.maximum_scale),
        "ve_maximum_scale": float(ve.maximum_scale),
    }

    # ---------------- langevin factor / noise injection ----------------
    with torch.no_grad():
        for gamma in (0.01, 1.0, 3.0):
            edm.langevin_const = gamma
            key = str(gamma).replace(".", "p")
            out[f"langevin_edm_{key}"] = edm.langevin_factor(tg).numpy()
            out[f"noiseinj_edm_{key}"] = edm.noise_injection(tg).numpy()
        edm.langevin_const = 1.0
        vp_sched.langevin_const = 2.0
        out["langevin_vp_2p0"] = vp_sched.langevin_factor(tg).numpy()
        vp_sched.langevin_const = 1.0

    # ---------------- noise-sampler loss weights ----------------
    samplers = {
        "edm": noisesamplers.EDMNoiseSampler(),
        "vp": noisesamplers.VPNoiseSampler(vp_sched),
        "ve": noisesamplers.VENoiseSampler(),
        "uniform": noisesamplers.UniformNoiseSampler(),
    }
    with torch.no_grad():
        for name, s in samplers.items():
            out[f"lw_{name}"] = s.loss_weighting(sg).numpy()

    # ---------------- EMA power profile ----------------
    stds = np.array([0.01, 0.05, 0.1, 0.2, 0.3, 0.4], np.float64)
    out["ema_stds"] = stds.astype(np.float32)
    out["ema_power_exp"] = np.array(
        [ema._power_function_exp_from_std(s) for s in stds], np.float64)
    updates = np.array([1, 2, 3, 5, 10, 100, 1000, 100000], np.int64)
    out["ema_updates"] = updates
    out["ema_power_beta"] = np.array(
        [[ema._power_function_beta(s, int(u)) for u in updates]
         for s in stds], np.float64)

    # ---------------- deterministic propagation trajectories ----------
    # Analytic score of data ~ N(0, I): noised (unscaled) marginal at
    # sigma is N(0, (1+sigma^2) I) => score(z, sigma) = -z / (1 + sigma^2).
    def score_fn(z, sigma):
        from diffsci.torchutils import broadcast_from_below
        s2 = broadcast_from_below(sigma, z) ** 2
        return -z / (1.0 + s2)

    rng = np.random.default_rng(1234)
    x0 = rng.standard_normal((4, 3)).astype(np.float32)
    out["traj_x0"] = x0

    with torch.no_grad():
        for name, sched in (("edm", edm), ("vp", vp_sched), ("ve", ve)):
            xb = torch.tensor(x0) * sched.maximum_scale
            hist = sched.propagate_backward(xb, score_fn, nsteps=18,
                                            record_history=True)
            out[f"traj_{name}_heun_bwd"] = hist.numpy()
            sched.set_temporary_integrator("euler")
            hist_e = sched.propagate_backward(xb, score_fn, nsteps=18,
                                              record_history=True)
            sched.unset_temporary_integrator()
            out[f"traj_{name}_euler_bwd"] = hist_e.numpy()
            xf = torch.tensor(x0)
            hist_f = sched.propagate_forward(xf, score_fn, nsteps=18,
                                             record_history=True)
            # reference forward history leaves index 0 as zeros
            # (schedulers.py:67-71); store [1:] = actual states
            out[f"traj_{name}_heun_fwd"] = hist_f.numpy()[1:]

    # ---------------- DDPM v2 schedulers ----------------
    from diffsci.models.ddpm.v2 import schedulers as ddpm_scheds
    ddpm_t = np.arange(1, 1001, 37, dtype=np.float32)
    out["ddpm_t_steps"] = ddpm_t
    dts = torch.tensor(ddpm_t)
    dscheds = {
        "classical": ddpm_scheds.ClassicalDDPMScheduler(),
        "exp": ddpm_scheds.ExpDDPMScheduler(),
        "cosine": ddpm_scheds.CosineDDPMScheduler(),
    }
    with torch.no_grad():
        for name, s in dscheds.items():
            out[f"ddpm_{name}_calpha"] = s.calpha(dts).numpy()
            out[f"ddpm_{name}_alpha"] = s.alpha(dts).numpy()
            out[f"ddpm_{name}_beta"] = s.beta(dts).numpy()

    # ---------------- SI (flow matching) interpolants ----------------
    from diffsci.models.karras import flowfield
    sis = {
        "linear": flowfield.SIScheduler.linear(),
        "cosine": flowfield.SIScheduler.cosine(),
        "edm": flowfield.SIScheduler.edm(),
    }
    with torch.no_grad():
        for name, s in sis.items():
            a = s.alpha_fn(tg)
            out[f"si_{name}_alpha"] = (
                a.numpy() if torch.is_tensor(a)
                else np.full_like(t_grid, float(a)))
            out[f"si_{name}_sigma"] = s.sigma_fn(tg).numpy()
            ad = s.alpha_fn_dot(tg)
            out[f"si_{name}_alpha_dot"] = (
                ad.numpy() if torch.is_tensor(ad)
                else np.full_like(t_grid, float(ad)))
            out[f"si_{name}_sigma_dot"] = s.sigma_fn_dot(tg).numpy()
            out[f"si_{name}_sigma_inv"] = s.sigma_fn_inv(
                s.sigma_fn(tg)).numpy()

    np.savez_compressed(os.path.join(OUTDIR, "math_golden.npz"), **out)
    with open(os.path.join(OUTDIR, "math_golden_scalars.json"), "w") as f:
        json.dump(scalars, f, indent=1)
    print(f"wrote {len(out)} arrays to {OUTDIR}/math_golden.npz")
    print("scalars:", scalars)

    gen_punetg_fixture()


def gen_punetg_fixture():
    """Small PUNetG forward: dump state_dict + input + output for
    weight-import parity (reference punetg.py:356-416)."""
    import torch
    from diffsci.models.nets.punetg import PUNetG
    from diffsci.models.nets.punetg_config import PUNetGConfig

    torch.manual_seed(42)
    config = PUNetGConfig(model_channels=8,
                          channel_expansion=[2],
                          number_resnet_downward_block=1,
                          number_resnet_upward_block=1,
                          number_resnet_attn_block=1,
                          number_resnet_before_attn_block=1,
                          number_resnet_after_attn_block=1)
    net = PUNetG(config)
    net.eval()
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    t = np.array([0.5, 2.0], np.float32)
    with torch.no_grad():
        y = net(torch.tensor(x), torch.tensor(t)).numpy()
    arrays = {"x": x, "t": t, "y": y}
    for k, v in net.state_dict().items():
        arrays["sd__" + k] = v.numpy()
    np.savez_compressed(os.path.join(OUTDIR, "punetg_forward.npz"), **arrays)
    print(f"wrote punetg fixture: {len(arrays) - 3} params, "
          f"out std {y.std():.4f}")

    # variant with a real attention bottleneck (number_resnet_attn_block=2
    # builds one torch.nn.MultiheadAttention layer, punetg.py:291-299)
    torch.manual_seed(43)
    config_a = PUNetGConfig(model_channels=8,
                            channel_expansion=[2],
                            number_resnet_downward_block=1,
                            number_resnet_upward_block=1,
                            number_resnet_attn_block=2,
                            number_resnet_before_attn_block=1,
                            number_resnet_after_attn_block=1)
    net_a = PUNetG(config_a)
    net_a.eval()
    with torch.no_grad():
        y_a = net_a(torch.tensor(x), torch.tensor(t)).numpy()
    arrays_a = {"x": x, "t": t, "y": y_a}
    for k, v in net_a.state_dict().items():
        arrays_a["sd__" + k] = v.numpy()
    np.savez_compressed(os.path.join(OUTDIR, "punetg_attn_forward.npz"),
                        **arrays_a)
    print(f"wrote punetg attn fixture: {len(arrays_a) - 3} params, "
          f"out std {y_a.std():.4f}")


if __name__ == "__main__":
    main()
