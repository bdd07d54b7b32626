"""Round-3 golden parity fixtures from the PyTorch reference.

Extends scripts/gen_reference_fixtures.py (round 2) with the surfaces the
round-2 review flagged as having no cross-framework evidence:

- KarrasModule.loss_fn values with fixed weights/batch/sigma/eps for
  EDM/VP/VE, mse+huber, masked and conditional variants
  (reference diffsci/models/karras/karrasmodule.py:569-650); noise is
  replayed by monkeypatching ``torch.randn_like``
- stochastic propagation loops with a replayed noise sequence:
  Euler-Maruyama fwd/bwd, Karras churn, langevin_interval gating
  (integrators.py:57-113, schedulers.py:219-245), inpaint and repaint
  incl. renoise draws (schedulers.py:91-176)
- ADM forward with its torch state_dict (adm.py:119-216)
- AutoencoderKL 2D encode(mode)/decode with transferred weights
  (autoencoderldm2d.py:552-631)
- VAENet encode(sample=False)/decode (vaenet.py:1231-1260)
- MLPUncond/MLPCond forwards (mlp.py:4-121)

Fixture *generator*: run offline, outputs committed. The reference is
executed, never copied.

Usage: python scripts/gen_reference_fixtures_r3.py [outdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_reference_fixtures import install_stubs, OUTDIR  # noqa: E402


def sd_arrays(module, prefix="sd__"):
    return {prefix + k: v.detach().numpy()
            for k, v in module.state_dict().items()}


def gen_karras_loss_fixture():
    """Pin the training objective itself (karrasmodule.py:569-650)."""
    import torch
    from diffsci.models.karras.karrasmodule import (KarrasModule,
                                                    KarrasModuleConfig)
    from diffsci.models.nets.mlp import MLPUncond, MLPCond

    rng = np.random.default_rng(11)
    B, D, YD = 8, 3, 2
    x = rng.standard_normal((B, D)).astype(np.float32)
    sigma = np.geomspace(0.01, 30.0, B).astype(np.float32)
    eps = rng.standard_normal((B, D)).astype(np.float32)
    mask = (rng.random((B, D)) < 0.4).astype(np.float32)
    ycond = rng.standard_normal((B, YD)).astype(np.float32)

    torch.manual_seed(21)
    net = MLPUncond(D, hidden_dims=[16, 16])
    torch.manual_seed(22)
    net_cond = MLPCond(D, YD, hidden_dims=[16, 16])
    for m in (net, net_cond):
        m.eval()

    out = {"x": x, "sigma": sigma, "eps": eps, "mask": mask, "y": ycond}
    out.update(sd_arrays(net))
    out.update(sd_arrays(net_cond, "csd__"))

    fixed_eps = torch.tensor(eps)
    orig_randn_like = torch.randn_like
    torch.randn_like = lambda t, **kw: fixed_eps.to(t)
    try:
        with torch.no_grad():
            cases = {
                "edm_mse": (KarrasModuleConfig.from_edm(loss_metric="mse"),
                            net, False, None, None),
                "edm_huber": (KarrasModuleConfig.from_edm(
                    loss_metric="huber"), net, False, None, None),
                "vp_mse": (KarrasModuleConfig.from_vp(loss_metric="mse"),
                           net, False, None, None),
                "ve_mse": (KarrasModuleConfig.from_ve(loss_metric="mse"),
                           net, False, None, None),
                "edm_mse_masked": (KarrasModuleConfig.from_edm(
                    loss_metric="mse"), net, False, mask, None),
                "edm_mse_cond": (KarrasModuleConfig.from_edm(
                    loss_metric="mse"), net_cond, True, None, ycond),
            }
            for name, (cfg, model, conditional, mk, yc) in cases.items():
                module = KarrasModule(model, cfg, conditional=conditional,
                                      masked=mk is not None)
                loss = module.loss_fn(
                    torch.tensor(x), torch.tensor(sigma),
                    y=None if yc is None else torch.tensor(yc),
                    mask=None if mk is None else torch.tensor(mk))
                out[f"loss_{name}"] = np.float64(loss.item())
                print(f"  loss_{name} = {loss.item():.8f}")
    finally:
        torch.randn_like = orig_randn_like

    np.savez_compressed(os.path.join(OUTDIR, "karras_loss.npz"), **out)
    print(f"wrote karras_loss.npz ({len(out)} arrays)")


def gen_stochastic_fixture():
    """Replay a fixed noise sequence through every stochastic loop
    (integrators.py:57-113, schedulers.py:91-176,219-245)."""
    import torch
    from diffsci.models.karras import schedulers, integrators
    from diffsci.torchutils import broadcast_from_below

    def score_fn(z, sigma):
        s2 = broadcast_from_below(sigma, z) ** 2
        return -z / (1.0 + s2)

    rng = np.random.default_rng(1234)
    x0 = rng.standard_normal((4, 3)).astype(np.float32)
    NSTEPS = 18
    noise_seq = rng.standard_normal((NSTEPS, 4, 3)).astype(np.float32)
    out = {"x0": x0, "noise_seq": noise_seq}

    class Replay:
        """torch.randn_like -> next noise from the sequence."""

        def __init__(self, seq):
            self.seq = [torch.tensor(n) for n in seq]
            self.i = 0

        def __call__(self, t, **kw):
            n = self.seq[self.i % len(self.seq)]
            self.i += 1
            return n.to(t)

    orig = torch.randn_like

    def run(tag, sched, replay_seq, fn):
        rep = Replay(replay_seq)
        torch.randn_like = rep
        try:
            with torch.no_grad():
                out[tag] = fn().numpy()
        finally:
            torch.randn_like = orig
        out[tag + "_ndraws"] = np.int64(rep.i)
        print(f"  {tag}: consumed {rep.i} draws")

    edm = schedulers.EDMScheduler()
    vp = schedulers.VPScheduler()

    # Euler-Maruyama backward (EDM + VP covers both rhs branches)
    xb = torch.tensor(x0) * edm.maximum_scale
    run("em_edm_bwd", edm, noise_seq,
        lambda: edm.propagate_backward(xb.clone(), score_fn, nsteps=NSTEPS,
                                       stochastic=True, record_history=True))
    xbv = torch.tensor(x0) * vp.maximum_scale
    run("em_vp_bwd", vp, noise_seq,
        lambda: vp.propagate_backward(xbv.clone(), score_fn, nsteps=NSTEPS,
                                      stochastic=True, record_history=True))
    # forward stochastic (sign-flip branch)
    run("em_edm_fwd", edm, noise_seq,
        lambda: edm.propagate_forward(torch.tensor(x0), score_fn,
                                      nsteps=NSTEPS, stochastic=True,
                                      record_history=True))
    # langevin gamma + interval gating
    edm.langevin_const = 3.0
    edm.langevin_interval = (0.1, 10.0)
    run("em_edm_bwd_gated", edm, noise_seq,
        lambda: edm.propagate_backward(xb.clone(), score_fn, nsteps=NSTEPS,
                                       stochastic=True, record_history=True))
    edm.langevin_const = 1.0
    edm.langevin_interval = None

    # Karras churn (stochastic churn inside a deterministic Heun step)
    churn = schedulers.EDMScheduler()
    churn.set_temporary_integrator(integrators.KarrasIntegrator())
    run("karras_churn_bwd", churn, noise_seq,
        lambda: churn.propagate_backward(xb.clone(), score_fn,
                                         nsteps=NSTEPS,
                                         record_history=True))
    churn.unset_temporary_integrator()

    # inpaint: deterministic Heun + per-step splice. y-history built in
    # numpy (same array fed to both frameworks); reference convention is
    # y[-1] = most noised (schedulers.py:91-119).
    t_grid = edm.create_steps(NSTEPS + 1).numpy()
    mask = np.zeros((4, 3), np.float32)
    mask[:, 0] = 1.0  # known first coordinate
    eps_known = rng.standard_normal((4, 3)).astype(np.float32)
    y_clean = rng.standard_normal((4, 3)).astype(np.float32)
    # our convention: y_ours[k] = known state at grid time t[k]
    y_ours = np.stack([y_clean + t * eps_known for t in t_grid], 0)
    y_ref = y_ours[::-1].copy()
    out["inpaint_mask"] = mask
    out["inpaint_y_ours"] = y_ours
    run("inpaint_edm", edm, noise_seq,
        lambda: edm.inpaint(xb.clone(), torch.tensor(y_ref),
                            torch.tensor(mask), score_fn, nsteps=NSTEPS,
                            record_history=True))

    # repaint: renoise draws are the only stochastic element
    RN, RS, NR = 12, 4, 2
    renoise_seq = rng.standard_normal(
        (NR * (RN // RS - 1), 4, 3)).astype(np.float32)
    t12 = edm.create_steps(RN + 1).numpy()
    y12_ours = np.stack([y_clean + t * eps_known for t in t12], 0)
    out["repaint_renoise_seq"] = renoise_seq
    out["repaint_y_ours"] = y12_ours
    run("repaint_edm", edm, renoise_seq,
        lambda: edm.repaint(xb.clone(), torch.tensor(y12_ours[::-1].copy()),
                            torch.tensor(mask), score_fn, nsteps=RN,
                            rsteps=RS, nresamples=NR))

    np.savez_compressed(os.path.join(OUTDIR, "stochastic_golden.npz"), **out)
    print(f"wrote stochastic_golden.npz ({len(out)} arrays)")


def gen_adm_fixture():
    """ADM forward with state_dict (adm.py:119-216), incl. the attention
    middle block."""
    import torch
    from diffsci.models.nets.adm import ADM, ADMConfig

    torch.manual_seed(77)
    config = ADMConfig(model_channels=8,
                       time_embed_dim=8,
                       output_embed_dim=16,
                       channel_expansion=[2],
                       number_resnet_downward_block=1,
                       number_resnet_upward_block=1,
                       number_resnet_attn_block=2,
                       number_resnet_before_attn_block=1,
                       number_resnet_after_attn_block=1,
                       num_groups=1)
    net = ADM(config)
    net.eval()
    rng = np.random.default_rng(78)
    x = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    t = np.array([0.5, 2.0], np.float32)
    with torch.no_grad():
        y = net(torch.tensor(x), torch.tensor(t)).numpy()
    arrays = {"x": x, "t": t, "y": y}
    arrays.update(sd_arrays(net))
    np.savez_compressed(os.path.join(OUTDIR, "adm_forward.npz"), **arrays)
    print(f"wrote adm fixture: {len(arrays) - 3} params, "
          f"out std {y.std():.4f}")
    # decoder_type=2 variant (skip joined inside every block, adm.py:847-851)
    torch.manual_seed(79)
    config2 = ADMConfig(model_channels=8,
                        time_embed_dim=8,
                        output_embed_dim=16,
                        channel_expansion=[2],
                        number_resnet_downward_block=1,
                        number_resnet_upward_block=1,
                        number_resnet_attn_block=2,
                        number_resnet_before_attn_block=1,
                        number_resnet_after_attn_block=1,
                        num_groups=1,
                        decoder_type=2,
                        skip_integration_type='add')
    net2 = ADM(config2)
    net2.eval()
    with torch.no_grad():
        y2 = net2(torch.tensor(x), torch.tensor(t)).numpy()
    arrays2 = {"x": x, "t": t, "y": y2}
    arrays2.update(sd_arrays(net2))
    np.savez_compressed(os.path.join(OUTDIR, "adm_forward_dec2.npz"),
                        **arrays2)
    print(f"wrote adm dec2 fixture: out std {y2.std():.4f}")


def gen_autoencoderkl_fixture():
    """AutoencoderKL 2D encode(mode)/decode (autoencoderldm2d.py:552-631)."""
    import torch
    from diffsci.models.nets import autoencoderldm2d as ldm

    class DummyLossConfig:
        disc_start = 0
        kl_weight = 0.0
        disc_weight = 0.0

        @staticmethod
        def target(*a, **k):
            return torch.nn.Identity()

    torch.manual_seed(91)
    # ch must be a multiple of 32: the LDM Normalize hardcodes
    # GroupNorm(num_groups=32) (autoencoderldm2d.py:18)
    dd = ldm.ddconfig(double_z=True, z_channels=3, resolution=32,
                      in_channels=1, out_ch=1, ch=32, ch_mult=[1, 2],
                      num_res_blocks=1, attn_resolutions=[],
                      dropout=0.0, has_mid_attn=True)
    ae = ldm.AutoencoderKL(dd, DummyLossConfig, embed_dim=3)
    ae.eval()
    rng = np.random.default_rng(92)
    x = rng.standard_normal((2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        post = ae.encode(torch.tensor(x))
        z_mode = post.mode()
        dec = ae.decode(z_mode)
    arrays = {"x": x,
              "moments": post.parameters.numpy(),
              "z_mode": z_mode.numpy(),
              "decoded": dec.numpy()}
    arrays.update(sd_arrays(ae))
    np.savez_compressed(os.path.join(OUTDIR, "autoencoderkl2d.npz"),
                        **arrays)
    print(f"wrote autoencoderkl2d fixture: {len(arrays) - 4} params, "
          f"dec std {dec.numpy().std():.4f}")


def gen_vaenet_fixture():
    """VAENet 2D encode(sample=False)/decode (vaenet.py:1231-1260)."""
    import torch
    from diffsci.models.nets.vaenet import VAENet, VAENetConfig

    torch.manual_seed(101)
    cfg = VAENetConfig(dimension=2, in_channels=1, out_channels=1,
                       z_channels=3, z_dim=3, ch=8, ch_mult=[1, 2],
                       num_res_blocks=1, attn_resolutions=[],
                       resolution=16, has_mid_attn=True, num_groups=1,
                       use_flash_attention=False)
    net = VAENet(cfg)
    net.eval()
    rng = np.random.default_rng(102)
    x = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        moments = net.encode(torch.tensor(x), sample=False)
        z = moments[:, :cfg.z_dim]
        dec = net.decode(z)
    arrays = {"x": x, "moments": moments.numpy(), "decoded": dec.numpy()}
    arrays.update(sd_arrays(net))
    np.savez_compressed(os.path.join(OUTDIR, "vaenet_forward.npz"), **arrays)
    print(f"wrote vaenet fixture: {len(arrays) - 3} params, "
          f"dec std {dec.numpy().std():.4f}")


def gen_mlp_fixture():
    """MLPUncond / MLPCond forwards (mlp.py:4-121)."""
    import torch
    from diffsci.models.nets.mlp import MLPUncond, MLPCond

    rng = np.random.default_rng(111)
    x = rng.standard_normal((4, 3)).astype(np.float32)
    t = np.array([0.1, 0.5, 1.0, 2.0], np.float32)
    y = rng.standard_normal((4, 2)).astype(np.float32)
    torch.manual_seed(112)
    net_u = MLPUncond(3, hidden_dims=[8, 8])
    torch.manual_seed(113)
    net_c = MLPCond(3, 2, hidden_dims=[8, 8])
    net_u.eval(), net_c.eval()
    with torch.no_grad():
        yu = net_u(torch.tensor(x), torch.tensor(t)).numpy()
        yc = net_c(torch.tensor(x), torch.tensor(t),
                   torch.tensor(y)).numpy()
    arrays = {"x": x, "t": t, "ycond": y, "out_uncond": yu, "out_cond": yc}
    arrays.update(sd_arrays(net_u, "usd__"))
    arrays.update(sd_arrays(net_c, "csd__"))
    np.savez_compressed(os.path.join(OUTDIR, "mlp_forward.npz"), **arrays)
    print("wrote mlp fixture")


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch
    # KarrasModule / AutoencoderKL subclass lightning.LightningModule;
    # bind the stub to the real torch.nn.Module so parameters()/state_dict()
    # and module registration work (we execute the reference, CPU-only)
    sys.modules["lightning"].LightningModule = torch.nn.Module
    sys.modules["lightning.pytorch"].LightningModule = torch.nn.Module
    torch.manual_seed(0)
    os.makedirs(OUTDIR, exist_ok=True)

    gen_mlp_fixture()
    gen_karras_loss_fixture()
    gen_stochastic_fixture()
    gen_adm_fixture()
    gen_autoencoderkl_fixture()
    gen_vaenet_fixture()


if __name__ == "__main__":
    main()
