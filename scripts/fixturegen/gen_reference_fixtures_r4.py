"""Round-4 golden parity fixture: the reference's FULL sampling pipeline
in one trajectory — preconditioner x scheduler x integrator x PUNetG
composed exactly as ``KarrasModule.sample`` runs them
(karrasmodule.py:801-931 -> schedulers.py:48-89 -> integrators.py:38-54
-> punetg.py:389-416).

Every stage is already pinned in isolation (punetg_forward.npz,
math_golden.npz, stoch trajectories); this fixture closes the last
composition gap: an 18-NFE deterministic Heun sample from fixed white
noise through a real (transferred-weight) PUNetG, unconditional and
with classifier-free guidance != 1 through a conditional embedding.

Fixture generator: run offline, outputs committed. The reference is
executed, never copied.

Usage: python scripts/gen_fixtures.py --only r4
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_reference_fixtures import install_stubs, OUTDIR  # noqa: E402
from gen_reference_fixtures_r3 import sd_arrays  # noqa: E402

# history frames kept (of the 19-frame record_history output): enough to
# localize a divergence to early/mid/late integration without 19x bulk
KEEP = np.array([0, 1, 6, 12, 17, 18])


def _small_config():
    from diffsci.models.nets.punetg_config import PUNetGConfig
    # the punetg_forward.npz config (gen_reference_fixtures.py): small
    # enough to run 18 Heun steps in seconds, still exercises down/up
    # paths, attention bottleneck resnets and Fourier time embedding
    return PUNetGConfig(model_channels=8,
                        channel_expansion=[2],
                        number_resnet_downward_block=1,
                        number_resnet_upward_block=1,
                        number_resnet_attn_block=1,
                        number_resnet_before_attn_block=1,
                        number_resnet_after_attn_block=1)


def gen_full_pipeline_sample_fixture():
    import torch
    from diffsci.models.nets.punetg import PUNetG
    from diffsci.models.karras.karrasmodule import (KarrasModule,
                                                    KarrasModuleConfig)

    rng = np.random.default_rng(418)
    B, H = 2, 16
    x0 = rng.standard_normal((B, 1, H, H)).astype(np.float32)
    out = {"x0": x0, "keep": KEEP, "nsteps": np.int64(18)}

    # --- case A: unconditional 18-NFE deterministic Heun sample ---
    torch.manual_seed(1234)
    net = PUNetG(_small_config())
    net.eval()
    module = KarrasModule(net, KarrasModuleConfig.from_edm())
    module.eval()
    with torch.no_grad():
        hist = module.propagate_white_noise(
            torch.tensor(x0), nsteps=18, record_history=True)
    out["uncond_traj"] = hist.numpy()[KEEP]
    out.update(sd_arrays(net, "usd__"))
    print(f"  uncond: {hist.shape}, final std {hist[-1].std():.4f}")

    # --- case B: CFG guidance=2.5 through a conditional embedding
    # (Linear YD->C added to the time embedding, punetg.py:400-410;
    # the uncond CFG branch calls the net with y omitted,
    # karrasmodule.py:714-716, which PUNetG handles by skipping the
    # conditional add, punetg.py:400) ---
    YD = 3
    torch.manual_seed(1235)
    cemb = torch.nn.Linear(YD, 8)
    net_c = PUNetG(_small_config(), conditional_embedding=cemb)
    net_c.eval()
    module_c = KarrasModule(net_c, KarrasModuleConfig.from_edm(),
                            conditional=True)
    module_c.eval()
    # unbatched y: propagate_toward_sample dict_unsqueezes to [1, YD]
    # and broadcasting covers the batch (karrasmodule.py:916-917)
    ycond = rng.standard_normal((YD,)).astype(np.float32)
    out["y"] = ycond
    with torch.no_grad():
        hist_c = module_c.propagate_white_noise(
            torch.tensor(x0), torch.tensor(ycond), guidance=2.5,
            nsteps=18, record_history=True)
    out["cfg_traj"] = hist_c.numpy()[KEEP]
    out.update(sd_arrays(net_c, "csd__"))
    print(f"  cfg g=2.5: {hist_c.shape}, final std "
          f"{hist_c[-1].std():.4f}")

    # --- case C: stochastic full pipeline — Euler-Maruyama with replayed
    # per-step noise through the same uncond net (schedulers.py:247-294
    # SDE rhs + integrators.py:57-69), closing the stochastic composition
    # gap too ---
    noise_seq = rng.standard_normal((40, B, 1, H, H)).astype(np.float32)
    out["noise_seq"] = noise_seq
    seq = [torch.tensor(n) for n in noise_seq]
    idx = [0]
    orig = torch.randn_like

    def replay(t, **kw):
        n = seq[idx[0] % len(seq)]
        idx[0] += 1
        return n.to(t)

    torch.randn_like = replay
    try:
        with torch.no_grad():
            hist_s = module.propagate_white_noise(
                torch.tensor(x0), nsteps=18, record_history=True,
                integrator="euler-maruyama")
    finally:
        torch.randn_like = orig
    out["em_traj"] = hist_s.numpy()[KEEP]
    out["em_ndraws"] = np.int64(idx[0])
    print(f"  euler-maruyama: {idx[0]} draws, final std "
          f"{hist_s[-1].std():.4f}")

    np.savez_compressed(os.path.join(OUTDIR, "full_pipeline_sample.npz"),
                        **out)
    print(f"wrote full_pipeline_sample.npz ({len(out)} arrays)")


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch
    sys.modules["lightning"].LightningModule = torch.nn.Module
    sys.modules["lightning.pytorch"].LightningModule = torch.nn.Module
    torch.manual_seed(0)
    os.makedirs(OUTDIR, exist_ok=True)

    gen_full_pipeline_sample_fixture()


if __name__ == "__main__":
    main()
