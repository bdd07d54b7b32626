"""Round-3i golden parity fixtures: the autoregressive training loss
(karras/autoregressiveloss.py:7-274) — the reference's most expensive
path: per-horizon step losses with in-training sampling feeding the
conditioning channel window.

The in-training diffusion sampler is replaced by the SAME deterministic
stub on both sides (pred = tanh(mean over the y['y'] window) + 0.1), so
the pin covers target/mask splitting, weight normalization, the window
shift, and the composed step losses — with replayed sigma and noise.

Usage: python scripts/gen_reference_fixtures_r3i.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_reference_fixtures import install_stubs, OUTDIR  # noqa: E402


def gen_autoregressive_loss():
    import torch
    from diffsci.models.karras.karrasmodule_new import (
        EnsembleKarrasModule, EnsembleKarrasModuleConfig)
    from diffsci.models.nets.punetg import PUNetGCond
    from diffsci.models.nets.punetg_config import PUNetGConfig

    torch.manual_seed(130)
    # x channels concat with the k=2-frame window: input = 1 + 2
    net = PUNetGCond(PUNetGConfig(model_channels=8,
                                  input_channels=3,
                                  output_channels=1,
                                  channel_expansion=[2],
                                  number_resnet_downward_block=1,
                                  number_resnet_upward_block=1,
                                  number_resnet_attn_block=1,
                                  number_resnet_before_attn_block=1,
                                  number_resnet_after_attn_block=1),
                     channel_conditional_items=["y"])
    net.eval()

    rng = np.random.default_rng(190)
    B, S, C, H, W = 2, 3, 1, 16, 16
    x = rng.standard_normal((B, S * C, H, W)).astype(np.float32)
    ywin = rng.standard_normal((B, 2 * C, H, W)).astype(np.float32)
    mask = (rng.random((B, S * C, H, W)) < 0.3).astype(np.float32)
    sigma_seq = np.stack([np.array([0.4, 3.0], np.float32),
                          np.array([1.0, 0.1], np.float32),
                          np.array([7.0, 0.7], np.float32)])
    eps_seq = rng.standard_normal((S, B, C, H, W)).astype(np.float32)
    out = {"x": x, "ywin": ywin, "mask": mask, "sigma_seq": sigma_seq,
           "eps_seq": eps_seq}
    for k, v in net.state_dict().items():
        out["sd__" + k] = v.numpy()

    cfg = EnsembleKarrasModuleConfig.from_edm()
    cfg.autoregressive_loss_steps = S
    cfg.autoregressive_loss_weights = [0.5, 0.3, 0.2]
    module = EnsembleKarrasModule(net, cfg, conditional=True, masked=True)
    module.eval()

    # deterministic sampler stub shared with the JAX test; the reference
    # routes batched conditioning through per-item sample(nsamples=1)
    # calls (autoregressiveloss.py:163-175) — both branches reduce to
    # pred = tanh(mean over the window channels) + 0.1
    def stub_sample(nsamples, shape, y=None, **kw):
        w = y["y"]
        if w.dim() == 3:  # unbatched per-item call
            return (torch.tanh(w.mean(dim=0, keepdim=True))
                    + 0.1).unsqueeze(0)
        return torch.tanh(w.mean(dim=1, keepdim=True)) + 0.1

    module.sample = stub_sample

    sig_iter = iter([torch.tensor(s) for s in sigma_seq])
    real_sampler = module.config.noisesampler

    class SigmaStub:
        def sample(self, n):
            return next(sig_iter)

        def loss_weighting(self, sigma):
            return real_sampler.loss_weighting(sigma)

    module.config.noisesampler = SigmaStub()

    eps_iter = iter([torch.tensor(e) for e in eps_seq])
    calls = {"n": 0}
    orig_rl = torch.randn_like

    def shim(z, **kw):
        calls["n"] += 1
        return next(eps_iter).to(z)

    torch.randn_like = shim
    try:
        with torch.no_grad():
            total = module.autoregressive_loss_fn(
                torch.tensor(x), y={"y": torch.tensor(ywin)},
                mask=torch.tensor(mask))
    finally:
        torch.randn_like = orig_rl
    assert calls["n"] == S, calls
    out["total"] = np.float64(total.item())
    out["step_losses"] = np.array(
        [float(v) for v in module.last_autoregressive_step_losses],
        np.float64)
    print(f"  ar total = {total.item():.8f}, steps = "
          f"{[round(float(v), 6) for v in module.last_autoregressive_step_losses]}")
    np.savez_compressed(os.path.join(OUTDIR, "autoregressive_loss.npz"),
                        **out)
    print("wrote autoregressive_loss.npz")


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch
    sys.modules["lightning"].LightningModule = torch.nn.Module
    sys.modules["lightning.pytorch"].LightningModule = torch.nn.Module
    torch.manual_seed(0)
    os.makedirs(OUTDIR, exist_ok=True)
    gen_autoregressive_loss()


if __name__ == "__main__":
    main()
