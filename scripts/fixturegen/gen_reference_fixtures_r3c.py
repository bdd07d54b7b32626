"""Round-3c golden parity fixtures: the EnsembleKarrasModule (v2) loss
family and the PUNetG variant networks.

Extends gen_reference_fixtures{,_r3,_r3b}.py with:

- EnsembleKarrasModule.loss_fn with replayed noise: vectorized ensemble
  CRPS (plain + masked), ensemble Huber, and the n_ensemble=1 legacy
  path (reference karrasmodule_new.py:963-1149, custom_losses.py
  EnsembleAwareCRPSLoss/EnsembleAwareHuberLoss)
- PUNetGDeterministic forward (punetg_deterministic.py:447-...)
- PUNetGEncoder / PUNetGDecoder half-network forwards
  (punetg_encdec.py:199-376)
- PUNetV forward with slice embeddings off (punetv.py:733-...)

Fixture generator: run offline, outputs committed. The reference is
executed, never copied.

Usage: python scripts/gen_reference_fixtures_r3c.py [outdir]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_reference_fixtures import install_stubs, OUTDIR  # noqa: E402


def _small_cfg_kwargs():
    return dict(model_channels=8,
                channel_expansion=[2],
                number_resnet_downward_block=1,
                number_resnet_upward_block=1,
                number_resnet_attn_block=1,
                number_resnet_before_attn_block=1,
                number_resnet_after_attn_block=1)


def gen_ensemble_loss_fixture():
    """EnsembleKarrasModule.loss_fn with replayed noise
    (karrasmodule_new.py:963-1149)."""
    import torch
    from diffsci.models.karras.karrasmodule_new import (
        EnsembleKarrasModule, EnsembleKarrasModuleConfig)
    from diffsci.models.nets.punetg import PUNetG
    from diffsci.models.nets.punetg_config import PUNetGConfig

    torch.manual_seed(71)
    net = PUNetG(PUNetGConfig(**_small_cfg_kwargs()))
    net.eval()

    rng = np.random.default_rng(91)
    B, E, C, H, W = 2, 3, 1, 16, 16
    x = rng.standard_normal((B, C, H, W)).astype(np.float32)
    sigma = np.array([0.4, 3.0], np.float32)
    mask = (rng.random((B, C, H, W)) < 0.3).astype(np.float32)
    eps_ens = rng.standard_normal((B, E, C, H, W)).astype(np.float32)
    out = {"x": x, "sigma": sigma, "mask": mask, "eps_ens": eps_ens,
           "n_ensemble": np.int64(E)}
    for k, v in net.state_dict().items():
        out["sd__" + k] = v.numpy()

    fixed_ens = torch.tensor(eps_ens)
    fixed_single = torch.tensor(eps_ens[:, 0])
    orig_randn = torch.randn
    orig_randn_like = torch.randn_like

    cases = {
        "crps_e3": ("CRPS", E, None),
        "crps_e3_masked": ("CRPS", E, mask),
        "huber_e3": ("huber", E, None),
        "huber_e1": ("huber", 1, None),
    }
    for name, (metric, ne, mk) in cases.items():
        cfg = EnsembleKarrasModuleConfig.from_edm(loss_metric=metric)
        # set_loss_metric (karrasmodule_new.py:845) only wires the
        # EnsembleAware* losses when ensemble_size_train > 1
        cfg.ensemble_size_train = ne
        module = EnsembleKarrasModule(net, cfg, masked=mk is not None)
        torch.randn = lambda *a, **kw: fixed_ens.clone()
        torch.randn_like = lambda t, **kw: fixed_single.to(t)
        try:
            with torch.no_grad():
                loss = module.loss_fn(
                    torch.tensor(x), torch.tensor(sigma),
                    mask=None if mk is None else torch.tensor(mk),
                    n_ensemble=ne)
        finally:
            torch.randn = orig_randn
            torch.randn_like = orig_randn_like
        out[f"loss_{name}"] = np.float64(loss.item())
        print(f"  loss_{name} = {loss.item():.8f}")

    np.savez_compressed(os.path.join(OUTDIR, "ensemble_loss.npz"), **out)
    print(f"wrote ensemble_loss.npz ({len(out)} arrays)")


def gen_punetg_deterministic_fixture():
    """PUNetGDeterministic forward (punetg_deterministic.py:78-470)."""
    import torch
    from diffsci.models.nets.punetg_deterministic import PUNetGDeterministic
    from diffsci.models.nets.punetg_deterministic_config import (
        PUNetGDeterministicConfig)

    torch.manual_seed(72)
    net = PUNetGDeterministic(PUNetGDeterministicConfig(
        **_small_cfg_kwargs()))
    net.eval()
    rng = np.random.default_rng(92)
    x = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    with torch.no_grad():
        y = net(torch.tensor(x)).numpy()
    arrays = {"x": x, "y": y}
    for k, v in net.state_dict().items():
        arrays["sd__" + k] = v.numpy()
    np.savez_compressed(os.path.join(OUTDIR,
                                     "punetg_deterministic.npz"), **arrays)
    print(f"wrote punetg_deterministic fixture: {len(arrays) - 2} params, "
          f"out std {y.std():.4f}")


def gen_punetg_encdec_fixture():
    """PUNetGEncoder / PUNetGDecoder half-network forwards
    (punetg_encdec.py:11-376)."""
    import torch
    from diffsci.models.nets.punetg_encdec import (PUNetGEncoder,
                                                   PUNetGDecoder)
    from diffsci.models.nets.punetg_config import PUNetGConfig

    cfg = PUNetGConfig(**_small_cfg_kwargs())
    torch.manual_seed(73)
    enc = PUNetGEncoder(cfg, use_time_embedding=True)
    torch.manual_seed(74)
    dec = PUNetGDecoder(cfg, use_time_embedding=True)
    enc.eval()
    dec.eval()

    rng = np.random.default_rng(93)
    x = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    t = np.array([0.5, 2.0], np.float32)
    with torch.no_grad():
        z = enc(torch.tensor(x), torch.tensor(t))
        xr = dec(z, torch.tensor(t))
    arrays = {"x": x, "t": t, "z": z.numpy(), "xr": xr.numpy()}
    for k, v in enc.state_dict().items():
        arrays["esd__" + k] = v.numpy()
    for k, v in dec.state_dict().items():
        arrays["dsd__" + k] = v.numpy()
    np.savez_compressed(os.path.join(OUTDIR, "punetg_encdec.npz"),
                        **arrays)
    print(f"wrote punetg_encdec fixture: z {z.shape}, "
          f"xr std {xr.numpy().std():.4f}")


def gen_punetv_fixture():
    """PUNetV forward without slice embeddings (punetv.py:356-792)."""
    import torch
    from diffsci.models.nets.punetv import PUNetV, PUNetVConfig

    torch.manual_seed(75)
    cfg = PUNetVConfig(**_small_cfg_kwargs())
    net = PUNetV(cfg)
    net.eval()
    rng = np.random.default_rng(94)
    x = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    t = np.array([0.5, 2.0], np.float32)
    with torch.no_grad():
        y = net(torch.tensor(x), torch.tensor(t)).numpy()
    arrays = {"x": x, "t": t, "y": y}
    for k, v in net.state_dict().items():
        arrays["sd__" + k] = v.numpy()
    np.savez_compressed(os.path.join(OUTDIR, "punetv_forward.npz"),
                        **arrays)
    print(f"wrote punetv fixture: {len(arrays) - 3} params, "
          f"out std {y.std():.4f}")


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch
    sys.modules["lightning"].LightningModule = torch.nn.Module
    sys.modules["lightning.pytorch"].LightningModule = torch.nn.Module
    torch.manual_seed(0)
    os.makedirs(OUTDIR, exist_ok=True)

    gen_ensemble_loss_fixture()
    gen_punetg_deterministic_fixture()
    gen_punetg_encdec_fixture()
    gen_punetv_fixture()


if __name__ == "__main__":
    main()
