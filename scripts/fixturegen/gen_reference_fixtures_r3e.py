"""Round-3e golden parity fixtures: base custom losses, the physics
conditioning embedders, the minimal classifier, and PUNetGCond.

Extends gen_reference_fixtures{,_r3,_r3b,_r3c,_r3d}.py with:

- GaussianWeightedMSELoss elementwise tensors, 2D + 3D
  (custom_losses.py:5-94)
- MultiThresholdSmoothIndicatorLoss scalars: sigmoid/tanh/gumbel,
  multi-threshold, masked, mean/sum/max aggregation
  (custom_losses.py:96-296)
- Embedder forwards with transferred weights: PositionalEncoding1d,
  TwoPointCorrelationEmbedder, PoreSizeDistEmbedder, PorosityEmbedder,
  CompositeEmbedder, TwoPointCorrelationTransformer
  (nets/embedder.py:6-246)
- MinimalResNet classifier forwards, 2D + 3D (nets/classifiers.py:34-88)
- PUNetGCond forward: channel-concatenated conditioning
  (nets/punetg.py:633-735)

Fixture generator: run offline, outputs committed. The reference is
executed, never copied.

Usage: python scripts/gen_reference_fixtures_r3e.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_reference_fixtures import install_stubs, OUTDIR  # noqa: E402


def gen_custom_losses():
    """GaussianWeightedMSELoss + MultiThresholdSmoothIndicatorLoss
    (custom_losses.py:5-296)."""
    import torch
    from diffsci.custom_losses import (GaussianWeightedMSELoss,
                                       MultiThresholdSmoothIndicatorLoss)

    rng = np.random.default_rng(140)
    out = {}

    # --- Gaussian-weighted MSE: elementwise, 2D and 3D ---
    p2 = rng.standard_normal((2, 1, 6, 6)).astype(np.float32)
    t2 = rng.standard_normal((2, 1, 6, 6)).astype(np.float32)
    p3 = rng.standard_normal((1, 2, 4, 4, 4)).astype(np.float32)
    t3 = rng.standard_normal((1, 2, 4, 4, 4)).astype(np.float32)
    out.update({"gw_p2": p2, "gw_t2": t2, "gw_p3": p3, "gw_t3": t3})
    with torch.no_grad():
        out["gw_out2"] = GaussianWeightedMSELoss((6, 6), 0.5)(
            torch.tensor(p2), torch.tensor(t2)).numpy()
        out["gw_out3"] = GaussianWeightedMSELoss((4, 4, 4), 1.2)(
            torch.tensor(p3), torch.tensor(t3)).numpy()
    print(f"  gaussian-weighted mse: 2D mean {out['gw_out2'].mean():.6f}, "
          f"3D mean {out['gw_out3'].mean():.6f}")

    # --- Multi-threshold smooth indicator: scalars ---
    pred = rng.standard_normal((3, 1, 5, 5)).astype(np.float32)
    target = rng.standard_normal((3, 1, 5, 5)).astype(np.float32)
    mask = rng.random((3, 1, 5, 5)) < 0.3  # bool, True = exclude
    out.update({"mt_pred": pred, "mt_target": target,
                "mt_mask": mask.astype(np.float32)})
    cases = {
        "sigmoid_default": dict(thresholds=0.5),
        # temperature kept low enough that tanh never saturates to 1.0f:
        # at T=10 float32 tanh rounds to exactly 1.0 on one framework but
        # not the other and log(1-pi+eps) amplifies the ULP unboundedly
        "tanh_multi": dict(thresholds=[0.3, 0.7], loss_type="tanh",
                           temperature=2.0,
                           focus_weights=1.5, background_weights=0.2,
                           fp_penalty=2.0, se_weight=0.25,
                           aggregation="sum"),
        "gumbel_max": dict(thresholds=[0.2, 0.5], loss_type="gumbel",
                           temperature=5.0, aggregation="max"),
        "sigmoid_masked": dict(thresholds=[0.0, 0.5],
                               focus_weights=[2.0, 3.0],
                               background_weights=[0.1, 0.2]),
    }
    with torch.no_grad():
        for name, kw in cases.items():
            loss = MultiThresholdSmoothIndicatorLoss(**kw)
            mk = torch.tensor(mask) if name.endswith("masked") else None
            val = loss(torch.tensor(pred), torch.tensor(target), mk)
            out[f"mt_{name}"] = np.float64(val.item())
            print(f"  multithreshold {name} = {val.item():.8f}")
    np.savez_compressed(os.path.join(OUTDIR, "custom_losses.npz"), **out)
    print(f"wrote custom_losses.npz ({len(out)} arrays)")


def gen_embedders():
    """Conditioning embedders with transferred weights
    (nets/embedder.py:6-246)."""
    import torch
    from diffsci.models.nets.embedder import (
        PositionalEncoding1d, TwoPointCorrelationEmbedder,
        TwoPointCorrelationTransformer, PoreSizeDistEmbedder,
        PorosityEmbedder, CompositeEmbedder)

    rng = np.random.default_rng(141)
    B, L, E = 3, 5, 8
    data = {
        "tpc_dist": rng.uniform(0.1, 4.0, (B, L)).astype(np.float32),
        "tpc_prob": rng.uniform(0.05, 0.95, (B, L)).astype(np.float32),
        "psd_centers": rng.uniform(0.1, 2.0, (B, L)).astype(np.float32),
        "psd_cdf": rng.uniform(0.0, 1.0, (B, L)).astype(np.float32),
        "porosity": rng.uniform(0.1, 0.6, (B, 1)).astype(np.float32),
    }
    tdata = {k: torch.tensor(v) for k, v in data.items()}
    out = {f"in_{k}": v for k, v in data.items()}

    with torch.no_grad():
        out["posenc"] = PositionalEncoding1d(E)(
            tdata["tpc_dist"]).numpy()

        torch.manual_seed(90)
        tpc = TwoPointCorrelationEmbedder(E, reduction=None)
        out["tpc_out"] = tpc(tdata).numpy()
        torch.manual_seed(91)
        tpc_mean = TwoPointCorrelationEmbedder(E, reduction="mean")
        out["tpc_mean_out"] = tpc_mean(tdata).numpy()

        torch.manual_seed(92)
        psd = PoreSizeDistEmbedder(E, reduction="mean")
        out["psd_out"] = psd(tdata).numpy()

        torch.manual_seed(93)
        poro = PorosityEmbedder(E)
        out["poro_out"] = poro(tdata).numpy()

        comp = CompositeEmbedder([poro, psd])
        out["comp_out"] = comp(tdata).numpy()

        torch.manual_seed(94)
        tpct = TwoPointCorrelationTransformer(
            TwoPointCorrelationEmbedder(E), nhead=2, num_layers=2)
        tpct.eval()
        out["tpct_out"] = tpct(tdata).numpy()

    for prefix, mod in [("tpc", tpc), ("tpcm", tpc_mean), ("psd", psd),
                        ("poro", poro), ("tpct", tpct)]:
        for k, v in mod.state_dict().items():
            out[f"{prefix}sd__{k}"] = v.numpy()
    np.savez_compressed(os.path.join(OUTDIR, "embedders.npz"), **out)
    print(f"wrote embedders.npz ({len(out)} arrays), tpct out std "
          f"{out['tpct_out'].std():.4f}")


def gen_classifier():
    """MinimalResNet forwards, 2D + 3D (nets/classifiers.py:34-88)."""
    import torch
    from diffsci.models.nets.classifiers import MinimalResNet

    rng = np.random.default_rng(142)
    out = {}
    for dim, tag in [(2, "c2"), (3, "c3")]:
        torch.manual_seed(95 + dim)
        net = MinimalResNet(in_channels=1, out_classes=3, model_channels=8,
                            n_layers=2, dim=dim, num_groups=4)
        net.eval()
        x = rng.standard_normal((2, 1) + (8,) * dim).astype(np.float32)
        with torch.no_grad():
            y = net(torch.tensor(x)).numpy()
        out[f"{tag}_x"] = x
        out[f"{tag}_logits"] = y
        for k, v in net.state_dict().items():
            out[f"{tag}sd__{k}"] = v.numpy()
        print(f"  classifier dim={dim}: logits std {y.std():.4f}")
    np.savez_compressed(os.path.join(OUTDIR, "classifier_forward.npz"),
                        **out)
    print("wrote classifier_forward.npz")


def gen_punetg_cond():
    """PUNetGCond: y['pmap'] concatenated as an input channel
    (punetg.py:633-735)."""
    import torch
    from diffsci.models.nets.punetg import PUNetGCond
    from diffsci.models.nets.punetg_config import PUNetGConfig

    torch.manual_seed(96)
    config = PUNetGConfig(model_channels=8,
                          input_channels=2,
                          output_channels=1,
                          channel_expansion=[2],
                          number_resnet_downward_block=1,
                          number_resnet_upward_block=1,
                          number_resnet_attn_block=1,
                          number_resnet_before_attn_block=1,
                          number_resnet_after_attn_block=1)
    net = PUNetGCond(config, channel_conditional_items=["pmap"])
    net.eval()
    rng = np.random.default_rng(143)
    x = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    pmap = rng.standard_normal((2, 1, 16, 16)).astype(np.float32)
    t = np.array([0.5, 2.0], np.float32)
    with torch.no_grad():
        y = net(torch.tensor(x), torch.tensor(t),
                {"pmap": torch.tensor(pmap)}).numpy()
    arrays = {"x": x, "t": t, "pmap": pmap, "y": y}
    for k, v in net.state_dict().items():
        arrays["sd__" + k] = v.numpy()
    np.savez_compressed(os.path.join(OUTDIR, "punetg_cond.npz"), **arrays)
    print(f"wrote punetg_cond.npz ({len(arrays) - 4} params, out std "
          f"{y.std():.4f})")


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch
    torch.manual_seed(0)
    os.makedirs(OUTDIR, exist_ok=True)

    gen_custom_losses()
    gen_embedders()
    gen_classifier()
    gen_punetg_cond()


if __name__ == "__main__":
    main()
