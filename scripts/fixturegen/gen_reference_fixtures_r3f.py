"""Round-3f golden parity fixtures: ConVit forwards with transferred
weights (nets/convit.py:15-735).

Cases:
- softmax attention, time embedding (the default path)
- linear attention (elu+1 feature map, convit.py:480-533)
- conv down/upsample (strided conv + transposed conv, convit.py:246-303)
- conditional embedding + relative positioning

Fixture generator: run offline, outputs committed. The reference is
executed, never copied.

Usage: python scripts/gen_reference_fixtures_r3f.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_reference_fixtures import install_stubs, OUTDIR  # noqa: E402


def gen_convit():
    import torch
    from diffsci.models.nets.convit import ConVit, ConVitConfig

    rng = np.random.default_rng(150)
    B, H, W = 2, 16, 16
    x = rng.standard_normal((B, 1, H, W)).astype(np.float32)
    t = np.array([0.5, 2.0], np.float32)
    ycond = rng.standard_normal((B, 3)).astype(np.float32)
    out = {"x": x, "t": t, "ycond": ycond}

    base = dict(in_channels=1, embed_dim=8, num_pos_dims=2, num_layers=2,
                num_heads=2, ffn_expansion_factor=2,
                attn_compression_factor=2, kernel_size_in_out=3,
                kernel_size_conv=1, kernel_size_depthwise=3,
                has_time_embedding=True, condition_dropout=0.0)
    cases = {
        "softmax": dict(),
        "linear": dict(linear_attention=True),
        "convsample": dict(with_conv_on_upsample=True,
                           with_conv_on_downsample=True),
        "cond": dict(has_conditional_embedding=True,
                     relative_positioning=True),
    }
    for name, extra in cases.items():
        torch.manual_seed(100 + len(name))
        # broken upstream: has_conditional_embedding=False is
        # unconstructable — `isinstance(conditional_embedding, None)`
        # raises TypeError (convit.py:715). Identity embedding + y=None
        # is mathematically identical (forward: `ye = cemb(y) if y is
        # not None else 0.0`, convit.py:722).
        cfg = ConVitConfig(**{**base, **extra,
                              "has_conditional_embedding": True})
        if extra.get("has_conditional_embedding"):
            cemb = torch.nn.Linear(3, 8)
        else:
            cemb = torch.nn.Identity()
        net = ConVit(cfg, conditional_embedding=cemb)
        net.eval()
        with torch.no_grad():
            y = net(torch.tensor(x), torch.tensor(t),
                    torch.tensor(ycond) if name == "cond" else None
                    ).numpy()
        out[f"{name}_out"] = y
        for k, v in net.state_dict().items():
            out[f"{name}sd__{k}"] = v.numpy()
        print(f"  convit {name}: out std {y.std():.4f}, "
              f"{sum(1 for k in net.state_dict())} tensors")
    np.savez_compressed(os.path.join(OUTDIR, "convit_forward.npz"), **out)
    print("wrote convit_forward.npz")


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch
    torch.manual_seed(0)
    os.makedirs(OUTDIR, exist_ok=True)
    gen_convit()


if __name__ == "__main__":
    main()
