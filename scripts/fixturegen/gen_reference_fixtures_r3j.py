"""Round-3j golden parity fixtures: the full DASC video-clustering net
(nets/dasc_net.py:11-426) — frame AE backbone, VMM attention pooling,
the self-representation coefficient matrix, feature recovery, and the
two-stage loss.

Usage: python scripts/gen_reference_fixtures_r3j.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from gen_reference_fixtures import install_stubs, OUTDIR  # noqa: E402


def gen_dasc():
    import torch
    from diffsci.models.nets.dasc_net import DASC, DASCConfig

    torch.manual_seed(140)
    cfg = DASCConfig(in_channels=1, frame_height=16, frame_width=16,
                     frames_per_video=3, latent_dim=16, num_videos=4,
                     encoder_channels=[8, 16], vmm_num_layers=2,
                     use_skip_connections=True)
    net = DASC(cfg)
    net.eval()

    rng = np.random.default_rng(200)
    x = rng.standard_normal((4, 3, 1, 16, 16)).astype(np.float32)
    out = {"x": x}
    with torch.no_grad():
        o_all = net(torch.tensor(x), all_videos_mode=True)
        o_batch = net(torch.tensor(x), all_videos_mode=False)
        losses = net.compute_loss(o_all, torch.tensor(x), stage="second")
    out["all_reconstructed"] = o_all["reconstructed"].numpy()
    out["all_frame_features"] = o_all["frame_features"].numpy()
    out["all_video_features"] = o_all["video_features"].numpy()
    out["all_attention"] = o_all["attention_weights"].numpy()
    out["all_coeff"] = o_all["coefficient_matrix"].numpy()
    out["all_self_repr"] = o_all["self_represented_features"].numpy()
    out["batch_reconstructed"] = o_batch["reconstructed"].numpy()
    out["loss_total"] = np.float64(losses["total"].item())
    out["loss_mse"] = np.float64(losses["mse"].item())
    out["loss_self_repr"] = np.float64(losses["self_repr"].item())
    out["loss_sparsity"] = np.float64(losses["sparsity"].item())
    for k, v in net.state_dict().items():
        out["sd__" + k] = v.numpy()
    print(f"  dasc: rec std {out['all_reconstructed'].std():.4f}, "
          f"total loss {losses['total'].item():.6f}")
    np.savez_compressed(os.path.join(OUTDIR, "dasc_forward.npz"), **out)
    print("wrote dasc_forward.npz")


def main():
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import torch
    torch.manual_seed(0)
    os.makedirs(OUTDIR, exist_ok=True)
    gen_dasc()


if __name__ == "__main__":
    main()
