"""Cross-framework golden parity, round 3j: the full DASC
video-clustering network (nets/dasc_net.py:11-426) with transferred
weights — frame AE backbone, VMM attention pooling, the zero-diagonal
self-representation matrix, feature recovery, and the two-stage loss.

Fixture: scripts/gen_reference_fixtures_r3j.py.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp

from test_reference_parity import FIXDIR, _check


def _frames_nchw(a):
    """torch [B, F, C, H, W] -> channels-last [B, F, H, W, C]."""
    return jnp.asarray(np.asarray(a).transpose(0, 1, 3, 4, 2))


def _dasc_name_map(sd):
    m = {}
    raw = []
    ae = "params/auto_encoder"
    # encoder Sequential: Conv(0), ReLU, Conv(2), ReLU, Pool, Flatten,
    # Linear(6)
    for i, j in enumerate((0, 2)):
        m[f"{ae}/enc_conv_{i}/kernel"] = f"auto_encoder.encoder.{j}.weight"
        m[f"{ae}/enc_conv_{i}/bias"] = f"auto_encoder.encoder.{j}.bias"
    m[f"{ae}/enc_out/kernel"] = "auto_encoder.encoder.6.weight"
    m[f"{ae}/enc_out/bias"] = "auto_encoder.encoder.6.bias"
    # decoder Sequential: Linear(0), ReLU, Unflatten, ConvT(3), ReLU,
    # ConvT(5), Pool
    m[f"{ae}/dec_in/kernel"] = "auto_encoder.decoder.0.weight"
    m[f"{ae}/dec_in/bias"] = "auto_encoder.decoder.0.bias"
    for flax_name, j in (("dec_conv_0", 3), ("dec_out", 5)):
        key = f"auto_encoder.decoder.{j}.weight"
        # torch ConvTranspose [I, O, kh, kw] -> flax transpose_kernel
        # layout [kh, kw, O, I]
        sd[key + ".pre"] = np.asarray(sd.pop(key))[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
        m[f"{ae}/{flax_name}/kernel"] = key + ".pre"
        raw.append(key + ".pre")
        m[f"{ae}/{flax_name}/bias"] = f"auto_encoder.decoder.{j}.bias"
    m["params/vmm/query"] = "vmm.query"
    raw.append("vmm.query")
    m["params/vmm/attn_layer_0/kernel"] = "vmm.attention_layers.0.weight"
    m["params/vmm/attn_layer_0/bias"] = "vmm.attention_layers.0.bias"
    # the reference uses the raw Linear weight AS the coefficient matrix
    m["params/srm/A"] = "srm.self_repr.weight"
    raw.append("srm.self_repr.weight")
    return m, raw


def test_dasc_forward_and_loss_parity():
    from diffsci_tpu.extra import converters
    from diffsci_tpu.models.nets.dasc import DASC, DASCConfig, dasc_loss

    d = np.load(os.path.join(FIXDIR, "dasc_forward.npz"))
    sd = {k[4:]: d[k] for k in d.files if k.startswith("sd__")}
    x = _frames_nchw(d["x"])

    cfg = DASCConfig(in_channels=1, frame_height=16, frame_width=16,
                     frames_per_video=3, latent_dim=16, num_videos=4,
                     encoder_channels=(8, 16), vmm_num_layers=2,
                     use_skip_connections=True)
    model = DASC(cfg)
    template = model.init(jax.random.PRNGKey(0), x, all_videos_mode=True)
    name_map, raw = _dasc_name_map(sd)
    vs = converters.import_torch_state_dict(sd, name_map, template,
                                            raw_keys=raw)

    out = model.apply(vs, x, all_videos_mode=True)
    _check(out["frame_features"], d["all_frame_features"], rtol=5e-4,
           atol=1e-5, label="dasc frame features")
    _check(out["video_features"], d["all_video_features"], rtol=5e-4,
           atol=1e-5, label="dasc video features")
    _check(out["attention_weights"], d["all_attention"], rtol=5e-4,
           atol=1e-5, label="dasc attention")
    _check(out["coefficient_matrix"], d["all_coeff"], rtol=1e-5,
           atol=1e-7, label="dasc coefficient matrix")
    _check(out["self_represented_features"], d["all_self_repr"],
           rtol=5e-4, atol=1e-5, label="dasc self-repr")
    _check(out["reconstructed"], _frames_nchw(d["all_reconstructed"]),
           rtol=5e-4, atol=1e-5, label="dasc reconstruction")

    out_b = model.apply(vs, x)
    _check(out_b["reconstructed"], _frames_nchw(d["batch_reconstructed"]),
           rtol=5e-4, atol=1e-5, label="dasc batch reconstruction")

    total, losses = dasc_loss(cfg, out, x, stage="second")
    _check(total, d["loss_total"], rtol=5e-4, atol=1e-6, label="dasc loss")
    _check(losses["mse"], d["loss_mse"], rtol=5e-4, atol=1e-7,
           label="dasc mse")
    _check(losses["self_repr"], d["loss_self_repr"], rtol=5e-4, atol=1e-7,
           label="dasc self-repr loss")
    _check(losses["sparsity"], d["loss_sparsity"], rtol=5e-4, atol=1e-7,
           label="dasc sparsity")
