"""InceptionV3 (FID variant) in Flax + torchvision weight importer.

The reference's headline quality numbers are Inception-FID scores
(reference scripts/testing/mnist_fld_fid_results.../fid_scores.txt, via
pytorch-fid / torchmetrics). This module provides:

- ``InceptionV3FID``: the pytorch-fid InceptionV3 architecture
  (pool3, 2048-d features) re-implemented channels-last in Flax,
  including pytorch-fid's deviations from stock torchvision
  (count_include_pad=False average pools inside the Inception blocks and
  a max-pool branch in the final InceptionE block).
- ``convert_torch_inception_state``: maps a torchvision/pytorch-fid
  ``state_dict`` (as a dict of numpy arrays) onto the Flax variables, so
  the standard ``pt_inception-2015-12-05`` weights produce features
  numerically comparable with the reference's FID pipeline.
- ``inception_fid_features``: resize to 299x299 (bilinear, antialias
  off — matching pytorch-fid's default), scale to [-1, 1], run the net.

Zero-egress note: this environment cannot download the weights, so the
committed tests exercise architecture shapes and the converter's layout
math with synthetic weights. Given the weights file, ``load_weights``
makes scripts/eval_fid.py reference-comparable.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


class BasicConv2d(nn.Module):
    """Conv + BatchNorm(eps=1e-3, no affine bias beyond BN) + ReLU."""
    features: int
    kernel: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)

    @nn.compact
    def __call__(self, x):
        pad = [(self.padding[0],) * 2, (self.padding[1],) * 2]
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=pad, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.9, name="bn")(x)
        return nn.relu(x)


def _avg_pool_nip(x, window, strides, padding):
    """Average pool with count_include_pad=False (pytorch-fid's patch):
    divide by the number of *valid* elements under the window."""
    ones = jnp.ones(x.shape[:-1] + (1,), x.dtype)
    pad = [(0, 0)] + [(p, p) for p in padding] + [(0, 0)]
    xs = jnp.pad(x, pad)
    cs = jnp.pad(ones, pad)
    dims = (1,) + window + (1,)
    strd = (1,) + strides + (1,)
    summed = jax.lax.reduce_window(xs, 0.0, jax.lax.add, dims, strd,
                                   "VALID")
    counts = jax.lax.reduce_window(cs, 0.0, jax.lax.add, dims, strd,
                                   "VALID")
    return summed / counts


def _max_pool(x, window, strides):
    dims = (1,) + window + (1,)
    strd = (1,) + strides + (1,)
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, dims, strd,
                                 "VALID")


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=(2, 2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1),
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=(1, 1),
                         name="branch3x3dbl_3")(b3)
        bp = _avg_pool_nip(x, (3, 3), (1, 1), (1, 1))
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=(1, 1),
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2),
                         name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0),
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0),
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3),
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0),
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3),
                         name="branch7x7dbl_5")(bd)
        bp = _avg_pool_nip(x, (3, 3), (1, 1), (1, 1))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2),
                         name="branch7x7x3_4")(b7)
        bp = _max_pool(x, (3, 3), (2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str = "avg"  # pytorch-fid: Mixed_7b uses avg, Mixed_7c uses max

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=(0, 1),
                          name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=(1, 0),
                          name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=(1, 1),
                         name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=(0, 1),
                          name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=(1, 0),
                          name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "max":
            bp = jnp.pad(x, [(0, 0), (1, 1), (1, 1), (0, 0)],
                         constant_values=-np.inf)
            bp = _max_pool(bp, (3, 3), (1, 1))
        else:
            bp = _avg_pool_nip(x, (3, 3), (1, 1), (1, 1))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3FID(nn.Module):
    """pytorch-fid's InceptionV3 up to pool3 (2048-d features)."""

    @nn.compact
    def __call__(self, x):
        # x: [B, 299, 299, 3] in [-1, 1]
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=(1, 1), name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, (3, 3), (2, 2))
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, (3, 3), (2, 2))
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(pool="avg", name="Mixed_7b")(x)
        x = InceptionE(pool="max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global avg pool -> [B, 2048]


# ---------------------------------------------------------------------------
# torchvision / pytorch-fid weight import
# ---------------------------------------------------------------------------

def convert_torch_inception_state(state_dict: dict) -> dict:
    """Map a torchvision-style InceptionV3 ``state_dict`` (numpy arrays)
    onto InceptionV3FID variables.

    torch layouts: conv.weight [O, I, kh, kw] -> [kh, kw, I, O];
    bn.{weight,bias,running_mean,running_var} -> BatchNorm
    {scale,bias}/{mean,var}.
    """
    params: dict = {}
    batch_stats: dict = {}

    def put(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value)

    for key, val in state_dict.items():
        parts = key.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            put(params, parts[:-1] + ["kernel"],
                np.transpose(np.asarray(val), (2, 3, 1, 0)))
        elif parts[-2] == "bn":
            name = parts[-1]
            if name == "weight":
                put(params, parts[:-1] + ["scale"], val)
            elif name == "bias":
                put(params, parts[:-1] + ["bias"], val)
            elif name == "running_mean":
                put(batch_stats, parts[:-1] + ["mean"], val)
            elif name == "running_var":
                put(batch_stats, parts[:-1] + ["var"], val)
        # fc.* (the classifier head) is unused for FID features
    return {"params": params, "batch_stats": batch_stats}


def load_weights(path: str) -> dict:
    """Load a pytorch-fid / torchvision checkpoint file into variables.
    Requires torch (CPU) to unpickle the file."""
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.numpy() for k, v in sd.items()
          if hasattr(v, "numpy")}
    return convert_torch_inception_state(sd)


def inception_fid_features(variables, x, batch_size: int = 64):
    """x: [N, H, W, C] in [0, 1] (C=1 is broadcast to RGB). Returns
    [N, 2048] pool3 features, resized to 299x299 like pytorch-fid."""
    net = InceptionV3FID()
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)

    @jax.jit
    def run(xb):
        # antialias=False: torch F.interpolate(bilinear) samples plain 2x2
        # neighborhoods even when minifying; jax's default antialias=True
        # would widen the kernel and shift pool3 features for inputs
        # larger than 299px, breaking comparability with pytorch-fid
        xb = jax.image.resize(
            xb, (xb.shape[0], 299, 299, xb.shape[-1]), "bilinear",
            antialias=False)
        xb = xb * 2.0 - 1.0
        return net.apply(variables, xb)

    outs = []
    for i in range(0, x.shape[0], batch_size):
        outs.append(np.asarray(run(x[i:i + batch_size])))
    return np.concatenate(outs, axis=0)
