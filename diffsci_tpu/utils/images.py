"""Image-grid utilities for sample visualization.

Counterpart of the reference's TensorBoard image grids in VAE training
(reference diffsci/models/vae/vaemodule.py:607-623, torchvision
``make_grid``): tile a batch of channels-last images into one array and
optionally write it as a PNG.
"""

from __future__ import annotations

import math
import pathlib

import numpy as np


def make_image_grid(images, nrow: int | None = None, pad: int = 2,
                    pad_value: float = 0.0) -> np.ndarray:
    """Tile [N, H, W, C] into one [gh*(H+pad)+pad, gw*(W+pad)+pad, C]
    grid array (row-major)."""
    imgs = np.asarray(images)
    if imgs.ndim != 4:
        raise ValueError(f"expected [N, H, W, C], got shape {imgs.shape}")
    n, h, w, c = imgs.shape
    gw = nrow if nrow is not None else int(math.ceil(math.sqrt(n)))
    gh = int(math.ceil(n / gw))
    grid = np.full((gh * (h + pad) + pad, gw * (w + pad) + pad, c),
                   pad_value, dtype=imgs.dtype)
    for i in range(n):
        r, col = divmod(i, gw)
        y0 = pad + r * (h + pad)
        x0 = pad + col * (w + pad)
        grid[y0:y0 + h, x0:x0 + w] = imgs[i]
    return grid


def save_image_grid(path, images, nrow: int | None = None,
                    value_range: tuple[float, float] = (-1.0, 1.0)):
    """Write a sample batch as a PNG grid (normalized from ``value_range``
    to [0, 1]). Grayscale (C==1) renders with the gray colormap."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    grid = make_image_grid(np.asarray(images, np.float32), nrow=nrow,
                           pad_value=value_range[0])
    lo, hi = value_range
    grid = np.clip((grid - lo) / (hi - lo + 1e-12), 0.0, 1.0)
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if grid.shape[-1] == 1:
        plt.imsave(path, grid[..., 0], cmap="gray", vmin=0, vmax=1)
    else:
        plt.imsave(path, grid)
    return path
