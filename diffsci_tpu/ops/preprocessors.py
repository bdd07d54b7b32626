"""Differentiable loss preprocessors: edge-feature extraction for
distance-transform VAE training.

TPU-native counterpart of the reference's EdgeDetectionPreprocessor
(reference diffsci/models/aux_scripts/preprocessors.py:28-352), used by the
VAE trainer's ``loss_preprocessor='edges'`` option
(vaemodule.py:72,209-217,260-261): both the data and the reconstruction are
mapped to a stack of edge features (original / Sobel magnitude / Laplacian /
gradient magnitude / morphological gradient, each weight-normalized) before
the reconstruction loss, emphasizing boundary structure in distance fields.

Design notes (differences from the reference, all TPU-motivated):
- channels-last [B, *spatial, C]; every filter is applied depthwise
  (``feature_group_count=C``) so multi-channel inputs work, where the
  reference's single-channel ``F.conv2d`` assumed C=1,
- the smoothstep border window is a trace-time numpy constant (static
  shapes → folded into the XLA graph once),
- the morphological gradient uses ``lax.reduce_window`` max/min pooling,
  which XLA lowers to vectorized reductions on the VPU.

The preprocessor is a pure callable with no learnable state — safe to close
over inside a jitted loss.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence

import numpy as np
import jax.numpy as jnp
from jax import lax

VALID_PROCESSORS = ("original", "sobel", "laplacian", "gradient", "morph")


def smoothstep_window(length: int, border: int) -> np.ndarray:
    """1D window: 1 in the interior, cubic smoothstep (3x^2-2x^3) taper to 0
    over ``border`` samples at each end (preprocessors.py:8-25)."""
    if border <= 0:
        return np.ones(length, np.float32)
    idx = np.arange(length, dtype=np.float32)
    win = np.ones(length, np.float32)
    left = idx < border
    xl = idx[left] / border
    win[left] = 3 * xl**2 - 2 * xl**3
    right = idx >= (length - border)
    xr = (length - idx[right] - 1) / border
    win[right] = 3 * xr**2 - 2 * xr**3
    return win


def _sobel_kernels(dim: int) -> list[np.ndarray]:
    """Separable-smoothing derivative kernels per axis
    (preprocessors.py:73-121). Built as outer products of the smoothing
    [1,2,1] and derivative [-1,0,1] profiles rather than hand-typed
    tables."""
    smooth = np.array([1.0, 2.0, 1.0], np.float32)
    deriv = np.array([-1.0, 0.0, 1.0], np.float32)
    kernels = []
    for axis in range(dim):
        profiles = [deriv if ax == axis else smooth for ax in range(dim)]
        k = profiles[0]
        for p in profiles[1:]:
            k = np.multiply.outer(k, p)
        kernels.append(k.astype(np.float32))
    return kernels


def _laplacian_kernel(dim: int) -> np.ndarray:
    """Discrete Laplacian stencil: -2*dim center, +1 face neighbours
    (preprocessors.py:83-85,124-128)."""
    k = np.zeros((3,) * dim, np.float32)
    center = (1,) * dim
    k[center] = -2.0 * dim
    for axis in range(dim):
        for off in (0, 2):
            idx = list(center)
            idx[axis] = off
            k[tuple(idx)] = 1.0
    return k


def _grad_kernels(dim: int) -> list[np.ndarray]:
    """Plain central-difference kernels per axis
    (preprocessors.py:88-90,131-134)."""
    deriv = np.array([-1.0, 0.0, 1.0], np.float32)
    ones = np.array([1.0], np.float32)
    kernels = []
    for axis in range(dim):
        profiles = [deriv if ax == axis else ones for ax in range(dim)]
        k = profiles[0]
        for p in profiles[1:]:
            k = np.multiply.outer(k, p)
        kernels.append(k.astype(np.float32))
    return kernels


def _conv_dimension_numbers(dim: int):
    spatial = "DHW"[-dim:] if dim == 3 else ("HW" if dim == 2 else "W")
    return (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C")


class EdgeDetectionPreprocessor:
    """Map x -> concatenated edge features along the channel axis
    (preprocessors.py:28-352). Channels-last [B, *spatial, C]."""

    def __init__(self, dim: int = 2,
                 processors: str | Sequence[str] = "all",
                 feature_weights: Dict[str, float] | None = None,
                 border_width: int = 8,
                 morph_kernel_size: int = 3):
        self.dim = dim
        if processors == "all":
            procs = list(VALID_PROCESSORS)
        elif isinstance(processors, str):
            procs = [processors]
        else:
            procs = list(processors)
        for p in procs:
            if p not in VALID_PROCESSORS:
                raise ValueError(f"Unknown processor: {p}")
        self.processors = procs
        self.border_width = border_width
        self.morph_kernel_size = morph_kernel_size
        if feature_weights is None:
            feature_weights = {p: 1.0 for p in VALID_PROCESSORS}
        sel = [float(feature_weights.get(p, 1.0)) for p in procs]
        total = sum(sel)
        self.weights = {p: (w / total if total else 0.0)
                        for p, w in zip(procs, sel)}
        self._sobel = _sobel_kernels(dim)
        self._lap = _laplacian_kernel(dim)
        self._grad = _grad_kernels(dim)
        self._dn = _conv_dimension_numbers(dim)

    # -- primitives -----------------------------------------------------
    def _depthwise(self, x, kernel: np.ndarray):
        """Depthwise SAME conv of a spatial stencil over every channel."""
        c = x.shape[-1]
        k = jnp.asarray(kernel, x.dtype)
        k = jnp.tile(k[..., None, None], (1,) * self.dim + (1, c))
        return lax.conv_general_dilated(
            x, k, window_strides=(1,) * self.dim, padding="SAME",
            dimension_numbers=self._dn, feature_group_count=c)

    def sobel_edges(self, x):
        grads = [self._depthwise(x, k) for k in self._sobel]
        return jnp.sqrt(sum(g * g for g in grads) + 1e-8)

    def laplacian_edges(self, x):
        return self._depthwise(x, self._lap)

    def gradient_magnitude(self, x):
        grads = [self._depthwise(x, k) for k in self._grad]
        return jnp.sqrt(sum(g * g for g in grads) + 1e-8)

    def morphological_gradient(self, x):
        """Dilation minus erosion via max/min pooling
        (preprocessors.py:205-219)."""
        k = self.morph_kernel_size
        window = (1,) + (k,) * self.dim + (1,)
        strides = (1,) * (self.dim + 2)
        dilated = lax.reduce_window(x, -jnp.inf, lax.max, window, strides,
                                    "SAME")
        eroded = -lax.reduce_window(-x, -jnp.inf, lax.max, window, strides,
                                    "SAME")
        return dilated - eroded

    def _border_window(self, x):
        if self.border_width is None or self.border_width <= 0:
            return x
        spatial = x.shape[1:-1]
        win = smoothstep_window(spatial[0], self.border_width)
        for size in spatial[1:]:
            win = np.multiply.outer(win, smoothstep_window(
                size, self.border_width))
        return x * jnp.asarray(win, x.dtype)[None, ..., None]

    # -- forward ---------------------------------------------------------
    def __call__(self, x):
        xw = self._border_window(x)
        feats = []
        for p in self.processors:
            w = self.weights[p]
            if p == "original":
                feats.append(x * w)
            elif p == "sobel":
                feats.append(self.sobel_edges(xw) * w)
            elif p == "laplacian":
                feats.append(self.laplacian_edges(xw) * w)
            elif p == "gradient":
                feats.append(self.gradient_magnitude(xw) * w)
            elif p == "morph":
                feats.append(self.morphological_gradient(xw) * w)
        return jnp.concatenate(feats, axis=-1)


def make_loss_preprocessor(spec, dim: int = 2) -> Callable:
    """Resolve the VAE config's ``loss_preprocessor`` field
    (vaemodule.py:209-217): 'none' -> identity, 'edges' ->
    EdgeDetectionPreprocessor, a callable -> itself."""
    if callable(spec):
        return spec
    if spec == "edges":
        return EdgeDetectionPreprocessor(dim=dim)
    if spec == "none" or spec is None:
        return lambda x: x
    raise ValueError(f"Loss preprocessor {spec!r} not supported")
