"""DiffusionPeriodizer: make any network's outputs periodic via
expand-crop-cosine-blend.

TPU-native redesign of the reference periodizer
(reference diffsci/extra/periodizer.py:23-356). Channels-last: spatial axes
are 1..ndim-2. The wrapper is functional — it wraps a pure
``net_fn(x, *args, **kwargs) -> y`` callable (e.g. a bound denoiser), so it
composes with jit/scan samplers.
"""

from __future__ import annotations

from typing import Callable, Sequence, Union

import numpy as np
import jax.numpy as jnp


def _normalize(v, dimension):
    if isinstance(v, int):
        return (v,) * dimension
    assert len(v) == dimension
    return tuple(v)


class DiffusionPeriodizer:
    """(periodizer.py:23-257)"""

    def __init__(self, net_fn: Callable, pad: Union[int, Sequence[int]],
                 blend_width: Union[int, Sequence[int]] = 8,
                 dimension: int = 3):
        self.net_fn = net_fn
        self.dimension = dimension
        self.pad = _normalize(pad, dimension)
        self.blend_width = _normalize(blend_width, dimension)

    def expand_periodic(self, x):
        """Tile pad pixels from the opposite side onto each boundary
        (periodizer.py:76-101)."""
        spatial = x.shape[1:-1]
        assert len(spatial) == self.dimension
        for dim_idx, (size, p) in enumerate(zip(spatial, self.pad)):
            axis = dim_idx + 1
            idx = np.arange(-p, size + p) % size
            x = jnp.take(x, idx, axis=axis)
        return x

    def crop_center(self, x, original_spatial):
        """(periodizer.py:103-124)"""
        slices = [slice(None)]
        for p, size in zip(self.pad, original_spatial):
            slices.append(slice(p, p + size))
        slices.append(slice(None))
        return x[tuple(slices)]

    def cosine_blend_boundaries(self, x):
        """Blend each start strip with the flipped end strip using cosine
        weights so opposite boundaries agree (periodizer.py:126-199)."""
        for dim_idx, bw in enumerate(self.blend_width):
            if bw <= 0:
                continue
            axis = dim_idx + 1
            size = x.shape[axis]
            if bw * 2 >= size:
                continue
            pos = jnp.arange(bw, dtype=x.dtype)
            w = 0.5 * (1 - jnp.cos(jnp.pi * (pos + 0.5) / bw))
            wshape = [1] * x.ndim
            wshape[axis] = bw
            w = w.reshape(wshape)

            sl_start = [slice(None)] * x.ndim
            sl_start[axis] = slice(0, bw)
            sl_end = [slice(None)] * x.ndim
            sl_end[axis] = slice(size - bw, size)
            start = x[tuple(sl_start)]
            end = x[tuple(sl_end)]
            end_f = jnp.flip(end, axis=axis)
            start_f = jnp.flip(start, axis=axis)
            new_start = w * start + (1 - w) * end_f
            w_f = jnp.flip(w, axis=axis)
            new_end = w_f * end + (1 - w_f) * start_f
            x = x.at[tuple(sl_start)].set(new_start)
            x = x.at[tuple(sl_end)].set(new_end)
        return x

    def __call__(self, x, *args, **kwargs):
        """expand -> net -> crop -> blend (periodizer.py:201-236)."""
        spatial = x.shape[1:-1]
        y = self.net_fn(self.expand_periodic(x), *args, **kwargs)
        y = self.crop_center(y, spatial)
        return self.cosine_blend_boundaries(y)

    def forward_no_blend(self, x, *args, **kwargs):
        spatial = x.shape[1:-1]
        y = self.net_fn(self.expand_periodic(x), *args, **kwargs)
        return self.crop_center(y, spatial)

    def forward_expand_only(self, x, *args, **kwargs):
        return self.net_fn(self.expand_periodic(x), *args, **kwargs)


class PeriodicSamplerWrapper:
    """Apply the periodizer every N sampling steps
    (periodizer.py:259-310)."""

    def __init__(self, step_fn: Callable, periodizer: DiffusionPeriodizer,
                 apply_every_n_steps: int = 1):
        self.step_fn = step_fn
        self.periodizer = periodizer
        self.apply_every_n_steps = apply_every_n_steps
        self._step_count = 0

    def step(self, x, t, **kwargs):
        self._step_count += 1
        if self._step_count % self.apply_every_n_steps == 0:
            return self.periodizer(x, t, **kwargs)
        return self.step_fn(x, t, **kwargs)

    def reset(self):
        self._step_count = 0


def measure_periodicity_error(x, dimension: int = 3) -> dict:
    """MSE / max-diff between opposite boundaries per spatial dim
    (periodizer.py:313-356). Channels-last."""
    errors = {}
    mse_per_dim, max_per_dim = [], []
    names = ["H", "W", "D"][:dimension]
    for dim_idx in range(dimension):
        axis = dim_idx + 1
        first = jnp.take(x, 0, axis=axis)
        last = jnp.take(x, x.shape[axis] - 1, axis=axis)
        diff = first - last
        mse = float(jnp.mean(diff ** 2))
        mx = float(jnp.max(jnp.abs(diff)))
        mse_per_dim.append(mse)
        max_per_dim.append(mx)
        errors[f"mse_{names[dim_idx]}"] = mse
        errors[f"max_diff_{names[dim_idx]}"] = mx
    errors["total_mse"] = sum(mse_per_dim)
    errors["mse_per_dim"] = mse_per_dim
    errors["max_diff_per_dim"] = max_per_dim
    return errors
