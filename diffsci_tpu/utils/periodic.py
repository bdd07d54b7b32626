"""Periodic (wrap-around) slicing utilities.

Functional JAX counterpart of the reference's periodic indexing helpers
(reference diffsci/torchutils.py:107-308). Semantics:

- ``periodic_getitem``: slices wrap once around the dimension
  (``slice(7, 2)`` on a size-10 axis returns indices ``7,8,9,0,1``).
- ``periodic_getitem_extended``: slices may span multiple periods
  (``slice(-2, 7)`` on a size-3 axis returns 9 tiled elements).
- ``periodic_setitem``: functional write-back (returns a new array; JAX
  arrays are immutable), wrapping once at most.

All slice bounds must be static Python ints — these helpers are meant for
host-side tiling / volume-synthesis logic, not for use inside ``jit``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _normalize(idx: slice, size: int, *, allow_multi_period: bool):
    start = idx.start if idx.start is not None else 0
    stop = idx.stop if idx.stop is not None else size
    step = idx.step if idx.step is not None else 1
    if step != 1:
        raise NotImplementedError("only step=1 is supported")
    if not allow_multi_period and abs(start - stop) > size:
        raise ValueError(f"slice {idx} too large for axis of size {size}")
    return start, stop


def periodic_getitem(x, *indices):
    """Extract a once-wrapping periodic slice, dimension by dimension."""
    result = x
    for dim, idx in enumerate(indices):
        if idx == slice(None):
            continue
        if not isinstance(idx, slice):
            raise TypeError(f"unsupported index type: {type(idx)}")
        size = result.shape[dim]
        start, stop = _normalize(idx, size, allow_multi_period=False)
        start %= size
        stop = stop % size if (stop < 0 or stop > size) else stop
        if stop < start:
            tail = jnp.take(result, np.arange(start, size), axis=dim)
            head = jnp.take(result, np.arange(0, stop), axis=dim)
            result = jnp.concatenate([tail, head], axis=dim)
        else:
            result = jnp.take(result, np.arange(start, stop), axis=dim)
    return result


def periodic_getitem_extended(x, *indices):
    """Periodic slice allowing requests larger than the axis (tiles)."""
    result = x
    for dim, idx in enumerate(indices):
        if idx == slice(None):
            continue
        if not isinstance(idx, slice):
            raise TypeError(f"unsupported index type: {type(idx)}")
        size = result.shape[dim]
        start, stop = _normalize(idx, size, allow_multi_period=True)
        n = stop - start
        if n <= 0:
            result = jnp.take(result, np.arange(0), axis=dim)
            continue
        gather = (np.arange(start, stop) % size)
        result = jnp.take(result, gather, axis=dim)
    return result


def periodic_setitem(x, value, *indices):
    """Functional periodic assignment; returns the updated array.

    ``indices`` are slices over the leading dims of ``x``; each may wrap once.
    """
    if len(indices) == 1 and isinstance(indices[0], tuple):
        indices = indices[0]
    gathers = []
    for dim, idx in enumerate(indices):
        if not isinstance(idx, slice):
            raise TypeError("only slice indexing is supported")
        size = x.shape[dim]
        start, stop = _normalize(idx, size, allow_multi_period=False)
        start %= size
        stop = stop % size if (stop < 0 or stop > size) else stop
        if stop < start:
            ids = np.concatenate([np.arange(start, size), np.arange(0, stop)])
        else:
            ids = np.arange(start, stop)
        gathers.append(ids)
    # Build an open mesh of destination indices over the sliced dims.
    mesh = np.ix_(*gathers) if gathers else ()
    return x.at[mesh].set(value)
