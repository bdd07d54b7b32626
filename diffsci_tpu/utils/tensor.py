"""Broadcasting and pytree helpers.

Mirrors the behaviour of the reference's ``broadcast_from_below``
(reference diffsci/torchutils.py:4-35), ``dict_map``/``dict_unsqueeze``
(torchutils.py:68-87) and ``get_minibatch_sizes`` (utils.py:5-11), designed
for JAX: pure functions over jnp arrays and python dicts.
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp


def bcast_right(a: jnp.ndarray, target: jnp.ndarray | int) -> jnp.ndarray:
    """Append trailing singleton axes to ``a`` so it broadcasts against
    ``target`` "from below" (leading axes aligned).

    ``a`` has shape ``[B]`` (or ``[B, ...prefix]``), ``target`` is an array of
    shape ``[B, *shape]`` (or its ndim). Returns ``a`` reshaped to
    ``[B, 1, 1, ...]`` with the same ndim as ``target``.
    """
    ndim = target if isinstance(target, int) else target.ndim
    a = jnp.asarray(a)
    if a.ndim > ndim:
        raise ValueError(f"cannot right-broadcast ndim {a.ndim} -> {ndim}")
    return a.reshape(a.shape + (1,) * (ndim - a.ndim))


def dict_map(fn: Callable[[Any], Any], d: Any) -> Any:
    """Apply ``fn`` to every value of a (possibly None / non-dict) condition
    structure. Conditions in this framework are either ``None``, a single
    array, or a flat ``dict[str, array]`` (matching the reference's ``y``
    convention, torchutils.py:68-74)."""
    if d is None:
        return None
    if isinstance(d, dict):
        return {k: fn(v) for k, v in d.items()}
    return fn(d)


def dict_expand_dims(d: Any, axis: int = 0) -> Any:
    """``dict_unsqueeze`` analogue (reference torchutils.py:76-80)."""
    return dict_map(lambda v: jnp.expand_dims(v, axis), d)


def linear_interpolation(x1: jnp.ndarray,
                         x2: jnp.ndarray,
                         ninterp: int) -> jnp.ndarray:
    """Linear interpolation path between two arrays with ``ninterp``
    intermediate points, inclusive of endpoints. Returns a stacked array of
    shape ``[ninterp + 2, *x1.shape]`` (reference torchutils.py:38-65)."""
    alphas = jnp.linspace(0.0, 1.0, ninterp + 2)
    alphas = alphas.reshape((-1,) + (1,) * x1.ndim)
    return (1.0 - alphas) * x1[None] + alphas * x2[None]


def get_minibatch_sizes(nsamples: int, maximum_batch_size: int) -> list[int]:
    """Split ``nsamples`` into chunks of at most ``maximum_batch_size``
    (reference utils.py:5-11)."""
    nbatches, remainder = divmod(nsamples, maximum_batch_size)
    sizes = [maximum_batch_size] * nbatches
    if remainder:
        sizes.append(remainder)
    return sizes


def inverse_cdf_histogram(z):
    """Empirical inverse CDF of a sample via a density histogram
    (reference diffsci/utils.py:14-18) — host-side numpy/scipy; used for
    histogram-matched noise shaping in analysis scripts."""
    import scipy.stats
    import numpy as _np
    histogram, bin_edges = _np.histogram(_np.asarray(z), bins="auto",
                                         density=True)
    return scipy.stats.rv_histogram((histogram, bin_edges)).ppf


def enable_compilation_cache(cache_dir: str = "~/.cache/diffsci_tpu_xla",
                             min_compile_seconds: float = 1.0) -> str:
    """Enable JAX's persistent compilation cache.

    Big UNet/sampler compiles cost 20-40s (3D variants minutes); with the
    cache enabled they are paid once per (program, compiler version) and
    restarts/re-runs load the compiled executable from disk. Call before
    the first jit. Returns the resolved cache directory.
    """
    import os
    import jax

    path = os.path.expanduser(cache_dir)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      float(min_compile_seconds))
    return path


def space_to_depth(x, block: int):
    """Fold ``block``-sized spatial tiles into channels (dimension-
    agnostic): [B, *S, C] -> [B, *S/block, C·block^d].

    TPU rationale: tensors with few channels waste vector lanes — the
    minor dim is padded to 128, so a C=1..32 volume physically moves
    4-128x its logical bytes through HBM. Folding spatial blocks into
    channels recovers lane utilization at the (most expensive) high-
    resolution levels of a UNet.
    """
    if block == 1:
        return x
    B, C = x.shape[0], x.shape[-1]
    spatial = x.shape[1:-1]
    d = len(spatial)
    shape = [B]
    for s in spatial:
        if s % block != 0:
            raise ValueError(f"spatial dim {s} not divisible by {block}")
        shape += [s // block, block]
    shape.append(C)
    x = x.reshape(shape)
    perm = ([0] + [1 + 2 * i for i in range(d)]
            + [2 + 2 * i for i in range(d)] + [1 + 2 * d])
    x = x.transpose(perm)
    return x.reshape((B,) + tuple(s // block for s in spatial)
                     + (C * block ** d,))


def depth_to_space(x, block: int):
    """Inverse of :func:`space_to_depth`."""
    if block == 1:
        return x
    B, C = x.shape[0], x.shape[-1]
    spatial = x.shape[1:-1]
    d = len(spatial)
    c_out = C // block ** d
    if c_out * block ** d != C:
        raise ValueError(f"channels {C} not divisible by {block}^{d}")
    x = x.reshape((B,) + spatial + (block,) * d + (c_out,))
    perm = [0]
    for i in range(d):
        perm += [1 + i, 1 + d + i]
    perm.append(1 + 2 * d)
    x = x.transpose(perm)
    return x.reshape((B,) + tuple(s * block for s in spatial) + (c_out,))
