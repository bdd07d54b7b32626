"""Checkpoint and model-surgery converters.

Counterpart of the reference's converters
(reference diffsci/extra/punetg_converters.py:13-158 conv->circular
surgery, extra/convert_autoencoder.py:14-289 old->new autoencoder renames,
models/nets/copynets.py:5 AutoencoderKL->VAENet weight copying). In a
functional framework these become pure param-pytree transforms:

- ``transfer_params``: structure-matching copy between two variable trees
  whose paths differ only by known wrapper segments (e.g. the circular conv
  wraps a plain conv in a ``Conv_0`` scope — the conv->circular surgery is
  a rename, the kernels are identical).
- ``torch_kernel_to_jax`` / ``torch_linear_to_jax``: layout conversion for
  importing torch checkpoints (OIHW -> HWIO / [out,in] -> [in,out]).
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np
import jax


def _flatten(tree):
    return {tuple(p.key if hasattr(p, "key") else str(p) for p in path): leaf
            for path, leaf in jax.tree_util.tree_leaves_with_path(tree)}


import re

_WRAPPER_RENAMES = [(re.compile(r"^CircularConv_(\d+)$"), r"Conv_\1")]


def _normalize(path, strip_segments):
    # 1. rename wrapper scopes to their plain equivalents
    renamed = []
    for seg in path:
        for pat, repl in _WRAPPER_RENAMES:
            seg = pat.sub(repl, seg)
        renamed.append(seg)
    # 2. repeatedly drop a stripped wrapper scope sitting directly above the
    #    leaf (the wrapped conv's own auto-named scope) until fixpoint, so
    #    `convin/Conv_0/kernel` and `convin/kernel` normalize identically
    out = list(renamed)
    while len(out) >= 2 and out[-2] in strip_segments:
        out.pop(-2)
    return tuple(out)


def transfer_params(src: Any, dst_template: Any,
                    strip_segments: Sequence[str] = ("Conv_0", "conv"),
                    strict: bool = True,
                    verbose: bool = False) -> Any:
    """Copy leaves from ``src`` into the structure of ``dst_template``,
    matching paths after removing ``strip_segments`` wrapper scopes.

    The canonical use is conv<->circular model surgery
    (punetg_converters.py:13-60): circular convs wrap the same kernel one
    scope deeper, so weights transfer unchanged. Returns the filled tree;
    unmatched destination leaves keep the template's values (or raise when
    ``strict``).
    """
    src_flat = _flatten(src)
    src_norm = {}
    for path, leaf in src_flat.items():
        src_norm.setdefault(_normalize(path, strip_segments), leaf)

    dst_flat = _flatten(dst_template)
    out = {}
    missing = []
    for path, leaf in dst_flat.items():
        key = _normalize(path, strip_segments)
        if key in src_norm and src_norm[key].shape == leaf.shape:
            out[path] = src_norm[key]
            if verbose:
                print(f"copied {'/'.join(path)}")
        else:
            missing.append("/".join(path))
            out[path] = leaf
    if missing and strict:
        raise ValueError(f"unmatched destination params: {missing[:10]}"
                         + ("..." if len(missing) > 10 else ""))

    leaves_with_path = jax.tree_util.tree_leaves_with_path(dst_template)
    treedef = jax.tree_util.tree_structure(dst_template)
    ordered = [out[tuple(p.key if hasattr(p, "key") else str(p)
                         for p in path)]
               for path, _ in leaves_with_path]
    return jax.tree_util.tree_unflatten(treedef, ordered)


def convert_conv_params_to_circular(params: Any, circular_template: Any,
                                    strict: bool = True) -> Any:
    """Post-training periodization (punetg_converters.py:13-60): move a
    default-conv model's params into the circular-conv variant's structure.
    ``circular_template`` is a fresh init of the circular model."""
    return transfer_params(params, circular_template,
                           strip_segments=("Conv_0",), strict=strict)


# ---------------------------------------------------------------------------
# torch checkpoint import helpers
# ---------------------------------------------------------------------------
def torch_kernel_to_jax(weight: np.ndarray) -> np.ndarray:
    """torch conv kernel [O, I, *k] -> flax [*k, I, O]."""
    ndim = weight.ndim
    perm = tuple(range(2, ndim)) + (1, 0)
    return np.transpose(weight, perm)


def torch_linear_to_jax(weight: np.ndarray) -> np.ndarray:
    """torch Linear [out, in] -> flax Dense [in, out]."""
    return np.transpose(weight)


def import_torch_state_dict(state_dict: dict, name_map: dict[str, str],
                            dst_template: Any) -> Any:
    """Import a torch state dict into a flax param tree.

    ``name_map``: flax '/'-joined param path -> torch key. Conv kernels and
    linear weights are layout-converted automatically based on rank and the
    destination leaf shape."""
    dst_flat = _flatten(dst_template)
    out = {}
    for path, leaf in dst_flat.items():
        joined = "/".join(path)
        if joined not in name_map:
            out[path] = leaf
            continue
        w = np.asarray(state_dict[name_map[joined]])
        if w.ndim >= 3:
            w = torch_kernel_to_jax(w)
        elif w.ndim == 2 and w.shape != leaf.shape:
            w = torch_linear_to_jax(w)
        if w.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {joined}: {w.shape} vs {leaf.shape}")
        out[path] = w.astype(np.asarray(leaf).dtype)
    leaves_with_path = jax.tree_util.tree_leaves_with_path(dst_template)
    treedef = jax.tree_util.tree_structure(dst_template)
    ordered = [out[tuple(p.key if hasattr(p, "key") else str(p)
                         for p in path)]
               for path, _ in leaves_with_path]
    return jax.tree_util.tree_unflatten(treedef, ordered)
