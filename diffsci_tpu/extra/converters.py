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
                            dst_template: Any,
                            raw_keys: Sequence[str] = ()) -> Any:
    """Import a torch state dict into a flax param tree.

    ``name_map``: flax '/'-joined param path -> torch key. Conv kernels and
    linear weights are layout-converted automatically based on rank and the
    destination leaf shape. Source keys listed in ``raw_keys`` are copied
    without any layout transform (used for pre-converted arrays)."""
    raw_keys = set(raw_keys)
    dst_flat = _flatten(dst_template)
    out = {}
    for path, leaf in dst_flat.items():
        joined = "/".join(path)
        if joined not in name_map:
            out[path] = leaf
            continue
        w = np.asarray(state_dict[name_map[joined]])
        if name_map[joined] in raw_keys:
            pass
        elif w.ndim >= 3:
            w = torch_kernel_to_jax(w)
        elif w.ndim == 2 and path[-1] in ("kernel", "w_mp"):
            # torch Linear stores [out, in]; flax Dense (and the
            # magnitude-preserving w_mp leaf) stores [in, out]. Always
            # transpose (a square matrix would pass the shape check
            # untransposed).
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


def scope_name_map(name_map: dict[str, str], scope: str) -> dict[str, str]:
    """Re-root a flax-path -> torch-key map one module scope deeper, e.g.
    scope='model/' when the net lives inside a KarrasNet wrapper, or
    'unet/' for PUNetGDeterministic's inner PUNetG."""
    out = {}
    for path, torch_key in name_map.items():
        collection, rest = path.split("/", 1)
        out[f"{collection}/{scope}{rest}"] = torch_key
    return out


# ---------------------------------------------------------------------------
# reference PUNetG state-dict import
# ---------------------------------------------------------------------------
_PUNETG_PREFIX_RULES = [
    (re.compile(r"^downward_blocks\.(\d+)\.(\d+)\.(.*)$"),
     lambda m: ("down_{}_res_{}".format(m.group(1), m.group(2)), m.group(3))),
    (re.compile(r"^upward_blocks\.(\d+)\.(\d+)\.(.*)$"),
     lambda m: ("up_{}_res_{}".format(m.group(1), m.group(2)), m.group(3))),
    (re.compile(r"^before_block\.(\d+)\.(.*)$"),
     lambda m: ("before_res_{}".format(m.group(1)), m.group(2))),
    (re.compile(r"^after_block\.(\d+)\.(.*)$"),
     lambda m: ("after_res_{}".format(m.group(1)), m.group(2))),
    (re.compile(r"^attn_resnet_block\.(\d+)\.(.*)$"),
     lambda m: ("attn_res_{}".format(m.group(1)), m.group(2))),
    (re.compile(r"^attn_block\.(\d+)\.(.*)$"),
     lambda m: ("attn_{}".format(m.group(1)), m.group(2))),
    # encoder-half bottleneck naming (punetg_encdec.py:75-89):
    # ModuleList([before, attn_resnet, attn, after])
    (re.compile(r"^bottom_blocks\.0\.(\d+)\.(.*)$"),
     lambda m: ("before_res_{}".format(m.group(1)), m.group(2))),
    (re.compile(r"^bottom_blocks\.1\.(\d+)\.(.*)$"),
     lambda m: ("attn_res_{}".format(m.group(1)), m.group(2))),
    (re.compile(r"^bottom_blocks\.2\.(\d+)\.(.*)$"),
     lambda m: ("attn_{}".format(m.group(1)), m.group(2))),
    (re.compile(r"^bottom_blocks\.3\.(\d+)\.(.*)$"),
     lambda m: ("after_res_{}".format(m.group(1)), m.group(2))),
    (re.compile(r"^downsamplers\.(\d+)\.conv\.(.*)$"),
     lambda m: ("downsampler_{}/Conv_0".format(m.group(1)), m.group(2))),
    (re.compile(r"^upsamplers\.(\d+)\.conv\.(.*)$"),
     lambda m: ("upsampler_{}/Conv_0".format(m.group(1)), m.group(2))),
]

_PUNETG_RESBLOCK_LEAVES = {
    "gnorm1.weight": "GroupLNorm_0/scale",
    "gnorm1.bias": "GroupLNorm_0/bias",
    "gnorm2.weight": "GroupRMSNorm_0/scale",
    "gnorm2.bias": "GroupRMSNorm_0/bias",
    "conv1.weight": "Conv_0/kernel",
    "conv1.bias": "Conv_0/bias",
    "conv2.weight": "Conv_1/kernel",
    "conv2.bias": "Conv_1/bias",
    "timeblock.net.0.weight": "ResnetTimeBlock_0/Dense_0/kernel",
    "timeblock.net.0.bias": "ResnetTimeBlock_0/Dense_0/bias",
    "timeblock.net.2.weight": "ResnetTimeBlock_0/Dense_1/kernel",
    "timeblock.net.2.bias": "ResnetTimeBlock_0/Dense_1/bias",
    "timeblock.net.4.weight": "ResnetTimeBlock_0/Dense_2/kernel",
    "timeblock.net.4.bias": "ResnetTimeBlock_0/Dense_2/bias",
}

def migrate_dit_attention_params(params: Any) -> Any:
    """One-time migration for DiT checkpoints saved before DiTBlock
    switched from ``flax.linen.MultiHeadDotProductAttention`` to the
    in-house per-head ``MultiHeadAttention`` (models/nets/dit.py:88-90).

    Rewrites every ``MultiHeadDotProductAttention_<i>`` scope into the
    equivalent ``MultiHeadAttention_<i>`` scope:

    - query/key/value kernel [C, H, dh]  ->  w_q/w_k/w_v [H, C, dh]
    - out kernel             [H, dh, C]  ->  w_o         [H, C, dh]
    - query/key/value bias   [H, dh]     ->  bias_q/k/v  [H, 1, dh]
    - out bias               [C]         ->  bias_o      [C]

    Numerically exact: both modules compute the same projections, only
    the parameter layout differs. Returns a new tree; non-attention
    scopes pass through untouched.
    """
    _scope = re.compile(r"^MultiHeadDotProductAttention_(\d+)$")

    def convert_scope(old):
        new = {}
        for proj, wname, bname in (("query", "w_q", "bias_q"),
                                   ("key", "w_k", "bias_k"),
                                   ("value", "w_v", "bias_v")):
            k = np.asarray(old[proj]["kernel"])          # [C, H, dh]
            new[wname] = k.transpose(1, 0, 2)            # [H, C, dh]
            if "bias" in old[proj]:
                b = np.asarray(old[proj]["bias"])        # [H, dh]
                new[bname] = b[:, None, :]               # [H, 1, dh]
        k = np.asarray(old["out"]["kernel"])             # [H, dh, C]
        new["w_o"] = k.transpose(0, 2, 1)                # [H, C, dh]
        if "bias" in old["out"]:
            new["bias_o"] = np.asarray(old["out"]["bias"])
        return new

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for name, child in node.items():
            m = _scope.match(name)
            if m is not None:
                out[f"MultiHeadAttention_{m.group(1)}"] = convert_scope(child)
            else:
                out[name] = walk(child)
        return out

    return walk(jax.tree.map(lambda x: x, params))


# torch.nn.MultiheadAttention keys (reference NDimensionalAttention,
# attention.py:8-102) are handled by ``import_reference_punetg``'s
# pre-conversion, not by the leaf map.


def _mp_flax_path(path: str) -> str:
    """Rewrite a default-conv flax path into its magnitude-preserving
    counterpart: Conv_/Dense_ module names become their
    MagnitudePreserving* auto-names and 'kernel' leaves become the
    ``w_mp`` sphere-projected parameter (models/nets/normed.py)."""
    path = path.replace("/Conv_", "/MagnitudePreservingConv_")
    path = path.replace("/Dense_", "/MagnitudePreservingDense_")
    if path.endswith("/kernel"):
        path = path[: -len("kernel")] + "w_mp"
    return path


def punetg_reference_name_map(torch_keys,
                              convolution_type: str = "default",
                              ) -> dict[str, str]:
    """Build the flax-path -> torch-key map for importing a reference
    PUNetG state dict (reference punetg.py:80-106 module tree) into our
    PUNetG variables ({'params': ..., 'buffers': ...}).

    Covers the default-norm config (first_norm='GroupLN',
    second_norm='GroupRMS') with default, circular, or magnitude-
    preserving (``convolution_type='mp'``, punetg.py:217-236 ->
    normedlayers.py) convolutions.
    Use with ``import_torch_state_dict``.
    """
    if convolution_type == "mp":
        base = punetg_reference_name_map(torch_keys, "default")
        return {_mp_flax_path(p): k for p, k in base.items()}
    name_map = {}
    for key in torch_keys:
        if key == "time_projection.W":
            name_map["buffers/time_projection/W"] = key
            continue
        for prefix in ("convin", "convout"):
            if key == f"{prefix}.weight":
                name_map[f"params/{prefix}/kernel"] = key
            elif key == f"{prefix}.bias":
                name_map[f"params/{prefix}/bias"] = key
        if key.startswith(("convin.", "convout.")):
            continue
        for pat, repl in _PUNETG_PREFIX_RULES:
            m = pat.match(key)
            if m is None:
                continue
            scope, rest = repl(m)
            if rest in _PUNETG_RESBLOCK_LEAVES:
                name_map[f"params/{scope}/{_PUNETG_RESBLOCK_LEAVES[rest]}"] \
                    = key
            elif rest in ("weight", "bias"):
                leaf = "kernel" if rest == "weight" else "bias"
                name_map[f"params/{scope}/{leaf}"] = key
            else:
                raise KeyError(f"unmapped reference PUNetG key: {key}")
            break
        else:
            raise KeyError(f"unmapped reference PUNetG key: {key}")
    return name_map


_TORCH_MHA_RE = re.compile(r"^attn_block\.(\d+)\.mhattn\.(.+)$")
_TORCH_INHOUSE_MHA_RE = re.compile(
    r"^attn_block\.(\d+)\.mhattn\.([qkvo])_proj_matrix$")


def import_reference_punetg(state_dict: dict, dst_template: Any,
                            num_heads: int = 1, scope: str = "",
                            convolution_type: str = "default") -> Any:
    """Import a reference PUNetG state dict (punetg.py:80-106) into our
    PUNetG variables, including torch.nn.MultiheadAttention bottleneck
    layers (attention.py:30-36): the packed in_proj [3C, C] is split into
    per-head q/k/v tensors [H, C, dh] and out_proj [C, C] into [H, C, dh]
    matching our einsum conventions (models/nets/attention.py:91-114).
    ``scope``: extra flax scope when the PUNetG is nested (e.g. 'unet/'
    for PUNetGCond, punetg.py:262-284).
    """
    sd = dict(state_dict)
    pre = {}
    name_map = {}
    mp = convolution_type == "mp"
    for key in list(sd):
        mi = _TORCH_INHOUSE_MHA_RE.match(key)
        if mi is not None:
            # reference in-house einsum MHA (attention.py:105-244, the
            # cosine / magnitude-preserving path): projections are stored
            # [nheads, dmodel, dhead] in BOTH frameworks — raw copy. The
            # mp variant names its flax params w_mp_* so the optimizer
            # re-projection finds them (models/nets/attention.py:76-83).
            j, nm = mi.group(1), mi.group(2)
            pfx = "w_mp" if mp else "w"
            pre[f"params/{scope}attn_{j}/MultiHeadAttention_0/{pfx}_{nm}"] \
                = np.asarray(sd.pop(key))
            continue
        m = _TORCH_MHA_RE.match(key)
        if m is None:
            continue
        j, rest = m.group(1), m.group(2)
        mha_scope = f"params/{scope}attn_{j}/MultiHeadAttention_0"
        w = np.asarray(sd.pop(key))
        H = num_heads
        if rest == "in_proj_weight":
            C = w.shape[1]
            dh = C // H
            for i, nm in enumerate(("q", "k", "v")):
                # torch: q[t, h*dh+d] = sum_c x[t,c] W[h*dh+d, c]
                # ours:  q[h, t, d]   = sum_c x[t,c] w[h, c, d]
                pre[f"{mha_scope}/w_{nm}"] = \
                    w[i * C:(i + 1) * C].reshape(H, dh, C).transpose(0, 2, 1)
        elif rest == "in_proj_bias":
            C = w.shape[0] // 3
            dh = C // H
            for i, nm in enumerate(("q", "k", "v")):
                pre[f"{mha_scope}/bias_{nm}"] = \
                    w[i * C:(i + 1) * C].reshape(H, 1, dh)
        elif rest == "out_proj.weight":
            C = w.shape[0]
            dh = C // H
            # torch: y[t, c] = sum_{h,d} o[t, h*dh+d] W[c, h*dh+d]
            # ours:  y[t, c] = sum_{h,d} o[h, t, d] w[h, c, d]
            pre[f"{mha_scope}/w_o"] = w.reshape(C, H, dh).transpose(1, 0, 2)
        elif rest == "out_proj.bias":
            pre[f"{mha_scope}/bias_o"] = w
        else:
            raise KeyError(f"unmapped attention key: {key}")
    name_map = punetg_reference_name_map(sd.keys(), convolution_type)
    if scope:
        name_map = scope_name_map(name_map, scope)
    merged = dict(sd)
    merged.update(pre)
    for path in pre:
        name_map[path] = path
    return import_torch_state_dict(merged, name_map, dst_template,
                                   raw_keys=pre.keys())


# ---------------------------------------------------------------------------
# reference ADM state-dict import (adm.py:119-216)
# ---------------------------------------------------------------------------
_ADM_BLOCK_LEAVES = {
    "norm1.weight": "GroupLNorm_0/scale",
    "norm1.bias": "GroupLNorm_0/bias",
    "norm2.weight": "GroupRMSNorm_0/scale",
    "norm2.bias": "GroupRMSNorm_0/bias",
    "conv1.weight": "Conv_0/kernel",
    "conv1.bias": "Conv_0/bias",
    "conv2.weight": "Conv_1/kernel",
    "conv2.bias": "Conv_1/bias",
    "convresidual.weight": "Conv_2/kernel",
    "convresidual.bias": "Conv_2/bias",
    "embed_linear.weight": "Dense_0/kernel",
    "embed_linear.bias": "Dense_0/bias",
}

_ADM_SCOPE_RULES = [
    (re.compile(r"^encoder\.layers\.(\d+)\.input_blocks\.(\d+)\.(.*)$"),
     lambda m: (f"enc_{m.group(1)}_block_{m.group(2)}", m.group(3))),
    (re.compile(r"^decoder\.layers\.(\d+)\.input_blocks\.(\d+)\.(.*)$"),
     lambda m: (f"dec_{m.group(1)}_block_{m.group(2)}", m.group(3))),
    (re.compile(r"^middle_block\.middle_blocks\.(\d+)\.(.*)$"),
     lambda m: (f"mid_block_{m.group(1)}", m.group(2))),
]


def _mha_pre_convert(scope: str, rest: str, w: np.ndarray,
                     num_heads: int) -> dict[str, np.ndarray]:
    """torch.nn.MultiheadAttention leaf -> our per-head einsum MHA
    tensors (models/nets/attention.py:91-114). ``scope`` is the flax
    path of the MultiHeadAttention module."""
    H = num_heads
    pre = {}
    if rest == "in_proj_weight":
        C = w.shape[1]
        dh = C // H
        for i, nm in enumerate(("q", "k", "v")):
            pre[f"{scope}/w_{nm}"] = \
                w[i * C:(i + 1) * C].reshape(H, dh, C).transpose(0, 2, 1)
    elif rest == "in_proj_bias":
        C = w.shape[0] // 3
        dh = C // H
        for i, nm in enumerate(("q", "k", "v")):
            pre[f"{scope}/bias_{nm}"] = \
                w[i * C:(i + 1) * C].reshape(H, 1, dh)
    elif rest == "out_proj.weight":
        C = w.shape[0]
        dh = C // H
        pre[f"{scope}/w_o"] = w.reshape(C, H, dh).transpose(1, 0, 2)
    elif rest == "out_proj.bias":
        pre[f"{scope}/bias_o"] = w
    else:
        raise KeyError(f"unmapped attention leaf: {rest}")
    return pre


def import_reference_adm(state_dict: dict, dst_template: Any,
                         num_heads: int = 1) -> Any:
    """Import a reference ADM state dict (adm.py:119-216) into our ADM
    variables (models/nets/adm.py). Covers the default-norm config
    (first_norm='GroupLN', second_norm='GroupRMS'); attention middle
    blocks go through the torch-MHA split (`_mha_pre_convert`)."""
    name_map = {}
    pre = {}
    for key, w in state_dict.items():
        if key == "time_embedding.projection.W":
            name_map["buffers/time_embedding/GaussianFourierProjection_0/W"] \
                = key
            continue
        m = re.match(r"^time_embedding\.mlp\.(\d)\.(weight|bias)$", key)
        if m:
            dense = {"0": "Dense_0", "2": "Dense_1"}[m.group(1)]
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            name_map[f"params/time_embedding/{dense}/{leaf}"] = key
            continue
        m = re.match(r"^(input_layer|output_layer)\.(weight|bias)$", key)
        if m:
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            name_map[f"params/{m.group(1)}/{leaf}"] = key
            continue
        for pat, repl in _ADM_SCOPE_RULES:
            mm = pat.match(key)
            if mm is None:
                continue
            scope, rest = repl(mm)
            am = re.match(r"^attn\.mhattn\.(.+)$", rest)
            if am:
                mha_scope = (f"params/{scope}/SpatialSelfAttention_0/"
                             f"MultiHeadAttention_0")
                pre.update(_mha_pre_convert(mha_scope, am.group(1),
                                            np.asarray(w), num_heads))
            elif rest in _ADM_BLOCK_LEAVES:
                name_map[f"params/{scope}/{_ADM_BLOCK_LEAVES[rest]}"] = key
            else:
                raise KeyError(f"unmapped reference ADM key: {key}")
            break
        else:
            raise KeyError(f"unmapped reference ADM key: {key}")
    merged = dict(state_dict)
    merged.update(pre)
    for path in pre:
        name_map[path] = path
    return import_torch_state_dict(merged, name_map, dst_template,
                                   raw_keys=pre.keys())


# ---------------------------------------------------------------------------
# reference AutoencoderKL / VAENet state-dict import
# (autoencoderldm2d.py:552-631, vaenet.py:1231-1290)
# ---------------------------------------------------------------------------
_LDM_RESBLOCK_LEAVES = {
    "norm1.weight": "GroupNorm_0/scale",
    "norm1.bias": "GroupNorm_0/bias",
    "conv1.weight": "Conv_0/kernel",
    "conv1.bias": "Conv_0/bias",
    "norm2.weight": "GroupNorm_1/scale",
    "norm2.bias": "GroupNorm_1/bias",
    "conv2.weight": "Conv_1/kernel",
    "conv2.bias": "Conv_1/bias",
    "nin_shortcut.weight": "Conv_2/kernel",
    "nin_shortcut.bias": "Conv_2/bias",
}

_LDM_ATTN_DENSE = {"q": "Dense_0", "k": "Dense_1", "v": "Dense_2",
                   "proj_out": "Dense_3"}


def _ldm_attn_leaf(scope: str, rest: str, w: np.ndarray,
                   pre: dict, name_map: dict, key: str):
    """attn_1.{norm,q,k,v,proj_out} -> our LDMAttnBlock
    (models/nets/vae.py:94-112). The torch q/k/v/proj_out are 1x1 convs;
    ours are Dense: kernel [I, O] = W[:, :, 0, 0].T."""
    m = re.match(r"^(norm|q|k|v|proj_out)\.(weight|bias)$", rest)
    if not m:
        raise KeyError(f"unmapped LDM attention key: {key}")
    part, leaf = m.group(1), m.group(2)
    if part == "norm":
        name_map[f"{scope}/GroupNorm_0/" +
                 ("scale" if leaf == "weight" else "bias")] = key
        return
    dense = _LDM_ATTN_DENSE[part]
    if leaf == "weight":
        w = np.asarray(w)
        pre[f"{scope}/{dense}/kernel"] = \
            w.reshape(w.shape[0], w.shape[1]).T
    else:
        name_map[f"{scope}/{dense}/bias"] = key


def import_reference_autoencoderkl(state_dict: dict,
                                   dst_template: Any,
                                   root: str = "") -> Any:
    """Import a reference AutoencoderKL state dict
    (autoencoderldm2d.py:552-631; the 3D port uses the same names) into
    our AutoencoderKL variables (models/nets/vae.py:338+)."""
    name_map = {}
    pre = {}
    for key, w in state_dict.items():
        m = re.match(r"^(quant_conv|post_quant_conv)\.(weight|bias)$", key)
        if m:
            leaf = "kernel" if m.group(2) == "weight" else "bias"
            name_map[f"params/{m.group(1)}/{leaf}"] = key
            continue
        m = re.match(r"^(encoder|decoder)\.(.*)$", key)
        if not m:
            raise KeyError(f"unmapped reference AutoencoderKL key: {key}")
        side, rest = m.group(1), m.group(2)
        base = f"params/{root}{side}"
        mm = re.match(r"^(conv_in|conv_out)\.(weight|bias)$", rest)
        if mm:
            leaf = "kernel" if mm.group(2) == "weight" else "bias"
            name_map[f"{base}/{mm.group(1)}/{leaf}"] = key
            continue
        mm = re.match(r"^norm_out\.(weight|bias)$", rest)
        if mm:
            leaf = "scale" if mm.group(1) == "weight" else "bias"
            name_map[f"{base}/norm_out/{leaf}"] = key
            continue
        mm = re.match(r"^(down|up)\.(\d+)\.block\.(\d+)\.(.*)$", rest)
        if mm:
            scope = f"{base}/{mm.group(1)}_{mm.group(2)}_block_{mm.group(3)}"
            leaf = _LDM_RESBLOCK_LEAVES.get(mm.group(4))
            if leaf is None:
                raise KeyError(f"unmapped LDM block key: {key}")
            name_map[f"{scope}/{leaf}"] = key
            continue
        mm = re.match(r"^(down|up)\.(\d+)\.(downsample|upsample)\.conv\."
                      r"(weight|bias)$", rest)
        if mm:
            leaf = "kernel" if mm.group(4) == "weight" else "bias"
            name_map[f"{base}/{mm.group(1)}_{mm.group(2)}_{mm.group(3)}"
                     f"/Conv_0/{leaf}"] = key
            continue
        mm = re.match(r"^mid\.(block_[12])\.(.*)$", rest)
        if mm:
            leaf = _LDM_RESBLOCK_LEAVES.get(mm.group(2))
            if leaf is None:
                raise KeyError(f"unmapped LDM mid key: {key}")
            name_map[f"{base}/mid_{mm.group(1)}/{leaf}"] = key
            continue
        mm = re.match(r"^mid\.attn_1\.(.*)$", rest)
        if mm:
            _ldm_attn_leaf(f"{base}/mid_attn", mm.group(1), w, pre,
                           name_map, key)
            continue
        raise KeyError(f"unmapped reference AutoencoderKL key: {key}")
    merged = dict(state_dict)
    merged.update(pre)
    for path in pre:
        name_map[path] = path
    return import_torch_state_dict(merged, name_map, dst_template,
                                   raw_keys=pre.keys())


def import_reference_vaenet(state_dict: dict, dst_template: Any,
                            config, root: str = "") -> Any:
    """Import a reference VAENet state dict (vaenet.py:1231-1290) into
    our VAENet variables (models/nets/vaenet.py). The reference names
    blocks down.i.block.j / mid.block_k / up.i.block.j; our encoder and
    decoder auto-number blocks in call order (_StdResBlock_<k>), so the
    correspondence is computed from the config here. Reference convs sit
    inside a patched-conv wrapper: the trailing '.conv' scope is
    stripped."""
    cfg = config
    enc_scope, dec_scope = {}, {}
    k = 0
    for i in range(cfg.num_resolutions):
        for j in range(cfg.num_res_blocks):
            enc_scope[f"down.{i}.block.{j}"] = f"_StdResBlock_{k}"
            k += 1
    enc_scope["mid.block_1"] = f"_StdResBlock_{k}"
    enc_scope["mid.block_2"] = f"_StdResBlock_{k + 1}"
    k = 0
    dec_scope["mid.block_1"] = "_StdResBlock_0"
    dec_scope["mid.block_2"] = "_StdResBlock_1"
    k = 2
    for i in reversed(range(cfg.num_resolutions)):
        for j in range(cfg.num_res_blocks + 1):
            dec_scope[f"up.{i}.block.{j}"] = f"_StdResBlock_{k}"
            k += 1
    n_down = 0
    down_scope = {}
    for i in range(cfg.num_resolutions - 1):
        down_scope[f"down.{i}.downsample"] = f"LDMDownsample_{n_down}"
        n_down += 1
    n_up = 0
    up_scope = {}
    for i in reversed(range(1, cfg.num_resolutions)):
        up_scope[f"up.{i}.upsample"] = f"LDMUpsample_{n_up}"
        n_up += 1

    name_map = {}
    pre = {}
    for key, w in state_dict.items():
        m = re.match(r"^(encoder|decoder)\.(.*)$", key)
        if not m:
            raise KeyError(f"unmapped reference VAENet key: {key}")
        side, rest = m.group(1), m.group(2)
        base = f"params/{root}{side}"
        # strip wrapper scopes: every bare 'conv' segment (the patched-conv
        # wrapper, plus the up/downsample module's own .conv attribute —
        # they stack, e.g. 'up.1.upsample.conv.conv.weight')
        rest = ".".join(s for s in rest.split(".") if s != "conv")
        mm = re.match(r"^(conv_in|conv_out|quant_conv|post_quant_conv)\."
                      r"(weight|bias)$", rest)
        if mm:
            leaf = "kernel" if mm.group(2) == "weight" else "bias"
            name_map[f"{base}/{mm.group(1)}/{leaf}"] = key
            continue
        mm = re.match(r"^norm_out\.(weight|bias)$", rest)
        if mm:
            leaf = "scale" if mm.group(1) == "weight" else "bias"
            name_map[f"{base}/GroupNorm_0/{leaf}"] = key
            continue
        mm = re.match(r"^((?:down|up)\.\d+\.block\.\d+|mid\.block_[12])"
                      r"\.(.*)$", rest)
        if mm:
            scopes = enc_scope if side == "encoder" else dec_scope
            scope = scopes[mm.group(1)]
            leaf = _LDM_RESBLOCK_LEAVES.get(mm.group(2))
            if leaf is None:
                raise KeyError(f"unmapped VAENet block key: {key}")
            name_map[f"{base}/{scope}/{leaf}"] = key
            continue
        mm = re.match(r"^((?:down|up)\.\d+\.(?:downsample|upsample))\."
                      r"(weight|bias)$", rest)
        if mm:
            scopes = down_scope if side == "encoder" else up_scope
            scope = scopes[mm.group(1)]
            leaf = "kernel" if mm.group(2) == "weight" else "bias"
            name_map[f"{base}/{scope}/Conv_0/{leaf}"] = key
            continue
        mm = re.match(r"^mid\.attn_1\.(.*)$", rest)
        if mm:
            _ldm_attn_leaf(f"{base}/mid_attn", mm.group(1), w, pre,
                           name_map, key)
            continue
        raise KeyError(f"unmapped reference VAENet key: {key}")
    merged = dict(state_dict)
    merged.update(pre)
    for path in pre:
        name_map[path] = path
    return import_torch_state_dict(merged, name_map, dst_template,
                                   raw_keys=pre.keys())


# ---------------------------------------------------------------------------
# diffusers UNet2DModel import (the HFNet backbone)
# ---------------------------------------------------------------------------
_UNET2D_NORMS = ("norm1", "norm2", "group_norm", "conv_norm_out")


def diffusers_unet2d_name_map(torch_keys) -> dict[str, str]:
    """flax-path -> torch-key map from a ``diffusers.UNet2DModel``
    state dict into our ``ddpm_unet.UNet2D`` (models/nets/ddpm_unet.py).

    Key grammar (public diffusers naming): ``conv_in``,
    ``time_embedding.linear_{1,2}``,
    ``{down,up}_blocks.{i}.resnets.{j}.{norm1,conv1,time_emb_proj,norm2,
    conv2,conv_shortcut}``, ``...attentions.{j}.{group_norm,to_q,to_k,
    to_v,to_out.0}``, ``down_blocks.{i}.downsamplers.0.conv``,
    ``up_blocks.{i}.upsamplers.0.conv``, ``mid_block.{resnets.{0,1},
    attentions.0}``, ``conv_norm_out``, ``conv_out``.
    """
    def leaf_for(module: str, suffix: str) -> str:
        if suffix == "bias":
            return "bias"
        return "scale" if module in _UNET2D_NORMS else "kernel"

    name_map = {}
    for key in torch_keys:
        parts = key.split(".")
        suffix = parts[-1]
        if suffix not in ("weight", "bias"):
            raise KeyError(f"unmapped diffusers UNet2D key: {key}")
        body = parts[:-1]
        if body[:2] == ["time_embedding", "linear_1"]:
            scope, module = "time_linear_1", "linear"
        elif body[:2] == ["time_embedding", "linear_2"]:
            scope, module = "time_linear_2", "linear"
        elif body[0] in ("conv_in", "conv_out", "conv_norm_out"):
            scope, module = body[0], body[0]
        elif body[0] == "mid_block":
            if body[1] == "resnets":
                scope = f"mid_resnet_{int(body[2]) + 1}/{body[3]}"
                module = body[3]
            else:  # attentions.0
                rest = body[3:]
                if rest[:2] == ["to_out", "0"]:
                    rest = ["to_out"]
                scope = "mid_attn/" + "/".join(rest)
                module = rest[-1]
        elif body[0] in ("down_blocks", "up_blocks"):
            block = f"{body[0]}_{body[1]}"
            if body[2] in ("downsamplers", "upsamplers"):
                scope = f"{block}/{body[2][:-2]}"  # -> {down,up}sample
                module = "conv"
            elif body[2] == "resnets":
                scope = f"{block}/resnets_{body[3]}/{body[4]}"
                module = body[4]
            elif body[2] == "attentions":
                rest = body[4:]
                if rest[:2] == ["to_out", "0"]:
                    rest = ["to_out"]
                scope = f"{block}/attentions_{body[3]}/" + "/".join(rest)
                module = rest[-1]
            else:
                raise KeyError(f"unmapped diffusers UNet2D key: {key}")
        else:
            raise KeyError(f"unmapped diffusers UNet2D key: {key}")
        name_map[f"params/{scope}/{leaf_for(module, suffix)}"] = key
    return name_map


def import_diffusers_unet2d(state_dict: dict, dst_template: Any,
                            scope: str = "") -> Any:
    """Import a ``diffusers.UNet2DModel`` state dict into our UNet2D
    variables. ``scope``: extra flax scope when nested (e.g. 'unet/' for
    the HFNet wrappers, models/nets/hfnet.py)."""
    name_map = diffusers_unet2d_name_map(state_dict.keys())
    if scope:
        name_map = scope_name_map(name_map, scope)
    return import_torch_state_dict(state_dict, name_map, dst_template)
