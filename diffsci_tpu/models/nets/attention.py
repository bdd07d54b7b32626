"""Spatial self-attention over flattened tokens.

Redesign of the reference attention stack (reference
diffsci/models/nets/attention.py:8-372). Channels-last makes the reference's
einops rearranges (attention.py:81-102) pure reshapes. One dimension-agnostic
module covers the 2D/3D variants.

Backends:
- ``xla``: jnp.einsum softmax attention (XLA fuses well at bottleneck sizes)
- ``flash``: Pallas fused flash-attention kernel (diffsci_tpu.kernels) for
  large token counts; falls back to xla off-TPU.

Supports the reference's cosine attention (attention.py:304-381) and
magnitude-preserving projection norms (attention.py:229-243).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import flax.linen as nn

from diffsci_tpu.models.nets.normed import MP_PARAM_NAME


def _norm_weight(w, kind: str, eps: float = 1e-4):
    """Magnitude-preserving projection normalization
    (attention.py:229-243). w: [nheads, dmodel, dhead]."""
    if kind in ("wq", "wk", "wv"):
        n = jnp.linalg.norm(w, axis=1, keepdims=True)
    else:  # wo: normalize over (heads, dhead)
        n = jnp.linalg.norm(w, axis=(0, 2), keepdims=True)
    alpha = math.sqrt(n.size / w.size)
    return w / (alpha * n + eps)


def dot_product_attention(q, k, v):
    """Scaled dot-product attention (attention.py:247-301).
    q,k: [..., H, T, dk]; v: [..., H, T, dv]."""
    dk = q.shape[-1]
    logits = jnp.einsum("...ij,...kj->...ik", q, k) / math.sqrt(dk)
    weights = nn.softmax(logits, axis=-1)
    return jnp.einsum("...ij,...jk->...ik", weights, v)


def cosine_attention(q, k, v, eps: float = 1e-8):
    """Cosine-similarity attention (attention.py:304-381)."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)
    k = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + eps)
    logits = jnp.einsum("...nd,...md->...nm", q, k)
    weights = nn.softmax(logits, axis=-1)
    return jnp.einsum("...ij,...jk->...ik", weights, v)


class MultiHeadAttention(nn.Module):
    """Einsum multi-head self-attention with per-head projection tensors
    (attention.py:105-244). ``use_bias`` adds qkv/out biases, matching the
    torch.nn.MultiheadAttention default the reference uses for
    attn_type='default'."""
    num_heads: int
    attn_type: str = "dot"  # 'dot' | 'cosine'
    magnitude_preserving: bool = False
    use_bias: bool = False
    backend: str = "xla"  # 'xla' | 'flash'
    # The reference's in-house MHA divides EVERY projection by
    # sqrt(fan_in) — unconditionally, mp or not (attention.py:182-196).
    # True for the in-house emulation (SpatialSelfAttention cosine/mp
    # paths); False when this module emulates torch.nn.MultiheadAttention
    # / plain Linear projections (DiT, MoE), which have no such scale.
    # magnitude_preserving implies it.
    fan_in_scaled: bool = False

    @nn.compact
    def __call__(self, x):
        # x: [B, T, C]
        dmodel = x.shape[-1]
        dh = dmodel // self.num_heads
        if self.magnitude_preserving:
            init = nn.initializers.normal(1.0)
        else:
            init = nn.initializers.xavier_uniform(in_axis=-2, out_axis=-1)
        pname = MP_PARAM_NAME if self.magnitude_preserving else "w"
        shape_qkv = (self.num_heads, dmodel, dh)

        def proj_param(name):
            return self.param(f"{pname}_{name}", init, shape_qkv)

        wq, wk, wv = proj_param("q"), proj_param("k"), proj_param("v")
        wo = self.param(f"{pname}_o", init, (self.num_heads, dmodel, dh))

        if self.magnitude_preserving:
            wq = _norm_weight(wq, "wq")
            wk = _norm_weight(wk, "wk")
            wv = _norm_weight(wv, "wv")
            wo = _norm_weight(wo, "wo")
        if self.fan_in_scaled or self.magnitude_preserving:
            wq = wq / math.sqrt(dmodel)
            wk = wk / math.sqrt(dmodel)
            wv = wv / math.sqrt(dmodel)
            wo = wo / math.sqrt(self.num_heads * dh)

        # [B, T, C] x [H, C, dh] -> [B, H, T, dh]
        q = jnp.einsum("btc,hcd->bhtd", x, wq)
        k = jnp.einsum("btc,hcd->bhtd", x, wk)
        v = jnp.einsum("btc,hcd->bhtd", x, wv)
        if self.use_bias:
            q = q + self.param("bias_q", nn.initializers.zeros,
                               (self.num_heads, 1, dh))
            k = k + self.param("bias_k", nn.initializers.zeros,
                               (self.num_heads, 1, dh))
            v = v + self.param("bias_v", nn.initializers.zeros,
                               (self.num_heads, 1, dh))

        if self.attn_type == "cosine":
            o = cosine_attention(q, k, v)
        elif self.backend == "flash":
            from diffsci_tpu.kernels import flash_attention
            o = flash_attention.flash_attention(q, k, v)
        else:
            o = dot_product_attention(q, k, v)

        # [B, H, T, dh] x [H, C, dh] -> [B, T, C]
        y = jnp.einsum("bhtd,hcd->btc", o, wo)
        if self.use_bias:
            y = y + self.param("bias_o", nn.initializers.zeros, (dmodel,))
        return y


class SpatialSelfAttention(nn.Module):
    """Global attention over flattened spatial dims, any dimensionality
    (the reference's NDimensionalAttention + 2D/3D subclasses,
    attention.py:8-102). Channels-last: flattening is a reshape."""
    num_heads: int = 1
    attn_type: str = "default"  # 'default' | 'cosine'
    attn_residual: bool = False
    magnitude_preserving: bool = False
    backend: str = "xla"

    @nn.compact
    def __call__(self, x):
        # x: [B, *spatial, C]
        B, C = x.shape[0], x.shape[-1]
        spatial = x.shape[1:-1]
        tokens = x.reshape(B, -1, C)
        if self.attn_type == "default" and not self.magnitude_preserving:
            out = MultiHeadAttention(self.num_heads, attn_type="dot",
                                     use_bias=True,
                                     backend=self.backend)(tokens)
        else:
            attn_type = "cosine" if self.attn_type == "cosine" else "dot"
            out = MultiHeadAttention(
                self.num_heads, attn_type=attn_type,
                magnitude_preserving=self.magnitude_preserving,
                fan_in_scaled=True,  # reference in-house MHA semantics
                backend=self.backend)(tokens)
        out = out.reshape((B,) + spatial + (C,))
        if self.attn_residual:
            out = x + out
        return out
