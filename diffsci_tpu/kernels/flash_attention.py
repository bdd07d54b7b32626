"""Fused flash-attention Pallas kernels (forward + backward).

Replaces the reference's materialized [T, T] softmax attention
(reference diffsci/models/nets/attention.py:247-301, which builds the full
weights matrix in HBM) with an online-softmax blocked kernel: logits tiles
live only in VMEM, HBM traffic drops from O(T^2) to O(T * d). Matters for
3D volumes where T = D*H*W reaches tens of thousands of tokens.

Design (TPU-first):
- K/V are blocked *through the grid* (innermost kv grid dimension), so VMEM
  holds only [block, d] tiles regardless of T — the large-T regime this
  kernel exists for is exactly where whole-T VMEM residency would fail.
- The forward saves the per-row logsumexp; a custom VJP recomputes P tiles
  on the fly in two backward Pallas kernels (dQ; dK/dV), the standard
  flash-attention backward. `backend='flash'` therefore trains.
- Any head dim is accepted: blocks take the full head dim (legal for any d;
  the MXU pads lanes internally at zero HBM cost), and ragged token counts
  are zero-padded with masked-out keys — the mask `where` is compiled out
  entirely in the common no-padding case. Neither forces an XLA fallback.

Falls back to the XLA einsum path off-TPU and for tiny token counts (where
the full matrix fits comfortably and one fused XLA softmax wins).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_NEG_INF = -1e30

try:  # pallas is TPU-gated; keep importable everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# Flipped by tests to exercise the kernels on CPU.
INTERPRET = False

# Dispatch threshold: measured on TPU v5e, the kernel beats XLA's fused
# attention from T~2048 up (1.5-2x fwd+bwd at 4096-16384); below that XLA
# ties or wins, so small token counts stay on the XLA path.
DEFAULT_MIN_TOKENS = 2048


def _xla_attention(q, k, v):
    dk = q.shape[-1]
    logits = jnp.einsum("...ij,...kj->...ik", q, k) / math.sqrt(dk)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("...ij,...jk->...ik", weights, v)


def _key_mask(j, block_k, true_t, rows):
    """[rows, block_k] mask of keys that are real (not T-padding)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, block_k), 1)
    return (j * block_k + col) < true_t


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _dot_nt(a, b):
    """a @ b.T via dot_general — the MXU takes the transpose for free;
    no materialized transpose in VMEM. Both operands keep their dtype
    (bf16 inputs ride the native bf16 MXU pass)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_tn(a, b):
    """a.T @ b via dot_general (contract over rows of both)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, acc, m_scr, l_scr, *,
                sm_scale, block_k, true_t, masked):
    """Grid (BH, nq, nkv); kv innermost. Blocks: q/o [1, bq, d],
    k/v [1, bk, d], lse [1, bq, 1]. Scratch persists across the kv loop."""
    j = pl.program_id(2)
    nkv = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    s = _dot_nt(q_ref[0], k_ref[0]) * sm_scale    # [bq, bk] f32
    if masked:  # static: only when T-padding exists
        s = jnp.where(_key_mask(j, block_k, true_t, s.shape[0]), s, _NEG_INF)

    m_prev = m_scr[:]                            # [bq, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=-1, keepdims=True)
    m_scr[:] = m_new
    pv = jnp.dot(p.astype(v_ref.dtype), v_ref[0],
                 preferred_element_type=jnp.float32)
    acc[:] = acc[:] * alpha + pv

    @pl.when(j == nkv - 1)
    def _():
        l = l_scr[:]
        o_ref[0] = (acc[:] / l).astype(o_ref.dtype)
        lse_ref[0] = m_scr[:] + jnp.log(l)


def _flash_fwd(qf, kf, vf, block_q, block_k, sm_scale, true_t,
               interpret=False):
    """qf/kf/vf: padded [BH, Tq, d] / [BH, Tk, d]. Returns (o, lse)."""
    BH, Tq, d = qf.shape
    Tk = kf.shape[1]
    nq, nkv = Tq // block_q, Tk // block_k
    kernel = functools.partial(_fwd_kernel, sm_scale=sm_scale,
                               block_k=block_k, true_t=true_t,
                               masked=(true_t != kf.shape[1]))
    flops = 4 * BH * Tq * Tk * d
    return pl.pallas_call(
        kernel,
        grid=(BH, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            # [BH, Tq, 1]: trailing (block_q, 1) satisfies TPU tiling
            # (last block dim equals the full array dim).
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(qf.shape, qf.dtype),
            jax.ShapeDtypeStruct((BH, Tq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, transcendentals=BH * Tq * Tk,
            bytes_accessed=4 * BH * (Tq + 2 * Tk) * d * nq),
        interpret=interpret,
    )(qf, kf, vf)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
               dq_acc, *, sm_scale, block_k, true_t, masked):
    """Grid (BH, nq, nkv); kv innermost. dQ_i = sum_j dS_ij @ K_j * scale."""
    j = pl.program_id(2)
    nkv = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    lse = lse_ref[0]                              # [bq, 1]
    delta = delta_ref[0]                          # [bq, 1]

    s = _dot_nt(q_ref[0], k_ref[0]) * sm_scale
    if masked:
        s = jnp.where(_key_mask(j, block_k, true_t, s.shape[0]), s, _NEG_INF)
    p = jnp.exp(s - lse)                          # [bq, bk]
    dp = _dot_nt(do_ref[0], v_ref[0])
    ds = (p * (dp - delta)).astype(k_ref.dtype)
    dq_acc[:] += jnp.dot(ds, k_ref[0],
                         preferred_element_type=jnp.float32) * sm_scale

    @pl.when(j == nkv - 1)
    def _():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, dk_acc, dv_acc, *, sm_scale, block_k,
                true_t, masked):
    """Grid (BH, nkv, nq); q innermost. dK_j = sum_i dS_ij^T @ Q_i * scale,
    dV_j = sum_i P_ij^T @ dO_i."""
    i = pl.program_id(2)
    nq = pl.num_programs(2)
    j = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    lse = lse_ref[0]                              # [bq, 1]
    delta = delta_ref[0]                          # [bq, 1]

    s = _dot_nt(q_ref[0], k_ref[0]) * sm_scale
    if masked:
        s = jnp.where(_key_mask(j, block_k, true_t, s.shape[0]), s, _NEG_INF)
    p = jnp.exp(s - lse)                          # [bq, bk]
    dv_acc[:] += _dot_tn(p.astype(do_ref.dtype), do_ref[0])
    dp = _dot_nt(do_ref[0], v_ref[0])
    ds = (p * (dp - delta)).astype(q_ref.dtype)
    dk_acc[:] += _dot_tn(ds, q_ref[0]) * sm_scale

    @pl.when(i == nq - 1)
    def _():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(res, g, block_q, block_k, sm_scale, true_t, interpret=False):
    qf, kf, vf, o, lse = res
    BH, Tq, d = qf.shape
    Tk = kf.shape[1]
    nq, nkv = Tq // block_q, Tk // block_k
    # delta_i = rowsum(dO_i * O_i): one cheap elementwise pass, XLA fuses
    # it. f32 accumulate; dO itself stays in the input dtype so the
    # backward matmuls ride the bf16 MXU pass when training in bf16.
    delta = jnp.sum(g.astype(jnp.float32) * o.astype(jnp.float32), axis=-1,
                    keepdims=True)  # [BH, Tq, 1]
    do = g.astype(qf.dtype)

    dq_kernel = functools.partial(_dq_kernel, sm_scale=sm_scale,
                                  block_k=block_k, true_t=true_t,
                               masked=(true_t != kf.shape[1]))
    dq = pl.pallas_call(
        dq_kernel,
        grid=(BH, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct(qf.shape, qf.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(qf, kf, vf, do, lse, delta)

    dkv_kernel = functools.partial(_dkv_kernel, sm_scale=sm_scale,
                                   block_k=block_k, true_t=true_t,
                               masked=(true_t != kf.shape[1]))
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(BH, nkv, nq),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(kf.shape, kf.dtype),
            jax.ShapeDtypeStruct(vf.shape, vf.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(qf, kf, vf, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# differentiable core on padded [BH, T, d]
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _flash_core(qf, kf, vf, block_q, block_k, sm_scale, true_t, interpret):
    o, _ = _flash_fwd(qf, kf, vf, block_q, block_k, sm_scale, true_t,
                      interpret)
    return o


def _flash_core_fwd(qf, kf, vf, block_q, block_k, sm_scale, true_t,
                    interpret):
    o, lse = _flash_fwd(qf, kf, vf, block_q, block_k, sm_scale, true_t,
                        interpret)
    return o, (qf, kf, vf, o, lse)


def _flash_core_bwd(block_q, block_k, sm_scale, true_t, interpret, res, g):
    return _flash_bwd(res, g, block_q, block_k, sm_scale, true_t, interpret)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def _pad_axis(x, axis, multiple):
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad), n


def _pick_block(t: int, target: int) -> int:
    """Largest power-of-two block <= target that keeps t's padding small.
    Prefers a block that divides t exactly (no padding pass at all)."""
    b = target
    while b > 128 and t % b != 0:
        b //= 2
    return max(b, 128)


def flash_attention(q, k, v, block_q: int | None = None,
                    block_k: int | None = None,
                    min_tokens: int | None = None,
                    interpret: bool | None = None):
    """Self-attention [B, H, T, d] -> [B, H, T, d]; differentiable.

    Dispatches to the Pallas kernel on TPU for T >= min_tokens; XLA
    otherwise. Ragged T is zero-padded with padded *keys* masked out
    inside the kernel. Any head dim is accepted: the kernel blocks over
    tokens only and takes the full head dim per block (legal for any d;
    the MXU pads lanes internally at zero HBM cost).
    """
    if interpret is None:
        interpret = INTERPRET
    if min_tokens is None:
        min_tokens = DEFAULT_MIN_TOKENS
    on_tpu = _HAS_PALLAS and jax.default_backend() in ("tpu", "axon")
    if (not (on_tpu or interpret)) or q.shape[-2] < min_tokens:
        return _xla_attention(q, k, v)

    B, H, T, d = q.shape
    sm_scale = 1.0 / math.sqrt(d)
    if block_q is None:
        # v5e autotune (scripts/flash_autotune.py, bench_history.json
        # flash_autotune_r3): bq=1024 beats bq=512 at every measured
        # shape — fwd+bwd 7.41 vs 7.90 ms (T=4096 d64), 11.9 vs 12.3
        # (T=8192), 39.4 vs 41.0 (T=16384). bk=2048 is a wash vs 1024.
        # Round-4 extended sweep (bench_history.json
        # flash_autotune_r4_extended): f32 (T=4096/16384, d=64) and
        # bf16 d=128 all pick bq=1024 too (or tie within 1.3%), so the
        # default generalizes beyond the original bf16/d<=64 arms.
        # Other TPU generations remain unmeasured — correctness is
        # block-size-independent (padding+masking), so override via
        # block_q= if profiling says so on your hardware.
        block_q = _pick_block(T, 1024)
    if block_k is None:
        block_k = _pick_block(T, 1024)

    qp, _ = _pad_axis(q, 2, block_q)
    kp, true_t = _pad_axis(k, 2, block_k)
    vp, _ = _pad_axis(v, 2, block_k)

    qf = qp.reshape(B * H, qp.shape[2], d)
    kf = kp.reshape(B * H, kp.shape[2], d)
    vf = vp.reshape(B * H, vp.shape[2], d)

    out = _flash_core(qf, kf, vf, block_q, block_k, sm_scale, true_t,
                      interpret)
    return out.reshape(B, H, qp.shape[2], d)[:, :, :T]


def _flash_pallas(qf, kf, vf, block_q, block_k, sm_scale, interpret=False):
    """Back-compat shim on flattened [BH, T, d] tensors (tests)."""
    return _flash_core(qf, kf, vf, block_q, block_k, sm_scale,
                       kf.shape[1], interpret)
