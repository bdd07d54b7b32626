"""Fused per-channel norm + SiLU Pallas kernel (forward + backward).

The ResnetBlockC hot path is norm -> SiLU -> conv (reference
commonlayers.py:824-831), and PUNetG instantiates its norms with
num_groups == num_channels (punetg.py:236-261 via ResnetBlockC defaults):
each channel is normalized over the spatial extent only. The train step is
HBM-bandwidth-bound (docs/design.md roofline: ~94% of 819 GB/s), so the
win here is byte traffic, not FLOPs:

- XLA lowers norm+SiLU as a reduce over x plus an elementwise fusion that
  re-reads x: >= 2 HBM reads + 1 write of the activation per norm, and its
  autodiff of the chain re-reads the activation several more times.
- This kernel keeps a [BB, *spatial, C_tile] slab VMEM-resident: 1 read +
  1 write in the forward; the custom-VJP backward does 2 reads (g, x) +
  1 write (dx) with the tiny [B, C] stats reused from the forward.

The kernel operates on the activation IN ITS NATIVE N-D LAYOUT. An
earlier version flattened spatial dims to [B, S, C] first; with TPU tiled
layouts that reshape is a physical relayout, so XLA inserted a full copy
on both sides of the kernel and erased the byte win. BlockSpecs here use
block == full spatial extent, which the Mosaic sublane rule allows for
non-multiple-of-8 dims.

Both 'ln' (mean-subtracted, torch GroupNorm semantics) and 'rms' variants
are supported — together they cover both norms of every PUNetG resblock.
Stats are computed in f32 regardless of input dtype.

Falls back to the pure-JAX path (models/nets/layers.py _GroupNormBase)
when the slab would not fit VMEM or when not on TPU. The Pallas path
assumes per-device execution (single chip or under shard_map).

MEASURED OUTCOME (TPU v5e, 2026-08, recorded per the round-1 review):
standalone, this kernel beats XLA's lowering decisively on the
train-relevant fwd+bwd path (e.g. (256,784,64) bf16: 967us vs 3343us;
(256,196,128): 330us vs 880us; (256,49,256): 277us vs 525us). But INSIDE
the PUNetG train step it is a net 2x LOSS (bench 9.3k imgs/s vs 20.3k):
XLA assigns batch-minor layouts like {0,3,2,1:T(8,128)(2,1)} to
convolution operands, while Pallas custom calls constrain operands and
results to row-major — so every call site pays two full-tensor relayout
copies, which outweigh the fused-norm byte savings in a conv-sandwiched
network. The kernel is therefore OFF by default and opt-in via
DIFFSCI_TPU_FUSED_NORM=1 for norm-adjacent-to-matmul architectures
(DiT/ConVit-style), where operand layouts already agree.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-(grid step) VMEM budget for the x slab. The backward kernel holds
# several f32 temporaries of the slab plus double-buffered in/out blocks,
# so keep this well under 16 MB / 8.
_MAX_SLAB_BYTES = 1024 * 1024
_LANE = 128

# Test hook: run the kernels in interpreter mode (lets CPU tests execute
# the actual Pallas path). Also makes `engaged` return True off-TPU.
INTERPRET = False


def engaged(x_shape, num_groups: int, num_channels: int,
            spatial: bool) -> bool:
    """True when the Pallas path should run for this shape on this
    backend (TPU with the opt-in env set, or anywhere under the INTERPRET
    test hook). See the module docstring for why this is opt-in."""
    if INTERPRET:
        pass
    elif not (jax.default_backend() == "tpu"
              and os.environ.get("DIFFSCI_TPU_FUSED_NORM") == "1"):
        return False
    return supported(x_shape, num_groups, num_channels, True, spatial)


def _pick_c_tile(C: int) -> int:
    if C % _LANE == 0:
        return _LANE
    return C  # sub-lane-width channels: one (padded) tile


def _spatial_size(shape) -> int:
    S = 1
    for d in shape[1:-1]:
        S *= d
    return S


def _slab_bytes(S: int, c_tile: int) -> int:
    return S * c_tile * 4  # f32 accumulation


def _pick_batch_block(B: int, S: int, CT: int) -> int:
    bb = max(1, _MAX_SLAB_BYTES // max(1, _slab_bytes(S, CT)))
    while B % bb:
        bb -= 1
    return bb


def _silu_and_grad(u):
    s = jax.nn.sigmoid(u)
    return u * s, s * (1.0 + u * (1.0 - s))


def _slab_spec(shape, BB, CT):
    """BlockSpec for an activation [B, *sp, C]: block (BB, *sp, CT),
    2D grid (batch tile, channel tile)."""
    nsp = len(shape) - 2
    block = (BB,) + tuple(shape[1:-1]) + (CT,)

    def index_map(i, j):
        return (i,) + (0,) * nsp + (j,)

    return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)


def _stats_spec(ndim, BB, CT):
    """BlockSpec for stats [B, 1, ..., 1, C]."""
    nsp = ndim - 2
    block = (BB,) + (1,) * nsp + (CT,)

    def index_map(i, j):
        return (i,) + (0,) * nsp + (j,)

    return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)


def _wb_spec(CT):
    return pl.BlockSpec((1, CT), lambda i, j: (0, j),
                        memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------
def _fwd_kernel(x_ref, w_ref, b_ref, y_ref, mean_ref, rstd_ref,
                *, subtract_mean: bool, eps: float):
    x = x_ref[...].astype(jnp.float32)        # [BB, *sp, CT]
    axes = tuple(range(1, x.ndim - 1))
    if subtract_mean:
        # two-pass variance E[(x-mu)^2]: the block is already resident in
        # VMEM, so centering first costs no extra HBM traffic — and the
        # one-pass E[x^2]-mu^2 form cancels catastrophically when
        # |mu| >> std (post-attention activations lose ~3 digits).
        mean = jnp.mean(x, axis=axes, keepdims=True)
        xc = x - mean
        var = jnp.mean(xc * xc, axis=axes, keepdims=True)
    else:
        mean = jnp.zeros(mean_ref.shape, jnp.float32)
        var = jnp.mean(x * x, axis=axes, keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    n = (x - mean) * rstd
    u = n * w_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32)
    y, _ = _silu_and_grad(u)
    y_ref[...] = y.astype(y_ref.dtype)
    mean_ref[...] = mean
    rstd_ref[...] = rstd


def _fwd_call(x, w, b, subtract_mean, eps, interpret):
    B, C = x.shape[0], x.shape[-1]
    stats_shape = (B,) + (1,) * (x.ndim - 2) + (C,)
    CT = _pick_c_tile(C)
    BB = _pick_batch_block(B, _spatial_size(x.shape), CT)
    grid = (B // BB, C // CT)
    kernel = functools.partial(_fwd_kernel, subtract_mean=subtract_mean,
                               eps=eps)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[_slab_spec(x.shape, BB, CT), _wb_spec(CT), _wb_spec(CT)],
        out_specs=[_slab_spec(x.shape, BB, CT),
                   _stats_spec(x.ndim, BB, CT),
                   _stats_spec(x.ndim, BB, CT)],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(stats_shape, jnp.float32),
            jax.ShapeDtypeStruct(stats_shape, jnp.float32),
        ],
        interpret=interpret,
    )(x, w.reshape(1, C), b.reshape(1, C))


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------
def _bwd_kernel(g_ref, x_ref, mean_ref, rstd_ref, w_ref, b_ref,
                dx_ref, dw_ref, db_ref,
                *, subtract_mean: bool):
    g = g_ref[...].astype(jnp.float32)        # [BB, *sp, CT]
    x = x_ref[...].astype(jnp.float32)
    mean = mean_ref[...]                      # [BB, 1..1, CT]
    rstd = rstd_ref[...]
    w = w_ref[0].astype(jnp.float32)
    b = b_ref[0].astype(jnp.float32)
    axes = tuple(range(1, x.ndim - 1))

    n = (x - mean) * rstd
    u = n * w + b
    _, dsilu = _silu_and_grad(u)
    gu = g * dsilu                            # dL/du
    dn = gu * w
    dn_n = jnp.mean(dn * n, axis=axes, keepdims=True)
    if subtract_mean:
        dn_mean = jnp.mean(dn, axis=axes, keepdims=True)
        dx = rstd * (dn - dn_mean - n * dn_n)
    else:
        dx = rstd * (dn - n * dn_n)
    dx_ref[...] = dx.astype(dx_ref.dtype)
    dw_ref[...] = jnp.sum(gu * n, axis=axes, keepdims=True)
    db_ref[...] = jnp.sum(gu, axis=axes, keepdims=True)


def _bwd_call(g, x, mean, rstd, w, b, subtract_mean, interpret):
    B, C = x.shape[0], x.shape[-1]
    stats_shape = (B,) + (1,) * (x.ndim - 2) + (C,)
    CT = _pick_c_tile(C)
    BB = _pick_batch_block(B, _spatial_size(x.shape), CT)
    grid = (B // BB, C // CT)
    kernel = functools.partial(_bwd_kernel, subtract_mean=subtract_mean)
    dx, dw_p, db_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            _slab_spec(x.shape, BB, CT),
            _slab_spec(x.shape, BB, CT),
            _stats_spec(x.ndim, BB, CT),
            _stats_spec(x.ndim, BB, CT),
            _wb_spec(CT),
            _wb_spec(CT),
        ],
        out_specs=[
            _slab_spec(x.shape, BB, CT),
            _stats_spec(x.ndim, BB, CT),
            _stats_spec(x.ndim, BB, CT),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct(stats_shape, jnp.float32),
            jax.ShapeDtypeStruct(stats_shape, jnp.float32),
        ],
        interpret=interpret,
    )(g, x, mean, rstd, w.reshape(1, C), b.reshape(1, C))
    red = tuple(range(0, x.ndim - 1))
    return dx, dw_p.sum(axis=red), db_p.sum(axis=red)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _norm_silu_op(x, w, b, subtract_mean, eps, interpret):
    y, _, _ = _fwd_call(x, w, b, subtract_mean, eps, interpret)
    return y


def _norm_silu_fwd(x, w, b, subtract_mean, eps, interpret):
    y, mean, rstd = _fwd_call(x, w, b, subtract_mean, eps, interpret)
    return y, (x, mean, rstd, w, b)


def _norm_silu_bwd(subtract_mean, eps, interpret, res, g):
    x, mean, rstd, w, b = res
    dx, dw, db = _bwd_call(g, x, mean, rstd, w, b, subtract_mean,
                           interpret)
    return dx, dw.astype(w.dtype), db.astype(b.dtype)


_norm_silu_op.defvjp(_norm_silu_fwd, _norm_silu_bwd)


def supported(x_shape, num_groups: int, num_channels: int,
              affine: bool, spatial: bool) -> bool:
    """Kernel engages for the per-channel-over-spatial norm family
    (num_groups == num_channels, the PUNetG configuration) on slabs that
    fit VMEM."""
    if not (affine and spatial and num_groups == num_channels):
        return False
    if len(x_shape) < 3:
        return False
    C = x_shape[-1]
    S = _spatial_size(x_shape)
    if C != num_channels or S < 2:
        return False
    return _slab_bytes(S, _pick_c_tile(C)) <= _MAX_SLAB_BYTES


def norm_silu(x, w, b, kind: str = "ln", eps: float = 1e-5,
              interpret: bool = False):
    """Fused silu(norm(x) * w + b) over channels-last x [B, *spatial, C],
    normalizing each channel over the spatial extent.

    kind: 'ln' subtracts the mean (torch GroupNorm semantics,
    commonlayers.py:441-494); 'rms' does not (commonlayers.py:332-384).
    Differentiable via a fused backward kernel.
    """
    return _norm_silu_op(x, w, b, kind == "ln", eps, interpret)
