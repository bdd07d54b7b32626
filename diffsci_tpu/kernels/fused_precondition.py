"""Fused EDM-preconditioning elementwise kernel (SURVEY §7 kernel 3).

The denoiser combine D = c_skip(σ)·x + c_out(σ)·F and the Euler update
x' = x + dt·(x − D)/t both reduce to the same primitive with per-batch
scalars folded on the host:

    out = a[b]·x + b[b]·f          (a, b: [B] scalars)

    combine:  a = c_skip,              b = c_out
    euler:    a = 1 + r·(1 − c_skip),  b = −r·c_out,   r = (t_next − t)/t

so ONE Pallas kernel serves both (reference preconditioning math:
diffsci/models/karras/preconditioners.py:30-53 applied in
karrasmodule.py's denoiser + integrators.py:29-35).

MEASURED OUTCOME (TPU v5e, 64-batch 18-NFE PUNetG sampler, recorded in
bench_history.json): the naive broadcast combine leaves ~1.5-1.7x on the
table for C=1 channels-last images, because XLA lays the [B,H,W,1]
elementwise ops out with the unit channel dim padded to 128 lanes.
Working on a flat [B, N] view fixes that: at N not divisible by 128 the
flat *XLA* fallback implementation already captures the win (125.7 ->
72.3 ms at 28x28 — XLA keeps the flat layout), while at 128-divisible N
XLA folds the reshape back into the padded layout and the win needs the
Pallas kernel (123.1 -> 82.6 ms at 32x32; the flat XLA impl measures
124.7 ms there). The dispatch below therefore uses the kernel whenever
the [rows, 128] view tiles, and the flat XLA path otherwise — both arms
beat the naive combine.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

INTERPRET = False

_MAX_BLOCK = 256 * 1024  # elements per block (1MB f32) — well under VMEM


def _norm_coeff(c, batch):
    """Accept scalar / [1] / [B] / [B,1,...] coefficients; return [B] f32
    (the same shapes bcast_right tolerates in the unfused paths)."""
    c = jnp.asarray(c, jnp.float32).reshape(-1)
    return jnp.broadcast_to(c, (batch,))


def _xla_axby(x, f, a, b):
    B = x.shape[0]
    ax = _norm_coeff(a, B).reshape((B,) + (1,) * (x.ndim - 1))
    bx = _norm_coeff(b, B).reshape((B,) + (1,) * (x.ndim - 1))
    return (ax * x.astype(jnp.float32)
            + bx * f.astype(jnp.float32)).astype(x.dtype)


def _coeff_grad(gf32, val, coeff, batch, reduce_axes):
    """Gradient of a broadcast per-batch coefficient: sum the cotangent
    against the tensor and fold back to the coefficient's own shape
    (scalar / [1] coefficients were broadcast over the batch)."""
    coeff = jnp.asarray(coeff)
    d = jnp.sum(gf32 * val.astype(jnp.float32), axis=reduce_axes)  # [B]
    if coeff.size != batch:
        d = jnp.sum(d, keepdims=coeff.ndim > 0)
    return d.reshape(coeff.shape).astype(coeff.dtype)


def _flat_dispatch(tensors, coeffs, kernel, xla_fallback, interpret):
    """Shared TPU dispatch for per-batch-scalar linear combinations:
    run ``kernel`` over a [B, rows, 128] view when it tiles, else the
    broadcast XLA fallback. tensors share x's shape; coeffs are
    normalized to [B] f32 SMEM operands."""
    x = tensors[0]
    if interpret is None:
        interpret = INTERPRET
    on_tpu = _HAS_PALLAS and jax.default_backend() in ("tpu", "axon")
    n = 1
    for s in x.shape[1:]:
        n *= s
    B = x.shape[0]
    block_r = _pick_rows(n) if (on_tpu or interpret) else None
    if block_r is None:
        # Flat [B, N] view: this is the arm that was benchmarked (125.7 ->
        # 72.3 ms at 28x28) — XLA keeps the flat layout, avoiding the
        # 128-lane padding of the original broadcast shape (e.g. [B,H,W,1]).
        flat = (B, n)
        out = xla_fallback(*[t.reshape(flat) for t in tensors], *coeffs)
        return out.reshape(x.shape)
    view = (B, n // 128, 128)
    spec = pl.BlockSpec((1, block_r, 128), lambda i, j: (i, j, 0))
    out = pl.pallas_call(
        kernel,
        grid=(B, (n // 128) // block_r),
        in_specs=([pl.BlockSpec(memory_space=pltpu.SMEM)] * len(coeffs)
                  + [spec] * len(tensors)),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(view, x.dtype),
        interpret=interpret,
    )(*[_norm_coeff(c, B) for c in coeffs],
      *[t.reshape(view) for t in tensors])
    return out.reshape(x.shape)


def _pick_rows(n: int) -> int | None:
    """View the flat per-item vector as [rows, 128] and pick a row-block
    that satisfies TPU tiling: the whole `rows` (block dim == array dim is
    always legal) when it fits VMEM, else the largest multiple-of-8
    divisor under the cap. None -> XLA fallback."""
    if n % 128 != 0:
        return None
    rows = n // 128
    max_rows = _MAX_BLOCK // 128
    if rows <= max_rows:
        return rows
    best = None
    for r in range(8, max_rows + 1, 8):
        if rows % r == 0:
            best = r
    return best


def _axby_kernel(a_ref, b_ref, x_ref, f_ref, o_ref):
    # a/b: whole [B] arrays resident in SMEM (tiny); index by batch
    # grid position. Data blocks are [1, R, 128] slices of the
    # [B, rows, 128] view — trailing (R, 128) satisfies TPU tiling.
    i = pl.program_id(0)
    a = a_ref[i]
    b = b_ref[i]
    o_ref[:] = (a * x_ref[:].astype(jnp.float32)
                + b * f_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_axby(x, f, a, b, interpret=None):
    """out = a[batch]·x + b[batch]·f, f32 math, output in x.dtype.

    x, f: [B, ...]; a, b: [B]. Differentiable in all four tensor args.
    """
    return _axby_impl(x, f, a, b, interpret)


def _axby_impl(x, f, a, b, interpret):
    return _flat_dispatch(
        (x, f), (a, b), _axby_kernel,
        lambda x, f, a, b: _xla_axby(x, f, a, b), interpret)


def _axby_fwd(x, f, a, b, interpret):
    return _axby_impl(x, f, a, b, interpret), (x, f, a, b)


def _axby_bwd(interpret, res, g):
    x, f, a, b = res
    B = x.shape[0]
    gf32 = g.astype(jnp.float32)
    red = tuple(range(1, x.ndim))
    bc = (B,) + (1,) * (x.ndim - 1)
    dx = (_norm_coeff(a, B).reshape(bc) * gf32).astype(x.dtype)
    df = (_norm_coeff(b, B).reshape(bc) * gf32).astype(f.dtype)
    return (dx, df, _coeff_grad(gf32, x, a, B, red),
            _coeff_grad(gf32, f, b, B, red))


fused_axby.defvjp(_axby_fwd, _axby_bwd)


def denoise_combine(x, f, c_skip, c_out, interpret=None):
    """D = c_skip·x + c_out·f (the Karras denoiser epilogue)."""
    return fused_axby(x, f, c_skip, c_out, interpret)


def euler_update(x, f, c_skip, c_out, t, t_next, interpret=None):
    """Fused denoise + Euler ODE step:
    x' = x + (t_next − t)/t · (x − D),  D = c_skip·x + c_out·f.
    Folds to a·x + b·f with a = 1 + r(1 − c_skip), b = −r·c_out.

    Provided for custom sampling loops that call the raw network and
    want the whole Karras-ODE Euler step in one pass. The stock
    integrators (ops/integrators.py) are generic over an rhs closure and
    do NOT use this; their sampler already gets the combine win through
    denoise_combine inside get_denoiser."""
    r = (t_next - t) / t
    a = 1.0 + r * (1.0 - c_skip)
    b = -r * c_out
    return fused_axby(x, f, a, b, interpret)


# ---------------------------------------------------------------------------
# 3-term variant: out = a·x + b·f + c·g (DDPM/DDIM steps)
# ---------------------------------------------------------------------------

def _xla_lincomb3(x, f, g, a, b, c):
    B = x.shape[0]
    bc = (B,) + (1,) * (x.ndim - 1)
    return ((_norm_coeff(a, B).reshape(bc) * x.astype(jnp.float32)
             + _norm_coeff(b, B).reshape(bc) * f.astype(jnp.float32)
             + _norm_coeff(c, B).reshape(bc) * g.astype(jnp.float32))
            .astype(x.dtype))


def _lincomb3_kernel(a_ref, b_ref, c_ref, x_ref, f_ref, g_ref, o_ref):
    i = pl.program_id(0)
    o_ref[:] = (a_ref[i] * x_ref[:].astype(jnp.float32)
                + b_ref[i] * f_ref[:].astype(jnp.float32)
                + c_ref[i] * g_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_lincomb3(x, f, g, a, b, c, interpret=None):
    """out = a[batch]·x + b[batch]·f + c[batch]·g, f32 math, x.dtype out.

    The whole family of discrete diffusion updates (DDPM type-1/2, DDIM
    with noise injection) has this shape with per-batch scalar
    coefficients; one fused pass avoids 3-4 lane-padded elementwise ops
    per sampler step on C=1 channels-last tensors."""
    return _lincomb3_impl(x, f, g, a, b, c, interpret)


def _lincomb3_impl(x, f, g, a, b, c, interpret):
    return _flat_dispatch(
        (x, f, g), (a, b, c), _lincomb3_kernel,
        lambda x, f, g, a, b, c: _xla_lincomb3(x, f, g, a, b, c),
        interpret)


def _lincomb3_fwd(x, f, g, a, b, c, interpret):
    return _lincomb3_impl(x, f, g, a, b, c, interpret), (x, f, g, a, b, c)


def _lincomb3_bwd(interpret, res, grad):
    x, f, g, a, b, c = res
    B = x.shape[0]
    gf32 = grad.astype(jnp.float32)
    red = tuple(range(1, x.ndim))
    bc = (B,) + (1,) * (x.ndim - 1)

    return ((_norm_coeff(a, B).reshape(bc) * gf32).astype(x.dtype),
            (_norm_coeff(b, B).reshape(bc) * gf32).astype(f.dtype),
            (_norm_coeff(c, B).reshape(bc) * gf32).astype(g.dtype),
            _coeff_grad(gf32, x, a, B, red),
            _coeff_grad(gf32, f, b, B, red),
            _coeff_grad(gf32, g, c, B, red))


fused_lincomb3.defvjp(_lincomb3_fwd, _lincomb3_bwd)
