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

Honest scope note: inside a single jit, XLA already fuses elementwise
chains, so this kernel targets the cases where the chain is broken —
across custom_vjp/scan boundaries or when the combine is the only
consumer of a remat'd activation. It is opt-in (``INTERPRET``/TPU gated,
XLA fallback otherwise) and its measured sampler delta is recorded in
bench_history.json rather than assumed.
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


def _xla_axby(x, f, a, b):
    ax = a.reshape(a.shape + (1,) * (x.ndim - 1)).astype(jnp.float32)
    bx = b.reshape(b.shape + (1,) * (x.ndim - 1)).astype(jnp.float32)
    return (ax * x.astype(jnp.float32)
            + bx * f.astype(jnp.float32)).astype(x.dtype)


def _pick_block(n: int) -> int | None:
    """Largest multiple-of-128 divisor of n, capped at _MAX_BLOCK."""
    if n % 128 != 0:
        return None
    bn = n
    while bn > _MAX_BLOCK:
        if bn % 2 != 0:
            return None
        bn //= 2
    return bn if bn % 128 == 0 else None


def _axby_kernel(a_ref, b_ref, x_ref, f_ref, o_ref):
    a = a_ref[0, 0]
    b = b_ref[0, 0]
    o_ref[:] = (a * x_ref[:].astype(jnp.float32)
                + b * f_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _axby_pallas(xf, ff, a2, b2, block_n, interpret):
    B, N = xf.shape
    return pl.pallas_call(
        _axby_kernel,
        grid=(B, N // block_n),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_n), lambda i, j: (i, j)),
            pl.BlockSpec((1, block_n), lambda i, j: (i, j)),
        ],
        out_specs=pl.BlockSpec((1, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct(xf.shape, xf.dtype),
        interpret=interpret,
    )(a2, b2, xf, ff)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_axby(x, f, a, b, interpret=None):
    """out = a[batch]·x + b[batch]·f, f32 math, output in x.dtype.

    x, f: [B, ...]; a, b: [B]. Differentiable in all four tensor args.
    """
    return _axby_impl(x, f, a, b, interpret)


def _axby_impl(x, f, a, b, interpret):
    if interpret is None:
        interpret = INTERPRET
    on_tpu = _HAS_PALLAS and jax.default_backend() in ("tpu", "axon")
    n = 1
    for s in x.shape[1:]:
        n *= s
    block_n = _pick_block(n) if (on_tpu or interpret) else None
    if block_n is None:
        return _xla_axby(x, f, a, b)
    B = x.shape[0]
    xf = x.reshape(B, n)
    ff = f.reshape(B, n)
    a2 = a.reshape(B, 1).astype(jnp.float32)
    b2 = b.reshape(B, 1).astype(jnp.float32)
    out = _axby_pallas(xf, ff, a2, b2, block_n, interpret)
    return out.reshape(x.shape)


def _axby_fwd(x, f, a, b, interpret):
    return _axby_impl(x, f, a, b, interpret), (x, f, a, b)


def _axby_bwd(interpret, res, g):
    x, f, a, b = res
    gf32 = g.astype(jnp.float32)
    red = tuple(range(1, x.ndim))
    ashape = a.reshape(a.shape + (1,) * (x.ndim - 1))
    bshape = b.reshape(b.shape + (1,) * (x.ndim - 1))
    dx = (ashape.astype(jnp.float32) * gf32).astype(x.dtype)
    df = (bshape.astype(jnp.float32) * gf32).astype(f.dtype)
    da = jnp.sum(gf32 * x.astype(jnp.float32), axis=red).astype(a.dtype)
    db = jnp.sum(gf32 * f.astype(jnp.float32), axis=red).astype(b.dtype)
    return dx, df, da, db


fused_axby.defvjp(_axby_fwd, _axby_bwd)


def denoise_combine(x, f, c_skip, c_out, interpret=None):
    """D = c_skip·x + c_out·f (the Karras denoiser epilogue)."""
    return fused_axby(x, f, c_skip, c_out, interpret)


def euler_update(x, f, c_skip, c_out, t, t_next, interpret=None):
    """Fused denoise + Euler ODE step:
    x' = x + (t_next − t)/t · (x − D),  D = c_skip·x + c_out·f.
    Folds to a·x + b·f with a = 1 + r(1 − c_skip), b = −r·c_out."""
    r = (t_next - t) / t
    a = 1.0 + r * (1.0 - c_skip)
    b = -r * c_out
    return fused_axby(x, f, a, b, interpret)
