"""Pallas kernel parity tests (interpret mode on CPU; the real kernel runs
on TPU via the same code path)."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from diffsci_tpu.kernels import flash_attention as fa


def test_flash_kernel_matches_xla_interpret():
    key = jax.random.PRNGKey(0)
    BH, T, d = 2, 256, 128
    q = jax.random.normal(key, (BH, T, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (BH, T, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (BH, T, d))
    sm_scale = 1.0 / math.sqrt(d)

    out = fa._flash_pallas(q, k, v, block_q=128, block_k=128,
                           sm_scale=sm_scale, interpret=True)
    ref = fa._xla_attention(q, k, v)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


def test_flash_attention_falls_back_on_cpu():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 512, 128))
    out = fa.flash_attention(q, q, q)
    ref = fa._xla_attention(q, q, q)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_flash_attention_small_tokens_uses_xla():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 1, 49, 64))
    out = fa.flash_attention(q, q, q)
    assert out.shape == q.shape


# ---------------------------------------------------------------------------
# fused norm + SiLU (kernels/fused_norm.py)
# ---------------------------------------------------------------------------
from diffsci_tpu.kernels import fused_norm  # noqa: E402


def _ref_norm_silu(x, w, b, kind, eps=1e-5):
    axes = tuple(range(1, x.ndim - 1))
    if kind == "ln":
        mean = jnp.mean(x, axis=axes, keepdims=True)
        var = jnp.mean(x * x, axis=axes, keepdims=True) - mean ** 2
        n = (x - mean) / jnp.sqrt(var + eps)
    else:
        ms = jnp.mean(x * x, axis=axes, keepdims=True)
        n = x / jnp.sqrt(ms + eps)
    return jax.nn.silu(n * w + b)


def test_fused_norm_silu_forward_parity():
    key = jax.random.PRNGKey(3)
    for kind in ("ln", "rms"):
        for shape in ((2, 7, 7, 64), (2, 4, 4, 4, 128), (3, 13, 160)):
            C = shape[-1]
            x = jax.random.normal(key, shape) * 2.0 + 0.3
            w = jax.random.normal(jax.random.PRNGKey(4), (C,)) * 0.2 + 1.0
            b = jax.random.normal(jax.random.PRNGKey(5), (C,)) * 0.1
            out = fused_norm.norm_silu(x, w, b, kind, interpret=True)
            ref = _ref_norm_silu(x, w, b, kind)
            np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-6,
                                       err_msg=f"{kind} {shape}")


def test_fused_norm_silu_grad_parity():
    key = jax.random.PRNGKey(6)
    shape = (2, 6, 6, 64)
    C = shape[-1]
    x = jax.random.normal(key, shape)
    w = jnp.ones((C,)) * 1.1
    b = jnp.ones((C,)) * -0.05
    for kind in ("ln", "rms"):
        def loss_k(x, w, b):
            y = fused_norm.norm_silu(x, w, b, kind, interpret=True)
            return jnp.sum(y * jnp.cos(y))

        def loss_r(x, w, b):
            y = _ref_norm_silu(x, w, b, kind)
            return jnp.sum(y * jnp.cos(y))

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(x, w, b)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(x, w, b)
        for a, r, nm in zip(gk, gr, "xwb"):
            np.testing.assert_allclose(a, r, rtol=5e-5, atol=5e-6,
                                       err_msg=f"{kind} d{nm}")


def test_fused_norm_silu_bf16():
    x = (jax.random.normal(jax.random.PRNGKey(7), (2, 8, 8, 64))
         .astype(jnp.bfloat16))
    w = jnp.ones((64,), jnp.bfloat16)
    b = jnp.zeros((64,), jnp.bfloat16)
    out = fused_norm.norm_silu(x, w, b, "rms", interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _ref_norm_silu(x.astype(jnp.float32), w.astype(jnp.float32),
                         b.astype(jnp.float32), "rms")
    np.testing.assert_allclose(out.astype(jnp.float32), ref,
                               rtol=2e-2, atol=2e-2)


def test_groupnorm_module_fused_path_matches_plain(monkeypatch):
    """The flax module must produce identical results with the fused path
    engaged (interpret mode) and with the pure-JAX path."""
    from diffsci_tpu.models.nets import layers

    x = jax.random.normal(jax.random.PRNGKey(8), (2, 5, 5, 64))
    for cls, kind in ((layers.GroupLNorm, "ln"), (layers.GroupRMSNorm,
                                                  "rms")):
        plain = cls(64, 64, fuse_silu=True)
        vs = plain.init(jax.random.PRNGKey(0), x)
        y_plain = plain.apply(vs, x)
        monkeypatch.setattr(fused_norm, "INTERPRET", True)
        y_fused = plain.apply(vs, x)
        monkeypatch.setattr(fused_norm, "INTERPRET", False)
        np.testing.assert_allclose(np.asarray(y_fused),
                                   np.asarray(y_plain),
                                   rtol=2e-5, atol=2e-6, err_msg=kind)


def test_resnet_block_unchanged_output():
    """ResnetBlockC with fuse_silu norms (pure-JAX fallback on CPU) must
    match the reference-parity behavior pinned elsewhere; smoke the shape
    and grad path here."""
    from diffsci_tpu.models.nets import layers

    x = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 8, 16))
    te = jax.random.normal(jax.random.PRNGKey(10), (2, 8))
    block = layers.ResnetBlockC(16, 8)
    vs = block.init(jax.random.PRNGKey(0), x, te)
    y = block.apply(vs, x, te)
    assert y.shape == x.shape

    def loss(vs):
        return jnp.sum(block.apply(vs, x, te) ** 2)
    g = jax.grad(loss)(vs)
    assert all(jnp.all(jnp.isfinite(leaf)) for leaf in jax.tree.leaves(g))
