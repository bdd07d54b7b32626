"""Pallas kernel parity tests (interpret mode on CPU; the real kernel runs
on TPU via the same code path)."""

import pytest
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


def test_flash_attention_ragged_tokens_and_unaligned_head_dim():
    """T not a block multiple AND d not lane-aligned: padded keys must be
    masked out and zero head-lanes sliced away (both previously forced an
    XLA fallback)."""
    B, H, T, d = 1, 2, 300, 64
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, T, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, T, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, T, d))
    out = fa.flash_attention(q, k, v, min_tokens=256, interpret=True)
    ref = fa._xla_attention(q, k, v)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_flash_attention_grad_matches_xla():
    """backend='flash' must train: custom-VJP grads vs XLA autodiff."""
    B, H, T, d = 1, 2, 256, 64

    def make(i):
        return jax.random.normal(jax.random.PRNGKey(i), (B, H, T, d))

    q, k, v = make(0), make(1), make(2)

    def loss_flash(q, k, v):
        y = fa.flash_attention(q, k, v, min_tokens=256, interpret=True)
        return jnp.sum(jnp.sin(y) * y)

    def loss_xla(q, k, v):
        y = fa._xla_attention(q, k, v)
        return jnp.sum(jnp.sin(y) * y)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, r, nm in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(a, r, rtol=1e-3, atol=1e-4,
                                   err_msg=f"d{nm}")


@pytest.mark.slow
def test_flash_attention_grad_ragged():
    """Grads with T-padding: padded keys/queries must contribute nothing."""
    B, H, T, d = 1, 1, 300, 128

    def make(i):
        return jax.random.normal(jax.random.PRNGKey(i), (B, H, T, d))

    q, k, v = make(3), make(4), make(5)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, min_tokens=256,
                                          interpret=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(fa._xla_attention(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, r, nm in zip(gf, gr, "qkv"):
        np.testing.assert_allclose(a, r, rtol=1e-3, atol=1e-4,
                                   err_msg=f"d{nm}")


def test_flash_attention_bf16():
    B, H, T, d = 1, 1, 256, 128
    q = jax.random.normal(jax.random.PRNGKey(0), (B, H, T, d),
                          dtype=jnp.float32).astype(jnp.bfloat16)
    out = fa.flash_attention(q, q, q, min_tokens=256, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = fa._xla_attention(q.astype(jnp.float32), q.astype(jnp.float32),
                            q.astype(jnp.float32))
    np.testing.assert_allclose(out.astype(jnp.float32), ref,
                               rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_attention_module_flash_backend_trains():
    """MultiHeadAttention(backend='flash') end-to-end: forward parity with
    the xla backend and finite grads through the module."""
    from diffsci_tpu.models.nets import attention

    x = jax.random.normal(jax.random.PRNGKey(6), (2, 300, 64))
    mod_x = attention.MultiHeadAttention(num_heads=2, backend="xla")
    vs = mod_x.init(jax.random.PRNGKey(0), x)
    y_x = mod_x.apply(vs, x)

    mod_f = attention.MultiHeadAttention(num_heads=2, backend="flash")
    import diffsci_tpu.kernels.flash_attention as fa_mod
    fa_mod.INTERPRET = True
    old_mt = fa_mod.DEFAULT_MIN_TOKENS
    fa_mod.DEFAULT_MIN_TOKENS = 256
    try:
        y_f = mod_f.apply(vs, x)

        def loss(vs):
            return jnp.sum(mod_f.apply(vs, x) ** 2)

        g = jax.grad(loss)(vs)
    finally:
        fa_mod.INTERPRET = False
        fa_mod.DEFAULT_MIN_TOKENS = old_mt
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_x),
                               rtol=2e-4, atol=2e-5)
    assert all(jnp.all(jnp.isfinite(leaf)) for leaf in jax.tree.leaves(g))


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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# fused EDM preconditioning (kernels/fused_precondition.py)
# ---------------------------------------------------------------------------
from diffsci_tpu.kernels import fused_precondition as fp  # noqa: E402


@pytest.mark.slow
def test_fused_axby_forward_parity():
    for shape in ((4, 8, 8, 4), (2, 16, 16), (3, 5, 5, 5, 8)):
        x = jax.random.normal(jax.random.PRNGKey(0), shape)
        f = jax.random.normal(jax.random.PRNGKey(1), shape)
        a = jax.random.normal(jax.random.PRNGKey(2), (shape[0],))
        b = jax.random.normal(jax.random.PRNGKey(3), (shape[0],))
        out = fp.fused_axby(x, f, a, b, True)
        ref = fp._xla_axby(x, f, a, b)
        np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6,
                                   err_msg=str(shape))


def test_fused_axby_grad_parity():
    shape = (2, 8, 8, 4)
    x = jax.random.normal(jax.random.PRNGKey(4), shape)
    f = jax.random.normal(jax.random.PRNGKey(5), shape)
    a = jnp.array([0.5, -1.25])
    b = jnp.array([2.0, 0.75])

    def loss_k(x, f, a, b):
        return jnp.sum(jnp.tanh(fp.fused_axby(x, f, a, b, True)))

    def loss_r(x, f, a, b):
        return jnp.sum(jnp.tanh(fp._xla_axby(x, f, a, b)))

    gk = jax.grad(loss_k, argnums=(0, 1, 2, 3))(x, f, a, b)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3))(x, f, a, b)
    for got, ref, nm in zip(gk, gr, ("x", "f", "a", "b")):
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6,
                                   err_msg=f"d{nm}")


def test_euler_update_matches_unfused():
    """Fused denoise+Euler == explicit D then x + dt*(x-D)/t."""
    shape = (3, 8, 8, 2)
    x = jax.random.normal(jax.random.PRNGKey(6), shape)
    f = jax.random.normal(jax.random.PRNGKey(7), shape)
    c_skip = jnp.array([0.3, 0.5, 0.9])
    c_out = jnp.array([1.2, 0.4, -0.6])
    t = jnp.array([10.0, 5.0, 1.0])
    t_next = jnp.array([7.0, 3.0, 0.5])

    out = fp.euler_update(x, f, c_skip, c_out, t, t_next, True)

    def br(v):
        return v.reshape(v.shape + (1,) * (x.ndim - 1))
    D = br(c_skip) * x + br(c_out) * f
    ref = x + br((t_next - t) / t) * (x - D)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_karras_model_fused_precondition_parity():
    """KarrasModel(fused_precondition=True) denoiser == plain path."""
    from diffsci_tpu.models import KarrasModel, KarrasModelConfig
    from diffsci_tpu.models.nets.mlp import MLPUncond

    net = MLPUncond(dim=4, hidden_dims=(32,))
    plain = KarrasModel(net, KarrasModelConfig.from_edm())
    fused = KarrasModel(net, KarrasModelConfig.from_edm(),
                        fused_precondition=True)
    x = jax.random.normal(jax.random.PRNGKey(8), (4, 4))
    sigma = jnp.array([0.1, 1.0, 5.0, 80.0])
    vs = plain.init(jax.random.PRNGKey(0), (4, 4))

    d_plain, _ = plain.get_denoiser(vs, x, sigma)
    fp.INTERPRET = True
    try:
        d_fused, _ = fused.get_denoiser(vs, x, sigma)
    finally:
        fp.INTERPRET = False
    np.testing.assert_allclose(np.asarray(d_fused), np.asarray(d_plain),
                               rtol=1e-5, atol=1e-6)


def test_fused_axby_coefficient_shapes():
    """Scalar / [1] / [B,1,..] coefficients must work like bcast_right in
    the unfused paths (regression: reshape(B) rejected them), including
    grads with cotangents matching the primal coefficient shapes."""
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 16))
    f = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 16))
    aB = jnp.arange(1.0, 5.0)
    ref = fp._xla_axby(x, f, aB, aB)
    for a in (jnp.float32(2.0), jnp.ones((1,)) * 2.0,
              jnp.full((4, 1, 1), 2.0)):
        out = fp.fused_axby(x, f, a, a, True)
        expect = 2.0 * x + 2.0 * f
        np.testing.assert_allclose(out, expect, rtol=1e-6, atol=1e-6)
        da = jax.grad(lambda a: jnp.sum(fp.fused_axby(x, f, a, a, True)),
                      argnums=0)(a)
        assert da.shape == jnp.shape(a)
    assert ref.shape == x.shape


def test_fused_lincomb3_parity_and_grads():
    shape = (3, 8, 16)
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    f = jax.random.normal(jax.random.PRNGKey(1), shape)
    g = jax.random.normal(jax.random.PRNGKey(2), shape)
    a = jnp.array([0.5, -1.0, 2.0])
    b = jnp.array([1.5, 0.25, -0.5])
    c = jnp.array([0.1, 0.2, 0.3])
    out = fp.fused_lincomb3(x, f, g, a, b, c, True)
    ref = fp._xla_lincomb3(x, f, g, a, b, c)
    np.testing.assert_allclose(out, ref, rtol=1e-6, atol=1e-6)

    gk = jax.grad(lambda *ar: jnp.sum(jnp.tanh(
        fp.fused_lincomb3(*ar, True))), argnums=tuple(range(6)))(
        x, f, g, a, b, c)
    gr = jax.grad(lambda *ar: jnp.sum(jnp.tanh(
        fp._xla_lincomb3(*ar))), argnums=tuple(range(6)))(x, f, g, a, b, c)
    for got, ref_, nm in zip(gk, gr, "xfgabc"):
        np.testing.assert_allclose(got, ref_, rtol=1e-5, atol=1e-6,
                                   err_msg=f"d{nm}")


def test_ddpm_step_matches_unfused_formula():
    """The fused DDPM/DDIM updates must equal the reference formulas
    written with broadcast elementwise ops."""
    from diffsci_tpu.models import ddpm as dd

    x = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, 1))
    key = jax.random.PRNGKey(4)
    t = jnp.float32(500.0)

    def fake_eps(xx, tt):
        return jnp.tanh(xx) * 0.5

    for integ in (dd.ClassicalDDPMIntegratorType1(
                      dd.ClassicalDDPMScheduler()),
                  dd.ClassicalDDPMIntegratorType2(
                      dd.ClassicalDDPMScheduler()),
                  dd.DDPMIntegrator(dd.ClassicalDDPMScheduler())):
        out = integ.step_backward(key, x, t, fake_eps, 1000)
        # reference formula, broadcast style
        tb = jnp.broadcast_to(t, (4,))
        t_ = tb.reshape(4, 1, 1, 1)
        sig = integ.noise_injector(tb, 1000).reshape(4, 1, 1, 1)
        ca = integ.scheduler.calpha(t_, 1000)
        eps = fake_eps(x, tb)
        noise = jax.random.normal(key, x.shape, x.dtype)
        if isinstance(integ, dd.ClassicalDDPMIntegrator):
            al = integ.scheduler.alpha(t_, 1000)
            ref = ((x - (1 - al) / jnp.sqrt(1 - ca) * eps) / jnp.sqrt(al)
                   + sig * noise)
        else:
            cap = integ.scheduler.calpha(t_ - 1, 1000)
            x0 = (x - eps * jnp.sqrt(1 - ca)) / jnp.sqrt(ca)
            ref = (jnp.sqrt(cap) * x0
                   + jnp.sqrt(jax.nn.relu(1 - cap - sig ** 2)) * eps
                   + sig * noise)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=1e-5,
                                   err_msg=type(integ).__name__)
