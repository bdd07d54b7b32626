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
