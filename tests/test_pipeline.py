"""Pipeline parallelism (parallel/pipeline.py): the GPipe-style block
pipeline must be numerically identical to the plain sequential forward,
forward AND backward, alone and composed with data parallelism.

Beyond parity: the reference's only distributed strategy is replicated
DDP (SURVEY.md §2.5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsci_tpu.models.nets import DiffusionTransformer
from diffsci_tpu.parallel import make_mesh
from diffsci_tpu.parallel.pipeline import (make_dit_pipeline,
                                           merge_dit_variables,
                                           shard_stacked_params,
                                           split_dit_variables,
                                           stack_block_params)


def _build(nblocks=4, nembed=32, B=8):
    model = DiffusionTransformer(nembed=nembed, nheads=2, nblocks=nblocks,
                                 patch_size=4, nchannels=1)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 16, 16, 1))
    t = jnp.linspace(0.1, 1.0, B)
    variables = model.init(jax.random.PRNGKey(1), x, t)
    return model, variables, x, t


@pytest.mark.slow
def test_dit_param_tree_unchanged():
    """The setup-style refactor (embed/head methods) must keep the exact
    auto-names the compact version produced, so checkpoints restore.
    (The Fourier projection lives in the 'buffers' collection, as before.)"""
    model, variables, x, t = _build(nblocks=2)
    assert sorted(variables["params"].keys()) == [
        "Dense_0", "Dense_1", "Dense_2", "Dense_3", "Dense_4",
        "block_0", "block_1"]
    assert "GaussianFourierProjection_0" in variables["buffers"]
    out = model.apply(variables, x, t)
    assert out.shape == x.shape


@pytest.mark.slow
def test_split_merge_roundtrip():
    model, variables, x, t = _build(nblocks=4)
    rest, stacked, names = split_dit_variables(variables, 4)
    assert jax.tree.leaves(stacked)[0].shape[0] == 4
    rebuilt = merge_dit_variables(rest, stacked, names)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b),
                 variables, rebuilt)


@pytest.mark.parametrize("mesh_cfg,n_micro", [
    ((("stage",), (8,)), 4),          # pure pipeline, 8 stages
    ((("data", "stage"), (2, 4)), 2),  # dp2 x pp4
])
@pytest.mark.slow
def test_pipeline_forward_matches_sequential(mesh_cfg, n_micro):
    axes, shape = mesh_cfg
    mesh = make_mesh(8, axes=axes, shape=shape)
    model, variables, x, t = _build(nblocks=8)
    ref = model.apply(variables, x, t)

    data_axis = "data" if "data" in axes else None
    forward, _ = make_dit_pipeline(model, mesh, n_micro=n_micro,
                                   data_axis=data_axis)
    rest, stacked, _ = split_dit_variables(variables, model.nblocks)
    stacked = shard_stacked_params(stacked, mesh)
    out = jax.jit(forward)(rest, stacked, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.slow
def test_pipeline_backward_matches_sequential():
    """Grads through the scan+ppermute schedule == grads of the plain
    forward, for both the stacked block params and the embed/head rest."""
    mesh = make_mesh(8, axes=("stage",), shape=(8,))
    model, variables, x, t = _build(nblocks=8, B=4)
    names = [f"block_{i}" for i in range(8)]
    forward, _ = make_dit_pipeline(model, mesh, n_micro=2)
    rest, stacked, _ = split_dit_variables(variables, 8)
    rest_params = rest["params"]
    buffers = rest["buffers"]

    def loss_pp(rest_params, stacked):
        out = forward({"params": rest_params, "buffers": buffers},
                      stacked, x, t)
        return jnp.mean(out ** 2)

    def loss_seq(params):
        out = model.apply({"params": params, "buffers": buffers}, x, t)
        return jnp.mean(out ** 2)

    g_rest, g_stacked = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(
        rest_params, stacked)
    g_ref = jax.jit(jax.grad(loss_seq))(variables["params"])
    g_ref_stacked, g_ref_rest = stack_block_params(g_ref, names)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        (g_rest, g_stacked), (g_ref_rest, g_ref_stacked))


@pytest.mark.slow
def test_pipeline_train_step_updates():
    """One SGD step on (rest, stacked) under jit with sharded placements:
    the loss goes down across steps."""
    mesh = make_mesh(8, axes=("data", "stage"), shape=(2, 4))
    model, variables, x, t = _build(nblocks=4, B=8)
    forward, _ = make_dit_pipeline(model, mesh, n_micro=2,
                                   data_axis="data")
    rest, stacked, _ = split_dit_variables(variables, 4)
    stacked = shard_stacked_params(stacked, mesh)
    buffers = rest["buffers"]
    rest_params = rest["params"]
    target = jnp.zeros_like(x)

    @jax.jit
    def step(rest_params, stacked):
        def loss(rest_params, stacked):
            out = forward({"params": rest_params, "buffers": buffers},
                          stacked, x, t)
            return jnp.mean((out - target) ** 2)
        val, (gr, gs) = jax.value_and_grad(loss, argnums=(0, 1))(
            rest_params, stacked)
        rest_params = jax.tree.map(lambda p, g: p - 0.1 * g,
                                   rest_params, gr)
        stacked = jax.tree.map(lambda p, g: p - 0.1 * g, stacked, gs)
        return val, rest_params, stacked

    l0, rest_params, stacked = step(rest_params, stacked)
    l1, rest_params, stacked = step(rest_params, stacked)
    assert float(l1) < float(l0)


@pytest.mark.slow
def test_pipeline_edge_cases_and_errors():
    """n_micro=1 (degenerate schedule) still matches; indivisible block
    or batch counts raise."""
    mesh = make_mesh(8, axes=("stage",), shape=(8,))
    model, variables, x, t = _build(nblocks=8, B=4)
    forward, _ = make_dit_pipeline(model, mesh, n_micro=1)
    rest, stacked, _ = split_dit_variables(variables, 8)
    ref = model.apply(variables, x, t)
    out = jax.jit(forward)(rest, stacked, x, t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)

    # 6 blocks over 8 stages: indivisible
    model6, variables6, x6, t6 = _build(nblocks=6, B=4)
    fwd6, _ = make_dit_pipeline(model6, mesh, n_micro=2)
    rest6, stacked6, _ = split_dit_variables(variables6, 6)
    with pytest.raises(ValueError, match="not divisible"):
        fwd6(rest6, stacked6, x6, t6)

    # batch 4 into 3 microbatches: indivisible
    fwd3, _ = make_dit_pipeline(model, mesh, n_micro=3)
    with pytest.raises(ValueError, match="not divisible"):
        fwd3(rest, stacked, x, t)


@pytest.mark.slow
def test_pipeline_parallel_sampling():
    """Diffusion sampling with the denoiser running under pipeline
    parallelism: the EDM backward propagation composes with the
    shard_map pipeline (scan-of-scans), matching single-device sampling.
    (<=4 steps: longer untrained rollouts amplify float reassociation —
    docs/design.md Honest benchmarking.)"""
    from diffsci_tpu.ops.schedulers import EDMScheduler

    mesh = make_mesh(8, axes=("data", "stage"), shape=(2, 4))
    model, variables, x, t = _build(nblocks=4, B=8)
    forward, _ = make_dit_pipeline(model, mesh, n_micro=2,
                                   data_axis="data")
    rest, stacked, _ = split_dit_variables(variables, 4)
    stacked = shard_stacked_params(stacked, mesh)

    def score_from(denoise):
        def score(xt, sigma):
            sig = jnp.asarray(sigma) * jnp.ones((xt.shape[0],))
            sig_b = sig.reshape((-1,) + (1,) * (xt.ndim - 1))
            d = denoise(xt, sig)
            return (d - xt) / (sig_b ** 2)
        return score

    sched = EDMScheduler()
    key = jax.random.PRNGKey(7)
    x0 = jax.random.normal(jax.random.PRNGKey(8), (8, 16, 16, 1)) \
        * sched.maximum_scale

    out_seq = sched.propagate_backward(
        key, x0, score_from(lambda xt, tt: model.apply(variables, xt, tt)),
        nsteps=4)
    out_pp = jax.jit(lambda x0: sched.propagate_backward(
        key, x0,
        score_from(lambda xt, tt: forward(rest, stacked, xt, tt)),
        nsteps=4))(x0)
    np.testing.assert_allclose(np.asarray(out_pp), np.asarray(out_seq),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_pipeline_apply_generic_blocks():
    """pipeline_apply is model-agnostic: a plain parameterized residual
    block (no flax module machinery) pipelines identically."""
    from diffsci_tpu.parallel.pipeline import pipeline_apply

    mesh = make_mesh(8, axes=("stage",), shape=(8,))
    D = 16
    key = jax.random.PRNGKey(0)
    ws = jax.random.normal(key, (8, D, D)) * 0.1        # 8 blocks
    bs = jax.random.normal(jax.random.PRNGKey(1), (8, D)) * 0.1
    stacked = {"w": ws, "b": bs}
    x = jax.random.normal(jax.random.PRNGKey(2), (12, 5, D))
    te = jax.random.normal(jax.random.PRNGKey(3), (12, D))

    def block_apply(p, tok, emb):
        return tok + jnp.tanh(tok @ p["w"] + p["b"] + emb[:, None])

    ref = x
    for i in range(8):
        ref = block_apply({"w": ws[i], "b": bs[i]}, ref, te)

    out = jax.jit(lambda s, x, te: pipeline_apply(
        block_apply, s, x, te, mesh, n_micro=4))(stacked, x, te)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
