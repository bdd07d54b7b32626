"""Ensemble / autoregressive / replay / L2-SP tests, mirroring the
reference's mock-based strategy (tests/test_karras_autoregressive_loss.py,
test_karras_replay_loss.py, test_karras_freeze_layers.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from diffsci_tpu import data
from diffsci_tpu.models.karras.ensemble import (
    EnsembleKarrasModel, EnsembleKarrasModelConfig, scheduled_replay_weight,
    l2_sp_regularization, select_regularization_reference,
    make_ensemble_train_step)
from diffsci_tpu.models import (KarrasModelConfig, MLPUncond,
                                create_train_state)
from diffsci_tpu.models.karras.train import freeze_mask


def make_config(**kw):
    base = KarrasModelConfig.from_edm(loss_metric="mse")
    return EnsembleKarrasModelConfig.from_karras_config(base, **kw)


class CondNet(nn.Module):
    """Tiny conditional conv net for AR tests: channels-last images,
    conditioning dict with 'y' concatenated as channels."""
    out_channels: int = 1

    @nn.compact
    def __call__(self, x, t=None, y=None, train: bool = False):
        if y is not None:
            yc = y["y"] if isinstance(y, dict) else y
            x = jnp.concatenate([x, yc], axis=-1)
        h = nn.Conv(8, (3, 3), padding="SAME")(x)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding="SAME")(h)


# ---------------------------------------------------------------------------
# ensemble loss
# ---------------------------------------------------------------------------
def test_ensemble_loss_reduces_to_single():
    """n_ensemble=1 must match the base loss exactly."""
    config = make_config()
    model = EnsembleKarrasModel(MLPUncond(dim=3, hidden_dims=[8]), config)
    variables = model.init(jax.random.PRNGKey(0), (4, 3))
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (4, 3))
    sigma = jnp.ones((4,))
    l1, _ = model.loss_fn(variables, key, x, sigma, n_ensemble=1)
    l2, _ = model.loss_fn(variables, key, x, sigma)
    np.testing.assert_allclose(l1, l2)


def test_ensemble_loss_vectorized_runs():
    config = make_config()
    model = EnsembleKarrasModel(MLPUncond(dim=3, hidden_dims=[8]), config)
    variables = model.init(jax.random.PRNGKey(0), (4, 3))
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (4, 3))
    sigma = jnp.ones((4,)) * 0.5
    loss, _ = model.loss_fn(variables, key, x, sigma, n_ensemble=5)
    assert jnp.isfinite(loss)


@pytest.mark.slow
def test_crps_loss_with_ensemble():
    config = make_config(loss_metric="crps")
    model = EnsembleKarrasModel(MLPUncond(dim=3, hidden_dims=[8]), config)
    variables = model.init(jax.random.PRNGKey(0), (4, 3))
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (4, 3))
    sigma = jnp.ones((4,)) * 0.5
    loss, _ = model.loss_fn(variables, key, x, sigma, n_ensemble=4)
    assert jnp.isfinite(loss)


# ---------------------------------------------------------------------------
# autoregressive loss (mock-based, mirrors
# test_karras_autoregressive_loss.py:19-124)
# ---------------------------------------------------------------------------
def ar_setup(steps=3, channels=1, window=2, monkeypatch=None, record=None):
    config = make_config(loss_metric="mse")
    config.autoregressive_loss_steps = steps
    model = EnsembleKarrasModel(CondNet(out_channels=channels), config,
                                conditional=True)
    B, H, W = 2, 8, 8
    x = jnp.ones((B, steps, H, W, channels)) * jnp.arange(
        1, steps + 1, dtype=jnp.float32).reshape(1, steps, 1, 1, 1)
    y = {"y": jnp.zeros((B, H, W, window * channels))}
    variables = model.init(jax.random.PRNGKey(0), (B, H, W, channels), y)

    if monkeypatch is not None:
        def fake_sample(variables, key, nsamples, shape, y=None, **kw):
            if record is not None:
                record.append(jax.tree.map(lambda v: v, y))
            return jnp.full((nsamples,) + tuple(shape), 99.0)
        monkeypatch.setattr(model, "sample", fake_sample)
    return model, variables, x, y


def test_ar_window_slides_correctly(monkeypatch):
    """Conditioning windows slide: each generated prediction is shifted
    into the last channel slot of y['y'] (autoregressiveloss.py:177-221)."""
    record = []
    model, variables, x, y = ar_setup(steps=3, monkeypatch=monkeypatch,
                                      record=record)
    loss, _, step_losses = model.autoregressive_loss_fn(
        variables, jax.random.PRNGKey(1), x, y, train=False)
    assert len(step_losses) == 3
    assert len(record) == 2  # sampled for steps 0,1 (not after the last)
    # first sample call sees the original zeros window
    np.testing.assert_allclose(record[0]["y"], 0.0)
    # second call: window slid once -> [zeros, 99]
    np.testing.assert_allclose(record[1]["y"][..., :1], 0.0)
    np.testing.assert_allclose(record[1]["y"][..., 1:], 99.0)
    # original y untouched
    np.testing.assert_allclose(y["y"], 0.0)


def test_ar_weights_normalized(monkeypatch):
    model, variables, x, y = ar_setup(steps=3, monkeypatch=monkeypatch)
    model.config.autoregressive_loss_weights = [1.0, 2.0, 3.0]
    w = model._autoregressive_step_weights(3)
    np.testing.assert_allclose(w, [1 / 6, 2 / 6, 3 / 6], rtol=1e-6)
    with pytest.raises(ValueError):
        model.config.autoregressive_loss_weights = [1.0]
        model._autoregressive_step_weights(3)


def test_non_ar_path_never_calls_ar(monkeypatch):
    """(test_karras_autoregressive_loss.py:84-124)"""
    model, variables, x, y = ar_setup(steps=1)
    assert not model.has_autoregressive_loss()
    called = []
    monkeypatch.setattr(model, "autoregressive_loss_fn",
                        lambda *a, **k: called.append(1))
    loss, _, aux = model.training_loss(
        variables, jax.random.PRNGKey(0), (x[:, 0], y), n_ensemble=1)
    assert not called
    assert aux == {}


def test_ar_split_formats():
    m = EnsembleKarrasModel
    x5 = jnp.zeros((2, 3, 8, 8, 1))
    t = m._split_autoregressive_targets(x5, 3)
    assert len(t) == 3 and t[0].shape == (2, 8, 8, 1)
    x4 = jnp.zeros((2, 8, 8, 6))
    t = m._split_autoregressive_targets(x4, 3)
    assert len(t) == 3 and t[0].shape == (2, 8, 8, 2)
    with pytest.raises(ValueError):
        m._split_autoregressive_targets(jnp.zeros((2, 8, 8, 5)), 3)


@pytest.mark.slow
def test_ar_end_to_end_real_sampling():
    """Small but real: AR loss with actual diffusion sampling inside."""
    config = make_config(loss_metric="mse")
    config.autoregressive_loss_steps = 2
    config.autoregressive_loss_diffusion_steps = 5
    model = EnsembleKarrasModel(CondNet(), config, conditional=True)
    B, H, W = 2, 8, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, 2, H, W, 1))
    y = {"y": jnp.zeros((B, H, W, 2))}
    variables = model.init(jax.random.PRNGKey(0), (B, H, W, 1), y)
    loss, _, step_losses = model.autoregressive_loss_fn(
        variables, jax.random.PRNGKey(1), x, y, train=False)
    assert jnp.isfinite(loss)
    assert len(step_losses) == 2


# ---------------------------------------------------------------------------
# replay loss (mirrors test_karras_replay_loss.py:25-80)
# ---------------------------------------------------------------------------
def test_replay_schedule_interpolation():
    sched = {"enabled": True, "type": "linear", "start_weight": 1.0,
             "end_weight": 0.0, "num_steps": 10}
    np.testing.assert_allclose(scheduled_replay_weight(sched, 1.0, 0), 1.0)
    np.testing.assert_allclose(scheduled_replay_weight(sched, 1.0, 5), 0.5)
    np.testing.assert_allclose(scheduled_replay_weight(sched, 1.0, 20), 0.0)
    const = {"enabled": True, "type": "constant", "start_weight": 0.7}
    np.testing.assert_allclose(scheduled_replay_weight(const, 1.0, 3), 0.7)
    off = {}
    np.testing.assert_allclose(scheduled_replay_weight(off, 0.3, 3), 0.3)
    cos = {"enabled": True, "type": "cosine", "start_weight": 1.0,
           "end_weight": 0.0, "num_steps": 10}
    np.testing.assert_allclose(scheduled_replay_weight(cos, 1.0, 5), 0.5,
                               atol=1e-6)


def test_replay_train_step_combines_losses(monkeypatch):
    config = make_config(replay_enabled=True, replay_loss_weight=0.5)
    model = EnsembleKarrasModel(MLPUncond(dim=2, hidden_dims=[8]), config)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (4, 2))

    # fake per-batch losses: finetune -> 2.0, replay -> 4.0
    def fake_training_loss(variables, key, batch, n_ensemble=1, train=True):
        # tie the fake loss to the params so grads exist under jit
        leaf = jax.tree.leaves(variables["params"])[0]
        return batch[0, 0] + 0.0 * jnp.sum(leaf), {}, {}
    monkeypatch.setattr(model, "training_loss", fake_training_loss)

    step_fn = make_ensemble_train_step(model, tx)
    batch = {"finetune": jnp.full((1, 2), 2.0),
             "replay": jnp.full((1, 2), 4.0)}
    state, metrics = step_fn(state, jax.random.PRNGKey(1), batch)
    np.testing.assert_allclose(metrics["train_loss"], 2.0 + 0.5 * 4.0)
    np.testing.assert_allclose(metrics["train_loss_finetune"], 2.0)
    np.testing.assert_allclose(metrics["train_loss_replay"], 4.0)


# ---------------------------------------------------------------------------
# L2-SP + freeze patterns (mirrors test_karras_freeze_layers.py)
# ---------------------------------------------------------------------------
def test_l2_sp_regularization():
    params = {"a": {"w": jnp.ones((2, 2))}, "b": {"w": jnp.zeros((3,))}}
    ref = select_regularization_reference(params, include_patterns=["a/*"])
    assert "b" not in ref
    # unchanged params -> zero reg
    np.testing.assert_allclose(
        l2_sp_regularization(params, ref, weight=1.0), 0.0)
    moved = {"a": {"w": jnp.ones((2, 2)) * 2.0}, "b": params["b"]}
    # sum (1)^2 over 4 elements / 4 = 1.0, weighted by 0.5
    np.testing.assert_allclose(
        l2_sp_regularization(moved, ref, weight=0.5), 0.5)
    np.testing.assert_allclose(
        l2_sp_regularization(moved, ref, weight=0.5, normalize=False), 2.0)


def test_l2_sp_in_train_step():
    config = make_config(
        pretrained_weight_regularization={"enabled": True, "weight": 10.0})
    model = EnsembleKarrasModel(MLPUncond(dim=2, hidden_dims=[8]), config)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (4, 2))
    ref = select_regularization_reference(state.params)
    step_fn = make_ensemble_train_step(model, tx, reg_reference=ref)
    ds = data.ZeroDataset(num_samples=16, shape=[2])
    xs = ds.sample(jax.random.PRNGKey(1))
    state, metrics = step_fn(state, jax.random.PRNGKey(2), xs[:8])
    assert "l2_sp" in metrics
    np.testing.assert_allclose(metrics["l2_sp"], 0.0, atol=1e-12)
    # after the step the params moved; the next step has positive reg
    state, metrics = step_fn(state, jax.random.PRNGKey(3), xs[8:])
    assert float(metrics["l2_sp"]) > 0.0


def test_freeze_mask_patterns():
    params = {"model": {"convin": {"kernel": jnp.ones((3,))},
                        "convout": {"kernel": jnp.ones((3,))}}}
    mask = freeze_mask(params, ["model/convin/*"])
    assert mask["model"]["convin"]["kernel"] is False
    assert mask["model"]["convout"]["kernel"] is True


def test_frozen_params_do_not_move():
    config = make_config()
    model = EnsembleKarrasModel(MLPUncond(dim=2, hidden_dims=[8]), config)
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), (4, 2),
        freeze_patterns=["model/Dense_0/*"])
    step_fn = make_ensemble_train_step(model, tx)
    ds = data.ZeroDataset(num_samples=16, shape=[2])
    xs = ds.sample(jax.random.PRNGKey(1))
    # copy to host before the step: the jitted step donates state buffers
    frozen_before = np.asarray(state.params["model"]["Dense_0"]["kernel"])
    other_before = np.asarray(state.params["model"]["Dense_1"]["kernel"])
    state, _ = step_fn(state, jax.random.PRNGKey(2), xs[:8])
    np.testing.assert_allclose(state.params["model"]["Dense_0"]["kernel"],
                               frozen_before)
    assert not np.allclose(state.params["model"]["Dense_1"]["kernel"],
                           other_before)
