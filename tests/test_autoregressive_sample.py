"""Latent autoregressive rollout tests."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from diffsci_tpu.models import KarrasModelConfig
from diffsci_tpu.models.karras.ensemble import (EnsembleKarrasModel,
                                                EnsembleKarrasModelConfig)
from diffsci_tpu.models.karras.autoregressive import (
    autoregressive_sample, frames_to_window, window_to_frames)


def test_window_frame_roundtrip():
    frames = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 8, 2))
    window = frames_to_window(frames)
    assert window.shape == (8, 8, 6)
    back = window_to_frames(window, 3)
    np.testing.assert_allclose(back, frames)


class CondNet(nn.Module):
    @nn.compact
    def __call__(self, x, t=None, y=None, train=False):
        if y is not None:
            yc = y["y"] if isinstance(y, dict) else y
            yc = jnp.broadcast_to(yc, x.shape[:1] + yc.shape[-3:])
            x = jnp.concatenate([x, yc], axis=-1)
        h = nn.Conv(8, (3, 3), padding="SAME")(x)
        return nn.Conv(1, (3, 3), padding="SAME")(nn.silu(h))


@pytest.mark.slow
def test_autoregressive_rollout_shapes():
    base = KarrasModelConfig.from_edm(loss_metric="mse")
    config = EnsembleKarrasModelConfig.from_karras_config(base)
    model = EnsembleKarrasModel(CondNet(), config, conditional=True)
    H = W = 8
    cond_time = 2
    y = {"y": jnp.zeros((H, W, cond_time))}
    variables = model.init(jax.random.PRNGKey(0), (2, H, W, 1),
                           {"y": jnp.zeros((2, H, W, cond_time))})
    out = autoregressive_sample(
        model, variables, jax.random.PRNGKey(1), nsamples=2,
        latent_shape=(H, W, 1), nsteps_forecast=3, cond_time=cond_time,
        nsteps_diffusion=5, y=y, y_already_encoded=True,
        return_intermediate=True)
    assert out["forecasts"].shape == (3, 2, H, W, 1)
    assert out["final_forecast"].shape == (2, H, W, 1)
    assert out["intermediate_latent"].shape == (3, 2, H, W, 1)
    assert np.isfinite(np.asarray(out["forecasts"])).all()
    # original y untouched
    np.testing.assert_allclose(y["y"], 0.0)


@pytest.mark.slow
def test_autoregressive_rollout_batched():
    base = KarrasModelConfig.from_edm(loss_metric="mse")
    config = EnsembleKarrasModelConfig.from_karras_config(base)
    model = EnsembleKarrasModel(CondNet(), config, conditional=True)
    H = W = 8
    y = {"y": jnp.zeros((H, W, 2))}
    variables = model.init(jax.random.PRNGKey(0), (2, H, W, 1),
                           {"y": jnp.zeros((2, H, W, 2))})
    out = autoregressive_sample(
        model, variables, jax.random.PRNGKey(1), nsamples=3,
        latent_shape=(H, W, 1), nsteps_forecast=2, cond_time=2,
        nsteps_diffusion=4, y=y, y_already_encoded=True,
        maximum_batch_size=2)
    assert out["forecasts"].shape == (2, 3, H, W, 1)
    assert out["final_forecast"].shape == (3, H, W, 1)
