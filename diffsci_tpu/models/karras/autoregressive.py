"""Latent-space autoregressive forecasting rollout.

TPU-native redesign of the reference LatentSpaceAutoregressive
(reference diffsci/models/karras/autoregressivesample.py:27-286): encode the
conditioning ONCE (the VAE encode samples — re-encoding would change the
conditioning, the pitfall documented at autoregressivesample.py:1-13),
diffusion-sample each forecast step in latent space, slide the conditioning
window over the latent predictions, decode everything at the end in one
batched call.

Channels-last: the conditioning window y['y'] is [*, H, W, cond_time * C];
the rollout keeps a [cond_time, H, W, C] frame buffer and flattens it back
with a transpose (a reshape in this layout).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from diffsci_tpu.utils import get_minibatch_sizes


def frames_to_window(frames: jnp.ndarray) -> jnp.ndarray:
    """[T, *spatial, C] frame buffer -> [*spatial, T*C] channel window."""
    T = frames.shape[0]
    C = frames.shape[-1]
    spatial = frames.shape[1:-1]
    moved = jnp.moveaxis(frames, 0, -2)  # [*spatial, T, C]
    return moved.reshape(spatial + (T * C,))


def window_to_frames(window: jnp.ndarray, cond_time: int) -> jnp.ndarray:
    """Inverse of frames_to_window."""
    spatial = window.shape[:-1]
    C = window.shape[-1] // cond_time
    frames = window.reshape(spatial + (cond_time, C))
    return jnp.moveaxis(frames, -2, 0)


def autoregressive_sample(model, variables, key,
                          nsamples: int,
                          latent_shape,
                          nsteps_forecast: int,
                          cond_time: int,
                          nsteps_diffusion: int = 50,
                          y: Optional[dict] = None,
                          y_already_encoded: bool = False,
                          guidance: float = 1.0,
                          maximum_batch_size: int | None = None,
                          return_intermediate: bool = False,
                          return_in_latent: bool = False) -> dict[str, Any]:
    """Autoregressive latent rollout (autoregressivesample.py:27-213).

    ``latent_shape`` is channels-last without batch, e.g. (H, W, C).
    ``y['y']`` is the unbatched conditioning window [*spatial, cond_time*C]
    (in pixel space unless ``y_already_encoded``).
    """
    if maximum_batch_size is not None:
        results = []
        for bs in get_minibatch_sizes(nsamples, maximum_batch_size):
            key, sub = jax.random.split(key)
            results.append(autoregressive_sample(
                model, variables, sub, bs, latent_shape, nsteps_forecast,
                cond_time, nsteps_diffusion, y, y_already_encoded, guidance,
                None, return_intermediate, return_in_latent))
        out = {"forecasts": jnp.concatenate(
            [r["forecasts"] for r in results], axis=1)}
        for k in ("final_forecast", "final_forecast_latent"):
            if k in results[0]:
                out[k] = jnp.concatenate([r[k] for r in results], axis=0)
        if return_intermediate and "intermediate_latent" in results[0]:
            out["intermediate_latent"] = jnp.concatenate(
                [r["intermediate_latent"] for r in results], axis=1)
        return out

    if y is None or "y" not in y:
        raise ValueError("y['y'] must be provided")
    y = dict(y)

    # encode the conditioning ONCE (autoregressivesample.py:94-106,215-238)
    key, kenc = jax.random.split(key)
    if not y_already_encoded and model.encode_y:
        dummy_shape = (1,) + tuple(y["y"].shape[:-1]) + (1,)
        dummy_x = jnp.zeros(dummy_shape, jnp.float32)
        _, y_encoded, _ = model.encode(variables, dummy_x, y, key=kenc)
        y = dict(y)
        y.update(y_encoded if isinstance(y_encoded, dict) else
                 {"y": y_encoded})
        if y["y"].shape[0] == 1 and y["y"].ndim == len(latent_shape) + 1:
            y["y"] = y["y"][0]

    C = latent_shape[-1]
    frames = window_to_frames(y["y"], cond_time)  # [T, *sp, C_lat]

    forecasts = []
    for step in range(nsteps_forecast):
        key, ksamp = jax.random.split(key)
        pred = model.sample(
            variables, ksamp, nsamples, tuple(latent_shape), y=y,
            guidance=guidance, nsteps=nsteps_diffusion,
            is_latent_shape=True, return_in_latent_space=True)
        forecasts.append(pred)
        if step < nsteps_forecast - 1:
            # slide: drop the oldest frame, append sample 0's prediction
            # (the reference conditions all samples on sample 0's rollout,
            # autoregressivesample.py:139-145)
            frames = jnp.concatenate([frames[1:], pred[0][None]], axis=0)
            y = dict(y)
            y["y"] = frames_to_window(frames)

    forecasts_latent = jnp.stack(forecasts, axis=0)  # [F, B, *latent]
    if return_in_latent:
        return {"forecasts": forecasts_latent,
                "final_forecast_latent": forecasts_latent[-1]}

    # decode all at once (autoregressivesample.py:190-205)
    F, B = forecasts_latent.shape[:2]
    flat = forecasts_latent.reshape((F * B,) + tuple(latent_shape))
    decoded = model.decode(variables, flat, y)
    forecasts_pixel = decoded.reshape((F, B) + decoded.shape[1:])
    result = {"forecasts": forecasts_pixel,
              "final_forecast": forecasts_pixel[-1]}
    if return_intermediate:
        result["intermediate_latent"] = forecasts_latent
    return result
