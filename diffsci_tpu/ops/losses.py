"""Loss functions: elementwise metrics, Gaussian-weighted MSE, smooth
threshold-indicator, multi-space, and ensemble/CRPS losses.

Functional redesign of the reference's custom_losses.py (reference
diffsci/custom_losses.py:5-865). Channels-last; ensemble predictions carry
the ensemble axis at position 1: [B, E, *spatial, C]. Mask convention
follows the reference: mask == 1 marks *excluded* (known/invalid) elements,
losses weight by (1 - mask).

Vectorization notes: the reference loops over ensemble members for several
losses (custom_losses.py:547-556,714-726); here everything is a single
broadcasted expression, which XLA fuses into one kernel.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Sequence

import jax.numpy as jnp
import flax.linen as nn



# ---------------------------------------------------------------------------
# elementwise metrics (reduction='none' analogues)
# ---------------------------------------------------------------------------
def mse(pred, target):
    return (pred - target) ** 2


def huber(pred, target, delta: float = 1.0):
    """torch.nn.HuberLoss(reduction='none') semantics."""
    d = pred - target
    abs_d = jnp.abs(d)
    quad = 0.5 * d ** 2
    lin = delta * (abs_d - 0.5 * delta)
    return jnp.where(abs_d <= delta, quad, lin)


def masked_mean(loss, mask=None):
    """Mean over elements not excluded by the mask (mask==1 -> excluded)."""
    if mask is None:
        return jnp.mean(loss)
    keep = jnp.broadcast_to(1.0 - mask, loss.shape)
    return jnp.sum(loss * keep) / jnp.clip(jnp.sum(keep), 1.0)


# ---------------------------------------------------------------------------
# Gaussian-weighted MSE (custom_losses.py:5-94)
# ---------------------------------------------------------------------------
def gaussian_window(shape: Sequence[int], focus_radius: float) -> jnp.ndarray:
    """N-dim Gaussian weight mask over [-1, 1]^N coordinates, shaped
    [1, *shape, 1] for channels-last broadcasting."""
    sigma = focus_radius + 1e-8
    coords = [jnp.linspace(-1.0, 1.0, s) for s in shape]
    grids = jnp.meshgrid(*coords, indexing="ij")
    dist2 = sum(g ** 2 for g in grids)
    w = jnp.exp(-dist2 / (2 * sigma ** 2))
    return w.reshape((1,) + tuple(shape) + (1,))


@dataclasses.dataclass(frozen=True)
class GaussianWeightedMSELoss:
    """Center-focused MSE (custom_losses.py:5-94). Returns elementwise
    weighted squared error (no reduction)."""
    shape: tuple
    focus_radius: float

    def __call__(self, pred, target, mask=None):
        w = gaussian_window(self.shape, self.focus_radius)
        if pred.ndim == len(self.shape) + 3:  # ensemble [B, E, *sp, C]
            w = w[:, None]
        return (pred - target) ** 2 * w


# ---------------------------------------------------------------------------
# smooth threshold indicator (custom_losses.py:96-337)
# ---------------------------------------------------------------------------
@dataclasses.dataclass(frozen=True)
class MultiThresholdSmoothIndicatorLoss:
    """Smooth exceedance loss over multiple thresholds with BCE + FP penalty
    + intensity-weighted squared error. Handles masks internally and returns
    a scalar (custom_losses.py:263-296)."""
    thresholds: tuple = (0.5,)
    temperature: float = 10.0
    loss_type: str = "sigmoid"
    focus_weights: tuple | float | None = None
    background_weights: tuple | float | None = None
    fp_penalty: float = 1.0
    se_weight: float = 0.1
    aggregation: str = "mean"

    def __post_init__(self):
        t = self.thresholds
        if isinstance(t, (int, float)):
            object.__setattr__(self, "thresholds", (float(t),))
        else:
            object.__setattr__(self, "thresholds", tuple(t))

    def _weights(self, w, default):
        n = len(self.thresholds)
        if w is None:
            return (default,) * n
        if isinstance(w, (int, float)):
            return (float(w),) * n
        assert len(w) == n
        return tuple(w)

    def smooth_indicator(self, x, threshold):
        z = self.temperature * (x - threshold)
        if self.loss_type == "sigmoid":
            return nn.sigmoid(z)
        if self.loss_type == "tanh":
            return 0.5 * (1.0 + jnp.tanh(z))
        if self.loss_type == "gumbel":
            return nn.softmax(jnp.stack([jnp.zeros_like(z), z], -1),
                              axis=-1)[..., 1]
        raise ValueError(f"Unknown loss_type: {self.loss_type}")

    def _threshold_loss(self, pred, target, threshold, fw, bw, mask):
        eps = 1e-8
        ti = self.smooth_indicator(target, threshold)
        pi = self.smooth_indicator(pred, threshold)
        bce = -(ti * jnp.log(pi + eps) + (1 - ti) * jnp.log(1 - pi + eps))
        fp = (1 - ti) * pi * (self.fp_penalty - 1.0)
        ind = bce + fp
        wind = fw * ind * ti + bw * ind * (1 - ti)
        wse = (pred - target) ** 2 * (1.0 + ti)
        return masked_mean(wind, mask) + self.se_weight * masked_mean(wse, mask)

    def __call__(self, pred, target, mask=None):
        if pred.ndim == target.ndim + 1:  # ensemble: mean over members
            target = target[:, None]
            if mask is not None:
                mask = jnp.asarray(mask)[:, None] if mask.ndim == target.ndim - 1 \
                    else mask
        fws = self._weights(self.focus_weights, 2.0)
        bws = self._weights(self.background_weights, 0.1)
        losses = [self._threshold_loss(pred, target, th, fw, bw, mask)
                  for th, fw, bw in zip(self.thresholds, fws, bws)]
        stack = jnp.stack(losses)
        if self.aggregation == "mean":
            return jnp.mean(stack)
        if self.aggregation == "sum":
            return jnp.sum(stack)
        if self.aggregation == "max":
            return jnp.max(stack)
        raise ValueError(f"Unknown aggregation: {self.aggregation}")


# ---------------------------------------------------------------------------
# CRPS ensemble loss (custom_losses.py:759-865)
# ---------------------------------------------------------------------------
def crps_ensemble(pred, target, mask=None):
    """CRPS = mean|pred - target| - 0.5 * mean_{i,j}|pred_i - pred_j|.

    pred: [B, E, *spatial, C] (E may be 1), target: [B, *spatial, C].
    Returns scalar. Vectorized pairwise term (no python loops over E).
    """
    if pred.ndim == target.ndim:
        pred = pred[:, None]
    B, E = pred.shape[:2]
    feat_axes = tuple(range(2, pred.ndim))

    mae = jnp.mean(jnp.abs(pred - target[:, None]), axis=feat_axes)  # [B, E]
    mae = jnp.mean(mae, axis=1)  # [B]

    if E == 1:
        pairwise = jnp.zeros((B,), pred.dtype)
    else:
        flat = pred.reshape(B, E, -1)
        diff = jnp.abs(flat[:, :, None] - flat[:, None, :])  # [B, E, E, F]
        pmean = jnp.mean(diff, axis=3)  # [B, E, E]
        iu = jnp.triu_indices(E, k=1)
        pairwise = jnp.sum(pmean[:, iu[0], iu[1]], axis=1) / max(
            E * (E - 1) / 2, 1)

    crps = mae - 0.5 * pairwise  # [B]
    if mask is not None:
        # scale by the fraction of valid elements (custom_losses.py:846-852)
        numel = math.prod(target.shape[1:])
        keep = jnp.broadcast_to(1.0 - mask, target.shape)
        valid = jnp.clip(jnp.sum(keep, axis=tuple(range(1, target.ndim))), 1.0)
        crps = crps * (valid / numel)
    return jnp.mean(crps)


# ---------------------------------------------------------------------------
# loss registry + ensemble-aware scalar wrappers
# ---------------------------------------------------------------------------
def _elementwise_to_scalar(fn: Callable):
    """Wrap an elementwise loss into a mask-aware scalar reducer that also
    accepts ensemble predictions [B, E, ...] against [B, ...] targets."""
    def wrapped(pred, target, mask=None):
        if pred.ndim == target.ndim + 1:
            target = target[:, None]
            if mask is not None:
                mask = jnp.asarray(mask)
                mask = mask[:, None] if mask.ndim >= 1 and mask.shape[0] == pred.shape[0] else mask
        loss = fn(pred, target)
        return masked_mean(loss, mask)
    return wrapped


def make_loss_metric(loss_config: str | dict[str, Any],
                     spatial_shape=None, focus_radius=None):
    """Build the elementwise (or internally-reduced) loss from the config
    formats the reference supports (karrasmodule.py:510-567):

    - str: "mse" | "huber" | "weighted_gaussian" | "smoothed_indicator" |
      "crps"
    - dict single loss: {"huber": {"delta": ...}}, ...

    Returns (fn, reduces_internally): fn(pred, target, mask=None); when
    ``reduces_internally`` the fn returns a scalar with the mask already
    applied, else an elementwise tensor.
    """
    if isinstance(loss_config, dict) and "losses" not in loss_config:
        name = next(iter(loss_config.keys()))
        params = loss_config[name] or {}
    elif isinstance(loss_config, str):
        name, params = loss_config, {}
    else:
        raise ValueError(f"unsupported loss config: {loss_config!r}")

    if name == "mse":
        return (lambda p, t, mask=None: mse(p, t)), False
    if name == "huber":
        delta = params.get("delta", 1.0)
        return (lambda p, t, mask=None: huber(p, t, delta)), False
    if name == "weighted_gaussian":
        if spatial_shape is None or focus_radius is None:
            raise AttributeError(
                "config must have spatial_shape and focus_radius")
        gw = GaussianWeightedMSELoss(tuple(spatial_shape), focus_radius)
        return (lambda p, t, mask=None: gw(p, t)), False
    if name == "smoothed_indicator":
        if "thresholds" in params:
            params = dict(params)
            params["thresholds"] = tuple(params["thresholds"])
        return MultiThresholdSmoothIndicatorLoss(**params), True
    if name == "crps":
        return crps_ensemble, True
    raise ValueError(f"loss_type {name} not recognized")


class MultiSpaceLoss:
    """Weighted combination of losses evaluated in latent and/or pixel space
    (custom_losses.py:339-518). ``decode_fn`` maps latent -> pixel."""

    def __init__(self, loss_config: dict[str, Any],
                 decode_fn: Callable | None = None):
        self.decode_fn = decode_fn
        self.losses = []
        for spec in loss_config["losses"]:
            fn, internal = make_loss_metric(
                {spec["type"]: spec.get("params", {})})
            self.losses.append(dict(
                name=spec["name"], fn=fn, internal=internal,
                space=spec["space"], weight=spec.get("weight", 1.0),
                use_mask=spec.get("use_mask", True)))

    def compute_loss(self, denoiser_latent, target_latent,
                     target_pixel=None, mask_latent=None, mask_pixel=None):
        denoiser_pixel = None
        if any(s["space"] == "pixel" for s in self.losses):
            if self.decode_fn is None:
                raise ValueError("decode_fn required for pixel space losses")
            denoiser_pixel = self.decode_fn(denoiser_latent)
            if target_pixel is None:
                target_pixel = self.decode_fn(target_latent)

        values = {}
        total = 0.0
        for spec in self.losses:
            if spec["space"] == "latent":
                pred, target, mask = denoiser_latent, target_latent, mask_latent
            elif spec["space"] == "pixel":
                pred, target, mask = denoiser_pixel, target_pixel, mask_pixel
            else:
                raise ValueError(f"Unknown space: {spec['space']}")
            mask = mask if spec["use_mask"] else None
            if spec["internal"]:
                val = spec["fn"](pred, target, mask)
            else:
                val = masked_mean(spec["fn"](pred, target), mask)
            values[spec["name"]] = val
            total = total + spec["weight"] * val
        values["total"] = total
        return values
