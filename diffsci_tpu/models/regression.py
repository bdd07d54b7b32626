"""ForecastModel: deterministic (non-diffusion) latent forecasting baseline
— encode, predict with the model directly, decode.

TPU-native counterpart of the reference ForecastModule
(reference diffsci/models/regression/ForecastModule.py:29-782). Shares the
autoencoder protocol and loss plumbing with KarrasModel, minus the
diffusion process: the model maps conditioning directly to the target.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from diffsci_tpu.ops import losses as losses_lib
from diffsci_tpu.utils import get_minibatch_sizes


class ForecastModelConfig:
    """(ForecastModule.py:29-190)"""

    def __init__(self,
                 loss_metric: str | dict = "huber",
                 freeze_autoencoder: bool = True,
                 norm: float = 1.0,
                 spatial_shape=None,
                 focus_radius=None,
                 spatial_weight_map=None):
        self.loss_metric = loss_metric
        self.freeze_autoencoder = freeze_autoencoder
        self.norm = norm
        self.spatial_shape = spatial_shape
        self.focus_radius = focus_radius
        # per-pixel loss weighting, broadcast over batch/channels
        # (ForecastModule.py:490-498)
        self.spatial_weight_map = spatial_weight_map

    @classmethod
    def from_simple(cls, loss_metric: str = "huber", **kwargs):
        return cls(loss_metric=loss_metric, **kwargs)

    @classmethod
    def from_advanced(cls, loss_metric: dict, **kwargs):
        return cls(loss_metric=loss_metric, **kwargs)

    def export_description(self) -> dict[str, Any]:
        return dict(loss_metric=self.loss_metric,
                    freeze_autoencoder=self.freeze_autoencoder,
                    norm=self.norm)

    @classmethod
    def from_description(cls, description):
        return cls(**description)


class ForecastModel:
    """Deterministic forecaster (ForecastModule.py:193-782).

    model(x_cond, y) -> prediction in (latent) space; batches are
    (target, y[, mask]) with y['y'] holding the conditioning window.
    """

    def __init__(self, model, config: ForecastModelConfig,
                 conditional: bool = True, masked: bool = False,
                 autoencoder=None, autoencoder_conditional: bool = False,
                 encode_y: bool = False):
        self.model = model
        self.config = config
        self.conditional = conditional
        self.masked = masked
        self.autoencoder = autoencoder
        self.autoencoder_conditional = autoencoder_conditional
        self.encode_y = encode_y
        self.norm = config.norm
        self._loss_metric, self._loss_reduces = losses_lib.make_loss_metric(
            config.loss_metric, config.spatial_shape, config.focus_radius)

    @property
    def latent_model(self):
        return self.autoencoder is not None

    def init(self, key, y_example, x_shape=None):
        kp, kd = jax.random.split(key)
        return self.model.init({"params": kp, "dropout": kd},
                               y_example["y"] if isinstance(y_example, dict)
                               else y_example, y_example)

    # ------------------------------------------------------------------
    def encode(self, x, y=None, key=None):
        """(ForecastModule.py:391-425)"""
        if self.latent_model:
            if self.autoencoder_conditional:
                if self.encode_y:
                    x, y = self.autoencoder.encode(x, key=key, y=y)
                else:
                    x = self.autoencoder.encode(x, key=key, y=y)
            else:
                x = self.autoencoder.encode(x, key=key)
        return x / self.norm, y

    def decode(self, x, y=None):
        """(ForecastModule.py:427-454)"""
        x = x * self.norm
        if self.latent_model:
            if self.autoencoder_conditional:
                return self.autoencoder.decode(x, y=y)
            return self.autoencoder.decode(x)
        return x

    def forward(self, variables, y, train: bool = False, rngs=None):
        """Direct prediction from the conditioning
        (ForecastModule.py:502-523)."""
        yc = y["y"] if isinstance(y, dict) else y
        return self.model.apply(variables, yc, y, train=train, rngs=rngs)

    def loss_fn(self, variables, key, x, y=None, mask=None,
                train: bool = True):
        """(ForecastModule.py:456-500)"""
        kdrop, kenc = jax.random.split(key)
        x_latent, y = self.encode(x, y, key=kenc)
        rngs = {"dropout": kdrop} if train else None
        pred = self.forward(variables, y, train=train, rngs=rngs)
        if self._loss_reduces:
            return self._loss_metric(pred, x_latent, mask)
        raw = self._loss_metric(pred, x_latent, mask)
        if mask is not None:
            # forecast masks are 1=include (ForecastModule.py:469-488) —
            # the OPPOSITE of the Karras stack's 1=exclude convention —
            # and the mean stays over ALL elements, not just valid ones
            raw = raw * jnp.broadcast_to(mask, raw.shape)
        if self.config.spatial_weight_map is not None:
            w = jnp.asarray(self.config.spatial_weight_map)
            # [*spatial] -> [1, *spatial, 1] (channels-last analogue of
            # ForecastModule.py:490-498's [1, 1, H, W])
            w = w[None, ..., None]
            raw = raw * w
        return jnp.mean(raw)

    def predict(self, variables, y, return_latent: bool = False):
        """(ForecastModule.py:677-782)"""
        pred = self.forward(variables, y, train=False)
        if return_latent:
            return pred
        return self.decode(pred, y)

    def sample(self, variables, key, y, return_latent: bool = False,
               maximum_batch_size: int | None = None):
        """Deterministic 'sampling' = prediction; key kept for API parity
        with KarrasModel (ForecastModule.py:724-782)."""
        yc = y["y"] if isinstance(y, dict) else y
        n = yc.shape[0]
        if maximum_batch_size is not None and n > maximum_batch_size:
            outs = []
            start = 0
            for bs in get_minibatch_sizes(n, maximum_batch_size):
                ysub = jax.tree.map(lambda v: v[start:start + bs], y)
                outs.append(self.sample(variables, key, ysub, return_latent))
                start += bs
            return jnp.concatenate(outs, axis=0)
        return self.predict(variables, y, return_latent)

    def select_batch(self, batch):
        if self.conditional and self.masked:
            x, y, mask = batch
        elif self.conditional:
            x, y = batch
            mask = None
        elif self.masked:
            x, mask = batch
            y = None
        else:
            x, y, mask = batch, None, None
        return x, y, mask

    def export_description(self) -> dict[str, Any]:
        return dict(config_description=self.config.export_description(),
                    conditional=self.conditional, masked=self.masked,
                    autoencoder=self.autoencoder is not None,
                    autoencoder_conditional=self.autoencoder_conditional,
                    encode_y=self.encode_y)
