"""KarrasEncoderModel: learned conditioning — the condition y is produced
by a trainable encoder applied to x itself.

TPU-native counterpart of the reference KarrasEncoder
(reference diffsci/models/karrasencoder/karrasencoder.py:15-69). The
encoder network joins the umbrella module so both nets train under one
optimizer.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from diffsci_tpu.models.karras.module import KarrasModel, KarrasModelConfig


class _EncoderNet(nn.Module):
    """Umbrella: score net receives the encoder's output as conditioning."""
    model: nn.Module
    encoder_model: nn.Module

    def __call__(self, x, cnoise, y=None, train: bool = False):
        return self.model(x, cnoise, y, train=train)

    def encode_condition(self, x, train: bool = False):
        return self.encoder_model(x, train=train)


class KarrasEncoderModel(KarrasModel):
    """KarrasModel whose loss derives the condition from a trainable
    encoder on x (karrasencoder.py:15-69)."""

    def __init__(self, model: nn.Module, encoder_model: nn.Module,
                 config: KarrasModelConfig, masked: bool = False,
                 autoencoder=None, autoencoder_conditional: bool = False):
        super().__init__(model, config, conditional=True, masked=masked,
                         autoencoder=autoencoder,
                         autoencoder_conditional=autoencoder_conditional)
        self.encoder_model = encoder_model
        # rebuild the umbrella with the encoder inside so one param tree
        # holds both networks
        from diffsci_tpu.models.karras.module import KarrasNet

        class _Net(KarrasNet):
            encoder_model: nn.Module = None

            def encode_condition(self, x, train: bool = False):
                return self.encoder_model(x, train=train)

        self.net = _Net(
            model=model,
            dynamic_loss_weight=config.dynamic_loss_weight,
            edm_batch_norm_sigma=(
                config.extra_args.get("sigma_data", 0.5)
                if config.has_edm_batch_norm else None),
            encoder_model=encoder_model)

    def init(self, key, x_shape, y=None):
        import jax.numpy as jnp
        from diffsci_tpu.models.karras.module import _merge_variables
        x0 = jnp.zeros(x_shape, jnp.float32)
        # probe the encoder's output shape with a throwaway init
        probe_vars = self.encoder_model.init({"params": key}, x0,
                                             train=False)
        y_probe = self.encoder_model.apply(probe_vars, x0, train=False)
        variables = super().init(key, x_shape, y=y_probe)
        # init the encoder branch of the umbrella and merge its params
        enc_extra = self.net.init({"params": key}, x0,
                                  method=type(self.net).encode_condition)
        return _merge_variables(variables, enc_extra)

    def encode_condition(self, variables, x, train: bool = False):
        return self.net.apply(variables, x, train,
                              method=type(self.net).encode_condition)

    def loss_fn(self, variables, key, x, sigma, y=None, mask=None,
                train: bool = True, eps=None):
        """Derive y from the encoder, then the standard EDM loss
        (karrasencoder.py:37-44)."""
        y = self.encode_condition(variables, x, train=train)
        return super().loss_fn(variables, key, x, sigma, y, mask, train,
                               eps=eps)

    def select_batch(self, batch):
        """Batches are unconditional; the condition is learned
        (karrasencoder.py:60-67)."""
        was = self.conditional
        self.conditional = False
        try:
            return super().select_batch(batch)
        finally:
            self.conditional = was

    def export_description(self) -> dict[str, Any]:
        base = super().export_description()
        enc = getattr(self.encoder_model, "export_description", None)
        return dict(base_description=base,
                    encoder_description=enc() if enc else None)
