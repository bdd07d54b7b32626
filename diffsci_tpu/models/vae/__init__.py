"""VAE training runtime (the reference's diffsci/models/vae/)."""

from diffsci_tpu.models.vae.module import (
    VAEModel,
    VAEModelConfig,
    VAETrainState,
    create_vae_train_state,
    make_vae_train_step,
    NLayerDiscriminator,
    BoundAutoencoder,
    KLAnnealing,
    total_variation,
)

__all__ = [
    "VAEModel", "VAEModelConfig", "VAETrainState", "create_vae_train_state",
    "make_vae_train_step", "NLayerDiscriminator", "BoundAutoencoder",
    "KLAnnealing", "total_variation",
]
