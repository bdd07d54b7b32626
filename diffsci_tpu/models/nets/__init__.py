"""Score networks and layer library (the reference's diffsci/models/nets/)."""

from diffsci_tpu.models.nets import layers
from diffsci_tpu.models.nets import normed
from diffsci_tpu.models.nets.attention import (
    SpatialSelfAttention,
    MultiHeadAttention,
    dot_product_attention,
    cosine_attention,
)
from diffsci_tpu.models.nets.mlp import MLPUncond, MLPCond
from diffsci_tpu.models.nets.punetg import PUNetG, PUNetGCond, PUNetGConfig
from diffsci_tpu.models.nets.adm import ADM, ADMConfig
from diffsci_tpu.models.nets.dit import DiffusionTransformer
from diffsci_tpu.models.nets.vae import (
    AutoencoderKL,
    VAEEncoder,
    VAEDecoder,
    DDConfig,
    DiagonalGaussianDistribution,
)

__all__ = [
    "layers", "normed",
    "SpatialSelfAttention", "MultiHeadAttention",
    "dot_product_attention", "cosine_attention",
    "MLPUncond", "MLPCond",
    "PUNetG", "PUNetGCond", "PUNetGConfig",
    "ADM", "ADMConfig", "DiffusionTransformer",
    "AutoencoderKL", "VAEEncoder", "VAEDecoder", "DDConfig",
    "DiagonalGaussianDistribution",
]
