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
from diffsci_tpu.models.nets.vaenet import (
    VAENet,
    VAENetConfig,
    MinimalResnetBlock,
    patched_conv,
    divide_dims,
)
from diffsci_tpu.models.nets.convit import ConVit, ConVitConfig
from diffsci_tpu.models.nets.punetg_variants import (
    PUNetGEncoder,
    PUNetGDecoder,
    PUNetGDeterministic,
    EncoderFlattener,
    PUNetV,
    PUNetVConfig,
    ResnetSliceBlock,
)
from diffsci_tpu.models.nets.classifiers import (
    MinimalResNet,
    ClassifierResBlock,
)
from diffsci_tpu.models.nets.dasc import DASC, DASCConfig, dasc_loss
from diffsci_tpu.models.nets.autoencoders import (
    ChannelAdapterWrapper,
    load_autoencoder,
)
from diffsci_tpu.models.nets.hfnet import HFNet, HFNetUncond, HFNetCond
from diffsci_tpu.models.nets.ddpm_unet import UNet2D
from diffsci_tpu.models.nets import embedders

__all__ = [
    "layers", "normed",
    "SpatialSelfAttention", "MultiHeadAttention",
    "dot_product_attention", "cosine_attention",
    "MLPUncond", "MLPCond",
    "PUNetG", "PUNetGCond", "PUNetGConfig",
    "ADM", "ADMConfig", "DiffusionTransformer",
    "AutoencoderKL", "VAEEncoder", "VAEDecoder", "DDConfig",
    "DiagonalGaussianDistribution",
    "VAENet", "VAENetConfig", "MinimalResnetBlock", "patched_conv",
    "divide_dims",
    "ConVit", "ConVitConfig",
    "PUNetGEncoder", "PUNetGDecoder", "PUNetGDeterministic",
    "EncoderFlattener", "PUNetV", "PUNetVConfig", "ResnetSliceBlock",
    "MinimalResNet", "ClassifierResBlock", "DASC", "DASCConfig", "dasc_loss",
    "ChannelAdapterWrapper", "load_autoencoder",
    "HFNet", "HFNetUncond", "HFNetCond", "UNet2D",
    "embedders",
]
