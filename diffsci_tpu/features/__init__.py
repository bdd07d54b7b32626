"""Application features: anomaly detection and inpainting wrappers."""

from diffsci_tpu.features.anomaly import AnoDDPM, DDAD
from diffsci_tpu.features.inpainting import RePaint

__all__ = ["AnoDDPM", "DDAD", "RePaint"]
