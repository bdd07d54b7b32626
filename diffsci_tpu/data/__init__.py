"""Analytic toy datasets (the reference's diffsci/data/)."""

from diffsci_tpu.data.loading import (ArrayDataLoader, train_val_split,
                                      prefetch_to_device,
                                      TorchLoaderAdapter)
from diffsci_tpu.data.toy_datasets import (
    AnalyticalDataset,
    SinglePointDataset,
    SingleGaussianDataset,
    ZeroDataset,
    ZeroMeanGaussianDataset,
    MixtureOfPointsDataset,
    MixtureOfGaussiansDataset,
    DiagonalGaussianDataset,
    Single1DUniformDataset,
    MixtureOf1DUniformsDataset,
    ShapesDataset,
)

__all__ = [
    "ArrayDataLoader", "train_val_split", "prefetch_to_device",
    "TorchLoaderAdapter",
    "AnalyticalDataset", "SinglePointDataset", "SingleGaussianDataset",
    "ZeroDataset", "ZeroMeanGaussianDataset", "MixtureOfPointsDataset",
    "MixtureOfGaussiansDataset", "DiagonalGaussianDataset",
    "Single1DUniformDataset", "MixtureOf1DUniformsDataset",
    "ShapesDataset",
]
