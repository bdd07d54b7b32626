"""Analytic toy datasets (the reference's diffsci/data/)."""

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
)

__all__ = [
    "AnalyticalDataset", "SinglePointDataset", "SingleGaussianDataset",
    "ZeroDataset", "ZeroMeanGaussianDataset", "MixtureOfPointsDataset",
    "MixtureOfGaussiansDataset", "DiagonalGaussianDataset",
    "Single1DUniformDataset", "MixtureOf1DUniformsDataset",
]
