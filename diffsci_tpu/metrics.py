"""Generative-model evaluation metrics: FID, KID, and basic sample
statistics.

The reference keeps metrics out of the library (its
diffsci/metrics/__init__.py is an empty placeholder; FID comes from
torchmetrics inside eval scripts, SURVEY.md §5). This build provides the
metric math natively with a pluggable feature extractor: pass any
``features_fn(x) -> [N, D]`` (an InceptionV3 port, a trained classifier's
penultimate layer via diffsci_tpu.models.nets.MinimalResNet, or identity
features for toy data). Frechet/kernel distances follow the standard
definitions (Heusel et al. 2017; Binkowski et al. 2018).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax.numpy as jnp
import scipy.linalg


def feature_statistics(features) -> tuple[np.ndarray, np.ndarray]:
    """Mean and covariance of a feature matrix [N, D]."""
    f = np.asarray(features, np.float64)
    mu = f.mean(axis=0)
    sigma = np.cov(f, rowvar=False)
    return mu, np.atleast_2d(sigma)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID core: ||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2))."""
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean, _ = scipy.linalg.sqrtm(
            (sigma1 + offset) @ (sigma2 + offset), disp=False)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def fid(real_features, fake_features) -> float:
    """Frechet distance between two feature sets [N, D]."""
    mu1, s1 = feature_statistics(real_features)
    mu2, s2 = feature_statistics(fake_features)
    return frechet_distance(mu1, s1, mu2, s2)


def kid(real_features, fake_features, degree: int = 3,
        gamma: Optional[float] = None, coef: float = 1.0) -> float:
    """Kernel Inception Distance: unbiased MMD^2 with a polynomial kernel
    k(x, y) = (gamma x.y + coef)^degree, gamma = 1/D by default."""
    x = np.asarray(real_features, np.float64)
    y = np.asarray(fake_features, np.float64)
    d = x.shape[1]
    g = gamma if gamma is not None else 1.0 / d

    def k(a, b):
        return (g * (a @ b.T) + coef) ** degree

    m, n = x.shape[0], y.shape[0]
    kxx = k(x, x)
    kyy = k(y, y)
    kxy = k(x, y)
    sum_xx = (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
    sum_yy = (kyy.sum() - np.trace(kyy)) / (n * (n - 1))
    sum_xy = kxy.mean()
    return float(sum_xx + sum_yy - 2 * sum_xy)


def fid_from_samples(real, fake, features_fn: Callable,
                     batch_size: int = 256) -> float:
    """FID over raw samples with a batched feature extractor."""
    def extract(x):
        out = []
        for i in range(0, x.shape[0], batch_size):
            out.append(np.asarray(features_fn(x[i:i + batch_size])))
        return np.concatenate(out, axis=0)

    return fid(extract(real), extract(fake))


def classifier_features_fn(classifier, variables) -> Callable:
    """Penultimate-layer feature extractor from a trained MinimalResNet
    (diffsci_tpu.models.nets.classifiers): the global-pooled trunk
    activations before the linear head."""
    from diffsci_tpu.models.nets.classifiers import MinimalResNet

    def features(x):
        return classifier.apply(variables, x,
                                method=MinimalResNet.features)
    return features


def sample_statistics(samples) -> dict[str, float]:
    """Cheap distributional statistics for parity checks."""
    s = np.asarray(samples, np.float64)
    return {
        "mean": float(s.mean()),
        "std": float(s.std()),
        "min": float(s.min()),
        "max": float(s.max()),
        "skew": float(((s - s.mean()) ** 3).mean() / (s.std() ** 3 + 1e-12)),
        "kurtosis": float(((s - s.mean()) ** 4).mean()
                          / (s.std() ** 4 + 1e-12) - 3.0),
    }
