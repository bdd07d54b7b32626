"""Analytic toy distributions with closed-form scores and optimal denoisers.

TPU-native counterpart of the reference's analytic datasets
(reference diffsci/data/toy_datasets.py:14-1048). Each dataset knows the
Gaussian-smoothed density p(x; sigma) = Int N(x; x0, sigma) p(x0) dx0 in
closed form, exposing:

- ``sample(key)``         -> dataset array [num_samples, *shape]
- ``logprob(x, sigma)``   -> [B]
- ``gradlogprob(x, sigma)`` -> [B, *shape]  (the score)
- ``denoiser(x, sigma)``  -> x + sigma^2 * score  (the optimal denoiser,
  toy_datasets.py:78-88)
- ``optimal_denoiser_predictor(x, sigma)`` -> posterior mean E[x0 | x]

These are the oracles that validate the whole diffusion math core with no
neural network involved (see reference tests/test_karras_on_toy_dataset.py).
All methods are pure jnp functions safe under jit/vmap.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from diffsci_tpu.utils import bcast_right

_LOG_2PI = math.log(2.0 * math.pi)
_STABILIZER = 1e-40


class AnalyticalDataset:
    """Base class. Subclasses define shape, sampling and the smoothed score."""

    def __init__(self, num_samples: int, shape):
        self.num_samples = num_samples
        self.shape = tuple(shape)

    @property
    def ndim_data(self) -> int:
        return math.prod(self.shape) if self.shape else 1

    def sample(self, key) -> jnp.ndarray:
        raise NotImplementedError

    def logprob(self, x, sigma):
        raise NotImplementedError

    def gradlogprob(self, x, sigma):
        raise NotImplementedError

    def denoiser(self, x, sigma):
        """Optimal denoiser D(x; sigma) = x + sigma^2 * score
        (toy_datasets.py:78-88)."""
        score = self.gradlogprob(x, sigma)
        return x + bcast_right(sigma, x) ** 2 * score

    def optimal_denoiser_predictor(self, x, sigma, scale=None):
        raise NotImplementedError

    def optimal_noise_predictor(self, x, sigma, scale=None):
        """eps-prediction from the posterior mean (toy_datasets.py:91-102)."""
        x0 = self.optimal_denoiser_predictor(x, sigma, scale=scale)
        if scale is not None:
            x0 = x0 * bcast_right(scale, x0)
        return (x - x0) / bcast_right(sigma, x0)

    def __len__(self):
        return self.num_samples


def _sum_spatial(a):
    return jnp.sum(a, axis=tuple(range(1, a.ndim)))


class SinglePointDataset(AnalyticalDataset):
    """Dirac delta at x0 (toy_datasets.py:113-197)."""

    def __init__(self, num_samples: int, x0):
        x0 = jnp.asarray(x0, jnp.float32)
        super().__init__(num_samples, x0.shape)
        self.x0 = x0

    def sample(self, key):
        return jnp.broadcast_to(self.x0, (self.num_samples,) + self.shape)

    def logprob(self, x, sigma):
        sigma = bcast_right(sigma, x)
        sqnorm = _sum_spatial((x - self.x0) ** 2)
        sigma_flat = sigma.reshape(sigma.shape[0])
        exp_term = -0.5 * sqnorm / sigma_flat ** 2
        normalizer = -self.ndim_data / 2 * jnp.log(2 * math.pi * sigma_flat ** 2)
        return exp_term + normalizer

    def gradlogprob(self, x, sigma):
        sigma = bcast_right(sigma, x)
        return -(x - self.x0) / sigma ** 2

    def optimal_denoiser_predictor(self, x, sigma, scale=None):
        return jnp.broadcast_to(self.x0, x.shape)


class ZeroDataset(SinglePointDataset):
    """Point mass at the origin (toy_datasets.py:282-287)."""

    def __init__(self, num_samples: int, shape):
        super().__init__(num_samples, jnp.zeros(shape))


class SingleGaussianDataset(AnalyticalDataset):
    """Isotropic Gaussian at x0 with std ``scale``
    (toy_datasets.py:200-279)."""

    def __init__(self, num_samples: int, x0, scale: float = 1.0):
        x0 = jnp.asarray(x0, jnp.float32)
        super().__init__(num_samples, x0.shape)
        self.x0 = x0
        self.scale = scale

    def sample(self, key):
        mean = jnp.broadcast_to(self.x0, (self.num_samples,) + self.shape)
        return mean + self.scale * jax.random.normal(key, mean.shape)

    def logprob(self, x, sigma):
        var = sigma ** 2 + self.scale ** 2
        sqnorm = _sum_spatial((x - self.x0) ** 2)
        return (-0.5 * sqnorm / var
                - self.ndim_data / 2 * jnp.log(2 * math.pi * var))

    def gradlogprob(self, x, sigma):
        var = bcast_right(sigma, x) ** 2 + self.scale ** 2
        return -(x - self.x0) / var

    def optimal_denoiser_predictor(self, x, sigma, scale=None):
        # posterior mean of x0 given x: shrink towards the prior mean
        var = bcast_right(sigma, x) ** 2
        w = self.scale ** 2 / (self.scale ** 2 + var)
        return self.x0 + w * (x - self.x0)


class ZeroMeanGaussianDataset(SingleGaussianDataset):
    """(toy_datasets.py:290-300)"""

    def __init__(self, num_samples: int, shape, scale: float = 1.0):
        super().__init__(num_samples, jnp.zeros(shape), scale=scale)


class MixtureOfPointsDataset(AnalyticalDataset):
    """Discrete distribution over ``points`` with ``weights``
    (toy_datasets.py:303-387)."""

    def __init__(self, num_samples: int, points, weights):
        points = jnp.asarray(points, jnp.float32)
        weights = jnp.asarray(weights, jnp.float32)
        super().__init__(num_samples, points.shape[1:])
        self.points = points
        self.weights = weights / jnp.sum(weights)

    def sample(self, key):
        idx = jax.random.choice(key, self.points.shape[0],
                                shape=(self.num_samples,), p=self.weights)
        return self.points[idx]

    def _log_responsibilities(self, x, sigma):
        diff = x[:, None] - self.points[None]  # [b, n, *shape]
        norm2 = jnp.sum(diff ** 2, axis=tuple(range(2, diff.ndim)))  # [b, n]
        logr = -0.5 * norm2 / (sigma[:, None] ** 2) + jnp.log(self.weights)
        return logr, diff

    def logprob(self, x, sigma):
        logr, _ = self._log_responsibilities(x, sigma)
        return (jax.scipy.special.logsumexp(logr, axis=1)
                - self.ndim_data / 2 * jnp.log(2 * math.pi * sigma ** 2))

    def gradlogprob(self, x, sigma):
        logr, diff = self._log_responsibilities(x, sigma)
        r = jax.nn.softmax(logr, axis=1)  # [b, n]
        sigma_ = bcast_right(sigma, diff)
        terms = -diff / sigma_ ** 2
        return jnp.sum(bcast_right(r, terms) * terms, axis=1)

    def optimal_denoiser_predictor(self, x, sigma, scale=None):
        p = self.points[None]
        if scale is not None:
            p = p * bcast_right(scale, p)
        diff = x[:, None] - p
        norm2 = jnp.sum(diff ** 2, axis=tuple(range(2, diff.ndim)))
        logr = -0.5 * norm2 / bcast_right(sigma, norm2) ** 2 + jnp.log(self.weights)
        r = jax.nn.softmax(logr, axis=1)
        return jnp.sum(bcast_right(r, p) * p, axis=1)


class MixtureOfGaussiansDataset(AnalyticalDataset):
    """Mixture of isotropic Gaussians with a shared or per-component scale
    (toy_datasets.py:390-562)."""

    def __init__(self, num_samples: int, means, weights, scale=1.0):
        means = jnp.asarray(means, jnp.float32)
        weights = jnp.asarray(weights, jnp.float32)
        super().__init__(num_samples, means.shape[1:])
        self.means = means
        self.weights = weights / jnp.sum(weights)
        self.scale = jnp.broadcast_to(jnp.asarray(scale, jnp.float32),
                                      (means.shape[0],))

    def sample(self, key):
        kidx, knoise = jax.random.split(key)
        idx = jax.random.choice(kidx, self.means.shape[0],
                                shape=(self.num_samples,), p=self.weights)
        mean = self.means[idx]
        scale = bcast_right(self.scale[idx], mean)
        return mean + scale * jax.random.normal(knoise, mean.shape)

    def _component_stats(self, x, sigma):
        diff = x[:, None] - self.means[None]  # [b, n, *shape]
        norm2 = jnp.sum(diff ** 2, axis=tuple(range(2, diff.ndim)))  # [b, n]
        var = sigma[:, None] ** 2 + self.scale[None] ** 2  # [b, n]
        loglik = (-0.5 * norm2 / var
                  - self.ndim_data / 2 * jnp.log(2 * math.pi * var))
        return diff, var, loglik + jnp.log(self.weights)

    def logprob(self, x, sigma):
        _, _, logjoint = self._component_stats(x, sigma)
        return jax.scipy.special.logsumexp(logjoint, axis=1)

    def gradlogprob(self, x, sigma):
        diff, var, logjoint = self._component_stats(x, sigma)
        r = jax.nn.softmax(logjoint, axis=1)
        terms = -diff / bcast_right(var, diff)
        return jnp.sum(bcast_right(r, terms) * terms, axis=1)

    def optimal_denoiser_predictor(self, x, sigma, scale=None):
        means = self.means[None]
        if scale is not None:
            means = means * bcast_right(scale, means)
        diff, var, logjoint = self._component_stats(x, sigma)
        r = jax.nn.softmax(logjoint, axis=1)  # [b, n]
        # per-component posterior mean with component variance s_i^2
        sig2 = bcast_right(sigma, diff) ** 2
        s2 = bcast_right(self.scale[None] ** 2, diff)
        comp_mean = means + s2 / (s2 + sig2) * diff
        return jnp.sum(bcast_right(r, comp_mean) * comp_mean, axis=1)


class DiagonalGaussianDataset(AnalyticalDataset):
    """Single Gaussian with diagonal covariance diag(stds^2)
    (toy_datasets.py:798-852)."""

    def __init__(self, num_samples: int, mean, stds):
        mean = jnp.asarray(mean, jnp.float32)
        stds = jnp.asarray(stds, jnp.float32)
        super().__init__(num_samples, mean.shape)
        self.mean = mean
        self.stds = stds

    def sample(self, key):
        shape = (self.num_samples,) + self.shape
        return self.mean + self.stds * jax.random.normal(key, shape)

    def logprob(self, x, sigma):
        var = bcast_right(sigma, x) ** 2 + self.stds ** 2
        sq = (x - self.mean) ** 2 / var
        return -0.5 * _sum_spatial(sq + jnp.log(2 * math.pi * var))

    def gradlogprob(self, x, sigma):
        var = bcast_right(sigma, x) ** 2 + self.stds ** 2
        return -(x - self.mean) / var

    def optimal_denoiser_predictor(self, x, sigma, scale=None):
        var = bcast_right(sigma, x) ** 2
        w = self.stds ** 2 / (self.stds ** 2 + var)
        return self.mean + w * (x - self.mean)


class Single1DUniformDataset(AnalyticalDataset):
    """Uniform on [a, b] in 1D (toy_datasets.py:855-931).
    p(x; sigma) = (Phi((x-a)/sigma) - Phi((x-b)/sigma)) / (b - a)."""

    def __init__(self, num_samples: int, a: float = 0.0, b: float = 1.0):
        super().__init__(num_samples, (1,))
        self.a = a
        self.b = b

    def sample(self, key):
        u = jax.random.uniform(key, (self.num_samples,) + self.shape)
        return self.a + (self.b - self.a) * u

    def _cdf_terms(self, x, sigma):
        sigma = bcast_right(sigma, x)
        za = (x - self.a) / sigma
        zb = (x - self.b) / sigma
        return za, zb, sigma

    def logprob(self, x, sigma):
        za, zb, _ = self._cdf_terms(x, sigma)
        p = (jax.scipy.stats.norm.cdf(za) - jax.scipy.stats.norm.cdf(zb))
        p = p / (self.b - self.a)
        return jnp.log(p + _STABILIZER).reshape(x.shape[0])

    def gradlogprob(self, x, sigma):
        za, zb, sigma_ = self._cdf_terms(x, sigma)
        num = (jax.scipy.stats.norm.pdf(za) - jax.scipy.stats.norm.pdf(zb))
        den = (jax.scipy.stats.norm.cdf(za) - jax.scipy.stats.norm.cdf(zb))
        return num / (sigma_ * (den + _STABILIZER))

    def optimal_denoiser_predictor(self, x, sigma, scale=None):
        return self.denoiser(x, sigma)


class MixtureOf1DUniformsDataset(AnalyticalDataset):
    """Weighted mixture of 1D uniforms (toy_datasets.py:934-1048)."""

    def __init__(self, num_samples: int, intervals, weights):
        super().__init__(num_samples, (1,))
        self.intervals = jnp.asarray(intervals, jnp.float32)  # [n, 2]
        weights = jnp.asarray(weights, jnp.float32)
        self.weights = weights / jnp.sum(weights)

    def sample(self, key):
        kidx, ku = jax.random.split(key)
        idx = jax.random.choice(kidx, self.intervals.shape[0],
                                shape=(self.num_samples,), p=self.weights)
        a = self.intervals[idx, 0:1]
        b = self.intervals[idx, 1:2]
        u = jax.random.uniform(ku, (self.num_samples, 1))
        return a + (b - a) * u

    def _component_probs(self, x, sigma):
        # x: [b, 1]; intervals: [n, 2]
        sigma = sigma.reshape(-1, 1)
        a = self.intervals[None, :, 0]  # [1, n]
        b = self.intervals[None, :, 1]
        za = (x - a) / sigma
        zb = (x - b) / sigma
        p = (jax.scipy.stats.norm.cdf(za) - jax.scipy.stats.norm.cdf(zb))
        p = p / (b - a)
        dp = (jax.scipy.stats.norm.pdf(za) - jax.scipy.stats.norm.pdf(zb))
        dp = dp / (sigma * (b - a))
        return p, dp

    def logprob(self, x, sigma):
        p, _ = self._component_probs(x, sigma)
        mix = jnp.sum(self.weights * p, axis=1)
        return jnp.log(mix + _STABILIZER)

    def gradlogprob(self, x, sigma):
        p, dp = self._component_probs(x, sigma)
        mix = jnp.sum(self.weights * p, axis=1, keepdims=True)
        dmix = jnp.sum(self.weights * dp, axis=1, keepdims=True)
        return dmix / (mix + _STABILIZER)

    def optimal_denoiser_predictor(self, x, sigma, scale=None):
        return self.denoiser(x, sigma)


class ShapesDataset:
    """Synthetic geometric-shapes images for diffusion smoke training and
    morphing studies (reference scripts/training/train-diffusion-shapes.py:
    17-105). Host-side numpy generation, channels-last [N, size, size, 1],
    values in {-1, +1}.

    mode='paper_replica': three column slots, each independently populated
    (p=0.5) with a triangle / square / disk at a jittered row position.
    mode='geometry_test': one centered square or disk (p=0.5 each) —
    the shape-morphing benchmark.
    """

    def __init__(self, num_samples: int, size: int = 64,
                 mode: str = "paper_replica", polygon_size: int = 8,
                 seed: int = 0):
        if mode not in ("paper_replica", "geometry_test"):
            raise ValueError(f"unknown mode: {mode!r}")
        self.num_samples = num_samples
        self.size = size
        self.mode = mode
        self.polygon_size = polygon_size
        self.seed = seed
        self.shape = (size, size, 1)

    def _disk(self, img, cy, cx, r):
        yy, xx = np.mgrid[0:self.size, 0:self.size]
        img[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 1.0

    def _square(self, img, cy, cx, r):
        img[max(0, cy - r):cy + r, max(0, cx - r):cx + r] = 1.0

    def _triangle(self, img, cy, cx, r):
        yy, xx = np.mgrid[0:self.size, 0:self.size]
        # upward triangle: inside vertical band, width shrinking with height
        h = yy - (cy - r)
        mask = (h >= 0) & (h <= 2 * r) & (np.abs(xx - cx) <= h / 2)
        img[mask] = 1.0

    def generate(self) -> np.ndarray:
        return self.generate_labeled()[0]

    def generate_labeled(self) -> tuple[np.ndarray, np.ndarray]:
        """(images, labels): paper_replica labels are the [N, 3] binary
        slot-occupancy vector (triangle/square/disk present), geometry_test
        labels are [N] 0=square / 1=disk. Used to train the
        classifier-feature FID extractor (scripts/stochasticity_study.py)."""
        rng = np.random.default_rng(self.seed)
        s, r = self.size, self.polygon_size
        out = np.zeros((self.num_samples, s, s, 1), np.float32)
        labels = np.zeros(
            (self.num_samples, 3) if self.mode == "paper_replica"
            else (self.num_samples,), np.float32)
        for i in range(self.num_samples):
            img = out[i, :, :, 0]
            if self.mode == "paper_replica":
                cols = [s // 4, s // 2, 3 * s // 4]
                draw = [self._triangle, self._square, self._disk]
                for slot in range(3):
                    if rng.random() > 0.5:
                        cy = int(rng.integers(r + 1, s - r - 1))
                        draw[slot](img, cy, cols[slot], r)
                        labels[i, slot] = 1.0
            else:  # geometry_test
                c, rad = s // 2, s // 4
                if rng.random() > 0.5:
                    self._square(img, c, c, rad)
                else:
                    self._disk(img, c, c, rad)
                    labels[i] = 1.0
        return out * 2.0 - 1.0, labels

    def sample(self, key=None) -> np.ndarray:
        return self.generate()
