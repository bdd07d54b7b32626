"""Training-time noise-level samplers and per-sigma loss weights lambda(sigma).

TPU-native counterpart of the reference's noise samplers
(reference diffsci/models/karras/noisesamplers.py:8-111). Sampling takes an
explicit PRNG key (replacing torch's global RNG) and is jit/vmap safe.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NoiseSampler:
    def loss_weighting(self, sigma):
        raise NotImplementedError

    def sample(self, key, shape):
        raise NotImplementedError

    def export_description(self):
        return {"tag": self.tag, "extra_args": {}}


@dataclasses.dataclass(frozen=True)
class EDMNoiseSampler(NoiseSampler):
    """Log-normal sigma; lambda = (sigma^2 + sigma_d^2) / (sigma sigma_d)^2
    (noisesamplers.py:20-41)."""
    sigma_data: float = 0.5
    prior_mean: float = -1.2
    prior_std: float = 1.2
    tag = "edm"

    def loss_weighting(self, sigma):
        return (sigma ** 2 + self.sigma_data ** 2) / ((sigma * self.sigma_data) ** 2)

    def sample(self, key, shape):
        logsigma = jax.random.normal(key, shape) * self.prior_std + self.prior_mean
        return jnp.exp(logsigma)

    def export_description(self):
        return {"tag": self.tag,
                "extra_args": {"sigma_data": self.sigma_data,
                               "prior_mean": self.prior_mean,
                               "prior_std": self.prior_std}}


@dataclasses.dataclass(frozen=True)
class VPNoiseSampler(NoiseSampler):
    """Uniform t in [eps, 1] mapped through sigma(t); lambda = sigma^-2
    (noisesamplers.py:44-63)."""
    scheduling: object = None  # SchedulingFunctions with .noise
    epsilon: float = 1e-3
    tag = "vp"

    def loss_weighting(self, sigma):
        return 1.0 / (sigma ** 2)

    def sample(self, key, shape):
        t = jax.random.uniform(key, shape)
        t = t * (1.0 - self.epsilon) + self.epsilon
        return self.scheduling.noise(t)


@dataclasses.dataclass(frozen=True)
class VENoiseSampler(NoiseSampler):
    """Log-uniform sigma in [sigma_min, sigma_max]; lambda = sigma^-2
    (noisesamplers.py:66-87)."""
    sigma_min: float = 0.02
    sigma_max: float = 100.0
    tag = "ve"

    def loss_weighting(self, sigma):
        return 1.0 / (sigma ** 2)

    def sample(self, key, shape):
        u = jax.random.uniform(key, shape)
        logsig = jnp.log(self.sigma_min) + u * (jnp.log(self.sigma_max) - jnp.log(self.sigma_min))
        return jnp.exp(logsig)

    def export_description(self):
        return {"tag": self.tag,
                "extra_args": {"sigma_min": self.sigma_min,
                               "sigma_max": self.sigma_max}}


@dataclasses.dataclass(frozen=True)
class UniformNoiseSampler(NoiseSampler):
    """Uniform sigma in [t, T] with EDM weighting (noisesamplers.py:90-111)."""
    t: float = 0.0
    T: float = 1.0
    sigma_data: float = 0.5
    tag = "uniform"

    def loss_weighting(self, sigma):
        return (sigma ** 2 + self.sigma_data ** 2) / ((sigma * self.sigma_data) ** 2)

    def sample(self, key, shape):
        u = jax.random.uniform(key, shape)
        return self.t + u * (self.T - self.t)

    def export_description(self):
        return {"tag": self.tag,
                "extra_args": {"t": self.t, "T": self.T,
                               "sigma_data": self.sigma_data}}
