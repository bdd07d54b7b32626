"""Minimal standalone EDM module: the lighter twin of KarrasModel with the
EDM coefficients inlined.

TPU-native counterpart of the reference EDMModule
(reference diffsci/models/karras/edm.py:21-279). Kept for API parity; for
full-featured training/sampling use KarrasModel with
KarrasModelConfig.from_edm().
"""

from __future__ import annotations

from typing import Literal

import numpy as np
import jax
import jax.numpy as jnp

from diffsci_tpu.utils import bcast_right
from diffsci_tpu.ops.losses import huber as huber_loss
from diffsci_tpu.ops.batchnorm import ConstantBatchNorm, IdentityBatchNorm


class EDMModelConfig:
    """(edm.py:21-75)"""

    def __init__(self,
                 initial_norm: bool | float = False,
                 loss_metric: Literal["mse", "huber"] = "huber",
                 sigma_data: float = 0.5,
                 prior_mean: float = -1.2,
                 prior_std: float = 1.2,
                 sigma_min: float = 0.002,
                 sigma_max: float = 80.0,
                 exponent_steps: float = 7.0):
        self.initial_norm = initial_norm
        self.loss_metric = loss_metric
        self.sigma_data = sigma_data
        self.prior_mean = prior_mean
        self.prior_std = prior_std
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max
        self.exponent_steps = exponent_steps

    # EDM closed forms (edm.py:49-55)
    def loss_weighting(self, sigma):
        return (sigma ** 2 + self.sigma_data ** 2) / (
            (sigma * self.sigma_data) ** 2)

    def noise_conditioner(self, sigma):
        return 0.5 * jnp.log(sigma)

    def input_scaling(self, sigma):
        return 1.0 / jnp.sqrt(sigma ** 2 + self.sigma_data ** 2)

    def output_scaling(self, sigma):
        return sigma * self.sigma_data / jnp.sqrt(sigma ** 2
                                                  + self.sigma_data ** 2)

    def skip_scaling(self, sigma):
        return self.sigma_data ** 2 / (sigma ** 2 + self.sigma_data ** 2)

    def sample_sigma(self, key, shape):
        logsigma = jax.random.normal(key, shape) * self.prior_std \
            + self.prior_mean
        return jnp.exp(logsigma)

    def create_sigma_steps(self, n: int) -> np.ndarray:
        """(edm.py:62-67)"""
        rho = self.exponent_steps
        s = np.arange(n, dtype=np.float64) / n
        start = self.sigma_max ** (1 / rho)
        end = self.sigma_min ** (1 / rho)
        return (start + s * (end - start)) ** rho + 1e-6


class EDMModel:
    """(edm.py:78-279)"""

    def __init__(self, model, config: EDMModelConfig):
        self.model = model
        self.config = config
        if isinstance(config.initial_norm, (int, float)) \
                and not isinstance(config.initial_norm, bool):
            self.initial_norm = ConstantBatchNorm(float(config.initial_norm))
        else:
            self.initial_norm = IdentityBatchNorm()
        self._loss = ((lambda a, b: (a - b) ** 2)
                      if config.loss_metric == "mse" else huber_loss)

    def init(self, key, x_shape, y=None):
        kp, kd = jax.random.split(key)
        x = jnp.zeros(x_shape, jnp.float32)
        t = jnp.ones((x_shape[0],), jnp.float32)
        return self.model.init({"params": kp, "dropout": kd}, x, t, y)

    def evaluate_denoiser(self, variables, x, sigma, y=None, train=False,
                          rngs=None):
        """(edm.py:121-156)"""
        cfg = self.config
        c_in = bcast_right(cfg.input_scaling(sigma), x)
        c_out = bcast_right(cfg.output_scaling(sigma), x)
        c_skip = bcast_right(cfg.skip_scaling(sigma), x)
        cnoise = cfg.noise_conditioner(sigma)
        f = self.model.apply(variables, c_in * x, cnoise, y, train=train,
                             rngs=rngs)
        return c_out * f + c_skip * x

    def loss_fn(self, variables, key, x, sigma, y=None, mask=None,
                train: bool = True):
        """(edm.py:105-119 analogue of the reference's loss)"""
        knoise, kdrop = jax.random.split(key)
        x = self.initial_norm.normalize(x)
        sigma_b = bcast_right(sigma, x)
        noise = jax.random.normal(knoise, x.shape, x.dtype)
        x_noised = x + sigma_b * noise
        rngs = {"dropout": kdrop} if train else None
        denoised = self.evaluate_denoiser(variables, x_noised, sigma, y,
                                          train, rngs)
        loss = self._loss(denoised, x)
        if mask is not None:
            loss = loss * (1 - jnp.broadcast_to(mask, loss.shape))
        return jnp.mean(loss)

    def integrate_probability_flow(self, variables, key, x, y=None,
                                   nsteps: int = 100,
                                   record_history: bool = False):
        """Heun probability-flow integration over the sigma grid
        (edm.py:242-279)."""
        sig = self.config.create_sigma_steps(nsteps)
        sig = np.concatenate([sig, [0.0]])
        dsig = np.diff(sig)

        def score(xx, sigma_scalar):
            s = jnp.broadcast_to(sigma_scalar, (xx.shape[0],))
            d = self.evaluate_denoiser(variables, xx, s, y)
            return (d - xx) / (sigma_scalar ** 2)

        def rhs(xx, sigma_scalar):
            return -sigma_scalar * score(xx, sigma_scalar)

        def body(carry, t_pair):
            xc, = carry
            t, dt = t_pair
            r1 = rhs(xc, t)
            xe = xc + dt * r1
            r2 = rhs(xe, t + dt)
            xn = xc + 0.5 * (r1 + r2) * dt
            return (xn,), (xn if record_history else None)

        pairs = jnp.asarray(np.stack([sig[:-2], dsig[:-1]], 1), jnp.float32)
        (x,), ys = jax.lax.scan(body, (x,), pairs)
        # final step to zero: Euler (endpoint rule)
        x = x + float(dsig[-1]) * rhs(x, jnp.float32(sig[-2]))
        if record_history:
            return jnp.concatenate([ys, x[None]], axis=0)
        return x

    def sample(self, variables, key, nsamples: int, shape, y=None,
               nsteps: int = 100):
        knoise, _ = jax.random.split(key)
        x = jax.random.normal(knoise, (nsamples,) + tuple(shape)) \
            * self.config.sigma_max
        x = self.integrate_probability_flow(variables, key, x, y, nsteps)
        return self.initial_norm.unnormalize(x)
