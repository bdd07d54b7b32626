"""Karras preconditioners: c_skip/c_out/c_in/c_noise per formulation.

TPU-native counterpart of the reference's preconditioner hierarchy
(reference diffsci/models/karras/preconditioners.py:8-161). Implemented as
frozen dataclasses with a single fused ``coefficients(sigma)`` entry point so
the four coefficient computations fuse into one elementwise XLA kernel in the
sampler hot loop, plus the individual accessors for parity with the
reference API.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class KarrasPreconditioner:
    def skip_scaling(self, sigma):
        raise NotImplementedError

    def output_scaling(self, sigma):
        raise NotImplementedError

    def input_scaling(self, sigma):
        raise NotImplementedError

    def noise_conditioner(self, sigma):
        raise NotImplementedError

    def coefficients(self, sigma):
        """Return (c_skip, c_out, c_in, c_noise) for a batch of sigmas."""
        return (self.skip_scaling(sigma),
                self.output_scaling(sigma),
                self.input_scaling(sigma),
                self.noise_conditioner(sigma))

    def export_description(self):
        return {"tag": self.tag, "extra_args": {}}


@dataclasses.dataclass(frozen=True)
class EDMPreconditioner(KarrasPreconditioner):
    """Karras et al. Table 1 (preconditioners.py:30-53)."""
    sigma_data: float = 0.5
    tag = "edm"

    def skip_scaling(self, sigma):
        return self.sigma_data ** 2 / (sigma ** 2 + self.sigma_data ** 2)

    def output_scaling(self, sigma):
        return sigma * self.sigma_data / jnp.sqrt(sigma ** 2 + self.sigma_data ** 2)

    def input_scaling(self, sigma):
        return 1.0 / jnp.sqrt(sigma ** 2 + self.sigma_data ** 2)

    def noise_conditioner(self, sigma):
        return 0.5 * jnp.log(sigma)

    def export_description(self):
        return {"tag": self.tag, "extra_args": {"sigma_data": self.sigma_data}}


@dataclasses.dataclass(frozen=True)
class VPPreconditioner(KarrasPreconditioner):
    """VP with c_noise = (M-1) * sigma^{-1}(sigma)
    (preconditioners.py:56-84). ``inverse_noise`` comes from the scheduling
    functions rather than a scheduler object."""
    scheduling: object = None  # SchedulingFunctions with .inverse_noise
    M: int = 1000
    tag = "vp"

    def skip_scaling(self, sigma):
        return 1.0 + 0.0 * sigma

    def output_scaling(self, sigma):
        return -sigma

    def input_scaling(self, sigma):
        return 1.0 / jnp.sqrt(sigma ** 2 + 1.0)

    def noise_conditioner(self, sigma):
        return (self.M - 1) * self.scheduling.inverse_noise(sigma)


@dataclasses.dataclass(frozen=True)
class VEPreconditioner(KarrasPreconditioner):
    """(preconditioners.py:87-109)"""
    tag = "ve"

    def skip_scaling(self, sigma):
        return 1.0 + 0.0 * sigma

    def output_scaling(self, sigma):
        return sigma

    def input_scaling(self, sigma):
        return 1.0 + 0.0 * sigma

    def noise_conditioner(self, sigma):
        return jnp.log(0.5 * sigma)


@dataclasses.dataclass(frozen=True)
class SR3Preconditioner(KarrasPreconditioner):
    """Super-resolution preconditioner with halved skip/output scalings
    (preconditioners.py:112-136)."""
    sigma_data: float = 0.5
    tag = "sr3"

    def skip_scaling(self, sigma):
        return self.sigma_data ** 2 / (2 * (sigma ** 2 + self.sigma_data ** 2))

    def output_scaling(self, sigma):
        return sigma * self.sigma_data / (2 * jnp.sqrt(sigma ** 2 + self.sigma_data ** 2))

    def input_scaling(self, sigma):
        return 1.0 / jnp.sqrt(sigma ** 2 + self.sigma_data ** 2)

    def noise_conditioner(self, sigma):
        return 0.5 * jnp.log(sigma)

    def export_description(self):
        return {"tag": self.tag, "extra_args": {"sigma_data": self.sigma_data}}


@dataclasses.dataclass(frozen=True)
class NullPreconditioner(KarrasPreconditioner):
    """Identity network wiring: D(x; sigma) = F(x, sigma)
    (preconditioners.py:139-161)."""
    tag = "null"

    def skip_scaling(self, sigma):
        return 0.0 * sigma

    def output_scaling(self, sigma):
        return 1.0 + 0.0 * sigma

    def input_scaling(self, sigma):
        return 1.0 + 0.0 * sigma

    def noise_conditioner(self, sigma):
        return sigma
