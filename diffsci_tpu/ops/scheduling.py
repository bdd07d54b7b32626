"""Noise/scale scheduling functions sigma(t), s(t) per diffusion formulation.

TPU-native redesign of the reference's ``SchedulingFunctions`` hierarchy
(reference diffsci/models/karras/schedulingfunctions.py:6-169). These are
immutable dataclasses of static Python floats whose methods are pure
``jnp``-traceable functions, so they can be closed over by jitted samplers
and also evaluated on host numpy for static time-grid construction.

Every method accepts either numpy or jax arrays (or floats) and returns the
matching backend's arrays, which lets schedulers build their (t, dt) grids
statically in numpy while the same object serves traced per-step math.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SchedulingFunctions:
    """Base: sigma(t) noise schedule and s(t) scale schedule + derivatives.

    Flags mirror the reference's dispatch in ``Scheduler.rhs``
    (schedulers.py:247-294): ``constant_scaling`` selects the unscaled
    probability-flow branch; ``has_pf_score_multiplier`` short-circuits
    sigma'(t)*sigma(t) with a closed form; ``identity_noise`` marks
    sigma(t) = t (EDM), letting grids skip inverse_noise.
    """
    constant_scaling: bool = False
    identity_noise: bool = False
    has_pf_score_multiplier: bool = False
    has_pf_scale_multiplier: bool = False

    def scale(self, t):
        raise NotImplementedError

    def scale_deriv(self, t):
        raise NotImplementedError

    def noise(self, t):
        raise NotImplementedError

    def inverse_noise(self, sigma):
        raise NotImplementedError

    def noise_deriv(self, t):
        raise NotImplementedError

    def pf_score_multiplier(self, t):
        """s(t)^2 * sigma'(t) * sigma(t) closed form (when flagged)."""
        raise NotImplementedError

    def pf_scale_multiplier(self, t):
        """s'(t)/s(t) closed form (when flagged)."""
        raise NotImplementedError

    def export_description(self):
        return {"tag": self.tag, "extra_args": {}}


@dataclasses.dataclass(frozen=True)
class EDMSchedulingFunctions(SchedulingFunctions):
    """Karras EDM: sigma(t) = t, s(t) = 1 (schedulingfunctions.py:41-63)."""
    constant_scaling: bool = True
    identity_noise: bool = True
    tag = "EDM"

    def scale(self, t):
        return 1.0 + 0.0 * t

    def scale_deriv(self, t):
        return 0.0 * t

    def noise(self, t):
        return 1.0 * t

    def inverse_noise(self, sigma):
        return 1.0 * sigma

    def noise_deriv(self, t):
        return 1.0 + 0.0 * t


@dataclasses.dataclass(frozen=True)
class VPSchedulingFunctions(SchedulingFunctions):
    """Variance-preserving exponential beta schedule
    (schedulingfunctions.py:66-121): s(t) = exp(-e(t)/2),
    sigma(t) = sqrt(exp(e(t)) - 1) with e(t) = beta_d t^2/2 + beta_min t.
    """
    beta_data: float = 19.9
    beta_min: float = 0.1
    tag = "VP"

    def _exponent(self, t):
        return 0.5 * self.beta_data * t ** 2 + self.beta_min * t

    def _exponent_deriv(self, t):
        return self.beta_data * t + self.beta_min

    def scale(self, t):
        return jnp.exp(-self._exponent(t) / 2)

    def scale_deriv(self, t):
        return -self._exponent_deriv(t) / 2 * jnp.exp(-self._exponent(t) / 2)

    def noise(self, t):
        return jnp.sqrt(jnp.exp(self._exponent(t)) - 1.0)

    def inverse_noise(self, sigma):
        y = jnp.log(sigma ** 2 + 1.0)
        delta = self.beta_min ** 2 + 2 * self.beta_data * y
        return (-self.beta_min + jnp.sqrt(delta)) / self.beta_data

    def noise_deriv(self, t):
        e = jnp.exp(self._exponent(t))
        return self._exponent_deriv(t) * e / (2 * jnp.sqrt(e - 1.0))

    def pf_score_multiplier(self, t):
        return 0.5 * self._exponent_deriv(t)

    def pf_scale_multiplier(self, t):
        return -0.5 * self._exponent_deriv(t)

    def export_description(self):
        return {"tag": self.tag,
                "extra_args": {"beta_data": self.beta_data,
                               "beta_min": self.beta_min}}


@dataclasses.dataclass(frozen=True)
class VESchedulingFunctions(SchedulingFunctions):
    """Variance-exploding: sigma(t) = sqrt(t), s(t) = 1
    (schedulingfunctions.py:124-151)."""
    constant_scaling: bool = True
    has_pf_score_multiplier: bool = True
    tag = "VE"

    def scale(self, t):
        return 1.0 + 0.0 * t

    def scale_deriv(self, t):
        return 0.0 * t

    def noise(self, t):
        return jnp.sqrt(t)

    def inverse_noise(self, sigma):
        return sigma ** 2

    def noise_deriv(self, t):
        return 0.5 / jnp.sqrt(t)

    def pf_score_multiplier(self, t):
        return 0.5 + 0.0 * t


def name_to_scheduling_functions(name: str, **kwargs) -> SchedulingFunctions:
    """Factory mirroring schedulingfunctions.py:154-169."""
    if name == "EDM":
        return EDMSchedulingFunctions()
    if name == "VP":
        return VPSchedulingFunctions(**kwargs)
    if name == "VE":
        return VESchedulingFunctions(**kwargs)
    raise ValueError(f"Unknown scheduling function name: {name}")
