"""ODE/SDE integrator step functions.

TPU-native redesign of the reference integrators
(reference diffsci/models/karras/integrators.py:17-126). Each integrator is a
pure per-step function designed to be the body of a ``lax.scan``:

- randomness comes from an explicit per-step PRNG key (replacing
  ``torch.randn_like``),
- per-step data-dependent knobs (Karras churn gamma, Langevin gate) are
  precomputed on the host as numpy arrays by ``scan_extras`` and fed through
  the scan's ``xs``, so the scan body contains no data-dependent control
  flow,
- the Heun endpoint special case (``t + dt == 0``, integrators.py:44-53) is
  resolved *statically*: schedulers know their final grid point and call
  ``step(..., endpoint=True)`` outside the scan, which drops the second rhs
  evaluation exactly as the reference does.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

# rhs(x, t) -> dx/dt with t a traced scalar; closes over score_fn & gates.
RHSFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class Integrator:
    stochastic: bool = False
    evaluates_endpoint: bool = False  # whether step() calls rhs at t + dt
    has_carry = False  # multistep integrators thread extra scan state

    def scan_extras(self, t: np.ndarray, dt: np.ndarray,
                    nsteps: int) -> dict:
        """Host-side per-step arrays threaded through the scan xs."""
        return {}

    def step(self, key, x, t, dt, rhs: RHSFn, noise_strength, extras: dict,
             endpoint: bool = False):
        raise NotImplementedError

    # -- multistep support (has_carry=True integrators override these) --
    def init_carry(self, x):
        return None

    def step_carry(self, key, x, carry, t, dt, rhs, noise_strength,
                   extras, endpoint: bool = False):
        """(x, carry) -> (x_next, carry_next); default = stateless step."""
        return self.step(key, x, t, dt, rhs, noise_strength, extras,
                         endpoint=endpoint), carry


@dataclasses.dataclass(frozen=True)
class EulerIntegrator(Integrator):
    """x <- x + dt * rhs(x, t) (integrators.py:29-35)."""
    tag = "euler"

    def step(self, key, x, t, dt, rhs, noise_strength, extras,
             endpoint: bool = False):
        return x + dt * rhs(x, t)


@dataclasses.dataclass(frozen=True)
class HeunIntegrator(Integrator):
    """2nd-order Heun with the EDM endpoint rule (integrators.py:38-54).

    At the endpoint (t + dt == 0) the corrector slope equals the predictor
    slope, so the update degenerates to a plain Euler step.
    """
    evaluates_endpoint: bool = True
    tag = "heun"

    def step(self, key, x, t, dt, rhs, noise_strength, extras,
             endpoint: bool = False):
        rhs_euler = rhs(x, t)
        if endpoint:
            return x + dt * rhs_euler
        x_euler = x + dt * rhs_euler
        rhs_heun = rhs(x_euler, t + dt)
        return x + 0.5 * (rhs_euler + rhs_heun) * dt


@dataclasses.dataclass(frozen=True)
class EulerMaruyamaIntegrator(Integrator):
    """Stochastic Euler-Maruyama (integrators.py:57-69):
    x <- x + rhs dt + g(t) * N(0, I) * sqrt(|dt|)."""
    stochastic: bool = True
    tag = "euler-maruyama"

    def step(self, key, x, t, dt, rhs, noise_strength, extras,
             endpoint: bool = False):
        # the gate reaches BOTH the Langevin drift term inside rhs and the
        # injected-noise strength (reference schedulers.py:227-236 gates
        # langevin_factor itself, which feeds both)
        gate = extras.get("gate", 1.0)
        drift = x + rhs(x, t, gate) * dt
        g = noise_strength(t, gate)
        # 'noise' in extras = replayed sequence (scheduler noise_seq),
        # used by the cross-framework stochastic parity tests
        noise = extras.get("noise")
        if noise is None:
            noise = jax.random.normal(key, x.shape, x.dtype)
        return drift + g * noise * jnp.sqrt(jnp.abs(dt))


@dataclasses.dataclass(frozen=True)
class KarrasIntegrator(Integrator):
    """EDM stochastic churn integrator (integrators.py:72-113):
    temporarily raises the noise level by gamma (precomputed per step on the
    host, including the S_churn/nsteps cap and the [S_tmin, S_tmax] window),
    then takes a Heun step from the churned state down to t + dt.

    Needs the scheduling functions to convert between t and sigma.
    """
    s_churn: float = 40.0
    s_tmin: float = 0.05
    s_tmax: float = 50.0
    s_noise: float = 1.003
    scheduling: object = None  # SchedulingFunctions
    evaluates_endpoint: bool = True
    tag = "karras"

    def scan_extras(self, t: np.ndarray, dt: np.ndarray, nsteps: int) -> dict:
        backstep = min(self.s_churn / nsteps, math.sqrt(2.0) - 1.0)
        gamma = np.full(t.shape, backstep, dtype=np.float64)
        if self.s_tmin is not None:
            inside = (t >= self.s_tmin) & (t <= self.s_tmax)
            gamma = np.where(inside, gamma, 0.0)
        return {"gamma": gamma.astype(np.float32)}

    def step(self, key, x, t, dt, rhs, noise_strength, extras,
             endpoint: bool = False):
        sf = self.scheduling
        gamma = extras["gamma"]
        sigma = sf.noise(t)
        sigma_noise = sigma + gamma * sigma
        t_noise = sf.inverse_noise(sigma_noise)
        scale = sf.scale(t)
        scale_noise = sf.scale(t_noise)
        # clamp: XLA's FMA fusion can make sigma_noise^2 - sigma^2 tiny
        # negative when gamma == 0, which would sqrt to NaN
        std = scale_noise * jnp.sqrt(
            jnp.maximum(sigma_noise ** 2 - sigma ** 2, 0.0))
        noise = extras.get("noise")
        if noise is None:
            noise = jax.random.normal(key, x.shape, x.dtype)
        x_noise = (scale_noise / scale) * x + std * self.s_noise * noise

        rhs_euler = rhs(x_noise, t_noise)
        dt_noise = (t + dt) - t_noise
        x_euler = x_noise + dt_noise * rhs_euler
        if endpoint:
            return x_euler
        rhs_heun = rhs(x_euler, t + dt)
        return x_noise + 0.5 * (rhs_euler + rhs_heun) * dt_noise


@dataclasses.dataclass(frozen=True)
class DPMSolverPlusPlus2M(Integrator):
    """DPM-Solver++(2M) (Lu et al. 2022), the deterministic 2nd-order
    multistep sampler, in the sigma parameterization — one network
    evaluation per step (vs Heun's two) at comparable accuracy.

    Beyond-parity addition (the reference has Euler/Heun/EM/churn only).
    Valid for identity-scale schedulers (EDM/VE rho grids), where the
    denoiser is recoverable from the PF-ODE rhs as D = x - sigma*rhs:

        h        = ln(sigma) - ln(sigma_next)
        r        = h_prev / h
        D~       = (1 + 1/(2r)) D - 1/(2r) D_prev     (first step: D~ = D)
        x_next   = (sigma_next/sigma) x + (1 - sigma_next/sigma) D~

    The final grid point sigma_next = 0 degenerates to x_next = D~.
    """
    tag = "dpmpp2m"
    has_carry = True

    def init_carry(self, x):
        return {"d_prev": jnp.zeros_like(x),
                "h_prev": jnp.zeros((), jnp.float32),
                "has_prev": jnp.zeros((), jnp.float32)}

    def step_carry(self, key, x, carry, t, dt, rhs, noise_strength,
                   extras, endpoint: bool = False):
        eps = 1e-20
        sigma = t
        sigma_next = t + dt
        d = x - sigma * rhs(x, sigma)
        ratio = sigma_next / jnp.maximum(sigma, eps)
        h = (jnp.log(jnp.maximum(sigma, eps))
             - jnp.log(jnp.maximum(sigma_next, eps)))
        r = carry["h_prev"] / jnp.maximum(h, eps)
        # drop to first order on: the first step; the final step to
        # sigma=0 (k-diffusion's guard — h blows up and 1/(2r) amplifies
        # D - D_prev noise); and any non-decreasing-sigma step (forward
        # propagation has h < 0, where the clamped 1/(2r) would be ~5e19
        # and produce NaN — first-order per step is exact DDIM inversion)
        use_2m = (carry["has_prev"] > 0) & (sigma_next > 0) & (h > eps) \
            & (carry["h_prev"] > eps)
        coef = jnp.where(use_2m, 1.0 / (2.0 * jnp.maximum(r, eps)), 0.0)
        d_tilde = (1.0 + coef) * d - coef * carry["d_prev"]
        x_next = ratio * x + (1.0 - ratio) * d_tilde
        new_carry = {"d_prev": d, "h_prev": h,
                     "has_prev": jnp.ones((), jnp.float32)}
        return x_next, new_carry


def name_to_integrator(name: str, scheduling=None) -> Integrator:
    """Factory mirroring integrators.py:116-126 (+ dpmpp2m,
    beyond-parity)."""
    if name == "euler":
        return EulerIntegrator()
    if name == "heun":
        return HeunIntegrator()
    if name == "euler-maruyama":
        return EulerMaruyamaIntegrator()
    if name == "karras":
        return KarrasIntegrator(scheduling=scheduling)
    if name == "dpmpp2m":
        return DPMSolverPlusPlus2M()
    raise ValueError(f"Unknown integrator: {name}")
