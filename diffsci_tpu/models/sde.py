"""Song-style SDE stack: VP/VE/subVP schedulers, Euler-Maruyama and
probability-flow samplers, denoising score-matching trainer.

Counterpart of the reference's legacy SDE stack (reference
diffsci/models/sde/, which its own __init__.py:1-3 marks "Old SDE models
code. Deprecated." and whose VP file warns "Don't trust this code",
vp_schedulers.py:7). This build provides a clean, working implementation:
the Karras formulation (diffsci_tpu.ops) subsumes these SDEs, but the
legacy API surface is kept for users migrating reference SDE code.

SDE: dX = f(t, X) dt + g(t) dW with
- VP:    f = -beta(t) X / 2, g = sqrt(beta(t)),
         std^2(t) = 1 - exp(-B(t)),        B = int beta
- subVP: same drift, g = sqrt(beta(t) (1 - exp(-2 B(t)))),
         std^2(t) = (1 - exp(-B(t)))^2
- VE:    f = 0, g = sqrt(d[sigma^2]/dt),   std^2(t) = sigma^2(t)
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from diffsci_tpu.utils import bcast_right


class SDEScheduler:
    """(reference sde/schedulers/sde_schedulers.py:6-135)"""

    def __init__(self, T: float = 1.0, Tmin: float = 1e-5,
                 stabilizer: float = 1e-8):
        self.T = T
        self.Tmin = Tmin
        # variance floor stabilizing the score near t -> 0; the reference
        # ignores its ctor arg and always uses the global constant 1e-8
        # (sde_schedulers.py:24-25, global_constants.py:1)
        self.stabilizer = stabilizer

    def mean(self, t, x):
        raise NotImplementedError

    def std2_(self, t):
        raise NotImplementedError

    def std2(self, t):
        return self.std2_(t) + self.stabilizer

    def std(self, t):
        return jnp.sqrt(self.std2(t))

    def drift_term(self, t, x):
        raise NotImplementedError

    def diffusion_term(self, t):
        raise NotImplementedError

    def sample_time(self, key, nbatch: int):
        u = jax.random.uniform(key, (nbatch,))
        return self.Tmin + u * (self.T - self.Tmin)

    def sample_fully_noised(self, key, nbatch: int, xshape):
        tT = jnp.full((nbatch,), self.T)
        noise = jax.random.normal(key, (nbatch,) + tuple(xshape))
        return bcast_right(self.std(tT), noise) * noise

    def sample_noise_at_t(self, key, t, x):
        """Returns (x_noised, noise)."""
        noise = jax.random.normal(key, x.shape, x.dtype)
        return self.mean(t, x) + bcast_right(self.std(t), x) * noise, noise


class VPScheduler(SDEScheduler):
    """(vp_schedulers.py:8-121)"""

    def beta(self, t):
        raise NotImplementedError

    def betaint(self, t):
        raise NotImplementedError

    def mean(self, t, x):
        return x * jnp.exp(-0.5 * bcast_right(self.betaint(t), x))

    def std2_(self, t):
        # -expm1, not 1-exp: XLA's vectorized exp can return >1 for tiny
        # negative args, driving 1-exp(-x) below -stabilizer -> sqrt NaN
        return -jnp.expm1(-self.betaint(t))

    def drift_term(self, t, x):
        return -0.5 * bcast_right(self.beta(t), x) * x

    def diffusion_term(self, t):
        return jnp.sqrt(self.beta(t))


class VPSchedulerConstant(VPScheduler):
    def __init__(self, T=1.0, Tmin=1e-5, coef: float = 1.0):
        super().__init__(T, Tmin)
        self.coef = coef

    def beta(self, t):
        return self.coef + 0.0 * t

    def betaint(self, t):
        return self.coef * t


class VPSchedulerLinear(VPScheduler):
    def __init__(self, T=1.0, Tmin=1e-5, coef: float = 1.0):
        super().__init__(T, Tmin)
        self.coef = coef

    def beta(self, t):
        return self.coef * t

    def betaint(self, t):
        return 0.5 * self.coef * t ** 2


class VPSchedulerCustom(VPScheduler):
    def __init__(self, beta: Callable, betaint: Callable, T=1.0, Tmin=1e-5):
        super().__init__(T, Tmin)
        self._beta = beta
        self._betaint = betaint

    def beta(self, t):
        return self._beta(t)

    def betaint(self, t):
        return self._betaint(t)


class SubVPScheduler(VPSchedulerLinear):
    """Proper sub-VP (Song et al. eq. 29): shrunken variance and matching
    diffusion (the reference's subvp file duplicates plain VP)."""

    def std2_(self, t):
        return jnp.expm1(-self.betaint(t)) ** 2

    def diffusion_term(self, t):
        return jnp.sqrt(self.beta(t) * -jnp.expm1(-2 * self.betaint(t)))


class VEScheduler(SDEScheduler):
    """(ve_schedulers.py): sigma(t) geometric between sigma_min/max."""

    def __init__(self, sigma_min: float = 0.01, sigma_max: float = 50.0,
                 T: float = 1.0, Tmin: float = 1e-5):
        super().__init__(T, Tmin)
        self.sigma_min = sigma_min
        self.sigma_max = sigma_max

    def sigma(self, t):
        return self.sigma_min * (self.sigma_max / self.sigma_min) ** (t / self.T)

    def mean(self, t, x):
        return x

    def std2_(self, t):
        return self.sigma(t) ** 2

    def drift_term(self, t, x):
        return jnp.zeros_like(x)

    def diffusion_term(self, t):
        # g^2 = d sigma^2/dt
        log_ratio = np.log(self.sigma_max / self.sigma_min)
        return self.sigma(t) * jnp.sqrt(2.0 * log_ratio / self.T)


class VESchedulerSqrt(SDEScheduler):
    """g(t) = sqrt(2t): std^2(t) = t^2 — the reference's only concrete
    VE instantiation (ve_schedulers.py:96-104)."""

    def mean(self, t, x):
        return x

    def std2_(self, t):
        return t ** 2

    def drift_term(self, t, x):
        return jnp.zeros_like(x)

    def diffusion_term(self, t):
        return jnp.sqrt(2.0 * t)


def sde_loss_fn(scheduler: SDEScheduler, noise_predictor, variables, key,
                x, y=None, train: bool = True, loss_metric: str = "mse",
                loss_scale_factor: float = 1.0, t=None, eps=None):
    """Denoising score matching with the reference's 1/std weighting
    (sdemodule.py:75-101, sdetrainers.py:114-148):
    ``scale * mean((1/std) * metric(std*score, -noise))``. Expressed in
    this stack's noise-prediction convention (pred == -std*score) the
    metric pair becomes (pred, noise) — identical values for the
    sign-symmetric mse/huber metrics. ``t``/``eps`` replay fixed draws
    (cross-framework parity hook)."""
    kt, kn, kd = jax.random.split(key, 3)
    if t is None:
        t = scheduler.sample_time(kt, x.shape[0])
    std = bcast_right(scheduler.std(t), x)
    if eps is None:
        x_noised, noise = scheduler.sample_noise_at_t(kn, t, x)
    else:
        noise = jnp.asarray(eps, x.dtype)
        x_noised = scheduler.mean(t, x) + std * noise
    rngs = {"dropout": kd} if train else None
    pred = noise_predictor(variables, x_noised, t, y, train=train, rngs=rngs)
    if loss_metric == "huber":
        from diffsci_tpu.ops import losses as losses_lib
        raw = losses_lib.huber(pred, noise)
    else:
        raw = (pred - noise) ** 2
    return loss_scale_factor * jnp.mean(raw / std)


def _score_from_noise(scheduler, noise_predictor, variables, x, t, y):
    eps = noise_predictor(variables, x, t, y, train=False, rngs=None)
    return -eps / bcast_right(scheduler.std(t), x)


def sde_sampler(scheduler: SDEScheduler, noise_predictor, variables, key,
                nsamples: int, shape, y=None, nsteps: int = 1000,
                record_history: bool = False):
    """Reverse-SDE Euler-Maruyama sampler (sde/samplers/sdesamplers.py:9)."""
    knoise, kscan = jax.random.split(key)
    x = scheduler.sample_fully_noised(knoise, nsamples, shape)
    ts = np.linspace(scheduler.T, scheduler.Tmin, nsteps + 1)
    dts = np.diff(ts)

    def body(carry, t_pair):
        xc, kc = carry
        kc, sub = jax.random.split(kc)
        t, dt = t_pair
        tb = jnp.full((nsamples,), t)
        score = _score_from_noise(scheduler, noise_predictor, variables,
                                  xc, tb, y)
        g = bcast_right(scheduler.diffusion_term(tb), xc)
        drift = scheduler.drift_term(tb, xc) - g ** 2 * score
        noise = jax.random.normal(sub, xc.shape, xc.dtype)
        xn = xc + drift * dt + g * noise * jnp.sqrt(-dt)
        return (xn, kc), (xn if record_history else None)

    pairs = jnp.asarray(np.stack([ts[:-1], dts], 1), jnp.float32)
    (x, _), ys = jax.lax.scan(body, (x, kscan), pairs)
    if record_history:
        return ys
    return x


def pf_sampler(scheduler: SDEScheduler, noise_predictor, variables, key,
               nsamples: int, shape, y=None, nsteps: int = 1000,
               record_history: bool = False, method: str = "heun",
               x0=None):
    """Probability-flow ODE sampler (sde/samplers/pfsamplers.py:103-125):
    dx = [f - g^2 score / 2] dt, Euler or Heun. ``x0`` overrides the
    fully-noised start (matches the reference's ``forward(x)`` entry)."""
    x = (scheduler.sample_fully_noised(key, nsamples, shape)
         if x0 is None else jnp.asarray(x0))
    nsamples = x.shape[0]
    ts = np.linspace(scheduler.T, scheduler.Tmin, nsteps + 1)

    def rhs(xc, t):
        tb = jnp.full((nsamples,), t)
        score = _score_from_noise(scheduler, noise_predictor, variables,
                                  xc, tb, y)
        g = bcast_right(scheduler.diffusion_term(tb), xc)
        return scheduler.drift_term(tb, xc) - 0.5 * g ** 2 * score

    def body(carry, t_pair):
        xc, = carry
        # carry the exact next grid time: recomputing t + dt in float32
        # can round below 0 at the final step and NaN sqrt(beta(t))
        t, t_next = t_pair
        dt = t_next - t
        r1 = rhs(xc, t)
        if method == "euler":
            xn = xc + dt * r1
        else:
            xe = xc + dt * r1
            r2 = rhs(xe, t_next)
            xn = xc + 0.5 * dt * (r1 + r2)
        return (xn,), (xn if record_history else None)

    pairs = jnp.asarray(np.stack([ts[:-1], ts[1:]], 1), jnp.float32)
    (x,), ys = jax.lax.scan(body, (x,), pairs)
    if record_history:
        return ys
    return x


class SDEModel:
    """Legacy-style SDE runtime (sde/lmodules analogue)."""

    def __init__(self, model, scheduler: SDEScheduler,
                 conditional: bool = False):
        self.model = model
        self.scheduler = scheduler
        self.conditional = conditional

    def init(self, key, x_shape, y=None):
        kp, kd = jax.random.split(key)
        x = jnp.zeros(x_shape, jnp.float32)
        t = jnp.ones((x_shape[0],), jnp.float32)
        return self.model.init({"params": kp, "dropout": kd}, x, t, y)

    def noise_predictor(self, variables, x, t, y=None, train=False,
                        rngs=None):
        return self.model.apply(variables, x, t, y, train=train, rngs=rngs)

    def loss_fn(self, variables, key, x, y=None, train: bool = True,
                **kwargs):
        return sde_loss_fn(self.scheduler, self.noise_predictor, variables,
                           key, x, y, train, **kwargs)

    def sample(self, variables, key, nsamples, shape, y=None,
               nsteps: int = 1000, probability_flow: bool = False,
               record_history: bool = False):
        fn = pf_sampler if probability_flow else sde_sampler
        return fn(self.scheduler, self.noise_predictor, variables, key,
                  nsamples, shape, y, nsteps, record_history)
