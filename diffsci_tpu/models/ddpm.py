"""DDPM v2: discrete-time denoising diffusion (DDPM / DDIM).

TPU-native redesign of the reference ddpm/v2 stack (reference
diffsci/models/ddpm/v2/{schedulers,integrators,ddpmmodule}.py). Key
translation: the reference's ClassicalDDPMScheduler computes alpha-bar with
a per-element Python loop over cumulative products
(v2/schedulers.py:63-85); here the alpha-bar table for t = 0..T is
precomputed once on the host (T is static) and traced lookups are a gather
— the backward propagation loop becomes a lax.scan over the t grid.

Noise-predictor convention: model(x, t, y) predicts epsilon with t the
integer timestep cast to float (matching the reference module's
noise_predictor wiring, v2/ddpmmodule.py:158-276).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from diffsci_tpu.utils import bcast_right
from diffsci_tpu.kernels import fused_precondition as fp
from diffsci_tpu.ops.losses import huber as huber_loss


class DDPMScheduler:
    """alpha-bar schedule over T discrete steps (v2/schedulers.py:8-45)."""

    def __init__(self, T: int = 1000):
        self.T = T

    def calpha_norm(self, s):
        raise NotImplementedError

    def calpha(self, t, T: int | None = None):
        T = self.T if T is None else T
        return self.calpha_norm(t / T)

    def alpha(self, t, T: int | None = None):
        return self.calpha(t, T) / self.calpha(t - 1, T)

    def beta(self, t, T: int | None = None):
        return 1 - self.alpha(t, T)


class ClassicalDDPMScheduler(DDPMScheduler):
    """Linear-beta schedule with host-precomputed alpha-bar table
    (v2/schedulers.py:48-97)."""

    def __init__(self, beta1T: float = 20.0, beta0: float = 1e-4,
                 T: int = 1000):
        super().__init__(T)
        self.beta1T = beta1T
        self.beta0 = beta0
        self._tables: dict[int, np.ndarray] = {}

    def _beta_np(self, t, T):
        s = (t - 1) / (T - 1)
        return self.beta0 * (1 - s) + self.beta1T / T * s

    def _table(self, T: int) -> np.ndarray:
        if T not in self._tables:
            ts = np.arange(1, T + 1, dtype=np.float64)
            alphas = 1.0 - self._beta_np(ts, T)
            table = np.concatenate([[1.0], np.cumprod(alphas)])
            self._tables[T] = table.astype(np.float32)
        return self._tables[T]

    def calpha(self, t, T: int | None = None):
        T = self.T if T is None else T
        table = jnp.asarray(self._table(T))
        idx = jnp.clip(jnp.round(t).astype(jnp.int32), 0, T)
        return table[idx]

    def beta(self, t, T: int | None = None):
        T = self.T if T is None else T
        s = (t - 1) / (T - 1)
        return self.beta0 * (1 - s) + self.beta1T / T * s

    def alpha(self, t, T: int | None = None):
        return 1.0 - self.beta(t, T)


class ExpDDPMScheduler(DDPMScheduler):
    """(v2/schedulers.py:100-114)"""

    def __init__(self, beta_data: float = 19.9, beta0: float = 1e-4,
                 T: int = 1000):
        super().__init__(T)
        self.beta_data = beta_data
        self.beta0 = beta0

    def calpha_norm(self, s):
        return jnp.exp(-0.5 * (self.beta_data * s ** 2 + self.beta0))


class CosineDDPMScheduler(DDPMScheduler):
    """(v2/schedulers.py:117-131)"""

    def __init__(self, stabilizer: float = 0.008, T: int = 1000):
        super().__init__(T)
        self.stabilizer = stabilizer
        self.f0 = math.cos(stabilizer / (1 + stabilizer) * math.pi / 2) ** 2

    def calpha_norm(self, s):
        ft = jnp.cos((self.stabilizer + s) / (1 + self.stabilizer)
                     * jnp.pi / 2) ** 2
        return ft / self.f0


def _name_to_scheduler(name: str) -> DDPMScheduler:
    return {"classical": ClassicalDDPMScheduler,
            "exp": ExpDDPMScheduler,
            "cosine": CosineDDPMScheduler}[name]()


class DDPMIntegratorBase:
    """Backward/forward discrete-time propagation via lax.scan
    (v2/integrators.py:18-42)."""

    def __init__(self, scheduler: DDPMScheduler):
        self.scheduler = scheduler

    def step_backward(self, key, x, t, noise_predictor, T, noise=None):
        raise NotImplementedError

    def propagate_backward(self, key, x, noise_predictor,
                           nsteps: int | None = None,
                           record_history: bool = False,
                           noise_seq=None):
        """``noise_seq`` [T, *x.shape]: replay fixed per-step draws
        instead of splitting the key — the cross-framework parity hook
        (the JAX analogue of seeding the reference's torch.randn_like,
        v2/integrators.py:44-63)."""
        T = self.scheduler.T if nsteps is None else nsteps
        ts = jnp.arange(T, 0, -1, dtype=jnp.float32)
        xs = {"t": ts}
        if noise_seq is not None:
            xs["noise"] = jnp.asarray(noise_seq, x.dtype)

        def body(carry, xrow):
            xc, kc = carry
            kc, sub = jax.random.split(kc)
            xn = self.step_backward(sub, xc, xrow["t"], noise_predictor, T,
                                    noise=xrow.get("noise"))
            return (xn, kc), (xn if record_history else None)

        (xf, _), ys = jax.lax.scan(body, (x, key), xs)
        if record_history:
            return jnp.concatenate([x[None], ys], axis=0)
        return xf

    def propagate_forward(self, key, x, nsteps: int | None = None,
                          record_history: bool = False, noise_seq=None):
        T = self.scheduler.T if nsteps is None else nsteps
        ts = jnp.arange(T, 0, -1, dtype=jnp.float32)
        xs = {"t": ts}
        if noise_seq is not None:
            xs["noise"] = jnp.asarray(noise_seq, x.dtype)

        def body(carry, xrow):
            xc, kc = carry
            kc, sub = jax.random.split(kc)
            xn = self.step_forward(sub, xc, xrow["t"], T,
                                   noise=xrow.get("noise"))
            return (xn, kc), (xn if record_history else None)

        (xf, _), ys = jax.lax.scan(body, (x, key), xs)
        if record_history:
            return jnp.concatenate([x[None], ys], axis=0)
        return xf

    def step_forward(self, key, x, t, T, noise=None):
        raise NotImplementedError


class ClassicalDDPMIntegrator(DDPMIntegratorBase):
    """DDPM-paper formulation (v2/integrators.py:44-129)."""

    def noise_injector(self, t, T):
        raise NotImplementedError

    def step_backward(self, key, x, t, noise_predictor, T, noise=None):
        # coefficients at [B]; the update runs as ONE fused pass
        # (kernels/fused_precondition.fused_lincomb3) — on TPU the C=1
        # channels-last elementwise chain would otherwise move 128x its
        # logical bytes per step, hundreds of times per sample
        tb = jnp.broadcast_to(t, (x.shape[0],))
        sigma_t = self.noise_injector(tb, T)
        calpha_t = self.scheduler.calpha(tb, T)
        alpha_t = self.scheduler.alpha(tb, T)
        beta_t = 1 - alpha_t
        eps = noise_predictor(x, tb)
        if noise is None:
            noise = jax.random.normal(key, x.shape, x.dtype)
        inv_sa = 1.0 / jnp.sqrt(alpha_t)
        a = inv_sa
        b = -beta_t / jnp.sqrt(1 - calpha_t) * inv_sa
        return fp.fused_lincomb3(x, eps, noise, a, b, sigma_t)

    def step_forward(self, key, x, t, T, noise=None):
        tb = jnp.broadcast_to(t, (x.shape[0],))
        beta_t = self.scheduler.beta(tb, T)
        if noise is None:
            noise = jax.random.normal(key, x.shape, x.dtype)
        return fp.fused_axby(x, noise, jnp.sqrt(1 - beta_t),
                             jnp.sqrt(beta_t))


class ClassicalDDPMIntegratorType1(ClassicalDDPMIntegrator):
    """sigma_t = sqrt(beta_t) (v2/integrators.py:131-137)."""

    def noise_injector(self, t, T):
        return jnp.sqrt(self.scheduler.beta(t, T))


class ClassicalDDPMIntegratorType2(ClassicalDDPMIntegrator):
    """sigma_t^2 = (1 - abar_{t-1})/(1 - abar_t) beta_t
    (v2/integrators.py:139-149)."""

    def noise_injector(self, t, T):
        calpha_prev = self.scheduler.calpha(t - 1, T)
        calpha = self.scheduler.calpha(t, T)
        beta = self.scheduler.beta(t, T)
        return jnp.sqrt((1 - calpha_prev) / (1 - calpha) * beta)


class GeneralizedDDPMIntegrator(DDPMIntegratorBase):
    """DDIM-paper formulation (v2/integrators.py:152-232)."""

    def noise_injector(self, t, T):
        raise NotImplementedError

    def step_backward(self, key, x, t, noise_predictor, T, noise=None):
        tb = jnp.broadcast_to(t, (x.shape[0],))
        sigma_t = self.noise_injector(tb, T)
        calpha_t = self.scheduler.calpha(tb, T)
        calpha_prev = self.scheduler.calpha(tb - 1, T)
        eps = noise_predictor(x, tb)
        if noise is None:
            noise = jax.random.normal(key, x.shape, x.dtype)
        # x0_dir + xt_dir + sigma*noise folded to a·x + b·eps + c·noise
        inv_sca = 1.0 / jnp.sqrt(calpha_t)
        a = jnp.sqrt(calpha_prev) * inv_sca
        xt_factor = jax.nn.relu(1 - calpha_prev - sigma_t ** 2)
        b = jnp.sqrt(xt_factor) - a * jnp.sqrt(1 - calpha_t)
        return fp.fused_lincomb3(x, eps, noise, a, b, sigma_t)

    def step_forward(self, key, x, t, T, noise=None):
        tb = jnp.broadcast_to(t, (x.shape[0],))
        calpha_t = self.scheduler.calpha(tb, T)
        calpha_prev = self.scheduler.calpha(tb - 1, T)
        if noise is None:
            noise = jax.random.normal(key, x.shape, x.dtype)
        ratio = calpha_t / calpha_prev
        return fp.fused_axby(x, noise, jnp.sqrt(ratio), 1 - ratio)


class DDPMIntegrator(GeneralizedDDPMIntegrator):
    """(v2/integrators.py:234-246)"""

    def noise_injector(self, t, T):
        calpha_t = self.scheduler.calpha(t, T)
        calpha_prev = self.scheduler.calpha(t - 1, T)
        return jnp.sqrt((1 - calpha_prev) / (1 - calpha_t)
                        * (1 - calpha_t / calpha_prev))


class DDIMIntegrator(GeneralizedDDPMIntegrator):
    """Deterministic DDIM: sigma = 0 (v2/integrators.py:248-253)."""

    def noise_injector(self, t, T):
        return 0.0 * t


class DDPMModelConfig:
    """(v2/ddpmmodule.py:12-76)"""

    def __init__(self, scheduler: DDPMScheduler,
                 integrator: DDPMIntegratorBase,
                 loss_metric: str = "huber"):
        self.scheduler = scheduler
        self.integrator = integrator
        self.loss_metric = loss_metric

    @classmethod
    def from_classical_ddpm(cls, integrator_type: int = 1,
                            scheduler: str = "classical"):
        sched = _name_to_scheduler(scheduler)
        integ = (ClassicalDDPMIntegratorType1(sched) if integrator_type == 1
                 else ClassicalDDPMIntegratorType2(sched))
        return cls(sched, integ)

    @classmethod
    def from_ddpm(cls, scheduler: str = "classical"):
        sched = _name_to_scheduler(scheduler)
        return cls(sched, DDPMIntegrator(sched))

    @classmethod
    def from_ddim(cls, scheduler: str = "classical"):
        sched = _name_to_scheduler(scheduler)
        return cls(sched, DDIMIntegrator(sched))


class DDPMModel:
    """Functional DDPM runtime (v2/ddpmmodule.py:77-276): epsilon-prediction
    loss + discrete-time sampling."""

    def __init__(self, model, config: DDPMModelConfig,
                 conditional: bool = False, compute_dtype=None):
        """``compute_dtype``: bf16 mixed precision for the noise-predictor
        forward; alpha-bar math and the loss stay float32 (same contract
        as KarrasModel)."""
        self.model = model
        self.config = config
        self.conditional = conditional
        self.compute_dtype = compute_dtype
        if config.loss_metric == "mse":
            self._loss = lambda a, b: (a - b) ** 2
        elif config.loss_metric == "huber":
            self._loss = huber_loss
        else:
            raise ValueError(
                f"loss_type {config.loss_metric} not recognized")

    def init(self, key, x_shape, y=None):
        kp, kd = jax.random.split(key)
        x = jnp.zeros(x_shape, jnp.float32)
        t = jnp.ones((x_shape[0],), jnp.float32)
        return self.model.init({"params": kp, "dropout": kd}, x, t, y)

    def noise_predictor(self, variables, x, t, y=None, train=False,
                        rngs=None):
        cd = self.compute_dtype
        if cd is None:
            return self.model.apply(variables, x, t, y, train=train,
                                    rngs=rngs)

        def cast(p):
            return (p.astype(cd) if hasattr(p, "dtype")
                    and jnp.issubdtype(p.dtype, jnp.floating) else p)
        out = self.model.apply(jax.tree.map(cast, variables), cast(x),
                               cast(t), jax.tree.map(cast, y)
                               if y is not None else None,
                               train=train, rngs=rngs)
        return out.astype(jnp.float32)

    def sample_timestep(self, key, nsamples: int):
        """Uniform integer t in [1, T] (v2/ddpmmodule.py:206-214)."""
        return jax.random.randint(key, (nsamples,), 1,
                                  self.config.scheduler.T + 1
                                  ).astype(jnp.float32)

    def loss_fn(self, variables, key, x, t, y=None, train: bool = True,
                eps=None):
        """epsilon-matching loss (v2/ddpmmodule.py:158-205). ``eps``
        replays a fixed noise draw (cross-framework parity hook)."""
        knoise, kdrop = jax.random.split(key)
        noise = (jax.random.normal(knoise, x.shape, x.dtype)
                 if eps is None else jnp.asarray(eps, x.dtype))
        calpha = bcast_right(self.config.scheduler.calpha(t), x)
        x_noised = jnp.sqrt(calpha) * x + jnp.sqrt(1 - calpha) * noise
        rngs = {"dropout": kdrop} if train else None
        eps_pred = self.noise_predictor(variables, x_noised, t, y,
                                        train=train, rngs=rngs)
        return jnp.mean(self._loss(eps_pred, noise))

    def sample(self, variables, key, nsamples: int, shape, y=None,
               nsteps: int | None = None, record_history: bool = False,
               mesh=None):
        knoise, kprop = jax.random.split(key)
        x = jax.random.normal(knoise, (nsamples,) + tuple(shape))
        if mesh is not None:
            # data-parallel sampling (same contract as
            # KarrasModel.sample(mesh=...); constrain_batch raises on
            # indivisible batches)
            from diffsci_tpu.parallel.mesh import constrain_batch
            x = constrain_batch(x, mesh)

        def noise_predictor(xx, tt):
            return self.noise_predictor(variables, xx, tt, y)

        return self.config.integrator.propagate_backward(
            kprop, x, noise_predictor, nsteps,
            record_history=record_history)
