"""DDPM v1 compatibility layer.

The reference keeps a deprecated pre-Lightning DDPM stack
(reference diffsci/models/ddpm/v1/{ddpmscheduler,ddpmmodule,ddpmsampler,
ddpmtrainer}.py; its README deprecates it: ddpm/README.md:20-26). Its
conventions differ from v2 in ways that matter for checkpoint and
result reproduction, so this module reproduces them exactly (pinned
against executed-reference fixtures, tests/test_ddpm_v1.py):

- 1-indexed steps t in {1..T}; linear beta interpolates with
  s = (t-1)/(T-1) between beta0 and beta1 directly
  (ddpmscheduler.py:30-45) — v2 uses beta0 + t*beta1T/T^2.
- eps-prediction loss with optional 'default' lambda weighting
  lambda = beta^2 / (2 beta alpha (1-calpha)) (ddpmmodule.py:123-147).
- ancestral sampler with noise_type 1 (sigma = sqrt(1-alpha)) or 2
  (sigma-tilde) (ddpmsampler.py:61-104); DDIM variant whose
  'predicted term' divides by sqrt(alpha_t) — NOT sqrt(calpha_t) as in
  Song et al. — reproduced as-executed (ddpmsampler.py:186-188).
- upstream quirk, not reproduced: v1's Scheduler.schedule(reverse=...)
  ignores its argument (`if reversed:` tests the truthy builtin,
  ddpmscheduler.py:116-129); here ``schedule`` honours ``reverse``.

TPU design: calpha is a host-side static table (cumprod over the full
1..T grid, gathered with jnp.take under jit — the reference loops a
python cumprod per batch element on device, ddpmscheduler.py:77-98);
sampling runs the whole reverse process in one ``lax.scan``; training
reuses the shared jitted train-step machinery (make_train_step with a
custom loss_fn) instead of v1's hand-rolled torch loop
(ddpmtrainer.py:10-341), with ``cosine_restarts_schedule`` standing in
for its CosineAnnealingWarmRestarts default.

For new work prefer :mod:`diffsci_tpu.models.ddpm` (the v2 stack), as
the reference's own README instructs.
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp


def _bcast(v, x):
    """[B] -> [B, 1, ...] matching x (torchutils.broadcast_from_below)."""
    return v.reshape(v.shape + (1,) * (x.ndim - 1))


class DDPMSchedulerV1:
    """reference ddpm/v1/ddpmscheduler.py:6-129."""

    def __init__(self, beta0: float = 1e-4, beta1: float = 2e-2,
                 T: int = 1000):
        self.beta0 = float(beta0)
        self.beta1 = float(beta1)
        self.T = int(T)
        # static host-side tables over t = 1..T
        t = np.arange(1, self.T + 1, dtype=np.float64)
        s = (t - 1.0) / (self.T - 1.0)
        beta = self.beta0 * (1.0 - s) + self.beta1 * s
        self._beta_table = beta.astype(np.float32)
        self._calpha_table = np.cumprod(1.0 - beta).astype(np.float32)

    def beta(self, t):
        s = (t - 1.0) / (self.T - 1.0)
        return self.beta0 * (1.0 - s) + self.beta1 * s

    def alpha(self, t):
        return 1.0 - self.beta(t)

    def sigma(self, t):
        return jnp.sqrt(self.beta(t))

    def calpha(self, t):
        """cumprod_{s<=t} alpha(s), gathered from the static table."""
        idx = jnp.clip(jnp.asarray(t, jnp.int32) - 1, 0, self.T - 1)
        return jnp.take(jnp.asarray(self._calpha_table), idx)

    def sample(self, key, nbatch: int):
        """Uniform t ~ {1..T} (ddpmscheduler.py:100-113)."""
        return jax.random.randint(key, (nbatch,), 1, self.T + 1)

    def schedule(self, reverse: bool = False) -> np.ndarray:
        t = np.arange(1, self.T + 1)
        return t[::-1] if reverse else t


class DDPMModuleV1:
    """reference ddpm/v1/ddpmmodule.py:8-194 + ddpmsampler.py:8-204,
    as pure functions over flax variables.

    ``model``: flax module called as model.apply(variables, x, t[, y]).
    """

    def __init__(self, model, scheduler: DDPMSchedulerV1 | None = None,
                 conditional: bool = False, loss_type: str = "mse",
                 loss_scale_factor: float = 1.0,
                 loss_scaling: str = "constant"):
        if loss_type not in ("mse", "huber"):
            raise ValueError(f"loss_type {loss_type} not recognized")
        self.model = model
        self.scheduler = scheduler or DDPMSchedulerV1()
        self.conditional = conditional
        self.loss_type = loss_type
        self.loss_scale_factor = float(loss_scale_factor)
        self.loss_scaling = loss_scaling

    # --- setup ---
    def init(self, key, x_shape, y=None):
        x = jnp.zeros(x_shape, jnp.float32)
        t = jnp.ones((x_shape[0],), jnp.float32)
        args = (x, t, y) if self.conditional else (x, t)
        return self.model.init(key, *args)

    def _net(self, variables, x, t, y):
        args = (x, t, y) if self.conditional else (x, t)
        return self.model.apply(variables, *args)

    # --- training (ddpmmodule.py:106-147) ---
    def _metric(self, pred, target):
        if self.loss_type == "mse":
            return (pred - target) ** 2
        d = jnp.abs(pred - target)  # huber, delta=1 (torch default)
        return jnp.where(d < 1.0, 0.5 * d ** 2, d - 0.5)

    def loss_fn(self, variables, key, x, t=None, y=None, noise=None):
        if self.conditional:
            assert y is not None
        else:
            assert y is None
        if t is None:
            key, kt = jax.random.split(key)
            t = self.scheduler.sample(kt, x.shape[0]).astype(jnp.float32)
        calpha = _bcast(self.scheduler.calpha(t), x)
        if self.loss_scaling == "default":
            beta = self.scheduler.beta(t)
            alpha = 1.0 - beta
            lambd = _bcast(beta ** 2 / (2 * beta * alpha
                                        * (1 - self.scheduler.calpha(t))), x)
        else:
            lambd = 1.0
        if noise is None:
            noise = jax.random.normal(key, x.shape, x.dtype)
        x_noised = jnp.sqrt(calpha) * x + jnp.sqrt(1 - calpha) * noise
        pred = self._net(variables, x_noised, t, y)
        loss = jnp.mean(lambd * self._metric(pred, noise))
        return self.loss_scale_factor * loss

    # --- sampling (ddpmsampler.py) ---
    def apply_noise(self, key, x, t, noise=None):
        calpha = _bcast(self.scheduler.calpha(t), x)
        if noise is None:
            noise = jax.random.normal(key, x.shape, x.dtype)
        return jnp.sqrt(calpha) * x + jnp.sqrt(1 - calpha) * noise

    def backward(self, variables, key, x, y=None,
                 noise_type: int | None = None,
                 sampler: str = "ddpm", noise_seq=None):
        """Full reverse process T..1 in one lax.scan.

        ``noise_seq`` ([T, *x.shape], t=T first) replays fixed draws —
        the replay hook mirroring the golden fixtures. The t=1 step uses
        no noise (z = 0), matching the reference's ``if t > 1`` gate.

        ``noise_type=None`` resolves per sampler, matching the reference
        class defaults: 1 for DDPM (ddpmsampler.py:10) and 0 — a
        deterministic DDIM — for DDIM (ddpmsampler.py:112).
        """
        if noise_type is None:
            noise_type = 0 if sampler == "ddim" else 1
        sched = self.scheduler
        T = sched.T
        if y is not None and y.ndim == x.ndim - 1:
            y = y[None]  # reference unsqueezes a single conditioning row
        ts = jnp.asarray(sched.schedule(reverse=True), jnp.float32)
        if noise_seq is None:
            keys = jax.random.split(key, T)
            xs = (ts, keys)

            def draw(per, shape, dtype):
                return jax.random.normal(per, shape, dtype)
        else:
            xs = (ts, jnp.asarray(noise_seq, x.dtype))

            def draw(per, shape, dtype):
                return per

        def body(carry, inp):
            xc = carry
            t, per = inp
            tb = jnp.full((xc.shape[0],), t, xc.dtype)
            calpha = _bcast(sched.calpha(tb), xc)
            alpha = _bcast(1.0 - sched.beta(tb), xc)
            eps = self._net(variables, xc, tb, y)
            z = jnp.where(t > 1.0,
                          draw(per, xc.shape, xc.dtype),
                          jnp.zeros_like(xc))
            if sampler == "ddpm":
                if noise_type == 1:
                    sig = jnp.sqrt(1 - alpha)
                elif noise_type == 2:
                    calpha_prev = calpha / alpha
                    sig = jnp.sqrt((1 - alpha) * (1 - calpha_prev)
                                   / (1 - calpha))
                else:
                    sig = 0.0
                xn = (xc - (1 - alpha) / jnp.sqrt(1 - calpha) * eps) \
                    / jnp.sqrt(alpha) + sig * z
            elif sampler == "ddim":
                calpha_prev = calpha / alpha
                if noise_type == 1:
                    sig = jnp.sqrt(1 - alpha)
                elif noise_type == 2:
                    sig = jnp.sqrt((1 - alpha) * (1 - calpha_prev)
                                   / (1 - calpha))
                else:
                    sig = jnp.zeros_like(alpha)
                predicted = (xc - jnp.sqrt(1 - calpha) * eps) \
                    / jnp.sqrt(alpha)
                pointing = jnp.sqrt(jnp.maximum(
                    1 - calpha_prev - sig ** 2, 0.0)) * eps
                xn = predicted + pointing + sig * z
            else:
                raise ValueError(f"sampler {sampler!r} not recognized")
            return xn, None

        out, _ = jax.lax.scan(body, x, xs)
        return out

    def sample(self, variables, key, nsamples: int, shape, y=None,
               **kw):
        kx, kb = jax.random.split(key)
        x = jax.random.normal(kx, (nsamples,) + tuple(shape))
        return self.backward(variables, kb, x, y=y, **kw)


def default_v1_optimizer(learning_rate: float = 1e-3,
                         weight_decay: float = 1e-4,
                         restart_period: int | None = None,
                         n_restarts: int = 10):
    """v1's training defaults: AdamW(1e-3, betas=(0.9, 0.999), wd=1e-4)
    with CosineAnnealingWarmRestarts(T_0=10) (ddpmmodule.py:46-82) —
    expressed as optax AdamW over ``cosine_restarts_schedule`` when a
    ``restart_period`` (in steps; the torch default restarts per epoch)
    is given."""
    import optax
    from diffsci_tpu.models.karras.train import cosine_restarts_schedule

    lr: Any = learning_rate
    if restart_period is not None:
        lr = cosine_restarts_schedule(learning_rate, restart_period,
                                      n_restarts=n_restarts)
    return optax.adamw(lr, b1=0.9, b2=0.999, weight_decay=weight_decay)
