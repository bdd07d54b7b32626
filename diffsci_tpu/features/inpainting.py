"""RePaint inpainting feature wrapper.

TPU-native counterpart of the reference RePaint feature
(reference diffsci/features/inpainting.py:31-91). The known region is
noised to each grid level with the exact Gaussian forward marginal
``y_k = s(t_k) x + s(t_k) sigma(t_k) eps`` (the textbook RePaint
construction) and the resampling loop delegates to the scheduler's repaint
(ops/schedulers.py), which implements the full multi-level structure the
reference feature only partially realizes (inpainting.py:69-89 processes a
single resample level).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from diffsci_tpu.ops import schedulers as schedulers_lib
from diffsci_tpu.ops import integrators as integrators_lib


class Inpainting:
    def __init__(self, scheduler: schedulers_lib.Scheduler):
        self.scheduler = scheduler
        self.scheduling = scheduler.scheduling


class RePaint(Inpainting):
    """(inpainting.py:31-91)"""

    def __init__(self, scheduler: schedulers_lib.Scheduler,
                 integrator=None):
        super().__init__(scheduler)
        self.integrator = integrator

    def gaussian_noised_history(self, key, x, nsteps: int):
        """Known image at every backward grid time t[k]:
        y[k] = s(t_k) x + s(t_k) sigma(t_k) eps_k."""
        t = self.scheduler.create_steps(nsteps + 1)
        sf = self.scheduling
        keys = jax.random.split(key, nsteps + 1)

        frames = []
        for k in range(nsteps + 1):
            tk = jnp.float32(float(t[k]))
            scale = sf.scale(tk)
            sigma = sf.noise(tk)
            eps = jax.random.normal(keys[k], x.shape, x.dtype)
            frames.append(scale * x + scale * sigma * eps)
        return jnp.stack(frames, axis=0)

    def reconstruct(self, key, x_initial, score_fn: Callable, mask,
                    n_resamples: int = 2, resample_steps: int = 2,
                    nsteps: int = 100, record_history: bool = False):
        """mask == 1 marks the known region of x_initial."""
        k1, k2, k3 = jax.random.split(key, 3)
        y_noised = self.gaussian_noised_history(k1, x_initial, nsteps)
        x = jax.random.normal(k2, x_initial.shape, x_initial.dtype) \
            * self.scheduler.maximum_scale
        return self.scheduler.repaint(
            k3, x, y_noised, mask, score_fn, nsteps=nsteps,
            rsteps=resample_steps, nresamples=n_resamples,
            record_history=record_history, integrator=self.integrator)
