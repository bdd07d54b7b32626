"""Schedulers: time grids + forward/backward ODE-SDE propagation loops.

TPU-native redesign of the reference scheduler stack
(reference diffsci/models/karras/schedulers.py:27-448). Architectural
translation, not a port:

- Time grids are built **on the host in numpy** (``create_steps``): nsteps
  and the sigma range are static configuration, so (t, dt) pairs, Langevin
  gates and churn gammas are all static per-step data. The propagation loop
  (the reference's hot Python loop, schedulers.py:82-85) becomes a single
  ``lax.scan`` whose body holds no data-dependent control flow.
- The Heun/churn endpoint case (final step landing exactly on t = 0) is
  detected statically from the grid and executed as one extra step outside
  the scan with ``endpoint=True``.
- Randomness (Euler-Maruyama noise, churn noise, renoise) threads an
  explicit PRNG key through the scan carry.
- ``record_history`` uses the scan's stacked outputs.

Conventions (deliberate deviations, documented):
- All propagation entry points take a PRNG ``key`` first (ignored by fully
  deterministic paths but kept for a uniform API).
- ``inpaint``/``repaint`` take ``y_noised`` indexed by *backward grid time*:
  ``y_noised[k]`` is the known image at grid time ``t[k]`` (k = 0 is the
  noisiest, k = nsteps is the clean original). The reference stores this
  reversed and — due to an off-by-one in its forward history
  (schedulers.py:67-71 leaves index 0 as zeros, later consumed by
  inpaint's final splice at schedulers.py:109-113) — splices zeros into the
  masked region on the last step. This build fixes that: the final splice
  uses the clean original.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from diffsci_tpu.ops import integrators as integrators_lib
from diffsci_tpu.ops import scheduling as scheduling_lib

ScoreFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]  # (x, sigma[B])


class Scheduler:
    """Owns scheduling functions, integrators and the Langevin knobs
    (reference schedulers.py:27-47)."""

    def __init__(self,
                 scheduling: scheduling_lib.SchedulingFunctions,
                 integrator: integrators_lib.Integrator,
                 maximum_scale: float,
                 stochastic_integrator: integrators_lib.Integrator | None = None,
                 langevin_const: float = 1.0,
                 langevin_interval: tuple[float, float] | None = None):
        self.scheduling = scheduling
        self.integrator = integrator
        self.maximum_scale = float(maximum_scale)
        if stochastic_integrator is None:
            stochastic_integrator = integrators_lib.EulerMaruyamaIntegrator()
        else:
            assert stochastic_integrator.stochastic
        self.stochastic_integrator = stochastic_integrator
        self.langevin_const = langevin_const
        self.langevin_interval = langevin_interval

    # ------------------------------------------------------------------
    # grids (host-side, static)
    # ------------------------------------------------------------------
    def create_steps(self, n: int) -> np.ndarray:
        raise NotImplementedError

    def _langevin_gate(self, t: np.ndarray) -> np.ndarray:
        """Static per-step Langevin on/off gate (schedulers.py:219-240)."""
        if self.langevin_interval is None:
            return np.ones_like(t)
        lo, hi = self.langevin_interval
        return ((t > lo) & (t < hi)).astype(t.dtype)

    # ------------------------------------------------------------------
    # traced per-step math
    # ------------------------------------------------------------------
    def langevin_factor(self, t, gate=1.0):
        """gamma(t): multiple of Song's Langevin factor s^2 sigma' sigma
        (schedulers.py:219-240)."""
        sf = self.scheduling
        standard = sf.scale(t) ** 2 * sf.noise_deriv(t) * sf.noise(t)
        return gate * self.langevin_const * standard

    def noise_injection(self, t, gate=1.0):
        """g(t) = sqrt(2 * gamma(t)) (schedulers.py:242-245)."""
        return jnp.sqrt(2.0 * self.langevin_factor(t, gate))

    def make_rhs(self, score_fn: ScoreFn, backward: bool = True,
                 stochastic: bool = False):
        """Probability-flow / SDE right-hand side (schedulers.py:247-294).

        Returns rhs(x, t, gate=1.0); t is a traced scalar, the score_fn
        receives sigma broadcast to the batch dimension.
        """
        sf = self.scheduling

        def rhs(x, t, gate=1.0):
            sigma = sf.noise(t)
            sigma_b = jnp.broadcast_to(sigma, (x.shape[0],)).astype(x.dtype)
            if sf.constant_scaling:
                if sf.has_pf_score_multiplier:
                    mult = sf.pf_score_multiplier(t)
                else:
                    mult = sigma * sf.noise_deriv(t)
                score = score_fn(x, sigma_b)
                res = -mult * score
                if stochastic:
                    sfac = -self.langevin_factor(t, gate) * score
                    res = res + (sfac if backward else -sfac)
            else:
                s = sf.scale(t)
                if sf.has_pf_scale_multiplier:
                    scale_mult = sf.pf_scale_multiplier(t)
                else:
                    scale_mult = sf.scale_deriv(t) / s
                if sf.has_pf_score_multiplier:
                    mult = sf.pf_score_multiplier(t)
                else:
                    mult = s * sf.noise_deriv(t) * sf.noise(t)
                score = score_fn(x / s, sigma_b)
                res = scale_mult * x - mult * score
                if stochastic:
                    sfac = -(self.langevin_factor(t, gate) / s) * score
                    res = res + (sfac if backward else -sfac)
            return res

        return rhs

    # ------------------------------------------------------------------
    # the scan engine
    # ------------------------------------------------------------------
    def _run_steps(self, key, x, integrator, rhs,
                   t_steps: np.ndarray, dt_steps: np.ndarray,
                   nsteps_total: int,
                   record_history: bool,
                   splice=None, noise_seq=None, gate_scale=None):
        """Run len(dt_steps) integrator steps via lax.scan, statically
        splitting off a final endpoint step when the integrator evaluates
        rhs at t + dt and the grid lands exactly on zero.

        ``splice(x, step_index)`` optionally post-processes the state after
        each step (used by inpaint); it must be traceable with a *static*
        step index.

        ``noise_seq`` ([len(dt_steps), *x.shape]) replays a fixed noise
        sequence through the stochastic integrators instead of drawing
        from the key — reproducibility hook used by the cross-framework
        stochastic parity tests (the JAX analogue of seeding the
        reference's ``torch.randn_like``).

        ``gate_scale``: traced scalar multiplied into the per-step
        Langevin gate. Because langevin_factor is linear in the gate,
        ``langevin_const=1`` + ``gate_scale=gamma`` equals
        ``langevin_const=gamma`` — but as a RUNTIME argument, so a
        gamma sweep reuses one compiled executable instead of
        recompiling the whole sampling scan per point (XLA bakes Python
        floats into the HLO).
        """
        nsteps = len(dt_steps)
        if nsteps == 0:
            if record_history:
                return x[None]
            return x

        t_end = float(t_steps[-1] + dt_steps[-1])
        split_endpoint = integrator.evaluates_endpoint and t_end == 0.0
        n_scan = nsteps - 1 if split_endpoint else nsteps

        extras_np = integrator.scan_extras(t_steps, dt_steps, nsteps_total)
        gate_np = self._langevin_gate(t_steps)

        def pack(i0, i1):
            gate = jnp.asarray(gate_np[i0:i1], jnp.float32)
            if gate_scale is not None:
                gate = gate * gate_scale
            xs = {"t": jnp.asarray(t_steps[i0:i1], jnp.float32),
                  "dt": jnp.asarray(dt_steps[i0:i1], jnp.float32),
                  "gate": gate}
            for k, v in extras_np.items():
                xs[k] = jnp.asarray(v[i0:i1], jnp.float32)
            if noise_seq is not None:
                xs["noise"] = jnp.asarray(noise_seq, x.dtype)[i0:i1]
            return xs

        noise_strength = self.noise_injection

        history = [x] if record_history else None

        # multistep integrators (DPM-Solver++ 2M) thread extra state
        # through the scan carry
        icarry = (integrator.init_carry(x)
                  if getattr(integrator, "has_carry", False) else None)

        if n_scan > 0:
            xs = pack(0, n_scan)
            if splice is not None:
                # thread the splice targets through the scan
                xs["_step"] = jnp.arange(n_scan)

            def body(carry, xs_i):
                xc, kc, ic = carry
                kc, sub = jax.random.split(kc)
                if ic is None:
                    xn = integrator.step(sub, xc, xs_i["t"], xs_i["dt"],
                                         rhs, noise_strength, xs_i)
                else:
                    xn, ic = integrator.step_carry(
                        sub, xc, ic, xs_i["t"], xs_i["dt"], rhs,
                        noise_strength, xs_i)
                if splice is not None:
                    xn = splice(xn, xs_i["_step"])
                return (xn, kc, ic), (xn if record_history else None)

            (x, key, icarry), ys = jax.lax.scan(body, (x, key, icarry), xs)
            if record_history:
                history.append(ys)

        if split_endpoint:
            xs_f = pack(n_scan, nsteps)
            xs_last = {k: v[0] for k, v in xs_f.items()}
            key, sub = jax.random.split(key)
            if icarry is None:
                x = integrator.step(sub, x, xs_last["t"], xs_last["dt"],
                                    rhs, noise_strength, xs_last,
                                    endpoint=True)
            else:
                x, icarry = integrator.step_carry(
                    sub, x, icarry, xs_last["t"], xs_last["dt"], rhs,
                    noise_strength, xs_last, endpoint=True)
            if splice is not None:
                x = splice(x, n_scan)
            if record_history:
                history.append(x[None])

        if record_history:
            parts = []
            for h in history:
                parts.append(h if h.ndim == x.ndim + 1 else h[None])
            return jnp.concatenate(parts, axis=0)
        return x

    # ------------------------------------------------------------------
    # public propagation API (mirrors schedulers.py:48-217,296-325)
    # ------------------------------------------------------------------
    def propagate(self, key, x, score_fn: ScoreFn, nsteps: int = 100,
                  record_history: bool = False, backward: bool = True,
                  stochastic: bool = False,
                  integrator: integrators_lib.Integrator | str | None = None,
                  noise_seq=None, gate_scale=None):
        integrator = self._resolve_integrator(integrator, stochastic)
        t = self.create_steps(nsteps + 1)
        skip = 0
        if not backward:
            t = t[::-1]
            skip = 1
        dt = np.diff(t)
        rhs = self.make_rhs(score_fn, backward=backward,
                            stochastic=integrator.stochastic)
        out = self._run_steps(key, x, integrator, rhs,
                              t[skip:nsteps], dt[skip:nsteps], nsteps,
                              record_history, noise_seq=noise_seq,
                              gate_scale=gate_scale)
        if record_history and not backward:
            # forward history: index 0 is the clean original (the reference
            # leaves a zeros row here, schedulers.py:67-71 — fixed).
            out = jnp.concatenate([x[None], out], axis=0)
        return out

    def propagate_backward(self, key, x, score_fn, nsteps: int = 100,
                           record_history: bool = False,
                           stochastic: bool = False,
                           integrator=None, noise_seq=None,
                           gate_scale=None):
        return self.propagate(key, x, score_fn, nsteps, record_history,
                              backward=True, stochastic=stochastic,
                              integrator=integrator, noise_seq=noise_seq,
                              gate_scale=gate_scale)

    def propagate_backward_parallel(self, x, score_fn, nsteps: int = 18,
                                    iters: int | None = None,
                                    tol: float | None = None):
        """Parallel-in-time (Picard / ParaDiGMS) deterministic sampling:
        one flat network call of batch nsteps*B per sweep instead of
        nsteps serial calls — see ops/parallel_sampling.py. ``iters`` =
        nsteps reproduces the sequential Euler trajectory; fewer sweeps
        trade accuracy for ~nsteps/iters lower latency (beyond parity —
        the reference has no parallel-in-time sampler)."""
        from diffsci_tpu.ops.parallel_sampling import (
            picard_propagate_backward)
        return picard_propagate_backward(self, x, score_fn, nsteps,
                                         iters=iters, tol=tol)

    def propagate_forward(self, key, x, score_fn, nsteps: int = 100,
                          record_history: bool = False,
                          stochastic: bool = False,
                          integrator=None, noise_seq=None):
        return self.propagate(key, x, score_fn, nsteps, record_history,
                              backward=False, stochastic=stochastic,
                              integrator=integrator, noise_seq=noise_seq)

    def propagate_partial(self, key, x, score_fn, nsteps: int = 100,
                          initial_step: int = 0, final_step: int = 100,
                          record_history: bool = False,
                          stochastic: bool = False,
                          integrator=None, noise_seq=None):
        """Backward propagation over grid steps [initial_step, final_step)
        (schedulers.py:178-217)."""
        integrator = self._resolve_integrator(integrator, stochastic)
        t = self.create_steps(nsteps + 1)
        dt = np.diff(t)
        rhs = self.make_rhs(score_fn, backward=True,
                            stochastic=integrator.stochastic)
        return self._run_steps(key, x, integrator, rhs,
                               t[initial_step:final_step],
                               dt[initial_step:final_step], nsteps,
                               record_history, noise_seq=noise_seq)

    def restart_propagate_backward(self, key, x, score_fn,
                                   nsteps: int = 18,
                                   restarts=((0.05, 2.0, 2),),
                                   integrator=None):
        """Restart sampling (Xu et al., NeurIPS 2023, arXiv:2306.14878;
        beyond parity): deterministic ODE segments separated by large
        coordinated forward-noise jumps. Each restart interval
        ``(sigma_lo, sigma_hi, K)`` is snapped to the sigma grid; on
        reaching sigma_lo the state is re-noised up to sigma_hi through
        the forward perturbation kernel
        x_hi = (s_hi/s_lo) x_lo + s_hi sqrt(sig_hi^2 - sig_lo^2) n
        and re-integrated down, K times. The contraction of the repeated
        backward passes shrinks accumulated discretization + network
        error faster than SDE-style per-step noise at matched NFE.

        All segmenting is static (Python loop over grid indices), so the
        whole sampler is one jittable trace. NFE = nsteps + sum over
        intervals of K * interval_width.
        """
        integrator = self._resolve_integrator(integrator, stochastic=False)
        t = self.create_steps(nsteps + 1)
        sf = self.scheduling
        sigma = np.asarray(sf.noise(t[:-1]), np.float64)
        s_all = (np.ones_like(sigma) if sf.constant_scaling
                 else np.asarray(sf.scale(t[:-1]), np.float64))

        def snap(sig):
            return int(np.argmin(np.abs(sigma - sig)))

        ivals = []
        for lo, hi, K in restarts:
            if hi <= lo:
                raise ValueError("restart interval needs sigma_hi > "
                                 "sigma_lo")
            i_hi, i_lo = snap(hi), snap(lo)
            if not i_hi < i_lo:
                raise ValueError(
                    f"restart interval ({lo}, {hi}) collapses on the "
                    f"{nsteps}-step grid; widen it or raise nsteps")
            ivals.append((i_hi, i_lo, int(K)))
        ivals.sort(key=lambda iv: iv[0])
        for (a, b, _), (a2, _, _) in zip(ivals, ivals[1:]):
            if a2 < b:
                raise ValueError("restart intervals must not overlap")

        def segment(key, x, i0, i1):
            if i1 <= i0:
                return x
            return self.propagate_partial(key, x, score_fn, nsteps,
                                          initial_step=i0, final_step=i1,
                                          integrator=integrator)

        pos = 0
        for i_hi, i_lo, K in ivals:
            key, sub = jax.random.split(key)
            x = segment(sub, x, pos, i_lo)
            ratio = float(s_all[i_hi] / s_all[i_lo])
            amp = float(s_all[i_hi]
                        * np.sqrt(sigma[i_hi] ** 2 - sigma[i_lo] ** 2))
            for _ in range(K):
                key, kn, ks = jax.random.split(key, 3)
                x = ratio * x + amp * jax.random.normal(kn, x.shape,
                                                        x.dtype)
                x = segment(ks, x, i_hi, i_lo)
            pos = i_lo
        key, sub = jax.random.split(key)
        return segment(sub, x, pos, nsteps)

    def inpaint(self, key, x, y_noised, mask, score_fn: ScoreFn,
                nsteps: int = 100, record_history: bool = False,
                integrator=None):
        """Backward propagation splicing the known region after every step
        (schedulers.py:91-119). ``y_noised[k]`` = known image at grid time
        t[k]; see module docstring for the convention."""
        integrator = self._resolve_integrator(integrator, stochastic=False)
        t = self.create_steps(nsteps + 1)
        dt = np.diff(t)
        rhs = self.make_rhs(score_fn, backward=True, stochastic=False)
        x = x * (1 - mask) + y_noised[0] * mask
        y_targets = y_noised[1:]  # after step i we are at t[i+1]

        def splice(xn, step_index):
            y_t = y_targets[step_index] if isinstance(step_index, int) \
                else jnp.take(y_targets, step_index, axis=0)
            return xn * (1 - mask) + y_t * mask

        return self._run_steps(key, x, integrator, rhs,
                               t[:nsteps], dt[:nsteps], nsteps,
                               record_history, splice=splice)

    def repaint(self, key, x, y_noised, mask, score_fn: ScoreFn,
                nsteps: int = 100, rsteps: int = 10, nresamples: int = 10,
                record_history: bool = False, integrator=None,
                renoise_noises=None):
        """RePaint resampling (schedulers.py:121-164): propagate in chunks
        of ``rsteps``; at each chunk boundary, repeatedly splice the known
        region, renoise back to the chunk start and re-propagate.

        ``renoise_noises`` ([nresamples*(nsteps/rsteps-1), *x.shape])
        replays the renoise draws in call order (parity-test hook)."""
        if nsteps % rsteps != 0:
            raise ValueError("rsteps should divide nsteps")
        t = self.create_steps(nsteps + 1)
        history = []

        x = x * (1 - mask) + y_noised[0] * mask
        if record_history:
            history.append(x)

        key, sub = jax.random.split(key)
        x = self.propagate_partial(sub, x, score_fn, nsteps, 0, rsteps,
                                   integrator=integrator)
        step, fstep = rsteps, 2 * rsteps
        n_renoise = 0
        while fstep <= nsteps:
            key, sub = jax.random.split(key)
            x = self.propagate_partial(sub, x, score_fn, nsteps, step, fstep,
                                       integrator=integrator)
            for _ in range(nresamples):
                x = x * (1 - mask) + y_noised[fstep] * mask
                if record_history:
                    history.append(x)
                key, k1, k2 = jax.random.split(key, 3)
                rn = (None if renoise_noises is None
                      else renoise_noises[n_renoise])
                n_renoise += 1
                x = self.renoise(k1, x, float(t[fstep]), float(t[step]),
                                 noise=rn)
                x = self.propagate_partial(k2, x, score_fn, nsteps, step,
                                           fstep, integrator=integrator)
            step, fstep = fstep, fstep + rsteps
        if step != nsteps:
            raise ValueError("wrong counting")
        if record_history:
            history.append(x)
            return jnp.stack(history, axis=0)
        return x

    def renoise(self, key, x, t: float, t_noise: float, noise=None):
        """Noise a state at time t back up to time t_noise
        (schedulers.py:166-176). ``noise`` replays a fixed draw
        (parity-test hook)."""
        sf = self.scheduling
        sigma = sf.noise(jnp.float32(t))
        sigma_noise = sf.noise(jnp.float32(t_noise))
        scale = sf.scale(jnp.float32(t))
        scale_noise = sf.scale(jnp.float32(t_noise))
        std = scale_noise * jnp.sqrt(
            jnp.maximum(sigma_noise ** 2 - sigma ** 2, 0.0))
        if noise is None:
            noise = jax.random.normal(key, x.shape, x.dtype)
        return (scale_noise / scale) * x + std * noise

    def apply_noise(self, key, x, nsteps: int = 100, step: int = 0,
                    eps=None):
        """Noise clean data to grid time t[step] (schedulers.py:327-340).
        ``eps`` replays a fixed draw (cross-framework parity hook)."""
        if step > nsteps:
            raise ValueError(f"step larger than num of steps: {step}>{nsteps}")
        t_step = float(self.create_steps(nsteps + 1)[step])
        sf = self.scheduling
        sigma = sf.noise(jnp.float32(t_step))
        scale = sf.scale(jnp.float32(t_step))
        noise = (jax.random.normal(key, x.shape, x.dtype)
                 if eps is None else jnp.asarray(eps, x.dtype))
        return scale * x + scale * sigma * noise

    # ------------------------------------------------------------------
    def _resolve_integrator(self, integrator, stochastic: bool):
        if integrator is None:
            return self.stochastic_integrator if stochastic else self.integrator
        if isinstance(integrator, str):
            return integrators_lib.name_to_integrator(
                integrator, scheduling=self.scheduling)
        return integrator


class EDMScheduler(Scheduler):
    """Karras rho-grid scheduler (schedulers.py:360-390)."""

    def __init__(self,
                 sigma_min: float = 0.002,
                 sigma_max: float = 80.0,
                 exponent_steps: float = 7.0,
                 scheduling: str | scheduling_lib.SchedulingFunctions = "EDM",
                 **kwargs):
        if isinstance(scheduling, str):
            scheduling = scheduling_lib.name_to_scheduling_functions(scheduling)
        super().__init__(scheduling, integrators_lib.HeunIntegrator(),
                         maximum_scale=sigma_max, **kwargs)
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)
        self.exponent_steps = float(exponent_steps)

    def create_steps(self, n: int) -> np.ndarray:
        if n < 3:
            # the reference formula divides by n-2 (schedulers.py:378) and
            # silently yields a NaN grid for a single-step sample; raise
            # instead so sample(nsteps=1) fails loudly
            raise ValueError(
                f"EDM sigma grid needs at least 2 sampling steps (got "
                f"n={n} grid points); the Karras rho-spacing formula "
                f"divides by n-2")
        rho = self.exponent_steps
        s = np.arange(n - 1, dtype=np.float64) / (n - 2)
        start = self.sigma_max ** (1 / rho)
        end = self.sigma_min ** (1 / rho)
        steps = (start + s * (end - start)) ** rho
        if not self.scheduling.identity_noise:
            steps = np.asarray(self.scheduling.inverse_noise(steps))
        return np.concatenate([steps, np.zeros(1)])

    def step_from_time(self, t, n: int):
        exp = 1.0 / self.exponent_steps
        step = (n - 1) * (t ** exp - self.sigma_max ** exp) / (
            self.sigma_min ** exp - self.sigma_max ** exp)
        return jnp.round(step).astype(jnp.int32)


class VPScheduler(Scheduler):
    """(schedulers.py:393-419)"""

    def __init__(self,
                 epsilon_min: float = 0.001,
                 scheduling: str | scheduling_lib.SchedulingFunctions = "VP",
                 **sched_kwargs):
        if isinstance(scheduling, str):
            scheduling = scheduling_lib.name_to_scheduling_functions(
                scheduling, **sched_kwargs)
        sigma_max = float(np.asarray(scheduling.noise(np.ones(1)) *
                                     scheduling.scale(np.ones(1)))[0])
        super().__init__(scheduling, integrators_lib.HeunIntegrator(),
                         maximum_scale=sigma_max)
        self.epsilon_min = float(epsilon_min)

    def create_steps(self, n: int) -> np.ndarray:
        s = np.arange(n, dtype=np.float64) / (n - 1)
        return 1.0 + s * (self.epsilon_min - 1.0)

    def step_from_time(self, t, n: int):
        step = (n - 1) * (t - 1.0) / (self.epsilon_min - 1.0)
        return jnp.round(step).astype(jnp.int32)


class VEScheduler(Scheduler):
    """(schedulers.py:422-448)"""

    def __init__(self,
                 sigma_min: float = 0.02,
                 sigma_max: float = 100.0,
                 scheduling: str | scheduling_lib.SchedulingFunctions = "VE",
                 **sched_kwargs):
        if isinstance(scheduling, str):
            scheduling = scheduling_lib.name_to_scheduling_functions(
                scheduling, **sched_kwargs)
        super().__init__(scheduling, integrators_lib.HeunIntegrator(),
                         maximum_scale=sigma_max)
        self.sigma_min = float(sigma_min)
        self.sigma_max = float(sigma_max)

    def create_steps(self, n: int) -> np.ndarray:
        s = np.arange(n, dtype=np.float64) / (n - 1)
        return self.sigma_max ** 2 * (self.sigma_min ** 2 /
                                      self.sigma_max ** 2) ** s

    def step_from_time(self, t, n: int):
        step = (n - 1) * (jnp.log(t) - np.log(self.sigma_max ** 2)) / (
            np.log(self.sigma_min ** 2) - np.log(self.sigma_max ** 2))
        return jnp.round(step).astype(jnp.int32)
