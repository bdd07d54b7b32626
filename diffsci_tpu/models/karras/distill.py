"""Progressive distillation: halve sampling NFE by teaching a student to
match two teacher ODE steps in one (Salimans & Ho, arXiv:2202.00512 —
PAPERS.md), formulated for the EDM denoiser runtime.

Beyond parity — the reference has no distillation; this is the TPU
serving-perf lever that turns an 18-35 NFE sampler into a 2-5 NFE one.

Why it drops into the existing machinery with no new sampling path: the
EDM rho-grid family (ops/schedulers.py:451-467) *nests* — the grid for
``nsteps`` places its rho-interpolated points at ``i/(nsteps-1)`` and
appends a final 0, so a teacher grid with ``2*N - 1`` steps contains the
student's ``N``-step grid as every second point (``2i/(2N-2) ==
i/(N-1)`` exactly in IEEE division), with both sharing the final
``sigma_min -> 0`` interval. A distilled student therefore samples
through the ordinary ``KarrasModel.sample(nsteps=N,
integrator="euler")`` — it is a plain drop-in denoiser.

Target construction (exact one-step inversion): the student's Euler step
over a grid interval [a, b] is ``x_b = x + (b - a) * (x - D(x, a)) / a``
(the constant-scaling pf-ODE rhs, schedulers.py:make_rhs). Requiring
``x_b == X`` (the teacher's two-step result) and solving for the
denoiser output gives

    D_tgt = x + (X - x) * a / (a - b)

which degenerates to ``D_tgt = X`` on the final interval (b = 0). The
loss weights each interval by ``((a - b) / a)**2``, which makes the
per-element loss EXACTLY the induced next-state error ``||x_b(D_s) -
X||**2`` — every grid interval contributes O(1) to the gradient. (The
EDM training weight ``lambda(sigma) ~ 1/c_out**2`` is wrong here: at
the final ``sigma_min`` interval it reaches ~2.5e5, and under global
gradient clipping it starves the large-sigma intervals of signal — the
distilled sampler then overshoots its first step. Measured: the
2-NFE student's sample std went 6.4 -> ~1.0 on the Gaussian oracle
chain when switching to trajectory-space weighting.)

Scope: EDM scheduling only (``identity_noise`` + ``constant_scaling``,
i.e. sampler time == sigma), pixel/diffusion space (latent models:
distill the latent-space model itself). Minimum student ``nsteps`` is 2
(the rho-grid formula needs >= 3 grid points, schedulers.py:454-460).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from diffsci_tpu.utils import bcast_right
from diffsci_tpu.models.karras.train import (
    TrainState, split_variables, default_optimizer, nan_to_zero_grads,
    renormalize_mp_weights)
from diffsci_tpu.models.karras.ema import EMATracker


def _check_distillable(model, student_nsteps: int):
    sf = model.config.noisescheduler.scheduling
    if not (getattr(sf, "constant_scaling", False)
            and getattr(sf, "identity_noise", False)):
        raise NotImplementedError(
            "progressive distillation needs EDM scheduling (sampler time "
            "== sigma, constant scaling); got a scheduler whose time "
            "variable is not sigma")
    if getattr(model, "latent_model", False):
        raise NotImplementedError(
            "distill the latent-space KarrasModel directly (distillation "
            "operates in the diffusion space)")
    if student_nsteps < 1:
        raise ValueError("student_nsteps must be >= 1")


def distill_interval_grid(model, student_nsteps: int):
    """Per-student-interval sigma triples (a, m, b): the student steps
    a -> b while the teacher steps a -> m -> b on its own
    ``2*student_nsteps - 1``-step grid. The last student interval
    (sigma_min -> 0) is a single teacher step, encoded as m == b == 0
    (the second sub-step has dt == 0 and is the identity).

    Returns float32 arrays of shape [student_nsteps].

    ``student_nsteps == 1`` is the terminal special case: the single
    student interval is sigma_max -> 0 and the teacher sub-steps are the
    2-step student's OWN grid (sigma_max -> sigma_min -> 0) — the
    midpoint sits on the teacher's grid, so the chain stays consistent
    even though the 2N-1 step-count relation no longer applies. The
    1-NFE student samples via ``sample_onestep``.
    """
    sched = model.config.noisescheduler
    if student_nsteps == 1:
        T2 = np.asarray(sched.create_steps(3), np.float64)
        a = np.array([T2[0]])
        m = np.array([T2[1]])
        b = np.array([0.0])
        return (a.astype(np.float32), m.astype(np.float32),
                b.astype(np.float32))
    T = np.asarray(sched.create_steps(2 * student_nsteps), np.float64)
    S = np.asarray(sched.create_steps(student_nsteps + 1), np.float64)
    if not (T[-1] == 0.0 and np.all(np.diff(T) < 0)):
        raise NotImplementedError(
            "scheduler grid must be strictly decreasing and end at 0")
    # nesting invariant: the student's rho points are every second
    # teacher point (exact — same IEEE quotients)
    assert np.array_equal(T[:-1:2], S[:-1]), "grid family does not nest"
    n = student_nsteps
    a = np.concatenate([T[0:2 * n - 2:2], [T[2 * n - 2]]])
    m = np.concatenate([T[1:2 * n - 2:2], [0.0]])
    b = np.concatenate([T[2:2 * n - 1:2], [0.0]])
    return (a.astype(np.float32), m.astype(np.float32),
            b.astype(np.float32))


def _denoiser_step(denoise_fn, x, s_from, s_to, heun: bool = True):
    """One deterministic pf-ODE step with per-element sigma vectors.
    ``heun=True``: Heun with the EDM endpoint rule applied element-wise
    (matches HeunIntegrator + the _run_steps endpoint split, so the
    teacher's sub-steps reproduce propagate_partial exactly — pinned in
    tests). ``heun=False``: plain Euler.

    ``s_from == s_to`` elements pass through unchanged (dt == 0).
    """
    # sigma == 0 elements (the identity dt == 0 sub-step) still flow
    # through the denoiser eval: substitute a safe sigma so cnoise =
    # log(sigma) stays finite — 0 * NaN would poison the dt == 0 branch
    safe_from = jnp.where(s_from > 0, s_from, 1.0)
    d1 = (x - denoise_fn(x, safe_from)) / bcast_right(safe_from, x)
    dt = bcast_right(s_to - s_from, x)
    x_euler = x + dt * d1
    if not heun:
        return x_euler
    safe_to = jnp.where(s_to > 0, s_to, 1.0)
    d2 = (x_euler - denoise_fn(x_euler, safe_to)) / bcast_right(safe_to, x)
    slope = jnp.where(bcast_right(s_to, x) > 0, 0.5 * (d1 + d2), d1)
    return x + dt * slope


def distill_targets(model, teacher_variables, x0, eps, interval_idx,
                    student_nsteps: int, y=None,
                    teacher_guidance: float = 1.0,
                    teacher_heun: bool = True):
    """Pure target construction (unit-testable core of the distill step).

    Returns ``(x_t, sigma, D_tgt, X)``: the noised input at each
    element's interval-start sigma, the exact-inversion denoiser target,
    and the teacher's two-step result.

    ``teacher_heun`` MUST be False when the teacher is itself a
    distilled student: a distilled D is the Euler-step-corrected map,
    not the true denoiser, and Heun's slope averaging double-corrects it
    (measured on the Gaussian oracle chain: the 3-NFE phase converged to
    loss 5e-4 yet sampled at std 2.47 instead of 1.0 under Heun
    sub-steps; Euler sub-steps fix it). Salimans & Ho's formulation is
    Euler/DDIM throughout for the same reason.
    """
    a_np, m_np, b_np = distill_interval_grid(model, student_nsteps)
    a = jnp.asarray(a_np)[interval_idx]
    m = jnp.asarray(m_np)[interval_idx]
    b = jnp.asarray(b_np)[interval_idx]
    x_t = x0 + bcast_right(a, x0) * eps

    def teacher_denoise(xx, sig):
        den, _ = model.get_denoiser(teacher_variables, xx, sig, y,
                                    guidance=teacher_guidance, train=False)
        return den

    x_mid = _denoiser_step(teacher_denoise, x_t, a, m, heun=teacher_heun)
    X = _denoiser_step(teacher_denoise, x_mid, m, b, heun=teacher_heun)
    X = jax.lax.stop_gradient(X)
    # exact inversion of the student's one-step Euler map a -> b
    ratio = bcast_right(a / (a - b), x_t)
    D_tgt = x_t + (X - x_t) * ratio
    return x_t, a, D_tgt, X


def make_distill_step(model, tx, student_nsteps: int, *,
                      teacher_model=None,
                      ema: EMATracker | None = None,
                      teacher_guidance: float = 1.0,
                      teacher_heun: bool = True,
                      nan_guard: bool = True,
                      has_mp_weights: bool = False):
    """Build the jitted progressive-distillation step.

    ``step(state, teacher_variables, key, x, y=None) -> (state, metrics)``
    — per batch element: draw a student grid interval and a noise
    realization, run the (frozen) teacher two Heun sub-steps, and
    regress the student's denoiser output onto the exact-inversion
    target under trajectory-space weighting (see module docstring:
    the loss equals the induced next-state error). The teacher
    variables are a runtime argument, so every halving phase reuses one
    compiled executable per (batch shape, nsteps).

    ``teacher_guidance != 1`` distills classifier-free guidance into the
    student (guidance-baked sampling: the student then samples with
    guidance=1 — Meng et al., arXiv:2210.03142).

    ``teacher_model``: a different KarrasModel (e.g. another
    architecture or preconditioner) to distill FROM — it must share the
    student's noise scheduler grid (asserted). Default: the student's
    own model (standard progressive distillation).

    ``teacher_heun``: set False when the teacher is itself a distilled
    student (see distill_targets — Heun double-corrects a distilled D;
    distill_progressive handles this automatically).
    """
    _check_distillable(model, student_nsteps)
    tm = teacher_model if teacher_model is not None else model
    if tm is not model:
        k = max(2 * student_nsteps, 3)
        same = np.array_equal(
            tm.config.noisescheduler.create_steps(k),
            model.config.noisescheduler.create_steps(k))
        if not same:
            raise ValueError("teacher_model must share the student's "
                             "noise scheduler grid")

    a_np, _, b_np = distill_interval_grid(model, student_nsteps)
    # trajectory-space weighting: loss == || x_b(D_s) - X ||^2 exactly
    w_np = ((a_np - b_np) / a_np) ** 2

    def distill_loss(params, consts, teacher_variables, key, x, y):
        kidx, keps, kdrop = jax.random.split(key, 3)
        idx = jax.random.randint(kidx, (x.shape[0],), 0, student_nsteps)
        eps = jax.random.normal(keps, x.shape, x.dtype)
        x_t, sigma, D_tgt, _ = distill_targets(
            tm, teacher_variables, x, eps, idx, student_nsteps, y,
            teacher_guidance, teacher_heun=teacher_heun)
        variables = {"params": params, **consts}
        D_s, _ = model.get_denoiser(variables, x_t, sigma, y,
                                    guidance=1.0, train=True,
                                    rngs={"dropout": kdrop})
        w = bcast_right(jnp.asarray(w_np)[idx], x_t)
        return jnp.mean(w * (D_s - D_tgt) ** 2)

    def step(state: TrainState, teacher_variables, key, x, y=None):
        loss, grads = jax.value_and_grad(distill_loss)(
            state.params, state.consts, teacher_variables, key, x, y)
        if nan_guard:
            grads = nan_to_zero_grads(grads)
        upds, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, upds)
        if has_mp_weights:
            params = renormalize_mp_weights(params)
        ema_state = state.ema
        if ema is not None and ema_state is not None:
            ema_state = ema.update(ema_state, params)
        new_state = TrainState(params=params, consts=state.consts,
                               opt_state=opt_state, ema=ema_state,
                               step=state.step + 1)
        metrics = {"distill_loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    # no donation: the student state is typically initialized FROM the
    # teacher variables, so state buffers alias the teacher argument and
    # donating them is an XLA error (donate(a), a)
    return jax.jit(step)


def halving_schedule(start_nsteps: int, final_nsteps: int = 2):
    """Student nsteps per phase: N -> (N+1)//2 -> ... >= final_nsteps.
    Each phase's teacher grid (2N-1 steps) is exactly the previous
    student's grid, so the chain stays on-grid throughout; the terminal
    2 -> 1 transition uses the 2-step student's grid directly (see
    distill_interval_grid)."""
    if final_nsteps < 1:
        raise ValueError("final_nsteps must be >= 1")
    out, n = [], start_nsteps
    while n >= final_nsteps:
        out.append(n)
        if n == final_nsteps:
            break
        n = max((n + 1) // 2 if n > 2 else 1, final_nsteps)
    return out


def sample_onestep(model, variables, key, nsamples: int, shape, y=None,
                   mesh=None):
    """1-NFE generation with a fully distilled student: one Euler step
    sigma_max -> 0 is exactly ``D(sigma_max * eps, sigma_max)`` — the
    ordinary sample() grid machinery needs >= 3 grid points, so the
    terminal case gets its own entry. Drop-in for sample() otherwise
    (pixel-space models). ``mesh``: shard the batch over the mesh's
    'data' axis (same convention as KarrasModel.sample)."""
    _check_distillable(model, 1)
    sigma_max = float(model.config.noisescheduler.maximum_scale)
    x = sigma_max * jax.random.normal(key, (nsamples,) + tuple(shape))
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        spec = PartitionSpec("data", *([None] * (x.ndim - 1)))
        x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
    sig = jnp.full((nsamples,), sigma_max, x.dtype)
    den, _ = model.get_denoiser(variables, x, sig, y, guidance=1.0)
    return den


def distill_progressive(model, teacher_variables, data_iter: Iterable,
                        key, *,
                        start_nsteps: int = 17,
                        final_nsteps: int = 2,
                        steps_per_phase: int = 500,
                        optimizer=None,
                        learning_rate: float = 1e-4,
                        ema: EMATracker | None = None,
                        teacher_guidance: float = 1.0,
                        teacher_model=None,
                        initial_variables=None,
                        callback: Optional[Callable] = None):
    """Run the full halving chain. ``teacher_variables`` come from a
    normally trained model (use EMA weights); the first student learns
    ``start_nsteps``-step sampling from the teacher's
    ``2*start_nsteps - 1``-step trajectories, then becomes the teacher
    for the next halving.

    ``data_iter`` yields clean training batches ``x`` or ``(x, y)``.
    Returns ``(variables, history)`` — variables of the final student
    (EMA weights if ``ema`` is given) and per-phase loss traces.

    ``teacher_model`` (optional) applies to the FIRST phase only —
    distill from a different architecture; later phases are
    student-to-student. When given, ``teacher_variables`` must belong
    to it, and the first student phase starts from ``model.init``
    weights rather than the teacher's.

    Sample the result with ``model.sample(variables, ..., nsteps=N,
    integrator="euler")`` for any N in the chain's history (each phase's
    output is also accurate at its own step count).
    """
    schedule = halving_schedule(start_nsteps, final_nsteps)
    data_iter = iter(data_iter)
    history = []
    for phase_i, nsteps in enumerate(schedule):
        cross = teacher_model is not None and phase_i == 0
        if cross:
            if initial_variables is None:
                raise ValueError(
                    "teacher_model (cross-architecture first phase) "
                    "needs initial_variables for the student")
            params, consts = split_variables(initial_variables)
        else:
            params, consts = split_variables(teacher_variables)
        tx = optimizer if optimizer is not None else default_optimizer(
            learning_rate=learning_rate)
        state = TrainState(params=params, consts=consts,
                           opt_state=tx.init(params),
                           ema=ema.init(params) if ema is not None else None,
                           step=jnp.zeros((), jnp.int32))
        step = make_distill_step(
            model, tx, nsteps, ema=ema,
            teacher_model=teacher_model if cross else None,
            teacher_guidance=teacher_guidance if phase_i == 0 else 1.0,
            # phase 0's teacher is a true denoiser (Heun-safe); every
            # later teacher is a distilled student -> Euler sub-steps
            teacher_heun=(phase_i == 0))
        losses = []
        for _ in range(steps_per_phase):
            batch = next(data_iter)
            x, y = batch if isinstance(batch, tuple) else (batch, None)
            key, sub = jax.random.split(key)
            state, metrics = step(state, teacher_variables, sub, x, y)
            losses.append(float(metrics["distill_loss"]))
        teacher_variables = (state.ema_variables(ema) if ema is not None
                             else state.variables())
        history.append({"nsteps": nsteps, "losses": losses})
        if callback is not None:
            callback(nsteps, teacher_variables, losses)
    return teacher_variables, history
