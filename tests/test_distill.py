"""Progressive distillation (models/karras/distill.py — beyond parity;
the reference has no distillation).

Pin strategy: (1) grid nesting and target inversion are exact algebra —
assert equality, not statistics; (2) the teacher's two sub-steps must
reproduce the framework's own propagate_partial (Heun + endpoint rule)
so distilled students stay on the standard sampler's trajectory; (3) an
end-to-end halving chain on an analytic oracle must transfer sample
statistics to a 2-NFE student."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from diffsci_tpu import data
from diffsci_tpu.models import (KarrasModel, KarrasModelConfig, MLPUncond)
from diffsci_tpu.models.karras import (
    make_distill_step, distill_progressive, distill_targets,
    distill_interval_grid, halving_schedule, default_optimizer,
    create_train_state, make_train_step, TrainState, split_variables)
from diffsci_tpu.models.karras.distill import _denoiser_step
from diffsci_tpu.ops import NullPreconditioner

KEY = jax.random.PRNGKey(0)


def small_model(dim=2, sigma_max=10.0):
    config = KarrasModelConfig.from_edm()
    config.noisescheduler.sigma_max = sigma_max
    config.noisescheduler.maximum_scale = sigma_max
    model = KarrasModel(MLPUncond(dim=dim, hidden_dims=(32, 32)),
                        config)
    variables = model.init(KEY, (2, dim))
    return model, variables


def test_halving_schedule():
    assert halving_schedule(17, 2) == [17, 9, 5, 3, 2]
    assert halving_schedule(17, 1) == [17, 9, 5, 3, 2, 1]
    assert halving_schedule(5, 3) == [5, 3]
    assert halving_schedule(2, 2) == [2]
    assert halving_schedule(1, 1) == [1]
    with pytest.raises(ValueError):
        halving_schedule(8, 0)


def test_grid_nesting_exact():
    """The student's grid is exactly every second teacher point, shared
    final sigma_min -> 0 interval included."""
    model, _ = small_model()
    sched = model.config.noisescheduler
    for n in (2, 3, 5, 9, 17):
        T = sched.create_steps(2 * n)
        S = sched.create_steps(n + 1)
        assert np.array_equal(T[:-1:2], S[:-1])
        a, m, b = distill_interval_grid(model, n)
        np.testing.assert_array_equal(a, S[:-1].astype(np.float32))
        np.testing.assert_array_equal(b, S[1:].astype(np.float32))
        # midpoints are real teacher grid points, never below sigma_min
        assert m[-1] == 0.0 and np.all(m[:-1] >= sched.sigma_min)


def test_target_inversion_exact():
    """Plugging D_tgt into ONE student Euler step over [a, b] reproduces
    the teacher's two-step result X exactly — for a real (random-init)
    network teacher, every interval index including the b == 0 endpoint."""
    model, variables = small_model()
    n = 5
    x0 = jax.random.normal(jax.random.key(1), (n, 2))
    eps = jax.random.normal(jax.random.key(2), (n, 2))
    idx = jnp.arange(n)  # one element per interval, incl. the last
    x_t, sigma, D_tgt, X = distill_targets(model, variables, x0, eps,
                                           idx, n)
    sig = sigma[:, None]
    a, _, b = distill_interval_grid(model, n)
    x_b = x_t + (b[:, None] - sig) * (x_t - D_tgt) / sig
    np.testing.assert_allclose(np.asarray(x_b), np.asarray(X),
                               rtol=1e-5, atol=1e-6)
    assert bool(jnp.all(jnp.isfinite(D_tgt)))
    # final interval: the target degenerates to the teacher result itself
    np.testing.assert_allclose(np.asarray(D_tgt[-1]), np.asarray(X[-1]),
                               rtol=1e-6)


def test_teacher_substeps_match_propagate_partial():
    """The fused per-element teacher stepping must equal the framework's
    own sampler over the same sub-grid (Heun + endpoint rule,
    ops/schedulers.py:_run_steps) — the distilled student then lands on
    the standard trajectory."""
    model, variables = small_model()
    n = 4
    nsteps_teacher = 2 * n - 1
    sched = model.config.noisescheduler
    a, m, b = distill_interval_grid(model, n)
    x = jax.random.normal(jax.random.key(3), (3, 2)) * 2.0

    def denoise(xx, sig):
        den, _ = model.get_denoiser(variables, xx, sig, None)
        return den

    def score_fn(xx, sig):
        den, _ = model.get_denoiser(variables, xx, sig, None)
        return (den - xx) / (sig[:, None] ** 2)

    for j in range(n):
        sig_a = jnp.full((3,), a[j])
        x_mid = _denoiser_step(denoise, x, sig_a, jnp.full((3,), m[j]))
        x_two = _denoiser_step(denoise, x_mid, jnp.full((3,), m[j]),
                               jnp.full((3,), b[j]))
        final = 2 * j + 2 if j < n - 1 else 2 * n - 1
        ref = sched.propagate_partial(
            jax.random.key(0), x, score_fn, nsteps=nsteps_teacher,
            initial_step=2 * j, final_step=final)
        np.testing.assert_allclose(np.asarray(x_two), np.asarray(ref),
                                   rtol=2e-5, atol=1e-6,
                                   err_msg=f"interval {j}")


@pytest.mark.slow
def test_distill_step_runs_and_learns():
    """One phase of distillation on a Gaussian oracle-trained teacher:
    loss must be finite and decrease."""
    dim = 2
    dataset = data.ZeroMeanGaussianDataset(num_samples=512, shape=[dim])
    model, variables = small_model(dim)
    # quick ordinary training so the teacher is meaningful
    state, tx = create_train_state(model, KEY, (64, dim))
    train = make_train_step(model, tx)
    key = jax.random.key(7)
    for i in range(200):
        key, kd, ks = jax.random.split(key, 3)
        x = dataset.sample(kd)[:64]
        state, _ = train(state, ks, x)
    teacher_vars = state.variables()

    tx2 = default_optimizer(learning_rate=3e-4)
    params, consts = split_variables(teacher_vars)
    st = TrainState(params=params, consts=consts,
                    opt_state=tx2.init(params), ema=None,
                    step=jnp.zeros((), jnp.int32))
    dstep = make_distill_step(model, tx2, student_nsteps=4)
    losses = []
    for i in range(150):
        key, kd, ks = jax.random.split(key, 3)
        x = dataset.sample(kd)[:64]
        st, metrics = dstep(st, teacher_vars, ks, x)
        losses.append(float(metrics["distill_loss"]))
    assert np.all(np.isfinite(losses))
    assert np.mean(losses[-25:]) < 0.5 * np.mean(losses[:25])


@pytest.mark.slow
def test_distill_progressive_statistics():
    """Full halving chain 5 -> 3 -> 2 from an ANALYTIC teacher (exact
    denoiser via NullPreconditioner, distilled cross-architecture into
    an MLP student): the 2-NFE student must reproduce the Gaussian's
    std within 15% and beat the undistilled 2-step Euler error."""
    dim = 2
    std = 1.0
    dataset = data.ZeroMeanGaussianDataset(num_samples=4096, shape=[dim],
                                           scale=std)

    class OracleNet(nn.Module):
        @nn.compact
        def __call__(self, x, t=None, y=None, train: bool = False):
            dummy = self.param("dummy", nn.initializers.ones, ())
            return dataset.denoiser(x, t) + 0.0 * dummy * x

    config = KarrasModelConfig.from_edm()
    config.noisescheduler.sigma_max = 10.0
    config.noisescheduler.maximum_scale = 10.0
    config.preconditioner = NullPreconditioner()
    teacher = KarrasModel(OracleNet(), config)
    teacher_vars = teacher.init(KEY, (2, dim))

    config_s = KarrasModelConfig.from_edm()
    config_s.noisescheduler.sigma_max = 10.0
    config_s.noisescheduler.maximum_scale = 10.0
    student = KarrasModel(MLPUncond(dim=dim, hidden_dims=(64, 64)),
                          config_s)
    student_vars = student.init(KEY, (2, dim))

    def batches():
        k = jax.random.key(13)
        while True:
            k, kd = jax.random.split(k)
            yield dataset.sample(kd)[:128]

    vars1, history = distill_progressive(
        student, teacher_vars, batches(), jax.random.key(17),
        start_nsteps=5, final_nsteps=1, steps_per_phase=600,
        learning_rate=1e-3, teacher_model=teacher,
        initial_variables=student_vars)
    assert [h["nsteps"] for h in history] == [5, 3, 2, 1]
    for h in history:
        assert np.all(np.isfinite(h["losses"]))

    from diffsci_tpu.models.karras import sample_onestep
    samples = sample_onestep(student, vars1, jax.random.key(19), 4096,
                             (dim,))
    got_std = float(jnp.std(samples))
    err = abs(got_std - std) / std
    assert err < 0.15, got_std
    # the analytic teacher sampled with plain 2-step Euler is much worse
    naive = teacher.sample(teacher_vars, jax.random.key(19), 4096, (dim,),
                           nsteps=2, integrator="euler")
    naive_err = abs(float(jnp.std(naive)) - std) / std
    assert err < 0.5 * max(naive_err, 0.2), (got_std, naive_err)


@pytest.mark.slow
def test_conditional_guided_targets_and_step():
    """CFG distillation: targets built from a guided conditional teacher
    still satisfy the exact one-step inversion, and the distill step
    trains a conditional student with y threaded through."""
    from diffsci_tpu.models import MLPCond
    dim, ydim, n = 2, 3, 4
    config = KarrasModelConfig.from_edm()
    config.noisescheduler.sigma_max = 10.0
    config.noisescheduler.maximum_scale = 10.0
    model = KarrasModel(MLPCond(dim=dim, ydim=ydim, hidden_dims=(16,)),
                        config, conditional=True)
    y = jax.random.normal(jax.random.key(5), (6, ydim))
    variables = model.init(KEY, (6, dim), y)

    x0 = jax.random.normal(jax.random.key(1), (6, dim))
    eps = jax.random.normal(jax.random.key(2), (6, dim))
    idx = jnp.concatenate([jnp.arange(n), jnp.zeros((2,), jnp.int32)])
    x_t, sigma, D_tgt, X = distill_targets(model, variables, x0, eps,
                                           idx, n, y=y,
                                           teacher_guidance=2.0)
    a, _, b = distill_interval_grid(model, n)
    sig = sigma[:, None]
    x_b = x_t + (b[idx][:, None] - sig) * (x_t - D_tgt) / sig
    np.testing.assert_allclose(np.asarray(x_b), np.asarray(X),
                               rtol=1e-5, atol=1e-6)

    from diffsci_tpu.models.karras import default_optimizer
    tx = default_optimizer(learning_rate=1e-3)
    params, consts = split_variables(variables)
    st = TrainState(params=params, consts=consts, opt_state=tx.init(params),
                    ema=None, step=jnp.zeros((), jnp.int32))
    step = make_distill_step(model, tx, n, teacher_guidance=2.0)
    key = jax.random.key(9)
    for _ in range(3):
        key, ks = jax.random.split(key)
        st, metrics = step(st, variables, ks, x0, y)
    assert bool(jnp.isfinite(metrics["distill_loss"]))
