"""Unit tests for the diffusion math core (L1), mirroring the reference's
analytic gold standard (tests/test_karras_on_toy_dataset.py) plus grid /
preconditioner / noise-sampler pins."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diffsci_tpu import ops, data


# ---------------------------------------------------------------------------
# grids
# ---------------------------------------------------------------------------
def test_edm_grid_matches_karras_formula():
    sched = ops.EDMScheduler()
    n = 19  # 18 steps
    t = sched.create_steps(n)
    assert t.shape == (n,)
    assert t[0] == pytest.approx(80.0)
    assert t[-2] == pytest.approx(0.002)
    assert t[-1] == 0.0
    # rho-grid formula
    rho = 7.0
    s = np.arange(n - 1) / (n - 2)
    expected = (80.0 ** (1 / rho) + s * (0.002 ** (1 / rho) - 80.0 ** (1 / rho))) ** rho
    np.testing.assert_allclose(t[:-1], expected, rtol=1e-12)
    assert np.all(np.diff(t) < 0)


def test_vp_ve_grids():
    vp = ops.VPScheduler()
    t = vp.create_steps(11)
    assert t[0] == pytest.approx(1.0)
    assert t[-1] == pytest.approx(0.001)
    ve = ops.VEScheduler()
    t = ve.create_steps(11)
    assert t[0] == pytest.approx(100.0 ** 2)
    assert t[-1] == pytest.approx(0.02 ** 2)


def test_scheduling_function_identities():
    for sf in (ops.EDMSchedulingFunctions(), ops.VPSchedulingFunctions(),
               ops.VESchedulingFunctions()):
        t = jnp.linspace(0.05, 0.9, 7)
        sig = sf.noise(t)
        np.testing.assert_allclose(sf.inverse_noise(sig), t,
                                   rtol=1e-4, atol=1e-5)
        # derivative check by finite differences
        eps = 1e-3
        fd = (sf.noise(t + eps) - sf.noise(t - eps)) / (2 * eps)
        np.testing.assert_allclose(sf.noise_deriv(t), fd, rtol=2e-3, atol=1e-4)
        fd_s = (sf.scale(t + eps) - sf.scale(t - eps)) / (2 * eps)
        np.testing.assert_allclose(sf.scale_deriv(t), fd_s, rtol=2e-3,
                                   atol=1e-4)


# ---------------------------------------------------------------------------
# preconditioners
# ---------------------------------------------------------------------------
def test_edm_preconditioner_table1():
    pre = ops.EDMPreconditioner(sigma_data=0.5)
    sigma = jnp.array([0.1, 1.0, 10.0])
    c_skip, c_out, c_in, c_noise = pre.coefficients(sigma)
    sd = 0.5
    np.testing.assert_allclose(c_skip, sd**2 / (sigma**2 + sd**2), rtol=1e-6)
    np.testing.assert_allclose(c_out, sigma * sd / np.sqrt(sigma**2 + sd**2),
                               rtol=1e-6)
    np.testing.assert_allclose(c_in, 1 / np.sqrt(sigma**2 + sd**2), rtol=1e-6)
    np.testing.assert_allclose(c_noise, 0.25 * np.log(sigma**2), rtol=1e-5)
    # EDM identity: c_skip^2 + c_out^2/sd^2 * (sigma^2+sd^2)/sd^2 ... simpler:
    # variance preservation c_in^2 (sigma^2 + sd^2) == 1
    np.testing.assert_allclose(c_in**2 * (sigma**2 + sd**2), 1.0, rtol=1e-6)


def test_null_preconditioner_is_identity_wiring():
    pre = ops.NullPreconditioner()
    sigma = jnp.array([0.3, 2.0])
    c_skip, c_out, c_in, c_noise = pre.coefficients(sigma)
    np.testing.assert_allclose(c_skip, 0.0)
    np.testing.assert_allclose(c_out, 1.0)
    np.testing.assert_allclose(c_in, 1.0)
    np.testing.assert_allclose(c_noise, sigma)


# ---------------------------------------------------------------------------
# noise samplers
# ---------------------------------------------------------------------------
def test_edm_noise_sampler_lognormal_stats():
    ns = ops.EDMNoiseSampler()
    key = jax.random.PRNGKey(0)
    sigma = ns.sample(key, (20000,))
    logsig = jnp.log(sigma)
    assert jnp.mean(logsig) == pytest.approx(-1.2, abs=0.05)
    assert jnp.std(logsig) == pytest.approx(1.2, abs=0.05)
    w = ns.loss_weighting(jnp.array([0.5]))
    np.testing.assert_allclose(w, (0.25 + 0.25) / (0.25 * 0.25), rtol=1e-6)


def test_ve_noise_sampler_loguniform_range():
    ns = ops.VENoiseSampler(sigma_min=0.02, sigma_max=100.0)
    sigma = ns.sample(jax.random.PRNGKey(1), (5000,))
    assert jnp.min(sigma) >= 0.02
    assert jnp.max(sigma) <= 100.0


# ---------------------------------------------------------------------------
# analytic propagation: the gold standard
# (mirrors reference tests/test_karras_on_toy_dataset.py:8-27)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("dim,nsteps,nsamples", [(1, 100, 100), (3, 200, 10)])
def test_edm_backward_propagation_to_zero_dataset(dim, nsteps, nsamples):
    dataset = data.ZeroDataset(num_samples=16, shape=[dim])
    sched = ops.EDMScheduler()
    key = jax.random.PRNGKey(42)
    x = jax.random.normal(key, (nsamples, dim))

    score_fn = dataset.gradlogprob
    history = sched.propagate_backward(key, x, score_fn, nsteps,
                                       record_history=True)
    assert history.shape == (nsteps + 1, nsamples, dim)
    np.testing.assert_allclose(history[0], x, rtol=1e-6)
    np.testing.assert_allclose(history[-1], 0.0, rtol=1e-2, atol=1e-2)

    # non-history variant agrees with the last history row
    out = sched.propagate_backward(key, x, score_fn, nsteps)
    np.testing.assert_allclose(out, history[-1], rtol=1e-5, atol=1e-6)


def test_propagation_is_jittable():
    dataset = data.ZeroDataset(num_samples=4, shape=[2])
    sched = ops.EDMScheduler()

    @jax.jit
    def run(key, x):
        return sched.propagate_backward(key, x, dataset.gradlogprob, 50)

    x = jax.random.normal(jax.random.PRNGKey(0), (8, 2))
    out = run(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(out, 0.0, atol=1e-2)


def test_euler_vs_heun_orders():
    """Heun should be much closer to the analytic solution than Euler on a
    Gaussian dataset with few steps."""
    dataset = data.ZeroMeanGaussianDataset(num_samples=4, shape=[2], scale=1.0)
    sched = ops.EDMScheduler()
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (64, 2)) * sched.maximum_scale

    # analytic ODE solution for zero-mean Gaussian (EDM, sigma(t)=t):
    # x(t) = x(T) * sqrt((s^2 + t^2) / (s^2 + T^2))
    T = sched.maximum_scale
    target = x * np.sqrt(1.0 / (1.0 + T ** 2))

    heun = sched.propagate_backward(key, x, dataset.gradlogprob, 50)
    euler = sched.propagate_backward(key, x, dataset.gradlogprob, 50,
                                     integrator=ops.EulerIntegrator())
    err_heun = jnp.max(jnp.abs(heun - target))
    err_euler = jnp.max(jnp.abs(euler - target))
    assert err_heun < err_euler / 3
    assert err_heun < 3e-2


def test_stochastic_propagation_distribution():
    """Euler-Maruyama backward SDE on a zero-mean Gaussian should produce
    approximately the data distribution."""
    dataset = data.ZeroMeanGaussianDataset(num_samples=4, shape=[1], scale=1.0)
    sched = ops.EDMScheduler()
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (4096, 1)) * sched.maximum_scale
    out = sched.propagate_backward(key, x, dataset.gradlogprob, 200,
                                   stochastic=True)
    assert jnp.mean(out) == pytest.approx(0.0, abs=0.1)
    assert jnp.std(out) == pytest.approx(1.0, abs=0.1)


def test_karras_churn_integrator():
    dataset = data.ZeroDataset(num_samples=4, shape=[2])
    sched = ops.EDMScheduler()
    churn = ops.KarrasIntegrator(scheduling=sched.scheduling)
    key = jax.random.PRNGKey(11)
    x = jax.random.normal(key, (32, 2)) * sched.maximum_scale
    out = sched.propagate_backward(key, x, dataset.gradlogprob, 100,
                                   integrator=churn)
    np.testing.assert_allclose(out, 0.0, atol=2e-2)


def test_forward_propagation_history_shape():
    dataset = data.ZeroMeanGaussianDataset(num_samples=4, shape=[2])
    sched = ops.EDMScheduler()
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (8, 2))
    nsteps = 50
    hist = sched.propagate_forward(key, x, dataset.gradlogprob, nsteps,
                                   record_history=True)
    assert hist.shape == (nsteps + 1, 8, 2)
    # index 0 and 1 both hold the starting state (forward integration skips
    # the singular t=0 step; the reference left index 0 as zeros)
    np.testing.assert_allclose(hist[0], x, rtol=1e-6)
    np.testing.assert_allclose(hist[1], x, rtol=1e-6)
    # the end state should be noised up to ~sigma_max scale
    assert jnp.std(hist[-1]) > 10.0


def test_apply_noise_and_renoise():
    sched = ops.EDMScheduler()
    key = jax.random.PRNGKey(9)
    x = jnp.zeros((4096, 1))
    noised = sched.apply_noise(key, x, nsteps=100, step=0)
    assert jnp.std(noised) == pytest.approx(80.0, rel=0.05)
    t = sched.create_steps(101)
    renoised = sched.renoise(key, x, float(t[50]), float(t[10]))
    sig_expected = np.sqrt(float(t[10]) ** 2 - float(t[50]) ** 2)
    assert jnp.std(renoised) == pytest.approx(sig_expected, rel=0.05)


def test_vp_scheduler_propagation():
    """VP has non-constant scaling: checks the scaled rhs branch."""
    dataset = data.ZeroMeanGaussianDataset(num_samples=4, shape=[1],
                                           scale=1.0)
    sched = ops.VPScheduler()
    key = jax.random.PRNGKey(13)
    x = jax.random.normal(key, (2048, 1)) * sched.maximum_scale
    out = sched.propagate_backward(key, x, dataset.gradlogprob, 200)
    # deterministic probability flow: marginal should approach the data law
    assert jnp.std(out) == pytest.approx(1.0, abs=0.1)
    assert jnp.mean(out) == pytest.approx(0.0, abs=0.1)


# ---------------------------------------------------------------------------
# inpaint / repaint
# ---------------------------------------------------------------------------
def test_inpaint_keeps_known_region():
    dataset = data.ZeroDataset(num_samples=4, shape=[4])
    sched = ops.EDMScheduler()
    key = jax.random.PRNGKey(21)
    nsteps = 50
    B = 8
    x_orig = jnp.ones((B, 4)) * 0.35
    mask = jnp.array([1.0, 1.0, 0.0, 0.0])  # first half known

    k1, k2, k3 = jax.random.split(key, 3)
    fwd = sched.propagate_forward(k1, x_orig, dataset.gradlogprob, nsteps,
                                  record_history=True, stochastic=True)
    y_noised = fwd[::-1]  # index k = grid time t[k]
    x = jax.random.normal(k2, (B, 4)) * sched.maximum_scale
    out = sched.inpaint(k3, x, y_noised, mask, dataset.gradlogprob, nsteps)
    assert out.shape == (B, 4)
    # known region = original, unknown region ~ dataset (zeros)
    np.testing.assert_allclose(out[:, :2], 0.35, rtol=1e-5)
    np.testing.assert_allclose(out[:, 2:], 0.0, atol=5e-2)


@pytest.mark.slow
def test_repaint_shapes_and_known_region():
    dataset = data.ZeroDataset(num_samples=4, shape=[4])
    sched = ops.EDMScheduler()
    key = jax.random.PRNGKey(23)
    nsteps, rsteps, nresamples = 20, 5, 3
    B = 4
    x_orig = jnp.ones((B, 4)) * 0.2
    mask = jnp.array([1.0, 0.0, 0.0, 0.0])
    k1, k2, k3 = jax.random.split(key, 3)
    fwd = sched.propagate_forward(k1, x_orig, dataset.gradlogprob, nsteps,
                                  record_history=True, stochastic=True)
    y_noised = fwd[::-1]
    x = jax.random.normal(k2, (B, 4)) * sched.maximum_scale
    out = sched.repaint(k3, x, y_noised, mask, dataset.gradlogprob,
                        nsteps=nsteps, rsteps=rsteps, nresamples=nresamples)
    assert out.shape == (B, 4)
    hist = sched.repaint(k3, x, y_noised, mask, dataset.gradlogprob,
                         nsteps=nsteps, rsteps=rsteps, nresamples=nresamples,
                         record_history=True)
    expected_rows = int(nresamples * (nsteps / rsteps - 1)) + 2
    assert hist.shape == (expected_rows, B, 4)


# ---------------------------------------------------------------------------
# langevin knobs
# ---------------------------------------------------------------------------
def test_langevin_factor_and_interval_gate():
    sched = ops.EDMScheduler(langevin_const=2.0)
    t = jnp.array(3.0)
    # EDM: s=1, sigma'sigma = t -> factor = const * t
    np.testing.assert_allclose(sched.langevin_factor(t), 6.0, rtol=1e-6)
    np.testing.assert_allclose(sched.noise_injection(t), np.sqrt(12.0),
                               rtol=1e-6)
    sched2 = ops.EDMScheduler(langevin_const=2.0, langevin_interval=(1.0, 5.0))
    gates = sched2._langevin_gate(np.array([0.5, 3.0, 10.0]))
    np.testing.assert_allclose(gates, [0.0, 1.0, 0.0])


def test_edm_grid_rejects_single_step():
    """nsteps=1 used to produce a silent NaN grid (the reference's
    create_steps divides by n-2); it must raise instead."""
    sched = ops.EDMScheduler()
    with pytest.raises(ValueError):
        sched.create_steps(2)
    steps = sched.create_steps(3)
    assert np.all(np.isfinite(steps))


@pytest.mark.slow
def test_dpmpp2m_second_order_accuracy():
    """DPM-Solver++(2M) (beyond-parity): one network eval per step must
    beat Euler at equal NFE and converge at ~2nd order (calibrated on
    the analytic-oracle PF ODE: euler 0.295/0.148/0.072 at n=8/16/32,
    heun 0.300/0.064/0.019 at 2x the NFE, dpmpp2m 0.184/0.072/0.020)."""
    ds = data.ZeroMeanGaussianDataset(num_samples=256, shape=[2])
    sched = ops.EDMScheduler()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (256, 2)) * sched.maximum_scale

    def score(x, sigma):
        return ds.gradlogprob(x, sigma)

    ref = sched.propagate_backward(key, x0, score, nsteps=400,
                                   integrator="euler")

    def err(integ, n):
        out = sched.propagate_backward(key, x0, score, nsteps=n,
                                       integrator=integ)
        return float(jnp.sqrt(jnp.mean((out - ref) ** 2)))

    assert err("dpmpp2m", 16) < err("euler", 16) * 0.6
    # ~2nd-order convergence: 4x steps shrink error by >6x (1st order
    # would give ~4x); and Heun-class accuracy at half Heun's NFE
    assert err("dpmpp2m", 8) / err("dpmpp2m", 32) > 6.0
    assert err("dpmpp2m", 32) < err("heun", 32) * 1.25
    dpm = sched.propagate_backward(key, x0, score, nsteps=16,
                                   integrator="dpmpp2m")
    assert abs(float(jnp.std(dpm)) - 1.0) < 0.15
    assert abs(float(jnp.mean(dpm))) < 0.15


def test_dpmpp2m_in_karras_model_sampler():
    """The multistep carry threads through KarrasModel.sample."""
    from diffsci_tpu.models import KarrasModel, KarrasModelConfig
    from diffsci_tpu.models.nets.mlp import MLPUncond

    model = KarrasModel(MLPUncond(dim=2, hidden_dims=(8,)),
                        KarrasModelConfig.from_edm())
    vs = model.init(jax.random.PRNGKey(0), (4, 2))
    out = model.sample(vs, jax.random.PRNGKey(1), 4, (2,), nsteps=6,
                       integrator="dpmpp2m")
    assert out.shape == (4, 2)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_dpmpp2m_forward_propagation_finite():
    """Forward propagation has h < 0 per step; the 2M correction must
    drop to first order instead of producing NaN (review finding)."""
    ds = data.ZeroMeanGaussianDataset(num_samples=64, shape=[2])
    sched = ops.EDMScheduler()
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 2))
    out = sched.propagate_forward(
        jax.random.PRNGKey(1), x, lambda z, s: ds.gradlogprob(z, s),
        nsteps=16, integrator="dpmpp2m")
    assert bool(jnp.all(jnp.isfinite(out)))
    # forward end state ~ sigma_max-scale noise
    assert float(jnp.std(out)) > 10.0


def test_gate_scale_equals_langevin_const():
    """gate_scale is a RUNTIME gamma: langevin_const=1 + gate_scale=g
    must equal langevin_const=g exactly (it rides the already-traced
    Langevin gate, so a gamma sweep reuses one compiled executable)."""
    from diffsci_tpu.utils import bcast_right

    def score(z, s):
        return -z / (1.0 + bcast_right(s, z) ** 2)

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 3)) * 80.0
    seq = np.random.default_rng(0).standard_normal((8, 4, 3)).astype(
        np.float32)
    ref = ops.EDMScheduler(langevin_const=3.0).propagate_backward(
        key, x, score, 8, stochastic=True, record_history=True,
        noise_seq=seq)
    got = ops.EDMScheduler(langevin_const=1.0).propagate_backward(
        key, x, score, 8, stochastic=True, record_history=True,
        noise_seq=seq, gate_scale=jnp.float32(3.0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
    # and with the interval gate engaged
    ref2 = ops.EDMScheduler(
        langevin_const=2.0, langevin_interval=(0.1, 10.0)
    ).propagate_backward(key, x, score, 8, stochastic=True,
                         record_history=True, noise_seq=seq)
    got2 = ops.EDMScheduler(
        langevin_const=1.0, langevin_interval=(0.1, 10.0)
    ).propagate_backward(key, x, score, 8, stochastic=True,
                         record_history=True, noise_seq=seq,
                         gate_scale=jnp.float32(2.0))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-6, atol=1e-6)


def test_karras_model_langevin_scale_runtime_sweep():
    """KarrasModel.sample(langevin_scale=...) compiles ONCE for any
    gamma and matches the baked-const path."""
    from diffsci_tpu.models import KarrasModel, KarrasModelConfig
    from diffsci_tpu.models.nets.mlp import MLPUncond

    net = MLPUncond(3, hidden_dims=(8,))
    model = KarrasModel(net, KarrasModelConfig.from_edm())
    vs = model.init(jax.random.PRNGKey(0), (4, 3))
    key = jax.random.PRNGKey(1)
    out3 = model.sample(vs, key, 4, (3,), nsteps=6, stochastic=True,
                        langevin_scale=3.0)
    n_compiled = len(model._jit_cache)
    out1 = model.sample(vs, key, 4, (3,), nsteps=6, stochastic=True,
                        langevin_scale=1.0)
    assert len(model._jit_cache) == n_compiled  # no retrace per gamma

    model_ref = KarrasModel(net, KarrasModelConfig.from_edm())
    model_ref.config.noisescheduler = ops.EDMScheduler(langevin_const=3.0)
    ref3 = model_ref.sample(vs, key, 4, (3,), nsteps=6, stochastic=True)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref3),
                               rtol=1e-5, atol=1e-6)
    assert not np.allclose(np.asarray(out1), np.asarray(out3))


def test_restart_sampling_mog_oracle():
    """Restart sampling (arXiv:2306.14878, beyond parity): ODE segments
    + coordinated re-noise jumps. With the analytic MoG oracle the
    samples land in the modes with the right spread; empty restarts
    reduce exactly to the plain ODE; the whole sampler jits."""
    ds = data.MixtureOfGaussiansDataset(
        num_samples=8, means=[[-2.0, 0.0], [2.0, 0.0]],
        weights=[1.0, 1.0], scale=0.3)
    sched = ops.EDMScheduler()
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (256, 2)) * sched.maximum_scale

    # no intervals == plain deterministic ODE, bitwise
    plain = sched.propagate_backward(key, x, ds.gradlogprob, 36)
    none = sched.restart_propagate_backward(key, x, ds.gradlogprob, 36,
                                            restarts=())
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(none))

    out = jax.jit(lambda k, x: sched.restart_propagate_backward(
        k, x, ds.gradlogprob, 36, restarts=((0.06, 1.5, 3),)))(key, x)
    out = np.asarray(out)
    assert np.all(np.isfinite(out))
    # every sample near a mode, both modes populated, in-mode std ~ 0.3
    d = np.minimum(np.linalg.norm(out - [-2, 0], axis=1),
                   np.linalg.norm(out - [2, 0], axis=1))
    assert np.quantile(d, 0.95) < 1.0, np.quantile(d, 0.95)
    right = out[:, 0] > 0
    assert 0.3 < right.mean() < 0.7
    in_mode = out[right] - [2, 0]
    assert 0.15 < in_mode.std() < 0.5
    # the restarts actually changed the trajectory vs plain ODE
    assert not np.allclose(out, np.asarray(plain))

    # invalid intervals raise
    with pytest.raises(ValueError):
        sched.restart_propagate_backward(key, x, ds.gradlogprob, 36,
                                         restarts=((2.0, 1.0, 1),))
    with pytest.raises(ValueError):
        sched.restart_propagate_backward(
            key, x, ds.gradlogprob, 36,
            restarts=((0.05, 1.0, 1), (0.5, 3.0, 1)))


def test_karras_model_sample_restart():
    """Model-level restart sampling wires the denoiser score through the
    scheduler's restart path under jit."""
    from diffsci_tpu.models import KarrasModel, KarrasModelConfig, MLPUncond
    m = KarrasModel(MLPUncond(dim=2, hidden_dims=[8]),
                    KarrasModelConfig.from_edm())
    vs = m.init(jax.random.PRNGKey(0), (4, 2))
    out = jax.jit(lambda v, k: m.sample_restart(
        v, k, 8, (2,), nsteps=12, restarts=((0.1, 2.0, 2),)))(
        vs, jax.random.PRNGKey(1))
    assert out.shape == (8, 2) and bool(jnp.all(jnp.isfinite(out)))
