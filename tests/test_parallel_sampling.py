"""Parallel-in-time (Picard / ParaDiGMS) sampling
(ops/parallel_sampling.py) — beyond parity: the reference has no
parallel-in-time sampler. Pinned against sequential Euler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsci_tpu import data, ops
from diffsci_tpu.models import KarrasModel, KarrasModelConfig, MLPUncond
from diffsci_tpu.ops.parallel_sampling import (picard_propagate_backward,
                                               picard_window_sample)


def _setup(nsamples=16):
    ds = data.MixtureOfGaussiansDataset(
        num_samples=8, means=[[-1.5, 0.0], [1.5, 0.0]],
        weights=[1.0, 1.0], scale=0.3)
    sched = ops.EDMScheduler()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (nsamples, 2)) * sched.maximum_scale
    return ds, sched, key, x0


def test_full_picard_exact_at_nsteps_iters():
    """iters=nsteps reproduces the sequential Euler trajectory (the Picard
    fixed point IS the sequential solution)."""
    ds, sched, key, x0 = _setup()
    seq = sched.propagate_backward(key, x0, ds.gradlogprob, nsteps=16,
                                   integrator="euler")
    par = picard_propagate_backward(sched, x0, ds.gradlogprob, nsteps=16)
    np.testing.assert_allclose(np.asarray(par), np.asarray(seq),
                               rtol=1e-4, atol=1e-4)
    # tol-mode (while_loop) reaches the same fixed point under jit
    par_tol = jax.jit(lambda x: picard_propagate_backward(
        sched, x, ds.gradlogprob, nsteps=16, tol=1e-5))(x0)
    np.testing.assert_allclose(np.asarray(par_tol), np.asarray(seq),
                               rtol=1e-4, atol=1e-4)


def test_window_picard_matches_and_saves_sweeps():
    """Sliding-window Picard: tol=0 degenerates to sequential Euler
    (nsteps sweeps); tol=1e-3 converges in FEWER sweeps to the same
    answer. At nsteps=64 the measured saving is ~3x serial calls."""
    ds, sched, key, x0 = _setup()
    for S, W, min_saving in [(16, 8, 1.0), (64, 16, 2.0)]:
        seq = sched.propagate_backward(key, x0, ds.gradlogprob, nsteps=S,
                                       integrator="euler")
        out0, sweeps0 = picard_window_sample(
            sched, x0, ds.gradlogprob, nsteps=S, window=W, tol=0.0,
            return_sweeps=True)
        assert int(sweeps0) == S
        np.testing.assert_allclose(np.asarray(out0), np.asarray(seq),
                                   rtol=1e-4, atol=1e-4)
        out, sweeps = picard_window_sample(
            sched, x0, ds.gradlogprob, nsteps=S, window=W, tol=1e-3,
            return_sweeps=True)
        assert S / int(sweeps) >= min_saving, (S, int(sweeps))
        np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                                   rtol=1e-3, atol=1e-3)


def test_window_picard_samples_the_distribution():
    """End point lands on the mixture modes (quality check, not just
    trajectory parity)."""
    ds, sched, key, x0 = _setup(nsamples=64)
    out = picard_window_sample(sched, x0, ds.gradlogprob, nsteps=64,
                               window=16, tol=1e-3)
    out = np.asarray(out)
    dists = np.minimum(np.linalg.norm(out - np.array([-1.5, 0.0]), axis=1),
                       np.linalg.norm(out - np.array([1.5, 0.0]), axis=1))
    assert np.mean(dists) < 0.5, np.mean(dists)


def test_karras_model_sample_parallel():
    """KarrasModel.sample_parallel(tol=0) == model.sample(euler) through
    an (untrained) net at few steps (longer untrained rollouts amplify
    float reassociation chaotically)."""
    model = KarrasModel(MLPUncond(dim=3, hidden_dims=(16,)),
                        KarrasModelConfig.from_edm())
    variables = model.init(jax.random.PRNGKey(0), (4, 3))
    key = jax.random.PRNGKey(5)
    seq = model.sample(variables, key, 8, (3,), nsteps=4,
                       integrator="euler")
    par, sweeps = model.sample_parallel(variables, key, 8, (3,), nsteps=4,
                                        window=4, tol=0.0,
                                        return_sweeps=True)
    assert int(sweeps) == 4
    np.testing.assert_allclose(np.asarray(par), np.asarray(seq),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_window_picard_stochastic_matches_euler_maruyama():
    """stochastic=True: the pre-drawn injected noise enters the Picard sum
    as a constant, so tol=0 reproduces sequential Euler-Maruyama with the
    same replayed noise exactly; tol=1e-3 converges in ~2x fewer sweeps
    (the 100+-step SDE quality tier is where parallel-in-time pays)."""
    ds, sched0, key, _ = _setup()
    sched = ops.EDMScheduler(langevin_const=1.0)
    x0 = jax.random.normal(key, (16, 2)) * sched.maximum_scale
    S = 64
    eps = jax.random.normal(jax.random.PRNGKey(9), (S, 16, 2))
    seq = sched.propagate_backward(key, x0, ds.gradlogprob, nsteps=S,
                                   stochastic=True,
                                   integrator="euler-maruyama",
                                   noise_seq=eps)
    out0, sweeps0 = picard_window_sample(
        sched, x0, ds.gradlogprob, nsteps=S, window=16, tol=0.0,
        stochastic=True, noise_seq=eps, return_sweeps=True)
    assert int(sweeps0) == S
    np.testing.assert_allclose(np.asarray(out0), np.asarray(seq),
                               rtol=1e-4, atol=1e-4)
    out, sweeps = picard_window_sample(
        sched, x0, ds.gradlogprob, nsteps=S, window=16, tol=1e-3,
        stochastic=True, noise_seq=eps, return_sweeps=True)
    assert S / int(sweeps) >= 1.5, int(sweeps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                               rtol=1e-3, atol=1e-3)

    # model-level stochastic path runs and stays finite
    model = KarrasModel(MLPUncond(dim=3, hidden_dims=(16,)),
                        KarrasModelConfig.from_edm())
    variables = model.init(jax.random.PRNGKey(0), (4, 3))
    out_m = model.sample_parallel(variables, jax.random.PRNGKey(2), 8,
                                  (3,), nsteps=8, window=4, tol=1e-3,
                                  stochastic=True)
    assert out_m.shape == (8, 3)
    assert bool(jnp.all(jnp.isfinite(out_m)))
