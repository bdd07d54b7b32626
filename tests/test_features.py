"""Feature tests: AnoDDPM / DDAD anomaly detection, RePaint wrapper."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from diffsci_tpu import ops, data
from diffsci_tpu.features import AnoDDPM, DDAD, RePaint

KEY = jax.random.PRNGKey(0)


def test_anoddpm_detects_anomaly():
    """An out-of-distribution input reconstructs toward the data manifold,
    so its reconstruction error exceeds an in-distribution input's."""
    dataset = data.ZeroDataset(num_samples=4, shape=[8])
    sched = ops.EDMScheduler()
    detector = AnoDDPM(sched)
    nsteps, step = 50, 25

    x_normal = jnp.zeros((4, 8))          # on-manifold
    x_anom = jnp.ones((4, 8)) * 3.0       # off-manifold
    err_n = detector.reconstruction_error(KEY, x_normal,
                                          dataset.gradlogprob, step, nsteps)
    err_a = detector.reconstruction_error(KEY, x_anom,
                                          dataset.gradlogprob, step, nsteps)
    assert err_n.shape == (4,)
    assert float(jnp.mean(err_a)) > float(jnp.mean(err_n))


def test_anoddpm_record_history():
    dataset = data.ZeroDataset(num_samples=4, shape=[4])
    sched = ops.EDMScheduler()
    detector = AnoDDPM(sched)
    hist = detector.reconstruct(KEY, jnp.zeros((2, 4)),
                                dataset.gradlogprob, step=10, nsteps=20,
                                record_history=True)
    assert hist.shape == (11, 2, 4)


@pytest.mark.slow
def test_ddad_guidance_selects_input_mode():
    """On a bimodal dataset, the DDAD correction w (y - x) biases fully
    re-noised reconstructions toward the mode of the guidance input (the
    correction acts at large sigma where the score is mode-agnostic)."""
    dataset = data.MixtureOfGaussiansDataset(
        num_samples=4, means=[[-2.0], [2.0]], weights=[0.5, 0.5], scale=0.2)
    sched = ops.EDMScheduler()
    ddad = DDAD(sched)
    x_in = jnp.full((64, 1), 2.0)  # sits in the +2 mode
    # note: like the reference formulation, the correction enters the score
    # directly, so stability requires w * t * |dt| < 1 — start from a
    # moderate noise level (step 25 of 50, t ~ 2.3)
    rec_guided = ddad.reconstruct(KEY, x_in, dataset.gradlogprob,
                                  nsteps=50, initial_step=25, w=3.0)
    rec_free = ddad.reconstruct(KEY, x_in, dataset.gradlogprob,
                                nsteps=50, initial_step=25, w=0.0)
    assert rec_guided.shape == (64, 1)
    frac_guided = float(jnp.mean(rec_guided > 0))
    frac_free = float(jnp.mean(rec_free > 0))
    assert frac_guided > frac_free
    assert frac_guided > 0.95


def test_ddad_reconstruction_error_shape():
    dataset = data.ZeroDataset(num_samples=4, shape=[4])
    ddad = DDAD(ops.EDMScheduler())
    err = ddad.reconstruction_error(KEY, jnp.zeros((3, 4)),
                                    dataset.gradlogprob, step=10, nsteps=20)
    assert err.shape == (3,)


def test_repaint_feature():
    dataset = data.ZeroDataset(num_samples=4, shape=[4])
    sched = ops.EDMScheduler()
    rp = RePaint(sched)
    x_init = jnp.full((2, 4), 0.3)
    mask = jnp.array([1.0, 1.0, 0.0, 0.0])
    out = rp.reconstruct(KEY, x_init, dataset.gradlogprob, mask,
                         n_resamples=2, resample_steps=5, nsteps=20)
    assert out.shape == (2, 4)
    # unknown region goes to the dataset manifold (zeros)
    np.testing.assert_allclose(out[:, 2:], 0.0, atol=0.1)
