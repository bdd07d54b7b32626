"""DDPM v1 compatibility layer pinned against executed-reference golden
fixtures (scripts/fixturegen/gen_reference_fixtures_r4b.py; reference
diffsci/models/ddpm/v1/). v1 is upstream-deprecated but inventoried —
this closes the last SURVEY.md §2.3 row."""

import pathlib

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import flax.linen as nn

from diffsci_tpu.models.ddpm_v1 import (DDPMSchedulerV1, DDPMModuleV1,
                                        default_v1_optimizer)

FIX = pathlib.Path(__file__).parent / "fixtures" / "reference" / \
    "ddpm_v1_golden.npz"


@pytest.fixture(scope="module")
def fx():
    return np.load(FIX)


class AnalyticNet(nn.Module):
    """Mirror of the fixture generator's torch stand-in:
    tanh(x) * (0.9 + 0.1 cos(t/T)) (+ 0.05 mean(y) when conditional)."""
    T: int
    conditional: bool = False

    @nn.compact
    def __call__(self, x, t, y=None):
        tt = t.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)
        out = jnp.tanh(x) * (0.9 + 0.1 * jnp.cos(tt / self.T))
        if self.conditional and y is not None:
            out = out + 0.05 * jnp.mean(y, axis=-1, keepdims=True)
        return out


def test_v1_scheduler_tables(fx):
    for T, tag in ((1000, "T1000"), (50, "T50")):
        sched = DDPMSchedulerV1(T=T)
        t = jnp.asarray(fx[f"sched_{tag}_t"], jnp.float32)
        np.testing.assert_allclose(np.asarray(sched.beta(t)),
                                   fx[f"sched_{tag}_beta"], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sched.alpha(t)),
                                   fx[f"sched_{tag}_alpha"], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sched.sigma(t)),
                                   fx[f"sched_{tag}_sigma"], rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sched.calpha(t)),
                                   fx[f"sched_{tag}_calpha"], rtol=2e-5)


def test_v1_loss_values(fx):
    x = jnp.asarray(fx["loss_x"])
    y = jnp.asarray(fx["loss_y"])
    t = jnp.asarray(fx["loss_t"])
    eps = jnp.asarray(fx["loss_eps"])
    key = jax.random.PRNGKey(0)
    for cond in (False, True):
        net = AnalyticNet(T=1000, conditional=cond)
        for lt in ("mse", "huber"):
            for scaling in ("constant", "default"):
                mod = DDPMModuleV1(net, DDPMSchedulerV1(T=1000),
                                   conditional=cond, loss_type=lt,
                                   loss_scaling=scaling)
                vs = mod.init(key, x.shape, y if cond else None)
                val = jax.jit(lambda v, lamb=mod, yy=(y if cond else None):
                              lamb.loss_fn(v, key, x, t, yy, noise=eps))(vs)
                ref = fx[f"loss_{'cond' if cond else 'uncond'}"
                         f"_{lt}_{scaling}"]
                np.testing.assert_allclose(float(val), float(ref),
                                           rtol=2e-5)


@pytest.mark.parametrize("sampler,nt,name", [
    ("ddpm", 1, "ddpm_backward_nt1"),
    ("ddpm", 2, "ddpm_backward_nt2"),
    ("ddim", 0, "ddim_backward_nt0"),
    ("ddim", 2, "ddim_backward_nt2"),
])
def test_v1_backward_trajectories(fx, sampler, nt, name):
    """Full 50-step reverse scans == the reference loops with the same
    replayed noise (ddpmsampler.py:42-104,143-204 incl. the as-executed
    sqrt(alpha_t) DDIM 'predicted term')."""
    net = AnalyticNet(T=50)
    mod = DDPMModuleV1(net, DDPMSchedulerV1(T=50))
    x0 = jnp.asarray(fx["samp_x0"])
    seq = jnp.asarray(fx["samp_noise_seq"])
    vs = mod.init(jax.random.PRNGKey(0), x0.shape)
    out = jax.jit(lambda v: mod.backward(
        v, jax.random.PRNGKey(0), x0, sampler=sampler, noise_type=nt,
        noise_seq=seq))(vs)
    np.testing.assert_allclose(np.asarray(out), fx[name],
                               rtol=2e-4, atol=2e-5)


def test_v1_conditional_backward(fx):
    net = AnalyticNet(T=50, conditional=True)
    mod = DDPMModuleV1(net, DDPMSchedulerV1(T=50), conditional=True)
    x0 = jnp.asarray(fx["samp_x0"])
    y0 = jnp.asarray(fx["samp_y0"])
    seq = jnp.asarray(fx["samp_noise_seq"])
    vs = mod.init(jax.random.PRNGKey(0), x0.shape, y0[None])
    out = mod.backward(vs, jax.random.PRNGKey(0), x0, y=y0,
                       noise_type=1, noise_seq=seq)
    np.testing.assert_allclose(np.asarray(out), fx["ddpm_backward_cond"],
                               rtol=2e-4, atol=2e-5)


def test_v1_apply_noise(fx):
    net = AnalyticNet(T=50)
    mod = DDPMModuleV1(net, DDPMSchedulerV1(T=50))
    out = mod.apply_noise(jax.random.PRNGKey(0),
                          jnp.asarray(fx["apply_noise_x"]),
                          jnp.asarray(fx["apply_noise_t"]),
                          noise=jnp.asarray(fx["apply_noise_eps"]))
    np.testing.assert_allclose(np.asarray(out), fx["apply_noise_out"],
                               rtol=1e-5)


def test_v1_trains_and_samples():
    """End-to-end: the v1 module trains through the shared jitted
    train-step machinery (replacing v1's torch loop, ddpmtrainer.py) and
    its sample() produces finite draws."""
    from diffsci_tpu.models import create_train_state, make_train_step

    class TinyNet(nn.Module):
        @nn.compact
        def __call__(self, x, t):
            te = jnp.stack([t / 50.0, jnp.sin(t)], axis=-1)
            h = jnp.concatenate([x, te], axis=-1)
            h = nn.Dense(16)(h)
            h = nn.silu(h)
            return nn.Dense(x.shape[-1])(h)

    net = TinyNet()
    mod = DDPMModuleV1(net, DDPMSchedulerV1(T=50))
    key = jax.random.PRNGKey(0)
    vs = mod.init(key, (8, 2))

    def loss_fn(variables, k, x, y, mask, train=True):
        return mod.loss_fn(variables, k, x), {}

    from diffsci_tpu.models.karras.train import (TrainState,
                                                 split_variables)
    import optax
    tx = default_v1_optimizer(1e-2, restart_period=20)
    params, consts = split_variables(vs)
    state = TrainState(params=params, consts=consts,
                       opt_state=tx.init(params), ema=None,
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(mod, tx, loss_fn=loss_fn)
    x = jax.random.normal(key, (8, 2)) * 0.1 + 1.0
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        state, m = step(state, sub, x)
        losses.append(float(m["train_loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    out = mod.sample({"params": state.params, **state.consts},
                     jax.random.PRNGKey(3), 4, (2,))
    assert out.shape == (4, 2) and bool(jnp.all(jnp.isfinite(out)))
