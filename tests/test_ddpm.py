"""DDPM v2 tests: schedules, integrators, analytic sampling convergence."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from diffsci_tpu.models.ddpm import (
    ClassicalDDPMScheduler, ExpDDPMScheduler, CosineDDPMScheduler,
    DDPMModelConfig, DDPMModel, DDIMIntegrator)

KEY = jax.random.PRNGKey(0)


def test_classical_schedule_table():
    sched = ClassicalDDPMScheduler(T=100)
    t = jnp.arange(0, 101, dtype=jnp.float32)
    ca = sched.calpha(t)
    assert float(ca[0]) == 1.0
    assert jnp.all(jnp.diff(ca) <= 0)  # monotone decreasing
    assert float(ca[-1]) < 0.01
    # alpha_t = calpha_t / calpha_{t-1} = 1 - beta_t
    t5 = jnp.float32(5.0)
    np.testing.assert_allclose(sched.alpha(t5), 1 - sched.beta(t5),
                               rtol=1e-5)


def test_exp_cosine_schedules():
    for sched in (ExpDDPMScheduler(T=100), CosineDDPMScheduler(T=100)):
        ca0 = sched.calpha(jnp.float32(0.0))
        caT = sched.calpha(jnp.float32(100.0))
        assert float(ca0) > 0.9
        assert float(caT) < 0.2
        t = jnp.linspace(1, 100, 10)
        assert jnp.all(jnp.diff(sched.calpha(t)) < 0)


class OracleEpsNet(nn.Module):
    """Optimal epsilon-predictor for a point mass at x0: the posterior mean
    of the injected noise, eps_hat = (x - sqrt(abar) x0) / sqrt(1-abar)."""
    scheduler: object
    x0: float = 0.0

    @nn.compact
    def __call__(self, x, t=None, y=None, train=False):
        dummy = self.param("dummy", nn.initializers.ones, ())
        ca = self.scheduler.calpha(t).reshape((-1,) + (1,) * (x.ndim - 1))
        return ((x - jnp.sqrt(ca) * self.x0)
                / jnp.sqrt(jnp.maximum(1 - ca, 1e-8)) + 0.0 * dummy)


@pytest.mark.parametrize("factory,kwargs", [
    (DDPMModelConfig.from_classical_ddpm, {"integrator_type": 1}),
    (DDPMModelConfig.from_classical_ddpm, {"integrator_type": 2}),
    (DDPMModelConfig.from_ddpm, {}),
    (DDPMModelConfig.from_ddim, {}),
])
def test_sampling_converges_to_point(factory, kwargs):
    config = factory(**kwargs)
    config.scheduler.T = 200
    model = DDPMModel(OracleEpsNet(config.scheduler, x0=0.5), config)
    variables = model.init(KEY, (4, 2))
    out = model.sample(variables, KEY, 128, (2,), nsteps=200)
    assert abs(float(jnp.mean(out)) - 0.5) < 0.1
    assert float(jnp.std(out)) < 0.2


def test_ddim_is_deterministic():
    config = DDPMModelConfig.from_ddim()
    config.scheduler.T = 50
    model = DDPMModel(OracleEpsNet(config.scheduler, x0=0.0), config)
    variables = model.init(KEY, (4, 2))
    o1 = model.sample(variables, jax.random.PRNGKey(5), 8, (2,), nsteps=50)
    o2 = model.sample(variables, jax.random.PRNGKey(5), 8, (2,), nsteps=50)
    np.testing.assert_allclose(o1, o2)
    integ = config.integrator
    assert isinstance(integ, DDIMIntegrator)
    np.testing.assert_allclose(integ.noise_injector(jnp.ones(3), 50), 0.0)


def test_loss_fn_with_oracle_is_zero():
    config = DDPMModelConfig.from_classical_ddpm()
    model = DDPMModel(OracleEpsNet(config.scheduler, x0=0.0), config)
    variables = model.init(KEY, (4, 2))
    x = jnp.zeros((32, 2))  # the point mass itself
    t = model.sample_timestep(KEY, 32)
    loss = model.loss_fn(variables, KEY, x, t)
    assert float(loss) < 1e-6


def test_record_history():
    config = DDPMModelConfig.from_ddim()
    config.scheduler.T = 20
    model = DDPMModel(OracleEpsNet(config.scheduler), config)
    variables = model.init(KEY, (4, 2))
    hist = model.sample(variables, KEY, 4, (2,), nsteps=20,
                        record_history=True)
    assert hist.shape == (21, 4, 2)


def test_forward_propagation():
    config = DDPMModelConfig.from_classical_ddpm()
    integ = config.integrator
    x = jnp.ones((64, 2))
    out = integ.propagate_forward(KEY, x, nsteps=1000)
    # fully noised: approx standard normal
    assert abs(float(jnp.mean(out))) < 0.2
    assert abs(float(jnp.std(out)) - 1.0) < 0.2


@pytest.mark.slow
def test_ddpm_compute_dtype_bf16():
    """bf16 mixed precision in DDPMModel."""
    import flax.linen as nn
    from diffsci_tpu.models.ddpm import (DDPMModel, DDPMModelConfig,
                                         CosineDDPMScheduler, DDPMIntegrator)

    class TinyEps(nn.Module):
        @nn.compact
        def __call__(self, x, t, y=None, train=False):
            h = nn.Dense(8)(x) + nn.Dense(8)(t[:, None] / 1000.0)
            return nn.Dense(x.shape[-1])(nn.silu(h))

    sch = CosineDDPMScheduler()
    config = DDPMModelConfig(scheduler=sch,
                             integrator=DDPMIntegrator(sch))
    model = DDPMModel(TinyEps(), config, compute_dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), (4, 2))
    eps = model.noise_predictor(v, jnp.ones((4, 2)), jnp.full((4,), 10.0))
    assert eps.dtype == jnp.float32
    loss = model.loss_fn(v, jax.random.PRNGKey(1), jnp.ones((4, 2)),
                         jnp.full((4,), 10.0))
    assert jnp.isfinite(loss)
    out = model.sample(v, jax.random.PRNGKey(2), 2, (2,), nsteps=5)
    assert out.shape == (2, 2) and bool(jnp.all(jnp.isfinite(out)))
