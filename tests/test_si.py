"""Flow-matching (SIModel) tests: schedulers, flow/score conversion,
training loss, sampling convergence on analytic data, inpainting."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from diffsci_tpu.models.si import SIScheduler, SIModel, SIModelConfig

KEY = jax.random.PRNGKey(0)


def test_scheduler_paths():
    for sched in (SIScheduler.linear(), SIScheduler.cosine()):
        t = jnp.linspace(0.01, 0.99, 11)
        # endpoint values
        np.testing.assert_allclose(sched.alpha_fn(jnp.float32(0.0)), 1.0,
                                   atol=1e-6)
        np.testing.assert_allclose(sched.sigma_fn(jnp.float32(0.0)), 0.0,
                                   atol=1e-6)
        np.testing.assert_allclose(sched.sigma_fn(jnp.float32(1.0)), 1.0,
                                   atol=1e-6)
        # inverse
        np.testing.assert_allclose(sched.sigma_fn_inv(sched.sigma_fn(t)), t,
                                   rtol=1e-5, atol=1e-5)
        # derivative check
        eps = 1e-3
        fd = (sched.sigma_fn(t + eps) - sched.sigma_fn(t - eps)) / (2 * eps)
        np.testing.assert_allclose(sched.sigma_fn_dot(t), fd, rtol=1e-3,
                                   atol=1e-3)


def test_edm_interpolator():
    sched = SIScheduler.edm(sigma_min=0.02, sigma_max=80.0)
    np.testing.assert_allclose(sched.sigma_fn(jnp.float32(0.0)), 0.02,
                               rtol=1e-4)
    np.testing.assert_allclose(sched.sigma_fn(jnp.float32(1.0)), 80.0,
                               rtol=1e-4)
    np.testing.assert_allclose(sched.alpha_fn(jnp.float32(0.3)), 1.0)
    with pytest.raises(ValueError):
        SIScheduler.get_interpolator("bogus")


class AnalyticFlowNet(nn.Module):
    """Exact flow field for a point mass at x0 under the linear path:
    v(x, t) = (x0 (1-t) + t eps_hat)'... for x_t = (1-t) x0 + t eps the
    optimal flow is v = (x - x0)/t * 1 + (-1) x0 ... simpler closed form:
    E[x0|x_t] = x0 (delta), eps_hat = (x - (1-t) x0)/t,
    v = -x0 + eps_hat."""
    x0: float = 0.0

    @nn.compact
    def __call__(self, x, t=None, y=None, train=False):
        dummy = self.param("dummy", nn.initializers.ones, ())
        t_b = t.reshape((-1,) + (1,) * (x.ndim - 1))
        eps_hat = (x - (1 - t_b) * self.x0) / jnp.maximum(t_b, 1e-6)
        return -self.x0 + eps_hat + 0.0 * dummy


def test_flow_sampling_converges_to_point():
    config = SIModelConfig(scheduler="linear", loss_metric="mse")
    model = SIModel(AnalyticFlowNet(x0=0.7), config)
    variables = model.init(KEY, (4, 2))
    out = model.sample(variables, KEY, 64, (2,), nsteps=100)
    np.testing.assert_allclose(out, 0.7, atol=5e-2)


def test_flow_score_conversion():
    """For a zero-point dataset under the linear path, score at x_t is
    -(x)/sigma(t)^2 ... check flow->score consistency numerically via the
    identity on the analytic net with x0=0: score = -x/t^2."""
    config = SIModelConfig(scheduler="linear", loss_metric="mse")
    model = SIModel(AnalyticFlowNet(x0=0.0), config)
    variables = model.init(KEY, (4, 2))
    x = jax.random.normal(KEY, (8, 2))
    t = jnp.full((8,), 0.5)
    score = model.get_score_field(variables, x, t)
    np.testing.assert_allclose(score, -x / 0.25, rtol=1e-4)


def test_loss_fn_and_training():
    from diffsci_tpu.models import MLPUncond
    config = SIModelConfig(scheduler="linear", loss_metric="mse",
                           loss_weighting="uniform")
    model = SIModel(MLPUncond(dim=2, hidden_dims=[32]), config)
    variables = model.init(KEY, (8, 2))
    params = variables["params"]

    import optax
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        x = jnp.zeros((64, 2))  # point mass at 0

        def lf(p):
            kt, kl = jax.random.split(key)
            t = model.sample_timestep(kt, 64)
            return model.loss_fn({"params": p}, kl, x, t)[0]

        loss, grads = jax.value_and_grad(lf)(params)
        upd, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state2, loss

    key = KEY
    losses = []
    for i in range(100):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) * 0.5


def test_edm_timestep_sampler():
    config = SIModelConfig(scheduler="edm", loss_weighting="edm")
    model = SIModel(AnalyticFlowNet(), config)
    t = model.sample_timestep(KEY, 10000)
    assert jnp.all(jnp.isfinite(t))
    # t = sigma_inv(lognormal) concentrated in [0, 1]-ish
    assert float(jnp.mean((t > -0.5) & (t < 1.5))) > 0.95


def test_stochastic_sampling():
    config = SIModelConfig(scheduler="linear", loss_metric="mse")
    model = SIModel(AnalyticFlowNet(x0=0.5), config)
    variables = model.init(KEY, (4, 2))
    out = model.sample(variables, KEY, 256, (2,), nsteps=100,
                       noise_injection=True)
    assert abs(float(jnp.mean(out)) - 0.5) < 0.1


def test_soft_mask():
    config = SIModelConfig()
    model = SIModel(AnalyticFlowNet(), config)
    mask = jnp.zeros((16, 16, 1)).at[4:12, 4:12].set(1.0)
    soft = model.create_soft_mask(mask, falloff=2)
    assert soft.shape == mask.shape
    assert float(soft[8, 8, 0]) > 0.99   # deep inside: known
    assert float(soft[0, 0, 0]) < 0.01   # far outside: unknown
    between = float(soft[4, 8, 0])
    assert 0.01 < between < 0.99         # boundary: smooth
    np.testing.assert_allclose(model.create_soft_mask(mask, 0), mask)


@pytest.mark.slow
def test_inpaint_shapes():
    config = SIModelConfig(scheduler="linear", loss_metric="mse")
    model = SIModel(AnalyticFlowNet(x0=0.0), config)
    variables = model.init(KEY, (1, 8, 8, 1))
    x_orig = jnp.full((8, 8, 1), 0.3)
    mask = jnp.zeros((8, 8, 1)).at[:4].set(1.0)
    out = model.inpaint(variables, KEY, x_orig, mask, nsamples=2,
                        nsteps=10, resample_steps=1, mask_falloff=1)
    assert out.shape == (2, 8, 8, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_si_compute_dtype_bf16():
    """bf16 mixed precision in SIModel (KarrasModel contract parity)."""
    from diffsci_tpu.models.si import SIModel, SIModelConfig
    import flax.linen as nn

    class TinyFlow(nn.Module):
        @nn.compact
        def __call__(self, x, t, y=None, train=False):
            emb = nn.Dense(8)(t[:, None])
            h = nn.Dense(8)(x) + emb
            return nn.Dense(x.shape[-1])(nn.silu(h))

    for cfg in (SIModelConfig(loss_metric="mse"),
                SIModelConfig(loss_metric="mse", precondition_fn="edm")):
        model = SIModel(TinyFlow(), cfg, compute_dtype=jnp.bfloat16)
        v = model.init(jax.random.PRNGKey(0), (4, 2))
        x = jnp.ones((4, 2))
        t = jnp.full((4,), 0.5)
        flow = model.get_flow_field(v, x, t)
        assert flow.dtype == jnp.float32  # output restored to f32
        loss, _ = model.loss_fn(v, jax.random.PRNGKey(1), x, t)
        assert jnp.isfinite(loss)
        # matches f32 model to bf16 tolerance
        model32 = SIModel(TinyFlow(), cfg)
        flow32 = model32.get_flow_field(v, x, t)
        np.testing.assert_allclose(np.asarray(flow), np.asarray(flow32),
                                   rtol=0.05, atol=0.05)


@pytest.mark.slow
def test_running_stat_initial_norm():
    """initial_norm=True (reference flowfield.py:233-286): training batches
    update running mean/var under batch_stats/initial_norm; sampling
    unnormalizes with the stored stats."""
    from diffsci_tpu.models import MLPUncond

    config = SIModelConfig(scheduler="linear", loss_metric="mse",
                           initial_norm=True, sigma_data=0.5)
    model = SIModel(MLPUncond(dim=2, hidden_dims=[16]), config)
    v = model.init(KEY, (8, 2))
    assert "initial_norm" in v["batch_stats"]
    stats0 = v["batch_stats"]["initial_norm"]

    x = jax.random.normal(KEY, (256, 2)) * 3.0 + 1.5
    t = jnp.full((256,), 0.5)
    loss, updates = model.loss_fn(v, jax.random.PRNGKey(1), x, t,
                                  train=True)
    assert jnp.isfinite(loss)
    new_stats = updates["batch_stats"]["initial_norm"]
    # stats moved toward the batch stats (mean≈1.5, var≈9)
    assert float(new_stats["mean"][0]) != float(stats0["mean"][0])
    assert float(new_stats["mean"][0]) > 0.05
    assert float(new_stats["var"][0]) > 1.0

    # eval mode: no updates
    _, upd_eval = model.loss_fn(v, jax.random.PRNGKey(2), x, t, train=False)
    assert upd_eval == {}

    # normalize/unnormalize round-trip through the stored stats
    v2 = dict(v)
    v2["batch_stats"] = {"initial_norm": new_stats}
    xn, _ = model._norm_fwd(v2, x, train=False)
    xr = model._norm_inv(v2, xn)
    np.testing.assert_allclose(np.asarray(xr), np.asarray(x), rtol=1e-5,
                               atol=1e-5)

    # sampling executes end-to-end with the running norm engaged
    out = model.sample(v2, jax.random.PRNGKey(3), 4, (2,), nsteps=5)
    assert out.shape == (4, 2)
    assert bool(jnp.all(jnp.isfinite(out)))
