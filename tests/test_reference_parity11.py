"""Round-4 whole-pipeline sampling parity: the reference's FULL
``KarrasModule.sample`` path (karrasmodule.py:801-931) against our
``propagate_white_noise`` with the same transferred PUNetG weights and
the same starting white noise — preconditioner x scheduler x integrator
x net composed in one trajectory.

Fixture: full_pipeline_sample.npz (scripts/gen_fixtures.py --only r4).
Every stage is pinned in isolation elsewhere; this closes the last
composition gap (VERDICT round 3, item 3):

- 18-NFE deterministic Heun sample, unconditional
- the same with classifier-free guidance 2.5 through a conditional
  embedding (karrasmodule.py:705-716)
- Euler-Maruyama stochastic sample with a replayed noise sequence
  (integrators.py:57-69)
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from diffsci_tpu.models import (KarrasModel, KarrasModelConfig, PUNetG,
                                PUNetGConfig)
from diffsci_tpu.extra import converters

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures", "reference")


def _check(ours, ref, rtol, atol, label):
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=rtol, atol=atol, err_msg=label)


def _nchw_to_nhwc(a):
    return jnp.asarray(a).transpose(0, 2, 3, 1)


def _small_config():
    # mirrors gen_reference_fixtures_r4._small_config
    return PUNetGConfig(model_channels=8,
                        channel_expansion=[2],
                        number_resnet_downward_block=1,
                        number_resnet_upward_block=1,
                        number_resnet_attn_block=1,
                        number_resnet_before_attn_block=1,
                        number_resnet_after_attn_block=1)


@pytest.fixture(scope="module")
def gold():
    return np.load(os.path.join(FIXDIR, "full_pipeline_sample.npz"))


def _build(gold, prefix, conditional=False):
    sd = {k[5:]: gold[k] for k in gold.files if k.startswith(prefix)}
    cemb_sd = {k: sd.pop(k) for k in list(sd)
               if k.startswith("conditional_embedding.")}
    net = PUNetG(_small_config(),
                 conditional_embedding=nn.Dense(8) if conditional else None)
    model = KarrasModel(net, KarrasModelConfig.from_edm(),
                        conditional=conditional)
    x0 = _nchw_to_nhwc(gold["x0"])
    y = jnp.asarray(gold["y"]) if conditional else None
    template = model.init(jax.random.PRNGKey(0), x0.shape, y)
    name_map = converters.scope_name_map(
        converters.punetg_reference_name_map(sd.keys()), "model/")
    for torch_key in cemb_sd:
        leaf = "kernel" if torch_key.endswith("weight") else "bias"
        name_map[f"params/model/conditional_embedding/{leaf}"] = torch_key
        sd[torch_key] = cemb_sd[torch_key]
    assert len(name_map) == len(sd)
    variables = converters.import_torch_state_dict(sd, name_map, template)
    return model, variables, x0, y


def test_full_pipeline_sample_uncond(gold):
    """18-NFE deterministic Heun from fixed white noise — the composed
    sample() hot path (karrasmodule.py:867-931, schedulers.py:48-89)."""
    model, variables, x0, _ = _build(gold, "usd__")
    hist = model.propagate_white_noise(
        variables, jax.random.PRNGKey(0), x0, nsteps=18,
        record_history=True)
    assert hist.shape[0] == 19
    ref = gold["uncond_traj"]  # frames at gold['keep']
    ours = np.asarray(hist)[gold["keep"]]  # already NHWC
    # final-sample pin at the VERDICT-mandated tightness
    _check(ours[-1], ref[-1].transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4,
           label="uncond final sample")
    # and the intermediate frames (looser: early frames are O(80) scaled)
    _check(ours, ref.transpose(0, 1, 3, 4, 2), rtol=1e-3, atol=5e-4,
           label="uncond trajectory")


def test_full_pipeline_sample_cfg(gold):
    """Guidance=2.5 through a conditional embedding: the CFG double
    forward (karrasmodule.py:705-716) composed into the full 18-NFE
    Heun trajectory."""
    model, variables, x0, y = _build(gold, "csd__", conditional=True)
    hist = model.propagate_white_noise(
        variables, jax.random.PRNGKey(0), x0, y=y, guidance=2.5,
        nsteps=18, record_history=True)
    ref = gold["cfg_traj"]
    ours = np.asarray(hist)[gold["keep"]]  # already NHWC
    _check(ours[-1], ref[-1].transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4,
           label="cfg final sample")
    _check(ours, ref.transpose(0, 1, 3, 4, 2), rtol=1e-3, atol=5e-4,
           label="cfg trajectory")


def test_full_pipeline_sample_euler_maruyama(gold):
    """Stochastic full pipeline: Euler-Maruyama with the reference's
    replayed per-step noise through the same transferred net
    (integrators.py:57-69, schedulers.py:247-294)."""
    model, variables, x0, _ = _build(gold, "usd__")
    sched = model.config.noisescheduler

    def score_fn(xx, sigma):
        return model.get_score(variables, xx, sigma)

    hist = sched.propagate_backward(
        jax.random.PRNGKey(0), x0 * sched.maximum_scale, score_fn,
        nsteps=18, stochastic=True, record_history=True,
        noise_seq=jnp.asarray(gold["noise_seq"]).transpose(0, 1, 3, 4, 2))
    ref = gold["em_traj"]
    ours = np.asarray(hist)[gold["keep"]]  # already NHWC
    _check(ours[-1], ref[-1].transpose(0, 2, 3, 1), rtol=1e-3, atol=2e-4,
           label="euler-maruyama final sample")
    _check(ours, ref.transpose(0, 1, 3, 4, 2), rtol=1e-3, atol=5e-4,
           label="euler-maruyama trajectory")
