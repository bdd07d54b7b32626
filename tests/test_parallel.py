"""Multi-device data-parallel tests on the 8-device virtual CPU mesh —
coverage the reference lacks entirely (SURVEY.md §4: no multi-node tests)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from diffsci_tpu import data
from diffsci_tpu.parallel import (make_mesh, shard_batch, replicate,
                                  pad_to_multiple)
from diffsci_tpu.models import (KarrasModel, KarrasModelConfig, MLPUncond,
                                create_train_state, make_train_step)


def test_mesh_has_8_devices():
    assert jax.device_count() == 8
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh()
    x = jnp.zeros((16, 4))
    xs = shard_batch(x, mesh)
    assert xs.sharding.spec == jax.sharding.PartitionSpec("data", None)


def test_data_parallel_train_step_matches_single_device():
    """The same train step on sharded vs unsharded inputs must give the
    same loss and parameters (DP is semantics-preserving)."""
    config = KarrasModelConfig.from_edm(loss_metric="mse")
    model = KarrasModel(MLPUncond(dim=2, hidden_dims=[16]), config)
    # two independent states (same key -> identical init); the jitted train
    # step donates its input state, so each run needs its own buffers
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (8, 2))
    state2, _ = create_train_state(model, jax.random.PRNGKey(0), (8, 2))
    step_fn = make_train_step(model, tx)

    ds = data.ZeroDataset(num_samples=64, shape=[2])
    xs = ds.sample(jax.random.PRNGKey(1))[:32]
    key = jax.random.PRNGKey(2)

    mesh = make_mesh()
    state_b = replicate(state2, mesh)
    xs_sharded = shard_batch(xs, mesh)

    # single-device reference
    state_a, metrics_a = step_fn(state, key, xs)
    state_b, metrics_b = step_fn(state_b, key, xs_sharded)

    np.testing.assert_allclose(metrics_a["train_loss"],
                               metrics_b["train_loss"], rtol=1e-5)
    pa = jax.tree.leaves(state_a.params)
    pb = jax.tree.leaves(state_b.params)
    for a, b in zip(pa, pb):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_multi_step_data_parallel_training_converges():
    config = KarrasModelConfig.from_edm(loss_metric="mse")
    model = KarrasModel(MLPUncond(dim=2, hidden_dims=[32]), config)
    mesh = make_mesh()
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (8, 2))
    state = replicate(state, mesh)
    step_fn = make_train_step(model, tx)

    ds = data.ZeroDataset(num_samples=512, shape=[2])
    xs = ds.sample(jax.random.PRNGKey(1))
    key = jax.random.PRNGKey(3)
    losses = []
    for i in range(30):
        key, sub = jax.random.split(key)
        batch = shard_batch(xs[(i * 32) % 512:(i * 32) % 512 + 32], mesh)
        state, m = step_fn(state, sub, batch)
        losses.append(float(m["train_loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_pad_to_multiple():
    x = jnp.ones((10, 3))
    padded, n = pad_to_multiple(x, 8)
    assert padded.shape == (16, 3)
    assert n == 10
    padded2, n2 = pad_to_multiple(jnp.ones((16, 3)), 8)
    assert padded2.shape == (16, 3)


@pytest.mark.slow
def test_dp_tp_2d_mesh_train_step():
    """Combined data x tensor parallelism: params sharded on their output
    feature axis over 'tensor', batch over 'data'; the jitted train step
    compiles with XLA-inserted collectives and matches single-device."""
    from diffsci_tpu.parallel import shard_state_tensor_parallel
    from jax.sharding import NamedSharding, PartitionSpec as P

    config = KarrasModelConfig.from_edm(loss_metric="mse")
    model = KarrasModel(MLPUncond(dim=2, hidden_dims=[64, 64]), config)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (8, 2))
    state_ref, _ = create_train_state(model, jax.random.PRNGKey(0), (8, 2))
    step_fn = make_train_step(model, tx)

    ds = data.ZeroDataset(num_samples=64, shape=[2])
    xs = ds.sample(jax.random.PRNGKey(1))[:32]
    key = jax.random.PRNGKey(2)

    mesh = make_mesh(8, axes=("data", "tensor"), shape=(4, 2))
    state2 = shard_state_tensor_parallel(state, mesh, min_size=32)
    # the 64-wide hidden kernels must actually be sharded
    k = state2.params["model"]["Dense_0"]["kernel"]
    assert k.sharding.spec == P(None, "tensor")
    batch = jax.device_put(xs, NamedSharding(mesh, P("data", None)))

    state_a, ma = step_fn(state_ref, key, xs)
    state_b, mb = step_fn(state2, key, batch)
    np.testing.assert_allclose(ma["train_loss"], mb["train_loss"],
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_initialize_distributed_single_process():
    """Multi-host init is idempotent and a no-op single-process
    (SURVEY.md §2.5 torchrun-rendezvous analogue)."""
    from diffsci_tpu.parallel import initialize_distributed
    assert initialize_distributed() == jax.process_count()
    assert initialize_distributed() == jax.process_count()  # idempotent


@pytest.mark.slow
def test_dp2_tp4_deeper_tensor_split():
    """dp2 x tp4: 4-way tensor split of the wide kernels still matches the
    single-device step (the scaling direction dryrun_multichip exercises
    at tp2)."""
    from diffsci_tpu.parallel import shard_state_tensor_parallel
    from jax.sharding import NamedSharding, PartitionSpec as P

    config = KarrasModelConfig.from_edm(loss_metric="mse")
    model = KarrasModel(MLPUncond(dim=2, hidden_dims=[64, 64]), config)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (8, 2))
    state_ref, _ = create_train_state(model, jax.random.PRNGKey(0), (8, 2))
    step_fn = make_train_step(model, tx)
    xs = jax.random.normal(jax.random.PRNGKey(1), (8, 2)) * 0.1
    key = jax.random.PRNGKey(2)

    mesh = make_mesh(8, axes=("data", "tensor"), shape=(2, 4))
    state2 = shard_state_tensor_parallel(state, mesh, min_size=32)
    k = state2.params["model"]["Dense_0"]["kernel"]
    assert k.sharding.spec == P(None, "tensor")
    batch = jax.device_put(xs, NamedSharding(mesh, P("data", None)))
    state_a, ma = step_fn(state_ref, key, xs)
    state_b, mb = step_fn(state2, key, batch)
    np.testing.assert_allclose(ma["train_loss"], mb["train_loss"],
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_dp_sp_spatial_sharded_train_step():
    """dp x spatial: batch sharded on both batch and H axes; GSPMD inserts
    the conv halo exchanges automatically and the step matches
    single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from diffsci_tpu.models import PUNetG, PUNetGConfig

    cfg = PUNetGConfig(model_channels=8, channel_expansion=[2],
                       number_resnet_downward_block=1,
                       number_resnet_upward_block=1,
                       number_resnet_attn_block=1,
                       number_resnet_before_attn_block=1,
                       number_resnet_after_attn_block=1)
    config = KarrasModelConfig.from_edm(loss_metric="mse")
    model = KarrasModel(PUNetG(cfg), config)
    state, tx = create_train_state(model, jax.random.PRNGKey(0),
                                   (8, 16, 16, 1))
    ref, _ = create_train_state(model, jax.random.PRNGKey(0), (8, 16, 16, 1))
    step = make_train_step(model, tx)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 1))
    key = jax.random.PRNGKey(2)
    mesh = make_mesh(8, axes=("data", "spatial"), shape=(4, 2))
    batch = jax.device_put(x, NamedSharding(mesh, P("data", "spatial")))
    sa, ma = step(ref, key, x)
    sb, mb = step(state, key, batch)
    np.testing.assert_allclose(float(ma["train_loss"]),
                               float(mb["train_loss"]), rtol=1e-5)


@pytest.mark.xfail(strict=True,
                   reason="upstream XLA:CPU GSPMD miscompile (jax 0.9.0): "
                          "conv with tensor-sharded kernel + spatially-"
                          "sharded input returns wrong values; remove this "
                          "xfail when a jax upgrade fixes it")
def test_xla_cpu_conv_tp_sp_miscompile():
    """Minimal reproducer pinning the upstream bug documented in
    diffsci_tpu/parallel/tensor_parallel.py."""
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = make_mesh(4, axes=("tensor", "spatial"), shape=(2, 2))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 28, 28, 8))
    k = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 32)) * 0.1

    def conv(xx, kk):
        return lax.conv_general_dilated(
            xx, kk, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    ref = jax.jit(conv)(x, k)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "spatial",
                                                 None, None)))
    ks = jax.device_put(k, NamedSharding(mesh, P(None, None, None,
                                                 "tensor")))
    out = jax.jit(conv)(xs, ks)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-6)


def test_fsdp_train_step_matches_single_device():
    """ZeRO-3-style sharding is semantics-preserving: the jitted train
    step on an FSDP-sharded state + data-sharded batch must match the
    single-device run exactly (GSPMD inserts gathers/scatters)."""
    from diffsci_tpu.parallel import fsdp_specs, shard_state_fsdp
    from jax.sharding import PartitionSpec as P

    config = KarrasModelConfig.from_edm(loss_metric="mse")
    model = KarrasModel(MLPUncond(dim=2, hidden_dims=[64]), config)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (8, 2))
    state2, _ = create_train_state(model, jax.random.PRNGKey(0), (8, 2))
    step_fn = make_train_step(model, tx)

    ds = data.ZeroDataset(num_samples=64, shape=[2])
    xs = ds.sample(jax.random.PRNGKey(1))[:32]
    key = jax.random.PRNGKey(2)

    mesh = make_mesh()
    # at least one parameter must actually shard (min_elements tiny here)
    specs = fsdp_specs(state2.params, mesh, min_elements=64)
    assert any(any(ax is not None for ax in s)
               for s in jax.tree.leaves(specs,
                                        is_leaf=lambda x: isinstance(x, P)))
    state_b = shard_state_fsdp(state2, mesh, min_elements=64)
    xs_sharded = shard_batch(xs, mesh)

    state_a, metrics_a = step_fn(state, key, xs)
    state_b, metrics_b = step_fn(state_b, key, xs_sharded)

    np.testing.assert_allclose(metrics_a["train_loss"],
                               metrics_b["train_loss"], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_fsdp_composes_with_tensor_parallel():
    """fsdp over 'data' composes with tp over 'tensor' on a 2D mesh:
    specs never double-shard a dimension and the step stays exact."""
    from diffsci_tpu.parallel import (fsdp_specs, shard_state_fsdp,
                                      tensor_parallel_specs)
    from jax.sharding import PartitionSpec as P

    config = KarrasModelConfig.from_edm(loss_metric="mse")
    model = KarrasModel(MLPUncond(dim=2, hidden_dims=[128]), config)
    state, tx = create_train_state(model, jax.random.PRNGKey(0), (8, 2))
    state2, _ = create_train_state(model, jax.random.PRNGKey(0), (8, 2))
    step_fn = make_train_step(model, tx)

    mesh = make_mesh(8, axes=("data", "tensor"), shape=(4, 2))
    tp = tensor_parallel_specs(state2.params, mesh, min_size=64)
    combined = fsdp_specs(state2.params, mesh, min_elements=64,
                          existing_specs=tp)
    for s in jax.tree.leaves(combined,
                             is_leaf=lambda x: isinstance(x, P)):
        axes = [a for a in s if a is not None]
        assert len(axes) == len(set(axes))  # no axis reused
    state_b = shard_state_fsdp(state2, mesh, min_elements=64,
                               tensor_axis="tensor", tensor_min_size=64)

    ds = data.ZeroDataset(num_samples=64, shape=[2])
    xs = ds.sample(jax.random.PRNGKey(1))[:32]
    key = jax.random.PRNGKey(2)
    state_a, metrics_a = step_fn(state, key, xs)
    state_b, metrics_b = step_fn(state_b, key, shard_batch(xs, mesh))
    np.testing.assert_allclose(metrics_a["train_loss"],
                               metrics_b["train_loss"], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_dp_sampling_matches_single_device():
    """Data-parallel sampling (KarrasModel.sample(mesh=...)) equals
    single-device sampling: same key -> same noise -> same trajectories,
    just sharded compute (the TPU analogue of the reference's multi-GPU
    process-pool eval)."""
    net = MLPUncond(3, hidden_dims=(16,))
    model = KarrasModel(net, KarrasModelConfig.from_edm())
    variables = model.init(jax.random.PRNGKey(0), (8, 3))
    mesh = make_mesh()
    key = jax.random.PRNGKey(5)

    single = model.sample(variables, key, 16, (3,), nsteps=8)
    model2 = KarrasModel(net, KarrasModelConfig.from_edm())
    sharded = model2.sample(variables, key, 16, (3,), nsteps=8, mesh=mesh)
    assert sharded.shape == single.shape
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-5, atol=1e-6)

    # stochastic path shards too (same in-scan key stream)
    single_s = model.sample(variables, key, 16, (3,), nsteps=8,
                            stochastic=True)
    sharded_s = model2.sample(variables, key, 16, (3,), nsteps=8,
                              stochastic=True, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded_s), np.asarray(single_s),
                               rtol=1e-5, atol=1e-6)

    with pytest.raises(ValueError):
        model2.sample(variables, key, 9, (3,), nsteps=4, mesh=mesh)


@pytest.mark.slow
def test_dp_sampling_si_and_ddpm():
    """SIModel.sample(mesh=...) and DDPMModel.sample(mesh=...) mirror the
    KarrasModel contract: same key => same samples as single-device."""
    from diffsci_tpu.models.si import SIModel, SIModelConfig
    from diffsci_tpu.models.ddpm import (DDPMModel, DDPMModelConfig,
                                         ClassicalDDPMScheduler,
                                         DDIMIntegrator)
    mesh = make_mesh()
    key = jax.random.PRNGKey(3)
    net = MLPUncond(3, hidden_dims=(16,))

    si = SIModel(net, SIModelConfig(scheduler="linear", loss_metric="mse"))
    vs = si.init(jax.random.PRNGKey(0), (8, 3))
    single = si.sample(vs, key, 16, (3,), nsteps=6)
    sharded = si.sample(vs, key, 16, (3,), nsteps=6, mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError):
        si.sample(vs, key, 9, (3,), nsteps=2, mesh=mesh)

    sch = ClassicalDDPMScheduler(T=50)
    dd = DDPMModel(MLPUncond(3, hidden_dims=(16,)),
                   DDPMModelConfig(sch, DDIMIntegrator(sch)))
    vs = dd.init(jax.random.PRNGKey(1), (8, 3))
    single = dd.sample(vs, key, 16, (3,))
    sharded = dd.sample(vs, key, 16, (3,), mesh=mesh)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError):
        dd.sample(vs, key, 9, (3,), mesh=mesh)


@pytest.mark.slow
def test_dp_sampling_si_latent_path_stays_sharded():
    """Regression (review finding): with an autoencoder, SIModel.sample's
    latent re-draw must re-apply the mesh sharding, or the integration
    scan silently runs unsharded."""
    from diffsci_tpu.models.si import SIModel, SIModelConfig
    from jax.sharding import PartitionSpec as P

    class StubAE:
        def encode(self, x, key=None):
            return x[:, :2]
        def decode(self, z):
            return jnp.concatenate([z, z[:, :1]], axis=1)

    mesh = make_mesh()
    net = MLPUncond(2, hidden_dims=(8,))
    si = SIModel(net, SIModelConfig(scheduler="linear", loss_metric="mse"),
                 autoencoder=StubAE())
    vs = si.init(jax.random.PRNGKey(0), (8, 2))
    # return_latents exposes the integrated latent; its sharding must be
    # on the data axis (the scan inherits the input sharding)
    out = si.sample(vs, jax.random.PRNGKey(1), 16, (3,), nsteps=2,
                    mesh=mesh, return_latents=True)
    assert out.sharding.spec[0] == "data", out.sharding
    # and the decoded path matches single-device
    full = si.sample(vs, jax.random.PRNGKey(1), 16, (3,), nsteps=2,
                     mesh=mesh)
    single = si.sample(vs, jax.random.PRNGKey(1), 16, (3,), nsteps=2)
    np.testing.assert_allclose(np.asarray(full), np.asarray(single),
                               rtol=1e-5, atol=1e-6)
