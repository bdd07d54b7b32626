"""SamplerService: AOT compilation, bucket padding, chunking."""

import numpy as np
import pytest
import jax

from diffsci_tpu.models import KarrasModel, KarrasModelConfig
from diffsci_tpu.models.nets.mlp import MLPUncond
from diffsci_tpu.serving import SamplerService


def _service(buckets=(2, 4), nsteps=3):
    model = KarrasModel(MLPUncond(dim=2, hidden_dims=(8,)),
                        KarrasModelConfig.from_edm())
    vs = model.init(jax.random.PRNGKey(0), (4, 2))
    return SamplerService(model, vs, shape=(2,), batch_buckets=buckets,
                          nsteps=nsteps)


def test_warmup_compiles_all_buckets():
    svc = _service()
    times = svc.warmup()
    assert set(times) == {2, 4}
    assert set(svc._compiled) == {2, 4}


def test_sample_pads_to_bucket_and_slices():
    svc = _service()
    out = svc.sample(3)  # pads to bucket 4, slices to 3
    assert out.shape == (3, 2)
    assert np.all(np.isfinite(out))
    assert svc.stats["padded"] == 1
    assert svc.stats["chunks"] == 1


def test_sample_chunks_large_requests():
    svc = _service()
    out = svc.sample(10)  # 4 + 4 + 2: three chunks, no padding
    assert out.shape == (10, 2)
    assert svc.stats["chunks"] == 3
    assert svc.stats["padded"] == 0
    assert svc.throughput() > 0
    # chunks must differ (fresh keys), not repeat the same batch
    assert not np.allclose(out[:4], out[4:8])


@pytest.mark.slow
def test_deterministic_with_explicit_key():
    svc1 = _service()
    svc2 = _service()
    k = jax.random.PRNGKey(42)
    a = svc1.sample(2, key=k)
    b = svc2.sample(2, key=k)
    np.testing.assert_array_equal(a, b)


def test_sample_zero_returns_empty():
    svc = _service()
    out = svc.sample(0)
    assert out.shape == (0, 2)
    assert svc.stats["chunks"] == 0


def test_explicit_key_deterministic_across_chunks():
    """A chunked request with an explicit key must be reproducible end to
    end even when the services' internal PRNG states differ."""
    svc1, svc2 = _service(), _service()
    svc2.sample(5)  # advance svc2's internal key state
    k = jax.random.PRNGKey(7)
    a = svc1.sample(10, key=k)   # 4+4+2: three chunks
    b = svc2.sample(10, key=k)
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_from_checkpoint_roundtrip(tmp_path):
    """Train-script-style checkpoint -> SamplerService.from_checkpoint ->
    deterministic sampling (the production loop: registry/description ->
    rebuilt model -> restored EMA weights -> AOT service)."""
    from diffsci_tpu.checkpoint import save_checkpoint
    from diffsci_tpu.models import (EMATracker, PUNetG, PUNetGConfig,
                                    KarrasModel, KarrasModelConfig,
                                    create_train_state)

    net = PUNetG(PUNetGConfig(model_channels=4, channel_expansion=[2]))
    model = KarrasModel(net, KarrasModelConfig.from_edm())
    ema = EMATracker(ema_type="power", power_function_stds=[0.05, 0.1])
    state, _ = create_train_state(model, jax.random.PRNGKey(0),
                                  (2, 8, 8, 1), ema=ema)
    save_checkpoint(tmp_path / "ckpt", state,
                    description=model.export_description())

    svc = SamplerService.from_checkpoint(tmp_path / "ckpt", (8, 8, 1),
                                         batch_buckets=(2,), nsteps=3)
    out = svc.sample(3, key=jax.random.PRNGKey(5))
    assert out.shape == (3, 8, 8, 1)
    assert np.all(np.isfinite(out))
    # rebuilt model matches the original's description round-trip
    desc = svc.model.export_description()
    assert desc["net"]["config"]["model_channels"] == 4


def test_from_checkpoint_clear_errors(tmp_path):
    """Unserveable checkpoints fail loudly at rebuild time, not with an
    opaque orbax structure error (review findings)."""
    import pytest as _pytest
    from diffsci_tpu.models import karras_model_from_description

    with _pytest.raises(ValueError, match="no net config"):
        karras_model_from_description({"config_description":
                                       {"tag": "edm", "extra_args": {}}})
    desc = {"config_description": {"tag": "edm", "extra_args": {}},
            "net": {"config": {"model_channels": 4},
                    "has_conditional_embedding": True}}
    with _pytest.raises(ValueError, match="conditional embedding"):
        karras_model_from_description(desc)
    desc2 = {"config_description": {"tag": "edm", "extra_args": {}},
             "net": {"config": {"model_channels": 4}},
             "autoencoder": True}
    with _pytest.raises(ValueError, match="autoencoder"):
        karras_model_from_description(desc2)


# ---------------------------------------------------------------------------
# cross-request batching (round 3)
# ---------------------------------------------------------------------------
def _batched_service(buckets=(4, 16), window_ms=20.0):
    model = KarrasModel(MLPUncond(dim=2, hidden_dims=(8,)),
                        KarrasModelConfig.from_edm())
    vs = model.init(jax.random.PRNGKey(0), (4, 2))
    return SamplerService(model, vs, shape=(2,), batch_buckets=buckets,
                          nsteps=4, batch_window_ms=window_ms)


def test_batched_concurrent_requests_aggregate():
    """16 concurrent small requests land in few bucket dispatches, every
    caller gets its own correctly-sized result."""
    import threading
    svc = _batched_service()
    svc.warmup()
    results = {}

    def worker(i):
        results[i] = svc.sample(2, key=jax.random.PRNGKey(100 + i))

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(16)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    svc.close()
    assert len(results) == 16
    for i, r in results.items():
        assert r.shape == (2, 2)
        assert np.all(np.isfinite(r))
    # 32 samples through 16-capacity buckets: at most a handful of
    # dispatches, certainly fewer than one per request
    assert svc.stats["batched_dispatches"] < 16
    assert svc.stats["batched_requests"] == 16
    assert svc.stats["samples"] == 32


def test_batched_per_request_key_isolation():
    """The same request key yields the same samples regardless of what it
    was co-batched with (per-sample-key executable)."""
    import threading
    svc = _batched_service()
    svc.warmup()
    key = jax.random.PRNGKey(7)
    alone = svc.sample(3, key=key)

    noise_results = []

    def noise_worker(i):
        noise_results.append(svc.sample(5, key=jax.random.PRNGKey(900 + i)))

    threads = [threading.Thread(target=noise_worker, args=(i,))
               for i in range(6)]
    for t in threads:
        t.start()
    crowded = svc.sample(3, key=key)
    for t in threads:
        t.join()
    svc.close()
    np.testing.assert_array_equal(alone, crowded)


def test_batched_large_request_chunks():
    svc = _batched_service(buckets=(4,), window_ms=5.0)
    svc.warmup()
    out = svc.sample(10, key=jax.random.PRNGKey(0))
    svc.close()
    assert out.shape == (10, 2)
    # determinism across the chunk split too
    svc2 = _batched_service(buckets=(4,), window_ms=5.0)
    svc2.warmup()
    out2 = svc2.sample(10, key=jax.random.PRNGKey(0))
    svc2.close()
    np.testing.assert_array_equal(out, out2)


def test_batched_stochastic_per_request_isolation():
    """Stochastic integrators under cross-request batching (round-4):
    in-scan noise is drawn per row from fold_in(row_key, step), so a
    request's samples are invariant to what it was co-batched with."""
    import threading
    model = KarrasModel(MLPUncond(dim=2, hidden_dims=(8,)),
                        KarrasModelConfig.from_edm())
    vs = model.init(jax.random.PRNGKey(0), (4, 2))
    svc = SamplerService(model, vs, shape=(2,), batch_buckets=(4, 16),
                         nsteps=4, sample_kwargs={"stochastic": True},
                         batch_window_ms=20.0)
    svc.warmup()
    key = jax.random.PRNGKey(7)
    alone = svc.sample(3, key=key)
    assert np.all(np.isfinite(alone))

    noise_results = []

    def noise_worker(i):
        noise_results.append(svc.sample(5, key=jax.random.PRNGKey(900 + i)))

    threads = [threading.Thread(target=noise_worker, args=(i,))
               for i in range(6)]
    for t in threads:
        t.start()
    crowded = svc.sample(3, key=key)
    for t in threads:
        t.join()
    svc.close()
    np.testing.assert_array_equal(alone, crowded)
    # it IS stochastic: different keys produce different samples, and the
    # SDE path differs from the deterministic service's output
    det = _batched_service(buckets=(4, 16))
    det.warmup()
    det_out = det.sample(3, key=key)
    det.close()
    assert not np.allclose(alone, det_out)


@pytest.mark.slow
def test_mesh_mode_matches_single_device():
    """SamplerService(mesh=...) shards every bucket execution over the
    data axis; same key -> same samples as the unsharded service."""
    from diffsci_tpu.parallel import make_mesh
    model = KarrasModel(MLPUncond(dim=2, hidden_dims=(8,)),
                        KarrasModelConfig.from_edm())
    vs = model.init(jax.random.PRNGKey(0), (4, 2))
    mesh = make_mesh()
    svc_1 = SamplerService(model, vs, shape=(2,), batch_buckets=(8,),
                           nsteps=3)
    model2 = KarrasModel(MLPUncond(dim=2, hidden_dims=(8,)),
                        KarrasModelConfig.from_edm())
    svc_m = SamplerService(model2, vs, shape=(2,), batch_buckets=(8,),
                           nsteps=3, mesh=mesh)
    key = jax.random.PRNGKey(11)
    a = svc_1.sample(8, key=key)
    b = svc_m.sample(8, key=key)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    # batched dispatcher mode shards too
    svc_mb = SamplerService(model2, vs, shape=(2,), batch_buckets=(8,),
                            nsteps=3, mesh=mesh, batch_window_ms=5.0)
    out = svc_mb.sample(6, key=key)
    svc_mb.close()
    assert out.shape == (6, 2) and np.all(np.isfinite(out))

    # buckets must divide the data axis
    import pytest
    with pytest.raises(ValueError):
        SamplerService(model2, vs, shape=(2,), batch_buckets=(6,),
                       nsteps=3, mesh=mesh)


def test_sampler_service_picard_mode():
    """picard= serves via the parallel-in-time sampler: deterministic per
    seed, tol=0 == the sequential Euler sampler, and incompatible modes
    are rejected."""
    import pytest
    model = KarrasModel(MLPUncond(dim=2, hidden_dims=[8]),
                        KarrasModelConfig.from_edm())
    vs = model.init(jax.random.PRNGKey(0), (2, 2))
    svc = SamplerService(model, vs, shape=(2,), batch_buckets=(4,),
                         nsteps=6, picard=dict(window=4, tol=0.0))
    svc.warmup()
    a = svc.sample(4, key=jax.random.PRNGKey(3))
    b = svc.sample(4, key=jax.random.PRNGKey(3))
    assert a.shape == (4, 2)
    np.testing.assert_array_equal(a, b)
    svc_seq = SamplerService(model, vs, shape=(2,), batch_buckets=(4,),
                             nsteps=6,
                             sample_kwargs=dict(integrator="euler"))
    svc_seq.warmup()
    seq = svc_seq.sample(4, key=jax.random.PRNGKey(3))
    np.testing.assert_allclose(a, seq, rtol=1e-3, atol=1e-4)

    with pytest.raises(ValueError, match="co-batch"):
        SamplerService(model, vs, shape=(2,), picard=dict(window=4),
                       batch_window_ms=2.0)


def test_onestep_serving_plain_and_windowed():
    """nsteps=1 (a fully distilled student) serves through sample_onestep
    — both the plain path and the cross-request-batching path."""
    model = KarrasModel(MLPUncond(dim=2, hidden_dims=(8,)),
                        KarrasModelConfig.from_edm())
    vs = model.init(jax.random.PRNGKey(0), (4, 2))
    svc = SamplerService(model, vs, shape=(2,), batch_buckets=(4,),
                         nsteps=1)
    out = svc.sample(3, key=jax.random.PRNGKey(7))
    assert out.shape == (3, 2) and np.all(np.isfinite(out))
    # determinism with an explicit key
    out2 = svc.sample(3, key=jax.random.PRNGKey(7))
    np.testing.assert_array_equal(out, out2)

    svcw = SamplerService(model, vs, shape=(2,), batch_buckets=(4,),
                          nsteps=1, batch_window_ms=5.0)
    try:
        outw = svcw.sample(2, key=jax.random.PRNGKey(9))
        assert outw.shape == (2, 2) and np.all(np.isfinite(outw))
        # key isolation: same key, different co-batch population
        outw2 = svcw.sample(2, key=jax.random.PRNGKey(9))
        np.testing.assert_array_equal(outw, outw2)
    finally:
        svcw.close()


def test_onestep_picard_rejected():
    import pytest
    model = KarrasModel(MLPUncond(dim=2, hidden_dims=(8,)),
                        KarrasModelConfig.from_edm())
    vs = model.init(jax.random.PRNGKey(0), (4, 2))
    svc = SamplerService(model, vs, shape=(2,), batch_buckets=(2,),
                         nsteps=1, picard=dict(window=4, tol=0.0))
    with pytest.raises(ValueError):
        svc.warmup()
