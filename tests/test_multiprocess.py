"""Multi-process (multi-host) input sharding and training parity.

The reference's multi-host story is torchrun + Lightning DDP with a
per-rank DistributedSampler (reference
scripts/training/train-edm-cifar10.py:318-327,
tests/run_oceangen_ema_smoke.py:36-40). Ours:
``ArrayDataLoader(process_count, process_index)`` +
``shard_batch`` -> ``jax.make_array_from_process_local_data`` +
``jax.distributed.initialize`` (parallel/mp_dryrun.py).
"""

import numpy as np
import pytest

from diffsci_tpu.data.loading import ArrayDataLoader


def test_loader_per_process_slices_partition_the_global_batch():
    """Concatenating the per-process batches in process order must equal
    the single-process global batch, for every batch of every epoch."""
    n, dim, B, P = 64, 3, 16, 4
    data = np.random.default_rng(0).standard_normal((n, dim))
    data[:, 0] = np.arange(n)

    global_loader = ArrayDataLoader(data, B, seed=3, process_count=1,
                                    process_index=0)
    locals_ = [ArrayDataLoader(data, B, seed=3, process_count=P,
                               process_index=i) for i in range(P)]
    assert all(ld.local_batch_size == B // P for ld in locals_)
    assert len(global_loader) == len(locals_[0]) == n // B

    for _ in range(2):  # two epochs: reshuffle must stay consistent
        its = [iter(ld) for ld in locals_]
        for gbatch in global_loader:
            parts = [next(it) for it in its]
            np.testing.assert_array_equal(np.concatenate(parts), gbatch)


def test_loader_processes_touch_disjoint_rows():
    n, B, P = 32, 8, 2
    data = np.arange(n, dtype=np.float32)[:, None]
    seen = []
    for i in range(P):
        ld = ArrayDataLoader(data, B, seed=1, process_count=P,
                             process_index=i)
        seen.append({int(r) for b in ld for r in b[:, 0]})
    assert not (seen[0] & seen[1])
    assert seen[0] | seen[1] == set(range(n))


def test_loader_rejects_bad_process_config():
    data = np.zeros((16, 2))
    with pytest.raises(ValueError, match="not divisible"):
        ArrayDataLoader(data, 6, process_count=4, process_index=0)
    with pytest.raises(ValueError, match="out of range"):
        ArrayDataLoader(data, 8, process_count=2, process_index=2)
    with pytest.raises(ValueError, match="drop_last"):
        ArrayDataLoader(data, 8, process_count=2, process_index=0,
                        drop_last=False)


@pytest.mark.slow
def test_two_process_training_matches_single_process():
    """Full 2-process x 2-device rendezvous: spawns real subprocesses
    with jax.distributed.initialize and pins the global train loss ==
    a single-process 4-device control (parallel/mp_dryrun.py)."""
    from diffsci_tpu.parallel.mp_dryrun import run_multiprocess_dryrun
    summary = run_multiprocess_dryrun(nprocs=2, ndev_per_proc=2,
                                      steps=2, global_batch=16)
    np.testing.assert_allclose(summary["mp_losses"],
                               summary["control_losses"], rtol=1e-5)
