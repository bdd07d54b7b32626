"""Minimal host-side data loading: shuffled minibatch iteration over array
(or pytree-of-array) datasets, with per-host sharding hooks for
multi-process training.

Replaces torch DataLoader usage in the reference's scripts/tests (e.g.
tests/test_karras_on_toy_dataset.py:66-74) without torch: datasets here are
device-agnostic numpy/jax arrays; batches are yielded as pytrees ready for
``parallel.shard_batch``.
"""

from __future__ import annotations

from typing import Any, Iterator

import numpy as np
import jax


class ArrayDataLoader:
    """Iterate minibatches over a pytree of equal-leading-dim arrays.

    Larger-than-RAM corpora: leaves may be numpy memmaps
    (``np.load(path, mmap_mode='r')``) — fancy-indexing a memmap reads
    only the gathered batch, so .npy datasets stream from disk without
    materializing (pinned by tests/test_trainer.py).

    Each epoch reshuffles with a fresh fold of the seed. ``drop_last=True``
    by default so batch shapes are static (jit-friendly).

    Multi-process (multi-host) sharding: ``batch_size`` is the GLOBAL
    batch; each process yields only its ``batch_size / process_count``
    rows of every global batch (the TPU-native analogue of the
    per-rank DistributedSampler the reference gets from Lightning DDP,
    reference tests/run_oceangen_ema_smoke.py:36-40). All processes
    derive the same per-epoch permutation from the shared seed, so the
    concatenation of the per-process batches in process order IS the
    single-process global batch — combine with
    ``parallel.shard_batch`` (which uses
    ``jax.make_array_from_process_local_data`` under multi-process) to
    form the global sharded array. Defaults auto-detect
    ``jax.process_count()/process_index()``; pass explicitly to test.
    """

    def __init__(self, dataset: Any, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True,
                 process_count: int | None = None,
                 process_index: int | None = None):
        self.dataset = dataset
        leaves = jax.tree.leaves(dataset)
        if not leaves:
            raise ValueError("empty dataset")
        self.n = leaves[0].shape[0]
        for leaf in leaves:
            assert leaf.shape[0] == self.n, "ragged leading dims"
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.process_count = (process_count if process_count is not None
                              else jax.process_count())
        self.process_index = (process_index if process_index is not None
                              else jax.process_index())
        if not 0 <= self.process_index < self.process_count:
            raise ValueError(
                f"process_index {self.process_index} out of range for "
                f"process_count {self.process_count}")
        if batch_size % self.process_count:
            raise ValueError(
                f"global batch_size {batch_size} not divisible by "
                f"process_count {self.process_count}")
        if self.process_count > 1 and not drop_last:
            raise ValueError(
                "multi-process loading requires drop_last=True: a ragged "
                "final batch would give processes different local shapes "
                "and deadlock the collective")
        self.local_batch_size = batch_size // self.process_count
        self._epoch = 0

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def __iter__(self) -> Iterator[Any]:
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            order = rng.permutation(self.n)
        else:
            order = np.arange(self.n)
        self._epoch += 1
        end = (self.n - self.n % self.batch_size if self.drop_last
               else self.n)
        lo = self.process_index * self.local_batch_size
        hi = lo + self.local_batch_size
        for start in range(0, end, self.batch_size):
            idx = order[start:start + self.batch_size][lo:hi]
            yield jax.tree.map(lambda a: a[idx], self.dataset)


class TorchLoaderAdapter:
    """Wrap a torch ``DataLoader`` (or any iterable of torch tensors /
    tuples / dicts of them) into the numpy-batch iterable the Trainer
    consumes.

    Migration shim for reference users: the reference trains straight
    off torch DataLoaders (reference tests/test_karras_on_toy_dataset.py:66-74);
    here the same loader object can be passed through this adapter and
    fed to ``Trainer.fit`` / ``fit_karras`` unchanged. Conversion is
    zero-copy where torch memory is CPU-contiguous (``numpy()`` shares
    the buffer; the subsequent ``device_put`` does the only real copy).

    Torch is imported lazily so the package never hard-depends on it.
    """

    def __init__(self, loader: Any):
        self.loader = loader

    def __len__(self) -> int:
        return len(self.loader)

    @staticmethod
    def _to_numpy(item):
        if hasattr(item, "detach") and hasattr(item, "numpy"):
            t = item.detach()
            if t.device.type != "cpu":
                t = t.cpu()
            if not t.is_contiguous():
                t = t.contiguous()
            return t.numpy()
        return item

    def __iter__(self) -> Iterator[Any]:
        for batch in self.loader:
            yield jax.tree.map(self._to_numpy, batch)


def train_val_split(dataset: Any, val_fraction: float = 0.1, seed: int = 0):
    """Random split of a pytree dataset (torch random_split analogue)."""
    leaves = jax.tree.leaves(dataset)
    n = leaves[0].shape[0]
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    n_val = int(n * val_fraction)
    val_idx, train_idx = order[:n_val], order[n_val:]
    take = lambda idx: jax.tree.map(lambda a: a[idx], dataset)  # noqa: E731
    return take(train_idx), take(val_idx)


def buffered(iterator: Iterator[Any], size: int) -> Iterator[Any]:
    """Keep ``size`` items of an iterator eagerly materialized ahead of
    the consumer. Combined with async device_put in the producer, this
    overlaps batch k+1's host->device transfer with batch k's compute."""
    import collections

    queue: collections.deque = collections.deque()
    it = iter(iterator)
    for _ in range(size):
        try:
            queue.append(next(it))
        except StopIteration:
            break
    while queue:
        out = queue.popleft()
        try:
            queue.append(next(it))
        except StopIteration:
            pass
        yield out


def prefetch_to_device(iterator: Iterator[Any], size: int = 2,
                       sharding=None) -> Iterator[Any]:
    """Double-buffered host->device prefetch.

    Eagerly moves up to ``size`` upcoming batches onto the accelerator
    (optionally with a ``jax.sharding.Sharding`` for multi-device
    placement) so the host transfer of batch k+1 overlaps the device
    compute of batch k — the JAX analogue of torch DataLoader's
    pin_memory+non_blocking path the reference relies on implicitly.
    """
    def placed():
        for batch in iterator:
            if sharding is not None:
                yield jax.tree.map(lambda a: jax.device_put(a, sharding),
                                   batch)
            else:
                yield jax.tree.map(jax.device_put, batch)

    return buffered(placed(), size)
