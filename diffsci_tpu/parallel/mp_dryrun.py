"""Multi-process (multi-host) data-parallel dryrun: N processes x M
virtual CPU devices each, one global mesh, per-process input sharding.

The reference gets multi-host training from torchrun + Lightning DDP
(reference scripts/training/train-edm-cifar10.py:318-327,
tests/run_oceangen_ema_smoke.py:36-40: per-rank DistributedSampler +
NCCL all-reduce). The TPU-native equivalent validated here:

- ``jax.distributed.initialize`` rendezvous (parallel/mesh.py:25)
- ``ArrayDataLoader(process_count, process_index)`` yielding only this
  process's rows of every global batch (data/loading.py)
- ``shard_batch`` assembling the global jax.Array from process-local
  rows via ``jax.make_array_from_process_local_data``
- the ordinary jitted train step running SPMD over the global mesh,
  with XLA's cross-process collectives carrying the gradient all-reduce

``run_multiprocess_dryrun`` spawns the worker processes (plus a
single-process control run on the same global device count) and asserts
(a) each process touched exactly its disjoint shard of the data and
(b) the multi-process losses equal the single-process losses.

Works on CPU (tests / this driver) and unchanged on real multi-host TPU
pods, where ``jax.distributed.initialize()`` discovers the topology.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np

_TAG = "MPDRYRUN"


def _worker(proc_id: int, nprocs: int, ndev: int, port: int,
            steps: int, global_batch: int) -> None:
    import jax
    if nprocs > 1:
        jax.config.update("jax_num_cpu_devices", ndev)
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nprocs, process_id=proc_id)
    assert jax.process_count() == nprocs, jax.process_count()

    from diffsci_tpu.models import (KarrasModel, KarrasModelConfig,
                                    MLPUncond, create_train_state,
                                    make_train_step, EMATracker)
    from diffsci_tpu.parallel import make_mesh, shard_batch, replicate
    from diffsci_tpu.data.loading import ArrayDataLoader

    # deterministic dataset whose column 0 is the row id, so the loader's
    # per-process sharding is observable from the batches themselves
    n, dim = 128, 4
    rng = np.random.default_rng(99)
    data = rng.standard_normal((n, dim)).astype(np.float32)
    data[:, 0] = np.arange(n)

    loader = ArrayDataLoader(data, batch_size=global_batch, seed=5)
    assert loader.local_batch_size == global_batch // nprocs

    model = KarrasModel(MLPUncond(dim=dim, hidden_dims=[16]),
                        KarrasModelConfig.from_edm(loss_metric="mse"))
    tracker = EMATracker(ema_type="power", power_function_stds=[0.1])
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0), (global_batch, dim), ema=tracker)
    step_fn = make_train_step(model, tx, ema=tracker)

    mesh = make_mesh()  # all global devices
    state = replicate(state, mesh)

    losses, rows = [], []
    key = jax.random.PRNGKey(7)
    it = iter(loader)
    for _ in range(steps):
        local = next(it)
        rows.extend(int(r) for r in local[:, 0])
        batch = shard_batch(local, mesh)
        assert batch.shape[0] == global_batch, batch.shape
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, sub, batch)
        losses.append(float(metrics["train_loss"]))

    print(_TAG + json.dumps({
        "proc": proc_id, "nprocs": nprocs,
        "n_global_devices": len(jax.devices()),
        "losses": losses, "rows": rows}), flush=True)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(args, ndev_env: int | None = None):
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "XLA_FLAGS", "JAX_PLATFORMS")}
    # PYTHONPATH is dropped to disable site hooks that initialize a JAX
    # backend at interpreter start (jax.distributed.initialize must run
    # first); diffsci_tpu resolves via the installed package. The repo
    # root is re-added so an uninstalled checkout still works.
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    env["JAX_PLATFORMS"] = "cpu"
    if ndev_env is not None:
        env["XLA_FLAGS"] = \
            f"--xla_force_host_platform_device_count={ndev_env}"
    return subprocess.Popen(
        [sys.executable, "-m", "diffsci_tpu.parallel.mp_dryrun",
         "--worker"] + [str(a) for a in args],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)


def _collect(proc, timeout=600):
    out, err = proc.communicate(timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(
            f"mp_dryrun worker failed (rc={proc.returncode}); stderr "
            f"tail:\n{err[-2000:]}")
    for line in out.splitlines():
        if line.startswith(_TAG):
            return json.loads(line[len(_TAG):])
    raise RuntimeError(f"no {_TAG} line in worker output:\n{out[-2000:]}")


def run_multiprocess_dryrun(nprocs: int = 2, ndev_per_proc: int = 4,
                            steps: int = 3, global_batch: int = 32,
                            rtol: float = 1e-5) -> dict:
    """Spawn the N-process dryrun plus a single-process control on the
    same global device count; assert shard disjointness and loss
    equality. Returns the comparison summary."""
    port = _free_port()
    workers = [_spawn([i, nprocs, ndev_per_proc, port, steps, global_batch])
               for i in range(nprocs)]
    results = [_collect(p) for p in workers]
    # single-process control: same global device count, one process
    control = _collect(_spawn([0, 1, 1, 0, steps, global_batch],
                              ndev_env=nprocs * ndev_per_proc))

    # (a) disjoint shards whose union is the control's row sequence
    all_rows = [r for res in sorted(results, key=lambda r: r["proc"])
                for r in res["rows"]]
    assert len(set(all_rows)) == len(all_rows), "processes shared rows"
    assert sorted(all_rows) == sorted(control["rows"]), \
        "union of per-process shards != single-process batches"
    per_proc = {res["proc"]: set(res["rows"]) for res in results}
    for i in range(nprocs):
        for j in range(i + 1, nprocs):
            assert not (per_proc[i] & per_proc[j])

    # (b) loss parity: the global batch is identical, so the multi-process
    # losses must match single-process up to collective reassociation
    losses = np.asarray([res["losses"] for res in results])
    assert np.allclose(losses, losses[0], rtol=0, atol=0), \
        "processes disagree on the (replicated) global loss"
    np.testing.assert_allclose(
        losses[0], control["losses"], rtol=rtol,
        err_msg="multi-process loss != single-process loss")
    return {"mp_losses": losses[0].tolist(),
            "control_losses": control["losses"],
            "rows_per_proc": {k: sorted(v) for k, v in per_proc.items()}}


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "--worker":
        _worker(*[int(a) for a in argv[1:7]])
        return
    summary = run_multiprocess_dryrun()
    print(f"mp_dryrun 2proc x 4dev: losses "
          f"{[round(v, 5) for v in summary['mp_losses']]} == control OK")


if __name__ == "__main__":
    main()
