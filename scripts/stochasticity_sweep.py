"""Stochasticity sweep: sample with a grid of Langevin constants gamma and
score each sweep point with FID against held-out data.

The analogue of the reference stochasticity-paper driver
(reference stochasticity_paper/scripts/
test-diffusion-cifar10karras-colormap-parallel.py:1-44, which round-robins
(s_min, s_max) tasks over 6 GPUs with multiprocessing). Two execution
modes, with identical (bitwise) output:

- sequential (default): each gamma evaluation is a jitted sampler;
  parallelism comes from batching on the accelerator.
- ``--processes N``: the gamma grid is round-robin distributed over N
  worker processes — the reference's process-level parallelism pattern.
  The parent computes the real-data features exactly once and ships them
  to every worker (the reference's cached-Inception-features win,
  colormap-parallel.py:19-27); per-gamma PRNG keys are pre-split in the
  parent, so worker outputs are bitwise equal to the sequential run on
  the same backend. On a multi-chip host export TPU pinning per worker
  with ``--pin-env TPU_VISIBLE_CHIPS`` (worker i gets i mod N_chips);
  single-chip and CPU runs share the platform.

Usage:
    python scripts/stochasticity_sweep.py --ckpt runs/mnist-edm/ckpt \
        --data mnist.npz --gammas 0.01 0.1 0.3 1 3 [--processes 3]
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import tempfile

# worker subprocesses are spawned with this file's absolute path from an
# arbitrary cwd — put the repo root on sys.path so `import diffsci_tpu`
# resolves without an installed package
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def build_parser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=False, default=None)
    ap.add_argument("--data", default=None)
    ap.add_argument("--gammas", type=float, nargs="+",
                    default=[0.01, 0.1, 0.3, 0.5, 1.0, 2.0, 3.0, 5.0, 8.0])
    ap.add_argument("--nsamples", type=int, default=500)
    ap.add_argument("--nsteps", type=int, default=100)
    ap.add_argument("--out", default="stochasticity_scores.json")
    ap.add_argument("--processes", type=int, default=1,
                    help="distribute gamma arms over N worker processes")
    ap.add_argument("--pin-env", default=None,
                    help="env var set to (worker_id mod processes) in "
                         "each worker, e.g. TPU_VISIBLE_CHIPS on a "
                         "multi-chip host")
    # internal worker-mode flags
    ap.add_argument("--worker", type=int, default=None,
                    help=argparse.SUPPRESS)
    ap.add_argument("--taskfile", default=None, help=argparse.SUPPRESS)
    return ap


def _build_state(args):
    import jax
    from diffsci_tpu.models import (KarrasModel, KarrasModelConfig, PUNetG,
                                    PUNetGConfig, create_train_state)
    from diffsci_tpu.checkpoint import restore_checkpoint

    net = PUNetG(PUNetGConfig(model_channels=32, channel_expansion=[2]))
    model = KarrasModel(net, KarrasModelConfig.from_edm())
    state, _ = create_train_state(model, jax.random.PRNGKey(0),
                                  (8, 28, 28, 1))
    if args.ckpt:
        state = restore_checkpoint(args.ckpt, state)
    return model, state


def _features(x):  # pixel features; swap for a trained classifier's
    return np.asarray(x).reshape(x.shape[0], -1)


def evaluate_gammas(model, state, gammas, keys, real_feat, args):
    """Score a list of (index, gamma) arms; per-arm keys pre-split by the
    caller so the result is independent of which process runs which arm."""
    from diffsci_tpu import ops
    from diffsci_tpu.metrics import fid

    results = {}
    for (idx, gamma), key in zip(gammas, keys):
        # gamma enters through the scheduler's langevin_const
        # (reference schedulers.py:45,219-240)
        model.config.noisescheduler = ops.EDMScheduler(langevin_const=gamma)
        model._jit_cache.clear()
        samples = model.sample(
            state.variables(), key, args.nsamples, (28, 28, 1),
            nsteps=args.nsteps, stochastic=gamma > 0,
            maximum_batch_size=250)
        score = fid(real_feat, _features(samples))
        results[f"gamma_{gamma}"] = score
        print(f"gamma={gamma}: FID={score:.3f}", flush=True)
    return results


def _load_real_feat(args):
    if args.data:
        real = np.load(args.data)["x"].astype(np.float32)
        if real.ndim == 3:
            real = real[..., None]
    else:
        import jax
        real = np.asarray(jax.random.normal(
            jax.random.PRNGKey(1), (args.nsamples, 28, 28, 1)))
    # the parent computes features over the real set exactly once
    return _features(real[:args.nsamples])


def _worker_main(args):
    import jax
    # the parent propagates its jax platform (the ambient site hook
    # re-pins JAX_PLATFORMS, so a plain env var would be overridden;
    # jax.config wins)
    plat = os.environ.get("DIFFSCI_SWEEP_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    task = np.load(args.taskfile)
    real_feat = task["real_feat"]
    all_keys = task["keys"]
    mine = [(i, g) for i, g in enumerate(args.gammas)
            if i % args.processes == args.worker]
    keys = [jax.numpy.asarray(all_keys[i]) for i, _ in mine]
    model, state = _build_state(args)
    results = evaluate_gammas(model, state, mine, keys, real_feat, args)
    out = args.taskfile + f".part{args.worker}.json"
    with open(out, "w") as f:
        json.dump(results, f)
    print(f"worker {args.worker}: wrote {out}", flush=True)


def main():
    args = build_parser().parse_args()
    if args.worker is not None:
        return _worker_main(args)

    import jax

    real_feat = _load_real_feat(args)
    # pre-split one key per arm: the sequential and process-parallel modes
    # (and any worker assignment) see identical per-gamma randomness
    keys = jax.random.split(jax.random.PRNGKey(42), len(args.gammas))

    if args.processes <= 1:
        model, state = _build_state(args)
        results = evaluate_gammas(model, state,
                                  list(enumerate(args.gammas)),
                                  list(keys), real_feat, args)
    else:
        with tempfile.TemporaryDirectory() as td:
            taskfile = os.path.join(td, "task.npz")
            np.savez(taskfile, real_feat=real_feat,
                     keys=np.asarray(keys))
            procs = []
            for w in range(args.processes):
                cmd = [sys.executable, os.path.abspath(__file__),
                       "--worker", str(w), "--taskfile", taskfile,
                       "--processes", str(args.processes),
                       "--gammas", *[str(g) for g in args.gammas],
                       "--nsamples", str(args.nsamples),
                       "--nsteps", str(args.nsteps)]
                if args.ckpt:
                    cmd += ["--ckpt", args.ckpt]
                env = dict(os.environ)
                plat = getattr(jax.config, "jax_platforms", None)
                if plat:
                    env["DIFFSCI_SWEEP_PLATFORM"] = plat
                if args.pin_env:
                    env[args.pin_env] = str(w % args.processes)
                procs.append(subprocess.Popen(cmd, env=env))
            rcs = [p.wait() for p in procs]
            if any(rcs):
                raise RuntimeError(f"worker exit codes: {rcs}")
            results = {}
            for w in range(args.processes):
                with open(taskfile + f".part{w}.json") as f:
                    results.update(json.load(f))
        # restore the gamma-grid order
        results = {f"gamma_{g}": results[f"gamma_{g}"]
                   for g in args.gammas}

    pathlib.Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
