"""Stochasticity sweep: sample with a grid of Langevin constants gamma and
score each sweep point with FID against held-out data.

The analogue of the reference stochasticity-paper driver
(reference stochasticity_paper/scripts/
test-diffusion-cifar10karras-colormap-parallel.py:1-44, which round-robins
(s_min, s_max) tasks over 6 GPUs with multiprocessing). Here each gamma
evaluation is a jitted sampler; parallelism comes from batching on the
accelerator rather than process pools.

Usage:
    python scripts/stochasticity_sweep.py --ckpt runs/mnist-edm/ckpt \
        --data mnist.npz --gammas 0.01 0.1 0.3 1 3
"""

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=False, default=None)
    ap.add_argument("--data", default=None)
    ap.add_argument("--gammas", type=float, nargs="+",
                    default=[0.01, 0.1, 0.3, 0.5, 1.0, 2.0, 3.0, 5.0, 8.0])
    ap.add_argument("--nsamples", type=int, default=500)
    ap.add_argument("--nsteps", type=int, default=100)
    ap.add_argument("--out", default="stochasticity_scores.json")
    args = ap.parse_args()

    import jax
    from diffsci_tpu import ops
    from diffsci_tpu.models import (KarrasModel, KarrasModelConfig, PUNetG,
                                    PUNetGConfig, create_train_state)
    from diffsci_tpu.checkpoint import restore_checkpoint, load_description
    from diffsci_tpu.metrics import fid

    # build model (from checkpoint description or fresh demo weights)
    net = PUNetG(PUNetGConfig(model_channels=32, channel_expansion=[2]))
    config = KarrasModelConfig.from_edm()
    model = KarrasModel(net, config)
    state, _ = create_train_state(model, jax.random.PRNGKey(0),
                                  (8, 28, 28, 1))
    if args.ckpt:
        desc = load_description(args.ckpt)
        state = restore_checkpoint(args.ckpt, state)

    if args.data:
        real = np.load(args.data)["x"].astype(np.float32)
        if real.ndim == 3:
            real = real[..., None]
    else:
        real = np.asarray(jax.random.normal(jax.random.PRNGKey(1),
                                            (args.nsamples, 28, 28, 1)))

    def features(x):  # pixel features; swap for a trained classifier's
        return np.asarray(x).reshape(x.shape[0], -1)

    results = {}
    key = jax.random.PRNGKey(42)
    for gamma in args.gammas:
        # gamma enters through the scheduler's langevin_const
        # (reference schedulers.py:45,219-240)
        model.config.noisescheduler = ops.EDMScheduler(langevin_const=gamma)
        model._jit_cache.clear()
        key, sub = jax.random.split(key)
        samples = model.sample(
            state.variables(), sub, args.nsamples, (28, 28, 1),
            nsteps=args.nsteps, stochastic=gamma > 0,
            maximum_batch_size=250)
        score = fid(features(real[:args.nsamples]), features(samples))
        results[f"gamma_{gamma}"] = score
        print(f"gamma={gamma}: FID={score:.3f}")

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
