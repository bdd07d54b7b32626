"""One-command reproduction of the reference's MNIST FID study.

The reference's published quality numbers (BASELINE.md; reference
scripts/testing/mnist_fld_fid_results_500_samples_seed_42/fid_scores.txt)
were produced by test-diffusion-mnist-fld-fid.py: PUNetG
model_channels=128, 500 samples, seed 42, nsteps=500, deterministic Heun
ODE plus an SDE gamma sweep. Targets:

    FID 46.356   ODE (Heun), epoch-199 checkpoint   (fid_scores.txt:16)
    FID 44.694   SDE gamma=3.0, epoch-99 checkpoint (fid_scores.txt:10)
    FID 40.171   SDE gamma=1.0, epoch-499 (best)    (fid_scores.txt:34)

This script packages the whole repro so that the day real MNIST data (and
optionally the pt_inception weights) are available, the parity claim is
one command:

    python scripts/repro_reference_fid.py --data mnist.npz \
        [--inception-weights pt_inception-2015-12-05.pth] \
        [--steps 60000] [--outdir runs/repro-fid]

It (1) trains the reference config from scratch (or reuses --ckpt /
resumes), (2) samples 500 images at seed 42 with the ODE sampler and the
SDE gamma in {1.0, 3.0}, (3) scores FID against the real data and prints
each number next to its reference target.

Zero-egress note: without --data it runs on synthetic blobs, and without
--inception-weights FID is computed in raw-pixel feature space — both
keep the pipeline exercised end-to-end (see --smoke, used by the test
suite) but the numbers are NOT comparable to the targets; the printout
says so explicitly.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# reference eval protocol (test-diffusion-mnist-fld-fid.py:372-374)
TARGETS = [
    ("ode_heun", 0.0, 46.356, "epoch-199, fid_scores.txt:16"),
    ("sde_gamma1.0", 1.0, 40.171, "epoch-499 best, fid_scores.txt:34"),
    ("sde_gamma3.0", 3.0, 44.694, "epoch-99, fid_scores.txt:10"),
]


def load_mnist(path: str | None, n_synth: int = 2048) -> np.ndarray:
    if path is not None:
        arr = np.load(path)
        x = arr["x"] if hasattr(arr, "files") and "x" in arr else (
            arr[arr.files[0]] if hasattr(arr, "files") else arr)
        x = np.asarray(x, np.float32)
        if x.ndim == 3:
            x = x[..., None]
        if x.max() > 2.0:
            x = x / 255.0
        return x * 2.0 - 1.0
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:28, 0:28].astype(np.float32)
    cx = rng.uniform(8, 20, size=(n_synth, 1, 1))
    cy = rng.uniform(8, 20, size=(n_synth, 1, 1))
    r = rng.uniform(3, 6, size=(n_synth, 1, 1))
    img = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r ** 2)))
    return (img * 2.0 - 1.0)[..., None].astype(np.float32)


def main(argv=None):
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--data", default=None, help="mnist.npz (array 'x')")
    ap.add_argument("--ckpt", default=None,
                    help="skip training, evaluate this checkpoint dir")
    ap.add_argument("--steps", type=int, default=60000,
                    help="training budget; the reference's epoch-199 "
                         "checkpoint at batch 64 over 60k MNIST images "
                         "is ~187k steps — more steps, better FID")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--channels", type=int, default=128,
                    help="reference study config "
                         "(test-diffusion-mnist-fld-fid.py:372)")
    ap.add_argument("--nsamples", type=int, default=500)
    ap.add_argument("--nfe", type=int, default=500,
                    help="reference study nsteps "
                         "(test-diffusion-mnist-fld-fid.py:373)")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--inception-weights", default=None,
                    help="pt_inception-2015-12-05.pth for "
                         "reference-comparable Inception-FID")
    ap.add_argument("--outdir", default="runs/repro-fid")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny everything (CI smoke: synthetic data, "
                         "8ch net, 50 steps, 16 samples, 6 NFE)")
    args = ap.parse_args(argv)

    if args.smoke:
        args.channels, args.steps = 8, 50
        args.nsamples, args.nfe, args.batch = 16, 6, 16

    if args.data is None:
        # zero-friction convention: the hour real data lands, drop it at
        # one of these paths and the same command produces the numbers
        for cand in ("data/mnist.npz",
                     str(pathlib.Path(__file__).resolve().parents[1]
                         / "data" / "mnist.npz"),
                     "/root/data/mnist.npz"):
            if pathlib.Path(cand).exists():
                args.data = cand
                print(f"found real data at {cand}")
                break
    if args.inception_weights is None:
        for cand in ("data/pt_inception-2015-12-05.pth",
                     "/root/data/pt_inception-2015-12-05.pth"):
            if pathlib.Path(cand).exists():
                args.inception_weights = cand
                print(f"found inception weights at {cand}")
                break

    import jax
    from diffsci_tpu import ops
    from diffsci_tpu.models import (KarrasModel, KarrasModelConfig, PUNetG,
                                    PUNetGConfig, EMATracker,
                                    create_train_state)
    from diffsci_tpu.models.karras.train import default_optimizer
    from diffsci_tpu.trainer import fit_karras
    from diffsci_tpu.checkpoint import save_checkpoint, restore_checkpoint
    from diffsci_tpu.metrics import fid, fid_from_samples

    outdir = pathlib.Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    xs = load_mnist(args.data)
    source = args.data or ("SYNTHETIC — numbers not comparable to "
                           "reference targets")
    print(f"data: {xs.shape} (source: {source})")

    ema = EMATracker(ema_type="power", power_function_stds=[0.05, 0.1])
    cfg = PUNetGConfig(model_channels=args.channels,
                       channel_expansion=[2, 4])
    model = KarrasModel(PUNetG(cfg), KarrasModelConfig.from_edm())

    if args.ckpt:
        template, _ = create_train_state(
            model, jax.random.PRNGKey(0), (2, 28, 28, 1), ema=ema)
        state = restore_checkpoint(args.ckpt, template)
        print(f"restored step {int(state.step)} from {args.ckpt}")
    else:
        # reference training defaults: AdamW lr 1e-3 wd 1e-4
        # (karrasmodule.py:497-500), clip 0.5
        # (train-diffusion-cifar10.py:92)
        state, _ = fit_karras(
            model, xs, batch_size=args.batch,
            max_epochs=max(1, args.steps
                           // max(1, len(xs) // args.batch) + 1),
            max_steps=args.steps, ema=ema,
            optimizer=default_optimizer(1e-3, 1e-4, grad_clip=0.5),
            log_dir=outdir)
        save_checkpoint(outdir / "ckpt", state,
                        description=model.export_description())
        print(f"trained {int(state.step)} steps -> {outdir}/ckpt")

    variables = state.ema_variables(ema, profile_index=0)

    # feature space for FID
    if args.inception_weights:
        from diffsci_tpu import metrics_inception as mi
        variables_inc = mi.load_weights(args.inception_weights)

        def feats_fn(x):
            return mi.inception_fid_features(variables_inc, x)
        space = "inception (reference-comparable)"
    else:
        def feats_fn(x):
            return np.asarray(x).reshape(x.shape[0], -1)
        space = "raw pixel (NOT comparable to reference targets)"
    print(f"FID feature space: {space}")

    real = xs[np.random.default_rng(args.seed).permutation(len(xs))
              [:max(args.nsamples, 500 if not args.smoke else 16)]]

    results = {}
    for name, gamma, target, src in TARGETS:
        # gamma enters via the scheduler's Langevin constant, exactly the
        # reference's sweep knob (reference schedulers.py:45,219-240)
        m = model
        if gamma > 0:
            m = KarrasModel(PUNetG(cfg), KarrasModelConfig.from_edm())
            m.config.noisescheduler = ops.EDMScheduler(langevin_const=gamma)
        key = jax.random.PRNGKey(args.seed)
        fake = m.sample(variables, key, args.nsamples, (28, 28, 1),
                        nsteps=args.nfe, stochastic=gamma > 0,
                        maximum_batch_size=100)
        score = fid_from_samples(real, np.asarray(fake), feats_fn)
        results[name] = float(score)
        print(f"{name:14s} FID {score:9.3f}   reference target {target:7.3f}"
              f"  ({src})")

    (outdir / "fid_results.json").write_text(json.dumps({
        "results": results,
        "targets": {n: t for n, _, t, _ in TARGETS},
        "feature_space": space,
        "data": args.data,
        "nsamples": args.nsamples, "nfe": args.nfe, "seed": args.seed,
        "steps_trained": int(state.step)}, indent=1))
    print(f"wrote {outdir}/fid_results.json")
    return results


if __name__ == "__main__":
    main()
