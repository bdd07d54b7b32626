"""FID/KID evaluation of a trained diffusion checkpoint.

Reproduces the reference's quality-evaluation pipeline
(reference scripts/testing/test-diffusion-mnist-fld-fid.py:15-105, which
sampled a KarrasModule checkpoint and scored FID via torchmetrics) with the
in-house metrics stack: sample the model, embed real and generated images
with a feature network, and compute FID (+ KID) in feature space.

Feature network, in priority order:
- ``--inception-weights path/to/pt_inception-2015-12-05.pth``: the
  pytorch-fid InceptionV3 (metrics_inception.py) — produces FID numbers
  comparable with the reference's published scores.
- ``--classifier``: a MinimalResNet classifier checkpoint.
- neither: raw-pixel FID (features = flattened images) — the deterministic
  fallback for zero-egress environments without pretrained weights. NOT
  comparable to Inception-FID numbers, but a consistent relative metric
  across checkpoints of the same run.

Usage:
    python scripts/eval_fid.py --ckpt runs/mnist-edm/ckpt --data mnist.npz
        [--nsamples 500] [--nfe 18] [--batch 100] [--seed 42]
        [--classifier runs/clf/ckpt] [--stochastic --gamma 1.0]

The ``--gamma`` knob sweeps Langevin churn strength, mirroring the
stochasticity study's FID-vs-gamma grids (SURVEY.md §6).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def load_real(path: str | None, n: int) -> np.ndarray:
    if path:
        arr = np.load(path)
        xs = arr["x"] if hasattr(arr, "files") else arr
        xs = np.asarray(xs, np.float32)
        if xs.ndim == 3:
            xs = xs[..., None]
        if xs.max() > 2.0:
            xs = xs / 127.5 - 1.0
        return xs[:n]
    # synthetic fallback: blobs (keeps the pipeline runnable end-to-end)
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:28, 0:28].astype(np.float32)
    cx = rng.uniform(8, 20, size=(n, 1, 1))
    cy = rng.uniform(8, 20, size=(n, 1, 1))
    r = rng.uniform(3, 6, size=(n, 1, 1))
    img = np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * r ** 2)))
    return (img * 2.0 - 1.0)[..., None].astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--data", default=None)
    ap.add_argument("--nsamples", type=int, default=500)
    ap.add_argument("--nfe", type=int, default=18)
    ap.add_argument("--batch", type=int, default=100)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--classifier", default=None,
                    help="MinimalResNet checkpoint for feature-space FID")
    ap.add_argument("--inception-weights", default=None,
                    help="pt_inception-2015-12-05.pth for reference-"
                         "comparable Inception-FID")
    ap.add_argument("--fld", action="store_true",
                    help="also compute the native FLD (metrics.fld): the "
                         "real features are split into fit/test halves, "
                         "mirroring the reference's train/test MNIST split "
                         "(test-diffusion-mnist-fld-fid.py:211-292)")
    ap.add_argument("--stochastic", action="store_true")
    ap.add_argument("--gamma", type=float, default=0.0,
                    help="Langevin churn strength (stochasticity sweep)")
    ap.add_argument("--ema-stds", type=float, nargs="*",
                    default=[0.05, 0.1],
                    help="EMA profiles in the checkpoint (train script "
                         "default); pass none if trained without EMA")
    ap.add_argument("--no-ema", action="store_true",
                    help="evaluate raw weights instead of EMA profile 0")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from diffsci_tpu import ops
    from diffsci_tpu.checkpoint import restore_checkpoint, load_description
    from diffsci_tpu.metrics import fid, kid, classifier_features_fn
    from diffsci_tpu.models import (EMATracker, KarrasModel,
                                    KarrasModelConfig, PUNetG, PUNetGConfig,
                                    create_train_state)

    desc = load_description(args.ckpt) or {}
    if desc.get("net"):
        # self-contained description: rebuild net AND math config (a VP/VE
        # checkpoint scored under an EDM preconditioner would be wrong)
        from diffsci_tpu.models import karras_model_from_description
        model = karras_model_from_description(desc)
    else:
        cfg = PUNetGConfig(model_channels=args.channels,
                           channel_expansion=[2, 4])
        model = KarrasModel(PUNetG(cfg), KarrasModelConfig.from_edm())
    # template must mirror the training state structure
    # (scripts/train_diffusion_mnist.py: power EMA [0.05, 0.1])
    tracker = EMATracker(ema_type="power",
                         power_function_stds=args.ema_stds)
    template, _ = create_train_state(model, jax.random.PRNGKey(0),
                                     (2, 28, 28, 1),
                                     ema=tracker if args.ema_stds else None)
    state = restore_checkpoint(args.ckpt, template)
    if args.ema_stds and not args.no_ema:
        variables = state.ema_variables(tracker, profile_index=0)
        weights = f"EMA std={args.ema_stds[0]}"
    else:
        variables = state.variables()
        weights = "raw"
    print(f"restored step {int(state.step)} from {args.ckpt} ({weights})")

    # gamma enters via the scheduler's Langevin constant, as in the
    # stochasticity study (reference schedulers.py:219-240)
    stochastic = args.stochastic or args.gamma > 0
    if args.gamma > 0:
        model.config.noisescheduler = ops.EDMScheduler(
            langevin_const=args.gamma)

    key = jax.random.PRNGKey(args.seed)
    samples = []
    for i in range(0, args.nsamples, args.batch):
        key, sub = jax.random.split(key)
        n = min(args.batch, args.nsamples - i)
        out = model.sample(variables, sub, n, (28, 28, 1), nsteps=args.nfe,
                           stochastic=stochastic)
        samples.append(np.asarray(out))
        print(f"  sampled {i + n}/{args.nsamples}", flush=True)
    gen = np.concatenate(samples)[:args.nsamples]
    real = load_real(args.data, args.nsamples)

    if args.inception_weights:
        from diffsci_tpu import metrics_inception as mi
        variables_inc = mi.load_weights(args.inception_weights)
        f_real = mi.inception_fid_features(variables_inc,
                                           jnp.asarray(real) * 0.5 + 0.5)
        f_gen = mi.inception_fid_features(variables_inc,
                                          jnp.asarray(gen) * 0.5 + 0.5)
        space = "inception_pool3"
    elif args.classifier:
        # classifier ckpt dir: description.json = MinimalResNet kwargs,
        # state = its variables (saved with save_checkpoint)
        from diffsci_tpu.models.nets.classifiers import MinimalResNet
        import orbax.checkpoint as ocp
        ckpt_dir = pathlib.Path(args.classifier).absolute()
        clf_desc = load_description(ckpt_dir) or {}
        clf = MinimalResNet(**clf_desc)
        tmpl = clf.init(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 1)))
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, tmpl)
        clf_vars = ocp.StandardCheckpointer().restore(ckpt_dir / "state",
                                                      abstract)
        feat_fn = classifier_features_fn(clf, clf_vars)
        f_real = np.asarray(feat_fn(jnp.asarray(real)))
        f_gen = np.asarray(feat_fn(jnp.asarray(gen)))
        space = "classifier"
    else:
        f_real = real.reshape(len(real), -1)
        f_gen = gen.reshape(len(gen), -1)
        space = "pixel"

    result = {
        "fid": float(fid(f_real, f_gen)),
        "kid": float(kid(f_real, f_gen)),
        "feature_space": space,
        "nsamples": args.nsamples,
        "nfe": args.nfe,
        "stochastic": bool(stochastic),
        "gamma": args.gamma,
        "seed": args.seed,
        "gen_mean": float(gen.mean()), "gen_std": float(gen.std()),
        "real_mean": float(real.mean()), "real_std": float(real.std()),
    }
    if args.fld:
        from diffsci_tpu.metrics import fld, fld_generalization_gap
        half = len(f_real) // 2
        result["fld"] = float(fld(f_real[:half], f_real[half:], f_gen))
        result["fld_gen_gap"] = float(
            fld_generalization_gap(f_real[:half], f_gen))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
