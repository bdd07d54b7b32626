"""Shapes diffusion training + morphing sanity check.

Counterpart of the reference shapes experiments
(reference scripts/training/train-diffusion-shapes.py and
train-diffusion-shapes-noatt.py: a synthetic geometric-shapes dataset and a
small UNet, with and without attention, used for shape-morphing studies).
Here both variants are one script — ``--no-attention`` zeroes the
bottleneck attention stack — on the in-house ShapesDataset + PUNetG.

    python scripts/train_diffusion_shapes.py [--mode geometry_test]
        [--no-attention] [--steps 1000] [--size 64]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="paper_replica",
                    choices=["paper_replica", "geometry_test"])
    ap.add_argument("--no-attention", action="store_true")
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--num-samples", type=int, default=2048)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--outdir", default="runs/shapes")
    args = ap.parse_args()

    import jax
    from diffsci_tpu.checkpoint import save_checkpoint
    from diffsci_tpu.data import ShapesDataset
    from diffsci_tpu.models import (EMATracker, KarrasModel,
                                    KarrasModelConfig, PUNetG, PUNetGConfig)
    from diffsci_tpu.trainer import fit_karras
    from diffsci_tpu.utils import save_image_grid

    xs = ShapesDataset(args.num_samples, size=args.size,
                       mode=args.mode).generate()
    print(f"shapes[{args.mode}]: {xs.shape}, devices: {jax.devices()}")

    n_attn = 0 if args.no_attention else 1
    net = PUNetG(PUNetGConfig(
        model_channels=args.channels, channel_expansion=[2, 4],
        number_resnet_attn_block=n_attn,
        number_resnet_before_attn_block=1 if args.no_attention else 2,
        number_resnet_after_attn_block=1 if args.no_attention else 2))
    model = KarrasModel(net, KarrasModelConfig.from_edm())
    ema = EMATracker(ema_type="power", power_function_stds=[0.05])

    state, trainer = fit_karras(
        model, xs, batch_size=args.batch,
        max_epochs=max(1, args.steps // max(1, len(xs) // args.batch)),
        max_steps=args.steps, ema=ema,
        val_fraction=0.1, log_dir=args.outdir)

    outdir = pathlib.Path(args.outdir)
    save_checkpoint(outdir / "ckpt", state,
                    description=model.export_description())
    tl = trainer.logger.last("train_loss")
    print(f"final train_loss={tl if tl is None else f'{tl:.4f}'} "
          f"(step {int(state.step)})")

    variables = state.ema_variables(ema)
    key = jax.random.PRNGKey(0)
    samples = model.sample(variables, key, 16, (args.size, args.size, 1),
                           nsteps=18)
    save_image_grid(outdir / "samples.png", samples, nrow=4)

    # morphing check (geometry_test): interpolate between two samples in
    # noise space — the reference's shape-morphing experiment
    k1, k2 = jax.random.split(key)
    x1 = model.sample(variables, k1, 1, (args.size, args.size, 1), nsteps=18)
    x2 = model.sample(variables, k2, 1, (args.size, args.size, 1), nsteps=18)
    morph = model.interpolate_images(variables, key, x1[0], x2[0],
                                     ninterp=6, nsteps=18)
    save_image_grid(outdir / "morph.png", morph, nrow=morph.shape[0])
    print(f"saved samples.png and morph.png to {outdir}")


if __name__ == "__main__":
    main()
