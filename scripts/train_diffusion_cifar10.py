"""CIFAR-10-scale diffusion training: PUNetG + VP preconditioning.

Counterpart of the reference script
(reference scripts/training/train-diffusion-cifar10.py:32-97: unconditional
PUNetG, KarrasModuleConfig.from_vp(), AdamW, NaN-guard + grad clip 0.5) —
here all of that is fused into the jitted train step.

Data: ``--data cifar10.npz`` with array 'x' of shape [N, 32, 32, 3]
(uint8 or [-1, 1] floats). Without --data a synthetic color-blob set keeps
the pipeline runnable in zero-egress environments (throughput/parity, not
quality).

    python scripts/train_diffusion_cifar10.py [--data cifar10.npz]
        [--steps 2000] [--batch 128] [--channels 64] [--bf16]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

LEARNING_RATE = 1e-3
WEIGHT_DECAY = 1e-4
GRAD_CLIP = 0.5  # train-diffusion-cifar10.py:92
EMA_STDS = [0.05, 0.1]


def load_data(path: str | None, n_synth: int = 2048) -> np.ndarray:
    if path:
        arr = np.load(path)
        xs = arr["x"] if hasattr(arr, "files") else arr
        xs = np.asarray(xs, np.float32)
        if xs.ndim == 3:
            xs = xs[..., None]
        if xs.max() > 2.0:
            xs = xs / 127.5 - 1.0
        return xs
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32)
    cx = rng.uniform(8, 24, (n_synth, 1, 1, 3))
    cy = rng.uniform(8, 24, (n_synth, 1, 1, 3))
    r = rng.uniform(3, 8, (n_synth, 1, 1, 3))
    img = np.exp(-(((xx[..., None] - cx) ** 2 + (yy[..., None] - cy) ** 2)
                   / (2 * r ** 2)))
    return (img * 2.0 - 1.0).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--outdir", default="runs/cifar10-vp")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--s2d", type=int, default=1,
                    help="space_to_depth input folding (opt-in): 2 is "
                         "2.3x faster on TPU v5e at 32x32 but measured "
                         "slightly worse on the equal-wall-clock "
                         "convergence gate "
                         "(docs/artifacts/perf_lab_r4.json) - validate "
                         "quality on your data before adopting")
    ap.add_argument("--n-devices", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from diffsci_tpu.checkpoint import save_checkpoint
    from diffsci_tpu.models import (EMATracker, KarrasModel,
                                    KarrasModelConfig, PUNetG, PUNetGConfig,
                                    default_optimizer)
    from diffsci_tpu.parallel import make_mesh
    from diffsci_tpu.trainer import fit_karras
    from diffsci_tpu.utils import save_image_grid

    xs = load_data(args.data)
    print(f"dataset: {xs.shape}, devices: {jax.devices()}")

    net = PUNetG(PUNetGConfig(model_channels=args.channels,
                              channel_expansion=[2, 4],
                              input_channels=3, output_channels=3,
                              space_to_depth=args.s2d))
    model = KarrasModel(net, KarrasModelConfig.from_vp(),
                        compute_dtype=jnp.bfloat16 if args.bf16 else None)
    # shadow updated every 4th step with the exact power-profile
    # telescoped decay: identical training trajectory, ~1% less HBM
    # traffic (docs/artifacts/perf_lab_r4.json)
    ema = EMATracker(ema_type="power", power_function_stds=EMA_STDS,
                     update_every=4)
    mesh = make_mesh(args.n_devices) if args.n_devices else None

    state, trainer = fit_karras(
        model, xs, batch_size=args.batch,
        max_epochs=max(1, args.steps // max(1, len(xs) // args.batch)),
        max_steps=args.steps, mesh=mesh, ema=ema,
        optimizer=default_optimizer(LEARNING_RATE, WEIGHT_DECAY,
                                    grad_clip=GRAD_CLIP),
        val_fraction=0.05, log_dir=args.outdir)

    outdir = pathlib.Path(args.outdir)
    save_checkpoint(outdir / "ckpt", state,
                    description=model.export_description())
    tl = trainer.logger.last("train_loss")
    print(f"final train_loss={tl if tl is None else f'{tl:.4f}'} "
          f"valid_loss={trainer.logger.last('valid_loss')} "
          f"(step {int(state.step)})")

    samples = model.sample(state.ema_variables(ema), jax.random.PRNGKey(0),
                           16, (32, 32, 3), nsteps=18)
    np.save(outdir / "samples.npy", np.asarray(samples))
    save_image_grid(outdir / "samples.png", samples, nrow=4)
    print(f"saved samples to {outdir}/samples.png")


if __name__ == "__main__":
    main()
