"""Train a KL-VAE (optionally adversarial) for latent diffusion.

The analogue of the reference's VAE training scripts. Produces a checkpoint
usable as a BoundAutoencoder in latent KarrasModel training.

Usage:
    python scripts/train_vae.py [--data vol.npz] [--steps 2000]
        [--adversarial] [--outdir runs/vae]
"""

import argparse
import pathlib

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--resolution", type=int, default=32)
    ap.add_argument("--adversarial", action="store_true")
    ap.add_argument("--kl-weight", type=float, default=1e-4)
    ap.add_argument("--outdir", default="runs/vae")
    args = ap.parse_args()

    import jax
    from diffsci_tpu.models.nets import AutoencoderKL, DDConfig
    from diffsci_tpu.models.vae import (VAEModel, VAEModelConfig,
                                        create_vae_train_state,
                                        make_vae_train_step,
                                        NLayerDiscriminator)
    from diffsci_tpu.checkpoint import save_checkpoint

    if args.data:
        xs = np.load(args.data)["x"].astype(np.float32)
        if xs.ndim == 3:
            xs = xs[..., None]
    else:
        rng = np.random.default_rng(0)
        xs = rng.standard_normal(
            (2048, args.resolution, args.resolution, 1)).astype(np.float32)

    dd = DDConfig(z_channels=4, resolution=args.resolution, ch=32,
                  ch_mult=[1, 2, 4], num_res_blocks=2, has_mid_attn=False)
    config = VAEModelConfig(kl_weight=args.kl_weight,
                            reconstruction_loss="mse",
                            adversarial_weight=0.05 if args.adversarial
                            else 0.0)
    disc = NLayerDiscriminator() if args.adversarial else None
    model = VAEModel(AutoencoderKL(dd, embed_dim=4), config,
                     discriminator=disc)
    state, tx, dtx = create_vae_train_state(
        model, jax.random.PRNGKey(0),
        (args.batch,) + xs.shape[1:])
    step_fn = make_vae_train_step(model, tx, dtx)

    key = jax.random.PRNGKey(1)
    n = (len(xs) // args.batch) * args.batch
    for i in range(args.steps):
        key, sub = jax.random.split(key)
        lo = (i * args.batch) % n
        state, metrics = step_fn(state, sub, xs[lo:lo + args.batch])
        if i % 100 == 0:
            print(f"step {i}: loss={float(metrics['train_loss']):.4f} "
                  f"nll={float(metrics['nll_loss']):.4f} "
                  f"kl={float(metrics['kl_loss']):.4f}")

    outdir = pathlib.Path(args.outdir)
    save_checkpoint(outdir / "ckpt", state,
                    description={"ddconfig": dd.export_description()})
    print(f"saved checkpoint to {outdir}/ckpt")


if __name__ == "__main__":
    main()
