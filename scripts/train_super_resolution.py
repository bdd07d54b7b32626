"""SR3-style conditional super-resolution diffusion.

The script analogue of the reference's conditionalSR3 configuration
(reference karrasmodule.py:291-341, preconditioners.py:112-136): the model
learns p(high-res | low-res) with the low-res image upsampled and
concatenated as conditioning channels (PUNetGCond), under the SR3
preconditioner's halved skip connections.

Synthetic task (zero-egress): 28x28 blobs downsampled 4x to 7x7; the model
must reconstruct the high-res blob from the blurry low-res conditioning.
Reports the PSNR of super-resolved samples against the ground truth —
conditioning works iff PSNR beats the bicubic-like baseline of the naive
upsampled input.

    python scripts/train_super_resolution.py [--steps 1500] [--factor 4]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def make_blobs(n: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    xs = np.zeros((n, 28, 28, 1), np.float32)
    yy, xx = np.mgrid[0:28, 0:28].astype(np.float32)
    for i in range(n):
        cx, cy = rng.uniform(6, 22, 2)
        s = rng.uniform(1.5, 3.0)
        xs[i, :, :, 0] = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                                / (2 * s ** 2))
    return xs * 2.0 - 1.0


def psnr(a: np.ndarray, b: np.ndarray, rng: float = 2.0) -> float:
    mse = float(np.mean((a - b) ** 2))
    return 10.0 * np.log10(rng ** 2 / max(mse, 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--factor", type=int, default=4)
    ap.add_argument("--nsamples", type=int, default=32)
    ap.add_argument("--ndraws", type=int, default=8)
    ap.add_argument("--outdir", default="runs/sr3")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from diffsci_tpu.models import (EMATracker, KarrasModel,
                                    KarrasModelConfig, PUNetGCond,
                                    PUNetGConfig)
    from diffsci_tpu.trainer import fit_karras
    from diffsci_tpu.utils import save_image_grid

    xs = make_blobs(4096)
    f = args.factor
    # low-res degradation: average-pool then nearest-upsample back to 28^2
    lo = xs.reshape(-1, 28 // f, f, 28 // f, f, 1).mean(axis=(2, 4))
    lo_up = np.repeat(np.repeat(lo, f, axis=1), f, axis=2)
    print(f"dataset: hi {xs.shape}, lo-up {lo_up.shape}, "
          f"devices: {jax.devices()}")

    cfg = PUNetGConfig(model_channels=args.channels,
                       channel_expansion=[2, 4],
                       input_channels=2,  # x + 1 conditioning channel
                       output_channels=1)
    net = PUNetGCond(cfg, channel_conditional_items=("lowres",))
    model = KarrasModel(net, KarrasModelConfig.conditional_sr3(),
                        conditional=True)
    ema = EMATracker(ema_type="power", power_function_stds=[0.05])

    y_example = {"lowres": jnp.zeros((args.batch, 28, 28, 1))}
    state, trainer = fit_karras(
        model, (xs, {"lowres": lo_up}), batch_size=args.batch,
        max_epochs=max(1, args.steps // max(1, len(xs) // args.batch)),
        max_steps=args.steps, ema=ema, y_example=y_example,
        log_dir=args.outdir)
    tl = trainer.logger.last("train_loss")
    print(f"final train_loss={tl if tl is None else f'{tl:.4f}'} "
          f"(step {int(state.step)})")

    variables = state.ema_variables(ema)
    n = args.nsamples
    y_eval = {"lowres": jnp.asarray(lo_up[:n])}
    # posterior draws; the across-draw mean approximates the MMSE estimate,
    # the right object to compare against the (deterministic) naive
    # upsample on PSNR — a single diffusion draw carries sampling variance
    draws = []
    key = jax.random.PRNGKey(0)
    for _ in range(args.ndraws):
        key, sub = jax.random.split(key)
        draws.append(np.asarray(model.sample(
            variables, sub, n, (28, 28, 1), y=y_eval, nsteps=18)))
    out = draws[0]
    post_mean = np.mean(draws, axis=0)
    p_draw = psnr(out, xs[:n])
    p_mean = psnr(post_mean, xs[:n])
    p_naive = psnr(lo_up[:n], xs[:n])
    verdict = "BETTER" if p_mean > p_naive else "WORSE"
    print(f"PSNR: posterior-mean({args.ndraws}) {p_mean:.2f} dB, "
          f"single draw {p_draw:.2f} dB, naive upsample {p_naive:.2f} dB "
          f"({verdict})")
    outdir = pathlib.Path(args.outdir)
    grid = np.concatenate([xs[:8], lo_up[:8], out[:8]])
    save_image_grid(outdir / "sr3.png", grid, nrow=8)
    print(f"saved rows [truth / low-res / super-resolved] to {outdir}/sr3.png")


if __name__ == "__main__":
    main()
