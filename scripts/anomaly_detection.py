"""Diffusion-based anomaly detection demo: AnoDDPM and DDAD end-to-end.

The script analogue of the reference's anomaly features
(reference diffsci/features/anomalydetectors.py:34-203): train a diffusion
model on CLEAN data (Gaussian blobs), then detect injected anomalies
(a bright square artifact) by partial noising + reconstruction — anomalous
regions reconstruct toward the clean manifold, so the reconstruction error
map localizes the defect. DDAD adds the w*(y - x) guidance term so normal
regions stay faithful to the input.

Reports per-image detection: mean AnoDDPM error on corrupted vs clean
images (separation ratio), and saves error-map grids.

    python scripts/anomaly_detection.py [--steps 1500] [--noise-step 12]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def make_blobs(n: int, size: int = 28, seed: int = 0):
    rng = np.random.default_rng(seed)
    xs = np.zeros((n, size, size, 1), np.float32)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    for i in range(n):
        cx, cy = rng.uniform(8, size - 8, 2)
        s = rng.uniform(2.0, 4.0)
        xs[i, :, :, 0] = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2)
                                / (2 * s ** 2))
    return xs * 2.0 - 1.0


def inject_square(xs: np.ndarray, size: int = 6, seed: int = 1):
    """Bright square artifact at a random position (the anomaly)."""
    rng = np.random.default_rng(seed)
    out = xs.copy()
    masks = np.zeros(xs.shape, np.float32)
    for i in range(len(out)):
        r = rng.integers(2, xs.shape[1] - size - 2)
        c = rng.integers(2, xs.shape[2] - size - 2)
        out[i, r:r + size, c:c + size, 0] = 1.0
        masks[i, r:r + size, c:c + size, 0] = 1.0
    return out, masks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--nsteps", type=int, default=18,
                    help="backward grid size")
    ap.add_argument("--noise-step", type=int, default=12,
                    help="partial-noise depth (higher = less noise on the "
                         "EDM grid; step indexes the sigma grid)")
    ap.add_argument("--neval", type=int, default=32)
    ap.add_argument("--outdir", default="runs/anomaly")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from diffsci_tpu.features import AnoDDPM, DDAD
    from diffsci_tpu.models import (EMATracker, KarrasModel,
                                    KarrasModelConfig, PUNetG, PUNetGConfig)
    from diffsci_tpu.trainer import fit_karras
    from diffsci_tpu.utils import save_image_grid

    xs = make_blobs(4096)
    print(f"clean data: {xs.shape}, devices: {jax.devices()}")

    net = PUNetG(PUNetGConfig(model_channels=args.channels,
                              channel_expansion=[2, 4]))
    model = KarrasModel(net, KarrasModelConfig.from_edm())
    ema = EMATracker(ema_type="power", power_function_stds=[0.05])
    state, trainer = fit_karras(
        model, xs, batch_size=args.batch,
        max_epochs=max(1, args.steps // max(1, len(xs) // args.batch)),
        max_steps=args.steps, ema=ema, log_dir=args.outdir)
    tl = trainer.logger.last("train_loss")
    print(f"trained: loss={tl if tl is None else f'{tl:.4f}'} "
          f"(step {int(state.step)})")

    variables = state.ema_variables(ema)

    def score_fn(x, sigma):
        return model.get_score(variables, x, sigma)

    clean = make_blobs(args.neval, seed=7)
    corrupted, masks = inject_square(clean)
    sched = model.config.noisescheduler

    ano = AnoDDPM(sched)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    rec_bad = ano.reconstruct(k1, jnp.asarray(corrupted), score_fn,
                              step=args.noise_step, nsteps=args.nsteps)
    rec_ok = ano.reconstruct(k2, jnp.asarray(clean), score_fn,
                             step=args.noise_step, nsteps=args.nsteps)
    err_bad = np.asarray((corrupted - rec_bad) ** 2)[..., 0]
    err_ok = np.asarray((clean - rec_ok) ** 2)[..., 0]
    score_bad = err_bad.mean(axis=(1, 2))
    score_ok = err_ok.mean(axis=(1, 2))
    sep = float(score_bad.mean() / max(score_ok.mean(), 1e-9))
    # localization: error inside the anomaly mask vs outside
    m = masks[..., 0] > 0
    in_err = float(err_bad[m].mean())
    out_err = float(err_bad[~m].mean())
    auc_proxy = float((score_bad[:, None] > score_ok[None, :]).mean())
    print(f"AnoDDPM: corrupted score {score_bad.mean():.4f} vs clean "
          f"{score_ok.mean():.4f} (separation x{sep:.1f}, "
          f"pairwise-AUC {auc_proxy:.3f})")
    print(f"  localization: error inside anomaly {in_err:.4f} vs outside "
          f"{out_err:.4f} (x{in_err / max(out_err, 1e-9):.1f})")

    ddad = DDAD(sched)
    rec_g = ddad.reconstruct(k3, jnp.asarray(corrupted), score_fn,
                             nsteps=args.nsteps,
                             initial_step=args.noise_step, w=3.0)
    err_g = np.asarray((corrupted - rec_g) ** 2)[..., 0]
    print(f"DDAD (w=3): error inside anomaly {float(err_g[m].mean()):.4f} "
          f"vs outside {float(err_g[~m].mean()):.4f}")

    outdir = pathlib.Path(args.outdir)
    emax = err_bad[:8].max() or 1.0
    grid = np.concatenate([corrupted[:8], np.asarray(rec_bad)[:8],
                           (err_bad[:8, :, :, None] / emax) * 2.0 - 1.0])
    save_image_grid(outdir / "anomaly.png", grid, nrow=8)
    print(f"saved rows [corrupted / reconstruction / error map] to "
          f"{outdir}/anomaly.png")


if __name__ == "__main__":
    main()
