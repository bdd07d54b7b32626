"""Probabilistic ensemble forecasting with CRPS training — the v2 runtime.

The script analogue of the reference's ocean-forecasting setup
(reference karrasmodule_new.py:963-1149 vectorized ensemble loss with CRPS,
custom_losses.py:536-865): a conditional diffusion model learns
p(next frame | current frame) on an advecting-blob toy system, trained with
the ensemble CRPS loss (E members per example flattened into one denoiser
call), then evaluated by sampling a forecast ensemble on held-out states
and scoring CRPS against persistence and ensemble-mean RMSE baselines.

    python scripts/train_ensemble_forecast.py [--steps 1500] [--ensemble 4]
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def make_advection_pairs(n: int, size: int = 16, shift: int = 2,
                         noise: float = 0.05, seed: int = 0):
    """(x_t, x_{t+1}) pairs: a Gaussian blob advecting +shift pixels in x
    (periodic) with small stochastic forcing."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    cx = rng.uniform(0, size, n)
    cy = rng.uniform(4, size - 4, n)
    s = rng.uniform(1.5, 2.5, n)

    def field(cx_, cy_, s_):
        dx = np.minimum(np.abs(xx - cx_[:, None, None]),
                        size - np.abs(xx - cx_[:, None, None]))
        return np.exp(-(dx ** 2 + (yy - cy_[:, None, None]) ** 2)
                      / (2 * s_[:, None, None] ** 2))

    x_t = field(cx, cy, s)
    jitter = rng.normal(0, 0.5, n)  # stochastic advection speed
    x_tp1 = field((cx + shift + jitter) % size, cy, s)
    x_tp1 += rng.normal(0, noise, x_tp1.shape)
    to = lambda a: (a[..., None] * 2.0 - 1.0).astype(np.float32)  # noqa
    return to(x_t), to(x_tp1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--channels", type=int, default=16)
    ap.add_argument("--ensemble", type=int, default=4)
    ap.add_argument("--eval-ensemble", type=int, default=8)
    ap.add_argument("--size", type=int, default=16)
    ap.add_argument("--outdir", default="runs/forecast")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from diffsci_tpu.data.loading import ArrayDataLoader
    from diffsci_tpu.models import (EMATracker, KarrasModelConfig,
                                    PUNetGCond, PUNetGConfig,
                                    create_train_state)
    from diffsci_tpu.models.karras.ensemble import (
        EnsembleKarrasModel, EnsembleKarrasModelConfig,
        make_ensemble_train_step)
    from diffsci_tpu.ops.losses import crps_ensemble
    from diffsci_tpu.utils import save_image_grid

    x_t, x_tp1 = make_advection_pairs(4096, size=args.size)
    print(f"pairs: {x_t.shape} -> {x_tp1.shape}, devices: {jax.devices()}")

    cfg = PUNetGConfig(model_channels=args.channels, channel_expansion=[2],
                       input_channels=2, output_channels=1,
                       number_resnet_downward_block=1,
                       number_resnet_upward_block=1,
                       number_resnet_attn_block=1,
                       number_resnet_before_attn_block=1,
                       number_resnet_after_attn_block=1)
    net = PUNetGCond(cfg, channel_conditional_items=("state",))
    config = EnsembleKarrasModelConfig.from_karras_config(
        KarrasModelConfig.from_edm(loss_metric="crps"),
        ensemble_size_train=args.ensemble)
    model = EnsembleKarrasModel(net, config, conditional=True)
    ema = EMATracker(ema_type="power", power_function_stds=[0.05])

    y0 = {"state": jnp.zeros((args.batch, args.size, args.size, 1))}
    state, tx = create_train_state(
        model, jax.random.PRNGKey(0),
        (args.batch, args.size, args.size, 1), y=y0, ema=ema)
    step_fn = make_ensemble_train_step(model, tx, ema=ema)

    n_hold = 64
    loader = ArrayDataLoader((x_tp1[:-n_hold], {"state": x_t[:-n_hold]}),
                             args.batch, seed=0)
    key = jax.random.PRNGKey(1)
    step = 0
    while step < args.steps:
        for batch in loader:
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, sub, batch)
            step += 1
            if step % 200 == 0:
                print(f"  step {step}: crps_loss="
                      f"{float(metrics['train_loss']):.4f}", flush=True)
            if step >= args.steps:
                break

    # --- probabilistic evaluation on held-out states ---
    variables = state.ema_variables(ema)
    cond = {"state": jnp.asarray(x_t[-n_hold:])}
    target = x_tp1[-n_hold:]
    members = []
    for e in range(args.eval_ensemble):
        key, sub = jax.random.split(key)
        members.append(np.asarray(model.sample(
            variables, sub, n_hold, (args.size, args.size, 1), y=cond,
            nsteps=18)))
    ensemble = np.stack(members, axis=1)  # [B, E, H, W, 1]

    crps_model = float(crps_ensemble(jnp.asarray(ensemble),
                                     jnp.asarray(target)))
    crps_persist = float(crps_ensemble(jnp.asarray(x_t[-n_hold:, None]),
                                       jnp.asarray(target)))
    rmse_mean = float(np.sqrt(np.mean((ensemble.mean(1) - target) ** 2)))
    rmse_persist = float(np.sqrt(np.mean((x_t[-n_hold:] - target) ** 2)))
    better = crps_model < crps_persist
    print(f"CRPS: ensemble({args.eval_ensemble}) {crps_model:.4f} vs "
          f"persistence {crps_persist:.4f} "
          f"({'BETTER' if better else 'WORSE'})")
    print(f"RMSE: ensemble-mean {rmse_mean:.4f} vs persistence "
          f"{rmse_persist:.4f}")

    outdir = pathlib.Path(args.outdir)
    grid = np.concatenate([x_t[-8:], target[:8], ensemble[:8, 0],
                           ensemble[:8].mean(1)])
    save_image_grid(outdir / "forecast.png", grid, nrow=8)
    print(f"saved rows [state / truth / one member / ensemble mean] to "
          f"{outdir}/forecast.png")


if __name__ == "__main__":
    main()
