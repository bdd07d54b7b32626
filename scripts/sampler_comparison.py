"""Sampler comparison at matched NFE: Euler vs Heun vs DPM-Solver++(2M).

Trains the bench-scale model on the shapes dataset, then scores pixel-FID
for each deterministic sampler at matched *network evaluations* (the cost
that matters): Euler and DPM++(2M) spend one evaluation per step; Heun
spends two per step minus one (endpoint). The claim under test is the
DPM-Solver++ paper's: at low NFE the multistep sampler dominates Euler
and matches Heun at half the steps.

Writes docs/artifacts/sampler_comparison.json.

Usage:
    python scripts/sampler_comparison.py [--steps 1500] [--nsamples 512]
"""

import argparse
import json
import pathlib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--num-data", type=int, default=4096)
    ap.add_argument("--nsamples", type=int, default=512)
    ap.add_argument("--model-channels", type=int, default=32,
                    help="128 = the reference's CIFAR-scale width")
    ap.add_argument("--expansion", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3,
                    help="use 1e-4 at 128ch (1e-3 diverges there)")
    ap.add_argument("--classifier-fid", action="store_true",
                    help="also score in trained-classifier feature space")
    ap.add_argument("--log-dir", default="runs/sampler_comparison")
    ap.add_argument("--out",
                    default="docs/artifacts/sampler_comparison.json")
    args = ap.parse_args()

    import jax
    import numpy as np
    from diffsci_tpu.data import ShapesDataset
    from diffsci_tpu.models import (EMATracker, KarrasModel,
                                    KarrasModelConfig, PUNetG, PUNetGConfig)
    from diffsci_tpu.models.karras.train import default_optimizer
    from diffsci_tpu.trainer import fit_karras
    from diffsci_tpu.metrics import fid

    xs, xlabels = ShapesDataset(args.num_data, size=args.size,
                                mode="paper_replica").generate_labeled()
    held_out = ShapesDataset(args.nsamples, size=args.size,
                             mode="paper_replica", seed=123).generate()
    print(f"data {xs.shape}, devices {jax.devices()}")

    net = PUNetG(PUNetGConfig(model_channels=args.model_channels,
                              channel_expansion=list(args.expansion)))
    model = KarrasModel(net, KarrasModelConfig.from_edm())
    ema = EMATracker(ema_type="power", power_function_stds=[0.05])
    state, _ = fit_karras(
        model, xs, batch_size=args.batch_size,
        max_epochs=args.steps,  # outer bound only; max_steps terminates
        max_steps=args.steps, ema=ema, val_fraction=0.05,
        optimizer=default_optimizer(args.lr),
        log_dir=args.log_dir)
    variables = state.ema_variables(ema)

    def features(x):
        return np.asarray(x, np.float64).reshape(x.shape[0], -1)

    cls_feat = None
    if args.classifier_fid:
        from stochasticity_study import _train_classifier_features
        cls_feat = _train_classifier_features(xs, xlabels, args.size)

    real_f = features(held_out)
    real_cf = cls_feat(held_out) if cls_feat else None
    # (label, integrator, nsteps, nfe): Heun evaluates 2n-1 times
    grid = [
        ("euler@10", "euler", 10, 10),
        ("dpmpp2m@10", "dpmpp2m", 10, 10),
        ("euler@20", "euler", 20, 20),
        ("heun@10", "heun", 10, 19),
        ("dpmpp2m@20", "dpmpp2m", 20, 20),
        ("heun@25", "heun", 25, 49),
        ("dpmpp2m@50", "dpmpp2m", 50, 50),
    ]
    results = {}
    key = jax.random.PRNGKey(11)
    for label, integ, nsteps, nfe in grid:
        key, sub = jax.random.split(key)
        samples = model.sample(variables, sub, args.nsamples,
                               (args.size, args.size, 1), nsteps=nsteps,
                               integrator=integ, maximum_batch_size=256)
        score = float(fid(real_f, features(samples)))
        results[label] = {"integrator": integ, "nsteps": nsteps,
                          "nfe": nfe, "fid": score}
        if cls_feat:
            results[label]["classifier_fid"] = float(
                fid(real_cf, cls_feat(samples)))
        print(f"{label}: NFE={nfe} " + ", ".join(
            f"{k}={v}" for k, v in results[label].items()
            if k.endswith("fid")), flush=True)

    claims = {
        "dpm_beats_euler_at_10_nfe":
            results["dpmpp2m@10"]["fid"] < results["euler@10"]["fid"],
        "dpm_beats_euler_at_20_nfe":
            results["dpmpp2m@20"]["fid"] < results["euler@20"]["fid"],
        "dpm20_within_10pct_of_heun19":
            results["dpmpp2m@20"]["fid"]
            < results["heun@10"]["fid"] * 1.10,
    }
    artifact = {
        "dataset": f"shapes_paper_replica_{args.size}",
        "train_steps": int(state.step),
        "nsamples": args.nsamples,
        "model_channels": args.model_channels,
        "feature_space": ("pixel + trained-classifier" if cls_feat
                          else "pixel (relative comparison only)"),
        "results": results,
        "claims": claims,
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(artifact, indent=2))
    print(f"wrote {out}; claims={claims}")


if __name__ == "__main__":
    main()
