"""End-to-end stochasticity study: reproduce the FID-vs-gamma shape.

The reference's stochasticity paper finds that for an *early-training*
diffusion model, sampling stochasticity improves FID: the FID(gamma) curve
drops from the near-ODE regime (gamma ~ 0) to a minimum at moderate
stochasticity before degrading at extreme churn (reference
stochasticity_paper/scripts/
test-diffusion-cifar10karras-colormap-parallel.py:1-44, which sweeps
(s_min, s_max) over a 6-GPU process pool; here each gamma point is one
jitted sampler run, batched on the accelerator).

Zero-egress environment: trains on the in-house ShapesDataset
(paper_replica mode) instead of CIFAR-10 and scores with pixel-feature
FID (metrics.fid) — the curve *shape* is the reproduction target, not the
absolute numbers, which are honestly not Inception-FID (see
scripts/eval_fid.py).

Writes docs/artifacts/stochasticity_sweep.json with the gamma grid, FID
per gamma, and a `shape_ok` verdict:
    FID(best gamma > gamma_min) < FID(gamma_min)  (stochasticity helps).

Usage:
    python scripts/stochasticity_study.py [--steps 1500] [--nsamples 512]
"""

import argparse
import json
import pathlib


def _train_classifier_features(xs, labels, size, steps=600):
    """Train MinimalResNet on the slot-occupancy labels (3-way
    multi-label sigmoid) and return a pooled-feature extractor — a
    non-pixel feature space for FID (the stand-in for Inception features
    in this zero-egress environment)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from diffsci_tpu.models.nets.classifiers import MinimalResNet

    net = MinimalResNet(out_classes=3, model_channels=32,
                        n_layers=4)
    key = jax.random.PRNGKey(7)
    variables = net.init(key, jnp.zeros((2, size, size, 1)))
    params = variables["params"]
    tx = optax.adam(3e-4)
    opt_state = tx.init(params)
    xj = jnp.asarray(xs)
    yj = jnp.asarray(labels)

    @jax.jit
    def step(params, opt_state, kb):
        idx = jax.random.randint(kb, (128,), 0, xj.shape[0])

        def loss_fn(p):
            logits = net.apply({"params": p}, xj[idx], train=False)
            return jnp.mean(optax.sigmoid_binary_cross_entropy(
                logits, yj[idx]))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        key, kb = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, kb)
    print(f"classifier trained: final BCE {float(loss):.4f}")

    @jax.jit
    def feats(xb):
        return net.apply({"params": params}, xb,
                         method=MinimalResNet.features)

    def extract(x, bs=256):
        outs = []
        for i in range(0, x.shape[0], bs):
            outs.append(np.asarray(feats(jnp.asarray(x[i:i + bs]))))
        return np.concatenate(outs, 0).astype(np.float64)

    return extract


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500,
                    help="training steps (early-training regime)")
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--num-data", type=int, default=4096)
    ap.add_argument("--nsamples", type=int, default=512)
    ap.add_argument("--nfe", type=int, default=100)
    ap.add_argument("--gammas", type=float, nargs="+",
                    default=[0.01, 0.1, 0.3, 0.5, 1.0, 2.0, 3.0, 5.0, 8.0])
    ap.add_argument("--model-channels", type=int, default=32,
                    help="128 = the reference's CIFAR-scale width")
    ap.add_argument("--expansion", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-4,
                    help="reference study trains at 1e-4 (stochasticity_"
                         "paper/scripts/train-diffusion-mnist.py:36); the "
                         "framework's 1e-3 default diverges at 128ch")
    ap.add_argument("--log-dir", default="runs/stochasticity_study")
    ap.add_argument("--classifier-fid", action="store_true",
                    help="also score in trained-classifier feature space "
                         "(MinimalResNet on the slot-occupancy labels)")
    ap.add_argument("--out",
                    default="docs/artifacts/stochasticity_sweep.json")
    args = ap.parse_args()

    import jax
    import numpy as np
    from diffsci_tpu import ops
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
    state, trainer = fit_karras(
        model, xs, batch_size=args.batch_size,
        max_epochs=args.steps,  # outer bound only; max_steps terminates
        max_steps=args.steps, ema=ema, val_fraction=0.05,
        optimizer=default_optimizer(args.lr),
        log_dir=args.log_dir)
    print(f"trained to step {int(state.step)}")
    variables = state.ema_variables(ema)

    def features(x):
        return np.asarray(x, np.float64).reshape(x.shape[0], -1)

    cls_feat = None
    if args.classifier_fid:
        cls_feat = _train_classifier_features(xs, xlabels, args.size)

    real_f = features(held_out)
    real_cf = cls_feat(held_out) if cls_feat else None
    results = []
    key = jax.random.PRNGKey(42)
    out_path = pathlib.Path(args.out)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    # gamma rides the sampler as a RUNTIME langevin_scale (langevin_const
    # stays 1), so the whole sweep reuses ONE compiled executable —
    # recompiling the 100-step 128ch scan per point costs minutes each
    model.config.noisescheduler = ops.EDMScheduler(langevin_const=1.0)
    for gamma in args.gammas:
        key, sub = jax.random.split(key)
        samples = model.sample(
            variables, sub, args.nsamples,
            (args.size, args.size, 1), nsteps=args.nfe,
            stochastic=True, maximum_batch_size=256,
            langevin_scale=gamma)
        score = float(fid(real_f, features(samples)))
        row = {"gamma": gamma, "fid": score}
        if cls_feat:
            row["classifier_fid"] = float(fid(real_cf, cls_feat(samples)))
        results.append(row)
        print(f"gamma={gamma}: " + ", ".join(
            f"{k}={v:.4f}" for k, v in row.items() if k != "gamma"),
            flush=True)
        # incremental write: a killed run still leaves partial results
        out_path.write_text(json.dumps({"partial": True,
                                        "sweep": results}, indent=2))

    fids = [r["fid"] for r in results]
    best_i = int(np.argmin(fids))
    shape_ok = bool(best_i > 0 and fids[best_i] < fids[0])
    artifact = {
        "dataset": f"shapes_paper_replica_{args.size}",
        "train_steps": int(state.step),
        "nfe": args.nfe,
        "nsamples": args.nsamples,
        "feature_space": ("pixel + trained-classifier"
                          if args.classifier_fid else
                          "pixel (NOT Inception-comparable; shape only)"),
        "model_channels": args.model_channels,
        "channel_expansion": list(args.expansion),
        "sweep": results,
        "best_gamma": args.gammas[best_i],
        "fid_at_min_gamma": fids[0],
        "fid_at_best_gamma": fids[best_i],
        "shape_ok": shape_ok,
        "finding": ("stochasticity improves early-training FID"
                    if shape_ok else
                    "shape NOT reproduced in this run"),
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(artifact, indent=2))
    print(f"wrote {out}; shape_ok={shape_ok}")


if __name__ == "__main__":
    main()
