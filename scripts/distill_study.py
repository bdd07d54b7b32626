"""Progressive-distillation quality study: FID vs NFE, teacher vs student.

Trains the bench-scale model on the shapes dataset, distills it down the
halving chain (models/karras/distill.py), and scores pixel-FID at each
NFE budget for (a) the teacher sampled naively at that budget and (b)
the distilled student. The claim under test is Salimans & Ho's
(arXiv:2202.00512): the distilled student at 2-4 NFE approaches the
teacher's full-budget quality and crushes the naively-truncated sampler
at the same NFE.

Run ON THE TPU. Writes docs/artifacts/distill_study.json.

Usage:
    python scripts/distill_study.py [--steps 4000] [--phase-steps 1500]
"""

import argparse
import json
import pathlib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--phase-steps", type=int, default=1500)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--num-data", type=int, default=4096)
    ap.add_argument("--nsamples", type=int, default=1024)
    ap.add_argument("--model-channels", type=int, default=32)
    ap.add_argument("--expansion", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--distill-lr", type=float, default=1e-4)
    ap.add_argument("--start-nsteps", type=int, default=17)
    ap.add_argument("--log-dir", default="runs/distill_study")
    ap.add_argument("--out", default="docs/artifacts/distill_study.json")
    args = ap.parse_args()

    import jax
    import numpy as np
    from diffsci_tpu.data import ShapesDataset
    from diffsci_tpu.models import (EMATracker, KarrasModel,
                                    KarrasModelConfig, PUNetG, PUNetGConfig)
    from diffsci_tpu.models.karras import distill_progressive
    from diffsci_tpu.models.karras.train import default_optimizer
    from diffsci_tpu.trainer import fit_karras
    from diffsci_tpu.metrics import fid

    xs = ShapesDataset(args.num_data, size=args.size,
                       mode="paper_replica").generate()
    held_out = ShapesDataset(args.nsamples, size=args.size,
                             mode="paper_replica", seed=123).generate()
    print(f"data {xs.shape}, devices {jax.devices()}", flush=True)

    net = PUNetG(PUNetGConfig(model_channels=args.model_channels,
                              channel_expansion=list(args.expansion)))
    model = KarrasModel(net, KarrasModelConfig.from_edm())
    ema = EMATracker(ema_type="power", power_function_stds=[0.05])
    state, _ = fit_karras(
        model, xs, batch_size=args.batch_size,
        max_epochs=args.steps, max_steps=args.steps, ema=ema,
        val_fraction=0.05, optimizer=default_optimizer(args.lr),
        log_dir=args.log_dir)
    teacher_vars = state.ema_variables(ema)

    def features(x):
        return np.asarray(x, np.float64).reshape(x.shape[0], -1)

    real_f = features(held_out)
    shape = (args.size, args.size, 1)
    key = jax.random.PRNGKey(11)

    def score(variables, nsteps, integ, label, results):
        nonlocal key
        key, sub = jax.random.split(key)
        samples = model.sample(variables, sub, args.nsamples, shape,
                               nsteps=nsteps, integrator=integ,
                               maximum_batch_size=256)
        nfe = 2 * nsteps - 1 if integ == "heun" else nsteps
        results[label] = {"nsteps": nsteps, "integrator": integ,
                          "nfe": nfe,
                          "fid": float(fid(real_f, features(samples)))}
        print(f"{label}: NFE={nfe} fid={results[label]['fid']:.2f}",
              flush=True)

    results = {}
    # teacher baselines: full budget + naive truncation
    score(teacher_vars, 18, "heun", "teacher_heun@18", results)
    for n in dict.fromkeys((args.start_nsteps, 5, 3, 2)):
        score(teacher_vars, n, "euler", f"teacher_euler@{n}", results)

    def batches():
        k = jax.random.PRNGKey(77)
        n = xs.shape[0]
        while True:
            k, sub = jax.random.split(k)
            idx = jax.random.randint(sub, (args.batch_size,), 0, n)
            yield xs[np.asarray(idx)]

    chain_vars = {}

    def keep(nsteps, variables, losses):
        chain_vars[nsteps] = variables
        print(f"phase {nsteps}: loss {losses[0]:.4f} -> {losses[-1]:.5f}",
              flush=True)

    final_vars, history = distill_progressive(
        model, teacher_vars, batches(), jax.random.PRNGKey(5),
        start_nsteps=args.start_nsteps, final_nsteps=1,
        steps_per_phase=args.phase_steps,
        learning_rate=args.distill_lr, callback=keep)

    for nsteps, variables in chain_vars.items():
        if nsteps == 1:
            from diffsci_tpu.models.karras import sample_onestep
            key_, sub = jax.random.split(jax.random.PRNGKey(21))
            samples = sample_onestep(model, variables, sub,
                                     args.nsamples, shape)
            results["student_onestep@1"] = {
                "nsteps": 1, "integrator": "onestep", "nfe": 1,
                "fid": float(fid(real_f, features(samples)))}
            print(f"student_onestep@1: NFE=1 "
                  f"fid={results['student_onestep@1']['fid']:.2f}",
                  flush=True)
        else:
            score(variables, nsteps, "euler", f"student_euler@{nsteps}",
                  results)

    base = results["teacher_heun@18"]["fid"]
    claims = {
        "student2_beats_naive2": results["student_euler@2"]["fid"]
        < results["teacher_euler@2"]["fid"],
        "student2_within_2x_of_full_budget":
            results["student_euler@2"]["fid"] < 2.0 * base,
        "student_chain_monotone_vs_naive": all(
            results[f"student_euler@{n}"]["fid"]
            < results[f"teacher_euler@{n}"]["fid"]
            for n in chain_vars
            if n != 1 and f"teacher_euler@{n}" in results),
        "onestep_within_2x_of_full_budget":
            results["student_onestep@1"]["fid"] < 2.0 * base,
    }
    artifact = {
        "dataset": f"shapes_paper_replica_{args.size}",
        "train_steps": int(state.step),
        "phase_steps": args.phase_steps,
        "nsamples": args.nsamples,
        "model_channels": args.model_channels,
        "feature_space": "pixel (relative comparison only)",
        "chain": [h["nsteps"] for h in history],
        "results": results,
        "claims": claims,
    }
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(artifact, indent=2))
    print(f"wrote {out}; claims={claims}")


if __name__ == "__main__":
    main()
