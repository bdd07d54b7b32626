"""Entropy/error time-profile study — TPU-native counterpart of the
reference stochasticity-paper secondary analysis
(reference stochasticity_paper/scripts/test-time_profile-correlation.py:
1-524; the last unreproduced stochasticity-paper artifact, VERDICT r4
"missing" #6).

Trains a small 1D MLP score model on a two-component mixture of
Gaussians, snapshotting parameters on a step grid, and for EVERY
snapshot computes:

1. ``all_entropies``: histogram-KL divergences, both directions
   (H(~p||p) and H(p||~p), the reference's approx_entropy1 with the
   bin-count-averaged estimator), between SDE-sampled points and data
   samples, across a gamma grid with the reference's custom_spacing
   (alpha-biased toward small gamma).
2. ``all_errors``: along the sampler's own SDE trajectory (the states
   actually visited, as in the reference), the score L2 error against
   the ANALYTIC noised-mixture score (this build's toy oracles replace
   the reference's fitted ground truth) and the sigma^-4-weighted DSM
   loss vs the trajectory endpoint.

Output: one JSON (default docs/artifacts/entropy_time_profile.json)
consumed by scripts/correlation_thresholds.py — the pair reproduces the
notebook pipeline the reference scripts automate.

Usage:
    python scripts/entropy_time_profile.py [--train-steps 3000]
        [--snapshot-every 250] [--nsteps 100] [--ngamma 8]
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def custom_spacing(min_val, max_val, n, alpha=0.5):
    """Non-uniform gamma spacing biased toward small values
    (test-time_profile-correlation.py:109-114)."""
    lin = np.linspace(min_val ** alpha, max_val ** alpha, n)
    return lin ** (1.0 / alpha)


def approx_entropy1(samples, samples_ref, epsilon=1e-12, nbins=100):
    """KL(samples || samples_ref) via histograms, averaged over a range
    of bin counts (test-time_profile-correlation.py:117-137). scipy's
    entropy(p, q) on density histograms, skipping nb % 4 == 0 exactly as
    the reference does."""
    from scipy.stats import entropy
    s = np.asarray(samples, np.float64).ravel()
    r = np.asarray(samples_ref, np.float64).ravel()
    lo = float(min(s.min(), r.min()))
    hi = float(max(s.max(), r.max()))
    kls = []
    for nb in range(nbins - 20, nbins):
        if nb % 4 == 0:
            continue
        bins = np.linspace(lo, hi, nb)
        p = np.histogram(s, bins=bins, density=True)[0] + epsilon
        q = np.histogram(r, bins=bins, density=True)[0] + epsilon
        kls.append(entropy(p, q))
    return float(np.mean(kls))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=3000)
    ap.add_argument("--snapshot-every", type=int, default=250)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--nsamples", type=int, default=4000)
    ap.add_argument("--nsteps", type=int, default=100)
    ap.add_argument("--ngamma", type=int, default=8)
    ap.add_argument("--gamma-max", type=float, default=8.0)
    ap.add_argument("--alpha", type=float, default=0.5)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--datasize", type=int, default=2000,
                    help="trajectory rows used for the error profile")
    ap.add_argument("--out",
                    default="docs/artifacts/entropy_time_profile.json")
    ap.add_argument("--platform", default="cpu",
                    choices=["cpu", "default"],
                    help="the study model is a 3-layer 1D MLP — CPU is "
                         "the right tool (default). 'default' uses the "
                         "ambient backend (TPU under axon).")
    args = ap.parse_args()

    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from diffsci_tpu import data, ops
    from diffsci_tpu.models import (KarrasModel, KarrasModelConfig,
                                    MLPUncond, create_train_state,
                                    make_train_step)
    from diffsci_tpu.models.karras.train import default_optimizer

    # the reference's mixt_gauss2 analogue: two 1D modes
    ds = data.MixtureOfGaussiansDataset(
        num_samples=args.nsamples, means=[[-2.0], [2.0]],
        weights=[1.0, 1.0], scale=0.3)
    key = jax.random.PRNGKey(0)
    key, kdata = jax.random.split(key)
    data_samples = np.asarray(ds.sample(kdata))       # [nsamples, 1]

    net = MLPUncond(dim=1, hidden_dims=(128, 128, 128))
    model = KarrasModel(net, KarrasModelConfig.from_edm())
    state, tx = create_train_state(model, key, (args.batch, 1),
                                   optimizer=default_optimizer(args.lr))
    step_fn = make_train_step(model, tx)

    gammas = custom_spacing(1e-3, args.gamma_max, args.ngamma, args.alpha)
    nsteps = args.nsteps
    sched0 = ops.EDMScheduler()
    t_grid = sched0.create_steps(nsteps + 1)
    sigma_grid = np.asarray(sched0.scheduling.noise(t_grid[:nsteps]),
                            np.float64)
    g_profile = float(min(gammas, key=lambda g: abs(g - 1.0)))

    # one jitted history sampler PER gamma (langevin_const is static in
    # the scan), reused across every snapshot — without this the study
    # retraces snapshots x gammas times
    def make_sampler(g):
        sched = ops.EDMScheduler(langevin_const=float(g))

        def run(variables, key, prior):
            def score_fn(x, sigma):
                return model.get_score(variables, x, sigma)
            return sched.propagate_backward(
                key, prior, score_fn, nsteps=nsteps,
                stochastic=True, record_history=True)
        return jax.jit(run)

    samplers = {float(g): make_sampler(g) for g in gammas}
    sig_b = jnp.asarray(sigma_grid)[:, None]          # [nsteps, 1]

    @jax.jit
    def error_profile(variables, hist):
        """Score L2 error vs the analytic oracle + sigma^-4 DSM loss at
        every trajectory step, vmapped over the step axis."""
        x0 = hist[-1, :args.datasize]

        def per_step(x, sig_row):
            sig = jnp.broadcast_to(sig_row, (x.shape[0],))
            s_model = model.get_score(variables, x, sig)
            s_true = ds.gradlogprob(x, sig)
            den, _ = model.get_denoiser(variables, x, sig)
            return (jnp.mean((s_model - s_true) ** 2),
                    jnp.mean((den - x0) ** 2) / sig_row[0] ** 4)
        return jax.vmap(per_step)(hist[:nsteps, :args.datasize], sig_b)

    def profile_snapshot(variables, key):
        """Entropies over the gamma grid + error profile along the
        gamma~1 SDE trajectory (the reference profiles the stochastic
        trajectory it also samples from)."""
        key, kprior = jax.random.split(key)
        prior = (jax.random.normal(kprior, (args.nsamples, 1))
                 * sched0.maximum_scale)
        sde_entropies, inv_sde_entropies = [], []
        history = None
        for g in gammas:
            key, kprop = jax.random.split(key)
            out = samplers[float(g)](variables, kprop, prior)
            samp = np.asarray(out[-1])
            sde_entropies.append(approx_entropy1(samp, data_samples))
            inv_sde_entropies.append(approx_entropy1(data_samples, samp))
            if float(g) == g_profile:
                history = out
        se, dl = error_profile(variables, history)
        return (list(map(float, gammas)), sde_entropies, inv_sde_entropies,
                [float(v) for v in se], [float(v) for v in dl],
                list(map(float, sigma_grid)))

    snapshots = {}
    xs = jnp.asarray(data_samples)
    rng = np.random.default_rng(1)
    for step in range(1, args.train_steps + 1):
        key, sub = jax.random.split(key)
        idx = rng.integers(0, args.nsamples, size=args.batch)
        state, metrics = step_fn(state, sub, xs[idx])
        if step % args.snapshot_every == 0:
            key, kprof = jax.random.split(key)
            (gv, ent, inv_ent, err, dsm, sig) = profile_snapshot(
                state.variables(), kprof)
            snapshots[step] = {
                "gamma_values": gv, "sde_entropies": ent,
                "inv_sde_entropies": inv_ent, "score_errors": err,
                "dsm_losses": dsm,
                "train_loss": float(metrics["train_loss"]),
            }
            print(f"step {step}: loss={snapshots[step]['train_loss']:.4f} "
                  f"KL(~p|p) ode~{ent[0]:.4f} min={min(ent):.4f}",
                  flush=True)

    out = {
        "dataset": "MixtureOfGaussians 1D means=[-2,2] scale=0.3",
        "nsteps": nsteps,
        "sigma_grid": list(map(float, sig)),
        "snapshots": snapshots,
        "note": ("all_entropies/all_errors counterpart of the reference's "
                 ".pt pair; score_errors use the analytic noised-mixture "
                 "score (toy oracle) where the reference compares against "
                 "a fitted approximation"),
    }
    path = pathlib.Path(args.out)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out))
    print(f"wrote {path} ({len(snapshots)} snapshots)")


if __name__ == "__main__":
    main()
