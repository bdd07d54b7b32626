"""Perf lab: ablation timings for the CIFAR-scale train step.

The CIFAR config (PUNetG 128ch [2,2], 32x32, batch 128) measures 66% MXU
+ 83% HBM simultaneously (docs/design.md) — near the pareto frontier but
with ~1.2-1.3x theoretical headroom. This script decomposes the step and
times the candidate levers so optimization is driven by measurements,
not guesses:

  fwd        loss only (no backward)
  grad       loss + backward, no optimizer/EMA
  full       the real train step (baseline)
  full-noema baseline without the EMA update
  full-mubf16  Adam first moment in bf16 (halved m traffic)
  full-b256  batch 256 (amortize param/optimizer traffic)
  full-remat remat=True (expected slower; memory knob)
  unet2d-hfnet  native DDPM-UNet backbone (HFNet (64,128,256) attn) train ips

Run ON THE TPU (no platform pin). Prints one JSON line per config.
"""

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def time_fn(fn, sync, steps=30, warmup=4, repeats=3):
    for _ in range(warmup):
        out = fn()
    sync(out)
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn()
        sync(out)
        rates.append((time.perf_counter() - t0) / steps)
    return float(np.median(rates))


def main():
    import jax
    import jax.numpy as jnp
    from diffsci_tpu.models import (KarrasModel, KarrasModelConfig, PUNetG,
                                    PUNetGConfig, create_train_state,
                                    make_train_step, EMATracker)
    from diffsci_tpu.models.karras.train import default_optimizer

    cfg = PUNetGConfig(model_channels=128, channel_expansion=[2, 2])
    net = PUNetG(cfg)
    model = KarrasModel(net, KarrasModelConfig.from_edm(),
                        compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    results = {}

    def train_rate(batch, tx=None, ema=True, remat=False):
        tracker = (EMATracker(ema_type="power", power_function_stds=[0.05])
                   if ema else None)
        state, tx_built = create_train_state(
            model, key, (batch, 32, 32, 1), optimizer=tx, ema=tracker)
        step = make_train_step(model, tx_built, ema=tracker, remat=remat)
        x = jax.random.normal(key, (batch, 32, 32, 1))
        holder = {"state": state}
        k = [key]

        def one():
            k[0], sub = jax.random.split(k[0])
            holder["state"], metrics = step(holder["state"], sub, x)
            return metrics

        sec = time_fn(one, lambda m: float(m["train_loss"]))
        return batch / sec

    # decomposition: fwd-only and grad-only on batch 128 (same loss the
    # train step computes: sigma sampled inside)
    tracker = EMATracker(ema_type="power", power_function_stds=[0.05])
    state, tx = create_train_state(model, key, (128, 32, 32, 1), ema=tracker)
    x = jax.random.normal(key, (128, 32, 32, 1))

    def loss_of(variables, k):
        ksig, kloss = jax.random.split(k)
        sigma = model.config.noisesampler.sample(ksig, (x.shape[0],))
        loss, _ = model.loss_fn(variables, kloss, x, sigma, train=True)
        return loss

    fwd = jax.jit(loss_of)
    grad = jax.jit(jax.value_and_grad(loss_of))

    vs = state.variables()
    kk = [key]

    def run_fwd():
        kk[0], sub = jax.random.split(kk[0])
        return fwd(vs, sub)

    def run_grad():
        kk[0], sub = jax.random.split(kk[0])
        return grad(vs, sub)

    results["fwd_ms"] = time_fn(run_fwd, lambda o: float(o)) * 1e3
    results["grad_ms"] = time_fn(run_grad, lambda o: float(o[0])) * 1e3

    results["full_ips"] = train_rate(128)
    results["full_noema_ips"] = train_rate(128, ema=False)
    results["full_mubf16_ips"] = train_rate(
        128, tx=default_optimizer(mu_dtype=jnp.bfloat16))
    results["full_b256_ips"] = train_rate(256)
    results["full_b64_ips"] = train_rate(64)
    results["full_remat_ips"] = train_rate(128, remat=True)

    # --- HFNet/UNet2D backbone (the reference's diffusers-style DDPM
    # UNet, now native): same scale class as its CIFAR usage
    from diffsci_tpu.models.nets import HFNetUncond
    unet = HFNetUncond(block_channels=(64, 128, 256), channels=1,
                       attn_up_and_down=True)
    model_u = KarrasModel(unet, KarrasModelConfig.from_edm(),
                          compute_dtype=jnp.bfloat16)
    tracker_u = EMATracker(ema_type="power", power_function_stds=[0.05])
    state_u, tx_u = create_train_state(model_u, key, (128, 32, 32, 1),
                                       ema=tracker_u)
    step_u = make_train_step(model_u, tx_u, ema=tracker_u)
    holder_u = {"state": state_u}
    ku = [key]

    def run_unet():
        ku[0], sub = jax.random.split(ku[0])
        holder_u["state"], metrics = step_u(holder_u["state"], sub, x)
        return metrics

    results["unet2d_hfnet_train_ips"] = 128 / time_fn(
        run_unet, lambda m: float(m["train_loss"]))

    # --- parallel-in-time sampling latency (ParaDiGMS windowed Picard):
    # small-batch latency-bound sampling is where the spare MXU
    # throughput converts into wall-clock
    cfg_s = PUNetGConfig(model_channels=64, channel_expansion=[2, 4])
    model_s = KarrasModel(PUNetG(cfg_s), KarrasModelConfig.from_edm(),
                          compute_dtype=jnp.bfloat16)
    vs = model_s.init(jax.random.PRNGKey(0), (4, 28, 28, 1))
    key2 = jax.random.PRNGKey(1)
    S, W = 100, 16

    seq_fn = jax.jit(lambda v, k: model_s.sample(
        v, k, 4, (28, 28, 1), nsteps=S, integrator="euler"))
    par_fn = jax.jit(lambda v, k: model_s.sample_parallel(
        v, k, 4, (28, 28, 1), nsteps=S, window=W, tol=1e-3,
        return_sweeps=True))

    def run_seq():
        return seq_fn(vs, key2)

    def run_par():
        return par_fn(vs, key2)

    results["picard_seq_100step_ms"] = time_fn(
        run_seq, lambda o: float(jnp.sum(o)), steps=3, warmup=2) * 1e3
    out, sweeps = par_fn(vs, key2)
    results["picard_sweeps"] = int(sweeps)
    results["picard_par_100step_ms"] = time_fn(
        run_par, lambda o: float(jnp.sum(o[0])), steps=3, warmup=2) * 1e3

    # --- few-NFE serving latency (what progressive distillation buys,
    # models/karras/distill.py: a distilled student samples through the
    # ordinary Euler path at nsteps=2-5): batch-4 28x28 wall-clock
    for nfe, integ in ((18, "heun"), (4, "euler"), (2, "euler")):
        fn = jax.jit(lambda v, k, n=nfe, it=integ: model_s.sample(
            v, k, 4, (28, 28, 1), nsteps=n, integrator=it))
        results[f"sample_{nfe}step_{integ}_ms"] = time_fn(
            lambda: fn(vs, key2), lambda o: float(jnp.sum(o)),
            steps=5, warmup=2) * 1e3

    results = {k: (round(v, 2) if isinstance(v, float) else v)
               for k, v in results.items()}
    results["device"] = str(jax.devices()[0])
    print(json.dumps(results))


if __name__ == "__main__":
    import sys
    if "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__)
        sys.exit(0)
    main()
