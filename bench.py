"""Benchmark harness: MNIST-scale EDM training throughput (imgs/sec/chip)
and 18-NFE Heun sampling wall-clock on the available accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` is reported against this build's first recorded round
(1.0 until a prior record exists in bench_history.json).

Uses synthetic MNIST-shaped data (zero-egress environment); throughput does
not depend on pixel content. Model: PUNetG 64ch x [1,2,4] as in the
reference MNIST scripts (scripts/testing fid configs use PUNetG 128ch;
64ch keeps the benchmark under a minute while exercising the same kernels).
"""

import json
import pathlib
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from diffsci_tpu.models import (KarrasModel, KarrasModelConfig, PUNetG,
                                    PUNetGConfig, create_train_state,
                                    make_train_step, EMATracker)

    BATCH = 256
    IMAGE = 28
    STEPS = 100
    WARMUP = 5
    NFE_STEPS = 18
    NSAMPLES = 64

    config = PUNetGConfig(model_channels=64, channel_expansion=[2, 4])
    net = PUNetG(config)
    kconfig = KarrasModelConfig.from_edm()
    # mixed precision: bf16 network compute, f32 master params/loss —
    # ~1.2x the f32 throughput on v5e (f32 matmuls already use bf16 MXU
    # passes; the gain is halved activation HBM traffic), same convergence
    model = KarrasModel(net, kconfig, compute_dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    tracker = EMATracker(ema_type="power", power_function_stds=[0.05])
    state, tx = create_train_state(model, key, (BATCH, IMAGE, IMAGE, 1),
                                   ema=tracker)
    step_fn = make_train_step(model, tx, ema=tracker)

    x = jax.random.normal(key, (BATCH, IMAGE, IMAGE, 1))

    # --- training throughput ---
    for i in range(WARMUP):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, sub, x)
    float(metrics["train_loss"])  # scalar readback = hard sync
    t0 = time.perf_counter()
    for i in range(STEPS):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, sub, x)
    float(metrics["train_loss"])
    dt = time.perf_counter() - t0
    n_chips = jax.device_count()
    imgs_per_sec_per_chip = BATCH * STEPS / dt / n_chips

    # --- 18-NFE Heun sampling wall-clock (averaged over repeats) ---
    # note: a scalar readback forces completion; under remote-tunnel
    # platforms block_until_ready alone can return before execution on the
    # first post-compile call
    variables = state.variables()
    key, sub = jax.random.split(key)
    out = model.sample(variables, sub, NSAMPLES, (IMAGE, IMAGE, 1),
                       nsteps=NFE_STEPS)  # compile
    float(jnp.sum(out))
    REPEATS = 5
    t0 = time.perf_counter()
    for _ in range(REPEATS):
        key, sub = jax.random.split(key)
        out = model.sample(variables, sub, NSAMPLES, (IMAGE, IMAGE, 1),
                           nsteps=NFE_STEPS)
        float(jnp.sum(out))
    sample_sec = (time.perf_counter() - t0) / REPEATS

    # --- vs_baseline: relative to the first recorded run of this build ---
    hist_path = pathlib.Path(__file__).parent / "bench_history.json"
    vs_baseline = 1.0
    if hist_path.exists():
        hist = json.loads(hist_path.read_text())
        base = hist.get("first_imgs_per_sec_per_chip")
        if base:
            vs_baseline = imgs_per_sec_per_chip / base
    else:
        hist_path.write_text(json.dumps(
            {"first_imgs_per_sec_per_chip": imgs_per_sec_per_chip}))

    print(json.dumps({
        "metric": "mnist_edm_train_imgs_per_sec_per_chip",
        "value": round(float(imgs_per_sec_per_chip), 2),
        "unit": "imgs/sec/chip",
        "vs_baseline": round(float(vs_baseline), 3),
        "sample_18nfe_seconds_64imgs": round(float(sample_sec), 4),
        "train_loss_final": round(float(metrics["train_loss"]), 5),
        "batch": BATCH,
        "n_chips": n_chips,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
