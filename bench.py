"""Benchmark harness: EDM training throughput (imgs/sec/chip) and 18-NFE
Heun sampling wall-clock on the available accelerator, across three
configs that exercise different hardware paths:

- MNIST 28x28 / 64ch (headline metric, continuity with round 1): the conv
  path; attention is 49 tokens, negligible.
- CIFAR 32x32 / 128ch: the reference's CIFAR-scale conv path
  (reference scripts/training/train-edm-cifar10.py uses 128 base ch).
- 3D volume 32^3 / 32ch, attention at the 16^3 bottleneck = 4096 tokens:
  the attention path where the flash kernel engages; measured with both
  backends so the kernel's training-step delta is recorded.

TIMEOUT-PROOF (round 5, after BENCH_r04 was lost to rc=124): the script
prints the headline JSON line AS SOON AS the MNIST train + 18-NFE
sampling core is measured (~2-3 min incl. compile), then re-prints an
enriched line after every optional arm completes — the driver parses the
tail, so the LAST line wins and a timeout can only lose optional extras,
never the headline. Every optional arm is gated on remaining wall-clock
budget (``BENCH_BUDGET_S``, default 480 s); skipped arms are recorded in
``skipped_arms``. Composite members missing from a run fall back to
their round-3 recorded value (ratio 1.0) so the composite stays
comparable across rounds; ``composite_members_measured`` says which
ratios are live.

Headline semantics: ``value`` == ``vs_baseline`` == the geometric mean of
five speed ratios against the ROUND-3 recorded values (BENCH_r03.json,
the last driver-captured record): mnist/cifar/vol3d-flash/s2d train
throughput plus 18-NFE sampling speed (1/wall-clock). The reference
publishes no throughput numbers (BASELINE.md), so the baseline is this
build's own previous recorded round — a plain measured ratio.

Uses synthetic data (zero-egress environment); throughput does not depend
on pixel content.
"""

import json
import os
import pathlib
import time
from dataclasses import replace as dataclasses_replace

import numpy as np

T_START = time.perf_counter()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "480"))

# persistent XLA-compile cache: the bench's wall-clock is dominated by
# first-compiles (the measured regions are seconds); with a warm cache a
# full run drops from ~10 min to ~2 min. Safe across rounds — the cache
# key covers program + flags + jaxlib/backend version + device.
CACHE_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/tmp/diffsci_tpu_xla_cache")


def _enable_compile_cache():
    # NB: must go through jax.config — JAX binds cache-related env vars
    # when its config module is first defined, so setting os.environ
    # from inside this process is silently ignored (measured: cache dir
    # stays empty).
    import jax
    jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# conservative wall-clock estimates per optional arm (compile-dominated;
# first-compile on the axon tunnel runs 20-60 s, measured regions are
# ~1-5 s). An arm only starts if this much budget remains.
ARM_EST_S = {
    "sample_pipelined": 10,
    "cifar": 75,
    "cifar_s2d": 75,
    "vol3d_xla": 70,
    "vol3d_flash": 70,
    "vol3d_s2d": 70,
    "kernel_numerics": 90,
}


def _remaining():
    return BUDGET_S - (time.perf_counter() - T_START)


def _train_throughput(net_config, batch, spatial, steps=50, warmup=5,
                      repeats=1):
    """Train-step throughput (items/sec/chip) for one PUNetG config.

    ``repeats`` re-times the measured region and reports the median:
    short timed regions see +/-10% (and at ~0.2 s regions up to +/-30%)
    run-to-run variance over the axon tunnel — round 2's s2d record of
    480.9 items/s re-measured at 411-435 on the same code a day later,
    and round 5 saw 331..473 at a 20-step region. The 3D arms therefore
    time 50 steps (~0.5 s), and the median over >=3 repeats makes the
    composite headline track code, not tunnel weather. Honesty note:
    the r3 denominators were 20-step measurements, so the longer region
    also amortizes the per-repeat sync overhead better — worth ~+2% on
    vol3d-flash and up to ~+8% on the fast s2d arm of the r5 ratios
    (recorded in docs/round5.md); the 2D members are unaffected."""
    import jax
    import jax.numpy as jnp
    from diffsci_tpu.models import (KarrasModel, KarrasModelConfig, PUNetG,
                                    create_train_state, make_train_step,
                                    EMATracker)

    net = PUNetG(net_config)
    model = KarrasModel(net, KarrasModelConfig.from_edm(),
                        compute_dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    tracker = EMATracker(ema_type="power", power_function_stds=[0.05],
                         update_every=4)
    shape = (batch,) + tuple(spatial) + (1,)
    state, tx = create_train_state(model, key, shape, ema=tracker)
    step_fn = make_train_step(model, tx, ema=tracker)
    x = jax.random.normal(key, shape)
    for _ in range(warmup):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, sub, x)
    float(metrics["train_loss"])  # hard sync
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, sub, x)
        float(metrics["train_loss"])
        dt = time.perf_counter() - t0
        rates.append(batch * steps / dt)
    return float(np.median(rates)) / jax.device_count()


def _kernel_numerics():
    """Assert Pallas-kernel numerics ON THE REAL DEVICE (round-2 review:
    interpret-mode CPU tests missed a TPU block-tiling bug; docs/round2.md).
    Compares flash-attention and fused-precondition outputs (fwd + one
    grad) against their XLA reference implementations at the shapes the
    timed configs use, and returns max|delta| fields for the bench JSON.
    Raises if any delta exceeds its threshold."""
    import jax
    import jax.numpy as jnp
    from diffsci_tpu.kernels import flash_attention as fa
    from diffsci_tpu.kernels import fused_precondition as fp

    deltas = {}
    key = jax.random.PRNGKey(7)

    # flash vs XLA attention at the 3D-bottleneck shape (B*H=8, T=4096)
    kq, kk, kv = jax.random.split(key, 3)
    shape = (2, 4, 4096, 16)
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk, shape, jnp.float32)
    v = jax.random.normal(kv, shape, jnp.float32)

    def xla_attn(q, k, v):
        s = jnp.einsum("bhtd,bhsd->bhts", q, k) / jnp.sqrt(q.shape[-1])
        return jnp.einsum("bhts,bhsd->bhtd", jax.nn.softmax(s, -1), v)

    f_out = jax.jit(fa.flash_attention)(q, k, v)
    x_out = jax.jit(xla_attn)(q, k, v)
    deltas["flash_vs_xla_fwd_max_abs_delta"] = float(
        jnp.max(jnp.abs(f_out - x_out)))
    g_f = jax.jit(jax.grad(lambda q: jnp.sum(
        fa.flash_attention(q, k, v) ** 2)))(q)
    g_x = jax.jit(jax.grad(lambda q: jnp.sum(xla_attn(q, k, v) ** 2)))(q)
    deltas["flash_vs_xla_bwd_max_abs_delta"] = float(
        jnp.max(jnp.abs(g_f - g_x)))

    # fused precondition vs naive broadcast: 28x28 exercises the flat XLA
    # fallback (N=784), 32x32 the Pallas kernel (N=1024)
    for hw in (28, 32):
        x = jax.random.normal(kq, (8, hw, hw, 1))
        f = jax.random.normal(kk, (8, hw, hw, 1))
        a = jnp.linspace(0.2, 2.0, 8)
        b = jnp.linspace(-1.0, 1.0, 8)
        naive = (a[:, None, None, None] * x + b[:, None, None, None] * f)
        fused = jax.jit(fp.fused_axby)(x, f, a, b)
        deltas[f"fused_precond_{hw}x{hw}_fwd_max_abs_delta"] = float(
            jnp.max(jnp.abs(fused - naive)))
        gn = jax.jit(jax.grad(lambda x: jnp.sum(
            (a[:, None, None, None] * x
             + b[:, None, None, None] * f) ** 2)))(x)
        gf = jax.jit(jax.grad(lambda x: jnp.sum(
            fp.fused_axby(x, f, a, b) ** 2)))(x)
        deltas[f"fused_precond_{hw}x{hw}_bwd_max_abs_delta"] = float(
            jnp.max(jnp.abs(gf - gn)))

    # thresholds: ~8-10x the deltas observed on TPU v5e (observed: flash
    # fwd 6.3e-4 / bwd 5.5e-4 — MXU matmul passes + softmax-reduction
    # reordering; fused precond exactly 0.0). A real block-tiling bug
    # produces O(1) garbage, so the margin to a true failure is ~1000x.
    limits = {"flash_vs_xla_fwd_max_abs_delta": 5e-3,
              "flash_vs_xla_bwd_max_abs_delta": 5e-3,
              "fused_precond_28x28_fwd_max_abs_delta": 1e-5,
              "fused_precond_28x28_bwd_max_abs_delta": 1e-4,
              "fused_precond_32x32_fwd_max_abs_delta": 1e-5,
              "fused_precond_32x32_bwd_max_abs_delta": 1e-4}
    failures = {k: v for k, v in deltas.items() if v > limits[k]}
    deltas["kernel_numerics_ok"] = not failures
    return deltas, failures


# round-3 recorded values (BENCH_r03.json) — the composite denominators.
R3 = {"mnist": 20377.54, "cifar": 6987.83, "vol3d_flash": 108.879,
      "s2d": 481.604, "sample_speed": 1.0 / 0.0675}


def _emit(extras, now, skipped):
    """(Re-)print the full bench JSON line. Composite = geomean of the
    five speed ratios vs R3; members not (yet) measured contribute ratio
    1.0 (== their R3 record) and are excluded from
    composite_members_measured."""
    import jax
    measured = sorted(k for k in R3 if k in now)
    rel = [now[k] / R3[k] for k in measured]
    composite = float(np.exp(np.mean(np.log(rel)))) if rel else 1.0

    payload = {
        "metric": "edm_bench_composite_vs_r3",
        "value": round(composite, 4),
        "unit": "x (geomean of mnist/cifar/vol3d-flash/s2d train ips + "
                "18-NFE sampling speed, vs round-3 record)",
        "vs_baseline": round(composite, 4),
        "composite_members_measured": measured,
        "skipped_arms": sorted(skipped),
        "elapsed_s": round(time.perf_counter() - T_START, 1),
    }
    payload.update(extras)
    payload["n_chips"] = jax.device_count()
    payload["device"] = str(jax.devices()[0])
    print(json.dumps(payload), flush=True)


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

    extras = {}
    now = {}
    skipped = set()

    _enable_compile_cache()
    jax.device_count()  # force backend init so the cost is attributable
    extras["jax_init_s"] = round(time.perf_counter() - T_START, 1)

    config = PUNetGConfig(model_channels=64, channel_expansion=[2, 4])
    net = PUNetG(config)
    kconfig = KarrasModelConfig.from_edm()
    # mixed precision: bf16 network compute, f32 master params/loss —
    # ~1.2x the f32 throughput on v5e (f32 matmuls already use bf16 MXU
    # passes; the gain is halved activation HBM traffic), same convergence
    model = KarrasModel(net, kconfig, compute_dtype=jnp.bfloat16)

    key = jax.random.PRNGKey(0)
    tracker = EMATracker(ema_type="power", power_function_stds=[0.05],
                         update_every=4)
    state, tx = create_train_state(model, key, (BATCH, IMAGE, IMAGE, 1),
                                   ema=tracker)
    step_fn = make_train_step(model, tx, ema=tracker)

    x = jax.random.normal(key, (BATCH, IMAGE, IMAGE, 1))

    # --- CORE ARM 1: MNIST training throughput ---
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
    now["mnist"] = imgs_per_sec_per_chip
    extras["mnist_edm_train_imgs_per_sec_per_chip"] = round(
        float(imgs_per_sec_per_chip), 2)
    extras["train_loss_final"] = round(float(metrics["train_loss"]), 5)

    # round-1 MNIST continuity ratio
    hist_path = pathlib.Path(__file__).parent / "bench_history.json"
    if hist_path.exists():
        hist = json.loads(hist_path.read_text())
        base = hist.get("first_imgs_per_sec_per_chip")
        if base:
            extras["mnist_vs_r1_baseline"] = round(
                float(imgs_per_sec_per_chip / base), 3)

    # --- CORE ARM 2: 18-NFE Heun sampling wall-clock (per-rep synced) ---
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
    now["sample_speed"] = 1.0 / sample_sec
    extras["sample_18nfe_seconds_64imgs"] = round(float(sample_sec), 4)
    extras["batch"] = BATCH

    # >>> HEADLINE OUT — everything after this point is optional and can
    # time out without losing the round's record.
    pending = set(ARM_EST_S)
    _emit(extras, now, skipped | pending)

    cifar_cfg = PUNetGConfig(model_channels=128, channel_expansion=[2, 2])
    vol_xla = PUNetGConfig(dimension=3, model_channels=32,
                           channel_expansion=[2], num_heads=2,
                           attn_backend="xla")
    vol_flash = dataclasses_replace(vol_xla, attn_backend="flash")
    # space_to_depth folds 2^3 voxel tiles into channels: the C<128
    # lane-padding fix (docs/design.md) — measured 4.4x over vol_flash
    vol_s2d = dataclasses_replace(vol_flash, space_to_depth=2)

    def arm_sample_pipelined():
        # pipelined device throughput: enqueue the window, sync ONCE at
        # the end (in-order TPU execution makes the final scalar readback
        # force the whole window). The per-rep-synced number above stays
        # the composite member (methodology continuity with rounds 1-3
        # and the honest single-request latency incl. host RTT); this
        # extra is the batch-generation throughput — measured ~27 ms/call
        # of tunnel-sync overhead separates them on v5e-over-axon.
        nonlocal key
        t0 = time.perf_counter()
        for _ in range(REPEATS):
            key, sub = jax.random.split(key)
            out = model.sample(variables, sub, NSAMPLES, (IMAGE, IMAGE, 1),
                               nsteps=NFE_STEPS)
        float(jnp.sum(out))
        extras["sample_18nfe_pipelined_seconds_64imgs"] = round(
            (time.perf_counter() - t0) / REPEATS, 4)

    def arm_cifar():
        # CIFAR-scale conv path (reference's 128ch config,
        # train-edm-cifar10.py) — composite member.
        v = _train_throughput(cifar_cfg, batch=128, spatial=(32, 32),
                              repeats=3)
        now["cifar"] = v
        extras["cifar32_128ch_imgs_per_sec_per_chip"] = round(float(v), 2)

    def arm_vol3d_flash():
        # steps=50 (was 20): the 20-step timed region is ~0.2 s, inside
        # the axon tunnel's ~50 ms sync jitter — measured 331..473
        # items/s across same-code runs. A ~0.5 s region tracks code,
        # not weather; throughput/item is scale-free so r3 denominators
        # stay comparable.
        v = _train_throughput(vol_flash, batch=4, spatial=(32, 32, 32),
                              steps=50, repeats=3)
        now["vol3d_flash"] = v
        extras["vol3d_32c_attn4096_flash_items_per_sec"] = round(float(v), 3)

    def arm_vol3d_s2d():
        v = _train_throughput(vol_s2d, batch=4, spatial=(32, 32, 32),
                              steps=50, repeats=3)
        now["s2d"] = v
        extras["vol3d_32c_s2d2_items_per_sec"] = round(float(v), 3)

    def arm_kernel_numerics():
        # round-3 rule: timing is never reported without a same-shape
        # on-device numerical check of the Pallas kernels
        deltas, failures = _kernel_numerics()
        extras.update(
            {k: (v if isinstance(v, bool) else float(f"{v:.3g}"))
             for k, v in deltas.items()})
        return failures

    def arm_cifar_s2d():
        # space_to_depth=2 at the CIFAR config is 2.3x faster; the
        # equal-wall-clock quality gate is dataset-dependent: LOST on
        # smooth blobs (0.093 vs 0.076, perf_lab_r4.json) but WON on the
        # harder shapes distribution (0.231 vs 0.244, perf_lab_r5.json).
        # Stays an opt-in knob / labeled extra, NOT a composite member:
        # it changes the architecture vs the reference CIFAR config.
        v = _train_throughput(
            dataclasses_replace(cifar_cfg, space_to_depth=2), batch=128,
            spatial=(32, 32), repeats=3)
        extras["cifar32_128ch_s2d2_optin_imgs_per_sec_per_chip"] = round(
            float(v), 2)

    def arm_vol3d_xla():
        extras["vol3d_32c_attn4096_xla_items_per_sec"] = round(
            float(_train_throughput(vol_xla, batch=4, spatial=(32, 32, 32),
                                    steps=50, repeats=3)), 3)

    # importance order: composite members first, then the numerics gate,
    # then labeled extras — a timeout sheds the least valuable arms
    ARMS = [("sample_pipelined", arm_sample_pipelined),
            ("cifar", arm_cifar),
            ("vol3d_flash", arm_vol3d_flash),
            ("vol3d_s2d", arm_vol3d_s2d),
            ("kernel_numerics", arm_kernel_numerics),
            ("cifar_s2d", arm_cifar_s2d),
            ("vol3d_xla", arm_vol3d_xla)]
    numeric_failures = {}
    for name, fn in ARMS:
        pending.discard(name)
        if _remaining() < ARM_EST_S[name]:
            skipped.add(name)
            continue
        t0 = time.perf_counter()
        result = fn()
        extras[f"arm_{name}_s"] = round(time.perf_counter() - t0, 1)
        if name == "kernel_numerics":
            numeric_failures = result or {}
        _emit(extras, now, skipped | pending)

    _emit(extras, now, skipped)
    if numeric_failures:
        raise SystemExit(
            f"KERNEL NUMERICS FAILED on {jax.devices()[0]}: "
            f"{numeric_failures}")


if __name__ == "__main__":
    import sys
    try:
        main()
    except RuntimeError as e:
        # Transient accelerator-attach failures (the axon tunnel can be
        # unavailable for minutes at a time). JAX caches backend-init
        # failure per process, so retry in a FRESH process — bounded to
        # 3 x 45 s so retries can't eat the driver's whole time budget.
        retries = int(os.environ.get("BENCH_BACKEND_RETRIES", "0"))
        if "Unable to initialize backend" in str(e) and retries < 3:
            sys.stderr.write(
                f"bench: backend unavailable (retry {retries + 1}/3 in "
                f"45s): {e}\n")
            time.sleep(45)
            os.environ["BENCH_BACKEND_RETRIES"] = str(retries + 1)
            os.execv(sys.executable, [sys.executable] + sys.argv)
        raise
