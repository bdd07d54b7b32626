"""Perf lab: named ablation timings for the headline train-step configs.

The CIFAR config (PUNetG 128ch [2,2], 32x32, batch 128) measures 66% MXU
+ 83% HBM simultaneously (docs/design.md) — near the pareto frontier but
with ~1.2-1.3x theoretical headroom; MNIST (64ch [2,4], 28x28, batch
256) sits at 94% of the HBM roofline. This script times the candidate
byte-cutting levers so optimization is driven by measurements:

  <cfg>_full       the real train step (baseline)
  <cfg>_noema      without the EMA shadow update
  <cfg>_ema4       EMA applied every 4th step (exact telescoped beta)
  <cfg>_mubf16     Adam first moment in bf16 (halved m traffic)
  <cfg>_s2d        space_to_depth=2 input folding (lane packing)
  <cfg>_levers     mubf16 + ema4 + s2d combined
  cifar_{fwd,grad} loss-only / loss+backward decomposition
  cifar_b{64,256}  batch scaling
  cifar_remat      remat=True (memory knob, expected slower)
  unet2d           native DDPM-UNet backbone train ips
  picard           parallel-in-time sampling latency
  fewnfe           2/4/18-NFE sampling latency

Run ON THE TPU (no platform pin). Prints one JSON line PER ARM as it
completes (so partial runs still yield data) and a final combined line.

  python scripts/perf_lab.py --only cifar_full cifar_mubf16
  python scripts/perf_lab.py --list
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

CONFIGS = {
    # name -> (model_channels, channel_expansion, spatial, batch)
    "mnist": dict(channels=64, expansion=[2, 4], spatial=(28, 28), batch=256),
    "cifar": dict(channels=128, expansion=[2, 2], spatial=(32, 32),
                  batch=128),
}


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


def _emit(name, value):
    print(json.dumps({name: round(value, 3)}), flush=True)


class Lab:
    def __init__(self):
        import jax
        import jax.numpy as jnp
        from diffsci_tpu.models import (KarrasModel, KarrasModelConfig,
                                        PUNetG, PUNetGConfig)
        self.jax = jax
        self.jnp = jnp
        self._model_cache = {}
        self._mk = lambda c: KarrasModel(
            PUNetG(c), KarrasModelConfig.from_edm(),
            compute_dtype=jnp.bfloat16)
        self.PUNetGConfig = PUNetGConfig
        self.key = jax.random.PRNGKey(0)

    def model_for(self, cfg_name, s2d=1):
        c = CONFIGS[cfg_name]
        k = (cfg_name, s2d)
        if k not in self._model_cache:
            cfg = self.PUNetGConfig(model_channels=c["channels"],
                                    channel_expansion=list(c["expansion"]),
                                    space_to_depth=s2d)
            self._model_cache[k] = self._mk(cfg)
        return self._model_cache[k], c

    def train_rate(self, cfg_name, batch=None, tx=None, ema=True,
                   remat=False, s2d=1, ema_every=1):
        jax = self.jax
        from diffsci_tpu.models import (create_train_state, make_train_step,
                                        EMATracker)
        model, c = self.model_for(cfg_name, s2d)
        batch = batch or c["batch"]
        shape = (batch,) + tuple(c["spatial"]) + (1,)
        tracker = (EMATracker(ema_type="power", power_function_stds=[0.05],
                              update_every=ema_every)
                   if ema else None)
        state, tx_built = create_train_state(
            model, self.key, shape, optimizer=tx, ema=tracker)
        step = make_train_step(model, tx_built, ema=tracker, remat=remat)
        x = jax.random.normal(self.key, shape)
        holder = {"state": state}
        k = [self.key]

        def one():
            k[0], sub = jax.random.split(k[0])
            holder["state"], metrics = step(holder["state"], sub, x)
            return metrics

        sec = time_fn(one, lambda m: float(m["train_loss"]))
        return batch / sec


def make_arms(lab):
    import jax
    import jax.numpy as jnp
    from diffsci_tpu.models import create_train_state, EMATracker
    from diffsci_tpu.models.karras.train import default_optimizer

    arms = {}

    for cfg in CONFIGS:
        arms[f"{cfg}_full_ips"] = (
            lambda cfg=cfg: lab.train_rate(cfg))
        arms[f"{cfg}_noema_ips"] = (
            lambda cfg=cfg: lab.train_rate(cfg, ema=False))
        arms[f"{cfg}_ema4_ips"] = (
            lambda cfg=cfg: lab.train_rate(cfg, ema_every=4))
        arms[f"{cfg}_mubf16_ips"] = (
            lambda cfg=cfg: lab.train_rate(
                cfg, tx=default_optimizer(mu_dtype=jnp.bfloat16)))
        arms[f"{cfg}_s2d_ips"] = (
            lambda cfg=cfg: lab.train_rate(cfg, s2d=2))
        arms[f"{cfg}_levers_ips"] = (
            lambda cfg=cfg: lab.train_rate(
                cfg, tx=default_optimizer(mu_dtype=jnp.bfloat16),
                s2d=2, ema_every=4))

    arms["cifar_b256_ips"] = lambda: lab.train_rate("cifar", batch=256)
    arms["cifar_b64_ips"] = lambda: lab.train_rate("cifar", batch=64)
    arms["cifar_remat_ips"] = lambda: lab.train_rate("cifar", remat=True)

    def decomp(what):
        from diffsci_tpu.models import create_train_state, EMATracker
        model, c = lab.model_for("cifar")
        shape = (c["batch"],) + tuple(c["spatial"]) + (1,)
        tracker = EMATracker(ema_type="power", power_function_stds=[0.05])
        state, _ = create_train_state(model, lab.key, shape, ema=tracker)
        x = jax.random.normal(lab.key, shape)

        def loss_of(variables, k):
            ksig, kloss = jax.random.split(k)
            sigma = model.config.noisesampler.sample(ksig, (x.shape[0],))
            loss, _ = model.loss_fn(variables, kloss, x, sigma, train=True)
            return loss

        vs = state.variables()
        kk = [lab.key]
        if what == "fwd":
            fn = jax.jit(loss_of)

            def run():
                kk[0], sub = jax.random.split(kk[0])
                return fn(vs, sub)
            return time_fn(run, lambda o: float(o)) * 1e3
        fn = jax.jit(jax.value_and_grad(loss_of))

        def run():
            kk[0], sub = jax.random.split(kk[0])
            return fn(vs, sub)
        return time_fn(run, lambda o: float(o[0])) * 1e3

    arms["cifar_fwd_ms"] = lambda: decomp("fwd")
    arms["cifar_grad_ms"] = lambda: decomp("grad")

    def unet2d():
        from diffsci_tpu.models import (KarrasModel, KarrasModelConfig,
                                        create_train_state, make_train_step,
                                        EMATracker)
        from diffsci_tpu.models.nets import HFNetUncond
        unet = HFNetUncond(block_channels=(64, 128, 256), channels=1,
                           attn_up_and_down=True)
        model_u = KarrasModel(unet, KarrasModelConfig.from_edm(),
                              compute_dtype=jnp.bfloat16)
        tracker = EMATracker(ema_type="power", power_function_stds=[0.05])
        state, tx = create_train_state(model_u, lab.key, (128, 32, 32, 1),
                                       ema=tracker)
        step = make_train_step(model_u, tx, ema=tracker)
        x = jax.random.normal(lab.key, (128, 32, 32, 1))
        holder = {"state": state}
        ku = [lab.key]

        def run():
            ku[0], sub = jax.random.split(ku[0])
            holder["state"], metrics = step(holder["state"], sub, x)
            return metrics
        return 128 / time_fn(run, lambda m: float(m["train_loss"]))

    arms["unet2d_hfnet_train_ips"] = unet2d

    def _sampler_model():
        from diffsci_tpu.models import KarrasModel, KarrasModelConfig, PUNetG
        cfg_s = lab.PUNetGConfig(model_channels=64, channel_expansion=[2, 4])
        m = KarrasModel(PUNetG(cfg_s), KarrasModelConfig.from_edm(),
                        compute_dtype=jnp.bfloat16)
        vs = m.init(jax.random.PRNGKey(0), (4, 28, 28, 1))
        return m, vs

    def picard():
        m, vs = _sampler_model()
        key2 = jax.random.PRNGKey(1)
        S, W = 100, 16
        seq_fn = jax.jit(lambda v, k: m.sample(
            v, k, 4, (28, 28, 1), nsteps=S, integrator="euler"))
        par_fn = jax.jit(lambda v, k: m.sample_parallel(
            v, k, 4, (28, 28, 1), nsteps=S, window=W, tol=1e-3,
            return_sweeps=True))
        out = {}
        out["picard_seq_100step_ms"] = time_fn(
            lambda: seq_fn(vs, key2), lambda o: float(jnp.sum(o)),
            steps=3, warmup=2) * 1e3
        _, sweeps = par_fn(vs, key2)
        out["picard_sweeps"] = int(sweeps)
        out["picard_par_100step_ms"] = time_fn(
            lambda: par_fn(vs, key2), lambda o: float(jnp.sum(o[0])),
            steps=3, warmup=2) * 1e3

        # The arms above use an UNTRAINED net whose garbage score keeps
        # the tol-gated frontier advancing 1 step/sweep (sweeps == S,
        # degenerate). The oracle arm shows the mechanism on a smooth
        # score — the regime real (trained) samplers operate in.
        from diffsci_tpu.data import MixtureOfGaussiansDataset
        from diffsci_tpu.ops import EDMScheduler
        from diffsci_tpu.ops.parallel_sampling import picard_window_sample
        mog = MixtureOfGaussiansDataset(
            num_samples=8, means=[[2.0, 0.0], [-2.0, 0.0]],
            weights=[1.0, 1.0], scale=0.3)
        sched = EDMScheduler()
        x0 = jax.random.normal(key2, (64, 2)) * sched.maximum_scale
        orc_fn = jax.jit(lambda x: picard_window_sample(
            sched, x, mog.gradlogprob, nsteps=S, window=W, tol=1e-3,
            return_sweeps=True))
        _, sweeps_o = orc_fn(x0)
        out["picard_oracle_sweeps"] = int(sweeps_o)
        out["picard_oracle_par_ms"] = time_fn(
            lambda: orc_fn(x0), lambda o: float(jnp.sum(o[0])),
            steps=3, warmup=2) * 1e3
        seq_orc = jax.jit(lambda x: sched.propagate_backward(
            jax.random.PRNGKey(0), x, mog.gradlogprob, S,
            integrator="euler"))
        out["picard_oracle_seq_ms"] = time_fn(
            lambda: seq_orc(x0), lambda o: float(jnp.sum(o)),
            steps=3, warmup=2) * 1e3
        return out

    arms["picard"] = picard

    def fewnfe():
        m, vs = _sampler_model()
        key2 = jax.random.PRNGKey(1)
        out = {}
        for nfe, integ in ((18, "heun"), (4, "euler"), (2, "euler")):
            fn = jax.jit(lambda v, k, n=nfe, it=integ: m.sample(
                v, k, 4, (28, 28, 1), nsteps=n, integrator=it))
            out[f"sample_{nfe}step_{integ}_ms"] = time_fn(
                lambda: fn(vs, key2), lambda o: float(jnp.sum(o)),
                steps=5, warmup=2) * 1e3
        return out

    arms["fewnfe"] = fewnfe

    def convergence(tag, tx=None, s2d=1, ema_every=1, cfg_name="mnist",
                    lr=3e-4, steps=2000, n_data=512, dataset="blobs"):
        """Train 2000 scanned steps on deterministic synthetic blobs;
        gate lever adoption on the deterministic fixed-sigma validation
        loss: a lever only becomes a default if it matches the baseline
        within noise. lr=3e-4: the default 1e-3 diverges on this toy by
        step ~1000 at BOTH configs (docs/artifacts/perf_lab_r4.json),
        which would gate on garbage."""
        from diffsci_tpu.models import (create_train_state, make_train_step,
                                        EMATracker)
        from diffsci_tpu.models.karras.train import default_optimizer
        if tx is None:
            tx = default_optimizer(lr)
        model, c = lab.model_for(cfg_name, s2d)
        H = c["spatial"][0]
        batch = 128
        shape = (batch,) + tuple(c["spatial"]) + (1,)
        if dataset == "shapes":
            # harder gate data (VERDICT r4 #7): the reference's shapes
            # distribution (train-diffusion-shapes.py) — hard edges +
            # multi-object composition, unlike the smooth blobs
            from diffsci_tpu.data import ShapesDataset
            data = ShapesDataset(n_data, size=H,
                                 mode="paper_replica").generate()
            data = np.asarray(data, np.float32)
        else:
            rng = np.random.default_rng(0)
            yy, xx2 = np.mgrid[0:H, 0:H].astype(np.float32)
            cx = rng.uniform(8, H - 8, size=(n_data, 1, 1))
            cy = rng.uniform(8, H - 8, size=(n_data, 1, 1))
            r = rng.uniform(3, 6, size=(n_data, 1, 1))
            data = ((np.exp(-(((xx2 - cx) ** 2 + (yy - cy) ** 2)
                              / (2 * r ** 2))) * 2 - 1)[..., None]
                    .astype(np.float32))
        tracker = EMATracker(ema_type="power", power_function_stds=[0.05],
                             update_every=ema_every)
        state, tx_built = create_train_state(
            model, jax.random.PRNGKey(0), shape, optimizer=tx, ema=tracker)
        from diffsci_tpu.models import make_train_scan
        scan = make_train_scan(model, tx_built, ema=tracker)
        key = jax.random.PRNGKey(42)
        # 2000 steps in 40-step scanned dispatches: long enough for the
        # arms to approach their asymptote (300 python-dispatched steps
        # measured early-transient differences only), cheap enough to run
        # per-arm (~40s device time at the mnist config).
        STEPS, CHUNK = steps, 40
        losses = []
        i = 0
        for _ in range(STEPS // CHUNK):
            keys = []
            xs = []
            for _ in range(CHUNK):
                key, sub = jax.random.split(key)
                keys.append(sub)
                lo = (i * batch) % (n_data - 128)
                xs.append(data[lo:lo + batch])
                i += 1
            state, ms = scan(state, jnp.stack(keys),
                             jnp.asarray(np.stack(xs)))
            losses.extend(np.asarray(ms["train_loss"]).tolist())
        tail = float(np.mean(losses[-200:]))
        # Fixed-sigma validation denoising loss: evaluated with one FIXED
        # key on a FIXED held-out batch over a FIXED log-spaced sigma grid
        # — deterministic given the trained params, so arms are comparable
        # (the raw 30-step tail loss spreads ~10x across bit-identical
        # trajectories because EDM per-step loss depends on the sigma
        # draw; see docs/artifacts/perf_lab_r4.json).
        val = jnp.asarray(data[n_data - 128:n_data - 64])
        sig_grid = jnp.exp(jnp.linspace(np.log(0.02), np.log(20.0), 8))
        kfix = jax.random.PRNGKey(123)
        vloss = 0.0
        eval_loss = jax.jit(lambda v, k, s: model.loss_fn(
            v, k, val, jnp.full((val.shape[0],), s), train=False)[0])
        vs = state.variables()
        for s in sig_grid:
            vloss += float(eval_loss(vs, kfix, s))
        vloss /= len(sig_grid)
        return {f"conv_{tag}_loss2k": round(tail, 5),
                f"conv_{tag}_fixed_sigma_val": round(vloss, 5)}

    arms["conv_f32"] = lambda: convergence("f32")
    arms["conv_mubf16"] = lambda: convergence(
        "mubf16", tx=default_optimizer(3e-4, mu_dtype=jnp.bfloat16))
    arms["conv_ema4"] = lambda: convergence("ema4", ema_every=4)
    arms["conv_s2d"] = lambda: convergence("s2d", s2d=2)
    arms["conv_levers"] = lambda: convergence(
        "levers", tx=default_optimizer(3e-4, mu_dtype=jnp.bfloat16),
        s2d=2, ema_every=4)
    # gate for the landed cifar-config lever: s2d=2 at 32x32 (even levels)
    arms["conv_cifar_f32"] = lambda: convergence(
        "cifar_f32", cfg_name="cifar")
    arms["conv_cifar_s2d"] = lambda: convergence(
        "cifar_s2d", s2d=2, cfg_name="cifar")
    # equal-WALL-CLOCK comparison: s2d trains 2.32x more steps/sec
    # (docs/artifacts/perf_lab_r4.json), so give it 2.32x the steps
    arms["conv_cifar_f32_eqwall"] = lambda: convergence(
        "cifar_f32_eqwall", cfg_name="cifar", steps=2000, n_data=2048)
    arms["conv_cifar_s2d_eqwall"] = lambda: convergence(
        "cifar_s2d_eqwall", s2d=2, cfg_name="cifar", steps=4640,
        n_data=2048)
    # r5 gate (VERDICT r4 #7): re-pin the s2d equal-wall-clock decision on
    # the harder shapes distribution at the CIFAR config — the r4 gate
    # dataset was 448 smooth blobs, conceded "may not transfer"
    arms["conv_cifar_shapes_f32_eqwall"] = lambda: convergence(
        "cifar_shapes_f32_eqwall", cfg_name="cifar", steps=2000,
        n_data=2048, dataset="shapes")
    arms["conv_cifar_shapes_s2d_eqwall"] = lambda: convergence(
        "cifar_shapes_s2d_eqwall", s2d=2, cfg_name="cifar", steps=4640,
        n_data=2048, dataset="shapes")
    return arms


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    lab = Lab()
    arms = make_arms(lab)
    if args.list:
        print("\n".join(arms))
        return
    names = args.only or list(arms)
    results = {}
    for name in names:
        try:
            v = arms[name]()
        except Exception as e:  # keep emitting the remaining arms
            msg = f"ERROR: {type(e).__name__}: {e}"
            results[name] = msg
            print(json.dumps({name: msg.splitlines()[0][:200]}), flush=True)
            continue
        if isinstance(v, dict):
            for k, vv in v.items():
                results[k] = vv
                _emit(k, vv)
        else:
            results[name] = v
            _emit(name, v)
    results = {k: (round(v, 2) if isinstance(v, float) else v)
               for k, v in results.items()}
    results["device"] = str(lab.jax.devices()[0])
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
