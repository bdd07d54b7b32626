"""KarrasModel: the EDM denoiser runtime — loss, preconditioned denoiser,
score, jitted scan sampling, inpainting, interpolation, latent-space wiring.

TPU-native redesign of the reference KarrasModule (reference
diffsci/models/karras/karrasmodule.py:29-1278). The Lightning god-object is
split idiomatically:

- ``KarrasModelConfig``: the math configuration (preconditioner + noise
  sampler + scheduler + loss metric) with the reference's factory presets
  and tag serialization (karrasmodule.py:96-365).
- ``KarrasNet``: a flax umbrella module bundling the score network with the
  optional DynamicLossWeight MLP and EDM batch norm so all trainable state
  lives in one pytree.
- ``KarrasModel``: *pure* methods taking ``variables`` explicitly —
  ``loss_fn``, ``get_denoiser``, ``get_score``, ``sample``, ``inpaint`` —
  every one jit/grad/vmap-safe. Sampling uses the scheduler's lax.scan
  propagation; repeated calls with the same static configuration hit an
  internal jit cache.

Randomness is explicit: every stochastic entry point takes a PRNG key.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from diffsci_tpu.utils import (bcast_right, dict_map, dict_expand_dims,
                               linear_interpolation, get_minibatch_sizes)
from diffsci_tpu.ops import (preconditioners, noise_samplers, schedulers,
                             integrators as integrators_lib)
from diffsci_tpu.ops import losses as losses_lib
from diffsci_tpu.ops.batchnorm import DimensionAgnosticBatchNorm


import dataclasses


@dataclasses.dataclass(frozen=True)
class IntervalGuidance:
    """CFG restricted to a noise-level band (beyond parity; Kynkäänniemi
    et al., arXiv:2404.07724): pass anywhere a ``guidance`` float goes —
    ``sample(..., guidance=IntervalGuidance(2.5, 0.3, 5.0))`` — and the
    guidance scale applies only for sigma in [sigma_lo, sigma_hi]
    (effective scale 1 elsewhere). Frozen/hashable, so it participates
    in the jitted-sampler cache key like a plain float."""
    scale: float
    sigma_lo: float
    sigma_hi: float


class KarrasModelConfig:
    """Math configuration (karrasmodule.py:29-401)."""

    def __init__(self,
                 preconditioner: preconditioners.KarrasPreconditioner,
                 noisesampler: noise_samplers.NoiseSampler,
                 noisescheduler: schedulers.Scheduler,
                 loss_metric: str | dict[str, Any] = "huber",
                 tag: str = "custom",
                 has_edm_batch_norm: bool = False,
                 dynamic_loss_weight: int | None = None,
                 extra_args: dict[str, Any] | None = None,
                 autoregressive_loss_steps: int = 1,
                 autoregressive_loss_diffusion_steps: int = 100,
                 autoregressive_loss_guidance: float = 1.0,
                 autoregressive_loss_weights: list[float] | None = None,
                 autoregressive_loss_maximum_batch_size: int | None = None,
                 autoregressive_loss_integrator=None,
                 spatial_shape: tuple | None = None,
                 focus_radius: float | None = None):
        self.preconditioner = preconditioner
        self.noisesampler = noisesampler
        self.noisescheduler = noisescheduler
        self.loss_metric = loss_metric
        self.tag = tag
        self.has_edm_batch_norm = has_edm_batch_norm
        self.dynamic_loss_weight = dynamic_loss_weight
        self.autoregressive_loss_steps = autoregressive_loss_steps
        self.autoregressive_loss_diffusion_steps = \
            autoregressive_loss_diffusion_steps
        self.autoregressive_loss_guidance = autoregressive_loss_guidance
        self.autoregressive_loss_weights = autoregressive_loss_weights
        self.autoregressive_loss_maximum_batch_size = \
            autoregressive_loss_maximum_batch_size
        self.autoregressive_loss_integrator = autoregressive_loss_integrator
        self.spatial_shape = spatial_shape
        self.focus_radius = focus_radius
        self.extra_args = extra_args if extra_args is not None else {}

    # -- factory presets (karrasmodule.py:96-341) --
    @classmethod
    def from_edm(cls, sigma_data: float = 0.5, prior_mean: float = -1.2,
                 prior_std: float = 1.2, **kwargs):
        extra = dict(sigma_data=sigma_data, prior_mean=prior_mean,
                     prior_std=prior_std, **_ar_extra(kwargs))
        return cls(
            preconditioner=preconditioners.EDMPreconditioner(sigma_data),
            noisesampler=noise_samplers.EDMNoiseSampler(
                sigma_data, prior_mean, prior_std),
            noisescheduler=schedulers.EDMScheduler(),
            tag="edm", extra_args=extra, **kwargs)

    @classmethod
    def from_vp(cls, beta_data: float = 19.9, beta_min: float = 0.1,
                epsilon_min: float = 1e-3, epsilon_sampler: float = 1e-5,
                M: int = 1000, **kwargs):
        sched = schedulers.VPScheduler(epsilon_min=epsilon_min,
                                       beta_data=beta_data,
                                       beta_min=beta_min)
        extra = dict(beta_data=beta_data, beta_min=beta_min,
                     epsilon_min=epsilon_min, epsilon_sampler=epsilon_sampler,
                     M=M, **_ar_extra(kwargs))
        return cls(
            preconditioner=preconditioners.VPPreconditioner(
                scheduling=sched.scheduling, M=M),
            noisesampler=noise_samplers.VPNoiseSampler(
                scheduling=sched.scheduling, epsilon=epsilon_sampler),
            noisescheduler=sched, tag="vp", extra_args=extra, **kwargs)

    @classmethod
    def from_ve(cls, sigma_min: float = 0.02, sigma_max: float = 100.0,
                **kwargs):
        extra = dict(sigma_min=sigma_min, sigma_max=sigma_max,
                     **_ar_extra(kwargs))
        return cls(
            preconditioner=preconditioners.VEPreconditioner(),
            noisesampler=noise_samplers.VENoiseSampler(sigma_min, sigma_max),
            noisescheduler=schedulers.VEScheduler(sigma_min, sigma_max),
            tag="ve", extra_args=extra, **kwargs)

    @classmethod
    def conditional_sr3(cls, sigma_min: float = 0.02, sigma_max: float = 100.0,
                        sigma_data: float = 0.5, **kwargs):
        extra = dict(sigma_min=sigma_min, sigma_max=sigma_max,
                     sigma_data=sigma_data, **_ar_extra(kwargs))
        return cls(
            preconditioner=preconditioners.SR3Preconditioner(sigma_data),
            noisesampler=noise_samplers.EDMNoiseSampler(sigma_data),
            noisescheduler=schedulers.EDMScheduler(sigma_min=sigma_min,
                                                   sigma_max=sigma_max),
            tag="conditionalSR3", extra_args=extra, **kwargs)

    def export_description(self) -> dict[str, Any]:
        return dict(tag=self.tag, extra_args=self.extra_args)

    @classmethod
    def load_from_description_with_tag(cls, description: dict[str, Any]):
        tag = description["tag"]
        extra = description["extra_args"]
        if tag == "custom":
            raise ValueError("Cannot load from a custom tag")
        factory = {"edm": cls.from_edm, "vp": cls.from_vp,
                   "ve": cls.from_ve,
                   "conditionalSR3": cls.conditional_sr3}.get(tag)
        if factory is None:
            raise ValueError(f"Unknown tag: {tag}")
        return factory(**extra)

    @property
    def has_dynamic_loss_weight(self):
        return self.dynamic_loss_weight is not None

    def update_loss_metric(self, loss_config):
        self.loss_metric = loss_config
        if "loss_metric" in self.extra_args:
            self.extra_args["loss_metric"] = loss_config


def _ar_extra(kwargs: dict) -> dict:
    keys = [k for k in kwargs if k.startswith("autoregressive_")
            or k in ("loss_metric", "spatial_shape", "focus_radius")]
    return {k: kwargs[k] for k in keys}


class DynamicLossWeight(nn.Module):
    """Fourier-feature learned lambda-modifier, EDM2-style
    (karrasmodule.py:1256-1278)."""
    nhidden: int
    scale: float = 1.0

    @nn.compact
    def __call__(self, cnoise):
        W = self.variable(
            "buffers", "fourier_weights",
            lambda: jax.random.normal(self.make_rng("params"),
                                      (self.nhidden,)) * self.scale)
        b = self.variable(
            "buffers", "fourier_bias",
            lambda: jax.random.uniform(self.make_rng("params"),
                                       (self.nhidden,)) * self.scale)
        h = jnp.cos(cnoise[:, None] * W.value + b.value)
        return nn.Dense(1)(h)[:, 0]


class KarrasNet(nn.Module):
    """Umbrella module: score network + optional DynamicLossWeight + EDM
    batch norm, so one variables pytree holds everything trainable."""
    model: nn.Module
    dynamic_loss_weight: int | None = None
    edm_batch_norm_sigma: float | None = None

    def setup(self):
        if self.dynamic_loss_weight is not None:
            self.dlw = DynamicLossWeight(self.dynamic_loss_weight)
        if self.edm_batch_norm_sigma is not None:
            self.bnorm = DimensionAgnosticBatchNorm(
                sigma=self.edm_batch_norm_sigma)

    def __call__(self, x, cnoise, y=None, train: bool = False):
        return self.model(x, cnoise, y, train=train)

    def loss_weight_modifier(self, cnoise):
        return self.dlw(cnoise)

    def bnorm_normalize(self, x, use_running_stats: bool = True):
        return self.bnorm(x, use_running_stats=use_running_stats)


class KarrasModel:
    """The denoiser runtime. All methods are pure in ``variables``.

    The score network follows the framework convention
    ``net(x, t, y=None, train=False)`` with channels-last x.
    """

    def __init__(self,
                 model: nn.Module,
                 config: KarrasModelConfig,
                 conditional: bool = False,
                 masked: bool = False,
                 autoencoder=None,
                 autoencoder_conditional: bool = False,
                 encode_y: bool = False,
                 decode_original_y: bool = False,
                 norm: float = 1.0,
                 compute_dtype=None,
                 fused_precondition: bool | str = "sample"):
        """``compute_dtype``: mixed precision for the network forward —
        parameters and activations are cast to this dtype (bfloat16 on TPU)
        inside get_denoiser while master params, the preconditioning math,
        and the loss stay float32.

        ``fused_precondition``: route the denoiser combine
        D = c_skip·x + c_out·F through the fused flat-view primitive
        (kernels/fused_precondition.py) instead of naive broadcast ops.
        TPU v5e measurements: 1.5-1.7x faster 18-NFE sampling (XLA pads
        channels-last C=1 layouts to 128 lanes; the primitive works on a
        flat [B, N] view, via a Pallas kernel when N tiles as [rows, 128]
        and a flat XLA fallback otherwise — see the kernel module
        docstring for the measured split), but ~6.5% slower training
        (the custom-VJP call is an XLA fusion barrier in the backward).
        Hence the default "sample": fused in no-grad paths (train=False),
        plain XLA in the training loss. True forces it everywhere, False
        disables. Falls back to XLA off-TPU either way."""
        self.model = model
        self.config = config
        self.compute_dtype = compute_dtype
        self.fused_precondition = fused_precondition
        self.conditional = conditional
        self.masked = masked
        self.autoencoder = autoencoder  # bound AE: .encode(x, key, y)/.decode
        self.autoencoder_conditional = autoencoder_conditional
        self.encode_y = encode_y
        self.decode_original_y = decode_original_y
        self.norm = norm
        self.net = KarrasNet(
            model=model,
            dynamic_loss_weight=config.dynamic_loss_weight,
            edm_batch_norm_sigma=(
                config.extra_args.get("sigma_data", 0.5)
                if config.has_edm_batch_norm else None))
        self._loss_metric = None
        self._multi_space = None
        self._set_loss_metric()
        self._jit_cache: dict = {}

    # ------------------------------------------------------------------
    @property
    def latent_model(self) -> bool:
        return self.autoencoder is not None

    def _set_loss_metric(self):
        cfg = self.config.loss_metric
        if isinstance(cfg, dict) and "losses" in cfg:
            decode_fn = (self.autoencoder.decode if self.autoencoder
                         else None)
            self._multi_space = losses_lib.MultiSpaceLoss(cfg, decode_fn)
            self._loss_metric = None
        else:
            self._loss_metric, self._loss_reduces = losses_lib.make_loss_metric(
                cfg, self.config.spatial_shape, self.config.focus_radius)

    # ------------------------------------------------------------------
    # init
    # ------------------------------------------------------------------
    def init(self, key, x_shape, y=None) -> dict:
        """Initialize all variables. ``x_shape`` includes the batch dim."""
        kp, kd = jax.random.split(key)
        x = jnp.zeros(x_shape, jnp.float32)
        sigma = jnp.ones((x_shape[0],), jnp.float32)
        cnoise = self.config.preconditioner.noise_conditioner(sigma)
        variables = self.net.init({"params": kp, "dropout": kd}, x, cnoise, y)
        if self.config.has_dynamic_loss_weight:
            extra = self.net.init({"params": kp, "dropout": kd}, cnoise,
                                  method=KarrasNet.loss_weight_modifier)
            variables = _merge_variables(variables, extra)
        if self.config.has_edm_batch_norm:
            extra = self.net.init({"params": kp}, x,
                                  method=KarrasNet.bnorm_normalize)
            variables = _merge_variables(variables, extra)
        return variables

    # ------------------------------------------------------------------
    # encode/decode (latent + batch norm + norm scale,
    # karrasmodule.py:1192-1234)
    # ------------------------------------------------------------------
    def encode(self, variables, x, y=None, key=None, train: bool = False):
        """Returns (x_latent, y[, mutable_updates]) — updates only when
        training with EDM batch norm."""
        updates = {}
        if self.latent_model:
            if self.autoencoder_conditional:
                if self.encode_y:
                    x, y = self.autoencoder.encode(x, key=key, y=y)
                else:
                    x = self.autoencoder.encode(x, key=key, y=y)
            else:
                x = self.autoencoder.encode(x, key=key)
        if self.config.has_edm_batch_norm:
            if train:
                x, updates = self.net.apply(
                    variables, x, use_running_stats=False,
                    method=KarrasNet.bnorm_normalize,
                    mutable=["batch_stats"])
            else:
                x = self.net.apply(variables, x,
                                   method=KarrasNet.bnorm_normalize)
        x = x / self.norm
        return x, y, updates

    def decode(self, variables, x, y=None, record_history: bool = False):
        if record_history:
            return jax.vmap(lambda xx: self.decode(variables, xx, y))(x)
        x = x * self.norm
        if self.config.has_edm_batch_norm:
            bnorm = DimensionAgnosticBatchNorm(
                sigma=self.config.extra_args.get("sigma_data", 0.5))
            bn_vars = {"batch_stats":
                       variables["batch_stats"]["bnorm"]}
            if "params" in variables and "bnorm" in variables["params"]:
                bn_vars["params"] = variables["params"]["bnorm"]
            x = bnorm.unnormalize(bn_vars, x)
        if self.latent_model:
            if self.autoencoder_conditional:
                x = self.autoencoder.decode(x, y=y)
            else:
                x = self.autoencoder.decode(x)
        return x

    # ------------------------------------------------------------------
    # denoiser & score (karrasmodule.py:673-733)
    # ------------------------------------------------------------------
    def get_denoiser(self, variables, x, sigma, y=None, guidance: float = 1.0,
                     train: bool = False, rngs=None,
                     guidance_interval=None):
        """D(x; sigma) = c_skip x + c_out F(c_in x, c_noise, y), with
        classifier-free guidance when guidance != 1 (karrasmodule.py:705-713).
        Returns (denoiser, cond_noise).

        ``guidance_interval`` (beyond parity): a ``(sigma_lo, sigma_hi)``
        pair restricting CFG to that noise-level band — outside it the
        effective guidance is 1 (the plain conditional denoiser).
        Applying guidance only at intermediate sigmas improves sample
        and distribution quality at equal guidance strength
        (Kynkäänniemi et al., arXiv:2404.07724). Implemented as a
        per-row blend so a batched sigma vector spanning the boundary
        still takes one fused network call pair. Passing an
        ``IntervalGuidance`` as ``guidance`` sets both at once (works
        through every sampling entry point)."""
        if isinstance(guidance, IntervalGuidance):
            guidance_interval = (guidance.sigma_lo, guidance.sigma_hi)
            guidance = guidance.scale
        pre = self.config.preconditioner
        c_skip_vec = pre.skip_scaling(sigma)
        c_out_vec = pre.output_scaling(sigma)
        c_skip = bcast_right(c_skip_vec, x)
        c_out = bcast_right(c_out_vec, x)
        c_in = bcast_right(pre.input_scaling(sigma), x)
        cnoise = pre.noise_conditioner(sigma)
        scaled = c_in * x

        cd = self.compute_dtype
        if cd is not None:
            # mixed precision: bf16 network forward, f32 everything else.
            # The param cast is loop-invariant, so XLA hoists it out of
            # sampling scans; autodiff through the cast yields f32 grads.
            def cast(p):
                return (p.astype(cd)
                        if jnp.issubdtype(p.dtype, jnp.floating) else p)
            variables = jax.tree.map(cast, variables)
            scaled = scaled.astype(cd)
            cnoise_in = cnoise.astype(cd)
            y = dict_map(
                lambda v: v.astype(cd)
                if jnp.issubdtype(v.dtype, jnp.floating) else v, y)
        else:
            cnoise_in = cnoise

        def net_fwd(yy):
            out = self.net.apply(variables, scaled, cnoise_in, yy,
                                 train=train, rngs=rngs)
            return out.astype(jnp.float32) if cd is not None else out

        if self.conditional and guidance != 0.0:
            base = net_fwd(y)
            if guidance != 1.0:
                uncond = net_fwd(None)
                # g matches base.dtype so the plain-float guided blend
                # never upcasts the network output (a strongly-typed f32
                # scalar would promote a bf16 `base` to f32)
                g = jnp.asarray(guidance, base.dtype)
                if guidance_interval is not None:
                    lo, hi = guidance_interval
                    sig = jnp.asarray(sigma, base.dtype)
                    in_band = jnp.logical_and(sig >= lo, sig <= hi)
                    g = bcast_right(jnp.where(in_band, g,
                                              jnp.ones((), base.dtype)), x)
                base = (1.0 - g) * uncond + g * base
        else:
            base = net_fwd(None)
        use_fused = (self.fused_precondition is True
                     or (self.fused_precondition == "sample" and not train))
        if use_fused:
            from diffsci_tpu.kernels import fused_precondition as fp
            return fp.denoise_combine(x, base, c_skip_vec,
                                      c_out_vec), cnoise
        return c_out * base + c_skip * x, cnoise

    def get_score(self, variables, x, sigma, y=None, guidance: float = 1.0):
        denoiser, _ = self.get_denoiser(variables, x, sigma, y, guidance)
        sigma_ = bcast_right(sigma, x)
        return (denoiser - x) / (sigma_ ** 2)

    def sample_parallel(self, variables, key, nsamples: int, shape,
                        y=None, guidance: float = 1.0, nsteps: int = 100,
                        window: int = 16, tol: float = 1e-3,
                        stochastic: bool = False,
                        return_sweeps: bool = False):
        """Parallel-in-time deterministic sampling (sliding-window Picard,
        ParaDiGMS — ops/parallel_sampling.py): each sweep is ONE denoiser
        call of batch window*nsamples instead of a serial step, and the
        frontier advances several steps per sweep where the ODE is smooth
        — measured 3-5x fewer serial calls at nsteps>=64 on the analytic
        MoG oracle (tests). Measured caveat (r5): on a TRAINED shapes
        model the frontier advanced ~1 step/sweep at tol=1e-3 — no
        serial saving, and the window*B batch cost wall-clock on a
        saturated chip (docs/artifacts/picard_restart_trained_r5.json).
        Use only when latency matters AND throughput is spare (small
        nsamples on a big chip), and validate the sweep count on your
        model. ``tol=0`` reproduces sequential Euler exactly. Latent
        models: sample in pixel space is unsupported here — use
        ``sample`` (beyond parity; the reference has no parallel-in-time
        sampler)."""
        if self.latent_model:
            raise NotImplementedError(
                "sample_parallel operates in the diffusion space; "
                "latent models need sample()")
        from diffsci_tpu.ops.parallel_sampling import picard_window_sample
        # same key-splitting convention as sample(): the same key draws
        # the same initial noise on both paths
        knoise, _, kprop = jax.random.split(key, 3)
        x = jax.random.normal(knoise, (nsamples,) + tuple(shape))
        x = x * self.config.noisescheduler.maximum_scale

        def score_fn(xt, sigma):
            return self.get_score(variables, xt, sigma, y, guidance)

        return picard_window_sample(
            self.config.noisescheduler, x, score_fn, nsteps=nsteps,
            window=window, tol=tol, stochastic=stochastic, key=kprop,
            return_sweeps=return_sweeps)

    # ------------------------------------------------------------------
    # loss (karrasmodule.py:569-650)
    # ------------------------------------------------------------------
    def loss_fn(self, variables, key, x, sigma, y=None, mask=None,
                train: bool = True, eps=None):
        """EDM training loss. Returns (loss, mutable_updates).

        ``eps`` replays a fixed unit-noise draw in place of the key's
        (reproducibility hook; the cross-framework loss parity tests use
        it to feed the same noise to the reference's
        karrasmodule.py:590-592 and to this function)."""
        knoise, kdrop, kenc = jax.random.split(key, 3)
        x_pixel = x
        mask_pixel = mask

        x_latent, y, updates = self.encode(variables, x, y, key=kenc,
                                           train=train)
        sigma_b = bcast_right(sigma, x_latent)
        if eps is None:
            eps = jax.random.normal(knoise, x_latent.shape, x_latent.dtype)
        noise = sigma_b * eps
        x_noised = x_latent + noise
        rngs = {"dropout": kdrop} if train else None
        denoiser, cnoise = self.get_denoiser(variables, x_noised, sigma, y,
                                             train=train, rngs=rngs)

        weight = self.config.noisesampler.loss_weighting(sigma_b)
        bias = jnp.zeros_like(weight)
        if self.config.has_dynamic_loss_weight:
            modifier = self.net.apply(variables, cnoise,
                                      method=KarrasNet.loss_weight_modifier)
            modifier = bcast_right(modifier, x_latent)
            weight = weight / jnp.exp(modifier)
            bias = bias + modifier

        if self._multi_space is not None:
            res = self._multi_space.compute_loss(
                denoiser_latent=denoiser, target_latent=x_latent,
                target_pixel=x_pixel, mask_latent=mask,
                mask_pixel=mask_pixel)
            total = res["total"]
            if jnp.ndim(total) == 0:
                loss = jnp.mean(weight) * total + jnp.mean(bias)
            else:
                loss = self._apply_mask_weight(total, weight, bias, mask)
        else:
            raw = self._loss_metric(denoiser, x_latent, mask)
            if self._loss_reduces or jnp.ndim(raw) == 0:
                loss = jnp.mean(weight) * raw + jnp.mean(bias)
            else:
                loss = self._apply_mask_weight(raw, weight, bias, mask)
        return loss, updates

    @staticmethod
    def _apply_mask_weight(loss, weight, bias, mask):
        if mask is not None:
            loss = loss * (1.0 - jnp.broadcast_to(mask, loss.shape))
        return jnp.mean(weight * loss + bias)

    # ------------------------------------------------------------------
    # sampling (karrasmodule.py:801-931)
    # ------------------------------------------------------------------
    def sample(self, variables, key, nsamples: int, shape, y=None,
               guidance: float = 1.0, nsteps: int = 100,
               record_history: bool = False,
               maximum_batch_size: int | None = None,
               integrator=None, stochastic: bool = False,
               is_latent_shape: bool = False,
               return_in_latent_space: bool = False,
               mesh=None, langevin_scale=None):
        """Generate samples from white noise. ``shape`` is channels-last
        without the batch dim (e.g. (28, 28, 1)).

        ``mesh``: a jax Mesh with a 'data' axis — shards the sample batch
        over it (data-parallel sampling: the TPU analogue of the
        reference's multi-GPU process-pool eval,
        stochasticity_paper/scripts/test-diffusion-cifar10karras-colormap-
        parallel.py:1-44). The noise is generated from the same key as the
        single-device path, so DP sampling == single-device sampling up to
        float reassociation; ``nsamples`` must be divisible by the data
        axis size.

        ``langevin_scale``: traced scalar multiplying the scheduler's
        Langevin gate (stochastic sampling only). With
        ``langevin_const=1`` this IS gamma — as a runtime argument, so a
        gamma sweep runs from ONE compiled executable instead of
        retracing the sampling scan per point."""
        if mesh is not None and nsamples % mesh.shape["data"] != 0:
            raise ValueError(
                f"nsamples={nsamples} not divisible by data axis size "
                f"{mesh.shape['data']}")
        if maximum_batch_size is not None:
            outs = []
            for bs in get_minibatch_sizes(nsamples, maximum_batch_size):
                key, sub = jax.random.split(key)
                outs.append(self.sample(
                    variables, sub, bs, shape, y, guidance, nsteps,
                    record_history, None, integrator, stochastic,
                    is_latent_shape, return_in_latent_space, mesh,
                    langevin_scale))
            return jnp.concatenate(outs, axis=1 if record_history else 0)

        fn = self._jitted_sampler(
            nsamples, tuple(shape), guidance, nsteps, record_history,
            self._integrator_key(integrator), stochastic, is_latent_shape,
            return_in_latent_space, y is not None, mesh,
            langevin_scale is not None)
        if langevin_scale is not None:
            return fn(variables, key, y, jnp.float32(langevin_scale))
        return fn(variables, key, y)

    def _integrator_key(self, integrator):
        if integrator is None:
            return None
        if isinstance(integrator, str):
            return integrator
        return integrator  # frozen dataclass: hashable

    def _jitted_sampler(self, nsamples, shape, guidance, nsteps,
                        record_history, integrator, stochastic,
                        is_latent_shape, return_latent, has_y, mesh=None,
                        has_langevin_scale=False):
        cache_key = ("sample", nsamples, shape, guidance, nsteps,
                     record_history, integrator, stochastic, is_latent_shape,
                     return_latent, has_y, mesh, has_langevin_scale)
        if cache_key not in self._jit_cache:
            def shard_batch(x):
                # constrain the batch axis onto the mesh 'data' axis; the
                # whole sampling scan then shards batch-wise under GSPMD
                if mesh is None:
                    return x
                from jax.sharding import NamedSharding, PartitionSpec
                spec = PartitionSpec("data", *([None] * (x.ndim - 1)))
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, spec))

            def impl(variables, key, y, langevin_scale=None):
                knoise, kenc, kprop = jax.random.split(key, 3)
                x = shard_batch(jax.random.normal(knoise,
                                                  (nsamples,) + shape))
                original_y = y
                if self.latent_model and not is_latent_shape:
                    if self.encode_y:
                        x, y2, _ = self.encode(variables, x, y, key=kenc)
                        y = dict_map(lambda v: v[0] if v.shape[0] == 1 else v,
                                     y2)
                    else:
                        x, _, _ = self.encode(variables, x, y, key=kenc)
                    x = shard_batch(jax.random.normal(kenc, x.shape,
                                                      x.dtype))
                return self._propagate_white_noise_impl(
                    variables, kprop, x, y, guidance, nsteps, record_history,
                    integrator, stochastic,
                    original_y if self.decode_original_y else None,
                    return_latent, gate_scale=langevin_scale)
            self._jit_cache[cache_key] = jax.jit(impl)
        return self._jit_cache[cache_key]

    def sample_restart(self, variables, key, nsamples: int, shape,
                       y=None, guidance: float = 1.0, nsteps: int = 18,
                       restarts=((0.05, 2.0, 2),)):
        """Restart sampling (Xu et al., arXiv:2306.14878; beyond parity
        — see Scheduler.restart_propagate_backward): deterministic ODE
        segments with K coordinated re-noise jumps per
        ``(sigma_lo, sigma_hi, K)`` interval — beats both plain ODE and
        per-step SDE noise at matched NFE on the paper's benchmarks.
        Same key convention as ``sample``; diffusion-space only (latent
        models: use ``sample``)."""
        if self.latent_model:
            raise NotImplementedError(
                "sample_restart operates in the diffusion space; latent "
                "models need sample()")
        knoise, _, kprop = jax.random.split(key, 3)
        x = jax.random.normal(knoise, (nsamples,) + tuple(shape))
        x = x * self.config.noisescheduler.maximum_scale

        def score_fn(xt, sigma):
            return self.get_score(variables, xt, sigma, y, guidance)

        return self.config.noisescheduler.restart_propagate_backward(
            kprop, x, score_fn, nsteps, restarts=restarts)

    def _propagate_white_noise_impl(self, variables, key, x, y, guidance,
                                    nsteps, record_history, integrator,
                                    stochastic, original_y, return_latent,
                                    gate_scale=None, noise_seq=None):
        x = x * self.config.noisescheduler.maximum_scale
        result = self.propagate_toward_sample(
            variables, key, x, y, guidance, nsteps, record_history,
            integrator, stochastic, gate_scale=gate_scale,
            noise_seq=noise_seq)
        if not return_latent:
            result = self.decode(variables, result,
                                 original_y if original_y is not None else y,
                                 record_history)
        return result

    def propagate_white_noise(self, variables, key, x, y=None,
                              guidance: float = 1.0, nsteps: int = 100,
                              record_history: bool = False, integrator=None,
                              stochastic: bool = False,
                              return_in_latent_space: bool = False,
                              noise_seq=None):
        """(karrasmodule.py:867-905) — x is already white noise (unscaled).

        ``noise_seq`` ([nsteps, *x.shape]): replace the stochastic
        integrators' in-scan draws with a provided sequence — used for
        parity replays and for per-request noise isolation under
        cross-request serving batching (serving.py)."""
        return self._propagate_white_noise_impl(
            variables, key, x, y, guidance, nsteps, record_history,
            integrator, stochastic, None,
            return_in_latent_space or not self.latent_model,
            noise_seq=noise_seq)

    def propagate_toward_sample(self, variables, key, x, y=None,
                                guidance: float = 1.0, nsteps: int = 100,
                                record_history: bool = False,
                                integrator=None, stochastic: bool = False,
                                gate_scale=None, noise_seq=None):
        """Backward propagation with the learned score
        (karrasmodule.py:907-931)."""
        y = dict_expand_dims(y, 0) if _needs_unsqueeze(y, x) else y

        def score_fn(xx, sigma):
            return self.get_score(variables, xx, sigma, y, guidance)

        return self.config.noisescheduler.propagate_backward(
            key, x, score_fn, nsteps, record_history=record_history,
            stochastic=stochastic, integrator=integrator,
            gate_scale=gate_scale, noise_seq=noise_seq)

    def propagate_partial_toward_sample(self, variables, key, x,
                                        initial_step: int,
                                        final_step: int | None = None,
                                        y=None, nsteps: int = 100,
                                        record_history: bool = False,
                                        integrator=None,
                                        analytical_score=None,
                                        interp_fn=None,
                                        guidance: float = 1.0):
        """Partial backward propagation with optional analytic-score
        interpolation hook (karrasmodule.py:933-976)."""
        if final_step is None:
            final_step = nsteps

        def score_fn(xx, sigma):
            trained = self.get_score(variables, xx, sigma, y, guidance)
            if interp_fn is not None:
                assert analytical_score is not None
                alpha = bcast_right(interp_fn(sigma), xx)
                return alpha * trained + (1 - alpha) * analytical_score(
                    xx, sigma)
            return trained

        return self.config.noisescheduler.propagate_partial(
            key, x, score_fn, nsteps, initial_step, final_step,
            record_history=record_history, integrator=integrator)

    def propagate_toward_noise(self, variables, key, x, y=None,
                               nsteps: int = 100,
                               record_history: bool = False,
                               stochastic_integration: bool = False):
        """(karrasmodule.py:1094-1115)"""
        y = dict_expand_dims(y, 0) if _needs_unsqueeze(y, x) else y

        def score_fn(xx, sigma):
            return self.get_score(variables, xx, sigma, y)

        return self.config.noisescheduler.propagate_forward(
            key, x, score_fn, nsteps, record_history=record_history,
            stochastic=stochastic_integration)

    # ------------------------------------------------------------------
    # inpainting (karrasmodule.py:978-1092)
    # ------------------------------------------------------------------
    def inpaint(self, variables, key, x_orig, mask, y=None,
                nsteps: int = 100, record_history: bool = False,
                maximum_batch_size: int | None = None,
                mode: str = "inpaint", rsteps: int = 10,
                nresamples: int = 10):
        """Known-region-preserving generation. ``mask == 1`` marks the known
        region of ``x_orig``."""
        if maximum_batch_size is not None:
            outs = []
            n = x_orig.shape[0]
            start = 0
            for bs in get_minibatch_sizes(n, maximum_batch_size):
                key, sub = jax.random.split(key)
                outs.append(self.inpaint(
                    variables, sub, x_orig[start:start + bs], mask, y,
                    nsteps, record_history, None, mode, rsteps, nresamples))
                start += bs
            return jnp.concatenate(outs, axis=1 if record_history else 0)

        k1, k2, k3 = jax.random.split(key, 3)
        fwd_hist = self.propagate_toward_noise(
            variables, k1, x_orig, y=y, nsteps=nsteps, record_history=True,
            stochastic_integration=True)
        y_noised = fwd_hist[::-1]  # index k = backward grid time t[k]
        noise = (jax.random.normal(k2, x_orig.shape, x_orig.dtype)
                 * self.config.noisescheduler.maximum_scale)
        yb = dict_expand_dims(y, 0) if _needs_unsqueeze(y, x_orig) else y

        def score_fn(xx, sigma):
            return self.get_score(variables, xx, sigma, yb)

        if mode == "inpaint":
            return self.config.noisescheduler.inpaint(
                k3, noise, y_noised, mask, score_fn, nsteps,
                record_history=record_history)
        return self.config.noisescheduler.repaint(
            k3, noise, y_noised, mask, score_fn, nsteps, rsteps, nresamples,
            record_history=record_history)

    def repaint(self, variables, key, x_orig, mask, y=None, nsteps: int = 100,
                record_history: bool = False,
                maximum_batch_size: int | None = None,
                rsteps: int = 10, nresamples: int = 10):
        return self.inpaint(variables, key, x_orig, mask, y, nsteps,
                            record_history, maximum_batch_size,
                            mode="repaint", rsteps=rsteps,
                            nresamples=nresamples)

    # ------------------------------------------------------------------
    # interpolation & filtering (karrasmodule.py:735-799,1117-1144)
    # ------------------------------------------------------------------
    def interpolate_images(self, variables, key, x1, x2, ninterp: int,
                           jitter: float | None = 1e-2, y=None,
                           nsteps: int = 100, record_history: bool = False):
        x = jnp.stack([x1, x2], axis=0)
        kj, kn, ks = jax.random.split(key, 3)
        if jitter is not None:
            x = x + jitter * jax.random.normal(kj, x.shape, x.dtype)
        yb = dict_expand_dims(y, 0) if y is not None else None
        x_noised = self.propagate_toward_noise(variables, kn, x, yb, nsteps)
        x_interp = linear_interpolation(x_noised[0], x_noised[1], ninterp)
        return self.propagate_toward_sample(
            variables, ks, x_interp, y=yb, nsteps=nsteps,
            record_history=record_history)

    def sample_and_filter(self, variables, key, nsamples: int, shape,
                          filter_fn: Callable, y=None,
                          guidance: float = 1.0, nsteps: int = 100,
                          maximum_batch_size: int | None = None,
                          integrator=None,
                          return_only_positives: bool = False):
        """Sample then filter by a predicate on the encoded samples
        (karrasmodule.py:735-799). Returns dict(samples, filter, hit_rate)."""
        if maximum_batch_size is not None:
            samples, filters, num_pos = [], [], 0
            for bs in get_minibatch_sizes(nsamples, maximum_batch_size):
                key, sub = jax.random.split(key)
                res = self.sample_and_filter(
                    variables, sub, bs, shape, filter_fn, y, guidance,
                    nsteps, None, integrator, return_only_positives)
                samples.append(res["samples"])
                filters.append(res["filter"])
                num_pos += int(res["filter"].sum())
            return dict(samples=jnp.concatenate(samples, 0),
                        filter=jnp.concatenate(filters, 0),
                        hit_rate=num_pos / nsamples)
        key, sub, kenc = jax.random.split(key, 3)
        samples = self.sample(variables, sub, nsamples, shape, y=y,
                              guidance=guidance, nsteps=nsteps,
                              integrator=integrator)
        enc, _, _ = self.encode(variables, samples, y, key=kenc)
        filt = filter_fn(enc)
        if return_only_positives:
            samples = samples[filt]
            filt = filt[filt]
        return dict(samples=samples, filter=filt,
                    hit_rate=jnp.sum(filt) / nsamples)

    # ------------------------------------------------------------------
    def select_batch(self, batch):
        """(karrasmodule.py:1177-1190)"""
        if self.conditional and self.masked:
            x, y, mask = batch
        elif (not self.conditional) and self.masked:
            x, mask = batch
            y = None
        elif self.conditional and not self.masked:
            x, y = batch
            mask = None
        else:
            x, y, mask = batch, None, None
        return x, y, mask

    def export_description(self) -> dict[str, Any]:
        net_export = getattr(self.model, "export_description", None)
        return dict(config_description=self.config.export_description(),
                    conditional=self.conditional, masked=self.masked,
                    autoencoder=self.autoencoder is not None,
                    autoencoder_conditional=self.autoencoder_conditional,
                    encode_y=self.encode_y,
                    net=net_export() if net_export else None)


def _needs_unsqueeze(y, x) -> bool:
    """The reference unsqueezes sample-time conditions so they broadcast
    over the batch (karrasmodule.py:916-917); we only do so for plain
    arrays whose leading dim already matches the batch... conservative:
    only unsqueeze dicts/arrays when their first dim differs from batch."""
    if y is None:
        return False
    probe = y["y"] if isinstance(y, dict) and "y" in y else (
        next(iter(y.values())) if isinstance(y, dict) else y)
    return hasattr(probe, "shape") and (probe.ndim == 0 or
                                        probe.shape[0] != x.shape[0])


def _merge_variables(base: dict, extra: dict) -> dict:
    out = dict(base)
    for col, tree in extra.items():
        if col in out:
            merged = dict(out[col])
            merged.update(tree)
            out[col] = merged
        else:
            out[col] = tree
    return out


def karras_model_from_description(description: dict,
                                  conditional_embedding=None,
                                  autoencoder=None,
                                  **model_kwargs) -> "KarrasModel":
    """Rebuild a KarrasModel from a saved checkpoint description (the
    declarative counterpart of the reference loader's ``eval``-based
    reconstruction, loader.py:32). The net is rebuilt by its ``kind``
    tag through ``nets.describe.net_from_description`` (PUNetG, ADM,
    DiT, ConVit, HFNet, UNet2D and MLP families); descriptions written
    before ``kind`` existed rebuild as PUNetG, which is what they were.

    Raises clearly for what it cannot reconstruct from a description
    alone: a missing net entry (pre-round-2 checkpoints — re-export),
    a conditional embedding (pass the module via
    ``conditional_embedding``), and a bound autoencoder (pass it via
    ``autoencoder`` — AE weights live outside the diffusion TrainState).
    """
    from diffsci_tpu.models.nets.describe import net_from_description

    net_desc = description.get("net") or {}
    cfg_kwargs = net_desc.get("config", net_desc)
    if not cfg_kwargs:
        raise ValueError(
            "description has no net config (checkpoints saved before the "
            "descriptions became self-contained); rebuild the net "
            "explicitly or re-export the description")
    if net_desc.get("has_conditional_embedding")             and conditional_embedding is None:
        raise ValueError(
            "checkpoint was trained with a conditional embedding; pass "
            "the embedding module via conditional_embedding= (its config "
            "is in description['net']['conditional_embedding_args'])")
    if description.get("autoencoder") and autoencoder is None:
        raise ValueError(
            "checkpoint is a latent-diffusion model; pass the bound "
            "autoencoder via autoencoder= (its weights are not part of "
            "the diffusion TrainState)")
    net = net_from_description(net_desc,
                               conditional_embedding=conditional_embedding)
    kcfg = KarrasModelConfig.load_from_description_with_tag(
        description["config_description"])
    return KarrasModel(
        net, kcfg,
        conditional=description.get("conditional", False),
        masked=description.get("masked", False),
        encode_y=description.get("encode_y", False),
        autoencoder=autoencoder,
        **model_kwargs)
