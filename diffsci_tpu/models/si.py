"""Stochastic interpolants / flow matching: alpha(t) x + sigma(t) eps paths,
flow-field loss, flow<->score conversion, ODE/SDE integration, inpainting
with soft cosine masks and RePaint-style resampling.

TPU-native redesign of the reference SIModule
(reference diffsci/models/karras/flowfield.py:21-795). The Lightning module
becomes a functional model (pure methods over explicit variables); the
Python integration loop (flowfield.py:704-747) becomes a lax.scan with the
final Euler step split statically; the Euler-Maruyama noise-injection path
threads a PRNG key through the scan carry.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Literal

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from diffsci_tpu.utils import bcast_right, dict_expand_dims
from diffsci_tpu.ops.losses import huber as huber_loss
from diffsci_tpu.ops.batchnorm import (ConstantBatchNorm, IdentityBatchNorm,
                                       DimensionAgnosticBatchNorm)


@dataclasses.dataclass(frozen=True)
class SIScheduler:
    """Interpolation path x_t = alpha(t) x0 + sigma(t) eps
    (flowfield.py:21-112)."""
    alpha_fn: Callable
    sigma_fn: Callable
    alpha_fn_dot: Callable
    sigma_fn_dot: Callable
    sigma_fn_inv: Callable

    @classmethod
    def linear(cls):
        return cls(alpha_fn=lambda t: 1.0 - t,
                   sigma_fn=lambda t: 1.0 * t,
                   alpha_fn_dot=lambda t: -1.0 + 0.0 * t,
                   sigma_fn_dot=lambda t: 1.0 + 0.0 * t,
                   sigma_fn_inv=lambda s: 1.0 * s)

    @classmethod
    def cosine(cls):
        h = math.pi / 2
        return cls(alpha_fn=lambda t: jnp.cos(t * h),
                   sigma_fn=lambda t: jnp.sin(t * h),
                   alpha_fn_dot=lambda t: -h * jnp.sin(t * h),
                   sigma_fn_dot=lambda t: h * jnp.cos(t * h),
                   sigma_fn_inv=lambda s: jnp.arcsin(s) / h)

    @classmethod
    def finterpolation(cls, f, finv, fdot, sigma_min: float,
                       sigma_max: float):
        """Constant-alpha path interpolating f^-1(sigma) linearly
        (flowfield.py:57-83)."""
        lo, hi = finv(sigma_min), finv(sigma_max)

        def sigma_fn(t):
            return f((1 - t) * lo + t * hi)

        def sigma_fn_inv(s):
            return (finv(s) - lo) / (hi - lo)

        def sigma_fn_dot(t):
            return fdot((1 - t) * lo + t * hi) * (hi - lo)

        return cls(alpha_fn=lambda t: 1.0 + 0.0 * t,
                   sigma_fn=sigma_fn,
                   alpha_fn_dot=lambda t: 0.0 * t,
                   sigma_fn_dot=sigma_fn_dot,
                   sigma_fn_inv=sigma_fn_inv)

    @classmethod
    def edm(cls, exponent: float = 7.0, sigma_min: float = 0.02,
            sigma_max: float = 80.0):
        return cls.finterpolation(
            f=lambda x: x ** exponent,
            finv=lambda x: x ** (1 / exponent),
            fdot=lambda x: exponent * x ** (exponent - 1),
            sigma_min=sigma_min, sigma_max=sigma_max)

    @classmethod
    def get_interpolator(cls, name: str, **kwargs):
        factories = {"linear": cls.linear, "cosine": cls.cosine,
                     "edm": cls.edm, "finterpolation": cls.finterpolation}
        if name not in factories:
            raise ValueError(f"Invalid interpolator: {name}")
        return factories[name](**kwargs)


class SIModelConfig:
    """(flowfield.py:233-286)"""

    def __init__(self,
                 scheduler: SIScheduler | str = "linear",
                 scheduler_args: dict | None = None,
                 initial_norm: bool | float = False,
                 autonomous_flow: bool = False,
                 precondition_fn: Callable | str | None = None,
                 loss_weighting: str | dict = "uniform",
                 loss_metric: Literal["mse", "huber"] = "huber",
                 sigma_data: float = 0.5,
                 pmean: float = -1.2,
                 pstd: float = 1.2,
                 autoencoder_is_conditional: bool = False,
                 encode_condition: bool = False):
        if isinstance(scheduler, str):
            scheduler = SIScheduler.get_interpolator(
                scheduler, **(scheduler_args or {}))
        self.scheduler = scheduler
        self.initial_norm = initial_norm
        self.autonomous_flow = autonomous_flow
        self.precondition_fn = precondition_fn
        self.loss_weighting = loss_weighting
        self.loss_metric = loss_metric
        self.sigma_data = sigma_data
        self.pmean = pmean
        self.pstd = pstd
        self.autoencoder_is_conditional = autoencoder_is_conditional
        self.encode_condition = encode_condition


class SIModel:
    """Functional flow-matching runtime (flowfield.py:289-795)."""

    def __init__(self, model: nn.Module, config: SIModelConfig,
                 autoencoder=None, compute_dtype=None):
        """``compute_dtype``: mixed precision for the network forward —
        params and activations cast to this dtype (bfloat16 on TPU) while
        interpolation math and the loss stay float32 (same contract as
        KarrasModel)."""
        self.model = model
        self.config = config
        self.autoencoder = autoencoder
        self.compute_dtype = compute_dtype
        self.has_running_norm = False
        self._bnorm = None
        if isinstance(config.initial_norm, (float, int)) \
                and not isinstance(config.initial_norm, bool):
            self.initial_norm = ConstantBatchNorm(float(config.initial_norm))
        elif config.initial_norm:
            # running-stat initial norm (reference flowfield.py:233-286):
            # per-batch stats update the running mean/var during training;
            # sampling/inversion use the stored stats. Stats live in the
            # variables dict under batch_stats/initial_norm, same pattern
            # as KarrasModel's EDM batch norm.
            self.has_running_norm = True
            self._bnorm = DimensionAgnosticBatchNorm(sigma=config.sigma_data)
            self.initial_norm = None
        else:
            self.initial_norm = IdentityBatchNorm()
        if config.loss_metric == "mse":
            self._loss = lambda a, b: (a - b) ** 2
        elif config.loss_metric == "huber":
            self._loss = huber_loss
        else:
            raise ValueError(f"Invalid loss metric: {config.loss_metric}")
        self._jit_cache: dict = {}

    # ------------------------------------------------------------------
    def init(self, key, x_shape, y=None):
        kp, kd = jax.random.split(key)
        x = jnp.zeros(x_shape, jnp.float32)
        t = jnp.ones((x_shape[0],), jnp.float32)
        if self.config.autonomous_flow:
            variables = self.model.init({"params": kp, "dropout": kd}, x,
                                        y=y)
        else:
            variables = self.model.init({"params": kp, "dropout": kd}, x, t,
                                        y)
        if self.has_running_norm:
            bn = self._bnorm.init(kp, x)
            variables = dict(variables)
            stats = dict(variables.get("batch_stats", {}))
            stats["initial_norm"] = bn["batch_stats"]
            variables["batch_stats"] = stats
        return variables

    # ------------------------------------------------------------------
    # initial norm (flowfield.py:233-286)
    # ------------------------------------------------------------------
    def _norm_fwd(self, variables, x, train: bool):
        """normalize(x) -> (x, mutable_updates). With the running-stat
        norm, training batches update the running mean/var."""
        if not self.has_running_norm:
            return self.initial_norm.normalize(x), {}
        bn_vars = {"batch_stats": variables["batch_stats"]["initial_norm"]}
        if train:
            x, upd = self._bnorm.apply(bn_vars, x, use_running_stats=False,
                                       mutable=["batch_stats"])
            return x, {"batch_stats": {"initial_norm": upd["batch_stats"]}}
        return self._bnorm.apply(bn_vars, x), {}

    def _norm_inv(self, variables, x):
        if not self.has_running_norm:
            return self.initial_norm.unnormalize(x)
        bn_vars = {"batch_stats": variables["batch_stats"]["initial_norm"]}
        return self._bnorm.unnormalize(bn_vars, x)

    def encode(self, x, y=None, key=None):
        if self.autoencoder is None:
            return x, y
        cfg = self.config
        if cfg.encode_condition and not cfg.autoencoder_is_conditional:
            raise ValueError(
                "Cannot encode condition if autoencoder is not conditional")
        if cfg.autoencoder_is_conditional:
            out = self.autoencoder.encode(x, key=key, y=y)
        else:
            out = self.autoencoder.encode(x, key=key)
        if cfg.encode_condition:
            x, y = out
        else:
            x = out
        if isinstance(x, dict):
            x = x["zsample"]
        return x, y

    def decode(self, x, y=None):
        if self.autoencoder is None:
            return x, y
        if self.config.autoencoder_is_conditional:
            return self.autoencoder.decode(x, y=y), y
        return self.autoencoder.decode(x), y

    # ------------------------------------------------------------------
    # preconditioned flow (flowfield.py:115-169)
    # ------------------------------------------------------------------
    def _apply_net(self, variables, *args, train=False, rngs=None, **kw):
        """model.apply with optional bf16 mixed precision: params and
        array inputs cast to compute_dtype, output back to f32."""
        cd = self.compute_dtype
        if cd is None:
            return self.model.apply(variables, *args, train=train,
                                    rngs=rngs, **kw)

        def cast(p):
            return (p.astype(cd) if hasattr(p, "dtype")
                    and jnp.issubdtype(p.dtype, jnp.floating) else p)
        variables = jax.tree.map(cast, variables)
        args = tuple(jax.tree.map(cast, a) for a in args)
        kw = {k: jax.tree.map(cast, v) for k, v in kw.items()}
        out = self.model.apply(variables, *args, train=train, rngs=rngs,
                               **kw)
        return out.astype(jnp.float32)

    def _raw_flow(self, variables, x, t, y, train=False, rngs=None):
        pre = self.config.precondition_fn
        sch = self.config.scheduler
        if pre is None or pre == "identity":
            if self.config.autonomous_flow:
                return self._apply_net(variables, x, y=y, train=train,
                                       rngs=rngs)
            return self._apply_net(variables, x, t, y, train=train,
                                   rngs=rngs)
        if pre == "edm":
            sigma_data = self.config.sigma_data
            sigma = bcast_right(sch.sigma_fn(t), x)
            sigma_dot = bcast_right(sch.sigma_fn_dot(t), x)
            cin = 1.0 / jnp.sqrt(sigma_data ** 2 + sigma ** 2)
            cout = sigma * sigma_data / jnp.sqrt(sigma_data ** 2 + sigma ** 2)
            cskip = sigma_data ** 2 / (sigma_data ** 2 + sigma ** 2)
            cnoise = 0.5 * jnp.log(sch.sigma_fn(t))
            denoiser = cskip * x + cout * self._apply_net(
                variables, cin * x, cnoise, y, train=train, rngs=rngs)
            return sigma_dot / sigma * (x - denoiser)
        if callable(pre):
            return pre(lambda *a, **k: self.model.apply(variables, *a, **k),
                       x, t, y=y)
        raise ValueError(f"Invalid precondition function: {pre}")

    def get_flow_field(self, variables, x, t, y=None, guidance: float = 1.0,
                       integrate_on_sigma: bool = False, train=False,
                       rngs=None):
        """(flowfield.py:441-466)"""
        v = self._raw_flow(variables, x, t, y, train, rngs)
        if guidance != 1.0 and y is not None:
            v_uncond = self._raw_flow(variables, x, t, None, train, rngs)
            v = guidance * v + (1 - guidance) * v_uncond
        if integrate_on_sigma:
            v = v / bcast_right(self.config.scheduler.sigma_fn_dot(t), v)
        return v

    def get_score_field_from_flow_field(self, flow, x, t):
        """score = (alpha v - alpha' x) / (sigma (alpha' sigma - alpha
        sigma')) (flowfield.py:481-501)."""
        sch = self.config.scheduler
        a = bcast_right(sch.alpha_fn(t), flow)
        s = bcast_right(sch.sigma_fn(t), flow)
        ad = bcast_right(sch.alpha_fn_dot(t), flow)
        sd = bcast_right(sch.sigma_fn_dot(t), flow)
        return (a * flow - ad * x) / (s * (ad * s - a * sd))

    def get_score_field(self, variables, x, t, y=None, guidance: float = 1.0,
                        integrate_on_sigma: bool = False):
        v = self.get_flow_field(variables, x, t, y, guidance,
                                integrate_on_sigma)
        return self.get_score_field_from_flow_field(v, x, t)

    # ------------------------------------------------------------------
    # training (flowfield.py:347-399)
    # ------------------------------------------------------------------
    def sample_timestep(self, key, nsamples: int):
        cfg = self.config
        lw = cfg.loss_weighting
        if isinstance(lw, dict):
            return lw["weighting_sampler"](key, nsamples)
        if lw == "uniform":
            return jax.random.uniform(key, (nsamples,))
        if lw == "edm":
            logsigma = (cfg.pstd * jax.random.normal(key, (nsamples,))
                        + cfg.pmean)
            return cfg.scheduler.sigma_fn_inv(jnp.exp(logsigma))
        raise ValueError(f"Invalid weighting class: {lw}")

    def _weighting_function(self, t):
        lw = self.config.loss_weighting
        if isinstance(lw, dict):
            return lw["weighting_function"](t)
        return 1.0 + 0.0 * t  # both uniform and edm use uniform weights
        # (the reference's edm weighting function is commented out,
        # flowfield.py:219-227)

    def loss_fn(self, variables, key, x, t, y=None, mask=None,
                train: bool = True, eps=None):
        """Flow-matching loss. Returns (loss, mutable_updates) — the same
        contract as KarrasModel.loss_fn; updates carries running initial-
        norm stats when ``initial_norm=True`` (empty dict otherwise).
        ``eps`` replays a fixed noise draw (cross-framework parity hook,
        the analogue of seeding the reference's torch.randn_like,
        flowfield.py:355)."""
        knoise, kdrop, kenc = jax.random.split(key, 3)
        x, y = self.encode(x, y, key=kenc)
        x, updates = self._norm_fwd(variables, x, train)
        noise = (jax.random.normal(knoise, x.shape, x.dtype)
                 if eps is None else jnp.asarray(eps, x.dtype))
        t_b = bcast_right(t, x)
        sch = self.config.scheduler
        x_noised = sch.alpha_fn(t_b) * x + sch.sigma_fn(t_b) * noise
        rngs = {"dropout": kdrop} if train else None
        v = self.get_flow_field(variables, x_noised, t, y=y, train=train,
                                rngs=rngs)
        target = sch.alpha_fn_dot(t_b) * x + sch.sigma_fn_dot(t_b) * noise
        loss = self._loss(v, target) * self._weighting_function(t_b)
        if mask is not None:
            loss = loss * (1 - jnp.broadcast_to(mask, loss.shape))
        return jnp.mean(loss), updates

    # ------------------------------------------------------------------
    # integration (flowfield.py:704-795)
    # ------------------------------------------------------------------
    def integration_step(self, key, variables, x, t_curr, t_next, y=None,
                         guidance: float = 1.0,
                         method: str = "euler",
                         integrate_on_sigma: bool = False,
                         noise=None):
        sch = self.config.scheduler
        if not integrate_on_sigma:
            dt = t_next - t_curr
        else:
            dt = sch.sigma_fn(t_next) - sch.sigma_fn(t_curr)
        dt = bcast_right(dt, x)

        def flow(xx, tt):
            return self.get_flow_field(variables, xx, tt, y, guidance,
                                       integrate_on_sigma)

        if method == "euler":
            return x + dt * flow(x, t_curr)
        if method == "heun":
            v1 = flow(x, t_curr)
            x_euler = x + dt * v1
            v2 = flow(x_euler, t_next)
            return x + dt * (v1 + v2) / 2
        if method == "euler_maruyama":
            v = flow(x, t_curr)
            score = self.get_score_field_from_flow_field(v, x, t_curr)
            omega = bcast_right(sch.sigma_fn(t_curr), x)
            x = x + dt * (v - 0.5 * omega * score)
            if noise is None:
                noise = jax.random.normal(key, x.shape, x.dtype)
            return x + jnp.sqrt(omega * jnp.abs(dt)) * noise
        raise ValueError(f"Invalid integration method: {method}")

    def integrate_flow_field(self, key, variables, x, nsteps: int,
                             y=None, guidance: float = 1.0,
                             return_history: bool = False,
                             integrate_on_sigma: bool = False,
                             noise_injection: bool = False,
                             noise_seq=None):
        """Heun integration over linspace(1, 0, nsteps) with a final Euler
        step; Euler-Maruyama throughout when noise_injection
        (flowfield.py:704-747). Scan-based. ``noise_seq`` [nsteps-1,
        *x.shape] replays fixed Euler-Maruyama draws (parity hook)."""
        ts = np.linspace(1.0, 0.0, nsteps)
        B = x.shape[0]

        def make_step(method):
            def step(carry, xrow):
                xc, kc = carry
                kc, sub = jax.random.split(kc)
                t_pair = xrow["t"]
                tc = jnp.broadcast_to(t_pair[0], (B,))
                tn = jnp.broadcast_to(t_pair[1], (B,))
                xn = self.integration_step(sub, variables, xc, tc, tn, y,
                                           guidance, method,
                                           integrate_on_sigma,
                                           noise=xrow.get("noise"))
                return (xn, kc), (xn if return_history else None)
            return step

        pairs = jnp.asarray(np.stack([ts[:-1], ts[1:]], axis=1),
                            jnp.float32)
        x0 = x
        if noise_injection:
            xs = {"t": pairs}
            if noise_seq is not None:
                xs["noise"] = jnp.asarray(noise_seq, x.dtype)
            (x, key), ys = jax.lax.scan(make_step("euler_maruyama"),
                                        (x, key), xs)
        else:
            (x, key), ys = jax.lax.scan(make_step("heun"), (x, key),
                                        {"t": pairs[:-1]})
            # final step: Euler (the reference switches to Euler on the last
            # step, flowfield.py:726-729)
            (x, key), y_last = make_step("euler")((x, key),
                                                  {"t": pairs[-1]})
            if return_history:
                ys = jnp.concatenate([ys, y_last[None]], axis=0)
        if return_history:
            hist = jnp.concatenate([x0[None], ys], axis=0)
            return self._norm_inv(variables, hist)
        return self._norm_inv(variables, x)

    # ------------------------------------------------------------------
    # sampling (flowfield.py:503-544)
    # ------------------------------------------------------------------
    def sample(self, variables, key, nsamples: int, shape, y=None,
               guidance: float = 1.0, nsteps: int = 30,
               is_latent_shape: bool = False,
               integrate_on_sigma: bool = False,
               noise_injection: bool = False,
               return_latents: bool = False,
               orig_noise=None, mesh=None):
        knoise, kenc, kint = jax.random.split(key, 3)
        if orig_noise is None:
            x = jax.random.normal(knoise, (nsamples,) + tuple(shape))
        else:
            x = orig_noise
        if mesh is not None:
            # data-parallel sampling: batch sharded over the mesh 'data'
            # axis, the whole integration scan shards under GSPMD (same
            # contract as KarrasModel.sample(mesh=...))
            from diffsci_tpu.parallel.mesh import constrain_batch
            x = constrain_batch(x, mesh)
        if not is_latent_shape and self.autoencoder is not None:
            x, _ = self.encode(x, y, key=kenc)
            x = jax.random.normal(kenc, x.shape, x.dtype)
            if mesh is not None:
                # the latent re-draw replaces the constrained array — the
                # sharding must be re-applied or the scan runs unsharded
                from diffsci_tpu.parallel.mesh import constrain_batch
                x = constrain_batch(x, mesh)
        yb = dict_expand_dims(y, 0) if (
            y is not None and not _batched(y, nsamples)) else y
        sigma_init = self.config.scheduler.sigma_fn(jnp.float32(1.0))
        x = x * sigma_init
        x = self.integrate_flow_field(kint, variables, x, nsteps, yb,
                                      guidance,
                                      integrate_on_sigma=integrate_on_sigma,
                                      noise_injection=noise_injection)
        if not return_latents:
            x, _ = self.decode(x, y)
        return x

    # ------------------------------------------------------------------
    # inpainting with soft masks (flowfield.py:546-702)
    # ------------------------------------------------------------------
    def create_soft_mask(self, mask, falloff: int):
        """Cosine-smoothed boundary mask (flowfield.py:643-702).
        mask: [*spatial, C] channels-last; 1 = known."""
        if falloff <= 0:
            return mask
        m = mask[None].astype(jnp.float32)
        ndim = m.ndim - 2
        window = (2 * falloff + 1,) * ndim
        strides = (1,) * ndim
        m_dil = nn.avg_pool(m, window, strides=strides, padding="SAME")
        m_ero = nn.avg_pool(1 - m, window, strides=strides, padding="SAME")
        soft = m_dil / (m_dil + m_ero + 1e-8)
        return ((1 - jnp.cos(soft * jnp.pi)) / 2)[0]

    def inpaint(self, variables, key, x_orig, mask, nsamples: int = 1,
                y=None, guidance: float = 1.0, nsteps: int = 30,
                integrate_on_sigma: bool = False,
                mask_falloff: int = 0,
                resample_steps: int = 0,
                mask_start_t: float = 1.0,
                orig_noise=None):
        """RePaint-style latent inpainting with soft masks
        (flowfield.py:546-641). mask: 1 = known region of x_orig."""
        sch = self.config.scheduler
        soft = self.create_soft_mask(mask, mask_falloff)
        x_orig, _ = self._norm_fwd(variables, x_orig[None], train=False)
        knoise, key = jax.random.split(key)
        if orig_noise is None:
            x = jax.random.normal(knoise, (nsamples,) + x_orig.shape[1:])
        else:
            x = orig_noise
        ts = np.linspace(1.0, 0.0, nsteps)
        x = x * sch.sigma_fn(jnp.float32(1.0))
        B = x.shape[0]
        for i in range(nsteps - 1):
            tc = jnp.full((B,), ts[i], jnp.float32)
            tn = jnp.full((B,), ts[i + 1], jnp.float32)
            for r in range(resample_steps + 1):
                key, k1, k2, k3 = jax.random.split(key, 4)
                x = self.integration_step(k1, variables, x, tc, tn, y,
                                          guidance, "euler_maruyama",
                                          integrate_on_sigma)
                if ts[i + 1] <= mask_start_t:
                    sigma = sch.sigma_fn(jnp.float32(ts[i + 1]))
                    alpha = sch.alpha_fn(jnp.float32(ts[i + 1]))
                    patch = alpha * x_orig + sigma * jax.random.normal(
                        k2, x_orig.shape)
                    x = (1 - soft) * x + soft * patch
                    if r < resample_steps and i + 1 < nsteps - 1:
                        s_j = sch.sigma_fn(jnp.float32(ts[i]))
                        a_j = sch.alpha_fn(jnp.float32(ts[i]))
                        x = a_j * x + s_j * jax.random.normal(k3, x.shape)
                        patch_j = a_j * x_orig + s_j * jax.random.normal(
                            jax.random.fold_in(k3, 1), x_orig.shape)
                        x = (1 - soft) * x + soft * patch_j
        return self._norm_inv(variables, x)


def _batched(y, nsamples: int) -> bool:
    probe = y["y"] if isinstance(y, dict) and "y" in y else (
        next(iter(y.values())) if isinstance(y, dict) else y)
    return hasattr(probe, "shape") and probe.ndim > 0 and \
        probe.shape[0] == nsamples
