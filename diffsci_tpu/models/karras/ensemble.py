"""EnsembleKarrasModel: the v2 runtime — vectorized ensemble/CRPS losses,
autoregressive forecasting loss, replay-based fine-tuning, L2-SP
pretrained-weight regularization.

TPU-native redesign of the reference EnsembleKarrasModule
(reference diffsci/models/karras/karrasmodule_new.py:32-2256) and the
autoregressive mixin (autoregressiveloss.py:7-274):

- Ensemble loss (karrasmodule_new.py:963-1149): E noises drawn at once,
  flattened to one [B*E] denoiser call, loss metrics receive the full
  [B, E, *spatial, C] ensemble (CRPS-ready). Channels-last, so the ensemble
  axis stays at position 1 and channel windows slide on axis -1.
- Autoregressive loss (autoregressiveloss.py:13-56): per-horizon losses on
  split targets, generating each next conditioning frame by *sampling the
  model inside the training step* (a scan-in-scan under jit; predictions
  are stop_gradient'ed and slid into y['y']'s channel window). Unlike the
  reference's per-item python loop for batched conditioning
  (autoregressiveloss.py:163-174), batched conditioning samples in ONE
  vectorized call — same semantics, no host loop.
- Replay fine-tuning (karrasmodule_new.py:1959-2000): dual-batch train step
  with a constant/linear/cosine scheduled replay weight
  (karrasmodule_new.py:1859-1884).
- L2-SP (karrasmodule_new.py:1756-1857): squared distance to frozen
  pretrained reference params under include/exclude glob patterns.
"""

from __future__ import annotations

import fnmatch
from typing import Optional

import jax
import jax.numpy as jnp

from diffsci_tpu.utils import bcast_right, dict_map
from diffsci_tpu.models.karras.module import KarrasModel, KarrasModelConfig


class EnsembleKarrasModelConfig(KarrasModelConfig):
    """KarrasModelConfig + v2 knobs (karrasmodule_new.py:32-236)."""

    def __init__(self, *args,
                 ensemble_size_train: int = 1,
                 ensemble_size_val: int = 1,
                 replay_enabled: bool = False,
                 replay_loss_weight: float = 1.0,
                 replay_loss_weight_schedule: dict | None = None,
                 pretrained_weight_regularization: dict | bool | None = None,
                 freeze_layer_patterns: list[str] | None = None,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.ensemble_size_train = ensemble_size_train
        self.ensemble_size_val = ensemble_size_val
        self.replay_enabled = replay_enabled
        self.replay_loss_weight = replay_loss_weight
        self.replay_loss_weight_schedule = replay_loss_weight_schedule or {}
        self.pretrained_weight_regularization = \
            pretrained_weight_regularization
        self.freeze_layer_patterns = freeze_layer_patterns or []

    @classmethod
    def from_karras_config(cls, base: KarrasModelConfig, **kwargs):
        inherited = dict(
            preconditioner=base.preconditioner,
            noisesampler=base.noisesampler,
            noisescheduler=base.noisescheduler,
            loss_metric=base.loss_metric,
            tag=base.tag,
            has_edm_batch_norm=base.has_edm_batch_norm,
            dynamic_loss_weight=base.dynamic_loss_weight,
            extra_args=base.extra_args,
            spatial_shape=base.spatial_shape,
            focus_radius=base.focus_radius)
        inherited.update(kwargs)  # explicit kwargs win
        cfg = cls(**inherited)
        for k in ("autoregressive_loss_steps",
                  "autoregressive_loss_diffusion_steps",
                  "autoregressive_loss_guidance",
                  "autoregressive_loss_weights",
                  "autoregressive_loss_maximum_batch_size",
                  "autoregressive_loss_integrator"):
            setattr(cfg, k, getattr(base, k))
        return cfg


def scheduled_replay_weight(schedule: dict, default_weight: float,
                            position) -> jnp.ndarray:
    """(karrasmodule_new.py:1859-1884). ``position`` may be traced."""
    if not schedule.get("enabled", False):
        return jnp.asarray(default_weight, jnp.float32)
    start = float(schedule.get("start_weight", default_weight))
    end = float(schedule.get("end_weight", default_weight))
    duration = float(schedule.get("num_steps",
                                  schedule.get("num_epochs", 1)))
    pos = jnp.asarray(position, jnp.float32)
    progress = (jnp.clip(pos / duration, 0.0, 1.0) if duration > 0
                else jnp.asarray(1.0))
    kind = str(schedule.get("type", "linear")).lower()
    if kind == "constant":
        return jnp.asarray(start)
    if kind == "linear":
        return start + progress * (end - start)
    if kind == "cosine":
        return end + 0.5 * (start - end) * (1 + jnp.cos(jnp.pi * progress))
    raise ValueError(f"unknown replay schedule type: {kind}")


def l2_sp_regularization(params, reference, weight: float,
                         normalize: bool = True):
    """L2-SP: weight * sum (p - p_ref)^2 [/ count]
    (karrasmodule_new.py:1830-1857). ``reference`` is a sub-pytree of
    ``params`` (same structure, possibly fewer leaves)."""
    sq_sum = 0.0
    count = 0
    ref_leaves = jax.tree_util.tree_leaves_with_path(reference)
    params_map = {jax.tree_util.keystr(p): leaf for p, leaf in
                  jax.tree_util.tree_leaves_with_path(params)}
    for path, ref_leaf in ref_leaves:
        p = params_map[jax.tree_util.keystr(path)]
        sq_sum = sq_sum + jnp.sum((p - ref_leaf) ** 2)
        count += ref_leaf.size
    if count == 0:
        return jnp.asarray(0.0)
    if normalize:
        sq_sum = sq_sum / count
    return weight * sq_sum


def select_regularization_reference(params, include_patterns=("*",),
                                    exclude_patterns=()):
    """Freeze a reference copy of the selected parameters
    (karrasmodule_new.py:1790-1828). Non-selected leaves are dropped
    (replaced by None and pruned)."""
    def visit(path, leaf):
        name = "/".join(p.key if hasattr(p, "key") else str(p) for p in path)
        inc = any(fnmatch.fnmatch(name, pat) for pat in include_patterns)
        exc = any(fnmatch.fnmatch(name, pat) for pat in exclude_patterns)
        return jnp.array(leaf, copy=True) if (inc and not exc) else None

    tree = jax.tree_util.tree_map_with_path(visit, params)
    # prune Nones
    def prune(node):
        if isinstance(node, dict):
            out = {k: prune(v) for k, v in node.items()}
            return {k: v for k, v in out.items() if v is not None} or None
        return node
    pruned = prune(tree)
    if pruned is None:
        raise ValueError(
            "pretrained_weight_regularization did not match any parameters")
    return pruned


class EnsembleKarrasModel(KarrasModel):
    """KarrasModel + ensemble/AR/replay/L2-SP. All methods remain pure."""

    # ------------------------------------------------------------------
    # ensemble loss (karrasmodule_new.py:963-1149)
    # ------------------------------------------------------------------
    def loss_fn(self, variables, key, x, sigma, y=None, mask=None,
                train: bool = True, n_ensemble: int = 1, eps=None):
        if n_ensemble <= 1:
            return super().loss_fn(variables, key, x, sigma, y, mask, train,
                                   eps=eps)

        knoise, kdrop, kenc = jax.random.split(key, 3)
        x_latent, y, updates = self.encode(variables, x, y, key=kenc,
                                           train=train)
        B = x_latent.shape[0]
        E = n_ensemble
        feat = x_latent.shape[1:]

        sigma_b = bcast_right(sigma, x_latent)
        if eps is None:
            eps = jax.random.normal(knoise, (B, E) + feat, x_latent.dtype)
        noise = jnp.asarray(eps, x_latent.dtype)
        x_noised = x_latent[:, None] + sigma_b[:, None] * noise

        # flatten ensemble into the batch for ONE denoiser call
        x_flat = x_noised.reshape((B * E,) + feat)
        sigma_flat = jnp.repeat(sigma, E)
        y_flat = dict_map(
            lambda v: jnp.repeat(v, E, axis=0) if v.shape[0] == B else v, y)
        rngs = {"dropout": kdrop} if train else None
        denoiser_flat, cnoise_flat = self.get_denoiser(
            variables, x_flat, sigma_flat, y_flat, train=train, rngs=rngs)
        denoiser = denoiser_flat.reshape((B, E) + feat)

        weight = self.config.noisesampler.loss_weighting(sigma_b)
        bias = jnp.zeros_like(weight)
        if self.config.has_dynamic_loss_weight:
            from diffsci_tpu.models.karras.module import KarrasNet
            cnoise = cnoise_flat.reshape(B, E).mean(axis=1)
            modifier = self.net.apply(variables, cnoise,
                                      method=KarrasNet.loss_weight_modifier)
            modifier = bcast_right(modifier, x_latent)
            weight = weight / jnp.exp(modifier)
            bias = bias + modifier

        if self._multi_space is not None:
            raise NotImplementedError(
                "multi-space loss is not implemented for ensembles "
                "(matches reference karrasmodule_new.py:1111)")
        if self._loss_reduces:
            # internally-reducing metrics (CRPS, smoothed indicator) handle
            # the [B, E, ...] vs [B, ...] pair themselves
            raw = self._loss_metric(denoiser, x_latent, mask)
        else:
            # elementwise metrics go through the EnsembleAware* wrappers in
            # the reference (custom_losses.py:582-688): reduce to a scalar
            # BEFORE weighting; masked sums normalize by the per-sample
            # valid count WITHOUT the ensemble factor
            raw = self._loss_metric(denoiser, x_latent[:, None], mask)
            if mask is not None:
                keep = 1.0 - jnp.broadcast_to(mask, x_latent.shape)
                per_b = (raw * keep[:, None]).sum(
                    axis=tuple(range(1, raw.ndim)))
                count = jnp.clip(
                    keep.sum(axis=tuple(range(1, keep.ndim))), 1.0)
                raw = jnp.mean(per_b / count)
            else:
                raw = jnp.mean(raw)
        # scalar loss: weight.mean() * loss + bias.mean()
        # (karrasmodule_new.py:1145-1149)
        loss = jnp.mean(weight) * raw + jnp.mean(bias)
        return loss, updates

    # ------------------------------------------------------------------
    # autoregressive loss (autoregressiveloss.py:13-221)
    # ------------------------------------------------------------------
    def has_autoregressive_loss(self) -> bool:
        return getattr(self.config, "autoregressive_loss_steps", 1) > 1

    def autoregressive_loss_fn(self, variables, key, x, y=None, mask=None,
                               train: bool = True, n_ensemble: int = 1,
                               nsteps: int | None = None,
                               sigma_seq=None, eps_seq=None,
                               sampler_fn=None):
        """Returns (total_loss, updates, per_step_losses).

        ``sigma_seq`` ([steps, B]) / ``eps_seq`` (len-steps sequence)
        replay fixed draws per horizon step; ``sampler_fn(target, y)``
        overrides the in-training diffusion sampler that generates the
        next condition (cross-framework parity hooks + a cheap-rollout
        knob)."""
        steps = int(self.config.autoregressive_loss_steps
                    if nsteps is None else nsteps)
        if steps < 1:
            raise ValueError("autoregressive_loss_steps must be >= 1")
        if steps > 1 and y is None:
            # fail early with a clear message (the reference only errors at
            # sampling time, autoregressiveloss.py:141-145)
            raise ValueError(
                "Autoregressive loss requires conditional data so generated "
                "predictions can be fed back into y['y'].")
        targets = self._split_autoregressive_targets(x, steps)
        masks = self._split_autoregressive_masks(mask, steps, targets)
        weights = self._autoregressive_step_weights(steps)

        current_y = y
        total = jnp.asarray(0.0)
        step_losses = []
        updates = {}
        for step, target in enumerate(targets):
            key, ksig, kloss, ksamp = jax.random.split(key, 4)
            sigma = (self.config.noisesampler.sample(ksig,
                                                     (target.shape[0],))
                     if sigma_seq is None else jnp.asarray(sigma_seq[step]))
            loss, upd = self.loss_fn(variables, kloss, target, sigma,
                                     current_y, masks[step], train=train,
                                     n_ensemble=n_ensemble,
                                     eps=None if eps_seq is None
                                     else eps_seq[step])
            updates = upd or updates
            step_losses.append(loss)
            total = total + weights[step] * loss
            if step < steps - 1:
                if sampler_fn is not None:
                    pred = sampler_fn(target, current_y)
                else:
                    pred = self._sample_next_autoregressive_condition(
                        variables, ksamp, target, current_y)
                current_y = self._append_autoregressive_prediction(
                    current_y, pred)
        return total, updates, step_losses

    @staticmethod
    def _split_autoregressive_targets(x, steps: int):
        """Channels-last split (autoregressiveloss.py:76-96): either
        [B, steps, *spatial, C] or channel-flattened [B, *spatial, steps*C].
        """
        if steps == 1:
            return [x]
        if x.ndim >= 5 and x.shape[1] == steps:
            return [x[:, s] for s in range(steps)]
        if x.ndim >= 4 and x.shape[-1] % steps == 0:
            return list(jnp.split(x, steps, axis=-1))
        raise ValueError(
            "Could not split x into autoregressive targets: expected "
            "[B, steps, *spatial, C] or [B, *spatial, steps*C].")

    @staticmethod
    def _split_autoregressive_masks(mask, steps: int, targets):
        """(autoregressiveloss.py:98-112)"""
        if mask is None or steps == 1:
            return [mask] * steps
        if mask.ndim >= 5 and mask.shape[1] == steps:
            return [mask[:, s] for s in range(steps)]
        target_channels = targets[0].shape[-1]
        if mask.ndim >= 4 and mask.shape[-1] == steps * target_channels:
            return list(jnp.split(mask, steps, axis=-1))
        return [mask] * steps

    def _autoregressive_step_weights(self, steps: int):
        """Normalized per-horizon weights (autoregressiveloss.py:114-131)."""
        weights = getattr(self.config, "autoregressive_loss_weights", None)
        if weights is None:
            w = jnp.ones((steps,))
        else:
            w = jnp.asarray(weights, jnp.float32)
            if w.size != steps:
                raise ValueError(
                    "autoregressive_loss_weights must have one value per "
                    "autoregressive loss step")
        return w / jnp.clip(jnp.sum(w), jnp.finfo(jnp.float32).eps)

    def _sample_next_autoregressive_condition(self, variables, key, target,
                                              y):
        """Inference inside the training step (autoregressiveloss.py:133-175)
        — one vectorized sample call; the prediction is detached."""
        if y is None:
            raise ValueError(
                "Autoregressive loss requires conditional data so generated "
                "predictions can be fed back into y['y'].")
        pred = self.sample(
            variables, key, target.shape[0], target.shape[1:], y=y,
            guidance=getattr(self.config, "autoregressive_loss_guidance", 1.0),
            nsteps=getattr(self.config,
                           "autoregressive_loss_diffusion_steps", 100),
            maximum_batch_size=getattr(
                self.config, "autoregressive_loss_maximum_batch_size", None),
            integrator=getattr(self.config,
                               "autoregressive_loss_integrator", None))
        return jax.lax.stop_gradient(pred.astype(target.dtype))

    @staticmethod
    def _append_autoregressive_prediction(y, prediction):
        """Slide the channel window of y['y'] (channels-last: axis -1)
        (autoregressiveloss.py:177-221)."""
        if not isinstance(y, dict) or "y" not in y:
            raise ValueError(
                "Autoregressive loss expects y to be a dict containing "
                "key 'y'.")
        y_tensor = y["y"]
        prediction = jax.lax.stop_gradient(prediction).astype(y_tensor.dtype)
        if y_tensor.ndim == prediction.ndim - 1:
            if prediction.shape[0] != 1:
                raise ValueError(
                    "Cannot append batched predictions to unbatched y['y'].")
            prediction = prediction[0]
        if y_tensor.ndim != prediction.ndim:
            raise ValueError(
                f"Prediction rank {prediction.ndim} is incompatible with "
                f"y['y'] rank {y_tensor.ndim}.")
        cps = prediction.shape[-1]
        if y_tensor.shape[-1] < cps:
            raise ValueError(
                "y['y'] has fewer channels than the generated prediction.")
        updated = dict(y)
        updated["y"] = jnp.concatenate(
            [y_tensor[..., cps:], prediction], axis=-1)
        return updated

    # ------------------------------------------------------------------
    # combined training loss (karrasmodule_new.py:1933-2000)
    # ------------------------------------------------------------------
    def training_loss(self, variables, key, batch, n_ensemble: int = 1,
                      train: bool = True):
        """Loss for one (sub-)batch, dispatching to AR when configured.
        Returns (loss, updates, aux)."""
        x, y, mask = self.select_batch(batch)
        if self.has_autoregressive_loss():
            loss, updates, step_losses = self.autoregressive_loss_fn(
                variables, key, x, y, mask, train=train,
                n_ensemble=n_ensemble)
            aux = {f"ar_loss_horizon_{i + 1}": sl
                   for i, sl in enumerate(step_losses)}
            return loss, updates, aux
        ksig, kloss = jax.random.split(key)
        sigma = self.config.noisesampler.sample(ksig, (x.shape[0],))
        loss, updates = self.loss_fn(variables, kloss, x, sigma, y, mask,
                                     train=train, n_ensemble=n_ensemble)
        return loss, updates, {}


def make_ensemble_train_step(model: EnsembleKarrasModel, tx,
                             ema=None,
                             reg_reference=None,
                             has_mp_weights: bool = False,
                             nan_guard: bool = True):
    """Jitted train step for the v2 runtime: ensemble/AR loss, optional
    replay dual-batch with scheduled weight, optional L2-SP.

    batch: array / tuple, or {'finetune': batch, 'replay': batch} when
    config.replay_enabled.
    """
    import optax
    from diffsci_tpu.models.karras.train import (TrainState,
                                                 nan_to_zero_grads,
                                                 renormalize_mp_weights)
    cfg = model.config
    reg_cfg = getattr(cfg, "pretrained_weight_regularization", None)
    if reg_cfg is True:
        reg_cfg = {"enabled": True}
    reg_on = (isinstance(reg_cfg, dict) and reg_cfg.get("enabled", False)
              and float(reg_cfg.get("weight", 0.0)) > 0.0
              and reg_reference is not None)

    def train_step(state: TrainState, key, batch):
        def compute_loss(params):
            variables = {"params": params, **state.consts}
            aux_all = {}
            if cfg.replay_enabled:
                kf, kr = jax.random.split(key)
                loss_f, upd, aux_f = model.training_loss(
                    variables, kf, batch["finetune"],
                    n_ensemble=cfg.ensemble_size_train)
                loss_r, upd_r, aux_r = model.training_loss(
                    variables, kr, batch["replay"],
                    n_ensemble=cfg.ensemble_size_train)
                w = scheduled_replay_weight(cfg.replay_loss_weight_schedule,
                                            cfg.replay_loss_weight,
                                            state.step)
                loss = loss_f + w * loss_r
                aux_all.update({"train_loss_finetune": loss_f,
                                "train_loss_replay": loss_r,
                                "train_replay_loss_weight": w})
                upd = upd or upd_r
            else:
                loss, upd, aux_all = model.training_loss(
                    variables, key, batch,
                    n_ensemble=cfg.ensemble_size_train)
            if reg_on:
                reg = l2_sp_regularization(
                    params, reg_reference,
                    float(reg_cfg.get("weight", 0.0)),
                    bool(reg_cfg.get("normalize", True)))
                loss = loss + reg
                aux_all["l2_sp"] = reg
            return loss, (upd, aux_all)

        (loss, (updates, aux)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        if nan_guard:
            grads = nan_to_zero_grads(grads)
        upds, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, upds)
        if has_mp_weights:
            params = renormalize_mp_weights(params)
        ema_state = state.ema
        if ema is not None and ema_state is not None:
            ema_state = ema.update(ema_state, params)
        consts = dict(state.consts)
        for col, tree in (updates or {}).items():
            consts[col] = tree
        new_state = TrainState(params=params, consts=consts,
                               opt_state=opt_state, ema=ema_state,
                               step=state.step + 1)
        metrics = {"train_loss": loss, **aux}
        return new_state, metrics

    return jax.jit(train_step, donate_argnums=(0,))
