"""Training: optax optimizer state, jitted train/eval steps with EMA fused
in, gradient guards, magnitude-preserving weight renormalization, layer
freezing, and data-parallel sharding helpers.

Replaces the reference's Lightning wiring (reference
diffsci/models/karras/karrasmodule.py:476-508,1146-1175, aux callbacks
aux_scripts/callbacks.py:7-45) with a functional TPU design:

- ``TrainState`` is a flax pytree: variables + opt state + EMA + step.
- ``make_train_step`` returns ONE jitted function doing: sigma sampling,
  loss, grad, NaN->0 grad guard (NanToZeroGradCallback analogue), global
  norm clip, optimizer update, mp weight re-projection (the functional
  equivalent of the reference's in-place forced weight norm,
  normedlayers.py:18-22), and the EMA shadow update
  (karrasmodule_new.py:2155-2157) — no per-step host sync.
- Data parallelism: shard the batch over a mesh 'data' axis with
  ``shard_batch``; params are replicated; XLA inserts the gradient
  all-reduce over ICI automatically under jit.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import fnmatch

import jax
import jax.numpy as jnp
import flax.struct
import optax

from diffsci_tpu.models.karras.ema import EMATracker, EMAState


class TrainState(flax.struct.PyTreeNode):
    params: Any
    consts: Any          # non-trainable collections (buffers, batch_stats...)
    opt_state: Any
    ema: Optional[EMAState]
    step: jnp.ndarray    # scalar int32

    def variables(self) -> dict:
        return {"params": self.params, **self.consts}

    def ema_variables(self, tracker: EMATracker,
                      profile_index: int | None = None) -> dict:
        """Variables with EMA shadow params swapped in
        (karrasmodule_new.py:2190-2199 analogue)."""
        if self.ema is None:
            return self.variables()
        return {"params": tracker.get_params(self.ema, profile_index),
                **self.consts}


def split_variables(variables: dict):
    consts = {k: v for k, v in variables.items() if k != "params"}
    return variables.get("params", {}), consts


def default_optimizer(learning_rate: float = 1e-3,
                      weight_decay: float = 1e-4,
                      b1: float = 0.9, b2: float = 0.999,
                      grad_clip: float | None = 0.5,
                      mu_dtype=None):
    """AdamW defaults matching the reference (karrasmodule.py:497-500) plus
    the reference training scripts' gradient clipping
    (scripts/training/train-diffusion-cifar10.py:92).

    ``mu_dtype``: dtype for Adam's first moment (e.g. jnp.bfloat16). On
    HBM-bound TPU configs this halves the m-buffer read+write traffic per
    step; m is a smoothed gradient, so bf16's ~3 decimal digits cost
    nothing observable (v stays f32 — its square scale needs the range)."""
    tx = optax.adamw(learning_rate, b1=b1, b2=b2, weight_decay=weight_decay,
                     mu_dtype=mu_dtype)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def nan_to_zero_grads(grads):
    """NanToZeroGradCallback analogue (aux_scripts/callbacks.py:38-45)."""
    return jax.tree.map(lambda g: jnp.nan_to_num(g, nan=0.0, posinf=0.0,
                                                 neginf=0.0), grads)


def renormalize_mp_weights(params, eps: float = 1e-4):
    """Re-project magnitude-preserving weights onto the unit sphere after
    the optimizer step — the functional equivalent of the reference's
    in-place renorm each forward (normedlayers.py:18-22; attention
    projections: attention.py:229-243). Applies to params whose leaf name
    starts with 'w_mp'.

    Attention projections normalize over different axes than dense/conv
    weights: wq/wk/wv [H, C, dh] over the dmodel axis (1), wo over
    (heads, dhead) = (0, 2) — matching the reference's in-forward renorm
    exactly (pinned by tests/test_reference_parity12.py)."""
    from diffsci_tpu.models.nets.normed import normalize

    def visit(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if not name.startswith("w_mp"):
            return leaf
        if name in ("w_mp_q", "w_mp_k", "w_mp_v"):
            return normalize(leaf, eps, axis=(1,))
        if name == "w_mp_o":
            return normalize(leaf, eps, axis=(0, 2))
        return normalize(leaf, eps)

    return jax.tree_util.tree_map_with_path(visit, params)


def freeze_mask(params, patterns: list[str]):
    """Build an optax mask pytree: True = trainable, False = frozen.
    Patterns are glob-matched against '/'-joined parameter paths
    (karrasmodule_new.py:727-777 analogue)."""
    def visit(path, _leaf):
        name = "/".join(p.key if hasattr(p, "key") else str(p) for p in path)
        return not any(fnmatch.fnmatch(name, pat) for pat in patterns)
    return jax.tree_util.tree_map_with_path(visit, params)


def freeze_optimizer(tx, params, patterns: list[str]):
    """Wrap an optimizer so frozen params get zero updates."""
    mask = freeze_mask(params, patterns)
    return optax.multi_transform(
        {"train": tx, "freeze": optax.set_to_zero()},
        jax.tree.map(lambda m: "train" if m else "freeze", mask))


def create_train_state(model, key, x_shape, y=None,
                       optimizer=None,
                       ema: EMATracker | None = None,
                       freeze_patterns: list[str] | None = None):
    """Initialize variables + optimizer (+ EMA) into a TrainState.
    ``model`` is a KarrasModel (or anything with .init(key, x_shape, y))."""
    variables = model.init(key, x_shape, y)
    params, consts = split_variables(variables)
    tx = optimizer if optimizer is not None else default_optimizer()
    if freeze_patterns:
        tx = freeze_optimizer(tx, params, freeze_patterns)
    opt_state = tx.init(params)
    ema_state = ema.init(params) if ema is not None else None
    return TrainState(params=params, consts=consts, opt_state=opt_state,
                      ema=ema_state, step=jnp.zeros((), jnp.int32)), tx


def make_train_step(model, tx,
                    ema: EMATracker | None = None,
                    has_mp_weights: bool = False,
                    nan_guard: bool = True,
                    loss_fn: Callable | None = None,
                    remat: bool = False,
                    _raw: bool = False):
    """Build the jitted train step.

    ``loss_fn(variables, key, x, y, mask, train) -> (loss, updates)``
    defaults to the model's EDM loss with sigma sampled inside the step
    (the fused equivalent of KarrasModule.training_step,
    karrasmodule.py:1146-1155).

    ``remat=True`` wraps the loss in ``jax.checkpoint``: activations are
    rematerialized in the backward pass instead of stored, trading ~33%
    extra FLOPs for a large cut in peak HBM — the TPU equivalent of the
    reference's micro-batching memory workarounds (karrasmodule.py:817-835),
    but letting the per-chip batch stay large and MXU-friendly.
    """
    if loss_fn is None:
        def loss_fn(variables, key, x, y, mask, train=True):
            ksig, kloss = jax.random.split(key)
            sigma = model.config.noisesampler.sample(ksig, (x.shape[0],))
            return model.loss_fn(variables, kloss, x, sigma, y, mask,
                                 train=train)

    if remat:
        loss_fn = jax.checkpoint(loss_fn, static_argnums=(5,))

    def train_step(state: TrainState, key, x, y=None, mask=None):
        def wrapped(params):
            variables = {"params": params, **state.consts}
            loss, updates = loss_fn(variables, key, x, y, mask, True)
            return loss, updates

        (loss, updates), grads = jax.value_and_grad(
            wrapped, has_aux=True)(state.params)
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
        for col, tree in updates.items():
            consts[col] = tree
        new_state = TrainState(params=params, consts=consts,
                               opt_state=opt_state, ema=ema_state,
                               step=state.step + 1)
        metrics = {"train_loss": loss,
                   "grad_norm": optax.global_norm(grads)}
        return new_state, metrics

    if _raw:
        return train_step
    return jax.jit(train_step, donate_argnums=(0,))


def make_train_scan(model, tx, ema: EMATracker | None = None,
                    has_mp_weights: bool = False, nan_guard: bool = True,
                    loss_fn: Callable | None = None, remat: bool = False):
    """K train steps per device dispatch via ``lax.scan``.

    Returns a jitted ``scan_steps(state, keys, xs, ys=None) ->
    (state, metrics)`` where ``keys`` is [K, 2] (stacked PRNG keys),
    ``xs`` is [K, B, ...] (K pre-batched steps), and metrics are stacked
    [K]-leaves. Semantics are EXACTLY K applications of
    ``make_train_step``'s step (same body, same EMA cadence via the
    step counter in the carry) — only the host dispatch is amortized.
    On single-CPU hosts driving a remote TPU, per-step dispatch costs
    dominate short steps; the reference's analogue is Lightning's tight
    in-process loop which never pays a tunnel round-trip per step."""
    step = make_train_step(model, tx, ema=ema,
                           has_mp_weights=has_mp_weights,
                           nan_guard=nan_guard, loss_fn=loss_fn,
                           remat=remat, _raw=True)

    def scan_steps(state: TrainState, keys, xs, ys=None):
        def body(st, inp):
            if ys is None:
                k, x = inp
                y = None
            else:
                k, x, y = inp
            st, metrics = step(st, k, x, y)
            return st, metrics

        xs_in = (keys, xs) if ys is None else (keys, xs, ys)
        return jax.lax.scan(body, state, xs_in)

    return jax.jit(scan_steps, donate_argnums=(0,))


def make_eval_step(model, ema: EMATracker | None = None,
                   use_ema: bool = False):
    """Jitted validation step (KarrasModule.validation_step,
    karrasmodule.py:1157-1167), optionally with EMA weights swapped in."""

    def eval_step(state: TrainState, key, x, y=None, mask=None):
        variables = (state.ema_variables(ema) if (use_ema and ema is not None)
                     else state.variables())
        ksig, kloss = jax.random.split(key)
        sigma = model.config.noisesampler.sample(ksig, (x.shape[0],))
        loss, _ = model.loss_fn(variables, kloss, x, sigma, y, mask,
                                train=False)
        return {"valid_loss": loss}

    return jax.jit(eval_step)


def warmup_cosine_schedule(peak_lr: float, warmup_steps: int,
                           decay_steps: int, end_factor: float = 0.0):
    """Linear warmup -> cosine decay optax schedule. Pass the result as
    ``default_optimizer(learning_rate=...)`` — optax threads the schedule
    through AdamW, the TPU-native equivalent of the reference's pluggable
    torch ``lr_scheduler`` slot (karrasmodule.py:480-508)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=peak_lr, warmup_steps=warmup_steps,
        decay_steps=decay_steps, end_value=end_factor * peak_lr)


def cosine_restarts_schedule(peak_lr: float, period: int,
                             n_restarts: int = 10,
                             end_factor: float = 0.0):
    """Cosine annealing with warm restarts (SGDR) — the reference's
    documented default scheduler family, CosineAnnealingWarmRestarts with
    T_0=period (karrasmodule.py:488). Equal periods (T_mult=1); after the
    last restart the schedule holds the end value."""
    return optax.sgdr_schedule([
        dict(init_value=peak_lr, peak_value=peak_lr, warmup_steps=0,
             decay_steps=period, end_value=end_factor * peak_lr)
        for _ in range(n_restarts)])


def accumulate_gradients(tx, every: int):
    """Gradient accumulation: wrap any optimizer so parameters update once
    per ``every`` micro-batches with the averaged gradient (optax
    MultiSteps). The TPU-native answer to the reference's memory-driven
    batch splitting (karrasmodule.py:817-835, utils.py:5) for TRAINING:
    keep the per-step micro-batch at whatever fits, recover the large
    effective batch through accumulation — the jitted train step is
    unchanged (the wrapper is itself a GradientTransformation)."""
    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")
    return optax.MultiSteps(tx, every_k_schedule=every)


def schedule_free_optimizer(learning_rate: float = 1e-3,
                            b1: float = 0.9,
                            weight_decay: float = 1e-4,
                            grad_clip: float | None = 0.5):
    """Schedule-free AdamW (the optimizer behind the reference's
    ScheduleFreeCallback, aux_scripts/callbacks.py:21-35, which switched
    the torch optimizer between train/eval modes). In optax the switch is
    functional: train on the returned optimizer, evaluate with
    ``schedule_free_eval_params(state, params)``."""
    import optax.contrib as oc
    tx = oc.schedule_free_adamw(learning_rate, b1=b1,
                                weight_decay=weight_decay)
    if grad_clip is not None:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def schedule_free_eval_params(state: TrainState):
    """Evaluation-mode parameters for a schedule-free-trained state (the
    ScheduleFreeCallback eval switch)."""
    import optax.contrib as oc
    opt_state = state.opt_state
    # unwrap chain wrappers to find the ScheduleFreeState
    leaves = [s for s in jax.tree.leaves(
        opt_state, is_leaf=lambda x: isinstance(x, oc.ScheduleFreeState))
        if isinstance(x := s, oc.ScheduleFreeState)]
    if not leaves:
        raise ValueError("optimizer state contains no ScheduleFreeState; "
                         "train with schedule_free_optimizer()")
    return oc.schedule_free_eval_params(leaves[0], state.params)
