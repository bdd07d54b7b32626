"""Thin host-side training loop: epochs, metric logging, checkpointing,
EMA-swapped validation, profiling hooks.

Replaces lightning.Trainer in the reference's stack (SURVEY.md §1 L3/L4).
All compute lives in the jitted train/eval steps (models/karras/train.py);
this loop only shuffles data, moves batches onto the mesh, and does
bookkeeping — it never touches tensors elementwise.
"""

from __future__ import annotations

import collections
import json
import pathlib
import time
from typing import Any, Callable, Iterable, Optional

import jax

from diffsci_tpu.parallel import shard_batch


class MetricLogger:
    """JSONL metric log + running averages (TensorBoard-free default; the
    file is trivially convertible)."""

    def __init__(self, log_dir: str | pathlib.Path | None = None):
        self.history: list[dict] = []
        self.log_path = None
        if log_dir is not None:
            p = pathlib.Path(log_dir)
            p.mkdir(parents=True, exist_ok=True)
            self.log_path = p / "metrics.jsonl"

    def log(self, step: int, metrics: dict[str, Any]):
        row = {"step": int(step)}
        row.update({k: float(v) for k, v in metrics.items()})
        self.history.append(row)
        if self.log_path is not None:
            with open(self.log_path, "a") as f:
                f.write(json.dumps(row) + "\n")

    def last(self, key: str, default=None):
        for row in reversed(self.history):
            if key in row:
                return row[key]
        return default


class Trainer:
    """Epoch loop over jitted steps.

    fit(state, step_fn, train_loader, eval_fn=None, val_loader=None)
    where step_fn(state, key, x, y, mask) -> (state, metrics) and batches
    from the loaders are either arrays (x) or tuples matching the model's
    select_batch convention.
    """

    def __init__(self,
                 max_epochs: int = 1,
                 max_steps: int | None = None,
                 mesh=None,
                 seed: int = 0,
                 log_every: int = 50,
                 val_every_epochs: int = 1,
                 checkpoint_manager=None,
                 save_every_steps: int | None = None,
                 save_last: bool = True,
                 log_dir: str | pathlib.Path | None = None,
                 select_batch: Callable | None = None,
                 profile_dir: str | pathlib.Path | None = None,
                 profile_steps: tuple[int, int] | None = None,
                 prefetch: int = 2,
                 val_loaders: "dict[str, Iterable] | list | None" = None):
        self.max_epochs = max_epochs
        self.max_steps = max_steps
        self.mesh = mesh
        self.seed = seed
        self.log_every = log_every
        self.val_every_epochs = val_every_epochs
        self.checkpoint_manager = checkpoint_manager
        # step-cadence + save-on-exit checkpointing, independent of
        # validation (the reference's ModelCheckpoint save_last semantics,
        # train-diffusion-cifar10.py:78-85; fixes the round-1 gap where a
        # no-validation run never checkpointed)
        self.save_every_steps = save_every_steps
        self.save_last = save_last
        self._last_saved_step = -1
        self.logger = MetricLogger(log_dir)
        self.select_batch = select_batch or (lambda b: (b, None, None))
        self.profile_dir = profile_dir
        self.profile_steps = profile_steps
        # double-buffered host->device prefetch depth (0 disables): the
        # transfer of batch k+1 overlaps the step on batch k
        self.prefetch = prefetch
        # multi-dataloader validation (reference
        # karrasmodule_new.py:2010-2042: Lightning's val_dataloaders list
        # logs one metric set per loader). dict name->loader or a list
        # (named by index); metrics are prefixed 'val_loss/<name>' etc.
        # Passed alongside or instead of fit()'s single val_loader.
        if isinstance(val_loaders, (list, tuple)):
            val_loaders = {str(i): ld for i, ld in enumerate(val_loaders)}
        self.val_loaders = val_loaders

    def _place(self, tree):
        if self.mesh is None:
            # async host->device copy now (instead of implicitly at the
            # step call) so prefetched batches actually overlap compute
            return jax.tree.map(jax.device_put, tree)
        return shard_batch(tree, self.mesh)

    def _batches(self, loader):
        """Yield placed (x, y, mask) tuples, prefetching ahead so the
        host->device transfer overlaps device compute."""
        def placed():
            for batch in loader:
                x, y, mask = self.select_batch(batch)
                x = self._place(x)
                y = self._place(y) if y is not None else None
                mask = self._place(mask) if mask is not None else None
                yield x, y, mask
        if not self.prefetch:
            yield from placed()
            return
        from diffsci_tpu.data.loading import buffered
        yield from buffered(placed(), self.prefetch)

    def fit(self, state, step_fn, train_loader: Iterable,
            eval_fn: Optional[Callable] = None,
            val_loader: Optional[Iterable] = None):
        key = jax.random.PRNGKey(self.seed)
        step = int(jax.device_get(state.step))
        t_start = time.perf_counter()
        images_seen = 0
        # Preemption safety: TPU pods get SIGTERM'd (spot reclamation,
        # maintenance). Flip a flag on the first signal; the loop
        # breaks at the next step boundary and the save-last block below
        # writes the final checkpoint before return, so --resume picks
        # up where the preemption hit. Second signal restores default
        # handling (a wedged save shouldn't block the kill). Only the
        # main thread may install handlers — skipped elsewhere.
        preempted = []
        installed = {}
        if self.checkpoint_manager is not None:
            import signal
            import threading
            if threading.current_thread() is threading.main_thread():
                def on_signal(signum, frame):
                    preempted.append(signum)
                    signal.signal(signum, installed[signum])
                for sig in (signal.SIGTERM, signal.SIGINT):
                    installed[sig] = signal.signal(sig, on_signal)
        try:
            state, step = self._fit_loop(
                state, step_fn, train_loader, eval_fn, val_loader, key,
                step, t_start, images_seen, preempted)
        finally:
            if installed:
                import signal
                for sig, prev in installed.items():
                    try:
                        signal.signal(sig, prev)
                    except (ValueError, TypeError):
                        pass
        if preempted:
            self.logger.log(step, {"preempted_by_signal": preempted[0]})
        if (self.checkpoint_manager is not None and self.save_last
                and step > 0 and step != self._last_saved_step):
            self.checkpoint_manager.save(step, state)
            self._last_saved_step = step
        if self.checkpoint_manager is not None:
            # drain the async save writer before returning — otherwise a
            # process that exits right after fit() races the background
            # save thread ("cannot schedule new futures after shutdown")
            wait = getattr(self.checkpoint_manager, "wait_until_finished",
                           None)
            if wait is not None:
                wait()
        return state

    def _fit_loop(self, state, step_fn, train_loader, eval_fn, val_loader,
                  key, step, t_start, images_seen, preempted):
        for epoch in range(self.max_epochs):
            if preempted:
                break
            for x, y, mask in self._batches(train_loader):
                key, sub = jax.random.split(key)
                if (self.profile_dir and self.profile_steps
                        and step == self.profile_steps[0]):
                    jax.profiler.start_trace(str(self.profile_dir))
                state, metrics = step_fn(state, sub, x, y, mask)
                if (self.profile_dir and self.profile_steps
                        and step == self.profile_steps[1]):
                    jax.block_until_ready(metrics["train_loss"])
                    jax.profiler.stop_trace()
                step += 1
                images_seen += x.shape[0]
                if step % self.log_every == 0 or step == 1:
                    metrics = jax.device_get(metrics)
                    elapsed = time.perf_counter() - t_start
                    metrics["imgs_per_sec"] = images_seen / max(elapsed, 1e-9)
                    self.logger.log(step, metrics)
                if (self.checkpoint_manager is not None
                        and self.save_every_steps
                        and step % self.save_every_steps == 0):
                    self.checkpoint_manager.save(step, state)
                    self._last_saved_step = step
                if self.max_steps is not None and step >= self.max_steps:
                    break
                if preempted:
                    break
            if preempted:
                break
            if (eval_fn is not None and val_loader is not None
                    and (epoch + 1) % self.val_every_epochs == 0):
                val_metrics = self.validate(state, eval_fn, val_loader, key)
                self.logger.log(step, val_metrics)
                if self.checkpoint_manager is not None:
                    self.checkpoint_manager.save(step, state, val_metrics)
                    self._last_saved_step = step
            if (eval_fn is not None and self.val_loaders is not None
                    and (epoch + 1) % self.val_every_epochs == 0):
                val_metrics = self.validate_multi(state, eval_fn,
                                                  self.val_loaders, key)
                self.logger.log(step, val_metrics)
                if self.checkpoint_manager is not None:
                    self.checkpoint_manager.save(step, state, val_metrics)
                    self._last_saved_step = step
            if self.max_steps is not None and step >= self.max_steps:
                break
        return state, step

    def validate(self, state, eval_fn, val_loader, key) -> dict[str, float]:
        sums = collections.defaultdict(float)
        count = 0
        for batch in val_loader:
            x, y, mask = self.select_batch(batch)
            x = self._place(x)
            y = self._place(y) if y is not None else None
            mask = self._place(mask) if mask is not None else None
            key, sub = jax.random.split(key)
            metrics = jax.device_get(eval_fn(state, sub, x, y, mask))
            for k, v in metrics.items():
                sums[k] += float(v)
            count += 1
        return {k: v / max(count, 1) for k, v in sums.items()}

    def validate_multi(self, state, eval_fn, val_loaders, key
                       ) -> dict[str, float]:
        """Per-loader validation metrics, each key suffixed '/<name>'
        (the reference's multi-val-dataloader logging,
        karrasmodule_new.py:2010-2042: 'valid_loss/dataloader_idx_N').
        Checkpoint best-metric selection stays configurable per loader:
        point the CheckpointManager's best_metric at e.g.
        'valid_loss/ocean'."""
        if isinstance(val_loaders, (list, tuple)):
            val_loaders = {str(i): ld for i, ld in enumerate(val_loaders)}
        out: dict[str, float] = {}
        for name, loader in val_loaders.items():
            key, sub = jax.random.split(key)
            metrics = self.validate(state, eval_fn, loader, sub)
            out.update({f"{k}/{name}": v for k, v in metrics.items()})
        return out


def fit_karras(model, dataset, *, batch_size=32, max_epochs=1,
               max_steps=None, mesh=None, ema=None, optimizer=None,
               seed=0, val_fraction=0.0, log_dir=None,
               checkpoint_manager=None, save_every_steps=None,
               x_shape=None, y_example=None,
               resume_from=None, profile_dir=None, profile_steps=None):
    """One-call convenience: build state + steps + loaders and train a
    KarrasModel (the analogue of the reference's script boilerplate).

    ``resume_from``: path of a checkpoint saved with ``save_checkpoint``
    (or a CheckpointManager directory's step subdir) — the freshly built
    state is used as the restore template, so optimizer/EMA config must
    match the saved run (Lightning resume analogue, SURVEY.md §5).
    """
    from diffsci_tpu.models.karras.train import (create_train_state,
                                                 make_train_step,
                                                 make_eval_step)
    from diffsci_tpu.data.loading import ArrayDataLoader, train_val_split

    if x_shape is None:
        probe = dataset if not isinstance(dataset, tuple) else dataset[0]
        x_shape = (batch_size,) + tuple(probe.shape[1:])
    key = jax.random.PRNGKey(seed)
    state, tx = create_train_state(model, key, x_shape, y_example,
                                   ema=ema, optimizer=optimizer)
    if resume_from is not None:
        from diffsci_tpu.checkpoint import restore_checkpoint
        state = restore_checkpoint(resume_from, state)
    if mesh is not None:
        from diffsci_tpu.parallel import replicate
        state = replicate(state, mesh)
    step_fn = make_train_step(model, tx, ema=ema)
    eval_fn = None
    val_loader = None
    if val_fraction > 0:
        train_ds, val_ds = train_val_split(dataset, val_fraction, seed)
        val_loader = ArrayDataLoader(val_ds, batch_size, shuffle=False)
        eval_fn = make_eval_step(model, ema=ema)
    else:
        train_ds = dataset
    train_loader = ArrayDataLoader(train_ds, batch_size, seed=seed)
    trainer = Trainer(max_epochs=max_epochs, max_steps=max_steps, mesh=mesh,
                      seed=seed, log_dir=log_dir,
                      checkpoint_manager=checkpoint_manager,
                      save_every_steps=save_every_steps,
                      select_batch=model.select_batch,
                      profile_dir=profile_dir, profile_steps=profile_steps)
    state = trainer.fit(state, step_fn, train_loader, eval_fn, val_loader)
    return state, trainer


class HyperparameterManager:
    """Collects flattened hyperparameters from model/optimizer/training
    configs for experiment tracking (reference
    diffsci/models/aux_scripts/hpmanager.py:8-51, which pushed the dict to
    wandb). Here the sink is a JSON file next to the metrics log — wandb is
    not vendored in the TPU image; pass the exported dict to any tracker.
    """

    def __init__(self):
        self.hparams: dict = {}

    def add_model_config(self, model):
        config = getattr(model, "config", None)
        export = getattr(config, "export_description", None)
        if export is not None:
            self._flatten("model", export())

    def add_optimizer_config(self, **kwargs):
        self._flatten("optimizer", kwargs)

    def add_training_config(self, **kwargs):
        self._flatten("training", kwargs)

    def _flatten(self, prefix, d):
        for k, v in d.items():
            key = f"{prefix}/{k}"
            if isinstance(v, dict):
                self._flatten(key, v)
            elif isinstance(v, (int, float, str, bool)) or v is None:
                self.hparams[key] = v
            elif isinstance(v, (list, tuple)):
                self.hparams[key] = list(v)
            else:
                self.hparams[key] = repr(v)

    def export_dict(self) -> dict:
        return dict(self.hparams)

    def save(self, path):
        p = pathlib.Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(self.hparams, indent=2, sort_keys=True))
        return p
