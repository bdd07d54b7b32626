"""Checkpointing: orbax persistence of TrainState (params + opt state + EMA
profiles + step) with JSON config descriptions, plus a models.json registry.

Replaces the reference's Lightning ModelCheckpoint + custom EMA/L2-SP
checkpoint injection (reference karrasmodule_new.py:2159-2188) and the
``models.json`` loader (reference diffsci/models/loader.py:7-87 — which
used ``eval`` on class names; here the config tag registry rebuilds
components declaratively).
"""

from __future__ import annotations

import json
import pathlib
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str | pathlib.Path, state,
                    description: dict[str, Any] | None = None,
                    overwrite: bool = True) -> None:
    """Save a TrainState pytree (and an optional JSON description next to
    it) with orbax. ``overwrite=True`` (default) replaces an existing
    checkpoint at the same path — the save-last semantics of the
    reference's ModelCheckpoint; pass False to refuse clobbering."""
    path = pathlib.Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    target = path / "state"
    if overwrite and target.exists():
        import shutil
        shutil.rmtree(target)
    ckptr.save(target, state)
    ckptr.wait_until_finished()
    if description is not None:
        (path / "description.json").write_text(json.dumps(description,
                                                          indent=2))


def restore_checkpoint(path: str | pathlib.Path, state_template):
    """Restore a TrainState given a template with matching structure
    (e.g. a freshly created state)."""
    path = pathlib.Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_template)
    return ckptr.restore(path / "state", abstract)


def load_description(path: str | pathlib.Path) -> dict[str, Any] | None:
    p = pathlib.Path(path) / "description.json"
    return json.loads(p.read_text()) if p.exists() else None


def extract_submodule(params: Any, prefix: str) -> Any:
    """Pull the sub-tree of ``params`` living under the scope path
    ``prefix`` ('/'-separated module names) — the functional counterpart of
    the reference's prefix-stripping submodule loader
    (reference diffsci/torchutils.py:90-104), used to load e.g. just the
    trained UNet out of a full-model checkpoint into a standalone module.

    Example: ``extract_submodule(full_variables, "unet")`` returns the
    variables a bare ``PUNetG`` expects after training a ``PUNetGCond``
    wrapper. Accepts either a single collection tree (e.g.
    ``variables["params"]``) or a full variables dict whose top-level keys
    are collection names ('params', 'buffers', 'batch_stats', ...) — in the
    latter case each collection containing the scope is extracted and
    collections without it are dropped.
    """
    COLLECTIONS = ("params", "buffers", "batch_stats", "cache")

    def walk(node):
        for seg in prefix.split("/"):
            if not isinstance(node, dict) or seg not in node:
                raise KeyError(seg)
            node = node[seg]
        return node

    if isinstance(params, dict) and any(k in COLLECTIONS for k in params):
        out = {}
        for col, tree in params.items():
            try:
                out[col] = walk(tree)
            except KeyError:
                continue
        if not out:
            raise KeyError(
                f"submodule scope {prefix!r} not found in any collection "
                f"of {list(params)}")
        return out
    try:
        return walk(params)
    except KeyError as e:
        available = list(params.keys()) if isinstance(params, dict) else []
        raise KeyError(
            f"submodule scope {prefix!r} not found at segment {e.args[0]!r};"
            f" available scopes: {available}") from None


class CheckpointManager:
    """Top-k + save-last management (ModelCheckpoint analogue,
    reference scripts/training/train-diffusion-cifar10.py:78-85)."""

    def __init__(self, directory: str | pathlib.Path, max_to_keep: int = 3,
                 monitor: str = "valid_loss", mode: str = "min",
                 keep_cadence: int = 2):
        """``keep_cadence``: how many metricless (crash-safety) saves to
        retain alongside the top-k-by-metric set. Orbax exempts
        checkpoints without metrics from the top-k competition, so
        without this bound a long cadence-saving run would retain every
        one of them."""
        self.directory = pathlib.Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=lambda metrics: metrics.get(monitor, float("inf")),
            best_mode=mode)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        self.keep_cadence = keep_cadence
        self._cadence_steps: list[int] = []

    def save(self, step: int, state, metrics: dict[str, float] | None = None):
        """``metrics=None`` marks a cadence/crash-safety save: it carries no
        monitored metric, so orbax keeps it outside the top-k-by-metric
        competition; this manager bounds those to ``keep_cadence`` itself.

        A metric save at a step that already has a (metricless) save
        replaces it — orbax would otherwise silently drop the duplicate-
        step save, losing the monitored metric and breaking best-step
        tracking for the rest of the run."""
        if metrics is not None:
            metrics = {k: float(v) for k, v in metrics.items()}
            # finish any in-flight async save FIRST so it is visible to the
            # duplicate-step check below; checking all_steps() while a
            # metricless save at the same step is still in flight would
            # miss it and let orbax silently drop this metric save
            self._mgr.wait_until_finished()
            if step in (self._mgr.all_steps() or []):
                self._mgr.delete(step)
            if step in self._cadence_steps:
                self._cadence_steps.remove(step)
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics)
        if metrics is None:
            self._cadence_steps.append(step)
            if len(self._cadence_steps) > self.keep_cadence:
                self._mgr.wait_until_finished()
            while len(self._cadence_steps) > self.keep_cadence:
                old = self._cadence_steps.pop(0)
                try:
                    self._mgr.delete(old)
                except Exception:  # already pruned / replaced
                    pass

    def restore_latest(self, state_template):
        step = self._mgr.latest_step()
        if step is None:
            return None, None
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                state_template)
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract)), step

    def restore_best(self, state_template):
        step = self._mgr.best_step()
        if step is None:
            return None, None
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                state_template)
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract)), step

    def wait_until_finished(self):
        """Drain orbax's async save writer (safe to call any time)."""
        self._mgr.wait_until_finished()

    def synthesize_posthoc_ema(self, state_template, tracker,
                               target_std: float, target_t=None):
        """Post-hoc EMA (arXiv:2312.02696 §3.3) straight from this
        manager's saved run: restore the EMA shadows of every retained
        checkpoint and least-squares-combine them into the
        ``target_std`` profile — the EMA length becomes a post-training
        sweepable. ``tracker`` is the run's EMATracker (declares which
        power stds each profile slot tracked). Returns the synthesized
        param pytree (see models.karras.ema.synthesize_posthoc_ema for
        the math). Accuracy grows with the number of retained
        checkpoints — raise ``keep_cadence``/``max_to_keep`` on runs
        meant for post-hoc sweeps."""
        import jax.numpy as jnp
        from diffsci_tpu.models.karras.ema import solve_posthoc_weights
        if tracker.ema_type != "power":
            raise ValueError("post-hoc synthesis needs power-profile EMA")
        self.wait_until_finished()
        steps = sorted(self._mgr.all_steps())
        if not steps:
            raise ValueError("no checkpoints saved")
        # with update_every=K>1 the shadow was last WRITTEN at the most
        # recent K-boundary (ema.py update: next_update % K == 0), so a
        # checkpoint at a non-boundary step carries a shadow up to K-1
        # steps older than the step number — date it by the boundary.
        # Shadows at effective time 0 are still the init copy and carry
        # no trajectory information; skip them.
        K = max(int(getattr(tracker, "update_every", 1)), 1)
        use_steps = [s for s in steps if (s // K) * K > 0]
        if not use_steps:
            raise ValueError("no checkpoint is past the first EMA update "
                             f"boundary (update_every={K})")
        ts, stds = [], []
        for step in use_steps:
            for s in tracker.power_function_stds:
                ts.append((step // K) * K)
                stds.append(s)
        # weights are solvable from (ts, stds) alone — solve BEFORE
        # restoring so the checkpoints can be accumulated one at a time
        # instead of holding every retained shadow in host memory at once
        if target_t is None:
            target_t = max(ts)
        w = solve_posthoc_weights(ts, stds, target_t, target_std)
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct,
                                state_template)
        acc = None
        idx = 0
        for step in use_steps:
            st = self._mgr.restore(step,
                                   args=ocp.args.StandardRestore(abstract))
            if st.ema is None:
                raise ValueError(
                    f"checkpoint at step {step} carries no EMA state")
            for i in range(len(tracker.power_function_stds)):
                wi = float(w[idx])
                idx += 1
                term = jax.tree.map(
                    lambda leaf: jnp.float32(wi) * leaf.astype(jnp.float32),
                    st.ema.profiles[i])
                acc = term if acc is None else jax.tree.map(
                    jnp.add, acc, term)
            del st  # only the running f32 sum stays resident
        return acc

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


class ModelRegistry:
    """models.json registry: identifier -> {checkpoint, description}
    (reference loader.py:7-87, without eval())."""

    def __init__(self, registry_path: str | pathlib.Path):
        self.registry_path = pathlib.Path(registry_path)

    def _read(self) -> dict:
        if self.registry_path.exists():
            return json.loads(self.registry_path.read_text())
        return {}

    def list_models(self) -> list[str]:
        return sorted(self._read().keys())

    def register(self, name: str, checkpoint_path: str,
                 description: dict[str, Any]) -> None:
        entries = self._read()
        entries[name] = {"checkpoint": str(checkpoint_path),
                         "description": description}
        self.registry_path.write_text(json.dumps(entries, indent=2))

    def entry(self, name: str) -> dict[str, Any]:
        entries = self._read()
        if name not in entries:
            raise KeyError(f"unknown model: {name!r}; "
                           f"known: {sorted(entries)}")
        return entries[name]
