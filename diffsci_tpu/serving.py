"""Production sampling service: AOT-compiled, shape-bucketed, microbatched.

The reference has no serving story (its scripts sample ad hoc inside
Lightning modules); deploying a diffusion sampler on TPU needs three
things the training-side API deliberately does not provide:

1. **Ahead-of-time compilation** — ``jit`` compiles on first call, so a
   fresh server would pay the 20-40s trace+compile on its first user
   request. ``SamplerService`` lowers and compiles every configured
   (batch, nsteps) variant at startup (``warmup()``), so request latency
   is pure device time from the first request on.
2. **Static shapes under dynamic load** — XLA recompiles on any new
   batch size. Requests are padded up to the nearest configured batch
   bucket and the padding rows sliced off the response.
3. **Request microbatching** — requests larger than the biggest bucket
   are split and the chunks streamed through the compiled executable.

Deliberately framework-light: no HTTP layer (serving stacks differ), a
synchronous ``sample()`` plus the compiled executables as public
attributes, trivially wrapped by any RPC server. Thread-safe for
concurrent callers (device dispatch is serialized by JAX itself; the
service only guards its PRNG state).
"""

from __future__ import annotations

import threading
import time
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp


class SamplerService:
    """AOT-compiled sampling front-end for a KarrasModel-like runtime.

    model: any runtime with ``.sample(variables, key, nsamples, shape,
    nsteps=..., **kw)`` (KarrasModel, SIModel, DDPMModel).
    """

    def __init__(self, model, variables, shape: Sequence[int],
                 batch_buckets: Sequence[int] = (1, 8, 64),
                 nsteps: int = 18, seed: int = 0, sample_kwargs=None):
        self.model = model
        self.variables = variables
        self.shape = tuple(shape)
        self.batch_buckets = tuple(sorted(batch_buckets))
        self.nsteps = nsteps
        self.sample_kwargs = dict(sample_kwargs or {})
        self._key = jax.random.PRNGKey(seed)
        self._lock = threading.Lock()        # PRNG + stats
        self._warm_lock = threading.Lock()   # one-time warmup
        self._compiled: dict[int, object] = {}
        self.stats = {"requests": 0, "samples": 0, "padded": 0,
                      "chunks": 0, "wall_seconds": 0.0}

    # ------------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, path, shape: Sequence[int],
                        ema_stds: Sequence[float] = (0.05, 0.1),
                        ema_profile: int | None = 0,
                        **service_kwargs) -> "SamplerService":
        """Build a ready-to-warm service straight from a training
        checkpoint directory (description.json + orbax state, as written
        by the training scripts). ``ema_stds`` must match the profiles
        the run trained with (scripts default [0.05, 0.1]); pass
        ``ema_profile=None`` to serve raw weights."""
        import jax.random as jrandom
        from diffsci_tpu.checkpoint import (load_description,
                                            restore_checkpoint)
        from diffsci_tpu.models import (EMATracker, create_train_state,
                                        karras_model_from_description)

        desc = load_description(path)
        if not desc:
            raise FileNotFoundError(f"no description.json under {path}")
        model = karras_model_from_description(desc)
        tracker = (EMATracker(ema_type="power",
                              power_function_stds=list(ema_stds))
                   if ema_stds else None)
        template, _ = create_train_state(
            model, jrandom.PRNGKey(0), (2,) + tuple(shape),
            ema=tracker)
        state = restore_checkpoint(path, template)
        if tracker is not None and ema_profile is not None:
            variables = state.ema_variables(tracker,
                                            profile_index=ema_profile)
        else:
            variables = state.variables()
        return cls(model, variables, shape, **service_kwargs)

    # ------------------------------------------------------------------
    def warmup(self, verbose: bool = False) -> dict[int, float]:
        """AOT-compile one executable per batch bucket AND execute each
        once (discarded): the first invocation of a compiled executable
        pays device program load, so running it here makes first-request
        latency equal steady-state. Returns seconds per bucket."""
        times = {}
        for b in self.batch_buckets:
            t0 = time.perf_counter()

            def fn(variables, key, b=b):
                return self.model.sample(variables, key, b, self.shape,
                                         nsteps=self.nsteps,
                                         **self.sample_kwargs)

            lowered = jax.jit(fn).lower(self.variables, self._key)
            self._compiled[b] = lowered.compile()
            # hard-sync with a scalar readback: on remote-tunnel platforms
            # block_until_ready can return before the first execution
            # actually materializes the program device-side, which would
            # push a multi-second first-run cost onto the first request
            out = self._compiled[b](self.variables, self._key)
            float(jnp.sum(out))
            times[b] = time.perf_counter() - t0
            if verbose:
                print(f"warmup bucket {b}: {times[b]:.1f}s")
        # pre-trace the key-split helper too (first sample() otherwise
        # pays its compile)
        self._next_key()
        return times

    def _ensure_warm(self):
        """Thread-safe lazy warmup: concurrent first callers must not see
        a partially-populated executable dict."""
        if set(self._compiled) == set(self.batch_buckets):
            return
        with self._warm_lock:
            if set(self._compiled) != set(self.batch_buckets):
                self.warmup()

    def _bucket(self, n: int) -> int:
        for b in self.batch_buckets:
            if b >= n:
                return b
        return self.batch_buckets[-1]

    def _next_key(self):
        with self._lock:
            self._key, sub = jax.random.split(self._key)
        return sub

    # ------------------------------------------------------------------
    def sample(self, nsamples: int, key=None) -> np.ndarray:
        """Generate ``nsamples`` images. Requests above the largest bucket
        are chunked; others are padded up to the nearest bucket.

        With an explicit ``key`` the full request is deterministic
        regardless of chunking: chunk keys are split from it rather than
        drawn from service state."""
        self._ensure_warm()
        # plan chunks up front so explicit-key requests stay reproducible
        sizes = []
        remaining = nsamples
        while remaining > 0:
            n = min(remaining, self.batch_buckets[-1])
            sizes.append(n)
            remaining -= n
        if not sizes:
            probe = self._compiled[self.batch_buckets[0]]
            shape = (0,) + tuple(self.shape)
            return np.zeros(shape, getattr(probe, "out_dtype", np.float32))
        if key is not None:
            keys = list(jax.random.split(key, len(sizes)))
        else:
            keys = [self._next_key() for _ in sizes]

        out = []
        t0 = time.perf_counter()
        for n, sub in zip(sizes, keys):
            b = self._bucket(n)
            chunk = self._compiled[b](self.variables, sub)
            jax.block_until_ready(chunk)
            out.append(np.asarray(chunk[:n]))
            with self._lock:
                self.stats["chunks"] += 1
                self.stats["padded"] += b - n
        wall = time.perf_counter() - t0
        with self._lock:
            self.stats["requests"] += 1
            self.stats["samples"] += nsamples
            self.stats["wall_seconds"] += wall
        return np.concatenate(out, axis=0)

    # ------------------------------------------------------------------
    def throughput(self) -> float:
        """Lifetime samples per wall-second spent inside sample()
        (includes device-to-host copies; concurrent requests overlap, so
        this under-reports pure device throughput under load)."""
        if self.stats["wall_seconds"] == 0:
            return 0.0
        return self.stats["samples"] / self.stats["wall_seconds"]
