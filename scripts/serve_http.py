"""Minimal HTTP sampling server over SamplerService (stdlib only).

A complete, dependency-free example of deploying a trained checkpoint:

    python scripts/serve_http.py --ckpt runs/mnist-edm/ckpt \
        --shape 28 28 1 [--port 8000] [--buckets 8 64] [--nsteps 18]

Endpoints:
    GET  /healthz          -> {"ok": true, "warm": true}
    GET  /stats            -> service counters + lifetime throughput
    POST /sample           -> body {"nsamples": N, "seed": optional int}
                              response {"shape": [...], "samples": [...]}

The service AOT-compiles and executes every batch bucket at startup, so
the first request is already at steady-state latency (serving.py). The
handler is intentionally synchronous: JAX serializes device work anyway,
and SamplerService.sample is thread-safe for the threaded server.
"""

import argparse
import json


from diffsci_tpu.serving import build_server  # noqa: F401,E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--shape", type=int, nargs="+", required=True,
                    help="sample shape without batch dim, e.g. 28 28 1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--host", default="127.0.0.1",
                    help="bind address (loopback by default; no auth)")
    ap.add_argument("--max-nsamples", type=int, default=256)
    ap.add_argument("--buckets", type=int, nargs="+", default=[8, 64])
    ap.add_argument("--nsteps", type=int, default=18)
    ap.add_argument("--ema-stds", type=float, nargs="*", default=[0.05])
    ap.add_argument("--batch-window-ms", type=float, default=0.0,
                    help="aggregate concurrent requests arriving within "
                         "this window into one bucket execution "
                         "(cross-request batching; 0 = off)")
    args = ap.parse_args()

    from diffsci_tpu.serving import SamplerService

    svc = SamplerService.from_checkpoint(
        args.ckpt, tuple(args.shape),
        ema_stds=args.ema_stds or None,
        batch_buckets=tuple(args.buckets), nsteps=args.nsteps,
        batch_window_ms=args.batch_window_ms)
    print("warming up...", flush=True)
    times = svc.warmup(verbose=True)
    print(f"ready on {args.host}:{args.port} (warmup {times})", flush=True)
    build_server(svc, args.port, host=args.host,
                 max_nsamples=args.max_nsamples).serve_forever()


if __name__ == "__main__":
    main()
