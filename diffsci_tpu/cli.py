"""Unified command-line entry point: ``python -m diffsci_tpu <cmd>``.

The reference drives everything through per-task scripts (reference
scripts/training/*.py); those are mirrored under ``scripts/`` here, and
this CLI adds the installed-package surface for the deployment-side
flows that don't need a training recipe:

    python -m diffsci_tpu info   --ckpt runs/mnist-edm/ckpt
    python -m diffsci_tpu sample --ckpt runs/mnist-edm/ckpt \
        --shape 28 28 1 --nsamples 64 --out samples.npy [--grid grid.png]
    python -m diffsci_tpu serve  --ckpt runs/mnist-edm/ckpt \
        --shape 28 28 1 --port 8000

``sample``/``serve`` load the checkpoint through the same
description.json -> model factory -> orbax restore path the
SamplerService uses, so anything a training script saved is loadable.
"""

from __future__ import annotations

import argparse
import json
import sys


def _add_ckpt_args(ap, with_shape=True):
    ap.add_argument("--ckpt", required=True,
                    help="checkpoint dir (description.json + orbax state)")
    if with_shape:
        ap.add_argument("--shape", type=int, nargs="+", required=True,
                        help="sample shape without batch dim, e.g. 28 28 1")
    ap.add_argument("--ema-stds", type=float, nargs="*", default=[0.05],
                    help="EMA profiles the run trained with; empty = raw "
                         "weights")
    ap.add_argument("--nsteps", type=int, default=18)


def cmd_info(args):
    from diffsci_tpu.checkpoint import load_description

    desc = load_description(args.ckpt)
    if not desc:
        print(f"no description.json under {args.ckpt}", file=sys.stderr)
        return 1
    print(json.dumps(desc, indent=1, default=str))
    return 0


def _service(args, **extra):
    from diffsci_tpu.serving import SamplerService

    return SamplerService.from_checkpoint(
        args.ckpt, tuple(args.shape),
        ema_stds=args.ema_stds or None,
        nsteps=args.nsteps, **extra)


def cmd_sample(args):
    import numpy as np
    import jax

    svc = _service(args, batch_buckets=(min(args.nsamples, 64),))
    key = (jax.random.PRNGKey(args.seed) if args.seed is not None
           else None)
    out = svc.sample(args.nsamples, key=key)
    np.save(args.out, out)
    print(f"wrote {args.out} {out.shape}")
    if args.grid:
        from diffsci_tpu.utils import save_image_grid
        save_image_grid(args.grid, out)
        print(f"wrote {args.grid}")
    svc.close()
    return 0


def cmd_serve(args):
    from diffsci_tpu.serving import build_server

    svc = _service(args, batch_buckets=tuple(args.buckets),
                   batch_window_ms=args.batch_window_ms)
    print("warming up...", flush=True)
    times = svc.warmup(verbose=True)
    print(f"ready on {args.host}:{args.port} (warmup {times})", flush=True)
    build_server(svc, args.port, host=args.host,
                 max_nsamples=args.max_nsamples).serve_forever()
    return 0


def cmd_profile(args):
    from diffsci_tpu import profiling

    path = (args.logdir if args.logdir.endswith(".xplane.pb")
            else profiling.find_xplane(args.logdir))
    space = profiling.parse_xspace(path)
    print(f"# {path}")
    if args.overview:
        for row in profiling.plane_overview(space)[:20]:
            print(f"{row['busy_ms']:10.3f} ms {row['events']:7d} ev  "
                  f"{row['plane']} :: {row['line']}")
        print()
    rows = profiling.op_summary(space, plane=args.plane, line=args.line)
    print(profiling.format_summary(rows, top=args.top))
    busy = profiling.device_busy_fraction(space, plane=args.plane)
    print(f"\nbusiest-line occupancy ({args.plane}): {busy:.1%}")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="python -m diffsci_tpu",
                                 description=__doc__.split("\n\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("info", help="print a checkpoint's description")
    p.add_argument("--ckpt", required=True)
    p.set_defaults(fn=cmd_info)

    p = sub.add_parser("sample", help="sample from a checkpoint")
    _add_ckpt_args(p)
    p.add_argument("--nsamples", type=int, default=64)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--out", default="samples.npy")
    p.add_argument("--grid", default=None,
                   help="optional PNG image-grid path")
    p.set_defaults(fn=cmd_sample)

    p = sub.add_parser("serve", help="HTTP sampling server")
    _add_ckpt_args(p)
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--host", default="127.0.0.1",
                   help="bind address (loopback by default; the endpoint "
                        "has no auth — expose deliberately)")
    p.add_argument("--max-nsamples", type=int, default=256,
                   help="per-request sample cap (bounds JSON body size)")
    p.add_argument("--buckets", type=int, nargs="+", default=[8, 64])
    p.add_argument("--batch-window-ms", type=float, default=0.0)
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser(
        "profile",
        help="summarize a jax.profiler trace (no TensorBoard needed)")
    p.add_argument("logdir", help="profiler logdir or .xplane.pb path")
    p.add_argument("--plane", default="tpu",
                   help="substring filter on plane names ('tpu'/'cpu')")
    p.add_argument("--line", default=None,
                   help="substring filter on line names (e.g. 'XLA Ops')")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--overview", action="store_true",
                   help="also list all (plane, line) busy times")
    p.set_defaults(fn=cmd_profile)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
