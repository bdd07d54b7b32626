"""Autotune flash-attention block sizes on the real TPU.

The kernel defaults to block_q<=512, block_k<=1024 (flash_attention.py
_pick_block). This sweep times fwd and fwd+bwd across (block_q, block_k)
at the shapes the framework actually runs — the 3D PUNetG bottleneck
(T=4096) and the larger serving/video shapes — and prints a JSON table
so better defaults are measurement-driven.

Run ON THE TPU. Each timing hard-syncs with a scalar readback (the axon
tunnel's block_until_ready can return early — docs/design.md Honest
benchmarking).
"""

import itertools
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def time_call(fn, *args, steps=20, warmup=3, repeats=3):
    import jax.numpy as jnp
    for _ in range(warmup):
        out = fn(*args)
    float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    rates = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        rates.append((time.perf_counter() - t0) / steps)
    return float(np.median(rates)) * 1e3  # ms


def main():
    import jax
    import jax.numpy as jnp
    from diffsci_tpu.kernels.flash_attention import flash_attention

    results = {}
    shapes = [
        # (B, H, T, d, dtype) — vol3d bottleneck, mid, large-serving;
        # round-4 ADVICE follow-up: f32 and d=128 arms so the bq default
        # is measured beyond the original v5e/bf16/d<=64 sweep
        (8, 2, 4096, 32, "bf16"),
        (8, 2, 4096, 64, "bf16"),
        (2, 4, 8192, 64, "bf16"),
        (1, 8, 16384, 64, "bf16"),
        (8, 2, 4096, 64, "f32"),
        (1, 8, 16384, 64, "f32"),
        (2, 4, 8192, 128, "bf16"),
    ]
    if "--quick" in sys.argv:
        shapes = shapes[4:]
    bqs = [256, 512, 1024]
    bks = [512, 1024, 2048]

    for (B, H, T, d, dt) in shapes:
        dtype = jnp.bfloat16 if dt == "bf16" else jnp.float32
        key = jax.random.PRNGKey(0)
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (B, H, T, d), dtype)
        k = jax.random.normal(kk, (B, H, T, d), dtype)
        v = jax.random.normal(kv, (B, H, T, d), dtype)
        tag = f"B{B}H{H}T{T}d{d}{dt}"
        results[tag] = {}

        def loss(q, k, v, bq, bk):
            return jnp.sum(flash_attention(q, k, v, block_q=bq,
                                           block_k=bk) ** 2)

        for bq, bk in itertools.product(bqs, bks):
            if bq > T or bk > T:
                continue
            fwd = jax.jit(lambda q, k, v, bq=bq, bk=bk:
                          flash_attention(q, k, v, block_q=bq, block_k=bk))
            bwd = jax.jit(jax.grad(lambda q, k, v, bq=bq, bk=bk:
                                   loss(q, k, v, bq, bk), argnums=(0, 1, 2)))
            try:
                f_ms = time_call(fwd, q, k, v)
                b_ms = time_call(bwd, q, k, v)
            except Exception as e:  # noqa: BLE001 — record and continue
                results[tag][f"bq{bq}_bk{bk}"] = f"FAIL {str(e)[:60]}"
                continue
            results[tag][f"bq{bq}_bk{bk}"] = {
                "fwd_ms": round(f_ms, 3), "fwdbwd_ms": round(f_ms + b_ms, 3)}
        # the current default pick for this T
        ok = [(v["fwdbwd_ms"], k) for k, v in results[tag].items()
              if isinstance(v, dict)]
        results[tag]["best"] = min(ok)[1] if ok else None
    results["device"] = str(jax.devices()[0])
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    import sys
    if "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__)
        sys.exit(0)
    main()
