"""A/B the ViT attention kernels at the real SigLIP shape on chip.

Compares, at [N, 4900, 16, 72] (one 980px crop -> 4900 patches):
  - stock: jax's Pallas flash attention via ops/flash.py (head_dim padded
    72 -> 128 lanes, SegmentIds for the padding mask)
  - vitk:  ops/vit_flash.py (head_dim on sublanes, 72 -> 80)
across block-size configs, plus the full encode_images wall for whichever
kernel ARIA_TPU_VIT_FLASH selects.

Timing discipline: inputs are perturbed from the previous output each
iteration (the axon relay caches identical executions).

Usage: python -m tools.bench_vit_attn [--iters 8] [--patches 4900]
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args, iters):
    """Relay-proof timing: chain `iters` calls in ONE jitted fori_loop with
    a data dependency between steps (each step's q is perturbed by the
    previous output), so no per-call result can be served from the relay's
    execution cache, then divide the wall by `iters`. Per-call host timing
    through the relay reports fantasy numbers for sub-ms kernels."""
    q, k, v, m = args

    def chained(q, k, v, m):
        def body(_, carry):
            q, acc = carry
            out = fn(q, k, v, m)
            d = (jnp.float32(1e-3) * out.astype(jnp.float32).mean()).astype(q.dtype)
            return q + d, acc + out.astype(jnp.float32).mean()

        _, acc = jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0.0)))
        return acc

    run = jax.jit(chained)
    jax.block_until_ready(run(q, k, v, m))  # compile
    walls = []
    for _ in range(3):
        q = q + jnp.asarray(1e-4, q.dtype)  # new inputs per repetition
        t0 = time.perf_counter()
        jax.block_until_ready(run(q, k, v, m))
        walls.append(time.perf_counter() - t0)
    return min(walls) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--patches", type=int, default=4900)
    ap.add_argument("--crops", type=int, default=1)
    ap.add_argument("--valid", type=int, default=0,
                    help="valid patches per crop (0 = all)")
    args = ap.parse_args()

    from aria_tpu.ops.flash import flash_sdpa
    from aria_tpu.ops.vit_flash import vit_flash

    N, P, H, D = args.crops, args.patches, 16, 72
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(N, P, H, D).astype(np.float32), jnp.bfloat16)
    k = jnp.asarray(rng.randn(N, P, H, D).astype(np.float32), jnp.bfloat16)
    v = jnp.asarray(rng.randn(N, P, H, D).astype(np.float32), jnp.bfloat16)
    nv = args.valid or P
    pm = jnp.asarray(np.arange(P)[None, :] < nv).repeat(N, axis=0)

    flops = 2 * 2 * N * H * nv * nv * D / 1e12  # TFLOP (unpadded)

    stock = lambda q, k, v, m: flash_sdpa(q, k, v, q_valid=m, kv_valid=m)
    ms = timed(stock, (q, k, v, pm), args.iters)
    print(f"RESULT stock_flash     {ms:7.2f} ms  ({flops / (ms / 1e3):.1f} TFLOP/s unpadded)",
          flush=True)

    for bq, bk in [(512, 512), (512, 1024), (1024, 512), (256, 512),
                   (512, 256), (1024, 1024), (2048, 512)]:
        f = lambda q, k, v, m, bq=bq, bk=bk: vit_flash(q, k, v, m, bq=bq, bk=bk)
        try:
            ms = timed(f, (q, k, v, pm), args.iters)
            print(f"RESULT vitk bq={bq:4d} bk={bk:4d} {ms:7.2f} ms  "
                  f"({flops / (ms / 1e3):.1f} TFLOP/s unpadded)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"RESULT vitk bq={bq:4d} bk={bk:4d} FAILED {repr(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
