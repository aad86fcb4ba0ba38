"""Sweep ARIA_TPU_FLASH_BQ/BK for the ViT's 4900-patch flash attention.

VERDICT r03 item 7 / BENCH_NOTES open item: the 980px ViT runs at ~28% MFU
and is the TTFT device-time floor (75 ms of 192 ms). The flash kernel's
block sizes are exposed as env knobs (ops/flash.py); this sweeps them on
the real chip and reports warm per-encode wall time per config.

flash.py reads the env at TRACE time, so each config gets a FRESH jax.jit
wrapper (new closure => new cache entry) — one process, no re-init.

Timing discipline: the axon relay caches identical executions, so each
iteration perturbs the input from the previous output (BENCH_NOTES
methodology).

Usage: python -m tools.sweep_vit_flash [--iters 8]
"""

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

CONFIGS = [
    (512, 512),  # default
    (256, 512),
    (512, 256),
    (256, 256),
    (1024, 512),
    (512, 1024),
    (1024, 1024),
    (128, 512),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--image", type=int, default=980)
    args = ap.parse_args()

    from aria_tpu.config import AriaConfig
    from aria_tpu.models.aria import encode_images
    from aria_tpu.models.projector import init_projector_params
    from aria_tpu.models.vit import init_vit_params
    from aria_tpu.ops.quant import quantize_projector_params, quantize_vit_params

    cfg = AriaConfig.aria_25b()
    params = {
        "vision": jax.jit(quantize_vit_params, donate_argnums=0)(
            init_vit_params(jax.random.PRNGKey(1), cfg.vision, jnp.bfloat16)),
        "projector": jax.jit(quantize_projector_params, donate_argnums=0)(
            init_projector_params(jax.random.PRNGKey(2), cfg.projector, jnp.bfloat16)),
    }
    jax.block_until_ready(params)
    print("# vision params ready", flush=True)

    S = args.image
    pixels = jnp.asarray(np.random.RandomState(0).randn(1, 3, S, S), jnp.float32)
    mask = jnp.ones((1, S, S), bool)

    results = []
    for bq, bk in CONFIGS:
        # both kernels' knobs: ops/flash.py reads FLASH_*, ops/vit_flash.py
        # (via models/vit.py) reads VIT_* — the sweep covers whichever the
        # ARIA_TPU_VIT_FLASH switch selects
        os.environ["ARIA_TPU_FLASH_BQ"] = str(bq)
        os.environ["ARIA_TPU_FLASH_BK"] = str(bk)
        os.environ["ARIA_TPU_VIT_BQ"] = str(bq)
        os.environ["ARIA_TPU_VIT_BK"] = str(bk)
        enc = jax.jit(lambda p, pv, pm, _cfg=cfg: encode_images(p, _cfg, pv, pm))
        try:
            feats = jax.block_until_ready(enc(params, pixels, mask))  # compile
            times = []
            px = pixels
            for _ in range(args.iters):
                # perturb the input from the last output: defeats relay caching
                px = px + jnp.float32(1e-6) * feats.astype(jnp.float32).mean()
                t0 = time.perf_counter()
                feats = jax.block_until_ready(enc(params, px, mask))
                times.append(time.perf_counter() - t0)
            ms = float(np.mean(sorted(times)[: max(1, args.iters // 2)])) * 1e3
            results.append((bq, bk, ms))
            print(f"RESULT bq={bq:5d} bk={bk:5d}  {ms:7.1f} ms/encode "
                  f"(min {min(times)*1e3:.1f})", flush=True)
        except Exception as e:  # noqa: BLE001 — a config may not compile
            print(f"RESULT bq={bq:5d} bk={bk:5d}  FAILED: {repr(e)[:120]}",
                  flush=True)

    if results:
        best = min(results, key=lambda r: r[2])
        base = next((r for r in results if r[:2] == (512, 512)), best)
        print(f"# best: bq={best[0]} bk={best[1]} {best[2]:.1f} ms "
              f"({base[2] / best[2]:.2f}x vs default {base[2]:.1f} ms)")


if __name__ == "__main__":
    main()
