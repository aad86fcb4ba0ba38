"""Micro-benchmark: Pallas kv_cache_write vs the XLA scatter path.

Usage: python -m tools.bench_kv_write [--lanes 32] [--heads 20] [--seq 512]
       [--dim 128] [--layers 28] [--dtype int8|bfloat16|float32] [--iters 1000]
"""

import argparse
import time

import jax
import jax.numpy as jnp

from aria_tpu.ops.kv_write import kv_cache_write


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--lanes", type=int, default=32)
    ap.add_argument("--heads", type=int, default=20)
    ap.add_argument("--seq", type=int, default=512)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--dtype", default="int8",
                    choices=["int8", "bfloat16", "float32"])
    ap.add_argument("--iters", type=int, default=1000)
    args = ap.parse_args()

    L, B, H, S, D = args.layers, args.lanes, args.heads, args.seq, args.dim
    dt = jnp.dtype(args.dtype)

    def rand(key, shape):
        if dt == jnp.int8:
            return jax.random.randint(key, shape, -128, 127, jnp.int8)
        return jax.random.normal(key, shape, dt)

    kc = rand(jax.random.PRNGKey(0), (L, B, H, S, D))
    vc = rand(jax.random.PRNGKey(8), (L, B, H, S, D))
    kn = rand(jax.random.PRNGKey(1), (B, H, D))
    vn = rand(jax.random.PRNGKey(2), (B, H, D))
    pos = jax.random.randint(jax.random.PRNGKey(5), (B,), 0, S, jnp.int32)
    rows = jnp.arange(B, dtype=jnp.int32)
    li = jnp.int32(7)
    N = args.iters

    @jax.jit
    def loop_pallas(kc, vc):
        def body(i, c):
            k, v = c
            return kv_cache_write(k, v, li, rows, (pos + i) % S, kn, vn)
        return jax.lax.fori_loop(0, N, body, (kc, vc))

    bi = jnp.arange(B)[:, None, None]
    hi = jnp.arange(H)[None, :, None]

    @jax.jit
    def loop_scatter(kc, vc):
        def body(i, c):
            k, v = c
            s2 = ((pos + i) % S)[:, None, None]
            return (k.at[li, bi, hi, s2].set(kn[:, :, None, :]),
                    v.at[li, bi, hi, s2].set(vn[:, :, None, :]))
        return jax.lax.fori_loop(0, N, body, (kc, vc))

    for name, f in [("pallas", loop_pallas), ("scatter", loop_scatter)]:
        out = f(kc, vc)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = f(kc, vc)
        jax.block_until_ready(out)
        dt_s = time.perf_counter() - t0
        print(f"{name}: {dt_s / N * 1e6:.2f} us per K+V write pair "
              f"({B} lanes, {args.dtype})")


if __name__ == "__main__":
    main()
