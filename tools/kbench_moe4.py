"""Microbenchmark the int4 decode-MoE kernel in isolation.

Builds a small layer stack at flagship width (E=66, I=1664, D=2560) and
times `iters` chained kernel invocations inside ONE jit (a fori_loop whose
carry feeds each output back into the next input), so per-call dispatch is
excluded and the number is the pure device kernel time per layer.

Usage: python tools/kbench_moe4.py [--layers 4] [--iters 200] [--t 1]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from aria_tpu.ops import moe_decode_kernel as K
from aria_tpu.ops.quant import int4_group_count


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--t", type=int, default=1, help="tokens (lanes)")
    ap.add_argument("--k", type=int, default=8, help="routing slots per token")
    ap.add_argument("--ft", type=int, default=1664)
    ap.add_argument("--a8", action="store_true",
                    help="W4A8 variant (integer MXU dots, the serving default)")
    args = ap.parse_args()

    L, E, I, D = args.layers, 66, 1664, 2560
    rng = np.random.RandomState(0)
    w1q4 = jnp.asarray(rng.randint(-128, 128, size=(L, E, 2 * I, D // 2)), jnp.int8)
    w2q4 = jnp.asarray(rng.randint(-128, 128, size=(L, E, I, D // 2)), jnp.int8)
    w1sg = jnp.asarray(rng.rand(L, E, 8, 2 * I), jnp.float32) * 0.01
    w2s8 = jnp.asarray(rng.rand(L, E, 8, D), jnp.float32) * 0.01
    x = jnp.asarray(rng.randn(args.t, D), jnp.bfloat16)
    idx = jnp.asarray(
        np.stack([rng.choice(E, size=args.k, replace=False) for _ in range(args.t)]),
        jnp.int32,
    )
    wts = jnp.asarray(rng.rand(args.t, args.k), jnp.float32)

    @jax.jit
    def run(x):
        def body(i, x):
            out = K.moe_decode_int4(
                x, idx, wts, w1q4, w1sg, w2q4, w2s8, i % L, ft=args.ft,
                act_int8=args.a8,
            )
            return (x + 0.0001 * out).astype(x.dtype)

        return jax.lax.fori_loop(0, args.iters, body, x)

    run(x).block_until_ready()  # compile
    t0 = time.perf_counter()
    run(x).block_until_ready()
    dt = time.perf_counter() - t0
    us = dt / args.iters * 1e6
    gb = args.k * (2 * I * D // 2 + I * D // 2) / 1e9 if args.t == 1 else float("nan")
    print(f"{us:.1f} us/layer-call  ({args.iters} iters, T={args.t}, k={args.k})")
    if args.t == 1:
        print(f"nibble traffic {gb*1e3:.1f} MB/call -> {gb/ (us/1e6):.0f} GB/s effective")


if __name__ == "__main__":
    main()
