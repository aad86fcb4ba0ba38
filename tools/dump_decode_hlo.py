"""Dump the compiled HLO of the 32-lane batched decode step and report the
largest fusions (name, bytes touched, root expression) so trace entries like
``fusion.168`` can be attributed to source ops.

Usage: python -m tools.dump_decode_hlo [--lanes 32] [--fusion fusion.168 ...]
"""

import argparse
import re

import jax
import jax.numpy as jnp

import bench
from aria_tpu.engine.server import BatchedEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=32)
    ap.add_argument("--out", default="/tmp/decode_hlo.txt")
    ap.add_argument("--fusion", nargs="*", default=[])
    args = ap.parse_args()

    cfg = bench.bench_config(64, 28)
    params = bench.build_int4_params(cfg, with_image=False)
    jax.block_until_ready(params)
    srv = BatchedEngine(
        params, cfg, max_lanes=args.lanes, max_seq_len=512,
        temperature=0.8, top_k=200, decode_chunk=25, cache_dtype=jnp.int8,
    )
    # keyword args so this stays in sync with decode_n's signature
    # (aria_tpu/engine/server.py BatchedEngine._decode_jit)
    lowered = srv._decode_jit.lower(
        srv.params, srv.lane_tok, srv.cache,
        pos=jnp.zeros(args.lanes, jnp.int32),
        active=jnp.ones(args.lanes, bool),
        temps=jnp.full(args.lanes, 0.8, jnp.float32),
        rng=jax.random.PRNGKey(0),
        n_steps=25,
    )
    txt = lowered.compile().as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"# wrote {args.out} ({len(txt)} bytes)")

    for name in args.fusion:
        # print the fusion computation's body
        pat = re.compile(rf"^\s*%?{re.escape(name)} = .*$", re.M)
        m = pat.search(txt)
        if not m:
            print(f"## {name}: not found")
            continue
        print(f"## {name} call site:\n{m.group(0)[:2000]}")
        # find the fused_computation it calls
        cm = re.search(r"calls=([%\w.\-]+)", m.group(0))
        if cm:
            comp = cm.group(1).lstrip("%")
            body = re.search(
                rf"^%?{re.escape(comp)} [^\n]*\{{(.*?)^\}}", txt, re.M | re.S
            )
            if body:
                print(f"### body of {comp}:\n{body.group(1)[:6000]}")


if __name__ == "__main__":
    main()
