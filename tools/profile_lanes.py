"""Profile the batched (continuous batching) decode step at N lanes.

Usage: python -m tools.profile_lanes [--lanes 32] [--steps 50]
"""

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

import bench
from aria_tpu.engine.server import BatchedEngine


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=32)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--trace-dir", default="/tmp/lanes_trace")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--paged", action="store_true")
    args = ap.parse_args()

    cfg = bench.bench_config(64, 28)
    params = bench.build_int4_params(cfg, with_image=False)
    jax.block_until_ready(params)
    print("# params ready", flush=True)

    if args.paged:
        from aria_tpu.engine.server import PagedBatchedEngine

        srv = PagedBatchedEngine(
            params, cfg, max_lanes=args.lanes, max_seq_len=512, page_size=256,
            temperature=0.8, top_k=200, decode_chunk=25, cache_dtype=jnp.int8,
        )
    else:
        srv = BatchedEngine(
            params, cfg, max_lanes=args.lanes, max_seq_len=512,
            temperature=0.8, top_k=200, decode_chunk=25, cache_dtype=jnp.int8,
        )
    rng = np.random.RandomState(0)

    def submit_all():
        for _ in range(args.lanes):
            srv.submit(rng.randint(5, 1000, size=48).tolist(),
                       max_new_tokens=args.steps)

    submit_all()
    srv.run_until_complete()  # compile + warm
    print("# warm done", flush=True)

    os.system(f"rm -rf {args.trace_dir}")
    submit_all()
    jax.profiler.start_trace(args.trace_dir)
    srv.run_until_complete()
    jax.profiler.stop_trace()

    files = glob.glob(f"{args.trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {args.trace_dir}"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    by_name = defaultdict(float)
    count = defaultdict(int)
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        dur = e.get("dur", 0) / 1e3
        if dur <= 0:
            continue
        by_name[e.get("name", "?")] += dur
        count[e.get("name", "?")] += 1
    print(f"{'total ms':>10} {'per-call us':>12}  {'n':>6}  name")
    for name, ms in sorted(by_name.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{ms:10.2f} {ms/count[name]*1e3:12.1f}  {count[name]:6d}  {name[:95]}")


if __name__ == "__main__":
    main()
