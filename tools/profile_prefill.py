"""Profile the image-prefill path (TTFT) of the full int4 model.

Runs one warm generate(max_new_tokens=1) under jax.profiler, then aggregates
device-op durations from the trace so the TTFT budget is attributable:
ViT vs projector vs LM prefill vs dispatch gaps.

Usage: python -m tools.profile_prefill [--layers 28] [--new-tokens 1]
"""

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict

import jax
import numpy as np

import bench
from aria_tpu.engine.generate import Engine, GenerationConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--new-tokens", type=int, default=1)
    ap.add_argument("--trace-dir", default="/tmp/prefill_trace")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    cfg = bench.bench_config(64, args.layers)
    params = bench.build_int4_params(cfg, with_image=True)
    jax.block_until_ready(params)
    print("# params ready", flush=True)

    engine = Engine(params, cfg, max_seq_len=1024, cache_dtype=jax.numpy.int8)
    n_q = cfg.projector.query_count((980 // 14) ** 2)
    prompt = [11] * 8 + [cfg.image_token_id] * n_q + [13] * 8
    pixels = np.random.RandomState(0).randn(1, 3, 980, 980).astype(np.float32)
    mask = np.ones((1, 980, 980), bool)
    gen = GenerationConfig(max_new_tokens=args.new_tokens, temperature=0.0)

    for i in range(2):  # compile + warm
        r = engine.generate(prompt, gen, pixel_values=pixels, pixel_mask=mask)
        print(f"# warm {i}: prefill {r.prefill_s*1e3:.0f}ms", flush=True)

    os.system(f"rm -rf {args.trace_dir}")
    jax.profiler.start_trace(args.trace_dir)
    r = engine.generate(prompt, gen, pixel_values=pixels, pixel_mask=mask)
    jax.profiler.stop_trace()
    print(f"# traced: prefill {r.prefill_s*1e3:.0f}ms", flush=True)

    files = glob.glob(f"{args.trace_dir}/**/*.trace.json.gz", recursive=True)
    assert files, f"no trace under {args.trace_dir}"
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)

    events = [e for e in trace.get("traceEvents", []) if e.get("ph") == "X"]
    # device lanes: pid names containing TPU/device; fall back to all complete
    # events that have a dur
    by_name = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for e in events:
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        if dur <= 0:
            continue
        args_d = e.get("args") or {}
        # keep XLA op events (they carry 'long_name' or hlo metadata) and
        # big named regions
        by_name[name] += dur
        count[name] += 1
        total += dur
    top = sorted(by_name.items(), key=lambda kv: -kv[1])[: args.top]
    print(f"{'ms':>10}  {'n':>5}  name")
    for name, ms in top:
        print(f"{ms:10.2f}  {count[name]:5d}  {name[:110]}")
    per = {n: (by_name[n] / count[n]) for n in by_name}
    interesting = [n for n in by_name if any(
        s in n for s in ("moe_decode", "decode_attention", "dense_int4",
                         "moe_prefill", "flash", "while", "fusion"))]
    print("\nper-call us for kernel ops:")
    for n in sorted(interesting, key=lambda n: -by_name[n])[:20]:
        print(f"{per[n]*1e3:10.1f} us x {count[n]:5d}  {n[:100]}")


if __name__ == "__main__":
    main()
