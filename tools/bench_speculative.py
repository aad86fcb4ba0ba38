"""On-chip speculative-decoding measurement (full int4 form, text-only).

Greedy bit-identity is the correctness contract (CPU-pinned in
tests/test_speculative.py); this tool measures the SPEED side on the real
chip:

  1. plain greedy decode tok/s vs prompt-lookup speculative tok/s on the
     same prompt;
  2. the raw cost of a (k+1)-token verify step vs a 1-token decode step —
     the quantity that sets the ceiling: speedup at mean per-step
     production m is m * decode_ms / verify_ms.

Random weights produce unstructured text, so end-to-end acceptance here is
whatever greedy cycling happens to give; trained checkpoints on
lookup-friendly work (extraction, code edit, RAG) accept far more. The
step-cost ratio is the hardware fact this tool pins.

Usage: python -m tools.bench_speculative [--layers N] [--k K]
"""

import argparse
import dataclasses
import json
import time

import jax.numpy as jnp
import numpy as np

from aria_tpu.engine.generate import Engine, GenerationConfig
from aria_tpu.engine.speculative import SpeculativeConfig


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--new-tokens", type=int, default=200)
    ap.add_argument("--k", type=int, default=7)
    ap.add_argument("--ngram", type=int, default=2)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from bench import bench_config, build_int4_params

    cfg = bench_config(64, args.layers)
    t0 = time.perf_counter()
    params = build_int4_params(cfg, with_image=False)
    import jax

    jax.block_until_ready(params)
    print(f"# init {time.perf_counter() - t0:.1f}s", flush=True)

    engine = Engine(params, cfg, max_seq_len=1024, cache_dtype=jnp.int8)
    rng = np.random.RandomState(0)
    prompt = rng.randint(5, 1000, size=48).tolist()
    plain = GenerationConfig(max_new_tokens=args.new_tokens, temperature=0.0,
                             decode_chunk=50)
    spec = dataclasses.replace(
        plain,
        speculative=SpeculativeConfig(k=args.k, ngram=args.ngram,
                                      steps_per_chunk=8),
    )

    results = {}
    for label, g in (("plain", plain), ("spec", spec)):
        runs = []
        for i in range(1 + args.runs):  # first run compiles
            r = engine.generate(prompt, g)
            msg = (f"# {label} run {i}: {r.steps} tok in {r.decode_s:.2f}s "
                   f"= {r.tokens_per_s:.1f} tok/s")
            if r.verify_steps:
                msg += (f" ({r.verify_steps} verify steps, "
                        f"{sum(r.produced_per_step) / r.verify_steps:.2f} "
                        "tok/step)")
            print(msg, flush=True)
            if i:
                runs.append(r)
        results[label] = runs

    p_tok_s = float(np.mean([r.tokens_per_s for r in results["plain"]]))
    s_tok_s = float(np.mean([r.tokens_per_s for r in results["spec"]]))
    decode_ms = 1e3 / p_tok_s
    verify_ms = float(np.mean(
        [r.decode_s / r.verify_steps for r in results["spec"]])) * 1e3
    m = float(np.mean(
        [sum(r.produced_per_step) / r.verify_steps for r in results["spec"]]))
    # how far apart plain and speculative greedy run before int4 numerics at
    # S=1 vs S=k+1 flip a hair-thin argmax (not a correctness gate on random
    # weights; the CPU tests pin exact identity)
    a, b = results["plain"][-1].tokens, results["spec"][-1].tokens
    div = next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), len(a))
    print(json.dumps({
        "metric": "speculative_decode",
        "plain_tok_s": round(p_tok_s, 1),
        "spec_tok_s": round(s_tok_s, 1),
        "speedup": round(s_tok_s / p_tok_s, 3),
        "decode_step_ms": round(decode_ms, 2),
        "verify_step_ms": round(verify_ms, 2),
        "verify_over_decode": round(verify_ms / decode_ms, 3),
        "mean_tok_per_verify_step": round(m, 2),
        "ceiling_speedup_at_full_acceptance": round(
            (args.k + 1) * decode_ms / verify_ms, 2),
        "greedy_first_divergence_vs_plain": div,
        "k": args.k,
    }))


if __name__ == "__main__":
    main()
