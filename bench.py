"""Decode-throughput benchmark (reference methodology: gptfast/benchmark.py).

Workload mirrors the reference's headline number (25.2 eager / 130.0 compiled
tok/s on 1x H100): single-image multimodal prompt, 200 new tokens, top-k 200,
temperature 0.8, 2 warmup + 5 timed runs.

DEFAULT: the FULL 25.3B / 64-expert flagship, all experts resident on ONE
v5e chip (16GB HBM) via int4 expert stacks + int4 attention projections +
int8 ViT/head/embed + int8 KV — the same whole-model-on-one-accelerator
deployment as the reference's headline (README.md:41, on an 80GB GPU) at
1/5th the memory.

`--shard8`: round-1 mode — flagship width/depth with 8 experts per layer,
int8 weights: the exact per-chip shard of the 64-expert flagship under
expert-parallel-8 on a v5e-8 (per-token HBM traffic equals the flagship's
~3.9B-param active set). `--bf16` for matched-precision comparisons.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from aria_tpu.config import AriaConfig, ProjectorConfig, TextConfig, VisionConfig
from aria_tpu.engine.generate import Engine, GenerationConfig
from aria_tpu.models.aria import init_aria_params

BASELINE_TOK_S = 130.0  # gptfast/README.md:19-22, torch.compile on 1x H100


def bench_config(num_experts: int = 8, num_layers: int = 28) -> AriaConfig:
    base = AriaConfig.aria_25b()
    return AriaConfig(
        vision=base.vision,
        projector=base.projector,
        text=TextConfig(num_experts=num_experts, num_layers=num_layers),
    )


def bench_batched(params, cfg, args):
    """Aggregate decode throughput with the continuous-batching server."""
    from aria_tpu.engine.server import BatchedEngine

    n = args.lanes
    max_seq = args.max_seq or 512
    cache_dtype = "int4" if args.kv_int4 else (jnp.int8 if args.kv_int8 else jnp.bfloat16)
    if args.paged:
        from aria_tpu.engine.server import PagedBatchedEngine

        srv = PagedBatchedEngine(
            params, cfg, max_lanes=n, max_seq_len=max_seq, page_size=256,
            temperature=0.8, top_k=200, decode_chunk=50,
            cache_dtype=cache_dtype,
        )
    else:
        srv = BatchedEngine(
            params, cfg, max_lanes=n, max_seq_len=max_seq,
            temperature=0.8, top_k=200, decode_chunk=50,
            cache_dtype=cache_dtype,
        )
    rng = np.random.RandomState(0)

    def submit_all():
        for i in range(n):
            srv.submit(rng.randint(5, 1000, size=48).tolist(),
                       max_new_tokens=args.new_tokens)

    # warmup (compiles prefill + batched decode)
    submit_all()
    finished = srv.run_until_complete()
    errs = [f.error for f in finished if getattr(f, "error", None)]
    if errs:
        raise SystemExit(f"# {len(errs)} requests errored, e.g.: {errs[0]}")
    results = []
    for r in range(args.runs):
        submit_all()
        t0 = time.perf_counter()
        finished = srv.run_until_complete()
        dt = time.perf_counter() - t0
        total = sum(len(f.generated) for f in finished)
        results.append(total / dt)
        print(f"# run {r}: {total} tokens across {n} lanes in {dt:.2f}s = {total/dt:.1f} tok/s", flush=True)
    tok_s = float(np.mean(results))
    suffix = "_full64_int4" if args.int4 else ("" if args.bf16 else "_int8")
    if args.kv_int4:
        suffix += "_kv4"
    elif args.kv_int8:
        suffix += "_kv8"
    if args.paged:
        suffix += "_paged"
    print(json.dumps({
        "metric": f"decode_tok_s_1chip_{n}lanes{suffix}",
        "value": round(tok_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 3),
    }))


def bench_train(args):
    """LoRA fine-tune throughput on one chip (reference envelope:
    README.md:148-151, one 80GB GPU at 2k seq). Workload: the EP-8 per-chip
    shard (5.28B bf16 base, frozen) + grouped-GEMM LoRA adapters, text-only
    batch at 2k tokens, grad checkpointing."""
    import time as _t

    from aria_tpu.models.aria import init_aria_params
    from aria_tpu.train.lora import LoraConfig, init_lora_params
    from aria_tpu.train.step import (
        TrainConfig, TrainState, lora_train_step, make_lora_optimizer,
    )

    cfg = bench_config(args.experts, args.layers)
    B, S = args.train_batch, args.train_seq
    params = jax.jit(
        lambda k: init_aria_params(k, cfg, dtype=jnp.bfloat16)
    )(jax.random.PRNGKey(0))
    if args.qlora:
        # QLoRA-style: int8 frozen base (~4x less HBM than bf16) — the freed
        # memory buys bigger --train-batch / --train-seq on the same chip
        from aria_tpu.ops.quant import quantize_params

        params = jax.jit(quantize_params, donate_argnums=0)(params)
    jax.block_until_ready(params)

    lc = LoraConfig(rank=16)
    lora = init_lora_params(jax.random.PRNGKey(1), cfg, lc)
    tc = TrainConfig(gradient_checkpointing=True)
    optimizer = make_lora_optimizer(tc)
    state = TrainState(lora, optimizer.init(lora), jnp.int32(0))

    rng = np.random.RandomState(0)
    tokens = rng.randint(5, cfg.text.vocab_size - 1, size=(B, S)).astype(np.int32)
    batch = {
        "input_ids": jnp.asarray(tokens),
        "labels": jnp.asarray(tokens),
    }

    step = jax.jit(
        lambda st, b, p: lora_train_step(
            st, b, p, cfg, lc.scale, optimizer, remat=tc.gradient_checkpointing
        )
    )
    state, metrics = step(state, batch, params)  # compile
    jax.block_until_ready(state)
    times = []
    for r in range(args.warmup + args.runs):
        t0 = _t.perf_counter()
        state, metrics = step(state, batch, params)
        jax.block_until_ready(state)
        dt = _t.perf_counter() - t0
        if r >= args.warmup:
            times.append(dt)
        print(f"# step {r}: {dt*1e3:.0f}ms, loss={float(metrics['loss']):.3f}", flush=True)
    tok_s = B * S / float(np.mean(times))
    print(json.dumps({
        "metric": f"{'q' if args.qlora else ''}lora_train_tok_s_1chip_ep8_shard_equiv_b{B}_s{S}",
        "value": round(tok_s, 2),
        "unit": "tokens/s",
        "vs_baseline": 0.0,  # reference publishes envelopes, not train tok/s
    }))


def _probe_headroom(gb: float) -> None:
    """Allocate-and-free a contiguous HBM block to prove the prefill working
    set fits BEFORE spending a prefill compile. The full-model residency is
    ~13.3GB of ~15.75 usable (BENCH_NOTES); session-to-session HBM variance
    OOM'd the r03 driver run, so fail fast here and let the parent process
    fall back to the shard8 workload instead of recording zero throughput."""
    n = int(gb * (1 << 30)) // 4
    probe = jnp.zeros((n,), jnp.float32)
    jax.block_until_ready(probe)
    del probe


def _run_child(extra_args, env, timeout):
    """Run bench.py in a child process; return (rc, parsed-JSON-line-or-None).
    Output is captured and re-echoed with the child's own JSON line turned
    into a comment, so the parent's merged line stays the LAST JSON on
    stdout (the driver parses the last JSON line)."""
    try:
        proc = subprocess.run(
            [sys.executable, __file__, *extra_args], env=env, timeout=timeout,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        rc, out = proc.returncode, proc.stdout or ""
    except subprocess.TimeoutExpired as e:
        rc = -9
        out = e.output.decode() if isinstance(e.output, bytes) else (e.output or "")
    parsed = None
    for line in out.splitlines():
        if line.startswith("{") and '"metric"' in line:
            try:
                parsed = json.loads(line)
                print(f"# child metric: {line}", flush=True)
                continue
            except json.JSONDecodeError:
                pass
        print(line, flush=True)
    return rc, parsed


def _run_with_fallback() -> None:
    """Driver-default entry: run the full-25.3B int4 workload in a child
    process; if it dies (OOM / crash / hang), re-run the EP-8-shard int8
    workload in a FRESH process (clean HBM) with an honest metric name.

    On success, a second child measures the 32-lane continuous-batching
    aggregate on the same full int4 form (int4 KV, text lanes) and its
    number is folded into the final JSON line's "extra" — so the driver
    records single-stream, TTFT, AND aggregate every round (VERDICT r04
    item 5). The lanes child is best-effort: any failure keeps the primary
    metric intact."""
    env = dict(os.environ, ARIA_TPU_BENCH_CHILD="1")
    rc, line = _run_child([], env, timeout=1200)
    if rc != 0 or line is None:
        print(f"# full-model int4 attempt failed (rc={rc}); "
              "falling back to the EP-8 shard int8 workload in a fresh process", flush=True)
        rc2, line = _run_child(["--shard8", "--fallback"], env, timeout=1200)
        if rc2 != 0 or line is None:
            sys.exit(rc2 or 1)
        print(json.dumps(line))
        sys.exit(0)

    def _child_with_retry(child_args, timeout, what):
        """Extras children are best-effort AND retried once: the axon relay's
        D2H poisoning (see .claude/skills/verify — a churned relay session
        starts failing tiny device->host reads with a terse
        RESOURCE_EXHAUSTED while compute stays healthy) is transient
        per-process, and a fresh child a minute later typically succeeds."""
        for attempt in range(2):
            rc_x, parsed = _run_child(child_args, env, timeout=timeout)
            if rc_x == 0 and parsed is not None:
                return parsed
            print(f"# {what} child failed (rc={rc_x}, attempt {attempt + 1}); "
                  "primary metric unaffected", flush=True)
            time.sleep(60)
        return None

    if os.environ.get("ARIA_TPU_BENCH_LANES", "32") != "0":
        lanes = os.environ.get("ARIA_TPU_BENCH_LANES", "32")
        agg = _child_with_retry(
            ["--int4", "--lanes", lanes, "--no-image", "--max-seq", "320",
             "--kv-int4", "--runs", "3"],
            900, "lanes",
        )
        if agg is not None:
            line.setdefault("extra", {})[f"agg_{lanes}lane_tok_s"] = agg["value"]
            line["extra"][f"agg_{lanes}lane_vs_baseline"] = agg["vs_baseline"]

    # Long-context extra: a 32K one-shot prefill + decode on the SAME full
    # int4 form (int4 KV — the whole 24.6B model + 32K KV fit one chip with
    # 1GB headroom after the MoE/qkv/RoPE temp-range fixes, BENCH_NOTES r5).
    # Best-effort like the lanes child; first-ever compile of the 32K
    # program is ~4 min, relay-cached after.
    ctx = os.environ.get("ARIA_TPU_BENCH_CTX", "32768")
    if ctx != "0":
        cx = _child_with_retry(
            ["--int4", "--ctx", ctx, "--kv-int4", "--new-tokens", "64",
             "--warmup", "1", "--runs", "3"],
            1200, "ctx",
        )
        if cx is not None:
            line.setdefault("extra", {})[f"ctx{int(ctx)//1024}k_tok_s"] = cx["value"]
            line["extra"][f"ctx{int(ctx)//1024}k_prefill_s"] = (
                cx.get("extra", {}).get("ctx_prefill_s"))
    print(json.dumps(line))


def build_int4_params(cfg, with_image: bool):
    """FULL-model serving init: int4 expert stacks streamed into place (the
    bf16 64-expert stacks are ~42GB and can never exist on a 16GB chip)."""
    from aria_tpu.models.moe_lm import init_lm_params_serving_int4
    from aria_tpu.models.projector import init_projector_params
    from aria_tpu.models.vit import init_vit_params
    from aria_tpu.ops.quant import quantize_projector_params, quantize_vit_params

    params = {"lm": init_lm_params_serving_int4(jax.random.PRNGKey(0), cfg.text)}
    if with_image:
        params["vision"] = jax.jit(quantize_vit_params, donate_argnums=0)(
            init_vit_params(jax.random.PRNGKey(1), cfg.vision, jnp.bfloat16)
        )
        params["projector"] = jax.jit(quantize_projector_params, donate_argnums=0)(
            init_projector_params(jax.random.PRNGKey(2), cfg.projector, jnp.bfloat16)
        )
    return params


def load_hf_int4_params(path: str, cfg, with_image: bool):
    """Real checkpoint load path: stream an HF-format safetensors dir into
    the int4 serving tree (checkpoint/io.py:import_hf_lm_serving_int4), plus
    bf16->int8 vision/projector import. Reports host-RAM peak and wall time —
    the streamed import's contract is that the ~42GB bf16 expert stacks never
    exist anywhere (VERDICT r03 item 5)."""
    import resource

    from aria_tpu.checkpoint.io import (
        SafetensorsDir,
        _import_projector,
        _import_vision,
        import_hf_lm_serving_int4,
    )

    st = SafetensorsDir(path)
    t0 = time.perf_counter()
    params = {"lm": import_hf_lm_serving_int4(st, cfg.text)}
    if with_image:
        from aria_tpu.ops.quant import quantize_projector_params, quantize_vit_params

        params["vision"] = jax.jit(quantize_vit_params, donate_argnums=0)(
            _import_vision(st.get, cfg.vision, jnp.bfloat16)
        )
        params["projector"] = jax.jit(quantize_projector_params, donate_argnums=0)(
            _import_projector(st.get, cfg.projector, jnp.bfloat16)
        )
    jax.block_until_ready(params)
    peak_gb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20)
    anon_kb = 0
    with open("/proc/self/status") as f:  # anonymous RSS excludes the
        for line in f:                    # mmap'd checkpoint page cache
            if line.startswith("RssAnon"):
                anon_kb = int(line.split()[1])
    print(f"# hf import: {time.perf_counter() - t0:.1f}s, host RSS peak "
          f"{peak_gb:.2f} GB (anon {anon_kb / (1 << 20):.2f} GB — the rest "
          "is the mmap'd checkpoint riding the page cache)", flush=True)
    return params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--experts", type=int, default=8)
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--new-tokens", type=int, default=200)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--no-image", action="store_true")
    ap.add_argument("--bf16", action="store_true", help="disable int8 weight-only LM")
    ap.add_argument("--lanes", type=int, default=0,
                    help="continuous-batching mode: aggregate tok/s over N lanes")
    ap.add_argument("--ctx", type=int, default=0,
                    help="long-context mode: text prompt of this many tokens")
    ap.add_argument("--kv-int8", action="store_true",
                    help="quantize the KV cache to int8 (2x context capacity)")
    ap.add_argument("--kv-int4", action="store_true",
                    help="head-pair-packed int4 KV cache (4x context capacity; 64K fits one chip)")
    ap.add_argument("--int4", action="store_true", default=None,
                    help="FULL 64-expert model, int4 expert weights (25.3B on one chip; default)")
    ap.add_argument("--shard8", action="store_true",
                    help="round-1 mode: 8-expert EP-shard-equivalent, int8 weights")
    ap.add_argument("--paged", action="store_true",
                    help="lanes mode uses the paged-KV server (PagedBatchedEngine)")
    ap.add_argument("--max-seq", type=int, default=0,
                    help="lanes mode: per-lane KV allocation (default 512; "
                    "256 lets 64 int8-KV lanes fit beside the full model)")
    ap.add_argument("--train", action="store_true",
                    help="LoRA fine-tune throughput (EP-8 shard, 2k seq)")
    ap.add_argument("--train-batch", type=int, default=1)
    ap.add_argument("--train-seq", type=int, default=2048)
    ap.add_argument("--qlora", action="store_true",
                    help="train mode: int8-quantize the frozen base (QLoRA)")
    ap.add_argument("--fallback", action="store_true",
                    help="tag the metric as a fallback from a failed full-model run")
    ap.add_argument("--from-hf", dest="from_hf", default=None, metavar="DIR",
                    help="load the int4 serving weights by streaming an "
                    "HF-format safetensors dir (tools/make_flagship_ckpt.py "
                    "writes a flagship-shaped one) instead of random init")
    args = ap.parse_args()

    # Bare `python bench.py` (the driver's exact command): isolate the
    # full-model attempt in a child process so an OOM degrades to the shard8
    # workload instead of recording zero throughput for the round.
    if len(sys.argv) == 1 and "ARIA_TPU_BENCH_CHILD" not in os.environ:
        _run_with_fallback()
        return

    if args.train:
        bench_train(args)
        return

    # Default workload: the WHOLE 25.3B model resident on one chip (int4
    # experts + int8 KV), mirroring the reference's single-accelerator
    # headline (gptfast/README.md:19-22 on 1x H100 80GB).
    if args.int4 is None:
        args.int4 = bool(args.from_hf) or not (
            args.shard8 or args.bf16 or args.lanes or args.ctx
        )
    if args.int4:
        args.experts = 64
        args.kv_int8 = True
    cfg = bench_config(args.experts, args.layers)
    t0 = time.perf_counter()
    if args.int4:
        with_image = not (args.no_image or args.ctx)
        if args.from_hf:
            params = load_hf_int4_params(args.from_hf, cfg, with_image)
        else:
            params = build_int4_params(cfg, with_image=with_image)
        jax.block_until_ready(params)
        n_params = sum(
            (2 * x.size if x.dtype == jnp.int8 and x.ndim >= 4 else x.size)
            for x in jax.tree.leaves(params)
        )  # packed int4 leaves hold two params per byte
    else:
        params = jax.jit(
            lambda k: init_aria_params(k, cfg, dtype=jnp.bfloat16)
        )(jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        from aria_tpu.ops.quant import fuse_shared_experts, quantize_params

        # quantize FIRST (halves the stacks), then fuse the shared experts into
        # the expert stacks so they ride the decode kernel — fusing bf16 first
        # would peak above HBM.
        if not args.bf16:
            params = jax.jit(quantize_params, donate_argnums=0)(params)
            jax.block_until_ready(params)
        params = jax.jit(fuse_shared_experts, donate_argnums=0)(params)
        jax.block_until_ready(params)
        n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"# init: {time.perf_counter() - t0:.1f}s ({n_params / 1e9:.2f}B params)", flush=True)

    if args.int4:
        gb = float(os.environ.get("ARIA_TPU_HEADROOM_GB", "1.0"))
        _probe_headroom(gb)
        print(f"# headroom probe ok: {gb:.2f} GB free after init", flush=True)

    if args.lanes:
        bench_batched(params, cfg, args)
        return

    max_seq = 1024 if not args.ctx else args.ctx + args.new_tokens + 64
    cache_dtype = "int4" if args.kv_int4 else (jnp.int8 if args.kv_int8 else jnp.bfloat16)
    engine = Engine(params, cfg, max_seq_len=max_seq, cache_dtype=cache_dtype)

    # Single-image prompt: 256 image tokens (one 980px crop) + text.
    if args.ctx:
        rng0 = np.random.RandomState(0)
        prompt = rng0.randint(5, 99000, size=args.ctx).tolist()
        pixels = mask = None
    elif args.no_image:
        prompt = [11] * 48
        pixels = mask = None
    else:
        n_q = cfg.projector.query_count((980 // 14) ** 2)
        prompt = [11] * 8 + [cfg.image_token_id] * n_q + [13] * 8
        # raw uint8 crop (what the processor emits with normalize=False):
        # normalization runs on device, so the per-request host->device
        # transfer is 2.9MB instead of 11.5MB f32 + ~1MB mask — most of the
        # image-to-first-token wall rides the relay link, not the chip
        pixels = np.random.RandomState(0).randint(0, 256, (1, 3, 980, 980),
                                                  dtype=np.uint8)
        mask = None

    gen = GenerationConfig(max_new_tokens=args.new_tokens, temperature=0.8, top_k=200,
                           decode_chunk=50)

    results = []
    for i in range(args.warmup + args.runs):
        res = engine.generate(prompt, gen, pixel_values=pixels, pixel_mask=mask)
        phase = "warmup" if i < args.warmup else "timed"
        print(f"# {phase} run {i}: prefill {res.prefill_s*1e3:.0f}ms, "
              f"{res.steps} tokens in {res.decode_s:.2f}s = {res.tokens_per_s:.1f} tok/s", flush=True)
        if i >= args.warmup:
            results.append(res)

    tok_s = float(np.mean([r.tokens_per_s for r in results]))
    ttft = float(np.mean([r.prefill_s for r in results]))
    print(f"# mean image-to-first-token: {ttft*1e3:.0f}ms")
    suffix = "" if args.bf16 else "_int8"
    if args.kv_int8:
        suffix += "_kv8"
    if args.kv_int4:
        suffix += "_kv4"
    if args.ctx:
        suffix += f"_ctx{args.ctx}"
    name = f"decode_tok_s_1chip_ep8_shard_equiv{suffix}"
    if args.int4:
        # the whole 25.3B/64-expert model resident on ONE chip — the
        # reference's README.md:41 claim, at 1/5th the HBM
        name = f"decode_tok_s_1chip_full64_int4{suffix.replace('_int8', '')}"
    if args.fallback:
        name += "_fallback"
    line = {
        "metric": name,
        "value": round(tok_s, 2),
        "unit": "tokens/s",
        "vs_baseline": round(tok_s / BASELINE_TOK_S, 3),
        # driver-visible secondary metrics (VERDICT r04 item 5): TTFT for
        # image runs, prefill wall for long-context runs
        "extra": (
            {"ctx_prefill_s": round(ttft, 2)} if args.ctx
            else {} if args.no_image
            else {"image_to_first_token_ms": round(ttft * 1e3)}
        ),
    }
    print(json.dumps(line))


if __name__ == "__main__":
    main()
