"""On-chip verification of the serving feature set (VERDICT r03 item 3).

One TPU process drives every session-2 serving feature against the
full-depth EP-8-shard int8 workload (the round-1 bench model) and records
a number or an explicit failure per feature:

  - continuous batching (BatchedEngine) with a MIXED batch: plain sampled
    lanes + a guided (regex-FSM) lane + multi-LoRA adapter lanes, all with
    per-token logprobs (top-5) -> aggregate tok/s + output validity
  - HTTP OpenAI API round-trip over the live engine: text chat, image_url
    chat (real 980px ViT), video_url chat -> end-to-end latency
  - paged engine (PagedBatchedEngine): same mixed batch + prefix-cache
    reuse (resubmit -> cached_tokens > 0) -> aggregate tok/s

Run QLoRA separately (`python bench.py --train --qlora`) — one TPU process
at a time (verify skill: two claimants wedge the axon relay).

Usage: python -m tools.chip_verify_serving [--layers N] [--new-tokens N]
"""

import argparse
import base64
import io
import json
import os
import threading
import time
import traceback
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = []


class _TinySkip(Exception):
    pass


def record(feature: str, ok: bool, **kw):
    line = {"feature": feature, "ok": ok, **kw}
    RESULTS.append(line)
    print("RESULT " + json.dumps(line), flush=True)


def phase(name):
    print(f"\n=== {name} ===", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--experts", type=int, default=8)
    ap.add_argument("--new-tokens", type=int, default=100)
    ap.add_argument("--lanes", type=int, default=8)
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode: AriaConfig.tiny(), no TPU required")
    ap.add_argument("--full-int4", action="store_true",
                    help="VERDICT r04 item 4: run the feature set against the "
                    "FULL 25.3B/64-expert int4+W4A8 serving stack (text-only: "
                    "the vision tower is excluded — quantizing it poisons "
                    "this process's device->host path, and no feature here "
                    "needs it; the image/video HTTP round-trips are covered "
                    "by the shard8 run)")
    args = ap.parse_args()
    if args.lanes < 6:
        raise SystemExit("--lanes must be >= 6 (six named feature lanes)")
    if args.full_int4:
        # the 12.9GB resident model + multi-LoRA stacks can't afford an
        # 8-row x bucket-64 grouped-prefill working set (19GB compile-time
        # peak vs 15.75GB HBM); 2-row groups keep admission batched while
        # bounding the prefill temps
        os.environ.setdefault("ARIA_TPU_GROUP_ROWS", "2")
    if args.tiny:
        jax.config.update("jax_platforms", "cpu")

    from aria_tpu.config import AriaConfig, TextConfig
    from aria_tpu.data.tokenizer import ByteTokenizer
    from aria_tpu.engine.guided import regex_fsm
    from aria_tpu.engine.multi_lora import AdapterRegistry
    from aria_tpu.engine.server import BatchedEngine, PagedBatchedEngine
    from aria_tpu.models.aria import init_aria_params
    from aria_tpu.ops.quant import fuse_shared_experts, quantize_params
    from aria_tpu.train.lora import LoraConfig, init_lora_params

    if args.tiny:
        cfg = AriaConfig.tiny()
    elif args.full_int4:
        args.experts = 64
        base = AriaConfig.aria_25b()
        cfg = AriaConfig(vision=base.vision, projector=base.projector,
                         text=TextConfig(num_experts=64,
                                         num_layers=args.layers))
    else:
        base = AriaConfig.aria_25b()
        cfg = AriaConfig(vision=base.vision, projector=base.projector,
                         text=TextConfig(num_experts=args.experts,
                                         num_layers=args.layers))

    model_tag = ("tiny" if args.tiny
                 else "full64_int4" if args.full_int4 else "shard8_int8")
    t0 = time.perf_counter()
    if args.full_int4:
        phase("init: FULL 25.3B int4+W4A8 serving params (streamed)")
        from bench import build_int4_params

        params = build_int4_params(cfg, with_image=False)
        jax.block_until_ready(params)
    else:
        phase("init: shard8 int8 params")
        # float32 in --tiny: the CPU thunk runtime rejects bf16xbf16->f32 dots
        dtype = jnp.float32 if args.tiny else jnp.bfloat16
        params = jax.jit(lambda k: init_aria_params(k, cfg, dtype=dtype))(
            jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        params = jax.jit(quantize_params, donate_argnums=0)(params)
        jax.block_until_ready(params)
        params = jax.jit(fuse_shared_experts, donate_argnums=0)(params)
        jax.block_until_ready(params)
    print(f"# init {time.perf_counter() - t0:.1f}s", flush=True)

    tok = ByteTokenizer()
    V = cfg.text.vocab_size
    hi = min(1000, V - 10)      # generic prompt token range
    lo_hi = min(250, V - 10)    # byte-range prompts (decodable by ByteTokenizer)

    t0 = time.perf_counter()
    fsm = regex_fsm("(yes|no|maybe)( (yes|no|maybe)){0,20}", tok,
                    [tok.eos_token_id], vocab_size=V)
    fsm_s = time.perf_counter() - t0
    print(f"# FSM build over {V}-vocab: {fsm_s:.2f}s", flush=True)

    def adapter(seed, rank):
        lc = LoraConfig(rank=rank, alpha=2.0 * rank)
        lora = init_lora_params(jax.random.PRNGKey(seed), cfg, lc)["lm"]
        rng = np.random.RandomState(seed)
        # bf16 factors at full-64-expert width: two f32 rank-16 adapters
        # over [28, 64, 2560, r] stacks would cost ~3GB of the chip's
        # ~2.5GB post-model headroom
        fdt = np.float32 if args.tiny else jnp.bfloat16
        lora = jax.tree.map(
            lambda x: jnp.asarray(
                (rng.randn(*x.shape) * 0.02).astype(np.float32), fdt),
            lora)
        return lora, lc

    r1, r2 = (4, 2) if args.full_int4 else (16, 8)
    lora1, lc1 = adapter(1, r1)
    lora2, lc2 = adapter(2, r2)
    reg = AdapterRegistry({"t1": lora1, "t2": lora2},
                          scales={"t1": lc1.scale, "t2": lc2.scale})

    # ------------------------------------------------ BatchedEngine, mixed
    phase("BatchedEngine: mixed batch (plain + guided + adapters + logprobs)")
    srv = None
    try:
        srv = BatchedEngine(params, cfg, max_lanes=args.lanes, max_seq_len=512,
                            temperature=0.8, top_k=200, decode_chunk=50,
                            cache_dtype=jnp.int8, guided_fsm=fsm,
                            adapters=reg, logprobs_topk=5)
        rng = np.random.RandomState(0)

        def submit_mixed():
            uids = {}
            prompt = rng.randint(5, lo_hi, size=48).tolist()
            uids["guided"] = srv.submit(prompt, max_new_tokens=args.new_tokens,
                                        guided=True, temperature=0.9,
                                        stop_token_ids=(tok.eos_token_id,))
            uids["t1"] = srv.submit(prompt, max_new_tokens=args.new_tokens,
                                    adapter="t1", temperature=0.0)
            uids["t2"] = srv.submit(prompt, max_new_tokens=args.new_tokens,
                                    adapter="t2", temperature=0.0)
            uids["base"] = srv.submit(prompt, max_new_tokens=args.new_tokens,
                                      temperature=0.0)
            # r4 per-request sampling features (vLLM/OpenAI parity,
            # docs/inference.md): first on-chip exercise — they landed after
            # the last r4 chip session
            pen_prompt = rng.randint(5, hi, size=48).tolist()
            uids["pen"] = srv.submit(pen_prompt,
                                     max_new_tokens=args.new_tokens,
                                     temperature=0.0,
                                     repetition_penalty=1e6)
            uids["_pen_prompt"] = pen_prompt
            uids["nucleus"] = srv.submit(rng.randint(5, hi, size=48).tolist(),
                                         max_new_tokens=args.new_tokens,
                                         temperature=0.9, top_p=0.9,
                                         min_p=0.02,
                                         presence_penalty=0.3,
                                         frequency_penalty=0.2)
            for i in range(args.lanes - 6):
                srv.submit(rng.randint(5, hi, size=48).tolist(),
                           max_new_tokens=args.new_tokens)
            return uids

        uids = submit_mixed()
        pen_prompt = uids.pop("_pen_prompt")
        fin = {r.uid: r for r in srv.run_until_complete()}  # compile + check
        errs = [r.error for r in fin.values() if r.error]
        if errs:
            raise RuntimeError(f"{len(errs)} requests errored: {errs[0]}")

        g = fin[uids["guided"]]
        gen = list(g.generated)
        if gen and gen[-1] == tok.eos_token_id:
            gen = gen[:-1]
        text = tok.decode(gen)
        import re
        assert re.fullmatch(r"(yes|no|maybe)( (yes|no|maybe)){0,20}", text), (
            f"guided output violates regex: {text!r}")
        for k in ("guided", "t1", "t2", "base", "pen", "nucleus"):
            r = fin[uids[k]]
            assert r.logprobs and len(r.logprobs) == len(r.generated), k
            assert all(np.isfinite(lp) for lp in r.logprobs), k
        t1_out = fin[uids["t1"]].generated
        t2_out = fin[uids["t2"]].generated
        b_out = fin[uids["base"]].generated
        assert t1_out != b_out and t2_out != b_out, (
            "adapter lanes identical to base: adapters not applied")
        # repetition_penalty=1e6 at temperature 0: generated tokens never
        # repeat each other or any prompt token (the random prompt may
        # contain its own duplicates — that's the model's input, not output)
        p_out = fin[uids["pen"]].generated
        assert len(set(p_out)) == len(p_out) and not (
            set(p_out) & set(pen_prompt)), (
            f"repetition-penalized lane repeated a token: {p_out}")
        assert len(fin[uids["nucleus"]].generated) == args.new_tokens

        # timed runs
        runs = []
        for r in range(3):
            submit_mixed()
            t0 = time.perf_counter()
            finished = srv.run_until_complete()
            dt = time.perf_counter() - t0
            total = sum(len(f.generated) for f in finished)
            runs.append(total / dt)
            print(f"# run {r}: {total} tok / {dt:.2f}s = {total/dt:.1f} tok/s",
                  flush=True)
        record("batched_mixed_guided_lora_logprobs_penalties", True,
               model=model_tag, tok_s=round(float(np.mean(runs)), 1),
               lanes=args.lanes, guided_text=text[:60],
               fsm_build_s=round(fsm_s, 2))
    except Exception as e:
        traceback.print_exc()
        record("batched_mixed_guided_lora_logprobs_penalties", False,
               model=model_tag, error=repr(e)[:300])

    # ------------------------------------------------ HTTP multimodal
    phase("HTTP OpenAI API: text / image / video round-trips")
    try:
        from http.server import ThreadingHTTPServer

        from aria_tpu.engine.http_server import ServingLoop, make_handler

        assert srv is not None, "engine unavailable"
        loop = ServingLoop(srv, tok, max_image_size=cfg.vision.image_size)
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(loop))
        th = threading.Thread(target=httpd.serve_forever, daemon=True)
        th.start()
        url = f"http://127.0.0.1:{httpd.server_port}"

        def post(path, payload, timeout=900):
            req = urllib.request.Request(
                url + path, data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=timeout) as r:
                    return json.loads(r.read()), time.perf_counter() - t0
            except urllib.error.HTTPError as e:
                print(f"# HTTP {e.code} body: {e.read()[:500]!r}", flush=True)
                raise

        out, dt = post("/v1/chat/completions", {
            "messages": [{"role": "user", "content": "hello there"}],
            "max_tokens": 32, "temperature": 0.0})
        assert out["choices"][0]["message"]["content"] is not None
        record("http_chat_text", True, latency_s=round(dt, 2))

        if args.tiny or args.full_int4:
            # full-int4 runs text-only (vision quantize poisons this
            # process's D2H path; image/video covered by the shard8 run)
            record("http_chat_image_980vit", True, skipped=True)
            record("http_chat_video_4frames", True, skipped=True)
            httpd.shutdown()
            loop.shutdown()
            raise _TinySkip
        img = np.random.RandomState(0).randint(0, 255, (640, 480, 3), np.uint8)
        from PIL import Image
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        img_url = "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()
        out, dt = post("/v1/chat/completions", {
            "messages": [{"role": "user", "content": [
                {"type": "image_url", "image_url": {"url": img_url}},
                {"type": "text", "text": "describe"}]}],
            "max_tokens": 32, "temperature": 0.0})
        assert out["choices"][0]["message"]["content"] is not None
        record("http_chat_image_980vit", True, latency_s=round(dt, 2))
        # second image request: steady-state latency (first pays ViT compile)
        out, dt = post("/v1/chat/completions", {
            "messages": [{"role": "user", "content": [
                {"type": "image_url", "image_url": {"url": img_url}},
                {"type": "text", "text": "again"}]}],
            "max_tokens": 32, "temperature": 0.0})
        record("http_chat_image_980vit_warm", True, latency_s=round(dt, 2))

        try:
            import tempfile

            import cv2
            fd, path = tempfile.mkstemp(suffix=".mp4")
            os.close(fd)
            w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5,
                                (64, 64))
            vrng = np.random.RandomState(0)
            for _ in range(10):
                w.write(vrng.randint(0, 255, (64, 64, 3), np.uint8))
            w.release()
            vurl = "data:video/mp4;base64," + base64.b64encode(
                open(path, "rb").read()).decode()
            os.unlink(path)
            out, dt = post("/v1/chat/completions", {
                "messages": [{"role": "user", "content": [
                    {"type": "video_url", "video_url": {"url": vurl},
                     "num_frames": 4},
                    {"type": "text", "text": "what happens?"}]}],
                "max_tokens": 16, "temperature": 0.0})
            assert out["choices"][0]["message"]["content"] is not None
            record("http_chat_video_4frames", True, latency_s=round(dt, 2))
        except ImportError:
            record("http_chat_video_4frames", False, error="cv2 unavailable")

        httpd.shutdown()
        loop.shutdown()
    except _TinySkip:
        pass
    except Exception as e:
        traceback.print_exc()
        record("http_api", False, error=repr(e)[:300])

    # ------------------------------------------------ paged engine
    phase("PagedBatchedEngine: mixed batch + prefix cache")
    try:
        psrv = PagedBatchedEngine(params, cfg, max_lanes=args.lanes,
                                  max_seq_len=512, page_size=256,
                                  temperature=0.8, top_k=200, decode_chunk=50,
                                  cache_dtype=jnp.int8, guided_fsm=fsm,
                                  adapters=reg)
        rng = np.random.RandomState(1)
        long_prompt = rng.randint(5, hi, size=300).tolist()

        def submit_paged():
            uids = {}
            uids["long"] = psrv.submit(long_prompt,
                                       max_new_tokens=args.new_tokens,
                                       temperature=0.0)
            uids["guided"] = psrv.submit(rng.randint(5, lo_hi, size=48).tolist(),
                                         max_new_tokens=args.new_tokens,
                                         guided=True, temperature=0.9,
                                         stop_token_ids=(tok.eos_token_id,))
            uids["t1"] = psrv.submit(rng.randint(5, lo_hi, size=48).tolist(),
                                     max_new_tokens=args.new_tokens,
                                     adapter="t1", temperature=0.0)
            uids["pen"] = psrv.submit(rng.randint(5, hi, size=48).tolist(),
                                      max_new_tokens=args.new_tokens,
                                      temperature=0.9, top_p=0.9,
                                      repetition_penalty=1.3)
            for i in range(args.lanes - 4):
                psrv.submit(rng.randint(5, hi, size=48).tolist(),
                            max_new_tokens=args.new_tokens)
            return uids

        uids = submit_paged()
        fin = {r.uid: r for r in psrv.run_until_complete()}
        errs = [r.error for r in fin.values() if r.error]
        if errs:
            raise RuntimeError(f"{len(errs)} requests errored: {errs[0]}")

        # prefix cache: resubmit the same long prompt
        u = psrv.submit(long_prompt, max_new_tokens=16, temperature=0.0)
        (f2,) = psrv.run_until_complete()
        assert f2.uid == u and f2.cached_tokens >= 256, (
            f"prefix cache miss: cached_tokens={f2.cached_tokens}")

        runs = []
        for r in range(3):
            submit_paged()
            t0 = time.perf_counter()
            finished = psrv.run_until_complete()
            dt = time.perf_counter() - t0
            total = sum(len(f.generated) for f in finished)
            runs.append(total / dt)
            print(f"# run {r}: {total} tok / {dt:.2f}s = {total/dt:.1f} tok/s",
                  flush=True)
        record("paged_mixed_prefix_cache", True, model=model_tag,
               tok_s=round(float(np.mean(runs)), 1), lanes=args.lanes,
               cached_tokens=int(f2.cached_tokens))
    except Exception as e:
        traceback.print_exc()
        record("paged_mixed_prefix_cache", False, model=model_tag,
               error=repr(e)[:300])

    phase("summary")
    for line in RESULTS:
        print(json.dumps(line))
    ok = all(r["ok"] for r in RESULTS)
    label = 'SMOKE (tiny/CPU)' if args.tiny else 'ON CHIP'
    print(f"\n{'ALL FEATURES VERIFIED ' + label if ok else 'FAILURES PRESENT'}")
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    main()
