"""Quantization quality drift: bf16 oracle vs int8 / int4(+W4A8) / KV dtypes.

VERDICT r03 item 4: the headline bench runs int4 experts + W4A8 activations +
int8/int4 KV, but no measurement tied those speeds to answer quality. This
tool runs the SAME weights (same PRNG seed) through each precision stack and
reports, per variant vs the bf16 oracle:

  - greedy-token divergence over N decode steps (engine path, real kernels):
    match fraction + first divergence step
  - teacher-forced logit MSE / relative error / top-1 agreement over a fixed
    token window (lm_forward path — on TPU this uses the same int4/int8
    matmul kernels as serving prefill)
  - perplexity delta on the fixed token set (teacher-forced NLL)

Each variant runs in a CHILD process so HBM starts clean (the bf16 shard-8
oracle alone is ~12GB of a 16GB chip). Weights are identical across children
because initialization is deterministic in the seed.

The reference's quality evidence is task-level tables on its published bf16
checkpoint (examples/refcoco/README.md:70-73); with no checkpoint in this
zero-egress image, weight-preserving numeric fidelity on the real kernel
paths is the measurable equivalent — the same tool accepts a real imported
checkpoint via --from-hf once one is present.

Usage:
  python -m tools.quality_drift                   # shard-8 flagship dims (TPU)
  python -m tools.quality_drift --tiny            # CPU smoke
  python -m tools.quality_drift --variants int4   # subset
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

VARIANTS = ("bf16", "int8", "int4", "int4_a16")


def build_cfg(args):
    from aria_tpu.config import AriaConfig, TextConfig

    if args.tiny:
        return AriaConfig.tiny()
    base = AriaConfig.aria_25b()
    return AriaConfig(vision=base.vision, projector=base.projector,
                      text=TextConfig(num_experts=args.experts,
                                      num_layers=args.layers))


def _init_bf16(cfg, args):
    import jax
    import jax.numpy as jnp

    from aria_tpu.models.aria import init_aria_params

    dtype = jnp.bfloat16  # also in --tiny: the int4 serving path assumes bf16
    if args.from_hf:
        from aria_tpu.checkpoint.io import import_hf_checkpoint

        return import_hf_checkpoint(args.from_hf, cfg, dtype=dtype)
    params = jax.jit(lambda k: init_aria_params(k, cfg, dtype=dtype))(
        jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    return params


def derive(variant: str, params, cfg):
    """bf16 params -> the serving stack for `variant` (order proven on-chip
    by bench.py: quantize FIRST, then fuse shared experts into the stacks)."""
    import jax

    from aria_tpu.ops.quant import (
        fuse_shared_experts, quantize_lm_params_int4, quantize_params,
    )

    # The drift measurement is text-only (teacher-forced window + greedy
    # decode) — the vision tower is never executed, so it is dropped from
    # every child's tree. This is ALSO load-bearing on the axon relay:
    # running the donated vit/projector-quantize jits in the same process
    # poisons every later device->host transfer with RESOURCE_EXHAUSTED
    # (bisected r04: compute still succeeds, any np.asarray — even 1.6MB —
    # fails; without the vit/proj quantize step the same forwards and
    # transfers are clean).
    params = {"lm": params["lm"]}
    if variant == "bf16":
        return params  # unfused: shared experts run as the separate MLP
    if variant == "int8":
        params = jax.jit(quantize_params, donate_argnums=0)(params)
        jax.block_until_ready(params)
        params = jax.jit(fuse_shared_experts, donate_argnums=0)(params)
    else:  # int4 / int4_a16: int4 experts+dense, int8 head/embed
        lm = _quantize_lm_int4_chunked(params["lm"])
        jax.block_until_ready(lm)
        params = {"lm": fuse_shared_experts({"lm": lm},
                                            cfg.text.num_shared_experts)["lm"]}
    jax.block_until_ready(params)
    return params


def _quantize_lm_int4_chunked(lm: dict) -> dict:
    """quantize_lm_params_int4, but the expert stacks go layer-by-layer
    inside ONE jitted lax.scan: jitting the whole-tree transform needs bf16
    stacks + f32 temps + outputs live at once (19.7GB on the shard-8
    workload — the r04 on-chip OOM); the scan bounds the f32 temps at one
    layer (~0.6GB). A scan (single program) rather than a Python loop of
    donated per-layer calls: a 28-iteration donated-jit chain poisons the
    axon relay — every later device->host transfer >~1KB in that process
    dies with RESOURCE_EXHAUSTED while compute keeps working (bisected
    r04; the bf16/int8 children, which never ran the loop, transfer 25MB
    fine)."""
    import jax

    from aria_tpu.ops.dense_int4 import quantize_dense_int4
    from aria_tpu.ops.quant import quantize_expert_int4, quantize_weight

    layers = dict(lm["layers"])
    w1, w2 = layers.pop("w1"), layers.pop("w2")

    @jax.jit
    def scan_quantize(w1, w2):
        def step(_, wl):
            return None, quantize_expert_int4(*wl)

        _, (q1, q2) = jax.lax.scan(step, None, (w1, w2))
        return q1, q2

    layers["w1"], layers["w2"] = scan_quantize(w1, w2)
    jax.block_until_ready(layers["w1"])
    del w1, w2
    # no donation anywhere in this tool: repeated donated jits are implicated
    # in the relay D2H poisoning, and the residual non-expert tree is small
    # enough (~2.6GB) that transient copies are free
    for key in ("wqkv", "wo"):
        layers[key] = jax.jit(quantize_dense_int4)(layers[key])
    q8 = jax.jit(quantize_weight, static_argnums=1)
    for key in ("shared_w1", "shared_w2"):
        if key in layers:
            layers[key] = q8(layers[key], -2)
    out = dict(lm)
    out["layers"] = layers
    out["embed"] = q8(lm["embed"], -2)
    out["lm_head"] = q8(lm["lm_head"], -2)
    return out


def run_variant(args):
    import jax
    import jax.numpy as jnp

    from aria_tpu.engine.generate import Engine, GenerationConfig
    from aria_tpu.models.moe_lm import lm_forward

    variant = args.variant
    if variant == "int4_a16":
        os.environ["ARIA_TPU_A8"] = "0"
    base = "int4" if variant == "int4_a16" else variant
    if base == "int4" and not args.tiny:
        # register the CPU backend beside axon BEFORE the first device op
        # (the env pins JAX_PLATFORMS=axon; first-listed stays the default)
        jax.config.update("jax_platforms", "axon,cpu")
    cfg = build_cfg(args)
    V = cfg.text.vocab_size

    t0 = time.perf_counter()
    if base == "int4" and not args.tiny:
        # The int4 path CANNOT quantize on the TPU in this process: with the
        # whole bf16 tree live, the chunked quantize leaves the axon relay's
        # device->host path dead (r04/r05 on chip: EVERY later transfer,
        # even a 4-byte scalar, dies with RESOURCE_EXHAUSTED while compute
        # succeeds — the --ref scalar-readback shield was not enough). So
        # quantize on the host CPU backend — max/abs/div/round/clip are
        # correctly-rounded IEEE f32 ops on both backends, so the packed
        # weights are bit-identical to a device-side quantize — and ship
        # the quantized tree host->device (the healthy direction).
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params = derive(base, _init_bf16(cfg, args), cfg)
            jax.block_until_ready(params)
        print(f"# [{variant}] CPU quantize done in "
              f"{time.perf_counter() - t0:.1f}s; transferring", flush=True)
        params = jax.device_put(params, jax.devices()[0])
        jax.block_until_ready(params)
    else:
        params = derive(base, _init_bf16(cfg, args), cfg)
    print(f"# [{variant}] params ready in {time.perf_counter() - t0:.1f}s",
          flush=True)

    out = {}

    # ---- teacher-forced window: logits + NLL on a FIXED token sequence
    rng = np.random.RandomState(123)
    tf = rng.randint(5, V - 10, size=(1, args.tf_len)).astype(np.int32)
    t0 = time.perf_counter()

    # jit is load-bearing: eager op-by-op execution of the int4 paths
    # materializes whole dequantized weight stacks as intermediates
    # (RESOURCE_EXHAUSTED on chip); compiled, they fuse into the matmuls.
    if args.ref:
        # Quantized children (r04/r05 on-chip failure mode): the int4
        # quantize churn poisons the process's device->host path — every
        # later D2H over ~1KB dies with RESOURCE_EXHAUSTED while compute
        # and HOST->DEVICE transfers keep working. So instead of reading
        # the [logit_win, V] window back (~25MB), load the bf16 oracle's
        # saved window, push it TO the device, compute every drift stat
        # on device, and read back only scalars (4B each survives).
        ref_npz = np.load(args.ref)
        ref_win = jnp.asarray(ref_npz["logits_win"])
        ref_nll_mean = float(ref_npz["nll"].mean())

        def tf_stats(p, t, rw):
            logits = lm_forward(p, cfg.text, t).logits[0].astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp[:-1], t[0, 1:][:, None], axis=-1)[:, 0]
            win = logits[-args.logit_win:]
            diff = win - rw
            mse = jnp.mean(diff * diff)
            rel = jnp.linalg.norm(diff) / jnp.linalg.norm(rw)
            top1 = jnp.mean(
                (jnp.argmax(win, -1) == jnp.argmax(rw, -1)).astype(jnp.float32))
            # KL(oracle || variant) per position, in nats: margin-robust —
            # top1/greedy saturate on random weights (tiny argmax margins)
            # while KL measures actual distribution distortion
            ref_lp = jax.nn.log_softmax(rw, axis=-1)
            var_lp = jax.nn.log_softmax(win, axis=-1)
            kl = jnp.mean(jnp.sum(jnp.exp(ref_lp) * (ref_lp - var_lp), axis=-1))
            return nll.mean(), mse, rel, top1, kl

        nll_m, mse, rel, top1, kl = jax.jit(tf_stats)(
            params["lm"], jnp.asarray(tf), ref_win)
        ppl = float(np.exp(float(nll_m)))
        out["stats"] = np.asarray([
            float(mse), float(rel), float(top1), ppl,
            100.0 * (ppl - np.exp(ref_nll_mean)) / np.exp(ref_nll_mean),
            float(kl),
        ], np.float64)
        del ref_win, nll_m, mse, rel, top1, kl
    else:
        # bf16 oracle child: no quantize churn, D2H is healthy — save the
        # NLL vector + trailing logit window for later children to compare
        # against. NLL is reduced on device so the transfer is the
        # [logit_win, V] window (~25MB) + a [S-1] vector, not [S, V].
        def tf_window(p, t):
            logits = lm_forward(p, cfg.text, t).logits[0].astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(
                logp[:-1], t[0, 1:][:, None], axis=-1)[:, 0]
            return nll, logits[-args.logit_win:]

        nll_d, win_d = jax.jit(tf_window)(params["lm"], jnp.asarray(tf))
        out["nll"] = np.asarray(nll_d, np.float32)
        out["logits_win"] = np.asarray(win_d, np.float32)
        del nll_d, win_d
    out["tf_tokens"] = tf[0]
    print(f"# [{variant}] teacher-forced forward {time.perf_counter() - t0:.1f}s",
          flush=True)

    # ---- greedy decode through the serving engine (real decode kernels)
    prompt = rng.randint(5, V - 10, size=48).tolist()
    gen = GenerationConfig(max_new_tokens=args.new_tokens, temperature=0.0,
                           top_k=None, decode_chunk=50)
    kv_dtypes = {"kvbf16": jnp.bfloat16}
    if variant in ("int4", "int4_a16") and not args.tiny:
        kv_dtypes.update({"kvint8": jnp.int8, "kvint4": "int4"})
    elif variant == "int8":
        kv_dtypes.update({"kvint8": jnp.int8})
    for name, kv in kv_dtypes.items():
        eng = Engine(params, cfg, max_seq_len=512, cache_dtype=kv)
        res = eng.generate(prompt, gen)
        out[f"greedy_{name}"] = np.asarray(res.tokens, np.int32)
        print(f"# [{variant}] greedy/{name}: {res.tokens_per_s:.1f} tok/s",
              flush=True)
        del eng

    np.savez(args.out, **out)
    print(f"# [{variant}] wrote {args.out}", flush=True)


def run_kv(args):
    """KV-cache drift, isolated from weight quantization: the SAME bf16
    weights decode a fixed token sequence stepwise through the stacked
    cache (the real decode-attention kernels and per-step quantize path)
    at each cache dtype; per-step next-token logits are compared against
    the bf16-cache run with margin-robust stats (rel err, top-1, KL).

    This closes the gap the greedy-match columns leave: on random weights
    greedy matches collapse on hair-thin argmax margins, while these
    distribution-level stats measure what the cache quantization actually
    does. All stats reduce on device (scalar readbacks only)."""
    import jax
    import jax.numpy as jnp

    from aria_tpu.models.moe_lm import KVCache, lm_forward

    cfg = build_cfg(args)
    V = cfg.text.vocab_size
    S = args.kv_steps
    Smax = max(512, -(-S // 256) * 256)
    params = _init_bf16(cfg, args)
    toks = jnp.asarray(
        np.random.RandomState(123).randint(5, V - 10, size=S), jnp.int32)

    def stepwise(p, toks, cache):
        kv_pos = jnp.arange(Smax)

        def step(cache, tp):
            tok, pos = tp
            mask = (kv_pos <= pos)[None, None, None, :]
            out = lm_forward(p, cfg.text, tok[None, None],
                             positions=pos[None], mask=mask,
                             cache=cache, cache_pos=pos)
            return out.cache, out.logits[0, -1].astype(jnp.float32)

        _, logits = jax.lax.scan(step, cache, (toks, jnp.arange(S)))
        return logits  # [S, V]

    run = jax.jit(stepwise, donate_argnums=(2,))

    def stats(ref, got):  # [W, V] each, on device
        w = args.logit_win
        ref, got = ref[-w:], got[-w:]
        rel = jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref)
        top1 = jnp.mean((got.argmax(-1) == ref.argmax(-1)).astype(jnp.float32))
        rlp = jax.nn.log_softmax(ref, -1)
        glp = jax.nn.log_softmax(got, -1)
        kl = jnp.mean(jnp.sum(jnp.exp(rlp) * (rlp - glp), axis=-1))
        return rel, top1, kl

    jstats = jax.jit(stats)
    t0 = time.perf_counter()
    ref = run(params["lm"], toks,
              KVCache.init(cfg.text, 1, Smax, jnp.bfloat16))
    jax.block_until_ready(ref)
    print(f"# kv/bf16 stepwise decode {time.perf_counter() - t0:.1f}s",
          flush=True)
    for name, dt in (("kv_int8", jnp.int8), ("kv_int4", "int4")):
        t0 = time.perf_counter()
        got = run(params["lm"], toks, KVCache.init(cfg.text, 1, Smax, dt))
        rel, top1, kl = jstats(ref, got)
        print("RESULT " + json.dumps({
            "variant": name, "weights": "bf16",
            "steps": S, "win": args.logit_win,
            "logit_rel_err": round(float(rel), 6),
            "top1_agree": round(float(top1), 4),
            "kl_nats": round(float(kl), 6),
            "wall_s": round(time.perf_counter() - t0, 1),
        }), flush=True)
        del got


def compare(results: dict, new_tokens: int) -> list:
    """results: variant -> npz. Returns RESULT dict lines."""
    lines = []
    ref = results["bf16"]
    ref_greedy = ref["greedy_kvbf16"]
    ref_nll = ref["nll"]
    ref_logits = ref["logits_win"]
    ppl_ref = float(np.exp(ref_nll.mean()))
    lines.append({"variant": "bf16", "ppl": round(ppl_ref, 4)})
    for variant, r in results.items():
        if variant == "bf16":
            continue
        g = r["greedy_kvbf16"]
        n = min(len(g), len(ref_greedy))
        eq = g[:n] == ref_greedy[:n]
        div = int(np.argmin(eq)) if not eq.all() else -1
        if "stats" in r:
            # child computed its drift stats on device vs the saved oracle
            # window (the D2H-poisoning-safe path; see run_variant)
            vals = [float(x) for x in r["stats"]]
            mse, rel, top1, ppl, ppl_delta = vals[:5]
            kl = vals[5] if len(vals) > 5 else None
        else:
            lw = r["logits_win"].astype(np.float64)
            rw = ref_logits.astype(np.float64)
            mse = float(np.mean((lw - rw) ** 2))
            rel = float(np.linalg.norm(lw - rw) / np.linalg.norm(rw))
            top1 = float((lw.argmax(-1) == rw.argmax(-1)).mean())
            ppl = float(np.exp(r["nll"].mean()))
            ppl_delta = 100.0 * (ppl - ppl_ref) / ppl_ref
            ref_lp = rw - np.log(np.exp(rw - rw.max(-1, keepdims=True)).sum(-1, keepdims=True)) - rw.max(-1, keepdims=True)
            var_lp = lw - np.log(np.exp(lw - lw.max(-1, keepdims=True)).sum(-1, keepdims=True)) - lw.max(-1, keepdims=True)
            kl = float(np.mean((np.exp(ref_lp) * (ref_lp - var_lp)).sum(-1)))
        line = {
            "variant": variant,
            "greedy_match": round(float(eq.mean()), 4),
            "first_divergence_step": div,
            "logit_mse": round(mse, 6),
            "logit_rel_err": round(rel, 6),
            "tf_top1_agree": round(top1, 4),
            "ppl": round(ppl, 4),
            "ppl_delta_pct": round(ppl_delta, 3),
        }
        if kl is not None:
            line["tf_kl_nats"] = round(kl, 5)
        # KV-dtype drift within the variant (weights fixed, cache quantized)
        for kv in ("kvint8", "kvint4"):
            key = f"greedy_{kv}"
            if key in r:
                gk = r[key]
                nk = min(len(gk), len(g))
                line[f"{kv}_greedy_match"] = round(
                    float((gk[:nk] == g[:nk]).mean()), 4)
        lines.append(line)
    return lines


def run_vision(args):
    """Vision-tower drift, measured standalone: encode_images (ViT +
    projector, the serving prefill's image path) on the SAME weights in
    bf16 vs int8, over a fixed pixel input. Runs in its own process — the
    LM drift children deliberately exclude the vision tower (see derive);
    this covers the serving stack's remaining quantized component."""
    import jax
    import jax.numpy as jnp

    from aria_tpu.models.aria import encode_images
    from aria_tpu.models.projector import init_projector_params
    from aria_tpu.models.vit import init_vit_params
    from aria_tpu.ops.quant import quantize_projector_params, quantize_vit_params

    cfg = build_cfg(args)
    S = cfg.vision.image_size
    bf16 = {
        "vision": init_vit_params(jax.random.PRNGKey(1), cfg.vision,
                                  jnp.bfloat16),
        "projector": init_projector_params(jax.random.PRNGKey(2),
                                           cfg.projector, jnp.bfloat16),
    }
    pixels = jnp.asarray(
        np.random.RandomState(7).randn(1, 3, S, S) * 0.5, jnp.float32)
    mask = jnp.ones((1, S, S), bool)
    enc = jax.jit(lambda p, pv, pm: encode_images(p, cfg, pv, pm))
    ref = np.asarray(enc(bf16, pixels, mask), np.float64)

    q = {"vision": jax.jit(quantize_vit_params, donate_argnums=0)(bf16["vision"]),
         "projector": jax.jit(quantize_projector_params, donate_argnums=0)(
             bf16["projector"])}
    got = np.asarray(enc(q, pixels, mask), np.float64)
    rel = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
    cos = float((got * ref).sum()
                / (np.linalg.norm(got) * np.linalg.norm(ref)))
    print("RESULT " + json.dumps({
        "variant": "vision_int8", "feat_rel_err": round(rel, 6),
        "feat_cos_sim": round(cos, 6),
        "feat_shape": list(ref.shape),
    }))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=28)
    ap.add_argument("--experts", type=int, default=8)
    ap.add_argument("--new-tokens", type=int, default=200)
    ap.add_argument("--tf-len", type=int, default=256,
                    help="teacher-forced token window length")
    ap.add_argument("--logit-win", type=int, default=64,
                    help="trailing positions whose full logits are compared")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode: AriaConfig.tiny()")
    ap.add_argument("--from-hf", default="",
                    help="real checkpoint dir (safetensors) instead of random init")
    ap.add_argument("--variants", default="",
                    help="comma list; default bf16,int8,int4,int4_a16")
    ap.add_argument("--vision", action="store_true",
                    help="measure the vision tower's bf16->int8 feature "
                    "drift instead of the LM variants")
    ap.add_argument("--kv", action="store_true",
                    help="measure KV-cache drift in isolation: bf16 weights, "
                    "teacher-forced stepwise decode per cache dtype")
    ap.add_argument("--kv-steps", type=int, default=192)
    ap.add_argument("--variant", default="", help=argparse.SUPPRESS)
    ap.add_argument("--out", default="", help=argparse.SUPPRESS)
    ap.add_argument("--ref", default="", help=argparse.SUPPRESS)
    ap.add_argument("--results-dir", default="",
                    help="reuse/populate <dir>/<variant>.npz: variants with "
                    "an existing npz skip their child run (the bf16 oracle "
                    "alone is ~15 min of chip time)")
    args = ap.parse_args()

    if args.tiny and (args.variant or args.vision or args.kv):
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.vision:
        run_vision(args)
        return
    if args.kv:
        run_kv(args)
        return
    if args.variant:  # child mode
        run_variant(args)
        return

    variants = [v.strip() for v in (args.variants or ",".join(VARIANTS)).split(",")]
    assert "bf16" in variants, "the bf16 oracle is required"
    if args.results_dir:
        tmpdir = args.results_dir
        os.makedirs(tmpdir, exist_ok=True)
    else:
        tmpdir = tempfile.mkdtemp(prefix="quality_drift_")
    results = {}
    ref_path = ""
    for v in variants:
        out = os.path.join(tmpdir, f"{v}.npz")
        if args.results_dir and os.path.exists(out):
            print(f"=== variant {v} (cached {out}) ===", flush=True)
            results[v] = np.load(out)
            if v == "bf16":
                ref_path = out
            continue
        cmd = [sys.executable, "-m", "tools.quality_drift", "--variant", v,
               "--out", out, "--layers", str(args.layers),
               "--experts", str(args.experts),
               "--new-tokens", str(args.new_tokens),
               "--tf-len", str(args.tf_len), "--logit-win", str(args.logit_win)]
        if args.tiny:
            cmd.append("--tiny")
        if args.from_hf:
            cmd += ["--from-hf", args.from_hf]
        if v != "bf16" and ref_path:
            # quantized children compare on device against the saved oracle
            # window and read back only scalars (relay D2H poisoning shield)
            cmd += ["--ref", ref_path]
        print(f"=== variant {v} ===", flush=True)
        # 2h: the int4 children spend ~25 min in the host CPU quantize alone
        # (plus a fresh remote kernel compile); killing a TPU claimant on a
        # tight timeout wedges the relay for ~20 min on top
        rc = subprocess.run(cmd, timeout=7200).returncode
        if rc != 0:
            print(json.dumps({"variant": v, "ok": False, "rc": rc}))
            if v == "bf16":
                raise SystemExit("bf16 oracle failed; cannot compare")
            continue
        results[v] = np.load(out)
        if v == "bf16":
            ref_path = out

    print("\n=== drift vs bf16 oracle (same weights, real kernel paths) ===")
    for line in compare(results, args.new_tokens):
        print("RESULT " + json.dumps(line))


if __name__ == "__main__":
    main()
