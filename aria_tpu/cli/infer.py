"""Inference CLI (analogue of reference aria/inference.py:30-153):

    python -m aria_tpu.cli.infer --model-path <ckpt> --tokenizer-path <tok> \
        --image-path img.png --prompt "describe the image" [--lora-path ...]

Loads a native or HF checkpoint, optionally merges a LoRA adapter, renders the
chat template, and greedily/temperature-decodes with stop on <|im_end|>.
"""

from __future__ import annotations

import argparse
import os


def load_model_and_tokenizer(args):
    import jax
    import jax.numpy as jnp

    from aria_tpu.checkpoint.io import import_hf_checkpoint, latest_step, load_checkpoint
    from aria_tpu.config import AriaConfig
    from aria_tpu.data.tokenizer import ByteTokenizer, load_tokenizer
    from aria_tpu.models.aria import init_aria_params

    cfg = AriaConfig.tiny() if args.tiny else AriaConfig.aria_25b()
    dtype = jnp.bfloat16 if not args.tiny else jnp.float32

    if args.model_path and os.path.isdir(args.model_path):
        st = [f for f in os.listdir(args.model_path) if f.endswith(".safetensors")]
        if st:
            params = import_hf_checkpoint(args.model_path, cfg, dtype)
        else:
            step = latest_step(args.model_path)
            params, saved_cfg = load_checkpoint(args.model_path, step or 0)
            cfg = saved_cfg or cfg
    else:
        params = init_aria_params(jax.random.PRNGKey(0), cfg, dtype)

    if args.lora_path:
        from aria_tpu.checkpoint.io import load_checkpoint as load_lora
        from aria_tpu.train.lora import LoraConfig, merge_lora

        lora, _ = load_lora(args.lora_path, latest_step(args.lora_path) or 0)
        lc = LoraConfig(rank=args.lora_r, alpha=args.lora_alpha)
        params = merge_lora(params, lora, lc)

    tokenizer = load_tokenizer(args.tokenizer_path) if args.tokenizer_path else ByteTokenizer()
    return params, cfg, tokenizer


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", default=None)
    ap.add_argument("--tokenizer-path", default=None)
    ap.add_argument("--lora-path", default=None)
    ap.add_argument("--lora-r", type=int, default=8)
    ap.add_argument("--lora-alpha", type=float, default=32.0)
    ap.add_argument("--image-path", default=None)
    ap.add_argument("--prompt", required=True)
    ap.add_argument("--max-image-size", type=int, default=980, choices=[490, 980])
    ap.add_argument("--split-image", action="store_true")
    ap.add_argument("--max-new-tokens", type=int, default=500)
    ap.add_argument("--temperature", type=float, default=0.9)
    ap.add_argument("--greedy", action="store_true")
    ap.add_argument("--max-seq-len", type=int, default=4096)
    ap.add_argument("--tiny", action="store_true", help="random tiny model (smoke test)")
    args = ap.parse_args(argv)

    from PIL import Image

    from aria_tpu.data.chat import build_inference_prompt
    from aria_tpu.data.processor import AriaProcessor
    from aria_tpu.engine.generate import Engine, GenerationConfig

    params, cfg, tokenizer = load_model_and_tokenizer(args)

    content = []
    images = None
    if args.image_path:
        images = [Image.open(args.image_path).convert("RGB")]
        content.append({"type": "image"})
    content.append({"type": "text", "text": args.prompt})
    messages = [{"role": "user", "content": content}]
    prompt = build_inference_prompt(messages, [1] * (1 if images else 0))

    processor = AriaProcessor(tokenizer)
    out = processor(prompt, images=images, max_image_size=args.max_image_size,
                    split_image=args.split_image)

    engine = Engine(params, cfg, max_seq_len=args.max_seq_len)
    stop_ids = tuple(t for t in [getattr(tokenizer, "eos_token_id", None)] if t is not None)
    gen = GenerationConfig(
        max_new_tokens=args.max_new_tokens,
        temperature=0.0 if args.greedy else args.temperature,
        top_k=None if args.greedy else 200,
        stop_token_ids=stop_ids,
    )
    res = engine.generate(
        out.input_ids[0].tolist(), gen,
        pixel_values=out.pixel_values, pixel_mask=out.pixel_mask,
    )
    text = tokenizer.decode(res.tokens).split("<|im_end|>")[0]
    print(text)
    print(f"\n[{res.steps} tokens, prefill {res.prefill_s*1e3:.0f}ms, "
          f"{res.tokens_per_s:.1f} tok/s]")


if __name__ == "__main__":
    main()
