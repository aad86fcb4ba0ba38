"""Shared plumbing for the cookbook scripts: engine/tokenizer setup and the
multi-image chat round-trip (reference inference/notebooks/* equivalents)."""

from __future__ import annotations

import argparse
from typing import List, Optional

import jax.numpy as jnp
from PIL import Image


def add_common_args(ap: argparse.ArgumentParser):
    ap.add_argument("--checkpoint", help="imported checkpoint dir (params + tokenizer)")
    ap.add_argument("--tiny-random", action="store_true",
                    help="random tiny model (no weights needed; demo of the flow)")
    ap.add_argument("--max-image-size", type=int, default=980, choices=(490, 980))
    ap.add_argument("--split-image", action="store_true")
    ap.add_argument("--max-new-tokens", type=int, default=256)
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--max-seq-len", type=int, default=4096)


def build_engine(args):
    """Returns (engine, tokenizer, cfg)."""
    import jax

    from aria_tpu.engine.generate import Engine

    if args.checkpoint:
        import os

        from aria_tpu.checkpoint.io import import_hf_checkpoint, latest_step, load_checkpoint
        from aria_tpu.config import AriaConfig
        from aria_tpu.data.tokenizer import load_tokenizer

        cfg = AriaConfig.aria_25b()
        st = [f for f in os.listdir(args.checkpoint) if f.endswith(".safetensors")]
        if st:  # HF layout: remap/fuse on import (checkpoint/io.py:97-207)
            params = import_hf_checkpoint(args.checkpoint, cfg, jnp.bfloat16)
        else:  # native orbax checkpoint
            params, saved_cfg = load_checkpoint(args.checkpoint, latest_step(args.checkpoint) or 0)
            cfg = saved_cfg or cfg
        tokenizer = load_tokenizer(args.checkpoint)
    elif args.tiny_random:
        # tiny layers at REAL 490px geometry so the processor contract
        # (128 tokens/crop at 490) is exercised end-to-end
        from aria_tpu.config import AriaConfig, ProjectorConfig, TextConfig, VisionConfig
        from aria_tpu.data.tokenizer import ByteTokenizer
        from aria_tpu.models.aria import init_aria_params

        cfg = AriaConfig(
            vision=VisionConfig(hidden_size=32, num_layers=2, num_heads=2,
                                intermediate_size=64, image_size=490),
            projector=ProjectorConfig(patch_to_query=((1225, 8),), embed_dim=32,
                                      num_heads=2, kv_dim=32, ff_dim=64, output_dim=64),
            text=TextConfig(vocab_size=512, hidden_size=64, num_layers=2,
                            num_heads=4, num_kv_heads=4, head_dim=16,
                            max_seq_len=2048, num_experts=4, moe_topk=2,
                            moe_intermediate_size=32, num_shared_experts=2),
        )
        args.max_image_size = 490
        params = init_aria_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        tokenizer = ByteTokenizer()
        args.max_seq_len = min(args.max_seq_len, 2048)
    else:
        raise SystemExit("pass --checkpoint DIR or --tiny-random")
    engine = Engine(params, cfg, max_seq_len=args.max_seq_len)
    return engine, tokenizer, cfg


def chat_once(
    engine,
    tokenizer,
    prompt: str,
    images: Optional[List[Image.Image]],
    args,
) -> str:
    """One user turn with N images -> assistant text."""
    from aria_tpu.data.chat import build_inference_prompt
    from aria_tpu.data.processor import AriaProcessor
    from aria_tpu.engine.generate import GenerationConfig

    content = [{"type": "image", "text": None} for _ in (images or [])]
    content.append({"type": "text", "text": prompt})
    messages = [{"role": "user", "content": content}]
    rendered = build_inference_prompt(messages, [1] * len(images or []))

    out = AriaProcessor(tokenizer)(
        rendered, images=images or None,
        max_image_size=args.max_image_size, split_image=args.split_image,
    )
    stop_ids = tuple(
        t for t in [getattr(tokenizer, "eos_token_id", None)] if t is not None
    )
    res = engine.generate(
        out.input_ids[0].tolist(),
        GenerationConfig(max_new_tokens=args.max_new_tokens,
                         temperature=args.temperature, top_k=None,
                         stop_token_ids=stop_ids),
        pixel_values=out.pixel_values, pixel_mask=out.pixel_mask,
    )
    return tokenizer.decode(res.tokens).split("<|im_end|>")[0]
