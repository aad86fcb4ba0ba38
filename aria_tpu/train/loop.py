"""Training driver: recipe -> mesh -> data -> jitted steps -> checkpoints.

Replaces the reference's TRL SFTTrainer + accelerate + DeepSpeed stack
(aria/train.py:212-249) with a compact JAX loop:

- one GSPMD mesh from the recipe's mesh_* fields (the analogue of
  recipes/accelerate_configs/*.yaml),
- grad accumulation via optax.MultiSteps (semantics match the reference's
  1/grad_accum aux-loss scaling, train.py:229, because the whole loss —
  including aux terms — is averaged),
- epoch-end (or every-N-steps) orbax checkpoints with resume,
- JSONL metrics (wandb-style dicts) via MetricsLogger.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aria_tpu.checkpoint.io import import_hf_checkpoint, latest_step, load_checkpoint, save_checkpoint
from aria_tpu.config import AriaConfig
from aria_tpu.data.collate import collate_fn
from aria_tpu.data.datasets import iter_batches, mix_datasets
from aria_tpu.data.tokenizer import ByteTokenizer, load_tokenizer
from aria_tpu.data.vision_processor import AriaVisionProcessor
from aria_tpu.models.aria import init_aria_params
from aria_tpu.parallel.distributed import (
    is_main_process,
    local_batch_rows,
    shard_host_batch,
)
from aria_tpu.parallel.mesh import MeshConfig, aria_param_specs, make_mesh, shard_tree
from aria_tpu.train.lora import LoraConfig, init_lora_params
from aria_tpu.train.recipe import Recipe
from aria_tpu.train.step import (
    TrainConfig,
    TrainState,
    lora_train_step,
    make_lora_optimizer,
    make_optimizer,
    train_step,
)
from aria_tpu.utils.metrics import MetricsLogger, StepTimer


def _pad_batch(batch: dict, seq_len: int, pad_id: int) -> dict:
    """Pad the token tensors to a fixed length (one compiled shape)."""
    ids = batch["input_ids"]
    B, S = ids.shape
    if S < seq_len:
        pad = seq_len - S
        batch = dict(batch)
        batch["input_ids"] = np.pad(ids, ((0, 0), (0, pad)), constant_values=pad_id)
        batch["labels"] = np.pad(batch["labels"], ((0, 0), (0, pad)), constant_values=-100)
        batch["attention_mask"] = np.pad(batch["attention_mask"], ((0, 0), (0, pad)))
    return batch


def _to_train_config(r: Recipe, total_steps: int) -> TrainConfig:
    return TrainConfig(
        learning_rate=r.learning_rate,
        weight_decay=r.weight_decay,
        grad_clip_norm=r.grad_clip_norm,
        b1=r.adam_beta1,
        b2=r.adam_beta2,
        warmup_steps=int(r.warmup_ratio * total_steps),
        total_steps=max(total_steps, 2),
        freeze_vit=r.freeze_vit,
        freeze_projector=r.freeze_projector,
        freeze_llm=r.freeze_llm,
        freeze_llm_layers=tuple(r.freeze_llm_layers or ()),
        grad_accum_steps=r.gradient_accumulation_steps,
        gradient_checkpointing=r.gradient_checkpointing,
    )


def build_tokenizer(r: Recipe):
    if r.tokenizer_path:
        return load_tokenizer(r.tokenizer_path)
    return ByteTokenizer()


def build_params(r: Recipe, cfg: AriaConfig, dtype):
    if r.model_path and os.path.isdir(r.model_path):
        st_files = [f for f in os.listdir(r.model_path) if f.endswith(".safetensors")]
        if st_files:
            return import_hf_checkpoint(r.model_path, cfg, dtype)
        step = latest_step(r.model_path)
        if step is not None:
            params, _ = load_checkpoint(r.model_path, step)
            return params
        raise FileNotFoundError(f"no checkpoint found at {r.model_path}")
    return init_aria_params(jax.random.PRNGKey(r.seed), cfg, dtype)


def train(r: Recipe, cfg: Optional[AriaConfig] = None, max_steps: Optional[int] = None) -> TrainState:
    cfg = cfg or AriaConfig.aria_25b()
    cfg = cfg.replace(
        text=dataclasses.replace(
            cfg.text,
            moe_z_loss_coeff=r.moe_z_loss_coeff,
            moe_aux_loss_coeff=r.moe_aux_loss_coeff,
        )
    )
    dtype = jnp.bfloat16 if r.dtype == "bfloat16" else jnp.float32

    mesh = make_mesh(MeshConfig(
        data=r.mesh_data, fsdp=r.mesh_fsdp, expert=r.mesh_expert,
        model=r.mesh_model, context=r.mesh_context,
    ))

    tokenizer = build_tokenizer(r)
    image_processor = AriaVisionProcessor(max_image_size=r.max_image_size)

    data = mix_datasets(r.dataset_mixer, seed=r.seed) if r.dataset_mixer else {"train": []}
    rows = data["train"]
    if not rows:
        raise ValueError("empty training set — check dataset_mixer paths")
    steps_per_epoch = max(len(rows) // r.per_device_train_batch_size, 1)
    total_steps = steps_per_epoch * r.num_train_epochs
    if max_steps:
        total_steps = min(total_steps, max_steps)
    tc = _to_train_config(r, total_steps // max(r.gradient_accumulation_steps, 1))

    params = build_params(r, cfg, dtype)
    if r.use_peft and r.quantize_base:
        # QLoRA-style: the frozen base trains through the differentiable
        # int8-dequant paths (gradients flow only into the adapters),
        # cutting frozen-base HBM ~4x — the freed memory goes to longer
        # sequences / larger batches. Beyond the reference's LoRA envelope
        # (one 80GB GPU, README.md:148-151).
        from aria_tpu.ops.quant import quantize_params

        params = jax.jit(quantize_params, donate_argnums=0)(params)
    params = shard_tree(params, aria_param_specs(), mesh)

    logger = MetricsLogger(
        r.output_dir, enabled=r.report_to != "none" and is_main_process()
    )
    timer = StepTimer()
    tokens_per_batch = r.per_device_train_batch_size * r.max_seq_length

    lora = None
    lc = None
    if r.use_peft:
        lc = LoraConfig(rank=r.lora_r, alpha=r.lora_alpha, dropout=r.lora_dropout,
                        freeze_llm=r.freeze_llm)
        lora = init_lora_params(jax.random.PRNGKey(r.seed + 1), cfg, lc)
        optimizer = make_lora_optimizer(tc)
        if r.gradient_accumulation_steps > 1:
            optimizer = optax.MultiSteps(optimizer, r.gradient_accumulation_steps)
        state = TrainState(lora, optimizer.init(lora), jnp.zeros((), jnp.int32))

        def jit_step(state, batch):
            return lora_train_step(state, batch, params, cfg, lc.scale, optimizer,
                                   tc.gradient_checkpointing, mesh=mesh)
    else:
        optimizer = make_optimizer(tc, params)
        if r.gradient_accumulation_steps > 1:
            optimizer = optax.MultiSteps(optimizer, r.gradient_accumulation_steps)
        state = TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

        def jit_step(state, batch):
            return train_step(state, batch, cfg, tc, optimizer, mesh=mesh)

    step_fn = jax.jit(jit_step, donate_argnums=(0,))

    # resume
    start_step = 0
    ckpt_dir = os.path.join(r.output_dir, "checkpoints")
    if r.resume_from_checkpoint:
        last = latest_step(ckpt_dir)
        if last is not None:
            restored, _ = load_checkpoint(ckpt_dir, last, target=jax.tree.map(np.asarray, state))
            if jax.process_count() > 1:
                # every process restored the same full value -> replicate
                # globally (pure-DP multi-host; sharded-state multi-host
                # resume would need orbax multihost checkpointing)
                from jax.sharding import NamedSharding, PartitionSpec

                rep = NamedSharding(mesh, PartitionSpec())
                state = jax.tree.map(lambda x: jax.device_put(x, rep), restored)
            else:
                state = jax.tree.map(jnp.asarray, restored)
            start_step = last
            print(f"resumed from step {last}")

    import random as _random

    step = start_step
    with mesh:
        done = False
        for epoch in range(r.num_train_epochs):
            if done:
                break
            epoch_rows = list(rows)
            _random.Random(r.seed + epoch).shuffle(epoch_rows)  # per-epoch reshuffle
            for bi, batch_rows in enumerate(iter_batches(epoch_rows, r.per_device_train_batch_size)):
                if epoch * steps_per_epoch + bi < start_step:
                    continue  # resume: skip batches already consumed
                if step >= total_steps:
                    done = True
                    break
                batch = collate_fn(
                    local_batch_rows(batch_rows, r.per_device_train_batch_size),
                    tokenizer, image_processor,
                    max_length=r.max_seq_length, max_image_size=r.max_image_size,
                    split_image=r.split_image,
                )
                batch = _pad_batch(batch, r.max_seq_length, tokenizer.pad_token_id)
                batch.pop("attention_mask", None)  # causal mask + -100 labels suffice
                batch = shard_host_batch(batch, mesh)
                state, metrics = step_fn(state, batch)
                step += 1
                if step % r.logging_steps == 0:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    metrics.update(timer.lap(tokens_per_batch))
                    logger.log(step, metrics)
                if r.save_every_steps and step % r.save_every_steps == 0:
                    # all processes participate: orbax saves are collective
                    # (barrier-synced) under a multi-process runtime
                    save_checkpoint(ckpt_dir, jax.tree.map(np.asarray, state), cfg, step=step)
            save_checkpoint(ckpt_dir, jax.tree.map(np.asarray, state), cfg, step=step)
    logger.close()
    return state
