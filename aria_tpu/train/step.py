"""Training step: loss, grads, optimizer — one jitted function over the mesh.

Replaces the reference's TRL SFTTrainer + DeepSpeed ZeRO stack (aria/train.py,
recipes/accelerate_configs/*) with the JAX idiom: ``jax.value_and_grad`` over a
pure loss, optax optimizer, and GSPMD sharding of params/grads/opt-state via
NamedSharding (ZeRO-3 falls out of the ``fsdp`` axis for free).

Aux losses (z-loss, load-balancing) are part of the scalar loss — no autograd
hook is needed (reference moe_lm.py:84-125's MoEAuxLossAutoScaler). Grad-accum
averaging applies to the whole loss, matching the reference's
``set_loss_scale(1/grad_accum)`` semantics (train.py:229).

Freeze flags (freeze_vit / freeze_projector / freeze_llm / freeze_llm_layers,
reference aria/config.py:37-52) are implemented with ``optax.masked``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from aria_tpu.config import AriaConfig
from aria_tpu.models.aria import aria_forward, causal_lm_loss


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 0.0
    grad_clip_norm: float = 1.0
    b1: float = 0.9
    b2: float = 0.999
    warmup_steps: int = 0
    total_steps: int = 10_000
    freeze_vit: bool = True
    freeze_projector: bool = True
    freeze_llm: bool = False
    freeze_llm_layers: tuple[int, ...] = ()
    grad_accum_steps: int = 1
    gradient_checkpointing: bool = False


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jax.Array


def trainable_mask(params: Any, tc: TrainConfig) -> Any:
    """True = trainable. Mirrors the reference freeze helpers
    (modeling_aria.py:145-158, lora/utils.py:29-63's freeze handling)."""

    def mask_for(path_root: str, tree):
        if path_root == "vision":
            keep = not tc.freeze_vit
            return jax.tree.map(lambda _: keep, tree)
        if path_root == "projector":
            keep = not tc.freeze_projector
            return jax.tree.map(lambda _: keep, tree)
        # lm — per-layer freezes can't be expressed as a leaf mask (layers are
        # stacked on one axis), so they're handled by zeroing grads instead.
        return jax.tree.map(lambda _: not tc.freeze_llm, tree)

    return {k: mask_for(k, v) for k, v in params.items()}


def _zero_frozen_layer_grads(grads: Any, tc: TrainConfig) -> Any:
    """Zero grads of individual frozen decoder layers (leading L axis)."""
    if not tc.freeze_llm_layers:
        return grads
    idx = jnp.asarray(tc.freeze_llm_layers, jnp.int32)

    def zero_layers(g):
        keep = jnp.ones((g.shape[0],), bool).at[idx].set(False)
        return g * keep.reshape((-1,) + (1,) * (g.ndim - 1)).astype(g.dtype)

    lm_layers = jax.tree.map(zero_layers, grads["lm"]["layers"])
    return {**grads, "lm": {**grads["lm"], "layers": lm_layers}}


def _make_schedule(tc: TrainConfig):
    if tc.warmup_steps > 0:
        return optax.warmup_cosine_decay_schedule(
            0.0, tc.learning_rate, tc.warmup_steps, max(tc.total_steps, 2)
        )
    return optax.cosine_decay_schedule(tc.learning_rate, max(tc.total_steps, 2))


def make_optimizer(tc: TrainConfig, params: Any) -> optax.GradientTransformation:
    schedule = _make_schedule(tc)
    opt = optax.chain(
        optax.clip_by_global_norm(tc.grad_clip_norm),
        optax.adamw(schedule, b1=tc.b1, b2=tc.b2, weight_decay=tc.weight_decay),
    )
    mask = trainable_mask(params, tc)
    return optax.masked(opt, mask)


def loss_fn(params, cfg: AriaConfig, batch: dict, remat: bool = False, mesh=None):
    out = aria_forward(
        params, cfg,
        batch["input_ids"],
        batch.get("pixel_values"),
        batch.get("pixel_mask"),
        mask=batch.get("attn_mask"),
        training=True,
        remat=remat,
        mesh=mesh,
    )
    losses = causal_lm_loss(out, batch["labels"])
    return losses.loss, losses


def train_step(state: TrainState, batch: dict, cfg: AriaConfig, tc: TrainConfig, optimizer, mesh=None):
    """One optimizer step. jit this closed over (cfg, tc, optimizer[, mesh])."""
    (_, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, cfg, batch, tc.gradient_checkpointing, mesh
    )
    grads = _zero_frozen_layer_grads(grads, tc)
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics = {
        "loss": losses.loss,
        "ce_loss": losses.ce_loss,
        "z_loss": losses.z_loss,
        "aux_loss": losses.aux_loss,
        "grad_norm": optax.global_norm(grads),
    }
    return TrainState(new_params, new_opt, state.step + 1), metrics


def init_train_state(params: Any, tc: TrainConfig) -> tuple[TrainState, optax.GradientTransformation]:
    optimizer = make_optimizer(tc, params)
    opt_state = optimizer.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32)), optimizer


# ---------------------------------------------------------------- LoRA

def lora_loss_fn(lora: Any, params: Any, cfg: AriaConfig, batch: dict, lora_scale: float, remat: bool = False, mesh=None):
    out = aria_forward(
        params, cfg,
        batch["input_ids"],
        batch.get("pixel_values"),
        batch.get("pixel_mask"),
        mask=batch.get("attn_mask"),
        training=True,
        lora=lora, lora_scale=lora_scale,
        remat=remat, mesh=mesh,
    )
    losses = causal_lm_loss(out, batch["labels"])
    return losses.loss, losses


def lora_train_step(
    state: TrainState, batch: dict, base_params: Any,
    cfg: AriaConfig, lora_scale: float, optimizer, remat: bool = False, mesh=None,
):
    """One LoRA step: grads flow only into the adapter tree (base frozen),
    matching the reference's PEFT setup (train.py:91-114)."""
    (_, losses), grads = jax.value_and_grad(lora_loss_fn, has_aux=True)(
        state.params, base_params, cfg, batch, lora_scale, remat, mesh
    )
    updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
    new_lora = optax.apply_updates(state.params, updates)
    metrics = {
        "loss": losses.loss,
        "ce_loss": losses.ce_loss,
        "z_loss": losses.z_loss,
        "aux_loss": losses.aux_loss,
        "grad_norm": optax.global_norm(grads),
    }
    return TrainState(new_lora, new_opt, state.step + 1), metrics


def make_lora_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    schedule = _make_schedule(tc)
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip_norm),
        optax.adamw(schedule, b1=tc.b1, b2=tc.b2, weight_decay=tc.weight_decay),
    )
