"""Composite Aria VLM: vision tower -> projector -> scatter -> MoE decoder.

Parity target: reference aria/model/modeling_aria.py:125-365 and
gptfast/model.py:534-609. Image features replace ``<|img|>`` token embeddings
in flattened order — the i-th image feature lands at the i-th image-token
position (torch ``masked_scatter`` semantics), implemented here as a
cumulative-count gather that stays fully vectorized under jit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from aria_tpu.config import AriaConfig
from aria_tpu.models.moe_lm import KVCache, LMOutput, init_lm_params, lm_forward
from aria_tpu.models.projector import init_projector_params, projector_forward
from aria_tpu.models.vit import init_vit_params, vit_forward


def init_aria_params(rng: jax.Array, cfg: AriaConfig, dtype=jnp.bfloat16) -> dict:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "vision": init_vit_params(k1, cfg.vision, dtype),
        "projector": init_projector_params(k2, cfg.projector, dtype),
        "lm": init_lm_params(k3, cfg.text, dtype),
    }


def encode_images(
    params: dict,
    cfg: AriaConfig,
    pixel_values: Array,
    pixel_mask: Optional[Array] = None,
) -> Array:
    """[N, C, S, S] images -> [N, Q, D_lm] projected image features.

    ``pixel_values`` may be uint8 (raw resized pixels): normalization then
    runs ON DEVICE with the exact host sequence ((x/255 - 0.5) / 0.5 in
    f32, data/vision_processor.py mean/std defaults) — a 980px crop ships
    2.9MB over the host->device link instead of 11.5MB of f32, which is
    most of the image-to-first-token wall on a remote-attached TPU.
    ``pixel_mask=None`` means every pixel is valid (the full-crop common
    case) and builds the mask on device instead of shipping ~1MB of bools.
    """
    if pixel_values.dtype == jnp.uint8:
        pv = pixel_values.astype(jnp.float32) / 255.0
        pixel_values = (pv - 0.5) / 0.5
    if pixel_mask is None:
        pixel_mask = jnp.ones(
            (pixel_values.shape[0],) + pixel_values.shape[2:], bool)
    vis = vit_forward(params["vision"], cfg.vision, pixel_values, pixel_mask)
    return projector_forward(params["projector"], cfg.projector, vis.features, vis.kv_ignore_mask)


def scatter_image_features(
    embeds: Array,  # [B, S, D] token embeddings
    tokens: Array,  # [B, S]
    image_features: Array,  # [N, Q, D]
    image_token_id: int,
) -> Array:
    """masked_scatter equivalent: i-th image feature -> i-th image-token slot."""
    B, S, D = embeds.shape
    flat_feats = image_features.reshape(-1, D).astype(embeds.dtype)
    is_img = (tokens == image_token_id).reshape(-1)  # [B*S]
    # Index of each image-token position into the flattened feature list.
    feat_idx = jnp.cumsum(is_img.astype(jnp.int32)) - 1
    feat_idx = jnp.clip(feat_idx, 0, flat_feats.shape[0] - 1)
    gathered = flat_feats[feat_idx].reshape(B, S, D)
    return jnp.where((tokens == image_token_id)[..., None], gathered, embeds)


def prepare_embeddings(
    params: dict,
    cfg: AriaConfig,
    tokens: Array,  # [B, S]
    pixel_values: Optional[Array] = None,
    pixel_mask: Optional[Array] = None,
    image_features: Optional[Array] = None,  # precomputed encode_images output
) -> Array:
    """Token embeddings with image features scattered into ``<|img|>`` slots.

    ``image_features`` lets callers run the ViT+projector as a SEPARATE jitted
    program (Engine._encode_jit): fusing the 980px vision tower into every
    prompt-bucket prefill program both recompiles it per bucket and stacks its
    activation peak on top of the LM prefill's inside one XLA live range.
    """
    from aria_tpu.models.moe_lm import embed_tokens

    embeds = embed_tokens(params["lm"]["embed"], tokens)
    if image_features is None and pixel_values is not None:
        image_features = encode_images(params, cfg, pixel_values, pixel_mask)
    if image_features is not None:
        embeds = scatter_image_features(embeds, tokens, image_features, cfg.image_token_id)
    return embeds


def aria_forward(
    params: dict,
    cfg: AriaConfig,
    tokens: Array,  # [B, S]
    pixel_values: Optional[Array] = None,  # [N, C, S_img, S_img]
    pixel_mask: Optional[Array] = None,  # [N, S_img, S_img] bool
    *,
    positions: Optional[Array] = None,
    mask: Optional[Array] = None,
    cache: Optional[KVCache] = None,
    cache_pos: Optional[Array] = None,
    training: bool = False,
    lora: Optional[dict] = None,  # {"lm": {"layers": {...}}}
    lora_scale: float = 0.0,
    remat: bool = False,
    mesh=None,  # enables context parallelism when mesh["context"] > 1
) -> LMOutput:
    embeds = prepare_embeddings(params, cfg, tokens, pixel_values, pixel_mask)
    return lm_forward(
        params["lm"], cfg.text, inputs_embeds=embeds,
        positions=positions, mask=mask, cache=cache, cache_pos=cache_pos,
        training=training,
        lora=lora["lm"] if lora is not None else None, lora_scale=lora_scale,
        remat=remat, mesh=mesh,
    )


class LossOutput(NamedTuple):
    loss: Array
    ce_loss: Array
    z_loss: Array
    aux_loss: Array


def causal_lm_loss(out: LMOutput, labels: Array, *, include_aux: bool = True) -> LossOutput:
    """Shifted cross-entropy over positions with label != -100
    (reference modeling_aria.py:300-323), plus MoE aux losses added directly
    to the scalar loss (the JAX-native replacement for MoEAuxLossAutoScaler).
    """
    logits = out.logits[:, :-1].astype(jnp.float32)
    targets = labels[:, 1:]
    valid = targets != -100
    safe_targets = jnp.where(valid, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_logp = jnp.take_along_axis(logp, safe_targets[..., None], axis=-1)[..., 0]
    ce = -jnp.sum(jnp.where(valid, tok_logp, 0.0)) / jnp.maximum(jnp.sum(valid), 1)
    loss = ce + (out.z_loss + out.aux_loss if include_aux else 0.0)
    return LossOutput(loss, ce, out.z_loss, out.aux_loss)
