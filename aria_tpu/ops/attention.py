"""Attention primitives.

``sdpa`` is the XLA-fused reference path (semantics of
torch.nn.functional.scaled_dot_product_attention as used at
gptfast/model.py:434-443): fp32 softmax with additive -inf masking. A Pallas
flash-attention kernel plugs in behind the same signature (ops/flash_attention).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from jax import Array

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def sdpa(
    q: Array,  # [B, Sq, H, D]
    k: Array,  # [B, Sk, H_kv, D]
    v: Array,  # [B, Sk, H_kv, D]
    mask: Optional[Array] = None,  # broadcastable to [B, H, Sq, Sk]; True = attend
    scale: Optional[float] = None,
) -> Array:
    """Masked scaled-dot-product attention; returns [B, Sq, H, D]."""
    B, Sq, H, D = q.shape
    Hkv = k.shape[2]
    if Hkv != H:
        rep = H // Hkv
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    if scale is None:
        scale = 1.0 / (D**0.5)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jnp.exp(logits - jnp.max(logits, axis=-1, keepdims=True))
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.astype(q.dtype)


def causal_mask(sq: int, sk: int, offset: int = 0) -> Array:
    """[1, 1, sq, sk] boolean causal mask; query i attends key j iff j <= i + offset."""
    qi = jnp.arange(sq)[:, None] + offset
    kj = jnp.arange(sk)[None, :]
    return (kj <= qi)[None, None]
