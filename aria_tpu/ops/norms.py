"""Normalization ops, computed in fp32 and cast back (TPU-safe numerics).

Semantics match the reference: RMSNorm (gptfast/model.py:461-472) normalizes in
fp32 then multiplies by the weight in the input dtype; LayerNorm matches
torch.nn.LayerNorm defaults used by the ViT/projector.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def rms_norm(x: Array, weight: Array, eps: float = 1e-5) -> Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = (xf * jnp.reciprocal(jnp.sqrt(var + eps))).astype(x.dtype)
    return normed * weight


def layer_norm(x: Array, weight: Array, bias: Array, eps: float = 1e-6) -> Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    normed = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    return normed.astype(x.dtype) * weight + bias
