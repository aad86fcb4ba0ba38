"""Activation functions with exact reference semantics.

``gelu_new``/``gelu_pytorch_tanh`` is the tanh-approximate GELU used by the
projector FFN (reference aria/model/projector.py:40) and the SigLIP ViT MLP.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

_SQRT_2_OVER_PI = 0.7978845608028654


def gelu_tanh(x: Array) -> Array:
    xf = x.astype(jnp.float32)
    out = 0.5 * xf * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (xf + 0.044715 * xf**3)))
    return out.astype(x.dtype)


def silu(x: Array) -> Array:
    xf = x.astype(jnp.float32)
    return (xf * jnp.reciprocal(1.0 + jnp.exp(-xf))).astype(x.dtype)
