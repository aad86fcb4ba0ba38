"""Interleaved rotary position embeddings.

Matches the reference semantics exactly (gptfast/model.py:500-531): frequencies
``base**(-2i/d)`` for i in [0, d/2), angles computed in fp32, rotation applied to
*interleaved* pairs ``(x[..., 0::2], x[..., 1::2])``, result cast back to the
input dtype.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def precompute_rope(positions: Array, head_dim: int, base: float) -> tuple[Array, Array]:
    """Return (cos, sin), each [..., head_dim // 2], fp32.

    ``positions`` may be any integer-shaped array; output broadcasts with it.
    """
    freqs = 1.0 / (
        base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )  # [d/2]
    angles = positions.astype(jnp.float32)[..., None] * freqs  # [..., d/2]
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: Array, cos: Array, sin: Array) -> Array:
    """Rotate interleaved pairs. x: [B, S, H, D]; cos/sin: [S, D/2] or [B, S, D/2].

    The rotation runs in fp32 (reference-exact) below 8K tokens. At a very
    long one-shot prefill the f32 temporaries are the HBM margin — at 32K the
    [1, S, 2560] convert copy plus its even/odd gathers were ~640MB of the
    29MB the full int4 model was over budget — so >=8K rotates in the input
    dtype (cos/sin still computed in f32 then rounded once; the output is
    cast to x.dtype either way, so this adds one extra bf16 rounding on the
    products, ~2^-8 relative, far under the int4 weight noise).
    """
    cdt = jnp.float32 if x.shape[1] < 8192 else x.dtype
    xf = x.astype(cdt)
    cos = cos.astype(cdt)
    sin = sin.astype(cdt)
    x_even = xf[..., 0::2]
    x_odd = xf[..., 1::2]
    if cos.ndim == 2:  # [S, D/2] -> broadcast over batch and heads
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
    elif cos.ndim == 3:  # [B, S, D/2]
        cos = cos[:, :, None, :]
        sin = sin[:, :, None, :]
    out_even = x_even * cos - x_odd * sin
    out_odd = x_odd * cos + x_even * sin
    # Re-interleave: stack on a trailing axis and flatten.
    out = jnp.stack([out_even, out_odd], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)
