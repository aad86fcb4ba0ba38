"""Sync-free sampling ops (all on-device, no host round-trips).

Equivalent in distribution to the reference's sampling
(gptfast/generate.py:35-56): temperature scaling, top-k filtering, and a
Gumbel-argmax draw (the JAX analogue of the exponential-race multinomial
trick — neither needs a host sync).
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
from jax import Array

NEG_INF = -1e30


def filter_top_k(logits: Array, top_k: int, *, exact: bool = False) -> Array:
    """Keep the top-k logits, set the rest to -inf. logits: [..., V].

    By default uses the TPU-native ``approx_max_k`` to find the k-th value
    (a full sort over a 100k vocab costs ~1ms/step on v5e); recall target
    0.99 keeps the cutoff within noise for sampling purposes.
    """
    if exact:
        kth = jax.lax.top_k(logits, top_k)[0][..., -1:]
    else:
        kth = jax.lax.approx_max_k(logits, top_k, recall_target=0.99)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def sample(
    rng: jax.Array,
    logits: Array,  # [B, V] fp32
    temperature: Union[float, Array] = 1.0,
    top_k: Optional[int] = None,
) -> Array:
    """Returns [B] sampled token ids. temperature<=0 means greedy.

    ``temperature`` may be a per-row [B] array (continuous batching serves
    requests with different sampling settings in one step)."""
    if isinstance(temperature, (int, float)):
        if temperature <= 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        temp = jnp.full((logits.shape[0],), float(temperature), jnp.float32)
    else:
        temp = temperature.astype(jnp.float32)
    scaled = logits.astype(jnp.float32) / jnp.maximum(temp, 1e-5)[:, None]
    if top_k is not None:
        scaled = filter_top_k(scaled, top_k)
    gumbel = jax.random.gumbel(rng, scaled.shape, jnp.float32)
    sampled = jnp.argmax(scaled + gumbel, axis=-1)
    greedy = jnp.argmax(logits, axis=-1)
    return jnp.where(temp <= 0.0, greedy, sampled).astype(jnp.int32)


def token_logprobs(logits, toks, k: int = 5):
    """Natural-log model probabilities for OpenAI-style ``logprobs``.

    Returns (chosen [B], top_ids [B, k], top_lps [B, k]) under the RAW
    (pre-temperature) distribution — the convention OpenAI reports.
    Top alternatives use approx_max_k (no full-vocab sort on the TPU)."""
    import jax.numpy as jnp
    from jax import lax

    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    chosen = jnp.take_along_axis(logp, toks[:, None].astype(jnp.int32), axis=-1)[:, 0]
    top_lps, top_ids = lax.approx_max_k(logp, k=k)
    return chosen, top_ids.astype(jnp.int32), top_lps
