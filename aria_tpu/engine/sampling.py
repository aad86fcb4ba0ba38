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


def filter_top_p(logits: Array, top_p: Array, *, shortlist: int = 256) -> Array:
    """Nucleus filtering: keep the smallest prefix of the descending-prob
    distribution whose mass reaches ``top_p`` (per-row [B] array; rows with
    top_p >= 1 pass through). logits: [B, V], already temperature-scaled.

    TPU-shaped: instead of a full 100k-vocab sort (~1ms/step), the nucleus
    cutoff is found on an exact sorted top-``shortlist`` head. The tail
    beyond the shortlist can only matter when the head carries < top_p of
    the mass; tail logits below the shortlist minimum are then kept iff the
    row's head mass is still under top_p — the same greedy-prefix rule vLLM
    applies, truncated at ``shortlist`` candidates. In engines top-p runs
    AFTER top-k (k <= 200 by default), so the shortlist is exact cover."""
    p = jnp.asarray(top_p, jnp.float32)[:, None]
    head, _ = jax.lax.top_k(logits, min(shortlist, logits.shape[-1]))  # sorted desc
    # TRUE probabilities (normalized over the full vocab, not the head) —
    # head-relative softmax would renormalize the head mass to 1 and
    # over-truncate whenever the tail carries any mass
    lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    probs = jnp.exp(head - lse)
    cum = jnp.cumsum(probs, axis=-1)
    # keep position j iff the mass STRICTLY BEFORE j is < p (so the first
    # token is always kept and the prefix that first reaches p is included)
    keep = (cum - probs) < p
    # cutoff = smallest kept logit in the head; rows whose head never reaches
    # p (top_p >= 1, or mass spread past the shortlist) pass through entirely
    cutoff = jnp.min(jnp.where(keep, head, jnp.inf), axis=-1, keepdims=True)
    cutoff = jnp.where(p >= cum[..., -1:], -jnp.inf, cutoff)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def filter_min_p(logits: Array, min_p: Array) -> Array:
    """Keep tokens whose probability >= min_p * max probability (per-row
    [B] array; rows with min_p <= 0 pass through). Cheap and fully
    per-lane: threshold = max_logit + log(min_p)."""
    mp = jnp.asarray(min_p, jnp.float32)[:, None]
    mx = jnp.max(logits, axis=-1, keepdims=True)
    cutoff = mx + jnp.log(jnp.maximum(mp, 1e-30))
    return jnp.where((mp > 0.0) & (logits < cutoff), NEG_INF, logits)


def apply_penalties(
    logits: Array,        # [B, V] fp32
    counts: Array,        # [B, V] output-token counts (int)
    prompt_mask: Array,   # [B, V] bool: token appeared in the prompt
    presence: Array,      # [B]
    frequency: Array,     # [B]
    repetition: Array,    # [B] (1.0 = off)
) -> Array:
    """OpenAI/vLLM-semantics sampling penalties, all per-lane.

    presence/frequency subtract from logits of tokens seen in the OUTPUT
    (presence once, frequency per occurrence); repetition_penalty divides
    positive / multiplies negative logits of tokens seen in prompt OR output
    (vLLM semantics; HF GenerationMixin's repetition_penalty is the
    output-side special case). Order matches vLLM's apply_penalties:
    repetition divide/multiply on the RAW logits first, then subtract
    presence/frequency — applying them the other way round would let the
    repetition scaling also rescale the subtracted penalty amounts."""
    c = counts.astype(jnp.float32)
    out_seen = c > 0.0
    rep = jnp.maximum(repetition, 1e-6)[:, None]
    seen = out_seen | prompt_mask
    penalized = jnp.where(logits > 0.0, logits / rep, logits * rep)
    logits = jnp.where(seen, penalized, logits)
    return logits - presence[:, None] * out_seen - frequency[:, None] * c


def update_counts(counts: Array, toks: Array, active: Optional[Array] = None) -> Array:
    """Scatter-add 1 at each lane's sampled token. ``active`` masks lanes
    (padding/finished lanes must not pollute their counts)."""
    one = jnp.ones((counts.shape[0], 1), counts.dtype)
    if active is not None:
        one = one * active.astype(counts.dtype)[:, None]
    return counts.at[jnp.arange(counts.shape[0])[:, None], toks[:, None]].add(
        one, mode="drop"
    )


def sample(
    rng: jax.Array,
    logits: Array,  # [B, V] fp32
    temperature: Union[float, Array] = 1.0,
    top_k: Optional[int] = None,
    top_p: Optional[Array] = None,
    min_p: Optional[Array] = None,
) -> Array:
    """Returns [B] sampled token ids. temperature<=0 means greedy.

    ``temperature`` (and ``top_p``/``min_p``) may be per-row [B] arrays
    (continuous batching serves requests with different sampling settings in
    one step). Filter order matches vLLM: top-k, then top-p, then min-p,
    all on the temperature-scaled logits."""
    if isinstance(temperature, (int, float)):
        if temperature <= 0.0 and top_p is None and min_p is None:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        temp = jnp.full((logits.shape[0],), float(temperature), jnp.float32)
    else:
        temp = temperature.astype(jnp.float32)
    scaled = logits.astype(jnp.float32) / jnp.maximum(temp, 1e-5)[:, None]
    if top_k is not None:
        scaled = filter_top_k(scaled, top_k)
    if top_p is not None:
        scaled = filter_top_p(scaled, top_p)
    if min_p is not None:
        scaled = filter_min_p(scaled, min_p)
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
