"""Speculative decoding: prompt-lookup drafting + a k-token verify step.

The reference has no speculative path; the parity target is vLLM's ngram
speculator (prompt-lookup decoding), rebuilt the TPU way:

- Decode at low batch is weight-DMA-bound (BENCH_NOTES: ~2.1 GB/token of
  weights vs a ~2.7 ms/token HBM floor), so a verify step that feeds k+1
  tokens through one forward streams the SAME weights as a 1-token step —
  accepted draft tokens are nearly free.
- The n-gram matcher runs ON DEVICE over a token-history buffer, so
  draft -> verify -> accept chains inside one ``lax.scan`` with zero host
  round-trips (vLLM's ngram worker does the lookup host-side every step;
  through a remote-TPU relay one host hop costs more than the whole step).
- Rejected draft positions need no cache rollback: their k/v rows sit past
  the accepted length, every later mask/kernel clamps reads to the true
  length, and the rows are overwritten when those positions are reached.

Correctness:
- greedy (temperature<=0): acceptance is exact argmax match, so the output
  sequence is bit-identical to plain greedy decode (pinned by
  tests/test_speculative.py).
- sampled: the deterministic-draft special case of standard speculative
  rejection sampling — accept draft token d at a position with probability
  p(d) under the engine's filtered distribution (temperature/top-k/top-p/
  min-p); on rejection, sample from p conditioned on != d. Marginal law:
  p(d)*1[x=d] + (1-p(d)) * p(x)*1[x!=d]/(1-p(d)) = p(x) — the target
  distribution exactly, position by position.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array

from aria_tpu.engine.sampling import (
    NEG_INF,
    filter_min_p,
    filter_top_k,
    filter_top_p,
)


@dataclasses.dataclass(frozen=True)
class SpeculativeConfig:
    k: int = 7          # drafted tokens per verify step (verify feeds k+1)
    ngram: int = 2      # suffix length the prompt-lookup matcher keys on
    steps_per_chunk: int = 8  # verify steps per host dispatch


def ngram_draft(hist: Array, hist_len: Array, n: int, k: int) -> Array:
    """Draft ``k`` continuation tokens by prompt lookup.

    ``hist`` [B, S] holds prompt + produced tokens; ``hist_len`` [B] counts
    the valid prefix (``hist[:, hist_len-1]`` is the token about to be fed).
    Finds the most recent earlier occurrence of the trailing ``n``-gram and
    proposes the k tokens that followed it. No match -> the (garbage) tokens
    at the tail; draft quality only affects speed, never correctness — the
    verify step accepts a draft token only when the target model itself
    produces it.
    """
    B, S = hist.shape
    # windows[b, i] = hist[b, i:i+n]
    win = jnp.stack([hist[:, j: S - n + 1 + j] for j in range(n)], axis=-1)
    tgt = jax.vmap(
        lambda h, hl: jax.lax.dynamic_slice(h, (hl - n,), (n,))
    )(hist, hist_len)  # [B, n]
    idx = jnp.arange(S - n + 1, dtype=jnp.int32)
    m = jnp.all(win == tgt[:, None, :], axis=-1)
    m &= idx[None, :] < (hist_len - n)[:, None]  # strictly before the suffix
    best = jnp.max(jnp.where(m, idx[None, :], -1), axis=-1)  # latest match
    start = jnp.where(best >= 0, best + n, hist_len)
    draft = jax.vmap(
        lambda h, s: jax.lax.dynamic_slice(h, (s,), (k,))
    )(hist, start)
    return draft.astype(jnp.int32)


def verify_greedy(logits: Array, draft: Array) -> tuple[Array, Array]:
    """Greedy acceptance: produced tokens + count.

    logits [B, k+1, V] (position i conditions on the prefix + draft[:i]),
    draft [B, k]. Returns (produced [B, k+1], n_prod [B]): the argmax tokens
    are correct output wherever the draft prefix matched, plus one bonus
    token at the first mismatch — identical to what plain greedy decode
    would emit token by token.
    """
    tgt = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [B, k+1]
    match = (draft == tgt[:, :-1]).astype(jnp.int32)
    n_acc = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # leading matches
    return tgt, n_acc + 1


def verify_sampled(
    rng: jax.Array,
    logits: Array,  # [B, k+1, V]
    draft: Array,   # [B, k]
    temperature: float,
    top_k: Optional[int],
    top_p: Optional[Array] = None,  # [B]
    min_p: Optional[Array] = None,  # [B]
) -> tuple[Array, Array]:
    """Rejection-sampled acceptance preserving the target distribution."""
    B, K1, V = logits.shape
    k = K1 - 1
    scaled = logits.reshape(B * K1, V).astype(jnp.float32)
    scaled = scaled / max(float(temperature), 1e-5)
    if top_k is not None:
        scaled = filter_top_k(scaled, top_k)
    if top_p is not None:
        scaled = filter_top_p(scaled, jnp.repeat(top_p, K1))
    if min_p is not None:
        scaled = filter_min_p(scaled, jnp.repeat(min_p, K1))
    logp = jax.nn.log_softmax(scaled, axis=-1).reshape(B, K1, V)

    rng_u, rng_b = jax.random.split(rng)
    p_draft = jnp.take_along_axis(
        jnp.exp(logp[:, :k]), draft[..., None], axis=-1
    )[..., 0]  # [B, k]
    accept = jax.random.uniform(rng_u, (B, k)) < p_draft
    n_acc = jnp.sum(jnp.cumprod(accept.astype(jnp.int32), axis=1), axis=1)

    # bonus draw at position n_acc: the residual distribution (target with
    # the rejected draft token removed) on a rejection, the plain target at
    # position k when every draft token was accepted
    la = jnp.take_along_axis(
        logp, n_acc[:, None, None], axis=1
    )[:, 0]  # [B, V]
    dpad = jnp.concatenate([draft, draft[:, -1:]], axis=1)  # index safety
    d_a = jnp.take_along_axis(dpad, n_acc[:, None], axis=1)  # [B, 1]
    rejected = (n_acc < k)[:, None]
    la = jnp.where(
        rejected & (jnp.arange(V)[None, :] == d_a), NEG_INF, la
    )
    gumbel = jax.random.gumbel(rng_b, la.shape, jnp.float32)
    bonus = jnp.argmax(la + gumbel, axis=-1).astype(jnp.int32)  # [B]

    prod = jnp.concatenate([draft, jnp.zeros((B, 1), jnp.int32)], axis=1)
    onehot = jnp.arange(K1)[None, :] == n_acc[:, None]
    prod = jnp.where(onehot, bonus[:, None], prod)
    return prod, n_acc + 1
