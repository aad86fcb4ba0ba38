"""Ring attention: causal context parallelism with rotating KV blocks.

The reference has no sequence parallelism at all (SURVEY.md §5 — its 64K
context is single-GPU flash-attn); this and `context.py` (Ulysses) are the two
net-new TPU context-parallel designs. Ulysses all-to-alls *heads*; ring
attention instead keeps queries resident and rotates KV *blocks* around the
`context` ring via `jax.lax.ppermute`, merging partial attention with the
online-softmax (flash) recurrence. Compared to Ulysses it has no
heads % devices constraint and moves 2/H-th the bytes per hop, at the cost of
c-1 sequential hops — on a TPU torus the ppermute rides neighbor ICI links,
which is exactly the topology's sweet spot.

Causality over blocks: device i owns query block i and initially KV block i.
At ring step s it holds KV block (i - s) mod c:
  - src == i: the diagonal block, within-block causal mask;
  - src <  i: fully visible (all its keys precede all of our queries);
  - src >  i: fully masked (keys are in our future) — contributes zero.
The merge uses a running (m, l, acc) in fp32, so the result equals exact
softmax attention bit-for-nearly (one extra exp rescale per hop).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

_NEG = -1e30


def _ring_body(q, k, v, *, axis: str, scale: float):
    # local shapes [B, Sq, H, D] with Sq = S / c
    c = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)
    B, Sq, H, D = q.shape

    qf = q.astype(jnp.float32) * scale
    pos = jnp.arange(Sq)  # local positions align across blocks

    def step(s, carry):
        k_cur, v_cur, m, l, acc = carry
        src = (idx - s) % c
        # logits [B, H, Sq_q, Sq_k]
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", qf, k_cur.astype(jnp.float32)
        )
        # block-level mask
        full = src < idx
        none = src > idx
        mask = jnp.where(
            none,
            jnp.zeros((Sq, Sq), bool),
            jnp.where(full, jnp.ones((Sq, Sq), bool), pos[None, :] <= pos[:, None]),
        )  # [Sq_q, Sq_k]
        logits = jnp.where(mask[None, None], logits, _NEG)

        m_blk = jnp.max(logits, axis=-1)  # [B, H, Sq]
        m_new = jnp.maximum(m, m_blk)
        p = jnp.exp(logits - m_new[..., None])
        p = jnp.where(mask[None, None], p, 0.0)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=-1)
        pv = jnp.einsum("bhqk,bkhd->bhqd", p, v_cur.astype(jnp.float32))
        acc_new = acc * corr[..., None] + pv

        # rotate KV one hop: device i sends to i+1
        perm = [(j, (j + 1) % c) for j in range(c)]
        k_nxt = jax.lax.ppermute(k_cur, axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis, perm)
        return k_nxt, v_nxt, m_new, l_new, acc_new

    m0 = jnp.full((B, H, Sq), _NEG, jnp.float32)
    l0 = jnp.zeros((B, H, Sq), jnp.float32)
    acc0 = jnp.zeros((B, H, Sq, D), jnp.float32)
    _, _, m, l, acc = jax.lax.fori_loop(0, c, step, (k, v, m0, l0, acc0))

    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # [B, Sq, H, D]


def ring_attention(
    q: Array,  # [B, S, H, D] (globally), sequence-sharded over `axis`
    k: Array,
    v: Array,
    mesh: Mesh,
    *,
    axis: str = "context",
    causal: bool = True,
) -> Array:
    """Causal ring attention over ``mesh[axis]``. Drop-in alternative to
    `context.ulysses_attention` with no num_heads % devices constraint."""
    if not causal:
        raise NotImplementedError("ring attention here is causal-only")
    c = mesh.shape[axis]
    B, S, H, D = q.shape
    if S % c:
        raise ValueError(f"seq {S} must divide context={c}")
    scale = D ** -0.5
    spec = P(None, axis, None, None)
    fn = shard_map(
        functools.partial(_ring_body, axis=axis, scale=scale),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
