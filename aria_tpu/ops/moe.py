"""Mixture-of-Experts ops: top-k routing, aux losses, and expert compute.

Routing semantics match the reference exactly (aria/model/moe_lm.py:243-273 and
gptfast/model.py:355-366): softmax is taken over the *top-k logits only* (fp32,
cast back), while the aux load-balancing loss uses the full softmax over all
experts (moe_lm.py:234). The z-loss and switch load-balancing loss formulas are
from moe_lm.py:128-166.

Expert compute is TPU-first, replacing the reference's CUDA ``grouped_gemm``
(moe_lm.py:431-484):

- ``experts_gather``: per-token gathered-weight einsum for small token counts
  (decode), the analogue of gptfast/model.py:315-325.
- ``experts_grouped``: sort + fixed-capacity dispatch into an ``[E, C, D]``
  buffer followed by *batched* GEMMs that map straight onto the MXU, then a
  weighted combine. With ``capacity >= T`` this is exactly dropless.

Expert weights are stored out-major for contiguous per-expert weight tiles
(the decode kernel streams them row-wise from HBM): ``w1: [E, 2*I, D]``
(fused gate/up, GLU = silu(first half) * second half, matching the
reference fc1 semantics at moe_lm.py:498-509 up to a transpose) and
``w2: [E, I, D]``.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from aria_tpu.ops.activations import silu


class RouterOutput(NamedTuple):
    weights: Array  # [T, k] combine weights (softmax over top-k logits)
    indices: Array  # [T, k] int32 expert ids
    tokens_per_expert: Array  # [E] int32
    z_loss: Array  # scalar fp32 (0 when not training)
    aux_loss: Array  # scalar fp32 (0 when not training)


def route_topk(
    x: Array,  # [T, D]
    gate_weight: Array,  # [E, D]
    topk: int,
    *,
    z_loss_coeff: float = 0.0,
    aux_loss_coeff: float = 0.0,
    training: bool = False,
) -> RouterOutput:
    num_experts = gate_weight.shape[0]
    logits = jnp.einsum(
        "td,ed->te", x, gate_weight, preferred_element_type=jnp.float32
    )

    top_logits, top_indices = jax.lax.top_k(logits, topk)
    scores = jax.nn.softmax(top_logits.astype(jnp.float32), axis=-1)

    one_hot = jax.nn.one_hot(top_indices, num_experts, dtype=jnp.int32)
    tokens_per_expert = jnp.sum(one_hot, axis=(0, 1))

    if training:
        z = jax.nn.logsumexp(logits, axis=-1)
        z_loss = jnp.mean(jnp.square(z)) * z_loss_coeff
        probs = jax.nn.softmax(logits, axis=-1)
        num_tokens = logits.shape[0] * topk
        aux_loss = jnp.sum(jnp.mean(probs, axis=0) * tokens_per_expert) * (
            num_experts / num_tokens * aux_loss_coeff
        )
    else:
        z_loss = jnp.zeros((), jnp.float32)
        aux_loss = jnp.zeros((), jnp.float32)

    return RouterOutput(
        scores.astype(x.dtype), top_indices.astype(jnp.int32),
        tokens_per_expert, z_loss, aux_loss,
    )


def glu(x: Array) -> Array:
    gate, up = jnp.split(x, 2, axis=-1)
    return silu(gate) * up


def experts_gather(
    x: Array,  # [T, D]
    indices: Array,  # [T, k]
    weights: Array,  # [T, k]
    w1: Array,  # [E, 2I, D]
    w2: Array,  # [E, I, D]
) -> Array:
    """Decode path: gather the active experts' weights per token and einsum."""
    w1_g = w1[indices]  # [T, k, 2I, D]
    w2_g = w2[indices]  # [T, k, I, D]
    h = jnp.einsum("td,tkfd->tkf", x, w1_g, preferred_element_type=jnp.float32)
    h = glu(h.astype(x.dtype))
    out = jnp.einsum("tkf,tkfd->tkd", h, w2_g, preferred_element_type=jnp.float32)
    out = jnp.einsum("tkd,tk->td", out, weights.astype(jnp.float32))
    return out.astype(x.dtype)


def _dispatch_indices(indices: Array, num_experts: int, capacity: int):
    """Compute, per routing slot, its destination row in the [E*C] buffer.

    Returns (slot_dest [T*k], token_ids [T*k]) with OOB slots mapped to E*C
    (a trash row appended to the buffer).
    """
    T, k = indices.shape
    flat_e = indices.reshape(-1)  # [T*k]
    order = jnp.argsort(flat_e, stable=True)  # slots sorted by expert

    counts = jnp.zeros((num_experts,), jnp.int32).at[flat_e].add(1)
    starts = jnp.cumsum(counts) - counts  # exclusive cumsum [E]

    sorted_e = flat_e[order]
    ranks = jnp.arange(T * k, dtype=jnp.int32) - starts[sorted_e]
    pos_in_expert = jnp.zeros((T * k,), jnp.int32).at[order].set(ranks)

    in_cap = pos_in_expert < capacity
    slot_dest = jnp.where(in_cap, flat_e * capacity + pos_in_expert, num_experts * capacity)
    token_ids = jnp.repeat(jnp.arange(T, dtype=jnp.int32), k)
    return slot_dest, token_ids


def experts_grouped(
    x: Array,  # [T, D]
    indices: Array,  # [T, k]
    weights: Array,  # [T, k]
    w1: Array,  # [E, 2I, D]
    w2: Array,  # [E, I, D]
    capacity: Optional[int] = None,
    lora_w1: Optional[dict] = None,  # {"a": [E, D, r], "b": [E, r, 2I]}
    #                                  (multi-adapter: [A, E, D, r] etc.)
    lora_w2: Optional[dict] = None,  # {"a": [E, I, r], "b": [E, r, D]}
    lora_scale: float = 0.0,
    lora_onehot: Optional[Array] = None,  # [A, T]: per-token adapter selector
) -> Array:
    """Prefill/train path: capacity dispatch + batched GEMM over experts.

    ``capacity=None`` defaults to T (exactly dropless, since a token can route
    to an expert at most once). Lower capacities trade dropped tokens for
    compute, like GShard's capacity factor.

    Optional per-expert LoRA factors are applied inside the expert computation
    (fc1 pre-GLU, fc2 post-GLU), matching the reference's grouped-GEMM LoRA
    layer (aria/lora/layers.py:108-152).
    """
    T, D = x.shape
    E = w1.shape[0]
    k = indices.shape[1]
    C = T if capacity is None else capacity

    slot_dest, token_ids = _dispatch_indices(indices, E, C)

    # Scatter tokens into the expert buffer ([E*C + 1, D]; last row is trash).
    buf = jnp.zeros((E * C + 1, D), x.dtype).at[slot_dest].set(x[token_ids])
    buf = buf[: E * C].reshape(E, C, D)

    multi = lora_onehot is not None and (
        (lora_w1 or lora_w2) and
        (lora_w1 or lora_w2)["a"].ndim == 4
    )
    if multi:
        # per-adapter one-hot scattered into the expert buffers: each
        # adapter's rank-r delta is computed over all buffers (A x a tiny
        # cost) and selected per row — rows from different requests can sit
        # in the same expert's buffer
        mhot = jnp.zeros((E * C + 1, lora_onehot.shape[0]), jnp.float32)
        mhot = mhot.at[slot_dest].set(lora_onehot.T[token_ids])
        mhot = mhot[: E * C].reshape(E, C, -1)

    h = jnp.einsum("ecd,efd->ecf", buf, w1, preferred_element_type=jnp.float32)
    if lora_w1 is not None:
        if multi:
            hr = jnp.einsum("ecd,aedr->aecr", buf, lora_w1["a"])
            hd = jnp.einsum("aecr,aerf->aecf", hr, lora_w1["b"])
            h = h + lora_scale * jnp.einsum("aecf,eca->ecf", hd, mhot)
        else:
            hr = jnp.einsum("ecd,edr->ecr", buf, lora_w1["a"])
            h = h + lora_scale * jnp.einsum("ecr,erf->ecf", hr, lora_w1["b"])
    h = glu(h.astype(x.dtype))
    out = jnp.einsum("ecf,efd->ecd", h, w2, preferred_element_type=jnp.float32)
    if lora_w2 is not None:
        if multi:
            outr = jnp.einsum("ecf,aefr->aecr", h, lora_w2["a"])
            outd = jnp.einsum("aecr,aerd->aecd", outr, lora_w2["b"])
            out = out + lora_scale * jnp.einsum("aecd,eca->ecd", outd, mhot)
        else:
            outr = jnp.einsum("ecf,efr->ecr", h, lora_w2["a"])
            out = out + lora_scale * jnp.einsum("ecr,erd->ecd", outr, lora_w2["b"])
    out = out.astype(x.dtype).reshape(E * C, D)
    out = jnp.concatenate([out, jnp.zeros((1, D), x.dtype)], axis=0)

    # Gather back and combine with routing weights ([T, k, D] -> [T, D]).
    per_slot = out[slot_dest].reshape(T, k, D)
    combined = jnp.einsum(
        "tkd,tk->td", per_slot.astype(jnp.float32), weights.astype(jnp.float32)
    )
    return combined.astype(x.dtype)


def experts_ragged(
    x: Array,  # [T, D]
    indices: Array,  # [T, k]
    weights: Array,  # [T, k]
    w1: Array,  # [E, 2I, D] out-major
    w2: Array,  # [E, I, D]
    *,
    interpret: bool = False,
) -> Array:
    """Dropless ragged path on TPU: sort tokens by expert, then megablox
    grouped matmuls with on-device group sizes (no host sync, unlike the
    reference's tokens_per_expert.cpu(), moe_lm.py:478). Differentiable —
    megablox gmm carries a custom VJP.
    """
    from jax.experimental.pallas.ops.tpu.megablox.ops import gmm

    T, D = x.shape
    E = w1.shape[0]
    k = indices.shape[1]

    flat_e = indices.reshape(-1)
    order = jnp.argsort(flat_e, stable=True)  # [T*k] routing slots by expert
    sorted_tokens = x[order // k]
    group_sizes = jnp.zeros((E,), jnp.int32).at[flat_e].add(1)

    # gmm requires rows divisible by the m-tile; pad rows are assigned to the
    # last expert (their outputs are dropped by the unpermute below).
    M = T * k
    M_pad = -(-M // 128) * 128
    if M_pad != M:
        sorted_tokens = jnp.pad(sorted_tokens, ((0, M_pad - M), (0, 0)))
        group_sizes = group_sizes.at[E - 1].add(M_pad - M)

    h = gmm(sorted_tokens, w1, group_sizes, transpose_rhs=True,
            preferred_element_type=jnp.float32, interpret=interpret)
    h = glu(h.astype(x.dtype))
    out = gmm(h, w2, group_sizes, preferred_element_type=jnp.float32,
              interpret=interpret)

    out = out[:M]
    unsorted = jnp.zeros_like(out).at[order].set(out)  # inverse permutation
    combined = jnp.einsum(
        "tkd,tk->td", unsorted.reshape(T, k, D), weights.astype(jnp.float32)
    )
    return combined.astype(x.dtype)
