"""Expert parallelism: all-to-all token dispatch over the ``expert`` mesh axis.

The reference replicates all 64 experts on every GPU and grouped-GEMMs locally
(aria/model/moe_lm.py:431-484); SURVEY §2.2 names the first-class TPU design
this module provides: each device owns E/n experts, tokens travel to their
experts' owners over ICI via ``jax.lax.all_to_all`` inside ``shard_map``, are
computed with a local grouped GEMM, and travel back — the expert stacks are
NEVER all-gathered (annotation-only GSPMD sharding would gather the full
[E, 2I, D] stacks to every device).

Layout: tokens are sharded over the SAME ``expert`` axis (each device routes
its own T/n tokens), so the all-to-all exchanges [n, C, D] capacity buffers
where C bounds the slots any one device may send to one owner. With
``capacity_factor=None`` the dispatch is exactly dropless (C = T_loc * k);
finite factors trade dropped slots for smaller exchanges, GShard-style.

Aux losses are computed from device-local routing and reduced with
psum/pmean so they equal the unsharded formulas exactly.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def _dispatch_to_devices(dest: Array, n: int, capacity: int):
    """Per routing slot, its row in the [n * C] send buffer (row n*C = trash
    for capacity overflow). Same arithmetic as ops.moe._dispatch_indices with
    devices in place of experts."""
    S = dest.shape[0]
    order = jnp.argsort(dest, stable=True)
    counts = jnp.zeros((n,), jnp.int32).at[dest].add(1)
    starts = jnp.cumsum(counts) - counts
    sorted_d = dest[order]
    ranks = jnp.arange(S, dtype=jnp.int32) - starts[sorted_d]
    pos = jnp.zeros((S,), jnp.int32).at[order].set(ranks)
    in_cap = pos < capacity
    return jnp.where(in_cap, dest * capacity + pos, n * capacity)


def _ep_body(x, gate, w1, w2, *, axis, topk, n, capacity,
             z_coeff, aux_coeff, training):
    """Per-device body. x [T_loc, D]; w1 [E/n, 2I, D]; w2 [E/n, I, D].

    Quantized stacks (int8 ``{"q", "s"}`` / int4 ``{"q4", ...}`` dicts, see
    ops/quant.py) arrive as per-leaf expert-axis shards and are dequantized
    device-locally — each owner touches only its own E/n experts, so the
    all-to-all pattern (and the no-stack-gather property) is identical to the
    bf16 path."""
    from aria_tpu.ops.moe import experts_grouped
    from aria_tpu.ops.quant import dequantize_expert_weights

    w1, w2 = dequantize_expert_weights(w1, w2, dtype=x.dtype)
    T_loc, D = x.shape
    E_loc = w1.shape[0]
    E = E_loc * n
    C = capacity

    logits = jnp.einsum("td,ed->te", x, gate, preferred_element_type=jnp.float32)
    top_logits, indices = jax.lax.top_k(logits, topk)
    weights = jax.nn.softmax(top_logits.astype(jnp.float32), axis=-1)

    if training:
        # exact global formulas via cross-device reduction
        z = jax.nn.logsumexp(logits, axis=-1)
        z_loss = jax.lax.pmean(jnp.mean(jnp.square(z)), axis) * z_coeff
        probs = jax.nn.softmax(logits, axis=-1)
        counts = jnp.sum(jax.nn.one_hot(indices, E, dtype=jnp.int32), axis=(0, 1))
        g_counts = jax.lax.psum(counts, axis)
        g_probs = jax.lax.pmean(jnp.mean(probs, axis=0), axis)
        num_tokens = T_loc * n * topk
        aux_loss = jnp.sum(g_probs * g_counts) * (E / num_tokens * aux_coeff)
    else:
        z_loss = aux_loss = jnp.zeros((), jnp.float32)

    # ---- dispatch: send each slot to its expert's owner device
    flat_idx = indices.reshape(-1).astype(jnp.int32)  # [T_loc*k]
    dest_dev = flat_idx // E_loc
    local_e = flat_idx % E_loc
    send_row = _dispatch_to_devices(dest_dev, n, C)  # [T_loc*k]
    token_of_slot = jnp.arange(T_loc * topk, dtype=jnp.int32) // topk

    x_send = jnp.zeros((n * C + 1, D), x.dtype).at[send_row].set(x[token_of_slot])
    e_send = jnp.zeros((n * C + 1,), jnp.int32).at[send_row].set(local_e)

    x_recv = jax.lax.all_to_all(x_send[: n * C], axis, 0, 0, tiled=True)
    e_recv = jax.lax.all_to_all(e_send[: n * C], axis, 0, 0, tiled=True)

    # ---- local expert compute over the received rows (k=1, weight=1)
    out_rows = experts_grouped(
        x_recv, e_recv[:, None], jnp.ones((n * C, 1), x.dtype), w1, w2,
    )

    # ---- return: rows sit exactly where the owner received them, so one
    # all-to-all restores them to the sender's buffer positions
    out_back = jax.lax.all_to_all(out_rows, axis, 0, 0, tiled=True)
    out_back = jnp.concatenate([out_back, jnp.zeros((1, D), out_back.dtype)])
    per_slot = out_back[send_row].reshape(T_loc, topk, D)  # dropped slots -> 0
    combined = jnp.einsum(
        "tkd,tk->td", per_slot.astype(jnp.float32), weights
    ).astype(x.dtype)
    return combined, z_loss, aux_loss


def experts_ep(
    x: Array,  # [T, D] (global)
    gate: Array,  # [E, D] fp32
    topk: int,
    w1: Array,  # [E, 2I, D]
    w2: Array,  # [E, I, D]
    mesh: Mesh,
    *,
    axis: str = "expert",
    capacity_factor: Optional[float] = None,
    z_loss_coeff: float = 0.0,
    aux_loss_coeff: float = 0.0,
    training: bool = False,
):
    """Expert-parallel MoE FFN. Returns (out [T, D], z_loss, aux_loss)."""
    n = mesh.shape[axis]
    T, D = x.shape
    E = gate.shape[0]
    if T % n or E % n:
        raise ValueError(f"tokens {T} and experts {E} must divide {axis}={n}")
    T_loc = T // n
    if capacity_factor is None:
        capacity = T_loc * topk  # exactly dropless
    else:
        capacity = max(1, int(T_loc * topk * capacity_factor / n))

    body = functools.partial(
        _ep_body, axis=axis, topk=topk, n=n, capacity=capacity,
        z_coeff=z_loss_coeff, aux_coeff=aux_loss_coeff, training=training,
    )
    # Quantized stacks are dicts; shard every leaf over its expert axis 0.
    w1_spec = jax.tree.map(lambda _: P(axis), w1)
    w2_spec = jax.tree.map(lambda _: P(axis), w2)
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis, None), P(None, None), w1_spec, w2_spec),
        out_specs=(P(axis, None), P(), P()),
        check_vma=False,
    )
    out, z_loss, aux_loss = fn(x, gate, w1, w2)
    return out, z_loss, aux_loss
