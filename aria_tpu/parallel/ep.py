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


def _local_expert_rows(x_recv, e_recv, w1, w2, layer_idx, n, C):
    """Compute expert outputs for the received rows on this device's local
    expert shard. With ``layer_idx`` the stacks are FULL ``[L, E/n, ...]``
    stacks and the Pallas decode kernels index (layer, expert) inside their
    BlockSpecs — only the routed tiles ever move (VERDICT r2 #6: kernels run
    per-shard inside shard_map instead of the XLA gather fallback). Without
    it, per-layer ``[E/n, ...]`` slices take the grouped-GEMM path."""
    from aria_tpu.ops.backend import kernel_interpret, use_pallas
    from aria_tpu.ops.moe import experts_grouped
    from aria_tpu.ops.quant import (
        dequantize_expert_weights,
        is_quantized,
        is_quantized_int4,
    )

    ones = jnp.ones((n * C, 1), jnp.float32)
    if layer_idx is not None and use_pallas():
        from aria_tpu.ops.moe_decode_kernel import (
            moe_decode,
            moe_decode_int4,
            moe_decode_quant,
        )

        if is_quantized_int4(w1):
            I2 = w1["q4"].shape[2]
        elif is_quantized(w1):
            I2 = w1["q"].shape[2]
        else:
            I2 = w1.shape[2]
        I = I2 // 2
        if I % 128 == 0 and I <= 2048:
            ft = I
        else:
            ft = next((f for f in (1024, 512, 256, 128) if I % f == 0), None)
        if ft is not None:
            e_idx = e_recv[:, None]
            if is_quantized_int4(w1):
                import os

                a8 = os.environ.get("ARIA_TPU_A8", "1") != "0"
                return moe_decode_int4(
                    x_recv, e_idx, ones, w1["q4"], w1["sg"], w2["q4"], w2["s8"],
                    layer_idx, ft=ft, act_int8=a8, interpret=kernel_interpret(),
                ).astype(x_recv.dtype)
            if is_quantized(w1):
                return moe_decode_quant(
                    x_recv, e_idx, ones, w1["q"], w1["s8"], w2["q"], w2["s8"],
                    layer_idx, ft=ft, interpret=kernel_interpret(),
                ).astype(x_recv.dtype)
            return moe_decode(
                x_recv, e_idx, ones, w1, w2, layer_idx, ft=ft,
                interpret=kernel_interpret(),
            ).astype(x_recv.dtype)
    if layer_idx is not None:
        _sl = lambda a: jax.lax.dynamic_index_in_dim(a, layer_idx, 0, keepdims=False)
        w1 = jax.tree.map(_sl, w1)
        w2 = jax.tree.map(_sl, w2)
    w1, w2 = dequantize_expert_weights(w1, w2, dtype=x_recv.dtype)
    return experts_grouped(x_recv, e_recv[:, None], ones.astype(x_recv.dtype), w1, w2)


def _ep_body(x, gate, w1, w2, *, axis, topk, n, capacity,
             z_coeff, aux_coeff, training, layer_idx=None, E_loc=None):
    """Per-device body. x [T_loc, D]; w1 [E/n, 2I, D]; w2 [E/n, I, D]
    (or full [L, E/n, ...] stacks when ``layer_idx`` is given).

    Quantized stacks (int8 ``{"q", "s"}`` / int4 ``{"q4", ...}`` dicts, see
    ops/quant.py) arrive as per-leaf expert-axis shards and are computed
    device-locally — each owner touches only its own E/n experts, so the
    all-to-all pattern (and the no-stack-gather property) is identical to the
    bf16 path."""
    T_loc, D = x.shape
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
    out_rows = _local_expert_rows(x_recv, e_recv, w1, w2, layer_idx, n, C)

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
    layer_idx: Optional[Array] = None,  # w1/w2 are FULL [L, E, ...] stacks
):
    """Expert-parallel MoE FFN. Returns (out [T, D], z_loss, aux_loss).

    With ``layer_idx``, ``w1``/``w2`` are the full layer-stacked weights
    (never sliced on the host side): each shard's Pallas decode kernel
    indexes (layer, expert) in its BlockSpecs, so per-layer expert-stack
    copies never materialize — the serving-mesh analogue of the single-chip
    decode path."""
    if layer_idx is not None and training:
        raise ValueError("full-stack EP (layer_idx) is a serving path")
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
        E_loc=E // n,
    )
    # Quantized stacks are dicts; shard every leaf over its expert axis
    # (axis 0 per-layer, axis 1 for full [L, E, ...] stacks).
    e_axis = P(axis) if layer_idx is None else P(None, axis)
    w1_spec = jax.tree.map(lambda _: e_axis, w1)
    w2_spec = jax.tree.map(lambda _: e_axis, w2)
    in_specs = [P(axis, None), P(None, None), w1_spec, w2_spec]
    args = [x, gate, w1, w2]
    if layer_idx is not None:
        # traced operand, replicated (never a shard_map closure capture)
        def body(x, gate, w1, w2, l_idx, _b=body):
            return _b(x, gate, w1, w2, layer_idx=l_idx)

        in_specs.append(P())
        args.append(jnp.asarray(layer_idx, jnp.int32))
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(axis, None), P(), P()),
        check_vma=False,
    )
    out, z_loss, aux_loss = fn(*args)
    return out, z_loss, aux_loss
