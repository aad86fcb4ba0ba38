"""Context parallelism over the KV *cache* (serving path).

`context.py` (Ulysses) and `ring.py` shard uncached causal attention for
training and from-zero prefill. This module covers the CACHED path — the
64K-context serving scenario (reference README.md:13 advertises 64K; its
implementation is single-GPU flash over the whole window) where one chip's
HBM cannot hold the KV cache: the stacked ``[L, B, H, Smax, D]`` cache is
sharded over the ``context`` mesh axis on its position dimension, and

- **decode** (S=1): each device runs the single-chip Pallas decode kernel
  (`ops/decode_attention.py`) over its local position block in
  ``return_stats`` mode, and the partial ``(acc, m, s)`` online-softmax
  states are merged exactly with a pmax/psum pair — the static-shard
  analogue of ring attention's rotating merge, in one hop.
- **prefill** (S>1): each device computes blockwise attention of the
  (replicated) query chunk against its local cache block and the same
  merge combines the partials. Peak logits memory per device drops from
  ``S x Smax`` to ``S x Smax/c``.

Heads may simultaneously shard over ``model`` (TP): attention is
head-parallel, so the two axes compose with no extra communication.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

_NEG = -1e30


def _axis_size(mesh: Mesh, name: str) -> int:
    return mesh.shape[name] if name in mesh.axis_names else 1


def mesh_decode_attention(
    q: Array,  # [B, H, D] current token's queries
    cache,  # KVCache: k/v [L, B, Hk, Smax, D] (+ scales), sharded over mesh
    layer_idx: Array,
    lengths: Array,  # [B] int32
    mesh: Mesh,
    *,
    tp_axis: str = "model",
    cp_axis: str = "context",
) -> Array:
    """Decode attention under a serving mesh: the Pallas kernel runs on each
    device's local (head-shard x position-block) of the cache inside
    shard_map. Returns [B, H, D].

    With a >1 ``context`` axis the per-device kernels run in
    ``return_stats`` mode and the unnormalized ``(acc, m, s)`` partials are
    merged across position blocks (exact online-softmax merge; fully-masked
    blocks contribute corr=0). With context==1 this degenerates to the pure
    head-parallel (or fully replicated) single-kernel body."""
    from aria_tpu.ops.backend import kernel_interpret
    from aria_tpu.ops.decode_attention import decode_attention

    cp_n = _axis_size(mesh, cp_axis)
    quantized = cache.quantized

    # int4 head-pair packing cannot shard over heads (the kernel unpacks
    # pairs (h, h+H/2) from one byte plane) — positions-only parallelism.
    h_ax = None if cache.packed4 else tp_axis
    h_spec = P(None, h_ax, None)  # q / out [B, H, D]
    kv_spec = P(None, None, h_ax, cp_axis, None)
    sc_spec = P(None, None, h_ax, cp_axis)

    def body(q_l, k_l, v_l, ks_l, vs_l, len_g, l_idx):
        S_loc = k_l.shape[3]
        if cp_n == 1:
            return decode_attention(
                q_l, k_l, v_l, l_idx, len_g,
                k_scale=ks_l, v_scale=vs_l, interpret=kernel_interpret(),
            )
        # local lengths: this block covers global positions
        # [idx*S_loc, (idx+1)*S_loc)
        idx = jax.lax.axis_index(cp_axis)
        len_loc = jnp.clip(len_g - idx * S_loc, 0, S_loc)
        acc, m, s = decode_attention(
            q_l, k_l, v_l, l_idx, len_loc,
            k_scale=ks_l, v_scale=vs_l, interpret=kernel_interpret(),
            return_stats=True,
        )
        # exact merge: empty blocks have m = -1e30 (finite sentinel) with
        # garbage-but-finite acc/s, eliminated by corr = exp(m - m_g) = 0
        m_g = jax.lax.pmax(m, cp_axis)  # [B, H]
        corr = jnp.exp(m - m_g)
        s_g = jax.lax.psum(s * corr, cp_axis)
        acc_g = jax.lax.psum(acc * corr[..., None], cp_axis)
        return (acc_g / jnp.maximum(s_g, 1e-30)[..., None]).astype(q_l.dtype)

    if quantized:
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(h_spec, kv_spec, kv_spec, sc_spec, sc_spec, P(None), P()),
            out_specs=h_spec, check_vma=False,
        )
        return fn(q, cache.k, cache.v, cache.k_scale, cache.v_scale,
                  lengths, jnp.asarray(layer_idx, jnp.int32))
    fn = shard_map(
        lambda q_l, k_l, v_l, len_g, l_idx: body(q_l, k_l, v_l, None, None, len_g, l_idx),
        mesh=mesh,
        in_specs=(h_spec, kv_spec, kv_spec, P(None), P()),
        out_specs=h_spec, check_vma=False,
    )
    return fn(q, cache.k, cache.v, lengths, jnp.asarray(layer_idx, jnp.int32))


def _dequant_plane(k_l, v_l, ks_l, vs_l, l_idx, packed4: bool):
    """Slice this layer's local cache plane and dequantize (mirrors the
    single-device _plane fallback in models/moe_lm.py)."""
    plane = lambda a: jax.lax.dynamic_index_in_dim(a, l_idx, 0, keepdims=False)
    k_att, v_att = plane(k_l), plane(v_l)
    if ks_l is not None:
        if packed4:
            def unpack_heads(p):  # [B, H/2, S, D] -> [B, H, S, D]
                b32 = p.astype(jnp.int32)  # biased-lo bytes (pack_heads)
                lo = ((b32 & 0xF) - 8).astype(jnp.float32)
                hi = (b32 >> 4).astype(jnp.float32)
                return jnp.concatenate([lo, hi], axis=1)

            k_att, v_att = unpack_heads(k_att), unpack_heads(v_att)
        else:
            k_att = k_att.astype(jnp.float32)
            v_att = v_att.astype(jnp.float32)
        k_att = k_att * plane(ks_l)[..., None]
        v_att = v_att * plane(vs_l)[..., None]
    return k_att, v_att


def cp_cached_prefill_attention(
    q: Array,  # [B, S, H, D] query chunk (replicated)
    cache,  # KVCache post-scatter, positions sharded over `cp_axis`
    layer_idx: Array,
    mask: Array,  # broadcastable to [B, H, S, Smax]; True = attend
    mesh: Mesh,
    *,
    tp_axis: str = "model",
    cp_axis: str = "context",
) -> Array:
    """Blockwise cached-prefill attention with the KV prefix sharded over
    the ``context`` axis: each device attends the full query chunk against
    its local position block; partials merge with one pmax + two psums.
    Returns [B, S, H, D]."""
    B, S, H, D = q.shape
    scale = D ** -0.5
    quantized = cache.quantized
    packed4 = cache.packed4
    cp_n = _axis_size(mesh, cp_axis)
    Smax = cache.k.shape[3]
    assert Smax % cp_n == 0

    # mask comes in broadcastable; materialize the kv axis so it shards
    mask = jnp.broadcast_to(mask, mask.shape[:-1] + (Smax,))

    # int4 head-pair packing (h, h+H/2 share a byte plane) cannot shard over
    # heads — replicate the head axis everywhere and parallelize over
    # positions only.
    h_ax = None if packed4 else tp_axis
    h_spec = P(None, None, h_ax, None)  # q/out [B, S, H, D]
    kv_spec = P(None, None, h_ax, cp_axis, None)
    sc_spec = P(None, None, h_ax, cp_axis)
    m_spec = P(*([None] * (mask.ndim - 1)), cp_axis)

    def body(q_l, k_l, v_l, ks_l, vs_l, mask_l, l_idx):
        k_att, v_att = _dequant_plane(k_l, v_l, ks_l, vs_l, l_idx, packed4)
        # [B, Hl, S, S_loc]
        logits = jnp.einsum(
            "bshd,bhkd->bhsk", q_l.astype(jnp.float32) * scale,
            k_att.astype(jnp.float32),
        )
        logits = jnp.where(mask_l, logits, _NEG)
        m_loc = jnp.max(logits, axis=-1)  # [B, Hl, S]
        if cp_n > 1:
            m_g = jax.lax.pmax(m_loc, cp_axis)
        else:
            m_g = m_loc
        p = jnp.exp(logits - m_g[..., None])
        p = jnp.where(mask_l, p, 0.0)
        s_loc = jnp.sum(p, axis=-1)
        acc = jnp.einsum("bhsk,bhkd->bhsd", p, v_att.astype(jnp.float32))
        if cp_n > 1:
            s_g = jax.lax.psum(s_loc, cp_axis)
            acc_g = jax.lax.psum(acc, cp_axis)
        else:
            s_g, acc_g = s_loc, acc
        out = acc_g / jnp.maximum(s_g, 1e-30)[..., None]
        return out.transpose(0, 2, 1, 3).astype(q_l.dtype)

    if quantized:
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(h_spec, kv_spec, kv_spec, sc_spec, sc_spec, m_spec, P()),
            out_specs=h_spec, check_vma=False,
        )
        return fn(q, cache.k, cache.v, cache.k_scale, cache.v_scale,
                  mask, jnp.asarray(layer_idx, jnp.int32))
    fn = shard_map(
        lambda q_l, k_l, v_l, mask_l, l_idx: body(
            q_l, k_l, v_l, None, None, mask_l, l_idx),
        mesh=mesh,
        in_specs=(h_spec, kv_spec, kv_spec, m_spec, P()),
        out_specs=h_spec, check_vma=False,
    )
    return fn(q, cache.k, cache.v, mask, jnp.asarray(layer_idx, jnp.int32))
