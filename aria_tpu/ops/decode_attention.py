"""Pallas decode attention over the stacked KV cache.

Single-token attention for the decode loop that reads each layer's cache
plane straight out of the stacked ``[L, B, H, S, D]`` buffers via a
scalar-prefetched layer index — no dynamic-slice materialization of cache
planes (the XLA path costs a full-plane copy per layer per step).

Online-softmax accumulation over S blocks, with per-lane lengths masking
(kv position < length). This is the TPU replacement for the reference's
per-step SDPA over the static cache (gptfast/model.py:434-443).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attend_block(len_ref, q_ref, k_blk, v_blk, out_ref, m_ref, s_ref, acc_ref,
                  b, s, n_s, k_sc=None, v_sc=None, stats_refs=None):
    q = q_ref[0]  # [H, D] (pre-scaled)
    H, BS, D = k_blk.shape

    # Per-head 2D dots (Mosaic cannot lower batched 3D dot_general): each
    # q[h] . k[h].T runs on the MXU. The VPU multiply-reduce alternative is
    # compute-bound at long context.
    compute_t = q.dtype if k_sc is None else jnp.bfloat16
    scores_rows = [
        jax.lax.dot_general(
            q[h : h + 1], k_blk[h].astype(compute_t), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for h in range(H)
    ]
    scores = jnp.concatenate(scores_rows, axis=0)  # [H, BS]
    if k_sc is not None:  # int8 cache: per-(head, position) scales
        scores = scores * k_sc
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (H, BS), 1) + s * BS
    scores = jnp.where(kv_idx < len_ref[b], scores, NEG_INF)

    m_prev = m_ref[:, 0:1]  # [H, 1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new)  # [H, BS]
    s_new = s_ref[:, 0:1] * corr + jnp.sum(p, axis=1, keepdims=True)
    p_v = (p * v_sc if v_sc is not None else p).astype(compute_t)
    pv_rows = [
        jnp.dot(p_v[h : h + 1], v_blk[h].astype(compute_t),
                preferred_element_type=jnp.float32)
        for h in range(H)
    ]
    pv = jnp.concatenate(pv_rows, axis=0)  # [H, D]
    acc_ref[:] = acc_ref[:] * corr + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    s_ref[:] = jnp.broadcast_to(s_new, s_ref.shape)

    @pl.when(s == n_s - 1)
    def _():
        if stats_refs is None:
            out_ref[0] = (acc_ref[:] / s_ref[:, 0:1]).astype(out_ref.dtype)
        else:
            # stats mode (attend-over-OLD-cache): return the UNNORMALIZED
            # accumulator plus (m, s) so the caller can online-softmax-merge
            # the fresh token's term. Fully-masked lanes leave finite garbage
            # in acc/s (NEG_INF is a finite sentinel) — the merge's
            # corr = exp(m - m2) = 0 eliminates it, with no 0/0 or NaN.
            m_out, s_out = stats_refs
            out_ref[0] = acc_ref[:].astype(out_ref.dtype)
            m_out[0] = m_ref[:]
            s_out[0] = s_ref[:]


def _attend_block_p4(len_ref, q_ref, kp, vp, out_ref, m_ref, s_ref, acc_ref,
                     b, s, n_s, k_sc, v_sc, stats_refs=None):
    """Packed-int4 (head-pair, BIASED-LO bytes — moe_lm pack_heads) block:
    unpack ON THE MXU. With hi16 = B & 0xF0 (one int8 mask, no shifts):

        lo = B - hi16 - 8        hi = hi16 / 16     (both exact in bf16)

    so the lo-head's scores are q_lo@B - q_lo@hi16 - 8*sum(q_lo) and the
    hi-head's are (q_hi@hi16)/16 — the two hi16 products ride ONE 2-row dot
    per pair, streaming each byte block through the MXU exactly as often as
    the shift-unpack version's dots did. The per-byte VPU work drops from
    two int32 widening shifts + concat copies to one mask + two bf16
    converts; at 32K context the shift unpack alone was ~half the kernel's
    time (the DMA floor is ~102us/layer, the kernel ran at ~46% of it).
    Same trick as ops/moe_decode_kernel._ffn_q4 (and the prefill kernels)."""
    q = q_ref[0]  # [H, D] bf16, pre-scaled
    Hp, BS, D = kp.shape
    H = 2 * Hp
    cdt = jnp.bfloat16
    dn_kT = (((1,), (1,)), ((), ()))   # [r, D] . [BS, D]^T -> [r, BS]
    dn_v = (((1,), (0,)), ((), ()))    # [r, BS] . [BS, D] -> [r, D]
    dot = functools.partial(jax.lax.dot_general,
                            preferred_element_type=jnp.float32)

    lo_rows, hi_rows = [], []
    for p in range(Hp):
        Bk = kp[p]  # [BS, D] raw bytes
        Bf = Bk.astype(cdt)
        h16 = (Bk & jnp.int8(-16)).astype(cdt)
        q2 = jnp.concatenate([q[p : p + 1], q[p + Hp : p + Hp + 1]], axis=0)
        d16 = dot(q2, h16, dimension_numbers=dn_kT)  # [2, BS]
        dB = dot(q[p : p + 1], Bf, dimension_numbers=dn_kT)  # [1, BS]
        qs = 8.0 * jnp.sum(q[p : p + 1].astype(jnp.float32), axis=1,
                           keepdims=True)
        lo_rows.append(dB - d16[0:1] - qs)
        hi_rows.append(d16[1:2] * (1.0 / 16.0))
    scores = jnp.concatenate(lo_rows + hi_rows, axis=0) * k_sc  # [H, BS]
    kv_idx = jax.lax.broadcasted_iota(jnp.int32, (H, BS), 1) + s * BS
    scores = jnp.where(kv_idx < len_ref[b], scores, NEG_INF)

    m_prev = m_ref[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    prob = jnp.exp(scores - m_new)
    s_new = s_ref[:, 0:1] * corr + jnp.sum(prob, axis=1, keepdims=True)
    pw = (prob * v_sc).astype(cdt)  # value-scaled probabilities [H, BS]
    lo_pv, hi_pv = [], []
    for p in range(Hp):
        Bv = vp[p]
        Bf = Bv.astype(cdt)
        h16 = (Bv & jnp.int8(-16)).astype(cdt)
        p2 = jnp.concatenate([pw[p : p + 1], pw[p + Hp : p + Hp + 1]], axis=0)
        d16 = dot(p2, h16, dimension_numbers=dn_v)  # [2, D]
        dB = dot(pw[p : p + 1], Bf, dimension_numbers=dn_v)  # [1, D]
        ps = 8.0 * jnp.sum(pw[p : p + 1].astype(jnp.float32), axis=1,
                           keepdims=True)
        lo_pv.append(dB - d16[0:1] - ps)
        hi_pv.append(d16[1:2] * (1.0 / 16.0))
    pv = jnp.concatenate(lo_pv + hi_pv, axis=0)  # [H, D] f32
    acc_ref[:] = acc_ref[:] * corr + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    s_ref[:] = jnp.broadcast_to(s_new, s_ref.shape)

    @pl.when(s == n_s - 1)
    def _():
        if stats_refs is None:
            out_ref[0] = (acc_ref[:] / s_ref[:, 0:1]).astype(out_ref.dtype)
        else:
            m_out, s_out = stats_refs
            out_ref[0] = acc_ref[:].astype(out_ref.dtype)
            m_out[0] = m_ref[:]
            s_out[0] = s_ref[:]


def _make_kernel(quant: bool, packed: bool, stats: bool):
    """One builder for bf16/int8/int4 caches, with or without stats outputs.

    int4 (packed): head-pair-packed biased-lo cache, unpacked on the MXU
    inside _attend_block_p4 (never materialized as [H, bs, D] values)."""

    def kernel(l_ref, len_ref, q_ref, k_ref, v_ref, *rest):
        if quant:
            ks_ref, vs_ref, *rest = rest
            k_sc, v_sc = ks_ref[0, 0], vs_ref[0, 0]
        else:
            k_sc = v_sc = None
        if stats:
            out_ref, m_out, s_out, m_ref, s_ref, acc_ref = rest
            stats_refs = (m_out, s_out)
        else:
            out_ref, m_ref, s_ref, acc_ref = rest
            stats_refs = None
        b = pl.program_id(0)
        s = pl.program_id(1)
        n_s = pl.num_programs(1)

        @pl.when(s == 0)
        def _():
            m_ref[:] = jnp.full_like(m_ref, NEG_INF)
            s_ref[:] = jnp.zeros_like(s_ref)
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # Skip blocks entirely past this lane's length: their KV BlockSpec
        # index maps clamp to the last in-range block (Pallas skips the DMA
        # when consecutive steps map to the same block), and this guard
        # skips the compute. The LAST grid step always runs so the finalize
        # inside the attend helpers fires; its scores are fully masked when
        # past length (p = exp(NEG_INF - m) = 0), so it adds nothing. Decode
        # cost therefore scales with the tokens actually cached, not the
        # allocated S (an Engine at max_seq 33K streams ~0 extra for a
        # 2K-token conversation).
        bs_k = k_ref.shape[3]

        @pl.when(jnp.logical_or(s * bs_k < len_ref[b], s == n_s - 1))
        def _():
            if packed:
                _attend_block_p4(len_ref, q_ref, k_ref[0, 0], v_ref[0, 0],
                                 out_ref, m_ref, s_ref, acc_ref, b, s, n_s,
                                 k_sc, v_sc, stats_refs=stats_refs)
            else:
                _attend_block(len_ref, q_ref, k_ref[0, 0], v_ref[0, 0],
                              out_ref, m_ref, s_ref, acc_ref, b, s, n_s,
                              k_sc=k_sc, v_sc=v_sc, stats_refs=stats_refs)

    return kernel


@functools.partial(jax.jit, static_argnames=("block_s", "interpret", "return_stats"))
def decode_attention(
    q: Array,  # [B, H, D] current token's queries (unscaled)
    k_cache: Array,  # [L, B, H, S, D] (bf16 or int8)
    v_cache: Array,  # [L, B, H, S, D]
    layer_idx: Array,  # scalar int32
    lengths: Array,  # [B] int32: attend to kv positions < length
    k_scale: Array = None,  # f32 [L, B, H, S] when the cache is int8
    v_scale: Array = None,
    *,
    block_s: int = 512,
    interpret: bool = False,
    return_stats: bool = False,
) -> Array:
    """Returns [B, H, D] attention outputs. With ``return_stats``, returns
    (acc [B, H, D] f32 UNNORMALIZED, m [B, H] f32 running max, s [B, H] f32
    softmax denominator) so the caller can online-softmax-merge extra terms
    (e.g. the fresh token's K/V, letting the cache write stay in-place with
    no in-step consumer).

    MHA only: the kernel sizes its KV BlockSpecs with H from q, so GQA
    (num_kv_heads < num_heads) configs must use the sdpa fallback — asserted
    explicitly rather than failing as a Mosaic shape error. (The flagship
    Aria shape is 20/20 MHA, gptfast/model.py:56-59.)"""
    B, H, D = q.shape
    L, _, H_kv, S, _ = k_cache.shape
    quantized = k_scale is not None
    packed4 = quantized and k_scale.shape[2] == 2 * H_kv
    if packed4:
        H_kv *= 2
    assert H_kv == H, (
        f"decode_attention kernel requires num_kv_heads == num_heads "
        f"(got {H_kv} != {H}); use the sdpa fallback for GQA"
    )
    bs = next((b for b in (block_s, 512, 256, 128) if S % b == 0), None)
    assert bs is not None, f"cache length {S} must be divisible by 128"
    bs = min(bs, S)
    n_s = S // bs

    scale = 1.0 / (D**0.5)
    q = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16 if quantized else q.dtype)

    def _clamp_s(s, ln, b):
        # Blocks past this lane's length map to the last in-range block:
        # consecutive grid steps with an unchanged index skip the DMA, and
        # the kernel's pl.when skips their compute — so the streamed KV
        # volume tracks the ACTUAL context length, not the allocation S.
        last = jnp.maximum((ln[b] + bs - 1) // bs - 1, 0)
        return jnp.minimum(s, last)

    kv_spec = pl.BlockSpec(
        (1, 1, H // 2 if packed4 else H, bs, D),
        lambda b, s, l, ln: (l[0], b, 0, _clamp_s(s, ln, b), 0),
        memory_space=pltpu.VMEM,
    )
    sc_spec = pl.BlockSpec(
        (1, 1, H, bs), lambda b, s, l, ln: (l[0], b, 0, _clamp_s(s, ln, b)),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec((1, H, D), lambda b, s, l, ln: (b, 0, 0), memory_space=pltpu.VMEM),
        kv_spec, kv_spec,
    ]
    arrays = [q, k_cache, v_cache]
    if quantized:
        in_specs += [sc_spec, sc_spec]
        arrays += [k_scale, v_scale]
    kernel = _make_kernel(quantized, packed4, return_stats)

    out_spec = pl.BlockSpec((1, H, D), lambda b, s, l, ln: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    if return_stats:
        stat_spec = pl.BlockSpec((1, H, 128), lambda b, s, l, ln: (b, 0, 0),
                                 memory_space=pltpu.VMEM)
        out_specs = (out_spec, stat_spec, stat_spec)
        out_shape = (
            jax.ShapeDtypeStruct((B, H, D), jnp.float32),  # unnormalized acc
            jax.ShapeDtypeStruct((B, H, 128), jnp.float32),  # m (col 0)
            jax.ShapeDtypeStruct((B, H, 128), jnp.float32),  # s (col 0)
        )
    else:
        out_specs = out_spec
        out_shape = jax.ShapeDtypeStruct(
            (B, H, D), jnp.bfloat16 if quantized else q.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_s),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((H, 128), jnp.float32),  # running max (col 0 used)
            pltpu.VMEM((H, 128), jnp.float32),  # running denom
            pltpu.VMEM((H, D), jnp.float32),  # output accumulator
        ],
    )

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(jnp.atleast_1d(layer_idx).astype(jnp.int32), lengths.astype(jnp.int32),
      *arrays)
    if return_stats:
        acc, m, s = out
        return acc, m[:, :, 0], s[:, :, 0]
    return out
