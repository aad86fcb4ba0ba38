"""Pallas grouped-GEMM MoE kernels for prefill over packed int4 experts.

The TPU-native replacement for the reference's CUDA ``grouped_gemm``
(aria/model/moe_lm.py:431-484) on the quantized serving path: the full
25.3B/64-expert model only exists on a 16GB chip as packed int4
(ops/quant.py), and prefill must consume the packed nibbles DIRECTLY —
dequantizing a layer's expert stack to bf16 (~1.3GB) would blow HBM next to
the resident model and triple the weight traffic.

Design — padded-segment grouped matmul:

- Routing slots are sorted by expert and scattered into per-expert segments
  padded to the 128-row MXU tile, so every row-tile belongs to EXACTLY one
  expert; a scalar-prefetched ``tile_expert`` array drives the weight
  BlockSpec index maps (no megablox-style boundary masking in the inner
  loop). Pad rows are zeros whose outputs are never gathered back.
- Two kernels pipeline HBM->VMEM streaming of the packed weights:
  K1 computes ``h = silu(x @ w1g^T) * (x @ w1u^T)`` with per-(D-group,
  output-row) scales (ng sub-dots over lane-aligned group slices); K2
  accumulates ``out = (h @ w2) * c`` over intermediate tiles with the rank-1
  column scale applied once at the end (the row factor already rides w1u's
  scales — see ops/quant.py).
- Weight traffic per row-tile is one packed expert (~4MB int4 vs ~17MB bf16):
  at prefill the kernel reads the active experts' nibbles once per 128 tokens.

Compute overhead vs an ideal ragged kernel is the segment padding
(<= E*127 extra rows); at the flagship shape that is ~4ms of MXU time per
prefill — accepted for a static grid with zero host syncs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aria_tpu.ops.quant import int4_group_count

TM = 128  # row tile: one MXU pass per (row-tile, out-tile)


def _hi16(p, dtype):
    """16x the (signed) high nibble of each packed byte (B & 0xF0 == 16*hi
    in two's complement): one int8 mask, no shifts or widening."""
    return (p & jnp.int8(-16)).astype(dtype)


def _k1_glu(ng, gs, te_ref, x_ref, w1g_ref, w1u_ref, sgg_ref, sgu_ref, h_ref):
    """h[r-tile, f-tile] = silu(x@w1g^T) * (x@w1u^T), groupwise int4 scales.

    MXU-side unpack over biased-lo bytes (quant.pack_int4), same identity as
    the decode kernel (moe_decode_kernel._ffn_q4):
        xa @ lo + xb @ hi = xa @ B + (xb/16 - xa) @ hi16 - 8*sum(xa)
    — two plain dots per half; the per-byte work is ONE convert (B) plus one
    mask+convert (hi16) instead of the 6-op widen/shift/concat unpack."""
    x = x_ref[:]  # [TM, D]
    gsp = gs // 2
    gate = None
    up = None
    dims = (((1,), (1,)), ((), ()))
    for g in range(ng):
        xa = jax.lax.slice_in_dim(x, g * gs, g * gs + gsp, axis=1)
        xb = jax.lax.slice_in_dim(x, g * gs + gsp, (g + 1) * gs, axis=1)
        xc = xb * jnp.asarray(1.0 / 16.0, x.dtype) - xa  # both exact in bf16
        bias = 8.0 * jnp.sum(xa.astype(jnp.float32), axis=1, keepdims=True)
        pg = w1g_ref[0, 0][:, g * gsp : (g + 1) * gsp]  # [ftn, gsp] bytes
        pu = w1u_ref[0, 0][:, g * gsp : (g + 1) * gsp]
        dg = (
            jax.lax.dot_general(xa, pg.astype(x.dtype), dims,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(xc, _hi16(pg, x.dtype), dims,
                                  preferred_element_type=jnp.float32)
            - bias
        ) * sgg_ref[0, 0][g : g + 1, :]  # [TM, ftn] * [1, ftn]
        du = (
            jax.lax.dot_general(xa, pu.astype(x.dtype), dims,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(xc, _hi16(pu, x.dtype), dims,
                                  preferred_element_type=jnp.float32)
            - bias
        ) * sgu_ref[0, 0][g : g + 1, :]
        gate = dg if gate is None else gate + dg
        up = du if up is None else up + du
    h_ref[:] = ((gate * jax.lax.logistic(gate)) * up).astype(h_ref.dtype)


def _k2_down(te_ref, h_ref, w2_ref, s2_ref, out_ref):
    """out[r-tile] = (sum_f h[:, f-tile] @ w2[f-tile]) * c, accumulated over
    the f grid axis; finalized with the rank-1 column scale.

    w2 packs over the OUTPUT axis (col j pairs j+D/2): with o16 = h @ hi16,
    out_hi = o16/16 and out_lo = h @ B - o16 - 8*sum(h) — both halves from
    two plain dots on the raw bytes (see moe_decode_kernel._ffn_q4)."""
    f = pl.program_id(1)
    nf = pl.num_programs(1)

    @pl.when(f == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    h = h_ref[:]  # [TM, ft]
    p = w2_ref[0, 0]  # [ft, Dp] packed bytes
    o_p = jnp.dot(h, p.astype(h.dtype), preferred_element_type=jnp.float32)
    o16 = jnp.dot(h, _hi16(p, h.dtype), preferred_element_type=jnp.float32)
    h_bias = 8.0 * jnp.sum(h.astype(jnp.float32), axis=1, keepdims=True)
    out_ref[:] += jnp.concatenate(
        [o_p - o16 - h_bias, o16 * (1.0 / 16.0)], axis=-1
    )

    @pl.when(f == nf - 1)
    def _():
        out_ref[:] = out_ref[:] * s2_ref[0, 0][0:1, :]


@functools.partial(jax.jit, static_argnames=("ft", "interpret"))
def moe_prefill_int4(
    x_seg: Array,  # [R, D] tokens scattered into padded expert segments
    tile_expert: Array,  # [R // TM] int32 expert id per row tile
    w1q4: Array,  # int8 [L, E, 2I, D/2]
    w1_sg: Array,  # f32 [L, E, 8, 2I]
    w2q4: Array,  # int8 [L, E, I, D/2]
    w2_s8: Array,  # f32 [L, E, 8, D]
    layer_idx: Array,
    *,
    ft: int = 128,
    interpret: bool = False,
) -> Array:
    """Segmented grouped GLU-FFN over packed int4 experts. Returns [R, D] f32."""
    R, D = x_seg.shape
    L, E, I2, Dp = w1q4.shape
    I = I2 // 2
    assert R % TM == 0 and I % ft == 0, (R, I, ft)
    nr, nf = R // TM, I // ft
    ng = int4_group_count(D)
    gs = D // ng

    meta = jnp.concatenate(
        [tile_expert.astype(jnp.int32), jnp.atleast_1d(layer_idx).astype(jnp.int32)]
    )
    L_IDX = nr  # meta[-1]

    h = pl.pallas_call(
        functools.partial(_k1_glu, ng, gs),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nr, nf),
            in_specs=[
                pl.BlockSpec((TM, D), lambda r, f, m: (r, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ft, Dp), lambda r, f, m: (m[L_IDX], m[r], f, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ft, Dp), lambda r, f, m: (m[L_IDX], m[r], nf + f, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, ft), lambda r, f, m: (m[L_IDX], m[r], 0, f),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, ft), lambda r, f, m: (m[L_IDX], m[r], 0, nf + f),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, ft), lambda r, f, m: (r, f),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((R, I), x_seg.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(meta, x_seg, w1q4, w1q4, w1_sg, w1_sg)

    out = pl.pallas_call(
        _k2_down,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nr, nf),
            in_specs=[
                pl.BlockSpec((TM, ft), lambda r, f, m: (r, f), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, ft, Dp), lambda r, f, m: (m[L_IDX], m[r], f, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8, D), lambda r, f, m: (m[L_IDX], m[r], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TM, D), lambda r, f, m: (r, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((R, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(meta, h, w2q4, w2_s8)
    return out


def segment_dispatch(indices: Array, num_experts: int):
    """Compute the padded-segment scatter for sorted-by-expert dispatch.

    Returns (dest_row [T*k], tile_expert [R//TM], R): slot i goes to row
    ``dest_row[i]`` of the [R, D] segment buffer; every TM-row tile belongs
    to exactly one expert."""
    T, k = indices.shape
    flat_e = indices.reshape(-1)
    counts = jnp.zeros((num_experts,), jnp.int32).at[flat_e].add(1)
    padded = -(-counts // TM) * TM
    pstarts = jnp.cumsum(padded) - padded  # exclusive cumsum [E]

    order = jnp.argsort(flat_e, stable=True)
    sorted_e = flat_e[order]
    # rank of each slot within its expert = position in sorted order minus
    # the expert's start in that order (exclusive cumsum of counts)
    sorted_starts = jnp.cumsum(counts) - counts
    seq = jnp.arange(T * k, dtype=jnp.int32)
    ranks = seq - sorted_starts[sorted_e]
    dest_sorted = pstarts[sorted_e] + ranks
    dest_row = jnp.zeros((T * k,), jnp.int32).at[order].set(dest_sorted)

    R = -(-(T * k + num_experts * (TM - 1)) // TM) * TM  # static worst case
    tile_starts = jnp.arange(R // TM, dtype=jnp.int32) * TM
    tile_expert = jnp.clip(
        jnp.searchsorted(pstarts, tile_starts, side="right") - 1,
        0, num_experts - 1,
    ).astype(jnp.int32)
    return dest_row, tile_expert, R


def experts_segmented_int4(
    x: Array,  # [T, D]
    indices: Array,  # [T, k] int32
    weights: Array,  # [T, k]
    w1q4: Array,
    w1_sg: Array,
    w2q4: Array,
    w2_s8: Array,
    layer_idx: Array,
    *,
    ft: int = 128,
    interpret: bool = False,
) -> Array:
    """Full MoE FFN over packed int4 experts for prefill-sized token counts."""
    T, D = x.shape
    k = indices.shape[1]
    E = w1q4.shape[1]

    dest_row, tile_expert, R = segment_dispatch(indices, E)
    x_seg = jnp.zeros((R, D), x.dtype).at[dest_row].set(x[jnp.arange(T * k) // k])

    out_seg = moe_prefill_int4(
        x_seg, tile_expert, w1q4, w1_sg, w2q4, w2_s8, layer_idx,
        ft=ft, interpret=interpret,
    )
    per_slot = out_seg[dest_row].reshape(T, k, D)
    combined = jnp.einsum("tkd,tk->td", per_slot, weights.astype(jnp.float32))
    return combined.astype(x.dtype)
