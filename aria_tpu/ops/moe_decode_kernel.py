"""Pallas decode-MoE kernel: fused expert-weight streaming for small token
counts.

The XLA decode path (``experts_gather``) materializes ``w1[indices]`` /
``w2[indices]`` into fresh HBM buffers before the einsum — ~3x the active
expert weight traffic. This kernel instead uses scalar-prefetched routing
indices inside BlockSpec index maps, so the pipeline DMAs each selected
expert's weight tiles HBM->VMEM directly and fuses the GLU + combine:

    out[t] = sum_s weights[t,s] * ( silu(x[t] @ w1g[e].T) * (x[t] @ w1u[e].T) ) @ w2[e]

Two dedup tricks keep HBM traffic at the *unique* active expert set:

- routing slots are sorted by expert id on device, and
- the grid iterates (ft-tile, slot) with the tile index MAJOR, so consecutive
  grid steps that map to the same (layer, expert, tile) block are served from
  the already-resident VMEM block (Pallas only re-DMAs when the index map
  output changes).

For batched decode (continuous batching, T lanes x top-k slots) this makes
shared experts across lanes free, unlike the reference's per-token gather.

Weights are passed as the FULL layer stack `[L, E, ...]` and indexed inside
the BlockSpecs: a pallas call is opaque to XLA, so a scan-sliced per-layer
weight operand would cost a full materialized copy per layer per step.
Per-expert traffic equals what the reference's CUDA grouped_gemm reads
(aria/model/moe_lm.py:431-484) — without its host sync. Layout is out-major
(w1 [L, E, 2I, D], gate rows then up rows; w2 [L, E, I, D]) so every tile is
a contiguous run of HBM rows. bf16 and int8 (per-output-channel scales)
variants.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CONTRACT_LAST = (((1,), (1,)), ((), ()))  # x[1,D] . w[ft,D] -> [1,ft]


def _sort_slots(indices: Array, weights: Array):
    """Sort routing slots by expert id. Returns (expert_by_slot [S],
    token_by_slot [S], weight_by_slot [S])."""
    T, k = indices.shape
    flat_e = indices.reshape(-1)
    order = jnp.argsort(flat_e)  # stability irrelevant: slots commute
    return (
        flat_e[order].astype(jnp.int32),
        (order // k).astype(jnp.int32),
        weights.reshape(-1)[order].astype(jnp.float32),
    )


def _body(x_ref, w1g, w1u, w2, out_ref, t, slot_w, sg=None, su=None, s2=None):
    x_all = x_ref[:]  # [T, D]
    T, D = x_all.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (T, D), 0)
    x = jnp.sum(jnp.where(row_ids == t, x_all, 0), axis=0, keepdims=True)  # [1, D]
    gate = jax.lax.dot_general(
        x, w1g.astype(x.dtype), _CONTRACT_LAST, preferred_element_type=jnp.float32
    )
    up = jax.lax.dot_general(
        x, w1u.astype(x.dtype), _CONTRACT_LAST, preferred_element_type=jnp.float32
    )
    if sg is not None:
        gate = gate * sg
        up = up * su
    h = (gate * jax.lax.logistic(gate)) * up  # silu(gate) * up, fp32
    partial = jnp.dot(
        h.astype(x.dtype), w2.astype(x.dtype), preferred_element_type=jnp.float32
    )  # [1, D]
    if s2 is not None:
        partial = partial * s2
    out_ref[:] += jnp.where(row_ids == t, slot_w * partial, 0.0)


def _kernel(meta_ref, wsort_ref, x_ref, w1g_ref, w1u_ref, w2_ref, out_ref):
    f = pl.program_id(0)
    s = pl.program_id(1)
    S = pl.num_programs(1)

    @pl.when(jnp.logical_and(f == 0, s == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    t = meta_ref[S + s]  # token_by_slot
    _body(x_ref, w1g_ref[0, 0], w1u_ref[0, 0], w2_ref[0, 0], out_ref, t, wsort_ref[s])


def _kernel_q(meta_ref, wsort_ref, x_ref, w1g_ref, w1u_ref, w2_ref, sg_ref, su_ref, s2_ref, out_ref):
    f = pl.program_id(0)
    s = pl.program_id(1)
    S = pl.num_programs(1)

    @pl.when(jnp.logical_and(f == 0, s == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    t = meta_ref[S + s]
    _body(
        x_ref, w1g_ref[0, 0], w1u_ref[0, 0], w2_ref[0, 0], out_ref, t, wsort_ref[s],
        sg=sg_ref[0, 0, 0:1, :], su=su_ref[0, 0, 0:1, :], s2=s2_ref[0, 0, 0:1, :],
    )


def _unpack4(p, dtype):
    """Unpack a [R, C] int8 ref slice holding paired nibbles (lo = first half
    of the span, hi = second; biased-lo layout, see quant.pack_int4): returns
    [R, 2C] dtype. Arithmetic runs in int32 — Mosaic cannot legalize shifts
    on int8 vectors."""
    b = p.astype(jnp.int32)
    lo = ((b & 0xF) - 8).astype(dtype)
    hi = (b >> 4).astype(dtype)
    return jnp.concatenate([lo, hi], axis=-1)


def _hi16(p, dtype):
    """16x the (signed) high nibble of each packed byte: one int8 mask, no
    widening, no shifts (B & 0xF0 == 16*hi in two's complement)."""
    return (p & jnp.int8(-16)).astype(dtype)


def _body_q4(x_ref, w1g_p, w1u_p, w2_p, sgg, sgu, s2, out_ref, t, slot_w,
             ng, gs):
    """int4 body with MXU-side unpacking.

    Biased-lo bytes (quant.pack_int4): B = 16*hi + (lo+8) exactly. With
    hi16 = B & 0xF0 (= 16*hi; one int8 mask, no shifts or widening):

        xa @ lo + xb @ hi
          =  xa @ B + (xb/16) @ hi16 - xa @ hi16 - 8*sum(xa)

    (xa pairs the lo column positions, xb the hi positions), evaluated as a
    single fused dot of [xa | xb/16 | -xa] against [B | hi16 | hi16]. Every
    operand is EXACT in bf16 (xb/16 is a power-of-2 rescale), so the only
    rounding is fp32 accumulation — matching the dequantize-then-matmul
    reference to ~1e-2 absolute at flagship scale. The kernel converts the
    RAW bytes to bf16 (one hardware convert) and the masked bytes (one mask
    + convert) — ~4x fewer VPU ops per byte than shifting out both nibbles,
    moving the unpack work onto the MXU where it's free. The per-nibble
    unpack made the kernel VPU-bound at ~109us/layer vs the 62us roofline.
    """
    x_all = x_ref[:]  # [T, D]
    T, D = x_all.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (T, D), 0)
    x = jnp.sum(jnp.where(row_ids == t, x_all, 0), axis=0, keepdims=True)  # [1, D]

    gsp = gs // 2
    gate = None
    up = None
    for g in range(ng):
        xa = jax.lax.slice_in_dim(x, g * gs, g * gs + gsp, axis=1)  # lo cols
        xb = jax.lax.slice_in_dim(x, g * gs + gsp, (g + 1) * gs, axis=1)
        xb16 = xb * jnp.asarray(1.0 / 16.0, x.dtype)  # exact power-of-2 scale
        xd = jnp.concatenate([xa, xb16, -xa], axis=1)  # one fused 3-part dot
        bias = 8.0 * jnp.sum(xa.astype(jnp.float32))  # the lo +8 storage bias
        pg = w1g_p[:, g * gsp : (g + 1) * gsp]
        pu = w1u_p[:, g * gsp : (g + 1) * gsp]
        hg = _hi16(pg, x.dtype)
        hu = _hi16(pu, x.dtype)
        wg = jnp.concatenate([pg.astype(x.dtype), hg, hg], axis=1)
        wu = jnp.concatenate([pu.astype(x.dtype), hu, hu], axis=1)
        dg = (
            jax.lax.dot_general(xd, wg, _CONTRACT_LAST,
                                preferred_element_type=jnp.float32)
            - bias
        ) * sgg[g : g + 1, :]
        du = (
            jax.lax.dot_general(xd, wu, _CONTRACT_LAST,
                                preferred_element_type=jnp.float32)
            - bias
        ) * sgu[g : g + 1, :]
        gate = dg if gate is None else gate + dg
        up = du if up is None else up + du
    h = (gate * jax.lax.logistic(gate)) * up  # [1, ft] fp32

    # w2 packs over the OUTPUT axis (col j pairs j+D/2): with o16 = h @ hi16,
    # out_hi = o16/16 and out_lo = h @ B - o16 - 8*sum(h).
    hb = h.astype(x.dtype)
    o_p = jnp.dot(hb, w2_p.astype(x.dtype), preferred_element_type=jnp.float32)
    o16 = jnp.dot(hb, _hi16(w2_p, x.dtype), preferred_element_type=jnp.float32)
    h_bias = 8.0 * jnp.sum(hb.astype(jnp.float32))
    partial = jnp.concatenate([o_p - o16 - h_bias, o16 * (1.0 / 16.0)], axis=-1)
    partial = partial * s2  # [1, D] * c/7
    out_ref[:] += jnp.where(row_ids == t, slot_w * partial, 0.0)


def _kernel_q4(ng, gs, meta_ref, wsort_ref, x_ref, w1g_ref, w1u_ref, w2_ref,
               sgg_ref, sgu_ref, s2_ref, out_ref):
    f = pl.program_id(0)
    s = pl.program_id(1)
    S = pl.num_programs(1)

    @pl.when(jnp.logical_and(f == 0, s == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    t = meta_ref[S + s]
    _body_q4(
        x_ref, w1g_ref[0, 0], w1u_ref[0, 0], w2_ref[0, 0],
        sgg_ref[0, 0], sgu_ref[0, 0], s2_ref[0, 0, 0:1, :], out_ref,
        t, wsort_ref[s], ng, gs,
    )


def _pack_meta(layer_idx, indices, weights):
    """int32 scalar-prefetch array [expert_by_slot | token_by_slot | layer_idx]
    plus the f32 sorted combine weights."""
    e_s, t_s, w_s = _sort_slots(indices, weights)
    meta = jnp.concatenate([e_s, t_s, jnp.atleast_1d(layer_idx).astype(jnp.int32)])
    return meta, w_s


def _specs(ft, nf, D, n_slots, quant):
    """Index maps: grid (f, slot); meta[slot] = expert, meta[-1] = layer."""

    L_IDX = 2 * n_slots  # meta[-1]

    def w1g(f, s, m, w):
        return (m[L_IDX], m[s], f, 0)

    def w1u(f, s, m, w):
        return (m[L_IDX], m[s], nf + f, 0)

    def w2(f, s, m, w):
        return (m[L_IDX], m[s], f, 0)

    specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # x [T, D], unblocked
        pl.BlockSpec((1, 1, ft, D), w1g, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ft, D), w1u, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ft, D), w2, memory_space=pltpu.VMEM),
    ]
    if quant:
        specs += [
            pl.BlockSpec((1, 1, 8, ft), lambda f, s, m, w: (m[L_IDX], m[s], 0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, ft), lambda f, s, m, w: (m[L_IDX], m[s], 0, nf + f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, D), lambda f, s, m, w: (m[L_IDX], m[s], 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    return specs


def _call(kernel, specs, grid, out_shape, interpret, meta, wsort, *arrays):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=specs,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            # single-tile ft (one grid step per routing slot) needs ~17MB of
            # unpack temporaries — raise the 16MB default scoped-vmem cap
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(meta, wsort, *arrays)


@functools.partial(jax.jit, static_argnames=("ft", "interpret"))
def moe_decode(
    x: Array,  # [T, D]
    indices: Array,  # [T, k] int32
    weights: Array,  # [T, k]
    w1: Array,  # [L, E, 2I, D] out-major (or [E, 2I, D])
    w2: Array,  # [L, E, I, D]
    layer_idx: Array = None,
    *,
    ft: int = 256,
    interpret: bool = False,
) -> Array:
    T, D = x.shape
    k = indices.shape[1]
    if w1.ndim == 3:
        w1, w2 = w1[None], w2[None]
        layer_idx = jnp.int32(0)
    L, E, I2, _ = w1.shape
    I = I2 // 2
    assert I % ft == 0, f"moe intermediate {I} must be divisible by tile {ft}"
    nf = I // ft
    n_slots = T * k

    meta, wsort = _pack_meta(layer_idx, indices, weights)
    out = _call(
        _kernel, _specs(ft, nf, D, n_slots, quant=False), (nf, n_slots),
        jax.ShapeDtypeStruct((T, D), jnp.float32), interpret,
        meta, wsort, x, w1, w1, w2,
    )
    return out.astype(x.dtype)


def _specs_q4(ft, nf, Dp, D, n_slots):
    """Index maps for the int4 kernel: packed weight blocks + scale blocks."""
    L_IDX = 2 * n_slots

    specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # x [T, D], unblocked
        pl.BlockSpec((1, 1, ft, Dp), lambda f, s, m, w: (m[L_IDX], m[s], f, 0),
                     memory_space=pltpu.VMEM),  # w1 gate rows, packed
        pl.BlockSpec((1, 1, ft, Dp), lambda f, s, m, w: (m[L_IDX], m[s], nf + f, 0),
                     memory_space=pltpu.VMEM),  # w1 up rows, packed
        pl.BlockSpec((1, 1, ft, Dp), lambda f, s, m, w: (m[L_IDX], m[s], f, 0),
                     memory_space=pltpu.VMEM),  # w2 rows, packed over D
        pl.BlockSpec((1, 1, 8, ft), lambda f, s, m, w: (m[L_IDX], m[s], 0, f),
                     memory_space=pltpu.VMEM),  # sg gate: rows = D-groups
        pl.BlockSpec((1, 1, 8, ft), lambda f, s, m, w: (m[L_IDX], m[s], 0, nf + f),
                     memory_space=pltpu.VMEM),  # sg up (r folded in)
        pl.BlockSpec((1, 1, 8, D), lambda f, s, m, w: (m[L_IDX], m[s], 0, 0),
                     memory_space=pltpu.VMEM),  # s2 = c/7
    ]
    return specs


@functools.partial(jax.jit, static_argnames=("ft", "interpret"))
def moe_decode_int4(
    x: Array,  # [T, D]
    indices: Array,  # [T, k] int32
    weights: Array,  # [T, k]
    w1q4: Array,  # int8 [L, E, 2I, D/2] within-group nibble pairs
    w1_sg: Array,  # f32 [L, E, 8, 2I] rows 0..ng-1 = D-group scales
    w2q4: Array,  # int8 [L, E, I, D/2] whole-row nibble pairs
    w2_s8: Array,  # f32 [L, E, 8, D] rank-1 column scale c/7
    layer_idx: Array,
    *,
    ft: int = 128,
    interpret: bool = False,
) -> Array:
    """int4 variant of moe_decode: streams packed nibbles HBM->VMEM and
    unpacks in-registers — HALF the decode HBM traffic of int8. This is what
    fits the full 25.3B/64-expert model in one v5e and still feeds the MXU."""
    from aria_tpu.ops.quant import int4_group_count

    T, D = x.shape
    k = indices.shape[1]
    L, E, I2, Dp = w1q4.shape
    I = I2 // 2
    assert I % ft == 0
    nf = I // ft
    ng = int4_group_count(D)
    gs = D // ng
    n_slots = T * k

    meta, wsort = _pack_meta(layer_idx, indices, weights)
    kernel = functools.partial(_kernel_q4, ng, gs)
    out = _call(
        kernel, _specs_q4(ft, nf, Dp, D, n_slots), (nf, n_slots),
        jax.ShapeDtypeStruct((T, D), jnp.float32), interpret,
        meta, wsort, x, w1q4, w1q4, w2q4, w1_sg, w1_sg, w2_s8,
    )
    return out.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("ft", "interpret"))
def moe_decode_quant(
    x: Array,
    indices: Array,
    weights: Array,
    w1q: Array,  # int8 [L, E, 2I, D]
    w1_s8: Array,  # f32 [L, E, 8, 2I]
    w2q: Array,  # int8 [L, E, I, D]
    w2_s8: Array,  # f32 [L, E, 8, D]
    layer_idx: Array,
    *,
    ft: int = 256,
    interpret: bool = False,
) -> Array:
    T, D = x.shape
    k = indices.shape[1]
    L, E, I2, _ = w1q.shape
    I = I2 // 2
    assert I % ft == 0
    nf = I // ft
    n_slots = T * k

    meta, wsort = _pack_meta(layer_idx, indices, weights)
    out = _call(
        _kernel_q, _specs(ft, nf, D, n_slots, quant=True), (nf, n_slots),
        jax.ShapeDtypeStruct((T, D), jnp.float32), interpret,
        meta, wsort, x, w1q, w1q, w2q, w1_s8, w1_s8, w2_s8,
    )
    return out.astype(x.dtype)
