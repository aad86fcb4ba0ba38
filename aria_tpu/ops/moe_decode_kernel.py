"""Pallas decode-MoE kernel: fused expert-weight streaming for small token
counts.

The XLA decode path (``experts_gather``) materializes ``w1[indices]`` /
``w2[indices]`` into fresh HBM buffers before the einsum — ~3x the active
expert weight traffic. This kernel instead uses scalar-prefetched routing
indices inside BlockSpec index maps, so the pipeline DMAs each selected
expert's weight tiles HBM->VMEM directly and fuses the GLU + combine:

    out[t] = sum_s weights[t,s] * ( silu(x[t] @ w1g[e].T) * (x[t] @ w1u[e].T) ) @ w2[e]

The grid iterates the UNIQUE active expert set (jnp.unique with static size
U = min(T*k, E)), not routing slots: each expert's weights are DMA'd once
and its FFN computed once over ALL T tokens (extra rows are ~free — the MXU
absorbs them and the per-byte converts dominate), with contributions
combined through a dense [E, T] weight table block-indexed by expert id.
For batched decode (continuous batching, T lanes x top-k slots) both HBM
traffic and compute therefore scale with |active experts|, not T*k — shared
experts across lanes are free, unlike the reference's per-token gather.

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


def _unique_meta(indices: Array, weights: Array, layer_idx: Array, E: int):
    """Unique active experts (static size U = min(T*k, E)) + the dense
    [E, T, 128] combine table the kernels block-index by expert id.

    Returns (meta = [ids_clamped | valid | layer], wd, U)."""
    T, k = indices.shape
    U = min(T * k, E)
    flat_e = indices.reshape(-1).astype(jnp.int32)
    if T == 1:
        # top-k slots of one token are already distinct experts: skip the
        # unique-sort AND the dense scatter (both serialize with the kernels
        # 28x per decode step) — wd is indexed positionally by slot (the
        # kernels' wd BlockSpec uses `u`, not the expert id, when T == 1)
        ids_c = flat_e
        valid = jnp.ones((U,), jnp.int32)
        wdense = weights.reshape(U, 1).astype(jnp.float32)
        wd = jnp.broadcast_to(wdense[:, :, None], (U, T, 128))
    else:
        # compact the active-expert ids WITHOUT a sort: jnp.unique sorts all
        # T*k routing slots (a ~300us bitonic sort that repeats per layer per
        # step); a count-scatter over [E] + size-bounded nonzero gets the
        # same sorted unique list from an E-length cumsum
        cnt = jnp.zeros((E,), jnp.int32).at[flat_e].add(1)
        ids = jnp.nonzero(cnt, size=U, fill_value=E)[0].astype(jnp.int32)
        valid = (ids < E).astype(jnp.int32)
        ids_c = jnp.minimum(ids, E - 1)
        tok_ids = jnp.repeat(jnp.arange(T, dtype=jnp.int32), k)
        wdense = jnp.zeros((E, T), jnp.float32).at[flat_e, tok_ids].add(
            weights.reshape(-1).astype(jnp.float32)
        )
        wd = jnp.broadcast_to(wdense[:, :, None], (E, T, 128))
    meta = jnp.concatenate(
        [ids_c, valid, jnp.atleast_1d(layer_idx).astype(jnp.int32)]
    )
    return meta, jnp.asarray(wd), U


def _ffn(x, w1g, w1u, w2, sg=None, su=None, s2=None):
    """One expert's GLU FFN over ALL T tokens (bf16/int8 weights).
    Returns partial [T, D] f32."""
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
    )  # [T, D]
    if s2 is not None:
        partial = partial * s2
    return partial


def _kernel(meta_ref, x_ref, w1g_ref, w1u_ref, w2_ref, wd_ref, out_ref):
    f = pl.program_id(0)
    u = pl.program_id(1)
    U = pl.num_programs(1)

    @pl.when(jnp.logical_and(f == 0, u == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(meta_ref[U + u] == 1)
    def _():
        partial = _ffn(x_ref[:], w1g_ref[0, 0], w1u_ref[0, 0], w2_ref[0, 0])
        out_ref[:] += wd_ref[0][:, 0:1] * partial


def _kernel_q(meta_ref, x_ref, w1g_ref, w1u_ref, w2_ref, sg_ref, su_ref,
              s2_ref, wd_ref, out_ref):
    f = pl.program_id(0)
    u = pl.program_id(1)
    U = pl.num_programs(1)

    @pl.when(jnp.logical_and(f == 0, u == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(meta_ref[U + u] == 1)
    def _():
        partial = _ffn(
            x_ref[:], w1g_ref[0, 0], w1u_ref[0, 0], w2_ref[0, 0],
            sg=sg_ref[0, 0, 0:1, :], su=su_ref[0, 0, 0:1, :],
            s2=s2_ref[0, 0, 0:1, :],
        )
        out_ref[:] += wd_ref[0][:, 0:1] * partial


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


def _ffn_q4(x, w1g_p, w1u_p, w2_p, sgg, sgu, s2, ng, gs):
    """One expert's GLU FFN over ALL T tokens, int4 with MXU-side unpacking.

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

    Computing all T rows at once costs ~the same as one row (the per-byte
    converts dominate; the MXU absorbs extra rows), so batched decode pays
    per UNIQUE expert, not per routing slot. Returns partial [T, D] f32.
    """
    gsp = gs // 2
    gate = None
    up = None
    for g in range(ng):
        xa = jax.lax.slice_in_dim(x, g * gs, g * gs + gsp, axis=1)  # lo cols
        xb = jax.lax.slice_in_dim(x, g * gs + gsp, (g + 1) * gs, axis=1)
        # xc pairs the hi16 dot: xa @ lo + xb @ hi = xa @ B + xc @ hi16 - 8Σxa
        xc = xb * jnp.asarray(1.0 / 16.0, x.dtype) - xa  # both exact in bf16
        bias = 8.0 * jnp.sum(xa.astype(jnp.float32), axis=1, keepdims=True)
        pg = w1g_p[:, g * gsp : (g + 1) * gsp]
        pu = w1u_p[:, g * gsp : (g + 1) * gsp]
        dot = functools.partial(
            jax.lax.dot_general, dimension_numbers=_CONTRACT_LAST,
            preferred_element_type=jnp.float32,
        )
        # two dots per half instead of one 3-part concat dot: skips writing
        # the [ft, 3*gsp] concatenated weight temporary (pure VPU copy
        # traffic, 3 bf16 bytes per packed byte)
        dg = (
            dot(xa, pg.astype(x.dtype)) + dot(xc, _hi16(pg, x.dtype)) - bias
        ) * sgg[g : g + 1, :]
        du = (
            dot(xa, pu.astype(x.dtype)) + dot(xc, _hi16(pu, x.dtype)) - bias
        ) * sgu[g : g + 1, :]
        gate = dg if gate is None else gate + dg
        up = du if up is None else up + du
    h = (gate * jax.lax.logistic(gate)) * up  # [T, ft] fp32

    # w2 packs over the OUTPUT axis (col j pairs j+D/2): with o16 = h @ hi16,
    # out_hi = o16/16 and out_lo = h @ B - o16 - 8*sum(h).
    hb = h.astype(x.dtype)
    o_p = jnp.dot(hb, w2_p.astype(x.dtype), preferred_element_type=jnp.float32)
    o16 = jnp.dot(hb, _hi16(w2_p, x.dtype), preferred_element_type=jnp.float32)
    h_bias = 8.0 * jnp.sum(hb.astype(jnp.float32), axis=1, keepdims=True)
    partial = jnp.concatenate([o_p - o16 - h_bias, o16 * (1.0 / 16.0)], axis=-1)
    return partial * s2  # [T, D] * c/7


def act_quant_int8(x: Array, ng: int):
    """Per-(token, D-group) symmetric int8 activation quantization for the
    W4A8 kernel. Returns (xq int8 [T, D], sx f32 [T, 8] — cols 0..ng-1)."""
    T, D = x.shape
    gs = D // ng
    xg = x.astype(jnp.float32).reshape(T, ng, gs)
    amax = jnp.max(jnp.abs(xg), axis=-1)  # [T, ng]
    sx = jnp.maximum(amax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(xg / sx[..., None]), -127, 127)
    return xq.astype(jnp.int8).reshape(T, D), jnp.pad(sx, ((0, 0), (0, 8 - ng)))


def _ffn_q4_a8(xq, sx, w1g_p, w1u_p, w2_p, sgg, sgu, s2, ng, gs):
    """W4A8 GLU FFN: int8 activations x int4-packed weights as INTEGER MXU
    dots on the raw bytes — the only per-weight-byte VPU op is one int8 mask.

    Biased-lo bytes (quant.pack_int4): B = 16*hi + (lo+8) exactly, so with
    integer dots (int8 x int8 -> int32, native MXU):

        xa @ lo + xb @ hi = xa@B - xa@hi16 - 8*sum(xa) + (xb@hi16 >> 4)

    (hi16 = B & 0xF0 = 16*hi; xb@hi16 is a multiple of 16, the arithmetic
    shift is exact). The bf16 variant (_ffn_q4) converts every byte twice
    (B and hi16 -> bf16); at T lanes >= 8 those converts dominate the whole
    decode step. Here weights stay int8 end-to-end and the int32->f32
    convert happens on the [T, ft] dot OUTPUTS — ~24x fewer elements.
    Activation error: int8 per-(token, D-group) symmetric, ~0.1% rms on top
    of the int4 weight noise (tested vs the dequantized reference).
    Returns partial [T, D] f32."""
    gsp = gs // 2
    dn = _CONTRACT_LAST
    i32 = jnp.int32
    gate = None
    up = None
    for g in range(ng):
        xa = jax.lax.slice_in_dim(xq, g * gs, g * gs + gsp, axis=1)
        xb = jax.lax.slice_in_dim(xq, g * gs + gsp, (g + 1) * gs, axis=1)
        bias = 8 * jnp.sum(xa.astype(i32), axis=1, keepdims=True)  # [T, 1]
        pg = w1g_p[:, g * gsp : (g + 1) * gsp]
        pu = w1u_p[:, g * gsp : (g + 1) * gsp]
        hg = pg & jnp.int8(-16)
        hu = pu & jnp.int8(-16)
        dot = functools.partial(
            jax.lax.dot_general, dimension_numbers=dn,
            preferred_element_type=i32,
        )
        Gg = dot(xa, pg) - dot(xa, hg) - bias + (dot(xb, hg) >> 4)
        Gu = dot(xa, pu) - dot(xa, hu) - bias + (dot(xb, hu) >> 4)
        sxg = sx[:, g : g + 1]  # [T, 1] f32
        dg = Gg.astype(jnp.float32) * sxg * sgg[g : g + 1, :]
        du = Gu.astype(jnp.float32) * sxg * sgu[g : g + 1, :]
        gate = dg if gate is None else gate + dg
        up = du if up is None else up + du
    h = (gate * jax.lax.logistic(gate)) * up  # [T, ft] f32

    # re-quantize h per row for the down-projection's integer dots
    sh = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True) / 127.0, 1e-8)
    hq = jnp.clip(jnp.round(h / sh), -127, 127).astype(jnp.int8)
    dn2 = (((1,), (0,)), ((), ()))
    dot2 = functools.partial(
        jax.lax.dot_general, dimension_numbers=dn2, preferred_element_type=i32
    )
    o_p = dot2(hq, w2_p)  # [T, Dp]
    o16 = dot2(hq, w2_p & jnp.int8(-16))
    h_bias = 8 * jnp.sum(hq.astype(i32), axis=1, keepdims=True)
    partial = jnp.concatenate(
        [(o_p - o16 - h_bias).astype(jnp.float32),
         (o16 >> 4).astype(jnp.float32)],
        axis=-1,
    )
    return partial * sh * s2  # [T, D] * per-row * c/7


def _kernel_q4_a8(ng, gs, meta_ref, xq_ref, sx_ref, w1g_ref, w1u_ref, w2_ref,
                  sgg_ref, sgu_ref, s2_ref, wd_ref, out_ref):
    f = pl.program_id(0)
    u = pl.program_id(1)
    U = pl.num_programs(1)

    @pl.when(jnp.logical_and(f == 0, u == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(meta_ref[U + u] == 1)
    def _():
        partial = _ffn_q4_a8(
            xq_ref[:], sx_ref[:], w1g_ref[0, 0], w1u_ref[0, 0], w2_ref[0, 0],
            sgg_ref[0, 0], sgu_ref[0, 0], s2_ref[0, 0, 0:1, :], ng, gs,
        )
        out_ref[:] += wd_ref[0][:, 0:1] * partial


def _kernel_q4(ng, gs, meta_ref, x_ref, w1g_ref, w1u_ref, w2_ref,
               sgg_ref, sgu_ref, s2_ref, wd_ref, out_ref):
    """Grid (nf, U): one step per (intermediate tile, UNIQUE expert). The
    dense combine table wd [E, T, 128] is block-indexed by the expert id, so
    every token's contribution for this expert lands in one step."""
    f = pl.program_id(0)
    u = pl.program_id(1)
    U = pl.num_programs(1)

    @pl.when(jnp.logical_and(f == 0, u == 0))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    valid = meta_ref[U + u]

    @pl.when(valid == 1)
    def _():
        partial = _ffn_q4(
            x_ref[:], w1g_ref[0, 0], w1u_ref[0, 0], w2_ref[0, 0],
            sgg_ref[0, 0], sgu_ref[0, 0], s2_ref[0, 0, 0:1, :], ng, gs,
        )
        out_ref[:] += wd_ref[0][:, 0:1] * partial


def _specs(ft, nf, D, U, T, quant):
    """Index maps: grid (f, u); meta[u] = unique expert, meta[-1] = layer."""

    L_IDX = 2 * U  # meta[-1]

    def w1g(f, u, m):
        return (m[L_IDX], m[u], f, 0)

    def w1u(f, u, m):
        return (m[L_IDX], m[u], nf + f, 0)

    def w2(f, u, m):
        return (m[L_IDX], m[u], f, 0)

    specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # x [T, D], unblocked
        pl.BlockSpec((1, 1, ft, D), w1g, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ft, D), w1u, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, ft, D), w2, memory_space=pltpu.VMEM),
    ]
    if quant:
        specs += [
            pl.BlockSpec((1, 1, 8, ft), lambda f, u, m: (m[L_IDX], m[u], 0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, ft), lambda f, u, m: (m[L_IDX], m[u], 0, nf + f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, D), lambda f, u, m: (m[L_IDX], m[u], 0, 0),
                         memory_space=pltpu.VMEM),
        ]
    wd_map = (lambda f, u, m: (u, 0, 0)) if T == 1 else (lambda f, u, m: (m[u], 0, 0))
    specs.append(
        pl.BlockSpec((1, T, 128), wd_map, memory_space=pltpu.VMEM)  # combine w
    )
    return specs


def _call(kernel, specs, grid, out_shape, interpret, meta, *arrays):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
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
            # single-tile ft (one grid step per expert) needs ~17MB of
            # unpack temporaries — raise the 16MB default scoped-vmem cap
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(meta, *arrays)


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
    if w1.ndim == 3:
        w1, w2 = w1[None], w2[None]
        layer_idx = jnp.int32(0)
    L, E, I2, _ = w1.shape
    I = I2 // 2
    assert I % ft == 0, f"moe intermediate {I} must be divisible by tile {ft}"
    nf = I // ft

    meta, wd, U = _unique_meta(indices, weights, layer_idx, E)
    out = _call(
        _kernel, _specs(ft, nf, D, U, T, quant=False), (nf, U),
        jax.ShapeDtypeStruct((T, D), jnp.float32), interpret,
        meta, x, w1, w1, w2, wd,
    )
    return out.astype(x.dtype)


def _specs_q4(ft, nf, Dp, D, U, T, a8=False):
    """Index maps for the int4 kernel, grid (f, u): meta[u] = unique expert
    id (clamped), meta[U + u] = valid flag, meta[-1] = layer."""
    L_IDX = 2 * U

    specs = [
        pl.BlockSpec(memory_space=pltpu.VMEM),  # x [T, D], unblocked
    ]
    if a8:
        specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))  # sx [T, 8] f32
    specs += [
        pl.BlockSpec((1, 1, ft, Dp), lambda f, u, m: (m[L_IDX], m[u], f, 0),
                     memory_space=pltpu.VMEM),  # w1 gate rows, packed
        pl.BlockSpec((1, 1, ft, Dp), lambda f, u, m: (m[L_IDX], m[u], nf + f, 0),
                     memory_space=pltpu.VMEM),  # w1 up rows, packed
        pl.BlockSpec((1, 1, ft, Dp), lambda f, u, m: (m[L_IDX], m[u], f, 0),
                     memory_space=pltpu.VMEM),  # w2 rows, packed over D
        pl.BlockSpec((1, 1, 8, ft), lambda f, u, m: (m[L_IDX], m[u], 0, f),
                     memory_space=pltpu.VMEM),  # sg gate: rows = D-groups
        pl.BlockSpec((1, 1, 8, ft), lambda f, u, m: (m[L_IDX], m[u], 0, nf + f),
                     memory_space=pltpu.VMEM),  # sg up (r folded in)
        pl.BlockSpec((1, 1, 8, D), lambda f, u, m: (m[L_IDX], m[u], 0, 0),
                     memory_space=pltpu.VMEM),  # s2 = c/7
        pl.BlockSpec((1, T, 128),
                     (lambda f, u, m: (u, 0, 0)) if T == 1
                     else (lambda f, u, m: (m[u], 0, 0)),
                     memory_space=pltpu.VMEM),  # dense combine weights
    ]
    return specs


@functools.partial(jax.jit, static_argnames=("ft", "interpret", "act_int8"))
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
    act_int8: bool = False,  # W4A8: integer MXU dots, no per-byte converts
) -> Array:
    """int4 variant of moe_decode: streams packed nibbles HBM->VMEM and
    unpacks on the MXU — HALF the decode HBM traffic of int8. This is what
    fits the full 25.3B/64-expert model in one v5e and still feeds the MXU.

    The grid iterates UNIQUE active experts (jnp.unique with a static size),
    not routing slots: with continuous batching (T lanes x top-k slots) each
    expert's weights are fetched AND computed once for all its tokens — the
    per-slot design re-ran the FFN per (token, expert) pair, which made the
    batched server's MoE cost scale with T*k instead of |active experts|."""
    from aria_tpu.ops.quant import int4_group_count

    T, D = x.shape
    L, E, I2, Dp = w1q4.shape
    I = I2 // 2
    assert I % ft == 0
    nf = I // ft
    ng = int4_group_count(D)
    gs = D // ng

    meta, wd, U = _unique_meta(indices, weights, layer_idx, E)
    if act_int8:
        xq, sx = act_quant_int8(x, ng)
        kernel = functools.partial(_kernel_q4_a8, ng, gs)
        out = _call(
            kernel, _specs_q4(ft, nf, Dp, D, U, T, a8=True), (nf, U),
            jax.ShapeDtypeStruct((T, D), jnp.float32), interpret,
            meta, xq, sx, w1q4, w1q4, w2q4, w1_sg, w1_sg, w2_s8, wd,
        )
    else:
        kernel = functools.partial(_kernel_q4, ng, gs)
        out = _call(
            kernel, _specs_q4(ft, nf, Dp, D, U, T), (nf, U),
            jax.ShapeDtypeStruct((T, D), jnp.float32), interpret,
            meta, x, w1q4, w1q4, w2q4, w1_sg, w1_sg, w2_s8, wd,
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
    L, E, I2, _ = w1q.shape
    I = I2 // 2
    assert I % ft == 0
    nf = I // ft

    meta, wd, U = _unique_meta(indices, weights, layer_idx, E)
    out = _call(
        _kernel_q, _specs(ft, nf, D, U, T, quant=True), (nf, U),
        jax.ShapeDtypeStruct((T, D), jnp.float32), interpret,
        meta, x, w1q, w1q, w2q, w1_s8, w1_s8, w2_s8, wd,
    )
    return out.astype(x.dtype)
