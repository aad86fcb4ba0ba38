"""Packed-int4 dense matmul for the attention projections.

At flagship scale the decode step is HBM-bound and the full-model residency
budget is within ~300MB of the chip's executable limit; wqkv/wo in int4
(vs int8) both halves their per-token traffic (~0.37GB/token) and buys back
the HBM the vision tower needs. Same nibble layout as the expert stacks
(ops/quant.py): out-major [L, F, D/2] with within-group pairing over the
contraction axis D and per-(D-group, output-column) scales [L, 8, F].

One kernel serves decode (T<=32, row-padded to a sublane tile) and prefill
(row-tiled grid); the weight stack is indexed by a scalar-prefetched
layer_idx so it stays OUT of the layer scan (a scan-sliced pallas operand
would materialize a full copy per layer per step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aria_tpu.ops.quant import int4_group_count, pack_int4


def is_dense_int4(w) -> bool:
    return isinstance(w, dict) and "q4t" in w


def quantize_dense_int4(w: Array) -> dict:
    """[L, D_in, F_out] (right-multiply layout) -> {"q4t": int8 [L, F, D/2],
    "sg": bf16 [L, 8, F]} with groupwise scales over D."""
    wt = jnp.swapaxes(w, -1, -2)  # out-major [L, F, D]
    *lead, F, D = wt.shape
    ng = int4_group_count(D)
    gs = D // ng
    wf = wt.astype(jnp.float32).reshape(*lead, F, ng, gs)
    amax = jnp.max(jnp.abs(wf), axis=-1)  # [L, F, ng]
    sg = jnp.maximum(amax * (1.0 / 7.0), 1e-8)  # mul form: jit/eager bit-identical
    q = jnp.clip(jnp.round(wf / sg[..., None]), -8, 7).astype(jnp.int8)
    q = q.reshape(*lead, F, D)
    sg = jnp.swapaxes(sg, -1, -2)  # [L, ng, F]
    pad = [(0, 0)] * (sg.ndim - 2) + [(0, 8 - ng), (0, 0)]
    return {
        "q4t": pack_int4(q, gs),
        "sg": jnp.pad(sg, pad).astype(jnp.bfloat16),
    }


def dequantize_dense_int4(w: dict, dtype=jnp.bfloat16) -> Array:
    """Inverse transform back to [L, D, F] right-multiply layout."""
    from aria_tpu.ops.quant import unpack_int4

    q4t, sg = w["q4t"], w["sg"]
    *lead, F, Dp = q4t.shape
    D = 2 * Dp
    ng = int4_group_count(D)
    gs = D // ng
    vals = unpack_int4(q4t, gs, jnp.float32).reshape(*lead, F, ng, gs)
    s = jnp.swapaxes(sg[..., :ng, :], -1, -2).astype(jnp.float32)  # [L, F, ng]
    wt = (vals * s[..., None]).reshape(*lead, F, D)
    return jnp.swapaxes(wt, -1, -2).astype(dtype)


def _kernel(ng, gs, l_ref, x_ref, w_ref, sg_ref, out_ref):
    # MXU-side unpacking over biased-lo bytes (quant.pack_int4): with
    # hi16 = B & 0xF0 (one int8 mask),
    #   xa @ lo + xb @ hi = xa @ B + (xb/16 - xa) @ hi16 - 8*sum(xa)
    # — raw bytes feed the first dot; see moe_decode_kernel._body_q4.
    x = x_ref[:]  # [tm, D]
    gsp = gs // 2
    acc = None
    for g in range(ng):
        xa = jax.lax.slice_in_dim(x, g * gs, g * gs + gsp, axis=1)
        xb = jax.lax.slice_in_dim(x, g * gs + gsp, (g + 1) * gs, axis=1)
        xc = xb * jnp.asarray(1.0 / 16.0, x.dtype) - xa  # exact in bf16
        bias = 8.0 * jnp.sum(xa.astype(jnp.float32), axis=1, keepdims=True)
        pg = w_ref[0][:, g * gsp : (g + 1) * gsp]  # [tn, gsp] packed bytes
        hi16 = (pg & jnp.int8(-16)).astype(x.dtype)
        # two dots instead of one 3-part concat dot (no [tn, 3*gsp] temp)
        dn = (((1,), (1,)), ((), ()))
        d = (
            jax.lax.dot_general(xa, pg.astype(x.dtype), dn,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(xc, hi16, dn,
                                  preferred_element_type=jnp.float32)
            - bias
        )
        d = d * sg_ref[0][g : g + 1, :]  # [tm, tn] * [1, tn]
        acc = d if acc is None else acc + d
    out_ref[:] = acc.astype(out_ref.dtype)


def _kernel_a8(ng, gs, l_ref, xq_ref, sx_ref, w_ref, sg_ref, out_ref):
    # W4A8: int8 activations x raw packed bytes as INTEGER MXU dots (see
    # moe_decode_kernel._ffn_q4_a8) — one int8 mask per weight byte, no
    # converts; int32->f32 lands on the [tm, tn] dot outputs.
    xq = xq_ref[:]  # [tm, D] int8
    gsp = gs // 2
    i32 = jnp.int32
    dn = (((1,), (1,)), ((), ()))
    acc = None
    for g in range(ng):
        xa = jax.lax.slice_in_dim(xq, g * gs, g * gs + gsp, axis=1)
        xb = jax.lax.slice_in_dim(xq, g * gs + gsp, (g + 1) * gs, axis=1)
        bias = 8 * jnp.sum(xa.astype(i32), axis=1, keepdims=True)
        pg = w_ref[0][:, g * gsp : (g + 1) * gsp]  # [tn, gsp] packed bytes
        hg = pg & jnp.int8(-16)
        dot = functools.partial(
            jax.lax.dot_general, dimension_numbers=dn, preferred_element_type=i32
        )
        G = dot(xa, pg) - dot(xa, hg) - bias + (dot(xb, hg) >> 4)
        d = G.astype(jnp.float32) * sx_ref[:][:, g : g + 1] * sg_ref[0][g : g + 1, :]
        acc = d if acc is None else acc + d
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tn", "interpret", "act_int8", "out_dtype")
)
def dense_int4(
    x: Array,  # [T, D]
    w: dict,  # {"q4t": [L, F, D/2], "sg": [L, 8, F]}
    layer_idx: Array,
    *,
    tn: int = 256,
    interpret: bool = False,
    act_int8: bool = False,
    out_dtype=jnp.float32,
) -> Array:
    """x @ W[layer] over the packed stack. Returns [T, F] in ``out_dtype``.

    Accumulation is always f32 in-kernel; ``out_dtype=bf16`` just moves the
    callers' post-matmul downcast inside the kernel write, so a 32K-token
    prefill's qkv buffer is 480MB instead of 960MB + a convert copy (the
    one-shot long-context prefill was 189MB over HBM from exactly this)."""
    T, D = x.shape
    q4t, sg = w["q4t"], w["sg"]
    L, F, Dp = q4t.shape
    assert F % tn == 0, (F, tn)
    ng = int4_group_count(D)
    gs = D // ng

    tm = -(-T // 8) * 8  # sublane-pad the token rows
    if tm != T:
        x = jnp.pad(x, ((0, tm - T), (0, 0)))
    tm_blk = min(128, tm)
    assert tm % tm_blk == 0

    if act_int8:
        from aria_tpu.ops.moe_decode_kernel import act_quant_int8

        xq, sx = act_quant_int8(x, ng)
        kernel = functools.partial(_kernel_a8, ng, gs)
        in_specs = [
            pl.BlockSpec((tm_blk, D), lambda r, n, l: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm_blk, 8), lambda r, n, l: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, Dp), lambda r, n, l: (l[0], n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tn), lambda r, n, l: (l[0], 0, n),
                         memory_space=pltpu.VMEM),
        ]
        operands = (xq, sx, q4t, sg)
    else:
        kernel = functools.partial(_kernel, ng, gs)
        in_specs = [
            pl.BlockSpec((tm_blk, D), lambda r, n, l: (r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, Dp), lambda r, n, l: (l[0], n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, tn), lambda r, n, l: (l[0], 0, n),
                         memory_space=pltpu.VMEM),
        ]
        operands = (x, q4t, sg)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(tm // tm_blk, F // tn),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((tm_blk, tn), lambda r, n, l: (r, n),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((tm, F), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(jnp.atleast_1d(layer_idx).astype(jnp.int32), *operands)
    return out[:T]
