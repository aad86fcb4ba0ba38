"""Pallas decode-MoE kernel: fused expert-weight streaming for small token
counts.

The XLA decode path (``experts_gather``) materializes ``w1[indices]`` /
``w2[indices]`` into fresh HBM buffers before the einsum — ~3x the active
expert weight traffic. This kernel instead uses scalar-prefetched routing
indices inside BlockSpec index maps, so the pipeline DMAs each selected
expert's weight tiles HBM->VMEM exactly once and fuses the GLU + combine:

    out[t] = sum_s weights[t,s] * ( silu(x[t] @ w1g[e].T) * (x[t] @ w1u[e].T) ) @ w2[e]

with e = indices[t, s]. Per token, HBM traffic = top-k experts' weights, the
same active set the reference's CUDA grouped_gemm reads
(aria/model/moe_lm.py:431-484) — without its host sync.

Weight layout is out-major so every weight tile is a contiguous run of HBM
rows (long DMA bursts): w1 [E, 2I, D] (gate rows then up rows), w2 [E, I, D].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CONTRACT_LAST = (((1,), (1,)), ((), ()))  # x[1,D] . w[ft,D] -> [1,ft]


def _kernel(l_ref, idx_ref, x_ref, w_ref, w1g_ref, w1u_ref, w2_ref, out_ref):
    t = pl.program_id(0)
    s = pl.program_id(1)
    f = pl.program_id(2)

    # x/out are unblocked [T, D] buffers (T is small and not tile-aligned);
    # Mosaic requires 8-aligned sublane slicing, so row t is selected and
    # accumulated via an iota mask instead of a dynamic slice.
    @pl.when(jnp.logical_and(t == 0, jnp.logical_and(s == 0, f == 0)))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x_all = x_ref[:]  # [T, D]
    T, D = x_all.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (T, D), 0)
    x = jnp.sum(jnp.where(row_ids == t, x_all, 0), axis=0, keepdims=True)  # [1, D]
    gate = jax.lax.dot_general(
        x, w1g_ref[0, 0], _CONTRACT_LAST, preferred_element_type=jnp.float32
    )  # [1, FT]
    up = jax.lax.dot_general(
        x, w1u_ref[0, 0], _CONTRACT_LAST, preferred_element_type=jnp.float32
    )
    h = (gate * jax.lax.logistic(gate)) * up  # silu(gate) * up, fp32
    partial = jnp.dot(
        h.astype(x.dtype), w2_ref[0, 0], preferred_element_type=jnp.float32
    )  # [1, D]
    out_ref[:] += jnp.where(row_ids == t, w_ref[t, s] * partial, 0.0)


def _kernel_q(l_ref, idx_ref, x_ref, w_ref, w1g_ref, w1u_ref, w2_ref,
              sg_ref, su_ref, s2_ref, out_ref):
    """int8 variant: weight tiles are int8; per-output-channel scales arrive
    as [8, ft] broadcast tiles (row 0 used)."""
    t = pl.program_id(0)
    s = pl.program_id(1)
    f = pl.program_id(2)

    @pl.when(jnp.logical_and(t == 0, jnp.logical_and(s == 0, f == 0)))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    x_all = x_ref[:]  # [T, D]
    T, D = x_all.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (T, D), 0)
    x = jnp.sum(jnp.where(row_ids == t, x_all, 0), axis=0, keepdims=True)  # [1, D]
    gate = jax.lax.dot_general(
        x, w1g_ref[0, 0].astype(x.dtype), _CONTRACT_LAST,
        preferred_element_type=jnp.float32,
    ) * sg_ref[0, 0, 0:1, :]
    up = jax.lax.dot_general(
        x, w1u_ref[0, 0].astype(x.dtype), _CONTRACT_LAST,
        preferred_element_type=jnp.float32,
    ) * su_ref[0, 0, 0:1, :]
    h = (gate * jax.lax.logistic(gate)) * up
    partial = jnp.dot(
        h.astype(x.dtype), w2_ref[0, 0].astype(x.dtype),
        preferred_element_type=jnp.float32,
    ) * s2_ref[0, 0, 0:1, :]
    out_ref[:] += jnp.where(row_ids == t, w_ref[t, s] * partial, 0.0)


@functools.partial(jax.jit, static_argnames=("ft", "interpret"))
def moe_decode_quant(
    x: Array,  # [T, D]
    indices: Array,  # [T, k] int32
    weights: Array,  # [T, k]
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

    idx_flat = indices.reshape(-1).astype(jnp.int32)
    l_arr = jnp.atleast_1d(layer_idx).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T, k, nf),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x [T, D]
            pl.BlockSpec(memory_space=pltpu.SMEM),  # weights [T, k]
            pl.BlockSpec((1, 1, ft, D), lambda t, s, f, l, idx: (l[0], idx[t * k + s], f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ft, D), lambda t, s, f, l, idx: (l[0], idx[t * k + s], nf + f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ft, D), lambda t, s, f, l, idx: (l[0], idx[t * k + s], f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, ft), lambda t, s, f, l, idx: (l[0], idx[t * k + s], 0, f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, ft), lambda t, s, f, l, idx: (l[0], idx[t * k + s], 0, nf + f),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, D), lambda t, s, f, l, idx: (l[0], idx[t * k + s], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        _kernel_q,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * k * D * I * 3,
            bytes_accessed=T * k * 3 * D * I,
            transcendentals=T * k * I,
        ),
        interpret=interpret,
    )(l_arr, idx_flat, x, weights.astype(jnp.float32).reshape(T, k),
      w1q, w1q, w2q, w1_s8, w1_s8, w2_s8)

    return out.astype(x.dtype)


@functools.partial(jax.jit, static_argnames=("ft", "interpret"))
def moe_decode(
    x: Array,  # [T, D]
    indices: Array,  # [T, k] int32
    weights: Array,  # [T, k] fp32/bf16
    w1: Array,  # [L, E, 2I, D] out-major, FULL layer stack
    w2: Array,  # [L, E, I, D]
    layer_idx: Array = None,  # scalar int32 into the leading L axis
    *,
    ft: int = 256,
    interpret: bool = False,
) -> Array:
    """Weights are passed as the FULL layer stack and indexed inside the
    BlockSpec index maps: a pallas call is opaque to XLA, so handing it a
    scan-sliced per-layer weight would materialize a full copy of that
    layer's experts every call. Indexing (layer, expert) in the index map
    makes the pipeline DMA only the needed tiles."""
    T, D = x.shape
    k = indices.shape[1]
    if w1.ndim == 3:  # single-layer convenience form
        w1, w2 = w1[None], w2[None]
        layer_idx = jnp.int32(0)
    L, E, I2, _ = w1.shape
    I = I2 // 2
    assert I % ft == 0, f"moe intermediate {I} must be divisible by tile {ft}"
    nf = I // ft

    idx_flat = indices.reshape(-1).astype(jnp.int32)
    l_arr = jnp.atleast_1d(layer_idx).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T, k, nf),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x [T, D], unblocked
            pl.BlockSpec(memory_space=pltpu.SMEM),  # weights [T, k], unblocked
            # gate rows: w1[l, e, f*ft:(f+1)*ft, :]
            pl.BlockSpec(
                (1, 1, ft, D), lambda t, s, f, l, idx: (l[0], idx[t * k + s], f, 0),
                memory_space=pltpu.VMEM,
            ),
            # up rows: w1[l, e, I + f*ft : I + (f+1)*ft, :]
            pl.BlockSpec(
                (1, 1, ft, D), lambda t, s, f, l, idx: (l[0], idx[t * k + s], nf + f, 0),
                memory_space=pltpu.VMEM,
            ),
            # w2 rows: w2[l, e, f*ft:(f+1)*ft, :]
            pl.BlockSpec(
                (1, 1, ft, D), lambda t, s, f, l, idx: (l[0], idx[t * k + s], f, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),  # out [T, D], unblocked
    )

    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * T * k * D * I * 3,
            bytes_accessed=T * k * (2 * D * I + I * D) * w1.dtype.itemsize,
            transcendentals=T * k * I,
        ),
        interpret=interpret,
    )(l_arr, idx_flat, x, weights.astype(jnp.float32).reshape(T, k), w1, w1, w2)

    return out.astype(x.dtype)
