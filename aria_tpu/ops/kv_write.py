"""Pallas in-place KV-cache write for the decode step.

The per-lane cache write (`cache.at[layer, b, :, pos[b], :].set(new)`) lowers
to an XLA scatter that issues one DMA per (lane, head) row — ~64 us for
32 lanes x 20 heads despite an 82KB payload, and it scales linearly with
lane count (~192 us at 96 lanes). Two such scatters (K and V) per layer per
step were ~3.6 ms of the 25 ms 32-lane decode step.

This kernel maps each lane's destination block straight through a
scalar-prefetched BlockSpec index map and aliases the cache in/out, so the
write is a pipelined block DMA per lane. Mosaic requires the last two block
dims to tile (8, 128), so each lane's block spans 8 cache positions
(S-extent 8 at block index slot//8); the kernel copies the aliased input
block and overwrites row slot%8 — an 8x payload (still only ~20KB/lane)
instead of a serialized scatter.

Scale planes are NOT handled here: the per-(head, position) scale write
stays on the one-hot plane-select path (moe_lm.py), which touches only the
1.3MB scale plane and was already measured cheap.

Used by both the contiguous engine (row = lane, slot = position) and the
paged engine (row = page id, slot = in-page offset). Replaces the
reference's `KVCache.update` index assign (gptfast/model.py:76-93) on the
batched-serving path.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SB = 8  # S-extent of each block (Mosaic sublane tiling)


def _kernel(l_ref, rows_ref, slots_ref, kn_ref, vn_ref, k_in, v_in,
            k_out, v_out):
    del l_ref, rows_ref
    b = pl.program_id(0)
    r = slots_ref[b] % _SB
    # dynamic sublane stores are unsupported — select row r of the block
    sel = jax.lax.broadcasted_iota(jnp.int32, k_in.shape[2:], 1) == r
    k_out[0, 0] = jnp.where(sel, kn_ref[0][:, None, :], k_in[0, 0])
    v_out[0, 0] = jnp.where(sel, vn_ref[0][:, None, :], v_in[0, 0])


@functools.partial(jax.jit, static_argnames=("interpret",), donate_argnums=(0, 1))
def kv_cache_write(
    k_cache: Array,  # [L, R, Hc, S, D] (bf16 / int8 / packed-int4 rows)
    v_cache: Array,
    layer_idx: Array,  # scalar int32
    rows: Array,  # [B] int32 destination row per lane (lane id or page id)
    slots: Array,  # [B] int32 destination position within the row
    k_new: Array,  # [B, Hc, D] fresh keys (already quantized/packed)
    v_new: Array,
    *,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Write one fresh position per lane into the stacked cache, in place.

    Returns (k_cache, v_cache) with lane b's block at
    (layer_idx, rows[b], :, slots[b], :) replaced. Duplicate (row, slot//8)
    pairs across lanes must carry identical payloads (the batched engines
    only produce duplicates for admission padding, which repeats a real
    lane — identical row AND slot, so the RMW blocks agree)."""
    L, R, Hc, S, D = k_cache.shape
    B = k_new.shape[0]
    assert S % _SB == 0

    cache_spec = pl.BlockSpec(
        (1, 1, Hc, _SB, D),
        lambda b, l, r, s: (l[0], r[b], 0, s[b] // _SB, 0),
        memory_space=pltpu.VMEM,
    )
    new_spec = pl.BlockSpec((1, Hc, D), lambda b, l, r, s: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[new_spec, new_spec, cache_spec, cache_spec],
        out_specs=[cache_spec, cache_spec],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        input_output_aliases={5: 0, 6: 1},
        interpret=interpret,
    )(jnp.atleast_1d(layer_idx).astype(jnp.int32),
      rows.astype(jnp.int32), slots.astype(jnp.int32),
      k_new, v_new, k_cache, v_cache)
