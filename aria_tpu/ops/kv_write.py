"""Pallas in-place KV-cache write for the decode step.

The per-lane cache write (`cache.at[layer, b, :, pos[b], :].set(new)`) lowers
to an XLA scatter that issues one DMA per (lane, head) row — ~64 us for
32 lanes x 20 heads despite an 82KB payload, and it scales linearly with
lane count (~192 us at 96 lanes). Two such scatters (K and V) per layer per
step were ~3.6 ms of the 25 ms 32-lane decode step.

This kernel maps each lane's destination block straight through a
scalar-prefetched BlockSpec index map and aliases the cache in/out, so the
write is a pipelined block DMA per lane. Mosaic tiles the last two block
dims natively at (8, 128) for 32-bit, (16, 128) for 16-bit and (32, 128)
for 8-bit element types, so each lane's block spans that many cache
positions (S-extent `sb` at block index slot//sb); the kernel copies the
aliased input block and overwrites row slot%sb — an sb-x payload (still
only ~20-80KB/lane) instead of a serialized scatter.

Scale planes are NOT handled here: the per-(head, position) scale write
stays on the one-hot plane-select path (moe_lm.py), which touches only the
1.3MB scale plane and was already measured cheap.

Wired into both engines' decode steps (S == 1): row = lane,
slot = position for the contiguous engine (models/moe_lm.py per-lane cache
branch); row = page id, slot = in-page offset for the paged one
(engine/paged.py paged_write). Interpret-mode parity is covered by
tests/test_kernels.py; engine-level greedy bit-identity by
tests/test_server.py. The reference's equivalent is the `KVCache.update`
index assign (gptfast/model.py:76-93).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kvw_enabled() -> bool:
    """Kill switch read at trace time: ARIA_TPU_KVW=0 reverts both engines
    to the XLA scatter write (and gives tests an exact A/B of the write path
    with every other kernel choice held fixed)."""
    return os.environ.get("ARIA_TPU_KVW", "1") != "0"


def _sublanes(dtype) -> int:
    """Native Mosaic sublane tiling for the cache element type: blocks whose
    second-minor extent is not a multiple of this either fail to compile or
    fall into partial-tile handling that breaks the one-block-DMA design."""
    itemsize = jnp.dtype(dtype).itemsize
    tiling = {4: 8, 2: 16, 1: 32}
    if itemsize not in tiling:
        raise ValueError(f"unsupported KV-cache element size {itemsize} ({dtype})")
    return tiling[itemsize]


def _check_unique_blocks(rows, slots, sb):
    """Duplicate destination blocks with DIFFERENT slots are a lost-update
    hazard: each lane's where() is based on the stale aliased input, so the
    later lane silently erases the earlier one's write."""
    blocks = {}
    for r, s in zip(np.asarray(rows).tolist(), np.asarray(slots).tolist()):
        key = (r, s // sb)
        if key in blocks and blocks[key] != s:
            raise AssertionError(
                f"kv_cache_write: lanes map to the same cache block {key} with "
                f"different slots ({blocks[key]} vs {s}); the RMW would lose one "
                "write. Duplicates are only safe when (row, slot) is identical."
            )
        blocks[key] = s


def _kernel(sb, l_ref, rows_ref, slots_ref, kn_ref, vn_ref, k_in, v_in,
            k_out, v_out):
    del l_ref, rows_ref
    b = pl.program_id(0)
    r = slots_ref[b] % sb
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

    Returns (k_cache, v_cache) with lane b's row at
    (layer_idx, rows[b], :, slots[b], :) replaced. Duplicate (row, slot//sb)
    destination blocks across lanes must carry identical (row, slot) — the
    batched engines only produce duplicates for admission padding, which
    repeats a real lane verbatim, so the RMW blocks agree. Set
    ARIA_TPU_DEBUG_KVW=1 to verify that precondition on every call.
    """
    L, R, Hc, S, D = k_cache.shape
    B = k_new.shape[0]
    sb = _sublanes(k_cache.dtype)
    assert S % sb == 0, (S, sb, k_cache.dtype)

    if os.environ.get("ARIA_TPU_DEBUG_KVW") == "1":
        # sb must be bound statically: debug.callback would convert a
        # positional int into a traced array, poisoning the dict keys
        jax.debug.callback(
            functools.partial(_check_unique_blocks, sb=sb), rows, slots)

    cache_spec = pl.BlockSpec(
        (1, 1, Hc, sb, D),
        lambda b, l, r, s: (l[0], r[b], 0, s[b] // sb, 0),
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
        functools.partial(_kernel, sb),
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
