"""Context (sequence) parallelism for long-context attention.

The reference has NO sequence parallelism — its 64K context relies on
flash-attn memory behavior on one GPU (SURVEY.md §5). Here, DeepSpeed-Ulysses
style head-scatter attention: with the sequence sharded over the ``context``
mesh axis, two all-to-alls re-shard q/k/v from sequence-split to head-split,
run full-length (flash) attention on each device's head group, and shard back.
Collectives ride ICI via ``jax.lax.all_to_all`` inside ``shard_map``.

Requires num_heads % context_size == 0 and seq % context_size == 0.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from aria_tpu.ops.flash import flash_sdpa


def _ulysses_body(q, k, v, *, axis: str, causal: bool):
    # local shapes: [B, S/c, H, D]
    # -> [B, S, H/c, D]: gather sequence, scatter heads
    q = jax.lax.all_to_all(q, axis, split_axis=2, concat_axis=1, tiled=True)
    k = jax.lax.all_to_all(k, axis, split_axis=2, concat_axis=1, tiled=True)
    v = jax.lax.all_to_all(v, axis, split_axis=2, concat_axis=1, tiled=True)
    out = flash_sdpa(q, k, v, causal=causal)
    # back to [B, S/c, H, D]
    return jax.lax.all_to_all(out, axis, split_axis=1, concat_axis=2, tiled=True)


def ulysses_attention(
    q: Array,  # [B, S, H, D] (globally)
    k: Array,
    v: Array,
    mesh: Mesh,
    *,
    axis: str = "context",
    causal: bool = True,
) -> Array:
    """Sequence-parallel attention over ``mesh[axis]``. Inputs/outputs are
    sequence-sharded [B, S, H, D] global arrays."""
    c = mesh.shape[axis]
    B, S, H, D = q.shape
    if H % c or S % c:
        raise ValueError(f"heads {H} and seq {S} must divide context={c}")
    spec = P(None, axis, None, None)
    fn = shard_map(
        functools.partial(_ulysses_body, axis=axis, causal=causal),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)
