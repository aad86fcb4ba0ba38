"""Pipeline parallelism: GPipe microbatch schedule over the ``pipe`` mesh axis.

The reference has no pipeline parallelism — its closest analogue is HF
`device_map="auto"` layer placement for inference (aria/inference.py:56,
`_no_split_modules=["MoEDecoderLayer"]` moe_lm.py:652), which runs stages
*serially*. This is the real thing, TPU-style: the [L]-stacked decoder params
shard their leading axis over ``pipe`` (each device owns L/p contiguous
layers), microbatch activations flow stage-to-stage via `jax.lax.ppermute`
(neighbor ICI hops), and every device runs the same compiled program — the
schedule is data, not control flow.

Schedule: M microbatches, p stages, M + p - 1 ticks. At tick t, stage s
computes microbatch (t - s) when 0 <= t - s < M; bubble ticks compute garbage
that is masked out of the loss and output. Pipeline efficiency is
M / (M + p - 1).

Aux-loss note: z-loss is a per-token mean, so averaging per-microbatch values
is exact; the switch load-balancing loss couples tokens (mean-prob x counts),
so its microbatch average differs from the full-batch value by O(1/M) routing
covariance — the standard GPipe approximation. With M=1 both are exact.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def pipeline_layers(
    x: Array,  # [B, S, D] activations after embedding (global)
    xs: object,  # pytree of [L, ...]-stacked per-layer scan inputs
    w1_full, w2_full,  # expert stacks [L, E, ...] (arrays or quantized dicts)
    consts: object,  # pytree of replicated per-step constants (rope, mask, ...)
    stage_fn: Callable,  # (h, xs_loc, w1_loc, w2_loc, consts) -> (h, z, aux)
    mesh: Mesh,
    *,
    axis: str = "pipe",
    batch_axes=("data", "fsdp"),
    num_microbatches: Optional[int] = None,
) -> tuple[Array, Array, Array]:
    """Run the decoder layer stack under pipeline parallelism.

    ``stage_fn`` applies a device-local stack of L/p layers (an inner
    `lax.scan`) to one microbatch; it must index layer-stacked structures with
    LOCAL layer ids (all [L]-leading inputs arrive pipe-sharded). Arrays the
    stage needs but that are not layer-stacked (RoPE tables, masks) must come
    through ``consts`` — closure captures would carry Auto-mesh shardings
    into the Manual shard_map context.

    Returns (x_out [B, S, D] global, z_loss, aux_loss).
    """
    p = mesh.shape[axis]
    B, S, D = x.shape
    dp = 1
    for a in batch_axes:
        dp *= mesh.shape[a]
    B_loc = B // dp
    M = num_microbatches or (p if B_loc % p == 0 else 1)
    if B_loc % M:
        raise ValueError(f"local batch {B_loc} must divide microbatches {M}")

    def _body(x_loc, xs_loc, w1_loc, w2_loc, consts_loc):
        s = jax.lax.axis_index(axis)
        mb = B_loc // M
        x_mb = x_loc.reshape(M, mb, S, D)
        perm = [(j, j + 1) for j in range(p - 1)]  # stage s -> s+1

        def tick(t, carry):
            prev_out, outs, zl, al = carry
            recv = jax.lax.ppermute(prev_out, axis, perm)  # stage 0 gets zeros
            inp = jnp.where(s == 0, x_mb[jnp.clip(t, 0, M - 1)], recv)
            out, z, a = stage_fn(inp, xs_loc, w1_loc, w2_loc, consts_loc)
            valid = jnp.logical_and(t - s >= 0, t - s < M)
            zl = zl + jnp.where(valid, z, 0.0)
            al = al + jnp.where(valid, a, 0.0)
            widx = jnp.clip(t - (p - 1), 0, M - 1)
            wvalid = jnp.logical_and(s == p - 1, valid)
            outs = outs.at[widx].set(jnp.where(wvalid, out, outs[widx]))
            return out, outs, zl, al

        zero = jnp.zeros((), jnp.float32)
        init = (
            jnp.zeros((mb, S, D), x_loc.dtype),
            jnp.zeros((M, mb, S, D), x_loc.dtype),
            zero,
            zero,
        )
        _, outs, zl, al = jax.lax.fori_loop(0, M + p - 1, tick, init)

        # per-microbatch means -> batch mean; losses live on every stage after
        # the psum so the P() out_spec is consistent
        zl = jax.lax.psum(zl, axis) / M
        al = jax.lax.psum(al, axis) / M
        out = outs.reshape(B_loc, S, D)
        # only stage p-1 holds the real output; stack over a leading pipe axis
        # and let the caller slice stage p-1's shard
        return out[None], zl, al

    x_spec = P(batch_axes, None, None)
    xs_specs = jax.tree.map(lambda _: P(axis), xs)
    w1_spec = jax.tree.map(lambda _: P(axis), w1_full)
    w2_spec = jax.tree.map(lambda _: P(axis), w2_full)
    consts_specs = jax.tree.map(lambda _: P(), consts)
    fn = shard_map(
        _body,
        mesh=mesh,
        in_specs=(x_spec, xs_specs, w1_spec, w2_spec, consts_specs),
        out_specs=(P(axis, batch_axes, None, None), P(), P()),
        check_vma=False,
    )
    stacked, z_loss, aux_loss = fn(x, xs, w1_full, w2_full, consts)
    return stacked[p - 1], z_loss, aux_loss
