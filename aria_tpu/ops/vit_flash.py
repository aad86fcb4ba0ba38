"""ViT-shaped flash attention: non-causal, head_dim 72, padding-mask only.

The stock Pallas flash kernel (ops/flash.py) pads head_dim to the 128-lane
tile — for SigLIP's head_dim 72 that is 78% extra VMEM traffic and VPU work
on every q/k/v/acc block, plus SegmentIds bookkeeping for what is only a
trailing-padding mask. This kernel works entirely in TRANSPOSED space so the
head dim sits on SUBLANES (72 -> 80 at bf16's 16-row tile, 11% pad):

    sT  = kT^T @ qT        [BK, BQ]   (contraction over D on sublanes)
    online softmax over SUBLANES (the k dim) -> m, l live as [1, BQ] rows,
    exactly the layout that scales the transposed accumulator
    accT += vT @ pT        [Dp, BQ]   (a native [M,K]@[K,N] matmul)

No transpose, relayout, or lane-padded head block appears anywhere in the
loop. The MXU's array-depth waste at D=72 is inherent (72 of 128 systolic
rows); what this kernel removes is the memory/VPU half of the padding cost
and the stock kernel's segment/causal machinery.

Replaces the CUDA flash-attn dependency for the ViT's 4900-patch encode
(reference configuration_aria.py:79-100 selects flash_attention_2 for the
vision tower). The LM prefill keeps ops/flash.py (causal, head_dim 128 —
already tile-native).

A/B lever: ARIA_TPU_VIT_FLASH=0 reverts the ViT to ops/flash.py.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def vit_flash_enabled() -> bool:
    return os.environ.get("ARIA_TPU_VIT_FLASH", "1") != "0"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, m_scr, l_scr, acc_scr):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    qT = q_ref[0]  # [Dp, BQ] (scale pre-folded into q)
    kT = k_ref[0]  # [Dp, BK]
    # contraction over the sublane (D) dim of both operands — the MXU's
    # stationary-operand form, no relayout
    sT = jax.lax.dot_general(
        kT, qT, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [BK, BQ]
    sT = sT + mask_ref[0]  # [BK, 1] additive 0/-inf, broadcast over lanes

    m_prev = m_scr[:]  # [1, BQ]
    m_new = jnp.maximum(m_prev, jnp.max(sT, axis=0, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)  # [1, BQ]
    pT = jnp.exp(sT - m_new)  # [BK, BQ], rows of masked keys are exp(-inf)=0
    l_scr[:] = l_scr[:] * alpha + jnp.sum(pT, axis=0, keepdims=True)
    m_scr[:] = m_new

    vT = v_ref[0]  # [Dp, BK]
    pv = jax.lax.dot_general(
        vT, pT.astype(vT.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Dp, BQ] — native A[M,K] @ B[K,N]
    acc_scr[:] = acc_scr[:] * alpha + pv

    @pl.when(ik == nk - 1)
    def _():
        o_ref[0] = (acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("bq", "bk", "interpret")
)
def vit_flash(
    q: Array,  # [B, S, H, D]
    k: Array,
    v: Array,
    kv_valid: Optional[Array] = None,  # [B, S] bool, True = real patch
    *,
    bq: int = 512,
    bk: int = 512,
    interpret: bool = False,
) -> Array:
    """Non-causal attention; returns [B, S, H, D]. Padding positions produce
    garbage rows (masked out of every valid row's context) — same contract
    as ops/flash.py."""
    B, S, H, D = q.shape
    scale = 1.0 / (D**0.5)
    dtile = 16 if q.dtype == jnp.bfloat16 else 8
    Dp = _round_up(D, dtile)
    Sp = _round_up(S, max(bq, bk))
    bq = min(bq, Sp)
    bk = min(bk, Sp)

    def prep(x, fold_scale: bool):
        if fold_scale:
            x = (x.astype(jnp.float32) * scale).astype(q.dtype)
        x = jnp.pad(x, ((0, 0), (0, Sp - S), (0, 0), (0, Dp - D)))
        return x.transpose(0, 2, 3, 1).reshape(B * H, Dp, Sp)

    qT = prep(q, True)
    kT = prep(k, False)
    vT = prep(v, False)

    valid = jnp.ones((B, S), bool) if kv_valid is None else kv_valid
    valid = jnp.pad(valid, ((0, 0), (0, Sp - S)))
    mask = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[..., None]  # [B, Sp, 1]

    grid = (B * H, Sp // bq, Sp // bk)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Dp, bq), lambda bh, iq, ik: (bh, 0, iq)),
            pl.BlockSpec((1, Dp, bk), lambda bh, iq, ik: (bh, 0, ik)),
            pl.BlockSpec((1, Dp, bk), lambda bh, iq, ik: (bh, 0, ik)),
            pl.BlockSpec((1, bk, 1), lambda bh, iq, ik, H=H: (bh // H, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, Dp, bq), lambda bh, iq, ik: (bh, 0, iq)),
        out_shape=jax.ShapeDtypeStruct((B * H, Dp, Sp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, bq), jnp.float32),
            pltpu.VMEM((1, bq), jnp.float32),
            pltpu.VMEM((Dp, bq), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qT, kT, vT, mask)
    # [BH, Dp, Sp] -> [B, S, H, D]; XLA fuses this relayout into the
    # consumer's operand load
    out = out.reshape(B, H, Dp, Sp).transpose(0, 3, 1, 2)[:, :S, :, :D]
    return out
