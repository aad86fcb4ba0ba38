"""Flash attention for TPU (Pallas), with an XLA fallback.

Replaces the reference's flash-attn CUDA dependency (SURVEY.md §2.3). Built on
the Pallas TPU flash-attention kernel that ships with JAX (fwd+bwd custom
VJP), wrapped to:

- accept this framework's [B, S, H, D] layout,
- express padding via segment ids (valid tokens = segment 1, padding = 0, so
  cross-attention between valid and pad positions is masked),
- pad seq / head_dim up to hardware tiles and slice the result back,
- fall back to the fused-XLA ``sdpa`` on non-TPU backends.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array

from aria_tpu.ops.attention import sdpa
from aria_tpu.ops.backend import kernel_interpret, use_pallas


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def flash_sdpa(
    q: Array,  # [B, Sq, H, D]
    k: Array,  # [B, Sk, H, D]
    v: Array,  # [B, Sk, H, D]
    *,
    causal: bool = False,
    q_valid: Optional[Array] = None,  # [B, Sq] bool, True = real token
    kv_valid: Optional[Array] = None,  # [B, Sk] bool
    scale: Optional[float] = None,
) -> Array:
    """Returns [B, Sq, H, D]. Padding positions produce garbage rows (they are
    masked out of every valid row's context); callers already ignore them."""
    B, Sq, H, D = q.shape
    Sk = k.shape[1]
    if scale is None:
        scale = 1.0 / (D**0.5)

    # interpret-backend tests also take the XLA path: the upstream Pallas
    # flash_attention doesn't expose interpret mode, and flash is the
    # prefill/train path, not the kernels-under-mesh serving surface.
    if not use_pallas() or kernel_interpret():
        mask = None
        if causal:
            qi = jnp.arange(Sq)[:, None]
            kj = jnp.arange(Sk)[None, :]
            mask = (kj <= qi + (Sk - Sq))[None, None]
        if kv_valid is not None:
            kv_m = kv_valid[:, None, None, :]
            mask = kv_m if mask is None else jnp.logical_and(mask, kv_m)
        return sdpa(q, k, v, mask, scale=scale)

    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    # Pad sequences to the flash block size (blocks must divide seq) and
    # head_dim to the lane width.
    Sq_p, Sk_p, D_p = _round_up(Sq, 512), _round_up(Sk, 512), _round_up(D, 128)

    def pad(x, s_to, d_to):
        return jnp.pad(x, ((0, 0), (0, s_to - x.shape[1]), (0, 0), (0, d_to - x.shape[3])))

    qp = pad(q, Sq_p, D_p).transpose(0, 2, 1, 3)  # [B, H, S, D]
    kp = pad(k, Sk_p, D_p).transpose(0, 2, 1, 3)
    vp = pad(v, Sk_p, D_p).transpose(0, 2, 1, 3)

    seg = None
    if q_valid is not None or kv_valid is not None or Sq_p != Sq or Sk_p != Sk:
        qv = jnp.ones((B, Sq), bool) if q_valid is None else q_valid
        kv = jnp.ones((B, Sk), bool) if kv_valid is None else kv_valid
        qv = jnp.pad(qv, ((0, 0), (0, Sq_p - Sq)))
        kv = jnp.pad(kv, ((0, 0), (0, Sk_p - Sk)))
        seg = SegmentIds(q=qv.astype(jnp.int32), kv=kv.astype(jnp.int32))

    import os

    # on-chip A/B levers for the ViT's 4900-patch attention (TTFT device
    # floor): the defaults are 512/512; the padded head dim (72 -> 128 for
    # SigLIP) makes this kernel VPU-heavier than its LM counterpart
    bq = min(int(os.environ.get("ARIA_TPU_FLASH_BQ", 512)), Sq_p)
    bk = min(int(os.environ.get("ARIA_TPU_FLASH_BK", 512)), Sk_p)
    block_sizes = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    out = flash_attention(
        qp, kp, vp, segment_ids=seg, causal=causal, sm_scale=scale,
        block_sizes=block_sizes,
    )
    out = out.transpose(0, 2, 1, 3)[:, :Sq, :, :D]
    return out.astype(q.dtype)
