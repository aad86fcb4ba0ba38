"""Perceiver-style cross-attention resampler (the "projector").

Parity target: reference aria/model/projector.py:26-189. A learned query bank
(max 256 queries) cross-attends over ViT patch features, then an FFN maps to
LM width. Note the reference's CrossAttention wraps torch's
``nn.MultiheadAttention``, so keys/queries/values are projected TWICE (the
module's own q/k/v_proj, then MultiheadAttention's packed in_proj) — we
reproduce both projections for checkpoint fidelity.

The key-padding mask (True = ignore) comes from the vision tower
(vision_encoder.py:147-152).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import Array

from aria_tpu.config import ProjectorConfig
from aria_tpu.ops.activations import gelu_tanh
from aria_tpu.ops.attention import sdpa
from aria_tpu.ops.norms import layer_norm
from aria_tpu.ops.quant import linear as qlinear


def init_projector_params(rng: jax.Array, cfg: ProjectorConfig, dtype=jnp.bfloat16) -> dict:
    keys = iter(jax.random.split(rng, 12))

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) * (fan_in**-0.5)).astype(dtype)

    E, KV = cfg.embed_dim, cfg.kv_dim
    return {
        "query": dense(next(keys), (cfg.max_queries, E), E),
        "ln_q_w": jnp.ones((E,), dtype),
        "ln_q_b": jnp.zeros((E,), dtype),
        "ln_kv_w": jnp.ones((KV,), dtype),
        "ln_kv_b": jnp.zeros((KV,), dtype),
        "q_proj": dense(next(keys), (E, E), E),
        "k_proj": dense(next(keys), (KV, E), KV),
        "v_proj": dense(next(keys), (KV, E), KV),
        # torch nn.MultiheadAttention internals: packed in-proj + out-proj.
        "attn_in_w": dense(next(keys), (E, 3 * E), E),
        "attn_in_b": jnp.zeros((3 * E,), dtype),
        "attn_out_w": dense(next(keys), (E, E), E),
        "attn_out_b": jnp.zeros((E,), dtype),
        "linear_w": dense(next(keys), (E, E), E),
        "linear_b": jnp.zeros((E,), dtype),
        "ln_ffn_w": jnp.ones((E,), dtype),
        "ln_ffn_b": jnp.zeros((E,), dtype),
        "ffn_in": dense(next(keys), (E, cfg.ff_dim), E),
        "ffn_out": dense(next(keys), (cfg.ff_dim, cfg.output_dim), cfg.ff_dim),
    }


def projector_forward(
    params: dict,
    cfg: ProjectorConfig,
    x: Array,  # [N, P, KV] patch features
    kv_ignore_mask: Optional[Array] = None,  # [N, P] bool, True = ignore key
) -> Array:
    """Returns [N, Q, output_dim] resampled image features."""
    N, P, _ = x.shape
    Q = cfg.query_count(P)
    E, H, Dh = cfg.embed_dim, cfg.num_heads, cfg.head_dim
    queries = jnp.broadcast_to(params["query"][None, :Q, :], (N, Q, E)).astype(x.dtype)

    # CrossAttention (projector.py:73-102): pre-norms, then the module's own
    # projections, then MultiheadAttention's packed projections.
    q_in = layer_norm(queries, params["ln_q_w"], params["ln_q_b"], cfg.layer_norm_eps)
    q1 = qlinear(q_in, params["q_proj"], "nqd,de->nqe").astype(x.dtype)
    kv_in = layer_norm(x, params["ln_kv_w"], params["ln_kv_b"], cfg.layer_norm_eps)
    k1 = qlinear(kv_in, params["k_proj"], "npd,de->npe").astype(x.dtype)
    v1 = qlinear(kv_in, params["v_proj"], "npd,de->npe").astype(x.dtype)

    in_w, in_b = params["attn_in_w"], params["attn_in_b"]
    q2 = jnp.einsum("nqe,ef->nqf", q1, in_w[:, :E]) + in_b[:E]
    k2 = jnp.einsum("npe,ef->npf", k1, in_w[:, E : 2 * E]) + in_b[E : 2 * E]
    v2 = jnp.einsum("npe,ef->npf", v1, in_w[:, 2 * E :]) + in_b[2 * E :]

    attend = None
    if kv_ignore_mask is not None:
        attend = jnp.logical_not(kv_ignore_mask)[:, None, None, :]  # [N,1,1,P]

    att = sdpa(
        q2.reshape(N, Q, H, Dh), k2.reshape(N, P, H, Dh), v2.reshape(N, P, H, Dh), attend
    ).reshape(N, Q, E)
    att = (qlinear(att, params["attn_out_w"], "nqe,ef->nqf") + params["attn_out_b"]).astype(x.dtype)
    att = (qlinear(att, params["linear_w"], "nqe,ef->nqf") + params["linear_b"]).astype(x.dtype)

    h = layer_norm(att, params["ln_ffn_w"], params["ln_ffn_b"], cfg.layer_norm_eps)
    h = gelu_tanh(qlinear(h, params["ffn_in"], "nqe,ef->nqf")).astype(x.dtype)
    return qlinear(h, params["ffn_out"], "nqf,fo->nqo").astype(x.dtype)
