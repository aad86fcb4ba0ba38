"""The Aria MoE decoder, TPU-native.

Functionally equivalent to the reference's 28-layer Llama-backbone MoE decoder
(aria/model/moe_lm.py:528-679, gptfast/model.py:96-386) but structured for XLA:
all layers' parameters are stacked on a leading axis and the layer loop is a
``jax.lax.scan`` (single compiled layer body, fast compile, remat-friendly).

Linear weights are stored in right-multiply layout ``[in, out]`` (``x @ W``);
the checkpoint importer transposes from torch's ``[out, in]``.

Aux losses are returned as values and added to the scalar loss by the train
step — the JAX-native replacement for the reference's MoEAuxLossAutoScaler
autograd hack (moe_lm.py:84-125).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array

from aria_tpu.config import TextConfig
from aria_tpu.ops.attention import sdpa
from aria_tpu.ops.backend import kernel_interpret, use_pallas
from aria_tpu.ops.moe import (
    experts_gather,
    experts_grouped,
    experts_ragged,
    glu,
    route_topk,
)
from aria_tpu.ops.norms import rms_norm
from aria_tpu.ops.quant import (
    dequantize_expert_weights,
    is_quantized,
    is_quantized_int4,
    linear as qlinear,
)
from aria_tpu.ops.rope import apply_rope, precompute_rope

# Below this many tokens the gathered-weights decode path beats the
# dispatch+batched-GEMM path (analogue of gptfast/model.py:318's T<50 switch).
GATHER_PATH_MAX_TOKENS = 32
# The unique-expert Pallas decode kernels stay optimal to higher lane counts
# (weights DMA once per ACTIVE expert, so cost saturates at |E| regardless of
# T): keep them engaged for 64-128-lane serving steps. Each active expert
# computes ALL T rows, so compute grows T×|E|; at ~128 lanes that crosses the
# ~15 ms/step expert-stream DMA bound and the segmented prefill kernel
# (routed rows only) takes over.
DECODE_KERNEL_MAX_TOKENS = 128


class KVCache(NamedTuple):
    """Static-shape KV cache: [L, B, H_kv, S_max, D_head].

    (S, D) minor means every (head, position-block) tile is contiguous — the
    layout the Pallas decode-attention kernel streams directly from HBM.

    With ``dtype=jnp.int8`` the cache is quantized per (layer, lane, head,
    position) with fp32 scales (amax/127 over D at write time): half the HBM
    traffic and double the max context per chip (32K fits a 16GB v5e beside
    the int8 bench model).

    With ``dtype="int4"`` the values are 4-bit, nibble-packed in HEAD PAIRS
    (head h rides the low nibble, head h + H/2 the high nibble of plane h of
    a [L, B, H/2, S, D] int8 buffer) with BIASED-LO bytes (B = 16*hi +
    (lo+8), the quant.pack_int4 layout): writes pack two fresh heads —
    never a read-modify-write — and the decode kernel unpacks ON THE MXU
    via the affine identity lo = B - (B & 0xF0) - 8, hi = (B & 0xF0)/16
    (ops/decode_attention._attend_block_p4). Scales stay per (head,
    position), [L, B, H, S]. Quarter the KV HBM traffic; 64K context fits
    one chip beside the EP-8 shard model."""

    k: Array
    v: Array
    k_scale: Optional[Array] = None  # f32 [L, B, H, S] when k is int8/int4
    v_scale: Optional[Array] = None

    @staticmethod
    def init(cfg: TextConfig, batch: int, max_seq: int, dtype=jnp.bfloat16) -> "KVCache":
        shape = (cfg.num_layers, batch, cfg.num_kv_heads, max_seq, cfg.head_dim)
        if dtype == "int4":
            assert cfg.num_kv_heads % 2 == 0, "int4 KV packs head pairs"
            pshape = (cfg.num_layers, batch, cfg.num_kv_heads // 2, max_seq, cfg.head_dim)
            # bf16 scales: at 64K the f32 scale planes alone are 0.3GB
            return KVCache(
                jnp.zeros(pshape, jnp.int8), jnp.zeros(pshape, jnp.int8),
                jnp.ones(shape[:-1], jnp.bfloat16), jnp.ones(shape[:-1], jnp.bfloat16),
            )
        k = jnp.zeros(shape, dtype)
        v = jnp.zeros(shape, dtype)
        if dtype == jnp.int8:
            # two distinct buffers (sharing one breaks donation)
            return KVCache(k, v, jnp.ones(shape[:-1], jnp.float32),
                           jnp.ones(shape[:-1], jnp.float32))
        return KVCache(k, v)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def packed4(self) -> bool:
        """int4 head-pair packing: scale buffer has 2x the head planes."""
        return self.k_scale is not None and self.k_scale.shape[2] == 2 * self.k.shape[2]

    @property
    def max_seq(self) -> int:
        return self.k.shape[3]


class LMOutput(NamedTuple):
    logits: Array  # [B, S, V]
    cache: Optional[KVCache]
    z_loss: Array  # scalar fp32
    aux_loss: Array  # scalar fp32


def init_lm_params(rng: jax.Array, cfg: TextConfig, dtype=jnp.bfloat16) -> dict:
    keys = iter(jax.random.split(rng, 16))

    def dense(key, shape, scale_dim):
        return (jax.random.normal(key, shape, jnp.float32) * (scale_dim**-0.5)).astype(dtype)

    L, D, E = cfg.num_layers, cfg.hidden_size, cfg.num_experts
    I, Is = cfg.moe_intermediate_size, cfg.shared_intermediate_size
    qkv_out = (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim
    return {
        "embed": dense(next(keys), (cfg.vocab_size, D), D),
        "layers": {
            "attn_norm": jnp.ones((L, D), dtype),
            "ffn_norm": jnp.ones((L, D), dtype),
            "wqkv": dense(next(keys), (L, D, qkv_out), D),
            "wo": dense(next(keys), (L, cfg.q_size, D), cfg.q_size),
            "gate": dense(next(keys), (L, E, D), D).astype(jnp.float32),
            "w1": dense(next(keys), (L, E, 2 * I, D), D),
            "w2": dense(next(keys), (L, E, I, D), I),
            "shared_w1": dense(next(keys), (L, D, 2 * Is), D),
            "shared_w2": dense(next(keys), (L, Is, D), Is),
        },
        "final_norm": jnp.ones((D,), dtype),
        "lm_head": dense(next(keys), (D, cfg.vocab_size), D),
    }


def init_lm_params_serving_int4(
    rng: jax.Array,
    cfg: TextConfig,
    *,
    fuse_shared: bool = True,
    expert_chunk: Optional[int] = None,
    dtype=jnp.bfloat16,
) -> dict:
    """Random-init the decoder DIRECTLY in serving form: int4 expert stacks
    (shared experts fused as always-on virtual experts), int8 attention/head
    weights.

    The bf16 64-expert stacks are ~42GB — they can never be materialized on a
    16GB chip — so experts are generated and quantized in [expert_chunk]-sized
    slabs written into preallocated packed buffers (in-place via donation).
    This is the synthetic-weights analogue of
    checkpoint/io.py::import_hf_lm_serving_int4, which streams real
    safetensors shard-slices through the same fill-chunk discipline.
    """
    from aria_tpu.ops.quant import quantize_expert_int4, quantize_weight

    keys = iter(jax.random.split(rng, 16))

    def dense(key, shape, scale_dim):
        return (jax.random.normal(key, shape, jnp.float32) * (scale_dim**-0.5)).astype(dtype)

    L, D, E = cfg.num_layers, cfg.hidden_size, cfg.num_experts
    I = cfg.moe_intermediate_size
    E_t = E + (cfg.num_shared_experts if fuse_shared else 0)
    qkv_out = (cfg.num_heads + 2 * cfg.num_kv_heads) * cfg.head_dim

    if expert_chunk is None:
        # largest divisor of E_t <= 11 keeps the f32 quantization temps
        # under ~400MB and avoids a trim copy of the packed buffers
        expert_chunk = next(d for d in range(11, 0, -1) if E_t % d == 0)
    expert_key = next(keys)
    n_chunks = -(-E_t // expert_chunk)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def fill_chunk(bufs, key, l, e0):
        k1, k2 = jax.random.split(key)
        w1 = (jax.random.normal(k1, (expert_chunk, 2 * I, D), jnp.float32)
              * (D**-0.5)).astype(dtype)
        w2 = (jax.random.normal(k2, (expert_chunk, I, D), jnp.float32)
              * (I**-0.5)).astype(dtype)
        q1, q2 = quantize_expert_int4(w1, w2)
        new = {}
        for name, src in (("w1", q1), ("w2", q2)):
            for leaf, v in src.items():
                new[(name, leaf)] = jax.lax.dynamic_update_slice(
                    bufs[(name, leaf)], v[None], (l, e0) + (0,) * (v.ndim - 1)
                )
        return new

    # probe output shapes with a tiny eval_shape, then preallocate
    shapes = jax.eval_shape(
        lambda k: quantize_expert_int4(
            jnp.zeros((expert_chunk, 2 * I, D), dtype), jnp.zeros((expert_chunk, I, D), dtype)
        ),
        expert_key,
    )
    E_pad = n_chunks * expert_chunk
    bufs = {}
    for name, src in (("w1", shapes[0]), ("w2", shapes[1])):
        for leaf, v in src.items():
            bufs[(name, leaf)] = jnp.zeros((L, E_pad) + v.shape[1:], v.dtype)

    for l in range(L):
        for c in range(n_chunks):
            key = jax.random.fold_in(expert_key, l * n_chunks + c)
            bufs = fill_chunk(bufs, key, l, c * expert_chunk)

    if E_pad != E_t:  # trim chunk padding (one copy of the packed buffers)
        bufs = {k2: v[:, :E_t] for k2, v in bufs.items()}

    # Small/medium weights AFTER the big stacks: the multi-GB packed buffers
    # claim contiguous HBM first, and each quantize's f32 temp is freed before
    # the next (jitted individually so temps don't overlap).
    from aria_tpu.ops.dense_int4 import quantize_dense_int4

    q8 = jax.jit(quantize_weight, donate_argnums=0)
    q4d = jax.jit(quantize_dense_int4, donate_argnums=0)
    layers = {
        "attn_norm": jnp.ones((L, D), dtype),
        "ffn_norm": jnp.ones((L, D), dtype),
        "wqkv": q4d(dense(next(keys), (L, D, qkv_out), D)),
        "wo": q4d(dense(next(keys), (L, cfg.q_size, D), cfg.q_size)),
        "gate": dense(next(keys), (L, E, D), D).astype(jnp.float32),
        "w1": {leaf: bufs[("w1", leaf)] for leaf in shapes[0]},
        "w2": {leaf: bufs[("w2", leaf)] for leaf in shapes[1]},
    }
    if not fuse_shared:
        Is = cfg.shared_intermediate_size
        layers["shared_w1"] = q8(dense(next(keys), (L, D, 2 * Is), D))
        layers["shared_w2"] = q8(dense(next(keys), (L, Is, D), Is))

    return {
        # int8 embed: dequantized per lookup; saves ~250MB resident at
        # flagship scale (the full model lives within ~300MB of the HBM edge)
        "embed": q8(dense(next(keys), (cfg.vocab_size, D), D)),
        "layers": layers,
        "final_norm": jnp.ones((D,), dtype),
        "lm_head": q8(dense(next(keys), (D, cfg.vocab_size), D)),
    }


def embed_tokens(embed, tokens: Array, dtype=None) -> Array:
    """Token embedding lookup; supports int8-quantized tables
    ({"q": [V, D] int8, "s": [D]}) dequantized per gathered row."""
    if is_quantized(embed):
        out = embed["q"][tokens].astype(jnp.float32) * embed["s"]
        return out.astype(dtype or jnp.bfloat16)
    return embed[tokens]


def _lora_delta(x: Array, ab: dict, scale: float,
                onehot: Optional[Array] = None) -> Array:
    """LoRA delta. Single adapter: a [d, r]. Multi-adapter serving
    (engine/multi_lora.py): a [A, d, r] + ``onehot`` [A, B] selecting one
    adapter per batch row — every adapter's rank-r delta is computed (A× a
    tiny cost) and the per-row one selected, keeping the step jit-static."""
    if onehot is not None and ab["a"].ndim == 3:
        if x.ndim == 2:  # flattened tokens [T, d], onehot [A, T]
            h = jnp.einsum("td,adr->atr", x, ab["a"])
            out = jnp.einsum("atr,arf->atf", h, ab["b"])
            return scale * jnp.einsum("atf,at->tf", out, onehot).astype(x.dtype)
        h = jnp.einsum("bsd,adr->absr", x, ab["a"])
        out = jnp.einsum("absr,arf->absf", h, ab["b"])
        return scale * jnp.einsum("absf,ab->bsf", out, onehot).astype(x.dtype)
    h = jnp.einsum("...d,dr->...r", x, ab["a"])
    return scale * jnp.einsum("...r,rf->...f", h, ab["b"]).astype(x.dtype)


def _attention(
    layer: dict,
    cfg: TextConfig,
    x: Array,  # [B, S, D]
    cos: Array,
    sin: Array,
    mask: Optional[Array],
    cache_kv: Optional["KVCache"],  # full stacked [L, B, Hkv, Smax, Dh] (+ scales if int8)
    cache_pos: Optional[Array],  # scalar (or [B]) write offset into the cache
    layer_idx: Optional[Array] = None,  # scalar int32: which layer's cache plane
    lora: Optional[dict] = None,
    lora_scale: float = 0.0,
    lora_onehot: Optional[Array] = None,  # [A, B] multi-adapter row selector
    use_flash: bool = False,  # causal flash over the current k/v (prefill/train)
    dense_q4: Optional[dict] = None,  # int4 wqkv/wo stacks (kept out of scan xs)
    cp_mesh=None,  # context-parallel mesh: attention via Ulysses all-to-all
    page_table: Optional[Array] = None,  # [B, MAXP] when cache_kv is paged
    mesh=None,  # serving mesh: single-chip kernels off; TP decode runs
    #             the Pallas kernel per head-shard inside shard_map
    fresh_causal: bool = False,  # mesh from-zero prefill: attend fresh k/v
):
    B, S, _ = x.shape
    allow_kernels = mesh is None  # single-chip Pallas paths
    # TP decode: heads shard over `model`; inside shard_map the local shards
    # are plain arrays, so the decode-attention kernel runs per shard instead
    # of falling back to the 4-8x-slower XLA gather path (VERDICT r2 #6).
    tp_n = (
        mesh.shape["model"]
        if mesh is not None and "model" in mesh.axis_names
        else 1
    )
    cp_n = (
        mesh.shape["context"]
        if mesh is not None and "context" in mesh.axis_names
        else 1
    )
    if dense_q4 is not None:
        from aria_tpu.ops.dense_int4 import dense_int4, dequantize_dense_int4

        def _d4(h2d, w):
            if use_pallas() and (allow_kernels or mesh is not None):
                import os

                # Largest column tile dividing F (cap 1536): fewer grid steps
                # -> less per-step kernel overhead in the S=1 decode matvec.
                F = w["q4t"].shape[1]
                tn_env = os.environ.get("ARIA_TPU_DENSE_TN")
                cands = (int(tn_env),) if tn_env else (1536, 1280, 768, 512, 256)
                tn = next((t for t in cands if F % t == 0), 256)
                # W4A8 for the projections is available but OFF by default:
                # the T=1 matvec is already DMA-bound (no measured win) and
                # bf16 activations keep the attention path noise-free
                a8 = (h2d.shape[0] <= 32
                      and os.environ.get("ARIA_TPU_DENSE_A8", "0") == "1")
                # Long prefills downcast in-kernel: the callers cast the f32
                # product to the residual dtype immediately anyway, and a
                # [32K, 3*D] f32 temp + its convert copy is ~1GB of HBM (the
                # margin a full-model 32K one-shot prefill doesn't have).
                od = h2d.dtype if h2d.shape[0] >= 8192 else jnp.float32
                if allow_kernels:
                    return dense_int4(h2d, w, layer_idx, tn=tn, act_int8=a8,
                                      out_dtype=od,
                                      interpret=kernel_interpret())
                # Serving mesh: the int4 projections are replicated
                # (mesh.serving_param_specs), so every device runs the
                # kernel on its full copy inside shard_map — zero
                # communication, and no per-layer bf16 dequant copy.
                from jax import shard_map
                from jax.sharding import PartitionSpec as _P

                fn = shard_map(
                    lambda h, q4t, sgw, li: dense_int4(
                        h, {"q4t": q4t, "sg": sgw}, li, tn=tn, act_int8=a8,
                        interpret=kernel_interpret(),
                    ),
                    mesh=mesh,
                    in_specs=(_P(), _P(), _P(), _P()),
                    out_specs=_P(), check_vma=False,
                )
                return fn(h2d, w["q4t"], w["sg"],
                          jnp.asarray(layer_idx, jnp.int32))
            wl = {k2: jax.lax.dynamic_index_in_dim(v, layer_idx, 0, keepdims=False)
                  for k2, v in w.items()}
            return h2d @ dequantize_dense_int4(wl, dtype=h2d.dtype)

        qkv = _d4(x.reshape(-1, x.shape[-1]), dense_q4["wqkv"]).reshape(B, S, -1)
    else:
        qkv = qlinear(x, layer["wqkv"], "bsd,df->bsf")
    if lora and "wqkv" in lora:
        qkv = qkv + _lora_delta(x, lora["wqkv"], lora_scale, lora_onehot)
    qkv = qkv.astype(x.dtype)
    q_size = cfg.q_size
    kv_size = cfg.num_kv_heads * cfg.head_dim
    q = qkv[..., :q_size].reshape(B, S, cfg.num_heads, cfg.head_dim)
    k = qkv[..., q_size : q_size + kv_size].reshape(B, S, cfg.num_kv_heads, cfg.head_dim)
    v = qkv[..., q_size + kv_size :].reshape(B, S, cfg.num_kv_heads, cfg.head_dim)

    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if cache_kv is not None and page_table is not None:
        # Paged cache (engine/paged.py): pages shared across lanes via the
        # block table; same scan-carry discipline as the contiguous cache.
        from aria_tpu.engine.paged import (
            gather_lane_kv,
            paged_decode_attention,
            paged_write,
        )

        k_t = k.transpose(0, 2, 1, 3)  # [B, H, S, D]
        v_t = v.transpose(0, 2, 1, 3)
        if cache_kv.quantized:
            k_sc = jnp.maximum(jnp.max(jnp.abs(k_t.astype(jnp.float32)), axis=-1), 1e-6) / 127.0
            v_sc = jnp.maximum(jnp.max(jnp.abs(v_t.astype(jnp.float32)), axis=-1), 1e-6) / 127.0
            k_t = jnp.round(k_t.astype(jnp.float32) / k_sc[..., None]).astype(jnp.int8)
            v_t = jnp.round(v_t.astype(jnp.float32) / v_sc[..., None]).astype(jnp.int8)
        else:
            k_sc = v_sc = None
            k_t = k_t.astype(cache_kv.k.dtype)
            v_t = v_t.astype(cache_kv.v.dtype)
        pos_vec = jnp.broadcast_to(jnp.atleast_1d(cache_pos), (B,))
        new_cache = paged_write(cache_kv, layer_idx, page_table, pos_vec,
                                k_t, v_t, k_sc, v_sc,
                                use_kernel=use_pallas() and allow_kernels)
        lengths = pos_vec + S

        if S == 1 and use_pallas() and allow_kernels and cfg.num_kv_heads == cfg.num_heads:
            out = paged_decode_attention(
                q[:, 0], new_cache, layer_idx, page_table, lengths,
                interpret=kernel_interpret(),
            )[:, None]
        else:
            k_att, v_att = gather_lane_kv(new_cache, layer_idx, page_table)
            out = sdpa(
                q,
                k_att.transpose(0, 2, 1, 3).astype(q.dtype),
                v_att.transpose(0, 2, 1, 3).astype(q.dtype),
                mask,
            )
        out = out.reshape(B, S, q_size)
        if dense_q4 is not None:
            proj = _d4(out.reshape(-1, q_size), dense_q4["wo"]).reshape(B, S, -1)
        else:
            proj = qlinear(out, layer["wo"], "bsf,fd->bsd")
        if lora and "wo" in lora:
            proj = proj + _lora_delta(out, lora["wo"], lora_scale, lora_onehot)
        return proj.astype(x.dtype), new_cache

    if cache_kv is not None:
        # The FULL stacked [L, B, H, S, D] cache rides the scan carry; only
        # this layer's tiny new k/v block is scattered in (in-place on the
        # donated carry). Streaming the cache through scan xs/ys instead
        # costs a full-plane dynamic-slice copy per layer per step.
        quantized = cache_kv.quantized
        packed4 = cache_kv.packed4
        k_t = k.transpose(0, 2, 1, 3)  # [B, H, S, D]
        v_t = v.transpose(0, 2, 1, 3)
        k_fresh, v_fresh = k_t, v_t  # pre-quantization, for the merge path
        if quantized:
            qmax = 7.0 if packed4 else 127.0
            # int4 path quantizes in bf16 (values <= 7 are exact; the f32
            # intermediates are ~1.3GB at a 64K prefill), int8 in f32
            qdt = jnp.bfloat16 if packed4 else jnp.float32
            k_sc = jnp.maximum(jnp.max(jnp.abs(k_t.astype(jnp.float32)), axis=-1), 1e-6) / qmax
            v_sc = jnp.maximum(jnp.max(jnp.abs(v_t.astype(jnp.float32)), axis=-1), 1e-6) / qmax
            k_sc, v_sc = k_sc.astype(qdt), v_sc.astype(qdt)
            k_t = jnp.round(k_t.astype(qdt) / k_sc[..., None])
            v_t = jnp.round(v_t.astype(qdt) / v_sc[..., None])
            if packed4:
                # nibble-pack head pairs (h -> lo, h + H/2 -> hi): fresh
                # values only, never a read-modify-write of the cache.
                # BIASED-LO bytes (B = 16*hi + (lo+8), same layout as
                # quant.pack_int4): lo = B - (B & 0xF0) - 8 and
                # hi = (B & 0xF0)/16 are AFFINE in the raw byte, which lets
                # the decode-attention kernel unpack on the MXU (dots on the
                # raw and 16x-masked bytes) instead of per-byte VPU shifts
                Hh = cfg.num_kv_heads // 2

                def pack_heads(q):
                    q = jnp.clip(q, -8, 7).astype(jnp.int8)
                    return ((q[:, :Hh] + 8) & 0xF) | (q[:, Hh:] << 4)

                k_t, v_t = pack_heads(k_t), pack_heads(v_t)
            else:
                k_t = k_t.astype(jnp.int8)
                v_t = v_t.astype(jnp.int8)
        else:
            k_t = k_t.astype(cache_kv.k.dtype)
            v_t = v_t.astype(cache_kv.v.dtype)

        if cache_pos.ndim == 0:
            start = (layer_idx, 0, 0, cache_pos, 0)
            new_cache = KVCache(
                jax.lax.dynamic_update_slice(cache_kv.k, k_t[None], start),
                jax.lax.dynamic_update_slice(cache_kv.v, v_t[None], start),
                *((
                    jax.lax.dynamic_update_slice(cache_kv.k_scale, k_sc[None], start[:-1]),
                    jax.lax.dynamic_update_slice(cache_kv.v_scale, v_sc[None], start[:-1]),
                ) if quantized else (None, None)),
            )
            lengths = jnp.full((B,), cache_pos + S, jnp.int32)
        else:
            # per-lane write offsets (continuous batching): cache_pos [B]
            from aria_tpu.ops.kv_write import (
                _sublanes, kv_cache_write, kvw_enabled,
            )

            bi = jnp.arange(B)[:, None, None]
            hi = jnp.arange(cfg.num_kv_heads)[None, :, None]
            hv = jnp.arange(k_t.shape[1])[None, :, None]  # H/2 when packed4
            si = (cache_pos[:, None] + jnp.arange(S)[None, :])[:, None, :]
            if (S == 1 and use_pallas() and allow_kernels and kvw_enabled()
                    and cache_kv.k.shape[3] % _sublanes(cache_kv.k.dtype) == 0):
                # Pallas block write: the XLA scatter issues one DMA per
                # (lane, head) row — ~64us at 32 lanes x 20 heads, x2 (K and
                # V) x28 layers was ~3.6ms of the 25ms 32-lane decode step.
                # Lane rows are distinct, so the kernel's unique-destination
                # precondition holds unconditionally here.
                new_k, new_v = kv_cache_write(
                    cache_kv.k, cache_kv.v, layer_idx,
                    jnp.arange(B, dtype=jnp.int32), cache_pos,
                    k_t[:, :, 0], v_t[:, :, 0],
                    interpret=kernel_interpret())
            else:
                new_k = cache_kv.k.at[layer_idx, bi, hv, si].set(k_t)
                new_v = cache_kv.v.at[layer_idx, bi, hv, si].set(v_t)
            new_ks = new_vs = None
            if quantized and S == 1:
                # one-hot select + layer-plane dynamic_update_slice instead of
                # a scatter: the scale scatter's layout fought the Pallas
                # decode-attention operand layout, so XLA transposed the WHOLE
                # [L, B, H, S] scale stack back and forth per layer per step
                # (~450us/layer at 32 lanes — 36% of the decode step); the
                # plane select touches 1.3MB and updates in place
                Smax = cache_kv.k_scale.shape[3]
                onehot = jnp.arange(Smax)[None, None, :] == cache_pos[:, None, None]
                sl = (layer_idx, 0, 0, 0)
                size = (1,) + cache_kv.k_scale.shape[1:]

                def plane_set(stack, sc):  # sc [B, H, 1]
                    plane = jax.lax.dynamic_slice(stack, sl, size)[0]
                    new = jnp.where(onehot, sc.astype(stack.dtype), plane)
                    return jax.lax.dynamic_update_slice(stack, new[None], sl)

                new_ks = plane_set(cache_kv.k_scale, k_sc)
                new_vs = plane_set(cache_kv.v_scale, v_sc)
            elif quantized:
                new_ks = cache_kv.k_scale.at[layer_idx, bi, hi, si].set(k_sc)
                new_vs = cache_kv.v_scale.at[layer_idx, bi, hi, si].set(v_sc)
            new_cache = KVCache(new_k, new_v, new_ks, new_vs)
            lengths = cache_pos + S
    else:
        new_cache = None

    if cp_mesh is not None and cache_kv is None:
        # Sequence-parallel causal attention over the `context` mesh axis.
        # Two implementations (both net-new vs the reference, which has no
        # sequence parallelism): DeepSpeed-Ulysses head-scatter
        # (parallel/context.py, default) and ring attention with rotating KV
        # blocks (parallel/ring.py — used when heads don't divide the axis,
        # or forced via ARIA_TPU_CP=ring). The 64K multimodal context
        # (reference README.md:13) runs here when one chip's HBM can't hold
        # the activations.
        import os

        c = cp_mesh.shape["context"]
        use_ring = (
            os.environ.get("ARIA_TPU_CP", "").lower() == "ring"
            or cfg.num_heads % c != 0
        )
        if use_ring:
            from aria_tpu.parallel.ring import ring_attention

            out = ring_attention(q, k, v, cp_mesh, causal=True)
        else:
            from aria_tpu.parallel.context import ulysses_attention

            out = ulysses_attention(q, k, v, cp_mesh, causal=True)
    elif use_flash:
        # Causal attention within the current block: for a from-zero prefill
        # this equals attending over the cache prefix (kv <= qi < S), so the
        # cache is written but not read.
        from aria_tpu.ops.flash import flash_sdpa

        out = flash_sdpa(q, k, v, causal=True)
    elif (cache_kv is not None and S == 1 and use_pallas() and allow_kernels
          and cfg.num_kv_heads == cfg.num_heads):  # kernel is MHA-only; GQA -> sdpa
        from aria_tpu.ops.decode_attention import decode_attention

        # Attend over the POST-scatter cache. Do NOT read the pre-scatter
        # buffer here (the "attend old cache + analytic fresh-token merge"
        # variant): a live consumer of the old buffer defeats XLA's in-place
        # KV update, forcing a full cache copy per layer per step — measured
        # 12 tok/s vs ~240 tok/s at flagship depth. The fresh token's one
        # quantize round trip is covered by the int8/int4 tolerance tests;
        # the kernel's return_stats mode remains for callers that need the
        # split (see tests/test_kernels.py merge-equivalence tests).
        out = decode_attention(
            q[:, 0], new_cache.k, new_cache.v, layer_idx, lengths,
            k_scale=new_cache.k_scale, v_scale=new_cache.v_scale,
            interpret=kernel_interpret(),
        )[:, None]  # [B, 1, H, D]
    elif (cache_kv is not None and S == 1 and use_pallas() and mesh is not None
          and cfg.num_kv_heads == cfg.num_heads
          and cfg.num_heads % tp_n == 0
          and (new_cache.k.shape[3] // cp_n) % 128 == 0):
        # Serving-mesh decode: heads shard over `model` (TP), cache positions
        # over `context` (CP); inside shard_map the local shards are plain
        # arrays, so the single-chip Pallas kernel runs per shard — never the
        # XLA gather fallback. Under CP the per-block (acc, m, s) partials
        # merge exactly (parallel/cp_cache.py); on a mesh with neither axis
        # the specs are fully replicated and every device runs the full
        # kernel on its cache replica.
        from aria_tpu.parallel.cp_cache import mesh_decode_attention

        out = mesh_decode_attention(
            q[:, 0], new_cache, layer_idx, lengths, mesh,
        )[:, None].astype(q.dtype)
    elif (cache_kv is not None and S > 1 and cp_n > 1 and mask is not None
          and new_cache.k.shape[3] % cp_n == 0):
        # Cached prefill under context parallelism: the (64K) KV cache is
        # position-sharded over `context`; each device attends the query
        # chunk against its local block and the online-softmax partials
        # merge with one pmax + two psums (parallel/cp_cache.py). Per-device
        # peak logits memory drops from S x Smax to S x Smax/c.
        from aria_tpu.parallel.cp_cache import cp_cached_prefill_attention

        out = cp_cached_prefill_attention(q, new_cache, layer_idx, mask, mesh)
    elif cache_kv is not None and fresh_causal:
        # Mesh from-zero prefill: causal attention over the fresh bf16 k/v
        # (cache written, not read) — identical semantics and numerics to
        # the single-chip flash branch; GSPMD shards the einsums.
        qi = jnp.arange(S)
        cmask = (qi[None, :] <= qi[:, None])[None, None]
        out = sdpa(q, k, v, cmask)
    elif cache_kv is not None:
        def _plane(arr):
            return jax.lax.dynamic_index_in_dim(arr, layer_idx, 0, keepdims=False)

        k_att = _plane(new_cache.k)
        v_att = _plane(new_cache.v)
        if new_cache.quantized:
            if new_cache.packed4:
                def unpack_heads(p):  # [B, H/2, S, D] -> [B, H, S, D]
                    b32 = p.astype(jnp.int32)  # biased-lo bytes (pack_heads)
                    lo = ((b32 & 0xF) - 8).astype(jnp.float32)
                    hi = (b32 >> 4).astype(jnp.float32)
                    return jnp.concatenate([lo, hi], axis=1)

                k_att, v_att = unpack_heads(k_att), unpack_heads(v_att)
            else:
                k_att = k_att.astype(jnp.float32)
                v_att = v_att.astype(jnp.float32)
            k_att = k_att * _plane(new_cache.k_scale)[..., None]
            v_att = v_att * _plane(new_cache.v_scale)[..., None]
        out = sdpa(
            q,
            k_att.transpose(0, 2, 1, 3).astype(q.dtype),
            v_att.transpose(0, 2, 1, 3).astype(q.dtype),
            mask,
        )
    else:
        out = sdpa(q, k, v, mask)
    out = out.reshape(B, S, q_size)
    if dense_q4 is not None:
        proj = _d4(out.reshape(-1, q_size), dense_q4["wo"]).reshape(B, S, -1)
    else:
        proj = qlinear(out, layer["wo"], "bsf,fd->bsd")
    if lora and "wo" in lora:
        proj = proj + _lora_delta(out, lora["wo"], lora_scale, lora_onehot)
    return proj.astype(x.dtype), new_cache


def _pin_default_layout(x: Array) -> Array:
    """Identity Pallas copy that pins its output to the default layout.

    XLA's layout assignment propagates a consumer's preferred layout through
    dynamic-slices to the PARAMETER being sliced: for the blocked expert-LoRA
    dequant, the unpack chain's interleaving reshape made XLA materialize a
    transpose copy of the WHOLE resident int4 stacks (7.3GB + 3.7GB HLO
    temps, observed on-chip; optimization_barrier does not stop layout
    propagation). Custom calls take default layouts, so this cheap per-block
    copy cuts the chain at a ~25MB slice."""
    from jax.experimental import pallas as pl

    blk = (1,) + x.shape[1:]

    def _copy(src, dst):
        dst[...] = src[...]

    return pl.pallas_call(
        _copy,
        grid=(x.shape[0],),
        in_specs=[pl.BlockSpec(blk, lambda i: (i,) + (0,) * (x.ndim - 1))],
        out_specs=pl.BlockSpec(blk, lambda i: (i,) + (0,) * (x.ndim - 1)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=kernel_interpret(),
    )(x)


def _experts_lora_blocked(
    x: Array,  # [T, D]
    indices: Array,  # [T, k]
    weights: Array,  # [T, k]
    w1q: dict,  # this layer's QUANTIZED w1 stack (int4 or int8 dict, [E, ...])
    w2q: dict,
    lora: dict,  # per-layer adapters incl. "w1"/"w2" expert factors
    lora_scale: float,
    lora_onehot: Optional[Array],
    dtype,
    pin_layout: bool = False,  # True on the single-chip Pallas backend
) -> Array:
    """Expert-LoRA capacity path over quantized stacks, one expert block at a
    time.

    The adapters sit INSIDE the expert GLU (reference lora/layers.py:108-152:
    fc1' = fc1(x) + B1A1(x) before the activation), so the base int4/int8
    kernels cannot run beneath them — the XLA capacity path needs fp weights.
    Dequantizing a whole flagship layer is a ~2.1GB f32 temp (x2 with XLA's
    layout copy), which does not fit beside the resident 12.9GB int4 model.
    Scanning over expert blocks bounds the dequant temp to E_b/E of a layer:
    routing slots pointing outside the current block are clipped to local
    expert 0 with weight zero (their capacity rows compute garbage that
    combines to exactly 0.0), so the f32 block-sum equals the unblocked
    dispatch bit-for-tolerance (additions of exact zeros; block order only
    reassociates the per-token k-slot f32 sum).
    """
    import os

    E = (w1q["q4"] if "q4" in w1q else w1q["q"]).shape[0]
    eb = int(os.environ.get("ARIA_TPU_LORA_EBLOCK", "0"))
    if eb <= 0 or E % eb:
        eb = next((b for b in range(min(16, E), 0, -1) if E % b == 0), E)
    nb = E // eb
    if nb == 1:  # single block = the plain path, skip the scan machinery
        w1, w2 = dequantize_expert_weights(w1q, w2q, dtype=dtype)
        return experts_grouped(
            x, indices, weights, w1, w2,
            lora_w1=lora.get("w1"), lora_w2=lora.get("w2"),
            lora_scale=lora_scale, lora_onehot=lora_onehot,
        )
    lw1, lw2 = lora.get("w1"), lora.get("w2")

    def _blk_slice(tree, e0):
        # expert axis: 0 for quantized leaves [E, ...]; ndim-3 for adapter
        # factors ("a": [.., E, D, r], "b": [.., E, r, F] — single or [A, ...])
        return {
            k: jax.lax.dynamic_slice_in_dim(
                v, e0, eb, axis=(v.ndim - 3) if k in ("a", "b") else 0)
            for k, v in tree.items()
        }

    def blk(acc, b):
        e0 = b * eb
        w1b = _blk_slice(w1q, e0)
        w2b = _blk_slice(w2q, e0)
        if pin_layout:
            w1b = {k2: _pin_default_layout(v) for k2, v in w1b.items()}
            w2b = {k2: _pin_default_layout(v) for k2, v in w2b.items()}
        w1, w2 = dequantize_expert_weights(w1b, w2b, dtype=dtype)
        il = indices - e0
        valid = (il >= 0) & (il < eb)
        wts = jnp.where(valid, weights, jnp.zeros((), weights.dtype))
        # invalid slots route to the out-of-range id eb: _dispatch_indices
        # sends them to the trash row (clipping to a REAL local expert could
        # overflow its capacity and evict that expert's genuine tokens)
        il = jnp.where(valid, il, eb)
        out = experts_grouped(
            x, il, wts, w1, w2,
            lora_w1=_blk_slice(lw1, e0) if lw1 else None,
            lora_w2=_blk_slice(lw2, e0) if lw2 else None,
            lora_scale=lora_scale, lora_onehot=lora_onehot,
        )
        return acc + out.astype(jnp.float32), None

    acc, _ = jax.lax.scan(
        blk, jnp.zeros(x.shape, jnp.float32), jnp.arange(nb, dtype=jnp.int32)
    )
    return acc.astype(dtype)


def _moe_ffn(
    layer: dict,
    cfg: TextConfig,
    x: Array,
    training: bool,
    w1_full: Array,  # [L, E, 2I, D] — full stack, NOT scan-sliced
    w2_full: Array,  # [L, E, I, D]
    layer_idx: Array,
    lora: Optional[dict] = None,
    lora_scale: float = 0.0,
    mesh=None,  # expert parallelism when mesh["expert"] > 1
    lora_onehot=None,  # [A, T] token-level multi-adapter selector
):
    """MoE FFN + shared experts (reference moe_lm.py:548-577).

    The expert weight stacks are passed whole: the Pallas decode kernel
    indexes (layer, expert) inside its BlockSpecs, so only the routed tiles
    ever move; slicing them per layer in the scan would materialize 100s of
    MB per layer per step as pallas-call operands."""
    B, S, D = x.shape
    flat = x.reshape(-1, D)
    T = flat.shape[0]

    has_expert_lora_early = lora is not None and ("w1" in lora or "w2" in lora)
    if is_quantized_int4(w1_full):
        e_stack = w1_full["q4"].shape[1]
    elif isinstance(w1_full, dict):
        e_stack = w1_full["q"].shape[1]
    else:
        e_stack = w1_full.shape[1]
    ep_possible = (
        mesh is not None
        and "expert" in mesh.axis_names
        and mesh.shape["expert"] > 1
        and not has_expert_lora_early
        and e_stack == cfg.num_experts  # shared experts not fused
        and cfg.num_experts % mesh.shape["expert"] == 0
    )
    # Serving-time T padding: a decode step's T (lanes) need not divide the
    # expert axis (T=1 single-stream). Pad with zero rows — their routed
    # outputs are discarded — so decode still rides the EP kernel path
    # instead of XLA all-gathering the sharded expert stacks per layer.
    ep_pad = 0
    if ep_possible and not training and T % mesh.shape["expert"] != 0:
        ep_pad = (-T) % mesh.shape["expert"]
    use_ep = ep_possible and (T + ep_pad) % mesh.shape["expert"] == 0 and (
        training is False or T % mesh.shape["expert"] == 0
    )
    if use_ep:
        ep_flat = flat
        if ep_pad:
            ep_flat = jnp.concatenate(
                [flat, jnp.zeros((ep_pad, D), flat.dtype)], axis=0
            )
        # Real EP: all-to-all token dispatch to expert owners (parallel/ep.py)
        # instead of GSPMD all-gathering the [E, 2I, D] stacks.
        from aria_tpu.parallel.ep import experts_ep

        if (not training and use_pallas()
                and ep_flat.shape[0] <= 8 * GATHER_PATH_MAX_TOKENS):
            # Serving decode: pass the FULL stacks + layer_idx so each
            # shard's Pallas decode kernel BlockSpec-indexes (layer, expert)
            # — no per-layer expert-stack slice copy, no XLA gather fallback
            # (VERDICT r2 #6).
            expert_out, z_loss, aux_loss = experts_ep(
                ep_flat, layer["gate"].astype(jnp.float32), cfg.moe_topk,
                w1_full, w2_full, mesh,
                z_loss_coeff=cfg.moe_z_loss_coeff,
                aux_loss_coeff=cfg.moe_aux_loss_coeff,
                training=False, layer_idx=layer_idx,
            )
        else:
            _slice_l = lambda w: jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, layer_idx, 0, keepdims=False), w
            )
            w1l, w2l = _slice_l(w1_full), _slice_l(w2_full)
            expert_out, z_loss, aux_loss = experts_ep(
                ep_flat, layer["gate"].astype(jnp.float32), cfg.moe_topk, w1l, w2l, mesh,
                z_loss_coeff=cfg.moe_z_loss_coeff, aux_loss_coeff=cfg.moe_aux_loss_coeff,
                training=training,
            )
        if ep_pad:
            expert_out = expert_out[:T]
        shared_h = qlinear(flat, layer["shared_w1"], "td,df->tf")
        if lora and "shared_w1" in lora:
            shared_h = shared_h + _lora_delta(flat, lora["shared_w1"], lora_scale, lora_onehot)
        shared_h = glu(shared_h.astype(x.dtype))
        shared_out = qlinear(shared_h, layer["shared_w2"], "tf,fd->td")
        if lora and "shared_w2" in lora:
            shared_out = shared_out + _lora_delta(shared_h, lora["shared_w2"], lora_scale, lora_onehot)
        out = expert_out + shared_out.astype(x.dtype)
        return out.reshape(B, S, D), z_loss, aux_loss

    # Long-prefill token chunking: the dispatch buffers scale with T (the
    # capacity path materializes [E, T, 2I] — 4GB+ at a 64K prefill), so very
    # long prompts run the identical per-token MoE in bounded slices via a
    # sequential lax.map. Exact: routing is per-token; eval-mode losses are 0.
    # At a 32K one-shot prefill beside the FULL int4 model (14.3GB of
    # arguments) the 8192-token chunk's two f32 slot buffers (~1.36GB) blew
    # HBM by 751MB, so ≥32K prompts use 2048-token slices (~340MB of temps);
    # the extra expert-stack restreams cost ~0.2s of a 14s+ prefill.
    # ARIA_TPU_MOE_CHUNK overrides (tests force tiny chunks to pin the
    # chunked path's exactness against the unchunked one).
    import os as _os

    MOE_CHUNK = int(_os.environ.get("ARIA_TPU_MOE_CHUNK", "0")) or (
        8192 if T < 32768 else 2048
    )
    if T > MOE_CHUNK and T % MOE_CHUNK == 0 and not training:
        if lora_onehot is None:
            def run_chunk(xc):  # [MOE_CHUNK, D]
                out_c, zl, al = _moe_ffn(
                    layer, cfg, xc[None], training, w1_full, w2_full, layer_idx,
                    lora, lora_scale, mesh,
                )
                return out_c[0], zl, al

            outs, zls, als = jax.lax.map(run_chunk, flat.reshape(-1, MOE_CHUNK, D))
        else:
            A = lora_onehot.shape[0]
            oh = lora_onehot.reshape(A, -1, MOE_CHUNK).transpose(1, 0, 2)

            def run_chunk(xs_c):
                xc, oc = xs_c  # [MOE_CHUNK, D], [A, MOE_CHUNK]
                out_c, zl, al = _moe_ffn(
                    layer, cfg, xc[None], training, w1_full, w2_full, layer_idx,
                    lora, lora_scale, mesh, lora_onehot=oc,
                )
                return out_c[0], zl, al

            outs, zls, als = jax.lax.map(
                run_chunk, (flat.reshape(-1, MOE_CHUNK, D), oh))
        return outs.reshape(B, S, D), jnp.sum(zls), jnp.sum(als)

    routing = route_topk(
        flat,
        layer["gate"].astype(jnp.float32),
        cfg.moe_topk,
        z_loss_coeff=cfg.moe_z_loss_coeff,
        aux_loss_coeff=cfg.moe_aux_loss_coeff,
        training=training,
    )
    indices, weights = routing.indices, routing.weights

    # Serving-time fused shared experts (quant.fuse_shared_experts): the
    # expert stacks carry num_shared extra always-on experts; every token gets
    # fixed extra slots with combine weight 1 and the separate shared-MLP
    # einsums disappear.
    if is_quantized_int4(w1_full):
        E_stack = w1_full["q4"].shape[1]
    elif is_quantized(w1_full):
        E_stack = w1_full["q"].shape[1]
    else:
        E_stack = w1_full.shape[1]
    shared_fused = E_stack == cfg.num_experts + cfg.num_shared_experts
    if shared_fused:
        ns = cfg.num_shared_experts
        extra = jnp.broadcast_to(
            jnp.arange(cfg.num_experts, cfg.num_experts + ns, dtype=jnp.int32)[None],
            (T, ns),
        )
        indices = jnp.concatenate([indices, extra], axis=1)
        weights = jnp.concatenate(
            [weights.astype(jnp.float32), jnp.ones((T, ns), jnp.float32)], axis=1
        ).astype(weights.dtype)

    has_expert_lora = lora is not None and ("w1" in lora or "w2" in lora)
    # single-chip kernels: with a mesh the XLA/GSPMD paths run instead
    kernels_ok = use_pallas() and mesh is None
    use_decode_kernel = (
        T <= DECODE_KERNEL_MAX_TOKENS and kernels_ok and not training
        and not has_expert_lora
    )
    if use_decode_kernel:
        from aria_tpu.ops.moe_decode_kernel import (
            moe_decode,
            moe_decode_int4,
            moe_decode_quant,
        )

        import os

        I = cfg.moe_intermediate_size
        # Pick the LARGEST legal row tile: fewer grid steps beat smaller
        # blocks — per-step kernel overhead (~1.2us) dominated the decode
        # profile at ft=128 (104 steps/layer = 130us/layer vs the 62us HBM
        # roofline). Legal = the full I (one tile per slot), else a multiple
        # of 128 dividing I (the scale blocks are [8, ft] so ft is a lane
        # dimension). ARIA_TPU_MOE_FT overrides for tuning.
        ft_env = os.environ.get("ARIA_TPU_MOE_FT")
        if ft_env:
            cands = (int(ft_env),)
        elif I % 128 == 0 and I <= 2048:
            cands = (I,)
        else:
            cands = (1024, 512, 256, 128)
        ft = next((f for f in cands if I % f == 0), None)
        if not ft:
            use_decode_kernel = False
        elif is_quantized_int4(w1_full):
            # W4A8 by default: int8 activations ride integer MXU dots on the
            # raw packed bytes (one int8 mask per weight byte, no converts) —
            # at batched lane counts the bf16 variant's per-byte converts
            # dominate the whole decode step. ARIA_TPU_A8=0 restores the
            # bf16-activation variant (exact vs dequantized int4).
            a8 = os.environ.get("ARIA_TPU_A8", "1") != "0"
            expert_out = moe_decode_int4(
                flat, indices, weights,
                w1_full["q4"], w1_full["sg"], w2_full["q4"], w2_full["s8"],
                layer_idx, ft=ft, act_int8=a8, interpret=kernel_interpret(),
            )
        elif is_quantized(w1_full):
            expert_out = moe_decode_quant(
                flat, indices, weights,
                w1_full["q"], w1_full["s8"], w2_full["q"], w2_full["s8"],
                layer_idx, ft=ft, interpret=kernel_interpret(),
            )
        else:
            expert_out = moe_decode(
                flat, indices, weights, w1_full, w2_full, layer_idx, ft=ft,
                interpret=kernel_interpret(),
            )
    if not use_decode_kernel and (
        is_quantized_int4(w1_full) and kernels_ok and not training
        and not has_expert_lora
    ):
        # Prefill over packed int4: consume the nibbles directly — a per-layer
        # bf16 dequant (~1.3GB at flagship scale) would not fit beside the
        # resident full model and triples the weight traffic.
        from aria_tpu.ops.moe_prefill_kernel import experts_segmented_int4

        I = cfg.moe_intermediate_size
        ft = next((f for f in (512, 256, 128) if I % f == 0), None)
        if ft:
            expert_out = experts_segmented_int4(
                flat, indices, weights,
                w1_full["q4"], w1_full["sg"], w2_full["q4"], w2_full["s8"],
                layer_idx, ft=ft, interpret=kernel_interpret(),
            )
            use_decode_kernel = True  # expert_out computed; skip fallback
    if not use_decode_kernel:
        def _slice(w):
            if isinstance(w, dict):
                return {k2: jax.lax.dynamic_index_in_dim(v, layer_idx, 0, keepdims=False)
                        for k2, v in w.items() if k2 in ("q", "s", "q4", "sg", "s8")}
            return jax.lax.dynamic_index_in_dim(w, layer_idx, 0, keepdims=False)

        if has_expert_lora and isinstance(w1_full, dict):
            # LoRA factors live inside the expert nonlinearity -> capacity
            # path; quantized base -> blocked dequant (a whole-layer fp
            # stack would not fit beside the resident full int4 model).
            expert_out = _experts_lora_blocked(
                flat, indices, weights, _slice(w1_full), _slice(w2_full),
                lora, lora_scale, lora_onehot, x.dtype,
                pin_layout=kernels_ok,
            )
            w1 = w2 = args = None
        else:
            w1, w2 = dequantize_expert_weights(
                _slice(w1_full), _slice(w2_full), dtype=x.dtype)
            args = (flat, indices, weights, w1, w2)
        if args is None:
            pass  # expert_out computed by the blocked path above
        elif has_expert_lora:
            # LoRA factors live inside the expert nonlinearity -> capacity path
            # (per-expert batched GEMMs + LoRA deltas, lora/layers.py:108-152).
            expert_out = experts_grouped(
                *args,
                lora_w1=lora.get("w1"), lora_w2=lora.get("w2"), lora_scale=lora_scale,
                lora_onehot=lora_onehot,
            )
        elif T <= GATHER_PATH_MAX_TOKENS:
            expert_out = experts_gather(*args)
        elif kernels_ok and cfg.num_experts > 2 * cfg.moe_topk:
            # Many experts: ragged megablox dispatch (dense capacity would
            # compute E/k times the needed rows).
            expert_out = experts_ragged(*args, interpret=kernel_interpret())
        else:
            # Few (per-chip) experts: the dropless capacity path is ~E/k x
            # FLOPs but runs as one dense batched GEMM at high MXU
            # utilization — measured ~5x faster than ragged gmm here.
            expert_out = experts_grouped(*args)

    if shared_fused:
        out = expert_out
    else:
        shared_h = qlinear(flat, layer["shared_w1"], "td,df->tf")
        if lora and "shared_w1" in lora:
            shared_h = shared_h + _lora_delta(flat, lora["shared_w1"], lora_scale, lora_onehot)
        shared_h = glu(shared_h.astype(x.dtype))
        shared_out = qlinear(shared_h, layer["shared_w2"], "tf,fd->td")
        if lora and "shared_w2" in lora:
            shared_out = shared_out + _lora_delta(shared_h, lora["shared_w2"], lora_scale, lora_onehot)
        out = expert_out + shared_out.astype(x.dtype)
    return out.reshape(B, S, D), routing.z_loss, routing.aux_loss


def lm_forward(
    params: dict,
    cfg: TextConfig,
    tokens: Optional[Array] = None,  # [B, S] int32
    *,
    inputs_embeds: Optional[Array] = None,  # [B, S, D]
    positions: Optional[Array] = None,  # [S] or [B, S]
    mask: Optional[Array] = None,  # broadcastable to [B, H, S, S_k]; True = attend
    cache: Optional[KVCache] = None,
    cache_pos: Optional[Array] = None,  # scalar int32 write offset
    training: bool = False,
    logit_position: Optional[Array] = None,  # scalar: compute logits at this position only
    lora: Optional[dict] = None,  # stacked-[L] adapters: {"layers": {name: {"a","b"}}}
    lora_scale: float = 0.0,
    lora_onehot: Optional["Array"] = None,  # [A, B] multi-adapter lane selector
    remat: bool = False,  # rematerialize each layer in backward (grad ckpt)
    causal_flash: Optional[bool] = None,  # caller asserts pure-causal-from-0 attention
    mesh=None,  # context parallelism when mesh has a `context` axis > 1
    page_table: Optional[Array] = None,  # [B, MAXP] when cache is a PagedKVCache
) -> LMOutput:
    """Run the decoder. Without a cache, defaults to causal self-attention."""
    if inputs_embeds is None:
        x = embed_tokens(params["embed"], tokens, dtype=params["final_norm"].dtype)
    else:
        x = inputs_embeds
    B, S, D = x.shape

    if positions is None:
        positions = jnp.arange(S, dtype=jnp.int32)
    cos, sin = precompute_rope(positions, cfg.head_dim, cfg.rope_base)

    # Context parallelism: only for pure-causal uncached attention (training /
    # long prefill); the caller's right-padded batches stay correct because
    # causal order means valid queries never see trailing pad keys.
    cp_mesh = None
    if (
        mesh is not None
        and "context" in mesh.axis_names
        and mesh.shape["context"] > 1
        and cache is None
        and mask is None
        and S % mesh.shape["context"] == 0
    ):
        # heads % context == 0 is only needed by Ulysses; ring attention
        # (selected in _attention_block) has no head constraint.
        cp_mesh = mesh

    if mask is None and cache is None and cp_mesh is None:
        qi = jnp.arange(S)
        mask = (qi[None, :] <= qi[:, None])[None, None]

    from aria_tpu.ops.dense_int4 import is_dense_int4

    layers = params["layers"]
    # Expert stacks stay OUT of the scan xs (see _moe_ffn docstring); so do
    # int4 wqkv/wo (the kernel indexes the layer inside its BlockSpecs).
    dense_q4 = None
    if is_dense_int4(layers.get("wqkv")):
        dense_q4 = {"wqkv": layers["wqkv"], "wo": layers["wo"]}
    exclude = ("w1", "w2") + (("wqkv", "wo") if dense_q4 else ())
    xs_layers = {k: v for k, v in layers.items() if k not in exclude}
    w1_full, w2_full = layers["w1"], layers["w2"]
    lora_layers = lora["layers"] if lora is not None else None
    # Multi-adapter serving (engine/multi_lora.py): attention consumes the
    # lane-level [A, B] selector; the MoE gets its token-level expansion.
    tok_onehot = (
        jnp.repeat(lora_onehot, S, axis=1) if lora_onehot is not None else None
    )

    if causal_flash is None:
        causal_flash = mask is None and cache is None
    # single-chip kernels stay off under a mesh (GSPMD/XLA paths shard;
    # Ulysses runs flash on local shards inside its own shard_map)
    use_flash = use_pallas() and mesh is None and S > 1 and causal_flash
    # Under a serving mesh, a from-zero prefill attends the FRESH k/v via
    # plain sdpa (GSPMD-sharded) — the same exact-attention-over-bf16 read
    # as the single-chip flash path, instead of a quantize round trip
    # through the just-written cache. CP meshes take the blockwise
    # cache-read path instead (bounded memory at 64K).
    fresh_causal = (
        mesh is not None and use_pallas() and S > 1 and bool(causal_flash)
    )

    has_cache = cache is not None

    def make_body(w1, w2, moe_mesh, rope_mask=None):
        # rope_mask overrides the closure constants (PP stages must receive
        # them as shard_map operands, not Auto-mesh closure captures)
        cos_b, sin_b, mask_b = rope_mask if rope_mask is not None else (cos, sin, mask)

        def body(carry, xs):
            if has_cache:
                h, zl, al, kv = carry
                layer, lr, l_idx = xs
                pos = cache_pos
            else:
                h, zl, al = carry
                layer, lr, l_idx = xs
                kv, pos = None, None
            normed = rms_norm(h, layer["attn_norm"], cfg.rms_norm_eps)
            out, new_kv = _attention(
                layer, cfg, normed, cos_b, sin_b, mask_b, kv, pos, l_idx, lr,
                lora_scale, lora_onehot, use_flash, dense_q4, cp_mesh,
                page_table, mesh, fresh_causal,
            )
            h = h + out
            ffn_out, z_loss, aux_loss = _moe_ffn(
                layer, cfg, rms_norm(h, layer["ffn_norm"], cfg.rms_norm_eps), training,
                w1, w2, l_idx, lr, lora_scale, moe_mesh,
                lora_onehot=tok_onehot,
            )
            h = h + ffn_out
            if has_cache:
                return (h, zl + z_loss, al + aux_loss, new_kv), None
            return (h, zl + z_loss, al + aux_loss), None

        if remat:
            return jax.checkpoint(body, prevent_cse=False)
        return body

    zero = jnp.zeros((), jnp.float32)
    layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)

    use_pp = (
        mesh is not None
        and "pipe" in mesh.axis_names
        and mesh.shape["pipe"] > 1
        and not has_cache
        and cp_mesh is None
        and dense_q4 is None
        and lora_onehot is None  # multi-adapter selectors are serving-only;
        #                          PP microbatching would split their B axis
        and cfg.num_layers % mesh.shape["pipe"] == 0
    )
    if use_pp:
        # GPipe microbatch pipeline over the `pipe` axis (parallel/pp.py):
        # each stage scans its local L/p layers; LOCAL ids index the
        # pipe-sharded [L]-stacked weights.
        from aria_tpu.parallel.pp import pipeline_layers

        def pp_stage(h, xs_loc, w1_loc, w2_loc, consts):
            xs_l, lora_l = xs_loc
            n_local = jax.tree.leaves(xs_l)[0].shape[0]
            ids = jnp.arange(n_local, dtype=jnp.int32)
            pbody = make_body(w1_loc, w2_loc, None, rope_mask=consts)
            (h, zl, al), _ = jax.lax.scan(pbody, (h, zero, zero), (xs_l, lora_l, ids))
            return h, zl, al

        x, z_loss, aux_loss = pipeline_layers(
            x, (xs_layers, lora_layers), w1_full, w2_full, (cos, sin, mask),
            pp_stage, mesh,
        )
        new_cache = None
    elif has_cache:
        body = make_body(w1_full, w2_full, mesh)
        init = (x, zero, zero, cache)
        (x, z_loss, aux_loss, new_cache), _ = jax.lax.scan(
            body, init, (xs_layers, lora_layers, layer_ids)
        )
    else:
        body = make_body(w1_full, w2_full, mesh)
        (x, z_loss, aux_loss), _ = jax.lax.scan(
            body, (x, zero, zero), (xs_layers, lora_layers, layer_ids)
        )
        new_cache = None

    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    if logit_position is not None:
        # Only the sampled position's logits are needed (prefill): skip the
        # [S, V] matmul for all other positions. A [B]-shaped logit_position
        # selects a (possibly different) position per batch row — the
        # multi-request batched-admission prefill.
        pos = jnp.asarray(logit_position)
        if pos.ndim == 1:
            x = jnp.take_along_axis(x, pos[:, None, None].astype(jnp.int32), axis=1)
        else:
            x = jax.lax.dynamic_slice_in_dim(x, logit_position, 1, axis=1)
    logits = qlinear(x, params["lm_head"], "bsd,dv->bsv")
    return LMOutput(logits, new_cache, z_loss, aux_loss)
