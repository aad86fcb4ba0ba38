"""Int8 weight-only quantization for serving.

Equivalent capability to the reference's gptfast int8 path (weight-only,
symmetric per-output-channel scales): ``y = (x @ w_q) * s``. On TPU the int8
weights halve HBM traffic — the decode bottleneck — and XLA fuses the
int8->bf16 convert into the matmul; the Pallas decode-MoE kernel streams int8
tiles directly.

A quantized weight is the pytree ``{"q": int8, "s": f32 [..., out]}``; expert
weights additionally carry ``"s8"``, the scale broadcast to a sublane-tileable
``[..., 8, out]`` shape the Pallas kernel can block. ``linear()`` is the
universal matmul entry point accepting plain or quantized weights.
"""

from __future__ import annotations

from typing import Any, Union

import jax
import jax.numpy as jnp
from jax import Array

QuantWeight = dict

# LM weights worth quantizing (big, bandwidth-bound). Norms/gate/embed stay fp.
LM_QUANT_KEYS = ("wqkv", "wo", "w1", "w2", "shared_w1", "shared_w2")


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q" in w and "s" in w


def quantize_weight(w: Array, input_axis: int = -2) -> QuantWeight:
    """Symmetric per-output-channel int8: amax over the *input* axis."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=input_axis, keepdims=True)
    # explicit reciprocal multiply: XLA rewrites div-by-constant to
    # mul-by-reciprocal under jit, so the div form gives 1-ulp-different
    # scales eager vs jitted — this form is bit-identical in both
    scale = jnp.maximum(amax * (1.0 / 127.0), 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": jnp.squeeze(scale, input_axis).astype(jnp.float32)}


def dequantize_weight(w: QuantWeight, input_axis: int = -2, dtype=jnp.bfloat16) -> Array:
    s = jnp.expand_dims(w["s"], input_axis)
    return (w["q"].astype(jnp.float32) * s).astype(dtype)


def linear(x: Array, w: Union[Array, QuantWeight], spec: str) -> Array:
    """einsum(spec, x, w) with fp32 accumulation; handles quantized weights
    whose scale runs over the spec's last output axis."""
    if is_quantized(w):
        y = jnp.einsum(spec, x, w["q"].astype(x.dtype), preferred_element_type=jnp.float32)
        return y * w["s"]
    return jnp.einsum(spec, x, w, preferred_element_type=jnp.float32)


def _with_s8(qw: QuantWeight) -> QuantWeight:
    """Attach the kernel-tileable broadcast scale: [..., out] -> [..., 8, out]."""
    s8 = jnp.broadcast_to(
        qw["s"][..., None, :], qw["s"].shape[:-1] + (8, qw["s"].shape[-1])
    )
    return {**qw, "s8": jnp.array(s8)}


def fuse_shared_experts(params: dict, num_shared: int = 2) -> dict:
    """Serving-time transform: append the shared experts to the routed expert
    stacks as always-on "virtual experts".

    The shared MLP's GLU is elementwise over its intermediate axis, so it
    decomposes exactly into ``num_shared`` expert-shaped pieces:
    silu(x@G)*(x@U) @ W2 = sum_j silu(x@G_j)*(x@U_j) @ W2_j. The decode
    kernel then serves routed + shared experts in one fused pass (every token
    gets ``num_shared`` extra fixed slots with combine weight 1).

    Returns new params with w1 [L, E+ns, 2I, D], w2 [L, E+ns, I, D] and the
    shared_w1/shared_w2 entries removed. Apply BEFORE quantize_params.
    """
    lm = params["lm"]
    layers = dict(lm["layers"])
    w1, w2 = layers["w1"], layers["w2"]
    quant = is_quantized(w1)
    int4 = is_quantized_int4(w1)
    if int4:
        L, E, I2, Dp = w1["q4"].shape
        D = 2 * Dp
    else:
        L, E, I2, D = (w1["q"] if quant else w1).shape
    I = I2 // 2
    sw1, sw2 = layers.pop("shared_w1"), layers.pop("shared_w2")  # [L,D,2Is], [L,Is,D]
    if is_quantized(sw1):
        sw1 = dequantize_weight(sw1, input_axis=-2)
        sw2 = dequantize_weight(sw2, input_axis=-2)
    Is = sw2.shape[1]
    assert Is == num_shared * I, (Is, num_shared, I)

    gate = sw1[:, :, :Is]  # [L, D, Is]
    up = sw1[:, :, Is:]
    # virtual expert j: rows j*I:(j+1)*I of the intermediate axis
    g = gate.reshape(L, D, num_shared, I).transpose(0, 2, 3, 1)  # [L,ns,I,D]
    u = up.reshape(L, D, num_shared, I).transpose(0, 2, 3, 1)
    v_w1 = jnp.concatenate([g, u], axis=2)  # [L, ns, 2I, D] out-major
    v_w2 = sw2.reshape(L, num_shared, I, D)

    if int4:
        qv1, qv2 = quantize_expert_int4(v_w1, v_w2)
        layers["w1"] = {k: jnp.concatenate([w1[k], qv1[k]], axis=1) for k in w1}
        layers["w2"] = {k: jnp.concatenate([w2[k], qv2[k]], axis=1) for k in w2}
    elif quant:
        qv1 = _with_s8(quantize_weight(v_w1, input_axis=-1))
        qv2 = _with_s8(quantize_weight(v_w2, input_axis=-2))
        layers["w1"] = {k: jnp.concatenate([w1[k], qv1[k]], axis=1) for k in w1}
        layers["w2"] = {k: jnp.concatenate([w2[k], qv2[k]], axis=1) for k in w2}
    else:
        layers["w1"] = jnp.concatenate([w1, v_w1.astype(w1.dtype)], axis=1)
        layers["w2"] = jnp.concatenate([w2, v_w2.astype(w2.dtype)], axis=1)
    out = dict(params)
    out["lm"] = {**lm, "layers": layers}
    return out


def quantize_lm_params(lm_params: dict) -> dict:
    """Quantize the decoder's large weights.

    w1 is out-major [L, E, 2I, D] (input = last axis, scale over 2I rows);
    everything else is [..., in, out]."""
    layers = dict(lm_params["layers"])
    for key in LM_QUANT_KEYS:
        if key not in layers:
            continue  # shared_w1/w2 absent after fuse_shared_experts
        if key == "w1":
            layers[key] = _with_s8(quantize_weight(layers[key], input_axis=-1))
        elif key == "w2":
            layers[key] = _with_s8(quantize_weight(layers[key], input_axis=-2))
        else:
            layers[key] = quantize_weight(layers[key], input_axis=-2)
    out = dict(lm_params)
    out["layers"] = layers
    out["lm_head"] = quantize_weight(lm_params["lm_head"], input_axis=-2)
    return out


def quantize_params(params: dict) -> dict:
    """Quantize the LM (the ViT/projector are small; they stay bf16)."""
    out = dict(params)
    out["lm"] = quantize_lm_params(params["lm"])
    return out


VIT_QUANT_KEYS = ("wq", "wk", "wv", "wo", "fc1_w", "fc2_w")
PROJECTOR_QUANT_KEYS = (
    "q_proj", "k_proj", "v_proj", "attn_out_w", "linear_w", "ffn_in", "ffn_out",
)


def quantize_vit_params(vit_params: dict) -> dict:
    """int8 vision tower (weights are [L, in, out]; scale over out). Frees
    ~400MB next to the full int4 LM — the difference between the image
    prompt fitting on one chip or not."""
    out = dict(vit_params)
    out["patch_embed_w"] = quantize_weight(vit_params["patch_embed_w"], input_axis=-2)
    layers = dict(vit_params["layers"])
    for key in VIT_QUANT_KEYS:
        layers[key] = quantize_weight(layers[key], input_axis=-2)
    out["layers"] = layers
    return out


def quantize_projector_params(proj_params: dict) -> dict:
    """int8 projector (attn_in_w stays fp: it is column-sliced into the three
    packed MultiheadAttention projections before use)."""
    out = dict(proj_params)
    for key in PROJECTOR_QUANT_KEYS:
        out[key] = quantize_weight(proj_params[key], input_axis=-2)
    return out


def dequantize_expert_weights(w1, w2, dtype=jnp.bfloat16):
    """Materialize fp expert weights for the XLA (non-kernel) paths."""
    if is_quantized_int4(w1):
        return dequantize_w1_int4(w1, dtype), dequantize_w2_int4(w2, dtype)
    w1d = dequantize_weight(w1, input_axis=-1, dtype=dtype) if is_quantized(w1) else w1
    w2d = dequantize_weight(w2, input_axis=-2, dtype=dtype) if is_quantized(w2) else w2
    return w1d, w2d


# --------------------------------------------------------------------- int4
#
# Weight-only int4 for the expert stacks — the capacity play that fits the
# FULL 25.3B/64-expert model in one v5e's 16GB HBM (the reference's whole-
# model-on-one-accelerator headline, README.md:41, needs 80GB at bf16).
#
# Format (all shapes carry the leading [L, E]):
#   w1: {"q4": int8 [L, E, 2I, D/2], "sg": f32 [L, E, 8, 2I]}
#       - 4-bit values packed two-per-byte with WITHIN-GROUP pairing: the D
#         axis is split into `ng` groups of `gs` columns; inside each group,
#         column j rides the low nibble and column j+gs/2 the high nibble of
#         packed column j. A kernel that loads any 128-aligned slice of
#         packed group columns can therefore unpack it locally (one shift
#         pair + lane concat), and groups stay contiguous.
#       - sg rows 0..ng-1 hold the per-(D-group, output-row) scales
#         (amax/7 over the group); rows ng..7 are padding so the scale
#         block obeys the (8, 128) tile rule at no extra memory vs the int8
#         path's broadcast "s8".
#   w2: {"q4": int8 [L, E, I, D/2], "s8": f32 [L, E, 8, D]}
#       - packed over the OUTPUT axis D with whole-row pairing (column j
#         pairs with j+D/2): consumers always load full rows, so unpacking
#         is one shift pair + one concat.
#       - scales are rank-1 factorized: |w2| ~= r[i] * c[d]. The column
#         factor c/7 is stored broadcast as "s8" and applied post-matmul;
#         the row factor r is FOLDED into w1's up-half scales (h = silu(g) *
#         up enters w2 multiplicatively, so scaling up by r and w2 by 1/r is
#         exact). Per-element rank-1 scales at zero runtime cost.

INT4_GROUP_LANES = 256  # packed group slice must be a 128-lane multiple


def int4_group_count(D: int) -> int:
    """Largest ng in 1..8 with D % ng == 0 and (D//ng) % 256 == 0 (so the
    packed half-group is 128-lane aligned); falls back to 1."""
    for ng in range(8, 1, -1):
        if D % ng == 0 and (D // ng) % INT4_GROUP_LANES == 0:
            return ng
    return 1


def is_quantized_int4(w: Any) -> bool:
    return isinstance(w, dict) and "q4" in w


def pack_int4(q: Array, group: int) -> Array:
    """Pack int4 values (int8 storage, range [-8, 7]) two-per-byte with
    within-group pairing along the last axis.

    BIASED-LO layout: byte B = (lo + 8) | (hi << 4), i.e. B = 16*hi + (lo+8)
    in exact int8 arithmetic. The payoff is a pure-linear unpack identity the
    kernels exploit to do the unpacking on the MXU instead of the VPU:

        hi = B >> 4 (arithmetic)     lo = B - 16*hi - 8
        xa @ lo + xb @ hi = xa @ B + (xb - 16*xa) @ hi - 8*sum(xa)

    one dot with the RAW bytes, one dot with `hi` (a single shift chain over
    half the unpacked elements), and a scalar row-sum correction."""
    *lead, A = q.shape
    assert A % group == 0 and group % 2 == 0, (A, group)
    qr = q.reshape(*lead, A // group, 2, group // 2)
    lo = (qr[..., 0, :] + 8) & 0xF
    hi = qr[..., 1, :] << 4  # int8 wrap is the desired low byte
    return (lo | hi).astype(jnp.int8).reshape(*lead, A // 2)


def unpack_int4(p: Array, group: int, dtype=jnp.bfloat16) -> Array:
    """Inverse of pack_int4 (int8 arithmetic, no int32 temps)."""
    *lead, Ap = p.shape
    gp = group // 2
    pr = p.reshape(*lead, Ap // gp, gp)
    lo = ((pr & 0xF) - 8).astype(dtype)  # remove the +8 storage bias
    hi = (pr >> 4).astype(dtype)  # arithmetic shift sign-extends
    return jnp.stack([lo, hi], axis=-2).reshape(*lead, 2 * Ap)


def quantize_expert_int4(w1: Array, w2: Array) -> tuple:
    """Quantize one (or a stack of) expert weight pair(s) to the int4 format.

    w1: [..., 2I, D] out-major; w2: [..., I, D]. Returns (w1_dict, w2_dict).
    """
    *lead, R, D = w1.shape
    I = R // 2
    ng = int4_group_count(D)
    gs = D // ng

    w1f = w1.astype(jnp.float32).reshape(*lead, R, ng, gs)
    amax1 = jnp.max(jnp.abs(w1f), axis=-1)  # [..., R, ng]
    sg = jnp.maximum(amax1 * (1.0 / 7.0), 1e-8)  # mul form: jit/eager bit-identical
    q1 = jnp.clip(jnp.round(w1f / sg[..., None]), -8, 7).astype(jnp.int8)
    q1 = q1.reshape(*lead, R, D)

    # rank-1 scale fit for w2: r per input row (amax over D), c per output col
    w2f = w2.astype(jnp.float32)
    a2 = jnp.abs(w2f)
    r = jnp.maximum(jnp.max(a2, axis=-1), 1e-8)  # [..., I]
    c = jnp.maximum(jnp.max(a2 / r[..., None], axis=-2), 1e-8)  # [..., D]
    s2_elem = r[..., :, None] * c[..., None, :] * (1.0 / 7.0)
    q2 = jnp.clip(jnp.round(w2f / s2_elem), -8, 7).astype(jnp.int8)

    # fold r into the up-half group scales: dequant(w1_up) = up * r per row
    sg = sg.at[..., I:, :].multiply(r[..., None])

    def _pad8(s):  # [..., R, ng] -> [..., 8, R] rows 0..ng-1 = groups
        s = jnp.swapaxes(s, -1, -2)  # [..., ng, R]
        pad = [(0, 0)] * (s.ndim - 2) + [(0, 8 - ng), (0, 0)]
        return jnp.pad(s, pad)

    # bf16 scales: ~0.4% scale error on top of the 4-bit weight noise, half
    # the scale-buffer HBM (the full model needs every 100MB)
    w1_dict = {"q4": pack_int4(q1, gs), "sg": _pad8(sg).astype(jnp.bfloat16)}
    c8 = jnp.broadcast_to((c * (1.0 / 7.0))[..., None, :], c.shape[:-1] + (8, D))
    w2_dict = {"q4": pack_int4(q2, D), "s8": jnp.array(c8, jnp.bfloat16)}
    return w1_dict, w2_dict


def _deq_compute_dtype(dtype):
    # int4 values (<= +-7) are exact in bf16 and the scales are STORED bf16,
    # so a bf16 unpack-and-scale rounds once from exact operands — identical
    # to computing in f32 then casting, at half the intermediate HBM (the
    # f32 temps are ~2GB per flagship layer).
    return dtype if dtype == jnp.bfloat16 else jnp.float32


def dequantize_w1_int4(w1: dict, dtype=jnp.bfloat16) -> Array:
    q4, sg = w1["q4"], w1["sg"]
    *lead, R, Dp = q4.shape
    D = 2 * Dp
    ng = int4_group_count(D)
    gs = D // ng
    cd = _deq_compute_dtype(dtype)
    vals = unpack_int4(q4, gs, cd).reshape(*lead, R, ng, gs)
    s = jnp.swapaxes(sg[..., :ng, :], -1, -2)  # [..., R, ng]
    return (vals * s[..., None].astype(cd)).reshape(*lead, R, D).astype(dtype)


def dequantize_w2_int4(w2: dict, dtype=jnp.bfloat16) -> Array:
    q4, s8 = w2["q4"], w2["s8"]
    *lead, I, Dp = q4.shape
    D = 2 * Dp
    cd = _deq_compute_dtype(dtype)
    vals = unpack_int4(q4, D, cd)
    return (vals * s8[..., 0:1, :].astype(cd)).astype(dtype)


def quantize_lm_params_int4(lm_params: dict) -> dict:
    """Serving transform: expert stacks -> int4, other large weights -> int8,
    embed -> int8 (dequantized per lookup). Apply AFTER fuse_shared_experts
    (or before; fuse handles both formats)."""
    from aria_tpu.ops.dense_int4 import quantize_dense_int4

    layers = dict(lm_params["layers"])
    for key in ("wqkv", "wo"):
        layers[key] = quantize_dense_int4(layers[key])
    for key in ("shared_w1", "shared_w2"):
        if key in layers:
            layers[key] = quantize_weight(layers[key], input_axis=-2)
    layers["w1"], layers["w2"] = quantize_expert_int4(layers["w1"], layers["w2"])
    out = dict(lm_params)
    out["layers"] = layers
    out["embed"] = quantize_weight(lm_params["embed"], input_axis=-2)
    out["lm_head"] = quantize_weight(lm_params["lm_head"], input_axis=-2)
    return out
