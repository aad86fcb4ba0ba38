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
    scale = jnp.maximum(amax / 127.0, 1e-12)
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

    if quant:
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


def dequantize_expert_weights(w1, w2, dtype=jnp.bfloat16):
    """Materialize fp expert weights for the XLA (non-kernel) paths."""
    w1d = dequantize_weight(w1, input_axis=-1, dtype=dtype) if is_quantized(w1) else w1
    w2d = dequantize_weight(w2, input_axis=-2, dtype=dtype) if is_quantized(w2) else w2
    return w1d, w2d
