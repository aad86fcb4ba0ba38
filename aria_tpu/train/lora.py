"""LoRA adapters, including per-expert (grouped) LoRA for the MoE weights.

Parity target: reference aria/lora/ — PEFT LoRA plus ``GroupedGemmLoraLayer``
(lora/layers.py:30-224), whose lora_A/lora_B are *per-expert* 3-D factors fed
through the grouped GEMM. Here adapters are a separate pytree mirroring the
stacked-layer structure:

    lora["lm"]["layers"]["wqkv"] = {"a": [L, D, r], "b": [L, r, out]}
    lora["lm"]["layers"]["w1"]   = {"a": [L, E, D, r], "b": [L, r, 2I, ...]}

Since the expert GLU is nonlinear, expert LoRA deltas are applied inside the
expert computation (fc1 pre-GLU, fc2 post-GLU), exactly like the reference's
layer (lora/layers.py:108-152). ``merge_lora`` folds adapters into the base
weights for serving (reference merge semantics, lora/layers.py:154-224).

Target-module selection honoring freeze flags mirrors
aria/lora/utils.py:29-63.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import Array

from aria_tpu.config import AriaConfig

# weight name -> (input-dim picker, output-dim picker) on the LM layer stack
_LM_TARGETS = ("wqkv", "wo", "w1", "w2", "shared_w1", "shared_w2")


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    rank: int = 8
    alpha: float = 16.0
    dropout: float = 0.0  # reserved; reference defaults to 0 in recipes
    target_modules: tuple[str, ...] = _LM_TARGETS
    freeze_vit: bool = True
    freeze_projector: bool = True
    freeze_llm: bool = False

    @property
    def scale(self) -> float:
        return self.alpha / self.rank


def get_lora_target_modules(
    cfg: LoraConfig,
) -> tuple[str, ...]:
    """Modules to adapt, honoring freeze flags (reference lora/utils.py:29-63).

    The reference targets the LLM's linear + grouped-GEMM weights unless
    freeze_llm; ViT/projector adapters are out of scope there too (always
    frozen or fully trained)."""
    if cfg.freeze_llm:
        return ()
    return tuple(m for m in cfg.target_modules if m in _LM_TARGETS)


def init_lora_params(
    rng: jax.Array, cfg: AriaConfig, lc: LoraConfig, dtype=jnp.float32
) -> Dict[str, Any]:
    """A is kaiming-ish random, B is zero (standard LoRA init: delta starts 0)."""
    tc = cfg.text
    L, D, E = tc.num_layers, tc.hidden_size, tc.num_experts
    I, Is, r = tc.moe_intermediate_size, tc.shared_intermediate_size, lc.rank
    qkv_out = (tc.num_heads + 2 * tc.num_kv_heads) * tc.head_dim

    shapes = {
        "wqkv": ((L, D, r), (L, r, qkv_out)),
        "wo": ((L, tc.q_size, r), (L, r, D)),
        # per-expert factors (grouped LoRA, reference lora/layers.py:87-92);
        # note base w1 is out-major [E, 2I, D]: delta is x @ a @ b with
        # a [E, D, r], b [E, r, 2I] -> matches fc1's [in=D -> out=2I] map.
        "w1": ((L, E, D, r), (L, E, r, 2 * I)),
        "w2": ((L, E, I, r), (L, E, r, D)),
        "shared_w1": ((L, D, r), (L, r, 2 * Is)),
        "shared_w2": ((L, Is, r), (L, r, D)),
    }
    keys = jax.random.split(rng, len(shapes))
    out: Dict[str, Any] = {}
    for key, name in zip(keys, get_lora_target_modules(lc)):
        a_shape, b_shape = shapes[name]
        fan_in = a_shape[-2]
        out[name] = {
            "a": (jax.random.normal(key, a_shape, jnp.float32) * (fan_in**-0.5)).astype(dtype),
            "b": jnp.zeros(b_shape, dtype),
        }
    return {"lm": {"layers": out}}


def dense_delta(x: Array, ab: Dict[str, Array], scale: float) -> Array:
    """x @ a @ b * scale for dense (non-expert) adapters; a/b have no L axis
    here (the scan slices it off). Works for any leading dims."""
    h = jnp.einsum("...d,dr->...r", x, ab["a"])
    return scale * jnp.einsum("...r,rf->...f", h, ab["b"]).astype(x.dtype)


def expert_delta(buf: Array, ab: Dict[str, Array], scale: float) -> Array:
    """Per-expert LoRA on a dispatched [E, C, d_in] buffer -> [E, C, d_out]."""
    h = jnp.einsum("ecd,edr->ecr", buf, ab["a"])
    return scale * jnp.einsum("ecr,erf->ecf", h, ab["b"]).astype(buf.dtype)


def merge_lora(params: Dict[str, Any], lora: Dict[str, Any], lc: LoraConfig) -> Dict[str, Any]:
    """Fold adapters into base weights (reference lora/layers.py:154-224).

    Base layouts: wqkv/wo/shared_* are [L, in, out] -> delta = a @ b.
    w1 is out-major [L, E, 2I, D] -> delta = (a @ b) transposed on the last
    two axes. w2 is [L, E, I, D] (in-major) -> delta = a @ b directly.
    """
    merged = jax.tree.map(lambda x: x, params)  # shallow-ish copy
    layers = dict(merged["lm"]["layers"])
    for name, ab in lora["lm"]["layers"].items():
        base = layers[name]
        if name == "w1":
            delta = jnp.einsum("ledr,lerf->lefd", ab["a"], ab["b"])  # -> [L,E,2I,D]
        elif name == "w2":
            delta = jnp.einsum("ledr,lerf->ledf", ab["a"], ab["b"])
        else:
            delta = jnp.einsum("ldr,lrf->ldf", ab["a"], ab["b"])
        layers[name] = (base.astype(jnp.float32) + lc.scale * delta.astype(jnp.float32)).astype(base.dtype)
    merged["lm"] = {**merged["lm"], "layers": layers}
    return merged
