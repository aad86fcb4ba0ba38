"""Checkpoint I/O: Orbax-sharded native checkpoints + HF safetensors import.

The importer implements the reference's rename/fuse map
(gptfast/scripts/convert_hf_checkpoint.py:90-162) directly into this
framework's param tree:

- q/k/v are *permuted* from HF Llama's half-rotation RoPE layout to the
  interleaved-pair layout used here (convert_hf_checkpoint.py:110-116), then
  fused with v into one ``wqkv`` ([in, out] orientation).
- expert fc1 [E, D, 2I] is transposed to the out-major [E, 2I, D] layout
  (contiguous per-expert weight tiles for the decode kernel); fc2 stays [E, I, D].
- shared-expert gate/up projections fuse into ``shared_w1`` [D, 2*Is].
- every torch Linear weight is transposed to right-multiply [in, out].
- per-layer tensors are stacked on a leading L axis (lax.scan layout).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from aria_tpu.config import AriaConfig, config_from_json, config_to_json

# ---------------------------------------------------------------- orbax

def save_checkpoint(path: str, params: Any, cfg: Optional[AriaConfig] = None, step: int = 0) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, f"step_{step}"), params)
    ckptr.wait_until_finished()
    if cfg is not None:
        with open(os.path.join(path, "config.json"), "w") as f:
            f.write(config_to_json(cfg))


def load_checkpoint(path: str, step: int = 0, target: Any = None) -> tuple[Any, Optional[AriaConfig]]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    params = ckptr.restore(os.path.join(path, f"step_{step}"), target)
    cfg = None
    cfg_file = os.path.join(path, "config.json")
    if os.path.exists(cfg_file):
        with open(cfg_file) as f:
            cfg = config_from_json(f.read())
    return params, cfg


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = [
        int(d.split("_", 1)[1])
        for d in os.listdir(path)
        if d.startswith("step_") and d.split("_", 1)[1].isdigit()
    ]
    return max(steps) if steps else None


# ---------------------------------------------------------------- HF import

def _interleave_permute(w: np.ndarray, n_head: int, head_dim: int) -> np.ndarray:
    """HF half-rotation layout -> interleaved-pair layout.

    w: [n_head*head_dim, in_dim] (torch orientation). Equivalent to
    convert_hf_checkpoint.py:110-116's view/transpose/reshape.
    """
    in_dim = w.shape[1]
    return (
        w.reshape(n_head, 2, head_dim // 2, in_dim)
        .transpose(0, 2, 1, 3)
        .reshape(n_head * head_dim, in_dim)
    )


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all *.safetensors in a directory into one dict of numpy arrays."""
    from safetensors import safe_open

    merged: Dict[str, np.ndarray] = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no .safetensors files in {path}")
    for fname in files:
        with safe_open(os.path.join(path, fname), framework="np") as f:
            for k in f.keys():
                merged[k] = f.get_tensor(k)
    return merged


def import_hf_state_dict(sd: Dict[str, np.ndarray], cfg: AriaConfig, dtype=jnp.bfloat16) -> dict:
    """HF Aria state dict (numpy) -> this framework's param tree."""
    tc, vc, pc = cfg.text, cfg.vision, cfg.projector

    def get(name):
        return np.asarray(sd[name])

    def as_jnp(x, d=dtype):
        return jnp.asarray(x).astype(d)

    # ---- language model
    L = tc.num_layers
    lm_prefix = "language_model.model.layers.{}."

    def stack_lm(suffix, fn=lambda x: x):
        return as_jnp(np.stack([fn(get(lm_prefix.format(i) + suffix)) for i in range(L)]))

    def qkv_fuse(i):
        p = lm_prefix.format(i)
        q = _interleave_permute(get(p + "self_attn.q_proj.weight"), tc.num_heads, tc.head_dim)
        k = _interleave_permute(get(p + "self_attn.k_proj.weight"), tc.num_kv_heads, tc.head_dim)
        v = get(p + "self_attn.v_proj.weight")
        return np.concatenate([q, k, v], axis=0).T  # -> [in, out]

    def shared_fuse(i):
        p = lm_prefix.format(i)
        gate = get(p + "mlp.shared_experts.gate_proj.weight")
        up = get(p + "mlp.shared_experts.up_proj.weight")
        return np.concatenate([gate, up], axis=0).T  # [D, 2*Is]

    lm = {
        "embed": as_jnp(get("language_model.model.embed_tokens.weight")),
        "layers": {
            "attn_norm": stack_lm("input_layernorm.weight"),
            "ffn_norm": stack_lm("post_attention_layernorm.weight"),
            "wqkv": as_jnp(np.stack([qkv_fuse(i) for i in range(L)])),
            "wo": stack_lm("self_attn.o_proj.weight", lambda w: w.T),
            "gate": as_jnp(
                np.stack([get(lm_prefix.format(i) + "mlp.router.weight") for i in range(L)]),
                jnp.float32,
            ),
            "w1": stack_lm("mlp.experts.fc1.weight", lambda w: w.transpose(0, 2, 1)),  # -> [E, 2I, D]
            "w2": stack_lm("mlp.experts.fc2.weight"),  # [E, I, D] already
            "shared_w1": as_jnp(np.stack([shared_fuse(i) for i in range(L)])),
            "shared_w2": stack_lm("mlp.shared_experts.down_proj.weight", lambda w: w.T),
        },
        "final_norm": as_jnp(get("language_model.model.norm.weight")),
        "lm_head": as_jnp(get("language_model.lm_head.weight").T),
    }

    # ---- vision tower
    vt = "vision_tower.vision_model."
    Lv = vc.num_layers

    def stack_v(suffix, fn=lambda x: x):
        return as_jnp(
            np.stack([fn(get(f"{vt}encoder.layers.{i}.{suffix}")) for i in range(Lv)])
        )

    vision = {
        "patch_embed_w": as_jnp(get(vt + "embeddings.patch_embedding.weight").reshape(vc.hidden_size, -1).T),
        "patch_embed_b": as_jnp(get(vt + "embeddings.patch_embedding.bias")),
        "pos_embed": as_jnp(get(vt + "embeddings.position_embedding.weight")),
        "layers": {
            "ln1_w": stack_v("layer_norm1.weight"),
            "ln1_b": stack_v("layer_norm1.bias"),
            "ln2_w": stack_v("layer_norm2.weight"),
            "ln2_b": stack_v("layer_norm2.bias"),
            "wq": stack_v("self_attn.q_proj.weight", lambda w: w.T),
            "bq": stack_v("self_attn.q_proj.bias"),
            "wk": stack_v("self_attn.k_proj.weight", lambda w: w.T),
            "bk": stack_v("self_attn.k_proj.bias"),
            "wv": stack_v("self_attn.v_proj.weight", lambda w: w.T),
            "bv": stack_v("self_attn.v_proj.bias"),
            "wo": stack_v("self_attn.out_proj.weight", lambda w: w.T),
            "bo": stack_v("self_attn.out_proj.bias"),
            "fc1_w": stack_v("mlp.fc1.weight", lambda w: w.T),
            "fc1_b": stack_v("mlp.fc1.bias"),
            "fc2_w": stack_v("mlp.fc2.weight", lambda w: w.T),
            "fc2_b": stack_v("mlp.fc2.bias"),
        },
    }

    # ---- projector
    mp = "multi_modal_projector."
    projector = {
        "query": as_jnp(get(mp + "query")),
        "ln_q_w": as_jnp(get(mp + "cross_attn.layer_norm.weight")),
        "ln_q_b": as_jnp(get(mp + "cross_attn.layer_norm.bias")),
        "ln_kv_w": as_jnp(get(mp + "cross_attn.ln_kv.weight")),
        "ln_kv_b": as_jnp(get(mp + "cross_attn.ln_kv.bias")),
        "q_proj": as_jnp(get(mp + "cross_attn.q_proj.weight").T),
        "k_proj": as_jnp(get(mp + "cross_attn.k_proj.weight").T),
        "v_proj": as_jnp(get(mp + "cross_attn.v_proj.weight").T),
        "attn_in_w": as_jnp(get(mp + "cross_attn.multihead_attn.in_proj_weight").T),
        "attn_in_b": as_jnp(get(mp + "cross_attn.multihead_attn.in_proj_bias")),
        "attn_out_w": as_jnp(get(mp + "cross_attn.multihead_attn.out_proj.weight").T),
        "attn_out_b": as_jnp(get(mp + "cross_attn.multihead_attn.out_proj.bias")),
        "linear_w": as_jnp(get(mp + "cross_attn.linear.weight").T),
        "linear_b": as_jnp(get(mp + "cross_attn.linear.bias")),
        "ln_ffn_w": as_jnp(get(mp + "ln_ffn.weight")),
        "ln_ffn_b": as_jnp(get(mp + "ln_ffn.bias")),
        "ffn_in": as_jnp(get(mp + "ffn.linear_in.weight").T),
        "ffn_out": as_jnp(get(mp + "ffn.linear_out.weight").T),
    }

    return {"vision": vision, "projector": projector, "lm": lm}


def import_hf_checkpoint(path: str, cfg: AriaConfig, dtype=jnp.bfloat16) -> dict:
    return import_hf_state_dict(load_safetensors_dir(path), cfg, dtype)
