"""Device mesh and axis conventions.

Replaces the reference's accelerate+DeepSpeed/NCCL distribution (SURVEY.md
§2.2) with GSPMD: one logical mesh whose axes are

- ``data``    : pure data parallelism (batch), DCN-friendly across slices
- ``fsdp``    : ZeRO-3-like fully-sharded parameters/optimizer state
- ``expert``  : expert parallelism over the 64-expert tensors
- ``model``   : Megatron-style tensor parallelism (heads / ffn hidden)
- ``context`` : sequence/context parallelism for 64K attention
- ``pipe``    : GPipe-style pipeline stages over the layer stack

All collectives are compiled by XLA from sharding annotations — there is no
NCCL-style runtime API to call.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXES = ("data", "fsdp", "expert", "model", "context", "pipe")


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    data: int = 1
    fsdp: int = 1
    expert: int = 1
    model: int = 1
    context: int = 1
    pipe: int = 1

    @property
    def shape(self) -> tuple[int, ...]:
        return (self.data, self.fsdp, self.expert, self.model, self.context, self.pipe)

    @property
    def num_devices(self) -> int:
        return int(np.prod(self.shape))


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = cfg.num_devices
    if len(devices) < n:
        raise ValueError(f"Mesh {cfg.shape} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(cfg.shape)
    return Mesh(dev_array, AXES)


def single_device_mesh() -> Mesh:
    return make_mesh(MeshConfig())


def lm_param_specs() -> dict:
    """PartitionSpecs for the LM param tree (layers have a leading L axis).

    Expert weights shard over ``expert``; attention/ffn hidden over ``model``;
    everything additionally shards over ``fsdp`` on a non-contracting axis.
    """
    return {
        "embed": P("model", "fsdp"),
        "layers": {
            "attn_norm": P("pipe", None),
            "ffn_norm": P("pipe", None),
            "wqkv": P("pipe", "fsdp", "model"),
            "wo": P("pipe", "model", "fsdp"),
            "gate": P("pipe", None, "fsdp"),
            "w1": P("pipe", "expert", "model", "fsdp"),
            "w2": P("pipe", "expert", "model", "fsdp"),
            "shared_w1": P("pipe", "fsdp", "model"),
            "shared_w2": P("pipe", "model", "fsdp"),
        },
        "final_norm": P(None),
        "lm_head": P("fsdp", "model"),
    }


def vit_param_specs() -> dict:
    return {
        "patch_embed_w": P(None, "fsdp"),
        "patch_embed_b": P(None),
        "pos_embed": P(None, "fsdp"),
        "layers": {
            "ln1_w": P(None, None),
            "ln1_b": P(None, None),
            "ln2_w": P(None, None),
            "ln2_b": P(None, None),
            "wq": P(None, "fsdp", "model"),
            "bq": P(None, "model"),
            "wk": P(None, "fsdp", "model"),
            "bk": P(None, "model"),
            "wv": P(None, "fsdp", "model"),
            "bv": P(None, "model"),
            "wo": P(None, "model", "fsdp"),
            "bo": P(None, None),
            "fc1_w": P(None, "fsdp", "model"),
            "fc1_b": P(None, "model"),
            "fc2_w": P(None, "model", "fsdp"),
            "fc2_b": P(None, None),
        },
    }


def projector_param_specs() -> dict:
    return {
        "query": P(None, "fsdp"),
        "ln_q_w": P(None),
        "ln_q_b": P(None),
        "ln_kv_w": P(None),
        "ln_kv_b": P(None),
        "q_proj": P("fsdp", "model"),
        "k_proj": P("fsdp", "model"),
        "v_proj": P("fsdp", "model"),
        "attn_in_w": P("fsdp", "model"),
        "attn_in_b": P("model"),
        "attn_out_w": P("model", "fsdp"),
        "attn_out_b": P(None),
        "linear_w": P("fsdp", "model"),
        "linear_b": P("model"),
        "ln_ffn_w": P(None),
        "ln_ffn_b": P(None),
        "ffn_in": P("fsdp", "model"),
        "ffn_out": P("model", "fsdp"),
    }


def aria_param_specs() -> dict:
    return {
        "vision": vit_param_specs(),
        "projector": projector_param_specs(),
        "lm": lm_param_specs(),
    }


def serving_param_specs(params: dict) -> dict:
    """Spec tree for the quantized serving form (int4/int8 dict-valued
    leaves, see models/moe_lm.py::init_lm_params_serving_int4).

    The bf16 ``aria_param_specs`` tree cannot map onto the quantized
    structure, and TP-style hidden-dim sharding would split int4 nibble
    packs/scale groups across devices. Instead the dominant component — the
    expert stacks (11.8GB of 13.3GB at flagship scale) — shards per-leaf
    over ``expert`` (dim 1 of every ``[L, E, ...]`` leaf, the layout the
    full-stack EP decode path consumes), and everything else replicates:
    with E experts over n chips, per-chip HBM drops to ~E/n stacks + ~1.5GB
    of replicated attention/embed weights."""
    def rep(t):
        return jax.tree.map(lambda _: P(), t)

    out = {}
    for k, v in params.items():
        if k == "lm":
            out[k] = serving_param_specs(v)
        elif k == "layers":
            out[k] = {
                k2: (jax.tree.map(lambda _: P(None, "expert"), v2)
                     if k2 in ("w1", "w2") else rep(v2))
                for k2, v2 in v.items()
            }
        else:
            out[k] = rep(v)
    return out


def is_serving_quantized(params: dict) -> bool:
    """True when the LM tree is in quantized serving form (dict leaves)."""
    lm = params.get("lm", params)
    layers = lm.get("layers", {})
    return isinstance(layers.get("w1"), dict) or isinstance(layers.get("wqkv"), dict)


def _align_specs(tree, specs):
    """Expand a P spec that sits over a QUANTIZED leaf group ({"q"/"q4",
    scales...}) into per-leaf specs: the main tensor keeps the spec when its
    rank matches, lower-rank scale planes replicate. Lets bf16 spec trees
    (aria_param_specs) apply to int8-quantized bases (QLoRA's frozen base)."""
    if isinstance(specs, P):
        if isinstance(tree, dict):
            return {
                k: (specs if getattr(v, "ndim", None) == len(specs) else P())
                for k, v in tree.items()
            }
        return specs
    if isinstance(specs, dict) and isinstance(tree, dict):
        return {k: _align_specs(tree.get(k), v) for k, v in specs.items()}
    return specs


def shard_tree(tree, specs, mesh: Mesh):
    """Apply NamedShardings from a spec tree to a param tree.

    Under a multi-process runtime (jax.distributed) device_put cannot target
    non-addressable devices, so each leaf is assembled from a host callback:
    every process holds the full host value (the loop init/restore paths
    guarantee this) and contributes its addressable shards' slices.
    """
    specs = _align_specs(tree, specs)
    if jax.process_count() > 1:
        def put(x, s):
            xh = np.asarray(x)
            return jax.make_array_from_callback(
                xh.shape, NamedSharding(mesh, s), lambda idx: xh[idx]
            )
    else:
        def put(x, s):
            return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree.map(put, tree, specs, is_leaf=lambda x: isinstance(x, P))


def batch_spec() -> P:
    """Activations: batch over (data, fsdp), sequence over context."""
    return P(("data", "fsdp"), "context")
