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


def _import_vision(get, vc, dtype) -> dict:
    def as_jnp(x, d=dtype):
        return jnp.asarray(x).astype(d)

    vt = "vision_tower.vision_model."
    Lv = vc.num_layers

    def stack_v(suffix, fn=lambda x: x):
        return as_jnp(
            np.stack([fn(get(f"{vt}encoder.layers.{i}.{suffix}")) for i in range(Lv)])
        )

    return {
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


def _import_projector(get, pc, dtype) -> dict:
    def as_jnp(x, d=dtype):
        return jnp.asarray(x).astype(d)

    mp = "multi_modal_projector."
    return {
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

    return {
        "vision": _import_vision(get, vc, dtype),
        "projector": _import_projector(get, pc, dtype),
        "lm": lm,
    }


def import_hf_checkpoint(path: str, cfg: AriaConfig, dtype=jnp.bfloat16) -> dict:
    return import_hf_state_dict(load_safetensors_dir(path), cfg, dtype)


# ------------------------------------------------- streamed serving import

class SafetensorsDir:
    """Lazy tensor-name -> shard index over a sharded safetensors directory.

    Reads per tensor (or per first-axis slice) on demand — never the whole
    shard — the same mmap discipline as the reference's converter/loader
    (gptfast/scripts/convert_hf_checkpoint.py:90-162, generate.py:187-197).
    Also usable as the ``sd`` mapping of :func:`import_hf_state_dict` for
    models small enough to import unquantized.
    """

    def __init__(self, path: str):
        from safetensors import safe_open

        self._safe_open = safe_open
        self.path = os.path.abspath(path)
        files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
        if not files:
            raise FileNotFoundError(f"no .safetensors files in {path}")
        self.index: Dict[str, str] = {}
        for fname in files:
            with safe_open(os.path.join(path, fname), framework="np") as f:
                for k in f.keys():
                    self.index[k] = fname

    def keys(self):
        return self.index.keys()

    def __contains__(self, name: str) -> bool:
        return name in self.index

    def get(self, name: str) -> np.ndarray:
        with self._safe_open(
            os.path.join(self.path, self.index[name]), framework="np"
        ) as f:
            return f.get_tensor(name)

    __getitem__ = get

    def get_slice(self, name: str, lo: int, hi: int) -> np.ndarray:
        """First-axis slice [lo:hi] without reading the rest of the tensor."""
        with self._safe_open(
            os.path.join(self.path, self.index[name]), framework="np"
        ) as f:
            return f.get_slice(name)[lo:hi]


def _qkv_fuse_np(get, tc, i: int) -> np.ndarray:
    p = f"language_model.model.layers.{i}."
    q = _interleave_permute(get(p + "self_attn.q_proj.weight"), tc.num_heads, tc.head_dim)
    k = _interleave_permute(get(p + "self_attn.k_proj.weight"), tc.num_kv_heads, tc.head_dim)
    v = get(p + "self_attn.v_proj.weight")
    return np.concatenate([q, k, v], axis=0).T  # [in, out]


def import_hf_lm_serving_int4(
    src,
    tc,
    *,
    fuse_shared: bool = True,
    expert_chunk: Optional[int] = None,
    layer_chunk: int = 4,
    dtype=jnp.bfloat16,
) -> dict:
    """Stream an HF Aria checkpoint DIRECTLY into the int4 serving form.

    Equivalent leaf-for-leaf to
    ``quantize_lm_params_int4(fuse_shared_experts(import_hf_state_dict(...)))``
    — but the ~42GB bf16 expert stacks never exist anywhere: experts are read
    shard-slice by shard-slice (`safe_open` first-axis slicing), quantized on
    device in [expert_chunk]-expert slabs, and written into preallocated
    packed buffers in place (donated), exactly like the synthetic
    ``init_lm_params_serving_int4.fill_chunk`` (models/moe_lm.py).

    Peak memory: host = one expert/layer slab (~200MB at flagship scale);
    device = the final packed tree + one slab's f32 quantization temps
    (~400MB) — so the full 25.3B checkpoint loads onto a single 16GB chip.

    ``src`` is a checkpoint directory path or a :class:`SafetensorsDir`.
    """
    import functools

    import jax

    from aria_tpu.ops.dense_int4 import quantize_dense_int4
    from aria_tpu.ops.quant import quantize_expert_int4, quantize_weight

    st = SafetensorsDir(src) if isinstance(src, str) else src
    get = st.get

    L, D, E = tc.num_layers, tc.hidden_size, tc.num_experts
    I = tc.moe_intermediate_size
    ns = tc.num_shared_experts
    E_t = E + (ns if fuse_shared else 0)
    lm_prefix = "language_model.model.layers.{}."

    if expert_chunk is None:
        # largest divisor of E <= 11: bounds the f32 quantize temps (~400MB
        # at flagship scale) with no partial-chunk recompiles
        expert_chunk = next(d for d in range(min(11, E), 0, -1) if E % d == 0)
    assert E % expert_chunk == 0, (E, expert_chunk)

    def as_dev(x):
        return jnp.asarray(np.ascontiguousarray(x)).astype(dtype)

    # ---- expert stacks first: the multi-GB packed buffers claim contiguous
    # HBM before anything transient fragments it
    def make_fill(chunk):
        @functools.partial(jax.jit, donate_argnums=(0,))
        def fill(bufs, w1c, w2c, l, e0):
            q1, q2 = quantize_expert_int4(w1c, w2c)
            new = {}
            for name, src_d in (("w1", q1), ("w2", q2)):
                for leaf, v in src_d.items():
                    new[(name, leaf)] = jax.lax.dynamic_update_slice(
                        bufs[(name, leaf)], v[None], (l, e0) + (0,) * (v.ndim - 1)
                    )
            return new
        return fill

    shapes = jax.eval_shape(
        quantize_expert_int4,
        jax.ShapeDtypeStruct((expert_chunk, 2 * I, D), dtype),
        jax.ShapeDtypeStruct((expert_chunk, I, D), dtype),
    )
    bufs = {}
    for name, src_d in (("w1", shapes[0]), ("w2", shapes[1])):
        for leaf, v in src_d.items():
            bufs[(name, leaf)] = jnp.zeros((L, E_t) + v.shape[1:], v.dtype)

    fill_routed = make_fill(expert_chunk)
    fill_shared = make_fill(ns) if fuse_shared else None
    for l in range(L):
        p = lm_prefix.format(l)
        for e0 in range(0, E, expert_chunk):
            # HF fc1 is [E, D, 2I]; the decode kernel wants out-major [E, 2I, D]
            w1c = get_expert_slice(st, p + "mlp.experts.fc1.weight", e0, e0 + expert_chunk)
            w2c = st.get_slice(p + "mlp.experts.fc2.weight", e0, e0 + expert_chunk)
            bufs = fill_routed(bufs, as_dev(w1c), as_dev(w2c),
                               jnp.int32(l), jnp.int32(e0))
        if fuse_shared:
            v_w1, v_w2 = shared_virtual_experts_np(get, p, I, ns)
            bufs = fill_shared(bufs, as_dev(v_w1), as_dev(v_w2),
                               jnp.int32(l), jnp.int32(E))

    # ---- dense [L, in, out] stacks, quantized to int4 in layer chunks
    def stream_dense(layer_fn):
        first = np.asarray(layer_fn(0))
        probe = jax.eval_shape(
            quantize_dense_int4, jax.ShapeDtypeStruct((1,) + first.shape, dtype)
        )
        out = {k: jnp.zeros((L,) + v.shape[1:], v.dtype) for k, v in probe.items()}
        fills = {}
        l = 0
        pending = [first]
        while l + len(pending) < L and len(pending) < layer_chunk:
            pending.append(np.asarray(layer_fn(l + len(pending))))
        while pending:
            lc = len(pending)
            if lc not in fills:
                @functools.partial(jax.jit, donate_argnums=(0,), static_argnums=(3,))
                def _fill(out, w, l0, _lc):
                    q = quantize_dense_int4(w)
                    return {
                        k: jax.lax.dynamic_update_slice(
                            out[k], v, (l0,) + (0,) * (v.ndim - 1)
                        )
                        for k, v in q.items()
                    }
                fills[lc] = _fill
            out = fills[lc](out, as_dev(np.stack(pending)), jnp.int32(l), lc)
            l += lc
            pending = [np.asarray(layer_fn(i)) for i in range(l, min(L, l + layer_chunk))]
        return out

    def stack_small(suffix, fn=lambda x: x, d=dtype):
        return jnp.asarray(
            np.stack([np.asarray(fn(get(lm_prefix.format(i) + suffix))) for i in range(L)])
        ).astype(d)

    q8 = jax.jit(quantize_weight, donate_argnums=0, static_argnums=1)
    layers = {
        "attn_norm": stack_small("input_layernorm.weight"),
        "ffn_norm": stack_small("post_attention_layernorm.weight"),
        "wqkv": stream_dense(lambda i: _qkv_fuse_np(get, tc, i)),
        "wo": stream_dense(lambda i: get(lm_prefix.format(i) + "self_attn.o_proj.weight").T),
        "gate": stack_small("mlp.router.weight", d=jnp.float32),
        "w1": {leaf: bufs[("w1", leaf)] for leaf in shapes[0]},
        "w2": {leaf: bufs[("w2", leaf)] for leaf in shapes[1]},
    }
    if not fuse_shared:
        def shared_w1_np(i):
            p = lm_prefix.format(i)
            return np.concatenate(
                [get(p + "mlp.shared_experts.gate_proj.weight"),
                 get(p + "mlp.shared_experts.up_proj.weight")], axis=0
            ).T
        layers["shared_w1"] = q8(stack_small_fn(shared_w1_np, L, dtype), -2)
        layers["shared_w2"] = q8(
            stack_small("mlp.shared_experts.down_proj.weight", lambda w: w.T), -2
        )

    return {
        "embed": q8(jnp.asarray(get("language_model.model.embed_tokens.weight")).astype(dtype), -2),
        "layers": layers,
        "final_norm": jnp.asarray(get("language_model.model.norm.weight")).astype(dtype),
        "lm_head": q8(jnp.asarray(get("language_model.lm_head.weight").T).astype(dtype), -2),
    }


def get_expert_slice(st: "SafetensorsDir", name: str, e0: int, e1: int) -> np.ndarray:
    """[e0:e1] experts of an HF fc1 tensor, transposed to out-major [n, 2I, D]."""
    return st.get_slice(name, e0, e1).transpose(0, 2, 1)


def shared_virtual_experts_np(get, layer_prefix: str, I: int, ns: int):
    """Decompose one layer's shared-expert GLU into ``ns`` expert-shaped
    virtual experts (ops/quant.py fuse_shared_experts semantics): gate/up row
    block j*I:(j+1)*I becomes virtual expert j's [2I, D] out-major w1; the
    matching down-proj columns its [I, D] w2."""
    gate_w = np.asarray(get(layer_prefix + "mlp.shared_experts.gate_proj.weight"))  # [Is, D]
    up_w = np.asarray(get(layer_prefix + "mlp.shared_experts.up_proj.weight"))
    down_w = np.asarray(get(layer_prefix + "mlp.shared_experts.down_proj.weight"))  # [D, Is]
    v_w1 = np.stack([
        np.concatenate([gate_w[j * I:(j + 1) * I], up_w[j * I:(j + 1) * I]], axis=0)
        for j in range(ns)
    ])  # [ns, 2I, D]
    v_w2 = np.ascontiguousarray(down_w.T).reshape(ns, I, down_w.shape[0])
    return v_w1, v_w2


def stack_small_fn(fn, L: int, dtype) -> "jnp.ndarray":
    return jnp.asarray(np.stack([np.asarray(fn(i)) for i in range(L)])).astype(dtype)
