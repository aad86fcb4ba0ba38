"""Generate a flagship-shaped (25.3B) HF-Aria safetensors directory on disk.

VERDICT r03 item 5: the streamed int4 serving import
(`checkpoint/io.py:import_hf_lm_serving_int4`) was only ever exercised on
tiny synthetic checkpoints; nothing demonstrated that the 25.3B import stays
within host RAM and completes in reasonable time. This tool writes a
random-valued checkpoint with the EXACT tensor names/shapes/dtype (bf16) of
the HF export the reference converts (gptfast/scripts/convert_hf_checkpoint.py:90-162),
sharded one LM layer per .safetensors file plus head/vision/projector shards —
so `bench.py --from-hf <dir>` can drive the real load path end to end at
full scale.

Values are drawn from offset slices of one random N(0, 0.02) pool — distinct,
finite, well-scaled bf16 per tensor, which is what the quantizers and the
import path care about. Layer buffers are allocated once and refilled in
place: on this image first-touch page faults run at ~36MB/s while hot
memcpy runs at ~1.9GB/s, so fresh allocation per layer would cost ~25 min
for the ~48GB of tensors.

Usage:
  python -m tools.make_flagship_ckpt --out /tmp/aria_hf_25b           # ~49GB
  python -m tools.make_flagship_ckpt --out /tmp/small --layers 2      # smoke
"""

import argparse
import os
import time

import ml_dtypes
import numpy as np
from safetensors.numpy import save_file


class PoolRNG:
    """Distinct-per-tensor random bf16 from one pool, with in-place refill."""

    def __init__(self, seed: int, scale: float = 0.02, pool_elems: int = 1 << 24):
        rng = np.random.RandomState(seed)
        pool = (rng.standard_normal(pool_elems) * scale).astype(ml_dtypes.bfloat16)
        self.pool2 = np.concatenate([pool, pool]).view(np.uint16)  # offset views
        self.n_pool = pool_elems
        self.rng = rng

    def fill(self, arr: np.ndarray) -> np.ndarray:
        """Refill an existing bf16 array in place with a fresh pool offset."""
        bits = arr.view(np.uint16).reshape(-1)
        n = bits.size
        off = int(self.rng.randint(0, self.n_pool))
        for i in range(0, n, self.n_pool):
            c = min(self.n_pool, n - i)
            bits[i:i + c] = self.pool2[off:off + c]
        return arr

    def __call__(self, *shape):
        return self.fill(np.empty(shape, ml_dtypes.bfloat16))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--layers", type=int, default=None, help="override num LM layers")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-vision", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="AriaConfig.tiny() dims (tests the naming contract)")
    args = ap.parse_args()

    from aria_tpu.config import AriaConfig

    cfg = AriaConfig.tiny() if args.tiny else AriaConfig.aria_25b()
    tc, vc, pc = cfg.text, cfg.vision, cfg.projector
    L = args.layers if args.layers is not None else tc.num_layers
    D, V, H, Dh = tc.hidden_size, tc.vocab_size, tc.num_heads, tc.head_dim
    E, I = tc.num_experts, tc.moe_intermediate_size
    Is = tc.shared_intermediate_size

    os.makedirs(args.out, exist_ok=True)
    rand = PoolRNG(args.seed)
    t0 = time.perf_counter()
    total_bytes = 0

    def write_shard(name, tensors):
        nonlocal total_bytes
        path = os.path.join(args.out, name)
        save_file(tensors, path)
        total_bytes += os.path.getsize(path)

    # one set of layer buffers, refilled per layer (see module docstring)
    layer_bufs = {
        "self_attn.q_proj.weight": np.empty((H * Dh, D), ml_dtypes.bfloat16),
        "self_attn.k_proj.weight": np.empty((tc.num_kv_heads * Dh, D), ml_dtypes.bfloat16),
        "self_attn.v_proj.weight": np.empty((tc.num_kv_heads * Dh, D), ml_dtypes.bfloat16),
        "self_attn.o_proj.weight": np.empty((D, H * Dh), ml_dtypes.bfloat16),
        "mlp.router.weight": np.empty((E, D), ml_dtypes.bfloat16),
        "mlp.experts.fc1.weight": np.empty((E, D, 2 * I), ml_dtypes.bfloat16),
        "mlp.experts.fc2.weight": np.empty((E, I, D), ml_dtypes.bfloat16),
        "mlp.shared_experts.gate_proj.weight": np.empty((Is, D), ml_dtypes.bfloat16),
        "mlp.shared_experts.up_proj.weight": np.empty((Is, D), ml_dtypes.bfloat16),
        "mlp.shared_experts.down_proj.weight": np.empty((D, Is), ml_dtypes.bfloat16),
    }
    ones_d = np.ones(D, ml_dtypes.bfloat16)
    for i in range(L):
        p = f"language_model.model.layers.{i}."
        shard = {p + k: rand.fill(v) for k, v in layer_bufs.items()}
        shard[p + "input_layernorm.weight"] = ones_d
        shard[p + "post_attention_layernorm.weight"] = ones_d
        write_shard(f"model-layer{i:03d}.safetensors", shard)
        print(f"# layer {i}: {total_bytes / 1e9:.1f} GB cumulative, "
              f"{time.perf_counter() - t0:.0f}s", flush=True)

    # embed and lm_head need DISTINCT buffers: save_file serializes after the
    # dict is built, so refilling one shared buffer in place would write
    # identical bytes for both tensors and mask an importer embed/head swap.
    embed = rand(V, D)
    lm_head = rand(V, D)
    write_shard("model-head.safetensors", {
        "language_model.model.embed_tokens.weight": embed,
        "language_model.model.norm.weight": ones_d,
        "language_model.lm_head.weight": lm_head,
    })

    if not args.no_vision:
        vd, vf = vc.hidden_size, vc.intermediate_size
        vt = "vision_tower.vision_model."
        vis = {
            vt + "embeddings.patch_embedding.weight": rand(vd, 3, vc.patch_size, vc.patch_size),
            vt + "embeddings.patch_embedding.bias": rand(vd),
            vt + "embeddings.position_embedding.weight": rand(vc.patches_per_side ** 2, vd),
        }
        vbufs = {}
        for nm in ["q_proj", "k_proj", "v_proj", "out_proj"]:
            vbufs[f"self_attn.{nm}.weight"] = np.empty((vd, vd), ml_dtypes.bfloat16)
            vbufs[f"self_attn.{nm}.bias"] = np.empty(vd, ml_dtypes.bfloat16)
        vbufs["mlp.fc1.weight"] = np.empty((vf, vd), ml_dtypes.bfloat16)
        vbufs["mlp.fc1.bias"] = np.empty(vf, ml_dtypes.bfloat16)
        vbufs["mlp.fc2.weight"] = np.empty((vd, vf), ml_dtypes.bfloat16)
        vbufs["mlp.fc2.bias"] = np.empty(vd, ml_dtypes.bfloat16)
        ones_v = np.ones(vd, ml_dtypes.bfloat16)
        zeros_v = np.zeros(vd, ml_dtypes.bfloat16)
        for i in range(vc.num_layers):
            p = f"{vt}encoder.layers.{i}."
            # distinct copies per layer: all vision layers land in ONE shard,
            # so the buffers cannot be reused across layers here
            for k, v in vbufs.items():
                vis[p + k] = rand.fill(v).copy()
            for nm in ["layer_norm1", "layer_norm2"]:
                vis[p + f"{nm}.weight"] = ones_v
                vis[p + f"{nm}.bias"] = zeros_v
        write_shard("model-vision.safetensors", vis)

        pe = pc.embed_dim
        mp = "multi_modal_projector."
        proj = {
            mp + "query": rand(pc.max_queries, pe),
            mp + "cross_attn.q_proj.weight": rand(pe, pe),
            mp + "cross_attn.k_proj.weight": rand(pe, pc.kv_dim),
            mp + "cross_attn.v_proj.weight": rand(pe, pc.kv_dim),
            mp + "cross_attn.multihead_attn.in_proj_weight": rand(3 * pe, pe),
            mp + "cross_attn.multihead_attn.in_proj_bias": rand(3 * pe),
            mp + "cross_attn.multihead_attn.out_proj.weight": rand(pe, pe),
            mp + "cross_attn.multihead_attn.out_proj.bias": rand(pe),
            mp + "cross_attn.linear.weight": rand(pe, pe),
            mp + "cross_attn.linear.bias": rand(pe),
            mp + "cross_attn.layer_norm.weight": np.ones(pe, ml_dtypes.bfloat16),
            mp + "cross_attn.layer_norm.bias": np.zeros(pe, ml_dtypes.bfloat16),
            mp + "cross_attn.ln_kv.weight": np.ones(pc.kv_dim, ml_dtypes.bfloat16),
            mp + "cross_attn.ln_kv.bias": np.zeros(pc.kv_dim, ml_dtypes.bfloat16),
            mp + "ln_ffn.weight": np.ones(pe, ml_dtypes.bfloat16),
            mp + "ln_ffn.bias": np.zeros(pe, ml_dtypes.bfloat16),
            mp + "ffn.linear_in.weight": rand(pc.ff_dim, pe),
            mp + "ffn.linear_out.weight": rand(pc.output_dim, pc.ff_dim),
        }
        write_shard("model-projector.safetensors", proj)

    print(f"# wrote {total_bytes / 1e9:.1f} GB to {args.out} in "
          f"{time.perf_counter() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
