"""Model-level numerics tests at tiny scale.

The ViT is checked against HF's Idefics2VisionTransformer (the exact upstream
module the reference wraps, vision_encoder.py:58-67) and the projector against
a torch reconstruction of the reference's CrossAttention+FFN semantics built
from stock torch modules. The LM is checked for prefill/decode consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from aria_tpu.config import AriaConfig, ProjectorConfig, VisionConfig
from aria_tpu.models.aria import (
    aria_forward,
    causal_lm_loss,
    init_aria_params,
    prepare_embeddings,
    scatter_image_features,
)
from aria_tpu.models.moe_lm import KVCache, init_lm_params, lm_forward
from aria_tpu.models.projector import init_projector_params, projector_forward
from aria_tpu.models.vit import init_vit_params, patch_attention_mask, vit_forward

TINY = AriaConfig.tiny()


def j(a):
    return jnp.asarray(np.asarray(a.detach(), dtype=np.float32))


class TestViTParity:
    @pytest.fixture(scope="class")
    def hf_vit(self):
        from transformers.models.idefics2.configuration_idefics2 import (
            Idefics2VisionConfig,
        )
        from transformers.models.idefics2.modeling_idefics2 import (
            Idefics2VisionTransformer,
        )

        cfg = Idefics2VisionConfig(
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=2,
            image_size=98,
            patch_size=14,
            hidden_act="gelu_pytorch_tanh",
            _attn_implementation="eager",
        )
        torch.manual_seed(0)
        model = Idefics2VisionTransformer._from_config(cfg, attn_implementation="eager")
        model.post_layernorm = nn.Identity()  # reference vision_encoder.py:67
        model.eval()
        return model

    def _import_weights(self, hf):
        """HF Idefics2 ViT -> our param tree (transpose to [in, out])."""
        sd = {k: v.detach() for k, v in hf.state_dict().items()}
        L = len(hf.encoder.layers)

        def stack(fmt, transpose=False):
            ws = [sd[fmt.format(i)] for i in range(L)]
            ws = [w.T if transpose else w for w in ws]
            return jnp.asarray(torch.stack(ws).float().numpy())

        emb_w = sd["embeddings.patch_embedding.weight"]  # [D, C, ps, ps]
        params = {
            "patch_embed_w": j(emb_w.flatten(1).T),
            "patch_embed_b": j(sd["embeddings.patch_embedding.bias"]),
            "pos_embed": j(sd["embeddings.position_embedding.weight"]),
            "layers": {
                "ln1_w": stack("encoder.layers.{}.layer_norm1.weight"),
                "ln1_b": stack("encoder.layers.{}.layer_norm1.bias"),
                "ln2_w": stack("encoder.layers.{}.layer_norm2.weight"),
                "ln2_b": stack("encoder.layers.{}.layer_norm2.bias"),
                "wq": stack("encoder.layers.{}.self_attn.q_proj.weight", transpose=True),
                "bq": stack("encoder.layers.{}.self_attn.q_proj.bias"),
                "wk": stack("encoder.layers.{}.self_attn.k_proj.weight", transpose=True),
                "bk": stack("encoder.layers.{}.self_attn.k_proj.bias"),
                "wv": stack("encoder.layers.{}.self_attn.v_proj.weight", transpose=True),
                "bv": stack("encoder.layers.{}.self_attn.v_proj.bias"),
                "wo": stack("encoder.layers.{}.self_attn.out_proj.weight", transpose=True),
                "bo": stack("encoder.layers.{}.self_attn.out_proj.bias"),
                "fc1_w": stack("encoder.layers.{}.mlp.fc1.weight", transpose=True),
                "fc1_b": stack("encoder.layers.{}.mlp.fc1.bias"),
                "fc2_w": stack("encoder.layers.{}.mlp.fc2.weight", transpose=True),
                "fc2_b": stack("encoder.layers.{}.mlp.fc2.bias"),
            },
        }
        return params

    def test_vit_matches_hf_with_padding_mask(self, hf_vit):
        cfg = TINY.vision
        N, S = 2, cfg.image_size
        torch.manual_seed(1)
        pixels = torch.randn(N, 3, S, S)
        # Sample 0: full image; sample 1: padded (bottom/right) like the
        # keep-ratio resize produces.
        pixel_mask = torch.zeros(N, S, S, dtype=torch.bool)
        pixel_mask[0] = True
        pixel_mask[1, :56, :84] = True

        pmask = patch_attention_mask(j(pixel_mask), cfg.patch_size)
        with torch.no_grad():
            ref = hf_vit(
                pixel_values=pixels,
                patch_attention_mask=torch.tensor(np.asarray(pmask)),
            ).last_hidden_state

        params = self._import_weights(hf_vit)
        out = vit_forward(params, cfg, j(pixels), j(pixel_mask))

        got = np.asarray(out.features)
        refn = ref.numpy()
        # Only valid patches must match (padding rows differ by masking impl).
        valid = np.asarray(out.patch_mask)
        np.testing.assert_allclose(got[valid], refn[valid], rtol=2e-3, atol=2e-3)

    def test_patch_mask_and_ignore_mask(self):
        cfg = TINY.vision
        pixel_mask = jnp.zeros((1, 98, 98), bool).at[0, :20, :40].set(True)
        pmask = patch_attention_mask(pixel_mask, 14)
        # 20px -> 2 patch rows, 40px -> 3 patch cols
        assert int(pmask.sum()) == 2 * 3
        out_mask = np.asarray(pmask)
        assert out_mask[0, :2, :3].all()


class TorchProjector(nn.Module):
    """Torch reconstruction of the reference projector's math (projector.py:26-189)."""

    def __init__(self, num_queries, kv_dim, embed_dim, num_heads, ff_dim, output_dim):
        super().__init__()
        self.num_heads = num_heads
        self.query = nn.Parameter(torch.randn(num_queries, embed_dim) * 0.02)
        self.q_proj = nn.Linear(embed_dim, embed_dim, bias=False)
        self.k_proj = nn.Linear(kv_dim, embed_dim, bias=False)
        self.v_proj = nn.Linear(kv_dim, embed_dim, bias=False)
        self.multihead_attn = nn.MultiheadAttention(embed_dim, num_heads)
        self.linear = nn.Linear(embed_dim, embed_dim)
        self.layer_norm = nn.LayerNorm(embed_dim)
        self.ln_kv = nn.LayerNorm(kv_dim)
        self.ln_ffn = nn.LayerNorm(embed_dim)
        self.ffn_in = nn.Linear(embed_dim, ff_dim, bias=False)
        self.ffn_out = nn.Linear(ff_dim, output_dim, bias=False)

    def forward(self, x, attn_mask=None):
        bs = x.shape[0]
        queries = self.query.unsqueeze(0).repeat(bs, 1, 1)
        q = self.q_proj(self.layer_norm(queries)).permute(1, 0, 2)
        kv = self.ln_kv(x)
        k = self.k_proj(kv).permute(1, 0, 2)
        v = self.v_proj(kv).permute(1, 0, 2)
        if attn_mask is not None:
            attn_mask = attn_mask.repeat_interleave(self.num_heads, 0)
            attn_mask = attn_mask.unsqueeze(1).expand(-1, queries.size(1), -1)
        out, _ = self.multihead_attn(q, k, v, attn_mask=attn_mask)
        out = self.linear(out.permute(1, 0, 2))
        h = self.ln_ffn(out)
        return self.ffn_out(F.gelu(self.ffn_in(h), approximate="tanh"))


class TestProjectorParity:
    def _import(self, tp: TorchProjector, cfg: ProjectorConfig):
        sd = {k: v.detach() for k, v in tp.state_dict().items()}
        return {
            "query": j(sd["query"]),
            "ln_q_w": j(sd["layer_norm.weight"]),
            "ln_q_b": j(sd["layer_norm.bias"]),
            "ln_kv_w": j(sd["ln_kv.weight"]),
            "ln_kv_b": j(sd["ln_kv.bias"]),
            "q_proj": j(sd["q_proj.weight"].T),
            "k_proj": j(sd["k_proj.weight"].T),
            "v_proj": j(sd["v_proj.weight"].T),
            "attn_in_w": j(sd["multihead_attn.in_proj_weight"].T),
            "attn_in_b": j(sd["multihead_attn.in_proj_bias"]),
            "attn_out_w": j(sd["multihead_attn.out_proj.weight"].T),
            "attn_out_b": j(sd["multihead_attn.out_proj.bias"]),
            "linear_w": j(sd["linear.weight"].T),
            "linear_b": j(sd["linear.bias"]),
            "ln_ffn_w": j(sd["ln_ffn.weight"]),
            "ln_ffn_b": j(sd["ln_ffn.bias"]),
            "ffn_in": j(sd["ffn_in.weight"].T),
            "ffn_out": j(sd["ffn_out.weight"].T),
        }

    def test_projector_matches_torch(self):
        cfg = TINY.projector
        P = 49  # -> 8 queries per TINY.patch_to_query
        torch.manual_seed(2)
        tp = TorchProjector(cfg.max_queries, cfg.kv_dim, cfg.embed_dim, cfg.num_heads, cfg.ff_dim, cfg.output_dim)
        # match reference: only first query_count queries used
        tp_q = tp.query.data.clone()
        x = torch.randn(2, P, cfg.kv_dim)
        ignore = torch.zeros(2, P, dtype=torch.bool)
        ignore[1, 30:] = True  # padded patches on sample 1

        class Sliced(TorchProjector):
            pass

        with torch.no_grad():
            # emulate reference slicing queries[:, :query_num]
            tp.query = nn.Parameter(tp_q[: cfg.query_count(P)])
            ref = tp(x, attn_mask=ignore)

        params = self._import(tp, cfg)
        params["query"] = j(tp_q)  # full bank; forward slices
        got = projector_forward(params, cfg, j(x), j(ignore))
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=2e-3, atol=2e-3)


class TestMoELM:
    @pytest.fixture(scope="class")
    def lm(self):
        cfg = TINY.text
        params = init_lm_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        return cfg, params

    def test_prefill_then_decode_matches_full_forward(self, lm):
        cfg, params = lm
        B, S = 1, 12
        tokens = jax.random.randint(jax.random.PRNGKey(1), (B, S), 0, cfg.vocab_size)

        full = lm_forward(params, cfg, tokens)

        max_seq = 16
        cache = KVCache.init(cfg, B, max_seq, dtype=jnp.float32)
        prefill_len = 8
        kv_pos = jnp.arange(max_seq)
        # Prefill first 8 tokens.
        pre_mask = (jnp.arange(prefill_len)[:, None] >= kv_pos[None, :])[None, None]
        out = lm_forward(
            params, cfg, tokens[:, :prefill_len],
            positions=jnp.arange(prefill_len), mask=pre_mask,
            cache=cache, cache_pos=jnp.int32(0),
        )
        cache = out.cache
        np.testing.assert_allclose(
            np.asarray(out.logits), np.asarray(full.logits[:, :prefill_len]),
            rtol=2e-4, atol=2e-4,
        )
        # Decode the rest one token at a time.
        for i in range(prefill_len, S):
            dec_mask = (kv_pos <= i)[None, None, None, :]
            out = lm_forward(
                params, cfg, tokens[:, i : i + 1],
                positions=jnp.arange(i, i + 1), mask=dec_mask,
                cache=cache, cache_pos=jnp.int32(i),
            )
            cache = out.cache
            np.testing.assert_allclose(
                np.asarray(out.logits[:, 0]), np.asarray(full.logits[:, i]),
                rtol=2e-4, atol=2e-4,
            )

    def test_moe_token_chunking_exact(self, lm, monkeypatch):
        """The long-prefill MoE token-chunking path (sequential lax.map over
        bounded slices, moe_lm.py MOE_CHUNK) must match the unchunked path —
        it is the path every >=32K one-shot prefill takes on the full int4
        model (the 8192-token slices OOM'd there). Routing is per-token so
        the math is the same; tolerances cover f32 reassociation between the
        per-T expert-compute sub-paths."""
        cfg, params = lm
        B, S = 1, 16
        tokens = jax.random.randint(jax.random.PRNGKey(3), (B, S), 0, cfg.vocab_size)
        full = lm_forward(params, cfg, tokens)
        monkeypatch.setenv("ARIA_TPU_MOE_CHUNK", "4")
        chunked = jax.jit(lambda t: lm_forward(params, cfg, t).logits)(tokens)
        np.testing.assert_allclose(
            np.asarray(chunked), np.asarray(full.logits), rtol=2e-4, atol=2e-4
        )

    def test_training_returns_aux_losses(self, lm):
        cfg, params = lm
        tokens = jnp.ones((2, 40), jnp.int32)
        out = lm_forward(params, cfg, tokens, training=True)
        assert float(out.z_loss) > 0.0
        assert float(out.aux_loss) > 0.0
        out_eval = lm_forward(params, cfg, tokens, training=False)
        assert float(out_eval.z_loss) == 0.0


class TestComposite:
    def test_scatter_image_features_order(self):
        B, S, D = 1, 6, 4
        embeds = jnp.zeros((B, S, D))
        tokens = jnp.array([[5, 9, 9, 7, 9, 8]])
        feats = jnp.arange(3 * D, dtype=jnp.float32).reshape(1, 3, D)
        out = scatter_image_features(embeds, tokens, feats, image_token_id=9)
        np.testing.assert_allclose(np.asarray(out[0, 1]), np.arange(0, 4))
        np.testing.assert_allclose(np.asarray(out[0, 2]), np.arange(4, 8))
        np.testing.assert_allclose(np.asarray(out[0, 4]), np.arange(8, 12))
        np.testing.assert_allclose(np.asarray(out[0, 0]), np.zeros(4))

    def test_multimodal_forward_and_loss(self):
        cfg = TINY
        params = init_aria_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        S_img = cfg.vision.image_size
        n_queries = cfg.projector.query_count(cfg.vision.patches_per_side**2)
        B, S = 1, 4 + n_queries
        tokens = np.full((B, S), 3, np.int32)
        tokens[0, 2 : 2 + n_queries] = cfg.image_token_id
        pixels = np.random.RandomState(0).randn(1, 3, S_img, S_img).astype(np.float32)
        mask = np.ones((1, S_img, S_img), bool)

        out = aria_forward(params, cfg, jnp.asarray(tokens), jnp.asarray(pixels), jnp.asarray(mask), training=True)
        assert out.logits.shape == (B, S, cfg.text.vocab_size)

        labels = np.full((B, S), -100, np.int64)
        labels[0, -2:] = [7, 11]
        loss = causal_lm_loss(out, jnp.asarray(labels))
        assert np.isfinite(float(loss.loss))
        assert float(loss.loss) == pytest.approx(
            float(loss.ce_loss) + float(loss.z_loss) + float(loss.aux_loss), rel=1e-5
        )

    def test_encode_images_uint8_matches_f32(self):
        """uint8 pixels with on-device normalization (the 4x-smaller
        transfer path) must reproduce the host-normalized f32 features, and
        pixel_mask=None must equal an all-true mask."""
        from aria_tpu.models.aria import encode_images

        cfg = TINY
        params = init_aria_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        S_img = cfg.vision.image_size
        raw = np.random.RandomState(0).randint(
            0, 256, (1, 3, S_img, S_img), np.uint8)
        f32 = ((raw.astype(np.float32) / 255.0) - 0.5) / 0.5
        mask = np.ones((1, S_img, S_img), bool)

        ref = encode_images(params, cfg, jnp.asarray(f32), jnp.asarray(mask))
        got = encode_images(params, cfg, jnp.asarray(raw), None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_image_embeddings_change_output(self):
        cfg = TINY
        params = init_aria_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        S_img = cfg.vision.image_size
        n_q = cfg.projector.query_count(cfg.vision.patches_per_side**2)
        tokens = np.full((1, n_q), cfg.image_token_id, np.int32)
        pixels = np.random.RandomState(1).randn(1, 3, S_img, S_img).astype(np.float32)
        mask = np.ones((1, S_img, S_img), bool)
        with_img = prepare_embeddings(params, cfg, jnp.asarray(tokens), jnp.asarray(pixels), jnp.asarray(mask))
        without = prepare_embeddings(params, cfg, jnp.asarray(tokens))
        assert not np.allclose(np.asarray(with_img), np.asarray(without))
