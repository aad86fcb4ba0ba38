"""int8 weight-only quantization tests."""

import jax
import jax.numpy as jnp
import numpy as np

from aria_tpu.config import AriaConfig
from aria_tpu.engine.generate import Engine, GenerationConfig
from aria_tpu.models.aria import init_aria_params
from aria_tpu.models.moe_lm import init_lm_params, lm_forward
from aria_tpu.ops.quant import (
    dequantize_weight,
    is_quantized,
    linear,
    quantize_lm_params,
    quantize_params,
    quantize_weight,
)

TINY = AriaConfig.tiny()


class TestQuantOps:
    def test_roundtrip_error_small(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
        q = quantize_weight(w)
        w2 = dequantize_weight(q, dtype=jnp.float32)
        err = jnp.max(jnp.abs(w - w2))
        assert float(err) < float(jnp.max(jnp.abs(w))) / 100  # < 1 LSB of 127

    def test_linear_matches_dequant(self):
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 64))
        w = jax.random.normal(jax.random.PRNGKey(2), (64, 32))
        q = quantize_weight(w)
        y_q = linear(x, q, "td,df->tf")
        y_ref = x @ dequantize_weight(q, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_ref), rtol=1e-4, atol=1e-4)

    def test_out_major_quantization(self):
        w = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 16, 8))  # [L,E,2I,D]
        q = quantize_weight(w, input_axis=-1)
        assert q["s"].shape == (2, 4, 16)
        w2 = dequantize_weight(q, input_axis=-1, dtype=jnp.float32)
        assert float(jnp.max(jnp.abs(w - w2))) < 0.05


class TestQuantModel:
    def test_quantized_lm_close_to_fp(self):
        cfg = TINY.text
        params = init_lm_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        qparams = quantize_lm_params(params)
        assert is_quantized(qparams["layers"]["w1"])
        assert "s8" in qparams["layers"]["w1"]
        tokens = jax.random.randint(jax.random.PRNGKey(1), (1, 12), 0, cfg.vocab_size)
        ref = lm_forward(params, cfg, tokens)
        got = lm_forward(qparams, cfg, tokens)
        p_ref = jax.nn.softmax(ref.logits, axis=-1)
        p_got = jax.nn.softmax(got.logits, axis=-1)
        assert float(jnp.max(jnp.abs(p_ref - p_got))) < 0.05

    def test_quantized_engine_generates(self):
        params = init_aria_params(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)
        qparams = quantize_params(params)
        eng = Engine(qparams, TINY, max_seq_len=128, cache_dtype=jnp.float32)
        res = eng.generate([5, 7, 9], GenerationConfig(max_new_tokens=6, temperature=0.0, top_k=None))
        assert len(res.tokens) == 6
        # greedy int8 should mostly track fp greedy on a tiny random model
        eng_fp = Engine(params, TINY, max_seq_len=128, cache_dtype=jnp.float32)
        res_fp = eng_fp.generate([5, 7, 9], GenerationConfig(max_new_tokens=6, temperature=0.0, top_k=None))
        assert res.tokens[0] == res_fp.tokens[0]


class TestFusedSharedExperts:
    def test_fused_matches_separate(self):
        from aria_tpu.ops.quant import fuse_shared_experts

        cfg = TINY.text
        params = init_lm_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        fused = fuse_shared_experts({"lm": params})["lm"]
        E = cfg.num_experts + cfg.num_shared_experts
        assert fused["layers"]["w1"].shape[1] == E
        assert "shared_w1" not in fused["layers"]
        tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 40), 0, cfg.vocab_size)
        ref = lm_forward(params, cfg, tokens)
        got = lm_forward(fused, cfg, tokens)
        np.testing.assert_allclose(
            np.asarray(got.logits), np.asarray(ref.logits), rtol=2e-4, atol=2e-4
        )

    def test_fuse_then_quantize_generates(self):
        from aria_tpu.ops.quant import fuse_shared_experts, quantize_params

        params = init_aria_params(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)
        fq = quantize_params(fuse_shared_experts(params))
        eng = Engine(fq, TINY, max_seq_len=128, cache_dtype=jnp.float32)
        res = eng.generate([5, 7, 9], GenerationConfig(max_new_tokens=4, temperature=0.0, top_k=None))
        assert len(res.tokens) == 4


class TestInt8KVCache:
    def test_greedy_matches_fp_cache(self):
        from aria_tpu.engine.generate import Engine, GenerationConfig

        params = init_aria_params(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=8, temperature=0.0, top_k=None, decode_chunk=4)
        fp = Engine(params, TINY, max_seq_len=128, cache_dtype=jnp.float32).generate([5, 17, 3], gen)
        q8 = Engine(params, TINY, max_seq_len=128, cache_dtype=jnp.int8).generate([5, 17, 3], gen)
        assert fp.tokens == q8.tokens

    def test_cache_structure(self):
        from aria_tpu.models.moe_lm import KVCache

        c = KVCache.init(TINY.text, 2, 256, jnp.int8)
        assert c.quantized and c.k.dtype == jnp.int8
        assert c.k_scale.shape == c.k.shape[:-1]
        c2 = KVCache.init(TINY.text, 2, 256, jnp.bfloat16)
        assert not c2.quantized and c2.k_scale is None
