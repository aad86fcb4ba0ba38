"""Context parallelism over the KV cache (VERDICT r2 #8): the 64K serving
scenario where the cache is position-sharded over the `context` mesh axis.

Greedy-token parity against the single-device engine covers both halves of
parallel/cp_cache.py:
- cached prefill: blockwise attention + pmax/psum online-softmax merge,
- decode: per-block Pallas kernels in return_stats mode (interpret on CPU)
  merged exactly across position blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aria_tpu.models.aria import init_aria_params
from aria_tpu.parallel.mesh import MeshConfig, make_mesh

from tests.test_mesh_kernels import kernel_cfg, kernels


def _ref_tokens(params, cfg, prompt, gen, cache_dtype):
    from aria_tpu.engine.generate import Engine

    with kernels("xla"):
        return Engine(
            params, cfg, max_seq_len=256, cache_dtype=cache_dtype
        ).generate(prompt, gen).tokens


class TestContextShardedCache:
    @pytest.fixture(scope="class")
    def setup(self):
        from aria_tpu.engine.generate import GenerationConfig

        cfg = kernel_cfg()
        params = init_aria_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        gen = GenerationConfig(max_new_tokens=6, temperature=0.0, top_k=None,
                               decode_chunk=3)
        return cfg, params, gen

    def test_cp_xla_fallback_matches_single_device(self, setup):
        """context-sharded cache through the pure-GSPMD paths (no kernels)."""
        from aria_tpu.engine.generate import Engine

        cfg, params, gen = setup
        prompt = [5, 17, 3, 42, 7]
        ref = _ref_tokens(params, cfg, prompt, gen, jnp.float32)
        mesh = make_mesh(MeshConfig(context=2, model=2))
        with kernels("xla"), mesh:
            got = Engine(params, cfg, max_seq_len=256, cache_dtype=jnp.float32,
                         mesh=mesh).generate(prompt, gen)
        assert got.tokens == ref

    def test_cp_kernel_decode_merge_matches_single_device(self, setup, monkeypatch):
        """decode runs the Pallas kernel per position block (return_stats)
        and the merge must be exact."""
        from aria_tpu.engine.generate import Engine
        from aria_tpu.ops import decode_attention as da_mod

        cfg, params, gen = setup
        prompt = [9, 9, 200, 31]
        ref = _ref_tokens(params, cfg, prompt, gen, jnp.float32)

        from tests.test_mesh_kernels import _count_calls

        calls = _count_calls(monkeypatch, da_mod, "decode_attention")
        mesh = make_mesh(MeshConfig(context=2, model=2))
        with kernels("interpret"), mesh:
            got = Engine(params, cfg, max_seq_len=256, cache_dtype=jnp.float32,
                         mesh=mesh).generate(prompt, gen)
        assert calls, "CP decode did not take the Pallas kernel path"
        assert got.tokens == ref

    def test_cp_int8_kv_matches_single_device(self, setup):
        from aria_tpu.engine.generate import Engine

        cfg, params, gen = setup
        prompt = [5, 17, 3]
        ref = _ref_tokens(params, cfg, prompt, gen, jnp.int8)
        mesh = make_mesh(MeshConfig(context=2))
        with kernels("interpret"), mesh:
            got = Engine(params, cfg, max_seq_len=256, cache_dtype=jnp.int8,
                         mesh=mesh).generate(prompt, gen)
        assert got.tokens == ref

    def test_cp_int4_kv_matches_single_device(self, setup):
        """int4 head-pair-packed cache: heads replicated, positions sharded."""
        from aria_tpu.engine.generate import Engine

        cfg, params, gen = setup
        prompt = [12, 300, 4, 4]
        ref = _ref_tokens(params, cfg, prompt, gen, "int4")
        mesh = make_mesh(MeshConfig(context=2, model=2))
        with kernels("interpret"), mesh:
            got = Engine(params, cfg, max_seq_len=256, cache_dtype="int4",
                         mesh=mesh).generate(prompt, gen)
        assert got.tokens == ref
