"""Parallelism tests on the 8-device CPU mesh: sharded train step, context
(Ulysses) attention, and sharded forward consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from aria_tpu.config import AriaConfig
from aria_tpu.models.aria import aria_forward, init_aria_params
from aria_tpu.ops.attention import sdpa
from aria_tpu.parallel.context import ulysses_attention
from aria_tpu.parallel.mesh import MeshConfig, aria_param_specs, make_mesh, shard_tree

TINY = AriaConfig.tiny()


class TestUlysses:
    @pytest.mark.parametrize("c,causal", [(2, True), (4, True), (4, False)])
    def test_matches_unsharded_attention(self, c, causal):
        mesh = make_mesh(MeshConfig(context=c))
        B, S, H, D = 2, 32, 4, 16
        rng = np.random.RandomState(0)
        q = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
        k = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
        v = jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))

        out = ulysses_attention(q, k, v, mesh, causal=causal)

        mask = None
        if causal:
            qi = jnp.arange(S)
            mask = (qi[None, :] <= qi[:, None])[None, None]
        ref = sdpa(q, k, v, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)

    def test_rejects_indivisible(self):
        mesh = make_mesh(MeshConfig(context=4))
        q = jnp.zeros((1, 32, 6, 16))  # 6 heads not divisible by 4
        with pytest.raises(ValueError):
            ulysses_attention(q, q, q, mesh)


class TestShardedForward:
    def test_sharded_forward_matches_single_device(self):
        cfg = TINY
        params = init_aria_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        tokens = jax.random.randint(jax.random.PRNGKey(1), (2, 16), 0, cfg.text.vocab_size)

        ref = aria_forward(params, cfg, tokens).logits

        mesh = make_mesh(MeshConfig(fsdp=2, expert=2, model=2))
        sharded = shard_tree(params, aria_param_specs(), mesh)
        tokens_s = jax.device_put(tokens, NamedSharding(mesh, P(("data", "fsdp"))))
        with mesh:
            out = jax.jit(lambda p, t: aria_forward(p, cfg, t).logits)(sharded, tokens_s)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3)
