"""LoRA tests: zero-init identity, adapter effect, merge equivalence,
per-expert grouped LoRA, and a LoRA train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aria_tpu.config import AriaConfig
from aria_tpu.models.aria import aria_forward, init_aria_params
from aria_tpu.models.moe_lm import lm_forward
from aria_tpu.train.lora import (
    LoraConfig,
    get_lora_target_modules,
    init_lora_params,
    merge_lora,
)
from aria_tpu.train.step import TrainState, lora_train_step, make_lora_optimizer, TrainConfig

TINY = AriaConfig.tiny()


@pytest.fixture(scope="module")
def setup():
    params = init_aria_params(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)
    lc = LoraConfig(rank=4, alpha=8.0, freeze_llm=False)
    lora = init_lora_params(jax.random.PRNGKey(1), TINY, lc)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (2, 16), 0, TINY.text.vocab_size)
    return params, lc, lora, tokens


class TestLora:
    def test_target_modules_respect_freeze(self):
        assert get_lora_target_modules(LoraConfig(freeze_llm=True)) == ()
        mods = get_lora_target_modules(LoraConfig())
        assert "wqkv" in mods and "w1" in mods

    def test_zero_init_is_identity(self, setup):
        params, lc, lora, tokens = setup
        base = lm_forward(params["lm"], TINY.text, tokens)
        with_lora = lm_forward(
            params["lm"], TINY.text, tokens, lora=lora["lm"], lora_scale=lc.scale
        )
        np.testing.assert_allclose(
            np.asarray(with_lora.logits), np.asarray(base.logits), rtol=1e-5, atol=1e-5
        )

    def test_nonzero_adapters_change_output(self, setup):
        params, lc, lora, tokens = setup
        lora_nz = jax.tree.map(lambda x: x + 0.01, lora)
        base = lm_forward(params["lm"], TINY.text, tokens)
        out = lm_forward(params["lm"], TINY.text, tokens, lora=lora_nz["lm"], lora_scale=lc.scale)
        assert not np.allclose(np.asarray(out.logits), np.asarray(base.logits), atol=1e-4)

    def test_merge_matches_runtime_adapters(self, setup):
        params, lc, lora, tokens = setup
        rngs = jax.random.split(jax.random.PRNGKey(3), 20)
        i = iter(rngs)
        lora_nz = jax.tree.map(lambda x: x + 0.02 * jax.random.normal(next(i), x.shape), lora)

        runtime = lm_forward(
            params["lm"], TINY.text, tokens, lora=lora_nz["lm"], lora_scale=lc.scale
        )
        merged = merge_lora(params, lora_nz, lc)
        folded = lm_forward(merged["lm"], TINY.text, tokens)
        np.testing.assert_allclose(
            np.asarray(folded.logits), np.asarray(runtime.logits), rtol=2e-3, atol=2e-3
        )

    def test_lora_train_step_updates_only_adapters(self, setup):
        params, lc, lora, tokens = setup
        optimizer = make_lora_optimizer(TrainConfig(learning_rate=1e-2))
        state = TrainState(lora, optimizer.init(lora), jnp.zeros((), jnp.int32))
        labels = np.asarray(tokens)
        batch = {"input_ids": tokens, "labels": jnp.asarray(labels)}
        new_state, metrics = lora_train_step(state, batch, params, TINY, lc.scale, optimizer)
        assert np.isfinite(float(metrics["loss"]))
        # b was zero-init; after one step at least one adapter must move
        moved = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(jax.tree.leaves(lora), jax.tree.leaves(new_state.params))
        )
        assert moved
        assert float(metrics["grad_norm"]) > 0
