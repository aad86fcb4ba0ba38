"""Speculative decoding (engine/speculative.py + Engine plumbing).

Correctness contract:
- greedy speculative output is BIT-IDENTICAL to plain greedy decode (the
  verify step accepts exactly the tokens plain decode would emit);
- sampled verification preserves the target distribution exactly (the
  deterministic-draft special case of speculative rejection sampling);
- rejected draft positions leave no trace: later steps never attend their
  stale cache rows and overwrite them in place.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aria_tpu.config import AriaConfig
from aria_tpu.engine.generate import Engine, GenerationConfig
from aria_tpu.engine.speculative import (
    SpeculativeConfig,
    ngram_draft,
    verify_greedy,
    verify_sampled,
)
from aria_tpu.models.aria import init_aria_params

TINY = AriaConfig.tiny()


def make_params():
    return init_aria_params(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)


class TestNgramDraft:
    def test_finds_latest_match_and_continuation(self):
        # history: ... [7 8] 1 2 3 ... [7 8] 4 5 6 ... suffix [7 8]
        hist = np.zeros((1, 32), np.int32)
        seq = [9, 7, 8, 1, 2, 3, 9, 7, 8, 4, 5, 6, 9, 7, 8]
        hist[0, : len(seq)] = seq
        d = ngram_draft(jnp.asarray(hist), jnp.asarray([len(seq)]), n=2, k=3)
        # latest earlier [7 8] is at index 7 -> continuation 4 5 6
        assert d[0].tolist() == [4, 5, 6]

    def test_no_match_is_harmless(self):
        hist = np.zeros((1, 16), np.int32)
        hist[0, :4] = [1, 2, 3, 4]
        d = ngram_draft(jnp.asarray(hist), jnp.asarray([4]), n=2, k=2)
        assert d.shape == (1, 2)  # content is garbage by contract


class TestVerify:
    def test_greedy_acceptance_counts(self):
        V = 11
        # logits whose argmax at position i is (i + 3)
        logits = np.full((1, 4, V), -5.0, np.float32)
        for i in range(4):
            logits[0, i, i + 3] = 5.0
        # draft matches positions 0,1 then diverges
        draft = jnp.asarray([[3, 4, 9]])
        prod, n = verify_greedy(jnp.asarray(logits), draft)
        assert int(n[0]) == 3  # 2 accepted + bonus
        assert prod[0, :3].tolist() == [3, 4, 5]

    def test_sampled_marginal_matches_target(self):
        """Empirical law of the first produced token == the target
        distribution, for a draft the target only partly agrees with."""
        V = 8
        rng = np.random.RandomState(0)
        logits = jnp.asarray(rng.randn(1, 2, V).astype(np.float32) * 1.5)
        draft = jnp.asarray([[3]])
        temp = 0.9
        p = np.asarray(
            jax.nn.softmax(np.asarray(logits[0, 0], np.float64) / temp))

        keys = jax.random.split(jax.random.PRNGKey(42), 4000)
        prod, n = jax.vmap(
            lambda k: verify_sampled(k, logits, draft, temp, None)
        )(keys)
        first = np.asarray(prod)[:, 0, 0]
        emp = np.bincount(first, minlength=V) / len(first)
        # 4000 draws: 3-sigma band per bucket
        sigma = np.sqrt(p * (1 - p) / len(first))
        assert np.all(np.abs(emp - p) < 3.5 * sigma + 1e-3), (emp, p)

    def test_sampled_full_acceptance_when_target_is_draft(self):
        V = 6
        logits = np.full((1, 3, V), -30.0, np.float32)
        logits[0, 0, 2] = 30.0
        logits[0, 1, 4] = 30.0
        logits[0, 2, 1] = 30.0
        prod, n = verify_sampled(
            jax.random.PRNGKey(0), jnp.asarray(logits),
            jnp.asarray([[2, 4]]), 1.0, None)
        assert int(n[0]) == 3
        assert prod[0].tolist() == [2, 4, 1]


class TestEngineSpeculative:
    def _engines(self, cache_dtype):
        params = make_params()
        mk = lambda: Engine(params, TINY, max_seq_len=512,
                            cache_dtype=cache_dtype)
        return mk(), mk()

    @pytest.mark.parametrize("cache_dtype", [jnp.float32, jnp.int8])
    def test_greedy_bit_identity(self, cache_dtype):
        plain_eng, spec_eng = self._engines(cache_dtype)
        # repetitive prompt so the n-gram matcher actually fires
        prompt = [5, 17, 3, 9, 5, 17, 3, 9, 5, 17, 3, 9, 5, 17]
        n = 40
        plain = plain_eng.generate(
            prompt, GenerationConfig(max_new_tokens=n, temperature=0.0,
                                     decode_chunk=7))
        spec = spec_eng.generate(
            prompt, GenerationConfig(
                max_new_tokens=n, temperature=0.0,
                speculative=SpeculativeConfig(k=4, ngram=2,
                                              steps_per_chunk=3)))
        assert spec.tokens == plain.tokens, (spec.tokens, plain.tokens)
        assert spec.steps == plain.steps

    def test_greedy_bit_identity_with_stop_token(self):
        plain_eng, spec_eng = self._engines(jnp.float32)
        prompt = [5, 17, 3, 9] * 4
        plain = plain_eng.generate(
            prompt, GenerationConfig(max_new_tokens=60, temperature=0.0,
                                     decode_chunk=9))
        stop = plain.tokens[len(plain.tokens) // 2]  # force a mid-stream stop
        plain2 = plain_eng.generate(
            prompt, GenerationConfig(max_new_tokens=60, temperature=0.0,
                                     decode_chunk=9, stop_token_ids=(stop,)))
        spec = spec_eng.generate(
            prompt, GenerationConfig(
                max_new_tokens=60, temperature=0.0, stop_token_ids=(stop,),
                speculative=SpeculativeConfig(k=3, ngram=2,
                                              steps_per_chunk=4)))
        assert spec.tokens == plain2.tokens

    def test_sampled_runs_and_composes_with_top_p(self):
        _, spec_eng = self._engines(jnp.float32)
        prompt = [5, 17, 3, 9] * 3
        res = spec_eng.generate(
            prompt, GenerationConfig(
                max_new_tokens=24, temperature=0.8, top_k=50, top_p=0.95,
                speculative=SpeculativeConfig(k=3, ngram=2,
                                              steps_per_chunk=4)))
        assert res.steps == 23  # the prefill token counts toward max_new
        assert all(0 <= t < TINY.text.vocab_size for t in res.tokens)

    def test_rejects_guided_and_penalties(self):
        _, spec_eng = self._engines(jnp.float32)
        with pytest.raises(ValueError, match="speculative"):
            spec_eng.generate(
                [1, 2, 3], GenerationConfig(
                    max_new_tokens=4, repetition_penalty=1.5,
                    speculative=SpeculativeConfig()))

    def test_slack_validation(self):
        params = make_params()
        # Engine rounds max_seq_len up to 512-multiples
        eng = Engine(params, TINY, max_seq_len=512, cache_dtype=jnp.float32)
        with pytest.raises(ValueError, match="slack"):
            eng.generate(
                [1, 2, 3], GenerationConfig(
                    max_new_tokens=420,
                    speculative=SpeculativeConfig(k=7, steps_per_chunk=8)))
