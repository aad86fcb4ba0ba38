"""Multi-LoRA serving: stacked resident adapters selected per request.

Parity contract: a lane running adapter k through the stacked multi-adapter
path must match the single-adapter (training-format) LoRA path, and a lane
running adapter 0 (base) must be BIT-IDENTICAL to an engine without adapters.
"""

import jax
import jax.numpy as jnp
import numpy as np

from aria_tpu.config import AriaConfig
from aria_tpu.engine.multi_lora import AdapterRegistry, stack_adapters
from aria_tpu.engine.server import BatchedEngine
from aria_tpu.models.aria import init_aria_params
from aria_tpu.models.moe_lm import lm_forward
from aria_tpu.train.lora import LoraConfig, init_lora_params

TINY = AriaConfig.tiny()


def make_params():
    return init_aria_params(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)


def make_adapter(seed: int, rank: int = 8) -> dict:
    """Training-format adapter with NONZERO B factors (real deltas)."""
    lc = LoraConfig(rank=rank, alpha=2.0 * rank)
    lora = init_lora_params(jax.random.PRNGKey(seed), TINY, lc)["lm"]
    rng = np.random.RandomState(seed)
    lora = jax.tree.map(
        lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32) * 0.05),
        lora,
    )
    return lora, lc


class TestStacking:
    def test_multi_matches_single_adapter_forward(self):
        params = make_params()
        lora1, lc1 = make_adapter(1, rank=8)
        lora2, lc2 = make_adapter(2, rank=4)  # different rank: pad path
        reg = AdapterRegistry({"t1": lora1, "t2": lora2},
                              scales={"t1": lc1.scale, "t2": lc2.scale})

        tokens = jnp.asarray(np.random.RandomState(0).randint(
            1, 400, size=(3, 16)), jnp.int32)
        # rows: adapter t1, base, adapter t2
        onehot = reg.lane_onehot([reg.resolve("t1"), 0, reg.resolve("t2")])
        got = lm_forward(params["lm"], TINY.text, tokens,
                         lora=reg.stacked, lora_scale=1.0,
                         lora_onehot=onehot).logits

        base = lm_forward(params["lm"], TINY.text, tokens).logits
        ref1 = lm_forward(params["lm"], TINY.text, tokens,
                          lora=lora1, lora_scale=lc1.scale).logits
        ref2 = lm_forward(params["lm"], TINY.text, tokens,
                          lora=lora2, lora_scale=lc2.scale).logits
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref1[0]),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(base[1]),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref2[2]),
                                   rtol=2e-4, atol=2e-4)
        # the adapters actually do something
        assert not np.allclose(np.asarray(got[0]), np.asarray(base[0]),
                               atol=1e-3)

    def test_stack_union_of_targets(self):
        lora1, _ = make_adapter(1)
        partial = {k: v for k, v in lora1["layers"].items() if k == "wqkv"}
        stacked = stack_adapters([{"layers": partial}, lora1["layers"]])
        assert set(stacked["layers"]) == set(lora1["layers"])
        # adapter 1 (the partial one) has zeros everywhere but wqkv
        wo_a = np.asarray(stacked["layers"]["wo"]["a"])
        assert (wo_a[:, 1] == 0).all() and (wo_a[:, 2] != 0).any()


def _greedy_full(params, prompt, n, lora=None, scale=0.0):
    """Independent greedy reference: cacheless full forward per step."""
    toks = list(prompt)
    for _ in range(n):
        t = jnp.asarray([toks], jnp.int32)
        out = lm_forward(params["lm"], TINY.text, t, lora=lora,
                         lora_scale=scale)
        toks.append(int(jnp.argmax(out.logits[0, -1])))
    return toks[len(prompt):]


class TestEngineMultiLora:
    def test_mixed_batch_adapters_match_references(self):
        params = make_params()
        lora1, lc1 = make_adapter(1, rank=8)
        lora2, lc2 = make_adapter(2, rank=4)
        reg = AdapterRegistry({"t1": lora1, "t2": lora2},
                              scales={"t1": lc1.scale, "t2": lc2.scale})

        prompts = {"t1": [5, 17, 3], None: [9, 9, 200], "t2": [100, 2, 7]}
        n = 6
        exp = {
            "t1": _greedy_full(params, prompts["t1"], n, lora1, lc1.scale),
            None: _greedy_full(params, prompts[None], n),
            "t2": _greedy_full(params, prompts["t2"], n, lora2, lc2.scale),
        }

        srv = BatchedEngine(params, TINY, max_lanes=3, max_seq_len=128,
                            temperature=0.0, decode_chunk=3,
                            cache_dtype=jnp.float32, adapters=reg)
        uids = {srv.submit(p, max_new_tokens=n, adapter=a): a
                for a, p in prompts.items()}
        fin = {uids[r.uid]: r for r in srv.run_until_complete()}
        for a in prompts:
            assert fin[a].generated == exp[a], (a, fin[a].generated, exp[a])
        # adapters changed the output vs base
        assert exp["t1"] != _greedy_full(params, prompts["t1"], n)

    def test_base_lane_bit_identical_to_plain_engine(self):
        params = make_params()
        lora1, lc1 = make_adapter(1)
        reg = AdapterRegistry({"t1": lora1}, scales={"t1": lc1.scale})
        plain = BatchedEngine(params, TINY, max_lanes=1, max_seq_len=128,
                              temperature=0.0, decode_chunk=4,
                              cache_dtype=jnp.float32)
        multi = BatchedEngine(params, TINY, max_lanes=1, max_seq_len=128,
                              temperature=0.0, decode_chunk=4,
                              cache_dtype=jnp.float32, adapters=reg)
        prompt = [5, 17, 3]
        plain.submit(prompt, max_new_tokens=8)
        (f0,) = plain.run_until_complete()
        multi.submit(prompt, max_new_tokens=8)  # no adapter -> index 0
        (f1,) = multi.run_until_complete()
        assert f0.generated == f1.generated

    def test_paged_engine_adapters_and_prefix_isolation(self):
        """Paged engine: adapter parity vs the cacheless reference, and the
        prefix cache must NOT share pages across adapters — LoRA'd wqkv
        means the same prompt has different KV under each adapter."""
        from aria_tpu.engine.server import PagedBatchedEngine

        params = make_params()
        lora1, lc1 = make_adapter(1)
        reg = AdapterRegistry({"t1": lora1}, scales={"t1": lc1.scale})
        srv = PagedBatchedEngine(params, TINY, max_lanes=2, max_seq_len=256,
                                 page_size=32, prefill_chunk=32,
                                 temperature=0.0, decode_chunk=3,
                                 cache_dtype=jnp.float32, adapters=reg)
        prompt = [7 + (i % 90) for i in range(70)]  # 2 full pages, 3 chunks
        n = 5
        exp_t1 = _greedy_full(params, prompt, n, lora1, lc1.scale)
        exp_base = _greedy_full(params, prompt, n)

        u1 = srv.submit(prompt, max_new_tokens=n, adapter="t1")
        u0 = srv.submit(prompt, max_new_tokens=n)
        fin = {r.uid: r for r in srv.run_until_complete()}
        assert fin[u1].generated == exp_t1, (fin[u1].generated, exp_t1)
        assert fin[u0].generated == exp_base
        # identical tokens but different adapters: no cross-adapter reuse
        assert fin[u1].cached_tokens == 0 and fin[u0].cached_tokens == 0

        # same adapter resubmits DO reuse, and stay correct
        u2 = srv.submit(prompt, max_new_tokens=n, adapter="t1")
        (f2,) = srv.run_until_complete()
        assert f2.uid == u2 and f2.cached_tokens == 64
        assert f2.generated == exp_t1

    def test_adapter_composes_with_guided_and_logprobs(self):
        """All three per-request features on one engine: an adapter-selected,
        FSM-constrained request with logprobs, next to a plain lane."""
        from aria_tpu.data.tokenizer import ByteTokenizer
        from aria_tpu.engine.guided import regex_fsm

        params = make_params()
        lora1, lc1 = make_adapter(1)
        reg = AdapterRegistry({"t1": lora1}, scales={"t1": lc1.scale})
        tok = ByteTokenizer()
        fsm = regex_fsm("(yes|no)", tok, [tok.eos_token_id],
                        vocab_size=TINY.text.vocab_size)
        srv = BatchedEngine(params, TINY, max_lanes=2, max_seq_len=128,
                            temperature=0.9, decode_chunk=3,
                            cache_dtype=jnp.float32, guided_fsm=fsm,
                            adapters=reg, logprobs_topk=2)
        g = srv.submit([5, 17, 3], max_new_tokens=8, adapter="t1",
                       guided=True, stop_token_ids=(tok.eos_token_id,))
        p = srv.submit([9, 9, 200], max_new_tokens=4, temperature=0.0)
        fin = {r.uid: r for r in srv.run_until_complete()}
        assert tok.decode(fin[g].generated[:-1]) in ("yes", "no")
        assert fin[g].generated[-1] == tok.eos_token_id
        assert len(fin[g].logprobs) == len(fin[g].generated)
        assert len(fin[p].logprobs) == 4

    def test_adapters_compose_with_penalties_in_grouped_prefill(self):
        """Regression: _prefill_group's adapter branch must EXTEND the
        sampling kwargs, not replace them — reassigning mlkw dropped the
        `pen` argument, so the jitted graph never appended the prompt-mask
        extra and the host's extras.pop(0) raised IndexError on any grouped
        prefill after a penalized request (advisor r4, server.py:517)."""
        params = make_params()
        lora1, lc1 = make_adapter(1, rank=8)
        reg = AdapterRegistry({"t1": lora1}, scales={"t1": lc1.scale})
        srv = BatchedEngine(params, TINY, max_lanes=4, max_seq_len=128,
                            temperature=0.0, decode_chunk=3,
                            cache_dtype=jnp.float32, adapters=reg)
        n = 8
        prompt_pen = [5, 17, 3]
        prompt_ada = [9, 9, 200]
        # both queued BEFORE run_until_complete -> one grouped prefill
        u_pen = srv.submit(prompt_pen, max_new_tokens=n,
                           repetition_penalty=1e6)
        u_ada = srv.submit(prompt_ada, max_new_tokens=n, adapter="t1",
                           top_p=0.9, temperature=0.0)
        fin = {r.uid: r for r in srv.run_until_complete()}
        # penalized lane: no token (incl. prompt tokens) ever repeats
        gen = fin[u_pen].generated
        assert fin[u_pen].error is None and len(gen) == n
        assert len(set(gen + prompt_pen)) == len(gen + prompt_pen), gen
        # adapter lane still matches its cacheless reference (top_p=0.9 at
        # temperature 0 is greedy)
        exp = _greedy_full(params, prompt_ada, n, lora1, lc1.scale)
        assert fin[u_ada].generated == exp, (fin[u_ada].generated, exp)

    def test_unknown_adapter_rejected(self):
        params = make_params()
        lora1, lc1 = make_adapter(1)
        reg = AdapterRegistry({"t1": lora1})
        srv = BatchedEngine(params, TINY, max_lanes=1, max_seq_len=128,
                            cache_dtype=jnp.float32, adapters=reg)
        import pytest

        with pytest.raises(KeyError):
            srv.submit([1, 2], adapter="nope")
        plain = BatchedEngine(params, TINY, max_lanes=1, max_seq_len=128,
                              cache_dtype=jnp.float32)
        with pytest.raises(ValueError):
            plain.submit([1, 2], adapter="t1")


class TestFusedBaseAdapters:
    """Serving bases carry the shared experts fused as virtual experts
    (quant.fuse_shared_experts); adapter registries built from training-format
    factors must be rewritten to match (engine/multi_lora.py
    fuse_shared_adapters / registry_for_params)."""

    def test_delta_math_exact(self):
        """Dense shared-LoRA delta == per-virtual-expert fused deltas."""
        from aria_tpu.engine.multi_lora import fuse_shared_adapters

        tc = TINY.text
        E, ns, I = tc.num_experts, tc.num_shared_experts, tc.moe_intermediate_size
        D, Is, r = tc.hidden_size, ns * I, 4
        rng = np.random.RandomState(0)
        lead = (2, 3)  # [L, A]
        layers = {
            "shared_w1": {"a": rng.randn(*lead, D, r).astype(np.float32),
                          "b": rng.randn(*lead, r, 2 * Is).astype(np.float32)},
            "shared_w2": {"a": rng.randn(*lead, Is, r).astype(np.float32),
                          "b": rng.randn(*lead, r, D).astype(np.float32)},
            "w1": {"a": rng.randn(*lead, E, D, r).astype(np.float32),
                   "b": rng.randn(*lead, E, r, 2 * I).astype(np.float32)},
            "w2": {"a": rng.randn(*lead, E, I, r).astype(np.float32),
                   "b": rng.randn(*lead, E, r, D).astype(np.float32)},
        }
        fused = fuse_shared_adapters(dict(layers), E, ns, I)
        assert "shared_w1" not in fused and "shared_w2" not in fused
        f1a, f1b = np.asarray(fused["w1"]["a"]), np.asarray(fused["w1"]["b"])
        f2a, f2b = np.asarray(fused["w2"]["a"]), np.asarray(fused["w2"]["b"])
        assert f1a.shape[2] == E + ns and f2a.shape[2] == E + ns
        # routed experts untouched
        np.testing.assert_array_equal(f1a[:, :, :E], layers["w1"]["a"])
        np.testing.assert_array_equal(f2b[:, :, :E], layers["w2"]["b"])
        # virtual expert j's delta == the matching block of the shared delta
        d1 = np.einsum("ladr,larf->ladf", layers["shared_w1"]["a"],
                       layers["shared_w1"]["b"])  # [L, A, D, 2Is]
        d2 = np.einsum("lair,lard->laid", layers["shared_w2"]["a"],
                       layers["shared_w2"]["b"])  # [L, A, Is, D]
        for j in range(ns):
            v1 = np.einsum("ladr,larf->ladf", f1a[:, :, E + j], f1b[:, :, E + j])
            np.testing.assert_allclose(v1[..., :I], d1[..., j * I:(j + 1) * I],
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(
                v1[..., I:], d1[..., Is + j * I:Is + (j + 1) * I],
                rtol=1e-5, atol=1e-5)
            v2 = np.einsum("lair,lard->laid", f2a[:, :, E + j], f2b[:, :, E + j])
            np.testing.assert_allclose(v2, d2[:, :, j * I:(j + 1) * I],
                                       rtol=1e-5, atol=1e-5)

    def test_lm_forward_fused_base_matches_unfused(self):
        """Full-stack parity: fused base + fused adapters == unfused base +
        training-format adapters, per lane, incl. the base (index-0) lane."""
        from aria_tpu.engine.multi_lora import fuse_shared_adapters
        from aria_tpu.ops.quant import fuse_shared_experts

        tc = TINY.text
        params = make_params()
        lora1, lc1 = make_adapter(1, rank=8)
        lora2, lc2 = make_adapter(2, rank=4)
        reg = AdapterRegistry({"t1": lora1, "t2": lora2},
                              scales={"t1": lc1.scale, "t2": lc2.scale})
        fused_base = fuse_shared_experts({"lm": params["lm"]})["lm"]
        fused_stack = {"layers": fuse_shared_adapters(
            reg.stacked["layers"], tc.num_experts, tc.num_shared_experts,
            tc.moe_intermediate_size)}

        tokens = jnp.asarray(np.random.RandomState(0).randint(
            1, 400, size=(3, 16)), jnp.int32)
        onehot = reg.lane_onehot([reg.resolve("t1"), 0, reg.resolve("t2")])
        ref = lm_forward(params["lm"], tc, tokens, lora=reg.stacked,
                         lora_scale=1.0, lora_onehot=onehot).logits
        got = lm_forward(fused_base, tc, tokens, lora=fused_stack,
                         lora_scale=1.0, lora_onehot=onehot).logits
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=3e-4, atol=3e-4)

    def test_engine_on_fused_base_matches_cacheless_reference(self):
        """BatchedEngine built on a FUSED base with a training-format registry
        (registry_for_params fires in the constructor) reproduces the
        cacheless unfused greedy reference per adapter."""
        from aria_tpu.ops.quant import fuse_shared_experts

        params = make_params()
        lora1, lc1 = make_adapter(1, rank=8)
        reg = AdapterRegistry({"t1": lora1}, scales={"t1": lc1.scale})
        fused = dict(params)
        fused["lm"] = fuse_shared_experts({"lm": params["lm"]})["lm"]

        prompt = [5, 17, 3]
        n = 6
        exp_t1 = _greedy_full(params, prompt, n, lora1, lc1.scale)
        exp_base = _greedy_full(params, prompt, n)

        srv = BatchedEngine(fused, TINY, max_lanes=2, max_seq_len=128,
                            temperature=0.0, decode_chunk=3,
                            cache_dtype=jnp.float32, adapters=reg)
        u1 = srv.submit(prompt, max_new_tokens=n, adapter="t1")
        u0 = srv.submit(prompt, max_new_tokens=n)
        fin = {r.uid: r for r in srv.run_until_complete()}
        assert fin[u1].generated == exp_t1, (fin[u1].generated, exp_t1)
        assert fin[u0].generated == exp_base
        assert exp_t1 != exp_base  # the adapter does something

    def test_registry_for_params_passthrough_on_training_base(self):
        from aria_tpu.engine.multi_lora import registry_for_params

        params = make_params()
        lora1, lc1 = make_adapter(1)
        reg = AdapterRegistry({"t1": lora1}, scales={"t1": lc1.scale})
        assert registry_for_params(reg, params["lm"]["layers"], TINY.text) is reg


class TestBlockedExpertLora:
    """The quantized-base expert-LoRA path dequantizes one expert block at a
    time (moe_lm._experts_lora_blocked) — a whole flagship layer in fp is a
    ~4GB temp that OOMs beside the resident int4 model. Blocked must equal
    the unblocked dequant + experts_grouped capacity path."""

    def _stacks(self, E=6, D=256, I=128, seed=0):
        from aria_tpu.ops.quant import quantize_expert_int4

        rng = np.random.RandomState(seed)
        w1 = jnp.asarray(rng.randn(E, 2 * I, D).astype(np.float32) * 0.05)
        w2 = jnp.asarray(rng.randn(E, I, D).astype(np.float32) * 0.05)
        return quantize_expert_int4(w1, w2)

    def test_blocked_matches_unblocked(self):
        import os

        from aria_tpu.models.moe_lm import _experts_lora_blocked
        from aria_tpu.ops.moe import experts_grouped
        from aria_tpu.ops.quant import dequantize_expert_weights

        E, D, I, T, k, r = 6, 256, 128, 10, 2, 4
        w1q, w2q = self._stacks(E, D, I)
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(T, D).astype(np.float32) * 0.3)
        idx = jnp.asarray(rng.randint(0, E, (T, k)).astype(np.int32))
        wts = jnp.asarray(rng.rand(T, k).astype(np.float32))

        for multi in (False, True):
            lead = (3, E) if multi else (E,)
            lw1 = {"a": jnp.asarray(rng.randn(*lead, D, r).astype(np.float32) * 0.1),
                   "b": jnp.asarray(rng.randn(*lead, r, 2 * I).astype(np.float32) * 0.1)}
            lw2 = {"a": jnp.asarray(rng.randn(*lead, I, r).astype(np.float32) * 0.1),
                   "b": jnp.asarray(rng.randn(*lead, r, D).astype(np.float32) * 0.1)}
            oh = None
            if multi:
                ids = rng.randint(0, 3, T)
                hot = np.zeros((3, T), np.float32)
                hot[ids, np.arange(T)] = 1.0
                oh = jnp.asarray(hot)

            w1d, w2d = dequantize_expert_weights(w1q, w2q, dtype=jnp.float32)
            ref = experts_grouped(x, idx, wts, w1d, w2d, lora_w1=lw1,
                                  lora_w2=lw2, lora_scale=0.5, lora_onehot=oh)
            os.environ["ARIA_TPU_LORA_EBLOCK"] = "2"
            try:
                out = _experts_lora_blocked(
                    x, idx, wts, w1q, w2q, {"w1": lw1, "w2": lw2}, 0.5, oh,
                    jnp.float32)
            finally:
                del os.environ["ARIA_TPU_LORA_EBLOCK"]
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=3e-5, atol=3e-5)

    def test_block_size_fallback_divides(self):
        import os

        from aria_tpu.models.moe_lm import _experts_lora_blocked

        # E=6 with a non-dividing env override falls back to a divisor
        w1q, w2q = self._stacks()
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(4, 256).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 6, (4, 2)).astype(np.int32))
        wts = jnp.asarray(rng.rand(4, 2).astype(np.float32))
        lw1 = {"a": jnp.zeros((6, 256, 2), jnp.float32),
               "b": jnp.zeros((6, 2, 256), jnp.float32)}
        os.environ["ARIA_TPU_LORA_EBLOCK"] = "5"
        try:
            out = _experts_lora_blocked(x, idx, wts, w1q, w2q, {"w1": lw1},
                                        1.0, None, jnp.float32)
        finally:
            del os.environ["ARIA_TPU_LORA_EBLOCK"]
        assert out.shape == x.shape

    def test_blocked_pin_layout_interpret(self):
        """pin_layout routes block slices through the Pallas identity copy
        (layout laundering on TPU); interpret mode pins numerical identity."""
        import os

        from aria_tpu.models.moe_lm import _experts_lora_blocked

        w1q, w2q = self._stacks()
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(5, 256).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 6, (5, 2)).astype(np.int32))
        wts = jnp.asarray(rng.rand(5, 2).astype(np.float32))
        lw1 = {"a": jnp.asarray(rng.randn(6, 256, 2).astype(np.float32) * 0.1),
               "b": jnp.asarray(rng.randn(6, 2, 256).astype(np.float32) * 0.1)}
        os.environ["ARIA_TPU_LORA_EBLOCK"] = "3"
        try:
            ref = _experts_lora_blocked(x, idx, wts, w1q, w2q, {"w1": lw1},
                                        1.0, None, jnp.float32)
            os.environ["ARIA_TPU_KERNELS"] = "interpret"
            from aria_tpu.ops import backend
            backend.kernel_backend.cache_clear()
            out = _experts_lora_blocked(x, idx, wts, w1q, w2q, {"w1": lw1},
                                        1.0, None, jnp.float32,
                                        pin_layout=True)
        finally:
            del os.environ["ARIA_TPU_LORA_EBLOCK"]
            os.environ.pop("ARIA_TPU_KERNELS", None)
            from aria_tpu.ops import backend
            backend.kernel_backend.cache_clear()
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)
