"""Unit tests for core ops against independent numpy/torch references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from aria_tpu.ops.activations import gelu_tanh, silu
from aria_tpu.ops.attention import causal_mask, sdpa
from aria_tpu.ops.moe import experts_gather, experts_grouped, route_topk
from aria_tpu.ops.norms import layer_norm, rms_norm
from aria_tpu.ops.rope import apply_rope, precompute_rope


def t2j(t):
    return jnp.asarray(t.detach().numpy())


class TestNorms:
    def test_rms_norm_matches_torch(self):
        x = torch.randn(2, 5, 16, dtype=torch.float32)
        w = torch.randn(16)
        ref = x * torch.rsqrt(x.pow(2).mean(-1, keepdim=True) + 1e-5) * w
        got = rms_norm(t2j(x), t2j(w), 1e-5)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-5)

    def test_layer_norm_matches_torch(self):
        x = torch.randn(2, 5, 16)
        w, b = torch.randn(16), torch.randn(16)
        ref = F.layer_norm(x, (16,), w, b, 1e-6)
        got = layer_norm(t2j(x), t2j(w), t2j(b), 1e-6)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-5)


class TestRope:
    def test_interleaved_rope_matches_reference_formula(self):
        """Reference: gptfast/model.py:500-531 (complex polar form, interleaved)."""
        B, S, H, D = 2, 7, 3, 8
        base = 5_000_000.0
        x = torch.randn(B, S, H, D)

        freqs = 1.0 / (base ** (torch.arange(0, D, 2).float() / D))
        t = torch.arange(S)
        fr = torch.outer(t.float(), freqs)
        fc = torch.polar(torch.ones_like(fr), fr)  # [S, D/2] complex
        xs = x.reshape(B, S, H, D // 2, 2)
        fc_ = fc.view(1, S, 1, D // 2)
        ref = torch.stack(
            [
                xs[..., 0] * fc_.real - xs[..., 1] * fc_.imag,
                xs[..., 1] * fc_.real + xs[..., 0] * fc_.imag,
            ],
            -1,
        ).reshape(B, S, H, D)

        cos, sin = precompute_rope(jnp.arange(S), D, base)
        got = apply_rope(t2j(x), cos, sin)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-4)

    def test_rope_with_offset_positions(self):
        S, D = 4, 8
        cos_full, sin_full = precompute_rope(jnp.arange(10), D, 1e4)
        cos_off, sin_off = precompute_rope(jnp.arange(3, 3 + S), D, 1e4)
        np.testing.assert_allclose(np.asarray(cos_full[3 : 3 + S]), np.asarray(cos_off), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(sin_full[3 : 3 + S]), np.asarray(sin_off), rtol=1e-6)


class TestAttention:
    def test_sdpa_matches_torch(self):
        B, Sq, Sk, H, D = 2, 5, 7, 4, 16
        q = torch.randn(B, Sq, H, D)
        k = torch.randn(B, Sk, H, D)
        v = torch.randn(B, Sk, H, D)
        mask = torch.rand(B, 1, Sq, Sk) > 0.3
        mask[..., 0] = True  # no fully-masked rows
        ref = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2), attn_mask=mask
        ).transpose(1, 2)
        got = sdpa(t2j(q), t2j(k), t2j(v), t2j(mask))
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-4)

    def test_causal_mask_offset(self):
        m = causal_mask(2, 6, offset=3)[0, 0]
        expected = np.array(
            [[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 0]], dtype=bool
        )
        np.testing.assert_array_equal(np.asarray(m), expected)


class TestMoE:
    def _setup(self, T=11, D=16, E=8, k=2, I=12, seed=0):
        rng = np.random.RandomState(seed)
        x = jnp.asarray(rng.randn(T, D).astype(np.float32))
        gate = jnp.asarray(rng.randn(E, D).astype(np.float32))
        w1 = jnp.asarray(rng.randn(E, 2 * I, D).astype(np.float32)) * 0.1
        w2 = jnp.asarray(rng.randn(E, I, D).astype(np.float32)) * 0.1
        return x, gate, w1, w2, k

    def test_routing_softmax_over_topk_only(self):
        """Reference semantics: softmax AFTER topk (moe_lm.py:261-262)."""
        x, gate, _, _, k = self._setup()
        out = route_topk(x, gate, k)
        logits = np.asarray(x) @ np.asarray(gate).T
        top_idx = np.argsort(-logits, axis=-1, kind="stable")[:, :k]
        top_log = np.take_along_axis(logits, top_idx, axis=-1)
        ref_w = np.exp(top_log - top_log.max(-1, keepdims=True))
        ref_w /= ref_w.sum(-1, keepdims=True)
        np.testing.assert_array_equal(np.asarray(out.indices), top_idx)
        np.testing.assert_allclose(np.asarray(out.weights), ref_w, rtol=1e-5)
        assert int(out.tokens_per_expert.sum()) == x.shape[0] * k

    def test_gather_and_grouped_paths_agree(self):
        x, gate, w1, w2, k = self._setup()
        r = route_topk(x, gate, k)
        a = experts_gather(x, r.indices, r.weights, w1, w2)
        b = experts_grouped(x, r.indices, r.weights, w1, w2)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)

    def test_grouped_matches_torch_reference_semantics(self):
        """Independent torch reference of the whole MoE FFN math."""
        x, gate, w1, w2, k = self._setup(T=23)
        r = route_topk(x, gate, k)
        got = experts_grouped(x, r.indices, r.weights, w1, w2)

        xt = torch.tensor(np.asarray(x))
        w1t = torch.tensor(np.asarray(w1))
        w2t = torch.tensor(np.asarray(w2))
        idx = torch.tensor(np.asarray(r.indices))
        wts = torch.tensor(np.asarray(r.weights))
        T = xt.shape[0]
        ref = torch.zeros_like(xt)
        for t in range(T):
            acc = torch.zeros(xt.shape[1])
            for j in range(k):
                e = idx[t, j].item()
                h = w1t[e] @ xt[t]  # out-major [2I, D] @ [D]
                g, u = h.chunk(2)
                h = F.silu(g) * u
                acc += wts[t, j] * (h @ w2t[e])
            ref[t] = acc
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-3, atol=1e-4)

    def test_capacity_drops_tokens(self):
        x, gate, w1, w2, k = self._setup(T=11)
        r = route_topk(x, gate, k)
        full = experts_grouped(x, r.indices, r.weights, w1, w2, capacity=11)
        dropped = experts_grouped(x, r.indices, r.weights, w1, w2, capacity=1)
        assert not np.allclose(np.asarray(full), np.asarray(dropped))

    def test_aux_losses_match_reference_formulas(self):
        """z-loss (moe_lm.py:128-140) and switch aux loss (moe_lm.py:143-166)."""
        x, gate, _, _, k = self._setup()
        coeff_z, coeff_a = 1e-5, 1e-3
        out = route_topk(x, gate, k, z_loss_coeff=coeff_z, aux_loss_coeff=coeff_a, training=True)

        logits = torch.tensor(np.asarray(x)) @ torch.tensor(np.asarray(gate)).T
        ref_z = torch.mean(torch.square(torch.logsumexp(logits, dim=-1))) * coeff_z
        probs = torch.softmax(logits, dim=-1)
        tpe = torch.tensor(np.asarray(out.tokens_per_expert), dtype=torch.float32)
        E = logits.shape[1]
        num_tokens = logits.shape[0] * k
        ref_aux = torch.sum(probs.mean(0) * tpe) * (E / num_tokens * coeff_a)
        np.testing.assert_allclose(float(out.z_loss), float(ref_z), rtol=1e-5)
        np.testing.assert_allclose(float(out.aux_loss), float(ref_aux), rtol=1e-5)

    def test_inference_mode_no_aux_loss(self):
        x, gate, _, _, k = self._setup()
        out = route_topk(x, gate, k, z_loss_coeff=1.0, aux_loss_coeff=1.0, training=False)
        assert float(out.z_loss) == 0.0 and float(out.aux_loss) == 0.0


class TestActivations:
    def test_gelu_tanh_matches_torch(self):
        x = torch.randn(100)
        ref = F.gelu(x, approximate="tanh")
        got = gelu_tanh(t2j(x))
        # XLA's tanh differs from libm's by ~1ulp-of-bf16-ish; allow 1e-3 rel.
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-3, atol=1e-5)

    def test_silu_matches_torch(self):
        x = torch.randn(100)
        np.testing.assert_allclose(np.asarray(silu(t2j(x))), F.silu(x).numpy(), rtol=1e-5, atol=1e-6)


class TestSamplingFilters:
    """Nucleus/min-p/penalty sampling ops (OpenAI + vLLM parameter parity;
    the reference reaches these via vLLM, docs/inference.md:80-149)."""

    def _logits(self):
        # probs [0.5, 0.3, 0.15, 0.05]
        import math

        return jnp.log(jnp.array([[0.5, 0.3, 0.15, 0.05]], jnp.float32))

    def test_top_p_keeps_minimal_prefix(self):
        from aria_tpu.engine.sampling import filter_top_p

        out = np.asarray(filter_top_p(self._logits(), jnp.array([0.7])))[0]
        assert out[0] > -1e29 and out[1] > -1e29
        assert out[2] < -1e29 and out[3] < -1e29
        # exactly reaching p with the first token keeps only it
        out = np.asarray(filter_top_p(self._logits(), jnp.array([0.5])))[0]
        assert out[0] > -1e29 and (out[1:] < -1e29).all()

    def test_top_p_one_passes_through(self):
        from aria_tpu.engine.sampling import filter_top_p

        out = np.asarray(filter_top_p(self._logits(), jnp.array([1.0])))[0]
        assert (out > -1e29).all()

    def test_top_p_per_row(self):
        from aria_tpu.engine.sampling import filter_top_p

        logits = jnp.tile(self._logits(), (2, 1))
        out = np.asarray(filter_top_p(logits, jnp.array([0.5, 1.0])))
        assert (out[0, 1:] < -1e29).all() and (out[1] > -1e29).all()

    def test_top_p_tail_beyond_shortlist_kept_when_head_mass_insufficient(self):
        from aria_tpu.engine.sampling import filter_top_p

        logits = jnp.zeros((1, 1000), jnp.float32)  # uniform
        out = np.asarray(filter_top_p(logits, jnp.array([0.9]), shortlist=256))
        # head of 256 uniform tokens carries 0.256 < 0.9: pass through
        assert (out > -1e29).all()

    def test_min_p(self):
        from aria_tpu.engine.sampling import filter_min_p

        out = np.asarray(filter_min_p(self._logits(), jnp.array([0.4])))[0]
        # threshold = 0.4 * 0.5 = 0.2: keeps 0.5 and 0.3
        assert out[0] > -1e29 and out[1] > -1e29
        assert out[2] < -1e29 and out[3] < -1e29
        out = np.asarray(filter_min_p(self._logits(), jnp.array([0.0])))[0]
        assert (out > -1e29).all()

    def test_penalties(self):
        from aria_tpu.engine.sampling import apply_penalties

        logits = jnp.array([[2.0, -1.0, 0.5, 1.0]], jnp.float32)
        counts = jnp.array([[3, 1, 0, 0]], jnp.int32)
        prompt_mask = jnp.array([[False, False, True, False]])
        out = np.asarray(apply_penalties(
            logits, counts, prompt_mask,
            presence=jnp.array([0.1]), frequency=jnp.array([0.2]),
            repetition=jnp.array([2.0])))[0]
        # vLLM order: repetition on the RAW logits first, then pres/freq.
        # tok0: output-seen: 2/2 (positive) = 1.0, then -0.1 - 3*0.2 = 0.3
        np.testing.assert_allclose(out[0], 0.3, rtol=1e-6)
        # tok1: output-seen: -1*2 = -2.0 (negative), then -0.1 - 0.2 = -2.3
        np.testing.assert_allclose(out[1], -2.3, rtol=1e-6)
        # tok2: prompt-only: repetition applies, presence/frequency don't
        np.testing.assert_allclose(out[2], 0.25, rtol=1e-6)
        # tok3: unseen: untouched
        np.testing.assert_allclose(out[3], 1.0, rtol=1e-6)

    def test_update_counts_masks_inactive(self):
        from aria_tpu.engine.sampling import update_counts

        counts = jnp.zeros((2, 5), jnp.int32)
        toks = jnp.array([1, 3], jnp.int32)
        out = np.asarray(update_counts(counts, toks, jnp.array([True, False])))
        assert out[0, 1] == 1 and out[1].sum() == 0

    def test_sample_top_p_composes(self):
        from aria_tpu.engine.sampling import sample

        logits = jnp.tile(self._logits(), (64, 1))
        out = np.asarray(sample(jax.random.PRNGKey(0), logits,
                                temperature=1.0, top_k=3,
                                top_p=jnp.full((64,), 0.7)))
        assert set(out.tolist()) <= {0, 1}
