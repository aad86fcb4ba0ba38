"""Composite token-fidelity golden: greedy token-stream equality vs torch.

A tiny torch decoder implementing the reference gpt-fast semantics
(/root/reference/gptfast/model.py:300-470) — fused wqkv, interleaved-pair
RoPE (model.py:500-531), softmax-AFTER-topk routing (model.py:359-363), the
T<50 gathered-expert path (model.py:315-341), shared-expert GLU, RMSNorm —
is run as the independent oracle. The same weights are mapped into this
framework's param tree and Engine.generate (cached, bucketed decode) must
produce the identical greedy continuation token-for-token for 64 steps.

Module-level parity (HF Llama attention, ViT, projector, aux losses) lives in
the other test files; this is the end-to-end check SURVEY §7 stage 3 asks for.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F
import jax
import jax.numpy as jnp

from aria_tpu.config import AriaConfig
from aria_tpu.engine.generate import Engine, GenerationConfig
from aria_tpu.models.moe_lm import lm_forward

TINY = AriaConfig.tiny()
STEPS = 64


# ------------------------------------------------------------ torch oracle

def _rms(x, w, eps=1e-5):
    return x * torch.rsqrt(torch.mean(x * x, dim=-1, keepdim=True) + eps) * w


def _rope_interleaved(x, pos, base):
    # x: [B, S, H, Dh]; rotate interleaved pairs, angles in fp32
    B, S, H, Dh = x.shape
    freqs = 1.0 / (base ** (torch.arange(0, Dh, 2, dtype=torch.float64) / Dh))
    ang = pos.to(torch.float64)[:, None] * freqs[None, :]  # [S, Dh/2]
    cos = ang.cos().float()[None, :, None, :]
    sin = ang.sin().float()[None, :, None, :]
    xe, xo = x[..., 0::2], x[..., 1::2]
    out = torch.stack([xe * cos - xo * sin, xo * cos + xe * sin], dim=-1)
    return out.reshape(B, S, H, Dh)


class TorchOracle(torch.nn.Module):
    """Reference-semantics decoder (full re-forward per step; no cache)."""

    def __init__(self, tc, seed=0):
        super().__init__()
        torch.manual_seed(seed)
        D, Dh, H = tc.hidden_size, tc.head_dim, tc.num_heads
        E, I = tc.num_experts, tc.moe_intermediate_size
        Is = tc.shared_intermediate_size
        self.tc = tc
        g = lambda *s: torch.nn.Parameter(torch.randn(*s) * 0.05)
        self.embed = g(tc.vocab_size, D)
        self.layers = torch.nn.ModuleList()
        for _ in range(tc.num_layers):
            lyr = torch.nn.Module()
            lyr.attn_norm = g(D)
            lyr.ffn_norm = g(D)
            qkv_out = (H + 2 * tc.num_kv_heads) * Dh
            lyr.wqkv = g(qkv_out, D)
            lyr.wo = g(D, H * Dh)
            lyr.gate = g(E, D)
            lyr.w1 = g(E, I, D)  # silu branch (reference w1)
            lyr.w3 = g(E, I, D)  # up branch (reference w3)
            lyr.w2 = g(E, D, I)
            lyr.sw1 = g(Is, D)
            lyr.sw3 = g(Is, D)
            lyr.sw2 = g(D, Is)
            self.layers.append(lyr)
        self.final_norm = g(D)
        self.lm_head = g(tc.vocab_size, D)

    def forward(self, tokens):  # [S] -> [S, V]
        tc = self.tc
        H, Dh = tc.num_heads, tc.head_dim
        S = tokens.shape[0]
        x = self.embed[tokens][None]  # [1, S, D]
        pos = torch.arange(S)
        for lyr in self.layers:
            h = _rms(x, lyr.attn_norm)
            qkv = h @ lyr.wqkv.T
            q, k, v = qkv.split([H * Dh, tc.num_kv_heads * Dh, tc.num_kv_heads * Dh], dim=-1)
            q = _rope_interleaved(q.view(1, S, H, Dh), pos, tc.rope_base)
            k = _rope_interleaved(k.view(1, S, tc.num_kv_heads, Dh), pos, tc.rope_base)
            v = v.view(1, S, tc.num_kv_heads, Dh)
            q, k, v = (t.transpose(1, 2) for t in (q, k, v))
            y = F.scaled_dot_product_attention(q, k, v, is_causal=True)
            y = y.transpose(1, 2).reshape(1, S, H * Dh)
            x = x + y @ lyr.wo.T

            h = _rms(x, lyr.ffn_norm).view(S, -1)
            scores = h @ lyr.gate.T  # [S, E]
            top_w, top_i = torch.topk(scores, tc.moe_topk, dim=-1)
            top_w = F.softmax(top_w, dim=-1)  # softmax AFTER topk
            w1g, w3g, w2g = lyr.w1[top_i], lyr.w3[top_i], lyr.w2[top_i]
            x1 = F.silu(torch.einsum("ti,taoi->tao", h, w1g))
            x3 = torch.einsum("ti,taoi->tao", h, w3g)
            eo = torch.einsum("tao,taio->tai", x1 * x3, w2g)
            eo = torch.einsum("tai,ta->ti", eo, top_w)
            shared = (F.silu(h @ lyr.sw1.T) * (h @ lyr.sw3.T)) @ lyr.sw2.T
            x = x + (eo + shared).view(1, S, -1)
        out = _rms(x, self.final_norm)[0] @ self.lm_head.T
        return out

    def to_lm_params(self):
        """Map the torch weights into this framework's lm tree layout."""
        t = lambda p: np.asarray(p.detach().numpy())
        stack = lambda fn: jnp.asarray(np.stack([fn(l) for l in self.layers]))
        return {
            "embed": jnp.asarray(t(self.embed)),
            "layers": {
                "attn_norm": stack(lambda l: t(l.attn_norm)),
                "ffn_norm": stack(lambda l: t(l.ffn_norm)),
                "wqkv": stack(lambda l: t(l.wqkv).T),  # -> [D, qkv_out]
                "wo": stack(lambda l: t(l.wo).T),
                "gate": stack(lambda l: t(l.gate)).astype(jnp.float32),
                # fused GLU rows: [silu branch; up branch] out-major [E, 2I, D]
                "w1": stack(lambda l: np.concatenate([t(l.w1), t(l.w3)], axis=1)),
                "w2": stack(lambda l: t(l.w2).transpose(0, 2, 1)),  # [E, I, D]
                "shared_w1": stack(lambda l: np.concatenate([t(l.sw1), t(l.sw3)], axis=0).T),
                "shared_w2": stack(lambda l: t(l.sw2).T),
            },
            "final_norm": jnp.asarray(t(self.final_norm)),
            "lm_head": jnp.asarray(t(self.lm_head).T),
        }


@pytest.fixture(scope="module")
def oracle():
    return TorchOracle(TINY.text)


class TestCompositeTokenFidelity:
    def _torch_greedy(self, oracle, prompt, steps):
        seq = list(prompt)
        out = []
        with torch.no_grad():
            for _ in range(steps):
                logits = oracle(torch.tensor(seq, dtype=torch.long))
                nxt = int(torch.argmax(logits[-1]))
                out.append(nxt)
                seq.append(nxt)
        return out

    def test_full_forward_logits_close(self, oracle):
        """Sanity anchor: one uncached forward matches torch to fp32 noise."""
        prompt = [5, 17, 3, 200, 42, 7, 9]
        with torch.no_grad():
            ref = oracle(torch.tensor(prompt, dtype=torch.long)).numpy()
        got = lm_forward(
            oracle.to_lm_params(), TINY.text,
            jnp.asarray([prompt], jnp.int32),
        ).logits[0]
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    def test_greedy_stream_matches_torch_64_steps(self, oracle):
        """Any single-token divergence over 64 cached-decode steps fails."""
        prompt = [5, 17, 3, 200, 42]
        want = self._torch_greedy(oracle, prompt, STEPS)

        params = {"lm": oracle.to_lm_params()}
        eng = Engine(params, TINY, max_seq_len=256, cache_dtype=jnp.float32)
        res = eng.generate(
            prompt,
            GenerationConfig(max_new_tokens=STEPS, temperature=0.0, top_k=None,
                             decode_chunk=8),
        )
        assert list(res.tokens) == want, (
            f"diverged at step {next(i for i, (a, b) in enumerate(zip(res.tokens, want)) if a != b)}"
        )
