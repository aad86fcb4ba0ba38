"""Pallas kernel parity tests (interpret mode, CPU).

The kernels also run compiled on real TPU via bench.py and the engine
fidelity checks; these tests pin their semantics against the XLA reference
paths on every CI run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aria_tpu.ops.attention import sdpa
from aria_tpu.ops.decode_attention import decode_attention
from aria_tpu.ops.moe import experts_gather, route_topk
from aria_tpu.ops.moe_decode_kernel import moe_decode, moe_decode_int4, moe_decode_quant
from aria_tpu.ops.quant import (
    _with_s8,
    dequantize_expert_weights,
    dequantize_weight,
    quantize_expert_int4,
    quantize_weight,
)


@pytest.fixture(scope="module")
def moe_setup():
    rng = np.random.RandomState(0)
    L, T, D, E, k, I = 2, 5, 256, 8, 6, 512
    return {
        "x": jnp.asarray(rng.randn(T, D).astype(np.float32)),
        "gate": jnp.asarray(rng.randn(E, D).astype(np.float32)),
        "w1": jnp.asarray(rng.randn(L, E, 2 * I, D).astype(np.float32)) * 0.05,
        "w2": jnp.asarray(rng.randn(L, E, I, D).astype(np.float32)) * 0.05,
        "k": k, "L": L,
    }


class TestMoEDecodeKernel:
    def test_matches_gather_all_layers(self, moe_setup):
        s = moe_setup
        r = route_topk(s["x"], s["gate"], s["k"])
        for l in range(s["L"]):
            ref = experts_gather(s["x"], r.indices, r.weights, s["w1"][l], s["w2"][l])
            got = moe_decode(s["x"], r.indices, r.weights, s["w1"], s["w2"],
                             jnp.int32(l), ft=256, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)

    def test_quant_variant(self, moe_setup):
        s = moe_setup
        r = route_topk(s["x"], s["gate"], s["k"])
        w1q = _with_s8(quantize_weight(s["w1"], input_axis=-1))
        w2q = _with_s8(quantize_weight(s["w2"], input_axis=-2))
        for l in range(s["L"]):
            w1d = dequantize_weight({"q": w1q["q"][l], "s": w1q["s"][l]}, input_axis=-1, dtype=jnp.float32)
            w2d = dequantize_weight({"q": w2q["q"][l], "s": w2q["s"][l]}, input_axis=-2, dtype=jnp.float32)
            ref = experts_gather(s["x"], r.indices, r.weights, w1d, w2d)
            got = moe_decode_quant(s["x"], r.indices, r.weights,
                                   w1q["q"], w1q["s8"], w2q["q"], w2q["s8"],
                                   jnp.int32(l), ft=256, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-3)

    def test_int4_variant(self, moe_setup):
        """int4 kernel must match the XLA path run on the DEQUANTIZED weights
        exactly (same values through a different pipeline); int4-vs-fp error
        itself is covered in test_quant.py."""
        s = moe_setup
        r = route_topk(s["x"], s["gate"], s["k"])
        w1q, w2q = quantize_expert_int4(s["w1"], s["w2"])
        for l in range(s["L"]):
            w1d, w2d = dequantize_expert_weights(
                {k2: v[l] for k2, v in w1q.items()},
                {k2: v[l] for k2, v in w2q.items()}, dtype=jnp.float32)
            ref = experts_gather(s["x"], r.indices, r.weights, w1d, w2d)
            got = moe_decode_int4(s["x"], r.indices, r.weights,
                                  w1q["q4"], w1q["sg"], w2q["q4"], w2q["s8"],
                                  jnp.int32(l), ft=256, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-3)

    def test_int4_64_lanes_matches_gather(self, moe_setup):
        """64-lane serving steps (DECODE_KERNEL_MAX_TOKENS) stay on the
        unique-expert kernel: T=64 > E means every expert is active and each
        is DMA'd exactly once."""
        s = moe_setup
        rng = np.random.RandomState(7)
        x64 = jnp.asarray(rng.randn(64, s["x"].shape[1]).astype(np.float32))
        r = route_topk(x64, s["gate"], s["k"])
        w1q, w2q = quantize_expert_int4(s["w1"], s["w2"])
        w1d, w2d = dequantize_expert_weights(
            {k2: v[0] for k2, v in w1q.items()},
            {k2: v[0] for k2, v in w2q.items()}, dtype=jnp.float32)
        ref = experts_gather(x64, r.indices, r.weights, w1d, w2d)
        got = moe_decode_int4(x64, r.indices, r.weights,
                              w1q["q4"], w1q["sg"], w2q["q4"], w2q["s8"],
                              jnp.int32(0), ft=256, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-3, atol=5e-3)

    def test_int4_a8_variant_integer_path_exact(self, moe_setup):
        """W4A8: feeding the dequantized-int8 activations through the XLA
        reference must match the kernel's integer-dot pipeline — isolates the
        biased-lo integer identity from the activation-quant noise."""
        from aria_tpu.ops.moe_decode_kernel import act_quant_int8
        from aria_tpu.ops.quant import int4_group_count

        s = moe_setup
        T, D = s["x"].shape
        ng = int4_group_count(D)
        r = route_topk(s["x"], s["gate"], s["k"])
        w1q, w2q = quantize_expert_int4(s["w1"], s["w2"])
        xq, sx = act_quant_int8(s["x"], ng)
        x_dq = (
            np.asarray(xq, np.float32).reshape(T, ng, D // ng)
            * np.asarray(sx)[:, :ng, None]
        ).reshape(T, D)
        for l in range(s["L"]):
            w1d, w2d = dequantize_expert_weights(
                {k2: v[l] for k2, v in w1q.items()},
                {k2: v[l] for k2, v in w2q.items()}, dtype=jnp.float32)
            ref = experts_gather(jnp.asarray(x_dq), r.indices, r.weights, w1d, w2d)
            got = moe_decode_int4(s["x"], r.indices, r.weights,
                                  w1q["q4"], w1q["sg"], w2q["q4"], w2q["s8"],
                                  jnp.int32(l), ft=256, interpret=True,
                                  act_int8=True)
            # the only remaining divergence is the in-kernel int8 h
            # re-quantization before the down-projection
            err = np.max(np.abs(np.asarray(got) - np.asarray(ref)))
            scale = np.max(np.abs(np.asarray(ref)))
            assert err / scale < 2e-2, (err, scale)

    def test_int4_a8_variant_close_to_bf16_act(self, moe_setup):
        """End-to-end: W4A8 output must track the bf16-activation int4 kernel
        within the int8 activation-quant noise band."""
        s = moe_setup
        r = route_topk(s["x"], s["gate"], s["k"])
        w1q, w2q = quantize_expert_int4(s["w1"], s["w2"])
        a = moe_decode_int4(s["x"], r.indices, r.weights,
                            w1q["q4"], w1q["sg"], w2q["q4"], w2q["s8"],
                            jnp.int32(0), ft=256, interpret=True, act_int8=False)
        b = moe_decode_int4(s["x"], r.indices, r.weights,
                            w1q["q4"], w1q["sg"], w2q["q4"], w2q["s8"],
                            jnp.int32(0), ft=256, interpret=True, act_int8=True)
        err = np.max(np.abs(np.asarray(a) - np.asarray(b)))
        scale = np.max(np.abs(np.asarray(a)))
        assert err / scale < 3e-2, (err, scale)

    def test_single_token(self, moe_setup):
        s = moe_setup
        x1 = s["x"][:1]
        r = route_topk(x1, s["gate"], s["k"])
        ref = experts_gather(x1, r.indices, r.weights, s["w1"][0], s["w2"][0])
        got = moe_decode(x1, r.indices, r.weights, s["w1"], s["w2"],
                         jnp.int32(0), ft=256, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


class TestMoEPrefillKernel:
    def test_segment_dispatch_tiles_are_single_expert(self, moe_setup):
        from aria_tpu.ops.moe_prefill_kernel import TM, segment_dispatch

        s = moe_setup
        r = route_topk(s["x"], s["gate"], s["k"])
        dest, tile_e, R = segment_dispatch(r.indices, 8)
        dest, tile_e = np.asarray(dest), np.asarray(tile_e)
        flat_e = np.asarray(r.indices).reshape(-1)
        assert len(set(dest.tolist())) == dest.size  # no collisions
        for slot, row in enumerate(dest):
            assert tile_e[row // TM] == flat_e[slot]  # slot lands in its expert's tile

    def test_int4_prefill_matches_gather(self, moe_setup):
        from aria_tpu.ops.moe_prefill_kernel import experts_segmented_int4

        s = moe_setup
        T = 40  # prefill-sized: beyond the decode-kernel token bound
        x = jnp.concatenate([s["x"]] * 8)[:T]
        r = route_topk(x, s["gate"], s["k"])
        w1q, w2q = quantize_expert_int4(s["w1"], s["w2"])
        for l in range(s["L"]):
            w1d, w2d = dequantize_expert_weights(
                {k2: v[l] for k2, v in w1q.items()},
                {k2: v[l] for k2, v in w2q.items()}, dtype=jnp.float32)
            ref = experts_gather(x, r.indices, r.weights, w1d, w2d)
            got = experts_segmented_int4(
                x, r.indices, r.weights,
                w1q["q4"], w1q["sg"], w2q["q4"], w2q["s8"],
                jnp.int32(l), ft=256, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=5e-3, atol=5e-3)


class TestDenseInt4Kernel:
    def _setup(self):
        rng = np.random.RandomState(3)
        L, D, F = 2, 256, 512
        w = jnp.asarray(rng.randn(L, D, F).astype(np.float32)) * 0.05
        x = jnp.asarray(rng.randn(5, D).astype(np.float32))
        return x, w

    def test_matches_dequantized_matmul(self):
        from aria_tpu.ops.dense_int4 import (
            dense_int4, dequantize_dense_int4, quantize_dense_int4,
        )

        x, w = self._setup()
        wq = quantize_dense_int4(w)
        for l in range(2):
            wd = dequantize_dense_int4(
                {k: v[l] for k, v in wq.items()}, dtype=jnp.float32)
            ref = np.asarray(x) @ np.asarray(wd)
            got = dense_int4(x, wq, jnp.int32(l), tn=256, interpret=True)
            np.testing.assert_allclose(np.asarray(got), ref, rtol=5e-3, atol=5e-3)

    def test_a8_variant_tracks_bf16_act(self):
        from aria_tpu.ops.dense_int4 import dense_int4, quantize_dense_int4

        x, w = self._setup()
        wq = quantize_dense_int4(w)
        a = dense_int4(x, wq, jnp.int32(0), tn=256, interpret=True)
        b = dense_int4(x, wq, jnp.int32(0), tn=256, interpret=True, act_int8=True)
        err = np.max(np.abs(np.asarray(a) - np.asarray(b)))
        scale = np.max(np.abs(np.asarray(a)))
        assert err / scale < 2e-2, (err, scale)


class TestDecodeAttentionKernel:
    def _setup(self):
        rng = np.random.RandomState(1)
        L, B, H, S, D = 2, 2, 4, 256, 64
        k = jnp.asarray(rng.randn(L, B, H, S, D).astype(np.float32))
        v = jnp.asarray(rng.randn(L, B, H, S, D).astype(np.float32))
        q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
        lengths = jnp.asarray([100, 200], jnp.int32)
        return k, v, q, lengths, S

    def test_matches_sdpa(self):
        k, v, q, lengths, S = self._setup()
        for l in range(2):
            out = decode_attention(q, k, v, jnp.int32(l), lengths, interpret=True, block_s=128)
            mask = (jnp.arange(S)[None, :] < lengths[:, None])[:, None, None, :]
            ref = sdpa(q[:, None], k[l].transpose(0, 2, 1, 3), v[l].transpose(0, 2, 1, 3), mask)[:, 0]
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4)

    def test_stats_merge_equals_full(self):
        """Attending over lengths-1 positions with return_stats and merging
        the last position's K/V analytically must equal attending over all
        `lengths` positions — the split the decode path uses so the cache
        write has no in-step consumer."""
        k, v, q, lengths, S = self._setup()
        B, H, D = q.shape
        l = 0
        full = decode_attention(q, k, v, jnp.int32(l), lengths,
                                interpret=True, block_s=128)
        acc, m, s = decode_attention(q, k, v, jnp.int32(l), lengths - 1,
                                     interpret=True, block_s=128,
                                     return_stats=True)
        # "fresh" K/V = the cache entries at position lengths-1
        bi = np.arange(B)
        last = np.asarray(lengths) - 1
        k1 = np.asarray(k)[l][bi, :, last]  # [B, H, D]
        v1 = np.asarray(v)[l][bi, :, last]
        score = np.sum(np.asarray(q, np.float32) * k1, axis=-1) / np.sqrt(D)
        m2 = np.maximum(np.asarray(m), score)
        corr = np.exp(np.asarray(m) - m2)
        p_new = np.exp(score - m2)
        merged = (np.asarray(acc) * corr[..., None] + p_new[..., None] * v1) / (
            np.asarray(s) * corr + p_new
        )[..., None]
        np.testing.assert_allclose(merged, np.asarray(full), rtol=2e-4, atol=2e-4)

    def test_stats_merge_empty_cache_gives_self_attention(self):
        """lengths=0 (nothing attended yet): the finite NEG_INF sentinel
        leaves garbage in acc/s, but corr = exp(m - m2) = 0 kills it in the
        merge — the result must be exactly the fresh token's value."""
        k, v, q, lengths, S = self._setup()
        B, H, D = q.shape
        acc, m, s = decode_attention(q, k, v, jnp.int32(0),
                                     jnp.zeros_like(lengths),
                                     interpret=True, block_s=128,
                                     return_stats=True)
        rng = np.random.RandomState(7)
        k1 = rng.randn(B, H, D).astype(np.float32)
        v1 = rng.randn(B, H, D).astype(np.float32)
        score = np.sum(np.asarray(q, np.float32) * k1, axis=-1) / np.sqrt(D)
        m2 = np.maximum(np.asarray(m), score)
        corr = np.exp(np.asarray(m) - m2)
        p_new = np.exp(score - m2)
        merged = (np.asarray(acc) * corr[..., None] + p_new[..., None] * v1) / (
            np.asarray(s) * corr + p_new
        )[..., None]
        assert np.all(np.isfinite(merged))
        np.testing.assert_allclose(merged, v1, rtol=1e-5, atol=1e-5)

    def test_int8_cache_variant(self):
        k, v, q, lengths, S = self._setup()
        kn, vn = np.asarray(k), np.asarray(v)
        ks = np.abs(kn).max(-1) / 127.0
        vs = np.abs(vn).max(-1) / 127.0
        k8 = np.round(kn / ks[..., None]).astype(np.int8)
        v8 = np.round(vn / vs[..., None]).astype(np.int8)
        out = decode_attention(
            q.astype(jnp.bfloat16), jnp.asarray(k8), jnp.asarray(v8), jnp.int32(1),
            lengths, jnp.asarray(ks), jnp.asarray(vs), interpret=True, block_s=128,
        )
        kd = (k8[1].astype(np.float32) * ks[1][..., None]).transpose(0, 2, 1, 3)
        vd = (v8[1].astype(np.float32) * vs[1][..., None]).transpose(0, 2, 1, 3)
        mask = (jnp.arange(S)[None, :] < lengths[:, None])[:, None, None, :]
        ref = sdpa(q[:, None], jnp.asarray(kd), jnp.asarray(vd), mask)[:, 0]
        np.testing.assert_allclose(
            np.asarray(out.astype(jnp.float32)), np.asarray(ref), rtol=2e-2, atol=5e-3
        )

    def test_int4_packed_cache_variant(self):
        """Head-pair-packed int4 cache (biased-lo bytes, moe_lm pack_heads
        layout) through the kernel's MXU-side unpack must match sdpa over
        the dequantized values. Direct kernel coverage — the engine tests
        exercise this path only end-to-end through greedy matches."""
        k, v, q, lengths, S = self._setup()
        kn, vn = np.asarray(k), np.asarray(v)
        ks = np.maximum(np.abs(kn).max(-1), 1e-6) / 7.0
        vs = np.maximum(np.abs(vn).max(-1), 1e-6) / 7.0
        k4 = np.clip(np.round(kn / ks[..., None]), -8, 7).astype(np.int8)
        v4 = np.clip(np.round(vn / vs[..., None]), -8, 7).astype(np.int8)
        H = kn.shape[2]
        Hh = H // 2

        def pack(qv):  # [L, B, H, S, D] int4 values -> [L, B, H/2, S, D] bytes
            return ((qv[:, :, :Hh] + 8) & 0xF) | (qv[:, :, Hh:] << 4)

        out = decode_attention(
            q.astype(jnp.bfloat16), jnp.asarray(pack(k4)), jnp.asarray(pack(v4)),
            jnp.int32(1), lengths,
            jnp.asarray(ks), jnp.asarray(vs),  # scales keep all H head planes
            interpret=True, block_s=128,
        )
        kd = (k4[1].astype(np.float32) * ks[1][..., None]).transpose(0, 2, 1, 3)
        vd = (v4[1].astype(np.float32) * vs[1][..., None]).transpose(0, 2, 1, 3)
        mask = (jnp.arange(S)[None, :] < lengths[:, None])[:, None, None, :]
        ref = sdpa(q[:, None], jnp.asarray(kd), jnp.asarray(vd), mask)[:, 0]
        np.testing.assert_allclose(
            np.asarray(out.astype(jnp.float32)), np.asarray(ref), rtol=4e-2, atol=2e-2
        )


class TestPagedDecodeAttentionKernel:
    """Interpret-mode coverage for the paged Pallas kernel itself.

    The paged-engine tests run on CPU where use_pallas() is False, so they
    exercise only the gather_lane_kv fallback — without these tests a drift
    in the shared _attend_block helper (as happened at round-2 HEAD) is
    invisible to the suite."""

    def _setup(self, dtype):
        from aria_tpu.config import TextConfig
        from aria_tpu.engine.paged import PagedKVCache, paged_write

        rng = np.random.RandomState(3)
        L, B, H, D, PS, NP, MAXP = 2, 2, 4, 64, 128, 7, 3
        cfg = TextConfig(
            vocab_size=64, hidden_size=H * D, num_layers=L, num_heads=H,
            num_kv_heads=H, head_dim=D,
        )
        cache = PagedKVCache.init(cfg, NP, PS, dtype=dtype)
        # lane 0 owns pages [1,2,3], lane 1 pages [4,5] (3rd entry = null page 0)
        table = jnp.asarray([[1, 2, 3], [4, 5, 0]], jnp.int32)
        lengths = jnp.asarray([300, 200], jnp.int32)  # spill across pages
        S = int(lengths.max())
        k_new = rng.randn(B, H, S, D).astype(np.float32)
        v_new = rng.randn(B, H, S, D).astype(np.float32)
        if dtype == jnp.int8:
            ks = np.abs(k_new).max(-1) / 127.0
            vs = np.abs(v_new).max(-1) / 127.0
            k_w = jnp.asarray(np.round(k_new / ks[..., None]).astype(np.int8))
            v_w = jnp.asarray(np.round(v_new / vs[..., None]).astype(np.int8))
            sc = (jnp.asarray(ks), jnp.asarray(vs))
        else:
            k_w, v_w = jnp.asarray(k_new, dtype), jnp.asarray(v_new, dtype)
            sc = (None, None)
        for l in range(L):
            if dtype == jnp.int8:
                # distinguish layers via the scales so a layer-index bug shows
                cache = paged_write(cache, jnp.int32(l), table,
                                    jnp.zeros(B, jnp.int32), k_w, v_w,
                                    sc[0] * (l + 1), sc[1] * (l + 1))
            else:
                cache = paged_write(cache, jnp.int32(l), table,
                                    jnp.zeros(B, jnp.int32),
                                    k_w * (l + 1), v_w * (l + 1))
        q = jnp.asarray(rng.randn(B, H, D).astype(np.float32))
        return cache, table, lengths, q

    def _reference(self, cache, table, lengths, q, layer):
        from aria_tpu.engine.paged import gather_lane_kv

        k, v = gather_lane_kv(cache, jnp.int32(layer), table)  # [B,H,MAXP*PS,D]
        Stot = k.shape[2]
        mask = (jnp.arange(Stot)[None, :] < lengths[:, None])[:, None, None, :]
        return sdpa(q[:, None].astype(jnp.float32),
                    k.transpose(0, 2, 1, 3).astype(jnp.float32),
                    v.transpose(0, 2, 1, 3).astype(jnp.float32), mask)[:, 0]

    def test_bf16_matches_gather_sdpa(self):
        from aria_tpu.engine.paged import paged_decode_attention

        cache, table, lengths, q = self._setup(jnp.float32)
        for l in range(2):
            out = paged_decode_attention(q, cache, jnp.int32(l), table, lengths,
                                         interpret=True)
            ref = self._reference(cache, table, lengths, q, l)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=2e-4, atol=2e-4)

    def test_int8_matches_gather_sdpa(self):
        from aria_tpu.engine.paged import paged_decode_attention

        cache, table, lengths, q = self._setup(jnp.int8)
        for l in range(2):
            out = paged_decode_attention(q.astype(jnp.bfloat16), cache,
                                         jnp.int32(l), table, lengths,
                                         interpret=True)
            ref = self._reference(cache, table, lengths, q, l)
            np.testing.assert_allclose(np.asarray(out.astype(jnp.float32)),
                                       np.asarray(ref), rtol=2e-2, atol=5e-3)


class TestKVCacheWrite:
    """Interpret-mode parity for ops/kv_write.py vs the XLA scatter path,
    across all cache dtypes (each has a different native sublane tiling)
    and including duplicate padding lanes (identical row+slot)."""

    def _run(self, dtype, dup: bool):
        from aria_tpu.ops.kv_write import kv_cache_write

        L, B, H, S, D = 3, 4, 2, 64, 128
        rng = np.random.RandomState(0)

        def rand(shape):
            if jnp.dtype(dtype) == jnp.int8:
                return jnp.asarray(rng.randint(-128, 128, shape).astype(np.int8))
            return jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(dtype)

        kc, vc = rand((L, B, H, S, D)), rand((L, B, H, S, D))
        kn, vn = rand((B, H, D)), rand((B, H, D))
        rows = np.array([0, 2, 1, 3], np.int32)
        slots = np.array([5, 17, 5, 40], np.int32)
        if dup:
            # admission padding repeats a real lane verbatim: same row+slot
            rows[3], slots[3] = rows[1], slots[1]
            kn = kn.at[3].set(kn[1])
            vn = vn.at[3].set(vn[1])
        li = jnp.int32(1)

        # snapshot before the call: kv_cache_write donates the cache buffers
        ref_k, ref_v = np.array(kc), np.array(vc)
        out_k, out_v = kv_cache_write(
            kc, vc, li, jnp.asarray(rows), jnp.asarray(slots), kn, vn,
            interpret=True,
        )
        for b in range(B):
            ref_k[1, rows[b], :, slots[b], :] = np.asarray(kn[b])
            ref_v[1, rows[b], :, slots[b], :] = np.asarray(vn[b])
        np.testing.assert_array_equal(np.asarray(out_k), ref_k)
        np.testing.assert_array_equal(np.asarray(out_v), ref_v)

    def test_f32(self):
        self._run(jnp.float32, dup=False)

    def test_bf16(self):
        self._run(jnp.bfloat16, dup=False)

    def test_int8(self):
        self._run(jnp.int8, dup=False)

    def test_duplicate_padding_lanes(self):
        self._run(jnp.bfloat16, dup=True)

    def test_conflicting_block_check(self, monkeypatch):
        from aria_tpu.ops.kv_write import _check_unique_blocks

        # same (row, block) with different slots must fail loudly
        with np.testing.assert_raises(AssertionError):
            _check_unique_blocks(np.array([0, 0]), np.array([3, 7]), sb=16)
        # distinct blocks / identical duplicates are fine
        _check_unique_blocks(np.array([0, 0]), np.array([3, 3]), sb=16)
        _check_unique_blocks(np.array([0, 1]), np.array([3, 7]), sb=16)


class TestViTFlashKernel:
    """Interpret-mode parity for ops/vit_flash.py (the head-dim-on-sublanes
    non-causal kernel) vs the masked XLA sdpa reference, including ragged
    padding masks, head_dim 72 (the SigLIP shape), and multi-crop batches."""

    def _ref(self, q, k, v, kv_valid):
        from aria_tpu.ops.attention import sdpa

        mask = kv_valid[:, None, None, :]
        return sdpa(q, k, v, mask)

    def _run(self, B, S, H, D, bq, bk, valid_lens=None):
        from aria_tpu.ops.vit_flash import vit_flash

        rng = np.random.RandomState(0)
        q, k, v = (jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
                   for _ in range(3))
        if valid_lens is None:
            kv_valid = None
            valid = np.ones((B, S), bool)
        else:
            valid = np.zeros((B, S), bool)
            for b, n in enumerate(valid_lens):
                valid[b, :n] = True
            kv_valid = jnp.asarray(valid)
        got = np.asarray(vit_flash(q, k, v, kv_valid, bq=bq, bk=bk,
                                   interpret=True))
        ref = np.asarray(self._ref(q, k, v, jnp.asarray(valid)))
        # compare VALID query rows only (padding rows are garbage by contract)
        for b in range(B):
            n = int(valid[b].sum())
            np.testing.assert_allclose(got[b, :n], ref[b, :n],
                                       rtol=2e-5, atol=2e-5)

    def test_full_mask_headdim72(self):
        self._run(B=1, S=512, H=2, D=72, bq=256, bk=256)

    def test_ragged_padding(self):
        self._run(B=2, S=300, H=2, D=72, bq=128, bk=128,
                  valid_lens=[300, 137])

    def test_seq_not_block_multiple(self):
        # S=300 pads to 384: padded keys masked, padded queries garbage
        self._run(B=1, S=300, H=1, D=64, bq=128, bk=128, valid_lens=[300])

    def test_uneven_blocks(self):
        self._run(B=1, S=512, H=2, D=72, bq=128, bk=256)

    def test_matches_flash_sdpa_path(self):
        """Same numbers as the stock flash path the ViT used before (which
        falls back to masked sdpa off-TPU), over the NaViT mask."""
        from aria_tpu.ops.flash import flash_sdpa
        from aria_tpu.ops.vit_flash import vit_flash

        rng = np.random.RandomState(1)
        B, S, H, D = 2, 256, 2, 72
        q, k, v = (jnp.asarray(rng.randn(B, S, H, D).astype(np.float32))
                   for _ in range(3))
        valid = np.zeros((B, S), bool)
        valid[0, :256] = True
        valid[1, :101] = True
        pm = jnp.asarray(valid)
        ref = np.asarray(flash_sdpa(q, k, v, q_valid=pm, kv_valid=pm))
        got = np.asarray(vit_flash(q, k, v, pm, bq=128, bk=128, interpret=True))
        for b, n in enumerate([256, 101]):
            np.testing.assert_allclose(got[b, :n], ref[b, :n],
                                       rtol=2e-5, atol=2e-5)
