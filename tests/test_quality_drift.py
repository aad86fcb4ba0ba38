"""Unit tests for the quantization quality-drift tool's comparison logic
(tools/quality_drift.py; the chip-scale runs are recorded in BENCH_NOTES)."""

import numpy as np

from tools.quality_drift import compare


def _res(greedy, nll, logits, **extra):
    d = {"greedy_kvbf16": np.asarray(greedy, np.int32),
         "nll": np.asarray(nll, np.float32),
         "logits_win": np.asarray(logits, np.float32)}
    d.update({k: np.asarray(v, np.int32) for k, v in extra.items()})
    return d


class TestCompare:
    def test_identical_variant_reports_zero_drift(self):
        rng = np.random.RandomState(0)
        logits = rng.randn(4, 16)
        base = _res([1, 2, 3, 4], [0.5, 0.6, 0.7], logits)
        lines = compare({"bf16": base, "int8": dict(base)}, new_tokens=4)
        assert lines[0]["variant"] == "bf16"
        row = lines[1]
        assert row["variant"] == "int8"
        assert row["greedy_match"] == 1.0
        assert row["first_divergence_step"] == -1
        assert row["logit_mse"] == 0.0
        assert row["tf_top1_agree"] == 1.0
        assert row["ppl_delta_pct"] == 0.0

    def test_divergence_step_and_match_fraction(self):
        rng = np.random.RandomState(0)
        logits = rng.randn(4, 16)
        ref = _res([1, 2, 3, 4], [0.5], logits)
        var = _res([1, 2, 9, 4], [0.5], logits + 0.01)
        row = compare({"bf16": ref, "int4": var}, new_tokens=4)[1]
        assert row["first_divergence_step"] == 2
        assert row["greedy_match"] == 0.75
        assert row["logit_mse"] > 0.0

    def test_kv_dtype_match_is_within_variant(self):
        rng = np.random.RandomState(1)
        logits = rng.randn(4, 16)
        ref = _res([1, 2, 3, 4], [0.5], logits)
        var = _res([5, 6, 7, 8], [0.5], logits,
                   greedy_kvint8=[5, 6, 7, 8], greedy_kvint4=[5, 6, 0, 8])
        row = compare({"bf16": ref, "int4": var}, new_tokens=4)[1]
        # kv drift compares against the variant's own bf16-KV decode,
        # not the oracle
        assert row["kvint8_greedy_match"] == 1.0
        assert row["kvint4_greedy_match"] == 0.75

    def test_ppl_delta_sign(self):
        rng = np.random.RandomState(2)
        logits = rng.randn(4, 16)
        ref = _res([1], [1.0, 1.0], logits)
        worse = _res([1], [1.2, 1.2], logits)
        row = compare({"bf16": ref, "int8": worse}, new_tokens=1)[1]
        assert row["ppl_delta_pct"] > 0.0
