"""Metrics logger / profiler hook tests."""

import json
import os

from aria_tpu.utils.metrics import MetricsLogger, StepTimer, profile_trace


class TestMetrics:
    def test_jsonl_logging(self, tmp_path):
        log = MetricsLogger(str(tmp_path), echo=False)
        log.log(1, {"loss": 1.5})
        log.log(2, {"loss": 1.2, "lr": 1e-4})
        log.close()
        lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert lines[0]["step"] == 1 and lines[0]["loss"] == 1.5
        assert lines[1]["lr"] == 1e-4

    def test_disabled_writes_nothing(self, tmp_path):
        log = MetricsLogger(str(tmp_path / "x"), enabled=False)
        log.log(1, {"a": 1})
        log.close()
        assert not os.path.exists(tmp_path / "x" / "metrics.jsonl")

    def test_profile_trace_noop(self):
        with profile_trace(None):
            pass  # no-op path must not require jax

    def test_step_timer(self):
        t = StepTimer()
        out = t.lap(tokens=100)
        assert "step_time_s" in out and out["tokens_per_s"] > 0
