"""Download CLI tests (network mocked; reference parity for
gptfast/scripts/download.py + examples/download_data_hf.py)."""

import pytest

from aria_tpu.cli import download as dl


class TestDownloadCLI:
    def test_retries_then_succeeds(self, tmp_path, monkeypatch):
        calls = []

        def fake_snapshot(repo, local_dir, repo_type, token, max_workers,
                          allow_patterns):
            calls.append((repo, local_dir, repo_type, allow_patterns))
            if len(calls) < 3:
                raise ConnectionError("transient")
            return local_dir

        monkeypatch.setattr("huggingface_hub.snapshot_download", fake_snapshot)
        monkeypatch.setattr(dl.time, "sleep", lambda s: None)
        out = dl.download("org/repo", str(tmp_path), "dataset", None,
                          retries=5, allow=["*.safetensors"])
        assert out == str(tmp_path)
        assert len(calls) == 3
        assert calls[0][2] == "dataset"
        assert calls[0][3] == ["*.safetensors"]

    def test_401_is_fatal_not_retried(self, tmp_path, monkeypatch):
        class Resp:
            status_code = 401

        def fake_snapshot(*a, **k):
            e = RuntimeError("gated")
            e.response = Resp()
            raise e

        monkeypatch.setattr("huggingface_hub.snapshot_download", fake_snapshot)
        with pytest.raises(SystemExit, match="--token"):
            dl.download("org/private", str(tmp_path), "model", None,
                        retries=5, allow=None)

    def test_exhausted_retries_raise(self, tmp_path, monkeypatch):
        def fake_snapshot(*a, **k):
            raise ConnectionError("down")

        monkeypatch.setattr("huggingface_hub.snapshot_download", fake_snapshot)
        monkeypatch.setattr(dl.time, "sleep", lambda s: None)
        with pytest.raises(SystemExit, match="after 2 attempts"):
            dl.download("org/repo", str(tmp_path), "model", None,
                        retries=2, allow=None)

    def test_zero_egress_exits_2(self, monkeypatch, capsys):
        monkeypatch.setattr(dl, "_has_egress", lambda **k: False)
        monkeypatch.setattr("sys.argv", ["download", "--repo", "x/y"])
        with pytest.raises(SystemExit) as ei:
            dl.main()
        assert ei.value.code == 2
        assert "zero-egress" in capsys.readouterr().err
