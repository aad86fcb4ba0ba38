"""End-to-end training loop tests on the tiny model (CPU mesh)."""

import json
import os

import numpy as np
import pytest

from aria_tpu.config import AriaConfig
from aria_tpu.train.loop import train
from aria_tpu.train.recipe import Recipe, load_recipe

TINY = AriaConfig.tiny()


def make_dataset(tmp_path, n=8):
    d = tmp_path / "ds"
    d.mkdir(exist_ok=True)
    rows = []
    for i in range(n):
        rows.append({
            "messages": [
                {"role": "user", "content": [{"type": "text", "text": f"question {i}?"}]},
                {"role": "assistant", "content": [{"type": "text", "text": f"answer {i}!"}]},
            ],
            "images": None,
            "video": None,
        })
    with open(d / "train.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(d)


def base_recipe(tmp_path, **kw):
    defaults = dict(
        output_dir=str(tmp_path / "out"),
        dataset_mixer={make_dataset(tmp_path): 1.0},
        per_device_train_batch_size=2,
        gradient_accumulation_steps=1,
        num_train_epochs=1,
        max_seq_length=64,
        learning_rate=1e-3,
        gradient_checkpointing=True,
        dtype="float32",
        logging_steps=1,
    )
    defaults.update(kw)
    return Recipe(**defaults)


class TestTrainLoop:
    def test_full_fine_tune_runs_and_checkpoints(self, tmp_path):
        r = base_recipe(tmp_path, freeze_vit=True, freeze_projector=True)
        state = train(r, cfg=TINY, max_steps=3)
        assert int(state.step) == 3
        metrics_file = os.path.join(r.output_dir, "metrics.jsonl")
        lines = [json.loads(l) for l in open(metrics_file)]
        assert len(lines) == 3
        assert all(np.isfinite(l["loss"]) for l in lines)
        assert os.path.isdir(os.path.join(r.output_dir, "checkpoints"))

    def test_lora_fine_tune_runs(self, tmp_path):
        r = base_recipe(tmp_path, use_peft=True, lora_r=4, lora_alpha=8)
        state = train(r, cfg=TINY, max_steps=2)
        assert int(state.step) == 2
        # LoRA state is the adapter tree only
        leaves = list(state.params["lm"]["layers"].keys())
        assert "wqkv" in leaves

    def test_qlora_quantized_base(self, tmp_path):
        """LoRA over an int8-quantized frozen base (QLoRA-style): gradients
        flow through the dequant paths into the adapters only; loss is
        finite and decreases over a few steps."""
        r = base_recipe(tmp_path, use_peft=True, lora_r=4, lora_alpha=8,
                        quantize_base=True, learning_rate=1e-2)
        state = train(r, cfg=TINY, max_steps=4)
        assert int(state.step) == 4
        lines = [json.loads(l) for l in
                 open(os.path.join(r.output_dir, "metrics.jsonl"))]
        assert all(np.isfinite(l["loss"]) for l in lines)
        assert lines[-1]["loss"] < lines[0]["loss"]

    def test_resume_from_checkpoint(self, tmp_path):
        r = base_recipe(tmp_path)
        train(r, cfg=TINY, max_steps=2)
        r2 = base_recipe(tmp_path, resume_from_checkpoint=True)
        state = train(r2, cfg=TINY, max_steps=4)
        assert int(state.step) == 4

    def test_grad_accum(self, tmp_path):
        r = base_recipe(tmp_path, gradient_accumulation_steps=2)
        state = train(r, cfg=TINY, max_steps=4)
        assert int(state.step) == 4


class TestRecipe:
    def test_yaml_roundtrip(self, tmp_path):
        p = tmp_path / "r.yaml"
        p.write_text("learning_rate: 3e-4\nuse_peft: true\nmesh_fsdp: 2\n")
        r = load_recipe(str(p))
        assert r.learning_rate == 3e-4 and r.use_peft and r.mesh_fsdp == 2

    def test_cli_overrides(self, tmp_path):
        p = tmp_path / "r.yaml"
        p.write_text("learning_rate: 3e-4\n")
        r = load_recipe(str(p), {"learning_rate": "1e-5", "use_peft": "true"})
        assert r.learning_rate == 1e-5 and r.use_peft

    def test_unknown_override_raises(self):
        with pytest.raises(KeyError):
            load_recipe(None, {"not_a_key": "1"})


class TestExampleRecipes:
    """Per-task example configs (examples/*/config_{lora,full}.yaml) carry the
    reference's task hyperparameters and must load cleanly + run e2e."""

    CONFIGS = [
        f"examples/{task}/config_{kind}.yaml"
        for task in ("refcoco", "nlvr2", "nextqa", "code_sft")
        for kind in ("lora", "full")
    ]

    def test_all_configs_load_without_unknown_keys(self):
        import warnings

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for rel in self.CONFIGS:
            with warnings.catch_warnings():
                warnings.simplefilter("error")  # unknown keys warn -> fail
                r = load_recipe(os.path.join(repo, rel))
            assert r.dataset_mixer, rel
            assert ("lora" in rel) == r.use_peft, rel

    def test_refcoco_lora_config_trains_on_toy_jsonl(self, tmp_path):
        from aria_tpu.cli.train import main as train_main

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        ds = make_dataset(tmp_path)
        train_main([
            "--config", os.path.join(repo, "examples/refcoco/config_lora.yaml"),
            "--tiny", "--max-steps", "2",
            "--dataset_mixer", json.dumps({ds: 1.0}),
            "--output_dir", str(tmp_path / "out"),
            "--per_device_train_batch_size", "2",
            "--gradient_accumulation_steps", "1",
            "--max_seq_length", "64",
            "--dtype", "float32",
        ])
        lines = [json.loads(l) for l in open(tmp_path / "out" / "metrics.jsonl")]
        assert len(lines) == 2 and all(np.isfinite(l["loss"]) for l in lines)
