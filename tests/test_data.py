"""Data pipeline tests, mirroring the reference's test strategy
(tests/test_aria_processor.py, tests/test_apply_chat_template.py)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from aria_tpu.data.chat import (
    IGNORE_TOKEN_ID,
    apply_chat_template_and_tokenize,
    build_inference_prompt,
    image_tokens_per_crop,
)
from aria_tpu.data.collate import collate_fn
from aria_tpu.data.datasets import iter_batches, load_local_dataset, mix_datasets
from aria_tpu.data.processor import AriaProcessor
from aria_tpu.data.tokenizer import IMAGE_TOKEN, ByteTokenizer
from aria_tpu.data.vision_processor import (
    AriaVisionProcessor,
    keep_ratio_resize_and_pixel_mask,
    select_best_resolution,
    split_image,
)


@pytest.fixture
def rand_image():
    rng = np.random.RandomState(42)
    return Image.fromarray(rng.randint(0, 255, (480, 640, 3), np.uint8))


@pytest.fixture
def tokenizer():
    return ByteTokenizer()


class TestVisionProcessor:
    def test_shapes_980(self, rand_image):
        out = AriaVisionProcessor()([rand_image], max_image_size=980)
        assert out.pixel_values.shape == (1, 3, 980, 980)
        assert out.pixel_mask.shape == (1, 980, 980)
        assert out.num_crops.tolist() == [1]

    def test_shapes_490(self, rand_image):
        out = AriaVisionProcessor()([rand_image], max_image_size=490)
        assert out.pixel_values.shape == (1, 3, 490, 490)

    def test_invalid_size_raises(self, rand_image):
        with pytest.raises(ValueError):
            AriaVisionProcessor()([rand_image], max_image_size=800)

    def test_split_image_five_crops_square(self):
        """Reference golden: a 768x768 image at 490px splits 2x2 + full = 5
        crops (test_aria_processor.py:168-187)."""
        img = Image.fromarray(np.random.RandomState(0).randint(0, 255, (768, 768, 3), np.uint8))
        out = AriaVisionProcessor()([img], max_image_size=490, split_image=True)
        assert out.pixel_values.shape == (5, 3, 490, 490)
        assert out.num_crops.tolist() == [5]

    def test_split_image_wide(self, rand_image):
        # 640x480 (4:3) -> best grid (3,2) -> 6 crops + full = 7
        out = AriaVisionProcessor()([rand_image], max_image_size=490, split_image=True)
        assert out.pixel_values.shape == (7, 3, 490, 490)

    def test_keep_ratio_resize_mask(self, rand_image):
        padded, mask = keep_ratio_resize_and_pixel_mask(rand_image, 980)
        assert padded.size == (980, 980)
        # 640x480 -> scale 980/640 -> (980, 735)
        assert mask[:735, :980].all()
        assert not mask[735:, :].any()

    def test_select_best_resolution(self):
        # 4:3 image -> closest grids
        assert select_best_resolution(800, 600, [(1, 1), (2, 2), (2, 1)], 490) in [(1, 1), (2, 2)]
        # very wide -> (8, 1)
        assert select_best_resolution(4000, 500, [(1, 1), (8, 1)], 490) == (8, 1)

    def test_normalization_range(self, rand_image):
        out = AriaVisionProcessor()([rand_image], max_image_size=490)
        # mean/std 0.5 -> values in [-1, 1]
        assert out.pixel_values.min() >= -1.0 - 1e-6
        assert out.pixel_values.max() <= 1.0 + 1e-6

    def test_uint8_output_matches_host_normalize(self, rand_image):
        """normalize=False emits raw uint8; applying the host formula to it
        must reproduce the normalized f32 output exactly (same pixels, same
        mask) — this is the 4x-smaller transfer the engines normalize on
        device (models/aria.py:encode_images)."""
        proc = AriaVisionProcessor()
        f32 = proc([rand_image], max_image_size=490)
        raw = proc([rand_image], max_image_size=490, normalize=False)
        assert raw.pixel_values.dtype == np.uint8
        renorm = (raw.pixel_values.astype(np.float32) / 255.0 - 0.5) / 0.5
        np.testing.assert_allclose(renorm, f32.pixel_values, rtol=0, atol=1e-6)
        np.testing.assert_array_equal(raw.pixel_mask, f32.pixel_mask)

    def test_uint8_output_rejects_custom_mean(self, rand_image):
        proc = AriaVisionProcessor(image_mean=(0.4, 0.4, 0.4))
        with pytest.raises(ValueError):
            proc([rand_image], normalize=False)


class TestProcessor:
    def test_image_token_expansion_980(self, rand_image, tokenizer):
        proc = AriaProcessor(tokenizer)
        out = proc(f"hi{IMAGE_TOKEN}bye", images=[rand_image], max_image_size=980)
        ids = out.input_ids[0]
        n_img = int((ids == tokenizer.image_token_id).sum())
        assert n_img == 256
        assert out.prompts[0].count(IMAGE_TOKEN) == 256

    def test_image_token_expansion_490_split(self, rand_image, tokenizer):
        proc = AriaProcessor(tokenizer)
        out = proc(
            f"{IMAGE_TOKEN}", images=[rand_image], max_image_size=490, split_image=True
        )
        # 7 crops (3x2 grid + full) x 128 tokens
        n_img = int((out.input_ids[0] == tokenizer.image_token_id).sum())
        assert n_img == 7 * 128
        assert out.pixel_values.shape[0] == 7

    def test_multi_image_batch(self, rand_image, tokenizer):
        proc = AriaProcessor(tokenizer)
        out = proc(
            [f"a{IMAGE_TOKEN}", f"b{IMAGE_TOKEN}c"],
            images=[rand_image, rand_image],
            max_image_size=490,
        )
        assert out.input_ids.shape[0] == 2
        assert out.pixel_values.shape[0] == 2
        for row in out.input_ids:
            assert int((row == tokenizer.image_token_id).sum()) == 128

    def test_left_padding(self, tokenizer):
        proc = AriaProcessor(tokenizer)
        out = proc(["short", "a much longer prompt"])
        assert out.input_ids[0, 0] == tokenizer.pad_token_id
        assert not out.attention_mask[0, 0]
        assert out.attention_mask[0, -1]


class TestChatTemplate:
    MESSAGES = [
        {"role": "user", "content": [{"type": "text", "text": "what is this?"}]},
        {"role": "assistant", "content": [{"type": "text", "text": "a cat"}]},
    ]

    def test_inference_prompt_format(self):
        p = build_inference_prompt(self.MESSAGES[:1])
        assert p == "<|im_start|>user\nwhat is this?<|im_end|>\n<|im_start|>assistant\n"

    def test_roundtrip_decode(self, tokenizer):
        out = apply_chat_template_and_tokenize([self.MESSAGES], tokenizer)
        decoded = tokenizer.decode(out["input_ids"][0])
        assert decoded == (
            "<|im_start|>user\nwhat is this?<|im_end|>\n"
            "<|im_start|>assistant\na cat<|im_end|>\n"
        )

    def test_label_masking_user_only(self, tokenizer):
        msgs = [[{"role": "user", "content": [{"type": "text", "text": "hello"}]}]]
        out = apply_chat_template_and_tokenize(msgs, tokenizer)
        assert (out["labels"] == IGNORE_TOKEN_ID).all()

    def test_label_masking_assistant_prefix(self, tokenizer):
        out = apply_chat_template_and_tokenize([self.MESSAGES], tokenizer)
        labels = out["labels"][0]
        ids = out["input_ids"][0]
        # labels are ignored on the user message and the assistant prefix;
        # supervised positions reproduce input_ids exactly
        sup = labels != IGNORE_TOKEN_ID
        assert sup.sum() > 0
        np.testing.assert_array_equal(labels[sup], ids[sup])
        # the supervised region decodes to the assistant reply + end marker
        assert tokenizer.decode(ids[sup]) == "a cat<|im_end|>\n"

    def test_image_content_expansion(self, tokenizer):
        msgs = [[{
            "role": "user",
            "content": [{"type": "image"}, {"type": "text", "text": "describe"}],
        }]]
        out = apply_chat_template_and_tokenize(
            msgs, tokenizer, num_image_crop=iter([2]), max_image_size=490
        )
        n_img = int((out["input_ids"] == tokenizer.image_token_id).sum())
        assert n_img == 2 * 128

    def test_padding_and_truncation(self, tokenizer):
        msgs = [
            [{"role": "user", "content": [{"type": "text", "text": "x" * 50}]}],
            [{"role": "user", "content": [{"type": "text", "text": "y"}]}],
        ]
        out = apply_chat_template_and_tokenize(msgs, tokenizer, max_length=32)
        assert out["input_ids"].shape == (2, 32)
        assert not out["attention_mask"][1, -1]

    def test_tokens_per_crop(self):
        assert image_tokens_per_crop(490) == 128
        assert image_tokens_per_crop(980) == 256
        with pytest.raises(ValueError):
            image_tokens_per_crop(700)


class TestDatasets:
    def _make_ds(self, tmp_path, name, n):
        d = tmp_path / name
        d.mkdir()
        rows = [
            {"messages": [{"role": "user", "content": [{"type": "text", "text": f"{name}{i}"}]}],
             "images": None, "video": None}
            for i in range(n)
        ]
        with open(d / "train.jsonl", "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        return str(d)

    def test_mix_fractions(self, tmp_path):
        a = self._make_ds(tmp_path, "a", 10)
        b = self._make_ds(tmp_path, "b", 4)
        mixed = mix_datasets({a: 0.5, b: 2.0})
        assert len(mixed["train"]) == 5 + 8

    def test_shuffle_deterministic(self, tmp_path):
        a = self._make_ds(tmp_path, "a", 10)
        m1 = mix_datasets({a: 1.0})
        m2 = mix_datasets({a: 1.0})
        assert m1["train"] == m2["train"]

    def test_missing_train_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_local_dataset(str(tmp_path))

    def test_iter_batches(self):
        rows = list(range(10))
        batches = list(iter_batches([{"i": i} for i in rows], 3))
        assert len(batches) == 3
        assert all(len(b) == 3 for b in batches)


class TestCollate:
    def test_text_and_image_collate(self, rand_image, tokenizer):
        examples = [
            {"messages": [
                {"role": "user", "content": [{"type": "image"}, {"type": "text", "text": "what?"}]},
                {"role": "assistant", "content": [{"type": "text", "text": "cat"}]},
            ], "images": [rand_image], "video": None},
            {"messages": [
                {"role": "user", "content": [{"type": "text", "text": "hi"}]},
                {"role": "assistant", "content": [{"type": "text", "text": "yo"}]},
            ], "images": None, "video": None},
        ]
        batch = collate_fn(examples, tokenizer, max_image_size=490)
        assert batch["pixel_values"].shape == (1, 3, 490, 490)
        assert batch["input_ids"].shape == batch["labels"].shape
        n_img = int((batch["input_ids"] == tokenizer.image_token_id).sum())
        assert n_img == 128


class TestReferenceGoldenTemplates:
    """The reference test-suite's golden template strings
    (/root/reference/tests/test_apply_chat_template.py), decode-back checked
    byte-for-byte through our assembly + the deterministic ByteTokenizer.
    (A golden test against the real Aria sentencepiece vocab needs the
    checkpoint files — unavailable offline; load_tokenizer prefers the slow
    path for exactly that fidelity reason.)"""

    BOOK_Q = {"text": "Who wrote this book?\n", "type": "text"}
    IMG = {"text": None, "type": "image"}
    COVEY = {"text": "Sylvie Covey", "type": "text"}
    TITLE_Q = {"text": "What is the title of this book?", "type": "text"}
    TITLE_A = {"text": "Modern Printmaking: A Guide to Traditional and Digital Techniques",
               "type": "text"}

    def _decode(self, tok, ids):
        return tok.decode([t for t in ids.tolist() if t != tok.pad_token_id])

    def test_single_user_message_980_and_490(self):
        from aria_tpu.data.chat import apply_chat_template_and_tokenize
        from aria_tpu.data.tokenizer import ByteTokenizer

        tok = ByteTokenizer()
        for size, n in ((980, 256), (490, 128)):
            msgs = [{"content": [self.BOOK_Q, self.IMG], "role": "user"}]
            expected = (
                "<|im_start|>user\nWho wrote this book?\n"
                "<fim_prefix><|img|><fim_suffix><|im_end|>\n"
            ).replace("<|img|>", "<|img|>" * n)
            res = apply_chat_template_and_tokenize(
                [msgs], tok, num_image_crop=iter([1]),
                max_length=4096, max_image_size=size,
            )
            assert self._decode(tok, res["input_ids"][0]) == expected
            assert (res["labels"] == -100).sum() == res["input_ids"].size

    def test_single_assistant_message(self):
        from aria_tpu.data.chat import apply_chat_template_and_tokenize
        from aria_tpu.data.tokenizer import ByteTokenizer

        tok = ByteTokenizer()
        res = apply_chat_template_and_tokenize(
            [[{"content": [self.COVEY], "role": "assistant"}]], tok
        )
        assert self._decode(tok, res["input_ids"][0]) == \
            "<|im_start|>assistant\nSylvie Covey<|im_end|>\n"

    def test_multi_round_messages(self):
        from aria_tpu.data.chat import apply_chat_template_and_tokenize
        from aria_tpu.data.tokenizer import ByteTokenizer

        tok = ByteTokenizer()
        msgs = [
            {"content": [self.BOOK_Q, self.IMG], "role": "user"},
            {"content": [self.COVEY], "role": "assistant"},
            {"content": [self.TITLE_Q], "role": "user"},
            {"content": [self.TITLE_A], "role": "assistant"},
        ]
        expected = (
            "<|im_start|>user\nWho wrote this book?\n<fim_prefix><|img|><fim_suffix><|im_end|>\n"
            "<|im_start|>assistant\nSylvie Covey<|im_end|>\n"
            "<|im_start|>user\nWhat is the title of this book?<|im_end|>\n"
            "<|im_start|>assistant\nModern Printmaking: A Guide to Traditional and Digital Techniques<|im_end|>\n"
        ).replace("<|img|>", "<|img|>" * 256)
        res = apply_chat_template_and_tokenize(
            [msgs], tok, num_image_crop=iter([1]), max_length=4096
        )
        assert self._decode(tok, res["input_ids"][0]) == expected

    def test_batch_messages(self):
        from aria_tpu.data.chat import apply_chat_template_and_tokenize
        from aria_tpu.data.tokenizer import ByteTokenizer

        tok = ByteTokenizer()
        short = [
            {"content": [self.BOOK_Q, self.IMG], "role": "user"},
            {"content": [self.COVEY], "role": "assistant"},
        ]
        long = short + [
            {"content": [self.TITLE_Q], "role": "user"},
            {"content": [self.TITLE_A], "role": "assistant"},
        ]
        res = apply_chat_template_and_tokenize(
            [short, long], tok, num_image_crop=iter([1, 1]), max_length=4096
        )
        got = [self._decode(tok, row) for row in res["input_ids"]]
        exp0 = (
            "<|im_start|>user\nWho wrote this book?\n<fim_prefix><|img|><fim_suffix><|im_end|>\n"
            "<|im_start|>assistant\nSylvie Covey<|im_end|>\n"
        ).replace("<|img|>", "<|img|>" * 256)
        exp1 = exp0 + (
            "<|im_start|>user\nWhat is the title of this book?<|im_end|>\n"
            "<|im_start|>assistant\nModern Printmaking: A Guide to Traditional and Digital Techniques<|im_end|>\n"
        )
        assert got == [exp0, exp1]

    def test_invalid_content_type_raises(self):
        import pytest as _pytest

        from aria_tpu.data.chat import apply_chat_template_and_tokenize
        from aria_tpu.data.tokenizer import ByteTokenizer

        msgs = [{"content": [{"text": None, "type": "invalid"}], "role": "user"}]
        with _pytest.raises(ValueError, match="[Uu]nknown content type"):
            apply_chat_template_and_tokenize([msgs], ByteTokenizer())
