"""Sentencepiece-unigram tokenizer tests on a synthetic tiny model."""

import pytest

from aria_tpu.data.spm import (
    BYTE,
    NORMAL,
    UNKNOWN,
    SentencePieceTokenizer,
    WS,
    encode_model_proto,
    parse_model_proto,
)


def tiny_pieces():
    pieces = [
        ("<unk>", 0.0, UNKNOWN),
        ("<s>", 0.0, 3),  # control
        ("</s>", 0.0, 3),
    ]
    # byte fallback pieces
    pieces += [(f"<0x{b:02X}>", -20.0, BYTE) for b in range(256)]
    vocab = {
        WS + "hello": -1.0,
        WS + "world": -1.2,
        WS + "he": -3.0,
        "llo": -3.5,
        WS: -4.0,
        "h": -6.0, "e": -6.0, "l": -6.0, "o": -6.0, "w": -6.0,
        "r": -6.0, "d": -6.0, "a": -6.0, "b": -6.0, "c": -6.0,
    }
    pieces += [(p, s, NORMAL) for p, s in vocab.items()]
    return pieces


@pytest.fixture(scope="module")
def tok():
    pieces = tiny_pieces()
    data = encode_model_proto(pieces)
    parsed = parse_model_proto(data)
    assert [p[0] for p in parsed] == [p[0] for p in pieces]
    base = len(pieces)
    added = {"<|img|>": base, "<|im_start|>": base + 1, "<|im_end|>": base + 2}
    return SentencePieceTokenizer(parsed, added_tokens=added)


class TestSPM:
    def test_proto_roundtrip_scores(self, tok):
        pieces = tiny_pieces()
        parsed = parse_model_proto(encode_model_proto(pieces))
        for (p1, s1, t1), (p2, s2, t2) in zip(pieces, parsed):
            assert p1 == p2 and t1 == t2 and abs(s1 - s2) < 1e-6

    def test_viterbi_picks_best_segmentation(self, tok):
        ids = tok.encode("hello world")
        # "▁hello" (-1.0) + "▁world" (-1.2) beats any char split
        assert [tok.pieces[i][0] for i in ids] == [WS + "hello", WS + "world"]

    def test_roundtrip_decode(self, tok):
        for text in ["hello world", "hello hello world", "abc"]:
            assert tok.decode(tok.encode(text)) == text

    def test_byte_fallback(self, tok):
        ids = tok.encode("héllo")  # é not in vocab -> utf-8 bytes
        assert tok.decode(ids) == "héllo"
        piece_names = [tok.pieces[i][0] for i in ids if i < len(tok.pieces)]
        assert any(p.startswith("<0x") for p in piece_names)

    def test_added_special_tokens(self, tok):
        ids = tok.encode("<|im_start|>hello<|img|><|im_end|>")
        assert tok.added_tokens["<|im_start|>"] in ids
        assert tok.added_tokens["<|img|>"] in ids
        assert tok.decode(ids) == "<|im_start|>hello<|img|><|im_end|>"

    def test_dummy_prefix(self, tok):
        # Llama prepends ▁: "hello" alone segments as "▁hello"
        ids = tok.encode("hello")
        assert tok.pieces[ids[0]][0] == WS + "hello"


class TestNativeSegment:
    """native/spm_ops.cc must produce ids bit-identical to the pure-Python
    Viterbi on every path: normal pieces, ties, byte fallback, unicode."""

    def test_native_matches_python(self, tok):
        from aria_tpu.data.native_ops import get_lib

        if get_lib() is None or not hasattr(get_lib(), "aria_spm_create"):
            pytest.skip("no native toolchain")
        assert tok._ensure_native(), "native spm handle should build"
        texts = [
            "hello world", "hello hello world", "abc", "héllo",
            "  double  spaces ", "héllo wörld ζω", "", "h", "x" * 300,
            "hello\nworld\tmix", "🙂 emoji héllo",
        ]
        for t in texts:
            norm = WS + t.replace(" ", WS)
            assert tok._segment(norm) == tok._segment_py(norm), t

    def test_encode_uses_native(self, tok):
        from aria_tpu.data.native_ops import get_lib

        if get_lib() is None or not hasattr(get_lib(), "aria_spm_create"):
            pytest.skip("no native toolchain")
        ids = tok.encode("<|im_start|>hello world<|im_end|>")
        assert tok.decode(ids) == "<|im_start|>hello world<|im_end|>"


class TestLoadTokenizer:
    def test_spm_fallback_from_dir(self, tmp_path, tok):
        from aria_tpu.data.spm import encode_model_proto
        from aria_tpu.data.tokenizer import load_tokenizer
        import json

        (tmp_path / "tokenizer.model").write_bytes(encode_model_proto(tiny_pieces()))
        base = len(tiny_pieces())
        (tmp_path / "added_tokens.json").write_text(
            json.dumps({"<|img|>": base, "<|im_start|>": base + 1, "<|im_end|>": base + 2})
        )
        loaded = load_tokenizer(str(tmp_path))
        assert loaded.encode("hello world") == tok.encode("hello world")
        assert loaded.image_token_id == base

    def test_missing_dir_raises(self, tmp_path):
        from aria_tpu.data.tokenizer import load_tokenizer
        import pytest as _pytest

        with _pytest.raises(Exception):
            load_tokenizer(str(tmp_path / "nope"))


class TestTokenBytes:
    def test_guided_byte_map(self, tok):
        ws_hello = tok.piece_to_id[WS + "hello"]
        assert tok.token_bytes(ws_hello) == b" hello"
        assert tok.token_bytes(tok.piece_to_id["llo"]) == b"llo"
        assert tok.token_bytes(tok.piece_to_id["<0x41>"]) == b"A"
        assert tok.token_bytes(tok.unk_id) is None
        assert tok.token_bytes(tok.piece_to_id["<s>"]) is None  # control
        assert tok.token_bytes(tok.added_tokens["<|im_end|>"]) is None
