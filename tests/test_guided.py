"""Guided decoding: regex/JSON byte-DFA compiler, token-level lifting, and
constrained generation through the jitted engine."""

import json
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aria_tpu.engine.guided import (
    ByteDFA,
    TokenFSM,
    compile_regex,
    guided_mask,
    guided_next_state,
    json_dfa,
    token_byte_strings,
)


class TestRegexDFA:
    CASES = [
        ("yes|no", ["yes", "no"], ["", "y", "yesno", "maybe"]),
        ("[0-9]+", ["0", "42", "00123"], ["", "a", "4a2"]),
        ("-?[0-9]{1,3}(\\.[0-9]+)?", ["5", "-12", "999", "3.14", "-0.5"],
         ["1234", ".", "--3", "3."]),
        ("a*b+c?", ["b", "ab", "aaabbc", "bc"], ["", "a", "ac", "cb"]),
        ("(ab|cd){2,3}", ["abab", "abcd", "cdcdab"], ["ab", "ababababab", "abc"]),
        ("[a-f0-9]{4}", ["beef", "0a1f"], ["xyz1", "beefs", "bee"]),
        ("\\d\\d-\\d\\d", ["12-34"], ["1234", "12-3a"]),
        ("[^x]+", ["abc", "yyy"], ["", "axc"]),
        ("hello world", ["hello world"], ["hello", "hello  world"]),
    ]

    @pytest.mark.parametrize("pat,good,bad", CASES)
    def test_matches_python_re(self, pat, good, bad):
        dfa = compile_regex(pat)
        gold = re.compile(pat)
        for s in good:
            assert gold.fullmatch(s), f"test-case bug: {pat} vs {s}"
            assert dfa.matches(s.encode()), (pat, s)
        for s in bad:
            assert not gold.fullmatch(s), f"test-case bug: {pat} vs {s}"
            assert not dfa.matches(s.encode()), (pat, s)

    def test_random_strings_against_re(self):
        rng = np.random.RandomState(0)
        pat = "(a|bb)*c[0-9]{2}"
        dfa = compile_regex(pat)
        gold = re.compile(pat)
        alphabet = "abc019"
        for _ in range(500):
            n = rng.randint(0, 9)
            s = "".join(rng.choice(list(alphabet)) for _ in range(n))
            assert bool(gold.fullmatch(s)) == dfa.matches(s.encode()), s


class TestRegexFuzz:
    """Property test: random regexes over a small alphabet, random strings,
    DFA verdict must equal python re.fullmatch. This is what caught the
    opt()-skip-edge bug that accepted trailing commas."""

    def _rand_expr(self, rng, depth):
        if depth <= 0:
            return rng.choice(["a", "b", "c", "[ab]", "[^c]", "\\d"])
        kind = rng.randint(0, 6)
        if kind == 0:
            return self._rand_expr(rng, depth - 1) + self._rand_expr(rng, depth - 1)
        if kind == 1:
            return ("(" + self._rand_expr(rng, depth - 1) + "|"
                    + self._rand_expr(rng, depth - 1) + ")")
        if kind == 2:
            return "(" + self._rand_expr(rng, depth - 1) + ")*"
        if kind == 3:
            return "(" + self._rand_expr(rng, depth - 1) + ")+"
        if kind == 4:
            return "(" + self._rand_expr(rng, depth - 1) + ")?"
        lo = rng.randint(0, 3)
        hi = lo + rng.randint(0, 3)
        return "(" + self._rand_expr(rng, depth - 1) + ")" + f"{{{lo},{hi}}}"

    def test_random_patterns_match_re(self):
        rng = np.random.RandomState(42)
        alphabet = "abc019"
        for _ in range(60):
            pat = self._rand_expr(rng, 3)
            dfa = compile_regex(pat)
            gold = re.compile(pat)
            for _ in range(40):
                n = rng.randint(0, 10)
                s = "".join(rng.choice(list(alphabet)) for _ in range(n))
                assert bool(gold.fullmatch(s)) == dfa.matches(s.encode()), (pat, s)


class TestJsonDFA:
    def test_accepts_valid_json_objects(self):
        dfa = json_dfa(max_depth=3)
        for doc in [
            "{}",
            '{"a": 1}',
            '{"a": [1, 2.5, -3e2], "b": {"c": "x\\ny"}}',
            '{"s": "quote \\" inside", "t": true, "n": null}',
            '{ "spaced" : [ { "k" : false } ] }',
        ]:
            json.loads(doc)  # test-case sanity
            assert dfa.matches(doc.encode()), doc

    def test_rejects_invalid(self):
        dfa = json_dfa(max_depth=3)
        for doc in ["", "{", '{"a"}', '{"a": }', '{"a": 1,}', "[1]",
                    '{"a": 01}', "{'a': 1}", '{"a": 1} extra',
                    '{"a": [1,]}', '{"a": [,1]}', '{"a": 1 "b": 2}']:
            assert not dfa.matches(doc.encode()), doc

    def test_depth_bound(self):
        dfa = json_dfa(max_depth=2)
        assert dfa.matches(b'{"a": [1]}')  # depth 2
        assert not dfa.matches(b'{"a": [[1]]}')  # depth 3


class TestJsonSchema:
    SCHEMA = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"},
                     "minItems": 1, "maxItems": 3},
            "mood": {"enum": ["happy", "sad", 3]},
            "score": {"type": "number"},
            "alive": {"type": "boolean"},
        },
    }

    def _dfa(self, schema):
        from aria_tpu.engine.guided import compile_expr, schema_to_expr, seq, _WS

        return compile_expr(seq(_WS, schema_to_expr(schema)))

    def test_accepts_conforming_documents(self):
        dfa = self._dfa(self.SCHEMA)
        for doc in [
            '{"name":"bo","age":3,"tags":["a"],"mood":"sad","score":1.5,"alive":true}',
            '{"name": "x", "age": -42, "tags": ["a", "b", "c"], '
            '"mood": 3, "score": -2e3, "alive": false}',
        ]:
            json.loads(doc)
            assert dfa.matches(doc.encode()), doc

    def test_rejects_nonconforming(self):
        dfa = self._dfa(self.SCHEMA)
        for doc in [
            '{"name":"bo"}',  # missing properties
            '{"age":3,"name":"bo","tags":["a"],"mood":"sad","score":1,"alive":true}',  # order
            '{"name":"bo","age":3.5,"tags":["a"],"mood":"sad","score":1,"alive":true}',  # non-int
            '{"name":"bo","age":3,"tags":[],"mood":"sad","score":1,"alive":true}',  # minItems
            '{"name":"bo","age":3,"tags":["a","b","c","d"],"mood":"sad","score":1,"alive":true}',  # maxItems
            '{"name":"bo","age":3,"tags":["a"],"mood":"angry","score":1,"alive":true}',  # enum
            '{"name":"bo","age":3,"tags":["a"],"mood":"sad","score":1,"alive":"yes"}',  # bool
        ]:
            assert not dfa.matches(doc.encode()), doc

    def test_string_pattern_and_anyof(self):
        dfa = self._dfa({
            "type": "object",
            "properties": {
                "id": {"type": "string", "pattern": "[a-f0-9]{4}"},
                "v": {"anyOf": [{"type": "integer"}, {"type": "null"}]},
            },
        })
        assert dfa.matches(b'{"id":"beef","v":null}')
        assert dfa.matches(b'{"id":"0a1f","v":7}')
        assert not dfa.matches(b'{"id":"xyzw","v":null}')
        assert not dfa.matches(b'{"id":"beef","v":1.5}')

    def test_generation_conforms(self):
        from aria_tpu.config import AriaConfig
        from aria_tpu.data.tokenizer import ByteTokenizer
        from aria_tpu.engine.generate import Engine, GenerationConfig
        from aria_tpu.engine.guided import schema_fsm
        from aria_tpu.models.aria import init_aria_params

        cfg = AriaConfig.tiny()
        params = init_aria_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        eng = Engine(params, cfg, max_seq_len=256, cache_dtype=jnp.float32)
        tok = ByteTokenizer()
        schema = {"type": "object", "properties": {
            "ok": {"type": "boolean"},
            "n": {"type": "integer"},
        }}
        fsm = schema_fsm(schema, tok, [tok.eos_token_id],
                         vocab_size=cfg.text.vocab_size)
        res = eng.generate(
            [5, 17, 3],
            GenerationConfig(max_new_tokens=40, temperature=0.8, top_k=None,
                             stop_token_ids=(tok.eos_token_id,), guided=fsm),
        )
        if res.tokens[-1] == tok.eos_token_id:
            doc = json.loads(tok.decode(res.tokens[:-1]))
            assert set(doc) == {"ok", "n"}
            assert isinstance(doc["ok"], bool) and isinstance(doc["n"], int)


class _ToyTok:
    """Byte tokenizer over a tiny explicit vocab."""

    def __init__(self, pieces, specials=("<eos>",)):
        self.pieces = list(pieces) + [None] * len(specials)
        self.vocab_size = len(self.pieces)
        self.special_token_ids = list(
            range(len(pieces), len(pieces) + len(specials)))
        self.eos_token_id = self.special_token_ids[0]

    def decode(self, ids):
        return "".join(self.pieces[i] or "" for i in ids)


class TestTokenFSM:
    def test_token_walk_equals_byte_walk(self):
        pieces = ["a", "b", "ab", "ba", "aab", "c", "0", "12", "9"]
        tok = _ToyTok(pieces)
        dfa = compile_regex("(a|b)*c[0-9]+")
        fsm = TokenFSM.build(dfa, token_byte_strings(tok), [tok.eos_token_id])
        trans = np.asarray(fsm.trans)
        rng = np.random.RandomState(1)
        for _ in range(200):
            ids = rng.randint(0, len(pieces), size=rng.randint(1, 6)).tolist()
            text = "".join(pieces[i] for i in ids).encode()
            # token-level walk
            s = fsm.start
            for i in ids:
                s = trans[s, i]
                if s < 0:
                    break
            byte_s = dfa.simulate(text)
            if s < 0:
                assert byte_s == -1 or not any(
                    trans[byte_s] >= 0
                ), (ids, text)  # token walk can only die if bytes died
            else:
                assert s == byte_s, (ids, text)

    def test_specials_forbidden_stop_gated_by_accepting(self):
        pieces = ["a", "b"]
        tok = _ToyTok(pieces)
        dfa = compile_regex("ab")
        fsm = TokenFSM.build(dfa, token_byte_strings(tok), [tok.eos_token_id])
        V = tok.vocab_size
        logits = jnp.zeros((1, V), jnp.float32)

        s0 = jnp.asarray([fsm.start], jnp.int32)
        m0 = np.asarray(guided_mask(fsm.trans, fsm.accepting, fsm.stop_mask, s0, logits))
        assert m0[0, 0] == 0 and m0[0, 1] < -1e29  # only 'a' legal
        assert m0[0, tok.eos_token_id] < -1e29  # not accepting yet

        s1 = guided_next_state(fsm.trans, s0, jnp.asarray([0], jnp.int32))
        s2 = guided_next_state(fsm.trans, s1, jnp.asarray([1], jnp.int32))
        m2 = np.asarray(guided_mask(fsm.trans, fsm.accepting, fsm.stop_mask, s2, logits))
        # pattern exhausted: ONLY eos is legal
        assert m2[0, tok.eos_token_id] == 0
        assert m2[0, 0] < -1e29 and m2[0, 1] < -1e29

    def test_vocab_padding_forbidden(self):
        pieces = ["a", "b"]
        tok = _ToyTok(pieces)
        fsm = TokenFSM.build(
            compile_regex("a+"),
            token_byte_strings(tok, vocab_size=10), [tok.eos_token_id])
        trans = np.asarray(fsm.trans)
        assert trans.shape[1] == 10
        assert (trans[fsm.start, tok.vocab_size:] == -1).all()

    def test_free_state_is_transparent(self):
        pieces = ["a", "b"]
        tok = _ToyTok(pieces)
        fsm = TokenFSM.build(compile_regex("ab"), token_byte_strings(tok),
                             [tok.eos_token_id])
        V = tok.vocab_size
        logits = jnp.arange(V, dtype=jnp.float32)[None]
        free = jnp.asarray([fsm.free_state], jnp.int32)
        masked = np.asarray(
            guided_mask(fsm.trans, fsm.accepting, fsm.stop_mask, free, logits))
        np.testing.assert_array_equal(masked[0], np.arange(V, dtype=np.float32))
        nxt = guided_next_state(fsm.trans, free, jnp.asarray([1], jnp.int32))
        assert int(nxt[0]) == fsm.free_state


class TestGuidedGeneration:
    """Constrained generation through the real jitted engine on a tiny
    random model: the FSM, not the model, dictates output structure."""

    @pytest.fixture(scope="class")
    def engine(self):
        from aria_tpu.config import AriaConfig
        from aria_tpu.engine.generate import Engine
        from aria_tpu.models.aria import init_aria_params

        cfg = AriaConfig.tiny()
        params = init_aria_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        return Engine(params, cfg, max_seq_len=256, cache_dtype=jnp.float32), cfg

    def test_regex_choice_forced(self, engine):
        from aria_tpu.data.tokenizer import ByteTokenizer
        from aria_tpu.engine.generate import GenerationConfig
        from aria_tpu.engine.guided import regex_fsm

        eng, cfg = engine
        tok = ByteTokenizer()
        fsm = regex_fsm("(yes|no)", tok, [tok.eos_token_id],
                        vocab_size=cfg.text.vocab_size)
        for seed in range(3):
            res = eng.generate(
                [5, 17, 3],
                GenerationConfig(max_new_tokens=8, temperature=0.9, top_k=None,
                                 stop_token_ids=(tok.eos_token_id,), guided=fsm),
            )
            assert res.tokens[-1] == tok.eos_token_id  # forced stop at match end
            text = tok.decode(res.tokens[:-1])
            assert text in ("yes", "no"), text

    def test_json_mode_prefix_always_live(self, engine):
        from aria_tpu.data.tokenizer import ByteTokenizer
        from aria_tpu.engine.generate import GenerationConfig
        from aria_tpu.engine.guided import json_fsm

        eng, cfg = engine
        tok = ByteTokenizer()
        dfa = json_dfa(max_depth=2)
        fsm = json_fsm(tok, [tok.eos_token_id],
                       vocab_size=cfg.text.vocab_size, max_depth=2)
        res = eng.generate(
            [9, 9, 200],
            GenerationConfig(max_new_tokens=48, temperature=0.8, top_k=None,
                             stop_token_ids=(tok.eos_token_id,), guided=fsm),
        )
        ended = res.tokens[-1] == tok.eos_token_id
        text = tok.decode(res.tokens[:-1] if ended else res.tokens)
        if ended:
            doc = json.loads(text)  # complete output must be valid JSON
            assert isinstance(doc, dict)
        else:
            # budget ran out mid-object: every prefix must still be DFA-live
            assert dfa.simulate(text.encode()) >= 0, text


class TestGuidedServer:
    """Mixed batches in the continuous-batching server: guided lanes obey
    the FSM while unguided lanes are bit-identical to a no-FSM engine."""

    def test_mixed_batch_guided_and_transparent(self):
        from aria_tpu.config import AriaConfig
        from aria_tpu.data.tokenizer import ByteTokenizer
        from aria_tpu.engine.guided import regex_fsm
        from aria_tpu.engine.server import BatchedEngine
        from aria_tpu.models.aria import init_aria_params

        cfg = AriaConfig.tiny()
        params = init_aria_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        tok = ByteTokenizer()
        fsm = regex_fsm("(yes|no|maybe)", tok, [tok.eos_token_id],
                        vocab_size=cfg.text.vocab_size)

        plain = BatchedEngine(params, cfg, max_lanes=2, max_seq_len=128,
                              temperature=0.0, decode_chunk=4,
                              cache_dtype=jnp.float32)
        guided = BatchedEngine(params, cfg, max_lanes=2, max_seq_len=128,
                               temperature=0.0, decode_chunk=4,
                               cache_dtype=jnp.float32, guided_fsm=fsm)

        free_prompt, g_prompt = [5, 17, 3], [9, 9, 200]
        plain.submit(free_prompt, max_new_tokens=8)
        plain.submit(g_prompt, max_new_tokens=8)
        exp = {tuple(r.prompt_tokens): r.generated
               for r in plain.run_until_complete()}

        guided.submit(free_prompt, max_new_tokens=8)
        u2 = guided.submit(g_prompt, max_new_tokens=8, temperature=0.9,
                           stop_token_ids=(tok.eos_token_id,), guided=True)
        fin = {r.uid: r for r in guided.run_until_complete()}

        # unguided lane: exactly the no-FSM engine's tokens
        free_res = next(r for r in fin.values()
                        if r.prompt_tokens == free_prompt)
        assert free_res.generated == exp[tuple(free_prompt)]
        # guided lane: a full regex match then forced eos
        g = fin[u2]
        assert g.generated[-1] == tok.eos_token_id
        assert tok.decode(g.generated[:-1]) in ("yes", "no", "maybe")

    def test_paged_engine_guided_with_prefix_cache(self):
        """Guided decoding composes with the paged engine's chunked prefill
        AND prefix caching: the second identical request reuses KV pages yet
        still decodes under the constraint."""
        from aria_tpu.config import AriaConfig
        from aria_tpu.data.tokenizer import ByteTokenizer
        from aria_tpu.engine.guided import regex_fsm
        from aria_tpu.engine.server import PagedBatchedEngine
        from aria_tpu.models.aria import init_aria_params

        cfg = AriaConfig.tiny()
        params = init_aria_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        tok = ByteTokenizer()
        fsm = regex_fsm("(yes|no)", tok, [tok.eos_token_id],
                        vocab_size=cfg.text.vocab_size)
        srv = PagedBatchedEngine(params, cfg, max_lanes=1, max_seq_len=256,
                                 page_size=32, prefill_chunk=32,
                                 temperature=0.9, decode_chunk=4,
                                 cache_dtype=jnp.float32, guided_fsm=fsm)
        prompt = [7 + (i % 90) for i in range(70)]  # 3 chunks, 2 full pages
        for expect_cached in (0, 64):
            srv.submit(prompt, max_new_tokens=8,
                       stop_token_ids=(tok.eos_token_id,), guided=True)
            (f,) = srv.run_until_complete()
            assert f.cached_tokens == expect_cached
            assert f.generated[-1] == tok.eos_token_id
            assert tok.decode(f.generated[:-1]) in ("yes", "no")

    def test_guided_submit_requires_fsm(self):
        from aria_tpu.config import AriaConfig
        from aria_tpu.engine.server import BatchedEngine
        from aria_tpu.models.aria import init_aria_params

        cfg = AriaConfig.tiny()
        params = init_aria_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        srv = BatchedEngine(params, cfg, max_lanes=1, max_seq_len=128,
                            cache_dtype=jnp.float32)
        with pytest.raises(ValueError):
            srv.submit([1, 2], guided=True)
