"""HTTP serving frontend test: concurrent requests through a live server."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import jax
import jax.numpy as jnp
import pytest

from aria_tpu.config import AriaConfig
from aria_tpu.data.tokenizer import ByteTokenizer
from aria_tpu.engine.http_server import ServingLoop, make_handler
from aria_tpu.engine.server import BatchedEngine
from aria_tpu.models.aria import init_aria_params

TINY = AriaConfig.tiny()


@pytest.fixture(scope="module")
def server():
    params = init_aria_params(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)
    engine = BatchedEngine(params, TINY, max_lanes=2, max_seq_len=128,
                           temperature=0.0, decode_chunk=4, cache_dtype=jnp.float32)
    loop = ServingLoop(engine, ByteTokenizer())
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(loop))
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()
    loop.shutdown()


def post(url, payload, timeout=120):
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


class TestHTTP:
    def test_health(self, server):
        with urllib.request.urlopen(server + "/health", timeout=30) as r:
            data = json.loads(r.read())
        assert data["status"] == "ok"

    def test_generate(self, server):
        out = post(server, {"prompt": "hello", "max_new_tokens": 4})
        assert len(out["tokens"]) >= 1
        assert out["error"] is None

    def test_concurrent_requests(self, server):
        results = {}

        def worker(i):
            results[i] = post(server, {"prompt": f"req {i}", "max_new_tokens": 4})

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=180)
        assert len(results) == 4
        assert all(len(r["tokens"]) >= 1 for r in results.values())

    def test_missing_field_400(self, server):
        req = urllib.request.Request(
            server + "/generate", data=b"{}",
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400

    def test_metrics(self, server):
        post(server, {"prompt": "metrics probe", "max_new_tokens": 3})
        with urllib.request.urlopen(server + "/metrics", timeout=30) as r:
            data = json.loads(r.read())
        assert data["requests"] >= 1
        assert data["generated_tokens"] >= 1
        assert data["tokens_per_second"] > 0


def sse_events(url, path, payload, timeout=120):
    """POST and parse a text/event-stream response into json events."""
    req = urllib.request.Request(
        url + path, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    events = []
    with urllib.request.urlopen(req, timeout=timeout) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            body = line[len("data: "):]
            if body == "[DONE]":
                break
            events.append(json.loads(body))
    return events


class TestStreaming:
    def test_generate_stream_matches_nonstream(self, server):
        plain = post(server, {"prompt": "stream me", "max_new_tokens": 6,
                              "temperature": 0.0})
        events = sse_events(server, "/generate",
                            {"prompt": "stream me", "max_new_tokens": 6,
                             "temperature": 0.0, "stream": True})
        toks = [t for ev in events for t in ev["tokens"]]
        text = "".join(ev["text"] for ev in events)
        assert toks[: len(plain["tokens"])] == plain["tokens"]
        assert text.startswith(plain["text"]) or plain["text"].startswith(text)

    def test_stream_delivers_incrementally(self, server):
        """Tokens must arrive across multiple events (per decode chunk),
        not one blob at the end (decode_chunk=4 < max_new_tokens=12)."""
        events = sse_events(server, "/generate",
                            {"prompt": "incremental", "max_new_tokens": 12,
                             "temperature": 0.0, "stream": True})
        assert len(events) >= 2


class TestMultiLoraHTTP:
    @pytest.fixture(scope="class")
    def lora_server(self):
        import numpy as np

        from aria_tpu.engine.multi_lora import AdapterRegistry
        from aria_tpu.train.lora import LoraConfig, init_lora_params

        params = init_aria_params(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)
        lc = LoraConfig(rank=8, alpha=16.0)
        lora = init_lora_params(jax.random.PRNGKey(7), TINY, lc)["lm"]
        rng = np.random.RandomState(7)
        lora = jax.tree.map(
            lambda x: jnp.asarray(rng.randn(*x.shape).astype(np.float32) * 0.05),
            lora)
        reg = AdapterRegistry({"refcoco": lora}, scales={"refcoco": lc.scale})
        engine = BatchedEngine(params, TINY, max_lanes=2, max_seq_len=128,
                               temperature=0.0, decode_chunk=4,
                               cache_dtype=jnp.float32, adapters=reg)
        loop = ServingLoop(engine, ByteTokenizer())
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(loop))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{httpd.server_port}"
        httpd.shutdown()
        loop.shutdown()

    def _chat(self, url, model, prompt="hello"):
        req = urllib.request.Request(
            url + "/v1/chat/completions",
            data=json.dumps({"model": model, "max_tokens": 6,
                             "temperature": 0.0,
                             "messages": [{"role": "user", "content": prompt}],
                             }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    def test_models_lists_adapters(self, lora_server):
        with urllib.request.urlopen(lora_server + "/v1/models", timeout=30) as r:
            data = json.loads(r.read())
        ids = [m["id"] for m in data["data"]]
        assert ids == ["aria-tpu", "refcoco"]

    def test_adapter_selected_by_model_field(self, lora_server):
        base = self._chat(lora_server, "aria-tpu")
        tuned = self._chat(lora_server, "refcoco")
        # the adapter visibly changes greedy output; base stays base
        base2 = self._chat(lora_server, "aria-tpu")
        assert base["choices"][0]["message"] == base2["choices"][0]["message"]
        assert (tuned["choices"][0]["message"]["content"]
                != base["choices"][0]["message"]["content"])

    def test_unknown_model_400(self, lora_server):
        req = urllib.request.Request(
            lora_server + "/v1/chat/completions",
            data=json.dumps({"model": "nope", "max_tokens": 2,
                             "messages": [{"role": "user", "content": "x"}],
                             }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=30)
        assert e.value.code == 400


class TestStopStrings:
    def test_nonstream_stop_truncates(self, server):
        base = post(server, {"prompt": "stop test", "max_new_tokens": 8,
                             "temperature": 0.0})
        assert len(base["text"]) >= 2
        marker = base["text"][1]  # 2nd char as a stop string
        out = post(server, {"prompt": "stop test", "max_new_tokens": 8,
                            "temperature": 0.0, "stop": marker})
        assert marker not in out["text"]
        assert out["text"] == base["text"].split(marker)[0]

    def test_stream_stop_cancels_early(self, server):
        base = post(server, {"prompt": "stream stop", "max_new_tokens": 12,
                             "temperature": 0.0})
        marker = base["text"][1]
        events = sse_events(server, "/generate",
                            {"prompt": "stream stop", "max_new_tokens": 12,
                             "temperature": 0.0, "stream": True,
                             "stop": [marker]})
        text = "".join(ev["text"] for ev in events)
        assert marker not in text
        assert text == base["text"].split(marker)[0]


def _png_b64(size=8):
    import base64
    import io

    import numpy as np
    from PIL import Image

    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (size, size, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


class TestMultimodalHTTP:
    def test_chat_to_prompt_extracts_images(self):
        from aria_tpu.engine.http_server import _chat_to_prompt

        prompt, images = _chat_to_prompt([
            {"role": "user", "content": [
                {"type": "image_url", "image_url": {"url": _png_b64()}},
                {"type": "text", "text": "describe"},
            ]},
        ])
        assert len(images) == 1 and images[0].size == (8, 8)
        assert "<fim_prefix><|img|><fim_suffix>" in prompt
        assert prompt.endswith("<|im_start|>assistant\n")

    def test_chat_to_prompt_expands_video_to_frames(self):
        import base64
        import os
        import tempfile

        import numpy as np

        cv2 = pytest.importorskip("cv2")
        from aria_tpu.engine.http_server import _chat_to_prompt

        fd, path = tempfile.mkstemp(suffix=".mp4")
        os.close(fd)
        try:
            w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 5, (16, 16))
            rng = np.random.RandomState(0)
            for _ in range(10):
                w.write(rng.randint(0, 255, (16, 16, 3), np.uint8))
            w.release()
            url = "data:video/mp4;base64," + base64.b64encode(
                open(path, "rb").read()).decode()
        finally:
            os.unlink(path)
        prompt, images = _chat_to_prompt([
            {"role": "user", "content": [
                {"type": "video_url", "video_url": {"url": url}, "num_frames": 4},
                {"type": "text", "text": "what happens?"},
            ]},
        ])
        assert len(images) == 4
        assert prompt.count("<|img|>") == 4

    def test_images_flow_through_serving_loop(self):
        """A multimodal request travels ServingLoop -> processor -> engine
        with pixel tensors intact (tiny-model-compatible fake processor)."""
        import numpy as np

        from aria_tpu.engine.http_server import ServingLoop

        cfg = TINY
        params = init_aria_params(jax.random.PRNGKey(0), cfg, dtype=jnp.float32)
        engine = BatchedEngine(params, cfg, max_lanes=1, max_seq_len=128,
                               temperature=0.0, decode_chunk=4,
                               cache_dtype=jnp.float32)
        loop = ServingLoop(engine, ByteTokenizer())

        S_img = cfg.vision.image_size
        n_q = cfg.projector.query_count(cfg.vision.patches_per_side**2)
        seen = {}

        class FakeProc:
            def __call__(self, prompt, images=None, max_image_size=980):
                from aria_tpu.data.processor import ProcessorOutput

                seen["images"] = images
                ids = [4] + [cfg.image_token_id] * n_q + [7]
                return ProcessorOutput(
                    np.asarray([ids], np.int32),
                    np.ones((1, len(ids)), bool),
                    np.random.RandomState(3).randn(1, 3, S_img, S_img).astype(np.float32),
                    np.ones((1, S_img, S_img), bool),
                )

        loop.processor = FakeProc()
        try:
            from aria_tpu.engine.http_server import _decode_image

            img = _decode_image(_png_b64())
            out = loop.submit_and_wait("<|img|> describe", max_new_tokens=3,
                                       images=[img])
            assert len(out["tokens"]) >= 1 and out["error"] is None
            assert seen["images"] is not None and len(seen["images"]) == 1
        finally:
            loop.shutdown()


class TestOpenAICompat:
    def test_models(self, server):
        with urllib.request.urlopen(server + "/v1/models", timeout=30) as r:
            data = json.loads(r.read())
        assert data["data"][0]["id"] == "aria-tpu"

    def test_completions(self, server):
        req = urllib.request.Request(
            server + "/v1/completions",
            data=json.dumps({"model": "aria-tpu", "prompt": "hello",
                             "max_tokens": 4, "temperature": 0.0}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            data = json.loads(r.read())
        assert data["object"] == "text_completion"
        assert data["choices"][0]["finish_reason"] in ("stop", "length")
        assert data["usage"]["completion_tokens"] >= 1
        assert isinstance(data["choices"][0]["text"], str)

    def test_chat_completions(self, server):
        req = urllib.request.Request(
            server + "/v1/chat/completions",
            data=json.dumps({
                "model": "aria-tpu",
                "messages": [{"role": "user", "content": "hi there"}],
                "max_tokens": 4, "temperature": 0.0,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            data = json.loads(r.read())
        assert data["object"] == "chat.completion"
        msg = data["choices"][0]["message"]
        assert msg["role"] == "assistant" and isinstance(msg["content"], str)

    def test_logprobs_field(self):
        """Completions `logprobs` returns token strings + logprobs when the
        engine is deployed with logprobs_topk."""
        from aria_tpu.engine.http_server import ServingLoop, make_handler

        params = init_aria_params(jax.random.PRNGKey(0), TINY, dtype=jnp.float32)
        engine = BatchedEngine(params, TINY, max_lanes=1, max_seq_len=128,
                               temperature=0.0, decode_chunk=4,
                               cache_dtype=jnp.float32, logprobs_topk=2)
        loop = ServingLoop(engine, ByteTokenizer())
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(loop))
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{httpd.server_port}/v1/completions",
                data=json.dumps({"prompt": "lp", "max_tokens": 4,
                                 "temperature": 0.0, "logprobs": 2}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                data = json.loads(r.read())
            lp = data["choices"][0]["logprobs"]
            assert len(lp["token_logprobs"]) == len(lp["tokens"]) == 4
            assert all(v <= 0 for v in lp["token_logprobs"])
            assert all(len(d) == 2 for d in lp["top_logprobs"])
        finally:
            httpd.shutdown()
            loop.shutdown()

    def test_n_choices(self, server):
        req = urllib.request.Request(
            server + "/v1/completions",
            data=json.dumps({"model": "aria-tpu", "prompt": "pick n",
                             "max_tokens": 4, "temperature": 0.0,
                             "n": 3}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=180) as r:
            data = json.loads(r.read())
        assert [c["index"] for c in data["choices"]] == [0, 1, 2]
        # greedy: all three concurrent lanes must agree
        assert len({c["text"] for c in data["choices"]}) == 1
        assert data["usage"]["completion_tokens"] == sum(
            4 for _ in data["choices"])

    def test_chat_completions_stream(self, server):
        events = sse_events(server, "/v1/chat/completions", {
            "model": "aria-tpu",
            "messages": [{"role": "user", "content": "stream chat"}],
            "max_tokens": 6, "temperature": 0.0, "stream": True,
        })
        assert events[0]["choices"][0]["delta"].get("role") == "assistant"
        assert events[-1]["choices"][0]["finish_reason"] == "stop"
        content = "".join(
            ev["choices"][0]["delta"].get("content", "") for ev in events
        )
        assert isinstance(content, str)
        assert all(ev["object"] == "chat.completion.chunk" for ev in events)


class TestHTTPSamplingParams:
    """OpenAI sampling params flow from the HTTP payload to the engine's
    per-lane sampling state (top_p/min_p/penalties)."""

    def test_repetition_penalty_changes_output(self, server):
        base = post(server, {"prompt": "hello", "max_new_tokens": 8})
        pen = post(server, {"prompt": "hello", "max_new_tokens": 8,
                            "repetition_penalty": 1e6})
        toks = pen["tokens"]
        assert len(set(toks)) == len(toks), toks
        assert base["error"] is None and pen["error"] is None

    def test_oai_chat_accepts_sampling_params(self, server):
        req = urllib.request.Request(
            server + "/v1/chat/completions",
            data=json.dumps({
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4, "temperature": 0.7, "top_p": 0.9,
                "min_p": 0.01, "presence_penalty": 0.5,
                "frequency_penalty": 0.5,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert out["choices"][0]["message"]["content"] is not None
