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
