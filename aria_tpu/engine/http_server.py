"""Minimal HTTP serving frontend over the continuous-batching engine.

The reference delegates production serving to vLLM (docs/inference.md:80-149);
this is the equivalent front door here: a stdlib HTTP server that enqueues
requests into a BatchedEngine and a scheduler thread that drives decode
chunks. Requests join/leave the batch mid-flight.

    POST /generate {"prompt": str, "max_new_tokens": int, "temperature": float}
      -> {"text": str, "tokens": [...], "uid": int}
    GET /health -> {"status": "ok", "active": n, "queued": m}
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional


class ServingLoop:
    """Drives BatchedEngine.step() on a dedicated thread; callers block on
    per-request events."""

    def __init__(self, engine, tokenizer, max_image_size: int = 980):
        from aria_tpu.data.processor import AriaProcessor

        self.engine = engine
        self.tokenizer = tokenizer
        self.processor = AriaProcessor(tokenizer)
        self.max_image_size = max_image_size
        self._lock = threading.Lock()
        self._events: Dict[int, threading.Event] = {}
        self._results: Dict[int, object] = {}
        self._abandoned: set = set()
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        import time

        while not self._stop:
            with self._lock:
                finished = self.engine.step()
                idle = not self.engine.queue and not self.engine._active_mask().any()
            for req in finished:
                if req.uid in self._abandoned:  # timed-out caller: discard
                    self._abandoned.discard(req.uid)
                    continue
                self._results[req.uid] = req
                ev = self._events.pop(req.uid, None)
                if ev:
                    ev.set()
            if idle:
                time.sleep(0.005)

    def submit_and_wait(self, prompt: str, max_new_tokens: int = 256,
                        temperature: Optional[float] = None,
                        timeout: float = 600.0):
        out = self.processor(prompt, max_image_size=self.max_image_size)
        stop_ids = tuple(
            t for t in [getattr(self.tokenizer, "eos_token_id", None)] if t is not None
        )
        ev = threading.Event()
        with self._lock:
            uid = self.engine.submit(
                out.input_ids[0].tolist(), max_new_tokens=max_new_tokens,
                stop_token_ids=stop_ids, temperature=temperature,
            )
            self._events[uid] = ev
        if not ev.wait(timeout):
            # Drop our bookkeeping so the request's eventual result doesn't
            # leak in _results forever. The lane itself still runs to
            # max_new_tokens (BatchedEngine has no mid-flight cancel yet);
            # _abandoned tells the scheduler loop to discard the result.
            with self._lock:
                self._events.pop(uid, None)
                self._abandoned.add(uid)
            raise TimeoutError(f"request {uid} timed out")
        req = self._results.pop(uid)
        text = self.tokenizer.decode(req.generated).split("<|im_end|>")[0]
        return {"text": text, "tokens": req.generated, "uid": uid,
                "error": req.error}

    def shutdown(self):
        self._stop = True
        self._thread.join(timeout=5)


def make_handler(loop: ServingLoop):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _json(self, code: int, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                with loop._lock:
                    active = int(loop.engine._active_mask().sum())
                    queued = len(loop.engine.queue)
                self._json(200, {"status": "ok", "active": active, "queued": queued})
            else:
                self._json(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._json(404, {"error": "not found"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(length) or b"{}")
                result = loop.submit_and_wait(
                    payload["prompt"],
                    max_new_tokens=int(payload.get("max_new_tokens", 256)),
                    temperature=payload.get("temperature"),
                )
                self._json(200, result)
            except KeyError as e:
                self._json(400, {"error": f"missing field {e}"})
            except Exception as e:  # noqa: BLE001
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(engine, tokenizer, host: str = "127.0.0.1", port: int = 8000):
    loop = ServingLoop(engine, tokenizer)
    httpd = ThreadingHTTPServer((host, port), make_handler(loop))
    print(f"serving on {host}:{port}")
    try:
        httpd.serve_forever()
    finally:
        loop.shutdown()
