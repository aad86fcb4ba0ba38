"""Continuous-batching serving engine.

The TPU-native answer to the reference's vLLM serving path (docs/
inference.md:80-149): a fixed pool of B cache lanes, single-sequence prefill
into a free lane, and one jitted decode step advancing ALL active lanes
together. Requests join and leave the batch at chunk boundaries — no global
drain. Everything is static-shape: lanes that are idle decode garbage behind a
mask and are simply ignored.

Design notes:
- KV cache is [L, B, S_max, H, D]; per-lane write offsets use scatter updates
  (moe_lm._attention's vector cache_pos path).
- Sampling is per-lane (temperature/top-k shared per engine for now).
- Stop handling happens host-side between chunks, like Engine.generate.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from collections import deque
from typing import Callable, Deque, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from aria_tpu.config import AriaConfig
from aria_tpu.engine.generate import GenerationConfig, _bucket
from aria_tpu.engine.sampling import sample
from aria_tpu.models.aria import prepare_embeddings
from aria_tpu.models.moe_lm import KVCache, lm_forward


@dataclasses.dataclass
class Request:
    uid: int
    prompt_tokens: List[int]
    max_new_tokens: int = 256
    stop_token_ids: tuple = ()
    pixel_values: Optional[np.ndarray] = None
    pixel_mask: Optional[np.ndarray] = None
    temperature: Optional[float] = None  # None = engine default
    # filled by the server
    generated: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    error: Optional[str] = None


class BatchedEngine:
    def __init__(
        self,
        params: dict,
        cfg: AriaConfig,
        *,
        max_lanes: int = 4,
        max_seq_len: int = 2048,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        decode_chunk: int = 16,
        cache_dtype=jnp.bfloat16,
        rng_seed: int = 0,
    ):
        self.params = params
        self.cfg = cfg
        self.B = max_lanes
        self.S = -(-max_seq_len // 256) * 256
        self.temperature = temperature
        self.top_k = top_k
        self.decode_chunk = decode_chunk
        self._rng = jax.random.PRNGKey(rng_seed)

        self.cache = KVCache.init(cfg.text, self.B, self.S, cache_dtype)
        self.lane_req: List[Optional[Request]] = [None] * self.B
        self.lane_pos = np.zeros(self.B, np.int32)  # next write position
        self.lane_tok = np.zeros(self.B, np.int32)  # last sampled token
        self.lane_temp = np.full(self.B, temperature, np.float32)  # per-lane sampling
        self.queue: Deque[Request] = deque()
        self._uid = 0
        self._prefill_jit: Dict = {}
        self._finished: List[Request] = []

    # ------------------------------------------------------------ jit fns

    def _make_prefill(self):
        cfg = self.cfg

        @functools.partial(jax.jit, donate_argnums=(2,), static_argnames=("lane",))
        def prefill(params, tokens, cache, true_len, rng, lane, temp=0.0, pixel_values=None, pixel_mask=None):
            _, S = tokens.shape
            embeds = prepare_embeddings(params, cfg, tokens, pixel_values, pixel_mask)
            # Slice ALL cache leaves (k, v and — for int8 caches — the fp32
            # scales). Dropping the scales would make _attention see an
            # unquantized cache and raw-cast bf16 K/V to int8.
            lane_cache = jax.tree.map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, lane, 1, axis=1), cache
            )
            kv_pos = jnp.arange(lane_cache.k.shape[3])
            qi = jnp.arange(S)
            mask = (kv_pos[None, :] <= qi[:, None])[None, None]
            out = lm_forward(
                params["lm"], cfg.text, inputs_embeds=embeds,
                positions=jnp.arange(S), mask=mask,
                cache=lane_cache, cache_pos=jnp.int32(0),
                logit_position=true_len - 1, causal_flash=True,
            )
            new_cache = jax.tree.map(
                lambda full, ln: jax.lax.dynamic_update_slice_in_dim(full, ln, lane, axis=1),
                cache, out.cache,
            )
            tok = sample(rng, out.logits[:, 0], jnp.full((1,), temp, jnp.float32), self.top_k)
            return tok[0], new_cache

        return prefill

    @functools.cached_property
    def _decode_jit(self):
        cfg = self.cfg

        @functools.partial(jax.jit, donate_argnums=(2,), static_argnames=("n_steps",))
        def decode_n(params, toks, cache, pos, active, temps, rng, *, n_steps):
            kv_pos = jnp.arange(cache.k.shape[3])

            def step(carry, i):
                toks, cache, pos = carry
                step_rng = jax.random.fold_in(rng, i)
                mask = (kv_pos[None, :] <= pos[:, None])[:, None, None, :]  # [B,1,1,S]
                out = lm_forward(
                    params["lm"], cfg.text, toks[:, None],
                    positions=pos[:, None], mask=mask,
                    cache=cache, cache_pos=pos,
                )
                nxt = sample(step_rng, out.logits[:, -1], temps, self.top_k)
                pos = jnp.where(active, pos + 1, pos)
                nxt = jnp.where(active, nxt, toks)
                return (nxt, out.cache, pos), nxt

            (toks, cache, pos), all_toks = jax.lax.scan(
                step, (toks, cache, pos), jnp.arange(n_steps)
            )
            return all_toks, toks, cache, pos  # all_toks: [n_steps, B]

        return decode_n

    # ------------------------------------------------------------ API

    def submit(
        self,
        prompt_tokens: Sequence[int],
        max_new_tokens: int = 256,
        stop_token_ids: Sequence[int] = (),
        pixel_values: Optional[np.ndarray] = None,
        pixel_mask: Optional[np.ndarray] = None,
        temperature: Optional[float] = None,
    ) -> int:
        self._uid += 1
        self.queue.append(Request(
            uid=self._uid, prompt_tokens=list(prompt_tokens),
            max_new_tokens=max_new_tokens, stop_token_ids=tuple(stop_token_ids),
            pixel_values=pixel_values, pixel_mask=pixel_mask,
            temperature=temperature,
        ))
        return self._uid

    def _free_lane(self) -> Optional[int]:
        for i, r in enumerate(self.lane_req):
            if r is None:
                return i
        return None

    def _admit(self) -> bool:
        lane = self._free_lane()
        if lane is None or not self.queue:
            return False
        req = self.queue.popleft()
        true_len = len(req.prompt_tokens)
        bucket = _bucket(true_len)
        if bucket + req.max_new_tokens > self.S:
            req.done = True
            req.error = f"request {req.uid} exceeds max_seq_len {self.S}"
            self._finished.append(req)
            return True
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, :true_len] = req.prompt_tokens

        key = (bucket, None if req.pixel_values is None else req.pixel_values.shape)
        if key not in self._prefill_jit:
            self._prefill_jit[key] = self._make_prefill()
        prefill = self._prefill_jit[key]

        self._rng, rng = jax.random.split(self._rng)
        kwargs = {}
        if req.pixel_values is not None:
            kwargs = dict(pixel_values=jnp.asarray(req.pixel_values),
                          pixel_mask=jnp.asarray(req.pixel_mask))
        req_temp = self.temperature if req.temperature is None else req.temperature
        tok, self.cache = prefill(
            self.params, jnp.asarray(tokens), self.cache, jnp.int32(true_len), rng,
            lane, jnp.float32(req_temp), **kwargs,
        )
        first = int(tok)
        req.generated.append(first)
        self.lane_req[lane] = req
        self.lane_pos[lane] = true_len
        self.lane_tok[lane] = first
        self.lane_temp[lane] = self.temperature if req.temperature is None else req.temperature
        if first in req.stop_token_ids or len(req.generated) >= req.max_new_tokens:
            self._finish(lane)
        return True

    def _finish(self, lane: int):
        req = self.lane_req[lane]
        if req is not None:
            req.done = True
            self._finished.append(req)
        self.lane_req[lane] = None

    def _active_mask(self) -> np.ndarray:
        return np.asarray([r is not None for r in self.lane_req], bool)

    def step(self) -> List[Request]:
        """Admit queued requests, run one decode chunk, return newly finished
        requests."""
        while self._admit():
            pass
        active = self._active_mask()
        if not active.any():
            out, self._finished = self._finished, []
            return out

        self._rng, rng = jax.random.split(self._rng)
        all_toks, last, self.cache, pos = self._decode_jit(
            self.params, jnp.asarray(self.lane_tok), self.cache,
            jnp.asarray(self.lane_pos), jnp.asarray(active),
            jnp.asarray(self.lane_temp), rng,
            n_steps=self.decode_chunk,
        )
        toks_host = np.asarray(all_toks)  # [n, B]
        self.lane_pos = np.array(pos)  # copy: np.asarray of a jax array is read-only
        self.lane_tok = np.array(last)

        for lane in range(self.B):
            req = self.lane_req[lane]
            if req is None:
                continue
            for t in toks_host[:, lane].tolist():
                req.generated.append(int(t))
                if (
                    t in req.stop_token_ids
                    or len(req.generated) >= req.max_new_tokens
                    or int(self.lane_pos[lane]) >= self.S - 1
                ):
                    self._finish(lane)
                    break
        out, self._finished = self._finished, []
        return out

    def run_until_complete(self, max_ticks: int = 10_000) -> List[Request]:
        """Drain queue + lanes; returns all finished requests."""
        out: List[Request] = []
        for _ in range(max_ticks):
            out.extend(self.step())
            if not self.queue and not self._active_mask().any():
                break
        return out
