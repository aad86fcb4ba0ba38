"""Serving engine: jitted prefill + chunked-scan decode with a static KV cache.

The gptfast performance path rebuilt the JAX way (reference
gptfast/generate.py:112-177): instead of torch.compile'ing a Python decode
loop, the whole decode step — cache update, attention, MoE, sampling — is one
jitted function, and N steps are rolled into a single ``lax.scan`` so host
dispatch overhead is amortized across a chunk. Stop tokens are checked on the
host once per chunk (bounded latency, no per-step device sync — the reference
pays a per-step sync for stop-string checks, generate.py:324-335).

Prompts are padded to power-of-two buckets so each shape compiles once.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from aria_tpu.config import AriaConfig
from aria_tpu.engine.guided import guided_mask, guided_next_state
from aria_tpu.engine.sampling import apply_penalties, sample, update_counts
from aria_tpu.models.aria import prepare_embeddings
from aria_tpu.models.moe_lm import KVCache, lm_forward


@dataclasses.dataclass(frozen=True)
class GenerationConfig:
    max_new_tokens: int = 256
    temperature: float = 0.8
    top_k: Optional[int] = 200
    # Nucleus / min-p filtering (OpenAI + vLLM parameter parity; the
    # reference reaches these via vLLM, docs/inference.md:80-149). Applied
    # after top-k on the temperature-scaled logits, inside the jitted scan.
    top_p: Optional[float] = None
    min_p: Optional[float] = None
    # Sampling penalties (vLLM semantics — see sampling.apply_penalties).
    # Enabling any of these threads a [1, vocab] count plane through the
    # decode scan (its own compiled variant; zero cost when disabled).
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    repetition_penalty: float = 1.0
    stop_token_ids: tuple[int, ...] = ()
    decode_chunk: int = 32
    # Constrained decoding (engine/guided.py): a TokenFSM compiled from a
    # regex or the JSON grammar. Applied as a gather+mask inside the jitted
    # decode scan — no per-step host sync.
    guided: Optional[object] = None  # TokenFSM
    # Prompt-lookup speculative decoding (engine/speculative.py): draft k
    # tokens from the on-device n-gram matcher, verify them in one (k+1)-
    # token forward. Greedy output is bit-identical to plain decode; sampled
    # output preserves the target distribution (rejection sampling).
    speculative: Optional[object] = None  # SpeculativeConfig

    @property
    def uses_penalties(self) -> bool:
        return (self.presence_penalty != 0.0 or self.frequency_penalty != 0.0
                or self.repetition_penalty != 1.0)


@dataclasses.dataclass
class GenerateResult:
    tokens: list[int]  # generated tokens (no prompt), truncated at stop
    prefill_s: float
    decode_s: float
    steps: int
    # speculative runs only: forward passes executed and tokens each produced
    verify_steps: Optional[int] = None
    produced_per_step: Optional[list[int]] = None

    @property
    def tokens_per_s(self) -> float:
        return self.steps / self.decode_s if self.decode_s > 0 else float("inf")


def _bucket(n: int, minimum: int = 32) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class Engine:
    def __init__(
        self,
        params: dict,
        cfg: AriaConfig,
        *,
        max_seq_len: int = 2048,
        cache_dtype=jnp.bfloat16,
        rng_seed: int = 0,
        mesh=None,  # multi-chip serving: TP/EP-shard params over this mesh
    ):
        self.cfg = cfg
        # decode-attention streams the cache in 512-position blocks when the
        # allocation divides (fewer per-block fixed costs; the length clamp
        # keeps partial tails from costing a full block of DMA)
        self.max_seq_len = -(-max_seq_len // 512) * 512
        self.cache_dtype = cache_dtype
        self._rng = jax.random.PRNGKey(rng_seed)
        self._prefill_jit = {}
        self._decode_jit = {}
        self.mesh = mesh
        if mesh is not None:
            # The serving analogue of the reference's device_map="auto" /
            # vLLM TP (aria/inference.py:56, docs/inference.md:88-91):
            # GSPMD-shard the params; every jitted step compiles multi-chip.
            from aria_tpu.parallel.mesh import (
                aria_param_specs,
                is_serving_quantized,
                serving_param_specs,
                shard_tree,
            )

            if is_serving_quantized(params):
                # int4/int8 serving form: expert stacks shard over `expert`
                # (per-leaf), everything else replicates — the layout the
                # full-stack EP decode kernels consume (parallel/ep.py)
                specs = serving_param_specs(params)
            else:
                specs = aria_param_specs()
                if "vision" not in params:
                    specs = {k: v for k, v in specs.items() if k in params}
            params = shard_tree(params, specs, mesh)
        self.params = params

    def _shard_cache(self, cache: KVCache) -> KVCache:
        if self.mesh is None:
            return cache
        from jax.sharding import NamedSharding, PartitionSpec as P

        # heads follow TP, positions follow CP (64K context over chips);
        # int4 caches pack head pairs into one byte plane, so their head
        # axis stays replicated (parallel/cp_cache.py handles both)
        h_ax = None if cache.packed4 else "model"
        spec = P(None, None, h_ax, "context", None)
        sc_spec = P(None, None, h_ax, "context")
        return KVCache(
            jax.device_put(cache.k, NamedSharding(self.mesh, spec)),
            jax.device_put(cache.v, NamedSharding(self.mesh, spec)),
            *((
                jax.device_put(cache.k_scale, NamedSharding(self.mesh, sc_spec)),
                jax.device_put(cache.v_scale, NamedSharding(self.mesh, sc_spec)),
            ) if cache.quantized else (None, None)),
        )

    # ---------------- jitted building blocks ----------------

    @functools.cached_property
    def _encode_jit(self):
        """ViT+projector as its own program (re-traced per pixel shape): keeps
        the vision tower out of every prompt-bucket prefill compile and off
        the LM prefill's peak-memory live range."""
        cfg = self.cfg
        from aria_tpu.models.aria import encode_images

        return jax.jit(lambda params, pv, pm: encode_images(params, cfg, pv, pm))

    def _prefill_fn(self, has_image: bool, guided: bool = False,
                    penalized: bool = False):
        cfg = self.cfg
        mesh = self.mesh

        @functools.partial(jax.jit, static_argnames=("temperature", "top_k"), donate_argnums=(2,))
        def prefill(params, tokens, cache, true_len, rng, image_feats=None,
                    fsm=None, gstate=None, top_p=None, min_p=None, pen=None,
                    *, temperature, top_k):
            B, S = tokens.shape
            embeds = prepare_embeddings(params, cfg, tokens, image_features=image_feats)
            kv_pos = jnp.arange(cache.k.shape[3])
            qi = jnp.arange(S)
            mask = (kv_pos[None, :] <= qi[:, None])[None, None]
            out = lm_forward(
                params["lm"], cfg.text, inputs_embeds=embeds,
                positions=jnp.arange(S), mask=mask,
                cache=cache, cache_pos=jnp.int32(0),
                logit_position=true_len - 1,
                causal_flash=True,  # prefill-from-0: flash over the prompt block
                mesh=mesh,
            )
            logits = out.logits[:, 0]
            counts = None
            if penalized:
                counts, prompt_mask, pres, freq, rep = pen
                logits = apply_penalties(logits, counts, prompt_mask, pres, freq, rep)
            if guided:
                logits = guided_mask(*fsm, gstate, logits)
            next_tok = sample(rng, logits, temperature, top_k, top_p, min_p)
            if penalized:
                counts = update_counts(counts, next_tok)
            gstate = (guided_next_state(fsm[0], gstate, next_tok) if guided else None)
            return next_tok, out.cache, gstate, counts

        return prefill

    def _decode_fn(self, guided: bool, penalized: bool):
        """One decode-chunk program per (guided, penalized) combination —
        each feature threads extra scan state (FSM state / the [B, V] token
        counts), so disabled features cost nothing in the compiled step."""
        cfg = self.cfg
        mesh = self.mesh

        @functools.partial(
            jax.jit, static_argnames=("n_steps", "temperature", "top_k"), donate_argnums=(2,)
        )
        def decode_n(params, first_token, cache, start_pos, rng, fsm=None,
                     gstate=None, top_p=None, min_p=None, pen=None,
                     *, n_steps, temperature, top_k):
            kv_pos = jnp.arange(cache.k.shape[3])
            if penalized:
                counts, prompt_mask, pres, freq, rep = pen

            def step(carry, i):
                tok, cache, pos, gstate, counts = carry
                step_rng = jax.random.fold_in(rng, i)
                mask = (kv_pos <= pos)[None, None, None, :]
                out = lm_forward(
                    params["lm"], cfg.text, tok[:, None],
                    positions=pos[None], mask=mask,
                    cache=cache, cache_pos=pos,
                    mesh=mesh,
                )
                logits = out.logits[:, -1]
                if penalized:
                    logits = apply_penalties(logits, counts, prompt_mask, pres, freq, rep)
                if guided:
                    logits = guided_mask(*fsm, gstate, logits)
                nxt = sample(step_rng, logits, temperature, top_k, top_p, min_p)
                if penalized:
                    counts = update_counts(counts, nxt)
                if guided:
                    gstate = guided_next_state(fsm[0], gstate, nxt)
                return (nxt, out.cache, pos + 1, gstate, counts), nxt

            init = (first_token, cache, start_pos, gstate,
                    pen[0] if penalized else None)
            (_, cache, _, gstate, counts), toks = jax.lax.scan(
                step, init, jnp.arange(n_steps)
            )
            return toks, cache, gstate, counts  # toks: [n_steps, B]

        return decode_n

    def _spec_fn(self):
        """Speculative decode chunk: ``n_outer`` draft->verify->accept steps
        chained in one jitted scan (engine/speculative.py). Each step feeds
        the last produced token + k drafted tokens through ONE forward —
        decode is weight-DMA-bound, so the k extra rows ride under the same
        weight stream and accepted draft tokens are nearly free. Rejected
        positions need no rollback: their cache rows sit past the accepted
        length (every mask clamps to it) and are overwritten on reuse."""
        cfg = self.cfg
        mesh = self.mesh

        from aria_tpu.engine.speculative import (
            ngram_draft,
            verify_greedy,
            verify_sampled,
        )

        @functools.partial(
            jax.jit,
            static_argnames=("n_outer", "k", "ngram", "temperature", "top_k"),
            donate_argnums=(2,),
        )
        def spec_chunk(params, cur, cache, pos, hist, hist_len, rng,
                       top_p=None, min_p=None,
                       *, n_outer, k, ngram, temperature, top_k):
            kv_pos = jnp.arange(cache.k.shape[3])
            cap = n_outer * (k + 1)
            greedy = (
                float(temperature) <= 0.0 and top_p is None and min_p is None
            )

            def step(carry, i):
                cur, cache, pos, hist, hl, out_buf, out_len = carry
                draft = ngram_draft(hist, jnp.full((1,), hl), ngram, k)
                fed = jnp.concatenate([cur[:, None], draft], axis=1)
                positions = pos + jnp.arange(k + 1, dtype=jnp.int32)
                mask = (kv_pos[None, :] <= positions[:, None])[None, None]
                out = lm_forward(
                    params["lm"], cfg.text, fed,
                    positions=positions, mask=mask,
                    cache=cache, cache_pos=pos, mesh=mesh,
                )
                logits = out.logits.astype(jnp.float32)  # [1, k+1, V]
                if greedy:
                    prod, n_prod = verify_greedy(logits, draft)
                else:
                    prod, n_prod = verify_sampled(
                        jax.random.fold_in(rng, i), logits, draft,
                        temperature, top_k, top_p, min_p,
                    )
                np0 = n_prod[0]
                out_buf = jax.lax.dynamic_update_slice(out_buf, prod, (0, out_len))
                hist = jax.lax.dynamic_update_slice(hist, prod, (0, hl))
                cur = jnp.take_along_axis(prod, (n_prod - 1)[:, None], axis=1)[:, 0]
                return (cur, out.cache, pos + np0, hist, hl + np0,
                        out_buf, out_len + np0), np0

            init = (cur, cache, pos, hist, hist_len,
                    jnp.zeros((1, cap), jnp.int32), jnp.int32(0))
            (cur, cache, pos, hist, hist_len, out_buf, out_len), per_step = (
                jax.lax.scan(step, init, jnp.arange(n_outer))
            )
            return out_buf, out_len, cur, cache, pos, hist, hist_len, per_step

        return spec_chunk

    def _generate_speculative(self, gen, prompt_tokens, true_len, cache,
                              next_tok, first, top_p, min_p):
        """Chunked speculative decode loop (called by generate after prefill)."""
        sp = gen.speculative
        cap = sp.steps_per_chunk * (sp.k + 1)
        hist_np = np.zeros((1, self.max_seq_len + 2 * cap + sp.ngram), np.int32)
        hist_np[0, :true_len] = prompt_tokens
        hist_np[0, true_len] = first
        hist = jnp.asarray(hist_np)
        hist_len = jnp.int32(true_len + 1)
        pos = jnp.int32(true_len)
        cur = next_tok

        key = ("spec",)
        if key not in self._decode_jit:
            self._decode_jit[key] = self._spec_fn()
        spec_chunk = self._decode_jit[key]

        generated = [first]
        stop_ids = set(gen.stop_token_ids)
        stopped = first in stop_ids
        accepted = []  # produced tokens per verify step (speed diagnostic)
        # One chunk runs ahead of the host, exactly like the plain decode
        # loop: chunk j+1 needs only chunk j's DEVICE carry, so it is
        # dispatched before chunk j's tokens are read back — the dispatch
        # round trip (~100ms through a remote-TPU relay; measured 2.5x the
        # whole device step) overlaps device compute. The budget check lags
        # one chunk, so at most ~2 chunks of tokens overshoot before the
        # trim (the slack validation reserves cache rows for both).
        pending = None
        # like the plain path, the prefill token counts toward max_new_tokens
        # (the budget check reads len(generated), which lags the in-flight
        # chunk — so dispatch can overshoot by up to 2 chunks before the trim)
        while True:
            if not stopped and len(generated) < gen.max_new_tokens:
                self._rng, rng_d = jax.random.split(self._rng)
                out_buf, n_out, cur, cache, pos, hist, hist_len, per_step = (
                    spec_chunk(
                        self.params, cur, cache, pos, hist, hist_len, rng_d,
                        top_p, min_p,
                        n_outer=sp.steps_per_chunk, k=sp.k, ngram=sp.ngram,
                        temperature=gen.temperature, top_k=gen.top_k,
                    )
                )
                nxt = (out_buf, n_out, per_step)
            else:
                nxt = None
            if pending is not None and not stopped:
                out_buf, n_out, per_step = pending
                accepted.extend(np.asarray(per_step).tolist())
                for t in np.asarray(out_buf)[0, : int(n_out)].tolist():
                    generated.append(t)
                    if t in stop_ids:
                        stopped = True
                        break
            pending = nxt
            if pending is None:
                break
        generated = generated[: gen.max_new_tokens]
        for i, t in enumerate(generated):
            if t in stop_ids:
                generated = generated[: i + 1]
                break
        return generated, accepted

    # ---------------- public API ----------------

    def new_cache(self, batch: int = 1) -> KVCache:
        return self._shard_cache(
            KVCache.init(self.cfg.text, batch, self.max_seq_len, self.cache_dtype)
        )

    def generate(
        self,
        prompt_tokens: Sequence[int],
        gen: GenerationConfig = GenerationConfig(),
        pixel_values: Optional[np.ndarray] = None,  # [N, C, S, S]
        pixel_mask: Optional[np.ndarray] = None,  # [N, S, S] bool
        stop_check: Optional[Callable[[list[int]], bool]] = None,
    ) -> GenerateResult:
        """Single-sequence generation (continuous batching lives in serving/)."""
        cfg = self.cfg
        true_len = len(prompt_tokens)
        bucket = _bucket(true_len)
        if bucket + gen.max_new_tokens > self.max_seq_len:
            raise ValueError(
                f"prompt bucket {bucket} + max_new_tokens {gen.max_new_tokens} "
                f"exceeds max_seq_len {self.max_seq_len}"
            )
        if gen.speculative is not None:
            sp = gen.speculative
            if gen.guided is not None or gen.uses_penalties:
                raise ValueError(
                    "speculative decoding composes with temperature/top_k/"
                    "top_p/min_p but not (yet) with guided decoding or "
                    "sampling penalties"
                )
            # up to TWO chunks may overshoot max_new_tokens before the host
            # trims (one chunk runs ahead of the budget check), and every
            # verify step writes k+1 cache rows from the current pos
            slack = 2 * sp.steps_per_chunk * (sp.k + 1) + sp.k
            if bucket + gen.max_new_tokens + slack > self.max_seq_len:
                raise ValueError(
                    f"speculative decoding needs {slack} slack cache rows: "
                    f"bucket {bucket} + max_new {gen.max_new_tokens} + "
                    f"{slack} > max_seq_len {self.max_seq_len}"
                )
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, :true_len] = prompt_tokens

        has_image = pixel_values is not None
        guided = gen.guided is not None
        penalized = gen.uses_penalties
        key = (has_image, bucket, guided, penalized)
        if key not in self._prefill_jit:
            self._prefill_jit[key] = self._prefill_fn(has_image, guided, penalized)
        prefill = self._prefill_jit[key]

        self._rng, rng_p = jax.random.split(self._rng)
        cache = self.new_cache(1)

        t0 = time.perf_counter()
        kwargs = dict(temperature=gen.temperature, top_k=gen.top_k)
        fsm = None
        if guided:
            fsm = (gen.guided.trans, gen.guided.accepting, gen.guided.stop_mask)
            kwargs.update(fsm=fsm, gstate=jnp.full((1,), gen.guided.start, jnp.int32))
        top_p = min_p = None
        if gen.top_p is not None:
            top_p = jnp.full((1,), float(gen.top_p), jnp.float32)
            kwargs.update(top_p=top_p)
        if gen.min_p is not None:
            min_p = jnp.full((1,), float(gen.min_p), jnp.float32)
            kwargs.update(min_p=min_p)
        pen_static = None
        if penalized:
            V = cfg.text.vocab_size
            pmask = np.zeros((1, V), bool)
            pmask[0, np.asarray(prompt_tokens, np.int32)] = True
            pen_static = (
                jnp.asarray(pmask),
                jnp.full((1,), gen.presence_penalty, jnp.float32),
                jnp.full((1,), gen.frequency_penalty, jnp.float32),
                jnp.full((1,), gen.repetition_penalty, jnp.float32),
            )
            kwargs.update(pen=(jnp.zeros((1, V), jnp.int32),) + pen_static)
        if has_image:
            feats = self._encode_jit(
                self.params, jnp.asarray(pixel_values),
                None if pixel_mask is None else jnp.asarray(pixel_mask),
            )
            next_tok, cache, gstate, counts = prefill(
                self.params, jnp.asarray(tokens), cache, jnp.int32(true_len), rng_p,
                feats, **kwargs,
            )
        else:
            next_tok, cache, gstate, counts = prefill(
                self.params, jnp.asarray(tokens), cache, jnp.int32(true_len), rng_p, **kwargs,
            )
        first = int(next_tok[0])  # blocks until prefill done
        t1 = time.perf_counter()

        if gen.speculative is not None:
            generated, accepted = self._generate_speculative(
                gen, prompt_tokens, true_len, cache, next_tok, first,
                top_p, min_p,
            )
            t2 = time.perf_counter()
            return GenerateResult(
                tokens=generated, prefill_s=t1 - t0, decode_s=t2 - t1,
                steps=len(generated) - 1,
                verify_steps=len(accepted), produced_per_step=accepted,
            )

        generated = [first]
        stop_ids = set(gen.stop_token_ids)
        stopped = first in stop_ids
        pos = true_len
        cur = next_tok
        planned = len(generated)
        pending = None  # chunk dispatched but not yet read back
        # One chunk runs ahead of the host: chunk k+1 is dispatched (it only
        # needs chunk k's last token, a device array) BEFORE chunk k's tokens
        # are synced for stop checks, so the dispatch round-trip — ~10s of ms
        # through a remote-TPU relay — overlaps device compute instead of
        # serializing with it. On a stop, at most one speculative chunk of
        # compute is discarded (the reference pays a per-step sync instead,
        # gptfast/generate.py:324-335).
        dkey = (guided, penalized)
        if dkey not in self._decode_jit:
            self._decode_jit[dkey] = self._decode_fn(guided, penalized)
        decode = self._decode_jit[dkey]
        while True:
            if not stopped and planned < gen.max_new_tokens:
                n = min(gen.decode_chunk, gen.max_new_tokens - planned)
                self._rng, rng_d = jax.random.split(self._rng)
                toks, cache, gstate, counts = decode(
                    self.params, cur, cache, jnp.int32(pos), rng_d,
                    fsm, gstate, top_p, min_p,
                    (counts,) + pen_static if penalized else None,
                    n_steps=n, temperature=gen.temperature, top_k=gen.top_k,
                )
                nxt = toks
                planned += n
                pos += n
                cur = toks[-1]
            else:
                nxt = None
            if pending is not None and not stopped:
                for t in np.asarray(pending)[:, 0].tolist():
                    generated.append(t)
                    if t in stop_ids or (stop_check is not None and stop_check(generated)):
                        stopped = True
                        break
            pending = nxt
            if pending is None:
                break
        t2 = time.perf_counter()

        # Trim everything after (and including) a stop token.
        for i, t in enumerate(generated):
            if t in stop_ids:
                generated = generated[: i + 1]
                break

        return GenerateResult(
            tokens=generated,
            prefill_s=t1 - t0,
            decode_s=t2 - t1,
            steps=len(generated) - 1,  # decode-step tokens (first came from prefill)
        )
