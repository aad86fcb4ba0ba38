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
import os
import time
from collections import deque
from typing import Callable, Deque, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from aria_tpu.config import AriaConfig
from aria_tpu.engine.generate import GenerationConfig, _bucket
from aria_tpu.engine.sampling import apply_penalties, sample, update_counts
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
    # per-request sampling params (OpenAI/vLLM parity; None = off). Setting
    # any of them switches the engine's decode program to the variant that
    # threads the extra sampling state — zero cost until first used.
    top_p: Optional[float] = None
    min_p: Optional[float] = None
    presence_penalty: Optional[float] = None
    frequency_penalty: Optional[float] = None
    repetition_penalty: Optional[float] = None
    guided: bool = False  # constrain output with the engine's TokenFSM
    adapter_id: int = 0  # multi-LoRA: index into the engine's AdapterRegistry
    # filled by the server
    generated: List[int] = dataclasses.field(default_factory=list)
    done: bool = False
    error: Optional[str] = None
    cached_tokens: int = 0  # prompt tokens served from the prefix cache
    # engine built with logprobs_topk=K: per generated token, its log-prob
    # under the raw (pre-temperature) distribution + the top-K alternatives
    logprobs: List[float] = dataclasses.field(default_factory=list)
    top_logprobs: List[dict] = dataclasses.field(default_factory=list)


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
        mesh=None,  # multi-chip serving: TP/EP-shard params over this mesh
        guided_fsm=None,  # TokenFSM (engine/guided.py): requests submitted
        #                   with guided=True decode under this constraint;
        #                   others ride its transparent free state
        adapters=None,  # AdapterRegistry (engine/multi_lora.py): resident
        #                 task LoRAs, selected per request via submit(adapter=)
        logprobs_topk: Optional[int] = None,  # report per-token logprobs
        #                 (+ top-K alternatives) on every request
    ):
        self.cfg = cfg
        self.guided_fsm = guided_fsm
        if adapters is not None:
            from aria_tpu.engine.multi_lora import registry_for_params

            # fused-shared-experts base stacks need matching adapter stacks
            adapters = registry_for_params(adapters, params["lm"]["layers"],
                                           cfg.text)
        self.adapters = adapters
        self.logprobs_topk = logprobs_topk
        self.B = max_lanes
        # 128 = the decode-attention kernel's minimum S block; finer rounding
        # matters at high lane counts (96 lanes x an extra 128 positions of
        # int4 KV is ~0.9GB of HBM)
        self.S = -(-max_seq_len // 128) * 128
        self.temperature = temperature
        self.top_k = top_k
        self.decode_chunk = decode_chunk
        self._rng = jax.random.PRNGKey(rng_seed)
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from aria_tpu.parallel.mesh import aria_param_specs, shard_tree

            assert cache_dtype != "int4", "int4 KV head-pairing crosses TP shards"
            specs = aria_param_specs()
            if "vision" not in params:
                specs = {k: v for k, v in specs.items() if k in params}
            params = shard_tree(params, specs, mesh)
        self.params = params

        self.cache_dtype = cache_dtype
        self.cache = KVCache.init(cfg.text, self.B, self.S, cache_dtype)
        if mesh is not None:
            kv_s = NamedSharding(mesh, P(None, None, "model", None, None))
            sc_s = NamedSharding(mesh, P(None, None, "model", None))
            self.cache = KVCache(
                jax.device_put(self.cache.k, kv_s), jax.device_put(self.cache.v, kv_s),
                *((jax.device_put(self.cache.k_scale, sc_s),
                   jax.device_put(self.cache.v_scale, sc_s))
                  if self.cache.quantized else (None, None)),
            )
        self.lane_req: List[Optional[Request]] = [None] * self.B
        self.lane_pos = np.zeros(self.B, np.int32)  # next write position
        # last sampled token per lane lives ON DEVICE: admission writes the
        # prefill token with a (async) scatter and the decode chunk consumes
        # it directly — no host round trip per admitted request
        self.lane_tok = jnp.zeros(self.B, jnp.int32)
        self.lane_temp = np.full(self.B, temperature, np.float32)  # per-lane sampling
        # per-lane nucleus/min-p/penalty params at passthrough defaults; the
        # decode program only reads them once a request enables the feature
        self.lane_top_p = np.ones(self.B, np.float32)
        self.lane_min_p = np.zeros(self.B, np.float32)
        self.lane_pres = np.zeros(self.B, np.float32)
        self.lane_freq = np.zeros(self.B, np.float32)
        self.lane_rep = np.ones(self.B, np.float32)
        self._nucleus = False  # a request used top_p/min_p
        self._penalties = False  # a request used a penalty
        self.lane_counts = None  # device [B, V] output-token counts
        self.lane_pmask = None  # device [B, V] prompt-token mask
        self.lane_gstate = (
            jnp.full((self.B,), guided_fsm.free_state, jnp.int32)
            if guided_fsm is not None else None
        )
        self.lane_adapter = np.zeros(self.B, np.int32)  # 0 = base model
        self.queue: Deque[Request] = deque()
        self._uid = 0
        self._prefill_jit: Dict = {}
        self._finished: List[Request] = []
        # (lane, req, first-token device scalar) triples whose first token has
        # not been read back yet; resolved in one batched read at chunk drain
        self._pending_first: List = []

    # ------------------------------------------------------------ jit fns

    @functools.cached_property
    def _encode_jit(self):
        """ViT+projector as a separate program (see Engine._encode_jit): one
        compile shared by all prompt buckets, and the vision activation peak
        never stacks on the LM prefill's inside a single live range."""
        cfg = self.cfg
        from aria_tpu.models.aria import encode_images

        return jax.jit(lambda params, pv, pm: encode_images(params, cfg, pv, pm))

    def _make_prefill(self, multi: bool):
        cfg = self.cfg
        mesh = self.mesh
        guided = self.guided_fsm is not None
        lp_k = self.logprobs_topk

        @functools.partial(jax.jit, donate_argnums=(2,), static_argnames=("lane",))
        def prefill(params, tokens, cache, true_len, rng, lane, temp=0.0,
                    fsm=None, gstate=None, ml=None, lora_hot=None,
                    image_feats=None, top_p=None, min_p=None, pen=None):
            _, S = tokens.shape
            embeds = prepare_embeddings(params, cfg, tokens, image_features=image_feats)
            # Slice ALL cache leaves (k, v and — for int8 caches — the fp32
            # scales). Dropping the scales would make _attention see an
            # unquantized cache and raw-cast bf16 K/V to int8.
            lane_cache = jax.tree.map(
                lambda a: jax.lax.dynamic_slice_in_dim(a, lane, 1, axis=1), cache
            )
            kv_pos = jnp.arange(lane_cache.k.shape[3])
            qi = jnp.arange(S)
            mask = (kv_pos[None, :] <= qi[:, None])[None, None]
            lkw = (dict(lora=ml, lora_scale=1.0, lora_onehot=lora_hot)
                   if multi else {})
            out = lm_forward(
                params["lm"], cfg.text, inputs_embeds=embeds,
                positions=jnp.arange(S), mask=mask,
                cache=lane_cache, cache_pos=jnp.int32(0),
                logit_position=true_len - 1, causal_flash=True,
                mesh=mesh, **lkw,
            )
            new_cache = jax.tree.map(
                lambda full, ln: jax.lax.dynamic_update_slice_in_dim(full, ln, lane, axis=1),
                cache, out.cache,
            )
            logits = out.logits[:, 0]
            if pen is not None:
                # fresh request: output counts are all zero, so only the
                # prompt-side repetition penalty can bite the first token
                pmask_new, pres, freq, rep = pen
                logits = apply_penalties(
                    logits, jnp.zeros_like(logits, jnp.int32), pmask_new,
                    pres, freq, rep)
            if guided:
                from aria_tpu.engine.guided import guided_mask, guided_next_state

                logits = guided_mask(*fsm, gstate, logits)
            tok = sample(rng, logits, jnp.full((1,), temp, jnp.float32),
                         self.top_k, top_p, min_p)
            extras = []
            if guided:
                extras.append(guided_next_state(fsm[0], gstate, tok)[0])
            if lp_k:
                from aria_tpu.engine.sampling import token_logprobs

                lp, ti, tl = token_logprobs(out.logits[:, 0], tok, k=lp_k)
                extras.append((lp[0], ti[0], tl[0]))
            return (tok[0], new_cache, *extras)

        return prefill

    def _make_prefill_multi(self, multi: bool):
        """Batched admission: N same-bucket text prompts prefill in ONE call
        writing N cache lanes. 32 serial per-request prefills each stream the
        whole expert stack (~1.7 ms/layer x 28 x N device time); batched,
        the stack streams once for all N — admission cost goes from O(N)
        full-model sweeps to O(1)."""
        cfg = self.cfg
        mesh = self.mesh
        guided = self.guided_fsm is not None
        lp_k = self.logprobs_topk

        @functools.partial(jax.jit, donate_argnums=(2,))
        def prefill_multi(params, tokens, cache, true_lens, rng, lanes, temps,
                          fsm=None, gstates=None, ml=None, lora_hot=None,
                          top_p=None, min_p=None, pen=None):
            N, S = tokens.shape
            embeds = prepare_embeddings(params, cfg, tokens, None, None)
            # A prefill-from-0 never READS pre-existing lane state (the causal
            # flash block attends only within the prompt it just wrote), so
            # the working cache is a fresh BUCKET-length one — both gathering
            # the real lanes (jnp.take over [L, B, H, Smax, D]) and a
            # full-Smax zero cache cost whole-cache HLO temps that OOM at 32
            # lanes; only positions < S are written, so only they scatter back.
            lane_cache = KVCache.init(cfg.text, N, S, self.cache_dtype)
            kv_pos = jnp.arange(S)
            qi = jnp.arange(S)
            mask = (kv_pos[None, :] <= qi[:, None])[None, None]
            lkw = (dict(lora=ml, lora_scale=1.0, lora_onehot=lora_hot)
                   if multi else {})
            out = lm_forward(
                params["lm"], cfg.text, inputs_embeds=embeds,
                positions=jnp.arange(S), mask=mask,
                cache=lane_cache, cache_pos=jnp.int32(0),
                logit_position=true_lens - 1,  # [N]: per-row positions
                causal_flash=True, mesh=mesh, **lkw,
            )
            # duplicate lane ids (pow2 padding repeats the last request) write
            # identical rows, so the scatter is deterministic
            new_cache = jax.tree.map(
                lambda full, ln: full.at[:, lanes, :, :S].set(ln), cache, out.cache
            )
            logits = out.logits[:, 0]
            pmask_new = None
            if pen is not None:
                pres, freq, rep = pen
                # prompt-token mask built in-graph from the padded prompt rows
                valid = jnp.arange(S)[None, :] < true_lens[:, None]
                pmask_new = jnp.zeros((N, logits.shape[-1]), bool).at[
                    jnp.arange(N)[:, None], tokens
                ].max(valid)
                logits = apply_penalties(
                    logits, jnp.zeros_like(logits, jnp.int32), pmask_new,
                    pres, freq, rep)
            if guided:
                from aria_tpu.engine.guided import guided_mask, guided_next_state

                logits = guided_mask(*fsm, gstates, logits)
            toks = sample(rng, logits, temps, self.top_k, top_p, min_p)
            extras = []
            if guided:
                extras.append(guided_next_state(fsm[0], gstates, toks))
            if lp_k:
                from aria_tpu.engine.sampling import token_logprobs

                extras.append(token_logprobs(out.logits[:, 0], toks, k=lp_k))
            if pen is not None:
                extras.append(pmask_new)
            return (toks, new_cache, *extras)

        return prefill_multi

    def _decode_prog(self, multi: bool):
        """Decode program, one variant per ``multi`` (adapters threaded or
        not): when NO active lane holds an adapter, the base variant runs —
        on a quantized base the adapter variant pays the blocked dequant
        path every step (observed 12.5 vs ~500 tok/s aggregate at the full
        int4 form), so base-only traffic must never ride it."""
        progs = self.__dict__.setdefault("_decode_progs", {})
        if multi not in progs:
            progs[multi] = self._make_decode(multi)
        return progs[multi]

    def _make_decode(self, multi: bool):
        cfg = self.cfg
        mesh = self.mesh
        guided = self.guided_fsm is not None
        lp_k = self.logprobs_topk

        @functools.partial(jax.jit, donate_argnums=(2,), static_argnames=("n_steps",))
        def decode_n(params, toks, cache, pos, active, temps, rng,
                     fsm=None, gstate=None, ml=None, lora_hot=None,
                     top_p=None, min_p=None, pen=None, *, n_steps):
            kv_pos = jnp.arange(cache.k.shape[3])
            lkw = (dict(lora=ml, lora_scale=1.0, lora_onehot=lora_hot)
                   if multi else {})
            if pen is not None:
                counts0, pmask, pres, freq, rep = pen

            def step(carry, i):
                toks, cache, pos, gstate, counts = carry
                step_rng = jax.random.fold_in(rng, i)
                mask = (kv_pos[None, :] <= pos[:, None])[:, None, None, :]  # [B,1,1,S]
                out = lm_forward(
                    params["lm"], cfg.text, toks[:, None],
                    positions=pos[:, None], mask=mask,
                    cache=cache, cache_pos=pos,
                    mesh=mesh, **lkw,
                )
                logits = out.logits[:, -1]
                if pen is not None:
                    logits = apply_penalties(logits, counts, pmask, pres, freq, rep)
                if guided:
                    from aria_tpu.engine.guided import guided_mask, guided_next_state

                    logits = guided_mask(*fsm, gstate, logits)
                nxt = sample(step_rng, logits, temps, self.top_k, top_p, min_p)
                if guided:
                    gstate = jnp.where(
                        active, guided_next_state(fsm[0], gstate, nxt), gstate
                    )
                if pen is not None:
                    counts = update_counts(counts, nxt, active)
                pos = jnp.where(active, pos + 1, pos)
                nxt = jnp.where(active, nxt, toks)
                ys = nxt
                if lp_k:
                    from aria_tpu.engine.sampling import token_logprobs

                    ys = (nxt, token_logprobs(out.logits[:, -1], nxt, k=lp_k))
                return (nxt, out.cache, pos, gstate, counts), ys

            gstate0 = gstate if guided else jnp.zeros((), jnp.int32)
            counts0 = counts0 if pen is not None else jnp.zeros((), jnp.int32)
            (toks, cache, pos, gstate, counts), ys = jax.lax.scan(
                step, (toks, cache, pos, gstate0, counts0), jnp.arange(n_steps)
            )
            all_toks, lps = ys if lp_k else (ys, None)
            return all_toks, toks, cache, pos, gstate, lps, counts

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
        guided: bool = False,
        adapter: Optional[str] = None,
        top_p: Optional[float] = None,
        min_p: Optional[float] = None,
        presence_penalty: Optional[float] = None,
        frequency_penalty: Optional[float] = None,
        repetition_penalty: Optional[float] = None,
    ) -> int:
        if guided and self.guided_fsm is None:
            raise ValueError("engine was built without a guided_fsm")
        if adapter and self.adapters is None:
            raise ValueError("engine was built without adapters")
        self._uid += 1
        if top_p is not None or min_p is not None:
            self._nucleus = True
        if (presence_penalty or frequency_penalty
                or (repetition_penalty not in (None, 1.0))):
            self._ensure_penalty_state()
        self.queue.append(Request(
            uid=self._uid, prompt_tokens=list(prompt_tokens),
            max_new_tokens=max_new_tokens, stop_token_ids=tuple(stop_token_ids),
            pixel_values=pixel_values, pixel_mask=pixel_mask,
            temperature=temperature, guided=guided,
            top_p=top_p, min_p=min_p, presence_penalty=presence_penalty,
            frequency_penalty=frequency_penalty,
            repetition_penalty=repetition_penalty,
            adapter_id=self.adapters.resolve(adapter) if self.adapters else 0,
        ))
        return self._uid

    def _ensure_penalty_state(self):
        if not self._penalties:
            self._penalties = True
            V = self.cfg.text.vocab_size
            self.lane_counts = jnp.zeros((self.B, V), jnp.int32)
            self.lane_pmask = jnp.zeros((self.B, V), bool)

    def _sampling_kwargs(self, rows=None) -> dict:
        """The per-lane nucleus/penalty arguments for a decode or grouped-
        prefill call; `rows` selects a subset of lanes (grouped prefill)."""
        kw = {}
        sel = (lambda a: a) if rows is None else (lambda a: a[rows])
        if self._nucleus:
            kw["top_p"] = jnp.asarray(sel(self.lane_top_p))
            kw["min_p"] = jnp.asarray(sel(self.lane_min_p))
        return kw

    @staticmethod
    def _req_sampling(req) -> tuple:
        return (1.0 if req.top_p is None else req.top_p,
                0.0 if req.min_p is None else req.min_p,
                req.presence_penalty or 0.0,
                req.frequency_penalty or 0.0,
                1.0 if req.repetition_penalty is None else req.repetition_penalty)

    def _set_lane_sampling(self, lane: int, req) -> None:
        (self.lane_top_p[lane], self.lane_min_p[lane], self.lane_pres[lane],
         self.lane_freq[lane], self.lane_rep[lane]) = self._req_sampling(req)

    def _fsm_args(self):
        f = self.guided_fsm
        return (f.trans, f.accepting, f.stop_mask)

    def _free_lane(self) -> Optional[int]:
        for i, r in enumerate(self.lane_req):
            if r is None:
                return i
        return None

    def _admit_all(self):
        """Admit queued requests: image requests one at a time (crop shapes
        vary), text requests grouped by prompt bucket into ONE multi-lane
        prefill each — an admission burst of N costs one expert-stack sweep
        instead of N."""
        while self.queue:
            if self.queue[0].pixel_values is not None:
                if not self._admit():
                    return
                continue
            free = [i for i, r in enumerate(self.lane_req) if r is None]
            if not free:
                return
            group: List[Request] = []
            bucket = None
            # Cap the burst: a 128-row x 64-token prefill's segmented-MoE f32
            # temps alone are ~1.4GB (observed OOM at 96 lanes); 32 rows
            # bounds them at ~350MB while keeping the O(1)-expert-stream
            # amortization for the common burst sizes. ARIA_TPU_GROUP_ROWS
            # lowers it further for memory-tight deployments: the full-model
            # int4 form with resident multi-LoRA stacks OOM'd the grouped
            # prefill COMPILE at 8 rows x bucket 64 (19GB vs 15.75GB HBM).
            cap = int(os.environ.get("ARIA_TPU_GROUP_ROWS", "32"))
            while self.queue and len(group) < min(len(free), cap):
                req = self.queue[0]
                if req.pixel_values is not None:
                    break
                b = _bucket(len(req.prompt_tokens))
                if b + req.max_new_tokens > self.S:
                    self.queue.popleft()
                    req.done = True
                    req.error = f"request {req.uid} exceeds max_seq_len {self.S}"
                    self._finished.append(req)
                    continue
                if bucket is None:
                    bucket = b
                elif b != bucket:
                    break
                self.queue.popleft()
                group.append(req)
            if group:
                self._prefill_group(group, bucket, free[: len(group)])

    def _prefill_group(self, group: List[Request], bucket: int, lanes: List[int]):
        N = len(group)
        Np = 1 << (N - 1).bit_length()  # pad to pow2: bounded compile count
        rows = list(range(N)) + [N - 1] * (Np - N)  # repeat last request
        tokens = np.zeros((Np, bucket), np.int32)
        true_lens = np.zeros(Np, np.int32)
        temps = np.zeros(Np, np.float32)
        lanes_arr = np.zeros(Np, np.int32)
        samp = np.zeros((Np, 5), np.float32)  # top_p/min_p/pres/freq/rep rows
        for row, i in enumerate(rows):
            req = group[i]
            tokens[row, : len(req.prompt_tokens)] = req.prompt_tokens
            true_lens[row] = len(req.prompt_tokens)
            temps[row] = self.temperature if req.temperature is None else req.temperature
            lanes_arr[row] = lanes[i]
            samp[row] = self._req_sampling(req)
        # base-only groups take the no-adapter program: on a quantized base
        # the adapter variant pays the blocked dequant path for every layer
        use_ml = self.adapters is not None and any(r.adapter_id for r in group)
        key = ("multi", bucket, Np, use_ml)
        if key not in self._prefill_jit:
            self._prefill_jit[key] = self._make_prefill_multi(use_ml)
        self._rng, rng = jax.random.split(self._rng)
        args = (self.params, jnp.asarray(tokens), self.cache,
                jnp.asarray(true_lens), rng, jnp.asarray(lanes_arr),
                jnp.asarray(temps))
        mlkw = {}
        if self._nucleus:
            mlkw.update(top_p=jnp.asarray(samp[:, 0]), min_p=jnp.asarray(samp[:, 1]))
        if self._penalties:
            mlkw.update(pen=(jnp.asarray(samp[:, 2]), jnp.asarray(samp[:, 3]),
                             jnp.asarray(samp[:, 4])))
        if self.adapters is not None:
            for i, req in enumerate(group):
                self.lane_adapter[lanes[i]] = req.adapter_id
        if use_ml:
            ids = [group[i].adapter_id for i in rows]
            mlkw.update(ml=self.adapters.stacked,
                        lora_hot=self.adapters.lane_onehot(ids))
        if self.guided_fsm is not None:
            f = self.guided_fsm
            g0 = np.full(Np, f.free_state, np.int32)
            for row, i in enumerate(rows):
                if group[i].guided:
                    g0[row] = f.start
            res = self._prefill_jit[key](
                *args, fsm=self._fsm_args(), gstates=jnp.asarray(g0), **mlkw)
        else:
            res = self._prefill_jit[key](*args, **mlkw)
        toks, self.cache, *extras = res
        if self.guided_fsm is not None:
            self.lane_gstate = self.lane_gstate.at[
                jnp.asarray(lanes_arr[:N])].set(extras.pop(0)[:N])
        lp_pack = extras.pop(0) if self.logprobs_topk else None
        if self._penalties:
            # scatter only the N real rows (pad rows repeat a lane id)
            pmask_new = extras.pop(0)
            ln = jnp.asarray(lanes_arr[:N])
            self.lane_pmask = self.lane_pmask.at[ln].set(pmask_new[:N])
            self.lane_counts = self.lane_counts.at[ln].set(0).at[
                ln, toks[:N]].add(1)
        # Scatter only the N real rows: pad rows repeat lane N-1's id but draw
        # independent gumbel noise, so a duplicate-index scatter would leave a
        # nondeterministic winner in that lane (device token could diverge from
        # the one recorded in req.generated at temperature>0).
        self.lane_tok = self.lane_tok.at[jnp.asarray(lanes_arr[:N])].set(toks[:N])
        for i, req in enumerate(group):
            lane = lanes[i]
            lp_i = None if lp_pack is None else tuple(a[i] for a in lp_pack)
            self._pending_first.append((lane, req, toks[i], lp_i))
            self.lane_req[lane] = req
            self.lane_pos[lane] = len(req.prompt_tokens)
            self.lane_temp[lane] = float(temps[i])
            self._set_lane_sampling(lane, req)

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

        use_ml = self.adapters is not None and req.adapter_id != 0
        key = (bucket, req.pixel_values is not None, use_ml)
        if key not in self._prefill_jit:
            self._prefill_jit[key] = self._make_prefill(use_ml)
        prefill = self._prefill_jit[key]

        self._rng, rng = jax.random.split(self._rng)
        kwargs = {}
        if req.pixel_values is not None:
            kwargs = dict(image_feats=self._encode_jit(
                self.params, jnp.asarray(req.pixel_values),
                None if req.pixel_mask is None else jnp.asarray(req.pixel_mask)
            ))
        req_temp = self.temperature if req.temperature is None else req.temperature
        tp, mp, pres, freq, rep = self._req_sampling(req)
        if self._nucleus:
            kwargs.update(top_p=jnp.full((1,), tp, jnp.float32),
                          min_p=jnp.full((1,), mp, jnp.float32))
        pmask_new = None
        if self._penalties:
            pm = np.zeros((1, self.cfg.text.vocab_size), bool)
            pm[0, np.asarray(req.prompt_tokens, np.int32)] = True
            pmask_new = jnp.asarray(pm)
            kwargs.update(pen=(pmask_new,
                               jnp.full((1,), pres, jnp.float32),
                               jnp.full((1,), freq, jnp.float32),
                               jnp.full((1,), rep, jnp.float32)))
        if self.adapters is not None:
            self.lane_adapter[lane] = req.adapter_id
        if use_ml:
            kwargs.update(ml=self.adapters.stacked,
                          lora_hot=self.adapters.lane_onehot([req.adapter_id]))
        if self.guided_fsm is not None:
            f = self.guided_fsm
            kwargs.update(
                fsm=self._fsm_args(),
                gstate=jnp.full((1,), f.start if req.guided else f.free_state,
                                jnp.int32),
            )
        res = prefill(
            self.params, jnp.asarray(tokens), self.cache, jnp.int32(true_len),
            rng, lane, jnp.float32(req_temp), **kwargs,
        )
        tok, self.cache, *extras = res
        if self.guided_fsm is not None:
            self.lane_gstate = self.lane_gstate.at[lane].set(extras.pop(0))
        lp_e = extras.pop(0) if self.logprobs_topk else None
        # Do NOT sync the first token here: a blocking read per admission
        # costs a full relay round trip (~90 ms measured at 32 lanes — it was
        # 60% of the aggregate-throughput bench). The device scalar is
        # scattered into the lane-token vector the decode chunk consumes, and
        # read back in ONE batched transfer at the next chunk drain.
        self.lane_tok = self.lane_tok.at[lane].set(tok)
        if self._penalties:
            self.lane_pmask = self.lane_pmask.at[lane].set(pmask_new[0])
            self.lane_counts = self.lane_counts.at[lane].set(0).at[lane, tok].add(1)
        self._pending_first.append((lane, req, tok, lp_e))
        self.lane_req[lane] = req
        self.lane_pos[lane] = true_len
        self.lane_temp[lane] = req_temp
        self._set_lane_sampling(lane, req)
        return True

    @staticmethod
    def _append_logprobs(req, chosen, top_ids, top_lps):
        req.logprobs.append(float(chosen))
        req.top_logprobs.append(
            {int(i): float(l) for i, l in zip(np.ravel(top_ids), np.ravel(top_lps))}
        )

    def _finish(self, lane: int):
        req = self.lane_req[lane]
        if req is not None:
            req.done = True
            self._finished.append(req)
        self.lane_req[lane] = None
        self.lane_adapter[lane] = 0
        self.lane_top_p[lane] = 1.0
        self.lane_min_p[lane] = 0.0
        self.lane_pres[lane] = self.lane_freq[lane] = 0.0
        self.lane_rep[lane] = 1.0
        if self.guided_fsm is not None:
            self.lane_gstate = self.lane_gstate.at[lane].set(
                self.guided_fsm.free_state)

    def cancel(self, uid: int) -> bool:
        """Abort a queued or running request; frees its lane immediately
        (vLLM abort_request parity — used by the HTTP front end on client
        disconnect/timeout so abandoned requests stop burning decode steps)."""
        for r in self.queue:
            if r.uid == uid:
                self.queue.remove(r)
                r.done = True
                r.error = "cancelled"
                self._finished.append(r)
                return True
        for lane, r in enumerate(self.lane_req):
            if r is not None and r.uid == uid:
                self._pending_first = [
                    e for e in self._pending_first if e[1].uid != uid
                ]
                r.error = "cancelled"
                self._finish(lane)
                return True
        return False

    def _active_mask(self) -> np.ndarray:
        return np.asarray([r is not None for r in self.lane_req], bool)

    def step(self) -> List[Request]:
        """Admit queued requests, run one decode chunk, return newly finished
        requests."""
        self._admit_all()
        active = self._active_mask()
        if not active.any():
            out, self._finished = self._finished, []
            return out

        self._rng, rng = jax.random.split(self._rng)
        gkw = (
            dict(fsm=self._fsm_args(), gstate=self.lane_gstate)
            if self.guided_fsm is not None else {}
        )
        use_ml = self.adapters is not None and bool(self.lane_adapter.any())
        if use_ml:
            gkw.update(ml=self.adapters.stacked,
                       lora_hot=self.adapters.lane_onehot(self.lane_adapter))
        gkw.update(self._sampling_kwargs())
        if self._penalties:
            gkw["pen"] = (self.lane_counts, self.lane_pmask,
                          jnp.asarray(self.lane_pres), jnp.asarray(self.lane_freq),
                          jnp.asarray(self.lane_rep))
        all_toks, last, self.cache, pos, gstate, lps, counts = self._decode_prog(use_ml)(
            self.params, self.lane_tok, self.cache,
            jnp.asarray(self.lane_pos), jnp.asarray(active),
            jnp.asarray(self.lane_temp), rng, **gkw,
            n_steps=self.decode_chunk,
        )
        if self._penalties:
            self.lane_counts = counts
        if self.guided_fsm is not None:
            self.lane_gstate = gstate
        toks_host = np.asarray(all_toks)  # [n, B] — the one sync per chunk
        lps_host = None
        if self.logprobs_topk:
            lps_host = tuple(np.asarray(a) for a in lps)  # chosen/ids/tops
        self.lane_pos = np.array(pos)  # copy: np.asarray of a jax array is read-only
        self.lane_tok = last

        if self._pending_first:
            # one batched readback for every request admitted this chunk
            firsts = np.asarray(jnp.stack([e[2] for e in self._pending_first]))
            for (lane, req, _, lp_e), first in zip(self._pending_first, firsts.tolist()):
                req.generated.append(int(first))
                if lp_e is not None:
                    self._append_logprobs(req, *(np.asarray(a) for a in lp_e))
                if (
                    first in req.stop_token_ids
                    or len(req.generated) >= req.max_new_tokens
                ):
                    self._finish(lane)  # chunk tokens for this lane discarded
            self._pending_first = []

        for lane in range(self.B):
            req = self.lane_req[lane]
            if req is None:
                continue
            for step_i, t in enumerate(toks_host[:, lane].tolist()):
                req.generated.append(int(t))
                if lps_host is not None:
                    self._append_logprobs(
                        req, lps_host[0][step_i, lane],
                        lps_host[1][step_i, lane], lps_host[2][step_i, lane])
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


class PagedBatchedEngine:
    """Continuous batching over a SHARED page pool with CHUNKED prefill.

    Closes the two round-1 gaps vs the vLLM role (docs/inference.md:80-149):

    - Paged KV (engine/paged.py): lanes draw ``page_size``-token pages from
      one pool, so HBM scales with tokens in flight, not lanes x max_seq_len;
      pages recycle the moment a request finishes.
    - Chunked prefill: admission runs the prompt through ``prefill_chunk``-
      token pieces, ONE piece per ``step()`` tick, with the decode chunk for
      already-running lanes in the same tick — a long prompt no longer
      stalls every other lane's decode.

    Image features are computed once at admission (ViT+projector), scattered
    into the full prompt embedding, and sliced per chunk.
    """

    PREFILL = "prefill"
    DECODE = "decode"

    def __init__(
        self,
        params: dict,
        cfg: AriaConfig,
        *,
        max_lanes: int = 4,
        max_seq_len: int = 2048,
        page_size: int = 256,
        num_pages: Optional[int] = None,
        prefill_chunk: int = 128,
        temperature: float = 0.0,
        top_k: Optional[int] = None,
        decode_chunk: int = 16,
        cache_dtype=jnp.bfloat16,
        rng_seed: int = 0,
        prefix_cache: bool = True,
        guided_fsm=None,  # TokenFSM: see BatchedEngine
        adapters=None,  # AdapterRegistry: see BatchedEngine
    ):
        from aria_tpu.engine.paged import PagePool, PagedKVCache

        self.params = params
        self.cfg = cfg
        self.B = max_lanes
        self.PS = page_size
        self.MAXP = -(-max_seq_len // page_size)
        self.S = self.MAXP * page_size
        self.C = prefill_chunk
        self.temperature = temperature
        self.top_k = top_k
        self.decode_chunk = decode_chunk
        self._rng = jax.random.PRNGKey(rng_seed)

        # default pool: half of full-residency + 1 slack page per lane + null
        if num_pages is None:
            num_pages = 1 + max_lanes * (self.MAXP // 2 + 1)
        self.pool = PagePool(num_pages)
        self.cache = PagedKVCache.init(cfg.text, num_pages, page_size, cache_dtype)
        self.page_table = np.zeros((self.B, self.MAXP), np.int32)  # 0 = null page
        # Automatic prefix caching (vLLM parity): full prompt pages are
        # content-addressed by a chain hash of their token ids, so requests
        # sharing a prefix (system prompt, few-shot header) reuse the cached
        # KV pages and skip those prefill chunks. Reuse offsets are page
        # multiples, so the chunk grid must tile pages exactly.
        self.prefix_cache = prefix_cache and (page_size % prefill_chunk == 0)
        self.lane_keys: List[Optional[list]] = [None] * self.B
        self.guided_fsm = guided_fsm
        self.lane_gstate = (
            jnp.full((self.B,), guided_fsm.free_state, jnp.int32)
            if guided_fsm is not None else None
        )
        if adapters is not None:
            from aria_tpu.engine.multi_lora import registry_for_params

            # fused-shared-experts base stacks need matching adapter stacks
            adapters = registry_for_params(adapters, params["lm"]["layers"],
                                           cfg.text)
        self.adapters = adapters
        self.lane_adapter = np.zeros(self.B, np.int32)  # 0 = base model

        self.lane_req: List[Optional[Request]] = [None] * self.B
        self.lane_state = [None] * self.B  # PREFILL | DECODE | None
        self.lane_pages: List[list] = [[] for _ in range(self.B)]
        self.lane_pos = np.zeros(self.B, np.int32)
        # device-resident (see BatchedEngine): prefill completion scatters the
        # first token in without a per-request host sync
        self.lane_tok = jnp.zeros(self.B, jnp.int32)
        self.lane_temp = np.full(self.B, temperature, np.float32)
        # per-lane nucleus/min-p/penalty params (see BatchedEngine)
        self.lane_top_p = np.ones(self.B, np.float32)
        self.lane_min_p = np.zeros(self.B, np.float32)
        self.lane_pres = np.zeros(self.B, np.float32)
        self.lane_freq = np.zeros(self.B, np.float32)
        self.lane_rep = np.ones(self.B, np.float32)
        self._nucleus = False
        self._penalties = False
        self.lane_counts = None
        self.lane_pmask = None
        self.lane_embeds: List = [None] * self.B  # device [1, bucket, D] during prefill
        self._pending_first: List = []  # (lane, req, device scalar)
        self.lane_true_len = np.zeros(self.B, np.int32)
        self.queue: Deque[Request] = deque()
        self._uid = 0
        self._finished: List[Request] = []
        self._embed_jit: Dict = {}

    # ------------------------------------------------------------ jit fns

    def _chunk_prog(self, multi: bool):
        progs = self.__dict__.setdefault("_chunk_progs", {})
        if multi not in progs:
            progs[multi] = self._make_chunk(multi)
        return progs[multi]

    def _make_chunk(self, multi: bool):
        """One prefill chunk for N mid-prefill lanes TOGETHER: each serial
        per-lane chunk streams the whole expert stack, so advancing every
        prefilling lane in one call makes admission cost O(1) model sweeps
        per tick instead of O(lanes) — the same batching the contiguous
        engine's grouped admission does, generalized to per-row offsets and
        page-table rows."""
        cfg = self.cfg
        C, K = self.C, self.S
        guided = self.guided_fsm is not None

        @functools.partial(jax.jit, donate_argnums=(2,))
        def prefill_chunk(params, embeds, cache, pt_rows, offsets, logit_at, temp, rng,
                          fsm=None, gstate=None, ml=None, lora_hot=None,
                          top_p=None, min_p=None, pen=None):
            # embeds: [N, C, D]; pt_rows: [N, MAXP]; offsets/logit_at/temp: [N]
            kv_pos = jnp.arange(K)
            qi = offsets[:, None] + jnp.arange(C)[None, :]  # [N, C]
            mask = (kv_pos[None, None, :] <= qi[:, :, None])[:, None]  # [N,1,C,K]
            lkw = (dict(lora=ml, lora_scale=1.0, lora_onehot=lora_hot)
                   if multi else {})
            out = lm_forward(
                params["lm"], cfg.text, inputs_embeds=embeds,
                positions=qi, mask=mask,
                cache=cache, cache_pos=offsets,
                logit_position=jnp.clip(logit_at, 0, C - 1),
                page_table=pt_rows, causal_flash=False, **lkw,
            )
            logits = out.logits[:, 0]
            if pen is not None:
                # first generated token of a fresh request: zero output
                # counts; intermediate chunks' sampled tokens are
                # placeholders, so penalizing them too is harmless
                pmask_rows, pres, freq, rep = pen
                logits = apply_penalties(
                    logits, jnp.zeros_like(logits, jnp.int32), pmask_rows,
                    pres, freq, rep)
            if guided:
                from aria_tpu.engine.guided import guided_mask, guided_next_state

                logits = guided_mask(*fsm, gstate, logits)
            toks = sample(rng, logits, temp, self.top_k, top_p, min_p)
            if guided:
                # the host commits this state only on the COMPLETING chunk —
                # intermediate chunks' sampled tokens are placeholders
                return toks, out.cache, guided_next_state(fsm[0], gstate, toks)
            return toks, out.cache

        return prefill_chunk

    def _decode_prog(self, multi: bool):
        progs = self.__dict__.setdefault("_decode_progs", {})
        if multi not in progs:
            progs[multi] = self._make_decode(multi)
        return progs[multi]

    def _make_decode(self, multi: bool):
        cfg = self.cfg
        K = self.S
        guided = self.guided_fsm is not None

        @functools.partial(jax.jit, donate_argnums=(2,), static_argnames=("n_steps",))
        def decode_n(params, toks, cache, pt, pos, active, temps, rng,
                     fsm=None, gstate=None, ml=None, lora_hot=None,
                     top_p=None, min_p=None, pen=None, *, n_steps):
            kv_pos = jnp.arange(K)
            lkw = (dict(lora=ml, lora_scale=1.0, lora_onehot=lora_hot)
                   if multi else {})
            if pen is not None:
                counts0, pmask, pres, freq, rep = pen

            def step(carry, i):
                toks, cache, pos, gstate, counts = carry
                step_rng = jax.random.fold_in(rng, i)
                mask = (kv_pos[None, :] <= pos[:, None])[:, None, None, :]
                out = lm_forward(
                    params["lm"], cfg.text, toks[:, None],
                    positions=pos[:, None], mask=mask,
                    cache=cache, cache_pos=pos, page_table=pt, **lkw,
                )
                logits = out.logits[:, -1]
                if pen is not None:
                    logits = apply_penalties(logits, counts, pmask, pres, freq, rep)
                if guided:
                    from aria_tpu.engine.guided import guided_mask, guided_next_state

                    logits = guided_mask(*fsm, gstate, logits)
                nxt = sample(step_rng, logits, temps, self.top_k, top_p, min_p)
                if guided:
                    gstate = jnp.where(
                        active, guided_next_state(fsm[0], gstate, nxt), gstate
                    )
                if pen is not None:
                    counts = update_counts(counts, nxt, active)
                pos = jnp.where(active, pos + 1, pos)
                nxt = jnp.where(active, nxt, toks)
                return (nxt, cache if out.cache is None else out.cache,
                        pos, gstate, counts), nxt

            gstate0 = gstate if guided else jnp.zeros((), jnp.int32)
            counts0 = counts0 if pen is not None else jnp.zeros((), jnp.int32)
            (toks, cache, pos, gstate, counts), all_toks = jax.lax.scan(
                step, (toks, cache, pos, gstate0, counts0), jnp.arange(n_steps)
            )
            return all_toks, toks, cache, pos, gstate, counts

        return decode_n

    def _fsm_args(self):
        f = self.guided_fsm
        return (f.trans, f.accepting, f.stop_mask)

    # ------------------------------------------------------------ API

    # shared per-lane sampling-state helpers (same attrs on both engines)
    _ensure_penalty_state = BatchedEngine._ensure_penalty_state
    _sampling_kwargs = BatchedEngine._sampling_kwargs
    _req_sampling = staticmethod(BatchedEngine._req_sampling)
    _set_lane_sampling = BatchedEngine._set_lane_sampling

    def submit(self, prompt_tokens: Sequence[int], max_new_tokens: int = 256,
               stop_token_ids: Sequence[int] = (), pixel_values=None,
               pixel_mask=None, temperature: Optional[float] = None,
               guided: bool = False, adapter: Optional[str] = None,
               top_p: Optional[float] = None, min_p: Optional[float] = None,
               presence_penalty: Optional[float] = None,
               frequency_penalty: Optional[float] = None,
               repetition_penalty: Optional[float] = None) -> int:
        if guided and self.guided_fsm is None:
            raise ValueError("engine was built without a guided_fsm")
        if adapter and self.adapters is None:
            raise ValueError("engine was built without adapters")
        self._uid += 1
        if top_p is not None or min_p is not None:
            self._nucleus = True
        if (presence_penalty or frequency_penalty
                or (repetition_penalty not in (None, 1.0))):
            self._ensure_penalty_state()
        self.queue.append(Request(
            uid=self._uid, prompt_tokens=list(prompt_tokens),
            max_new_tokens=max_new_tokens, stop_token_ids=tuple(stop_token_ids),
            pixel_values=pixel_values, pixel_mask=pixel_mask, temperature=temperature,
            guided=guided,
            top_p=top_p, min_p=min_p, presence_penalty=presence_penalty,
            frequency_penalty=frequency_penalty,
            repetition_penalty=repetition_penalty,
            adapter_id=self.adapters.resolve(adapter) if self.adapters else 0,
        ))
        return self._uid

    def _free_lane(self) -> Optional[int]:
        for i, r in enumerate(self.lane_req):
            if r is None:
                return i
        return None

    @functools.cached_property
    def _encode_jit(self):
        """See BatchedEngine._encode_jit: ViT+projector as its own program."""
        cfg = self.cfg
        from aria_tpu.models.aria import encode_images

        return jax.jit(lambda params, pv, pm: encode_images(params, cfg, pv, pm))

    def _embeds_for(self, req: Request, bucket: int):
        key = (bucket, req.pixel_values is not None)
        if key not in self._embed_jit:
            self._embed_jit[key] = jax.jit(
                lambda p, t, feats=None: prepare_embeddings(
                    p, self.cfg, t, image_features=feats)
            )
        tokens = np.zeros((1, bucket), np.int32)
        tokens[0, : len(req.prompt_tokens)] = req.prompt_tokens
        args = [self.params, jnp.asarray(tokens)]
        if req.pixel_values is not None:
            args.append(self._encode_jit(
                self.params, jnp.asarray(req.pixel_values),
                None if req.pixel_mask is None else jnp.asarray(req.pixel_mask)))
        return self._embed_jit[key](*args)

    def _admit(self) -> bool:
        """Start ONE queued request: allocate pages, compute embeddings, mark
        the lane as mid-prefill. No model chunk runs here."""
        lane = self._free_lane()
        if lane is None or not self.queue:
            return False
        req = self.queue[0]
        true_len = len(req.prompt_tokens)
        total = true_len + req.max_new_tokens
        if total > self.S:
            self.queue.popleft()
            req.done = True
            req.error = f"request {req.uid} needs {total} > max_seq_len {self.S}"
            self._finished.append(req)
            return True
        n_chunks = -(-true_len // self.C)
        need_pages = -(-(n_chunks * self.C) // self.PS)

        # Prefix-cache lookup (text-only: image KV depends on pixel content).
        # Never reuse the page holding the last prompt token — at least one
        # chunk must run to produce the first-token logits.
        shared: list = []
        keys: Optional[list] = None
        if self.prefix_cache and req.pixel_values is None:
            # adapter id salts the keys: LoRA changes wqkv, so the SAME
            # prompt under different adapters has different KV — pages must
            # never be shared across adapters
            keys = self._page_keys(req.prompt_tokens, salt=req.adapter_id)
            for key in keys[: (true_len - 1) // self.PS]:
                page = self.pool.lookup(key)
                if page is None:
                    break
                shared.append(page)

        fresh = self.pool.alloc(need_pages - len(shared))
        if fresh is None:
            self.pool.release(shared)  # pool pressure: stay queued
            return False
        pages = shared + fresh
        self.queue.popleft()
        self.page_table[lane, :need_pages] = pages
        self.lane_pages[lane] = pages
        self.lane_keys[lane] = keys
        self.lane_req[lane] = req
        self.lane_adapter[lane] = req.adapter_id
        self.lane_state[lane] = self.PREFILL
        self.lane_pos[lane] = len(shared) * self.PS  # skip cached chunks
        req.cached_tokens = len(shared) * self.PS
        self.lane_true_len[lane] = true_len
        self.lane_temp[lane] = self.temperature if req.temperature is None else req.temperature
        self._set_lane_sampling(lane, req)
        if self._penalties:
            pm = np.zeros((self.cfg.text.vocab_size,), bool)
            pm[np.asarray(req.prompt_tokens, np.int32)] = True
            self.lane_pmask = self.lane_pmask.at[lane].set(jnp.asarray(pm))
            self.lane_counts = self.lane_counts.at[lane].set(0)
        self.lane_embeds[lane] = self._embeds_for(req, n_chunks * self.C)
        return True

    def _page_keys(self, tokens: Sequence[int], salt: int = 0) -> list:
        """Chain hash per FULL prompt page: key i commits to tokens[0 : (i+1)*PS],
        so equal keys imply equal positions AND equal history — the cached
        KV (absolute-position RoPE) is valid verbatim. ``salt`` namespaces
        the keys (per adapter: LoRA-altered KV is content-distinct)."""
        import hashlib

        h = hashlib.sha1(np.int32(salt).tobytes())
        keys = []
        for i in range(len(tokens) // self.PS):
            h.update(np.asarray(
                tokens[i * self.PS : (i + 1) * self.PS], np.int32).tobytes())
            keys.append(h.hexdigest())
        return keys

    def _prefill_tick(self):
        """Advance EVERY mid-prefill lane by one chunk, in ONE batched call:
        each serial per-lane chunk streams the whole expert stack, so a
        burst of admissions would otherwise cost O(lanes) full-model sweeps
        per tick. Rows are padded to a power of two (repeating the last
        lane — duplicate rows rewrite identical pages, which is benign) so
        the jit compile count stays bounded."""
        lanes = [i for i, s in enumerate(self.lane_state) if s == self.PREFILL]
        if not lanes:
            return
        lanes = lanes[:32]  # bound MoE activation temps like grouped admission
        N = len(lanes)
        Np = 1 << (N - 1).bit_length()
        rows = lanes + [lanes[-1]] * (Np - N)
        embeds = jnp.concatenate([
            jax.lax.dynamic_slice_in_dim(
                self.lane_embeds[l], int(self.lane_pos[l]), self.C, axis=1)
            for l in rows], axis=0)
        offsets = np.asarray([self.lane_pos[l] for l in rows], np.int32)
        logit_at = np.asarray(
            [self.lane_true_len[l] - 1 - self.lane_pos[l] for l in rows], np.int32)
        temps = np.asarray([self.lane_temp[l] for l in rows], np.float32)
        self._rng, rng = jax.random.split(self._rng)
        args = (self.params, embeds, self.cache,
                jnp.asarray(self.page_table[rows]), jnp.asarray(offsets),
                jnp.asarray(logit_at), jnp.asarray(temps), rng)
        mlkw = {}
        use_ml = (self.adapters is not None
                  and bool(self.lane_adapter[rows].any()))
        if use_ml:
            mlkw = dict(
                ml=self.adapters.stacked,
                lora_hot=self.adapters.lane_onehot(self.lane_adapter[rows]),
            )
        mlkw.update(self._sampling_kwargs(rows))
        if self._penalties:
            mlkw["pen"] = (jnp.take(self.lane_pmask, jnp.asarray(rows), axis=0),
                           jnp.asarray(self.lane_pres[rows]),
                           jnp.asarray(self.lane_freq[rows]),
                           jnp.asarray(self.lane_rep[rows]))
        new_g = None
        if self.guided_fsm is not None:
            f = self.guided_fsm
            g0 = np.asarray(
                [f.start if self.lane_req[l].guided else f.free_state
                 for l in rows], np.int32)
            toks, self.cache, new_g = self._chunk_prog(use_ml)(
                *args, fsm=self._fsm_args(), gstate=jnp.asarray(g0), **mlkw)
        else:
            toks, self.cache = self._chunk_prog(use_ml)(*args, **mlkw)
        for idx, lane in enumerate(lanes):
            o = int(self.lane_pos[lane]) + self.C
            self.lane_pos[lane] = o
            true_len = int(self.lane_true_len[lane])
            if o < true_len:
                continue
            # prompt fully written; this row's sampled tok is the first token.
            # Deferred readback (see BatchedEngine._admit): scatter the device
            # scalar into the lane-token vector; resolve in one batched read
            # at the next chunk drain.
            req = self.lane_req[lane]
            tok = toks[idx]
            self.lane_tok = self.lane_tok.at[lane].set(tok)
            if self._penalties:
                self.lane_counts = self.lane_counts.at[lane, tok].add(1)
            self._pending_first.append((lane, req, tok))
            self.lane_pos[lane] = true_len
            self.lane_state[lane] = self.DECODE
            self.lane_embeds[lane] = None
            if new_g is not None:  # completing chunk: commit the FSM state
                self.lane_gstate = self.lane_gstate.at[lane].set(new_g[idx])
            # Publish this prompt's full pages: their KV is complete and —
            # decode appends strictly after true_len — immutable from here.
            if self.lane_keys[lane]:
                for key, page in zip(self.lane_keys[lane], self.lane_pages[lane]):
                    self.pool.register(key, page)
                self.lane_keys[lane] = None

    def _ensure_pages(self, lane: int, upto: int) -> bool:
        """Grow the lane's table to cover logical positions < upto."""
        need = -(-upto // self.PS)
        have = len(self.lane_pages[lane])
        if need <= have:
            return True
        extra = self.pool.alloc(need - have)
        if extra is None:
            return False
        self.page_table[lane, have:need] = extra
        self.lane_pages[lane].extend(extra)
        return True

    def _finish(self, lane: int):
        req = self.lane_req[lane]
        if req is not None:
            req.done = True
            self._finished.append(req)
        self.pool.release(self.lane_pages[lane])
        self.page_table[lane, :] = 0
        self.lane_pages[lane] = []
        self.lane_keys[lane] = None  # never register pages of an unfinished prefill
        self.lane_req[lane] = None
        self.lane_state[lane] = None
        self.lane_embeds[lane] = None
        self.lane_adapter[lane] = 0
        self.lane_top_p[lane] = 1.0
        self.lane_min_p[lane] = 0.0
        self.lane_pres[lane] = self.lane_freq[lane] = 0.0
        self.lane_rep[lane] = 1.0
        if self.guided_fsm is not None:
            self.lane_gstate = self.lane_gstate.at[lane].set(
                self.guided_fsm.free_state)

    def cancel(self, uid: int) -> bool:
        """Abort a queued or running request, recycling its pages (see
        BatchedEngine.cancel)."""
        for r in self.queue:
            if r.uid == uid:
                self.queue.remove(r)
                r.done = True
                r.error = "cancelled"
                self._finished.append(r)
                return True
        for lane, r in enumerate(self.lane_req):
            if r is not None and r.uid == uid:
                self._pending_first = [
                    e for e in self._pending_first if e[1].uid != uid
                ]
                r.error = "cancelled"
                self._finish(lane)
                return True
        return False

    def _decode_mask(self) -> np.ndarray:
        return np.asarray([s == self.DECODE for s in self.lane_state], bool)

    def step(self) -> List[Request]:
        """One scheduler tick: admit, one prefill chunk, one decode chunk."""
        while self._admit():
            pass
        self._prefill_tick()

        active = self._decode_mask()
        for lane in range(self.B):  # decode growth: one chunk of headroom
            if active[lane] and not self._ensure_pages(
                lane, int(self.lane_pos[lane]) + self.decode_chunk + 1
            ):
                active[lane] = False  # page pressure: pause this lane's decode
        if active.any():
            self._rng, rng = jax.random.split(self._rng)
            gkw = (
                dict(fsm=self._fsm_args(), gstate=self.lane_gstate)
                if self.guided_fsm is not None else {}
            )
            use_ml = (self.adapters is not None
                      and bool(self.lane_adapter.any()))
            if use_ml:
                gkw.update(
                    ml=self.adapters.stacked,
                    lora_hot=self.adapters.lane_onehot(self.lane_adapter),
                )
            gkw.update(self._sampling_kwargs())
            if self._penalties:
                gkw["pen"] = (self.lane_counts, self.lane_pmask,
                              jnp.asarray(self.lane_pres),
                              jnp.asarray(self.lane_freq),
                              jnp.asarray(self.lane_rep))
            all_toks, last, self.cache, pos, gstate, counts = self._decode_prog(use_ml)(
                self.params, self.lane_tok, self.cache,
                jnp.asarray(self.page_table), jnp.asarray(self.lane_pos),
                jnp.asarray(active), jnp.asarray(self.lane_temp), rng, **gkw,
                n_steps=self.decode_chunk,
            )
            if self._penalties:
                self.lane_counts = counts
            if self.guided_fsm is not None:
                self.lane_gstate = gstate
            toks_host = np.asarray(all_toks)
            new_pos = np.array(pos)
            self.lane_tok = last
            if self._pending_first:
                firsts = np.asarray(
                    jnp.stack([t for _, _, t in self._pending_first])
                )
                for (lane, req, _), first in zip(self._pending_first, firsts.tolist()):
                    req.generated.append(int(first))
                    if (
                        first in req.stop_token_ids
                        or len(req.generated) >= req.max_new_tokens
                    ):
                        self._finish(lane)
                self._pending_first = []
            for lane in range(self.B):
                if not active[lane]:
                    continue
                self.lane_pos[lane] = new_pos[lane]
                req = self.lane_req[lane]
                if req is None:
                    continue  # finished on its first (prefill) token
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
        out: List[Request] = []
        for _ in range(max_ticks):
            out.extend(self.step())
            if not self.queue and all(s is None for s in self.lane_state):
                break
        return out
