"""Paged KV cache: block-table memory for the continuous-batching server.

The vLLM half the round-1 server lacked (reference docs/inference.md:80-149):
lanes draw fixed-size pages from one shared pool instead of owning a
contiguous [S_max] stripe, so HBM scales with TOKENS IN FLIGHT, not
lanes x max_seq_len — a 64-token request next to a 1024-token one wastes one
page of slack, not a whole stripe.

Layout: ``[L, NP, H, PS, D]`` — every (layer, page, head) tile is a
contiguous [PS, D] run of HBM rows, exactly what the decode kernel DMAs.
The page table ``[B, MAXP]`` rides the kernel's scalar prefetch: the KV
BlockSpec index map reads ``table[b, p]``, so the pipeline streams each
lane's pages in logical order with zero gather copies. Unallocated entries
point at page 0; their scores are masked by the per-lane length like any
padding position.

Page allocation is host-side (engine/server.py): a free list, pages claimed
at admission and on decode growth, recycled when a request finishes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aria_tpu.config import TextConfig
from aria_tpu.ops.backend import kernel_interpret
from aria_tpu.ops.decode_attention import NEG_INF, _attend_block
from aria_tpu.ops.kv_write import _sublanes as _kvw_sublanes
from aria_tpu.ops.kv_write import kv_cache_write, kvw_enabled


class PagedKVCache(NamedTuple):
    k: Array  # [L, NP, H, PS, D]
    v: Array
    k_scale: Optional[Array] = None  # f32 [L, NP, H, PS] for int8 pages
    v_scale: Optional[Array] = None

    @staticmethod
    def init(cfg: TextConfig, num_pages: int, page_size: int, dtype=jnp.bfloat16) -> "PagedKVCache":
        shape = (cfg.num_layers, num_pages, cfg.num_kv_heads, page_size, cfg.head_dim)
        k = jnp.zeros(shape, dtype)
        v = jnp.zeros(shape, dtype)
        if dtype == jnp.int8:
            return PagedKVCache(k, v, jnp.ones(shape[:-1], jnp.float32),
                                jnp.ones(shape[:-1], jnp.float32))
        return PagedKVCache(k, v)

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def num_pages(self) -> int:
        return self.k.shape[1]


def paged_write(
    cache: PagedKVCache,
    layer_idx: Array,  # scalar int32
    page_table: Array,  # [B, MAXP] int32
    pos: Array,  # [B] int32 logical write position per lane
    k_t: Array,  # [B, H, S, D] new keys (S consecutive positions from pos)
    v_t: Array,
    k_sc: Optional[Array] = None,  # [B, H, S]
    v_sc: Optional[Array] = None,
    use_kernel: bool = False,
) -> PagedKVCache:
    """Scatter S new positions per lane into their pages.

    With ``use_kernel`` and S == 1 (the decode step), the K/V write runs
    through the Pallas block-write kernel (ops/kv_write.py) instead of the
    XLA per-(lane, head)-row scatter. Inactive lanes' zeroed tables resolve
    to the reserved null page 0 at their frozen (differing) positions; those
    writes are normalized to slot 0 so duplicate destinations are identical
    (row, slot) pairs, satisfying the kernel's lost-update precondition —
    page 0 is never read (scores are masked by the per-lane length)."""
    B, H, S, D = k_t.shape
    PS = cache.page_size
    logical = pos[:, None] + jnp.arange(S)[None, :]  # [B, S]
    page_of = jnp.take_along_axis(page_table, logical // PS, axis=1)  # [B, S]
    slot_of = logical % PS  # [B, S]

    pi = page_of[:, None, :]  # [B, 1, S]
    hi = jnp.arange(H)[None, :, None]
    si = slot_of[:, None, :]
    if (use_kernel and S == 1 and kvw_enabled()
            and PS % _kvw_sublanes(cache.k.dtype) == 0):
        rows = page_of[:, 0]
        slots = jnp.where(rows == 0, 0, slot_of[:, 0])
        new_k, new_v = kv_cache_write(
            cache.k, cache.v, layer_idx, rows, slots,
            k_t[:, :, 0], v_t[:, :, 0], interpret=kernel_interpret())
    else:
        new_k = cache.k.at[layer_idx, pi, hi, si].set(k_t)
        new_v = cache.v.at[layer_idx, pi, hi, si].set(v_t)
    new = PagedKVCache(
        new_k, new_v,
        *((
            cache.k_scale.at[layer_idx, pi, hi, si].set(k_sc),
            cache.v_scale.at[layer_idx, pi, hi, si].set(v_sc),
        ) if cache.quantized else (None, None)),
    )
    return new


def _kernel(pt_ref, l_ref, len_ref, q_ref, k_ref, v_ref, out_ref, m_ref, s_ref, acc_ref):
    b = pl.program_id(0)
    s = pl.program_id(1)
    n_s = pl.num_programs(1)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        s_ref[:] = jnp.zeros_like(s_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _attend_block(len_ref, q_ref, k_ref[0, 0], v_ref[0, 0], out_ref,
                  m_ref, s_ref, acc_ref, b, s, n_s)


def _kernel_q(pt_ref, l_ref, len_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref,
              out_ref, m_ref, s_ref, acc_ref):
    b = pl.program_id(0)
    s = pl.program_id(1)
    n_s = pl.num_programs(1)

    @pl.when(s == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        s_ref[:] = jnp.zeros_like(s_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    _attend_block(len_ref, q_ref, k_ref[0, 0], v_ref[0, 0], out_ref,
                  m_ref, s_ref, acc_ref, b, s, n_s,
                  k_sc=ks_ref[0, 0], v_sc=vs_ref[0, 0])


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention(
    q: Array,  # [B, H, D] (unscaled)
    cache: PagedKVCache,
    layer_idx: Array,  # scalar
    page_table: Array,  # [B, MAXP] int32
    lengths: Array,  # [B]
    *,
    interpret: bool = False,
) -> Array:
    """[B, H, D] attention over each lane's paged logical context."""
    B, H, D = q.shape
    L, NP, H_kv, PS, _ = cache.k.shape
    assert H_kv == H, "paged decode kernel is MHA-only (sdpa fallback for GQA)"
    MAXP = page_table.shape[1]
    quantized = cache.quantized

    scale = 1.0 / (D**0.5)
    q = (q.astype(jnp.float32) * scale).astype(jnp.bfloat16 if quantized else q.dtype)

    pt_flat = page_table.reshape(-1).astype(jnp.int32)  # prefetched

    def kv_map(b, s, pt, l, ln):
        return (l[0], pt[b * MAXP + s], 0, 0, 0)

    kv_spec = pl.BlockSpec((1, 1, H, PS, D), kv_map, memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((1, 1, H, PS), lambda b, s, pt, l, ln: (l[0], pt[b * MAXP + s], 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, H, D), lambda b, s, pt, l, ln: (b, 0, 0), memory_space=pltpu.VMEM),
        kv_spec, kv_spec,
    ]
    arrays = [q, cache.k, cache.v]
    kernel = _kernel
    if quantized:
        in_specs += [sc_spec, sc_spec]
        arrays += [cache.k_scale, cache.v_scale]
        kernel = _kernel_q

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, MAXP),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, H, D), lambda b, s, pt, l, ln: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, 128), jnp.float32),
            pltpu.VMEM((H, D), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, D), jnp.bfloat16 if quantized else q.dtype),
        interpret=interpret,
    )(pt_flat, jnp.atleast_1d(layer_idx).astype(jnp.int32), lengths.astype(jnp.int32),
      *arrays)
    return out


def gather_lane_kv(cache: PagedKVCache, layer_idx: Array, page_table: Array):
    """Materialize each lane's logical [B, H, MAXP*PS, D] k/v (dequantized).

    The XLA fallback / chunked-prefill read path: one gather per layer per
    chunk — fine at prefill rates, never used in the decode hot loop."""
    k_l = jax.lax.dynamic_index_in_dim(cache.k, layer_idx, 0, keepdims=False)
    v_l = jax.lax.dynamic_index_in_dim(cache.v, layer_idx, 0, keepdims=False)
    k = k_l[page_table]  # [B, MAXP, H, PS, D]
    v = v_l[page_table]
    if cache.quantized:
        ks = jax.lax.dynamic_index_in_dim(cache.k_scale, layer_idx, 0, keepdims=False)[page_table]
        vs = jax.lax.dynamic_index_in_dim(cache.v_scale, layer_idx, 0, keepdims=False)[page_table]
        k = k.astype(jnp.float32) * ks[..., None]
        v = v.astype(jnp.float32) * vs[..., None]
    B, MAXP, H, PS, D = k.shape
    k = k.transpose(0, 2, 1, 3, 4).reshape(B, H, MAXP * PS, D)
    v = v.transpose(0, 2, 1, 3, 4).reshape(B, H, MAXP * PS, D)
    return k, v


class PagePool:
    """Host-side page allocator: refcounted free list over the shared pool,
    plus a content-addressed prefix cache (vLLM "automatic prefix caching").

    Page 0 is reserved as the null page that unallocated table entries point
    at. A page whose refcount drops to zero returns to the free stack unless
    it was *registered* under a content key — then it parks in an LRU side
    pool, still holding its KV contents, and is resurrected by
    :meth:`lookup` when a later prompt shares the prefix. LRU pages are
    evicted transparently when a plain :meth:`alloc` would otherwise fail,
    so caching never reduces effective capacity.
    """

    def __init__(self, num_pages: int):
        self.free = list(range(num_pages - 1, 0, -1))  # stack; page 0 reserved
        self.refs: dict = {}  # page -> live reference count
        self.key_to_page: dict = {}  # content key -> page (registered)
        self.page_to_key: dict = {}  # inverse of the above
        from collections import OrderedDict

        self.lru: "OrderedDict[int, None]" = OrderedDict()  # ref==0 registered pages
        self.hits = 0  # pages served from the prefix cache

    def alloc(self, n: int) -> Optional[list]:
        while len(self.free) < n and self.lru:
            page, _ = self.lru.popitem(last=False)  # evict least-recent
            key = self.page_to_key.pop(page)
            del self.key_to_page[key]
            self.free.append(page)
        if len(self.free) < n:
            return None
        pages = [self.free.pop() for _ in range(n)]
        for p in pages:
            self.refs[p] = 1
        return pages

    def lookup(self, key) -> Optional[int]:
        """Take a reference on the cached page for ``key``, if present."""
        page = self.key_to_page.get(key)
        if page is None:
            return None
        self.refs[page] = self.refs.get(page, 0) + 1
        self.lru.pop(page, None)  # referenced again: not evictable
        self.hits += 1
        return page

    def register(self, key, page: int) -> None:
        """Publish a fully-written, immutable page under a content key.
        First writer wins; duplicates stay private and free normally."""
        if key in self.key_to_page or page in self.page_to_key:
            return
        self.key_to_page[key] = page
        self.page_to_key[page] = key

    def release(self, pages) -> None:
        for p in pages:
            if p == 0:
                continue
            self.refs[p] = self.refs.get(p, 1) - 1
            if self.refs[p] > 0:
                continue
            del self.refs[p]
            if p in self.page_to_key:
                self.lru[p] = None  # parked, contents retained
                self.lru.move_to_end(p)
            else:
                self.free.append(p)

    @property
    def available(self) -> int:
        """Pages allocatable right now (free + evictable cached)."""
        return len(self.free) + len(self.lru)
