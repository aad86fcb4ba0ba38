"""Multi-LoRA serving: many task adapters resident, selected per request.

The reference's ecosystem is task LoRAs (RefCOCO/NLVR2/NextQA/code adapters,
examples/*/config_lora.yaml) served one-at-a-time by merging into the base
(aria/inference.py:54-71). Here the vLLM-style upgrade: N adapters stay
resident UNMERGED as stacked factors, every request picks one (or none), and
mixed batches decode together — each adapter's rank-r delta costs ~1% of the
base matmul, so computing all A deltas and selecting per lane with a one-hot
keeps the decode step jit-static with no gather-induced layout churn.

Leaf layout: single-adapter factors are ``[L, ...]`` (layer-stacked, the
training format, train/lora.py); stacked multi-adapter factors are
``[L, A+1, ...]`` — the layer axis stays leading so the decoder scan's xs
slicing is unchanged, and adapter index 0 is all-zeros (= "no adapter", the
transparent default lane state).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def stack_adapters(
    adapters: Sequence[dict],
    scales: Optional[Sequence[float]] = None,
) -> dict:
    """Stack single-adapter trees ({"layers": {name: {"a","b"}}}, leaves
    ``[L, ...]``) into one multi-adapter tree (leaves ``[L, A+1, ...]``).

    Ranks may differ — factors are zero-padded to the max rank (a padded
    column in A meets a padded row in B, so the delta is unchanged). Target
    sets may differ — a missing target contributes zeros. Per-adapter scales
    (alpha/rank) are folded into the B factors so callers pass
    ``lora_scale=1.0``.
    """
    adapters = [a.get("layers", a) for a in adapters]
    if scales is None:
        scales = [1.0] * len(adapters)
    names = sorted({n for a in adapters for n in a})
    out: Dict[str, dict] = {}
    for name in names:
        have = [a.get(name) for a in adapters]
        ranks = [ab["a"].shape[-1] for ab in have if ab is not None]
        r = max(ranks)
        proto = next(ab for ab in have if ab is not None)
        a_shape = proto["a"].shape[:-1] + (r,)  # [L, ..., r]
        # b: [L, r, f] or [L, E, r, f] — rank sits before the last axis
        b_shape = proto["b"].shape[:-2] + (r, proto["b"].shape[-1])
        a_stack = [np.zeros(a_shape, np.float32)]
        b_stack = [np.zeros(b_shape, np.float32)]
        for ab, s in zip(have, scales):
            if ab is None:
                a_stack.append(np.zeros(a_shape, np.float32))
                b_stack.append(np.zeros(b_shape, np.float32))
                continue
            ra = ab["a"].shape[-1]
            a_pad = np.zeros(a_shape, np.float32)
            a_pad[..., :ra] = np.asarray(ab["a"], np.float32)
            b_pad = np.zeros(b_shape, np.float32)
            b_pad[..., :ra, :] = np.asarray(ab["b"], np.float32) * s
            a_stack.append(a_pad)
            b_stack.append(b_pad)
        # [A+1, L, ...] -> [L, A+1, ...]: layer axis leading for scan xs.
        # Stacked factors keep the CALLER's dtype (bf16 adapters at flagship
        # scale are ~450MB; force-f32 stacks doubled that and tipped the
        # full-int4 form over HBM).
        out[name] = {
            "a": jnp.asarray(np.stack(a_stack).swapaxes(0, 1),
                             dtype=proto["a"].dtype),
            "b": jnp.asarray(np.stack(b_stack).swapaxes(0, 1),
                             dtype=proto["b"].dtype),
        }
    return {"layers": out}


def fuse_shared_adapters(layers: dict, num_experts: int, num_shared: int,
                         moe_inter: int) -> dict:
    """Rewrite adapter factors from training format (per-expert ``w1``/``w2``
    + dense ``shared_w1``/``shared_w2``) into the FUSED-base serving format
    (``w1``/``w2`` stacks over ``num_experts + num_shared`` virtual experts).

    The exact adapter-side analogue of quant.fuse_shared_experts: the shared
    MLP's GLU splits elementwise over its intermediate axis, so its LoRA
    delta splits the same way — shared_w1's B columns partition into
    per-virtual-expert ``[r, 2I]`` blocks (gate/up halves separately) and
    shared_w2's A rows into ``[I, r]`` blocks, while the opposite factor is
    tiled unchanged. Virtual experts of an adapter without shared targets
    get zero factors (zero delta). Works on stacked ``[L, A, ...]`` and
    single-adapter ``[L, ...]`` trees alike.
    """
    E, ns, I = num_experts, num_shared, moe_inter
    out = dict(layers)
    sw1 = out.pop("shared_w1", None)
    sw2 = out.pop("shared_w2", None)
    # fused factors keep the input dtype (the host math runs in f32)
    _proto = next(
        (t for t in (out.get("w1"), out.get("w2"), sw1, sw2) if t is not None),
        None,
    )
    _dt = _proto["a"].dtype if _proto is not None else np.float32

    def _pad_rank(x, axis, r):
        have = x.shape[axis]
        if have == r:
            return x
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, r - have)
        return np.pad(x, pad)

    def _combine(expert, virt, a_rank_axis, b_rank_axis, eaxis):
        """Rank-align then concatenate expert + virtual stacks on the E axis."""
        r = max(expert["a"].shape[a_rank_axis], virt["a"].shape[a_rank_axis])
        a = np.concatenate([_pad_rank(expert["a"], a_rank_axis, r),
                            _pad_rank(virt["a"], a_rank_axis, r)], axis=eaxis)
        b = np.concatenate([_pad_rank(expert["b"], b_rank_axis, r),
                            _pad_rank(virt["b"], b_rank_axis, r)], axis=eaxis)
        return {"a": jnp.asarray(a, dtype=_dt), "b": jnp.asarray(b, dtype=_dt)}

    def _tile_virt(x, lead):
        """[lead..., ...rest] -> [lead..., ns, ...rest]."""
        x = np.expand_dims(x, len(lead))
        return np.broadcast_to(x, lead + (ns,) + x.shape[len(lead) + 1:]).copy()

    # ---- w1 group: routed w1 [lead, E, D, r1] + shared_w1 [lead, D, rs]/[lead, rs, 2Is]
    w1 = out.get("w1")
    if w1 is not None or sw1 is not None:
        if sw1 is not None:
            sa = np.asarray(sw1["a"], np.float32)      # [lead, D, rs]
            sb = np.asarray(sw1["b"], np.float32)      # [lead, rs, 2Is]
            lead = sa.shape[:-2]
            D, rs = sa.shape[-2], sa.shape[-1]
            Is = sb.shape[-1] // 2
            assert Is == ns * I, (Is, ns, I)
            va = _tile_virt(sa, lead)                  # [lead, ns, D, rs]
            gate = sb[..., :Is].reshape(lead + (rs, ns, I))
            up = sb[..., Is:].reshape(lead + (rs, ns, I))
            # [lead, rs, ns, I] -> [lead, ns, rs, I]; concat gate/up -> 2I
            perm = tuple(range(len(lead))) + (len(lead) + 1, len(lead),
                                              len(lead) + 2)
            vb = np.concatenate([gate.transpose(perm), up.transpose(perm)],
                                axis=-1)               # [lead, ns, rs, 2I]
        else:
            ea = np.asarray(w1["a"], np.float32)
            lead = ea.shape[:-3]
            D, r1 = ea.shape[-2], ea.shape[-1]
            va = np.zeros(lead + (ns, D, r1), np.float32)
            vb = np.zeros(lead + (ns, r1, 2 * I), np.float32)
        if w1 is not None:
            exp = {"a": np.asarray(w1["a"], np.float32),
                   "b": np.asarray(w1["b"], np.float32)}
        else:
            exp = {"a": np.zeros(lead + (E, va.shape[-2], va.shape[-1]), np.float32),
                   "b": np.zeros(lead + (E, vb.shape[-2], vb.shape[-1]), np.float32)}
        out["w1"] = _combine(exp, {"a": va, "b": vb},
                             a_rank_axis=-1, b_rank_axis=-2, eaxis=len(lead))

    # ---- w2 group: routed w2 [lead, E, I, r2] + shared_w2 [lead, Is, rs]/[lead, rs, D]
    w2 = out.get("w2")
    if w2 is not None or sw2 is not None:
        if sw2 is not None:
            sa = np.asarray(sw2["a"], np.float32)      # [lead, Is, rs]
            sb = np.asarray(sw2["b"], np.float32)      # [lead, rs, D]
            lead = sa.shape[:-2]
            Is, rs = sa.shape[-2], sa.shape[-1]
            assert Is == ns * I, (Is, ns, I)
            va = sa.reshape(lead + (ns, I, rs))
            vb = _tile_virt(sb, lead)                  # [lead, ns, rs, D]
        else:
            ea = np.asarray(w2["a"], np.float32)
            lead = ea.shape[:-3]
            r2, D_out = ea.shape[-1], np.asarray(w2["b"]).shape[-1]
            va = np.zeros(lead + (ns, I, r2), np.float32)
            vb = np.zeros(lead + (ns, r2, D_out), np.float32)
        if w2 is not None:
            exp = {"a": np.asarray(w2["a"], np.float32),
                   "b": np.asarray(w2["b"], np.float32)}
        else:
            exp = {"a": np.zeros(lead + (E, va.shape[-2], va.shape[-1]), np.float32),
                   "b": np.zeros(lead + (E, vb.shape[-2], vb.shape[-1]), np.float32)}
        out["w2"] = _combine(exp, {"a": va, "b": vb},
                             a_rank_axis=-1, b_rank_axis=-2, eaxis=len(lead))
    return out


def registry_for_params(reg: "AdapterRegistry", lm_layers: dict,
                        tc) -> "AdapterRegistry":
    """Return ``reg`` as-is for a training-format base, or a shallow copy
    with shared-adapter factors fused when the base expert stacks carry the
    shared experts as virtual experts (quant.fuse_shared_experts) — the
    engines call this at build so registries work against either base form."""
    w1 = lm_layers["w1"]
    if isinstance(w1, dict):
        e_stack = (w1["q4"] if "q4" in w1 else w1["q"]).shape[1]
    else:
        e_stack = w1.shape[1]
    if e_stack == tc.num_experts:
        return reg
    layers = reg.stacked["layers"]
    needs = ("shared_w1" in layers or "shared_w2" in layers
             or ("w1" in layers and layers["w1"]["a"].shape[2] != e_stack)
             or ("w2" in layers and layers["w2"]["a"].shape[2] != e_stack))
    if not needs:
        return reg
    import copy

    new = copy.copy(reg)
    new.stacked = {"layers": fuse_shared_adapters(
        layers, tc.num_experts, tc.num_shared_experts,
        tc.moe_intermediate_size)}
    return new


class AdapterRegistry:
    """Name -> index map over a stacked adapter tree (index 0 = base)."""

    def __init__(self, named_adapters: Dict[str, dict],
                 scales: Optional[Dict[str, float]] = None):
        self.names = list(named_adapters)
        self.index = {n: i + 1 for i, n in enumerate(self.names)}
        self.stacked = stack_adapters(
            [named_adapters[n] for n in self.names],
            [(scales or {}).get(n, 1.0) for n in self.names],
        )
        self.num_adapters = len(self.names) + 1  # incl. the zero adapter

    def lane_onehot(self, lane_ids) -> jnp.ndarray:
        """[A, B] selector from per-lane adapter indices (0 = base)."""
        ids = np.asarray(lane_ids, np.int32)
        hot = np.zeros((self.num_adapters, len(ids)), np.float32)
        hot[ids, np.arange(len(ids))] = 1.0
        return jnp.asarray(hot)

    def resolve(self, name: Optional[str]) -> int:
        if not name or name in ("base", "aria-tpu"):
            return 0
        if name not in self.index:
            raise KeyError(f"unknown adapter {name!r}; have {self.names}")
        return self.index[name]
