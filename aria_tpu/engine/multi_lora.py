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
        # [A+1, L, ...] -> [L, A+1, ...]: layer axis leading for scan xs
        out[name] = {
            "a": jnp.asarray(np.stack(a_stack).swapaxes(0, 1)),
            "b": jnp.asarray(np.stack(b_stack).swapaxes(0, 1)),
        }
    return {"layers": out}


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
