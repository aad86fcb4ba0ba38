"""Multi-process (multi-host / multi-slice) wiring.

The reference's training envelope is multi-node via the accelerate/DeepSpeed
launcher (reference recipes/accelerate_configs/zero2.yaml —
machine_rank/num_machines; README.md:172-175). The JAX equivalent:

1. every process calls :func:`initialize` (jax.distributed) at startup,
2. ``jax.devices()`` becomes the GLOBAL device set, so the recipe mesh spans
   hosts — ``data`` (and, across slices, ``fsdp``) are the DCN-friendly axes,
3. each host feeds its own slice of the global batch via
   :func:`shard_host_batch` (``jax.make_array_from_process_local_data``), and
   XLA inserts the cross-host collectives.

Checkpointing / logging stay on process 0; the param tree must be replicated
over the process-spanning axes for host-side saves (true for pure DP).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_ENV_PREFIX = "ARIA_TPU_"


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Join the multi-process JAX runtime; returns this process's index.

    Arguments fall back to ``ARIA_TPU_COORDINATOR`` / ``ARIA_TPU_NUM_PROCESSES``
    / ``ARIA_TPU_PROCESS_ID`` env vars (the launcher-agnostic analogue of the
    reference's machine_rank/num_machines). A no-op when neither arguments nor
    env are present (single-process) or when already initialized.
    """
    coordinator = coordinator or os.environ.get(_ENV_PREFIX + "COORDINATOR")
    if num_processes is None and _ENV_PREFIX + "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ[_ENV_PREFIX + "NUM_PROCESSES"])
    if process_id is None and _ENV_PREFIX + "PROCESS_ID" in os.environ:
        process_id = int(os.environ[_ENV_PREFIX + "PROCESS_ID"])
    if coordinator is None:
        return 0  # single-process
    # must not probe the backend (jax.process_count() would initialize XLA
    # and make jax.distributed.initialize fail) — check the client directly
    from jax._src import distributed as _jdist

    if getattr(_jdist.global_state, "client", None) is not None:
        return jax.process_index()  # already initialized
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_index()


def is_main_process() -> bool:
    return jax.process_index() == 0


def local_batch_rows(rows, batch_size: int):
    """This process's contiguous slice of one global batch's rows.

    All processes iterate the SAME deterministic shuffle; the global batch is
    split evenly, so ``batch_size`` must divide by ``process_count``.
    """
    n = jax.process_count()
    if n == 1:
        return rows
    assert batch_size % n == 0, (
        f"global batch {batch_size} must divide over {n} processes"
    )
    per = batch_size // n
    i = jax.process_index()
    return rows[i * per:(i + 1) * per]


def shard_host_batch(batch: dict, mesh: Mesh) -> dict:
    """Per-host local numpy batch -> global jax.Arrays, batch axis over
    ``(data, fsdp)``.

    Every process must contribute the same array set with identical
    trailing shapes (pad to ``max_seq_length`` first; mixed text-only /
    multimodal global batches are not representable — the collator pads
    pixel tensors consistently within a batch).
    """
    if jax.process_count() == 1:
        return {k: jnp.asarray(v) for k, v in batch.items() if v is not None}
    out = {}
    for k, v in batch.items():
        if v is None:
            continue
        v = np.asarray(v)
        spec = P(("data", "fsdp"), *([None] * (v.ndim - 1)))
        out[k] = jax.make_array_from_process_local_data(NamedSharding(mesh, spec), v)
    return out
