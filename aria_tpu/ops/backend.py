"""Backend selection for hot ops.

``kernel_backend()`` decides between Pallas TPU kernels and the pure-XLA
reference implementations. Tests run on a CPU mesh where the XLA paths are
used (Pallas kernels are additionally unit-tested in interpret mode).
Override with ``ARIA_TPU_KERNELS=pallas|xla`` (the analogue of the
reference's USE_GROUPED_GEMM kill switch, aria/model/moe_lm.py:434);
``ARIA_TPU_KERNELS=interpret`` selects the kernel paths but runs every
Pallas call in interpret mode — how CPU-mesh tests exercise the
kernels-under-shard_map serving paths without TPU hardware.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax


@lru_cache(maxsize=1)
def kernel_backend() -> str:
    forced = os.environ.get("ARIA_TPU_KERNELS", "auto")
    if forced in ("pallas", "xla", "interpret"):
        return forced
    return "pallas" if jax.default_backend() == "tpu" else "xla"


def use_pallas() -> bool:
    return kernel_backend() in ("pallas", "interpret")


def kernel_interpret() -> bool:
    """True when kernel call sites must pass interpret=True to pallas_call."""
    return kernel_backend() == "interpret"
