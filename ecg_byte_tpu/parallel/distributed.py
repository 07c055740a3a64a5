"""Multi-host initialization.

The reference hard-codes single-node DDP (MASTER_ADDR=localhost,
main.py:57-60).  Multi-host TPU slices need one ``jax.distributed
.initialize()`` per host before any backend use; coordinates come from the
TPU environment (or explicit args).  Collectives then ride ICI within a
slice and DCN across slices via the same mesh/GSPMD machinery — no code
changes elsewhere.
"""

from __future__ import annotations

import os
from typing import Optional

_initialized = False


def maybe_initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed when running multi-host; no-op otherwise.

    Returns True when distributed mode is active.  Safe to call repeatedly.
    """
    global _initialized
    if _initialized:
        return True
    import jax

    explicit = coordinator_address is not None
    env_multi = any(
        os.environ.get(k)
        for k in ("JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if not explicit and not env_multi:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    print(
        f"jax.distributed initialized: process {jax.process_index()}/"
        f"{jax.process_count()}, {len(jax.devices())} global devices"
    )
    return True


def process_index() -> int:
    import jax

    return jax.process_index() if _initialized else 0


def is_primary() -> bool:
    """Rank-0 check for checkpoint/log gating (main.py:311-316 semantics)."""
    return process_index() == 0
