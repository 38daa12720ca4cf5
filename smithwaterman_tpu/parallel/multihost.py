"""Multi-host initialization + sweep sharding helpers.

Single-host multi-chip scaling is handled by ``DataParallel`` (shard_map
over ICI).  Across hosts, ``initialize()`` wraps ``jax.distributed`` (DCN
rendezvous), after which ``jax.devices()`` spans the pod slice and the same
``DataParallel`` mesh covers every chip; host-level work division (e.g.
sweep chunks) uses ``process_index``/``process_count``.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    No-op when running single-process."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:  # NB: 0 is a valid id — do not use `or`
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()
