"""Multi-host / multi-slice initialization (DCN story, SURVEY.md §5).

Single-controller JAX covers one host's chips; scaling the index past a
host (BASELINE config #5: 1M tracks over v5e-16) uses
``jax.distributed.initialize`` so every process sees the global device
set, then the same hash-range sharding (parallel/sharded_index.py) over a
mesh built from ``jax.devices()`` — intra-slice collectives ride ICI,
inter-slice segments ride DCN, and XLA routes them; there is no NCCL/MPI
analog to configure.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize multi-host JAX from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID).

    Returns True when distributed mode is active.  Safe no-op for
    single-host deployments (the common case).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not coordinator_address:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=(
            num_processes
            if num_processes is not None
            else int(os.environ.get("JAX_NUM_PROCESSES", "1"))
        ),
        process_id=(
            process_id
            if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "0"))
        ),
    )
    logger.info(
        "distributed JAX: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), len(jax.devices()),
    )
    return True
