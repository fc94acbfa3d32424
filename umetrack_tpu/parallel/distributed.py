"""Multi-host initialization and work sharding.

The reference's multi-node story was an unshipped internal launcher (its
Sampler references an undefined ``get_env``, async_dataset.py:603).  The
TPU-native story: ``jax.distributed.initialize`` joins all hosts into one
runtime with a single global mesh; host-local work (video decode, file IO)
shards by ``jax.process_index()``; on-device work shards over the mesh and
reduces via XLA collectives over ICI/DCN.
"""
from __future__ import annotations

import logging
from typing import Optional, Sequence, Tuple

import jax

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Tuple[int, int]:
    """Join the multi-host runtime (no-op for single-process runs).

    Returns (process_index, process_count).  On TPU pods the arguments are
    discovered from the environment; elsewhere pass them explicitly.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    idx, count = jax.process_index(), jax.process_count()
    logger.info(
        "process %d/%d, %d local / %d global devices",
        idx, count, jax.local_device_count(), jax.device_count(),
    )
    return idx, count


def shard_list_for_host(items: Sequence) -> list:
    """Round-robin shard of host-local work items (e.g. recording paths) for
    this process — the replacement for the reference's Pool-of-8 fan-out."""
    return list(items[jax.process_index():: jax.process_count()])
