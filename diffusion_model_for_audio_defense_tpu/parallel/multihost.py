"""Multi-host (pod) initialization and data sharding.

TPU-native replacement for the reference's two rendezvous mechanisms
(SURVEY.md §2.8: mpi4py-assisted NCCL init in ``dist_util.py:16-52`` and the
static TCP init in ``distributed_util.py:50-60``): one
``jax.distributed.initialize()`` call bootstraps over DCN, after which the
single-controller mesh programs in this package work unchanged — ``psum``
rides ICI within a slice and DCN across slices, no rank-aware code needed.
"""

from __future__ import annotations

import jax


def setup_dist(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Initialize multi-host JAX (no-op on a single host).

    With TPU pod slices all arguments auto-detect from the environment;
    pass them explicitly for manual bootstraps.
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (ValueError, RuntimeError):
        # single-process run (no coordinator env) — the mesh code works as-is
        pass


def process_shard_kwargs() -> dict:
    """kwargs for ``data.DataLoader`` to shard a dataset across hosts
    (replaces ``torch.utils.data.distributed.DistributedSampler``)."""
    return {"process_index": jax.process_index(), "process_count": jax.process_count()}
