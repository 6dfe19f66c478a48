"""Multi-host scale-out helpers (DCN tier).

SURVEY.md §2.4's TPU-native equivalent of the reference's cluster batch
parallelism (SLURM fan-out of AF2 jobs, host process pools): for very large
benchmark sweeps the frame stream shards across hosts with
`jax.distributed`, ICI carries the per-pod collectives, and per-host result
shards gather over DCN. On a single host every helper degenerates to a
no-op, so the same pipeline code runs everywhere.
"""
from __future__ import annotations

import typing as t

import numpy as np


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """Initialize `jax.distributed` when multi-process env/flags are present.

    Returns (process_index, process_count). Safe to call on a single host
    (returns (0, 1) without touching the distributed runtime).
    """
    import jax

    if coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index(), jax.process_count()


def shard_work_for_host(items: t.Sequence, process_index: int | None = None,
                        process_count: int | None = None) -> list:
    """Static round-robin split of a work list (structures, pdb codes)
    across hosts — each host voxelizes/predicts its shard independently."""
    import jax

    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [x for i, x in enumerate(items) if i % pc == pi]


def gather_host_arrays(local: np.ndarray) -> np.ndarray:
    """All-gather per-host result arrays (e.g. probability shards) to every
    host over DCN, concatenated in process order. Single-process: identity.

    Handles RAGGED shards: `shard_work_for_host` hands hosts uneven work
    (e.g. 5 structures over 2 hosts), and a bare `process_allgather` of
    unequal-length arrays crashes gloo with a payload-size mismatch — so
    lengths gather first, shards pad to the max, and padding is sliced off
    after the collective.
    """
    import jax

    local = np.asarray(local)
    if jax.process_count() == 1:
        return local
    from jax.experimental import multihost_utils

    counts = np.asarray(
        multihost_utils.process_allgather(
            np.asarray([local.shape[0]]), tiled=True
        )
    ).ravel()
    m = int(counts.max())
    padded = np.zeros((m, *local.shape[1:]), local.dtype)
    padded[: local.shape[0]] = local
    g = np.asarray(multihost_utils.process_allgather(padded, tiled=False))
    return np.concatenate([g[i, : int(c)] for i, c in enumerate(counts)])


def barrier(name: str = "sync") -> None:
    """Cross-host barrier (no-op single-process)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
