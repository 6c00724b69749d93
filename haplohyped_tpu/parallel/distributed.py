"""Multi-host bring-up helpers.

Single-process multi-device sharding is fully tested in this repo; this
module adds the thin layer that extends the same code to multi-host slices:
``jax.distributed.initialize`` from environment/args, host-local shard
selection for the conversion plan, and a barrier.  All collectives in
:mod:`haplohyped_tpu.parallel` are host-count agnostic (they act on the
global mesh), so nothing else changes shape across 1 -> N hosts.

Typical multi-host conversion driver::

    from haplohyped_tpu.parallel import distributed, make_mesh
    from haplohyped_tpu.core.config import MeshConfig

    distributed.initialize()                       # no-op single-host
    mesh = make_mesh(MeshConfig(data=jax.device_count(), model=1))
    my_tasks = distributed.host_local_tasks(all_tasks)
    ... parse my_tasks locally, all_gather merges globally ...
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running multi-process.

    Reads the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) when args are omitted; a
    plain single-process run (no coordinator configured) is a no-op.
    Returns True if distributed mode was initialized.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coordinator_address:
        return False
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        process_id,
        num_processes,
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — (0, 1) single-host."""
    import jax

    return jax.process_index(), jax.process_count()


def host_local_tasks(tasks: list) -> list:
    """The strided slice of a global task list this host is responsible for
    (simple round-robin; :class:`~haplohyped_tpu.parallel.sharded_convert.
    ShardPlan` uses contiguous blocks instead so each block is one
    single-pass ``frame_v2`` group)."""
    idx, count = process_info()
    return tasks[idx::count]


def barrier(name: str = "hh_barrier") -> None:
    """Cross-host sync point (e.g. all hosts finished writing shards
    before the merge). No-op single-host."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def broadcast_from_host0(tree):
    """Replicate host-0 data to all hosts (e.g. the packed reference
    genome). Identity single-host."""
    import jax

    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)
