"""Multi-host coordination (SURVEY.md §2.4): DCN process init + host sharding.

Single-slice multi-chip needs nothing beyond the mesh in ``dp.py`` (XLA
collectives ride ICI). Across hosts, JAX needs ``jax.distributed.initialize``
over DCN before any device access; each host then feeds only its local shard
of the global batch. These helpers wrap that bootstrap; they are no-ops in
single-process runs so the same train script works everywhere.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize multi-host JAX if configured; silently no-op otherwise.

    Configuration comes from args or the standard env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``;
    on Cloud TPU pods ``jax.distributed.initialize()`` auto-detects).
    """
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    # TPU_WORKER_HOSTNAMES counts as pod configuration only when it names
    # MORE THAN ONE worker: single-chip plugins (the axon tunnel here) set
    # it to "localhost", and jax.distributed.initialize() without a real
    # coordinator just raises.
    workers = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if addr is None and len([w for w in workers.split(",") if w]) <= 1:
        return  # single process
    kwargs = {}
    if addr:
        kwargs["coordinator_address"] = addr
    if num_processes or os.environ.get("JAX_NUM_PROCESSES"):
        kwargs["num_processes"] = int(
            num_processes or os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None or os.environ.get("JAX_PROCESS_ID"):
        kwargs["process_id"] = int(
            process_id if process_id is not None
            else os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def host_shard() -> tuple[int, int]:
    """→ (shard_index, shard_count) for this host's data loader.

    Pass straight into ``data.records.single_stream``/``pair_stream`` so each
    host reads a disjoint slice of the dataset; the per-host batch is
    ``global_batch // process_count``.
    """
    return jax.process_index(), jax.process_count()


def local_batch_size(global_batch: int) -> int:
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{n} processes")
    return global_batch // n
