"""Multi-host (DCN) support: jax.distributed init + per-host input dispatch.

SURVEY.md §5 "Distributed communication backend": the slot NCCL/MPI
occupies in a GPU design is `jax.distributed` + XLA collectives here.
Detection/cls/rec are activation-local, so across hosts the only
coordination needed is (a) a global mesh spanning every host's chips and
(b) splitting the INPUT stream so each host feeds its own shard — both
provided here.  Single-process environments degrade to no-ops, so every
code path is unit-testable without a second host
(tests/test_parallel.py).

Typical multi-host driver::

    from retto_tpu.parallel import distributed as dist

    dist.initialize()                  # env-driven (TPU pods auto-detect)
    mesh = dist.global_mesh()          # ('data', 'model') over ALL chips
    mine = dist.host_shard(files)      # this host's slice of the corpus
    session = RettoSession(cfg, mesh=mesh, ...)
    results = session.device_pipeline().run_many(mine)
"""

from __future__ import annotations

import logging
import os

import jax

from .mesh import make_mesh

logger = logging.getLogger("retto_tpu.parallel")

__all__ = [
    "initialize",
    "is_initialized",
    "process_index",
    "process_count",
    "host_shard",
    "global_mesh",
]

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed for multi-host execution.

    On TPU pods all three arguments auto-detect from the metadata server;
    elsewhere they come from the arguments or the standard env vars
    (JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID).  Returns
    True when a multi-process runtime was actually initialized; False for
    the single-process no-op (no coordinator configured)."""
    global _initialized
    if _initialized:
        return True
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np:
        num_processes = int(env_np)
    if process_id is None and env_pid:
        process_id = int(env_pid)
    if coordinator_address is None and num_processes is None:
        # single process (or TPU-pod auto-detect unavailable): no-op
        logger.info("distributed.initialize: single-process (no coordinator)")
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    logger.info(
        "distributed.initialize: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
    return True


def is_initialized() -> bool:
    return _initialized


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def host_shard(items, index: int | None = None, count: int | None = None):
    """This host's slice of a work list (per-host input dispatch).

    Strided split (items[index::count]) so early-exit or straggler hosts
    hold evenly-interleaved work; order within a host is preserved.  The
    caller reassembles globally by (host, position) if needed."""
    index = jax.process_index() if index is None else index
    count = jax.process_count() if count is None else count
    if not 0 <= index < count:
        raise ValueError(f"process index {index} not in [0, {count})")
    return list(items)[index::count]


def global_mesh(model_parallel: int = 1):
    """('data', 'model') mesh over EVERY device in the job (all hosts).

    With jax.distributed initialized, jax.devices() spans hosts and the
    'data' axis crosses the DCN boundary; inference stays activation-local
    so only result gathers ride DCN (SURVEY.md §2 parallelism plan)."""
    return make_mesh(None, model_parallel=model_parallel)
