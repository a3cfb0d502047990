"""Multi-host execution (SURVEY.md §2.4 P3/P7).

The reference scales past one machine by handing disjoint block subsets to
separate OS processes that attach to one shared zarr store
(/root/reference/src/multiview_stitcher/fusion/_core.py:2173-2185,
misc_utils.py:161-238). The TPU-native equivalent is a JAX multi-process
(multi-host) job: each host owns its local chips, `jax.distributed`
provides the control plane, and hosts fuse disjoint output-chunk subsets
into one shared store (zarr region writes are disjoint, so no cross-host
data plane is needed — collectives ride ICI/DCN only inside jitted
kernels that use a global mesh).

Single-process environments degrade gracefully: :func:`initialize` is a
no-op, :func:`process_info` reports (0, 1), and :func:`multihost_fuse`
fuses everything locally — so the same driver script runs unchanged from a
laptop to a pod slice.
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence

import jax

from multiview_stitcher_tpu.parallel.executors import (
    SourceSpec,
    fuse_block_subset,
    partition_blocks,
)

logger = logging.getLogger(__name__)

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    **kwargs,
) -> None:
    """Initialize `jax.distributed` if this is a multi-process job.

    Arguments default to the standard env vars JAX honors
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``,
    or cloud-TPU metadata autodetection when none are set). Safe to call
    unconditionally: a single-process run (no coordinator configured) and
    repeat calls are no-ops.
    """
    global _initialized
    if _initialized:
        return
    # NOTE: do NOT consult jax.process_count() here — it would initialize
    # the local XLA backend, after which jax.distributed.initialize()
    # raises. The multi-process decision must come from env/args alone.
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    if coordinator_address is None and num_processes is None:
        # single-process: nothing to set up
        _initialized = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d / %d",
        jax.process_index(),
        jax.process_count(),
    )


def process_info() -> tuple:
    """(process_index, process_count) of this host (0, 1 single-process)."""
    return jax.process_index(), jax.process_count()


def sync(name: str = "mvs_tpu_sync") -> None:
    """Barrier across hosts (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def partition_for_this_host(n_items: int) -> list:
    """Disjoint contiguous item-index subset owned by this host."""
    pid, n = process_info()
    return partition_blocks(n_items, n, pid)


def multihost_fuse(
    source_specs: Sequence[SourceSpec],
    output_zarr_url: str,
    transform_key: str,
    output_chunksize=None,
    **fuse_kwargs,
):
    """Fuse a dataset across all hosts of a multi-process JAX job.

    Host 0 creates the output store; all hosts barrier, then each fuses its
    disjoint output-chunk subset (chunk-aligned zarr region writes never
    collide). Returns after a final barrier so every host sees the complete
    store. Run the same script on every host (standard JAX SPMD style).
    """
    initialize()
    pid, n = process_info()
    if pid == 0:
        fuse_block_subset(
            source_specs,
            output_zarr_url,
            transform_key,
            worker_index=0,
            n_workers=n,
            output_chunksize=output_chunksize,
            create_output=True,
            create_only=True,
            **fuse_kwargs,
        )
    sync("mvs_tpu_fuse_created")
    fuse_block_subset(
        source_specs,
        output_zarr_url,
        transform_key,
        worker_index=pid,
        n_workers=n,
        output_chunksize=output_chunksize,
        create_output=False,
        **fuse_kwargs,
    )
    sync("mvs_tpu_fuse_done")
    return output_zarr_url
