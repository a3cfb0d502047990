"""Task transport between a session and stateless compute workers.

Rebuild of the reference's bridge seam (browser/bridge.py:52-80
``dispatch(tasks, session, batch_size, progress)``): a bridge moves JSON
task documents to workers and JSON results back. The reference's transport
is a sync-XHR/service-worker hop to Pyodide workers; here the transports
are in-process (:class:`LocalBridge`, the moral twin of the reference's
``LocalBridge`` used by its CPython tests) and an OS process pool
(:class:`ProcessPoolBridge`). Custom transports (RPC, job queues, JAX
multihost) subclass :class:`Bridge` and implement ``run_batch``.

Contract, shared by all transports:

- a task is one JSON-safe dict with a ``"task"`` field naming the handler
  in :class:`~multiview_stitcher_tpu.service.worker.WorkerRuntime`;
- the session spec travels inside the task; workers cache rebuilt sessions
  keyed by (spec, generation), so state is shipped once, not per task
  (reference worker.py:36 ``cache_size=2``);
- image data never crosses the bridge — workers reopen zarr sources.
"""

from __future__ import annotations

import json
from typing import Callable, List, Optional


class Bridge:
    """Transport for JSON task batches. Subclass and implement run_batch."""

    def run_batch(self, task_jsons: List[str]) -> List[str]:
        raise NotImplementedError

    def dispatch(
        self,
        tasks: List[dict],
        batch_size: int = 128,
        progress: Optional[Callable[[int, int], None]] = None,
    ) -> List[dict]:
        """Run tasks in batches; returns one result dict per task."""
        results: List[dict] = []
        n = len(tasks)
        for lo in range(0, n, batch_size):
            batch = tasks[lo : lo + batch_size]
            raw = self.run_batch([json.dumps(t) for t in batch])
            if len(raw) != len(batch):
                raise RuntimeError(
                    f"bridge returned {len(raw)} results for "
                    f"{len(batch)} tasks"
                )
            results.extend(json.loads(r) for r in raw)
            if progress is not None:
                progress(len(results), n)
        return results

    def close(self):
        pass


class LocalBridge(Bridge):
    """In-process transport through a private WorkerRuntime.

    Exercises the full serialize → rebuild-from-spec → deserialize path
    without extra processes, exactly like the reference's LocalBridge
    (browser/bridge.py:20-21) — the session object the caller holds is
    never touched by the worker side.
    """

    def __init__(self):
        from multiview_stitcher_tpu.service.worker import WorkerRuntime

        self._runtime = WorkerRuntime()

    def run_batch(self, task_jsons: List[str]) -> List[str]:
        return [self._runtime.run_task(t) for t in task_jsons]


def _pool_worker_init(platform: Optional[str]) -> None:
    if platform is not None:
        # must run before any backend use in the worker; jax.config (not
        # the env var) because plugin backends may ignore JAX_PLATFORMS
        import jax

        jax.config.update("jax_platforms", platform)


def _pool_worker_run(task_json: str) -> str:
    # one WorkerRuntime per worker process, created lazily and kept for
    # the pool's lifetime so its session cache persists across batches
    global _POOL_RUNTIME  # noqa: PLW0603
    try:
        runtime = _POOL_RUNTIME
    except NameError:
        from multiview_stitcher_tpu.service.worker import WorkerRuntime

        runtime = _POOL_RUNTIME = WorkerRuntime()
    return runtime.run_task(task_json)


class ProcessPoolBridge(Bridge):
    """OS-process worker pool transport.

    ``spawn`` start method: workers must not inherit the parent's JAX/XLA
    state (a forked XLA runtime deadlocks), mirroring how the reference's
    compute workers each boot their own Pyodide runtime.

    ``platform``: force each worker's JAX backend (e.g. ``"cpu"``); None
    leaves the worker's default backend resolution alone.
    """

    def __init__(self, n_workers: int = 2, platform: Optional[str] = None):
        import multiprocessing as mp
        from concurrent.futures import ProcessPoolExecutor

        self._pool = ProcessPoolExecutor(
            max_workers=n_workers,
            mp_context=mp.get_context("spawn"),
            initializer=_pool_worker_init,
            initargs=(platform,),
        )

    def run_batch(self, task_jsons: List[str]) -> List[str]:
        return list(self._pool.map(_pool_worker_run, task_jsons))

    def close(self):
        self._pool.shutdown(wait=True)
