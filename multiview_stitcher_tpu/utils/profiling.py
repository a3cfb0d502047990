"""Profiling and per-stage timing hooks.

The reference has no built-in tracing (SURVEY.md §5 — users wrap calls in
dask ProgressBar); the TPU build adds first-class hooks: a stage timer
registry for the pipeline phases (graph build, pairwise batch, global solve,
fusion plan, fused kernels, IO) and a context manager around
``jax.profiler.trace`` for device-level traces viewable in TensorBoard /
Perfetto.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict

logger = logging.getLogger(__name__)

_STAGE_TIMES: Dict[str, float] = defaultdict(float)
_STAGE_COUNTS: Dict[str, int] = defaultdict(int)


@contextlib.contextmanager
def stage(name: str):
    """Accumulate wall time under a stage name.

    >>> with profiling.stage("pairwise_batch"):
    ...     run_pairwise(...)
    """
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _STAGE_TIMES[name] += dt
        _STAGE_COUNTS[name] += 1
        logger.debug("stage %s: %.3fs (total %.3fs)", name, dt, _STAGE_TIMES[name])


def get_stage_times() -> Dict[str, dict]:
    return {
        k: {"total_s": _STAGE_TIMES[k], "count": _STAGE_COUNTS[k]}
        for k in _STAGE_TIMES
    }


def reset_stage_times():
    _STAGE_TIMES.clear()
    _STAGE_COUNTS.clear()


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a device-level profiler trace (TensorBoard/Perfetto format)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def block_and_time(fn, *args, **kwargs):
    """Run a jitted fn, block until ready, return (result, seconds)."""
    import jax

    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0
