"""Small host-side utilities.

Covers the reference's ``misc_utils``
(/root/reference/src/multiview_stitcher/misc_utils.py): halo/shrinkage
decorators used by fusion/weights funcs, block batch iteration, and pluggable
batch executors. The cupy/dask-specific pieces are superseded by the JAX
backend; executors keep the same hook shape so alternative schedulers plug in
(SURVEY.md P6).
"""

from __future__ import annotations

import contextlib
import itertools
import logging
from typing import Callable, Iterable, List, Sequence

import numpy as np


def threshold_otsu(values: np.ndarray, nbins: int = 256) -> float:
    """Otsu threshold of a 1-D sample (replaces skimage.filters.threshold_otsu)."""
    values = np.asarray(values, dtype=float).ravel()
    values = values[np.isfinite(values)]
    if values.size == 0:
        return 0.0
    vmin, vmax = float(values.min()), float(values.max())
    if vmin == vmax:
        return vmin
    hist, bin_edges = np.histogram(values, bins=nbins, range=(vmin, vmax))
    hist = hist.astype(float)
    bin_centers = (bin_edges[:-1] + bin_edges[1:]) / 2

    weight1 = np.cumsum(hist)
    weight2 = np.cumsum(hist[::-1])[::-1]
    mean1 = np.cumsum(hist * bin_centers) / np.maximum(weight1, 1e-32)
    mean2 = (
        np.cumsum((hist * bin_centers)[::-1]) / np.maximum(weight2[::-1], 1e-32)
    )[::-1]

    variance12 = weight1[:-1] * weight2[1:] * (mean1[:-1] - mean2[1:]) ** 2
    idx = int(np.argmax(variance12))
    return float(bin_centers[idx])


# ---------------------------------------------------------------------------
# halo / shrinkage declaration decorators (reference misc_utils.py:69/:108)
# ---------------------------------------------------------------------------


def requires_overlap(overlap_spec):
    """Declare that a fusion/weights func needs chunk halo context.

    ``overlap_spec`` is a value or callable(kwargs)->value giving the required
    overlap (int or dict per dim); the fusion planner reads
    ``func.required_overlap``.
    """

    def deco(func):
        func.required_overlap = (
            overlap_spec if callable(overlap_spec) else (lambda kwargs: overlap_spec)
        )
        return func

    return deco


def requires_source_shrinkage(shrinkage_spec):
    """Declare that a func needs source bounding boxes shrunk inward."""

    def deco(func):
        func.required_source_shrinkage = (
            shrinkage_spec
            if callable(shrinkage_spec)
            else (lambda kwargs: shrinkage_spec)
        )
        return func

    return deco


def get_required_overlap(func, kwargs) -> object:
    spec = getattr(func, "required_overlap", None)
    return spec(kwargs) if spec is not None else 0


def get_required_source_shrinkage(func, kwargs) -> object:
    spec = getattr(func, "required_source_shrinkage", None)
    return spec(kwargs) if spec is not None else 0


def has_keyword(func, keyword: str) -> bool:
    """Signature introspection for behavioral dispatch (dask.utils.has_keyword)."""
    if func is None:
        return False
    import inspect

    try:
        sig = inspect.signature(func)
    except (TypeError, ValueError):
        return False
    # Like dask.utils.has_keyword: only named parameters count — a **kwargs
    # catch-all does NOT signal that a func wants a given input (the
    # signature-based dispatch relies on this).
    return keyword in sig.parameters


# ---------------------------------------------------------------------------
# block batch iteration + executors (reference misc_utils.py:152-238)
# ---------------------------------------------------------------------------


def ndindex_batches(nblocks: Sequence[int], batch_size: int) -> Iterable[List[tuple]]:
    """Yield batches of block indices over an n-D block grid."""
    it = itertools.product(*[range(n) for n in nblocks])
    while True:
        batch = list(itertools.islice(it, batch_size))
        if not batch:
            return
        yield batch


def process_batch_sequential(func: Callable, batch: Sequence) -> list:
    return [func(item) for item in batch]


def process_batch_using_threads(func: Callable, batch: Sequence, n_workers: int = 8) -> list:
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=n_workers) as ex:
        return list(ex.map(func, batch))


def process_batch_using_processes(func: Callable, batch: Sequence, n_workers: int = 4) -> list:
    from concurrent.futures import ProcessPoolExecutor

    with ProcessPoolExecutor(max_workers=n_workers) as ex:
        return list(ex.map(func, batch))


def supports_process_scheduler() -> bool:
    import multiprocessing

    try:
        multiprocessing.get_context("spawn")
        return True
    except ValueError:
        return False


def process_batch_using_joblib(func: Callable, batch: Sequence, n_workers: int = 4,
                               backend: str = "loky") -> list:
    """joblib batch executor (optional dependency; reference misc_utils.py:184)."""
    try:
        from joblib import Parallel, delayed
    except ImportError as e:
        raise ImportError("joblib is not installed") from e
    return Parallel(n_jobs=n_workers, backend=backend)(
        delayed(func)(item) for item in batch
    )


def process_batch_using_ray(func: Callable, batch: Sequence) -> list:
    """ray batch executor (optional dependency; reference misc_utils.py:161)."""
    try:
        import ray
    except ImportError as e:
        raise ImportError("ray is not installed") from e
    if not ray.is_initialized():
        ray.init(ignore_reinit_error=True)
    remote_func = ray.remote(func)
    return ray.get([remote_func.remote(item) for item in batch])


def process_batch_using_dask(func: Callable, batch: Sequence,
                             scheduler: str = "threads") -> list:
    """dask batch executor (optional dependency; reference
    misc_utils.py:215 runs blocks through dask.delayed)."""
    try:
        import dask
    except ImportError as e:
        raise ImportError("dask is not installed") from e
    tasks = [dask.delayed(func)(item) for item in batch]
    return list(dask.compute(*tasks, scheduler=scheduler))


@contextlib.contextmanager
def temporary_log_level(logger, level):
    """Temporarily set ``logger``'s level inside a with-block (reference
    misc_utils.py:45)."""
    old_level = logger.level
    logger.setLevel(level)
    try:
        yield logger
    finally:
        logger.setLevel(old_level)


class DisableLogger:
    """Context manager silencing all logging (reference misc_utils.py:8)."""

    def __enter__(self):
        logging.disable(logging.CRITICAL)

    def __exit__(self, exit_type, exit_value, exit_traceback):
        logging.disable(logging.NOTSET)


def clear_cupy_memory():
    """Reference misc_utils.py:16 releases CuPy memory pools; the JAX
    backend manages device memory itself, so this is a compatibility
    no-op."""
