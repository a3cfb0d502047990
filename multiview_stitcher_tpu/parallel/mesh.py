"""Device mesh + sharding helpers.

TPU-native replacement for the reference's task parallelism (SURVEY.md §2.4):
the pairwise-registration batch (P1) and the fusion chunk batch (P2/P3) are
leading array axes sharded over a 1-D ``jax.sharding.Mesh``; XLA partitions
the batched kernels and inserts any collectives over ICI. The reference's
dask/ray/joblib executors collapse into these shardings plus the
``pairwise_executor`` / block-partition hooks for multi-host runs.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(n_devices: Optional[int] = None, axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading batch axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(arr: np.ndarray, multiple: int, axis: int = 0,
                    fill_value=0.0):
    """Pad a batch axis so it divides evenly across devices."""
    n = arr.shape[axis]
    rem = n % multiple
    if rem == 0:
        return arr, n
    pad = multiple - rem
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill_value), n


def shard_batch(arr, mesh: Mesh, axis_name: str = DATA_AXIS):
    """device_put a (padded) batch array with its leading axis sharded."""
    return jax.device_put(arr, batch_sharding(mesh, axis_name))
