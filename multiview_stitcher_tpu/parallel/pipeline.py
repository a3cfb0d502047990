"""Sharded register+fuse pipelines.

Multi-chip execution of the two hot batches (SURVEY.md §2.4 P1/P2):

- pairwise registration: overlap crops stacked into a fixed-shape
  ``(N_pairs, *crop)`` batch, sharded over the mesh's data axis; the batched
  FFT phase-correlation kernel partitions with no cross-device traffic (each
  pair is independent; results are all-gathered host-side for the global
  solve, which is tiny).
- fusion: the chunk batch of the fused resample+blend kernel sharded the same
  way; each device owns a disjoint set of output chunks (mirroring the
  reference's embarrassingly-parallel streaming fusion, fusion/_core.py:2044).
"""

from __future__ import annotations


import jax
import numpy as np

from multiview_stitcher_tpu.fusion._core import _fuse_chunk_batch_kernel
from multiview_stitcher_tpu.ops import phase_correlation as pc_ops
from multiview_stitcher_tpu.parallel import mesh as mesh_utils


def sharded_pairwise_shifts(
    fixed_batch,
    moving_batch,
    mesh,
    upsample_factor: int = 10,
    normalization: str = "phase",
):
    """Batched subpixel shifts with the pair axis sharded across the mesh.

    Inputs: (N, *crop) float arrays (pad N to a multiple of mesh size with
    :func:`..parallel.mesh.pad_to_multiple`). Returns (shifts (N, ndim),
    peaks (N,)).
    """
    sharding = mesh_utils.batch_sharding(mesh)

    # the batched kernel is module-level jitted; input shardings propagate
    # into its compilation (a per-call jax.jit wrapper here would retrace
    # and pay a remote compile-cache round trip on every invocation)
    return pc_ops.phase_cross_correlation_batch(
        jax.device_put(fixed_batch, sharding),
        jax.device_put(moving_batch, sharding),
        upsample_factor=upsample_factor,
        normalization=normalization,
    )


def sharded_fuse_chunks(
    slabs, mats, offs, wgrids, wmats, woffs, valid,
    out_shape: tuple,
    mesh,
    mode: str = "weighted_average",
    use_bw: bool = True,
):
    """Fused chunk kernel with the chunk axis sharded across the mesh."""
    sharding = mesh_utils.batch_sharding(mesh)
    args = [
        jax.device_put(np.asarray(a), sharding)
        for a in (slabs, mats, offs, wgrids, wmats, woffs, valid)
    ]
    # module-level jitted kernel; shardings propagate (see above)
    return _fuse_chunk_batch_kernel(*args, out_shape, mode, use_bw)


def register_and_fuse_step(
    fixed_batch,
    moving_batch,
    slabs, mats, offs, wgrids, wmats, woffs, valid,
    out_shape: tuple,
    upsample_factor: int = 2,
):
    """One combined step: batched pairwise shifts + batched chunk fusion.

    This is the full compute step of the stitching pipeline expressed as a
    single jittable function over sharded batches — used by the multi-chip
    dry run and as the template for production sharded execution.
    """
    shifts, peaks = pc_ops.phase_cross_correlation_batch(
        fixed_batch, moving_batch, upsample_factor=upsample_factor
    )
    fused = _fuse_chunk_batch_kernel(
        slabs, mats, offs, wgrids, wmats, woffs, valid,
        out_shape, "weighted_average", True,
    )
    return shifts, peaks, fused


def sharded_fuse_chunks_exact(
    slabs, mats, offs, extents, wgrids, wmats, woffs, valid,
    out_shape: tuple,
    mesh,
    win: tuple = None,
    wwin: tuple = None,
    tile: tuple = None,
    mode: str = "weighted_average",
    use_bw: bool = True,
    interpret: bool = False,
):
    """EXACT-affine fused chunk kernel (ops/exact_affine.py banded-hat
    matmuls) with the chunk axis sharded across the mesh — multi-chip
    rotated multiview fusion (BASELINE config 4 at scale). The chunk
    batch size must be a multiple of the mesh size (pad with
    ``valid=False`` rows).

    ``win``/``wwin`` default to the planned windows for the given maps;
    returns the (N, *out_shape) fused chunk batch."""
    from jax.sharding import PartitionSpec as P

    from multiview_stitcher_tpu.fusion._core import (
        _fuse_chunk_batch_kernel_exact,
    )
    from multiview_stitcher_tpu.ops import exact_affine as ea

    ndim = len(out_shape)
    mats = np.asarray(mats, np.float32)
    kind3d = "sepy"
    if ndim == 3 and not (
        ea.is_y_decoupled(mats.reshape(-1, 3, 3))
        and (
            not use_bw
            or ea.is_y_decoupled(
                np.asarray(wmats, np.float32).reshape(-1, 3, 3)
            )
        )
    ):
        # any coupling in the view maps OR the weight maps: the general
        # exact kernel (VERDICT r4 3-4) — the sepy kernel reads only the
        # 5 decoupled entries and would silently drop coupling terms
        kind3d = "general"
    if tile is None:
        tile = (
            (8, 128) if ndim == 2
            else (8, 32, 128) if kind3d == "sepy"
            else (8, 4, 32)
        )
    planner = (
        ea.plan_windows_2d if ndim == 2
        else ea.plan_windows_3d if kind3d == "sepy"
        else ea.plan_windows_3d_general
    )
    if win is None:
        win = planner(mats.reshape(-1, ndim, ndim), tile)
    if use_bw and wwin is None:
        wwin = planner(
            np.asarray(wmats, np.float32).reshape(-1, ndim, ndim), tile
        )
    if win is None or (use_bw and wwin is None):
        raise ValueError("maps need windows beyond the VMEM budget")

    axis = mesh.axis_names[0]

    def body(s_, m_, o_, e_, wg_, wm_, wo_, v_):
        return _fuse_chunk_batch_kernel_exact(
            s_, m_, o_, e_, wg_, wm_, wo_, v_,
            out_shape, win, wwin, tile, mode, use_bw,
            kind3d=kind3d, interpret=interpret,
        )

    import jax.numpy as jnp

    args = [
        jnp.asarray(a)
        for a in (slabs, mats, offs, extents, wgrids, wmats, woffs, valid)
    ]
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis),) * 8,
        out_specs=P(axis),
        check_vma=False,
    )(*args)
