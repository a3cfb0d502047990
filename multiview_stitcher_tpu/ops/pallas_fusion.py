"""Pallas TPU kernels: fused multi-view translation resample + blend.

The fusion hot loop for translation tile layouts (the dominant stitching
case), written as a single-pass Pallas kernel: for each output tile, every
contributing view's window is DMA'd from HBM into VMEM, bilinearly sampled at
the (per-view scalar) fractional offset on the VPU, weighted by the analytic
cosine blending profile — evaluated in-register from the 5^ndim EDT-proxy
grid via hat-function expansion (fused multiply-adds; no gathers) — and
accumulated. Unlike the XLA path (which materializes (K, *chunk) resampled
views and weights in HBM), this kernel keeps a single output-tile accumulator
in VMEM: HBM traffic is one read per contributing input pixel + one write per
output pixel.

Views live in a single zero-padded ATLAS: the (V, *tile) stack is packed into
a dense grid (one XLA transpose+reshape at HBM bandwidth) padded only at the
atlas borders. Window DMAs that cross into a neighboring view read garbage
that the per-pixel extent-validity mask zeroes out — the analytic validity
coordinates are view-local while window starts are atlas coordinates (two
scalar offset tables). Compared to padding each view separately by a window
extent (which inflates small tiles 10-60x and put a 1024x64^3 problem at
128 GB), the atlas holds any layout at ~#views x tile bytes (f32).

Matches the NaN-outside-domain semantics of the reference pipeline
(/root/reference/src/multiview_stitcher/fusion/_core.py:1513).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _atlas_grid(V: int, tile: Tuple[int, ...], pads: Tuple[int, ...]):
    """Grid factorization (G0..Gn) minimizing padded atlas volume."""
    ndim = len(tile)
    if ndim == 2:
        best, best_vol = None, None
        for gy in range(1, V + 1):
            gx = -(-V // gy)
            vol = (gy * tile[0] + 2 * pads[0]) * (gx * tile[1] + 2 * pads[1])
            if best_vol is None or vol < best_vol:
                best, best_vol = (gy, gx), vol
        return best
    best, best_vol = None, None
    for gz in range(1, V + 1):
        rem = -(-V // gz)
        for gy in range(1, rem + 1):
            gx = -(-rem // gy)
            vol = (
                (gz * tile[0] + 2 * pads[0])
                * (gy * tile[1] + 2 * pads[1])
                * (gx * tile[2] + 2 * pads[2])
            )
            if best_vol is None or vol < best_vol:
                best, best_vol = (gz, gy, gx), vol
    return best


def _build_atlas(tiles_f32, grid, pads):
    """Pack (V, *tile) into one zero-padded atlas via transpose+reshape."""
    V = tiles_f32.shape[0]
    tile = tiles_f32.shape[1:]
    ndim = len(tile)
    total = int(np.prod(grid))
    if total > V:
        tiles_f32 = jnp.concatenate(
            [tiles_f32, jnp.zeros((total - V,) + tile, tiles_f32.dtype)]
        )
    stacked = tiles_f32.reshape(tuple(grid) + tile)
    if ndim == 2:
        atlas = stacked.transpose(0, 2, 1, 3).reshape(
            grid[0] * tile[0], grid[1] * tile[1]
        )
    else:
        atlas = stacked.transpose(0, 3, 1, 4, 2, 5).reshape(
            grid[0] * tile[0], grid[1] * tile[1], grid[2] * tile[2]
        )
    return jnp.pad(atlas, tuple((p, p) for p in pads))


def _atlas_origins(V, grid, tile, pads):
    """(V, ndim) float32 origin of each view inside the padded atlas."""
    idx = np.stack(
        np.unravel_index(np.arange(V), grid), axis=1
    ).astype(np.float32)
    return idx * np.asarray(tile, np.float32) + np.asarray(pads, np.float32)


# ---------------------------------------------------------------------------
# 2D kernel
# ---------------------------------------------------------------------------


def _fuse_tile_kernel(
    # scalar prefetch
    view_idx_ref,   # (n_ty, n_tx, K) int32 — per-tile view slots (-1 empty)
    origin_ref,     # (2,) int32 — output-pixel origin of this call's grid
    offs_ref,       # (2, V) f32 — output pixel -> view-local tile pixel
    aoffs_ref,      # (2, V) f32 — output pixel -> padded-atlas pixel
    extents_ref,    # (2, V) f32 — valid tile extents (pixels) per view
    wdiags_ref,     # (2, V) f32 — output pixel -> weight-grid pixel diag
    woffs_ref,      # (2, V) f32 — ... offset
    scales_ref,     # (2, V) f32 — per-view out-pixel -> view-pixel scale
    #                 (read only when PER_VIEW; mixed-resolution mosaics)
    # tensor inputs
    atlas_ref,      # (HA, WA) f32 in ANY/HBM — zero-padded packed views
    wgrids_ref,     # (V, 8, 128) f32 in ANY/HBM (5x5 grids padded)
    # output
    out_ref,        # (TY, TX) f32
    # scratch
    win_ref,        # (HW, WW) f32 VMEM window
    wg_ref,         # (8, 128) f32 VMEM weight grid
    sem,            # DMA semaphore
    wsem,           # DMA semaphore (weight grid)
    *,
    K: int,
    TY: int,
    TX: int,
    SY_SC: float = 1.0,   # output-pixel -> view-pixel scale (y)
    SX_SC: float = 1.0,   # ... (x); uniform across views, static
    PER_VIEW: bool = False,  # read per-view scales from scales_ref; the
    #                       static SY_SC/SX_SC then bound the window sizes
    HW: int = None,       # VMEM window rows (ceil(SY_SC*TY) + margin)
    WW: int = None,       # VMEM window cols
):
    if HW is None:
        HW = TY + 16
    if WW is None:
        WW = TX + 256
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    # integer origin shift keeps banded/streaming calls bitwise identical
    # to a monolithic call over the full output grid
    oy0 = ty * TY + origin_ref[0]
    ox0 = tx * TX + origin_ref[1]

    row_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (TY, TX), 0) + oy0
    ).astype(jnp.float32)
    col_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (TY, TX), 1) + ox0
    ).astype(jnp.float32)

    acc = jnp.zeros((TY, TX), dtype=jnp.float32)
    wsum = jnp.zeros((TY, TX), dtype=jnp.float32)
    # unweighted fallback accumulators: where the cosine taper hits exactly
    # 0 for every valid view (support border), fuse the plain valid average
    vacc = jnp.zeros((TY, TX), dtype=jnp.float32)
    vcnt = jnp.zeros((TY, TX), dtype=jnp.float32)

    for k in range(K):
        slot = view_idx_ref[ty, tx, k]
        slot_valid = slot >= 0
        vi = jnp.maximum(slot, 0)
        off_y = offs_ref[0, vi]
        off_x = offs_ref[1, vi]
        if PER_VIEW:
            sc_y = scales_ref[0, vi]
            sc_x = scales_ref[1, vi]
        else:
            sc_y = jnp.float32(SY_SC)
            sc_x = jnp.float32(SX_SC)

        # atlas-pixel coordinates of this output tile's origin
        cy0 = aoffs_ref[0, vi] + sc_y * jnp.float32(oy0)
        cx0 = aoffs_ref[1, vi] + sc_x * jnp.float32(ox0)
        iy0 = jnp.floor(cy0)
        ix0 = jnp.floor(cx0)
        fy = cy0 - iy0
        fx = cx0 - ix0
        # DMA starts must be aligned to the (8, 128) tiling, so copy from the
        # aligned floor and shift the residual inside VMEM
        wy = iy0.astype(jnp.int32)
        wx = ix0.astype(jnp.int32)
        hp = atlas_ref.shape[0]
        wp = atlas_ref.shape[1]
        wy = jnp.clip(wy, 0, hp - HW)
        wx = jnp.clip(wx, 0, wp - WW)
        wy_al = pl.multiple_of((wy // 8) * 8, 8)
        wx_al = pl.multiple_of((wx // 128) * 128, 128)
        ry = wy - wy_al
        rx = wx - wx_al

        copy = pltpu.make_async_copy(
            atlas_ref.at[pl.ds(wy_al, HW), pl.ds(wx_al, WW)],
            win_ref,
            sem,
        )
        wcopy = pltpu.make_async_copy(wgrids_ref.at[vi], wg_ref, wsem)
        copy.start()
        wcopy.start()
        copy.wait()
        wcopy.wait()

        # residual integer shift + scale + bilinear fraction folded into
        # 2-banded lerp matrices, applied as MXU matmuls (dynamic VMEM
        # offsets are not supported; matmul shifts are). Output row i maps
        # to window row SY_SC*i + sy; the band position varies per row for
        # non-unit scale.
        sy = ry.astype(jnp.float32) + fy
        sx = rx.astype(jnp.float32) + fx
        row_i = jax.lax.broadcasted_iota(jnp.int32, (TY, HW), 0)
        row_j = jax.lax.broadcasted_iota(jnp.int32, (TY, HW), 1)
        ty_pos = sc_y * row_i.astype(jnp.float32) + sy
        ty_i = jnp.floor(ty_pos).astype(jnp.int32)
        ty_f = ty_pos - jnp.floor(ty_pos)
        Sy = jnp.where(
            row_j == ty_i, 1.0 - ty_f, 0.0
        ) + jnp.where(row_j == ty_i + 1, ty_f, 0.0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (WW, TX), 0)
        col_j = jax.lax.broadcasted_iota(jnp.int32, (WW, TX), 1)
        tx_pos = sc_x * col_j.astype(jnp.float32) + sx
        tx_i = jnp.floor(tx_pos).astype(jnp.int32)
        tx_f = tx_pos - jnp.floor(tx_pos)
        SxT = jnp.where(
            col_i == tx_i, 1.0 - tx_f, 0.0
        ) + jnp.where(col_i == tx_i + 1, tx_f, 0.0)
        # HIGHEST keeps the shift matmuls in true f32 on the MXU — the
        # default TPU precision rounds the tile VALUES through bf16
        # (observed ~2-count error at 900-count scale on v5e)
        val = jnp.dot(
            jnp.dot(
                Sy,
                win_ref[:, :],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            ),
            SxT,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        # validity: true view-local coordinates within [0, extent-1]
        cy = sc_y * row_ids + off_y
        cx = sc_x * col_ids + off_x
        valid = (
            (cy >= 0)
            & (cy <= extents_ref[0, vi] - 1)
            & (cx >= 0)
            & (cx <= extents_ref[1, vi] - 1)
            & slot_valid
        )

        # blending weight: bilinear sample of the 5x5 grid via hat expansion
        gy = wdiags_ref[0, vi] * row_ids + woffs_ref[0, vi]
        gx = wdiags_ref[1, vi] * col_ids + woffs_ref[1, vi]
        w = jnp.zeros((TY, TX), dtype=jnp.float32)
        for gi in range(5):
            hat_y = jnp.maximum(0.0, 1.0 - jnp.abs(gy - gi))
            for gj in range(5):
                hat_x = jnp.maximum(0.0, 1.0 - jnp.abs(gx - gj))
                w = w + wg_ref[gi, gj] * hat_y * hat_x
        # cosine taper of values < 1 (reference weights.py:502-509)
        w = jnp.where(w < 1.0, (jnp.cos((1.0 - w) * np.pi) + 1.0) / 2.0, w)
        w = jnp.clip(w, 0.0, 1.0)
        w = jnp.where(valid, w, 0.0)

        acc = acc + w * jnp.where(valid, val, 0.0)
        wsum = wsum + w
        vacc = vacc + jnp.where(valid, val, 0.0)
        vcnt = vcnt + valid.astype(jnp.float32)

    fallback = vacc / jnp.maximum(vcnt, 1.0)
    out_ref[:, :] = jnp.where(
        wsum > 0.0, acc / jnp.maximum(wsum, 1e-12), fallback
    )


@partial(
    jax.jit,
    static_argnames=(
        "out_shape", "tile_shape", "K", "interpret", "out_dtype", "scale"
    ),
)
def fuse_translation_2d(
    tiles,          # (V, H, W) any dtype — packed + cast to f32 on device
    view_idx,       # (n_ty, n_tx, K) int32, -1 for empty slots
    offs,           # (V, 2) f32
    extents,        # (V, 2) f32 — true tile extents
    wdiags,         # (V, 2) f32
    woffs,          # (V, 2) f32
    wgrids,         # (V, 5, 5) f32
    out_shape: Tuple[int, int],
    tile_shape: Tuple[int, int] = (256, 256),
    K: int = 4,
    interpret: bool = False,
    out_dtype=jnp.float32,
    origin=None,    # (2,) int32 — output-pixel origin (banded calls)
    scale: Tuple[float, float] = (1.0, 1.0),  # out-pixel -> view-pixel
    scales=None,    # (V, 2) f32 per-view scales (mixed-resolution mosaics);
    #                 ``scale`` must then be the per-dim MAX (window sizing)
):
    """Fuse a full 2D output from translation-placed tiles (weighted average
    with cosine blending), single pass in VMEM with per-tile view lists.

    Tiles are packed into a zero-padded atlas ON DEVICE (XLA transpose at
    HBM bandwidth) so the host->device transfer carries only the raw tile
    bytes and device memory stays ~V x tile bytes regardless of tile size.

    ``scale`` supports a uniform (per-dim static) non-unit output-pixel ->
    view-pixel map — e.g. fusing at a coarser output spacing (reference
    fuses any output grid through its general resample path,
    transformation.py:15); the VMEM window grows by ~scale. ``scales``
    switches to per-view scales read from SMEM (the reference's
    transform_sim handles per-view spacing transparently).
    """
    TY, TX = tile_shape
    OY, OX = out_shape
    n_ty = -(-OY // TY)
    n_tx = -(-OX // TX)
    HW = int(-(-(int(np.ceil(scale[0] * TY)) + 16) // 8) * 8)
    WW = int(-(-(int(np.ceil(scale[1] * TX)) + 256) // 128) * 128)
    PADY, PADX = HW, WW
    V = tiles.shape[0]
    tile = tuple(tiles.shape[1:])
    grid = _atlas_grid(V, tile, (PADY, PADX))
    atlas = _build_atlas(tiles.astype(jnp.float32), grid, (PADY, PADX))
    # per-view scalar tables ride SMEM transposed to (ndim, V): SMEM pads
    # the minor dim to 128 lanes, so (V, 2) tables would waste 40x and cap
    # V at ~hundreds (scoped-SMEM OOM on 1000-tile mosaics)
    aoffs = (
        jnp.asarray(offs, jnp.float32)
        + jnp.asarray(_atlas_origins(V, grid, tile, (PADY, PADX)))
    ).T

    # pad the weight grids into a DMA-friendly (V, 8, 128) layout
    wgrids_padded = jnp.zeros((V, 8, 128), dtype=jnp.float32)
    wgrids_padded = wgrids_padded.at[:, :5, :5].set(
        wgrids.astype(jnp.float32)
    )

    if origin is None:
        origin = jnp.zeros((2,), jnp.int32)
    per_view = scales is not None
    scales_t = (
        jnp.asarray(scales, dtype=jnp.float32).T
        if per_view
        else jnp.zeros((2, V), jnp.float32)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # atlas stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),        # weight grids in HBM
        ],
        out_specs=pl.BlockSpec(
            (TY, TX), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((HW, WW), jnp.float32),
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    out = pl.pallas_call(
        partial(
            _fuse_tile_kernel, K=K, TY=TY, TX=TX,
            SY_SC=float(scale[0]), SX_SC=float(scale[1]),
            PER_VIEW=per_view, HW=HW, WW=WW,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_ty * TY, n_tx * TX), jnp.float32),
        # headroom for the f32-exact (HIGHEST) shift matmuls (see 3D call)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        jnp.asarray(view_idx, dtype=jnp.int32),
        jnp.asarray(origin, dtype=jnp.int32),
        jnp.asarray(offs, dtype=jnp.float32).T,
        aoffs,
        jnp.asarray(extents, dtype=jnp.float32).T,
        jnp.asarray(wdiags, dtype=jnp.float32).T,
        jnp.asarray(woffs, dtype=jnp.float32).T,
        scales_t,
        atlas,
        wgrids_padded,
    )
    # cast on device: halves (or better) the host-link bytes for uint16
    return jnp.nan_to_num(out[:OY, :OX]).astype(out_dtype)


# ---------------------------------------------------------------------------
# 3D kernel
# ---------------------------------------------------------------------------


def _fuse_tile_kernel_3d(
    # scalar prefetch
    view_idx_ref,   # (n_tz, n_ty, n_tx, K) int32, -1 empty
    origin_ref,     # (3,) int32 — output-pixel origin of this call's grid
    offs_ref,       # (3, V) f32 — output pixel -> view-local tile pixel
    aoffs_ref,      # (3, V) f32 — output pixel -> padded-atlas pixel
    extents_ref,    # (3, V) f32
    wdiags_ref,     # (3, V) f32
    woffs_ref,      # (3, V) f32
    scales_ref,     # (3, V) f32 — per-view out-pixel -> view-pixel scale
    #                 (read only when PER_VIEW; mixed-resolution mosaics)
    # tensor inputs
    atlas_ref,      # (DA, HA, WA) f32 in ANY/HBM — zero-padded packed views
    wgrids_ref,     # (V, 5, 8, 128) f32 in ANY/HBM (5x5x5 grids padded)
    # output
    out_ref,        # (TZ, TY, TX) f32
    # scratch
    win_ref,        # (DW, HW, WW) f32
    wg_ref,         # (5, 8, 128) f32
    sem,
    wsem,
    *,
    K: int,
    TZ: int,
    TY: int,
    TX: int,
    SZ_SC: int = 1,       # output-pixel -> view-pixel z scale (INTEGER:
    #                       keeps the z lerp a static strided slice)
    SY_SC: float = 1.0,
    SX_SC: float = 1.0,
    PER_VIEW: bool = False,  # per-view scales from scales_ref; the z lerp
    #                       becomes a banded matmul (any float z scale) and
    #                       the static scales bound the window sizes
    DW: int = None,       # VMEM window depth (SZ_SC*TZ + 1)
    HW: int = None,
    WW: int = None,
):
    if DW is None:
        DW = TZ + 1
    if HW is None:
        HW = TY + 16
    if WW is None:
        WW = TX + 256
    tz = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    # integer origin shift keeps banded/streaming calls bitwise identical
    # to a monolithic call over the full output grid
    oz0 = tz * TZ + origin_ref[0]
    oy0 = ty * TY + origin_ref[1]
    ox0 = tx * TX + origin_ref[2]

    # broadcast index vectors (2D iota then squeeze patterns are TPU-safe)
    z_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (TZ, 1, 1), 0) + oz0
    ).astype(jnp.float32)
    y_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (1, TY, 1), 1) + oy0
    ).astype(jnp.float32)
    x_ids = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, TX), 2) + ox0
    ).astype(jnp.float32)

    acc = jnp.zeros((TZ, TY, TX), dtype=jnp.float32)
    wsum = jnp.zeros((TZ, TY, TX), dtype=jnp.float32)
    # unweighted fallback accumulators (see 2D kernel)
    vacc = jnp.zeros((TZ, TY, TX), dtype=jnp.float32)
    vcnt = jnp.zeros((TZ, TY, TX), dtype=jnp.float32)

    for k in range(K):
        slot = view_idx_ref[tz, ty, tx, k]
        slot_valid = slot >= 0
        vi = jnp.maximum(slot, 0)
        off = [offs_ref[d, vi] for d in range(3)]
        if PER_VIEW:
            sc_z = scales_ref[0, vi]
            sc_y = scales_ref[1, vi]
            sc_x = scales_ref[2, vi]
        else:
            sc_z = jnp.float32(SZ_SC)
            sc_y = jnp.float32(SY_SC)
            sc_x = jnp.float32(SX_SC)

        cz0 = aoffs_ref[0, vi] + sc_z * jnp.float32(oz0)
        cy0 = aoffs_ref[1, vi] + sc_y * jnp.float32(oy0)
        cx0 = aoffs_ref[2, vi] + sc_x * jnp.float32(ox0)
        iz0 = jnp.floor(cz0)
        iy0 = jnp.floor(cy0)
        ix0 = jnp.floor(cx0)
        fz = cz0 - iz0
        fy = cy0 - iy0
        fx = cx0 - ix0

        wz = iz0.astype(jnp.int32)
        wy = iy0.astype(jnp.int32)
        wx = ix0.astype(jnp.int32)
        dp = atlas_ref.shape[0]
        hp = atlas_ref.shape[1]
        wp = atlas_ref.shape[2]
        wz = jnp.clip(wz, 0, dp - DW)
        wy = jnp.clip(wy, 0, hp - HW)
        wx = jnp.clip(wx, 0, wp - WW)
        # z is an untiled dim: arbitrary start; y/x must be tiling-aligned
        wy_al = pl.multiple_of((wy // 8) * 8, 8)
        wx_al = pl.multiple_of((wx // 128) * 128, 128)
        ry = wy - wy_al
        rx = wx - wx_al

        copy = pltpu.make_async_copy(
            atlas_ref.at[
                pl.ds(wz, DW),
                pl.ds(wy_al, HW),
                pl.ds(wx_al, WW),
            ],
            win_ref,
            sem,
        )
        wcopy = pltpu.make_async_copy(wgrids_ref.at[vi], wg_ref, wsem)
        copy.start()
        wcopy.start()
        copy.wait()
        wcopy.wait()

        if PER_VIEW:
            # arbitrary float z scale: the z lerp is a banded (TZ, DW)
            # matmul (band position varies per output plane), batched over
            # the window's (HW, WW) minor dims on the MXU
            sz = fz + (iz0 - wz.astype(jnp.float32))
            zrow_i = jax.lax.broadcasted_iota(jnp.int32, (TZ, DW), 0)
            zrow_j = jax.lax.broadcasted_iota(jnp.int32, (TZ, DW), 1)
            tz_pos = sc_z * zrow_i.astype(jnp.float32) + sz
            tz_i = jnp.floor(tz_pos).astype(jnp.int32)
            tz_f = tz_pos - jnp.floor(tz_pos)
            Sz = jnp.where(
                zrow_j == tz_i, 1.0 - tz_f, 0.0
            ) + jnp.where(zrow_j == tz_i + 1, tz_f, 0.0)
            wlerp = jax.lax.dot_general(
                Sz, win_ref[:, :, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )  # (TZ, HW, WW)
        else:
            # z lerp: window starts exactly at floor(cz0); the integer z
            # scale keeps the per-output-plane fraction constant, so the
            # lerp stays a pair of static (strided) slices
            wlerp = (
                (1.0 - fz) * win_ref[0 : SZ_SC * TZ : SZ_SC, :, :]
                + fz * win_ref[1 : SZ_SC * TZ + 1 : SZ_SC, :, :]
            )

        # y/x residual shift + scale + fraction as banded matmuls (batched
        # over z); band position varies per row for non-unit scale
        sy = ry.astype(jnp.float32) + fy
        sx = rx.astype(jnp.float32) + fx
        row_i = jax.lax.broadcasted_iota(jnp.int32, (TY, HW), 0)
        row_j = jax.lax.broadcasted_iota(jnp.int32, (TY, HW), 1)
        ty_pos = sc_y * row_i.astype(jnp.float32) + sy
        ty_i = jnp.floor(ty_pos).astype(jnp.int32)
        ty_f = ty_pos - jnp.floor(ty_pos)
        Sy = jnp.where(
            row_j == ty_i, 1.0 - ty_f, 0.0
        ) + jnp.where(row_j == ty_i + 1, ty_f, 0.0)
        col_i = jax.lax.broadcasted_iota(jnp.int32, (WW, TX), 0)
        col_j = jax.lax.broadcasted_iota(jnp.int32, (WW, TX), 1)
        tx_pos = sc_x * col_j.astype(jnp.float32) + sx
        tx_i = jnp.floor(tx_pos).astype(jnp.int32)
        tx_f = tx_pos - jnp.floor(tx_pos)
        SxT = jnp.where(
            col_i == tx_i, 1.0 - tx_f, 0.0
        ) + jnp.where(col_i == tx_i + 1, tx_f, 0.0)

        # (TZ, HW, WW) x (TY, HW) -> (TZ, WW, TY)
        # HIGHEST: default TPU matmul precision would round the tile
        # values through bf16 (see 2D kernel note)
        val = jax.lax.dot_general(
            wlerp, Sy,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (TZ, WW, TY)
        val = jax.lax.dot_general(
            val, SxT,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (TZ, TY, TX)

        # validity from true view-local coordinates
        cz = sc_z * z_ids + off[0]
        cy = sc_y * y_ids + off[1]
        cx = sc_x * x_ids + off[2]
        valid = (
            (cz >= 0) & (cz <= extents_ref[0, vi] - 1)
            & (cy >= 0) & (cy <= extents_ref[1, vi] - 1)
            & (cx >= 0) & (cx <= extents_ref[2, vi] - 1)
            & slot_valid
        )

        # separable hat expansion of the 5^3 blending grid:
        # w[z,y,x] = sum_ijk g[i,j,k] hat_z(i)[z] hat_y(j)[y] hat_x(k)[x]
        gz = wdiags_ref[0, vi] * z_ids + woffs_ref[0, vi]   # (TZ,1,1)
        gy = wdiags_ref[1, vi] * y_ids + woffs_ref[1, vi]   # (1,TY,1)
        gx = wdiags_ref[2, vi] * x_ids + woffs_ref[2, vi]   # (1,1,TX)
        w = jnp.zeros((TZ, TY, TX), dtype=jnp.float32)
        for gi in range(5):
            hz = jnp.maximum(0.0, 1.0 - jnp.abs(gz - gi))
            inner_y = jnp.zeros((1, TY, TX), dtype=jnp.float32)
            for gj in range(5):
                hy = jnp.maximum(0.0, 1.0 - jnp.abs(gy - gj))
                inner_x = jnp.zeros((1, 1, TX), dtype=jnp.float32)
                for gk in range(5):
                    hx = jnp.maximum(0.0, 1.0 - jnp.abs(gx - gk))
                    inner_x = inner_x + wg_ref[gi, gj, gk] * hx
                inner_y = inner_y + hy * inner_x
            w = w + hz * inner_y
        w = jnp.where(w < 1.0, (jnp.cos((1.0 - w) * np.pi) + 1.0) / 2.0, w)
        w = jnp.clip(w, 0.0, 1.0)
        w = jnp.where(valid, w, 0.0)

        acc = acc + w * jnp.where(valid, val, 0.0)
        wsum = wsum + w
        vacc = vacc + jnp.where(valid, val, 0.0)
        vcnt = vcnt + valid.astype(jnp.float32)

    fallback = vacc / jnp.maximum(vcnt, 1.0)
    out_ref[:, :, :] = jnp.where(
        wsum > 0.0, acc / jnp.maximum(wsum, 1e-12), fallback
    )


@partial(
    jax.jit,
    static_argnames=(
        "out_shape", "tile_shape", "K", "interpret", "out_dtype", "scale"
    ),
)
def fuse_translation_3d(
    tiles,          # (V, D, H, W) any dtype — packed + cast to f32 on device
    view_idx,       # (n_tz, n_ty, n_tx, K) int32
    offs,           # (V, 3) f32
    extents,        # (V, 3) f32
    wdiags,         # (V, 3) f32
    woffs,          # (V, 3) f32
    wgrids,         # (V, 5, 5, 5) f32
    out_shape,
    tile_shape=(8, 128, 256),
    K: int = 4,
    interpret: bool = False,
    out_dtype=jnp.float32,
    origin=None,    # (3,) int32 — output-pixel origin (banded calls)
    scale=(1, 1.0, 1.0),  # out-pixel -> view-pixel; z scale must be INTEGER
    scales=None,    # (V, 3) f32 per-view scales (mixed-resolution mosaics);
    #                 ``scale`` must then be the per-dim MAX (window sizing;
    #                 z may be any float in this mode)
):
    """Fuse a full 3D output from translation-placed tiles, single pass.

    Views are packed into a single zero-padded atlas on device (see module
    docstring), keeping memory ~V x tile bytes for any tile size.

    ``scale`` supports a uniform (per-dim static) non-unit output-pixel ->
    view-pixel map; the z component must be an integer so the z lerp stays
    a static strided slice. ``scales`` switches to per-view scales (any
    float z) via a banded z-lerp matmul.
    """
    TZ, TY, TX = tile_shape
    OZ, OY, OX = out_shape
    per_view = scales is not None
    if not per_view and float(scale[0]) != int(scale[0]):
        raise ValueError("3D Pallas fusion requires an integer z scale")
    SZ = int(np.ceil(float(scale[0])))
    n_tz = -(-OZ // TZ)
    n_ty = -(-OY // TY)
    n_tx = -(-OX // TX)
    DW = SZ * TZ + 1
    HW = int(-(-(int(np.ceil(scale[1] * TY)) + 16) // 8) * 8)
    WW = int(-(-(int(np.ceil(scale[2] * TX)) + 256) // 128) * 128)
    PADZ, PADY, PADX = DW, HW, WW
    V = tiles.shape[0]
    tile = tuple(tiles.shape[1:])
    grid = _atlas_grid(V, tile, (PADZ, PADY, PADX))
    atlas = _build_atlas(tiles.astype(jnp.float32), grid, (PADZ, PADY, PADX))
    # (ndim, V) SMEM layout — see 2D wrapper note
    aoffs = (
        jnp.asarray(offs, jnp.float32)
        + jnp.asarray(_atlas_origins(V, grid, tile, (PADZ, PADY, PADX)))
    ).T

    wgrids_padded = jnp.zeros((V, 5, 8, 128), dtype=jnp.float32)
    wgrids_padded = wgrids_padded.at[:, :, :5, :5].set(
        jnp.asarray(wgrids, dtype=jnp.float32)
    )

    if origin is None:
        origin = jnp.zeros((3,), jnp.int32)
    scales_t = (
        jnp.asarray(scales, dtype=jnp.float32).T
        if per_view
        else jnp.zeros((3, V), jnp.float32)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=8,
        grid=(n_tz, n_ty, n_tx),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (TZ, TY, TX), lambda i, j, k, *_: (i, j, k),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((DW, HW, WW), jnp.float32),
            pltpu.VMEM((5, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )

    out = pl.pallas_call(
        partial(
            _fuse_tile_kernel_3d, K=K, TZ=TZ, TY=TY, TX=TX,
            SZ_SC=SZ, SY_SC=float(scale[1]), SX_SC=float(scale[2]),
            PER_VIEW=per_view, DW=DW, HW=HW, WW=WW,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (n_tz * TZ, n_ty * TY, n_tx * TX), jnp.float32
        ),
        # the f32-exact (HIGHEST) shift matmuls need ~0.5 MB more scoped
        # VMEM than the 16 MB default; v5e has 128 MiB physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024
        ),
        interpret=interpret,
    )(
        jnp.asarray(view_idx, dtype=jnp.int32),
        jnp.asarray(origin, dtype=jnp.int32),
        jnp.asarray(offs, dtype=jnp.float32).T,
        aoffs,
        jnp.asarray(extents, dtype=jnp.float32).T,
        jnp.asarray(wdiags, dtype=jnp.float32).T,
        jnp.asarray(woffs, dtype=jnp.float32).T,
        scales_t,
        atlas,
        wgrids_padded,
    )
    return jnp.nan_to_num(out[:OZ, :OY, :OX]).astype(out_dtype)
