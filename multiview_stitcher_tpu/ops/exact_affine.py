"""Exact general-affine resampling as Pallas TPU kernels.

The scipy-parity gather tier (:func:`ops.resample.affine_resample`) is
TPU-hostile (per-voxel gathers, ~1 Mvox/s device-side) and the shear tier
(:mod:`ops.shear`) is fast but *approximate* for rotations (one lerp per
elementary pass). This module closes that gap: EXACT bi/trilinear
interpolation at affine sample positions, with no gathers, built from two
observations:

1. Bilinear interpolation at positions ``(u(n), v(n))`` affine in the
   output index ``n`` factors as::

       out[n] = sum_r hat(u(n) - r) * B[r, n]
       B      = win @ Hv,   Hv[c, n] = hat(v(n) - c)

   where ``hat(x) = max(0, 1 - |x|)`` is the exact lerp-weight tent.
   ``Hv`` is a dense (window_cols, N) matrix with exactly <=2 nonzeros
   per column — the matmul runs on the MXU, and the ``r``-sum is a
   vectorized sublane reduction of ``HU * B`` with ``HU[r, n] =
   hat(u(n) - r)``. No data-dependent indexing anywhere; out-of-domain
   outputs are masked to ``cval`` analytically (scipy
   ``affine_transform(order=1, mode='constant')`` semantics, reference
   transformation.py:15,118-139).

2. In 3D, the multiview acquisition family rotates views around ONE axis
   (reference czi_utils.py:707 "rotate_around_y_positions"; Appendix C of
   SURVEY.md): the map decouples as an arbitrary affine in the (z, x)
   plane times an independent y map. Laying the output tile out as
   (TZ*TX, TY) with y on the LANES amortizes the (z, x) interpolation
   matmul across all y — ~1-2K f32 MACs/voxel instead of the 2D kernel's
   window-area cost — followed by an exact banded y-lerp matmul.

3. Fully general 3D affines (all axes coupled — e.g. affine groupwise
   resolution output, reference linear_two_pass.py:216-545, which
   perturbs every matrix entry) use a third kernel that keeps ALL THREE
   sample coordinates exactly affine in the flattened output-lane index:
   a small (TZ, TY, TX) output tile flattens to the lanes, one
   (ZS*YB, XS) @ (XS, N) MXU matmul x-interpolates every (z, y) window
   row at the per-lane x positions, and a tensor-product tent
   contraction (exactly <=4 nonzero (r, l) pairs per lane) reduces to
   the output. Cost is window-volume MACs/voxel — an order above the
   y-decoupled kernel, but still MXU-class and exact, vs the gather
   tier's ~1 Mvox/s.

Maps whose planned windows exceed VMEM keep the gather tier.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# hard VMEM ceiling for planned windows: beyond this the rotation is too
# extreme for the tile shape and callers fall back to the gather tier
_MAX_WINDOW_ELEMS_2D = 512 * 1024      # f32 window <= 2 MB
_MAX_WINDOW_ELEMS_3D = 1024 * 1024     # f32 window <= 4 MB


def _round_up(x: int, m: int) -> int:
    return -(-int(x) // m) * m


def hat(x):
    """Exact lerp-weight tent: contributes (1-frac, frac) to the two
    neighbouring integer positions and exactly 0 elsewhere."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(x))


# ---------------------------------------------------------------------------
# 2D: any affine
# ---------------------------------------------------------------------------


def plan_windows_2d(mats, tile=(8, 128)):
    """Static (HW, WW) window sizes covering every map in ``mats``
    ((B, 2, 2) output-pixel -> input-pixel), or None when too large.

    Margins: +3 interpolation/floor slack, plus the DMA alignment
    residual (window starts align down to 8 sublanes / 128 lanes)."""
    mats = np.abs(np.asarray(mats, dtype=np.float64)).reshape(-1, 2, 2)
    TY, TX = tile
    hw = float(np.max(mats[:, 0, 0])) * (TY - 1) + float(
        np.max(mats[:, 0, 1])
    ) * (TX - 1)
    ww = float(np.max(mats[:, 1, 0])) * (TY - 1) + float(
        np.max(mats[:, 1, 1])
    ) * (TX - 1)
    HW = _round_up(int(np.ceil(hw)) + 3 + 8, 8)
    WW = _round_up(int(np.ceil(ww)) + 3 + 128, 128)
    if HW * WW > _MAX_WINDOW_ELEMS_2D:
        return None
    return HW, WW


def _exact2d_kernel(
    # scalar prefetch — per-ITEM scalars only: window starts and bases
    # are affine in the tile indices (plus an in-bounds clamp) and are
    # computed in-kernel, keeping SMEM O(B) instead of O(B * n_tiles)
    mats_ref,     # (B, 4) f32 rows [a00, a01, a10, a11]
    offs_ref,     # (B, 2) f32 translation (padded input-pixel coords)
    # tensor input
    data_ref,     # (B, Hp, Wp) f32 in ANY/HBM, zero-padded
    # output
    out_ref,      # (1, 1, 1, N) f32
    # scratch
    win_ref,      # (HW, WW) f32
    sem,
    *,
    TY: int,
    TX: int,
    HW: int,
    WW: int,
    HP: int,      # padded input rows (static)
    WP: int,      # padded input cols (static)
):
    b = pl.program_id(0)
    ty = pl.program_id(1)
    tx = pl.program_id(2)
    N = TY * TX

    a00 = mats_ref[b, 0]
    a01 = mats_ref[b, 1]
    a10 = mats_ref[b, 2]
    a11 = mats_ref[b, 3]
    # window-start math in padded input coords (offs already carries the
    # +HW/+WW pad shift); min corner via per-axis sign folding
    i0 = (ty * TY).astype(jnp.float32)
    j0 = (tx * TX).astype(jnp.float32)
    u00 = a00 * i0 + a01 * j0 + offs_ref[b, 0]
    v00 = a10 * i0 + a11 * j0 + offs_ref[b, 1]
    umin = (
        u00
        + jnp.minimum(a00 * (TY - 1), 0.0)
        + jnp.minimum(a01 * (TX - 1), 0.0)
    )
    vmin = (
        v00
        + jnp.minimum(a10 * (TY - 1), 0.0)
        + jnp.minimum(a11 * (TX - 1), 0.0)
    )
    wy = jnp.floor(umin).astype(jnp.int32) - 1
    wx = jnp.floor(vmin).astype(jnp.int32) - 1
    wy = jnp.clip((wy // 8) * 8, 0, ((HP - HW) // 8) * 8)
    wx = jnp.clip((wx // 128) * 128, 0, ((WP - WW) // 128) * 128)
    wy = pl.multiple_of(wy, 8)
    wx = pl.multiple_of(wx, 128)
    u0 = u00 - wy.astype(jnp.float32)
    v0 = v00 - wx.astype(jnp.float32)

    copy = pltpu.make_async_copy(
        data_ref.at[b, pl.ds(wy, HW), pl.ds(wx, WW)], win_ref, sem
    )
    copy.start()

    # output pixel coords, flattened to the lane dim (n = di*TX + dj)
    n_ids = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    di = (n_ids // TX).astype(jnp.float32)
    dj = (n_ids - (n_ids // TX) * TX).astype(jnp.float32)
    u = u0 + a00 * di + a01 * dj      # (1, N) window-local input row coord
    v = v0 + a10 * di + a11 * dj      # (1, N) window-local input col coord

    c_ids = jax.lax.broadcasted_iota(jnp.int32, (WW, N), 0).astype(
        jnp.float32
    )
    Hv = jnp.maximum(0.0, 1.0 - jnp.abs(v - c_ids))       # (WW, N)

    copy.wait()
    # column interpolation on the MXU; HIGHEST keeps true f32 (default TPU
    # matmul precision would round the image VALUES through bf16)
    B_ = jnp.dot(
        win_ref[:, :], Hv,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                     # (HW, N)
    r_ids = jax.lax.broadcasted_iota(jnp.int32, (HW, N), 0).astype(
        jnp.float32
    )
    HU = jnp.maximum(0.0, 1.0 - jnp.abs(u - r_ids))       # (HW, N)
    out_ref[0, 0, 0, :] = jnp.sum(HU * B_, axis=0)


@partial(
    jax.jit,
    static_argnames=("out_shape", "tile", "HW", "WW", "interpret"),
)
def _exact2d_batch_call(
    data,       # (B, Hs, Ws) f32 (NaN-free)
    mats,       # (B, 2, 2) f32 output pixel -> input pixel
    offs,       # (B, 2) f32
    out_shape: Tuple[int, int],
    tile: Tuple[int, int],
    HW: int,
    WW: int,
    interpret: bool = False,
):
    B, Hs, Ws = data.shape
    TY, TX = tile
    OY, OX = out_shape
    N = TY * TX
    n_ty = -(-OY // TY)
    n_tx = -(-OX // TX)

    # zero-pad so every (aligned) window DMA is in-bounds; padded coord =
    # original + (HW, WW)
    data_p = jnp.pad(data, ((0, 0), (HW, HW), (WW, WW)))
    Hp, Wp = Hs + 2 * HW, Ws + 2 * WW

    mats_flat = mats.astype(jnp.float32).reshape(B, 4)
    # offsets in padded coords: the kernel computes per-tile windows and
    # bases from these per-item scalars (SMEM stays O(B))
    offs_p = offs.astype(jnp.float32) + jnp.asarray(
        [HW, WW], jnp.float32
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_ty, n_tx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, 1, N),
            lambda b, i, j, *_: (b, i, j, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((HW, WW), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    tiles_out = pl.pallas_call(
        partial(
            _exact2d_kernel, TY=TY, TX=TX, HW=HW, WW=WW, HP=Hp, WP=Wp,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, n_ty, n_tx, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(mats_flat, offs_p, data_p)

    # un-flatten tiles (XLA relayout, HBM-bandwidth) and crop
    out = (
        tiles_out.reshape(B, n_ty, n_tx, TY, TX)
        .transpose(0, 1, 3, 2, 4)
        .reshape(B, n_ty * TY, n_tx * TX)[:, :OY, :OX]
    )
    return out


@partial(
    jax.jit,
    static_argnames=("out_shape", "tile", "HW", "WW", "interpret"),
)
def exact_affine_batch_2d(
    data,        # (B, Hs, Ws) float (may contain NaN padding)
    mats,        # (B, 2, 2)
    offs,        # (B, 2)
    extents,     # (B, 2) f32 TRUE per-item extents (validity domain)
    out_shape: Tuple[int, int],
    tile: Tuple[int, int] = (8, 128),
    HW: int = 16,
    WW: int = 256,
    cval=jnp.nan,
    interpret: bool = False,
):
    """Exact batched 2D affine resample (scipy order=1 'constant' parity).

    ``WW`` must be a multiple of 128 (and ``HW`` of 8): the window DMA
    slice shape must match Mosaic's lane/sublane tiling on real TPUs
    (interpret mode does not check this) — use :func:`plan_windows_2d`.

    Output pixel ``(i, j)`` of item ``b`` samples input coordinate
    ``mats[b] @ (i, j) + offs[b]``; coordinates outside
    ``[0, extents[b]-1]`` produce exactly ``cval``.
    """
    data_f = jnp.nan_to_num(data.astype(jnp.float32))
    vals = _exact2d_batch_call(
        data_f, mats, offs, out_shape, tile, HW, WW, interpret
    )
    OY, OX = out_shape
    i = jnp.arange(OY, dtype=jnp.float32)[None, :, None]
    j = jnp.arange(OX, dtype=jnp.float32)[None, None, :]
    mats = mats.astype(jnp.float32)
    offs = offs.astype(jnp.float32)
    u = mats[:, 0, 0, None, None] * i + mats[:, 0, 1, None, None] * j + (
        offs[:, 0, None, None]
    )
    v = mats[:, 1, 0, None, None] * i + mats[:, 1, 1, None, None] * j + (
        offs[:, 1, None, None]
    )
    ext = extents.astype(jnp.float32)
    valid = (
        (u >= 0)
        & (u <= ext[:, 0, None, None] - 1)
        & (v >= 0)
        & (v <= ext[:, 1, None, None] - 1)
    )
    return jnp.where(valid, vals, jnp.asarray(cval, jnp.float32))


# ---------------------------------------------------------------------------
# 3D: y-decoupled family (rotation/scale/shear in (z, x) x independent y)
# ---------------------------------------------------------------------------


def is_y_decoupled(mats, atol=1e-9) -> bool:
    """True when every (3, 3) pixel map decouples the middle axis:
    input y depends only on output y, and input z/x do not depend on
    output y (the multiview rotate-around-y family, reference
    czi_utils.py:638-737)."""
    m = np.asarray(mats, dtype=np.float64).reshape(-1, 3, 3)
    return bool(
        np.all(np.abs(m[:, 0, 1]) <= atol)
        & np.all(np.abs(m[:, 2, 1]) <= atol)
        & np.all(np.abs(m[:, 1, 0]) <= atol)
        & np.all(np.abs(m[:, 1, 2]) <= atol)
    )


def plan_windows_3d(mats, tile=(8, 32, 128)):
    """Static (ZS, XS, YW) window sizes for the y-decoupled 3D kernel, or
    None when too large. ``tile`` is the (TZ, TX, TY) output tile.

    Margins: +3 slack, plus DMA alignment residual on the sublane (8) and
    lane (128) dims; z is an untiled major dim (arbitrary start)."""
    m = np.abs(np.asarray(mats, dtype=np.float64)).reshape(-1, 3, 3)
    TZ, TX, TY = tile
    zs = float(np.max(m[:, 0, 0])) * (TZ - 1) + float(
        np.max(m[:, 0, 2])
    ) * (TX - 1)
    xs = float(np.max(m[:, 2, 0])) * (TZ - 1) + float(
        np.max(m[:, 2, 2])
    ) * (TX - 1)
    yw = float(np.max(m[:, 1, 1])) * (TY - 1)
    ZS = int(np.ceil(zs)) + 3
    XS = _round_up(int(np.ceil(xs)) + 3 + 8, 8)
    YW = _round_up(int(np.ceil(yw)) + 3 + 128, 128)
    if ZS * XS * YW > _MAX_WINDOW_ELEMS_3D:
        return None
    return ZS, XS, YW


def _exact3d_sepy_kernel(
    # scalar prefetch — per-ITEM scalars only (windows/bases computed
    # in-kernel: SMEM stays O(B), not O(B * n_tiles))
    mats_ref,     # (B, 5) f32 [m00, m02, m20, m22, m11]
    offs_ref,     # (B, 3) f32 (w, u, v) translation in PADDED coords
    # tensor input: (B, Zp, Xp, Yp) f32 — input TRANSPOSED to (z, x, y)
    data_ref,
    # output: (1, 1, 1, 1, N2, TY) f32, N2 = TZ*TX
    out_ref,
    # scratch
    win_ref,      # (ZS, XS, YW) f32
    sem,
    *,
    TZ: int,
    TX: int,
    TY: int,
    ZS: int,
    XS: int,
    YW: int,
    ZP: int,
    XP: int,
    YP: int,
):
    b = pl.program_id(0)
    tz = pl.program_id(1)
    tx = pl.program_id(2)
    ty = pl.program_id(3)
    N2 = TZ * TX

    m00 = mats_ref[b, 0]
    m02 = mats_ref[b, 1]
    m20 = mats_ref[b, 2]
    m22 = mats_ref[b, 3]
    m11 = mats_ref[b, 4]
    z0 = (tz * TZ).astype(jnp.float32)
    x0 = (tx * TX).astype(jnp.float32)
    y0 = (ty * TY).astype(jnp.float32)
    w00 = m00 * z0 + m02 * x0 + offs_ref[b, 0]
    u00 = m11 * y0 + offs_ref[b, 1]
    v00 = m20 * z0 + m22 * x0 + offs_ref[b, 2]
    wmin = (
        w00
        + jnp.minimum(m00 * (TZ - 1), 0.0)
        + jnp.minimum(m02 * (TX - 1), 0.0)
    )
    vmin = (
        v00
        + jnp.minimum(m20 * (TZ - 1), 0.0)
        + jnp.minimum(m22 * (TX - 1), 0.0)
    )
    umin = u00 + jnp.minimum(m11 * (TY - 1), 0.0)
    wz = jnp.clip(
        jnp.floor(wmin).astype(jnp.int32) - 1, 0, ZP - ZS
    )  # z: untiled major dim, any start
    wx = jnp.clip(
        ((jnp.floor(vmin).astype(jnp.int32) - 1) // 8) * 8,
        0, ((XP - XS) // 8) * 8,
    )
    wy = jnp.clip(
        ((jnp.floor(umin).astype(jnp.int32) - 1) // 128) * 128,
        0, ((YP - YW) // 128) * 128,
    )
    wx = pl.multiple_of(wx, 8)
    wy = pl.multiple_of(wy, 128)
    w0 = w00 - wz.astype(jnp.float32)
    v0 = v00 - wx.astype(jnp.float32)
    u0 = u00 - wy.astype(jnp.float32)

    copy = pltpu.make_async_copy(
        data_ref.at[b, pl.ds(wz, ZS), pl.ds(wx, XS), pl.ds(wy, YW)],
        win_ref,
        sem,
    )
    copy.start()

    # (z, x) sample positions per n2 = dz*TX + dx (lanes of the Hv build)
    n2 = jax.lax.broadcasted_iota(jnp.int32, (1, N2), 1)
    dz = (n2 // TX).astype(jnp.float32)
    dx = (n2 - (n2 // TX) * TX).astype(jnp.float32)
    w = w0 + m00 * dz + m02 * dx            # (1, N2) window z coord
    v = v0 + m20 * dz + m22 * dx            # (1, N2) window x coord

    # x-interpolation matrix shared by every z-slab: (N2, XS)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (N2, XS), 1).astype(
        jnp.float32
    )
    Hv = jnp.maximum(0.0, 1.0 - jnp.abs(v.reshape(N2, 1) - c_ids))
    wcol = w.reshape(N2, 1)                 # (N2, 1)

    copy.wait()

    # z loop: acc[n2, y'] += hat(w - dz_w) * (Hv_z @ win[dz_w])
    def body(dzw, acc):
        hz = jnp.maximum(
            0.0, 1.0 - jnp.abs(wcol - dzw.astype(jnp.float32))
        )                                   # (N2, 1)
        slab = win_ref[pl.ds(dzw, 1), :, :].reshape(XS, YW)
        m = jnp.dot(
            Hv, slab,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )                                   # (N2, YW)
        return acc + hz * m

    acc = jax.lax.fori_loop(
        0, ZS, body, jnp.zeros((N2, YW), jnp.float32)
    )

    # exact banded y lerp: positions u(ty') = m11*ty' + u0 shared by all n2
    yrow = jax.lax.broadcasted_iota(jnp.int32, (YW, TY), 1).astype(
        jnp.float32
    )
    ypos = m11 * yrow + u0                  # target window-y per output y
    yband = jax.lax.broadcasted_iota(jnp.int32, (YW, TY), 0).astype(
        jnp.float32
    )
    Sy = jnp.maximum(0.0, 1.0 - jnp.abs(ypos - yband))    # (YW, TY)
    out_ref[0, 0, 0, 0, :, :] = jnp.dot(
        acc, Sy,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@partial(
    jax.jit,
    static_argnames=("out_shape", "tile", "ZS", "XS", "YW", "interpret"),
)
def _exact3d_sepy_call(
    data_zxy,    # (B, Zs, Xs, Ys) f32 — input transposed to (z, x, y)
    mats5,       # (B, 5) f32 [m00, m02, m20, m22, m11]
    offs,        # (B, 3) f32 (z, y, x) translation (original axis order)
    out_shape: Tuple[int, int, int],
    tile: Tuple[int, int, int],
    ZS: int,
    XS: int,
    YW: int,
    interpret: bool = False,
):
    B, Zs, Xs, Ys = data_zxy.shape
    TZ, TX, TY = tile
    OZ, OY, OX = out_shape
    N2 = TZ * TX
    n_tz = -(-OZ // TZ)
    n_tx = -(-OX // TX)
    n_ty = -(-OY // TY)

    data_p = jnp.pad(
        data_zxy, ((0, 0), (ZS, ZS), (XS, XS), (YW, YW))
    )
    Zp, Xp, Yp = Zs + 2 * ZS, Xs + 2 * XS, Ys + 2 * YW

    # offsets in padded (z, x, y)-layout coords, kernel order (w, u, v);
    # per-tile windows/bases are computed in-kernel from these scalars
    offs_p = offs.astype(jnp.float32) + jnp.asarray(
        [ZS, YW, XS], jnp.float32
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_tz, n_tx, n_ty),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, 1, 1, N2, TY),
            lambda b, i, j, k, *_: (b, i, j, k, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((ZS, XS, YW), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    tiles_out = pl.pallas_call(
        partial(
            _exact3d_sepy_kernel,
            TZ=TZ, TX=TX, TY=TY, ZS=ZS, XS=XS, YW=YW,
            ZP=Zp, XP=Xp, YP=Yp,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, n_tz, n_tx, n_ty, N2, TY), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(mats5.astype(jnp.float32), offs_p, data_p)

    # (B, n_tz, n_tx, n_ty, TZ*TX, TY) -> (B, OZ, OY, OX)
    out = tiles_out.reshape(B, n_tz, n_tx, n_ty, TZ, TX, TY)
    out = out.transpose(0, 1, 4, 3, 6, 2, 5).reshape(
        B, n_tz * TZ, n_ty * TY, n_tx * TX
    )
    return out[:, :OZ, :OY, :OX]


@partial(
    jax.jit,
    static_argnames=("out_shape", "tile", "ZS", "XS", "YW", "interpret"),
)
def exact_affine_batch_3d_sepy(
    data,        # (B, Sz, Sy, Sx) float (may contain NaN padding)
    mats,        # (B, 3, 3) y-decoupled output-pixel -> input-pixel maps
    offs,        # (B, 3)
    extents,     # (B, 3) f32 TRUE per-item (z, y, x) extents
    out_shape: Tuple[int, int, int],
    tile: Tuple[int, int, int] = (8, 32, 128),
    ZS: int = 16,
    XS: int = 40,
    YW: int = 256,
    cval=jnp.nan,
    interpret: bool = False,
):
    """Exact batched 3D affine resample for the y-decoupled family
    (scipy order=1 'constant' parity). ``tile`` is (TZ, TX, TY)."""
    data_f = jnp.nan_to_num(data.astype(jnp.float32))
    # input laid out (z, x, y): y on the lanes amortizes the (z, x)
    # interpolation across the whole y extent
    data_zxy = data_f.transpose(0, 1, 3, 2)
    mats = mats.astype(jnp.float32)
    mats5 = jnp.stack(
        [
            mats[:, 0, 0], mats[:, 0, 2],
            mats[:, 2, 0], mats[:, 2, 2],
            mats[:, 1, 1],
        ],
        axis=-1,
    )
    vals = _exact3d_sepy_call(
        data_zxy, mats5, offs, out_shape, tile, ZS, XS, YW, interpret
    )

    OZ, OY, OX = out_shape
    zz = jnp.arange(OZ, dtype=jnp.float32)[None, :, None, None]
    yy = jnp.arange(OY, dtype=jnp.float32)[None, None, :, None]
    xx = jnp.arange(OX, dtype=jnp.float32)[None, None, None, :]
    offs = offs.astype(jnp.float32)
    w = (
        mats[:, 0, 0, None, None, None] * zz
        + mats[:, 0, 2, None, None, None] * xx
        + offs[:, 0, None, None, None]
    )
    u = (
        mats[:, 1, 1, None, None, None] * yy
        + offs[:, 1, None, None, None]
    )
    v = (
        mats[:, 2, 0, None, None, None] * zz
        + mats[:, 2, 2, None, None, None] * xx
        + offs[:, 2, None, None, None]
    )
    ext = extents.astype(jnp.float32)
    valid = (
        (w >= 0) & (w <= ext[:, 0, None, None, None] - 1)
        & (u >= 0) & (u <= ext[:, 1, None, None, None] - 1)
        & (v >= 0) & (v <= ext[:, 2, None, None, None] - 1)
    )
    return jnp.where(valid, vals, jnp.asarray(cval, jnp.float32))


# ---------------------------------------------------------------------------
# 3D: fully general affine (all axes coupled)
# ---------------------------------------------------------------------------

# ceiling on the (ZS * YB) matmul M dim of the general kernel: the
# x-interpolated intermediate P is (ZS*YB, N) f32 in registers/VMEM
_MAX_GENERAL_ROWS = 1024


def plan_windows_3d_general(mats, tile=(8, 4, 32)):
    """Static (ZS, YB, XS) window sizes for the general 3D kernel, or
    None when too large. ``tile`` is the (TZ, TY, TX) output tile; the
    window is in NATURAL (z, y, x) layout.

    Every row of the map contributes to every window dim (all couplings
    budgeted — VERDICT r4 item 3). Margins: +3 interpolation/floor
    slack, plus the DMA alignment residual on the sublane (y: 8) and
    lane (x: 128) dims; z is an untiled major dim (arbitrary start)."""
    m = np.abs(np.asarray(mats, dtype=np.float64)).reshape(-1, 3, 3)
    TZ, TYS, TX = tile
    spans = [
        float(np.max(m[:, r, 0])) * (TZ - 1)
        + float(np.max(m[:, r, 1])) * (TYS - 1)
        + float(np.max(m[:, r, 2])) * (TX - 1)
        for r in range(3)
    ]
    ZS = int(np.ceil(spans[0])) + 3
    YB = _round_up(int(np.ceil(spans[1])) + 3 + 8, 8)
    XS = _round_up(int(np.ceil(spans[2])) + 3 + 128, 128)
    if ZS * YB * XS > _MAX_WINDOW_ELEMS_3D or ZS * YB > _MAX_GENERAL_ROWS:
        return None
    return ZS, YB, XS


def _exact3d_general_kernel(
    # scalar prefetch — per-ITEM scalars only (windows/bases computed
    # in-kernel: SMEM stays O(B), not O(B * n_tiles))
    mats_ref,     # (B, 9) f32 row-major 3x3 output-voxel -> input-voxel
    offs_ref,     # (B, 3) f32 (z, y, x) translation in PADDED coords
    # tensor input: (B, Zp, Yp, Xp) f32 — NATURAL layout, zero-padded
    data_ref,
    # output: (1, 1, 1, 1, 1, N) f32, N = TZ*TYS*TX (trailing singleton
    # keeps the last-two block dims equal to the array dims — Mosaic
    # rejects a (1, N) block over an (n_tx, N) trailing pair: the
    # second-to-last block dim must be divisible by 8 or equal to the
    # array dim; caught live on v5e, interpret mode accepts either)
    out_ref,
    # scratch
    win_ref,      # (ZS, YB, XS) f32
    sem,
    *,
    TZ: int,
    TYS: int,
    TX: int,
    ZS: int,
    YB: int,
    XS: int,
    ZP: int,
    YP: int,
    XP: int,
):
    b = pl.program_id(0)
    tz = pl.program_id(1)
    ty = pl.program_id(2)
    tx = pl.program_id(3)
    N = TZ * TYS * TX

    m00 = mats_ref[b, 0]
    m01 = mats_ref[b, 1]
    m02 = mats_ref[b, 2]
    m10 = mats_ref[b, 3]
    m11 = mats_ref[b, 4]
    m12 = mats_ref[b, 5]
    m20 = mats_ref[b, 6]
    m21 = mats_ref[b, 7]
    m22 = mats_ref[b, 8]

    z0 = (tz * TZ).astype(jnp.float32)
    y0 = (ty * TYS).astype(jnp.float32)
    x0 = (tx * TX).astype(jnp.float32)
    w00 = m00 * z0 + m01 * y0 + m02 * x0 + offs_ref[b, 0]
    u00 = m10 * z0 + m11 * y0 + m12 * x0 + offs_ref[b, 1]
    v00 = m20 * z0 + m21 * y0 + m22 * x0 + offs_ref[b, 2]

    def tile_min(base, ma, mb, mc):
        return (
            base
            + jnp.minimum(ma * (TZ - 1), 0.0)
            + jnp.minimum(mb * (TYS - 1), 0.0)
            + jnp.minimum(mc * (TX - 1), 0.0)
        )

    wmin = tile_min(w00, m00, m01, m02)
    umin = tile_min(u00, m10, m11, m12)
    vmin = tile_min(v00, m20, m21, m22)
    wz = jnp.clip(
        jnp.floor(wmin).astype(jnp.int32) - 1, 0, ZP - ZS
    )  # z: untiled major dim, any start
    wy = jnp.clip(
        ((jnp.floor(umin).astype(jnp.int32) - 1) // 8) * 8,
        0, ((YP - YB) // 8) * 8,
    )
    wx = jnp.clip(
        ((jnp.floor(vmin).astype(jnp.int32) - 1) // 128) * 128,
        0, ((XP - XS) // 128) * 128,
    )
    wy = pl.multiple_of(wy, 8)
    wx = pl.multiple_of(wx, 128)

    copy = pltpu.make_async_copy(
        data_ref.at[b, pl.ds(wz, ZS), pl.ds(wy, YB), pl.ds(wx, XS)],
        win_ref,
        sem,
    )
    copy.start()

    # per-lane output offsets: n = (dz*TYS + dy)*TX + dx
    n_ids = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    dz_i = n_ids // (TYS * TX)
    rem = n_ids - dz_i * (TYS * TX)
    dy_i = rem // TX
    dx_i = rem - dy_i * TX
    dz = dz_i.astype(jnp.float32)
    dy = dy_i.astype(jnp.float32)
    dx = dx_i.astype(jnp.float32)
    w = (w00 - wz.astype(jnp.float32)) + m00 * dz + m01 * dy + m02 * dx
    u = (u00 - wy.astype(jnp.float32)) + m10 * dz + m11 * dy + m12 * dx
    v = (v00 - wx.astype(jnp.float32)) + m20 * dz + m21 * dy + m22 * dx

    # x-interpolation matrix at the per-lane x positions
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (XS, N), 0).astype(
        jnp.float32
    )
    Hv = jnp.maximum(0.0, 1.0 - jnp.abs(v - c_ids))       # (XS, N)

    copy.wait()
    # ONE big MXU matmul x-interpolates every (z, y) window row at every
    # lane's x position; HIGHEST keeps true f32 image values
    win2d = win_ref[:, :, :].reshape(ZS * YB, XS)
    P = jnp.dot(
        win2d, Hv,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                                     # (ZS*YB, N)

    # tensor-product tent contraction over the (z=r, y=l) window rows:
    # exactly <=2 nonzero r and <=2 nonzero l per lane
    rl = jax.lax.broadcasted_iota(jnp.int32, (ZS * YB, N), 0)
    r_i = rl // YB
    l_i = rl - r_i * YB
    Wt = jnp.maximum(
        0.0, 1.0 - jnp.abs(w - r_i.astype(jnp.float32))
    ) * jnp.maximum(0.0, 1.0 - jnp.abs(u - l_i.astype(jnp.float32)))
    out_ref[0, 0, 0, 0, 0, :] = jnp.sum(Wt * P, axis=0)


@partial(
    jax.jit,
    static_argnames=("out_shape", "tile", "ZS", "YB", "XS", "interpret"),
)
def _exact3d_general_call(
    data,        # (B, Sz, Sy, Sx) f32, NATURAL layout (NaN-free)
    mats9,       # (B, 9) f32 row-major output-voxel -> input-voxel
    offs,        # (B, 3) f32 (z, y, x) translation
    out_shape: Tuple[int, int, int],
    tile: Tuple[int, int, int],
    ZS: int,
    YB: int,
    XS: int,
    interpret: bool = False,
):
    B, Sz, Sy, Sx = data.shape
    TZ, TYS, TX = tile
    OZ, OY, OX = out_shape
    N = TZ * TYS * TX
    n_tz = -(-OZ // TZ)
    n_ty = -(-OY // TYS)
    n_tx = -(-OX // TX)

    data_p = jnp.pad(data, ((0, 0), (ZS, ZS), (YB, YB), (XS, XS)))
    Zp, Yp, Xp = Sz + 2 * ZS, Sy + 2 * YB, Sx + 2 * XS
    offs_p = offs.astype(jnp.float32) + jnp.asarray(
        [ZS, YB, XS], jnp.float32
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_tz, n_ty, n_tx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, 1, 1, 1, 1, N),
            lambda b, i, j, k, *_: (b, i, j, k, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((ZS, YB, XS), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    tiles_out = pl.pallas_call(
        partial(
            _exact3d_general_kernel,
            TZ=TZ, TYS=TYS, TX=TX, ZS=ZS, YB=YB, XS=XS,
            ZP=Zp, YP=Yp, XP=Xp,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (B, n_tz, n_ty, n_tx, 1, N), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(mats9.astype(jnp.float32), offs_p, data_p)

    # (B, n_tz, n_ty, n_tx, TZ, TYS, TX) -> (B, OZ, OY, OX)
    out = tiles_out.reshape(B, n_tz, n_ty, n_tx, TZ, TYS, TX)
    out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(
        B, n_tz * TZ, n_ty * TYS, n_tx * TX
    )
    return out[:, :OZ, :OY, :OX]


@partial(
    jax.jit,
    static_argnames=("out_shape", "tile", "ZS", "YB", "XS", "interpret"),
)
def exact_affine_batch_3d_general(
    data,        # (B, Sz, Sy, Sx) float (may contain NaN padding)
    mats,        # (B, 3, 3) ANY output-voxel -> input-voxel maps
    offs,        # (B, 3)
    extents,     # (B, 3) f32 TRUE per-item (z, y, x) extents
    out_shape: Tuple[int, int, int],
    tile: Tuple[int, int, int] = (8, 4, 32),
    ZS: int = 16,
    YB: int = 16,
    XS: int = 256,
    cval=jnp.nan,
    interpret: bool = False,
):
    """Exact batched 3D affine resample for FULLY GENERAL maps (scipy
    order=1 'constant' parity, reference transformation.py:118-139 — any
    affine, one code path). ``tile`` is (TZ, TY, TX); use
    :func:`plan_windows_3d_general` for (ZS, YB, XS)."""
    data_f = jnp.nan_to_num(data.astype(jnp.float32))
    mats = mats.astype(jnp.float32)
    vals = _exact3d_general_call(
        data_f, mats.reshape(-1, 9), offs, out_shape, tile,
        ZS, YB, XS, interpret,
    )

    OZ, OY, OX = out_shape
    zz = jnp.arange(OZ, dtype=jnp.float32)[None, :, None, None]
    yy = jnp.arange(OY, dtype=jnp.float32)[None, None, :, None]
    xx = jnp.arange(OX, dtype=jnp.float32)[None, None, None, :]
    offs = offs.astype(jnp.float32)

    def coord(r):
        return (
            mats[:, r, 0, None, None, None] * zz
            + mats[:, r, 1, None, None, None] * yy
            + mats[:, r, 2, None, None, None] * xx
            + offs[:, r, None, None, None]
        )

    ext = extents.astype(jnp.float32)
    valid = jnp.ones((mats.shape[0], OZ, OY, OX), bool)
    for r in range(3):
        c = coord(r)
        valid &= (c >= 0) & (c <= ext[:, r, None, None, None] - 1)
    return jnp.where(valid, vals, jnp.asarray(cval, jnp.float32))
