"""Registration: pairwise phase correlation + orchestration.

TPU-native rebuild of the reference's ``registration``
(/root/reference/src/multiview_stitcher/registration.py, 3292 LoC). The
pairwise hot loop (FFT phase correlation, candidate disambiguation with SSIM
scoring, Spearman quality) runs as batched JAX kernels
(:mod:`.ops.phase_correlation`, :mod:`.ops.image_metrics`); graph building,
binning selection and global resolution stay host-side.

Key behaviors mirrored from the reference:
- binning heuristic capping overlap volume at 400³ voxels
  (registration.py:114-191)
- overlap bboxes from halfspace intersections projected into intrinsic
  frames (:194-277)
- pixel-space resampling of the moving image into the fixed frame (:280-350)
- candidate disambiguation over the ≤4^ndim sign/wrap alternatives per
  phase-correlation result, ranked by SSIM over the union/intersection box,
  with Spearman correlation as the link quality (:353-565)
- pixel-space result → world transform conversion (:1382-1474)
- register() flow: channel select → singleton-z 3D→2D reduction → adjacency
  graph → pruning → pairwise → quality filter → groupwise resolution →
  param write-back (:2227-2619)
"""

from __future__ import annotations

import logging
import warnings
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import networkx as nx
import numpy as np

from multiview_stitcher_tpu import (
    msi_utils,
    mv_graph,
    param_resolution,
    param_utils,
    si_utils,
    transformation,
)
from multiview_stitcher_tpu import transforms
from multiview_stitcher_tpu.msi_utils import Msim
from multiview_stitcher_tpu.ops import image_metrics as im_metrics
from multiview_stitcher_tpu.ops import phase_correlation as pc_ops
from multiview_stitcher_tpu.ops import resample as resample_ops
from multiview_stitcher_tpu.param_utils import XAffine
from multiview_stitcher_tpu.si_utils import Sim
from multiview_stitcher_tpu.utils import profiling
from multiview_stitcher_tpu.utils.misc import has_keyword

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# binning heuristic (reference :114-191)
# ---------------------------------------------------------------------------


def get_optimal_registration_binning(
    sim1: Sim,
    sim2: Sim,
    max_total_pixels_per_stack=400**3,
    overlap_tolerance=None,
):
    """Per-dim binning factors that bring a pairwise registration stack
    under ``max_total_pixels_per_stack`` voxels.

    Grow the binning of whichever dim currently has the finest effective
    spacing — x and y always grow together (in-plane isotropy), z grows
    alone — until the (upper-bound) overlap stack fits. Behavior-parity
    rewrite of reference registration.py:114.
    """
    if overlap_tolerance is not None:
        raise NotImplementedError("overlap_tolerance")
    spatial_dims = si_utils.get_spatial_dims_from_sim(sim1)
    spacing = {
        d: min(
            si_utils.get_spacing_from_sim(s, asarray=False)[d]
            for s in (sim1, sim2)
        )
        for d in spatial_dims
    }
    # upper bound on the overlap extent: the larger of the two sizes per dim
    extent = {d: max(sim1.sizes[d], sim2.sizes[d]) for d in spatial_dims}

    binning = {d: 1 for d in spatial_dims}
    while (
        np.prod([extent[d] / binning[d] for d in spatial_dims])
        >= max_total_pixels_per_stack
    ):
        finest = min(spatial_dims, key=lambda d: spacing[d] * binning[d])
        grow = ["z"] if finest == "z" else ["y", "x"]
        for d in grow:
            binning[d] += 1
    return binning


# ---------------------------------------------------------------------------
# overlap bboxes (reference :194-350)
# ---------------------------------------------------------------------------


def _get_overlap_bboxes(
    sim1: Sim,
    sim2: Sim,
    input_transform_key=None,
    output_transform_key=None,
    overlap_tolerance=None,
    geom_cache=None,
    cache_keys=(None, None),
):
    """Overlap AABBs of two sims in world coords, optionally projected to
    intrinsic frames. Returns dict with lowers/uppers per sim + intersection.

    ``geom_cache``/``cache_keys``: optional dict + per-view identity keys so
    batched callers compute each view's stack props / axis-alignment /
    world AABB / inverse affine ONCE per register() call instead of once
    per edge (a grid view joins ~2*ndim edges; this per-edge geometry
    dominated 1000-tile planning)."""
    ndim = si_utils.get_ndim_from_sim(sim1)

    tol_key = (
        tuple(sorted(overlap_tolerance.items()))
        if isinstance(overlap_tolerance, dict)
        else overlap_tolerance
    )

    def view_geometry(sim, key):
        ck = (key, id(sim.data), input_transform_key, tol_key)
        if geom_cache is not None and key is not None and ck in geom_cache:
            return geom_cache[ck]
        sp = si_utils.get_stack_properties_from_sim(
            sim, transform_key=input_transform_key
        )
        if overlap_tolerance is not None:
            sp = si_utils.extend_stack_props(sp, overlap_tolerance)
        aligned = mv_graph._is_axis_aligned(sp)
        aabb = mv_graph._world_aabb(sp) if aligned else None
        mat = np.asarray(
            si_utils.get_affine_from_sim(sim, input_transform_key).squeeze()
        )
        if mat.ndim == 3:
            mat = mat[0]
        entry = (sp, aligned, aabb, np.linalg.inv(mat))
        if geom_cache is not None and key is not None:
            geom_cache[ck] = entry
        return entry

    geoms = [
        view_geometry(sim, key)
        for sim, key in zip([sim1, sim2], cache_keys)
    ]

    if geoms[0][1] and geoms[1][1]:
        # both axis-aligned: the overlap is an AABB intersection
        lower = np.maximum(geoms[0][2][0], geoms[1][2][0])
        upper = np.minimum(geoms[0][2][1], geoms[1][2][1])
        if np.any(upper < lower):
            raise mv_graph.NotEnoughOverlapError(
                "No overlap between views for pairwise registration."
            )
        vol = float(np.prod(upper - lower))
        intersection = mv_graph.BoxIntersection(lower, upper)
    else:
        vol, intersection = mv_graph.get_overlap_between_pair_of_stack_props(
            geoms[0][0], geoms[1][0]
        )
        if intersection is None:
            raise mv_graph.NotEnoughOverlapError(
                "No overlap between views for pairwise registration."
            )

    corners = np.asarray(intersection.intersections)

    if output_transform_key is None:
        corners_target_space = [
            param_utils.transform_pts(corners, geom[3]) for geom in geoms
        ]
    elif output_transform_key == input_transform_key:
        corners_target_space = [corners, corners]
    else:
        raise NotImplementedError

    lowers = [np.min(cts, axis=0) for cts in corners_target_space]
    uppers = [np.max(cts, axis=0) for cts in corners_target_space]
    return {
        "lowers": lowers,
        "uppers": uppers,
        "intersection": intersection,
        "vol": vol,
    }


def sims_to_intrinsic_coord_system(sim1: Sim, sim2: Sim, transform_key, overlap_bboxes):
    """Resample both sims onto the fixed sim's pixel grid over the overlap."""
    spatial_dims = si_utils.get_spatial_dims_from_sim(sim1)
    lowers, uppers = overlap_bboxes

    spacing = np.max(
        [si_utils.get_spacing_from_sim(s, asarray=True) for s in [sim1, sim2]],
        axis=0,
    )
    affines = []
    for sim in [sim1, sim2]:
        m = np.asarray(si_utils.get_affine_from_sim(sim, transform_key).squeeze())
        affines.append(m[0] if m.ndim == 3 else m)
    transf_affine = np.linalg.inv(affines[1]) @ affines[0]

    shape = np.floor(np.array(uppers[0] - lowers[0]) / spacing + 1).astype(
        np.int64
    )
    out_props = {
        "origin": {d: lowers[0][i] for i, d in enumerate(spatial_dims)},
        "spacing": {d: spacing[i] for i, d in enumerate(spatial_dims)},
        "shape": {d: int(shape[i]) for i, d in enumerate(spatial_dims)},
    }
    out = []
    for isim, sim in enumerate(
        [sim1.astype(np.float32), sim2.astype(np.float32)]
    ):
        res = transformation.transform_sim(
            sim,
            [None, transf_affine][isim],
            output_stack_properties=out_props,
            cval=np.nan,
        )
        si_utils.set_sim_affine(
            res,
            si_utils.get_affine_from_sim(sim1, transform_key),
            transform_key=transform_key,
        )
        out.append(res)
    return out[0], out[1]


# ---------------------------------------------------------------------------
# phase correlation registration (reference :353-565)
# ---------------------------------------------------------------------------


def link_quality_metric_func(im0, im1t):
    """Spearman correlation of overlap samples (reference :109-111)."""
    mask = jnp.ones(np.asarray(im0).shape, dtype=bool).reshape(-1)
    return float(
        im_metrics.masked_spearman(
            jnp.asarray(im0).reshape(-1), jnp.asarray(im1t).reshape(-1), mask
        )
    )


# candidate-scoring parallelism inside _pcc_register_core (1 = sequential)
_CAND_CHUNK = 8


@partial(jax.jit, static_argnames=("upsample_factor", "region_mode"))
def _pcc_register_core(im0_raw, im1_raw, upsample_factor: int,
                       region_mode: Optional[str] = None):
    """Full phase-correlation registration of one pair in ONE dispatch.

    Device-side version of the reference pipeline (registration.py:353-565):
    intensity rescale, three shift proposals (phase-normalized, plain, and
    masked NCC), expansion into the 4^ndim sign/wrap candidates, batched
    candidate scoring (SSIM over the union/intersection box + Spearman), and
    argmax selection. vmap over a pair batch turns the whole pairwise
    registration sweep into a single kernel launch per shape bucket.

    Returns (t_best (ndim,), quality scalar).
    """
    ndim = im0_raw.ndim
    im0 = pc_ops.rescale_intensity(jnp.asarray(im0_raw, dtype=jnp.float32))
    im1 = pc_ops.rescale_intensity(jnp.asarray(im1_raw, dtype=jnp.float32))

    im0nm = jnp.isnan(im0)
    im1nm = jnp.isnan(im1)
    has_nans = jnp.any(im0nm) | jnp.any(im1nm)
    valid_pixels1 = jnp.sum(~im1nm)

    im0nn = jnp.nan_to_num(im0)
    im1nn = jnp.nan_to_num(im1)

    shift_phase, _ = pc_ops.phase_cross_correlation(
        im0nn, im1nn, upsample_factor=upsample_factor, normalization="phase"
    )
    shift_plain, _ = pc_ops.phase_cross_correlation(
        im0nn, im1nn, upsample_factor=upsample_factor, normalization=None
    )
    shift_masked, _ = pc_ops.masked_phase_cross_correlation(
        im0nn, im1nn, ~im0nm, ~im1nm
    )
    proposals = jnp.stack([shift_phase, shift_plain, shift_masked])
    # the masked proposal only participates when NaNs are present
    proposal_valid = jnp.array([True, True, False]) | has_nans

    # candidate expansion: per dim 4 alternatives {c, -c, -(c-S), -c-S};
    # when c == 0 only the first is admitted (reference :464)
    shape_arr = jnp.array(im1.shape, dtype=jnp.float32)
    n_props = proposals.shape[0]
    n_alt = 4**ndim
    alt_idx = np.array(list(np.ndindex((4,) * ndim)))  # (n_alt, ndim)

    def expand(prop):
        c = prop  # (ndim,)
        alts = jnp.stack(
            [c, -c, -(c - shape_arr), -c - shape_arr]
        )  # (4, ndim)
        cand = alts[alt_idx, np.arange(ndim)[None, :]]  # (n_alt, ndim)
        ok = jnp.all(
            (alt_idx == 0) | (c != 0.0)[None, :], axis=1
        )
        return cand, ok

    cands, oks = jax.vmap(expand)(proposals)  # (P, n_alt, ndim), (P, n_alt)
    t_candidates = cands.reshape(-1, ndim)
    cand_valid = (oks & proposal_valid[:, None]).reshape(-1)

    max_shift_per_dim = float(max(max(im0_raw.shape), max(im1_raw.shape)))
    cand_valid = cand_valid & (
        jnp.max(jnp.abs(t_candidates), axis=1) < max_shift_per_dim
    )

    data_range = jnp.nanmax(
        jnp.stack([jnp.nanmax(im0), jnp.nanmax(im1)])
    ) - jnp.nanmin(jnp.stack([jnp.nanmin(im0), jnp.nanmin(im1)]))
    im1_min = jnp.nanmin(im1)

    im0_valid = ~im0nm
    lo0, hi0 = im_metrics._bbox_bounds_from_mask(im0_valid)
    im0f = jnp.nan_to_num(im0)
    # fixed-image SSIM filter maps are candidate-independent: compute once
    im0_ssim_maps = {
        w: im_metrics.ssim_fixed_maps(im0f, w) for w in (3, 5, 7)
    }

    if region_mode is None:
        use_intersection = has_nans
    else:
        use_intersection = jnp.asarray(region_mode == "intersection")

    # candidate translations are pure shifts: resample via the separable
    # banded-matmul kernel (MXU) on the NaN-filled image + its validity mask
    im1_mask = (~im1nm).astype(jnp.float32)
    im1_filled = jnp.nan_to_num(im1)
    diag1 = jnp.ones(ndim, dtype=jnp.float32)

    def translate(t_cand):
        data_t = resample_ops.separable_axis_aligned_resample(
            im1_filled, diag1, t_cand, im1.shape, cval=jnp.nan
        )
        mask_t = resample_ops.separable_axis_aligned_resample(
            im1_mask, diag1, t_cand, im1.shape, cval=0.0
        )
        return jnp.where(mask_t >= 1.0 - 1e-4, data_t, jnp.nan)

    def candidate_stats(im1t, valid):
        mask = (~jnp.isnan(im1t)) & (~im0nm)
        mask_sum = jnp.sum(mask)
        frac_ok = (mask_sum > 0) & (
            mask_sum.astype(jnp.float32)
            / jnp.maximum(valid_pixels1.astype(jnp.float32), 1.0)
            >= 0.1
        )
        im1t_valid = ~jnp.isnan(im1t)
        lo1, hi1 = im_metrics._bbox_bounds_from_mask(im1t_valid)
        lo = jnp.where(
            use_intersection, jnp.maximum(lo0, lo1), jnp.minimum(lo0, lo1)
        )
        hi = jnp.where(
            use_intersection, jnp.minimum(hi0, hi1), jnp.maximum(hi0, hi1)
        )
        box = im_metrics._box_mask(im0.shape, lo, hi)
        im1t_box_max = jnp.max(
            jnp.where(box, jnp.nan_to_num(im1t, nan=-jnp.inf), -jnp.inf)
        )
        return mask, frac_ok, lo, hi, im1t_box_max

    def score_candidate(args):
        t_cand, valid = args
        im1t = translate(t_cand)
        mask, frac_ok, lo, hi, im1t_box_max = candidate_stats(im1t, valid)

        extents = hi - lo + 1
        min_shape = jnp.min(extents)
        win_eff = jnp.minimum(7, min_shape - ((min_shape - 1) % 2))

        im1tf = jnp.nan_to_num(im1t)

        def ssim_branch(w):
            ux, uxx = im0_ssim_maps[w]
            return lambda: im_metrics.ssim_mean_over_box_precomputed(
                im0f, ux, uxx, im1tf, lo, hi, win_size=w,
                data_range=data_range,
            )

        # only the admissible window size is evaluated (lax.switch)
        win_idx = jnp.where(win_eff >= 7, 2, jnp.where(win_eff >= 5, 1, 0))
        ssim_val = jax.lax.switch(
            win_idx, [ssim_branch(w) for w in (3, 5, 7)]
        )
        ssim_val = jnp.where(
            (win_eff < 3) | (im1t_box_max <= im1_min), -1.0, ssim_val
        )
        ssim_val = jnp.where(frac_ok & valid, ssim_val, -jnp.inf)
        return ssim_val

    # chunked vmap: 8 candidates scored in parallel per map step (a plain
    # lax.map is sequential and leaves the chip idle between tiny ops; full
    # vmap over all 4^ndim*3 candidates would blow transient memory when
    # the caller vmaps over a pair batch)
    CAND_CHUNK = _CAND_CHUNK
    n_c = t_candidates.shape[0]
    pad = (-n_c) % CAND_CHUNK
    if pad:
        t_candidates_p = jnp.concatenate(
            [t_candidates, jnp.zeros((pad, ndim), t_candidates.dtype)]
        )
        cand_valid_p = jnp.concatenate(
            [cand_valid, jnp.zeros((pad,), bool)]
        )
    else:
        t_candidates_p, cand_valid_p = t_candidates, cand_valid
    ssim_vals = jax.lax.map(
        jax.vmap(score_candidate),
        (
            t_candidates_p.reshape(-1, CAND_CHUNK, ndim),
            cand_valid_p.reshape(-1, CAND_CHUNK),
        ),
    ).reshape(-1)[:n_c]
    best = jnp.argmax(ssim_vals)
    any_valid = jnp.any(jnp.isfinite(ssim_vals))
    t_best = jnp.where(any_valid, t_candidates[best], jnp.zeros(ndim))

    # Spearman link quality only for the winner (the reference computes it
    # per candidate but only the argmax one is ever returned; sorts are the
    # most expensive op on TPU, so evaluate once)
    im1t_best = translate(t_best)
    mask_b, frac_ok_b, _, _, box_max_b = candidate_stats(im1t_best, True)
    quality = im_metrics.masked_spearman(im0, im1t_best - 1, mask_b)
    quality = jnp.where(
        (box_max_b <= im1_min) | ~frac_ok_b, -1.0, quality
    )
    quality = jnp.where(any_valid, quality, jnp.nan)
    return t_best, quality


@partial(jax.jit, static_argnames=("upsample_factor", "region_mode"))
def _pcc_register_core_batch(im0s, im1s, upsample_factor: int,
                             region_mode: Optional[str] = None):
    """vmap of :func:`_pcc_register_core` over a leading pair axis."""
    fn = lambda a, b: _pcc_register_core(a, b, upsample_factor, region_mode)
    return jax.vmap(fn)(im0s, im1s)


@jax.jit
def _renan_crops(vals, shapes):
    """Rebuild the NaN padding of a crop batch on device: positions at or
    beyond each crop's true shape become NaN (inverse of the host-side
    pad-to-bucket-shape fill)."""
    ndim = vals.ndim - 1
    valid = jnp.ones(vals.shape, bool)
    for d in range(ndim):
        idx = jnp.arange(vals.shape[1 + d]).reshape(
            (1,) + (1,) * d + (-1,) + (1,) * (ndim - 1 - d)
        )
        valid = valid & (
            idx < shapes[:, d].reshape((-1,) + (1,) * ndim)
        )
    return jnp.where(valid, vals, jnp.nan)


def _crops_to_device(crops, shapes):
    """Upload a NaN-padded f32 crop batch through the packed link codec.

    Eligible when every finite value is integer-valued in uint16 range
    (unbinned camera data — the common stitching case) and the NaN set is
    exactly the pad region: values ship as packed uint16 (plus the
    self-deciding delta transform) at ~10 bits/px instead of raw f32, and
    the NaN pad is reconstructed on device from the per-crop shapes.
    Anything else falls back to a raw f32 device put. CPU backends skip
    packing entirely (no wire to save)."""
    if jax.default_backend() == "cpu":
        return jnp.asarray(crops)
    from multiview_stitcher_tpu.ops import link_codec

    nanmask = np.isnan(crops)
    vals = np.nan_to_num(crops)
    if (
        vals.size * 4 < 1 << 20
        or float(vals.min()) < 0
        or float(vals.max()) > 65535
        or not np.all(vals == np.round(vals))
    ):
        return jnp.asarray(crops)
    ndim = crops.ndim - 1
    expect_pad = np.ones(crops.shape, bool)
    for bi, shp in enumerate(shapes):
        expect_pad[bi][tuple(slice(0, int(s)) for s in shp)] = False
    if not np.array_equal(nanmask, expect_pad):
        return jnp.asarray(crops)  # interior NaNs: keep exact f32 wire
    shp_arr = np.zeros((crops.shape[0], ndim), np.int32)
    for bi, shp in enumerate(shapes):
        shp_arr[bi] = shp
    dev = link_codec.put_packed(vals.astype(np.uint16))
    return _renan_crops(dev.astype(jnp.float32), jnp.asarray(shp_arr))


class _CropRef:
    """Lightweight handle for one registration crop: identifies the source
    view, the window start indices and the true crop shape. The host path
    materializes via ``sim``; the device-resident path slices the same
    window from the on-device tile stack (no crop bytes on the wire)."""

    __slots__ = ("view", "starts", "shape", "sim", "arr")

    def __init__(self, view, starts, shape, sim):
        self.view = int(view)
        self.starts = tuple(int(s) for s in starts)
        self.shape = tuple(int(s) for s in shape)
        self.sim = sim
        self.arr = None


@partial(jax.jit, static_argnames=("bucket_shape",))
def _crops_from_resident(tiles, views, starts, shapes, bucket_shape):
    """Slice a NaN-padded f32 crop batch from the resident (V, *tile)
    device stack: per item, ``dynamic_slice`` a ``bucket_shape`` window at
    the (clamped) start, roll the clamp residue away and mask positions at
    or beyond the true crop shape to NaN — bit-identical to the host crop
    batch for integer tiles."""
    ndim = len(bucket_shape)
    tdims = tiles.shape[1:]
    maxs = jnp.asarray(
        [tdims[d] - bucket_shape[d] for d in range(ndim)], jnp.int32
    )

    def one(view, start, shp):
        tile = tiles[view].astype(jnp.float32)
        st = jnp.clip(start, 0, maxs)
        win = jax.lax.dynamic_slice(
            tile, [st[d] for d in range(ndim)], bucket_shape
        )
        delta = start - st  # >= 0 by construction (crop fits the view)
        for d in range(ndim):
            win = jnp.roll(win, -delta[d], axis=d)
        mask = jnp.ones(bucket_shape, bool)
        for d in range(ndim):
            idx = jax.lax.broadcasted_iota(jnp.int32, bucket_shape, d)
            mask &= idx < shp[d]
        return jnp.where(mask, win, jnp.nan)

    return jax.vmap(one)(views, starts, shapes)


@jax.jit
def _crop_const_flags(f_crops, m_crops):
    """Per-item constant-overlap flags (device side of the reference's
    constant guard, registration.py:1504-1530): True when either crop's
    finite values are all equal. All-NaN pad rows compare NaN==NaN ->
    False, matching the host path (their results are discarded)."""

    def one(a, b):
        return (jnp.nanmin(a) == jnp.nanmax(a)) | (
            jnp.nanmin(b) == jnp.nanmax(b)
        )

    flat = lambda x: x.reshape(x.shape[0], -1)  # noqa: E731
    return jax.vmap(one)(flat(f_crops), flat(m_crops))


@partial(
    jax.jit, static_argnames=("out_shape", "upsample_factor", "region_mode")
)
def _resample_and_register_batch(
    f_crops, m_crops, fmats, foffs, mmats, moffs,
    out_shape: tuple, upsample_factor: int,
    region_mode: Optional[str] = None,
):
    """Intrinsic-space resampling of both crops + full registration for a
    whole shape bucket in ONE dispatch (crops NaN-padded to a common shape)."""

    def one(f, m, fm, fo, mm, mo):
        im0 = resample_ops.affine_resample(
            f.astype(jnp.float32), fm, fo, out_shape, order=1, cval=jnp.nan
        )
        im1 = resample_ops.affine_resample(
            m.astype(jnp.float32), mm, mo, out_shape, order=1, cval=jnp.nan
        )
        return _pcc_register_core(im0, im1, upsample_factor, region_mode)

    return jax.vmap(one)(f_crops, m_crops, fmats, foffs, mmats, moffs)


@partial(
    jax.jit,
    static_argnames=("out_shape", "upsample_factor", "region_mode", "mesh"),
)
def _resample_and_register_batch_sharded(
    f_crops, m_crops, fmats, foffs, mmats, moffs,
    out_shape: tuple, upsample_factor: int,
    region_mode: Optional[str] = None,
    mesh=None,
):
    """Multi-chip variant (SURVEY.md §2.4 P1): the pair axis is sharded over
    the mesh's leading axis with ``shard_map`` — every device registers its
    disjoint pair subset with no cross-device traffic (the reference runs one
    dask task per pair instead, registration.py:2622-2714). The batch size
    must be a multiple of the mesh size (pad with dummy pairs)."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    body = partial(
        _resample_and_register_batch.__wrapped__,
        out_shape=out_shape,
        upsample_factor=upsample_factor,
        region_mode=region_mode,
    )
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis),) * 6,
        out_specs=P(axis),
        check_vma=False,
    )(f_crops, m_crops, fmats, foffs, mmats, moffs)


def _evaluate_candidates_kernel(
    im0, im1, t_candidates, im0nm, valid_pixels1, data_range, im1_min,
    region_mode: str,
):
    """Score each candidate translation: SSIM (disambiguation) + Spearman
    (quality), all on static shapes."""
    ndim = im0.ndim
    im1t = resample_ops.translate_resample_batch(
        im1, jnp.asarray(t_candidates, dtype=jnp.float32), order=1,
        cval=jnp.nan,
    )
    im0_b = jnp.broadcast_to(im0, im1t.shape)
    im0nm_b = jnp.broadcast_to(im0nm, im1t.shape)

    mask = (~jnp.isnan(im1t)) & (~im0nm_b)
    mask_sum = jnp.sum(mask, axis=tuple(range(1, ndim + 1)))
    frac_ok = (mask_sum > 0) & (
        mask_sum.astype(jnp.float32) / jnp.maximum(valid_pixels1, 1) >= 0.1
    )

    im0_valid = ~im0nm
    lo0, hi0 = im_metrics._bbox_bounds_from_mask(im0_valid)

    def per_candidate(im1t_c, mask_c):
        im1t_valid = ~jnp.isnan(im1t_c)
        lo1, hi1 = im_metrics._bbox_bounds_from_mask(im1t_valid)
        if region_mode == "union":
            lo = jnp.minimum(lo0, lo1)
            hi = jnp.maximum(hi0, hi1)
        else:
            lo = jnp.maximum(lo0, lo1)
            hi = jnp.minimum(hi0, hi1)

        box = im_metrics._box_mask(im0.shape, lo, hi)
        im1t_box_max = jnp.max(jnp.where(box, jnp.nan_to_num(im1t_c, nan=-jnp.inf), -jnp.inf))

        extents = hi - lo + 1
        min_shape = jnp.min(extents)
        # largest odd window <= min(7, min_shape)
        win_eff = jnp.minimum(7, min_shape - ((min_shape - 1) % 2))

        im0f = jnp.nan_to_num(im0)
        im1tf = jnp.nan_to_num(im1t_c)
        ssims = jnp.stack(
            [
                im_metrics.ssim_mean_over_box(
                    im0f, im1tf, lo, hi, win_size=w, data_range=data_range
                )
                for w in (3, 5, 7)
            ]
        )
        ssim_val = jnp.where(
            win_eff >= 7,
            ssims[2],
            jnp.where(win_eff >= 5, ssims[1], ssims[0]),
        )
        ssim_val = jnp.where(
            (win_eff < 3) | (im1t_box_max <= im1_min), -1.0, ssim_val
        )

        quality = im_metrics.masked_spearman(im0_b[0], im1t_c - 1, mask_c)
        quality = jnp.where(im1t_box_max <= im1_min, -1.0, quality)
        return ssim_val, quality

    ssim_vals, quality_vals = jax.vmap(per_candidate)(im1t, mask)
    ssim_vals = jnp.where(frac_ok, ssim_vals, -1.0)
    quality_vals = jnp.where(frac_ok, quality_vals, -1.0)
    return ssim_vals, quality_vals


def phase_correlation_registration(
    fixed_data,
    moving_data,
    disambiguate_region_mode=None,
    **phase_corr_kwargs,
):
    """Default pairwise registration (reference :353-565).

    Runs phase correlation with and without spectral normalization (plus the
    masked variant when NaNs are present), expands each result into the
    ≤4^ndim sign/wrap candidate shifts, scores candidates by SSIM over the
    union/intersection box and returns the Spearman quality of the winner.

    The whole pipeline executes as one jitted device computation
    (:func:`_pcc_register_core`); set ``use_fused_core=False`` in the kwargs
    to run the step-by-step host-orchestrated path instead.
    """
    im0 = np.asarray(
        fixed_data.data if hasattr(fixed_data, "data") else fixed_data,
        dtype=np.float32,
    )
    im1 = np.asarray(
        moving_data.data if hasattr(moving_data, "data") else moving_data,
        dtype=np.float32,
    )
    ndim = im0.ndim

    use_fused_core = phase_corr_kwargs.pop("use_fused_core", True)
    if use_fused_core:
        upsample_factor = phase_corr_kwargs.pop(
            "upsample_factor", 10 if ndim == 2 else 2
        )
        t_best, quality = _pcc_register_core(
            jnp.asarray(im0),
            jnp.asarray(im1),
            upsample_factor=upsample_factor,
            region_mode=disambiguate_region_mode,
        )
        return {
            "affine_matrix": param_utils.affine_from_translation(
                np.asarray(t_best, dtype=float)
            ),
            "quality": float(quality),
        }

    im0 = np.asarray(pc_ops.rescale_intensity(im0))
    im1 = np.asarray(pc_ops.rescale_intensity(im1))

    im0nm = np.isnan(im0)
    im1nm = np.isnan(im1)
    has_nans = bool(im0nm.any() or im1nm.any())

    if disambiguate_region_mode is None:
        disambiguate_region_mode = "intersection" if has_nans else "union"

    valid_pixels1 = int(np.sum(~im1nm))
    im0nn = np.nan_to_num(im0) if has_nans else im0
    im1nn = np.nan_to_num(im1) if has_nans else im1

    upsample_factor = phase_corr_kwargs.pop(
        "upsample_factor", 10 if ndim == 2 else 2
    )

    shift_candidates = []
    for normalization in ["phase", None]:
        shift, _ = pc_ops.phase_cross_correlation(
            jnp.asarray(im0nn),
            jnp.asarray(im1nn),
            upsample_factor=upsample_factor,
            normalization=normalization,
        )
        shift_candidates.append(np.asarray(shift))

    if has_nans:
        # the masked variant uses valid-pixel masks (Padfield NCC)
        shift, _ = pc_ops.masked_phase_cross_correlation(
            jnp.asarray(im0nn),
            jnp.asarray(im1nn),
            jnp.asarray(~im0nm),
            jnp.asarray(~im1nm),
        )
        shift_candidates.append(np.asarray(shift))

    # candidate expansion: sign/wrap ambiguities (reference :461-477)
    max_shift_per_dim = np.max([im0.shape, im1.shape])
    t_candidates = []
    for shift_candidate in shift_candidates:
        ranges = [1 if shift_candidate[d] == 0 else 4 for d in range(ndim)]
        for s in np.ndindex(tuple(ranges)):
            t_candidate = []
            for d in range(ndim):
                c = shift_candidate[d]
                if s[d] == 0:
                    t_candidate.append(c)
                elif s[d] == 1:
                    t_candidate.append(-c)
                elif s[d] == 2:
                    t_candidate.append(-(c - im1.shape[d]))
                else:
                    t_candidate.append(-c - im1.shape[d])
            if np.max(np.abs(t_candidate)) < max_shift_per_dim:
                t_candidates.append(t_candidate)

    if not len(t_candidates):
        return {
            "affine_matrix": param_utils.affine_from_translation(
                np.zeros(ndim)
            ),
            "quality": np.nan,
        }

    t_candidates = np.array(t_candidates, dtype=np.float32)
    data_range = float(np.nanmax([np.nanmax(im0), np.nanmax(im1)])
                       - np.nanmin([np.nanmin(im0), np.nanmin(im1)]))
    im1_min = float(np.nanmin(im1))

    ssim_vals, quality_vals = _evaluate_candidates_kernel(
        jnp.asarray(im0),
        jnp.asarray(im1),
        t_candidates,
        jnp.asarray(im0nm),
        valid_pixels1,
        data_range,
        im1_min,
        disambiguate_region_mode,
    )
    ssim_vals = np.asarray(ssim_vals)
    quality_vals = np.asarray(quality_vals)

    argmax_index = int(np.nanargmax(ssim_vals))
    t = t_candidates[argmax_index]

    return {
        "affine_matrix": param_utils.affine_from_translation(list(t)),
        "quality": float(quality_vals[argmax_index]),
    }


# ---------------------------------------------------------------------------
# intrinsic -> world conversion (reference :1382-1474)
# ---------------------------------------------------------------------------


def get_affine_from_intrinsic_affine(
    data_affine,
    sim_fixed: Sim,
    sim_moving: Sim,
    transform_key_fixed=None,
    transform_key_moving=None,
):
    """Pixel-space result -> world transform: M_W = D_to_W_f · M_D · inv(D_to_W_c)."""
    data_affine = np.asarray(data_affine, dtype=float)

    def phys2world(sim, key):
        if key is None:
            return np.eye(data_affine.shape[0])
        m = np.asarray(si_utils.get_affine_from_sim(sim, key).squeeze())
        return m[0] if m.ndim == 3 else m

    phys2world_moving = phys2world(sim_moving, transform_key_moving)
    phys2world_fixed = phys2world(sim_fixed, transform_key_moving)

    def d_to_p(sim):
        return param_utils.affine_from_translation(
            si_utils.get_origin_from_sim(sim, asarray=True)
        ) @ np.diag(
            list(si_utils.get_spacing_from_sim(sim, asarray=True)) + [1]
        )

    D_to_W_f = phys2world_moving @ d_to_p(sim_moving)
    D_to_W_c = phys2world_fixed @ d_to_p(sim_fixed)
    return D_to_W_f @ data_affine @ np.linalg.inv(D_to_W_c)


# ---------------------------------------------------------------------------
# pairwise dispatch (reference :1477-2093)
# ---------------------------------------------------------------------------


def dispatch_pairwise_reg_func(
    pairwise_reg_func,
    fixed_data=None,
    moving_data=None,
    skip_constant_check=False,
    **pairwise_reg_func_kwargs,
):
    """Constant-image guard then call the reg func (reference :1477-1544)."""
    has_image_data = fixed_data is not None and moving_data is not None
    if has_image_data and not skip_constant_check:
        f_arr = np.asarray(
            fixed_data.data if hasattr(fixed_data, "data") else fixed_data
        )
        m_arr = np.asarray(
            moving_data.data if hasattr(moving_data, "data") else moving_data
        )
        for i, arr in enumerate([f_arr, m_arr]):
            if np.nanmin(arr) == np.nanmax(arr):
                warnings.warn(
                    "An overlap region between tiles/views is all zero or "
                    "constant. Assuming identity transform.",
                    UserWarning,
                    stacklevel=2,
                )
                return {
                    "affine_matrix": np.eye(arr.ndim + 1),
                    "quality": np.nan,
                }
    if has_image_data:
        pairwise_reg_func_kwargs["fixed_data"] = fixed_data
        pairwise_reg_func_kwargs["moving_data"] = moving_data
    return pairwise_reg_func(**pairwise_reg_func_kwargs)


def _bin_sim(sim: Sim, binning: Dict[str, int]) -> Sim:
    if max(binning.values()) <= 1:
        return sim
    factors = [binning.get(d, 1) for d in sim.dims]
    data = msi_utils._coarsen_mean(sim.to_numpy(), factors)
    sdims = sim.spatial_dims
    spacing = si_utils.get_spacing_from_sim(sim)
    origin = si_utils.get_origin_from_sim(sim)
    out = si_utils.to_spatial_image(
        data,
        dims=sim.dims,
        scale={d: spacing[d] * binning.get(d, 1) for d in sdims},
        translation={
            d: origin[d] + (binning.get(d, 1) - 1) * spacing[d] / 2
            for d in sdims
        },
    )
    out.transforms = {k: v.copy() for k, v in sim.transforms.items()}
    return out


def _spatial_range_slices(
    sim: Sim, ranges: Dict[str, Tuple[float, float]]
) -> Dict[str, slice]:
    """Index slices selecting pixel-center coords within [lo, hi] per dim."""
    indexers = {}
    for d, (lo, hi) in ranges.items():
        origin = sim.origin[d]
        spacing = sim.spacing[d]
        i0 = int(np.ceil((lo - origin) / spacing - 1e-12))
        i1 = int(np.floor((hi - origin) / spacing + 1e-12))
        i0 = max(0, i0)
        i1 = min(sim.sizes[d] - 1, i1)
        indexers[d] = slice(i0, i1 + 1)
    return indexers


def _sel_spatial_range(sim: Sim, ranges: Dict[str, Tuple[float, float]]) -> Sim:
    """Select pixel-center coords within [lo, hi] per spatial dim."""
    return sim.isel(_spatial_range_slices(sim, ranges))


def _select_and_crop_pair(
    msim1: Msim,
    msim2: Msim,
    transform_key,
    registration_binning=None,
    reg_res_level=None,
    overlap_tolerance=None,
    bin_cache=None,
    geom_cache=None,
    cache_keys=(None, None),
):
    """Level/binning selection + overlap crop shared by the per-pair and
    batched pairwise paths. Returns (sim1, sim2, reg_sims_b, lowers, uppers,
    overlap_tolerance, crop_info) where ``crop_info`` carries the crop
    index slices, the pre-crop (binned) sims and the selected scale key —
    enough for the device-resident crop path to slice the same windows
    from an on-device tile stack instead of uploading host crops.

    ``bin_cache``/``cache_keys``: optional dict + per-view identity keys so
    batched callers bin each FULL view once per register() call instead of
    once per edge it participates in (a view on a grid joins ~2*ndim edges;
    re-binning it per edge dominated end-to-end planning time)."""
    spatial_dims = msi_utils.get_spatial_dims(msim1)

    if overlap_tolerance is None:
        overlap_tolerance = {d: 0.0 for d in spatial_dims}
    elif isinstance(overlap_tolerance, (int, float)):
        overlap_tolerance = {d: float(overlap_tolerance) for d in spatial_dims}
    else:
        overlap_tolerance = {
            d: float(overlap_tolerance.get(d, 0.0)) for d in spatial_dims
        }

    # resolution level / binning selection
    if reg_res_level is not None:
        scale_key = f"scale{reg_res_level}"
        if scale_key not in msi_utils.get_sorted_scale_keys(msim1):
            raise ValueError(
                f"Resolution level {reg_res_level} does not exist."
            )
        sim1 = msi_utils.get_sim_from_msim(msim1, scale=scale_key)
        sim2 = msi_utils.get_sim_from_msim(msim2, scale=scale_key)
        if registration_binning is not None:
            sim0_1 = msi_utils.get_sim_from_msim(msim1, scale="scale0")
            actual = {
                d: int(round(sim0_1.sizes[d] / sim1.sizes[d]))
                for d in spatial_dims
            }
            for d in spatial_dims:
                if registration_binning.get(d, 1) % actual[d] != 0:
                    raise ValueError(
                        f"Resolution level {reg_res_level} factor {actual[d]} "
                        f"does not divide registration_binning[{d}]"
                    )
            registration_binning = {
                d: registration_binning[d] // actual[d] for d in spatial_dims
            }
        else:
            registration_binning = {d: 1 for d in spatial_dims}
    else:
        if registration_binning is None:
            sim1_0 = msi_utils.get_sim_from_msim(msim1, scale="scale0")
            sim2_0 = msi_utils.get_sim_from_msim(msim2, scale="scale0")
            registration_binning = get_optimal_registration_binning(
                sim1_0, sim2_0
            )
        # pick the coarsest level compatible with the binning
        scale_key = msi_utils.get_res_level_from_binning_factors(
            msim1, registration_binning
        )
        sim1 = msi_utils.get_sim_from_msim(msim1, scale=scale_key)
        sim2 = msi_utils.get_sim_from_msim(msim2, scale=scale_key)
        sim1_0 = msi_utils.get_sim_from_msim(msim1, scale="scale0")
        actual = {
            d: int(round(sim1_0.sizes[d] / sim1.sizes[d]))
            for d in spatial_dims
        }
        registration_binning = {
            d: max(1, registration_binning.get(d, 1) // actual[d])
            for d in spatial_dims
        }

    def bin_cached(sim, key):
        if bin_cache is None or key is None:
            return _bin_sim(sim, registration_binning)
        # id(sim.data) disambiguates the selected scale level; the caller
        # key identifies (view, timepoint)
        ck = (key, id(sim.data), tuple(sorted(registration_binning.items())))
        if ck not in bin_cache:
            bin_cache[ck] = _bin_sim(sim, registration_binning)
        return bin_cache[ck]

    reg_sims_b = [
        bin_cached(sim, key)
        for sim, key in zip([sim1, sim2], cache_keys)
    ]

    overlap_dict = _get_overlap_bboxes(
        reg_sims_b[0],
        reg_sims_b[1],
        input_transform_key=transform_key,
        output_transform_key=None,
        overlap_tolerance=overlap_tolerance,
        geom_cache=geom_cache,
        cache_keys=cache_keys,
    )
    lowers, uppers = overlap_dict["lowers"], overlap_dict["uppers"]

    spacings = [si_utils.get_spacing_from_sim(s) for s in reg_sims_b]
    tol = 1e-6
    crop_slices = [
        _spatial_range_slices(
            sim,
            {
                d: (
                    lowers[isim][i] - tol - spacings[isim][d],
                    uppers[isim][i] + tol + spacings[isim][d],
                )
                for i, d in enumerate(spatial_dims)
            },
        )
        for isim, sim in enumerate(reg_sims_b)
    ]
    crop_info = {
        "slices": crop_slices,
        "full_sims": list(reg_sims_b),
        "scale_key": scale_key,
    }
    reg_sims_b = [
        sim.isel(sl) for sim, sl in zip(reg_sims_b, crop_slices)
    ]
    return (
        sim1, sim2, reg_sims_b, lowers, uppers, overlap_tolerance, crop_info
    )


def register_pair_of_msims(
    msim1,
    msim2,
    transform_key,
    points_key: str = "beads",
    prefilter_markers: bool = False,
    registration_binning=None,
    reg_res_level=None,
    overlap_tolerance=None,
    pairwise_reg_func: Callable = phase_correlation_registration,
    pairwise_reg_func_kwargs: Optional[dict] = None,
):
    """Register two (purely spatial) views (reference :1547-2058).

    Returns dict with 'transform' (fixed world -> moving world XAffine),
    'quality' and 'bbox' (overlap box in world coords).
    """
    if pairwise_reg_func_kwargs is None:
        pairwise_reg_func_kwargs = {}
    pairwise_reg_func_kwargs = dict(pairwise_reg_func_kwargs)

    msim1 = msim1 if isinstance(msim1, Msim) else msi_utils.get_msim_from_sim(msim1, scale_factors=[])
    msim2 = msim2 if isinstance(msim2, Msim) else msi_utils.get_msim_from_sim(msim2, scale_factors=[])

    spatial_dims = msi_utils.get_spatial_dims(msim1)
    ndim = len(spatial_dims)

    sim1, sim2, reg_sims_b, lowers, uppers, overlap_tolerance, _crop_info = (
        _select_and_crop_pair(
            msim1,
            msim2,
            transform_key,
            registration_binning=registration_binning,
            reg_res_level=reg_res_level,
            overlap_tolerance=overlap_tolerance,
        )
    )

    # signature-based dispatch (reference :1800-1978)
    phys_keywords = [
        "fixed_origin", "moving_origin", "fixed_spacing", "moving_spacing",
        "initial_affine",
    ]
    has_phys = {k: has_keyword(pairwise_reg_func, k) for k in phys_keywords}
    has_data = all(
        has_keyword(pairwise_reg_func, k) for k in ["fixed_data", "moving_data"]
    )
    has_points = all(
        has_keyword(pairwise_reg_func, k)
        for k in ["fixed_points", "moving_points"]
    )

    sims_pixel_space = None
    affines = [
        np.asarray(
            si_utils.get_affine_from_sim(s, transform_key).squeeze()
        )
        for s in reg_sims_b
    ]
    affines = [a[0] if a.ndim == 3 else a for a in affines]

    if has_points:
        registration_func_space = "transform_key_space"
        initial_affine = np.linalg.inv(affines[1]) @ affines[0]
        point_sets = [
            s.attrs.get("point_sets", {}).get(points_key) for s in [sim1, sim2]
        ]
        if point_sets[0] is None or point_sets[1] is None:
            raise ValueError(
                f"Point set {points_key!r} missing for marker registration."
            )
        if prefilter_markers:
            # restrict each view's markers to its overlap crop (same
            # margin as the image crop) before handing them to the
            # pairwise func — reference registration.py:1862 reads the
            # point sets from the overlap-cropped sims when
            # prefilter_markers is set
            spacings_b = [
                si_utils.get_spacing_from_sim(s) for s in reg_sims_b
            ]
            filtered = []
            for isim, pts in enumerate(point_sets):
                pts = np.atleast_2d(np.asarray(pts, dtype=float))
                margin = np.array(
                    [spacings_b[isim][d] for d in spatial_dims]
                )
                lo = np.asarray(lowers[isim], dtype=float) - 1e-6 - margin
                hi = np.asarray(uppers[isim], dtype=float) + 1e-6 + margin
                keep = np.all((pts >= lo) & (pts <= hi), axis=1)
                filtered.append(pts[keep])
            point_sets = filtered
        fixed_points = param_utils.transform_pts(point_sets[0], affines[0])
        moving_points = param_utils.transform_pts(point_sets[1], affines[1])
        pairwise_reg_func_kwargs["fixed_points"] = fixed_points
        pairwise_reg_func_kwargs["moving_points"] = moving_points
        if has_phys["initial_affine"]:
            pairwise_reg_func_kwargs["initial_affine"] = (
                param_utils.affine_to_xaffine(initial_affine)
            )
        fixed_data = moving_data = None
        if has_data:
            fixed_data = reg_sims_b[0]
            moving_data = reg_sims_b[1]
    elif not any(has_phys.values()):
        fixed_data = moving_data = None
        if has_data:
            registration_func_space = "pixel_space"
            sims_pixel_space = sims_to_intrinsic_coord_system(
                reg_sims_b[0],
                reg_sims_b[1],
                transform_key=transform_key,
                overlap_bboxes=(lowers, uppers),
            )
            fixed_data = sims_pixel_space[0]
            moving_data = sims_pixel_space[1]
        else:
            registration_func_space = "transform_key_space"
    elif all(has_phys.values()):
        registration_func_space = "physical_space"
        for isim, sim in enumerate(reg_sims_b):
            prefix = ["fixed", "moving"][isim]
            pairwise_reg_func_kwargs[f"{prefix}_origin"] = (
                si_utils.get_origin_from_sim(sim)
            )
            pairwise_reg_func_kwargs[f"{prefix}_spacing"] = (
                si_utils.get_spacing_from_sim(sim)
            )
        initial_affine = np.linalg.inv(affines[1]) @ affines[0]
        pairwise_reg_func_kwargs["initial_affine"] = (
            param_utils.affine_to_xaffine(initial_affine)
        )
        fixed_data = moving_data = None
        if has_data:
            fixed_data = reg_sims_b[0]
            moving_data = reg_sims_b[1]
    else:
        raise ValueError("Unknown registration function signature")

    reg_result = dispatch_pairwise_reg_func(
        pairwise_reg_func,
        fixed_data=fixed_data,
        moving_data=moving_data,
        skip_constant_check=(
            not has_data or registration_func_space == "transform_key_space"
        ),
        **pairwise_reg_func_kwargs,
    )

    affine = np.asarray(
        param_utils.to_xaffine(reg_result["affine_matrix"]).squeeze()
    )
    if affine.ndim == 3:
        affine = affine[0]
    quality = reg_result["quality"]

    if registration_func_space == "pixel_space":
        affine_phys = get_affine_from_intrinsic_affine(
            data_affine=affine,
            sim_fixed=sims_pixel_space[0],
            sim_moving=sims_pixel_space[1],
            transform_key_fixed=transform_key,
            transform_key_moving=transform_key,
        )
    elif registration_func_space == "physical_space":
        affine_phys = affines[1] @ affine @ np.linalg.inv(affines[0])
    else:
        affine_phys = affine

    # bbox in world coords
    overlap_dict_phys = _get_overlap_bboxes(
        sim1,
        sim2,
        input_transform_key=transform_key,
        output_transform_key=transform_key,
        overlap_tolerance=overlap_tolerance,
    )
    bbox = np.array(
        [overlap_dict_phys["lowers"][0], overlap_dict_phys["uppers"][0]]
    )

    return {
        "transform": param_utils.affine_to_xaffine(affine_phys),
        "quality": quality,
        "bbox": bbox,
    }


def register_pair_of_msims_over_time(msim1, msim2, **register_kwargs):
    """Per-timepoint pairwise registration, concatenated along t."""
    msim1 = _ensure_msim_t(msim1)
    msim2 = _ensure_msim_t(msim2)
    sim1 = msi_utils.get_sim_from_msim(msim1)
    t_coords = np.asarray(sim1.coords["t"])

    results = [
        register_pair_of_msims(
            msi_utils.multiscale_sel_coords(msim1, {"t": t}),
            msi_utils.multiscale_sel_coords(msim2, {"t": t}),
            **register_kwargs,
        )
        for t in t_coords
    ]
    transform = XAffine(
        np.stack([np.asarray(r["transform"].squeeze()) for r in results]),
        t_coords=t_coords,
    )
    quality = np.array([r["quality"] for r in results])
    return {
        "transform": transform,
        "quality": quality,
        "bbox": results[0]["bbox"],
    }


def _ensure_msim_t(msim):
    if "t" in msi_utils.get_dims(msim):
        return msim
    return Msim(
        sims=[si_utils.ensure_time_dim(s) for s in msim.sims],
        transforms={
            k: (v if v.has_t else XAffine(v.data[None], t_coords=np.arange(1)))
            for k, v in msim.transforms.items()
        },
        attrs=dict(msim.attrs),
    )


def _get_singleton_spatial_dim(sims):
    """Spatial dim with single-pixel extent at a shared coordinate (3D→2D)."""
    sdims = si_utils.get_spatial_dims_from_sim(sims[0])
    if len(sdims) != 3:
        return None
    singleton_dims = [
        d for d in sdims if all(s.sizes[d] == 1 for s in sims)
    ]
    if len(singleton_dims) != 1:
        return None
    d = singleton_dims[0]
    coords = [float(s.origin[d]) for s in sims]
    if not np.allclose(coords, coords[0]):
        return None
    return d


def _drop_spatial_dim(msim: Msim, dim: str) -> Msim:
    """Project an msim along a singleton spatial dim (select its only coord)."""
    new_sims = []
    for s in msim.sims:
        idx = {dim: 0}
        sub = s.isel(idx)
        new_sims.append(sub)
    ndim_in = len(msim.sims[0].spatial_dims)
    sdims = msim.sims[0].spatial_dims
    keep = [i for i, d in enumerate(sdims) if d != dim]
    new_transforms = {}
    for key, xaff in msim.transforms.items():
        def proj(mat):
            idx = keep + [ndim_in]
            return mat[np.ix_(idx, idx)]
        if xaff.has_t:
            new_transforms[key] = XAffine(
                np.stack([proj(m) for m in xaff.data]), t_coords=xaff.t_coords
            )
        else:
            new_transforms[key] = XAffine(proj(xaff.data))
    out = Msim(sims=new_sims, transforms=new_transforms, attrs=dict(msim.attrs))
    for s in out.sims:
        s.transforms = {}
    return out


def register(
    msims: Sequence,
    transform_key: str = None,
    points_key: str = "beads",
    prefilter_markers: bool = False,
    reg_channel_index: Optional[int] = None,
    reg_channel: Optional[str] = None,
    new_transform_key: Optional[str] = None,
    registration_binning: Optional[Dict[str, int]] = None,
    reg_res_level: Optional[int] = None,
    overlap_tolerance: Union[float, Dict[str, float]] = 0.0,
    pairwise_reg_func: Callable = phase_correlation_registration,
    pairwise_reg_func_kwargs: Optional[dict] = None,
    groupwise_resolution_method: str = "global_optimization",
    groupwise_resolution_kwargs: Optional[dict] = None,
    pre_registration_pruning_method: str = "alternating_pattern",
    pre_reg_pruning_method_kwargs: Optional[dict] = None,
    post_registration_do_quality_filter: bool = False,
    post_registration_quality_threshold: float = 0.2,
    plot_summary: bool = False,
    pairs: Optional[List[Tuple[int, int]]] = None,
    n_parallel_pairwise_regs: Optional[int] = None,
    pairwise_executor: Optional[Callable] = None,
    return_dict: bool = False,
    mesh=None,
    device_tiles: Optional[bool] = None,
    scheduler=None,  # deprecated (reference registration.py:2248)
):
    """Register a list of views to a common extrinsic coordinate system.

    Flow (reference :2227-2619): build overlap graph → prune → pairwise
    registrations → optional quality filter → groupwise resolution → optional
    transform write-back under ``new_transform_key``.

    ``mesh``: a ``jax.sharding.Mesh`` to shard the batched pairwise
    registrations across devices (SURVEY.md §2.4 P1) — each device registers
    a disjoint subset of the (edge, t) work units; the tiny global solve
    stays host-side.

    ``device_tiles``: slice registration crops ON DEVICE from a resident
    (V, *tile) stack — the same stack ``fuse()`` uses — so a
    register→fuse pipeline uploads each tile once (the reference runs the
    two phases as separate passes over the same data, registration.py:2227
    + fusion/_core.py:1068). ``True`` seeds the stack here; ``None``
    (default) uses it only when already resident; ``False`` disables.
    Requires integer-dtype single-field views at scale0/binning 1; other
    inputs silently use the host crop path.
    """
    pairwise_reg_func_kwargs = pairwise_reg_func_kwargs or {}
    groupwise_resolution_kwargs = groupwise_resolution_kwargs or {}
    pre_reg_pruning_method_kwargs = pre_reg_pruning_method_kwargs or {}

    if scheduler is not None:
        warnings.warn(
            "register(..., scheduler=) is deprecated and unused here, "
            "mirroring the reference (registration.py:2395); use "
            "pairwise_executor / n_parallel_pairwise_regs / mesh instead.",
            DeprecationWarning,
            stacklevel=2,
        )

    msims = [
        m if isinstance(m, Msim) else msi_utils.get_msim_from_sim(m, scale_factors=[])
        for m in msims
    ]
    sims = [msi_utils.get_sim_from_msim(m) for m in msims]

    # registration channel selection
    if "c" in msi_utils.get_dims(msims[0]):
        if reg_channel is None:
            if reg_channel_index is None:
                raise ValueError("Please choose a registration channel.")
            reg_channel = np.asarray(sims[0].coords["c"])[reg_channel_index]
        msims_reg = [
            msi_utils.multiscale_sel_coords(m, {"c": reg_channel})
            if "c" in msi_utils.get_dims(m)
            else m
            for m in msims
        ]
    else:
        msims_reg = msims

    # singleton-z 3D→2D reduction (reference :2441-2464)
    reduced_dim = _get_singleton_spatial_dim(sims)
    if reduced_dim is not None:
        msims_reg = [_drop_spatial_dim(m, reduced_dim) for m in msims_reg]
        registration_binning, overlap_tolerance = [
            {d: v for d, v in param.items() if d != reduced_dim}
            if isinstance(param, dict)
            else param
            for param in [registration_binning, overlap_tolerance]
        ]

    with profiling.stage("register.adjacency_graph"):
        g = mv_graph.build_view_adjacency_graph_from_msims(
            msims_reg,
            transform_key=transform_key,
            pairs=pairs,
            overlap_tolerance=overlap_tolerance,
        )

    if pre_registration_pruning_method is not None:
        g_reg = mv_graph.prune_view_adjacency_graph(
            g,
            method=pre_registration_pruning_method,
            pruning_method_kwargs=pre_reg_pruning_method_kwargs,
        )
    else:
        g_reg = g

    with profiling.stage("register.pairwise_registrations"):
        g_reg_computed = compute_pairwise_registrations(
            msims_reg,
            g_reg,
            transform_key=transform_key,
            points_key=points_key,
            prefilter_markers=prefilter_markers,
            registration_binning=registration_binning,
            reg_res_level=reg_res_level,
            overlap_tolerance=overlap_tolerance,
            pairwise_reg_func=pairwise_reg_func,
            pairwise_reg_func_kwargs=pairwise_reg_func_kwargs,
            n_parallel_pairwise_regs=n_parallel_pairwise_regs,
            pairwise_executor=pairwise_executor,
            mesh=mesh,
            device_tiles=device_tiles,
        )

    if post_registration_do_quality_filter:
        g_reg_computed = mv_graph.filter_edges(
            g_reg_computed,
            threshold=post_registration_quality_threshold,
            weight_key="quality",
        )

    with profiling.stage("register.groupwise_resolution"):
        params_dict, groupwise_resolution_info_dict = (
            param_resolution.groupwise_resolution(
                g_reg_computed,
                method=groupwise_resolution_method,
                **groupwise_resolution_kwargs,
            )
        )
    params = [params_dict[iview] for iview in sorted(g_reg_computed.nodes())]

    if reduced_dim is not None:
        params = [
            param_utils.expand_affine_dims(p, [reduced_dim]) for p in params
        ]

    if new_transform_key is not None:
        for imsim, msim in enumerate(msims):
            msi_utils.set_affine_transform(
                msim,
                params[imsim],
                transform_key=new_transform_key,
                base_transform_key=transform_key,
            )

    plot_info = {}
    if plot_summary:
        from multiview_stitcher_tpu import vis_utils

        plot_info = vis_utils.plot_registration_summaries(
            msims,
            transform_key,
            new_transform_key,
            g_reg_computed,
            groupwise_resolution_info_dict,
            show_plot=plot_summary,
        )

    if return_dict:
        return {
            "params": params,
            "pairwise_registration": {
                "graph": g_reg_computed,
                "metrics": {
                    "qualities": nx.get_edge_attributes(
                        g_reg_computed, "quality"
                    )
                },
                "summary_plot": (
                    (plot_info.get("fig_pair_reg"), plot_info.get("ax_pair_reg"))
                    if plot_summary
                    else None
                ),
            },
            "groupwise_resolution": {
                "metrics": groupwise_resolution_info_dict,
                "summary_plot": (
                    (
                        plot_info.get("fig_group_res"),
                        plot_info.get("ax_group_res"),
                    )
                    if plot_summary
                    else None
                ),
            },
        }
    return params


def compute_pairwise_registrations(
    msims,
    g_reg,
    n_parallel_pairwise_regs=None,
    pairwise_executor=None,
    mesh=None,
    **register_kwargs,
):
    """Compute pairwise registrations for all graph edges.

    ``pairwise_executor(msims, edges, kwargs)`` hook kept from the reference
    (:2622-2714) so alternative schedulers (multi-host, browser-style pools)
    can run the edge batch; the default path evaluates each edge through the
    batched JAX kernels locally.
    """
    g_reg_computed = g_reg.copy()
    edges = [tuple(sorted([e[0], e[1]])) for e in g_reg.edges]

    if pairwise_executor is not None:
        exec_kwargs = {
            k: v for k, v in register_kwargs.items() if k != "device_tiles"
        }
        params = pairwise_executor(msims, edges, exec_kwargs)
        if len(params) != len(edges):
            raise ValueError(
                f"pairwise_executor returned {len(params)} results for "
                f"{len(edges)} registration pairs."
            )
        return _assign_pairwise_registrations(g_reg_computed, edges, params)

    params = _try_batched_phase_correlation(
        msims, edges, register_kwargs, mesh=mesh
    )
    register_kwargs.pop("device_tiles", None)  # batched-path-only kwarg
    if params is None:
        params = [
            register_pair_of_msims_over_time(
                msims[pair[0]], msims[pair[1]], **register_kwargs
            )
            if "t" in msi_utils.get_dims(msims[pair[0]])
            else register_pair_of_msims(
                msims[pair[0]], msims[pair[1]], **register_kwargs
            )
            for pair in edges
        ]
    return _assign_pairwise_registrations(g_reg_computed, edges, params)


def _try_batched_phase_correlation(msims, edges, register_kwargs, mesh=None):
    """Batched pairwise registration: one fused-core dispatch per crop-shape
    bucket instead of one per pair (SURVEY.md P1).

    Eligible when the default phase-correlation registration runs with plain
    kwargs. Returns per-edge result dicts, or None if not eligible.
    """
    kwargs = dict(register_kwargs)
    pairwise_reg_func = kwargs.pop(
        "pairwise_reg_func", phase_correlation_registration
    )
    reg_func_kwargs = dict(kwargs.pop("pairwise_reg_func_kwargs", None) or {})
    kwargs.pop("points_key", None)
    kwargs.pop("prefilter_markers", None)
    transform_key = kwargs.pop("transform_key")
    registration_binning = kwargs.pop("registration_binning", None)
    reg_res_level = kwargs.pop("reg_res_level", None)
    overlap_tolerance = kwargs.pop("overlap_tolerance", None)
    device_tiles = kwargs.pop("device_tiles", None)

    if pairwise_reg_func is not phase_correlation_registration:
        return None
    if not set(reg_func_kwargs) <= {"upsample_factor", "disambiguate_region_mode"}:
        return None
    if kwargs:
        return None
    if not edges:
        return []

    has_t = "t" in msi_utils.get_dims(msims[0])
    t_coords = (
        np.asarray(msi_utils.get_sim_from_msim(msims[0]).coords["t"])
        if has_t
        else [None]
    )

    # device-resident crop path (VERDICT r4 item 2, single-upload stitch):
    # when the full tile set lives (or can live) on device as one stack,
    # registration crops are sliced ON DEVICE from the resident tiles and
    # no crop bytes cross the host link. The stack is the same one fuse()
    # uses (fusion._core._tiles_to_device), so a subsequent fuse() over
    # the same views pays zero tile re-upload. Auto mode (None) enables
    # the path only when the stack is ALREADY resident — uploading whole
    # tiles just to register would cost more wire than the crops; pass
    # device_tiles=True (as stitch() does) to seed the stack here.
    from multiview_stitcher_tpu.fusion import _core as _fusion_core

    field_sims = None
    use_dev = device_tiles is not False and not has_t
    if use_dev:
        field_sims = [msi_utils.get_sim_from_msim(m) for m in msims]
        key = _fusion_core._DeviceTileCache.key_for(field_sims)
        resident = _fusion_core._device_tile_cache.get(key) is not None
        if device_tiles is None and not resident:
            use_dev = False
        elif not resident:
            budget = _fusion_core._device_tile_cache._budget()
            total = sum(
                int(np.prod(s.data.shape))
                * np.dtype(s.data.dtype).itemsize
                for s in field_sims
            )
            if key is None or total > budget:
                use_dev = False
        if use_dev:
            for s in field_sims:
                if si_utils.get_nonspatial_dims_from_sim(s) or not (
                    np.issubdtype(np.dtype(s.data.dtype), np.integer)
                ):
                    # float tiles may carry NaN the resident stack zeroes;
                    # integer tiles round-trip exactly
                    use_dev = False
                    break

    # per (edge, t) work units: host planning + one device resample each.
    # (view, t) selections and binned full views are cached across edges —
    # each view joins ~2*ndim edges and re-binning per edge dominated the
    # end-to-end planning rate.
    units = []  # (edge_idx, t_idx, crop_ref0, crop_ref1, ..., bbox)
    results_direct = {}
    bboxes = {}
    msim_sel_cache = {}
    bin_cache = {}
    geom_cache = {}

    def msim_at(i, t):
        key = (i, None if t is None else float(t))
        if key not in msim_sel_cache:
            msim_sel_cache[key] = (
                msi_utils.multiscale_sel_coords(msims[i], {"t": t})
                if t is not None
                else msims[i]
            )
        return msim_sel_cache[key]

    for ei, (i, j) in enumerate(edges):
        for ti, t in enumerate(t_coords):
            tkey = None if t is None else float(t)
            m1 = msim_at(i, t)
            m2 = msim_at(j, t)
            sim1, sim2, reg_sims_b, lowers, uppers, otol, crop_info = (
                _select_and_crop_pair(
                    m1,
                    m2,
                    transform_key,
                    registration_binning=registration_binning,
                    reg_res_level=reg_res_level,
                    overlap_tolerance=overlap_tolerance,
                    bin_cache=bin_cache,
                    geom_cache=geom_cache,
                    cache_keys=((i, tkey), (j, tkey)),
                )
            )
            if use_dev and not (
                crop_info["scale_key"] == "scale0"
                and crop_info["full_sims"][0].data is field_sims[i].data
                and crop_info["full_sims"][1].data is field_sims[j].data
            ):
                # binning/pyramid level in play for this pair (binning or
                # level selection rewraps .data in a new array, so DATA
                # identity is the right test — sim wrappers are recreated
                # per edge by the bin cache): the resident scale0 stack
                # cannot serve its crops — host path for all
                use_dev = False
            if ei not in bboxes:
                overlap_phys = _get_overlap_bboxes(
                    sim1,
                    sim2,
                    input_transform_key=transform_key,
                    output_transform_key=transform_key,
                    overlap_tolerance=otol,
                    geom_cache=geom_cache,
                    cache_keys=(("u", i, tkey), ("u", j, tkey)),
                )
                bboxes[ei] = np.array(
                    [overlap_phys["lowers"][0], overlap_phys["uppers"][0]]
                )
            ndim = len(sim1.spatial_dims)
            # crops are NOT materialized here: the host path materializes
            # (and runs the constant guard) after the loop, the device
            # path slices the same windows from the resident tile stack
            refs = [
                _CropRef(
                    v,
                    [
                        crop_info["slices"][k][d].start
                        for d in reg_sims_b[k].spatial_dims
                    ],
                    tuple(reg_sims_b[k].data.shape),
                    reg_sims_b[k],
                )
                for k, v in enumerate((i, j))
            ]

            # intrinsic (fixed-pixel-grid) output window + per-image resample
            # params (reference sims_to_intrinsic_coord_system, computed
            # host-side so the resample itself joins the batched kernel)
            sdims = reg_sims_b[0].spatial_dims
            spacing = np.max(
                [
                    si_utils.get_spacing_from_sim(s, asarray=True)
                    for s in reg_sims_b
                ],
                axis=0,
            )
            affines = []
            for s in reg_sims_b:
                a = np.asarray(
                    si_utils.get_affine_from_sim(s, transform_key).squeeze()
                )
                affines.append(a[0] if a.ndim == 3 else a)
            transf_affine = np.linalg.inv(affines[1]) @ affines[0]
            out_shape = tuple(
                int(v)
                for v in np.floor(
                    np.array(uppers[0] - lowers[0]) / spacing + 1
                ).astype(np.int64)
            )
            fmat, foff = resample_ops.physical_to_pixel_params(
                np.eye(ndim + 1),
                input_spacing=si_utils.get_spacing_from_sim(
                    reg_sims_b[0], asarray=True
                ),
                input_origin=si_utils.get_origin_from_sim(
                    reg_sims_b[0], asarray=True
                ),
                output_spacing=spacing,
                output_origin=lowers[0],
            )
            mmat, moff = resample_ops.physical_to_pixel_params(
                transf_affine,
                input_spacing=si_utils.get_spacing_from_sim(
                    reg_sims_b[1], asarray=True
                ),
                input_origin=si_utils.get_origin_from_sim(
                    reg_sims_b[1], asarray=True
                ),
                output_spacing=spacing,
                output_origin=lowers[0],
            )
            # world conversion context: the pixel grid T = A0 @ Tr(lo) @ S
            T = (
                affines[0]
                @ param_utils.affine_from_translation(lowers[0])
                @ np.diag(list(spacing) + [1])
            )
            units.append(
                (
                    ei, ti, refs[0], refs[1], fmat, foff, mmat, moff,
                    out_shape, T,
                )
            )

    tiles_dev = None
    if use_dev:
        # one upload (or a cache hit from a prior register()/fuse()): the
        # SAME resident stack later serves fuse() over these views
        try:
            tiles_dev, _nbits = _fusion_core._tiles_to_device(field_sims)
        except Exception as e:  # noqa: BLE001
            warnings.warn(
                f"device-tile registration upload failed "
                f"({type(e).__name__}: {e}); falling back to host crops.",
                RuntimeWarning,
                stacklevel=2,
            )
            use_dev = False
    if not use_dev:
        # host path: materialize crops and run the constant guard
        # (reference registration.py:1504-1530) before batching
        kept = []
        for u in units:
            for ref in (u[2], u[3]):
                if ref.arr is None:
                    ref.arr = np.asarray(ref.sim.to_numpy())
            if np.nanmin(u[2].arr) == np.nanmax(u[2].arr) or np.nanmin(
                u[3].arr
            ) == np.nanmax(u[3].arr):
                warnings.warn(
                    "An overlap region between tiles/views is all zero or "
                    "constant. Assuming identity transform.",
                    UserWarning,
                    stacklevel=2,
                )
                results_direct[(u[0], u[1])] = (
                    np.eye(len(u[8]) + 1), np.nan,
                )
                continue
            kept.append(u)
        units = kept

    upsample_factor = reg_func_kwargs.get("upsample_factor")
    region_mode = reg_func_kwargs.get("disambiguate_region_mode")

    # bucket by output window shape; NaN-pad crops to a common input shape
    buckets = {}
    for unit in units:
        buckets.setdefault(unit[8], []).append(unit)

    unit_results = {}
    pending = []
    for out_shape, bucket in buckets.items():
        ndim = len(out_shape)
        uf = upsample_factor or (10 if ndim == 2 else 2)
        fshape = tuple(
            max(u[2].shape[d] for u in bucket) for d in range(ndim)
        )
        mshape = tuple(
            max(u[3].shape[d] for u in bucket) for d in range(ndim)
        )
        # quantized batch sizes: process in fixed-size chunks and pad each
        # to a power of two (and a mesh multiple) so that varying edge
        # counts reuse a handful of compiled batch shapes instead of
        # triggering a fresh (slow, remote) compile per grid size. 512
        # amortizes the ~30-60 ms per-dispatch tunnel latency across 2x
        # more pairs than the former 256 at the same wire bytes.
        MAX_B = 512
        for cstart in range(0, len(bucket), MAX_B):
            chunk = bucket[cstart : cstart + MAX_B]
            B = len(chunk)
            Bq = 1
            while Bq < B:
                Bq *= 2
            if mesh is not None and mesh.size > 1:
                Bq = max(Bq, mesh.size)
                Bq += (-Bq) % mesh.size
            fmats = np.zeros((Bq, ndim, ndim), dtype=np.float32)
            foffs = np.zeros((Bq, ndim), dtype=np.float32)
            mmats = np.zeros((Bq, ndim, ndim), dtype=np.float32)
            moffs = np.zeros((Bq, ndim), dtype=np.float32)
            for bi, u in enumerate(chunk):
                fmats[bi] = u[4]
                foffs[bi] = u[5]
                mmats[bi] = u[6]
                moffs[bi] = u[7]

            const_dev = None
            if use_dev:
                # crops sliced on device from the resident tile stack:
                # zero crop bytes on the wire (single-upload stitch);
                # pad rows point at view 0 with shape 0 -> all NaN, same
                # as the host path's NaN pad rows
                def ref_arrays(slot):
                    views = np.zeros((Bq,), np.int32)
                    starts = np.zeros((Bq, ndim), np.int32)
                    shapes = np.zeros((Bq, ndim), np.int32)
                    for bi, u in enumerate(chunk):
                        views[bi] = u[slot].view
                        starts[bi] = u[slot].starts
                        shapes[bi] = u[slot].shape
                    return (
                        jnp.asarray(views), jnp.asarray(starts),
                        jnp.asarray(shapes),
                    )

                f_dev = _crops_from_resident(
                    tiles_dev, *ref_arrays(2), fshape
                )
                m_dev = _crops_from_resident(
                    tiles_dev, *ref_arrays(3), mshape
                )
                # constant guard runs on device (host never reads crops)
                const_dev = _crop_const_flags(f_dev, m_dev)
            else:
                f_crops = np.full((Bq,) + fshape, np.nan, dtype=np.float32)
                m_crops = np.full((Bq,) + mshape, np.nan, dtype=np.float32)
                for bi, u in enumerate(chunk):
                    f_crops[bi][
                        tuple(slice(0, s) for s in u[2].shape)
                    ] = u[2].arr
                    m_crops[bi][
                        tuple(slice(0, s) for s in u[3].shape)
                    ] = u[3].arr

                # packed uploads (lossless): integer-valued crops ship as
                # uint16+delta at ~10 bits/px instead of raw f32; NaN pad
                # is rebuilt on device from the true per-crop shapes
                f_dev = _crops_to_device(
                    f_crops, [u[2].shape for u in chunk]
                )
                m_dev = _crops_to_device(
                    m_crops, [u[3].shape for u in chunk]
                )

            args = (
                f_dev,
                m_dev,
                jnp.asarray(fmats),
                jnp.asarray(foffs),
                jnp.asarray(mmats),
                jnp.asarray(moffs),
                out_shape,
                uf,
                region_mode,
            )
            if mesh is not None and mesh.size > 1:
                shifts, qualities = _resample_and_register_batch_sharded(
                    *args, mesh
                )
            else:
                shifts, qualities = _resample_and_register_batch(*args)
            # async dispatch: collect device handles now, fetch later so
            # later buckets' compute overlaps earlier buckets' downloads.
            # On the CPU backend there is nothing to overlap and entering
            # the NEXT bucket's XLA compile while this one still executes
            # has segfaulted XLA's CPU compiler on single-core boxes
            # (CLAUDE.md) — block per bucket there.
            if jax.default_backend() == "cpu":
                jax.block_until_ready((shifts, qualities))
            pending.append((chunk, shifts, qualities, const_dev))

    def _fetch(entry):
        chunk, shifts, qualities, const_dev = entry
        return (
            chunk,
            np.asarray(shifts)[: len(chunk)],
            np.asarray(qualities)[: len(chunk)],
            (
                np.asarray(const_dev)[: len(chunk)]
                if const_dev is not None
                else np.zeros(len(chunk), bool)
            ),
        )

    if pending:
        # parallel fetch pays off only over the device link; on CPU the
        # data is already host-resident and concurrent materialization
        # just adds thread churn next to XLA compiles
        if jax.default_backend() == "cpu":
            fetched = list(map(_fetch, pending))
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(min(8, len(pending))) as ex:
                fetched = list(ex.map(_fetch, pending))
        for chunk, shifts, qualities, consts in fetched:
            for u, t_vec, q, const in zip(chunk, shifts, qualities, consts):
                ei, ti = u[0], u[1]
                if const:
                    # device-side constant guard (host path warns earlier)
                    warnings.warn(
                        "An overlap region between tiles/views is all zero "
                        "or constant. Assuming identity transform.",
                        UserWarning,
                        stacklevel=2,
                    )
                    unit_results[(ei, ti)] = (
                        np.eye(len(u[8]) + 1), np.nan,
                    )
                    continue
                T = u[9]
                affine_px = param_utils.affine_from_translation(
                    np.asarray(t_vec, dtype=float)
                )
                affine_phys = T @ affine_px @ np.linalg.inv(T)
                unit_results[(ei, ti)] = (affine_phys, float(q))

    unit_results.update(results_direct)

    # assemble per-edge results (stack over t when present)
    params = []
    for ei in range(len(edges)):
        mats = [unit_results[(ei, ti)][0] for ti in range(len(t_coords))]
        quals = [unit_results[(ei, ti)][1] for ti in range(len(t_coords))]
        if has_t:
            transform = XAffine(
                np.stack(mats), t_coords=np.asarray(t_coords)
            )
            quality = np.asarray(quals)
        else:
            transform = param_utils.affine_to_xaffine(mats[0])
            quality = quals[0]
        params.append(
            {"transform": transform, "quality": quality, "bbox": bboxes[ei]}
        )
    return params


def _assign_pairwise_registrations(g_reg_computed, edges, params):
    for i, pair in enumerate(edges):
        g_reg_computed.edges[pair]["transform"] = params[i]["transform"]
        g_reg_computed.edges[pair]["quality"] = params[i]["quality"]
        g_reg_computed.edges[pair]["bbox"] = params[i]["bbox"]
    return g_reg_computed


def crop_sim_to_references(
    sim_input_to_crop: Sim,
    reference_sims: Sequence[Sim],
    transform_key_input: str,
    transform_keys_reference: Sequence[str],
    input_time_index: int = 0,
) -> Sim:
    """Crop a sim to the minimal region covering the reference sims
    (reference registration.py:2717)."""
    ref_corners_world = []
    for iref, ref_sim in enumerate(reference_sims):
        props = si_utils.get_stack_properties_from_sim(
            ref_sim, transform_key=transform_keys_reference[iref]
        )
        ref_corners_world += list(mv_graph.get_vertices_from_stack_props(props))
    ref_corners_world = np.asarray(ref_corners_world)

    input_affine = si_utils.get_affine_from_sim(
        sim_input_to_crop, transform_key=transform_key_input
    )
    mat = np.asarray(input_affine.squeeze())
    if mat.ndim == 3:
        mat = mat[input_time_index]
    corners_input = param_utils.transform_pts(
        ref_corners_world, np.linalg.inv(mat)
    )
    lower = corners_input.min(axis=0)
    upper = corners_input.max(axis=0)
    sdims = si_utils.get_spatial_dims_from_sim(sim_input_to_crop)
    return _sel_spatial_range(
        sim_input_to_crop,
        {d: (lower[i], upper[i]) for i, d in enumerate(sdims)},
    )


# external registration backend plugins (optional C++ toolkits)
from multiview_stitcher_tpu.registration_plugins import (  # noqa: E402
    registration_ANTsPy,
    registration_ITKElastix,
)


# ---------------------------------------------------------------------------
# marker-based registration (RGLDM, BigStitcher-style; reference :568-1379)
# ---------------------------------------------------------------------------


def _marker_min_matches(transform_type: str, ndim: int) -> int:
    transform_type = transform_type.lower()
    if transform_type == "translation":
        return 1
    if transform_type == "rigid":
        return ndim
    if transform_type == "affine":
        return ndim + 1
    raise ValueError(f"Unsupported marker transform_type {transform_type!r}")


def _marker_descriptors(points, num_neighbors, redundancy):
    """Sorted pairwise-distance descriptors over kNN subsets (RGLDM)."""
    import itertools as it

    from scipy.spatial import cKDTree

    points = np.asarray(points, dtype=float)
    required = num_neighbors + redundancy
    if len(points) < required + 1:
        raise ValueError(
            f"Not enough points for marker descriptors: need "
            f"{required + 1}, got {len(points)}."
        )
    tree = cKDTree(points)
    k = min(len(points), required + 2)
    _, neigh = tree.query(points, k=k)

    vectors, point_indices = [], []
    for i, row in enumerate(np.atleast_2d(neigh)):
        nb = [int(j) for j in np.atleast_1d(row) if int(j) != i][:required]
        if len(nb) < required:
            continue
        for subset in it.combinations(nb, num_neighbors):
            group = points[[i] + list(subset)]
            dists = [
                np.linalg.norm(group[a] - group[b])
                for a, b in it.combinations(range(len(group)), 2)
            ]
            vectors.append(np.sort(np.asarray(dists)))
            point_indices.append(i)
    if not vectors:
        raise ValueError("No marker descriptors could be built.")
    return np.asarray(vectors), np.asarray(point_indices)


def _marker_auto_threshold(fixed_points, moving_points, num_neighbors, scale):
    import math as _math

    from scipy.spatial import cKDTree

    nearest = []
    for pts in (fixed_points, moving_points):
        pts = np.asarray(pts, dtype=float)
        if len(pts) < 2:
            continue
        d, _ = cKDTree(pts).query(pts, k=2)
        nearest.extend(d[:, 1])
    nearest = np.asarray(nearest)
    nearest = nearest[np.isfinite(nearest)]
    if nearest.size == 0:
        return 0.0
    vec_len = _math.comb(num_neighbors + 1, 2)
    return float(np.median(nearest) * np.sqrt(vec_len) * scale)


def _match_descriptors(
    fixed_vectors, fixed_idx, moving_vectors, moving_idx,
    descriptor_ratio, distance_threshold,
):
    """Nearest-descriptor matching with ratio test against the best
    descriptor of a *different* moving point."""
    from scipy.spatial import cKDTree

    if not len(fixed_vectors) or not len(moving_vectors):
        return np.empty((0, 2), dtype=int)
    _, counts = np.unique(moving_idx, return_counts=True)
    k = min(len(moving_vectors), int(np.max(counts)) + 1)
    tree = cKDTree(moving_vectors)
    dists, inds = tree.query(fixed_vectors, k=k)
    dists = np.atleast_2d(dists)
    inds = np.atleast_2d(inds)

    candidates = {}
    for fi, row_d, row_i in zip(fixed_idx, dists, inds):
        best = float(row_d[0])
        best_mi = moving_idx[row_i[0]]
        if best >= distance_threshold:
            continue
        other = moving_idx[row_i] != best_mi
        second = float(row_d[np.flatnonzero(other)[0]]) if other.any() else np.inf
        if best * descriptor_ratio < second:
            pair = (int(fi), int(best_mi))
            if pair not in candidates or best < candidates[pair]:
                candidates[pair] = best
    return np.asarray(list(candidates.keys()), dtype=int).reshape(-1, 2)


def _fit_marker_transform(fixed_points, moving_points, transform_type):
    transform_type = transform_type.lower()
    if transform_type == "translation":
        return transforms.estimate_translation(fixed_points, moving_points)
    if transform_type == "rigid":
        M = transforms.estimate_rigid(fixed_points, moving_points)
    elif transform_type == "affine":
        M = transforms.estimate_affine(fixed_points, moving_points)
    else:
        raise ValueError(f"Unsupported marker transform_type {transform_type!r}")
    if not np.all(np.isfinite(M)):
        raise ValueError("Marker registration points are degenerate.")
    return M


def _run_marker_ransac(
    fixed_points, moving_points, candidate_pairs, transform_type,
    ransac_max_error, ransac_min_inlier_ratio, ransac_min_inlier_factor,
    ransac_num_iterations, random_state,
):
    import itertools as it
    import math as _math

    ndim = fixed_points.shape[1]
    min_matches = _marker_min_matches(transform_type, ndim)
    min_inliers = max(
        min_matches, int(np.round(min_matches * ransac_min_inlier_factor))
    )
    if len(candidate_pairs) < min_inliers:
        raise ValueError(
            f"Not enough marker correspondences for RANSAC: need "
            f"{min_inliers}, got {len(candidate_pairs)}."
        )
    fixed_c = fixed_points[candidate_pairs[:, 0]]
    moving_c = moving_points[candidate_pairs[:, 1]]
    rng = np.random.default_rng(random_state)
    n = len(candidate_pairs)
    n_comb = _math.comb(n, min_matches)
    samples = (
        it.combinations(range(n), min_matches)
        if n_comb <= ransac_num_iterations
        else (
            rng.choice(n, size=min_matches, replace=False)
            for _ in range(ransac_num_iterations)
        )
    )

    best = None
    for sample in samples:
        sample = np.asarray(sample, dtype=int)
        try:
            M = _fit_marker_transform(
                fixed_c[sample], moving_c[sample], transform_type
            )
        except ValueError:
            continue
        res = np.linalg.norm(
            param_utils.transform_pts(fixed_c, M) - moving_c, axis=1
        )
        inliers = res <= ransac_max_error
        ni = int(inliers.sum())
        if ni == 0:
            key = (0.0, 0, -np.inf)
        else:
            mean_res = float(res[inliers].mean())
            quality = (ni / n) * max(0.0, 1.0 - mean_res / ransac_max_error)
            key = (quality, ni, -mean_res)
        if best is None or key > best[0]:
            best = (key, inliers)
    if best is None:
        raise ValueError("No marker transform model could be estimated.")

    inliers = best[1]
    ni = int(inliers.sum())
    if ni < min_inliers or ni / n < ransac_min_inlier_ratio:
        raise ValueError(
            f"Marker RANSAC did not find enough inliers ({ni}/{n})."
        )
    M = _fit_marker_transform(fixed_c[inliers], moving_c[inliers], transform_type)
    res = np.linalg.norm(
        param_utils.transform_pts(fixed_c, M) - moving_c, axis=1
    )
    inliers = res <= ransac_max_error
    ni = int(inliers.sum())
    if ni < min_inliers:
        raise ValueError(
            f"Refit marker transform lost inliers ({ni}/{n})."
        )
    mean_res = float(res[inliers].mean())
    quality = (ni / n) * max(0.0, 1.0 - mean_res / ransac_max_error)
    return M, quality


def _run_marker_icp(
    fixed_points, moving_points, initial_affine, initial_quality,
    transform_type, icp_max_error, icp_num_iterations, icp_tolerance,
):
    from scipy.spatial import cKDTree

    affine = np.asarray(initial_affine, dtype=float)
    quality = float(initial_quality)
    ndim = fixed_points.shape[1]
    min_matches = _marker_min_matches(transform_type, ndim)
    tree = cKDTree(moving_points)
    for _ in range(icp_num_iterations):
        tf = param_utils.transform_pts(fixed_points, affine)
        d, idx = tree.query(tf, k=1)
        inliers = d <= icp_max_error
        if int(inliers.sum()) < min_matches:
            break
        try:
            next_affine = _fit_marker_transform(
                fixed_points[inliers], moving_points[idx[inliers]],
                transform_type,
            )
        except ValueError:
            break
        mean_res = float(np.mean(d[inliers]))
        quality = (int(inliers.sum()) / len(fixed_points)) * max(
            0.0, 1.0 - mean_res / icp_max_error
        )
        delta = float(np.linalg.norm(next_affine - affine))
        affine = next_affine
        if delta <= icp_tolerance:
            break
    return affine, quality


def registration_marker_based(
    fixed_points,
    moving_points,
    transform_type: str = "rigid",
    num_neighbors: int = 3,
    redundancy: int = 1,
    descriptor_ratio: float = 3.0,
    descriptor_distance_threshold: Optional[float] = None,
    descriptor_threshold_scale: float = 1.0,
    ransac_max_error: float = 5.0,
    ransac_min_inlier_ratio: float = 0.1,
    ransac_min_inlier_factor: float = 3.0,
    ransac_num_iterations: int = 1000,
    icp: bool = False,
    icp_max_error: Optional[float] = None,
    icp_num_iterations: int = 50,
    icp_tolerance: float = 1e-6,
    random_state: int = 0,
    fail_on_error: bool = True,
):
    """Marker-based registration (BigStitcher RGLDM bead matching).

    Matches local sorted-distance descriptors between the point sets, removes
    inconsistent matches with RANSAC, optionally refines with ICP, and returns
    {'affine_matrix' (fixed -> moving world), 'quality'}.
    Reference: registration.py:1165-1379.
    """
    fixed_points = np.asarray(fixed_points, dtype=float)
    moving_points = np.asarray(moving_points, dtype=float)
    ndim = fixed_points.shape[1] if fixed_points.ndim == 2 else 2

    def fail(message):
        if fail_on_error:
            raise ValueError(message)
        warnings.warn(message, UserWarning, stacklevel=2)
        return {"affine_matrix": np.eye(ndim + 1), "quality": np.nan}

    try:
        if fixed_points.ndim != 2 or moving_points.ndim != 2:
            raise ValueError("Marker point arrays must be two-dimensional.")
        if fixed_points.shape[1] != moving_points.shape[1]:
            raise ValueError("Point sets must share dimensionality.")
        if not len(fixed_points) or not len(moving_points):
            raise ValueError("Marker point arrays must not be empty.")

        fv, fi = _marker_descriptors(fixed_points, num_neighbors, redundancy)
        mv, mi = _marker_descriptors(moving_points, num_neighbors, redundancy)
        if descriptor_distance_threshold is None:
            descriptor_distance_threshold = _marker_auto_threshold(
                fixed_points, moving_points, num_neighbors,
                descriptor_threshold_scale,
            )
        pairs = _match_descriptors(
            fv, fi, mv, mi, descriptor_ratio, descriptor_distance_threshold
        )
        affine, quality = _run_marker_ransac(
            fixed_points, moving_points, pairs, transform_type,
            ransac_max_error, ransac_min_inlier_ratio,
            ransac_min_inlier_factor, ransac_num_iterations, random_state,
        )
        if icp:
            affine, quality = _run_marker_icp(
                fixed_points, moving_points, affine, quality, transform_type,
                ransac_max_error if icp_max_error is None else icp_max_error,
                icp_num_iterations, icp_tolerance,
            )
        return {"affine_matrix": affine, "quality": quality}
    except ValueError as e:
        return fail(str(e))


def get_pairs_from_sample_masks(
    mask_sims,
    transform_key: str = si_utils.DEFAULT_TRANSFORM_KEY,
    fused_mask_spacing=None,
):
    """Pair discovery by fusing label masks and scanning touching labels
    (reference :3256-3292)."""
    from multiview_stitcher_tpu import fusion

    label_sims = [
        si_utils.get_sim_from_array(
            (np.asarray(m.data) > 0).astype(np.float32) * (i + 1),
            dims=m.dims,
            scale=si_utils.get_spacing_from_sim(m),
            translation=si_utils.get_origin_from_sim(m),
            affine=si_utils.get_affine_from_sim(m, transform_key),
            transform_key=transform_key,
        )
        for i, m in enumerate(mask_sims)
    ]
    if fused_mask_spacing is None:
        fused_mask_spacing = si_utils.get_spacing_from_sim(mask_sims[0])

    def nanmin_fusion(transformed_views):
        stacked = jnp.where(
            jnp.isnan(transformed_views) | (transformed_views == 0),
            jnp.inf,
            transformed_views,
        )
        out = jnp.min(stacked, axis=0)
        return jnp.where(jnp.isinf(out), 0.0, out)

    fused = fusion.fuse(
        label_sims,
        transform_key=transform_key,
        fusion_func=nanmin_fusion,
        output_spacing=fused_mask_spacing,
    )
    labels = np.asarray(fused.to_numpy()).astype(int)
    pairs = mv_graph.get_connected_labels(labels)
    return [tuple(sorted(p)) for p in pairs.tolist()], fused


def apply_recursive_dict(func, d):
    """Apply ``func`` to every leaf of a nested dict (reference
    registration.py:99)."""
    if isinstance(d, dict):
        return {k: apply_recursive_dict(func, v) for k, v in d.items()}
    return func(d)


# optional C++-backed registration plugins live in registration_plugins.py;
# re-exported here because the reference hosts them in registration
# (reference registration.py:2774/:3104)
from multiview_stitcher_tpu.registration_plugins import (  # noqa: E402,F401
    registration_ANTsPy,
    registration_ITKElastix,
)
