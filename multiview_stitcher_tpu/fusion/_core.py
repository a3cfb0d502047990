"""Fusion core.

TPU-native rebuild of the reference's ``fusion/_core.py``
(/root/reference/src/multiview_stitcher/fusion/_core.py, 2329 LoC). The
reference builds a dask graph with one ``fuse_np`` task per output chunk that
resamples every contributing tile (scipy/cupy affine_transform), computes
EDT-based blending weights and reduces them. Here the per-chunk hot loop is
one fused JAX computation (:func:`_fuse_chunk_kernel`): batched affine
resampling of all contributing view slabs + analytic blending-weight
resampling + cosine taper + normalized reduction, compiled once per plan and
vmappable over chunks. Planning (output geometry, chunk grids, tile->chunk
mapping, halo negotiation) is host-side numpy, mirroring the reference's
conventions exactly:

- pixel-center shape math ``floor((hi-lo)/spacing + 1e-9) + 1``
  (reference fusion/_core.py:1972-1992)
- tile->chunk mapping via AABB index arithmetic (:582-653)
- source windows back-projected per chunk with interpolation padding (:700)
- halo protocol: ``overlap_in_pixels``/``trim_overlap`` + func-declared
  ``required_overlap``/``required_source_shrinkage`` (:1193-1222)
"""

from __future__ import annotations

import json
import logging
import warnings
from functools import partial
from itertools import product
from typing import Callable, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from multiview_stitcher_tpu import msi_utils, mv_graph, param_utils, si_utils, weights
from multiview_stitcher_tpu.mv_graph import normalize_chunks
from multiview_stitcher_tpu.ops import resample as resample_ops
from multiview_stitcher_tpu.si_utils import Sim
from multiview_stitcher_tpu.utils import misc as misc_utils
from multiview_stitcher_tpu.utils import profiling

logger = logging.getLogger(__name__)

BoundingBox = Dict[str, Dict[str, Union[float, int]]]


# ---------------------------------------------------------------------------
# fusion reductions (reference fusion/_core.py:42-131)
# ---------------------------------------------------------------------------


def max_fusion(transformed_views):
    """Pixel-wise NaN-aware maximum over views."""
    xp = jnp if isinstance(transformed_views, jnp.ndarray) else np
    return xp.nanmax(transformed_views, axis=0)


def weighted_average_fusion(
    transformed_views, blending_weights, fusion_weights=None
):
    """Weighted average with (already normalized) blending weights."""
    xp = jnp if isinstance(transformed_views, jnp.ndarray) else np
    if fusion_weights is None:
        additive_weights = blending_weights
    else:
        additive_weights = weights.normalize_weights(
            blending_weights * fusion_weights
        )
    prod = transformed_views * additive_weights
    return xp.nansum(prod, axis=0).astype(transformed_views.dtype)


def simple_average_fusion(transformed_views):
    """Unweighted NaN-aware mean over views."""
    xp = jnp if isinstance(transformed_views, jnp.ndarray) else np
    n_valid = xp.sum(~xp.isnan(transformed_views), axis=0).astype(jnp.float32 if xp is jnp else np.float32)
    n_valid = xp.where(n_valid == 0, xp.nan, n_valid)
    return (xp.nansum(transformed_views, axis=0) / n_valid).astype(
        transformed_views.dtype
    )


_BUILTIN_FUSION_MODES = {}


def _register_builtin(func, mode):
    _BUILTIN_FUSION_MODES[func] = mode
    return func


_register_builtin(max_fusion, "max")
_register_builtin(weighted_average_fusion, "weighted_average")
_register_builtin(simple_average_fusion, "simple_average")


# ---------------------------------------------------------------------------
# output stack geometry (reference :1736-1992)
# ---------------------------------------------------------------------------


def calc_stack_properties_from_volume(volume, spacing):
    """(lower, upper) pixel-center extent + spacing -> shape/origin/spacing."""
    origin = np.asarray(volume[0], dtype=float)
    spacing = np.asarray(spacing, dtype=float)
    shape = (
        np.floor((np.asarray(volume[1]) - origin) / spacing + 1e-9).astype(
            np.int64
        )
        + 1
    )
    return {"shape": shape, "spacing": spacing, "origin": origin}


def get_transformed_stack_vertices(stack_keypoints, stack_properties_list, params):
    """Corner selectors (over pixel centers) through each view's param."""
    ndim = len(stack_properties_list[0]["spacing"])
    vertices = np.zeros((len(stack_properties_list), len(stack_keypoints), ndim))
    for iim, sp in enumerate(stack_properties_list):
        tmp = stack_keypoints * (np.array(sp["shape"]) - 1) * np.array(
            sp["spacing"]
        ) + np.array(sp["origin"])
        p = np.asarray(params[iim])
        vertices[iim] = tmp @ p[:ndim, :ndim].T + p[:ndim, ndim]
    return vertices


def calc_stack_properties_from_view_properties_and_params(
    views_props, params, spacing, mode="union"
):
    spatial_dims = ["z", "y", "x"][-len(spacing):]
    spacing = np.array([spacing[d] for d in spatial_dims], dtype=float)
    views_props = [
        {k: np.array([v[d] for d in spatial_dims]) for k, v in vp.items()
         if k in ("shape", "spacing", "origin")}
        for vp in views_props
    ]
    ndim = len(spacing)
    stack_vertices = np.array(list(np.ndindex(tuple([2] * ndim)))).astype(float)

    if mode == "sample":
        zero_z_face = stack_vertices[np.where(stack_vertices[:, 0] == 1)]
        zero_z_face[:, 2] = np.mean(zero_z_face[:, 2])
        tv = get_transformed_stack_vertices(zero_z_face, views_props, params)
        volume = (tv.min(1).min(0), tv.max(1).max(0))
    elif mode == "union":
        tv = get_transformed_stack_vertices(stack_vertices, views_props, params)
        volume = (tv.min(1).min(0), tv.max(1).max(0))
    elif mode == "intersection":
        tv = get_transformed_stack_vertices(stack_vertices, views_props, params)
        volume = (tv.min(1).max(0), tv.max(1).min(0))
    else:
        raise ValueError(mode)
    return calc_stack_properties_from_volume(volume, spacing)


def combine_stack_props(stack_props_list):
    """Combine per-timepoint stack props (reference :1901-1944)."""
    origin = np.min([sp["origin"] for sp in stack_props_list], axis=0)
    spacing = np.min([sp["spacing"] for sp in stack_props_list], axis=0)
    shape = (
        np.max(
            [
                np.floor(
                    (
                        sp["origin"]
                        + (sp["shape"] - 1) * sp["spacing"]
                        - origin
                    )
                    / spacing
                    + 1e-9
                )
                for sp in stack_props_list
            ],
            axis=0,
        ).astype(np.int64)
        + 1
    )
    return {"origin": origin, "spacing": spacing, "shape": shape}


def calc_fusion_stack_properties(sims, params, spacing, mode="union"):
    """Fusion output geometry from views + params (reference :1736)."""
    sdims = si_utils.get_spatial_dims_from_sim(sims[0])
    views_props = [
        si_utils.get_stack_properties_from_sim(sim, asarray=False)
        for sim in sims
    ]

    xparams = [param_utils.to_xaffine(p) for p in params]
    t_coords = None
    for p in xparams:
        if p.has_t and len(p.t_coords) > 1:
            t_coords = p.t_coords
            break

    if t_coords is not None:
        props = combine_stack_props(
            [
                calc_stack_properties_from_view_properties_and_params(
                    views_props,
                    [
                        p.sel_t(t).data if p.has_t else p.data
                        for p in xparams
                    ],
                    spacing=spacing,
                    mode=mode,
                )
                for t in t_coords
            ]
        )
    else:
        props = calc_stack_properties_from_view_properties_and_params(
            views_props,
            [p.matrix() for p in xparams],
            spacing=spacing,
            mode=mode,
        )

    return {
        k: {d: v[i] for i, d in enumerate(sdims)} for k, v in props.items()
    }


def process_output_stack_properties(
    sims,
    output_spacing=None,
    output_origin=None,
    output_shape=None,
    output_stack_properties=None,
    output_stack_mode="union",
    transform_key=None,
):
    if transform_key is None:
        raise ValueError("transform_key must be provided")
    params = [
        si_utils.get_affine_from_sim(sim, transform_key=transform_key)
        for sim in sims
    ]
    if output_stack_properties is None:
        if output_spacing is None:
            output_spacing = si_utils.get_spacing_from_sim(sims[0])
        output_stack_properties = calc_fusion_stack_properties(
            sims, params=params, spacing=output_spacing, mode=output_stack_mode
        )
        if output_origin is not None:
            output_stack_properties["origin"] = output_origin
        if output_shape is not None:
            output_stack_properties["shape"] = output_shape
    return output_stack_properties


# ---------------------------------------------------------------------------
# fused chunk kernel (the hot loop; reference fuse_np :1513-1733)
# ---------------------------------------------------------------------------


def _reduce_views(data_t, bw, out_shape, mode: str, use_bw: bool):
    """NaN-aware reduction over the leading view axis."""
    if use_bw:
        bw = weights.cosine_weights(bw)
        valid = ~jnp.isnan(data_t)
        bw = bw * valid
        # zero total weight with valid data (cosine taper hits exactly 0 at
        # the support border): fall back to the unweighted valid average so
        # border pixels keep their values instead of dropping to 0
        wsum = jnp.sum(bw, axis=0, keepdims=True)
        bw = jnp.where(wsum > 0, bw, valid.astype(bw.dtype))
        bw = weights.normalize_weights(bw)
    if mode == "weighted_average":
        fused = jnp.nansum(data_t * bw, axis=0)
    elif mode == "max":
        fused = jnp.nanmax(data_t, axis=0)
    elif mode == "simple_average":
        n_valid = jnp.sum(~jnp.isnan(data_t), axis=0).astype(jnp.float32)
        n_valid = jnp.where(n_valid == 0, jnp.nan, n_valid)
        fused = jnp.nansum(data_t, axis=0) / n_valid
    else:
        raise ValueError(mode)
    return fused, bw


@partial(jax.jit, static_argnames=("out_shape", "mode", "use_bw"))
def _fuse_chunk_tiles_kernel(
    tiles,       # (V, *T) float32, NaN-free (zero-filled)
    view_idx,    # (K,) int32 — which tile each slot resamples
    diags,       # (K, ndim) diagonal of chunk-pixel -> tile-pixel map
    offs,        # (K, ndim)
    wgrids,      # (K, 5..5) blending proxy grids
    wdiags,      # (K, ndim)
    woffs,       # (K, ndim)
    view_valid,  # (K,) bool
    out_shape: tuple,
    mode: str = "weighted_average",
    use_bw: bool = True,
):
    """Axis-aligned fused chunk kernel reading directly from full on-device
    tiles via separable banded-matmul resampling (MXU path; no slabs, no
    gathers). This is the hot kernel for translation-grid stitching."""
    ndim = len(out_shape)

    def per_view(vi, dg, off, wg, wdg, woff, vv):
        tile = tiles[vi]
        data = resample_ops.separable_axis_aligned_resample(
            tile, dg, off, out_shape, cval=jnp.nan
        )
        data = jnp.where(vv, data, jnp.nan)
        if use_bw:
            bw = resample_ops.separable_axis_aligned_resample(
                wg, wdg, woff, out_shape, cval=0.0
            )
            bw = jnp.where(vv, bw, 0.0)
        else:
            bw = jnp.zeros(out_shape, dtype=jnp.float32)
        return data, bw

    data_t, bw = jax.vmap(per_view)(
        view_idx, diags, offs, wgrids, wdiags, woffs, view_valid
    )
    fused, _ = _reduce_views(data_t, bw, out_shape, mode, use_bw)
    return jnp.nan_to_num(fused)


def _tiles_map_body(
    tiles, view_idx, diags, offs, wgrids, wdiags, woffs, view_valid,
    out_shape, mode, use_bw, out_dtype,
):
    tiles_f = tiles.astype(jnp.float32)

    def one_chunk(args):
        vi, dg, off, wg, wdg, woff, vv = args
        return _fuse_chunk_tiles_kernel(
            tiles_f, vi, dg, off, wg, wdg, woff, vv, out_shape, mode, use_bw
        ).astype(out_dtype)

    return jax.lax.map(
        one_chunk,
        (view_idx, diags, offs, wgrids, wdiags, woffs, view_valid),
    )


@partial(
    jax.jit,
    static_argnames=("out_shape", "mode", "use_bw", "out_dtype"),
)
def _fuse_chunks_tiles_map_kernel(
    tiles,       # (V, *T) original dtype
    view_idx,    # (C, K) int32
    diags,       # (C, K, ndim)
    offs,        # (C, K, ndim)
    wgrids,      # (C, K, 5..5)
    wdiags,      # (C, K, ndim)
    woffs,       # (C, K, ndim)
    view_valid,  # (C, K) bool
    out_shape: tuple,
    mode: str = "weighted_average",
    use_bw: bool = True,
    out_dtype=jnp.float32,
):
    """All chunks of a fusion plan in ONE dispatch: lax.map over the chunk
    axis of the tiles-resident fused kernel, casting to the output dtype on
    device. Minimizes host<->device round trips (critical for tunneled or
    remote accelerators) and compiles once per plan."""
    return _tiles_map_body(
        tiles, view_idx, diags, offs, wgrids, wdiags, woffs, view_valid,
        out_shape, mode, use_bw, out_dtype,
    )


@partial(
    jax.jit,
    static_argnames=("out_shape", "mode", "use_bw", "out_dtype", "mesh"),
)
def _fuse_chunks_tiles_map_kernel_sharded(
    tiles, view_idx, diags, offs, wgrids, wdiags, woffs, view_valid,
    out_shape: tuple,
    mode: str = "weighted_average",
    use_bw: bool = True,
    out_dtype=jnp.float32,
    mesh=None,
):
    """Multi-chip variant (SURVEY.md §2.4 P2): the chunk axis is sharded
    over the mesh's leading axis with ``shard_map`` — tiles are replicated,
    every device sweeps its disjoint chunk subset (no cross-device traffic;
    this mirrors the reference's embarrassingly-parallel block fusion,
    fusion/_core.py:2044). The chunk count must be a multiple of the mesh
    size (pad with all-invalid chunks)."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    body = partial(
        _tiles_map_body,
        out_shape=out_shape, mode=mode, use_bw=use_bw, out_dtype=out_dtype,
    )
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(),) + (P(axis),) * 7,
        out_specs=P(axis),
        check_vma=False,
    )(tiles, view_idx, diags, offs, wgrids, wdiags, woffs, view_valid)


@partial(
    jax.jit,
    static_argnames=("out_shape", "mode", "use_bw"),
)
def _fuse_chunk_kernel(
    slabs,        # (K, *S) float32, NaN-padded
    mats,         # (K, ndim, ndim) chunk pixel -> slab pixel
    offs,         # (K, ndim)
    wgrids,       # (K, 5..5) float32 blending proxy grids
    wmats,        # (K, ndim, ndim) chunk pixel -> grid pixel
    woffs,        # (K, ndim)
    view_valid,   # (K,) bool (padding views False)
    out_shape: tuple,
    mode: str = "weighted_average",
    use_bw: bool = True,
):
    """Resample all contributing views + blend in one compiled computation."""
    resample = lambda d, m, o: resample_ops.affine_resample(
        d, m, o, out_shape, order=1, cval=jnp.nan
    )
    data_t = jax.vmap(resample)(slabs.astype(jnp.float32), mats, offs)
    # invalidate padding views
    data_t = jnp.where(
        view_valid.reshape((-1,) + (1,) * len(out_shape)), data_t, jnp.nan
    )

    bw = None
    if use_bw:
        wresample = lambda g, m, o: resample_ops.affine_resample(
            g, m, o, out_shape, order=1, cval=0.0
        )
        bw = jax.vmap(wresample)(wgrids, wmats, woffs)
        bw = bw * view_valid.reshape((-1,) + (1,) * len(out_shape))

    fused, bw = _reduce_views(data_t, bw, out_shape, mode, use_bw)
    return fused, data_t, bw


def fuse_np(
    sims: Sequence[Sim],
    params,
    output_properties: BoundingBox,
    fusion_func: Callable = weighted_average_fusion,
    fusion_func_kwargs: Optional[dict] = None,
    weights_func: Optional[Callable] = None,
    weights_func_kwargs: Optional[dict] = None,
    trim_overlap_in_pixels=0,
    interpolation_order: int = 1,
    full_view_bbs=None,
    blending_widths=None,
    shrink_distance=0,
):
    """Fuse in-memory views into one output window (reference fuse_np :1513).

    This is the extension-API entry: custom ``fusion_func``/``weights_func``
    receive stacked arrays via the same signature-based dispatch as the
    reference (transformed_views / blending_weights / fusion_weights /
    params / output_spacing).
    """
    sdims = si_utils.get_spatial_dims_from_sim(sims[0])
    ndim = len(sdims)
    out_shape = tuple(int(output_properties["shape"][d]) for d in sdims)
    input_dtype = np.dtype(sims[0].dtype)

    fusion_func_kwargs = dict(fusion_func_kwargs or {})
    weights_func_kwargs = dict(weights_func_kwargs or {})

    needs_bw = misc_utils.has_keyword(
        fusion_func, "blending_weights"
    ) or misc_utils.has_keyword(weights_func, "blending_weights")

    param_mats = [
        np.asarray(param_utils.to_xaffine(p).squeeze()) for p in params
    ]
    param_mats = [m[0] if m.ndim == 3 else m for m in param_mats]

    if full_view_bbs is None:
        full_view_bbs = [
            si_utils.get_stack_properties_from_sim(sim) for sim in sims
        ]

    # pixel-space resample params per view
    mats, offs = [], []
    for sim, pm, view_bb in zip(sims, param_mats, full_view_bbs):
        m, o = resample_ops.physical_to_pixel_params(
            np.linalg.inv(pm),
            input_spacing=np.array([view_bb["spacing"][d] for d in sdims]),
            input_origin=si_utils.get_origin_from_sim(sim, asarray=True),
            output_spacing=np.array(
                [output_properties["spacing"][d] for d in sdims]
            ),
            output_origin=np.array(
                [output_properties["origin"][d] for d in sdims]
            ),
        )
        mats.append(m)
        offs.append(o)

    # pad slabs to a common static shape
    slab_shape = tuple(
        max(s.shape[i] for s in [sim.data for sim in sims])
        for i in range(ndim)
    )
    K = len(sims)
    slabs = np.full((K,) + slab_shape, np.nan, dtype=np.float32)
    for i, sim in enumerate(sims):
        arr = np.asarray(sim.data, dtype=np.float32)
        slabs[i][tuple(slice(0, s) for s in arr.shape)] = arr

    if needs_bw:
        wgrids, wmats, woffs = [], [], []
        for i in range(K):
            g, wm, wo = weights.blending_weights_pixel_params(
                output_properties,
                full_view_bbs[i],
                param_mats[i],
                blending_widths=blending_widths,
                shrink_distance=shrink_distance,
            )
            wgrids.append(g)
            wmats.append(wm)
            woffs.append(wo)
        wgrids = np.stack(wgrids)
        wmats = np.stack(wmats)
        woffs = np.stack(woffs)
    else:
        wgrids = np.zeros((K,) + (5,) * ndim, dtype=np.float32)
        wmats = np.stack([np.eye(ndim)] * K)
        woffs = np.zeros((K, ndim))

    builtin_mode = _BUILTIN_FUSION_MODES.get(fusion_func)
    use_kernel_reduction = builtin_mode is not None and weights_func is None and not fusion_func_kwargs

    fused, data_t, bw = _fuse_chunk_kernel(
        jnp.asarray(slabs),
        jnp.asarray(np.stack(mats), dtype=jnp.float32),
        jnp.asarray(np.stack(offs), dtype=jnp.float32),
        jnp.asarray(wgrids),
        jnp.asarray(wmats, dtype=jnp.float32),
        jnp.asarray(woffs, dtype=jnp.float32),
        jnp.ones((K,), dtype=bool),
        out_shape,
        mode=builtin_mode if use_kernel_reduction else "max",
        use_bw=needs_bw,
    )

    if not use_kernel_reduction:
        # extension path: hand stacked arrays to the user funcs
        fusion_func_kwargs["transformed_views"] = data_t
        if misc_utils.has_keyword(fusion_func, "params"):
            fusion_func_kwargs["params"] = params
        if needs_bw:
            fusion_func_kwargs["blending_weights"] = bw
        if (
            misc_utils.has_keyword(fusion_func, "output_spacing")
            and "output_spacing" not in fusion_func_kwargs
        ):
            fusion_func_kwargs["output_spacing"] = output_properties["spacing"]

        if weights_func is not None and misc_utils.has_keyword(
            fusion_func, "fusion_weights"
        ):
            weights_func_kwargs["transformed_views"] = data_t
            if misc_utils.has_keyword(weights_func, "params"):
                weights_func_kwargs["params"] = params
            if misc_utils.has_keyword(weights_func, "blending_weights"):
                weights_func_kwargs["blending_weights"] = bw
            if (
                misc_utils.has_keyword(weights_func, "output_chunksize")
                and "output_chunksize" not in weights_func_kwargs
            ):
                weights_func_kwargs["output_chunksize"] = output_properties["shape"]
            fusion_func_kwargs["fusion_weights"] = weights_func(
                **weights_func_kwargs
            )

        with warnings.catch_warnings():
            warnings.filterwarnings("ignore", category=RuntimeWarning)
            fused = fusion_func(**fusion_func_kwargs)

    # trim halo
    if not isinstance(trim_overlap_in_pixels, dict):
        trim_overlap_in_pixels = {d: trim_overlap_in_pixels for d in sdims}
    if any(trim_overlap_in_pixels[d] > 0 for d in sdims):
        fused = fused[
            tuple(
                slice(trim_overlap_in_pixels[d], -trim_overlap_in_pixels[d])
                if trim_overlap_in_pixels[d] > 0
                else slice(None)
                for d in sdims
            )
        ]

    fused = np.nan_to_num(np.asarray(fused)).astype(input_dtype)
    return fused


# ---------------------------------------------------------------------------
# spatial fusion plan (reference :536-745)
# ---------------------------------------------------------------------------


def _build_spatial_fusion_plan(
    *,
    sparams,          # list of (ndim+1, ndim+1) matrices per view
    views_bb,         # list of view stack props
    output_stack_properties,
    output_chunksize,
    output_chunk_bbs,
    output_chunk_bbs_with_overlap,
    block_indices,
    overlap_in_pixels,
    interpolation_order,
    sdims,
    extra_source_margin_in_pixels: int = 0,
):
    """Map each output chunk to its contributing views + source windows.

    ``extra_source_margin_in_pixels`` widens every source window: the shear
    fusion tier interpolates once per elementary pass, so its support
    spreads up to ~n_passes source pixels (vs the gather's
    ``interpolation_order``); windows must cover that spread or chunk-border
    outputs read zero padding."""
    ndim = len(sdims)
    inv_sparams = [np.linalg.inv(p) for p in sparams]

    normalized = normalize_chunks(
        [output_chunksize[d] for d in sdims],
        [output_stack_properties["shape"][d] for d in sdims],
    )
    n_blocks_per_dim = [len(c) for c in normalized]
    uniform_cs = [c[0] for c in normalized]
    osp_origin = np.array([output_stack_properties["origin"][d] for d in sdims])
    osp_spacing = np.array(
        [output_stack_properties["spacing"][d] for d in sdims]
    )
    overlap_phys = (
        np.array([overlap_in_pixels[d] for d in sdims]) * osp_spacing
    )

    chunk_to_tiles: dict = {}
    for iview, (p, view_bb) in enumerate(zip(sparams, views_bb)):
        pad_phys = overlap_phys + np.array(
            [
                (interpolation_order + extra_source_margin_in_pixels)
                * view_bb["spacing"][d]
                for d in sdims
            ]
        )
        corners = param_utils.transform_pts(
            mv_graph.get_vertices_from_stack_props(view_bb), p
        )
        aabb_min = corners.min(axis=0) - pad_phys
        aabb_max = corners.max(axis=0) + pad_phys

        idx_ranges = []
        skip = False
        for idim in range(ndim):
            cs_phys = uniform_cs[idim] * osp_spacing[idim]
            i_first = max(
                0, int(np.floor((aabb_min[idim] - osp_origin[idim]) / cs_phys))
            )
            i_last = min(
                n_blocks_per_dim[idim] - 1,
                int(np.floor((aabb_max[idim] - osp_origin[idim]) / cs_phys)),
            )
            if i_first > i_last:
                skip = True
                break
            idx_ranges.append(range(i_first, i_last + 1))
        if skip:
            continue
        for ci in product(*idx_ranges):
            chunk_to_tiles.setdefault(ci, []).append(iview)

    additional_extent = {
        d: int(interpolation_order) + int(extra_source_margin_in_pixels)
        for d in sdims
    }

    per_chunk_entries = []
    for chunk_bb, chunk_bb_ov, block_index in zip(
        output_chunk_bbs, output_chunk_bbs_with_overlap, block_indices
    ):
        chunk_views = []
        for iview in chunk_to_tiles.get(tuple(block_index), []):
            overlap = mv_graph.get_overlap_for_bbs(
                target_bb=chunk_bb_ov,
                query_bbs=[views_bb[iview]],
                param=inv_sparams[iview],
                additional_extent_in_pixels=additional_extent,
                param_is_inverse=True,
            )[0]
            if overlap is not None:
                chunk_views.append((iview, overlap))
        per_chunk_entries.append(
            {
                "views": chunk_views,
                "output_bb": chunk_bb,
                "output_bb_overlap": chunk_bb_ov,
                "block_index": tuple(int(i) for i in block_index),
            }
        )

    return {
        "sparams": sparams,
        "per_chunk_entries": per_chunk_entries,
    }


class _DeviceTileCache:
    """LRU cache of per-plan tile stacks resident on device.

    Repeated ``fuse()`` calls over the same views (parameter refinement,
    re-fusion at new grids, interactive use) should not re-pay the
    host->device upload — on tunneled/remote accelerators that upload
    dominates end-to-end fusion time. Keys identify the *source* arrays:
    in-memory tiles by object identity (a strong reference to each source
    array is held while cached, so ids cannot be recycled), lazy
    tensorstore-backed tiles by store spec. Entries also carry the tile
    maximum so downloads of fused outputs (bounded above by the input max
    for all builtin fusion modes) skip the device-side max probe.
    """

    def __init__(self, max_bytes=None):
        self._entries = {}  # key -> dict(dev, nbits, bytes, pins)
        self._order = []
        self.max_bytes = max_bytes

    def _budget(self):
        if self.max_bytes is not None:
            return self.max_bytes
        import os as _os

        return int(
            _os.environ.get("MVS_TPU_TILE_CACHE_BYTES", 2 << 30)
        )

    @staticmethod
    def _fingerprint(arr: np.ndarray) -> int:
        """Cheap content sample so in-place mutation of a cached source
        array invalidates the entry (identity alone would go stale)."""
        flat = arr.reshape(-1)
        step = max(1, flat.size // 4096)
        return hash(flat[::step].tobytes())

    @staticmethod
    def key_for(field_sims):
        parts = []
        for s in field_sims:
            data = s.data
            if isinstance(data, np.ndarray):
                parts.append(
                    ("np", id(data), data.ctypes.data, data.shape,
                     str(data.dtype), _DeviceTileCache._fingerprint(data))
                )
            elif isinstance(data, jnp.ndarray):
                parts.append(
                    ("jax", id(data), data.shape, str(data.dtype))
                )
            else:
                spec = None
                store = getattr(data, "_store", None)
                if store is not None:
                    try:
                        spec = store.spec().to_json()
                    except Exception:  # noqa: BLE001
                        spec = None
                if spec is None:
                    return None  # unidentifiable source: don't cache
                parts.append(
                    ("ts", json.dumps(spec, sort_keys=True),
                     tuple(data.shape), str(data.dtype))
                )
        return tuple(parts)

    def get(self, key):
        if key is None or key not in self._entries:
            return None
        self._order.remove(key)
        self._order.append(key)
        return self._entries[key]

    def put(self, key, dev, nbits, pins):
        if key is None:
            return
        nbytes = int(dev.size) * np.dtype(dev.dtype).itemsize
        budget = self._budget()
        if nbytes > budget:
            return
        while (
            self._order
            and sum(self._entries[k]["bytes"] for k in self._order) + nbytes
            > budget
        ):
            old = self._order.pop(0)
            del self._entries[old]
        self._entries[key] = {
            "dev": dev, "nbits": nbits, "bytes": nbytes, "pins": pins,
        }
        self._order.append(key)

    def clear(self):
        self._entries.clear()
        self._order.clear()


_device_tile_cache = _DeviceTileCache()

# module-wide fusion-plan LRU: geometry-identical fuse() calls reuse host
# planning AND the prepared kernel inputs the execution tiers stash on the
# plan dict (under "prep:*" keys)
_plan_cache: dict = {}
_PLAN_CACHE_MAX = 16


def _plan_cache_insert(key, plan):
    while len(_plan_cache) >= _PLAN_CACHE_MAX:
        _plan_cache.pop(next(iter(_plan_cache)))
    _plan_cache[key] = plan


def clear_device_tile_cache():
    """Drop all device-resident tile stacks, the streaming upload-resume
    stash, and cached fusion plans."""
    _device_tile_cache.clear()
    _plan_cache.clear()
    from multiview_stitcher_tpu.fusion import _streaming

    _streaming._upload_stash.clear()


@partial(jax.jit, static_argnames=("max_shape",))
def _pad_stack(views, max_shape):
    """Edge-pad views to a common shape and stack, on device.

    Edge replication (not zeros) matters for the shear tier: its
    interpolation support near a smaller tile's TRUE edge must read
    plausible values, matching the host slab path's ``mode="edge"`` pad
    (the analytic extents mask still voids outputs beyond the extent).
    The translation tiers mask by extents and are insensitive to the
    padding values.
    """
    padded = [
        jnp.pad(
            v,
            tuple((0, m - s) for s, m in zip(v.shape, max_shape)),
            mode="edge",
        )
        for v in views
    ]
    return jnp.stack(padded)


def _tiles_to_device(field_sims):
    """(device tile stack, nbits of the data or None) with caching.

    Uploads go through the bit-packing link codec
    (:mod:`multiview_stitcher_tpu.ops.link_codec`) in parallel streams; the
    resulting device array is cached across ``fuse()`` calls keyed on the
    source arrays.

    Mixed tile shapes are supported: views are grouped by shape, each group
    uploaded raw, then edge-padded to the common maximum shape ON DEVICE
    (host-side padding would inflate the transferred bytes) and reassembled
    in view order. Per-view validity stays exact through the kernels'
    ``extents`` arrays; edge replication keeps the shear tier's
    interpolation support consistent with the host slab path.
    """
    from multiview_stitcher_tpu.ops import link_codec

    key = _DeviceTileCache.key_for(field_sims)
    hit = _device_tile_cache.get(key)
    if hit is not None:
        return hit["dev"], hit["nbits"]

    shapes = [tuple(int(x) for x in s.data.shape) for s in field_sims]
    uniform = len(set(shapes)) == 1

    def put(arr):
        if np.issubdtype(arr.dtype, np.floating):
            arr = np.nan_to_num(arr)
        nbits = None
        if link_codec.is_packable(arr.dtype):
            mx = int(arr.max(initial=0))
            mn = int(arr.min(initial=0)) if np.issubdtype(
                arr.dtype, np.signedinteger
            ) else 0
            nbits = 16 if mn < 0 else link_codec.nbits_for_max(mx)
            return link_codec.put_packed(arr, nbits=nbits), nbits
        return jax.device_put(arr), None

    if uniform:
        tiles_dev, nbits = put(_materialize_tiles(field_sims))
    else:
        max_shape = tuple(
            max(s[i] for s in shapes) for i in range(len(shapes[0]))
        )
        groups: dict = {}
        for i, shp in enumerate(shapes):
            groups.setdefault(shp, []).append(i)
        parts, nbits = {}, None
        for shp, idxs in groups.items():
            dev, nb = put(
                _materialize_tiles([field_sims[i] for i in idxs])
            )
            for slot, i in enumerate(idxs):
                parts[i] = (dev, slot)
            if nb is not None:
                nbits = nb if nbits is None else max(nbits, nb)

        tiles_dev = _pad_stack(
            tuple(parts[i][0][parts[i][1]] for i in range(len(field_sims))),
            max_shape=max_shape,
        )
    pins = [
        s.data for s in field_sims
        if isinstance(s.data, (np.ndarray, jnp.ndarray))
    ]
    _device_tile_cache.put(key, tiles_dev, nbits, pins)
    return tiles_dev, nbits


def _materialize_tiles(field_sims) -> np.ndarray:
    """(V, *tile) array from equal-shape tiles, reading lazy tiles in
    parallel (tensorstore releases the GIL; serial np.stack over 1000+ lazy
    tiles pays per-tile read latency).

    Lazy reads retry transient failures (HTTP-backed zarr stores can drop
    connections mid-fuse; the reference retries server disconnects in its
    materialization path, spatial_image_utils max_retries) with a short
    exponential backoff, ``MVS_TPU_READ_RETRIES`` times (default 2).
    """
    V = len(field_sims)
    shape = tuple(field_sims[0].data.shape)
    dtype = np.dtype(field_sims[0].data.dtype)
    out = np.empty((V,) + shape, dtype=dtype)
    lazy = [not isinstance(s.data, (np.ndarray, jnp.ndarray)) for s in field_sims]
    if any(lazy):
        import time as _time
        from concurrent.futures import ThreadPoolExecutor

        import os as _os

        max_retries = int(_os.environ.get("MVS_TPU_READ_RETRIES", "2"))

        def _is_transient(e):
            # tensorstore surfaces transient statuses (UNAVAILABLE,
            # DEADLINE_EXCEEDED, HTTP disconnects) as ValueError with the
            # status name in the message, not as OSError
            if isinstance(e, (OSError, ConnectionError, TimeoutError)):
                return True
            if isinstance(e, ValueError):
                msg = str(e)
                return any(
                    k in msg
                    for k in (
                        "UNAVAILABLE", "DEADLINE_EXCEEDED", "ABORTED",
                        "RESOURCE_EXHAUSTED", "connection", "disconnect",
                        "reset by peer", "timed out",
                    )
                )
            return False

        def fetch(i):
            for attempt in range(max_retries + 1):
                try:
                    out[i] = np.asarray(field_sims[i].data[...])
                    return
                except Exception as e:  # noqa: BLE001 — filtered below
                    # transient IO only (HTTP zarr drops, tensorstore
                    # status-carrying ValueErrors); deterministic bugs
                    # (shape/dtype/KeyError) must surface immediately
                    if attempt == max_retries or not _is_transient(e):
                        raise
                    logger.warning(
                        "lazy tile read %d failed (%s: %s), retry %d/%d",
                        i, type(e).__name__, e, attempt + 1, max_retries,
                    )
                    _time.sleep(0.2 * 2**attempt)

        with ThreadPoolExecutor(max_workers=16) as ex:
            list(ex.map(fetch, range(V)))
    else:
        for i, s in enumerate(field_sims):
            out[i] = np.asarray(s.data)
    return out


def _slab_from_sim(sim: Sim, window_bb: BoundingBox):
    """Extract the integer pixel window of ``window_bb`` from a tile."""
    sdims = si_utils.get_spatial_dims_from_sim(sim)
    origin = si_utils.get_origin_from_sim(sim)
    spacing = si_utils.get_spacing_from_sim(sim)
    starts, stops = [], []
    for d in sdims:
        start = int(round((window_bb["origin"][d] - origin[d]) / spacing[d]))
        start = max(0, start)
        stop = min(int(sim.sizes[d]), start + int(window_bb["shape"][d]))
        starts.append(start)
        stops.append(stop)
    data = sim.data[tuple(slice(a, b) for a, b in zip(starts, stops))]
    slab_origin = {
        d: origin[d] + starts[i] * spacing[d] for i, d in enumerate(sdims)
    }
    return np.asarray(data), slab_origin


# ---------------------------------------------------------------------------
# fuse() top-level (reference :782)
# ---------------------------------------------------------------------------


def fuse(
    images: Sequence = None,
    transform_key: str = None,
    fusion_func: Callable = weighted_average_fusion,
    fusion_func_kwargs: Optional[dict] = None,
    weights_func: Optional[Callable] = None,
    weights_func_kwargs: Optional[dict] = None,
    output_spacing: Optional[Dict[str, float]] = None,
    output_stack_mode: str = "union",
    output_origin: Optional[Dict[str, float]] = None,
    output_shape: Optional[Dict[str, int]] = None,
    output_stack_properties: Optional[BoundingBox] = None,
    output_chunksize: Optional[Union[int, Dict[str, int]]] = None,
    overlap_in_pixels: Optional[Union[int, Dict[str, int]]] = None,
    trim_overlap: bool = True,
    interpolation_order: int = 1,
    blending_widths: Optional[Dict[str, float]] = None,
    output_zarr_url: Optional[str] = None,
    zarr_options: Optional[dict] = None,
    batch_options: Optional[dict] = None,
    backend: Optional[str] = None,
    output_on_backend: bool = False,
    sims: Optional[Sequence] = None,
    mesh=None,
):
    """Fuse input views into a single image (reference fusion/_core.py:782).

    Eager TPU execution: the output is computed chunk by chunk through the
    fused resample+blend kernel (or streamed into zarr when
    ``output_zarr_url`` is given). Returns a Sim (or Msim for msim inputs).

    ``backend``: the reference's numpy/cupy seam; here the accelerator is
    always JAX, so only "numpy"/"jax"/None are accepted. With
    ``output_on_backend=True`` the in-memory result stays a device (jax)
    array instead of being copied to host.

    ``mesh``: a ``jax.sharding.Mesh`` to shard the output-chunk axis across
    devices (tiles replicated, each device fuses a disjoint chunk subset —
    SURVEY.md §2.4 P2). Applies to the axis-aligned whole-tiles execution
    tier; see also ``parallel.pipeline`` for lower-level sharded kernels.
    """
    if backend not in (None, "numpy", "jax"):
        raise ValueError(
            f"Unsupported backend {backend!r}: the TPU build computes on "
            "JAX; use backend=None and output_on_backend to control the "
            "result placement."
        )
    if images is None:
        if sims is None:
            raise TypeError("fuse() missing required argument 'images'")
        warnings.warn(
            "The fuse(..., sims=...) parameter is deprecated; use "
            "images=... instead.",
            DeprecationWarning,
            stacklevel=2,
        )
        images = sims
    elif sims is not None:
        raise TypeError(
            "fuse() got both 'images' and deprecated 'sims'. "
            "Use only 'images'."
        )
    if not len(images):
        raise ValueError("images must contain at least one image.")

    input_is_msim = [msi_utils.is_msim(im) for im in images]
    if any(input_is_msim) and not all(input_is_msim):
        raise ValueError(
            "All input images must be of the same kind (all sims or all msims)."
        )

    if all(input_is_msim):
        return _fuse_msims(
            images,
            transform_key=transform_key,
            fusion_func=fusion_func,
            fusion_func_kwargs=fusion_func_kwargs,
            weights_func=weights_func,
            weights_func_kwargs=weights_func_kwargs,
            output_spacing=output_spacing,
            output_stack_mode=output_stack_mode,
            output_origin=output_origin,
            output_shape=output_shape,
            output_stack_properties=output_stack_properties,
            output_chunksize=output_chunksize,
            overlap_in_pixels=overlap_in_pixels,
            trim_overlap=trim_overlap,
            interpolation_order=interpolation_order,
            blending_widths=blending_widths,
            output_zarr_url=output_zarr_url,
            zarr_options=zarr_options,
        )

    sims_in: List[Sim] = list(images)
    sdims = si_utils.get_spatial_dims_from_sim(sims_in[0])
    nsdims = si_utils.get_nonspatial_dims_from_sim(sims_in[0])
    ndim = len(sdims)

    # spatial-only views for output geometry
    field_sims0 = [
        si_utils.sim_sel_coords(
            sim, {nd: sim.coords[nd][0] for nd in nsdims}
        )
        if nsdims
        else sim
        for sim in sims_in
    ]
    output_stack_properties = process_output_stack_properties(
        field_sims0,
        output_spacing=output_spacing,
        output_origin=output_origin,
        output_shape=output_shape,
        output_stack_properties=output_stack_properties,
        output_stack_mode=output_stack_mode,
        transform_key=transform_key,
    )
    output_stack_properties = {
        "shape": {d: int(output_stack_properties["shape"][d]) for d in sdims},
        "spacing": {
            d: float(output_stack_properties["spacing"][d]) for d in sdims
        },
        "origin": {
            d: float(output_stack_properties["origin"][d]) for d in sdims
        },
    }

    output_chunksize = process_output_chunksize(sims_in, output_chunksize)

    # halo negotiation (reference :1193-1222)
    required_overlap = misc_utils.get_required_overlap(
        fusion_func, fusion_func_kwargs or {}
    )
    if weights_func is not None:
        wreq = misc_utils.get_required_overlap(
            weights_func,
            dict(weights_func_kwargs or {}, output_chunksize=output_chunksize),
        )
        required_overlap = max(
            np.max(list(wreq.values())) if isinstance(wreq, dict) else wreq,
            np.max(list(required_overlap.values()))
            if isinstance(required_overlap, dict)
            else required_overlap,
        )
    if overlap_in_pixels is None:
        overlap_in_pixels = required_overlap
    if not isinstance(overlap_in_pixels, dict):
        overlap_in_pixels = {d: int(overlap_in_pixels) for d in sdims}
    overlap_in_pixels = {
        d: int(min(overlap_in_pixels[d], output_chunksize[d])) for d in sdims
    }

    shrink_distance = misc_utils.get_required_source_shrinkage(
        fusion_func, fusion_func_kwargs or {}
    )

    # iterate non-spatial coords
    ns_coord_lists = {
        nd: np.asarray(sims_in[0].coords[nd]) for nd in nsdims
    }
    for nd, vals in ns_coord_lists.items():
        if len(np.unique(vals)) != len(vals):
            # selection is by coord value; duplicates would silently fuse
            # the first match into every duplicate slot (e.g. t-concat of
            # timepoints that both read back as t=0)
            raise ValueError(
                f"duplicate {nd!r} coordinates {vals.tolist()} in the "
                "fusion input; give each entry a distinct coordinate "
                f"(e.g. sim.coords[{nd!r}] = range(n)) before fusing."
            )
    ns_combos = (
        list(product(*[ns_coord_lists[nd] for nd in nsdims]))
        if nsdims
        else [()]
    )

    # trim_overlap=False keeps each chunk's halo in the assembled output
    # (reference fuse(trim_overlap=False): chunk i contributes
    # chunk_shape+2*overlap pixels, diagnostic/halo-aware layout)
    untrimmed = (not trim_overlap) and any(
        overlap_in_pixels[d] > 0 for d in sdims
    )
    if untrimmed:
        normalized_untrimmed = normalize_chunks(
            [output_chunksize[d] for d in sdims],
            [output_stack_properties["shape"][d] for d in sdims],
        )
        spatial_out_shape = tuple(
            sum(c + 2 * overlap_in_pixels[d] for c in chunks_d)
            for d, chunks_d in zip(sdims, normalized_untrimmed)
        )
    else:
        spatial_out_shape = tuple(
            output_stack_properties["shape"][d] for d in sdims
        )
    out_full_shape = tuple(
        len(ns_coord_lists[nd]) for nd in nsdims
    ) + spatial_out_shape
    out_dtype = np.dtype(sims_in[0].dtype)

    zarr_options = dict(zarr_options or {})
    streaming = output_zarr_url is not None
    if streaming:
        # stream fused chunks straight into the zarr store — per-chunk region
        # writes, nothing assembled in memory (reference fusion/_core.py:2044)
        from multiview_stitcher_tpu.io import zarr_backend

        ome_zarr = zarr_options.get("ome_zarr", True)
        level0_url = (
            f"{output_zarr_url}/0" if ome_zarr else str(output_zarr_url)
        )
        if untrimmed:
            # per-chunk extended regions side by side: make each zarr chunk
            # one extended region so the region writes stay chunk-aligned
            # (the reference's zarr branch supports trim_overlap=False the
            # same way, fusion/_core.py:1068-1170)
            zarr_chunks = tuple(1 for _ in nsdims) + tuple(
                min(
                    output_chunksize[d] + 2 * overlap_in_pixels[d],
                    spatial_out_shape[i],
                )
                for i, d in enumerate(sdims)
            )
        else:
            zarr_chunks = tuple(1 for _ in nsdims) + tuple(
                min(output_chunksize[d], output_stack_properties["shape"][d])
                for d in sdims
            )
        if zarr_options.get("create_output", True):
            output_array = zarr_backend.create_zarr_array(
                level0_url,
                shape=out_full_shape,
                chunks=zarr_chunks,
                dtype=out_dtype,
                zarr_format=2
                if zarr_options.get("ngff_version", "0.4") == "0.4"
                else 3,
                overwrite=zarr_options.get("overwrite", True),
                **(zarr_options.get("zarr_array_creation_kwargs") or {}),
            )
        else:
            output_array = zarr_backend.attach_zarr_array(level0_url)
    else:
        output_array = np.zeros(out_full_shape, dtype=out_dtype)

    for combo in ns_combos:
        sel = dict(zip(nsdims, combo))
        field_sims = [
            si_utils.sim_sel_coords(sim, sel) if sel else sim
            for sim in sims_in
        ]
        params = [
            si_utils.get_affine_from_sim(sim, transform_key=transform_key)
            for sim in field_sims
        ]
        param_mats = []
        for p in params:
            m = np.asarray(p.squeeze())
            param_mats.append(m[0] if m.ndim == 3 else m)

        # plans are cached module-wide: repeated fuse() calls over the same
        # geometry (params + view grids + output grid + chunking) skip the
        # host-side chunk planning entirely
        plan_key = (
            tuple(np.asarray(m).tobytes() for m in param_mats),
            tuple(
                (
                    tuple(s.data.shape),
                    tuple(
                        float(si_utils.get_spacing_from_sim(s)[d])
                        for d in sdims
                    ),
                    tuple(
                        float(si_utils.get_origin_from_sim(s)[d])
                        for d in sdims
                    ),
                )
                for s in field_sims
            ),
            json.dumps(output_stack_properties, sort_keys=True, default=float),
            tuple(sorted(output_chunksize.items())),
            tuple(sorted(overlap_in_pixels.items())),
            int(interpolation_order),
            _shear_source_margin(len(sdims)),
        )
        if plan_key not in _plan_cache:
            with profiling.stage("fuse.plan"):
                views_bb = [
                    si_utils.get_stack_properties_from_sim(s)
                    for s in field_sims
                ]
                chunk_bbs, block_indices = mv_graph.get_chunk_bbs(
                    output_stack_properties, output_chunksize
                )
                chunk_bbs_ov = [
                    _extend_bb(bb, overlap_in_pixels) for bb in chunk_bbs
                ]
                _plan_cache_insert(plan_key, _build_spatial_fusion_plan(
                    sparams=param_mats,
                    views_bb=views_bb,
                    output_stack_properties=output_stack_properties,
                    output_chunksize=output_chunksize,
                    output_chunk_bbs=chunk_bbs,
                    output_chunk_bbs_with_overlap=chunk_bbs_ov,
                    block_indices=block_indices,
                    overlap_in_pixels=overlap_in_pixels,
                    interpolation_order=interpolation_order,
                    sdims=sdims,
                    extra_source_margin_in_pixels=_shear_source_margin(
                        len(sdims)
                    ),
                ))
        plan = _plan_cache[plan_key]

        ns_idx = tuple(
            int(np.where(ns_coord_lists[nd] == c)[0][0])
            for nd, c in zip(nsdims, combo)
        )
        _execute_fusion_plan(
            plan,
            field_sims,
            output_stack_properties,
            sdims,
            fusion_func=fusion_func,
            fusion_func_kwargs=fusion_func_kwargs,
            weights_func=weights_func,
            weights_func_kwargs=weights_func_kwargs,
            overlap_in_pixels=overlap_in_pixels,
            trim_overlap=trim_overlap,
            interpolation_order=interpolation_order,
            blending_widths=blending_widths,
            shrink_distance=shrink_distance,
            out_dtype=out_dtype,
            out_sink=_PrefixedSink(output_array, ns_idx),
            mesh=mesh,
            output_chunksize=output_chunksize,
        )

    if streaming:
        from multiview_stitcher_tpu.io import ngff_utils, zarr_backend

        if untrimmed:
            # the stored layout is per-chunk extended regions side by side;
            # metadata describes that grid (origin anchored at the first
            # halo pixel, like the in-memory untrimmed sim)
            sink_stack_properties = {
                "shape": {
                    d: int(spatial_out_shape[i]) for i, d in enumerate(sdims)
                },
                "spacing": dict(output_stack_properties["spacing"]),
                "origin": {
                    d: output_stack_properties["origin"][d]
                    - overlap_in_pixels[d]
                    * output_stack_properties["spacing"][d]
                    for d in sdims
                },
            }
        else:
            sink_stack_properties = output_stack_properties
        if zarr_options.get("ome_zarr", True):
            ngff_utils.finalize_ome_zarr_levels(
                output_zarr_url,
                dims=tuple(nsdims) + tuple(sdims),
                stack_properties=sink_stack_properties,
                ngff_version=zarr_options.get("ngff_version", "0.4"),
                c_coords=ns_coord_lists.get("c"),
            )
            out_sim = ngff_utils.read_sim_from_ome_zarr(output_zarr_url)
        else:
            arr = zarr_backend.open_zarr_array(str(output_zarr_url))
            out_sim = si_utils.to_spatial_image(
                arr,
                dims=tuple(nsdims) + tuple(sdims),
                scale=sink_stack_properties["spacing"],
                translation=sink_stack_properties["origin"],
                t_coords=ns_coord_lists.get("t"),
                c_coords=ns_coord_lists.get("c"),
            )
    else:
        if output_on_backend:
            output_array = jnp.asarray(output_array)
        out_translation = dict(output_stack_properties["origin"])
        if untrimmed:
            # first chunk's extended origin (the layout is per-chunk
            # extended tiles side by side; a single world grid no longer
            # describes it — the origin anchors the first halo pixel)
            for d in sdims:
                out_translation[d] -= (
                    overlap_in_pixels[d]
                    * output_stack_properties["spacing"][d]
                )
        out_sim = si_utils.to_spatial_image(
            output_array,
            dims=tuple(nsdims) + tuple(sdims),
            scale=output_stack_properties["spacing"],
            translation=out_translation,
            t_coords=ns_coord_lists.get("t"),
            c_coords=ns_coord_lists.get("c"),
        )
    si_utils.set_sim_affine(
        out_sim,
        param_utils.identity_transform(
            ndim, t_coords=ns_coord_lists.get("t")
        ),
        transform_key=transform_key,
    )
    return out_sim


class _PrefixedSink:
    """Maps spatial-slice writes onto a larger (t/c-prefixed) output array
    (numpy or a region-writable zarr handle)."""

    def __init__(self, array, prefix_idx):
        self.array = array
        self.prefix = tuple(prefix_idx)

    def __setitem__(self, slices, value):
        if not isinstance(slices, tuple):
            slices = (slices,)
        self.array[self.prefix + slices] = value


def _untrimmed_axis_positions(plan, sdims, overlap_in_pixels):
    """Per-axis start offsets of each chunk's EXTENDED region in the
    untrimmed (trim_overlap=False) output layout, where chunk i occupies
    core_shape_i + 2*overlap pixels side by side."""
    sizes = [dict() for _ in sdims]
    for e in plan["per_chunk_entries"]:
        for i, d in enumerate(sdims):
            sizes[i][e["block_index"][i]] = int(e["output_bb"]["shape"][d])
    pos = []
    for i, d in enumerate(sdims):
        cum, acc = {}, 0
        for bi in sorted(sizes[i]):
            cum[bi] = acc
            acc += sizes[i][bi] + 2 * overlap_in_pixels[d]
        pos.append(cum)
    return pos


def _extend_bb(bb: BoundingBox, overlap_in_pixels: Dict[str, int]) -> BoundingBox:
    return {
        "origin": {
            d: bb["origin"][d] - overlap_in_pixels[d] * bb["spacing"][d]
            for d in bb["origin"]
        },
        "shape": {
            d: bb["shape"][d] + 2 * overlap_in_pixels[d] for d in bb["shape"]
        },
        "spacing": dict(bb["spacing"]),
    }


@partial(jax.jit, static_argnames=("out_shape", "mode", "use_bw"))
def _fuse_chunk_batch_kernel(
    slabs, mats, offs, wgrids, wmats, woffs, view_valid, out_shape, mode, use_bw
):
    """vmap of :func:`_fuse_chunk_kernel` over a leading chunk axis,
    returning only the fused result (data_t/bw stay fused into the kernel)."""

    def one(s, m, o, wg, wm, wo, vv):
        fused, _, _ = _fuse_chunk_kernel(
            s, m, o, wg, wm, wo, vv, out_shape, mode, use_bw
        )
        return jnp.nan_to_num(fused)

    return jax.vmap(one)(slabs, mats, offs, wgrids, wmats, woffs, view_valid)


@partial(
    jax.jit,
    static_argnames=(
        "out_shape", "win", "wwin", "tile", "mode", "use_bw", "kind3d",
        "interpret",
    ),
)
def _fuse_chunk_batch_kernel_exact(
    slabs,        # (B, K, *S) float32, NaN-padded
    mats,         # (B, K, ndim, ndim) chunk pixel -> slab pixel
    offs,         # (B, K, ndim)
    extents,      # (B, K, ndim) f32 TRUE slab extents
    wgrids,       # (B, K, 5..5) blending proxy grids
    wmats,        # (B, K, ndim, ndim)
    woffs,        # (B, K, ndim)
    view_valid,   # (B, K) bool
    out_shape: tuple,
    win: tuple,   # static data-resample window sizes (plan_windows_*)
    wwin: tuple,  # static weight-grid window sizes
    tile: tuple,  # static Pallas output tile
    mode: str = "weighted_average",
    use_bw: bool = True,
    kind3d: str = "sepy",
    interpret: bool = False,
):
    """EXACT-affine variant of :func:`_fuse_chunk_batch_kernel`: the
    per-(chunk, view) resamples run through the banded-hat Pallas kernels
    (ops/exact_affine.py — scipy-parity, no gathers); the NaN-aware blend
    stays in XLA. Default tier for rotated multiview fuse() on TPU.

    ``kind3d`` picks the 3D kernel: "sepy" (y-decoupled family, fastest)
    or "general" (any affine — the affine-groupwise-resolution family,
    VERDICT r4 items 3-4)."""
    from multiview_stitcher_tpu.ops import exact_affine as ea

    B, K = slabs.shape[:2]
    ndim = len(out_shape)
    BK = B * K
    mats_f = mats.reshape(BK, ndim, ndim)
    offs_f = offs.reshape(BK, ndim)
    if ndim == 2:
        data_t = ea.exact_affine_batch_2d(
            slabs.reshape((BK,) + slabs.shape[2:]),
            mats_f, offs_f, extents.reshape(BK, ndim),
            out_shape, tile=tile, HW=win[0], WW=win[1],
            cval=jnp.nan, interpret=interpret,
        )
    elif kind3d == "general":
        data_t = ea.exact_affine_batch_3d_general(
            slabs.reshape((BK,) + slabs.shape[2:]),
            mats_f, offs_f, extents.reshape(BK, ndim),
            out_shape, tile=tile, ZS=win[0], YB=win[1], XS=win[2],
            cval=jnp.nan, interpret=interpret,
        )
    else:
        data_t = ea.exact_affine_batch_3d_sepy(
            slabs.reshape((BK,) + slabs.shape[2:]),
            mats_f, offs_f, extents.reshape(BK, ndim),
            out_shape, tile=tile, ZS=win[0], XS=win[1], YW=win[2],
            cval=jnp.nan, interpret=interpret,
        )
    data_t = data_t.reshape((B, K) + out_shape)
    data_t = jnp.where(
        view_valid.reshape((B, K) + (1,) * ndim), data_t, jnp.nan
    )

    bw = None
    if use_bw:
        grid_ext = jnp.full((BK, ndim), 5.0, jnp.float32)
        wmats_f = wmats.reshape(BK, ndim, ndim)
        woffs_f = woffs.reshape(BK, ndim)
        wg = wgrids.reshape((BK,) + wgrids.shape[2:]).astype(jnp.float32)
        if ndim == 2:
            bw = ea.exact_affine_batch_2d(
                wg, wmats_f, woffs_f, grid_ext,
                out_shape, tile=tile, HW=wwin[0], WW=wwin[1],
                cval=0.0, interpret=interpret,
            )
        elif kind3d == "general":
            bw = ea.exact_affine_batch_3d_general(
                wg, wmats_f, woffs_f, grid_ext,
                out_shape, tile=tile, ZS=wwin[0], YB=wwin[1], XS=wwin[2],
                cval=0.0, interpret=interpret,
            )
        else:
            bw = ea.exact_affine_batch_3d_sepy(
                wg, wmats_f, woffs_f, grid_ext,
                out_shape, tile=tile, ZS=wwin[0], XS=wwin[1], YW=wwin[2],
                cval=0.0, interpret=interpret,
            )
        bw = bw.reshape((B, K) + out_shape)
        bw = bw * view_valid.reshape((B, K) + (1,) * ndim)

    def one(d, b):
        fused, _ = _reduce_views(d, b, out_shape, mode, use_bw)
        return jnp.nan_to_num(fused)

    if use_bw:
        return jax.vmap(one)(data_t, bw)
    return jax.vmap(lambda d: one(d, None))(data_t)


@partial(
    jax.jit,
    static_argnames=(
        "S_max", "out_shape", "win", "wwin", "tile", "mode", "use_bw",
        "kind3d", "interpret",
    ),
)
def _fuse_chunk_batch_kernel_exact_devtiles(
    tiles,        # (V, *T) device-resident tile stack (any dtype)
    tile_idx,     # (B, K) int32 view index per chunk slot (0 for padding)
    starts,       # (B, K, ndim) int32 slab window starts (pre-clamped)
    mats, offs, extents, wgrids, wmats, woffs, view_valid,
    S_max, out_shape, win, wwin, tile, mode, use_bw,
    kind3d="sepy", interpret=False,
):
    """Exact-tier batch kernel reading slabs from a DEVICE-RESIDENT tile
    stack via dynamic_slice — repeated rotated fuse() calls skip the
    host->device slab uploads entirely (same _DeviceTileCache regime as
    the translation and shear tiers)."""
    ndim = len(out_shape)
    tiles_f = tiles.astype(jnp.float32)
    if jnp.issubdtype(tiles.dtype, jnp.floating):
        tiles_f = jnp.nan_to_num(tiles_f)
    pad = [(0, max(0, S_max[i] - int(tiles.shape[1 + i])))
           for i in range(ndim)]
    if any(p[1] for p in pad):
        tiles_f = jnp.pad(tiles_f, [(0, 0)] + pad, mode="edge")

    def slice_one(idx, st):
        return jax.lax.dynamic_slice(
            tiles_f[idx], [st[i] for i in range(ndim)], S_max
        )

    slabs = jax.vmap(jax.vmap(slice_one))(tile_idx, starts)
    return _fuse_chunk_batch_kernel_exact(
        slabs, mats, offs, extents, wgrids, wmats, woffs, view_valid,
        out_shape, win, wwin, tile, mode, use_bw, kind3d=kind3d,
        interpret=interpret,
    )


def _shear_tier_enabled() -> bool:
    """MVS_TPU_SHEAR: '1' force on, '0' off, 'auto' (default) = on when the
    default backend is TPU. The shear tier trades scipy-exactness for
    MXU-class speed (ops/shear.py docstring); CPU test runs keep the exact
    gather as oracle. Since the EXACT Pallas affine tier
    (ops/exact_affine.py) became the default for rotated maps, 'auto'
    shear only runs when the exact tier is ineligible (fully general 3D
    affines); '1' forces shear ahead of the exact tier."""
    import os as _os

    mode = _os.environ.get("MVS_TPU_SHEAR", "auto")
    if mode == "1":
        return True
    if mode == "auto":
        return jax.default_backend() == "tpu"
    return False


def _exact_affine_tier_enabled() -> bool:
    """MVS_TPU_EXACT_AFFINE: '1' force on (tests use interpret mode on
    CPU), '0' off, 'auto' (default) = on when the default backend is TPU.
    Exact bi/trilinear at affine positions via banded-hat matmuls
    (ops/exact_affine.py) — scipy-parity AND MXU-fast, the default for
    rotated multiview fuse() (VERDICT r3 item 3)."""
    import os as _os

    mode = _os.environ.get("MVS_TPU_EXACT_AFFINE", "auto")
    if mode == "1":
        return True
    if mode == "auto":
        return jax.default_backend() == "tpu"
    return False


def _shear_source_margin(ndim: int) -> int:
    """Extra source-window pixels when the shear tier may run: its
    interpolation support spreads ~1 source pixel per elementary pass
    (2D: 3 passes, 3D: 7), vs the gather tier's single pixel."""
    return (2 * ndim + 1) if _shear_tier_enabled() else 0


@partial(
    jax.jit,
    static_argnames=("plan", "wplan", "out_shape", "mode", "use_bw"),
)
def _fuse_chunk_kernel_shear(
    slabs,        # (K, *S) float32, NaN-padded (zero-filled in kernel)
    coeffs,       # (K, P, 3) shear pass coefficients (ops/shear.py)
    mats,         # (K, ndim, ndim) chunk pixel -> slab pixel (mask only)
    offs,         # (K, ndim)
    extents,      # (K, ndim) float32 TRUE slab extents
    wgrids,       # (K, 5..5) blending proxy grids
    wcoeffs,      # (K, Pw, 3)
    wmats,        # (K, ndim, ndim)
    woffs,        # (K, ndim)
    view_valid,   # (K,) bool
    plan,         # static ShearPlan for the data maps
    wplan,        # static ShearPlan for the weight-grid maps (or None)
    out_shape: tuple,
    mode: str = "weighted_average",
    use_bw: bool = True,
):
    """Shear-tier variant of :func:`_fuse_chunk_kernel`: banded-matmul
    resampling (MXU) instead of gathers. Slab NaN padding is zero-filled —
    validity comes from the analytic domain mask of the ORIGINAL map, so
    out-of-domain outputs are exactly NaN as in the gather tier."""
    from multiview_stitcher_tpu.ops import shear as shear_ops

    ndim = len(out_shape)
    data = jnp.nan_to_num(slabs.astype(jnp.float32))
    fn = lambda d, c, m, o, ex: shear_ops.shear_resample(
        d, c, m, o, ex, plan, jnp.nan
    )
    data_t = jax.vmap(fn)(data, coeffs, mats, offs, extents)
    data_t = jnp.where(
        view_valid.reshape((-1,) + (1,) * ndim), data_t, jnp.nan
    )

    bw = None
    if use_bw:
        # exact 4x refinement of the 5^ndim proxy grids keeps the
        # multi-pass interpolation error negligible on the coarse grids;
        # wcoeffs/wmats/woffs are in REFINED grid coordinates (4x) and the
        # refined extent is 4*(5-1)+1 = 17 per axis
        wg = jax.vmap(lambda g: shear_ops.refine_grid(g, 4))(
            wgrids.astype(jnp.float32)
        )
        wext = jnp.full_like(extents, 17.0)
        wfn = lambda g, c, m, o, ex: shear_ops.shear_resample(
            g, c, m, o, ex, wplan, 0.0
        )
        bw = jax.vmap(wfn)(wg, wcoeffs, wmats, woffs, wext)
        bw = bw * view_valid.reshape((-1,) + (1,) * ndim)

    fused, bw = _reduce_views(data_t, bw, out_shape, mode, use_bw)
    return fused, data_t, bw


@partial(
    jax.jit,
    static_argnames=("plan", "wplan", "out_shape", "mode", "use_bw"),
)
def _fuse_chunk_batch_kernel_shear(
    slabs, coeffs, mats, offs, extents, wgrids, wcoeffs, wmats, woffs,
    view_valid, plan, wplan, out_shape, mode, use_bw
):
    """vmap of :func:`_fuse_chunk_kernel_shear` over a leading chunk axis."""

    def one(s, c, m, o, ex, wg, wc, wm, wo, vv):
        fused, _, _ = _fuse_chunk_kernel_shear(
            s, c, m, o, ex, wg, wc, wm, wo, vv, plan, wplan, out_shape,
            mode, use_bw,
        )
        return jnp.nan_to_num(fused)

    return jax.vmap(one)(
        slabs, coeffs, mats, offs, extents, wgrids, wcoeffs, wmats, woffs,
        view_valid,
    )


@partial(
    jax.jit,
    static_argnames=("S_max", "plan", "wplan", "out_shape", "mode",
                     "use_bw"),
)
def _fuse_chunk_batch_kernel_shear_devtiles(
    tiles,        # (V, *T) device-resident tile stack (any dtype)
    tile_idx,     # (B, K) int32 view index per chunk slot (0 for padding)
    starts,       # (B, K, ndim) int32 slab window starts (pre-clamped)
    coeffs, mats, offs, extents, wgrids, wcoeffs, wmats, woffs,
    view_valid, S_max, plan, wplan, out_shape, mode, use_bw,
):
    """Shear-tier batch kernel reading slabs from a DEVICE-RESIDENT tile
    stack via dynamic_slice — repeated affine fuse() calls skip the
    host->device slab uploads entirely (the tile stack rides the
    _DeviceTileCache like the translation tiers)."""
    from multiview_stitcher_tpu.ops import shear as shear_ops

    ndim = len(out_shape)
    tiles_f = tiles.astype(jnp.float32)
    if jnp.issubdtype(tiles.dtype, jnp.floating):
        tiles_f = jnp.nan_to_num(tiles_f)
    # guarantee every S_max window fits: edge-replicate beyond the stack
    pad = [(0, max(0, S_max[i] - int(tiles.shape[1 + i])))
           for i in range(ndim)]
    if any(p[1] for p in pad):
        tiles_f = jnp.pad(tiles_f, [(0, 0)] + pad, mode="edge")

    def one_chunk(idx_k, st_k, c_k, m_k, o_k, ex_k, wg_k, wc_k, wm_k,
                  wo_k, vv_k):
        def one_view(idx, st, c, m, o, ex):
            slab = jax.lax.dynamic_slice(
                tiles_f[idx], [st[i] for i in range(ndim)], S_max
            )
            return shear_ops.shear_resample(
                slab, c, m, o, ex, plan, jnp.nan
            )

        data_t = jax.vmap(one_view)(idx_k, st_k, c_k, m_k, o_k, ex_k)
        data_t = jnp.where(
            vv_k.reshape((-1,) + (1,) * ndim), data_t, jnp.nan
        )
        bw = None
        if use_bw:
            wg = jax.vmap(lambda g: shear_ops.refine_grid(g, 4))(
                wg_k.astype(jnp.float32)
            )
            wext = jnp.full_like(ex_k, 17.0)
            wfn = lambda g, c2, m2, o2, ex2: shear_ops.shear_resample(
                g, c2, m2, o2, ex2, wplan, 0.0
            )
            bw = jax.vmap(wfn)(wg, wc_k, wm_k, wo_k, wext)
            bw = bw * vv_k.reshape((-1,) + (1,) * ndim)
        fused, _ = _reduce_views(data_t, bw, out_shape, mode, use_bw)
        return jnp.nan_to_num(fused)

    return jax.vmap(one_chunk)(
        tile_idx, starts, coeffs, mats, offs, extents, wgrids, wcoeffs,
        wmats, woffs, view_valid,
    )


def _kernel_tile_shape(ndim: int):
    """Pallas output-tile shape: (256, 256) 2D / (8, 128, 256) 3D, or the
    MVS_TPU_PALLAS_TILE_{2D,3D} env override (comma-separated)."""
    import os as _os

    env = _os.environ.get(f"MVS_TPU_PALLAS_TILE_{ndim}D")
    if env:
        return tuple(int(x) for x in env.split(","))
    return (256, 256) if ndim == 2 else (8, 128, 256)


def _plan_is_translation(sparams, ndim) -> bool:
    for p in sparams:
        lin = np.asarray(p)[:ndim, :ndim]
        if not np.allclose(lin, np.eye(ndim), atol=1e-12):
            return False
    return True


def _views_output_scale(field_sims, output_stack_properties, sdims):
    """Per-dim static output-pixel -> view-pixel scale for the Pallas
    translation kernels, or None when ineligible.

    Eligible when every view shares one spacing (the kernels take a single
    static per-dim scale; mixed-resolution mosaics fall to the XLA tiers),
    the scale is <= 8 per dim (VMEM window grows ~linearly with scale) and,
    in 3D, the z scale is an integer (keeps the kernel's z lerp a static
    strided slice)."""
    osp = np.array(
        [float(output_stack_properties["spacing"][d]) for d in sdims]
    )
    sp0 = si_utils.get_spacing_from_sim(field_sims[0])
    sp0 = np.array([float(sp0[d]) for d in sdims])
    for s in field_sims[1:]:
        sp = si_utils.get_spacing_from_sim(s)
        if not np.allclose([sp[d] for d in sdims], sp0, rtol=1e-6):
            return None
    scale = osp / sp0
    # snap near-unit / near-integer scales so the common cases hit the
    # specialized (faster, exact) kernel paths
    scale = np.where(np.abs(scale - np.round(scale)) < 1e-9,
                     np.round(scale), scale)
    if np.any(scale > 8.0) or np.any(scale <= 0.0):
        return None
    if len(sdims) == 3 and float(scale[0]) != int(scale[0]):
        return None
    return tuple(float(x) for x in scale)


def _views_output_scales_per_view(field_sims, output_stack_properties, sdims):
    """(V, ndim) per-view output-pixel -> view-pixel scales for the
    mixed-resolution Pallas path (views at DIFFERENT spacings fused onto
    one output grid — the reference handles per-view spacing transparently
    via transform_sim, transformation.py:15), or None when any view's
    scale falls outside the kernels' window budget. Unlike the uniform
    path, the z scale may be any float (banded z-lerp)."""
    osp = np.array(
        [float(output_stack_properties["spacing"][d]) for d in sdims]
    )
    scales = np.zeros((len(field_sims), len(sdims)))
    for v, s in enumerate(field_sims):
        sp = si_utils.get_spacing_from_sim(s)
        sc = osp / np.array([float(sp[d]) for d in sdims])
        sc = np.where(np.abs(sc - np.round(sc)) < 1e-9, np.round(sc), sc)
        if np.any(sc > 8.0) or np.any(sc <= 0.0):
            return None
        scales[v] = sc
    return scales


def translation_kernel_params(
    plan, views_bb, output_stack_properties, sdims,
    blending_widths, shrink_distance, scale_arr=None,
):
    """Per-view translation-kernel parameter tables shared by the
    monolithic Pallas tier and the banded streaming driver: pixel offsets,
    true extents, and the 5^ndim blending proxy grids with their pixel
    maps. Raises ValueError when a view's pixel map diag disagrees with
    the uniform ``scale_arr`` (caller falls back to the XLA tiers)."""
    ndim = len(sdims)
    V = len(views_bb)
    osp_origin = np.array(
        [output_stack_properties["origin"][d] for d in sdims]
    )
    osp_spacing = np.array(
        [output_stack_properties["spacing"][d] for d in sdims]
    )
    offs = np.zeros((V, ndim), dtype=np.float32)
    extents = np.zeros((V, ndim), dtype=np.float32)
    wdiags = np.zeros((V, ndim), dtype=np.float32)
    woffs = np.zeros((V, ndim), dtype=np.float32)
    wgrids = np.zeros((V,) + (5,) * ndim, dtype=np.float32)
    for v in range(V):
        pm = plan["sparams"][v]
        m, o = resample_ops.physical_to_pixel_params(
            np.linalg.inv(pm),
            input_spacing=np.array(
                [views_bb[v]["spacing"][d] for d in sdims]
            ),
            input_origin=np.array(
                [views_bb[v]["origin"][d] for d in sdims]
            ),
            output_spacing=osp_spacing,
            output_origin=osp_origin,
        )
        if scale_arr is not None:
            expect = (
                scale_arr[v] if np.ndim(scale_arr) == 2 else scale_arr
            )
            if not np.allclose(np.diag(m), expect, rtol=1e-6):
                raise ValueError(
                    "per-view pixel map diag disagrees with the expected "
                    "scale; falling back to the XLA tiers"
                )
        offs[v] = o
        extents[v] = [views_bb[v]["shape"][d] for d in sdims]
        g, wm, wo = weights.blending_weights_pixel_params(
            output_stack_properties,
            views_bb[v],
            pm,
            blending_widths=blending_widths,
            shrink_distance=shrink_distance,
        )
        wgrids[v] = g
        wdiags[v] = np.diag(wm)
        woffs[v] = wo
    return offs, extents, wdiags, woffs, wgrids


def _pallas_fused_sharded(
    tiles_dev, view_idx, offs, extents, wdiags, woffs, wgrids,
    out_shape_full, tile_shape, K, interpret, out_dtype, mesh,
    scale=None,
    scales=None,
):
    """Multi-chip Pallas tier (SURVEY.md §2.4 P2): the output is band-split
    along the leading spatial dim over the mesh's leading axis; every device
    runs the translation kernel on its band via the kernel's integer
    ``origin`` support (tiles replicated, zero cross-device traffic — the
    same embarrassingly-parallel decomposition as the sharded XLA tiles
    tier)."""
    from jax.sharding import PartitionSpec as P

    from multiview_stitcher_tpu.ops import pallas_fusion

    ndim = len(out_shape_full)
    axis = mesh.axis_names[0]
    N = int(mesh.shape[axis])
    T0 = tile_shape[0]
    n_t0 = view_idx.shape[0]
    pad_t0 = (-n_t0) % N
    if pad_t0:
        view_idx = np.concatenate(
            [
                view_idx,
                np.full(
                    (pad_t0,) + view_idx.shape[1:], -1, dtype=np.int32
                ),
            ]
        )
    b_t0 = (n_t0 + pad_t0) // N
    band_shape = (b_t0 * T0,) + tuple(
        -(-int(out_shape_full[d]) // tile_shape[d]) * tile_shape[d]
        for d in range(1, ndim)
    )
    origins = np.zeros((N, ndim), dtype=np.int32)
    origins[:, 0] = np.arange(N) * b_t0 * T0
    fuse_fn = (
        pallas_fusion.fuse_translation_2d
        if ndim == 2
        else pallas_fusion.fuse_translation_3d
    )

    if scale is None:
        scale = (1,) * ndim if ndim == 3 else (1.0,) * ndim

    per_view = scales is not None
    scales_rep = (
        jnp.asarray(scales, jnp.float32)
        if per_view
        else jnp.zeros((offs.shape[0], ndim), jnp.float32)
    )

    def body(tiles, vi, org, offs_, exts, wd, wo, wg, scs):
        return fuse_fn(
            tiles, vi, offs_, exts, wd, wo, wg,
            out_shape=band_shape, tile_shape=tile_shape, K=K,
            interpret=interpret, out_dtype=out_dtype,
            origin=org[0], scale=scale,
            scales=scs if per_view else None,
        )

    fused = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis)) + (P(),) * 6,
        out_specs=P(axis),
        check_vma=False,
    )(
        tiles_dev,
        jnp.asarray(view_idx, dtype=jnp.int32),
        jnp.asarray(origins),
        jnp.asarray(offs, dtype=jnp.float32),
        jnp.asarray(extents, dtype=jnp.float32),
        jnp.asarray(wdiags, dtype=jnp.float32),
        jnp.asarray(woffs, dtype=jnp.float32),
        jnp.asarray(wgrids, dtype=jnp.float32),
        scales_rep,
    )
    return fused[tuple(slice(0, int(s)) for s in out_shape_full)]


def _execute_fusion_plan_pallas(
    plan,
    field_sims,
    output_stack_properties,
    sdims,
    *,
    blending_widths,
    shrink_distance,
    out_dtype,
    out_sink=None,
    tile_shape=None,
    mesh=None,
    scale=None,
    scales=None,
):
    """Translation layouts on TPU: the whole output in ONE Pallas kernel
    call with per-tile view lists (see ops/pallas_fusion; 2D and 3D).
    ``scale`` is the static per-dim output-pixel -> view-pixel scale
    (non-unit when fusing at a coarser/finer output spacing); ``scales``
    is the (V, ndim) per-view variant for mixed-resolution mosaics."""
    from multiview_stitcher_tpu.ops import pallas_fusion

    ndim = len(sdims)
    if tile_shape is None:
        tile_shape = _kernel_tile_shape(ndim)
    out_shape_full = tuple(
        int(output_stack_properties["shape"][d]) for d in sdims
    )
    V = len(field_sims)
    views_bb = [si_utils.get_stack_properties_from_sim(s) for s in field_sims]
    osp_origin = np.array(
        [output_stack_properties["origin"][d] for d in sdims]
    )
    osp_spacing = np.array(
        [output_stack_properties["spacing"][d] for d in sdims]
    )
    if scale is None and scales is None:
        scale = _views_output_scale(
            field_sims, output_stack_properties, sdims
        )
        if scale is None:
            scales = _views_output_scales_per_view(
                field_sims, output_stack_properties, sdims
            )
        if scale is None and scales is None:
            raise ValueError(
                "Pallas tier needs per-view view->output scales <= 8"
            )
    if scales is not None:
        # static per-dim MAX bounds the kernels' VMEM window sizes
        scale = tuple(float(x) for x in np.max(scales, axis=0))
        scale_arr = np.asarray(scales, dtype=np.float64)  # (V, ndim)
    else:
        scale_arr = np.asarray(scale, dtype=np.float64)

    # prepared kernel inputs are cached on the plan (geometry-keyed): a
    # repeated fuse() over the same plan skips this entire host loop
    prep_key = (
        "prep:pallas", tuple(tile_shape), tuple(scale),
        None if scales is None else scales.tobytes(),
        json.dumps(blending_widths, sort_keys=True, default=float),
        json.dumps(shrink_distance, sort_keys=True, default=float),
    )
    prep = plan.get(prep_key)
    if prep is None:
        offs, extents, wdiags, woffs, wgrids = translation_kernel_params(
            plan, views_bb, output_stack_properties, sdims,
            blending_widths, shrink_distance, scale_arr,
        )

        # per-kernel-tile view lists via AABB index arithmetic
        n_t = [
            -(-out_shape_full[d] // tile_shape[d]) for d in range(ndim)
        ]
        tile_lists = {}
        for v in range(V):
            # view v covers output pixels o with 0 <= scale*o + off <= ext-1
            sc_v = scale_arr[v] if scale_arr.ndim == 2 else scale_arr
            lo = -offs[v] / sc_v - 1
            hi = (extents[v] - offs[v]) / sc_v + 1
            ranges = []
            empty = False
            for d in range(ndim):
                a0 = max(0, int(np.floor(lo[d] / tile_shape[d])))
                a1 = min(n_t[d] - 1, int(np.floor(hi[d] / tile_shape[d])))
                if a0 > a1:
                    empty = True
                    break
                ranges.append(range(a0, a1 + 1))
            if empty:
                continue
            for idx in product(*ranges):
                tile_lists.setdefault(idx, []).append(v)
        K = max(1, max((len(v) for v in tile_lists.values()), default=1))
        view_idx = np.full(tuple(n_t) + (K,), -1, dtype=np.int32)
        for idx, vs in tile_lists.items():
            for s, v in enumerate(vs):
                view_idx[idx + (s,)] = v
        prep = plan[prep_key] = {
            "offs": offs, "extents": extents, "wdiags": wdiags,
            "woffs": woffs, "wgrids": wgrids, "view_idx": view_idx, "K": K,
        }
    offs, extents, wdiags, woffs, wgrids, view_idx, K = (
        prep["offs"], prep["extents"], prep["wdiags"], prep["woffs"],
        prep["wgrids"], prep["view_idx"], prep["K"],
    )

    # keep the native dtype on the host link (bit-packed: ~10-12 bits/voxel
    # for camera data); the kernel wrapper pads + casts to f32 on device.
    # The device tile stack is cached across fuse() calls.
    tiles_dev, nbits = _tiles_to_device(field_sims)

    interpret = jax.devices()[0].platform == "cpu"
    kscale = tuple(scale)
    if ndim == 3:
        # per-view mode: ceil bounds the window; the kernel reads the true
        # per-view float z scale from SMEM
        kscale = (
            int(np.ceil(kscale[0])) if scales is not None
            else int(kscale[0]),
        ) + kscale[1:]
    kscales = None if scales is None else np.asarray(scales, np.float32)
    if mesh is not None and mesh.size > 1:
        fused = _pallas_fused_sharded(
            tiles_dev, view_idx, offs, extents, wdiags, woffs, wgrids,
            out_shape_full, tile_shape, K, interpret,
            np.dtype(out_dtype), mesh, kscale, scales=kscales,
        )
    else:
        fuse_fn = (
            pallas_fusion.fuse_translation_2d
            if ndim == 2
            else pallas_fusion.fuse_translation_3d
        )
        fused = fuse_fn(
            tiles_dev, view_idx, offs, extents,
            wdiags, woffs, wgrids,
            out_shape=out_shape_full, tile_shape=tile_shape, K=K,
            interpret=interpret,
            out_dtype=np.dtype(out_dtype),
            scale=kscale,
            scales=kscales,
        )
    # fetch through the packing codec in parallel bands; the fused output of
    # every builtin mode is bounded by the input maximum, so the cached
    # input nbits applies and no device-side max probe is needed
    return _fetch_fused_to_sink(
        fused, out_sink, out_shape_full, out_dtype, nbits
    )


def _fetch_fused_to_sink(fused, out_sink, out_shape_full, out_dtype, nbits):
    """Download a fused device array into the output sink via the link
    codec (packed parallel bands), minimizing host-side copies.

    Returns the sink if one was given, else a fresh host array.
    """
    from multiview_stitcher_tpu.ops import link_codec

    out_shape_full = tuple(int(s) for s in out_shape_full)
    full = tuple(slice(0, s) for s in out_shape_full)
    buf = None
    if out_sink is None:
        buf = np.empty(out_shape_full, dtype=out_dtype)
    elif isinstance(out_sink, np.ndarray) and out_sink.shape == out_shape_full:
        buf = out_sink if out_sink.flags.c_contiguous else None
    elif (
        isinstance(out_sink, _PrefixedSink)
        and isinstance(out_sink.array, np.ndarray)
    ):
        view = out_sink.array[out_sink.prefix]
        if view.shape == out_shape_full and view.flags.c_contiguous:
            buf = view
    direct = buf is not None
    if not direct:
        buf = np.empty(out_shape_full, dtype=out_dtype)
    try:
        link_codec.fetch_packed(fused, out=buf, nbits=nbits)
    except Exception:  # noqa: BLE001
        buf[...] = np.asarray(fused)
    if out_sink is not None and not direct:
        out_sink[full] = buf
    return out_sink if out_sink is not None else buf


def _plan_is_axis_aligned(sparams, ndim) -> bool:
    for p in sparams:
        lin = np.asarray(p)[:ndim, :ndim]
        if not np.allclose(lin, np.diag(np.diag(lin)), atol=1e-12):
            return False
        if np.any(np.diag(lin) <= 0):
            return False
    return True


def _execute_fusion_plan_tiles(
    plan,
    field_sims,
    output_stack_properties,
    sdims,
    *,
    mode,
    use_bw,
    blending_widths,
    shrink_distance,
    out_dtype,
    out_sink=None,
    mesh=None,
):
    """Axis-aligned fast path: full tiles live on device once; each chunk is
    fused by the separable banded-matmul kernel reading tiles directly (no
    slab extraction, no per-chunk host->device image traffic)."""
    ndim = len(sdims)
    out_shape_full = tuple(output_stack_properties["shape"][d] for d in sdims)
    out = out_sink if out_sink is not None else np.zeros(out_shape_full, dtype=out_dtype)
    views_bb = [si_utils.get_stack_properties_from_sim(s) for s in field_sims]

    entries = [e for e in plan["per_chunk_entries"] if e["views"]]
    if not entries:
        return out

    # upload tiles once (packed parallel streams; cached across fuse calls),
    # in their native dtype (cast to f32 on device)
    tiles_dev, nbits = _tiles_to_device(field_sims)

    K_max = max(len(e["views"]) for e in entries)
    O_max = tuple(
        max(int(e["output_bb_overlap"]["shape"][d]) for e in entries)
        for d in sdims
    )

    osp_spacing = np.array(
        [output_stack_properties["spacing"][d] for d in sdims]
    )

    C = len(entries)
    prep_key = (
        "prep:tiles", O_max, bool(use_bw),
        json.dumps(blending_widths, sort_keys=True, default=float),
        json.dumps(shrink_distance, sort_keys=True, default=float),
    )
    prep = plan.get(prep_key)
    if prep is None:
        view_idx = np.zeros((C, K_max), dtype=np.int32)
        diags = np.ones((C, K_max, ndim), dtype=np.float32)
        offs = np.zeros((C, K_max, ndim), dtype=np.float32)
        wgrids = np.zeros((C, K_max) + (5,) * ndim, dtype=np.float32)
        wdiags = np.ones((C, K_max, ndim), dtype=np.float32)
        woffs = np.zeros((C, K_max, ndim), dtype=np.float32)
        valid = np.zeros((C, K_max), dtype=bool)

        for ci, entry in enumerate(entries):
            chunk_bb_ov = entry["output_bb_overlap"]
            kernel_bb = {
                "origin": dict(chunk_bb_ov["origin"]),
                "spacing": dict(chunk_bb_ov["spacing"]),
                "shape": {d: O_max[i] for i, d in enumerate(sdims)},
            }
            for vi, (iview, _window) in enumerate(entry["views"]):
                pm = plan["sparams"][iview]
                m, o = resample_ops.physical_to_pixel_params(
                    np.linalg.inv(pm),
                    input_spacing=np.array(
                        [views_bb[iview]["spacing"][d] for d in sdims]
                    ),
                    input_origin=np.array(
                        [views_bb[iview]["origin"][d] for d in sdims]
                    ),
                    output_spacing=osp_spacing,
                    output_origin=np.array(
                        [kernel_bb["origin"][d] for d in sdims]
                    ),
                )
                view_idx[ci, vi] = iview
                diags[ci, vi] = np.diag(m)
                offs[ci, vi] = o
                valid[ci, vi] = True
                if use_bw:
                    g, wm, wo = weights.blending_weights_pixel_params(
                        kernel_bb,
                        views_bb[iview],
                        pm,
                        blending_widths=blending_widths,
                        shrink_distance=shrink_distance,
                    )
                    wgrids[ci, vi] = g
                    wdiags[ci, vi] = np.diag(wm)
                    woffs[ci, vi] = wo
        prep = plan[prep_key] = {
            "view_idx": view_idx, "diags": diags, "offs": offs,
            "wgrids": wgrids, "wdiags": wdiags, "woffs": woffs,
            "valid": valid,
        }
    view_idx, diags, offs, wgrids, wdiags, woffs, valid = (
        prep["view_idx"], prep["diags"], prep["offs"], prep["wgrids"],
        prep["wdiags"], prep["woffs"], prep["valid"],
    )

    if mesh is not None and mesh.size > 1:
        # pad the chunk axis to a mesh multiple with all-invalid chunks;
        # rows >= C are never fetched below
        pad = (-C) % mesh.size
        if pad:
            view_idx = np.concatenate(
                [view_idx, np.zeros((pad, K_max), view_idx.dtype)]
            )
            diags, offs, wgrids, wdiags, woffs, valid = (
                np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)])
                for a in (diags, offs, wgrids, wdiags, woffs, valid)
            )
        fused_all = _fuse_chunks_tiles_map_kernel_sharded(
            tiles_dev,
            jnp.asarray(view_idx),
            jnp.asarray(diags),
            jnp.asarray(offs),
            jnp.asarray(wgrids),
            jnp.asarray(wdiags),
            jnp.asarray(woffs),
            jnp.asarray(valid),
            O_max,
            mode,
            use_bw,
            np.dtype(out_dtype),
            mesh,
        )
    else:
        fused_all = _fuse_chunks_tiles_map_kernel(
            tiles_dev,
            jnp.asarray(view_idx),
            jnp.asarray(diags),
            jnp.asarray(offs),
            jnp.asarray(wgrids),
            jnp.asarray(wdiags),
            jnp.asarray(woffs),
            jnp.asarray(valid),
            O_max,
            mode,
            use_bw,
            np.dtype(out_dtype),
        )
    # per-chunk fetch + sink write pipelined in a thread pool: remote/
    # tunneled devices serve concurrent transfer streams faster than one
    # large copy, and disjoint-region writes (numpy slices or tensorstore
    # chunk-aligned regions) are thread-safe; fall back to a single
    # transfer + serial writes if the backend rejects concurrent reads
    from concurrent.futures import ThreadPoolExecutor

    def write_chunk(entry, fused):
        chunk_bb = entry["output_bb"]
        chunk_bb_ov = entry["output_bb_overlap"]
        core_off = [
            int(
                round(
                    (chunk_bb["origin"][d] - chunk_bb_ov["origin"][d])
                    / chunk_bb_ov["spacing"][d]
                )
            )
            for d in sdims
        ]
        core = tuple(
            slice(off, off + int(chunk_bb["shape"][d]))
            for off, d in zip(core_off, sdims)
        )
        starts = [
            int(
                round(
                    (
                        chunk_bb["origin"][d]
                        - output_stack_properties["origin"][d]
                    )
                    / output_stack_properties["spacing"][d]
                )
            )
            for d in sdims
        ]
        out_slices = tuple(
            slice(s, s + int(chunk_bb["shape"][d]))
            for s, d in zip(starts, sdims)
        )
        out[out_slices] = np.asarray(fused)[core].astype(out_dtype)

    try:
        if mesh is None or mesh.size <= 1:
            # one packed parallel-band download of all chunks, then
            # threaded disjoint-region sink writes from the host buffer
            from multiview_stitcher_tpu.ops import link_codec

            host_all = np.empty((C,) + tuple(O_max), dtype=out_dtype)
            link_codec.fetch_packed(fused_all, out=host_all, nbits=nbits)
            with ThreadPoolExecutor(min(8, max(1, C))) as ex:
                list(
                    ex.map(
                        lambda pair: write_chunk(pair[0], pair[1]),
                        zip(entries, host_all),
                    )
                )
        else:
            jax.block_until_ready(fused_all)
            with ThreadPoolExecutor(min(8, max(1, C))) as ex:
                list(
                    ex.map(
                        lambda pair: write_chunk(pair[0], np.asarray(pair[1])),
                        zip(entries, (fused_all[i] for i in range(C))),
                    )
                )
    except Exception:  # noqa: BLE001
        results = np.asarray(jax.device_get(fused_all))
        for entry, fused in zip(entries, results):
            write_chunk(entry, fused)
    return out


def _execute_fusion_plan_batched(
    plan,
    field_sims,
    output_stack_properties,
    sdims,
    *,
    mode,
    use_bw,
    overlap_in_pixels,
    trim_overlap,
    blending_widths,
    shrink_distance,
    out_dtype,
    out_sink=None,
    max_batch_elements=2**25,
    allow_exact_tier=True,
):
    """Uniform-shape batched execution for builtin fusion funcs.

    Pads every chunk's view list to K_max and every slab to the plan-wide
    maximum window shape so the fused kernel compiles once; chunks are
    processed in device-memory-bounded batches through a vmapped kernel.
    """
    ndim = len(sdims)
    out_shape_full = tuple(output_stack_properties["shape"][d] for d in sdims)
    out = out_sink if out_sink is not None else np.zeros(out_shape_full, dtype=out_dtype)
    views_bb = [si_utils.get_stack_properties_from_sim(s) for s in field_sims]

    entries = [e for e in plan["per_chunk_entries"] if e["views"]]
    if not entries:
        return out

    K_max = max(len(e["views"]) for e in entries)
    S_max = tuple(
        max(int(e_bb["shape"][d]) for e in entries for _, e_bb in e["views"])
        for d in sdims
    )
    O_max = tuple(
        max(int(e["output_bb_overlap"]["shape"][d]) for e in entries)
        for d in sdims
    )

    chunk_elements = K_max * int(np.prod(S_max))
    batch_size = max(1, int(max_batch_elements // max(chunk_elements, 1)))

    spacing_arr = {
        iview: np.array([views_bb[iview]["spacing"][d] for d in sdims])
        for iview in range(len(field_sims))
    }
    osp_spacing = np.array(
        [output_stack_properties["spacing"][d] for d in sdims]
    )

    # device-resident tiles (shear path only): whole tiles upload ONCE
    # through the _DeviceTileCache and chunk slabs are sliced on device —
    # repeated affine fuse() calls become download-only, like the
    # translation tiers. Slab starts are then pre-clamped so the on-device
    # dynamic_slice extracts exactly the window the host params assume.
    import os as _os2

    try:
        total_tile_bytes = sum(
            int(np.prod(s.data.shape)) * np.dtype(s.data.dtype).itemsize
            for s in field_sims
        )
    except Exception:  # noqa: BLE001
        total_tile_bytes = None
    device_tiles = (
        (_shear_tier_enabled() or _exact_affine_tier_enabled())
        and _os2.environ.get("MVS_TPU_DEVICE_SLABS", "1") != "0"
        and total_tile_bytes is not None
        and total_tile_bytes
        <= int(_os2.environ.get("MVS_TPU_TILES_MAX_BYTES", 2 << 30))
    )
    stack_shape = None
    if device_tiles:
        stack_shape = tuple(
            max(int(s.data.shape[i]) for s in field_sims)
            for i in range(ndim)
        )

    def compute_params(clamp_sizes):
        """Per-(entry, view) kernel params WITHOUT loading slab data
        (needed up-front so the shear tier can plan over every map — one
        static plan, one compile). ``clamp_sizes``: padded tile-stack
        sizes for the device-slice path (starts clamped so an S_max
        window fits), or None for host slab extraction."""
        for entry in entries:
            chunk_bb_ov = entry["output_bb_overlap"]
            # kernel output grid: chunk_bb_ov extended to O_max
            kernel_bb = {
                "origin": dict(chunk_bb_ov["origin"]),
                "spacing": dict(chunk_bb_ov["spacing"]),
                "shape": {d: O_max[i] for i, d in enumerate(sdims)},
            }
            kp = []
            for iview, window_bb in entry["views"]:
                sim = field_sims[iview]
                origin = si_utils.get_origin_from_sim(sim)
                spacing = si_utils.get_spacing_from_sim(sim)
                starts, extent = [], []
                for i, d in enumerate(sdims):
                    start = int(
                        round(
                            (window_bb["origin"][d] - origin[d])
                            / spacing[d]
                        )
                    )
                    start = max(0, start)
                    stop = min(
                        int(sim.sizes[d]),
                        start + int(window_bb["shape"][d]),
                    )
                    if clamp_sizes is not None:
                        start = min(
                            start,
                            max(0, clamp_sizes[i] - S_max[i]),
                        )
                    starts.append(start)
                    extent.append(stop - start)
                slab_origin = {
                    d: origin[d] + starts[i] * spacing[d]
                    for i, d in enumerate(sdims)
                }
                pm = plan["sparams"][iview]
                m, o = resample_ops.physical_to_pixel_params(
                    np.linalg.inv(pm),
                    input_spacing=spacing_arr[iview],
                    input_origin=np.array(
                        [slab_origin[d] for d in sdims]
                    ),
                    output_spacing=osp_spacing,
                    output_origin=np.array(
                        [kernel_bb["origin"][d] for d in sdims]
                    ),
                )
                item = {
                    "m": m, "o": o, "extent": extent,
                    "start": starts, "iview": iview,
                }
                if use_bw:
                    g, wm, wo = weights.blending_weights_pixel_params(
                        kernel_bb,
                        views_bb[iview],
                        pm,
                        blending_widths=blending_widths,
                        shrink_distance=shrink_distance,
                    )
                    item.update(g=g, wm=wm, wo=wo)
                kp.append(item)
            entry["_kernel_params"] = kp

    compute_params(
        tuple(max(stack_shape[i], S_max[i]) for i in range(ndim))
        if device_tiles
        else None
    )

    # interior-NaN guard: the exact kernels zero-fill NaN while the
    # gather tier excludes NaN pixels per view, so float inputs that
    # carry NaN (invalid-pixel markers, e.g. re-fusing prior fusion
    # output) must not take the exact tier. In-memory float arrays are
    # scanned (one memory-bound pass; device arrays reduce on device);
    # lazy float inputs are conservatively routed away.
    float_nan_risk = False
    if np.issubdtype(np.dtype(field_sims[0].data.dtype), np.floating):
        for _s in field_sims:
            _d = _s.data
            if isinstance(_d, jnp.ndarray):
                if bool(jnp.any(jnp.isnan(_d))):
                    float_nan_risk = True
                    break
            elif isinstance(_d, np.ndarray):
                if bool(np.isnan(_d).any()):
                    float_nan_risk = True
                    break
            else:
                float_nan_risk = True  # lazy float: cannot scan cheaply
                break

    # EXACT Pallas affine tier (default for rotated maps, VERDICT r3
    # item 3): banded-hat matmuls, scipy-parity. Eligible for any 2D
    # affine and the y-decoupled 3D family (multiview rotate-around-y);
    # MVS_TPU_SHEAR=1 forces the (approximate) shear tier ahead of it.
    exact_bundle = None
    import os as _os3

    if (
        allow_exact_tier
        and _exact_affine_tier_enabled()
        and not float_nan_risk
        and _os3.environ.get("MVS_TPU_SHEAR") != "1"
    ):
        from multiview_stitcher_tpu.ops import exact_affine as ea_ops

        all_m_e = np.stack(
            [it["m"] for e in entries for it in e["_kernel_params"]]
        )
        all_wm_e = (
            np.stack(
                [it["wm"] for e in entries for it in e["_kernel_params"]]
            )
            if use_bw
            else None
        )
        # 3D kernel selection: y-decoupled maps (rotate-around-y
        # multiview family) take the fast sepy kernel; ANY other affine
        # — e.g. affine groupwise resolution output, which perturbs
        # every matrix entry (VERDICT r4 items 3-4) — takes the general
        # kernel (exact, window-volume cost). Falls through to
        # shear/gather only when the planned windows exceed VMEM.
        candidates = []  # (kind3d, planner, etile)
        if ndim == 2:
            candidates.append(("2d", ea_ops.plan_windows_2d, (8, 128)))
        else:
            if ea_ops.is_y_decoupled(all_m_e) and (
                all_wm_e is None or ea_ops.is_y_decoupled(all_wm_e)
            ):
                candidates.append(
                    ("sepy", ea_ops.plan_windows_3d, (8, 32, 128))
                )
            candidates.append(
                ("general", ea_ops.plan_windows_3d_general, (8, 4, 32))
            )
        for kind3d, planner, etile in candidates:
            win = planner(all_m_e, etile)
            if win is None:
                continue
            wwin = None
            if use_bw:
                wwin = planner(all_wm_e, etile)
                if wwin is None:
                    continue
            exact_bundle = (win, wwin, etile, kind3d)
            break

    # shear tier: one static decomposition over every map in the plan;
    # any failure (large rotation, extreme scale, non-factorable) falls
    # back to the exact gather kernel
    shear_bundle = None
    if exact_bundle is None and _shear_tier_enabled():
        from multiview_stitcher_tpu.ops import shear as shear_ops

        all_m = np.stack(
            [it["m"] for e in entries for it in e["_kernel_params"]]
        )
        all_o = np.stack(
            [it["o"] for e in entries for it in e["_kernel_params"]]
        )
        sres = shear_ops.plan_shear(all_m, all_o, S_max, O_max)
        if sres is not None:
            splan, sctx, _ = sres
            if use_bw:
                # weight maps in 4x-REFINED grid coordinates (the kernel
                # refines the proxy grids exactly): c' = 4*(wm i + wo)
                all_wm = 4.0 * np.stack(
                    [it["wm"] for e in entries for it in e["_kernel_params"]]
                )
                all_wo = 4.0 * np.stack(
                    [it["wo"] for e in entries for it in e["_kernel_params"]]
                )
                wres = shear_ops.plan_shear(
                    all_wm, all_wo, (17,) * ndim, O_max
                )
                if wres is not None:
                    shear_bundle = (splan, sctx, wres[0], wres[1])
            else:
                shear_bundle = (splan, sctx, None, None)

    if device_tiles and shear_bundle is None and exact_bundle is None:
        # params were start-clamped for the device slice path; the gather
        # fallback extracts host slabs at unclamped starts — recompute
        device_tiles = False
        compute_params(None)

    tiles_dev = None
    if device_tiles and (
        shear_bundle is not None or exact_bundle is not None
    ):
        try:
            tiles_dev, _nbits = _tiles_to_device(field_sims)
        except Exception as e:  # noqa: BLE001
            warnings.warn(
                f"device-tile upload failed ({type(e).__name__}: {e}); "
                "falling back to host slab extraction.",
                RuntimeWarning,
                stacklevel=2,
            )
            device_tiles = False
            compute_params(None)

    def build_batch(batch):
        B = len(batch)
        mats = np.tile(np.eye(ndim, dtype=np.float32), (B, K_max, 1, 1))
        offs = np.zeros((B, K_max, ndim), dtype=np.float32)
        extents = np.ones((B, K_max, ndim), dtype=np.float32)
        wgrids = np.zeros((B, K_max) + (5,) * ndim, dtype=np.float32)
        wmats = np.tile(np.eye(ndim, dtype=np.float32), (B, K_max, 1, 1))
        woffs = np.zeros((B, K_max, ndim), dtype=np.float32)
        valid = np.zeros((B, K_max), dtype=bool)
        if device_tiles:
            slabs = None
            tile_idx = np.zeros((B, K_max), dtype=np.int32)
            starts = np.zeros((B, K_max, ndim), dtype=np.int32)
        else:
            slabs = np.full((B, K_max) + S_max, np.nan, dtype=np.float32)
            tile_idx = starts = None

        for bi, entry in enumerate(batch):
            for vi, (iview, window_bb) in enumerate(entry["views"]):
                it = entry["_kernel_params"][vi]
                if device_tiles:
                    tile_idx[bi, vi] = it["iview"]
                    starts[bi, vi] = it["start"]
                else:
                    slab, _ = _slab_from_sim(
                        field_sims[iview], window_bb
                    )
                    slab = np.asarray(slab, dtype=np.float32)
                    if shear_bundle is not None:
                        # edge-replicate padding: shear-chain support
                        # near the TRUE extent edge then reads plausible
                        # values instead of zeros (the analytic mask
                        # still voids outputs beyond the extent)
                        slabs[bi, vi] = np.pad(
                            slab,
                            [
                                (0, S_max[i] - slab.shape[i])
                                for i in range(ndim)
                            ],
                            mode="edge",
                        )
                    else:
                        slabs[bi, vi][
                            tuple(slice(0, s) for s in slab.shape)
                        ] = slab
                mats[bi, vi] = it["m"]
                offs[bi, vi] = it["o"]
                extents[bi, vi] = it["extent"]
                valid[bi, vi] = True
                if use_bw:
                    wgrids[bi, vi] = it["g"]
                    wmats[bi, vi] = it["wm"]
                    woffs[bi, vi] = it["wo"]
        return (slabs, tile_idx, starts, mats, offs, extents, wgrids,
                wmats, woffs, valid)

    def dispatch(arrays):
        (slabs, tile_idx, starts, mats, offs, extents, wgrids, wmats,
         woffs, valid) = arrays
        if exact_bundle is not None:
            win, wwin, etile, kind3d = exact_bundle
            interp = jax.devices()[0].platform == "cpu"
            if device_tiles:
                return _fuse_chunk_batch_kernel_exact_devtiles(
                    tiles_dev, jnp.asarray(tile_idx),
                    jnp.asarray(starts),
                    jnp.asarray(mats, dtype=jnp.float32),
                    jnp.asarray(offs, dtype=jnp.float32),
                    jnp.asarray(extents),
                    jnp.asarray(wgrids),
                    jnp.asarray(wmats, dtype=jnp.float32),
                    jnp.asarray(woffs, dtype=jnp.float32),
                    jnp.asarray(valid),
                    S_max, O_max, win, wwin, etile, mode, use_bw,
                    kind3d=kind3d, interpret=interp,
                )
            return _fuse_chunk_batch_kernel_exact(
                jnp.asarray(slabs),
                jnp.asarray(mats, dtype=jnp.float32),
                jnp.asarray(offs, dtype=jnp.float32),
                jnp.asarray(extents),
                jnp.asarray(wgrids),
                jnp.asarray(wmats, dtype=jnp.float32),
                jnp.asarray(woffs, dtype=jnp.float32),
                jnp.asarray(valid),
                O_max, win, wwin, etile, mode, use_bw,
                kind3d=kind3d,
                interpret=jax.devices()[0].platform == "cpu",
            )
        if shear_bundle is not None:
            splan, sctx, wplan, wctx = shear_bundle
            coeffs = sctx.coeffs(mats, offs)
            if wctx is not None:
                wmats, woffs = 4.0 * wmats, 4.0 * woffs  # refined coords
                wcoeffs = wctx.coeffs(wmats, woffs)
            else:
                wcoeffs = np.zeros(
                    coeffs.shape[:2] + (1, 3), dtype=np.float32
                )
            if device_tiles:
                return _fuse_chunk_batch_kernel_shear_devtiles(
                    tiles_dev, jnp.asarray(tile_idx),
                    jnp.asarray(starts), jnp.asarray(coeffs),
                    jnp.asarray(mats, dtype=jnp.float32),
                    jnp.asarray(offs, dtype=jnp.float32),
                    jnp.asarray(extents), jnp.asarray(wgrids),
                    jnp.asarray(wcoeffs),
                    jnp.asarray(wmats, dtype=jnp.float32),
                    jnp.asarray(woffs, dtype=jnp.float32),
                    jnp.asarray(valid), S_max, splan, wplan, O_max,
                    mode, use_bw,
                )
            return _fuse_chunk_batch_kernel_shear(
                jnp.asarray(slabs), jnp.asarray(coeffs),
                jnp.asarray(mats, dtype=jnp.float32),
                jnp.asarray(offs, dtype=jnp.float32),
                jnp.asarray(extents), jnp.asarray(wgrids),
                jnp.asarray(wcoeffs),
                jnp.asarray(wmats, dtype=jnp.float32),
                jnp.asarray(woffs, dtype=jnp.float32),
                jnp.asarray(valid), splan, wplan, O_max, mode, use_bw,
            )
        return _fuse_chunk_batch_kernel(
            jnp.asarray(slabs), jnp.asarray(mats, dtype=jnp.float32),
            jnp.asarray(offs, dtype=jnp.float32), jnp.asarray(wgrids),
            jnp.asarray(wmats, dtype=jnp.float32),
            jnp.asarray(woffs, dtype=jnp.float32), jnp.asarray(valid),
            O_max, mode, use_bw,
        )

    untrimmed = (not trim_overlap) and any(
        overlap_in_pixels[d] > 0 for d in sdims
    )
    untrimmed_pos = (
        _untrimmed_axis_positions(plan, sdims, overlap_in_pixels)
        if untrimmed
        else None
    )

    def write_batch(batch, fused_batch):
        if untrimmed:
            # per-chunk EXTENDED regions laid side by side (halos kept)
            for bi, entry in enumerate(batch):
                ext = tuple(
                    int(entry["output_bb_overlap"]["shape"][d])
                    for d in sdims
                )
                starts = [
                    untrimmed_pos[i][entry["block_index"][i]]
                    for i in range(ndim)
                ]
                out[
                    tuple(
                        slice(s, s + e) for s, e in zip(starts, ext)
                    )
                ] = fused_batch[bi][
                    tuple(slice(0, e) for e in ext)
                ].astype(out_dtype)
            return
        for bi, entry in enumerate(batch):
            chunk_bb = entry["output_bb"]
            chunk_bb_ov = entry["output_bb_overlap"]
            # core region of the actual chunk inside the kernel output grid
            core_off = [
                int(
                    round(
                        (chunk_bb["origin"][d] - chunk_bb_ov["origin"][d])
                        / chunk_bb_ov["spacing"][d]
                    )
                )
                for d in sdims
            ]
            core = tuple(
                slice(off, off + int(chunk_bb["shape"][d]))
                for off, d in zip(core_off, sdims)
            )
            starts = [
                int(
                    round(
                        (
                            chunk_bb["origin"][d]
                            - output_stack_properties["origin"][d]
                        )
                        / output_stack_properties["spacing"][d]
                    )
                )
                for d in sdims
            ]
            out_slices = tuple(
                slice(s, s + int(chunk_bb["shape"][d]))
                for s, d in zip(starts, sdims)
            )
            out[out_slices] = fused_batch[bi][core].astype(out_dtype)

    # software pipeline (SURVEY.md §7 "out-of-core streaming"): while the
    # device computes batch i, a prep thread reads batch i+1's slabs from
    # the (possibly zarr-backed) tiles, and batch i-1's results are fetched
    # and region-written; jax dispatch is async so the stages overlap
    from concurrent.futures import ThreadPoolExecutor

    batches = [
        entries[i : i + batch_size]
        for i in range(0, len(entries), batch_size)
    ]
    import threading as _threading
    from collections import deque

    # bound in-flight fused device outputs: each pending write pins its
    # batch's device array; unbounded dispatch would race ahead of slow
    # downloads and exhaust HBM
    inflight = _threading.Semaphore(3)

    def fetch_and_write(batch, dev):
        try:
            write_batch(batch, np.asarray(dev))
        finally:
            inflight.release()

    # 2-deep read prefetch + threaded result writes: slab reads, device
    # compute, and result downloads/writes all overlap (region writes are
    # disjoint, so unordered completion is safe)
    with ThreadPoolExecutor(max_workers=2) as prep, ThreadPoolExecutor(
        max_workers=2
    ) as writer:
        read_futs = deque(
            prep.submit(build_batch, b) for b in batches[:2]
        )
        write_futs = []
        for i, batch in enumerate(batches):
            arrays = read_futs.popleft().result()
            if i + 2 < len(batches):
                read_futs.append(prep.submit(build_batch, batches[i + 2]))
            inflight.acquire()
            dev = dispatch(arrays)
            write_futs.append(writer.submit(fetch_and_write, batch, dev))
        for f in write_futs:
            f.result()
    return out


def _execute_fusion_plan(
    plan,
    field_sims,
    output_stack_properties,
    sdims,
    *,
    fusion_func,
    fusion_func_kwargs,
    weights_func,
    weights_func_kwargs,
    overlap_in_pixels,
    trim_overlap,
    interpolation_order,
    blending_widths,
    shrink_distance,
    out_dtype,
    out_sink=None,
    mesh=None,
    output_chunksize=None,
):
    """Run the per-chunk fused kernel over the plan, assembling the output."""
    builtin_mode = _BUILTIN_FUSION_MODES.get(fusion_func)
    ndim = len(sdims)
    tile_shapes = {tuple(s.data.shape) for s in field_sims}
    tiles_in_memory = all(
        isinstance(s.data, (np.ndarray, jnp.ndarray)) for s in field_sims
    )
    import os as _os

    # lazy (zarr-backed) tiles also take the whole-tiles-on-device kernels
    # when they fit in HBM: one bulk materialize+upload beats per-chunk slab
    # extraction with halo duplication (the reference's zarr-backed map_blocks
    # path re-reads each tile window per chunk, fusion/_core.py:1308-1341)
    try:
        total_tile_bytes = sum(
            int(np.prod(s.data.shape)) * np.dtype(s.data.dtype).itemsize
            for s in field_sims
        )
    except Exception:  # noqa: BLE001
        total_tile_bytes = None
    tiles_fit_on_device = tiles_in_memory or (
        total_tile_bytes is not None
        and total_tile_bytes
        <= int(_os.environ.get("MVS_TPU_TILES_MAX_BYTES", 2 << 30))
    )

    # mixed tile shapes are fine for the Pallas tier: _tiles_to_device pads
    # each view to the common max shape ON DEVICE and the kernels mask by
    # the true per-view extents arrays
    pallas_scale = _views_output_scale(
        field_sims, output_stack_properties, sdims
    )
    # mixed-resolution mosaics (per-view spacing): the kernels read
    # per-view scales from SMEM instead of falling to the XLA tiers
    pallas_scales_pv = (
        None
        if pallas_scale is not None
        else _views_output_scales_per_view(
            field_sims, output_stack_properties, sdims
        )
    )
    # untrimmed output (trim_overlap=False with halos) writes per-chunk
    # extended regions: only the batched/host tiers implement that layout
    untrimmed = (not trim_overlap) and any(
        overlap_in_pixels[d] > 0 for d in sdims
    )
    pallas_base_eligible = (
        builtin_mode == "weighted_average"
        and weights_func is None
        and not (fusion_func_kwargs or {})
        and not untrimmed
        and (
            ndim == 2
            or (
                ndim == 3
                and _os.environ.get("MVS_TPU_PALLAS_3D", "1") != "0"
            )
        )
        and _plan_is_translation(plan["sparams"], ndim)
        and (pallas_scale is not None or pallas_scales_pv is not None)
        and _os.environ.get("MVS_TPU_PALLAS", "1") != "0"
    )
    if pallas_base_eligible:
        # large or lazy inputs: banded streaming pipeline (upload || kernel
        # || download; sliding view window, so inputs may exceed HBM)
        stream_threshold = int(
            _os.environ.get("MVS_TPU_STREAM_BYTES", 192 << 20)
        )
        stream_worthy = (
            _os.environ.get("MVS_TPU_STREAM", "1") != "0"
            and mesh is None  # banded pipeline is single-device
            and len(tile_shapes) == 1  # band planner assumes uniform tiles
            and pallas_scale is not None  # uniform-spacing views only
            and all(s == 1.0 for s in pallas_scale)  # unit-scale bands only
            and (
                not tiles_in_memory
                or not tiles_fit_on_device
                or (
                    total_tile_bytes is not None
                    and total_tile_bytes > stream_threshold
                )
            )
        )
        if stream_worthy:
            from multiview_stitcher_tpu.fusion import _streaming

            try:
                res = _streaming.execute_streaming(
                    plan,
                    field_sims,
                    output_stack_properties,
                    sdims,
                    blending_widths=blending_widths,
                    shrink_distance=shrink_distance,
                    out_dtype=out_dtype,
                    out_sink=out_sink,
                    output_chunksize=output_chunksize,
                    is_zarr_sink=(
                        isinstance(out_sink, _PrefixedSink)
                        and not isinstance(out_sink.array, np.ndarray)
                    ),
                )
                if res is not None:
                    return res
            except _streaming.StreamingDeadlineError:
                # a deadline abort means the host link is the limit; the
                # monolithic tiers would be slower still — surface it
                raise
            except Exception as e:  # noqa: BLE001
                warnings.warn(
                    f"Streaming fusion tier failed ({type(e).__name__}: "
                    f"{e}); falling back.",
                    RuntimeWarning,
                    stacklevel=2,
                )
    if pallas_base_eligible and tiles_fit_on_device:
        try:
            return _execute_fusion_plan_pallas(
                plan,
                field_sims,
                output_stack_properties,
                sdims,
                blending_widths=blending_widths,
                shrink_distance=shrink_distance,
                out_dtype=out_dtype,
                out_sink=out_sink,
                mesh=mesh,
                scale=pallas_scale,
                scales=pallas_scales_pv,
            )
        except Exception as e:  # noqa: BLE001
            # Mosaic limits (e.g. scalar-prefetch size on extreme tile
            # grids) fall back to the XLA tiers instead of failing fuse()
            warnings.warn(
                f"Pallas fusion tier failed ({type(e).__name__}: {e}); "
                "falling back to the XLA execution tiers.",
                RuntimeWarning,
                stacklevel=2,
            )
    if (
        builtin_mode is not None
        and weights_func is None
        and not (fusion_func_kwargs or {})
        and not untrimmed
        and len(tile_shapes) == 1
        and tiles_fit_on_device
        and _plan_is_axis_aligned(plan["sparams"], ndim)
    ):
        return _execute_fusion_plan_tiles(
            plan,
            field_sims,
            output_stack_properties,
            sdims,
            mode=builtin_mode,
            use_bw=misc_utils.has_keyword(fusion_func, "blending_weights"),
            blending_widths=blending_widths,
            shrink_distance=shrink_distance,
            out_dtype=out_dtype,
            out_sink=out_sink,
            mesh=mesh,
        )
    if (
        builtin_mode is not None
        and weights_func is None
        and not (fusion_func_kwargs or {})
    ):
        batched_kwargs = dict(
            mode=builtin_mode,
            use_bw=misc_utils.has_keyword(fusion_func, "blending_weights"),
            overlap_in_pixels=overlap_in_pixels,
            trim_overlap=trim_overlap,
            blending_widths=blending_widths,
            shrink_distance=shrink_distance,
            out_dtype=out_dtype,
            out_sink=out_sink,
        )
        try:
            return _execute_fusion_plan_batched(
                plan, field_sims, output_stack_properties, sdims,
                **batched_kwargs,
            )
        except Exception as e:  # noqa: BLE001
            # the exact Pallas tier can hit Mosaic limits the interpret
            # mode accepts (block-shape rules, SMEM/VMEM ceilings); degrade
            # to the XLA shear/gather tiers instead of failing fuse().
            # Region writes are idempotent, so the retry simply rewrites.
            if not _exact_affine_tier_enabled():
                raise
            warnings.warn(
                f"Exact Pallas affine tier failed ({type(e).__name__}: "
                f"{e}); retrying with the XLA execution tiers.",
                RuntimeWarning,
                stacklevel=2,
            )
            return _execute_fusion_plan_batched(
                plan, field_sims, output_stack_properties, sdims,
                allow_exact_tier=False, **batched_kwargs,
            )

    ndim = len(sdims)
    out_shape_full = tuple(output_stack_properties["shape"][d] for d in sdims)
    out = out_sink if out_sink is not None else np.zeros(out_shape_full, dtype=out_dtype)

    views_bb = [
        si_utils.get_stack_properties_from_sim(s) for s in field_sims
    ]

    for entry in plan["per_chunk_entries"]:
        chunk_bb = entry["output_bb"]
        chunk_bb_ov = entry["output_bb_overlap"]
        chunk_views = entry["views"]
        # output slice of this chunk
        starts = [
            int(
                round(
                    (chunk_bb["origin"][d] - output_stack_properties["origin"][d])
                    / output_stack_properties["spacing"][d]
                )
            )
            for d in sdims
        ]
        out_slices = tuple(
            slice(s, s + int(chunk_bb["shape"][d]))
            for s, d in zip(starts, sdims)
        )
        if not chunk_views:
            continue

        chunk_sims = []
        chunk_params = []
        chunk_view_bbs = []
        for iview, window_bb in chunk_views:
            slab, slab_origin = _slab_from_sim(field_sims[iview], window_bb)
            slab_sim = si_utils.to_spatial_image(
                slab,
                dims=tuple(sdims),
                scale=views_bb[iview]["spacing"],
                translation=slab_origin,
            )
            chunk_sims.append(slab_sim)
            chunk_params.append(plan["sparams"][iview])
            chunk_view_bbs.append(views_bb[iview])

        trim = overlap_in_pixels if trim_overlap else {d: 0 for d in sdims}
        # clamp trim so it never exceeds the actual extension (at array borders
        # the extended bb begins before the array; fuse on extended bb then cut)
        fused = fuse_np(
            chunk_sims,
            chunk_params,
            chunk_bb_ov,
            fusion_func=fusion_func,
            fusion_func_kwargs=fusion_func_kwargs,
            weights_func=weights_func,
            weights_func_kwargs=weights_func_kwargs,
            trim_overlap_in_pixels=trim,
            interpolation_order=interpolation_order,
            full_view_bbs=chunk_view_bbs,
            blending_widths=blending_widths,
            shrink_distance=shrink_distance,
        )
        if untrimmed:
            # per-chunk EXTENDED regions laid side by side (halos kept)
            pos = _untrimmed_axis_positions(plan, sdims, overlap_in_pixels)
            starts_u = [
                pos[i][entry["block_index"][i]] for i in range(ndim)
            ]
            ext = tuple(
                int(chunk_bb_ov["shape"][d]) for d in sdims
            )
            out[
                tuple(slice(s, s + e) for s, e in zip(starts_u, ext))
            ] = fused
            continue
        if not trim_overlap:
            # overlap used for halo correctness only; cut the core region
            core = tuple(
                slice(
                    overlap_in_pixels[d],
                    overlap_in_pixels[d] + int(chunk_bb["shape"][d]),
                )
                for d in sdims
            )
            fused = fused[core]
        out[out_slices] = fused
    return out


def _fuse_msims(msims, output_chunksize=None, output_spacing=None, **kwargs):
    """Multiscale fusion: each output level fused from the cheapest adequate
    input level (reference :939-1063)."""
    transform_key = kwargs.get("transform_key")
    sims0 = [msi_utils.get_sim_from_msim(m, scale="scale0") for m in msims]
    sdims = si_utils.get_spatial_dims_from_sim(sims0[0])

    if output_spacing is None:
        output_spacing = si_utils.get_spacing_from_sim(sims0[0])

    # plan output pyramid from the scale0 fusion geometry
    field_sims0 = sims0
    props0 = process_output_stack_properties(
        [
            si_utils.sim_sel_coords(
                s, {nd: s.coords[nd][0] for nd in si_utils.get_nonspatial_dims_from_sim(s)}
            )
            if si_utils.get_nonspatial_dims_from_sim(s)
            else s
            for s in field_sims0
        ],
        output_spacing=output_spacing,
        output_stack_mode=kwargs.get("output_stack_mode", "union"),
        transform_key=transform_key,
    )
    if kwargs.get("output_zarr_url") is not None:
        # The zarr path writes ONE sim at the scale0 output geometry from
        # the input level matching that spacing; an OME-Zarr write grows
        # its pyramid in the store and is read back as an msim
        # (reference :957-1005).
        zarr_kwargs = dict(kwargs)
        for k in (
            "output_stack_mode",
            "output_stack_properties",
            "output_origin",
            "output_shape",
        ):
            zarr_kwargs.pop(k, None)
        output_zarr_url = zarr_kwargs.pop("output_zarr_url")
        zarr_options = zarr_kwargs.pop("zarr_options", None)
        selected = [
            msi_utils.get_sim_from_msim(
                m,
                scale=msi_utils.get_res_level_from_spacing(
                    m, props0["spacing"]
                ),
            )
            for m in msims
        ]
        fused = fuse(
            selected,
            output_stack_properties={
                k: dict(props0[k]) for k in ("shape", "spacing", "origin")
            },
            output_chunksize=output_chunksize,
            output_zarr_url=output_zarr_url,
            zarr_options=zarr_options,
            **zarr_kwargs,
        )
        if (zarr_options or {}).get("ome_zarr", False):
            from multiview_stitcher_tpu.io import ngff_utils

            return ngff_utils.read_msim_from_ome_zarr(
                output_zarr_url,
                transform_key=(
                    transform_key
                    if transform_key is not None
                    else si_utils.DEFAULT_TRANSFORM_KEY
                ),
            )
        return msi_utils.get_msim_from_sim(fused, scale_factors=[])

    shapes, rel_factors, abs_factors = msi_utils.calc_resolution_levels(
        {d: int(props0["shape"][d]) for d in sdims}
    )

    out_sims = []
    for level, abs_factor in enumerate(abs_factors):
        level_spacing = {
            d: float(props0["spacing"][d]) * abs_factor[d] for d in sdims
        }
        level_origin = {
            d: float(props0["origin"][d])
            + (abs_factor[d] - 1) / 2 * float(props0["spacing"][d])
            for d in sdims
        }
        level_props = {
            "shape": shapes[level],
            "spacing": level_spacing,
            "origin": level_origin,
        }
        level_inputs = [
            msi_utils.get_sim_from_msim(
                m, scale=msi_utils.get_res_level_from_spacing(m, level_spacing)
            )
            for m in msims
        ]
        level_kwargs = dict(kwargs)
        for k in (
            "output_stack_mode",
            "output_stack_properties",
            "output_spacing",
            "output_origin",
            "output_shape",
        ):
            level_kwargs.pop(k, None)
        out_sims.append(
            fuse(
                level_inputs,
                output_stack_properties=level_props,
                output_chunksize=output_chunksize,
                **level_kwargs,
            )
        )
    return msi_utils.Msim(sims=out_sims)


def process_output_chunksize(sims, output_chunksize=None):
    """Normalize ``output_chunksize`` to a per-spatial-dim dict (reference
    fusion/_core.py:248): None -> the source chunk grid for zarr-backed
    inputs, else the ndim default; scalars broadcast over spatial dims."""
    sdims = si_utils.get_spatial_dims_from_sim(sims[0])
    if output_chunksize is None:
        chunks = getattr(sims[0].data, "chunks", None)
        if chunks is not None:
            spatial_chunks = dict(
                zip(sims[0].dims, (int(c) for c in chunks))
            )
            return {d: spatial_chunks[d] for d in sdims}
        return si_utils.get_default_spatial_chunksizes(len(sdims))
    if not isinstance(output_chunksize, dict):
        return {d: int(output_chunksize) for d in sdims}
    return {d: int(output_chunksize[d]) for d in sdims}


def func_ignore_nan_warning(func, *args, **kwargs):
    """Call ``func`` with numpy's all-NaN/empty-slice warnings silenced
    (reference fusion/_core.py:1504)."""
    with warnings.catch_warnings():
        warnings.filterwarnings(
            action="ignore", message="All-NaN slice encountered"
        )
        warnings.filterwarnings(
            action="ignore", message="Mean of empty slice"
        )
        return func(*args, **kwargs)


def get_interpolated_image(
    image: np.ndarray,
    mask: np.ndarray = None,
    method: str = "nearest",
    fill_value: int = 0,
):
    """Fill masked (missing) pixels of a 2D image by interpolating from the
    known ones (reference fusion/_core.py:1995; 2D only, like there).

    ``mask``: boolean array, True marks missing pixels; defaults to
    ``isnan(image)``. ``fill_value`` fills outside the convex hull of known
    pixels for 'linear'/'cubic' (no effect for 'nearest').
    """
    from scipy import interpolate

    image = np.asarray(image)
    if image.ndim != 2:
        raise ValueError(
            f"get_interpolated_image is 2D-only (got {image.ndim}D), "
            "matching the reference"
        )
    if mask is None:
        mask = np.isnan(image)
    mask = np.asarray(mask, dtype=bool)
    if mask.min():  # nothing known to interpolate from
        return image
    if not mask.any():
        return image
    known = np.argwhere(~mask)
    missing = np.argwhere(mask)
    filled = image.copy()
    filled[mask] = interpolate.griddata(
        known, image[~mask], missing, method=method, fill_value=fill_value
    )
    return filled


def prepare_block_fusion(
    output_zarr_url: str,
    fuse_kwargs: dict,
    zarr_array_creation_kwargs: dict = None,
    create_output: bool = True,
    overwrite: bool = True,
    verbose: bool = False,
):
    """Prepare a per-block fusion callable for embarrassingly parallel
    fusion into one shared zarr array (reference fusion/_core.py:2159).

    ``create_output=False`` attaches to an existing array — additional
    workers do this when one fusion's blocks are spread over several
    processes (each fuses a disjoint block-id subset).

    Returns ``{"func": fuse_block(block_id), "nblocks": [per-dim counts],
    "output_stack_properties": ...}`` where ``block_id`` indexes
    (non-spatial dims..., spatial block grid...).
    """
    from multiview_stitcher_tpu.io import zarr_backend

    fuse_kwargs = dict(fuse_kwargs)
    sims = fuse_kwargs.pop("images", None)
    if sims is None:
        sims = fuse_kwargs.pop("sims", None)
    if sims is None:
        raise ValueError("fuse_kwargs must carry 'images' (or 'sims')")
    transform_key = fuse_kwargs.get("transform_key")
    sdims = si_utils.get_spatial_dims_from_sim(sims[0])
    nsdims = [d for d in sims[0].dims if d not in sdims]
    ns_coord_lists = {
        nd: np.asarray(sims[0].coords[nd]) for nd in nsdims
    }
    ns_shape = {nd: len(ns_coord_lists[nd]) for nd in nsdims}

    field_sims = [si_utils.get_sim_field(s) for s in sims]
    osp = process_output_stack_properties(
        field_sims,
        output_stack_properties=fuse_kwargs.pop(
            "output_stack_properties", None
        ),
        output_spacing=fuse_kwargs.pop("output_spacing", None),
        output_origin=fuse_kwargs.pop("output_origin", None),
        output_shape=fuse_kwargs.pop("output_shape", None),
        output_stack_mode=fuse_kwargs.pop("output_stack_mode", "union"),
        transform_key=transform_key,
    )
    osp = {
        k: {
            d: (int(v[d]) if k == "shape" else float(v[d])) for d in sdims
        }
        for k, v in osp.items()
    }
    output_chunksize = process_output_chunksize(
        sims, fuse_kwargs.pop("output_chunksize", None)
    )

    full_shape = [ns_shape[d] for d in nsdims] + [
        osp["shape"][d] for d in sdims
    ]
    full_chunks = [1] * len(nsdims) + [
        min(int(output_chunksize[d]), osp["shape"][d]) for d in sdims
    ]
    normalized = normalize_chunks(full_chunks, full_shape)
    nblocks = [len(nc) for nc in normalized]
    block_offsets = [np.cumsum((0,) + tuple(nc[:-1])) for nc in normalized]

    if verbose:
        print(
            f"Fusing into an output stack: shape={full_shape} "
            f"spacing={osp['spacing']} origin={osp['origin']} "
            f"nblocks={nblocks}"
        )

    if create_output:
        output_array = zarr_backend.create_zarr_array(
            str(output_zarr_url),
            shape=tuple(full_shape),
            chunks=tuple(full_chunks),
            dtype=np.dtype(sims[0].dtype),
            zarr_format=2,
            overwrite=overwrite,
            **(zarr_array_creation_kwargs or {}),
        )
    else:
        output_array = zarr_backend.attach_zarr_array(str(output_zarr_url))

    def fuse_block(block_id):
        block_id = tuple(int(b) for b in block_id)
        if len(block_id) != len(nblocks):
            raise ValueError(
                f"block_id {block_id} must index {len(nblocks)} dims "
                f"(nblocks={nblocks})"
            )
        sel = {
            nd: ns_coord_lists[nd][block_id[i]]
            for i, nd in enumerate(nsdims)
        }
        block_sims = [
            si_utils.sim_sel_coords(s, sel) if sel else s for s in sims
        ]
        starts = [
            int(block_offsets[len(nsdims) + j][b])
            for j, b in enumerate(block_id[len(nsdims):])
        ]
        sizes = [
            int(normalized[len(nsdims) + j][b])
            for j, b in enumerate(block_id[len(nsdims):])
        ]
        block_props = {
            "origin": {
                d: osp["origin"][d] + osp["spacing"][d] * starts[j]
                for j, d in enumerate(sdims)
            },
            "spacing": dict(osp["spacing"]),
            "shape": {d: sizes[j] for j, d in enumerate(sdims)},
        }
        fused = fuse(
            block_sims,
            output_stack_properties=block_props,
            output_chunksize=output_chunksize,
            **fuse_kwargs,
        )
        region = tuple(
            slice(b, b + 1) for b in block_id[: len(nsdims)]
        ) + tuple(
            slice(s, s + z) for s, z in zip(starts, sizes)
        )
        data = np.asarray(fused.data).reshape(
            [1] * len(nsdims) + sizes
        )
        output_array[region] = data
        return block_id

    return {
        "func": fuse_block,
        "nblocks": nblocks,
        "output_stack_properties": osp,
    }


def fuse_to_zarr(*args, **kwargs):
    """Deprecated reference alias (reference fusion/_core.py:2304): use
    ``fuse(..., output_zarr_url=<path>)`` instead."""
    warnings.warn(
        "fuse_to_zarr() is deprecated. Use fuse(..., output_zarr_url=<path>)"
        " instead.",
        DeprecationWarning,
        stacklevel=2,
    )
    raise RuntimeError(
        "fuse_to_zarr() is deprecated. Please call "
        "fuse(..., output_zarr_url=<path>) instead."
    )


def fuse_to_multiscale_ome_zarr(*args, **kwargs):
    """Deprecated reference alias (reference fusion/_core.py:2318): use
    ``fuse(..., output_zarr_url=..., zarr_options={'ome_zarr': True})``."""
    warnings.warn(
        "fuse_to_multiscale_ome_zarr() is deprecated. Use "
        "fuse(..., output_zarr_url=<path>, zarr_options={'ome_zarr': True})"
        " instead.",
        DeprecationWarning,
        stacklevel=2,
    )
    raise RuntimeError(
        "fuse_to_multiscale_ome_zarr() is deprecated. Please call "
        "fuse(..., output_zarr_url=<path>, zarr_options={'ome_zarr': True})"
        " instead."
    )
