"""Registration quality metrics.

TPU-native rebuild of the reference's ``metrics``
(/root/reference/src/multiview_stitcher/metrics.py, 808 LoC): evaluate image
metrics (NaN-aware NCC by default; any ``func(im1, im2) -> float``) over the
overlap regions of adjacent view pairs, sampling the fixed image in its
intrinsic space and the moving image through ``inv(T_moving_q) @ T_fixed_q``
for each candidate transform key — so metric differences across keys reflect
the transforms alone. Resampling runs through the JAX kernel; metric
reductions use the on-device NaN-aware NCC.

Two modes (reference :387-446): pairs from spatial overlap under
``base_transform_key`` with one or more ``query_transform_keys``, or pairs +
transforms from a precomputed registration graph (``pairs_graph``).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import networkx as nx
import numpy as np

from multiview_stitcher_tpu import (
    msi_utils,
    mv_graph,
    registration,
    si_utils,
    transformation,
)
from multiview_stitcher_tpu.msi_utils import Msim
from multiview_stitcher_tpu.ops import image_metrics as im_metrics
from multiview_stitcher_tpu.ops import resample as resample_ops

logger = logging.getLogger(__name__)


def normalized_cross_correlation(im1, im2) -> float:
    """NaN-aware NCC in [-1, 1] (reference metrics.py:42)."""
    val = float(im_metrics.nan_aware_ncc(np.asarray(im1), np.asarray(im2)))
    return val


def structural_similarity(im1, im2, win_size: int = 7,
                          data_range=None) -> float:
    """NaN-aware mean SSIM, importable as a ``metric_funcs`` entry.

    First-party counterpart of the skimage ``structural_similarity`` the
    reference documents for :func:`tile_pair_image_metrics`
    (reference metrics.py:455-473). Pixels outside the image domain arrive
    as NaN (see the metric_funcs contract); they are filled with the
    joint-valid mean before the SSIM window pass so border windows degrade
    gracefully instead of propagating NaN.
    """
    a = np.asarray(im1, dtype=np.float32)
    b = np.asarray(im2, dtype=np.float32)
    valid = np.isfinite(a) & np.isfinite(b)
    if not valid.any():
        return float("nan")
    fill_a = float(a[valid].mean())
    fill_b = float(b[valid].mean())
    a = np.where(valid, a, fill_a)
    b = np.where(valid, b, fill_b)
    # narrow overlap boxes: clamp the window to the smallest image extent
    # (largest odd size that fits), so thin comparison regions still score
    max_win = min(a.shape)
    if win_size > max_win:
        win_size = max_win if max_win % 2 == 1 else max_win - 1
        if win_size < 1:
            return float("nan")
    if data_range is None:
        data_range = float(
            max(a.max(), b.max()) - min(a.min(), b.min())
        )
        if data_range == 0:
            return 1.0
    return float(
        im_metrics.structural_similarity(
            a, b, win_size=win_size, data_range=float(data_range)
        )
    )


def _compute_metrics_from_arrays(
    fixed_sim, moving_sim, metric_funcs, intersection_halfspace=None
):
    fixed_np = np.array(np.asarray(fixed_sim.data, dtype=np.float32))
    moving_np = np.asarray(moving_sim.data, dtype=np.float32)
    if intersection_halfspace is not None:
        mask = mv_graph.get_mask_from_halfspace(
            fixed_sim, intersection_halfspace
        )
        fixed_np[~mask] = np.nan
    return {k: float(f(fixed_np, moving_np)) for k, f in metric_funcs.items()}


def _sims_t0(sims, metric_channel):
    out = []
    for sim in sims:
        sel = {}
        if "t" in sim.dims:
            sel["t"] = np.asarray(sim.coords["t"])[0]
        if "c" in sim.dims:
            sel["c"] = (
                np.asarray(sim.coords["c"])[0]
                if metric_channel is None
                else metric_channel
            )
        if sel:
            sim = si_utils.sim_sel_coords(sim, sel)
        out.append(sim)
    return out


def _tolerance(max_tolerance, sdims):
    if max_tolerance is None:
        return None
    if isinstance(max_tolerance, (int, float)):
        return -float(max_tolerance)
    return {d: -float(max_tolerance.get(d, 0.0)) for d in sdims}


def _edge_geometry(sim_fixed, sim_moving, base_transform_key, tol):
    overlap_dict = registration._get_overlap_bboxes(
        sim_fixed,
        sim_moving,
        input_transform_key=base_transform_key,
        output_transform_key=None,
        overlap_tolerance=tol,
    )
    lower = np.asarray(overlap_dict["lowers"][0], dtype=float)
    upper = np.asarray(overlap_dict["uppers"][0], dtype=float)
    comparison_bbox = (
        None if np.any(lower >= upper) else {"lower": lower, "upper": upper}
    )
    return comparison_bbox, overlap_dict["intersection"], overlap_dict["vol"]


def _affine_of(sim, key):
    m = np.asarray(si_utils.get_affine_from_sim(sim, key).squeeze())
    return m[0] if m.ndim == 3 else m


def _build_metrics_graph(
    msims, sims_t0, base_transform_key, query_transform_keys, max_tolerance,
    bidirectional=False,
):
    sdims = si_utils.get_spatial_dims_from_sim(sims_t0[0])
    tol = _tolerance(max_tolerance, sdims)
    g_adj = mv_graph.build_view_adjacency_graph_from_msims(
        msims, transform_key=base_transform_key, overlap_tolerance=tol
    )
    g_metrics = nx.DiGraph()
    g_metrics.add_nodes_from(g_adj.nodes())

    for i, j in g_adj.edges():
        directions = (
            [(i, j), (j, i)] if bidirectional else [(min(i, j), max(i, j))]
        )
        for fixed_idx, moving_idx in directions:
            comparison_bbox, intersection, vol = _edge_geometry(
                sims_t0[fixed_idx], sims_t0[moving_idx],
                base_transform_key, tol,
            )
            transforms = {}
            for q in query_transform_keys:
                T_f = _affine_of(sims_t0[fixed_idx], q)
                T_m = _affine_of(sims_t0[moving_idx], q)
                transforms[q] = np.linalg.inv(T_m) @ T_f
            g_metrics.add_edge(
                fixed_idx, moving_idx,
                comparison_bbox=comparison_bbox,
                transforms=transforms,
                intersection_halfspace=intersection,
                vol=vol,
            )
    return g_metrics


def _build_metrics_graph_from_pairs_graph(
    msims, sims_t0, base_transform_key, pairs_graph, max_tolerance,
    bidirectional=False,
):
    sdims = si_utils.get_spatial_dims_from_sim(sims_t0[0])
    tol = _tolerance(max_tolerance, sdims)
    g_metrics = nx.DiGraph()
    g_metrics.add_nodes_from(pairs_graph.nodes())

    for i, j in pairs_graph.edges():
        fixed_base, moving_base = min(i, j), max(i, j)
        T_edge_raw = pairs_graph.edges[fixed_base, moving_base]["transform"]
        from multiview_stitcher_tpu.param_utils import XAffine

        if isinstance(T_edge_raw, XAffine):
            T_edge = T_edge_raw.matrix(
                T_edge_raw.t_coords[0] if T_edge_raw.has_t else None
            )
        else:
            T_edge = np.asarray(T_edge_raw).squeeze()
            if T_edge.ndim == 3:
                T_edge = T_edge[0]

        directions = [(fixed_base, moving_base)]
        if bidirectional:
            directions.append((moving_base, fixed_base))

        for fixed_idx, moving_idx in directions:
            comparison_bbox, intersection, vol = _edge_geometry(
                sims_t0[fixed_idx], sims_t0[moving_idx],
                base_transform_key, tol,
            )
            T_f = _affine_of(sims_t0[fixed_idx], base_transform_key)
            T_m = _affine_of(sims_t0[moving_idx], base_transform_key)
            if fixed_idx < moving_idx:
                p_moving = np.linalg.inv(T_m) @ T_edge @ T_f
            else:
                p_moving = np.linalg.inv(T_f) @ np.linalg.inv(T_edge) @ T_m
            g_metrics.add_edge(
                fixed_idx, moving_idx,
                comparison_bbox=comparison_bbox,
                transforms={"transform": p_moving},
                intersection_halfspace=intersection,
                vol=vol,
            )
    return g_metrics


@partial(jax.jit, static_argnames=("out_shape", "h_max"))
def _ncc_pair_batch_kernel(
    f_slabs, fmats, foffs, m_slabs, mmats, moffs,
    planes, origins, spacings,
    out_shape: tuple,
    h_max: int,
):
    """Batched overlap-NCC: resample fixed+moving onto the comparison grid,
    mask fixed by the intersection halfspaces (evaluated from output-grid
    world coordinates on device), NaN-aware NCC — one dispatch per
    shape bucket instead of (1 + n_keys) per edge."""
    ndim = len(out_shape)

    def one(fs, fm, fo, ms, mm, mo, pln, org, sp):
        fixed = resample_ops.affine_resample(
            fs, fm, fo, out_shape, order=1, cval=jnp.nan
        )
        moving = resample_ops.affine_resample(
            ms, mm, mo, out_shape, order=1, cval=jnp.nan
        )
        inside = jnp.ones(out_shape, dtype=bool)
        for h in range(h_max):
            val = pln[h, ndim]
            for d in range(ndim):
                coord = org[d] + sp[d] * jax.lax.broadcasted_iota(
                    jnp.float32, out_shape, d
                )
                val = val + pln[h, d] * coord
            inside = inside & (val <= 0)
        fixed = jnp.where(inside, fixed, jnp.nan)
        return im_metrics.nan_aware_ncc(fixed, moving)

    return jax.vmap(one)(
        f_slabs, fmats, foffs, m_slabs, mmats, moffs,
        planes, origins, spacings,
    )


def _source_window(sim, p, output_sp, sdims, margin=2):
    """Slab of ``sim`` covering the back-projection of the output bbox
    through ``p`` (output world -> input world), with pixel params mapping
    output pixels -> slab pixels (the fusion slab convention)."""
    ndim = len(sdims)
    lower = np.array([output_sp["origin"][d] for d in sdims])
    spacing_o = np.array([output_sp["spacing"][d] for d in sdims])
    shape_o = np.array([output_sp["shape"][d] for d in sdims])
    corners01 = np.array(list(np.ndindex((2,) * ndim)), dtype=float)
    corners_w = lower + corners01 * (shape_o - 1) * spacing_o
    p = np.asarray(p, dtype=float)
    src_w = corners_w @ p[:ndim, :ndim].T + p[:ndim, ndim]
    origin_i = si_utils.get_origin_from_sim(sim, asarray=True)
    spacing_i = si_utils.get_spacing_from_sim(sim, asarray=True)
    px = (src_w - origin_i) / spacing_i
    lo = np.maximum(0, np.floor(px.min(axis=0)).astype(int) - margin)
    hi = np.minimum(
        np.array(sim.shape), np.ceil(px.max(axis=0)).astype(int) + margin + 1
    )
    hi = np.maximum(hi, lo + 1)
    slab = np.asarray(
        sim.data[tuple(slice(a, b) for a, b in zip(lo, hi))],
        dtype=np.float32,
    )
    slab_origin = origin_i + lo * spacing_i
    m, o = resample_ops.physical_to_pixel_params(
        p,
        input_spacing=spacing_i,
        input_origin=slab_origin,
        output_spacing=spacing_o,
        output_origin=lower,
    )
    return slab, m, o


def _batched_ncc_metrics(units, sdims):
    """Run (edge, key) NCC units through shape-bucketed device batches.

    ``units``: list of dicts with keys fixed_sim, moving_sim, p_moving,
    output_sp, planes, result_slot (callable storing the value).
    """
    ndim = len(sdims)
    buckets = {}
    for u in units:
        out_shape = tuple(
            int(u["output_sp"]["shape"][d]) for d in sdims
        )
        buckets.setdefault(out_shape, []).append(u)

    for out_shape, bucket in buckets.items():
        B = len(bucket)
        prepared = []
        for u in bucket:
            f_slab, fm, fo = _source_window(
                u["fixed_sim"], np.eye(ndim + 1), u["output_sp"], sdims
            )
            m_slab, mm, mo = _source_window(
                u["moving_sim"], u["p_moving"], u["output_sp"], sdims
            )
            prepared.append((f_slab, fm, fo, m_slab, mm, mo))
        fshape = tuple(
            max(p[0].shape[d] for p in prepared) for d in range(ndim)
        )
        mshape = tuple(
            max(p[3].shape[d] for p in prepared) for d in range(ndim)
        )
        h_max = max(1, max(len(u["planes"]) for u in bucket))
        f_slabs = np.full((B,) + fshape, np.nan, dtype=np.float32)
        m_slabs = np.full((B,) + mshape, np.nan, dtype=np.float32)
        fmats = np.zeros((B, ndim, ndim), dtype=np.float32)
        foffs = np.zeros((B, ndim), dtype=np.float32)
        mmats = np.zeros((B, ndim, ndim), dtype=np.float32)
        moffs = np.zeros((B, ndim), dtype=np.float32)
        planes = np.zeros((B, h_max, ndim + 1), dtype=np.float32)
        origins = np.zeros((B, ndim), dtype=np.float32)
        spacings = np.ones((B, ndim), dtype=np.float32)
        for bi, (u, (fs, fm, fo, ms, mm, mo)) in enumerate(
            zip(bucket, prepared)
        ):
            f_slabs[bi][tuple(slice(0, s) for s in fs.shape)] = fs
            m_slabs[bi][tuple(slice(0, s) for s in ms.shape)] = ms
            fmats[bi], foffs[bi] = fm, fo
            mmats[bi], moffs[bi] = mm, mo
            pl_arr = np.asarray(u["planes"], dtype=np.float32)
            if len(pl_arr):
                planes[bi, : len(pl_arr)] = pl_arr
            origins[bi] = [u["output_sp"]["origin"][d] for d in sdims]
            spacings[bi] = [u["output_sp"]["spacing"][d] for d in sdims]

        vals = np.asarray(
            _ncc_pair_batch_kernel(
                jnp.asarray(f_slabs), jnp.asarray(fmats), jnp.asarray(foffs),
                jnp.asarray(m_slabs), jnp.asarray(mmats), jnp.asarray(moffs),
                jnp.asarray(planes), jnp.asarray(origins),
                jnp.asarray(spacings),
                out_shape, h_max,
            )
        )
        for u, v in zip(bucket, vals):
            u["store"](float(v))


def tile_pair_image_metrics(
    msims,
    base_transform_key: str,
    query_transform_keys=None,
    metric_funcs: Optional[Dict[str, Callable]] = None,
    max_tolerance=None,
    spacing: Optional[Dict[str, float]] = None,
    bidirectional: bool = False,
    metric_channel=None,
    n_parallel_pairs: Optional[int] = None,
    input_res_level: Optional[int] = None,
    *,
    pairs_graph=None,
):
    """Evaluate overlap metrics per adjacent pair under candidate transforms.

    Returns {"pairs": {(fi,mi): {key: {metric: val}}}, "bboxes", "summary"}
    where summary is the overlap-volume-weighted mean per key and metric.
    Reference: metrics.py:387-808.
    """
    if (query_transform_keys is None) == (pairs_graph is None):
        raise ValueError(
            "Exactly one of 'query_transform_keys' or 'pairs_graph' must be "
            "provided."
        )
    if metric_funcs is None:
        metric_funcs = {"ncc": normalized_cross_correlation}

    if query_transform_keys is not None:
        if isinstance(query_transform_keys, str):
            query_transform_keys = [query_transform_keys]
        candidate_keys = query_transform_keys
    else:
        candidate_keys = ["transform"]

    msims = [
        m if isinstance(m, Msim) else msi_utils.get_msim_from_sim(m, scale_factors=[])
        for m in msims
    ]

    per_pair_res_level = False
    if input_res_level is None:
        if spacing is None:
            input_res_level = 0
        else:
            per_pair_res_level = True

    graph_scale_key = (
        "scale0" if per_pair_res_level else f"scale{input_res_level}"
    )
    sims = [m.get_scale(graph_scale_key) for m in msims]
    spatial_dims = si_utils.get_spatial_dims_from_sim(sims[0])
    ndim = len(spatial_dims)
    sims_t0 = _sims_t0(sims, metric_channel)

    if query_transform_keys is not None:
        g_metrics = _build_metrics_graph(
            msims, sims_t0, base_transform_key, query_transform_keys,
            max_tolerance, bidirectional=bidirectional,
        )
    else:
        g_metrics = _build_metrics_graph_from_pairs_graph(
            msims, sims_t0, base_transform_key, pairs_graph,
            max_tolerance, bidirectional=bidirectional,
        )

    # the default NCC metric takes the batched device path: all (edge, key)
    # units of a shape bucket resample+mask+reduce in ONE dispatch
    use_batched_ncc = all(
        f is normalized_cross_correlation for f in metric_funcs.values()
    )
    batched_units = []

    computed = {}
    for fixed_idx, moving_idx in list(g_metrics.edges()):
        edge = g_metrics.edges[(fixed_idx, moving_idx)]
        comparison_bbox = edge["comparison_bbox"]
        if comparison_bbox is None:
            logger.warning(
                "Empty comparison bbox for pair (%s -> %s)",
                fixed_idx, moving_idx,
            )
            computed[(fixed_idx, moving_idx)] = {
                q: {k: np.nan for k in metric_funcs} for q in candidate_keys
            }
            continue

        intersection = edge["intersection_halfspace"]
        fixed_spacing = si_utils.get_spacing_from_sim(
            sims_t0[fixed_idx], asarray=True
        )
        htol = 1e-3 * float(np.min(fixed_spacing))
        intersection = mv_graph.expand_halfspace(intersection, distance=htol)

        if per_pair_res_level:
            pair_scale_key = msi_utils.get_res_level_from_spacing(
                msims[fixed_idx], spacing
            )
            sim_fixed = _sims_t0(
                [msims[fixed_idx].get_scale(pair_scale_key)], metric_channel
            )[0]
            sim_moving = _sims_t0(
                [msims[moving_idx].get_scale(pair_scale_key)], metric_channel
            )[0]
        else:
            sim_fixed = sims_t0[fixed_idx]
            sim_moving = sims_t0[moving_idx]

        lower = comparison_bbox["lower"]
        upper = comparison_bbox["upper"]
        spacing_d = (
            spacing
            if spacing is not None
            else si_utils.get_spacing_from_sim(sim_fixed)
        )
        output_sp = {
            "origin": {d: float(lower[i]) for i, d in enumerate(spatial_dims)},
            "spacing": {d: float(spacing_d[d]) for d in spatial_dims},
            "shape": {
                d: max(
                    1,
                    int(
                        np.floor(
                            (upper[i] - lower[i]) / spacing_d[d] + 1
                        )
                    ),
                )
                for i, d in enumerate(spatial_dims)
            },
        }

        computed[(fixed_idx, moving_idx)] = {}
        if use_batched_ncc:
            for q in candidate_keys:
                slot = computed[(fixed_idx, moving_idx)].setdefault(q, {})

                def store(v, slot=slot):
                    for k in metric_funcs:
                        slot[k] = v

                batched_units.append(
                    {
                        "fixed_sim": sim_fixed,
                        "moving_sim": sim_moving,
                        "p_moving": edge["transforms"][q],
                        "output_sp": output_sp,
                        "planes": intersection.halfspaces,
                        "store": store,
                    }
                )
            continue

        sim_fixed_t = transformation.transform_sim(
            sim_fixed.astype(np.float32),
            p=np.eye(ndim + 1),
            output_stack_properties=output_sp,
            cval=np.nan,
        )

        for q in candidate_keys:
            p_moving = edge["transforms"][q]
            sim_moving_t = transformation.transform_sim(
                sim_moving.astype(np.float32),
                p=p_moving,
                output_stack_properties=output_sp,
                cval=np.nan,
            )
            computed[(fixed_idx, moving_idx)][q] = (
                _compute_metrics_from_arrays(
                    sim_fixed_t,
                    sim_moving_t,
                    metric_funcs,
                    intersection.halfspaces,
                )
            )

    if batched_units:
        _batched_ncc_metrics(batched_units, spatial_dims)

    for e in g_metrics.edges():
        g_metrics.edges[e]["metrics"] = computed[e]

    # overlap-volume-weighted summary
    summary = {}
    for q in candidate_keys:
        summary[q] = {}
        for metric_key in metric_funcs:
            pairs_vals = [
                (
                    float(computed[e][q].get(metric_key, np.nan)),
                    float(g_metrics.edges[e]["vol"]),
                )
                for e in g_metrics.edges()
            ]
            valid = [(v, w) for v, w in pairs_vals if not np.isnan(v)]
            if valid:
                total_w = sum(w for _, w in valid)
                summary[q][metric_key] = (
                    float(sum(v * w for v, w in valid) / total_w)
                    if total_w > 0
                    else np.nan
                )
            else:
                summary[q][metric_key] = np.nan

    return {
        "pairs": {
            e: {q: computed[e][q] for q in candidate_keys}
            for e in g_metrics.edges()
        },
        "bboxes": {
            e: g_metrics.edges[e]["comparison_bbox"]
            for e in g_metrics.edges()
        },
        "summary": summary,
    }
