"""Bead / marker detection.

TPU-native rebuild of the reference's ``detection``
(/root/reference/src/multiview_stitcher/detection.py): Laplacian-of-Gaussian
blob detection with local-maximum suppression and optional interior rejection
(``log_detect``, reference :160-287), and a chunked whole-image scan with
halo-aware centroid dedup (``detect_beads``, :288-459 — the reference drives
this by reusing fuse() as a block mapper; here the chunk machinery is driven
directly, with the same halo/core semantics).

The filter stack (LoG, max/min filters, gaussian) runs as one jitted JAX
computation per chunk; connected-component labeling of the sparse detection
mask and centroid extraction stay host-side (scipy.ndimage.label).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage as scipy_ndimage

from multiview_stitcher_tpu import msi_utils, mv_graph, si_utils
from multiview_stitcher_tpu.ops import filters as filter_ops
from multiview_stitcher_tpu.si_utils import Sim
from multiview_stitcher_tpu.utils.misc import requires_overlap


def _normalize_size(value, ndim):
    if isinstance(value, bool):
        raise TypeError("size must be a float or dict[str, float].")
    if isinstance(value, (int, float, np.integer, np.floating)):
        return tuple(float(value) for _ in range(ndim))
    if isinstance(value, dict):
        if len(value) != ndim:
            raise TypeError("size dict must cover all spatial dims.")
        return tuple(float(v) for v in value.values())
    raise TypeError("size must be a float or dict[str, float].")


def _aligned_size(value, spacing, ndim):
    """_normalize_size, but when BOTH value and spacing are dicts the
    values are aligned by spacing's key order (insertion-order zipping
    silently paired sizes with the wrong axis's spacing)."""
    if isinstance(value, dict) and isinstance(spacing, dict):
        if set(value) != set(spacing):
            raise TypeError(
                f"size dict keys {sorted(value)} must match spacing keys "
                f"{sorted(spacing)}."
            )
        return tuple(float(value[d]) for d in spacing)
    return _normalize_size(value, ndim)


def _spacing_values(spacing):
    if isinstance(spacing, dict):
        return tuple(float(spacing[d]) for d in spacing)
    return tuple(float(s) for s in spacing)


def _target_size_pixels(target_size_physical, spacing):
    vals = _spacing_values(spacing)
    target = _aligned_size(target_size_physical, spacing, len(vals))
    return tuple(t / s for t, s in zip(target, vals))


def _log_detect_required_overlap(kwargs):
    spacing = kwargs["spacing"]
    target_size = _target_size_pixels(
        kwargs["target_size_physical"], spacing
    )
    ndim = len(target_size)
    out = []
    for size in target_size:
        sigma = max(0.5, float(size) / (2.0 * np.sqrt(ndim)))
        min_distance = max(1.0, float(size) / 2.0)
        out.append(max(1, int(np.ceil(4 * sigma + min_distance))))
    if isinstance(spacing, dict):
        return dict(zip(spacing, out))
    return tuple(out)


@partial(
    jax.jit,
    static_argnames=(
        "sigma_pixels", "max_filter_size", "threshold_rel", "threshold_abs",
        "max_neigh_intensity", "min_filter_size", "max_neigh_sigma_pixels",
    ),
)
def _log_response_kernel(
    image,
    sigma_pixels: tuple,
    max_filter_size: tuple,
    threshold_rel: float,
    threshold_abs,
    max_neigh_intensity,
    min_filter_size: tuple,
    max_neigh_sigma_pixels,
):
    """LoG response + local-maximum detection mask, one fused computation."""
    img = jnp.asarray(image, dtype=jnp.float32)
    response = -filter_ops.gaussian_laplace(img, sigma_pixels, mode="reflect")
    response = response * float(np.mean(sigma_pixels)) ** 2
    max_response = filter_ops.maximum_filter(
        response, max_filter_size, mode="reflect"
    )
    thr = (
        jnp.nanmax(response) * threshold_rel
        if threshold_abs is None
        else threshold_abs
    )
    detections = (response == max_response) & (response > thr) & (response > 0)

    if max_neigh_intensity is not None:
        sample = (
            filter_ops.gaussian_filter(img, max_neigh_sigma_pixels)
            if max_neigh_sigma_pixels is not None
            else img
        )
        min_sample = filter_ops.minimum_filter(
            sample, min_filter_size, mode="reflect"
        )
        detections = detections & (min_sample < max_neigh_intensity)
    return detections


@requires_overlap(_log_detect_required_overlap)
def log_detect(
    image,
    spacing,
    target_size_physical,
    threshold_rel: float = 0.2,
    threshold_abs: Optional[float] = None,
    max_neigh_intensity: Optional[float] = None,
    max_neigh_sample_size=None,
    max_neigh_sigma=None,
):
    """Detect bright beads via LoG + local maxima (reference :160-287).

    Returns an integer label array (0 = background).
    """
    image = np.asarray(image)
    ndim = image.ndim
    target_size = _target_size_pixels(target_size_physical, spacing)
    if len(target_size) != ndim:
        raise ValueError("spacing and target_size_physical must match image.ndim")

    sigma_pixels = tuple(
        max(0.5, s / (2.0 * np.sqrt(ndim))) for s in target_size
    )
    min_distance_pixels = tuple(max(1.0, s / 2.0) for s in target_size)
    max_filter_size = tuple(
        2 * int(np.ceil(d)) + 1 for d in min_distance_pixels
    )

    if max_neigh_intensity is not None:
        spacing_vals = _spacing_values(spacing)
        if max_neigh_sigma is not None:
            sig = _aligned_size(max_neigh_sigma, spacing, ndim)
            max_neigh_sigma_pixels = tuple(
                s / sp for s, sp in zip(sig, spacing_vals)
            )
        else:
            max_neigh_sigma_pixels = None
        size_phys = _aligned_size(
            max_neigh_sample_size
            if max_neigh_sample_size is not None
            else target_size_physical,
            spacing,
            ndim,
        )
        min_filter_size = tuple(
            max(1, int(round(s / sp)))
            for s, sp in zip(size_phys, spacing_vals)
        )
    else:
        max_neigh_sigma_pixels = None
        min_filter_size = (1,) * ndim

    detections = np.asarray(
        _log_response_kernel(
            image,
            sigma_pixels,
            max_filter_size,
            float(threshold_rel),
            None if threshold_abs is None else float(threshold_abs),
            None if max_neigh_intensity is None else float(max_neigh_intensity),
            min_filter_size,
            max_neigh_sigma_pixels,
        )
    )
    return scipy_ndimage.label(detections)[0]


def _extract_core_label_centroids(labels, chunk_start, core_shape, depth):
    """Centroids of labels whose center lies in the chunk core (halo dedup)."""
    if not np.issubdtype(labels.dtype, np.integer):
        raise TypeError("detection_func must return an integer label array.")
    label_ids = np.unique(labels)
    label_ids = label_ids[label_ids > 0]
    if len(label_ids) == 0:
        return np.empty((0, labels.ndim), dtype=float)
    centroids = np.asarray(
        scipy_ndimage.center_of_mass(labels, labels=labels, index=label_ids),
        dtype=float,
    )
    if centroids.ndim == 1:
        centroids = centroids[np.newaxis, :]
    depth = np.asarray(depth, dtype=float)
    core_start = depth
    core_stop = depth + np.asarray(core_shape, dtype=float)
    keep = np.all((centroids >= core_start) & (centroids < core_stop), axis=1)
    centroids = centroids[keep]
    if not len(centroids):
        return np.empty((0, labels.ndim), dtype=float)
    return np.asarray(chunk_start, dtype=float) + centroids - depth


def detect_beads(
    msim,
    detection_func: Callable = log_detect,
    detection_func_kwargs: Optional[dict] = None,
    detection_overlap=None,
    max_detection_spacing=None,
    chunksize: Optional[Union[int, Dict[str, int]]] = None,
):
    """Detect beads over a (possibly huge) image, chunk by chunk.

    Selects the coarsest adequate resolution level, applies
    ``detection_func`` to halo-extended chunks, dedups centroids to chunk
    cores and returns positions in intrinsic physical coordinates (N, ndim).
    """
    if isinstance(msim, Sim):
        msim = msi_utils.get_msim_from_sim(msim, scale_factors=[])

    if max_detection_spacing is None:
        scale_key = "scale0"
    else:
        sim0 = msim.get_scale("scale0")
        sdims0 = si_utils.get_spatial_dims_from_sim(sim0)
        max_detection_spacing = si_utils.normalize_to_spatial_dict(
            max_detection_spacing, sdims0, "max_detection_spacing"
        )
        scale_key = msi_utils.get_res_level_from_spacing(
            msim, max_detection_spacing
        )

    sim = msim.get_scale(scale_key)
    nsdims = si_utils.get_nonspatial_dims_from_sim(sim)
    if nsdims:
        sim = si_utils.sim_sel_coords(
            sim, {nd: np.asarray(sim.coords[nd])[0] for nd in nsdims}
        )

    sdims = si_utils.get_spatial_dims_from_sim(sim)
    ndim = len(sdims)
    spacing = si_utils.get_spacing_from_sim(sim)
    spacing_tuple = tuple(spacing[d] for d in sdims)
    origin = si_utils.get_origin_from_sim(sim)

    detection_func_kwargs = dict(detection_func_kwargs or {})

    if detection_overlap is None and hasattr(
        detection_func, "required_overlap"
    ):
        required = detection_func.required_overlap(
            dict(detection_func_kwargs, spacing=spacing_tuple)
        )
        detection_overlap = (
            required if isinstance(required, dict) else dict(zip(sdims, required))
        )
    if detection_overlap is None:
        detection_overlap = 0
    detection_overlap = si_utils.normalize_to_spatial_dict(
        detection_overlap, sdims, "detection_overlap"
    )
    depth = tuple(int(np.ceil(detection_overlap[d])) for d in sdims)

    if chunksize is None:
        chunksize = si_utils.get_default_spatial_chunksizes(ndim)
    elif not isinstance(chunksize, dict):
        chunksize = {d: int(chunksize) for d in sdims}

    shape = si_utils.get_shape_from_sim(sim)
    chunk_bbs, block_indices = mv_graph.get_chunk_bbs(
        {
            "origin": {d: 0.0 for d in sdims},
            "shape": shape,
            "spacing": {d: 1.0 for d in sdims},
        },
        chunksize,
    )

    all_points = []
    for bb in chunk_bbs:
        core_start = [int(bb["origin"][d]) for d in sdims]
        core_shape = [int(bb["shape"][d]) for d in sdims]
        # halo-extended window clipped to the image
        starts = [max(0, s - dp) for s, dp in zip(core_start, depth)]
        stops = [
            min(int(shape[d]), core_start[i] + core_shape[i] + depth[i])
            for i, d in enumerate(sdims)
        ]
        eff_depth = [core_start[i] - starts[i] for i in range(ndim)]
        window = sim.isel(
            {d: slice(starts[i], stops[i]) for i, d in enumerate(sdims)}
        )
        labels = detection_func(
            window.to_numpy(), spacing_tuple, **detection_func_kwargs
        )
        pts = _extract_core_label_centroids(
            labels, core_start, core_shape, eff_depth
        )
        if len(pts):
            all_points.append(pts)

    if all_points:
        point_indices = np.concatenate(all_points, axis=0)
    else:
        point_indices = np.empty((0, ndim), dtype=float)

    positions = np.empty_like(point_indices)
    for i, d in enumerate(sdims):
        positions[:, i] = origin[d] + point_indices[:, i] * spacing[d]
    return positions
