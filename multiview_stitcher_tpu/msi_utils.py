"""Multiscale image model.

TPU-native rebuild of the reference's ``msi_utils``
(/root/reference/src/multiview_stitcher/msi_utils.py). The reference stores
multiscale images ("msims") as ``xarray.DataTree`` pyramids with per-scale
transform data variables. Here an msim is a :class:`Msim` holding an ordered
list of :class:`~.si_utils.Sim` scales plus shared transform metadata (the
reference keeps transforms identical across scales and always reads them from
``scale0``, msi_utils.py:392-396, so a single shared dict is equivalent).

Downsampling follows the reference exactly (msi_utils.py:49-80):
coarsen-mean with boundary trim, spacing multiplied by the factor, and origin
shifted by ``(factor - 1) * spacing / 2`` (pixel-center convention).
"""

from __future__ import annotations

import copy as _copy
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np

from multiview_stitcher_tpu import param_utils, si_utils
from multiview_stitcher_tpu.param_utils import XAffine
from multiview_stitcher_tpu.si_utils import Sim


@dataclass
class Msim:
    """Multiscale image: scale0 is the highest resolution."""

    sims: List[Sim]
    transforms: Dict[str, XAffine] = field(default_factory=dict)
    attrs: Dict = field(default_factory=dict)

    def __post_init__(self):
        if not self.transforms and self.sims and self.sims[0].transforms:
            self.transforms = {
                k: v.copy() for k, v in self.sims[0].transforms.items()
            }

    @property
    def scale_keys(self) -> List[str]:
        return [f"scale{i}" for i in range(len(self.sims))]

    def scale_index(self, scale: str) -> int:
        return int(scale.replace("scale", ""))

    def get_scale(self, scale="scale0") -> Sim:
        idx = self.scale_index(scale) if isinstance(scale, str) else scale
        sim = self.sims[idx].copy()
        sim.transforms = {k: v.copy() for k, v in self.transforms.items()}
        return sim

    def copy(self) -> "Msim":
        return Msim(
            sims=[s.copy() for s in self.sims],
            transforms={k: v.copy() for k, v in self.transforms.items()},
            attrs=dict(self.attrs),
        )


def is_msim(image) -> bool:
    return isinstance(image, Msim)


def _coarsen_mean(data: np.ndarray, factors: Sequence[int]) -> np.ndarray:
    """Block-mean downsample with boundary='trim' (reference msi_utils.py:58)."""
    data = np.asarray(data)
    trimmed = tuple(
        slice(0, (s // f) * f) for s, f in zip(data.shape, factors)
    )
    data = data[trimmed]
    new_shape = []
    mean_axes = []
    for i, (s, f) in enumerate(zip(data.shape, factors)):
        new_shape.extend([s // f, f])
        mean_axes.append(2 * i + 1)
    out = data.reshape(new_shape).mean(axis=tuple(mean_axes))
    return out.astype(data.dtype)


def _downsample_sim(sim: Sim, scale_factor) -> Sim:
    sdims = sim.spatial_dims
    if not isinstance(scale_factor, dict):
        scale_factor = {d: int(scale_factor) for d in sdims}
    scale_factor = {d: int(scale_factor.get(d, 1)) for d in sdims}

    factors = [
        scale_factor[d] if d in scale_factor else 1 for d in sim.dims
    ]
    factors = [scale_factor.get(d, 1) for d in sim.dims]
    data = _coarsen_mean(sim.to_numpy(), factors)

    spacing = si_utils.get_spacing_from_sim(sim)
    origin = si_utils.get_origin_from_sim(sim)
    out = si_utils.to_spatial_image(
        data,
        dims=sim.dims,
        scale={d: spacing[d] * scale_factor[d] for d in sdims},
        translation={
            d: origin[d] + (scale_factor[d] - 1) * spacing[d] / 2 for d in sdims
        },
        t_coords=sim.coords.get("t"),
        c_coords=sim.coords.get("c"),
    )
    out.transforms = {k: v.copy() for k, v in sim.transforms.items()}
    out.attrs.update(_copy.deepcopy(sim.attrs))
    return out


def calc_resolution_levels(
    spatial_shape: Dict[str, int],
    downscale_factors_per_spatial_dim: Optional[Dict[str, int]] = None,
    min_shape: int = 100,
):
    """Pyramid plan: 2× per dim until a dim would fall below ``min_shape``.

    Returns (shapes, relative factors, absolute factors), including level 0.
    Reference: msi_utils.py:279-326.
    """
    sdims = list(spatial_shape.keys())
    if downscale_factors_per_spatial_dim is None:
        downscale_factors_per_spatial_dim = {d: 2 for d in sdims}

    res_shapes = [dict(spatial_shape)]
    res_rel_factors = [{d: 1 for d in sdims}]
    res_abs_factors = [{d: 1 for d in sdims}]
    while True:
        new_rel = {
            d: downscale_factors_per_spatial_dim[d]
            if res_shapes[-1][d] // downscale_factors_per_spatial_dim[d] > min_shape
            else 1
            for d in sdims
        }
        if not any(new_rel[d] > 1 for d in sdims):
            break
        res_shapes.append({d: res_shapes[-1][d] // new_rel[d] for d in sdims})
        res_rel_factors.append(new_rel)
        res_abs_factors.append(
            {d: res_abs_factors[-1][d] * new_rel[d] for d in sdims}
        )
    return res_shapes, res_rel_factors, res_abs_factors


def get_msim_from_sim(sim: Sim, scale_factors=None) -> Msim:
    """Build a pyramid from a sim (reference msi_utils.py:373)."""
    spatial_shape = si_utils.get_shape_from_sim(sim)
    if scale_factors is None:
        scale_factors = calc_resolution_levels(spatial_shape)[1][1:]
    sims = [sim.copy()]
    for factor in scale_factors:
        sims.append(_downsample_sim(sims[-1], factor))
    return Msim(sims=sims)


def get_msim_from_sims(sims: Sequence[Sim]) -> Msim:
    """Build an msim from precomputed levels (reference msi_utils.py:433)."""
    sims = list(sims)
    if not sims:
        raise ValueError("sims must contain at least one image.")
    dims = sims[0].dims
    for s in sims[1:]:
        if s.dims != dims:
            raise ValueError("All sims must have the same dimensions.")
    sdims = sims[0].spatial_dims

    def shape_key(s):
        shape = si_utils.get_shape_from_sim(s)
        return tuple(shape[d] for d in sdims)

    sims = sorted(sims, key=shape_key, reverse=True)
    return Msim(sims=sims)


def get_sim_from_msim(msim, scale="scale0") -> Sim:
    if isinstance(msim, Sim):
        return msim
    return msim.get_scale(scale)


def get_sorted_scale_keys(msim: Msim) -> List[str]:
    return msim.scale_keys


def get_ndim(msim: Msim) -> int:
    return len(msim.sims[0].spatial_dims)


def get_dims(msim: Msim):
    return list(msim.sims[0].dims)


def get_spatial_dims(msim: Msim):
    return msim.sims[0].spatial_dims


def get_transform_from_msim(msim: Msim, transform_key: str) -> XAffine:
    return msim.transforms[transform_key]



def get_transforms_from_dataset_as_dict(dataset):
    """All named transforms of an msim scale (or sim) as a dict
    transform_key -> transform — reference msi_utils.py:328, where each
    scale is an xarray Dataset holding "image" plus one data var per
    transform key; here transforms live in a dict already, so this returns
    a copy of it (accepting an Msim, a Sim, or a plain dict)."""
    if isinstance(dataset, Msim):
        return {k: v.copy() for k, v in dataset.transforms.items()}
    transforms = getattr(dataset, "transforms", dataset)
    if not isinstance(transforms, dict):
        raise TypeError(
            "expected an Msim, Sim, or transform dict, got "
            f"{type(dataset).__name__}"
        )
    return {k: v.copy() for k, v in transforms.items()}

def set_affine_transform(
    msim: Msim, xaffine=None, transform_key=None, base_transform_key=None
):
    """Attach a transform to every scale (reference msi_utils.py:596)."""
    assert transform_key is not None
    if xaffine is None:
        xaffine = param_utils.identity_transform(get_ndim(msim))
    xaffine = param_utils.to_xaffine(xaffine)
    if base_transform_key is not None:
        xaffine = param_utils.rebase_affine(
            xaffine, msim.transforms[base_transform_key]
        )
    msim.transforms[transform_key] = xaffine
    return msim


def multiscale_sel_coords(msim: Msim, sel_dict) -> Msim:
    out = Msim(
        sims=[si_utils.sim_sel_coords(s, sel_dict) for s in msim.sims],
        transforms={},
        attrs=dict(msim.attrs),
    )
    # select transforms along t if needed
    for key, xaff in msim.transforms.items():
        if "t" in sel_dict and xaff.has_t:
            tval = sel_dict["t"]
            if np.isscalar(tval):
                out.transforms[key] = xaff.sel_t(tval)
            else:
                idxs = [int(np.where(xaff.t_coords == t)[0][0]) for t in tval]
                out.transforms[key] = XAffine(
                    xaff.data[idxs], t_coords=np.asarray(tval)
                )
        else:
            out.transforms[key] = xaff.copy()
    return out


def correct_multiscale_origins(msim: Msim) -> Msim:
    """Align pyramid-level origins to the pixel-center convention.

    Readers that report identical origins for all levels (e.g. Imaris) get
    each level's origin shifted by ``(factor - 1) * spacing0 / 2`` so level
    pixel centers line up with the coarsened level-0 centers.
    """
    sim0 = msim.sims[0]
    sdims = sim0.spatial_dims
    spacing0 = si_utils.get_spacing_from_sim(sim0)
    origin0 = si_utils.get_origin_from_sim(sim0)
    for sim in msim.sims[1:]:
        spacing = si_utils.get_spacing_from_sim(sim)
        for d in sdims:
            factor = spacing[d] / spacing0[d]
            sim.origin[d] = origin0[d] + (factor - 1) * spacing0[d] / 2
    return msim


def concat(msims: Sequence[Msim], dim: str) -> Msim:
    """Concatenate msims along a non-spatial dim, per scale."""
    n_scales = min(len(m.sims) for m in msims)
    out_sims = [
        si_utils.concat([m.sims[i] for m in msims], dim)
        for i in range(n_scales)
    ]
    return Msim(sims=out_sims)


def get_store_decorator(store_path, store_overwrite: bool = False):
    """Decorator factory caching an msim-producing function on disk.

    The wrapped function runs only when ``store_path`` is missing (or
    ``store_overwrite``); its msim is written as OME-Zarr and the returned
    msim is the lazily zarr-backed reload — so expensive readers run once
    per store (reference msi_utils.py:82).  ``store_path=None`` is a no-op.
    """
    import functools
    from pathlib import Path

    if store_path is None:
        return lambda func: func
    store_path = Path(store_path)

    def deco(func):
        @functools.wraps(func)
        def wrapper(*args, **kwargs):
            from multiview_stitcher_tpu.io import ngff_utils

            if not store_path.exists() or store_overwrite:
                ngff_utils.write_msim_to_ome_zarr(
                    func(*args, **kwargs), str(store_path), overwrite=True
                )
            return ngff_utils.read_msim_from_ome_zarr(str(store_path))

        return wrapper

    return deco


def stack(msims: Sequence[Msim], dim: str = "t", coords=None) -> Msim:
    """Stack msims along a NEW dim, per scale (reference msi_utils.py:869).

    Zarr-backed levels stay lazy through :func:`si_utils.stack` (new axis
    with per-view windows); transforms gain the stacked coordinate like any
    sims-level stack.
    """
    n_scales = min(len(m.sims) for m in msims)
    return Msim(
        sims=[
            si_utils.stack([m.sims[i] for m in msims], dim, coords=coords)
            for i in range(n_scales)
        ]
    )


def get_first_scale_above_target_spacing(
    msim: Msim, target_spacing: float, dim: str = "y"
) -> str:
    """First scale (finest to coarsest) whose spacing along ``dim`` exceeds
    ``target_spacing``; the coarsest scale when none does (reference
    msi_utils.py:642). Used to pick a registration resolution level."""
    scale_keys = get_sorted_scale_keys(msim)
    scale = scale_keys[0]
    for scale in scale_keys:
        sp = si_utils.get_spacing_from_sim(msim.get_scale(scale))[dim]
        if sp > target_spacing:
            break
    return scale


def sim_map_blocks(sim: Sim, func, *args, dtype=None, **kwargs) -> Sim:
    """Apply ``func`` to the image data, keeping coords/transforms intact.

    Lazily backed data stays lazy: ``func`` is applied per window as it is
    read (``zarr_utils.VirtualMap``); in-memory data is transformed eagerly.
    ``func`` must be shape-preserving. Extra args/kwargs are forwarded.
    """
    from multiview_stitcher_tpu import zarr_utils

    if si_utils._is_lazy(sim.data):
        data = zarr_utils.map_blocks(
            sim.data, func, *args, dtype=dtype, **kwargs
        )
    else:
        data = func(sim.data, *args, **kwargs)
        if dtype is not None:
            data = np.asarray(data).astype(dtype)
        if tuple(np.shape(data)) != tuple(sim.shape):
            raise ValueError(
                "sim_map_blocks requires a shape-preserving func; got "
                f"{np.shape(data)} from {tuple(sim.shape)}"
            )
    return sim.copy(data=data)


def msim_map_blocks(msim: Msim, func, *args, dtype=None, **kwargs) -> Msim:
    """Apply ``func`` to the image data of every scale (reference
    msi_utils.py:503-524, ``msim_map_blocks``).

    Coordinates, transforms, and attached point sets are preserved. E.g.
    ``msim_map_blocks(msim, jnp.asarray)`` makes materialized chunks
    device-backed; ``msim_map_blocks(msim, np.clip, 0, 100)`` clips lazily.
    """
    out = Msim(
        sims=[
            sim_map_blocks(sim, func, *args, dtype=dtype, **kwargs)
            for sim in msim.sims
        ],
        transforms={k: v.copy() for k, v in msim.transforms.items()},
        attrs=dict(msim.attrs),
    )
    return out


def set_point_set(msim: Msim, points, points_key: str = "beads"):
    msim.attrs.setdefault("point_sets", {})[points_key] = np.asarray(
        points, dtype=float
    )
    for sim in msim.sims:
        si_utils.set_point_set(sim, points, points_key=points_key)
    return msim


def get_point_set(msim: Msim, points_key: str = "beads"):
    return msim.attrs["point_sets"][points_key]


def get_res_level_from_spacing(msim: Msim, output_spacing: Dict[str, float]) -> str:
    """Coarsest scale whose spacing is still <= output_spacing per dim.

    Reference: msi_utils.py:655.
    """
    scale_keys = get_sorted_scale_keys(msim)
    chosen = scale_keys[0]
    for sk in scale_keys:
        sim = msim.get_scale(sk)
        spacing = si_utils.get_spacing_from_sim(sim)
        if all(
            spacing[d] <= output_spacing[d] * (1 + 1e-6) for d in spacing
        ):
            chosen = sk
        else:
            break
    return chosen


def get_res_level_from_binning_factors(msim: Msim, binning_factors: Dict[str, int]) -> str:
    """Coarsest scale not exceeding the requested binning per dim."""
    scale_keys = get_sorted_scale_keys(msim)
    base_spacing = si_utils.get_spacing_from_sim(msim.get_scale("scale0"))
    chosen = scale_keys[0]
    for sk in scale_keys:
        sim = msim.get_scale(sk)
        spacing = si_utils.get_spacing_from_sim(sim)
        if all(
            spacing[d] / base_spacing[d] <= binning_factors.get(d, 1) * (1 + 1e-6)
            for d in spacing
        ):
            chosen = sk
        else:
            break
    return chosen


def ensure_dim(msim: Msim, dim: str) -> Msim:
    """Expand ``dim`` on every scale when absent (reference
    msi_utils.py:620)."""
    return Msim(sims=[si_utils.ensure_dim(s, dim) for s in msim.sims])


def multiscale_spatial_image_from_zarr(path, **kwargs) -> Msim:
    """Reference-named alias of ngff_utils.read_msim_from_ome_zarr
    (reference msi_utils.py exposes zarr round trips here)."""
    from multiview_stitcher_tpu.io import ngff_utils

    return ngff_utils.read_msim_from_ome_zarr(path, **kwargs)


def multiscale_spatial_image_to_zarr(msim: Msim, path, **kwargs):
    """Reference-named alias of ngff_utils.write_msim_to_ome_zarr."""
    from multiview_stitcher_tpu.io import ngff_utils

    return ngff_utils.write_msim_to_ome_zarr(msim, str(path), **kwargs)


def update_msim_transforms_zarr(msim_or_transforms, zarr_path):
    """Reference-named alias of ngff_utils.update_msim_transforms_zarr."""
    from multiview_stitcher_tpu.io import ngff_utils

    return ngff_utils.update_msim_transforms_zarr(
        msim_or_transforms, zarr_path
    )
