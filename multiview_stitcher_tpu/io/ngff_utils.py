"""OME-Zarr / NGFF read-write.

TPU-native rebuild of the reference's ``ngff_utils``
(/root/reference/src/multiview_stitcher/ngff_utils.py, 1973 LoC): NGFF
v0.4 (zarr v2) and v0.5 (zarr v3) multiscale image read/write with
pyramid generation, omero channel metadata, and lazy zarr-backed sims via
tensorstore.

NGFF cannot store affine transforms (reference docs/data_formats.md:35), so
transform keys live in memory; an identity transform is set on read.
"""

from __future__ import annotations

import os
import shutil
from typing import Dict, List, Optional

import numpy as np

from multiview_stitcher_tpu import msi_utils, param_utils, si_utils
from multiview_stitcher_tpu.io import zarr_backend
from multiview_stitcher_tpu.msi_utils import Msim
from multiview_stitcher_tpu.si_utils import Sim

DEFAULT_NGFF_TIME_TRANSFORM = {"scale": 1.0, "translation": 0.0, "unit": None}


def calc_ngff_coordinate_transformations_and_axes(
    stack_properties_res0: dict,
    res_abs_factors: List[dict],
    nsdims: Optional[list] = None,
    time_transform: Optional[dict] = None,
):
    """Per-level scale/translation metadata (reference ngff_utils.py:1493)."""
    nsdims = nsdims or []
    spacing = stack_properties_res0["spacing"]
    origin = stack_properties_res0["origin"]
    sdims = list(spacing.keys())

    time_transform = {**DEFAULT_NGFF_TIME_TRANSFORM, **(time_transform or {})}
    nsdim_scales = [
        float(time_transform["scale"]) if d == "t" else 1.0 for d in nsdims
    ]
    nsdim_translations = [
        float(time_transform["translation"]) if d == "t" else 0.0
        for d in nsdims
    ]

    coordtfs = [
        [
            {
                "type": "scale",
                "scale": nsdim_scales
                + [float(spacing[d] * f[d]) for d in sdims],
            },
            {
                "type": "translation",
                "translation": nsdim_translations
                + [
                    float(origin[d] + (f[d] - 1) * spacing[d] / 2)
                    for d in sdims
                ],
            },
        ]
        for f in res_abs_factors
    ]

    axes = [
        {
            "name": d,
            "type": "channel" if d == "c" else ("time" if d == "t" else "space"),
            **({"unit": "micrometer"} if d in sdims else {}),
            **(
                {"unit": time_transform["unit"]}
                if d == "t" and time_transform["unit"]
                else {}
            ),
        }
        for d in nsdims + sdims
    ]
    return coordtfs, axes


def _default_chunks(sim: Sim) -> List[int]:
    ndim = len(sim.spatial_dims)
    spatial_cs = si_utils.get_default_spatial_chunksizes(ndim)
    return [
        1 if d in ("t", "c") else min(spatial_cs[d], sim.sizes[d])
        for d in sim.dims
    ]


def write_sim_to_ome_zarr(
    sim: Sim,
    output_zarr_url: str,
    downscale_factors_per_spatial_dim: Optional[Dict[str, int]] = None,
    overwrite: bool = False,
    ngff_version: str = "0.4",
    chunks: Optional[List[int]] = None,
    shards: Optional[List[int]] = None,
) -> Sim:
    """Write a sim as a multiscale OME-Zarr; returns a zarr-backed sim.

    If ``overwrite`` is False and levels exist, missing pyramid levels are
    completed (the zarr store is the checkpoint, SURVEY.md §5).

    ``shards`` (NGFF 0.5 / zarr v3 only): outer shard shape for the
    ``sharding_indexed`` codec; ``chunks`` then becomes the inner chunk
    shape. Shard extents are clamped per level and rounded up to inner
    chunk multiples.
    """
    zarr_format = 2 if ngff_version == "0.4" else 3
    if shards is not None and zarr_format == 2:
        raise ValueError("shards requires ngff_version >= 0.5 (zarr v3)")
    if overwrite and os.path.exists(output_zarr_url):
        shutil.rmtree(output_zarr_url)

    nsdims = si_utils.get_nonspatial_dims_from_sim(sim)
    sdims = si_utils.get_spatial_dims_from_sim(sim)
    spacing = si_utils.get_spacing_from_sim(sim)
    origin = si_utils.get_origin_from_sim(sim)
    spatial_shape = {d: sim.sizes[d] for d in sdims}

    res_shapes, res_rel_factors, res_abs_factors = (
        msi_utils.calc_resolution_levels(
            spatial_shape,
            downscale_factors_per_spatial_dim=downscale_factors_per_spatial_dim,
        )
    )
    n_res = len(res_shapes)

    coordtfs, axes = calc_ngff_coordinate_transformations_and_axes(
        {"spacing": spacing, "origin": origin, "shape": spatial_shape},
        res_abs_factors,
        nsdims=nsdims,
        time_transform=sim.attrs.get("ngff_time_transform"),
    )

    if chunks is None:
        chunks = _default_chunks(sim)

    curr = sim.to_numpy()
    for level in range(n_res):
        if level > 0:
            factors = [
                res_rel_factors[level].get(d, 1) if d in sdims else 1
                for d in sim.dims
            ]
            curr = msi_utils._coarsen_mean(curr, factors)
        level_url = f"{output_zarr_url}/{level}"
        if not overwrite:
            # the zarr store is the checkpoint: keep existing levels and only
            # complete missing ones (reference ngff_utils.py:1579-1582)
            try:
                existing = zarr_backend.open_zarr_array(level_url)
                if tuple(existing.shape) == tuple(curr.shape):
                    curr = np.asarray(existing)
                    continue
            except FileNotFoundError:
                pass
        level_chunks = [min(c, s) for c, s in zip(chunks, curr.shape)]
        level_shards = None
        if shards is not None:
            # clamp to the level shape, then round up to an inner-chunk
            # multiple (sharding_indexed requires exact divisibility)
            level_shards = [
                min(int(sh), -(-int(s) // c) * c)
                for sh, s, c in zip(shards, curr.shape, level_chunks)
            ]
            level_shards = [
                -(-sh // c) * c for sh, c in zip(level_shards, level_chunks)
            ]
        arr = zarr_backend.create_zarr_array(
            level_url,
            shape=curr.shape,
            chunks=level_chunks,
            dtype=curr.dtype,
            zarr_format=zarr_format,
            overwrite=True,
            shards=level_shards,
        )
        arr[...] = curr

    multiscales = [
        {
            "axes": axes,
            "datasets": [
                {
                    "path": f"{level}",
                    "coordinateTransformations": coordtfs[level],
                }
                for level in range(n_res)
            ],
            "version": ngff_version,
        }
    ]
    attrs = {"multiscales": multiscales}
    if ngff_version != "0.4":
        attrs = {"ome": {"version": ngff_version, "multiscales": multiscales}}

    if "c" in sim.dims:
        full = sim.to_numpy()
        other_axes = tuple(
            i for i, d in enumerate(sim.dims) if d != "c"
        )
        cmin = full.min(axis=other_axes)
        cmax = full.max(axis=other_axes)
        attrs["omero"] = {
            "channels": [
                {
                    "color": "ffffff",
                    "label": f"{ch}",
                    "active": True,
                    "window": {
                        "end": int(cmax[ich]),
                        "max": int(cmax[ich]),
                        "min": 0,
                        "start": int(cmin[ich]),
                    },
                }
                for ich, ch in enumerate(np.asarray(sim.coords["c"]))
            ]
        }

    zarr_backend.write_group_metadata(
        output_zarr_url, attrs, zarr_format=zarr_format
    )

    return read_sim_from_ome_zarr(
        output_zarr_url,
        transform_key=_first_transform_key(sim),
        prior_sim=sim,
    )


def finalize_ome_zarr_levels(
    output_zarr_url: str,
    dims,
    stack_properties: dict,
    ngff_version: str = "0.4",
    c_coords=None,
    downscale_factors_per_spatial_dim: Optional[Dict[str, int]] = None,
    block_size: int = 512,
):
    """Complete an OME-Zarr whose level 0 was streamed chunkwise.

    Writes the multiscales/omero metadata and generates the pyramid levels by
    block-wise downsampling from the previous level (never loading a full
    level into memory — the out-of-core pyramid path, reference
    ngff_utils.py:1288-1462).
    """
    zarr_format = 2 if ngff_version == "0.4" else 3
    dims = tuple(dims)
    sdims = [d for d in dims if d in si_utils.SPATIAL_DIMS]
    nsdims = [d for d in dims if d not in si_utils.SPATIAL_DIMS]
    spacing = {d: float(stack_properties["spacing"][d]) for d in sdims}
    origin = {d: float(stack_properties["origin"][d]) for d in sdims}
    spatial_shape = {d: int(stack_properties["shape"][d]) for d in sdims}

    res_shapes, res_rel_factors, res_abs_factors = (
        msi_utils.calc_resolution_levels(
            spatial_shape,
            downscale_factors_per_spatial_dim=downscale_factors_per_spatial_dim,
        )
    )
    n_res = len(res_shapes)

    prev = zarr_backend.open_zarr_array(f"{output_zarr_url}/0")
    prev_shape = prev.shape
    for level in range(1, n_res):
        rel = res_rel_factors[level]
        factors = [rel.get(d, 1) if d in sdims else 1 for d in dims]
        new_shape = tuple(
            s // f for s, f in zip(prev_shape, factors)
        )
        chunks = [
            1 if d in nsdims else min(block_size, new_shape[i])
            for i, d in enumerate(dims)
        ]
        arr = zarr_backend.create_zarr_array(
            f"{output_zarr_url}/{level}",
            shape=new_shape,
            chunks=chunks,
            dtype=prev.dtype,
            zarr_format=zarr_format,
            overwrite=True,
        )
        # block-wise: read a factor-aligned window of prev, coarsen, write
        n_blocks = [
            -(-new_shape[i] // chunks[i]) for i in range(len(dims))
        ]
        import itertools

        for bi in itertools.product(*[range(n) for n in n_blocks]):
            out_sl = tuple(
                slice(
                    bi[i] * chunks[i],
                    min((bi[i] + 1) * chunks[i], new_shape[i]),
                )
                for i in range(len(dims))
            )
            in_sl = tuple(
                slice(
                    out_sl[i].start * factors[i], out_sl[i].stop * factors[i]
                )
                for i in range(len(dims))
            )
            block = np.asarray(prev[in_sl])
            arr[out_sl] = msi_utils._coarsen_mean(block, factors)
        prev = arr
        prev_shape = new_shape

    coordtfs, axes = calc_ngff_coordinate_transformations_and_axes(
        {"spacing": spacing, "origin": origin, "shape": spatial_shape},
        res_abs_factors,
        nsdims=nsdims,
    )
    multiscales = [
        {
            "axes": axes,
            "datasets": [
                {
                    "path": f"{level}",
                    "coordinateTransformations": coordtfs[level],
                }
                for level in range(n_res)
            ],
            "version": ngff_version,
        }
    ]
    attrs = {"multiscales": multiscales}
    if ngff_version != "0.4":
        attrs = {"ome": {"version": ngff_version, "multiscales": multiscales}}
    if c_coords is not None:
        attrs["omero"] = {
            "channels": [
                {
                    "color": "ffffff",
                    "label": f"{ch}",
                    "active": True,
                    "window": {"end": 65535, "max": 65535, "min": 0, "start": 0},
                }
                for ch in np.asarray(c_coords)
            ]
        }
    zarr_backend.write_group_metadata(
        str(output_zarr_url), attrs, zarr_format=zarr_format
    )


def _first_transform_key(sim: Sim) -> str:
    keys = list(sim.transforms.keys())
    return keys[0] if keys else si_utils.DEFAULT_TRANSFORM_KEY


def _parse_multiscales(attrs: dict):
    if "ome" in attrs:
        return attrs["ome"]["multiscales"][0], attrs
    return attrs["multiscales"][0], attrs


def read_sim_from_ome_zarr(
    zarr_path,
    resolution_level: int = 0,
    transform_key: str = si_utils.DEFAULT_TRANSFORM_KEY,
    prior_sim: Optional[Sim] = None,
) -> Sim:
    """Read one resolution level as a lazy zarr-backed sim.

    An identity transform is set under ``transform_key`` (NGFF stores no
    affines); ``prior_sim`` may supply transform keys to carry over.
    """
    attrs, zarr_format = zarr_backend.read_group_metadata(str(zarr_path))
    ms, attrs = _parse_multiscales(attrs)
    datasets = ms["datasets"]
    if resolution_level >= len(datasets):
        raise ValueError(
            f"Resolution level {resolution_level} not found in {zarr_path}"
        )
    ds = datasets[resolution_level]
    axes = [a["name"] for a in ms["axes"]]
    arr = zarr_backend.open_zarr_array(
        os.path.join(str(zarr_path), ds["path"]),
        zarr_format=zarr_format,
    )

    scale = [1.0] * len(axes)
    translation = [0.0] * len(axes)
    for tf in ds.get("coordinateTransformations", []):
        if tf["type"] == "scale":
            scale = tf["scale"]
        elif tf["type"] == "translation":
            translation = tf["translation"]

    sdims = [a for a in axes if a in si_utils.SPATIAL_DIMS]
    c_coords = None
    if "omero" in attrs and "c" in axes:
        c_coords = [ch["label"] for ch in attrs["omero"]["channels"]]

    sim = si_utils.get_sim_from_array(
        arr,
        dims=axes,
        scale={d: float(scale[axes.index(d)]) for d in sdims},
        translation={d: float(translation[axes.index(d)]) for d in sdims},
        transform_key=transform_key,
        c_coords=c_coords,
    )
    if "t" in axes:
        it = axes.index("t")
        unit = next(
            (a.get("unit") for a in ms["axes"] if a["name"] == "t"), None
        )
        tt = {
            "scale": float(scale[it]),
            "translation": float(translation[it]),
            "unit": unit,
        }
        if tt != DEFAULT_NGFF_TIME_TRANSFORM:
            sim.attrs["ngff_time_transform"] = tt
    if prior_sim is not None:
        for key, xaff in prior_sim.transforms.items():
            sim.transforms[key] = xaff.copy()
    return sim


def get_ngff_time_transform(image) -> dict:
    """The NGFF time calibration (scale/translation/unit) carried by a sim
    or msim; identity when none is stored (reference ngff_utils.py:70)."""
    sims = image.sims if msi_utils.is_msim(image) else [image]
    stored = sims[0].attrs.get("ngff_time_transform") if sims else None
    return {**DEFAULT_NGFF_TIME_TRANSFORM, **(stored or {})}


def set_ngff_time_transform(image, time_transform):
    """Attach an NGFF time calibration to a sim or msim; the identity is
    stored as the ABSENCE of the attr so never-calibrated images stay
    byte-identical (reference ngff_utils.py:81). Msims store one copy per
    scale."""
    time_transform = {
        **DEFAULT_NGFF_TIME_TRANSFORM,
        **(time_transform or {}),
    }
    sims = image.sims if msi_utils.is_msim(image) else [image]
    for s in sims:
        if time_transform == DEFAULT_NGFF_TIME_TRANSFORM:
            s.attrs.pop("ngff_time_transform", None)
        else:
            s.attrs["ngff_time_transform"] = dict(time_transform)
    return image


def copy_ngff_time_transform(source, target):
    """Give ``target`` the time calibration of ``source`` — e.g. a fused
    stack built from a bare array spans the same timepoints as its inputs
    (reference ngff_utils.py:99)."""
    return set_ngff_time_transform(target, get_ngff_time_transform(source))


def mean_dtype(arr, **kwargs):
    """dtype-preserving mean, for pyramid coarsening of integer data
    (reference ngff_utils.py:1284)."""
    return np.mean(arr, **kwargs).astype(arr.dtype)


def update_ome_zarr_multiscales_metadata(zarr_path, msim, transform_key):
    """Rewrite the on-disk multiscales scale/translation from an in-memory
    msim's levels, preserving every other attr (reference
    ngff_utils.py:1814). ``transform_key`` optionally contributes the
    TRANSLATIONAL component of that key's affine; pass None to use each
    level's origin only. Raises when the level counts differ."""
    zarr_path = str(zarr_path)
    attrs, zarr_format = zarr_backend.read_group_metadata(zarr_path)
    ms, _ = _parse_multiscales(attrs)
    datasets = ms["datasets"]
    scale_keys = msi_utils.get_sorted_scale_keys(msim)
    if len(datasets) != len(scale_keys):
        raise ValueError(
            f"On-disk OME-Zarr has {len(datasets)} resolution levels, "
            f"msim has {len(scale_keys)}."
        )
    axes = [a["name"] for a in ms["axes"]]
    sdims = [a for a in axes if a in si_utils.SPATIAL_DIMS]
    for ds, skey in zip(datasets, scale_keys):
        sim = msim.get_scale(skey)
        origin = dict(sim.origin)
        if transform_key is not None:
            aff = np.asarray(
                si_utils.get_affine_from_sim(sim, transform_key).squeeze()
            )
            if aff.ndim == 3:
                aff = aff[0]
            shift = aff[:-1, -1]
            for i, d in enumerate(sdims):
                origin[d] = origin[d] + float(shift[i])
        for tf in ds.get("coordinateTransformations", []):
            if tf["type"] == "scale":
                tf["scale"] = [
                    float(sim.spacing[a]) if a in sdims else s
                    for a, s in zip(axes, tf["scale"])
                ]
            elif tf["type"] == "translation":
                tf["translation"] = [
                    float(origin[a]) if a in sdims else t
                    for a, t in zip(axes, tf["translation"])
                ]
    zarr_backend.write_group_metadata(zarr_path, attrs, zarr_format)


def serve_virtual_ome_zarrs(*args, **kwargs):
    """Re-export (reference exposes virtual serving from ngff_utils)."""
    from multiview_stitcher_tpu.io import virtual_ngff

    return virtual_ngff.serve_virtual_ome_zarrs(*args, **kwargs)


TRANSFORMS_ATTR_KEY = "multiview_stitcher_tpu:transforms"


def _transforms_to_json(transforms: dict) -> dict:
    out = {}
    for key, xaff in transforms.items():
        out[key] = {
            "data": np.asarray(xaff.data).tolist(),
            "t_coords": (
                None
                if xaff.t_coords is None
                else np.asarray(xaff.t_coords).tolist()
            ),
        }
    return out


def _transforms_from_json(payload: dict) -> dict:
    from multiview_stitcher_tpu.param_utils import XAffine

    out = {}
    for key, entry in payload.items():
        out[key] = XAffine(
            np.asarray(entry["data"], dtype=float),
            t_coords=(
                None
                if entry.get("t_coords") is None
                else np.asarray(entry["t_coords"])
            ),
        )
    return out


def update_msim_transforms_zarr(msim_or_transforms, zarr_path):
    """Persist transform keys into the store's group attrs.

    NGFF 0.4/0.5 cannot store affines (reference docs/data_formats.md:35);
    the reference keeps them as datatree data variables — here they live
    under the ``multiview_stitcher_tpu:transforms`` group attribute.
    Reference: msi_utils.update_msim_transforms_zarr:247.
    """
    import json as _json
    import os as _os

    transforms = (
        msim_or_transforms.transforms
        if hasattr(msim_or_transforms, "transforms")
        else msim_or_transforms
    )
    attrs, zarr_format = zarr_backend.read_group_metadata(str(zarr_path))
    attrs[TRANSFORMS_ATTR_KEY] = _transforms_to_json(transforms)
    zarr_backend.write_group_metadata(
        str(zarr_path), attrs, zarr_format=zarr_format
    )


def read_msim_from_ome_zarr(
    zarr_path,
    transform_key: str = si_utils.DEFAULT_TRANSFORM_KEY,
) -> Msim:
    """Read all resolution levels as a lazy msim (restoring stored
    transform keys when present)."""
    attrs, _ = zarr_backend.read_group_metadata(str(zarr_path))
    ms, _ = _parse_multiscales(attrs)
    sims = [
        read_sim_from_ome_zarr(
            zarr_path, resolution_level=level, transform_key=transform_key
        )
        for level in range(len(ms["datasets"]))
    ]
    msim = Msim(sims=sims)
    if TRANSFORMS_ATTR_KEY in attrs:
        msim.transforms.update(
            _transforms_from_json(attrs[TRANSFORMS_ATTR_KEY])
        )
    return msim


def write_msim_to_ome_zarr(msim: Msim, output_zarr_url: str, **kwargs) -> Msim:
    """Write scale0 (pyramid regenerated on write), persist transform keys,
    and reopen lazily."""
    sim = msi_utils.get_sim_from_msim(msim, scale="scale0")
    write_sim_to_ome_zarr(sim, output_zarr_url, **kwargs)
    update_msim_transforms_zarr(msim, output_zarr_url)
    return read_msim_from_ome_zarr(output_zarr_url)


# ---------------------------------------------------------------------------
# ngff-zarr-style in-memory interop (reference ngff_utils.py:1002-1244)
# ---------------------------------------------------------------------------
#
# The reference converts sims <-> the ngff-zarr package's NgffImage /
# Multiscales objects. That package is optional; here the same public
# contract is provided with lightweight first-party containers using the
# identical field names (data/dims/scale/translation, images/metadata), so
# code written against the reference's interop functions carries over.

from dataclasses import dataclass as _dataclass
from dataclasses import field as _field


@_dataclass
class NgffImage:
    """NGFF v0.4 in-memory image (field names match ngff_zarr.NgffImage)."""

    data: object
    dims: list
    scale: dict
    translation: dict
    name: str = "image"


@_dataclass
class NgffMultiscales:
    """Multiscale pyramid of :class:`NgffImage` + NGFF multiscales metadata
    (field names match ngff_zarr.Multiscales)."""

    images: list
    metadata: dict = _field(default_factory=dict)
    scale_factors: list = _field(default_factory=list)


def sim_to_ngff_image(sim: Sim, transform_key: Optional[str]) -> NgffImage:
    """Sim -> NGFF image; the translational part of ``transform_key``'s
    affine folds into the NGFF ``translation`` (reference :1002)."""
    sdims = si_utils.get_spatial_dims_from_sim(sim)
    origin = dict(si_utils.get_origin_from_sim(sim))
    if transform_key is not None:
        mat = np.asarray(
            si_utils.get_affine_from_sim(sim, transform_key).squeeze()
        )
        if mat.ndim == 3:
            mat = mat[0]
        shift = param_utils.translation_from_affine(mat)
        for i, d in enumerate(sdims):
            origin[d] = float(origin[d] + shift[i])
    return NgffImage(
        data=sim.data,
        dims=list(sim.dims),
        scale={d: float(v) for d, v in si_utils.get_spacing_from_sim(sim).items()},
        translation=origin,
    )


def msim_to_ngff_multiscales(msim, transform_key: Optional[str]) -> NgffMultiscales:
    """Msim -> NGFF multiscales with per-level datasets at
    ``scale{i}/image`` paths (reference :1039)."""
    ngff_ims = [
        sim_to_ngff_image(
            msi_utils.get_sim_from_msim(msim, scale=sk), transform_key
        )
        for sk in msi_utils.get_sorted_scale_keys(msim)
    ]
    sim0 = msi_utils.get_sim_from_msim(msim)
    sdims = si_utils.get_spatial_dims_from_sim(sim0)
    nsdims = [d for d in sim0.dims if d not in sdims]
    abs_factors = [
        {d: im.scale[d] / ngff_ims[0].scale[d] for d in sdims}
        for im in ngff_ims
    ]
    coordtfs, axes = calc_ngff_coordinate_transformations_and_axes(
        {
            "spacing": ngff_ims[0].scale,
            "origin": ngff_ims[0].translation,
            "shape": {
                d: int(np.shape(ngff_ims[0].data)[ngff_ims[0].dims.index(d)])
                for d in sdims
            },
        },
        abs_factors,
        nsdims=nsdims,
        time_transform=sim0.attrs.get("ngff_time_transform"),
    )
    metadata = {
        "axes": axes,
        "datasets": [
            {
                "path": f"scale{i}/image",
                "coordinateTransformations": coordtfs[i],
            }
            for i in range(len(ngff_ims))
        ],
        "version": "0.4",
    }
    return NgffMultiscales(
        images=ngff_ims,
        metadata=metadata,
        scale_factors=[
            {d: int(round(f[d])) for d in sdims} for f in abs_factors[1:]
        ],
    )


def ngff_image_to_sim(
    ngff_im, transform_key: str, data=None
) -> Sim:
    """NGFF image -> Sim with an identity affine under ``transform_key``
    (reference :1101). Works with this module's :class:`NgffImage` or any
    object exposing data/dims/scale/translation."""
    sdims = [d for d in ngff_im.dims if d in ("z", "y", "x")]
    sim = si_utils.get_sim_from_array(
        ngff_im.data if data is None else data,
        dims=list(ngff_im.dims),
        scale={d: float(ngff_im.scale[d]) for d in sdims},
        translation={d: float(ngff_im.translation[d]) for d in sdims},
        transform_key=transform_key,
    )
    return sim


def ngff_multiscales_to_msim(
    ngff_multiscales, transform_key: str, data_arrays=None
) -> Msim:
    """NGFF multiscales -> Msim (reference :1142)."""
    if data_arrays is None:
        data_arrays = [None] * len(ngff_multiscales.images)
    sims = [
        ngff_image_to_sim(im, transform_key=transform_key, data=da)
        for im, da in zip(ngff_multiscales.images, data_arrays)
    ]
    return Msim(sims=sims)


def read_ngff_multiscales(zarr_path) -> NgffMultiscales:
    """Parse an OME-Zarr store's multiscales into the in-memory interop
    representation; arrays stay lazy (reference :1175)."""
    attrs, _ = zarr_backend.read_group_metadata(str(zarr_path))
    ms, _ = _parse_multiscales(attrs)
    images = []
    for level in range(len(ms["datasets"])):
        sim = read_sim_from_ome_zarr(zarr_path, resolution_level=level)
        images.append(sim_to_ngff_image(sim, transform_key=None))
    return NgffMultiscales(images=images, metadata=ms)


# virtual OME-Zarr classes live in io/virtual_ngff.py; re-exported here
# because the reference hosts them in ngff_utils (reference :192/:466/:719).
# Lazy (module __getattr__) to avoid an import cycle: virtual_ngff imports
# this module at its top.
_VIRTUAL_REEXPORTS = {
    "VirtualOMEZarr": "VirtualOMEZarr",
    "VirtualOMEZarrPlate": "VirtualOMEZarrPlate",
    "VirtualOMEZarrHCSPlate": "VirtualOMEZarrPlate",
    "VirtualOMEZarrServer": "VirtualOMEZarrServer",
}


def __getattr__(name):
    if name in _VIRTUAL_REEXPORTS:
        from multiview_stitcher_tpu.io import virtual_ngff

        return getattr(virtual_ngff, _VIRTUAL_REEXPORTS[name])
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def write_multiscales_metadata(path, axes, datasets, ngff_version: str = "0.4"):
    """Write only the NGFF ``multiscales`` metadata document for a store
    whose arrays are written separately — block by block, possibly by
    several workers at once (reference :1185). v0.4 keeps ``multiscales``
    at the top level; v0.5 nests it inside ``ome``."""
    multiscale = {"axes": list(axes), "datasets": list(datasets)}
    if ngff_version == "0.4":
        attrs = {"multiscales": [dict(multiscale, version="0.4")]}
        zarr_format = 2
    else:
        attrs = {"ome": {"version": "0.5", "multiscales": [multiscale]}}
        zarr_format = 3
    zarr_backend.write_group_metadata(
        str(path), attrs, zarr_format=zarr_format
    )
