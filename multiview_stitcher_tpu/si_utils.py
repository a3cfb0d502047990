"""Spatial image data model.

TPU-native rebuild of the reference's ``spatial_image_utils``
(/root/reference/src/multiview_stitcher/spatial_image_utils.py). The reference
represents a "sim" as an ``xarray.DataArray`` with dims ⊆ (t, c, z, y, x),
pixel-center physical coordinates per spatial dim, and named affine transforms
in ``.attrs["transforms"]``. This environment has no xarray/dask, and the TPU
compute path wants plain arrays + static metadata anyway, so a sim here is a
light :class:`Sim` dataclass carrying:

- ``data``: numpy array, jax array, or any lazy array handle exposing
  ``shape``/``dtype``/``__getitem__`` (e.g. a tensorstore-backed zarr array);
- ``dims``: tuple of dim names, ordered subset of ('t','c','z','y','x');
- ``spacing``/``origin``: physical pixel spacing and origin per spatial dim
  (pixel-center convention: coord = origin + spacing * index, reference
  spatial_image_utils.py:316);
- ``transforms``: dict transform_key -> :class:`~.param_utils.XAffine`
  mapping intrinsic physical coords into named world coordinate systems;
- ``coords``: explicit coordinates for non-spatial dims (t, c).

Module-level accessor functions mirror the reference API names so downstream
layers (registration / fusion / io) read the same way.
"""

from __future__ import annotations

import copy as _copy
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Sequence

import numpy as np

from multiview_stitcher_tpu import param_utils
from multiview_stitcher_tpu.param_utils import XAffine

DEFAULT_TRANSFORM_KEY = "affine_metadata"
SPATIAL_DIMS = ["z", "y", "x"]
ALL_DIMS = ["t", "c", "z", "y", "x"]

DEFAULT_SPATIAL_CHUNKSIZES_3D = {dim: 256 for dim in ["z", "y", "x"]}
DEFAULT_SPATIAL_CHUNKSIZES_2D = {dim: 2048 for dim in ["y", "x"]}


def _is_lazy(data) -> bool:
    """True for array handles that should not be materialized eagerly."""
    return not isinstance(data, np.ndarray) and not hasattr(data, "__array_namespace__") and (
        type(data).__module__.split(".")[0]
        not in ("numpy", "jax", "jaxlib")
    )


@dataclass
class Sim:
    """Spatial image: array + physical metadata + named affine transforms."""

    data: Any
    dims: tuple
    spacing: Dict[str, float] = field(default_factory=dict)
    origin: Dict[str, float] = field(default_factory=dict)
    coords: Dict[str, np.ndarray] = field(default_factory=dict)
    transforms: Dict[str, XAffine] = field(default_factory=dict)
    name: Optional[str] = None
    attrs: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        self.dims = tuple(self.dims)
        assert len(self.dims) == len(self.data.shape), (
            f"dims {self.dims} vs data shape {self.data.shape}"
        )
        sdims = [d for d in self.dims if d in SPATIAL_DIMS]
        for d in sdims:
            self.spacing.setdefault(d, 1.0)
            self.origin.setdefault(d, 0.0)
        self.spacing = {d: float(self.spacing[d]) for d in sdims}
        self.origin = {d: float(self.origin[d]) for d in sdims}
        for d in self.dims:
            if d not in SPATIAL_DIMS and d not in self.coords:
                self.coords[d] = np.arange(self.data.shape[self.dims.index(d)])

    # ------------------------------------------------------------------
    @property
    def shape(self) -> tuple:
        return tuple(self.data.shape)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def ndim(self) -> int:
        return len(self.dims)

    @property
    def sizes(self) -> Dict[str, int]:
        return {d: s for d, s in zip(self.dims, self.shape)}

    @property
    def spatial_dims(self) -> list:
        return [d for d in self.dims if d in SPATIAL_DIMS]

    @property
    def nsdims(self) -> list:
        return [d for d in self.dims if d not in SPATIAL_DIMS]

    def dim_index(self, dim: str) -> int:
        return self.dims.index(dim)

    def spatial_coords(self, dim: str) -> np.ndarray:
        n = self.sizes[dim]
        return self.origin[dim] + self.spacing[dim] * np.arange(n, dtype=float)

    # ------------------------------------------------------------------
    def to_numpy(self) -> np.ndarray:
        """Materialize data as a numpy array."""
        return np.asarray(self.data[...] if _is_lazy(self.data) else self.data)

    def copy(self, data=None, deep: bool = False) -> "Sim":
        return Sim(
            data=self.data if data is None else data,
            dims=self.dims,
            spacing=dict(self.spacing),
            origin=dict(self.origin),
            coords={k: np.asarray(v).copy() for k, v in self.coords.items()},
            transforms={k: v.copy() for k, v in self.transforms.items()},
            name=self.name,
            attrs=_copy.deepcopy(self.attrs) if deep else dict(self.attrs),
        )

    def astype(self, dtype) -> "Sim":
        return self.copy(data=np.asarray(self.to_numpy(), dtype=dtype))

    # indexing -----------------------------------------------------------
    def isel(self, indexers: Dict[str, Any] = None, drop_scalar: bool = True, **kw) -> "Sim":
        """Integer-index along named dims (scalars drop the dim)."""
        indexers = dict(indexers or {})
        indexers.update(kw)
        slicer = []
        new_dims = []
        for d in self.dims:
            if d in indexers:
                idx = indexers[d]
                if np.isscalar(idx) or (isinstance(idx, np.ndarray) and idx.ndim == 0):
                    idx = int(idx)
                    slicer.append(idx)
                    if not drop_scalar:
                        new_dims.append(d)
                    continue
                slicer.append(idx)
                new_dims.append(d)
            else:
                slicer.append(slice(None))
                new_dims.append(d)
        data = self.data[tuple(slicer)]
        out = Sim(
            data=data,
            dims=tuple(new_dims),
            spacing={d: v for d, v in self.spacing.items() if d in new_dims},
            origin=dict(self.origin),
            coords={},
            transforms={},
            name=self.name,
            attrs=dict(self.attrs),
        )
        # spatial slices shift origin
        for d in out.spatial_dims:
            if d in indexers and isinstance(indexers[d], slice):
                start = indexers[d].start or 0
                out.origin[d] = self.origin[d] + start * self.spacing[d]
                step = indexers[d].step or 1
                out.spacing[d] = self.spacing[d] * step
            else:
                out.origin[d] = self.origin[d]
        out.origin = {d: out.origin[d] for d in out.spatial_dims}
        # non-spatial coords
        for d in self.coords:
            if d not in new_dims:
                continue
            if d in indexers:
                out.coords[d] = np.atleast_1d(np.asarray(self.coords[d])[indexers[d]])
            else:
                out.coords[d] = np.asarray(self.coords[d]).copy()
        # transforms: select t if t was indexed
        for key, xaff in self.transforms.items():
            if "t" in indexers and xaff.has_t:
                idx = indexers["t"]
                if np.isscalar(idx):
                    out.transforms[key] = XAffine(xaff.data[int(idx)])
                else:
                    out.transforms[key] = XAffine(
                        xaff.data[idx], t_coords=xaff.t_coords[idx]
                    )
            else:
                out.transforms[key] = xaff.copy()
        return out

    def sel_coords(self, sel_dict: Dict[str, Any]) -> "Sim":
        return sim_sel_coords(self, sel_dict)

    def expand_dims(self, dim: str, coords=None) -> "Sim":
        assert dim not in self.dims
        order = [d for d in ALL_DIMS if d == dim or d in self.dims]
        axis = order.index(dim)
        if _is_lazy(self.data):
            from multiview_stitcher_tpu import zarr_utils

            data = zarr_utils.expand_dims(self.data, axis=axis)
        else:
            data = np.expand_dims(self.to_numpy(), axis=axis)
        new_coords = {k: np.asarray(v).copy() for k, v in self.coords.items()}
        new_coords[dim] = (
            np.asarray(coords) if coords is not None else np.arange(1)
        )
        return Sim(
            data=data,
            dims=tuple(order),
            spacing=dict(self.spacing),
            origin=dict(self.origin),
            coords=new_coords,
            transforms={k: v.copy() for k, v in self.transforms.items()},
            name=self.name,
            attrs=dict(self.attrs),
        )


# ---------------------------------------------------------------------------
# constructors (reference: to_spatial_image:320, get_sim_from_array:416)
# ---------------------------------------------------------------------------


def to_spatial_image(data, dims=None, scale=None, translation=None,
                     c_coords=None, t_coords=None, name=None) -> Sim:
    if scale is None or translation is None:
        raise ValueError("scale and translation must be provided")
    if isinstance(data, Sim):
        name = name or data.name
        data = data.data
    if dims is None:
        dims = SPATIAL_DIMS[-len(data.shape):]
    coords = {}
    dims = tuple(dims)
    if "c" in dims and c_coords is not None:
        coords["c"] = np.asarray(c_coords)
    if "t" in dims and t_coords is not None:
        coords["t"] = np.asarray(t_coords)
    sdims = [d for d in dims if d in SPATIAL_DIMS]
    return Sim(
        data=data,
        dims=dims,
        spacing={d: scale[d] for d in sdims},
        origin={d: translation[d] for d in sdims},
        coords=coords,
        name=name,
    )


def get_sim_from_array(
    array,
    dims=None,
    scale: Optional[dict] = None,
    translation: Optional[dict] = None,
    affine=None,
    transform_key: str = DEFAULT_TRANSFORM_KEY,
    c_coords=None,
    t_coords=None,
) -> Sim:
    """Construct a sim from an array-like (reference spatial_image_utils.py:416)."""
    if isinstance(array, Sim):
        sim = array.copy()
        if dims is not None and tuple(dims) != sim.dims:
            raise NotImplementedError("transpose of Sim dims")
    else:
        if dims is None:
            dims = ALL_DIMS[-len(array.shape):]
        sdims = [d for d in dims if d in SPATIAL_DIMS]
        scale = scale or {d: 1.0 for d in sdims}
        translation = translation or {d: 0.0 for d in sdims}
        sim = to_spatial_image(
            array, dims=dims, scale=scale, translation=translation,
            c_coords=c_coords, t_coords=t_coords,
        )
    if scale is not None:
        sim.spacing = {d: float(scale[d]) for d in sim.spatial_dims}
    if translation is not None:
        sim.origin = {d: float(translation[d]) for d in sim.spatial_dims}

    ndim = len(sim.spatial_dims)
    if affine is None:
        affine = param_utils.affine_to_xaffine(
            np.eye(ndim + 1),
            t_coords=sim.coords["t"] if "t" in sim.dims else None,
        )
    else:
        affine = param_utils.to_xaffine(affine)
    set_sim_affine(sim, affine, transform_key=transform_key)
    return sim


# ---------------------------------------------------------------------------
# accessors
# ---------------------------------------------------------------------------


def get_spatial_dims_from_sim(sim: Sim):
    return sim.spatial_dims


def get_nonspatial_dims_from_sim(sim: Sim):
    return sim.nsdims


def get_ndim_from_sim(sim: Sim) -> int:
    return len(sim.spatial_dims)


def get_dims_from_sim(sim: Sim):
    return list(sim.dims)


def get_spacing_from_sim(sim: Sim, asarray: bool = False):
    if asarray:
        return np.array([sim.spacing[d] for d in sim.spatial_dims])
    return dict(sim.spacing)


def get_origin_from_sim(sim: Sim, asarray: bool = False):
    if asarray:
        return np.array([sim.origin[d] for d in sim.spatial_dims])
    return dict(sim.origin)


def get_shape_from_sim(sim: Sim, asarray: bool = False):
    sdims = sim.spatial_dims
    sizes = sim.sizes
    if asarray:
        return np.array([sizes[d] for d in sdims])
    return {d: sizes[d] for d in sdims}


def get_stack_properties_from_sim(sim: Sim, transform_key=None, asarray: bool = False):
    """Stack properties: shape/spacing/origin (+ transform if key given).

    Reference: spatial_image_utils.py:863.
    """
    props = {
        "shape": get_shape_from_sim(sim, asarray=asarray),
        "spacing": get_spacing_from_sim(sim, asarray=asarray),
        "origin": get_origin_from_sim(sim, asarray=asarray),
    }
    if transform_key is not None:
        props["transform"] = get_affine_from_sim(sim, transform_key)
    return props


def get_extent_from_sim(sim: Sim):
    sp = get_stack_properties_from_sim(sim)
    return {
        d: (sp["shape"][d] - 1) * sp["spacing"][d] for d in sp["shape"]
    }


def extend_stack_props(stack_props, extend_by):
    """Extend stack props outward by physical amount per side (reference :889)."""
    sdims = [d for d in SPATIAL_DIMS if d in stack_props["spacing"]]
    if not isinstance(extend_by, dict):
        extend_by = {d: extend_by for d in sdims}
    stack_props = {
        "shape": dict(stack_props["shape"]),
        "spacing": dict(stack_props["spacing"]),
        "origin": dict(stack_props["origin"]),
        **{k: v for k, v in stack_props.items()
           if k not in ("shape", "spacing", "origin")},
    }
    for d, val in extend_by.items():
        stack_props["shape"][d] += int(np.ceil(2 * val / stack_props["spacing"][d]))
        stack_props["origin"][d] -= val
    return stack_props


def get_center_of_sim(sim: Sim, transform_key=None) -> np.ndarray:
    """Physical center of the sim, optionally mapped through a transform key."""
    sdims = sim.spatial_dims
    center = np.array(
        [
            sim.origin[d] + sim.spacing[d] * (sim.sizes[d] - 1) / 2
            for d in sdims
        ]
    )
    if transform_key is not None:
        aff = get_affine_from_sim(sim, transform_key).squeeze()
        if aff.ndim == 3:
            aff = aff[0]
        center = param_utils.transform_pts([center], aff)[0]
    return center


def get_affine_from_sim(sim: Sim, transform_key: str) -> XAffine:
    if transform_key not in sim.transforms:
        raise KeyError(f"Transform key {transform_key} not found in sim")
    return sim.transforms[transform_key]


def get_tranform_keys_from_sim(sim: Sim):
    return list(sim.transforms.keys())


def set_sim_affine(sim: Sim, xaffine, transform_key: str = DEFAULT_TRANSFORM_KEY,
                   base_transform_key: Optional[str] = None):
    """Attach an affine under ``transform_key``; optionally compose with base.

    Reference: spatial_image_utils.py:1234.
    """
    xaffine = param_utils.to_xaffine(xaffine)
    if base_transform_key is not None:
        base = get_affine_from_sim(sim, base_transform_key)
        xaffine = param_utils.rebase_affine(xaffine, base)
    sim.transforms[transform_key] = xaffine
    return sim


def sim_sel_coords(sim: Sim, sel_dict: Dict[str, Any]) -> Sim:
    """Select by coordinate value (reference :1278).

    Non-spatial dims select by exact coord value; spatial dims accept
    WORLD-coordinate slices (inclusive bounds, like xarray label slicing).
    A spatial selection also filters every attached point set to the
    selected world window (reference spatial_image_utils.py:1278 +
    point-set semantics, _tests/test_spatial_image_utils.py:525).
    """
    indexers = {}
    sdims = sim.spatial_dims
    spatial_window = {}
    for dim, value in sel_dict.items():
        if dim in sdims and isinstance(value, slice):
            o, sp = sim.origin[dim], sim.spacing[dim]
            lo = value.start if value.start is not None else -np.inf
            hi = value.stop if value.stop is not None else np.inf
            i0 = max(0, int(np.ceil((lo - o) / sp - 1e-9)))
            i1 = min(
                sim.sizes[dim] - 1, int(np.floor((hi - o) / sp + 1e-9))
            )
            indexers[dim] = slice(i0, i1 + 1)
            spatial_window[dim] = (o + i0 * sp, o + i1 * sp)
            continue
        coords = np.asarray(sim.coords.get(dim, np.arange(sim.sizes[dim])))
        if np.isscalar(value) or np.asarray(value).ndim == 0:
            matches = np.where(coords == value)[0]
            if not len(matches):
                raise KeyError(f"coord {value!r} not found along {dim!r}")
            indexers[dim] = int(matches[0])
        else:
            indexers[dim] = np.array(
                [int(np.where(coords == v)[0][0]) for v in np.asarray(value)]
            )
    out = sim.isel(indexers)
    if spatial_window and "point_sets" in out.attrs:
        out.attrs = dict(out.attrs)
        out.attrs["point_sets"] = {
            key: point_set_sel_coords(
                pts,
                {d: slice(*spatial_window[d]) for d in spatial_window},
                sdims=sdims,
            )
            for key, pts in out.attrs["point_sets"].items()
        }
    return out


def point_set_sel_coords(point_set, sel_dict, sdims=("z", "y", "x")):
    """Filter an (N, ndim) point set by world-coordinate bounds.

    ``sel_dict`` maps spatial dims to slices (inclusive bounds) or
    scalar values (exact match within tolerance); columns are ordered
    like ``sdims`` (trailing ndim entries used). Reference:
    spatial_image_utils.point_set_sel_coords:1185.
    """
    pts = np.asarray(point_set, dtype=float)
    if pts.ndim != 2:
        raise ValueError(f"point set must be (N, ndim), got {pts.shape}")
    dims = list(sdims)[-pts.shape[1]:]
    keep = np.ones(len(pts), dtype=bool)
    for i, d in enumerate(dims):
        if d not in sel_dict:
            continue
        v = sel_dict[d]
        if isinstance(v, slice):
            lo = v.start if v.start is not None else -np.inf
            hi = v.stop if v.stop is not None else np.inf
            keep &= (pts[:, i] >= lo - 1e-9) & (pts[:, i] <= hi + 1e-9)
        else:
            keep &= np.abs(pts[:, i] - float(v)) <= 1e-9
    return pts[keep]


def process_fields(sim: Sim, func, **func_kwargs) -> Sim:
    """Apply ``func`` to every non-spatial field's spatial block and
    reassemble (reference spatial_image_utils.process_fields:1318, an
    xr.apply_ufunc over core spatial dims). ``func`` maps an
    ndim-spatial array to a same-shape array."""
    nsdims = get_nonspatial_dims_from_sim(sim)
    data = np.asarray(sim.data)
    lead = data.shape[: len(nsdims)]
    flat = data.reshape((-1,) + data.shape[len(nsdims):])
    out = np.stack([np.asarray(func(f, **func_kwargs)) for f in flat])
    if out.shape[1:] != flat.shape[1:]:
        raise ValueError(
            f"func changed the spatial shape {flat.shape[1:]} -> "
            f"{out.shape[1:]}; process_fields requires same-shape output."
        )
    return sim.copy(data=out.reshape(lead + out.shape[1:]))


def ensure_time_dim(sim: Sim) -> Sim:
    if "t" in sim.dims:
        return sim
    out = sim.expand_dims("t")
    for key, xaff in list(out.transforms.items()):
        if not xaff.has_t:
            out.transforms[key] = XAffine(
                xaff.data[None], t_coords=out.coords["t"]
            )
    return out


def ensure_dim(sim: Sim, dim: str) -> Sim:
    if dim in sim.dims:
        return sim
    if dim == "t":
        return ensure_time_dim(sim)
    return sim.expand_dims(dim)


def get_sim_field(sim: Sim, ns_coords: Optional[Dict[str, Any]] = None) -> Sim:
    """Drop non-spatial dims by selecting one coordinate per dim (first by
    default). Reference: spatial_image_utils.get_sim_field."""
    nsdims = get_nonspatial_dims_from_sim(sim)
    if not nsdims:
        return sim
    ns_coords = ns_coords or {}
    sel = {
        nd: ns_coords.get(nd, np.asarray(sim.coords[nd])[0]) for nd in nsdims
    }
    return sim_sel_coords(sim, sel)


def set_point_set(sim: Sim, points, points_key: str = "beads"):
    """Attach a named point set (N, ndim intrinsic physical coords).

    Reference: spatial_image_utils.py:1083.
    """
    sim.attrs.setdefault("point_sets", {})[points_key] = np.asarray(
        points, dtype=float
    )
    return sim


def get_point_set(sim: Sim, points_key: str = "beads") -> np.ndarray:
    return sim.attrs["point_sets"][points_key]


def get_default_spatial_chunksizes(ndim: int):
    assert ndim in (2, 3)
    return (
        dict(DEFAULT_SPATIAL_CHUNKSIZES_2D)
        if ndim == 2
        else dict(DEFAULT_SPATIAL_CHUNKSIZES_3D)
    )


def normalize_to_spatial_dict(value, sdims, name="value"):
    if isinstance(value, dict):
        missing = [d for d in sdims if d not in value]
        if missing:
            raise ValueError(f"{name} is missing values for spatial dimensions {missing}.")
        return {d: float(value[d]) for d in sdims}
    return {d: float(value) for d in sdims}


def max_project_sim(sim: Sim, dim: str) -> Sim:
    """Maximum-intensity projection along a spatial dim."""
    axis = sim.dim_index(dim)
    data = np.nanmax(sim.to_numpy(), axis=axis)
    new_dims = tuple(d for d in sim.dims if d != dim)
    out = Sim(
        data=data,
        dims=new_dims,
        spacing={d: v for d, v in sim.spacing.items() if d != dim},
        origin={d: v for d, v in sim.origin.items() if d != dim},
        coords={d: v for d, v in sim.coords.items() if d != dim},
        name=sim.name,
        attrs=dict(sim.attrs),
    )
    # project transforms: drop the projected dim's row/col
    ndim_in = len(sim.spatial_dims)
    keep = [i for i, d in enumerate(sim.spatial_dims) if d != dim]
    for key, xaff in sim.transforms.items():
        def proj(mat):
            idx = keep + [ndim_in]
            return mat[np.ix_(idx, idx)]
        if xaff.has_t:
            out.transforms[key] = XAffine(
                np.stack([proj(m) for m in xaff.data]), t_coords=xaff.t_coords
            )
        else:
            out.transforms[key] = XAffine(proj(xaff.data))
    return out


# ---------------------------------------------------------------------------
# combine: concat / stack along non-spatial dims (reference :1454/:1487)
# ---------------------------------------------------------------------------


def _merge_transforms(sims: Sequence[Sim], dim: str, coords) -> Dict[str, XAffine]:
    """Transform-key merge semantics: the key set is the UNION over the
    inputs (a key carried by only one view — e.g. a separately registered
    sim — survives the combine); per key, concat over t when dim=='t' and
    every sim carries it, otherwise share the first carrier's transform.

    Reference: spatial_image_utils.py:1416-1439 (Appendix D of SURVEY.md).
    """
    out = {}
    keys: list = []
    for s in sims:
        for k in s.transforms:
            if k not in keys:
                keys.append(k)
    for key in keys:
        carriers = [s for s in sims if key in s.transforms]
        if len(carriers) < len(sims):
            out[key] = carriers[0].transforms[key].copy()
            continue
        xaffs = [s.transforms[key] for s in sims]
        if dim == "t" and all(x.has_t or True for x in xaffs):
            datas, tcs = [], []
            for s, x in zip(sims, xaffs):
                if x.has_t:
                    datas.append(x.data)
                    tcs.append(np.asarray(x.t_coords))
                else:
                    tc = np.asarray(s.coords.get("t", np.arange(1)))
                    datas.append(np.broadcast_to(x.data, (len(tc),) + x.data.shape))
                    tcs.append(tc)
            out[key] = XAffine(np.concatenate(datas), t_coords=np.asarray(coords))
        else:
            out[key] = xaffs[0].copy()
    return out


def concat(sims: Sequence[Sim], dim: str) -> Sim:
    """Concatenate sims along an existing or new non-spatial dim.

    When every input is lazily backed (zarr/tensorstore handles), the result
    stays lazy through a virtual index-mapping view (reference keeps
    zarr-backing via virtual stores, spatial_image_utils.py:1356 /
    SURVEY.md Appendix D).
    """
    sims = [ensure_dim(s, dim) for s in sims]
    axis = sims[0].dim_index(dim)
    if all(_is_lazy(s.data) for s in sims):
        from multiview_stitcher_tpu import zarr_utils

        data = zarr_utils.concatenate([s.data for s in sims], axis=axis)
    else:
        data = np.concatenate([s.to_numpy() for s in sims], axis=axis)
    coords = np.concatenate([np.asarray(s.coords[dim]) for s in sims])
    out = sims[0].copy(data=data)
    out.coords[dim] = coords
    out.transforms = _merge_transforms(sims, dim, coords)
    return out


def stack(sims: Sequence[Sim], dim: str, coords=None) -> Sim:
    """Stack sims along a new non-spatial dim."""
    if dim in sims[0].dims:
        raise ValueError(
            f"stack dim {dim!r} already exists; use concat to join along "
            "an existing dim."
        )
    expanded = [s.expand_dims(dim, coords=[i]) for i, s in enumerate(sims)]
    out = concat(expanded, dim)
    if coords is not None:
        out.coords[dim] = np.asarray(coords)
    return out


def serialize_zarr_backed_sim(sim: Sim) -> dict:
    """Lightweight JSON-able payload for task graphs: the tensorstore
    spec of the backing zarr array + physical metadata + transforms
    (reference spatial_image_utils.py:712 — data is reopened at the
    worker, never shipped)."""
    from multiview_stitcher_tpu.io.zarr_backend import LazyTSArray

    data = sim.data
    if not isinstance(data, LazyTSArray):
        raise ValueError(
            "serialize_zarr_backed_sim requires a zarr-backed sim "
            "(data opened through io.zarr_backend / io.ngff_utils)."
        )
    return {
        "ts_spec": data._store.spec(minimal_spec=True).to_json(),
        "dims": list(sim.dims),
        "spacing": {d: float(v) for d, v in sim.spacing.items()},
        "origin": {d: float(v) for d, v in sim.origin.items()},
        "c_coords": (
            np.asarray(sim.coords["c"]).tolist() if "c" in sim.dims else None
        ),
        "t_coords": (
            np.asarray(sim.coords["t"]).tolist() if "t" in sim.dims else None
        ),
        "transforms": {
            k: {
                "data": np.asarray(v.data).tolist(),
                "t_coords": (
                    np.asarray(v.t_coords).tolist()
                    if v.t_coords is not None
                    else None
                ),
            }
            for k, v in sim.transforms.items()
        },
    }


def deserialize_zarr_backed_sim(payload: dict) -> Sim:
    """Rebuild a lazy zarr-backed sim from
    :func:`serialize_zarr_backed_sim`'s payload (reference
    spatial_image_utils.py:761)."""
    import tensorstore as ts

    from multiview_stitcher_tpu.io.zarr_backend import LazyTSArray

    data = LazyTSArray(ts.open(payload["ts_spec"]).result())
    sim = get_sim_from_array(
        data,
        dims=tuple(payload["dims"]),
        scale=payload["spacing"],
        translation=payload["origin"],
        c_coords=payload["c_coords"],
        t_coords=payload["t_coords"],
    )
    sim.transforms = {
        k: XAffine(
            np.asarray(v["data"]),
            t_coords=(
                np.asarray(v["t_coords"])
                if v["t_coords"] is not None
                else None
            ),
        )
        for k, v in payload["transforms"].items()
    }
    return sim
