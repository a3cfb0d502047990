"""Imaris (.ims) HDF5 reading.

Rebuild of the reference's ``imaris_utils``
(/root/reference/src/multiview_stitcher/imaris_utils.py): reads the Imaris
``DataSet/ResolutionLevel i/TimePoint t/Channel c/Data`` pyramid with
spacing/origin from ``DataSetInfo/Image`` extents into a lazy msim (data read
per-window through h5py on access).
"""

from __future__ import annotations


import h5py
import numpy as np

from multiview_stitcher_tpu import msi_utils, si_utils
from multiview_stitcher_tpu.msi_utils import Msim

SPATIAL_DIMS = ["z", "y", "x"]
IMARIS_SPATIAL_DIMS = ["x", "y", "z"]


def _decode_attr(value, dtype=str):
    if isinstance(value, bytes):
        value = value.decode()
    elif isinstance(value, np.ndarray):
        value = b"".join(
            v if isinstance(v, bytes) else str(v).encode() for v in value
        ).decode()
    return dtype(value)


def get_group_path(ires=0, itime=0, ichannel=0) -> str:
    return (
        f"DataSet/ResolutionLevel {ires}/TimePoint {itime}/Channel {ichannel}"
    )


def get_shape_from_group(filename, group_path):
    with h5py.File(filename, "r") as f:
        attrs = f[group_path].attrs
        return {
            d: _decode_attr(attrs[f"ImageSize{d.upper()}"], dtype=int)
            for d in SPATIAL_DIMS
        }


def get_spacing_from_ims(filename):
    with h5py.File(filename, "r") as f:
        attrs = f["DataSetInfo/Image"].attrs
        return {
            d: (
                _decode_attr(attrs[f"ExtMax{i}"], dtype=float)
                - _decode_attr(attrs[f"ExtMin{i}"], dtype=float)
            )
            / _decode_attr(attrs[d.upper()], dtype=float)
            for i, d in enumerate(IMARIS_SPATIAL_DIMS)
        }


def get_origin_from_ims(filename):
    with h5py.File(filename, "r") as f:
        attrs = f["DataSetInfo/Image"].attrs
        return {
            d: _decode_attr(attrs[f"ExtMin{i}"], dtype=float)
            for i, d in enumerate(IMARIS_SPATIAL_DIMS)
        }


class LazyHDF5Array:
    """Lazy window-read array over an HDF5 dataset."""

    def __init__(self, filename, dataset, shape=None, dtype=None):
        self.filename = str(filename)
        self.dataset = dataset
        if shape is None or dtype is None:
            with h5py.File(self.filename, "r") as f:
                ds = f[self.dataset]
                shape = ds.shape
                dtype = ds.dtype
        self.shape = tuple(shape)
        self.dtype = np.dtype(dtype)
        self.ndim = len(self.shape)

    def __getitem__(self, idx):
        with h5py.File(self.filename, "r", locking=False) as f:
            return np.asarray(f[self.dataset][idx])

    def __array__(self, dtype=None):
        out = self[tuple(slice(None) for _ in self.shape)]
        return out.astype(dtype) if dtype is not None else out


def _read_imaris_into_msim_single_field(filename, itime=0, ichannel=0) -> Msim:
    with h5py.File(filename, "r") as f:
        n_res = len(f["DataSet"].keys())

    spacing0 = get_spacing_from_ims(filename)
    origin = get_origin_from_ims(filename)
    shape0 = get_shape_from_group(
        filename, get_group_path(0, itime, ichannel)
    )

    sims = []
    for ires in range(n_res):
        group_path = get_group_path(ires, itime, ichannel)
        shape = get_shape_from_group(filename, group_path)
        spacing = {
            d: spacing0[d] * shape0[d] / shape[d] for d in SPATIAL_DIMS
        }
        arr = LazyHDF5Array(filename, f"{group_path}/Data")
        # Imaris datasets may be padded beyond the image size
        data = _SlicedLazy(arr, tuple(slice(0, shape[d]) for d in SPATIAL_DIMS))
        sims.append(
            si_utils.get_sim_from_array(
                data,
                dims=SPATIAL_DIMS,
                scale=spacing,
                translation=origin,
            )
        )
    return msi_utils.get_msim_from_sims(sims)


class _SlicedLazy:
    """Lazy view applying a base slice to a lazy array."""

    def __init__(self, base, slices):
        self.base = base
        self.slices = slices
        self.shape = tuple(
            len(range(*sl.indices(s))) for sl, s in zip(slices, base.shape)
        )
        self.dtype = base.dtype
        self.ndim = len(self.shape)

    def _compose(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        if Ellipsis in idx:
            i = idx.index(Ellipsis)
            idx = (
                idx[:i]
                + (slice(None),) * (self.ndim - (len(idx) - 1))
                + idx[i + 1:]
            )
        idx = idx + (slice(None),) * (self.ndim - len(idx))
        out = []
        for sl, i, s in zip(self.slices, idx, self.base.shape):
            start = sl.start or 0
            if isinstance(i, slice):
                i0, i1, _ = i.indices(self.shape[len(out)])
                out.append(slice(start + i0, start + i1))
            else:
                out.append(start + int(i))
        return tuple(out)

    def __getitem__(self, idx):
        return self.base[self._compose(idx)]

    def __array__(self, dtype=None):
        out = self.base[self.slices]
        return out.astype(dtype) if dtype is not None else np.asarray(out)


def read_imaris_into_msim(filename, itime: int = 0, channels=None) -> Msim:
    """Read an Imaris .ims file into a (lazy) msim (reference :187)."""
    with h5py.File(filename, "r") as f:
        tp_path = f"DataSet/ResolutionLevel 0/TimePoint {itime}"
        n_channels = len(f[tp_path].keys())
    if channels is None:
        channels = range(n_channels)
    channels = list(channels)
    if not channels:
        raise ValueError("channels must contain at least one channel.")

    msims = [
        _read_imaris_into_msim_single_field(filename, itime, ich)
        for ich in channels
    ]
    if len(msims) == 1:
        return msims[0]
    # concat channels at each scale (materializes data)
    out_sims = []
    for i in range(len(msims[0].sims)):
        out_sims.append(
            si_utils.stack(
                [m.sims[i] for m in msims], "c",
                coords=[str(c) for c in channels],
            )
        )
    return Msim(sims=out_sims)
