"""Minimal TIFF reading and writing (no tifffile dependency).

Rebuild of the reference's ``tif_utils``
(/root/reference/src/multiview_stitcher/tif_utils.py) without the tifffile
dependency (not available in this environment): a self-contained TIFF codec
for grayscale multi-page files with 8/16/32-bit unsigned-integer and
32/64-bit float samples; compression none/LZW/Deflate/PackBits (+ TIFF
predictor 2) through the native codec layer in :mod:`.codecs` — sufficient
for the IO the reference's TIFF paths provide (plane-chunked lazy reads,
``save_sim_as_tif``). Plane reads are lazy: pages are parsed up-front but
pixel data is read on demand per page.
"""

from __future__ import annotations

import struct
from typing import List

import numpy as np

from multiview_stitcher_tpu import msi_utils, si_utils
from multiview_stitcher_tpu.io import codecs
from multiview_stitcher_tpu.si_utils import Sim

# TIFF tag ids
_TAG_WIDTH = 256
_TAG_LENGTH = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_BYTE_COUNTS = 279
_TAG_PREDICTOR = 317
_TAG_SAMPLE_FORMAT = 339

_COMPRESSION_NAMES = {
    "none": codecs.TIFF_COMPRESSION_NONE,
    "lzw": codecs.TIFF_COMPRESSION_LZW,
    "deflate": codecs.TIFF_COMPRESSION_DEFLATE,
    "zlib": codecs.TIFF_COMPRESSION_DEFLATE,
    "packbits": codecs.TIFF_COMPRESSION_PACKBITS,
}

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 11: 4, 12: 8}
_TYPE_FMT = {3: "H", 4: "I"}


def _dtype_for(bits: int, sample_format: int) -> np.dtype:
    if sample_format == 3:
        return np.dtype({32: "<f4", 64: "<f8"}[bits])
    if sample_format == 2:
        return np.dtype(f"<i{bits // 8}")
    return np.dtype(f"<u{bits // 8}")


class TiffPage:
    def __init__(self, shape, dtype, strip_offsets, strip_byte_counts,
                 rows_per_strip, compression=1, predictor=1):
        self.shape = shape
        self.dtype = dtype
        self.strip_offsets = strip_offsets
        self.strip_byte_counts = strip_byte_counts
        self.rows_per_strip = rows_per_strip
        self.compression = compression
        self.predictor = predictor


class TiffFile:
    """Parse a baseline TIFF; read pages lazily."""

    def __init__(self, path):
        self.path = str(path)
        self.pages: List[TiffPage] = []
        with open(self.path, "rb") as f:
            header = f.read(8)
            if header[:2] == b"II":
                self._e = "<"
            elif header[:2] == b"MM":
                self._e = ">"
            else:
                raise ValueError(f"Not a TIFF file: {path}")
            magic, offset = struct.unpack(self._e + "HI", header[2:8])
            if magic != 42:
                raise ValueError("Only classic (non-Big) TIFF supported.")
            while offset:
                offset = self._parse_ifd(f, offset)

    def _read_tag_values(self, f, ttype, count, value_bytes):
        size = _TYPE_SIZES.get(ttype, 1) * count
        if size <= 4:
            data = value_bytes[:size]
        else:
            (ptr,) = struct.unpack(self._e + "I", value_bytes)
            pos = f.tell()
            f.seek(ptr)
            data = f.read(size)
            f.seek(pos)
        if ttype == 3:
            return list(struct.unpack(self._e + "H" * count, data))
        if ttype == 4:
            return list(struct.unpack(self._e + "I" * count, data))
        if ttype == 1:
            return list(data)
        return [data]

    def _parse_ifd(self, f, offset):
        f.seek(offset)
        (n_entries,) = struct.unpack(self._e + "H", f.read(2))
        tags = {}
        for _ in range(n_entries):
            entry = f.read(12)
            tag, ttype, count = struct.unpack(self._e + "HHI", entry[:8])
            tags[tag] = self._read_tag_values(f, ttype, count, entry[8:12])
        (next_offset,) = struct.unpack(self._e + "I", f.read(4))

        width = tags[_TAG_WIDTH][0]
        length = tags[_TAG_LENGTH][0]
        bits = tags.get(_TAG_BITS, [8])[0]
        compression = tags.get(_TAG_COMPRESSION, [1])[0]
        spp = tags.get(_TAG_SAMPLES_PER_PIXEL, [1])[0]
        if spp != 1:
            raise NotImplementedError("Only single-sample TIFFs supported.")
        sample_format = tags.get(_TAG_SAMPLE_FORMAT, [1])[0]
        self.pages.append(
            TiffPage(
                shape=(length, width),
                dtype=_dtype_for(bits, sample_format),
                strip_offsets=tags[_TAG_STRIP_OFFSETS],
                strip_byte_counts=tags[_TAG_STRIP_BYTE_COUNTS],
                rows_per_strip=tags.get(_TAG_ROWS_PER_STRIP, [length])[0],
                compression=compression,
                predictor=tags.get(_TAG_PREDICTOR, [1])[0],
            )
        )
        return next_offset

    def read_page(self, index: int) -> np.ndarray:
        page = self.pages[index]
        length, width = page.shape
        itemsize = page.dtype.itemsize
        rps = max(1, int(page.rows_per_strip))
        with open(self.path, "rb") as f:
            chunks = []
            for si, (off, cnt) in enumerate(
                zip(page.strip_offsets, page.strip_byte_counts)
            ):
                f.seek(off)
                raw = f.read(cnt)
                rows = min(rps, length - si * rps)
                chunks.append(
                    codecs.decode_tiff_data(
                        raw, page.compression, rows * width * itemsize
                    )
                )
        data = b"".join(chunks)
        arr = np.frombuffer(data, dtype=page.dtype).reshape(page.shape)
        if self._e == ">":
            arr = arr.byteswap().view(arr.dtype.newbyteorder("<"))
        if page.predictor == 2:
            arr = codecs.undo_predictor2(arr)
        elif page.predictor != 1:
            raise NotImplementedError(
                f"TIFF predictor {page.predictor} not supported."
            )
        return arr

    def asarray(self) -> np.ndarray:
        return np.stack([self.read_page(i) for i in range(len(self.pages))])


class LazyTiffPages:
    """Lazy (n_pages, H, W) array over a multi-page TIFF.

    The plane-chunk analogue of the reference's virtual zarr-v3 plane store
    (tif_utils.py:64): whole planes are the chunk unit.
    """

    def __init__(self, path):
        self._tif = TiffFile(path)
        p0 = self._tif.pages[0]
        self.shape = (len(self._tif.pages),) + p0.shape
        self.dtype = p0.dtype
        self.ndim = 3

    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        if Ellipsis in idx:
            i = idx.index(Ellipsis)
            idx = (
                idx[:i]
                + (slice(None),) * (3 - (len(idx) - 1))
                + idx[i + 1:]
            )
        idx = idx + (slice(None),) * (3 - len(idx))
        page_idx, rest = idx[0], idx[1:]
        if isinstance(page_idx, (int, np.integer)):
            return self._tif.read_page(int(page_idx))[rest]
        pages = range(*page_idx.indices(self.shape[0]))
        return np.stack([self._tif.read_page(i)[rest] for i in pages])

    def __array__(self, dtype=None):
        out = self._tif.asarray()
        return out.astype(dtype) if dtype is not None else out


def write_tiff(path, data: np.ndarray, compression: str = "none"):
    """Write a (pages, H, W) or (H, W) array as a TIFF.

    ``compression``: "none" (default), "lzw", "deflate"/"zlib", "packbits".
    """
    data = np.asarray(data)
    if data.ndim == 2:
        data = data[None]
    if data.ndim != 3:
        raise ValueError("write_tiff expects (pages, H, W) or (H, W) data.")
    dtype = data.dtype
    if dtype.kind == "f":
        sample_format = 3
    elif dtype.kind == "i":
        sample_format = 2
    elif dtype.kind == "u":
        sample_format = 1
    else:
        raise ValueError(f"Unsupported dtype {dtype}")
    bits = dtype.itemsize * 8
    comp_id = _COMPRESSION_NAMES.get(str(compression).lower())
    if comp_id is None:
        raise ValueError(f"Unknown compression {compression!r}")

    n_pages, length, width = data.shape
    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, 8))
        ifd_offset = 8
        for ip in range(n_pages):
            plane = np.ascontiguousarray(data[ip]).astype(
                dtype.newbyteorder("<")
            )
            raw = codecs.encode_tiff_data(plane.tobytes(), comp_id)
            n_entries = 10
            data_offset = ifd_offset + 2 + n_entries * 12 + 4

            def entry(tag, ttype, count, value):
                return struct.pack("<HHII", tag, ttype, count, value)

            entries = [
                entry(_TAG_WIDTH, 4, 1, width),
                entry(_TAG_LENGTH, 4, 1, length),
                entry(_TAG_BITS, 3, 1, bits),
                entry(_TAG_COMPRESSION, 3, 1, comp_id),
                entry(_TAG_PHOTOMETRIC, 3, 1, 1),
                entry(_TAG_STRIP_OFFSETS, 4, 1, data_offset),
                entry(_TAG_SAMPLES_PER_PIXEL, 3, 1, 1),
                entry(_TAG_ROWS_PER_STRIP, 4, 1, length),
                entry(_TAG_STRIP_BYTE_COUNTS, 4, 1, len(raw)),
                entry(_TAG_SAMPLE_FORMAT, 3, 1, sample_format),
            ]
            next_ifd = (
                data_offset + len(raw) if ip < n_pages - 1 else 0
            )
            f.seek(ifd_offset)
            f.write(struct.pack("<H", n_entries))
            f.write(b"".join(entries))
            f.write(struct.pack("<I", next_ifd))
            f.write(raw)
            ifd_offset = next_ifd


def read_tiff_into_sim(
    path,
    dims=None,
    scale=None,
    translation=None,
    transform_key: str = si_utils.DEFAULT_TRANSFORM_KEY,
    lazy: bool = True,
) -> Sim:
    """Read a (multi-page) TIFF into a sim (z/y/x for multi-page)."""
    pages = LazyTiffPages(path)
    data = pages if lazy else np.asarray(pages)
    if pages.shape[0] == 1:
        data = np.asarray(pages)[0]
        dims = dims or ("y", "x")
    else:
        dims = dims or ("z", "y", "x")
    return si_utils.get_sim_from_array(
        data, dims=dims, scale=scale, translation=translation,
        transform_key=transform_key,
    )


def read_tif_into_msim(path, **kwargs):
    sim = read_tiff_into_sim(path, **kwargs)
    return msi_utils.get_msim_from_sim(sim, scale_factors=[])


def save_sim_as_tif(path, sim: Sim):
    """Write a sim's (z-)stack to an uncompressed TIFF (reference io.py:377)."""
    data = sim.to_numpy()
    # flatten leading non-spatial dims into pages
    sdims = sim.spatial_dims
    if len(sdims) == 2 and data.ndim > 2:
        data = data.reshape((-1,) + data.shape[-2:])
    elif len(sdims) == 3 and data.ndim > 3:
        data = data.reshape((-1,) + data.shape[-2:])
    write_tiff(path, data)
