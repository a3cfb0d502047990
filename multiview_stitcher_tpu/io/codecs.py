"""TIFF codec layer: native (C) decoders with pure-Python fallbacks.

The reference delegates TIFF (de)compression to tifffile/imagecodecs
(compiled C, /root/reference/src/multiview_stitcher/io.py:252); here the
native path is a small first-party C extension (``_codecs.c``) compiled on
first use and called through ctypes. Supported TIFF compression schemes:

- 1     none
- 5     LZW (TIFF variant: MSB-first, early change)
- 8 / 32946  Deflate (stdlib zlib)
- 32773 PackBits

plus TIFF predictor 2 (horizontal differencing). Encoders (LZW, PackBits)
are pure Python — writing is not a hot path.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import tempfile
import zlib

import numpy as np

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "_codecs.c")
# keep the artifact out of the package's module namespace (a _codecs.so
# next to the sources would shadow-import as a broken extension module)
_LIB_PATH = os.path.join(_HERE, "_native", "codecs.so")
_lib = None
_lib_tried = False


def _load_native():
    """Compile (once) and load the native codec library; None on failure."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_LIB_PATH) or (
            os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC)
        ):
            os.makedirs(os.path.dirname(_LIB_PATH), exist_ok=True)
            with tempfile.TemporaryDirectory() as td:
                tmp_so = os.path.join(td, "_codecs.so")
                subprocess.run(
                    ["cc", "-O2", "-shared", "-fPIC", "-o", tmp_so, _SRC],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp_so, _LIB_PATH)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.mvs_packbits_decode.restype = ctypes.c_long
        lib.mvs_packbits_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ]
        lib.mvs_lzw_decode.restype = ctypes.c_long
        lib.mvs_lzw_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ]
        _lib = lib
    except Exception as e:  # noqa: BLE001
        logger.info("native codecs unavailable (%s); using Python fallback", e)
        _lib = None
    return _lib


# ---------------------------------------------------------------------------
# decoders
# ---------------------------------------------------------------------------


def packbits_decode(data: bytes, expected_size: int) -> bytes:
    lib = _load_native()
    if lib is not None:
        out = (ctypes.c_uint8 * expected_size)()
        n = lib.mvs_packbits_decode(data, len(data), out, expected_size)
        if n < 0:
            raise ValueError("malformed PackBits stream")
        return bytes(bytearray(out)[:n])
    # pure-Python fallback
    out_b = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:
            out_b += data[i : i + h + 1]
            i += h + 1
        elif h > 128:
            out_b += bytes([data[i]]) * (257 - h)
            i += 1
    return bytes(out_b)


def lzw_decode(data: bytes, expected_size: int) -> bytes:
    lib = _load_native()
    if lib is not None:
        out = (ctypes.c_uint8 * expected_size)()
        n = lib.mvs_lzw_decode(data, len(data), out, expected_size)
        if n < 0:
            raise ValueError("malformed LZW stream")
        return bytes(bytearray(out)[:n])
    return _lzw_decode_py(data, expected_size)


def _lzw_decode_py(data: bytes, expected_size: int) -> bytes:
    CLEAR, EOI, FIRST = 256, 257, 258
    entries = [bytes([c]) for c in range(256)] + [b"", b""]
    width = 9
    bitbuf = bits = 0
    out = bytearray()
    prev = None
    i, n = 0, len(data)
    while True:
        while bits < width:
            if i >= n:
                return bytes(out)
            bitbuf = (bitbuf << 8) | data[i]
            i += 1
            bits += 8
        code = (bitbuf >> (bits - width)) & ((1 << width) - 1)
        bits -= width
        if code == EOI:
            return bytes(out)
        if code == CLEAR:
            del entries[FIRST:]
            width = 9
            prev = None
            continue
        if prev is None:
            out += entries[code]
            prev = code
            continue
        if code < len(entries):
            s = entries[code]
        elif code == len(entries):
            s = entries[prev] + entries[prev][:1]
        else:
            raise ValueError("malformed LZW stream")
        out += s
        if len(entries) < 4096:
            entries.append(entries[prev] + s[:1])
        if len(entries) == (1 << width) - 1 and width < 12:
            width += 1
        prev = code
        if len(out) > expected_size:
            raise ValueError("LZW output exceeds expected size")


def deflate_decode(data: bytes, expected_size: int) -> bytes:
    return zlib.decompress(data)


# ---------------------------------------------------------------------------
# encoders (pure Python; writer-side only)
# ---------------------------------------------------------------------------


def packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        # run of identical bytes?
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        # literal run until the next >=3 repeat
        j = i + 1
        while j < n and j - i < 128:
            if j + 2 < n and data[j] == data[j + 1] == data[j + 2]:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int):
        self.acc = (self.acc << width) | code
        self.nbits += width
        while self.nbits >= 8:
            self.buf.append((self.acc >> (self.nbits - 8)) & 0xFF)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append((self.acc << (8 - self.nbits)) & 0xFF)
            self.acc = self.nbits = 0
        return bytes(self.buf)


def lzw_encode(data: bytes) -> bytes:
    """TIFF-flavor LZW encoder (MSB-first, early change)."""
    CLEAR, EOI, FIRST = 256, 257, 258
    bw = _BitWriter()

    table = {bytes([c]): c for c in range(256)}
    next_code = FIRST
    width = 9
    bw.write(CLEAR, width)
    w = b""
    for b in data:
        wc = w + bytes([b])
        if wc in table:
            w = wc
            continue
        bw.write(table[w], width)
        table[wc] = next_code
        next_code += 1
        # the encoder's table counter leads the decoder's by one entry, so
        # the early-change width switch lands at 2^w here (== the decoder's
        # 2^w - 1)
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == 4094:
            bw.write(CLEAR, width)
            table = {bytes([c]): c for c in range(256)}
            next_code = FIRST
            width = 9
        w = bytes([b])
    if w:
        bw.write(table[w], width)
    bw.write(EOI, width)
    return bw.flush()


def deflate_encode(data: bytes) -> bytes:
    return zlib.compress(data)


# ---------------------------------------------------------------------------
# TIFF dispatch
# ---------------------------------------------------------------------------

TIFF_COMPRESSION_NONE = 1
TIFF_COMPRESSION_LZW = 5
TIFF_COMPRESSION_DEFLATE = 8
TIFF_COMPRESSION_DEFLATE_OLD = 32946
TIFF_COMPRESSION_PACKBITS = 32773


def decode_tiff_data(data: bytes, compression: int, expected_size: int) -> bytes:
    if compression == TIFF_COMPRESSION_NONE:
        return data
    if compression == TIFF_COMPRESSION_LZW:
        return lzw_decode(data, expected_size)
    if compression in (TIFF_COMPRESSION_DEFLATE, TIFF_COMPRESSION_DEFLATE_OLD):
        return deflate_decode(data, expected_size)
    if compression == TIFF_COMPRESSION_PACKBITS:
        return packbits_decode(data, expected_size)
    raise NotImplementedError(f"TIFF compression {compression} not supported.")


def encode_tiff_data(data: bytes, compression: int) -> bytes:
    if compression == TIFF_COMPRESSION_NONE:
        return data
    if compression == TIFF_COMPRESSION_LZW:
        return lzw_encode(data)
    if compression in (TIFF_COMPRESSION_DEFLATE, TIFF_COMPRESSION_DEFLATE_OLD):
        return deflate_encode(data)
    if compression == TIFF_COMPRESSION_PACKBITS:
        return packbits_encode(data)
    raise NotImplementedError(f"TIFF compression {compression} not supported.")


def undo_predictor2(arr: np.ndarray) -> np.ndarray:
    """Undo TIFF predictor 2 (horizontal differencing) row-wise."""
    return np.cumsum(
        arr.astype(np.int64), axis=-1, dtype=np.int64
    ).astype(arr.dtype)
