"""Host<->device link codec: lossless bit-packing for integer image data.

Microscopy data almost universally ships 10-16 bit camera counts in uint16
containers (the reference reads CZI/TIFF/NGFF stacks as uint16,
/root/reference/src/multiview_stitcher/czi_utils.py, io.py). On a
bandwidth-limited host<->device link (PCIe under load, or a tunneled remote
accelerator) the wasted high bits are pure transfer cost. This module packs
``n``-bit values into a dense byte stream — on device with XLA shifts
(fully fused, negligible vs. link time) and on host with a handful of
contiguous vectorized numpy ops — so transfers move only ``n/16`` of the
bytes.

Packing layout (byte-planar, chosen for vectorization speed over the naive
dense word stream, whose strided host unpack was slower than the wire):
``packed = [low_bytes | packed_high_bits]`` where ``low_bytes`` is the
contiguous ``uint8`` cast of ``v & 0xFF`` and the ``nbits - 8`` high bits of
each value are packed ``8/(nbits-8)`` per byte. Identical total size to the
dense layout (1.25 B/value for 10-bit, 1.5 for 12-bit) but every pack and
unpack step is a full-array shift/mask/cast.

Only a small set of bit widths is used (ALLOWED_NBITS) so jitted
pack/unpack kernels compile once per (shape, nbits) and stay cached.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# quantized bit widths: each distinct nbits is a distinct compiled kernel,
# so round up to a small allowed set (16 = passthrough)
ALLOWED_NBITS = (8, 10, 12, 16)

_PACKABLE_DTYPES = (np.uint16, np.int16)


def nbits_for_max(max_value: int) -> int:
    """Smallest allowed bit width holding values in [0, max_value]."""
    need = max(1, int(max_value).bit_length())
    for n in ALLOWED_NBITS:
        if n >= need:
            return n
    return 16


def _extra_bits(nbits: int) -> int:
    if nbits not in ALLOWED_NBITS:
        raise ValueError(f"nbits must be one of {ALLOWED_NBITS}, got {nbits}")
    return nbits - 8


def packed_byte_count(count: int, nbits: int) -> int:
    if nbits >= 16:
        return count * 2
    e = _extra_bits(nbits)
    if e == 0:
        return count
    per = 8 // e  # high-bit fields per byte
    return count + -(-count // per)


def is_packable(dtype) -> bool:
    return np.dtype(dtype) in [np.dtype(d) for d in _PACKABLE_DTYPES]


# ---------------------------------------------------------------------------
# numpy (host) side
# ---------------------------------------------------------------------------


def pack_np(values: np.ndarray, nbits: int) -> np.ndarray:
    """Pack a flat integer array into a flat uint8 byte stream."""
    v = values.reshape(-1)
    if nbits >= 16:
        return np.ascontiguousarray(v).view(np.uint8)
    v = v.astype(np.uint16, copy=False)
    lo = (v & np.uint16(0xFF)).astype(np.uint8)
    e = _extra_bits(nbits)
    if e == 0:
        return lo
    per = 8 // e
    hi = (v >> np.uint16(8)).astype(np.uint8)
    n_pad = -(-hi.size // per) * per
    if n_pad != hi.size:
        hi = np.concatenate([hi, np.zeros(n_pad - hi.size, np.uint8)])
    h = hi.reshape(-1, per)
    packed_hi = h[:, 0].copy()
    for i in range(1, per):
        packed_hi |= h[:, i] << np.uint8(i * e)
    return np.concatenate([lo, packed_hi])


def unpack_np(buf: np.ndarray, nbits: int, count: int, dtype=np.uint16) -> np.ndarray:
    """Inverse of :func:`pack_np`; returns a flat array of ``count`` values."""
    buf = buf.reshape(-1)
    if nbits >= 16:
        return buf.view(np.uint16)[:count].astype(dtype, copy=False)
    lo = buf[:count]
    e = _extra_bits(nbits)
    if e == 0:
        return lo.astype(dtype)
    per = 8 // e
    packed_hi = buf[count:]
    mask = np.uint8((1 << e) - 1)
    hi = np.empty((packed_hi.size, per), np.uint8)
    for i in range(per):
        hi[:, i] = (packed_hi >> np.uint8(i * e)) & mask
    hi = hi.reshape(-1)[:count]
    return (lo.astype(np.uint16) | (hi.astype(np.uint16) << np.uint16(8))).astype(
        dtype, copy=False
    )


# ---------------------------------------------------------------------------
# jax (device) side
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("nbits",))
def pack_jax(values: jax.Array, nbits: int) -> jax.Array:
    """Device-side pack of a flat integer array into a uint8 byte stream."""
    v = values.reshape(-1)
    if nbits >= 16:
        return jax.lax.bitcast_convert_type(
            v.astype(jnp.uint16), jnp.uint8
        ).reshape(-1)
    v = v.astype(jnp.uint16)
    lo = (v & np.uint16(0xFF)).astype(jnp.uint8)
    e = _extra_bits(nbits)
    if e == 0:
        return lo
    per = 8 // e
    hi = (v >> np.uint16(8)).astype(jnp.uint8)
    n_pad = -(-hi.size // per) * per
    if n_pad != hi.size:
        hi = jnp.concatenate([hi, jnp.zeros(n_pad - hi.size, jnp.uint8)])
    h = hi.reshape(-1, per)
    packed_hi = h[:, 0]
    for i in range(1, per):
        packed_hi = packed_hi | (h[:, i] << np.uint8(i * e))
    return jnp.concatenate([lo, packed_hi])


@partial(jax.jit, static_argnames=("nbits", "count", "dtype"))
def unpack_jax(buf: jax.Array, nbits: int, count: int, dtype=jnp.uint16) -> jax.Array:
    """Device-side inverse of :func:`pack_jax` (flat output)."""
    buf = buf.reshape(-1)
    if nbits >= 16:
        return jax.lax.bitcast_convert_type(
            buf.reshape(-1, 2), jnp.uint16
        ).reshape(-1)[:count].astype(dtype)
    lo = buf[:count]
    e = _extra_bits(nbits)
    if e == 0:
        return lo.astype(dtype)
    per = 8 // e
    packed_hi = buf[count:]
    mask = np.uint8((1 << e) - 1)
    cols = [
        (packed_hi >> np.uint8(i * e)) & mask for i in range(per)
    ]
    hi = jnp.stack(cols, axis=1).reshape(-1)[:count]
    return (
        lo.astype(jnp.uint16) | (hi.astype(jnp.uint16) << np.uint16(8))
    ).astype(dtype)


# ---------------------------------------------------------------------------
# high-level transfers
# ---------------------------------------------------------------------------


def _split_bounds(n: int, parts: int) -> np.ndarray:
    return np.linspace(0, n, parts + 1).astype(np.int64)


# minimum bytes per stream before splitting into more streams, and the
# default stream count: the tunnel throttles per-stream bandwidth (observed
# ~0.3 MB/s/stream in bad weather vs ~25 MB/s aggregate at 32 streams), so
# aggregate throughput scales with concurrency until the link saturates
_STREAM_MIN_BYTES = 1 << 20
_MIN_PACK_SIZE = 1 << 20


def _default_streams() -> int:
    import os

    try:
        return max(1, int(os.environ.get("MVS_TPU_LINK_STREAMS", 32)))
    except ValueError:
        return 32


def put_packed(
    arr: np.ndarray,
    nbits: int = None,
    n_streams: int = None,
) -> jax.Array:
    """Host->device transfer of an integer array via packed parallel streams.

    Packs on host (vectorized numpy, threaded per stream), uploads the byte
    streams concurrently (the tunnel/PCIe link serves parallel streams at
    higher aggregate bandwidth), and unpacks + reshapes on device in one
    jitted call. Falls back to a plain ``device_put`` for non-packable
    dtypes or small arrays.
    """
    from concurrent.futures import ThreadPoolExecutor

    arr = np.asarray(arr)
    if n_streams is None:
        n_streams = _default_streams()
    if (
        not is_packable(arr.dtype)
        or arr.size * arr.dtype.itemsize < _MIN_PACK_SIZE
    ):
        return jax.device_put(arr)
    if nbits is None:
        nbits = nbits_for_max(int(arr.max(initial=0)))
        if np.issubdtype(arr.dtype, np.signedinteger) and int(arr.min(initial=0)) < 0:
            nbits = 16
    count = arr.size
    flat = arr.reshape(-1)
    n_streams = max(1, min(n_streams, count * 2 // _STREAM_MIN_BYTES))
    # align stream boundaries to the high-bit packing granularity
    grain = 8 if nbits < 16 else 1
    bounds = _split_bounds(-(-count // grain), n_streams) * grain
    bounds[-1] = count
    bounds = np.unique(bounds)
    n_streams = len(bounds) - 1

    def pack_part(i):
        return pack_np(flat[bounds[i] : bounds[i + 1]], nbits)

    with ThreadPoolExecutor(n_streams) as ex:
        packed = list(ex.map(pack_part, range(n_streams)))
        futs = [ex.submit(jax.device_put, p) for p in packed]
        parts_dev = [f.result() for f in futs]
    for w in parts_dev:
        w.block_until_ready()

    part_counts = tuple(int(bounds[i + 1] - bounds[i]) for i in range(n_streams))

    return _assemble_streams(
        parts_dev, nbits=nbits, counts=part_counts,
        shape=arr.shape, dtype=np.dtype(arr.dtype).name,
    )


@partial(jax.jit, static_argnames=("nbits", "counts", "shape", "dtype"))
def _assemble_streams(parts, nbits, counts, shape, dtype):
    """Unpack + concatenate uploaded byte streams on device (module-level
    jit: a closure re-defined per call would retrace and pay a remote
    compile-cache round trip every transfer)."""
    vals = [unpack_jax(p, nbits, c, dtype) for p, c in zip(parts, counts)]
    return jnp.concatenate(vals).reshape(shape)


@partial(jax.jit, static_argnames=("nbits", "counts"))
def _pack_bands(x, nbits, counts):
    """Pack a device array into independent contiguous byte bands
    (module-level jit — see _assemble_streams)."""
    flat = x.reshape(-1)
    parts, o = [], 0
    for c in counts:
        parts.append(
            pack_jax(jax.lax.dynamic_slice(flat, (o,), (c,)), nbits)
        )
        o += c
    return parts


def fetch_packed(
    arr: jax.Array,
    out: np.ndarray = None,
    nbits: int = None,
    n_streams: int = None,
) -> np.ndarray:
    """Device->host transfer of an integer array via packed parallel streams.

    Packs on device (XLA shifts), fetches byte bands concurrently, unpacks
    each band on host as it lands. ``out`` (optional) receives the result
    in place (must be C-contiguous with matching shape/dtype). ``nbits``
    defaults to a device-side max probe (one scalar fetch).
    """
    from concurrent.futures import ThreadPoolExecutor

    dtype = np.dtype(arr.dtype)
    if n_streams is None:
        n_streams = _default_streams()
    if arr.size * dtype.itemsize < _MIN_PACK_SIZE:
        res = np.asarray(arr)
        if out is not None:
            out[...] = res
            return out
        return res
    if not is_packable(dtype):
        if out is None:
            out = np.empty(arr.shape, dtype=dtype)
        _fetch_bands_raw(arr, out, n_streams)
        return out
    if nbits is None:
        nbits = nbits_for_max(int(jnp.max(arr)))
        if np.issubdtype(dtype, np.signedinteger) and int(jnp.min(arr)) < 0:
            nbits = 16
    if nbits >= 16:
        if out is None:
            out = np.empty(arr.shape, dtype=dtype)
        _fetch_bands_raw(arr, out, n_streams)
        return out

    count = arr.size
    # pack each band on device separately so band fetches are independent
    # contiguous buffers (a slice of one big packed buffer would interleave
    # lo/hi planes across bands)
    grain = 8
    n_streams = max(1, min(n_streams, count * 2 // _STREAM_MIN_BYTES))
    bounds = _split_bounds(-(-count // grain), n_streams) * grain
    bounds[-1] = count
    bounds = np.unique(bounds)
    n_streams = len(bounds) - 1
    part_counts = tuple(int(bounds[i + 1] - bounds[i]) for i in range(n_streams))

    bands = _pack_bands(arr, nbits=nbits, counts=part_counts)

    if out is None:
        out = np.empty(arr.shape, dtype=dtype)
    flat_out = out.reshape(-1)

    def fetch_part(i):
        buf = np.asarray(bands[i])
        v0, v1 = int(bounds[i]), int(bounds[i + 1])
        flat_out[v0:v1] = unpack_np(buf, nbits, v1 - v0, dtype)

    with ThreadPoolExecutor(n_streams) as ex:
        list(ex.map(fetch_part, range(n_streams)))
    return out


def _fetch_bands_raw(arr: jax.Array, out: np.ndarray, n_streams: int = None):
    """Parallel banded fetch without packing (used for 16-bit-entropy data)."""
    from concurrent.futures import ThreadPoolExecutor

    flat = arr.reshape(-1)
    flat_out = out.reshape(-1)
    if n_streams is None:
        n_streams = _default_streams()
    n_streams = max(
        1, min(n_streams, arr.size * out.itemsize // _STREAM_MIN_BYTES)
    )
    bounds = _split_bounds(arr.size, n_streams)

    def fetch(i):
        sl = slice(int(bounds[i]), int(bounds[i + 1]))
        flat_out[sl] = np.asarray(flat[sl])

    with ThreadPoolExecutor(n_streams) as ex:
        list(ex.map(fetch, range(n_streams)))
    return out
