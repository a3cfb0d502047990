"""Round-trip tests for the host<->device bit-packing link codec."""

import numpy as np
import pytest

from multiview_stitcher_tpu.ops import link_codec as lc


@pytest.mark.parametrize("nbits", [8, 10, 12, 16])
@pytest.mark.parametrize("count", [1, 7, 16, 1000, 12345])
def test_np_roundtrip(nbits, count):
    rng = np.random.default_rng(count + nbits)
    vals = rng.integers(0, 1 << min(nbits, 16), count).astype(np.uint16)
    buf = lc.pack_np(vals, nbits)
    back = lc.unpack_np(buf, nbits, count)
    np.testing.assert_array_equal(back, vals)
    assert buf.dtype == np.uint8
    assert buf.size == lc.packed_byte_count(count, nbits)
    if nbits < 16:
        # near-dense: at most 7 values of padding in the high-bit plane
        assert buf.size * 8 >= count * nbits
        assert buf.size * 8 <= (count + 8) * nbits


@pytest.mark.parametrize("nbits", [8, 10, 12])
def test_jax_matches_np(nbits):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    vals = rng.integers(0, 1 << nbits, 4097).astype(np.uint16)
    words_np = lc.pack_np(vals, nbits)
    words_j = np.asarray(lc.pack_jax(jnp.asarray(vals), nbits))
    np.testing.assert_array_equal(words_j, words_np)
    back = np.asarray(lc.unpack_jax(jnp.asarray(words_np), nbits, int(vals.size)))
    np.testing.assert_array_equal(back, vals)


def test_nbits_for_max():
    assert lc.nbits_for_max(0) == 8
    assert lc.nbits_for_max(255) == 8
    assert lc.nbits_for_max(256) == 10
    assert lc.nbits_for_max(1023) == 10
    assert lc.nbits_for_max(1024) == 12
    assert lc.nbits_for_max(4095) == 12
    assert lc.nbits_for_max(4096) == 16
    assert lc.nbits_for_max(65535) == 16


@pytest.mark.parametrize("shape", [(64, 64), (3, 50, 41)])
def test_put_fetch_packed(shape):
    rng = np.random.default_rng(1)
    arr = rng.integers(0, 3000, shape).astype(np.uint16)
    dev = lc.put_packed(arr)
    np.testing.assert_array_equal(np.asarray(dev), arr)
    back = lc.fetch_packed(dev)
    np.testing.assert_array_equal(back, arr)
    # in-place variant
    out = np.empty(shape, np.uint16)
    res = lc.fetch_packed(dev, out=out)
    assert res is out
    np.testing.assert_array_equal(out, arr)


def test_put_fetch_packed_large_path():
    # cross the 1<<20 size threshold so the packed path actually runs
    rng = np.random.default_rng(2)
    arr = rng.integers(0, 1000, (1 << 21,)).astype(np.uint16)
    dev = lc.put_packed(arr)
    back = lc.fetch_packed(dev)
    np.testing.assert_array_equal(back, arr)


def test_float_passthrough():
    arr = np.linspace(0, 1, 100, dtype=np.float32)
    dev = lc.put_packed(arr)
    back = lc.fetch_packed(dev)
    np.testing.assert_allclose(back, arr)


def test_concurrent_put_fetch_threads():
    """Codec under concurrent use from multiple threads (the streaming
    pipeline runs uploads and downloads in parallel pools): round-trips
    stay bit-exact with no cross-talk between streams."""
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.default_rng(7)
    arrays = [
        (rng.integers(0, 2**12, (257, 129 + i))).astype(np.uint16)
        for i in range(8)
    ]

    def roundtrip(a):
        dev = lc.put_packed(a, nbits=12)
        return lc.fetch_packed(dev, nbits=12)

    with ThreadPoolExecutor(max_workers=4) as pool:
        outs = list(pool.map(roundtrip, arrays))
    for a, o in zip(arrays, outs):
        np.testing.assert_array_equal(a, o)


def test_concurrent_interleaved_put_then_fetch():
    """Puts from one pool while fetches of earlier puts proceed in
    another (upload||download overlap as in the banded pipeline)."""
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.default_rng(8)
    arrays = [
        (rng.integers(0, 2**10, (129, 257))).astype(np.uint16)
        for _ in range(6)
    ]
    with ThreadPoolExecutor(max_workers=2) as up, ThreadPoolExecutor(
        max_workers=2
    ) as down:
        devs = list(up.map(lambda a: lc.put_packed(a, nbits=10), arrays))
        futs = [
            down.submit(lc.fetch_packed, d, nbits=10) for d in devs
        ]
        new_devs = list(
            up.map(lambda a: lc.put_packed(a, nbits=10), arrays)
        )
        outs = [f.result() for f in futs]
        outs2 = [lc.fetch_packed(d, nbits=10) for d in new_devs]
    for a, o, o2 in zip(arrays, outs, outs2):
        np.testing.assert_array_equal(a, o)
        np.testing.assert_array_equal(a, o2)
