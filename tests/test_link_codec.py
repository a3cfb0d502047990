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
