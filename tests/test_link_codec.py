"""Round-trip tests for the host<->device bit-packing link codec."""

import numpy as np
import pytest

from multiview_stitcher_tpu.ops import link_codec as lc


@pytest.mark.parametrize("nbits", list(lc.ALLOWED_NBITS))
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


@pytest.mark.parametrize("nbits", [n for n in lc.ALLOWED_NBITS if n < 16])
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
    assert lc.nbits_for_max(0) == 2
    assert lc.nbits_for_max(3) == 2
    assert lc.nbits_for_max(4) == 3
    assert lc.nbits_for_max(7) == 3
    assert lc.nbits_for_max(15) == 4
    assert lc.nbits_for_max(16) == 5
    assert lc.nbits_for_max(31) == 5
    assert lc.nbits_for_max(63) == 6
    assert lc.nbits_for_max(64) == 7
    assert lc.nbits_for_max(127) == 7
    assert lc.nbits_for_max(255) == 8
    assert lc.nbits_for_max(256) == 9
    assert lc.nbits_for_max(511) == 9
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


# ---------------------------------------------------------------------------
# delta transform
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("count", [1, 100, 2048, 2049, 5000, 2048 * 3 + 17])
def test_delta_np_roundtrip(count):
    rng = np.random.default_rng(count)
    # mix smooth ramps with hard jumps and full-range values
    vals = (
        np.cumsum(rng.integers(-3, 4, count)) % 65536
    ).astype(np.uint16)
    vals[::97] = rng.integers(0, 65536, vals[::97].size)
    firsts, resid = lc.delta_encode_np(vals)
    assert firsts.dtype == np.uint16 and resid.dtype == np.uint16
    assert firsts.size == lc._delta_rows(count)
    assert resid.size == firsts.size * (lc._DELTA_ROW - 1)
    back = lc.delta_decode_np(firsts, resid, count)
    np.testing.assert_array_equal(back, vals)


def test_delta_jax_matches_np_wire_format():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    vals = (np.cumsum(rng.integers(-5, 6, 6000)) % 65536).astype(np.uint16)
    f_np, r_np = lc.delta_encode_np(vals)
    f_j, r_j = (np.asarray(a) for a in lc.delta_encode_jax(jnp.asarray(vals)))
    np.testing.assert_array_equal(f_j, f_np)
    np.testing.assert_array_equal(r_j, r_np)
    back = np.asarray(
        lc.delta_decode_jax(jnp.asarray(f_np), jnp.asarray(r_np), vals.size)
    )
    np.testing.assert_array_equal(back, vals)


def test_delta_byte_count_accounting():
    count = 10000
    n_rows = lc._delta_rows(count)
    assert lc.delta_byte_count(count, 8) == 2 * n_rows + lc.packed_byte_count(
        n_rows * (lc._DELTA_ROW - 1), 8
    )


def test_put_packed_delta_smooth_wins_and_roundtrips():
    # smooth 12-bit data: residuals (|d|<=2 -> zigzag<=4) fit the 4-bit
    # sub-byte tier -> delta must be chosen at nbits=4
    rng = np.random.default_rng(1)
    n = 1 << 20
    vals = (2000 + np.cumsum(rng.integers(-2, 3, n))).astype(np.uint16)
    assert vals.max() > 1 << 10  # needs 12-bit plain packing
    info = {}
    dev = lc.put_packed(vals.reshape(1024, 1024), delta=True, info=info)
    assert info["delta"] is True and info["nbits"] <= 4
    assert info["bytes"] < lc.packed_byte_count(n, 12)
    np.testing.assert_array_equal(
        np.asarray(dev), vals.reshape(1024, 1024)
    )


def test_put_packed_delta_noisy_falls_back_to_plain():
    rng = np.random.default_rng(2)
    n = 1 << 20
    vals = rng.integers(0, 1 << 10, n).astype(np.uint16)  # white noise
    info = {}
    dev = lc.put_packed(vals, delta=True, info=info)
    assert info["delta"] is False and info["nbits"] == 10
    np.testing.assert_array_equal(np.asarray(dev), vals)


def test_fetch_packed_delta_smooth_wins_and_roundtrips():
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    n = 1 << 20
    vals = (2000 + np.cumsum(rng.integers(-2, 3, n))).astype(np.uint16)
    dev = jnp.asarray(vals.reshape(64, 128, 128))
    info = {}
    out = lc.fetch_packed(dev, delta=True, info=info)
    assert info["delta"] is True and info["nbits"] <= 4
    np.testing.assert_array_equal(out, vals.reshape(64, 128, 128))
    # in-place variant
    buf = np.empty((64, 128, 128), np.uint16)
    out2 = lc.fetch_packed(dev, out=buf, delta=True)
    assert out2 is buf
    np.testing.assert_array_equal(buf, vals.reshape(64, 128, 128))


def test_fetch_packed_delta_noisy_falls_back_to_plain():
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    vals = rng.integers(0, 1 << 10, 1 << 20).astype(np.uint16)
    dev = jnp.asarray(vals)
    info = {}
    out = lc.fetch_packed(dev, delta=True, info=info)
    assert info["delta"] is False and info["nbits"] == 10
    np.testing.assert_array_equal(out, vals)


def test_delta_env_default_on(monkeypatch):
    # self-deciding (ships delta only when strictly smaller), so the
    # default is on; MVS_TPU_LINK_DELTA=0 disables
    monkeypatch.delenv("MVS_TPU_LINK_DELTA", raising=False)
    assert lc._default_delta() is True
    monkeypatch.setenv("MVS_TPU_LINK_DELTA", "auto")
    assert lc._default_delta() is True
    monkeypatch.setenv("MVS_TPU_LINK_DELTA", "0")
    assert lc._default_delta() is False


def test_delta_exception_list_outlier_tolerance():
    """A handful of large jumps (padding seams, hot pixels) must not force
    the global residual width up a tier: they travel as sparse (index,
    value) exceptions and the stream packs at the narrow width."""
    rng = np.random.default_rng(7)
    n = 1 << 20
    vals = (1000 + np.cumsum(rng.integers(-3, 4, n))).astype(np.uint16)
    hot = rng.choice(n, 50, replace=False)
    vals[hot] = 60000  # hot pixels: residuals way beyond 8 bits
    info = {}
    dev = lc.put_packed(vals, delta=True, info=info)
    assert info["delta"] is True
    assert info["nbits"] <= 4  # narrow width kept despite outliers
    # wire cost: 4-bit residuals + ~100 exceptions (2 per hot pixel)
    assert info["bytes"] < lc.packed_byte_count(n, 8)
    np.testing.assert_array_equal(np.asarray(dev), vals)


def test_choose_delta_width_tradeoff():
    # all-small residuals (<=3): the 2-bit sub-byte tier, no exceptions
    r = np.full(1 << 16, 3, np.uint16)
    nb, idx, val = lc._choose_delta_width_np(r)
    assert nb == 2 and idx is None
    # a quarter of residuals at 12 bits: exceptions would cost more than
    # the wider width
    r[: r.size // 4] = 4000
    nb, idx, val = lc._choose_delta_width_np(r)
    assert nb == 12 and idx is None
    # three 16-bit outliers: keep the narrow width + 3 exceptions
    r = np.full(1 << 16, 3, np.uint16)
    r[[5, 500, 5000]] = 65535
    nb, idx, val = lc._choose_delta_width_np(r)
    assert nb == 2
    assert list(idx) == [5, 500, 5000]
    assert list(val) == [65535] * 3


def test_fetch_packed_delta_exceptions_narrow_width():
    """Device->host delta: a handful of large jumps (hot pixels, row-seam
    wraps) ride the exception list so the residual stream keeps the
    narrow width, bit-exactly."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    n = 1 << 20
    vals = (1000 + np.cumsum(rng.integers(-3, 4, n))).astype(np.uint16)
    hot = rng.choice(n, 40, replace=False)
    vals[hot] = 64000
    dev = jnp.asarray(vals)
    info = {}
    out = lc.fetch_packed(dev, delta=True, info=info)
    assert info["delta"] is True and info["nbits"] <= 4
    assert info["bytes"] < lc.packed_byte_count(n, 8)
    np.testing.assert_array_equal(out, vals)


def test_fetch_packed_delta_exceptions_prefer_wider_when_many():
    """Dense exceedances: the decision falls back to a wider width (or
    plain) instead of a huge exception list; always bit-exact."""
    import jax.numpy as jnp

    rng = np.random.default_rng(12)
    n = 1 << 20
    # residuals mostly ~600 (needs 12 bits zigzagged) -> width 12 wins
    vals = np.cumsum(rng.integers(-600, 601, n)).astype(np.uint16)
    dev = jnp.asarray(vals)
    info = {}
    out = lc.fetch_packed(dev, delta=True, info=info)
    np.testing.assert_array_equal(out, vals)


def test_sub_byte_tier_six_bits():
    """Moderately smooth content (zigzag residuals <= 63) rides the 6-bit
    tier: 4 values per 3 bytes, bit-exact both directions."""
    import jax.numpy as jnp

    rng = np.random.default_rng(21)
    n = 1 << 20
    vals = (5000 + np.cumsum(rng.integers(-25, 26, n))).astype(np.uint16)
    info_up = {}
    dev = lc.put_packed(vals, delta=True, info=info_up)
    assert info_up["delta"] is True and info_up["nbits"] == 6
    assert info_up["bytes"] < lc.packed_byte_count(n, 8)
    np.testing.assert_array_equal(np.asarray(dev), vals)
    info_dn = {}
    out = lc.fetch_packed(jnp.asarray(vals), delta=True, info=info_dn)
    assert info_dn["delta"] is True and info_dn["nbits"] == 6
    np.testing.assert_array_equal(out, vals)


def test_sub_byte_wire_bits_per_vox():
    """The headline accounting: near-constant microscopy background must
    ship at ~2 bits/vox, not the former 8-bit floor."""
    rng = np.random.default_rng(22)
    n = 1 << 20
    vals = (100 + np.cumsum(rng.integers(-1, 2, n))).astype(np.uint16)
    info = {}
    dev = lc.put_packed(vals, delta=True, info=info)
    assert info["delta"] is True and info["nbits"] == 2
    assert info["bytes"] * 8 / n < 2.2  # ~2 bits/vox + row firsts
    np.testing.assert_array_equal(np.asarray(dev), vals)


def test_fetch_packed_exception_at_residual_zero():
    """Regression: when the FIRST residual is itself an out-of-width
    exception and the exception buffer has padded (unused) slots, the
    pad entries must not overwrite index 0's true value in the host's
    last-write-wins scatter (r4 review finding: 2047 corrupted values)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(31)
    n = 1 << 20
    vals = (248 + np.cumsum(rng.integers(-2, 3, n))).astype(np.uint16)
    vals[0] = 60000  # residual 0 (vals[1]-vals[0]) is a huge jump
    dev = jnp.asarray(vals)
    info = {}
    out = lc.fetch_packed(dev, delta=True, info=info)
    assert info["delta"] is True and info["nbits"] < 16
    np.testing.assert_array_equal(out, vals)


def test_put_packed_info_bytes_count_padded_exceptions():
    """info['bytes'] (and the delta-vs-plain decision) must count the
    PADDED exception capacity actually shipped, not the raw count."""
    rng = np.random.default_rng(32)
    n = 1 << 20
    vals = (1000 + np.cumsum(rng.integers(-3, 4, n))).astype(np.uint16)
    vals[12345] = 64000  # exactly one hot pixel -> 2 exceptions, cap 16
    info = {}
    dev = lc.put_packed(vals, delta=True, info=info)
    assert info["delta"] is True
    n_rows = lc._delta_rows(n)
    base = lc.delta_byte_count(n, info["nbits"])
    assert (info["bytes"] - base) % lc._EXC_BYTES == 0
    n_exc_shipped = (info["bytes"] - base) // lc._EXC_BYTES
    assert n_exc_shipped == lc._exc_capacity(n_exc_shipped)  # quantized
    np.testing.assert_array_equal(np.asarray(dev), vals)


# ---------------------------------------------------------------------------
# second-difference ("delta2") candidate
# ---------------------------------------------------------------------------


def _smooth_2d(shape, seed=0, scale=3000.0):
    """Band-limited 2-D content: locally constant gradients, where the
    2nd-order residual entropy sits well below the 1st-order delta."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    d = gaussian_filter(rng.random(shape), 3.0)
    d -= d.min()
    return (d * (scale / max(d.max(), 1e-9))).astype(np.uint16)


def test_delta2_roundtrip_np_jax_parity():
    rng = np.random.default_rng(0)
    for shape in [(64, 130), (7, 33, 257), (3, 5, 9)]:
        for vals in [
            rng.integers(0, 1 << 16, shape).astype(np.uint16),
            np.zeros(shape, np.uint16),
            _smooth_2d(shape, seed=1),
        ]:
            flat = vals.reshape(-1)
            X = shape[-1]
            f, z = lc.delta2_encode_np(flat, X)
            np.testing.assert_array_equal(
                lc.delta2_decode_np(f, z, X, flat.size), flat
            )
            fj, zj = lc.delta2_encode_jax(flat, X)
            np.testing.assert_array_equal(np.asarray(fj), f)
            np.testing.assert_array_equal(np.asarray(zj), z)
            np.testing.assert_array_equal(
                np.asarray(lc.delta2_decode_jax(fj, zj, X, flat.size)), flat
            )


def test_put_packed_delta2_smooth_2d_wins_and_roundtrips():
    vals = _smooth_2d((1024, 1024), seed=2)
    info = {}
    dev = lc.put_packed(vals, delta=True, info=info)
    assert info["delta"] is True and info["mode"] == "delta2"
    # self-deciding: must undercut BOTH plain and first-order delta
    f1, r1 = lc.delta_encode_np(vals.reshape(-1))
    nb1, ei, _ = lc._choose_delta_width_np(r1)
    d1_bytes = lc.delta_byte_count(vals.size, nb1) + lc._EXC_BYTES * (
        lc._exc_capacity(0 if ei is None else ei.size)
    )
    assert info["bytes"] < d1_bytes
    np.testing.assert_array_equal(np.asarray(dev), vals)


def test_fetch_packed_delta2_smooth_2d_wins_and_roundtrips():
    import jax.numpy as jnp

    vals = _smooth_2d((40, 181, 211), seed=3)
    dev = jnp.asarray(vals)
    info = {}
    out = lc.fetch_packed(dev, delta=True, info=info)
    # 3D smooth content: the higher-order candidate (delta2, or delta3
    # when it undercuts it) must engage
    assert info["delta"] is True and info["mode"] in ("delta2", "delta3")
    np.testing.assert_array_equal(out, vals)
    buf = np.empty(vals.shape, np.uint16)
    out2 = lc.fetch_packed(dev, out=buf, delta=True)
    assert out2 is buf
    np.testing.assert_array_equal(buf, vals)


def test_delta2_exception_path_roundtrips_both_directions():
    import jax.numpy as jnp

    # smooth field + sparse hot pixels: hot residuals exceed the chosen
    # width and must travel on the exception list — including when the
    # FIRST residual is an exception (the r4 pad-slot corruption class)
    vals = _smooth_2d((512, 1100), seed=4)
    vals[0, 1] = 65000
    vals[100, 500] = 64000
    vals[511, 1099] = 63000
    info = {}
    dev = lc.put_packed(vals, delta=True, info=info)
    assert info["mode"] == "delta2"
    np.testing.assert_array_equal(np.asarray(dev), vals)

    info_f = {}
    out = lc.fetch_packed(jnp.asarray(vals), delta=True, info=info_f)
    assert info_f["mode"] == "delta2"
    np.testing.assert_array_equal(out, vals)


def test_delta2_kill_switch(monkeypatch):
    monkeypatch.setenv("MVS_TPU_LINK_DELTA2", "0")
    vals = _smooth_2d((1024, 1024), seed=5)
    info = {}
    dev = lc.put_packed(vals, delta=True, info=info)
    assert info["mode"] in ("delta", "plain")
    np.testing.assert_array_equal(np.asarray(dev), vals)


def test_delta2_ineligible_1d_falls_back():
    # 1-D stream: no true rows -> delta2 never considered
    rng = np.random.default_rng(6)
    vals = (2000 + np.cumsum(rng.integers(-2, 3, 1 << 20))).astype(np.uint16)
    info = {}
    dev = lc.put_packed(vals, delta=True, info=info)
    assert info["mode"] in ("delta", "plain")
    np.testing.assert_array_equal(np.asarray(dev), vals)


def test_odd_width_tier_engages_on_microscopy_like_content():
    """The 6->8 tier jump cost ~12% wire bytes on smooth microscopy-like
    content whose delta2 residual entropy sits at ~6-7 bits; the odd
    widths (3/5/7, group-of-8 packing) let the chooser land between the
    even tiers. Gaussian-filtered noise (bench _smooth_tile content)
    must choose a sub-8 delta2 width and round-trip bit-exactly both
    directions."""
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(0)
    d = gaussian_filter(rng.random((16, 256, 256)), 1.5)
    d -= d.min()
    vals = (d * (1000.0 / d.max())).astype(np.uint16)

    info_up = {}
    dev = lc.put_packed(vals, delta=True, info=info_up)
    assert info_up["mode"] in ("delta2", "delta3") and info_up["nbits"] < 8
    np.testing.assert_array_equal(np.asarray(dev), vals)

    info_dn = {}
    out = lc.fetch_packed(jnp.asarray(vals), delta=True, info=info_dn)
    assert info_dn["mode"] in ("delta2", "delta3") and info_dn["nbits"] < 8
    np.testing.assert_array_equal(out, vals)

    # the odd tier must actually be cheaper than the old even-tier choice
    _, resid = lc.delta2_encode_np(vals.reshape(-1), vals.shape[-1])
    nb, ei, _ = lc._choose_delta_width_np(resid)
    cost = lc.delta2_byte_count(vals.size, vals.shape[-1], nb) + (
        lc._EXC_BYTES * lc._exc_capacity(0 if ei is None else ei.size)
    )
    best_even = None
    for onb in (2, 4, 6, 8, 10, 12, 16):
        lim = (1 << onb) - 1
        ne = int((resid > lim).sum()) if onb < 16 else 0
        c = lc.delta2_byte_count(vals.size, vals.shape[-1], onb) + (
            lc._EXC_BYTES * lc._exc_capacity(ne)
        )
        best_even = c if best_even is None else min(best_even, c)
    assert cost < best_even


def _smooth_3d(shape, seed=0, scale=1200.0, sigma=2.0):
    """z-correlated smooth volume (microscopy-stack-like content)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    d = gaussian_filter(rng.random(shape), sigma)
    d -= d.min()
    return (d * (scale / max(d.max(), 1e-9))).astype(np.uint16)


def test_delta3_roundtrip_np_jax_parity():
    rng = np.random.default_rng(10)
    for shape in [(2, 5, 9), (4, 7, 33), (3, 2, 8, 17)]:
        X, Y = shape[-1], shape[-2]
        for vals in [
            rng.integers(0, 1 << 16, shape).astype(np.uint16),
            np.zeros(shape, np.uint16),
            _smooth_3d(shape, seed=11),
        ]:
            flat = vals.reshape(-1)
            f, z = lc.delta3_encode_np(flat, X, Y)
            np.testing.assert_array_equal(
                lc.delta3_decode_np(f, z, X, Y, flat.size), flat
            )
            fj, zj = lc.delta3_encode_jax(flat, X, Y)
            np.testing.assert_array_equal(np.asarray(fj), f)
            np.testing.assert_array_equal(np.asarray(zj), z)
            np.testing.assert_array_equal(
                np.asarray(lc.delta3_decode_jax(fj, zj, X, Y, flat.size)),
                flat,
            )


def test_put_packed_delta3_zsmooth_wins_and_roundtrips():
    # z-correlated stack: the third difference strips the per-plane
    # gradient that delta2 still carries, so delta3 must undercut it
    vals = _smooth_3d((16, 288, 288), seed=12, sigma=3.0)
    info = {}
    dev = lc.put_packed(vals, delta=True, info=info)
    assert info["mode"] == "delta3"
    # self-deciding: must undercut the delta2 candidate's best cost
    _, r2 = lc.delta2_encode_np(vals.reshape(-1), vals.shape[-1])
    nb2, ei2, _ = lc._choose_delta_width_np(r2)
    d2_bytes = lc.delta2_byte_count(
        vals.size, vals.shape[-1], nb2
    ) + lc._EXC_BYTES * lc._exc_capacity(0 if ei2 is None else ei2.size)
    assert info["bytes"] < d2_bytes
    np.testing.assert_array_equal(np.asarray(dev), vals)


def test_fetch_packed_delta3_zsmooth_wins_and_roundtrips():
    import jax.numpy as jnp

    vals = _smooth_3d((16, 208, 208), seed=13, sigma=3.0)
    dev = jnp.asarray(vals)
    info = {}
    out = lc.fetch_packed(dev, delta=True, info=info)
    assert info["mode"] == "delta3"
    np.testing.assert_array_equal(out, vals)
    buf = np.empty(vals.shape, np.uint16)
    out2 = lc.fetch_packed(dev, out=buf, delta=True)
    assert out2 is buf
    np.testing.assert_array_equal(buf, vals)


def test_delta3_exception_path_roundtrips_both_directions():
    import jax.numpy as jnp

    # smooth volume + sparse hot voxels (incl. the very first residual
    # slot and the last voxel): exceptions travel on the side list
    vals = _smooth_3d((12, 256, 256), seed=14, sigma=3.0)
    vals[0, 0, 1] = 65000
    vals[5, 128, 100] = 64000
    vals[11, 255, 255] = 63000
    info = {}
    dev = lc.put_packed(vals, delta=True, info=info)
    assert info["mode"] == "delta3"
    np.testing.assert_array_equal(np.asarray(dev), vals)

    info_f = {}
    out = lc.fetch_packed(jnp.asarray(vals), delta=True, info=info_f)
    assert info_f["mode"] == "delta3"
    np.testing.assert_array_equal(out, vals)


def test_delta3_kill_switch(monkeypatch):
    monkeypatch.setenv("MVS_TPU_LINK_DELTA3", "0")
    vals = _smooth_3d((16, 208, 208), seed=13, sigma=3.0)
    info = {}
    dev = lc.put_packed(vals, delta=True, info=info)
    assert info["mode"] in ("delta", "delta2", "plain")
    np.testing.assert_array_equal(np.asarray(dev), vals)


def test_delta3_ineligible_2d_falls_back():
    # a single plane has no third difference: delta3 never considered
    vals = _smooth_2d((1024, 1024), seed=15)
    info = {}
    dev = lc.put_packed(vals, delta=True, info=info)
    assert info["mode"] in ("delta", "delta2", "plain")
    np.testing.assert_array_equal(np.asarray(dev), vals)
