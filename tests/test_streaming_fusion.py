"""Banded streaming fusion tier: parity with the monolithic tiers.

The streaming driver (fusion/_streaming.py) pipelines view-batch uploads,
band kernels, and band downloads; these tests force it on small grids
(MVS_TPU_STREAM_BYTES=0) and compare bit-exactly against the default path.
"""

import os

import numpy as np
import pytest

from multiview_stitcher_tpu import fusion, si_utils
from multiview_stitcher_tpu.fusion import _core, _streaming


def _grid_sims(n=5, tile=48, overlap=12, ndim=2, dtype=np.uint16, seed=0):
    rng = np.random.default_rng(seed)
    sdims = ["z", "y", "x"][-ndim:]
    step = tile - overlap
    grid = (1, n, n) if ndim == 3 else (n, n)
    sims = []
    for idx in np.ndindex(grid):
        data = rng.integers(0, 3000, (tile,) * ndim).astype(dtype)
        sims.append(
            si_utils.get_sim_from_array(
                data,
                dims=sdims,
                translation={
                    d: float(idx[i] * step) for i, d in enumerate(sdims)
                },
            )
        )
    return sims


@pytest.fixture
def force_streaming(monkeypatch):
    monkeypatch.setenv("MVS_TPU_STREAM_BYTES", "0")
    # small kernel tiles so test-sized grids form >= 3 bands
    monkeypatch.setenv("MVS_TPU_PALLAS_TILE_2D", "64,64")
    monkeypatch.setenv("MVS_TPU_PALLAS_TILE_3D", "8,32,64")
    _core.clear_device_tile_cache()
    yield
    _core.clear_device_tile_cache()


@pytest.mark.parametrize("ndim", [2, 3])
def test_streaming_matches_monolithic(ndim, force_streaming, monkeypatch):
    tk = si_utils.DEFAULT_TRANSFORM_KEY
    n = 6 if ndim == 2 else 5
    sims = _grid_sims(n=n, tile=48, overlap=12, ndim=ndim)

    called = {}
    orig = _streaming.execute_streaming

    def spy(*a, **k):
        res = orig(*a, **k)
        called["streaming"] = res is not None
        return res

    monkeypatch.setattr(_streaming, "execute_streaming", spy)
    out_s = np.asarray(
        fusion.fuse(sims, transform_key=tk, output_chunksize=64).data
    )
    assert called.get("streaming"), "streaming tier did not run"

    monkeypatch.setenv("MVS_TPU_STREAM", "0")
    _core.clear_device_tile_cache()
    out_m = np.asarray(
        fusion.fuse(sims, transform_key=tk, output_chunksize=64).data
    )
    np.testing.assert_array_equal(out_s, out_m)


@pytest.mark.slow
def test_streaming_zarr_inputs_and_sink(tmp_path, force_streaming, monkeypatch):
    """Lazy zarr tiles -> streaming fuse -> zarr store, vs in-memory fuse."""
    from multiview_stitcher_tpu.io import zarr_backend

    called = {}
    orig = _streaming.execute_streaming

    def spy(*a, **k):
        res = orig(*a, **k)
        called["streaming"] = res is not None
        return res

    monkeypatch.setattr(_streaming, "execute_streaming", spy)

    tk = si_utils.DEFAULT_TRANSFORM_KEY
    sims_mem = _grid_sims(n=5, tile=40, overlap=10, ndim=3)
    sims_lazy = []
    for i, s in enumerate(sims_mem):
        url = str(tmp_path / f"tile_{i}.zarr")
        arr = zarr_backend.create_zarr_array(
            url, shape=s.data.shape, dtype=str(s.data.dtype),
            chunks=s.data.shape,
        )
        arr[...] = np.asarray(s.data)
        lazy = zarr_backend.open_zarr_array(url)
        sims_lazy.append(
            si_utils.get_sim_from_array(
                lazy, dims=("z", "y", "x"),
                translation={
                    d: float(si_utils.get_origin_from_sim(s)[d])
                    for d in ("z", "y", "x")
                },
            )
        )
    out_url = str(tmp_path / "fused.zarr")
    out_lazy = fusion.fuse(
        sims_lazy, transform_key=tk, output_chunksize=64,
        output_zarr_url=out_url,
    )
    assert called.get("streaming"), "streaming tier did not run"
    os.environ["MVS_TPU_STREAM"] = "0"
    try:
        _core.clear_device_tile_cache()
        out_mem = fusion.fuse(sims_mem, transform_key=tk, output_chunksize=64)
    finally:
        os.environ.pop("MVS_TPU_STREAM")
    np.testing.assert_array_equal(
        np.asarray(out_lazy.data).squeeze(), np.asarray(out_mem.data)
    )


def test_plan_bands_rejects_degenerate():
    # all views at the same position: no axis can form >= 3 bands
    offs = np.zeros((4, 2), np.float32)
    extents = np.full((4, 2), 64.0, np.float32)
    assert _streaming.plan_bands(offs, extents, (64, 64), (16, 16)) is None


def test_plan_bands_grid_layout():
    # 8 views in a column, 32 px step, 64 px extent
    offs = np.zeros((8, 2), np.float32)
    offs[:, 0] = -np.arange(8) * 32.0
    extents = np.full((8, 2), 64.0, np.float32)
    bands = _streaming.plan_bands(offs, extents, (288, 64), (16, 16))
    assert bands is not None
    assert bands["axis"] == 0
    B, H = bands["B"], bands["H"]
    assert B >= 3 and H % 16 == 0
    # every band's view range covers the views overlapping it
    for b in range(B):
        y0, y1 = b * H, (b + 1) * H
        expect = {
            v for v in range(8)
            if (v * 32 < y1 + 2) and (v * 32 + 64 > y0 - 2)
        }
        got = set(range(int(bands["lo"][b]), int(bands["hi"][b])))
        assert expect <= got


def test_streaming_seeds_device_tile_cache(force_streaming):
    """A streaming pass retains its uploaded batches and seeds the device
    tile cache; the next fuse() over the same inputs streams from RESIDENT
    tiles (device-side gathers, zero host uploads), bit-identical."""
    from multiview_stitcher_tpu.ops import link_codec

    sims = _grid_sims(n=4)
    _core.clear_device_tile_cache()
    uploads = {"n": 0}
    orig_put = link_codec.put_packed

    def spy_put(*args, **kwargs):
        uploads["n"] += 1
        return orig_put(*args, **kwargs)

    link_codec.put_packed = spy_put
    try:
        first = fusion.fuse(
            sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY
        ).to_numpy()
        assert uploads["n"] > 0
        key = _core._DeviceTileCache.key_for(sims)
        assert _core._device_tile_cache.get(key) is not None
        uploads["n"] = 0
        second = fusion.fuse(
            sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY
        ).to_numpy()
        assert uploads["n"] == 0  # repeat pass never touches the host link
    finally:
        link_codec.put_packed = orig_put
        _core.clear_device_tile_cache()
    np.testing.assert_array_equal(first, second)


def test_streaming_irregular_view_density(force_streaming, monkeypatch):
    """Sparse rows + a dense cluster: a band's own view span can be much
    narrower than the global NV window, which previously read upload
    batches that were never submitted (review finding r2). Tiny upload
    batches force the multi-batch window path. Must match the monolithic
    path bit-for-bit."""
    monkeypatch.setenv("MVS_TPU_STREAM_BATCH_BYTES", "1")  # U = 1 view
    rng = np.random.default_rng(33)
    tile = 40
    sims = []
    # sparse column of single tiles...
    for iy in range(6):
        sims.append(
            si_utils.get_sim_from_array(
                rng.integers(0, 3000, (tile, tile)).astype(np.uint16),
                translation={"y": float(iy * 30), "x": 0.0},
            )
        )
    # ...then a dense horizontal cluster sharing one band
    for ix in range(12):
        sims.append(
            si_utils.get_sim_from_array(
                rng.integers(0, 3000, (tile, tile)).astype(np.uint16),
                translation={"y": 200.0, "x": float(ix * 12)},
            )
        )
    import warnings as _warnings

    _core.clear_device_tile_cache()
    with _warnings.catch_warnings():
        # a tier-fallback warning means streaming itself failed — that is
        # exactly the regression this test guards against
        _warnings.simplefilter("error", RuntimeWarning)
        streamed = fusion.fuse(
            sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY
        ).to_numpy()
    _core.clear_device_tile_cache()
    os.environ["MVS_TPU_STREAM"] = "0"
    try:
        ref = fusion.fuse(
            sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY
        ).to_numpy()
    finally:
        os.environ.pop("MVS_TPU_STREAM", None)
    np.testing.assert_array_equal(streamed, ref)


def test_streaming_telemetry_recorded(force_streaming):
    """A completed run leaves full telemetry in _streaming.last_telemetry:
    bytes moved each way, bands done, and voxels written (VERDICT r2 1b)."""
    tk = si_utils.DEFAULT_TRANSFORM_KEY
    sims = _grid_sims(n=6, tile=48, overlap=12, ndim=2)
    _core.clear_device_tile_cache()
    fused = fusion.fuse(sims, transform_key=tk, output_chunksize=64)
    out = np.asarray(fused.data)
    tele = _streaming.last_telemetry
    assert tele["bands_done"] == tele["bands_total"] > 0
    assert not tele["aborted"]
    assert tele["up_bytes"] > 0
    assert tele["down_bytes"] > 0
    assert tele["voxels_written"] == out.size
    assert tele["elapsed_s"] > 0
    # wire accounting (VERDICT r3 item 2): bits per fused voxel over both
    # directions, well below the raw uint16 cost for packed transfers
    assert tele["wire_bits_per_vox"] == pytest.approx(
        8.0 * (tele["up_bytes"] + tele["down_bytes"]) / out.size
    )


def test_streaming_smooth_data_ships_delta(force_streaming, monkeypatch):
    """Smooth (low first-difference entropy) uint16 tiles trigger the delta
    link codec on uploads AND band downloads, shrinking wire bytes below
    plain bit-packing (VERDICT r3 item 2)."""
    from multiview_stitcher_tpu.ops import link_codec

    # test-sized arrays sit under the real packing threshold; lower it so
    # the codec decision logic is exercised end-to-end, and shrink the
    # upload batch so batch padding stays negligible at test scale
    monkeypatch.setattr(link_codec, "_MIN_PACK_SIZE", 0)
    monkeypatch.setenv("MVS_TPU_STREAM_BATCH_BYTES", str(6 * 48 * 48 * 2))
    tk = si_utils.DEFAULT_TRANSFORM_KEY
    n, tile, overlap = 6, 48, 12
    step = tile - overlap
    # smooth ramp + small noise: residuals fit 8 bits, plain max needs 12
    yy, xx = np.mgrid[0:tile, 0:tile]
    rng = np.random.default_rng(3)
    sims = []
    for idx in np.ndindex((n, n)):
        data = (
            1024 + 2 * (yy + xx) + rng.integers(0, 4, (tile, tile))
        ).astype(np.uint16)
        sims.append(
            si_utils.get_sim_from_array(
                data, dims=["y", "x"],
                translation={"y": float(idx[0] * step),
                             "x": float(idx[1] * step)},
            )
        )
    _core.clear_device_tile_cache()
    fused = fusion.fuse(sims, transform_key=tk, output_chunksize=64)
    out = np.asarray(fused.data)
    tele = _streaming.last_telemetry
    assert tele["up_delta_batches"] > 0
    assert tele["down_delta_bands"] > 0
    # delta residuals pack to 8 bits -> strictly fewer wire bytes than the
    # 12-bit plain packing of values ~1024-1400
    up_vox = sum(int(np.prod(s.data.shape)) for s in sims)
    assert tele["up_bytes"] < link_codec.packed_byte_count(up_vox, 12)
    assert tele["down_bytes"] < link_codec.packed_byte_count(out.size, 12)

    # parity: delta-coded run matches the delta-disabled run bit-exactly
    monkeypatch.setenv("MVS_TPU_STREAM_DELTA", "0")
    monkeypatch.setenv("MVS_TPU_LINK_DELTA", "0")
    _core.clear_device_tile_cache()
    out_plain = np.asarray(
        fusion.fuse(sims, transform_key=tk, output_chunksize=64).data
    )
    assert _streaming.last_telemetry["up_delta_batches"] == 0
    np.testing.assert_array_equal(out, out_plain)


def test_streaming_deadline_aborts(force_streaming, monkeypatch):
    """An exceeded deadline raises StreamingDeadlineError (not a silent
    fallback to a slower monolithic tier) and keeps partial telemetry."""
    tk = si_utils.DEFAULT_TRANSFORM_KEY
    sims = _grid_sims(n=6, tile=48, overlap=12, ndim=2)
    monkeypatch.setenv("MVS_TPU_STREAM_DEADLINE_S", "0")
    _core.clear_device_tile_cache()
    with pytest.raises(_streaming.StreamingDeadlineError) as ei:
        fusion.fuse(sims, transform_key=tk, output_chunksize=64)
    tele = ei.value.telemetry
    assert tele["aborted"]
    assert tele["bands_done"] < tele["bands_total"]
    assert tele is _streaming.last_telemetry


def test_streaming_band_fetch_failure_falls_back(force_streaming, monkeypatch):
    """A band download error mid-pipeline must not deadlock the inflight
    semaphore: execute_streaming raises, the tier dispatcher warns and
    falls back to a monolithic tier, and the result is still correct
    (VERDICT r2 item 7: failure injection)."""
    tk = si_utils.DEFAULT_TRANSFORM_KEY
    sims = _grid_sims(n=6, tile=48, overlap=12, ndim=2)
    ref = fusion.fuse(
        sims, transform_key=tk, output_chunksize=64
    ).to_numpy()

    from multiview_stitcher_tpu.ops import link_codec

    calls = {"n": 0}
    orig_fetch = link_codec.fetch_packed

    def failing_fetch(*a, **k):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("injected band fetch failure")
        return orig_fetch(*a, **k)

    monkeypatch.setattr(link_codec, "fetch_packed", failing_fetch)
    _core.clear_device_tile_cache()
    with pytest.warns(RuntimeWarning, match="Streaming fusion tier failed"):
        out = fusion.fuse(
            sims, transform_key=tk, output_chunksize=64
        ).to_numpy()
    assert calls["n"] >= 2  # the injection actually fired
    np.testing.assert_array_equal(out, ref)


def test_streaming_upload_failure_falls_back(force_streaming, monkeypatch):
    """An upload (put) error during batch prefetch surfaces cleanly and the
    dispatcher falls back — no hang on the prefetch futures."""
    tk = si_utils.DEFAULT_TRANSFORM_KEY
    sims = _grid_sims(n=6, tile=48, overlap=12, ndim=2)
    ref = fusion.fuse(
        sims, transform_key=tk, output_chunksize=64
    ).to_numpy()

    from multiview_stitcher_tpu.ops import link_codec

    calls = {"n": 0}
    orig_put = link_codec.put_packed

    def failing_put(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            # first streaming upload fails; later calls (the monolithic
            # fallback uploads tiles through the same codec) succeed
            raise OSError("injected upload failure")
        return orig_put(*a, **k)

    monkeypatch.setattr(link_codec, "put_packed", failing_put)
    _core.clear_device_tile_cache()
    with pytest.warns(RuntimeWarning, match="Streaming fusion tier failed"):
        out = fusion.fuse(
            sims, transform_key=tk, output_chunksize=64
        ).to_numpy()
    np.testing.assert_array_equal(out, ref)


def test_streaming_abort_stashes_uploads_for_resume(
    force_streaming, monkeypatch
):
    """A deadline-aborted run donates its completed uploads to the next
    run over the same inputs: the retry reuses stashed device batches
    (fewer up_bytes), completes, matches the clean result bit-exactly,
    and seeds the full device tile cache (stash then cleared)."""
    import time as time_mod

    tk = si_utils.DEFAULT_TRANSFORM_KEY
    sims = _grid_sims(n=6, tile=48, overlap=12, ndim=2)
    # many small upload batches so a partial stash is meaningful
    monkeypatch.setenv("MVS_TPU_STREAM_BATCH_BYTES", "20000")

    # control: full clean run (also the parity reference)
    _core.clear_device_tile_cache()
    ref = fusion.fuse(
        sims, transform_key=tk, output_chunksize=64
    ).to_numpy()
    control_up = _streaming.last_telemetry["up_bytes"]
    assert control_up > 0

    # aborted run: a fake clock advances 0.5 s per perf_counter() call so
    # the 2 s deadline trips after the first band consumed its batches
    _core.clear_device_tile_cache()
    assert _streaming._upload_stash == {}
    with pytest.MonkeyPatch.context() as mp:
        state = {"t": 0.0}
        real_perf = time_mod.perf_counter

        def fake_perf():
            state["t"] += 0.5
            return state["t"]

        mp.setattr(time_mod, "perf_counter", fake_perf)
        mp.setenv("MVS_TPU_STREAM_DEADLINE_S", "2")
        with pytest.raises(_streaming.StreamingDeadlineError):
            fusion.fuse(sims, transform_key=tk, output_chunksize=64)
        del real_perf
    entry = _streaming._upload_stash.get("entry")
    assert entry is not None and len(entry["batches"]) > 0
    n_stashed = len(entry["batches"])  # snapshot: the dict is reused

    # resumed run: reuses the stash, uploads strictly less, matches
    resumed = fusion.fuse(
        sims, transform_key=tk, output_chunksize=64
    ).to_numpy()
    tele = _streaming.last_telemetry
    assert tele["up_batches_reused"] == n_stashed
    assert tele["up_bytes"] < control_up
    np.testing.assert_array_equal(resumed, ref)
    # completion seeded the full tile cache and retired the stash
    assert _streaming._upload_stash == {}
    again = fusion.fuse(
        sims, transform_key=tk, output_chunksize=64
    ).to_numpy()
    assert _streaming.last_telemetry["up_bytes"] == 0
    np.testing.assert_array_equal(again, ref)


def test_streaming_smooth_data_ships_delta2(force_streaming, monkeypatch):
    """Band-limited (locally constant gradient) content engages the
    SECOND-difference wire candidate end-to-end — and ships strictly
    fewer bytes than with delta2 disabled, bit-exactly."""
    from scipy.ndimage import gaussian_filter

    from multiview_stitcher_tpu.ops import link_codec

    monkeypatch.setattr(link_codec, "_MIN_PACK_SIZE", 0)
    monkeypatch.setenv("MVS_TPU_STREAM_BATCH_BYTES", str(6 * 48 * 48 * 2))
    tk = si_utils.DEFAULT_TRANSFORM_KEY
    n, tile, overlap = 6, 48, 12
    step = tile - overlap
    rng = np.random.default_rng(7)
    sims = []
    for idx in np.ndindex((n, n)):
        d = gaussian_filter(rng.random((tile, tile)), 3.0)
        d -= d.min()
        data = (d * (3000 / max(d.max(), 1e-9))).astype(np.uint16)
        sims.append(
            si_utils.get_sim_from_array(
                data, dims=["y", "x"],
                translation={"y": float(idx[0] * step),
                             "x": float(idx[1] * step)},
            )
        )
    _core.clear_device_tile_cache()
    fused = fusion.fuse(sims, transform_key=tk, output_chunksize=64)
    out = np.asarray(fused.data)
    tele = dict(_streaming.last_telemetry)
    assert tele["down_delta2_bands"] > 0
    # delta2 counters are a subset of the delta-family counters
    assert tele["down_delta_bands"] >= tele["down_delta2_bands"]

    # disabling ONLY delta2 must grow (or keep) wire bytes, bit-exactly
    monkeypatch.setenv("MVS_TPU_LINK_DELTA2", "0")
    _core.clear_device_tile_cache()
    out_d1 = np.asarray(
        fusion.fuse(sims, transform_key=tk, output_chunksize=64).data
    )
    tele_d1 = dict(_streaming.last_telemetry)
    assert tele_d1["down_delta2_bands"] == 0
    np.testing.assert_array_equal(out, out_d1)
    assert (
        tele["up_bytes"] + tele["down_bytes"]
        <= tele_d1["up_bytes"] + tele_d1["down_bytes"]
    )


def test_packed_upload_stash_makes_repeat_pass_download_only(
    force_streaming, monkeypatch
):
    """When the tile set exceeds the device tile cache budget, a
    SUCCESSFUL pass keeps its uploads' PACKED device streams; the next
    pass over the same inputs rebuilds every batch with a device unpack —
    zero up-leg bytes — and matches bit-exactly. (Previously only an
    ABORTED pass donated its uploads via the unpacked resume stash.)"""
    from multiview_stitcher_tpu.ops import link_codec

    monkeypatch.setattr(link_codec, "_MIN_PACK_SIZE", 0)
    monkeypatch.setenv("MVS_TPU_TILE_CACHE_BYTES", "0")  # force streaming-only
    monkeypatch.setenv("MVS_TPU_STREAM_BATCH_BYTES", str(6 * 48 * 48 * 2))
    tk = si_utils.DEFAULT_TRANSFORM_KEY
    sims = _grid_sims(n=6, tile=48, overlap=12, ndim=2)
    _core.clear_device_tile_cache()

    out1 = np.asarray(fusion.fuse(sims, transform_key=tk,
                                  output_chunksize=64).data)
    tele1 = dict(_streaming.last_telemetry)
    assert tele1["up_bytes"] > 0
    assert tele1["up_batches_reused_packed"] == 0
    assert "packed_entry" in _streaming._upload_stash

    out2 = np.asarray(fusion.fuse(sims, transform_key=tk,
                                  output_chunksize=64).data)
    tele2 = dict(_streaming.last_telemetry)
    assert tele2["up_bytes"] == 0, tele2["up_bytes"]
    assert tele2["up_batches_reused_packed"] > 0
    np.testing.assert_array_equal(out1, out2)

    # budget 0 disables the packed stash entirely
    monkeypatch.setenv("MVS_TPU_UPLOAD_STASH_BYTES", "0")
    _core.clear_device_tile_cache()
    out3 = np.asarray(fusion.fuse(sims, transform_key=tk,
                                  output_chunksize=64).data)
    tele3 = dict(_streaming.last_telemetry)
    assert tele3["up_bytes"] > 0
    assert "packed_entry" not in _streaming._upload_stash
    np.testing.assert_array_equal(out1, out3)


def test_packed_stash_covers_tile_cache_seeding_failure(
    force_streaming, monkeypatch
):
    """If device-tile-cache seeding fails after a successful pass (seen
    live: bench r5 run 4 silently re-paid the full up leg), the repeat
    pass must fall back to the packed upload stash — download-only, with
    a visible warning instead of a silent re-upload."""
    from multiview_stitcher_tpu.ops import link_codec

    monkeypatch.setattr(link_codec, "_MIN_PACK_SIZE", 0)
    monkeypatch.setenv("MVS_TPU_STREAM_BATCH_BYTES", str(6 * 48 * 48 * 2))

    def boom(*a, **k):
        raise RuntimeError("simulated reorder failure")

    monkeypatch.setattr(_streaming, "_reorder_concat", boom)
    tk = si_utils.DEFAULT_TRANSFORM_KEY
    sims = _grid_sims(n=6, tile=48, overlap=12, ndim=2)
    _core.clear_device_tile_cache()

    with pytest.warns(RuntimeWarning, match="seeding failed"):
        out1 = np.asarray(
            fusion.fuse(sims, transform_key=tk, output_chunksize=64).data
        )
    assert _streaming.last_telemetry["up_bytes"] > 0
    assert "packed_entry" in _streaming._upload_stash

    with pytest.warns(RuntimeWarning, match="seeding failed"):
        out2 = np.asarray(
            fusion.fuse(sims, transform_key=tk, output_chunksize=64).data
        )
    tele2 = dict(_streaming.last_telemetry)
    assert tele2["up_bytes"] == 0
    assert tele2["up_batches_reused_packed"] > 0
    np.testing.assert_array_equal(out1, out2)
