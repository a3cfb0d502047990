import numpy as np
import pytest

from multiview_stitcher_tpu import fusion, msi_utils, param_utils, si_utils, weights


def _two_tile_sims(shape=(40, 60), overlap=20, dtype=np.float32, seed=0):
    """Two tiles cut from one ground-truth image with known translation."""
    rng = np.random.default_rng(seed)
    full = rng.random((shape[0], 2 * shape[1] - overlap)).astype(dtype) * 100
    tile0 = full[:, : shape[1]]
    tile1 = full[:, shape[1] - overlap :]
    sim0 = si_utils.get_sim_from_array(
        tile0, translation={"y": 0.0, "x": 0.0}
    )
    sim1 = si_utils.get_sim_from_array(
        tile1, translation={"y": 0.0, "x": float(shape[1] - overlap)}
    )
    return full, [sim0, sim1]


def test_blending_support_grid_matches_scipy_edt():
    from scipy.ndimage import distance_transform_edt

    source_bb = {
        "origin": {"y": 5.0, "x": -3.0},
        "spacing": {"y": 0.5, "x": 2.0},
        "shape": {"y": 41, "x": 21},
    }
    grid, props = weights.get_blending_support_grid(
        source_bb, blending_widths={"y": 10, "x": 10}
    )
    mask = np.zeros((5, 5))
    mask[1:-1, 1:-1] = 1
    sampling = [
        props["spacing"][d] / 10 for d in ["y", "x"]
    ]
    ref = distance_transform_edt(mask, sampling=sampling)
    np.testing.assert_allclose(grid, ref, rtol=1e-6)


def test_blending_weights_shape_and_range():
    source_bb = {
        "origin": {"y": 0.0, "x": 0.0},
        "spacing": {"y": 1.0, "x": 1.0},
        "shape": {"y": 50, "x": 50},
    }
    target_bb = {
        "origin": {"y": 0.0, "x": 0.0},
        "spacing": {"y": 1.0, "x": 1.0},
        "shape": {"y": 50, "x": 50},
    }
    w = np.asarray(
        weights.get_blending_weights(target_bb, source_bb, np.eye(3))
    )
    assert w.shape == (50, 50)
    assert (w >= 0).all() and (w <= 1).all()
    # interior plateau is 1, border tapers toward 0
    assert w[25, 25] == 1.0
    assert w[25, 0] < 0.5
    assert w[25, 1] > w[25, 0]


def test_fuse_identity_single_view():
    data = (np.random.random((30, 30)) * 100).astype(np.float32)
    sim = si_utils.get_sim_from_array(data)
    fused = fusion.fuse([sim], transform_key=si_utils.DEFAULT_TRANSFORM_KEY)
    np.testing.assert_allclose(fused.to_numpy(), data, atol=1e-4)


def test_fuse_two_tiles_reconstructs_ground_truth():
    full, sims = _two_tile_sims()
    fused = fusion.fuse(sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY)
    out = fused.to_numpy()
    assert out.shape == full.shape
    # non-overlap regions must be exact; overlap is a blend of identical data
    np.testing.assert_allclose(out, full, atol=1e-3)


def test_fuse_two_tiles_with_shifted_params():
    """Registration params (transform key) move tile content in the output."""
    full, sims = _two_tile_sims()
    # pretend tile1's metadata was off by 3 px in x; registration fixed it
    shifted = sims[1].copy()
    shifted.origin["x"] += 3.0
    si_utils.set_sim_affine(
        shifted,
        param_utils.affine_from_translation([0.0, -3.0]),
        transform_key="registered",
    )
    si_utils.set_sim_affine(
        sims[0], np.eye(3), transform_key="registered"
    )
    fused = fusion.fuse([sims[0], shifted], transform_key="registered")
    np.testing.assert_allclose(fused.to_numpy(), full, atol=1e-3)


@pytest.mark.parametrize(
    "fusion_func",
    [fusion.weighted_average_fusion, fusion.max_fusion, fusion.simple_average_fusion],
)
def test_fusion_funcs_on_identical_data(fusion_func):
    full, sims = _two_tile_sims()
    fused = fusion.fuse(
        sims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        fusion_func=fusion_func,
    )
    np.testing.assert_allclose(fused.to_numpy(), full, atol=1e-3)


def test_chunked_matches_unchunked():
    full, sims = _two_tile_sims()
    fused1 = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_chunksize=1024,
    )
    fused2 = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_chunksize=16,
    )
    np.testing.assert_allclose(
        fused1.to_numpy(), fused2.to_numpy(), atol=1e-3
    )


def test_fuse_multichannel_multitime():
    rng = np.random.default_rng(1)
    arr0 = rng.random((2, 3, 20, 20)).astype(np.float32)
    arr1 = rng.random((2, 3, 20, 20)).astype(np.float32)
    sims = [
        si_utils.get_sim_from_array(
            a,
            dims=("t", "c", "y", "x"),
            translation={"y": 0.0, "x": 15.0 * i},
            scale={"y": 1.0, "x": 1.0},
        )
        for i, a in enumerate([arr0, arr1])
    ]
    fused = fusion.fuse(sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY)
    assert fused.dims == ("t", "c", "y", "x")
    assert fused.sizes["t"] == 2 and fused.sizes["c"] == 3
    assert fused.sizes["x"] == 35
    # exclusive region of tile0 must match exactly per (t, c)
    np.testing.assert_allclose(
        fused.to_numpy()[:, :, :, :10], arr0[:, :, :, :10], atol=1e-4
    )


def test_output_stack_modes():
    _, sims = _two_tile_sims(shape=(40, 60), overlap=20)
    props_union = fusion.calc_fusion_stack_properties(
        sims,
        [si_utils.get_affine_from_sim(s, si_utils.DEFAULT_TRANSFORM_KEY) for s in sims],
        spacing={"y": 1.0, "x": 1.0},
        mode="union",
    )
    assert props_union["shape"] == {"y": 40, "x": 100}
    props_int = fusion.calc_fusion_stack_properties(
        sims,
        [si_utils.get_affine_from_sim(s, si_utils.DEFAULT_TRANSFORM_KEY) for s in sims],
        spacing={"y": 1.0, "x": 1.0},
        mode="intersection",
    )
    assert props_int["shape"]["x"] == 20
    assert props_int["origin"]["x"] == 40.0


def test_fuse_3d():
    rng = np.random.default_rng(2)
    full = rng.random((10, 20, 36)).astype(np.float32)
    t0 = full[:, :, :20]
    t1 = full[:, :, 16:]
    sims = [
        si_utils.get_sim_from_array(
            t0, scale={"z": 2.0, "y": 1.0, "x": 1.0},
            translation={"z": 0.0, "y": 0.0, "x": 0.0},
        ),
        si_utils.get_sim_from_array(
            t1, scale={"z": 2.0, "y": 1.0, "x": 1.0},
            translation={"z": 0.0, "y": 0.0, "x": 16.0},
        ),
    ]
    fused = fusion.fuse(sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY)
    assert fused.shape == (10, 20, 36)
    np.testing.assert_allclose(fused.to_numpy(), full, atol=1e-3)


def test_fuse_custom_fusion_func():
    """Extension API: custom funcs get arrays via signature dispatch."""
    calls = {}

    def my_fusion(transformed_views, blending_weights):
        calls["shapes"] = (
            np.asarray(transformed_views).shape,
            np.asarray(blending_weights).shape,
        )
        return np.nansum(
            np.asarray(transformed_views) * np.asarray(blending_weights), axis=0
        )

    full, sims = _two_tile_sims()
    fused = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        fusion_func=my_fusion,
    )
    assert "shapes" in calls
    np.testing.assert_allclose(fused.to_numpy(), full, atol=1e-3)


def test_fuse_msims_multiscale():
    full, sims = _two_tile_sims(shape=(256, 300), overlap=40)
    msims = [msi_utils.get_msim_from_sim(s) for s in sims]
    fused = fusion.fuse(msims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY)
    assert msi_utils.is_msim(fused)
    s0 = fused.get_scale("scale0")
    assert s0.shape == full.shape
    np.testing.assert_allclose(s0.to_numpy(), full, atol=1e-2)
    assert len(fused.sims) >= 2


def test_fuse_with_nan_inputs():
    """NaN pixels in input tiles are treated as outside-domain."""
    full, sims = _two_tile_sims()
    data = sims[0].to_numpy()
    data[:5, :5] = np.nan
    sims[0] = si_utils.get_sim_from_array(
        data, translation={"y": 0.0, "x": 0.0}
    )
    fused = fusion.fuse(sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY)
    out = fused.to_numpy()
    # NaN-only region (covered by no valid view) -> 0 after nan_to_num
    assert np.allclose(out[:5, :5], 0)
    # elsewhere unchanged
    np.testing.assert_allclose(out[10:, 10:], full[10:, 10:], atol=1e-3)


def test_fuse_output_on_backend():
    import jax

    full, sims = _two_tile_sims()
    fused = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_on_backend=True,
    )
    assert isinstance(fused.data, jax.Array)
    np.testing.assert_allclose(np.asarray(fused.data), full, atol=1e-3)


def test_fuse_output_stack_mode_sample():
    _, sims3 = _two_tile_sims()
    sims3 = [
        si_utils.get_sim_from_array(
            s.to_numpy()[None].repeat(4, axis=0),
            dims=("z", "y", "x"),
            translation={"z": 0.0, **s.origin},
        )
        for s in sims3
    ]
    props = fusion.calc_fusion_stack_properties(
        sims3,
        [
            si_utils.get_affine_from_sim(s, si_utils.DEFAULT_TRANSFORM_KEY)
            for s in sims3
        ],
        spacing={"z": 1.0, "y": 1.0, "x": 1.0},
        mode="sample",
    )
    assert props["shape"]["z"] == 1


def test_plan_built_once_across_channels(monkeypatch):
    """Spatial plan is computed once and reused for every (t, c) combination
    with identical params (reference fusion/_core.py:725, test_fusion.py:164)."""
    from multiview_stitcher_tpu.fusion import _core

    calls = {"n": 0}
    orig = _core._build_spatial_fusion_plan

    def counting(*args, **kwargs):
        calls["n"] += 1
        return orig(*args, **kwargs)

    monkeypatch.setattr(_core, "_build_spatial_fusion_plan", counting)

    rng = np.random.default_rng(0)
    sims = [
        si_utils.get_sim_from_array(
            rng.random((3, 2, 40, 40)).astype(np.float32),
            dims=("t", "c", "y", "x"),
            translation={"y": 0.0, "x": float(30 * i)},
        )
        for i in range(2)
    ]
    fused = fusion.fuse(sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY)
    assert fused.sizes["t"] == 3 and fused.sizes["c"] == 2
    assert calls["n"] == 1


class _ReadLogArray:
    """Lazy-array stand-in that records every window read."""

    def __init__(self, data):
        self._data = np.asarray(data)
        self.shape = self._data.shape
        self.dtype = self._data.dtype
        self.ndim = self._data.ndim
        self.reads = []

    def __getitem__(self, idx):
        self.reads.append(idx)
        return self._data[idx]


def test_fusion_reads_only_needed_windows(monkeypatch):
    """With lazy inputs too large for whole-tiles-on-device, fuse() must
    read per-chunk source windows, never materialize whole tiles
    (reference's laziness assertions, test_fusion.py:204)."""
    monkeypatch.setenv("MVS_TPU_TILES_MAX_BYTES", "0")
    rng = np.random.default_rng(1)
    n, tile, overlap = 2, 64, 16
    step = tile - overlap
    arrays, sims = [], []
    for iy in range(n):
        for ix in range(n):
            arr = _ReadLogArray(
                rng.integers(0, 1000, (tile, tile)).astype(np.uint16)
            )
            arrays.append(arr)
            sims.append(
                si_utils.get_sim_from_array(
                    arr,
                    translation={"y": float(iy * step), "x": float(ix * step)},
                )
            )
    fused = fusion.fuse(
        sims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_chunksize=32,
    )
    assert fused.shape == (2 * step + overlap,) * 2
    for arr in arrays:
        assert arr.reads, "every tile overlaps some chunk"
        for idx in arr.reads:
            assert isinstance(idx, tuple)
            for d, sl in enumerate(idx):
                span = (sl.stop or tile) - (sl.start or 0)
                assert span <= 32 + 2 * overlap + 8, (
                    f"window read too large: {idx}"
                )


def test_pallas_tier_failure_falls_back(monkeypatch):
    """A failing Pallas tier reroutes to the XLA tiers with a warning."""
    from multiview_stitcher_tpu.fusion import _core

    def boom(*args, **kwargs):
        raise RuntimeError("synthetic Mosaic failure")

    monkeypatch.setattr(_core, "_execute_fusion_plan_pallas", boom)
    rng = np.random.default_rng(2)
    sims = [
        si_utils.get_sim_from_array(
            rng.integers(0, 1000, (32, 32)).astype(np.uint16),
            translation={"y": 0.0, "x": float(24 * i)},
        )
        for i in range(2)
    ]
    with pytest.warns(RuntimeWarning, match="falling back"):
        fused = fusion.fuse(
            sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY
        )
    assert fused.shape == (32, 56)
    assert fused.to_numpy().max() > 0


def test_fuse_custom_output_grid():
    """output_spacing / output_origin / output_shape kwargs define the
    output grid (reference fuse API)."""
    full, sims = _two_tile_sims(shape=(40, 60), overlap=20)

    # 2x coarser grid: shape halves (pixel-center convention)
    coarse = fusion.fuse(
        sims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_spacing={"y": 2.0, "x": 2.0},
    )
    assert coarse.spacing == {"y": 2.0, "x": 2.0}
    assert abs(coarse.sizes["y"] - 20) <= 1
    assert abs(coarse.sizes["x"] - 50) <= 1
    # coarse grid samples the original at every other pixel
    np.testing.assert_allclose(
        coarse.to_numpy()[2:8, 2:8], full[4:16:2, 4:16:2], atol=1e-3
    )

    # explicit origin + shape crops the output window
    window = fusion.fuse(
        sims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_origin={"y": 10.0, "x": 20.0},
        output_shape={"y": 16, "x": 30},
    )
    assert window.shape == (16, 30)
    assert window.origin == {"y": 10.0, "x": 20.0}
    np.testing.assert_allclose(
        window.to_numpy(), full[10:26, 20:50], atol=1e-3
    )


def _mixed_shape_sims(dtype=np.float32, seed=7):
    """Three translation-placed tiles of DIFFERENT shapes cut from one
    ground-truth image (reference supports heterogeneous mosaics,
    fusion/_core.py:96 takes arbitrary per-view stack properties)."""
    rng = np.random.default_rng(seed)
    full = (rng.random((48, 100)) * 900).astype(dtype)
    cuts = [
        ((0, 40), (0, 44), {"y": 0.0, "x": 0.0}),
        ((0, 48), (36, 80), {"y": 0.0, "x": 36.0}),
        ((8, 48), (72, 100), {"y": 8.0, "x": 72.0}),
    ]
    sims = [
        si_utils.get_sim_from_array(
            full[y0:y1, x0:x1].copy(), translation=tr
        )
        for (y0, y1), (x0, x1), tr in cuts
    ]
    return full, sims


@pytest.mark.parametrize("dtype", [np.float32, np.uint16])
def test_mixed_tile_shapes_pallas_tier_matches_fallback(
    dtype, monkeypatch
):
    """Mixed tile shapes run through the Pallas tier (device-side padding
    to the common max shape + true per-view extents) and match the batched
    XLA tier bit-for-bit in the exact regions."""
    from multiview_stitcher_tpu.fusion import _core

    full, sims = _mixed_shape_sims(dtype=dtype)

    called = {"pallas": 0}
    orig = _core._execute_fusion_plan_pallas

    def spy(*args, **kwargs):
        called["pallas"] += 1
        return orig(*args, **kwargs)

    monkeypatch.setattr(_core, "_execute_fusion_plan_pallas", spy)
    fused = fusion.fuse(sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY)
    assert called["pallas"] == 1
    out = fused.to_numpy()
    assert out.shape == full.shape

    _core.clear_device_tile_cache()
    monkeypatch.setenv("MVS_TPU_PALLAS", "0")
    ref = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY
    ).to_numpy()
    # integer outputs may differ by 1 count between tiers (float blend
    # rounds on cast)
    np.testing.assert_allclose(
        out.astype(np.float64), ref.astype(np.float64),
        atol=1.0 if np.issubdtype(dtype, np.integer) else 1e-2,
    )
    # every ground-truth pixel covered by some view must be reconstructed
    covered = np.zeros(full.shape, dtype=bool)
    covered[0:40, 0:44] = True
    covered[0:48, 36:80] = True
    covered[8:48, 72:100] = True
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float64)[covered],
        np.asarray(full, dtype=np.float64)[covered],
        atol=1.0 if dtype == np.uint16 else 1e-3,
    )


def test_fuse_per_timepoint_transforms_end_to_end():
    """Views whose REGISTERED transforms differ per timepoint fuse with the
    correct per-t geometry (reference drift-recovery scenario,
    test_registration.py:262; t-aware output geometry in
    fusion/_core.py:188-207)."""
    rng = np.random.default_rng(11)
    T, H, W, overlap = 3, 36, 60, 16
    full = (rng.random((T, H, 2 * W - overlap)) * 100).astype(np.float32)
    drifts = [0, 2, 5]  # tile1's metadata is off by this many x pixels at t

    tile0 = full[:, :, :W]
    tile1 = np.stack(
        [
            full[t, :, W - overlap - drifts[t] : 2 * W - overlap - drifts[t]]
            for t in range(T)
        ]
    )
    sim0 = si_utils.get_sim_from_array(
        tile0, dims=("t", "y", "x"), translation={"y": 0.0, "x": 0.0}
    )
    sim1 = si_utils.get_sim_from_array(
        tile1,
        dims=("t", "y", "x"),
        translation={"y": 0.0, "x": float(W - overlap)},
    )
    # per-t registration result: shift tile1 by -drift[t] in x
    t_coords = np.arange(T)
    si_utils.set_sim_affine(
        sim0,
        param_utils.identity_transform(2, t_coords=t_coords),
        transform_key="registered",
    )
    si_utils.set_sim_affine(
        sim1,
        param_utils.XAffine(
            np.stack(
                [
                    param_utils.affine_from_translation([0.0, -float(d)])
                    for d in drifts
                ]
            ),
            t_coords=t_coords,
        ),
        transform_key="registered",
    )
    fused = fusion.fuse([sim0, sim1], transform_key="registered")
    out = fused.to_numpy()
    assert out.shape[0] == T
    for t in range(T):
        # the union grid may extend past the drifting tile; compare on the
        # region both the output and ground truth cover
        w = min(out.shape[2], full.shape[2] - drifts[t])
        np.testing.assert_allclose(
            out[t, :, :w],
            full[t, :, drifts[t] : drifts[t] + w]
            if out.shape[2] < full.shape[2]
            else full[t, :, :w],
            atol=1e-3,
            err_msg=f"timepoint {t} fused with wrong transform",
        )


@pytest.mark.parametrize("ndim", [2, 3])
def test_coarse_output_spacing_uses_pallas_tier(ndim, monkeypatch):
    """Non-unit (uniform) view->output scale runs through the Pallas tier
    (scaled banded-lerp matmuls; integer z scale in 3D) and matches the
    XLA tiers (reference fuses arbitrary output grids through its general
    resample path, transformation.py:15)."""
    from multiview_stitcher_tpu.fusion import _core

    rng = np.random.default_rng(21)
    if ndim == 2:
        shape, tr = (48, 64), {"y": 0.0, "x": 44.0}
        spacing = {"y": 2.0, "x": 2.0}
    else:
        shape, tr = (16, 32, 48), {"z": 0.0, "y": 0.0, "x": 32.0}
        spacing = {"z": 2.0, "y": 2.0, "x": 2.0}
    sims = [
        si_utils.get_sim_from_array(
            (rng.random(shape) * 900).astype(np.float32), translation={
                k: 0.0 for k in tr
            }
        ),
        si_utils.get_sim_from_array(
            (rng.random(shape) * 900).astype(np.float32), translation=tr
        ),
    ]
    called = {"pallas": 0}
    orig = _core._execute_fusion_plan_pallas

    def spy(*args, **kwargs):
        called["pallas"] += 1
        return orig(*args, **kwargs)

    monkeypatch.setattr(_core, "_execute_fusion_plan_pallas", spy)
    out = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_spacing=spacing,
    ).to_numpy()
    assert called["pallas"] == 1
    _core.clear_device_tile_cache()
    monkeypatch.setenv("MVS_TPU_PALLAS", "0")
    ref = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_spacing=spacing,
    ).to_numpy()
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=1e-2)


def test_3d_single_plane_fusion():
    """3D input with z extent 1 fuses onto a taller z output grid
    (reference test_fusion.py:990 — weight math must tolerate singleton
    axes)."""
    sim = si_utils.get_sim_from_array(
        np.ones((1, 10, 10), np.float32), dims=("z", "y", "x")
    )
    fused = fusion.fuse(
        [sim],
        output_shape={"z": 2, "y": 10, "x": 10},
        output_chunksize={"z": 1, "y": 10, "x": 10},
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
    )
    out = fused.to_numpy()
    assert out.shape == (2, 10, 10)
    np.testing.assert_allclose(out[0], 1.0, atol=1e-5)


def test_blending_widths_affect_result():
    """blending_widths changes the overlap blend (reference
    test_fusion.py:1011) — tiles carry DIFFERENT data so the blend profile
    is visible."""
    rng = np.random.default_rng(31)
    a = (rng.random((40, 60)) * 100).astype(np.float32)
    b = (rng.random((40, 60)) * 100).astype(np.float32)
    sims = lambda: [
        si_utils.get_sim_from_array(a.copy(), translation={"y": 0.0, "x": 0.0}),
        si_utils.get_sim_from_array(b.copy(), translation={"y": 0.0, "x": 40.0}),
    ]
    small = fusion.fuse(
        sims(), transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        blending_widths={"y": 0.001, "x": 0.001},
    ).to_numpy()
    large = fusion.fuse(
        sims(), transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        blending_widths={"y": 10.0, "x": 10.0},
    ).to_numpy()
    assert not np.allclose(small, large)
    # exclusive regions agree regardless of blending width
    np.testing.assert_allclose(small[:, :40], large[:, :40], atol=1e-3)


def test_large_shape_fusion_beyond_uint16_limit():
    """Output extents larger than the uint16 limit fuse correctly
    (reference test_fusion.py:1041)."""
    sims = [
        si_utils.get_sim_from_array(
            np.ones((2, 50000), np.float32),
            translation={"y": 0.0, "x": float(50000 * i)},
        )
        for i in range(2)
    ]
    fused = fusion.fuse(sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY)
    assert fused.shape[-1] == 100000
    out = fused.to_numpy()
    np.testing.assert_allclose(out[:, ::1000], 1.0, atol=1e-5)


def test_fuse_trim_overlap_false_keeps_chunk_halos():
    """trim_overlap=False assembles each chunk's EXTENDED region side by
    side (reference test_fusion.py:440: 10x10 input, chunk 5, overlap 1 ->
    14x14 with per-chunk halos kept; out-of-array halo pixels are 0)."""
    sim = si_utils.get_sim_from_array(
        np.ones((10, 10), np.float32), dims=("y", "x")
    )
    kw = dict(
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        fusion_func=fusion.max_fusion,
        output_chunksize={"y": 5, "x": 5},
        overlap_in_pixels=1,
    )
    trimmed = fusion.fuse([sim], **kw)
    untrimmed = fusion.fuse([sim], **kw, trim_overlap=False)
    assert trimmed.shape == (10, 10)
    assert untrimmed.shape == (14, 14)
    d = untrimmed.to_numpy()
    assert d[0, :].max() == 0 and d[:, 0].max() == 0  # outer halo
    assert d[1:-1, 1:-1].min() == 1  # array interior incl. shared halos
    # origin anchors the first halo pixel (one spacing before the grid)
    np.testing.assert_allclose(untrimmed.origin["y"], -1.0)


@pytest.mark.parametrize("ome_zarr", [False, True])
def test_fuse_trim_overlap_false_with_output_zarr_url(tmp_path, ome_zarr):
    """trim_overlap=False combines with the streaming zarr sink (reference
    fusion/_core.py:1068-1170 supports the combination): the stored array
    holds the per-chunk extended regions and reads back identical to the
    in-memory untrimmed result, origin anchored at the first halo pixel."""
    sim = si_utils.get_sim_from_array(
        np.arange(100, dtype=np.float32).reshape(10, 10), dims=("y", "x")
    )
    kw = dict(
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        fusion_func=fusion.max_fusion,
        output_chunksize={"y": 5, "x": 5},
        overlap_in_pixels=1,
        trim_overlap=False,
    )
    in_mem = fusion.fuse([sim], **kw)
    url = str(tmp_path / ("un.ome.zarr" if ome_zarr else "un.zarr"))
    streamed = fusion.fuse(
        [sim], **kw, output_zarr_url=url,
        zarr_options={"ome_zarr": ome_zarr},
    )
    assert streamed.shape == in_mem.shape == (14, 14)
    np.testing.assert_array_equal(
        np.asarray(streamed.data[...]), in_mem.to_numpy()
    )
    np.testing.assert_allclose(streamed.origin["y"], -1.0)


def test_fuse_trim_overlap_false_custom_func_host_tier():
    """The untrimmed layout also holds on the host (extension-API) tier."""
    sim = si_utils.get_sim_from_array(
        np.full((10, 10), 7.0, np.float32), dims=("y", "x")
    )

    def custom(transformed_views):
        return np.nanmax(np.asarray(transformed_views), axis=0)

    un = fusion.fuse(
        [sim], transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        fusion_func=custom, output_chunksize={"y": 5, "x": 5},
        overlap_in_pixels=1, trim_overlap=False,
    )
    assert un.shape == (14, 14)
    assert un.to_numpy()[1:-1, 1:-1].min() == 7


def test_fuse_rejects_mixed_sims_and_msims():
    sim = si_utils.get_sim_from_array(
        np.zeros((8, 8), np.uint16), dims=("y", "x")
    )
    msim = msi_utils.get_msim_from_sim(sim, scale_factors=[])
    with pytest.raises(ValueError, match="same kind"):
        fusion.fuse(
            [msim, sim], transform_key=si_utils.DEFAULT_TRANSFORM_KEY
        )


def test_fuse_grid_aligned_chunk_edge_tolerates_coordinate_roundoff():
    """Large origins make coordinate diffs noisier than the spacing; the
    output grid mapping must not drop or duplicate a pixel (reference
    test_fusion.py:533)."""
    origin = 861.5120670572916
    scale = 0.13810709635416665
    sim = si_utils.get_sim_from_array(
        np.ones((2, 4084), np.uint16), dims=("y", "x"),
        scale={"y": scale, "x": scale},
        translation={"y": 0.0, "x": origin},
    )
    isc = si_utils.get_spacing_from_sim(sim)["x"]
    op = {
        "origin": {"y": 0.0, "x": origin - 9 * isc},
        "spacing": {"y": isc, "x": isc},
        "shape": {"y": 2, "x": 4093},
    }
    fused = fusion.fuse(
        [sim], transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        fusion_func=fusion.max_fusion, interpolation_order=0,
        output_stack_properties=op, output_chunksize={"y": 2, "x": 4084},
    )
    expected = np.tile(
        np.concatenate(
            [np.zeros(9, np.uint16), np.ones(4084, np.uint16)]
        ),
        (2, 1),
    )
    np.testing.assert_array_equal(np.squeeze(fused.to_numpy()), expected)


def test_fuse_fractional_translations_output_grid():
    """Fractional (subpixel) stage translations: the union output grid
    stops at the last valid pixel center and every pixel is covered
    (reference test_fusion.py:756)."""
    a = 8.5
    sims = []
    for i, tr in enumerate(
        [{"y": 0, "x": 0}, {"y": a, "x": 0}, {"y": 0, "x": a},
         {"y": a, "x": a}]
    ):
        sims.append(
            si_utils.get_sim_from_array(
                np.full((2, 10, 10), i + 1, np.uint16),
                dims=("c", "y", "x"), translation=tr,
                c_coords=["DAPI", "GFP"],
            )
        )
    fused = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_chunksize={"y": 5, "x": 5},
    )
    assert fused.sizes["y"] == 18 and fused.sizes["x"] == 18
    d = fused.to_numpy()
    assert d.max() == 4 and d.min() > 0


def test_fuse_singleton_chunk_preserves_spacing():
    """A chunk seeing a single source pixel must keep the requested output
    spacing rather than any singleton-coordinate fallback (reference
    test_fusion.py:481)."""
    sim = si_utils.get_sim_from_array(
        np.ones((2, 20), np.uint16), dims=("y", "x"),
        scale={"y": 0.3, "x": 0.3}, translation={"y": 0.0, "x": 0.0},
    )
    op = {
        "origin": {"y": 0.0, "x": -2.7},
        "spacing": {"y": 0.3, "x": 0.3},
        "shape": {"y": 2, "x": 29},
    }
    fused = fusion.fuse(
        [sim], transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        fusion_func=fusion.max_fusion, interpolation_order=0,
        output_stack_properties=op, output_chunksize={"y": 2, "x": 10},
    )
    np.testing.assert_allclose(fused.spacing["x"], 0.3)
    expected = np.tile(
        np.concatenate([np.zeros(9, np.uint16), np.ones(20, np.uint16)]),
        (2, 1),
    )
    np.testing.assert_array_equal(np.squeeze(fused.to_numpy()), expected)


def test_fuse_sims_keyword_deprecated_and_both_rejected():
    """fuse(sims=) warns, fuse(images=, sims=) raises
    (reference fusion/_core.py:910-926)."""
    full, sims = _two_tile_sims(shape=(16, 24), overlap=8)
    with pytest.warns(DeprecationWarning, match="sims"):
        fused = fusion.fuse(
            sims=sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY
        )
    np.testing.assert_allclose(fused.to_numpy(), full, atol=1e-3)
    with pytest.raises(TypeError, match="both"):
        fusion.fuse(
            images=sims, sims=sims,
            transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        )
    with pytest.raises(TypeError, match="images"):
        fusion.fuse(transform_key=si_utils.DEFAULT_TRANSFORM_KEY)


def test_fuse_to_zarr_aliases_are_deprecated_stubs():
    """reference fusion/_core.py:2304-2331."""
    for alias in (fusion.fuse_to_zarr, fusion.fuse_to_multiscale_ome_zarr):
        with pytest.warns(DeprecationWarning):
            with pytest.raises(RuntimeError, match="deprecated"):
                alias()


def test_fuse_msims_to_zarr_uses_suitable_input_level(tmp_path):
    """Fusing msims straight to zarr at coarse output spacing reads the
    coarse input level, not scale0 (reference fusion/_core.py:957-980,
    test_fusion.py:709). Asserted behaviorally: the input pyramids'
    scale1 data is replaced with a sentinel constant, which must appear
    in the output."""
    _, sims = _two_tile_sims(shape=(32, 48), overlap=16)
    msims = []
    for s in sims:
        m = msi_utils.get_msim_from_sim(
            s, scale_factors=[{"y": 2, "x": 2}]
        )
        lvl1 = m.get_scale("scale1")
        sentinel = si_utils.get_sim_from_array(
            np.full(lvl1.shape, 7.0, np.float32),
            dims=lvl1.dims,
            scale=si_utils.get_spacing_from_sim(lvl1),
            translation=si_utils.get_origin_from_sim(lvl1),
        )
        msims.append(msi_utils.Msim(sims=[m.get_scale("scale0"), sentinel]))

    spacing0 = si_utils.get_spacing_from_sim(sims[0])
    out = fusion.fuse(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_spacing={d: 2 * v for d, v in spacing0.items()},
        output_zarr_url=str(tmp_path / "coarse.zarr"),
    )
    assert msi_utils.is_msim(out)
    vals = msi_utils.get_sim_from_msim(out, scale="scale0").to_numpy()
    interior = vals[1:-1, 1:-1]
    np.testing.assert_allclose(interior, 7.0, atol=1e-4)


def test_fuse_msims_to_ome_zarr_returns_msim(tmp_path):
    """msims + output_zarr_url + ome_zarr read back as a lazy msim
    (reference test_fusion.py:733)."""
    full, sims = _two_tile_sims(shape=(256, 300), overlap=40)
    msims = [msi_utils.get_msim_from_sim(s) for s in sims]
    out = fusion.fuse(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_zarr_url=str(tmp_path / "fused.ome.zarr"),
        zarr_options={"ome_zarr": True},
    )
    assert msi_utils.is_msim(out)
    s0 = msi_utils.get_sim_from_msim(out, scale="scale0")
    np.testing.assert_allclose(
        np.asarray(s0.to_numpy(), np.float32).squeeze(), full, atol=0.51
    )
    assert len(out.sims) >= 2  # pyramid written in the store


def test_fused_field_coverage():
    """Every ground-truth pixel of a 2x2 mosaic is covered and exact
    (identical overlapping data; reference test_fusion.py:899)."""
    rng = np.random.default_rng(3)
    full = rng.random((70, 90)).astype(np.float32) * 50
    tiles, offs = [], []
    for oy in (0, 34):
        for ox in (0, 44):
            tiles.append(full[oy : oy + 36, ox : ox + 46])
            offs.append((oy, ox))
    sims = [
        si_utils.get_sim_from_array(
            t, translation={"y": float(oy), "x": float(ox)}
        )
        for t, (oy, ox) in zip(tiles, offs)
    ]
    fused = fusion.fuse(sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY)
    out = fused.to_numpy()
    assert out.shape == full.shape
    np.testing.assert_allclose(out, full, atol=1e-3)


def test_fused_field_slice_matches_full_fusion():
    """Restricting output_stack_properties to a window reproduces that
    window of the full fusion (reference test_fusion.py:932)."""
    full, sims = _two_tile_sims(shape=(40, 60), overlap=20)
    tk = si_utils.DEFAULT_TRANSFORM_KEY
    whole = fusion.fuse(sims, transform_key=tk)
    props = {
        "origin": {"y": 10.0, "x": 30.0},
        "spacing": {"y": 1.0, "x": 1.0},
        "shape": {"y": 20, "x": 50},
    }
    window = fusion.fuse(
        sims, transform_key=tk, output_stack_properties=props
    )
    np.testing.assert_allclose(
        window.to_numpy(), whole.to_numpy()[10:30, 30:80], atol=1e-4
    )


@pytest.mark.parametrize(
    "chunksize", [16, {"y": 8, "x": 32}], ids=["int", "dict"]
)
def test_fusion_output_chunksizes_do_not_change_values(chunksize, tmp_path):
    """Chunk layout is an execution detail: values identical across
    chunksizes, and the zarr sink honors the requested grid (reference
    test_fusion.py:1076)."""
    import tensorstore as ts

    full, sims = _two_tile_sims(shape=(40, 60), overlap=20)
    tk = si_utils.DEFAULT_TRANSFORM_KEY
    ref = fusion.fuse(sims, transform_key=tk).to_numpy()
    fused = fusion.fuse(sims, transform_key=tk, output_chunksize=chunksize)
    np.testing.assert_allclose(fused.to_numpy(), ref, atol=1e-4)

    url = str(tmp_path / "chunked.zarr")
    fusion.fuse(
        sims, transform_key=tk, output_chunksize=chunksize,
        output_zarr_url=url,
    )
    arr = ts.open({
        "driver": "zarr", "kvstore": {"driver": "file", "path": url + "/0"}
    }).result()
    np.testing.assert_allclose(np.asarray(arr.read().result()), ref, atol=1e-4)
    expected = (
        (16, 16) if chunksize == 16 else (8, 32)
    )
    assert tuple(arr.chunk_layout.read_chunk.shape) == expected


def test_fuse_concat_c_zarr_backed_sims(tmp_path):
    """Virtually concatenated (along c) zarr-backed tiles fuse per channel
    like the individually fused channels (reference test_fusion.py:1269)."""
    from multiview_stitcher_tpu.io import ngff_utils

    tk = si_utils.DEFAULT_TRANSFORM_KEY
    per_channel = []
    combined_tiles = []
    rng = np.random.default_rng(5)
    fulls = [rng.random((30, 44)).astype(np.float32) for _ in range(2)]
    for tile_idx, xoff in enumerate((0, 22)):
        chans = []
        for ci, full in enumerate(fulls):
            t = full[:, xoff : xoff + 22]
            s = si_utils.get_sim_from_array(
                t, dims=("y", "x"), translation={"y": 0.0, "x": float(xoff)}
            )
            chans.append(
                ngff_utils.write_sim_to_ome_zarr(
                    s,
                    str(tmp_path / f"t{tile_idx}c{ci}.ome.zarr"),
                    overwrite=True,
                )
            )
        combined_tiles.append(si_utils.stack(chans, "c"))
    fused = fusion.fuse(combined_tiles, transform_key=tk)
    out = fused.to_numpy()
    assert out.shape[0] == 2
    for ci, full in enumerate(fulls):
        np.testing.assert_allclose(out[ci], full, atol=0.51)


def test_fuse_fractional_translations_extent_and_coverage():
    """Fractional (subpixel) translations: the union output grid must not
    grow an empty border row (last tile pixel center 17.5 -> output stops
    at center 17) and every output pixel is covered (reference
    test_fusion.py:756; there the assertion is that the fast translation
    planner handles fractional offsets — this build's single overlap path
    is already dense corner math, so the behavioral contract is the
    extent/coverage)."""
    a = 8.5
    tile_translations = [
        {"y": 0, "x": 0}, {"y": a, "x": 0}, {"y": 0, "x": a},
        {"y": a, "x": a},
    ]
    sims = [
        si_utils.get_sim_from_array(
            np.full((2, 10, 10), i + 1, np.uint16),
            dims=("c", "y", "x"),
            translation=tr,
            c_coords=["DAPI", "GFP"],
        )
        for i, tr in enumerate(tile_translations)
    ]
    fused = fusion.fuse(
        sims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_chunksize={"y": 5, "x": 5},
    )
    data = fused.to_numpy()
    assert data.shape == (2, 18, 18)
    assert data.max() == 4
    assert data.min() > 0


def test_fuse_concat_t_zarr_backed_sims(tmp_path):
    """Tiles virtually concatenated along t fuse per timepoint like the
    individually fused timepoints (reference test_fusion.py:1301; NGFF t
    coords are frame indices, so each timepoint store is re-labeled
    after reading, like the reference's zarr-backed fixtures)."""
    from multiview_stitcher_tpu.io import ngff_utils

    tk = si_utils.DEFAULT_TRANSFORM_KEY
    rng = np.random.default_rng(11)
    fulls = [rng.random((26, 40)).astype(np.float32) for _ in range(2)]
    tiles = []
    for tile_idx, xoff in enumerate((0, 20)):
        per_t = []
        for ti, full in enumerate(fulls):
            s = si_utils.get_sim_from_array(
                full[:, xoff : xoff + 20][None],
                dims=("t", "y", "x"),
                translation={"y": 0.0, "x": float(xoff)},
            )
            back = ngff_utils.write_sim_to_ome_zarr(
                s,
                str(tmp_path / f"t{tile_idx}tp{ti}.ome.zarr"),
                overwrite=True,
            )
            back.coords["t"] = np.array([ti])
            per_t.append(back)
        combined = si_utils.concat(per_t, "t")
        assert list(np.asarray(combined.coords["t"])) == [0, 1]
        tiles.append(combined)
    fused = fusion.fuse(tiles, transform_key=tk)
    out = np.asarray(fused.to_numpy(), np.float32)
    assert out.shape[0] == 2
    for ti, full in enumerate(fulls):
        np.testing.assert_allclose(out[ti], full, atol=0.51)


def test_fuse_rejects_duplicate_nonspatial_coords(tmp_path):
    """Duplicate t coords would silently fuse the first timepoint into
    every duplicate slot; fuse() raises instead."""
    sims = [
        si_utils.get_sim_from_array(
            np.zeros((2, 8, 8), np.float32), dims=("t", "y", "x"),
            t_coords=[0, 0],
        )
    ]
    with pytest.raises(ValueError, match="duplicate 't'"):
        fusion.fuse(sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY)


def test_materialize_tiles_retries_transient_lazy_read_failures():
    """A lazy tile read that fails transiently (HTTP zarr disconnect class
    of errors) is retried and the fuse input still materializes; a
    permanently failing read raises after exhausting retries (reference
    test_fusion.py:576 retries server disconnects during zarr-backed
    materialization)."""
    from multiview_stitcher_tpu.fusion import _core

    class FlakyLazy:
        """Duck-typed lazy array: shape/dtype + windowed __getitem__."""

        def __init__(self, arr, fail_times):
            self._arr = arr
            self.shape = arr.shape
            self.dtype = arr.dtype
            self.fails_left = fail_times

        def __getitem__(self, idx):
            if self.fails_left > 0:
                self.fails_left -= 1
                raise ConnectionError("server disconnected")
            return self._arr[idx]

    rng = np.random.default_rng(3)
    tiles = [rng.random((6, 6)).astype(np.float32) for _ in range(3)]
    sims = [
        si_utils.get_sim_from_array(FlakyLazy(t, fail_times=i), dims=["y", "x"])
        for i, t in enumerate(tiles)  # 0, 1, 2 transient failures
    ]
    out = _core._materialize_tiles(sims)
    np.testing.assert_array_equal(out, np.stack(tiles))

    dead = si_utils.get_sim_from_array(
        FlakyLazy(tiles[0], fail_times=99), dims=["y", "x"]
    )
    with pytest.raises(ConnectionError):
        _core._materialize_tiles([dead])
