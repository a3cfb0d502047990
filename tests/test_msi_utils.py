import numpy as np
import pytest

from multiview_stitcher_tpu import msi_utils, si_utils

def test_msim_map_blocks_eager_and_lazy(tmp_path):
    from multiview_stitcher_tpu import zarr_utils
    from multiview_stitcher_tpu.io import zarr_backend

    data = np.arange(64, dtype=np.uint16).reshape(8, 8)
    sim = si_utils.get_sim_from_array(data, translation={"y": 2.0, "x": 3.0})
    msim = msi_utils.get_msim_from_sim(sim, scale_factors=[{"y": 2, "x": 2}])

    mapped = msi_utils.msim_map_blocks(msim, lambda b: b * 2.0)
    assert len(mapped.sims) == 2
    np.testing.assert_array_equal(
        mapped.get_scale("scale0").to_numpy(), data * 2.0
    )
    # transforms preserved
    assert set(mapped.transforms) == set(msim.transforms)

    # lazy: back scale0 with a zarr array, map, check laziness + values
    arr = zarr_backend.create_zarr_array(
        str(tmp_path / "a.zarr"), shape=(8, 8), dtype="uint16",
        chunks=(4, 4),
    )
    arr[...] = data
    lazy_sim = si_utils.get_sim_from_array(arr)
    lazy_msim = msi_utils.get_msim_from_sim(lazy_sim, scale_factors=[])
    mapped_lazy = msi_utils.msim_map_blocks(
        lazy_msim, lambda b: b.astype(np.float32) + 1
    )
    assert isinstance(mapped_lazy.sims[0].data, zarr_utils.VirtualMap)
    assert mapped_lazy.sims[0].data.dtype == np.float32
    np.testing.assert_array_equal(
        np.asarray(mapped_lazy.sims[0].data[2:5, 1:7]),
        data[2:5, 1:7].astype(np.float32) + 1,
    )

    # shape-changing funcs are rejected eagerly
    with pytest.raises(ValueError):
        msi_utils.sim_map_blocks(sim, lambda b: b[::2])


def test_auto_scale_factors_and_downsampling():
    """Automatic pyramid levels coarsen by mean with origin correction
    (reference msi_utils.get_multiscale_spatial_image semantics)."""
    data = np.arange(256 * 256, dtype=np.float32).reshape(256, 256)
    sim = si_utils.get_sim_from_array(
        data, scale={"y": 0.5, "x": 0.5}, translation={"y": 1.0, "x": 2.0}
    )
    msim = msi_utils.get_msim_from_sim(sim)
    keys = msi_utils.get_sorted_scale_keys(msim)
    assert keys[0] == "scale0"
    assert len(keys) >= 2
    s1 = msim.get_scale(keys[1])
    assert s1.sizes["y"] == 128 and s1.sizes["x"] == 128
    # coarsen-mean: 2x2 block means
    np.testing.assert_allclose(
        s1.to_numpy(),
        data.reshape(128, 2, 128, 2).mean(axis=(1, 3)),
        rtol=1e-6,
    )
    # below min_shape no further level is produced (reference min_shape=100)
    small = msi_utils.get_msim_from_sim(
        si_utils.get_sim_from_array(np.zeros((64, 64), np.float32))
    )
    assert msi_utils.get_sorted_scale_keys(small) == ["scale0"]
    # pixel-center origin shifts by half the spacing increase
    assert s1.spacing["y"] == pytest.approx(1.0)
    assert s1.origin["y"] == pytest.approx(1.0 + 0.25)


def test_multiscale_transform_propagation():
    """Setting an affine on an msim reaches every scale and survives
    selection by non-spatial coords."""
    data = np.zeros((2, 16, 16), np.float32)
    sim = si_utils.get_sim_from_array(
        data, dims=("c", "y", "x"), c_coords=["a", "b"]
    )
    msim = msi_utils.get_msim_from_sim(
        sim, scale_factors=[{"y": 2, "x": 2}]
    )
    aff = np.array([[1.0, 0, 5.0], [0, 1.0, -3.0], [0, 0, 1.0]])
    msi_utils.set_affine_transform(msim, aff, transform_key="registered")
    for key in msi_utils.get_sorted_scale_keys(msim):
        got = np.asarray(
            msi_utils.get_transform_from_msim(msim, "registered").squeeze()
        )
        np.testing.assert_allclose(got, aff)
    sel = msi_utils.multiscale_sel_coords(msim, {"c": "b"})
    np.testing.assert_allclose(
        np.asarray(
            msi_utils.get_transform_from_msim(sel, "registered").squeeze()
        ),
        aff,
    )


def test_get_msim_from_sims_groups_scales():
    """A list of same-image-different-resolution sims becomes one msim
    sorted fine->coarse."""
    fine = si_utils.get_sim_from_array(
        np.zeros((32, 32), np.float32), scale={"y": 1.0, "x": 1.0}
    )
    coarse = si_utils.get_sim_from_array(
        np.zeros((16, 16), np.float32), scale={"y": 2.0, "x": 2.0}
    )
    msim = msi_utils.get_msim_from_sims([coarse, fine])
    keys = msi_utils.get_sorted_scale_keys(msim)
    assert msim.get_scale(keys[0]).sizes["y"] == 32
    assert msim.get_scale(keys[1]).sizes["y"] == 16


def test_stack_msims_and_scale_selection():
    """msi_utils.stack adds a new leading dim per scale (reference
    msi_utils.py:869); get_first_scale_above_target_spacing picks the
    registration level (reference msi_utils.py:642)."""
    msims = []
    for i in range(3):
        sim = si_utils.get_sim_from_array(
            np.full((128, 128), float(i), np.float32),
            scale={"y": 0.5, "x": 0.5},
        )
        msims.append(
            msi_utils.get_msim_from_sim(
                sim, scale_factors=[{"y": 2, "x": 2}]
            )
        )
    stacked = msi_utils.stack(msims, dim="t")
    s0 = stacked.get_scale("scale0")
    assert s0.sizes["t"] == 3 and s0.sizes["y"] == 128
    np.testing.assert_allclose(
        s0.to_numpy()[2], np.full((128, 128), 2.0)
    )
    s1 = stacked.get_scale("scale1")
    assert s1.sizes["t"] == 3 and s1.sizes["y"] == 64

    # spacing/levels: 0.5 (scale0), 1.0 (scale1)
    assert msi_utils.get_first_scale_above_target_spacing(
        msims[0], 0.75
    ) == "scale1"
    # nothing above 10 -> coarsest
    assert msi_utils.get_first_scale_above_target_spacing(
        msims[0], 10.0
    ) == "scale1"
    # everything above 0.1 -> finest breaks immediately
    assert msi_utils.get_first_scale_above_target_spacing(
        msims[0], 0.1
    ) == "scale0"


def test_get_store_decorator_caches_reader(tmp_path):
    """The decorated reader runs once; later calls reload the zarr store
    lazily (reference msi_utils.py:82)."""
    calls = {"n": 0}
    store = tmp_path / "cache.ome.zarr"

    @msi_utils.get_store_decorator(store)
    def expensive_reader():
        calls["n"] += 1
        return msi_utils.get_msim_from_sim(
            si_utils.get_sim_from_array(
                np.arange(64, dtype=np.uint16).reshape(8, 8)
            ),
            scale_factors=[],
        )

    m1 = expensive_reader()
    m2 = expensive_reader()
    assert calls["n"] == 1
    np.testing.assert_array_equal(
        m2.get_scale("scale0").to_numpy(),
        np.arange(64, dtype=np.uint16).reshape(8, 8),
    )
    # None store path -> identity decorator
    @msi_utils.get_store_decorator(None)
    def plain():
        calls["n"] += 1
        return 42

    assert plain() == 42 and calls["n"] == 2


def test_point_set_roundtrip():
    """Bead/marker point sets attach to an msim and persist selection."""
    sim = si_utils.get_sim_from_array(np.zeros((8, 8), np.float32))
    msim = msi_utils.get_msim_from_sim(sim, scale_factors=[])
    pts = np.array([[1.0, 2.0], [3.0, 4.0]])
    msi_utils.set_point_set(msim, pts, points_key="beads")
    got = msi_utils.get_point_set(msim, points_key="beads")
    np.testing.assert_allclose(np.asarray(got), pts)


@pytest.mark.parametrize("ndim", [2, 3])
@pytest.mark.parametrize("origin0", [0.0, 13.7])
def test_multiscale_origins_follow_pixel_centers(ndim, origin0):
    """Level k's origin is origin0 + (abs_factor-1)/2 * spacing0 per dim:
    the coarsened pixel's center is the mean of its sources' centers
    (reference test_msi_utils.py:128)."""
    dims = ("z", "y", "x")[-ndim:]
    shape = (32,) * ndim
    sim = si_utils.get_sim_from_array(
        np.zeros(shape, np.float32),
        dims=dims,
        scale={d: 0.5 for d in dims},
        translation={d: origin0 for d in dims},
    )
    msim = msi_utils.get_msim_from_sim(
        sim, scale_factors=[{d: 2 for d in dims}, {d: 2 for d in dims}]
    )
    for k, abs_factor in enumerate((1, 2, 4)):
        lvl = msim.get_scale(f"scale{k}")
        spacing = si_utils.get_spacing_from_sim(lvl)
        origin = si_utils.get_origin_from_sim(lvl)
        for d in dims:
            assert spacing[d] == pytest.approx(0.5 * abs_factor)
            assert origin[d] == pytest.approx(
                origin0 + (abs_factor - 1) / 2 * 0.5
            )


def test_res_level_selection_by_spacing_and_binning():
    """Level pickers choose the coarsest level still fine enough
    (reference msi_utils.py:655/:688)."""
    sim = si_utils.get_sim_from_array(
        np.zeros((64, 64), np.float32), dims=("y", "x"),
        scale={"y": 1.0, "x": 1.0},
    )
    msim = msi_utils.get_msim_from_sim(
        sim, scale_factors=[{"y": 2, "x": 2}, {"y": 2, "x": 2}]
    )
    pick = msi_utils.get_res_level_from_spacing
    assert pick(msim, {"y": 1.0, "x": 1.0}) == "scale0"
    assert pick(msim, {"y": 2.0, "x": 2.0}) == "scale1"
    assert pick(msim, {"y": 3.0, "x": 3.0}) == "scale1"
    assert pick(msim, {"y": 100.0, "x": 100.0}) == "scale2"
    # requested spacing finer than scale0: stay at scale0
    assert pick(msim, {"y": 0.1, "x": 0.1}) == "scale0"

    pickb = msi_utils.get_res_level_from_binning_factors
    assert pickb(msim, {"y": 1, "x": 1}) == "scale0"
    assert pickb(msim, {"y": 2, "x": 2}) == "scale1"
    assert pickb(msim, {"y": 4, "x": 2}) == "scale1"  # limited by x
    assert pickb(msim, {"y": 4, "x": 4}) == "scale2"


def test_update_msim_transforms_zarr_roundtrip(tmp_path):
    """Transform keys persist into an existing OME-Zarr store's attrs and
    restore on read (reference msi_utils.update_msim_transforms_zarr:247)."""
    from multiview_stitcher_tpu import param_utils
    from multiview_stitcher_tpu.io import ngff_utils

    sim = si_utils.get_sim_from_array(
        np.arange(64, dtype=np.float32).reshape(8, 8), dims=("y", "x")
    )
    url = str(tmp_path / "im.ome.zarr")
    ngff_utils.write_sim_to_ome_zarr(sim, url, overwrite=True)

    m = np.eye(3)
    m[:2, -1] = (4.0, -2.0)
    ngff_utils.update_msim_transforms_zarr(
        {"registered": param_utils.affine_to_xaffine(m)}, url
    )
    back = ngff_utils.read_msim_from_ome_zarr(url)
    assert "registered" in back.transforms
    np.testing.assert_allclose(
        np.asarray(back.transforms["registered"].squeeze()), m
    )


def test_get_msim_from_sims_rejects_mismatched_dims():
    import numpy as np
    import pytest

    from multiview_stitcher_tpu import msi_utils, si_utils

    a = si_utils.get_sim_from_array(np.zeros((4, 4), np.uint16), dims=["y", "x"])
    b = si_utils.get_sim_from_array(
        np.zeros((1, 4, 4), np.uint16), dims=["z", "y", "x"]
    )
    with pytest.raises(ValueError, match="same dimensions"):
        msi_utils.get_msim_from_sims([a, b])


def test_multiscale_sel_coords_on_concat_result():
    """Selection works through a per-scale concat (reference
    test_msi_utils.py:366)."""
    import numpy as np

    from multiview_stitcher_tpu import msi_utils, si_utils

    def make(cval):
        sim = si_utils.get_sim_from_array(
            np.full((1, 8, 8), cval, np.uint16),
            dims=["c", "y", "x"],
            c_coords=[f"ch{cval}"],
        )
        return msi_utils.get_msim_from_sim(
            sim, scale_factors=[{"y": 2, "x": 2}]
        )

    combined = msi_utils.concat([make(1), make(2)], dim="c")
    sel = msi_utils.multiscale_sel_coords(combined, {"c": "ch2"})
    for sk in sel.scale_keys:
        vals = np.unique(np.asarray(sel.get_scale(sk).data))
        assert list(vals) == [2]
