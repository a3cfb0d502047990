import numpy as np
import pytest

from multiview_stitcher_tpu import msi_utils, param_utils, si_utils


def test_get_sim_from_array_defaults():
    arr = np.random.random((10, 20))
    sim = si_utils.get_sim_from_array(arr)
    assert sim.dims == ("y", "x")
    assert si_utils.get_ndim_from_sim(sim) == 2
    np.testing.assert_allclose(
        si_utils.get_spacing_from_sim(sim, asarray=True), [1, 1]
    )
    assert si_utils.DEFAULT_TRANSFORM_KEY in sim.transforms


def test_sim_metadata_and_coords():
    arr = np.zeros((2, 3, 5, 6))
    sim = si_utils.get_sim_from_array(
        arr,
        dims=("t", "c", "y", "x"),
        scale={"y": 0.5, "x": 0.25},
        translation={"y": 10.0, "x": -5.0},
        c_coords=["DAPI", "GFP", "RFP"],
    )
    assert sim.spatial_dims == ["y", "x"]
    assert sim.nsdims == ["t", "c"]
    np.testing.assert_allclose(sim.spatial_coords("y"), 10 + 0.5 * np.arange(5))
    props = si_utils.get_stack_properties_from_sim(sim)
    assert props["shape"] == {"y": 5, "x": 6}
    assert props["origin"] == {"y": 10.0, "x": -5.0}


def test_isel_spatial_slice_shifts_origin():
    arr = np.arange(100).reshape(10, 10).astype(float)
    sim = si_utils.get_sim_from_array(
        arr, scale={"y": 2.0, "x": 1.0}, translation={"y": 1.0, "x": 0.0}
    )
    sub = sim.isel({"y": slice(2, 6), "x": slice(3, 8)})
    assert sub.shape == (4, 5)
    assert sub.origin["y"] == 1.0 + 2 * 2.0
    assert sub.origin["x"] == 3.0
    np.testing.assert_array_equal(sub.to_numpy(), arr[2:6, 3:8])


def test_sel_coords_channel():
    arr = np.random.random((2, 4, 4))
    sim = si_utils.get_sim_from_array(
        arr, dims=("c", "y", "x"), c_coords=["a", "b"],
        scale={"y": 1, "x": 1}, translation={"y": 0, "x": 0},
    )
    sub = si_utils.sim_sel_coords(sim, {"c": "b"})
    assert sub.dims == ("y", "x")
    np.testing.assert_array_equal(sub.to_numpy(), arr[1])


def test_set_and_get_affine():
    sim = si_utils.get_sim_from_array(np.zeros((4, 4)))
    aff = param_utils.affine_from_translation([3.0, 4.0])
    si_utils.set_sim_affine(sim, aff, transform_key="reg")
    out = si_utils.get_affine_from_sim(sim, "reg")
    np.testing.assert_allclose(out.squeeze(), aff)


def test_center_of_sim_with_transform():
    sim = si_utils.get_sim_from_array(
        np.zeros((5, 5)), scale={"y": 1, "x": 1}, translation={"y": 0, "x": 0},
        affine=param_utils.affine_from_translation([10, 0]),
    )
    center = si_utils.get_center_of_sim(sim, transform_key=si_utils.DEFAULT_TRANSFORM_KEY)
    np.testing.assert_allclose(center, [12, 2])


def test_ensure_time_dim_broadcasts_transforms():
    sim = si_utils.get_sim_from_array(np.zeros((4, 4)))
    simt = si_utils.ensure_time_dim(sim)
    assert simt.dims == ("t", "y", "x")
    xaff = simt.transforms[si_utils.DEFAULT_TRANSFORM_KEY]
    assert xaff.has_t and xaff.data.shape == (1, 3, 3)


def test_concat_channels():
    sims = [
        si_utils.get_sim_from_array(np.full((3, 3), i, dtype=float))
        for i in range(3)
    ]
    stacked = si_utils.stack(sims, "c")
    assert stacked.dims == ("c", "y", "x")
    assert stacked.shape == (3, 3, 3)
    np.testing.assert_allclose(stacked.to_numpy()[2], 2)


def test_extend_stack_props():
    props = {"shape": {"y": 10}, "spacing": {"y": 0.5}, "origin": {"y": 5.0}}
    out = si_utils.extend_stack_props(props, 1.0)
    assert out["origin"]["y"] == 4.0
    assert out["shape"]["y"] == 14


class TestMsi:
    def test_pyramid_levels(self):
        arr = np.random.random((512, 300))
        sim = si_utils.get_sim_from_array(arr)
        msim = msi_utils.get_msim_from_sim(sim)
        assert len(msim.sims) >= 2
        s1 = msim.get_scale("scale1")
        assert s1.shape == (256, 150)
        assert s1.spacing["y"] == 2.0
        # pixel-center origin shift for 2x binning
        assert s1.origin["y"] == 0.5

    def test_coarsen_mean_matches_block_mean(self):
        arr = np.arange(16, dtype=float).reshape(4, 4)
        out = msi_utils._coarsen_mean(arr, [2, 2])
        np.testing.assert_allclose(
            out, [[2.5, 4.5], [10.5, 12.5]]
        )

    def test_coarsen_trim(self):
        arr = np.ones((5, 7))
        out = msi_utils._coarsen_mean(arr, [2, 2])
        assert out.shape == (2, 3)

    def test_calc_resolution_levels(self):
        shapes, rel, absf = msi_utils.calc_resolution_levels(
            {"y": 1000, "x": 1000}, min_shape=100
        )
        assert shapes[0] == {"y": 1000, "x": 1000}
        assert shapes[-1]["y"] >= 100
        assert absf[-1]["y"] in (4, 8)

    def test_res_level_from_spacing(self):
        sim = si_utils.get_sim_from_array(np.zeros((800, 800)))
        msim = msi_utils.get_msim_from_sim(sim)
        key = msi_utils.get_res_level_from_spacing(msim, {"y": 2.0, "x": 2.0})
        assert key == "scale1"
        key0 = msi_utils.get_res_level_from_spacing(msim, {"y": 1.0, "x": 1.0})
        assert key0 == "scale0"

    def test_transform_roundtrip_through_msim(self):
        sim = si_utils.get_sim_from_array(np.zeros((256, 256)))
        msim = msi_utils.get_msim_from_sim(sim)
        aff = param_utils.affine_from_translation([1.0, 2.0])
        msi_utils.set_affine_transform(msim, aff, transform_key="reg")
        out = msi_utils.get_sim_from_msim(msim, scale="scale0")
        np.testing.assert_allclose(out.transforms["reg"].squeeze(), aff)


def test_lazy_concat_stays_lazy(tmp_path):
    """Concatenating zarr-backed sims along c keeps them lazily backed."""
    from multiview_stitcher_tpu.io import ngff_utils

    arrs = []
    sims = []
    for i in range(2):
        data = np.random.randint(0, 100, (32, 32), dtype=np.uint16)
        s = si_utils.get_sim_from_array(data)
        lazy = ngff_utils.write_sim_to_ome_zarr(
            s, str(tmp_path / f"t{i}.ome.zarr"), overwrite=True
        )
        arrs.append(data)
        sims.append(lazy)
    combined = si_utils.stack(sims, "c")
    assert not isinstance(combined.data, np.ndarray)
    assert combined.sizes["c"] == 2
    np.testing.assert_array_equal(
        combined.to_numpy(), np.stack(arrs)
    )
    # windowed read stays windowed
    np.testing.assert_array_equal(
        np.asarray(combined.data[1, 4:8, 2:6]), arrs[1][4:8, 2:6]
    )


def test_point_set_spatial_selection_filters_points():
    """World-coordinate spatial slices select data AND filter attached
    point sets to the window (reference test_spatial_image_utils.py:525)."""
    sim = si_utils.get_sim_from_array(
        np.zeros((5, 5)), dims=("y", "x"),
        scale={"y": 1.0, "x": 2.0}, translation={"y": 10.0, "x": 20.0},
    )
    pts = np.array([[10.0, 20.0], [12.0, 24.0], [14.0, 28.0]])
    si_utils.set_point_set(sim, pts)
    sel = si_utils.sim_sel_coords(
        sim, {"y": slice(10.0, 12.0), "x": slice(20.0, 24.0)}
    )
    assert sel.sizes["y"] == 3 and sel.sizes["x"] == 3
    np.testing.assert_allclose(sel.origin["y"], 10.0)
    got = si_utils.get_point_set(sel)
    np.testing.assert_allclose(got, pts[:2])
    # original sim's point set untouched
    np.testing.assert_allclose(si_utils.get_point_set(sim), pts)


def test_max_project_sim():
    rng = np.random.default_rng(0)
    vol = rng.random((4, 6, 8)).astype(np.float32)
    sim = si_utils.get_sim_from_array(
        vol, dims=("z", "y", "x"), scale={"z": 2.0, "y": 1.0, "x": 1.0},
        translation={"z": 1.0, "y": 0.0, "x": 0.0},
    )
    si_utils.set_sim_affine(sim, np.eye(4), transform_key="affine")
    proj = si_utils.max_project_sim(sim, dim="z")
    assert tuple(proj.dims) == ("y", "x")
    np.testing.assert_allclose(proj.to_numpy(), vol.max(axis=0))
    # the projected transform drops the z row/col
    p = np.asarray(
        si_utils.get_affine_from_sim(proj, "affine").squeeze()
    )
    assert p.shape == (3, 3)


def test_get_extent_from_sim():
    sim = si_utils.get_sim_from_array(
        np.zeros((5, 11)), dims=("y", "x"),
        scale={"y": 2.0, "x": 0.5}, translation={"y": 1.0, "x": -1.0},
    )
    # reference semantics: span between first and last pixel center
    ext = si_utils.get_extent_from_sim(sim)
    np.testing.assert_allclose(ext["y"], 4 * 2.0)
    np.testing.assert_allclose(ext["x"], 10 * 0.5)


def test_concat_unions_transform_keys():
    """A transform key carried by only one input survives concat in either
    order (reference test_spatial_image_utils.py:373 — regression: keys
    unique to a later sim were silently dropped)."""
    from multiview_stitcher_tpu import param_utils

    def make(c):
        s = si_utils.get_sim_from_array(
            np.full((1, 8, 8), 10 * (c + 1), np.uint16),
            dims=("c", "y", "x"),
            scale={"y": 1.0, "x": 1.0},
            translation={"y": 0.0, "x": 0.0},
            c_coords=[c],
        )
        return s

    s0, s1 = make(0), make(1)
    si_utils.set_sim_affine(
        s1, param_utils.identity_transform(2),
        transform_key="affine_registered",
    )
    for sims in ([s0, s1], [s1, s0]):
        out = si_utils.concat(sims, dim="c")
        assert set(out.transforms) == {
            si_utils.DEFAULT_TRANSFORM_KEY, "affine_registered",
        }
        assert out.shape[out.dim_index("c")] == 2


def test_stack_rejects_existing_dim():
    """Stacking along a dim the inputs already have raises with a pointer
    to concat (reference test_spatial_image_utils.py:466)."""
    s = si_utils.get_sim_from_array(
        np.zeros((1, 4, 4), np.float32), dims=("c", "y", "x")
    )
    with pytest.raises(ValueError, match="concat"):
        si_utils.stack([s, s], "c")


def test_point_set_selection_preserves_nonspatial_dims():
    """Spatial world-window selection filters point sets but non-spatial
    selection leaves them untouched (reference
    test_spatial_image_utils.py:559/:592)."""
    s = si_utils.get_sim_from_array(
        np.zeros((2, 10, 10), np.float32),
        dims=("c", "y", "x"),
        c_coords=["a", "b"],
    )
    pts = np.array([[1.0, 1.0], [8.0, 8.0]])
    si_utils.set_point_set(s, pts, points_key="beads")

    chan = si_utils.sim_sel_coords(s, {"c": "a"})
    np.testing.assert_array_equal(
        si_utils.get_point_set(chan, "beads"), pts
    )


def test_serialize_after_channel_selection_roundtrip(tmp_path):
    """Task-payload serialization survives coord selection on a zarr-backed
    sim (reference test_spatial_image_utils.py:150 dropped-dim variant)."""
    import numpy as np

    from multiview_stitcher_tpu import sample_data, si_utils
    from multiview_stitcher_tpu.io import ngff_utils

    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_t=1, N_c=2, tile_size=16, tiles_x=1, tiles_y=1,
        overlap=4, zoom=2, dtype=np.uint16,
    )
    zsim = ngff_utils.write_sim_to_ome_zarr(
        sims[0], str(tmp_path / "v.ome.zarr")
    )
    c1 = np.asarray(zsim.coords["c"])[1]
    sel = si_utils.sim_sel_coords(zsim, {"c": c1})
    payload = si_utils.serialize_zarr_backed_sim(sel)
    back = si_utils.deserialize_zarr_backed_sim(payload)
    assert back.dims == sel.dims
    np.testing.assert_array_equal(
        np.asarray(back.data), np.asarray(sel.data)
    )
    # selected channel, not the first one
    np.testing.assert_array_equal(
        np.asarray(back.data).squeeze(),
        np.asarray(zsim.data)[1].squeeze(),
    )


def test_deserialized_sim_region_reads_match(tmp_path):
    """Windows read through a deserialized payload match the source
    (reference test_spatial_image_utils.py:228 reconstruct_slice)."""
    import numpy as np

    from multiview_stitcher_tpu import si_utils
    from multiview_stitcher_tpu.io import ngff_utils

    data = np.arange(32 * 24, dtype=np.uint16).reshape(32, 24)
    sim = si_utils.get_sim_from_array(data, dims=["y", "x"])
    zsim = ngff_utils.write_sim_to_ome_zarr(
        sim, str(tmp_path / "r.ome.zarr")
    )
    back = si_utils.deserialize_zarr_backed_sim(
        si_utils.serialize_zarr_backed_sim(zsim)
    )
    lead = (0,) * (len(back.dims) - 2)
    window = back.data[lead + (slice(5, 20), slice(3, 17))]
    np.testing.assert_array_equal(np.asarray(window), data[5:20, 3:17])


def test_get_sim_from_array_keeps_lazy_arrays_lazy(tmp_path):
    import numpy as np

    from multiview_stitcher_tpu import si_utils
    from multiview_stitcher_tpu.io import ngff_utils, zarr_backend

    sim = si_utils.get_sim_from_array(
        np.zeros((8, 8), np.uint16), dims=["y", "x"]
    )
    ngff_utils.write_sim_to_ome_zarr(sim, str(tmp_path / "l.ome.zarr"))
    lazy = zarr_backend.open_zarr_array(str(tmp_path / "l.ome.zarr/0"))
    wrapped = si_utils.get_sim_from_array(
        lazy, dims=["y", "x"][-lazy.ndim:] if lazy.ndim <= 2 else
        ["t", "c", "y", "x"][-lazy.ndim:]
    )
    assert type(wrapped.data) is type(lazy)  # not materialized
