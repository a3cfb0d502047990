"""Single-upload stitch pipeline (VERDICT r4 item 2).

register(device_tiles=True) slices registration crops ON DEVICE from the
same resident tile stack fuse() uses — one tile upload serves both phases.
These tests pin (1) bit-parity of device-sliced crops vs host crops,
(2) identical registration results through both paths, (3) that the
pipeline really uploads tiles once (spy on the stack builder), and
(4) fallbacks (float dtype, t dim, binning) silently take the host path.
"""

import warnings

import numpy as np
import pytest

from multiview_stitcher_tpu import (
    msi_utils,
    registration,
    sample_data,
    si_utils,
    stitch,
)
from multiview_stitcher_tpu.fusion import _core as fusion_core


@pytest.fixture(autouse=True)
def _fresh_caches():
    fusion_core.clear_device_tile_cache()
    yield
    fusion_core.clear_device_tile_cache()


def _grid_sims(ndim=2, n=2, tile=32, overlap=8, dtype=np.uint16, seed=0):
    sims = sample_data.generate_tiled_dataset(
        ndim=ndim, N_c=1, N_t=1, tile_size=tile,
        tiles_x=n, tiles_y=n, tiles_z=1,
        overlap=overlap, zoom=2, shift_scale=1.5, drift_scale=0.0,
        dtype=dtype,
    )
    return [
        si_utils.sim_sel_coords(s, {"c": s.coords["c"][0], "t": 0})
        for s in sims
    ]


class TestCropsFromResident:
    @pytest.mark.parametrize("ndim", [2, 3])
    def test_bit_parity_with_host_crops(self, ndim):
        import jax.numpy as jnp

        rng = np.random.default_rng(0)
        tdim = (6, 24, 24)[-ndim:]
        V = 3
        tiles = rng.integers(0, 1000, (V,) + tdim).astype(np.uint16)
        tiles_dev = jnp.asarray(tiles)

        views = np.array([0, 2, 1], np.int32)
        starts = np.array(
            [[0] * ndim, [1, 3, 2][-ndim:], [2, 5, 7][-ndim:]], np.int32
        )
        shapes = np.array(
            [[4, 8, 8][-ndim:], [3, 9, 6][-ndim:], [4, 10, 10][-ndim:]],
            np.int32,
        )
        bucket = tuple(int(x) for x in shapes.max(axis=0))
        got = np.asarray(
            registration._crops_from_resident(
                tiles_dev, jnp.asarray(views), jnp.asarray(starts),
                jnp.asarray(shapes), bucket,
            )
        )
        for b in range(3):
            expect = np.full(bucket, np.nan, np.float32)
            sl = tuple(
                slice(starts[b][d], starts[b][d] + shapes[b][d])
                for d in range(ndim)
            )
            expect[tuple(slice(0, shapes[b][d]) for d in range(ndim))] = (
                tiles[views[b]][sl]
            )
            np.testing.assert_array_equal(got[b], expect)

    def test_clamped_start_with_roll(self):
        """A bucket window larger than start+shape leaves room: the clamp
        moves the slice, the roll restores alignment."""
        import jax.numpy as jnp

        tiles = np.arange(100, dtype=np.uint16).reshape(1, 10, 10)
        # crop of shape (3, 3) at start (7, 7): start+bucket (4,4) > 10
        got = np.asarray(
            registration._crops_from_resident(
                jnp.asarray(tiles),
                jnp.asarray([0], np.int32),
                jnp.asarray([[7, 7]], np.int32),
                jnp.asarray([[3, 3]], np.int32),
                (4, 4),
            )
        )[0]
        expect = np.full((4, 4), np.nan, np.float32)
        expect[:3, :3] = tiles[0][7:10, 7:10]
        np.testing.assert_array_equal(got, expect)

    def test_const_flags(self):
        import jax.numpy as jnp

        f = jnp.asarray(
            np.stack(
                [
                    np.full((4, 4), 7.0, np.float32),
                    np.arange(16, dtype=np.float32).reshape(4, 4),
                    np.full((4, 4), np.nan, np.float32),  # pad row
                ]
            )
        )
        m = jnp.asarray(
            np.stack(
                [
                    np.arange(16, dtype=np.float32).reshape(4, 4),
                    np.arange(16, dtype=np.float32).reshape(4, 4),
                    np.full((4, 4), np.nan, np.float32),
                ]
            )
        )
        flags = np.asarray(registration._crop_const_flags(f, m))
        assert flags.tolist() == [True, False, False]


class TestDeviceTilesRegistration:
    @pytest.mark.parametrize("ndim", [2, 3])
    def test_results_match_host_path(self, ndim):
        sims = _grid_sims(ndim=ndim, tile=24 if ndim == 3 else 32)
        msims_a = [
            msi_utils.get_msim_from_sim(s.copy(), scale_factors=[])
            for s in sims
        ]
        msims_b = [
            msi_utils.get_msim_from_sim(s.copy(), scale_factors=[])
            for s in sims
        ]
        kwargs = dict(
            transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
            pre_registration_pruning_method=None,
        )
        params_host = registration.register(
            msims_a, device_tiles=False, **kwargs
        )
        fusion_core.clear_device_tile_cache()
        params_dev = registration.register(
            msims_b, device_tiles=True, **kwargs
        )
        for ph, pd in zip(params_host, params_dev):
            np.testing.assert_allclose(
                np.asarray(pd), np.asarray(ph), atol=1e-5,
                err_msg="device-tile crops changed registration results",
            )

    def test_auto_mode_stays_off_without_residency(self, monkeypatch):
        """device_tiles=None must not upload whole tiles just to register."""
        sims = _grid_sims()
        msims = [
            msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims
        ]
        called = {"n": 0}
        orig = fusion_core._tiles_to_device

        def spy(field_sims):
            called["n"] += 1
            return orig(field_sims)

        monkeypatch.setattr(fusion_core, "_tiles_to_device", spy)
        registration.register(
            msims,
            transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
            pre_registration_pruning_method=None,
        )
        assert called["n"] == 0

    def test_auto_mode_uses_existing_residency(self, monkeypatch):
        sims = _grid_sims()
        msims = [
            msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims
        ]
        field_sims = [msi_utils.get_sim_from_msim(m) for m in msims]
        fusion_core._tiles_to_device(field_sims)  # seed residency

        host_crops = {"n": 0}
        orig = registration._crops_to_device

        def spy(crops, shapes):
            host_crops["n"] += 1
            return orig(crops, shapes)

        monkeypatch.setattr(registration, "_crops_to_device", spy)
        params = registration.register(
            msims,
            transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
            pre_registration_pruning_method=None,
        )
        assert host_crops["n"] == 0, (
            "resident stack present but host crops were uploaded"
        )
        assert len(params) == len(sims)

    def test_float_tiles_fall_back_to_host(self, monkeypatch):
        sims = _grid_sims(dtype=np.float32)
        msims = [
            msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims
        ]
        host_crops = {"n": 0}
        orig = registration._crops_to_device

        def spy(crops, shapes):
            host_crops["n"] += 1
            return orig(crops, shapes)

        monkeypatch.setattr(registration, "_crops_to_device", spy)
        registration.register(
            msims,
            transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
            pre_registration_pruning_method=None,
            device_tiles=True,
        )
        assert host_crops["n"] > 0

    def test_constant_overlap_guard_on_device(self):
        """A constant overlap must yield identity + NaN quality + warning
        through the device path, matching the host guard."""
        tile = 32
        a = np.zeros((tile, tile), np.uint16)
        b = np.zeros((tile, tile), np.uint16)
        rng = np.random.default_rng(0)
        a[:, : tile // 2] = rng.integers(1, 1000, (tile, tile // 2))
        b[:, tile // 2 :] = rng.integers(1, 1000, (tile, tile // 2))
        # overlap region (middle quarter) is all zero in both tiles
        sims = [
            si_utils.get_sim_from_array(
                a, dims=("y", "x"), translation={"y": 0.0, "x": 0.0}
            ),
            si_utils.get_sim_from_array(
                b, dims=("y", "x"),
                translation={"y": 0.0, "x": float(tile - tile // 4)},
            ),
        ]
        msims = [
            msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims
        ]
        with warnings.catch_warnings(record=True) as rec:
            warnings.simplefilter("always")
            registration.register(
                msims,
                transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
                pre_registration_pruning_method=None,
                device_tiles=True,
            )
        assert any("constant" in str(w.message) for w in rec)


class TestDeviceTilesWithMesh:
    def test_mesh_sharded_device_crops_match_host(self):
        """register(mesh=, device_tiles=True): crops sliced from the
        resident stack feed the SHARDED pcc batch; results match the
        unsharded host-crop path."""
        import jax
        from jax.sharding import Mesh

        sims = _grid_sims(ndim=2, n=2, tile=32, overlap=10)
        kwargs = dict(
            transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
            pre_registration_pruning_method=None,
        )
        msims_a = [
            msi_utils.get_msim_from_sim(s.copy(), scale_factors=[])
            for s in sims
        ]
        params_host = registration.register(
            msims_a, device_tiles=False, **kwargs
        )
        fusion_core.clear_device_tile_cache()
        mesh = Mesh(np.array(jax.devices()[:4]), ("b",))
        msims_b = [
            msi_utils.get_msim_from_sim(s.copy(), scale_factors=[])
            for s in sims
        ]
        params_mesh = registration.register(
            msims_b, device_tiles=True, mesh=mesh, **kwargs
        )
        for ph, pm in zip(params_host, params_mesh):
            np.testing.assert_allclose(
                np.asarray(pm), np.asarray(ph), atol=1e-5,
            )


class TestStitchPipeline:
    def test_single_upload_end_to_end(self, monkeypatch):
        """stitch() uploads the tile stack once; fuse() reuses it; the
        fused result matches register()+fuse() run separately."""
        from multiview_stitcher_tpu import fusion

        sims = _grid_sims(ndim=2, n=2, tile=32, overlap=10)

        uploads = {"n": 0}
        orig_mat = fusion_core._materialize_tiles

        def spy(field_sims):
            uploads["n"] += 1
            return orig_mat(field_sims)

        monkeypatch.setattr(fusion_core, "_materialize_tiles", spy)
        fused = stitch.stitch(
            [s.copy() for s in sims],
            register_kwargs=dict(pre_registration_pruning_method=None),
            fuse_kwargs=dict(output_chunksize=32),
        )
        assert uploads["n"] == 1, (
            f"expected ONE tile-stack build, saw {uploads['n']}"
        )

        # oracle: the classic two-pass pipeline
        fusion_core.clear_device_tile_cache()
        msims = [
            msi_utils.get_msim_from_sim(s.copy(), scale_factors=[])
            for s in sims
        ]
        registration.register(
            msims,
            transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
            new_transform_key="registered",
            pre_registration_pruning_method=None,
            device_tiles=False,
        )
        fused_ref = fusion.fuse(
            [msi_utils.get_sim_from_msim(m) for m in msims],
            transform_key="registered",
            output_chunksize=32,
        )
        np.testing.assert_array_equal(
            np.asarray(fused.data), np.asarray(fused_ref.data)
        )

    def test_stitch_to_zarr(self, tmp_path):
        sims = _grid_sims(ndim=2, n=2, tile=32, overlap=10)
        url = str(tmp_path / "stitched.zarr")
        fused = stitch.stitch(
            sims,
            output_zarr_url=url,
            register_kwargs=dict(pre_registration_pruning_method=None),
            fuse_kwargs=dict(output_chunksize=32),
        )
        arr = np.asarray(fused.data)
        assert arr.max() > 0
