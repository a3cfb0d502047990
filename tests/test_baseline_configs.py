"""Integration tests mirroring the five BASELINE.json benchmark configs
(scaled down for CI): the end-to-end workflows a reference user runs."""

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

from multiview_stitcher_tpu import (
    detection,
    fusion,
    msi_utils,
    param_utils,
    registration,
    sample_data,
    si_utils,
)


def test_config1_two_tile_2d_stitch():
    """2-tile 2D overlap stitch: phase correlation + linear blending."""
    rng = np.random.default_rng(0)
    scene = (gaussian_filter(rng.random((80, 150)), 1.2) * 1000).astype(
        np.uint16
    )
    t0, t1 = scene[:, :90], scene[:, 60:]
    shift = (1.0, -2.0)
    sims = [
        si_utils.get_sim_from_array(t0, translation={"y": 0.0, "x": 0.0}),
        si_utils.get_sim_from_array(
            t1, translation={"y": shift[0], "x": 60 + shift[1]}
        ),
    ]
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    registration.register(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        new_transform_key="registered",
    )
    fused = fusion.fuse(
        [msi_utils.get_sim_from_msim(m) for m in msims],
        transform_key="registered",
    )
    out = fused.to_numpy().astype(float)
    h = min(out.shape[0], scene.shape[0]) - 5
    w = min(out.shape[1], scene.shape[1]) - 5
    assert np.median(np.abs(out[5:h, 5:w] - scene[5:h, 5:w])) < 10


def test_config2_3x3_grid_two_channels():
    """3x3 2D grid with global translation resolution, two channels."""
    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_c=2, N_t=1, tile_size=50, tiles_x=3, tiles_y=3,
        overlap=12, zoom=4, shift_scale=2.0, drift_scale=0.0,
    )
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    result = registration.register(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        new_transform_key="registered",
        reg_channel_index=0,
        return_dict=True,
    )
    res = result["groupwise_resolution"]["metrics"]["edge_residuals"]
    for eres in res.values():
        for v in eres.values():
            assert v < 1.0
    fused = fusion.fuse(
        [msi_utils.get_sim_from_msim(m) for m in msims],
        transform_key="registered",
    )
    assert fused.sizes["c"] == 2


@pytest.mark.slow
def test_config3_3d_anisotropic_grid():
    """3D multi-position grid: translation registration on anisotropic
    spacing + weighted 3D fusion."""
    sims = sample_data.generate_tiled_dataset(
        ndim=3, N_c=1, N_t=1, tile_size=32, tiles_x=2, tiles_y=2, tiles_z=1,
        overlap=8, zoom=3, shift_scale=1.5, drift_scale=0.0,
        spacing_x=0.5, spacing_y=0.5, spacing_z=2.0,
    )
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    params = registration.register(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        new_transform_key="registered",
        reg_channel_index=0,
        pre_registration_pruning_method=None,
    )
    assert len(params) == 4
    fused = fusion.fuse(
        [msi_utils.get_sim_from_msim(m) for m in msims],
        transform_key="registered",
    )
    assert fused.sizes["z"] == 32
    assert fused.to_numpy().max() > 0


def test_config4_multiview_affine_markers():
    """Multi-view (rotation) registration via markers + affine resolution
    (BigStitcher-style multiview)."""
    rng = np.random.default_rng(3)
    beads = rng.uniform(10, 90, (60, 2))
    theta = 0.08
    R = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    # view 1 sees the same beads through an (unknown) rotation + offset
    beads_v1 = beads @ R.T + np.array([4.0, -2.0])
    img = np.zeros((100, 100), dtype=np.float32)
    sims = []
    for bset in [beads, beads_v1]:
        sim = si_utils.get_sim_from_array(img.copy())
        si_utils.set_point_set(sim, bset, points_key="beads")
        sims.append(sim)
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    for m, s in zip(msims, sims):
        msi_utils.set_point_set(m, s.attrs["point_sets"]["beads"])

    params = registration.register(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        pairwise_reg_func=registration.registration_marker_based,
        pairwise_reg_func_kwargs={"transform_type": "rigid"},
        groupwise_resolution_method="global_optimization",
        groupwise_resolution_kwargs={"transform": "rigid"},
        pre_registration_pruning_method=None,
        pairs=[(0, 1)],
    )
    # view-1 param must undo the rotation: p1 maps view-1 world -> shared
    m1 = np.asarray(params[1].squeeze())
    # transformed view-1 beads align with view-0 beads
    aligned = param_utils.transform_pts(beads_v1, m1)
    p0 = np.asarray(params[0].squeeze())
    ref = param_utils.transform_pts(beads, p0)
    assert np.median(np.linalg.norm(aligned - ref, axis=1)) < 0.1


def test_config5_zarr_streaming_multichannel_time(tmp_path):
    """Out-of-core zarr->zarr fusion of a chunked multi-channel,
    multi-timepoint dataset (exaSPIM-style streaming, miniaturized)."""
    from multiview_stitcher_tpu.io import ngff_utils

    sims_mem = sample_data.generate_tiled_dataset(
        ndim=2, N_c=2, N_t=2, tile_size=48, tiles_x=2, tiles_y=1,
        overlap=10, zoom=3, shift_scale=0.0, drift_scale=0.0,
    )
    # move tiles into zarr stores (keeping stage metadata)
    sims = []
    for i, s in enumerate(sims_mem):
        url = str(tmp_path / f"tile{i}.ome.zarr")
        lazy = ngff_utils.write_sim_to_ome_zarr(s, url, overwrite=True)
        lazy.origin = dict(s.origin)
        sims.append(lazy)

    out_url = str(tmp_path / "fused.ome.zarr")
    fused = fusion.fuse(
        sims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_zarr_url=out_url,
        output_chunksize=32,
    )
    assert not isinstance(fused.data, np.ndarray)
    assert fused.sizes["t"] == 2 and fused.sizes["c"] == 2
    out = fused.to_numpy()
    assert out.shape[-1] == 48 + 38
    # content sanity: non-overlap region equals tile content per (t, c)
    np.testing.assert_allclose(
        out[..., :20],
        sims_mem[0].to_numpy()[..., :20],
        atol=1,
    )
    # the streamed store is resumable: another writer can attach
    from multiview_stitcher_tpu.io import zarr_backend

    arr = zarr_backend.attach_zarr_array(out_url + "/0")
    assert tuple(arr.shape) == out.shape


@pytest.mark.parametrize(
    "ndim,overlap,N_c,N_t,dtype",
    [
        (2, 5, 1, 1, np.uint8),
        (2, 12, 2, 1, np.uint16),
        (2, 8, 1, 2, np.float32),
        pytest.param(3, 6, 1, 1, np.uint16, marks=pytest.mark.slow),
        pytest.param(3, 10, 2, 1, np.uint8, marks=pytest.mark.slow),
    ],
)
def test_diversity_stitching(ndim, overlap, N_c, N_t, dtype):
    """Register+fuse across ndim/overlap/channels/time/dtype diversity
    (mirror of reference test_integration.py:31 test_diversity_stitching)."""
    tile = 32 if ndim == 3 else 48
    sims = sample_data.generate_tiled_dataset(
        ndim=ndim, N_c=N_c, N_t=N_t, tile_size=tile, tiles_x=2, tiles_y=2,
        overlap=overlap, zoom=3, shift_scale=1.0, drift_scale=0.3,
        dtype=dtype,
    )
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    params = registration.register(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        new_transform_key="registered",
        reg_channel_index=0,
        pre_registration_pruning_method=None,
    )
    assert len(params) == 4
    fused = fusion.fuse(
        [msi_utils.get_sim_from_msim(m) for m in msims],
        transform_key="registered",
    )
    assert fused.dtype == dtype
    if N_c > 1:
        assert fused.sizes["c"] == N_c
    if N_t > 1:
        assert fused.sizes["t"] == N_t
    assert np.asarray(fused.to_numpy()).max() > 0
