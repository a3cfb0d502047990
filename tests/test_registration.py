import jax.numpy as jnp
import numpy as np
import pytest

from multiview_stitcher_tpu import (
    fusion,
    msi_utils,
    mv_graph,
    param_utils,
    registration,
    sample_data,
    si_utils,
)


def _shifted_tile_pair(shift=(2.5, -1.5), shape=(60, 80), overlap=30, seed=0):
    """Two overlapping tiles where tile2's metadata is offset by `shift`."""
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter

    full = gaussian_filter(
        rng.random((shape[0] + 20, 2 * shape[1])), 1.2
    ) * 100
    tile0 = full[: shape[0], : shape[1]]
    x1 = shape[1] - overlap
    tile1 = full[: shape[0], x1 : x1 + shape[1]]
    sim0 = si_utils.get_sim_from_array(
        tile0.astype(np.float32), translation={"y": 0.0, "x": 0.0}
    )
    # tile1's true position is (0, x1); simulate stage metadata error `shift`
    sim1 = si_utils.get_sim_from_array(
        tile1.astype(np.float32),
        translation={"y": float(shift[0]), "x": float(x1 + shift[1])},
    )
    return sim0, sim1


def test_pairwise_registration_recovers_known_shift():
    shift = (3.0, -2.0)
    sim0, sim1 = _shifted_tile_pair(shift)
    result = registration.register_pair_of_msims(
        msi_utils.get_msim_from_sim(sim0, scale_factors=[]),
        msi_utils.get_msim_from_sim(sim1, scale_factors=[]),
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
    )
    affine = np.asarray(result["transform"].squeeze())
    # transform maps fixed world -> moving world; recovered translation should
    # cancel the metadata error
    np.testing.assert_allclose(affine[:2, 2], shift, atol=0.3)
    assert result["quality"] > 0.9
    assert result["bbox"].shape == (2, 2)


def test_pairwise_registration_subpixel():
    shift = (0.0, 1.4)
    sim0, sim1 = _shifted_tile_pair(shift, seed=2)
    result = registration.register_pair_of_msims(
        msi_utils.get_msim_from_sim(sim0, scale_factors=[]),
        msi_utils.get_msim_from_sim(sim1, scale_factors=[]),
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
    )
    affine = np.asarray(result["transform"].squeeze())
    np.testing.assert_allclose(affine[:2, 2], shift, atol=0.35)


def test_constant_overlap_returns_identity():
    sim0 = si_utils.get_sim_from_array(
        np.zeros((40, 40), dtype=np.float32)
    )
    sim1 = si_utils.get_sim_from_array(
        np.zeros((40, 40), dtype=np.float32),
        translation={"y": 0.0, "x": 20.0},
    )
    with pytest.warns(UserWarning, match="constant"):
        result = registration.register_pair_of_msims(
            msi_utils.get_msim_from_sim(sim0, scale_factors=[]),
            msi_utils.get_msim_from_sim(sim1, scale_factors=[]),
            transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        )
    np.testing.assert_allclose(
        np.asarray(result["transform"].squeeze()), np.eye(3)
    )
    assert np.isnan(result["quality"])


def test_optimal_registration_binning():
    sim1 = si_utils.get_sim_from_array(
        np.zeros((1000, 1000), dtype=np.float32)
    )
    binning = registration.get_optimal_registration_binning(
        sim1, sim1, max_total_pixels_per_stack=500**2
    )
    assert binning["x"] == binning["y"] > 1
    assert (1000 / binning["y"]) * (1000 / binning["x"]) < 500**2


def test_register_2x2_grid_recovers_shifts():
    """End-to-end: artificial GT grid, register, check alignment quality."""
    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_c=1, N_t=1, tile_size=60, tiles_x=2, tiles_y=2,
        overlap=12, zoom=4, shift_scale=3.0, drift_scale=0.0,
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
    # after registration, pairwise NCC in overlap regions should be high
    graph_result = registration.register(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        reg_channel_index=0,
        pre_registration_pruning_method=None,
        return_dict=True,
    )
    qualities = graph_result["pairwise_registration"]["metrics"]["qualities"]
    assert all(
        float(np.nanmean(np.asarray(q))) > 0.5 for q in qualities.values()
    )
    # residuals after resolution should be subpixel (spacing 0.5)
    res = graph_result["groupwise_resolution"]["metrics"]["edge_residuals"]
    for eres in res.values():
        for v in eres.values():
            assert v < 1.0


@pytest.mark.parametrize(
    "method", ["global_optimization", "shortest_paths", "linear_two_pass"]
)
def test_groupwise_resolution_methods(method):
    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_c=1, N_t=1, tile_size=50, tiles_x=3, tiles_y=1,
        overlap=12, zoom=4, shift_scale=2.0, drift_scale=0.0,
    )
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    params = registration.register(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        reg_channel_index=0,
        groupwise_resolution_method=method,
        groupwise_resolution_kwargs=(
            {"transform": "translation"}
            if method in ("global_optimization", "linear_two_pass")
            else {}
        ),
        pre_registration_pruning_method=None,
    )
    assert len(params) == 3
    for p in params:
        m = np.asarray(p.squeeze())
        assert m.shape == (3, 3)
        assert np.all(np.isfinite(m))


def test_register_with_time_dimension():
    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_c=1, N_t=2, tile_size=50, tiles_x=2, tiles_y=1,
        overlap=12, zoom=4, shift_scale=1.0, drift_scale=1.0,
    )
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    params = registration.register(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        reg_channel_index=0,
        pre_registration_pruning_method=None,
    )
    assert params[0].has_t
    assert len(params[0].t_coords) == 2


def test_register_then_fuse_end_to_end():
    """The full minimum slice: register + fuse improves overlap agreement."""
    shift = (2.0, -3.0)
    sim0, sim1 = _shifted_tile_pair(shift, seed=5)
    msims = [
        msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in [sim0, sim1]
    ]
    registration.register(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        new_transform_key="registered",
        pre_registration_pruning_method=None,
    )
    fused = fusion.fuse(
        [msi_utils.get_sim_from_msim(m) for m in msims],
        transform_key="registered",
    )
    assert fused.to_numpy().sum() > 0

    # verify the registered transform key exists on the msims
    for m in msims:
        assert "registered" in m.transforms


def test_3d_singleton_z_reduction():
    """3D input with singleton z registers via the 2D path."""
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter

    full = gaussian_filter(rng.random((60, 120)), 1.0) * 100
    t0 = full[:, :70][None].astype(np.float32)
    t1 = full[:, 50:][None].astype(np.float32)
    sims = [
        si_utils.get_sim_from_array(
            t0, dims=("z", "y", "x"),
            translation={"z": 0.0, "y": 0.0, "x": 0.0},
        ),
        si_utils.get_sim_from_array(
            t1, dims=("z", "y", "x"),
            translation={"z": 0.0, "y": 1.0, "x": 49.0},
        ),
    ]
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    params = registration.register(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        pre_registration_pruning_method=None,
    )
    m = np.asarray(params[1].squeeze())
    assert m.shape == (4, 4)
    # z stays untransformed
    np.testing.assert_allclose(m[0], [1, 0, 0, 0])
    # resolved param maps view coords -> corrected world coords, i.e. it
    # cancels the metadata error of (+1, -1): expect (-1, +1)
    np.testing.assert_allclose(m[1:3, 3], [-1.0, 1.0], atol=0.3)


@pytest.mark.slow
def test_fused_core_matches_host_path():
    """The one-dispatch fused registration core agrees with the
    host-orchestrated path."""
    shift = (2.0, -3.0)
    sim0, sim1 = _shifted_tile_pair(shift, seed=7)
    kwargs = dict(
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
    )
    m0 = msi_utils.get_msim_from_sim(sim0, scale_factors=[])
    m1 = msi_utils.get_msim_from_sim(sim1, scale_factors=[])
    res_fused = registration.register_pair_of_msims(m0, m1, **kwargs)
    res_host = registration.register_pair_of_msims(
        m0, m1, pairwise_reg_func_kwargs={"use_fused_core": False}, **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(res_fused["transform"].squeeze()),
        np.asarray(res_host["transform"].squeeze()),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        res_fused["quality"], res_host["quality"], atol=1e-5
    )


@pytest.mark.parametrize("seed", range(6))
def test_fused_core_fuzz_random_subpixel_shifts(seed):
    """The full fused registration core (proposals + candidate expansion +
    SSIM disambiguation) recovers random exact Fourier-domain subpixel
    shifts across random crop sizes to <0.1 px."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    shape = tuple(int(rng.integers(48, 100)) for _ in range(2))
    true_shift = tuple(float(rng.uniform(-6, 6)) for _ in range(2))

    base = gaussian_filter(
        rng.random([s + 24 for s in shape]), 1.0
    )
    freqs = np.meshgrid(
        *[np.fft.fftfreq(s) for s in base.shape], indexing="ij"
    )
    phase = np.exp(
        -2j * np.pi * sum(f * s for f, s in zip(freqs, true_shift))
    )
    shifted = np.fft.ifftn(np.fft.fftn(base) * phase).real
    sl = tuple(slice(12, 12 + s) for s in shape)
    im0 = base[sl].astype(np.float32)
    im1 = shifted[sl].astype(np.float32)

    t_best, quality = registration._pcc_register_core(
        jnp.asarray(im0), jnp.asarray(im1), 10, None
    )
    # core convention: t_best maps fixed pixel coords -> moving pixel
    # coords, i.e. +true_shift when the moving content moved by +s
    np.testing.assert_allclose(
        np.asarray(t_best), list(true_shift), atol=0.1
    )
    assert float(quality) > 0.9


def test_fused_core_matches_host_path_nan_heavy():
    """Fused vs host registration paths agree on crops with large NaN
    regions (reference masks invalid mosaic borders as NaN,
    registration.py:1025; VERDICT r1 test gap)."""
    shift = (2.0, -3.0)
    sim0, sim1 = _shifted_tile_pair(shift, seed=13)
    # carve NaN borders + an interior NaN block into both tiles
    d0 = sim0.to_numpy().copy()
    d1 = sim1.to_numpy().copy()
    d0[:4, :] = np.nan
    d0[:, -6:] = np.nan
    d0[20:32, 10:30] = np.nan
    d1[-5:, :] = np.nan
    d1[:, :3] = np.nan
    d1[10:22, 40:60] = np.nan
    sim0.data = d0
    sim1.data = d1
    m0 = msi_utils.get_msim_from_sim(sim0, scale_factors=[])
    m1 = msi_utils.get_msim_from_sim(sim1, scale_factors=[])
    kwargs = dict(transform_key=si_utils.DEFAULT_TRANSFORM_KEY)
    res_fused = registration.register_pair_of_msims(m0, m1, **kwargs)
    res_host = registration.register_pair_of_msims(
        m0, m1, pairwise_reg_func_kwargs={"use_fused_core": False}, **kwargs
    )
    np.testing.assert_allclose(
        np.asarray(res_fused["transform"].squeeze()),
        np.asarray(res_host["transform"].squeeze()),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        res_fused["quality"], res_host["quality"], atol=1e-5
    )
    # and the recovered shift still cancels the metadata error
    aff = np.asarray(res_fused["transform"].squeeze())
    np.testing.assert_allclose(aff[:2, 2], shift, atol=0.5)


@pytest.mark.parametrize(
    "ndim,pruning,groupwise",
    [
        pytest.param(
            2, "shortest_paths_overlap_weighted", "shortest_paths",
            marks=pytest.mark.slow,
        ),
        (2, "otsu_threshold_on_overlap", "global_optimization"),
        (2, "keep_axis_aligned", "global_optimization"),
        (2, "alternating_pattern", "linear_two_pass"),
        pytest.param(3, None, "global_optimization", marks=pytest.mark.slow),
    ],
)
def test_register_matrix_pruning_groupwise(ndim, pruning, groupwise):
    """register() across pre-pruning x groupwise-resolution combinations
    (reference test_registration.py:453 parametrized matrix): params are
    finite, and a second registration pass on the registered key converges
    to ~zero residual shifts."""
    from multiview_stitcher_tpu import sample_data

    sims = sample_data.generate_tiled_dataset(
        ndim=ndim, N_c=1, N_t=1,
        tile_size=40 if ndim == 2 else 24,
        tiles_x=2, tiles_y=2, tiles_z=1,
        overlap=10 if ndim == 2 else 8,
        zoom=4, shift_scale=1.5, drift_scale=0.0,
    )
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    kwargs = dict(
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        reg_channel_index=0,
        pre_registration_pruning_method=pruning,
        groupwise_resolution_method=groupwise,
        groupwise_resolution_kwargs=(
            {"transform": "translation"}
            if groupwise in ("global_optimization", "linear_two_pass")
            else {}
        ),
        post_registration_do_quality_filter=True,
        post_registration_quality_threshold=-1.0,
    )
    params = registration.register(
        msims, new_transform_key="registered", **kwargs
    )
    assert len(params) == len(msims)
    for p in params:
        assert np.all(np.isfinite(np.asarray(p.squeeze())))
    # convergence: re-registering on the registered key finds ~no residual
    params2 = registration.register(
        msims,
        transform_key="registered",
        reg_channel_index=0,
        pre_registration_pruning_method=None,
        groupwise_resolution_method=groupwise,
        groupwise_resolution_kwargs=kwargs["groupwise_resolution_kwargs"],
    )
    for p in params2:
        m = np.asarray(p.squeeze())
        np.testing.assert_allclose(
            m[:ndim, ndim], 0.0, atol=0.5,
            err_msg=f"residual shift after {pruning}/{groupwise}",
        )


@pytest.mark.parametrize(
    "groupwise", ["shortest_paths", "global_optimization", "linear_two_pass"]
)
def test_disconnected_components_register(groupwise):
    """Views forming multiple connected components resolve per-CC with an
    anchor each (reference test_param_resolution.py:477)."""
    from multiview_stitcher_tpu import sample_data

    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_t=2, N_c=2, tile_size=15, tiles_x=3, tiles_y=1,
        overlap=5, zoom=2,
    )
    # detach the last tile into its own component
    far = float(np.max(np.asarray(sims[2].coords.get(
        "y", np.arange(sims[2].sizes["y"])
    )))) if "y" in sims[2].coords else 0.0
    sims[2].origin["y"] += far + sims[2].sizes["y"] + 50.0
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    params = registration.register(
        msims,
        reg_channel_index=0,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        new_transform_key="affine_registered",
        groupwise_resolution_method=groupwise,
        groupwise_resolution_kwargs=(
            {"transform": "translation"}
            if groupwise in ("global_optimization", "linear_two_pass")
            else {}
        ),
        pre_registration_pruning_method=None,
    )
    assert len(params) == 3
    for p in params:
        assert np.all(np.isfinite(np.asarray(p.squeeze())))


@pytest.mark.parametrize(
    "groupwise", ["shortest_paths", "global_optimization", "linear_two_pass"]
)
def test_manual_pairs_registration(groupwise):
    """register(pairs=...) restricts the pairwise graph to the given
    non-contiguous edges (reference test_param_resolution.py:524)."""
    from multiview_stitcher_tpu import sample_data

    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_t=2, N_c=2, tile_size=15, tiles_x=2, tiles_y=3,
        overlap=5, zoom=2,
    )
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    pairs = [(1, 3), (3, 2), (2, 5)]
    result = registration.register(
        msims,
        reg_channel_index=0,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        new_transform_key="affine_registered",
        groupwise_resolution_method=groupwise,
        groupwise_resolution_kwargs=(
            {"transform": "translation"}
            if groupwise in ("global_optimization", "linear_two_pass")
            else {}
        ),
        pairs=pairs,
        return_dict=True,
    )
    params = result["params"]
    assert len(params) == 6
    g = result["pairwise_registration"]["graph"]
    assert set(map(tuple, map(sorted, g.edges()))) <= {
        tuple(sorted(p)) for p in pairs
    }


def test_register_undoes_non_identity_initial_transform():
    """Registration on a pre-registration key whose transforms MISALIGN
    already-aligned content recovers the inverse (reference
    test_registration.py:1599 scenario, translation flavor)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(17)
    full = gaussian_filter(rng.random((80, 140)), 1.5) * 100
    tile0 = full[:, :80].astype(np.float32)
    tile1 = full[:, 60:].astype(np.float32)
    sims = [
        si_utils.get_sim_from_array(
            tile0, translation={"y": 0.0, "x": 0.0}
        ),
        si_utils.get_sim_from_array(
            tile1, translation={"y": 0.0, "x": 60.0}
        ),
    ]
    # pre-registration key that breaks the (correct) metadata alignment
    bad_shift = np.array([4.0, -6.0])
    si_utils.set_sim_affine(
        sims[0], np.eye(3), transform_key="prereg"
    )
    si_utils.set_sim_affine(
        sims[1],
        param_utils.affine_from_translation(bad_shift),
        transform_key="prereg",
    )
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    registration.register(
        msims,
        transform_key="prereg",
        new_transform_key="fixed",
        pre_registration_pruning_method=None,
        groupwise_resolution_kwargs={"transform": "translation"},
    )
    # composed world positions under "fixed" must re-align the content:
    # fuse and compare against the ground truth
    from multiview_stitcher_tpu import fusion

    fused = fusion.fuse(
        [msi_utils.get_sim_from_msim(m) for m in msims],
        transform_key="fixed",
    ).to_numpy()
    # interior rows match ground truth (allow border interpolation slack)
    core = np.s_[8:-8, 8:-8]
    assert fused.shape[0] >= 78
    h = min(fused.shape[0], full.shape[0])
    w = min(fused.shape[1], full.shape[1])
    err = np.abs(
        fused[:h, :w][core].astype(float) - full[:h, :w][core]
    )
    assert np.median(err) < 1.0


def test_reg_channel_by_name_matches_index():
    """reg_channel='name' selects the same data as reg_channel_index
    (reference test_registration.py:660)."""
    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_c=2, N_t=1, tile_size=48, tiles_x=2, tiles_y=1,
        overlap=12, zoom=3, shift_scale=1.0, drift_scale=0.0,
    )
    # name the channels
    for s in sims:
        s.coords["c"] = ["DAPI", "GFP"]
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    p_idx = registration.register(
        [m.copy() for m in msims],
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        reg_channel_index=1, pre_registration_pruning_method=None,
    )
    p_name = registration.register(
        [m.copy() for m in msims],
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        reg_channel="GFP", pre_registration_pruning_method=None,
    )
    for a, b in zip(p_idx, p_name):
        np.testing.assert_allclose(
            np.asarray(a.squeeze()), np.asarray(b.squeeze()), atol=1e-9
        )


def test_iterative_registration_chains_transform_keys():
    """A second register() round can start from the first round's resolved
    key and write a new key (reference test_registration.py:339)."""
    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_c=1, N_t=1, tile_size=48, tiles_x=2, tiles_y=1,
        overlap=12, zoom=3, shift_scale=1.5, drift_scale=0.0,
    )
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    registration.register(
        msims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        new_transform_key="round1", reg_channel_index=0,
        pre_registration_pruning_method=None,
    )
    registration.register(
        msims, transform_key="round1", new_transform_key="round2",
        reg_channel_index=0, pre_registration_pruning_method=None,
    )
    sim0 = msi_utils.get_sim_from_msim(msims[0])
    # round 2 starts from an already-registered state: its incremental
    # correction on top of round1 must be tiny
    p1 = np.asarray(
        si_utils.get_affine_from_sim(sim0, "round1").squeeze()
    )
    p2 = np.asarray(
        si_utils.get_affine_from_sim(sim0, "round2").squeeze()
    )
    assert np.abs(p2 - p1).max() < 0.5


def test_marker_descriptor_matching_matches_bruteforce():
    """kd-tree descriptor matching equals the O(n^2) definition: nearest
    descriptor, ratio test vs the best DIFFERENT moving point (reference
    test_registration.py:882)."""
    rng = np.random.default_rng(5)
    fixed = rng.uniform(0, 100, (25, 2))
    moving = fixed @ np.eye(2) + rng.normal(0, 0.01, (25, 2))
    fv, fi = registration._marker_descriptors(fixed, 3, 1)
    mv, mi = registration._marker_descriptors(moving, 3, 1)
    thr = registration._marker_auto_threshold(fixed, moving, 3, 1.0)
    pairs = registration._match_descriptors(fv, fi, mv, mi, 3.0, thr)

    # brute force
    import itertools

    cand = {}
    for fvec, fidx in zip(fv, fi):
        d = np.linalg.norm(mv - fvec, axis=1)
        order = np.argsort(d)
        best = d[order[0]]
        best_mi = mi[order[0]]
        if best >= thr:
            continue
        others = [j for j in order[1:] if mi[j] != best_mi]
        second = d[others[0]] if others else np.inf
        if best * 3.0 < second:
            key = int(fidx)
            if key not in cand or best < cand[key][1]:
                cand[key] = (int(best_mi), best)
    brute = {(k, v[0]) for k, v in cand.items()}
    assert set(map(tuple, pairs)) == brute


def test_marker_icp_refines_transform():
    """ICP polish on a noisy RANSAC seed converges to the true transform
    (reference test_registration.py:977)."""
    rng = np.random.default_rng(6)
    fixed = rng.uniform(0, 100, (40, 2))
    th = 0.05
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
    moving = fixed @ R.T + np.array([3.0, -2.0])
    gt = np.eye(3)
    gt[:2, :2] = R
    gt[:2, 2] = [3.0, -2.0]
    seed = gt.copy()
    seed[:2, 2] += [0.8, -0.6]  # perturbed initial guess
    refined, quality = registration._run_marker_icp(
        fixed, moving, seed, 0.2, "rigid",
        icp_max_error=5.0, icp_num_iterations=50, icp_tolerance=1e-9,
    )
    aligned = param_utils.transform_pts(fixed, refined)
    assert np.linalg.norm(aligned - moving, axis=1).max() < 1e-6
    assert quality > 0.9


def test_register_res_level_selection():
    """reg_res_level forces registration at a coarser pyramid level; the
    result still recovers the (coarse-scale) shift (reference
    test_registration.py:1166)."""
    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_c=1, N_t=1, tile_size=96, tiles_x=2, tiles_y=1,
        overlap=24, zoom=3, shift_scale=1.0, drift_scale=0.0,
    )
    msims = [
        msi_utils.get_msim_from_sim(s, scale_factors=[2]) for s in sims
    ]
    params_fine = registration.register(
        [m.copy() for m in msims],
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        reg_channel_index=0, pre_registration_pruning_method=None,
    )
    params_coarse = registration.register(
        [m.copy() for m in msims],
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        reg_channel_index=0, reg_res_level=1,
        pre_registration_pruning_method=None,
    )
    # both recover the same relative shift within a coarse pixel
    rel_f = np.asarray(params_fine[1].squeeze())[:2, 2] - np.asarray(
        params_fine[0].squeeze()
    )[:2, 2]
    rel_c = np.asarray(params_coarse[1].squeeze())[:2, 2] - np.asarray(
        params_coarse[0].squeeze()
    )[:2, 2]
    assert np.abs(rel_f - rel_c).max() <= 2.0


def test_overlap_tolerance_registers_nonoverlapping_metadata():
    """overlap_tolerance extends view extents so tiles whose METADATA says
    they no longer overlap still get an adjacency edge and register; the
    recovered relative shift differs from the unshifted case by exactly
    the metadata displacement (reference test_registration.py:1097)."""
    overlap_x = 10
    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_c=1, N_t=1, tile_size=30, tiles_x=2, tiles_y=1,
        overlap=overlap_x, zoom=4, shift_scale=0.0, drift_scale=0.0,
    )
    sim0, sim1 = sims
    # displace tile 1's metadata by the whole overlap: nominal overlap -> 0
    sim1_shifted = sim1.copy()
    sim1_shifted.origin = dict(sim1.origin)
    sim1_shifted.origin["x"] = sim1.origin["x"] + overlap_x
    sim1_shifted.transforms = {
        k: v.copy() for k, v in sim1.transforms.items()
    }

    def msims_of(pair):
        return [
            msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in pair
        ]

    # without tolerance there is no edge to register
    with pytest.raises(mv_graph.NotEnoughOverlapError):
        registration.register(
            msims_of([sim0, sim1_shifted]),
            transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
            reg_channel_index=0,
            pre_registration_pruning_method=None,
        )

    params_orig = registration.register(
        msims_of([sim0, sim1]),
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        reg_channel_index=0,
        pre_registration_pruning_method=None,
    )
    params_shifted = registration.register(
        msims_of([sim0, sim1_shifted]),
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        overlap_tolerance={"x": float(overlap_x)},
        reg_channel_index=0,
        pre_registration_pruning_method=None,
    )
    rel = lambda p: (
        np.asarray(p[1].squeeze())[:2, 2] - np.asarray(p[0].squeeze())[:2, 2]
    )
    diff = rel(params_shifted) - rel(params_orig)
    np.testing.assert_allclose(diff, [0.0, -overlap_x], atol=1.5)


@pytest.mark.parametrize("ndim", [2, 3])
def test_marker_based_registration_recovers_rotation_only(ndim):
    """RGLDM descriptor matching + RANSAC (+ICP) recovers a pure rotation
    between point sets (reference test_registration.py:1005)."""
    from multiview_stitcher_tpu import transformation

    rng = np.random.default_rng(100 + ndim)
    moving_points = rng.uniform(0, 100, size=(36, ndim))
    if ndim == 2:
        angle = 0.8
        expected = np.eye(3)
        expected[:2, :2] = [
            [np.cos(angle), -np.sin(angle)],
            [np.sin(angle), np.cos(angle)],
        ]
    else:
        direction = np.array([0.3, -0.2, 1.0])
        expected = param_utils.affine_from_rotation(
            0.6, direction / np.linalg.norm(direction)
        )
    fixed_points = transformation.transform_pts(moving_points, expected)

    result = registration.registration_marker_based(
        fixed_points=fixed_points,
        moving_points=moving_points,
        icp=True,
        random_state=2,
        fail_on_error=True,
    )
    recovered = transformation.transform_pts(
        moving_points, np.linalg.inv(np.asarray(result["affine_matrix"]))
    )
    np.testing.assert_allclose(recovered, fixed_points, atol=0.5)


def test_marker_descriptor_threshold_scales_with_coordinates():
    """The auto descriptor-distance threshold scales linearly with the
    point cloud's coordinate scale (reference test_registration.py:862)."""
    rng = np.random.default_rng(102)
    points = rng.uniform(0, 100, size=(36, 2))
    moving = points + np.array([3.0, -5.0])
    t1 = registration._marker_auto_threshold(
        points, moving, num_neighbors=3, scale=1.0
    )
    t10 = registration._marker_auto_threshold(
        points * 10, moving * 10, num_neighbors=3, scale=1.0
    )
    assert t10 == pytest.approx(t1 * 10)


def test_marker_based_recovers_affine_transform():
    """RGLDM with transform_type='affine' recovers rotation+scale+shift
    (reference test_registration.py:940 synthetic-transform recovery;
    supported types there are translation/rigid/affine,
    reference registration.py:595)."""
    from multiview_stitcher_tpu import transformation

    rng = np.random.default_rng(7)
    moving_points = rng.uniform(0, 100, size=(40, 2))
    # mild affine, like the reference's _marker_test_affine: the RGLDM
    # descriptors are distance-based (rotation/translation invariant), so
    # large scale changes would defeat the matching there too
    expected = np.eye(3)
    expected[:2, :2] = [[1.05, 0.08], [-0.04, 0.96]]
    expected[:2, 2] = [6.0, -5.0]
    fixed_points = transformation.transform_pts(moving_points, expected)
    # outliers on both sides (reference test_registration.py:947-953)
    fixed_with_outliers = np.vstack(
        [fixed_points, rng.uniform(200, 250, size=(6, 2))]
    )
    moving_with_outliers = np.vstack(
        [moving_points, rng.uniform(-100, -50, size=(6, 2))]
    )

    result = registration.registration_marker_based(
        fixed_points=fixed_with_outliers,
        moving_points=moving_with_outliers,
        transform_type="affine",
        random_state=3,
        fail_on_error=True,
    )
    recovered = transformation.transform_pts(
        fixed_points, np.asarray(result["affine_matrix"])
    )
    rms = np.sqrt(np.mean(np.sum((recovered - moving_points) ** 2, axis=1)))
    assert rms < 1e-6
    np.testing.assert_allclose(
        np.asarray(result["affine_matrix"]),
        np.linalg.inv(expected),
        atol=1e-6,
    )
    assert result["quality"] > 0.5


def test_return_dict_structure_and_summary_plot():
    """register(return_dict=True) exposes the pairwise graph, per-edge
    qualities, resolver metrics and (with plot_summary) figures (reference
    test_registration.py:372)."""
    import matplotlib

    matplotlib.use("Agg")

    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_t=1, N_c=1, tile_size=32, tiles_x=2, tiles_y=1,
        overlap=8, zoom=4, drift_scale=0, shift_scale=1.0, dtype=np.uint16,
    )
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    result = registration.register(
        msims,
        transform_key="affine_metadata",
        new_transform_key="reg",
        reg_channel_index=0,
        return_dict=True,
        plot_summary=True,
    )
    assert len(result["params"]) == 2
    pw = result["pairwise_registration"]
    assert set(pw["metrics"]["qualities"]) == set(pw["graph"].edges)
    for q in pw["metrics"]["qualities"].values():
        assert np.isfinite(np.asarray(q, dtype=float)).all()
    fig, _ = pw["summary_plot"]
    assert fig is not None
    gw = result["groupwise_resolution"]
    assert "metrics" in gw
    import matplotlib.pyplot as plt

    plt.close("all")


def test_register_zarr_backed_msims_matches_in_memory(tmp_path):
    """register() over zarr-backed views matches the in-memory result
    (reference test_registration.py:173 zarr-backed pair handling)."""
    from multiview_stitcher_tpu.io import ngff_utils

    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_t=1, N_c=1, tile_size=32, tiles_x=2, tiles_y=1,
        overlap=8, zoom=4, drift_scale=0, shift_scale=1.0, dtype=np.uint16,
    )
    msims_mem = [
        msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims
    ]
    zsims = [
        ngff_utils.write_sim_to_ome_zarr(
            s, str(tmp_path / f"v{i}.ome.zarr")
        )
        for i, s in enumerate(sims)
    ]
    # restore the stage-position transforms the store cannot hold
    for zs, s in zip(zsims, sims):
        zs.transforms["affine_metadata"] = s.transforms["affine_metadata"]
    msims_zarr = [
        msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in zsims
    ]

    p_mem = registration.register(
        msims_mem, transform_key="affine_metadata", new_transform_key="reg",
        reg_channel_index=0,
    )
    p_zarr = registration.register(
        msims_zarr, transform_key="affine_metadata", new_transform_key="reg",
        reg_channel_index=0,
    )
    np.testing.assert_allclose(
        np.asarray([p.squeeze() for p in p_zarr]),
        np.asarray([p.squeeze() for p in p_mem]),
        atol=1e-6,
    )


def test_marker_pairwise_plumbing_points_reach_func_in_world_coords():
    """Point sets are transformed to world coords by each view's
    transform-key affine before reaching a points-based pairwise func, and
    the func's affine/quality pass through unchanged (reference
    test_registration.py:711 test_marker_based_pairwise_registration_plumbing).
    """
    transform_key = "stage"
    fixed_affine = param_utils.affine_from_translation([1.0, 0.0])
    moving_affine = param_utils.affine_from_translation([0.0, 2.0])
    fixed_sim = si_utils.get_sim_from_array(
        np.zeros((10, 10)), dims=["y", "x"],
        affine=fixed_affine, transform_key=transform_key,
    )
    moving_sim = si_utils.get_sim_from_array(
        np.zeros((10, 10)), dims=["y", "x"],
        affine=moving_affine, transform_key=transform_key,
    )
    pts = np.array([[2.0, 3.0], [4.0, 5.0]])
    si_utils.set_point_set(fixed_sim, pts)
    si_utils.set_point_set(moving_sim, pts)

    captured = {}

    def pairwise_func(*, fixed_points, moving_points):
        captured["fixed"] = np.asarray(fixed_points)
        captured["moving"] = np.asarray(moving_points)
        return {"affine_matrix": np.eye(3), "quality": 0.25}

    result = registration.register_pair_of_msims(
        msi_utils.get_msim_from_sim(fixed_sim, scale_factors=[]),
        msi_utils.get_msim_from_sim(moving_sim, scale_factors=[]),
        transform_key=transform_key,
        registration_binning={"y": 1, "x": 1},
        pairwise_reg_func=pairwise_func,
    )

    np.testing.assert_allclose(
        captured["fixed"], param_utils.transform_pts(pts, fixed_affine)
    )
    np.testing.assert_allclose(
        captured["moving"], param_utils.transform_pts(pts, moving_affine)
    )
    np.testing.assert_allclose(
        np.asarray(result["transform"]).squeeze(), np.eye(3), atol=1e-12
    )
    assert float(result["quality"]) == pytest.approx(0.25)


def test_marker_prefiltering_controls_overlap_filtering():
    """prefilter_markers=True restricts each view's markers to its overlap
    crop before the pairwise func sees them; False passes all markers
    (reference test_registration.py:773)."""
    transform_key = "stage"
    fixed_sim = si_utils.get_sim_from_array(
        np.zeros((10, 10)), dims=["y", "x"], transform_key=transform_key,
    )
    moving_sim = si_utils.get_sim_from_array(
        np.zeros((10, 10)), dims=["y", "x"],
        translation={"y": 0.0, "x": 5.0}, transform_key=transform_key,
    )
    # fixed view: only the last two points fall in the overlap (x >= 5);
    # moving view (intrinsic coords): only the first two (x <= 5+margin)
    si_utils.set_point_set(
        fixed_sim,
        np.array([[1.0, 1.0], [2.0, 2.0], [3.0, 6.0], [4.0, 8.0]]),
    )
    si_utils.set_point_set(
        moving_sim,
        np.array([[1.0, 6.0], [2.0, 7.0], [3.0, 11.0], [4.0, 13.0]]),
    )
    fixed_msim = msi_utils.get_msim_from_sim(fixed_sim, scale_factors=[])
    moving_msim = msi_utils.get_msim_from_sim(moving_sim, scale_factors=[])

    counts = []

    def pairwise_func(*, fixed_points, moving_points):
        counts.append((len(fixed_points), len(moving_points)))
        return {"affine_matrix": np.eye(3), "quality": 1.0}

    common = dict(
        transform_key=transform_key,
        registration_binning={"y": 1, "x": 1},
        pairwise_reg_func=pairwise_func,
    )
    registration.register_pair_of_msims(fixed_msim, moving_msim, **common)
    assert counts[-1] == (4, 4)
    registration.register_pair_of_msims(
        fixed_msim, moving_msim, prefilter_markers=True, **common
    )
    assert counts[-1] == (2, 2)


def test_marker_based_register_end_to_end_dummy_points():
    """register() with pairwise_reg_func=registration_marker_based on two
    views whose shared markers differ by a pure stage offset resolves with
    high pairwise quality (reference test_registration.py:1044)."""
    transform_key = "stage"
    rng = np.random.default_rng(7)
    base_points = rng.uniform(2.0, 18.0, size=(12, 2))
    sims = []
    for x_origin in [0.0, 5.0]:
        sim = si_utils.get_sim_from_array(
            np.zeros((20, 20)), dims=["y", "x"],
            translation={"y": 0.0, "x": x_origin},
            transform_key=transform_key,
        )
        si_utils.set_point_set(
            sim, base_points + np.array([0.0, x_origin])
        )
        sims.append(sim)

    out = registration.register(
        [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims],
        transform_key=transform_key,
        reg_channel_index=0,
        registration_binning={"y": 1, "x": 1},
        pairwise_reg_func=registration.registration_marker_based,
        pre_registration_pruning_method=None,
        return_dict=True,
    )
    qualities = out["pairwise_registration"]["metrics"]["qualities"]
    assert len(qualities) == 1
    assert list(qualities.values())[0] > 0.75


def test_register_constant_tile_warns_and_falls_back_to_identity():
    """An all-constant overlap through the full register() pipeline warns
    and assumes identity (reference test_registration.py:682)."""
    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_t=1, N_c=1, tile_size=10,
        tiles_x=2, tiles_y=1, tiles_z=1, overlap=5,
    )
    sims[0].data = np.zeros_like(np.asarray(sims[0].data))
    msims = [
        msi_utils.get_msim_from_sim(sim, scale_factors=[]) for sim in sims
    ]
    with pytest.warns(
        UserWarning,
        match="overlap region between tiles/views is all zero or constant",
    ):
        params = registration.register(
            msims,
            reg_channel_index=0,
            transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
            pairwise_reg_func=registration.phase_correlation_registration,
        )
    assert len(params) == 2
    for p in params:
        assert np.all(np.isfinite(np.asarray(p)))


@pytest.mark.parametrize(
    "ndim, overlap, N_t, dtype",
    [
        (2, 1, 2, np.uint16),  # single-pixel overlap: not registrable
        (2, 5, 2, np.uint16),
        (2, 5, 2, np.uint8),
        (3, 5, 1, np.uint8),
    ],
)
def test_diversity_stitching(ndim, overlap, N_t, dtype):
    """End-to-end register+fuse across dtype/ndim/time diversity
    (reference test_integration.py:31 test_diversity_stitching)."""
    sims = sample_data.generate_tiled_dataset(
        ndim=ndim, N_t=N_t, N_c=1, tile_size=15,
        tiles_x=2, tiles_y=1, tiles_z=1, overlap=overlap,
        zoom=10, dtype=dtype,
    )
    msims = [
        msi_utils.get_msim_from_sim(sim, scale_factors=[]) for sim in sims
    ]
    if overlap <= 1:
        with pytest.raises(mv_graph.NotEnoughOverlapError):
            registration.register(
                msims,
                reg_channel_index=0,
                transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
                new_transform_key="affine_registered",
            )
        return
    registration.register(
        msims,
        reg_channel_index=0,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        new_transform_key="affine_registered",
    )
    fused = fusion.fuse(
        [msi_utils.get_sim_from_msim(m) for m in msims],
        transform_key="affine_registered",
    )
    arr = np.asarray(fused.data)
    assert arr.dtype == np.dtype(dtype)
    assert np.all(np.isfinite(arr.astype(np.float64)))
    assert arr.max() > 0


def test_crops_to_device_packed_roundtrip(monkeypatch):
    """Packed crop uploads (uint16+delta wire) reconstruct the NaN-padded
    f32 batch bit-exactly; float-valued or interior-NaN batches fall back
    to the raw f32 path."""
    import jax

    from multiview_stitcher_tpu.ops import link_codec

    # force the non-CPU branch (put_packed itself runs fine on CPU)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(link_codec, "_MIN_PACK_SIZE", 0)
    rng = np.random.default_rng(0)
    shapes = [(30, 40), (25, 37), (30, 40)]
    B, S = len(shapes), (30, 40)
    crops = np.full((B + 1,) + S, np.nan, np.float32)  # +1 all-NaN pad row
    for bi, shp in enumerate(shapes):
        crops[bi][tuple(slice(0, s) for s in shp)] = rng.integers(
            0, 3000, shp
        )
    dev = registration._crops_to_device(crops, shapes)
    np.testing.assert_array_equal(np.asarray(dev), crops)

    # fractional values: raw f32 fallback, still bit-exact
    crops_f = crops.copy()
    crops_f[0, 0, 0] = 1.5
    dev = registration._crops_to_device(crops_f, shapes)
    np.testing.assert_array_equal(np.asarray(dev), crops_f)

    # interior NaN: raw f32 fallback preserves it
    crops_n = crops.copy()
    crops_n[0, 5, 5] = np.nan
    dev = registration._crops_to_device(crops_n, shapes)
    np.testing.assert_array_equal(np.asarray(dev), crops_n)
