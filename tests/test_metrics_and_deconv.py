import numpy as np
import pytest

from multiview_stitcher_tpu import (
    fusion,
    metrics,
    msi_utils,
    param_utils,
    registration,
    sample_data,
    si_utils,
)
from multiview_stitcher_tpu.fusion import mv_deconv


def _pair_with_error(shift=(3.0, -2.0), seed=0):
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter

    full = gaussian_filter(rng.random((60, 140)), 1.2) * 100
    t0 = full[:, :80].astype(np.float32)
    t1 = full[:, 60:].astype(np.float32)
    sim0 = si_utils.get_sim_from_array(t0, translation={"y": 0.0, "x": 0.0})
    sim1 = si_utils.get_sim_from_array(
        t1, translation={"y": shift[0], "x": 60.0 + shift[1]}
    )
    return sim0, sim1


class TestMetrics:
    def test_ncc(self):
        a = np.random.random((20, 20))
        b = 2 * a + 3
        assert metrics.normalized_cross_correlation(a, b) == pytest.approx(1.0, abs=1e-6)
        a2 = a.copy()
        a2[:5] = np.nan
        assert metrics.normalized_cross_correlation(a2, b) == pytest.approx(1.0, abs=1e-6)

    def test_registered_beats_metadata(self):
        """After registration, overlap NCC under the registered key is higher."""
        sim0, sim1 = _pair_with_error()
        msims = [
            msi_utils.get_msim_from_sim(s, scale_factors=[])
            for s in [sim0, sim1]
        ]
        registration.register(
            msims,
            transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
            new_transform_key="registered",
            pre_registration_pruning_method=None,
        )
        result = metrics.tile_pair_image_metrics(
            msims,
            base_transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
            query_transform_keys=[si_utils.DEFAULT_TRANSFORM_KEY, "registered"],
        )
        summary = result["summary"]
        assert (
            summary["registered"]["ncc"]
            > summary[si_utils.DEFAULT_TRANSFORM_KEY]["ncc"]
        )
        assert summary["registered"]["ncc"] > 0.9

    def test_pairs_graph_mode(self):
        sim0, sim1 = _pair_with_error()
        msims = [
            msi_utils.get_msim_from_sim(s, scale_factors=[])
            for s in [sim0, sim1]
        ]
        import networkx as nx

        g = nx.Graph()
        g.add_nodes_from([0, 1])
        g.add_edge(
            0, 1,
            transform=param_utils.affine_to_xaffine(
                param_utils.affine_from_translation([3.0, -2.0])
            ),
        )
        result = metrics.tile_pair_image_metrics(
            msims,
            base_transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
            pairs_graph=g,
        )
        assert (0, 1) in result["pairs"]
        assert result["summary"]["transform"]["ncc"] > 0.9


class TestMvDeconv:
    def test_gaussian_psf(self):
        psf = mv_deconv.make_gaussian_psf(1.5, ndim=2)
        assert psf.sum() == pytest.approx(1.0, abs=1e-5)
        assert psf.shape == (9, 9)
        # symmetric with max at center
        assert psf[4, 4] == psf.max()

    def test_estimate_psf_anisotropic(self):
        psf = mv_deconv.estimate_psf({"z": 2.0, "y": 0.5, "x": 0.5}, na=0.8)
        assert psf.ndim == 3
        assert psf.sum() == pytest.approx(1.0, abs=1e-5)

    @pytest.mark.parametrize(
        "psf_type",
        [
            mv_deconv.PSFType.EFFICIENT_BAYESIAN,
            mv_deconv.PSFType.OPTIMIZATION_I,
            mv_deconv.PSFType.OPTIMIZATION_II,
            mv_deconv.PSFType.INDEPENDENT,
        ],
    )
    def test_deconvolution_sharpens(self, psf_type):
        """RL deconvolution of a blurred bead increases peak intensity."""
        rng = np.random.default_rng(0)
        img = np.zeros((48, 48), dtype=np.float32)
        img[24, 24] = 100.0
        img[10, 35] = 80.0
        from scipy.ndimage import gaussian_filter

        psf_sigma = 1.5
        blurred = gaussian_filter(img, psf_sigma)
        views = np.stack([blurred, blurred])
        weights = np.full((2, 48, 48), 0.5, dtype=np.float32)
        psf = mv_deconv.make_gaussian_psf(psf_sigma, ndim=2)
        out = mv_deconv.multi_view_deconvolution(
            views, weights, psfs=[psf, psf], psf_type=psf_type,
            n_iterations=10,
        )
        assert out[24, 24] > blurred[24, 24] * 2
        assert np.argmax(out) == np.argmax(img)

    def test_deconv_through_fuse(self):
        """multi_view_deconvolution plugs in as fusion_func with halo."""
        rng = np.random.default_rng(1)
        from scipy.ndimage import gaussian_filter

        full = gaussian_filter(rng.random((40, 70)).astype(np.float32), 1.0) * 50
        t0, t1 = full[:, :40], full[:, 30:]
        sims = [
            si_utils.get_sim_from_array(t0, translation={"y": 0.0, "x": 0.0}),
            si_utils.get_sim_from_array(t1, translation={"y": 0.0, "x": 30.0}),
        ]
        fused = fusion.fuse(
            sims,
            transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
            fusion_func=mv_deconv.multi_view_deconvolution,
            fusion_func_kwargs={"n_iterations": 3},
        )
        out = fused.to_numpy()
        assert out.shape == full.shape
        assert out.max() > 0


def test_batched_ncc_matches_host_loop():
    """The shape-bucketed device NCC path equals the per-edge host loop."""
    from multiview_stitcher_tpu import sample_data

    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_c=1, N_t=1, tile_size=40, tiles_x=3, tiles_y=2,
        overlap=10, zoom=3, shift_scale=1.0, drift_scale=0.0,
    )
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]

    res_batched = metrics.tile_pair_image_metrics(
        msims,
        base_transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        query_transform_keys=[si_utils.DEFAULT_TRANSFORM_KEY],
    )
    # a non-identity wrapper forces the generic host loop
    res_host = metrics.tile_pair_image_metrics(
        msims,
        base_transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        query_transform_keys=[si_utils.DEFAULT_TRANSFORM_KEY],
        metric_funcs={
            "ncc": lambda a, b: metrics.normalized_cross_correlation(a, b)
        },
    )
    q = si_utils.DEFAULT_TRANSFORM_KEY
    assert set(res_batched["pairs"]) == set(res_host["pairs"])
    for e in res_batched["pairs"]:
        np.testing.assert_allclose(
            res_batched["pairs"][e][q]["ncc"],
            res_host["pairs"][e][q]["ncc"],
            atol=1e-4,
        )
    np.testing.assert_allclose(
        res_batched["summary"][q]["ncc"],
        res_host["summary"][q]["ncc"],
        atol=1e-4,
    )


@pytest.mark.slow
def test_masked_spearman_matches_scipy():
    """Tie-averaged ranks vs scipy.stats.spearmanr, including the all-True
    mask (regression: the scan sentinel once broke the final tie run)."""
    from scipy import stats

    from multiview_stitcher_tpu.ops import image_metrics as im

    rng = np.random.default_rng(7)
    for trial in range(20):
        n = int(rng.integers(5, 80))
        a = rng.integers(0, int(rng.integers(2, 15)), n).astype(np.float32)
        b = rng.integers(0, int(rng.integers(2, 15)), n).astype(np.float32)
        mask = (
            np.ones(n, bool)
            if trial % 2 == 0
            else rng.random(n) > 0.4
        )
        if mask.sum() < 3 or len(set(a[mask])) < 2 or len(set(b[mask])) < 2:
            continue
        ref = stats.spearmanr(a[mask], b[mask]).statistic
        got = float(im.masked_spearman(a, b, mask))
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestNCCEdgeCases:
    """NCC degenerate inputs (reference test_metrics.py:17-56)."""

    def test_identical_is_one(self):
        rng = np.random.default_rng(0)
        im = rng.random((20, 20))
        assert np.isclose(
            metrics.normalized_cross_correlation(im, im), 1.0
        )

    def test_anticorrelated_is_minus_one(self):
        rng = np.random.default_rng(0)
        im = rng.random((20, 20))
        assert np.isclose(
            metrics.normalized_cross_correlation(im, -im), -1.0
        )

    def test_constant_image_is_nan(self):
        rng = np.random.default_rng(0)
        assert np.isnan(
            metrics.normalized_cross_correlation(
                np.ones((20, 20)), rng.random((20, 20))
            )
        )

    def test_all_nan_is_nan(self):
        im = np.full((10, 10), np.nan)
        assert np.isnan(metrics.normalized_cross_correlation(im, im))

    def test_partial_nan_is_ignored(self):
        rng = np.random.default_rng(0)
        im = rng.random((20, 20))
        im_nan = im.copy()
        im_nan[:5, :] = np.nan
        assert np.isclose(
            metrics.normalized_cross_correlation(im_nan, im_nan.copy()),
            1.0,
        )


def test_tile_pair_metrics_custom_metric_and_tolerance():
    """Custom metric funcs dispatch per edge; max_tolerance shrinks the
    compared overlap (reference test_metrics.py:251, :281)."""
    rng = np.random.default_rng(6)
    full = rng.random((40, 70)).astype(np.float32)
    sims = [
        si_utils.get_sim_from_array(
            full[:, :40].copy(), translation={"y": 0.0, "x": 0.0}
        ),
        si_utils.get_sim_from_array(
            full[:, 30:].copy(), translation={"y": 0.0, "x": 30.0}
        ),
    ]
    for s in sims:
        si_utils.set_sim_affine(s, np.eye(3), transform_key="registered")
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]

    calls = {}

    def my_metric(a, b):
        calls["shapes"] = (a.shape, b.shape)
        return float(np.nanmean(np.abs(a - b)))

    res = metrics.tile_pair_image_metrics(
        msims,
        base_transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        query_transform_keys=["registered"],
        metric_funcs={"mad": my_metric},
        max_tolerance=2.0,
    )
    assert "shapes" in calls
    pairs = res["pairs"]
    assert pairs, "no overlapping pairs evaluated"
    for _pair, per_key in pairs.items():
        # identical overlapping data: mean abs difference ~0
        assert per_key["registered"]["mad"] < 1e-5
    assert "mad" in res["summary"]["registered"]


def test_tile_pair_metrics_importable_ssim():
    """metrics.structural_similarity is importable as a metric_funcs entry
    (reference docs use skimage's structural_similarity the same way,
    reference metrics.py:455-473) and handles NaN-masked overlap arrays."""
    rng = np.random.default_rng(7)
    full = rng.random((40, 70)).astype(np.float32)
    sims = [
        si_utils.get_sim_from_array(
            full[:, :40].copy(), translation={"y": 0.0, "x": 0.0}
        ),
        si_utils.get_sim_from_array(
            full[:, 30:].copy(), translation={"y": 0.0, "x": 30.0}
        ),
    ]
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    res = metrics.tile_pair_image_metrics(
        msims,
        base_transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        query_transform_keys=[si_utils.DEFAULT_TRANSFORM_KEY],
        metric_funcs={
            "ncc": metrics.normalized_cross_correlation,
            "ssim": metrics.structural_similarity,
        },
        max_tolerance=2.0,
    )
    assert res["pairs"]
    for per_key in res["pairs"].values():
        vals = per_key[si_utils.DEFAULT_TRANSFORM_KEY]
        # identical overlapping data: both metrics near 1
        assert vals["ssim"] > 0.99
        assert vals["ncc"] > 0.99
    # direct NaN handling: all-NaN returns NaN, partial NaN stays finite
    assert np.isnan(
        metrics.structural_similarity(
            np.full((20, 20), np.nan), np.full((20, 20), np.nan)
        )
    )
    a = rng.random((30, 30)).astype(np.float32)
    b = a + 0.01 * rng.random((30, 30)).astype(np.float32)
    a[:5] = np.nan
    b[:5] = np.nan
    v = metrics.structural_similarity(a, b)
    assert np.isfinite(v) and v > 0.5


def test_tile_pair_image_metrics_return_structure():
    """Return contract: pairs keyed by directed tuples with per-key metric
    dicts, plus a volume-weighted summary (reference test_metrics.py:217);
    a single string query key is accepted like a one-element list."""
    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_c=1, N_t=1, tile_size=40, tiles_x=2, tiles_y=1,
        overlap=10, zoom=4, shift_scale=0.0, drift_scale=0.0,
        transform_key="gt",
    )
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    result = metrics.tile_pair_image_metrics(
        msims,
        base_transform_key="gt",
        query_transform_keys="gt",  # single str, not list
        metric_funcs={"ncc": metrics.normalized_cross_correlation},
    )
    assert set(result) >= {"pairs", "summary"}
    assert len(result["pairs"]) == 1  # bidirectional=False -> one edge
    ((pair, pair_metrics),) = result["pairs"].items()
    assert isinstance(pair, tuple) and len(pair) == 2
    val = pair_metrics["gt"]["ncc"]
    assert isinstance(val, (float, np.floating))
    assert "ncc" in result["summary"]["gt"]


def test_tile_pair_image_metrics_spacing_and_tolerance_kwargs():
    """Explicit comparison spacing and max_tolerance shrink run fine
    (reference test_metrics.py:281/:302)."""
    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_c=1, N_t=1, tile_size=60, tiles_x=2, tiles_y=1,
        overlap=20, zoom=6, shift_scale=0.0, drift_scale=0.0,
        transform_key="gt",
    )
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    r_tol = metrics.tile_pair_image_metrics(
        msims, base_transform_key="gt", query_transform_keys=["gt"],
        max_tolerance=1.0,
    )
    assert len(r_tol["pairs"]) == 1
    r_sp = metrics.tile_pair_image_metrics(
        msims, base_transform_key="gt", query_transform_keys=["gt"],
        spacing={"y": 1.0, "x": 1.0},
    )
    assert len(r_sp["pairs"]) == 1
    # identical geometry under either kwarg: NCC of gt vs itself stays high
    for r in (r_tol, r_sp):
        assert r["summary"]["gt"]["ncc"] > 0.9


def test_tile_pair_image_metrics_bidirectional_doubles_pairs():
    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_c=1, N_t=1, tile_size=40, tiles_x=2, tiles_y=1,
        overlap=10, zoom=4, shift_scale=0.0, drift_scale=0.0,
        transform_key="gt",
    )
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    r = metrics.tile_pair_image_metrics(
        msims, base_transform_key="gt", query_transform_keys=["gt"],
        bidirectional=True,
    )
    assert len(r["pairs"]) == 2
    assert set(r["pairs"]) == {(0, 1), (1, 0)}


class TestMvDeconvReferenceScenarios:
    """Deconvolution scenarios mirrored from reference
    _tests/test_bayesian_fusion.py:54-224."""

    @staticmethod
    def _make_views(n_views, shape, seed=0):
        rng = np.random.default_rng(seed)
        gt = rng.poisson(100, shape).astype(np.float32)
        views = np.stack(
            [
                np.clip(gt + rng.normal(0, 5, shape), 0, None)
                for _ in range(n_views)
            ]
        ).astype(np.float32)
        weights = np.ones((n_views, *shape), dtype=np.float32) / n_views
        return views, weights

    def test_3d(self):
        views, weights = self._make_views(2, (8, 24, 24))
        out = mv_deconv.multi_view_deconvolution(
            views, weights, n_iterations=2
        )
        assert out.shape == (8, 24, 24)
        assert np.all(np.isfinite(out))

    def test_explicit_differing_psfs_are_padded_to_common_shape(self):
        views, weights = self._make_views(2, (32, 32))
        psfs = [
            mv_deconv.make_gaussian_psf(1.0, ndim=2),
            mv_deconv.make_gaussian_psf(2.0, ndim=2),
        ]
        assert psfs[0].shape != psfs[1].shape
        out = mv_deconv.multi_view_deconvolution(
            views, weights, psfs=psfs, n_iterations=3
        )
        assert out.shape == (32, 32)
        assert np.all(np.isfinite(out))

    def test_wrong_psf_count_raises(self):
        views, weights = self._make_views(3, (16, 16))
        psfs = [mv_deconv.make_gaussian_psf(1.5, ndim=2)]
        with pytest.raises(ValueError, match="n_views"):
            mv_deconv.multi_view_deconvolution(
                views, weights, psfs=psfs, n_iterations=1
            )

    def test_tikhonov_regularization(self):
        views, weights = self._make_views(2, (24, 24))
        out = mv_deconv.multi_view_deconvolution(
            views, weights, n_iterations=3, lambda_reg=1e-3
        )
        assert out.shape == (24, 24)
        assert np.all(np.isfinite(out))

    def test_nan_views_do_not_pollute_result(self):
        """NaN padding outside a view's FOV must not leak into the output
        (reference test_bayesian_fusion.py:102)."""
        views, weights = self._make_views(2, (32, 32))
        views[0, :, 16:] = np.nan
        weights[0, :, 16:] = 0.0
        weights[1, :, 16:] = 1.0
        out = mv_deconv.multi_view_deconvolution(
            views, weights, n_iterations=3
        )
        assert np.all(np.isfinite(out))

    def test_output_spacing_estimates_psf(self):
        views, weights = self._make_views(2, (24, 24))
        out = mv_deconv.multi_view_deconvolution(
            views,
            weights,
            output_spacing={"y": 0.5, "x": 0.5},
            na=0.8,
            wavelength_um=0.5,
            n_iterations=2,
        )
        assert out.shape == (24, 24)

    @pytest.mark.parametrize("ndim", [2, 3])
    def test_fuse_pipeline(self, ndim):
        """Deconvolution as fusion_func over the tiled sample dataset keeps
        dtype and produces finite values (reference :129-148)."""
        sims = sample_data.generate_tiled_dataset(
            ndim=ndim, N_t=1, N_c=1, tile_size=20,
            tiles_x=2, tiles_y=2, tiles_z=1, overlap=4,
        )
        fused = fusion.fuse(
            sims,
            transform_key="affine_metadata",
            fusion_func=mv_deconv.multi_view_deconvolution,
            fusion_func_kwargs={"n_iterations": 3},
        )
        out = fused.to_numpy()
        assert out.dtype == sims[0].dtype
        assert np.all(np.isfinite(out))

    def test_no_tile_border_artefacts(self):
        """Joint deconvolution must not introduce seam-localized jumps at
        tile borders relative to per-tile deconvolution
        (reference test_bayesian_fusion.py:151-224)."""
        np.random.seed(0)
        tile_size, overlap = 40, 30
        sims = sample_data.generate_tiled_dataset(
            ndim=2, N_c=1, N_t=1, overlap=overlap, tile_size=tile_size,
            tiles_x=2, tiles_y=1, tiles_z=1,
            shift_scale=0, drift_scale=0, zoom=10,
        )

        independently_deconvolved = []
        for sim in sims:
            dec = fusion.fuse(
                [sim],
                fusion_func=mv_deconv.multi_view_deconvolution,
                transform_key="affine_metadata",
            )
            independently_deconvolved.append(
                si_utils.get_sim_from_array(
                    dec.to_numpy(),
                    dims=list(dec.dims),
                    scale=si_utils.get_spacing_from_sim(sim),
                    translation=si_utils.get_origin_from_sim(sim),
                )
            )

        fused_independent = fusion.fuse(
            independently_deconvolved, transform_key="affine_metadata"
        )
        fused_joint = fusion.fuse(
            sims,
            fusion_func=mv_deconv.multi_view_deconvolution,
            transform_key="affine_metadata",
        )

        ind = np.asarray(fused_independent.to_numpy(), dtype=np.float64)
        joint = np.asarray(fused_joint.to_numpy(), dtype=np.float64)
        # collapse leading non-spatial dims, then mean over y -> x profile
        profiles = np.array(
            [
                ind.reshape(-1, *ind.shape[-2:]).mean(0).mean(0),
                joint.reshape(-1, *joint.shape[-2:]).mean(0).mean(0),
            ]
        )
        border_ids = np.array(
            [
                tile_size - overlap,
                tile_size,
                tile_size - overlap - 1,
                tile_size - 1,
            ]
        )
        overlap_region_ids = np.arange(
            tile_size - overlap + 5, tile_size - 5
        )
        border_diffs = np.abs(
            profiles[0][border_ids] - profiles[1][border_ids]
        )
        mean_overlap_diff = np.mean(
            np.abs(
                profiles[0][overlap_region_ids]
                - profiles[1][overlap_region_ids]
            )
        )
        assert np.all(border_diffs <= 2 * mean_overlap_diff), (
            f"border_diffs={border_diffs}, "
            f"mean_overlap_diff={mean_overlap_diff}"
        )
