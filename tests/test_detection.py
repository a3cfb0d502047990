import numpy as np
import pytest

from multiview_stitcher_tpu import detection, msi_utils, registration, si_utils


def _bead_image(shape=(120, 140), positions=None, sigma=1.5, seed=0):
    rng = np.random.default_rng(seed)
    if positions is None:
        positions = rng.uniform(10, np.array(shape) - 10, (15, 2))
    img = np.zeros(shape, dtype=np.float32)
    yy, xx = np.mgrid[: shape[0], : shape[1]]
    for p in positions:
        img += 100 * np.exp(
            -((yy - p[0]) ** 2 + (xx - p[1]) ** 2) / (2 * sigma**2)
        )
    img += rng.normal(0, 0.5, shape).astype(np.float32)
    return img, np.asarray(positions)


def test_log_detect_finds_beads():
    img, positions = _bead_image()
    labels = detection.log_detect(
        img, spacing=(1.0, 1.0), target_size_physical=4.0
    )
    assert labels.max() >= len(positions) * 0.8
    # each detection should be near a true bead
    from scipy import ndimage

    ids = np.unique(labels)
    ids = ids[ids > 0]
    centroids = np.asarray(
        ndimage.center_of_mass(labels, labels=labels, index=ids)
    )
    from scipy.spatial import cKDTree

    d, _ = cKDTree(positions).query(centroids)
    assert np.median(d) < 1.5


def test_detect_beads_physical_coords_and_chunking():
    img, positions = _bead_image(shape=(100, 100), seed=1)
    sim = si_utils.get_sim_from_array(
        img, scale={"y": 0.5, "x": 0.5}, translation={"y": 5.0, "x": -2.0}
    )
    msim = msi_utils.get_msim_from_sim(sim, scale_factors=[])
    # absolute threshold so per-chunk thresholds match the whole-image run
    kwargs = {"target_size_physical": 2.0, "threshold_abs": 5.0}
    pts_whole = detection.detect_beads(
        msim, detection_func_kwargs=kwargs
    )
    pts_chunked = detection.detect_beads(
        msim, detection_func_kwargs=kwargs, chunksize=40
    )
    assert len(pts_whole) > 5
    # chunked detection with halo dedup finds the same beads
    from scipy.spatial import cKDTree

    assert abs(len(pts_whole) - len(pts_chunked)) <= 1
    d, _ = cKDTree(pts_whole).query(pts_chunked)
    assert np.median(d) < 0.5
    # physical coords: convert back to pixel indices and compare to truth
    pix = (pts_whole - np.array([5.0, -2.0])) / 0.5
    d2, _ = cKDTree(positions).query(pix)
    assert np.median(d2) < 1.5


class TestMarkerRegistration:
    def _point_pair(self, shift=(4.0, -6.0), n=40, seed=0):
        rng = np.random.default_rng(seed)
        fixed = rng.uniform(0, 100, (n, 2))
        moving = fixed + np.asarray(shift)
        return fixed, moving

    def test_translation_recovery(self):
        fixed, moving = self._point_pair()
        result = registration.registration_marker_based(
            fixed, moving, transform_type="translation"
        )
        np.testing.assert_allclose(
            result["affine_matrix"][:2, 2], [4.0, -6.0], atol=1e-6
        )
        assert result["quality"] > 0.5

    def test_rigid_recovery(self):
        rng = np.random.default_rng(1)
        fixed = rng.uniform(0, 100, (50, 2))
        theta = 0.1
        R = np.array(
            [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
        )
        moving = fixed @ R.T + np.array([3.0, 1.0])
        result = registration.registration_marker_based(
            fixed, moving, transform_type="rigid"
        )
        M = result["affine_matrix"]
        np.testing.assert_allclose(M[:2, :2], R, atol=1e-6)
        np.testing.assert_allclose(M[:2, 2], [3.0, 1.0], atol=1e-6)

    def test_with_outliers_and_partial_overlap(self):
        rng = np.random.default_rng(2)
        fixed = rng.uniform(0, 100, (60, 2))
        # all fixed points present (shifted) + clutter detections in moving
        moving = np.concatenate(
            [fixed + np.array([2.0, 5.0]), rng.uniform(0, 100, (10, 2))]
        )
        result = registration.registration_marker_based(
            fixed, moving, transform_type="translation",
            ransac_min_inlier_ratio=0.05,
        )
        np.testing.assert_allclose(
            result["affine_matrix"][:2, 2], [2.0, 5.0], atol=0.15
        )

    def test_failure_returns_identity_when_not_failing(self):
        rng = np.random.default_rng(3)
        fixed = rng.uniform(0, 100, (10, 2))
        moving = rng.uniform(0, 100, (10, 2))
        with pytest.warns(UserWarning):
            result = registration.registration_marker_based(
                fixed, moving, transform_type="rigid", fail_on_error=False
            )
        if np.isnan(result["quality"]):
            np.testing.assert_allclose(result["affine_matrix"], np.eye(3))

    def test_marker_registration_through_register(self):
        """End-to-end: bead point sets drive register() via signature dispatch."""
        rng = np.random.default_rng(4)
        shift = np.array([1.5, -2.5])
        beads0 = rng.uniform(5, 95, (40, 2))
        img = np.zeros((100, 100), dtype=np.float32)
        sims = []
        for i, offset in enumerate([np.zeros(2), shift]):
            sim = si_utils.get_sim_from_array(
                img.copy(), translation={"y": 0.0, "x": 0.0}
            )
            # view 1's metadata is off by `shift`: its beads appear displaced
            si_utils.set_point_set(sim, beads0 + offset, points_key="beads")
            sims.append(sim)
        msims = [
            msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims
        ]
        for m, s in zip(msims, sims):
            msi_utils.set_point_set(
                m, s.attrs["point_sets"]["beads"], points_key="beads"
            )
        params = registration.register(
            msims,
            transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
            pairwise_reg_func=registration.registration_marker_based,
            pairwise_reg_func_kwargs={"transform_type": "translation"},
            pre_registration_pruning_method=None,
        )
        # resolved param for view 1 cancels the bead displacement
        m = np.asarray(params[1].squeeze())
        np.testing.assert_allclose(m[:2, 2], -shift, atol=0.05)


def test_detect_beads_custom_detection_func():
    """detect_beads plugs a user detection function per chunk and returns
    intrinsic physical positions (reference test_detection.py:126)."""
    img = np.zeros((64, 64), np.float32)
    img[10, 12] = img[40, 50] = 100.0
    sim = si_utils.get_sim_from_array(
        img, dims=("y", "x"), scale={"y": 0.5, "x": 2.0},
        translation={"y": 0.0, "x": 0.0},
    )

    calls = {"n": 0}

    def my_detect(image, spacing=None, threshold=50.0):
        from scipy.ndimage import label

        calls["n"] += 1
        return label(np.asarray(image) > threshold)[0]

    pts = detection.detect_beads(
        sim, detection_func=my_detect, chunksize=32,
        detection_overlap=4,
    )
    assert calls["n"] >= 1
    assert len(pts) == 2
    got = set(map(tuple, np.round(np.asarray(pts), 3)))
    # intrinsic PHYSICAL coords: index * spacing
    assert (10 * 0.5, 12 * 2.0) in got
    assert (40 * 0.5, 50 * 2.0) in got


def test_detect_beads_max_detection_spacing_selects_coarse_level():
    """max_detection_spacing routes detection to a coarser pyramid level
    (reference test_detection.py:195)."""
    rng = np.random.default_rng(0)
    img = rng.random((128, 128)).astype(np.float32)
    img[40:43, 60:63] += 30.0
    sim = si_utils.get_sim_from_array(img, dims=("y", "x"))
    msim = msi_utils.get_msim_from_sim(sim, scale_factors=[2])

    seen = {}

    def probing_detect(image, spacing=None):
        seen["shape"] = np.asarray(image).shape
        seen["spacing"] = spacing
        return np.zeros(np.asarray(image).shape, dtype=np.int32)

    detection.detect_beads(
        msim, detection_func=probing_detect,
        max_detection_spacing=2.0, chunksize=256,
    )
    # the coarse level (spacing 2) was handed to the detector
    assert max(seen["shape"]) <= 64 + 16  # level-1 size (+halo)


def test_detect_beads_required_overlap_declared():
    """log_detect declares required_overlap (a function of target size
    and spacing) so chunked detection dedups border beads exactly once
    (reference detection.py:137)."""
    from multiview_stitcher_tpu.utils import misc as misc_utils

    ov = misc_utils.get_required_overlap(
        detection.log_detect,
        {"target_size_physical": 6.0, "spacing": {"y": 1.0, "x": 2.0}},
    )
    assert ov and all(v > 0 for v in ov.values())


def test_required_overlap_dict_keys_align_by_axis():
    """Dict target sizes pair with spacing BY KEY, not by insertion
    order: {'x': 8, 'y': 2} against spacing {'y': 1, 'x': 4} must give
    y->2px, x->2px regardless of either dict's ordering (review finding:
    order-based zipping silently computed sizes against the wrong
    axis's spacing, under-sizing dedup halos)."""
    from multiview_stitcher_tpu.utils import misc as misc_utils

    spacing = {"y": 1.0, "x": 4.0}
    a = misc_utils.get_required_overlap(
        detection.log_detect,
        {"target_size_physical": {"x": 8.0, "y": 2.0}, "spacing": spacing},
    )
    b = misc_utils.get_required_overlap(
        detection.log_detect,
        {"target_size_physical": {"y": 2.0, "x": 8.0}, "spacing": spacing},
    )
    assert a == b
    # both axes resolve to 2 px -> identical per-axis overlaps
    assert a["y"] == a["x"]
    with pytest.raises(TypeError, match="must match spacing keys"):
        misc_utils.get_required_overlap(
            detection.log_detect,
            {"target_size_physical": {"z": 8.0}, "spacing": spacing},
        )


def test_log_detect_dict_spacing_with_max_neigh_options():
    """Dict spacing works through the max-neigh filtering options too
    (the sigma/sample sizes pair with spacing BY KEY)."""
    rng = np.random.default_rng(0)
    img = np.zeros((48, 48), np.float32)
    for y, x in [(12, 12), (30, 35)]:
        img[y, x] = 100.0
    from scipy.ndimage import gaussian_filter

    img = gaussian_filter(img, 1.5) + rng.normal(0, 0.01, img.shape)
    spacing = {"y": 1.0, "x": 2.0}
    labels = detection.log_detect(
        img,
        spacing=spacing,
        target_size_physical={"x": 8.0, "y": 4.0},
        max_neigh_intensity=1e9,
        max_neigh_sigma={"x": 4.0, "y": 2.0},
        max_neigh_sample_size={"x": 8.0, "y": 4.0},
    )
    assert labels.max() == 2
