import numpy as np
import pytest

from multiview_stitcher_tpu import fusion, registration, si_utils, weights


def _two_tiles():
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter

    full = (gaussian_filter(rng.random((60, 100)), 1.5) * 100).astype(
        np.float32
    )
    t0, t1 = full[:, :60], full[:, 40:]
    return full, [
        si_utils.get_sim_from_array(t0, translation={"y": 0.0, "x": 0.0}),
        si_utils.get_sim_from_array(t1, translation={"y": 0.0, "x": 40.0}),
    ]


def test_content_based_weights_through_fuse():
    full, sims = _two_tiles()
    fused = fusion.fuse(
        sims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        weights_func=weights.content_based,
        weights_func_kwargs={"sigma_1": 2, "sigma_2": 4},
    )
    out = fused.to_numpy()
    assert out.shape == full.shape
    # identical source content: result should still match the scene closely
    err = np.abs(out[5:-5, 5:-5] - full[5:-5, 5:-5])
    assert np.median(err) < 5


def test_content_based_dct_weights():
    rng = np.random.default_rng(1)
    views = rng.random((2, 64, 64)).astype(np.float32) * 100
    # view 1 is blurred -> lower DCT entropy -> lower weight
    from scipy.ndimage import gaussian_filter

    views[1] = gaussian_filter(views[1], 3.0)
    w = np.asarray(
        weights.content_based_dct(views, dct_size=16, otf_support_fraction=None)
    )
    assert w.shape == views.shape
    assert np.nanmean(w[0]) > np.nanmean(w[1])


def test_normalize_weights():
    w = np.array([[[2.0]], [[6.0]]])
    out = np.asarray(weights.normalize_weights(w))
    np.testing.assert_allclose(out.sum(axis=0), 1.0)
    np.testing.assert_allclose(out[1][0, 0], 0.75)


def test_pairs_from_sample_masks():
    masks = []
    for x0 in [0.0, 40.0]:
        m = np.zeros((60, 60), dtype=np.float32)
        m[10:50, 5:55] = 1.0
        masks.append(
            si_utils.get_sim_from_array(m, translation={"y": 0.0, "x": x0})
        )
    pairs, fused = registration.get_pairs_from_sample_masks(masks)
    assert (0, 1) in pairs
