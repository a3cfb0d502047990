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


def _dct_quality_oracle(views, dct_sizes, otf_support_fraction, exponent=1.0):
    """Per-chunk scipy.fft.dctn oracle mirroring the reference's truncated
    edge-block loop (reference weights.py:203-257)."""
    from scipy.fft import dctn

    spatial_shape = views.shape[1:]
    n_chunks = tuple(
        max(1, int(np.ceil(s / ds)))
        for s, ds in zip(spatial_shape, dct_sizes)
    )
    qmaps = np.zeros((len(views),) + n_chunks, dtype=np.float32)
    if otf_support_fraction is not None:
        r_o = otf_support_fraction * min(dct_sizes)
        freq = np.indices(dct_sizes)
        otf_mask_full = np.sum(freq, axis=0) < r_o
    for iv, view in enumerate(views):
        for ci in np.ndindex(n_chunks):
            sl = tuple(
                slice(c * ds, min((c + 1) * ds, s))
                for c, ds, s in zip(ci, dct_sizes, spatial_shape)
            )
            chunk = view[sl]
            nan_mask = np.isnan(chunk)
            if np.sum(~nan_mask) < 0.2 * chunk.size:
                continue
            if nan_mask.any():
                chunk = chunk.copy()
                fv = float(np.nanmin(chunk))
                chunk[nan_mask] = fv if fv > 0.0001 else 0.0
            d = dctn(chunk, norm="ortho")
            if otf_support_fraction is not None:
                mask = otf_mask_full[tuple(slice(0, s) for s in d.shape)]
                l2 = float(np.sqrt(np.sum(d**2)))
                if l2 == 0.0:
                    continue
                p = np.abs(d[mask]) / l2
                nz = p > 0
                ent = float(-np.sum(p[nz] * np.log2(p[nz])))
                q = (2.0 / r_o**2) * ent
                qmaps[iv][ci] = np.sign(q) * np.abs(q) ** exponent
            else:
                ad = np.abs(d)
                dsl1 = float(ad.mean())
                if dsl1 == 0.0:
                    continue
                p = ad.ravel() / dsl1
                nz = p > 0
                ent = float(-np.dot(p[nz], np.log2(p[nz])))
                qmaps[iv][ci] = (dsl1 * ent) ** exponent
    return qmaps


@pytest.mark.parametrize("otf", [None, 0.5])
def test_dct_entropy_quality_truncates_edge_blocks(otf):
    """Edge blocks use a truncated DCT exactly like the reference's
    per-chunk dctn on the truncated slice (reference weights.py:203-257)."""
    from multiview_stitcher_tpu.ops import filters as filter_ops

    rng = np.random.default_rng(3)
    views = rng.random((2, 50, 70)).astype(np.float32) * 100
    views[0, :10, :12] = np.nan  # NaN region crossing a block
    got = np.asarray(
        filter_ops.dct_entropy_quality(
            views, (32, 32), otf_support_fraction=otf
        )
    )
    want = _dct_quality_oracle(views, (32, 32), otf)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


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
