"""Phase-correlation kernel tests against float64 numpy oracles.

The numpy oracle reimplements the published Guizar-Sicairos upsampled-DFT
algorithm (same semantics as skimage.registration.phase_cross_correlation,
which is not available in this environment).
"""

import numpy as np
import pytest
from scipy.ndimage import shift as scipy_shift

from multiview_stitcher_tpu.ops import phase_correlation as pc


# ----- numpy oracle ---------------------------------------------------------


def _np_upsampled_dft(data, ups_size, upsample_factor, axis_offsets):
    im2pi = 1j * 2 * np.pi
    dim_properties = list(zip(data.shape, axis_offsets))
    for n_items, ax_offset in dim_properties[::-1]:
        kernel = (np.arange(ups_size) - ax_offset)[:, None] * np.fft.fftfreq(
            n_items, upsample_factor
        )
        kernel = np.exp(-im2pi * kernel)
        data = np.tensordot(kernel, data, axes=(1, -1))
    return data


def np_phase_cross_correlation(ref, mov, upsample_factor=1, normalization="phase"):
    src_freq = np.fft.fftn(ref)
    target_freq = np.fft.fftn(mov)
    image_product = src_freq * target_freq.conj()
    if normalization == "phase":
        eps = np.finfo(image_product.real.dtype).eps
        image_product /= np.maximum(np.abs(image_product), 100 * eps)
    cross_correlation = np.fft.ifftn(image_product)
    maxima = np.unravel_index(
        np.argmax(np.abs(cross_correlation)), cross_correlation.shape
    )
    midpoint = np.array([np.fix(s / 2) for s in ref.shape])
    shift = np.stack(maxima).astype(np.float64)
    shift[shift > midpoint] -= np.array(ref.shape)[shift > midpoint]
    if upsample_factor > 1:
        shift = np.round(shift * upsample_factor) / upsample_factor
        ups_size = int(np.ceil(upsample_factor * 1.5))
        dftshift = np.fix(ups_size / 2.0)
        sample_region_offset = dftshift - shift * upsample_factor
        cc = _np_upsampled_dft(
            image_product.conj(), ups_size, upsample_factor,
            sample_region_offset,
        ).conj()
        maxima = np.unravel_index(np.argmax(np.abs(cc)), cc.shape)
        maxima = np.stack(maxima).astype(np.float64) - dftshift
        shift = shift + maxima / upsample_factor
    return shift


def _shifted_pair(shape, shift, seed=0):
    """Exact (Fourier-domain) subpixel shift of a broadband pattern."""
    rng = np.random.default_rng(seed)
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(rng.random([s + 20 for s in shape]), 1.0)
    freqs = np.meshgrid(
        *[np.fft.fftfreq(s) for s in base.shape], indexing="ij"
    )
    phase = np.exp(
        -2j * np.pi * sum(f * s for f, s in zip(freqs, shift))
    )
    shifted = np.fft.ifftn(np.fft.fftn(base) * phase).real
    crop0 = tuple(slice(10, 10 + s) for s in shape)
    return base[crop0].astype(np.float64), shifted[crop0].astype(np.float64)


# ----- tests ----------------------------------------------------------------


@pytest.mark.parametrize("normalization", ["phase", None])
@pytest.mark.parametrize("upsample_factor", [1, 10])
def test_matches_numpy_oracle_2d(normalization, upsample_factor):
    ref, mov = _shifted_pair((64, 80), (3.0, -5.0))
    expected = np_phase_cross_correlation(
        ref, mov, upsample_factor, normalization
    )
    got, _ = pc.phase_cross_correlation(
        ref, mov, upsample_factor=upsample_factor, normalization=normalization
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-9)


@pytest.mark.parametrize("upsample_factor", [2])
def test_matches_numpy_oracle_3d(upsample_factor):
    ref, mov = _shifted_pair((24, 32, 40), (1.0, -2.0, 3.0))
    expected = np_phase_cross_correlation(ref, mov, upsample_factor, "phase")
    got, _ = pc.phase_cross_correlation(
        ref, mov, upsample_factor=upsample_factor
    )
    np.testing.assert_allclose(np.asarray(got), expected, atol=1e-9)


def test_recovers_subpixel_shift():
    true_shift = (2.6, -3.4)
    ref, mov = _shifted_pair((96, 96), true_shift)
    got, _ = pc.phase_cross_correlation(ref, mov, upsample_factor=10)
    # convention: the shift to apply to mov to register it with ref, i.e.
    # -s when mov content was moved by +s
    np.testing.assert_allclose(np.asarray(got), [-t for t in true_shift], atol=0.15)


def test_batched_matches_single():
    pairs = [_shifted_pair((48, 48), (i + 0.5, -i), seed=i) for i in range(4)]
    refs = np.stack([p[0] for p in pairs])
    movs = np.stack([p[1] for p in pairs])
    batch_shifts, _ = pc.phase_cross_correlation_batch(
        refs, movs, upsample_factor=10
    )
    for i in range(4):
        single, _ = pc.phase_cross_correlation(
            refs[i], movs[i], upsample_factor=10
        )
        np.testing.assert_allclose(
            np.asarray(batch_shifts[i]), np.asarray(single), atol=1e-12
        )


def test_masked_recovers_shift_with_invalid_border():
    true_shift = (4.0, -6.0)
    ref, mov = _shifted_pair((72, 72), true_shift, seed=3)
    m_ref = np.ones_like(ref, dtype=bool)
    m_mov = np.ones_like(mov, dtype=bool)
    # knock out a border region
    m_ref[:10] = False
    m_mov[:, :12] = False
    got, peak = pc.masked_phase_cross_correlation(ref, mov, m_ref, m_mov)
    np.testing.assert_allclose(
        np.asarray(got), [-t for t in true_shift], atol=0.6
    )
    assert peak > 0.5


def test_rescale_intensity():
    x = np.array([0.0, 5.0, 10.0, np.nan])
    out = np.asarray(pc.rescale_intensity(x, in_range=(0, 10)))
    np.testing.assert_allclose(out[:3], [0, 0.5, 1.0])
    assert np.isnan(out[3])


class TestMetrics:
    def test_spearman_matches_scipy(self):
        from scipy import stats

        from multiview_stitcher_tpu.ops import image_metrics as im

        rng = np.random.default_rng(0)
        # quantized data -> ties
        a = np.round(rng.random(500) * 20)
        b = np.round(rng.random(500) * 20) + 0.3 * a
        mask = rng.random(500) > 0.3
        expected = stats.spearmanr(a[mask], b[mask]).correlation
        got = float(im.masked_spearman(a, b, mask))
        np.testing.assert_allclose(got, expected, atol=1e-10)

    def test_ssim_box_equals_sliced(self):
        """Full-map SSIM averaged over a box interior == SSIM of the slice."""
        from multiview_stitcher_tpu.ops import image_metrics as im

        rng = np.random.default_rng(1)
        a = rng.random((60, 60))
        b = a + rng.normal(0, 0.05, (60, 60))
        lo = np.array([8, 12])
        hi = np.array([51, 47])

        got = float(
            im.ssim_mean_over_box(
                a, b, lo, hi, win_size=7, data_range=1.0
            )
        )
        # oracle: slice then compute SSIM map on slice, crop pad, mean
        a_s = a[8:52, 12:48]
        b_s = b[8:52, 12:48]
        smap = np.asarray(im.ssim_map(a_s, b_s, 7, 1.0))
        pad = 3
        expected = smap[pad:-pad, pad:-pad].mean()
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_ncc_nan_aware(self):
        from multiview_stitcher_tpu.ops import image_metrics as im

        rng = np.random.default_rng(2)
        a = rng.random((30, 30))
        b = 2 * a + 1
        a[:5] = np.nan
        val = float(im.nan_aware_ncc(a, b))
        np.testing.assert_allclose(val, 1.0, atol=1e-6)
