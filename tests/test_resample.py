import numpy as np
import pytest
from scipy.ndimage import affine_transform as scipy_affine_transform

from multiview_stitcher_tpu import param_utils, si_utils, transformation
from multiview_stitcher_tpu.ops import resample as resample_ops


@pytest.mark.parametrize("ndim", [2, 3])
@pytest.mark.parametrize("order", [0, 1])
def test_affine_resample_matches_scipy(ndim, order):
    rng = np.random.default_rng(0)
    shape = (12, 14) if ndim == 2 else (8, 10, 12)
    data = rng.random(shape).astype(np.float32)
    matrix = np.eye(ndim) + rng.normal(0, 0.05, (ndim, ndim))
    offset = rng.normal(0, 2, ndim)
    out_shape = tuple(s + 3 for s in shape)

    ours = np.asarray(
        resample_ops.affine_resample(
            data, matrix, offset, out_shape, order=order, cval=np.nan
        )
    )
    ref = scipy_affine_transform(
        data, matrix, offset=offset, output_shape=out_shape, order=order,
        mode="constant", cval=np.nan,
    )
    ours_nan = np.isnan(ours)
    ref_nan = np.isnan(ref)
    # identical invalid-region footprint
    np.testing.assert_array_equal(ours_nan, ref_nan)
    np.testing.assert_allclose(
        ours[~ours_nan], ref[~ref_nan], rtol=1e-5, atol=1e-5
    )


def test_affine_resample_cval_zero_matches_scipy():
    rng = np.random.default_rng(1)
    data = rng.random((9, 9)).astype(np.float32)
    matrix = np.eye(2)
    offset = np.array([-2.5, 3.25])
    ours = np.asarray(
        resample_ops.affine_resample(data, matrix, offset, (12, 12), order=1, cval=0.0)
    )
    ref = scipy_affine_transform(
        data, matrix, offset=offset, output_shape=(12, 12), order=1,
        mode="constant", cval=0.0,
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_identity_is_exact():
    data = np.random.random((6, 7)).astype(np.float32)
    out = np.asarray(
        resample_ops.affine_resample(data, np.eye(2), np.zeros(2), (6, 7))
    )
    np.testing.assert_array_equal(out, data)


def test_batched_matches_single():
    rng = np.random.default_rng(2)
    data = rng.random((4, 8, 8)).astype(np.float32)
    mats = np.tile(np.eye(2), (4, 1, 1))
    offs = rng.normal(0, 1, (4, 2))
    batched = np.asarray(
        resample_ops.affine_resample_batch(data, mats, offs, (8, 8))
    )
    for i in range(4):
        single = np.asarray(
            resample_ops.affine_resample(data[i], mats[i], offs[i], (8, 8))
        )
        np.testing.assert_array_equal(batched[i], single)


class TestTransformSim:
    def test_transform_sim_translation_physical(self):
        """A physical translation of an image resamples as expected."""
        data = np.zeros((10, 10), dtype=np.float32)
        data[4, 4] = 1.0
        sim = si_utils.get_sim_from_array(
            data, scale={"y": 2.0, "x": 2.0}, translation={"y": 0.0, "x": 0.0}
        )
        # p maps output physical -> input physical; shifting content by +2 phys
        # units means sampling input at out_phys - 2.
        p = param_utils.affine_from_translation([-2.0, -2.0])
        out = transformation.transform_sim(
            sim,
            p=p,
            output_stack_properties={
                "origin": {"y": 0.0, "x": 0.0},
                "spacing": {"y": 2.0, "x": 2.0},
                "shape": {"y": 10, "x": 10},
            },
            cval=0.0,
        )
        out_np = np.asarray(out.data)
        assert out_np[5, 5] == 1.0

    def test_transform_sim_noop_passthrough(self):
        data = np.random.random((5, 5)).astype(np.float32)
        sim = si_utils.get_sim_from_array(data)
        out = transformation.transform_sim(
            sim,
            p=np.eye(3),
            output_stack_properties=si_utils.get_stack_properties_from_sim(sim),
        )
        np.testing.assert_array_equal(np.asarray(out.data), data)

    def test_matches_scipy_composition(self):
        """Physical-space resampling equals scipy with converted params."""
        rng = np.random.default_rng(3)
        data = rng.random((16, 16)).astype(np.float32)
        sim = si_utils.get_sim_from_array(
            data, scale={"y": 0.5, "x": 0.5}, translation={"y": 3.0, "x": -1.0}
        )
        p = param_utils.random_affine(2, translation_scale=2, rotation_scale=0.1)
        osp = {
            "origin": {"y": 2.0, "x": -2.0},
            "spacing": {"y": 0.6, "x": 0.7},
            "shape": {"y": 14, "x": 18},
        }
        out = np.asarray(transformation.transform_sim(sim, p=p, output_stack_properties=osp, cval=0.0).data)

        matrix, offset = resample_ops.physical_to_pixel_params(
            p,
            input_spacing=np.array([0.5, 0.5]),
            input_origin=np.array([3.0, -1.0]),
            output_spacing=np.array([0.6, 0.7]),
            output_origin=np.array([2.0, -2.0]),
        )
        ref = scipy_affine_transform(
            data, matrix, offset=offset, output_shape=(14, 18), order=1,
            mode="constant", cval=0.0,
        )
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_separable_matches_gather_resample():
    """Axis-aligned banded-matmul resample == general gather resample."""
    rng = np.random.default_rng(7)
    data = rng.random((20, 24)).astype(np.float32)
    diag = np.array([0.8, 1.3], dtype=np.float32)
    offset = np.array([-2.3, 4.75], dtype=np.float32)
    out_shape = (25, 18)
    sep = np.asarray(
        resample_ops.separable_axis_aligned_resample(
            data, diag, offset, out_shape, cval=np.nan
        )
    )
    gat = np.asarray(
        resample_ops.affine_resample(
            data, np.diag(diag), offset, out_shape, order=1, cval=np.nan
        )
    )
    np.testing.assert_array_equal(np.isnan(sep), np.isnan(gat))
    m = ~np.isnan(sep)
    np.testing.assert_allclose(sep[m], gat[m], rtol=1e-5, atol=1e-5)


def test_separable_valid_extent():
    data = np.zeros((10, 10), dtype=np.float32)
    out = np.asarray(
        resample_ops.separable_axis_aligned_resample(
            data,
            np.ones(2, dtype=np.float32),
            np.zeros(2, dtype=np.float32),
            (10, 10),
            cval=np.nan,
            valid_extent=np.array([6.0, 10.0]),
        )
    )
    assert np.isnan(out[6:]).all()
    assert not np.isnan(out[:6]).any()


def test_pixel_params_center_large_origins_and_preserve_small_scale():
    """A tiny genuine scale change on a huge world origin must survive the
    physical->pixel conversion: centered arithmetic (Oy - Ox and
    (A - I) @ Ox) keeps the small residual that evaluating
    A @ origin + offset - origin directly would round to zero, and the
    near-integer offset snap must not erase it (reference
    _tests/test_transformation.py:41-87)."""
    origin = 1e12
    scale_change = 1e-8
    p = np.eye(3)
    p[1, 1] += scale_change
    p[1, 2] = -10000.0

    matrix, offset = resample_ops.physical_to_pixel_params(
        p,
        input_spacing=np.array([1.0, 1.0]),
        input_origin=np.array([origin, origin]),
        output_spacing=np.array([1.0, 1.0]),
        output_origin=np.array([origin, origin]),
    )
    # the near-identity scale is genuine and must not be snapped to one
    assert matrix[1, 1] == p[1, 1]

    expected_offset = (p[1, 1] - 1.0) * origin - 10000.0
    direct_offset = p[1, 1] * origin - 10000.0 - origin
    assert direct_offset == 0.0
    assert expected_offset != 0.0
    np.testing.assert_allclose(offset[1], expected_offset, atol=1e-8)
