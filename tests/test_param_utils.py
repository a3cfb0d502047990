import numpy as np
import pytest

from multiview_stitcher_tpu import param_utils


def test_affine_from_translation():
    M = param_utils.affine_from_translation([1.0, 2.0])
    assert M.shape == (3, 3)
    np.testing.assert_allclose(M[:2, 2], [1.0, 2.0])
    np.testing.assert_allclose(M[:2, :2], np.eye(2))


def test_linear_affine_roundtrip():
    for ndim in [2, 3]:
        A = param_utils.random_affine(ndim=ndim)
        lin = param_utils.linear_affine_from_affine(A)
        A2 = param_utils.affine_from_linear_affine(lin)
        np.testing.assert_allclose(A, A2)


def test_affine_from_rotation():
    M = param_utils.affine_from_rotation(np.pi / 2, [0, 0, 1], point=[1, 1, 0])
    pt = param_utils.transform_pts([[1, 1, 0]], M)[0]
    np.testing.assert_allclose(pt, [1, 1, 0], atol=1e-12)


def test_xaffine_matmul_and_inverse():
    a = param_utils.affine_to_xaffine(param_utils.random_affine(2))
    b = param_utils.affine_to_xaffine(param_utils.random_affine(2))
    ab = param_utils.matmul_xparams(a, b)
    np.testing.assert_allclose(ab.data, a.data @ b.data)
    inv = param_utils.invert_xparams(a)
    np.testing.assert_allclose(
        param_utils.matmul_xparams(inv, a).data, np.eye(3), atol=1e-10
    )


def test_xaffine_time_alignment():
    a = param_utils.affine_to_xaffine(np.eye(3), t_coords=[0, 1, 2])
    a.data[1] = param_utils.affine_from_translation([1, 0])
    b = param_utils.affine_to_xaffine(
        param_utils.affine_from_translation([0, 5]), t_coords=[1, 2, 3]
    )
    ab = param_utils.matmul_xparams(a, b)
    assert list(ab.t_coords) == [1, 2]
    np.testing.assert_allclose(ab.data[0][:2, 2], [1, 5])


def test_rebase_outer_join_fills_identity():
    a = param_utils.affine_to_xaffine(
        param_utils.affine_from_translation([1, 0]), t_coords=[0]
    )
    b = param_utils.affine_to_xaffine(
        param_utils.affine_from_translation([0, 2]), t_coords=[1]
    )
    r = param_utils.rebase_affine(a, b)
    assert list(r.t_coords) == [0, 1]
    np.testing.assert_allclose(r.data[0][:2, 2], [1, 0])
    np.testing.assert_allclose(r.data[1][:2, 2], [0, 2])


def test_expand_affine_dims_2d_to_3d():
    A2 = param_utils.random_affine(2)
    x3 = param_utils.expand_affine_dims(param_utils.affine_to_xaffine(A2), ["z"])
    assert x3.data.shape == (4, 4)
    np.testing.assert_allclose(x3.data[1:3, 1:3], A2[:2, :2])
    np.testing.assert_allclose(x3.data[1:3, 3], A2[:2, 2])
    np.testing.assert_allclose(x3.data[0], [1, 0, 0, 0])


def test_transform_pts_matches_manual():
    A = param_utils.random_affine(3)
    pts = np.random.random((10, 3))
    out = param_utils.transform_pts(pts, A)
    expected = (A[:3, :3] @ pts.T).T + A[:3, 3]
    np.testing.assert_allclose(out, expected, atol=1e-12)
