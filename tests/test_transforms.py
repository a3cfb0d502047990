"""Point-pair transform estimators (transforms.py): translation, rigid
(Umeyama), similarity, affine — the marker-based registration backends
(reference registration.py marker path + skimage estimator API)."""

import numpy as np
import pytest

from multiview_stitcher_tpu import transforms


def _apply(mat, pts):
    return pts @ mat[:-1, :-1].T + mat[:-1, -1]


def _rot2(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s], [s, c]])


@pytest.fixture
def pts3d():
    rng = np.random.default_rng(0)
    return rng.random((40, 3)) * 100


@pytest.fixture
def pts2d():
    rng = np.random.default_rng(1)
    return rng.random((30, 2)) * 100


def test_estimate_translation_exact(pts2d):
    t = np.array([3.5, -2.25])
    mat = transforms.estimate_translation(pts2d, pts2d + t)
    np.testing.assert_allclose(mat[:2, 2], t, atol=1e-9)
    np.testing.assert_allclose(mat[:2, :2], np.eye(2), atol=1e-12)


def test_estimate_rigid_recovers_rotation(pts2d):
    R = _rot2(0.3)
    t = np.array([5.0, -7.0])
    dst = pts2d @ R.T + t
    mat = transforms.estimate_rigid(pts2d, dst)
    np.testing.assert_allclose(mat[:2, :2], R, atol=1e-9)
    np.testing.assert_allclose(mat[:2, 2], t, atol=1e-7)
    # rigid: no scale
    np.testing.assert_allclose(np.linalg.det(mat[:2, :2]), 1.0, atol=1e-9)


def test_estimate_similarity_recovers_scale(pts3d):
    rng = np.random.default_rng(2)
    # random 3D rotation via QR
    q, _ = np.linalg.qr(rng.random((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    s = 1.7
    t = np.array([1.0, 2.0, 3.0])
    dst = s * pts3d @ q.T + t
    mat = transforms.estimate_similarity(pts3d, dst)
    np.testing.assert_allclose(mat[:3, :3], s * q, atol=1e-8)
    np.testing.assert_allclose(mat[:3, 3], t, atol=1e-6)


def test_estimate_affine_recovers_shear(pts2d):
    A = np.array([[1.2, 0.3], [-0.1, 0.9]])
    t = np.array([4.0, -1.0])
    dst = pts2d @ A.T + t
    mat = transforms.estimate_affine(pts2d, dst)
    np.testing.assert_allclose(mat[:2, :2], A, atol=1e-9)
    np.testing.assert_allclose(mat[:2, 2], t, atol=1e-7)


def test_rigid_under_noise_beats_translation(pts2d):
    rng = np.random.default_rng(3)
    R = _rot2(0.2)
    dst = pts2d @ R.T + np.array([1.0, 1.0]) + rng.normal(0, 0.05, pts2d.shape)
    m_rigid = transforms.estimate_rigid(pts2d, dst)
    m_trans = transforms.estimate_translation(pts2d, dst)
    res_rigid = np.linalg.norm(_apply(m_rigid, pts2d) - dst, axis=1).mean()
    res_trans = np.linalg.norm(_apply(m_trans, pts2d) - dst, axis=1).mean()
    assert res_rigid < res_trans / 5


def test_estimate_transform_dispatch(pts2d):
    for kind in ["translation", "rigid", "similarity", "affine"]:
        mat = transforms.estimate_transform(kind, pts2d, pts2d + 1.0)
        assert mat.shape == (3, 3)
        np.testing.assert_allclose(mat[:2, 2], [1.0, 1.0], atol=1e-7)
    with pytest.raises((ValueError, KeyError)):
        transforms.estimate_transform("warp", pts2d, pts2d)


def test_transform_class_api(pts2d):
    tf = transforms.EuclideanTransform(dimensionality=2)
    R = _rot2(-0.4)
    dst = pts2d @ R.T + np.array([2.0, 3.0])
    assert tf.estimate(pts2d, dst)
    np.testing.assert_allclose(tf(pts2d), dst, atol=1e-7)
    assert np.max(tf.residuals(pts2d, dst)) < 1e-7
    inv = tf.inverse  # property, skimage API
    np.testing.assert_allclose(inv(dst), pts2d, atol=1e-6)


def test_umeyama_reflection_guard():
    """Mirrored point sets must NOT produce a reflection (det stays +1)."""
    rng = np.random.default_rng(5)
    src = rng.random((20, 2))
    dst = src * np.array([-1.0, 1.0])  # pure mirror
    mat = transforms.estimate_rigid(src, dst)
    assert np.linalg.det(mat[:2, :2]) > 0
