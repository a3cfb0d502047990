"""Plugin staging logic (registration_plugins.py) against FAKE backends.

The real ANTs/Elastix packages are optional and absent here; these tests
drive the staged-registration control flow with stub modules that mimic the
backend APIs (reference registration.py:2774-3253): transform-type staging
order, initial-transform chaining, point-probe affine recovery, and the
clear ImportError when the backend is missing.
"""

import types

import numpy as np
import pytest

from multiview_stitcher_tpu import registration_plugins as rp


TH = 0.1
GT = np.array(
    [
        [np.cos(TH), -np.sin(TH), 2.0],
        [np.sin(TH), np.cos(TH), -1.0],
        [0.0, 0.0, 1.0],
    ]
)  # fixed physical -> moving physical (2D homogeneous)


def _apply_gt(pts):
    return pts @ GT[:2, :2].T + GT[:2, 2]


class _FakeAntsImage:
    def __init__(self, arr, origin, spacing):
        self.arr, self.origin, self.spacing = arr, origin, spacing


def _fake_ants(calls):
    mod = types.SimpleNamespace()
    mod.from_numpy = lambda arr, origin, spacing: _FakeAntsImage(
        arr, origin, spacing
    )

    def registration(fixed, moving, type_of_transform, initial_transform,
                     **kw):
        calls.append((type_of_transform, initial_transform))
        return {"fwdtransforms": f"tx_after_{type_of_transform}"}

    mod.registration = registration

    def apply_transforms_to_points(ndim, pts_df, transforms):
        assert transforms == "tx_after_Similarity"  # final stage's output
        pts = pts_df.values
        return types.SimpleNamespace(values=_apply_gt(pts))

    mod.apply_transforms_to_points = apply_transforms_to_points
    return mod


def test_antspy_staging_and_affine_recovery(monkeypatch):
    calls = []
    monkeypatch.setattr(rp, "ants", _fake_ants(calls))
    fixed = np.random.default_rng(0).random((20, 24)).astype(np.float32)
    moving = np.roll(fixed, 2, axis=0)
    res = rp.registration_ANTsPy(
        fixed, moving,
        fixed_origin={"y": 1.0, "x": -2.0},
        moving_origin={"y": 0.0, "x": 0.0},
        fixed_spacing={"y": 0.5, "x": 0.5},
        moving_spacing={"y": 0.5, "x": 0.5},
        initial_affine=np.eye(3),
    )
    # staged Translation -> Rigid -> Similarity, each seeded with the
    # previous stage's forward transforms
    assert [c[0] for c in calls] == ["Translation", "Rigid", "Similarity"]
    assert calls[0][1] is None
    assert calls[1][1] == "tx_after_Translation"
    assert calls[2][1] == "tx_after_Rigid"
    np.testing.assert_allclose(res["affine_matrix"], GT, atol=1e-8)


def test_antspy_custom_transform_types(monkeypatch):
    calls = []
    fake = _fake_ants(calls)
    # final transforms key adapts to the last requested stage
    fake.apply_transforms_to_points = (
        lambda ndim, pts_df, transforms: types.SimpleNamespace(
            values=_apply_gt(pts_df.values)
        )
    )
    monkeypatch.setattr(rp, "ants", fake)
    fixed = np.zeros((8, 8), np.float32)
    rp.registration_ANTsPy(
        fixed, fixed,
        fixed_origin={"y": 0.0, "x": 0.0},
        moving_origin={"y": 0.0, "x": 0.0},
        fixed_spacing={"y": 1.0, "x": 1.0},
        moving_spacing={"y": 1.0, "x": 1.0},
        initial_affine=np.eye(3),
        transform_types=["Affine"],
    )
    assert [c[0] for c in calls] == ["Affine"]


def test_antspy_missing_backend_raises(monkeypatch):
    monkeypatch.setattr(rp, "ants", None)
    with pytest.raises(ImportError, match="antspyx"):
        rp.registration_ANTsPy(
            np.zeros((4, 4)), np.zeros((4, 4)),
            fixed_origin={"y": 0, "x": 0}, moving_origin={"y": 0, "x": 0},
            fixed_spacing={"y": 1, "x": 1}, moving_spacing={"y": 1, "x": 1},
            initial_affine=np.eye(3),
        )


class _FakeItkImage:
    def __init__(self, arr):
        self.arr = arr
        self.spacing = self.origin = None

    def SetSpacing(self, s):
        self.spacing = s

    def SetOrigin(self, o):
        self.origin = o


def _fake_itk(added_maps):
    mod = types.SimpleNamespace()
    mod.ElastixRegistrationMethod = object()
    mod.image_from_array = lambda arr: _FakeItkImage(arr)

    class _PO:
        @staticmethod
        def New():
            po = types.SimpleNamespace()
            po.AddParameterMap = added_maps.append
            po.GetDefaultParameterMap = lambda t: f"map:{t}"
            return po

    mod.ParameterObject = _PO
    mod.elastix_registration_method = lambda f, m, parameter_object, **kw: (
        None,
        "fitted_params",
    )
    return mod


def test_itk_elastix_staging_and_affine_recovery(monkeypatch):
    added = []
    monkeypatch.setattr(rp, "itk", _fake_itk(added))

    def fake_transformix(points_xyz, parameter_object):
        assert parameter_object == "fitted_params"
        # plugin probes in xyz (reversed) order; apply GT in yx space
        pts_yx = points_xyz[:, ::-1]
        return _apply_gt(pts_yx)[:, ::-1]

    monkeypatch.setattr(rp, "_transformix_points", fake_transformix)
    fixed = np.random.default_rng(1).random((16, 18)).astype(np.float32)
    res = rp.registration_ITKElastix(
        fixed, fixed,
        fixed_origin={"y": 0.5, "x": 1.5},
        moving_origin={"y": 0.0, "x": 0.0},
        fixed_spacing={"y": 2.0, "x": 0.5},
        moving_spacing={"y": 2.0, "x": 0.5},
        initial_affine=np.eye(3),
    )
    assert added == ["map:translation", "map:rigid", "map:affine"]
    np.testing.assert_allclose(res["affine_matrix"], GT, atol=1e-8)


def test_itk_missing_backend_raises(monkeypatch):
    monkeypatch.setattr(rp, "itk", None)
    with pytest.raises(ImportError, match="itk-elastix"):
        rp.registration_ITKElastix(
            np.zeros((4, 4)), np.zeros((4, 4)),
            fixed_origin={"y": 0, "x": 0}, moving_origin={"y": 0, "x": 0},
            fixed_spacing={"y": 1, "x": 1}, moving_spacing={"y": 1, "x": 1},
            initial_affine=np.eye(3),
        )