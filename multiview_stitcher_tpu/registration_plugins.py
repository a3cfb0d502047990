"""Optional external registration backends (plugin seams).

Rebuild of the reference's ANTsPy / ITK-Elastix integrations
(/root/reference/src/multiview_stitcher/registration.py:2774-3253) as
optional-dependency plugins. Both are physical-space registration functions
(signature-dispatched by :func:`.registration.register_pair_of_msims`
through the ``fixed_origin``/``initial_affine`` keywords) that delegate to
C++ toolkits when the corresponding pip packages are installed and raise a
clear ImportError otherwise. The built-in TPU phase-correlation and
marker-based registrations cover the default needs; these seams preserve the
reference's extension surface for users who rely on ANTs/Elastix pipelines.
"""

from __future__ import annotations


import numpy as np


try:
    import ants
except ImportError:
    ants = None

try:
    import itk
except ImportError:
    itk = None


def registration_ANTsPy(
    fixed_data,
    moving_data,
    *,
    fixed_origin,
    moving_origin,
    fixed_spacing,
    moving_spacing,
    initial_affine,
    transform_types=None,
    **ants_registration_kwargs,
):
    """Staged ANTs registration (Translation/Rigid/Similarity/Affine).

    Requires the ``antspyx`` package. Returns {'affine_matrix', 'quality'}
    where the affine maps fixed physical coords -> moving physical coords,
    recovered by transforming corner probe points through the fitted ANTs
    transform (the approach the reference uses at registration.py:2900-2906).
    """
    if ants is None:
        raise ImportError(
            "Please install the antspyx package to use ANTsPy for "
            "registration (pip install antspyx)."
        )

    sdims = list(fixed_spacing.keys())
    ndim = len(sdims)
    if transform_types is None:
        transform_types = ["Translation", "Rigid", "Similarity"]

    fixed_np = np.asarray(
        fixed_data.data if hasattr(fixed_data, "data") else fixed_data,
        dtype=np.float32,
    )
    moving_np = np.asarray(
        moving_data.data if hasattr(moving_data, "data") else moving_data,
        dtype=np.float32,
    )

    fixed_img = ants.from_numpy(
        np.nan_to_num(fixed_np),
        origin=[float(fixed_origin[d]) for d in sdims],
        spacing=[float(fixed_spacing[d]) for d in sdims],
    )
    moving_img = ants.from_numpy(
        np.nan_to_num(moving_np),
        origin=[float(moving_origin[d]) for d in sdims],
        spacing=[float(moving_spacing[d]) for d in sdims],
    )

    result = None
    for ttype in transform_types:
        result = ants.registration(
            fixed=fixed_img,
            moving=moving_img,
            type_of_transform=ttype,
            initial_transform=(
                result["fwdtransforms"] if result is not None else None
            ),
            **ants_registration_kwargs,
        )

    # recover the affine by probing corner points through the transform
    probe = np.array(
        list(np.ndindex((2,) * ndim)), dtype=float
    ) * (np.asarray(fixed_np.shape) - 1)
    probe_phys = probe * np.array(
        [fixed_spacing[d] for d in sdims]
    ) + np.array([fixed_origin[d] for d in sdims])
    import pandas as pd

    pts_df = pd.DataFrame(probe_phys, columns=["x", "y", "z"][:ndim])
    mapped = ants.apply_transforms_to_points(
        ndim, pts_df, result["fwdtransforms"]
    ).values
    M = _affine_from_point_pairs(probe_phys, mapped)
    return {"affine_matrix": M, "quality": np.nan}


def registration_ITKElastix(
    fixed_data,
    moving_data,
    *,
    fixed_origin,
    moving_origin,
    fixed_spacing,
    moving_spacing,
    initial_affine,
    transform_types=None,
    **elastix_kwargs,
):
    """Staged elastix registration; requires the ``itk-elastix`` package."""
    if itk is None or not hasattr(itk, "ElastixRegistrationMethod"):
        raise ImportError(
            "Please install the itk-elastix package to use ITKElastix for "
            "registration (pip install itk-elastix)."
        )

    sdims = list(fixed_spacing.keys())
    ndim = len(sdims)
    if transform_types is None:
        transform_types = ["translation", "rigid", "affine"]

    fixed_np = np.nan_to_num(
        np.asarray(
            fixed_data.data if hasattr(fixed_data, "data") else fixed_data,
            dtype=np.float32,
        )
    )
    moving_np = np.nan_to_num(
        np.asarray(
            moving_data.data if hasattr(moving_data, "data") else moving_data,
            dtype=np.float32,
        )
    )

    fixed_img = itk.image_from_array(fixed_np)
    fixed_img.SetSpacing([float(fixed_spacing[d]) for d in sdims[::-1]])
    fixed_img.SetOrigin([float(fixed_origin[d]) for d in sdims[::-1]])
    moving_img = itk.image_from_array(moving_np)
    moving_img.SetSpacing([float(moving_spacing[d]) for d in sdims[::-1]])
    moving_img.SetOrigin([float(moving_origin[d]) for d in sdims[::-1]])

    parameter_object = itk.ParameterObject.New()
    for ttype in transform_types:
        parameter_object.AddParameterMap(
            parameter_object.GetDefaultParameterMap(ttype)
        )

    registered, params = itk.elastix_registration_method(
        fixed_img, moving_img, parameter_object=parameter_object,
        **elastix_kwargs,
    )

    # probe a point grid through transformix to recover the affine
    probe = np.array(list(np.ndindex((3,) * ndim)), dtype=float) / 2
    probe_phys = probe * (np.asarray(fixed_np.shape) - 1) * np.array(
        [fixed_spacing[d] for d in sdims]
    ) + np.array([fixed_origin[d] for d in sdims])
    mapped = _transformix_points(probe_phys[:, ::-1], params)[:, ::-1]
    M = _affine_from_point_pairs(probe_phys, mapped)
    return {"affine_matrix": M, "quality": np.nan}


def _transformix_points(points_xyz, parameter_object):
    import itk as _itk

    return np.asarray(
        _itk.transformix_pointset(points_xyz, parameter_object)
    )


def _affine_from_point_pairs(src, dst) -> np.ndarray:
    """Least-squares homogeneous affine mapping src -> dst points."""
    from multiview_stitcher_tpu import transforms

    return transforms.estimate_affine(src, dst)
