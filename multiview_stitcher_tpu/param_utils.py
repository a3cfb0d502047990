"""Affine parameter algebra.

TPU-native rebuild of the reference's ``param_utils``
(/root/reference/src/multiview_stitcher/param_utils.py). The reference stores
affines as labeled ``xarray.DataArray``s with dims ``(t?, x_in, x_out)``;
here we use a light :class:`XAffine` wrapper around a numpy array with an
optional leading ``t`` axis, which keeps the same semantics (homogeneous
matrices over named spatial dims ``z, y, x``) while staying trivially
convertible to ``jax.numpy`` for batched on-device math.

Conventions (same as reference, see docs/implementation_details.md there):
- an affine of ndim spatial dims is a ``(ndim+1, ndim+1)`` homogeneous matrix
  acting on column vectors ordered ``(z, y, x)`` (or ``(y, x)`` in 2D);
- a "transform key" affine maps *intrinsic physical* coordinates
  (origin + spacing * index) into a named world coordinate system.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Union

import numpy as np

SPATIAL_DIMS = ["z", "y", "x"]


# ---------------------------------------------------------------------------
# plain-matrix helpers (reference: param_utils.py:7-121)
# ---------------------------------------------------------------------------


def affine_from_translation(translation) -> np.ndarray:
    """Homogeneous matrix for a translation (reference param_utils.py:7)."""
    translation = np.asarray(translation, dtype=float)
    ndim = len(translation)
    M = np.eye(ndim + 1)
    M[:ndim, ndim] = translation
    return M


def affine_from_linear_affine(linear_affine) -> np.ndarray:
    """(ndim²+ndim,) flat linear+translation vector → homogeneous matrix."""
    linear_affine = np.asarray(linear_affine, dtype=float)
    ndim = 3 if len(linear_affine) == 12 else 2
    M = np.eye(ndim + 1)
    M[:ndim, :ndim] = linear_affine[: ndim**2].reshape((ndim, ndim))
    M[:ndim, ndim] = linear_affine[-ndim:]
    return M


def linear_affine_from_affine(affine) -> np.ndarray:
    """Homogeneous matrix → flat linear+translation vector."""
    affine = np.asarray(affine)
    ndim = affine.shape[-1] - 1
    out = np.zeros(ndim**2 + ndim, dtype=float)
    out[: ndim**2] = affine[:ndim, :ndim].flatten()
    out[-ndim:] = affine[:ndim, ndim]
    return out


def translation_from_affine(affine) -> np.ndarray:
    affine = np.asarray(affine)
    ndim = affine.shape[-1] - 1
    return affine[:ndim, ndim]


def affine_from_rotation(angle, direction, point=None) -> np.ndarray:
    """Rotation (3D) around an axis through ``point`` with ``direction``."""
    from scipy.spatial.transform import Rotation

    R = Rotation.from_rotvec(angle * np.asarray(direction, dtype=float)).as_matrix()
    M = np.identity(4)
    M[:3, :3] = R
    if point is not None:
        point = np.asarray(point[:3], dtype=np.float64)
        M[:3, 3] = point - np.dot(R, point)
    return M


def invert_coordinate_order(affine) -> np.ndarray:
    """Flip between (z,y,x) and (x,y,z) coordinate ordering."""
    affine = np.asarray(affine)
    ndim = affine.shape[-1] - 1
    M = np.eye(ndim + 1)
    M[:ndim, :ndim] = affine[:ndim, :ndim][::-1, ::-1]
    M[:ndim, ndim] = affine[:ndim, ndim][::-1]
    return M


def _rotation_matrix_2d(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s], [s, c]])


def random_scale(ndim, scale=0.1):
    return 1 + np.random.random(ndim) * scale - scale / 2


def random_translation(ndim=2, scale=10):
    return np.random.random(ndim) * scale - scale / 2


def random_rotation(ndim=2, scale=0.1):
    rot = np.random.random(ndim - 1) * scale - scale / 2
    return rot[0] if ndim == 2 else rot


def random_affine(ndim=2, translation_scale=10, rotation_scale=0.1, scale_scale=0.1):
    """Random affine = rigid ∘ scale, for tests (reference param_utils.py:60)."""
    if ndim == 2:
        M = np.eye(3)
        M[:2, :2] = _rotation_matrix_2d(random_rotation(2, rotation_scale)) @ np.diag(
            random_scale(2, scale_scale)
        )
        M[:2, 2] = random_translation(2, translation_scale)
        return M
    elif ndim == 3:
        from scipy.spatial.transform import Rotation

        R = Rotation.from_euler(
            "zyx", np.random.random(3) * rotation_scale - rotation_scale / 2
        ).as_matrix()
        rigid = np.eye(4)
        rigid[:3, :3] = R
        rigid[:3, 3] = random_translation(3, translation_scale)
        scale = np.diag(list(random_scale(3, scale_scale)) + [1])
        return rigid @ scale
    raise NotImplementedError("Only 2D and 3D supported.")


# ---------------------------------------------------------------------------
# XAffine: (t?, ndim+1, ndim+1) labeled affine (reference: xaffine DataArray)
# ---------------------------------------------------------------------------


@dataclass
class XAffine:
    """Affine transform, optionally varying over time.

    ``data`` has shape ``(ndim+1, ndim+1)`` or ``(nt, ndim+1, ndim+1)``;
    ``t_coords`` is None iff data has no time axis. Mirrors the reference's
    xaffine DataArray (param_utils.py:128-150).
    """

    data: np.ndarray
    t_coords: Optional[np.ndarray] = None

    def __post_init__(self):
        self.data = np.asarray(self.data, dtype=float)
        if self.t_coords is not None:
            self.t_coords = np.asarray(self.t_coords)
            if self.data.ndim == 2:
                self.data = np.broadcast_to(
                    self.data, (len(self.t_coords),) + self.data.shape
                ).copy()
            assert self.data.ndim == 3 and len(self.data) == len(self.t_coords)
        else:
            assert self.data.ndim == 2

    # -- basic properties ---------------------------------------------------
    @property
    def ndim(self) -> int:
        """Number of spatial dimensions the affine acts on."""
        return self.data.shape[-1] - 1

    @property
    def has_t(self) -> bool:
        return self.t_coords is not None

    @property
    def spatial_dims(self) -> list:
        return SPATIAL_DIMS[-self.ndim :]

    def squeeze(self) -> np.ndarray:
        """Drop the time axis if it is a singleton; return plain matrix."""
        if self.has_t:
            if len(self.t_coords) == 1:
                return np.asarray(self.data[0])
            return np.asarray(self.data)
        return np.asarray(self.data)

    def matrix(self, t=None) -> np.ndarray:
        """Plain (ndim+1, ndim+1) matrix at time ``t`` (or the only one)."""
        if not self.has_t:
            return np.asarray(self.data)
        if t is None:
            if len(self.t_coords) == 1:
                return np.asarray(self.data[0])
            raise ValueError("time-varying affine: specify t")
        idx = int(np.where(self.t_coords == t)[0][0])
        return np.asarray(self.data[idx])

    def sel_t(self, t) -> "XAffine":
        if not self.has_t:
            return XAffine(self.data.copy())
        idx = int(np.where(self.t_coords == t)[0][0])
        return XAffine(self.data[idx].copy())

    def copy(self) -> "XAffine":
        return XAffine(
            self.data.copy(),
            None if self.t_coords is None else self.t_coords.copy(),
        )

    def __array__(self, dtype=None):
        return np.asarray(self.data, dtype=dtype)


def identity_transform(ndim: int, t_coords=None) -> XAffine:
    return XAffine(np.eye(ndim + 1), t_coords=t_coords)


def affine_to_xaffine(affine, t_coords=None) -> XAffine:
    return XAffine(np.asarray(affine), t_coords=t_coords)


def to_xaffine(value) -> XAffine:
    if isinstance(value, XAffine):
        return value
    value = np.asarray(value, dtype=float)
    if value.ndim == 3:
        return XAffine(value, t_coords=np.arange(len(value)))
    return XAffine(value)


def expand_affine_dims(xaffine: Union[XAffine, np.ndarray], dims: Sequence[str]) -> XAffine:
    """Expand an affine by spatial dims it doesn't contain (2D→3D etc.).

    Added dims are left untransformed (reference param_utils.py:153-191).
    """
    xaffine = to_xaffine(xaffine)
    curr_dims = xaffine.spatial_dims
    expanded_dims = [d for d in SPATIAL_DIMS if d in curr_dims or d in dims]
    n_out = len(expanded_dims)

    def expand_one(mat):
        out = np.eye(n_out + 1)
        idx = [expanded_dims.index(d) for d in curr_dims]
        for i_old, i_new in enumerate(idx):
            for j_old, j_new in enumerate(idx):
                out[i_new, j_new] = mat[i_old, j_old]
            out[i_new, n_out] = mat[i_old, len(curr_dims)]
        return out

    if xaffine.has_t:
        data = np.stack([expand_one(m) for m in xaffine.data])
        return XAffine(data, t_coords=xaffine.t_coords)
    return XAffine(expand_one(xaffine.data))


def _align_t(a: XAffine, b: XAffine, join: str = "inner"):
    """Align two XAffines along t. Returns (data_a, data_b, t_coords)."""
    if not a.has_t and not b.has_t:
        return a.data, b.data, None
    if a.has_t and not b.has_t:
        return a.data, np.broadcast_to(b.data, a.data.shape), a.t_coords
    if b.has_t and not a.has_t:
        return np.broadcast_to(a.data, b.data.shape), b.data, b.t_coords
    if join == "inner":
        common = [t for t in a.t_coords if t in set(b.t_coords.tolist())]
    elif join == "outer":
        common = sorted(set(a.t_coords.tolist()) | set(b.t_coords.tolist()))
    else:
        raise ValueError(join)
    common = np.asarray(common)

    def take(x: XAffine):
        out = []
        tset = {t: i for i, t in enumerate(x.t_coords.tolist())}
        for t in common.tolist():
            out.append(x.data[tset[t]] if t in tset else np.eye(x.ndim + 1))
        return np.stack(out)

    return take(a), take(b), common


def matmul_xparams(p1: Union[XAffine, np.ndarray], p2: Union[XAffine, np.ndarray]) -> XAffine:
    """Chain two (possibly time-varying) affines: result = p1 @ p2."""
    p1, p2 = to_xaffine(p1), to_xaffine(p2)
    d1, d2, t = _align_t(p1, p2, join="inner")
    return XAffine(np.matmul(d1, d2), t_coords=t)


def invert_xparams(p: Union[XAffine, np.ndarray]) -> XAffine:
    p = to_xaffine(p)
    return XAffine(np.linalg.inv(p.data), t_coords=p.t_coords)


def rebase_affine(xaffine: Union[XAffine, np.ndarray], base_affine: Union[XAffine, np.ndarray]) -> XAffine:
    """Outer-join over t (missing filled with identity), then chain.

    Mirrors reference param_utils.py:219-243: result = xaffine @ base_affine.
    """
    a, b = to_xaffine(xaffine), to_xaffine(base_affine)
    d1, d2, t = _align_t(a, b, join="outer")
    return XAffine(np.matmul(d1, d2), t_coords=t)


def transform_pts(pts, affine) -> np.ndarray:
    """Apply homogeneous ``affine`` to an (M, N) point array.

    Reference: transformation.py:151-161.
    """
    pts = np.asarray(pts, dtype=float)
    affine = np.asarray(affine, dtype=float)
    ndim = affine.shape[-1] - 1
    return pts @ affine[:ndim, :ndim].T + affine[:ndim, ndim]


def get_spatial_dims_from_params(xparams) -> list:
    """Matrix dims of a params object (reference param_utils.py:246 —
    there the xarray dims named x_in/x_out; XAffine stores the matrix in
    its trailing two axes)."""
    return ["x_in", "x_out"]


def get_non_spatial_dims_from_params(xparams) -> list:
    """Leading (non-matrix) dims — ['t'] for time-resolved params
    (reference param_utils.py:251)."""
    p = to_xaffine(xparams)
    return ["t"] if p.has_t else []
