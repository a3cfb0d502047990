"""JAX affine resampling kernels.

TPU-native replacement for the reference's backend-dispatched
``scipy.ndimage.affine_transform`` / ``dask_image.ndinterp`` / ``cupyx``
resampling (reference transformation.py:118-139). Everything here is pure
JAX: the coordinate map and the (multi-)linear interpolation are expressed as
fused elementwise ops + gathers so XLA can tile them; a batched variant vmaps
over views for the fusion hot loop.

Semantics match ``scipy.ndimage.affine_transform(order<=1, mode='constant')``:
- output pixel index ``i`` samples input pixel coordinate ``matrix @ i + offset``
- coordinates outside ``[0, size-1]`` (per dim) produce exactly ``cval``
  (scipy 'constant' mode performs no interpolation beyond the edges)
- inside coordinates use multi-linear interpolation (order=1) or nearest
  neighbour (order=0).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _output_pixel_to_input_coords(matrix, offset, out_shape):
    """Per-dim input pixel coordinates for every output pixel.

    Returns a list of ndim arrays broadcastable to ``out_shape`` (kept
    separate per dim so XLA fuses the iota+mac chain without materializing
    an (ndim, *out_shape) tensor).
    """
    ndim = len(out_shape)
    idx = [
        jax.lax.broadcasted_iota(jnp.float32, out_shape, dimension=d)
        for d in range(ndim)
    ]
    coords = []
    for d in range(ndim):
        c = jnp.full(out_shape, offset[d], dtype=jnp.float32)
        for j in range(ndim):
            c = c + matrix[d, j] * idx[j]
        coords.append(c)
    return coords


@partial(jax.jit, static_argnames=("out_shape", "order"))
def affine_resample(data, matrix, offset, out_shape: tuple, order: int = 1,
                    cval=jnp.nan):
    """Affine-resample ``data`` onto a grid of shape ``out_shape``.

    Parameters
    ----------
    data : (…spatial) array, 1-3 spatial dims
    matrix : (ndim, ndim) — output pixel index -> input pixel index linear part
    offset : (ndim,) — translation part
    out_shape : static output spatial shape
    order : 0 (nearest) or 1 (linear)
    cval : fill value for out-of-domain samples (NaN marks invalid, as in the
        reference's fusion path).
    """
    ndim = len(out_shape)
    assert data.ndim == ndim
    data = jnp.asarray(data)
    matrix = jnp.asarray(matrix, dtype=jnp.float32)
    offset = jnp.asarray(offset, dtype=jnp.float32)
    compute_dtype = (
        data.dtype if jnp.issubdtype(data.dtype, jnp.floating) else jnp.float32
    )
    data_f = data.astype(compute_dtype)

    coords = _output_pixel_to_input_coords(matrix, offset, out_shape)
    sizes = data.shape

    valid = jnp.ones(out_shape, dtype=bool)
    for d in range(ndim):
        valid &= (coords[d] >= 0) & (coords[d] <= sizes[d] - 1)

    if order == 0:
        nearest = [
            jnp.clip(jnp.round(coords[d]).astype(jnp.int32), 0, sizes[d] - 1)
            for d in range(ndim)
        ]
        vals = data_f[tuple(nearest)]
    elif order == 1:
        floors = [jnp.floor(coords[d]) for d in range(ndim)]
        fracs = [coords[d] - floors[d] for d in range(ndim)]
        base = [floors[d].astype(jnp.int32) for d in range(ndim)]
        vals = jnp.zeros(out_shape, dtype=compute_dtype)
        for corner in range(2**ndim):
            bits = [(corner >> d) & 1 for d in range(ndim)]
            gather_idx = tuple(
                jnp.clip(base[d] + bits[d], 0, sizes[d] - 1) for d in range(ndim)
            )
            w = jnp.ones(out_shape, dtype=compute_dtype)
            for d in range(ndim):
                w = w * (fracs[d] if bits[d] else (1.0 - fracs[d]))
            # zero-weight corners must contribute exactly 0 even when the
            # gathered value is NaN (e.g. NaN-padded slabs at exact-integer
            # coordinates); scipy's spline loop has the same property.
            vals = vals + jnp.where(w > 0, w * data_f[gather_idx], 0.0)
    else:
        raise NotImplementedError(f"order={order}")

    return jnp.where(valid, vals, jnp.asarray(cval, dtype=compute_dtype))


@partial(jax.jit, static_argnames=("out_shape", "order"))
def affine_resample_batch(data, matrices, offsets, out_shape: tuple,
                          order: int = 1, cval=jnp.nan):
    """vmapped :func:`affine_resample` over a leading batch axis.

    data: (B, …spatial); matrices: (B, ndim, ndim); offsets: (B, ndim).
    """
    fn = lambda d, m, o: affine_resample(d, m, o, out_shape, order, cval)
    return jax.vmap(fn)(data, matrices, offsets)


def translate_resample(data, shift, order: int = 1, cval=jnp.nan):
    """Pure-translation resample (out same shape as in): out[i] = in[i + shift]."""
    ndim = data.ndim
    return affine_resample(
        data,
        jnp.eye(ndim, dtype=jnp.float32),
        jnp.asarray(shift, dtype=jnp.float32),
        tuple(data.shape),
        order=order,
        cval=cval,
    )


@partial(jax.jit, static_argnames=("order",))
def translate_resample_batch(data, shifts, order: int = 1, cval=jnp.nan):
    """Batch of pure translations of the same image stack.

    data: (B, …spatial) or (…spatial) broadcast over shifts (B, ndim).
    """
    shifts = jnp.asarray(shifts, dtype=jnp.float32)
    if data.ndim == shifts.shape[-1]:
        fn = lambda s: translate_resample(data, s, order, cval)
        return jax.vmap(fn)(shifts)
    fn = lambda d, s: translate_resample(d, s, order, cval)
    return jax.vmap(fn)(data, shifts)


def separable_axis_aligned_resample(
    data,
    diag,
    offset,
    out_shape: tuple,
    cval=jnp.nan,
    valid_extent=None,
):
    """Axis-aligned (diagonal) affine resample as per-axis banded matmuls.

    For maps ``in_coord_d = diag[d] * out_idx_d + offset[d]`` the multi-linear
    interpolation is separable: each axis contracts with a 2-banded
    (out_d, in_d) lerp matrix. These contractions run on the MXU instead of
    the TPU-hostile gather path — this is the hot kernel for translation-grid
    stitching (the dominant case). Out-of-domain samples (coord outside
    [0, valid_extent-1]) become ``cval``.

    data must not contain NaNs (zero-fill padding; validity is tracked
    analytically).
    """
    ndim = len(out_shape)
    data = jnp.asarray(data)
    compute_dtype = (
        data.dtype if jnp.issubdtype(data.dtype, jnp.floating) else jnp.float32
    )
    vals = data.astype(compute_dtype)
    if valid_extent is None:
        valid_extent = jnp.asarray(data.shape, dtype=jnp.float32)
    else:
        valid_extent = jnp.asarray(valid_extent, dtype=jnp.float32)

    valid_axis = []
    for d in range(ndim):
        out_d = out_shape[d]
        in_d = data.shape[d]
        i = jnp.arange(out_d, dtype=jnp.float32)
        c = diag[d] * i + offset[d]
        f = jnp.floor(c)
        w1 = (c - f).astype(compute_dtype)
        fi = f.astype(jnp.int32)
        j = jnp.arange(in_d, dtype=jnp.int32)
        # banded lerp matrix; zero-weight second band contributes exactly 0
        M = jnp.where(
            j[None, :] == fi[:, None], (1.0 - w1)[:, None], 0.0
        ) + jnp.where(
            (j[None, :] == fi[:, None] + 1) & (w1[:, None] > 0),
            w1[:, None],
            0.0,
        )
        vals = jnp.moveaxis(
            jnp.tensordot(M.astype(compute_dtype), vals, axes=(1, d)), 0, d
        )
        valid_axis.append((c >= 0) & (c <= valid_extent[d] - 1))

    valid = valid_axis[0].reshape((-1,) + (1,) * (ndim - 1))
    for d in range(1, ndim):
        shape = [1] * ndim
        shape[d] = -1
        valid = valid & valid_axis[d].reshape(shape)
    return jnp.where(valid, vals, jnp.asarray(cval, dtype=compute_dtype))


def transform_pts(pts, affine):
    """Apply a homogeneous affine to an (M, N) point array (JAX)."""
    pts = jnp.asarray(pts, dtype=jnp.float32)
    affine = jnp.asarray(affine, dtype=jnp.float32)
    ndim = affine.shape[-1] - 1
    return pts @ affine[:ndim, :ndim].T + affine[:ndim, ndim]


# ---------------------------------------------------------------------------
# physical-space parameter conversion (reference transformation.py:40-83)
# ---------------------------------------------------------------------------


def physical_to_pixel_params(
    p: np.ndarray,
    input_spacing: np.ndarray,
    input_origin: np.ndarray,
    output_spacing: np.ndarray,
    output_origin: np.ndarray,
):
    """Convert a physical-space affine into pixel-space (matrix, offset).

    ``p`` maps output physical coordinates -> input physical coordinates; the
    returned (matrix, offset) map output pixel indices -> input pixel indices
    for use with :func:`affine_resample`. Includes the reference's float-error
    handling: round to 10 decimals and snap near-integer offsets
    (transformation.py:67-83).
    """
    p = np.asarray(p, dtype=float)
    ndim = p.shape[-1] - 1
    matrix = p[:ndim, :ndim]
    offset = p[:ndim, ndim]

    Sx = np.diag(np.asarray(output_spacing, dtype=float))
    Sy = np.asarray(input_spacing, dtype=float)
    Ox = np.asarray(output_origin, dtype=float)
    Oy = np.asarray(input_origin, dtype=float)

    matrix_prime = (matrix @ Sx) / Sy[:, None]
    local_input_origin = Oy - Ox
    local_offset = offset + (matrix - np.eye(ndim)) @ Ox
    offset_prime = (local_offset - local_input_origin) / Sy

    decimals = 10
    matrix_prime = np.around(matrix_prime, decimals=decimals)
    offset_prime = np.around(offset_prime, decimals=decimals)

    nearest_integer = np.round(offset_prime)
    near = np.isclose(offset_prime, nearest_integer, rtol=0, atol=1e-6)
    offset_prime[near] = nearest_integer[near]

    return matrix_prime, offset_prime
