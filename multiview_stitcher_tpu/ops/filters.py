"""JAX image filters.

TPU-native replacements for the scipy.ndimage filters the reference delegates
to (gaussian, uniform, min/max, gaussian_laplace — see SURVEY.md §2.5) plus
the DCT-entropy quality measure used by content-based fusion weights
(reference weights.py:85-290). All filters are separable convolutions over
static shapes so XLA fuses and tiles them; DCTs are expressed as small
per-axis matmuls (MXU-friendly).

Kernel sizes/normalization match scipy defaults (truncate=4.0,
radius = int(truncate*sigma + 0.5)) so results are comparable to the
reference's CPU outputs.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

_PAD_MODE = {
    "reflect": "symmetric",  # scipy 'reflect' == jnp.pad 'symmetric'
    "mirror": "reflect",     # scipy 'mirror'  == jnp.pad 'reflect'
    "nearest": "edge",
    "wrap": "wrap",
    "constant": "constant",
}


def gaussian_kernel_1d(sigma: float, order: int = 0, truncate: float = 4.0) -> np.ndarray:
    """1-D gaussian (derivative) kernel identical to scipy's."""
    radius = int(truncate * float(sigma) + 0.5)
    x = np.arange(-radius, radius + 1, dtype=float)
    sigma2 = float(sigma) * float(sigma)
    phi = np.exp(-0.5 / sigma2 * x**2)
    phi = phi / phi.sum()
    if order == 0:
        return phi
    if order == 2:
        # second derivative of gaussian, scipy-style polynomial correction
        q = (x**2 / sigma2 - 1.0) / sigma2
        kern = q * phi
        kern -= kern.mean()
        # scipy normalizes so that sum(x^2/2 * kern) == 1
        denom = (x**2 * kern).sum() / 2.0
        return kern / denom
    raise NotImplementedError(order)


def _correlate_along_axis(data, kernel, axis: int, mode: str = "reflect", cval=0.0):
    """Correlate with a 1-D kernel along one axis (static shapes)."""
    kernel = jnp.asarray(kernel, dtype=data.dtype)
    radius = (kernel.shape[0] - 1) // 2
    pad_width = [(0, 0)] * data.ndim
    pad_width[axis] = (radius, radius)
    jmode = _PAD_MODE[mode]
    if jmode == "constant":
        padded = jnp.pad(data, pad_width, mode="constant", constant_values=cval)
    else:
        padded = jnp.pad(data, pad_width, mode=jmode)

    # move target axis last, flatten the rest as batch, run a 1-D conv
    moved = jnp.moveaxis(padded, axis, -1)
    batch_shape = moved.shape[:-1]
    n = moved.shape[-1]
    flat = moved.reshape((-1, 1, n))
    kern = kernel[::-1].reshape((1, 1, -1))  # correlate == conv with flipped
    out = jax.lax.conv_general_dilated(
        flat, kern, window_strides=(1,), padding="VALID"
    )
    out = out.reshape(batch_shape + (out.shape[-1],))
    return jnp.moveaxis(out, -1, axis)


def gaussian_filter(data, sigma, mode: str = "reflect", truncate: float = 4.0,
                    order: Union[int, Sequence[int]] = 0):
    """Separable gaussian filter matching scipy.ndimage.gaussian_filter."""
    data = jnp.asarray(data)
    ndim = data.ndim
    sigmas = [sigma] * ndim if np.isscalar(sigma) else list(sigma)
    orders = [order] * ndim if np.isscalar(order) else list(order)
    out = data
    for ax in range(ndim):
        if sigmas[ax] == 0:
            continue
        kern = gaussian_kernel_1d(sigmas[ax], order=orders[ax], truncate=truncate)
        out = _correlate_along_axis(out, kern, ax, mode=mode)
    return out


def gaussian_laplace(data, sigma, mode: str = "reflect", truncate: float = 4.0):
    """Laplacian of gaussian: sum over axes of second-derivative filters."""
    data = jnp.asarray(data)
    ndim = data.ndim
    out = jnp.zeros_like(data)
    for ax in range(ndim):
        orders = [0] * ndim
        orders[ax] = 2
        out = out + gaussian_filter(
            data, sigma, mode=mode, truncate=truncate, order=orders
        )
    return out


def nan_gaussian_filter(ar, sigma, mode: str = "reflect"):
    """Gaussian filter ignoring NaNs (reference weights.py:293-322)."""
    ar = jnp.asarray(ar)
    nan_mask = jnp.isnan(ar)
    V = jnp.where(nan_mask, 0.0, ar)
    VV = gaussian_filter(V, sigma, mode=mode)
    W = jnp.where(nan_mask, 0.0, 1.0)
    WW = gaussian_filter(W, sigma, mode=mode)
    WW = jnp.where(nan_mask, 1.0, WW)
    Z = VV / WW
    return jnp.where(nan_mask, jnp.nan, Z)


def uniform_filter(data, size: int, mode: str = "reflect"):
    """Separable box filter matching scipy.ndimage.uniform_filter."""
    data = jnp.asarray(data)
    kern = np.full(size, 1.0 / size)
    # even sizes in scipy put the extra tap on the left; our kernels are odd
    # in all uses (SSIM win_size is odd)
    assert size % 2 == 1
    out = data
    for ax in range(data.ndim):
        out = _correlate_along_axis(out, kern, ax, mode=mode)
    return out


def _extremum_filter(data, size, mode, is_max: bool, cval=None):
    data = jnp.asarray(data)
    ndim = data.ndim
    sizes = [size] * ndim if np.isscalar(size) else list(size)
    init = -jnp.inf if is_max else jnp.inf
    op = jax.lax.max if is_max else jax.lax.min
    radius = [(s - 1) // 2 for s in sizes]
    pad_width = [(r, s - 1 - r) for r, s in zip(radius, sizes)]
    jmode = _PAD_MODE[mode]
    if jmode == "constant":
        padded = jnp.pad(
            data, pad_width, mode="constant",
            constant_values=(init if cval is None else cval),
        )
    else:
        padded = jnp.pad(data, pad_width, mode=jmode)
    return jax.lax.reduce_window(
        padded, init, op,
        window_dimensions=tuple(sizes),
        window_strides=(1,) * ndim,
        padding="VALID",
    )


def maximum_filter(data, size, mode: str = "reflect", cval=None):
    return _extremum_filter(data, size, mode, is_max=True, cval=cval)


def minimum_filter(data, size, mode: str = "reflect", cval=None):
    return _extremum_filter(data, size, mode, is_max=False, cval=cval)


# ---------------------------------------------------------------------------
# DCT entropy quality (reference weights.py:85-290; Royer et al. 2016)
# ---------------------------------------------------------------------------


def dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (rows = frequencies)."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    C = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * m + 1) * k / (2 * n))
    C[0] /= np.sqrt(2.0)
    return C


@partial(jax.jit, static_argnames=("dct_sizes", "otf_support_fraction", "exponent"))
def dct_entropy_quality(
    views,
    dct_sizes: Tuple[int, ...],
    otf_support_fraction: Optional[float] = 0.5,
    exponent: float = 1.0,
):
    """Per-block DCT Shannon-entropy quality for each view.

    views: (V, *spatial). Returns (V, *n_blocks) quality maps. Edge blocks
    use a TRUNCATED DCT over the in-bounds extent, matching the reference's
    per-chunk ``dctn`` on the truncated slice (reference weights.py:203-257):
    the last block along each axis is transformed with a zero-padded
    ``r x r`` orthonormal DCT matrix so only the first ``r`` coefficients
    (and samples) participate, and the entropy normalization uses the
    truncated block's element count.
    """
    V = views.shape[0]
    spatial_shape = views.shape[1:]
    ndim = len(spatial_shape)
    n_blocks = tuple(
        -(-s // ds) for s, ds in zip(spatial_shape, dct_sizes)
    )
    remainders = tuple(
        s - (nb - 1) * ds
        for s, nb, ds in zip(spatial_shape, n_blocks, dct_sizes)
    )

    pad = [(0, 0)] + [
        (0, nb * ds - s)
        for nb, ds, s in zip(n_blocks, dct_sizes, spatial_shape)
    ]
    padded = jnp.pad(views, pad, mode="constant", constant_values=jnp.nan)

    # reshape into blocks: (V, nb0, ds0, nb1, ds1, ...) -> (V, *nb, *ds)
    shape = (V,)
    for nb, ds in zip(n_blocks, dct_sizes):
        shape += (nb, ds)
    blocked = padded.reshape(shape)
    perm = (0,) + tuple(1 + 2 * i for i in range(ndim)) + tuple(
        2 + 2 * i for i in range(ndim)
    )
    blocked = jnp.transpose(blocked, perm)  # (V, *nb, *ds)

    nan_mask = jnp.isnan(blocked)
    block_axes = tuple(range(1 + ndim, 1 + 2 * ndim))
    n_valid = jnp.sum(~nan_mask, axis=block_axes)
    # per-block truncated element count (edge blocks are smaller)
    trunc_size = np.ones((1,) + n_blocks, dtype=np.float32)
    for i, (nb, ds, r) in enumerate(zip(n_blocks, dct_sizes, remainders)):
        ext = np.full(nb, float(ds), dtype=np.float32)
        ext[-1] = float(r)
        shape = [1] * (1 + ndim)
        shape[1 + i] = nb
        trunc_size = trunc_size * ext.reshape(shape)
    trunc_size = jnp.asarray(trunc_size)

    fill_val = jnp.nanmin(
        jnp.where(nan_mask, jnp.inf, blocked), axis=block_axes, keepdims=True
    )
    fill_val = jnp.where(jnp.isfinite(fill_val), fill_val, 0.0)
    fill_val = jnp.where(fill_val > 0.0001, fill_val, 0.0)
    filled = jnp.where(nan_mask, fill_val, blocked)

    # per-axis DCT via matmul over the trailing block axes; the last block
    # along each axis uses a zero-padded truncated DCT matrix (exact
    # truncation: coefficients/samples beyond the remainder never mix in)
    d = filled
    for i, (ds, r) in enumerate(zip(dct_sizes, remainders)):
        C = jnp.asarray(dct_matrix(ds), dtype=d.dtype)
        d_ax = jnp.moveaxis(d, 1 + ndim + i, -1)
        d_full = d_ax @ C.T
        if r < ds:
            Cr = np.zeros((ds, ds), dtype=np.float64)
            Cr[:r, :r] = dct_matrix(r)
            d_r = d_ax @ jnp.asarray(Cr, dtype=d.dtype).T
            is_last = (
                jnp.arange(n_blocks[i]).reshape(
                    [1] * (1 + i) + [n_blocks[i]]
                    + [1] * (ndim - 1 - i + ndim)
                )
                == n_blocks[i] - 1
            )
            d_full = jnp.where(is_last, d_r, d_full)
        d = jnp.moveaxis(d_full, -1, 1 + ndim + i)

    absd = jnp.abs(d)
    if otf_support_fraction is not None:
        r_o = otf_support_fraction * min(dct_sizes)
        grids = np.meshgrid(*[np.arange(ds) for ds in dct_sizes], indexing="ij")
        otf_mask = jnp.asarray(sum(grids) < r_o)
        l2 = jnp.sqrt(jnp.sum(d**2, axis=block_axes, keepdims=True))
        p = jnp.where(otf_mask, absd, 0.0) / jnp.where(l2 == 0, 1.0, l2)
        plogp = jnp.where(p > 0, p * jnp.log2(jnp.where(p > 0, p, 1.0)), 0.0)
        entropy = -jnp.sum(plogp, axis=block_axes)
        quality = (2.0 / r_o**2) * entropy
        quality = jnp.where(l2[..., *([0] * ndim)] == 0, 0.0, quality)
        sign = jnp.sign(quality)
        quality = sign * jnp.abs(quality) ** exponent
    else:
        # L1 mean over the TRUNCATED block size (reference d.mean() on the
        # truncated chunk); out-of-bounds coefficients are exactly zero
        dsl1 = jnp.sum(absd, axis=block_axes, keepdims=True) / (
            trunc_size.reshape((1,) + n_blocks + (1,) * ndim)
        )
        p = absd / jnp.where(dsl1 == 0, 1.0, dsl1)
        plogp = jnp.where(p > 0, p * jnp.log2(jnp.where(p > 0, p, 1.0)), 0.0)
        entropy = -jnp.sum(plogp, axis=block_axes)
        quality = (dsl1[..., *([0] * ndim)] * entropy) ** exponent
        quality = jnp.where(dsl1[..., *([0] * ndim)] == 0, 0.0, quality)

    quality = jnp.where(n_valid < 0.2 * trunc_size, 0.0, quality)
    return quality
