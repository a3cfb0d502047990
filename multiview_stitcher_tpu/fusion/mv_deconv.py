"""Multi-view deconvolution fusion (Preibisch 2014) on TPU.

TPU-native rebuild of the reference's ``fusion/mv_deconv.py``
(/root/reference/src/multiview_stitcher/fusion/mv_deconv.py): efficient
Bayesian-based multiview Richardson-Lucy deconvolution with four compound
back-projection kernel variants, Gaussian PSF synthesis/estimation,
blending-weight-gated sequential per-view updates, Tikhonov regularisation,
and boundary-ring erosion masking.

The iterative update loop runs as one jitted JAX computation (convolutions
map to XLA convs, which tile well on TPU); compound kernels are tiny and
computed host-side. Plugs into :func:`..fusion.fuse` as a ``fusion_func``
via the signature-based dispatch and declares the PSF half-width as its
required chunk halo.

Reference: Preibisch et al., Nature Methods 11, 645-648 (2014).
"""

from __future__ import annotations

import logging
from enum import Enum
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.ndimage import binary_erosion as _scipy_binary_erosion
from scipy.ndimage import convolve as _scipy_convolve
from scipy.ndimage import gaussian_filter as _scipy_gaussian_filter

logger = logging.getLogger(__name__)


class PSFType(str, Enum):
    """Compound back-projection kernel variants (Preibisch 2014 suppl.)."""

    EFFICIENT_BAYESIAN = "EFFICIENT_BAYESIAN"
    OPTIMIZATION_I = "OPTIMIZATION_I"
    OPTIMIZATION_II = "OPTIMIZATION_II"
    INDEPENDENT = "INDEPENDENT"


def _flip(kernel):
    return np.flip(kernel)


def _norm(kernel):
    kernel = kernel.astype(np.float64)
    s = kernel.sum()
    if s > 0:
        kernel = kernel / s
    return kernel.astype(np.float32)


def make_gaussian_psf(sigma, ndim: Optional[int] = None, shape=None):
    """Normalised (an)isotropic Gaussian PSF; shape defaults to ceil(6σ)|1."""
    sigma = np.atleast_1d(sigma)
    if sigma.size == 1 and ndim is not None:
        sigma = np.full(ndim, float(sigma[0]))
    if shape is None:
        shape = tuple(int(np.ceil(6.0 * s)) | 1 for s in sigma)
    psf = np.zeros(shape, dtype=np.float32)
    psf[tuple(s // 2 for s in shape)] = 1.0
    psf = _scipy_gaussian_filter(psf, sigma=sigma.tolist())
    return _norm(psf)


def estimate_psf(spacing: dict, na: float = 0.8, wavelength_um: float = 0.5):
    """Gaussian PSF from objective parameters: σ_lat≈0.5λ/NA, σ_ax≈2λ/NA²."""
    sigma_lateral = 0.5 * wavelength_um / na
    sigma_axial = 2.0 * wavelength_um / (na**2)
    sigma_px = []
    for dim, sp in spacing.items():
        if dim == "z":
            sigma_px.append(max(0.5, sigma_axial / float(sp)))
        else:
            sigma_px.append(max(0.5, sigma_lateral / float(sp)))
    return make_gaussian_psf(sigma_px)


def _compute_compound_kernel(v_idx: int, psfs: List[np.ndarray], psf_type):
    """Back-projection kernel2 for view v (host-side; kernels are tiny)."""
    n_views = len(psfs)
    psf_type = psf_type.value if isinstance(psf_type, PSFType) else str(psf_type)
    psf_v = psfs[v_idx].astype(np.float64)

    if n_views == 1 or psf_type == PSFType.INDEPENDENT:
        return _norm(_flip(psf_v))
    if psf_type == PSFType.OPTIMIZATION_II:
        return _norm(_flip(psf_v**n_views))
    if psf_type == PSFType.OPTIMIZATION_I:
        tmp = psf_v.copy()
        psf_v_flip = _flip(psf_v)
        for w_idx, psf_w in enumerate(psfs):
            if w_idx == v_idx:
                continue
            conv = _scipy_convolve(
                psf_v_flip, psf_w.astype(np.float64), mode="constant", cval=0.0
            )
            tmp = tmp * conv
        return _norm(_flip(tmp))

    # EFFICIENT_BAYESIAN
    psf_v_flip = _flip(psf_v)
    tmp = psf_v_flip.copy()
    for w_idx, psf_w in enumerate(psfs):
        if w_idx == v_idx:
            continue
        psf_w_d = psf_w.astype(np.float64)
        conv1 = _scipy_convolve(psf_v_flip, psf_w_d, mode="constant", cval=0.0)
        conv2 = _scipy_convolve(
            conv1, _flip(psf_w_d), mode="constant", cval=0.0
        )
        tmp = tmp * conv2
    return _norm(tmp)


def _jconvolve(arr, kernel, mode: str, cval: float = 0.0):
    """scipy.ndimage.convolve semantics in JAX (odd kernels)."""
    ndim = arr.ndim
    radius = [(k - 1) // 2 for k in kernel.shape]
    pad_width = [(r, k - 1 - r) for r, k in zip(radius, kernel.shape)]
    if mode == "mirror":
        padded = jnp.pad(arr, pad_width, mode="reflect")
    elif mode == "constant":
        padded = jnp.pad(arr, pad_width, mode="constant", constant_values=cval)
    else:
        raise ValueError(mode)
    # scipy convolve == correlate with the flipped kernel
    kern = kernel[tuple(slice(None, None, -1) for _ in range(ndim))]
    lhs = padded[None, None]
    rhs = kern[None, None]
    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,) * ndim, padding="VALID",
    )
    return out[0, 0]


@partial(
    jax.jit,
    static_argnames=("n_iterations", "lambda_reg", "min_value"),
)
def _rl_iterations(
    psi0, observed, view_coverage, blending_weights, kernels1, kernels2,
    max_intensity, n_iterations: int, lambda_reg: float, min_value: float,
):
    n_views = observed.shape[0]

    def one_iteration(_, psi):
        for v in range(n_views):
            w_v = blending_weights[v]
            img_v = observed[v]
            blurred = _jconvolve(psi, kernels1[v], mode="mirror")
            ratio = jnp.where(
                view_coverage[v],
                img_v / jnp.maximum(blurred, min_value),
                1.0,
            )
            weighted_ratio = 1.0 + w_v * (ratio - 1.0)
            integral = _jconvolve(
                weighted_ratio, kernels2[v], mode="constant", cval=1.0
            )
            value = psi * integral
            if lambda_reg > 0:
                x = jnp.maximum(value, 0.0) / max_intensity
                adjusted = (
                    (jnp.sqrt(1.0 + 2.0 * lambda_reg * x) - 1.0)
                    / lambda_reg
                    * max_intensity
                )
            else:
                adjusted = value
            psi = jnp.where(
                jnp.isnan(adjusted),
                min_value,
                jnp.maximum(adjusted, min_value),
            )
        return psi

    return jax.lax.fori_loop(0, n_iterations, one_iteration, psi0)


def multi_view_deconvolution(
    transformed_views,
    blending_weights,
    psfs: Optional[List[np.ndarray]] = None,
    psf_type=PSFType.EFFICIENT_BAYESIAN,
    n_iterations: int = 10,
    lambda_reg: float = 0.0,
    min_value: float = 1e-4,
    output_spacing: Optional[dict] = None,
    na: float = 0.8,
    wavelength_um: float = 0.5,
    sample_boundary_erosion_px: int = 0,
):
    """Richardson-Lucy multiview deconvolution fusion (reference :251-499).

    Sequential per-view multiplicative updates with blending-weight-gated
    corrections; pass directly as ``fusion_func`` to :func:`..fusion.fuse`.
    """
    tv = np.asarray(transformed_views, dtype=np.float32)
    bw = np.asarray(blending_weights, dtype=np.float32)
    n_views = tv.shape[0]
    ndim = tv.ndim - 1
    input_dtype = transformed_views.dtype

    view_coverage = ~np.isnan(tv)
    observed = np.nan_to_num(tv, nan=0.0)

    if psfs is None:
        psf0 = (
            estimate_psf(output_spacing, na=na, wavelength_um=wavelength_um)
            if output_spacing is not None
            else make_gaussian_psf(1.5, ndim=ndim)
        )
        psfs_cpu = [psf0] * n_views
    else:
        if len(psfs) != n_views:
            raise ValueError(
                f"len(psfs) = {len(psfs)} but n_views = {n_views}."
            )
        psfs_cpu = [_norm(np.asarray(p, dtype=np.float32)) for p in psfs]

    # pad PSFs to a common (odd) shape
    max_shape = tuple(
        max(p.shape[d] for p in psfs_cpu) for d in range(ndim)
    )
    padded = []
    for p in psfs_cpu:
        if p.shape != max_shape:
            pw = []
            for a, t in zip(p.shape, max_shape):
                diff = t - a
                pw.append((diff // 2, diff - diff // 2))
            p = np.pad(p, pw, mode="constant")
        padded.append(_norm(p))
    psfs_cpu = padded

    kernels1 = [jnp.asarray(p) for p in psfs_cpu]
    kernels2 = [
        jnp.asarray(_compute_compound_kernel(v, psfs_cpu, psf_type))
        for v in range(n_views)
    ]

    psi0 = np.nansum(observed * bw, axis=0).astype(np.float32)
    psi0 = psi0.clip(np.float32(min_value))
    max_intensity = float(psi0.max())
    if max_intensity <= 0:
        max_intensity = 1.0

    psi = _rl_iterations(
        jnp.asarray(psi0),
        jnp.asarray(observed),
        jnp.asarray(view_coverage),
        jnp.asarray(bw),
        tuple(kernels1),
        tuple(kernels2),
        max_intensity,
        int(n_iterations),
        float(lambda_reg),
        float(min_value),
    )
    psi = np.asarray(psi)

    if sample_boundary_erosion_px > 0:
        union_mask = np.any(view_coverage, axis=0)
        eroded = _scipy_binary_erosion(
            union_mask, iterations=sample_boundary_erosion_px,
            border_value=1, brute_force=True,
        )
        psi = np.where(eroded, psi, np.float32(0.0))

    return psi.astype(input_dtype)


def _required_overlap_for_deconvolution(func_kwargs):
    """PSF half-width as the required chunk halo (reference :504-527)."""
    kwargs = func_kwargs or {}
    output_spacing = kwargs.get("output_spacing")
    if output_spacing is not None:
        psf = estimate_psf(
            output_spacing,
            na=kwargs.get("na", 0.8),
            wavelength_um=kwargs.get("wavelength_um", 0.5),
        )
        psf_size = max(psf.shape)
    else:
        psf_size = int(np.ceil(6.0 * 1.5)) | 1
    return psf_size // 2


multi_view_deconvolution.required_overlap = _required_overlap_for_deconvolution
