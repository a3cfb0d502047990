"""Image-quality metric kernels (SSIM, Spearman, NCC) in JAX.

TPU-native replacements for the skimage/scipy metrics the reference uses to
disambiguate and score registrations
(/root/reference/src/multiview_stitcher/registration.py:109-111, :535-553 and
metrics.py:42). The SSIM follows skimage.metrics.structural_similarity with
uniform windows; instead of slicing a data-dependent bounding box (dynamic
shapes), the SSIM map is computed over the full static-shape image and then
averaged over the interior of the box — windows fully inside the box read
exactly the same pixels as slice-then-filter, so the mean is identical to the
reference's for every candidate whose box admits the window.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from multiview_stitcher_tpu.ops.filters import uniform_filter


def nan_aware_ncc(im0, im1):
    """NaN-aware normalized cross correlation (reference metrics.py:42)."""
    xp = jnp if isinstance(im0, jnp.ndarray) else np
    mask = ~(xp.isnan(im0) | xp.isnan(im1))
    n = xp.sum(mask)
    a = xp.where(mask, im0, 0.0)
    b = xp.where(mask, im1, 0.0)
    n_safe = xp.maximum(n, 1)
    ma = xp.sum(a) / n_safe
    mb = xp.sum(b) / n_safe
    va = xp.sum(xp.where(mask, (im0 - ma) ** 2, 0.0)) / n_safe
    vb = xp.sum(xp.where(mask, (im1 - mb) ** 2, 0.0)) / n_safe
    cov = xp.sum(xp.where(mask, (im0 - ma) * (im1 - mb), 0.0)) / n_safe
    denom = xp.sqrt(va * vb)
    return xp.where((n > 1) & (denom > 0), cov / denom, xp.nan)


def ssim_map(im0, im1, win_size: int, data_range: float):
    """Per-pixel SSIM map with uniform windows (skimage defaults).

    Uses the sample-covariance normalization skimage applies
    (cov_norm = NP/(NP-1)).
    """
    im0 = jnp.asarray(im0, dtype=jnp.float32)
    im1 = jnp.asarray(im1, dtype=jnp.float32)
    ndim = im0.ndim
    NP = win_size**ndim
    cov_norm = NP / (NP - 1)

    filt = lambda x: uniform_filter(x, win_size)
    ux = filt(im0)
    uy = filt(im1)
    uxx = filt(im0 * im0)
    uyy = filt(im1 * im1)
    uxy = filt(im0 * im1)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux**2 + uy**2 + C1
    B2 = vx + vy + C2
    return (A1 * A2) / (B1 * B2)


def _bbox_bounds_from_mask(mask):
    """Per-dim (lo, hi) index bounds of the True region (static-shape ops)."""
    ndim = mask.ndim
    los, his = [], []
    for ax in range(ndim):
        axes = tuple(a for a in range(ndim) if a != ax)
        line = jnp.any(mask, axis=axes)
        idx = jnp.arange(line.shape[0])
        lo = jnp.min(jnp.where(line, idx, line.shape[0]))
        hi = jnp.max(jnp.where(line, idx, -1))
        los.append(lo)
        his.append(hi)
    return jnp.stack(los), jnp.stack(his)


def _box_mask(shape, los, his):
    ndim = len(shape)
    mask = jnp.ones(shape, dtype=bool)
    for ax in range(ndim):
        idx = jnp.arange(shape[ax]).reshape(
            (1,) * ax + (-1,) + (1,) * (ndim - ax - 1)
        )
        mask = mask & (idx >= los[ax]) & (idx <= his[ax])
    return mask


def ssim_fixed_maps(im0, win_size: int):
    """Precompute the fixed-image filter maps (ux, uxx) reused across many
    moving images (candidate translations)."""
    im0 = jnp.asarray(im0, dtype=jnp.float32)
    filt = lambda x: uniform_filter(x, win_size)
    return filt(im0), filt(im0 * im0)


def ssim_map_precomputed(im0, ux, uxx, im1, win_size: int, data_range: float):
    """SSIM map against a moving image using precomputed fixed maps."""
    im0 = jnp.asarray(im0, dtype=jnp.float32)
    im1 = jnp.asarray(im1, dtype=jnp.float32)
    ndim = im0.ndim
    NP = win_size**ndim
    cov_norm = NP / (NP - 1)
    filt = lambda x: uniform_filter(x, win_size)
    uy = filt(im1)
    uyy = filt(im1 * im1)
    uxy = filt(im0 * im1)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    K1, K2 = 0.01, 0.03
    C1 = (K1 * data_range) ** 2
    C2 = (K2 * data_range) ** 2
    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux**2 + uy**2 + C1
    B2 = vx + vy + C2
    return (A1 * A2) / (B1 * B2)


def ssim_mean_over_box_precomputed(
    im0, ux, uxx, im1, los, his, win_size: int, data_range: float
):
    pad = (win_size - 1) // 2
    smap = ssim_map_precomputed(im0, ux, uxx, im1, win_size, data_range)
    interior = _box_mask(im0.shape, los + pad, his - pad)
    n = jnp.sum(interior)
    total = jnp.sum(jnp.where(interior, smap, 0.0))
    return jnp.where(n > 0, total / jnp.maximum(n, 1), -1.0)


def ssim_mean_over_box(im0, im1, los, his, win_size: int, data_range: float):
    """Mean SSIM over box [lo, hi], cropping pad from each side.

    Equals skimage ``structural_similarity(im0[box], im1[box])`` whenever the
    box admits the window (box extent >= win_size per dim).
    """
    pad = (win_size - 1) // 2
    smap = ssim_map(im0, im1, win_size, data_range)
    interior = _box_mask(im0.shape, los + pad, his - pad)
    n = jnp.sum(interior)
    total = jnp.sum(jnp.where(interior, smap, 0.0))
    return jnp.where(n > 0, total / jnp.maximum(n, 1), -1.0)


# ---------------------------------------------------------------------------
# Spearman correlation over a masked subset (scipy.stats.spearmanr semantics)
# ---------------------------------------------------------------------------


def _average_ranks_sorted(v_sorted, n_valid):
    """Tie-averaged ranks for an ascending-sorted vector (invalids at +inf).

    Scan formulation: within each run of equal values the rank is the mean
    of the run's first and last positions. ``first`` propagates each run
    start forward (running max of start indices); ``last`` propagates each
    run end backward (reverse running min of next-start indices, minus 1).
    TPU sorts are the expensive primitive here; two log-depth scans replace
    the vectorized binary searches (jnp.searchsorted), which cost ~4x a
    sort at these sizes.
    """
    n = v_sorted.shape[0]
    idx = jnp.arange(n, dtype=jnp.float32)
    start = jnp.concatenate(
        [jnp.ones((1,), bool), v_sorted[1:] != v_sorted[:-1]]
    )
    first = jax.lax.associative_scan(
        jnp.maximum, jnp.where(start, idx, -1.0)
    )
    # sentinel n (not +inf): the final run's "next start" is one past the
    # end, giving it last index n - 1
    next_start = jnp.concatenate(
        [jnp.where(start[1:], idx[1:], float(n)), jnp.full((1,), float(n))]
    )
    last = (
        jax.lax.associative_scan(jnp.minimum, next_start, reverse=True) - 1.0
    )
    return (first + last) / 2.0 + 1.0


def masked_spearman(im0, im1, mask):
    """Spearman rho of im0[mask] vs im1[mask] (tie-averaged ranks)."""
    a = jnp.asarray(im0).reshape(-1)
    b = jnp.asarray(im1).reshape(-1)
    m = jnp.asarray(mask).reshape(-1)
    n = jnp.sum(m)

    big = jnp.inf

    def ranks(x):
        xv = jnp.where(m, x, big)
        # one sort carrying the permutation, scan-based tie averaging, and
        # a scatter back to original positions
        iota = jnp.arange(xv.shape[0], dtype=jnp.int32)
        xs, order = jax.lax.sort((xv, iota), num_keys=1)
        r_sorted = _average_ranks_sorted(xs, n)
        r = jnp.zeros_like(r_sorted).at[order].set(r_sorted)
        return jnp.where(m, r, 0.0)

    ra = ranks(a)
    rb = ranks(b)
    nf = jnp.maximum(n, 1).astype(jnp.float32)
    ma = jnp.sum(ra) / nf
    mb = jnp.sum(rb) / nf
    da = jnp.where(m, ra - ma, 0.0)
    db = jnp.where(m, rb - mb, 0.0)
    cov = jnp.sum(da * db)
    denom = jnp.sqrt(jnp.sum(da * da) * jnp.sum(db * db))
    return jnp.where((n > 1) & (denom > 0), cov / denom, jnp.nan)


def structural_similarity(im0, im1, win_size: int = 7,
                          data_range: Optional[float] = None):
    """Global-mean SSIM of two full images (skimage-compatible mean)."""
    im0 = jnp.asarray(im0)
    im1 = jnp.asarray(im1)
    if data_range is None:
        data_range = float(
            max(jnp.max(im0), jnp.max(im1)) - min(jnp.min(im0), jnp.min(im1))
        )
    pad = (win_size - 1) // 2
    smap = ssim_map(im0, im1, win_size, data_range)
    crop = tuple(slice(pad, s - pad) for s in im0.shape)
    return jnp.mean(smap[crop])
