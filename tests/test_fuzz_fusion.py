"""Fuzz: fuse() vs a scipy oracle over random affine configurations.

Randomized rotations / anisotropic scales / spacings / origins exercise the
generic (gather-resample) fusion tier; a pure scipy re-creation of the
reference's chunk task (affine_transform per view + blending weights +
normalized weighted sum, reference fusion/_core.py:1513-1733) is the oracle.
"""

import numpy as np
import pytest
from scipy.ndimage import affine_transform

from multiview_stitcher_tpu import fusion, si_utils, weights
from multiview_stitcher_tpu.ops import resample as resample_ops


def _random_config(rng, ndim):
    n_views = int(rng.integers(2, 4))
    sims, params = [], []
    for _ in range(n_views):
        shape = tuple(int(rng.integers(24, 40)) for _ in range(ndim))
        data = rng.integers(0, 1000, shape).astype(np.uint16)
        spacing = {
            d: float(rng.uniform(0.5, 1.5))
            for d in ["z", "y", "x"][-ndim:]
        }
        translation = {
            d: float(rng.uniform(-5, 5)) for d in ["z", "y", "x"][-ndim:]
        }
        sim = si_utils.get_sim_from_array(
            data, dims=tuple(["z", "y", "x"][-ndim:]),
            scale=spacing, translation=translation,
        )
        # random small rotation + per-axis scale + shift in WORLD space
        theta = rng.uniform(-0.2, 0.2)
        rot = np.eye(ndim)
        rot[-2:, -2:] = [
            [np.cos(theta), -np.sin(theta)],
            [np.sin(theta), np.cos(theta)],
        ]
        scale = np.diag(rng.uniform(0.9, 1.1, ndim))
        m = np.eye(ndim + 1)
        m[:ndim, :ndim] = rot @ scale
        m[:ndim, ndim] = rng.uniform(-4, 4, ndim)
        si_utils.set_sim_affine(sim, m, transform_key="affine")
        sims.append(sim)
        params.append(m)
    return sims, params


def _scipy_oracle(sims, params, osp, sdims):
    ndim = len(sdims)
    out_shape = tuple(int(osp["shape"][d]) for d in sdims)
    tvs, bws = [], []
    for sim, pm in zip(sims, params):
        view_bb = si_utils.get_stack_properties_from_sim(sim)
        m, o = resample_ops.physical_to_pixel_params(
            np.linalg.inv(pm),
            input_spacing=np.array([view_bb["spacing"][d] for d in sdims]),
            input_origin=np.array([view_bb["origin"][d] for d in sdims]),
            output_spacing=np.array([osp["spacing"][d] for d in sdims]),
            output_origin=np.array([osp["origin"][d] for d in sdims]),
        )
        tv = affine_transform(
            sim.to_numpy().astype(np.float32), m, offset=o,
            output_shape=out_shape, order=1, mode="constant", cval=np.nan,
        )
        grid, gm, go = weights.blending_weights_pixel_params(
            osp, view_bb, pm
        )
        bw = affine_transform(
            grid, gm, offset=go, output_shape=out_shape, order=1,
            mode="constant", cval=0.0,
        )
        tvs.append(tv)
        bws.append(np.asarray(weights.cosine_weights(bw)))
    tvs = np.stack(tvs)
    bws = np.stack(bws) * ~np.isnan(tvs)
    wsum = np.nansum(bws, axis=0)
    wsum[wsum == 0] = 1
    fused = np.nansum(tvs * (bws / wsum), axis=0)
    return np.nan_to_num(fused).astype(np.uint16)


@pytest.mark.parametrize("seed,ndim", [(0, 2), (1, 2), (2, 2), (3, 3), (4, 3)])
def test_fuse_matches_scipy_oracle(seed, ndim):
    rng = np.random.default_rng(seed)
    sims, params = _random_config(rng, ndim)
    sdims = ["z", "y", "x"][-ndim:]

    fused = fusion.fuse(
        sims, transform_key="affine", output_chunksize=24,
    )
    osp = si_utils.get_stack_properties_from_sim(fused)
    osp = {
        "shape": {d: int(osp["shape"][d]) for d in sdims},
        "spacing": {d: float(osp["spacing"][d]) for d in sdims},
        "origin": {d: float(osp["origin"][d]) for d in sdims},
    }
    oracle = _scipy_oracle(sims, params, osp, sdims)
    out = fused.to_numpy()
    assert out.shape == oracle.shape
    diff = np.abs(out.astype(float) - oracle.astype(float))
    # bilinear resampling agrees to rounding at off-grid points; allow a
    # tiny fraction of boundary pixels to differ by quantization
    assert np.median(diff) == 0
    assert np.mean(diff > 1.5) < 0.02, (
        f"seed {seed}: {np.mean(diff > 1.5):.4f} of pixels differ, "
        f"max {diff.max()}"
    )


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_output_spacing_pallas_vs_xla(seed):
    """Random uniform output spacings (incl. fractional up/downscales)
    through the Pallas tier match the XLA tiers."""
    import os

    from multiview_stitcher_tpu.fusion import _core

    rng = np.random.default_rng(100 + seed)
    tile, overlap, n = 40, 12, 2
    step = tile - overlap
    sims = [
        si_utils.get_sim_from_array(
            (rng.random((tile, tile)) * 900).astype(np.float32),
            translation={"y": float(iy * step), "x": float(ix * step)},
        )
        for iy in range(n)
        for ix in range(n)
    ]
    sc = float(rng.choice([0.5, 0.75, 1.25, 1.5, 2.0, 3.0]))
    spacing = {"y": sc, "x": sc}
    out = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_spacing=spacing,
    ).to_numpy()
    _core.clear_device_tile_cache()
    os.environ["MVS_TPU_PALLAS"] = "0"
    try:
        ref = fusion.fuse(
            sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
            output_spacing=spacing,
        ).to_numpy()
    finally:
        os.environ.pop("MVS_TPU_PALLAS", None)
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-2)
