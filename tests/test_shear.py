"""Shear-decomposed affine resampling (ops/shear.py) — the fast affine
fusion tier. Oracles: the scipy-exact gather resampler (ops/resample.py)
for axis-aligned maps (exact) and smooth-data tolerance for rotations
(shear-warp approximation, see module docstring); end-to-end fusion parity
between MVS_TPU_SHEAR=1 and the default gather tier."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.ndimage import binary_erosion

from multiview_stitcher_tpu import fusion, si_utils
from multiview_stitcher_tpu.fusion import _core
from multiview_stitcher_tpu.ops import resample, shear


def _smooth(shape):
    g = np.meshgrid(
        *[np.linspace(0, 3 * np.pi, s) for s in shape], indexing="ij"
    )
    return (sum(np.sin(gg + k) for k, gg in enumerate(g)) + 3.0).astype(
        np.float32
    )


def _run_pair(M, o, in_shape, out_shape, data):
    res = shear.plan_shear(M[None], o[None], in_shape, out_shape)
    assert res is not None
    plan, ctx, coeffs = res
    out = np.asarray(
        shear.shear_resample(
            jnp.asarray(data), jnp.asarray(coeffs[0]),
            jnp.asarray(M, dtype=jnp.float32),
            jnp.asarray(o, dtype=jnp.float32),
            jnp.asarray(in_shape, dtype=jnp.float32), plan,
        )
    )
    ref = np.asarray(
        resample.affine_resample(
            jnp.asarray(data), jnp.asarray(M, dtype=jnp.float32),
            jnp.asarray(o, dtype=jnp.float32), out_shape,
        )
    )
    return out, ref


@pytest.mark.parametrize(
    "diag,off",
    [
        ([1.0, 1.0], [0.0, 0.0]),
        ([0.7, 1.3], [2.3, -1.7]),
        ([1.0, 1.0], [3.25, -0.5]),
    ],
)
def test_axis_aligned_exact_2d(diag, off):
    """Axis-aligned maps degenerate to the separable chain: EXACT parity
    with the gather oracle (incl. the NaN domain mask)."""
    M = np.diag(diag)
    o = np.asarray(off, float)
    data = _smooth((40, 44))
    out, ref = _run_pair(M, o, (40, 44), (36, 38), data)
    assert (np.isnan(out) == np.isnan(ref)).all()
    np.testing.assert_allclose(
        out[~np.isnan(out)], ref[~np.isnan(ref)], atol=1e-4
    )


def test_axis_aligned_exact_3d():
    M = np.diag([0.8, 1.1, 0.95])
    o = np.array([1.2, -2.0, 0.7])
    data = _smooth((32, 36, 40))
    out, ref = _run_pair(M, o, (32, 36, 40), (30, 30, 34), data)
    assert (np.isnan(out) == np.isnan(ref)).all()
    np.testing.assert_allclose(
        out[~np.isnan(out)], ref[~np.isnan(ref)], atol=1e-4
    )


@pytest.mark.parametrize("theta", [0.05, 0.15, 0.3])
def test_rotation_2d_interior_tolerance(theta):
    """Rotations: domain mask matches the oracle exactly; interior values
    within the shear-warp interpolation tolerance on smooth data."""
    R = np.array(
        [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    )
    o = np.array([3.0, -2.0])
    data = _smooth((64, 64))
    out, ref = _run_pair(R, o, (64, 64), (48, 48), data)
    assert (np.isnan(out) == np.isnan(ref)).all()
    both = ~np.isnan(out)
    interior = binary_erosion(both, iterations=3)
    assert np.abs(out[interior] - ref[interior]).max() < 0.02


def test_rotation_3d_linear_data_exact():
    """On linear (affine) images every lerp pass is exact — any interior
    deviation indicates a coordinate-map bug, not interpolation blur."""
    th = 0.2
    R = np.array(
        [[1, 0, 0],
         [0, np.cos(th), -np.sin(th)],
         [0, np.sin(th), np.cos(th)]]
    )
    o = np.array([1.0, 2.0, -1.0])
    g = np.meshgrid(*[np.arange(s) for s in (40, 40, 40)], indexing="ij")
    data = sum((k + 0.5) * gg for k, gg in enumerate(g)).astype(np.float32)
    out, ref = _run_pair(R, o, (40, 40, 40), (36, 36, 36), data)
    both = ~np.isnan(out)
    interior = binary_erosion(both, iterations=4)
    assert np.abs(out[interior] - ref[interior]).max() < 1e-3


def test_large_rotation_uses_axis_permutation():
    """>45deg rotations stay factorable because the planner may permute
    axes first (shears stay below the cap)."""
    th = 1.2  # ~69 deg
    R = np.array(
        [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    )
    res = shear.plan_shear(
        R[None], np.zeros((1, 2)), (64, 64), (48, 48)
    )
    assert res is not None
    plan = res[0]
    assert plan.perm != (0, 1)


def test_singular_matrix_rejected():
    M = np.array([[1.0, 0.0], [1.0, 0.0]])
    assert (
        shear.plan_shear(M[None], np.zeros((1, 2)), (32, 32), (32, 32))
        is None
    )


def test_ctx_coeffs_cover_padded_identity_batch():
    """ShearCtx re-derives coefficients for batches padded with identity
    maps (fusion pads view lists) — identity factors under any frozen
    plan and the planned maps reproduce their original coefficients."""
    th = 0.1
    R = np.array(
        [[1, 0, 0],
         [0, np.cos(th), -np.sin(th)],
         [0, np.sin(th), np.cos(th)]]
    )
    mats = np.stack([R, R @ np.diag([0.9, 1.1, 1.0])])
    offs = np.array([[1.0, 2.0, -1.0], [0.5, -0.5, 2.0]])
    plan, ctx, coeffs = shear.plan_shear(mats, offs, (40, 40, 40), (36, 36, 36))
    padded_m = np.stack([mats[0], mats[1], np.eye(3)])
    padded_o = np.stack([offs[0], offs[1], np.zeros(3)])
    cb = ctx.coeffs(padded_m, padded_o)
    np.testing.assert_allclose(cb[:2], coeffs, atol=1e-6)
    # batched execution over the padded set runs and matches per-element
    data = _smooth((40, 40, 40))
    out = np.asarray(
        shear.shear_resample_batch(
            jnp.asarray(np.stack([data] * 3)), jnp.asarray(cb),
            jnp.asarray(padded_m, dtype=jnp.float32),
            jnp.asarray(padded_o, dtype=jnp.float32),
            jnp.asarray(np.tile([40.0, 40.0, 40.0], (3, 1))), plan,
        )
    )
    single = np.asarray(
        shear.shear_resample(
            jnp.asarray(data), jnp.asarray(cb[2]),
            jnp.asarray(np.eye(3), dtype=jnp.float32),
            jnp.asarray(np.zeros(3), dtype=jnp.float32),
            jnp.asarray([40.0, 40.0, 40.0]), plan,
        )
    )
    np.testing.assert_allclose(
        out[2][~np.isnan(single)], single[~np.isnan(single)], atol=1e-5
    )


def test_refine_grid_is_same_plinear_function():
    """refine_grid(g, f): linear interp of the refined grid is the same
    function — spot-check at off-node points via the gather oracle."""
    rng = np.random.default_rng(0)
    g = rng.random((5, 5), dtype=np.float32)
    gf = np.asarray(shear.refine_grid(jnp.asarray(g), 4))
    assert gf.shape == (17, 17)
    # sample both at random points: c on original grid, 4c on refined
    pts = rng.uniform(0, 4, (50, 2))
    for c in pts[:10]:
        v0 = np.asarray(
            resample.affine_resample(
                jnp.asarray(g), jnp.asarray(np.eye(2), dtype=jnp.float32),
                jnp.asarray(c, dtype=jnp.float32), (1, 1),
            )
        )[0, 0]
        v1 = np.asarray(
            resample.affine_resample(
                jnp.asarray(gf), jnp.asarray(np.eye(2), dtype=jnp.float32),
                jnp.asarray(4 * c, dtype=jnp.float32), (1, 1),
            )
        )[0, 0]
        assert abs(v0 - v1) < 1e-5


def _rotated_sims(ndim):
    if ndim == 2:
        img = _smooth((80, 80)) * 100
        th = 0.06
        R = np.eye(3)
        R[:2, :2] = [
            [np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]
        ]
        ms = [np.eye(3), R]
        mk = lambda i: si_utils.get_sim_from_array(
            img.copy(), translation={"y": 0.0, "x": i * 60.0}
        )
    else:
        vol = _smooth((40, 48, 48)) * 100
        th = 0.05
        R = np.eye(4)
        R[1:3, 1:3] = [
            [np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]
        ]
        ms = [np.eye(4), R]
        mk = lambda i: si_utils.get_sim_from_array(
            vol.copy(), translation={"z": 0.0, "y": 0.0, "x": i * 36.0}
        )
    sims = []
    for i, m in enumerate(ms):
        sim = mk(i)
        si_utils.set_sim_affine(sim, m, transform_key="affine")
        sims.append(sim)
    return sims


@pytest.mark.parametrize("ndim,cs", [(2, 48), (3, 32)])
def test_fusion_shear_tier_matches_gather(ndim, cs, monkeypatch):
    """End-to-end fuse() with MVS_TPU_SHEAR=1 engages the shear kernel and
    matches the gather tier within the documented tolerance."""
    calls = {"n": 0}
    orig = _core._fuse_chunk_batch_kernel_shear
    orig_dev = _core._fuse_chunk_batch_kernel_shear_devtiles

    def spy(*a):
        calls["n"] += 1
        return orig(*a)

    def spy_dev(*a):
        calls["n"] += 1
        return orig_dev(*a)

    monkeypatch.setenv("MVS_TPU_SHEAR", "0")
    ref = fusion.fuse(
        _rotated_sims(ndim), transform_key="affine", output_chunksize=cs
    ).to_numpy()
    monkeypatch.setenv("MVS_TPU_SHEAR", "1")
    monkeypatch.setattr(_core, "_fuse_chunk_batch_kernel_shear", spy)
    monkeypatch.setattr(
        _core, "_fuse_chunk_batch_kernel_shear_devtiles", spy_dev
    )
    out = fusion.fuse(
        _rotated_sims(ndim), transform_key="affine", output_chunksize=cs
    ).to_numpy()
    assert calls["n"] >= 1, "shear kernel not engaged"
    assert out.shape == ref.shape
    d = np.abs(out.astype(float) - ref.astype(float))
    # data range ~600; seams/borders may deviate by the shear-warp
    # tolerance, the bulk must agree tightly
    assert np.percentile(d, 99) < 3.0
    assert d.mean() < 0.5
    assert (d > 0.05 * ref.max()).mean() < 0.002

def _mixed_shape_sims():
    """Two overlapping views with DIFFERENT shapes, one rotated: routes
    the shear tier's device-tiles path through _pad_stack (mixed-shape
    stack assembly). Regression layout for the zero- vs edge-padding
    parity bug (review finding: devtiles read zero padding where the
    host slab path edge-replicates, up to 74-count errors)."""
    rng = np.random.default_rng(1)
    th = 0.05
    R = np.eye(3)
    R[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    sims = []
    for i, (shp, org) in enumerate(
        [((40, 80), (0.0, 0.0)), ((60, 60), (20.0, 30.0))]
    ):
        data = rng.integers(100, 1100, size=shp).astype(np.uint16)
        sim = si_utils.get_sim_from_array(
            data, dims=("y", "x"),
            scale={"y": 1.0, "x": 1.0},
            translation={"y": org[0], "x": org[1]},
        )
        si_utils.set_sim_affine(
            sim, R if i % 2 else np.eye(3), transform_key="affine"
        )
        sims.append(sim)
    return sims


def test_shear_devtiles_mixed_shapes_match_host_slabs(monkeypatch):
    """Device-resident-tiles shear fusion is bit-exact vs the host slab
    path for MIXED tile shapes (edge-replicated _pad_stack; zero padding
    regressed this by up to 74 intensity counts at small-tile edges)."""
    monkeypatch.setenv("MVS_TPU_SHEAR", "1")
    calls = {"dev": 0}
    orig_dev = _core._fuse_chunk_batch_kernel_shear_devtiles

    def spy_dev(*a, **k):
        calls["dev"] += 1
        return orig_dev(*a, **k)

    monkeypatch.setattr(
        _core, "_fuse_chunk_batch_kernel_shear_devtiles", spy_dev
    )
    monkeypatch.setenv("MVS_TPU_DEVICE_SLABS", "1")
    _core.clear_device_tile_cache()
    a = fusion.fuse(_mixed_shape_sims(), transform_key="affine").to_numpy()
    assert calls["dev"] >= 1, "device-tiles shear kernel not engaged"
    monkeypatch.setenv("MVS_TPU_DEVICE_SLABS", "0")
    _core.clear_device_tile_cache()
    b = fusion.fuse(_mixed_shape_sims(), transform_key="affine").to_numpy()
    assert a.shape == b.shape
    np.testing.assert_array_equal(a, b)
