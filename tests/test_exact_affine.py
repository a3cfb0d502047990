"""Exact Pallas affine tier (ops/exact_affine.py) vs the gather oracle.

The kernels run in interpret mode on the CPU suite; on TPU they compile
to MXU banded-hat matmuls. Unlike the shear tier they are EXACT: parity
with the scipy-semantics gather tier is f32-ulp noise, not an
interpolation-model tolerance.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from multiview_stitcher_tpu import fusion, si_utils
from multiview_stitcher_tpu.fusion import _core
from multiview_stitcher_tpu.ops import exact_affine as ea
from multiview_stitcher_tpu.ops import resample as rs


def _rot2(theta, scale=1.0):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s], [s, c]]) * scale


@pytest.mark.parametrize(
    "theta,scale,off",
    [
        (0.3, 1.0, (2.3, -4.7)),
        (0.0, 1.0, (0.5, 0.5)),
        (-0.8, 1.3, (10.0, 3.2)),
        (1.4, 0.7, (-3.0, 8.1)),
    ],
)
def test_exact_2d_matches_gather(theta, scale, off):
    rng = np.random.default_rng(0)
    H, W = 60, 90
    data = (rng.random((H, W)) * 100).astype(np.float32)
    M = _rot2(theta, scale)
    o = np.array(off)
    out_shape = (50, 80)
    ref = np.asarray(
        rs.affine_resample(
            data, M.astype(np.float32), o.astype(np.float32),
            out_shape, order=1, cval=np.nan,
        )
    )
    win = ea.plan_windows_2d(M[None])
    assert win is not None
    got = np.asarray(
        ea.exact_affine_batch_2d(
            jnp.asarray(data)[None],
            jnp.asarray(M, jnp.float32)[None],
            jnp.asarray(o, jnp.float32)[None],
            jnp.asarray([[H, W]], jnp.float32),
            out_shape, tile=(8, 128), HW=win[0], WW=win[1],
            interpret=True,
        )
    )[0]
    # out-of-domain (cval) masks must be IDENTICAL
    np.testing.assert_array_equal(np.isnan(ref), np.isnan(got))
    m = ~np.isnan(ref)
    if m.any():
        # f32 position ulp noise only (~5e-5 relative on range-100 data)
        assert np.abs(ref[m] - got[m]).max() < 5e-3


@pytest.mark.parametrize("theta", [0.4, -0.7, 0.0, 1.2])
def test_exact_3d_sepy_matches_gather(theta):
    rng = np.random.default_rng(1)
    Sz, Sy, Sx = 20, 30, 40
    data = (rng.random((Sz, Sy, Sx)) * 100).astype(np.float32)
    c, s = np.cos(theta), np.sin(theta)
    # rotation around y + y scale: the y-decoupled multiview family
    M = np.array([[c, 0, -s], [0, 1.1, 0], [s, 0, c]])
    o = np.array([1.2, -2.3, 3.4])
    out_shape = (18, 25, 35)
    assert ea.is_y_decoupled(M[None])
    ref = np.asarray(
        rs.affine_resample(
            data, M.astype(np.float32), o.astype(np.float32),
            out_shape, order=1, cval=np.nan,
        )
    )
    win = ea.plan_windows_3d(M[None], tile=(8, 32, 128))
    assert win is not None
    got = np.asarray(
        ea.exact_affine_batch_3d_sepy(
            jnp.asarray(data)[None],
            jnp.asarray(M, jnp.float32)[None],
            jnp.asarray(o, jnp.float32)[None],
            jnp.asarray([[Sz, Sy, Sx]], jnp.float32),
            out_shape, tile=(8, 32, 128),
            ZS=win[0], XS=win[1], YW=win[2], interpret=True,
        )
    )[0]
    np.testing.assert_array_equal(np.isnan(ref), np.isnan(got))
    m = ~np.isnan(ref)
    if m.any():
        assert np.abs(ref[m] - got[m]).max() < 5e-3


def test_is_y_decoupled_rejects_general_rotation():
    # rotation mixing y with x: all axes coupled -> gather tier
    th = 0.3
    M = np.eye(3)
    M[1:3, 1:3] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    assert not ea.is_y_decoupled(M[None])
    # batches: one coupled map disqualifies the batch
    ok = np.array([[0.9, 0, -0.1], [0, 1, 0], [0.1, 0, 0.9]])
    assert ea.is_y_decoupled(ok[None])
    assert not ea.is_y_decoupled(np.stack([ok, M]))


def test_plan_windows_reject_oversized():
    # a 200x downscale map needs a window far beyond VMEM
    M = np.diag([200.0, 200.0])
    assert ea.plan_windows_2d(M[None], tile=(8, 128)) is None


def _smooth(shape, seed=3):
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    return gaussian_filter(rng.random(shape), 1.5).astype(np.float32)


def _roty_sims(ndim):
    """Two overlapping views, one rotated: 2D in-plane rotation / 3D
    rotation AROUND y (the light-sheet multiview geometry)."""
    if ndim == 2:
        img = _smooth((80, 80)) * 100
        th = 0.06
        R = np.eye(3)
        R[:2, :2] = _rot2(th)
        ms = [np.eye(3), R]
        mk = lambda i: si_utils.get_sim_from_array(
            img.copy(), translation={"y": 0.0, "x": i * 60.0}
        )
    else:
        vol = _smooth((40, 48, 48)) * 100
        th = 0.05
        R = np.eye(4)
        c, s = np.cos(th), np.sin(th)
        R[0, 0], R[0, 2], R[2, 0], R[2, 2] = c, -s, s, c  # rotate around y
        ms = [np.eye(4), R]
        mk = lambda i: si_utils.get_sim_from_array(
            vol.copy(),
            translation={"z": 0.0, "y": 0.0, "x": i * 36.0},
        )
    sims = []
    for i, m in enumerate(ms):
        sim = mk(i)
        si_utils.set_sim_affine(sim, m, transform_key="affine")
        sims.append(sim)
    return sims


@pytest.mark.parametrize("ndim,cs", [(2, 48), (3, 32)])
def test_fusion_exact_tier_matches_gather(ndim, cs, monkeypatch):
    """End-to-end fuse() of rotated views through the exact Pallas tier
    (MVS_TPU_EXACT_AFFINE=1) matches the gather tier to f32 noise — the
    exactness-by-default guarantee VERDICT r3 item 3 asks for."""
    calls = {"n": 0}
    orig = _core._fuse_chunk_batch_kernel_exact

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setenv("MVS_TPU_EXACT_AFFINE", "0")
    monkeypatch.setenv("MVS_TPU_SHEAR", "0")
    ref = fusion.fuse(
        _roty_sims(ndim), transform_key="affine", output_chunksize=cs
    ).to_numpy()
    monkeypatch.setenv("MVS_TPU_EXACT_AFFINE", "1")
    monkeypatch.setattr(_core, "_fuse_chunk_batch_kernel_exact", spy)
    out = fusion.fuse(
        _roty_sims(ndim), transform_key="affine", output_chunksize=cs
    ).to_numpy()
    assert calls["n"] >= 1, "exact tier not engaged"
    assert out.shape == ref.shape
    d = np.abs(out.astype(float) - ref.astype(float))
    # both tiers are exact: only f32 op-order noise remains
    assert d.max() <= 1.0  # uint16 rounding ties at f32 noise


def _coupled_sims(vol_shape=(24, 32, 32), th=0.08):
    """Two overlapping 3D views under a rotation that couples y with x —
    NOT in the sepy family; exercises the general exact kernel."""
    vol = _smooth(vol_shape) * 100
    R = np.eye(4)
    R[1:3, 1:3] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
    sims = []
    for i, m in enumerate([np.eye(4), R]):
        sim = si_utils.get_sim_from_array(
            vol.copy(),
            translation={"z": 0.0, "y": 0.0, "x": i * 24.0},
        )
        si_utils.set_sim_affine(sim, m, transform_key="affine")
        sims.append(sim)
    return sims


def test_fusion_general_3d_rotation_takes_general_tier(monkeypatch):
    """A 3D rotation coupling y (not in the sepy family) takes the
    GENERAL exact kernel (VERDICT r4 items 3-4: one exact code path for
    any affine, reference transformation.py:118-139) and matches the
    gather tier to f32 noise."""
    kinds = []
    orig = _core._fuse_chunk_batch_kernel_exact

    def spy(*a, **k):
        kinds.append(k.get("kind3d", "sepy"))
        return orig(*a, **k)

    monkeypatch.setenv("MVS_TPU_EXACT_AFFINE", "0")
    monkeypatch.setenv("MVS_TPU_SHEAR", "0")
    ref = fusion.fuse(
        _coupled_sims(), transform_key="affine", output_chunksize=32
    ).to_numpy()
    monkeypatch.setenv("MVS_TPU_EXACT_AFFINE", "1")
    monkeypatch.setattr(_core, "_fuse_chunk_batch_kernel_exact", spy)
    out = fusion.fuse(
        _coupled_sims(), transform_key="affine", output_chunksize=32
    ).to_numpy()
    assert kinds and all(k == "general" for k in kinds), kinds
    assert out.shape == ref.shape
    d = np.abs(out.astype(float) - ref.astype(float))
    assert d.max() <= 1.0  # uint16 rounding ties at f32 noise


@pytest.mark.parametrize("seed", [0, 1])
def test_exact_3d_general_matches_gather(seed):
    """Kernel-level scipy-parity for FULLY COUPLED 3D affines: weak
    near-identity coupling (the affine-groupwise-resolution family) and
    a strong two-axis rotation."""
    rng = np.random.default_rng(seed)
    Sz, Sy, Sx = 20, 30, 40
    data = (rng.random((Sz, Sy, Sx)) * 100).astype(np.float32)
    if seed == 0:
        M = np.eye(3) + rng.normal(0, 0.02, (3, 3))
    else:
        cy, sy = np.cos(0.4), np.sin(0.4)
        cz, sz = np.cos(0.2), np.sin(0.2)
        M = np.array(
            [[cy, 0, -sy], [0, 1, 0], [sy, 0, cy]]
        ) @ np.array([[1, 0, 0], [0, cz, -sz], [0, sz, cz]])
    o = np.array([1.2, -2.3, 3.4])
    out_shape = (18, 25, 35)
    assert not ea.is_y_decoupled(M[None])
    ref = np.asarray(
        rs.affine_resample(
            data, M.astype(np.float32), o.astype(np.float32),
            out_shape, order=1, cval=np.nan,
        )
    )
    win = ea.plan_windows_3d_general(M[None])
    assert win is not None
    got = np.asarray(
        ea.exact_affine_batch_3d_general(
            jnp.asarray(data)[None],
            jnp.asarray(M, jnp.float32)[None],
            jnp.asarray(o, jnp.float32)[None],
            jnp.asarray([[Sz, Sy, Sx]], jnp.float32),
            out_shape, tile=(8, 4, 32),
            ZS=win[0], YB=win[1], XS=win[2], interpret=True,
        )
    )[0]
    np.testing.assert_array_equal(np.isnan(ref), np.isnan(got))
    m = ~np.isnan(ref)
    assert m.any()
    assert np.abs(ref[m] - got[m]).max() < 5e-3


def test_plan_windows_3d_general_budgets_all_couplings():
    # couplings contribute to every window dim
    M = np.eye(3)
    base = ea.plan_windows_3d_general(M[None], tile=(8, 4, 32))
    M2 = np.eye(3)
    M2[0, 2] = 0.5  # z window must grow with |m02|*(TX-1)
    grown = ea.plan_windows_3d_general(M2[None], tile=(8, 4, 32))
    assert grown[0] > base[0]
    # oversized maps are rejected
    assert ea.plan_windows_3d_general(
        np.diag([200.0, 200.0, 200.0])[None]
    ) is None


def test_fusion_affine_resolved_params_take_exact_tier(monkeypatch):
    """VERDICT r4 item 3 'done' criterion: fusing with an
    affine-groupwise-resolution-style param set (every matrix entry
    perturbed, coupling >= 1e-2 — what linear_two_pass produces,
    reference linear_two_pass.py:216-545) takes the exact tier
    (spy-asserted general kernel) and matches the gather oracle."""
    rng = np.random.default_rng(5)
    vol = _smooth((24, 32, 32), seed=7) * 100
    sims_mk = lambda: [  # noqa: E731
        si_utils.get_sim_from_array(
            vol.copy(), translation={"z": 0.0, "y": 0.0, "x": i * 24.0}
        )
        for i in range(2)
    ]
    # affine-refined params: identity + couplings in [1e-2, 3e-2]
    params = []
    for _ in range(2):
        m = np.eye(4)
        m[:3, :3] += rng.uniform(1e-2, 3e-2, (3, 3)) * rng.choice(
            [-1, 1], (3, 3)
        )
        m[:3, 3] = rng.uniform(-1.5, 1.5, 3)
        params.append(m)
    assert not ea.is_y_decoupled(np.stack([p[:3, :3] for p in params]))

    def build():
        sims = sims_mk()
        for s, p in zip(sims, params):
            si_utils.set_sim_affine(s, p, transform_key="affine")
        return sims

    monkeypatch.setenv("MVS_TPU_EXACT_AFFINE", "0")
    monkeypatch.setenv("MVS_TPU_SHEAR", "0")
    ref = fusion.fuse(
        build(), transform_key="affine", output_chunksize=32
    ).to_numpy()

    kinds = []
    orig = _core._fuse_chunk_batch_kernel_exact

    def spy(*a, **k):
        kinds.append(k.get("kind3d", "sepy"))
        return orig(*a, **k)

    monkeypatch.setenv("MVS_TPU_EXACT_AFFINE", "1")
    monkeypatch.setattr(_core, "_fuse_chunk_batch_kernel_exact", spy)
    out = fusion.fuse(
        build(), transform_key="affine", output_chunksize=32
    ).to_numpy()
    assert kinds and all(k == "general" for k in kinds), kinds
    d = np.abs(out.astype(float) - ref.astype(float))
    assert d.max() <= 1.0


def test_exact_devtiles_matches_host_slabs(monkeypatch):
    """Device-resident-tiles exact fusion (slabs sliced on device) is
    bit-exact vs the host slab path, incl. mixed tile shapes."""
    rng = np.random.default_rng(9)
    th = 0.07
    R = np.eye(3)
    R[:2, :2] = _rot2(th)
    sims = []
    for i, (shp, org) in enumerate(
        [((40, 80), (0.0, 0.0)), ((60, 60), (20.0, 30.0))]
    ):
        data = rng.integers(100, 1100, size=shp).astype(np.uint16)
        sim = si_utils.get_sim_from_array(
            data, dims=("y", "x"),
            translation={"y": org[0], "x": org[1]},
        )
        si_utils.set_sim_affine(
            sim, R if i % 2 else np.eye(3), transform_key="affine"
        )
        sims.append(sim)

    monkeypatch.setenv("MVS_TPU_EXACT_AFFINE", "1")
    monkeypatch.setenv("MVS_TPU_SHEAR", "0")
    calls = {"dev": 0, "host": 0}
    orig_dev = _core._fuse_chunk_batch_kernel_exact_devtiles
    orig_host = _core._fuse_chunk_batch_kernel_exact

    def spy_dev(*a, **k):
        calls["dev"] += 1
        return orig_dev(*a, **k)

    monkeypatch.setattr(
        _core, "_fuse_chunk_batch_kernel_exact_devtiles", spy_dev
    )
    _core.clear_device_tile_cache()
    out_dev = fusion.fuse(
        sims, transform_key="affine", output_chunksize=32
    ).to_numpy()
    assert calls["dev"] >= 1, "devtiles exact path not engaged"

    monkeypatch.setenv("MVS_TPU_DEVICE_SLABS", "0")
    _core.clear_device_tile_cache()
    out_host = fusion.fuse(
        sims, transform_key="affine", output_chunksize=32
    ).to_numpy()
    d = np.abs(out_dev.astype(np.int64) - out_host.astype(np.int64))
    assert d.max() <= 1  # f32 op-order rounding ties only


def test_transform_sim_interior_nan_routes_to_gather(monkeypatch):
    """Regression (r4 review): float inputs carrying interior NaN (the
    invalid-pixel marker) must NOT take the exact tier, whose kernels
    zero-fill NaN — transform_sim must match the gather/scipy semantics
    where NaN propagates through the interpolation stencil."""
    from multiview_stitcher_tpu import transformation

    rng = np.random.default_rng(40)
    data = rng.random((40, 50)).astype(np.float32) * 100
    data[10:14, 10:18] = np.nan  # interior invalid region
    sim = si_utils.get_sim_from_array(data, dims=("y", "x"))
    th = 0.05
    m = np.eye(3)
    m[:2, :2] = _rot2(th)

    monkeypatch.setenv("MVS_TPU_EXACT_AFFINE", "0")
    ref = transformation.transform_sim(
        sim, np.linalg.inv(m), output_stack_properties={
            "origin": {"y": 0.0, "x": 0.0},
            "spacing": {"y": 1.0, "x": 1.0},
            "shape": {"y": 40, "x": 50},
        }, order=1,
    ).to_numpy()
    monkeypatch.setenv("MVS_TPU_EXACT_AFFINE", "1")
    out = transformation.transform_sim(
        sim, np.linalg.inv(m), output_stack_properties={
            "origin": {"y": 0.0, "x": 0.0},
            "spacing": {"y": 1.0, "x": 1.0},
            "shape": {"y": 40, "x": 50},
        }, order=1,
    ).to_numpy()
    # identical NaN sets and identical finite values
    np.testing.assert_array_equal(np.isnan(out), np.isnan(ref))
    np.testing.assert_allclose(
        np.nan_to_num(out), np.nan_to_num(ref), rtol=0, atol=1e-4
    )
    assert np.isnan(out).sum() > data.size // 400  # NaN actually present


def test_fusion_interior_nan_floats_skip_exact_tier(monkeypatch):
    """Regression (r4 review): fuse() of float views with interior NaN
    must not take the exact tier (which zero-fills NaN instead of
    excluding the pixels per view as the gather tier does)."""
    rng = np.random.default_rng(41)
    th = 0.06
    R = np.eye(3)
    R[:2, :2] = _rot2(th)
    sims = []
    for i in range(2):
        data = (rng.random((40, 60)) * 900 + 100).astype(np.float32)
        data[8:12, 20:30] = np.nan  # invalid interior pixels
        sim = si_utils.get_sim_from_array(
            data, dims=("y", "x"),
            translation={"y": 0.0, "x": i * 40.0},
        )
        si_utils.set_sim_affine(
            sim, R if i else np.eye(3), transform_key="affine"
        )
        sims.append(sim)

    calls = {"n": 0}
    orig = _core._fuse_chunk_batch_kernel_exact

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setenv("MVS_TPU_EXACT_AFFINE", "1")
    monkeypatch.setenv("MVS_TPU_SHEAR", "0")
    monkeypatch.setattr(_core, "_fuse_chunk_batch_kernel_exact", spy)
    out = fusion.fuse(
        sims, transform_key="affine", output_chunksize=32
    ).to_numpy()
    assert calls["n"] == 0, "NaN-carrying float views took the exact tier"

    monkeypatch.setenv("MVS_TPU_EXACT_AFFINE", "0")
    ref = fusion.fuse(
        sims, transform_key="affine", output_chunksize=32
    ).to_numpy()
    np.testing.assert_allclose(
        np.nan_to_num(out.astype(float)),
        np.nan_to_num(ref.astype(float)),
        rtol=0, atol=1.0,
    )


def test_fusion_clean_floats_still_take_exact_tier(monkeypatch):
    """The interior-NaN guard must not over-block: NaN-free float views
    still engage the exact tier."""
    rng = np.random.default_rng(42)
    th = 0.06
    R = np.eye(3)
    R[:2, :2] = _rot2(th)
    sims = []
    for i in range(2):
        data = (rng.random((40, 60)) * 900 + 100).astype(np.float32)
        sim = si_utils.get_sim_from_array(
            data, dims=("y", "x"),
            translation={"y": 0.0, "x": i * 40.0},
        )
        si_utils.set_sim_affine(
            sim, R if i else np.eye(3), transform_key="affine"
        )
        sims.append(sim)

    calls = {"n": 0}
    orig = _core._fuse_chunk_batch_kernel_exact

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setenv("MVS_TPU_EXACT_AFFINE", "1")
    monkeypatch.setenv("MVS_TPU_SHEAR", "0")
    monkeypatch.setenv("MVS_TPU_DEVICE_SLABS", "0")
    monkeypatch.setattr(_core, "_fuse_chunk_batch_kernel_exact", spy)
    out = fusion.fuse(
        sims, transform_key="affine", output_chunksize=32
    ).to_numpy()
    assert calls["n"] >= 1, "clean float views should take the exact tier"
    assert np.isfinite(out[out != 0]).all()


def test_fusion_falls_back_when_exact_kernel_fails(monkeypatch):
    """A Mosaic-class failure in the exact Pallas tier (e.g. a lowering
    rule interpret mode accepts but the real chip rejects — caught live
    on v5e with the general kernel's block shape) must degrade fuse() to
    the XLA tiers with a warning, not fail the call."""
    rng = np.random.default_rng(3)
    th = 0.1
    R = np.eye(3)
    R[:2, :2] = _rot2(th)
    sims = []
    for i in range(2):
        data = rng.integers(100, 1100, size=(40, 60)).astype(np.uint16)
        sim = si_utils.get_sim_from_array(
            data, dims=("y", "x"), translation={"y": 0.0, "x": i * 40.0}
        )
        si_utils.set_sim_affine(
            sim, R if i else np.eye(3), transform_key="affine"
        )
        sims.append(sim)

    monkeypatch.setenv("MVS_TPU_EXACT_AFFINE", "0")
    monkeypatch.setenv("MVS_TPU_SHEAR", "0")
    ref = fusion.fuse(
        [s.copy() for s in sims], transform_key="affine",
        output_chunksize=32,
    ).to_numpy()

    def boom(*a, **k):
        raise ValueError(
            "The Pallas TPU lowering currently requires ... (simulated)"
        )

    monkeypatch.setenv("MVS_TPU_EXACT_AFFINE", "1")
    monkeypatch.setattr(_core, "_fuse_chunk_batch_kernel_exact", boom)
    monkeypatch.setattr(
        _core, "_fuse_chunk_batch_kernel_exact_devtiles", boom
    )
    with pytest.warns(RuntimeWarning, match="retrying with the XLA"):
        out = fusion.fuse(
            [s.copy() for s in sims], transform_key="affine",
            output_chunksize=32,
        ).to_numpy()
    np.testing.assert_array_equal(out, ref)
