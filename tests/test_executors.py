import numpy as np
import pytest

from multiview_stitcher_tpu import msi_utils, registration, si_utils
from multiview_stitcher_tpu.io import ngff_utils
from multiview_stitcher_tpu.parallel import executors


def _write_tiles(tmp_path, shift=(1.5, -2.0)):
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter

    scene = (gaussian_filter(rng.random((80, 150)), 1.2) * 1000).astype(
        np.uint16
    )
    t0, t1 = scene[:, :90], scene[:, 60:]
    specs = []
    for i, (tile, x0) in enumerate([(t0, 0.0), (t1, 60.0)]):
        url = str(tmp_path / f"tile{i}.ome.zarr")
        s = si_utils.get_sim_from_array(
            tile, dims=("y", "x"), translation={"y": 0.0, "x": x0},
            scale={"y": 1.0, "x": 1.0},
        )
        ngff_utils.write_sim_to_ome_zarr(s, url, overwrite=True)
        origin = {"y": 0.0, "x": x0}
        if i == 1:
            origin = {"y": shift[0], "x": x0 + shift[1]}
        specs.append(executors.SourceSpec(url=url, origin=origin))
    return scene, specs


def test_spec_roundtrip(tmp_path):
    scene, specs = _write_tiles(tmp_path)
    js = specs[0].to_json()
    back = executors.SourceSpec.from_json(js)
    msim = back.open_msim()
    sim = msi_utils.get_sim_from_msim(msim)
    assert sim.sizes["x"] == 90


def test_spec_pairwise_executor(tmp_path):
    """register() with work shipped through JSON specs matches local run."""
    shift = (1.5, -2.0)
    scene, specs = _write_tiles(tmp_path, shift)
    msims = [spec.open_msim() for spec in specs]

    executor = executors.make_spec_pairwise_executor(specs)
    params = registration.register(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        pairwise_executor=executor,
    )
    m = np.asarray(params[1].squeeze())
    # resolved param cancels the metadata error
    np.testing.assert_allclose(m[:2, 2], [-shift[0], -shift[1]], atol=0.3)


def test_partition_blocks():
    parts = [executors.partition_blocks(10, 3, i) for i in range(3)]
    all_blocks = sorted(b for p in parts for b in p)
    assert all_blocks == list(range(10))
    for a in range(3):
        for b in range(a + 1, 3):
            assert not set(parts[a]) & set(parts[b])


def test_multiworker_streaming_fusion(tmp_path):
    """Two 'workers' fuse disjoint block subsets into one shared store."""
    scene, specs = _write_tiles(tmp_path, shift=(0.0, 0.0))
    out_url = str(tmp_path / "fused.zarr")

    n_done = 0
    for worker_index in range(2):
        n_done += executors.fuse_block_subset(
            specs,
            out_url,
            transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
            worker_index=worker_index,
            n_workers=2,
            output_chunksize=64,
            create_output=True,
        )
    assert n_done >= 2

    from multiview_stitcher_tpu.io import zarr_backend

    out = np.asarray(zarr_backend.open_zarr_array(out_url))
    assert out.shape == scene.shape
    err = np.abs(out.astype(float) - scene.astype(float))
    assert np.median(err) < 5


def test_fuse_with_mesh_matches_unsharded(monkeypatch):
    """fuse(mesh=...) shards the chunk axis over the device mesh and must
    reproduce the single-device result exactly (same XLA tiles tier; the
    Pallas tier accumulates in a different order)."""
    import jax

    monkeypatch.setenv("MVS_TPU_PALLAS", "0")

    from multiview_stitcher_tpu import fusion, si_utils
    from multiview_stitcher_tpu.parallel import mesh as mesh_utils

    rng = np.random.default_rng(5)
    n, tile, overlap = 3, 40, 10
    step = tile - overlap
    sims = [
        si_utils.get_sim_from_array(
            rng.integers(0, 1000, (tile, tile)).astype(np.uint16),
            translation={"y": float(iy * step), "x": float(ix * step)},
        )
        for iy in range(n)
        for ix in range(n)
    ]
    ref = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_chunksize=32,
    ).to_numpy()
    mesh = mesh_utils.get_mesh(len(jax.devices()))
    out = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_chunksize=32, mesh=mesh,
    ).to_numpy()
    np.testing.assert_array_equal(out, ref)


@pytest.mark.slow
def test_register_with_mesh_matches_unsharded():
    """register(mesh=...) shards the pairwise batch across the mesh and must
    reproduce the single-device transforms."""
    import jax

    from multiview_stitcher_tpu import (
        msi_utils,
        registration,
        sample_data,
        si_utils,
    )
    from multiview_stitcher_tpu.parallel import mesh as mesh_utils

    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_c=1, N_t=1, tile_size=40, tiles_x=3, tiles_y=3,
        overlap=10, zoom=4, shift_scale=1.0, drift_scale=0.0,
    )

    def run(mesh=None):
        msims = [
            msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims
        ]
        registration.register(
            msims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
            new_transform_key="registered", reg_channel_index=0,
            pre_registration_pruning_method=None, mesh=mesh,
        )
        return np.stack(
            [
                np.asarray(
                    msi_utils.get_transform_from_msim(m, "registered").squeeze()
                )
                for m in msims
            ]
        )

    ref = run()
    out = run(mesh_utils.get_mesh(len(jax.devices())))
    np.testing.assert_allclose(out, ref, atol=1e-8)


def test_fuse_with_odd_mesh_size(monkeypatch):
    """Chunk counts that don't divide the mesh size are padded correctly."""
    import jax
    from jax.sharding import Mesh

    monkeypatch.setenv("MVS_TPU_PALLAS", "0")

    from multiview_stitcher_tpu import fusion, si_utils

    devs = jax.devices()
    if len(devs) < 3:
        pytest.skip("needs >= 3 devices")
    mesh = Mesh(np.array(devs[:3]), ("data",))
    rng = np.random.default_rng(6)
    step = 30
    sims = [
        si_utils.get_sim_from_array(
            rng.integers(0, 1000, (40, 40)).astype(np.uint16),
            translation={"y": float(iy * step), "x": float(ix * step)},
        )
        for iy in range(2)
        for ix in range(2)
    ]
    # 70x70 output with chunk 32 -> 9 chunks, not divisible by 3? (it is);
    # use chunk 24 -> 3x3=9... choose chunk usage making C=16: chunk 18 ->
    # 4x4=16 chunks, 16 % 3 != 0 exercises the padding
    ref = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_chunksize=18,
    ).to_numpy()
    out = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_chunksize=18, mesh=mesh,
    ).to_numpy()
    np.testing.assert_array_equal(out, ref)


def test_fuse_with_mesh_pallas_tier(monkeypatch):
    """The Pallas translation tier runs under a device mesh: the output is
    band-split over the mesh's leading axis (kernel ``origin`` support) and
    must match the single-device Pallas result bit-for-bit."""
    import jax

    from multiview_stitcher_tpu import fusion, si_utils
    from multiview_stitcher_tpu.fusion import _core
    from multiview_stitcher_tpu.parallel import mesh as mesh_utils

    rng = np.random.default_rng(9)
    n, tile, overlap = 3, 40, 10
    step = tile - overlap
    sims = [
        si_utils.get_sim_from_array(
            rng.integers(0, 1000, (tile, tile)).astype(np.uint16),
            translation={"y": float(iy * step), "x": float(ix * step)},
        )
        for iy in range(n)
        for ix in range(n)
    ]
    # small kernel tiles so the band split over 8 devices is non-trivial
    monkeypatch.setenv("MVS_TPU_PALLAS_TILE_2D", "8,128")
    called = {"sharded": 0}
    orig = _core._pallas_fused_sharded

    def spy(*args, **kwargs):
        called["sharded"] += 1
        return orig(*args, **kwargs)

    monkeypatch.setattr(_core, "_pallas_fused_sharded", spy)
    ref = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY
    ).to_numpy()
    assert called["sharded"] == 0
    mesh = mesh_utils.get_mesh(len(jax.devices()))
    out = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY, mesh=mesh,
    ).to_numpy()
    assert called["sharded"] == 1
    np.testing.assert_array_equal(out, ref)


def test_pipeline_sharded_helpers_match_unsharded():
    """parallel.pipeline helpers (P1 pair batches / P2 chunk batches) match
    the unsharded kernels on the virtual mesh."""
    import jax

    from multiview_stitcher_tpu.fusion._core import _fuse_chunk_batch_kernel
    from multiview_stitcher_tpu.ops import phase_correlation as pc_ops
    from multiview_stitcher_tpu.parallel import mesh as mesh_utils
    from multiview_stitcher_tpu.parallel import pipeline

    mesh = mesh_utils.get_mesh(len(jax.devices()))
    rng = np.random.default_rng(4)
    N = len(jax.devices()) * 2
    f = rng.random((N, 32, 32)).astype(np.float32)
    m = np.roll(f, 3, axis=2)
    shifts, peaks = pipeline.sharded_pairwise_shifts(f, m, mesh)
    ref_shifts, ref_peaks = pc_ops.phase_cross_correlation_batch(
        f, m, upsample_factor=10
    )
    np.testing.assert_allclose(
        np.asarray(shifts), np.asarray(ref_shifts), atol=1e-5
    )

    C, K, S = N, 2, (16, 16)
    slabs = rng.random((C, K) + tuple(s + 4 for s in S)).astype(np.float32)
    mats = np.broadcast_to(np.eye(2, dtype=np.float32), (C, K, 2, 2)).copy()
    offs = np.zeros((C, K, 2), np.float32)
    wgrids = np.ones((C, K, 5, 5), np.float32)
    wmats = np.broadcast_to(
        np.diag([0.25, 0.25]).astype(np.float32), (C, K, 2, 2)
    ).copy()
    woffs = np.zeros((C, K, 2), np.float32)
    valid = np.ones((C, K), bool)
    fused = pipeline.sharded_fuse_chunks(
        slabs, mats, offs, wgrids, wmats, woffs, valid, S, mesh
    )
    ref = _fuse_chunk_batch_kernel(
        slabs, mats, offs, wgrids, wmats, woffs,
        valid, S, "weighted_average", True,
    )
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=1e-5
    )


def test_fuse_with_mesh_pallas_tier_nonunit_scale(monkeypatch):
    """Band-split Pallas execution composes with a non-unit output scale
    (coarser output spacing) and matches the single-device result."""
    import jax

    from multiview_stitcher_tpu import fusion, si_utils
    from multiview_stitcher_tpu.fusion import _core
    from multiview_stitcher_tpu.parallel import mesh as mesh_utils

    rng = np.random.default_rng(13)
    n, tile, overlap = 3, 40, 10
    step = tile - overlap
    sims = [
        si_utils.get_sim_from_array(
            rng.integers(0, 1000, (tile, tile)).astype(np.uint16),
            translation={"y": float(iy * step), "x": float(ix * step)},
        )
        for iy in range(n)
        for ix in range(n)
    ]
    monkeypatch.setenv("MVS_TPU_PALLAS_TILE_2D", "8,128")
    spacing = {"y": 2.0, "x": 2.0}
    ref = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_spacing=spacing,
    ).to_numpy()
    _core.clear_device_tile_cache()
    mesh = mesh_utils.get_mesh(len(jax.devices()))
    out = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        output_spacing=spacing, mesh=mesh,
    ).to_numpy()
    np.testing.assert_array_equal(out, ref)


def test_sharded_exact_affine_chunks_match_unsharded():
    """parallel.pipeline.sharded_fuse_chunks_exact: the EXACT Pallas
    affine tier sharded over the chunk axis matches the unsharded kernel
    on the virtual mesh (multi-chip rotated multiview fusion)."""
    import jax

    from multiview_stitcher_tpu.fusion._core import (
        _fuse_chunk_batch_kernel_exact,
    )
    from multiview_stitcher_tpu.ops import exact_affine as ea
    from multiview_stitcher_tpu.parallel import mesh as mesh_utils
    from multiview_stitcher_tpu.parallel import pipeline

    mesh = mesh_utils.get_mesh(len(jax.devices()))
    rng = np.random.default_rng(5)
    C, K = len(jax.devices()), 2
    th = 0.1
    R = np.array(
        [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32
    )
    S_in, out_shape = (40, 48), (32, 40)
    slabs = (rng.random((C, K) + S_in) * 500).astype(np.float32)
    mats = np.broadcast_to(R, (C, K, 2, 2)).copy()
    offs = rng.random((C, K, 2)).astype(np.float32) * 3
    extents = np.broadcast_to(
        np.asarray(S_in, np.float32), (C, K, 2)
    ).copy()
    wgrids = np.ones((C, K, 5, 5), np.float32)
    wmats = np.broadcast_to(
        np.diag([0.1, 0.1]).astype(np.float32), (C, K, 2, 2)
    ).copy()
    woffs = np.zeros((C, K, 2), np.float32)
    valid = np.ones((C, K), bool)

    fused = pipeline.sharded_fuse_chunks_exact(
        slabs, mats, offs, extents, wgrids, wmats, woffs, valid,
        out_shape, mesh, interpret=True,
    )
    tile = (8, 128)
    win = ea.plan_windows_2d(mats.reshape(-1, 2, 2), tile)
    wwin = ea.plan_windows_2d(wmats.reshape(-1, 2, 2), tile)
    ref = _fuse_chunk_batch_kernel_exact(
        slabs, mats, offs, extents, wgrids, wmats, woffs, valid,
        out_shape, win, wwin, tile, "weighted_average", True,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-4)


def test_sharded_exact_coupled_weight_maps_take_general_kernel():
    """sepy-eligible VIEW maps with COUPLED weight maps must route to the
    general kernel: the sepy kernel reads only the 5 decoupled matrix
    entries and would silently drop the weight maps' coupling terms."""
    import jax

    from multiview_stitcher_tpu.fusion._core import (
        _fuse_chunk_batch_kernel_exact,
    )
    from multiview_stitcher_tpu.ops import exact_affine as ea
    from multiview_stitcher_tpu.parallel import mesh as mesh_utils
    from multiview_stitcher_tpu.parallel import pipeline

    mesh = mesh_utils.get_mesh(len(jax.devices()))
    rng = np.random.default_rng(7)
    C, K = len(jax.devices()), 2
    th = 0.08
    # y-decoupled (rotate-around-y) view maps
    Ry = np.array(
        [
            [np.cos(th), 0.0, -np.sin(th)],
            [0.0, 1.0, 0.0],
            [np.sin(th), 0.0, np.cos(th)],
        ],
        np.float32,
    )
    S_in, out_shape = (16, 24, 24), (12, 16, 32)
    slabs = (rng.random((C, K) + S_in) * 500).astype(np.float32)
    mats = np.broadcast_to(Ry, (C, K, 3, 3)).copy()
    assert ea.is_y_decoupled(mats.reshape(-1, 3, 3))
    offs = rng.random((C, K, 3)).astype(np.float32) * 2
    extents = np.broadcast_to(
        np.asarray(S_in, np.float32), (C, K, 3)
    ).copy()
    wgrids = rng.random((C, K, 5, 5, 5)).astype(np.float32)
    # weight maps with coupling in EVERY entry
    wm = np.diag([0.3, 0.15, 0.15]).astype(np.float32) + 0.02
    wmats = np.broadcast_to(wm, (C, K, 3, 3)).copy()
    assert not ea.is_y_decoupled(wmats.reshape(-1, 3, 3))
    woffs = np.zeros((C, K, 3), np.float32)
    valid = np.ones((C, K), bool)

    fused = pipeline.sharded_fuse_chunks_exact(
        slabs, mats, offs, extents, wgrids, wmats, woffs, valid,
        out_shape, mesh, interpret=True,
    )
    # oracle: the general kernel unsharded (handles any coupling exactly)
    tile = (8, 4, 32)
    win = ea.plan_windows_3d_general(mats.reshape(-1, 3, 3), tile)
    wwin = ea.plan_windows_3d_general(wmats.reshape(-1, 3, 3), tile)
    ref = _fuse_chunk_batch_kernel_exact(
        slabs, mats, offs, extents, wgrids, wmats, woffs, valid,
        out_shape, win, wwin, tile, "weighted_average", True,
        kind3d="general", interpret=True,
    )
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref), atol=1e-4)
