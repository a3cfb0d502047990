"""Multi-host seam (parallel/multihost.py): single-process no-op behavior
plus a simulated multi-host fuse (hosts run sequentially in one process —
the block partition and create/attach store protocol are what's under
test; jax.distributed itself needs real multiple processes)."""

import numpy as np

from multiview_stitcher_tpu import si_utils
from multiview_stitcher_tpu.io import ngff_utils, zarr_backend
from multiview_stitcher_tpu.parallel import executors, multihost


def test_initialize_single_process_noop():
    multihost.initialize()  # must not raise or try to contact a coordinator
    pid, n = multihost.process_info()
    assert (pid, n) == (0, 1)
    multihost.sync()  # no-op barrier
    assert multihost.partition_for_this_host(7) == list(range(7))


def _write_tiles(tmp_path):
    rng = np.random.default_rng(1)
    scene = (rng.random((60, 110)) * 1000).astype(np.uint16)
    t0, t1 = scene[:, :70], scene[:, 40:]
    specs = []
    for i, (tile, x0) in enumerate([(t0, 0.0), (t1, 40.0)]):
        url = str(tmp_path / f"tile{i}.ome.zarr")
        s = si_utils.get_sim_from_array(
            tile, dims=("y", "x"), translation={"y": 0.0, "x": x0},
        )
        ngff_utils.write_sim_to_ome_zarr(s, url, overwrite=True)
        specs.append(executors.SourceSpec(url=url, origin={"y": 0.0, "x": x0}))
    return scene, specs


def test_multihost_fuse_single_process(tmp_path):
    scene, specs = _write_tiles(tmp_path)
    out_url = str(tmp_path / "fused.zarr")
    multihost.multihost_fuse(
        specs, out_url, si_utils.DEFAULT_TRANSFORM_KEY, output_chunksize=32,
    )
    out = zarr_backend.open_zarr_array(out_url).read().squeeze()
    assert out.shape == scene.shape
    # +-1: f32 (w*val)/w truncation ties where the blending weight tapers
    np.testing.assert_allclose(
        out[:, :40].astype(int), scene[:, :40].astype(int), atol=1
    )


def test_simulated_two_host_fuse_matches_single(tmp_path, monkeypatch):
    scene, specs = _write_tiles(tmp_path)

    # single-host reference result
    ref_url = str(tmp_path / "fused_single.zarr")
    multihost.multihost_fuse(
        specs, ref_url, si_utils.DEFAULT_TRANSFORM_KEY, output_chunksize=32,
    )
    ref = zarr_backend.open_zarr_array(ref_url).read()

    # simulate a 2-process job: run the same driver once per "host"
    out_url = str(tmp_path / "fused_multi.zarr")
    for pid in range(2):
        monkeypatch.setattr(
            multihost, "process_info", lambda pid=pid: (pid, 2)
        )
        multihost.multihost_fuse(
            specs, out_url, si_utils.DEFAULT_TRANSFORM_KEY,
            output_chunksize=32,
        )
        # host 1 must not re-create (clobber) the store: overwrite happens
        # only on host 0's create_only pass
    out = zarr_backend.open_zarr_array(out_url).read()
    np.testing.assert_array_equal(out, ref)
