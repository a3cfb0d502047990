"""Service runtime tests: session, specs, bridge, worker protocol.

Covers the reference's second-execution-environment test surface
(reference _tests/test_browser.py via its LocalBridge) on this package's
service runtime: sessions rebuild from specs, registration over a bridge
matches in-process registration, block fusion partitioned across workers is
byte-identical to direct fusion, and generation bumps retire preview routes.
"""

import json

import numpy as np
import pytest

from multiview_stitcher_tpu import (
    fusion,
    msi_utils,
    param_utils,
    registration,
    sample_data,
    si_utils,
)
from multiview_stitcher_tpu.io import ngff_utils
from multiview_stitcher_tpu.service import (
    FusionOptions,
    LocalBridge,
    RegistrationOptions,
    Session,
    SessionSpec,
    WorkerRuntime,
)


def _make_session_zarrs(tmp_path, n=2, tile=48, overlap=12, shift=2.4):
    """Write a small 2D tile pair (known GT shift) as OME-Zarrs; return URLs."""
    sims = sample_data.generate_tiled_dataset(
        ndim=2,
        N_t=1,
        N_c=1,
        tile_size=tile,
        tiles_x=n,
        tiles_y=1,
        overlap=overlap,
        zoom=6,
        drift_scale=0,
        shift_scale=shift,
        dtype=np.uint16,
    )
    urls = []
    for i, sim in enumerate(sims):
        url = str(tmp_path / f"view{i}.ome.zarr")
        ngff_utils.write_sim_to_ome_zarr(sim, url)
        urls.append(url)
    return sims, urls


# ---------------------------------------------------------------------------
# specs
# ---------------------------------------------------------------------------


def test_registration_options_json_roundtrip_and_validation():
    opts = RegistrationOptions(
        transform_key="affine_metadata",
        new_transform_key="reg",
        registration_binning={"y": 2, "x": 2},
        pairs=[[0, 1]],
    )
    opts2 = RegistrationOptions.from_json(opts.to_json())
    assert opts2 == opts
    kwargs = opts2.to_register_kwargs()
    assert kwargs["pairwise_reg_func"] is registration.phase_correlation_registration
    assert kwargs["pairs"] == [(0, 1)]

    with pytest.raises(KeyError, match="unknown pairwise registration"):
        RegistrationOptions(pairwise_reg_func="nope")
    with pytest.raises(KeyError, match="unknown groupwise"):
        RegistrationOptions(groupwise_resolution_method="nope")
    with pytest.raises(KeyError, match="unknown pruning"):
        RegistrationOptions(pre_registration_pruning_method="nope")


def test_fusion_options_json_roundtrip_and_validation():
    opts = FusionOptions(fusion_func="max", output_spacing={"y": 2.0, "x": 2.0})
    opts2 = FusionOptions.from_json(opts.to_json())
    assert opts2 == opts
    assert opts2.to_fuse_kwargs()["fusion_func"] is fusion.max_fusion
    with pytest.raises(KeyError, match="unknown fusion func"):
        FusionOptions(fusion_func="nope")


# ---------------------------------------------------------------------------
# session lifecycle
# ---------------------------------------------------------------------------


def test_session_load_describe_spec_roundtrip(tmp_path):
    _, urls = _make_session_zarrs(tmp_path)
    session = Session()
    assert session.is_empty
    views = session.load(urls)
    assert len(views) == 2
    assert views[0]["url"] == urls[0]
    assert views[0]["dims"][-2:] == ["y", "x"]
    assert "affine_metadata" in views[0]["transform_keys"]

    # add a derived transform, then round-trip through the spec
    mats = [param_utils.affine_from_translation([1.5, -0.5]) for _ in urls]
    session.set_params("manual", mats)
    spec = session.spec()
    assert spec.generation == session.generation

    rebuilt = Session.from_spec(spec.to_json())
    assert rebuilt.transform_keys == session.transform_keys
    for v_orig, v_new in zip(session.msims, rebuilt.msims):
        np.testing.assert_allclose(
            v_new.transforms["manual"].squeeze(),
            v_orig.transforms["manual"].squeeze(),
        )

    # remove/clear bookkeeping
    session.remove(0)
    assert len(session.describe()) == 1
    session.clear()
    assert session.is_empty


def test_session_in_memory_views_cannot_spec(tmp_path):
    sims, _ = _make_session_zarrs(tmp_path)
    session = Session()
    session.add_msims(
        [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    )
    assert len(session.describe()) == 2
    with pytest.raises(ValueError, match="no zarr URL"):
        session.spec()


def test_session_copy_transform_and_default_key(tmp_path):
    _, urls = _make_session_zarrs(tmp_path)
    session = Session()
    session.load(urls)
    assert session.default_transform_key() == "affine_metadata"
    session.copy_transform("affine_metadata", "registered")
    assert session.default_transform_key() == "registered"
    with pytest.raises(KeyError):
        session.copy_transform("missing", "x")


# ---------------------------------------------------------------------------
# registration: in-process and over the bridge
# ---------------------------------------------------------------------------


def test_session_register_in_process_recovers_gt(tmp_path):
    sims, urls = _make_session_zarrs(tmp_path)
    session = Session()
    session.load(urls)
    summary = session.register(
        RegistrationOptions(new_transform_key="reg")
    )
    assert summary["transform_key"] == "reg"
    assert len(summary["params"]) == 2
    assert all(
        "reg" in msim.transforms for msim in session.msims
    )
    # ground truth: relative shift between the stage positions is recovered
    gt_rel = np.asarray(
        si_utils.get_affine_from_sim(sims[1], "affine_metadata").squeeze()
    )[:-1, -1] - np.asarray(
        si_utils.get_affine_from_sim(sims[0], "affine_metadata").squeeze()
    )[:-1, -1]
    p0 = np.asarray(summary["params"][0])
    p1 = np.asarray(summary["params"][1])
    rec_rel = p1[:-1, -1] - p0[:-1, -1]
    # registration corrects the simulated shift error; recovered relative
    # translation stays within ~the simulated shift scale of the metadata
    assert np.all(np.abs(rec_rel - gt_rel) < 4.0)


def test_session_register_over_local_bridge_matches_in_process(tmp_path):
    _, urls = _make_session_zarrs(tmp_path)
    opts = RegistrationOptions(new_transform_key="reg")

    s_local = Session()
    s_local.load(urls)
    r_local = s_local.register(opts)

    s_bridge = Session()
    s_bridge.load(urls)
    progress_calls = []
    r_bridge = s_bridge.register(
        opts,
        bridge=LocalBridge(),
        progress=lambda done, total: progress_calls.append((done, total)),
    )

    np.testing.assert_allclose(
        np.asarray(r_bridge["params"]),
        np.asarray(r_local["params"]),
        atol=1e-6,
    )
    assert progress_calls and progress_calls[-1][0] == progress_calls[-1][1]


# ---------------------------------------------------------------------------
# fusion: preview routes, plan, block fusion over the bridge
# ---------------------------------------------------------------------------


def test_fuse_preview_route_retires_on_state_change(tmp_path):
    _, urls = _make_session_zarrs(tmp_path)
    session = Session()
    session.load(urls)
    preview = session.fuse_preview(max_voxels=32**2)
    route = preview["route"]
    store = session.preview_store(route)
    assert store is not None
    # the preview store serves NGFF metadata
    zattrs = json.loads(store.get(".zattrs"))
    assert "multiscales" in zattrs
    assert np.prod(list(preview["shape"].values())) <= 4 * 32**2

    # any transform change retires the route (reference session.py:563-598)
    session.copy_transform("affine_metadata", "other")
    assert session.preview_store(route) is None


def test_fusion_plan_deterministic_across_participants(tmp_path):
    _, urls = _make_session_zarrs(tmp_path)
    s1 = Session()
    s1.load(urls)
    s2 = Session.from_spec(s1.spec().to_json())
    opts = FusionOptions()
    plan1 = s1.fusion_plan(opts, output_chunksize=32)
    plan2 = s2.fusion_plan(opts, output_chunksize=32)
    assert plan1 == plan2
    assert plan1["n_blocks"] >= 2


def test_fuse_to_zarr_over_bridge_matches_direct(tmp_path):
    sims, urls = _make_session_zarrs(tmp_path)
    session = Session()
    session.load(urls)
    opts = FusionOptions(output_chunksize=32)

    direct = fusion.fuse(
        [msi_utils.get_sim_from_msim(m) for m in session.msims],
        transform_key="affine_metadata",
    )

    out_bridge = str(tmp_path / "fused_bridge.zarr")
    r = session.fuse_to_zarr(
        out_bridge, opts, bridge=LocalBridge(), batch_size=3
    )
    assert r["written"] == r["n_blocks"]

    out_direct = str(tmp_path / "fused_direct.zarr")
    r2 = session.fuse_to_zarr(out_direct, opts)
    assert r2["written"] == r2["n_blocks"]

    from multiview_stitcher_tpu.io import zarr_backend

    a_bridge = np.asarray(zarr_backend.attach_zarr_array(out_bridge)[...])
    a_direct = np.asarray(zarr_backend.attach_zarr_array(out_direct)[...])
    np.testing.assert_array_equal(a_bridge, a_direct)
    # vs whole-image fuse: per-block float accumulation can flip the
    # uint16 rounding of blended border pixels by at most 1
    np.testing.assert_allclose(
        a_bridge.squeeze().astype(np.int32),
        np.asarray(direct.data).squeeze().astype(np.int32),
        atol=1,
    )


# ---------------------------------------------------------------------------
# worker protocol
# ---------------------------------------------------------------------------


def test_worker_command_protocol_full_flow(tmp_path):
    _, urls = _make_session_zarrs(tmp_path)
    runtime = WorkerRuntime()

    info = runtime.handle("info")
    assert info["n_views"] == 0

    views = runtime.handle("load", {"sources": urls})["views"]
    assert len(views) == 2

    keys = runtime.handle("transform_keys")["transform_keys"]
    assert "affine_metadata" in keys

    spec = runtime.handle("spec")["spec"]
    assert len(spec["sources"]) == 2

    runtime.handle(
        "set_params",
        {
            "transform_key": "manual",
            "params": [np.eye(3).tolist() for _ in urls],
        },
    )
    tf = runtime.handle("transforms")["transforms"]
    assert "manual" in tf and len(tf["manual"]) == 2

    plan = runtime.handle(
        "fusion_plan", {"options": {"transform_key": "affine_metadata"}}
    )
    assert plan["n_blocks"] >= 1

    state = runtime.handle("neuroglancer_state", {})
    assert "layers" in state and len(state["layers"]) == 2

    with pytest.raises(KeyError, match="unknown command"):
        runtime.handle("nope")


def test_worker_session_cache_reuses_by_generation(tmp_path):
    _, urls = _make_session_zarrs(tmp_path)
    session = Session()
    session.load(urls)
    spec_json = session.spec().to_json()

    runtime = WorkerRuntime()
    s1 = runtime.session_for(spec_json)
    s2 = runtime.session_for(spec_json)
    assert s1 is s2  # cached

    session.bump_generation()
    s3 = runtime.session_for(session.spec().to_json())
    assert s3 is not s1  # new generation -> new key

    # LRU keeps at most SESSION_CACHE_SIZE entries
    from multiview_stitcher_tpu.service.worker import SESSION_CACHE_SIZE

    for g in range(SESSION_CACHE_SIZE + 2):
        session.bump_generation()
        runtime.session_for(session.spec().to_json())
    assert len(runtime._session_cache) == SESSION_CACHE_SIZE


def test_worker_register_command_full_flow(tmp_path):
    """Stateful register through the command protocol (reference
    worker.py:170 _cmd_register)."""
    _, urls = _make_session_zarrs(tmp_path)
    runtime = WorkerRuntime()
    runtime.handle("load", {"sources": urls})
    gen0 = runtime.handle("info")["generation"]
    summary = runtime.handle(
        "register", {"options": {"new_transform_key": "reg"}}
    )
    assert summary["transform_key"] == "reg"
    assert len(summary["params"]) == 2
    assert "reg" in runtime.handle("transform_keys")["transform_keys"]
    assert runtime.handle("info")["generation"] > gen0
    # fuse through the command protocol with the registered key
    out = str(tmp_path / "cmd_fused.zarr")
    r = runtime.handle(
        "fuse_to_zarr",
        {"output_zarr_url": out, "options": {"transform_key": "reg"}},
    )
    assert r["written"] == r["n_blocks"] >= 1


def test_session_register_pairs_option_restricts_edges(tmp_path):
    sims, urls = _make_session_zarrs(tmp_path)
    session = Session()
    session.load(urls + urls[:1])  # 3 views; full graph would have >1 edge
    summary = session.register(
        RegistrationOptions(new_transform_key="reg", pairs=[[0, 1]])
    )
    assert summary["edges"] == [[0, 1]]


def test_fuse_preview_respects_fusion_func(tmp_path):
    _, urls = _make_session_zarrs(tmp_path)
    session = Session()
    session.load(urls)
    p_avg = session.fuse_preview(
        FusionOptions(fusion_func="weighted_average"), max_voxels=48**2
    )
    store_avg = session.preview_store(p_avg["route"])
    arr_avg = np.frombuffer(
        store_avg.get("0/" + ".".join("0" for _ in p_avg["shape"])),
        dtype=np.uint16,
    )
    session.bump_generation()
    p_max = session.fuse_preview(
        FusionOptions(fusion_func="max"), max_voxels=48**2
    )
    store_max = session.preview_store(p_max["route"])
    arr_max = np.frombuffer(
        store_max.get("0/" + ".".join("0" for _ in p_max["shape"])),
        dtype=np.uint16,
    )
    # max fusion dominates the average everywhere they overlap
    assert arr_max.size == arr_avg.size
    assert np.all(arr_max.astype(np.int32) >= arr_avg.astype(np.int32) - 1)
    assert np.any(arr_max > arr_avg)


def test_fusion_plan_chunksize_override(tmp_path):
    _, urls = _make_session_zarrs(tmp_path)
    session = Session()
    session.load(urls)
    plan_small = session.fusion_plan(output_chunksize=16)
    plan_big = session.fusion_plan(output_chunksize=1024)
    assert plan_small["n_blocks"] > plan_big["n_blocks"] == 1
    assert plan_small["shape"] == plan_big["shape"]


def test_load_replace_semantics(tmp_path):
    _, urls = _make_session_zarrs(tmp_path)
    session = Session()
    session.load(urls)
    session.load(urls[:1], replace=False)
    assert len(session.describe()) == 3
    session.load(urls[:1], replace=True)
    assert len(session.describe()) == 1


REFERENCE_CZI = (
    "/root/reference/src/multiview_stitcher/test-datasets/mosaic_test.czi"
)


def test_session_load_mosaic_czi_and_spec_roundtrip():
    import os

    if not os.path.exists(REFERENCE_CZI):
        pytest.skip("reference sample CZI not available")
    session = Session()
    views = session.load_mosaic(REFERENCE_CZI)
    assert len(views) == 2
    assert views[0]["url"] == REFERENCE_CZI

    # mosaic sources rebuild from the spec with per-view indices intact
    rebuilt = Session.from_spec(session.spec().to_json())
    assert len(rebuilt.msims) == 2
    for a, b in zip(session.msims, rebuilt.msims):
        np.testing.assert_allclose(
            a.transforms["affine_metadata"].squeeze(),
            b.transforms["affine_metadata"].squeeze(),
        )
    sim_a = msi_utils.get_sim_from_msim(session.msims[1])
    sim_b = msi_utils.get_sim_from_msim(rebuilt.msims[1])
    np.testing.assert_array_equal(
        np.asarray(sim_a.data), np.asarray(sim_b.data)
    )


def test_source_spec_view_index_out_of_range():
    import os

    if not os.path.exists(REFERENCE_CZI):
        pytest.skip("reference sample CZI not available")
    from multiview_stitcher_tpu.parallel.executors import SourceSpec

    with pytest.raises(IndexError, match="view_index 5 out of range"):
        SourceSpec(url=REFERENCE_CZI, view_index=5).open_msim()


def test_session_serve_routes_track_state(tmp_path):
    import urllib.request

    _, urls = _make_session_zarrs(tmp_path)
    session = Session()
    session.load(urls)
    info = session.serve(port=0)
    try:
        base = info["base_url"]
        assert info["routes"] == ["0.ome.zarr", "1.ome.zarr"]
        with urllib.request.urlopen(f"{base}/0.ome.zarr/.zattrs") as r:
            assert "multiscales" in json.loads(r.read())

        prev = session.fuse_preview(max_voxels=32**2)
        with urllib.request.urlopen(
            f"{base}/{prev['route']}/.zattrs"
        ) as r:
            assert "multiscales" in json.loads(r.read())

        # state change retires the fused route (404), views stay served
        session.copy_transform("affine_metadata", "new")
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"{base}/{prev['route']}/.zattrs")
        with urllib.request.urlopen(f"{base}/0.ome.zarr/.zattrs") as r:
            assert r.status == 200
    finally:
        session.stop_serving()


@pytest.mark.slow
def test_register_over_process_pool_bridge(tmp_path):
    """Real OS-process workers (spawn): the full JSON protocol crosses a
    process boundary and matches the in-process result."""
    from multiview_stitcher_tpu.service import ProcessPoolBridge

    _, urls = _make_session_zarrs(tmp_path)
    opts = RegistrationOptions(new_transform_key="reg")

    s_local = Session()
    s_local.load(urls)
    r_local = s_local.register(opts)

    s_pool = Session()
    s_pool.load(urls)
    bridge = ProcessPoolBridge(n_workers=2, platform="cpu")
    try:
        r_pool = s_pool.register(opts, bridge=bridge)
    finally:
        bridge.close()

    np.testing.assert_allclose(
        np.asarray(r_pool["params"]),
        np.asarray(r_local["params"]),
        atol=1e-6,
    )


def test_worker_run_task_register_pairs_json_contract(tmp_path):
    _, urls = _make_session_zarrs(tmp_path)
    session = Session()
    session.load(urls)
    task = {
        "task": "register_pairs",
        "session": session.spec().to_json(),
        "edges": [[0, 1]],
        "options": RegistrationOptions().to_json(),
    }
    out = json.loads(WorkerRuntime().run_task(json.dumps(task)))
    (r,) = out["results"]
    mat = np.asarray(r["transform"])
    assert mat.shape == (3, 3)
    assert r["quality"] is None or isinstance(r["quality"], float)
    assert np.asarray(r["bbox"]).shape == (2, 2)
