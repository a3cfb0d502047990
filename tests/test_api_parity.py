"""Drop-in API-parity helpers added for reference-surface completeness:
standalone point-set selection, per-field processing, msim/param dims
utilities, graph-edge materialization, zarr predicates, io aliases,
box plotting (reference spatial_image_utils.py:1185/1318,
msi_utils.py:620, param_utils.py:246, mv_graph.py:355,
zarr_utils.is_stackable, io.py:251, vis_utils.py:709-745,
misc_utils.py:45, sample_data.py:143)."""

import logging
import warnings

import matplotlib

matplotlib.use("Agg")

import networkx as nx
import numpy as np
import pytest

from multiview_stitcher_tpu import (
    msi_utils,
    mv_graph,
    param_utils,
    sample_data,
    si_utils,
    vis_utils,
    zarr_utils,
)
from multiview_stitcher_tpu import io as mio
from multiview_stitcher_tpu.utils import misc as misc_utils


def test_point_set_sel_coords_filters_by_world_bounds():
    pts = np.array([[0.0, 0.0], [5.0, 5.0], [10.0, 2.0]])
    out = si_utils.point_set_sel_coords(
        pts, {"y": slice(1.0, 9.0)}, sdims=("y", "x")
    )
    np.testing.assert_array_equal(out, [[5.0, 5.0]])
    out = si_utils.point_set_sel_coords(
        pts, {"x": 2.0}, sdims=("y", "x")
    )
    np.testing.assert_array_equal(out, [[10.0, 2.0]])
    with pytest.raises(ValueError, match="N, ndim"):
        si_utils.point_set_sel_coords(np.zeros(3), {})


def test_process_fields_applies_per_field():
    sim = si_utils.get_sim_from_array(
        np.arange(2 * 3 * 4 * 5, dtype=np.float32).reshape(2, 3, 4, 5),
        dims=("t", "c", "y", "x"),
    )
    out = si_utils.process_fields(sim, lambda a: a + 1.0)
    assert out.dims == sim.dims
    np.testing.assert_array_equal(
        np.asarray(out.data), np.asarray(sim.data) + 1.0
    )
    with pytest.raises(ValueError, match="spatial shape"):
        si_utils.process_fields(sim, lambda a: a[:2])


def test_msim_ensure_dim_expands_all_scales():
    sim = si_utils.get_sim_from_array(
        np.zeros((32, 32), np.uint16), dims=("y", "x")
    )
    msim = msi_utils.get_msim_from_sim(sim, scale_factors=[2])
    out = msi_utils.ensure_dim(msim, "t")
    assert all("t" in s.dims for s in out.sims)
    # idempotent
    out2 = msi_utils.ensure_dim(out, "t")
    assert all(s.data.shape == o.data.shape for s, o in zip(out.sims, out2.sims))


def test_param_dims_helpers():
    p = param_utils.identity_transform(2)
    assert param_utils.get_spatial_dims_from_params(p) == ["x_in", "x_out"]
    assert param_utils.get_non_spatial_dims_from_params(p) == []
    pt = param_utils.XAffine(
        np.stack([np.eye(3)] * 2), t_coords=np.array([0, 1])
    )
    assert param_utils.get_non_spatial_dims_from_params(pt) == ["t"]


def test_compute_graph_edges_materializes_transforms():
    g = nx.Graph()
    g.add_edge(0, 1, transform=param_utils.identity_transform(2))
    g.add_edge(1, 2)  # no attr: left untouched
    out = mv_graph.compute_graph_edges(g)
    assert isinstance(out.edges[0, 1]["transform"].data, np.ndarray)
    assert "transform" not in out.edges[1, 2]


def test_zarr_predicates():
    a = np.zeros((4, 6))
    assert zarr_utils.is_stackable([a, np.zeros((4, 6))])
    assert not zarr_utils.is_stackable([a, np.zeros((4, 7))])
    assert not zarr_utils.is_stackable([])
    assert zarr_utils.is_chunk_aligned_concatenate([a, np.zeros((9, 6))], 0)
    assert not zarr_utils.is_chunk_aligned_concatenate(
        [a, np.zeros((9, 7))], 0
    )


def test_temporary_log_level_restores():
    lg = logging.getLogger("parity-test")
    lg.setLevel(logging.WARNING)
    with misc_utils.temporary_log_level(lg, logging.DEBUG):
        assert lg.level == logging.DEBUG
    assert lg.level == logging.WARNING


def test_plot_stack_props_draws_box():
    import matplotlib.pyplot as plt

    sim = si_utils.get_sim_from_array(
        np.zeros((10, 20), np.uint16), dims=("y", "x")
    )
    props = si_utils.get_stack_properties_from_sim(sim)
    fig, ax = plt.subplots()
    vis_utils.plot_stack_props(props, ax, color="red")
    assert len(ax.lines) == 4  # 2D box: 4 edges
    plt.close(fig)


def test_io_aliases_and_msim_reader(tmp_path):
    from multiview_stitcher_tpu.io import tif_utils

    p = str(tmp_path / "a.tif")
    tif_utils.save_sim_as_tif(
        p,
        si_utils.get_sim_from_array(
            np.arange(64, dtype=np.uint16).reshape(8, 8)
        ),
    )
    msim = mio.read_tif_into_msim(p, scale={"y": 2.0, "x": 2.0})
    assert msi_utils.get_sim_from_msim(msim).spacing["y"] == 2.0
    with pytest.warns(DeprecationWarning):
        sim = mio.read_tiff_into_spatial_xarray(p)
    assert sim.data.shape == (8, 8)


def test_sample_data_path_points_at_mosaic_czi():
    path = sample_data.get_mosaic_sample_data_path()
    sims = mio.read_mosaic_into_sims(path)
    assert len(sims) == 2


def test_serialize_zarr_backed_sim_roundtrip(tmp_path):
    """Task-graph payloads ship the tensorstore spec + metadata, never
    the data; the worker reopens the store lazily (reference
    spatial_image_utils.py:712/761)."""
    import json

    from multiview_stitcher_tpu.io import ngff_utils

    data = np.arange(2 * 8 * 8, dtype=np.uint16).reshape(2, 8, 8)
    sim = si_utils.get_sim_from_array(
        data, dims=("c", "y", "x"),
        scale={"y": 0.5, "x": 0.5}, translation={"y": 1.0, "x": -2.0},
        c_coords=["a", "b"],
    )
    si_utils.set_sim_affine(
        sim, np.array([[1.0, 0, 3.0], [0, 1, 0], [0, 0, 1]]),
        transform_key="registered",
    )
    url = str(tmp_path / "s.ome.zarr")
    ngff_utils.write_sim_to_ome_zarr(sim, url, overwrite=True)
    zsim = ngff_utils.read_sim_from_ome_zarr(url, prior_sim=sim)

    payload = si_utils.serialize_zarr_backed_sim(zsim)
    payload = json.loads(json.dumps(payload))  # must be JSON-able
    back = si_utils.deserialize_zarr_backed_sim(payload)
    assert back.dims == zsim.dims
    assert back.spacing == zsim.spacing and back.origin == zsim.origin
    np.testing.assert_array_equal(back.to_numpy(), data)
    np.testing.assert_array_equal(
        np.asarray(back.transforms["registered"].data),
        np.asarray(zsim.transforms["registered"].data),
    )
    with pytest.raises(ValueError, match="zarr-backed"):
        si_utils.serialize_zarr_backed_sim(sim)


def test_prepare_block_fusion_matches_direct_fuse(tmp_path):
    import numpy as np

    from multiview_stitcher_tpu import fusion, sample_data

    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_t=1, N_c=1, tile_size=40, tiles_x=2, tiles_y=1,
        overlap=10, zoom=6, drift_scale=0, shift_scale=0, dtype=np.uint16,
    )
    out = str(tmp_path / "blocks.zarr")
    info = fusion.prepare_block_fusion(
        out,
        {"images": sims, "transform_key": "affine_metadata",
         "output_chunksize": 32},
    )
    assert "func" in info and "nblocks" in info
    import itertools

    for bid in itertools.product(*(range(n) for n in info["nblocks"])):
        assert info["func"](bid) == tuple(bid)

    from multiview_stitcher_tpu.io import zarr_backend

    blocks = np.asarray(zarr_backend.attach_zarr_array(out)[...])
    direct = fusion.fuse(sims, transform_key="affine_metadata")
    np.testing.assert_allclose(
        blocks.squeeze().astype(np.int32),
        np.asarray(direct.data).squeeze().astype(np.int32),
        atol=1,  # per-block float accumulation can flip integer rounding
    )


def test_prepare_block_fusion_attach_mode(tmp_path):
    import itertools

    import numpy as np

    from multiview_stitcher_tpu import fusion, sample_data

    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_t=1, N_c=1, tile_size=40, tiles_x=2, tiles_y=1,
        overlap=10, zoom=6, drift_scale=0, shift_scale=0, dtype=np.uint16,
    )
    out = str(tmp_path / "attach.zarr")
    kwargs = {"images": sims, "transform_key": "affine_metadata",
              "output_chunksize": 32}
    creator = fusion.prepare_block_fusion(out, dict(kwargs))
    attacher = fusion.prepare_block_fusion(
        out, dict(kwargs), create_output=False
    )
    assert attacher["nblocks"] == creator["nblocks"]
    ids = list(itertools.product(*(range(n) for n in creator["nblocks"])))
    # split blocks across the two "workers"
    for bid in ids[::2]:
        creator["func"](bid)
    for bid in ids[1::2]:
        attacher["func"](bid)
    from multiview_stitcher_tpu.io import zarr_backend

    blocks = np.asarray(zarr_backend.attach_zarr_array(out)[...])
    assert blocks.max() > 0


def test_process_output_chunksize_and_nan_helpers():
    import warnings

    import numpy as np

    from multiview_stitcher_tpu import fusion, si_utils

    sim = si_utils.get_sim_from_array(
        np.zeros((8, 9), np.uint16), dims=["y", "x"]
    )
    assert fusion.process_output_chunksize([sim], 32) == {"y": 32, "x": 32}
    assert fusion.process_output_chunksize([sim], {"y": 4, "x": 8}) == {
        "y": 4, "x": 8,
    }
    default = fusion.process_output_chunksize([sim], None)
    assert set(default) == {"y", "x"}

    def warns():
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            return np.nanmean(np.full(3, np.nan))

    # plain call raises (filter set to error); the wrapper silences
    result = fusion.func_ignore_nan_warning(
        lambda: np.nanmean(np.full(3, np.nan))
    )
    assert np.isnan(result)


def test_get_interpolated_image_nearest_and_linear():
    import numpy as np

    from multiview_stitcher_tpu import fusion

    img = np.arange(25, dtype=float).reshape(5, 5)
    mask = np.zeros((5, 5), bool)
    mask[2, 2] = True
    img_masked = img.copy()
    img_masked[mask] = -1
    filled = fusion.get_interpolated_image(img_masked, mask, method="nearest")
    assert filled[2, 2] in (img[1, 2], img[3, 2], img[2, 1], img[2, 3], img[2, 2])
    filled_lin = fusion.get_interpolated_image(
        img_masked, mask, method="linear"
    )
    np.testing.assert_allclose(filled_lin[2, 2], img[2, 2])
    # all-masked input returns unchanged
    all_masked = fusion.get_interpolated_image(img, np.ones((5, 5), bool))
    np.testing.assert_array_equal(all_masked, img)


def test_ngff_interop_roundtrip(tmp_path):
    import numpy as np

    from multiview_stitcher_tpu import msi_utils, param_utils, si_utils
    from multiview_stitcher_tpu.io import ngff_utils

    sim = si_utils.get_sim_from_array(
        np.arange(64, dtype=np.uint16).reshape(8, 8),
        dims=["y", "x"],
        scale={"y": 2.0, "x": 0.5},
        translation={"y": 10.0, "x": -4.0},
    )
    si_utils.set_sim_affine(
        sim,
        param_utils.affine_to_xaffine(
            param_utils.affine_from_translation([5.0, 1.0])
        ),
        transform_key="shifted",
    )
    im = ngff_utils.sim_to_ngff_image(sim, transform_key="shifted")
    assert im.scale == {"y": 2.0, "x": 0.5}
    assert im.translation == {"y": 15.0, "x": -3.0}

    back = ngff_utils.ngff_image_to_sim(im, transform_key="k")
    assert si_utils.get_spacing_from_sim(back)["y"] == 2.0
    assert si_utils.get_origin_from_sim(back)["x"] == -3.0

    msim = msi_utils.get_msim_from_sim(sim, scale_factors=[{"y": 2, "x": 2}])
    ms = ngff_utils.msim_to_ngff_multiscales(msim, transform_key="shifted")
    assert len(ms.images) == 2
    assert ms.metadata["datasets"][0]["path"] == "scale0/image"
    assert ms.scale_factors == [{"y": 2, "x": 2}]
    msim_back = ngff_utils.ngff_multiscales_to_msim(ms, transform_key="k")
    assert len(msim_back.scale_keys) == 2


def test_read_ngff_multiscales_and_metadata_writer(tmp_path):
    import numpy as np

    from multiview_stitcher_tpu import si_utils
    from multiview_stitcher_tpu.io import ngff_utils, zarr_backend

    sim = si_utils.get_sim_from_array(
        np.random.default_rng(0).integers(0, 100, (16, 16)).astype(np.uint16),
        dims=["y", "x"],
    )
    url = str(tmp_path / "ms.ome.zarr")
    ngff_utils.write_sim_to_ome_zarr(sim, url)
    ms = ngff_utils.read_ngff_multiscales(url)
    assert len(ms.images) >= 1
    assert ms.metadata["datasets"][0]["path"] == "0"
    np.testing.assert_array_equal(
        np.asarray(ms.images[0].data).squeeze(), np.asarray(sim.data)
    )

    # metadata-only writer (arrays written separately)
    url2 = str(tmp_path / "meta.zarr")
    ngff_utils.write_multiscales_metadata(
        url2, ms.metadata["axes"], ms.metadata["datasets"]
    )
    attrs, fmt = zarr_backend.read_group_metadata(url2)
    assert fmt == 2 and attrs["multiscales"][0]["datasets"] == ms.metadata["datasets"]


def test_virtual_store_reexports_and_server():
    from multiview_stitcher_tpu.io import ngff_utils, virtual_ngff

    assert ngff_utils.VirtualOMEZarr is virtual_ngff.VirtualOMEZarr
    assert ngff_utils.VirtualOMEZarrHCSPlate is virtual_ngff.VirtualOMEZarrPlate
    assert ngff_utils.VirtualOMEZarrServer is virtual_ngff.VirtualOMEZarrServer


def test_virtual_ome_zarr_server_class(tmp_path):
    import json
    import urllib.request

    import numpy as np

    from multiview_stitcher_tpu import si_utils
    from multiview_stitcher_tpu.io import virtual_ngff

    sim = si_utils.get_sim_from_array(
        np.zeros((8, 8), np.uint16), dims=["y", "x"]
    )
    server = virtual_ngff.VirtualOMEZarrServer(
        {"a.ome.zarr": virtual_ngff.VirtualOMEZarr(sim)}, port=0
    ).start()
    try:
        with urllib.request.urlopen(
            f"{server.base_url}/a.ome.zarr/.zattrs"
        ) as r:
            assert "multiscales" in json.loads(r.read())
    finally:
        server.shutdown()


def test_registration_plugin_reexports_and_recursive_dict():
    from multiview_stitcher_tpu import registration, registration_plugins

    assert registration.registration_ANTsPy is registration_plugins.registration_ANTsPy
    assert (
        registration.registration_ITKElastix
        is registration_plugins.registration_ITKElastix
    )
    out = registration.apply_recursive_dict(
        lambda v: v * 2, {"a": 1, "b": {"c": 3}}
    )
    assert out == {"a": 2, "b": {"c": 6}}


def test_far_apart_helpers():
    import numpy as np

    from multiview_stitcher_tpu import mv_graph, si_utils

    near = si_utils.get_sim_from_array(
        np.zeros((10, 10), np.uint16), dims=["y", "x"]
    )
    far = si_utils.get_sim_from_array(
        np.zeros((10, 10), np.uint16), dims=["y", "x"],
        translation={"y": 1000.0, "x": 1000.0},
    )
    overlapping = si_utils.get_sim_from_array(
        np.zeros((10, 10), np.uint16), dims=["y", "x"],
        translation={"y": 3.0, "x": 3.0},
    )
    tk = "affine_metadata"
    assert mv_graph.sims_are_far_apart(near, far, tk) is True
    assert mv_graph.sims_are_far_apart(near, overlapping, tk) is False
    sp = [
        si_utils.get_stack_properties_from_sim(s, transform_key=tk)
        for s in (near, far)
    ]
    assert mv_graph.strack_props_are_far_apart(*sp) is True


def test_get_nodes_dataset_from_graph():
    import networkx as nx

    from multiview_stitcher_tpu import mv_graph

    g = nx.Graph()
    g.add_node(0, stack_props={"a": 1})
    g.add_node(1)
    assert mv_graph.get_nodes_dataset_from_graph(g, "stack_props") == {
        0: {"a": 1}
    }


def test_affine_fit_matches_reference_contract():
    import numpy as np

    from multiview_stitcher_tpu import transforms

    rng = np.random.default_rng(0)
    A = np.array([[1.1, 0.2], [-0.1, 0.9]])
    t = np.array([3.0, -2.0])
    q = rng.random((20, 2))
    p = q @ A.T + t
    fit = transforms.Affine_Fit(q, p)
    flat = fit.Matrix()
    np.testing.assert_allclose(flat[:4].reshape(2, 2), A, atol=1e-9)
    np.testing.assert_allclose(flat[4:], t, atol=1e-9)
    np.testing.assert_allclose(fit.Transform([0.5, 0.5]), A @ [0.5, 0.5] + t)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="same size"):
        transforms.Affine_Fit(q, p[:-1])


def test_misc_and_zarr_parity_helpers():
    import logging

    import numpy as np
    import pytest as _pytest

    from multiview_stitcher_tpu import zarr_utils
    from multiview_stitcher_tpu.utils import misc

    logger = logging.getLogger("parity-test")
    with misc.DisableLogger():
        assert logging.getLogger().manager.disable == logging.CRITICAL
    assert logging.getLogger().manager.disable == logging.NOTSET
    misc.clear_cupy_memory()  # compatibility no-op

    with _pytest.raises(zarr_utils.NotChunkAlignedError):
        zarr_utils.concatenate(
            [np.zeros((2, 3)), np.zeros((2, 4))], axis=0
        )


def test_czi_reference_aliases():
    import os

    import numpy as np
    import pytest as _pytest

    from multiview_stitcher_tpu.io import czi_utils

    path = (
        "/root/reference/src/multiview_stitcher/test-datasets/mosaic_test.czi"
    )
    if not os.path.exists(path):
        _pytest.skip("sample CZI unavailable")
    czi = czi_utils.open_czi(path)
    assert czi_utils.open_czi(path) is czi  # cached
    assert czi_utils.is_multiview_czi(path) is False
    assert czi_utils.get_spacing_from_czi(path) == czi_utils.get_czi_spacing(
        path
    )
    intervals = czi_utils.get_czi_mosaic_intervals(path)
    assert len(intervals) == 2
    for iv in intervals.values():
        assert set(iv) == {"y", "x"} and iv["x"][1] > iv["x"][0]
    plane = czi_utils.read_czi_plane(path, 0)
    assert plane.dtype == np.uint16 and plane.ndim >= 2
    cropped = czi_utils.read_czi_plane(
        path, 0, slices=tuple([slice(0, 4)] * plane.ndim)
    )
    assert cropped.shape == (4,) * plane.ndim
    with _pytest.raises(IndexError):
        czi_utils.read_czi_plane(path, 99)
    czi_utils.close_czi_files()
    assert czi_utils.open_czi(path) is not czi


def test_get_transforms_from_dataset_as_dict():
    """reference msi_utils.py:328: every named transform of a scale as a
    dict, copies (mutating the result must not touch the source)."""
    sim = si_utils.get_sim_from_array(
        np.zeros((4, 5), dtype=np.uint8), dims=("y", "x")
    )
    si_utils.set_sim_affine(
        sim, param_utils.affine_to_xaffine(np.eye(3)), transform_key="extra"
    )
    msim = msi_utils.get_msim_from_sim(sim, scale_factors=[])
    d = msi_utils.get_transforms_from_dataset_as_dict(msim)
    assert set(d) == set(sim.transforms)
    d["extra"].data[...] = 7.0
    assert not np.allclose(
        np.asarray(msim.transforms["extra"].data), 7.0
    )
    # also accepts a sim and a plain dict
    assert set(msi_utils.get_transforms_from_dataset_as_dict(sim)) == set(
        sim.transforms
    )
    with pytest.raises(TypeError, match="expected"):
        msi_utils.get_transforms_from_dataset_as_dict(42)


def test_read_czi_into_xims_reference_alias():
    """reference czi_utils.py:270: the mosaic-tile reader under its
    reference name returns one sim per tile."""
    import os

    from multiview_stitcher_tpu.io import czi_utils

    czi_path = (
        "/root/reference/src/multiview_stitcher/test-datasets/"
        "mosaic_test.czi"
    )
    if not os.path.exists(czi_path):
        pytest.skip("reference test CZI unavailable")
    sims = czi_utils.read_czi_into_xims(czi_path)
    assert len(sims) == 2
    assert czi_utils.read_czi_into_sims is not None
