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
