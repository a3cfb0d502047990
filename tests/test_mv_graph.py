import numpy as np
import pytest

from multiview_stitcher_tpu import msi_utils, mv_graph, param_utils, si_utils


def _grid_sims(n=3, tile=(50, 50), overlap=10, spacing=1.0):
    sims = []
    step = (tile[0] - overlap) * spacing
    for i in range(n):
        for j in range(n):
            sims.append(
                si_utils.get_sim_from_array(
                    np.zeros(tile, dtype=np.float32),
                    scale={"y": spacing, "x": spacing},
                    translation={"y": i * step, "x": j * step},
                )
            )
    return sims


def test_adjacency_graph_grid():
    sims = _grid_sims(3)
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    g = mv_graph.build_view_adjacency_graph_from_msims(
        msims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY
    )
    assert len(g.nodes) == 9
    # 3x3 grid: 12 axis edges + 8 diagonal overlaps (corner squares)
    assert g.number_of_edges() == 20
    # axis-aligned pruning removes diagonals
    g_pruned = mv_graph.prune_view_adjacency_graph(g, method="keep_axis_aligned")
    assert g_pruned.number_of_edges() == 12


def test_overlap_volume_translation_pair():
    sims = _grid_sims(1)
    sim1 = sims[0]
    sim2 = si_utils.get_sim_from_array(
        np.zeros((50, 50), dtype=np.float32),
        translation={"y": 0.0, "x": 40.0},
    )
    props = [
        si_utils.get_stack_properties_from_sim(
            s, transform_key=si_utils.DEFAULT_TRANSFORM_KEY
        )
        for s in [sim1, sim2]
    ]
    vol, intersection = mv_graph.get_overlap_between_pair_of_stack_props(*props)
    # pixel-center extents: y [0,49], x overlap [40,49] -> 49*9
    assert vol == pytest.approx(49 * 9)
    lowers = intersection.intersections.min(axis=0)
    uppers = intersection.intersections.max(axis=0)
    np.testing.assert_allclose(lowers, [0, 40])
    np.testing.assert_allclose(uppers, [49, 49])


def test_overlap_no_overlap_returns_minus_one():
    sim1 = si_utils.get_sim_from_array(np.zeros((10, 10)))
    sim2 = si_utils.get_sim_from_array(
        np.zeros((10, 10)), translation={"y": 100.0, "x": 100.0}
    )
    props = [
        si_utils.get_stack_properties_from_sim(
            s, transform_key=si_utils.DEFAULT_TRANSFORM_KEY
        )
        for s in [sim1, sim2]
    ]
    vol, hs = mv_graph.get_overlap_between_pair_of_stack_props(*props)
    assert vol == -1 and hs is None


def test_overlap_rotated_matches_qhull():
    """Rotated tile goes through the QHull path and gives a sensible volume."""
    theta = np.pi / 4
    aff = np.eye(3)
    aff[:2, :2] = [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]]
    sim1 = si_utils.get_sim_from_array(np.zeros((21, 21)))
    sim2 = si_utils.get_sim_from_array(np.zeros((21, 21)), affine=aff)
    props = [
        si_utils.get_stack_properties_from_sim(
            s, transform_key=si_utils.DEFAULT_TRANSFORM_KEY
        )
        for s in [sim1, sim2]
    ]
    vol, hs = mv_graph.get_overlap_between_pair_of_stack_props(*props)
    assert vol > 0
    assert hs is not None


def test_shortest_paths_pruning_keeps_connectivity():
    sims = _grid_sims(3)
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    g = mv_graph.build_view_adjacency_graph_from_msims(
        msims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY
    )
    import networkx as nx

    g_pruned = mv_graph.prune_view_adjacency_graph(
        g, method="shortest_paths_overlap_weighted"
    )
    assert nx.is_connected(g_pruned)
    assert g_pruned.number_of_edges() < g.number_of_edges()


def test_chunk_bbs_cover_output():
    array_bb = {
        "origin": {"y": 0.0, "x": 0.0},
        "shape": {"y": 100, "x": 130},
        "spacing": {"y": 1.0, "x": 1.0},
    }
    chunk_bbs, block_indices = mv_graph.get_chunk_bbs(
        array_bb, {"y": 64, "x": 64}
    )
    assert len(chunk_bbs) == 2 * 3
    total = sum(
        bb["shape"]["y"] * bb["shape"]["x"] for bb in chunk_bbs
    )
    assert total == 100 * 130
    # last x-chunk is the remainder
    assert chunk_bbs[-1]["shape"]["x"] == 130 - 2 * 64


def test_get_overlap_for_bbs_translation():
    target_bb = {
        "origin": {"y": 0.0, "x": 0.0},
        "shape": {"y": 64, "x": 64},
        "spacing": {"y": 1.0, "x": 1.0},
    }
    query_bb = {
        "origin": {"y": 40.0, "x": -20.0},
        "shape": {"y": 50, "x": 50},
        "spacing": {"y": 1.0, "x": 1.0},
    }
    param = param_utils.affine_to_xaffine(np.eye(3))
    bbs = mv_graph.get_overlap_for_bbs(target_bb, [query_bb], param)
    bb = bbs[0]
    assert bb is not None
    assert bb["origin"]["y"] == 40.0
    assert bb["origin"]["x"] == 0.0
    # y: query spans [40, 89], target [0, 63] -> overlap [40, 63]
    assert bb["shape"]["y"] == 24
    # x: query spans [-20, 29], target [0, 63] -> overlap [0, 29]
    assert bb["shape"]["x"] == 30

    far_query = {
        "origin": {"y": 500.0, "x": 0.0},
        "shape": {"y": 10, "x": 10},
        "spacing": {"y": 1.0, "x": 1.0},
    }
    assert mv_graph.get_overlap_for_bbs(target_bb, [far_query], param) == [None]


def test_points_inside_sim():
    sim = si_utils.get_sim_from_array(
        np.zeros((10, 10)), translation={"y": 5.0, "x": 5.0}
    )
    pts = np.array([[6.0, 6.0], [0.0, 0.0], [14.0, 14.0], [20.0, 6.0]])
    inside = mv_graph.points_inside_sim(
        pts, sim, transform_key=si_utils.DEFAULT_TRANSFORM_KEY
    )
    np.testing.assert_array_equal(inside, [True, False, True, False])


def test_get_connected_labels():
    labels = np.zeros((10, 10), dtype=int)
    labels[:5] = 1
    labels[5:] = 2
    pairs = mv_graph.get_connected_labels(labels)
    assert [0, 1] in pairs.tolist() or [1, 0] in pairs.tolist()


def test_otsu_threshold_separates_clusters():
    from multiview_stitcher_tpu.utils.misc import threshold_otsu

    vals = np.concatenate([np.random.normal(0, 0.1, 100), np.random.normal(10, 0.1, 100)])
    t = threshold_otsu(vals)
    # threshold must separate the two clusters
    assert abs(int((vals < t).sum()) - 100) <= 5
    assert 0 < t < 10
