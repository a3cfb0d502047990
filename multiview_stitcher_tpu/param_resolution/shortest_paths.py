"""Shortest-path groupwise resolution.

Rebuild of /root/reference/src/multiview_stitcher/param_resolution/shortest_paths.py:
chain pairwise transforms along quality-weighted shortest paths from a
reference node.
"""

from __future__ import annotations

import networkx as nx
import numpy as np

from multiview_stitcher_tpu import mv_graph, param_utils
from multiview_stitcher_tpu.param_resolution.utils import (
    _edge_transform_matrix,
    get_graph_ndim,
)


def groupwise_resolution_shortest_paths(g_reg, reference_view=None, **_ignored):
    """Resolve per-view params by chaining pairwise transforms along
    quality-weighted shortest paths (single component, single timepoint)."""
    if not g_reg.number_of_edges():
        ndim = get_graph_ndim(g_reg)
        params = {
            node: param_utils.identity_transform(ndim) for node in g_reg.nodes
        }
        return params, {"metrics": None, "used_edges": []}

    ndim = get_graph_ndim(g_reg)

    quality_min = np.min(
        [np.mean(np.asarray(g_reg.edges[e]["quality"], dtype=float)) for e in g_reg.edges]
    )
    for e in g_reg.edges:
        qmean = float(np.mean(np.asarray(g_reg.edges[e]["quality"], dtype=float)))
        g_reg.edges[e]["quality_mean"] = qmean
        g_reg.edges[e]["quality_mean_inv"] = 1 / ((qmean - quality_min) + 0.5)

    # directed graph; reverse edges carry the inverse transform
    g_di = g_reg.to_directed()
    for e in g_reg.edges:
        sorted_e = tuple(sorted(e))
        mat = _edge_transform_matrix(g_reg.edges[sorted_e]["transform"])
        g_di.edges[(sorted_e[1], sorted_e[0])]["transform"] = np.linalg.inv(mat)
        g_di.edges[sorted_e]["transform"] = mat

    if reference_view is not None and reference_view in g_di.nodes:
        ref_node = reference_view
    else:
        ref_node = mv_graph.get_node_with_maximal_edge_weight_sum_from_graph(
            g_di, weight_key="quality_mean"
        )

    paths = {
        n: nx.shortest_path(
            g_di, target=n, source=ref_node, weight="quality_mean_inv"
        )
        for n in g_di.nodes
    }

    used_edges = set()
    node_transforms = {}
    for n in g_di.nodes:
        reg_path = paths[n]
        path_pairs = [
            (reg_path[i], reg_path[i + 1]) for i in range(len(reg_path) - 1)
        ]
        for pair in path_pairs:
            used_edges.add(tuple(sorted(pair)))
        path_params = np.eye(ndim + 1)
        for pair in path_pairs:
            path_params = g_di.edges[pair]["transform"] @ path_params
        node_transforms[n] = param_utils.affine_to_xaffine(
            np.linalg.inv(path_params)
        )

    return node_transforms, {"metrics": None, "used_edges": list(used_edges)}
