"""BigStitcher-style iterative global optimization.

Rebuild of
/root/reference/src/multiview_stitcher/param_resolution/global_optimization.py
(:169-511): virtual beads = overlap-bbox corners in both frames; inner loop
re-estimates each node's transform (ordered by degree centrality, reference
node fixed) against its neighbours' current bead positions until the max edge
residual converges; the outer loop removes the worst edge by
``(1-quality)² · sqrt(max_residual) · log10(max_degree)`` while connectivity
is preserved.

References: BigStitcher (Hörl et al. 2019), Supplementary Note 2.
"""

from __future__ import annotations

import copy
import logging

import networkx as nx
import numpy as np
import pandas as pd

from multiview_stitcher_tpu import mv_graph, param_utils
from multiview_stitcher_tpu.param_resolution.utils import (
    get_beads_graph_from_reg_graph,
    get_graph_ndim,
)
from multiview_stitcher_tpu.transforms import estimate_transform

logger = logging.getLogger(__name__)


def groupwise_resolution_global_optimization(
    g_reg,
    reference_view=None,
    transform: str = "translation",
    max_iter=None,
    rel_tol=None,
    abs_tol=None,
    **_ignored,
):
    """Resolve per-view params by iterative optimization (single cc/tp)."""
    if not g_reg.number_of_edges():
        ndim = get_graph_ndim(g_reg)
        params = {
            node: param_utils.identity_transform(ndim) for node in g_reg.nodes
        }
        return params, {"metrics": None, "used_edges": []}

    if max_iter is None:
        max_iter = 500
    if rel_tol is None:
        rel_tol = 1e-4

    ndim = get_graph_ndim(g_reg)

    if abs_tol is None:
        abs_tol = np.max(
            [
                np.sqrt(
                    np.sum(
                        [
                            v**2
                            for v in g_reg.nodes[n]["stack_props"][
                                "spacing"
                            ].values()
                        ]
                    )
                )
                for n in g_reg.nodes
            ]
        )

    if reference_view is not None and reference_view in g_reg.nodes:
        ref_node = reference_view
    else:
        ref_node = mv_graph.get_node_with_maximal_edge_weight_sum_from_graph(
            g_reg, weight_key="quality"
        )

    g_beads = get_beads_graph_from_reg_graph(g_reg, ndim=ndim)
    params_by_node, df, g_opt = optimize_bead_subgraph(
        g_beads, transform, ref_node, max_iter, rel_tol, abs_tol
    )

    info_dict = {
        "metrics": df,
        "used_edges": [tuple(sorted(e)) for e in g_opt.edges],
    }
    return params_by_node, info_dict


def optimize_bead_subgraph(
    g_beads, transform, ref_node, max_iter, rel_tol, abs_tol
):
    g_beads = copy.deepcopy(g_beads)

    mapping = {n: i for i, n in enumerate(g_beads.nodes)}
    inverse_mapping = {i: n for n, i in mapping.items()}
    nx.relabel_nodes(g_beads, mapping, copy=False)
    for e in g_beads.edges:
        g_beads.edges[e]["beads"] = {
            mapping[k]: v for k, v in g_beads.edges[e]["beads"].items()
        }
    ref_node = mapping[ref_node]

    centralities = nx.degree_centrality(g_beads)
    sorted_nodes = sorted(centralities, key=centralities.get, reverse=True)
    all_nodes = list(mapping.values())
    ndim = g_beads.nodes[all_nodes[0]]["affine"].shape[-1] - 1

    transform = transform.lower()
    if transform not in ("translation", "rigid", "similarity", "affine"):
        raise ValueError(
            f"Unknown transformation type in parameter resolution: {transform}"
        )

    new_affines = np.stack(
        [np.asarray(g_beads.nodes[n]["affine"], dtype=float) for n in all_nodes]
    )

    mean_residuals = []
    max_residuals = []
    edge_residuals = {}
    total_iterations = 0

    while True:
        edges = list(g_beads.edges)
        if not len(edges):
            break

        node_edges = [list(g_beads.edges(n)) for n in all_nodes]
        node_beads = []
        adj_info = []
        for n in all_nodes:
            if node_edges[n]:
                own = np.concatenate(
                    [g_beads.edges[e]["beads"][n] for e in node_edges[n]],
                    axis=0,
                )
                own_h = np.concatenate([own, np.ones((len(own), 1))], axis=1)
            else:
                own_h = None
            node_beads.append(own_h)
            neighbors = [
                m for e in node_edges[n] for m in e if m != n
            ]
            neigh_beads = [
                np.concatenate(
                    [
                        g_beads.edges[e]["beads"][m],
                        np.ones((len(g_beads.edges[e]["beads"][m]), 1)),
                    ],
                    axis=1,
                )
                for e in node_edges[n]
                for m in e
                if m != n
            ]
            adj_info.append(list(zip(neighbors, neigh_beads)))

        iter_all_residuals = []
        for iteration in range(max_iter):
            for curr_node in sorted_nodes:
                if not node_edges[curr_node]:
                    continue
                node_pts = (new_affines[curr_node] @ node_beads[curr_node].T).T[
                    :, :-1
                ]
                adj_pts = np.concatenate(
                    [
                        (new_affines[an] @ ab.T).T
                        for an, ab in adj_info[curr_node]
                    ],
                    axis=0,
                )[:, :-1]
                if curr_node != ref_node:
                    fit = estimate_transform(transform, node_pts, adj_pts)
                    if np.all(np.isfinite(fit)):
                        new_affines[curr_node] = fit @ new_affines[curr_node]
                total_iterations += 1

            edge_residuals = {}
            for e in g_beads.edges:
                n1, n2 = e
                pts1 = param_utils.transform_pts(
                    g_beads.edges[e]["beads"][n1], new_affines[n1]
                )
                pts2 = param_utils.transform_pts(
                    g_beads.edges[e]["beads"][n2], new_affines[n2]
                )
                edge_residuals[e] = np.linalg.norm(pts1 - pts2, axis=1)

            mean_residuals.append(
                float(np.mean([np.mean(v) for v in edge_residuals.values()]))
            )
            max_residuals.append(
                float(np.max([np.max(v) for v in edge_residuals.values()]))
            )
            iter_all_residuals.append(edge_residuals)

            if iteration > 5:
                max_rel_change = np.max(
                    [
                        np.max(
                            np.abs(
                                (
                                    iter_all_residuals[-1][e]
                                    - iter_all_residuals[-2][e]
                                )
                                / max_residuals[-1]
                            )
                        )
                        if max_residuals[-1] > 0
                        else 0.0
                        for e in g_beads.edges
                    ]
                )
                if max_rel_change < rel_tol:
                    break

        if len(list(g_beads.edges)) < 2:
            break

        edges = list(g_beads.edges)
        if max_residuals[-1] < abs_tol:
            edge_to_remove = None
        else:
            edge_residual_values = [
                (1 - float(g_beads.edges[e]["quality"])) ** 2
                * np.sqrt(np.max(edge_residuals[e]))
                * np.log10(
                    np.max([len(list(g_beads.neighbors(n))) for n in e])
                )
                for e in edges
            ]
            residual_order = np.argsort(edge_residual_values)[::-1]
            # pick the worst edge whose removal keeps its nodes connected
            found = False
            edge_to_remove = None
            for candidate_ind in range(len(residual_order)):
                candidate = edges[residual_order[candidate_ind]]
                tmp = g_beads.copy()
                tmp.remove_edge(*candidate)
                if nx.has_path(tmp, candidate[0], candidate[1]):
                    edge_to_remove = candidate
                    found = True
                    break
            if not found:
                edge_to_remove = None

        if edge_to_remove is not None:
            g_beads.remove_edge(*edge_to_remove)
            logger.debug("Removing edge %s and restarting.", edge_to_remove)
        else:
            break

    if total_iterations:
        for n in all_nodes:
            g_beads.nodes[n]["affine"] = new_affines[n]
        for e, residual in edge_residuals.items():
            g_beads.edges[e]["residual"] = float(np.mean(residual))

    nx.relabel_nodes(g_beads, inverse_mapping, copy=False)

    df = pd.DataFrame(
        {
            "mean_residual": mean_residuals,
            "max_residual": max_residuals,
            "iteration": np.arange(len(mean_residuals)),
        }
    )

    params = {
        node: param_utils.affine_to_xaffine(g_beads.nodes[node]["affine"])
        for node in g_beads.nodes
    }
    return params, df, g_beads
