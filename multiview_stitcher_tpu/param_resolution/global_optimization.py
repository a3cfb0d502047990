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
    """Gauss-Seidel bead optimization, vectorized over edges.

    The reference recomputes every bead position with per-edge numpy calls
    inside the sweep (global_optimization.py:169-511), which is the documented
    scaling bottleneck (">100s of tiles"). Here all per-iteration work runs on
    (E, n_beads, ndim) arrays: residuals in one vectorized pass, and for the
    default ``translation`` transform the per-node re-fit collapses to the
    closed form ``t[n] = mean_j(d_j) + mean_j(t[m_j])`` with per-edge constant
    displacements ``d_j`` (node affines start at identity and translation fits
    compose to pure translations, so bead positions are affine in ``t``).
    Sweep order, convergence criterion, and the edge-removal outer loop keep
    the reference semantics.
    """
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
    N = len(all_nodes)
    ndim = g_beads.nodes[all_nodes[0]]["affine"].shape[-1] - 1

    transform = transform.lower()
    if transform not in ("translation", "rigid", "similarity", "affine"):
        raise ValueError(
            f"Unknown transformation type in parameter resolution: {transform}"
        )

    new_affines = np.stack(
        [np.asarray(g_beads.nodes[n]["affine"], dtype=float) for n in all_nodes]
    )
    # the closed-form translation path requires bead positions affine in t,
    # i.e. identity linear parts (always true for graphs built by
    # get_beads_graph_from_reg_graph, where node affines start at identity)
    use_translation_fast_path = transform == "translation" and np.allclose(
        new_affines[:, :ndim, :ndim],
        np.eye(ndim)[None],
        atol=1e-12,
    )

    # static edge arrays (edge removal just masks a row)
    edge_list = list(g_beads.edges)
    E = len(edge_list)
    e1 = np.array([e[0] for e in edge_list], dtype=np.int64)
    e2 = np.array([e[1] for e in edge_list], dtype=np.int64)
    beads1 = np.stack(
        [np.asarray(g_beads.edges[e]["beads"][e[0]], float) for e in edge_list]
    )  # (E, nb, ndim)
    beads2 = np.stack(
        [np.asarray(g_beads.edges[e]["beads"][e[1]], float) for e in edge_list]
    )
    ones = np.ones(beads1.shape[:2] + (1,))
    beads1_h = np.concatenate([beads1, ones], axis=2)  # (E, nb, ndim+1)
    beads2_h = np.concatenate([beads2, ones], axis=2)
    qualities = np.array(
        [float(g_beads.edges[e]["quality"]) for e in edge_list]
    )
    active = np.ones(E, dtype=bool)

    def residual_matrix():
        """Per-bead residuals of active edges, (E_active, nb)."""
        if use_translation_fast_path:
            t = new_affines[:, :ndim, ndim]
            diff = (beads1[active] - beads2[active]) + (
                t[e1[active]] - t[e2[active]]
            )[:, None, :]
        else:
            pts1 = np.einsum(
                "eij,enj->eni", new_affines[e1[active]], beads1_h[active]
            )[..., :ndim]
            pts2 = np.einsum(
                "eij,enj->eni", new_affines[e2[active]], beads2_h[active]
            )[..., :ndim]
            diff = pts1 - pts2
        return np.linalg.norm(diff, axis=2)

    mean_residuals = []
    max_residuals = []
    res_mat = np.zeros((0, beads1.shape[1]))
    total_iterations = 0

    # graph coloring computed ONCE: a proper coloring stays proper when
    # edges are removed, so outer-loop restarts reuse it. The same
    # persistent graph serves the incremental connectivity checks.
    import scipy.sparse as sp

    g_conn = nx.Graph()
    g_conn.add_nodes_from(all_nodes)
    g_conn.add_edges_from(zip(e1.tolist(), e2.tolist()))
    coloring = nx.greedy_color(g_conn)
    d12 = np.mean(beads2 - beads1, axis=1)  # (E, ndim)

    while True:
        if not np.any(active):
            break

        # per-node adjacency over active edges, as sparse operators; the
        # Gauss-Seidel sweep updates one graph-color class at a time (nodes
        # within a class are non-adjacent, so the simultaneous update equals
        # a sequential sweep in some node order)
        act = np.nonzero(active)[0]
        rows = np.concatenate([e1[act], e2[act]])
        cols = np.concatenate([e2[act], e1[act]])
        adj = sp.csr_matrix(
            (np.ones(len(rows)), (rows, cols)), shape=(N, N)
        )
        deg = np.asarray(adj.sum(axis=1)).ravel()
        d_signed = np.concatenate([d12[act], -d12[act]])
        nbr_const = np.zeros((N, ndim))
        np.add.at(nbr_const, rows, d_signed)
        nbr_const /= np.maximum(deg, 1)[:, None]

        n_colors = max(coloring.values()) + 1 if coloring else 1
        # classes ordered so high-degree nodes update first (reference
        # sweeps in degree-centrality order); per-class operators are
        # sliced once per round, not per iteration
        color_classes = []
        for c in range(n_colors):
            cls = np.array(
                [
                    n
                    for n in sorted_nodes
                    if coloring[n] == c and deg[n] > 0 and n != ref_node
                ],
                dtype=np.int64,
            )
            if len(cls):
                color_classes.append(cls)
        color_classes.sort(key=lambda cls: -deg[cls].max())
        class_ops = [
            (cls, adj[cls], nbr_const[cls], deg[cls, None])
            for cls in color_classes
        ]
        n_updates_per_sweep = int(np.sum(deg > 0))

        if not use_translation_fast_path:
            # general path: concatenated own/neighbor homogeneous beads
            node_beads, adj_info = [], []
            for n in all_nodes:
                eis = [
                    ei
                    for ei in np.nonzero(active)[0]
                    if e1[ei] == n or e2[ei] == n
                ]
                if eis:
                    own = np.concatenate(
                        [
                            beads1_h[ei] if e1[ei] == n else beads2_h[ei]
                            for ei in eis
                        ]
                    )
                    adj = [
                        (
                            int(e2[ei] if e1[ei] == n else e1[ei]),
                            beads2_h[ei] if e1[ei] == n else beads1_h[ei],
                        )
                        for ei in eis
                    ]
                else:
                    own, adj = None, []
                node_beads.append(own)
                adj_info.append(adj)

        prev_res_mat = None
        for iteration in range(max_iter):
            if use_translation_fast_path:
                t = new_affines[:, :ndim, ndim]
                for cls, adj_cls, const_cls, deg_cls in class_ops:
                    t[cls] = const_cls + (adj_cls @ t) / deg_cls
                total_iterations += n_updates_per_sweep
            else:
                for curr_node in sorted_nodes:
                    if node_beads[curr_node] is None:
                        continue
                    node_pts = (
                        new_affines[curr_node] @ node_beads[curr_node].T
                    ).T[:, :-1]
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
                            new_affines[curr_node] = (
                                fit @ new_affines[curr_node]
                            )
                    total_iterations += 1

            res_mat = residual_matrix()
            mean_residuals.append(float(res_mat.mean()))
            max_residuals.append(float(res_mat.max()))

            if iteration > 5:
                max_rel_change = (
                    float(
                        np.max(np.abs(res_mat - prev_res_mat))
                        / max_residuals[-1]
                    )
                    if max_residuals[-1] > 0
                    else 0.0
                )
                if max_rel_change < rel_tol:
                    break
            prev_res_mat = res_mat

        if int(np.sum(active)) < 2:
            break

        if max_residuals[-1] < abs_tol:
            edge_to_remove = None
        else:
            # removal criterion over active edges (reference :426-436)
            act = np.nonzero(active)[0]
            degrees = np.bincount(
                np.concatenate([e1[act], e2[act]]), minlength=N
            )
            crit = (
                (1 - qualities[act]) ** 2
                * np.sqrt(res_mat.max(axis=1))
                * np.log10(np.maximum(degrees[e1[act]], degrees[e2[act]]))
            )
            # pick the worst edge whose removal keeps its nodes connected
            # (incremental on the persistent graph)
            edge_to_remove = None
            for ci in np.argsort(crit)[::-1]:
                ei = int(act[ci])
                g_conn.remove_edge(e1[ei], e2[ei])
                if nx.has_path(g_conn, e1[ei], e2[ei]):
                    edge_to_remove = ei
                    break
                g_conn.add_edge(e1[ei], e2[ei])

        if edge_to_remove is not None:
            active[edge_to_remove] = False
            g_beads.remove_edge(
                int(e1[edge_to_remove]), int(e2[edge_to_remove])
            )
            logger.debug(
                "Removing edge %s and restarting.",
                (int(e1[edge_to_remove]), int(e2[edge_to_remove])),
            )
        else:
            break

    if total_iterations:
        for n in all_nodes:
            g_beads.nodes[n]["affine"] = new_affines[n]
        act = np.nonzero(active)[0]
        for row, ei in enumerate(act):
            g_beads.edges[int(e1[ei]), int(e2[ei])]["residual"] = float(
                np.mean(res_mat[row])
            )

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
