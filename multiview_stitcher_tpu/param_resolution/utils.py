"""Shared helpers for groupwise parameter resolution.

Rebuild of /root/reference/src/multiview_stitcher/param_resolution/utils.py:
virtual-bead graphs (overlap-bbox corners in both frames) and the shared RMS
bead-residual metric.
"""

from __future__ import annotations

import networkx as nx
import numpy as np

from multiview_stitcher_tpu import param_utils
from multiview_stitcher_tpu.param_utils import XAffine


def _edge_transform_matrix(value) -> np.ndarray:
    if isinstance(value, XAffine):
        m = value.squeeze()
        return m[0] if m.ndim == 3 else m
    return np.asarray(value, dtype=float)


def get_graph_ndim(g_reg) -> int:
    if g_reg.number_of_edges():
        e = next(iter(g_reg.edges()))
        return _edge_transform_matrix(g_reg.get_edge_data(*e)["transform"]).shape[-1] - 1
    if len(g_reg.nodes):
        node = next(iter(g_reg.nodes))
        stack_props = g_reg.nodes[node].get("stack_props", {})
        if "spacing" in stack_props:
            return len(stack_props["spacing"])
    raise ValueError("Cannot determine dimensionality from graph.")


def get_graph_timepoints(g_reg):
    t_coords = []
    for e in g_reg.edges:
        transform = g_reg.edges[e].get("transform")
        if isinstance(transform, XAffine) and transform.has_t:
            t_coords.extend(list(np.asarray(transform.t_coords).tolist()))
    return sorted(set(t_coords))


def get_reg_graph_with_single_tp_transforms(g_reg, t):
    g_reg_t = g_reg.copy()
    for e in g_reg_t.edges:
        for k, v in list(g_reg_t.edges[e].items()):
            if isinstance(v, XAffine) and v.has_t:
                g_reg_t.edges[e][k] = v.sel_t(t)
            elif k == "quality" and np.ndim(v) > 0:
                transform = g_reg.edges[e].get("transform")
                if isinstance(transform, XAffine) and transform.has_t:
                    idx = int(
                        np.where(np.asarray(transform.t_coords) == t)[0][0]
                    )
                    g_reg_t.edges[e][k] = np.asarray(v).ravel()[idx]
    return g_reg_t


def get_beads_graph_from_reg_graph(g_reg_subgraph, ndim: int) -> nx.Graph:
    """Virtual bead graph: overlap-bbox corners expressed in both frames.

    Edge transforms map the lower-indexed (fixed) view's world coords into the
    higher-indexed (moving) view's world coords (SURVEY.md Appendix E).
    """
    g_beads = nx.Graph()
    g_beads.add_nodes_from(g_reg_subgraph.nodes)
    for e in g_reg_subgraph.edges:
        sorted_e = tuple(sorted(e))
        bbox = np.asarray(g_reg_subgraph.edges[e]["bbox"], dtype=float)
        bbox_lower, bbox_upper = bbox[0], bbox[1]
        gv = np.array(list(np.ndindex(tuple([2] * len(bbox_lower)))))
        bbox_vertices = gv * (bbox_upper - bbox_lower) + bbox_lower
        affine = _edge_transform_matrix(g_reg_subgraph.edges[e]["transform"])
        quality = g_reg_subgraph.edges[e].get("quality", 1.0)
        q_arr = np.asarray(quality, dtype=float)
        quality = (
            float(np.nanmean(q_arr))
            if np.any(np.isfinite(q_arr))
            else float("nan")
        )
        overlap = float(g_reg_subgraph.edges[e].get("overlap", 1.0))
        g_beads.add_edge(
            sorted_e[0],
            sorted_e[1],
            beads={
                sorted_e[0]: bbox_vertices,
                sorted_e[1]: param_utils.transform_pts(bbox_vertices, affine),
            },
            quality=quality,
            overlap=overlap,
        )
    for node in g_reg_subgraph.nodes:
        g_beads.nodes[node]["affine"] = np.eye(ndim + 1)
    return g_beads


def compute_edge_residuals(g_reg, params, ndim=None):
    """RMS virtual-bead distance per edge under candidate global params."""
    if not g_reg.number_of_edges():
        return {}
    if ndim is None:
        ndim = get_graph_ndim(g_reg)
    g_beads = get_beads_graph_from_reg_graph(g_reg, ndim=ndim)
    residuals = {}
    for e in g_beads.edges:
        node1, node2 = e
        p1 = _edge_transform_matrix(params[node1])
        p2 = _edge_transform_matrix(params[node2])
        pts1 = param_utils.transform_pts(g_beads.edges[e]["beads"][node1], p1)
        pts2 = param_utils.transform_pts(g_beads.edges[e]["beads"][node2], p2)
        residuals[tuple(sorted(e))] = float(
            np.sqrt(np.mean(np.sum((pts1 - pts2) ** 2, axis=1)))
        )
    return residuals
