"""Shared helpers for groupwise parameter resolution.

Covers the same ground as the reference's param_resolution/utils.py
(virtual-bead construction from overlap bboxes, RMS edge residuals,
graph introspection) but is organised around an edge-bead iterator and a
single vectorized residual evaluation instead of per-edge graph walks.

Conventions (SURVEY.md Appendix E): an edge's ``transform`` maps the
lower-indexed view's world coordinates into the higher-indexed view's
world coordinates; candidate global params map view world coords into the
new shared frame.
"""

from __future__ import annotations

from dataclasses import dataclass

import networkx as nx
import numpy as np

from multiview_stitcher_tpu import param_utils
from multiview_stitcher_tpu.param_utils import XAffine


def _edge_transform_matrix(value) -> np.ndarray:
    """Plain (ndim+1, ndim+1) matrix from an edge/param entry.

    Accepts an XAffine (possibly t-expanded with a single timepoint) or
    anything array-like.
    """
    if not isinstance(value, XAffine):
        return np.asarray(value, dtype=float)
    m = value.squeeze()
    return m if m.ndim == 2 else m[0]


def get_graph_ndim(g_reg) -> int:
    """Spatial dimensionality of a registration graph.

    Prefer an edge transform (shape ndim+1); fall back to a node's
    stack_props spacing when the graph has no edges.
    """
    for _u, _v, data in g_reg.edges(data=True):
        return _edge_transform_matrix(data["transform"]).shape[-1] - 1
    for _node, data in g_reg.nodes(data=True):
        spacing = data.get("stack_props", {}).get("spacing")
        if spacing is not None:
            return len(spacing)
    raise ValueError("Cannot determine dimensionality from graph.")


def get_graph_timepoints(g_reg) -> list:
    """Sorted union of the t coordinates carried by edge transforms."""
    ts: set = set()
    for _u, _v, data in g_reg.edges(data=True):
        tf = data.get("transform")
        if isinstance(tf, XAffine) and tf.has_t:
            ts.update(np.asarray(tf.t_coords).tolist())
    return sorted(ts)


def get_reg_graph_with_single_tp_transforms(g_reg, t):
    """Copy of ``g_reg`` with every t-aware edge attribute narrowed to
    timepoint ``t`` (including per-t quality arrays aligned with the edge
    transform's t axis)."""
    out = g_reg.copy()
    for u, v, data in out.edges(data=True):
        tf = data.get("transform")
        t_axis = (
            np.asarray(tf.t_coords)
            if isinstance(tf, XAffine) and tf.has_t
            else None
        )
        for key in list(data):
            val = data[key]
            if isinstance(val, XAffine) and val.has_t:
                data[key] = val.sel_t(t)
            elif key == "quality" and np.ndim(val) > 0 and t_axis is not None:
                pos = int(np.flatnonzero(t_axis == t)[0])
                data[key] = np.asarray(val).ravel()[pos]
    return out


@dataclass
class EdgeBeads:
    """Virtual beads of one registration edge: the overlap-bbox corners
    expressed in both incident views' world frames."""

    u: int  # lower view index
    v: int  # higher view index
    pts_u: np.ndarray  # (2**ndim, ndim) corners in u's world frame
    pts_v: np.ndarray  # same corners mapped through the edge transform
    quality: float
    overlap: float


def _bbox_corners(bbox) -> np.ndarray:
    """All 2**ndim corner points of an axis-aligned (lower, upper) box."""
    lower, upper = np.asarray(bbox, dtype=float)
    corners = np.stack(
        np.meshgrid(*[(lo, hi) for lo, hi in zip(lower, upper)],
                    indexing="ij"),
        axis=-1,
    )
    return corners.reshape(-1, lower.shape[0])


def iter_edge_beads(g_reg):
    """Yield an :class:`EdgeBeads` per edge of a single-timepoint
    registration graph."""
    for u, v, data in g_reg.edges(data=True):
        u, v = sorted((u, v))
        corners = _bbox_corners(np.asarray(data["bbox"], dtype=float))
        mat = _edge_transform_matrix(data["transform"])
        q = np.asarray(data.get("quality", 1.0), dtype=float)
        yield EdgeBeads(
            u=u,
            v=v,
            pts_u=corners,
            pts_v=param_utils.transform_pts(corners, mat),
            quality=float(np.nanmean(q)) if np.isfinite(q).any() else np.nan,
            overlap=float(data.get("overlap", 1.0)),
        )


def get_beads_graph_from_reg_graph(g_reg_subgraph, ndim: int) -> nx.Graph:
    """Bead graph consumed by the iterative global optimizer: one edge per
    registration edge carrying both point sets, with per-node running
    affines initialised to identity."""
    g = nx.Graph()
    g.add_nodes_from(g_reg_subgraph.nodes)
    for eb in iter_edge_beads(g_reg_subgraph):
        g.add_edge(
            eb.u,
            eb.v,
            beads={eb.u: eb.pts_u, eb.v: eb.pts_v},
            quality=eb.quality,
            overlap=eb.overlap,
        )
    identity = np.eye(ndim + 1)
    for node in g.nodes:
        g.nodes[node]["affine"] = identity.copy()
    return g


def compute_edge_residuals(g_reg, params, ndim=None) -> dict:
    """Per-edge RMS distance between the two bead sets after applying the
    candidate global params — evaluated for all edges in one batch."""
    edge_beads = list(iter_edge_beads(g_reg))
    if not edge_beads:
        return {}
    # batch: (E, P, ndim) bead stacks and (E, ndim+1, ndim+1) param pairs
    pts_u = np.stack([eb.pts_u for eb in edge_beads])
    pts_v = np.stack([eb.pts_v for eb in edge_beads])
    mats_u = np.stack(
        [_edge_transform_matrix(params[eb.u]) for eb in edge_beads]
    )
    mats_v = np.stack(
        [_edge_transform_matrix(params[eb.v]) for eb in edge_beads]
    )

    def apply(mats, pts):
        nd = pts.shape[-1]
        lin = np.einsum("eij,epj->epi", mats[:, :nd, :nd], pts)
        return lin + mats[:, None, :nd, nd]

    delta = apply(mats_u, pts_u) - apply(mats_v, pts_v)
    rms = np.sqrt(np.mean(np.sum(delta**2, axis=-1), axis=-1))
    return {
        (eb.u, eb.v): float(r) for eb, r in zip(edge_beads, rms)
    }
