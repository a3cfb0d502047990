"""Overlap geometry and view adjacency graph (host-side planning).

TPU-native rebuild of the reference's ``mv_graph``
(/root/reference/src/multiview_stitcher/mv_graph.py). This layer is pure
planning: tiny dense linear algebra + graph logic that stays on the host CPU
(SURVEY.md §2.1). The n-D convex overlap between transformed tile boxes is
computed via halfspace intersection (scipy QHull + linprog feasible point,
reference mv_graph.py:301-338) with an exact axis-aligned AABB fast path that
skips QHull entirely for translation-only tile layouts (the common grid case;
this is the host bottleneck at 1000+ tiles in the reference).

Graph data contract (SURVEY.md §2.2): nodes carry ``stack_props``; edges carry
``overlap`` (volume), and after registration ``transform``/``quality``/``bbox``.
"""

from __future__ import annotations

import logging
import warnings
from itertools import chain, product
from typing import Dict, Optional, Sequence, Union

import networkx as nx
import numpy as np
from scipy.optimize import linprog
from scipy.spatial import ConvexHull, HalfspaceIntersection, QhullError, cKDTree

from multiview_stitcher_tpu import msi_utils, param_utils
from multiview_stitcher_tpu import si_utils
from multiview_stitcher_tpu.utils.misc import threshold_otsu

BoundingBox = Dict[str, Dict[str, Union[float, int]]]

logger = logging.getLogger(__name__)


class NotEnoughOverlapError(Exception):
    pass


# ---------------------------------------------------------------------------
# stack-props geometry helpers
# ---------------------------------------------------------------------------


def get_spatial_dims_from_stack_properties(stack_props):
    return [d for d in si_utils.SPATIAL_DIMS if d in stack_props["origin"]]


def get_ndim_from_stack_props(stack_props) -> int:
    return len(stack_props["origin"])


def _props_arrays(stack_props):
    sdims = get_spatial_dims_from_stack_properties(stack_props)
    shape = np.array([stack_props["shape"][d] for d in sdims], dtype=float)
    spacing = np.array([stack_props["spacing"][d] for d in sdims], dtype=float)
    origin = np.array([stack_props["origin"][d] for d in sdims], dtype=float)
    return sdims, shape, spacing, origin


def _props_transform_matrix(stack_props) -> Optional[np.ndarray]:
    if "transform" not in stack_props:
        return None
    aff = stack_props["transform"]
    if isinstance(aff, param_utils.XAffine):
        if aff.has_t:
            return np.asarray(aff.data[0])
        return np.asarray(aff.data)
    return np.asarray(aff)


from functools import lru_cache


@lru_cache(maxsize=8)
def _corner_grid(ndim: int) -> np.ndarray:
    """(2^ndim, ndim) unit-box corner table (hot in per-edge geometry)."""
    return np.array(list(np.ndindex(tuple([2] * ndim))), dtype=float)


def get_vertices_from_stack_props(stack_props) -> np.ndarray:
    """Pixel-center corner vertices in world coordinates (reference :429)."""
    sdims, shape, spacing, origin = _props_arrays(stack_props)
    ndim = len(sdims)
    gv = _corner_grid(ndim)
    vertices = gv * (shape - 1) * spacing + origin
    mat = _props_transform_matrix(stack_props)
    if mat is not None:
        vertices = param_utils.transform_pts(vertices, mat)
    return vertices


def get_faces_from_stack_props(stack_props) -> np.ndarray:
    """Face vertex sets in world coordinates (reference :383)."""
    sdims, shape, spacing, origin = _props_arrays(stack_props)
    ndim = len(sdims)
    gv = np.array(list(np.ndindex(tuple([2] * ndim))), dtype=float)
    faces = []
    for iax in range(ndim):
        for lface in [0, 1]:
            faces.append(gv[np.where(gv[:, iax] == lface)[0]])
    faces = np.array(faces)
    faces = faces * (shape - 1) * spacing + origin
    mat = _props_transform_matrix(stack_props)
    if mat is not None:
        orig_shape = faces.shape
        flat = faces.reshape(-1, ndim)
        faces = param_utils.transform_pts(flat, mat).reshape(orig_shape)
    return faces


def get_center_from_stack_props(stack_props) -> np.ndarray:
    sdims, shape, spacing, origin = _props_arrays(stack_props)
    center = origin + spacing * (shape - 1) / 2
    mat = _props_transform_matrix(stack_props)
    if mat is not None:
        center = param_utils.transform_pts(center[None], mat)[0]
    return center


def get_halfspace_equations_from_stack_props(stack_props) -> np.ndarray:
    """Inward halfspace equations ``n·x + c <= 0`` of the (transformed) box.

    Reference: mv_graph.py:178-219.
    """
    ndim = get_ndim_from_stack_props(stack_props)
    faces = get_faces_from_stack_props(stack_props)
    center = get_center_from_stack_props(stack_props)

    equations = []
    for face in faces:
        if ndim == 2:
            normal = np.array(
                [-(face[1][1] - face[0][1]), face[1][0] - face[0][0]]
            )
        elif ndim == 3:
            normal = np.cross(face[1] - face[0], face[2] - face[0])
        else:
            raise NotImplementedError(ndim)
        normal = normal / np.linalg.norm(normal)
        c = -np.dot(normal, face[0])
        if np.dot(normal, center) + c > 0:
            normal = -normal
            c = -np.dot(normal, face[0])
        equations.append(np.concatenate([normal, [c]]))
    return np.array(equations)


def _is_axis_aligned(stack_props, tol=1e-12) -> bool:
    """True if the stack's world transform is a pure translation + positive
    diagonal scaling (no rotation/shear), allowing an AABB overlap fast path."""
    mat = _props_transform_matrix(stack_props)
    if mat is None:
        return True
    ndim = mat.shape[-1] - 1
    lin = mat[:ndim, :ndim]
    off_diag = lin - np.diag(np.diag(lin))
    return bool(
        np.all(np.abs(off_diag) <= tol) and np.all(np.diag(lin) > 0)
    )


def _world_aabb(stack_props):
    verts = get_vertices_from_stack_props(stack_props)
    return verts.min(axis=0), verts.max(axis=0)


class BoxIntersection:
    """Light stand-in for scipy's HalfspaceIntersection for AABB overlaps.

    Exposes the attributes the rest of the pipeline uses: ``halfspaces``,
    ``interior_point`` and ``intersections`` (vertices of the overlap box).
    """

    def __init__(self, lower, upper):
        self.lower = np.asarray(lower, dtype=float)
        self.upper = np.asarray(upper, dtype=float)

    @property
    def intersections(self):
        ndim = len(self.lower)
        gv = _corner_grid(ndim)
        return self.lower + gv * (self.upper - self.lower)

    @property
    def halfspaces(self):
        ndim = len(self.lower)
        eqs = []
        for d in range(ndim):
            n = np.zeros(ndim)
            n[d] = -1.0
            eqs.append(np.concatenate([n, [self.lower[d]]]))
            n = np.zeros(ndim)
            n[d] = 1.0
            eqs.append(np.concatenate([n, [-self.upper[d]]]))
        return np.array(eqs)

    @property
    def interior_point(self):
        return (self.lower + self.upper) / 2


def get_overlap_between_pair_of_stack_props(stack_props1, stack_props2):
    """Convex overlap (volume, intersection object) of two transformed boxes.

    Exact AABB path when both boxes are axis-aligned in world space; otherwise
    halfspace intersection with a linprog-found feasible interior point
    (reference mv_graph.py:301-338). Returns (-1, None) when empty.
    """
    if _is_axis_aligned(stack_props1) and _is_axis_aligned(stack_props2):
        lo1, up1 = _world_aabb(stack_props1)
        lo2, up2 = _world_aabb(stack_props2)
        lower = np.maximum(lo1, lo2)
        upper = np.minimum(up1, up2)
        if np.any(upper < lower):
            return -1, None
        volume = float(np.prod(upper - lower))
        return volume, BoxIntersection(lower, upper)

    eqs = np.concatenate(
        [
            get_halfspace_equations_from_stack_props(stack_props1),
            get_halfspace_equations_from_stack_props(stack_props2),
        ]
    )
    # Chebyshev-center LP to find a strictly interior feasible point
    norm_vector = np.linalg.norm(eqs[:, :-1], axis=1, keepdims=True)
    c = np.zeros(eqs.shape[1])
    c[-1] = -1
    A = np.hstack((eqs[:, :-1], norm_vector))
    b = -eqs[:, -1:]
    res = linprog(c, A_ub=A, b_ub=b, bounds=(None, None))
    if not res.success or res.x[-1] <= 0:
        return -1, None
    feasible_point = res.x[:-1]
    try:
        intersection = HalfspaceIntersection(eqs, feasible_point)
    except QhullError:
        return -1, None
    volume = ConvexHull(intersection.intersections).volume
    return volume, intersection


def expand_halfspace(halfspace, distance):
    """Shift all boundary planes outward by ``distance`` (reference :221)."""
    equations = np.array(halfspace.halfspaces, dtype=float)
    equations[:, -1] -= distance
    interior_point = halfspace.interior_point
    try:
        return HalfspaceIntersection(equations, interior_point)
    except QhullError as e:
        raise ValueError(
            "Cannot expand halfspace by the given distance; result infeasible."
        ) from e


def transform_halfspace(halfspace, affine):
    """Map a halfspace intersection through an affine (reference :258)."""
    affine = np.asarray(affine, dtype=float)
    eqs_transformed = np.asarray(halfspace.halfspaces) @ np.linalg.inv(affine)
    interior_transformed = param_utils.transform_pts(
        np.asarray(halfspace.interior_point)[None], affine
    )[0]
    return HalfspaceIntersection(eqs_transformed, interior_transformed)


def points_inside_sim(pts, sim, transform_key) -> np.ndarray:
    stack_props = si_utils.get_stack_properties_from_sim(
        sim, transform_key=transform_key
    )
    eqs = get_halfspace_equations_from_stack_props(stack_props)
    pts = np.asarray(pts, dtype=float)
    inside = np.ones(len(pts), dtype=bool)
    for eq in eqs:
        inside &= pts @ eq[:-1] + eq[-1] <= 0
    return inside


def get_mask_from_halfspace(sim, halfspace_eqs) -> np.ndarray:
    """Boolean mask of sim pixels inside all halfspaces (reference :542)."""
    sdims = si_utils.get_spatial_dims_from_sim(sim)
    grids = np.meshgrid(
        *[sim.spatial_coords(d) for d in sdims], indexing="ij"
    )
    mask = np.ones(grids[0].shape, dtype=bool)
    for eq in halfspace_eqs:
        val = sum(eq[i] * grids[i] for i in range(len(sdims))) + eq[-1]
        mask &= val <= 0
    return mask


# ---------------------------------------------------------------------------
# view adjacency graph
# ---------------------------------------------------------------------------


def build_view_adjacency_graph_from_msims(
    msims,
    transform_key,
    overlap_tolerance=None,
    expand: bool = False,
    pairs=None,
) -> nx.Graph:
    """Graph of overlapping views: nodes carry stack_props, edges overlap area.

    Candidate pairs are found with a cKDTree over view centers (reference
    mv_graph.py:108-143), then exact overlap is computed per pair.
    """
    g = nx.Graph()
    for iview in range(len(msims)):
        g.add_node(iview)

    sims = [msi_utils.get_sim_from_msim(m) for m in msims]
    sdims = si_utils.get_spatial_dims_from_sim(sims[0])
    nsdims = si_utils.get_nonspatial_dims_from_sim(sims[0])
    if len(nsdims):
        sims = [
            si_utils.sim_sel_coords(
                sim, {nsdim: sim.coords[nsdim][0] for nsdim in nsdims}
            )
            for sim in sims
        ]

    stack_propss = [
        si_utils.get_stack_properties_from_sim(sim, transform_key=transform_key)
        for sim in sims
    ]
    if overlap_tolerance is not None:
        stack_propss = [
            si_utils.extend_stack_props(sp, overlap_tolerance)
            for sp in stack_propss
        ]

    nx.set_node_attributes(g, dict(enumerate(stack_propss)), name="stack_props")

    if pairs is None:
        sim_centers = np.array(
            [get_center_from_stack_props(sp) for sp in stack_propss]
        )
        sim_diameters = np.array(
            [
                np.linalg.norm(
                    np.array(
                        [
                            sp["shape"][d] * sp["spacing"][d]
                            for d in sdims
                        ]
                    )
                )
                for sp in stack_propss
            ]
        )
        max_diameter = float(np.max(sim_diameters))
        tree = cKDTree(sim_centers)
        pairs = []
        for iview in range(len(msims)):
            close_views = tree.query_ball_point(
                sim_centers[iview], max_diameter + 1
            )
            for close_view in close_views:
                if iview != close_view:
                    pairs.append((iview, close_view))

    # vectorized axis-aligned sweep: world AABBs once per view, all pair
    # overlaps in one numpy pass; only non-axis-aligned participants fall
    # back to the per-pair halfspace machinery
    aligned = np.array([_is_axis_aligned(sp) for sp in stack_propss])
    aabbs = [
        _world_aabb(sp) if aligned[i] else (None, None)
        for i, sp in enumerate(stack_propss)
    ]
    if pairs and np.all(aligned):
        idx = np.asarray(list(pairs))
        lows = np.array([a[0] for a in aabbs])
        ups = np.array([a[1] for a in aabbs])
        lower = np.maximum(lows[idx[:, 0]], lows[idx[:, 1]])
        upper = np.minimum(ups[idx[:, 0]], ups[idx[:, 1]])
        extent = upper - lower
        empty = np.any(extent < 0, axis=1)
        vols = np.where(empty, -1.0, np.prod(extent, axis=1))
        for (a, b), vol in zip(pairs, vols):
            if vol > 0 or (expand and vol >= 0):
                g.add_edge(a, b, overlap=float(vol))
        return g

    for pair in pairs:
        overlap_area, _ = get_overlap_between_pair_of_stack_props(
            stack_propss[pair[0]], stack_propss[pair[1]]
        )
        # overlap == 0 means exactly one-pixel overlap: not usable for
        # registration unless `expand` is requested
        if overlap_area > 0 or (expand and overlap_area >= 0):
            g.add_edge(pair[0], pair[1], overlap=overlap_area)

    return g


def get_node_with_maximal_edge_weight_sum_from_graph(g, weight_key):
    total = {node: 0.0 for node in g.nodes}
    for a, b, attrs in g.edges(data=True):
        w_arr = np.asarray(attrs[weight_key], dtype=float)
        finite = w_arr[np.isfinite(w_arr)]
        w = float(finite.mean()) if finite.size else 0.0
        total[a] += w
        total[b] += w
    return max(total, key=total.get)


# ---------------------------------------------------------------------------
# graph pruning methods (reference :664-:905, :1148)
# ---------------------------------------------------------------------------


def prune_graph_to_alternating_colors(g, n_colors=2, return_colors=True):
    """Thin the adjacency graph until a greedy coloring uses <= n_colors.

    Grid-like mosaics register best when views split into alternating
    groups (fix one color, register the other against it); diagonal /
    redundant overlaps break that structure. Edges are ranked by overlap
    area — with normalized edge-betweenness added as a tiebreak, scaled
    into half the smallest overlap so it can only reorder near-ties — and
    removed rank by rank (never isolating a node) until a greedy coloring
    of the remaining graph fits.

    Behavior-parity rewrite of reference mv_graph.py:664.
    """
    if not g.edges:
        return (g, dict.fromkeys(g.nodes, 0)) if return_colors else g

    overlaps = nx.get_edge_attributes(g, "overlap")
    tiebreak_span = 0.5 * min(overlaps.values())
    centrality = nx.edge_betweenness_centrality(g)
    c_lo, c_hi = min(centrality.values()), max(centrality.values())
    c_scale = tiebreak_span / (c_hi - c_lo) if c_hi > c_lo else 0.0
    rank = {
        e: overlaps[e] + (centrality[e] - c_lo) * c_scale for e in overlaps
    }

    pruned = g.copy()
    colors = nx.coloring.greedy_color(pruned)
    for threshold in sorted(set(rank.values())):
        if len(set(colors.values())) <= n_colors:
            break
        # degree guard evaluated against the pre-removal graph: a batch
        # may drop a node to degree 1 but never to 0
        batch = [
            e
            for e in pruned.edges
            if rank[tuple(e)] <= threshold
            and min(pruned.degree(e[0]), pruned.degree(e[1])) > 1
        ]
        pruned.remove_edges_from(batch)
        colors = nx.coloring.greedy_color(pruned)

    return (pruned, colors) if return_colors else pruned


def get_greedy_colors(sims, n_colors=2, transform_key=None):
    """View coloring for visualization (reference :634)."""
    sdims = si_utils.get_spatial_dims_from_sim(sims[0])
    g = build_view_adjacency_graph_from_msims(
        [msi_utils.get_msim_from_sim(sim, scale_factors=[]) for sim in sims],
        overlap_tolerance={d: 1e-5 for d in sdims},
        transform_key=transform_key,
    )
    _, greedy_colors = prune_graph_to_alternating_colors(g, n_colors=n_colors)
    return greedy_colors


def prune_to_shortest_weighted_paths(g) -> nx.Graph:
    """Keep only edges lying on overlap-weighted shortest paths from each
    component's best-connected view.

    Per connected component, the view with the largest summed edge overlap
    anchors a Dijkstra tree under the weight ``1 / (overlap + 1)`` (large
    overlaps = cheap hops); the union of tree edges is the pruned
    registration graph — every view keeps exactly the high-overlap chain
    that links it to the anchor.

    Behavior-parity rewrite of reference mv_graph.py:744.
    """
    components = list(nx.connected_components(g))
    if not any(len(cc) > 1 for cc in components):
        raise NotEnoughOverlapError(
            "No view/tile in the adjacency graph overlaps any other."
        )
    isolated = sorted(
        chain.from_iterable(cc for cc in components if len(cc) == 1)
    )
    if isolated:
        warnings.warn(
            f"Views/tiles without any overlap link: {isolated}",
            UserWarning,
            stacklevel=1,
        )

    for _u, _v, attrs in g.edges(data=True):
        attrs["overlap_inv"] = 1.0 / (attrs["overlap"] + 1)

    g_reg = nx.Graph()
    g_reg.add_nodes_from((n, dict(d)) for n, d in g.nodes(data=True))
    for cc in components:
        anchor = get_node_with_maximal_edge_weight_sum_from_graph(
            g.subgraph(cc), weight_key="overlap"
        )
        tree_paths = nx.single_source_dijkstra_path(
            g, anchor, weight="overlap_inv"
        )
        for node in cc:
            path = tree_paths[node]
            for a, b in zip(path, path[1:]):
                g_reg.add_edge(a, b, overlap=g[a][b]["overlap"])
    return g_reg


def prune_to_axis_aligned_edges(g, max_angle=0.05) -> nx.Graph:
    """Keep edges whose direction aligns with a tile axis (drops diagonals)."""
    edges_to_keep = []
    for edge in g.edges:
        verts1 = get_vertices_from_stack_props(g.nodes[edge[0]]["stack_props"])
        verts2 = get_vertices_from_stack_props(g.nodes[edge[1]]["stack_props"])
        ndim = len(verts1[0])
        edge_vec = np.mean(verts2, 0) - np.mean(verts1, 0)
        edge_vec = edge_vec / np.linalg.norm(edge_vec)

        vert_grid_inds = np.array(list(np.ndindex(tuple([2] * ndim))))
        ax_vecs = []
        for ind in range(len(vert_grid_inds)):
            if np.sum(vert_grid_inds[ind]) != 1:
                continue
            ax_vec = verts1[ind] - verts1[0]
            ax_vecs.append(ax_vec / np.linalg.norm(ax_vec))

        for ax_vec in ax_vecs:
            angle = np.arccos(np.clip(np.abs(np.dot(edge_vec, ax_vec)), 0, 1))
            if angle < max_angle:
                edges_to_keep.append(edge)
                break

    g_pruned = nx.Graph(g.edge_subgraph(edges_to_keep))
    for node in g.nodes:
        if node not in g_pruned.nodes:
            g_pruned.add_node(node, **g.nodes[node])
    return g_pruned


def filter_edges(g, weight_key="overlap", threshold=None) -> nx.Graph:
    """Drop edges whose weight is below an (Otsu-derived) threshold."""
    edges = list(g.edges(data=True))
    if not edges:
        return g
    weights = [e[2][weight_key] for e in edges]
    scalar_weights = np.array(
        [np.min(w) if np.ndim(w) > 0 else w for w in weights], dtype=float
    )
    if threshold is None:
        threshold = threshold_otsu(np.array([np.asarray(w).ravel() for w in weights]).ravel()
                                    if np.ndim(weights[0]) else scalar_weights)
    g_filtered = g.copy()
    g_filtered.remove_edges_from(
        [
            (a, b)
            for (a, b, _), w in zip(edges, scalar_weights)
            if w < threshold
        ]
    )
    return g_filtered


def prune_view_adjacency_graph(g, method=None, pruning_method_kwargs=None):
    """Dispatch to a pruning method by name (reference :1148)."""
    if not len(g.edges):
        raise NotEnoughOverlapError(
            "Not enough overlap between views for stitching."
        )
    pruning_method_kwargs = pruning_method_kwargs or {}
    if method is None:
        return g
    if method == "alternating_pattern":
        return prune_graph_to_alternating_colors(
            g, return_colors=False, **pruning_method_kwargs
        )
    if method == "shortest_paths_overlap_weighted":
        return prune_to_shortest_weighted_paths(g, **pruning_method_kwargs)
    if method == "otsu_threshold_on_overlap":
        return filter_edges(g, **pruning_method_kwargs)
    if method == "keep_axis_aligned":
        return prune_to_axis_aligned_edges(g, **pruning_method_kwargs)
    raise ValueError(f"Unknown graph pruning method: {method}")


# ---------------------------------------------------------------------------
# chunk grids and back-projected overlap windows (fusion planning)
# ---------------------------------------------------------------------------


def normalize_chunks(chunksizes: Sequence, shape: Sequence[int]):
    """Split each dim of ``shape`` into chunk extents (last may be smaller)."""
    out = []
    for cs, s in zip(chunksizes, shape):
        if isinstance(cs, (list, tuple)):
            assert sum(cs) == s, f"explicit chunks {cs} != size {s}"
            out.append(tuple(int(c) for c in cs))
        else:
            cs = int(min(cs, s))
            n_full, rem = divmod(int(s), cs)
            chunks = (cs,) * n_full + ((rem,) if rem else ())
            out.append(chunks)
    return tuple(out)


def get_chunk_bbs(array_bb: BoundingBox, chunksizes: Dict[str, Union[int, list]]):
    """Chunk bounding boxes + block indices for an output grid (reference :934)."""
    spatial_dims = sorted(array_bb["origin"].keys())[::-1]
    cs = [chunksizes[d] for d in spatial_dims]
    array_shape = [array_bb["shape"][d] for d in spatial_dims]
    array_origin = [array_bb["origin"][d] for d in spatial_dims]

    normalized = normalize_chunks(cs, array_shape)
    block_indices = list(product(*(range(len(bds)) for bds in normalized)))
    block_offsets = [np.cumsum((0,) + bds[:-1]) for bds in normalized]
    block_shapes = list(normalized)

    chunk_bbs = [
        {
            "origin": {
                d: array_origin[idim]
                + array_bb["spacing"][d] * block_offsets[idim][bi[idim]]
                for idim, d in enumerate(spatial_dims)
            },
            "shape": {
                d: block_shapes[idim][bi[idim]]
                for idim, d in enumerate(spatial_dims)
            },
            "spacing": dict(array_bb["spacing"]),
        }
        for bi in block_indices
    ]
    return chunk_bbs, block_indices


def get_overlap_for_bbs(
    target_bb: BoundingBox,
    query_bbs: Sequence[BoundingBox],
    param,
    additional_extent_in_pixels: Optional[Dict[str, int]] = None,
    tol: float = 1e-6,
    param_is_inverse: bool = False,
):
    """Back-project a target chunk bbox into each query (tile) frame and clip.

    Returns per query either None (no overlap) or the source window bbox
    (reference mv_graph.py:989-1117). ``param`` maps query -> target world
    coordinates (a view param); pass its inverse with ``param_is_inverse``.
    """
    ndim = len(target_bb["origin"])
    spatial_dims = si_utils.SPATIAL_DIMS[-ndim:]
    if additional_extent_in_pixels is None:
        additional_extent_in_pixels = {d: 0 for d in spatial_dims}

    corners_target = get_vertices_from_stack_props(target_bb)
    param_mat = (
        np.asarray(param_utils.to_xaffine(param).squeeze())
        if not isinstance(param, np.ndarray)
        else param
    )
    if param_mat.ndim == 3:
        param_mat = param_mat[0]
    inv_param = param_mat if param_is_inverse else np.linalg.inv(param_mat)
    corners_query = param_utils.transform_pts(corners_target, inv_param)
    cq_min = corners_query.min(axis=0)
    cq_max = corners_query.max(axis=0)

    overlap_bbs = []
    for query_bb in query_bbs:
        bp_origin = {
            d: cq_min[i] - additional_extent_in_pixels[d] * query_bb["spacing"][d]
            for i, d in enumerate(spatial_dims)
        }
        bp_shape = {
            d: int(
                np.ceil((cq_max[i] - cq_min[i]) / query_bb["spacing"][d])
            )
            + 1
            + 2 * additional_extent_in_pixels[d]
            for i, d in enumerate(spatial_dims)
        }

        if any(
            bp_origin[d] - tol
            > query_bb["origin"][d]
            + (query_bb["shape"][d] - 1) * query_bb["spacing"][d]
            for d in spatial_dims
        ) or any(
            bp_origin[d] + (bp_shape[d] - 1) * query_bb["spacing"][d]
            < query_bb["origin"][d] - tol
            for d in spatial_dims
        ):
            overlap_bbs.append(None)
            continue

        ov_origin = {
            d: max(bp_origin[d], query_bb["origin"][d]) for d in spatial_dims
        }
        ov_shape = {
            d: int(
                np.ceil(
                    (
                        min(
                            bp_origin[d]
                            + (bp_shape[d] - 1) * query_bb["spacing"][d],
                            query_bb["origin"][d]
                            + (query_bb["shape"][d] - 1)
                            * query_bb["spacing"][d],
                        )
                        - ov_origin[d]
                    )
                    / query_bb["spacing"][d]
                )
            )
            + 1
            for d in spatial_dims
        }
        if any(ov_shape[d] < 1 for d in spatial_dims):
            overlap_bbs.append(None)
            continue
        overlap_bbs.append(
            {
                "origin": ov_origin,
                "shape": ov_shape,
                "spacing": dict(query_bb["spacing"]),
            }
        )
    return overlap_bbs


def project_bb_along_dim(bb: BoundingBox, dim: str) -> BoundingBox:
    return {
        key: {d: bb[key][d] for d in bb[key] if d != dim} for key in bb
    }


# ---------------------------------------------------------------------------
# label connectivity (used by mask-based pair discovery)
# ---------------------------------------------------------------------------


def unique_along_axis(a, axis=0):
    at = np.ascontiguousarray(a.swapaxes(0, axis))
    dt = np.dtype([("values", at.dtype, at.shape[1:])])
    atv = at.view(dt)
    return np.unique(atv)["values"].swapaxes(0, axis)


def get_connected_labels(labels, structure=None):
    """Pairs of label values touching under a full 3^ndim structure.

    Reference: mv_graph.py:895-931. Label arrays are expected to be offset by
    +1 (0 = background), as in the reference; returned pairs are 0-based.
    """
    ndim = labels.ndim
    structure = np.ones((3,) * ndim)

    chunks = []
    for pos in np.array(np.where(structure)).T:
        if not (min(pos) < 1 or max(pos) < 2):
            continue
        sl_a = tuple(slice(1 if p > 1 else 0, None) for p in pos)
        sl_b = tuple(slice(0, -1 if p > 1 else None) for p in pos)
        pair = np.array([labels[sl_a], labels[sl_b]]).reshape((2, -1))
        keep = pair.all(axis=0) & (np.diff(pair, axis=0)[0] != 0)
        chunks.append(pair[:, keep])
    pairs = np.concatenate(chunks, axis=1)
    pairs = unique_along_axis(pairs, axis=1).T
    pairs -= 1
    return pairs


def compute_graph_edges(input_g, weight_name: str = "transform"):
    """Materialize the named edge attribute on every edge (reference
    mv_graph.py:355 dask-computes them simultaneously; here transforms
    are eager arrays or device arrays, so this forces them to host
    numpy in one pass)."""
    g = input_g.copy()
    for e in g.edges:
        if weight_name not in g.edges[e]:
            continue
        w = g.edges[e][weight_name]
        if isinstance(w, param_utils.XAffine):
            g.edges[e][weight_name] = param_utils.XAffine(
                np.asarray(w.data), t_coords=w.t_coords
            )
        elif hasattr(w, "__array__"):
            g.edges[e][weight_name] = np.asarray(w)
    return g


def strack_props_are_far_apart(stack_props_1, stack_props_2) -> bool:
    """True when two stacks' bounding spheres cannot intersect (reference
    mv_graph.py:500 — which computes these quantities but, due to a bug
    there, returns None; here the comparison is returned).

    A cheap pre-filter: center distance greater than the sum of the
    half-diagonals means no overlap is possible.
    """
    verts = [
        get_vertices_from_stack_props(sp)
        for sp in (stack_props_1, stack_props_2)
    ]
    centers = [np.mean(v, axis=0) for v in verts]
    center_dist = float(np.linalg.norm(centers[1] - centers[0]))
    half_diags = [
        float(np.max(np.linalg.norm(v - c, axis=1)))
        for v, c in zip(verts, centers)
    ]
    return center_dist > sum(half_diags)


def sims_are_far_apart(sim1, sim2, transform_key) -> bool:
    """True when two views' bounding spheres (in ``transform_key`` world
    coords) cannot intersect (reference mv_graph.py:447; see
    :func:`strack_props_are_far_apart` for the return-value note)."""
    from multiview_stitcher_tpu import si_utils as _si

    sps = [
        _si.get_stack_properties_from_sim(sim, transform_key=transform_key)
        for sim in (sim1, sim2)
    ]
    return strack_props_are_far_apart(*sps)


def get_nodes_dataset_from_graph(g, node_attribute: str) -> dict:
    """{node: attribute value} for nodes carrying the attribute (reference
    mv_graph.py returns an xarray Dataset; a dict here — no xarray)."""
    return {
        n: g.nodes[n][node_attribute]
        for n in g.nodes
        if node_attribute in g.nodes[n]
    }
