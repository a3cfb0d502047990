"""Dedicated groupwise-resolution tests on synthetic registration graphs.

Mirrors the reference's test_param_resolution.py scenario coverage
(edge-residual semantics :360, bad-edge exclusion :417, transform-type
kwarg :329) against this repo's resolver contract: edges carry
``transform`` (lower-view world -> higher-view world), ``quality``,
``overlap``, ``bbox`` (2 x ndim lower/upper corners); resolvers return
per-node view-world -> shared-world params plus used-edge / residual
info keyed by timepoint index.
"""

import networkx as nx
import numpy as np
import pytest

from multiview_stitcher_tpu import param_resolution, param_utils
from multiview_stitcher_tpu.param_utils import XAffine

METHODS = ["shortest_paths", "global_optimization", "linear_two_pass"]


def _grid_graph(nx_tiles=3, ny_tiles=3, noise=0.0, seed=0, true_shift=5.0,
                diagonals=False):
    """Grid registration graph with edges consistent with per-node
    ground-truth translations (plus optional noise).

    Returns (graph, true_params) where true_params[node] maps the node's
    world frame into the shared ground-truth frame.
    """
    rng = np.random.default_rng(seed)
    g = nx.Graph()
    true_params = {}
    for iy in range(ny_tiles):
        for ix in range(nx_tiles):
            node = iy * nx_tiles + ix
            shift = rng.uniform(-true_shift, true_shift, 2)
            true_params[node] = param_utils.affine_from_translation(shift)
            g.add_node(
                node,
                stack_props={
                    "spacing": {"y": 1.0, "x": 1.0},
                    "origin": {"y": 10.0 * iy, "x": 10.0 * ix},
                    "shape": {"y": 12, "x": 12},
                },
            )
    for iy in range(ny_tiles):
        for ix in range(nx_tiles):
            node = iy * nx_tiles + ix
            neighbors = [(iy, ix + 1), (iy + 1, ix)]
            if diagonals:
                neighbors += [(iy + 1, ix + 1), (iy + 1, ix - 1)]
            for jy, jx in neighbors:
                if jx < 0:
                    continue
                if jy >= ny_tiles or jx >= nx_tiles:
                    continue
                other = jy * nx_tiles + jx
                u, v = sorted((node, other))
                t_uv = np.linalg.inv(true_params[v]) @ true_params[u]
                if noise:
                    t_uv = t_uv.copy()
                    t_uv[:2, -1] += rng.normal(0, noise, 2)
                lo = np.array([10.0 * min(iy, jy), 10.0 * min(ix, jx)])
                g.add_edge(
                    u, v,
                    transform=param_utils.affine_to_xaffine(t_uv),
                    quality=1.0,
                    overlap=1.0,
                    bbox=np.stack([lo, lo + 10.0]),
                )
    return g, true_params


def _params_agree_with_truth(params, true_params, atol=1e-6):
    """Resolved params match ground truth up to one global affine: check
    every edge-consistency product instead of absolute values."""
    nodes = sorted(true_params)
    for u in nodes:
        for v in nodes:
            if u >= v:
                continue
            got = np.linalg.inv(
                np.asarray(params[v].squeeze())
            ) @ np.asarray(params[u].squeeze())
            want = np.linalg.inv(true_params[v]) @ true_params[u]
            if not np.allclose(got, want, atol=atol):
                return False
    return True


@pytest.mark.parametrize("method", METHODS)
def test_consistent_graph_recovers_truth(method):
    """With perfectly consistent edges, every method reproduces the
    ground-truth relative placement (reference test_param_resolution.py
    accuracy-grid scenario :604)."""
    g, truth = _grid_graph(noise=0.0)
    params, info = param_resolution.groupwise_resolution(
        g, method=method, transform="translation"
    )
    assert _params_agree_with_truth(params, truth, atol=1e-4)
    assert set(params) == set(g.nodes)
    res = info["edge_residuals"][0]
    assert all(r < 1e-4 for r in res.values())


@pytest.mark.parametrize("method", METHODS)
def test_edge_residual_semantics(method):
    """shortest_paths: residual ~0 exactly on used (path) edges and > 0
    on skipped ones of a fully inconsistent graph; optimizing methods
    spread positive residuals over the cycles of a noisy-but-consistent
    graph (reference :360). The optimizing methods get the noisy graph
    because on a fully random one they legitimately prune to a spanning
    tree, which fits exactly (zero residuals)."""
    if method == "shortest_paths":
        rng = np.random.default_rng(0)
        g, _ = _grid_graph(noise=0.0)
        for _u, _v, data in g.edges(data=True):
            m = np.eye(3)
            m[:2, -1] = rng.uniform(-5, 5, 2)
            data["transform"] = param_utils.affine_to_xaffine(m)
    else:
        g, _ = _grid_graph(noise=0.3, seed=7)
    params, info = param_resolution.groupwise_resolution(
        g, method=method, reference_view=0, transform="translation"
    )
    residuals = info["edge_residuals"][0]
    used = {tuple(sorted(e)) for e in info["used_edges"][0]}
    unused = {tuple(sorted(e)) for e in g.edges} - used
    assert used, "resolver reported no used edges"
    if method == "shortest_paths":
        assert unused, "a 3x3 grid has off-tree edges"
        for e in used:
            assert residuals[e] < 1e-6
        for e in unused:
            assert residuals[e] > 1e-5
    else:
        assert min(residuals[e] for e in used) > 0


@pytest.mark.parametrize("method", METHODS)
def test_bad_edge_is_not_used(method):
    """A low-quality, wildly inconsistent edge between well-connected
    nodes is excluded from the used set (reference :417). Diagonal
    overlap edges give shortest_paths a 2-hop detour cheaper than the
    low-quality direct edge."""
    g, truth = _grid_graph(noise=0.05, seed=1, diagonals=True)
    bad = next(
        e for e in g.edges if g.degree[e[0]] > 1 and g.degree[e[1]] > 1
    )
    m = np.eye(3)
    m[:2, -1] = 100.0
    g.edges[bad]["transform"] = param_utils.affine_to_xaffine(m)
    g.edges[bad]["quality"] = 0.01
    params, info = param_resolution.groupwise_resolution(
        g, method=method, reference_view=0, transform="translation"
    )
    used = {tuple(sorted(e)) for e in info["used_edges"][0]}
    assert tuple(sorted(bad)) not in used
    # the solution itself stays close to the (noisy) truth
    assert _params_agree_with_truth(params, truth, atol=1.0)


def test_global_optimization_translation_keeps_linear_part():
    """transform='translation' never touches the linear part (reference
    :329 asserts identity linear blocks)."""
    g, _ = _grid_graph(noise=0.3, seed=2)
    params, _ = param_resolution.groupwise_resolution(
        g, method="global_optimization", transform="translation"
    )
    for p in params.values():
        assert np.allclose(np.asarray(p.squeeze())[:2, :2], np.eye(2))


@pytest.mark.parametrize("method", METHODS)
def test_reference_view_is_pinned(method):
    """The requested reference view resolves to the identity."""
    g, _ = _grid_graph(noise=0.1, seed=3)
    params, _ = param_resolution.groupwise_resolution(
        g, method=method, reference_view=4, transform="translation"
    )
    assert np.allclose(np.asarray(params[4].squeeze()), np.eye(3), atol=1e-6)


def test_disconnected_components_resolve_independently():
    """Two components resolve separately; an isolated node gets the
    identity (reference param_resolution/__init__.py cc dispatch)."""
    g, truth = _grid_graph(nx_tiles=2, ny_tiles=2, noise=0.0)
    # second, disjoint two-node component + one isolated node
    for node, origin in ((100, 0.0), (101, 10.0)):
        g.add_node(
            node,
            stack_props={
                "spacing": {"y": 1.0, "x": 1.0},
                "origin": {"y": 200.0, "x": origin},
                "shape": {"y": 12, "x": 12},
            },
        )
    m = np.eye(3)
    m[:2, -1] = (0.0, -3.0)
    g.add_edge(
        100, 101,
        transform=param_utils.affine_to_xaffine(m),
        quality=1.0, overlap=1.0,
        bbox=np.array([[200.0, 10.0], [210.0, 12.0]]),
    )
    g.add_node(
        500,
        stack_props={
            "spacing": {"y": 1.0, "x": 1.0},
            "origin": {"y": 500.0, "x": 0.0},
            "shape": {"y": 12, "x": 12},
        },
    )
    params, _ = param_resolution.groupwise_resolution(
        g, method="global_optimization", transform="translation"
    )
    assert set(params) == set(g.nodes)
    # main component still internally consistent
    assert _params_agree_with_truth(
        {n: params[n] for n in truth}, truth, atol=1e-4
    )
    rel = np.linalg.inv(np.asarray(params[101].squeeze())) @ np.asarray(
        params[100].squeeze()
    )
    assert np.allclose(rel, m, atol=1e-4)
    assert np.allclose(np.asarray(params[500].squeeze()), np.eye(3))


def test_two_view_graph_anchors_lower_index():
    """A 2-view graph anchors the lower-indexed (fixed) view unless a
    reference is chosen (param_resolution/__init__.py)."""
    g = nx.Graph()
    for node in (0, 1):
        g.add_node(node, stack_props={
            "spacing": {"y": 1.0, "x": 1.0},
            "origin": {"y": 0.0, "x": 8.0 * node},
            "shape": {"y": 12, "x": 12},
        })
    m = np.eye(3)
    m[:2, -1] = (1.5, -2.5)
    g.add_edge(
        0, 1,
        transform=param_utils.affine_to_xaffine(m),
        quality=1.0, overlap=1.0,
        bbox=np.array([[0.0, 8.0], [12.0, 12.0]]),
    )
    params, _ = param_resolution.groupwise_resolution(
        g, method="shortest_paths"
    )
    assert np.allclose(np.asarray(params[0].squeeze()), np.eye(3))
    rel = np.linalg.inv(np.asarray(params[1].squeeze()))
    assert np.allclose(rel @ np.eye(3), rel)  # sanity
    got = np.linalg.inv(np.asarray(params[1].squeeze())) @ np.asarray(
        params[0].squeeze()
    )
    assert np.allclose(got, m, atol=1e-8)


def test_t_aware_graph_stacks_params():
    """Edges with t-stacked transforms resolve per timepoint and return
    t-stacked XAffines matching each per-t solve."""
    g, truth0 = _grid_graph(nx_tiles=2, ny_tiles=1, noise=0.0, seed=4)
    (u, v) = sorted(g.edges)[0]
    m0 = np.asarray(g.edges[(u, v)]["transform"].squeeze())
    m1 = m0.copy()
    m1[:2, -1] += (2.0, -1.0)
    g.edges[(u, v)]["transform"] = XAffine(
        np.stack([m0, m1]), t_coords=np.array([0, 1])
    )
    params, info = param_resolution.groupwise_resolution(
        g, method="shortest_paths", reference_view=u
    )
    for p in params.values():
        assert p.has_t and list(np.asarray(p.t_coords)) == [0, 1]
    for it, m in enumerate((m0, m1)):
        got = np.linalg.inv(
            np.asarray(params[v].data[it])
        ) @ np.asarray(params[u].data[it])
        assert np.allclose(got, m, atol=1e-8)
    assert set(info["edge_residuals"]) == {0, 1}


def test_custom_resolver_registry():
    """register_groupwise_resolution_method plugs a custom resolver into
    the dispatcher (reference param_resolution/__init__.py:23)."""
    calls = []

    def everything_identity(sub, **kwargs):
        calls.append(sorted(sub.nodes))
        ident = param_utils.identity_transform(2)
        return {n: ident for n in sub.nodes}, {}

    param_resolution.register_groupwise_resolution_method(
        "test_identity_resolver", everything_identity
    )
    g, _ = _grid_graph(nx_tiles=2, ny_tiles=2)
    params, _ = param_resolution.groupwise_resolution(
        g, method="test_identity_resolver"
    )
    assert calls and calls[0] == sorted(g.nodes)
    for p in params.values():
        assert np.allclose(np.asarray(p.squeeze()), np.eye(3))


def test_empty_graph_raises():
    g = nx.Graph()
    g.add_node(0, stack_props={
        "spacing": {"y": 1.0, "x": 1.0},
        "origin": {"y": 0.0, "x": 0.0},
        "shape": {"y": 4, "x": 4},
    })
    from multiview_stitcher_tpu import mv_graph
    with pytest.raises(mv_graph.NotEnoughOverlapError):
        param_resolution.groupwise_resolution(g)


def test_resolver_registry_decorator_form():
    """register_groupwise_resolution_method works as a decorator
    (docs/extension_api.md)."""
    from multiview_stitcher_tpu.param_utils import identity_transform

    @param_resolution.register_groupwise_resolution_method(
        "test_decorator_resolver"
    )
    def my_resolver(sub, **kwargs):
        return {n: identity_transform(2) for n in sub.nodes}, {}

    assert my_resolver.__name__ == "my_resolver"  # decorator returns f
    g, _ = _grid_graph(nx_tiles=2, ny_tiles=1)
    params, _ = param_resolution.groupwise_resolution(
        g, method="test_decorator_resolver"
    )
    assert set(params) == set(g.nodes)


def test_linear_two_pass_translation_matches_shortest_paths():
    """On a noise-free chain, the linearized solve must agree with chained
    shortest paths for translation (reference test_param_resolution.py:562:
    shortest_paths concatenates full affines, so only translation is
    directly comparable)."""
    g, _ = _grid_graph(nx_tiles=3, ny_tiles=1, noise=0.0, seed=2)
    p_lin, _ = param_resolution.groupwise_resolution(
        g, method="linear_two_pass", reference_view=0,
        transform="translation",
    )
    p_sp, _ = param_resolution.groupwise_resolution(
        g, method="shortest_paths", reference_view=0
    )
    for n in g.nodes:
        np.testing.assert_allclose(
            np.asarray(p_lin[n].squeeze()),
            np.asarray(p_sp[n].squeeze()),
            atol=1e-6,
        )


def _rotated_grid_graph(nx_tiles, ny_tiles, rot_sigma, trans_sigma, seed):
    """Grid graph whose ground truth includes small per-node rotations;
    pairwise edges carry the exact relative transforms plus noise."""
    rng = np.random.default_rng(seed)
    g, _ = _grid_graph(nx_tiles=nx_tiles, ny_tiles=ny_tiles, noise=0.0,
                       seed=seed)
    true_params = {}
    for node in g.nodes:
        angle = rng.normal(0, rot_sigma)
        mat = np.eye(3)
        mat[:2, :2] = [
            [np.cos(angle), -np.sin(angle)],
            [np.sin(angle), np.cos(angle)],
        ]
        mat[:2, 2] = rng.uniform(-3, 3, 2)
        true_params[node] = mat
    for u, v in g.edges:
        t_uv = np.linalg.inv(true_params[v]) @ true_params[u]
        t_uv = t_uv.copy()
        t_uv[:2, 2] += rng.normal(0, trans_sigma, 2)
        g.edges[(u, v)]["transform"] = param_utils.affine_to_xaffine(t_uv)
    return g, true_params


def test_linear_two_pass_rigid_accuracy_on_noisy_grid():
    """5x5 rigid grid with rotation + translation noise resolves within
    reference-scale tolerances (reference test_param_resolution.py:604)."""
    g, true_params = _rotated_grid_graph(
        nx_tiles=5, ny_tiles=5, rot_sigma=0.01, trans_sigma=0.2, seed=3
    )
    params, _ = param_resolution.groupwise_resolution(
        g, method="linear_two_pass", reference_view=0, transform="rigid"
    )
    # component-wise RMS vs ground truth after anchoring both at node 0
    t_errs, r_errs = [], []
    anchor = np.asarray(params[0].squeeze()) @ np.linalg.inv(true_params[0])
    for n in g.nodes:
        got = np.linalg.inv(anchor) @ np.asarray(params[n].squeeze())
        want = true_params[n]
        d = np.linalg.inv(want) @ got
        t_errs.append(np.linalg.norm(d[:2, 2]))
        r_errs.append(abs(np.arctan2(d[1, 0], d[0, 0])))
    t_rms = float(np.sqrt(np.mean(np.square(t_errs))))
    r_rms = float(np.sqrt(np.mean(np.square(r_errs))))
    assert t_rms < 0.5, t_rms
    assert r_rms < 0.05, r_rms


def test_linear_two_pass_prunes_outlier_edge_keeps_connectivity():
    """A wildly wrong edge is MAD-pruned from the solve but the graph stays
    solvable (MST floor; reference linear_two_pass.py:504-509)."""
    g, true_params = _grid_graph(nx_tiles=3, ny_tiles=3, noise=0.01, seed=4)
    bad = (0, 1)
    mat = np.asarray(g.edges[bad]["transform"].squeeze()).copy()
    mat[:2, 2] += 40.0  # gross outlier
    g.edges[bad]["transform"] = param_utils.affine_to_xaffine(mat)
    params, info = param_resolution.groupwise_resolution(
        g, method="linear_two_pass", reference_view=0,
        transform="translation",
    )
    assert _params_agree_with_truth(params, true_params, atol=0.2)
