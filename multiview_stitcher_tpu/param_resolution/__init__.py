"""Groupwise parameter resolution dispatch.

Rebuild of
/root/reference/src/multiview_stitcher/param_resolution/__init__.py:
per-timepoint / per-connected-component dispatch into a pluggable method
registry ('global_optimization', 'shortest_paths', 'linear_two_pass' or a
custom callable registered via :func:`register_groupwise_resolution_method`).
"""

from __future__ import annotations

import logging

import networkx as nx
import numpy as np
import pandas as pd

from multiview_stitcher_tpu import mv_graph, param_utils
from multiview_stitcher_tpu.param_utils import XAffine
from multiview_stitcher_tpu.param_resolution.global_optimization import (
    groupwise_resolution_global_optimization,
)
from multiview_stitcher_tpu.param_resolution.linear_two_pass import (
    groupwise_resolution_linear_two_pass,
)
from multiview_stitcher_tpu.param_resolution.shortest_paths import (
    groupwise_resolution_shortest_paths,
)
from multiview_stitcher_tpu.param_resolution.utils import (
    compute_edge_residuals,
    get_graph_ndim,
    get_graph_timepoints,
    get_reg_graph_with_single_tp_transforms,
)

logger = logging.getLogger(__name__)

_GROUPWISE_RESOLUTION_METHODS = {}


def register_groupwise_resolution_method(name, resolver):
    """Register a component-level single-timepoint resolver:
    resolver(g_reg_component_tp, **kwargs) -> (params_dict, info_dict)."""
    if not callable(resolver):
        raise TypeError("Resolver must be callable.")
    _GROUPWISE_RESOLUTION_METHODS[name] = resolver


def _get_method(method):
    if callable(method):
        return method
    if method in _GROUPWISE_RESOLUTION_METHODS:
        return _GROUPWISE_RESOLUTION_METHODS[method]
    raise ValueError(f"Unknown groupwise optimization method: {method}")


def groupwise_resolution(g_reg, method="global_optimization", **kwargs):
    """Resolve global per-view params per timepoint × connected component."""
    resolver = _get_method(method)
    if not len(g_reg.edges):
        raise mv_graph.NotEnoughOverlapError(
            "Not enough overlap between views for stitching."
        )

    # two views: fix the first as reference ([fixed, moving] convention)
    if "reference_view" not in kwargs and len(g_reg.nodes) == 2:
        kwargs["reference_view"] = min(list(g_reg.nodes))

    params = {node: [] for node in g_reg.nodes}
    info_metrics = []
    used_edges_by_t = {}

    t_coords = get_graph_timepoints(g_reg)
    iter_t_coords = t_coords if t_coords else [None]
    for it, t in enumerate(iter_t_coords):
        g_reg_t = (
            get_reg_graph_with_single_tp_transforms(g_reg, t)
            if t is not None
            else g_reg
        )
        for icc, cc in enumerate(nx.connected_components(g_reg_t)):
            g_sub = g_reg_t.subgraph(list(cc))
            if not g_sub.number_of_edges():
                ndim = get_graph_ndim(g_sub)
                cc_params = {
                    node: param_utils.identity_transform(ndim) for node in cc
                }
                cc_info = None
            else:
                cc_params, cc_info = resolver(g_sub, **kwargs)
            for node in cc:
                params[node].append(cc_params[node])

            if cc_info is not None:
                metrics = cc_info.get("metrics")
                if metrics is not None:
                    metrics = metrics.copy()
                    if t is not None:
                        metrics["t"] = [t] * len(metrics)
                    if "icc" not in metrics.columns:
                        metrics["icc"] = [icc] * len(metrics)
                    info_metrics.append(metrics)
                used_edges = cc_info.get("used_edges")
                if used_edges is not None:
                    used_edges_by_t.setdefault(it, set()).update(
                        tuple(sorted(e)) for e in used_edges
                    )

    # concatenate per-timepoint params
    if t_coords:
        params = {
            node: XAffine(
                np.stack(
                    [np.asarray(p.squeeze()) for p in params[node]]
                ),
                t_coords=np.asarray(t_coords),
            )
            for node in params
        }
    else:
        params = {node: params[node][0] for node in params}

    edge_residuals_by_t = {}
    for it, t in enumerate(iter_t_coords):
        params_t = {
            node: (
                params[node].sel_t(t)
                if isinstance(params[node], XAffine) and params[node].has_t
                else params[node]
            )
            for node in params
        }
        g_reg_t = (
            get_reg_graph_with_single_tp_transforms(g_reg, t)
            if t is not None
            else g_reg
        )
        edge_residuals_by_t[it] = compute_edge_residuals(g_reg_t, params_t)

    info_dict = {
        "metrics": pd.concat(info_metrics) if info_metrics else None,
        "edge_residuals": edge_residuals_by_t,
        "used_edges": {k: list(v) for k, v in used_edges_by_t.items()},
    }
    return params, info_dict


register_groupwise_resolution_method(
    "global_optimization", groupwise_resolution_global_optimization
)
register_groupwise_resolution_method(
    "shortest_paths", groupwise_resolution_shortest_paths
)
register_groupwise_resolution_method(
    "linear_two_pass", groupwise_resolution_linear_two_pass
)

__all__ = [
    "groupwise_resolution",
    "groupwise_resolution_global_optimization",
    "groupwise_resolution_shortest_paths",
    "groupwise_resolution_linear_two_pass",
    "register_groupwise_resolution_method",
]
