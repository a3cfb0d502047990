"""Groupwise parameter resolution: registry + per-timepoint dispatch.

Same capability as the reference's param_resolution/__init__.py:44
(resolve global per-view affines from a pairwise registration graph, one
resolver call per timepoint x connected component, with a pluggable
method registry), restructured around a single-timepoint resolve pass
that also evaluates edge residuals before results are stacked over t.

Resolver contract: ``resolver(g_component_tp, **kwargs) ->
(params_by_node, info_dict_or_None)`` where the graph holds
single-timepoint transforms and info may carry a ``metrics`` DataFrame
and a ``used_edges`` list.
"""

from __future__ import annotations

import logging

import networkx as nx
import numpy as np
import pandas as pd

from multiview_stitcher_tpu import mv_graph, param_utils
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
from multiview_stitcher_tpu.param_utils import XAffine

logger = logging.getLogger(__name__)

_RESOLVER_REGISTRY: dict = {}


def register_groupwise_resolution_method(name, resolver=None):
    """Add a resolver to the registry under ``name`` (see module docstring
    for the resolver contract).

    Usable directly — ``register_groupwise_resolution_method("m", f)`` —
    or as a decorator::

        @register_groupwise_resolution_method("m")
        def f(g_reg, reference_view=None, **kwargs): ...
    """
    if resolver is None:
        def _decorator(f):
            register_groupwise_resolution_method(name, f)
            return f

        return _decorator
    if not callable(resolver):
        raise TypeError("Resolver must be callable.")
    _RESOLVER_REGISTRY[name] = resolver
    return resolver


def _lookup_resolver(method):
    if callable(method):
        return method
    try:
        return _RESOLVER_REGISTRY[method]
    except KeyError:
        raise ValueError(
            f"Unknown groupwise optimization method: {method}"
        ) from None


def _resolve_one_timepoint(g_t, resolver, resolver_kwargs):
    """Run the resolver over every connected component of a
    single-timepoint graph.

    Returns ``(params_by_node, metric_frames, used_edges, residuals)``
    where metric frames already carry their component index.
    """
    params: dict = {}
    frames = []
    used: set = set()
    for icc, comp in enumerate(nx.connected_components(g_t)):
        sub = g_t.subgraph(list(comp))
        if sub.number_of_edges() == 0:
            ident = param_utils.identity_transform(get_graph_ndim(sub))
            params.update({node: ident for node in comp})
            continue
        comp_params, info = resolver(sub, **resolver_kwargs)
        params.update({node: comp_params[node] for node in comp})
        if not info:
            continue
        df = info.get("metrics")
        if df is not None:
            df = df.copy()
            if "icc" not in df.columns:
                df["icc"] = icc
            frames.append(df)
        used.update(
            tuple(sorted(e)) for e in (info.get("used_edges") or [])
        )
    residuals = compute_edge_residuals(g_t, params)
    return params, frames, used, residuals


def groupwise_resolution(g_reg, method="global_optimization", **kwargs):
    """Resolve global per-view params from a pairwise registration graph.

    ``method`` is a registry name ('global_optimization',
    'shortest_paths', 'linear_two_pass') or a resolver callable; remaining
    kwargs are passed through. Returns ``(params_by_node, info)`` where
    params are t-stacked XAffines when the graph carries timepoints, and
    info holds per-edge residuals / used edges keyed by timepoint index
    plus the concatenated resolver metrics.
    """
    if g_reg.number_of_edges() == 0:
        raise mv_graph.NotEnoughOverlapError(
            "Not enough overlap between views for stitching."
        )
    resolver = _lookup_resolver(method)

    # a two-view graph follows the [fixed, moving] convention: anchor the
    # lower-indexed view unless the caller chose a reference
    if len(g_reg.nodes) == 2:
        kwargs.setdefault("reference_view", min(g_reg.nodes))

    t_coords = get_graph_timepoints(g_reg)
    per_t_params = []  # one params_by_node dict per timepoint
    all_frames = []
    edge_residuals: dict = {}
    used_edges: dict = {}
    for it, t in enumerate(t_coords or [None]):
        g_t = (
            g_reg
            if t is None
            else get_reg_graph_with_single_tp_transforms(g_reg, t)
        )
        params_t, frames, used, residuals = _resolve_one_timepoint(
            g_t, resolver, kwargs
        )
        if t is not None:
            for df in frames:
                df["t"] = t
        per_t_params.append(params_t)
        all_frames.extend(frames)
        edge_residuals[it] = residuals
        used_edges[it] = sorted(used)

    if t_coords:
        stacked = {
            node: XAffine(
                np.stack(
                    [
                        np.asarray(p[node].squeeze())
                        for p in per_t_params
                    ]
                ),
                t_coords=np.asarray(t_coords),
            )
            for node in g_reg.nodes
        }
    else:
        stacked = per_t_params[0]

    info = {
        "metrics": pd.concat(all_frames) if all_frames else None,
        "edge_residuals": edge_residuals,
        "used_edges": used_edges,
    }
    return stacked, info


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
