"""Stitching service runtime: stateful sessions + stateless JSON workers.

TPU-native counterpart of the reference's second execution environment
(reference browser/, 4.1k LoC — SURVEY.md Appendix A): the same
session/bridge/worker architecture with OS processes (or JAX multihost
peers) in place of Pyodide web workers. Work units are JSON documents,
callables travel by name, image data never crosses a boundary — workers
reopen zarr sources described by :class:`SessionSpec`.
"""

from multiview_stitcher_tpu.service.bridge import (
    Bridge,
    LocalBridge,
    ProcessPoolBridge,
)
from multiview_stitcher_tpu.service.session import Session
from multiview_stitcher_tpu.service.specs import (
    FusionOptions,
    RegistrationOptions,
    SessionSpec,
    resolve_fusion_func,
    resolve_pairwise_reg_func,
)
from multiview_stitcher_tpu.service.worker import WorkerRuntime

__all__ = [
    "Bridge",
    "LocalBridge",
    "ProcessPoolBridge",
    "Session",
    "SessionSpec",
    "RegistrationOptions",
    "FusionOptions",
    "WorkerRuntime",
    "resolve_fusion_func",
    "resolve_pairwise_reg_func",
]
