"""multiview_stitcher_tpu: TPU-native multi-view registration and fusion.

A from-scratch JAX/XLA rebuild of the capabilities of multiview-stitcher
(reference at /root/reference): register and fuse tiled / multi-view 2D-3D
microscopy datasets, from in-memory numpy tiles to out-of-core OME-Zarr
stores, with the hot paths (FFT phase correlation, affine resampling,
blending, deconvolution, filters) running as batched JAX kernels on TPU and
planning/graph logic on the host.

Public surface mirrors the reference package layout:

- ``si_utils`` / ``msi_utils`` / ``param_utils`` — data model
- ``registration`` — pairwise + groupwise registration (``register``)
- ``fusion`` — ``fuse`` with pluggable fusion/weights funcs, mv_deconv
- ``mv_graph`` / ``transformation`` / ``transforms`` — geometry
- ``param_resolution`` — groupwise resolvers
- ``weights`` / ``detection`` / ``metrics`` — weights, beads, QC
- ``io`` (ngff/zarr/tif/czi/imaris) / ``zarr_utils`` — IO
- ``vis_utils`` / ``neuroglancer`` — visualization and serving
- ``parallel`` — device-mesh sharding of the pair/chunk batches
"""

__version__ = "0.1.0"

__all__ = [
    "si_utils",
    "msi_utils",
    "param_utils",
    "transforms",
    "transformation",
    "mv_graph",
    "registration",
    "param_resolution",
    "fusion",
    "weights",
    "detection",
    "metrics",
    "sample_data",
    "io",
    "zarr_utils",
    "vis_utils",
    "neuroglancer",
    "parallel",
    "stitch",
    "ops",
]

# Reference-layout aliases (PEP 562 lazy): users of the reference package
# find the module names they know (multiview_stitcher.spatial_image_utils,
# .ngff_utils, .misc_utils, .tif_utils, ...) at the same places here.
_ALIASES = {
    "spatial_image_utils": "multiview_stitcher_tpu.si_utils",
    "ngff_utils": "multiview_stitcher_tpu.io.ngff_utils",
    "misc_utils": "multiview_stitcher_tpu.utils.misc",
    "tif_utils": "multiview_stitcher_tpu.io.tif_utils",
    "czi_utils": "multiview_stitcher_tpu.io.czi_utils",
    "imaris_utils": "multiview_stitcher_tpu.io.imaris_utils",
}


def __getattr__(name):
    if name in _ALIASES:
        import importlib

        return importlib.import_module(_ALIASES[name])
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
