"""Quickstart: out-of-core OME-Zarr workflow.

Tiles live in OME-Zarr stores; registration reads lazily; fusion streams
chunkwise into a new OME-Zarr (nothing assembled in memory).
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running straight from the repo: python examples/<name>.py

import tempfile

import numpy as np

from multiview_stitcher_tpu import fusion, msi_utils, registration, si_utils
from multiview_stitcher_tpu.io import ngff_utils


def main(workdir=None):
    workdir = workdir or tempfile.mkdtemp()
    rng = np.random.default_rng(1)
    from scipy.ndimage import gaussian_filter

    scene = (gaussian_filter(rng.random((100, 180)), 1.5) * 1000).astype(
        np.uint16
    )
    tiles = [scene[:, :100], scene[:, 80:]]
    offsets = [0.0, 80.0]

    # write tiles as OME-Zarr, reopen lazily
    sims = []
    for i, (tile, x0) in enumerate(zip(tiles, offsets)):
        s = si_utils.get_sim_from_array(
            tile, dims=("y", "x"), translation={"y": 0.0, "x": x0},
            scale={"y": 1.0, "x": 1.0},
        )
        lazy = ngff_utils.write_sim_to_ome_zarr(
            s, f"{workdir}/tile{i}.ome.zarr", overwrite=True
        )
        lazy.origin = dict(s.origin)  # keep stage metadata
        sims.append(lazy)

    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    registration.register(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        new_transform_key="registered",
    )
    fused = fusion.fuse(
        [msi_utils.get_sim_from_msim(m) for m in msims],
        transform_key="registered",
        output_zarr_url=f"{workdir}/fused.ome.zarr",
    )
    return scene, fused


if __name__ == "__main__":
    scene, fused = main()
    print("fused (zarr-backed) shape:", fused.shape)
