"""Quickstart: stitch two in-memory numpy tiles.

Mirrors the reference's README quickstart (docs-as-tests, SURVEY.md §4).
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running straight from the repo: python examples/<name>.py

import numpy as np

from multiview_stitcher_tpu import fusion, msi_utils, registration, si_utils


def main():
    # synthetic overlapping tiles cut from one scene
    rng = np.random.default_rng(0)
    from scipy.ndimage import gaussian_filter

    scene = (gaussian_filter(rng.random((120, 220)), 1.5) * 1000).astype(
        np.uint16
    )
    tile0 = scene[:, :120]
    tile1 = scene[:, 95:]

    # 1. wrap tiles as sims with (slightly wrong) stage metadata
    sims = [
        si_utils.get_sim_from_array(
            tile0, dims=("y", "x"),
            scale={"y": 0.5, "x": 0.5},
            translation={"y": 0.0, "x": 0.0},
        ),
        si_utils.get_sim_from_array(
            tile1, dims=("y", "x"),
            scale={"y": 0.5, "x": 0.5},
            translation={"y": 0.5, "x": 95 * 0.5 - 1.0},  # 1 µm stage error
        ),
    ]
    msims = [msi_utils.get_msim_from_sim(s) for s in sims]

    # 2. register
    params = registration.register(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        new_transform_key="registered",
    )

    # 3. fuse
    fused = fusion.fuse(
        [msi_utils.get_sim_from_msim(m) for m in msims],
        transform_key="registered",
    )
    return scene, params, fused


if __name__ == "__main__":
    scene, params, fused = main()
    print("fused shape:", fused.shape)
