"""Multi-view (rotated acquisition) workflow: beads → RGLDM → fuse.

Mirrors the reference's rotated light-sheet use case (SURVEY.md Appendix C):
two views of the same bead volume acquired at different rotations are
registered with the marker-based (BigStitcher RGLDM-style) pairwise method —
phase correlation cannot handle large rotations — and then fused.

Runs on CPU in under a minute: ``python examples/multiview_rotated.py``.
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running straight from the repo: python examples/<name>.py

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

from scipy.ndimage import affine_transform, gaussian_filter  # noqa: E402

from multiview_stitcher_tpu import (  # noqa: E402
    detection,
    fusion,
    msi_utils,
    registration,
    si_utils,
)


def make_bead_volume(rng, shape=(48, 64, 64), n_beads=80):
    vol = np.zeros(shape, dtype=np.float32)
    pts = rng.uniform(8, np.array(shape) - 8, (n_beads, 3))
    for p in pts:
        vol[tuple(np.round(p).astype(int))] = 1000.0
    return gaussian_filter(vol, 1.2)


def main():
    rng = np.random.default_rng(0)
    vol = make_bead_volume(rng)

    # view 0: identity; view 1: the same volume rotated ~12 deg around y
    theta = np.deg2rad(12.0)
    c = np.array(vol.shape) / 2.0
    rot = np.array(
        [
            [np.cos(theta), 0, np.sin(theta)],
            [0, 1, 0],
            [-np.sin(theta), 0, np.cos(theta)],
        ]
    )
    view1 = affine_transform(
        vol, rot, offset=c - rot @ c, order=1, mode="constant", cval=0.0
    )

    msims = []
    for v in (vol, view1):
        sim = si_utils.get_sim_from_array(v, dims=("z", "y", "x"))
        msim = msi_utils.get_msim_from_sim(sim, scale_factors=[])
        # detect bead markers (LoG) in physical coordinates
        pts = detection.detect_beads(
            msim,
            detection_func_kwargs={
                "target_size_physical": 3.0,
                "threshold_abs": 8.0,
            },
        )
        msi_utils.set_point_set(msim, pts, points_key="beads")
        print(f"detected {len(pts)} beads")
        msims.append(msim)

    registration.register(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        new_transform_key="registered",
        pairwise_reg_func=registration.registration_marker_based,
        pairwise_reg_func_kwargs={"transform_type": "rigid"},
        groupwise_resolution_kwargs={"transform": "rigid"},
        pre_registration_pruning_method=None,
    )

    recovered = np.asarray(
        msi_utils.get_transform_from_msim(msims[1], "registered").squeeze()
    )
    angle = np.rad2deg(np.arctan2(recovered[2, 0], recovered[0, 0]))
    print(f"recovered rotation around y: {abs(angle):.2f} deg (expected ~12)")

    fused = fusion.fuse(
        [msi_utils.get_sim_from_msim(m) for m in msims],
        transform_key="registered",
    )
    print("fused volume:", fused.shape, fused.dtype)


if __name__ == "__main__":
    main()
