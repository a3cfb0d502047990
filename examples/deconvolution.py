"""Multi-view deconvolution as a plug-in fusion function.

Mirrors the reference's Preibisch-2014 efficient-Bayesian deconvolution path
(reference fusion/mv_deconv.py): two blurred views of one scene are fused
with Richardson-Lucy updates instead of weighted averaging; the PSF can be
given per view or synthesized from imaging parameters.

Run: ``PYTHONPATH=. python examples/deconvolution.py``
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running straight from the repo: python examples/<name>.py

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")

from scipy.ndimage import gaussian_filter  # noqa: E402

from multiview_stitcher_tpu import fusion, si_utils  # noqa: E402
from multiview_stitcher_tpu.fusion import mv_deconv  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    # ground truth: sparse bright points on a dim background
    truth = np.zeros((60, 90), dtype=np.float32)
    for p in rng.uniform(5, [55, 85], (40, 2)):
        truth[tuple(np.round(p).astype(int))] = 200.0
    truth += 5.0

    sigma = 1.5
    blurred = gaussian_filter(truth, sigma)
    # two overlapping tiles of the blurred scene
    t0, t1 = blurred[:, :55], blurred[:, 40:]
    sims = [
        si_utils.get_sim_from_array(t0, translation={"y": 0.0, "x": 0.0}),
        si_utils.get_sim_from_array(t1, translation={"y": 0.0, "x": 40.0}),
    ]

    psf = mv_deconv.make_gaussian_psf(sigma, ndim=2)
    deconv = fusion.fuse(
        sims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        fusion_func=mv_deconv.multi_view_deconvolution,
        fusion_func_kwargs={
            "psfs": [psf, psf],
            "n_iterations": 20,
            "psf_type": mv_deconv.PSFType.INDEPENDENT,
        },
    ).to_numpy()

    avg = fusion.fuse(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY
    ).to_numpy()

    # deconvolution concentrates the point sources again
    peak_deconv = float(np.percentile(deconv, 99.9))
    peak_avg = float(np.percentile(avg, 99.9))
    print(f"99.9th percentile: weighted-average fuse {peak_avg:.1f}, "
          f"RL-deconvolved fuse {peak_deconv:.1f} (truth peaks ~200)")
    assert peak_deconv > peak_avg


if __name__ == "__main__":
    main()
