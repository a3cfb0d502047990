"""Execute the quickstart examples as tests (docs-as-tests)."""

import numpy as np


def test_quickstart_numpy():
    import sys

    sys.path.insert(0, "examples")
    import quickstart_numpy

    scene, params, fused = quickstart_numpy.main()
    # registration recovers the stage error; the union extent may differ by
    # a pixel or two from the uncorrected scene
    out = fused.to_numpy().astype(float)
    assert abs(out.shape[1] - scene.shape[1]) <= 3
    h = min(out.shape[0], scene.shape[0])
    w = min(out.shape[1], scene.shape[1])
    inner = np.s_[10 : h - 10, 10 : w - 10]
    err = np.abs(out[inner] - scene[inner].astype(float))
    assert np.median(err) < 10


def test_quickstart_zarr(tmp_path):
    import sys

    sys.path.insert(0, "examples")
    import quickstart_zarr

    scene, fused = quickstart_zarr.main(str(tmp_path))
    assert not isinstance(fused.data, np.ndarray)  # zarr-backed
    out = fused.to_numpy().astype(float)
    assert out.shape == scene.shape
    err = np.abs(out[5:-5, 5:-5] - scene[5:-5, 5:-5].astype(float))
    assert np.median(err) < 10


def test_example_multiview_rotated():
    import sys

    sys.path.insert(0, "examples")
    import multiview_rotated

    multiview_rotated.main()


def test_example_deconvolution():
    import sys

    sys.path.insert(0, "examples")
    import deconvolution

    deconvolution.main()
