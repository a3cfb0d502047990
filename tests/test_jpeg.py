"""First-party baseline JPEG decoder (io/jpeg.py) vs PIL/libjpeg.

The reference decodes JPEG CZI subblocks via czifile+imagecodecs
(reference czi_utils.py:252); this repo bundles its own baseline decoder.
"""

import io

import numpy as np
import pytest

pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from multiview_stitcher_tpu.io.jpeg import decode_jpeg  # noqa: E402


def _smooth(shape, seed=0):
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    return (gaussian_filter(rng.random(shape) * 255, 2)).astype(np.uint8)


def _encode(arr, mode, **kw):
    buf = io.BytesIO()
    Image.fromarray(arr, mode).save(buf, format="JPEG", **kw)
    return buf.getvalue()


def _pil_decode(data):
    return np.asarray(Image.open(io.BytesIO(data)))


@pytest.mark.parametrize("quality", [95, 75])
def test_grayscale_matches_pil(quality):
    img = _smooth((96, 120))
    data = _encode(img, "L", quality=quality)
    ours = decode_jpeg(data)
    assert ours.shape == img.shape and ours.dtype == np.uint8
    assert np.abs(ours.astype(int) - _pil_decode(data).astype(int)).max() <= 1


@pytest.mark.parametrize(
    "subsampling,tol", [(0, 2), (1, 4), (2, 4)],
    ids=["444", "422", "420"],
)
def test_rgb_subsampling_matches_pil(subsampling, tol):
    img = _smooth((96, 120))
    rgb = np.stack([img, img[::-1], np.roll(img, 13, axis=1)], -1)
    data = _encode(rgb, "RGB", quality=85, subsampling=subsampling)
    ours = decode_jpeg(data)
    assert ours.shape == rgb.shape
    d = np.abs(ours.astype(int) - _pil_decode(data).astype(int))
    assert d.max() <= tol


def test_restart_markers():
    img = _smooth((96, 120), seed=3)
    data = _encode(img, "L", quality=85, restart_marker_blocks=4)
    ours = decode_jpeg(data)
    assert np.abs(ours.astype(int) - _pil_decode(data).astype(int)).max() <= 1


def test_odd_dimensions():
    img = _smooth((93, 101), seed=5)
    data = _encode(img, "L", quality=90)
    ours = decode_jpeg(data)
    assert ours.shape == (93, 101)
    assert np.abs(ours.astype(int) - _pil_decode(data).astype(int)).max() <= 1


def test_progressive_raises():
    img = _smooth((32, 32))
    data = _encode(img, "L", quality=85, progressive=True)
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(data)


def test_not_a_jpeg_raises():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02\x03")


def test_czi_subblock_dispatch_decodes_jpeg():
    """compression id 1 routes through the built-in JPEG decoder."""
    from multiview_stitcher_tpu.io.czi_utils import _decompress_subblock

    img = _smooth((64, 80), seed=7)
    data = _encode(img, "L", quality=92)
    out = np.frombuffer(
        _decompress_subblock(data, 1, np.uint8), np.uint8
    ).reshape(64, 80)
    assert np.abs(out.astype(int) - _pil_decode(data).astype(int)).max() <= 1
