import os

import numpy as np
import pytest

from multiview_stitcher_tpu import msi_utils, registration, si_utils, zarr_utils
from multiview_stitcher_tpu.io import tif_utils

CZI_TEST_FILE = (
    "/root/reference/src/multiview_stitcher/test-datasets/mosaic_test.czi"
)


class TestTiff:
    @pytest.mark.parametrize(
        "dtype", [np.uint8, np.uint16, np.float32]
    )
    def test_roundtrip(self, tmp_path, dtype):
        path = str(tmp_path / "test.tif")
        data = (np.random.random((3, 20, 30)) * 100).astype(dtype)
        tif_utils.write_tiff(path, data)
        back = tif_utils.TiffFile(path).asarray()
        np.testing.assert_array_equal(back, data)

    def test_lazy_pages(self, tmp_path):
        path = str(tmp_path / "lazy.tif")
        data = np.random.randint(0, 1000, (5, 16, 16), dtype=np.uint16)
        tif_utils.write_tiff(path, data)
        lazy = tif_utils.LazyTiffPages(path)
        assert lazy.shape == (5, 16, 16)
        np.testing.assert_array_equal(lazy[2], data[2])
        np.testing.assert_array_equal(lazy[1:3, 4:8, :], data[1:3, 4:8, :])

    def test_sim_roundtrip(self, tmp_path):
        path = str(tmp_path / "sim.tif")
        data = np.random.randint(0, 1000, (4, 12, 14), dtype=np.uint16)
        sim = si_utils.get_sim_from_array(
            data, dims=("z", "y", "x"),
            scale={"z": 2.0, "y": 0.5, "x": 0.5},
        )
        tif_utils.save_sim_as_tif(path, sim)
        back = tif_utils.read_tiff_into_sim(
            path, scale={"z": 2.0, "y": 0.5, "x": 0.5},
        )
        assert back.dims == ("z", "y", "x")
        np.testing.assert_array_equal(back.to_numpy(), data)


class TestImaris:
    def _make_ims(self, path, data, spacing=(2.0, 0.5, 0.5)):
        import h5py

        nz, ny, nx = data.shape
        with h5py.File(path, "w") as f:
            g = f.create_group(
                "DataSet/ResolutionLevel 0/TimePoint 0/Channel 0"
            )
            g.create_dataset("Data", data=data)
            g.attrs["ImageSizeZ"] = np.bytes_(str(nz))
            g.attrs["ImageSizeY"] = np.bytes_(str(ny))
            g.attrs["ImageSizeX"] = np.bytes_(str(nx))
            info = f.create_group("DataSetInfo/Image")
            info.attrs["X"] = np.bytes_(str(nx))
            info.attrs["Y"] = np.bytes_(str(ny))
            info.attrs["Z"] = np.bytes_(str(nz))
            for i, (dim, n) in enumerate(zip("xyz", (nx, ny, nz))):
                sp = spacing[2 - i]
                info.attrs[f"ExtMin{i}"] = np.bytes_("0")
                info.attrs[f"ExtMax{i}"] = np.bytes_(str(n * sp))

    def test_read_imaris(self, tmp_path):
        from multiview_stitcher_tpu.io import imaris_utils

        path = str(tmp_path / "test.ims")
        data = np.random.randint(0, 1000, (4, 16, 20), dtype=np.uint16)
        self._make_ims(path, data)
        msim = imaris_utils.read_imaris_into_msim(path)
        sim = msi_utils.get_sim_from_msim(msim)
        assert sim.dims == ("z", "y", "x")
        np.testing.assert_allclose(sim.spacing["z"], 2.0)
        np.testing.assert_allclose(sim.spacing["x"], 0.5)
        np.testing.assert_array_equal(sim.to_numpy(), data)


@pytest.mark.skipif(
    not os.path.exists(CZI_TEST_FILE), reason="reference CZI not available"
)
class TestCzi:
    def test_parse_mosaic(self):
        from multiview_stitcher_tpu.io import czi_utils

        czi = czi_utils.CziFile(CZI_TEST_FILE)
        shape = czi_utils.get_czi_shape(czi)
        assert shape["M"] == 2
        spacing = czi_utils.get_czi_spacing(czi)
        assert spacing["x"] == pytest.approx(1.0833, abs=1e-3)

    def test_read_mosaic_into_sims(self):
        from multiview_stitcher_tpu.io import czi_utils

        sims = czi_utils.read_mosaic_into_sims_czifile(CZI_TEST_FILE)
        assert len(sims) == 2
        assert sims[0].spatial_dims == ["y", "x"]
        # second tile starts at 832 px in x
        assert sims[1].origin["x"] == pytest.approx(832 * 1.0833, abs=0.1)

    def test_lazy_mosaic_reads_match_eager(self):
        """Default lazy tiles defer subblock decodes; windows and full
        reads match the eager path bit-exactly (the reference reads CZI
        lazily through dask, czi_utils.py:186-250)."""
        from multiview_stitcher_tpu.io import czi_utils

        lazy = czi_utils.read_mosaic_into_sims_czifile(CZI_TEST_FILE)
        eager = czi_utils.read_mosaic_into_sims_czifile(
            CZI_TEST_FILE, lazy=False
        )
        assert all(
            isinstance(s.data, czi_utils.LazyCziTile) for s in lazy
        )
        for sl, se in zip(lazy, eager):
            assert sl.data.shape == se.data.shape
            assert sl.data.dtype == se.data.dtype
            np.testing.assert_array_equal(sl.data[...], se.data)
            # window read with int channel + y/x slices
            np.testing.assert_array_equal(
                sl.data[0, 10:20, 5:40], se.data[0, 10:20, 5:40]
            )
            # negative int + full slice
            np.testing.assert_array_equal(
                sl.data[-1, :, ::2], se.data[-1, :, ::2]
            )

    def test_lazy_empty_slice_matches_eager(self):
        """Zero-length slices of a leading axis return an empty array
        like eager numpy instead of IndexError (review finding: the
        block-sample probe crashed on empty selections)."""
        from multiview_stitcher_tpu.io import czi_utils

        lazy = czi_utils.read_mosaic_into_sims_czifile(CZI_TEST_FILE)
        eager = czi_utils.read_mosaic_into_sims_czifile(
            CZI_TEST_FILE, lazy=False
        )
        for sl, se in zip(lazy, eager):
            out = sl.data[0:0]
            assert out.shape == se.data[0:0].shape
            assert out.dtype == se.data.dtype
            np.testing.assert_array_equal(
                sl.data[0:0, 5:10, 2:4], se.data[0:0, 5:10, 2:4]
            )

    def test_real_file_registration_ground_truth(self):
        """Pairwise shift recovered within 1.5 px of the known [2.5, 7.5] px
        ground truth (reference test_registration.py:96-111)."""
        from multiview_stitcher_tpu.io import czi_utils

        sims = czi_utils.read_mosaic_into_sims_czifile(CZI_TEST_FILE)
        sims = [
            si_utils.sim_sel_coords(s, {"c": np.asarray(s.coords["c"])[0]})
            for s in sims
        ]
        msims = [
            msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims
        ]
        result = registration.register_pair_of_msims(
            msims[0], msims[1],
            transform_key=czi_utils.METADATA_TRANSFORM_KEY,
        )
        m = np.asarray(result["transform"].squeeze())
        shift_px = m[:2, 2] / 1.0833333333333333
        np.testing.assert_allclose(
            np.abs(shift_px), [2.5, 7.5], atol=1.5
        )


class TestZarrUtils:
    def test_virtual_concat(self):
        a = np.arange(12).reshape(3, 4)
        b = np.arange(12, 20).reshape(2, 4)
        v = zarr_utils.concatenate([a, b], axis=0)
        assert v.shape == (5, 4)
        np.testing.assert_array_equal(np.asarray(v), np.concatenate([a, b]))
        np.testing.assert_array_equal(v[2:4, 1:3], np.concatenate([a, b])[2:4, 1:3])
        np.testing.assert_array_equal(v[4], b[1])

    def test_virtual_stack(self):
        arrs = [np.random.random((4, 5)) for _ in range(3)]
        v = zarr_utils.stack(arrs, axis=0)
        assert v.shape == (3, 4, 5)
        np.testing.assert_array_equal(np.asarray(v), np.stack(arrs))
        np.testing.assert_array_equal(v[1], arrs[1])

    def test_expand_dims(self):
        a = np.random.random((4, 5))
        v = zarr_utils.expand_dims(a, axis=0)
        assert v.shape == (1, 4, 5)
        np.testing.assert_array_equal(np.asarray(v)[0], a)

    def test_virtual_concat_over_lazy_zarr(self, tmp_path):
        from multiview_stitcher_tpu.io import zarr_backend

        arrs = []
        datas = []
        for i in range(2):
            data = np.random.randint(0, 100, (4, 6), dtype=np.uint16)
            arr = zarr_backend.create_zarr_array(
                str(tmp_path / f"{i}.zarr"), data.shape, (2, 3), data.dtype
            )
            arr[...] = data
            arrs.append(zarr_backend.open_zarr_array(str(tmp_path / f"{i}.zarr")))
            datas.append(data)
        v = zarr_utils.concatenate(arrs, axis=0)
        np.testing.assert_array_equal(
            np.asarray(v), np.concatenate(datas, axis=0)
        )


class TestTiffCodecs:
    """Compressed TIFF support via the native codec layer, cross-validated
    against PIL-generated files (LZW with/without predictor, PackBits,
    Deflate)."""

    def _data(self, dtype=np.uint8):
        rng = np.random.default_rng(7)
        # piecewise-constant + gradient content compresses with all schemes
        a = np.repeat(rng.integers(0, 200, (20, 8)), 5, axis=1)
        a = (a + np.arange(40)[None, :]).astype(dtype)
        return a

    @pytest.mark.parametrize("pil_comp", ["tiff_lzw", "packbits", "tiff_adobe_deflate"])
    def test_read_pil_written(self, tmp_path, pil_comp):
        PIL = pytest.importorskip("PIL.Image")
        data = self._data()
        path = str(tmp_path / f"{pil_comp}.tif")
        PIL.fromarray(data).save(path, compression=pil_comp)
        arr = tif_utils.TiffFile(path).read_page(0)
        np.testing.assert_array_equal(arr, data)

    def test_read_pil_lzw_16bit(self, tmp_path):
        PIL = pytest.importorskip("PIL.Image")
        data = self._data(np.uint16) * 37
        path = str(tmp_path / "lzw16.tif")
        PIL.fromarray(data).save(path, compression="tiff_lzw")
        arr = tif_utils.TiffFile(path).read_page(0)
        np.testing.assert_array_equal(arr, data)

    @pytest.mark.parametrize("comp", ["lzw", "packbits", "deflate"])
    def test_write_read_roundtrip(self, tmp_path, comp):
        data = np.stack([self._data(np.uint16) * 3, self._data(np.uint16)])
        path = str(tmp_path / f"rt_{comp}.tif")
        tif_utils.write_tiff(path, data, compression=comp)
        back = np.asarray(tif_utils.LazyTiffPages(path))
        np.testing.assert_array_equal(back, data)

    @pytest.mark.parametrize("comp", ["tiff_lzw", "packbits"])
    def test_our_encoding_readable_by_pil(self, tmp_path, comp):
        PIL = pytest.importorskip("PIL.Image")
        data = self._data()
        path = str(tmp_path / f"ours_{comp}.tif")
        tif_utils.write_tiff(
            path, data,
            compression={"tiff_lzw": "lzw", "packbits": "packbits"}[comp],
        )
        back = np.asarray(PIL.open(path))
        np.testing.assert_array_equal(back, data)

    def test_python_fallback_matches_native(self):
        from multiview_stitcher_tpu.io import codecs

        rng = np.random.default_rng(3)
        payload = rng.integers(0, 30, 5000).astype(np.uint8).tobytes()
        enc = codecs.lzw_encode(payload)
        assert codecs._load_native() is not None  # cc is available here
        native = codecs.lzw_decode(enc, len(payload))
        pure = codecs._lzw_decode_py(enc, len(payload))
        assert native == pure == payload


class TestCziZstd:
    """ZSTD0/ZSTD1 subblock decompression (libczi decoder_zstd semantics)."""

    def test_zstd0_roundtrip(self):
        import zstandard

        from multiview_stitcher_tpu.io import czi_utils

        data = np.arange(200, dtype=np.uint16).tobytes()
        comp = zstandard.ZstdCompressor().compress(data)
        out = czi_utils._decompress_subblock(comp, 5, np.uint16)
        assert out == data

    def test_zstd1_plain_header(self):
        import zstandard

        from multiview_stitcher_tpu.io import czi_utils

        data = np.arange(100, dtype=np.uint8).tobytes()
        comp = bytes([1]) + zstandard.ZstdCompressor().compress(data)
        out = czi_utils._decompress_subblock(comp, 6, np.uint8)
        assert out == data

    def test_zstd1_hilo_unpack(self):
        import zstandard

        from multiview_stitcher_tpu.io import czi_utils

        arr = np.arange(300, 556, dtype="<u2")
        b = arr.tobytes()
        lo, hi = b[0::2], b[1::2]
        packed = lo + hi
        comp = bytes([3, 1, 1]) + zstandard.ZstdCompressor().compress(packed)
        out = czi_utils._decompress_subblock(comp, 6, np.uint16)
        np.testing.assert_array_equal(np.frombuffer(out, "<u2"), arr)

    def test_unsupported_compression_raises(self):
        from multiview_stitcher_tpu.io import czi_utils

        try:
            import imagecodecs  # noqa: F401

            # with the optional package installed, a garbage payload must
            # still raise a stable error type (not a raw codec error)
            with pytest.raises(ValueError, match="JPEG XR"):
                czi_utils._decompress_subblock(b"xx", 4, np.uint16)
        except ImportError:
            with pytest.raises(NotImplementedError, match="JPEG XR"):
                czi_utils._decompress_subblock(b"xx", 4, np.uint16)

    def test_jpegxr_routes_through_optional_imagecodecs(self, monkeypatch):
        """Compression 4 decodes via imagecodecs.jpegxr_decode when the
        optional package is importable (reference czi_utils.py:252 decodes
        JXR through the czifile/imagecodecs stack)."""
        import sys
        import types

        from multiview_stitcher_tpu.io import czi_utils

        img = np.arange(24, dtype=np.uint16).reshape(4, 6)
        calls = {}

        fake = types.ModuleType("imagecodecs")

        def jpegxr_decode(raw):
            calls["raw"] = raw
            return img

        fake.jpegxr_decode = jpegxr_decode
        monkeypatch.setitem(sys.modules, "imagecodecs", fake)

        out = czi_utils._decompress_subblock(b"\x01\x02jxr", 4, np.uint16)
        assert calls["raw"] == b"\x01\x02jxr"
        np.testing.assert_array_equal(
            np.frombuffer(out, np.uint16).reshape(4, 6), img
        )

    def test_register_subblock_decompressor_custom_id(self):
        """User-registered decoders take over ids the built-in reader
        rejects (LZW=2 here); unregistering restores the clear error."""
        from multiview_stitcher_tpu.io import czi_utils

        payload = np.arange(10, dtype=np.uint8).tobytes()
        czi_utils.register_subblock_decompressor(
            2, lambda raw, dtype: raw[::-1]
        )
        try:
            out = czi_utils._decompress_subblock(payload, 2, np.uint8)
            assert out == payload[::-1]
        finally:
            del czi_utils._SUBBLOCK_DECOMPRESSORS[2]
        with pytest.raises(NotImplementedError, match="register"):
            czi_utils._decompress_subblock(payload, 2, np.uint8)


def test_unknown_suffix_routes_to_aicsimageio_seam():
    """Non-CZI/TIFF/Imaris/zarr suffixes delegate to the optional
    aicsimageio catch-all (reference io.py:25); absent package -> clear
    ImportError naming it."""
    from multiview_stitcher_tpu import io as mvs_io

    with pytest.raises(ImportError, match="aicsimageio"):
        mvs_io.read_mosaic_into_sims("/tmp/nonexistent.lif")


def test_aicsimageio_fallback_with_fake_backend(monkeypatch):
    """Drive the fallback reader with a stub aicsimageio: tile stage
    positions scale into physical translations, channel names carry over."""
    import sys
    import types

    from multiview_stitcher_tpu import io as mvs_io

    tiles = [
        np.arange(2 * 1 * 1 * 8 * 10, dtype=np.uint16).reshape(2, 1, 1, 8, 10),
        (np.arange(2 * 1 * 1 * 8 * 10, dtype=np.uint16) * 2).reshape(
            2, 1, 1, 8, 10
        ),
    ]

    class FakeAICSImage:
        physical_pixel_sizes = types.SimpleNamespace(X=0.5, Y=0.25, Z=None)
        channel_names = ["DAPI"]

        def __init__(self, path, reconstruct_mosaic=False):
            assert reconstruct_mosaic is False

        def set_scene(self, idx):
            assert idx == 0

        def get_image_data(self, *a, **k):
            if "M" in k:
                return tiles[k["M"]]
            return tiles[0]

        def get_mosaic_tile_positions(self):
            return [(0, 0), (4, 8)]  # (y, x) pixel offsets

    fake_mod = types.SimpleNamespace(AICSImage=FakeAICSImage)
    monkeypatch.setitem(sys.modules, "aicsimageio", fake_mod)
    sims = mvs_io.read_mosaic_into_sims("/tmp/fake.lif")
    assert len(sims) == 2
    s0, s1 = sims
    assert tuple(s0.dims) == ("t", "c", "y", "x")
    assert s0.sizes["y"] == 8 and s0.sizes["x"] == 10
    np.testing.assert_allclose(s0.origin["y"], 0.0)
    np.testing.assert_allclose(s1.origin["y"], 4 * 0.25)
    np.testing.assert_allclose(s1.origin["x"], 8 * 0.5)
    np.testing.assert_allclose(s0.spacing["x"], 0.5)
    assert list(np.asarray(s0.coords["c"])) == ["DAPI"]


# ---------------------------------------------------------------------------
# First-party fallback reader (imageio/PIL catch-all; reference io.py:25
# delegates these formats to the optional aicsimageio package)
# ---------------------------------------------------------------------------


def test_fallback_reads_png_grayscale_with_physical_resolution(tmp_path):
    from PIL import Image

    from multiview_stitcher_tpu import io as mio
    from multiview_stitcher_tpu import si_utils

    arr = np.arange(24 * 17, dtype=np.uint8).reshape(24, 17)
    p = tmp_path / "gray.png"
    # 2000 dots/meter -> 500 um/px
    Image.fromarray(arr).save(p, dpi=(2000 * 0.0254, 2000 * 0.0254))

    (sim,) = mio.read_mosaic_into_sims(p)
    assert sim.dims == ("y", "x")
    np.testing.assert_array_equal(np.asarray(sim.data), arr)
    spacing = si_utils.get_spacing_from_sim(sim)
    assert abs(spacing["x"] - 500.0) < 1.0 and abs(spacing["y"] - 500.0) < 1.0


def test_fallback_reads_rgb_png_as_channel_dim(tmp_path):
    from PIL import Image

    from multiview_stitcher_tpu import io as mio

    rgb = np.random.default_rng(0).integers(0, 255, (10, 12, 3)).astype(
        np.uint8
    )
    p = tmp_path / "color.png"
    Image.fromarray(rgb).save(p)

    (sim,) = mio.read_mosaic_into_sims(p)
    assert sim.dims == ("c", "y", "x")
    assert list(sim.coords["c"]) == ["R", "G", "B"]
    np.testing.assert_array_equal(
        np.asarray(sim.data), np.moveaxis(rgb, -1, 0)
    )


def test_fallback_reads_multiframe_gif_as_time(tmp_path):
    from PIL import Image

    from multiview_stitcher_tpu.io import fallback

    frames = [
        Image.fromarray(np.full((8, 9), v, np.uint8)) for v in (0, 120, 250)
    ]
    p = tmp_path / "anim.gif"
    frames[0].save(p, save_all=True, append_images=frames[1:])

    sim = fallback.read_image_into_sim(p)
    assert sim.dims[0] == "t" and sim.shape[0] == 3
    # GIF palettes may expand to RGB; collapse any channel dim for values
    data = np.asarray(sim.data)
    if "c" in sim.dims:
        data = data[:, 0]
    assert data[0].max() == 0 and data[2].min() >= 200


def test_fallback_default_unit_spacing_and_scene_guard(tmp_path):
    from PIL import Image

    import pytest

    from multiview_stitcher_tpu.io import fallback
    from multiview_stitcher_tpu import si_utils

    p = tmp_path / "plain.bmp"
    Image.fromarray(np.zeros((5, 6), np.uint8)).save(p)
    (sim,) = fallback.read_image_into_sims(p)
    assert si_utils.get_spacing_from_sim(sim) == {"y": 1.0, "x": 1.0}
    with pytest.raises(ValueError, match="single scene"):
        fallback.read_image_into_sims(p, scene_index=2)


def test_unknown_suffix_still_raises_clear_aicsimageio_error(tmp_path):
    import pytest

    from multiview_stitcher_tpu import io as mio

    p = tmp_path / "mystery.nd2"
    p.write_bytes(b"\x00" * 16)
    with pytest.raises(ImportError, match="aicsimageio"):
        mio.read_mosaic_into_sims(p)


def test_lazy_czi_reads_are_thread_safe():
    """Parallel window reads from many threads return the same planes as
    serial reads (reference test_io.py:204-252 pins handle-per-thread
    semantics; this build opens a fresh handle per subblock read, which
    must stay correct under concurrency)."""
    from concurrent.futures import ThreadPoolExecutor

    from multiview_stitcher_tpu.io import czi_utils

    sims = czi_utils.read_mosaic_into_sims_czifile(
        "/root/reference/src/multiview_stitcher/test-datasets/"
        "mosaic_test.czi",
        lazy=True,
    )
    eager = [np.asarray(s.data) for s in sims]

    def window(args):
        i, y, x = args
        return i, y, x, np.asarray(sims[i].data[..., y : y + 7, x : x + 9])

    jobs = [
        (i, y, x)
        for i in range(len(sims))
        for y in (0, 3, 11)
        for x in (0, 5, 17)
    ]
    with ThreadPoolExecutor(8) as ex:
        for i, y, x, got in ex.map(window, jobs * 4):
            np.testing.assert_array_equal(
                got, eager[i][..., y : y + 7, x : x + 9]
            )


class TestTiffHyperstackAndVirtualZarr:
    """ImageJ hyperstack layout + TIFF-as-virtual-zarr-v3 (reference
    tif_utils.py:29-61 layout split, :64 TiffPagesZarrV3Store, :286/:291
    converters)."""

    @staticmethod
    def _write_hyperstack(path, t=2, z=3, c=2, h=8, w=10):
        rng = np.random.default_rng(7)
        # page order: t slowest, c fastest (ImageJ XYCZT storage)
        data = rng.integers(0, 4000, (t, z, c, h, w), dtype=np.uint16)
        tif_utils.write_tiff(
            path,
            data.reshape(-1, h, w),
            description=(
                f"ImageJ=1.54f\nimages={t * z * c}\nchannels={c}\n"
                f"slices={z}\nframes={t}\nhyperstack=true\n"
            ),
        )
        return data

    def test_layout_from_imagej_description(self, tmp_path):
        path = str(tmp_path / "hs.tif")
        data = self._write_hyperstack(path)
        tif = tif_utils.TiffFile(path)
        non_spatial, page_shape, dtype, n_pages = tif_utils.get_tiff_layout(
            tif
        )
        assert non_spatial == (2, 3, 2)
        assert page_shape == (8, 10)
        assert dtype == np.uint16
        assert n_pages == 12
        assert tif_utils.get_tiff_axes(tif) == ("t", "z", "c")
        np.testing.assert_array_equal(
            tif.asarray().reshape(data.shape), data
        )

    def test_layout_plain_stack_and_single_page(self, tmp_path):
        path = str(tmp_path / "plain.tif")
        tif_utils.write_tiff(
            path, np.zeros((4, 6, 6), dtype=np.uint8)
        )
        non_spatial, page_shape, _, n = tif_utils.get_tiff_layout(
            tif_utils.TiffFile(path)
        )
        assert non_spatial == (4,) and page_shape == (6, 6) and n == 4

        single = str(tmp_path / "single.tif")
        tif_utils.write_tiff(single, np.zeros((6, 6), dtype=np.uint8))
        non_spatial, page_shape, _, n = tif_utils.get_tiff_layout(
            tif_utils.TiffFile(single)
        )
        assert non_spatial == () and n == 1

    def test_layout_inconsistent_page_count_raises(self, tmp_path):
        path = str(tmp_path / "bad.tif")
        tif_utils.write_tiff(
            path,
            np.zeros((4, 6, 6), dtype=np.uint8),
            description="ImageJ=1.54f\nimages=6\nchannels=2\nslices=3\n",
        )
        with pytest.raises(ValueError, match="inconsistent"):
            tif_utils.get_tiff_layout(tif_utils.TiffFile(path))

    def test_lazy_nd_indexing_matches_numpy(self, tmp_path):
        path = str(tmp_path / "hs.tif")
        data = self._write_hyperstack(path)
        nd = tif_utils.tif_to_dask_plane_chunks(path)
        assert nd.shape == data.shape
        np.testing.assert_array_equal(np.asarray(nd), data)
        np.testing.assert_array_equal(nd[1], data[1])
        np.testing.assert_array_equal(nd[1, 2], data[1, 2])
        np.testing.assert_array_equal(
            nd[0:1, 1:3, 1, 2:6, :], data[0:1, 1:3, 1, 2:6, :]
        )
        np.testing.assert_array_equal(nd[-1, -1, -1], data[-1, -1, -1])
        assert nd[1:1].shape == (0, 3, 2, 8, 10)
        nd.close()

    def test_read_into_sim_exposes_hyperstack_dims(self, tmp_path):
        path = str(tmp_path / "hs.tif")
        data = self._write_hyperstack(path)
        sim = tif_utils.read_tiff_into_sim(path)
        assert tuple(sim.dims) == ("t", "z", "c", "y", "x")
        np.testing.assert_array_equal(sim.to_numpy(), data)

    def test_virtual_zarr_v3_store_metadata_and_chunks(self, tmp_path):
        import json as _json

        path = str(tmp_path / "hs.tif")
        data = self._write_hyperstack(path)
        store = tif_utils.tif_to_virtual_zarr_v3_plane_chunks(path)
        meta = _json.loads(store.get("zarr.json"))
        assert meta["zarr_format"] == 3
        assert meta["node_type"] == "array"
        assert meta["shape"] == [2, 3, 2, 8, 10]
        assert meta["chunk_grid"]["configuration"]["chunk_shape"] == [
            1, 1, 1, 8, 10,
        ]
        assert meta["data_type"] == "uint16"

        chunk = store.get("c/1/2/0/0/0")
        got = np.frombuffer(chunk, dtype="<u2").reshape(8, 10)
        np.testing.assert_array_equal(got, data[1, 2, 0])

        assert store.get("c/2/0/0/0/0") is None  # t out of range
        assert store.get("c/0/0/0/1/0") is None  # nonzero spatial chunk
        assert store.get("c/0/0/0/0") is None  # wrong rank
        assert store.get("c/x/0/0/0/0") is None
        assert store.get("nonsense") is None
        store.close()

    def test_virtual_zarr_v3_served_over_http(self, tmp_path):
        """The store plugs into the virtual HTTP server and reads back
        through the zarr3 backend byte-identically."""
        import socket

        from multiview_stitcher_tpu.io import virtual_ngff, zarr_backend

        path = str(tmp_path / "hs.tif")
        data = self._write_hyperstack(path)
        store = tif_utils.tif_to_virtual_zarr_v3_plane_chunks(path)
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        server = virtual_ngff.VirtualOMEZarrServer(
            {"stack.zarr": store}, port=port
        ).start()
        try:
            arr = zarr_backend.open_zarr_array(
                f"http://127.0.0.1:{port}/stack.zarr", zarr_format=3
            )
            np.testing.assert_array_equal(np.asarray(arr), data)
        finally:
            server.shutdown()
            store.close()

    def test_page_reads_threadsafe_and_close_releases(self, tmp_path):
        import threading as _threading

        path = str(tmp_path / "hs.tif")
        data = self._write_hyperstack(path)
        tif = tif_utils.TiffFile(path)
        results = {}

        def read(i):
            results[i] = tif.read_page(i)

        threads = [
            _threading.Thread(target=read, args=(i,)) for i in range(12)
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        flat = data.reshape(-1, 8, 10)
        for i in range(12):
            np.testing.assert_array_equal(results[i], flat[i])
        assert len(tif._handles) >= 1
        tif.close()
        assert tif._handles == []
        # reads still work after close (handles reopen on demand)
        np.testing.assert_array_equal(tif.read_page(0), flat[0])
        tif.close()
