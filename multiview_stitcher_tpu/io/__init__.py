"""IO layer: zarr/NGFF (tensorstore-backed), TIFF, CZI, Imaris.

Mirrors the reference's io surface (/root/reference/src/multiview_stitcher/
io.py, ngff_utils.py, tif_utils.py, czi_utils.py, imaris_utils.py).
"""

from pathlib import Path

from multiview_stitcher_tpu import si_utils as _si_utils

METADATA_TRANSFORM_KEY = _si_utils.DEFAULT_TRANSFORM_KEY


def read_mosaic_into_sims(filepath, scene_index: int = 0):
    """Read mosaic tiles into sims with stage positions from metadata.

    Dispatches on file suffix (reference io.py:25).
    """
    filepath = Path(filepath)
    if filepath.suffix == ".czi":
        from multiview_stitcher_tpu.io import czi_utils

        return czi_utils.read_mosaic_into_sims_czifile(
            filepath, scene_index=scene_index
        )
    if filepath.suffix in (".tif", ".tiff"):
        from multiview_stitcher_tpu.io import tif_utils

        return [tif_utils.read_tiff_into_sim(filepath)]
    if filepath.suffix == ".ims":
        from multiview_stitcher_tpu.io import imaris_utils
        from multiview_stitcher_tpu import msi_utils

        return [
            msi_utils.get_sim_from_msim(
                imaris_utils.read_imaris_into_msim(filepath)
            )
        ]
    if str(filepath).endswith((".zarr", ".ome.zarr")):
        from multiview_stitcher_tpu.io import ngff_utils

        return [ngff_utils.read_sim_from_ome_zarr(filepath)]
    raise ValueError(f"Unsupported mosaic file format: {filepath.suffix}")


def save_sim_as_tif(path, sim):
    from multiview_stitcher_tpu.io import tif_utils

    return tif_utils.save_sim_as_tif(path, sim)


def get_number_of_scenes_in_mosaic(filepath) -> int:
    """Number of scenes in a mosaic file (reference io.py:57)."""
    filepath = Path(filepath)
    if filepath.suffix == ".czi":
        from multiview_stitcher_tpu.io import czi_utils

        return czi_utils.get_czi_shape(filepath).get("S", 1)
    return 1
