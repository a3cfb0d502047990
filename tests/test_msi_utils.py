import numpy as np
import pytest

from multiview_stitcher_tpu import msi_utils, si_utils

def test_msim_map_blocks_eager_and_lazy(tmp_path):
    from multiview_stitcher_tpu import zarr_utils
    from multiview_stitcher_tpu.io import zarr_backend

    data = np.arange(64, dtype=np.uint16).reshape(8, 8)
    sim = si_utils.get_sim_from_array(data, translation={"y": 2.0, "x": 3.0})
    msim = msi_utils.get_msim_from_sim(sim, scale_factors=[{"y": 2, "x": 2}])

    mapped = msi_utils.msim_map_blocks(msim, lambda b: b * 2.0)
    assert len(mapped.sims) == 2
    np.testing.assert_array_equal(
        mapped.get_scale("scale0").to_numpy(), data * 2.0
    )
    # transforms preserved
    assert set(mapped.transforms) == set(msim.transforms)

    # lazy: back scale0 with a zarr array, map, check laziness + values
    arr = zarr_backend.create_zarr_array(
        str(tmp_path / "a.zarr"), shape=(8, 8), dtype="uint16",
        chunks=(4, 4),
    )
    arr[...] = data
    lazy_sim = si_utils.get_sim_from_array(arr)
    lazy_msim = msi_utils.get_msim_from_sim(lazy_sim, scale_factors=[])
    mapped_lazy = msi_utils.msim_map_blocks(
        lazy_msim, lambda b: b.astype(np.float32) + 1
    )
    assert isinstance(mapped_lazy.sims[0].data, zarr_utils.VirtualMap)
    assert mapped_lazy.sims[0].data.dtype == np.float32
    np.testing.assert_array_equal(
        np.asarray(mapped_lazy.sims[0].data[2:5, 1:7]),
        data[2:5, 1:7].astype(np.float32) + 1,
    )

    # shape-changing funcs are rejected eagerly
    with pytest.raises(ValueError):
        msi_utils.sim_map_blocks(sim, lambda b: b[::2])
