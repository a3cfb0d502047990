"""Pinned registration-parameter fixtures for the BASELINE configs.

The reference pins registration outputs against stored expected transforms
(reference _tests/test_bench.py:18-100, tolerances 0.0005-0.04 physical
units). The reference itself cannot execute in this environment (xarray/
dask/skimage/zarr are not installed and installs are forbidden), so the
stored values here were generated ONCE by this repo's own pipeline — whose
phase-correlation kernel is proven subpixel-identical to an independent
float64 numpy oracle of the published Guizar-Sicairos algorithm in
tests/test_phase_correlation.py, and whose end-to-end accuracy against
known ground truth is proven in tests/test_baseline_configs.py and the
bundled-CZI test (tests/test_readers.py: shift within 1.5 px of the known
[2.5, 7.5] px offsets, reference test_registration.py:96-111).

What these fixtures add: any future change to the kernels, overlap
geometry, binning heuristics, or resolvers that moves a pairwise transform
or a resolved parameter by more than the stored tolerance fails loudly —
the same regression net the reference's private test bench provides.

Regenerate (after an INTENDED parameter-affecting change) with:

    python tests/test_reference_fixtures.py --regen

and commit the updated ``fixtures/reference_params.json`` with a rationale.
"""

import json
import os
import sys

import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multiview_stitcher_tpu import (  # noqa: E402
    fusion,
    msi_utils,
    registration,
    sample_data,
    si_utils,
    transformation,
)

FIXTURE_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "fixtures",
    "reference_params.json",
)

# translations are pinned to 1e-3 physical units (the north star's
# subpixel-identity budget: spacing is 0.5-2.0 units/px in these configs);
# linear terms and qualities get matching tight tolerances
ATOL_TRANSLATION = 1e-3
ATOL_LINEAR = 1e-5
ATOL_QUALITY = 1e-3


# ---------------------------------------------------------------------------
# config builders (deterministic; small enough for the CPU suite)
# ---------------------------------------------------------------------------


def _build_two_tile_2d():
    """BASELINE config 1: 2-tile 2D overlap stitch (in-memory numpy)."""
    rng = np.random.default_rng(0)
    scene = (gaussian_filter(rng.random((80, 150)), 1.2) * 1000).astype(
        np.uint16
    )
    t0, t1 = scene[:, :90], scene[:, 60:]
    shift = (1.0, -2.0)
    sims = [
        si_utils.get_sim_from_array(t0, translation={"y": 0.0, "x": 0.0}),
        si_utils.get_sim_from_array(
            t1, translation={"y": shift[0], "x": 60 + shift[1]}
        ),
    ]
    return sims, {}


def _build_grid3x3_2d_2c():
    """BASELINE config 2: 3x3 2D grid, two channels, global resolution."""
    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_c=2, N_t=1, tile_size=50, tiles_x=3, tiles_y=3,
        overlap=12, zoom=4, shift_scale=2.0, drift_scale=0.0,
    )
    return sims, {"reg_channel_index": 0}


def _build_grid_3d_aniso():
    """BASELINE config 3: 3D grid on anisotropic spacing (z=2.0, y/x=0.5)."""
    sims = sample_data.generate_tiled_dataset(
        ndim=3, N_c=1, N_t=1, tile_size=24, tiles_x=2, tiles_y=2,
        tiles_z=1, overlap=8, zoom=3, shift_scale=1.5, drift_scale=0.0,
    )
    sims = [
        si_utils.sim_sel_coords(s, {"c": "channel 0", "t": 0}) for s in sims
    ]
    return sims, {}


_PIPELINE_BUILDERS = {
    "two_tile_2d": _build_two_tile_2d,
    "grid3x3_2d_2c": _build_grid3x3_2d_2c,
    "grid_3d_aniso": _build_grid_3d_aniso,
}


def _run_pipeline_config(name):
    """register(return_dict=True) -> (edge dict, resolved param list,
    fused stats dict)."""
    sims, kwargs = _PIPELINE_BUILDERS[name]()
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    result = registration.register(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        new_transform_key="registered",
        return_dict=True,
        **kwargs,
    )
    g = result["pairwise_registration"]["graph"]
    edges = {}
    for (i, j), data in sorted(
        (tuple(sorted(e)), g.edges[e]) for e in g.edges
    ):
        edges[f"{i}-{j}"] = {
            "affine": np.asarray(data["transform"]).squeeze().tolist(),
            "quality": float(np.asarray(data["quality"]).squeeze()),
        }
    params = [np.asarray(p).squeeze().tolist() for p in result["params"]]
    fused_stats = _fused_stats_for_msims(msims)
    return edges, params, fused_stats


def _fused_stats_for_msims(msims):
    """Fuse the registered views and summarize the OUTPUT VOXELS.

    Params-only pins leave fusion geometry/blending regressions invisible
    (the class the reference's shape math guards against,
    fusion/_core.py:1068 + transformation.py:118); the reference's private
    bench pins actual transforms (_tests/test_bench.py:66-96) — this is
    the fusion-side analogue. Integer outputs pin an exact CRC32 of the
    voxel bytes (the CPU suite is deterministic); float outputs pin
    mean/std/corner statistics at 1e-5.
    """
    import zlib

    fused = fusion.fuse(
        [msi_utils.get_sim_from_msim(m) for m in msims],
        transform_key="registered",
    )
    arr = np.asarray(fused.data)
    stats = {
        "shape": list(arr.shape),
        "dtype": str(arr.dtype),
        "mean": float(np.nanmean(arr.astype(np.float64))),
        "std": float(np.nanstd(arr.astype(np.float64))),
        "nonzero": int(np.count_nonzero(np.nan_to_num(arr))),
    }
    if np.issubdtype(arr.dtype, np.integer):
        stats["crc32"] = int(
            zlib.crc32(np.ascontiguousarray(arr).tobytes())
        )
    else:
        flat = arr.reshape(-1)
        step = max(1, flat.size // 64)
        stats["samples"] = [
            float(x) for x in np.nan_to_num(flat[::step][:64])
        ]
    return stats


def _run_marker_affine_config():
    """BASELINE config 4 (multiview, affine-capable pairwise): RGLDM
    marker registration recovering a rotation in 2D and 3D (the
    BigStitcher-style bead path, reference registration.py:568-1379)."""
    from multiview_stitcher_tpu import param_utils

    out = {}
    for ndim in (2, 3):
        rng = np.random.default_rng(100 + ndim)
        moving_points = rng.uniform(0, 100, size=(36, ndim))
        if ndim == 2:
            angle = 0.8
            expected = np.eye(3)
            expected[:2, :2] = [
                [np.cos(angle), -np.sin(angle)],
                [np.sin(angle), np.cos(angle)],
            ]
        else:
            direction = np.array([0.3, -0.2, 1.0])
            expected = param_utils.affine_from_rotation(
                0.6, direction / np.linalg.norm(direction)
            )
        fixed_points = transformation.transform_pts(moving_points, expected)
        result = registration.registration_marker_based(
            fixed_points=fixed_points,
            moving_points=moving_points,
            icp=True,
            random_state=2,
            fail_on_error=True,
        )
        out[f"rotation_{ndim}d"] = {
            "affine": np.asarray(result["affine_matrix"]).tolist(),
            "quality": float(result["quality"]),
        }
    return out


def _compare_affine(actual, expected, label):
    actual = np.asarray(actual, dtype=float)
    expected = np.asarray(expected, dtype=float)
    nd = actual.shape[-1] - 1
    np.testing.assert_allclose(
        actual[..., :nd, :nd], expected[..., :nd, :nd],
        atol=ATOL_LINEAR, err_msg=f"{label}: linear part drifted",
    )
    np.testing.assert_allclose(
        actual[..., :nd, nd], expected[..., :nd, nd],
        atol=ATOL_TRANSLATION, err_msg=f"{label}: translation drifted",
    )


# ---------------------------------------------------------------------------
# regeneration
# ---------------------------------------------------------------------------


def regenerate():
    fixtures = {}
    for name in _PIPELINE_BUILDERS:
        edges, params, fused = _run_pipeline_config(name)
        fixtures[name] = {"edges": edges, "params": params, "fused": fused}
    fixtures["marker_affine"] = _run_marker_affine_config()
    os.makedirs(os.path.dirname(FIXTURE_PATH), exist_ok=True)
    with open(FIXTURE_PATH, "w") as f:
        json.dump(fixtures, f, indent=1, sort_keys=True)
    print(f"wrote {FIXTURE_PATH}")


def _load_fixtures():
    if not os.path.exists(FIXTURE_PATH):
        pytest.fail(
            f"{FIXTURE_PATH} missing — run "
            "`python tests/test_reference_fixtures.py --regen`"
        )
    with open(FIXTURE_PATH) as f:
        return json.load(f)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", sorted(_PIPELINE_BUILDERS))
def test_pipeline_params_match_fixture(name):
    fixtures = _load_fixtures()
    expected = fixtures[name]
    edges, params, fused = _run_pipeline_config(name)
    assert sorted(edges) == sorted(expected["edges"]), (
        f"{name}: edge set changed"
    )
    for key, e in expected["edges"].items():
        _compare_affine(edges[key]["affine"], e["affine"], f"{name} edge {key}")
        assert edges[key]["quality"] == pytest.approx(
            e["quality"], abs=ATOL_QUALITY
        ), f"{name} edge {key}: quality drifted"
    assert len(params) == len(expected["params"])
    for i, (a, e) in enumerate(zip(params, expected["params"])):
        _compare_affine(a, e, f"{name} resolved param {i}")
    _compare_fused(fused, expected["fused"], name)


def _compare_fused(actual, expected, label):
    """Fused-voxel pins: geometry (shape/dtype) exactly, content by CRC32
    for integer outputs and by mean/std/samples at 1e-5 for float."""
    assert actual["shape"] == expected["shape"], (
        f"{label}: fused output shape changed "
        f"{expected['shape']} -> {actual['shape']}"
    )
    assert actual["dtype"] == expected["dtype"], f"{label}: fused dtype"
    if "crc32" in expected:
        if actual.get("crc32") != expected["crc32"]:
            raise AssertionError(
                f"{label}: fused voxel content changed (crc32 "
                f"{expected['crc32']} -> {actual.get('crc32')}; mean "
                f"{expected['mean']:.6f} -> {actual['mean']:.6f}, std "
                f"{expected['std']:.6f} -> {actual['std']:.6f}, nonzero "
                f"{expected['nonzero']} -> {actual['nonzero']})"
            )
    else:
        np.testing.assert_allclose(
            actual["samples"], expected["samples"], rtol=1e-5, atol=1e-5,
            err_msg=f"{label}: fused float samples drifted",
        )
    np.testing.assert_allclose(
        actual["mean"], expected["mean"], rtol=1e-5,
        err_msg=f"{label}: fused mean drifted",
    )
    np.testing.assert_allclose(
        actual["std"], expected["std"], rtol=1e-5,
        err_msg=f"{label}: fused std drifted",
    )


def test_marker_affine_matches_fixture():
    fixtures = _load_fixtures()
    expected = fixtures["marker_affine"]
    actual = _run_marker_affine_config()
    for key, e in expected.items():
        _compare_affine(actual[key]["affine"], e["affine"], f"marker {key}")
        assert actual[key]["quality"] == pytest.approx(
            e["quality"], abs=ATOL_QUALITY
        )


def test_zarr_backed_params_match_in_memory_fixture(tmp_path):
    """BASELINE config 5 (zarr-backed out-of-core): registering the 3D
    config through an OME-Zarr round trip yields the SAME parameters as
    the in-memory run (pinned above) — zarr backing must not perturb
    registration (reference zarr-backed msims feed the same reg path)."""
    from multiview_stitcher_tpu.io import ngff_utils

    fixtures = _load_fixtures()
    expected = fixtures["grid_3d_aniso"]
    sims, kwargs = _build_grid_3d_aniso()
    zarr_sims = []
    for i, s in enumerate(sims):
        url = str(tmp_path / f"tile{i}.zarr")
        ngff_utils.write_sim_to_ome_zarr(s, url, overwrite=True)
        back = ngff_utils.read_sim_from_ome_zarr(url)
        # OME-Zarr cannot store affines (reference data_formats.md:35):
        # restore the stage transform under the default key
        si_utils.set_sim_affine(
            back,
            si_utils.get_affine_from_sim(
                s, si_utils.DEFAULT_TRANSFORM_KEY
            ),
            si_utils.DEFAULT_TRANSFORM_KEY,
        )
        zarr_sims.append(back)
    msims = [
        msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in zarr_sims
    ]
    result = registration.register(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        new_transform_key="registered",
        return_dict=True,
        **kwargs,
    )
    params = [np.asarray(p).squeeze().tolist() for p in result["params"]]
    for i, (a, e) in enumerate(zip(params, expected["params"])):
        _compare_affine(a, e, f"zarr-backed resolved param {i}")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        regenerate()
    else:
        print(__doc__)
