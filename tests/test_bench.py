"""Regression tests for the driver benchmark's robustness machinery.

The reference ships a benchmark test module
(/root/reference/src/multiview_stitcher/_tests/test_bench.py); here the
priority is different — round 2 lost its entire device-side record to a
stalled scenario — so these tests pin the guarantees the driver relies on:
one well-formed JSON line no matter what, idempotent emission (the SIGTERM
handler may race main), watchdog-bounded sub-benches, and a sane CPU
baseline on the reference's grid configuration.
"""

import importlib
import io
import json
import sys
import time
from contextlib import redirect_stdout

import numpy as np
import pytest


@pytest.fixture()
def bench():
    import jax

    prev_cache = jax.config.jax_compilation_cache_dir
    mod = importlib.import_module("bench")
    saved = dict(mod._state)
    yield mod
    mod._state.clear()
    mod._state.update(saved)
    # bench import points the persistent compile cache at the TPU cache
    # dir; restore the suite's CPU cache so later tests keep their keys
    jax.config.update("jax_compilation_cache_dir", prev_cache)


def _capture_emit(mod):
    buf = io.StringIO()
    with redirect_stdout(buf):
        mod._emit()
    return buf.getvalue()


class TestEmit:
    def test_single_json_line_with_required_keys(self, bench):
        bench._state.update(
            {
                "extras": {"link_up_mb_s": 42.0},
                "cpu_rate": 2e6,
                "tpu_rate": 30e6,
                "done": False,
            }
        )
        out = _capture_emit(bench)
        lines = [l for l in out.splitlines() if l.strip()]
        assert len(lines) == 1
        rec = json.loads(lines[0])
        assert rec["metric"] == "fused_voxel_throughput"
        assert rec["unit"] == "Mvox/s/chip"
        assert rec["value"] == pytest.approx(30.0)
        assert rec["vs_baseline"] == pytest.approx(15.0)
        assert rec["link_up_mb_s"] == 42.0

    def test_emit_is_idempotent(self, bench):
        """The SIGTERM handler and main() can both reach _emit; only the
        first may print (the driver parses exactly one JSON line)."""
        bench._state.update(
            {"extras": {}, "cpu_rate": 1e6, "tpu_rate": 1e6, "done": False}
        )
        first = _capture_emit(bench)
        second = _capture_emit(bench)
        assert json.loads(first)
        assert second == ""

    def test_emit_before_any_measurement_is_a_noop(self, bench):
        """A signal arriving before main() seeds extras must not print a
        half-formed record."""
        bench._state.update(
            {"extras": None, "cpu_rate": None, "tpu_rate": 0.0, "done": False}
        )
        assert _capture_emit(bench) == ""

    def test_emit_without_cpu_baseline_divides_by_one(self, bench):
        """cpu_rate may be missing when the baseline itself was cut short;
        vs_baseline then falls back to the raw rate, never a div-by-zero."""
        bench._state.update(
            {"extras": {}, "cpu_rate": None, "tpu_rate": 5e6, "done": False}
        )
        rec = json.loads(_capture_emit(bench))
        assert rec["vs_baseline"] == pytest.approx(5e6)


class TestBounded:
    def test_returns_result(self, bench):
        assert bench._bounded("ok", lambda: 7, 5.0) == 7

    def test_timeout_returns_none_quickly(self, bench):
        t0 = time.perf_counter()
        out = bench._bounded("slow", lambda: time.sleep(5.0), 0.2)
        assert out is None
        assert time.perf_counter() - t0 < 2.0

    def test_exception_returns_none(self, bench):
        def boom():
            raise RuntimeError("tunnel weather")

        assert bench._bounded("boom", boom, 5.0) is None


class TestGridAndBaseline:
    def test_make_grid_sims_matches_reference_config(self, bench):
        """3x3 grid of 100^3 tiles with 20 px overlap — the reference
        benchmark layout (_benchmarks/test_core.py:119-147)."""
        sims = bench.make_grid_sims(n=3, tile=100, overlap=20)
        assert len(sims) == 9
        from multiview_stitcher_tpu import si_utils

        shapes = {
            tuple(
                s.data.shape[-3:]
            )
            for s in sims
        }
        assert shapes == {(100, 100, 100)}
        # neighbouring tiles overlap by 20 px in world coords
        o0 = si_utils.get_origin_from_sim(sims[0])
        o1 = si_utils.get_origin_from_sim(sims[1])
        deltas = sorted(abs(o1[d] - o0[d]) for d in o0)
        assert deltas[-1] == pytest.approx(80.0)

    def test_cpu_baseline_rate_is_finite_and_positive(self, bench):
        from multiview_stitcher_tpu import si_utils

        sims = bench.make_grid_sims(n=2, tile=24, overlap=6)
        rate = bench.cpu_baseline_voxel_rate(
            sims,
            si_utils.DEFAULT_TRANSFORM_KEY,
            n_sample_chunks=2,
            chunksize=24,
        )
        assert np.isfinite(rate) and rate > 0


class TestEntropyFloor:
    def test_delta_entropy_bits_bounds(self, bench):
        rng = np.random.default_rng(0)
        # constant stream: zero entropy
        assert bench._delta_entropy_bits(np.full(10000, 7, np.uint16)) == 0.0
        # white 10-bit noise: delta widens entropy toward ~11 bits, and it
        # can never exceed 16
        h = bench._delta_entropy_bits(
            rng.integers(0, 1 << 10, 1 << 16).astype(np.uint16)
        )
        assert 10.0 < h <= 16.0
        # smooth ramp-ish content: far below the 10-bit container
        h2 = bench._delta_entropy_bits(
            (500 + np.cumsum(rng.integers(-2, 3, 1 << 16))).astype(np.uint16)
        )
        assert h2 < 3.5

    def test_smooth_tile_floor_matches_recorded_regime(self, bench):
        # the bench's own content floors in the 6-8 bit band — the regime
        # the north-star telemetry documents (PARITY round 4)
        rng = np.random.default_rng(0)
        h = bench._delta_entropy_bits(bench._smooth_tile(rng, (64,) * 3))
        assert 6.0 < h < 8.5


class TestPairwiseRegScenario:
    def test_device_grown_batch_counts(self, bench):
        # the scenario must time n_pairs worth of work while uploading
        # only upload_pairs crops; smoke the shape math on CPU
        r = bench.pairwise_reg_rate(
            n_pairs=12, crop=(32, 32), upload_pairs=4, repeats=1
        )
        assert r > 0
