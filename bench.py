"""Benchmark: fused voxel throughput vs single-process CPU baseline.

Mirrors the reference's fusion micro-benchmark configuration
(/root/reference/src/multiview_stitcher/_benchmarks/test_core.py:119-147):
a 3×3 grid of 100³-voxel 3D tiles with 20 px overlap, weighted-average fusion
with linear blending. The baseline is the reference's hot loop re-created
with scipy.ndimage (affine resample per view + EDT-proxy blending weights +
normalized weighted sum), timed on a subset of chunks and extrapolated —
i.e. the single-threaded dask-CPU per-task cost.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

# persistent compilation cache: amortize the slow remote TPU compiles across
# bench invocations
try:
    import jax

    os.makedirs("/root/repo/.jax_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # noqa: BLE001
    pass


# Worker-mode crash net: when set (by the supervisor, see _supervise),
# every log line also snapshots the measurement state to this file, and
# the final JSON line is written here instead of stdout — the supervisor
# prints it, and if the worker SEGFAULTS mid-run (observed live: XLA-CPU
# process-state segfaults on this 1-core box between scenarios) the
# supervisor emits from the last snapshot, so the round's record can
# never be information-free.
_STATE_FILE = os.environ.get("MVS_BENCH_STATE_FILE")


def _snapshot(final=None):
    if not _STATE_FILE:
        return
    try:
        snap = {
            "extras": _state["extras"],
            "cpu_rate": _state["cpu_rate"],
            "tpu_rate": _state["tpu_rate"],
            "final": final,
        }
        tmp = _STATE_FILE + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f, default=str)
        os.replace(tmp, _STATE_FILE)
    except Exception:  # noqa: BLE001 — the net must never break the run
        pass


def log(*args):
    print(*args, file=sys.stderr, flush=True)
    _snapshot()


# --------------------------------------------------------------------------
# Last-good ledger (VERDICT r4 item 1b): every successful bench run persists
# its DEVICE-measured telemetry (values + ISO timestamps + link speeds) to a
# git-tracked JSON file. When a later run finds the tunnel dead, the emitted
# JSON merges those fields under explicit ``last_good``/``last_good_at`` keys
# — measured earlier, clearly labeled, never substituted into ``value`` — so
# one bad weather window can no longer zero a whole round's evidence
# (BENCH_r04 recorded 0.0 with all r4 work existing only in PARITY.md).
# --------------------------------------------------------------------------

_LEDGER_PATH = os.environ.get("MVS_BENCH_LEDGER") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".bench_ledger.json"
)

# extras keys that are NOT device measurements (host-only / bookkeeping);
# everything else in extras is device-measured telemetry worth persisting
_HOST_ONLY_KEYS = {
    "cpu_baseline_mvox_s",
    "cpu_baseline_reg_s",
    "ns_entropy_floor_up_bits_per_vox",
    "ns_entropy_floor2_up_bits_per_vox",
    "backend_unavailable",
    "skipped_for_budget",
    "host_plan_edges_s",
    "host_plan_chunks_s",
    "probe_attempts",
}


def _utcnow_iso():
    import datetime

    return (
        datetime.datetime.now(datetime.timezone.utc)
        .replace(microsecond=0)
        .isoformat()
    )


def _load_ledger():
    try:
        with open(_LEDGER_PATH) as fh:
            return json.load(fh)
    except Exception:  # noqa: BLE001 — missing/corrupt ledger = no history
        return None


def _device_metrics_from_extras(extras):
    return {
        k: v
        for k, v in extras.items()
        if k not in _HOST_ONLY_KEYS
        and not k.startswith(("last_good", "best_measured"))
    }


# rate-class keys (higher = better) whose BEST measured value is worth
# keeping alongside the last-good: tunnel weather swings 4-50 MB/s minute
# to minute, so the capture-time number can understate the engineering by
# 3-5x. The best block is measured + per-key timestamped, never
# substituted into ``value`` — same honesty contract as last_good.
_BEST_TRACKED_PREFIXES = (
    "fuse_", "kernel_", "register_", "zarr_to_zarr_", "stitch_",
)
_BEST_TRACKED_KEYS = {
    "headline_mvox_s", "vs_baseline", "pairwise_reg_s", "reg_vs_cpu",
}


def _is_best_tracked(key):
    return key in _BEST_TRACKED_KEYS or key.startswith(
        _BEST_TRACKED_PREFIXES
    )


def _update_ledger(new_metrics):
    """Merge freshly measured device metrics into the ledger (per-key
    timestamps; newer values overwrite last_good, maxima update best).
    Atomic write."""
    if not new_metrics:
        return
    led = _load_ledger() or {"version": 1, "last_good": {"metrics": {}, "at": {}}}
    lg = led.setdefault("last_good", {"metrics": {}, "at": {}})
    best = led.setdefault("best", {"metrics": {}, "at": {}})
    now = _utcnow_iso()
    for k, v in new_metrics.items():
        lg.setdefault("metrics", {})[k] = v
        lg.setdefault("at", {})[k] = now
        if _is_best_tracked(k) and isinstance(v, (int, float)):
            prev = best.setdefault("metrics", {}).get(k)
            if prev is None or v > prev:
                best["metrics"][k] = v
                best.setdefault("at", {})[k] = now
    lg["updated_at"] = now
    tmp = _LEDGER_PATH + ".tmp"
    try:
        with open(tmp, "w") as fh:
            json.dump(led, fh, indent=1, sort_keys=True)
            fh.write("\n")
        os.replace(tmp, _LEDGER_PATH)
    except Exception as e:  # noqa: BLE001 — ledger is best-effort
        log(f"ledger write failed: {type(e).__name__}: {e}")


def _merge_last_good(extras):
    """Attach the ledger's last-good device telemetry to the outgoing JSON
    under explicit, clearly-labeled keys. Never touches ``value``."""
    led = _load_ledger()
    lg = (led or {}).get("last_good") or {}
    metrics = lg.get("metrics") or {}
    if not metrics:
        return
    extras["last_good"] = metrics
    at = lg.get("at") or {}
    if at:
        extras["last_good_at"] = max(at.values())
        if len(set(at.values())) > 1:
            extras["last_good_at_per_key"] = at
    elif lg.get("updated_at"):
        extras["last_good_at"] = lg["updated_at"]

def _merge_best(extras):
    """Attach the ledger's best-measured block (labeled, per-key
    timestamped) to the outgoing JSON — shipped on EVERY emit, so a
    bad-weather capture still carries the round's best measured device
    numbers next to the live ones. Never touches ``value``."""
    led = _load_ledger()
    best = (led or {}).get("best") or {}
    if best.get("metrics"):
        extras["best_measured"] = best["metrics"]
        if best.get("at"):
            extras["best_measured_at_per_key"] = best["at"]


def _smooth_tile(rng, shape, scale=1000.0, sigma=1.5):
    """Microscopy-like synthetic content: band-limited noise. White noise
    is adversarial for the delta link codec (residual entropy above raw)
    and unrepresentative — camera images are spatially correlated."""
    from scipy.ndimage import gaussian_filter

    d = gaussian_filter(rng.random(shape), sigma)
    d -= d.min()
    return (d * (scale / max(d.max(), 1e-9))).astype(np.uint16)


def _delta_entropy_bits(arr):
    """Shannon entropy (bits/value) of the link codec's zigzag delta
    residual stream for ``arr`` — the information-theoretic floor any
    entropy coder could reach on this wire content. The codec's
    fixed-width + exception scheme can't beat this; reporting it next to
    the achieved wire bits/vox shows how close the link is to the floor
    (VERDICT r3 item 2's 'done' condition)."""
    from multiview_stitcher_tpu.ops import link_codec

    flat = np.asarray(arr, dtype=np.uint16).reshape(-1)
    _, resid = link_codec.delta_encode_np(flat)
    counts = np.bincount(resid)
    p = counts[counts > 0] / resid.size
    return float(-(p * np.log2(p)).sum())


def _delta2_entropy_bits(arr):
    """Shannon entropy (bits/value) of the SECOND-difference residual
    stream (the delta2 candidate's floor — on smooth image content it
    sits ~1 bit below the first-order delta floor)."""
    from multiview_stitcher_tpu.ops import link_codec

    arr = np.asarray(arr, dtype=np.uint16)
    if not link_codec.delta2_eligible(arr.shape):
        return _delta_entropy_bits(arr)
    _, resid = link_codec.delta2_encode_np(
        arr.reshape(-1), int(arr.shape[-1])
    )
    counts = np.bincount(resid)
    p = counts[counts > 0] / resid.size
    return float(-(p * np.log2(p)).sum())


def _delta3_entropy_bits(arr):
    """Shannon entropy (bits/value) of the THIRD-difference residual
    stream (the delta3 candidate's floor — z-correlated volumes carry
    ~1 bit/vox less in d/dx d/dy d/dz than in the second difference)."""
    from multiview_stitcher_tpu.ops import link_codec

    arr = np.asarray(arr, dtype=np.uint16)
    if not link_codec.delta3_eligible(arr.shape):
        return _delta2_entropy_bits(arr)
    _, resid = link_codec.delta3_encode_np(
        arr.reshape(-1), int(arr.shape[-1]), int(arr.shape[-2])
    )
    counts = np.bincount(resid)
    p = counts[counts > 0] / resid.size
    return float(-(p * np.log2(p)).sum())


def make_grid_sims(n=3, tile=100, overlap=20, ndim=3, dtype=np.uint16):
    from multiview_stitcher_tpu import si_utils

    rng = np.random.default_rng(0)
    sims = []
    sdims = ["z", "y", "x"][-ndim:]
    grid = (1,) * (ndim - 2) + (n, n) if ndim == 3 else (n, n)
    grid = (n,) * ndim if ndim == 2 else (n, n, n)
    # reference bench: 3x3 grid in y/x, full z extent (single z position)
    grid = (1, n, n) if ndim == 3 else (n, n)
    step = tile - overlap
    for idx in np.ndindex(grid):
        data = _smooth_tile(rng, (tile,) * ndim).astype(dtype)
        translation = {
            d: float(idx[i] * step) for i, d in enumerate(sdims)
        }
        sims.append(
            si_utils.get_sim_from_array(
                data,
                dims=sdims,
                scale={d: 1.0 for d in sdims},
                translation=translation,
            )
        )
    return sims


def cpu_baseline_voxel_rate(sims, transform_key, n_sample_chunks=None,
                            chunksize=128):
    """Single-threaded scipy re-creation of the reference chunk task."""
    from scipy.ndimage import affine_transform

    from multiview_stitcher_tpu import mv_graph, si_utils, weights
    from multiview_stitcher_tpu.fusion import _core
    from multiview_stitcher_tpu.ops import resample as resample_ops

    sdims = si_utils.get_spatial_dims_from_sim(sims[0])
    ndim = len(sdims)
    params = [
        np.asarray(
            si_utils.get_affine_from_sim(s, transform_key).squeeze()
        )
        for s in sims
    ]
    osp = _core.process_output_stack_properties(
        sims, transform_key=transform_key
    )
    osp = {
        "shape": {d: int(osp["shape"][d]) for d in sdims},
        "spacing": {d: float(osp["spacing"][d]) for d in sdims},
        "origin": {d: float(osp["origin"][d]) for d in sdims},
    }
    ocs = {d: chunksize for d in sdims}
    chunk_bbs, block_indices = mv_graph.get_chunk_bbs(osp, ocs)
    views_bb = [si_utils.get_stack_properties_from_sim(s) for s in sims]
    plan = _core._build_spatial_fusion_plan(
        sparams=params,
        views_bb=views_bb,
        output_stack_properties=osp,
        output_chunksize=ocs,
        output_chunk_bbs=chunk_bbs,
        output_chunk_bbs_with_overlap=chunk_bbs,
        block_indices=block_indices,
        overlap_in_pixels={d: 0 for d in sdims},
        interpolation_order=1,
        sdims=sdims,
    )
    entries = [e for e in plan["per_chunk_entries"] if e["views"]]
    if n_sample_chunks is not None:
        # optionally sample the densest chunks for a faster (conservative) run
        entries = sorted(entries, key=lambda e: -len(e["views"]))[
            :n_sample_chunks
        ]

    voxels = 0
    t0 = time.perf_counter()
    for entry in entries:
        bb = entry["output_bb"]
        out_shape = tuple(int(bb["shape"][d]) for d in sdims)
        tvs, bws = [], []
        for iview, window in entry["views"]:
            sim = sims[iview]
            slab, slab_origin = _core._slab_from_sim(sim, window)
            m, o = resample_ops.physical_to_pixel_params(
                np.linalg.inv(params[iview]),
                input_spacing=np.array(
                    [views_bb[iview]["spacing"][d] for d in sdims]
                ),
                input_origin=np.array([slab_origin[d] for d in sdims]),
                output_spacing=np.array([bb["spacing"][d] for d in sdims]),
                output_origin=np.array([bb["origin"][d] for d in sdims]),
            )
            tv = affine_transform(
                slab.astype(np.float32), m, offset=o,
                output_shape=out_shape, order=1, mode="constant",
                cval=np.nan,
            )
            grid, gm, go = weights.blending_weights_pixel_params(
                bb, views_bb[iview], params[iview]
            )
            bw = affine_transform(
                grid, gm, offset=go, output_shape=out_shape, order=1,
                mode="constant", cval=0.0,
            )
            bw = np.asarray(weights.cosine_weights(bw))
            tvs.append(tv)
            bws.append(bw)
        tvs = np.stack(tvs)
        bws = np.stack(bws)
        bws = bws * ~np.isnan(tvs)
        wsum = np.nansum(bws, axis=0)
        wsum[wsum == 0] = 1
        bws = bws / wsum
        fused = np.nansum(tvs * bws, axis=0)
        fused = np.nan_to_num(fused).astype(sims[0].dtype)
        voxels += fused.size
    dt = time.perf_counter() - t0
    return voxels / dt


def tpu_fuse_rate(sims, transform_key, chunksize=128, repeats=5):
    """Warm repeated fuse(): tiles stay device-resident (the production
    regime of parameter refinement / re-fusion), downloads ride the packed
    link codec. Best-of-N because the tunnel bandwidth is volatile."""
    from multiview_stitcher_tpu import fusion

    # warm-up (compile + populate the device tile cache)
    fused = fusion.fuse(
        sims, transform_key=transform_key, output_chunksize=chunksize
    )
    out_voxels = int(np.prod(fused.shape))

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fused = fusion.fuse(
            sims, transform_key=transform_key, output_chunksize=chunksize
        )
        times.append(time.perf_counter() - t0)
    return out_voxels / min(times)


def fuse_affine_rate(n=2, tile=128, overlap=24, theta=0.04, repeats=3):
    """End-to-end fuse() of a ROTATED multi-view 3D layout (BASELINE
    config 4 class): rotation AROUND y — the light-sheet multiview
    geometry (reference czi_utils.py:707) — which on TPU routes through
    the EXACT Pallas affine tier (ops/exact_affine.py) by default.
    Warm repeats."""
    from multiview_stitcher_tpu import fusion, si_utils

    sims = make_grid_sims(n=n, tile=tile, overlap=overlap, ndim=3)
    c, s_ = np.cos(theta), np.sin(theta)
    rot = np.eye(4)
    rot[0, 0], rot[0, 2], rot[2, 0], rot[2, 2] = c, -s_, s_, c
    for i, s in enumerate(sims):
        si_utils.set_sim_affine(
            s, rot if i % 2 else np.eye(4), transform_key="affine"
        )
    fused = fusion.fuse(sims, transform_key="affine", output_chunksize=128)
    out_voxels = int(np.prod(fused.shape))
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        fusion.fuse(sims, transform_key="affine", output_chunksize=128)
        times.append(time.perf_counter() - t0)
    return out_voxels / min(times)


def register_grid_rate(n=6, tile=200, overlap=40, repeats=2):
    """End-to-end register() on an n x n 2D grid; returns edges/sec."""
    import time as _time

    from multiview_stitcher_tpu import msi_utils, registration, sample_data, si_utils

    sims = sample_data.generate_tiled_dataset(
        ndim=2, N_c=1, N_t=1, tile_size=tile, tiles_x=n, tiles_y=n,
        overlap=overlap, zoom=4, shift_scale=2.0, drift_scale=0.0,
    )
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    # warm-up (compiles the fused core for this crop shape)
    result = registration.register(
        msims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        reg_channel_index=0, pre_registration_pruning_method=None,
        return_dict=True,
    )
    n_edges = result["pairwise_registration"]["graph"].number_of_edges()
    times = []
    for _ in range(repeats):
        t0 = _time.perf_counter()
        registration.register(
            msims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
            reg_channel_index=0, pre_registration_pruning_method=None,
        )
        times.append(_time.perf_counter() - t0)
    return n_edges / min(times), n_edges



def _device_rate(call, fetch_tiny, vox_per_call, repeats=4, inner=6):
    """Device-side kernel rate with the tunnel latency amortized.

    A single dispatch+tiny-fetch round trip has a ~25-30 ms floor over the
    axon tunnel (CLAUDE.md), which swamps kernels that run in ~10 ms.
    Dispatch ``inner`` async calls per rep and force with ONE tiny fetch —
    the TPU queue serializes, so the fetch waits for all prior dispatches
    and the floor is paid once per ``inner`` kernels.
    """
    out = call()
    fetch_tiny(out)
    times = []
    for _i in range(repeats):
        t0 = time.perf_counter()
        for _j in range(inner):
            out = call()
        fetch_tiny(out)
        times.append(time.perf_counter() - t0)
    return inner * vox_per_call / min(times)


def pallas_kernel_rate_2d(repeats=5, V=16, tdim=2048):
    """Device-side 2D fused-kernel throughput (4x4 grid of 2048^2 tiles).

    Uploads ride the packed link codec (10-bit + delta) so the one-time
    tile staging survives bad tunnel weather."""
    from multiview_stitcher_tpu.ops import link_codec, pallas_fusion

    rng = np.random.default_rng(0)
    K = 4
    g = max(1, int(round(V ** 0.5)))
    tiles = link_codec.put_packed(
        rng.integers(0, 1000, (V, tdim, tdim)).astype(np.uint16)
    )
    _ = np.asarray(tiles[0, 0, :2])
    step = float(int(tdim * 0.8125))
    out_shape = (int((g - 1) * step) + tdim,) * 2
    tile_shape = (256, 256)
    n_t = [-(-out_shape[d] // tile_shape[d]) for d in range(2)]
    offs = np.zeros((V, 2), np.float32)
    for iy in range(g):
        for ix in range(g):
            if iy * g + ix < V:
                offs[iy * g + ix] = [-iy * step, -ix * step]
    view_idx = np.full(tuple(n_t) + (K,), -1, np.int32)
    view_idx[..., :K] = np.arange(K, dtype=np.int32)
    extents = np.full((V, 2), float(tdim), np.float32)
    wdiags = np.full((V, 2), 0.002, np.float32)
    woffs = np.zeros((V, 2), np.float32)
    wgrids = np.ones((V, 5, 5), np.float32)

    import jax.numpy as jnp

    dev = [jnp.asarray(a) for a in
           (view_idx, offs, extents, wdiags, woffs, wgrids)]
    for a in dev:
        a.block_until_ready()

    def call():
        return pallas_fusion.fuse_translation_2d(
            tiles, *dev,
            out_shape=out_shape, tile_shape=tile_shape, K=K,
            out_dtype=np.dtype(np.uint16),
        )

    return _device_rate(
        call, lambda o: np.asarray(o[0, :2]), int(np.prod(out_shape)),
        repeats=repeats,
    )


def pallas_kernel_rate(repeats=5, V=16, tdim=128):
    """Device-side fused-kernel throughput with resident tiles (4x4 grid of
    128^3 uint16 tiles): isolates the kernel from tunnel transfers.
    Uploads ride the packed link codec (weather-proof staging)."""
    from multiview_stitcher_tpu.ops import link_codec, pallas_fusion

    rng = np.random.default_rng(0)
    K = 8 if V >= 8 else V
    g = max(1, int(round(V ** 0.5)))
    tiles = link_codec.put_packed(
        rng.integers(0, 1000, (V, tdim, tdim, tdim)).astype(np.uint16)
    )
    _ = np.asarray(tiles[0, 0, 0, :2])  # force upload
    step = float(int(tdim * 0.8125))
    out_shape = (tdim, int((g - 1) * step) + tdim, int((g - 1) * step) + tdim)
    tile_shape = (8, 128, 256)
    n_t = [-(-out_shape[d] // tile_shape[d]) for d in range(3)]
    offs = np.zeros((V, 3), np.float32)
    for iy in range(g):
        for ix in range(g):
            if iy * g + ix < V:
                offs[iy * g + ix] = [0.0, -iy * step, -ix * step]
    view_idx = np.full(tuple(n_t) + (K,), -1, np.int32)
    view_idx[..., :K] = np.arange(K, dtype=np.int32)
    extents = np.full((V, 3), float(tdim), np.float32)
    wdiags = np.full((V, 3), 0.02, np.float32)
    woffs = np.zeros((V, 3), np.float32)
    wgrids = np.ones((V, 5, 5, 5), np.float32)

    import jax.numpy as jnp

    dev = [jnp.asarray(a) for a in
           (view_idx, offs, extents, wdiags, woffs, wgrids)]
    for a in dev:
        a.block_until_ready()

    def call():
        return pallas_fusion.fuse_translation_3d(
            tiles, *dev,
            out_shape=out_shape, tile_shape=tile_shape, K=K,
            out_dtype=np.dtype(np.uint16),
        )

    return _device_rate(
        call, lambda o: np.asarray(o[0, 0, :2]), int(np.prod(out_shape)),
        repeats=repeats,
    )


def _affine_layout(C=8, K=4, out_shape=(32, 128, 128), slab=(40, 136, 136),
                   rot_axis="z"):
    """Rotated 3D multi-view layout with resident slabs (BASELINE config 4
    class): small rotation + per-view offsets. ``rot_axis='z'`` couples
    (y, x) — the shear/gather tiers; ``rot_axis='y'`` couples (z, x) —
    the y-decoupled family the EXACT Pallas tier handles. Slabs stage
    through the packed link codec (uint16 wire, f32 on device)."""
    import jax.numpy as jnp

    from multiview_stitcher_tpu.ops import link_codec

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 1000, (C, K) + slab).astype(np.uint16)
    slabs = link_codec.put_packed(raw).astype(jnp.float32)
    _ = np.asarray(slabs[0, 0, 0, 0, :2])  # force upload
    th = 0.05
    c_, s_ = np.cos(th), np.sin(th)
    if rot_axis == "y":
        rot = np.array(
            [[c_, 0, -s_], [0, 1, 0], [s_, 0, c_]], np.float32
        )
    else:
        rot = np.array(
            [[1, 0, 0], [0, c_, -s_], [0, s_, c_]], np.float32
        )
    mats = np.broadcast_to(rot, (C, K, 3, 3)).copy()
    offs = rng.random((C, K, 3)).astype(np.float32) * 4
    wgrids = np.ones((C, K, 5, 5, 5), np.float32)
    wmats = np.broadcast_to(
        np.diag([0.1, 0.03, 0.03]).astype(np.float32), (C, K, 3, 3)
    ).copy()
    woffs = np.zeros((C, K, 3), np.float32)
    valid = np.ones((C, K), bool)
    return slabs, mats, offs, wgrids, wmats, woffs, valid, out_shape, slab


def _rate_loop(call, out_shape, C, repeats, inner=6):
    return _device_rate(
        call, lambda o: np.asarray(o[0, 0, 0, :2]),
        C * int(np.prod(out_shape)), repeats=repeats, inner=inner,
    )


def affine_kernel_rate(repeats=5):
    """Device-side throughput of the shear-decomposed affine tier
    (fusion/_core._fuse_chunk_batch_kernel_shear + ops/shear.py) on a
    rotated 3D layout with resident slabs — the fast path for
    non-translation params (BASELINE config 4 class)."""
    import jax.numpy as jnp

    from multiview_stitcher_tpu.fusion import _core
    from multiview_stitcher_tpu.ops import shear as shear_ops

    (slabs, mats, offs, wgrids, wmats, woffs, valid, out_shape,
     slab) = _affine_layout()
    C = slabs.shape[0]
    splan, sctx, _ = shear_ops.plan_shear(
        mats.reshape(-1, 3, 3), offs.reshape(-1, 3), slab, out_shape
    )
    wm4, wo4 = 4.0 * wmats, 4.0 * woffs
    wplan, wctx, _ = shear_ops.plan_shear(
        wm4.reshape(-1, 3, 3), wo4.reshape(-1, 3), (17,) * 3, out_shape
    )
    coeffs = sctx.coeffs(mats, offs)
    wcoeffs = wctx.coeffs(wm4, wo4)
    dev_args = [
        jnp.asarray(a)
        for a in (
            coeffs, mats, offs,
            np.broadcast_to(
                np.asarray(slab, np.float32), mats.shape[:2] + (3,)
            ).copy(),
            wgrids, wcoeffs, wm4, wo4, valid,
        )
    ]
    for a in dev_args:
        a.block_until_ready()

    def call():
        return _core._fuse_chunk_batch_kernel_shear(
            slabs, *dev_args, splan, wplan, out_shape,
            "weighted_average", True,
        )

    return _rate_loop(call, out_shape, C, repeats)


def affine_gather_kernel_rate(repeats=3):
    """Device-side throughput of the scipy-exact gather affine tier
    (fusion/_core._fuse_chunk_batch_kernel) — the fallback for maps the
    shear decomposition rejects."""
    import jax.numpy as jnp

    from multiview_stitcher_tpu.fusion import _core

    (slabs, mats, offs, wgrids, wmats, woffs, valid, out_shape,
     _slab) = _affine_layout()
    dev_args = [
        jnp.asarray(a)
        for a in (mats, offs, wgrids, wmats, woffs, valid)
    ]
    for a in dev_args:
        a.block_until_ready()

    def call():
        return _core._fuse_chunk_batch_kernel(
            slabs, *dev_args, out_shape, "weighted_average", True,
        )

    return _rate_loop(call, out_shape, slabs.shape[0], repeats, inner=1)


def exact_affine_kernel_rate(repeats=5):
    """Device-side throughput of the EXACT Pallas affine tier
    (fusion/_core._fuse_chunk_batch_kernel_exact + ops/exact_affine.py)
    on a rotate-around-y 3D layout with resident slabs — exactness AND
    speed for rotated multiview fuse() (VERDICT r3 item 3)."""
    import jax.numpy as jnp

    from multiview_stitcher_tpu.fusion import _core
    from multiview_stitcher_tpu.ops import exact_affine as ea_ops

    (slabs, mats, offs, wgrids, wmats, woffs, valid, out_shape,
     slab) = _affine_layout(rot_axis="y")
    C = slabs.shape[0]
    etile = (8, 32, 128)
    win = ea_ops.plan_windows_3d(mats.reshape(-1, 3, 3), etile)
    wwin = ea_ops.plan_windows_3d(wmats.reshape(-1, 3, 3), etile)
    extents = np.broadcast_to(
        np.asarray(slab, np.float32), mats.shape[:2] + (3,)
    ).copy()

    import jax as _jax

    interp = _jax.devices()[0].platform == "cpu"
    # params device-resident (per-call host->device of even tiny arrays
    # costs ms-class latency under tunnel weather)
    dev_args = [
        jnp.asarray(a)
        for a in (mats, offs, extents, wgrids, wmats, woffs, valid)
    ]
    for a in dev_args:
        a.block_until_ready()

    def call():
        return _core._fuse_chunk_batch_kernel_exact(
            slabs, *dev_args,
            out_shape, win, wwin, etile, "weighted_average", True,
            interpret=interp,
        )

    return _rate_loop(call, out_shape, C, repeats)


def exact_affine_kernel_rate_small(repeats=3):
    """Floor variant of :func:`exact_affine_kernel_rate`: ~2 MB packed
    upload (2x2 chunks of small slabs) so the metric records even on a
    sub-MB/s link. Measured 246 Mvox/s on v5e at the full layout; the
    small layout under-reports (less batch amortization) but proves the
    tier and always lands a number."""
    import jax as _jax
    import jax.numpy as jnp

    from multiview_stitcher_tpu.fusion import _core
    from multiview_stitcher_tpu.ops import exact_affine as ea_ops
    from multiview_stitcher_tpu.ops import link_codec

    rng = np.random.default_rng(0)
    C, K = 2, 2
    slab = (24, 72, 72)
    out_shape = (16, 64, 128)
    raw = rng.integers(0, 1000, (C, K) + slab).astype(np.uint16)
    slabs = link_codec.put_packed(raw).astype(jnp.float32)
    _ = np.asarray(slabs[0, 0, 0, 0, :2])
    th = 0.05
    c_, s_ = np.cos(th), np.sin(th)
    rot = np.array([[c_, 0, -s_], [0, 1, 0], [s_, 0, c_]], np.float32)
    mats = np.broadcast_to(rot, (C, K, 3, 3)).copy()
    etile = (8, 32, 128)
    win = ea_ops.plan_windows_3d(mats.reshape(-1, 3, 3), etile)
    wmats = np.broadcast_to(
        np.diag([0.1, 0.03, 0.03]).astype(np.float32), (C, K, 3, 3)
    ).copy()
    wwin = ea_ops.plan_windows_3d(wmats.reshape(-1, 3, 3), etile)
    dev_args = [
        jnp.asarray(a)
        for a in (
            mats,
            rng.random((C, K, 3)).astype(np.float32) * 4,
            np.broadcast_to(np.asarray(slab, np.float32), (C, K, 3)).copy(),
            np.ones((C, K, 5, 5, 5), np.float32),
            wmats,
            np.zeros((C, K, 3), np.float32),
            np.ones((C, K), bool),
        )
    ]
    for a in dev_args:
        a.block_until_ready()
    interp = _jax.devices()[0].platform == "cpu"

    def call():
        return _core._fuse_chunk_batch_kernel_exact(
            slabs, *dev_args, out_shape, win, wwin, etile,
            "weighted_average", True, interpret=interp,
        )

    return _rate_loop(call, out_shape, C, repeats)


def exact_affine_general_kernel_rate(repeats=3):
    """Device-side throughput of the GENERAL exact 3D affine kernel
    (ops/exact_affine.exact_affine_batch_3d_general) on fully coupled
    maps — the affine-groupwise-resolution family that previously fell
    to the 0.7 Mvox/s gather tier (VERDICT r4 items 3-4; target
    >=10 Mvox/s). ~2 MB packed upload so the metric records even on a
    degraded link."""
    import jax as _jax
    import jax.numpy as jnp

    from multiview_stitcher_tpu.fusion import _core
    from multiview_stitcher_tpu.ops import exact_affine as ea_ops
    from multiview_stitcher_tpu.ops import link_codec

    rng = np.random.default_rng(0)
    C, K = 2, 2
    slab = (24, 72, 72)
    out_shape = (16, 64, 128)
    raw = rng.integers(0, 1000, (C, K) + slab).astype(np.uint16)
    slabs = link_codec.put_packed(raw).astype(jnp.float32)
    _ = np.asarray(slabs[0, 0, 0, 0, :2])
    # rotate-around-y composed with ~1e-2 couplings in every entry
    th = 0.05
    c_, s_ = np.cos(th), np.sin(th)
    rot = np.array([[c_, 0, -s_], [0, 1, 0], [s_, 0, c_]], np.float32)
    rot += rng.uniform(0.005, 0.02, (3, 3)).astype(np.float32)
    mats = np.broadcast_to(rot, (C, K, 3, 3)).copy()
    assert not ea_ops.is_y_decoupled(mats.reshape(-1, 3, 3))
    etile = (8, 4, 32)
    win = ea_ops.plan_windows_3d_general(mats.reshape(-1, 3, 3), etile)
    wmats = np.broadcast_to(
        np.diag([0.1, 0.03, 0.03]).astype(np.float32), (C, K, 3, 3)
    ).copy()
    wwin = ea_ops.plan_windows_3d_general(wmats.reshape(-1, 3, 3), etile)
    dev_args = [
        jnp.asarray(a)
        for a in (
            mats,
            rng.random((C, K, 3)).astype(np.float32) * 4,
            np.broadcast_to(np.asarray(slab, np.float32), (C, K, 3)).copy(),
            np.ones((C, K, 5, 5, 5), np.float32),
            wmats,
            np.zeros((C, K, 3), np.float32),
            np.ones((C, K), bool),
        )
    ]
    for a in dev_args:
        a.block_until_ready()
    interp = _jax.devices()[0].platform == "cpu"

    def call():
        return _core._fuse_chunk_batch_kernel_exact(
            slabs, *dev_args, out_shape, win, wwin, etile,
            "weighted_average", True, kind3d="general", interpret=interp,
        )

    return _rate_loop(call, out_shape, C, repeats)


def stitch_rate(n=3, tile=100, overlap=20, repeats=2):
    """End-to-end single-upload stitch(): register from device-resident
    tiles -> resolve -> fuse from the SAME residency (VERDICT r4 item 2 —
    the reference runs register and fuse as separate passes over the same
    data, registration.py:2227 + fusion/_core.py:1068). Voxel rate =
    fused output voxels / wall time of the full pipeline; each repeat
    clears the device tile cache so the tile upload is paid (once)."""
    from multiview_stitcher_tpu import stitch as stitch_mod
    from multiview_stitcher_tpu.fusion import _core

    best = 0.0
    for _ in range(repeats):
        _core.clear_device_tile_cache()
        sims = make_grid_sims(n=n, tile=tile, overlap=overlap, ndim=3)
        t0 = time.perf_counter()
        fused = stitch_mod.stitch(
            sims,
            register_kwargs=dict(pre_registration_pruning_method=None),
        )
        arr = np.asarray(fused.data)
        dt = time.perf_counter() - t0
        assert arr.max() > 0
        best = max(best, arr.size / dt)
    return best


def pairwise_reg_floor_rate(n_pairs=128, crop=(128, 128), repeats=2):
    """Weather-proof registration throughput floor (VERDICT r3 item 1a):
    ONE pre-bucketed pair batch, uint16 crops staged once through the
    packed link codec (<6 MB wire), per-rep inputs perturbed ON DEVICE
    (zero further uploads), execution forced with a tiny fetch. The
    compiled shape matches the production register() bucket so the
    persistent cache serves it. Returns pairs/second."""
    import jax.numpy as jnp

    from multiview_stitcher_tpu import registration
    from multiview_stitcher_tpu.ops import link_codec

    rng = np.random.default_rng(3)
    f16 = rng.integers(0, 1000, (n_pairs,) + crop).astype(np.uint16)
    m16 = rng.integers(0, 1000, (n_pairs,) + crop).astype(np.uint16)
    f = link_codec.put_packed(f16).astype(jnp.float32) / 1000.0
    m = link_codec.put_packed(m16).astype(jnp.float32) / 1000.0
    _ = np.asarray(f[0, 0, :2])
    _ = np.asarray(m[0, 0, :2])

    def run(mv):
        shifts, quals = registration._pcc_register_core_batch(
            f, mv, upsample_factor=10
        )
        # tiny fetch forces the whole batch (block_until_ready is a
        # no-op under the tunnel)
        return float(np.asarray(shifts[0, 0])), float(np.asarray(quals[0]))

    run(m)  # compile (persistent-cache hit on warm rounds)
    times = []
    for rep in range(repeats):
        mv = m + jnp.float32(1e-4 * (rep + 1))  # on-device perturbation
        t0 = time.perf_counter()
        run(mv)
        times.append(time.perf_counter() - t0)
    return n_pairs / min(times)


def cpu_pairwise_reg_rate(n_pairs=8, crop=(128, 128)):
    """Single-thread CPU baseline for pairwise registration: one
    skimage-equivalent phase_cross_correlation (full FFT cross-power +
    x10 upsampled-DFT refinement, numpy) per pair — the per-pair compute
    of the reference's pipeline (registration.py:445, via skimage),
    charitably excluding its SSIM candidate disambiguation. Returns
    pairs/second (best of 2 sweeps)."""
    im2pi = 1j * 2 * np.pi
    upsample_factor = 10

    def upsampled_dft(data, ups_size, offsets):
        for n_items, ax_offset in list(zip(data.shape, offsets))[::-1]:
            kernel = np.exp(
                -im2pi
                * (np.arange(ups_size) - ax_offset)[:, None]
                * np.fft.fftfreq(n_items, upsample_factor)
            )
            data = np.tensordot(kernel, data, axes=(1, -1))
        return data

    def pcc(ref, mov):
        product = np.fft.fftn(ref) * np.fft.fftn(mov).conj()
        eps = np.finfo(product.real.dtype).eps
        product /= np.maximum(np.abs(product), 100 * eps)
        cc = np.fft.ifftn(product)
        maxima = np.unravel_index(np.argmax(np.abs(cc)), cc.shape)
        midpoint = np.array([np.fix(s / 2) for s in ref.shape])
        shift = np.stack(maxima).astype(np.float64)
        shift[shift > midpoint] -= np.array(ref.shape)[shift > midpoint]
        shift = np.round(shift * upsample_factor) / upsample_factor
        ups_size = int(np.ceil(upsample_factor * 1.5))
        dftshift = np.fix(ups_size / 2.0)
        cc_up = upsampled_dft(
            product.conj(), ups_size, dftshift - shift * upsample_factor
        ).conj()
        maxima = np.unravel_index(np.argmax(np.abs(cc_up)), cc_up.shape)
        return shift + (np.stack(maxima) - dftshift) / upsample_factor

    rng = np.random.default_rng(3)
    f = rng.random((n_pairs,) + crop).astype(np.float32)
    m = rng.random((n_pairs,) + crop).astype(np.float32)
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(n_pairs):
            pcc(f[i], m[i])
        best = max(best, n_pairs / (time.perf_counter() - t0))
    return best


def pairwise_reg_rate(n_pairs=128, crop=(128, 128), upload_pairs=128,
                      repeats=3):
    """Full pairwise-registration core (3 PCC proposals + candidate SSIM
    disambiguation + Spearman quality) per second, device-resident crops.

    Defaults to the long-minted 128-pair compiled shape so the scenario
    always lands a number; pass ``n_pairs=512`` (production MAX_B,
    registration.py:1700) for the latency-amortized variant once its
    compile is in the persistent cache — the tunnel's compile channel
    can stall for hours, so never make the default depend on a fresh
    remote compile. Only ``upload_pairs`` crops cross the wire (packed,
    <6 MB) — the batch is grown to ``n_pairs`` ON DEVICE with per-copy
    perturbations, so the measured rate is dispatch+kernel+fetch, not
    upload weather.

    Results are fetched (np.asarray) to force execution — under tunneled
    accelerators block_until_ready is a no-op and would time dispatch only.
    """
    import jax.numpy as jnp

    from multiview_stitcher_tpu import registration
    from multiview_stitcher_tpu.ops import link_codec

    rng = np.random.default_rng(3)
    f0 = link_codec.put_packed(
        rng.integers(0, 1000, (upload_pairs,) + crop).astype(np.uint16)
    ).astype(jnp.float32) / 1000.0
    m0 = link_codec.put_packed(
        rng.integers(0, 1000, (upload_pairs,) + crop).astype(np.uint16)
    ).astype(jnp.float32) / 1000.0
    reps = -(-n_pairs // upload_pairs)
    f = jnp.concatenate(
        [f0 + jnp.float32(1e-5 * k) for k in range(reps)]
    )[:n_pairs]
    m = m0
    _ = np.asarray(f[0, 0, :2])

    def run(mv):
        shifts, quals = registration._pcc_register_core_batch(
            f, mv, upsample_factor=10
        )
        return np.asarray(shifts), np.asarray(quals)

    def grow(base, rep):
        return jnp.concatenate(
            [base + jnp.float32(1e-4 * (rep * reps + k + 1))
             for k in range(reps)]
        )[:n_pairs]

    run(grow(m, 0))
    times = []
    for rep in range(1, repeats + 1):
        mv = grow(m, rep)  # on-device perturbation
        _ = np.asarray(mv[0, 0, :2])  # force mv before the timed region
        t0 = time.perf_counter()
        run(mv)
        times.append(time.perf_counter() - t0)
    return n_pairs / min(times)


def large_zarr_to_zarr_rate(extras, n=32, tile=64, overlap=12, chunksize=128,
                            deadline_cold_s=150.0, deadline_warm_s=120.0):
    """North-star scenario (BASELINE.md): 1024-tile 3D grid, zarr->zarr,
    through the banded streaming pipeline (fusion/_streaming.py).

    Input tiles are zarr arrays on disk; output streams to a zarr store.
    Writes ~1.5 GB under .bench_large/ (tiles persist across runs) and
    moves ~570 MB packed over the device link on the cold pass; the warm
    pass re-runs the same fuse() call with device-resident tiles
    (downloads only). Each rep carries a hard deadline threaded into the
    streaming band loop, so a weather-stalled run aborts in bounded time
    and still reports the achieved rate plus measured link telemetry
    (VERDICT r2 item 1). Records into ``extras``:
    zarr_to_zarr_cold_mvox_s / zarr_to_zarr_warm_mvox_s (partial rates if
    aborted), ns_up_mb / ns_down_mb / ns_bands / ns_link_mb_s / ns_aborted.

    Returns the best completed-rep rate (0.0 if every rep aborted).
    """
    import shutil

    from multiview_stitcher_tpu import fusion, si_utils
    from multiview_stitcher_tpu.fusion import _streaming
    from multiview_stitcher_tpu.io import zarr_backend

    root = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".bench_large")
    # content v2: smooth microscopy-like tiles (see _smooth_tile); bump
    # the marker to invalidate stores generated with white-noise content
    marker = os.path.join(root, ".content_v2")
    if not os.path.exists(marker):
        import shutil as _sh

        _sh.rmtree(root, ignore_errors=True)
        os.makedirs(root, exist_ok=True)
        with open(marker, "w") as fh:
            fh.write("smooth tiles\n")
    rng = np.random.default_rng(0)
    step = tile - overlap
    base = _smooth_tile(rng, (tile,) * 3)
    sims = []
    for iy in range(n):
        for ix in range(n):
            url = f"{root}/tile_{iy}_{ix}.zarr"
            if not os.path.exists(url):
                arr = zarr_backend.create_zarr_array(
                    url, shape=(tile,) * 3, dtype="uint16",
                    chunks=(tile,) * 3,
                )
                arr[...] = np.roll(base, (iy * 7 + ix * 3) % tile, axis=2)
            sims.append(si_utils.get_sim_from_array(
                zarr_backend.open_zarr_array(url), dims=("z", "y", "x"),
                translation={"z": 0.0, "y": float(iy * step),
                             "x": float(ix * step)},
            ))
    out_url = f"{root}/fused_bench.zarr"

    # information-theoretic floor of the upload side: the entropy of the
    # delta residual stream of the (representative) tile content. The
    # download side's floor is computed from the fused output after a
    # completed rep.
    extras["ns_entropy_floor_up_bits_per_vox"] = round(
        _delta_entropy_bits(base), 2
    )
    extras["ns_entropy_floor2_up_bits_per_vox"] = round(
        _delta2_entropy_bits(base), 2
    )
    extras["ns_entropy_floor3_up_bits_per_vox"] = round(
        _delta3_entropy_bits(base), 2
    )

    def one_rep(label, key, deadline_s):
        shutil.rmtree(out_url, ignore_errors=True)
        os.environ["MVS_TPU_STREAM_DEADLINE_S"] = str(deadline_s)
        t0 = time.perf_counter()
        try:
            out = fusion.fuse(
                sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
                output_chunksize=chunksize, output_zarr_url=out_url,
            )
            dt = time.perf_counter() - t0
            rate = int(np.prod(out.shape)) / dt
            aborted = False
        except _streaming.StreamingDeadlineError as e:
            dt = time.perf_counter() - t0
            rate = e.telemetry["voxels_written"] / max(dt, 1e-9)
            aborted = True
        finally:
            os.environ.pop("MVS_TPU_STREAM_DEADLINE_S", None)
        tele = dict(_streaming.last_telemetry)
        extras[key] = round(rate / 1e6, 3)
        mb = (tele.get("up_bytes", 0) + tele.get("down_bytes", 0)) / 1e6
        extras["ns_up_mb"] = round(tele.get("up_bytes", 0) / 1e6, 1)
        extras["ns_down_mb"] = round(tele.get("down_bytes", 0) / 1e6, 1)
        extras["ns_bands"] = (
            f"{tele.get('bands_done', 0)}/{tele.get('bands_total', 0)}"
        )
        if tele.get("wire_bits_per_vox") is not None:
            # wire cost per fused voxel (both directions): distance to the
            # link's information-theoretic floor (VERDICT r3 item 2)
            extras["ns_wire_bits_per_vox"] = round(
                tele["wire_bits_per_vox"], 2
            )
        if tele.get("up_delta_batches") or tele.get("down_delta_bands"):
            extras["ns_delta_up_batches"] = tele.get("up_delta_batches", 0)
            extras["ns_delta_down_bands"] = tele.get("down_delta_bands", 0)
        if tele.get("up_delta2_batches") or tele.get("down_delta2_bands"):
            # second-difference candidate engaged (subset of the above)
            extras["ns_delta2_up_batches"] = tele.get("up_delta2_batches", 0)
            extras["ns_delta2_down_bands"] = tele.get("down_delta2_bands", 0)
        if tele.get("up_delta3_batches") or tele.get("down_delta3_bands"):
            # third-difference candidate engaged (subset of the above)
            extras["ns_delta3_up_batches"] = tele.get("up_delta3_batches", 0)
            extras["ns_delta3_down_bands"] = tele.get("down_delta3_bands", 0)
        if tele.get("up_batches_reused"):
            # warm rep resumed from the cold rep's stashed uploads
            extras["ns_up_reused_batches"] = tele["up_batches_reused"]
        if tele.get("up_batches_reused_packed"):
            extras["ns_up_reused_packed"] = tele["up_batches_reused_packed"]
        if tele.get("up_batches_resident"):
            # warm rep gathered batches from the seeded device tile cache
            extras["ns_up_resident_batches"] = tele["up_batches_resident"]
        extras["ns_link_mb_s"] = round(mb / max(dt, 1e-9), 1)
        extras["ns_aborted"] = extras.get("ns_aborted", False) or aborted
        if not aborted and "ns_entropy_floor_down_bits_per_vox" not in extras:
            try:
                # the fused store is multiscale NGFF: full res is level /0
                try:
                    fused_arr = zarr_backend.open_zarr_array(f"{out_url}/0")
                except FileNotFoundError:
                    fused_arr = zarr_backend.open_zarr_array(out_url)
                slab = np.asarray(
                    fused_arr[: min(chunksize, fused_arr.shape[0])][
                        :, : 4 * chunksize, : 4 * chunksize
                    ]
                )
                extras["ns_entropy_floor_down_bits_per_vox"] = round(
                    _delta_entropy_bits(slab), 2
                )
                extras["ns_entropy_floor2_down_bits_per_vox"] = round(
                    _delta2_entropy_bits(slab), 2
                )
                extras["ns_entropy_floor3_down_bits_per_vox"] = round(
                    _delta3_entropy_bits(slab), 2
                )
            except Exception:  # noqa: BLE001 — telemetry only
                pass
        log(
            f"  zarr->zarr {label}: {dt:.1f}s = {rate / 1e6:.2f} Mvox/s"
            f"{' (DEADLINE ABORT)' if aborted else ''} "
            f"[{mb:.0f} MB moved = {mb / max(dt, 1e-9):.1f} MB/s link]"
        )
        return 0.0 if aborted else rate

    best = one_rep("cold", "zarr_to_zarr_cold_mvox_s", deadline_cold_s)
    # cold-excl-compile (VERDICT r3 item 7): data caches cleared (every
    # wire byte paid again) but the jit chain stays compiled — voxel
    # throughput without the one-time compile cost the cold rep conflates
    from multiview_stitcher_tpu.fusion import _core as _fcore

    _fcore.clear_device_tile_cache()
    _streaming._upload_stash.clear()
    best = max(
        best,
        one_rep(
            "cold-excl-compile", "zarr_to_zarr_cold_excl_compile_mvox_s",
            deadline_warm_s,
        ),
    )
    best = max(
        best, one_rep("warm", "zarr_to_zarr_warm_mvox_s", deadline_warm_s)
    )
    return best, n * n


_state = {"extras": None, "cpu_rate": None, "tpu_rate": 0.0, "done": False}


def _emit():
    """Print the single JSON result line from whatever has been measured
    so far (also called from the SIGTERM handler so an outer timeout still
    yields a recorded result)."""
    if _state["done"] or _state["extras"] is None:
        return
    _state["done"] = True
    cpu_rate = _state["cpu_rate"] or 1.0
    tpu_rate = _state["tpu_rate"]
    extras = _state["extras"]
    # persist device-measured telemetry for future bad-weather rounds, and
    # when THIS run has no device headline, surface the last good one
    # (labeled, never substituted into value)
    try:
        if tpu_rate <= 0:
            # merge BEFORE updating, so last_good reflects prior runs
            _merge_last_good(extras)
        dev = _device_metrics_from_extras(extras)
        if tpu_rate > 0:
            dev["headline_mvox_s"] = round(tpu_rate / 1e6, 3)
            dev["vs_baseline"] = round(tpu_rate / cpu_rate, 3)
        _update_ledger(dev)
        _merge_best(extras)  # after update: includes this run's maxima
    except Exception as e:  # noqa: BLE001 — emission must never fail
        log(f"ledger step failed: {type(e).__name__}: {e}")
    line = json.dumps(
        {
            "metric": "fused_voxel_throughput",
            "value": round(tpu_rate / 1e6, 3),
            "unit": "Mvox/s/chip",
            "vs_baseline": round(tpu_rate / cpu_rate, 3),
            **_state["extras"],
        }
    )
    if _STATE_FILE:
        # worker mode: the supervisor prints the one JSON line
        _snapshot(final=line)
    else:
        print(line, flush=True)


def _install_term_handler():
    import signal

    def handler(signum, frame):
        log(f"signal {signum}: emitting partial results")
        _emit()
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, handler)
        except Exception:  # noqa: BLE001
            pass


def _device_probe_subprocess(timeout_s):
    """One device-liveness probe in a FRESH subprocess.

    A hung backend init inside this process would hold jax's init lock and
    serialize every later probe behind it (CLAUDE.md: the tunnel's channels
    can stall network-silent); a subprocess probe times out cleanly and
    leaves the parent untouched."""
    import subprocess

    code = (
        "import jax, numpy as np;"
        "x = jax.numpy.ones((8, 8), np.float32);"
        "print(float(np.asarray(x + 1.0).sum()))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, timeout=timeout_s,
        )
        return r.returncode == 0 and b"128.0" in r.stdout
    except Exception:  # noqa: BLE001 — timeout or spawn failure = dead
        return False


def host_plan_rate(n=32, tile=64, overlap=12):
    """Host-side planning throughput (no device): adjacency graph over an
    n x n grid -> edges/s, plus the 1024-tile fusion chunk plan -> chunks/s.
    Runs as a between-probe filler so a dead-tunnel round still records the
    host half of the pipeline (VERDICT r4 item 1a)."""
    from multiview_stitcher_tpu import msi_utils, mv_graph, si_utils
    from multiview_stitcher_tpu.fusion import _core

    step = tile - overlap
    data = np.zeros((tile,) * 3, np.uint16)
    sims = [
        si_utils.get_sim_from_array(
            data, dims=("z", "y", "x"),
            translation={"z": 0.0, "y": float(iy * step),
                         "x": float(ix * step)},
        )
        for iy in range(n) for ix in range(n)
    ]
    sdims = ("z", "y", "x")
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]
    t0 = time.perf_counter()
    g = mv_graph.build_view_adjacency_graph_from_msims(
        msims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY
    )
    edges_s = g.number_of_edges() / (time.perf_counter() - t0)
    params = [
        np.asarray(
            si_utils.get_affine_from_sim(
                s, si_utils.DEFAULT_TRANSFORM_KEY
            ).squeeze()
        )
        for s in sims
    ]
    osp = _core.process_output_stack_properties(
        sims, transform_key=si_utils.DEFAULT_TRANSFORM_KEY
    )
    ocs = {d: 128 for d in sdims}
    chunk_bbs, block_indices = mv_graph.get_chunk_bbs(osp, ocs)
    views_bb = [si_utils.get_stack_properties_from_sim(s) for s in sims]
    t0 = time.perf_counter()
    plan = _core._build_spatial_fusion_plan(
        sparams=params, views_bb=views_bb, output_stack_properties=osp,
        output_chunksize=ocs, output_chunk_bbs=chunk_bbs,
        output_chunk_bbs_with_overlap=chunk_bbs,
        block_indices=block_indices,
        overlap_in_pixels={d: 0 for d in sdims},
        interpolation_order=1, sdims=sdims,
    )
    chunks_s = len(plan["per_chunk_entries"]) / (time.perf_counter() - t0)
    return edges_s, chunks_s


def _probe_device_schedule(extras, base_tile):
    """VERDICT r4 item 1a: never write the device off on one probe.

    Three subprocess probes spread across the run, with the CPU-side phases
    (cpu pairwise-reg baseline, upload entropy floor, host planning rates)
    and a bounded wait run BETWEEN probes — a transient tunnel outage gets
    several minutes to clear, and a genuinely dead round still records the
    host half of every axis. Returns True when the device answered."""

    def _fillers_a():
        cr = _bounded("cpu pairwise reg", cpu_pairwise_reg_rate, 60)
        if cr:
            extras["cpu_baseline_reg_s"] = round(cr, 1)
        extras["ns_entropy_floor_up_bits_per_vox"] = round(
            _delta_entropy_bits(base_tile), 2
        )

    def _fillers_b():
        r = _bounded("host planning", host_plan_rate, 120)
        if r is not None:
            edges_s, chunks_s = r
            log(
                f"host planning: {edges_s:.0f} edges/s adjacency, "
                f"{chunks_s:.0f} chunks/s fusion plan (1024 tiles)"
            )
            extras["host_plan_edges_s"] = round(edges_s, 1)
            extras["host_plan_chunks_s"] = round(chunks_s, 1)

    def _fillers_c():
        # last chance: give the weather a bounded window to clear
        log("device still unreachable; waiting 120 s before final probe")
        time.sleep(120)

    for i, (timeout_s, filler) in enumerate(
        [(90, _fillers_a), (150, _fillers_b), (210, _fillers_c)]
    ):
        log(f"device probe {i + 1}/3 (subprocess, {timeout_s:.0f}s)...")
        if _device_probe_subprocess(timeout_s):
            extras["probe_attempts"] = i + 1
            log(f"device answered on probe {i + 1}")
            return True
        filler()
    extras["probe_attempts"] = 3
    return False


def _bounded(label, fn, timeout_s, *args, **kwargs):
    """Run one sub-bench in a worker thread with a hard timeout.

    Under tunnel weather any single transfer can stall for minutes
    (CLAUDE.md); r02 lost every device-side number to one stalled
    scenario. A timed-out bench is abandoned (its thread keeps running,
    daemonic) and the remaining benches still record. Returns the result
    or None.
    """
    from concurrent.futures import ThreadPoolExecutor

    ex = ThreadPoolExecutor(1)
    try:
        return ex.submit(fn, *args, **kwargs).result(timeout=timeout_s)
    except TimeoutError:
        log(f"{label}: TIMED OUT after {timeout_s:.0f}s (abandoned)")
        return None
    except Exception as e:  # noqa: BLE001
        log(f"{label} failed: {type(e).__name__}: {e}")
        return None
    finally:
        ex.shutdown(wait=False)


def main():
    from multiview_stitcher_tpu import si_utils

    extras = {}
    _state["extras"] = extras
    _install_term_handler()

    # link-health telemetry: the tunnel's bandwidth swings 1-165 MB/s by
    # weather; record it so a degraded run is self-explaining. Runs in a
    # bounded worker thread and measures through the multi-stream codec
    # (the path production transfers actually take) — a single-stream
    # probe can itself hang for minutes in catastrophic weather.
    def _probe_link():
        import jax as _jax

        from multiview_stitcher_tpu.ops import link_codec

        probe = np.random.default_rng(0).integers(
            0, 1000, (4, 1024, 1024)
        ).astype(np.uint16)  # 8 MB raw, 5 MB packed
        t0 = time.perf_counter()
        dev = link_codec.put_packed(probe, nbits=10)
        np.asarray(dev[0, 0, :2])  # force
        up_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        link_codec.fetch_packed(dev, nbits=10)
        down_s = time.perf_counter() - t0
        return round(5 / max(up_s, 1e-9), 1), round(5 / max(down_s, 1e-9), 1)

    try:
        from concurrent.futures import ThreadPoolExecutor as _TPE

        _ex = _TPE(1)
        try:
            up_rate, down_rate = _ex.submit(_probe_link).result(timeout=90)
        finally:
            # never join a hung probe thread: the bench must proceed
            _ex.shutdown(wait=False)
        extras["link_up_mb_s"] = up_rate
        extras["link_down_mb_s"] = down_rate
        log(
            f"link probe (packed, multi-stream): up {up_rate} MB/s, "
            f"down {down_rate} MB/s"
        )
    except Exception as e:  # noqa: BLE001
        log(f"link probe skipped: {type(e).__name__}")

    transform_key = si_utils.DEFAULT_TRANSFORM_KEY
    log("generating 3x3 grid of 100^3 tiles (20 px overlap)...")
    sims = make_grid_sims(n=3, tile=100, overlap=20, ndim=3)

    # give the CPU its best case: a few timings, keep the fastest
    log("timing CPU (scipy single-thread) baseline (best of 2)...")
    cpu_rate = max(
        cpu_baseline_voxel_rate(sims, transform_key) for _ in range(2)
    )
    log(f"cpu baseline: {cpu_rate / 1e6:.2f} Mvox/s")
    extras["cpu_baseline_mvox_s"] = round(cpu_rate / 1e6, 3)
    _state["cpu_rate"] = cpu_rate

    # fail-fast when the device is unreachable: backend setup errors can
    # take minutes to surface, and a dead tunnel would otherwise make
    # EVERY scenario below eat its full watchdog timeout (~1 h of
    # nothing). But never on ONE probe (BENCH_r04 recorded 0.0 off a
    # single coin-flip): three subprocess probes spread across the run,
    # CPU-side phases + a bounded wait between them, and when all three
    # fail the JSON ships with the CPU baselines, host planning rates,
    # entropy floors AND the last-good device ledger — self-explaining
    # and never information-free (VERDICT r4 item 1).
    if "link_up_mb_s" not in extras:
        alive = _probe_device_schedule(
            extras, _smooth_tile(np.random.default_rng(0), (64,) * 3)
        )
        if not alive:
            log("device unreachable after 3 probes: emitting "
                "CPU+last-good result")
            extras["backend_unavailable"] = True
            _emit()
            return

    # cheap, high-information benches run FIRST; the streaming scenario —
    # which in bad tunnel weather can stall for its whole deadline — runs
    # LAST, so a truncated run still records everything else (r02 lost all
    # device-side telemetry to one 1520 s streaming rep). Every sub-bench
    # is additionally bounded by a watchdog timeout, and a TOTAL budget
    # governor reserves a slot for the north-star scenario: when weather
    # makes mid-tier benches eat their watchdogs, later mid-tiers are
    # skipped rather than starving the brief's one named number.
    fallback_rate = 0.0  # warm in-memory fuse(): headline only if the
    # north-star scenario never records

    cold_dl = float(os.environ.get("MVS_BENCH_NS_DEADLINE_S", 150))
    # the driver's outer timeout is ~30 min (r02 hit rc=124 at ~31 min of
    # wall time); startup + link probe + grid gen + CPU baseline spend up
    # to ~6 min before this clock starts, so the post-baseline budget must
    # keep worst case (every mid-tier eating its watchdog) under ~26 min
    total_budget_s = float(
        os.environ.get("MVS_BENCH_TOTAL_BUDGET_S", 1200)
    )
    # reserve: degraded floor pass (reg/kernel/fuse/register floors) +
    # north-star watchdog (cold + cold-excl-compile + warm) + margin
    ns_reserve_s = 2.6 * cold_dl + 240 + 240
    t_bench0 = time.perf_counter()
    # bad weather (probe dead or <1 MB/s down): benches will mostly hit
    # their watchdogs anyway — halve them so the run records the weather
    # and still reaches the end inside the driver's budget
    weather = (
        0.5
        if extras.get("link_down_mb_s", 0.0) < 1.0
        else 1.0
    )
    if weather < 1.0:
        log("degraded link: mid-tier watchdogs halved")

    def _midtier(label, fn, timeout_s, *args, **kwargs):
        """_bounded, but governed by the total budget: never dips into
        the north-star reserve, and shrinks watchdogs in bad weather."""
        avail = (
            total_budget_s
            - (time.perf_counter() - t_bench0)
            - ns_reserve_s
        )
        if avail < 30:
            log(f"{label}: SKIPPED (north-star budget reserve)")
            extras.setdefault("skipped_for_budget", []).append(label)
            return None
        return _bounded(
            label, fn, min(timeout_s * weather, avail), *args, **kwargs
        )

    log("timing TPU fuse() on the 3x3x100^3 grid...")
    r = _midtier("3x3 fuse", tpu_fuse_rate, 300, sims, transform_key)
    if r is not None:
        log(f"tpu fuse (3x3): {r / 1e6:.2f} Mvox/s")
        extras["fuse_3x3_100_mvox_s"] = round(r / 1e6, 3)
        fallback_rate = max(fallback_rate, r)
        _state["tpu_rate"] = fallback_rate
        extras["headline_scenario"] = "fuse_in_memory_warm"

    r = _midtier("3D Pallas kernel", pallas_kernel_rate, 300)
    if r is not None:
        log(
            f"3D Pallas fused kernel, tiles resident (4x4x128^3): "
            f"{r / 1e6:.0f} Mvox/s device-side"
        )
        extras["kernel_3d_mvox_s"] = round(r / 1e6, 1)

    r = _midtier("pairwise reg", pairwise_reg_rate, 240)
    if r is not None:
        log(f"pairwise registrations/sec (128^2 crops, x10 upsample): {r:.1f}")
        extras["pairwise_reg_s"] = round(r, 1)
        # single-thread CPU pairs/s for the same per-pair compute (north
        # star asks >10x CPU on the registration axis too); pure numpy,
        # a few seconds
        cr = _bounded("cpu pairwise reg", cpu_pairwise_reg_rate, 60)
        if cr:
            extras["cpu_baseline_reg_s"] = round(cr, 1)
            extras["reg_vs_cpu"] = round(r / cr, 1)
            log(
                f"  cpu baseline: {cr:.1f} pairs/s "
                f"-> {r / cr:.1f}x on device"
            )

    r = _midtier("2D Pallas kernel", pallas_kernel_rate_2d, 300)
    if r is not None:
        log(
            f"2D Pallas fused kernel, tiles resident (4x4x2048^2): "
            f"{r / 1e6:.0f} Mvox/s device-side"
        )
        extras["kernel_2d_mvox_s"] = round(r / 1e6, 1)

    r = _midtier("exact affine kernel", exact_affine_kernel_rate, 300)
    if r is not None:
        log(
            f"3D EXACT affine tier, slabs resident (rotate-around-y): "
            f"{r / 1e6:.0f} Mvox/s device-side"
        )
        extras["kernel_affine_exact_mvox_s"] = round(r / 1e6, 1)

    r = _midtier(
        "general exact affine kernel", exact_affine_general_kernel_rate,
        240,
    )
    if r is not None:
        log(
            f"3D GENERAL exact affine kernel (coupled maps): "
            f"{r / 1e6:.1f} Mvox/s device-side"
        )
        extras["kernel_affine_general_mvox_s"] = round(r / 1e6, 1)

    r = _midtier("single-upload stitch", stitch_rate, 360)
    if r is not None:
        log(
            f"end-to-end single-upload stitch() (3x3x100^3): "
            f"{r / 1e6:.2f} Mvox/s"
        )
        extras["stitch_3x3_mvox_s"] = round(r / 1e6, 3)

    r = _midtier("affine shear kernel", affine_kernel_rate, 300)
    if r is not None:
        log(
            f"3D affine shear tier, slabs resident (rotated layout): "
            f"{r / 1e6:.0f} Mvox/s device-side"
        )
        extras["kernel_affine_3d_mvox_s"] = round(r / 1e6, 1)

    r = _midtier("affine end-to-end fuse", fuse_affine_rate, 300)
    if r is not None:
        log(f"end-to-end rotated multiview fuse(): {r / 1e6:.2f} Mvox/s")
        extras["fuse_affine_mvox_s"] = round(r / 1e6, 2)

    r = _midtier("affine gather kernel", affine_gather_kernel_rate, 240)
    if r is not None:
        log(
            f"3D affine gather tier (exact fallback): "
            f"{r / 1e6:.1f} Mvox/s device-side"
        )
        extras["kernel_affine_gather_mvox_s"] = round(r / 1e6, 1)

    log("timing TPU fuse() on a 4x4 grid of 128^3 tiles...")
    r = _midtier(
        "4x4 fuse", tpu_fuse_rate,
        300, make_grid_sims(n=4, tile=128, overlap=24, ndim=3),
        transform_key,
    )
    if r is not None:
        log(f"tpu fuse (4x4x128^3): {r / 1e6:.2f} Mvox/s")
        extras["fuse_4x4_128_mvox_s"] = round(r / 1e6, 3)
        fallback_rate = max(fallback_rate, r)
        if "zarr_to_zarr_cold_mvox_s" not in extras:
            _state["tpu_rate"] = fallback_rate

    r = _midtier("6x6 register", register_grid_rate, 360)
    if r is not None:
        e2e_rate, n_edges = r
        log(
            f"end-to-end register() 6x6 grid ({n_edges} edges incl. full "
            f"disambiguation + global solve): {e2e_rate:.1f} edges/sec"
        )
        extras["register_6x6_edges_s"] = round(e2e_rate, 1)

    # 1024-tile registration throughput in the default run (VERDICT r2
    # item 6); the pairwise pipeline reuses the 6x6 run's compiled shapes
    r = _midtier(
        "1024-tile register", register_grid_rate, 420,
        n=32, tile=200, overlap=40, repeats=1,
    )
    if r is not None:
        e2e_rate, n_edges = r
        log(
            f"1024-tile register(): {n_edges} edges at "
            f"{e2e_rate:.1f} edges/sec (warm)"
        )
        extras["register_1024_edges_s"] = round(e2e_rate, 1)

    # ---- degraded floor pass (INSIDE the reserve, VERDICT r3 item 1) ----
    # every metric axis that has not recorded yet lands a number from a
    # tiny resident-data variant: no axis ships as "TIMED OUT/SKIPPED"
    if "pairwise_reg_s" not in extras:
        # tiered: production bucket shape first (cache hit), then a tiny
        # batch whose uploads survive even a ~0.3 MB/s link
        r = _bounded("reg floor", pairwise_reg_floor_rate, 100)
        if r is None:
            r = _bounded(
                "reg floor tiny", pairwise_reg_floor_rate, 80, 32,
            )
        if r is not None:
            log(f"pairwise reg FLOOR (packed batch, resident): {r:.1f}/s")
            extras["pairwise_reg_s"] = round(r, 1)
            extras["pairwise_reg_degraded"] = True
    if "kernel_3d_mvox_s" not in extras:
        r = _bounded(
            "3D kernel floor", pallas_kernel_rate, 90, 3, 4, 64,
        )
        if r is not None:
            log(f"3D Pallas kernel FLOOR (4x64^3): {r/1e6:.0f} Mvox/s")
            extras["kernel_3d_mvox_s_floor"] = round(r / 1e6, 1)
    if "kernel_affine_exact_mvox_s" not in extras:
        r = _bounded(
            "exact kernel floor", exact_affine_kernel_rate_small, 110,
        )
        if r is not None:
            log(f"EXACT affine kernel FLOOR: {r/1e6:.0f} Mvox/s")
            extras["kernel_affine_exact_mvox_s_floor"] = round(r / 1e6, 1)
    if "kernel_affine_general_mvox_s" not in extras:
        r = _bounded(
            "general exact kernel floor",
            exact_affine_general_kernel_rate, 110, 1,
        )
        if r is not None:
            log(f"GENERAL exact affine kernel FLOOR: {r/1e6:.1f} Mvox/s")
            extras["kernel_affine_general_mvox_s_floor"] = round(
                r / 1e6, 1
            )
    if (
        "fuse_3x3_100_mvox_s" not in extras
        and "fuse_4x4_128_mvox_s" not in extras
    ):
        r = _bounded(
            "fuse floor", tpu_fuse_rate, 90,
            make_grid_sims(n=2, tile=64, overlap=12, ndim=3),
            transform_key, 64, 2,
        )
        if r is not None:
            log(f"in-memory fuse FLOOR (2x2x64^3 warm): {r/1e6:.2f} Mvox/s")
            extras["fuse_floor_mvox_s"] = round(r / 1e6, 3)
            fallback_rate = max(fallback_rate, r)
            if _state["tpu_rate"] == 0.0:
                _state["tpu_rate"] = fallback_rate
                extras["headline_scenario"] = "fuse_floor_degraded"
    if (
        "register_6x6_edges_s" not in extras
        and "register_1024_edges_s" not in extras
    ):
        r = _bounded(
            "register floor", register_grid_rate, 150,
            3, 100, 24, 1,
        )
        if r is not None:
            e2e_rate, n_edges = r
            log(
                f"register FLOOR (3x3 grid, {n_edges} edges): "
                f"{e2e_rate:.1f} edges/s"
            )
            extras["register_edges_s_floor"] = round(e2e_rate, 1)

    # north-star scenario LAST (BASELINE.md): 1024-tile 3D zarr->zarr
    # streaming, cold then warm, each rep deadline-bounded inside the
    # band loop so catastrophic weather cannot exceed ~cold+warm seconds
    log("timing 1024-tile 3D zarr->zarr streaming fuse (north star)...")
    # NOT _midtier-governed: the reserve exists precisely for this slot
    r = _bounded(
        "north-star zarr->zarr", large_zarr_to_zarr_rate,
        2.6 * cold_dl + 180, extras,
        deadline_cold_s=cold_dl, deadline_warm_s=cold_dl * 0.8,
    )
    ns_rate = max(
        extras.get("zarr_to_zarr_cold_mvox_s", 0.0),
        extras.get("zarr_to_zarr_warm_mvox_s", 0.0),
    ) * 1e6
    if ns_rate > 0:
        # the brief's named scenario is the headline whenever it ran —
        # never the in-memory repeat (VERDICT r2 item 1c)
        extras["headline_scenario"] = "zarr_to_zarr_1024_streaming"
        _state["tpu_rate"] = ns_rate
        log(
            f"1024-tile 3D zarr->zarr streaming fuse: "
            f"{ns_rate / 1e6:.2f} Mvox/s (headline)"
        )

    _emit()


def _supervise(worker_cmd=None):
    """Run the measurement in a worker child and GUARANTEE the one JSON
    line. A segfault between scenarios (the XLA-CPU process-state class —
    observed live after a weather-starved floor pass) must not leave the
    driver with ZERO output: the worker snapshots state on every log line
    and the supervisor emits from the last snapshot (CPU baselines,
    completed scenarios, last-good ledger merge) when the worker dies
    before its own emit."""
    import signal
    import subprocess
    import tempfile

    state_file = os.path.join(
        tempfile.gettempdir(), f"mvs_bench_state_{os.getpid()}.json"
    )
    env = dict(os.environ, MVS_BENCH_STATE_FILE=state_file)
    child = subprocess.Popen(
        worker_cmd
        or [sys.executable, os.path.abspath(__file__), "--worker"],
        env=env,
    )

    def _finish():
        snap = None
        try:
            with open(state_file) as f:
                snap = json.load(f)
        except Exception:  # noqa: BLE001
            pass
        try:
            os.remove(state_file)
        except OSError:
            pass
        if snap and snap.get("final"):
            print(snap["final"], flush=True)
        else:
            # worker died before emitting: reconstruct and emit here
            # (ledger update + last-good merge included)
            _state["extras"] = (snap or {}).get("extras") or {}
            _state["cpu_rate"] = (snap or {}).get("cpu_rate")
            _state["tpu_rate"] = (snap or {}).get("tpu_rate") or 0.0
            _state["extras"]["worker_exit"] = child.returncode
            log(
                f"supervisor: worker died (rc={child.returncode}) before "
                "emitting; emitting from snapshot"
            )
            _emit()
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)

    def _forward(signum, frame):
        log(f"supervisor: signal {signum} -> worker")
        try:
            child.send_signal(signal.SIGTERM)
        except Exception:  # noqa: BLE001
            pass
        try:
            # the worker's own SIGTERM handler emits within seconds
            child.wait(timeout=25)
        except Exception:  # noqa: BLE001
            child.kill()
        _finish()

    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _forward)
        except Exception:  # noqa: BLE001
            pass
    child.wait()
    _finish()


if __name__ == "__main__":
    if "--worker" in sys.argv or os.environ.get("MVS_BENCH_NO_SUPERVISOR"):
        main()
        # exit immediately: abandoned watchdog threads (_bounded shuts its
        # executor down with wait=False) are non-daemon, and
        # concurrent.futures' atexit hook would JOIN them — a single
        # weather-stalled transfer thread would hold the exit code hostage
        # until the driver's outer timeout (rc=124) even though the JSON
        # line already shipped
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(0)
    else:
        _supervise()
