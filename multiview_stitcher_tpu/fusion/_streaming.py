"""Banded streaming execution for translation-grid fusion.

One-shot large fusions (the north-star scenario: a 1000+-tile 3D zarr grid
streamed to a zarr store, BASELINE.md; reference fusion/_core.py:2044 chunk
parallelism) are bound by the host<->device link: upload of every input
tile plus download of every output voxel. The monolithic Pallas tier
serializes upload -> kernel -> download; this driver splits the output into
bands along one axis and runs a software pipeline

    read+pack+upload view batch i+1  ||  kernel band i  ||  fetch band i-1

so steady-state wall time approaches max(upload bytes, download bytes) /
link bandwidth instead of their sum. Views are kept on device only while a
band needs them (sliding window), so inputs larger than HBM stream through.

Applicability: same as the Pallas translation tier (pure translation,
view spacing == output spacing, uniform tile shapes) with enough views
along one axis to form >= 3 bands with distinct view subsets.
"""

from __future__ import annotations

import threading
import warnings
from concurrent.futures import ThreadPoolExecutor
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from multiview_stitcher_tpu import si_utils
from multiview_stitcher_tpu.ops import link_codec

# prefetch depth (view batches ahead of the kernel) and max fused bands in
# flight (device + fetch); 2-3 keeps the pipe full without hoarding HBM
_PREFETCH_BATCHES = 3
_MAX_INFLIGHT_BANDS = 3

# telemetry of the most recent execute_streaming call (bytes moved, wall
# time, abort state): lets a caller attribute a slow run to the host link
# vs the kernels (CLAUDE.md "tunnel weather"), and survives a deadline
# abort so a partial run still reports measured progress
last_telemetry: dict = {}

# Upload-resume stash (single entry): device batch stacks from a run that
# could not seed the full device tile cache — a deadline-aborted pass, most
# importantly — keyed by the tile-cache key plus the batch layout. The next
# run over the same inputs reuses every stashed batch (no host-link
# traffic) and uploads only the rest, so an aborted cold pass donates its
# uploads to the retry instead of wasting them. Cleared whenever the full
# tile cache is seeded (the stash is then redundant) and by
# ``fusion.clear_device_tile_cache()``.
_upload_stash: dict = {}


def _stream_delta_default() -> bool:
    """Streaming default for the delta link transform (MVS_TPU_STREAM_DELTA).

    On by default: the codec is self-deciding per transfer (it compares the
    packed byte count of the zigzag-residual stream against the plain
    stream and ships whichever is smaller, ops/link_codec.py:354), so
    enabling it only ever removes wire bytes; the host-side transform runs
    through the C codec (io/_codecs.c mvs_delta_*) at memory bandwidth.
    """
    import os

    return os.environ.get("MVS_TPU_STREAM_DELTA", "1").lower() in (
        "1",
        "true",
        "auto",
    )


class StreamingDeadlineError(RuntimeError):
    """Raised when a streaming fusion run exceeds its deadline.

    Carries the telemetry of the partial run in ``.telemetry`` (bands done,
    packed bytes moved each way, elapsed seconds) so callers can report the
    achieved throughput and the measured link rate instead of silently
    eating an unbounded wall time. The fusion tier dispatcher re-raises
    this instead of falling back to a (slower) monolithic tier.
    """

    def __init__(self, message, telemetry):
        super().__init__(message)
        self.telemetry = telemetry


@partial(jax.jit, static_argnames=("NV",))
def _assemble_window(batches, start, NV):
    """Concatenate upload batches and slice the band's NV-view window."""
    cat = jnp.concatenate(batches, axis=0)
    return jax.lax.dynamic_slice_in_dim(cat, start, NV, axis=0)


@jax.jit
def _gather_batch(dev_all, idxs):
    """Device-side gather of one sorted view batch from the resident
    (V, *tile) stack (repeat streaming passes skip uploads)."""
    return dev_all[idxs]


@partial(jax.jit, static_argnames=("inv", "V"))
def _reorder_concat(stacks, inv, V):
    """Concatenate retained upload batches and restore original view order
    (device-side; seeds the tile cache after a streaming pass)."""
    allv = jnp.concatenate(stacks, axis=0)[:V]
    return allv[jnp.asarray(inv)]


def plan_bands(offs, extents, out_shape_full, tile_shape, axis_chunk=None):
    """Choose a band axis + height; return band table or None.

    ``offs``: (V, ndim) output-pixel -> view-pixel translations (so a view
    occupies output coords [-off, -off + extent) along each axis).
    ``axis_chunk``: optional per-axis output chunk size for write-alignment
    (zarr sinks: bands must not share output chunks across concurrent
    writers).
    """
    V, ndim = offs.shape
    best = None
    for a in range(ndim):
        E = float(extents[0, a])
        if not np.allclose(extents[:, a], E):
            continue  # uniform extents required along the band axis
        T = tile_shape[a]
        H = max(T, int(-(-int(E) // T)) * T)
        if axis_chunk is not None:
            c = int(axis_chunk[a])
            g = np.gcd(H, c)
            H = H * c // g  # lcm: band boundaries align to output chunks
        B = -(-out_shape_full[a] // H)
        if B < 3:
            continue
        m = -offs[:, a]
        order = np.argsort(m, kind="stable")
        ms = m[order]
        pad = 2.0  # interpolation + rounding margin (pixels)
        lo = np.searchsorted(ms, np.arange(B) * H - pad - E, side="right")
        hi = np.searchsorted(ms, (np.arange(B) + 1) * H + pad, side="left")
        NV = int(np.max(hi - lo))
        if NV <= 0 or NV >= V:
            continue
        if best is None or B > best["B"]:
            best = {
                "axis": a, "H": H, "B": B, "order": order,
                "lo": lo.astype(int), "hi": hi.astype(int), "NV": NV,
            }
    return best


def execute_streaming(
    plan,
    field_sims,
    output_stack_properties,
    sdims,
    *,
    blending_widths,
    shrink_distance,
    out_dtype,
    out_sink=None,
    tile_shape=None,
    output_chunksize=None,
    is_zarr_sink=False,
    deadline_s=None,
):
    """Run the banded pipeline; returns the output sink/array, or None if
    the layout does not band usefully (caller falls back to monolithic).

    ``deadline_s`` (or env ``MVS_TPU_STREAM_DEADLINE_S``) bounds the wall
    time: when exceeded, the band loop stops submitting work, drains
    in-flight fetches, and raises :class:`StreamingDeadlineError` carrying
    the partial-run telemetry — so a weather-stalled run aborts in bounded
    time instead of eating the caller's whole budget (VERDICT r2 item 1b).
    """
    from multiview_stitcher_tpu.fusion import _core
    from multiview_stitcher_tpu.ops import pallas_fusion

    ndim = len(sdims)
    if tile_shape is None:
        tile_shape = _core._kernel_tile_shape(ndim)
    out_shape_full = tuple(
        int(output_stack_properties["shape"][d]) for d in sdims
    )
    V = len(field_sims)
    views_bb = [si_utils.get_stack_properties_from_sim(s) for s in field_sims]

    # per-view kernel params (original order; shared with the monolithic
    # Pallas tier — streaming runs at unit scale only)
    offs, extents, wdiags, woffs, wgrids = _core.translation_kernel_params(
        plan, views_bb, output_stack_properties, sdims,
        blending_widths, shrink_distance,
    )

    axis_chunk = None
    if is_zarr_sink and output_chunksize is not None:
        # concurrent band writes must not share an output chunk
        axis_chunk = [int(output_chunksize[d]) for d in sdims]
    bands = plan_bands(offs, extents, out_shape_full, tile_shape, axis_chunk)
    if bands is None:
        return None

    import os as _os2
    import time as _time

    if deadline_s is None:
        _dl = _os2.environ.get("MVS_TPU_STREAM_DEADLINE_S")
        deadline_s = float(_dl) if _dl else None
    t_begin = _time.perf_counter()
    tele_lock = threading.Lock()
    tele = {
        "bands_total": int(bands["B"]),
        "bands_done": 0,
        "up_bytes": 0,
        "down_bytes": 0,
        "up_batches_reused": 0,
        "up_batches_reused_packed": 0,
        "up_batches_resident": 0,
        "up_delta_batches": 0,
        "down_delta_bands": 0,
        "up_delta2_batches": 0,
        "down_delta2_bands": 0,
        "up_delta3_batches": 0,
        "down_delta3_bands": 0,
        "voxels_written": 0,
        "elapsed_s": 0.0,
        "aborted": False,
        "deadline_s": deadline_s,
        "wire_bits_per_vox": None,
    }
    global last_telemetry
    last_telemetry = tele

    a, H, B = bands["axis"], bands["H"], bands["B"]
    order, lo, hi, NV = bands["order"], bands["lo"], bands["hi"], bands["NV"]

    # sorted-view tables, padded by NV rows so every [lo_b, lo_b + NV) slice
    # is in range (pad rows are never referenced: view_idx has no slot)
    def pad_rows(arr):
        return np.concatenate(
            [arr, np.zeros((NV,) + arr.shape[1:], arr.dtype)]
        )

    offs_s = pad_rows(offs[order])
    extents_s = pad_rows(extents[order])
    wdiags_s = pad_rows(wdiags[order])
    woffs_s = pad_rows(woffs[order])
    wgrids_s = pad_rows(wgrids[order])
    sims_s = [field_sims[i] for i in order]

    # global kernel-tile view lists (sorted ids), grid padded along the band
    # axis to a whole number of bands
    from itertools import product as _product

    n_t = [-(-out_shape_full[d] // tile_shape[d]) for d in range(ndim)]
    tpb = H // tile_shape[a]  # kernel tiles per band along the band axis
    n_t_padded = list(n_t)
    n_t_padded[a] = B * tpb
    tile_lists = {}
    for v in range(V):
        vlo = -offs_s[v] - 1
        vhi = -offs_s[v] + extents_s[v]
        ranges = []
        empty = False
        for d in range(ndim):
            a0 = max(0, int(np.floor(vlo[d] / tile_shape[d])))
            a1 = min(n_t[d] - 1, int(np.floor(vhi[d] / tile_shape[d])))
            if a0 > a1:
                empty = True
                break
            ranges.append(range(a0, a1 + 1))
        if empty:
            continue
        for idx in _product(*ranges):
            tile_lists.setdefault(idx, []).append(v)
    K = max(1, max((len(v) for v in tile_lists.values()), default=1))
    view_idx_g = np.full(tuple(n_t_padded) + (K,), -1, dtype=np.int32)
    for idx, vs in tile_lists.items():
        for s, v in enumerate(vs):
            view_idx_g[idx + (s,)] = v

    # upload batching: >= ~8 MB of raw tile bytes per put_packed call, all
    # batches the same static shape (zero-pad the tail)
    tile = tuple(int(s) for s in sims_s[0].data.shape)
    dtype_in = np.dtype(sims_s[0].data.dtype)
    tile_bytes = int(np.prod(tile)) * dtype_in.itemsize
    import os as _os

    batch_bytes = int(
        _os.environ.get("MVS_TPU_STREAM_BATCH_BYTES", 8 << 20)
    )
    U = max(1, -(-batch_bytes // tile_bytes))
    # device tile cache integration: a previous pass over the same inputs
    # left the full (V, *tile) stack resident — "uploads" become device-
    # side gathers (repeat fuse() pays only kernels + downloads). A first
    # pass whose tiles fit the cache budget retains its batches and seeds
    # the cache at the end.
    cache_key = _core._DeviceTileCache.key_for(field_sims)
    resident = _core._device_tile_cache.get(cache_key)
    retain_batches = (
        resident is None
        and cache_key is not None
        and V * tile_bytes <= _core._device_tile_cache._budget()
    )
    n_batches = -(-V // U)
    # upload-resume: batches stashed by a prior (aborted) run over the
    # same inputs and batch layout are reused without link traffic
    stash_key = None
    stash_batches: dict = {}
    if retain_batches:
        stash_key = (
            cache_key, U, tile, n_batches,
            hash(np.ascontiguousarray(order).tobytes()),
        )
        entry = _upload_stash.get("entry")
        if entry is not None and entry["key"] == stash_key:
            stash_batches = entry["batches"]
    # packed-stream stash: when the tile set is too large for the device
    # tile cache (retain_batches False), keep each upload's PACKED device
    # buffers instead — the residual streams are 3-8x smaller than the
    # unpacked tiles, so whole input sets fit HBM in packed form. A repeat
    # pass over the same inputs rebuilds every batch with a device unpack
    # (zero up-leg traffic) — the north-star warm rep becomes download-
    # only even after a SUCCESSFUL cold pass, not just after an abort.
    # MVS_TPU_UPLOAD_STASH_BYTES bounds it (0 disables).
    import os as _os

    # Engaged regardless of retain_batches: run 4 of the r5 bench showed a
    # SUCCESSFUL cold pass whose tile-cache seeding failed silently, so the
    # warm rep re-paid the full 461 MB up leg — the packed stash is the
    # insurance net for that case too (if the resident stack serves, the
    # stash is simply never read).
    packed_key = None
    packed_batches: dict = {}
    packed_budget = int(
        _os.environ.get("MVS_TPU_UPLOAD_STASH_BYTES", 4 << 30)
    )
    if cache_key is not None and packed_budget > 0:
        packed_key = (
            cache_key, U, tile, n_batches,
            hash(np.ascontiguousarray(order).tobytes()),
        )
        entry = _upload_stash.get("packed_entry")
        if entry is not None and entry["key"] == packed_key:
            packed_batches = entry["batches"]
    NB = -(-NV // U) + 1  # batches per assembly window
    packable = link_codec.is_packable(dtype_in)
    use_delta = _stream_delta_default()

    def upload_batch(bi):
        hit = stash_batches.get(bi)
        if hit is not None:
            with tele_lock:
                tele["up_batches_reused"] += 1
            return hit
        hitp = packed_batches.get(bi)
        if hitp is not None:
            rec, bmax = hitp
            with tele_lock:
                tele["up_batches_reused"] += 1
                tele["up_batches_reused_packed"] += 1
            return link_codec.reassemble_packed(rec), bmax
        vs = list(range(bi * U, min((bi + 1) * U, V)))
        if resident is not None:
            # tiles already on device (original order): gather the sorted
            # batch device-side — no host link traffic at all
            with tele_lock:
                tele["up_batches_resident"] += 1
            idxs = np.zeros(U, dtype=np.int32)
            idxs[: len(vs)] = order[vs[0] : vs[0] + len(vs)]
            dev = _gather_batch(resident["dev"], idxs)
            nb = resident["nbits"]
            bmax = (1 << nb) - 1 if nb is not None else 0
            return dev, bmax
        arr = _core._materialize_tiles([sims_s[v] for v in vs])
        if np.issubdtype(arr.dtype, np.floating):
            arr = np.nan_to_num(arr)
        bmax = int(arr.max(initial=0)) if packable else 0
        bneg = (
            int(arr.min(initial=0)) < 0
            if packable and np.issubdtype(arr.dtype, np.signedinteger)
            else False
        )
        if len(vs) < U:
            # pad the tail batch by repeating the last tile (never
            # referenced by the kernel): edge values keep the delta
            # residual stream free of artificial value->0 jumps that
            # would widen the packed width
            arr = np.concatenate(
                [arr, np.repeat(arr[-1:], U - len(vs), axis=0)]
            )
        nb = 16 if (not packable or bneg) else link_codec.nbits_for_max(bmax)
        info = {}
        rec = {} if packed_key is not None else None
        dev = link_codec.put_packed(
            arr, nbits=nb, delta=use_delta and packable and not bneg,
            info=info, keep_packed=rec,
        )
        with tele_lock:
            tele["up_bytes"] += info["bytes"]
            if info.get("delta"):
                tele["up_delta_batches"] += 1
            if info.get("mode") == "delta2":
                tele["up_delta2_batches"] += 1
            if info.get("mode") == "delta3":
                tele["up_delta3_batches"] += 1
            if rec and rec.get("parts") is not None:
                used = sum(
                    v[0]["packed_bytes"] for v in packed_batches.values()
                )
                if used + rec["packed_bytes"] <= packed_budget:
                    packed_batches[bi] = (rec, bmax)
        return dev, bmax

    zero_batch = None  # lazy: only needed when a window overruns the tail

    interpret = jax.devices()[0].platform == "cpu"
    fuse_fn = (
        pallas_fusion.fuse_translation_2d
        if ndim == 2
        else pallas_fusion.fuse_translation_3d
    )
    out = out_sink if out_sink is not None else np.zeros(
        out_shape_full, dtype=out_dtype
    )

    band_out_shape = list(out_shape_full)
    band_out_shape[a] = H
    band_out_shape = tuple(band_out_shape)

    inflight = threading.Semaphore(_MAX_INFLIGHT_BANDS)
    errors = []

    def fetch_and_write(b, fused_band, nbits, h_true):
        try:
            buf = np.empty(
                tuple(
                    h_true if d == a else out_shape_full[d]
                    for d in range(ndim)
                ),
                dtype=out_dtype,
            )
            info = {}
            link_codec.fetch_packed(
                fused_band, out=buf, nbits=nbits, delta=use_delta, info=info,
            )
            sl = tuple(
                slice(b * H, b * H + h_true) if d == a else slice(None)
                for d in range(ndim)
            )
            out[sl] = buf
            with tele_lock:
                tele["down_bytes"] += info["bytes"]
                if info.get("delta"):
                    tele["down_delta_bands"] += 1
                if info.get("mode") == "delta2":
                    tele["down_delta2_bands"] += 1
                if info.get("mode") == "delta3":
                    tele["down_delta3_bands"] += 1
                tele["voxels_written"] += buf.size
                tele["bands_done"] += 1
                tele["elapsed_s"] = _time.perf_counter() - t_begin
        except Exception as e:  # noqa: BLE001
            errors.append(e)
        finally:
            inflight.release()

    max_seen = 0
    with ThreadPoolExecutor(2) as up_pool, ThreadPoolExecutor(3) as dl_pool:
        futs = {}
        next_submit = 0

        def ensure_batches(through_bi, prefetch=_PREFETCH_BATCHES):
            # monotone submission: dropped (consumed) batches never resubmit
            nonlocal next_submit
            target = min(through_bi + prefetch, n_batches - 1)
            while next_submit <= target:
                futs[next_submit] = up_pool.submit(upload_batch, next_submit)
                next_submit += 1

        fetch_futs = []
        for b in range(B):
            if (
                deadline_s is not None
                and _time.perf_counter() - t_begin > deadline_s
            ):
                tele["aborted"] = True
                break
            lo_b, hi_b = int(lo[b]), int(hi[b])
            bi0 = lo_b // U
            # the assembly window always spans NB batches from bi0 (static
            # shape), not just the band's own view span — submit through the
            # window end or sparse/irregular layouts hit missing futures
            need_hi_bi = min(n_batches - 1, bi0 + NB - 1)
            ensure_batches(need_hi_bi)
            window = []
            deadline_hit = False
            for bi in range(bi0, bi0 + NB):
                if bi < n_batches:
                    try:
                        dev, bmax = futs[bi].result(
                            timeout=None
                            if deadline_s is None
                            else max(
                                1.0,
                                deadline_s
                                - (_time.perf_counter() - t_begin),
                            )
                        )
                    except TimeoutError:
                        # a weather-stalled upload: abort instead of
                        # blocking past the deadline
                        deadline_hit = True
                        break
                    max_seen = max(max_seen, bmax)
                    window.append(dev)
                else:
                    if zero_batch is None:
                        zero_batch = jnp.zeros((U,) + tile, dtype_in)
                    window.append(zero_batch)
            band_tiles = _assemble_window(
                tuple(window), np.int32(lo_b - bi0 * U), NV
            )

            # band origin is passed to the kernel as an integer shift so the
            # per-pixel math is bitwise identical to a monolithic call
            y0 = b * H
            origin = np.zeros((ndim,), np.int32)
            origin[a] = y0
            g_sl = tuple(
                slice(b * tpb, (b + 1) * tpb) if d == a else slice(None)
                for d in range(ndim)
            )
            vi_g = view_idx_g[g_sl]
            vi_b = np.where(
                (vi_g >= lo_b) & (vi_g < lo_b + NV), vi_g - lo_b, -1
            ).astype(np.int32)

            if deadline_hit:
                tele["aborted"] = True
                break
            if deadline_s is None:
                inflight.acquire()
            elif not inflight.acquire(
                timeout=max(
                    1.0, deadline_s - (_time.perf_counter() - t_begin)
                )
            ):
                # downloads stalled past the deadline
                tele["aborted"] = True
                break
            if errors:
                inflight.release()
                break
            fused = fuse_fn(
                band_tiles, vi_b,
                offs_s[lo_b : lo_b + NV],
                extents_s[lo_b : lo_b + NV],
                wdiags_s[lo_b : lo_b + NV],
                woffs_s[lo_b : lo_b + NV],
                wgrids_s[lo_b : lo_b + NV],
                out_shape=band_out_shape,
                tile_shape=tuple(tile_shape),
                K=K,
                interpret=interpret,
                out_dtype=np.dtype(out_dtype),
                origin=origin,
            )
            h_true = min(H, out_shape_full[a] - y0)
            if h_true < H:
                fused = jax.lax.slice_in_dim(fused, 0, h_true, axis=a)
            nbits = (
                link_codec.nbits_for_max(max_seen) if packable else None
            )
            fetch_futs.append(
                dl_pool.submit(fetch_and_write, b, fused, nbits, h_true)
            )

            # drop device batches no longer reachable by future bands
            # (unless we're retaining them to seed the device tile cache)
            if not retain_batches and b + 1 < B:
                keep_from = int(lo[b + 1]) // U
                for bi in [k for k in futs if k < keep_from]:
                    del futs[bi]

        for f in fetch_futs:
            f.result()

    # every upload the pool completed (the executor exit waited for them,
    # including ones queued past an abort) is kept for resume/seeding
    if retain_batches:
        for bi, f in futs.items():
            if f.done() and not f.cancelled() and f.exception() is None:
                stash_batches.setdefault(bi, f.result())

    def _save_stash():
        if stash_key is not None and stash_batches:
            _upload_stash.pop("entry", None)
            _upload_stash["entry"] = {
                "key": stash_key, "batches": stash_batches,
            }
        if packed_key is not None and packed_batches:
            _upload_stash["packed_entry"] = {
                "key": packed_key, "batches": packed_batches,
            }

    def _finalize_wire_stats():
        # wire cost per fused output voxel (both directions): the honest
        # "how close to the link's information-theoretic floor" number
        if tele["voxels_written"]:
            tele["wire_bits_per_vox"] = (
                8.0
                * (tele["up_bytes"] + tele["down_bytes"])
                / tele["voxels_written"]
            )

    _finalize_wire_stats()
    if errors:
        _save_stash()
        raise errors[0]
    tele["elapsed_s"] = _time.perf_counter() - t_begin
    if tele["aborted"]:
        _save_stash()
        raise StreamingDeadlineError(
            f"streaming fusion exceeded its {deadline_s:.0f}s deadline: "
            f"{tele['bands_done']}/{tele['bands_total']} bands, "
            f"{tele['up_bytes'] / 1e6:.0f} MB up / "
            f"{tele['down_bytes'] / 1e6:.0f} MB down "
            f"in {tele['elapsed_s']:.1f}s",
            tele,
        )

    if retain_batches:
        # seed the device tile cache: repeated fuse() calls over the same
        # inputs then skip streaming entirely and re-use resident tiles
        # through the monolithic Pallas tier (download-only repeats)
        try:
            stacks = [stash_batches[bi][0] for bi in range(n_batches)]
            inv = np.empty(V, dtype=np.int64)
            inv[order] = np.arange(V)
            tiles_dev = _reorder_concat(
                tuple(stacks), tuple(int(i) for i in inv), V
            )
            nbits_all = (
                link_codec.nbits_for_max(max_seen) if packable else None
            )
            _core._device_tile_cache.put(
                cache_key, tiles_dev, nbits_all,
                [s.data for s in field_sims
                 if isinstance(s.data, (np.ndarray, jnp.ndarray))],
            )
        except Exception as e:  # noqa: BLE001
            # best-effort, but VISIBLY so: a silent failure here makes the
            # next pass re-pay the whole up leg (bench r5 run 4: 461 MB)
            warnings.warn(
                f"device tile cache seeding failed "
                f"({type(e).__name__}: {e}); repeat passes fall back to "
                "the packed upload stash.",
                RuntimeWarning,
                stacklevel=2,
            )
        _upload_stash.pop("entry", None)  # superseded by the full cache
    if packed_key is not None and packed_batches:
        # successful pass: keep the packed upload streams resident so the
        # NEXT pass over these inputs pays zero up-leg traffic
        _upload_stash["packed_entry"] = {
            "key": packed_key, "batches": packed_batches,
        }
    return out
