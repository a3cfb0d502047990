"""Single-upload stitching pipeline (TPU-first).

The reference runs registration and fusion as separate passes over the
same tiles (registration.py:2227 + fusion/_core.py:1068): register()
reads overlap crops, fuse() re-reads every tile. Over a tunneled
accelerator the host link is the bottleneck, so :func:`stitch` uploads
each tile ONCE into the device tile cache
(:func:`fusion._core._tiles_to_device`), slices registration crops on
device from the resident stack (``register(device_tiles=True)``),
resolves parameters on host (tiny downloads), and fuses from the same
residency — the wire carries one packed copy of the tiles plus the fused
output, instead of tiles + crops + tiles again.
"""

from __future__ import annotations

from typing import Optional, Sequence

from multiview_stitcher_tpu import fusion, msi_utils, registration, si_utils
from multiview_stitcher_tpu.msi_utils import Msim


def stitch(
    sims: Sequence,
    transform_key: str = si_utils.DEFAULT_TRANSFORM_KEY,
    new_transform_key: str = "registered",
    output_zarr_url: Optional[str] = None,
    mesh=None,
    register_kwargs: Optional[dict] = None,
    fuse_kwargs: Optional[dict] = None,
):
    """Register → resolve → fuse with tiles uploaded once.

    Parameters mirror the register()/fuse() pair; ``register_kwargs`` and
    ``fuse_kwargs`` pass through to the respective phases (and may
    override ``device_tiles``/``transform_key`` defaults set here).

    Returns the fused sim (lazy zarr-backed when ``output_zarr_url`` is
    given). The resolved parameters are written onto the inputs under
    ``new_transform_key``, exactly as ``register(new_transform_key=...)``
    does, so callers can inspect or re-fuse without re-registering.
    """
    msims = [
        m
        if isinstance(m, Msim)
        else msi_utils.get_msim_from_sim(m, scale_factors=[])
        for m in sims
    ]
    rkw = dict(register_kwargs or {})
    rkw.setdefault("device_tiles", True)
    rkw.setdefault("transform_key", transform_key)
    rkw.setdefault("new_transform_key", new_transform_key)
    rkw.setdefault("mesh", mesh)
    registration.register(msims, **rkw)

    sims_reg = [msi_utils.get_sim_from_msim(m) for m in msims]
    fkw = dict(fuse_kwargs or {})
    fkw.setdefault("transform_key", rkw["new_transform_key"])
    fkw.setdefault("mesh", mesh)
    if output_zarr_url is not None:
        fkw.setdefault("output_zarr_url", output_zarr_url)
    return fusion.fuse(sims_reg, **fkw)
