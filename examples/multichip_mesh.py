"""Stitch on a multi-chip device mesh.

Shows the two `mesh=` seams (SURVEY.md §2.4 P1/P2): the batched pairwise
registrations shard across devices, and fusion's output chunks shard
across devices, with XLA inserting the collectives.

Runs anywhere: on a CPU-only machine it demonstrates the sharding on a
virtual 8-device mesh (set before importing jax, as below); on a TPU pod
slice drop the env vars and the same code shards over the real chips.
"""

import os as _os
import sys as _sys

_sys.path.insert(
    0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
)  # allow running straight from the repo: python examples/<name>.py

import os

# virtual 8-device CPU mesh for demonstration; remove on real hardware
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")  # remove on real hardware

from jax.sharding import Mesh

from multiview_stitcher_tpu import fusion, msi_utils, registration, si_utils


def main():
    mesh = Mesh(np.array(jax.devices()), ("data",))
    print(f"mesh: {len(mesh.devices.ravel())} devices")

    # 4x4 grid of tiles cut from one scene, with small stage errors
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(0)
    scene = (gaussian_filter(rng.random((300, 300)), 1.5) * 1000).astype(
        np.uint16
    )
    sims = []
    for iy in range(4):
        for ix in range(4):
            oy, ox = iy * 70, ix * 70
            tile = scene[oy : oy + 90, ox : ox + 90]
            sims.append(
                si_utils.get_sim_from_array(
                    tile,
                    translation={
                        "y": oy + rng.uniform(-2, 2),
                        "x": ox + rng.uniform(-2, 2),
                    },
                )
            )
    msims = [msi_utils.get_msim_from_sim(s, scale_factors=[]) for s in sims]

    # pairwise registrations batch-sharded over the mesh
    registration.register(
        msims,
        transform_key=si_utils.DEFAULT_TRANSFORM_KEY,
        new_transform_key="registered",
        mesh=mesh,
    )

    # fusion with output chunks sharded over the mesh
    fused = fusion.fuse(
        [msi_utils.get_sim_from_msim(m) for m in msims],
        transform_key="registered",
        output_chunksize=128,
        mesh=mesh,
    )
    out = fused.to_numpy()
    print("fused:", out.shape, out.dtype)
    err = np.abs(
        out[: scene.shape[0], : scene.shape[1]].astype(float) - scene
    ).mean()
    print(f"mean abs error vs scene: {err:.2f}")
    return out


if __name__ == "__main__":
    main()
