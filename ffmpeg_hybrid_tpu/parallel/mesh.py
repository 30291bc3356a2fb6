"""Device mesh construction for multi-chip decode.

Parallel axes (SURVEY §2.12/§7 mapping of the reference's parallelism):
  - "gop":  GOP/frame parallelism across hosts (the frame-thread analogue,
            reference: pthread_frame.c) — each gop-shard decodes its own
            keyframe-rooted run of frames; ref planes cross only at GOP
            boundaries (DCN).
  - "tile": tile-column parallelism within a frame (the slice-thread
            analogue, reference: vp9.c:1441-1552) — entropy and recon are
            sharded by tile column; loop-filter halos ride ICI via
            ppermute.
"""
import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices=None, gop_axis=None):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if gop_axis is None:
        gop_axis = 2 if n >= 4 and n % 2 == 0 else 1
    tile_axis = n // gop_axis
    arr = np.array(devs).reshape(gop_axis, tile_axis)
    return Mesh(arr, ("gop", "tile"))
