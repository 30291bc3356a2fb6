"""Standalone runner for the sharded-recon consistency check
(invoked by tests/test_parallel.py in a clean-env subprocess so the axon
PJRT plugin doesn't grab the backend)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run():

    import jax
    import jax.numpy as jnp
    if len(jax.devices()) < 4:
        raise SystemExit("SKIP: needs >=4 devices")
    from ffmpeg_hybrid_tpu.parallel.mesh import make_mesh
    from ffmpeg_hybrid_tpu.parallel.tiles import sharded_recon_step
    from ffmpeg_hybrid_tpu.ops import recon_tpu

    mesh = make_mesh(8)
    gop, ntile = mesh.devices.shape
    H, Ws = 64, 64
    W = Ws * ntile
    r4, c4 = H // 4, W // 4
    rng = np.random.RandomState(7)

    coef = rng.randint(-32, 32, (gop, H, W)).astype(np.int32)
    eob4 = rng.randint(0, 17, (gop, r4, c4)).astype(np.int32)
    txsz4 = rng.randint(0, 4, (gop, r4, c4)).astype(np.int32)
    mv16 = rng.randint(-48, 48, (gop, r4, c4, 2, 2)).astype(np.int32)
    refsel = rng.randint(0, 3, (gop, r4, c4, 2)).astype(np.int32)
    comp = rng.randint(0, 2, (gop, r4, c4)).astype(np.int32)
    filt = rng.randint(0, 4, (gop, r4, c4)).astype(np.int32)
    inter4 = np.ones((gop, r4, c4), np.int32)
    refstack = rng.randint(0, 255, (gop, 3, H, W)).astype(np.int32)
    counts = rng.randint(0, 100, (gop, ntile, 64)).astype(np.int32)

    step = sharded_recon_step(mesh, bpp=8)
    out, halo_l, halo_r, tot = step(
        *(jnp.asarray(a) for a in (coef, eob4, txsz4, mv16, refsel, comp,
                                   filt, inter4, refstack, counts)))
    out = np.asarray(out)

    # unsharded reference
    for g in range(gop):
        res = recon_tpu.residual_plane(
            jnp.asarray(coef[g]), jnp.asarray(eob4[g]),
            jnp.asarray(txsz4[g]), jnp.zeros((r4, c4), jnp.int32),
            False, 8)
        mc = recon_tpu._mc_cells(
            jnp.asarray(refstack[g]), jnp.asarray(mv16[g]),
            jnp.asarray(refsel[g]), jnp.asarray(comp[g].astype(bool)),
            jnp.asarray(filt[g]), jnp.asarray(inter4[g].astype(bool)),
            W, H, 8)
        expect = np.asarray(jnp.clip(mc + res, 0, 255))
        assert np.array_equal(out[g], expect), f"gop {g} stripe mismatch"

    # counts psum: every tile shard must hold the tile-sum
    tot = np.asarray(tot)
    expect_tot = counts.sum(axis=1)
    for g in range(gop):
        for tc in range(ntile):
            assert np.array_equal(tot[g, tc], expect_tot[g])


if __name__ == "__main__":
    run()
    print("PARALLEL-CONSISTENCY-OK")
