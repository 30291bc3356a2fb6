"""Tile-column-sharded recon over the virtual 8-device mesh with REAL
decoder tensors: the sharded stripes (production residual + MC kernels,
MV-folded absolute gathers, replicated refs) must equal the unsharded
`_recon_plane_inter` output for a real inter frame of a real stream."""
import os

import numpy as np
import pytest

VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")


def test_sharded_real_frame_matches_serial():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 devices")

    from ffmpeg_hybrid_tpu.formats.ivf import read_ivf
    from ffmpeg_hybrid_tpu.formats.superframe import split_superframe
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
    from ffmpeg_hybrid_tpu.ops import recon_tpu
    from ffmpeg_hybrid_tpu.parallel.tiles import sharded_frame_recon

    ivf = os.path.join(VEC_DIR, "inter_352x288_10f.ivf")
    if not os.path.exists(ivf):
        pytest.skip("vector not generated")
    _info, pkts = read_ivf(ivf)
    packets = [fd for p, d in pkts for _f, fd in split_superframe(d, p)]

    # decode up to an inter frame; take its pass-A job
    dec = VP9Decoder(recon_backend="golden")
    for fd in packets[:2]:
        dec.decode(fd)
    job = dec.decode_pass_a(packets[2])
    h = job.header
    assert not h.keyframe

    recs = jnp.asarray(recon_tpu._pack_records(job))
    r4, c4 = job.txsz4.shape
    (inter4, txsz4, txtype4, comp4, filt4, refsel, mv16,
     *_uv) = recon_tpu._grids_from_records(recs, r4, c4, h.ss_h, h.ss_v)

    coef = jnp.asarray(job.coef_y, jnp.int32)
    eob4 = jnp.asarray(job.eob_y, jnp.int32)
    refplanes = [jnp.asarray(
        job.refs[h.refidx[i]].planes[0], jnp.int32) for i in range(3)]
    H, W = coef.shape
    w, hh = job.cur_frame_obj.size

    # serial (production) path
    serial, _res = recon_tpu._recon_plane_inter(
        coef, eob4, inter4, txsz4, txtype4, comp4, filt4, refsel, mv16,
        refplanes[0], refplanes[1], refplanes[2], w, hh,
        bool(h.lossless), h.bpp, 2, 2)

    # tile-sharded path over a 4-wide "tile" mesh
    ntile = 4
    mesh = Mesh(np.array(jax.devices()[:ntile]), ("tile",))
    assert W % ntile == 0 and c4 % ntile == 0
    step = sharded_frame_recon(mesh, W, bpp=h.bpp,
                               lossless=bool(h.lossless))
    refstack = jnp.stack(refplanes)
    sharded = step(coef, eob4, txsz4.astype(jnp.int32),
                   txtype4.astype(jnp.int32), refsel, mv16,
                   comp4.astype(jnp.int32), filt4.astype(jnp.int32),
                   inter4.astype(jnp.int32), refstack)

    assert np.array_equal(np.asarray(sharded), np.asarray(serial))
    assert bool(np.asarray(inter4).any()), "frame has no inter blocks?"
