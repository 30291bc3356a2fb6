"""Dense wavefront LF (ops/lpf_dense.py) vs the golden loop filter,
bit-exact on real decoded frames (keyframes and inter frames, multiple
filter levels, sharpness, tile columns, 8/10 bpp)."""
import os
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
from ffmpeg_hybrid_tpu.codecs.vp9 import golden
from ffmpeg_hybrid_tpu.ops.lpf_dense import loopfilter_frame_dense

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")


def _check_stream(packets, nframes=None):
    dec = VP9Decoder(recon_backend="golden")
    n = 0
    for data in packets:
        job = dec.decode_pass_a(data)
        if job.ready is not None:
            continue
        golden.recon_frame(job)
        pre = [np.asarray(p).copy() for p in job.cur_frame_obj.planes]
        golden.loopfilter_frame(job)
        if not job.header.filter_level:
            continue
        mine = loopfilter_frame_dense(
            job, [jnp.asarray(p, jnp.int32) for p in pre])
        for i in range(3):
            a = np.asarray(job.cur_frame_obj.planes[i])
            b = np.asarray(mine[i])
            bad = np.argwhere(a != b)
            assert len(bad) == 0, \
                f"frame {n} plane {i}: {len(bad)} diffs at {bad[:3]}"
        n += 1
        if nframes and n >= nframes:
            break
    return n


def test_dense_lf_keyframes():
    sys.path.insert(0, TOOLS)
    try:
        from mini_encoder import encode_keyframe_random
    finally:
        sys.path.pop(0)
    pkts = [
        encode_keyframe_random(192, 128, seed=1, filter_level=24),
        encode_keyframe_random(128, 64, seed=2, filter_level=63,
                               sharpness=3),
        encode_keyframe_random(128, 128, seed=3, filter_level=10,
                               bpp=10),
    ]
    assert _check_stream(pkts) == 3


def test_dense_lf_inter_tiles():
    path = os.path.join(VEC_DIR, "mini_inter_tiles2.ivf")
    if not os.path.exists(path):
        pytest.skip("vector corpus not generated")
    from ffmpeg_hybrid_tpu.formats.ivf import read_ivf
    _i, pkts = read_ivf(path)
    assert _check_stream([d for _p, d in pkts]) >= 2


def test_dense_lf_nonsquare():
    sys.path.insert(0, TOOLS)
    try:
        from mini_encoder import encode_keyframe_random
    finally:
        sys.path.pop(0)
    # non-multiple-of-64 dims: partial edge SBs
    pkts = [encode_keyframe_random(130, 70, seed=4, filter_level=31)]
    assert _check_stream(pkts) == 1


def test_par_matches_serial_on_8px_grid():
    """lf_dense_par's exactness claim: on 8px-grid edge sets (no
    4px-offset positions) the batched-position kernel equals the
    serial-position kernel bit-for-bit. Uses REAL recorded edge
    streams with the 4px-offset records dropped, plus the real frame
    pixels, across filter levels/sharpness/bpp."""
    sys.path.insert(0, TOOLS)
    try:
        from mini_encoder import encode_keyframe_random
    finally:
        sys.path.pop(0)
    from ffmpeg_hybrid_tpu.parallel.fullframe import record_lf
    from ffmpeg_hybrid_tpu.ops.lpf_dense import (
        dense_params, lf_dense, lf_dense_par, has_offgrid_edges)

    pkts = [
        # txfmmode=0 (all-4x4): dense 4px-offset edges, dropped below
        encode_keyframe_random(192, 128, seed=20, filter_level=40,
                               txfmmode=0),
        encode_keyframe_random(128, 128, seed=12, filter_level=63,
                               sharpness=5),
        encode_keyframe_random(128, 64, seed=13, filter_level=18,
                               bpp=10, txfmmode=0),
        # txfmmode=3 at width: wd16 edges NEXT TO wd4/8 edges — the
        # ordered A/B/C sub-step cases (a 1-phase batch miscomputed
        # exactly these; caught on the 1080p LF clip)
        encode_keyframe_random(640, 192, seed=21, filter_level=52,
                               sharpness=3),
        encode_keyframe_random(448, 256, seed=22, filter_level=63),
    ]
    checked = 0
    saw_offgrid = False
    saw_conflict = False
    for data in pkts:
        dec = VP9Decoder(recon_backend="golden")
        job = dec.decode_pass_a(data)
        golden.recon_frame(job)
        h = job.header
        y_rec, ny, uv_rec, nuv = record_lf(job)

        def on_grid(rec, n):
            if n == 0:
                return rec[:0]
            r = rec[:n]
            off = np.where(r[:, 3] == 0, r[:, 2], r[:, 1])
            return r[(off & 4) == 0]

        y8 = on_grid(y_rec, ny)
        uv8 = on_grid(uv_rec, nuv)
        assert not has_offgrid_edges(y8, len(y8))
        saw_offgrid |= has_offgrid_edges(y_rec, ny)
        # wd16 edge with an active 8px neighbour = A/C-class case
        for rec in (y8, uv8):
            if len(rec) == 0:
                continue
            v = rec[rec[:, 3] == 0]
            pos = set(map(tuple, v[:, 1:3].tolist()))
            for py, px, wd in zip(v[:, 1], v[:, 2], v[:, 4]):
                if wd >= 16 and ((py, px - 8) in pos
                                 or (py, px + 8) in pos):
                    saw_conflict = True
                    break
        planes = [jnp.asarray(np.asarray(p), jnp.int32)
                  for p in job.cur_frame_obj.planes]
        Hy, Wy = planes[0].shape
        Hu, Wu = planes[1].shape
        Vy, Hgy = dense_params(y8, len(y8), Hy, Wy)
        Vu, Hgu = dense_params(uv8, len(uv8), Hu, Wu)
        for pl, V, Hg, sx, sy in (
                (planes[0][None], Vy, Hgy, 64, 64),
                (jnp.stack([planes[1], planes[2]]), Vu, Hgu,
                 64 >> h.ss_h, 64 >> h.ss_v)):
            a = np.asarray(lf_dense(pl, jnp.asarray(V), jnp.asarray(Hg),
                                    job.sb_rows, job.sb_cols, sx, sy,
                                    h.bpp))
            b = np.asarray(lf_dense_par(pl, jnp.asarray(V),
                                        jnp.asarray(Hg), job.sb_rows,
                                        job.sb_cols, sx, sy, h.bpp))
            bad = np.argwhere(a != b)
            assert len(bad) == 0, f"{len(bad)} diffs at {bad[:3]}"
            checked += 1
    assert checked == 10
    assert saw_offgrid  # the 4x4-tx streams really exercised the gate
    assert saw_conflict  # wd16-next-to-wd4/8 ordering really exercised
