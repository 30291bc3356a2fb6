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
