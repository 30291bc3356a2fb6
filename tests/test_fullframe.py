"""Full sharded-frame pass-B decode vs the serial decoder, bit-exact.

The sharded step (parallel/fullframe.py) reconstructs real frames —
residual + MC + per-stripe intra + the distributed cross-tile loop
filter with ICI halo exchange — over a (gop, tile) device mesh; every
test asserts exact equality with the serial golden decode (itself
oracle-gated by test_e2e) on the coded pixel area, for every frame of
the stream, with sharded outputs feeding later frames' references.
"""
import os
import sys

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
from ffmpeg_hybrid_tpu.formats.ivf import read_ivf
from ffmpeg_hybrid_tpu.parallel.fullframe import sharded_decode_pass_b

VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")
TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _mesh(gop, ntile):
    devs = np.array(jax.devices()[:gop * ntile]).reshape(gop, ntile)
    return Mesh(devs, ("gop", "tile"))


def _coded_area(frame):
    w, h = frame.size
    return ((w + 7) >> 3) * 8, ((h + 7) >> 3) * 8


def _assert_frames_equal(serial_frame, planes, ctx=""):
    cw, ch = _coded_area(serial_frame)
    for i in range(3):
        pw = cw if i == 0 else cw >> serial_frame.ss_h
        ph = ch if i == 0 else ch >> serial_frame.ss_v
        a = np.asarray(serial_frame.planes[i][:ph, :pw])
        b = planes[i][:ph, :pw]
        if not np.array_equal(a, b):
            bad = np.argwhere(a != b)
            raise AssertionError(
                f"{ctx} plane {i}: {len(bad)} mismatches, first at "
                f"{bad[0]}: {a[tuple(bad[0])]} vs {b[tuple(bad[0])]}")


@pytest.mark.parametrize("vec,ntile", [
    ("mini_inter_tiles2", 2),
    ("mini_inter_tiles4", 4),
    ("mini_tiles2x2", 2),     # 2x2 tile rows x cols keyframe stream
])
def test_sharded_vs_serial(vec, ntile):
    path = os.path.join(VEC_DIR, vec + ".ivf")
    if not os.path.exists(path):
        pytest.skip("vector corpus not generated")
    mesh = _mesh(1, ntile)
    _info, pkts = read_ivf(path)
    ser = VP9Decoder(recon_backend="golden")
    shd = VP9Decoder(recon_backend="golden")
    nf = 0
    for _pts, data in pkts:
        job_s = ser.decode_pass_a(data)
        ser.decode_pass_b(job_s)
        job = shd.decode_pass_a(data)
        if job.ready is not None:
            continue
        [planes] = sharded_decode_pass_b([job], mesh)
        # install sharded output as this frame's pixels so later
        # frames' MC references the sharded chain, not the serial one
        f = job.cur_frame_obj
        for i in range(3):
            f.planes[i][...] = planes[i]
        _assert_frames_equal(job_s.cur_frame_obj, planes,
                             f"{vec} frame {nf}")
        nf += 1
    assert nf >= 1


def test_gop_and_tile_sharded():
    """2 independent inter frames x 2 tile stripes on 4 devices: the
    full (gop, tile) mesh decodes both frames' pass B in one sharded
    step, bit-exact vs serial."""
    sys.path.insert(0, TOOLS)
    try:
        from mini_encoder import encode_keyframe_random, encode_inter_flex
    finally:
        sys.path.pop(0)
    w, h = 512, 128
    k = encode_keyframe_random(w, h, seed=7, filter_level=24,
                               tile_cols_log2=1)
    # refresh_mask=0: both inter frames reference only the keyframe ->
    # their pass B is genuinely independent (GOP sharding)
    f1 = encode_inter_flex(w, h, seed=8, refresh_mask=0, filter_level=20,
                           coeffs=True, p_intra=0.2,
                           mv_mags=(0, 2, 4, 8, 16), tile_cols_log2=1)
    f2 = encode_inter_flex(w, h, seed=9, refresh_mask=0, filter_level=31,
                           coeffs=True, p_intra=0.1,
                           mv_mags=(0, 2, 8, 32), tile_cols_log2=1)

    ser = VP9Decoder(recon_backend="golden")
    serial_frames = []
    for data in (k, f1, f2):
        js = ser.decode_pass_a(data)
        ser.decode_pass_b(js)
        serial_frames.append(js.cur_frame_obj)

    shd = VP9Decoder(recon_backend="golden")
    jk = shd.decode_pass_a(k)
    [kplanes] = sharded_decode_pass_b([jk], _mesh(1, 2))
    for i in range(3):
        jk.cur_frame_obj.planes[i][...] = kplanes[i]
    _assert_frames_equal(serial_frames[0], kplanes, "gop kf")

    j1 = shd.decode_pass_a(f1)
    j2 = shd.decode_pass_a(f2)
    outs = sharded_decode_pass_b([j1, j2], _mesh(2, 2))
    _assert_frames_equal(serial_frames[1], outs[0], "gop f1")
    _assert_frames_equal(serial_frames[2], outs[1], "gop f2")


def test_sharded_scaled_refs():
    """Scaled-reference MC in the sharded step (the mixed per-ref
    dispatch with stripe-offset frame coordinates) vs the serial
    decode, 2 tile columns + LF on a 2x-upscale inter frame
    (reference: vp9recon.c:492-628)."""
    sys.path.insert(0, TOOLS)
    try:
        from mini_encoder import (encode_keyframe_lossless,
                                  encode_inter_flex)
    finally:
        sys.path.pop(0)
    import numpy as _np
    rng = _np.random.RandomState(7)
    kw, kh = 512, 128
    kf = encode_keyframe_lossless(
        rng.randint(0, 256, (kh, kw)),
        rng.randint(0, 256, (kh // 2, kw // 2)),
        rng.randint(0, 256, (kh // 2, kw // 2)), 8)
    f1 = encode_inter_flex(1024, 256, seed=11, refresh_mask=0x00,
                           coeffs=True, p_intra=0.15,
                           mv_mags=(0, 2, 8, 24), tile_cols_log2=1,
                           filter_level=18)
    ser = VP9Decoder(recon_backend="golden")
    shd = VP9Decoder(recon_backend="golden")
    truth = []
    for d in (kf, f1):
        js = ser.decode_pass_a(d)
        ser.decode_pass_b(js)
        truth.append(js.cur_frame_obj)
    jk = shd.decode_pass_a(kf)
    shd.decode_pass_b(jk)
    j1 = shd.decode_pass_a(f1)
    assert any(sc[0] != 0 for sc in j1.mvscale)  # really scaled
    [planes] = sharded_decode_pass_b([j1], _mesh(1, 2))
    _assert_frames_equal(truth[1], planes, "scaled inter")


def test_sharded_tall_geometry():
    """>= 6 SB rows (512x448 = 8x7 SBs): the wavefront loop filter and
    stripe split at real frame heights, 2 tiles, kf + 2 inter frames
    chained through the sharded outputs."""
    sys.path.insert(0, TOOLS)
    try:
        from mini_encoder import encode_keyframe_random, encode_inter_flex
    finally:
        sys.path.pop(0)
    w, h = 512, 448
    k = encode_keyframe_random(w, h, seed=21, filter_level=28,
                               tile_cols_log2=1)
    f1 = encode_inter_flex(w, h, seed=22, refresh_mask=0x02,
                           filter_level=22, coeffs=True, p_intra=0.15,
                           mv_mags=(0, 2, 4, 8, 16), tile_cols_log2=1)
    f2 = encode_inter_flex(w, h, seed=23, refidx=(1, 0, 0),
                           refresh_mask=0x04, filter_level=33,
                           coeffs=True, mv_mags=(0, 2, 8, 64),
                           tile_cols_log2=1)

    ser = VP9Decoder(recon_backend="golden")
    shd = VP9Decoder(recon_backend="golden")
    mesh = _mesh(1, 2)
    for fi, data in enumerate((k, f1, f2)):
        js = ser.decode_pass_a(data)
        ser.decode_pass_b(js)
        j = shd.decode_pass_a(data)
        [planes] = sharded_decode_pass_b([j], mesh)
        f = j.cur_frame_obj
        for i in range(3):
            f.planes[i][...] = planes[i]
        _assert_frames_equal(js.cur_frame_obj, planes,
                             f"tall frame {fi}")


def test_sharded_10bit():
    """Profile-2 10-bit keyframe through the sharded path (wide
    coefficients, HBD transforms + loop filter)."""
    sys.path.insert(0, TOOLS)
    try:
        from mini_encoder import encode_keyframe_random
    finally:
        sys.path.pop(0)
    w, h = 512, 192
    k = encode_keyframe_random(w, h, bpp=10, seed=24, filter_level=30,
                               yac_qi=80, tile_cols_log2=1)
    ser = VP9Decoder(recon_backend="golden")
    js = ser.decode_pass_a(k)
    ser.decode_pass_b(js)
    shd = VP9Decoder(recon_backend="golden")
    j = shd.decode_pass_a(k)
    [planes] = sharded_decode_pass_b([j], _mesh(1, 2))
    _assert_frames_equal(js.cur_frame_obj, planes, "10bit kf")


def test_sharded_4tile_wide():
    """4 tile columns on a 4K-width frame row (3840x128): the full
    4-way stripe split + 3 cross-tile halo exchanges."""
    sys.path.insert(0, TOOLS)
    try:
        from mini_encoder import encode_keyframe_random, encode_inter_flex
    finally:
        sys.path.pop(0)
    w, h = 3840, 128
    k = encode_keyframe_random(w, h, seed=25, filter_level=25,
                               tile_cols_log2=2)
    f1 = encode_inter_flex(w, h, seed=26, refresh_mask=0x02,
                           filter_level=19, coeffs=True, p_intra=0.1,
                           mv_mags=(0, 2, 4, 16), tile_cols_log2=2)
    ser = VP9Decoder(recon_backend="golden")
    shd = VP9Decoder(recon_backend="golden")
    mesh = _mesh(1, 4)
    for fi, data in enumerate((k, f1)):
        js = ser.decode_pass_a(data)
        ser.decode_pass_b(js)
        j = shd.decode_pass_a(data)
        [planes] = sharded_decode_pass_b([j], mesh)
        f = j.cur_frame_obj
        for i in range(3):
            f.planes[i][...] = planes[i]
        _assert_frames_equal(js.cur_frame_obj, planes,
                             f"4tile frame {fi}")


def test_gop_mixed_geometry():
    """Mixed frame geometries on the gop axis (dynamic-resize
    streams): shard tensors pad to the gop-wide max, per-frame dims
    ride dynamically, outputs crop back — bit-exact vs serial for
    both shards (one 2x-upscale scaled frame + one unscaled frame in
    ONE mesh step)."""
    sys.path.insert(0, TOOLS)
    try:
        from mini_encoder import (encode_keyframe_lossless,
                                  encode_inter_flex)
    finally:
        sys.path.pop(0)
    import numpy as _np
    rng = _np.random.RandomState(9)
    kw, kh = 512, 128
    kf = encode_keyframe_lossless(
        rng.randint(0, 256, (kh, kw)),
        rng.randint(0, 256, (kh // 2, kw // 2)),
        rng.randint(0, 256, (kh // 2, kw // 2)), 8)
    f1 = encode_inter_flex(1024, 256, seed=11, refresh_mask=0x00,
                           coeffs=True, p_intra=0.15,
                           mv_mags=(0, 2, 8, 24), tile_cols_log2=1,
                           filter_level=18)
    f2 = encode_inter_flex(512, 128, seed=12, refresh_mask=0x00,
                           coeffs=True, p_intra=0.1,
                           mv_mags=(0, 4, 16), tile_cols_log2=1,
                           filter_level=31)
    ser = VP9Decoder(recon_backend="golden")
    truth = []
    for d in (kf, f1, f2):
        js = ser.decode_pass_a(d)
        ser.decode_pass_b(js)
        truth.append(js.cur_frame_obj)
    shd = VP9Decoder(recon_backend="golden")
    jk = shd.decode_pass_a(kf)
    shd.decode_pass_b(jk)
    j1 = shd.decode_pass_a(f1)
    j2 = shd.decode_pass_a(f2)
    outs = sharded_decode_pass_b([j1, j2], _mesh(2, 2))
    _assert_frames_equal(truth[1], outs[0], "resize shard")
    _assert_frames_equal(truth[2], outs[1], "same-size shard")


def test_gop_show_existing_passthrough():
    """A show-existing shard on the gop axis passes its referenced
    frame through while active shards decode normally."""
    path = os.path.join(VEC_DIR, "show_existing.ivf")
    if not os.path.exists(path):
        pytest.skip("vector corpus not generated")
    from ffmpeg_hybrid_tpu.formats.superframe import split_superframe
    _info, pkts = read_ivf(path)
    fds = [fd for pts, d in pkts for _f, fd in split_superframe(d, pts)]
    ser = VP9Decoder(recon_backend="golden")
    shd = VP9Decoder(recon_backend="golden")
    n_shown = 0
    for fd in fds:
        js = ser.decode_pass_a(fd)
        ser.decode_pass_b(js)
        j = shd.decode_pass_a(fd)
        [planes] = sharded_decode_pass_b([j], _mesh(1, 1))
        if j.ready is not None:
            if not j.ready:
                continue      # nothing shown by this packet
            n_shown += 1
        else:
            fr = j.cur_frame_obj
            for i in range(3):
                fr.planes[i][...] = planes[i]
        sref = js.ready[0] if js.ready is not None else js.cur_frame_obj
        _assert_frames_equal(sref, planes, "show-existing stream")
    assert n_shown >= 1


def test_sharded_mxu_mc_matches_serial():
    """The sharded stripe recon with the MXU one-hot MC kernel
    (stripe-aware windows via the x0 offset, mc_mxu.py) must equal the
    serial decode exactly — run on the CPU mesh with mc_impl forced,
    since the CPU default is the gather kernel."""
    from ffmpeg_hybrid_tpu.utils.config import Config, set_config
    sys.path.insert(0, TOOLS)
    try:
        from mini_encoder import encode_keyframe_random, encode_inter_flex
    finally:
        sys.path.pop(0)
    w, h = 512, 128
    k = encode_keyframe_random(w, h, seed=31, filter_level=24,
                               tile_cols_log2=1)
    f1 = encode_inter_flex(w, h, seed=32, refresh_mask=0x02,
                           filter_level=20, coeffs=True, p_intra=0.15,
                           mv_mags=(0, 2, 4, 8, 64), tile_cols_log2=1)
    f2 = encode_inter_flex(w, h, seed=33, refidx=(1, 0, 0),
                           refresh_mask=0x04, filter_level=30,
                           coeffs=True, mv_mags=(0, 2, 8, 16),
                           tile_cols_log2=1)
    ser = VP9Decoder(recon_backend="golden")
    shd = VP9Decoder(recon_backend="golden")
    mesh = _mesh(1, 2)
    set_config(Config(mc_impl="mxu"))
    try:
        for fi, data in enumerate((k, f1, f2)):
            js = ser.decode_pass_a(data)
            ser.decode_pass_b(js)
            j = shd.decode_pass_a(data)
            [planes] = sharded_decode_pass_b([j], mesh)
            f = j.cur_frame_obj
            for i in range(3):
                f.planes[i][...] = planes[i]
            _assert_frames_equal(js.cur_frame_obj, planes,
                                 f"mxu frame {fi}")
    finally:
        set_config(None)
