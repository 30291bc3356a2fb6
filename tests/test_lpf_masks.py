"""lpf_masks: dense LF parameter grids derived from pass A's
mask/level outputs must equal the grids splatted from the recorded
edge stream (vp9_lpf_record -> dense_params), bit-for-bit, across
chroma formats, bit depths, tx modes, segmentation and lf-deltas.
The numpy and jnp instantiations share one code path (dense_grids),
so grid equality here certifies the device path too; e2e wiring is
covered by test_lf_dense_e2e below.

Reference walker being reproduced: /root/reference/libavcodec/
vp9lpf.c:183-230 (ff_vp9_loopfilter_sb)."""
import os
import sys

import numpy as np
import pytest

from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
from ffmpeg_hybrid_tpu.passa_native import available, lpf_record_native
from ffmpeg_hybrid_tpu.ops.lpf_dense import dense_params, has_offgrid_edges
from ffmpeg_hybrid_tpu.ops import lpf_masks

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")
VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")


def _check_state(s, tag):
    h = s.header
    if not h.filter_level:
        return 0
    y_rec, ny, uv_rec, nuv = lpf_record_native(s)
    Hy, Wy = s.sb_rows * 64, s.sb_cols * 64
    Hu, Wu = Hy >> h.ss_v, Wy >> h.ss_h
    ref = (dense_params(y_rec, ny, Hy, Wy)
           + dense_params(uv_rec, nuv, Hu, Wu))
    mine = lpf_masks.grids_host(s)
    for name, a, b in zip(("Vy", "Hy", "Vu", "Hu"), ref, mine):
        assert a.shape == b.shape, f"{tag} {name} shape"
        bad = np.argwhere((a != b).any(-1))
        assert len(bad) == 0, \
            f"{tag} {name}: {len(bad)} diffs, first {bad[:3]}: " \
            f"rec={a[tuple(bad[0])]} mask={b[tuple(bad[0])]}"
    # flag contracts: *_any over-reports only; *_par never claims
    # 8px-grid purity when offgrid edges exist
    ya, ua, yp, up = lpf_masks.lf_flags(s)
    assert not (ny and not ya), f"{tag}: y_any missed active edges"
    assert not (nuv and not ua), f"{tag}: uv_any missed active edges"
    assert not (yp and has_offgrid_edges(y_rec, ny)), \
        f"{tag}: y_par claimed 8px grid with offgrid edges"
    assert not (up and has_offgrid_edges(uv_rec, nuv)), \
        f"{tag}: uv_par claimed 8px grid with offgrid edges"
    return 1


CASES = [
    dict(w=192, h=128, seed=1, filter_level=24),
    dict(w=128, h=64, seed=2, filter_level=63, sharpness=3),
    dict(w=128, h=128, seed=3, filter_level=10, bpp=10),
    dict(w=192, h=128, seed=20, filter_level=40, txfmmode=0),
    dict(w=640, h=192, seed=21, filter_level=52, sharpness=3),
    dict(w=130, h=70, seed=4, filter_level=31),
    dict(w=128, h=128, seed=5, filter_level=33, bpp=12),
    dict(w=192, h=128, seed=31, filter_level=44, ss_h=0, ss_v=0),
    dict(w=192, h=128, seed=32, filter_level=37, ss_h=1, ss_v=0),
    dict(w=192, h=128, seed=33, filter_level=29, ss_h=0, ss_v=1),
    dict(w=192, h=128, seed=34, filter_level=50, ss_h=0, ss_v=0,
         txfmmode=0),
    dict(w=192, h=128, seed=35, filter_level=21, ss_h=1, ss_v=0,
         bpp=10),
    dict(w=192, h=128, seed=36, filter_level=63,
         lf_deltas=([3, -2, 0, 1], [2, -1])),
    dict(w=192, h=128, seed=37, filter_level=40,
         seg_feat=[(20, 10, -1, 0), (0, -30, -1, 0), (0, 0, 2, 0),
                   (0, 0, -1, 1)] + [(0, 0, -1, 0)] * 4),
]


@pytest.mark.parametrize("case", CASES,
                         ids=lambda c: f"s{c['seed']}")
def test_grids_match_record_keyframes(case):
    if not available():
        pytest.skip("native lib not built")
    sys.path.insert(0, TOOLS)
    try:
        from mini_encoder import encode_keyframe_random
    finally:
        sys.path.pop(0)
    kw = dict(case)
    w, h, bpp = kw.pop("w"), kw.pop("h"), kw.pop("bpp", 8)
    data = encode_keyframe_random(w, h, bpp, **kw)
    dec = VP9Decoder(recon_backend="golden")
    s = dec.decode_pass_a(data)
    assert _check_state(s, str(case)) == 1


@pytest.mark.parametrize("vec", ["mini_inter_tiles2", "mini_sharpvar",
                                 "mini_lfdelta_130x70",
                                 "inter_176x144_10f"])
def test_grids_match_record_inter(vec):
    if not available():
        pytest.skip("native lib not built")
    path = os.path.join(VEC_DIR, f"{vec}.ivf")
    if not os.path.exists(path):
        pytest.skip("vector corpus not generated")
    from ffmpeg_hybrid_tpu.formats.ivf import read_ivf
    from ffmpeg_hybrid_tpu.codecs.vp9 import golden
    _i, pkts = read_ivf(path)
    dec = VP9Decoder(recon_backend="golden")
    n = 0
    for k, (_pts, data) in enumerate(pkts):
        s = dec.decode_pass_a(data)
        if s.ready is not None:
            continue
        n += _check_state(s, f"{vec}#{k}")
        golden.recon_frame(s)
        golden.loopfilter_frame(s)
    assert n >= 1


def test_lf_dense_e2e():
    """Full decode through the masks path (FFH_LF=dense on CPU):
    bit-exact against the oracle's framemd5 — proves the production
    wiring (precompute flags, flat upload, grids_device, kernel
    selection), not just the grids."""
    if not available():
        pytest.skip("native lib not built")
    path = os.path.join(VEC_DIR, "mini_sharpvar.ivf")
    ref = os.path.join(VEC_DIR, "mini_sharpvar.framemd5")
    if not os.path.exists(path):
        pytest.skip("vector corpus not generated")
    from ffmpeg_hybrid_tpu.formats.framemd5 import (parse_framemd5,
                                                    decode_file_md5s)
    from ffmpeg_hybrid_tpu.utils.config import get_config, set_config
    import dataclasses
    cfg = get_config()
    set_config(dataclasses.replace(cfg, lf_impl="dense"))
    try:
        want = parse_framemd5(ref)
        got = decode_file_md5s(path, backend="tpu")
    finally:
        set_config(cfg)
    assert [w[1] for w in want] == [g[1] for g in got]
    assert len(want) == len(got)
