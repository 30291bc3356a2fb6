"""On-device pass A (ops/passa_device.py): the full keyframe block-
syntax walk — partition quadtree, seg/skip/tx, context-coupled KF
intra mode trees, uv mode, and every coefficient block with live nnz
maintenance — decoded S tile streams in lockstep, bit-exact against
the host (pure-Python) pass A: block records, the dense coefficient
planes and the eob grids must all match.

The device executable is geometry-DYNAMIC (one compile serves every
frame size/tile layout; statics are only seg/txfmmode/lossless/bpp/
subsampling and output caps) — the first run pays one multi-minute
XLA compile, cached persistently thereafter.

Reference: vp9block.c:80-923, vp9.c:1115-1193."""
import os
import sys

import numpy as np
import pytest

from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder, _tile_offset
from ffmpeg_hybrid_tpu.ops import passa_device as PD

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _encode(case):
    sys.path.insert(0, TOOLS)
    try:
        from mini_encoder import encode_keyframe_random
    finally:
        sys.path.pop(0)
    kw = dict(case)
    return encode_keyframe_random(
        kw.pop("w"), kw.pop("h"), kw.pop("bpp", 8), yac_qi=60,
        filter_level=0, **kw)


def _check(pkt):
    dec = VP9Decoder(recon_backend="golden", use_native=False)
    s = dec.decode_pass_a(pkt)
    _compare(dec, s, pkt)


def _check_stream(packets):
    """Multi-frame streams: every frame (keyframe AND inter) must
    produce identical records/coeffs/eobs/counts on the device walk
    as the host pass A just produced for it."""
    dec = VP9Decoder(recon_backend="golden", use_native=False)
    for pkt in packets:
        s = dec.decode_pass_a(pkt)
        if s.ready is not None:      # show-existing
            continue
        _compare(dec, s, pkt)
        dec.decode_pass_b(s)


def _canon(vals):
    """Zero the don't-care record fields. The host reuses ONE Block
    object, so fields not written by a block's own parse hold stale
    values from an arbitrary earlier block (e.g. uvmode of inter
    blocks, refs/filter/mvs of intra blocks); no consumer reads them
    (record_block and recon branch on b.intra first)."""
    v = [int(x) for x in vals]
    if v[6]:                    # intra: refs/filter/mvs are unused
        v[15] = v[16] = v[17] = 0
        v[18:] = [0] * 16
    else:                       # inter: uvmode is unused
        v[13] = 0
        if not v[14]:           # single ref: ref[1] is unused
            v[16] = 0
    return v


def _compare(dec, s, pkt):
    h = dec.header
    if h.keyframe or h.intraonly:
        inputs, meta = PD.prep_keyframe(dec, pkt)
    else:
        inputs, meta = PD.prep_inter(dec, pkt)
    blocks, nblk, cpairs, ncp, epairs, nep, cnts, err = \
        PD.decode_frame_device(inputs, meta)
    assert not err.any(), "device walk overflow/error"
    if meta["want_counts"]:
        from ffmpeg_hybrid_tpu.codecs.vp9.counts import Counts
        got = PD.counts_from_device(cnts, Counts())
        host = dec.last_counts
        for name, _sh in PD._CNT_SPEC:
            assert (getattr(got, name).astype(np.int64)
                    == getattr(host, name).astype(np.int64)).all(), \
                f"{name} counts diverge"
    h = dec.header
    lanes = []
    for tr in range(h.tile_rows):
        r0, r1 = _tile_offset(tr, h.log2_tile_rows, dec.sb_rows)
        for tc in range(h.tile_cols):
            c0, c1 = _tile_offset(tc, h.log2_tile_cols, dec.sb_cols)
            lanes.append((r0, r1, c0, c1))
    for li, (r0, r1, c0, c1) in enumerate(lanes):
        gt = [(row, col, tcs, b) for row, col, tcs, b in s.blocks
              if c0 <= col < c1 and r0 <= row < r1]
        assert int(nblk[li]) == len(gt), \
            f"lane {li}: {int(nblk[li])} blocks vs host {len(gt)}"
        for k, (row, col, tcs, b) in enumerate(gt):
            want = ([row, col, tcs, b.bs, b.seg_id, b.skip, b.intra,
                     b.tx, b.uvtx] + list(b.mode)
                    + [b.uvmode, b.comp, b.ref[0], b.ref[1], b.filter]
                    + [int(c) for q in range(4) for r in range(2)
                       for c in b.mv[q][r]])
            got = [int(v) for v in blocks[li, k]]
            assert _canon(got) == _canon(want), \
                f"lane {li} block {k}: {got} != {want}"
    W64 = dec.sb_cols * 64
    H64 = dec.sb_rows * 64
    W64u, H64u = W64 >> h.ss_h, H64 >> h.ss_v
    ysz, usz = H64 * W64, H64u * W64u
    dense = np.zeros(ysz + 2 * usz, np.int64)
    for li in range(len(lanes)):
        k = int(ncp[li])
        pos = np.asarray(cpairs[li, :k, 0])
        dense[pos] = np.asarray(cpairs[li, :k, 1])
    want = np.concatenate([
        np.asarray(s.coef_y, np.int64).reshape(-1),
        np.asarray(s.coef_u, np.int64).reshape(-1),
        np.asarray(s.coef_v, np.int64).reshape(-1)])
    bad = np.nonzero(dense != want)[0]
    assert len(bad) == 0, f"{len(bad)} coef diffs, first {bad[:4]}"
    c16 = dec.sb_cols * 16
    c16u = c16 >> h.ss_h
    eysz, eusz = (H64 // 4) * c16, (H64u // 4) * c16u
    edense = np.zeros(eysz + 2 * eusz, np.int64)
    for li in range(len(lanes)):
        k = int(nep[li])
        pos = np.asarray(epairs[li, :k, 0])
        edense[pos] = np.asarray(epairs[li, :k, 1])
    ewant = np.concatenate([
        np.asarray(s.eob_y, np.int64).reshape(-1),
        np.asarray(s.eob_u, np.int64).reshape(-1),
        np.asarray(s.eob_v, np.int64).reshape(-1)])
    ebad = np.nonzero(edense != ewant)[0]
    assert len(ebad) == 0, f"{len(ebad)} eob diffs, first {ebad[:4]}"


CASES = [
    dict(w=128, h=128, seed=2, txfmmode=3),       # all tx sizes
    dict(w=130, h=70, seed=4, txfmmode=3),        # partial edge SBs
    dict(w=512, h=128, seed=5, txfmmode=3,
         tile_cols_log2=1),                       # 2 lockstep lanes
    dict(w=96, h=64, seed=7, txfmmode=0),         # all-4x4 (per-4x4
                                                  # mode txtypes)
    dict(w=128, h=128, seed=41, txfmmode=4),      # TX_SWITCHABLE:
                                                  # per-block tx ladder
    dict(w=130, h=70, seed=42, txfmmode=4),       # switchable + edges
    dict(w=130, h=70, seed=51, txfmmode=3,
         refreshctx=1),                           # backward adaptation:
                                                  # coef/eob counts
]


VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")


def _load_stream(name):
    from ffmpeg_hybrid_tpu.formats.ivf import read_ivf
    from ffmpeg_hybrid_tpu.formats.superframe import split_superframe
    path = os.path.join(VEC_DIR, name + ".ivf")
    if not os.path.exists(path):
        pytest.skip(f"vector {name} not generated")
    _info, pkts = read_ivf(path)
    out = []
    for pts, d in pkts:
        out.extend(fd for _, fd in split_superframe(d, pts))
    return out


# inter-frame coverage: single-ref NEW/NEAREST/NEAR/ZERO MV modes,
# compound prediction, hp MVs, switchable interp filters, temporal
# segmentation, seg REF/SKIP features, real cv2 streams with backward
# adaptation (counts compared exactly on every frame)
INTER_STREAMS = ["mini_inter", "mini_inter_mv", "mini_comp",
                 "mini_comp_sw", "mini_hp", "mini_filters",
                 "mini_seg_temporal", "mini_segref",
                 "mini_segref_comp", "inter_64_5f", "inter_66x66_5f"]


@pytest.mark.parametrize("name", INTER_STREAMS)
def test_device_passa_inter_stream(name):
    _check_stream(_load_stream(name))


# intra-syntax matrix parity with the host pass-A e2e coverage
# (VERDICT r4 weak #6): lossless WHT at 8/10/12-bit, 4:4:4, 4:2:2,
# 4:4:0, 12-bit DCT/ADST, switchable-tx at high bit depth
KF_MATRIX = ["mini_lossless_130x70", "mini_lossless10_96x64",
             "mini_lossless12_64", "mini_444_12_64", "mini_422_10_64",
             "mini_440_64", "mini_rand12_130x70", "mini_rand12_444_64",
             "mini_randsw10_96x64", "mini_randsw12_444_64"]


@pytest.mark.parametrize("name", KF_MATRIX)
def test_device_passa_kf_matrix(name):
    _check_stream(_load_stream(name))


def test_device_passa_counts_feed_adaptation():
    """A refreshctx keyframe decoded with pass_a_impl='device' must
    leave the SAME adapted frame context as the host decoder (the
    counts gate removed in r5 — vp9.c:1821-1824, vp9prob.c:48-66)."""
    pkt = _encode(dict(w=130, h=70, seed=51, txfmmode=3, refreshctx=1))
    ref = VP9Decoder(recon_backend="golden", use_native=False)
    ref.decode(pkt)
    dev = VP9Decoder(recon_backend="golden", use_native=False,
                     pass_a_impl="device")
    dev.decode(pkt)
    assert (ref.prob_ctx[0].coef == dev.prob_ctx[0].coef).all(), \
        "adapted coef context diverges"


@pytest.mark.parametrize("case", CASES, ids=lambda c: f"s{c['seed']}")
def test_device_passa_matches_host(case):
    _check(_encode(case))


def test_device_passa_wide_frame():
    """Frames wider than the base ctx bucket (264 b8 cols = 2112 px)
    select a doubled `maxc` executable instead of silently dropping
    ctx writes past the array end (advisor r4 finding)."""
    _check(_encode(dict(w=2240, h=64, seed=13, txfmmode=3)))


def test_device_passa_tile_rows_fallback():
    """tile_rows > 1: the walk gives each tile-row lane independent
    zeroed above ctx, but the reference carries above ctx across tile
    rows (vp9.c:1720) — the integrated decoder must fall back to the
    host pass A and still decode bit-exact (advisor r4 finding)."""
    import hashlib
    sys.path.insert(0, TOOLS)
    try:
        from mini_encoder import encode_keyframe_random
    finally:
        sys.path.pop(0)
    pkt = encode_keyframe_random(128, 256, 8, seed=21, txfmmode=3,
                                 yac_qi=60, filter_level=12,
                                 tile_rows_log2=1)
    ref = VP9Decoder(recon_backend="golden", use_native=False)
    [f0] = ref.decode(pkt)
    dev = VP9Decoder(recon_backend="golden", use_native=False,
                     pass_a_impl="device")
    [f1] = dev.decode(pkt)
    assert (hashlib.md5(f0.to_bytes()).hexdigest()
            == hashlib.md5(f1.to_bytes()).hexdigest())


def test_device_passa_segmentation():
    _check(_encode(dict(
        w=128, h=128, seed=9, txfmmode=3,
        seg_feat=[(20, 0, -1, 0), (-30, 0, -1, 0), (0, 0, -1, 1),
                  (40, 0, -1, 0)] + [(0, 0, -1, 0)] * 4)))


@pytest.mark.parametrize("name", ["mini_inter_mv", "mini_comp",
                                  "mini_filters", "mini_seg_temporal",
                                  "inter_64_5f", "show_existing",
                                  "superframe", "mini_scaled_mv_up"])
def test_device_passa_inter_e2e(name):
    """Integrated: VP9Decoder(pass_a_impl='device') decodes whole
    INTER streams (device entropy incl. MV prediction; recon + LF from
    the replayed records) bit-identical to the oracle framemd5."""
    import hashlib
    from ffmpeg_hybrid_tpu.formats.framemd5 import parse_framemd5
    ref_path = os.path.join(VEC_DIR, name + ".framemd5")
    if not os.path.exists(ref_path):
        pytest.skip(f"vector {name} not generated")
    want = parse_framemd5(ref_path)
    dec = VP9Decoder(recon_backend="golden", use_native=False,
                     pass_a_impl="device")
    got = []
    for pkt in _load_stream(name):
        for f in dec.decode(pkt):
            got.append(hashlib.md5(f.to_bytes()).hexdigest())
    assert len(got) == len(want), f"{len(got)} frames vs {len(want)}"
    for i, (w, g) in enumerate(zip(want, got)):
        assert g == w[1], f"frame {i}: md5 mismatch"


def test_device_passa_e2e_decode():
    """The integrated path: VP9Decoder(pass_a_impl='device') decodes
    whole frames (entropy ON DEVICE, recon + loop filter from the
    replayed records) identical to the host decoder — including
    nonzero filter_level (mask_edges replay) and 2 tile columns."""
    import hashlib
    sys.path.insert(0, TOOLS)
    try:
        from mini_encoder import encode_keyframe_random
    finally:
        sys.path.pop(0)
    for case in (dict(w=130, h=70, seed=4, filter_level=31),
                 dict(w=512, h=128, seed=5, filter_level=18,
                      tile_cols_log2=1),
                 dict(w=128, h=96, seed=11, filter_level=20, bpp=10)):
        kw = dict(case)
        w, h = kw.pop("w"), kw.pop("h")
        pkt = encode_keyframe_random(w, h, kw.pop("bpp", 8),
                                     txfmmode=3, yac_qi=60, **kw)
        ref = VP9Decoder(recon_backend="golden", use_native=False)
        [f0] = ref.decode(pkt)
        dev = VP9Decoder(recon_backend="golden", use_native=False,
                         pass_a_impl="device")
        [f1] = dev.decode(pkt)
        assert (hashlib.md5(f0.to_bytes()).hexdigest()
                == hashlib.md5(f1.to_bytes()).hexdigest()), case
