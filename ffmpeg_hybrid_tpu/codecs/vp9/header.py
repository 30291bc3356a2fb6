"""VP9 frame header parsing: uncompressed header (plain bits) and the
range-coded compressed header (probability updates).

Behavioral reference: decode_frame_header + read_colorspace_details
(reference: libavcodec/vp9.c:457-1113). This is a fresh implementation of the
same normative bitstream syntax.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ...utils.bitreader import BitReader
from . import tables as T
from .probs import Probs, coef_full
from .rac import BoolDecoder, update_prob

VP9_SYNCCODE = 0x498342

# TxfmMode
TX_4X4, TX_8X8, TX_16X16, TX_32X32 = 0, 1, 2, 3
TX_SWITCHABLE = 4
# FilterMode
FILTER_SWITCHABLE = 4
# CompPredMode
PRED_SINGLEREF, PRED_COMPREF, PRED_SWITCHABLE = 0, 1, 2


@dataclass
class SegFeature:
    q_enabled: int = 0
    q_val: int = 0
    lf_enabled: int = 0
    lf_val: int = 0
    ref_enabled: int = 0
    ref_val: int = 0
    skip_enabled: int = 0
    # derived per-segment state
    qmul: np.ndarray = field(
        default_factory=lambda: np.zeros((2, 2), np.int32))
    lflvl: np.ndarray = field(
        default_factory=lambda: np.zeros((4, 2), np.int32))


@dataclass
class Header:
    profile: int = 0
    bpp: int = 8
    bpp_index: int = 0
    bytesperpixel: int = 1
    ss_h: int = 1
    ss_v: int = 1
    keyframe: int = 0
    invisible: int = 0
    errorres: int = 0
    intraonly: int = 0
    resetctx: int = 0
    refreshrefmask: int = 0
    highprecisionmvs: int = 0
    filtermode: int = 0
    allowcompinter: int = 0
    refreshctx: int = 0
    parallelmode: int = 0
    framectxid: int = 0
    use_last_frame_mvs: int = 0
    refidx: list = field(default_factory=lambda: [0, 0, 0])
    signbias: list = field(default_factory=lambda: [0, 0, 0])
    fixcompref: int = 0
    varcompref: list = field(default_factory=lambda: [0, 0])
    # filter
    filter_level: int = 0
    sharpness: int = -1
    lf_delta_enabled: int = 0
    lf_delta_updated: int = 0
    lf_delta_ref: list = field(default_factory=lambda: [1, 0, -1, -1])
    lf_delta_mode: list = field(default_factory=lambda: [0, 0])
    # quant
    yac_qi: int = 0
    ydc_qdelta: int = 0
    uvdc_qdelta: int = 0
    uvac_qdelta: int = 0
    lossless: int = 0
    # segmentation
    seg_enabled: int = 0
    seg_temporal: int = 0
    seg_update_map: int = 0
    seg_absolute_vals: int = 0
    seg_prob: list = field(default_factory=lambda: [255] * 7)
    seg_pred_prob: list = field(default_factory=lambda: [255] * 3)
    seg_feat: list = field(default_factory=lambda: [SegFeature()
                                                    for _ in range(8)])
    # txfm/pred modes (from compressed header)
    txfmmode: int = 0
    comppredmode: int = 0
    # tiling
    log2_tile_cols: int = 0
    log2_tile_rows: int = 0
    tile_cols: int = 1
    tile_rows: int = 1
    # sizes
    width: int = 0
    height: int = 0
    uncompressed_header_size: int = 0
    uncompressed_header_bits: int = 0  # exact, pre-padding (BSF splice)
    compressed_header_size: int = 0
    # show-existing-frame short path
    show_existing_idx: int = -1


def clip_uint(v: int, bits: int) -> int:
    lo, hi = 0, (1 << bits) - 1
    return lo if v < lo else hi if v > hi else v


def _read_colorspace(gb: BitReader, h: Header):
    """reference: read_colorspace_details, vp9.c:457-519."""
    bits = 0 if h.profile <= 1 else 1 + gb.get_bit()
    h.bpp_index = bits
    h.bpp = 8 + bits * 2
    h.bytesperpixel = (7 + h.bpp) >> 3
    colorspace = gb.get(3)
    if colorspace == 7:  # RGB
        h.ss_h = h.ss_v = 0
        if h.profile & 1:
            if gb.get_bit():
                raise ValueError("Reserved bit set in RGB")
        else:
            raise ValueError(f"RGB not supported in profile {h.profile}")
    else:
        gb.get_bit()  # color range
        if h.profile & 1:
            h.ss_h = gb.get_bit()
            h.ss_v = gb.get_bit()
            if h.ss_h and h.ss_v:
                raise ValueError(f"4:2:0 not supported in profile {h.profile}")
            if gb.get_bit():
                raise ValueError("reserved bit set")
        else:
            h.ss_h = h.ss_v = 1


def parse_uncompressed_header(data: bytes, state) -> Header:
    """Parse the uncompressed header. `state` is the VP9Decoder carrying
    cross-frame context (previous header, ref slot sizes, filter LUT).

    Returns the Header; raises ValueError on invalid bitstreams.
    """
    gb = BitReader(data)
    h = Header()
    prev = state.header  # may be None

    if gb.get(2) != 0x2:
        raise ValueError("Invalid frame marker")
    profile = gb.get_bit()
    profile |= gb.get_bit() << 1
    if profile == 3:
        profile += gb.get_bit()
    if profile > 3:
        raise ValueError(f"Profile {profile} not supported")
    h.profile = profile
    if gb.get_bit():  # show_existing_frame
        h.show_existing_idx = gb.get(3)
        return h

    state.last_keyframe = prev.keyframe if prev else 0
    last_invisible = prev.invisible if prev else 0
    h.keyframe = not gb.get_bit()
    h.invisible = not gb.get_bit()
    h.errorres = gb.get_bit()
    h.use_last_frame_mvs = (not h.errorres) and (not last_invisible)
    # carry persistent defaults from previous frame
    if prev is not None:
        h.sharpness = prev.sharpness
        h.lf_delta_ref = list(prev.lf_delta_ref)
        h.lf_delta_mode = list(prev.lf_delta_mode)
        h.seg_feat = [SegFeature(
            f.q_enabled, f.q_val, f.lf_enabled, f.lf_val, f.ref_enabled,
            f.ref_val, f.skip_enabled) for f in prev.seg_feat]
        h.seg_prob = list(prev.seg_prob)
        h.seg_pred_prob = list(prev.seg_pred_prob)
        h.bpp = prev.bpp
        h.bpp_index = prev.bpp_index
        h.bytesperpixel = prev.bytesperpixel
        h.ss_h, h.ss_v = prev.ss_h, prev.ss_v

    if h.keyframe:
        if gb.get(24) != VP9_SYNCCODE:
            raise ValueError("Invalid sync code")
        _read_colorspace(gb, h)
        h.refreshrefmask = 0xFF
        w = gb.get(16) + 1
        hh = gb.get(16) + 1
        if gb.get_bit():  # display size
            gb.get(32)
    else:
        h.intraonly = gb.get_bit() if h.invisible else 0
        h.resetctx = 0 if h.errorres else gb.get(2)
        if h.intraonly:
            if gb.get(24) != VP9_SYNCCODE:
                raise ValueError("Invalid sync code")
            if h.profile >= 1:
                _read_colorspace(gb, h)
            else:
                h.ss_h = h.ss_v = 1
                h.bpp = 8
                h.bpp_index = 0
                h.bytesperpixel = 1
            h.refreshrefmask = gb.get(8)
            w = gb.get(16) + 1
            hh = gb.get(16) + 1
            if gb.get_bit():
                gb.get(32)
        else:
            h.refreshrefmask = gb.get(8)
            for i in range(3):
                h.refidx[i] = gb.get(3)
                h.signbias[i] = gb.get_bit() and not h.errorres
            if any(state.refs[h.refidx[i]] is None for i in range(3)):
                raise ValueError("Not all references are available")
            if gb.get_bit():
                w, hh = state.refs[h.refidx[0]].size
            elif gb.get_bit():
                w, hh = state.refs[h.refidx[1]].size
            elif gb.get_bit():
                w, hh = state.refs[h.refidx[2]].size
            else:
                w = gb.get(16) + 1
                hh = gb.get(16) + 1
            h.use_last_frame_mvs &= (
                state.cur_frame is not None
                and state.cur_frame.size == (w, hh))
            if gb.get_bit():
                gb.get(32)
            h.highprecisionmvs = gb.get_bit()
            h.filtermode = FILTER_SWITCHABLE if gb.get_bit() else gb.get(2)
            h.allowcompinter = (h.signbias[0] != h.signbias[1]
                                or h.signbias[0] != h.signbias[2])
            if h.allowcompinter:
                if h.signbias[0] == h.signbias[1]:
                    h.fixcompref, h.varcompref = 2, [0, 1]
                elif h.signbias[0] == h.signbias[2]:
                    h.fixcompref, h.varcompref = 1, [0, 2]
                else:
                    h.fixcompref, h.varcompref = 0, [1, 2]

    h.refreshctx = 0 if h.errorres else gb.get_bit()
    h.parallelmode = 1 if h.errorres else gb.get_bit()
    h.framectxid = gb.get(2)
    if h.keyframe or h.intraonly:
        h.framectxid = 0  # BUG: libvpx ignores this field in keyframes

    # loopfilter header
    if h.keyframe or h.errorres or h.intraonly:
        h.lf_delta_ref = [1, 0, -1, -1]
        h.lf_delta_mode = [0, 0]
        h.seg_feat = [SegFeature() for _ in range(8)]
    h.filter_level = gb.get(6)
    sharp = gb.get(3)
    if h.sharpness != sharp:
        # rebuild E/I limit LUTs (reference: vp9.c:673-686)
        lim = np.arange(64, dtype=np.int32)
        limit = lim.copy()
        if sharp > 0:
            limit = np.minimum(limit >> ((sharp + 3) >> 2), 9 - sharp)
        limit = np.maximum(limit, 1)
        state.lim_lut = limit
        state.mblim_lut = 2 * (lim + 2) + limit
        state.lim_lut[0] = state.mblim_lut[0] = 0  # level 0 unused
    h.sharpness = sharp
    h.lf_delta_enabled = gb.get_bit()
    if h.lf_delta_enabled:
        h.lf_delta_updated = gb.get_bit()
        if h.lf_delta_updated:
            for i in range(4):
                if gb.get_bit():
                    h.lf_delta_ref[i] = gb.get_sbits_inv(6)
            for i in range(2):
                if gb.get_bit():
                    h.lf_delta_mode[i] = gb.get_sbits_inv(6)

    # quantization
    h.yac_qi = gb.get(8)
    h.ydc_qdelta = gb.get_sbits_inv(4) if gb.get_bit() else 0
    h.uvdc_qdelta = gb.get_sbits_inv(4) if gb.get_bit() else 0
    h.uvac_qdelta = gb.get_sbits_inv(4) if gb.get_bit() else 0
    h.lossless = (h.yac_qi == 0 and h.ydc_qdelta == 0 and h.uvdc_qdelta == 0
                  and h.uvac_qdelta == 0)

    # segmentation
    h.seg_enabled = gb.get_bit()
    if h.seg_enabled:
        h.seg_update_map = gb.get_bit()
        if h.seg_update_map:
            h.seg_prob = [gb.get(8) if gb.get_bit() else 255
                          for _ in range(7)]
            h.seg_temporal = gb.get_bit()
            if h.seg_temporal:
                h.seg_pred_prob = [gb.get(8) if gb.get_bit() else 255
                                   for _ in range(3)]
        if gb.get_bit():  # update data
            h.seg_absolute_vals = gb.get_bit()
            for i in range(8):
                f = h.seg_feat[i]
                f.q_enabled = gb.get_bit()
                if f.q_enabled:
                    f.q_val = gb.get_sbits_inv(8)
                f.lf_enabled = gb.get_bit()
                if f.lf_enabled:
                    f.lf_val = gb.get_sbits_inv(6)
                f.ref_enabled = gb.get_bit()
                if f.ref_enabled:
                    f.ref_val = gb.get(2)
                f.skip_enabled = gb.get_bit()
    else:
        h.seg_temporal = 0
        h.seg_update_map = 0

    # derived per-segment qmul / loop-filter levels (reference: vp9.c:746-792)
    for i in range(8 if h.seg_enabled else 1):
        f = h.seg_feat[i]
        if h.seg_enabled and f.q_enabled:
            if h.seg_absolute_vals:
                qyac = clip_uint(f.q_val, 8)
            else:
                qyac = clip_uint(h.yac_qi + f.q_val, 8)
        else:
            qyac = h.yac_qi
        qydc = clip_uint(qyac + h.ydc_qdelta, 8)
        quvdc = clip_uint(qyac + h.uvdc_qdelta, 8)
        quvac = clip_uint(qyac + h.uvac_qdelta, 8)
        qyac = clip_uint(qyac, 8)
        f.qmul[0, 0] = T.DC_QLOOKUP[h.bpp_index][qydc]
        f.qmul[0, 1] = T.AC_QLOOKUP[h.bpp_index][qyac]
        f.qmul[1, 0] = T.DC_QLOOKUP[h.bpp_index][quvdc]
        f.qmul[1, 1] = T.AC_QLOOKUP[h.bpp_index][quvac]

        sh = 1 if h.filter_level >= 32 else 0
        if h.seg_enabled and f.lf_enabled:
            if h.seg_absolute_vals:
                lflvl = clip_uint(f.lf_val, 6)
            else:
                lflvl = clip_uint(h.filter_level + f.lf_val, 6)
        else:
            lflvl = h.filter_level
        if h.lf_delta_enabled:
            f.lflvl[0, 0] = f.lflvl[0, 1] = clip_uint(
                lflvl + (h.lf_delta_ref[0] << sh), 6)
            for j in range(1, 4):
                f.lflvl[j, 0] = clip_uint(
                    lflvl + ((h.lf_delta_ref[j] + h.lf_delta_mode[0]) << sh),
                    6)
                f.lflvl[j, 1] = clip_uint(
                    lflvl + ((h.lf_delta_ref[j] + h.lf_delta_mode[1]) << sh),
                    6)
        else:
            f.lflvl[:] = lflvl

    h.width, h.height = w, hh
    sb_cols = (w + 63) >> 6
    # tiling (reference: vp9.c:797-812)
    log2cols = 0
    while sb_cols > (64 << log2cols):
        log2cols += 1
    mx = 0
    while (sb_cols >> mx) >= 4:
        mx += 1
    mx = max(0, mx - 1)
    while mx > log2cols:
        if gb.get_bit():
            log2cols += 1
        else:
            break
    h.log2_tile_cols = log2cols
    # decode012
    if not gb.get_bit():
        h.log2_tile_rows = 0
    else:
        h.log2_tile_rows = 1 + gb.get_bit()
    h.tile_cols = 1 << h.log2_tile_cols
    h.tile_rows = 1 << h.log2_tile_rows

    h.compressed_header_size = gb.get(16)
    h.uncompressed_header_bits = gb.bits_consumed()
    h.uncompressed_header_size = (gb.bits_consumed() + 7) // 8
    if h.compressed_header_size > len(data) - h.uncompressed_header_size:
        raise ValueError("Invalid compressed header size")
    return h


def parse_compressed_header(data: bytes, h: Header, probs: Probs):
    """Parse the range-coded compressed header, updating `probs` in place.

    `probs` must be a copy of the selected frame context on entry.
    Returns (coef_probs_full[4][2][2][6][6][11], BoolDecoder) — the decoder is
    positioned after the header and is NOT used further (per-tile coders are
    separate).

    Behavioral reference: vp9.c:908-1113.
    """
    c = BoolDecoder(data)
    if c.get():  # marker bit
        raise ValueError("Marker bit was set")

    # txfm mode
    if h.lossless:
        h.txfmmode = TX_4X4
    else:
        h.txfmmode = c.get_uint(2)
        if h.txfmmode == 3:
            h.txfmmode += c.get()
        if h.txfmmode == TX_SWITCHABLE:
            for i in range(2):
                if c.get_prob(252):
                    probs.tx8p[i] = update_prob(c, int(probs.tx8p[i]))
            for i in range(2):
                for j in range(2):
                    if c.get_prob(252):
                        probs.tx16p[i, j] = update_prob(
                            c, int(probs.tx16p[i, j]))
            for i in range(2):
                for j in range(3):
                    if c.get_prob(252):
                        probs.tx32p[i, j] = update_prob(
                            c, int(probs.tx32p[i, j]))

    # coef prob updates; ref is the frame-context coef (already in probs.coef
    # since probs is a copy of the context)
    new_coef = probs.coef.copy()
    for i in range(4):
        if c.get():
            for j in range(2):
                for k in range(2):
                    for l in range(6):
                        for m in range(6):
                            if m >= 3 and l == 0:  # dc only has 3 pt
                                break
                            for n in range(3):
                                if c.get_prob(252):
                                    new_coef[i, j, k, l, m, n] = update_prob(
                                        c, int(probs.coef[i, j, k, l, m, n]))
        if h.txfmmode == i:
            break
    probs.coef = new_coef
    coef11 = coef_full(new_coef)

    # mode updates
    for i in range(3):
        if c.get_prob(252):
            probs.skip[i] = update_prob(c, int(probs.skip[i]))
    if not h.keyframe and not h.intraonly:
        for i in range(7):
            for j in range(3):
                if c.get_prob(252):
                    probs.mv_mode[i, j] = update_prob(
                        c, int(probs.mv_mode[i, j]))
        if h.filtermode == FILTER_SWITCHABLE:
            for i in range(4):
                for j in range(2):
                    if c.get_prob(252):
                        probs.filter[i, j] = update_prob(
                            c, int(probs.filter[i, j]))
        for i in range(4):
            if c.get_prob(252):
                probs.intra[i] = update_prob(c, int(probs.intra[i]))
        if h.allowcompinter:
            h.comppredmode = c.get()
            if h.comppredmode:
                h.comppredmode += c.get()
            if h.comppredmode == PRED_SWITCHABLE:
                for i in range(5):
                    if c.get_prob(252):
                        probs.comp[i] = update_prob(c, int(probs.comp[i]))
        else:
            h.comppredmode = PRED_SINGLEREF
        if h.comppredmode != PRED_COMPREF:
            for i in range(5):
                if c.get_prob(252):
                    probs.single_ref[i, 0] = update_prob(
                        c, int(probs.single_ref[i, 0]))
                if c.get_prob(252):
                    probs.single_ref[i, 1] = update_prob(
                        c, int(probs.single_ref[i, 1]))
        if h.comppredmode != PRED_SINGLEREF:
            for i in range(5):
                if c.get_prob(252):
                    probs.comp_ref[i] = update_prob(c, int(probs.comp_ref[i]))
        for i in range(4):
            for j in range(9):
                if c.get_prob(252):
                    probs.y_mode[i, j] = update_prob(
                        c, int(probs.y_mode[i, j]))
        for i in range(4):
            for j in range(4):
                for k in range(3):
                    if c.get_prob(252):
                        probs.partition[3 - i, j, k] = update_prob(
                            c, int(probs.partition[3 - i, j, k]))
        # mv probs: plain 7-bit updates, not subexp (reference: vp9.c:1063)
        def mvp(cur):
            return (c.get_uint(7) << 1) | 1

        for i in range(3):
            if c.get_prob(252):
                probs.mv_joint[i] = mvp(None)
        for i in range(2):
            if c.get_prob(252):
                probs.mv_sign[i] = mvp(None)
            for j in range(10):
                if c.get_prob(252):
                    probs.mv_classes[i, j] = mvp(None)
            if c.get_prob(252):
                probs.mv_class0[i] = mvp(None)
            for j in range(10):
                if c.get_prob(252):
                    probs.mv_bits[i, j] = mvp(None)
        for i in range(2):
            for j in range(2):
                for k in range(3):
                    if c.get_prob(252):
                        probs.mv_class0_fp[i, j, k] = mvp(None)
            for j in range(3):
                if c.get_prob(252):
                    probs.mv_fp[i, j] = mvp(None)
        if h.highprecisionmvs:
            for i in range(2):
                if c.get_prob(252):
                    probs.mv_class0_hp[i] = mvp(None)
                if c.get_prob(252):
                    probs.mv_hp[i] = mvp(None)

    return coef11, c
