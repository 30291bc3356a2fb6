#!/usr/bin/env python3
"""Minimal conformant VP9 encoder for conformance vectors that no local
encoder can produce (profile 2 high bit depth, lossless, intra-only).

Produces keyframes with all-skip DC-predicted superblocks (optionally
with coefficients in later revisions). The bool encoder is the exact
inverse of the spec decoder (big-integer low/range formulation, so no
carry propagation); validated by decoding with the oracle.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ffmpeg_hybrid_tpu.codecs.vp9 import tables as T


class BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def bytes(self):
        out = bytearray()
        b = 0
        for i, bit in enumerate(self.bits):
            b = (b << 1) | bit
            if i % 8 == 7:
                out.append(b)
                b = 0
        rem = len(self.bits) % 8
        if rem:
            out.append(b << (8 - rem))
        return bytes(out)


class BoolEncoder:
    """Inverse of the spec bool decoder: the decoder reads an 8-bit
    window then appends one bit per renormalization; so the codeword is
    `low` over (8 + renorms) bits."""

    def __init__(self):
        self.low = 0
        self.range = 255
        self.nbits = 8

    def put(self, bit, prob):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.low += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            self.low <<= 1
            self.nbits += 1

    def put_literal(self, v, n):
        for i in range(n - 1, -1, -1):
            self.put((v >> i) & 1, 128)

    def put_tree(self, tree, probs, value):
        """Encode `value` along the token tree (leaves are -value)."""
        # find path by walking from root
        path = []

        def walk(i, acc):
            for b in (0, 1):
                nxt = int(tree[i][b])
                if nxt <= 0:
                    if -nxt == value:
                        path.extend(acc + [(i, b)])
                        return True
                else:
                    if walk(nxt, acc + [(i, b)]):
                        return True
            return False

        assert walk(0, []), f"value {value} not in tree"
        for node, bit in path:
            self.put(bit, int(probs[node]))

    def bytes(self):
        n_bytes = (self.nbits + 7) // 8
        pad = n_bytes * 8 - self.nbits
        return (self.low << pad).to_bytes(n_bytes, "big")


def _inv_wht1d(o):
    """Exact inverse of the decoder's iwht lifting (per last-axis row)."""
    o0, o1, o2, o3 = o[..., 0], o[..., 1], o[..., 2], o[..., 3]
    t0 = o0 + o1
    t3 = o3 - o2
    t4 = (t0 - t3) >> 1
    i1 = t4 - o1
    i2 = t4 - o2
    i0 = t0 - i2
    i3 = t3 + i1
    return np.stack([i0, i2, i3, i1], axis=-1)


def fwht_tokens(res):
    """Forward WHT: residual [4,4] -> bitstream tokens [4,4] such that
    dequant (x4) + the decoder's iwht reproduces `res` exactly."""
    res = res.astype(np.int64)
    tmp = _inv_wht1d(res.swapaxes(-1, -2)).swapaxes(-1, -2)
    return _inv_wht1d(tmp).swapaxes(-1, -2)


CAT6_PROBS_8 = [254, 254, 254, 252, 249, 243, 230, 196, 177, 153, 140,
                133, 130, 129]


def _finish(hdr, chdr, tile):
    """A trailing byte matching the superframe marker pattern (110xxxxx)
    would make parsers read a bogus superframe index; defuse with a pad
    byte (ignored by the bool decoder)."""
    pkt = hdr + chdr + tile
    if (pkt[-1] & 0xE0) == 0xC0:
        pkt += b"\x00"
    return pkt


class CoeffEncoder:
    """Mirror of the decoder's coefficient loop (blockdec.py
    decode_coeffs_block) for any tx size's tokens."""

    BAND_COUNTS = [1, 2, 3, 4, 3, 3, 0, 0]

    def __init__(self, t, bpp):
        self.t = t
        self.bpp = bpp

    def encode_block(self, vals, probs11, nnz, scan, nb, n=16,
                     band_counts=None):
        """vals: int [sz][sz] raster tokens. Returns eob."""
        t = self.t
        bc = self.BAND_COUNTS if band_counts is None else band_counts
        flat = vals.reshape(-1)
        nzpos = [i for i in range(n) if flat[scan[i]]]
        eob = (nzpos[-1] + 1) if nzpos else 0
        cache = np.zeros(n, np.int64)
        band = 0
        band_left = bc[0]
        tp = probs11[0][nnz]
        i = 0
        while i < eob:
            t.put(1, int(tp[0]))  # more coefficients
            while flat[scan[i]] == 0:
                t.put(0, int(tp[1]))
                band_left -= 1
                if not band_left:
                    band += 1
                    band_left = bc[band]
                cache[scan[i]] = 0
                nnz = (1 + cache[nb[i][0]] + cache[nb[i][1]]) >> 1
                tp = probs11[min(band, 5)][nnz]
                i += 1
            rc = int(scan[i])
            v = int(flat[rc])
            val = abs(v)
            t.put(1, int(tp[1]))  # nonzero
            if val == 1:
                t.put(0, int(tp[2]))
                cache[rc] = 1
            else:
                t.put(1, int(tp[2]))
                if val <= 4:
                    t.put(0, int(tp[3]))
                    if val == 2:
                        t.put(0, int(tp[4]))
                        cache[rc] = 2
                    else:
                        t.put(1, int(tp[4]))
                        t.put(val - 3, int(tp[5]))
                        cache[rc] = 3
                elif val <= 10:
                    t.put(1, int(tp[3]))
                    t.put(0, int(tp[6]))
                    cache[rc] = 4
                    if val <= 6:
                        t.put(0, int(tp[7]))
                        t.put(val - 5, 159)
                    else:
                        t.put(1, int(tp[7]))
                        t.put((val - 7) >> 1, 165)
                        t.put((val - 7) & 1, 145)
                else:
                    t.put(1, int(tp[3]))
                    t.put(1, int(tp[6]))
                    cache[rc] = 5
                    if val <= 34:
                        t.put(0, int(tp[8]))
                        if val <= 18:
                            t.put(0, int(tp[9]))
                            d = val - 11
                            t.put((d >> 2) & 1, 173)
                            t.put((d >> 1) & 1, 148)
                            t.put(d & 1, 140)
                        else:
                            t.put(1, int(tp[9]))
                            d = val - 19
                            t.put((d >> 3) & 1, 176)
                            t.put((d >> 2) & 1, 155)
                            t.put((d >> 1) & 1, 140)
                            t.put(d & 1, 135)
                    elif val <= 66:
                        t.put(1, int(tp[8]))
                        t.put(0, int(tp[10]))
                        d = val - 35
                        for bitpos, pr in zip(range(4, -1, -1),
                                              (180, 157, 141, 134, 130)):
                            t.put((d >> bitpos) & 1, pr)
                    else:
                        t.put(1, int(tp[8]))
                        t.put(1, int(tp[10]))
                        d = val - 67
                        probs = list(CAT6_PROBS_8)
                        if self.bpp == 10:
                            probs = [255, 255] + probs
                        elif self.bpp == 12:
                            probs = [255, 255, 255, 255] + probs
                        nb_bits = len(probs)
                        for k in range(nb_bits):
                            t.put((d >> (nb_bits - 1 - k)) & 1, probs[k])
            band_left -= 1
            if not band_left:
                band += 1
                band_left = bc[band]
            t.put(1 if v < 0 else 0, 128)  # sign
            i += 1
            if i >= n:
                break
            nnz = (1 + cache[nb[i - 1][0]] + cache[nb[i - 1][1]]) >> 1
            tp = probs11[min(band, 5)][nnz]
        if eob < n:
            t.put(0, int(tp[0]))  # end of block
        return eob


SEG_TREE_PROBS = [128] * 7


def _put_sbits_inv(gb, val, nbits):
    """get_sbits_inv inverse: nbits magnitude then sign bit (1 = neg)."""
    gb.put(abs(val), nbits)
    gb.put(1 if val < 0 else 0, 1)


def _put_lf_deltas(gb, lf_deltas):
    """Loop-filter delta syntax (vp9.c:688-698). lf_deltas is None
    (disabled) or (ref_deltas[4], mode_deltas[2]) with None entries
    meaning 'no update bit' (decoder keeps its current value)."""
    if lf_deltas is None:
        gb.put(0, 1)               # lf delta enabled = 0
        return
    ref_d, mode_d = lf_deltas
    gb.put(1, 1)                   # enabled
    gb.put(1, 1)                   # updated
    for i in range(4):
        if ref_d[i] is None:
            gb.put(0, 1)
        else:
            gb.put(1, 1)
            _put_sbits_inv(gb, ref_d[i], 6)
    for i in range(2):
        if mode_d[i] is None:
            gb.put(0, 1)
        else:
            gb.put(1, 1)
            _put_sbits_inv(gb, mode_d[i], 6)


def _put_seg_features(gb, seg_feat, seg_abs):
    """Segmentation header with per-segment FEATURE data
    (vp9.c:714-741). seg_feat: 8 tuples (q, lf, ref, skip) where
    q/lf/ref are None (feature off) or the value; skip is bool.
    Explicit map, tree probs 128, no temporal prediction."""
    gb.put(1, 1)                   # enabled
    gb.put(1, 1)                   # update_map
    for p in SEG_TREE_PROBS:
        gb.put(1, 1)
        gb.put(p, 8)
    gb.put(0, 1)                   # temporal
    gb.put(1, 1)                   # update data
    gb.put(seg_abs, 1)             # absolute values
    for sid in range(8):
        q, lf, ref, skip = seg_feat[sid]
        if q is None:
            gb.put(0, 1)
        else:
            gb.put(1, 1)
            _put_sbits_inv(gb, q, 8)
        if lf is None:
            gb.put(0, 1)
        else:
            gb.put(1, 1)
            _put_sbits_inv(gb, lf, 6)
        if ref is None:
            gb.put(0, 1)
        else:
            gb.put(1, 1)
            gb.put(ref, 2)
        gb.put(1 if skip else 0, 1)


def _header_bits(w, h, bpp, intraonly=False, ss_h=1, ss_v=1, seg=False,
                 yac_qi=0, filter_level=0, sharpness=0, tile_cols_log2=0,
                 tile_rows_log2=0, seg_feat=None, seg_abs=0, refreshctx=0,
                 lf_deltas=None):
    """Uncompressed header bits up to (excl.) the compressed header size
    field. Keyframe, or an invisible intra-only frame (refreshing slot
    0). Lossless, no segmentation, single tile. Non-4:2:0 subsampling
    selects profile 1 (8-bit) / 3 (HBD); vp9.c:457-517 colorspace
    syntax. seg_feat/seg_abs: per-segment feature data
    (_put_seg_features); lf_deltas: ref/mode delta update
    (_put_lf_deltas)."""
    if ss_h and ss_v:
        profile = 0 if bpp == 8 else 2
    else:
        profile = 1 if bpp == 8 else 3
    gb = BitWriter()
    gb.put(0b10, 2)                # frame marker
    gb.put(profile & 1, 1)         # profile low bit
    gb.put((profile >> 1) & 1, 1)  # profile high bit
    if profile == 3:
        gb.put(0, 1)               # reserved
    gb.put(0, 1)                   # show_existing_frame
    gb.put(1 if intraonly else 0, 1)  # frame type (1 = non-key)
    gb.put(0 if intraonly else 1, 1)  # show_frame
    gb.put(0, 1)                   # error_resilient
    if intraonly:
        gb.put(1, 1)               # intra_only
        gb.put(0, 2)               # reset_frame_context
        gb.put(0x498342, 24)       # sync code
        assert profile == 0, "intra-only helper is profile 0 only"
        gb.put(0x01, 8)            # refresh slot 0
    else:
        gb.put(0x498342, 24)       # sync code
        if profile >= 2:
            gb.put(0 if bpp == 10 else 1, 1)  # ten/twelve bit
        gb.put(0, 3)               # colorspace: unspecified
        gb.put(0, 1)               # color range
        if profile & 1:
            gb.put(ss_h, 1)
            gb.put(ss_v, 1)
            gb.put(0, 1)           # reserved
        # profile 0/2: 4:2:0 implied, no subsampling bits
    gb.put(w - 1, 16)
    gb.put(h - 1, 16)
    gb.put(0, 1)                   # no display size
    gb.put(refreshctx, 1)          # refresh_frame_context
    gb.put(0, 1)                   # frame_parallel_decoding_mode
    gb.put(0, 2)                   # frame_context_idx
    # loop filter
    gb.put(filter_level, 6)        # level
    gb.put(sharpness, 3)           # sharpness
    _put_lf_deltas(gb, lf_deltas)
    # quant (yac_qi == 0 with zero deltas -> lossless)
    gb.put(yac_qi, 8)              # yac_qi
    gb.put(0, 1)
    gb.put(0, 1)
    gb.put(0, 1)
    if seg_feat is not None:
        _put_seg_features(gb, seg_feat, seg_abs)
    elif seg:
        # segmentation: explicit map (tree probs 128), no temporal
        # prediction; segment 1 has the SKIP feature
        gb.put(1, 1)               # enabled
        gb.put(1, 1)               # update_map
        for p in SEG_TREE_PROBS:
            gb.put(1, 1)
            gb.put(p, 8)
        gb.put(0, 1)               # temporal
        gb.put(1, 1)               # update data
        gb.put(0, 1)               # absolute values
        for sid in range(8):
            gb.put(0, 1)           # q feature
            gb.put(0, 1)           # lf feature
            gb.put(0, 1)           # ref feature
            gb.put(1 if sid == 1 else 0, 1)  # skip feature
    else:
        gb.put(0, 1)               # segmentation disabled
    # tiling
    sb_cols = (w + 63) >> 6
    min_log2 = 0
    while sb_cols > (64 << min_log2):
        min_log2 += 1
    mx = 0
    while (sb_cols >> mx) >= 4:
        mx += 1
    mx = max(0, mx - 1)
    # tile cols: emit 1-bits up to the requested log2, then a 0 stop bit
    # (unless at max); mirrors the decoder's increment loop (vp9.c:800-806)
    log2cols = max(min_log2, tile_cols_log2)
    assert log2cols <= mx or log2cols == min_log2, "tile_cols beyond max"
    cur = min_log2
    while mx > cur:
        if cur < log2cols:
            gb.put(1, 1)
            cur += 1
        else:
            gb.put(0, 1)
            break
    # log2_tile_rows: decode012
    if tile_rows_log2 == 0:
        gb.put(0, 1)
    else:
        gb.put(1, 1)
        gb.put(tile_rows_log2 - 1, 1)
    return gb


def encode_keyframe_gray(w, h, bpp=8):
    """All-skip DC-predicted lossless keyframe (uniform mid-gray)."""
    gb = _header_bits(w, h, bpp)

    # compressed header
    c = BoolEncoder()
    c.put(0, 128)                  # marker bit
    # lossless -> no txfm mode; coef update flag for i=0 only
    c.put(0, 128)
    # skip prob updates: 3 gate bits at prob 252
    for _ in range(3):
        c.put(0, 252)
    chdr = c.bytes()

    gb.put(len(chdr), 16)
    hdr = gb.bytes()

    # tile data: single tile, mirroring decode_sb's partition walk with
    # the largest block at each level (NONE / edge-implied H, V, SPLIT)
    t = BoolEncoder()
    t.put(0, 128)                  # marker bit
    sb_cols = (w + 63) >> 6
    sb_rows = (h + 63) >> 6
    cols = (w + 7) >> 3
    rows = (h + 7) >> 3
    kf_part = T.DEFAULT_KF_PARTITION_PROBS
    ptree = T.PARTITION_TREE
    imtree = T.INTRAMODE_TREE
    DC = 2
    LEFT_CTX = [0x0, 0x8, 0x0, 0x8, 0xC, 0x8, 0xC, 0xE, 0xC, 0xE]
    ABOVE_CTX = [0x0, 0x0, 0x8, 0x8, 0x8, 0xC, 0xC, 0xC, 0xE, 0xE]
    BWH = T.BWH_TAB[1]

    above_part = np.zeros(sb_cols * 8, np.uint8)
    above_skip = np.zeros(sb_cols * 8, np.uint8)
    left = {"part": np.zeros(8, np.uint8), "skip": np.zeros(8, np.uint8)}

    def encode_block(r, c, bl, bp):
        bs = bl * 3 + bp
        row7 = r & 7
        sctx = int(left["skip"][row7]) + int(above_skip[c])
        t.put(1, int(T.PROBS_SKIP[sctx]))          # skip = 1
        t.put_tree(imtree, T.DEFAULT_KF_YMODE_PROBS[DC][DC], DC)
        t.put_tree(imtree, T.DEFAULT_KF_UVMODE_PROBS[DC], DC)
        nw = int(BWH[bs][0])
        nh = int(BWH[bs][1])
        above_skip[c:c + nw] = 1
        above_part[c:c + nw] = ABOVE_CTX[bs]
        left["skip"][row7:row7 + nh] = 1
        left["part"][row7:row7 + nh] = LEFT_CTX[bs]

    def encode_sb(r, c, bl):
        ctx = ((int(above_part[c]) >> (3 - bl)) & 1) | \
              (((int(left["part"][r & 7]) >> (3 - bl)) & 1) << 1)
        p = kf_part[bl][ctx]
        hbs = 4 >> bl
        if bl == 3:
            t.put_tree(ptree, p, 0)                # NONE
            encode_block(r, c, bl, 0)
        elif c + hbs < cols:
            if r + hbs < rows:
                t.put_tree(ptree, p, 0)            # NONE
                encode_block(r, c, bl, 0)
            else:
                t.put(0, int(p[1]))                # PARTITION_H (implied)
                encode_block(r, c, bl, 1)
        elif r + hbs < rows:
            t.put(0, int(p[2]))                    # PARTITION_V (implied)
            encode_block(r, c, bl, 2)
        else:
            encode_sb(r, c, bl + 1)                # implicit split

    for r in range(0, sb_rows * 8, 8):
        left["part"][:] = 0
        left["skip"][:] = 0
        for ccol in range(0, sb_cols * 8, 8):
            encode_sb(r, ccol, 0)
    return _finish(hdr, chdr, t.bytes())


def encode_keyframe_lossless(y, u, v, bpp=8, intraonly=False,
                             ss_h=1, ss_v=1, seg=False):
    """Lossless keyframe with real content: DC-predicted 4x4 blocks with
    WHT-coded residuals. 4:2:0 -> profile 0 (8-bit) / 2 (10/12-bit);
    other subsamplings (4:4:4, 4:2:2, 4:4:0) -> profile 1 / 3.
    y/u/v: int arrays (u, v at the chosen subsampling)."""
    from ffmpeg_hybrid_tpu.codecs.vp9.golden import MODE_CONV, _build_edges
    from ffmpeg_hybrid_tpu.ops.intra import intra_pred
    from ffmpeg_hybrid_tpu.codecs.vp9.probs import coef_full

    h, w = y.shape
    sb_cols = (w + 63) >> 6
    sb_rows = (h + 63) >> 6
    cols = (w + 7) >> 3
    rows = (h + 7) >> 3

    # padded target planes (= the lossless reconstruction)
    def pad(p, H, W):
        out = np.zeros((H, W), np.int64)
        out[:p.shape[0], :p.shape[1]] = p
        out[:p.shape[0], p.shape[1]:] = p[:, -1:]
        out[p.shape[0]:, :] = out[p.shape[0] - 1:p.shape[0], :]
        return out

    H64, W64 = sb_rows * 64, sb_cols * 64
    py_ = pad(np.asarray(y, np.int64), H64, W64)
    pu_ = pad(np.asarray(u, np.int64), H64 >> ss_v, W64 >> ss_h)
    pv_ = pad(np.asarray(v, np.int64), H64 >> ss_v, W64 >> ss_h)

    gbs = _header_bits(w, h, bpp, intraonly=intraonly, ss_h=ss_h,
                       ss_v=ss_v, seg=seg)
    c = BoolEncoder()
    c.put(0, 128)
    c.put(0, 128)
    for _ in range(3):
        c.put(0, 252)
    chdr = c.bytes()
    gbs.put(len(chdr), 16)
    hdr = gbs.bytes()

    t = BoolEncoder()
    t.put(0, 128)
    kf_part = T.DEFAULT_KF_PARTITION_PROBS
    ptree = T.PARTITION_TREE
    imtree = T.INTRAMODE_TREE
    DC = 2
    LEFT_CTX = [0x0]
    ABOVE_CTX = [0x0]
    coef11 = coef_full(T.DEFAULT_COEF_PROBS)
    scan = T.SCANS[4][0]
    nbs = T.SCANS_NB[4][0]
    ce = CoeffEncoder(t, bpp)

    above_part = np.zeros(sb_cols * 8, np.uint8)
    above_skip = np.zeros(sb_cols * 8, np.uint8)
    a_ynnz = np.zeros(sb_cols * 16, np.uint8)
    a_uvnnz = np.zeros((2, sb_cols * 16), np.uint8)
    left = {"part": np.zeros(8, np.uint8), "skip": np.zeros(8, np.uint8),
            "ynnz": np.zeros(16, np.uint8),
            "uvnnz": np.zeros((2, 16), np.uint8)}

    def enc_plane_coeffs(plane, probs11, row, col, sh, sv, a_n, l_n,
                         tcs):
        end_x = min(2 * (cols - col), 16) >> sh
        end_y = min(2 * (rows - row), 16) >> sv
        w4full = 16 >> sh
        a0 = col << (1 - sh)
        l0 = (row & 7) << (1 - sv)
        for yy in range(0, end_y):
            for xx in range(0, end_x):
                ppy = ((row * 8) >> sv) + yy * 4
                ppx = ((col * 8) >> sh) + xx * 4
                have_top = row > 0 or yy > 0
                have_left = col > tcs or xx > 0
                have_right = xx < w4full - 1
                n_have_top = (((cols - col) << (0 if sh else 1)) - xx) * 4
                n_have_left = (((rows - row) << (0 if sv else 1)) - yy) * 4
                m = MODE_CONV[DC][1 if have_left else 0][
                    1 if have_top else 0]
                l_e, a_e = _build_edges(plane, ppy, ppx, 4, 0, m,
                                        have_top, have_left, have_right,
                                        n_have_top, n_have_left, bpp)
                pred = intra_pred(m, 4, l_e, a_e, bpp)
                res = plane[ppy:ppy + 4, ppx:ppx + 4] - pred
                toks = fwht_tokens(res)
                nnz = int(a_n[a0 + xx]) + int(l_n[l0 + yy])
                eob = ce.encode_block(toks, probs11, nnz, scan, nbs)
                a_n[a0 + xx] = l_n[l0 + yy] = 1 if eob else 0

    def encode_block(r, ccol, bl, bp):
        row7 = r & 7
        bs = bl * 3 + bp
        nw = int(T.BWH_TAB[1][bs][0])
        nh = int(T.BWH_TAB[1][bs][1])
        skip_forced = False
        if seg:
            sid = ((r >> 3) + (ccol >> 3)) & 1
            t.put_tree(T.SEGMENTATION_TREE, SEG_TREE_PROBS, sid)
            skip_forced = sid == 1
        if not skip_forced:
            sctx = int(left["skip"][row7]) + int(above_skip[ccol])
            t.put(0, int(T.PROBS_SKIP[sctx]))      # skip = 0
        t.put_tree(imtree, T.DEFAULT_KF_YMODE_PROBS[DC][DC], DC)
        t.put_tree(imtree, T.DEFAULT_KF_UVMODE_PROBS[DC], DC)
        if skip_forced:
            # decoder zeroes nnz contexts over the block span
            # (SPLAT_ZERO_YUV)
            a_ynnz[ccol * 2:(ccol + nw) * 2] = 0
            left["ynnz"][row7 * 2:(row7 + nh) * 2] = 0
            if ss_h:
                a_uvnnz[:, ccol:ccol + nw] = 0
            else:
                a_uvnnz[:, ccol * 2:(ccol + nw) * 2] = 0
            if ss_v:
                left["uvnnz"][:, row7:row7 + nh] = 0
            else:
                left["uvnnz"][:, row7 * 2:(row7 + nh) * 2] = 0
        else:
            # coefficients: Y then U, V (intra: coef11[tx][plane][0])
            enc_plane_coeffs(py_, coef11[0][0][0], r, ccol, 0, 0, a_ynnz,
                             left["ynnz"], 0)
            enc_plane_coeffs(pu_, coef11[0][1][0], r, ccol, ss_h, ss_v,
                             a_uvnnz[0], left["uvnnz"][0], 0)
            enc_plane_coeffs(pv_, coef11[0][1][0], r, ccol, ss_h, ss_v,
                             a_uvnnz[1], left["uvnnz"][1], 0)
        above_skip[ccol:ccol + nw] = 1 if skip_forced else 0
        above_part[ccol:ccol + nw] = \
            [0x0, 0x0, 0x8, 0x8][bs] if bs < 4 else 0
        left["skip"][row7:row7 + nh] = 1 if skip_forced else 0
        left["part"][row7:row7 + nh] = \
            [0x0, 0x8, 0x0, 0x8][bs] if bs < 4 else 0

    def encode_sb(r, ccol, bl):
        ctx = ((int(above_part[ccol]) >> (3 - bl)) & 1) | \
              (((int(left["part"][r & 7]) >> (3 - bl)) & 1) << 1)
        p = kf_part[bl][ctx]
        hbs = 4 >> bl
        if bl == 3:
            t.put_tree(ptree, p, 0)
            encode_block(r, ccol, bl, 0)
        elif ccol + hbs < cols:
            if r + hbs < rows:
                t.put_tree(ptree, p, 0)
                encode_block(r, ccol, bl, 0)
            else:
                t.put(0, int(p[1]))
                encode_block(r, ccol, bl, 1)
        elif r + hbs < rows:
            t.put(0, int(p[2]))
            encode_block(r, ccol, bl, 2)
        else:
            encode_sb(r, ccol, bl + 1)

    for r in range(0, sb_rows * 8, 8):
        left["part"][:] = 0
        left["skip"][:] = 0
        left["ynnz"][:] = 0
        left["uvnnz"][:] = 0
        for ccol in range(0, sb_cols * 8, 8):
            encode_sb(r, ccol, 0)
    return _finish(hdr, chdr, t.bytes())


def encode_keyframe_random(w, h, bpp=8, seed=0, txfmmode=3, yac_qi=60,
                           filter_level=24, ss_h=1, ss_v=1, sharpness=0,
                           tile_cols_log2=0, tile_rows_log2=0,
                           seg_feat=None, seg_abs=0, lf_deltas=None,
                           refreshctx=0):
    """Lossy keyframe with pseudo-random (but fully legal) syntax:
    random partitions, all 10 intra modes, random coefficient tokens at
    every tx size txfmmode allows, random skip flags, and a nonzero
    loop-filter level. Content is irrelevant for conformance — the
    oracle decodes the same bits — so no forward transform is needed;
    this exercises the decoder's dequant (vp9data.c qlookup), DCT/ADST
    at every size (incl. the int64 high-bit-depth semantics), all intra
    edge cases, and the loop filter.

    seg_feat (8 x (q, lf, ref, skip), _put_seg_features syntax) turns
    on segmentation with FEATURE data: every block emits an explicit
    seg id; blocks in skip-feature segments omit the skip bit and the
    coefficients (vp9block.c:144-150) while per-segment alt-Q changes
    their dequant and alt-LF their filter level (vp9.c:747-792).
    lf_deltas exercises the lf_delta_update path (vp9.c:688-698;
    keyframes reset ref deltas to {1,0,-1,-1} first, vp9.c:659-666)."""
    from ffmpeg_hybrid_tpu.codecs.vp9.probs import coef_full
    from ffmpeg_hybrid_tpu.codecs.vp9.blockdec import (
        BAND_COUNTS, MAX_TX_FOR_BL_BP, TileDecoder)

    rng = np.random.RandomState(seed)
    sb_cols = (w + 63) >> 6
    sb_rows = (h + 63) >> 6
    cols = (w + 7) >> 3
    rows = (h + 7) >> 3

    gbs = _header_bits(w, h, bpp, ss_h=ss_h, ss_v=ss_v, yac_qi=yac_qi,
                       filter_level=filter_level, sharpness=sharpness,
                       tile_cols_log2=tile_cols_log2,
                       tile_rows_log2=tile_rows_log2, seg_feat=seg_feat,
                       seg_abs=seg_abs, lf_deltas=lf_deltas,
                       refreshctx=refreshctx)
    c = BoolEncoder()
    c.put(0, 128)                       # marker
    if txfmmode >= 3:
        # 2-bit literal 3, then the switchable bit (vp9.c txfmmode
        # read: get_uint(2) == 3 -> one more bit selects SWITCHABLE)
        c.put(1, 128)
        c.put(1, 128)
        c.put(1 if txfmmode == 4 else 0, 128)
    else:
        c.put((txfmmode >> 1) & 1, 128)  # txfmmode (2-bit literal)
        c.put(txfmmode & 1, 128)
    if txfmmode == 4:
        # TX_SWITCHABLE: tx8p/tx16p/tx32p update gates, all "keep"
        # (2 + 4 + 6 gate bits at prob 252; header.py:412-425)
        for _ in range(2 + 4 + 6):
            c.put(0, 252)
    for i in range(4):
        c.put(0, 128)                   # no coef prob updates for tx i
        if txfmmode == i:
            break
    for _ in range(3):
        c.put(0, 252)                   # skip probs unchanged
    chdr = c.bytes()
    gbs.put(len(chdr), 16)
    hdr = gbs.bytes()

    t = BoolEncoder()
    t.put(0, 128)
    kf_part = T.DEFAULT_KF_PARTITION_PROBS
    ptree = T.PARTITION_TREE
    imtree = T.INTRAMODE_TREE
    coef11 = coef_full(T.DEFAULT_COEF_PROBS)
    ce = CoeffEncoder(t, bpp)
    from ffmpeg_hybrid_tpu.codecs.vp9.blockdec import ABOVE_CTX, LEFT_CTX

    above_part = np.zeros(sb_cols * 8, np.uint8)
    above_skip = np.zeros(sb_cols * 8, np.uint8)
    above_txfm = np.zeros(sb_cols * 8, np.uint8)
    above_mode = np.full(sb_cols * 16, 2, np.uint8)   # DC_PRED
    a_ynnz = np.zeros(sb_cols * 16, np.uint8)
    a_uvnnz = np.zeros((2, sb_cols * 16), np.uint8)
    left = {"part": np.zeros(8, np.uint8), "skip": np.zeros(8, np.uint8),
            "txfm": np.zeros(8, np.uint8),
            "mode": np.full(16, 2, np.uint8),
            "ynnz": np.zeros(16, np.uint8),
            "uvnnz": np.zeros((2, 16), np.uint8)}
    tile_c0 = 0   # tile col start of the tile being encoded (have_l)

    def rand_tokens(sz):
        n = sz * sz
        vals = np.zeros(n, np.int64)
        density = rng.choice([0.0, 0.02, 0.1, 0.5, 1.0],
                             p=[0.1, 0.2, 0.3, 0.3, 0.1])
        k = int(n * density * rng.rand())
        if k:
            pos = rng.choice(n, size=k, replace=False)
            mag = rng.choice(
                [1, 2, 3, 4, 6, 9, 15, 25, 40, 70, 200, 900], size=k,
                p=[.3, .15, .1, .1, .08, .07, .05, .05, .04, .03, .02,
                   .01])
            vals[pos] = mag * rng.choice([-1, 1], k)
        return vals.reshape(sz, sz)

    def enc_coeffs_plane(tx, scan, nb, probs11p, a_n, l_n, a0, l0,
                         end_x, end_y, w4c, h4c):
        """Mirrors decode_coeffs' per-plane walk (blockdec.py:929-955):
        MERGE nnz ctx, per-tx-block token encode, SPLAT."""
        step = 1 << tx
        n = (4 << tx) * (4 << tx)
        bc = BAND_COUNTS[tx]
        if step > 1:
            for nn in range(0, end_y, step):
                l_n[l0 + nn] = int(l_n[l0 + nn:l0 + nn + step].any())
            for nn in range(0, end_x, step):
                a_n[a0 + nn] = int(a_n[a0 + nn:a0 + nn + step].any())
        for y in range(0, end_y, step):
            for x in range(0, end_x, step):
                nnz = int(a_n[a0 + x]) + int(l_n[l0 + y])
                eob = ce.encode_block(rand_tokens(4 << tx), probs11p,
                                      nnz, scan, nb, n=n, band_counts=bc)
                a_n[a0 + x] = l_n[l0 + y] = 1 if eob else 0
        if step > 1:
            TileDecoder._splat_nnz(a_n, a0, end_x, step, end_x == w4c)
            TileDecoder._splat_nnz(l_n, l0, end_y, step, end_y == h4c)

    def encode_block(r, ccol, bl, bp):
        bs = bl * 3 + bp
        row7 = r & 7
        nw = int(T.BWH_TAB[1][bs][0])
        nh = int(T.BWH_TAB[1][bs][1])
        w4 = nw * 2                      # b4 units
        h4 = nh * 2
        skip_forced = False
        if seg_feat is not None:
            # explicit seg id; skip-feature segments omit the skip bit
            # (vp9block.c:144-150) and code no coefficients
            sid = int(rng.randint(0, 8))
            t.put_tree(T.SEGMENTATION_TREE, SEG_TREE_PROBS, sid)
            skip_forced = bool(seg_feat[sid][3])
        if skip_forced:
            skip = True
        else:
            skip = bool(rng.rand() < 0.15)
            sctx = int(left["skip"][row7]) + int(above_skip[ccol])
            t.put(1 if skip else 0, int(T.PROBS_SKIP[sctx]))
        if txfmmode == 4:
            # TX_SWITCHABLE: per-block tx size via the context-coded
            # ladder (vp9block.c:171-215; keyframes are all-intra so
            # tx is coded even for skip blocks). Ctx reads the
            # NEIGHBORS' skip/txfm state (pre-splat).
            max_tx = MAX_TX_FOR_BL_BP[bs]
            have_a = r > 0
            have_l = ccol > tile_c0
            if have_a:
                if have_l:
                    a_t = max_tx if above_skip[ccol] else \
                        int(above_txfm[ccol])
                    l_t = max_tx if left["skip"][row7] else \
                        int(left["txfm"][row7])
                    ctx = int(a_t + l_t > max_tx)
                else:
                    ctx = 1 if above_skip[ccol] else \
                        int(int(above_txfm[ccol]) * 2 > max_tx)
            elif have_l:
                ctx = 1 if left["skip"][row7] else \
                    int(int(left["txfm"][row7]) * 2 > max_tx)
            else:
                ctx = 1
            tx = int(rng.randint(0, max_tx + 1))
            if max_tx == 3:
                t.put(1 if tx > 0 else 0, int(T.PROBS_TX32P[ctx][0]))
                if tx > 0:
                    t.put(1 if tx > 1 else 0,
                          int(T.PROBS_TX32P[ctx][1]))
                    if tx > 1:
                        t.put(1 if tx > 2 else 0,
                              int(T.PROBS_TX32P[ctx][2]))
            elif max_tx == 2:
                t.put(1 if tx > 0 else 0, int(T.PROBS_TX16P[ctx][0]))
                if tx > 0:
                    t.put(1 if tx > 1 else 0,
                          int(T.PROBS_TX16P[ctx][1]))
            elif max_tx == 1:
                t.put(tx, int(T.PROBS_TX8P[ctx]))
            else:
                tx = 0
        else:
            tx = min(MAX_TX_FOR_BL_BP[bs], txfmmode)
        # y mode (kf tree, above/left mode ctx; >=8x8 path of
        # vp9block.c:217-270)
        a0m = ccol * 2
        l0m = row7 * 2
        ym = int(rng.randint(0, 10))
        t.put_tree(imtree, T.DEFAULT_KF_YMODE_PROBS[
            int(above_mode[a0m])][int(left["mode"][l0m])], ym)
        above_mode[a0m:a0m + int(T.BWH_TAB[0][bs][0])] = ym
        left["mode"][l0m:l0m + int(T.BWH_TAB[0][bs][1])] = ym
        uvm = int(rng.randint(0, 10))
        t.put_tree(imtree, T.DEFAULT_KF_UVMODE_PROBS[ym], uvm)
        uvtx = tx - int((ss_h and nw * 2 == (1 << tx)) or
                        (ss_v and nh * 2 == (1 << tx)))
        if skip:
            a_ynnz[ccol * 2:(ccol + nw) * 2] = 0
            left["ynnz"][row7 * 2:(row7 + nh) * 2] = 0
            if ss_h:
                a_uvnnz[:, ccol:ccol + nw] = 0
            else:
                a_uvnnz[:, ccol * 2:(ccol + nw) * 2] = 0
            if ss_v:
                left["uvnnz"][:, row7:row7 + nh] = 0
            else:
                left["uvnnz"][:, row7 * 2:(row7 + nh) * 2] = 0
        else:
            end_x = min(2 * (cols - ccol), w4)
            end_y = min(2 * (rows - r), h4)
            txtp = int(T.INTRA_TXFM_TYPE[ym]) if tx < 3 else 0
            enc_coeffs_plane(tx, T.SCANS[tx][txtp], T.SCANS_NB[tx][txtp],
                             coef11[tx][0][0], a_ynnz, left["ynnz"],
                             ccol * 2, row7 * 2, end_x, end_y, w4, h4)
            end_xu = end_x >> ss_h
            end_yu = end_y >> ss_v
            for pl in range(2):
                enc_coeffs_plane(
                    uvtx, T.SCANS[uvtx][0], T.SCANS_NB[uvtx][0],
                    coef11[uvtx][1][0], a_uvnnz[pl], left["uvnnz"][pl],
                    ccol << (1 - ss_h), row7 << (1 - ss_v),
                    end_xu, end_yu, w4 >> ss_h, h4 >> ss_v)
        above_skip[ccol:ccol + nw] = 1 if skip else 0
        above_part[ccol:ccol + nw] = ABOVE_CTX[bs]
        above_txfm[ccol:ccol + nw] = tx
        left["skip"][row7:row7 + nh] = 1 if skip else 0
        left["part"][row7:row7 + nh] = LEFT_CTX[bs]
        left["txfm"][row7:row7 + nh] = tx

    def encode_sb(r, ccol, bl):
        ctx = ((int(above_part[ccol]) >> (3 - bl)) & 1) |               (((int(left["part"][r & 7]) >> (3 - bl)) & 1) << 1)
        p = kf_part[bl][ctx]
        hbs = 4 >> bl
        if bl == 3:
            t.put_tree(ptree, p, 0)      # sub-8x8 not emitted
            encode_block(r, ccol, bl, 0)
        elif ccol + hbs < cols:
            if r + hbs < rows:
                bp = int(rng.choice([0, 1, 2, 3],
                                    p=[0.45, 0.15, 0.15, 0.25]))
                t.put_tree(ptree, p, bp)
                if bp == 0:
                    encode_block(r, ccol, bl, 0)
                elif bp == 1:
                    encode_block(r, ccol, bl, 1)
                    encode_block(r + hbs, ccol, bl, 1)
                elif bp == 2:
                    encode_block(r, ccol, bl, 2)
                    encode_block(r, ccol + hbs, bl, 2)
                else:
                    encode_sb(r, ccol, bl + 1)
                    encode_sb(r, ccol + hbs, bl + 1)
                    encode_sb(r + hbs, ccol, bl + 1)
                    encode_sb(r + hbs, ccol + hbs, bl + 1)
            else:
                split = bool(rng.rand() < 0.5)
                t.put(1 if split else 0, int(p[1]))
                if split:
                    encode_sb(r, ccol, bl + 1)
                    encode_sb(r, ccol + hbs, bl + 1)
                else:
                    encode_block(r, ccol, bl, 1)
        elif r + hbs < rows:
            split = bool(rng.rand() < 0.5)
            t.put(1 if split else 0, int(p[2]))
            if split:
                encode_sb(r, ccol, bl + 1)
                encode_sb(r + hbs, ccol, bl + 1)
            else:
                encode_block(r, ccol, bl, 2)
        else:
            encode_sb(r, ccol, bl + 1)

    # tile walk: tiles in (row, col) order, each with its own bool coder;
    # above-ctx arrays are frame-wide, left ctx resets per (tile, sb-row)
    # (reference: decode_tiles / set_tile_offset, vp9.c:1244-1438)
    min_log2 = 0
    while sb_cols > (64 << min_log2):
        min_log2 += 1
    lc = max(min_log2, tile_cols_log2)
    lr = tile_rows_log2
    tiles = []
    for tr in range(1 << lr):
        r0 = min((tr * sb_rows) >> lr, sb_rows) * 8
        r1 = min(((tr + 1) * sb_rows) >> lr, sb_rows) * 8
        for tc in range(1 << lc):
            c0 = min((tc * sb_cols) >> lc, sb_cols) * 8
            c1 = min(((tc + 1) * sb_cols) >> lc, sb_cols) * 8
            tile_c0 = c0
            t = BoolEncoder()
            t.put(0, 128)
            ce = CoeffEncoder(t, bpp)
            for r in range(r0, r1, 8):
                left["part"][:] = 0
                left["skip"][:] = 0
                left["mode"][:] = 2
                left["ynnz"][:] = 0
                left["uvnnz"][:] = 0
                for ccol in range(c0, c1, 8):
                    encode_sb(r, ccol, 0)
            tiles.append(t.bytes())
    data = b""
    for i, tb in enumerate(tiles):
        if i < len(tiles) - 1:
            data += len(tb).to_bytes(4, "big")
        data += tb
    return _finish(hdr, chdr, data)


def main():
    import subprocess
    from ffmpeg_hybrid_tpu.formats.ivf import write_ivf
    vec = os.path.join(os.path.dirname(__file__), "..", "vectors")
    oracle = os.path.join(os.path.dirname(__file__), "..", ".oracle",
                          "build", "ffmpeg")
    specs = [("mini_gray_64", 64, 64, 8, False),
             ("mini_gray_130x70", 130, 70, 8, False),
             ("mini_gray10_128x72", 128, 72, 10, False),
             ("mini_gray12_64", 64, 64, 12, False),
             ("mini_lossless_64", 64, 64, 8, True),
             ("mini_lossless_130x70", 130, 70, 8, True),
             ("mini_lossless10_96x64", 96, 64, 10, True),
             ("mini_lossless12_64", 64, 64, 12, True)]
    rng = np.random.RandomState(11)
    for name, w, h, bpp, content in specs:
        if content:
            mx = (1 << bpp) - 1
            yp = rng.randint(0, mx + 1, (h, w))
            # smooth + noise mix so multiple token categories appear
            ramp = (np.add.outer(np.arange(h), np.arange(w)) * mx
                    // (h + w))
            yp = (yp // 4 + ramp * 3 // 4)
            up = rng.randint(0, mx + 1, ((h + 1) // 2, (w + 1) // 2))
            vp = ramp[::2, ::2] % (mx + 1)
            pkt = encode_keyframe_lossless(yp, up, vp, bpp)
        else:
            pkt = encode_keyframe_gray(w, h, bpp)
        path = os.path.join(vec, name + ".ivf")
        write_ivf(path, b"VP90", w, h, 30, 1, [(0, pkt)])
        out = subprocess.run(
            [oracle, "-nostdin", "-bitexact", "-i", path, "-map", "0:v",
             "-f", "framemd5", "-"], capture_output=True)
        if out.returncode != 0:
            print(name, "ORACLE FAILED:",
                  out.stderr.decode().strip().splitlines()[-1])
            continue
        with open(os.path.join(vec, name + ".framemd5"), "wb") as fh:
            fh.write(out.stdout)
        lines = [l for l in out.stdout.decode().splitlines()
                 if l and not l.startswith("#")]
        print(name, f"{w}x{h}@{bpp}bit:", len(lines), "frame(s)")

    # profile 1/3: non-4:2:0 subsamplings (4:4:4, 4:2:2, 4:4:0)
    sub_specs = [("mini_444_64", 64, 64, 8, 0, 0),
                 ("mini_422_64", 64, 64, 8, 1, 0),
                 ("mini_440_64", 64, 64, 8, 0, 1),
                 ("mini_422_98x66", 98, 66, 8, 1, 0),
                 ("mini_444_12_64", 64, 64, 12, 0, 0),
                 ("mini_422_10_64", 64, 64, 10, 1, 0)]
    for name, w, h, bpp, ss_h, ss_v in sub_specs:
        mxv = (1 << bpp) - 1
        cw = (w + ss_h) >> ss_h
        ch = (h + ss_v) >> ss_v
        yp = rng.randint(0, mxv + 1, (h, w))
        up = rng.randint(0, mxv + 1, (ch, cw))
        vp = rng.randint(0, mxv + 1, (ch, cw))
        pkt = encode_keyframe_lossless(yp, up, vp, bpp, ss_h=ss_h,
                                       ss_v=ss_v)
        path = os.path.join(vec, name + ".ivf")
        write_ivf(path, b"VP90", w, h, 30, 1, [(0, pkt)])
        out = subprocess.run(
            [oracle, "-nostdin", "-bitexact", "-i", path, "-map", "0:v",
             "-f", "framemd5", "-"], capture_output=True)
        if out.returncode != 0:
            print(name, "ORACLE FAILED:",
                  out.stderr.decode().strip().splitlines()[-1])
            continue
        with open(os.path.join(vec, name + ".framemd5"), "wb") as fh:
            fh.write(out.stdout)
        print(name, f"{w}x{h}@{bpp}bit ss_h={ss_h} ss_v={ss_v}")

    # random-syntax lossy keyframes: every tx size (DCT/ADST), all
    # intra modes, random skip, loop filter on — incl. high bit depth
    rand_specs = [
        ("mini_rand_130x70", 130, 70, 8, 3, 1, 0, 60, 24, 0),
        ("mini_rand10_96x64", 96, 64, 10, 3, 1, 1, 80, 32, 1),
        ("mini_rand10_tx4_64", 64, 64, 10, 0, 1, 1, 120, 18, 2),
        ("mini_rand12_130x70", 130, 70, 12, 3, 1, 1, 90, 40, 3),
        ("mini_rand12_444_64", 64, 64, 12, 2, 0, 0, 50, 10, 4),
        ("mini_rand_252q_64", 64, 64, 8, 3, 1, 1, 252, 63, 5),
        # TX_SWITCHABLE: per-block tx size via the context-coded
        # ladder (vp9block.c:171-215) — previously unreachable through
        # this encoder (VERDICT r4 missing #5)
        ("mini_randsw_130x70", 130, 70, 8, 4, 1, 1, 60, 24, 41),
        ("mini_randsw10_96x64", 96, 64, 10, 4, 1, 1, 80, 20, 43),
        ("mini_randsw12_444_64", 64, 64, 12, 4, 0, 0, 70, 12, 44),
    ]
    for (name, w, h, bpp, txm, ssh, ssv, qi, flt, seed) in rand_specs:
        pkt = encode_keyframe_random(w, h, bpp, seed=seed, txfmmode=txm,
                                     yac_qi=qi, filter_level=flt,
                                     ss_h=ssh, ss_v=ssv)
        path = os.path.join(vec, name + ".ivf")
        write_ivf(path, b"VP90", w, h, 30, 1, [(0, pkt)])
        out = subprocess.run(
            [oracle, "-nostdin", "-bitexact", "-i", path, "-map", "0:v",
             "-f", "framemd5", "-"], capture_output=True)
        if out.returncode != 0:
            print(name, "ORACLE FAILED:",
                  out.stderr.decode().strip().splitlines()[-1])
            continue
        with open(os.path.join(vec, name + ".framemd5"), "wb") as fh:
            fh.write(out.stdout)
        print(name, f"{w}x{h}@{bpp}bit txm={txm} qi={qi} lf={flt}")

    # sharpness 1..7 (lim-LUT rebuild, reference vp9.c:669-697) and
    # tile rows/cols (per-tile coders + cross-tile loop filter)
    sharp_specs = [
        ("mini_sharp5_130x70", 130, 70, 5, 40, 6),
        ("mini_sharp7_96x64", 96, 64, 7, 63, 7),
    ]
    for name, w, h, sharp, flt, seed in sharp_specs:
        pkt = encode_keyframe_random(w, h, 8, seed=seed, txfmmode=3,
                                     yac_qi=60, filter_level=flt,
                                     sharpness=sharp)
        path = os.path.join(vec, name + ".ivf")
        write_ivf(path, b"VP90", w, h, 30, 1, [(0, pkt)])
        out = subprocess.run(
            [oracle, "-nostdin", "-bitexact", "-i", path, "-map", "0:v",
             "-f", "framemd5", "-"], capture_output=True)
        if out.returncode == 0:
            with open(os.path.join(vec, name + ".framemd5"), "wb") as fh:
                fh.write(out.stdout)
            print(name, f"sharpness={sharp} lf={flt}")
        else:
            print(name, "ORACLE FAILED:",
                  out.stderr.decode().strip().splitlines()[-1])

    # sharpness CHANGING between frames (the LUT rebuild path when
    # sharpness differs from the previous frame)
    pkts = [(i * 33, encode_keyframe_random(130, 70, 8, seed=8 + i,
                                            yac_qi=70, filter_level=35,
                                            sharpness=s))
            for i, s in enumerate((2, 7, 0, 4))]
    path = os.path.join(vec, "mini_sharpvar.ivf")
    write_ivf(path, b"VP90", 130, 70, 30, 1, pkts)
    out = subprocess.run(
        [oracle, "-nostdin", "-bitexact", "-i", path, "-map", "0:v",
         "-f", "framemd5", "-"], capture_output=True)
    if out.returncode == 0:
        with open(os.path.join(vec, "mini_sharpvar.framemd5"), "wb") as fh:
            fh.write(out.stdout)
        print("mini_sharpvar: 4 keyframes, sharpness 2/7/0/4")
    else:
        print("mini_sharpvar ORACLE FAILED:",
              out.stderr.decode().strip().splitlines()[-1])

    tile_specs = [
        ("mini_tiles2x2", 520, 140, 1, 1, 32, 12),
        ("mini_tilerows4", 96, 260, 0, 2, 28, 13),
    ]
    for name, w, h, lc, lr, flt, seed in tile_specs:
        pkt = encode_keyframe_random(w, h, 8, seed=seed, yac_qi=80,
                                     filter_level=flt, tile_cols_log2=lc,
                                     tile_rows_log2=lr)
        path = os.path.join(vec, name + ".ivf")
        write_ivf(path, b"VP90", w, h, 30, 1, [(0, pkt)])
        out = subprocess.run(
            [oracle, "-nostdin", "-bitexact", "-i", path, "-map", "0:v",
             "-f", "framemd5", "-"], capture_output=True)
        if out.returncode == 0:
            with open(os.path.join(vec, name + ".framemd5"), "wb") as fh:
                fh.write(out.stdout)
            print(name, f"{w}x{h} tiles {1 << lc}x{1 << lr}")
        else:
            print(name, "ORACLE FAILED:",
                  out.stderr.decode().strip().splitlines()[-1])

    # segmentation: explicit seg map, segment 1 with the SKIP feature
    # (checkerboard of coded / skip-forced superblocks)
    for name, w, h in (("mini_seg_128x72", 128, 72),
                       ("mini_seg_130x70", 130, 70)):
        yp = rng.randint(0, 256, (h, w))
        up = rng.randint(0, 256, ((h + 1) // 2, (w + 1) // 2))
        vp = rng.randint(0, 256, ((h + 1) // 2, (w + 1) // 2))
        pkt = encode_keyframe_lossless(yp, up, vp, 8, seg=True)
        path = os.path.join(vec, name + ".ivf")
        write_ivf(path, b"VP90", w, h, 30, 1, [(0, pkt)])
        out = subprocess.run(
            [oracle, "-nostdin", "-bitexact", "-i", path, "-map", "0:v",
             "-f", "framemd5", "-"], capture_output=True)
        if out.returncode == 0:
            with open(os.path.join(vec, name + ".framemd5"), "wb") as fh:
                fh.write(out.stdout)
            print(name, f"{w}x{h} segmentation (skip feature)")
        else:
            print(name, "ORACLE FAILED:",
                  out.stderr.decode().strip().splitlines()[-1])

    # intra-only: keyframe, then an invisible intra-only frame shown via
    # show-existing in a superframe
    from ffmpeg_hybrid_tpu.formats.superframe import merge_superframe
    w = h = 64
    kf = encode_keyframe_gray(w, h, 8)
    yp = rng.randint(0, 256, (h, w))
    up = rng.randint(0, 256, (h // 2, w // 2))
    vp = rng.randint(0, 256, (h // 2, w // 2))
    io = encode_keyframe_lossless(yp, up, vp, 8, intraonly=True)
    se = bytes([(0b10 << 6) | (1 << 3) | 0])  # show-existing slot 0
    sf = merge_superframe([io, se])
    path = os.path.join(vec, "mini_intraonly.ivf")
    write_ivf(path, b"VP90", w, h, 30, 1, [(0, kf), (33, sf)])
    out = subprocess.run(
        [oracle, "-nostdin", "-bitexact", "-i", path, "-map", "0:v",
         "-f", "framemd5", "-"], capture_output=True)
    if out.returncode == 0:
        with open(os.path.join(vec, "mini_intraonly.framemd5"),
                  "wb") as fh:
            fh.write(out.stdout)
        print("mini_intraonly: keyframe + invisible intra-only via "
              "superframe")

    # inter frames with random modes/partitions and NEWMV deltas:
    # unscaled, upscaled (non-power-of-2 ratio), max-downscale (2x,
    # step 32), and odd-size scaled — exercises the scaled-MC MV clamp,
    # quadrant anchors, and the libvpx-820 chroma phase formula
    mv_specs = [("mini_inter_mv", 96, 96, 96, 96, 21),
                ("mini_scaled_mv_up", 64, 64, 96, 96, 22),
                ("mini_scaled_mv_dn", 192, 192, 96, 96, 23),
                ("mini_scaled_mv_odd", 130, 70, 98, 66, 24)]
    for name, kw, kh, iw, ih, seed in mv_specs:
        rngk = np.random.RandomState(seed)
        yp = rngk.randint(0, 256, (kh, kw))
        up = rngk.randint(0, 256, ((kh + 1) // 2, (kw + 1) // 2))
        vp = rngk.randint(0, 256, ((kh + 1) // 2, (kw + 1) // 2))
        kf = encode_keyframe_lossless(yp, up, vp, 8)
        pkt, _sm = encode_inter_random(iw, ih, seed=seed)
        path = os.path.join(vec, name + ".ivf")
        write_ivf(path, b"VP90", iw, ih, 30, 1, [(0, kf), (33, pkt)])
        out = subprocess.run(
            [oracle, "-nostdin", "-bitexact", "-i", path, "-map", "0:v",
             "-noautoscale", "-f", "framemd5", "-"], capture_output=True)
        if out.returncode != 0:
            print(name, "ORACLE FAILED:",
                  out.stderr.decode().strip().splitlines()[-1])
            continue
        with open(os.path.join(vec, name + ".framemd5"), "wb") as fh:
            fh.write(out.stdout)
        print(name, f"kf {kw}x{kh} + random-mv inter {iw}x{ih}")

    # temporal segmentation prediction: 3-frame chain where frame 3's
    # seg ids are temporally predicted from frame 2's decoded map
    # (seg_pred_prob bits + segpred ctx + SKIP-feature interplay)
    rngk = np.random.RandomState(31)
    yp = rngk.randint(0, 256, (96, 96))
    up = rngk.randint(0, 256, (48, 48))
    vp = rngk.randint(0, 256, (48, 48))
    kf = encode_keyframe_lossless(yp, up, vp, 8)
    p1, sm1 = encode_inter_random(96, 96, seed=32, seg=True)
    p2, _sm2 = encode_inter_random(96, 96, seed=33, seg=True,
                                   prev_segmap=sm1)
    path = os.path.join(vec, "mini_seg_temporal.ivf")
    write_ivf(path, b"VP90", 96, 96, 30, 1, [(0, kf), (33, p1), (66, p2)])
    out = subprocess.run(
        [oracle, "-nostdin", "-bitexact", "-i", path, "-map", "0:v",
         "-f", "framemd5", "-"], capture_output=True)
    if out.returncode == 0:
        with open(os.path.join(vec, "mini_seg_temporal.framemd5"),
                  "wb") as fh:
            fh.write(out.stdout)
        print("mini_seg_temporal: kf + 2 temporally-predicted seg frames")
    else:
        print("mini_seg_temporal ORACLE FAILED:",
              out.stderr.decode().strip().splitlines()[-1])

    # inter frames (all-skip ZEROMV off ref slot 0).  mini_inter: same
    # size (unscaled MC).  mini_scaled: the inter frame is 2x the
    # keyframe -> exercises the scaled-reference MC path e2e
    # (vp9recon.c mc_luma_scaled/mc_chroma_scaled).  NOTE framemd5 must
    # be taken with -noautoscale: the ffmpeg CLI otherwise swscales
    # every frame to the first frame's size.
    rng2 = np.random.RandomState(9)
    yp = rng2.randint(0, 256, (64, 64))
    up = rng2.randint(0, 256, (32, 32))
    vp = rng2.randint(0, 256, (32, 32))
    kf = encode_keyframe_lossless(yp, up, vp, 8)
    for name, iw, ih in (("mini_inter", 64, 64), ("mini_scaled", 128, 128)):
        pkt = encode_inter_zeromv(iw, ih)
        path = os.path.join(vec, name + ".ivf")
        write_ivf(path, b"VP90", iw, ih, 30, 1, [(0, kf), (33, pkt)])
        out = subprocess.run(
            [oracle, "-nostdin", "-bitexact", "-i", path, "-map", "0:v",
             "-noautoscale", "-f", "framemd5", "-"], capture_output=True)
        if out.returncode == 0:
            with open(os.path.join(vec, name + ".framemd5"), "wb") as fh:
                fh.write(out.stdout)
            print(name, f"keyframe 64x64 + inter {iw}x{ih} (zeromv)")
        else:
            print(name, "ORACLE FAILED:",
                  out.stderr.decode().strip().splitlines()[-1])


def _inter_header_bits(w, h, refresh_mask=0x02, seg=False):
    """Inter-frame uncompressed header + no-update compressed header
    (profile 0, lossless, single ref slot 0, filter 8tap-smooth,
    hp mvs off). Returns (header bytes, compressed header bytes)."""
    gb = BitWriter()
    gb.put(0b10, 2)
    gb.put(0, 1)
    gb.put(0, 1)        # profile 0
    gb.put(0, 1)        # show_existing
    gb.put(1, 1)        # non-keyframe
    gb.put(1, 1)        # show_frame
    gb.put(0, 1)        # error_resilient
    gb.put(0, 2)        # reset_frame_context
    gb.put(refresh_mask, 8)
    for _ in range(3):
        gb.put(0, 3)    # refidx = 0
        gb.put(0, 1)    # sign bias
    gb.put(0, 1)        # size-from-ref0? no
    gb.put(0, 1)
    gb.put(0, 1)
    gb.put(w - 1, 16)
    gb.put(h - 1, 16)
    gb.put(0, 1)        # display size
    gb.put(0, 1)        # high precision mvs
    gb.put(0, 1)        # filter not switchable...
    gb.put(0, 2)        # ... FILTER_8TAP_SMOOTH
    gb.put(0, 1)        # refresh_frame_context
    gb.put(0, 1)        # frame_parallel
    gb.put(0, 2)        # frame_context_idx
    gb.put(0, 6)        # lf level
    gb.put(0, 3)        # sharpness
    gb.put(0, 1)        # lf delta
    gb.put(0, 8)        # yac_qi = 0 (lossless)
    gb.put(0, 1)
    gb.put(0, 1)
    gb.put(0, 1)
    if seg:
        # temporal segmentation: explicit tree probs (128), pred probs
        # (128), segment 1 = SKIP feature (vp9.c:713-792 syntax)
        gb.put(1, 1)               # enabled
        gb.put(1, 1)               # update_map
        for p in SEG_TREE_PROBS:
            gb.put(1, 1)
            gb.put(p, 8)
        gb.put(1, 1)               # temporal
        for _ in range(3):
            gb.put(1, 1)
            gb.put(128, 8)         # pred prob
        gb.put(1, 1)               # update data
        gb.put(0, 1)               # relative values
        for sid in range(8):
            gb.put(0, 1)           # q feature
            gb.put(0, 1)           # lf feature
            gb.put(0, 1)           # ref feature
            gb.put(1 if sid == 1 else 0, 1)  # skip feature
    else:
        gb.put(0, 1)    # segmentation
    sb_cols = (w + 63) >> 6
    min_log2 = 0
    while sb_cols > (64 << min_log2):
        min_log2 += 1
    mx = 0
    while (sb_cols >> mx) >= 4:
        mx += 1
    mx = max(0, mx - 1)
    if mx > min_log2:
        gb.put(0, 1)
    gb.put(0, 1)        # log2_tile_rows

    c = BoolEncoder()
    c.put(0, 128)       # marker
    c.put(0, 128)       # coef update flag (i=0, lossless)
    for _ in range(3):
        c.put(0, 252)   # skip probs
    for _ in range(7 * 3):
        c.put(0, 252)   # mv_mode probs
    for _ in range(4):
        c.put(0, 252)   # intra probs
    for _ in range(5 * 2):
        c.put(0, 252)   # single_ref probs
    for _ in range(4 * 9):
        c.put(0, 252)   # y_mode
    for _ in range(4 * 4 * 3):
        c.put(0, 252)   # partition
    for _ in range(3):
        c.put(0, 252)   # mv_joint
    for _ in range(2 * (1 + 10 + 1 + 10)):
        c.put(0, 252)   # mv sign/classes/class0/bits
    for _ in range(2 * (2 * 3 + 3)):
        c.put(0, 252)   # class0_fp / fp
    chdr = c.bytes()
    gb.put(len(chdr), 16)
    return gb.bytes(), chdr


def encode_inter_random(w, h, seed=0, seg=False, prev_segmap=None):
    """Visible inter frame with random partitions (incl. sub-8x8),
    random inter modes, and NEWMV with random coded deltas — all-skip
    (no coefficients), single ref slot 0. Against a reference of a
    different size this exercises the scaled-MC semantics the ZEROMV
    vector cannot: the MV clamp (vp9recon.c:505-506), nonzero phase
    stepping, per-quadrant call anchors, and the libvpx-820 chroma
    formula."""
    from ffmpeg_hybrid_tpu.codecs.vp9.probs import Probs
    from ffmpeg_hybrid_tpu.codecs.vp9.blockdec import (
        INTER_MODE_CTX_LUT, SUB8X8_OFF, ABOVE_CTX, LEFT_CTX)

    rng = np.random.RandomState(seed)
    P = Probs.defaults()
    hdr, chdr = _inter_header_bits(w, h, seg=seg)

    t = BoolEncoder()
    t.put(0, 128)
    sb_cols = (w + 63) >> 6
    sb_rows = (h + 63) >> 6
    cols = (w + 7) >> 3
    rows = (h + 7) >> 3
    NEARESTMV, NEWMV = 10, 13
    part_probs = T.PROBS_PARTITION
    ptree = T.PARTITION_TREE

    above_part = np.zeros(sb_cols * 8, np.uint8)
    above_skip = np.zeros(sb_cols * 8, np.uint8)
    above_mode = np.full(sb_cols * 8, NEARESTMV, np.uint8)
    above_segpred = np.zeros(sb_cols * 8, np.uint8)
    if prev_segmap is None:
        prev_segmap = np.zeros((sb_rows * 8, sb_cols * 8), np.uint8)
    cur_segmap = np.zeros((sb_rows * 8, sb_cols * 8), np.uint8)
    left = {"part": np.zeros(8, np.uint8), "skip": np.zeros(8, np.uint8),
            "mode": np.full(8, NEARESTMV, np.uint8),
            "segpred": np.zeros(8, np.uint8)}
    first = [True]

    def put_mv_component(idx, v):
        """Mirror of read_mv_component with hp coding off
        (vp9mvs.c:236-289): v is a nonzero even delta."""
        sign = v < 0
        n = abs(v) - 1
        assert n & 1, "hp off: only even magnitudes are codable"
        t.put(1 if sign else 0, int(P.mv_sign[idx]))
        if n < 16:
            t.put_tree(T.MV_CLASS_TREE, P.mv_classes[idx], 0)
            t.put(n >> 3, int(P.mv_class0[idx]))
            t.put_tree(T.MV_FP_TREE, P.mv_class0_fp[idx][n >> 3],
                       (n >> 1) & 3)
        else:
            cl = (n >> 3).bit_length() - 1
            t.put_tree(T.MV_CLASS_TREE, P.mv_classes[idx], cl)
            off = n - (8 << cl)
            for m in range(cl):
                t.put((off >> (3 + m)) & 1, int(P.mv_bits[idx][m]))
            t.put_tree(T.MV_FP_TREE, P.mv_fp[idx], (off >> 1) & 3)
        # hp bit not coded (highprecisionmvs = 0)

    MAGS = [0, 0, 0, 2, 4, 8, 14, 16, 32, 64, 126, 256, 512]

    def put_newmv_delta():
        dy = int(rng.choice(MAGS)) * int(rng.choice([-1, 1]))
        dx = int(rng.choice(MAGS)) * int(rng.choice([-1, 1]))
        j = (2 if dy else 0) | (1 if dx else 0)
        t.put_tree(T.MV_JOINT_TREE, P.mv_joint, j)
        if dy:
            put_mv_component(0, dy)
        if dx:
            put_mv_component(1, dx)

    def put_mode(mctx):
        mode = int(rng.choice([10, 11, 12, 13],
                              p=[0.15, 0.15, 0.15, 0.55]))
        t.put_tree(T.INTER_MODE_TREE, T.PROBS_MV_MODE[mctx], mode)
        if mode == NEWMV:
            put_newmv_delta()
        return mode

    def encode_block(r, ccol, bl, bp):
        bs = bl * 3 + bp
        row7 = r & 7
        nw = int(T.BWH_TAB[1][bs][0])
        nh = int(T.BWH_TAB[1][bs][1])
        have_a = r > 0
        have_l = ccol > 0
        seg_skip = False
        if seg:
            pctx = int(above_segpred[ccol]) + int(left["segpred"][row7])
            pred = bool(rng.rand() < 0.5)
            # predicted id = min over the CLIPPED block span of the
            # previous frame's map (vp9block.c:115-127)
            w4c = min(cols - ccol, nw)
            h4c = min(rows - r, nh)
            pred_sid = int(prev_segmap[r:r + h4c, ccol:ccol + w4c].min())
            if pred and pred_sid == 1 and bs > 9:
                pred = False  # keep sub-8x8 out of the skip segment
            t.put(1 if pred else 0, 128)  # seg_pred_prob[pctx] == 128
            if pred:
                sid = pred_sid
            else:
                # skip feature (seg 1) forces ZEROMV only on the >=8x8
                # path; keep sub-8x8 blocks in non-skip segments
                sid = int(rng.choice([0, 1, 2] if bs <= 9 else [0, 2]))
                t.put_tree(T.SEGMENTATION_TREE, SEG_TREE_PROBS, sid)
            above_segpred[ccol:ccol + nw] = 1 if pred else 0
            left["segpred"][row7:row7 + nh] = 1 if pred else 0
            cur_segmap[r:r + nh, ccol:ccol + nw] = sid
            seg_skip = sid == 1
        if not seg_skip:
            sctx = int(left["skip"][row7]) + int(above_skip[ccol])
            t.put(1, int(T.PROBS_SKIP[sctx]))      # skip = 1
        t.put(1, int(T.PROBS_INTRA[0]))            # is_inter
        rctx = 2 if (not have_a and not have_l) else 4
        t.put(0, int(T.PROBS_SINGLE_REF[rctx][0]))  # ref slot index 0
        if seg_skip:
            last = 12  # ZEROMV forced, no mode bits (vp9block.c:587)
        elif bs <= 9:
            off = SUB8X8_OFF[bs]
            mctx = int(INTER_MODE_CTX_LUT[int(above_mode[ccol + off]),
                                          int(left["mode"][row7 + off])])
            last = put_mode(mctx)
        else:
            # sub-8x8: per-quadrant modes+mvs after the (absent) filter
            mctx = int(INTER_MODE_CTX_LUT[int(above_mode[ccol]),
                                          int(left["mode"][row7])])
            m0 = put_mode(mctx)
            m1 = put_mode(mctx) if bs != 10 else m0
            if bs != 11:
                m2 = put_mode(mctx)
                m3 = put_mode(mctx) if bs != 10 else m2
            else:
                m3 = m1
            last = m3
        above_skip[ccol:ccol + nw] = 1
        above_part[ccol:ccol + nw] = ABOVE_CTX[bs]
        above_mode[ccol:ccol + nw] = last
        left["skip"][row7:row7 + nh] = 1
        left["part"][row7:row7 + nh] = LEFT_CTX[bs]
        left["mode"][row7:row7 + nh] = last

    def encode_sb(r, ccol, bl):
        ctx = ((int(above_part[ccol]) >> (3 - bl)) & 1) | \
              (((int(left["part"][r & 7]) >> (3 - bl)) & 1) << 1)
        p = part_probs[bl][ctx]
        hbs = 4 >> bl
        if bl == 3:
            bp = int(rng.choice([0, 1, 2, 3], p=[0.4, 0.2, 0.2, 0.2]))
            t.put_tree(ptree, p, bp)
            encode_block(r, ccol, bl, bp)
        elif ccol + hbs < cols:
            if r + hbs < rows:
                bp = int(rng.choice([0, 1, 2, 3],
                                    p=[0.35, 0.15, 0.15, 0.35]))
                t.put_tree(ptree, p, bp)
                if bp == 0:
                    encode_block(r, ccol, bl, 0)
                elif bp == 1:
                    encode_block(r, ccol, bl, 1)
                    encode_block(r + hbs, ccol, bl, 1)
                elif bp == 2:
                    encode_block(r, ccol, bl, 2)
                    encode_block(r, ccol + hbs, bl, 2)
                else:
                    encode_sb(r, ccol, bl + 1)
                    encode_sb(r, ccol + hbs, bl + 1)
                    encode_sb(r + hbs, ccol, bl + 1)
                    encode_sb(r + hbs, ccol + hbs, bl + 1)
            else:
                split = bool(rng.rand() < 0.5)
                t.put(1 if split else 0, int(p[1]))
                if split:
                    encode_sb(r, ccol, bl + 1)
                    encode_sb(r, ccol + hbs, bl + 1)
                else:
                    encode_block(r, ccol, bl, 1)
        elif r + hbs < rows:
            split = bool(rng.rand() < 0.5)
            t.put(1 if split else 0, int(p[2]))
            if split:
                encode_sb(r, ccol, bl + 1)
                encode_sb(r + hbs, ccol, bl + 1)
            else:
                encode_block(r, ccol, bl, 2)
        else:
            encode_sb(r, ccol, bl + 1)

    for r in range(0, sb_rows * 8, 8):
        left["part"][:] = 0
        left["skip"][:] = 0
        left["mode"][:] = NEARESTMV
        for ccol in range(0, sb_cols * 8, 8):
            encode_sb(r, ccol, 0)
    return _finish(hdr, chdr, t.bytes()), cur_segmap


def encode_inter_zeromv(w, h, seg=False):
    """Visible inter frame (profile 0, lossless, all-skip, ZEROMV, single
    ref slot 0, refreshing slot 1). With a different size than its
    reference this exercises the scaled-reference MC path."""
    gb = BitWriter()
    gb.put(0b10, 2)
    gb.put(0, 1)
    gb.put(0, 1)        # profile 0
    gb.put(0, 1)        # show_existing
    gb.put(1, 1)        # non-keyframe
    gb.put(1, 1)        # show_frame
    gb.put(0, 1)        # error_resilient
    gb.put(0, 2)        # reset_frame_context
    gb.put(0x02, 8)     # refresh slot 1
    for _ in range(3):
        gb.put(0, 3)    # refidx = 0
        gb.put(0, 1)    # sign bias
    gb.put(0, 1)        # size-from-ref0? no
    gb.put(0, 1)        # ref1? no
    gb.put(0, 1)        # ref2? no
    gb.put(w - 1, 16)
    gb.put(h - 1, 16)
    gb.put(0, 1)        # display size
    gb.put(0, 1)        # high precision mvs
    gb.put(0, 1)        # filter not switchable...
    gb.put(0, 2)        # ... FILTER_8TAP_SMOOTH
    gb.put(0, 1)        # refresh_frame_context
    gb.put(0, 1)        # frame_parallel
    gb.put(0, 2)        # frame_context_idx
    gb.put(0, 6)        # lf level
    gb.put(0, 3)        # sharpness
    gb.put(0, 1)        # lf delta
    gb.put(0, 8)        # yac_qi = 0 (lossless)
    gb.put(0, 1)
    gb.put(0, 1)
    gb.put(0, 1)
    if seg:
        # temporal segmentation: explicit tree probs (128), pred probs
        # (128), segment 1 = SKIP feature (vp9.c:713-792 syntax)
        gb.put(1, 1)               # enabled
        gb.put(1, 1)               # update_map
        for p in SEG_TREE_PROBS:
            gb.put(1, 1)
            gb.put(p, 8)
        gb.put(1, 1)               # temporal
        for _ in range(3):
            gb.put(1, 1)
            gb.put(128, 8)         # pred prob
        gb.put(1, 1)               # update data
        gb.put(0, 1)               # relative values
        for sid in range(8):
            gb.put(0, 1)           # q feature
            gb.put(0, 1)           # lf feature
            gb.put(0, 1)           # ref feature
            gb.put(1 if sid == 1 else 0, 1)  # skip feature
    else:
        gb.put(0, 1)    # segmentation
    sb_cols = (w + 63) >> 6
    min_log2 = 0
    while sb_cols > (64 << min_log2):
        min_log2 += 1
    mx = 0
    while (sb_cols >> mx) >= 4:
        mx += 1
    mx = max(0, mx - 1)
    if mx > min_log2:
        gb.put(0, 1)
    gb.put(0, 1)        # log2_tile_rows

    c = BoolEncoder()
    c.put(0, 128)       # marker
    c.put(0, 128)       # coef update flag (i=0, lossless)
    for _ in range(3):
        c.put(0, 252)   # skip probs
    for _ in range(7 * 3):
        c.put(0, 252)   # mv_mode probs
    # filter not switchable -> no filter probs
    for _ in range(4):
        c.put(0, 252)   # intra probs
    # allowcompinter false -> single ref implied
    for _ in range(5 * 2):
        c.put(0, 252)   # single_ref probs
    for _ in range(4 * 9):
        c.put(0, 252)   # y_mode
    for _ in range(4 * 4 * 3):
        c.put(0, 252)   # partition
    for _ in range(3):
        c.put(0, 252)   # mv_joint
    for _ in range(2 * (1 + 10 + 1 + 10)):
        c.put(0, 252)   # mv sign/classes/class0/bits
    for _ in range(2 * (2 * 3 + 3)):
        c.put(0, 252)   # class0_fp / fp
    # no hp (highprecisionmvs = 0)
    chdr = c.bytes()
    gb.put(len(chdr), 16)
    hdr = gb.bytes()

    t = BoolEncoder()
    t.put(0, 128)
    sb_rows = (h + 63) >> 6
    cols = (w + 7) >> 3
    rows = (h + 7) >> 3
    ZEROMV = 12
    part_probs = T.PROBS_PARTITION  # inter frames use the frame probs
    ptree = T.PARTITION_TREE
    above_part = np.zeros(sb_cols * 8, np.uint8)
    above_skip = np.zeros(sb_cols * 8, np.uint8)
    above_mode = np.full(sb_cols * 8, 10, np.uint8)  # NEARESTMV init
    left = {"part": np.zeros(8, np.uint8), "skip": np.zeros(8, np.uint8),
            "mode": np.full(8, 10, np.uint8)}
    first = [True]

    def encode_block(r, ccol, bl, bp):
        bs = bl * 3 + bp
        row7 = r & 7
        have_a = r > 0
        have_l = ccol > 0
        sctx = int(left["skip"][row7]) + int(above_skip[ccol])
        t.put(1, int(T.PROBS_SKIP[sctx]))          # skip = 1
        t.put(1, int(T.PROBS_INTRA[0]))            # is_inter
        # single ref bit 0 (-> ref 0); ctx: 2 for very first block, else
        # with inter neighbours (ref 0): 4 (or 4 for single-neighbour)
        rctx = 2 if (not have_a and not have_l) else 4
        t.put(0, int(T.PROBS_SINGLE_REF[rctx][0]))
        mctx = 6
        am = int(above_mode[ccol])
        lm = int(left["mode"][row7])
        lut_lo = [[5]*10 + [2, 2, 1, 3], [5]*10 + [2, 2, 1, 3],
                  [5]*10 + [1, 1, 0, 3], [5]*10 + [3, 3, 3, 4]]
        if am < 10:
            mctx = 6 if lm < 10 else 5
        else:
            mctx = lut_lo[am - 10][lm]
        t.put_tree(T.INTER_MODE_TREE, T.PROBS_MV_MODE[mctx], ZEROMV)
        nw = int(T.BWH_TAB[1][bs][0])
        nh = int(T.BWH_TAB[1][bs][1])
        above_skip[ccol:ccol + nw] = 1
        above_part[ccol:ccol + nw] = [0x0, 0x0, 0x8][bs] if bs < 3 else 0
        above_mode[ccol:ccol + nw] = ZEROMV
        left["skip"][row7:row7 + nh] = 1
        left["part"][row7:row7 + nh] = [0x0, 0x8, 0x0][bs] if bs < 3 else 0
        left["mode"][row7:row7 + nh] = ZEROMV

    def encode_sb(r, ccol, bl):
        ctx = ((int(above_part[ccol]) >> (3 - bl)) & 1) | \
              (((int(left["part"][r & 7]) >> (3 - bl)) & 1) << 1)
        p = part_probs[bl][ctx]
        hbs = 4 >> bl
        if bl == 3:
            t.put_tree(ptree, p, 0)
            encode_block(r, ccol, bl, 0)
        elif ccol + hbs < cols:
            if r + hbs < rows:
                t.put_tree(ptree, p, 0)
                encode_block(r, ccol, bl, 0)
            else:
                t.put(0, int(p[1]))
                encode_block(r, ccol, bl, 1)
        elif r + hbs < rows:
            t.put(0, int(p[2]))
            encode_block(r, ccol, bl, 2)
        else:
            encode_sb(r, ccol, bl + 1)

    for r in range(0, sb_rows * 8, 8):
        left["part"][:] = 0
        left["skip"][:] = 0
        left["mode"][:] = 10
        for ccol in range(0, sb_cols * 8, 8):
            encode_sb(r, ccol, 0)
    return _finish(hdr, chdr, t.bytes())


# ===========================================================================
# Flat-probability flexible inter encoder (round 2).
#
# Every context-coded probability group (skip, is_inter, single_ref, comp,
# comp_ref, mv_mode, filter, tx, y_mode, partition, coefficients) is set to
# the SAME value (128) for all contexts via compressed-header updates
# (the update_prob subexponential coding, reference: vp9.c:399-455), so the
# encoder needs no neighbor-context mirroring at all: the decoder still
# derives every context (exercising vp9block.c:338-575 comp/ref ctx, filter
# ctx, nnz ctx ...) but the bit probabilities no longer depend on it.
#
# This unlocks e2e vectors for: compound prediction (comppredmode 1/2),
# switchable + bilinear + sharp interp filters, high-precision MVs,
# intra blocks inside inter frames, and inter coefficients.
# ===========================================================================

from ffmpeg_hybrid_tpu.codecs.vp9.rac import INV_MAP_TABLE

_MAP_INV = {}
for _d, _m in enumerate(INV_MAP_TABLE):
    _MAP_INV.setdefault(int(_m), _d)


def _recenter_fwd(r, c):
    """Inverse of inv_recenter_nonneg(v, c) == r."""
    if r > 2 * c:
        return r
    if r >= c:
        return 2 * (r - c)
    return 2 * (c - r) - 1


def put_update_prob(t, old, new):
    """Encode the subexp delta so that update_prob(dec, old) == new.
    (The prob-update gate bit put(1, 252) is the caller's job.)"""
    if old <= 128:
        m = _recenter_fwd(new - 1, old - 1)
    else:
        m = _recenter_fwd(255 - new, 255 - old)
    d = _MAP_INV[m]
    if d < 16:
        t.put(0, 128)
        t.put_literal(d, 4)
    elif d < 32:
        t.put(1, 128)
        t.put(0, 128)
        t.put_literal(d - 16, 4)
    elif d < 64:
        t.put(1, 128)
        t.put(1, 128)
        t.put(0, 128)
        t.put_literal(d - 32, 5)
    else:
        t.put(1, 128)
        t.put(1, 128)
        t.put(1, 128)
        dd = d - 64
        if dd < 65:
            t.put_literal(dd, 7)
        else:
            b = (dd + 65) & 1
            x = (dd + 65 - b) >> 1
            t.put_literal(x, 7)
            t.put(b, 128)


def _gated_update(c, old, new):
    """Per-prob update: gate bit at 252, then the subexp delta (a no-op
    update old==new is not representable -> gate 0)."""
    if old == new:
        c.put(0, 252)
    else:
        c.put(1, 252)
        put_update_prob(c, old, new)


def _flat_chdr(allowcomp, comppredmode, filt_switch, hp):
    """Compressed header for a lossless inter frame that sets every
    context-indexed probability group to 128 (mirrors the field order of
    header.parse_compressed_header / reference vp9.c:908-1113)."""
    FLAT = 128
    c = BoolEncoder()
    c.put(0, 128)                       # marker
    # lossless -> txfmmode implied TX_4X4, no tx prob updates

    # coef updates for tx 4x4 only (loop breaks at i == txfmmode == 0)
    c.put(1, 128)                       # update flag for tx 4x4
    D = T.DEFAULT_COEF_PROBS
    for j in range(2):
        for k in range(2):
            for l in range(6):
                for m in range(6):
                    if m >= 3 and l == 0:
                        break
                    for n in range(3):
                        _gated_update(c, int(D[0, j, k, l, m, n]), FLAT)

    for i in range(3):                  # skip
        _gated_update(c, int(T.PROBS_SKIP[i]), FLAT)
    for i in range(7):                  # mv_mode (inter mode tree)
        for j in range(3):
            _gated_update(c, int(T.PROBS_MV_MODE[i, j]), FLAT)
    if filt_switch:
        for i in range(4):
            for j in range(2):
                _gated_update(c, int(T.PROBS_FILTER[i, j]), FLAT)
    for i in range(4):                  # is_inter
        _gated_update(c, int(T.PROBS_INTRA[i]), FLAT)
    if allowcomp:
        c.put(1 if comppredmode else 0, 128)
        if comppredmode:
            c.put(1 if comppredmode == 2 else 0, 128)
        if comppredmode == 2:
            for i in range(5):
                _gated_update(c, int(T.PROBS_COMP[i]), FLAT)
    if comppredmode != 1:
        for i in range(5):
            for j in range(2):
                _gated_update(c, int(T.PROBS_SINGLE_REF[i, j]), FLAT)
    if comppredmode != 0:
        for i in range(5):
            _gated_update(c, int(T.PROBS_COMP_REF[i]), FLAT)
    for i in range(4):                  # y_mode (intra-in-inter)
        for j in range(9):
            _gated_update(c, int(T.PROBS_Y_MODE[i, j]), FLAT)
    for i in range(4):                  # partition
        for j in range(4):
            for k in range(3):
                _gated_update(c, int(T.PROBS_PARTITION[3 - i, j, k]), FLAT)
    # mv probs: keep defaults (no context indexing -> nothing to flatten)
    n_gates = 3 + 2 * (1 + 10 + 1 + 10) + 2 * (2 * 3 + 3)
    if hp:
        n_gates += 2 * 2
    for _ in range(n_gates):
        c.put(0, 252)
    return c.bytes()


def encode_inter_flex(w, h, seed=0, comppredmode=0, signbias=(0, 0, 0),
                      refidx=(0, 0, 0), refresh_mask=0x02, hp=0,
                      filtermode=0, filter_level=0, sharpness=0,
                      coeffs=False, p_intra=0.0, p_skip=0.3,
                      mv_mags=(0, 2, 4, 8, 16, 64, 256), show=True,
                      tile_cols_log2=0, seg_feat=None, seg_abs=0,
                      lf_deltas=None):
    """Visible lossless inter frame with flat per-context probabilities.

    Exercises (depending on flags): compound prediction incl. the comp /
    comp_ref / single_ref context derivations (reference:
    vp9block.c:338-575), switchable/bilinear/sharp interp filters
    (vp9dsp.c:32-85 banks), high-precision MVs (vp9mvs.c:236-289 hp bits),
    intra blocks in inter frames, inter coefficients, nonzero loop-filter
    level + sharpness on inter content.

    seg_feat turns on per-segment FEATURES on an INTER frame: the REF
    feature forces the block's reference without any comp/single-ref
    bits (ref_val 0 forces intra with no is_inter bit,
    vp9block.c:153-156,333-336), the SKIP feature forces skip +
    ZEROMV with no skip/mode bits (vp9block.c:144-150,577-583), and
    alt-LF x lf_deltas exercises the per-(segment, ref, mode) lflvl
    LUT on inter content (vp9.c:769-786). Sub-8x8 partitions stay out
    of skip segments (the reference only forces ZEROMV on the >=8x8
    path)."""
    from ffmpeg_hybrid_tpu.codecs.vp9.probs import Probs, coef_full

    rng = np.random.RandomState(seed)
    P = Probs.defaults()
    allowcomp = int(signbias[0] != signbias[1] or signbias[0] != signbias[2])
    if not allowcomp:
        comppredmode = 0
    filt_switch = filtermode == 4

    # ---- uncompressed header ----
    gb = BitWriter()
    gb.put(0b10, 2)
    gb.put(0, 1)
    gb.put(0, 1)            # profile 0
    gb.put(0, 1)            # show_existing
    gb.put(1, 1)            # non-keyframe
    gb.put(1 if show else 0, 1)
    gb.put(0, 1)            # error_resilient
    if not show:
        gb.put(0, 1)        # intra_only = 0
    gb.put(0, 2)            # reset_frame_context
    gb.put(refresh_mask, 8)
    for i in range(3):
        gb.put(refidx[i], 3)
        gb.put(signbias[i], 1)
    gb.put(0, 1)            # size from ref0? no
    gb.put(0, 1)
    gb.put(0, 1)
    gb.put(w - 1, 16)
    gb.put(h - 1, 16)
    gb.put(0, 1)            # display size
    gb.put(hp, 1)           # high precision mvs
    if filt_switch:
        gb.put(1, 1)
    else:
        gb.put(0, 1)
        gb.put(filtermode, 2)
    gb.put(0, 1)            # refresh_frame_context
    gb.put(0, 1)            # frame_parallel
    gb.put(0, 2)            # frame_context_idx
    gb.put(filter_level, 6)
    gb.put(sharpness, 3)
    _put_lf_deltas(gb, lf_deltas)
    gb.put(0, 8)            # yac_qi = 0 (lossless)
    gb.put(0, 1)
    gb.put(0, 1)
    gb.put(0, 1)
    if seg_feat is not None:
        _put_seg_features(gb, seg_feat, seg_abs)
    else:
        gb.put(0, 1)        # segmentation off
    sb_cols = (w + 63) >> 6
    min_log2 = 0
    while sb_cols > (64 << min_log2):
        min_log2 += 1
    mx = 0
    while (sb_cols >> mx) >= 4:
        mx += 1
    mx = max(0, mx - 1)
    lc = max(min_log2, tile_cols_log2)
    assert lc <= mx or lc == min_log2, "tile_cols beyond max"
    # increment-bit encoding: 1-bits up to the requested log2, then a
    # 0 stop bit while below the max (reference: vp9.c:586-591)
    for _ in range(lc - min_log2):
        gb.put(1, 1)
    if lc < mx:
        gb.put(0, 1)
    gb.put(0, 1)            # log2_tile_rows

    chdr = _flat_chdr(allowcomp, comppredmode, filt_switch, hp)
    gb.put(len(chdr), 16)
    hdr = gb.bytes()

    # ---- tile data ----
    t = BoolEncoder()
    t.put(0, 128)
    sb_rows = (h + 63) >> 6
    cols = (w + 7) >> 3
    rows = (h + 7) >> 3
    NEARESTMV, NEARMV, ZEROMV, NEWMV = 10, 11, 12, 13
    FLAT2 = np.full(3, 128, np.uint8)
    FLAT9 = np.full(9, 128, np.uint8)
    coef11_flat = coef_full(np.full((4, 2, 2, 6, 6, 3), 128, np.uint8))
    ce = CoeffEncoder(t, 8)
    from ffmpeg_hybrid_tpu.codecs.vp9.blockdec import SIZE_GROUP

    def put_mv_comp(idx, v):
        """Inverse of read_mv_component (vp9mvs.c:236-289)."""
        sign = v < 0
        n = abs(v) - 1
        if not hp:
            assert n & 1, "hp off: only even magnitudes codable"
        t.put(1 if sign else 0, int(P.mv_sign[idx]))
        if n < 16:
            t.put_tree(T.MV_CLASS_TREE, P.mv_classes[idx], 0)
            t.put(n >> 3, int(P.mv_class0[idx]))
            t.put_tree(T.MV_FP_TREE, P.mv_class0_fp[idx][n >> 3],
                       (n >> 1) & 3)
            if hp:
                t.put(n & 1, int(P.mv_class0_hp[idx]))
        else:
            cl = (n >> 3).bit_length() - 1
            t.put_tree(T.MV_CLASS_TREE, P.mv_classes[idx], cl)
            off = n - (8 << cl)
            for m in range(cl):
                t.put((off >> (3 + m)) & 1, int(P.mv_bits[idx][m]))
            t.put_tree(T.MV_FP_TREE, P.mv_fp[idx], (off >> 1) & 3)
            if hp:
                t.put(off & 1, int(P.mv_hp[idx]))
            else:
                assert off & 1

    def put_delta():
        dy = int(rng.choice(mv_mags)) * int(rng.choice([-1, 1]))
        dx = int(rng.choice(mv_mags)) * int(rng.choice([-1, 1]))
        if hp:  # odd magnitudes only codable with hp
            dy += int(rng.randint(0, 2)) * (1 if dy >= 0 else -1)
            dx += int(rng.randint(0, 2)) * (1 if dx >= 0 else -1)
        j = (2 if dy else 0) | (1 if dx else 0)
        t.put_tree(T.MV_JOINT_TREE, P.mv_joint, j)
        if dy:
            put_mv_comp(0, dy)
        if dx:
            put_mv_comp(1, dx)

    def put_mode_and_mvs(n_refs):
        mode = int(rng.choice([NEARESTMV, NEARMV, ZEROMV, NEWMV],
                              p=[0.15, 0.15, 0.15, 0.55]))
        t.put_tree(T.INTER_MODE_TREE, FLAT2, mode)
        return mode

    def put_deltas(mode, n_refs):
        if mode == NEWMV:
            for _ in range(n_refs):
                put_delta()

    def enc_plane_coeffs(modes, intra, bs, r, ccol, sh, sv, probs11, uv):
        """Mirror of decode_coeffs' per-plane tx-block walk for lossless
        (4x4 WHT), flat probs -> nnz arg irrelevant."""
        w4 = int(T.BWH_TAB[1][bs][0]) * 2
        h4 = int(T.BWH_TAB[1][bs][1]) * 2
        end_x = min(2 * (cols - ccol), w4)
        end_y = min(2 * (rows - r), h4)
        if uv:
            end_x >>= sh
            end_y >>= sv
        n = 0
        for yy in range(0, end_y):
            for xx in range(0, end_x):
                if uv:
                    txtp = 0
                    scan, nb = T.SCANS[0][0], T.SCANS_NB[0][0]
                else:
                    mode_idx = n if bs > 9 else 0
                    txtp = int(T.INTRA_TXFM_TYPE[modes[mode_idx]]) \
                        if intra else 0
                    scan, nb = T.SCANS[4][txtp], T.SCANS_NB[4][txtp]
                toks = np.zeros((4, 4), np.int64)
                k = int(rng.randint(0, 6))
                if k:
                    pos = rng.choice(16, size=k, replace=False)
                    toks.reshape(-1)[pos] = rng.choice(
                        [1, 2, 3, 5, 9, 20, 80], size=k) * \
                        rng.choice([-1, 1], k)
                ce.encode_block(toks, probs11, 0, scan, nb)
                n += 1

    def encode_block(r, ccol, bl, bp):
        bs = bl * 3 + bp
        sid = 0
        seg_skip = seg_ref = False
        if seg_feat is not None:
            # sub-8x8 stays out of skip segments: the reference only
            # forces ZEROMV on the >=8x8 path (vp9block.c:577-583)
            while True:
                sid = int(rng.randint(0, 8))
                if not (bs > 9 and seg_feat[sid][3]):
                    break
            t.put_tree(T.SEGMENTATION_TREE, SEG_TREE_PROBS, sid)
            seg_skip = bool(seg_feat[sid][3])
            seg_ref = seg_feat[sid][2] is not None
        if seg_skip:
            skip = True                         # no skip bit read
        else:
            skip = bool(rng.rand() < p_skip) if coeffs else True
            t.put(1 if skip else 0, 128)        # skip (flat)
        if seg_ref:
            # REF feature: intra iff ref_val==0, NO is_inter bit
            # (vp9block.c:153-156)
            intra = seg_feat[sid][2] == 0
        else:
            intra = bool(rng.rand() < p_intra)
            t.put(0 if intra else 1, 128)       # is_inter (flat)
        # lossless -> no tx size bits
        modes = [2, 2, 2, 2]
        if intra:
            # y modes (reference: vp9block.c:217-318 inter-frame intra)
            if bs > 9:
                modes[0] = int(rng.randint(0, 10))
                t.put_tree(T.INTRAMODE_TREE, FLAT9, modes[0])
                if bs != 10:
                    modes[1] = int(rng.randint(0, 10))
                    t.put_tree(T.INTRAMODE_TREE, FLAT9, modes[1])
                else:
                    modes[1] = modes[0]
                if bs != 11:
                    modes[2] = int(rng.randint(0, 10))
                    t.put_tree(T.INTRAMODE_TREE, FLAT9, modes[2])
                    if bs != 10:
                        modes[3] = int(rng.randint(0, 10))
                        t.put_tree(T.INTRAMODE_TREE, FLAT9, modes[3])
                    else:
                        modes[3] = modes[2]
                else:
                    modes[2] = modes[0]
                    modes[3] = modes[1]
            else:
                m = int(rng.randint(0, 10))
                t.put_tree(T.INTRAMODE_TREE, FLAT9, m)
                modes = [m, m, m, m]
            uvm = int(rng.randint(0, 10))
            t.put_tree(T.INTRAMODE_TREE, P.uv_mode[modes[3]], uvm)
        else:
            # --- refs (flat comp/comp_ref/single_ref) ---
            comp = 0
            if seg_ref:
                # forced ref: comp=0, ref=ref_val-1, NO ref bits
                # (vp9block.c:333-336)
                pass
            else:
                if comppredmode == 2:
                    comp = int(rng.rand() < 0.5)
                    t.put(comp, 128)
                elif comppredmode == 1:
                    comp = 1
                if comp:
                    t.put(int(rng.rand() < 0.5), 128)   # comp_ref bit
                else:
                    bit0 = int(rng.rand() < 0.5)
                    t.put(bit0, 128)                    # single_ref bit 0
                    if bit0:
                        t.put(int(rng.rand() < 0.5), 128)
            n_refs = 2 if comp else 1
            if bs <= 9:
                if seg_skip:
                    # forced ZEROMV, no mode bits (vp9block.c:577-583)
                    modes = [ZEROMV] * 4
                else:
                    mode = put_mode_and_mvs(n_refs)
                    modes = [mode] * 4
            if filt_switch:
                t.put_tree(T.FILTER_TREE, FLAT2[:2], int(rng.randint(0, 3)))
            if bs > 9:
                modes[0] = put_mode_and_mvs(n_refs)
                put_deltas(modes[0], n_refs)
                if bs != 10:
                    modes[1] = put_mode_and_mvs(n_refs)
                    put_deltas(modes[1], n_refs)
                else:
                    modes[1] = modes[0]
                if bs != 11:
                    modes[2] = put_mode_and_mvs(n_refs)
                    put_deltas(modes[2], n_refs)
                    if bs != 10:
                        modes[3] = put_mode_and_mvs(n_refs)
                        put_deltas(modes[3], n_refs)
                    else:
                        modes[3] = modes[2]
                else:
                    modes[2] = modes[0]
                    modes[3] = modes[1]
            else:
                put_deltas(modes[0], n_refs)
        if not skip:
            enc_plane_coeffs(modes, intra, bs, r, ccol, 1, 1,
                             coef11_flat[0][0][0 if intra else 1], False)
            for _pl in range(2):
                enc_plane_coeffs(modes, intra, bs, r, ccol, 1, 1,
                                 coef11_flat[0][1][0 if intra else 1], True)

    def encode_sb(r, ccol, bl):
        hbs = 4 >> bl
        if bl == 3:
            bp = int(rng.choice([0, 1, 2, 3], p=[0.4, 0.2, 0.2, 0.2]))
            t.put_tree(T.PARTITION_TREE, FLAT2, bp)
            encode_block(r, ccol, bl, bp)
        elif ccol + hbs < cols:
            if r + hbs < rows:
                bp = int(rng.choice([0, 1, 2, 3], p=[0.35, 0.15, 0.15, 0.35]))
                t.put_tree(T.PARTITION_TREE, FLAT2, bp)
                if bp == 0:
                    encode_block(r, ccol, bl, 0)
                elif bp == 1:
                    encode_block(r, ccol, bl, 1)
                    encode_block(r + hbs, ccol, bl, 1)
                elif bp == 2:
                    encode_block(r, ccol, bl, 2)
                    encode_block(r, ccol + hbs, bl, 2)
                else:
                    encode_sb(r, ccol, bl + 1)
                    encode_sb(r, ccol + hbs, bl + 1)
                    encode_sb(r + hbs, ccol, bl + 1)
                    encode_sb(r + hbs, ccol + hbs, bl + 1)
            else:
                split = bool(rng.rand() < 0.5)
                t.put(1 if split else 0, 128)
                if split:
                    encode_sb(r, ccol, bl + 1)
                    encode_sb(r, ccol + hbs, bl + 1)
                else:
                    encode_block(r, ccol, bl, 1)
        elif r + hbs < rows:
            split = bool(rng.rand() < 0.5)
            t.put(1 if split else 0, 128)
            if split:
                encode_sb(r, ccol, bl + 1)
                encode_sb(r + hbs, ccol, bl + 1)
            else:
                encode_block(r, ccol, bl, 2)
        else:
            encode_sb(r, ccol, bl + 1)

    # tile walk (flat probabilities mean no left-context to reset;
    # tiles only change the coder structure + size prefixes)
    tiles = []
    for tc in range(1 << lc):
        c0 = min((tc * sb_cols) >> lc, sb_cols) * 8
        c1 = min(((tc + 1) * sb_cols) >> lc, sb_cols) * 8
        if tc:
            t = BoolEncoder()
            t.put(0, 128)
            ce = CoeffEncoder(t, 8)
        for r in range(0, sb_rows * 8, 8):
            for ccol in range(c0, c1, 8):
                encode_sb(r, ccol, 0)
        tiles.append(t.bytes())
    data = b""
    for i, tb in enumerate(tiles):
        if i < len(tiles) - 1:
            data += len(tb).to_bytes(4, "big")
        data += tb
    return _finish(hdr, chdr, data)


def _flex_selftest():
    """put_update_prob must round-trip through the decoder for every
    (old, new=128) pair used above plus a sweep."""
    from ffmpeg_hybrid_tpu.codecs.vp9.rac import BoolDecoder, update_prob
    pairs = [(o, 128) for o in range(1, 256) if o != 128] + \
            [(128, n) for n in range(1, 256) if n != 128] + \
            [(17, 213), (240, 3)]
    t = BoolEncoder()
    t.put(0, 128)
    for old, new in pairs:
        put_update_prob(t, old, new)
    dec = BoolDecoder(t.bytes())
    assert not dec.get()
    for old, new in pairs:
        got = update_prob(dec, old)
        assert got == new, (old, new, got)


def flex_main():
    import subprocess
    from ffmpeg_hybrid_tpu.formats.ivf import write_ivf
    _flex_selftest()
    vec = os.path.join(os.path.dirname(__file__), "..", "vectors")
    oracle = os.path.join(os.path.dirname(__file__), "..", ".oracle",
                          "build", "ffmpeg")
    rng = np.random.RandomState(77)

    def kf(w, h, seed):
        r = np.random.RandomState(seed)
        return encode_keyframe_lossless(
            r.randint(0, 256, (h, w)),
            r.randint(0, 256, ((h + 1) // 2, (w + 1) // 2)),
            r.randint(0, 256, ((h + 1) // 2, (w + 1) // 2)), 8)

    def emit(name, w, h, pkts):
        path = os.path.join(vec, name + ".ivf")
        write_ivf(path, b"VP90", w, h, 30, 1,
                  [(i * 33, p) for i, p in enumerate(pkts)])
        out = subprocess.run(
            [oracle, "-nostdin", "-bitexact", "-i", path, "-map", "0:v",
             "-noautoscale", "-f", "framemd5", "-"], capture_output=True)
        if out.returncode != 0:
            print(name, "ORACLE FAILED:",
                  out.stderr.decode().strip().splitlines()[-1])
            return False
        with open(os.path.join(vec, name + ".framemd5"), "wb") as fh:
            fh.write(out.stdout)
        nf = len([l for l in out.stdout.decode().splitlines()
                  if l and not l.startswith("#")])
        print(name, f"{w}x{h}: {nf} frame(s)")
        return True

    # compound prediction, always-on (comppredmode=1): kf fills all slots
    # with A; flex single-ref NEWMV refreshes slot 1 with B; the compound
    # frame mixes fixed ref (slot 0, bias 1) with var refs {slot0, slot1}
    w, h = 96, 96
    k = kf(w, h, 101)
    f1 = encode_inter_flex(w, h, seed=102, refresh_mask=0x02,
                           mv_mags=(0, 2, 4, 8, 16))
    f2 = encode_inter_flex(w, h, seed=103, comppredmode=1,
                           signbias=(0, 0, 1), refidx=(0, 1, 0),
                           refresh_mask=0x04, mv_mags=(0, 2, 8, 32))
    emit("mini_comp", w, h, [k, f1, f2])

    # switchable compound + switchable filter + intra-in-inter + coeffs +
    # loop filter, odd size (the kitchen sink)
    w, h = 98, 66
    k = kf(w, h, 111)
    f1 = encode_inter_flex(w, h, seed=112, refresh_mask=0x02,
                           mv_mags=(0, 2, 4, 16))
    f2 = encode_inter_flex(w, h, seed=113, comppredmode=2,
                           signbias=(0, 1, 1), refidx=(0, 1, 0),
                           refresh_mask=0x04, filtermode=4,
                           filter_level=28, coeffs=True, p_intra=0.25,
                           mv_mags=(0, 2, 4, 8, 64))
    f3 = encode_inter_flex(w, h, seed=114, comppredmode=2,
                           signbias=(1, 0, 1), refidx=(1, 2, 0),
                           refresh_mask=0x08, filtermode=4,
                           filter_level=12, coeffs=True, p_intra=0.25,
                           mv_mags=(0, 2, 4, 8, 64))
    emit("mini_comp_sw", w, h, [k, f1, f2, f3])

    # high-precision MVs (hp bits read for every coded component while
    # all |mv| stay < 64): single-ref and compound frames
    w, h = 96, 96
    k = kf(w, h, 121)
    f1 = encode_inter_flex(w, h, seed=122, hp=1, refresh_mask=0x02,
                           mv_mags=(0, 2, 2, 4), p_skip=1.0)
    f2 = encode_inter_flex(w, h, seed=123, hp=1, comppredmode=2,
                           signbias=(0, 0, 1), refidx=(0, 1, 0),
                           refresh_mask=0x04, mv_mags=(0, 2, 2, 4),
                           p_skip=1.0)
    emit("mini_hp", w, h, [k, f1, f2])

    # bilinear and sharp interp filters (header-fixed filtermode 3 / 2)
    w, h = 96, 96
    k = kf(w, h, 131)
    f1 = encode_inter_flex(w, h, seed=132, filtermode=3, refresh_mask=0x02,
                           mv_mags=(0, 2, 4, 8, 16, 64))
    f2 = encode_inter_flex(w, h, seed=133, filtermode=2, refresh_mask=0x04,
                           mv_mags=(0, 2, 4, 8, 16, 64))
    f3 = encode_inter_flex(w, h, seed=134, filtermode=1, refresh_mask=0x08,
                           mv_mags=(0, 2, 4, 8, 16, 64))
    emit("mini_filters", w, h, [k, f1, f2, f3])

    # multi-tile-column INTER frames (tile boundaries cut inter blocks,
    # left-ctx resets per tile, per-tile size prefixes) — also the
    # substrate for the sharded full-frame decode tests
    # (parallel/fullframe.py): intra + inter + coeffs + loop filter
    # across 2 and 4 real tile columns
    for name, w2, lc2 in (("mini_inter_tiles2", 512, 1),
                          ("mini_inter_tiles4", 1024, 2)):
        h2 = 128
        k = encode_keyframe_random(w2, h2, seed=150 + lc2, yac_qi=60,
                                   filter_level=24,
                                   tile_cols_log2=lc2)
        f1 = encode_inter_flex(w2, h2, seed=151 + lc2, refresh_mask=0x02,
                               filter_level=20, coeffs=True,
                               p_intra=0.2, mv_mags=(0, 2, 4, 8, 16),
                               tile_cols_log2=lc2)
        f2 = encode_inter_flex(w2, h2, seed=152 + lc2, refidx=(0, 1, 0),
                               refresh_mask=0x04, filter_level=35,
                               coeffs=True, p_intra=0.1,
                               mv_mags=(0, 2, 4, 8, 64),
                               tile_cols_log2=lc2)
        emit(name, w2, h2, [k, f1, f2])

    # compound prediction against scaled references: refs are 96x96, the
    # compound frame is 128x128 -> scaled-MC avg path
    w, h = 96, 96
    k = kf(w, h, 141)
    f1 = encode_inter_flex(w, h, seed=142, refresh_mask=0x02,
                           mv_mags=(0, 2, 8))
    f2 = encode_inter_flex(128, 128, seed=143, comppredmode=1,
                           signbias=(0, 0, 1), refidx=(0, 1, 0),
                           refresh_mask=0x04, mv_mags=(0, 2, 8, 32))
    emit("mini_comp_scaled", 128, 128, [k, f1, f2])

    # ---- segmentation FEATURE vectors (q / lf / ref / skip) ----
    # per-segment Q and LF deltas + skip on a lossy keyframe: exercises
    # the per-segment qmul tables and the seg-lflvl LUT (vp9.c:747-792)
    segf_kf = [
        (None, None, None, False),     # 0: plain
        (40,   None, None, False),     # 1: alt-Q up
        (-30,  None, None, False),     # 2: alt-Q down
        (None, 20,   None, False),     # 3: alt-LF up
        (10,   -20,  None, False),     # 4: both
        (None, None, None, True),      # 5: skip
        (80,   -24,  None, False),     # 6
        (-50,  39,   None, False),     # 7: clamp territory
    ]
    w, h = 130, 70
    pkt = encode_keyframe_random(w, h, 8, seed=160, yac_qi=60,
                                 filter_level=24, seg_feat=segf_kf)
    emit("mini_segq_130x70", w, h, [pkt])

    # absolute-values mode (vp9.c:748-752 absolute branch)
    segf_abs = [
        (None, None, None, False),
        (120,  None, None, False),     # abs Q
        (None, 5,    None, False),     # abs LF
        (30,   60,   None, False),
        (None, None, None, True),
        (200,  None, None, False),
        (None, 63,   None, False),
        (2,    1,    None, False),
    ]
    pkt = encode_keyframe_random(96, 64, 8, seed=161, yac_qi=90,
                                 filter_level=40, seg_feat=segf_abs,
                                 seg_abs=1)
    emit("mini_segabs_96x64", 96, 64, [pkt])

    # custom lf_delta updates on a keyframe (delta LUT rebuild with
    # non-default intra/ref deltas, vp9.c:688-698 + 769-786)
    pkt = encode_keyframe_random(130, 70, 8, seed=162, yac_qi=70,
                                 filter_level=32,
                                 lf_deltas=([-8, None, 6, -6], [4, -4]))
    emit("mini_lfdelta_130x70", 130, 70, [pkt])

    # seg REF feature on inter frames: segments force intra (ref 0) /
    # last (1) / golden (2) / altref (3) with no ref bits; skip-feature
    # segment forces ZEROMV; alt-LF + lf_deltas makes the forced ref
    # VISIBLE in the loop filter via the (seg, ref, mode) lflvl LUT
    segf_ref = [
        (None, None, None, False),     # 0: plain inter
        (None, None, 1,    False),     # 1: force LAST
        (None, None, 2,    False),     # 2: force GOLDEN
        (None, None, 3,    False),     # 3: force ALTREF
        (None, None, 0,    False),     # 4: force INTRA
        (None, None, None, True),      # 5: skip (ZEROMV)
        (None, 15,   1,    False),     # 6: alt-LF x forced ref
        (None, -18,  None, False),     # 7: alt-LF
    ]
    w, h = 96, 96
    k = kf(w, h, 163)
    f1 = encode_inter_flex(w, h, seed=164, refresh_mask=0x02,
                           mv_mags=(0, 2, 4, 8))
    f2 = encode_inter_flex(w, h, seed=165, refidx=(0, 1, 0),
                           refresh_mask=0x04, filter_level=30,
                           coeffs=True, p_intra=0.15,
                           mv_mags=(0, 2, 4, 16), seg_feat=segf_ref,
                           lf_deltas=([2, -3, 5, -5], [3, -2]))
    f3 = encode_inter_flex(w, h, seed=166, refidx=(1, 2, 0),
                           refresh_mask=0x08, filter_level=18,
                           coeffs=True, seg_feat=segf_ref,
                           mv_mags=(0, 2, 8))
    emit("mini_segref", w, h, [k, f1, f2, f3])

    # seg REF feature interplay with COMPOUND mode selection: frames
    # with comppredmode switchable where forced-ref segments skip the
    # comp flag entirely (vp9block.c:333-336 bypasses the whole
    # comp/single derivation)
    segf_refc = [
        (None, None, None, False),
        (None, None, 1,    False),
        (None, None, 3,    False),
        (None, None, None, False),
        (None, None, 0,    False),
        (None, None, None, True),
        (None, None, 2,    False),
        (None, None, None, False),
    ]
    w, h = 96, 96
    k = kf(w, h, 167)
    f1 = encode_inter_flex(w, h, seed=168, refresh_mask=0x02,
                           mv_mags=(0, 2, 4, 8))
    f2 = encode_inter_flex(w, h, seed=169, comppredmode=2,
                           signbias=(0, 0, 1), refidx=(0, 1, 0),
                           refresh_mask=0x04, filter_level=26,
                           coeffs=True, seg_feat=segf_refc,
                           mv_mags=(0, 2, 4, 32))
    emit("mini_segref_comp", w, h, [k, f1, f2])


if __name__ == "__main__":
    main()
    flex_main()
