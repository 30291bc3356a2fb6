"""Pass A: per-superblock entropy decode (partitions, modes, MVs,
coefficients) into dense per-frame tensors for the TPU recon pass.

Behavioral reference: decode_sb (reference: libavcodec/vp9.c:1115-1193),
decode_mode / decode_coeffs / mask_edges / ff_vp9_decode_block
(reference: libavcodec/vp9block.c). Fresh implementation of the normative
syntax; all context derivations match the reference bit-for-bit (tested
end-to-end against the oracle decoder via framemd5).
"""
from __future__ import annotations

import numpy as np

from . import tables as T
from . import mvs
from .header import TX_4X4, TX_8X8, TX_16X16, TX_32X32, TX_SWITCHABLE, \
    FILTER_SWITCHABLE, PRED_SINGLEREF, PRED_COMPREF, PRED_SWITCHABLE

# Block sizes (index: larger = smaller block), matches vp9shared.h:86-101
BS_64x64, BS_64x32, BS_32x64, BS_32x32, BS_32x16, BS_16x32, BS_16x16, \
    BS_16x8, BS_8x16, BS_8x8, BS_8x4, BS_4x8, BS_4x4 = range(13)
N_BS_SIZES = 13

DC_PRED = 2
NEARESTMV, NEARMV, ZEROMV, NEWMV = 10, 11, 12, 13

PARTITION_NONE, PARTITION_H, PARTITION_V, PARTITION_SPLIT = range(4)

# decode_mode statics (reference: vp9block.c:82-93)
LEFT_CTX = [0x0, 0x8, 0x0, 0x8, 0xC, 0x8, 0xC, 0xE, 0xC, 0xE, 0xF, 0xE, 0xF]
ABOVE_CTX = [0x0, 0x0, 0x8, 0x8, 0x8, 0xC, 0xC, 0xC, 0xE, 0xE, 0xE, 0xF, 0xF]
MAX_TX_FOR_BL_BP = [TX_32X32, TX_32X32, TX_32X32, TX_32X32, TX_16X16,
                    TX_16X16, TX_16X16, TX_8X8, TX_8X8, TX_8X8, TX_4X4,
                    TX_4X4, TX_4X4]
SIZE_GROUP = [3, 3, 3, 3, 2, 2, 2, 1, 1, 1]
INTER_MODE_CTX_LUT = np.array([
    [6, 6, 6, 6, 6, 6, 6, 6, 6, 6, 5, 5, 5, 5]] * 10 + [
    [5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 2, 2, 1, 3],
    [5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 2, 2, 1, 3],
    [5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 1, 1, 0, 3],
    [5, 5, 5, 5, 5, 5, 5, 5, 5, 5, 3, 3, 3, 4]], dtype=np.uint8)
SUB8X8_OFF = [3, 0, 0, 1, 0, 0, 0, 0, 0, 0]  # reference: vp9block.c:584

# rows padded to 8 entries like the C int16_t[8] (band may over-increment
# on the final coefficient; the padding zero is never meaningfully used)
BAND_COUNTS = [
    [1, 2, 3, 4, 3, 16 - 13, 0, 0],
    [1, 2, 3, 4, 11, 64 - 21, 0, 0],
    [1, 2, 3, 4, 11, 256 - 21, 0, 0],
    [1, 2, 3, 4, 11, 1024 - 21, 0, 0],
]


class Block:
    __slots__ = ("bs", "bl", "bp", "seg_id", "skip", "intra", "tx", "uvtx",
                 "mode", "uvmode", "comp", "ref", "filter", "mv")

    def __init__(self):
        self.mode = [DC_PRED] * 4
        self.ref = [0, 0]
        # mv[sub-block 0..3][ref 0..1] = (x, y)
        self.mv = [[(0, 0), (0, 0)] for _ in range(4)]
        self.bs = self.bl = self.bp = 0
        self.seg_id = self.skip = self.intra = 0
        self.tx = self.uvtx = 0
        self.uvmode = DC_PRED
        self.comp = 0
        self.filter = 0


class TileDecoder:
    """Decodes one tile's superblocks; holds the left-edge context."""

    def __init__(self, s):
        self.s = s
        self.c = None  # BoolDecoder for current tile
        self.counts = s.counts_factory()
        self.b = Block()
        self.row = self.col = self.row7 = 0
        self.tile_col_start = 0
        self.min_mv = (0, 0)
        self.max_mv = (0, 0)
        # left context (per sb-row-of-tile)
        self.left_y_nnz_ctx = np.zeros(16, np.uint8)
        self.left_mode_ctx = np.zeros(16, np.uint8)
        self.left_mv_ctx = np.zeros((16, 2, 2), np.int32)
        self.left_uv_nnz_ctx = np.zeros((2, 16), np.uint8)
        self.left_partition_ctx = np.zeros(8, np.uint8)
        self.left_skip_ctx = np.zeros(8, np.uint8)
        self.left_txfm_ctx = np.zeros(8, np.uint8)
        self.left_segpred_ctx = np.zeros(8, np.uint8)
        self.left_intra_ctx = np.zeros(8, np.uint8)
        self.left_comp_ctx = np.zeros(8, np.uint8)
        self.left_ref_ctx = np.zeros(8, np.uint8)
        self.left_filter_ctx = np.zeros(8, np.uint8)

    def reset_left(self):
        """Per sb-row left-edge reset (reference: vp9.c:1361-1372)."""
        s = self.s
        self.left_partition_ctx[:] = 0
        self.left_skip_ctx[:] = 0
        if s.header.keyframe or s.header.intraonly:
            self.left_mode_ctx[:] = DC_PRED
        else:
            self.left_mode_ctx[:8] = NEARESTMV
        self.left_y_nnz_ctx[:] = 0
        self.left_uv_nnz_ctx[:] = 0
        self.left_segpred_ctx[:] = 0

    # ------------------------------------------------------------------
    # superblock partition walk (reference: vp9.c:1115-1193)
    def decode_sb(self, row, col, bl):
        s = self.s
        c_ctx = ((int(s.above_partition_ctx[col]) >> (3 - bl)) & 1) | \
            (((int(self.left_partition_ctx[row & 7]) >> (3 - bl)) & 1) << 1)
        if s.header.keyframe or s.header.intraonly:
            p = T.DEFAULT_KF_PARTITION_PROBS[bl][c_ctx]
        else:
            p = s.probs.partition[bl][c_ctx]
        hbs = 4 >> bl

        if bl == 3:  # BL_8X8
            bp = self.c.get_tree(T.PARTITION_TREE, p)
            self.decode_block(row, col, bl, bp)
        elif col + hbs < s.cols:
            if row + hbs < s.rows:
                bp = self.c.get_tree(T.PARTITION_TREE, p)
                if bp == PARTITION_NONE:
                    self.decode_block(row, col, bl, bp)
                elif bp == PARTITION_H:
                    self.decode_block(row, col, bl, bp)
                    self.decode_block(row + hbs, col, bl, bp)
                elif bp == PARTITION_V:
                    self.decode_block(row, col, bl, bp)
                    self.decode_block(row, col + hbs, bl, bp)
                else:
                    self.decode_sb(row, col, bl + 1)
                    self.decode_sb(row, col + hbs, bl + 1)
                    self.decode_sb(row + hbs, col, bl + 1)
                    self.decode_sb(row + hbs, col + hbs, bl + 1)
            elif self.c.get_prob(int(p[1])):
                bp = PARTITION_SPLIT
                self.decode_sb(row, col, bl + 1)
                self.decode_sb(row, col + hbs, bl + 1)
            else:
                bp = PARTITION_H
                self.decode_block(row, col, bl, bp)
        elif row + hbs < s.rows:
            if self.c.get_prob(int(p[2])):
                bp = PARTITION_SPLIT
                self.decode_sb(row, col, bl + 1)
                self.decode_sb(row + hbs, col, bl + 1)
            else:
                bp = PARTITION_V
                self.decode_block(row, col, bl, bp)
        else:
            bp = PARTITION_SPLIT
            self.decode_sb(row, col, bl + 1)
        self.counts.partition[bl, c_ctx, bp] += 1

    # ------------------------------------------------------------------
    def decode_block(self, row, col, bl, bp):
        """reference: ff_vp9_decode_block (vp9block.c:1264-1463), pass-1
        subset (entropy decode + lf mask building; recon happens in pass B).
        """
        s = self.s
        b = self.b
        b.bs = bs = bl * 3 + bp
        b.bl = bl
        b.bp = bp
        self.row, self.col = row, col
        self.row7 = row & 7
        w4 = int(T.BWH_TAB[1, bs, 0])
        h4 = int(T.BWH_TAB[1, bs, 1])
        self.min_mv = (-(128 + col * 64), -(128 + row * 64))
        self.max_mv = (128 + (s.cols - col - w4) * 64,
                       128 + (s.rows - row - h4) * 64)

        self.decode_mode()
        b.uvtx = b.tx - ((s.ss_h and w4 * 2 == (1 << b.tx)) or
                         (s.ss_v and h4 * 2 == (1 << b.tx)))

        if not b.skip:
            has_coeffs = self.decode_coeffs()
            if not has_coeffs and b.bs <= BS_8x8 and not b.intra:
                b.skip = 1
                s.above_skip_ctx[col:col + w4] = 1
                self.left_skip_ctx[self.row7:self.row7 + h4] = 1
        else:
            # zero nnz contexts (reference: SPLAT_ZERO_YUV, vp9block.c:1316-)
            s.above_y_nnz_ctx[col * 2:(col + w4) * 2] = 0
            self.left_y_nnz_ctx[self.row7 * 2:(self.row7 + h4) * 2] = 0
            if s.ss_h:
                s.above_uv_nnz_ctx[:, col:col + w4] = 0
            else:
                s.above_uv_nnz_ctx[:, col * 2:(col + w4) * 2] = 0
            if s.ss_v:
                self.left_uv_nnz_ctx[:, self.row7:self.row7 + h4] = 0
            else:
                self.left_uv_nnz_ctx[:, self.row7 * 2:(self.row7 + h4) * 2] \
                    = 0

        # write per-block state into the frame tensors for pass B
        s.record_block(self, b)

        # loop filter level + edge masks (reference: vp9block.c:1439-1452)
        if s.header.filter_level:
            lvl = int(s.header.seg_feat[b.seg_id].lflvl[
                0 if b.intra else b.ref[0] + 1,
                0 if b.mode[3] == ZEROMV else 1])
            if lvl > 0:
                x_end = min(s.cols - col, w4)
                y_end = min(s.rows - row, h4)
                skip_inter = (not b.intra) and b.skip
                col7 = col & 7
                sbr, sbc = row >> 3, col >> 3
                s.lf_level[sbr, sbc,
                           self.row7:self.row7 + h4,
                           col7:col7 + w4] = lvl
                mask_edges(s.lf_mask[sbr, sbc, 0], 0, 0, self.row7, col7,
                           x_end, y_end, 0, 0, b.tx, skip_inter)
                if s.ss_h or s.ss_v:
                    mask_edges(
                        s.lf_mask[sbr, sbc, 1], s.ss_h, s.ss_v, self.row7,
                        col7, x_end, y_end,
                        (s.cols & 7) if (s.cols & 1) and col + w4 >= s.cols
                        else 0,
                        (s.rows & 7) if (s.rows & 1) and row + h4 >= s.rows
                        else 0,
                        b.uvtx, skip_inter)

    # ------------------------------------------------------------------
    def decode_mode(self):
        """reference: decode_mode (vp9block.c:80-802)."""
        s = self.s
        b = self.b
        c = self.c
        h = s.header
        cnt = self.counts
        row, col, row7 = self.row, self.col, self.row7
        max_tx = MAX_TX_FOR_BL_BP[b.bs]
        bw4 = int(T.BWH_TAB[1, b.bs, 0])
        bh4 = int(T.BWH_TAB[1, b.bs, 1])
        w4 = min(s.cols - col, bw4)
        h4 = min(s.rows - row, bh4)
        have_a = row > 0
        have_l = col > self.tile_col_start
        filter_id = 0
        vref = 0

        # --- segment id ---
        if not h.seg_enabled:
            b.seg_id = 0
        elif h.keyframe or h.intraonly:
            b.seg_id = 0 if not h.seg_update_map else \
                c.get_tree(T.SEGMENTATION_TREE, h.seg_prob)
        elif (not h.seg_update_map or
              (h.seg_temporal and c.get_prob(int(
                  h.seg_pred_prob[int(s.above_segpred_ctx[col]) +
                                  int(self.left_segpred_ctx[row7])])))):
            if not h.errorres and s.prev_segmap is not None:
                seg = s.prev_segmap[row:row + h4, col:col + w4]
                b.seg_id = int(seg.min()) if seg.size else 0
            else:
                b.seg_id = 0
            s.above_segpred_ctx[col:col + w4] = 1
            self.left_segpred_ctx[row7:row7 + h4] = 1
        else:
            b.seg_id = c.get_tree(T.SEGMENTATION_TREE, h.seg_prob)
            s.above_segpred_ctx[col:col + w4] = 0
            self.left_segpred_ctx[row7:row7 + h4] = 0
        if h.seg_enabled and (h.seg_update_map or h.keyframe or h.intraonly):
            s.cur_segmap[row:row + bh4, col:col + bw4] = b.seg_id

        # --- skip ---
        b.skip = int(h.seg_enabled
                     and h.seg_feat[b.seg_id].skip_enabled)
        if not b.skip:
            ctx = int(self.left_skip_ctx[row7]) + int(s.above_skip_ctx[col])
            b.skip = c.get_prob(int(s.probs.skip[ctx]))
            cnt.skip[ctx, b.skip] += 1

        # --- intra/inter ---
        if h.keyframe or h.intraonly:
            b.intra = 1
        elif h.seg_enabled and h.seg_feat[b.seg_id].ref_enabled:
            b.intra = int(not h.seg_feat[b.seg_id].ref_val)
        else:
            if have_a and have_l:
                ctx = int(s.above_intra_ctx[col]) + \
                    int(self.left_intra_ctx[row7])
                ctx += (ctx == 2)
            else:
                ctx = (2 * int(s.above_intra_ctx[col]) if have_a else
                       2 * int(self.left_intra_ctx[row7]) if have_l else 0)
            bit = c.get_prob(int(s.probs.intra[ctx]))
            cnt.intra[ctx, bit] += 1
            b.intra = not bit

        # --- tx size ---
        if (b.intra or not b.skip) and h.txfmmode == TX_SWITCHABLE:
            if have_a:
                if have_l:
                    a_t = max_tx if s.above_skip_ctx[col] else \
                        int(s.above_txfm_ctx[col])
                    l_t = max_tx if self.left_skip_ctx[row7] else \
                        int(self.left_txfm_ctx[row7])
                    ctx = int(a_t + l_t > max_tx)
                else:
                    ctx = 1 if s.above_skip_ctx[col] else \
                        int(int(s.above_txfm_ctx[col]) * 2 > max_tx)
            elif have_l:
                ctx = 1 if self.left_skip_ctx[row7] else \
                    int(int(self.left_txfm_ctx[row7]) * 2 > max_tx)
            else:
                ctx = 1
            if max_tx == TX_32X32:
                b.tx = c.get_prob(int(s.probs.tx32p[ctx, 0]))
                if b.tx:
                    b.tx += c.get_prob(int(s.probs.tx32p[ctx, 1]))
                    if b.tx == 2:
                        b.tx += c.get_prob(int(s.probs.tx32p[ctx, 2]))
                cnt.tx32p[ctx, b.tx] += 1
            elif max_tx == TX_16X16:
                b.tx = c.get_prob(int(s.probs.tx16p[ctx, 0]))
                if b.tx:
                    b.tx += c.get_prob(int(s.probs.tx16p[ctx, 1]))
                cnt.tx16p[ctx, b.tx] += 1
            elif max_tx == TX_8X8:
                b.tx = c.get_prob(int(s.probs.tx8p[ctx]))
                cnt.tx8p[ctx, b.tx] += 1
            else:
                b.tx = TX_4X4
        else:
            b.tx = min(max_tx, h.txfmmode)

        # --- modes ---
        if h.keyframe or h.intraonly:
            a = s.above_mode_ctx
            l = self.left_mode_ctx
            a0, a1 = col * 2, col * 2 + 1
            l0, l1 = row7 * 2, row7 * 2 + 1
            b.comp = 0
            if b.bs > BS_8x8:
                b.mode[0] = c.get_tree(
                    T.INTRAMODE_TREE,
                    T.DEFAULT_KF_YMODE_PROBS[int(a[a0])][int(l[l0])])
                a[a0] = b.mode[0]
                if b.bs != BS_8x4:
                    b.mode[1] = c.get_tree(
                        T.INTRAMODE_TREE,
                        T.DEFAULT_KF_YMODE_PROBS[int(a[a1])][b.mode[0]])
                    l[l0] = a[a1] = b.mode[1]
                else:
                    l[l0] = a[a1] = b.mode[1] = b.mode[0]
                if b.bs != BS_4x8:
                    b.mode[2] = c.get_tree(
                        T.INTRAMODE_TREE,
                        T.DEFAULT_KF_YMODE_PROBS[int(a[a0])][int(l[l1])])
                    a[a0] = b.mode[2]
                    if b.bs != BS_8x4:
                        b.mode[3] = c.get_tree(
                            T.INTRAMODE_TREE,
                            T.DEFAULT_KF_YMODE_PROBS[int(a[a1])][b.mode[2]])
                        l[l1] = a[a1] = b.mode[3]
                    else:
                        l[l1] = a[a1] = b.mode[3] = b.mode[2]
                else:
                    b.mode[2] = b.mode[0]
                    l[l1] = a[a1] = b.mode[3] = b.mode[1]
            else:
                b.mode[0] = c.get_tree(
                    T.INTRAMODE_TREE,
                    T.DEFAULT_KF_YMODE_PROBS[int(a[a0])][int(l[l0])])
                b.mode[1] = b.mode[2] = b.mode[3] = b.mode[0]
                a[a0:a0 + int(T.BWH_TAB[0, b.bs, 0])] = b.mode[0]
                l[l0:l0 + int(T.BWH_TAB[0, b.bs, 1])] = b.mode[0]
            b.uvmode = c.get_tree(T.INTRAMODE_TREE,
                                  T.DEFAULT_KF_UVMODE_PROBS[b.mode[3]])
        elif b.intra:
            b.comp = 0
            if b.bs > BS_8x8:
                b.mode[0] = c.get_tree(T.INTRAMODE_TREE, s.probs.y_mode[0])
                cnt.y_mode[0, b.mode[0]] += 1
                if b.bs != BS_8x4:
                    b.mode[1] = c.get_tree(T.INTRAMODE_TREE,
                                           s.probs.y_mode[0])
                    cnt.y_mode[0, b.mode[1]] += 1
                else:
                    b.mode[1] = b.mode[0]
                if b.bs != BS_4x8:
                    b.mode[2] = c.get_tree(T.INTRAMODE_TREE,
                                           s.probs.y_mode[0])
                    cnt.y_mode[0, b.mode[2]] += 1
                    if b.bs != BS_8x4:
                        b.mode[3] = c.get_tree(T.INTRAMODE_TREE,
                                               s.probs.y_mode[0])
                        cnt.y_mode[0, b.mode[3]] += 1
                    else:
                        b.mode[3] = b.mode[2]
                else:
                    b.mode[2] = b.mode[0]
                    b.mode[3] = b.mode[1]
            else:
                sz = SIZE_GROUP[b.bs]
                b.mode[0] = c.get_tree(T.INTRAMODE_TREE, s.probs.y_mode[sz])
                b.mode[1] = b.mode[2] = b.mode[3] = b.mode[0]
                cnt.y_mode[sz, b.mode[3]] += 1
            b.uvmode = c.get_tree(T.INTRAMODE_TREE,
                                  s.probs.uv_mode[b.mode[3]])
            cnt.uv_mode[b.mode[3], b.uvmode] += 1
        else:
            self._decode_mode_inter(have_a, have_l, w4, h4)
            filter_id = self._last_filter_id
            vref = b.ref[h.signbias[h.varcompref[0]] if b.comp else 0]

        # --- context splat (reference: SET_CTXS, vp9block.c:744-767) ---
        nw = int(T.BWH_TAB[1, b.bs, 0])
        nh = int(T.BWH_TAB[1, b.bs, 1])
        s.above_skip_ctx[col:col + nw] = b.skip
        s.above_txfm_ctx[col:col + nw] = b.tx
        s.above_partition_ctx[col:col + nw] = ABOVE_CTX[b.bs]
        self.left_skip_ctx[row7:row7 + nh] = b.skip
        self.left_txfm_ctx[row7:row7 + nh] = b.tx
        self.left_partition_ctx[row7:row7 + nh] = LEFT_CTX[b.bs]
        if not (h.keyframe or h.intraonly):
            # NOTE: mode ctx written at raw col/row7 (1 entry per b8) on
            # inter frames, unlike the keyframe path's 2-per-b8 layout
            # (reference: SET_CTXS, vp9block.c:747-751)
            s.above_intra_ctx[col:col + nw] = b.intra
            s.above_comp_ctx[col:col + nw] = b.comp
            s.above_mode_ctx[col:col + nw] = b.mode[3]
            self.left_intra_ctx[row7:row7 + nh] = b.intra
            self.left_comp_ctx[row7:row7 + nh] = b.comp
            self.left_mode_ctx[row7:row7 + nh] = b.mode[3]
            if not b.intra:
                s.above_ref_ctx[col:col + nw] = vref
                self.left_ref_ctx[row7:row7 + nh] = vref
                if h.filtermode == FILTER_SWITCHABLE:
                    s.above_filter_ctx[col:col + nw] = filter_id
                    self.left_filter_ctx[row7:row7 + nh] = filter_id
            # mv context (reference: vp9block.c:770-800)
            if b.bs > BS_8x8:
                mv0, mv1 = b.mv[3][0], b.mv[3][1]
                self.left_mv_ctx[row7 * 2 + 0, 0] = b.mv[1][0]
                self.left_mv_ctx[row7 * 2 + 0, 1] = b.mv[1][1]
                self.left_mv_ctx[row7 * 2 + 1, 0] = mv0
                self.left_mv_ctx[row7 * 2 + 1, 1] = mv1
                s.above_mv_ctx[col * 2 + 0, 0] = b.mv[2][0]
                s.above_mv_ctx[col * 2 + 0, 1] = b.mv[2][1]
                s.above_mv_ctx[col * 2 + 1, 0] = mv0
                s.above_mv_ctx[col * 2 + 1, 1] = mv1
            else:
                mv0, mv1 = b.mv[3][0], b.mv[3][1]
                for n in range(w4 * 2):
                    s.above_mv_ctx[col * 2 + n, 0] = mv0
                    s.above_mv_ctx[col * 2 + n, 1] = mv1
                for n in range(h4 * 2):
                    self.left_mv_ctx[row7 * 2 + n, 0] = mv0
                    self.left_mv_ctx[row7 * 2 + n, 1] = mv1

        # frame-wide mv/ref grid write-back (reference: vp9block.c:777-801)
        if b.intra:
            s.cur_ref[row:row + h4, col:col + w4] = -1
        elif b.comp:
            s.cur_ref[row:row + h4, col:col + w4, 0] = b.ref[0]
            s.cur_ref[row:row + h4, col:col + w4, 1] = b.ref[1]
            s.cur_mv[row:row + h4, col:col + w4, 0] = b.mv[3][0]
            s.cur_mv[row:row + h4, col:col + w4, 1] = b.mv[3][1]
        else:
            s.cur_ref[row:row + h4, col:col + w4, 0] = b.ref[0]
            s.cur_ref[row:row + h4, col:col + w4, 1] = -1
            s.cur_mv[row:row + h4, col:col + w4, 0] = b.mv[3][0]

    # ------------------------------------------------------------------
    def _decode_mode_inter(self, have_a, have_l, w4, h4):
        """Inter-block mode parse (reference: vp9block.c:331-677)."""
        s = self.s
        b = self.b
        c = self.c
        h = s.header
        cnt = self.counts
        row, col, row7 = self.row, self.col, self.row7
        above_intra = int(s.above_intra_ctx[col])
        left_intra = int(self.left_intra_ctx[row7])
        above_comp = int(s.above_comp_ctx[col])
        left_comp = int(self.left_comp_ctx[row7])
        above_ref = int(s.above_ref_ctx[col])
        left_ref = int(self.left_ref_ctx[row7])
        fix = h.fixcompref
        var1 = h.varcompref[1]

        if h.seg_enabled and h.seg_feat[b.seg_id].ref_enabled:
            b.comp = 0
            b.ref[0] = h.seg_feat[b.seg_id].ref_val - 1
        else:
            if h.comppredmode != PRED_SWITCHABLE:
                b.comp = int(h.comppredmode == PRED_COMPREF)
            else:
                if have_a:
                    if have_l:
                        if above_comp and left_comp:
                            ctx = 4
                        elif above_comp:
                            ctx = 2 + int(left_intra or left_ref == fix)
                        elif left_comp:
                            ctx = 2 + int(above_intra or above_ref == fix)
                        else:
                            ctx = int((not above_intra and above_ref == fix)
                                      ^ (not left_intra and left_ref == fix))
                    else:
                        ctx = 3 if above_comp else \
                            int(not above_intra and above_ref == fix)
                elif have_l:
                    ctx = 3 if left_comp else \
                        int(not left_intra and left_ref == fix)
                else:
                    ctx = 1
                b.comp = c.get_prob(int(s.probs.comp[ctx]))
                cnt.comp[ctx, b.comp] += 1

            if b.comp:
                fix_idx = h.signbias[fix]
                var_idx = int(not fix_idx)
                b.ref[fix_idx] = fix
                if have_a:
                    if have_l:
                        if above_intra:
                            if left_intra:
                                ctx = 2
                            else:
                                ctx = 1 + 2 * int(left_ref != var1)
                        elif left_intra:
                            ctx = 1 + 2 * int(above_ref != var1)
                        else:
                            refl, refa = left_ref, above_ref
                            if refl == refa and refa == var1:
                                ctx = 0
                            elif not left_comp and not above_comp:
                                if (refa == fix and refl == h.varcompref[0]) \
                                   or (refl == fix
                                       and refa == h.varcompref[0]):
                                    ctx = 4
                                else:
                                    ctx = 3 if refa == refl else 1
                            elif not left_comp:
                                if refa == var1 and refl != var1:
                                    ctx = 1
                                else:
                                    ctx = 2 if (refl == var1
                                                and refa != var1) else 4
                            elif not above_comp:
                                if refl == var1 and refa != var1:
                                    ctx = 1
                                else:
                                    ctx = 2 if (refa == var1
                                                and refl != var1) else 4
                            else:
                                ctx = 4 if refl == refa else 2
                    else:
                        if above_intra:
                            ctx = 2
                        elif above_comp:
                            ctx = 4 * int(above_ref != var1)
                        else:
                            ctx = 3 * int(above_ref != var1)
                elif have_l:
                    if left_intra:
                        ctx = 2
                    elif left_comp:
                        ctx = 4 * int(left_ref != var1)
                    else:
                        ctx = 3 * int(left_ref != var1)
                else:
                    ctx = 2
                bit = c.get_prob(int(s.probs.comp_ref[ctx]))
                b.ref[var_idx] = h.varcompref[bit]
                cnt.comp_ref[ctx, bit] += 1
            else:  # single reference
                if have_a and not above_intra:
                    if have_l and not left_intra:
                        if left_comp:
                            if above_comp:
                                ctx = 1 + int(not fix or not left_ref
                                              or not above_ref)
                            else:
                                ctx = (3 * int(not above_ref)) + \
                                    int(not fix or not left_ref)
                        elif above_comp:
                            ctx = (3 * int(not left_ref)) + \
                                int(not fix or not above_ref)
                        else:
                            ctx = 2 * int(not left_ref) + \
                                2 * int(not above_ref)
                    elif above_intra:
                        ctx = 2
                    elif above_comp:
                        ctx = 1 + int(not fix or not above_ref)
                    else:
                        ctx = 4 * int(not above_ref)
                elif have_l and not left_intra:
                    if left_intra:
                        ctx = 2
                    elif left_comp:
                        ctx = 1 + int(not fix or not left_ref)
                    else:
                        ctx = 4 * int(not left_ref)
                else:
                    ctx = 2
                bit = c.get_prob(int(s.probs.single_ref[ctx, 0]))
                cnt.single_ref[ctx, 0, bit] += 1
                if not bit:
                    b.ref[0] = 0
                else:
                    # second single_ref bit (reference: vp9block.c:489-572)
                    if have_a:
                        if have_l:
                            if left_intra:
                                if above_intra:
                                    ctx = 2
                                elif above_comp:
                                    ctx = 1 + 2 * int(fix == 1
                                                      or above_ref == 1)
                                elif not above_ref:
                                    ctx = 3
                                else:
                                    ctx = 4 * int(above_ref == 1)
                            elif above_intra:
                                if left_intra:
                                    ctx = 2
                                elif left_comp:
                                    ctx = 1 + 2 * int(fix == 1
                                                      or left_ref == 1)
                                elif not left_ref:
                                    ctx = 3
                                else:
                                    ctx = 4 * int(left_ref == 1)
                            elif above_comp:
                                if left_comp:
                                    if left_ref == above_ref:
                                        ctx = 3 * int(fix == 1
                                                      or left_ref == 1)
                                    else:
                                        ctx = 2
                                elif not left_ref:
                                    ctx = 1 + 2 * int(fix == 1
                                                      or above_ref == 1)
                                else:
                                    ctx = 3 * int(left_ref == 1) + \
                                        int(fix == 1 or above_ref == 1)
                            elif left_comp:
                                if not above_ref:
                                    ctx = 1 + 2 * int(fix == 1
                                                      or left_ref == 1)
                                else:
                                    ctx = 3 * int(above_ref == 1) + \
                                        int(fix == 1 or left_ref == 1)
                            elif not above_ref:
                                if not left_ref:
                                    ctx = 3
                                else:
                                    ctx = 4 * int(left_ref == 1)
                            elif not left_ref:
                                ctx = 4 * int(above_ref == 1)
                            else:
                                ctx = 2 * int(left_ref == 1) + \
                                    2 * int(above_ref == 1)
                        else:
                            if above_intra or (not above_comp
                                               and not above_ref):
                                ctx = 2
                            elif above_comp:
                                ctx = 3 * int(fix == 1 or above_ref == 1)
                            else:
                                ctx = 4 * int(above_ref == 1)
                    elif have_l:
                        if left_intra or (not left_comp and not left_ref):
                            ctx = 2
                        elif left_comp:
                            ctx = 3 * int(fix == 1 or left_ref == 1)
                        else:
                            ctx = 4 * int(left_ref == 1)
                    else:
                        ctx = 2
                    bit = c.get_prob(int(s.probs.single_ref[ctx, 1]))
                    cnt.single_ref[ctx, 1, bit] += 1
                    b.ref[0] = 1 + bit

        # --- sub-8x8 first mode (before filter) ---
        if b.bs <= BS_8x8:
            if h.seg_enabled and h.seg_feat[b.seg_id].skip_enabled:
                b.mode[0] = b.mode[1] = b.mode[2] = b.mode[3] = ZEROMV
            else:
                off = SUB8X8_OFF[b.bs] if b.bs < 10 else 0
                ctx = int(INTER_MODE_CTX_LUT[
                    int(s.above_mode_ctx[col + off]),
                    int(self.left_mode_ctx[row7 + off])])
                b.mode[0] = c.get_tree(T.INTER_MODE_TREE,
                                       s.probs.mv_mode[ctx])
                b.mode[1] = b.mode[2] = b.mode[3] = b.mode[0]
                cnt.mv_mode[ctx, b.mode[0] - 10] += 1

        # --- interp filter ---
        if h.filtermode == FILTER_SWITCHABLE:
            if have_a and int(s.above_mode_ctx[col]) >= NEARESTMV:
                if have_l and int(self.left_mode_ctx[row7]) >= NEARESTMV:
                    af = int(s.above_filter_ctx[col])
                    lf_ = int(self.left_filter_ctx[row7])
                    ctx = lf_ if af == lf_ else 3
                else:
                    ctx = int(s.above_filter_ctx[col])
            elif have_l and int(self.left_mode_ctx[row7]) >= NEARESTMV:
                ctx = int(self.left_filter_ctx[row7])
            else:
                ctx = 3
            filter_id = c.get_tree(T.FILTER_TREE, s.probs.filter[ctx])
            cnt.filter[ctx, filter_id] += 1
            b.filter = int(T.FILTER_LUT[filter_id])
        else:
            b.filter = h.filtermode
            filter_id = 0
        self._last_filter_id = filter_id

        # --- modes + MVs ---
        if b.bs > BS_8x8:
            ctx = int(INTER_MODE_CTX_LUT[int(s.above_mode_ctx[col]),
                                         int(self.left_mode_ctx[row7])])
            b.mode[0] = c.get_tree(T.INTER_MODE_TREE,
                                   s.probs.mv_mode[ctx])
            cnt.mv_mode[ctx, b.mode[0] - 10] += 1
            mvs.fill_mv(self, b.mv[0], b.mode[0], 0)
            if b.bs != BS_8x4:
                b.mode[1] = c.get_tree(T.INTER_MODE_TREE,
                                       s.probs.mv_mode[ctx])
                cnt.mv_mode[ctx, b.mode[1] - 10] += 1
                mvs.fill_mv(self, b.mv[1], b.mode[1], 1)
            else:
                b.mode[1] = b.mode[0]
                b.mv[1][0] = b.mv[0][0]
                b.mv[1][1] = b.mv[0][1]
            if b.bs != BS_4x8:
                b.mode[2] = c.get_tree(T.INTER_MODE_TREE,
                                       s.probs.mv_mode[ctx])
                cnt.mv_mode[ctx, b.mode[2] - 10] += 1
                mvs.fill_mv(self, b.mv[2], b.mode[2], 2)
                if b.bs != BS_8x4:
                    b.mode[3] = c.get_tree(
                        T.INTER_MODE_TREE, s.probs.mv_mode[ctx])
                    cnt.mv_mode[ctx, b.mode[3] - 10] += 1
                    mvs.fill_mv(self, b.mv[3], b.mode[3], 3)
                else:
                    b.mode[3] = b.mode[2]
                    b.mv[3][0] = b.mv[2][0]
                    b.mv[3][1] = b.mv[2][1]
            else:
                b.mode[2] = b.mode[0]
                b.mv[2][0] = b.mv[0][0]
                b.mv[2][1] = b.mv[0][1]
                b.mode[3] = b.mode[1]
                b.mv[3][0] = b.mv[1][0]
                b.mv[3][1] = b.mv[1][1]
        else:
            mvs.fill_mv(self, b.mv[0], b.mode[0], -1)
            for i in (1, 2, 3):
                b.mv[i][0] = b.mv[0][0]
                b.mv[i][1] = b.mv[0][1]

    # ------------------------------------------------------------------
    def decode_coeffs_block(self, plane_coef, py, px, tx, is32, probs11, nnz,
                            scan, nb, band_counts, qmul, cnt, eobcnt):
        """One tx block's coefficient loop.

        reference: decode_coeffs_b_generic (vp9block.c:805-923).
        Writes dequantized coefficients into plane_coef at (py, px) in
        scan-order raster; returns eob count.
        """
        c = self.c
        sz = 4 << tx if tx < 4 else 4
        n_coeffs = sz * sz
        cache = np.zeros(1024, np.uint8)
        i = 0
        band = 0
        band_left = band_counts[band]
        tp = probs11[0][nnz]
        bpp = self.s.header.bpp
        is8 = bpp == 8
        vals = {}
        while True:
            val = c.get_prob(int(tp[0]))  # eob
            eobcnt[band, nnz, val] += 1
            if not val:
                break
            while True:  # skip_eob loop
                if not c.get_prob(int(tp[1])):  # zero
                    cnt[band, nnz, 0] += 1
                    band_left -= 1
                    if not band_left:
                        band += 1
                        band_left = band_counts[band]
                    cache[scan[i]] = 0
                    nnz = (1 + cache[nb[i][0]] + cache[nb[i][1]]) >> 1
                    tp = probs11[min(band, 5)][nnz]
                    i += 1
                    if i == n_coeffs:
                        break
                    continue
                break
            if i == n_coeffs:
                break
            rc = int(scan[i])
            if not c.get_prob(int(tp[2])):  # one
                cnt[band, nnz, 1] += 1
                val = 1
                cache[rc] = 1
            else:
                cnt[band, nnz, 2] += 1
                if not c.get_prob(int(tp[3])):  # 2,3,4
                    if not c.get_prob(int(tp[4])):
                        cache[rc] = val = 2
                    else:
                        val = 3 + c.get_prob(int(tp[5]))
                        cache[rc] = 3
                elif not c.get_prob(int(tp[6])):  # cat1/2
                    cache[rc] = 4
                    if not c.get_prob(int(tp[7])):
                        val = c.get_prob(159) + 5
                    else:
                        val = (c.get_prob(165) << 1) + 7
                        val += c.get_prob(145)
                else:  # cat 3-6
                    cache[rc] = 5
                    if not c.get_prob(int(tp[8])):
                        if not c.get_prob(int(tp[9])):
                            val = 11 + (c.get_prob(173) << 2)
                            val += (c.get_prob(148) << 1)
                            val += c.get_prob(140)
                        else:
                            val = 19 + (c.get_prob(176) << 3)
                            val += (c.get_prob(155) << 2)
                            val += (c.get_prob(140) << 1)
                            val += c.get_prob(135)
                    elif not c.get_prob(int(tp[10])):
                        val = (c.get_prob(180) << 4) + 35
                        val += (c.get_prob(157) << 3)
                        val += (c.get_prob(141) << 2)
                        val += (c.get_prob(134) << 1)
                        val += c.get_prob(130)
                    else:
                        val = 67
                        if not is8:
                            if bpp == 12:
                                val += c.get_prob(255) << 17
                                val += c.get_prob(255) << 16
                            val += c.get_prob(255) << 15
                            val += c.get_prob(255) << 14
                        val += c.get_prob(254) << 13
                        val += c.get_prob(254) << 12
                        val += c.get_prob(254) << 11
                        val += c.get_prob(252) << 10
                        val += c.get_prob(249) << 9
                        val += c.get_prob(243) << 8
                        val += c.get_prob(230) << 7
                        val += c.get_prob(196) << 6
                        val += c.get_prob(177) << 5
                        val += c.get_prob(153) << 4
                        val += c.get_prob(140) << 3
                        val += c.get_prob(133) << 2
                        val += c.get_prob(130) << 1
                        val += c.get_prob(129)
            band_left -= 1
            if not band_left:
                band += 1
                band_left = band_counts[band]
            q = int(qmul[1]) if i else int(qmul[0])
            signed_val = -val if c.get() else val
            # C semantics: signed * (unsigned)q wraps mod 2^32, result cast
            # back to int (reference: STORE_COEF, vp9block.c:905-917)
            prod = (signed_val * q) & 0xFFFFFFFF
            if prod >= 0x80000000:
                prod -= 0x100000000
            if is32:
                # 32x32 coeffs are pre-divided by 2, truncating toward zero
                coefv = -((-prod) // 2) if prod < 0 else prod // 2
            else:
                coefv = prod
            if is8:
                # 8bpp stores coefficients in int16 (wraps on overflow)
                coefv = ((coefv + 0x8000) & 0xFFFF) - 0x8000
            vals[rc] = coefv
            i += 1
            if i >= n_coeffs:
                break
            nnz = (1 + cache[nb[i - 1][0]] + cache[nb[i - 1][1]]) >> 1
            tp = probs11[band][nnz]
        if i and vals:
            for rc, v in vals.items():
                plane_coef[py + rc // sz, px + rc % sz] = v
        return i

    # ------------------------------------------------------------------
    def decode_coeffs(self) -> int:
        """reference: decode_coeffs (vp9block.c:965-1130). Returns
        total_coeff flag."""
        s = self.s
        b = self.b
        c = self.c
        h = s.header
        row, col, row7 = self.row, self.col, self.row7
        w4 = int(T.BWH_TAB[1, b.bs, 0]) << 1
        h4 = int(T.BWH_TAB[1, b.bs, 1]) << 1
        end_x = min(2 * (s.cols - col), w4)
        end_y = min(2 * (s.rows - row), h4)
        qmul = h.seg_feat[b.seg_id].qmul
        tx = 4 * h.lossless + b.tx
        yscans = T.SCANS[tx]
        ynbs = T.SCANS_NB[tx]
        uvscan = T.SCANS[b.uvtx][0]
        uvnb = T.SCANS_NB[b.uvtx][0]
        p = s.coef11[b.tx][0][0 if b.intra else 1]
        cnt = self.counts.coef[b.tx][0][0 if b.intra else 1]
        eobcnt = self.counts.eob[b.tx][0][0 if b.intra else 1]
        y_band_counts = BAND_COUNTS[b.tx]
        uv_band_counts = BAND_COUNTS[b.uvtx]
        a_n = s.above_y_nnz_ctx
        l_n = self.left_y_nnz_ctx
        a0 = col * 2
        l0 = row7 * 2
        total_coeff = 0
        step = 1 << b.tx

        # MERGE context for tx > 4x4 (reference: MERGE_CTX)
        if step > 1:
            for n in range(0, end_y, step):
                l_n[l0 + n] = int(l_n[l0 + n:l0 + n + step].any())
            for n in range(0, end_x, step):
                a_n[a0 + n] = int(a_n[a0 + n:a0 + n + step].any())

        is32 = b.tx == TX_32X32
        n = 0
        for y in range(0, end_y, step):
            for x in range(0, end_x, step):
                mode_idx = n if (b.bs > BS_8x8 and b.tx == TX_4X4) else 0
                txtp = int(T.INTRA_TXFM_TYPE[b.mode[mode_idx]])
                nnz = int(a_n[a0 + x]) + int(l_n[l0 + y])
                py = row * 8 + y * 4
                px = col * 8 + x * 4
                ret = self.decode_coeffs_block(
                    s.coef_y, py, px, b.tx, is32, p, nnz, yscans[txtp],
                    ynbs[txtp], y_band_counts, qmul[0], cnt, eobcnt)
                a_n[a0 + x] = l_n[l0 + y] = 1 if ret else 0
                total_coeff |= 1 if ret else 0
                s.eob_y[row * 2 + y, col * 2 + x] = ret
                n += step * step
        # SPLAT context
        if step > 1:
            self._splat_nnz(a_n, a0, end_x, step, end_x == w4)
            self._splat_nnz(l_n, l0, end_y, step, end_y == h4)

        # UV
        p = s.coef11[b.uvtx][1][0 if b.intra else 1]
        cnt = self.counts.coef[b.uvtx][1][0 if b.intra else 1]
        eobcnt = self.counts.eob[b.uvtx][1][0 if b.intra else 1]
        w4 >>= s.ss_h
        end_x >>= s.ss_h
        h4 >>= s.ss_v
        end_y >>= s.ss_v
        ustep = 1 << b.uvtx
        is32 = b.uvtx == TX_32X32
        for pl in range(2):
            a_n = s.above_uv_nnz_ctx[pl]
            l_n = self.left_uv_nnz_ctx[pl]
            a0 = col << (1 - s.ss_h)
            l0 = row7 << (1 - s.ss_v)
            coefp = s.coef_u if pl == 0 else s.coef_v
            eobp = s.eob_u if pl == 0 else s.eob_v
            if ustep > 1:
                for nn in range(0, end_y, ustep):
                    l_n[l0 + nn] = int(l_n[l0 + nn:l0 + nn + ustep].any())
                for nn in range(0, end_x, ustep):
                    a_n[a0 + nn] = int(a_n[a0 + nn:a0 + nn + ustep].any())
            for y in range(0, end_y, ustep):
                for x in range(0, end_x, ustep):
                    nnz = int(a_n[a0 + x]) + int(l_n[l0 + y])
                    py = ((row * 8) >> s.ss_v) + y * 4
                    px = ((col * 8) >> s.ss_h) + x * 4
                    ret = self.decode_coeffs_block(
                        coefp, py, px, b.uvtx, is32, p, nnz, uvscan, uvnb,
                        uv_band_counts, qmul[1], cnt, eobcnt)
                    a_n[a0 + x] = l_n[l0 + y] = 1 if ret else 0
                    total_coeff |= 1 if ret else 0
                    eobp[(row * 2 >> s.ss_v) + y, (col * 2 >> s.ss_h) + x] \
                        = ret
            if ustep > 1:
                self._splat_nnz(a_n, a0, end_x, ustep, end_x == w4)
                self._splat_nnz(l_n, l0, end_y, ustep, end_y == h4)
        return total_coeff

    @staticmethod
    def _splat_nnz(arr, base, end, step, full):
        """reference: SPLAT macro (vp9block.c:1023-1051): propagate the
        root cell's nnz across the covered cells; when the block is clipped
        (not `full`), the splat still fills min(end - n - 1, step - 1)."""
        for n in range(0, end, step):
            v = arr[base + n]
            if full:
                arr[base + n:base + n + step] = v
            else:
                fill = min(end - n - 1, step - 1)
                arr[base + n + 1:base + n + 1 + fill] = v


def mask_edges(mask, ss_h, ss_v, row_and_7, col_and_7, w, h, col_end, row_end,
               tx, skip_inter):
    """Build loop-filter edge bitmasks for one block into mask[2][8][4].

    reference: mask_edges (vp9block.c:1142-1262), including the libvpx
    odd-edge bugs at subsampled edges.
    """
    wide_filter_col_mask = (0x11, 0x01)
    wide_filter_row_mask = (0x03, 0x07)

    if tx == TX_4X4 and (ss_v | ss_h):
        if h == ss_v:
            if row_and_7 & 1:
                return
            if not row_end:
                h += 1
        if w == ss_h:
            if col_and_7 & 1:
                return
            if not col_end:
                w += 1

    if tx == TX_4X4 and not skip_inter:
        t = 1 << col_and_7
        m_col = (t << w) - t
        m_row_8 = m_col & wide_filter_col_mask[ss_h]
        m_row_4 = m_col - m_row_8
        for y in range(row_and_7, h + row_and_7):
            col_mask_id = 2 - (1 if not (y & wide_filter_row_mask[ss_v])
                               else 0)
            mask[0][y][1] |= m_row_8
            mask[0][y][2] |= m_row_4
            if (ss_h & ss_v) and (col_end & 1) and (y & 1):
                mask[1][y][col_mask_id] |= (t << (w - 1)) - t
            else:
                mask[1][y][col_mask_id] |= m_col
            if not ss_h:
                mask[0][y][3] |= m_col
            if not ss_v:
                if ss_h and (col_end & 1):
                    mask[1][y][3] |= (t << (w - 1)) - t
                else:
                    mask[1][y][3] |= m_col
    else:
        t = 1 << col_and_7
        m_col = (t << w) - t
        if not skip_inter:
            mask_id = 1 if tx == TX_8X8 else 0
            masks = (0xFF, 0x55, 0x11, 0x01)
            l2 = tx + ss_h - 1
            m_row = m_col & masks[l2]
            if ss_h and tx > TX_8X8 and (w ^ (w - 1)) == 1:
                m_row_16 = ((t << (w - 1)) - t) & masks[l2]
                m_row_8 = m_row - m_row_16
                for y in range(row_and_7, h + row_and_7):
                    mask[0][y][0] |= m_row_16
                    mask[0][y][1] |= m_row_8
            else:
                for y in range(row_and_7, h + row_and_7):
                    mask[0][y][mask_id] |= m_row
            l2 = tx + ss_v - 1
            step1d = 1 << l2
            if ss_v and tx > TX_8X8 and (h ^ (h - 1)) == 1:
                y = row_and_7
                while y < h + row_and_7 - 1:
                    mask[1][y][0] |= m_col
                    y += step1d
                if y - row_and_7 == h - 1:
                    mask[1][y][1] |= m_col
            else:
                for y in range(row_and_7, h + row_and_7, step1d):
                    mask[1][y][mask_id] |= m_col
        elif tx != TX_4X4:
            mask_id = int((tx == TX_8X8) or (h == ss_v))
            mask[1][row_and_7][mask_id] |= m_col
            mask_id = int((tx == TX_8X8) or (w == ss_h))
            for y in range(row_and_7, h + row_and_7):
                mask[0][y][mask_id] |= t
        else:
            t8 = t & wide_filter_col_mask[ss_h]
            t4 = t - t8
            for y in range(row_and_7, h + row_and_7):
                mask[0][y][2] |= t4
                mask[0][y][1] |= t8
            mask[1][row_and_7][
                2 - (1 if not (row_and_7 & wide_filter_row_mask[ss_v])
                     else 0)] |= m_col
