"""Golden (numpy) pass-B reconstruction: bit-exact intra/inter recon and
loop filter over the pass-A frame tensors. This is the readable oracle the
TPU path is verified against, and the fallback backend.

Behavioral reference: intra_recon / check_intra_mode
(libavcodec/vp9recon.c:37-374), inter recon (vp9recon.c:376-774 +
vp9_mc_template.c), loop filter orchestration (vp9lpf.c:183-230). The
reference's emulated-edge machinery is unnecessary here: planes are
allocated padded to superblock alignment, and all reads stay within the
regions the reference also reads (n_px_have clipping).
"""
from __future__ import annotations

import numpy as np

from . import tables as T
from .blockdec import BS_8x8
from ...ops import itxfm
from ...ops import lpf
from ...ops.intra import intra_pred

TX_4X4 = 0

# mode -> remapped mode per (have_left, have_top)
# (reference: mode_conv, vp9recon.c:49-70)
DC_127, DC_128, DC_129, LEFT_DC, TOP_DC = 13, 12, 14, 10, 11
MODE_CONV = {
    0: ((DC_127, 0), (DC_127, 0)),            # VERT
    1: ((DC_129, DC_129), (1, 1)),            # HOR
    2: ((DC_128, TOP_DC), (LEFT_DC, 2)),      # DC
    3: ((DC_127, 3), (DC_127, 3)),            # DDL
    4: ((4, 4), (4, 4)),                      # DDR
    5: ((5, 5), (5, 5)),                      # VR
    6: ((6, 6), (6, 6)),                      # HD
    7: ((DC_127, 7), (DC_127, 7)),            # VL
    8: ((DC_129, DC_129), (8, 8)),            # HU
    9: ((DC_129, 0), (1, 9)),                 # TM
}
# needs_left, needs_top, needs_topleft, needs_topright, invert_left
EDGES = {
    0: (0, 1, 0, 0, 0), 1: (1, 0, 0, 0, 0), 2: (1, 1, 0, 0, 0),
    3: (0, 1, 0, 1, 0), 4: (1, 1, 1, 0, 0), 5: (1, 1, 1, 0, 0),
    6: (1, 1, 1, 0, 0), 7: (0, 1, 0, 1, 0), 8: (1, 0, 0, 0, 1),
    9: (1, 1, 1, 0, 0), 10: (1, 0, 0, 0, 0), 11: (0, 1, 0, 0, 0),
    12: (0, 0, 0, 0, 0), 13: (0, 0, 0, 0, 0), 14: (0, 0, 0, 0, 0),
}


def _build_edges(plane, py, px, sz, tx, mode, have_top, have_left,
                 have_right, n_have_top, n_have_left, bpp):
    """Assemble the `l` (left, bottom-up unless inverted) and `a` (topbuf
    with topleft at [0]) arrays per check_intra_mode semantics."""
    needs_left, needs_top, needs_tl, needs_tr, invert = EDGES[mode]
    base = 128 << (bpp - 8)
    a = np.zeros(2 * sz + 1, np.int32)
    l = np.zeros(sz, np.int32)
    n_need = sz
    if needs_top:
        if have_top:
            npx = min(n_need, n_have_top)
            a[1:1 + npx] = plane[py - 1, px:px + npx]
            if npx < n_need:
                a[1 + npx:1 + n_need] = a[npx]
        else:
            a[1:1 + n_need] = base - 1
        if needs_tl:
            if have_left and have_top:
                a[0] = plane[py - 1, px - 1]
            else:
                a[0] = base + (1 if have_top else -1)
        if tx == TX_4X4 and needs_tr:
            if have_top and have_right and n_need + 4 <= n_have_top:
                a[5:9] = plane[py - 1, px + 4:px + 8]
            else:
                a[5:9] = a[4]
    if needs_left:
        if have_left:
            npx = min(n_need, n_have_left)
            colpx = plane[py:py + npx, px - 1]
            if invert:
                l[:npx] = colpx
                if npx < n_need:
                    l[npx:] = l[npx - 1]
            else:
                l[n_need - npx:] = colpx[::-1]
                if npx < n_need:
                    l[:n_need - npx] = l[n_need - npx]
        else:
            l[:] = base + 1
    return l, a


def _intra_recon_block(s, row, col, tcs, b):
    """reference: intra_recon (vp9recon.c:235-374)."""
    h = s.header
    bpp = h.bpp
    maxp = (1 << bpp) - 1
    w4 = int(T.BWH_TAB[1, b.bs, 0]) << 1
    h4 = int(T.BWH_TAB[1, b.bs, 1]) << 1
    end_x = min(2 * (s.cols - col), w4)
    end_y = min(2 * (s.rows - row), h4)
    tx = b.tx
    step1d = 1 << tx
    plane = s.cur_frame_obj.planes[0]
    lossless = h.lossless

    for y in range(0, end_y, step1d):
        for x in range(0, end_x, step1d):
            mode = b.mode[y * 2 + x if (b.bs > BS_8x8 and tx == TX_4X4)
                          else 0]
            txtp = int(T.INTRA_TXFM_TYPE[mode])
            py = row * 8 + y * 4
            px = col * 8 + x * 4
            sz = 4 << tx
            have_top = row > 0 or y > 0
            have_left = col > tcs or x > 0
            have_right = x < w4 - 1
            n_have_top = ((s.cols - col) * 2 - x) * 4
            n_have_left = ((s.rows - row) * 2 - y) * 4
            m = MODE_CONV[mode][1 if have_left else 0][1 if have_top else 0]
            l, a = _build_edges(plane, py, px, sz, tx, m, have_top,
                                have_left, have_right, n_have_top,
                                n_have_left, bpp)
            pred = intra_pred(m, sz, l, a, bpp)
            eob = 0 if b.skip else int(s.eob_y[row * 2 + y, col * 2 + x])
            if eob:
                pred = _add_residual(s.coef_y, py, px, sz, tx, txtp, eob,
                                     pred, bpp, lossless)
            plane[py:py + sz, px:px + sz] = np.clip(pred, 0, maxp)

    # UV
    uvtx = b.uvtx
    sz = 4 << uvtx
    ustep = 1 << uvtx
    w4uv = w4 >> h.ss_h
    end_x >>= h.ss_h
    end_y >>= h.ss_v
    for p in (1, 2):
        plane = s.cur_frame_obj.planes[p]
        eobp = s.eob_u if p == 1 else s.eob_v
        coefp = s.coef_u if p == 1 else s.coef_v
        for y in range(0, end_y, ustep):
            for x in range(0, end_x, ustep):
                mode = b.uvmode
                py = ((row * 8) >> h.ss_v) + y * 4
                px = ((col * 8) >> h.ss_h) + x * 4
                have_top = row > 0 or y > 0
                have_left = col > tcs or x > 0
                have_right = x < w4uv - 1
                n_have_top = (((s.cols - col) << (0 if h.ss_h else 1))
                              - x) * 4
                n_have_left = (((s.rows - row) << (0 if h.ss_v else 1))
                               - y) * 4
                m = MODE_CONV[mode][1 if have_left else 0][
                    1 if have_top else 0]
                l, a = _build_edges(plane, py, px, sz, uvtx, m, have_top,
                                    have_left, have_right, n_have_top,
                                    n_have_left, bpp)
                pred = intra_pred(m, sz, l, a, bpp)
                eob = 0 if b.skip else int(
                    eobp[(row * 2 >> h.ss_v) + y, (col * 2 >> h.ss_h) + x])
                if eob:
                    pred = _add_residual(coefp, py, px, sz, uvtx, 0, eob,
                                         pred, bpp, lossless)
                plane[py:py + sz, px:px + sz] = np.clip(pred, 0, maxp)


def _add_residual(coefp, py, px, sz, tx, txtp, eob, pred, bpp, lossless):
    """Inverse transform the block at (py, px) and add to pred. Mirrors
    itxfm_add semantics including the eob==1 dc-only fast path."""
    dt = np.int32 if bpp == 8 else np.int64
    blk = coefp[py:py + sz, px:px + sz].astype(dt)
    # dc-only fast path exists for all idct_idct entries, which includes
    # every 32x32 type (reference: vp9dsp_template.c init_idct)
    if not lossless and (txtp == 0 or tx == 3) and eob == 1:
        res = itxfm.dc_only_residual(dt(blk[0, 0]), tx)
        return pred + int(res)
    if lossless:
        r = itxfm.itxfm_2d(np, blk, 4, 0, bpp)
        return pred + itxfm.round_residual(r, 4)
    r = itxfm.itxfm_2d(np, blk, tx, txtp, bpp)
    return pred + itxfm.round_residual(r, tx)


def recon_frame(s):
    """Reconstruct all blocks (decode order). Intra only for now; inter
    blocks handled by inter_recon (added with MC support)."""
    for row, col, tcs, b in s.blocks:
        if b.intra:
            _intra_recon_block(s, row, col, tcs, b)
        else:
            from . import inter as inter_mod
            inter_mod.inter_recon_block(s, row, col, b)


def loopfilter_frame(s):
    """Full-frame deferred loop filter, superblock raster order
    (reference: the per-sbrow loop at vp9.c:1419-1429)."""
    h = s.header
    if not h.filter_level:
        return
    if getattr(s, "use_native", False):
        from ...passa_native import loopfilter_frame_native
        if loopfilter_frame_native(s):
            return
    planes = s.cur_frame_obj.planes
    for sbr in range(s.sb_rows):
        for sbc in range(s.sb_cols):
            lpf.loopfilter_sb(planes, s.lf_level[sbr, sbc],
                              s.lf_mask[sbr, sbc], sbr * 8, sbc * 8,
                              h.ss_h, h.ss_v, s.lim_lut, s.mblim_lut,
                              h.bpp)
