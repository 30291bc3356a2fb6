"""Inter-block reconstruction: sub-pel MC dispatch per block size
(incl. sub-8x8 per-quadrant MVs and chroma MV averaging with the libvpx
4:2:2 bug), compound prediction, and the residual add.

Behavioral reference: inter_pred (vp9_mc_template.c:30-464), inter_recon
(vp9recon.c:655-774). Scaled-reference MC: mc_luma/chroma_scaled
(vp9recon.c:492-628).
"""
from __future__ import annotations

import numpy as np

from . import tables as T
from .blockdec import BS_8x4, BS_4x8, BS_8x8
from .golden import _add_residual
from ...ops import mc

# log2(block width / 4) -> mc size index [0]=64..[4]=4
BWLOG_TAB = [
    [0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4],
    [1, 1, 2, 2, 2, 3, 3, 3, 4, 4, 4, 4, 4],
]


def _rdiv2(a, b):
    """ROUNDED_DIV(a + b, 2) with C semantics (round half away from 0)."""
    s = a + b
    return (s + 1) // 2 if s >= 0 else -((-s + 1) // 2)


def _avg_mv2(m1, m2):
    return (_rdiv2(m1[0], m2[0]), _rdiv2(m1[1], m2[1]))


def _avg_mv4(m1, m2, m3, m4):
    def rd4(s):
        return (s + 2) // 4 if s >= 0 else -((-s + 2) // 4)
    return (rd4(m1[0] + m2[0] + m3[0] + m4[0]),
            rd4(m1[1] + m2[1] + m3[1] + m4[1]))


def inter_recon_block(s, row, col, b):
    h = s.header
    bpp = h.bpp
    ss_h, ss_v = h.ss_h, h.ss_v
    scale0 = s.mvscale[b.ref[0]]
    if scale0[0] == -1 or (b.comp and s.mvscale[b.ref[1]][0] == -1):
        raise ValueError("reference frame has invalid dimensions")
    scaled = bool(scale0[0]) or (b.comp and bool(s.mvscale[b.ref[1]][0]))

    fr1 = s.refs[h.refidx[b.ref[0]]]
    fr2 = s.refs[h.refidx[b.ref[1]]] if b.comp else None
    cur = s.cur_frame_obj
    py_y = row * 8
    px_y = col * 8
    py_uv = py_y >> ss_v
    px_uv = px_y >> ss_h

    if scaled:
        _inter_recon_scaled_block(s, row, col, b, fr1, fr2)
        _inter_residual(s, row, col, b)
        return

    def luma(dy, dx, refy, refx, mv, bw, bh, fr, avg):
        w1, h1 = fr.size
        mc.mc_unscaled(cur.planes[0], py_y + dy, px_y + dx,
                       fr.planes[0], refy, refx, bw, bh,
                       mv[0] * 2, mv[1] * 2, w1, h1, b.filter, avg, bpp)

    def chroma(dy, dx, refy, refx, mv, bw, bh, fr, avg):
        w1, h1 = fr.size
        w1 = (w1 + ss_h) >> ss_h
        h1 = (h1 + ss_v) >> ss_v
        for p in (1, 2):
            mc.mc_unscaled(cur.planes[p], py_uv + dy, px_uv + dx,
                           fr.planes[p], refy, refx, bw, bh,
                           mv[0] * (1 << (1 - ss_h)),
                           mv[1] * (1 << (1 - ss_v)),
                           w1, h1, b.filter, avg, bpp)

    if b.bs > BS_8x8:  # sub-8x8: per-quadrant MVs
        for ri in range(2 if b.comp else 1):
            fr = fr1 if ri == 0 else fr2
            if b.bs == BS_8x4:
                luma(0, 0, py_y, px_y, b.mv[0][ri], 8, 4, fr, ri)
                luma(4, 0, py_y + 4, px_y, b.mv[2][ri], 8, 4, fr, ri)
                if ss_v:
                    uvmv = _avg_mv2(b.mv[0][ri], b.mv[2][ri])
                    chroma(0, 0, py_uv, px_uv, uvmv, 8 >> ss_h, 4, fr, ri)
                else:
                    chroma(0, 0, py_uv, px_uv, b.mv[0][ri], 8 >> ss_h, 4,
                           fr, ri)
                    # BUG (kept): libvpx uses the wrong sub-block MV for the
                    # bottom 4:2:2 half (vp9_mc_template.c:107-114)
                    uvmv = b.mv[2][ri] if ss_h == 0 else \
                        _avg_mv2(b.mv[0][ri], b.mv[2][ri])
                    chroma(4, 0, py_uv + 4, px_uv, uvmv, 8 >> ss_h, 4,
                           fr, ri)
            elif b.bs == BS_4x8:
                luma(0, 0, py_y, px_y, b.mv[0][ri], 4, 8, fr, ri)
                luma(0, 4, py_y, px_y + 4, b.mv[1][ri], 4, 8, fr, ri)
                if ss_h:
                    uvmv = _avg_mv2(b.mv[0][ri], b.mv[1][ri])
                    chroma(0, 0, py_uv, px_uv, uvmv, 4, 8 >> ss_v, fr, ri)
                else:
                    chroma(0, 0, py_uv, px_uv, b.mv[0][ri], 4, 8 >> ss_v,
                           fr, ri)
                    chroma(0, 4, py_uv, px_uv + 4, b.mv[1][ri], 4,
                           8 >> ss_v, fr, ri)
            else:  # BS_4x4
                luma(0, 0, py_y, px_y, b.mv[0][ri], 4, 4, fr, ri)
                luma(0, 4, py_y, px_y + 4, b.mv[1][ri], 4, 4, fr, ri)
                luma(4, 0, py_y + 4, px_y, b.mv[2][ri], 4, 4, fr, ri)
                luma(4, 4, py_y + 4, px_y + 4, b.mv[3][ri], 4, 4, fr, ri)
                if ss_v:
                    if ss_h:
                        uvmv = _avg_mv4(b.mv[0][ri], b.mv[1][ri],
                                        b.mv[2][ri], b.mv[3][ri])
                        chroma(0, 0, py_uv, px_uv, uvmv, 4, 4, fr, ri)
                    else:
                        uvmv = _avg_mv2(b.mv[0][ri], b.mv[2][ri])
                        chroma(0, 0, py_uv, px_uv, uvmv, 4, 4, fr, ri)
                        uvmv = _avg_mv2(b.mv[1][ri], b.mv[3][ri])
                        chroma(0, 4, py_uv, px_uv + 4, uvmv, 4, 4, fr, ri)
                else:
                    if ss_h:
                        uvmv = _avg_mv2(b.mv[0][ri], b.mv[1][ri])
                        chroma(0, 0, py_uv, px_uv, uvmv, 4, 4, fr, ri)
                        # BUG (kept): wrong block index for 4:2:2 bottom
                        uvmv = _avg_mv2(b.mv[1][ri], b.mv[2][ri])
                        chroma(4, 0, py_uv + 4, px_uv, uvmv, 4, 4, fr, ri)
                    else:
                        chroma(0, 0, py_uv, px_uv, b.mv[0][ri], 4, 4,
                               fr, ri)
                        chroma(0, 4, py_uv, px_uv + 4, b.mv[1][ri], 4, 4,
                               fr, ri)
                        chroma(4, 0, py_uv + 4, px_uv, b.mv[2][ri], 4, 4,
                               fr, ri)
                        chroma(4, 4, py_uv + 4, px_uv + 4, b.mv[3][ri],
                               4, 4, fr, ri)
    else:
        bw = int(T.BWH_TAB[0, b.bs, 0]) * 4
        bh = int(T.BWH_TAB[0, b.bs, 1]) * 4
        uvbw = int(T.BWH_TAB[ss_h, b.bs, 0]) * 4
        uvbh = int(T.BWH_TAB[ss_v, b.bs, 1]) * 4
        for ri in range(2 if b.comp else 1):
            fr = fr1 if ri == 0 else fr2
            luma(0, 0, py_y, px_y, b.mv[0][ri], bw, bh, fr, ri)
            chroma(0, 0, py_uv, px_uv, b.mv[0][ri], uvbw, uvbh, fr, ri)

    _inter_residual(s, row, col, b)


def _inter_residual(s, row, col, b):
    """residual add (reference: vp9recon.c:707-763)."""
    h = s.header
    bpp = h.bpp
    ss_h, ss_v = h.ss_h, h.ss_v
    cur = s.cur_frame_obj
    if not b.skip:
        maxp = (1 << bpp) - 1
        w4 = int(T.BWH_TAB[1, b.bs, 0]) << 1
        h4 = int(T.BWH_TAB[1, b.bs, 1]) << 1
        end_x = min(2 * (s.cols - col), w4)
        end_y = min(2 * (s.rows - row), h4)
        tx = b.tx
        step1d = 1 << tx
        plane = cur.planes[0]
        for y in range(0, end_y, step1d):
            for x in range(0, end_x, step1d):
                eob = int(s.eob_y[row * 2 + y, col * 2 + x])
                if eob:
                    sz = 4 << tx
                    py = row * 8 + y * 4
                    px = col * 8 + x * 4
                    pred = plane[py:py + sz, px:px + sz]
                    res = _add_residual(s.coef_y, py, px, sz, tx, 0, eob,
                                        pred, bpp, h.lossless)
                    plane[py:py + sz, px:px + sz] = np.clip(res, 0, maxp)
        uvtx = b.uvtx
        ustep = 1 << uvtx
        end_x >>= ss_h
        end_y >>= ss_v
        for p in (1, 2):
            plane = cur.planes[p]
            eobp = s.eob_u if p == 1 else s.eob_v
            coefp = s.coef_u if p == 1 else s.coef_v
            for y in range(0, end_y, ustep):
                for x in range(0, end_x, ustep):
                    eob = int(eobp[(row * 2 >> ss_v) + y,
                                   (col * 2 >> ss_h) + x])
                    if eob:
                        sz = 4 << uvtx
                        py = ((row * 8) >> ss_v) + y * 4
                        px = ((col * 8) >> ss_h) + x * 4
                        pred = plane[py:py + sz, px:px + sz]
                        res = _add_residual(coefp, py, px, sz, uvtx, 0,
                                            eob, pred, bpp, h.lossless)
                        plane[py:py + sz, px:px + sz] = np.clip(res, 0,
                                                                maxp)


def _scaled_axis(mv, a0, scale, ss, b0, span, n8):
    """One axis of the scaled-MC start position: MV clamp against the
    parent block (b0 = block corner, span = block span in this plane's
    px, n8 = frame b8 count), then the 14-bit scaled total in 1/16
    units — with the libvpx-820 formula on subsampled axes.
    reference: mc_luma_scaled vp9recon.c:505-518, mc_chroma_scaled
    :574-589. Returns (integer source start, 1/16 phase)."""
    if ss:
        mv = min(max(mv, -(b0 + span + 4) * 16), (n8 * 4 - b0 + 3) * 16)
        total = ((mv * scale >> 14) + ((a0 * scale >> 10) & ~15)
                 + ((a0 * scale >> 9) & 15))
    else:
        mv = min(max(mv, -(b0 + span + 4) * 8), (n8 * 8 - b0 + 3) * 8)
        total = (mv * 2 * scale >> 14) + (a0 * scale >> 10)
    return total >> 4, total & 0xF


def _scaled_mc_luma(s, dst, py, px, fr, mv, bw, bh, bx, by, pw, ph, b,
                    avg, bpp):
    """reference: mc_luma_scaled (vp9recon.c:492-560). (py, px): call
    corner (dst == ref-position coords); (bx, by, pw, ph): parent block
    corner/span for the MV clamp."""
    ref_idx = b.ref[1] if avg else b.ref[0]
    scale = s.mvscale[ref_idx]
    step = s.mvstep[ref_idx]
    w1, h1 = fr.size
    sx, mx = _scaled_axis(mv[0], px, scale[0], 0, bx, pw, s.cols)
    sy, my = _scaled_axis(mv[1], py, scale[1], 0, by, ph, s.rows)
    mc.mc_scaled(dst, py, px, fr.planes[0], sy, sx, bw, bh, mx, my,
                 step[0], step[1], w1, h1, b.filter, avg, bpp)


def _scaled_mc_chroma(s, dst_u, dst_v, py, px, fr, mv, bw, bh, bx, by,
                      pw, ph, b, avg, bpp):
    """reference: mc_chroma_scaled (vp9recon.c:562-628). Coordinates and
    clamp geometry in chroma px."""
    h = s.header
    ref_idx = b.ref[1] if avg else b.ref[0]
    scale = s.mvscale[ref_idx]
    step = s.mvstep[ref_idx]
    w1, h1 = fr.size
    w1 = (w1 + h.ss_h) >> h.ss_h
    h1 = (h1 + h.ss_v) >> h.ss_v
    sx, mx = _scaled_axis(mv[0], px, scale[0], h.ss_h, bx, pw, s.cols)
    sy, my = _scaled_axis(mv[1], py, scale[1], h.ss_v, by, ph, s.rows)
    for dplane, rplane in ((dst_u, fr.planes[1]), (dst_v, fr.planes[2])):
        mc.mc_scaled(dplane, py, px, rplane, sy, sx, bw, bh, mx, my,
                     step[0], step[1], w1, h1, b.filter, avg, bpp)


def _inter_recon_scaled_block(s, row, col, b, fr1, fr2):
    """Scaled-reference MC call structure (vp9_mc_template.c SCALED==1):
    every sub-8x8 block is four 4x4 luma quadrant calls, chroma is
    quadrant-split along non-subsampled axes, and each call anchors the
    fractional stepping at its own corner."""
    h = s.header
    bpp = h.bpp
    ss_h, ss_v = h.ss_h, h.ss_v
    cur = s.cur_frame_obj
    py_y, px_y = row * 8, col * 8
    py_uv, px_uv = py_y >> ss_v, px_y >> ss_h

    def luma(dy, dx, mv, bw, bh, pw, ph, fr, avg):
        if s.mvscale[b.ref[1] if avg else b.ref[0]][0] == 0:
            w1, h1 = fr.size
            mc.mc_unscaled(cur.planes[0], py_y + dy, px_y + dx,
                           fr.planes[0], py_y + dy, px_y + dx, bw, bh,
                           mv[0] * 2, mv[1] * 2, w1, h1, b.filter, avg,
                           bpp)
        else:
            _scaled_mc_luma(s, cur.planes[0], py_y + dy, px_y + dx, fr,
                            mv, bw, bh, px_y, py_y, pw, ph, b, avg, bpp)

    def chroma(dy, dx, mv, bw, bh, pw, ph, fr, avg):
        if s.mvscale[b.ref[1] if avg else b.ref[0]][0] == 0:
            w1, h1 = fr.size
            w1 = (w1 + ss_h) >> ss_h
            h1 = (h1 + ss_v) >> ss_v
            for p in (1, 2):
                mc.mc_unscaled(cur.planes[p], py_uv + dy, px_uv + dx,
                               fr.planes[p], py_uv + dy, px_uv + dx,
                               bw, bh, mv[0] * (1 << (1 - ss_h)),
                               mv[1] * (1 << (1 - ss_v)), w1, h1,
                               b.filter, avg, bpp)
        else:
            _scaled_mc_chroma(s, cur.planes[1], cur.planes[2],
                              py_uv + dy, px_uv + dx, fr, mv, bw, bh,
                              px_uv, py_uv, pw, ph, b, avg, bpp)

    if b.bs > 9:  # sub-8x8: four 4x4 quadrant calls
        for ri in range(2 if b.comp else 1):
            fr = fr1 if ri == 0 else fr2
            for q, (dy, dx) in enumerate(((0, 0), (0, 4), (4, 0),
                                          (4, 4))):
                luma(dy, dx, b.mv[q][ri], 4, 4, 8, 8, fr, ri)
            m = [b.mv[q][ri] for q in range(4)]
            if ss_v:
                if ss_h:
                    chroma(0, 0, _avg_mv4(*m), 4, 4, 4, 4, fr, ri)
                else:
                    chroma(0, 0, _avg_mv2(m[0], m[2]), 4, 4, 8, 4,
                           fr, ri)
                    chroma(0, 4, _avg_mv2(m[1], m[3]), 4, 4, 8, 4,
                           fr, ri)
            else:
                if ss_h:
                    chroma(0, 0, _avg_mv2(m[0], m[1]), 4, 4, 4, 8,
                           fr, ri)
                    # BUG (kept): wrong sub-block index for the bottom
                    # half (vp9_mc_template.c:392-399)
                    chroma(4, 0, _avg_mv2(m[1], m[2]), 4, 4, 4, 8,
                           fr, ri)
                else:
                    for q, (dy, dx) in enumerate(((0, 0), (0, 4),
                                                  (4, 0), (4, 4))):
                        chroma(dy, dx, m[q], 4, 4, 8, 8, fr, ri)
    else:
        bw = int(T.BWH_TAB[0, b.bs, 0]) * 4
        bh = int(T.BWH_TAB[0, b.bs, 1]) * 4
        uvbw = int(T.BWH_TAB[ss_h, b.bs, 0]) * 4
        uvbh = int(T.BWH_TAB[ss_v, b.bs, 1]) * 4
        for ri in range(2 if b.comp else 1):
            fr = fr1 if ri == 0 else fr2
            luma(0, 0, b.mv[0][ri], bw, bh, bw, bh, fr, ri)
            chroma(0, 0, b.mv[0][ri], uvbw, uvbh, uvbw, uvbh, fr, ri)
