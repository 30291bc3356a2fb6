"""VP9 in-loop deblocking filter, exact integer math (numpy golden,
vectorized over the 8 filter lanes so the same formulation maps to the
TPU path).

Behavioral reference: loop_filter core math (vp9dsp_template.c:1780-1889)
and the per-superblock mask-driven walkers filter_plane_cols/rows +
ff_vp9_loopfilter_sb (vp9lpf.c:31-230).
"""
import numpy as np


def _filter_lanes(px_in, E, I, H, wd, bpp):
    """Filter one edge: px_in is [nlanes, 16] int32 (8 pixels each side of
    the edge, edge between column 7 and 8). E/I/H are per-lane arrays (or
    scalars). Returns filtered [nlanes, 16].

    reference: loop_filter (vp9dsp_template.c:1780-1889).
    """
    x = px_in.astype(np.int32)
    F = 1 << (bpp - 8)
    E = np.asarray(E, np.int32) << (bpp - 8)
    I = np.asarray(I, np.int32) << (bpp - 8)
    H = np.asarray(H, np.int32) << (bpp - 8)
    p = [x[:, 7 - i] for i in range(8)]   # p0..p7
    q = [x[:, 8 + i] for i in range(8)]   # q0..q7
    ab = lambda a: np.abs(a)

    fm = ((ab(p[3] - p[2]) <= I) & (ab(p[2] - p[1]) <= I)
          & (ab(p[1] - p[0]) <= I) & (ab(q[1] - q[0]) <= I)
          & (ab(q[2] - q[1]) <= I) & (ab(q[3] - q[2]) <= I)
          & (ab(p[0] - q[0]) * 2 + (ab(p[1] - q[1]) >> 1) <= E))

    out = x.copy()

    flat8in = ((ab(p[3] - p[0]) <= F) & (ab(p[2] - p[0]) <= F)
               & (ab(p[1] - p[0]) <= F) & (ab(q[1] - q[0]) <= F)
               & (ab(q[2] - q[0]) <= F) & (ab(q[3] - q[0]) <= F))
    if wd >= 16:
        flat8out = ((ab(p[7] - p[0]) <= F) & (ab(p[6] - p[0]) <= F)
                    & (ab(p[5] - p[0]) <= F) & (ab(p[4] - p[0]) <= F)
                    & (ab(q[4] - q[0]) <= F) & (ab(q[5] - q[0]) <= F)
                    & (ab(q[6] - q[0]) <= F) & (ab(q[7] - q[0]) <= F))
        w16 = fm & flat8out & flat8in
    else:
        w16 = np.zeros(fm.shape, bool)

    # wd16 filter (15-tap smoothing)
    if wd >= 16:
        v16 = {}
        seq = p[::-1] + q  # p7..p0 q0..q7 = positions 0..15
        for k in range(1, 15):  # outputs positions 1..14 (p6..q6)
            acc = np.zeros_like(p[0])
            # 15-tap: 7 before, self*2, 7 after with edge replication
            for t in range(-7, 8):
                idx = k + t
                idx = 0 if idx < 0 else 15 if idx > 15 else idx
                acc = acc + seq[idx]
            acc = acc + seq[k]  # self counted twice
            v16[k] = (acc + 8) >> 4
        for k in range(1, 15):
            col = k  # position in the 16-wide window
            out[:, col] = np.where(w16, v16[k], out[:, col])

    # wd8 flat filter
    if wd >= 8:
        w8 = fm & flat8in & ~w16
        f = {}
        f[-3] = (p[3] + p[3] + p[3] + 2 * p[2] + p[1] + p[0] + q[0] + 4) >> 3
        f[-2] = (p[3] + p[3] + p[2] + 2 * p[1] + p[0] + q[0] + q[1] + 4) >> 3
        f[-1] = (p[3] + p[2] + p[1] + 2 * p[0] + q[0] + q[1] + q[2] + 4) >> 3
        f[0] = (p[2] + p[1] + p[0] + 2 * q[0] + q[1] + q[2] + q[3] + 4) >> 3
        f[1] = (p[1] + p[0] + q[0] + 2 * q[1] + q[2] + q[3] + q[3] + 4) >> 3
        f[2] = (p[0] + q[0] + q[1] + 2 * q[2] + q[3] + q[3] + q[3] + 4) >> 3
        for k, v in f.items():
            col = 8 + k if k >= 0 else 8 + k
            out[:, 8 + k] = np.where(w8, v, out[:, 8 + k])
    else:
        w8 = np.zeros(fm.shape, bool)

    # narrow 4-tap filter
    wn = fm & ~w16 & ~w8
    hev = (ab(p[1] - p[0]) > H) | (ab(q[1] - q[0]) > H)
    maxs = (1 << (bpp - 1)) - 1
    mins = -(1 << (bpp - 1))
    clip_s = lambda v: np.clip(v, mins, maxs)
    maxp = (1 << bpp) - 1

    # hev path
    fh = clip_s(3 * (q[0] - p[0]) + clip_s(p[1] - q[1]))
    f1h = np.minimum(fh + 4, maxs) >> 3
    f2h = np.minimum(fh + 3, maxs) >> 3
    # non-hev path
    fn = clip_s(3 * (q[0] - p[0]))
    f1n = np.minimum(fn + 4, maxs) >> 3
    f2n = np.minimum(fn + 3, maxs) >> 3
    fo = (f1n + 1) >> 1

    f1 = np.where(hev, f1h, f1n)
    f2 = np.where(hev, f2h, f2n)
    np0 = np.clip(p[0] + f2, 0, maxp)
    nq0 = np.clip(q[0] - f1, 0, maxp)
    np1 = np.where(hev, p[1], np.clip(p[1] + fo, 0, maxp))
    nq1 = np.where(hev, q[1], np.clip(q[1] - fo, 0, maxp))
    out[:, 7] = np.where(wn, np0, out[:, 7])
    out[:, 8] = np.where(wn, nq0, out[:, 8])
    out[:, 6] = np.where(wn, np1, out[:, 6])
    out[:, 9] = np.where(wn, nq1, out[:, 9])
    return out


# columns of the 16-wide window each filter width can modify
_WRITE_RANGE = {4: (6, 10), 8: (5, 11), 16: (1, 15)}


def _apply(plane, py, px, dir_, wd, E, I, H, bpp, nlanes=8):
    """Apply the filter at an edge. dir_=0: vertical edge at column px,
    lanes = rows py..py+7. dir_=1: horizontal edge at row py, lanes =
    columns px..px+7. The 16-wide sample window is gathered with edge
    clamping: positions a given filter width actually reads are always
    in-bounds (narrow filters read only +-4), and writes are restricted
    to the width's modified range."""
    lo, hi = _WRITE_RANGE[wd]
    if dir_ == 0:
        cols = np.clip(np.arange(px - 8, px + 8), 0, plane.shape[1] - 1)
        win = plane[py:py + nlanes][:, cols]
        res = _filter_lanes(win, E, I, H, wd, bpp)
        plane[py:py + nlanes, px - 8 + lo:px - 8 + hi] = res[:, lo:hi]
    else:
        rows = np.clip(np.arange(py - 8, py + 8), 0, plane.shape[0] - 1)
        win = plane[rows][:, px:px + nlanes].T
        res = _filter_lanes(win, E, I, H, wd, bpp)
        plane[py - 8 + lo:py - 8 + hi, px:px + nlanes] = res[:, lo:hi].T


def _eih(level, idx, lim_lut, mblim_lut):
    L = int(level[idx])
    return int(mblim_lut[L]), int(lim_lut[L]), L >> 4


def filter_plane_cols(plane, base_y, base_x, col, ss_h, ss_v, level, mask,
                      lim_lut, mblim_lut, bpp, apply=_apply):
    """Vertical-edge pass for one superblock's plane region.
    level: flat [64] uint8 (8x8 grid); mask: [8][4] bitmasks.
    reference: filter_plane_cols (vp9lpf.c:31-105). The reference's
    loop_filter_16 / loop_filter_mix2 compound calls are decomposed into
    their 8-lane halves (identical math, vp9dsp_template.c:1920-1960)."""
    lvl = 0  # flat index into 8x8 level grid
    it = 0
    for y in range(0, 8, 2 << ss_v):
        hmask1 = mask[y]
        hmask2 = mask[y + 1 + ss_v]
        hm1 = int(hmask1[0]) | int(hmask1[1]) | int(hmask1[2])
        hm13 = int(hmask1[3])
        hm2 = int(hmask2[1]) | int(hmask2[2])
        hm23 = int(hmask2[3])
        hm = hm1 | hm2 | hm13 | hm23
        x = 1
        l = lvl
        cx = 0
        py = base_y + it * 16
        while hm & ~(x - 1):
            px = base_x + cx * (8 >> ss_h)
            if col or x > 1:
                if hm1 & x:
                    E, I, H = _eih(level, l, lim_lut, mblim_lut)
                    if int(hmask1[0]) & x:
                        if int(hmask2[0]) & x:
                            apply(plane, py, px, 0, 16, E, I, H, bpp, 16)
                        else:
                            apply(plane, py, px, 0, 16, E, I, H, bpp, 8)
                    elif hm2 & x:
                        wd1 = 8 if int(hmask1[1]) & x else 4
                        wd2 = 8 if int(hmask2[1]) & x else 4
                        apply(plane, py, px, 0, wd1, E, I, H, bpp, 8)
                        E2, I2, H2 = _eih(level, l + (8 << ss_v),
                                          lim_lut, mblim_lut)
                        apply(plane, py + 8, px, 0, wd2, E2, I2, H2, bpp, 8)
                    else:
                        wd1 = 8 if int(hmask1[1]) & x else 4
                        apply(plane, py, px, 0, wd1, E, I, H, bpp, 8)
                elif hm2 & x:
                    E, I, H = _eih(level, l + (8 << ss_v), lim_lut,
                                   mblim_lut)
                    wd2 = 8 if int(hmask2[1]) & x else 4
                    apply(plane, py + 8, px, 0, wd2, E, I, H, bpp, 8)
            if ss_h:
                if x & 0xAA:
                    l += 2
            else:
                if hm13 & x:
                    E, I, H = _eih(level, l, lim_lut, mblim_lut)
                    apply(plane, py, px + 4, 0, 4, E, I, H, bpp, 8)
                    if hm23 & x:
                        E2, I2, H2 = _eih(level, l + (8 << ss_v),
                                          lim_lut, mblim_lut)
                        apply(plane, py + 8, px + 4, 0, 4, E2, I2, H2,
                               bpp, 8)
                elif hm23 & x:
                    E, I, H = _eih(level, l + (8 << ss_v), lim_lut,
                                   mblim_lut)
                    apply(plane, py + 8, px + 4, 0, 4, E, I, H, bpp, 8)
                l += 1
            x <<= 1
            cx += 1
        it += 1
        lvl += 16 << ss_v


def filter_plane_rows(plane, base_y, base_x, row, ss_h, ss_v, level, mask,
                      lim_lut, mblim_lut, bpp, apply=_apply):
    """Horizontal-edge pass (reference: filter_plane_rows, vp9lpf.c:107-181).
    """
    lvl = 0
    for y in range(8):
        vmask = mask[y]
        vm = int(vmask[0]) | int(vmask[1]) | int(vmask[2])
        vm3 = int(vmask[3])
        py = base_y + y * (8 >> ss_v)
        x = 1
        l = lvl
        cx = 0
        while vm & ~(x - 1):
            px = base_x + cx * 16
            x2 = x << (1 + ss_h)
            if row or y:
                if vm & x:
                    E, I, H = _eih(level, l, lim_lut, mblim_lut)
                    if int(vmask[0]) & x:
                        if int(vmask[0]) & x2:
                            apply(plane, py, px, 1, 16, E, I, H, bpp, 16)
                        else:
                            apply(plane, py, px, 1, 16, E, I, H, bpp, 8)
                    elif vm & x2:
                        wd1 = 8 if int(vmask[1]) & x else 4
                        wd2 = 8 if int(vmask[1]) & x2 else 4
                        apply(plane, py, px, 1, wd1, E, I, H, bpp, 8)
                        E2, I2, H2 = _eih(level, l + 1 + ss_h,
                                          lim_lut, mblim_lut)
                        apply(plane, py, px + 8, 1, wd2, E2, I2, H2, bpp, 8)
                    else:
                        wd1 = 8 if int(vmask[1]) & x else 4
                        apply(plane, py, px, 1, wd1, E, I, H, bpp, 8)
                elif vm & x2:
                    E, I, H = _eih(level, l + 1 + ss_h, lim_lut, mblim_lut)
                    wd2 = 8 if int(vmask[1]) & x2 else 4
                    apply(plane, py, px + 8, 1, wd2, E, I, H, bpp, 8)
            if not ss_v:
                if vm3 & x:
                    E, I, H = _eih(level, l, lim_lut, mblim_lut)
                    apply(plane, py + 4, px, 1, 4, E, I, H, bpp, 8)
                    if vm3 & x2:
                        E2, I2, H2 = _eih(level, l + 1 + ss_h,
                                          lim_lut, mblim_lut)
                        apply(plane, py + 4, px + 8, 1, 4, E2, I2, H2,
                               bpp, 8)
                elif vm3 & x2:
                    E, I, H = _eih(level, l + 1 + ss_h, lim_lut, mblim_lut)
                    apply(plane, py + 4, px + 8, 1, 4, E, I, H, bpp, 8)
            x <<= 2 << ss_h
            cx += 1
            l += 2 << ss_h
        if ss_v:
            if y & 1:
                lvl += 16
        else:
            lvl += 8


def loopfilter_sb(planes, level, masks, row, col, ss_h, ss_v, lim_lut,
                  mblim_lut, bpp, apply=_apply):
    """Filter one 64x64 superblock across Y/U/V.
    planes: [y, u, v] numpy int planes (padded). level: [8,8] grid.
    masks: [2][2][8][4] (0=y, 1=uv; 0=col, 1=row).
    reference: ff_vp9_loopfilter_sb (vp9lpf.c:183-230)."""
    lv = level.reshape(-1)
    y0, x0 = row * 8, col * 8
    filter_plane_cols(planes[0], y0, x0, col, 0, 0, lv, masks[0][0],
                      lim_lut, mblim_lut, bpp, apply)
    filter_plane_rows(planes[0], y0, x0, row, 0, 0, lv, masks[0][1],
                      lim_lut, mblim_lut, bpp, apply)
    uvidx = 1 if (ss_h | ss_v) else 0
    uy0, ux0 = y0 >> ss_v, x0 >> ss_h
    for p in (1, 2):
        filter_plane_cols(planes[p], uy0, ux0, col, ss_h, ss_v, lv,
                          masks[uvidx][0], lim_lut, mblim_lut, bpp, apply)
        filter_plane_rows(planes[p], uy0, ux0, row, ss_h, ss_v, lv,
                          masks[uvidx][1], lim_lut, mblim_lut, bpp, apply)
