"""Motion vector prediction and decode.

Behavioral reference: find_ref_mvs / read_mv_component / ff_vp9_fill_mv
(reference: libavcodec/vp9mvs.c:30-365), including the annotated libvpx
bugs (different-ref second-MV condition at vp9mvs.c:206-208, hp count at
:263-266, and the sub8x8 zero-mv fallback at :120).
"""
import numpy as np

from . import tables as T

ZEROMV, NEARESTMV, NEARMV, NEWMV = 12, 10, 11, 13  # values per vp9shared.h
# (col_off, row_off) candidate scan per block size
# (reference: vp9mvs.c:40-67)
MV_REF_BLK_OFF = [
    # BS_64x64
    [(3, -1), (-1, 3), (4, -1), (-1, 4), (-1, -1), (0, -1), (-1, 0), (6, -1)],
    # BS_64x32
    [(0, -1), (-1, 0), (4, -1), (-1, 2), (-1, -1), (0, -3), (-3, 0), (2, -1)],
    # BS_32x64
    [(-1, 0), (0, -1), (-1, 4), (2, -1), (-1, -1), (-3, 0), (0, -3), (-1, 2)],
    # BS_32x32
    [(1, -1), (-1, 1), (2, -1), (-1, 2), (-1, -1), (0, -3), (-3, 0), (-3, -3)],
    # BS_32x16
    [(0, -1), (-1, 0), (2, -1), (-1, -1), (-1, 1), (0, -3), (-3, 0), (-3, -3)],
    # BS_16x32
    [(-1, 0), (0, -1), (-1, 2), (-1, -1), (1, -1), (-3, 0), (0, -3), (-3, -3)],
    # BS_16x16
    [(0, -1), (-1, 0), (1, -1), (-1, 1), (-1, -1), (0, -3), (-3, 0), (-3, -3)],
    # BS_16x8
    [(0, -1), (-1, 0), (1, -1), (-1, -1), (0, -2), (-2, 0), (-2, -1), (-1, -2)],
    # BS_8x16
    [(-1, 0), (0, -1), (-1, 1), (-1, -1), (-2, 0), (0, -2), (-1, -2), (-2, -1)],
] + [
    # BS_8x8 .. BS_4x4 share one pattern
    [(0, -1), (-1, 0), (-1, -1), (0, -2), (-2, 0), (-1, -2), (-2, -1), (-2, -2)]
] * 4

MV_JOINT_V = 2  # joint codes: 0=zero, 1=h, 2=v, 3=hv


def _clamp_mv(mv, td):
    return (min(max(mv[0], td.min_mv[0]), td.max_mv[0]),
            min(max(mv[1], td.min_mv[1]), td.max_mv[1]))


class _Found(Exception):
    def __init__(self, mv):
        self.mv = mv


def find_ref_mvs(td, ref, z, idx, sb):
    """Return predicted MV (x, y) for reference `ref`.

    z:   which MV slot of the current block's earlier sub-blocks to use for
         direct candidates (0 = first ref, 1 = second/compound ref).
    idx: 0 = NEARESTMV (first candidate), 1 = NEARMV (second distinct).
    sb:  -1 = whole-block NEWMV path, 0..3 = sub-8x8 sub-block index.
    """
    s = td.s
    b = td.b
    row, col, row7 = td.row, td.col, td.row7
    p = MV_REF_BLK_OFF[b.bs]
    mem = None          # first candidate (raw, unclamped u32-compare basis)
    mem_sub8x8 = None
    cur_mv = s.cur_mv      # [r8, c8, 2ref, 2xy] int16 view of CUR_FRAME grid
    cur_ref = s.cur_ref    # [r8, c8, 2] int8

    def ret_direct(mv):
        nonlocal mem
        m = (int(mv[0]), int(mv[1]))
        if idx == 0:
            raise _Found(m)
        elif mem is None:
            mem = m
        elif m != mem:
            raise _Found(m)

    def ret_mv(mvx, mvy):
        nonlocal mem, mem_sub8x8
        mv = (int(mvx), int(mvy))
        if sb > 0:
            # sub-block NEAR path (reference: RETURN_MV sb>0 branch)
            if mem_sub8x8 is None:
                tmp = _clamp_mv(mv, td)
                if tmp != mem:
                    raise _Found(tmp)
                mem_sub8x8 = mv
            elif mem_sub8x8 != mv:
                tmp = _clamp_mv(mv, td)
                if tmp != mem:
                    raise _Found(tmp)
                else:
                    # BUG (kept): libvpx returns zero here (vp9mvs.c:120)
                    raise _Found((0, 0))
        else:
            if idx == 0:
                raise _Found(_clamp_mv(mv, td))
            elif mem is None:
                mem = mv
            elif mv != mem:
                raise _Found(_clamp_mv(mv, td))

    def ret_scale_mv(mvx, mvy, scale):
        if scale:
            ret_mv(-int(mvx), -int(mvy))
        else:
            ret_mv(int(mvx), int(mvy))

    try:
        if sb >= 0:
            if sb == 2 or sb == 1:
                ret_direct(b.mv[0][z])
            elif sb == 3:
                ret_direct(b.mv[2][z])
                ret_direct(b.mv[1][z])
                ret_direct(b.mv[0][z])
            if row > 0:
                r, c = row - 1, col
                if cur_ref[r, c, 0] == ref:
                    mv = s.above_mv_ctx[2 * col + (sb & 1), 0]
                    ret_mv(mv[0], mv[1])
                elif cur_ref[r, c, 1] == ref:
                    mv = s.above_mv_ctx[2 * col + (sb & 1), 1]
                    ret_mv(mv[0], mv[1])
            if col > td.tile_col_start:
                r, c = row, col - 1
                if cur_ref[r, c, 0] == ref:
                    mv = td.left_mv_ctx[2 * row7 + (sb >> 1), 0]
                    ret_mv(mv[0], mv[1])
                elif cur_ref[r, c, 1] == ref:
                    mv = td.left_mv_ctx[2 * row7 + (sb >> 1), 1]
                    ret_mv(mv[0], mv[1])
            start = 2
        else:
            start = 0

        # spatial neighbors with same reference frame
        for i in range(start, 8):
            c = p[i][0] + col
            r = p[i][1] + row
            if td.tile_col_start <= c < s.cols and 0 <= r < s.rows:
                if cur_ref[r, c, 0] == ref:
                    ret_mv(cur_mv[r, c, 0, 0], cur_mv[r, c, 0, 1])
                elif cur_ref[r, c, 1] == ref:
                    ret_mv(cur_mv[r, c, 1, 0], cur_mv[r, c, 1, 1])

        # temporal MV (previous frame's grid), same ref
        if s.header.use_last_frame_mvs and s.prev_mv is not None:
            if s.prev_ref[row, col, 0] == ref:
                ret_mv(s.prev_mv[row, col, 0, 0], s.prev_mv[row, col, 0, 1])
            elif s.prev_ref[row, col, 1] == ref:
                ret_mv(s.prev_mv[row, col, 1, 0], s.prev_mv[row, col, 1, 1])

        # spatial neighbors, different reference frame (sign-bias flip)
        sbias = s.header.signbias
        for i in range(8):
            c = p[i][0] + col
            r = p[i][1] + row
            if td.tile_col_start <= c < s.cols and 0 <= r < s.rows:
                r0, r1 = int(cur_ref[r, c, 0]), int(cur_ref[r, c, 1])
                if r0 != ref and r0 >= 0:
                    ret_scale_mv(cur_mv[r, c, 0, 0], cur_mv[r, c, 0, 1],
                                 sbias[r0] != sbias[ref])
                if (r1 != ref and r1 >= 0 and
                        # BUG (kept): compares mv pair equality regardless
                        # of first-mv use (vp9mvs.c:206-208)
                        (cur_mv[r, c, 0, 0] != cur_mv[r, c, 1, 0]
                         or cur_mv[r, c, 0, 1] != cur_mv[r, c, 1, 1])):
                    ret_scale_mv(cur_mv[r, c, 1, 0], cur_mv[r, c, 1, 1],
                                 sbias[r1] != sbias[ref])

        # temporal, different ref
        if s.header.use_last_frame_mvs and s.prev_mv is not None:
            r0 = int(s.prev_ref[row, col, 0])
            r1 = int(s.prev_ref[row, col, 1])
            if r0 != ref and r0 >= 0:
                ret_scale_mv(s.prev_mv[row, col, 0, 0],
                             s.prev_mv[row, col, 0, 1],
                             sbias[r0] != sbias[ref])
            if (r1 != ref and r1 >= 0 and
                    (s.prev_mv[row, col, 0, 0] != s.prev_mv[row, col, 1, 0]
                     or s.prev_mv[row, col, 0, 1]
                     != s.prev_mv[row, col, 1, 1])):
                ret_scale_mv(s.prev_mv[row, col, 1, 0],
                             s.prev_mv[row, col, 1, 1],
                             sbias[r1] != sbias[ref])

        return _clamp_mv((0, 0), td)
    except _Found as f:
        return f.mv


def read_mv_component(td, idx, hp):
    """reference: vp9mvs.c:236-289."""
    s = td.s
    c = td.c
    p = s.probs
    cnt = td.counts
    sign = c.get_prob(int(p.mv_sign[idx]))
    cnt.mv_sign[idx, sign] += 1
    cl = c.get_tree(T.MV_CLASS_TREE, p.mv_classes[idx])
    cnt.mv_classes[idx, cl] += 1
    if cl:
        n = 0
        for m in range(cl):
            bit = c.get_prob(int(p.mv_bits[idx, m]))
            n |= bit << m
            cnt.mv_bits[idx, m, bit] += 1
        n <<= 3
        bit = c.get_tree(T.MV_FP_TREE, p.mv_fp[idx])
        n |= bit << 1
        cnt.mv_fp[idx, bit] += 1
        if hp:
            bit = c.get_prob(int(p.mv_hp[idx]))
            cnt.mv_hp[idx, bit] += 1
            n |= bit
        else:
            n |= 1
            # BUG (kept): counted even though not coded (vp9mvs.c:263-266)
            cnt.mv_hp[idx, 1] += 1
        n += 8 << cl
    else:
        n = c.get_prob(int(p.mv_class0[idx]))
        cnt.mv_class0[idx, n] += 1
        bit = c.get_tree(T.MV_FP_TREE, p.mv_class0_fp[idx, n])
        cnt.mv_class0_fp[idx, n, bit] += 1
        n = (n << 3) | (bit << 1)
        if hp:
            bit = c.get_prob(int(p.mv_class0_hp[idx]))
            cnt.mv_class0_hp[idx, bit] += 1
            n |= bit
        else:
            n |= 1
            cnt.mv_class0_hp[idx, 1] += 1
    return -(n + 1) if sign else (n + 1)


def fill_mv(td, mv_out, mode, sb):
    """Fill mv_out[2][2] = per-ref (x, y). reference: vp9mvs.c:291-365."""
    s = td.s
    b = td.b
    if mode == ZEROMV:
        mv_out[0] = (0, 0)
        mv_out[1] = (0, 0)
        return
    # first reference
    mv_out[0] = _find_for_ref(td, b.ref[0], 0, mode, sb)
    if b.comp:
        mv_out[1] = _find_for_ref(td, b.ref[1], 1, mode, sb)


def _find_for_ref(td, ref, z, mode, sb):
    s = td.s
    c = td.c
    mv = find_ref_mvs(td, ref, z, 1 if mode == NEARMV else 0,
                      -1 if mode == NEWMV else sb)
    x, y = mv
    hp = 0
    if mode == NEWMV or sb == -1:
        hp = (s.header.highprecisionmvs and abs(x) < 64 and abs(y) < 64)
        if not hp:
            if y & 1:
                y += 1 if y < 0 else -1
            if x & 1:
                x += 1 if x < 0 else -1
    if mode == NEWMV:
        j = c.get_tree(T.MV_JOINT_TREE, s.probs.mv_joint)
        td.counts.mv_joint[j] += 1
        if j >= MV_JOINT_V:
            y += read_mv_component(td, 0, hp)
        if j & 1:
            x += read_mv_component(td, 1, hp)
    return (x, y)
