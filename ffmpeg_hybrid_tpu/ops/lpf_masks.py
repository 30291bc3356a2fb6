"""Dense loop-filter parameter grids straight from pass A's mask /
level outputs — no per-edge record stream, no host schedule pack.

Pass A already builds, per superblock, the 8x8 filter-level grid and
the four 32-word edge masks (vp9_entropy_block.h mask_edges; the
walker semantics live in native/vp9_lpf.c lf_cols/lf_rows, behavioral
reference ff_vp9_loopfilter_sb, vp9lpf.c:183-230).  The previous
pipeline replayed those masks on the HOST into a ~100k-record edge
stream (vp9_lpf_record) and packed it into wavefront steps
(lpf_tpu.pack_schedule) every frame — 9-10 ms/frame of host time on
LF-heavy content, plus megabytes of packed steps through the tunnel.

This module evaluates the SAME walker decision tree as pure array
ops: masks + levels go up the link (~0.3 MB/frame at 1080p) and one
fused device dispatch produces the dense V/H parameter grids that
lpf_dense consumes.  The code is array-namespace generic: the numpy
instantiation is the host-side validator (tests/test_lpf_masks.py
proves grid equality against the recorded stream on the full corpus),
the jnp instantiation is the production device path.

Walker semantics being reproduced (native/vp9_lpf.c):

  * cols (V edges): rows pair up as (a, b) = (it*(2<<ss_v),
    a+1+ss_v); the pair's top row picks wd 16/8/4 from mask classes
    0/1/2; a 16-wide top edge spans both rows ONLY when class 0 is
    set in both (the 16-lane call; the bottom half then inherits the
    TOP row's E/I/H), else the bottom row falls back to its own
    class-1/2 bits — a bottom class-0 bit alone emits NOTHING (hm2
    excludes h2[0]), and a top-16 edge suppresses the bottom's
    class-1/2 bits outright.
  * rows (H edges): positions pair as (left, right) 8px halves; a
    16-wide edge needs class 0 on both halves and reuses the LEFT
    level; a right class-0 bit alone degrades to wd 8/4 by class 1
    (the reference's masks never produce that shape, but the walker's
    behavior is normative for us).
  * class-3 masks are the 4px-offset edges; they exist only where the
    walker loops them (cols: ss_h==0, rows: ss_v==0) and are not
    subject to the frame-boundary skip.
  * frame boundary: the first 8px-aligned V column (px==0) and H row
    (py==0) of the frame are never filtered.

Reference: /root/reference/libavcodec/vp9lpf.c:183-230 (walker),
vp9block.c:1142-1262 (mask construction).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def _params(xp, wd, L, lim, mblim):
    """(wd, E, I, H) int32 param vectors; all-zero where wd == 0."""
    E = xp.take(mblim, L)
    I = xp.take(lim, L)
    H = L >> 4
    par = xp.stack([wd, E, I, H], axis=-1)
    return xp.where((wd > 0)[..., None], par, 0).astype(xp.int32)


def dense_grids(xp, level, cmask, rmask, lim, mblim,
                ss_h, ss_v, sb_rows, sb_cols):
    """Dense V/H loop-filter parameter grids for ONE plane set.

    level: [nSB, 8, 8] int32 (8x8-block filter levels, luma grid —
    shared by luma and chroma walks). cmask/rmask: [nSB, 8, 4] int32
    (this plane set's cols/rows masks). lim/mblim: [64] int32.
    Returns (V [sb_rows*Rv, sb_cols*Cv, 4], H [sb_rows*Rh,
    sb_cols*Ch, 4]) matching lpf_dense.dense_params' layout for the
    (64>>ss_h) x (64>>ss_v) plane superblock."""
    shifts = np.arange(8, dtype=np.int32)
    cb = ((cmask[..., None] >> shifts) & 1).astype(xp.int32)
    rb = ((rmask[..., None] >> shifts) & 1).astype(xp.int32)
    nSB = level.shape[0]

    # ---- cols walk (V edges) ----
    npair = 4 >> ss_v
    a_rows = np.array([it * (2 << ss_v) for it in range(npair)])
    b_rows = a_rows + 1 + ss_v
    # level column per mask bit cx (ss_h: bit pairs share a column)
    lev_cols = (shifts & ~1) if ss_h else shifts
    h1 = cb[:, a_rows]                     # [nSB, npair, 4, 8]
    h2 = cb[:, b_rows]
    La = level[:, a_rows][:, :, lev_cols]  # [nSB, npair, 8]
    Lb = level[:, b_rows][:, :, lev_cols]
    k0a, k1a, k2a = h1[:, :, 0], h1[:, :, 1], h1[:, :, 2]
    k0b, k1b, k2b = h2[:, :, 0], h2[:, :, 1], h2[:, :, 2]
    top_any = k0a | k1a | k2a
    top_wd = xp.where(top_any == 0, 0,
                      xp.where(k0a == 1, 16, xp.where(k1a == 1, 8, 4)))
    bot_wd = xp.where(k0a == 1,
                      xp.where(k0b == 1, 16, 0),
                      xp.where(k1b == 1, 8, xp.where(k2b == 1, 4, 0)))
    Lbot = xp.where((k0a & k0b) == 1, La, Lb)
    top_par = _params(xp, top_wd, La, lim, mblim)   # [nSB, npair, 8, 4]
    bot_par = _params(xp, bot_wd, Lbot, lim, mblim)
    # interleave rows (top, bottom) -> Rv = 2*npair 8px rows
    par = xp.stack([top_par, bot_par], axis=2) \
        .reshape(nSB, 2 * npair, 8, 4)
    if ss_h == 0:
        toff = _params(xp, h1[:, :, 3] * 4, La, lim, mblim)
        boff = _params(xp, h2[:, :, 3] * 4, Lb, lim, mblim)
        off = xp.stack([toff, boff], axis=2).reshape(nSB, 2 * npair, 8, 4)
        # interleave cols (aligned, offset) -> Cv = 16 4px positions
        par = xp.stack([par, off], axis=3).reshape(nSB, 2 * npair, 16, 4)
    Rv, Cv = par.shape[1], par.shape[2]
    V = par.reshape(sb_rows, sb_cols, Rv, Cv, 4) \
        .transpose(0, 2, 1, 3, 4).reshape(sb_rows * Rv, sb_cols * Cv, 4)
    # frame-left boundary: first 8px-aligned V column never filtered
    V = xp.where((np.arange(sb_cols * Cv) == 0)[None, :, None],
                 xp.zeros((), dtype=V.dtype), V)

    # ---- rows walk (H edges) ----
    ncx = 4 >> ss_h
    lb_idx = np.array([(2 << ss_h) * c for c in range(ncx)])
    rb_idx = lb_idx + 1 + ss_h
    lev_rows = ((shifts & ~1) if ss_v else shifts)
    levr = level[:, lev_rows]              # [nSB, 8, 8]
    Ll = levr[:, :, lb_idx]                # [nSB, 8, ncx]
    Lr = levr[:, :, rb_idx]
    k0l, k1l, k2l = (rb[:, :, 0, lb_idx], rb[:, :, 1, lb_idx],
                     rb[:, :, 2, lb_idx])
    k0r, k1r, k2r = (rb[:, :, 0, rb_idx], rb[:, :, 1, rb_idx],
                     rb[:, :, 2, rb_idx])
    left_any = k0l | k1l | k2l
    left_wd = xp.where(left_any == 0, 0,
                       xp.where(k0l == 1, 16, xp.where(k1l == 1, 8, 4)))
    right_any = k0r | k1r | k2r
    right_wd = xp.where(
        k0l == 1,
        xp.where(k0r == 1, 16, 0),
        xp.where(right_any == 1,
                 xp.where(k1r == 1, 8, 4), 0))
    Lright = xp.where((k0l & k0r) == 1, Ll, Lr)
    l_par = _params(xp, left_wd, Ll, lim, mblim)    # [nSB, 8, ncx, 4]
    r_par = _params(xp, right_wd, Lright, lim, mblim)
    par = xp.stack([l_par, r_par], axis=3).reshape(nSB, 8, 2 * ncx, 4)
    if ss_v == 0:
        ol = _params(xp, rb[:, :, 3, lb_idx] * 4, Ll, lim, mblim)
        orr = _params(xp, rb[:, :, 3, rb_idx] * 4, Lr, lim, mblim)
        off = xp.stack([ol, orr], axis=3).reshape(nSB, 8, 2 * ncx, 4)
        # interleave rows (aligned, offset) -> Rh = 16 4px rows
        par = xp.stack([par, off], axis=2).reshape(nSB, 16, 2 * ncx, 4)
    Rh, Ch = par.shape[1], par.shape[2]
    Hg = par.reshape(sb_rows, sb_cols, Rh, Ch, 4) \
        .transpose(0, 2, 1, 3, 4).reshape(sb_rows * Rh, sb_cols * Ch, 4)
    # frame-top boundary: first 8px-aligned H row never filtered
    Hg = xp.where((np.arange(sb_rows * Rh) == 0)[:, None, None],
                  xp.zeros((), dtype=Hg.dtype), Hg)
    return V, Hg


def grids_host(s):
    """numpy grids for the current frame's Y and UV plane sets (the
    validator / CPU fallback). Returns (Vy, Hy, Vuv, Huv)."""
    h = s.header
    nSB = s.sb_rows * s.sb_cols
    level = s.lf_level.reshape(nSB, 8, 8).astype(np.int32)
    m = s.lf_mask.reshape(nSB, 2, 2, 8, 4)
    lim = s.lim_lut.astype(np.int32)
    mblim = s.mblim_lut.astype(np.int32)
    uvidx = 1 if (h.ss_h | h.ss_v) else 0
    Vy, Hy = dense_grids(np, level, m[:, 0, 0], m[:, 0, 1], lim, mblim,
                         0, 0, s.sb_rows, s.sb_cols)
    Vu, Hu = dense_grids(np, level, m[:, uvidx, 0], m[:, uvidx, 1],
                         lim, mblim, h.ss_h, h.ss_v,
                         s.sb_rows, s.sb_cols)
    return Vy, Hy, Vu, Hu


@partial(jax.jit, static_argnames=("sb_rows", "sb_cols", "ss_h", "ss_v"))
def grids_device(lfl, lfm, lfluts, sb_rows, sb_cols, ss_h, ss_v):
    """Device grids from the uploaded level/mask/LUT buffers in ONE
    dispatch. lfl: [nSB*64] int16 levels; lfm: [nSB*128] int32 masks;
    lfluts: [128] int32 (lim ++ mblim). Returns (Vy, Hy, Vuv, Huv)."""
    nSB = sb_rows * sb_cols
    level = lfl.astype(jnp.int32).reshape(nSB, 8, 8)
    m = lfm.reshape(nSB, 2, 2, 8, 4)
    lim, mblim = lfluts[:64], lfluts[64:]
    uvidx = 1 if (ss_h | ss_v) else 0
    Vy, Hy = dense_grids(jnp, level, m[:, 0, 0], m[:, 0, 1], lim, mblim,
                         0, 0, sb_rows, sb_cols)
    Vu, Hu = dense_grids(jnp, level, m[:, uvidx, 0], m[:, uvidx, 1],
                         lim, mblim, ss_h, ss_v, sb_rows, sb_cols)
    return Vy, Hy, Vu, Hu


def lf_flags(s):
    """Cheap host flags from the raw masks: (y_any, uv_any, y_par,
    uv_par). `*_any` is a SUPERSET of "has active edges" (a set mask
    bit can still be suppressed by the walker; running the kernel on
    an edgeless frame is a no-op, so over-reporting is safe).
    `*_par` is a conservative "no 4px-offset edge can be active" —
    False sends the frame to the serial-position kernel, which is
    always exact, so under-reporting is safe too."""
    h = s.header
    m = s.lf_mask.reshape(s.sb_rows * s.sb_cols, 2, 2, 8, 4)
    uvidx = 1 if (h.ss_h | h.ss_v) else 0

    def per_set(cm, rm, ss_h, ss_v):
        any_ = bool(cm[:, :, :3].any() or rm[:, :, :3].any()
                    or (ss_h == 0 and cm[:, :, 3].any())
                    or (ss_v == 0 and rm[:, :, 3].any()))
        off = False
        if ss_h == 0:
            off |= bool(cm[:, :, 3].any())
        else:
            off |= bool((cm[:, :, :3] & 0xAA).any())  # odd-cx bits
        if ss_v == 0:
            off |= bool(rm[:, :, 3].any())
        else:
            off |= bool(rm[:, 1::2, :3].any())        # odd-y rows
        return any_, not off

    y_any, y_par = per_set(m[:, 0, 0], m[:, 0, 1], 0, 0)
    uv_any, uv_par = per_set(m[:, uvidx, 0], m[:, uvidx, 1],
                             h.ss_h, h.ss_v)
    return y_any, uv_any, y_par, uv_par
