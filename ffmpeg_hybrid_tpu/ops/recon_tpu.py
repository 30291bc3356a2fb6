"""TPU pass-B reconstruction backend (JAX/XLA).

Architecture (the reference's accumulate-then-dispatch WebGPU idea done
properly, reference: vp9_webgpu.c:2956; SURVEY §7 plan):
  1. residual pass   — dense per-tile batched inverse transforms over the
                       whole coefficient plane (one pass per tx size,
                       dct/adst variants computed and selected per tile;
                       dc-only fast path selected by eob==1)
  2. inter pass      — uniform per-4x4-cell 8-tap MC (sub-pel phases and
                       filter banks gathered per cell; bilinear expressed
                       as an 8-tap bank), compound average, +residual
  3. intra wavefront — host-computed dependency levels; per level the
                       tx blocks' edges are gathered and predicted with
                       one exact f32 matmul (ops/intra_tables) + TM special
  4. loop filter     — wavefront replay on device (ops/lpf_tpu): the
                       native walker records the exact edge sequence,
                       anti-diagonal superblock waves are batched, and a
                       single lax.scan applies them; frame planes stay
                       device-resident across frames (refs included)

All integer math matches the golden path bit-exactly (tested by decoding
the conformance vectors with recon_backend='tpu').
"""
from __future__ import annotations

import os
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.metrics import metrics

from . import dw
from . import itxfm
from . import intra_tables as it
from ..codecs.vp9 import tables as T

# ---------------------------------------------------------------------------
# filter taps: [4 banks][16 phases][8 taps]; bank 3 = bilinear as 8-tap
# ((128-8m)*a + 8m*b + 64) >> 7 == a + (m*(b-a) + 8) >> 4 exactly
_FTAB = np.zeros((4, 16, 8), np.int32)
_FTAB[:3] = T.SUBPEL_FILTERS
for _m in range(16):
    _FTAB[3, _m, 3] = 128 - 8 * _m
    _FTAB[3, _m, 4] = 8 * _m


# ---------------------------------------------------------------------------
# residual pass


@partial(jax.jit, static_argnames=("tx", "lossless", "bpp", "hsz", "wsz"))
def _residual_for_size(coef, eob4, txsz4, txtype4, tx, lossless, bpp,
                       hsz, wsz):
    """Residual contribution of all tiles of size `tx` -> [H, W] int32.
    At 10/12 bpp the transforms run on double-word int32 pairs (ops/dw)
    for exact `dctint int64_t` semantics on the int32 VPU."""
    if coef.dtype == jnp.int16:
        coef = coef.astype(jnp.int32)  # 8bpp coefs upload narrow
    hbd = bpp > 8
    sz = 4 << tx
    k = sz // 4
    H, W = coef.shape
    nth, ntw = H // sz, W // sz
    tiles = coef.reshape(nth, sz, ntw, sz).transpose(0, 2, 1, 3)
    roots_eob = eob4[::k, ::k]
    roots_sz = txsz4[::k, ::k]
    roots_tp = txtype4[::k, ::k]
    active = (roots_sz == tx)

    if lossless:
        if hbd:
            res = dw.round_residual(dw.itxfm_2d(tiles, 4, 0), 4)
        else:
            r = itxfm.itxfm_2d(jnp, tiles, 4, 0, bpp)
            res = itxfm.round_residual(r, 4)
    elif tx == 3:
        if hbd:
            full = dw.round_residual(dw.itxfm_2d(tiles, 3, 0), 3)
            dc = dw.dc_only_residual(tiles[..., 0, 0], tx)
        else:
            r = itxfm.itxfm_2d(jnp, tiles, 3, 0, bpp)
            full = itxfm.round_residual(r, 3)
            dc = itxfm.dc_only_residual(tiles[..., 0, 0], tx)
        res = jnp.where((roots_eob == 1)[..., None, None],
                        dc[..., None, None], full)
    else:
        # pass a (columns) both variants, select per tile
        use_adst_a = ((roots_tp == 1) | (roots_tp == 3))[..., None, None]
        use_adst_b = ((roots_tp == 2) | (roots_tp == 3))[..., None, None]
        if hbd:
            r = dw.itxfm_2d_select(tiles, use_adst_a, use_adst_b, tx)
            full = dw.round_residual(r, tx)
            dc = dw.dc_only_residual(tiles[..., 0, 0], tx)
        else:
            blk_t = tiles.swapaxes(-1, -2)
            wrap = itxfm._wrap16
            fa_d = itxfm._1D[(tx, "dct")]
            fa_a = itxfm._1D[(tx, "adst")]
            tmp = wrap(jnp.where(use_adst_a, fa_a(jnp, blk_t),
                                 fa_d(jnp, blk_t)))
            tmp_t = tmp.swapaxes(-1, -2)
            r = wrap(jnp.where(use_adst_b, fa_a(jnp, tmp_t),
                               fa_d(jnp, tmp_t)))
            full = itxfm.round_residual(r.swapaxes(-1, -2), tx)
            dc = itxfm.dc_only_residual(tiles[..., 0, 0], tx)
        dc_ok = (roots_eob == 1) & (roots_tp == 0)
        res = jnp.where(dc_ok[..., None, None], dc[..., None, None], full)

    res = jnp.where((active & (roots_eob > 0))[..., None, None], res, 0)
    return res.transpose(0, 2, 1, 3).reshape(H, W)


def residual_plane(coef, eob4, txsz4, txtype4, lossless, bpp):
    if lossless:
        return _residual_for_size(coef, eob4, txsz4, txtype4, 0, True, bpp,
                                  *coef.shape)
    out = jnp.zeros(coef.shape, jnp.int32)
    for tx in range(4):
        out = out + _residual_for_size(coef, eob4, txsz4, txtype4, tx,
                                       False, bpp, *coef.shape)
    return out


# ---------------------------------------------------------------------------
# inter pass: per-4x4-cell MC


@partial(jax.jit, static_argnames=("bpp", "mvsx", "mvsy"))
def _mc_cells(refstack, mv16, refsel, comp, filt, inter_mask, w, h, bpp,
              mvsx=1, mvsy=1):
    """MC every 4x4 cell.

    refstack: [3, Hp, Wp] candidate ref planes (b.ref -> plane index).
    mv16: [r4, c4, 2, 2] int32 (1/16-pel in this plane's units).
    refsel: [r4, c4, 2] int32 in 0..2; comp: [r4, c4] bool;
    filt: [r4, c4] int32; inter_mask: [r4, c4] bool.
    Returns [r4*4, c4*4] int32 MC plane (garbage at non-inter cells).
    """
    mv16 = mv16.astype(jnp.int32)
    refsel = refsel.astype(jnp.int32)
    filt = filt.astype(jnp.int32)
    r4, c4 = mv16.shape[:2]
    Hp, Wp = refstack.shape[1:]
    cy = (jnp.arange(r4) * 4)[:, None]
    cx = (jnp.arange(c4) * 4)[None, :]
    ftab = jnp.asarray(_FTAB)

    def one_ref(ri):
        mvx = mv16[:, :, ri, 0] * mvsx
        mvy = mv16[:, :, ri, 1] * mvsy
        iy = cy + (mvy >> 4)
        ix = cx + (mvx >> 4)
        mx = mvx & 15
        my = mvy & 15
        # gather 11x11 patches, coordinate-clamped to the visible area
        rows = jnp.clip(iy[..., None] + jnp.arange(-3, 8), 0, h - 1)
        cols = jnp.clip(ix[..., None] + jnp.arange(-3, 8), 0, w - 1)
        # gather via flat indexing on the stacked planes
        base = refsel[:, :, ri] * (Hp * Wp)
        flat = refstack.reshape(-1)
        idx = (base[..., None, None] + rows[..., :, None] * Wp
               + cols[..., None, :])
        patch = flat[idx]  # [r4, c4, 11, 11]
        tapsx = ftab[filt, mx]  # [r4, c4, 8]
        tapsy = ftab[filt, my]
        # h-pass -> [r4, c4, 11, 4]
        acc = jnp.zeros(patch.shape[:2] + (11, 4), jnp.int32)
        for k in range(8):
            acc = acc + tapsx[..., k, None, None] * patch[..., :, k:k + 4]
        tmp = jnp.clip((acc + 64) >> 7, 0, (1 << bpp) - 1)
        # v-pass -> [r4, c4, 4, 4]
        acc = jnp.zeros(patch.shape[:2] + (4, 4), jnp.int32)
        for k in range(8):
            acc = acc + tapsy[..., k, None, None] * tmp[..., k:k + 4, :]
        out = jnp.clip((acc + 64) >> 7, 0, (1 << bpp) - 1)
        return out

    p0 = one_ref(0)
    p1 = one_ref(1)
    out = jnp.where(comp[..., None, None], (p0 + p1 + 1) >> 1, p0)
    return out.transpose(0, 2, 1, 3).reshape(r4 * 4, c4 * 4)


# ---------------------------------------------------------------------------
# scaled-reference MC (dynamic resize): per-pixel fractional stepping
#
# Reference: mc_luma_scaled / mc_chroma_scaled (vp9recon.c:492-628) and
# do_scaled_8tap_c / do_scaled_bilin_c (vp9dsp_template.c:2363-2500).
# In scaled mode the reference's MC call structure changes: every
# sub-8x8 block becomes four 4x4 quadrant calls (vp9_mc_template.c
# `#if SCALED == 0` guards), the MV is clamped against the parent
# block's position, and with subsampling the phase uses the libvpx-820
# formula. Phase stepping is anchored at each CALL's corner; the
# per-pixel closed form of the C loop's accumulation is
#   total(k) = mx0 + k*step;  offset(k) = total >> 4;  phase = total & 15
# which lets every 4x4 cell be computed independently given its call
# anchor. Each cell gathers a 16x16 source patch (worst case: step <=
# 32 i.e. 2x downscale, so a cell spans <= 6 source px + 8 taps).


def _mulshift14(a, b):
    """Exact (a * b) >> 14 for |a| < 2**24, 0 <= b < 2**15 without
    overflowing int32 (the reference casts to int64, vp9recon.c:508)."""
    hi = a >> 16
    lo = a & 0xFFFF
    return hi * b * 4 + ((lo * b) >> 14)


def _mc_ref_scaled(refstack, mvraw, refsel, filt, ay, ax, by, bx, pw, ph,
                   scales, steps, refw, refh, cols, rows, bpp, ri,
                   ss_x, ss_y, sx0=0):
    """Scaled MC for one reference direction -> [r4, c4, 4, 4] int32.

    mvraw: RAW 1/8-pel MV grid for this plane (mv4 / uvmv4).
    ay/ax: per-cell call anchor (this plane's px); by/bx, pw/ph: parent
    block corner and span (this plane's px) for the MV clamp.
    scales/steps: [3, 2] per-ref-slot 14-bit scale factors and 1/16-pel
    per-pixel steps; refw/refh: [3] visible plane dims per slot.
    sx0: this stripe's absolute plane-px offset (0 for the serial path;
    the sharded path passes the stripe origin so the closed-form
    per-pixel stepping works in frame coordinates while the cell grid
    stays stripe-local)."""
    r4, c4 = refsel.shape[:2]
    Hp, Wp = refstack.shape[1:]
    ftab = jnp.asarray(_FTAB)
    sel = refsel[:, :, ri]
    scx = scales[sel, 0]
    scy = scales[sel, 1]
    stx = steps[sel, 0]
    sty = steps[sel, 1]
    w = refw[sel]
    h = refh[sel]
    mvx = mvraw[:, :, ri, 0].astype(jnp.int32)
    mvy = mvraw[:, :, ri, 1].astype(jnp.int32)

    # MV clamp (vp9recon.c:505-506 luma, :574-589 chroma; bounds use the
    # parent block corner bx = x - px and span pw)
    def clamp(mv, b0, span, n8, ss):
        if ss:
            lo = -(b0 + span + 4) * 16
            hi = (n8 * 4 - b0 + 3) * 16
        else:
            lo = -(b0 + span + 4) * 8
            hi = (n8 * 8 - b0 + 3) * 8
        return jnp.clip(mv, lo, hi)

    mvx = clamp(mvx, bx, pw, cols, ss_x)
    mvy = clamp(mvy, by, ph, rows, ss_y)

    # scaled start position + initial phase (14-bit fixed point,
    # libvpx rounding; with subsampling the 820-bug formula)
    def start(mv, a0, sc, ss):
        if ss:
            return (_mulshift14(mv, sc) + (((a0 * sc) >> 10) & ~15)
                    + (((a0 * sc) >> 9) & 15))
        return _mulshift14(mv * 2, sc) + ((a0 * sc) >> 10)

    tx0 = start(mvx, ax, scx, ss_x)
    ty0 = start(mvy, ay, scy, ss_y)
    x0 = tx0 >> 4
    y0 = ty0 >> 4
    mx0 = tx0 & 15
    my0 = ty0 & 15

    # per-pixel totals within the cell (closed form of the C stepping)
    cy4 = (jnp.arange(r4) * 4)[:, None, None]
    cx4 = (jnp.arange(c4) * 4)[None, :, None] + sx0
    j4 = jnp.arange(4)[None, None, :]
    kx = cx4 + j4 - ax[:, :, None]          # pixel offset from call corner
    ky = cy4 + j4 - ay[:, :, None]
    txk = mx0[:, :, None] + kx * stx[:, :, None]
    tyk = my0[:, :, None] + ky * sty[:, :, None]
    offx = x0[:, :, None] + (txk >> 4)      # absolute source col per j
    offy = y0[:, :, None] + (tyk >> 4)
    phx = txk & 15
    phy = tyk & 15

    # 16x16 patch per cell, clamped to the ref's visible area
    base_r = offy[:, :, 0] - 3
    base_c = offx[:, :, 0] - 3
    rows_i = jnp.clip(base_r[..., None] + jnp.arange(16), 0,
                      h[..., None] - 1)
    cols_i = jnp.clip(base_c[..., None] + jnp.arange(16), 0,
                      w[..., None] - 1)
    flat = refstack.reshape(-1)
    idx = (sel[..., None, None] * (Hp * Wp)
           + rows_i[..., :, None] * Wp + cols_i[..., None, :])
    patch = flat[idx]                       # [r4, c4, 16, 16]

    maxp = (1 << bpp) - 1
    tapsx = ftab[filt[:, :, None], phx]     # [r4, c4, 4, 8]
    tapsy = ftab[filt[:, :, None], phy]
    relx = offx - offx[:, :, 0:1]           # [r4, c4, 4], 0..13
    rely = offy - offy[:, :, 0:1]
    # h-pass over all 16 patch rows -> tmp [r4, c4, 16, 4]
    acc = jnp.zeros((r4, c4, 16, 4), jnp.int32)
    for k in range(8):
        ck = jnp.broadcast_to((relx + k)[:, :, None, :],
                              (r4, c4, 16, 4))
        acc = acc + tapsx[:, :, None, :, k] * jnp.take_along_axis(
            patch, ck, axis=-1)
    tmp = jnp.clip((acc + 64) >> 7, 0, maxp)
    # v-pass with per-row phases -> [r4, c4, 4, 4]
    acc = jnp.zeros((r4, c4, 4, 4), jnp.int32)
    for t in range(8):
        rk = jnp.broadcast_to((rely + t)[:, :, :, None], (r4, c4, 4, 4))
        acc = acc + tapsy[:, :, :, t, None] * jnp.take_along_axis(
            tmp, rk, axis=-2)
    return jnp.clip((acc + 64) >> 7, 0, maxp)


def _mc_one_ref_unscaled(refstack, mv16, refsel, filt, w, h, bpp, ri):
    """One reference direction of _mc_cells (same math, per-slot clamp
    dims passed as traced arrays) -> [r4, c4, 4, 4]."""
    r4, c4 = refsel.shape[:2]
    Hp, Wp = refstack.shape[1:]
    cy = (jnp.arange(r4) * 4)[:, None]
    cx = (jnp.arange(c4) * 4)[None, :]
    ftab = jnp.asarray(_FTAB)
    sel = refsel[:, :, ri]
    mvx = mv16[:, :, ri, 0]
    mvy = mv16[:, :, ri, 1]
    iy = cy + (mvy >> 4)
    ix = cx + (mvx >> 4)
    mx = mvx & 15
    my = mvy & 15
    rows = jnp.clip(iy[..., None] + jnp.arange(-3, 8), 0,
                    h[sel][..., None] - 1)
    cols = jnp.clip(ix[..., None] + jnp.arange(-3, 8), 0,
                    w[sel][..., None] - 1)
    flat = refstack.reshape(-1)
    idx = (sel[..., None, None] * (Hp * Wp) + rows[..., :, None] * Wp
           + cols[..., None, :])
    patch = flat[idx]
    tapsx = ftab[filt, mx]
    tapsy = ftab[filt, my]
    maxp = (1 << bpp) - 1
    acc = jnp.zeros(patch.shape[:2] + (11, 4), jnp.int32)
    for k in range(8):
        acc = acc + tapsx[..., k, None, None] * patch[..., :, k:k + 4]
    tmp = jnp.clip((acc + 64) >> 7, 0, maxp)
    acc = jnp.zeros(patch.shape[:2] + (4, 4), jnp.int32)
    for k in range(8):
        acc = acc + tapsy[..., k, None, None] * tmp[..., k:k + 4, :]
    return jnp.clip((acc + 64) >> 7, 0, maxp)


@partial(jax.jit, static_argnames=("bpp", "mvsx", "mvsy", "ss_x", "ss_y"))
def _mc_cells_mixed(refstack, mvraw, refsel, comp, filt, ay, ax, by, bx,
                    pw, ph, scales, steps, refw, refh, scale_nz, cols,
                    rows, bpp, mvsx, mvsy, ss_x, ss_y, x0=0):
    """MC for frames with scaled references: per cell and per reference
    direction, same-size refs take the unscaled path and resized refs
    the scaled path (the reference's per-ref dispatch,
    vp9recon.c:503-504 dims check). x0: stripe plane-px offset (the
    sharded path; 0 serial)."""
    mvraw = mvraw.astype(jnp.int32)
    refsel = refsel.astype(jnp.int32)
    filt = filt.astype(jnp.int32)
    comp = comp.astype(bool)
    mv16 = mvraw.at[..., 0].multiply(mvsx).at[..., 1].multiply(mvsy)
    mv16 = mv16.at[..., 0].add(x0 * 16)

    def one_ref(ri):
        un = _mc_one_ref_unscaled(refstack, mv16, refsel, filt, refw,
                                  refh, bpp, ri)
        sc = _mc_ref_scaled(refstack, mvraw, refsel, filt, ay, ax, by,
                            bx, pw, ph, scales, steps, refw, refh, cols,
                            rows, bpp, ri, ss_x, ss_y, sx0=x0)
        use_sc = scale_nz[refsel[:, :, ri]]
        return jnp.where(use_sc[..., None, None], sc, un)

    p0 = one_ref(0)
    p1 = one_ref(1)
    out = jnp.where(comp[..., None, None], (p0 + p1 + 1) >> 1, p0)
    r4, c4 = refsel.shape[:2]
    return out.transpose(0, 2, 1, 3).reshape(r4 * 4, c4 * 4)


@partial(jax.jit, static_argnames=("r4", "c4", "ss_h", "ss_v"))
def _scaled_anchor_grids(recs, r4, c4, ss_h, ss_v):
    """Per-cell call anchors and parent-block clamp geometry for the
    scaled MC call structure (every sub-8x8 block = four 4x4 quadrant
    calls; chroma quadrant-split only along non-subsampled axes)."""
    recs = recs.astype(jnp.int32)
    N = recs.shape[0]
    row, col, bs = recs[:, 0], recs[:, 1], recs[:, 3]
    valid = bs >= 0
    bwh = jnp.asarray(np.asarray(T.BWH_TAB[1], np.int32))
    bsc = jnp.clip(bs, 0, 12)
    w4 = jnp.where(valid, bwh[bsc, 0] * 2, 0)
    h4 = jnp.where(valid, bwh[bsc, 1] * 2, 0)
    r0, c0 = row * 2, col * 2
    dy = jnp.arange(16)
    inb = ((dy[None, :, None] < h4[:, None, None])
           & (dy[None, None, :] < w4[:, None, None]))
    big = jnp.int32(1 << 20)
    rr = jnp.where(inb, r0[:, None, None] + dy[None, :, None], big)
    cc = jnp.where(inb, c0[:, None, None] + dy[None, None, :], big)
    n = jnp.arange(N, dtype=jnp.int32)
    bidx = jnp.full((r4, c4), -1, jnp.int32)
    bidx = bidx.at[rr, cc].max(
        jnp.broadcast_to(n[:, None, None], (N, 16, 16)), mode="drop")

    sub8 = recs[bidx, 3] > 9
    brow = recs[bidx, 0] * 8        # parent corner, luma px
    bcol = recs[bidx, 1] * 8
    celldy = (jnp.arange(r4)[:, None] - recs[bidx, 0] * 2) & 1
    celldx = (jnp.arange(c4)[None, :] - recs[bidx, 1] * 2) & 1
    ay = brow + jnp.where(sub8, celldy * 4, 0)
    ax = bcol + jnp.where(sub8, celldx * 4, 0)
    bsx = jnp.clip(recs[bidx, 3], 0, 12)
    pw = bwh[bsx, 0] * 8            # parent span, luma px
    ph = bwh[bsx, 1] * 8

    # chroma (one entry per uv cell)
    sv, sh = 1 << ss_v, 1 << ss_h
    bidx_uv = bidx[::sv, ::sh]
    sub8u = recs[bidx_uv, 3] > 9
    browu = (recs[bidx_uv, 0] * 8) >> ss_v
    bcolu = (recs[bidx_uv, 1] * 8) >> ss_h
    r4u, c4u = r4 >> ss_v, c4 >> ss_h
    udy = jnp.clip(jnp.arange(r4u)[:, None] - ((recs[bidx_uv, 0] * 2)
                                               >> ss_v), 0, 1)
    udx = jnp.clip(jnp.arange(c4u)[None, :] - ((recs[bidx_uv, 1] * 2)
                                               >> ss_h), 0, 1)
    ayu = browu + jnp.where(sub8u & (ss_v == 0), udy * 4, 0)
    axu = bcolu + jnp.where(sub8u & (ss_h == 0), udx * 4, 0)
    bsu = jnp.clip(recs[bidx_uv, 3], 0, 12)
    pwu = (bwh[bsu, 0] * 8) >> ss_h
    phu = (bwh[bsu, 1] * 8) >> ss_v
    return (ay, ax, brow, bcol, pw, ph,
            ayu, axu, browu, bcolu, pwu, phu)


# ---------------------------------------------------------------------------
# intra wavefront


def _build_intra_schedule(s, plane_idx):
    """Host: per-tx-block entries with dependency levels.

    Returns list of levels; each level is a dict sz -> list of entries
    (py, px, mode_final, is_tm, eidx[ne], emask[ne], econst[ne]).
    """
    from ..codecs.vp9.golden import MODE_CONV, EDGES
    h = s.header
    bpp = h.bpp
    base = 128 << (bpp - 8)
    ss_h = h.ss_h if plane_idx else 0
    ss_v = h.ss_v if plane_idx else 0
    plane_shape = s.cur_frame_obj.planes[plane_idx].shape
    Wp = plane_shape[1]
    r4 = plane_shape[0] // 4
    c4 = Wp // 4
    LW = np.zeros((r4 + 8, c4 + 8), np.int32)
    levels = []

    recs = getattr(s, "block_records", None)
    if recs is not None:
        # native pass A: filter intra blocks in numpy, skip Block objects
        intra_iter = (
            (int(r[0]), int(r[1]), int(r[2]), int(r[3]), int(r[7]),
             int(r[8]),
             (int(r[9]), int(r[10]), int(r[11]), int(r[12])), int(r[13]))
            for r in recs[recs[:, 6] != 0])
    else:
        intra_iter = ((row, col, tcs, b.bs, b.tx, b.uvtx, b.mode,
                       b.uvmode)
                      for row, col, tcs, b in s.blocks if b.intra)
    for row, col, tcs, bbs, btx, buvtx, bmode, buvmode in intra_iter:
        if plane_idx == 0:
            w4 = int(T.BWH_TAB[1, bbs, 0]) << 1
            h4 = int(T.BWH_TAB[1, bbs, 1]) << 1
            end_x = min(2 * (s.cols - col), w4)
            end_y = min(2 * (s.rows - row), h4)
            tx = btx
        else:
            w4 = (int(T.BWH_TAB[1, bbs, 0]) << 1) >> ss_h
            h4 = (int(T.BWH_TAB[1, bbs, 1]) << 1) >> ss_v
            end_x = min(2 * (s.cols - col), int(T.BWH_TAB[1, bbs, 0]) << 1
                        ) >> ss_h
            end_y = min(2 * (s.rows - row), int(T.BWH_TAB[1, bbs, 1]) << 1
                        ) >> ss_v
            tx = buvtx
        step = 1 << tx
        sz = 4 << tx
        for y in range(0, end_y, step):
            for x in range(0, end_x, step):
                if plane_idx == 0:
                    mode = bmode[y * 2 + x if (bbs > 9 and tx == 0)
                                 else 0]
                    py = row * 8 + y * 4
                    px = col * 8 + x * 4
                    have_top = row > 0 or y > 0
                    have_left = col > tcs or x > 0
                    have_right = x < w4 - 1
                    n_have_top = ((s.cols - col) * 2 - x) * 4
                    n_have_left = ((s.rows - row) * 2 - y) * 4
                else:
                    mode = buvmode
                    py = ((row * 8) >> ss_v) + y * 4
                    px = ((col * 8) >> ss_h) + x * 4
                    have_top = row > 0 or y > 0
                    have_left = col > tcs or x > 0
                    have_right = x < w4 - 1
                    n_have_top = (((s.cols - col) << (0 if ss_h else 1))
                                  - x) * 4
                    n_have_left = (((s.rows - row) << (0 if ss_v else 1))
                                   - y) * 4
                m = MODE_CONV[mode][1 if have_left else 0][
                    1 if have_top else 0]
                # dependency level from read cells
                cy0, cx0 = py // 4, px // 4
                k = sz // 4
                lvl = 0
                if have_top:
                    lvl = max(lvl, LW[cy0 - 1 if cy0 else 0,
                                      max(cx0 - 1, 0):cx0 + 2 * k].max()
                              if cy0 else 0)
                if have_left and cx0:
                    lvl = max(lvl, LW[cy0:cy0 + k, cx0 - 1].max())
                lvl += 1
                LW[cy0:cy0 + k, cx0:cx0 + k] = lvl
                while len(levels) < lvl:
                    levels.append({})
                levels[lvl - 1].setdefault(sz, []).append(
                    (py, px, m, int(have_top), int(have_left),
                     int(have_right), n_have_top, n_have_left))
    return levels


def _intra_flat_native(s, plane_idx):
    """The native scheduler's flat (entries, (level, sz) keys) output,
    or None when unavailable."""
    if getattr(s, "use_native", False) \
            and getattr(s, "block_records", None) is not None:
        from ..passa_native import intra_schedule_native
        plane_shape = s.cur_frame_obj.planes[plane_idx].shape
        r4 = plane_shape[0] // 4
        c4 = plane_shape[1] // 4
        return intra_schedule_native(s, plane_idx, r4, c4)
    return None


def _build_intra_schedule_fast(s, plane_idx):
    """Native (C) schedule build when block records exist; same levels
    structure as _build_intra_schedule (entries grouped by dependency
    level then size — blocks within a level are independent, so the
    size order within a level is free)."""
    if True:
        res = _intra_flat_native(s, plane_idx)
        if res is not None:
            ents, keys = res
            if not len(ents):
                return []
            order = np.lexsort((keys[:, 1], keys[:, 0]))
            ents = ents[order]
            keys = keys[order]
            change = np.empty(len(keys), bool)
            change[0] = True
            change[1:] = (keys[1:] != keys[:-1]).any(axis=1)
            starts = np.nonzero(change)[0]
            ends = np.append(starts[1:], len(keys))
            levels = []
            for a, b in zip(starts, ends):
                lvl, sz = int(keys[a, 0]), int(keys[a, 1])
                while len(levels) < lvl:
                    levels.append({})
                levels[lvl - 1][sz] = ents[a:b]
            return levels
    return _build_intra_schedule(s, plane_idx)


# EDGES flags per converted mode: needs_left, needs_top, needs_tl,
# needs_tr (reference: vp9recon.c:71-97)
def _edges_arr():
    from ..codecs.vp9.golden import EDGES
    arr = np.zeros((15, 4), np.int32)
    for m, fl in EDGES.items():
        arr[m] = fl[:4]
    return arr


_EDGES_ARR = _edges_arr()


def _edge_spec_dev(ent, sz, Wp, bpp):
    """Device edge-vector gather spec from compact entries.

    ent: [N, 8] int32 (py, px, m, have_top, have_left, have_right,
    n_have_top, n_have_left). Returns (idx [N, ne], cmask, cval)
    implementing check_intra_mode's edge assembly exactly as the former
    host _edge_spec (reference: vp9recon.c:98-217)."""
    py, px, m, ht, hl, hr, nht, nhl = (ent[:, i][:, None]
                                       for i in range(8))
    base = 128 << (bpp - 8)
    ta = 2 * sz if sz == 4 else sz
    ne = it.edge_len(sz)
    ED = jnp.asarray(_EDGES_ARR)
    msel = jnp.clip(m, 0, 14)
    needs_left = ED[msel[:, 0], 0][:, None] != 0
    needs_top = ED[msel[:, 0], 1][:, None] != 0
    needs_tl = ED[msel[:, 0], 2][:, None] != 0
    needs_tr = ED[msel[:, 0], 3][:, None] != 0
    ht = ht != 0
    hl = hl != 0
    hr = hr != 0

    j = jnp.arange(ne)[None, :]
    idx = jnp.zeros((ent.shape[0], ne), jnp.int32)
    cmask = jnp.ones((ent.shape[0], ne), bool)
    cval = jnp.zeros((ent.shape[0], ne), jnp.int32)

    # top entries 1..ta (the first sz are real pixels clamped by
    # n_have_top; for sz==4 entries 5..8 are the top-right zone)
    i = j - 1
    in_main = (j >= 1) & (i < sz)
    src = jnp.minimum(i, nht - 1)
    top_idx = (py - 1) * Wp + px + src
    sel = needs_top & ht & in_main
    idx = jnp.where(sel, top_idx, idx)
    cmask = jnp.where(sel, False, cmask)
    if sz == 4:
        in_tr = (j >= 5) & (j <= 8)
        tr_real = hr & (nht >= sz + 4)
        idx4 = ((py - 1) * Wp + px
                + jnp.minimum(jnp.int32(3), nht - 1))  # entry 4's pixel
        tr_idx = jnp.where(tr_real, (py - 1) * Wp + px + 4 + (j - 5),
                           idx4)
        sel = needs_top & ht & needs_tr & in_tr
        idx = jnp.where(sel, tr_idx, idx)
        cmask = jnp.where(sel, False, cmask)
    in_top = (j >= 1) & (j <= ta)
    sel = needs_top & ~ht & in_top
    cval = jnp.where(sel, base - 1, cval)
    # topleft entry 0
    is0 = j == 0
    sel = needs_tl & hl & ht & is0
    idx = jnp.where(sel, (py - 1) * Wp + px - 1, idx)
    cmask = jnp.where(sel, False, cmask)
    sel = needs_tl & ~(hl & ht) & is0
    cval = jnp.where(sel, base + jnp.where(ht, 1, -1), cval)
    # left entries off..off+sz-1 (canonical bottom-up; shortage rows
    # replicate the oldest available row)
    off = 1 + ta
    r = j - off
    in_left = (r >= 0) & (r < sz)
    npx = jnp.minimum(jnp.int32(sz), nhl)
    i_eff = jnp.where(r >= sz - npx, sz - 1 - r, npx - 1)
    left_idx = (py + i_eff) * Wp + px - 1
    sel = needs_left & hl & in_left
    idx = jnp.where(sel, left_idx, idx)
    cmask = jnp.where(sel, False, cmask)
    sel = needs_left & ~hl & in_left
    cval = jnp.where(sel, base + 1, cval)
    # constants
    cval = jnp.where(j == off + sz, base, cval)
    cval = jnp.where(j == off + sz + 1, 1, cval)
    idx = jnp.where(cmask, 0, idx)
    return idx, cmask, cval


def _intra_batch_apply(plane, residual, d, sz, bpp):
    """Predict + residual-add + scatter one batch of same-size tx blocks.
    d: dict with eidx/emask/econst [N, ne], modes/pys/pxs [N]."""
    maxp = (1 << bpp) - 1
    flat = plane.reshape(-1)
    e = jnp.where(d["emask"], d["econst"], flat[d["eidx"]])
    Wall = jnp.asarray(it.build_all(sz), jnp.float32)  # [15, ne, P]
    Wsel = Wall[d["modes"]]
    # 8-bit edge pixels are exactly representable in bf16 (8-bit
    # mantissa), so the MXU default precision is exact; 10/12-bit
    # pixels are not — force full-f32 multiplies there
    prec = jax.lax.Precision.HIGHEST if bpp > 8 else None
    pred = jnp.floor((jnp.einsum(
        "ne,nep->np", e.astype(jnp.float32), Wsel,
        preferred_element_type=jnp.float32, precision=prec) + 32)
        / 64).astype(jnp.int32)
    pred = pred.reshape(-1, sz, sz)
    # TM special: clip(top[x] + left[sz-1-y] - tl)
    ta = 2 * sz if sz == 4 else sz
    tl = e[:, 0][:, None, None]
    top = e[:, 1:1 + sz][:, None, :]
    left = e[:, 1 + ta:1 + ta + sz][:, ::-1][:, :, None]
    tm = jnp.clip(top + left - tl, 0, maxp)
    pred = jnp.where((d["modes"] == 9)[:, None, None], tm, pred)
    rr = d["pys"][:, None, None] + jnp.arange(sz)[None, :, None]
    cc = d["pxs"][:, None, None] + jnp.arange(sz)[None, None, :]
    res = residual[rr, cc]
    out = jnp.clip(pred + res, 0, maxp)
    return plane.at[rr, cc].set(out, mode="drop")


def _pad_to_bucket(n, base=8, mult=4):
    """Coarse shape buckets to bound jit-compile variety."""
    b = base
    while b < n:
        b *= mult
    return b


@partial(jax.jit, static_argnames=("sizes", "caps", "bpp"),
         donate_argnums=(0,))
def _intra_scan(plane, residual, packed, L, sizes, caps, bpp):
    """The whole intra wavefront of one plane in ONE dispatch.

    packed is laid out as per-size slabs of L levels x cap rows each:
    rows for size sizes[s] of level i live at
    [L*sum(caps[:s]) + i*caps[s], caps[s]). Rows are [py, px, m,
    have_top, have_left, have_right, n_have_top, n_have_left] int16;
    unused slots hold inert rows (oob py/px -> scatter-dropped). A
    fori_loop with a *traced* trip count walks the dependency levels,
    so every frame of a given {sizes, caps, buffer-bucket} shape shares
    one executable regardless of its level count."""
    def body(i, pl):
        base = 0
        for sz, cap in zip(sizes, caps):
            sl = jax.lax.dynamic_slice(
                packed, (base + i * cap, 0), (cap, 8)).astype(jnp.int32)
            eidx, emask, econst = _edge_spec_dev(sl, sz, pl.shape[1],
                                                 bpp)
            d = {"eidx": eidx, "emask": emask, "econst": econst,
                 "modes": sl[:, 2], "pys": sl[:, 0], "pxs": sl[:, 1]}
            pl = _intra_batch_apply(pl, residual, d, sz, bpp)
            base = base + L * cap
        return pl
    return jax.lax.fori_loop(0, L, body, plane)


def pack_intra_slab_flat(ents, keys, Hp, Wp):
    """Vectorized slab pack straight from the native scheduler's flat
    (entries [n, 8], keys [n, 2] = (level, sz)) output. Produces
    byte-identical slabs to pack_intra_slab on the same schedule —
    within a (level, size) group both keep the native emission order —
    but without the per-level dict walk, which costs ~6.5 ms/frame on
    dense random 1080p content (recon.intra_pack)."""
    if not len(ents):
        return None
    # sort by (sz, level); np.lexsort is stable so within-group order
    # (the native emission order) is preserved
    order = np.lexsort((keys[:, 0], keys[:, 1]))
    e = ents[order]
    lvls = keys[order, 0].astype(np.int64)
    szs = keys[order, 1]
    L = int(lvls.max())
    sizes = tuple(int(v) for v in np.unique(szs))
    caps = []
    for sz in sizes:
        cnt = np.bincount(lvls[szs == sz], minlength=L + 1)[1:]
        caps.append(_pad_to_bucket(int(cnt.max()), base=8, mult=2))
    caps = tuple(caps)
    tot = _pad_to_bucket(L * sum(caps), base=64, mult=2)
    buf = np.zeros((tot, 8), np.int16)
    buf[:, 0] = Hp + 64
    buf[:, 1] = Wp + 64
    buf[:, 2] = 2  # DC
    buf[:, 6:8] = 1
    dest = np.empty(len(e), np.int64)
    base = 0
    pos = 0
    for sz, cap in zip(sizes, caps):
        m = szs == sz
        lv = lvls[m]
        n = int(m.sum())
        idx = np.arange(n)
        change = np.empty(n, bool)
        change[0] = True
        change[1:] = lv[1:] != lv[:-1]
        gstart = np.maximum.accumulate(np.where(change, idx, 0))
        dest[pos:pos + n] = base + (lv - 1) * cap + (idx - gstart)
        pos += n
        base += L * cap
    buf[dest] = e
    return buf, L, sizes, caps


def pack_intra_slab(levels, Hp, Wp):
    """Host-side half of the intra wavefront: pack the dependency
    levels into one [tot, 8] int16 slab (per-size [L, cap] sections).
    Pure function of the schedule, so the precompute worker thread runs
    it off the critical path; U and V share one slab (same schedule).
    Returns (buf, L, sizes, caps) or None when the plane has no intra
    blocks."""
    L = len(levels)
    maxn = {}
    for lvl in levels:
        for sz, entries in lvl.items():
            n = len(entries)
            if n:
                maxn[sz] = max(maxn.get(sz, 0), n)
    if not maxn:
        return None
    sizes = tuple(sorted(maxn))
    caps = tuple(_pad_to_bucket(maxn[sz], base=8, mult=2)
                 for sz in sizes)
    tot = _pad_to_bucket(L * sum(caps), base=64, mult=2)
    buf = np.zeros((tot, 8), np.int16)
    # inert rows: oob py/px (scatter-dropped), consts-only edges
    # (no gathers), valid clamp inputs
    buf[:, 0] = Hp + 64
    buf[:, 1] = Wp + 64
    buf[:, 2] = 2  # DC
    buf[:, 6:8] = 1
    base = 0
    for sz, cap in zip(sizes, caps):
        for i, lvl in enumerate(levels):
            entries = lvl.get(sz)
            if entries is not None and len(entries):
                o = base + i * cap
                buf[o:o + len(entries)] = entries
        base += L * cap
    return buf, L, sizes, caps


def run_intra_plane(s, plane_dev, residual_dev, levels, slab=None,
                    slab_dev=None):
    """Run the intra wavefront: ONE upload + ONE dispatch per plane.

    The former per-(level, size) dispatch loop cost ~45 host dispatches
    per frame (~0.06 ms each, ~2.8 ms/frame; a 1080p keyframe alone is
    ~120 levels). All levels are packed host-side into per-size
    [L, cap] slabs in a single buffer and the level loop runs on device
    (_intra_scan). cap buckets are per-size maxima so the executable
    cache converges after a few frames. slab: prepacked
    pack_intra_slab result (else packed here); slab_dev: the slab
    buffer already on device (U's upload reused by V)."""
    bpp = s.header.bpp
    if slab is None:
        with metrics.timer("intra.pack"):
            slab = pack_intra_slab(levels, *plane_dev.shape)
    if slab is None:
        return plane_dev, None
    buf, L, sizes, caps = slab
    if slab_dev is None:
        with metrics.timer("intra.upload"):
            slab_dev = jnp.asarray(buf)
    metrics.add("intra.ncalls", 1)
    metrics.add("intra.nrows", buf.shape[0])
    with metrics.timer("intra.level_dispatch"):
        plane_dev = _intra_scan(plane_dev, residual_dev, slab_dev, L,
                                sizes, caps, bpp)
    return plane_dev, slab_dev


# ---------------------------------------------------------------------------
# device-side metadata splat
#
# The host->device link has flaky bandwidth (2-900 ms for 1-2 MB), so the
# per-4x4-cell metadata grids are NOT uploaded. Instead the compact
# per-block records from pass A (~72 B/block, one block per leaf) ship,
# and the dense grids are rebuilt on device: a scatter assigns each cell
# its covering record index (leaves never overlap), then every grid is a
# gather of record fields. This mirrors the host splat in
# decoder.record_block / native vp9_entropy_main.h:90-165 exactly,
# including the sub-8x8 chroma MV averaging rules and the libvpx 4:2:2
# bug (vp9_mc_template.c:107-114).


def _rdiv2_jnp(s):
    """ROUNDED_DIV(a+b, 2) with C round-half-away-from-zero."""
    return jnp.where(s >= 0, (s + 1) // 2, -((-s + 1) // 2))


def _rdiv4_jnp(s):
    return jnp.where(s >= 0, (s + 2) // 4, -((-s + 2) // 4))


@partial(jax.jit, static_argnames=("r4", "c4", "ss_h", "ss_v"))
def _grids_from_records(recs, r4, c4, ss_h, ss_v):
    """recs: [N, 36] int16 block records (pad rows have bs == -1; the
    LAST row must always be a pad row). Returns the dense per-cell grids
    for the Y plane ([r4, c4]) and the chroma planes ([r4u, c4u])."""
    recs = recs.astype(jnp.int32)
    N = recs.shape[0]
    row, col, bs = recs[:, 0], recs[:, 1], recs[:, 3]
    valid = bs >= 0
    bwh = jnp.asarray(np.asarray(T.BWH_TAB[1], np.int32))  # [13,2] 8px units
    bsc = jnp.clip(bs, 0, 12)
    w4 = jnp.where(valid, bwh[bsc, 0] * 2, 0)   # cells (4px units)
    h4 = jnp.where(valid, bwh[bsc, 1] * 2, 0)
    r0, c0 = row * 2, col * 2

    dy = jnp.arange(16)
    inb = ((dy[None, :, None] < h4[:, None, None])
           & (dy[None, None, :] < w4[:, None, None]))
    big = jnp.int32(1 << 20)
    rr = jnp.where(inb, r0[:, None, None] + dy[None, :, None], big)
    cc = jnp.where(inb, c0[:, None, None] + dy[None, None, :], big)
    n = jnp.arange(N, dtype=jnp.int32)
    bidx = jnp.full((r4, c4), -1, jnp.int32)
    bidx = bidx.at[rr, cc].max(
        jnp.broadcast_to(n[:, None, None], (N, 16, 16)), mode="drop")
    # uncovered cells wrap to recs[-1] (a pad row, bs == -1)

    def g(f, b=bidx):
        return recs[b, f]

    covered = g(3) >= 0
    intra = (g(6) != 0) & covered
    inter4 = (g(6) == 0) & covered
    txsz4 = g(7)
    # per-cell quadrant (sub-8x8 leaves are exactly 2x2 cells)
    celldy = (jnp.arange(r4)[:, None] - g(0) * 2) & 1
    celldx = (jnp.arange(c4)[None, :] - g(1) * 2) & 1
    q = celldy * 2 + celldx
    sub8 = g(3) > 9
    q_eff = jnp.where(sub8 & (txsz4 == 0), q, 0)
    mode_cell = recs[bidx, 9 + q_eff]
    itt = jnp.asarray(np.asarray(T.INTRA_TXFM_TYPE, np.int32))
    txtype4 = jnp.where(intra, itt[jnp.clip(mode_cell, 0, 13)], 0)
    comp4 = (g(14) != 0) & inter4
    filter4 = g(17)
    refsel = jnp.stack([jnp.clip(g(15), 0, 2),
                        jnp.clip(jnp.where(comp4, g(16), 0), 0, 2)], -1)
    # luma MV per cell: quadrant for sub-8x8, else mv[0]
    qmv = jnp.where(sub8, q, 0)
    mv16 = jnp.stack([
        jnp.stack([recs[bidx, 18 + qmv * 4], recs[bidx, 19 + qmv * 4]], -1),
        jnp.stack([recs[bidx, 20 + qmv * 4], recs[bidx, 21 + qmv * 4]], -1),
    ], -2)  # [r4, c4, 2(ref), 2(xy)]

    # ---- chroma ----
    sv, sh = 1 << ss_v, 1 << ss_h
    bidx_uv = bidx[::sv, ::sh]
    uvtx4 = recs[bidx_uv, 8]
    inter4uv = (recs[bidx_uv, 6] == 0) & (recs[bidx_uv, 3] >= 0)
    comp_uv = (recs[bidx_uv, 14] != 0) & inter4uv
    filt_uv = recs[bidx_uv, 17]
    refsel_uv = jnp.stack([
        jnp.clip(recs[bidx_uv, 15], 0, 2),
        jnp.clip(jnp.where(comp_uv, recs[bidx_uv, 16], 0), 0, 2)], -1)

    # per-record 2x2 uv-cell MV table V[N, dy, dx, ref, xy], replicating
    # decoder._splat_sub8x8_mv (reference: vp9_mc_template.c:24-230)
    m = [[jnp.stack([recs[:, 18 + qq * 4 + ri * 2],
                     recs[:, 19 + qq * 4 + ri * 2]], -1)
          for ri in range(2)] for qq in range(4)]  # m[q][ri] -> [N, 2]

    def per_ref(ri):
        m0, m1, m2, m3 = m[0][ri], m[1][ri], m[2][ri], m[3][ri]
        a02 = _rdiv2_jnp(m0 + m2)
        a01 = _rdiv2_jnp(m0 + m1)
        a13 = _rdiv2_jnp(m1 + m3)
        a12 = _rdiv2_jnp(m1 + m2)
        a0123 = _rdiv4_jnp(m0 + m1 + m2 + m3)
        bsr = bs[:, None]
        # defaults (bs <= 9): every uv cell uses mv[0]
        V = [[m0, m0], [m0, m0]]
        if ss_v:
            top_l = jnp.where(bsr == 10, a02,
                              jnp.where(bsr == 11, a01 if ss_h else m0,
                                        jnp.where(bsr == 12,
                                                  a0123 if ss_h else a02,
                                                  m0)))
            top_r = jnp.where(bsr == 10, a02,
                              jnp.where(bsr == 11, m1,
                                        jnp.where(bsr == 12, a13, m0)))
            V = [[top_l, top_r], [top_l, top_r]]
        else:
            if ss_h:
                # 4:2:2: BS_4x4 bottom uses avg(mv1, mv2) (libvpx bug)
                tl = jnp.where(bsr == 10, m0,
                               jnp.where(bsr == 11, a01,
                                         jnp.where(bsr == 12, a01, m0)))
                bl = jnp.where(bsr == 10, a02,
                               jnp.where(bsr == 11, a01,
                                         jnp.where(bsr == 12, a12, m0)))
                V = [[tl, tl], [bl, bl]]
            else:
                tl = m0
                tr = jnp.where(bsr == 11, m1,
                               jnp.where(bsr == 12, m1, m0))
                bl = jnp.where(bsr == 10, m2,
                               jnp.where(bsr == 12, m2, m0))
                br = jnp.where(bsr == 10, m2,
                               jnp.where(bsr == 11, m1,
                                         jnp.where(bsr == 12, m3, m0)))
                V = [[tl, tr], [bl, br]]
        return jnp.stack([jnp.stack(Vr, 0) for Vr in V], 0)  # [2,2,N,2]

    Vt = jnp.stack([per_ref(0), per_ref(1)], -2)  # [2, 2, N, 2(ref), 2(xy)]
    r4u, c4u = r4 >> ss_v, c4 >> ss_h
    ur0 = (recs[bidx_uv, 0] * 2) >> ss_v
    uc0 = (recs[bidx_uv, 1] * 2) >> ss_h
    udy = jnp.clip(jnp.arange(r4u)[:, None] - ur0, 0, 1)
    udx = jnp.clip(jnp.arange(c4u)[None, :] - uc0, 0, 1)
    uvmv = Vt[udy, udx, bidx_uv]  # [r4u, c4u, 2, 2]

    return (inter4, txsz4, txtype4, comp4, filter4, refsel, mv16,
            inter4uv, uvtx4, jnp.zeros_like(uvtx4), comp_uv, filt_uv,
            refsel_uv, uvmv)


def _records_from_blocks(s):
    """Synthesize the native record array from Python Block objects
    (pure-Python pass A path)."""
    n = len(s.blocks)
    recs = np.zeros((n, 36), np.int16)
    for i, (row, col, tcs, b) in enumerate(s.blocks):
        r = recs[i]
        r[0], r[1], r[2] = row, col, tcs
        r[3], r[4], r[5] = b.bs, b.seg_id, b.skip
        r[6], r[7], r[8] = b.intra, b.tx, b.uvtx
        r[9:13] = b.mode
        r[13], r[14] = b.uvmode, b.comp
        r[15], r[16], r[17] = b.ref[0], b.ref[1], b.filter
        for qq in range(4):
            r[18 + qq * 4] = b.mv[qq][0][0]
            r[19 + qq * 4] = b.mv[qq][0][1]
            r[20 + qq * 4] = b.mv[qq][1][0]
            r[21 + qq * 4] = b.mv[qq][1][1]
    return recs


def _pack_records(s):
    """Bucket-padded record array (pad rows have bs=-1; at least one)."""
    recs = s.block_records
    if recs is None:
        recs = _records_from_blocks(s)
    n = len(recs)
    nb = _pad_to_bucket(n + 1, base=256, mult=2)
    out = np.zeros((nb, 36), np.int16)
    out[:n] = recs[:, :36]
    out[n:, 3] = -1
    return out


# ---------------------------------------------------------------------------
# frame orchestration


@partial(jax.jit, static_argnames=("H", "W"))
def _scatter_pairs16(pv, H, W):
    """Rebuild a dense int16 [H, W] array from (pos-hi, pos-lo, value)
    int16 triples (pad rows have pos-hi < 0 -> dropped)."""
    pos = ((pv[:, 0].astype(jnp.int32) << 16)
           | (pv[:, 1].astype(jnp.int32) & 0xffff))
    pos = jnp.where(pos < 0, jnp.int32(1 << 30), pos)
    out = jnp.zeros((H * W,), jnp.int16).at[pos].set(pv[:, 2],
                                                     mode="drop")
    return out.reshape(H, W)


@partial(jax.jit, static_argnames=("H", "W"))
def _scatter_pairs32(pv, H, W):
    """Wide variant for 10/12-bit dctcoefs (int32 values shipped as hi/lo
    int16 halves): rows are (pos-hi, pos-lo, val-hi, val-lo)."""
    pos = ((pv[:, 0].astype(jnp.int32) << 16)
           | (pv[:, 1].astype(jnp.int32) & 0xffff))
    pos = jnp.where(pos < 0, jnp.int32(1 << 30), pos)
    val = ((pv[:, 2].astype(jnp.int32) << 16)
           | (pv[:, 3].astype(jnp.int32) & 0xffff))
    out = jnp.zeros((H * W,), jnp.int32).at[pos].set(val, mode="drop")
    return out.reshape(H, W)


def _fill_pairs(out, pos, val, n):
    out[:n, 0] = pos >> 16
    out[:n, 1] = pos & 0xffff
    if out.shape[1] == 4:
        out[:n, 2] = val >> 16
        out[:n, 3] = val & 0xffff
    else:
        out[:n, 2] = val


def _merged_from_pairs(s):
    """Build the merged (cp, ep, geoms) upload from the pair rows the
    native pass A emitted during the coefficient decode itself (Ctx
    emit_pairs mode): no dense-plane walk at all — just pad the rows
    into the coarse shape buckets the scatter executables expect."""
    pairs = getattr(s, "coef_pairs", None)
    if pairs is None:
        return None
    cp_src, ep_src = pairs
    nc, ne = len(cp_src), len(ep_src)
    # np.empty + tail-only -1 fill: rows past the terminator are
    # dropped by the scatter (pos<0), their value lanes are dead — a
    # full-buffer zero + full-column -1 fill costs ~1 ms/frame on
    # dense content for bytes that are never read
    cp = np.empty((_pad_to_bucket(nc + 1, base=1024, mult=2),
                   cp_src.shape[1]), np.int16)
    ep = np.empty((_pad_to_bucket(ne + 1, base=256, mult=2), 3),
                  np.int16)
    cp[nc:, 0] = -1
    ep[ne:, 0] = -1
    cp[:nc] = cp_src
    ep[:ne] = ep_src
    ys, us = s.coef_y.size, s.coef_u.size
    ey, eu = s.eob_y.size, s.eob_u.size
    geoms = [(s.coef_y.shape, s.eob_y.shape, 0, 0),
             (s.coef_u.shape, s.eob_u.shape, ys, ey),
             (s.coef_v.shape, s.eob_v.shape, ys + us, ey + eu)]
    return cp, ep, geoms


def _pack_coef_merged(s, wide):
    """Pack all three planes' nonzero coefficients (and eob cells) into
    ONE position-offset pair buffer each: a single h2d transfer and a
    single scatter rebuild every plane (the tunnel charges per
    transfer, not just per byte). Positions are offset by each plane's
    flat base; returns (cp, ep, geoms) or None without native pass A."""
    from ..passa_native import count_pairs_native, pack_pairs_native
    planes = [(s.coef_y, s.eob_y, s.txsz4),
              (s.coef_u, s.eob_u, s.uvtx4),
              (s.coef_v, s.eob_v, s.uvtx4)]
    cc = getattr(s, "coef_counts", None)
    if cc is None:
        cc = []
        for coef, eob4, txg in planes:
            c = count_pairs_native(coef, eob4, txg)
            if c is None:
                return None
            cc.append(c)
    ncols = 4 if wide else 3
    nc_tot = sum(c[0] for c in cc)
    ne_tot = sum(c[1] for c in cc)
    cp = np.zeros((_pad_to_bucket(nc_tot + 1, base=1024, mult=2), ncols),
                  np.int16)
    ep = np.zeros((_pad_to_bucket(ne_tot + 1, base=256, mult=2), 3),
                  np.int16)
    cp[:, 0] = -1
    ep[:, 0] = -1
    cbase = ebase = 0
    co = eo = 0
    geoms = []
    for (coef, eob4, txg), (nc, ne) in zip(planes, cc):
        pack_pairs_native(coef, eob4, txg, cp[co:co + nc],
                          ep[eo:eo + ne], cbase, ebase)
        geoms.append((coef.shape, eob4.shape, cbase, ebase))
        co += nc
        eo += ne
        cbase += coef.size
        ebase += eob4.size
    return cp, ep, geoms


@partial(jax.jit, static_argnames=("bc", "be", "H", "W", "r4", "c4"))
def _slice_plane(flat_c, flat_e, bc, be, H, W, r4, c4):
    """One dispatch: carve a plane's dense coef + eob grids out of the
    merged flat scatters."""
    return (flat_c[0, bc:bc + H * W].reshape(H, W),
            flat_e[0, be:be + r4 * c4].reshape(r4, c4))


def _pack_coef_host(coef, eob4, txg, wide=False, counts=None):
    """Pack the plane's nonzero dequantized coefficients and the eob
    grid as (position, value) int16 triples. The walk is eob-driven
    (only coded tx blocks' areas are read), so stale pooled-buffer
    content is never shipped. A 1080p keyframe ships ~1.5MB instead of
    6.5MB of 32x32 tiles; skip-heavy inter frames ship a few KB."""
    H, W = coef.shape
    ncols = 4 if wide else 3
    from ..passa_native import count_pairs_native, pack_pairs_native
    if counts is None:
        counts = count_pairs_native(coef, eob4, txg)
    if counts is not None:
        nc, ne = counts
        cp = np.zeros((_pad_to_bucket(nc + 1, base=1024, mult=2), ncols),
                      np.int16)
        ep = np.zeros((_pad_to_bucket(ne + 1, base=256, mult=2), 3),
                      np.int16)
        cp[:, 0] = -1
        ep[:, 0] = -1
        pack_pairs_native(coef, eob4, txg, cp, ep)
        return cp, ep
    # pure-Python pass A writes fresh zeroed buffers: every nonzero in
    # the plane is a coded coefficient
    py, px = np.nonzero(coef)
    pos = (py * W + px).astype(np.int64)
    val = coef[py, px]
    nc = len(pos)
    cp = np.zeros((_pad_to_bucket(nc + 1, base=1024, mult=2), ncols),
                  np.int16)
    cp[:, 0] = -1
    _fill_pairs(cp, pos, val, nc)
    er, ec = np.nonzero(eob4)
    epos = (er * eob4.shape[1] + ec).astype(np.int64)
    ne = len(epos)
    ep = np.zeros((_pad_to_bucket(ne + 1, base=256, mult=2), 3),
                  np.int16)
    ep[:, 0] = -1
    _fill_pairs(ep, epos, eob4[er, ec], ne)
    return cp, ep


def _needs_golden_fallback(s):
    """Only frames with an invalid-scale reference (ref more than 2x /
    16x off the frame size) fall back: the golden path raises the same
    error the reference does if such a ref is actually used
    (vp9recon.c:661-669)."""
    return any(sc[0] == -1 for sc in getattr(s, "mvscale", [[0, 0]] * 3))


def _lf_dense_mode():
    """True when the loop filter runs as the dense device kernel (the
    production path on real chips); False selects the record/pack +
    scan replay (the CPU-test default)."""
    from ..utils.config import get_config
    lf_impl = get_config().lf_impl
    if lf_impl is None:
        lf_impl = ("dense" if jax.devices()[0].platform != "cpu"
                   else "scan")
    return lf_impl == "dense"


def precompute_host(s):
    """Pass-B host-only products, computed at the end of pass A so the
    pipelined decode mode overlaps them with the previous frame's
    device uploads: the intra wavefront schedule, the sparse coefficient
    (pos,value) packing, and the loop-filter edge schedule. Results land
    in s.pre; recon_frame uses them when present."""
    if _needs_golden_fallback(s):
        return
    h = s.header
    pre = {"levels": [None, None], "pairs": [None] * 3,
           "pairs_merged": None, "lf": None, "slabs": [None, None]}
    # slab straight from the native flat schedule when available (the
    # per-level dict walk + per-level pack costs ~9 ms/frame on dense
    # random 1080p content); recon only reads pre["levels"] when the
    # slab is missing, so the dicts are skipped entirely here
    Hy, Wy = s.sb_rows * 64, s.sb_cols * 64
    dims = ((Hy, Wy), (Hy >> h.ss_v, Wy >> h.ss_h))
    done_fast = False
    if getattr(s, "use_native", False) \
            and getattr(s, "block_records", None) is not None:
        with metrics.timer("recon.intra_pack"):
            flats = [_intra_flat_native(s, i) for i in (0, 1)]
            if all(f is not None for f in flats):
                for i in (0, 1):
                    ents, keys = flats[i]
                    pre["slabs"][i] = pack_intra_slab_flat(
                        ents, keys, *dims[i])
                    pre["levels"][i] = [] if pre["slabs"][i] is None \
                        else None
                done_fast = True
    if not done_fast:
        with metrics.timer("recon.intra_sched"):
            pre["levels"][0] = _build_intra_schedule_fast(s, 0)
            pre["levels"][1] = _build_intra_schedule_fast(s, 1)
        with metrics.timer("recon.intra_pack"):
            # prepack the wavefront slabs off the critical path; U and
            # V share one slab (identical schedule, diff. residuals)
            pre["slabs"][0] = pack_intra_slab(pre["levels"][0],
                                              *dims[0])
            pre["slabs"][1] = pack_intra_slab(pre["levels"][1],
                                              *dims[1])
    with metrics.timer("recon.coef_pack"):
        merged = _merged_from_pairs(s)
        if merged is None and getattr(s, "use_native", False):
            merged = _pack_coef_merged(s, wide=h.bpp > 8)
        if merged is not None:
            pre["pairs_merged"] = merged
        else:
            for plane_idx in range(3):
                coef = (s.coef_y, s.coef_u, s.coef_v)[plane_idx]
                eob4 = (s.eob_y, s.eob_u, s.eob_v)[plane_idx]
                txg = s.txsz4 if plane_idx == 0 else s.uvtx4
                pre["pairs"][plane_idx] = _pack_coef_host(
                    coef, eob4, txg, wide=h.bpp > 8)
    if h.filter_level and getattr(s, "use_native", False):
        try:
            if _lf_dense_mode():
                # dense impl: no host record/pack at all — pass A's
                # mask/level grids go up the link and ONE device
                # dispatch derives the dense parameter grids
                # (lpf_masks.grids_device); only cheap superset flags
                # are computed here
                from . import lpf_masks
                with metrics.timer("recon.lf_flags"):
                    pre["lf_masks"] = lpf_masks.lf_flags(s)
                if pre["lf_masks"][0] or pre["lf_masks"][1]:
                    pre["lf_bufs"] = (
                        s.lf_level.reshape(-1).astype(np.int16),
                        np.ascontiguousarray(s.lf_mask).reshape(-1),
                        np.concatenate(
                            [s.lim_lut, s.mblim_lut]).astype(np.int32))
            else:
                from ..passa_native import lpf_record_native
                from . import lpf_tpu
                with metrics.timer("recon.lf_record"):
                    y_rec, ny, uv_rec, nuv = lpf_record_native(s)
                with metrics.timer("recon.lf_pack"):
                    ysteps = lpf_tpu.pack_schedule(y_rec, ny, s.sb_cols)
                    uvsteps = lpf_tpu.pack_schedule(uv_rec, nuv,
                                                    s.sb_cols)
                pre["lf"] = (ysteps, ny, uvsteps, nuv)
                from . import lpf_dense as _lpfd
                pre["lf_par"] = (
                    not _lpfd.has_offgrid_edges(y_rec, ny),
                    not _lpfd.has_offgrid_edges(uv_rec, nuv))
        except OSError:
            pass
    # pack the per-block record table here too (pure host work)
    with metrics.timer("recon.recs_pack"):
        pre["recs"] = _pack_records(s)
    # merge every upload into one flat buffer (one h2d transfer/frame)
    with metrics.timer("recon.flat_pack"):
        pre["flat"] = _pack_flat_upload(pre)
    s.pre = pre


def _pack_flat_upload(pre):
    """Concatenate every pass-B input array into ONE flat int16 host
    buffer + slicing spec. The tunneled h2d link pays ~1 ms latency per
    transfer regardless of size, so one merged transfer per frame beats
    the former 5-7 separate ones. int32 arrays (loop-filter steps) ride
    as little-endian int16 pairs and are bitcast back on device."""
    parts, spec = [], {}
    off = 0

    def add(name, arr, kind=None):
        nonlocal off
        flat = arr.reshape(-1)
        spec[name] = (off, arr.shape, kind)
        parts.append(flat)
        off += flat.size

    add("recs", pre["recs"])
    merged = pre.get("pairs_merged")
    if merged is None:
        return None  # pure-python pairs path keeps per-array uploads
    cp_m, ep_m, _geoms = merged
    add("cp", cp_m)
    add("ep", ep_m)
    for i in (0, 1):
        sl = pre["slabs"][i]
        if sl is not None:
            add("slab%d" % i, sl[0])
    if pre.get("lf") is not None:
        ysteps, ny, uvsteps, nuv = pre["lf"]
        if ny:
            add("lfy", ysteps.view(np.int16), "i32")
        if nuv:
            add("lfuv", uvsteps.view(np.int16), "i32")
    lfm = pre.get("lf_masks")
    if lfm is not None and (lfm[0] or lfm[1]):
        lvl, msk, luts = pre["lf_bufs"]
        add("lfl", lvl)
        add("lfm", msk.view(np.int16), "i32")
        add("lfluts", luts.view(np.int16), "i32")
    return np.concatenate(parts), spec


def _slice_flat(fdev, spec, name):
    ent = spec.get(name)
    if ent is None:
        return None
    off, shape, kind = ent
    n = 1
    for d in shape:
        n *= d
    v = fdev[off:off + n].reshape(shape)
    if kind == "i32":
        # int16 [..., 2k] little-endian pairs -> int32 [..., k]
        v = v.reshape(shape[:-1] + (shape[-1] // 2, 2))
        v = jax.lax.bitcast_convert_type(v, jnp.int32)
    return v


@partial(jax.jit, static_argnames=("spec_t",))
def _slice_all_jit(fdev, spec_t):
    """Slice every upload view out of the flat buffer in ONE device
    dispatch. Eager per-array slicing costs ~0.8 ms of dispatch latency
    per op through the tunneled runtime (~16 ops = 13 ms/frame on the
    upload stage, measured); all inputs are shape-bucketed so the
    static spec keys only a handful of executables."""
    outs = []
    for _name, off, shape, kind in spec_t:
        n = 1
        for d in shape:
            n *= d
        v = jax.lax.slice(fdev, (off,), (off + n,)).reshape(shape)
        if kind == "i32":
            v = v.reshape(shape[:-1] + (shape[-1] // 2, 2))
            v = jax.lax.bitcast_convert_type(v, jnp.int32)
        outs.append(v)
    return tuple(outs)


def _slice_all(fdev, spec):
    spec_t = tuple((name, ent[0], ent[1], ent[2])
                   for name, ent in spec.items())
    outs = _slice_all_jit(fdev, spec_t)
    return dict(zip((e[0] for e in spec_t), outs))


def upload_job(s):
    """Start every h2d transfer of the frame's pass-B inputs. Pure data
    movement (no dependency on the previous frame's results), so the
    pipelined decode runs it on its own stage thread: transfers of
    frame N overlap dispatch of frame N-1, and the main thread's pass B
    becomes dispatch-only. Device handles land in s.pre["dev"]."""
    pre = getattr(s, "pre", None)
    if pre is None:
        return
    dev = {}
    flat = pre.get("flat")
    if flat is None and "flat" not in pre:
        with metrics.timer("upload.flat_pack"):
            flat = pre["flat"] = _pack_flat_upload(pre)
    if flat is not None:
        buf, spec = flat
        with metrics.timer("upload.flat"):
            fdev = jnp.asarray(buf)
        with metrics.timer("upload.slice"):
            views = _slice_all(fdev, spec)
            dev["recs"] = views.get("recs")
            dev["cp"] = views.get("cp")
            dev["ep"] = views.get("ep")
            dev["slabs"] = [views.get("slab0"), views.get("slab1")]
            if pre.get("lf") is not None:
                dev["lfy"] = views.get("lfy")
                dev["lfuv"] = views.get("lfuv")
            if pre.get("lf_masks") is not None:
                dev["lfl"] = views.get("lfl")
                dev["lfm"] = views.get("lfm")
                dev["lfluts"] = views.get("lfluts")
        pre["dev"] = dev
        return
    with metrics.timer("upload.recs"):
        dev["recs"] = jnp.asarray(pre["recs"])
    with metrics.timer("upload.pairs"):
        dev["pairs"] = [
            (jnp.asarray(p[0]), jnp.asarray(p[1]))
            if p is not None else None
            for p in pre["pairs"]]
    with metrics.timer("upload.slabs"):
        dev["slabs"] = [jnp.asarray(sl[0]) if sl is not None else None
                        for sl in pre["slabs"]]
    if pre.get("lf") is not None:
        ysteps, ny, uvsteps, nuv = pre["lf"]
        with metrics.timer("upload.lf"):
            dev["lfy"] = jnp.asarray(ysteps) if ny else None
            dev["lfuv"] = jnp.asarray(uvsteps) if nuv else None
    pre["dev"] = dev


def recon_frame(s):
    h = s.header
    bpp = h.bpp
    if _needs_golden_fallback(s):
        from ..codecs.vp9 import golden
        if not (h.keyframe or h.intraonly):
            # the golden path reads host pixels of the reference
            # frames; frames produced by the TPU path are
            # device-resident until synced
            for i in range(3):
                rf = s.refs[h.refidx[i]]
                if rf is not None:
                    rf.sync_host()
        golden.recon_frame(s)
        golden.loopfilter_frame(s)
        return

    cur = s.cur_frame_obj
    pre = getattr(s, "pre", None)
    dev = pre.get("dev") if pre else None
    if dev is None:
        dev = {}

    # one thin upload for all block metadata; dense grids are rebuilt on
    # device (_grids_from_records)
    with metrics.timer("recon.upload_recs"):
        recs_dev = dev.get("recs")
        if recs_dev is None:
            recs = pre["recs"] if pre and "recs" in pre \
                else _pack_records(s)
            recs_dev = jnp.asarray(recs)
    r4, c4 = s.txsz4.shape
    with metrics.timer("recon.splat"):
        (inter4_d, txsz4_d, txtype4_d, comp4_d, filt4_d, refsel_d, mv16_d,
         inter4uv_d, uvtx4_d, txtypeuv_d, compuv_d, filtuv_d, refseluv_d,
         uvmv_d) = _grids_from_records(recs_dev, r4, c4, h.ss_h, h.ss_v)

    has_inter_frame = not (h.keyframe or h.intraonly)
    if has_inter_frame:
        has_inter_frame = bool((s.block_records[:, 6] == 0).any()) \
            if s.block_records is not None else bool(s.inter4.any())
    # static MC config: the MXU one-hot kernel on real TPUs (the XLA
    # gather path costs 113 ms/plane there), and skip the second
    # reference pass when pass A saw no compound blocks
    from ..utils.config import get_config
    mc_impl = get_config().mc_impl
    if mc_impl is None:
        mc_impl = ("mxu" if jax.devices()[0].platform != "cpu"
                   else "gather")
    if s.block_records is not None:
        has_comp = bool((s.block_records[:, 14] != 0).any())
    else:
        has_comp = bool(s.comp4.any())
    has_scaled = has_inter_frame and any(
        sc[0] for sc in getattr(s, "mvscale", [[0, 0]] * 3))
    if has_scaled:
        scales_np = np.asarray(s.mvscale, np.int32)
        steps_np = np.asarray(s.mvstep, np.int32)
        scale_nz_np = scales_np[:, 0] != 0
        with metrics.timer("recon.scaled_grids"):
            anchors = _scaled_anchor_grids(recs_dev, r4, c4, h.ss_h,
                                           h.ss_v)

    merged = pre.get("pairs_merged") if pre else None
    if merged is None:
        # no precompute ran for this job (direct decode_pass_b use):
        # the emitted pairs are still the only valid coefficient source
        # in emit mode — the dense planes were never written
        merged = _merged_from_pairs(s)
    if merged is not None:
        cp_m, ep_m, geoms_m = merged
        with metrics.timer("recon.upload_coef"):
            scat = _scatter_pairs32 if cp_m.shape[1] == 4 \
                else _scatter_pairs16
            Lc = sum(sh[0] * sh[1] for sh, _e, _b, _eb in geoms_m)
            Le = sum(e[0] * e[1] for _sh, e, _b, _eb in geoms_m)
            cp_dev = dev.get("cp")
            if cp_dev is None:
                cp_dev = jnp.asarray(cp_m)
            ep_dev = dev.get("ep")
            if ep_dev is None:
                ep_dev = jnp.asarray(ep_m)
            flat_c = scat(cp_dev, 1, Lc)
            flat_e = _scatter_pairs16(ep_dev, 1, Le)

    outs = []
    uv_slab_dev = None
    for plane_idx in range(3):
        if plane_idx == 0:
            coef, eob4 = s.coef_y, s.eob_y
            grids = (inter4_d, txsz4_d, txtype4_d, comp4_d, filt4_d,
                     refsel_d, mv16_d)
            mvsx = mvsy = 2
        else:
            coef = s.coef_u if plane_idx == 1 else s.coef_v
            eob4 = s.eob_u if plane_idx == 1 else s.eob_v
            grids = (inter4uv_d, uvtx4_d, txtypeuv_d, compuv_d, filtuv_d,
                     refseluv_d, uvmv_d)
            mvsx = 1 << (1 - h.ss_h)
            mvsy = 1 << (1 - h.ss_v)

        with metrics.timer("recon.upload_coef"):
            # 8bpp dctcoefs fit int16 (spec inter-pass wraparound);
            # ship only (position, value) pairs of the nonzero
            # coefficients and rebuild the dense planes on device
            if merged is not None:
                sh, esh, bc, be = geoms_m[plane_idx]
                coef_dev, eob_dev = _slice_plane(
                    flat_c, flat_e, bc, be, sh[0], sh[1], esh[0],
                    esh[1])
            else:
                pdev = dev.get("pairs")
                if pdev is not None and pdev[plane_idx] is not None:
                    cp_d, ep_d = pdev[plane_idx]
                    wide4 = cp_d.shape[1] == 4
                elif pre is not None and pre["pairs"][plane_idx] \
                        is not None:
                    cp, ep = pre["pairs"][plane_idx]
                    cp_d, ep_d = jnp.asarray(cp), jnp.asarray(ep)
                    wide4 = cp.shape[1] == 4
                else:
                    txg = s.txsz4 if plane_idx == 0 else s.uvtx4
                    cp, ep = _pack_coef_host(coef, eob4, txg,
                                             wide=bpp > 8)
                    cp_d, ep_d = jnp.asarray(cp), jnp.asarray(ep)
                    wide4 = cp.shape[1] == 4
                scat = _scatter_pairs32 if wide4 else _scatter_pairs16
                coef_dev = scat(cp_d, *coef.shape)
                eob_dev = _scatter_pairs16(ep_d, *eob4.shape)

        if has_inter_frame:
            w, hh = cur.size
            if plane_idx:
                w = (w + h.ss_h) >> h.ss_h
                hh = (hh + h.ss_v) >> h.ss_v
            # reference planes stay device-resident across frames
            refplanes = []
            refdims = []
            for i in range(3):
                rf = s.refs[h.refidx[i]]
                if rf is None:
                    refplanes.append(None)
                    refdims.append((hh, w))
                else:
                    if rf.dev is not None:
                        refplanes.append(rf.dev[plane_idx])
                    else:
                        refplanes.append(jnp.asarray(
                            rf.planes[plane_idx], jnp.int32))
                    rw, rh = rf.size
                    if plane_idx:
                        rw = (rw + h.ss_h) >> h.ss_h
                        rh = (rh + h.ss_v) >> h.ss_v
                    refdims.append((rh, rw))
            z = next(p for p in refplanes if p is not None)
            refplanes = [p if p is not None else z for p in refplanes]
            inter4_p, txsz4_p, txtype4_p, comp4_p, filt4_p, refsel_p, \
                mv16_p = grids
            if has_scaled:
                # pad differently-sized ref planes to a common stack
                Hm = max(p.shape[0] for p in refplanes)
                Wm = max(p.shape[1] for p in refplanes)
                refplanes = [
                    p if p.shape == (Hm, Wm) else
                    jnp.zeros((Hm, Wm), p.dtype)
                    .at[:p.shape[0], :p.shape[1]].set(p)
                    for p in refplanes]
                refh_a = jnp.asarray([d[0] for d in refdims], jnp.int32)
                refw_a = jnp.asarray([d[1] for d in refdims], jnp.int32)
                if plane_idx == 0:
                    ay, ax, by, bx, pwb, phb = anchors[:6]
                    ssx = ssy = 0
                else:
                    ay, ax, by, bx, pwb, phb = anchors[6:]
                    ssx, ssy = h.ss_h, h.ss_v
                with metrics.timer("recon.inter_enqueue"):
                    plane_dev, residual = _recon_plane_inter_mixed(
                        coef_dev, eob_dev, inter4_p, txsz4_p, txtype4_p,
                        comp4_p, filt4_p, refsel_p, mv16_p,
                        refplanes[0], refplanes[1], refplanes[2],
                        ay, ax, by, bx, pwb, phb,
                        jnp.asarray(scales_np), jnp.asarray(steps_np),
                        refw_a, refh_a, jnp.asarray(scale_nz_np),
                        s.cols, s.rows, bool(h.lossless), bpp,
                        mvsx, mvsy, ssx, ssy)
            else:
                with metrics.timer("recon.inter_enqueue"):
                    plane_dev, residual = _recon_plane_inter(
                        coef_dev, eob_dev, inter4_p, txsz4_p, txtype4_p,
                        comp4_p, filt4_p, refsel_p, mv16_p,
                        refplanes[0], refplanes[1], refplanes[2], w, hh,
                        bool(h.lossless), bpp, mvsx, mvsy,
                        has_comp=has_comp, mc_impl=mc_impl)
        else:
            with metrics.timer("recon.residual_enqueue"):
                plane_dev, residual = _recon_plane_intra_only(
                    coef_dev, eob_dev, grids[1], grids[2],
                    bool(h.lossless), bpp)

        with metrics.timer("recon.intra_sched"):
            slab = None
            if pre is not None:
                levels = pre["levels"][min(plane_idx, 1)]
                slab = pre["slabs"][min(plane_idx, 1)]
            elif plane_idx < 2:
                levels = _build_intra_schedule(s, plane_idx)
                if plane_idx == 1:
                    s._uv_levels = levels  # U and V share geometry/modes
            else:
                levels = s._uv_levels
        with metrics.timer("recon.intra_run"):
            # V reuses U's already-uploaded slab (identical schedule);
            # the pipelined upload stage may have shipped both already
            sd = uv_slab_dev if plane_idx == 2 else None
            if sd is None and dev.get("slabs") is not None:
                sd = dev["slabs"][min(plane_idx, 1)]
            plane_dev, sd = run_intra_plane(s, plane_dev, residual,
                                            levels, slab, sd)
            if plane_idx == 1:
                uv_slab_dev = sd
        outs.append(plane_dev)

    # loop filter on device: replay the native walker's recorded edge
    # sequence as a wavefront scan (planes never leave the device)
    lf_done = False
    if (h.filter_level and getattr(s, "use_native", False)
            and pre is not None and pre.get("lf_masks") is not None):
        # masks path: dense parameter grids derived on device from
        # pass A's level/mask outputs (lpf_masks) — no host schedule
        y_any, uv_any, y_par, uv_par = pre["lf_masks"]
        from . import lpf_dense, lpf_masks
        with metrics.timer("recon.lf_enqueue"):
            if y_any or uv_any:
                lfl = dev.get("lfl")
                if lfl is None:
                    lvl, msk, luts = pre.get("lf_bufs") or (
                        s.lf_level.reshape(-1).astype(np.int16),
                        np.ascontiguousarray(s.lf_mask).reshape(-1),
                        np.concatenate(
                            [s.lim_lut, s.mblim_lut]).astype(np.int32))
                    lfl = jnp.asarray(lvl)
                    lfm = jnp.asarray(msk)
                    lfluts = jnp.asarray(luts)
                else:
                    lfm = dev.get("lfm")
                    lfluts = dev.get("lfluts")
                Vy, Hgy, Vu, Hgu = lpf_masks.grids_device(
                    lfl, lfm, lfluts, s.sb_rows, s.sb_cols,
                    h.ss_h, h.ss_v)
            if y_any:
                kern = (lpf_dense.lf_dense_par if y_par
                        else lpf_dense.lf_dense)
                y = kern(outs[0][None], Vy, Hgy, s.sb_rows,
                         s.sb_cols, 64, 64, bpp)[0]
            else:
                y = outs[0]
            if uv_any:
                kern = (lpf_dense.lf_dense_par if uv_par
                        else lpf_dense.lf_dense)
                uv = kern(jnp.stack([outs[1], outs[2]]), Vu, Hgu,
                          s.sb_rows, s.sb_cols,
                          64 >> h.ss_h, 64 >> h.ss_v, bpp)
                u, v = uv[0], uv[1]
            else:
                u, v = outs[1], outs[2]
        outs = [y, u, v]
        lf_done = True
    elif h.filter_level and getattr(s, "use_native", False):
        try:
            from . import lpf_tpu
            if pre is not None and pre["lf"] is not None:
                ysteps, ny, uvsteps, nuv = pre["lf"]
            else:
                from ..passa_native import lpf_record_native
                with metrics.timer("recon.lf_record"):
                    y_rec, ny, uv_rec, nuv = lpf_record_native(s)
                with metrics.timer("recon.lf_pack"):
                    ysteps = lpf_tpu.pack_schedule(y_rec, ny, s.sb_cols)
                    uvsteps = lpf_tpu.pack_schedule(uv_rec, nuv,
                                                    s.sb_cols)
            # lf impl: the dense slice-wavefront kernel replaces the
            # per-record gather scan on real TPUs (gathers run at
            # scalar-loop rate there; dense measured faster on-chip) —
            # both consume the same uploaded packed schedule
            from ..utils.config import get_config
            lf_impl = get_config().lf_impl
            if lf_impl is None:
                lf_impl = ("dense"
                           if jax.devices()[0].platform != "cpu"
                           else "scan")
            with metrics.timer("recon.lf_enqueue"):
                if ny:
                    lfy = dev.get("lfy")
                    if lfy is None:
                        lfy = jnp.asarray(ysteps)
                    if lf_impl == "dense":
                        from . import lpf_dense
                        Hy_, Wy_ = outs[0].shape
                        Vy, Hgy = lpf_dense.dense_from_steps(
                            lfy, Hy_, Wy_)
                        # batched-position kernel when every edge is
                        # on the 8px grid; 4px-offset edges (4x4-tx
                        # interiors) chain serially and take the
                        # serial-position kernel
                        if pre is not None and "lf_par" in pre:
                            y_par = pre["lf_par"][0]
                        else:
                            y_par = not lpf_dense.has_offgrid_steps(
                                np.asarray(ysteps))
                        kern = (lpf_dense.lf_dense_par if y_par
                                else lpf_dense.lf_dense)
                        y = kern(outs[0][None], Vy, Hgy, s.sb_rows,
                                 s.sb_cols, 64, 64, bpp)[0]
                    else:
                        y = lpf_tpu._lf_scan(outs[0][None], lfy,
                                             bpp)[0]
                else:
                    y = outs[0]
                if nuv:
                    lfuv = dev.get("lfuv")
                    if lfuv is None:
                        lfuv = jnp.asarray(uvsteps)
                    uvst = jnp.stack([outs[1], outs[2]])
                    if lf_impl == "dense":
                        from . import lpf_dense
                        Hu_, Wu_ = outs[1].shape
                        Vu, Hgu = lpf_dense.dense_from_steps(
                            lfuv, Hu_, Wu_)
                        if pre is not None and "lf_par" in pre:
                            uv_par = pre["lf_par"][1]
                        else:
                            uv_par = not lpf_dense.has_offgrid_steps(
                                np.asarray(uvsteps))
                        kern = (lpf_dense.lf_dense_par if uv_par
                                else lpf_dense.lf_dense)
                        uv = kern(uvst, Vu, Hgu, s.sb_rows, s.sb_cols,
                                  64 >> h.ss_h, 64 >> h.ss_v, bpp)
                    else:
                        uv = lpf_tpu._lf_scan(uvst, lfuv, bpp)
                    u, v = uv[0], uv[1]
                else:
                    u, v = outs[1], outs[2]
            outs = [y, u, v]
            lf_done = True
        except OSError:
            pass

    cur.dev = outs
    cur._host_stale = True

    if not lf_done and h.filter_level:
        # fallback: pull planes and run the host loop filter
        with metrics.timer("recon.lf_host_fallback"):
            cur.sync_host()
            cur.dev = None
            from ..codecs.vp9 import golden
            golden.loopfilter_frame(s)


@partial(jax.jit, static_argnames=("w", "hh", "lossless",
                                   "bpp", "mvsx", "mvsy", "has_comp",
                                   "mc_impl"))
def _recon_plane_inter(coef, eob4, inter4, txsz4, txtype4, comp, filt,
                       refsel, mv16, ref0, ref1, ref2, w, hh, lossless,
                       bpp, mvsx=2, mvsy=2, has_comp=True,
                       mc_impl="gather"):
    """Fused inter pass: residual transforms + per-cell MC + apply.
    All per-cell metadata arrives as device grids (rebuilt from block
    records by _grids_from_records); coef/eob are device-scattered.
    mc_impl="mxu" routes MC through the one-hot-matmul kernel
    (ops/mc_mxu.py, ~4x the gather path on TPU); has_comp=False skips
    the second reference pass entirely (statically known when pass A
    saw no compound blocks)."""
    H, W = coef.shape
    comp = comp.astype(bool)
    inter4 = inter4.astype(bool)
    coef = coef.astype(jnp.int32)
    residual = jnp.zeros(coef.shape, coef.dtype)
    if lossless:
        residual = _residual_for_size(coef, eob4, txsz4, txtype4, 0, True,
                                      bpp, *coef.shape)
    else:
        for tx in range(4):
            residual = residual + _residual_for_size(
                coef, eob4, txsz4, txtype4, tx, False, bpp, *coef.shape)
    residual = residual.astype(jnp.int32)
    refstack = jnp.stack([ref0, ref1, ref2], axis=0)
    if not has_comp:
        comp = jnp.zeros_like(comp)
    if mc_impl == "mxu":
        from . import mc_mxu
        mc = mc_mxu.mc_cells(refstack, mv16, refsel, comp, filt,
                             inter4, w, hh, bpp, mvsx, mvsy,
                             has_comp=has_comp)
    else:
        mc = _mc_cells(refstack, mv16, refsel, comp, filt, inter4, w,
                       hh, bpp, mvsx, mvsy)
    maxp = (1 << bpp) - 1
    mcfull = jnp.clip(mc + residual[:mc.shape[0], :mc.shape[1]], 0, maxp)
    mask = jnp.repeat(jnp.repeat(inter4, 4, 0), 4, 1)
    plane = jnp.zeros((H, W), jnp.int32)
    plane = plane.at[:mc.shape[0], :mc.shape[1]].set(
        jnp.where(mask, mcfull, plane[:mc.shape[0], :mc.shape[1]]))
    return plane, residual


@partial(jax.jit, static_argnames=("lossless", "bpp", "mvsx", "mvsy",
                                   "ss_x", "ss_y"))
def _recon_plane_inter_mixed(coef, eob4, inter4, txsz4, txtype4, comp,
                             filt, refsel, mvraw, ref0, ref1, ref2,
                             ay, ax, by, bx, pw, ph, scales, steps,
                             refw, refh, scale_nz, cols, rows, lossless,
                             bpp, mvsx, mvsy, ss_x, ss_y):
    """_recon_plane_inter for frames with scaled (resized) references."""
    H, W = coef.shape
    comp = comp.astype(bool)
    inter4 = inter4.astype(bool)
    coef = coef.astype(jnp.int32)
    residual = jnp.zeros(coef.shape, jnp.int32)
    if lossless:
        residual = _residual_for_size(coef, eob4, txsz4, txtype4, 0, True,
                                      bpp, *coef.shape)
    else:
        for tx in range(4):
            residual = residual + _residual_for_size(
                coef, eob4, txsz4, txtype4, tx, False, bpp, *coef.shape)
    residual = residual.astype(jnp.int32)
    refstack = jnp.stack([ref0, ref1, ref2], axis=0)
    mc = _mc_cells_mixed(refstack, mvraw, refsel, comp, filt, ay, ax,
                         by, bx, pw, ph, scales, steps, refw, refh,
                         scale_nz, cols, rows, bpp, mvsx, mvsy,
                         ss_x, ss_y)
    maxp = (1 << bpp) - 1
    mcfull = jnp.clip(mc + residual[:mc.shape[0], :mc.shape[1]], 0, maxp)
    mask = jnp.repeat(jnp.repeat(inter4, 4, 0), 4, 1)
    plane = jnp.zeros((H, W), jnp.int32)
    plane = plane.at[:mc.shape[0], :mc.shape[1]].set(
        jnp.where(mask, mcfull, plane[:mc.shape[0], :mc.shape[1]]))
    return plane, residual


@partial(jax.jit, static_argnames=("lossless", "bpp"))
def _recon_plane_intra_only(coef, eob4, txsz4, txtype4, lossless, bpp):
    """Keyframe/intra-only plane: residual only."""
    H, W = coef.shape
    residual = residual_plane(coef, eob4, txsz4, txtype4, lossless,
                              bpp).astype(jnp.int32)
    return jnp.zeros((H, W), jnp.int32), residual
