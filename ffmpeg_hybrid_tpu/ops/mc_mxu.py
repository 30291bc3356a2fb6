"""Motion compensation on the MXU: gathers become one-hot matmuls.

`recon_tpu._mc_cells` expresses the per-cell 11x11 patch fetch as an
XLA gather, which TPUs execute as a scalar loop (~7.3 ns/element
measured — 113 ms for a 1080p luma plane). This module computes the
same MC bit-exactly with the gather replaced by small matrix products
that ride the MXU:

  * the frame is processed in 8-cell-row stripes; each stripe slices a
    [RW, *] row window from the (padded) reference planes — one
    regular dynamic_slice, no gather;
  * the stripe is cut into 64-px tile groups with a CW-col shared
    window (all 3 candidate ref planes stacked along K, so the ref
    choice is folded into the same one-hot); each group's 16 cells x
    11 patch rows are selected by one one-hot matmul:
    rows[176, CW] = R[176, 3*RW] @ Win[3*RW, CW]
    (pixels <= 255 are exact in bf16; higher bit depths run at
    float32 precision like the intra path);
  * the horizontal 8-tap + column selection is ONE matrix per group:
    HF[CW, 64] holds each cell's taps at its (edge-clamped) column
    positions, so patches = rows @ HF yields every cell's h-filtered
    [11, 4] block in one f32 matmul (exact: |tap*pixel| < 2^19);
  * the vertical 8-tap runs on the VPU over the 11-row results.

Per-cell filter taps are selected by 64-way masked sums from the
constant bank table (a [cells, 8] tap gather would itself cost ms).

Cells whose MV leaves the window (|dy| > 64 px or |dx| > ~100 px,
rare in real content) are flagged and recomputed by a compacted
fixed-budget pass through the original gather path; if the budget
overflows, the whole plane falls back to `_mc_cells`.

Semantics mirror recon_tpu._mc_cells exactly (reference:
mc_luma_unscaled / 8-tap filters, vp9recon.c:292-390 +
vp9dsp_template.c:2038-2240); differential tests:
tests/test_mc_mxu.py.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .recon_tpu import _FTAB as _FTAB_LIST

_FTAB = np.asarray(_FTAB_LIST, np.int32)  # [4, 16, 8]

# window geometry (pixels)
ROW_PAD = 68          # rows above cy covered (64 MV + 3 taps + slack)
RW = 208              # row-window height: 32 (stripe) + 2*68 + 11 -> 179
COL_PAD = 104         # cols left of the tile covered
CW = 288              # col window: 64 + 2*104 + 11 -> 283, padded
TILE = 64             # px per tile group (16 cells)


def _sel_taps(filt, phase, dt, mxu=False):
    """taps[..., 8] for (filt, phase). A [cells, 8] table gather would
    cost ms on TPU; select via one-hot matmul (taps are integers
    <= 128, exact in bf16) or 64-way masked sum on CPU."""
    if mxu:
        idx = filt * 16 + phase
        oh = (idx[..., None] == jnp.arange(64)).astype(jnp.bfloat16)
        tab = jnp.asarray(_FTAB.reshape(64, 8), jnp.bfloat16)
        out = jnp.einsum("...k,kt->...t", oh, tab,
                         preferred_element_type=jnp.float32)
        return out.astype(dt)
    out = jnp.zeros(filt.shape + (8,), dt)
    for f in range(4):
        for p in range(16):
            m = ((filt == f) & (phase == p))[..., None]
            out = out + m.astype(dt) * jnp.asarray(_FTAB[f, p], dt)
    return out


def mc_cells_mxu_plane(refstack, mv16, refsel, comp, filt, inter_mask,
                       w, h, bpp, mvsx=1, mvsy=1, has_comp=True,
                       force_bf16=None, x0=None):
    """One-hot-matmul MC. Returns ([r4*4, c4*4] int32 plane,
    bad [r4, c4] bool — cells whose MV left the window).
    force_bf16: override the platform-derived bf16 choice so the
    production bf16 path can be exercised off-chip by tests (on CPU
    XLA computes bf16 dots at >= f32 internal precision, so the
    integers-in-bf16 exactness argument holds there too).
    x0: stripe pixel offset (traced scalar) for the SHARDED path — the
    cell grid covers frame columns [x0, x0 + c4*4) of a full-width
    refstack and x0 is already folded into the MVs (absolute
    coordinates), so tile windows slice at x0 + g*TILE."""
    mv16 = mv16.astype(jnp.int32)
    refsel = refsel.astype(jnp.int32)
    filt = filt.astype(jnp.int32)
    r4, c4 = mv16.shape[:2]
    Hp, Wp = refstack.shape[1:]
    maxp = (1 << bpp) - 1
    # 8-bit pixels are exact in bf16; bf16 rides the real MXU by
    # default (CPU runs the f32 split path in production)
    exact_bf16 = (bpp == 8 and jax.devices()[0].platform != "cpu") \
        if force_bf16 is None else (force_bf16 and bpp == 8)
    sel_dt = jnp.bfloat16 if exact_bf16 else jnp.float32
    prec = None if exact_bf16 else jax.lax.Precision.HIGHEST

    n_stripes = (r4 + 7) // 8
    r4p = n_stripes * 8
    n_tiles = (c4 * 4 + TILE - 1) // TILE
    c4p = n_tiles * 16
    # pad refs so every tile's col window slices cleanly, and pad the
    # cell grids to stripe/tile multiples. With a stripe offset the
    # pad covers the FULL reference width (windows then slice
    # dynamically at x0 + g*TILE).
    padw = COL_PAD + (Wp if x0 is not None else n_tiles * TILE) + CW
    HpR = max(Hp, RW)  # small frames: pad rows so the window slices
    refpad = jnp.zeros((3, HpR, padw), refstack.dtype)
    refpad = refpad.at[:, :Hp, COL_PAD:COL_PAD + Wp].set(refstack)
    xoff = jnp.int32(0) if x0 is None else \
        jnp.asarray(x0, jnp.int32)

    def padg(a, fill=0):
        out = jnp.full((r4p, c4p) + a.shape[2:], fill, a.dtype)
        return out.at[:r4, :c4].set(a)

    mv16p = padg(mv16)
    refselp = padg(refsel)
    filtp = padg(filt)

    cy_all = jnp.arange(r4p) * 4
    cx_all = jnp.arange(c4p) * 4
    j11 = jnp.arange(11)

    def one_ref(ri):
        mvx = mv16p[:, :, ri, 0] * mvsx
        mvy = mv16p[:, :, ri, 1] * mvsy
        iy = cy_all[:, None] + (mvy >> 4)
        ix = cx_all[None, :] + (mvx >> 4)
        mx = mvx & 15
        my = mvy & 15
        sel = refselp

        htaps = _sel_taps(filtp, mx, jnp.float32, mxu=exact_bf16)
        vtaps = _sel_taps(filtp, my, jnp.int32, mxu=exact_bf16)

        def stripe(s):
            cy0 = s * 32
            r0 = jnp.clip(cy0 - ROW_PAD, 0, max(HpR - RW, 0))
            win3 = jax.lax.dynamic_slice(refpad, (0, r0, 0),
                                         (3, RW, padw))
            G = n_tiles
            iy_g = jax.lax.dynamic_slice(iy, (s * 8, 0), (8, c4p)) \
                .reshape(8, G, 16)
            ix_g = jax.lax.dynamic_slice(ix, (s * 8, 0), (8, c4p)) \
                .reshape(8, G, 16)
            sel_g = jax.lax.dynamic_slice(
                sel, (s * 8, 0, ri), (8, c4p, 1)).reshape(8, G, 16)
            ht_g = jax.lax.dynamic_slice(
                htaps, (s * 8, 0, 0), (8, c4p, 8)).reshape(8, G, 16, 8)
            vt_g = jax.lax.dynamic_slice(
                vtaps, (s * 8, 0, 0), (8, c4p, 8)).reshape(8, G, 16, 8)

            # [G, 3*RW, CW] stacked-ref windows (offset by the stripe
            # origin when sharded)
            wins = jnp.stack([
                jax.lax.dynamic_slice(win3, (0, 0, xoff + g * TILE),
                                      (3, RW, CW))
                for g in range(G)]).reshape(G, 3 * RW, CW)

            # one-hot row selection [8, G, 176, 3*RW]
            row_in = iy_g[..., None] + (j11 - 3)          # [8,G,16,11]
            row_cl = jnp.clip(row_in, 0, h - 1)
            row_loc = row_cl - r0
            bad_row = (row_loc < 0) | (row_loc >= RW)
            row_k = jnp.clip(row_loc, 0, RW - 1) + sel_g[..., None] * RW
            kidx = jnp.arange(3 * RW)
            R = (row_k[..., None] == kidx).astype(sel_dt)
            R = R.reshape(8, G, 16 * 11, 3 * RW)
            rows = jnp.einsum("bgrk,gkc->bgrc", R,
                              wins.astype(sel_dt),
                              preferred_element_type=jnp.float32,
                              precision=prec)              # [8,G,176,CW]

            # HF: h-taps at each cell's clamped column positions
            col_in = ix_g[..., None] + (j11 - 3)           # [8,G,16,11]
            col_cl = jnp.clip(col_in, 0, w - 1)
            gbase = (jnp.arange(G) * TILE)[None, :, None, None]
            col_loc = col_cl + COL_PAD - gbase - xoff
            # window for tile g starts at refpad col g*TILE, i.e.
            # global col g*TILE - COL_PAD
            bad_col = (col_loc < 0) | (col_loc >= CW)
            bad = (bad_row | bad_col).any(-1)              # [8, G, 16]
            widx = jnp.arange(CW)
            HF = jnp.zeros((8, G, 16, 4, CW), jnp.float32)
            for t in range(11):
                eq = (widx == col_loc[..., t, None]) \
                    .astype(jnp.float32)                   # [8,G,16,CW]
                for j in range(4):
                    m = t - j
                    if 0 <= m < 8:
                        HF = HF.at[:, :, :, j, :].add(
                            eq * ht_g[..., m:m + 1])
            HF = jnp.moveaxis(HF, 4, 2).reshape(8, G, CW, 64)

            # ONE matmul per tile group: batched-over-(band, group)
            # einsums lower to thousands of tiny matmul instances with
            # ~25 us fixed cost each (measured: 208 ms); folding the 8
            # bands into M and N — computing the 8x8 band cross terms
            # and keeping the diagonal by static slicing — is 8x the
            # MACs but ~40x faster end to end.
            rows2 = jnp.moveaxis(rows, 0, 1).reshape(G, 8 * 176, CW)
            HF2 = HF.transpose(1, 2, 0, 3).reshape(G, CW, 8 * 64)

            def mm(lhs):
                return jnp.einsum("gmc,gcn->gmn",
                                  lhs.astype(jnp.bfloat16),
                                  HF2.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)

            if exact_bf16:
                # bf16 x bf16 -> f32 is EXACT here: both operands hold
                # 8-bit-mantissa integers (pixels <= 255, taps <= 128),
                # products fit f32 exactly, sums < 2^24
                blkF = mm(rows2)
            else:
                # split pixels into exact bf16 halves (hi*256 + lo)
                hi = jnp.floor(rows2 / 256.0)
                blkF = mm(hi) * 256.0 + mm(rows2 - hi * 256.0)
            blkF = blkF.reshape(G, 8, 176, 8, 64)
            # band diagonal, then per-cell diagonal — STATIC slices
            # (fancy-index diagonals lower to the scalar gather path)
            blk = jnp.stack([blkF[:, b, :, b] for b in range(8)])
            blk = blk.reshape(8, G, 16, 11, 16, 4)
            patches = jnp.stack(
                [blk[:, :, k, :, k, :] for k in range(16)],
                axis=2)                            # [8, G, 16, 11, 4]

            tmp = jnp.clip(
                (jnp.round(patches).astype(jnp.int32) + 64) >> 7,
                0, maxp)
            acc = jnp.zeros((8, G, 16, 4, 4), jnp.int32)
            for k in range(8):
                acc = acc + vt_g[..., k, None, None] * tmp[..., k:k + 4, :]
            out = jnp.clip((acc + 64) >> 7, 0, maxp)
            return out, bad

        outs, bads = jax.lax.map(stripe, jnp.arange(n_stripes))
        # outs: [S, 8, G, 16, 4, 4] -> [r4p*4, c4p*4]
        o = outs.transpose(0, 1, 4, 2, 3, 5)
        o = o.reshape(r4p * 4, c4p * 4)
        b = bads.reshape(r4p, c4p)
        return o[:r4 * 4, :c4 * 4], b[:r4, :c4]

    p0, bad0 = one_ref(0)
    if has_comp:
        p1, bad1 = one_ref(1)
        comp_b = comp.astype(bool)
        mask = jnp.repeat(jnp.repeat(comp_b, 4, 0), 4, 1)
        out = jnp.where(mask, (p0 + p1 + 1) >> 1, p0)
        bad = (bad0 | (bad1 & comp_b)) & inter_mask.astype(bool)
    else:
        out = p0
        bad = bad0 & inter_mask.astype(bool)
    return out, bad


def mc_cells_fixup(out, bad, refstack, mv16, refsel, comp, filt,
                   w, h, bpp, mvsx, mvsy, budget=512):
    """Recompute the (rare) out-of-window cells via the original gather
    path on a compacted fixed-size list. Returns (plane, overflow)."""
    from . import recon_tpu
    r4, c4 = bad.shape
    n = jnp.sum(bad)
    idx = jnp.nonzero(bad.reshape(-1), size=budget, fill_value=0)[0]
    ry, rx = idx // c4, idx % c4
    sub_mv = mv16[ry, rx][:, None].astype(jnp.int32)   # [B, 1, 2, 2]
    sub_sel = refsel[ry, rx][:, None]
    sub_comp = comp[ry, rx][:, None]
    sub_filt = filt[ry, rx][:, None]
    ones = jnp.ones((budget, 1), bool)
    # the gather path derives positions from the local cell index
    # (cy = i*4, cx = 0): fold the true-vs-local delta into the MV
    i = jnp.arange(budget)
    sub_mv = sub_mv.at[..., 0].add(
        (rx * 4 * (16 // mvsx))[:, None, None])
    sub_mv = sub_mv.at[..., 1].add(
        (((ry - i) * 4) * (16 // mvsy))[:, None, None])
    cells = recon_tpu._mc_cells(refstack, sub_mv, sub_sel, sub_comp,
                                sub_filt, ones, w, h, bpp, mvsx, mvsy)
    cells = cells.reshape(budget, 4, 4)
    rr = ry[:, None, None] * 4 + jnp.arange(4)[None, :, None]
    cc = rx[:, None, None] * 4 + jnp.arange(4)[None, None, :]
    sel = bad[ry, rx]
    rr = jnp.where(sel[:, None, None], rr, 1 << 20)
    out = out.at[rr, cc].set(cells, mode="drop")
    return out, n > budget


def mc_cells(refstack, mv16, refsel, comp, filt, inter_mask, w, h, bpp,
             mvsx=1, mvsy=1, has_comp=True, x0=None):
    """MXU MC + compacted fixup; overflow falls back to the gather path
    for the whole plane. x0: stripe offset for the sharded path (the
    fixup/fallback gather paths work on the absolute MVs unchanged)."""
    from . import recon_tpu
    out, bad = mc_cells_mxu_plane(refstack, mv16, refsel, comp, filt,
                                  inter_mask, w, h, bpp, mvsx, mvsy,
                                  has_comp, x0=x0)
    out, overflow = mc_cells_fixup(out, bad, refstack, mv16, refsel,
                                   comp, filt, w, h, bpp, mvsx, mvsy)
    full = jax.lax.cond(
        overflow,
        lambda: recon_tpu._mc_cells(refstack, mv16, refsel, comp, filt,
                                    inter_mask, w, h, bpp, mvsx, mvsy),
        lambda: out)
    return full
