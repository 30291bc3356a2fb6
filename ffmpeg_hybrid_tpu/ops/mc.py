"""VP9 motion compensation: 8-tap/bilinear sub-pel interpolation with
edge-clamped reference access, exact integer math (numpy golden).

Behavioral reference: mc_luma/chroma_unscaled (vp9recon.c:376-467) with
the emulated-edge semantics folded into coordinate clamping (identical
results: emulated_edge_mc replicates frame-edge pixels), and the filter
kernels FILTER_8TAP / FILTER_BILIN (vp9dsp_template.c:2025-2270), incl.
the clipped-pixel intermediate of the 2-D path. Scaled-reference MC
mirrors do_scaled_8tap_c / do_scaled_bilin_c (vp9dsp_template.c:2363-2480)
and mc_luma/chroma_scaled (vp9recon.c:492-628).
"""
import numpy as np

from ..codecs.vp9 import tables as T

FILTER_BILINEAR = 3


def _clip_px(v, bpp):
    return np.clip(v, 0, (1 << bpp) - 1)


def _gather(ref, y0, y1, x0, x1, w, h):
    """ref[y0:y1, x0:x1] with coordinates clamped to the visible area
    [0,h-1]x[0,w-1] (emulated-edge replication semantics)."""
    ys = np.clip(np.arange(y0, y1), 0, h - 1)
    xs = np.clip(np.arange(x0, x1), 0, w - 1)
    return ref[np.ix_(ys, xs)]


def _filt8_h(src, F, bw, bpp):
    """Horizontal 8-tap over [rows, bw+7] -> [rows, bw], clipped."""
    acc = np.zeros((src.shape[0], bw), np.int32)
    for k in range(8):
        acc += int(F[k]) * src[:, k:k + bw]
    return _clip_px((acc + 64) >> 7, bpp)


def _filt8_v(src, F, bh, bpp):
    acc = np.zeros((bh, src.shape[1]), np.int32)
    for k in range(8):
        acc += int(F[k]) * src[k:k + bh, :]
    return _clip_px((acc + 64) >> 7, bpp)


def _bilin_h(src, mxy, bw, bpp):
    a = src[:, :bw]
    b = src[:, 1:bw + 1]
    return a + ((mxy * (b - a) + 8) >> 4)


def _bilin_v(src, mxy, bh, bpp):
    a = src[:bh, :]
    b = src[1:bh + 1, :]
    return a + ((mxy * (b - a) + 8) >> 4)


def mc_unscaled(dst, py, px, ref, y, x, bw, bh, mv16x, mv16y, w, h, filt,
                avg, bpp):
    """Motion-compensate one block into dst[py:py+bh, px:px+bw].

    ref: reference plane (padded numpy array), (w, h) its VISIBLE size.
    (y, x): block position in the reference plane; (mv16x, mv16y): MV in
    1/16-pel units of this plane. filt: 0 smooth, 1 regular, 2 sharp,
    3 bilinear. avg: compound-average into existing dst content.
    """
    y += mv16y >> 4
    x += mv16x >> 4
    mx = mv16x & 15
    my = mv16y & 15

    if filt == FILTER_BILINEAR:
        if mx and my:
            src = _gather(ref, y, y + bh + 1, x, x + bw + 1, w, h
                          ).astype(np.int32)
            tmp = _clip_px(_bilin_h(src, mx, bw, bpp), bpp)
            block = _clip_px(_bilin_v(tmp, my, bh, bpp), bpp)
        elif mx:
            src = _gather(ref, y, y + bh, x, x + bw + 1, w, h
                          ).astype(np.int32)
            block = _clip_px(_bilin_h(src, mx, bw, bpp), bpp)
        elif my:
            src = _gather(ref, y, y + bh + 1, x, x + bw, w, h
                          ).astype(np.int32)
            block = _clip_px(_bilin_v(src, my, bh, bpp), bpp)
        else:
            block = _gather(ref, y, y + bh, x, x + bw, w, h
                            ).astype(np.int32)
    else:
        filters = T.SUBPEL_FILTERS[filt]
        if mx and my:
            src = _gather(ref, y - 3, y + bh + 4, x - 3, x + bw + 4, w, h
                          ).astype(np.int32)
            tmp = _filt8_h(src, filters[mx], bw, bpp)  # [bh+7, bw] clipped
            block = _filt8_v(tmp, filters[my], bh, bpp)
        elif mx:
            src = _gather(ref, y, y + bh, x - 3, x + bw + 4, w, h
                          ).astype(np.int32)
            block = _filt8_h(src, filters[mx], bw, bpp)
        elif my:
            src = _gather(ref, y - 3, y + bh + 4, x, x + bw, w, h
                          ).astype(np.int32)
            block = _filt8_v(src, filters[my], bh, bpp)
        else:
            block = _gather(ref, y, y + bh, x, x + bw, w, h
                            ).astype(np.int32)

    if avg:
        dst[py:py + bh, px:px + bw] = \
            (dst[py:py + bh, px:px + bw] + block + 1) >> 1
    else:
        dst[py:py + bh, px:px + bw] = block


def mc_scaled(dst, py, px, ref, y, x, bw, bh, mx, my, dx, dy, w, h, filt,
              avg, bpp, tmp_h_extra=8):
    """Scaled-reference MC: per-pixel fractional stepping.
    (mx, my): initial 1/16 phases; (dx, dy): per-pixel steps (1/16 units).
    (y, x): starting integer position in the ref plane.

    reference: do_scaled_8tap_c (vp9dsp_template.c:2363-2410) and
    do_scaled_bilin_c (:2446-2500).
    """
    bilin = filt == FILTER_BILINEAR
    taps_before = 0 if bilin else 3
    taps_after = 1 if bilin else 4
    tmp_h = (((bh - 1) * dy + my) >> 4) + (2 if bilin else 8)
    # horizontal source extent: last output x reads
    # ioff_max + taps window; ioff advances by (mx + k*dx) >> 4 cumulative
    max_ioff = ((bw - 1) * dx + mx) >> 4
    src = _gather(ref, y - taps_before, y - taps_before + tmp_h,
                  x - taps_before, x + max_ioff + bw + taps_after + 4,
                  w, h).astype(np.int32)
    filters = T.SUBPEL_FILTERS[filt] if not bilin else None

    tmp = np.zeros((tmp_h, bw), np.int32)
    imx = mx
    ioff = 0
    for ox in range(bw):
        base = ioff  # offset into src columns (src col 0 == x - taps_before)
        if bilin:
            a = src[:, base]
            b = src[:, base + 1]
            tmp[:, ox] = _clip_px(a + ((imx * (b - a) + 8) >> 4), bpp)
        else:
            F = filters[imx]
            acc = np.zeros(tmp_h, np.int32)
            for k in range(8):
                acc += int(F[k]) * src[:, base + k]
            tmp[:, ox] = _clip_px((acc + 64) >> 7, bpp)
        imx += dx
        ioff += imx >> 4
        imx &= 0xF
    # vertical pass with stepping
    out = np.zeros((bh, bw), np.int32)
    ty = 0
    vmy = my
    for oy in range(bh):
        if bilin:
            a = tmp[ty]
            b = tmp[ty + 1]
            out[oy] = _clip_px(a + ((vmy * (b - a) + 8) >> 4), bpp)
        else:
            F = filters[vmy]
            acc = np.zeros(bw, np.int32)
            for k in range(8):
                acc += int(F[k]) * tmp[ty + k]
            out[oy] = _clip_px((acc + 64) >> 7, bpp)
        vmy += dy
        ty += vmy >> 4
        vmy &= 0xF
    if avg:
        dst[py:py + bh, px:px + bw] = \
            (dst[py:py + bh, px:px + bw] + out + 1) >> 1
    else:
        dst[py:py + bh, px:px + bw] = out
