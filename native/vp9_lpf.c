/*
 * Native VP9 loop filter over int32 planes (host stage of pass B while
 * the TPU wavefront LF is built). C port of the verified ops/lpf.py
 * (behavioral reference: vp9dsp_template.c:1780-1889, vp9lpf.c:31-230).
 * Built into libvp9passa.so (native/build.sh).
 */
#include <stdint.h>
#include <stdlib.h>

static inline int lclip(int v, int lo, int hi)
{ return v < lo ? lo : v > hi ? hi : v; }

/* filter 8 (or nlanes) lanes at an edge.
 * dir 0: vertical edge at column px, lanes = rows py..py+nlanes-1
 * dir 1: horizontal edge at row py, lanes = cols px..px+nlanes-1 */
typedef struct {
    int32_t *plane;
    int W, H, bpp;
    /* record mode */
    int16_t *rec;       /* [n][8]: sb, py, px, dir, wd, E, I, H */
    int rec_max, rec_n, rec_sb, recording;
} LfCtx;

static void lf_filter_edge(int32_t *plane, int W, int H, int py, int px,
                     int dir, int wd, int E, int I, int Hthr, int bpp,
                     int nlanes)
{
    int F = 1 << (bpp - 8);
    E <<= (bpp - 8); I <<= (bpp - 8); Hthr <<= (bpp - 8);
    int maxp = (1 << bpp) - 1;
    int maxs = (1 << (bpp - 1)) - 1, mins = -(1 << (bpp - 1));

    for (int i = 0; i < nlanes; i++) {
        int32_t *b;
        int stride;
        if (dir == 0) { b = plane + (py + i) * W + px; stride = 1; }
        else          { b = plane + py * W + px + i;   stride = W; }
        int p3 = b[-4 * stride], p2 = b[-3 * stride];
        int p1 = b[-2 * stride], p0 = b[-1 * stride];
        int q0 = b[0], q1 = b[1 * stride];
        int q2 = b[2 * stride], q3 = b[3 * stride];
#define AB(x) ((x) < 0 ? -(x) : (x))
        int fm = AB(p3 - p2) <= I && AB(p2 - p1) <= I &&
                 AB(p1 - p0) <= I && AB(q1 - q0) <= I &&
                 AB(q2 - q1) <= I && AB(q3 - q2) <= I &&
                 AB(p0 - q0) * 2 + (AB(p1 - q1) >> 1) <= E;
        if (!fm) continue;

        if (wd >= 16) {
            int p7 = b[-8 * stride], p6 = b[-7 * stride];
            int p5 = b[-6 * stride], p4 = b[-5 * stride];
            int q4 = b[4 * stride], q5 = b[5 * stride];
            int q6 = b[6 * stride], q7 = b[7 * stride];
            int flat8out = AB(p7 - p0) <= F && AB(p6 - p0) <= F &&
                           AB(p5 - p0) <= F && AB(p4 - p0) <= F &&
                           AB(q4 - q0) <= F && AB(q5 - q0) <= F &&
                           AB(q6 - q0) <= F && AB(q7 - q0) <= F;
            int flat8in = AB(p3 - p0) <= F && AB(p2 - p0) <= F &&
                          AB(p1 - p0) <= F && AB(q1 - q0) <= F &&
                          AB(q2 - q0) <= F && AB(q3 - q0) <= F;
            if (flat8out && flat8in) {
                b[-7 * stride] = (p7 + p7 + p7 + p7 + p7 + p7 + p7 + p6 * 2
                                  + p5 + p4 + p3 + p2 + p1 + p0 + q0 + 8)
                                 >> 4;
                b[-6 * stride] = (p7 + p7 + p7 + p7 + p7 + p7 + p6 + p5 * 2
                                  + p4 + p3 + p2 + p1 + p0 + q0 + q1 + 8)
                                 >> 4;
                b[-5 * stride] = (p7 + p7 + p7 + p7 + p7 + p6 + p5 + p4 * 2
                                  + p3 + p2 + p1 + p0 + q0 + q1 + q2 + 8)
                                 >> 4;
                b[-4 * stride] = (p7 + p7 + p7 + p7 + p6 + p5 + p4 + p3 * 2
                                  + p2 + p1 + p0 + q0 + q1 + q2 + q3 + 8)
                                 >> 4;
                b[-3 * stride] = (p7 + p7 + p7 + p6 + p5 + p4 + p3 + p2 * 2
                                  + p1 + p0 + q0 + q1 + q2 + q3 + q4 + 8)
                                 >> 4;
                b[-2 * stride] = (p7 + p7 + p6 + p5 + p4 + p3 + p2 + p1 * 2
                                  + p0 + q0 + q1 + q2 + q3 + q4 + q5 + 8)
                                 >> 4;
                b[-1 * stride] = (p7 + p6 + p5 + p4 + p3 + p2 + p1 + p0 * 2
                                  + q0 + q1 + q2 + q3 + q4 + q5 + q6 + 8)
                                 >> 4;
                b[0] = (p6 + p5 + p4 + p3 + p2 + p1 + p0 + q0 * 2
                        + q1 + q2 + q3 + q4 + q5 + q6 + q7 + 8) >> 4;
                b[1 * stride] = (p5 + p4 + p3 + p2 + p1 + p0 + q0 + q1 * 2
                                 + q2 + q3 + q4 + q5 + q6 + q7 + q7 + 8)
                                >> 4;
                b[2 * stride] = (p4 + p3 + p2 + p1 + p0 + q0 + q1 + q2 * 2
                                 + q3 + q4 + q5 + q6 + q7 + q7 + q7 + 8)
                                >> 4;
                b[3 * stride] = (p3 + p2 + p1 + p0 + q0 + q1 + q2 + q3 * 2
                                 + q4 + q5 + q6 + q7 + q7 + q7 + q7 + 8)
                                >> 4;
                b[4 * stride] = (p2 + p1 + p0 + q0 + q1 + q2 + q3 + q4 * 2
                                 + q5 + q6 + q7 + q7 + q7 + q7 + q7 + 8)
                                >> 4;
                b[5 * stride] = (p1 + p0 + q0 + q1 + q2 + q3 + q4 + q5 * 2
                                 + q6 + q7 + q7 + q7 + q7 + q7 + q7 + 8)
                                >> 4;
                b[6 * stride] = (p0 + q0 + q1 + q2 + q3 + q4 + q5 + q6 * 2
                                 + q7 + q7 + q7 + q7 + q7 + q7 + q7 + 8)
                                >> 4;
                continue;
            }
        }
        if (wd >= 8) {
            int flat8in = AB(p3 - p0) <= F && AB(p2 - p0) <= F &&
                          AB(p1 - p0) <= F && AB(q1 - q0) <= F &&
                          AB(q2 - q0) <= F && AB(q3 - q0) <= F;
            if (flat8in) {
                b[-3 * stride] = (p3 + p3 + p3 + 2 * p2 + p1 + p0 + q0 + 4)
                                 >> 3;
                b[-2 * stride] = (p3 + p3 + p2 + 2 * p1 + p0 + q0 + q1 + 4)
                                 >> 3;
                b[-1 * stride] = (p3 + p2 + p1 + 2 * p0 + q0 + q1 + q2 + 4)
                                 >> 3;
                b[0] = (p2 + p1 + p0 + 2 * q0 + q1 + q2 + q3 + 4) >> 3;
                b[1 * stride] = (p1 + p0 + q0 + 2 * q1 + q2 + q3 + q3 + 4)
                                >> 3;
                b[2 * stride] = (p0 + q0 + q1 + 2 * q2 + q3 + q3 + q3 + 4)
                                >> 3;
                continue;
            }
        }
        {
            int hev = AB(p1 - p0) > Hthr || AB(q1 - q0) > Hthr;
            if (hev) {
                int f = lclip(p1 - q1, mins, maxs);
                f = lclip(3 * (q0 - p0) + f, mins, maxs);
                int f1 = (f + 4 > maxs ? maxs : f + 4) >> 3;
                int f2 = (f + 3 > maxs ? maxs : f + 3) >> 3;
                b[-1 * stride] = lclip(p0 + f2, 0, maxp);
                b[0] = lclip(q0 - f1, 0, maxp);
            } else {
                int f = lclip(3 * (q0 - p0), mins, maxs);
                int f1 = (f + 4 > maxs ? maxs : f + 4) >> 3;
                int f2 = (f + 3 > maxs ? maxs : f + 3) >> 3;
                b[-1 * stride] = lclip(p0 + f2, 0, maxp);
                b[0] = lclip(q0 - f1, 0, maxp);
                f = (f1 + 1) >> 1;
                b[-2 * stride] = lclip(p1 + f, 0, maxp);
                b[1 * stride] = lclip(q1 - f, 0, maxp);
            }
        }
#undef AB
    }
}

static void lf_apply(LfCtx *c, int py, int px, int dir, int wd,
                     int E, int I, int Hthr, int nlanes)
{
    if (c->recording) {
        /* split 16-lane calls into two 8-lane records */
        int parts = nlanes > 8 ? 2 : 1;
        for (int p = 0; p < parts; p++) {
            if (c->rec_n < c->rec_max) {
                int16_t *r = &c->rec[c->rec_n * 8];
                r[0] = c->rec_sb;
                r[1] = py + (dir == 0 ? p * 8 : 0);
                r[2] = px + (dir == 1 ? p * 8 : 0);
                r[3] = dir; r[4] = wd; r[5] = E; r[6] = I;
                r[7] = Hthr;
                c->rec_n++;
            }
        }
        return;
    }
    lf_filter_edge(c->plane, c->W, c->H, py, px, dir, wd, E, I,
                   Hthr, c->bpp, nlanes);
}

static void lf_cols(LfCtx *lc, int base_y, int base_x,
                    int col, int ss_h, int ss_v, const uint8_t *level,
                    const int32_t *mask /* [8][4] */,
                    const int32_t *lim, const int32_t *mblim, int bpp)
{
    int lvl = 0;
    int it = 0;
    for (int y = 0; y < 8; y += 2 << ss_v, it++, lvl += 16 << ss_v) {
        const int32_t *h1 = &mask[y * 4];
        const int32_t *h2 = &mask[(y + 1 + ss_v) * 4];
        unsigned hm1 = h1[0] | h1[1] | h1[2], hm13 = h1[3];
        unsigned hm2 = h2[1] | h2[2], hm23 = h2[3];
        unsigned hm = hm1 | hm2 | hm13 | hm23;
        int l = lvl, cx = 0;
        int py = base_y + it * 16;
        for (unsigned x = 1; hm & ~(x - 1); x <<= 1, cx++) {
            int px = base_x + cx * (8 >> ss_h);
            if (col || x > 1) {
                if (hm1 & x) {
                    int L = level[l], Hh = L >> 4;
                    int E = mblim[L], I = lim[L];
                    if (h1[0] & x) {
                        if (h2[0] & x)
                            lf_apply(lc, py, px, 0, 16, E, I, Hh, 16);
                        else
                            lf_apply(lc, py, px, 0, 16, E, I, Hh, 8);
                    } else if (hm2 & x) {
                        int wd1 = (h1[1] & x) ? 8 : 4;
                        int wd2 = (h2[1] & x) ? 8 : 4;
                        lf_apply(lc, py, px, 0, wd1, E, I, Hh, 8);
                        int L2 = level[l + (8 << ss_v)];
                        lf_apply(lc, py + 8, px, 0, wd2,
                                 mblim[L2], lim[L2], L2 >> 4, 8);
                    } else {
                        int wd1 = (h1[1] & x) ? 8 : 4;
                        lf_apply(lc, py, px, 0, wd1, E, I, Hh, 8);
                    }
                } else if (hm2 & x) {
                    int L = level[l + (8 << ss_v)];
                    int wd2 = (h2[1] & x) ? 8 : 4;
                    lf_apply(lc, py + 8, px, 0, wd2, mblim[L],
                             lim[L], L >> 4, 8);
                }
            }
            if (ss_h) {
                if (x & 0xAA) l += 2;
            } else {
                if (hm13 & x) {
                    int L = level[l];
                    lf_apply(lc, py, px + 4, 0, 4, mblim[L],
                             lim[L], L >> 4, 8);
                    if (hm23 & x) {
                        int L2 = level[l + (8 << ss_v)];
                        lf_apply(lc, py + 8, px + 4, 0, 4,
                                 mblim[L2], lim[L2], L2 >> 4, 8);
                    }
                } else if (hm23 & x) {
                    int L = level[l + (8 << ss_v)];
                    lf_apply(lc, py + 8, px + 4, 0, 4, mblim[L],
                             lim[L], L >> 4, 8);
                }
                l++;
            }
        }
    }
}

static void lf_rows(LfCtx *lc, int base_y, int base_x,
                    int row, int ss_h, int ss_v, const uint8_t *level,
                    const int32_t *mask, const int32_t *lim,
                    const int32_t *mblim, int bpp)
{
    int lvl = 0;
    for (int y = 0; y < 8; y++) {
        const int32_t *vm_ = &mask[y * 4];
        unsigned vm = vm_[0] | vm_[1] | vm_[2], vm3 = vm_[3];
        int py = base_y + y * (8 >> ss_v);
        int l = lvl, cx = 0;
        for (unsigned x = 1; vm & ~(x - 1);
             x <<= 2 << ss_h, cx++, l += 2 << ss_h) {
            int px = base_x + cx * 16;
            unsigned x2 = x << (1 + ss_h);
            if (row || y) {
                if (vm & x) {
                    int L = level[l], Hh = L >> 4;
                    int E = mblim[L], I = lim[L];
                    if (vm_[0] & x) {
                        if (vm_[0] & x2)
                            lf_apply(lc, py, px, 1, 16, E, I, Hh, 16);
                        else
                            lf_apply(lc, py, px, 1, 16, E, I, Hh, 8);
                    } else if (vm & x2) {
                        int wd1 = (vm_[1] & x) ? 8 : 4;
                        int wd2 = (vm_[1] & x2) ? 8 : 4;
                        lf_apply(lc, py, px, 1, wd1, E, I, Hh, 8);
                        int L2 = level[l + 1 + ss_h];
                        lf_apply(lc, py, px + 8, 1, wd2,
                                 mblim[L2], lim[L2], L2 >> 4, 8);
                    } else {
                        int wd1 = (vm_[1] & x) ? 8 : 4;
                        lf_apply(lc, py, px, 1, wd1, E, I, Hh, 8);
                    }
                } else if (vm & x2) {
                    int L = level[l + 1 + ss_h];
                    int wd2 = (vm_[1] & x2) ? 8 : 4;
                    lf_apply(lc, py, px + 8, 1, wd2, mblim[L],
                             lim[L], L >> 4, 8);
                }
            }
            if (!ss_v) {
                if (vm3 & x) {
                    int L = level[l];
                    lf_apply(lc, py + 4, px, 1, 4, mblim[L],
                             lim[L], L >> 4, 8);
                    if (vm3 & x2) {
                        int L2 = level[l + 1 + ss_h];
                        lf_apply(lc, py + 4, px + 8, 1, 4,
                                 mblim[L2], lim[L2], L2 >> 4, 8);
                    }
                } else if (vm3 & x2) {
                    int L = level[l + 1 + ss_h];
                    lf_apply(lc, py + 4, px + 8, 1, 4, mblim[L],
                             lim[L], L >> 4, 8);
                }
            }
        }
        if (ss_v) { if (y & 1) lvl += 16; }
        else lvl += 8;
    }
}

void vp9_loopfilter_frame(int32_t *py_, int32_t *pu, int32_t *pv,
                          int Wy, int Hy, int Wuv, int Huv,
                          const uint8_t *lf_level,
                          const int32_t *lf_mask,
                          int sb_rows, int sb_cols, int ss_h, int ss_v,
                          const int32_t *lim, const int32_t *mblim,
                          int bpp)
{
    int uvidx = (ss_h | ss_v) ? 1 : 0;
    LfCtx cy = { py_, Wy, Hy, bpp, 0, 0, 0, 0, 0 };
    LfCtx cu = { pu, Wuv, Huv, bpp, 0, 0, 0, 0, 0 };
    LfCtx cv = { pv, Wuv, Huv, bpp, 0, 0, 0, 0, 0 };
    for (int sbr = 0; sbr < sb_rows; sbr++) {
        for (int sbc = 0; sbc < sb_cols; sbc++) {
            const uint8_t *lv = &lf_level[(sbr * sb_cols + sbc) * 64];
            const int32_t *mk = &lf_mask[(sbr * sb_cols + sbc) * 128];
            int row = sbr * 8, col = sbc * 8;
            int y0 = row * 8, x0 = col * 8;
            lf_cols(&cy, y0, x0, col, 0, 0, lv, mk + 0 * 32, lim,
                    mblim, bpp);
            lf_rows(&cy, y0, x0, row, 0, 0, lv, mk + 1 * 32, lim,
                    mblim, bpp);
            int uy0 = y0 >> ss_v, ux0 = x0 >> ss_h;
            lf_cols(&cu, uy0, ux0, col, ss_h, ss_v, lv,
                    mk + (uvidx * 2 + 0) * 32, lim, mblim, bpp);
            lf_rows(&cu, uy0, ux0, row, ss_h, ss_v, lv,
                    mk + (uvidx * 2 + 1) * 32, lim, mblim, bpp);
            lf_cols(&cv, uy0, ux0, col, ss_h, ss_v, lv,
                    mk + (uvidx * 2 + 0) * 32, lim, mblim, bpp);
            lf_rows(&cv, uy0, ux0, row, ss_h, ss_v, lv,
                    mk + (uvidx * 2 + 1) * 32, lim, mblim, bpp);
        }
    }
}

/* Record mode: emit the exact edge-call sequences for the TPU replay.
 * y_rec/uv_rec: int16 [max][8] = (sb_index, py, px, dir, wd, E, I, H);
 * 16-lane calls are split into two 8-lane records. Returns counts via
 * out_ny/out_nuv. Coordinates are plane-local (y plane / uv plane). */
void vp9_lpf_record(const uint8_t *lf_level, const int32_t *lf_mask,
                    int sb_rows, int sb_cols, int ss_h, int ss_v,
                    const int32_t *lim, const int32_t *mblim, int bpp,
                    int16_t *y_rec, int y_max, int32_t *out_ny,
                    int16_t *uv_rec, int uv_max, int32_t *out_nuv)
{
    int uvidx = (ss_h | ss_v) ? 1 : 0;
    LfCtx cy = { 0, 0, 0, bpp, y_rec, y_max, 0, 0, 1 };
    LfCtx cu = { 0, 0, 0, bpp, uv_rec, uv_max, 0, 0, 1 };
    for (int sbr = 0; sbr < sb_rows; sbr++) {
        for (int sbc = 0; sbc < sb_cols; sbc++) {
            const uint8_t *lv = &lf_level[(sbr * sb_cols + sbc) * 64];
            const int32_t *mk = &lf_mask[(sbr * sb_cols + sbc) * 128];
            int row = sbr * 8, col = sbc * 8;
            int y0 = row * 8, x0 = col * 8;
            cy.rec_sb = cu.rec_sb = sbr * sb_cols + sbc;
            lf_cols(&cy, y0, x0, col, 0, 0, lv, mk + 0 * 32, lim,
                    mblim, bpp);
            lf_rows(&cy, y0, x0, row, 0, 0, lv, mk + 1 * 32, lim,
                    mblim, bpp);
            int uy0 = y0 >> ss_v, ux0 = x0 >> ss_h;
            lf_cols(&cu, uy0, ux0, col, ss_h, ss_v, lv,
                    mk + (uvidx * 2 + 0) * 32, lim, mblim, bpp);
            lf_rows(&cu, uy0, ux0, row, ss_h, ss_v, lv,
                    mk + (uvidx * 2 + 1) * 32, lim, mblim, bpp);
        }
    }
    *out_ny = cy.rec_n;
    *out_nuv = cu.rec_n;
}
