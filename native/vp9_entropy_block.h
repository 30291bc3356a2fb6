/*
 * Block-level decode for the native pass-A (included by vp9_entropy.c).
 * Mirrors blockdec.py: decode_mode, decode_coeffs, mask_edges,
 * decode_block, decode_sb, tile loop, and the dense grid splats.
 */

/* ---------------- coefficient decode ------------------------------ */

static inline void emit_eob_pair(Ctx *s, int32_t cell, int eob)
{
    if (s->n_eobp >= s->eobp_cap) {
        s->error = -3;
        return;
    }
    int16_t *o = s->eobp_out + (size_t)s->n_eobp * 3;
    o[0] = (int16_t)(cell >> 16);
    o[1] = (int16_t)(cell & 0xffff);
    o[2] = (int16_t)eob;
    s->n_eobp++;
}

static int decode_coeffs_block(Td *td, int32_t *plane, int plane_w,
                               int py, int px, int tx, int is32,
                               const uint8_t *p11 /* [6][6][11] */,
                               int nnz, const int16_t *scan,
                               const int16_t *nb /* [n][2] */,
                               const int16_t *bc, const int32_t *qmul,
                               uint32_t *cnt /* [6][6][3] */,
                               uint32_t *eobcnt /* [6][6][2] */,
                               int32_t *nzc /* nonzero-coef counter */)
{
    /* work on a stack-local copy of the bool decoder: its fields are
     * int/unsigned, which the int32/uint32 output stores below may
     * alias per the C rules — a local (address never escaping) keeps
     * the whole coder state in registers through the hot loop */
    BoolDec bd_local = *td->c;
    BoolDec *c = &bd_local;
    int sz = 4 << tx;
    int n_coeffs = sz * sz;
    uint8_t cache[1024];
    int i = 0, band = 0;
    int band_left = bc[0];
    const uint8_t *tp = p11 + (0 * 6 + nnz) * 11;
    Ctx *s = td->s;
    int bpp = s->bpp;
    int is8 = bpp == 8;
    int emit = s->emit_pairs;
    int nc = !s->skip_counts;   /* counts feed backward adaptation;
                                 * dead in frame-parallel mode */
    memset(cache, 0, n_coeffs);
    if (!emit) {
        /* own the block region: callers reuse the dense plane across
         * frames without re-zeroing (blocks with eob==0 are masked out
         * downstream by the eob grid) */
        for (int r = 0; r < sz; r++)
            memset(&plane[(py + r) * plane_w + px], 0,
                   (size_t)sz * sizeof(int32_t));
    }

    for (;;) {
        int val = bd_prob(c, tp[0]);
        if (nc) eobcnt[(band * 6 + nnz) * 2 + val]++;
        if (!val) break;
        /* zero-run loop */
        while (!bd_prob(c, tp[1])) {
            if (nc) cnt[(band * 6 + nnz) * 3 + 0]++;
            if (!--band_left) band_left = bc[++band];
            cache[scan[i]] = 0;
            nnz = (1 + cache[nb[2 * i]] + cache[nb[2 * i + 1]]) >> 1;
            tp = p11 + ((band > 5 ? 5 : band) * 6 + nnz) * 11;
            if (++i == n_coeffs) goto done;
        }
        int rc = scan[i];
        if (!bd_prob(c, tp[2])) {
            if (nc) cnt[(band * 6 + nnz) * 3 + 1]++;
            val = 1;
            cache[rc] = 1;
        } else {
            if (nc) cnt[(band * 6 + nnz) * 3 + 2]++;
            if (!bd_prob(c, tp[3])) {
                if (!bd_prob(c, tp[4])) {
                    cache[rc] = 2; val = 2;
                } else {
                    val = 3 + bd_prob(c, tp[5]);
                    cache[rc] = 3;
                }
            } else if (!bd_prob(c, tp[6])) {
                cache[rc] = 4;
                if (!bd_prob(c, tp[7])) {
                    val = bd_prob(c, 159) + 5;
                } else {
                    val = (bd_prob(c, 165) << 1) + 7;
                    val += bd_prob(c, 145);
                }
            } else {
                cache[rc] = 5;
                if (!bd_prob(c, tp[8])) {
                    if (!bd_prob(c, tp[9])) {
                        val = 11 + (bd_prob(c, 173) << 2);
                        val += (bd_prob(c, 148) << 1);
                        val += bd_prob(c, 140);
                    } else {
                        val = 19 + (bd_prob(c, 176) << 3);
                        val += (bd_prob(c, 155) << 2);
                        val += (bd_prob(c, 140) << 1);
                        val += bd_prob(c, 135);
                    }
                } else if (!bd_prob(c, tp[10])) {
                    val = (bd_prob(c, 180) << 4) + 35;
                    val += (bd_prob(c, 157) << 3);
                    val += (bd_prob(c, 141) << 2);
                    val += (bd_prob(c, 134) << 1);
                    val += bd_prob(c, 130);
                } else {
                    val = 67;
                    if (!is8) {
                        if (bpp == 12) {
                            val += bd_prob(c, 255) << 17;
                            val += bd_prob(c, 255) << 16;
                        }
                        val += bd_prob(c, 255) << 15;
                        val += bd_prob(c, 255) << 14;
                    }
                    val += bd_prob(c, 254) << 13;
                    val += bd_prob(c, 254) << 12;
                    val += bd_prob(c, 254) << 11;
                    val += bd_prob(c, 252) << 10;
                    val += bd_prob(c, 249) << 9;
                    val += bd_prob(c, 243) << 8;
                    val += bd_prob(c, 230) << 7;
                    val += bd_prob(c, 196) << 6;
                    val += bd_prob(c, 177) << 5;
                    val += bd_prob(c, 153) << 4;
                    val += bd_prob(c, 140) << 3;
                    val += bd_prob(c, 133) << 2;
                    val += bd_prob(c, 130) << 1;
                    val += bd_prob(c, 129);
                }
            }
        }
        if (!--band_left) band_left = bc[++band];
        {
            int q = qmul[i ? 1 : 0];
            int sv = bd_bit(c) ? -val : val;
            /* C semantics: wrap in 32-bit unsigned multiply */
            int32_t prod = (int32_t)((uint32_t)sv * (uint32_t)q);
            int32_t cv;
            if (is32) cv = prod / 2;
            else cv = prod;
            if (is8) cv = (int16_t)cv;
            if (!emit) {
                plane[(py + rc / sz) * plane_w + (px + rc % sz)] = cv;
            } else if (cv) {
                if (s->n_pairs >= s->pairs_cap) {
                    s->error = -3;       /* python retries densely */
                } else {
                    int32_t pos = s->cur_cbase
                        + (py + rc / sz) * plane_w + (px + rc % sz);
                    if (s->pairs_wide) {
                        int16_t *o = s->pairs_out
                            + (size_t)s->n_pairs * 4;
                        o[0] = (int16_t)(pos >> 16);
                        o[1] = (int16_t)(pos & 0xffff);
                        o[2] = (int16_t)(cv >> 16);
                        o[3] = (int16_t)(cv & 0xffff);
                    } else {
                        int16_t *o = s->pairs_out
                            + (size_t)s->n_pairs * 3;
                        o[0] = (int16_t)(pos >> 16);
                        o[1] = (int16_t)(pos & 0xffff);
                        o[2] = (int16_t)cv;
                    }
                    s->n_pairs++;
                }
            }
            if (cv) (*nzc)++;
        }
        if (++i >= n_coeffs) break;
        nnz = (1 + cache[nb[2 * (i - 1)]] + cache[nb[2 * (i - 1) + 1]]) >> 1;
        tp = p11 + (band * 6 + nnz) * 11;
    }
done:
    *td->c = bd_local;  /* write the advanced coder state back */
    return i;
}

static void splat_nnz(uint8_t *arr, int base, int end, int step, int full)
{
    for (int n = 0; n < end; n += step) {
        uint8_t v = arr[base + n];
        if (full) {
            for (int k = 1; k < step; k++) arr[base + n + k] = v;
        } else {
            int fill = end - n - 1;
            if (fill > step - 1) fill = step - 1;
            for (int k = 1; k <= fill; k++) arr[base + n + k] = v;
        }
    }
}

static int decode_coeffs(Td *td)
{
    Ctx *s = td->s;
    int row = td->row, col = td->col, row7 = td->row7;
    int w4 = bwh_tab[1][td->bs][0] << 1;
    int h4 = bwh_tab[1][td->bs][1] << 1;
    int end_x = 2 * (s->cols - col); if (end_x > w4) end_x = w4;
    int end_y = 2 * (s->rows - row); if (end_y > h4) end_y = h4;
    const int32_t *qm = &s->qmul[td->seg_id][0][0];
    int tx = 4 * s->lossless + td->tx;
    int is_inter = td->intra ? 0 : 1;
    const uint8_t *p = s->coef11 + (((td->tx * 2 + 0) * 2 + is_inter)
                                    * 6 * 6 * 11);
    uint32_t *cnt = s->c_coef + (((td->tx * 2 + 0) * 2 + is_inter) * 6*6*3);
    uint32_t *eobc = s->c_eob + (((td->tx * 2 + 0) * 2 + is_inter) * 6*6*2);
    const int16_t *ybc = band_counts[td->tx];
    const int16_t *uvbc = band_counts[td->uvtx];
    uint8_t *a = s->a_ynnz;
    uint8_t *l = td->l_ynnz;
    int a0 = col * 2, l0 = row7 * 2;
    int total = 0;
    int step = 1 << td->tx;
    int W64 = s->sb_cols * 64;
    int W64uv = W64 >> s->ss_h;
    int c16 = s->sb_cols * 16;
    int c16uv = c16 >> s->ss_h;

    if (step > 1) {
        for (int n = 0; n < end_y; n += step) {
            int any = 0;
            for (int k = 0; k < step; k++) any |= l[l0 + n + k];
            l[l0 + n] = any ? 1 : 0;
        }
        for (int n = 0; n < end_x; n += step) {
            int any = 0;
            for (int k = 0; k < step; k++) any |= a[a0 + n + k];
            a[a0 + n] = any ? 1 : 0;
        }
    }

    int is32 = td->tx == TX_32X32;
    int n = 0;
    s->cur_cbase = s->cbase[0];
    for (int y = 0; y < end_y; y += step) {
        for (int x = 0; x < end_x; x += step) {
            int mode_idx = (td->bs > BS_8x8 && td->tx == TX_4X4) ? n : 0;
            int txtp = s->t_intra_txfm_type[td->mode[mode_idx]];
            int nnz = a[a0 + x] + l[l0 + y];
            int py = row * 8 + y * 4, px = col * 8 + x * 4;
            const int16_t *scan = s->t_scans + (tx * 4 + txtp) * 1024;
            const int16_t *nb = s->t_scans_nb + (tx * 4 + txtp) * 2048;
            int ret = decode_coeffs_block(td, s->coef_y, W64, py, px,
                                          td->tx, is32, p, nnz, scan, nb,
                                          ybc, qm, cnt, eobc,
                                          &s->nnz_cnt[0]);
            a[a0 + x] = l[l0 + y] = ret ? 1 : 0;
            total |= ret ? 1 : 0;
            if (ret) s->eob_cnt[0]++;
            s->eob_y[(row * 2 + y) * c16 + col * 2 + x] = ret;
            if (s->emit_pairs && ret)
                emit_eob_pair(s, s->ebase[0] + (row * 2 + y) * c16
                                 + col * 2 + x, ret);
            n += step * step;
        }
    }
    if (step > 1) {
        splat_nnz(a, a0, end_x, step, end_x == w4);
        splat_nnz(l, l0, end_y, step, end_y == h4);
    }

    /* UV */
    p = s->coef11 + (((td->uvtx * 2 + 1) * 2 + is_inter) * 6 * 6 * 11);
    cnt = s->c_coef + (((td->uvtx * 2 + 1) * 2 + is_inter) * 6 * 6 * 3);
    eobc = s->c_eob + (((td->uvtx * 2 + 1) * 2 + is_inter) * 6 * 6 * 2);
    w4 >>= s->ss_h; end_x >>= s->ss_h;
    h4 >>= s->ss_v; end_y >>= s->ss_v;
    int ustep = 1 << td->uvtx;
    int uis32 = td->uvtx == TX_32X32;
    int uvtx_l = td->uvtx + 4 * s->lossless;
    const int16_t *uvscan = s->t_scans + (uvtx_l * 4 + 0) * 1024;
    const int16_t *uvnb = s->t_scans_nb + (uvtx_l * 4 + 0) * 2048;
    for (int pl = 0; pl < 2; pl++) {
        uint8_t *au = pl ? s->a_uvnnz1 : s->a_uvnnz0;
        uint8_t *lu = td->l_uvnnz[pl];
        int au0 = col << (1 - s->ss_h);
        int lu0 = row7 << (1 - s->ss_v);
        int32_t *coefp = pl ? s->coef_v : s->coef_u;
        int32_t *eobp = pl ? s->eob_v : s->eob_u;
        s->cur_cbase = s->cbase[1 + pl];
        if (ustep > 1) {
            for (int m = 0; m < end_y; m += ustep) {
                int any = 0;
                for (int k = 0; k < ustep; k++) any |= lu[lu0 + m + k];
                lu[lu0 + m] = any ? 1 : 0;
            }
            for (int m = 0; m < end_x; m += ustep) {
                int any = 0;
                for (int k = 0; k < ustep; k++) any |= au[au0 + m + k];
                au[au0 + m] = any ? 1 : 0;
            }
        }
        for (int y = 0; y < end_y; y += ustep) {
            for (int x = 0; x < end_x; x += ustep) {
                int nnz = au[au0 + x] + lu[lu0 + y];
                int py = ((row * 8) >> s->ss_v) + y * 4;
                int px = ((col * 8) >> s->ss_h) + x * 4;
                int ret = decode_coeffs_block(td, coefp, W64uv, py, px,
                                              td->uvtx, uis32, p, nnz,
                                              uvscan, uvnb, uvbc, qm + 2,
                                              cnt, eobc,
                                              &s->nnz_cnt[1 + pl]);
                au[au0 + x] = lu[lu0 + y] = ret ? 1 : 0;
                total |= ret ? 1 : 0;
                if (ret) s->eob_cnt[1 + pl]++;
                eobp[((row * 2 >> s->ss_v) + y) * c16uv
                     + (col * 2 >> s->ss_h) + x] = ret;
                if (s->emit_pairs && ret)
                    emit_eob_pair(s, s->ebase[1 + pl]
                                     + ((row * 2 >> s->ss_v) + y) * c16uv
                                     + (col * 2 >> s->ss_h) + x, ret);
            }
        }
        if (ustep > 1) {
            splat_nnz(au, au0, end_x, ustep, end_x == w4);
            splat_nnz(lu, lu0, end_y, ustep, end_y == h4);
        }
    }
    return total;
}

/* ---------------- mask_edges (mirrors blockdec.mask_edges) --------- */

static void mask_edges(int32_t *mask /* [2][8][4] */, int ss_h, int ss_v,
                       int row_and_7, int col_and_7, int w, int h,
                       int col_end, int row_end, int tx, int skip_inter)
{
    static const unsigned wf_col[2] = {0x11, 0x01};
    static const unsigned wf_row[2] = {0x03, 0x07};
#define M(a, y, b) mask[((a) * 8 + (y)) * 4 + (b)]

    if (tx == TX_4X4 && (ss_v | ss_h)) {
        if (h == ss_v) {
            if (row_and_7 & 1) return;
            if (!row_end) h += 1;
        }
        if (w == ss_h) {
            if (col_and_7 & 1) return;
            if (!col_end) w += 1;
        }
    }
    if (tx == TX_4X4 && !skip_inter) {
        int t = 1 << col_and_7, m_col = (t << w) - t;
        int m_row_8 = m_col & wf_col[ss_h], m_row_4 = m_col - m_row_8;
        for (int y = row_and_7; y < h + row_and_7; y++) {
            int cmid = 2 - !(y & wf_row[ss_v]);
            M(0, y, 1) |= m_row_8;
            M(0, y, 2) |= m_row_4;
            if ((ss_h & ss_v) && (col_end & 1) && (y & 1))
                M(1, y, cmid) |= (t << (w - 1)) - t;
            else
                M(1, y, cmid) |= m_col;
            if (!ss_h) M(0, y, 3) |= m_col;
            if (!ss_v) {
                if (ss_h && (col_end & 1))
                    M(1, y, 3) |= (t << (w - 1)) - t;
                else
                    M(1, y, 3) |= m_col;
            }
        }
    } else {
        int t = 1 << col_and_7, m_col = (t << w) - t;
        if (!skip_inter) {
            int mask_id = (tx == TX_8X8);
            static const unsigned masks[4] = {0xff, 0x55, 0x11, 0x01};
            int l2 = tx + ss_h - 1;
            int m_row = m_col & masks[l2];
            if (ss_h && tx > TX_8X8 && (w ^ (w - 1)) == 1) {
                int m_row_16 = ((t << (w - 1)) - t) & masks[l2];
                int m_row_8 = m_row - m_row_16;
                for (int y = row_and_7; y < h + row_and_7; y++) {
                    M(0, y, 0) |= m_row_16;
                    M(0, y, 1) |= m_row_8;
                }
            } else {
                for (int y = row_and_7; y < h + row_and_7; y++)
                    M(0, y, mask_id) |= m_row;
            }
            l2 = tx + ss_v - 1;
            int step1d = 1 << l2;
            if (ss_v && tx > TX_8X8 && (h ^ (h - 1)) == 1) {
                int y = row_and_7;
                for (; y < h + row_and_7 - 1; y += step1d)
                    M(1, y, 0) |= m_col;
                if (y - row_and_7 == h - 1)
                    M(1, y, 1) |= m_col;
            } else {
                for (int y = row_and_7; y < h + row_and_7; y += step1d)
                    M(1, y, mask_id) |= m_col;
            }
        } else if (tx != TX_4X4) {
            int mask_id = (tx == TX_8X8) || (h == ss_v);
            M(1, row_and_7, mask_id) |= m_col;
            mask_id = (tx == TX_8X8) || (w == ss_h);
            for (int y = row_and_7; y < h + row_and_7; y++)
                M(0, y, mask_id) |= t;
        } else {
            int t8 = t & wf_col[ss_h], t4 = t - t8;
            for (int y = row_and_7; y < h + row_and_7; y++) {
                M(0, y, 2) |= t4;
                M(0, y, 1) |= t8;
            }
            M(1, row_and_7, 2 - !(row_and_7 & wf_row[ss_v])) |= m_col;
        }
    }
#undef M
}
