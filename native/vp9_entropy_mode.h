/*
 * Mode decode + block/superblock walk for the native pass-A
 * (included by vp9_entropy.c after vp9_entropy_block.h).
 * Mirrors blockdec.py decode_mode/_decode_mode_inter/decode_block/
 * decode_sb and decoder.py record_block grid splats.
 */

static inline int rdiv2(int a, int b)
{
    int su = a + b;
    return su >= 0 ? (su + 1) / 2 : -((-su + 1) / 2);
}

static inline int rdiv4(int su)
{
    return su >= 0 ? (su + 2) / 4 : -((-su + 2) / 4);
}

static void decode_mode_inter(Td *td, int have_a, int have_l, int w4,
                              int h4)
{
    Ctx *s = td->s;
    BoolDec *c = td->c;
    int col = td->col, row7 = td->row7;
    int above_intra = s->a_intra[col], left_intra = td->l_intra[row7];
    int above_comp = s->a_comp[col], left_comp = td->l_comp[row7];
    int above_ref = s->a_ref[col], left_ref = td->l_ref[row7];
    int fix = s->fixcompref, var1 = s->varcompref1;
    int ctx, bit;

    if (s->seg_enabled && s->seg_ref_en[td->seg_id]) {
        td->comp = 0;
        td->ref[0] = s->seg_ref_val[td->seg_id] - 1;
    } else {
        if (s->comppredmode != PRED_SWITCHABLE) {
            td->comp = s->comppredmode == PRED_COMPREF;
        } else {
            if (have_a) {
                if (have_l) {
                    if (above_comp && left_comp) ctx = 4;
                    else if (above_comp)
                        ctx = 2 + (left_intra || left_ref == fix);
                    else if (left_comp)
                        ctx = 2 + (above_intra || above_ref == fix);
                    else
                        ctx = (!above_intra && above_ref == fix) ^
                              (!left_intra && left_ref == fix);
                } else {
                    ctx = above_comp ? 3 :
                          (!above_intra && above_ref == fix);
                }
            } else if (have_l) {
                ctx = left_comp ? 3 : (!left_intra && left_ref == fix);
            } else ctx = 1;
            td->comp = bd_prob(c, s->p_comp[ctx]);
            s->c_comp[ctx * 2 + td->comp]++;
        }

        if (td->comp) {
            int fix_idx = s->signbias[fix], var_idx = !fix_idx;
            td->ref[fix_idx] = fix;
            if (have_a) {
                if (have_l) {
                    if (above_intra) {
                        ctx = left_intra ? 2 : 1 + 2 * (left_ref != var1);
                    } else if (left_intra) {
                        ctx = 1 + 2 * (above_ref != var1);
                    } else {
                        int refl = left_ref, refa = above_ref;
                        if (refl == refa && refa == var1) ctx = 0;
                        else if (!left_comp && !above_comp) {
                            if ((refa == fix && refl == s->varcompref0) ||
                                (refl == fix && refa == s->varcompref0))
                                ctx = 4;
                            else ctx = (refa == refl) ? 3 : 1;
                        } else if (!left_comp) {
                            if (refa == var1 && refl != var1) ctx = 1;
                            else ctx = (refl == var1 && refa != var1)
                                       ? 2 : 4;
                        } else if (!above_comp) {
                            if (refl == var1 && refa != var1) ctx = 1;
                            else ctx = (refa == var1 && refl != var1)
                                       ? 2 : 4;
                        } else {
                            ctx = (refl == refa) ? 4 : 2;
                        }
                    }
                } else {
                    if (above_intra) ctx = 2;
                    else if (above_comp) ctx = 4 * (above_ref != var1);
                    else ctx = 3 * (above_ref != var1);
                }
            } else if (have_l) {
                if (left_intra) ctx = 2;
                else if (left_comp) ctx = 4 * (left_ref != var1);
                else ctx = 3 * (left_ref != var1);
            } else ctx = 2;
            bit = bd_prob(c, s->p_comp_ref[ctx]);
            td->ref[var_idx] = bit ? var1 : s->varcompref0;
            s->c_comp_ref[ctx * 2 + bit]++;
        } else {
            if (have_a && !above_intra) {
                if (have_l && !left_intra) {
                    if (left_comp) {
                        if (above_comp)
                            ctx = 1 + (!fix || !left_ref || !above_ref);
                        else
                            ctx = (3 * !above_ref) + (!fix || !left_ref);
                    } else if (above_comp) {
                        ctx = (3 * !left_ref) + (!fix || !above_ref);
                    } else {
                        ctx = 2 * !left_ref + 2 * !above_ref;
                    }
                } else if (above_intra) ctx = 2;
                else if (above_comp) ctx = 1 + (!fix || !above_ref);
                else ctx = 4 * !above_ref;
            } else if (have_l && !left_intra) {
                if (left_intra) ctx = 2;
                else if (left_comp) ctx = 1 + (!fix || !left_ref);
                else ctx = 4 * !left_ref;
            } else ctx = 2;
            bit = bd_prob(c, s->p_single_ref[ctx * 2 + 0]);
            s->c_single_ref[(ctx * 2 + 0) * 2 + bit]++;
            if (!bit) {
                td->ref[0] = 0;
            } else {
                if (have_a) {
                    if (have_l) {
                        if (left_intra) {
                            if (above_intra) ctx = 2;
                            else if (above_comp)
                                ctx = 1 + 2 * (fix == 1 || above_ref == 1);
                            else if (!above_ref) ctx = 3;
                            else ctx = 4 * (above_ref == 1);
                        } else if (above_intra) {
                            if (left_intra) ctx = 2;
                            else if (left_comp)
                                ctx = 1 + 2 * (fix == 1 || left_ref == 1);
                            else if (!left_ref) ctx = 3;
                            else ctx = 4 * (left_ref == 1);
                        } else if (above_comp) {
                            if (left_comp) {
                                if (left_ref == above_ref)
                                    ctx = 3 * (fix == 1 || left_ref == 1);
                                else ctx = 2;
                            } else if (!left_ref) {
                                ctx = 1 + 2 * (fix == 1 || above_ref == 1);
                            } else {
                                ctx = 3 * (left_ref == 1) +
                                      (fix == 1 || above_ref == 1);
                            }
                        } else if (left_comp) {
                            if (!above_ref)
                                ctx = 1 + 2 * (fix == 1 || left_ref == 1);
                            else
                                ctx = 3 * (above_ref == 1) +
                                      (fix == 1 || left_ref == 1);
                        } else if (!above_ref) {
                            ctx = !left_ref ? 3 : 4 * (left_ref == 1);
                        } else if (!left_ref) {
                            ctx = 4 * (above_ref == 1);
                        } else {
                            ctx = 2 * (left_ref == 1) +
                                  2 * (above_ref == 1);
                        }
                    } else {
                        if (above_intra || (!above_comp && !above_ref))
                            ctx = 2;
                        else if (above_comp)
                            ctx = 3 * (fix == 1 || above_ref == 1);
                        else ctx = 4 * (above_ref == 1);
                    }
                } else if (have_l) {
                    if (left_intra || (!left_comp && !left_ref)) ctx = 2;
                    else if (left_comp)
                        ctx = 3 * (fix == 1 || left_ref == 1);
                    else ctx = 4 * (left_ref == 1);
                } else ctx = 2;
                bit = bd_prob(c, s->p_single_ref[ctx * 2 + 1]);
                s->c_single_ref[(ctx * 2 + 1) * 2 + bit]++;
                td->ref[0] = 1 + bit;
            }
        }
    }

    if (td->bs <= BS_8x8) {
        if (s->seg_enabled && s->seg_skip_en[td->seg_id]) {
            td->mode[0] = td->mode[1] = td->mode[2] = td->mode[3] = ZEROMV;
        } else {
            int off = sub8x8_off[td->bs];
            ctx = inter_mode_ctx(s->a_mode[col + off],
                                 td->l_mode[row7 + off]);
            td->mode[0] = bd_tree(c,
                (const int8_t (*)[2])s->t_inter_mode_tree,
                &s->p_mvmode[ctx * 3]);
            td->mode[1] = td->mode[2] = td->mode[3] = td->mode[0];
            s->c_mvmode[ctx * 4 + td->mode[0] - 10]++;
        }
    }

    if (s->filtermode == FILTER_SWITCHABLE) {
        if (have_a && s->a_mode[col] >= NEARESTMV) {
            if (have_l && td->l_mode[row7] >= NEARESTMV) {
                ctx = (s->a_filter[col] == td->l_filter[row7])
                      ? td->l_filter[row7] : 3;
            } else ctx = s->a_filter[col];
        } else if (have_l && td->l_mode[row7] >= NEARESTMV) {
            ctx = td->l_filter[row7];
        } else ctx = 3;
        td->filter_id = bd_tree(c, (const int8_t (*)[2])s->t_filter_tree,
                                &s->p_filter[ctx * 2]);
        s->c_filter[ctx * 3 + td->filter_id]++;
        td->filter = s->t_filter_lut[td->filter_id];
    } else {
        td->filter = s->filtermode;
        td->filter_id = 0;
    }

    if (td->bs > BS_8x8) {
        ctx = inter_mode_ctx(s->a_mode[col], td->l_mode[row7]);
        td->mode[0] = bd_tree(c, (const int8_t (*)[2])s->t_inter_mode_tree,
                              &s->p_mvmode[ctx * 3]);
        s->c_mvmode[ctx * 4 + td->mode[0] - 10]++;
        fill_mv(td, td->mv[0], td->mode[0], 0);
        if (td->bs != BS_8x4) {
            td->mode[1] = bd_tree(c,
                (const int8_t (*)[2])s->t_inter_mode_tree,
                &s->p_mvmode[ctx * 3]);
            s->c_mvmode[ctx * 4 + td->mode[1] - 10]++;
            fill_mv(td, td->mv[1], td->mode[1], 1);
        } else {
            td->mode[1] = td->mode[0];
            memcpy(td->mv[1], td->mv[0], sizeof(td->mv[0]));
        }
        if (td->bs != BS_4x8) {
            td->mode[2] = bd_tree(c,
                (const int8_t (*)[2])s->t_inter_mode_tree,
                &s->p_mvmode[ctx * 3]);
            s->c_mvmode[ctx * 4 + td->mode[2] - 10]++;
            fill_mv(td, td->mv[2], td->mode[2], 2);
            if (td->bs != BS_8x4) {
                td->mode[3] = bd_tree(c,
                    (const int8_t (*)[2])s->t_inter_mode_tree,
                    &s->p_mvmode[ctx * 3]);
                s->c_mvmode[ctx * 4 + td->mode[3] - 10]++;
                fill_mv(td, td->mv[3], td->mode[3], 3);
            } else {
                td->mode[3] = td->mode[2];
                memcpy(td->mv[3], td->mv[2], sizeof(td->mv[2]));
            }
        } else {
            td->mode[2] = td->mode[0];
            memcpy(td->mv[2], td->mv[0], sizeof(td->mv[0]));
            td->mode[3] = td->mode[1];
            memcpy(td->mv[3], td->mv[1], sizeof(td->mv[1]));
        }
    } else {
        fill_mv(td, td->mv[0], td->mode[0], -1);
        memcpy(td->mv[1], td->mv[0], sizeof(td->mv[0]));
        memcpy(td->mv[2], td->mv[0], sizeof(td->mv[0]));
        memcpy(td->mv[3], td->mv[0], sizeof(td->mv[0]));
    }
}

static void decode_mode(Td *td)
{
    Ctx *s = td->s;
    BoolDec *c = td->c;
    int row = td->row, col = td->col, row7 = td->row7;
    int bs = td->bs;
    int max_tx = max_tx_tab[bs];
    int bw4 = bwh_tab[1][bs][0], bh4 = bwh_tab[1][bs][1];
    int w4 = s->cols - col < bw4 ? s->cols - col : bw4;
    int h4 = s->rows - row < bh4 ? s->rows - row : bh4;
    int have_a = row > 0, have_l = col > td->tile_col_start;
    int c8 = s->sb_cols * 8;
    int ctx;

    /* segment id */
    if (!s->seg_enabled) {
        td->seg_id = 0;
    } else if (s->keyframe || s->intraonly) {
        td->seg_id = !s->seg_update_map ? 0 :
            bd_tree(c, (const int8_t (*)[2])s->t_seg_tree, s->seg_prob);
    } else if (!s->seg_update_map ||
               (s->seg_temporal &&
                bd_prob(c, s->seg_pred_prob[s->a_segpred[col] +
                                            td->l_segpred[row7]]))) {
        if (!s->errorres && s->prev_segmap) {
            int pred = 8;
            for (int y = 0; y < h4; y++)
                for (int x = 0; x < w4; x++) {
                    int v = s->prev_segmap[(row + y) * c8 + col + x];
                    if (v < pred) pred = v;
                }
            td->seg_id = pred < 8 ? pred : 0;
        } else td->seg_id = 0;
        memset(&s->a_segpred[col], 1, w4);
        memset(&td->l_segpred[row7], 1, h4);
    } else {
        td->seg_id = bd_tree(c, (const int8_t (*)[2])s->t_seg_tree,
                             s->seg_prob);
        memset(&s->a_segpred[col], 0, w4);
        memset(&td->l_segpred[row7], 0, h4);
    }
    if (s->seg_enabled &&
        (s->seg_update_map || s->keyframe || s->intraonly)) {
        for (int y = 0; y < bh4; y++)
            memset(&s->segmap[(row + y) * c8 + col], td->seg_id, bw4);
    }

    /* skip */
    td->skip = s->seg_enabled && s->seg_skip_en[td->seg_id];
    if (!td->skip) {
        ctx = td->l_skip[row7] + s->a_skip[col];
        td->skip = bd_prob(c, s->p_skip[ctx]);
        s->c_skip[ctx * 2 + td->skip]++;
    }

    /* intra/inter */
    if (s->keyframe || s->intraonly) {
        td->intra = 1;
    } else if (s->seg_enabled && s->seg_ref_en[td->seg_id]) {
        td->intra = !s->seg_ref_val[td->seg_id];
    } else {
        if (have_a && have_l) {
            ctx = s->a_intra[col] + td->l_intra[row7];
            ctx += (ctx == 2);
        } else {
            ctx = have_a ? 2 * s->a_intra[col]
                : have_l ? 2 * td->l_intra[row7] : 0;
        }
        int bit = bd_prob(c, s->p_intra[ctx]);
        s->c_intra[ctx * 2 + bit]++;
        td->intra = !bit;
    }

    /* tx size */
    if ((td->intra || !td->skip) && s->txfmmode == TX_SWITCHABLE) {
        if (have_a) {
            if (have_l) {
                int a_t = s->a_skip[col] ? max_tx : s->a_txfm[col];
                int l_t = td->l_skip[row7] ? max_tx : td->l_txfm[row7];
                ctx = (a_t + l_t) > max_tx;
            } else {
                ctx = s->a_skip[col] ? 1 : (s->a_txfm[col] * 2 > max_tx);
            }
        } else if (have_l) {
            ctx = td->l_skip[row7] ? 1 : (td->l_txfm[row7] * 2 > max_tx);
        } else ctx = 1;
        switch (max_tx) {
        case TX_32X32:
            td->tx = bd_prob(c, s->p_tx32[ctx * 3 + 0]);
            if (td->tx) {
                td->tx += bd_prob(c, s->p_tx32[ctx * 3 + 1]);
                if (td->tx == 2)
                    td->tx += bd_prob(c, s->p_tx32[ctx * 3 + 2]);
            }
            s->c_tx32[ctx * 4 + td->tx]++;
            break;
        case TX_16X16:
            td->tx = bd_prob(c, s->p_tx16[ctx * 2 + 0]);
            if (td->tx) td->tx += bd_prob(c, s->p_tx16[ctx * 2 + 1]);
            s->c_tx16[ctx * 3 + td->tx]++;
            break;
        case TX_8X8:
            td->tx = bd_prob(c, s->p_tx8[ctx]);
            s->c_tx8[ctx * 2 + td->tx]++;
            break;
        default:
            td->tx = TX_4X4;
        }
    } else {
        td->tx = max_tx < s->txfmmode ? max_tx : s->txfmmode;
    }

    td->filter_id = 0;
    int vref = 0;

    /* modes */
    if (s->keyframe || s->intraonly) {
        uint8_t *a = &s->a_mode[col * 2];
        uint8_t *l = &td->l_mode[row7 * 2];
        td->comp = 0;
        if (bs > BS_8x8) {
            td->mode[0] = bd_tree(c,
                (const int8_t (*)[2])s->t_intramode_tree,
                &s->t_kf_ymode[(a[0] * 10 + l[0]) * 9]);
            a[0] = td->mode[0];
            if (bs != BS_8x4) {
                td->mode[1] = bd_tree(c,
                    (const int8_t (*)[2])s->t_intramode_tree,
                    &s->t_kf_ymode[(a[1] * 10 + td->mode[0]) * 9]);
                l[0] = a[1] = td->mode[1];
            } else {
                l[0] = a[1] = td->mode[1] = td->mode[0];
            }
            if (bs != BS_4x8) {
                td->mode[2] = bd_tree(c,
                    (const int8_t (*)[2])s->t_intramode_tree,
                    &s->t_kf_ymode[(a[0] * 10 + l[1]) * 9]);
                a[0] = td->mode[2];
                if (bs != BS_8x4) {
                    td->mode[3] = bd_tree(c,
                        (const int8_t (*)[2])s->t_intramode_tree,
                        &s->t_kf_ymode[(a[1] * 10 + td->mode[2]) * 9]);
                    l[1] = a[1] = td->mode[3];
                } else {
                    l[1] = a[1] = td->mode[3] = td->mode[2];
                }
            } else {
                td->mode[2] = td->mode[0];
                l[1] = a[1] = td->mode[3] = td->mode[1];
            }
        } else {
            td->mode[0] = bd_tree(c,
                (const int8_t (*)[2])s->t_intramode_tree,
                &s->t_kf_ymode[(a[0] * 10 + l[0]) * 9]);
            td->mode[1] = td->mode[2] = td->mode[3] = td->mode[0];
            memset(a, td->mode[0], bwh_tab[0][bs][0]);
            memset(l, td->mode[0], bwh_tab[0][bs][1]);
        }
        td->uvmode = bd_tree(c, (const int8_t (*)[2])s->t_intramode_tree,
                             &s->t_kf_uvmode[td->mode[3] * 9]);
    } else if (td->intra) {
        td->comp = 0;
        if (bs > BS_8x8) {
            td->mode[0] = bd_tree(c,
                (const int8_t (*)[2])s->t_intramode_tree, &s->p_ymode[0]);
            s->c_ymode[td->mode[0]]++;
            if (bs != BS_8x4) {
                td->mode[1] = bd_tree(c,
                    (const int8_t (*)[2])s->t_intramode_tree,
                    &s->p_ymode[0]);
                s->c_ymode[td->mode[1]]++;
            } else td->mode[1] = td->mode[0];
            if (bs != BS_4x8) {
                td->mode[2] = bd_tree(c,
                    (const int8_t (*)[2])s->t_intramode_tree,
                    &s->p_ymode[0]);
                s->c_ymode[td->mode[2]]++;
                if (bs != BS_8x4) {
                    td->mode[3] = bd_tree(c,
                        (const int8_t (*)[2])s->t_intramode_tree,
                        &s->p_ymode[0]);
                    s->c_ymode[td->mode[3]]++;
                } else td->mode[3] = td->mode[2];
            } else {
                td->mode[2] = td->mode[0];
                td->mode[3] = td->mode[1];
            }
        } else {
            int sg = size_group[bs];
            td->mode[0] = bd_tree(c,
                (const int8_t (*)[2])s->t_intramode_tree,
                &s->p_ymode[sg * 9]);
            td->mode[1] = td->mode[2] = td->mode[3] = td->mode[0];
            s->c_ymode[sg * 10 + td->mode[3]]++;
        }
        td->uvmode = bd_tree(c, (const int8_t (*)[2])s->t_intramode_tree,
                             &s->p_uvmode[td->mode[3] * 9]);
        s->c_uvmode[td->mode[3] * 10 + td->uvmode]++;
    } else {
        decode_mode_inter(td, have_a, have_l, w4, h4);
        vref = td->ref[td->comp ? s->signbias[s->varcompref0] : 0];
    }

    /* context splat */
    int nw = bwh_tab[1][bs][0], nh = bwh_tab[1][bs][1];
    memset(&s->a_skip[col], td->skip, nw);
    memset(&s->a_txfm[col], td->tx, nw);
    memset(&s->a_partition[col], above_ctx_tab[bs], nw);
    memset(&td->l_skip[row7], td->skip, nh);
    memset(&td->l_txfm[row7], td->tx, nh);
    memset(&td->l_partition[row7], left_ctx_tab[bs], nh);
    if (!s->keyframe && !s->intraonly) {
        memset(&s->a_intra[col], td->intra, nw);
        memset(&s->a_comp[col], td->comp, nw);
        memset(&s->a_mode[col], td->mode[3], nw);
        memset(&td->l_intra[row7], td->intra, nh);
        memset(&td->l_comp[row7], td->comp, nh);
        memset(&td->l_mode[row7], td->mode[3], nh);
        if (!td->intra) {
            memset(&s->a_ref[col], vref, nw);
            memset(&td->l_ref[row7], vref, nh);
            if (s->filtermode == FILTER_SWITCHABLE) {
                memset(&s->a_filter[col], td->filter_id, nw);
                memset(&td->l_filter[row7], td->filter_id, nh);
            }
        }
        /* mv ctx */
        if (bs > BS_8x8) {
            td->l_mv[row7 * 2 + 0][0][0] = td->mv[1][0][0];
            td->l_mv[row7 * 2 + 0][0][1] = td->mv[1][0][1];
            td->l_mv[row7 * 2 + 0][1][0] = td->mv[1][1][0];
            td->l_mv[row7 * 2 + 0][1][1] = td->mv[1][1][1];
            td->l_mv[row7 * 2 + 1][0][0] = td->mv[3][0][0];
            td->l_mv[row7 * 2 + 1][0][1] = td->mv[3][0][1];
            td->l_mv[row7 * 2 + 1][1][0] = td->mv[3][1][0];
            td->l_mv[row7 * 2 + 1][1][1] = td->mv[3][1][1];
            int32_t *am = &s->a_mv[(col * 2) * 4];
            am[0] = td->mv[2][0][0]; am[1] = td->mv[2][0][1];
            am[2] = td->mv[2][1][0]; am[3] = td->mv[2][1][1];
            am = &s->a_mv[(col * 2 + 1) * 4];
            am[0] = td->mv[3][0][0]; am[1] = td->mv[3][0][1];
            am[2] = td->mv[3][1][0]; am[3] = td->mv[3][1][1];
        } else {
            for (int n = 0; n < w4 * 2; n++) {
                int32_t *am = &s->a_mv[(col * 2 + n) * 4];
                am[0] = td->mv[3][0][0]; am[1] = td->mv[3][0][1];
                am[2] = td->mv[3][1][0]; am[3] = td->mv[3][1][1];
            }
            for (int n = 0; n < h4 * 2; n++) {
                td->l_mv[row7 * 2 + n][0][0] = td->mv[3][0][0];
                td->l_mv[row7 * 2 + n][0][1] = td->mv[3][0][1];
                td->l_mv[row7 * 2 + n][1][0] = td->mv[3][1][0];
                td->l_mv[row7 * 2 + n][1][1] = td->mv[3][1][1];
            }
        }
    }

    /* frame mv/ref grid */
    for (int y = 0; y < h4; y++) {
        int o = (row + y) * c8 + col;
        if (td->intra) {
            for (int x = 0; x < w4; x++) {
                s->cur_ref[(o + x) * 2 + 0] = -1;
                s->cur_ref[(o + x) * 2 + 1] = -1;
            }
        } else if (td->comp) {
            for (int x = 0; x < w4; x++) {
                s->cur_ref[(o + x) * 2 + 0] = td->ref[0];
                s->cur_ref[(o + x) * 2 + 1] = td->ref[1];
                int16_t *m = &s->cur_mv[(o + x) * 4];
                m[0] = (int16_t)td->mv[3][0][0];
                m[1] = (int16_t)td->mv[3][0][1];
                m[2] = (int16_t)td->mv[3][1][0];
                m[3] = (int16_t)td->mv[3][1][1];
            }
        } else {
            for (int x = 0; x < w4; x++) {
                s->cur_ref[(o + x) * 2 + 0] = td->ref[0];
                s->cur_ref[(o + x) * 2 + 1] = -1;
                int16_t *m = &s->cur_mv[(o + x) * 4];
                m[0] = (int16_t)td->mv[3][0][0];
                m[1] = (int16_t)td->mv[3][0][1];
            }
        }
    }
}
