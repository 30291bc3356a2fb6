/*
 * decode_block / decode_sb / tile loop + dense grid splats
 * (included last by vp9_entropy.c).
 */

static void splat_grids(Td *td)
{
    Ctx *s = td->s;
    int row = td->row, col = td->col;
    int w4 = bwh_tab[1][td->bs][0] * 2, h4 = bwh_tab[1][td->bs][1] * 2;
    int r0 = row * 2, c0 = col * 2;
    int c16 = s->sb_cols * 16;
    int c16u = c16 >> s->ss_h;
    int ur0 = r0 >> s->ss_v, uc0 = c0 >> s->ss_h;
    int uh4 = h4 >> s->ss_v; if (!uh4) uh4 = 1;
    int uw4 = w4 >> s->ss_h; if (!uw4) uw4 = 1;

    /* the TPU pass B rebuilds every per-4x4 grid on device from the
     * block records; in emit-pairs mode the dense host splats below
     * are dead weight (~19% of pass A) and are skipped */
    if (s->emit_pairs)
        goto record;

    for (int y = 0; y < h4; y++)
        memset(&s->txsz4[(r0 + y) * c16 + c0], td->tx, w4);
    for (int y = 0; y < uh4; y++)
        memset(&s->uvtx4[(ur0 + y) * c16u + uc0], td->uvtx, uw4);

    if (td->intra) {
        if (td->bs > BS_8x8 && td->tx == TX_4X4) {
            for (int y = 0; y < h4; y++)
                for (int x = 0; x < w4; x++) {
                    int m = td->mode[(y & 1) * 2 + (x & 1)];
                    s->txtype4[(r0 + y) * c16 + c0 + x] =
                        s->t_intra_txfm_type[m];
                }
        } else {
            int tt = s->t_intra_txfm_type[td->mode[0]];
            for (int y = 0; y < h4; y++)
                memset(&s->txtype4[(r0 + y) * c16 + c0], tt, w4);
        }
    } else {
        for (int y = 0; y < h4; y++) {
            memset(&s->txtype4[(r0 + y) * c16 + c0], 0, w4);
            memset(&s->inter4[(r0 + y) * c16 + c0], 1, w4);
            memset(&s->comp4[(r0 + y) * c16 + c0], td->comp, w4);
            memset(&s->filter4[(r0 + y) * c16 + c0], td->filter, w4);
            for (int x = 0; x < w4; x++) {
                s->ref4[((r0 + y) * c16 + c0 + x) * 2 + 0] = td->ref[0];
                s->ref4[((r0 + y) * c16 + c0 + x) * 2 + 1] =
                    td->comp ? td->ref[1] : -1;
            }
        }
        for (int y = 0; y < uh4; y++)
            memset(&s->inter4uv[(ur0 + y) * c16u + uc0], 1, uw4);

        if (td->bs <= BS_8x8) {
            for (int ri = 0; ri < 2; ri++) {
                for (int y = 0; y < h4; y++)
                    for (int x = 0; x < w4; x++) {
                        int16_t *m = &s->mv4[(((r0 + y) * c16 + c0 + x)
                                              * 2 + ri) * 2];
                        m[0] = (int16_t)td->mv[0][ri][0];
                        m[1] = (int16_t)td->mv[0][ri][1];
                    }
                for (int y = 0; y < uh4; y++)
                    for (int x = 0; x < uw4; x++) {
                        int16_t *m = &s->uvmv4[(((ur0 + y) * c16u + uc0
                                                 + x) * 2 + ri) * 2];
                        m[0] = (int16_t)td->mv[0][ri][0];
                        m[1] = (int16_t)td->mv[0][ri][1];
                    }
            }
        } else {
            int ss_h = s->ss_h, ss_v = s->ss_v;
            for (int ri = 0; ri < 2; ri++) {
                for (int dy = 0; dy < 2; dy++)
                    for (int dx = 0; dx < 2; dx++) {
                        int q = dy * 2 + dx;
                        int16_t *m = &s->mv4[(((r0 + dy) * c16 + c0 + dx)
                                              * 2 + ri) * 2];
                        m[0] = (int16_t)td->mv[q][ri][0];
                        m[1] = (int16_t)td->mv[q][ri][1];
                    }
#define SETUV(dy, dx, vx, vy) do { \
    int16_t *m = &s->uvmv4[(((ur0 + (dy)) * c16u + uc0 + (dx)) * 2 + ri) \
                           * 2]; \
    m[0] = (int16_t)(vx); m[1] = (int16_t)(vy); } while (0)
                if (td->bs == BS_8x4) {
                    if (ss_v) {
                        int ax = rdiv2(td->mv[0][ri][0], td->mv[2][ri][0]);
                        int ay = rdiv2(td->mv[0][ri][1], td->mv[2][ri][1]);
                        for (int dx = 0; dx < (2 >> ss_h); dx++)
                            SETUV(0, dx, ax, ay);
                    } else {
                        int bx, by;
                        if (ss_h == 0) {
                            bx = td->mv[2][ri][0]; by = td->mv[2][ri][1];
                        } else {
                            bx = rdiv2(td->mv[0][ri][0], td->mv[2][ri][0]);
                            by = rdiv2(td->mv[0][ri][1], td->mv[2][ri][1]);
                        }
                        for (int dx = 0; dx < (2 >> ss_h); dx++) {
                            SETUV(0, dx, td->mv[0][ri][0],
                                  td->mv[0][ri][1]);
                            SETUV(1, dx, bx, by);
                        }
                    }
                } else if (td->bs == BS_4x8) {
                    if (ss_h) {
                        int ax = rdiv2(td->mv[0][ri][0], td->mv[1][ri][0]);
                        int ay = rdiv2(td->mv[0][ri][1], td->mv[1][ri][1]);
                        for (int dy = 0; dy < (2 >> ss_v); dy++)
                            SETUV(dy, 0, ax, ay);
                    } else {
                        for (int dy = 0; dy < (2 >> ss_v); dy++) {
                            SETUV(dy, 0, td->mv[0][ri][0],
                                  td->mv[0][ri][1]);
                            SETUV(dy, 1, td->mv[1][ri][0],
                                  td->mv[1][ri][1]);
                        }
                    }
                } else { /* BS_4x4 */
                    if (ss_v) {
                        if (ss_h) {
                            SETUV(0, 0,
                                  rdiv4(td->mv[0][ri][0] + td->mv[1][ri][0]
                                        + td->mv[2][ri][0]
                                        + td->mv[3][ri][0]),
                                  rdiv4(td->mv[0][ri][1] + td->mv[1][ri][1]
                                        + td->mv[2][ri][1]
                                        + td->mv[3][ri][1]));
                        } else {
                            SETUV(0, 0,
                                  rdiv2(td->mv[0][ri][0],
                                        td->mv[2][ri][0]),
                                  rdiv2(td->mv[0][ri][1],
                                        td->mv[2][ri][1]));
                            SETUV(0, 1,
                                  rdiv2(td->mv[1][ri][0],
                                        td->mv[3][ri][0]),
                                  rdiv2(td->mv[1][ri][1],
                                        td->mv[3][ri][1]));
                        }
                    } else {
                        if (ss_h) {
                            SETUV(0, 0,
                                  rdiv2(td->mv[0][ri][0],
                                        td->mv[1][ri][0]),
                                  rdiv2(td->mv[0][ri][1],
                                        td->mv[1][ri][1]));
                            /* BUG (kept): wrong index for 4:2:2 bottom */
                            SETUV(1, 0,
                                  rdiv2(td->mv[1][ri][0],
                                        td->mv[2][ri][0]),
                                  rdiv2(td->mv[1][ri][1],
                                        td->mv[2][ri][1]));
                        } else {
                            for (int dy = 0; dy < 2; dy++)
                                for (int dx = 0; dx < 2; dx++)
                                    SETUV(dy, dx,
                                          td->mv[dy * 2 + dx][ri][0],
                                          td->mv[dy * 2 + dx][ri][1]);
                        }
                    }
                }
#undef SETUV
            }
        }
    }

    /* block record: 36 int16 slots */
record:
    if (s->n_blocks < s->max_blocks) {
        int16_t *r = &s->blocks_out[s->n_blocks * 36];
        r[0] = row; r[1] = col; r[2] = td->tile_col_start;
        r[3] = td->bs; r[4] = td->seg_id; r[5] = td->skip;
        r[6] = td->intra; r[7] = td->tx; r[8] = td->uvtx;
        r[9] = td->mode[0]; r[10] = td->mode[1]; r[11] = td->mode[2];
        r[12] = td->mode[3]; r[13] = td->uvmode; r[14] = td->comp;
        r[15] = td->ref[0]; r[16] = td->ref[1]; r[17] = td->filter;
        for (int q = 0; q < 4; q++) {
            r[18 + q * 4] = (int16_t)td->mv[q][0][0];
            r[19 + q * 4] = (int16_t)td->mv[q][0][1];
            r[20 + q * 4] = (int16_t)td->mv[q][1][0];
            r[21 + q * 4] = (int16_t)td->mv[q][1][1];
        }
        r[34] = r[35] = 0;  /* pad slots (records buffer is pooled) */
        s->n_blocks++;
        if (s->row_counts)
            s->row_counts[row >> 3]++;
    }
}

static void decode_block(Td *td, int row, int col, int bl, int bp)
{
    Ctx *s = td->s;
    td->bs = bl * 3 + bp;
    td->bl = bl;
    td->bp = bp;
    td->row = row; td->col = col;
    td->row7 = row & 7;
    int w4 = bwh_tab[1][td->bs][0], h4 = bwh_tab[1][td->bs][1];
    td->min_mv_x = -(128 + col * 64);
    td->min_mv_y = -(128 + row * 64);
    td->max_mv_x = 128 + (s->cols - col - w4) * 64;
    td->max_mv_y = 128 + (s->rows - row - h4) * 64;

    PROF(0, decode_mode(td));
    td->uvtx = td->tx - ((s->ss_h && w4 * 2 == (1 << td->tx)) ||
                         (s->ss_v && h4 * 2 == (1 << td->tx)));

    if (!td->skip) {
        int has;
        PROF(1, has = decode_coeffs(td));
        if (!has && td->bs <= BS_8x8 && !td->intra) {
            td->skip = 1;
            memset(&s->a_skip[col], 1, w4);
            memset(&td->l_skip[td->row7], 1, h4);
        }
    } else {
        memset(&s->a_ynnz[col * 2], 0, w4 * 2);
        memset(&td->l_ynnz[td->row7 * 2], 0, h4 * 2);
        if (s->ss_h) {
            memset(&s->a_uvnnz0[col], 0, w4);
            memset(&s->a_uvnnz1[col], 0, w4);
        } else {
            memset(&s->a_uvnnz0[col * 2], 0, w4 * 2);
            memset(&s->a_uvnnz1[col * 2], 0, w4 * 2);
        }
        if (s->ss_v) {
            memset(&td->l_uvnnz[0][td->row7], 0, h4);
            memset(&td->l_uvnnz[1][td->row7], 0, h4);
        } else {
            memset(&td->l_uvnnz[0][td->row7 * 2], 0, h4 * 2);
            memset(&td->l_uvnnz[1][td->row7 * 2], 0, h4 * 2);
        }
    }

    PROF(2, splat_grids(td));

    /* loop filter level + masks */
    if (s->filter_level) PROF(3, {
        int lvl = s->lflvl[td->seg_id]
                          [td->intra ? 0 : td->ref[0] + 1]
                          [td->mode[3] != ZEROMV];
        if (lvl > 0) {
            int x_end = s->cols - col < w4 ? s->cols - col : w4;
            int y_end = s->rows - row < h4 ? s->rows - row : h4;
            int skip_inter = !td->intra && td->skip;
            int col7 = col & 7, row7 = td->row7;
            int sbr = row >> 3, sbc = col >> 3;
            uint8_t *lv = &s->lf_level[(sbr * s->sb_cols + sbc) * 64];
            for (int y = 0; y < h4; y++)
                memset(&lv[(row7 + y) * 8 + col7], lvl, w4);
            int32_t *m0 = &s->lf_mask[(((sbr * s->sb_cols + sbc) * 2 + 0)
                                       * 2) * 32];
            mask_edges(m0, 0, 0, row7, col7, x_end, y_end, 0, 0, td->tx,
                       skip_inter);
            if (s->ss_h | s->ss_v) {
                int32_t *m1 = &s->lf_mask[(((sbr * s->sb_cols + sbc) * 2
                                            + 1) * 2) * 32];
                mask_edges(m1, s->ss_h, s->ss_v, row7, col7, x_end, y_end,
                           (s->cols & 1) && col + w4 >= s->cols
                               ? (s->cols & 7) : 0,
                           (s->rows & 1) && row + h4 >= s->rows
                               ? (s->rows & 7) : 0,
                           td->uvtx, skip_inter);
            }
        }
    });
}

static void decode_sb(Td *td, int row, int col, int bl)
{
    Ctx *s = td->s;
    int ctx = ((s->a_partition[col] >> (3 - bl)) & 1) |
              (((td->l_partition[row & 7] >> (3 - bl)) & 1) << 1);
    const uint8_t *p = (s->keyframe || s->intraonly)
        ? &s->t_kf_part_probs[(bl * 4 + ctx) * 3]
        : &s->p_partition[(bl * 4 + ctx) * 3];
    int hbs = 4 >> bl;
    int bp;

    if (bl == 3) {
        bp = bd_tree(td->c, (const int8_t (*)[2])s->t_partition_tree, p);
        decode_block(td, row, col, bl, bp);
    } else if (col + hbs < s->cols) {
        if (row + hbs < s->rows) {
            bp = bd_tree(td->c, (const int8_t (*)[2])s->t_partition_tree,
                         p);
            switch (bp) {
            case 0: decode_block(td, row, col, bl, bp); break;
            case 1:
                decode_block(td, row, col, bl, bp);
                decode_block(td, row + hbs, col, bl, bp);
                break;
            case 2:
                decode_block(td, row, col, bl, bp);
                decode_block(td, row, col + hbs, bl, bp);
                break;
            default:
                decode_sb(td, row, col, bl + 1);
                decode_sb(td, row, col + hbs, bl + 1);
                decode_sb(td, row + hbs, col, bl + 1);
                decode_sb(td, row + hbs, col + hbs, bl + 1);
            }
        } else if (bd_prob(td->c, p[1])) {
            bp = 3;
            decode_sb(td, row, col, bl + 1);
            decode_sb(td, row, col + hbs, bl + 1);
        } else {
            bp = 1;
            decode_block(td, row, col, bl, bp);
        }
    } else if (row + hbs < s->rows) {
        if (bd_prob(td->c, p[2])) {
            bp = 3;
            decode_sb(td, row, col, bl + 1);
            decode_sb(td, row + hbs, col, bl + 1);
        } else {
            bp = 2;
            decode_block(td, row, col, bl, bp);
        }
    } else {
        bp = 3;
        decode_sb(td, row, col, bl + 1);
    }
    s->c_partition[(bl * 4 + ctx) * 4 + bp]++;
}

static void reset_left(Td *td)
{
    Ctx *s = td->s;
    memset(td->l_partition, 0, 8);
    memset(td->l_skip, 0, 8);
    if (s->keyframe || s->intraonly)
        memset(td->l_mode, DC_PRED, 16);
    else
        memset(td->l_mode, NEARESTMV, 8);
    memset(td->l_ynnz, 0, 16);
    memset(td->l_uvnnz, 0, 32);
    memset(td->l_segpred, 0, 8);
}

/* ------------------------------------------------------------------ */
/* tile decode: single-threaded path + pthread-per-tile-column path     */

#include <pthread.h>
#include <stdlib.h>

#define N_COUNT_FIELDS 24
/* element counts of the Python Counts arrays (counts.py), field order
 * of ctx_count_ptrs: coef = [4][2][2][6][6][3] = 1728,
 * eob = [4][2][2][6][6][2] = 1152 */
static const int count_sizes[N_COUNT_FIELDS] = {
    40, 100, 12, 28, 8, 10, 20, 10, 8, 6, 4, 6, 4, 64,
    1728, 1152, 4, 22, 4, 40, 16, 8, 4, 4
};

static uint32_t **ctx_count_ptrs(Ctx *s, uint32_t **out)
{
    uint32_t **p = out;
    *p++ = s->c_ymode; *p++ = s->c_uvmode; *p++ = s->c_filter;
    *p++ = s->c_mvmode; *p++ = s->c_intra; *p++ = s->c_comp;
    *p++ = s->c_single_ref; *p++ = s->c_comp_ref; *p++ = s->c_tx32;
    *p++ = s->c_tx16; *p++ = s->c_tx8; *p++ = s->c_skip;
    *p++ = s->c_mv_joint; *p++ = s->c_partition; *p++ = s->c_coef;
    *p++ = s->c_eob; *p++ = s->c_mv_sign; *p++ = s->c_mv_classes;
    *p++ = s->c_mv_class0; *p++ = s->c_mv_bits; *p++ = s->c_mv_c0fp;
    *p++ = s->c_mv_fp; *p++ = s->c_mv_c0hp; *p++ = s->c_mv_hp;
    return out;
}

static void ctx_set_counts(Ctx *s, uint32_t *blob)
{
    uint32_t *p = blob;
    uint32_t **fields[N_COUNT_FIELDS] = {
        &s->c_ymode, &s->c_uvmode, &s->c_filter, &s->c_mvmode,
        &s->c_intra, &s->c_comp, &s->c_single_ref, &s->c_comp_ref,
        &s->c_tx32, &s->c_tx16, &s->c_tx8, &s->c_skip, &s->c_mv_joint,
        &s->c_partition, &s->c_coef, &s->c_eob, &s->c_mv_sign,
        &s->c_mv_classes, &s->c_mv_class0, &s->c_mv_bits, &s->c_mv_c0fp,
        &s->c_mv_fp, &s->c_mv_c0hp, &s->c_mv_hp
    };
    for (int i = 0; i < N_COUNT_FIELDS; i++) {
        *fields[i] = p;
        p += count_sizes[i];
    }
}

#define COUNTS_TOTAL 3302  /* sum of count_sizes */

typedef struct {
    Ctx ctx;           /* per-thread copy with private counts/blocks */
    Td td;
    const uint8_t *tile_data[64];
    int tile_size[64]; /* per tile row for this column */
    int tile_col;
    uint32_t counts[COUNTS_TOTAL];
    int error;
    /* records emitted per sb-row (drives the ordered merge) */
    int32_t row_count[512];
} TileJob;

static void decode_one_tile_col(TileJob *j)
{
    Ctx *s = &j->ctx;
    Td *td = &j->td;
    memset(td, 0, sizeof(*td));
    td->s = s;
    j->error = 0;
    for (int tile_row = 0; tile_row < s->tile_rows; tile_row++) {
        int row_start = ((tile_row * s->sb_rows) >> s->log2_tile_rows) * 8;
        int row_end = (((tile_row + 1) * s->sb_rows) >> s->log2_tile_rows)
                      * 8;
        BoolDec bd;
        bd_init(&bd, j->tile_data[tile_row], j->tile_size[tile_row]);
        if (bd_bit(&bd)) { j->error = -1; return; }
        int col_start =
            ((j->tile_col * s->sb_cols) >> s->log2_tile_cols) * 8;
        int col_end =
            (((j->tile_col + 1) * s->sb_cols) >> s->log2_tile_cols) * 8;
        for (int row = row_start; row < row_end; row += 8) {
            td->tile_col_start = col_start;
            reset_left(td);
            td->c = &bd;
            for (int col = col_start; col < col_end; col += 8) {
                if (bd_is_end(&bd)) { j->error = -2; return; }
                decode_sb(td, row, col, 0);
            }
        }
    }
    if (!j->error && j->ctx.error)
        j->error = j->ctx.error;
}

static void *tile_thread(void *arg)
{
    decode_one_tile_col((TileJob *)arg);
    return 0;
}

/* Persistent worker pool: pthread_create/join per frame costs ~0.3 ms
 * at 4 tile columns; the pool keeps workers parked on a condvar and
 * hands them a job array per frame (generation-counter protocol). The
 * calling thread participates too (work-stealing by atomic index), so
 * N tile columns use N cores with N-1 parked workers. A decoder that
 * finds the pool busy (concurrent GOP-parallel decodes in one
 * process) falls back to per-frame threads. */
#include <stdatomic.h>

#define POOL_THREADS 8

static struct {
    pthread_mutex_t busy;     /* held by the one decode using the pool */
    pthread_mutex_t mu;
    pthread_cond_t cv_work;
    pthread_cond_t cv_done;
    uint64_t gen;
    int started;              /* workers created */
    TileJob *jobs;
    int n_jobs;
    atomic_int next;
    int done;
    int init;
} g_pool = { PTHREAD_MUTEX_INITIALIZER, PTHREAD_MUTEX_INITIALIZER,
             PTHREAD_COND_INITIALIZER, PTHREAD_COND_INITIALIZER,
             0, 0, 0, 0, 0, 0, 0 };

static void pool_drain_queue(void)
{
    for (;;) {
        int i = atomic_fetch_add(&g_pool.next, 1);
        if (i >= g_pool.n_jobs)
            return;
        decode_one_tile_col(&g_pool.jobs[i]);
        pthread_mutex_lock(&g_pool.mu);
        if (++g_pool.done == g_pool.n_jobs)
            pthread_cond_signal(&g_pool.cv_done);
        pthread_mutex_unlock(&g_pool.mu);
    }
}

static void *pool_worker(void *arg)
{
    uint64_t seen = 0;
    (void)arg;
    for (;;) {
        pthread_mutex_lock(&g_pool.mu);
        while (g_pool.gen == seen)
            pthread_cond_wait(&g_pool.cv_work, &g_pool.mu);
        seen = g_pool.gen;
        pthread_mutex_unlock(&g_pool.mu);
        pool_drain_queue();
    }
    return 0;
}

/* run jobs[0..n) on the pool + calling thread; returns 0, or -1 if the
 * pool is busy (caller must fall back) */
static int pool_run(TileJob *jobs, int n)
{
    if (pthread_mutex_trylock(&g_pool.busy) != 0)
        return -1;
    pthread_mutex_lock(&g_pool.mu);
    int want = n - 1;
    if (want > POOL_THREADS)
        want = POOL_THREADS;
    while (g_pool.started < want) {
        pthread_t th;
        if (pthread_create(&th, 0, pool_worker, 0) != 0)
            break;
        pthread_detach(th);
        g_pool.started++;
    }
    g_pool.jobs = jobs;
    g_pool.n_jobs = n;
    g_pool.done = 0;
    atomic_store(&g_pool.next, 0);
    g_pool.gen++;
    pthread_cond_broadcast(&g_pool.cv_work);
    pthread_mutex_unlock(&g_pool.mu);

    pool_drain_queue();          /* calling thread works too */

    pthread_mutex_lock(&g_pool.mu);
    while (g_pool.done < g_pool.n_jobs)
        pthread_cond_wait(&g_pool.cv_done, &g_pool.mu);
    g_pool.jobs = 0;
    pthread_mutex_unlock(&g_pool.mu);
    pthread_mutex_unlock(&g_pool.busy);
    return 0;
}

/* entry point: decode all tiles (threads one pthread per tile column
 * when tile_cols > 1, mirroring the reference's slice threading,
 * vp9.c:1441-1552). Returns 0 or negative error. */
int vp9_decode_tiles(Ctx *s, const uint8_t *data, int size)
{
    s->n_blocks = 0;
    s->error = 0;
    s->row_counts = 0;
    s->records_sorted = 1;  /* single-tile decode order is final order */
    s->n_pairs = 0;         /* the host caches+reuses the ctx across */
    s->n_eobp = 0;          /* frames: reset every per-frame output  */
    s->cur_cbase = 0;
    for (int i = 0; i < 3; i++)
        s->nnz_cnt[i] = s->eob_cnt[i] = 0;

    /* the symbol-count arrays are pooled host-side; zero them here
     * (GIL released) iff backward adaptation will read them */
    if (!s->skip_counts) {
        uint32_t *cnt[N_COUNT_FIELDS];
        ctx_count_ptrs(s, cnt);
        for (int f = 0; f < N_COUNT_FIELDS; f++)
            memset(cnt[f], 0, count_sizes[f] * sizeof(uint32_t));
    }

    /* re-zero the pooled grids whose stale content is not fully
     * overwritten or masked (moved here from the Python _setup_arrays
     * fills: this runs with the GIL released) */
    PROF(4, {
        int r4 = s->sb_rows * 16, c4 = s->sb_cols * 16;
        int r4u = r4 >> s->ss_v, c4u = c4 >> s->ss_h;
        memset(s->eob_y, 0, (size_t)r4 * c4 * sizeof(int32_t));
        memset(s->eob_u, 0, (size_t)r4u * c4u * sizeof(int32_t));
        memset(s->eob_v, 0, (size_t)r4u * c4u * sizeof(int32_t));
        memset(s->lf_mask, 0, (size_t)s->sb_rows * s->sb_cols
                               * 2 * 2 * 8 * 4 * sizeof(int32_t));
    });

    /* locate each tile's data */
    const uint8_t *tdata[64][64];
    int tsize[64][64];
    int pos = 0;
    for (int tr = 0; tr < s->tile_rows; tr++) {
        for (int tc = 0; tc < s->tile_cols; tc++) {
            int tsz;
            if (tc == s->tile_cols - 1 && tr == s->tile_rows - 1) {
                tsz = size - pos;
            } else {
                if (pos + 4 > size) return -1;
                tsz = (data[pos] << 24) | (data[pos + 1] << 16) |
                      (data[pos + 2] << 8) | data[pos + 3];
                pos += 4;
            }
            if (tsz < 0 || tsz > size - pos) return -1;
            tdata[tr][tc] = data + pos;
            tsize[tr][tc] = tsz;
            pos += tsz;
        }
    }

    if (s->tile_cols == 1) {
        /* stack-local: decoders run pass A concurrently (GOP-parallel
         * workers, the decode_stream pipeline) — shared state here
         * desyncs the bool decoder */
        Td td_s;
        Td *td = &td_s;
        memset(td, 0, sizeof(*td));
        td->s = s;
        for (int tr = 0; tr < s->tile_rows; tr++) {
            int row_start = ((tr * s->sb_rows) >> s->log2_tile_rows) * 8;
            int row_end = (((tr + 1) * s->sb_rows) >> s->log2_tile_rows)
                          * 8;
            BoolDec bd;
            bd_init(&bd, tdata[tr][0], tsize[tr][0]);
            if (bd_bit(&bd)) return -1;
            for (int row = row_start; row < row_end; row += 8) {
                td->tile_col_start = 0;
                reset_left(td);
                td->c = &bd;
                for (int col = 0; col < s->sb_cols * 8; col += 8) {
                    if (col >= s->cols) break;
                    if (bd_is_end(&bd)) return -2;
                    decode_sb(td, row, col, 0);
                }
            }
        }
        return s->error;
    }

    /* threaded tile columns: outputs are column-disjoint; counts and
     * block records are thread-private and merged afterwards. Records
     * land in a scratch region per tile and are merged into
     * s->blocks_out in (sb-row, tile) order — the host consumes them
     * without re-sorting. */
    int ntc = s->tile_cols;
    TileJob *jobs = calloc(ntc, sizeof(TileJob));
    int order_ok = s->sb_rows <= 512;
    int16_t *scratch = 0;
    if (order_ok) {
        scratch = malloc((size_t)s->cols * s->rows * 36
                         * sizeof(int16_t));
        if (!scratch)
            order_ok = 0;
    }
    pthread_t th[64];
    /* per-tile record capacity from the tile's actual b8 width (tile
     * splits are uneven when sb_cols % ntc != 0; an even split would
     * silently drop records from the wider tiles) */
    size_t blk_off = 0;
    for (int tc = 0; tc < ntc; tc++) {
        TileJob *j = &jobs[tc];
        j->ctx = *s;
        j->tile_col = tc;
        ctx_set_counts(&j->ctx, j->counts);
        memset(j->counts, 0, sizeof(j->counts));
        int c0 = ((tc * s->sb_cols) >> s->log2_tile_cols) * 8;
        int c1 = (((tc + 1) * s->sb_cols) >> s->log2_tile_cols) * 8;
        if (c0 > s->cols) c0 = s->cols;
        if (c1 > s->cols) c1 = s->cols;
        int cap = (c1 - c0) * s->rows;  /* <= one record per b8 cell */
        j->ctx.blocks_out = (order_ok ? scratch : s->blocks_out)
                            + blk_off * 36;
        j->ctx.max_blocks = cap;
        j->ctx.n_blocks = 0;
        j->ctx.row_counts = order_ok ? j->row_count : 0;
        blk_off += cap;
        if (s->emit_pairs) {
            /* per-tile pair segments, proportional to tile width */
            int pw = s->pairs_wide ? 4 : 3;
            int32_t pc = (int32_t)((int64_t)s->pairs_cap * (c1 - c0)
                                   / s->cols);
            int32_t ec = (int32_t)((int64_t)s->eobp_cap * (c1 - c0)
                                   / s->cols);
            int32_t po = (int32_t)((int64_t)s->pairs_cap * c0 / s->cols);
            int32_t eo = (int32_t)((int64_t)s->eobp_cap * c0 / s->cols);
            j->ctx.pairs_out = s->pairs_out + (size_t)po * pw;
            j->ctx.pairs_cap = pc;
            j->ctx.n_pairs = 0;
            j->ctx.eobp_out = s->eobp_out + (size_t)eo * 3;
            j->ctx.eobp_cap = ec;
            j->ctx.n_eobp = 0;
        }
        for (int tr = 0; tr < s->tile_rows; tr++) {
            j->tile_data[tr] = tdata[tr][tc];
            j->tile_size[tr] = tsize[tr][tc];
        }
    }
    int pooled = pool_run(jobs, ntc) == 0;
    if (!pooled)
        for (int tc = 0; tc < ntc; tc++)
            pthread_create(&th[tc], 0, tile_thread, &jobs[tc]);
    int err = 0;
    uint32_t *main_counts[N_COUNT_FIELDS];
    ctx_count_ptrs(s, main_counts);
    int total_blocks = 0;
    for (int tc = 0; tc < ntc; tc++) {
        if (!pooled)
            pthread_join(th[tc], 0);
        if (jobs[tc].error) err = jobs[tc].error;
        uint32_t *p = jobs[tc].counts;
        for (int f = 0; f < N_COUNT_FIELDS; f++) {
            for (int k = 0; k < count_sizes[f]; k++)
                main_counts[f][k] += p[k];
            p += count_sizes[f];
        }
        total_blocks += jobs[tc].ctx.n_blocks;
        for (int i = 0; i < 3; i++) {
            s->nnz_cnt[i] += jobs[tc].ctx.nnz_cnt[i];
            s->eob_cnt[i] += jobs[tc].ctx.eob_cnt[i];
        }
    }
    if (order_ok) {
        /* ordered merge: for each sb-row, each tile's records in tile
         * order (within-tile decode order preserved) — equivalent to a
         * stable sort on (sb_row, tile) */
        int16_t *dst = s->blocks_out;
        const int16_t *src[64];
        for (int tc = 0; tc < ntc; tc++)
            src[tc] = jobs[tc].ctx.blocks_out;
        for (int sbr = 0; sbr < s->sb_rows; sbr++) {
            for (int tc = 0; tc < ntc; tc++) {
                int n = jobs[tc].row_count[sbr];
                if (n) {
                    memcpy(dst, src[tc],
                           (size_t)n * 36 * sizeof(int16_t));
                    dst += (size_t)n * 36;
                    src[tc] += (size_t)n * 36;
                }
            }
        }
        s->records_sorted = 1;
        free(scratch);
    } else {
        /* compact the per-tile regions; host re-sorts */
        int w = jobs[0].ctx.n_blocks;
        for (int tc = 1; tc < ntc; tc++) {
            memmove(s->blocks_out + (size_t)w * 36,
                    jobs[tc].ctx.blocks_out,
                    (size_t)jobs[tc].ctx.n_blocks * 36 * sizeof(int16_t));
            w += jobs[tc].ctx.n_blocks;
        }
        s->records_sorted = 0;
    }
    s->n_blocks = total_blocks;
    if (s->emit_pairs && !err) {
        /* compact the per-tile pair segments (scatter order is free) */
        int pw = s->pairs_wide ? 4 : 3;
        size_t np = jobs[0].ctx.n_pairs, ne = jobs[0].ctx.n_eobp;
        for (int tc = 1; tc < ntc; tc++) {
            memmove(s->pairs_out + np * pw, jobs[tc].ctx.pairs_out,
                    (size_t)jobs[tc].ctx.n_pairs * pw * sizeof(int16_t));
            np += jobs[tc].ctx.n_pairs;
            memmove(s->eobp_out + ne * 3, jobs[tc].ctx.eobp_out,
                    (size_t)jobs[tc].ctx.n_eobp * 3 * sizeof(int16_t));
            ne += jobs[tc].ctx.n_eobp;
        }
        s->n_pairs = (int32_t)np;
        s->n_eobp = (int32_t)ne;
    }
    free(jobs);
    return err;
}
