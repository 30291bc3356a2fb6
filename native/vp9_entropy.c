/*
 * Native pass-A entropy decoder for the TPU-native VP9 framework.
 *
 * Re-implements the (already conformance-verified) Python pass A
 * (ffmpeg_hybrid_tpu/codecs/vp9/{rac,blockdec,mvs}.py) in C for speed:
 * per-tile superblock partition walk, mode/MV/coefficient decode, loop
 * filter mask building, writing the same dense per-frame tensors the TPU
 * pass-B consumes. Called from Python via ctypes (see native/passa.py).
 *
 * Behavioral reference for the normative syntax: libavcodec/vp9block.c,
 * vp9mvs.c, vp9.c (decode_sb/decode_tiles); this file is derived from our
 * Python implementation of the same spec, not from the reference sources.
 */
#include <stdint.h>
#include <string.h>

/* optional phase profiling (build with -DVP9_PROF): cycle counters per
 * decode phase, fetched via vp9_prof_get. Zero overhead otherwise. */
uint64_t vp9_prof[8];
void vp9_prof_get(uint64_t *out)
{
    for (int i = 0; i < 8; i++) out[i] = vp9_prof[i];
}
#ifdef VP9_PROF
static inline uint64_t prof_now(void)
{
    unsigned lo, hi;
    __asm__ __volatile__("rdtsc" : "=a"(lo), "=d"(hi));
    return ((uint64_t)hi << 32) | lo;
}
#define PROF(i, ...) do { \
        uint64_t prof_t0_ = prof_now(); __VA_ARGS__; \
        __atomic_fetch_add(&vp9_prof[i], prof_now() - prof_t0_, \
                           __ATOMIC_RELAXED); \
    } while (0)
#else
#define PROF(i, ...) do { __VA_ARGS__; } while (0)
#endif

/* ------------------------------------------------------------------ */
/* boolean range decoder (spec form, matches rac.py)                   */

/* Bool (range) decoder with buffered 16-bit refills (the form of the
 * reference's vpx_rac, libavcodec/vpx_rac.h): code_word holds the
 * active 8-bit window at bits [23:16] plus up to 16 prefetched stream
 * bits below; `bits` is minus the number of prefetched bits not yet
 * consumed. Renorm shifts may run past the prefetched region (zeros
 * slide in); the next refill ORs the real bits into exactly those
 * positions (`<< bits`), correcting them before any read. Past the end
 * of the buffer the zero slide-in IS the spec's zero-extension; vbits
 * counts the virtual (zero) bits among the prefetched ones, so the
 * consumed-overread count is vbits + bits exactly as the former
 * per-bit implementation counted it. Renorm stays eager (at symbol
 * end, as before), keeping the consumption timing - and thus
 * bd_is_end's trigger point on corrupt streams - bit-identical. */
typedef struct {
    const uint8_t *data;
    int size;
    int pos;             /* next byte to prefetch */
    unsigned range;      /* kept in [128, 255] between symbols */
    unsigned code_word;
    int bits;            /* -(prefetched-not-consumed bits) */
    int vbits;           /* zero bits among those prefetched */
} BoolDec;

static void bd_init(BoolDec *c, const uint8_t *data, int size)
{
    c->data = data;
    c->size = size;
    c->pos = 0;
    c->range = 255;
    c->bits = -16;
    c->vbits = 0;
    unsigned w = 0;
    for (int i = 0; i < 3; i++) {
        w <<= 8;
        if (c->pos < c->size) w |= c->data[c->pos++];
        else c->vbits += 8;
    }
    c->code_word = w;
}

static inline void bd_renorm(BoolDec *c)
{
    /* branch-free for the common path: shift==0 when range is already
     * normalized, so the shifts are no-ops and `bits` (always < 0 at
     * entry) never triggers the refill */
    int shift = __builtin_clz(c->range) - 24;
    int bits = c->bits + shift;
    c->range <<= shift;
    c->code_word <<= shift;
    if (bits >= 0 && c->pos < c->size) {
        unsigned v = (unsigned)c->data[c->pos++] << 8;
        if (c->pos < c->size) v |= c->data[c->pos++];
        else c->vbits += 8;
        c->code_word |= v << bits;
        bits -= 16;
    }
    c->bits = bits;
}

static inline int bd_prob(BoolDec *c, int prob)
{
    /* branchless bit decision: the bit value is ~50% unpredictable by
     * construction (that is what entropy coding means), so a compare+
     * cmov beats a branch here */
    unsigned split = 1 + (((c->range - 1) * (unsigned)prob) >> 8);
    unsigned split_hi = split << 16;
    int bit = c->code_word >= split_hi;
    c->range = bit ? c->range - split : split;
    c->code_word -= bit ? split_hi : 0;
    bd_renorm(c);
    return bit;
}

static inline int bd_bit(BoolDec *c) { return bd_prob(c, 128); }

static inline int bd_tree(BoolDec *c, const int8_t (*tree)[2],
                          const uint8_t *probs)
{
    int i = 0;
    for (;;) {
        int n = tree[i][bd_prob(c, probs[i])];
        if (n <= 0) return -n;
        i = n;
    }
}

static inline int bd_is_end(const BoolDec *c)
{
    /* consumed zero bits past the stream end: virtual bits prefetched
     * minus those still buffered, plus any overshift past the whole
     * prefetched region (pure zero slide-ins) */
    int buffered = c->bits < 0 ? -c->bits : 0;
    int vbuf = c->vbits < buffered ? c->vbits : buffered;
    int overread = c->vbits - vbuf + (c->bits > 0 ? c->bits : 0);
    return overread > 10;
}

/* ------------------------------------------------------------------ */
/* static tables (normative; values identical to tables.py)            */

static const uint8_t bwh_tab[2][13][2] = {
    { {16,16},{16,8},{8,16},{8,8},{8,4},{4,8},{4,4},{4,2},{2,4},{2,2},
      {2,1},{1,2},{1,1} },
    { {8,8},{8,4},{4,8},{4,4},{4,2},{2,4},{2,2},{2,1},{1,2},{1,1},
      {1,1},{1,1},{1,1} },
};
static const uint8_t left_ctx_tab[13] =
    {0x0,0x8,0x0,0x8,0xc,0x8,0xc,0xe,0xc,0xe,0xf,0xe,0xf};
static const uint8_t above_ctx_tab[13] =
    {0x0,0x0,0x8,0x8,0x8,0xc,0xc,0xc,0xe,0xe,0xe,0xf,0xf};
static const uint8_t max_tx_tab[13] = {3,3,3,3,2,2,2,1,1,1,0,0,0};
static const uint8_t size_group[10] = {3,3,3,3,2,2,2,1,1,1};
static const uint8_t sub8x8_off[10] = {3,0,0,1,0,0,0,0,0,0};
static const int16_t band_counts[4][8] = {
    {1,2,3,4,3,3,0,0}, {1,2,3,4,11,43,0,0},
    {1,2,3,4,11,235,0,0}, {1,2,3,4,11,1003,0,0},
};
static const int8_t mv_ref_blk_off[13][8][2] = {
    { {3,-1},{-1,3},{4,-1},{-1,4},{-1,-1},{0,-1},{-1,0},{6,-1} },
    { {0,-1},{-1,0},{4,-1},{-1,2},{-1,-1},{0,-3},{-3,0},{2,-1} },
    { {-1,0},{0,-1},{-1,4},{2,-1},{-1,-1},{-3,0},{0,-3},{-1,2} },
    { {1,-1},{-1,1},{2,-1},{-1,2},{-1,-1},{0,-3},{-3,0},{-3,-3} },
    { {0,-1},{-1,0},{2,-1},{-1,-1},{-1,1},{0,-3},{-3,0},{-3,-3} },
    { {-1,0},{0,-1},{-1,2},{-1,-1},{1,-1},{-3,0},{0,-3},{-3,-3} },
    { {0,-1},{-1,0},{1,-1},{-1,1},{-1,-1},{0,-3},{-3,0},{-3,-3} },
    { {0,-1},{-1,0},{1,-1},{-1,-1},{0,-2},{-2,0},{-2,-1},{-1,-2} },
    { {-1,0},{0,-1},{-1,1},{-1,-1},{-2,0},{0,-2},{-1,-2},{-2,-1} },
    { {0,-1},{-1,0},{-1,-1},{0,-2},{-2,0},{-1,-2},{-2,-1},{-2,-2} },
    { {0,-1},{-1,0},{-1,-1},{0,-2},{-2,0},{-1,-2},{-2,-1},{-2,-2} },
    { {0,-1},{-1,0},{-1,-1},{0,-2},{-2,0},{-1,-2},{-2,-1},{-2,-2} },
    { {0,-1},{-1,0},{-1,-1},{0,-2},{-2,0},{-1,-2},{-2,-1},{-2,-2} },
};
static const uint8_t inter_mode_ctx_lut_row_hi[14] =
    {6,6,6,6,6,6,6,6,6,6,5,5,5,5};
static const uint8_t inter_mode_ctx_lut_lo[4][14] = {
    {5,5,5,5,5,5,5,5,5,5,2,2,1,3},
    {5,5,5,5,5,5,5,5,5,5,2,2,1,3},
    {5,5,5,5,5,5,5,5,5,5,1,1,0,3},
    {5,5,5,5,5,5,5,5,5,5,3,3,3,4},
};
static inline int inter_mode_ctx(int a, int l)
{
    if (a < 10) return (l < 10) ? 6 : 5;
    return inter_mode_ctx_lut_lo[a - 10][l];
}

#define TX_4X4 0
#define TX_8X8 1
#define TX_16X16 2
#define TX_32X32 3
#define TX_SWITCHABLE 4
#define FILTER_SWITCHABLE 4
#define PRED_SINGLEREF 0
#define PRED_COMPREF 1
#define PRED_SWITCHABLE 2
#define DC_PRED 2
#define NEARESTMV 10
#define NEARMV 11
#define ZEROMV 12
#define NEWMV 13
#define BS_8x8 9
#define BS_8x4 10
#define BS_4x8 11
#define BS_4x4 12

/* ------------------------------------------------------------------ */
/* context struct shared with Python via ctypes (native/passa.py       */
/* mirrors this layout field-for-field)                                */

typedef struct {
    /* header/geometry */
    int32_t cols, rows, sb_cols, sb_rows;
    int32_t ss_h, ss_v, bpp;
    int32_t keyframe, intraonly, lossless, txfmmode, filtermode;
    int32_t comppredmode, allowcompinter, fixcompref;
    int32_t varcompref0, varcompref1;
    int32_t signbias[3];
    int32_t highprecisionmvs, errorres, use_last_frame_mvs, filter_level;
    int32_t seg_enabled, seg_update_map, seg_temporal, seg_absolute_vals;
    int32_t tile_cols, tile_rows, log2_tile_cols, log2_tile_rows;
    uint8_t seg_prob[7], seg_pred_prob[3];
    int32_t seg_skip_en[8], seg_ref_en[8], seg_ref_val[8];
    int32_t qmul[8][2][2];      /* [seg][plane-type][dc/ac] */
    uint8_t lflvl[8][4][2];     /* [seg][ref+1][mode!=zero] */
    /* probabilities */
    uint8_t *p_ymode;      /* [4][9] */
    uint8_t *p_uvmode;     /* [10][9] */
    uint8_t *p_filter;     /* [4][2] */
    uint8_t *p_mvmode;     /* [7][3] */
    uint8_t *p_intra;      /* [4] */
    uint8_t *p_comp;       /* [5] */
    uint8_t *p_single_ref; /* [5][2] */
    uint8_t *p_comp_ref;   /* [5] */
    uint8_t *p_tx32;       /* [2][3] */
    uint8_t *p_tx16;       /* [2][2] */
    uint8_t *p_tx8;        /* [2] */
    uint8_t *p_skip;       /* [3] */
    uint8_t *p_mv_joint;   /* [3] */
    uint8_t *p_partition;  /* [4][4][3] */
    uint8_t *p_mv_sign;    /* [2] */
    uint8_t *p_mv_classes; /* [2][10] */
    uint8_t *p_mv_class0;  /* [2] */
    uint8_t *p_mv_bits;    /* [2][10] */
    uint8_t *p_mv_c0fp;    /* [2][2][3] */
    uint8_t *p_mv_fp;      /* [2][3] */
    uint8_t *p_mv_c0hp;    /* [2] */
    uint8_t *p_mv_hp;      /* [2] */
    uint8_t *coef11;       /* [4][2][2][6][6][11] */
    /* normative tables (from tables.py, passed in) */
    const int8_t *t_partition_tree;   /* [3][2] */
    const uint8_t *t_kf_part_probs;   /* [4][4][3] */
    const int8_t *t_seg_tree;         /* [7][2] */
    const int8_t *t_intramode_tree;   /* [9][2] */
    const uint8_t *t_kf_ymode;        /* [10][10][9] */
    const uint8_t *t_kf_uvmode;       /* [10][9] */
    const int8_t *t_inter_mode_tree;  /* [3][2] */
    const int8_t *t_filter_tree;      /* [2][2] */
    const uint8_t *t_filter_lut;      /* [3] (as uint8) */
    const int8_t *t_mv_joint_tree;    /* [3][2] */
    const int8_t *t_mv_class_tree;    /* [10][2] */
    const int8_t *t_mv_fp_tree;       /* [3][2] */
    const uint8_t *t_intra_txfm_type; /* [14] */
    const int16_t *t_scans;           /* [5][4][1024] padded */
    const int16_t *t_scans_nb;        /* [5][4][1024][2] padded */
    /* outputs */
    int32_t *coef_y, *coef_u, *coef_v;
    int32_t *eob_y, *eob_u, *eob_v;
    int8_t *txsz4, *txtype4, *uvtx4;
    uint8_t *inter4, *inter4uv;
    int16_t *mv4, *uvmv4;            /* [r4][c4][2][2] */
    int8_t *ref4;                    /* [r4][c4][2] */
    uint8_t *comp4;
    int8_t *filter4;
    uint8_t *lf_level;               /* [sbr][sbc][8][8] */
    int32_t *lf_mask;                /* [sbr][sbc][2][2][8][4] */
    uint8_t *segmap;                 /* [r8][c8] */
    const uint8_t *prev_segmap;      /* may be NULL */
    int16_t *cur_mv;                 /* [r8][c8][2][2] */
    int8_t *cur_ref;                 /* [r8][c8][2] */
    const int16_t *prev_mv;          /* may be NULL */
    const int8_t *prev_ref;
    /* above context (persistent, numpy-owned) */
    uint8_t *a_partition, *a_skip, *a_txfm, *a_segpred, *a_intra;
    uint8_t *a_comp, *a_ref, *a_filter, *a_mode, *a_ynnz;
    uint8_t *a_uvnnz0, *a_uvnnz1;
    int32_t *a_mv;                   /* [2*n8+2][2][2] */
    /* counts */
    uint32_t *c_ymode;    /* [4][10] */
    uint32_t *c_uvmode;   /* [10][10] */
    uint32_t *c_filter;   /* [4][3] */
    uint32_t *c_mvmode;   /* [7][4] */
    uint32_t *c_intra;    /* [4][2] */
    uint32_t *c_comp;     /* [5][2] */
    uint32_t *c_single_ref; /* [5][2][2] */
    uint32_t *c_comp_ref; /* [5][2] */
    uint32_t *c_tx32;     /* [2][4] */
    uint32_t *c_tx16;     /* [2][3] */
    uint32_t *c_tx8;      /* [2][2] */
    uint32_t *c_skip;     /* [3][2] */
    uint32_t *c_mv_joint; /* [4] */
    uint32_t *c_partition; /* [4][4][4] */
    uint32_t *c_coef;     /* [4][2][2][6][6][3] */
    uint32_t *c_eob;      /* [4][2][2][6][6][2] */
    uint32_t *c_mv_sign;  /* [2][2] */
    uint32_t *c_mv_classes; /* [2][11] */
    uint32_t *c_mv_class0;  /* [2][2] */
    uint32_t *c_mv_bits;    /* [2][10][2] */
    uint32_t *c_mv_c0fp;    /* [2][2][4] */
    uint32_t *c_mv_fp;      /* [2][4] */
    uint32_t *c_mv_c0hp;    /* [2][2] */
    uint32_t *c_mv_hp;      /* [2][2] */
    /* block records out: per block 32 int16 slots */
    int16_t *blocks_out;
    int32_t max_blocks;
    int32_t n_blocks;
    int32_t error;
    /* per-plane counts filled during coefficient decode: nonzero
     * dequantized coefficients and coded (eob>0) tx blocks — lets the
     * (pos,value) pair packer run single-pass with exact capacity */
    int32_t nnz_cnt[3];
    int32_t eob_cnt[3];
    /* direct (pos, value) pair emission (TPU pass-B mode): pass A
     * writes the merged upload buffers itself during the coefficient
     * decode; the dense coef-plane writes/zeroing and the per-4x4
     * metadata grid splats are skipped (pass B rebuilds all grids on
     * device from the block records). Positions carry the per-plane
     * flat offsets cbase/ebase of the merged layout (recon_tpu
     * _scatter_pairs16/32 row format). */
    int32_t emit_pairs;    /* 0: dense planes; 1: emit pairs */
    int32_t pairs_wide;    /* pair row = 4 int16 (val hi/lo) vs 3 */
    int16_t *pairs_out;
    int32_t pairs_cap, n_pairs;
    int16_t *eobp_out;     /* [cap][3]: cell hi/lo, eob */
    int32_t eobp_cap, n_eobp;
    int32_t cbase[3], ebase[3];
    int32_t cur_cbase;     /* cbase of the plane being decoded */
    int32_t skip_counts;   /* frame-parallel mode: adaptation never
                            * reads the counts; skip the per-symbol
                            * increments in the coefficient hot loop */
    int32_t *row_counts;   /* (threaded path, internal) per-sb-row
                            * record counts for the ordered merge */
    int32_t records_sorted; /* out: 1 when blocks_out is already in
                             * (sb-row, tile) order */
} Ctx;

/* per-tile/block decoder state */
typedef struct {
    Ctx *s;
    BoolDec *c;
    int tile_col_start;
    int row, col, row7;
    int min_mv_x, min_mv_y, max_mv_x, max_mv_y;
    /* left ctx */
    uint8_t l_ynnz[16], l_mode[16], l_uvnnz[2][16];
    uint8_t l_partition[8], l_skip[8], l_txfm[8], l_segpred[8];
    uint8_t l_intra[8], l_comp[8], l_ref[8], l_filter[8];
    int32_t l_mv[16][2][2];
    /* current block */
    int bs, bl, bp, seg_id, skip, intra, tx, uvtx;
    int mode[4], uvmode, comp, ref[2], filter;
    int32_t mv[4][2][2];  /* [sub][refslot][xy] */
    int filter_id;
} Td;

/* ------------------------------------------------------------------ */
/* MV prediction (mirrors mvs.py)                                      */

static inline int iclip(int v, int lo, int hi)
{ return v < lo ? lo : v > hi ? hi : v; }

static int find_ref_mvs(Td *td, int ref, int z, int idx, int sb,
                        int32_t *out_xy)
{
    Ctx *s = td->s;
    int row = td->row, col = td->col, row7 = td->row7;
    const int8_t (*p)[2] = mv_ref_blk_off[td->bs];
    int have_mem = 0, have_mem_sub = 0;
    int32_t mem_x = 0, mem_y = 0, mem_sub_x = 0, mem_sub_y = 0;
    int c8 = s->sb_cols * 8;

#define CLAMP_XY(ox, oy, ix, iy) do { \
    ox = iclip(ix, td->min_mv_x, td->max_mv_x); \
    oy = iclip(iy, td->min_mv_y, td->max_mv_y); } while (0)

#define RETURN_DIRECT(mx, my) do { \
    if (!idx) { out_xy[0] = (mx); out_xy[1] = (my); return 1; } \
    else if (!have_mem) { have_mem = 1; mem_x = (mx); mem_y = (my); } \
    else if ((mx) != mem_x || (my) != mem_y) { \
        out_xy[0] = (mx); out_xy[1] = (my); return 1; } } while (0)

#define RETURN_MV(mx_, my_) do { \
    int32_t mx = (mx_), my = (my_); \
    if (sb > 0) { \
        if (!have_mem_sub) { \
            int32_t tx_, ty_; CLAMP_XY(tx_, ty_, mx, my); \
            if (tx_ != mem_x || ty_ != mem_y) { \
                out_xy[0] = tx_; out_xy[1] = ty_; return 1; } \
            have_mem_sub = 1; mem_sub_x = mx; mem_sub_y = my; \
        } else if (mx != mem_sub_x || my != mem_sub_y) { \
            int32_t tx_, ty_; CLAMP_XY(tx_, ty_, mx, my); \
            if (tx_ != mem_x || ty_ != mem_y) { \
                out_xy[0] = tx_; out_xy[1] = ty_; \
            } else { out_xy[0] = 0; out_xy[1] = 0; } \
            return 1; } \
    } else { \
        if (!idx) { CLAMP_XY(out_xy[0], out_xy[1], mx, my); return 1; } \
        else if (!have_mem) { have_mem = 1; mem_x = mx; mem_y = my; } \
        else if (mx != mem_x || my != mem_y) { \
            CLAMP_XY(out_xy[0], out_xy[1], mx, my); return 1; } \
    } } while (0)

#define RETURN_SCALE(mx, my, scale) do { \
    if (scale) RETURN_MV(-(mx), -(my)); else RETURN_MV((mx), (my)); \
    } while (0)

    int i_start = 0;
    if (sb >= 0) {
        if (sb == 2 || sb == 1) {
            RETURN_DIRECT(td->mv[0][z][0], td->mv[0][z][1]);
        } else if (sb == 3) {
            RETURN_DIRECT(td->mv[2][z][0], td->mv[2][z][1]);
            RETURN_DIRECT(td->mv[1][z][0], td->mv[1][z][1]);
            RETURN_DIRECT(td->mv[0][z][0], td->mv[0][z][1]);
        }
        if (row > 0) {
            const int8_t *rr = &s->cur_ref[((row - 1) * c8 + col) * 2];
            if (rr[0] == ref) {
                int32_t *m = &s->a_mv[(2 * col + (sb & 1)) * 4];
                RETURN_MV(m[0], m[1]);
            } else if (rr[1] == ref) {
                int32_t *m = &s->a_mv[(2 * col + (sb & 1)) * 4];
                RETURN_MV(m[2], m[3]);
            }
        }
        if (col > td->tile_col_start) {
            const int8_t *rr = &s->cur_ref[(row * c8 + col - 1) * 2];
            if (rr[0] == ref) {
                RETURN_MV(td->l_mv[2 * row7 + (sb >> 1)][0][0],
                          td->l_mv[2 * row7 + (sb >> 1)][0][1]);
            } else if (rr[1] == ref) {
                RETURN_MV(td->l_mv[2 * row7 + (sb >> 1)][1][0],
                          td->l_mv[2 * row7 + (sb >> 1)][1][1]);
            }
        }
        i_start = 2;
    }

    for (int i = i_start; i < 8; i++) {
        int c = p[i][0] + col, r = p[i][1] + row;
        if (c >= td->tile_col_start && c < s->cols && r >= 0 && r < s->rows) {
            const int8_t *rr = &s->cur_ref[(r * c8 + c) * 2];
            const int16_t *m = &s->cur_mv[(r * c8 + c) * 4];
            if (rr[0] == ref) RETURN_MV(m[0], m[1]);
            else if (rr[1] == ref) RETURN_MV(m[2], m[3]);
        }
    }

    if (s->use_last_frame_mvs && s->prev_mv) {
        const int8_t *rr = &s->prev_ref[(row * c8 + col) * 2];
        const int16_t *m = &s->prev_mv[(row * c8 + col) * 4];
        if (rr[0] == ref) RETURN_MV(m[0], m[1]);
        else if (rr[1] == ref) RETURN_MV(m[2], m[3]);
    }

    /* different-ref candidates with sign-bias flip */
    for (int i = 0; i < 8; i++) {
        int c = p[i][0] + col, r = p[i][1] + row;
        if (c >= td->tile_col_start && c < s->cols && r >= 0 && r < s->rows) {
            const int8_t *rr = &s->cur_ref[(r * c8 + c) * 2];
            const int16_t *m = &s->cur_mv[(r * c8 + c) * 4];
            if (rr[0] != ref && rr[0] >= 0)
                RETURN_SCALE(m[0], m[1],
                             td->s->signbias[rr[0]] != td->s->signbias[ref]);
            if (rr[1] != ref && rr[1] >= 0 &&
                (m[0] != m[2] || m[1] != m[3]))
                RETURN_SCALE(m[2], m[3],
                             td->s->signbias[rr[1]] != td->s->signbias[ref]);
        }
    }
    if (s->use_last_frame_mvs && s->prev_mv) {
        const int8_t *rr = &s->prev_ref[(row * c8 + col) * 2];
        const int16_t *m = &s->prev_mv[(row * c8 + col) * 4];
        if (rr[0] != ref && rr[0] >= 0)
            RETURN_SCALE(m[0], m[1],
                         td->s->signbias[rr[0]] != td->s->signbias[ref]);
        if (rr[1] != ref && rr[1] >= 0 && (m[0] != m[2] || m[1] != m[3]))
            RETURN_SCALE(m[2], m[3],
                         td->s->signbias[rr[1]] != td->s->signbias[ref]);
    }
    CLAMP_XY(out_xy[0], out_xy[1], 0, 0);
    return 1;
#undef RETURN_DIRECT
#undef RETURN_MV
#undef RETURN_SCALE
#undef CLAMP_XY
}

static int read_mv_component(Td *td, int idx, int hp)
{
    Ctx *s = td->s;
    BoolDec *c = td->c;
    int sign = bd_prob(c, s->p_mv_sign[idx]);
    s->c_mv_sign[idx * 2 + sign]++;
    int cl = bd_tree(c, (const int8_t (*)[2])s->t_mv_class_tree,
                     &s->p_mv_classes[idx * 10]);
    s->c_mv_classes[idx * 11 + cl]++;
    int n;
    if (cl) {
        n = 0;
        for (int m = 0; m < cl; m++) {
            int bit = bd_prob(c, s->p_mv_bits[idx * 10 + m]);
            n |= bit << m;
            s->c_mv_bits[(idx * 10 + m) * 2 + bit]++;
        }
        n <<= 3;
        int bit = bd_tree(c, (const int8_t (*)[2])s->t_mv_fp_tree,
                          &s->p_mv_fp[idx * 3]);
        n |= bit << 1;
        s->c_mv_fp[idx * 4 + bit]++;
        if (hp) {
            bit = bd_prob(c, s->p_mv_hp[idx]);
            s->c_mv_hp[idx * 2 + bit]++;
            n |= bit;
        } else {
            n |= 1;
            s->c_mv_hp[idx * 2 + 1]++;
        }
        n += 8 << cl;
    } else {
        n = bd_prob(c, s->p_mv_class0[idx]);
        s->c_mv_class0[idx * 2 + n]++;
        int bit = bd_tree(c, (const int8_t (*)[2])s->t_mv_fp_tree,
                          &s->p_mv_c0fp[(idx * 2 + n) * 3]);
        s->c_mv_c0fp[(idx * 2 + n) * 4 + bit]++;
        n = (n << 3) | (bit << 1);
        if (hp) {
            bit = bd_prob(c, s->p_mv_c0hp[idx]);
            s->c_mv_c0hp[idx * 2 + bit]++;
            n |= bit;
        } else {
            n |= 1;
            s->c_mv_c0hp[idx * 2 + 1]++;
        }
    }
    return sign ? -(n + 1) : (n + 1);
}

static void fill_mv_one(Td *td, int32_t *mvout, int ref, int z, int mode,
                        int sb)
{
    Ctx *s = td->s;
    int32_t xy[2];
    find_ref_mvs(td, ref, z, mode == NEARMV ? 1 : 0,
                 mode == NEWMV ? -1 : sb, xy);
    int x = xy[0], y = xy[1], hp = 0;
    if (mode == NEWMV || sb == -1) {
        hp = s->highprecisionmvs && x > -64 && x < 64 && y > -64 && y < 64;
        if (!hp) {
            if (y & 1) y += (y < 0) ? 1 : -1;
            if (x & 1) x += (x < 0) ? 1 : -1;
        }
    }
    if (mode == NEWMV) {
        int j = bd_tree(td->c, (const int8_t (*)[2])s->t_mv_joint_tree,
                        s->p_mv_joint);
        s->c_mv_joint[j]++;
        if (j >= 2) y += read_mv_component(td, 0, hp);
        if (j & 1) x += read_mv_component(td, 1, hp);
    }
    mvout[0] = x;
    mvout[1] = y;
}

static void fill_mv(Td *td, int32_t mv[2][2], int mode, int sb)
{
    if (mode == ZEROMV) {
        mv[0][0] = mv[0][1] = mv[1][0] = mv[1][1] = 0;
        return;
    }
    fill_mv_one(td, mv[0], td->ref[0], 0, mode, sb);
    if (td->comp)
        fill_mv_one(td, mv[1], td->ref[1], 1, mode, sb);
}

/* ------------------------------------------------------------------ */
#include "vp9_entropy_block.h"
#include "vp9_entropy_mode.h"
#include "vp9_entropy_main.h"

/* Pass-B support: gather nonzero 32x32 coefficient tiles (int32 plane ->
 * packed int16 tiles) for the thin host->device upload.  numpy's
 * advanced-indexing equivalent costs ~100ms on a keyframe; this is a
 * straight memcpy loop. */
void vp9_gather_tiles(const int32_t *coef, int W, const int32_t *ti,
                      const int32_t *tj, int k, int16_t *out)
{
    for (int n = 0; n < k; n++) {
        const int32_t *src = coef + (int64_t)ti[n] * 32 * W + (int64_t)tj[n] * 32;
        int16_t *dst = out + (int64_t)n * 1024;
        for (int r = 0; r < 32; r++) {
            const int32_t *s = src + (int64_t)r * W;
            int16_t *d = dst + r * 32;
            for (int c = 0; c < 32; c++)
                d[c] = (int16_t)s[c];
        }
    }
}

/* Pack one plane's nonzero 32x32 tiles into combined upload rows:
 * [1024 coef int16 | 64 eob int16 | ti | tj | pad pad].  eob4 has row
 * stride c4 (the plane's 4x4-cell grid). */
void vp9_pack_plane_tiles(const int32_t *coef, int W,
                          const int32_t *eob4, int c4,
                          const int32_t *ti, const int32_t *tj, int k,
                          int16_t *out)
{
    for (int n = 0; n < k; n++) {
        const int32_t *src = coef + (int64_t)ti[n] * 32 * W + (int64_t)tj[n] * 32;
        int16_t *d = out + (int64_t)n * 1092;
        for (int r = 0; r < 32; r++) {
            const int32_t *s = src + (int64_t)r * W;
            for (int c = 0; c < 32; c++)
                d[r * 32 + c] = (int16_t)s[c];
        }
        const int32_t *esrc = eob4 + (int64_t)ti[n] * 8 * c4 + (int64_t)tj[n] * 8;
        for (int r = 0; r < 8; r++)
            for (int c = 0; c < 8; c++)
                d[1024 + r * 8 + c] = (int16_t)esrc[(int64_t)r * c4 + c];
        d[1088] = (int16_t)ti[n];
        d[1089] = (int16_t)tj[n];
        d[1090] = 0;
        d[1091] = 0;
    }
}

/* Count/pack nonzero dequantized coefficients as (flat position, value)
 * triples of int16 (pos split hi/lo).  Walk is driven by the eob grid
 * (eob stored at tx-block root cells only), so only coded tx blocks'
 * areas are read: a 1080p keyframe ships ~250k pairs (~1.5MB) instead
 * of 6.5MB of dense 32x32 tiles.  Also emits (cell, eob) triples for
 * rebuilding the eob grid on device. */
int vp9_count_pairs(const int32_t *coef, int W,
                    const int32_t *eob4, const int8_t *txsz4,
                    int r4, int c4, int32_t *counts /* [2] */)
{
    int nc = 0, ne = 0;
    for (int r = 0; r < r4; r++) {
        for (int c = 0; c < c4; c++) {
            int eob = eob4[(int64_t)r * c4 + c];
            if (!eob)
                continue;
            ne++;
            int sz = 4 << txsz4[(int64_t)r * c4 + c];
            const int32_t *p = coef + (int64_t)r * 4 * W + (int64_t)c * 4;
            for (int y = 0; y < sz; y++)
                for (int x = 0; x < sz; x++)
                    if (p[(int64_t)y * W + x])
                        nc++;
        }
    }
    counts[0] = nc;
    counts[1] = ne;
    return 0;
}

/* Wide variant for 10/12-bit planes: dequantized dctcoefs are int32
 * there (reference: bit_depth_template.c dctcoef=int32_t), so values
 * ship as (hi, lo) int16 halves -> rows of (poshi, poslo, valhi,
 * vallo). */
int vp9_pack_pairs_wide(const int32_t *coef, int W,
                        const int32_t *eob4, const int8_t *txsz4,
                        int r4, int c4, int32_t cbase, int32_t ebase,
                        int16_t *coef_out /* [capc][4] */, int capc,
                        int16_t *eob_out /* [cape][3] */, int cape)
{
    int nc = 0, ne = 0;
    for (int r = 0; r < r4; r++) {
        for (int c = 0; c < c4; c++) {
            int eob = eob4[(int64_t)r * c4 + c];
            if (!eob)
                continue;
            if (ne >= cape)
                return -1;
            int32_t cell = ebase + r * c4 + c;
            eob_out[ne * 3 + 0] = (int16_t)(cell >> 16);
            eob_out[ne * 3 + 1] = (int16_t)(cell & 0xffff);
            eob_out[ne * 3 + 2] = (int16_t)eob;
            ne++;
            int sz = 4 << txsz4[(int64_t)r * c4 + c];
            const int32_t *p = coef + (int64_t)r * 4 * W + (int64_t)c * 4;
            int64_t base = (int64_t)r * 4 * W + (int64_t)c * 4;
            for (int y = 0; y < sz; y++) {
                for (int x = 0; x < sz; x++) {
                    int32_t v = p[(int64_t)y * W + x];
                    if (!v)
                        continue;
                    if (nc >= capc)
                        return -1;
                    int32_t pos = (int32_t)(cbase + base
                                            + (int64_t)y * W + x);
                    coef_out[nc * 4 + 0] = (int16_t)(pos >> 16);
                    coef_out[nc * 4 + 1] = (int16_t)(pos & 0xffff);
                    coef_out[nc * 4 + 2] = (int16_t)(v >> 16);
                    coef_out[nc * 4 + 3] = (int16_t)(v & 0xffff);
                    nc++;
                }
            }
        }
    }
    return 0;
}

int vp9_pack_pairs(const int32_t *coef, int W,
                   const int32_t *eob4, const int8_t *txsz4,
                   int r4, int c4, int32_t cbase, int32_t ebase,
                   int16_t *coef_out /* [capc][3] */, int capc,
                   int16_t *eob_out /* [cape][3] */, int cape)
{
    int nc = 0, ne = 0;
    for (int r = 0; r < r4; r++) {
        for (int c = 0; c < c4; c++) {
            int eob = eob4[(int64_t)r * c4 + c];
            if (!eob)
                continue;
            if (ne >= cape)
                return -1;
            int32_t cell = ebase + r * c4 + c;
            eob_out[ne * 3 + 0] = (int16_t)(cell >> 16);
            eob_out[ne * 3 + 1] = (int16_t)(cell & 0xffff);
            eob_out[ne * 3 + 2] = (int16_t)eob;
            ne++;
            int sz = 4 << txsz4[(int64_t)r * c4 + c];
            const int32_t *p = coef + (int64_t)r * 4 * W + (int64_t)c * 4;
            int64_t base = (int64_t)r * 4 * W + (int64_t)c * 4;
            for (int y = 0; y < sz; y++) {
                for (int x = 0; x < sz; x++) {
                    int32_t v = p[(int64_t)y * W + x];
                    if (!v)
                        continue;
                    if (nc >= capc)
                        return -1;
                    int32_t pos = (int32_t)(cbase + base
                                            + (int64_t)y * W + x);
                    coef_out[nc * 3 + 0] = (int16_t)(pos >> 16);
                    coef_out[nc * 3 + 1] = (int16_t)(pos & 0xffff);
                    coef_out[nc * 3 + 2] = (int16_t)v;
                    nc++;
                }
            }
        }
    }
    return 0;
}

/* ------------------------------------------------------------------ */
/* Intra wavefront schedule: C mirror of recon_tpu._build_intra_schedule
 * (the pass-B host product that dominated the pipelined pass-A stage).
 * Walks the intra block records, computes each tx block's dependency
 * level from the LW grid (level = 1 + max(level of read cells)), and
 * emits compact entries [py, px, m, have_top, have_left, have_right,
 * n_have_top, n_have_left] plus (level, sz) keys. The caller groups
 * entries by (level, sz) with a stable sort — blocks within a level
 * are mutually independent by construction.
 * recs: [nrecs][36] int16 block records (row, col, tcs, bs, ..., intra
 * at [6], tx [7], uvtx [8], modes [9..12], uvmode [13]).
 * mode_conv: int8 [10][2][2] indexed [mode][have_left][have_top].
 * lw: caller-zeroed int32 scratch [(r4 + 8) * (c4 + 8)].
 * Returns the entry count, or -1 on capacity overflow. */
int vp9_intra_schedule(const int16_t *recs, int nrecs,
                       int cols, int rows, int ss_h, int ss_v,
                       int plane, int r4, int c4,
                       const int8_t *mode_conv, int32_t *lw,
                       int16_t *ent_out, int32_t *key_out, int cap)
{
    const int lws = c4 + 8;
    int n = 0;
    if (plane != 0) { ss_h = ss_h; ss_v = ss_v; } else { ss_h = 0; ss_v = 0; }
    for (int bi = 0; bi < nrecs; bi++) {
        const int16_t *r = recs + (size_t)bi * 36;
        if (!r[6])
            continue;
        int row = r[0], col = r[1], tcs = r[2], bs = r[3];
        int w4, h4, end_x, end_y, tx;
        if (plane == 0) {
            w4 = bwh_tab[1][bs][0] * 2;
            h4 = bwh_tab[1][bs][1] * 2;
            end_x = 2 * (cols - col) < w4 ? 2 * (cols - col) : w4;
            end_y = 2 * (rows - row) < h4 ? 2 * (rows - row) : h4;
            tx = r[7];
        } else {
            int bw4 = bwh_tab[1][bs][0] * 2, bh4 = bwh_tab[1][bs][1] * 2;
            w4 = bw4 >> ss_h;
            h4 = bh4 >> ss_v;
            end_x = (2 * (cols - col) < bw4 ? 2 * (cols - col) : bw4)
                    >> ss_h;
            end_y = (2 * (rows - row) < bh4 ? 2 * (rows - row) : bh4)
                    >> ss_v;
            tx = r[8];
        }
        int step = 1 << tx, sz = 4 << tx, k = sz / 4;
        for (int y = 0; y < end_y; y += step) {
            for (int x = 0; x < end_x; x += step) {
                int mode, py, px, n_have_top, n_have_left;
                if (plane == 0) {
                    mode = (bs > 9 && tx == 0) ? r[9 + y * 2 + x] : r[9];
                    py = row * 8 + y * 4;
                    px = col * 8 + x * 4;
                    n_have_top = ((cols - col) * 2 - x) * 4;
                    n_have_left = ((rows - row) * 2 - y) * 4;
                } else {
                    mode = r[13];
                    py = ((row * 8) >> ss_v) + y * 4;
                    px = ((col * 8) >> ss_h) + x * 4;
                    n_have_top = (((cols - col) << (ss_h ? 0 : 1)) - x)
                                 * 4;
                    n_have_left = (((rows - row) << (ss_v ? 0 : 1)) - y)
                                  * 4;
                }
                int have_top = (row > 0 || y > 0);
                int have_left = (col > tcs || x > 0);
                int have_right = x < w4 - 1;
                int m = mode_conv[mode * 4 + have_left * 2 + have_top];
                int cy0 = py / 4, cx0 = px / 4;
                int lvl = 0;
                if (have_top && cy0) {
                    int x0 = cx0 - 1 > 0 ? cx0 - 1 : 0;
                    const int32_t *rowp = lw + (size_t)(cy0 - 1) * lws;
                    for (int c = x0; c < cx0 + 2 * k; c++)
                        if (rowp[c] > lvl)
                            lvl = rowp[c];
                }
                if (have_left && cx0) {
                    for (int rr = cy0; rr < cy0 + k; rr++) {
                        int32_t v = lw[(size_t)rr * lws + cx0 - 1];
                        if (v > lvl)
                            lvl = v;
                    }
                }
                lvl += 1;
                for (int rr = cy0; rr < cy0 + k; rr++)
                    for (int cc = cx0; cc < cx0 + k; cc++)
                        lw[(size_t)rr * lws + cc] = lvl;
                if (n >= cap)
                    return -1;
                int16_t *e = ent_out + (size_t)n * 8;
                e[0] = (int16_t)py; e[1] = (int16_t)px;
                e[2] = (int16_t)m; e[3] = (int16_t)have_top;
                e[4] = (int16_t)have_left; e[5] = (int16_t)have_right;
                e[6] = (int16_t)(n_have_top > 32000 ? 32000
                                 : n_have_top);
                e[7] = (int16_t)(n_have_left > 32000 ? 32000
                                 : n_have_left);
                key_out[(size_t)n * 2] = lvl;
                key_out[(size_t)n * 2 + 1] = sz;
                n++;
            }
        }
    }
    return n;
}


/* ------------------------------------------------------------------ */
/* compressed-header parse: txfm mode + all probability updates        */
/* (reference: vp9.c:908-1113; mirrors header.parse_compressed_header) */

static const uint8_t chdr_inv_map_table[255] = {
    7, 20, 33, 46, 59, 72, 85, 98, 111, 124, 137, 150, 163, 176, 189,
    202, 215, 228, 241, 254, 1, 2, 3, 4, 5, 6, 8, 9, 10, 11,
    12, 13, 14, 15, 16, 17, 18, 19, 21, 22, 23, 24, 25, 26, 27,
    28, 29, 30, 31, 32, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 60,
    61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 73, 74, 75, 76,
    77, 78, 79, 80, 81, 82, 83, 84, 86, 87, 88, 89, 90, 91, 92,
    93, 94, 95, 96, 97, 99, 100, 101, 102, 103, 104, 105, 106, 107, 108,
    109, 110, 112, 113, 114, 115, 116, 117, 118, 119, 120, 121, 122, 123, 125,
    126, 127, 128, 129, 130, 131, 132, 133, 134, 135, 136, 138, 139, 140, 141,
    142, 143, 144, 145, 146, 147, 148, 149, 151, 152, 153, 154, 155, 156, 157,
    158, 159, 160, 161, 162, 164, 165, 166, 167, 168, 169, 170, 171, 172, 173,
    174, 175, 177, 178, 179, 180, 181, 182, 183, 184, 185, 186, 187, 188, 190,
    191, 192, 193, 194, 195, 196, 197, 198, 199, 200, 201, 203, 204, 205, 206,
    207, 208, 209, 210, 211, 212, 213, 214, 216, 217, 218, 219, 220, 221, 222,
    223, 224, 225, 226, 227, 229, 230, 231, 232, 233, 234, 235, 236, 237, 238,
    239, 240, 242, 243, 244, 245, 246, 247, 248, 249, 250, 251, 252, 253, 253
};

static inline int chdr_inv_recenter(int v, int m)
{
    if (v > 2 * m) return v;
    if (v & 1) return m - ((v + 1) >> 1);
    return m + (v >> 1);
}

static inline int chdr_uint(BoolDec *c, int n)
{
    int v = 0;
    while (n--) v = (v << 1) | bd_bit(c);
    return v;
}

/* subexp delta update, ungated (reference: vp9.c:399-455) */
static int chdr_update_prob(BoolDec *c, int p)
{
    int d;
    if (!bd_bit(c)) d = chdr_uint(c, 4);
    else if (!bd_bit(c)) d = chdr_uint(c, 4) + 16;
    else if (!bd_bit(c)) d = chdr_uint(c, 5) + 32;
    else {
        d = chdr_uint(c, 7);
        if (d >= 65) d = (d << 1) - 65 + bd_bit(c);
        d += 64;
    }
    int m = chdr_inv_map_table[d];
    if (p <= 128) return 1 + chdr_inv_recenter(m, p - 1);
    return 255 - chdr_inv_recenter(m, 255 - p);
}

#define UPD(cell) do { \
        if (bd_prob(c, 252)) (cell) = (uint8_t)chdr_update_prob(c, (cell)); \
    } while (0)

/* 7-bit mv prob update (NOT subexp; reference: vp9.c:1063) */
#define UPD_MV(cell) do { \
        if (bd_prob(c, 252)) (cell) = (uint8_t)((chdr_uint(c, 7) << 1) | 1); \
    } while (0)

int vp9_parse_chdr(const uint8_t *data, int size,
                   int lossless, int interframe, int filter_switchable,
                   int allowcompinter, int highprecisionmvs,
                   int32_t *txfmmode_out, int32_t *comppredmode_out,
                   uint8_t *tx8p /* [2] */, uint8_t *tx16p /* [2][2] */,
                   uint8_t *tx32p /* [2][3] */,
                   uint8_t *coef /* [4][2][2][6][6][3] */,
                   uint8_t *skip /* [3] */, uint8_t *mv_mode /* [7][3] */,
                   uint8_t *filter /* [4][2] */, uint8_t *intra /* [4] */,
                   uint8_t *comp /* [5] */,
                   uint8_t *single_ref /* [5][2] */,
                   uint8_t *comp_ref /* [5] */,
                   uint8_t *y_mode /* [4][9] */,
                   uint8_t *partition /* [4][4][3] */,
                   uint8_t *mv_joint /* [3] */, uint8_t *mv_sign /* [2] */,
                   uint8_t *mv_classes /* [2][10] */,
                   uint8_t *mv_class0 /* [2] */,
                   uint8_t *mv_bits /* [2][10] */,
                   uint8_t *mv_class0_fp /* [2][2][3] */,
                   uint8_t *mv_fp /* [2][3] */,
                   uint8_t *mv_class0_hp /* [2] */,
                   uint8_t *mv_hp /* [2] */)
{
    BoolDec c_s, *c = &c_s;
    bd_init(c, data, size);
    if (bd_bit(c))
        return -2;                       /* marker bit set */

    int txfmmode;
    if (lossless) {
        txfmmode = 0;                    /* TX_4X4 */
    } else {
        txfmmode = chdr_uint(c, 2);
        if (txfmmode == 3)
            txfmmode += bd_bit(c);
        if (txfmmode == 4) {             /* TX_SWITCHABLE */
            for (int i = 0; i < 2; i++)
                UPD(tx8p[i]);
            for (int i = 0; i < 2; i++)
                for (int j = 0; j < 2; j++)
                    UPD(tx16p[i * 2 + j]);
            for (int i = 0; i < 2; i++)
                for (int j = 0; j < 3; j++)
                    UPD(tx32p[i * 3 + j]);
        }
    }
    *txfmmode_out = txfmmode;

    /* coef prob updates; each cell is touched at most once, so the
     * in-place update is equivalent to the reference's old/new split */
    for (int i = 0; i < 4; i++) {
        if (bd_bit(c)) {
            for (int j = 0; j < 2; j++)
                for (int k = 0; k < 2; k++)
                    for (int l = 0; l < 6; l++)
                        for (int m = 0; m < 6; m++) {
                            if (m >= 3 && l == 0)   /* dc: 3 pt only */
                                break;
                            for (int n = 0; n < 3; n++)
                                UPD(coef[((((i * 2 + j) * 2 + k) * 6
                                           + l) * 6 + m) * 3 + n]);
                        }
        }
        if (txfmmode == i)
            break;
    }

    for (int i = 0; i < 3; i++)
        UPD(skip[i]);

    if (interframe) {
        for (int i = 0; i < 7; i++)
            for (int j = 0; j < 3; j++)
                UPD(mv_mode[i * 3 + j]);
        if (filter_switchable)
            for (int i = 0; i < 4; i++)
                for (int j = 0; j < 2; j++)
                    UPD(filter[i * 2 + j]);
        for (int i = 0; i < 4; i++)
            UPD(intra[i]);
        int comppredmode = 0;            /* PRED_SINGLEREF */
        if (allowcompinter) {
            comppredmode = bd_bit(c);
            if (comppredmode)
                comppredmode += bd_bit(c);
            if (comppredmode == 2)       /* PRED_SWITCHABLE */
                for (int i = 0; i < 5; i++)
                    UPD(comp[i]);
        }
        if (comppredmode != 1)           /* != PRED_COMPREF */
            for (int i = 0; i < 5; i++) {
                UPD(single_ref[i * 2 + 0]);
                UPD(single_ref[i * 2 + 1]);
            }
        if (comppredmode != 0)           /* != PRED_SINGLEREF */
            for (int i = 0; i < 5; i++)
                UPD(comp_ref[i]);
        *comppredmode_out = comppredmode;
        for (int i = 0; i < 4; i++)
            for (int j = 0; j < 9; j++)
                UPD(y_mode[i * 9 + j]);
        for (int i = 0; i < 4; i++)
            for (int j = 0; j < 4; j++)
                for (int k = 0; k < 3; k++)
                    UPD(partition[((3 - i) * 4 + j) * 3 + k]);
        for (int i = 0; i < 3; i++)
            UPD_MV(mv_joint[i]);
        for (int i = 0; i < 2; i++) {
            UPD_MV(mv_sign[i]);
            for (int j = 0; j < 10; j++)
                UPD_MV(mv_classes[i * 10 + j]);
            UPD_MV(mv_class0[i]);
            for (int j = 0; j < 10; j++)
                UPD_MV(mv_bits[i * 10 + j]);
        }
        for (int i = 0; i < 2; i++) {
            for (int j = 0; j < 2; j++)
                for (int k = 0; k < 3; k++)
                    UPD_MV(mv_class0_fp[(i * 2 + j) * 3 + k]);
            for (int j = 0; j < 3; j++)
                UPD_MV(mv_fp[i * 3 + j]);
        }
        if (highprecisionmvs)
            for (int i = 0; i < 2; i++) {
                UPD_MV(mv_class0_hp[i]);
                UPD_MV(mv_hp[i]);
            }
    }
    return 0;
}
