/*
 * Dump the normative VP9 constant tables from the reference build
 * (libavcodec/vp9data.c declarations in vp9data.h) as JSON on stdout.
 *
 * These are spec-defined constants (VP9 bitstream spec / libvpx), extracted
 * mechanically so the Python port is guaranteed value-exact. Compile:
 *   gcc -I$BUILD -I$SRC -I$SRC/libavcodec tools/dump_tables.c \
 *       $BUILD/libavcodec/vp9data.o -o dump_tables
 */
#include <stdio.h>
#include <stdint.h>
#include "libavcodec/vp9data.h"

static void dump_i(const char *name, const void *p, int elem_size, int is_signed,
                   int ndim, const int *dims) {
    long total = 1;
    for (int i = 0; i < ndim; i++) total *= dims[i];
    printf("\"%s\": {\"dims\": [", name);
    for (int i = 0; i < ndim; i++) printf("%d%s", dims[i], i + 1 < ndim ? "," : "");
    printf("], \"data\": [");
    for (long i = 0; i < total; i++) {
        long long v;
        const uint8_t *b = (const uint8_t *)p + i * elem_size;
        if (elem_size == 1) v = is_signed ? *(const int8_t *)b : *(const uint8_t *)b;
        else if (elem_size == 2) v = is_signed ? *(const int16_t *)b : *(const uint16_t *)b;
        else v = is_signed ? *(const int32_t *)b : *(const uint32_t *)b;
        printf("%lld%s", v, i + 1 < total ? "," : "");
    }
    printf("]},\n");
}

#define D(name, type, sign, ...) do { \
    int dims[] = {__VA_ARGS__};       \
    dump_i(#name, &name, sizeof(type), sign, sizeof(dims)/sizeof(int), dims); \
} while (0)

extern const int16_t ff_vp9_subpel_filters[3][16][8];
extern const uint8_t ff_vpx_norm_shift[256];

int main(void) {
    printf("{\n");
    D(ff_vp9_subpel_filters, int16_t, 1, 3, 16, 8);
    D(ff_vpx_norm_shift, uint8_t, 0, 256);
    D(ff_vp9_bwh_tab, uint8_t, 0, 2, N_BS_SIZES, 2);
    D(ff_vp9_partition_tree, int8_t, 1, 3, 2);
    D(ff_vp9_default_kf_partition_probs, uint8_t, 0, 4, 4, 3);
    D(ff_vp9_segmentation_tree, int8_t, 1, 7, 2);
    D(ff_vp9_intramode_tree, int8_t, 1, 9, 2);
    D(ff_vp9_default_kf_ymode_probs, uint8_t, 0, 10, 10, 9);
    D(ff_vp9_default_kf_uvmode_probs, uint8_t, 0, 10, 9);
    D(ff_vp9_inter_mode_tree, int8_t, 1, 3, 2);
    D(ff_vp9_filter_tree, int8_t, 1, 2, 2);
    {
        int dims[] = {3};
        int vals[3];
        for (int i = 0; i < 3; i++) vals[i] = (int)ff_vp9_filter_lut[i];
        dump_i("ff_vp9_filter_lut", vals, 4, 1, 1, dims);
    }
    D(ff_vp9_dc_qlookup, int16_t, 1, 3, 256);
    D(ff_vp9_ac_qlookup, int16_t, 1, 3, 256);
    {
        int dims[] = {14};
        int vals[14];
        for (int i = 0; i < 14; i++) vals[i] = (int)ff_vp9_intra_txfm_type[i];
        dump_i("ff_vp9_intra_txfm_type", vals, 4, 1, 1, dims);
    }
    D(ff_vp9_default_scan_4x4, int16_t, 1, 16);
    D(ff_vp9_col_scan_4x4, int16_t, 1, 16);
    D(ff_vp9_row_scan_4x4, int16_t, 1, 16);
    D(ff_vp9_default_scan_8x8, int16_t, 1, 64);
    D(ff_vp9_col_scan_8x8, int16_t, 1, 64);
    D(ff_vp9_row_scan_8x8, int16_t, 1, 64);
    D(ff_vp9_default_scan_16x16, int16_t, 1, 256);
    D(ff_vp9_col_scan_16x16, int16_t, 1, 256);
    D(ff_vp9_row_scan_16x16, int16_t, 1, 256);
    D(ff_vp9_default_scan_32x32, int16_t, 1, 1024);
    D(ff_vp9_default_scan_4x4_nb, int16_t, 1, 16, 2);
    D(ff_vp9_col_scan_4x4_nb, int16_t, 1, 16, 2);
    D(ff_vp9_row_scan_4x4_nb, int16_t, 1, 16, 2);
    D(ff_vp9_default_scan_8x8_nb, int16_t, 1, 64, 2);
    D(ff_vp9_col_scan_8x8_nb, int16_t, 1, 64, 2);
    D(ff_vp9_row_scan_8x8_nb, int16_t, 1, 64, 2);
    D(ff_vp9_default_scan_16x16_nb, int16_t, 1, 256, 2);
    D(ff_vp9_col_scan_16x16_nb, int16_t, 1, 256, 2);
    D(ff_vp9_row_scan_16x16_nb, int16_t, 1, 256, 2);
    D(ff_vp9_default_scan_32x32_nb, int16_t, 1, 1024, 2);
    D(ff_vp9_model_pareto8, uint8_t, 0, 256, 8);
    D(ff_vp9_default_coef_probs, uint8_t, 0, 4, 2, 2, 6, 6, 3);
    D(ff_vp9_mv_joint_tree, int8_t, 1, 3, 2);
    D(ff_vp9_mv_class_tree, int8_t, 1, 10, 2);
    D(ff_vp9_mv_fp_tree, int8_t, 1, 3, 2);
    /* ProbContext flattened field-by-field */
    const ProbContext *pc = &ff_vp9_default_probs;
#define DP(field, ...) do { \
    int dims[] = {__VA_ARGS__};       \
    dump_i("probs_" #field, &pc->field, 1, 0, sizeof(dims)/sizeof(int), dims); \
} while (0)
    DP(y_mode, 4, 9);
    DP(uv_mode, 10, 9);
    DP(filter, 4, 2);
    DP(mv_mode, 7, 3);
    DP(intra, 4);
    DP(comp, 5);
    DP(single_ref, 5, 2);
    DP(comp_ref, 5);
    DP(tx32p, 2, 3);
    DP(tx16p, 2, 2);
    DP(tx8p, 2);
    DP(skip, 3);
    DP(mv_joint, 3);
    {
        for (int c = 0; c < 2; c++) {
            char nm[64];
            const typeof(pc->mv_comp[0]) *m = &pc->mv_comp[c];
            int d1[] = {1};
            int d10[] = {10};
            int d23[] = {2, 3};
            int d3[] = {3};
            snprintf(nm, 64, "mv_comp%d_sign", c);     dump_i(nm, &m->sign, 1, 0, 1, d1);
            snprintf(nm, 64, "mv_comp%d_classes", c);  dump_i(nm, m->classes, 1, 0, 1, d10);
            snprintf(nm, 64, "mv_comp%d_class0", c);   dump_i(nm, &m->class0, 1, 0, 1, d1);
            snprintf(nm, 64, "mv_comp%d_bits", c);     dump_i(nm, m->bits, 1, 0, 1, d10);
            snprintf(nm, 64, "mv_comp%d_class0_fp", c);dump_i(nm, m->class0_fp, 1, 0, 2, d23);
            snprintf(nm, 64, "mv_comp%d_fp", c);       dump_i(nm, m->fp, 1, 0, 1, d3);
            snprintf(nm, 64, "mv_comp%d_class0_hp", c);dump_i(nm, &m->class0_hp, 1, 0, 1, d1);
            snprintf(nm, 64, "mv_comp%d_hp", c);       dump_i(nm, &m->hp, 1, 0, 1, d1);
        }
    }
    DP(partition, 4, 4, 3);
    printf("\"_end\": {\"dims\": [1], \"data\": [0]}\n}\n");
    return 0;
}
