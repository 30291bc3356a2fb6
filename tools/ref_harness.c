/*
 * Differential-test harness: exposes the reference decoder's range coder and
 * DSP kernels (libavcodec static lib) through a plain C ABI so the TPU-native
 * build's kernels can be tested against the reference's bit-exact math from
 * Python/ctypes (our equivalent of tests/checkasm/vp9dsp.c).
 *
 * Build: see tools/build_harness.sh. Test-only artifact; the decoder proper
 * shares no code with this.
 */
#include <stdint.h>
#include <string.h>
#include "libavcodec/vp9dsp.h"
#include "libavcodec/vpx_rac.h"
#include "libavcodec/vp89_rac.h"

static VP9DSPContext dsp8, dsp10, dsp12;
static int inited = 0;

static VP9DSPContext *get_dsp(int bpp) {
    if (!inited) {
        ff_vp9dsp_init(&dsp8, 8, 1);
        ff_vp9dsp_init(&dsp10, 10, 1);
        ff_vp9dsp_init(&dsp12, 12, 1);
        inited = 1;
    }
    return bpp == 8 ? &dsp8 : bpp == 10 ? &dsp10 : &dsp12;
}

/* ---- range coder ----
 * Decode n symbols from buf; probs[i] selects behavior:
 *   0..255   -> vpx_rac_get_prob(prob)
 *   256      -> vp89_rac_get (prob 128 literal bit)
 *   257      -> vpx_rac_get_prob_branchy
 * Returns bits in out. Final decoder state written to state_out[3] =
 * {high, bits, code_word_hi32} for state comparison. */
int ref_rac_decode(const uint8_t *buf, int buf_size, const int32_t *ops, int n,
                   uint8_t *out, int64_t *state_out) {
    VPXRangeCoder c;
    int ret = ff_vpx_init_range_decoder(&c, buf, buf_size);
    if (ret < 0) return ret;
    for (int i = 0; i < n; i++) {
        int op = ops[i];
        if (op == 256)      out[i] = vp89_rac_get(&c);
        else if (op == 257) out[i] = vpx_rac_get_prob_branchy(&c, 128);
        else                out[i] = vpx_rac_get_prob(&c, op);
    }
    state_out[0] = c.high;
    state_out[1] = c.bits;
    state_out[2] = (int64_t)(c.code_word >> 16);
    state_out[3] = vpx_rac_is_end(&c);
    return 0;
}

/* decode literal n-bit values: counts[i] bits each */
int ref_rac_get_uint(const uint8_t *buf, int buf_size, const int32_t *counts,
                     int n, int32_t *out) {
    VPXRangeCoder c;
    int ret = ff_vpx_init_range_decoder(&c, buf, buf_size);
    if (ret < 0) return ret;
    for (int i = 0; i < n; i++)
        out[i] = vp89_rac_get_uint(&c, counts[i]);
    return 0;
}

/* ---- itxfm ----
 * bpp: 8/10/12. tx: 0..4 (4,8,16,32,wht). type: 0..3.
 * dst: uint8 (bpp==8) or uint16 pixel buffer, size*size, stride in BYTES.
 * block: int16 (bpp==8) or int32 coeff buffer (modified by the call!). */
void ref_itxfm_add(int bpp, int tx, int type, uint8_t *dst, ptrdiff_t stride,
                   void *block, int eob) {
    get_dsp(bpp)->itxfm_add[tx][type](dst, stride, block, eob);
}

/* ---- intra pred ----
 * tx: 0..3, mode: 0..14 (N_INTRA_PRED_MODES). left/top: pixel arrays.
 * top must have top[-1] valid => pass pointer to element 1 of a buffer with
 * 64+16 entries; harness takes raw pointers, caller handles layout. */
void ref_intra_pred(int bpp, int tx, int mode, uint8_t *dst, ptrdiff_t stride,
                    const uint8_t *left, const uint8_t *top) {
    get_dsp(bpp)->intra_pred[tx][mode](dst, stride, left, top);
}

/* ---- loop filter ---- */
void ref_loop_filter_8(int bpp, int wd, int dir, uint8_t *dst, ptrdiff_t stride,
                       int mb_lim, int lim, int hev_thr) {
    get_dsp(bpp)->loop_filter_8[wd][dir](dst, stride, mb_lim, lim, hev_thr);
}
void ref_loop_filter_16(int bpp, int dir, uint8_t *dst, ptrdiff_t stride,
                        int mb_lim, int lim, int hev_thr) {
    get_dsp(bpp)->loop_filter_16[dir](dst, stride, mb_lim, lim, hev_thr);
}
void ref_loop_filter_mix2(int bpp, int wd1, int wd2, int dir, uint8_t *dst,
                          ptrdiff_t stride, int mb_lim, int lim, int hev_thr) {
    get_dsp(bpp)->loop_filter_mix2[wd1][wd2][dir](dst, stride, mb_lim, lim,
                                                  hev_thr);
}

/* ---- MC ----
 * hsize: 0..4 (64,32,16,8,4), filter: 0..3 (smooth, regular, sharp, bilin),
 * avg: 0/1, mx/my: 0..15 subpel phase. */
void ref_mc(int bpp, int hsize, int filter, int avg, uint8_t *dst,
            ptrdiff_t dst_stride, const uint8_t *ref, ptrdiff_t ref_stride,
            int h, int mx, int my) {
    get_dsp(bpp)->mc[hsize][filter][avg][!!mx][!!my](dst, dst_stride, ref,
                                                     ref_stride, h, mx, my);
}
void ref_smc(int bpp, int hsize, int filter, int avg, uint8_t *dst,
             ptrdiff_t dst_stride, const uint8_t *ref, ptrdiff_t ref_stride,
             int h, int mx, int my, int dx, int dy) {
    get_dsp(bpp)->smc[hsize][filter][avg](dst, dst_stride, ref, ref_stride, h,
                                          mx, my, dx, dy);
}
