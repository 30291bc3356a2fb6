"""Backward probability adaptation after each frame.

Behavioral reference: ff_vp9_adapt_probs (libavcodec/vp9prob.c:27-272).
Adapts the stored frame context in place toward the observed symbol
counts (the forward-updated decode probs are NOT the adaptation source,
matching libvpx pre_fc semantics).
"""
import numpy as np

from .header import (TX_SWITCHABLE, FILTER_SWITCHABLE, PRED_SWITCHABLE,
                     PRED_SINGLEREF, PRED_COMPREF)

(VERT, HOR, DC, DDL, DDR, VR, HD, VL, HU, TM) = range(10)


def _adapt(arr, idx, ct0, ct1, max_count, update_factor):
    ct0, ct1 = int(ct0), int(ct1)
    ct = ct0 + ct1
    if not ct:
        return
    uf = (update_factor * min(ct, max_count)) // max_count
    p1 = int(arr[idx])
    p2 = ((ct0 << 8) + (ct >> 1)) // ct
    p2 = min(max(p2, 1), 255)
    arr[idx] = p1 + (((p2 - p1) * uf + 128) >> 8)


def adapt_probs(ctx, probs, counts, h, last_keyframe):
    """ctx: Probs (frame context, modified in place); probs: the decode-time
    Probs (forward-updated); counts: Counts; h: Header."""
    uf = 112 if (h.keyframe or h.intraonly or not last_keyframe) else 128

    # coefficients (vectorized over all [4][2][2][6][6] positions; the
    # l==0, m>=3 dc-only positions are masked out)
    def vadapt(p1, ct0, ct1):
        ct0 = ct0.astype(np.int64)
        ct1 = ct1.astype(np.int64)
        ct = ct0 + ct1
        ufv = (uf * np.minimum(ct, 24)) // 24
        safe = np.maximum(ct, 1)
        p2 = np.clip(((ct0 << 8) + (ct >> 1)) // safe, 1, 255)
        newp = p1.astype(np.int64) + (((p2 - p1) * ufv + 128) >> 8)
        return np.where(ct > 0, newp, p1).astype(np.uint8)

    mask = np.ones((4, 2, 2, 6, 6), bool)
    mask[:, :, :, 0, 3:] = False
    e = counts.eob
    cc = counts.coef
    new0 = vadapt(ctx.coef[..., 0], e[..., 0], e[..., 1])
    new1 = vadapt(ctx.coef[..., 1], cc[..., 0],
                  cc[..., 1].astype(np.int64) + cc[..., 2])
    new2 = vadapt(ctx.coef[..., 2], cc[..., 1], cc[..., 2])
    ctx.coef[..., 0] = np.where(mask, new0, ctx.coef[..., 0])
    ctx.coef[..., 1] = np.where(mask, new1, ctx.coef[..., 1])
    ctx.coef[..., 2] = np.where(mask, new2, ctx.coef[..., 2])

    if h.keyframe or h.intraonly:
        ctx.skip[...] = probs.skip
        ctx.tx32p[...] = probs.tx32p
        ctx.tx16p[...] = probs.tx16p
        ctx.tx8p[...] = probs.tx8p
        return

    for i in range(3):
        _adapt(ctx.skip, i, counts.skip[i, 0], counts.skip[i, 1], 20, 128)
    for i in range(4):
        _adapt(ctx.intra, i, counts.intra[i, 0], counts.intra[i, 1], 20, 128)
    if h.comppredmode == PRED_SWITCHABLE:
        for i in range(5):
            _adapt(ctx.comp, i, counts.comp[i, 0], counts.comp[i, 1],
                   20, 128)
    if h.comppredmode != PRED_SINGLEREF:
        for i in range(5):
            _adapt(ctx.comp_ref, i, counts.comp_ref[i, 0],
                   counts.comp_ref[i, 1], 20, 128)
    if h.comppredmode != PRED_COMPREF:
        for i in range(5):
            _adapt(ctx.single_ref[i], 0, counts.single_ref[i, 0, 0],
                   counts.single_ref[i, 0, 1], 20, 128)
            _adapt(ctx.single_ref[i], 1, counts.single_ref[i, 1, 0],
                   counts.single_ref[i, 1, 1], 20, 128)

    for i in range(4):
        for j in range(4):
            pp = ctx.partition[i, j]
            c = counts.partition[i, j].astype(np.int64)
            _adapt(pp, 0, c[0], c[1] + c[2] + c[3], 20, 128)
            _adapt(pp, 1, c[1], c[2] + c[3], 20, 128)
            _adapt(pp, 2, c[2], c[3], 20, 128)

    if h.txfmmode == TX_SWITCHABLE:
        for i in range(2):
            c16 = counts.tx16p[i].astype(np.int64)
            c32 = counts.tx32p[i].astype(np.int64)
            _adapt(ctx.tx8p, i, counts.tx8p[i, 0], counts.tx8p[i, 1],
                   20, 128)
            _adapt(ctx.tx16p[i], 0, c16[0], c16[1] + c16[2], 20, 128)
            _adapt(ctx.tx16p[i], 1, c16[1], c16[2], 20, 128)
            _adapt(ctx.tx32p[i], 0, c32[0], c32[1] + c32[2] + c32[3],
                   20, 128)
            _adapt(ctx.tx32p[i], 1, c32[1], c32[2] + c32[3], 20, 128)
            _adapt(ctx.tx32p[i], 2, c32[2], c32[3], 20, 128)

    if h.filtermode == FILTER_SWITCHABLE:
        for i in range(4):
            c = counts.filter[i].astype(np.int64)
            _adapt(ctx.filter[i], 0, c[0], c[1] + c[2], 20, 128)
            _adapt(ctx.filter[i], 1, c[1], c[2], 20, 128)

    for i in range(7):
        c = counts.mv_mode[i].astype(np.int64)
        _adapt(ctx.mv_mode[i], 0, c[2], c[1] + c[0] + c[3], 20, 128)
        _adapt(ctx.mv_mode[i], 1, c[0], c[1] + c[3], 20, 128)
        _adapt(ctx.mv_mode[i], 2, c[1], c[3], 20, 128)

    c = counts.mv_joint.astype(np.int64)
    _adapt(ctx.mv_joint, 0, c[0], c[1] + c[2] + c[3], 20, 128)
    _adapt(ctx.mv_joint, 1, c[1], c[2] + c[3], 20, 128)
    _adapt(ctx.mv_joint, 2, c[2], c[3], 20, 128)

    for i in range(2):
        _adapt(ctx.mv_sign, i, counts.mv_sign[i, 0], counts.mv_sign[i, 1],
               20, 128)
        c = counts.mv_classes[i].astype(np.int64)
        sm = int(c[1:11].sum())
        pp = ctx.mv_classes[i]
        _adapt(pp, 0, c[0], sm, 20, 128)
        sm -= c[1]
        _adapt(pp, 1, c[1], sm, 20, 128)
        sm -= c[2] + c[3]
        _adapt(pp, 2, c[2] + c[3], sm, 20, 128)
        _adapt(pp, 3, c[2], c[3], 20, 128)
        sm -= c[4] + c[5]
        _adapt(pp, 4, c[4] + c[5], sm, 20, 128)
        _adapt(pp, 5, c[4], c[5], 20, 128)
        sm -= c[6]
        _adapt(pp, 6, c[6], sm, 20, 128)
        _adapt(pp, 7, c[7] + c[8], c[9] + c[10], 20, 128)
        _adapt(pp, 8, c[7], c[8], 20, 128)
        _adapt(pp, 9, c[9], c[10], 20, 128)

        _adapt(ctx.mv_class0, i, counts.mv_class0[i, 0],
               counts.mv_class0[i, 1], 20, 128)
        for j in range(10):
            _adapt(ctx.mv_bits[i], j, counts.mv_bits[i, j, 0],
                   counts.mv_bits[i, j, 1], 20, 128)
        for j in range(2):
            c = counts.mv_class0_fp[i, j].astype(np.int64)
            pp = ctx.mv_class0_fp[i, j]
            _adapt(pp, 0, c[0], c[1] + c[2] + c[3], 20, 128)
            _adapt(pp, 1, c[1], c[2] + c[3], 20, 128)
            _adapt(pp, 2, c[2], c[3], 20, 128)
        c = counts.mv_fp[i].astype(np.int64)
        pp = ctx.mv_fp[i]
        _adapt(pp, 0, c[0], c[1] + c[2] + c[3], 20, 128)
        _adapt(pp, 1, c[1], c[2] + c[3], 20, 128)
        _adapt(pp, 2, c[2], c[3], 20, 128)
        if h.highprecisionmvs:
            _adapt(ctx.mv_class0_hp, i, counts.mv_class0_hp[i, 0],
                   counts.mv_class0_hp[i, 1], 20, 128)
            _adapt(ctx.mv_hp, i, counts.mv_hp[i, 0], counts.mv_hp[i, 1],
                   20, 128)

    def adapt_modes(pp, c):
        c = c.astype(np.int64)
        sm = int(c[0] + c[1] + c[3] + c[4] + c[5] + c[6] + c[7] + c[8]
                 + c[9])
        _adapt(pp, 0, c[DC], sm, 20, 128)
        sm -= c[TM]
        _adapt(pp, 1, c[TM], sm, 20, 128)
        sm -= c[VERT]
        _adapt(pp, 2, c[VERT], sm, 20, 128)
        s2 = int(c[HOR] + c[DDR] + c[VR])
        sm -= s2
        _adapt(pp, 3, s2, sm, 20, 128)
        s2 -= c[HOR]
        _adapt(pp, 4, c[HOR], s2, 20, 128)
        _adapt(pp, 5, c[DDR], c[VR], 20, 128)
        sm -= c[DDL]
        _adapt(pp, 6, c[DDL], sm, 20, 128)
        sm -= c[VL]
        _adapt(pp, 7, c[VL], sm, 20, 128)
        _adapt(pp, 8, c[HD], c[HU], 20, 128)

    for i in range(4):
        adapt_modes(ctx.y_mode[i], counts.y_mode[i])
    for i in range(10):
        adapt_modes(ctx.uv_mode[i], counts.uv_mode[i])
