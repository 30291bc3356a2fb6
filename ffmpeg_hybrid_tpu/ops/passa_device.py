"""On-device pass A: the FULL block-syntax walk for both frame
kinds, S tile streams in lockstep.

Extends the multi-stream bool/coefficient machinery (ops/rac_pallas.py)
from single transform blocks to the complete tile decode — partition
quadtree, segment id (incl. temporal prediction from the previous
frame's map), skip, tx size, intra modes (the context-coupled keyframe
trees and the fixed-table non-keyframe path), compound/single
reference selection with the full context chains, interp filter,
whole-block and per-sub-block inter modes, the complete MV layer
(find_ref_mvs candidate scan over the decode-order MV grid +
read_mv_component trees, vp9mvs.c), every coefficient block with live
nnz-context maintenance, and the full vp9prob.c symbol-count taxonomy
— bit-exact against the host decoders on real streams
(tests/test_passa_device.py).

Formulation: one `lax.while_loop` whose body executes ONE bounded
quantum per lane according to a per-lane phase machine —

  PART  one partition-tree node: decode the partition symbol (full
        tree / edge-forced single bit / forced split,
        vp9.c:1115-1193) or emit the node's next child/leaf block;
  MODE  the whole mode bundle of one block (seg id, skip, intra/inter
        flag, tx ladder, modes/refs/filter — vp9block.c:80-802);
  MV    one (sub-block, ref) MV: optional sub-block inter-mode tree,
        the find_ref_mvs 32-slot candidate scan, hp rounding, NEWMV
        joint+component reads (vp9mvs.c:37-365);
  COEF  one scan position of the current transform block (the token
        cascade of vp9block.c:805-923), with transform-block and
        plane transitions folded into the quantum.

Every lane is an independent VP9 tile bool stream (vp9.c:1342), so the
per-symbol scalar ops become [S]-vector ops; divergence is handled by
predication, and the loop runs until every lane's tile is drained.
The per-block sections (MODE, MV, finalize ctx/grids, record emit)
run under real `lax.cond` branches: coefficient quanta dominate the
iteration count, so the while-body's common path stays lean (8.6x
measured on a dense inter frame).

This jnp/XLA instantiation is the bit-exact executable SPECIFICATION
of the walk; at runtime it is op-dispatch-bound (~1000x one host C
core on the tunneled chip — KERNEL_BENCH.json note_passa_device_r5),
so the production on-device entropy path is a Pallas port of this
walk (sequential in-kernel loops; ops/rac_pallas.py holds the
coefficient inner loop today).

Reference: /root/reference/libavcodec/vp9block.c:80-923 (decode_mode /
decode_coeffs / decode_block), vp9.c:1115-1193 (decode_sb),
vp9mvs.c:37-365 (MV prediction/decode), vp9prob.c (count taxonomy),
vpx_rac.h:83-94 (the bool decoder being vectorized).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..codecs.vp9 import tables as T
from ..codecs.vp9.blockdec import (ABOVE_CTX, LEFT_CTX, MAX_TX_FOR_BL_BP,
                                   BAND_COUNTS)

# phases
PART, MODE, COEF, DONE, MV = 0, 1, 2, 3, 4

# ---------------------------------------------------------------------------
# static tables (device constants)


def _band_tables():
    """[4, 1024] band index at each scan position per tx size."""
    out = np.zeros((4, 1024), np.int32)
    for tx in range(4):
        n = (4 << tx) ** 2
        counts = BAND_COUNTS[tx]
        band, left = 0, counts[0]
        for i in range(n):
            out[tx, i] = min(band, 5)
            left -= 1
            if not left and band < 5:
                band += 1
                left = counts[band]
    return out


_BANDS = _band_tables()
_BWH = np.asarray(T.BWH_TAB, np.int32)          # [2][13][2]
_MAXTX = np.asarray(MAX_TX_FOR_BL_BP, np.int32)
_ACTX = np.asarray(ABOVE_CTX, np.int32)
_LCTX = np.asarray(LEFT_CTX, np.int32)
_ITX = np.asarray(T.INTRA_TXFM_TYPE, np.int32)  # mode -> txtype


def _tree_arrays(tree):
    t = np.asarray(tree, np.int32)
    # depth bound: longest root-leaf path
    def depth(i):
        if i <= 0:
            return 0
        best = 0
        for b in range(2):
            n = t[i][b]
            best = max(best, 1 + (depth(n) if n > 0 else 0))
        return best
    d = 1 + max((depth(t[0][b]) if t[0][b] > 0 else 0) for b in range(2))
    return t, d


_PTREE, _PDEPTH = _tree_arrays(T.PARTITION_TREE)
_MTREE, _MDEPTH = _tree_arrays(T.INTRAMODE_TREE)
_STREE, _SDEPTH = _tree_arrays(T.SEGMENTATION_TREE)
_IMTREE, _IMDEPTH = _tree_arrays(T.INTER_MODE_TREE)
_FTREE, _FDEPTH = _tree_arrays(T.FILTER_TREE)
_JTREE, _JDEPTH = _tree_arrays(T.MV_JOINT_TREE)
_CLTREE, _CLDEPTH = _tree_arrays(T.MV_CLASS_TREE)
_FPTREE, _FPDEPTH = _tree_arrays(T.MV_FP_TREE)
_SZGROUP = np.asarray([3, 3, 3, 3, 2, 2, 2, 1, 1, 1, 0, 0, 0], np.int32)
_FLUT = np.asarray(T.FILTER_LUT, np.int32)

# find_ref_mvs candidate schedule (vp9mvs.c:37-234): a fixed slot list
# walked by one rolled fori_loop per scan. kinds: 0=direct sub-block
# mv, 1=above-ctx mv, 2=left-ctx mv, 3=spatial same-ref neighbor,
# 4=temporal same-ref, 5/6=spatial different-ref (first/second mv of
# the neighbor), 7/8=temporal different-ref (first/second mv).
_SLOT_KIND = np.asarray(
    [0, 0, 0, 1, 2] + [3] * 8 + [4]
    + [v for i in range(8) for v in (5, 6)] + [7, 8], np.int32)
_SLOT_PAR = np.asarray(
    [2, 1, 0, 0, 0] + list(range(8)) + [0]
    + [i for i in range(8) for _ in (0, 1)] + [0, 0], np.int32)
_NSLOTS = len(_SLOT_KIND)


def _mv_ref_blk_off():
    from ..codecs.vp9.mvs import MV_REF_BLK_OFF
    return np.asarray(MV_REF_BLK_OFF, np.int32)   # [13][8][(col,row)]

_CAT6_8 = [254, 254, 254, 252, 249, 243, 230, 196, 177, 153,
           140, 133, 130, 129]
_CAT6 = {8: _CAT6_8, 10: [255, 255] + _CAT6_8,
         12: [255, 255, 255, 255] + _CAT6_8}
_CAT_PROBS = [[], [159], [165, 145], [173, 148, 140],
              [176, 155, 140, 135], [180, 157, 141, 134, 130]]
_CAT_BASE = np.asarray([0, 5, 7, 11, 19, 35, 67], np.int32)
_CAT_NBITS = {b: np.asarray([0, 1, 2, 3, 4, 5, len(_CAT6[b])],
                            np.int32) for b in (8, 10, 12)}


def _cat_table(bpp):
    """[7, K] per-class extra-bit prob ladders (row 0 unused)."""
    rows = _CAT_PROBS + [_CAT6[bpp]]
    K = len(_CAT6[bpp])
    out = np.zeros((7, K), np.int32)
    for i, r in enumerate(rows):
        out[i, :len(r)] = r
    return out


# ---------------------------------------------------------------------------
# vectorized bool decoder (jnp; 16-bit refill, resumable state)


def _rac_get_prob(st, half16, prob, mask):
    """st: (value, rng, bitbuf, nbits, pos) [S] int32 each. prob [S]
    or scalar. Returns (st', bit [S])."""
    value, rng, bitbuf, nbits, pos = st
    S = value.shape[0]
    need = mask & (nbits < 8)
    safe = jnp.clip(pos, 0, half16.shape[1] - 1)
    hw = jnp.take_along_axis(half16, safe[:, None], axis=1)[:, 0]
    hw = jnp.where(pos < half16.shape[1], hw, 0)
    bitbuf = jnp.where(need, (bitbuf << 16) | hw, bitbuf)
    nbits = jnp.where(need, nbits + 16, nbits)
    pos = jnp.where(need, pos + 1, pos)
    prob = jnp.broadcast_to(jnp.asarray(prob, jnp.int32), (S,))
    split = 1 + (((rng - 1) * prob) >> 8)
    bit = jnp.where(mask, (value >= split).astype(jnp.int32), 0)
    value = jnp.where(mask & (bit == 1), value - split, value)
    rng = jnp.where(mask, jnp.where(bit == 1, rng - split, split), rng)
    sh = ((rng < 128).astype(jnp.int32) + (rng < 64) + (rng < 32)
          + (rng < 16) + (rng < 8) + (rng < 4) + (rng < 2))
    sh = jnp.where(mask, sh, 0)
    take = (bitbuf >> (nbits - sh)) & ((1 << sh) - 1)
    value = (value << sh) | take
    rng = rng << sh
    nbits = nbits - sh
    return (value, rng, bitbuf, nbits, pos), bit


def _rac_tree(st, half16, tree, depth, probs, mask):
    """tree [N,2] const; probs [S, N] per-lane node probs. Returns
    (st', value [S]). Rolled as a fori_loop — the mega while-body
    this runs inside is compile-time-bound by op count, so unrolled
    ladders are poison (measured: XLA CPU needs >30 min on the
    unrolled form, minutes on the rolled one)."""
    S = probs.shape[0]
    lane = jnp.arange(S)
    tr = jnp.asarray(tree)

    def body(_, carry):
        st, node, leaf, val = carry
        act = mask & ~leaf
        p = probs[lane, jnp.clip(node, 0, probs.shape[1] - 1)]
        st, b = _rac_get_prob(st, half16, p, act)
        nxt = tr[jnp.clip(node, 0, tr.shape[0] - 1), b]
        hit = act & (nxt <= 0)
        val = jnp.where(hit, -nxt, val)
        leaf = leaf | hit
        node = jnp.where(act & ~hit, nxt, node)
        return (st, node, leaf, val)

    carry = (st, jnp.zeros((S,), jnp.int32), ~mask,
             jnp.zeros((S,), jnp.int32))
    st, _n, _l, val = jax.lax.fori_loop(0, depth, body, carry)
    return st, val


def _rac_bits(st, half16, probrow, nbits, mask):
    """Decode up to `probrow.shape[-1]` MSB-first bits per lane with
    per-position probs (probrow [S, K] int32); lane s decodes
    nbits[s] of them. Returns (st', value [S])."""
    S = probrow.shape[0]
    lane = jnp.arange(S)
    K = probrow.shape[1]

    def body(k, carry):
        st, val = carry
        act = mask & (k < nbits)
        p = probrow[lane, jnp.clip(k, 0, K - 1)]
        st, b = _rac_get_prob(st, half16, p, act)
        val = jnp.where(act, (val << 1) | b, val)
        return (st, val)

    st, val = jax.lax.fori_loop(0, K, body,
                                (st, jnp.zeros((S,), jnp.int32)))
    return st, val


def _read_mv_comp(rac, half16, aux, st, lane, act, comp, hp,
                  want_counts, big, S):
    """One MV component (vp9mvs.c:236-289) for all lanes in `act`.
    `comp` is 0 (row/vertical) or 1 (col/horizontal) — a trace-time
    constant, matching the two fixed call sites of fill_mv. Returns
    (rac, signed delta [S], st)."""
    rac, sign = _rac_get_prob(rac, half16,
                              jnp.asarray(aux["mvsignp"])[comp], act)
    clp = jnp.broadcast_to(jnp.asarray(aux["mvclassesp"])[comp][None],
                           (S, 10))
    rac, cl = _rac_tree(rac, half16, _CLTREE, _CLDEPTH, clp, act)
    if want_counts:
        si = jnp.where(act, CNT_OFF["mv_sign"] + comp * 2 + sign, big)
        st["cnts"] = st["cnts"].at[lane, si].add(1, mode="drop")
        ci = jnp.where(act, CNT_OFF["mv_classes"] + comp * 11
                       + jnp.clip(cl, 0, 10), big)
        st["cnts"] = st["cnts"].at[lane, ci].add(1, mode="drop")
    m_cl = act & (cl > 0)
    bits_p = jnp.asarray(aux["mvbitsp"])[comp]

    def bit_body(m, carry):
        rac, n, cnts = carry
        a = m_cl & (m < cl)
        rac, bit = _rac_get_prob(rac, half16,
                                 bits_p[jnp.clip(m, 0, 9)], a)
        n = jnp.where(a, n | (bit << m), n)
        if want_counts:
            bi = jnp.where(a, CNT_OFF["mv_bits"] + comp * 20
                           + jnp.clip(m, 0, 9) * 2 + bit, big)
            cnts = cnts.at[lane, bi].add(1, mode="drop")
        return (rac, n, cnts)

    rac, n, cnts = jax.lax.fori_loop(
        0, 10, bit_body,
        (rac, jnp.zeros((S,), jnp.int32), st["cnts"]))
    st["cnts"] = cnts
    n = n << 3
    fp_p = jnp.broadcast_to(jnp.asarray(aux["mvfpp"])[comp][None],
                            (S, 3))
    rac, fpv = _rac_tree(rac, half16, _FPTREE, _FPDEPTH, fp_p, m_cl)
    n = jnp.where(m_cl, n | (fpv << 1), n)
    m_hp = m_cl & hp
    rac, hpb = _rac_get_prob(rac, half16,
                             jnp.asarray(aux["mvhpp"])[comp], m_hp)
    n = jnp.where(m_hp, n | hpb, jnp.where(m_cl, n | 1, n))
    if want_counts:
        fpi = jnp.where(m_cl, CNT_OFF["mv_fp"] + comp * 4
                        + jnp.clip(fpv, 0, 3), big)
        st["cnts"] = st["cnts"].at[lane, fpi].add(1, mode="drop")
        # hp bit counted even when not coded (libvpx bug,
        # vp9mvs.c:263-266)
        hpi = jnp.where(m_hp, CNT_OFF["mv_hp"] + comp * 2 + hpb,
                        jnp.where(m_cl,
                                  CNT_OFF["mv_hp"] + comp * 2 + 1,
                                  big))
        st["cnts"] = st["cnts"].at[lane, hpi].add(1, mode="drop")
    n = jnp.where(m_cl, n + (8 << jnp.clip(cl, 0, 10)), n)
    # class 0 (vp9mvs.c:270-283)
    m_c0 = act & (cl == 0)
    rac, n0 = _rac_get_prob(rac, half16,
                            jnp.asarray(aux["mvclass0p"])[comp], m_c0)
    c0fp = jnp.asarray(aux["mvc0fpp"])[comp][jnp.clip(n0, 0, 1)]
    rac, fp0 = _rac_tree(rac, half16, _FPTREE, _FPDEPTH, c0fp, m_c0)
    nn0 = (n0 << 3) | (fp0 << 1)
    m_hp0 = m_c0 & hp
    rac, hp0 = _rac_get_prob(rac, half16,
                             jnp.asarray(aux["mvc0hpp"])[comp], m_hp0)
    nn0 = jnp.where(m_hp0, nn0 | hp0, nn0 | 1)
    if want_counts:
        c0i = jnp.where(m_c0, CNT_OFF["mv_class0"] + comp * 2 + n0,
                        big)
        st["cnts"] = st["cnts"].at[lane, c0i].add(1, mode="drop")
        c0f = jnp.where(m_c0, CNT_OFF["mv_class0_fp"] + comp * 8
                        + jnp.clip(n0, 0, 1) * 4 + jnp.clip(fp0, 0, 3),
                        big)
        st["cnts"] = st["cnts"].at[lane, c0f].add(1, mode="drop")
        c0h = jnp.where(m_hp0,
                        CNT_OFF["mv_class0_hp"] + comp * 2 + hp0,
                        jnp.where(m_c0,
                                  CNT_OFF["mv_class0_hp"] + comp * 2
                                  + 1, big))
        st["cnts"] = st["cnts"].at[lane, c0h].add(1, mode="drop")
    n = jnp.where(m_c0, nn0, n)
    ret = jnp.where(sign == 1, -(n + 1), n + 1)
    return rac, ret, st


# ---------------------------------------------------------------------------
# host-side preparation


def prep_keyframe(dec, data):
    """Host prep AFTER parse of the headers (the decoder `dec` must
    have header/probs/coef11/geometry set for this frame, i.e. be
    mid-decode_pass_a or just after): extract the per-tile bool
    streams and every probability table the device walk needs.
    Returns (inputs dict, meta) for decode_keyframe_device."""
    from ..codecs.vp9.rac import BoolDecoder
    from .rac_pallas import pack_windows, snapshot_to_state
    h = dec.header
    assert h.keyframe or h.intraonly
    return _prep_common(dec, data, BoolDecoder, pack_windows,
                        snapshot_to_state)


def prep_inter(dec, data):
    """Host prep for a NON-intra frame: everything prep_keyframe packs
    plus the inter-frame probability set, the previous frame's MV/ref/
    segmentation grids, and the header scalars the inter syntax reads
    (comp-pred mode, ref sign biases, interp filter mode, hp flag —
    vp9block.c:331-802, vp9mvs.c)."""
    from ..codecs.vp9.rac import BoolDecoder
    from .rac_pallas import pack_windows, snapshot_to_state
    h = dec.header
    assert not (h.keyframe or h.intraonly)
    inputs, meta = _prep_common(dec, data, BoolDecoder, pack_windows,
                                snapshot_to_state)
    p = dec.probs
    rows, cols = dec.rows, dec.cols
    gmax = 1024
    while gmax < rows * cols:
        gmax *= 2
    prev_mv = np.zeros((gmax, 2, 2), np.int32)
    prev_ref = np.full((gmax, 2), -1, np.int32)
    prev_seg = np.zeros(gmax, np.int32)
    use_prev = int(h.use_last_frame_mvs and dec.prev_mv is not None)
    if use_prev:
        prev_mv[:rows * cols] = np.asarray(
            dec.prev_mv[:rows, :cols], np.int32).reshape(-1, 2, 2)
        prev_ref[:rows * cols] = np.asarray(
            dec.prev_ref[:rows, :cols], np.int32).reshape(-1, 2)
    have_prevseg = int(not h.errorres and dec.prev_segmap is not None)
    if have_prevseg:
        prev_seg[:rows * cols] = np.asarray(
            dec.prev_segmap[:rows, :cols], np.int32).reshape(-1)
    segf = h.seg_feat
    refseg_en = np.zeros(8, np.int32)
    refseg_val = np.zeros(8, np.int32)
    for sid in range(8):
        refseg_en[sid] = int(h.seg_enabled and segf[sid].ref_enabled)
        refseg_val[sid] = int(segf[sid].ref_val)
    # traced header scalars (data operands only, so one executable
    # serves every combination)
    hflags = np.asarray([
        int(h.seg_enabled), int(h.seg_update_map), int(h.seg_temporal),
        have_prevseg, int(h.comppredmode), int(h.fixcompref),
        int(h.varcompref[0]), int(h.varcompref[1]),
        int(h.signbias[0]), int(h.signbias[1]), int(h.signbias[2]),
        int(h.filtermode), int(h.highprecisionmvs), use_prev,
    ], np.int32)
    coef11_full = np.asarray(dec.coef11, np.int32) \
        .reshape(4, 2, 2, 6, 6, 11).reshape(16, 36, 11)
    inputs["aux"] = dict(
        coef11i=coef11_full,
        prev_mv=prev_mv, prev_ref=prev_ref, prev_seg=prev_seg,
        hflags=hflags,
        refseg_en=refseg_en, refseg_val=refseg_val,
        segpredp=np.asarray(h.seg_pred_prob, np.int32),
        partp=np.asarray(p.partition, np.int32),
        intrap=np.asarray(p.intra, np.int32),
        compp=np.asarray(p.comp, np.int32),
        comprefp=np.asarray(p.comp_ref, np.int32),
        singlerefp=np.asarray(p.single_ref, np.int32),
        ymodep=np.asarray(p.y_mode, np.int32),
        uvmodep=np.asarray(p.uv_mode, np.int32),
        mvmodep=np.asarray(p.mv_mode, np.int32),
        filterp=np.asarray(p.filter, np.int32),
        mvjointp=np.asarray(p.mv_joint, np.int32),
        mvsignp=np.asarray(p.mv_sign, np.int32),
        mvclassesp=np.asarray(p.mv_classes, np.int32),
        mvclass0p=np.asarray(p.mv_class0, np.int32),
        mvbitsp=np.asarray(p.mv_bits, np.int32),
        mvc0fpp=np.asarray(p.mv_class0_fp, np.int32),
        mvfpp=np.asarray(p.mv_fp, np.int32),
        mvc0hpp=np.asarray(p.mv_class0_hp, np.int32),
        mvhpp=np.asarray(p.mv_hp, np.int32),
    )
    meta["inter"] = 1
    meta["gmax"] = gmax
    return inputs, meta


def _prep_common(dec, data, BoolDecoder, pack_windows,
                 snapshot_to_state):
    h = dec.header
    tile_data = data[h.uncompressed_header_size
                     + h.compressed_header_size:]
    size = len(tile_data)
    pos = 0
    lanes = []      # (data, row_start, row_end, col_start, col_end)
    from ..codecs.vp9.decoder import _tile_offset
    for tr in range(h.tile_rows):
        r0, r1 = _tile_offset(tr, h.log2_tile_rows, dec.sb_rows)
        for tc in range(h.tile_cols):
            if tc == h.tile_cols - 1 and tr == h.tile_rows - 1:
                tsz = size - pos
            else:
                tsz = int.from_bytes(tile_data[pos:pos + 4], "big")
                pos += 4
            c0, c1 = _tile_offset(tc, h.log2_tile_cols, dec.sb_cols)
            lanes.append((tile_data[pos:pos + tsz], r0, r1, c0, c1))
            pos += tsz
    S = len(lanes)
    snaps = []
    for d, *_ in lanes:
        bd = BoolDecoder(d)
        if bd.get():
            raise ValueError("marker bit set in tile")
        snaps.append((d, bd.byte_pos, bd.bit_pos, bd.value, bd.range))
    starts = [s[1] + (1 if s[2] else 0) for s in snaps]
    half16 = pack_windows([s[0] for s in snaps], starts)
    value0, rng0, bitbuf0, nbits0 = snapshot_to_state(snaps, starts)

    p = dec.probs
    # coef probs for is_inter=0, flattened rows [8(tx*2+pl), 36, 11]
    coef11 = np.asarray(dec.coef11, np.int32) \
        .reshape(4, 2, 2, 6, 6, 11)[:, :, 0] \
        .reshape(8, 36, 11)
    segf = h.seg_feat
    qmul = np.zeros((8, 4), np.int32)
    skipseg = np.zeros(8, np.int32)
    for sid in range(8):
        qmul[sid] = np.asarray(segf[sid].qmul, np.int32).reshape(4)
        skipseg[sid] = int(h.seg_enabled and segf[sid].skip_enabled)
    inputs = dict(
        half16=half16,
        rac0=np.stack([value0, rng0, bitbuf0, nbits0,
                       np.zeros(S, np.int32)]),
        # b8 units (the _tile_offset values are already b8)
        bounds=np.asarray([[r0, r1, c0, c1]
                           for _d, r0, r1, c0, c1 in lanes], np.int32),
        skipp=np.asarray(p.skip, np.int32),
        tx8p=np.asarray(p.tx8p, np.int32).reshape(2, -1),
        tx16p=np.asarray(p.tx16p, np.int32).reshape(2, -1),
        tx32p=np.asarray(p.tx32p, np.int32).reshape(2, -1),
        coef11=coef11,
        qmul=qmul,
        skipseg=skipseg,
        segprob=np.asarray(
            h.seg_prob if h.seg_enabled and h.seg_update_map
            else [128] * 7, np.int32),
        scans=np.asarray(_scans_i32()[0]),
        nbs=np.asarray(_scans_i32()[1]),
    )
    meta = dict(S=S, rows=dec.rows, cols=dec.cols,
                seg=int(h.seg_enabled and h.seg_update_map),
                txfmmode=int(h.txfmmode), lossless=int(h.lossless),
                bpp=int(h.bpp), ss_h=int(h.ss_h), ss_v=int(h.ss_v),
                sb_cols=dec.sb_cols,
                # backward adaptation consumes symbol counts
                # (vp9.c:1821-1824); emit them only when it will run
                want_counts=int(h.refreshctx and not h.parallelmode))
    return inputs, meta


_SC_CACHE = None


def _scans_i32():
    global _SC_CACHE
    if _SC_CACHE is None:
        from ..passa_native import _padded_scans
        sc, nb = _padded_scans()
        _SC_CACHE = (np.asarray(sc, np.int32).reshape(20, 1024),
                     np.asarray(nb, np.int32).reshape(20, 1024, 2))
    return _SC_CACHE


# ---------------------------------------------------------------------------
# the device walk


def decode_keyframe_device(inputs, meta, bmax=None, cmax=None,
                           emax=None):
    """Run the full pass A on device (keyframe/intra-only inputs from
    prep_keyframe; inter frames from prep_inter — meta["inter"]
    selects the executable). Returns numpy outputs:
    (blocks [S, bmax, 12], nblk [S], cpairs [S, cmax, 2], ncp [S],
    epairs [S, emax, 2], nep [S], counts [S, CNT_TOTAL], err [S]).

    blocks rows: (row, col, bs, seg, skip, tx, m0, m1, m2, m3, uvmode,
    uvtx). cpairs: (flat plane pos with plane base, value). epairs:
    (flat eob-grid pos with plane base, count). counts: per-lane
    flattened symbol counts (coef at CNT_COEF, eob at CNT_EOB; all
    zeros unless meta['want_counts'])."""
    S = meta["S"]
    rows, cols = meta["rows"], meta["cols"]
    ss_hv = meta["ss_h"] + meta["ss_v"]
    inter = meta.get("inter", 0)
    gmax = meta.get("gmax", 1)
    aux = None
    if inter:
        aux = {kk: jnp.asarray(vv)
               for kk, vv in inputs["aux"].items()}
    if bmax is None:
        bmax = rows * cols + 64
    if cmax is None:
        cmax = rows * cols * 16 * 24 + 1024
    if emax is None:
        # tx4-dense bound: 4 luma cells per b8 plus 2 chroma planes of
        # 4 >> (ss_h+ss_v) cells each (4:2:0 -> 6, 4:2:2/4:4:0 -> 8,
        # 4:4:4 -> 12 cells per b8)
        emax = rows * cols * (4 + 2 * (4 >> ss_hv)) + 256
    def bucket(n, base=256):
        b = base
        while b < n:
            b *= 2
        return b
    bmax = bucket(bmax)
    cmax = bucket(cmax, 4096)
    emax = bucket(emax, 1024)
    # ctx-array width: bucketed so common frame sizes share one
    # executable (geometry stays dynamic); wider frames get their own
    maxc = MAXC
    while maxc < cols:
        maxc *= 2
    Lh = bucket(inputs["half16"].shape[1], 512)
    h16 = np.zeros((meta["S"], Lh), np.int32)
    h16[:, :inputs["half16"].shape[1]] = inputs["half16"]
    out = _decode_jit(
        jnp.asarray(h16), jnp.asarray(inputs["rac0"]),
        jnp.asarray(inputs["bounds"]), jnp.asarray(inputs["skipp"]),
        jnp.asarray(inputs["tx8p"]), jnp.asarray(inputs["tx16p"]),
        jnp.asarray(inputs["tx32p"]), jnp.asarray(inputs["coef11"]),
        jnp.asarray(inputs["qmul"]), jnp.asarray(inputs["skipseg"]),
        jnp.asarray(inputs["segprob"]), jnp.asarray(inputs["scans"]),
        jnp.asarray(inputs["nbs"]),
        jnp.int32(rows), jnp.int32(cols), jnp.int32(meta["sb_cols"]),
        jnp.int32(meta["txfmmode"]),
        seg=meta["seg"],
        lossless=meta["lossless"],
        bpp=meta["bpp"], ss_h=meta["ss_h"], ss_v=meta["ss_v"],
        bmax=bmax, cmax=cmax, emax=emax, maxc=maxc,
        want_counts=meta.get("want_counts", 0),
        inter=inter, gmax=gmax, aux=aux)
    return [np.asarray(o) for o in out]


decode_frame_device = decode_keyframe_device   # handles both kinds


MAXC = 264        # base ctx-array width bucket (b8 cols); doubled as
                  # needed per frame geometry (static arg `maxc`)

# flattened per-lane symbol-count layout mirroring codecs/vp9/counts.py
# (the full vp9prob.c count taxonomy); merged across lanes on the host
# (the vp9.c:1816-1819 tile merge)
_CNT_SPEC = [
    ("y_mode", (4, 10)), ("uv_mode", (10, 10)), ("filter", (4, 3)),
    ("mv_mode", (7, 4)), ("intra", (4, 2)), ("comp", (5, 2)),
    ("single_ref", (5, 2, 2)), ("comp_ref", (5, 2)),
    ("tx32p", (2, 4)), ("tx16p", (2, 3)), ("tx8p", (2, 2)),
    ("skip", (3, 2)), ("mv_joint", (4,)), ("partition", (4, 4, 4)),
    ("coef", (4, 2, 2, 6, 6, 3)), ("eob", (4, 2, 2, 6, 6, 2)),
    ("mv_sign", (2, 2)), ("mv_classes", (2, 11)),
    ("mv_class0", (2, 2)), ("mv_bits", (2, 10, 2)),
    ("mv_class0_fp", (2, 2, 4)), ("mv_fp", (2, 4)),
    ("mv_class0_hp", (2, 2)), ("mv_hp", (2, 2)),
]
CNT_OFF = {}
_o = 0
for _n, _sh in _CNT_SPEC:
    CNT_OFF[_n] = _o
    _o += int(np.prod(_sh))
CNT_TOTAL = _o
CNT_COEF = CNT_OFF["coef"]
CNT_EOB = CNT_OFF["eob"]


def counts_from_device(cnt_lanes, out):
    """Sum per-lane device counts into a Counts object (in place)."""
    tot = np.asarray(cnt_lanes, np.int64).sum(axis=0)
    for n, sh in _CNT_SPEC:
        o = CNT_OFF[n]
        getattr(out, n)[...] = tot[o:o + int(np.prod(sh))].reshape(sh)
    return out


@partial(jax.jit, static_argnames=("seg",
                                   "lossless", "bpp", "ss_h", "ss_v",
                                   "bmax", "cmax", "emax", "maxc",
                                   "want_counts", "inter", "gmax"))
def _decode_jit(half16, rac0, bounds, skipp, tx8p, tx16p, tx32p,
                coef11, qmul, skipseg, segprob, scans, nbs,
                rows, cols, sb_cols,
                txfmmode,
                seg, lossless, bpp, ss_h, ss_v,
                bmax, cmax, emax, maxc=MAXC, want_counts=0,
                inter=0, gmax=1, aux=None):
    S = bounds.shape[0]
    lane = jnp.arange(S)
    big = jnp.int32(1 << 20)
    if inter:
        hf = aux["hflags"]
        seg_en, seg_upd, seg_tmp, have_pseg = hf[0], hf[1], hf[2], hf[3]
        comppredmode, fixref = hf[4], hf[5]
        varref0, varref1 = hf[6], hf[7]
        sbias = hf[8:11]
        filtermode, highprec, use_prev = hf[11], hf[12], hf[13]
        ptab = jnp.asarray(_mv_ref_blk_off())
        from ..codecs.vp9.blockdec import INTER_MODE_CTX_LUT
        imctx_t = jnp.asarray(np.asarray(INTER_MODE_CTX_LUT, np.int32))
        flut_t = jnp.asarray(_FLUT)
        szg_t = jnp.asarray(_SZGROUP)
        kinds_t = jnp.asarray(_SLOT_KIND)
        pars_t = jnp.asarray(_SLOT_PAR)
    W64 = sb_cols * 64
    W64uv = W64 >> ss_h
    c16 = sb_cols * 16
    c16uv = c16 >> ss_h
    # plane flat sizes: Y = H64*W64; U/V = chroma dims
    H64 = ((rows * 8) + 63) // 64 * 64
    ysz = H64 * W64
    usz = (H64 >> ss_v) * W64uv
    eysz = (H64 // 4) * c16
    eusz = ((H64 >> ss_v) // 4) * c16uv

    kf_part = jnp.asarray(
        np.asarray(T.DEFAULT_KF_PARTITION_PROBS, np.int32))  # [4,4,3]
    kf_ym = jnp.asarray(
        np.asarray(T.DEFAULT_KF_YMODE_PROBS, np.int32))      # [10,10,9]
    kf_uvm = jnp.asarray(
        np.asarray(T.DEFAULT_KF_UVMODE_PROBS, np.int32))     # [10,9]
    bwh = jnp.asarray(_BWH)
    maxtx_t = jnp.asarray(_MAXTX)
    actx_t = jnp.asarray(_ACTX)
    lctx_t = jnp.asarray(_LCTX)
    itx_t = jnp.asarray(_ITX)
    bands_t = jnp.asarray(_BANDS)


    r0l, r1l, c0l, c1l = (bounds[:, i] for i in range(4))

    state = dict(
        rac=tuple(rac0[i] for i in range(5)),
        phase=jnp.full((S,), PART, jnp.int32),
        # SB iterator (b8 coords)
        sb_r=r0l, sb_c=c0l,
        # partition stack
        sp=jnp.zeros((S,), jnp.int32),
        stk_bl=jnp.zeros((S, 4), jnp.int32),
        stk_r=jnp.zeros((S, 4), jnp.int32),
        stk_c=jnp.zeros((S, 4), jnp.int32),
        stk_bp=jnp.full((S, 4), -1, jnp.int32),
        stk_em=jnp.zeros((S, 4), jnp.int32),
        # current block
        b_r=jnp.zeros((S,), jnp.int32), b_c=jnp.zeros((S,), jnp.int32),
        b_bs=jnp.zeros((S,), jnp.int32),
        b_seg=jnp.zeros((S,), jnp.int32),
        b_skip=jnp.zeros((S,), jnp.int32),
        b_tx=jnp.zeros((S,), jnp.int32),
        b_uvtx=jnp.zeros((S,), jnp.int32),
        b_modes=jnp.zeros((S, 4), jnp.int32),
        b_uvmode=jnp.zeros((S,), jnp.int32),
        # above ctx (frame-absolute col indexing, per lane); mode ctx
        # init: DC_PRED for intra frames, NEARESTMV for inter frames
        # (vp9.c:1720-1730, reset_left in decode_tiles)
        a_part=jnp.zeros((S, maxc + 8), jnp.int32),
        a_skip=jnp.zeros((S, maxc + 8), jnp.int32),
        a_txfm=jnp.zeros((S, maxc + 8), jnp.int32),
        a_mode=jnp.full((S, 2 * maxc + 16), 10 if inter else 2,
                        jnp.int32),
        a_ynnz=jnp.zeros((S, 2 * maxc + 16), jnp.int32),
        a_unnz=jnp.zeros((S, 2, 2 * maxc + 16), jnp.int32),
        # left ctx (per SB row)
        l_part=jnp.zeros((S, 8), jnp.int32),
        l_skip=jnp.zeros((S, 8), jnp.int32),
        l_txfm=jnp.zeros((S, 8), jnp.int32),
        l_mode=jnp.full((S, 16), 10 if inter else 2, jnp.int32),
        l_ynnz=jnp.zeros((S, 16), jnp.int32),
        l_unnz=jnp.zeros((S, 2, 16), jnp.int32),
        # coef walk
        c_pl=jnp.zeros((S,), jnp.int32),    # 0=y, 1=u, 2=v
        c_x=jnp.zeros((S,), jnp.int32),     # 4px units within block
        c_y=jnp.zeros((S,), jnp.int32),
        c_init=jnp.zeros((S,), jnp.int32),  # 1 = need tx-block init
        c_i=jnp.zeros((S,), jnp.int32),
        c_nnz=jnp.zeros((S,), jnp.int32),
        c_skipeob=jnp.zeros((S,), jnp.int32),
        c_done=jnp.zeros((S,), jnp.int32),  # current tx blk finished
        c_count=jnp.zeros((S,), jnp.int32),
        c_modeidx=jnp.zeros((S,), jnp.int32),  # running 4x4 counter n
        cache=jnp.zeros((S, 1024), jnp.int32),
        # outputs — records in the native 34-column layout
        # (passa_native.LazyBlocks): row, col, tile_col_start, bs,
        # seg, skip, intra, tx, uvtx, mode[4], uvmode, comp, ref[2],
        # filter, mv[4][2][2]
        blocks=jnp.zeros((S, bmax, 34), jnp.int32),
        nblk=jnp.zeros((S,), jnp.int32),
        cpairs=jnp.zeros((S, cmax, 2), jnp.int32),
        ncp=jnp.zeros((S,), jnp.int32),
        epairs=jnp.zeros((S, emax, 2), jnp.int32),
        nep=jnp.zeros((S,), jnp.int32),
        # per-lane flat symbol counts (1-element dummy when the frame
        # does no backward adaptation, keeping that executable lean)
        cnts=jnp.zeros((S, CNT_TOTAL if want_counts else 1), jnp.int32),
        err=jnp.zeros((S,), jnp.int32),
    )
    if inter:
        state.update(
            # non-intra-frame above/left ctx (vp9dec.h VP9Context /
            # VP9TileData ctx arrays; splat layout 1 entry per b8)
            a_intra=jnp.zeros((S, maxc + 8), jnp.int32),
            a_comp=jnp.zeros((S, maxc + 8), jnp.int32),
            a_ref=jnp.zeros((S, maxc + 8), jnp.int32),
            a_filter=jnp.zeros((S, maxc + 8), jnp.int32),
            a_segpred=jnp.zeros((S, maxc + 8), jnp.int32),
            l_intra=jnp.zeros((S, 8), jnp.int32),
            l_comp=jnp.zeros((S, 8), jnp.int32),
            l_ref=jnp.zeros((S, 8), jnp.int32),
            l_filter=jnp.zeros((S, 8), jnp.int32),
            l_segpred=jnp.zeros((S, 8), jnp.int32),
            # MV prediction ctx (above_mv_ctx / left_mv_ctx: 2 slots
            # per b8, 2 refs, 2 components)
            a_mv=jnp.zeros((S, 2 * maxc + 16, 2, 2), jnp.int32),
            l_mv=jnp.zeros((S, 16, 2, 2), jnp.int32),
            # decode-order frame MV/ref grids (VP9mvrefPair per b8;
            # shared across lanes — tile columns write disjoint cells)
            g_mv=jnp.zeros((gmax, 2, 2), jnp.int32),
            g_ref=jnp.full((gmax, 2), -1, jnp.int32),
            # current block inter fields
            b_intra=jnp.zeros((S,), jnp.int32),
            b_comp=jnp.zeros((S,), jnp.int32),
            b_ref=jnp.zeros((S, 2), jnp.int32),
            b_filter=jnp.zeros((S,), jnp.int32),
            b_filterid=jnp.zeros((S,), jnp.int32),
            b_modectx=jnp.zeros((S,), jnp.int32),
            b_mv=jnp.zeros((S, 4, 2, 2), jnp.int32),
            b_anycoef=jnp.zeros((S,), jnp.int32),
            # MV phase iterator: sub-block slot and ref index
            mv_k=jnp.zeros((S,), jnp.int32),
            mv_z=jnp.zeros((S,), jnp.int32),
        )

    def setrow(arr, base, vals, nvalid, mask):
        """arr[lane, base:base+len(vals)] = vals (masked, bounded)."""
        k = vals.shape[1]
        idx = base[:, None] + jnp.arange(k)[None, :]
        idx = jnp.where(mask[:, None] & (jnp.arange(k)[None, :]
                                         < nvalid[:, None]), idx, big)
        return arr.at[lane[:, None], idx].set(vals, mode="drop")

    def splat1(arr, base, val, n, mask, width=8):
        """arr[lane, base:base+n] = val (n <= width)."""
        idx = base[:, None] + jnp.arange(width)[None, :]
        idx = jnp.where(mask[:, None]
                        & (jnp.arange(width)[None, :] < n[:, None]),
                        idx, big)
        v = jnp.broadcast_to(val[:, None], (S, width))
        return arr.at[lane[:, None], idx].set(v, mode="drop")

    def getcol(arr, idx):
        return jnp.take_along_axis(
            arr, jnp.clip(idx, 0, arr.shape[1] - 1)[:, None],
            axis=1)[:, 0]

    def body(st):
        rac = st["rac"]
        phase = st["phase"]

        # ============ PART quantum ============
        mp = phase == PART
        sp = st["sp"]
        # empty stack -> push the current SB as a root node (or DONE)
        tile_done = (st["sb_r"] >= r1l)
        need_push = mp & (sp == 0) & ~tile_done
        st["phase"] = jnp.where(mp & (sp == 0) & tile_done, DONE,
                                st["phase"])
        phase = st["phase"]
        stk_bl, stk_r, stk_c = st["stk_bl"], st["stk_r"], st["stk_c"]
        stk_bp, stk_em = st["stk_bp"], st["stk_em"]
        z0 = jnp.zeros((S,), jnp.int32)
        stk_bl = setrow(stk_bl, z0, z0[:, None], z0 + 1, need_push)
        stk_r = setrow(stk_r, z0, st["sb_r"][:, None], z0 + 1,
                       need_push)
        stk_c = setrow(stk_c, z0, st["sb_c"][:, None], z0 + 1,
                       need_push)
        stk_bp = setrow(stk_bp, z0, (z0 - 1)[:, None], z0 + 1,
                        need_push)
        stk_em = setrow(stk_em, z0, z0[:, None], z0 + 1, need_push)
        sp = jnp.where(need_push, 1, sp)

        mp = (phase == PART) & (sp > 0)
        top = sp - 1
        t_bl = getcol(stk_bl, top)
        t_r = getcol(stk_r, top)
        t_c = getcol(stk_c, top)
        t_bp = getcol(stk_bp, top)
        t_em = getcol(stk_em, top)
        hbs = 4 >> t_bl

        # --- decode the partition symbol where needed ---
        need_sym = mp & (t_bp < 0)
        a_bit = (getcol(st["a_part"], t_c) >> (3 - t_bl)) & 1
        l_bit = (getcol(st["l_part"], t_r & 7) >> (3 - t_bl)) & 1
        pctx = a_bit | (l_bit << 1)
        if inter:
            pp = jnp.asarray(aux["partp"])[jnp.clip(t_bl, 0, 3), pctx]
        else:
            pp = kf_part[jnp.clip(t_bl, 0, 3), pctx]   # [S, 3]
        col_in = (t_c + hbs) < cols
        row_in = (t_r + hbs) < rows
        leaf8 = t_bl == 3
        full_tree = need_sym & (leaf8 | (col_in & row_in))
        # full partition tree
        ptree_probs = pp
        rac, bp_tree = _rac_tree(rac, half16, _PTREE, _PDEPTH,
                                 ptree_probs, full_tree)
        # edge cases: single bit against pp[1] (H/SPLIT) or pp[2]
        # (V/SPLIT); both-out: forced SPLIT
        m_h = need_sym & ~leaf8 & col_in & ~row_in
        rac, b_h = _rac_get_prob(rac, half16, pp[:, 1], m_h)
        m_v = need_sym & ~leaf8 & ~col_in & row_in
        rac, b_v = _rac_get_prob(rac, half16, pp[:, 2], m_v)
        m_f = need_sym & ~leaf8 & ~col_in & ~row_in
        bp_new = jnp.where(full_tree, bp_tree,
                           jnp.where(m_h, jnp.where(b_h == 1, 3, 1),
                                     jnp.where(m_v,
                                               jnp.where(b_v == 1, 3, 2),
                                               3)))
        stk_bp = setrow(stk_bp, top, bp_new[:, None], z0 + 1, need_sym)
        t_bp = jnp.where(need_sym, bp_new, t_bp)
        if want_counts:
            # one partition count per decode_sb node, incl. edge-forced
            # symbols (host counts at the end of every decode_sb call)
            p_idx = jnp.where(
                need_sym,
                CNT_OFF["partition"]
                + (jnp.clip(t_bl, 0, 3) * 4 + pctx) * 4 + bp_new, big)
            st["cnts"] = st["cnts"].at[lane, p_idx].add(1, mode="drop")

        # --- emit next child/leaf for nodes with a decoded symbol ---
        m_emit = mp & (t_bp >= 0)
        # children/blocks list per (bp, edges):
        #   NONE -> 1 block (this bl, bp as coded)
        #   H    -> block(r,c); block(r+hbs,c) if row_in
        #   V    -> block(r,c); block(r,c+hbs) if col_in
        #   SPLIT-> subnodes (r,c),(r,c+hbs),(r+hbs,c),(r+hbs,c+hbs)
        #           filtered by edges; at bl==3 bp==SPLIT is the
        #           sub8x8 4x4 block itself (bs = 3*3+3)
        is_split = (t_bp == 3) & ~leaf8
        n_items = jnp.where(
            is_split,
            jnp.where(col_in & row_in, 4,
                      jnp.where(col_in | row_in, 2, 1)),
            jnp.where(leaf8, 1,
                      jnp.where(t_bp == 0, 1,
                                jnp.where(t_bp == 1,
                                          1 + row_in.astype(jnp.int32),
                                          1 + col_in.astype(jnp.int32)))))
        # item offset for child t_em
        # split children in DFS pre-order; filtered by edge validity
        ch_dr = jnp.stack([z0, z0, z0 + 1, z0 + 1], 1)  # [S,4]
        ch_dc = jnp.stack([z0, z0 + 1, z0, z0 + 1], 1)
        # valid mask per child slot
        ch_ok = jnp.stack(
            [jnp.ones((S,), bool),
             col_in, row_in, col_in & row_in], 1)
        # compacted index of the t_em'th valid child
        cum = jnp.cumsum(ch_ok.astype(jnp.int32), axis=1)
        want = (t_em + 1)[:, None]
        pick = jnp.argmax((cum == want) & ch_ok, axis=1)
        ch_r = t_r + jnp.take_along_axis(ch_dr, pick[:, None],
                                         1)[:, 0] * hbs
        ch_c = t_c + jnp.take_along_axis(ch_dc, pick[:, None],
                                         1)[:, 0] * hbs
        # H/V second block offsets
        hv_r = t_r + jnp.where((t_bp == 1) & (t_em == 1), hbs, 0)
        hv_c = t_c + jnp.where((t_bp == 2) & (t_em == 1), hbs, 0)

        # a node whose items are exhausted pops (no emit this
        # quantum); the parent then resumes at a later quantum — this
        # keeps push/pop single-slot (children live above the parent)
        m_pop = m_emit & (t_em >= n_items)
        m_emit = m_emit & ~m_pop
        emit_block = m_emit & ~is_split
        emit_child = m_emit & is_split

        # push child node
        can_push = emit_child
        stk_bl = setrow(stk_bl, sp, (t_bl + 1)[:, None], z0 + 1,
                        can_push)
        stk_r = setrow(stk_r, sp, ch_r[:, None], z0 + 1, can_push)
        stk_c = setrow(stk_c, sp, ch_c[:, None], z0 + 1, can_push)
        stk_bp = setrow(stk_bp, sp, (z0 - 1)[:, None], z0 + 1, can_push)
        stk_em = setrow(stk_em, sp, z0[:, None], z0 + 1, can_push)

        # block setup
        bs_new = jnp.where(leaf8, 9 + t_bp,
                           jnp.where(t_bp == 0, t_bl * 3,
                                     t_bl * 3 + t_bp))
        st["b_r"] = jnp.where(emit_block, hv_r, st["b_r"])
        st["b_c"] = jnp.where(emit_block, hv_c, st["b_c"])
        st["b_bs"] = jnp.where(emit_block, bs_new, st["b_bs"])
        st["phase"] = jnp.where(emit_block, MODE, st["phase"])

        # advance emit counter; pops happen on a later quantum when
        # the node's item list is exhausted
        t_em2 = t_em + 1
        stk_em = setrow(stk_em, top, t_em2[:, None], z0 + 1, m_emit)
        sp = jnp.where(m_pop, sp - 1,
                       jnp.where(emit_child, sp + 1, sp))
        # when the root popped, advance the SB iterator
        root_done = m_pop & (sp == 0)
        nc = st["sb_c"] + 8
        wrap = nc >= c1l
        st["sb_c"] = jnp.where(root_done, jnp.where(wrap, c0l, nc),
                               st["sb_c"])
        st["sb_r"] = jnp.where(root_done & wrap, st["sb_r"] + 8,
                               st["sb_r"])
        # per-SB-row left resets
        st["l_part"] = jnp.where((root_done & wrap)[:, None], 0,
                                 st["l_part"])
        st["l_skip"] = jnp.where((root_done & wrap)[:, None], 0,
                                 st["l_skip"])
        st["l_mode"] = jnp.where((root_done & wrap)[:, None],
                                 10 if inter else 2, st["l_mode"])
        st["l_ynnz"] = jnp.where((root_done & wrap)[:, None], 0,
                                 st["l_ynnz"])
        st["l_unnz"] = jnp.where((root_done & wrap)[:, None, None], 0,
                                 st["l_unnz"])
        if inter:
            st["l_segpred"] = jnp.where((root_done & wrap)[:, None], 0,
                                        st["l_segpred"])

        st["sp"] = sp
        st["stk_bl"], st["stk_r"], st["stk_c"] = stk_bl, stk_r, stk_c
        st["stk_bp"], st["stk_em"] = stk_bp, stk_em

        # ============ MODE quantum ============
        phase = st["phase"]
        # lanes that JUST entered MODE this quantum wait one iteration
        # (their PART writes must land first) — actually all state is
        # already updated above, so process immediately is fine... but
        # emit_block lanes already consumed their PART quantum; giving
        # them MODE in the same iteration would double-charge the
        # quantum. Process MODE only for lanes that entered earlier.
        mm = (phase == MODE) & ~emit_block
        br, bc, bs = st["b_r"], st["b_c"], st["b_bs"]
        row7 = br & 7
        bw4 = bwh[1, jnp.clip(bs, 0, 12), 0]
        bh4 = bwh[1, jnp.clip(bs, 0, 12), 1]
        w4 = jnp.minimum(cols - bc, bw4)
        h4 = jnp.minimum(rows - br, bh4)

        def zero_nnz(stt, mask, bcv, row7v, bw4v, bh4v):
            """SPLAT_ZERO_YUV of a skip block (vp9block.c:1316-)."""
            zt = jnp.zeros((S,), jnp.int32)
            stt["a_ynnz"] = splat1(stt["a_ynnz"], bcv * 2, zt,
                                   bw4v * 2, mask, width=16)
            stt["l_ynnz"] = splat1(stt["l_ynnz"], row7v * 2, zt,
                                   bh4v * 2, mask, width=16)
            au0 = bcv * 2 >> ss_h
            lu0 = row7v * 2 >> ss_v
            for pl in range(2):
                stt["a_unnz"] = stt["a_unnz"].at[:, pl].set(
                    splat1(stt["a_unnz"][:, pl], au0, zt,
                           (bw4v * 2) >> ss_h, mask, width=16))
                stt["l_unnz"] = stt["l_unnz"].at[:, pl].set(
                    splat1(stt["l_unnz"][:, pl], lu0, zt,
                           (bh4v * 2) >> ss_v, mask, width=16))
            return stt

        # --- seg id ---
        # The whole mode bundle runs once per block (vs ~20 COEF
        # quanta), and it is the biggest single chunk of the while
        # body, so it too runs under a real branch.
        _MDW = ["b_seg", "b_skip", "b_tx", "b_uvtx", "b_modes",
                "b_uvmode", "a_skip", "a_txfm", "a_part", "l_skip",
                "l_txfm", "l_part", "a_mode", "l_mode", "a_ynnz",
                "l_ynnz", "a_unnz", "l_unnz", "cnts", "phase",
                "c_pl", "c_x", "c_y", "c_init", "c_modeidx"]
        if inter:
            _MDW += ["b_intra", "b_comp", "b_ref", "b_filter",
                     "b_filterid", "b_modectx", "a_segpred",
                     "l_segpred", "mv_k", "mv_z"]
        st_outer0 = st

        def _mode_section(carry):
            rac, sub = carry
            st = dict(st_outer0)
            st.update(sub)
            if inter:
                # non-intra frame (vp9block.c:101-142): optional temporal
                # prediction of the seg id from the previous frame's map
                spctx = (getcol(st["a_segpred"], bc)
                         + getcol(st["l_segpred"], row7))
                m_pred = mm & (seg_en == 1) & (seg_upd == 1) & (seg_tmp == 1)
                rac, predbit = _rac_get_prob(
                    rac, half16,
                    jnp.asarray(aux["segpredp"])[jnp.clip(spctx, 0, 2)],
                    m_pred)
                use_pred = (seg_en == 1) & ((seg_upd == 0)
                                            | ((seg_tmp == 1)
                                               & (predbit == 1)))
                m_tree = mm & (seg_en == 1) & (seg_upd == 1) \
                    & ~((seg_tmp == 1) & (predbit == 1))
                segp = jnp.broadcast_to(segprob[None, :], (S, 7))
                rac, seg_tree = _rac_tree(rac, half16, _STREE, _SDEPTH,
                                          segp, m_tree)
                # predicted id = min of the previous map over the CLIPPED
                # block area (blockdec.py:261-263)
                w4c8 = jnp.minimum(cols - bc, bwh[1, jnp.clip(bs, 0, 12), 0])
                h4c8 = jnp.minimum(rows - br, bwh[1, jnp.clip(bs, 0, 12), 1])
                kyy = jnp.arange(8)[None, :, None]
                kxx = jnp.arange(8)[None, None, :]
                okg = (kyy < h4c8[:, None, None]) & (kxx < w4c8[:, None, None])
                gseg = (br[:, None, None] + kyy) * cols \
                    + (bc[:, None, None] + kxx)
                pvals = jnp.asarray(aux["prev_seg"])[
                    jnp.clip(gseg, 0, gmax - 1)]
                pred_seg = jnp.min(jnp.where(okg, pvals, 8), axis=(1, 2))
                pred_seg = jnp.where(have_pseg == 1, pred_seg, 0)
                seg_id = jnp.where(use_pred, pred_seg,
                                   jnp.where(m_tree, seg_tree, 0))
                # segpred ctx splat (clipped; only when seg enabled)
                m_spl = mm & (seg_en == 1)
                st["a_segpred"] = splat1(st["a_segpred"], bc,
                                         use_pred.astype(jnp.int32),
                                         w4c8, m_spl)
                st["l_segpred"] = splat1(st["l_segpred"], row7,
                                         use_pred.astype(jnp.int32),
                                         h4c8, m_spl)
            elif seg:
                segp = jnp.broadcast_to(segprob[None, :], (S, 7))
                rac, seg_id = _rac_tree(rac, half16, _STREE, _SDEPTH,
                                        segp, mm)
            else:
                seg_id = z0
            st["b_seg"] = jnp.where(mm, seg_id, st["b_seg"])

            # --- skip ---
            forced_skip = jnp.take(skipseg, jnp.clip(seg_id, 0, 7)) == 1
            sctx = getcol(st["l_skip"], row7) + getcol(st["a_skip"], bc)
            m_skipbit = mm & ~forced_skip
            rac, skipbit = _rac_get_prob(
                rac, half16, jnp.take(skipp, jnp.clip(sctx, 0, 2)),
                m_skipbit)
            b_skip = jnp.where(forced_skip, 1, skipbit)
            st["b_skip"] = jnp.where(mm, b_skip, st["b_skip"])
            if want_counts:
                s_idx = jnp.where(
                    m_skipbit,
                    CNT_OFF["skip"] + jnp.clip(sctx, 0, 2) * 2 + skipbit,
                    big)
                st["cnts"] = st["cnts"].at[lane, s_idx].add(1, mode="drop")

            # --- intra/inter flag (vp9block.c:283-298) ---
            if inter:
                rs_en = jnp.take(jnp.asarray(aux["refseg_en"]),
                                 jnp.clip(seg_id, 0, 7)) == 1
                rs_val = jnp.take(jnp.asarray(aux["refseg_val"]),
                                  jnp.clip(seg_id, 0, 7))
                a_in = getcol(st["a_intra"], bc)
                l_in = getcol(st["l_intra"], row7)
                have_a = br > 0
                have_l = bc > c0l
                ctx_i = jnp.where(
                    have_a & have_l,
                    a_in + l_in + ((a_in + l_in) == 2).astype(jnp.int32),
                    jnp.where(have_a, 2 * a_in,
                              jnp.where(have_l, 2 * l_in, 0)))
                m_ibit = mm & ~rs_en
                rac, ibit = _rac_get_prob(
                    rac, half16,
                    jnp.asarray(aux["intrap"])[jnp.clip(ctx_i, 0, 3)],
                    m_ibit)
                b_intra = jnp.where(rs_en, (rs_val == 0).astype(jnp.int32),
                                    1 - ibit)
                st["b_intra"] = jnp.where(mm, b_intra, st["b_intra"])
                if want_counts:
                    i_idx = jnp.where(
                        m_ibit,
                        CNT_OFF["intra"] + jnp.clip(ctx_i, 0, 3) * 2 + ibit,
                        big)
                    st["cnts"] = st["cnts"].at[lane, i_idx].add(
                        1, mode="drop")
            else:
                b_intra = jnp.ones((S,), jnp.int32)

            # --- tx size ---
            mtx = maxtx_t[jnp.clip(bs, 0, 12)]
            have_a = br > 0
            have_l = bc > c0l
            a_sk = getcol(st["a_skip"], bc)
            l_sk = getcol(st["l_skip"], row7)
            a_t = jnp.where(a_sk == 1, mtx, getcol(st["a_txfm"], bc))
            l_t = jnp.where(l_sk == 1, mtx, getcol(st["l_txfm"], row7))
            txctx = jnp.where(
                have_a & have_l, (a_t + l_t > mtx).astype(jnp.int32),
                jnp.where(have_a,
                          jnp.where(a_sk == 1, 1,
                                    (a_t * 2 > mtx).astype(jnp.int32)),
                          jnp.where(have_l,
                                    jnp.where(l_sk == 1, 1,
                                              (l_t * 2 > mtx)
                                              .astype(jnp.int32)),
                                    1)))
            # tx coded when (intra or !skip) and switchable — keyframes
            # are all-intra, so there it is coded whenever switchable
            sel_tx = mm & (txfmmode == 4)
            if inter:
                sel_tx = sel_tx & ((b_intra == 1) | (b_skip == 0))
            m32 = sel_tx & (mtx == 3)
            p32 = tx32p[jnp.clip(txctx, 0, 1)]
            rac, t0 = _rac_get_prob(rac, half16, p32[:, 0], m32)
            m32b = m32 & (t0 == 1)
            rac, t1 = _rac_get_prob(rac, half16, p32[:, 1], m32b)
            m32c = m32b & (t1 == 1)
            rac, t2 = _rac_get_prob(rac, half16, p32[:, 2], m32c)
            tx_32 = t0 + t1 + t2
            m16 = sel_tx & (mtx == 2)
            p16 = tx16p[jnp.clip(txctx, 0, 1)]
            rac, u0 = _rac_get_prob(rac, half16, p16[:, 0], m16)
            m16b = m16 & (u0 == 1)
            rac, u1 = _rac_get_prob(rac, half16, p16[:, 1], m16b)
            tx_16 = u0 + u1
            m8 = sel_tx & (mtx == 1)
            p8 = tx8p[jnp.clip(txctx, 0, 1)]
            rac, v0 = _rac_get_prob(rac, half16, p8[:, 0], m8)
            b_tx = jnp.where(sel_tx,
                             jnp.where(mtx == 3, tx_32,
                                       jnp.where(mtx == 2, tx_16,
                                                 jnp.where(mtx == 1, v0,
                                                           0))),
                             jnp.minimum(mtx, txfmmode))
            st["b_tx"] = jnp.where(mm, b_tx, st["b_tx"])
            if want_counts:
                c2 = jnp.clip(txctx, 0, 1)
                tx_idx = jnp.where(
                    m32, CNT_OFF["tx32p"] + c2 * 4 + tx_32,
                    jnp.where(m16, CNT_OFF["tx16p"] + c2 * 3 + tx_16,
                              jnp.where(m8, CNT_OFF["tx8p"] + c2 * 2 + v0,
                                        big)))
                st["cnts"] = st["cnts"].at[lane, tx_idx].add(1, mode="drop")
            uvtx = b_tx - (((ss_h & (bw4 * 2 == (1 << b_tx))) |
                            (ss_v & (bh4 * 2 == (1 << b_tx))))
                           .astype(jnp.int32))
            st["b_uvtx"] = jnp.where(mm, uvtx, st["b_uvtx"])

            # --- modes ---
            a0i, a1i = bc * 2, bc * 2 + 1
            l0i, l1i = (row7) * 2, (row7) * 2 + 1
            # bs indexing: larger index = smaller block (BS_8x8 == 9);
            # the 4-slot per-4x4-mode path is for SUB-8x8 blocks
            # (vp9block.c decode_mode_kf: b->bs > BS_8x8)
            big_bs = bs > 9      # sub-8x8: per-4x4 mode slots
            is_8x4 = bs == 10
            is_4x8 = bs == 11
            entered_mv = jnp.zeros((S,), bool)
            m_blkdone = mm        # lanes whose mode bundle completes here

            def ymode_slot(rac, msel, a_idx, l_from_a, l_idx):
                av = getcol(st["a_mode"], a_idx)
                lv = l_from_a if l_from_a is not None \
                    else getcol(st["l_mode"], l_idx)
                probs = kf_ym[jnp.clip(av, 0, 9), jnp.clip(lv, 0, 9)]
                return _rac_tree(rac, half16, _MTREE, _MDEPTH, probs, msel)

            if inter:
                # ===== non-keyframe modes (vp9block.c:331-802) =====
                # intra blocks on an inter frame: fixed per-frame prob
                # tables, no above/left coupling (vp9block.c:380-411)
                m_iy = mm & (b_intra == 1)
                m_blkdone = m_iy
                ymp = jnp.asarray(aux["ymodep"])
                uvmp = jnp.asarray(aux["uvmodep"])
                yp0 = jnp.broadcast_to(ymp[0][None], (S, 9))
                m_ibig = m_iy & big_bs
                rac, i0 = _rac_tree(rac, half16, _MTREE, _MDEPTH, yp0,
                                    m_ibig)
                m_i1 = m_ibig & ~is_8x4
                rac, i1t = _rac_tree(rac, half16, _MTREE, _MDEPTH, yp0,
                                     m_i1)
                i1 = jnp.where(is_8x4, i0, i1t)
                m_i2 = m_ibig & ~is_4x8
                rac, i2t = _rac_tree(rac, half16, _MTREE, _MDEPTH, yp0,
                                     m_i2)
                i2 = jnp.where(is_4x8, i0, i2t)
                m_i3 = m_ibig & ~is_4x8 & ~is_8x4
                rac, i3t = _rac_tree(rac, half16, _MTREE, _MDEPTH, yp0,
                                     m_i3)
                i3 = jnp.where(is_4x8, i1, jnp.where(is_8x4, i2, i3t))
                m_ismall = m_iy & ~big_bs
                szg = szg_t[jnp.clip(bs, 0, 12)]
                rac, ism = _rac_tree(rac, half16, _MTREE, _MDEPTH,
                                     ymp[jnp.clip(szg, 0, 3)], m_ismall)
                mode0 = jnp.where(big_bs, i0, ism)
                mode1 = jnp.where(big_bs, i1, ism)
                mode2 = jnp.where(big_bs, i2, ism)
                mode3 = jnp.where(big_bs, i3, ism)
                modes = jnp.stack([mode0, mode1, mode2, mode3], 1)
                st["b_modes"] = jnp.where(m_iy[:, None], modes,
                                          st["b_modes"])
                uvp = uvmp[jnp.clip(mode3, 0, 9)]
                rac, uvmode = _rac_tree(rac, half16, _MTREE, _MDEPTH, uvp,
                                        m_iy)
                st["b_uvmode"] = jnp.where(m_iy, uvmode, st["b_uvmode"])
                # intra blocks on inter frames set comp=0 explicitly
                # (vp9block.c:381) — the comp ctx splat reads it
                st["b_comp"] = jnp.where(m_iy, 0, st["b_comp"])
                if want_counts:
                    for msl, mvv in ((m_ibig, i0), (m_i1, i1t),
                                     (m_i2, i2t), (m_i3, i3t)):
                        yy = jnp.where(msl, CNT_OFF["y_mode"]
                                       + jnp.clip(mvv, 0, 9), big)
                        st["cnts"] = st["cnts"].at[lane, yy].add(
                            1, mode="drop")
                    ys = jnp.where(
                        m_ismall,
                        CNT_OFF["y_mode"] + jnp.clip(szg, 0, 3) * 10
                        + jnp.clip(ism, 0, 9), big)
                    st["cnts"] = st["cnts"].at[lane, ys].add(1,
                                                             mode="drop")
                    uvc = jnp.where(
                        m_iy,
                        CNT_OFF["uv_mode"] + jnp.clip(mode3, 0, 9) * 10
                        + jnp.clip(uvmode, 0, 9), big)
                    st["cnts"] = st["cnts"].at[lane, uvc].add(1,
                                                              mode="drop")

                # ----- inter block: comp mode / reference selection
                # (vp9block.c:331-575) -----
                m_il = mm & (b_intra == 0)
                a_cm = getcol(st["a_comp"], bc)
                l_cm = getcol(st["l_comp"], row7)
                a_rf = getcol(st["a_ref"], bc)
                l_rf = getcol(st["l_ref"], row7)
                m_segref = m_il & rs_en
                m_free = m_il & ~rs_en

                def i32_(b):
                    return b.astype(jnp.int32)

                fix_eq_a = (a_in == 0) & (a_rf == fixref)
                fix_eq_l = (l_in == 0) & (l_rf == fixref)
                ctx_c = jnp.where(
                    have_a & have_l,
                    jnp.where((a_cm == 1) & (l_cm == 1), 4,
                    jnp.where(a_cm == 1,
                              2 + i32_((l_in == 1) | (l_rf == fixref)),
                    jnp.where(l_cm == 1,
                              2 + i32_((a_in == 1) | (a_rf == fixref)),
                              i32_(fix_eq_a ^ fix_eq_l)))),
                    jnp.where(have_a,
                              jnp.where(a_cm == 1, 3, i32_(fix_eq_a)),
                    jnp.where(have_l,
                              jnp.where(l_cm == 1, 3, i32_(fix_eq_l)),
                              1)))
                m_csel = m_free & (comppredmode == 2)
                rac, compbit = _rac_get_prob(
                    rac, half16,
                    jnp.asarray(aux["compp"])[jnp.clip(ctx_c, 0, 4)],
                    m_csel)
                b_comp = jnp.where(
                    m_csel, compbit,
                    jnp.where(m_free, i32_(comppredmode == 1), 0))
                st["b_comp"] = jnp.where(m_il, b_comp, st["b_comp"])
                if want_counts:
                    cc_ = jnp.where(
                        m_csel,
                        CNT_OFF["comp"] + jnp.clip(ctx_c, 0, 4) * 2
                        + compbit, big)
                    st["cnts"] = st["cnts"].at[lane, cc_].add(1,
                                                              mode="drop")

                # compound reference (vp9block.c:522-577)
                fix_idx = sbias[jnp.clip(fixref, 0, 2)]
                refl, refa = l_rf, a_rf
                nn0 = jnp.where(
                    (refl == refa) & (refa == varref1), 0,
                    jnp.where((l_cm == 0) & (a_cm == 0),
                        jnp.where(((refa == fixref) & (refl == varref0))
                                  | ((refl == fixref)
                                     & (refa == varref0)), 4,
                                  jnp.where(refa == refl, 3, 1)),
                    jnp.where(l_cm == 0,
                        jnp.where((refa == varref1) & (refl != varref1), 1,
                            jnp.where((refl == varref1)
                                      & (refa != varref1), 2, 4)),
                    jnp.where(a_cm == 0,
                        jnp.where((refl == varref1) & (refa != varref1), 1,
                            jnp.where((refa == varref1)
                                      & (refl != varref1), 2, 4)),
                        jnp.where(refl == refa, 4, 2)))))
                ctx_cr = jnp.where(
                    have_a & have_l,
                    jnp.where(a_in == 1,
                        jnp.where(l_in == 1, 2,
                                  1 + 2 * i32_(refl != varref1)),
                        jnp.where(l_in == 1,
                                  1 + 2 * i32_(refa != varref1), nn0)),
                    jnp.where(have_a,
                        jnp.where(a_in == 1, 2,
                            jnp.where(a_cm == 1,
                                      4 * i32_(a_rf != varref1),
                                      3 * i32_(a_rf != varref1))),
                    jnp.where(have_l,
                        jnp.where(l_in == 1, 2,
                            jnp.where(l_cm == 1,
                                      4 * i32_(l_rf != varref1),
                                      3 * i32_(l_rf != varref1))),
                        2)))
                m_cref = m_free & (b_comp == 1)
                rac, crbit = _rac_get_prob(
                    rac, half16,
                    jnp.asarray(aux["comprefp"])[jnp.clip(ctx_cr, 0, 4)],
                    m_cref)
                if want_counts:
                    cr_ = jnp.where(
                        m_cref,
                        CNT_OFF["comp_ref"] + jnp.clip(ctx_cr, 0, 4) * 2
                        + crbit, big)
                    st["cnts"] = st["cnts"].at[lane, cr_].add(1,
                                                              mode="drop")
                varsel = jnp.where(crbit == 1, varref1, varref0)
                cref0 = jnp.where(fix_idx == 0, fixref, varsel)
                cref1 = jnp.where(fix_idx == 0, varsel, fixref)

                # single reference (vp9block.c:579-687)
                a_ok = have_a & (a_in == 0)
                l_ok = have_l & (l_in == 0)
                nf = i32_(fixref == 0)
                nlr = i32_(l_rf == 0)
                nar = i32_(a_rf == 0)
                inner_both = jnp.where(
                    l_cm == 1,
                    jnp.where(a_cm == 1, 1 + (nf | nlr | nar),
                              3 * nar + (nf | nlr)),
                    jnp.where(a_cm == 1, 3 * nlr + (nf | nar),
                              2 * nlr + 2 * nar))
                ctx_s1 = jnp.where(
                    a_ok,
                    jnp.where(l_ok, inner_both,
                              jnp.where(a_cm == 1, 1 + (nf | nar),
                                        4 * nar)),
                    jnp.where(l_ok,
                              jnp.where(l_cm == 1, 1 + (nf | nlr),
                                        4 * nlr),
                              2))
                m_sr = m_free & (b_comp == 0)
                rac, sbit0 = _rac_get_prob(
                    rac, half16,
                    jnp.asarray(aux["singlerefp"])[jnp.clip(ctx_s1, 0, 4),
                                                   0], m_sr)
                if want_counts:
                    s1_ = jnp.where(
                        m_sr,
                        CNT_OFF["single_ref"]
                        + jnp.clip(ctx_s1, 0, 4) * 4 + sbit0, big)
                    st["cnts"] = st["cnts"].at[lane, s1_].add(1,
                                                              mode="drop")
                m_sr2 = m_sr & (sbit0 == 1)
                f1 = i32_(fixref == 1)
                ar1 = i32_(a_rf == 1)
                lr1 = i32_(l_rf == 1)
                # second-bit context (vp9block.c:489-572), incl. the
                # reference's dead arms
                c_ll = jnp.where(
                    l_in == 1,
                    jnp.where(a_in == 1, 2,
                        jnp.where(a_cm == 1, 1 + 2 * (f1 | ar1),
                            jnp.where(nar == 1, 3, 4 * ar1))),
                    jnp.where(a_in == 1,
                        jnp.where(l_cm == 1, 1 + 2 * (f1 | lr1),
                            jnp.where(nlr == 1, 3, 4 * lr1)),
                    jnp.where(a_cm == 1,
                        jnp.where(l_cm == 1,
                            jnp.where(l_rf == a_rf, 3 * (f1 | lr1), 2),
                            jnp.where(nlr == 1, 1 + 2 * (f1 | ar1),
                                      3 * lr1 + (f1 | ar1))),
                    jnp.where(l_cm == 1,
                        jnp.where(nar == 1, 1 + 2 * (f1 | lr1),
                                  3 * ar1 + (f1 | lr1)),
                    jnp.where(nar == 1,
                        jnp.where(nlr == 1, 3, 4 * lr1),
                    jnp.where(nlr == 1, 4 * ar1,
                              2 * lr1 + 2 * ar1))))))
                ctx_s2 = jnp.where(
                    have_a,
                    jnp.where(have_l, c_ll,
                        jnp.where((a_in == 1)
                                  | ((a_cm == 0) & (nar == 1)), 2,
                            jnp.where(a_cm == 1, 3 * (f1 | ar1),
                                      4 * ar1))),
                    jnp.where(have_l,
                        jnp.where((l_in == 1)
                                  | ((l_cm == 0) & (nlr == 1)), 2,
                            jnp.where(l_cm == 1, 3 * (f1 | lr1),
                                      4 * lr1)),
                        2))
                rac, sbit1 = _rac_get_prob(
                    rac, half16,
                    jnp.asarray(aux["singlerefp"])[jnp.clip(ctx_s2, 0, 4),
                                                   1], m_sr2)
                if want_counts:
                    s2_ = jnp.where(
                        m_sr2,
                        CNT_OFF["single_ref"]
                        + jnp.clip(ctx_s2, 0, 4) * 4 + 2 + sbit1, big)
                    st["cnts"] = st["cnts"].at[lane, s2_].add(1,
                                                              mode="drop")
                sref = jnp.where(sbit0 == 0, 0, 1 + sbit1)
                ref0 = jnp.where(m_segref, rs_val - 1,
                                 jnp.where(b_comp == 1, cref0, sref))
                ref1 = jnp.where(b_comp == 1, cref1, 0)
                newref = jnp.stack([ref0, ref1], 1)
                st["b_ref"] = jnp.where(m_il[:, None], newref,
                                        st["b_ref"])

                # whole-block inter mode for >=8x8 (vp9block.c:577-600);
                # seg SKIP feature forces ZEROMV without a symbol. The
                # mode ctx samples the a/l mode ctx at an offset INTO the
                # block for 64x64 (+3) and 32x32 (+1) — SUB8X8_OFF,
                # vp9block.c:584 (sub-8x8 blocks use offset 0)
                moff = jnp.asarray(
                    np.asarray([3, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                               np.int32))[jnp.clip(bs, 0, 12)]
                mctx = imctx_t[
                    jnp.clip(getcol(st["a_mode"], bc + moff), 0, 13),
                    jnp.clip(getcol(st["l_mode"], row7 + moff), 0, 13)]
                st["b_modectx"] = jnp.where(m_il, mctx, st["b_modectx"])
                m_bmode = m_il & (bs <= 9) & ~forced_skip
                rac, bmt = _rac_tree(
                    rac, half16, _IMTREE, _IMDEPTH,
                    jnp.asarray(aux["mvmodep"])[jnp.clip(mctx, 0, 6)],
                    m_bmode)
                if want_counts:
                    bm_ = jnp.where(
                        m_bmode,
                        CNT_OFF["mv_mode"] + jnp.clip(mctx, 0, 6) * 4
                        + jnp.clip(bmt - 10, 0, 3), big)
                    st["cnts"] = st["cnts"].at[lane, bm_].add(1,
                                                              mode="drop")
                bmode = jnp.where(forced_skip, 12, bmt)   # ZEROMV
                m_bstore = m_il & (bs <= 9)
                st["b_modes"] = jnp.where(m_bstore[:, None],
                                          bmode[:, None], st["b_modes"])

                # interp filter (vp9block.c:602-624)
                a_md = getcol(st["a_mode"], bc)
                l_md = getcol(st["l_mode"], row7)
                cond_a = have_a & (a_md >= 10)
                cond_l = have_l & (l_md >= 10)
                af = getcol(st["a_filter"], bc)
                lf_ = getcol(st["l_filter"], row7)
                ctx_f = jnp.where(
                    cond_a,
                    jnp.where(cond_l, jnp.where(af == lf_, lf_, 3), af),
                    jnp.where(cond_l, lf_, 3))
                m_filt = m_il & (filtermode == 4)
                rac, fid = _rac_tree(
                    rac, half16, _FTREE, _FDEPTH,
                    jnp.asarray(aux["filterp"])[jnp.clip(ctx_f, 0, 3)],
                    m_filt)
                if want_counts:
                    fc_ = jnp.where(
                        m_filt,
                        CNT_OFF["filter"] + jnp.clip(ctx_f, 0, 3) * 3
                        + jnp.clip(fid, 0, 2), big)
                    st["cnts"] = st["cnts"].at[lane, fc_].add(1,
                                                              mode="drop")
                b_filt = jnp.where(m_filt, flut_t[jnp.clip(fid, 0, 2)],
                                   filtermode)
                st["b_filter"] = jnp.where(m_il, b_filt, st["b_filter"])
                st["b_filterid"] = jnp.where(
                    m_filt, fid, jnp.where(m_il, 0, st["b_filterid"]))

                # inter lanes continue in the MV phase
                entered_mv = m_il
                st["phase"] = jnp.where(m_il, MV, st["phase"])
                st["mv_k"] = jnp.where(m_il, 0, st["mv_k"])
                st["mv_z"] = jnp.where(m_il, 0, st["mv_z"])
            else:
                m_big = mm & big_bs
                # slot 0: probs[a[a0]][l[l0]]
                rac, md0 = ymode_slot(rac, m_big, a0i, None, l0i)
                st["a_mode"] = setrow(st["a_mode"], a0i, md0[:, None], z0 + 1,
                                      m_big)
                # slot 1 (bs != BS_8x4): probs[a[a1]][mode0]
                m_s1 = m_big & ~is_8x4
                rac, md1_t = ymode_slot(rac, m_s1, a1i, md0, None)
                md1 = jnp.where(is_8x4, md0, md1_t)
                # l[l0] = a[a1] = mode1
                st["l_mode"] = setrow(st["l_mode"], l0i, md1[:, None], z0 + 1,
                                      m_big)
                st["a_mode"] = setrow(st["a_mode"], a1i, md1[:, None], z0 + 1,
                                      m_big)
                # slot 2 (bs != BS_4x8): probs[a[a0]][l[l1]]
                m_s2 = m_big & ~is_4x8
                rac, md2_t = ymode_slot(rac, m_s2, a0i, None, l1i)
                md2 = jnp.where(is_4x8, md0, md2_t)
                st["a_mode"] = setrow(st["a_mode"], a0i, md2[:, None], z0 + 1,
                                      m_s2)
                # slot 3: probs[a[a1]][mode2] (bs not in {8x4, 4x8}); every
                # big-bs branch ends with l[l1] = a[a1] = mode3
                m_s3 = m_big & ~is_4x8 & ~is_8x4
                rac, md3_t = ymode_slot(rac, m_s3, a1i, md2, None)
                md3 = jnp.where(is_4x8, md1, jnp.where(is_8x4, md2, md3_t))
                st["l_mode"] = setrow(st["l_mode"], l1i, md3[:, None], z0 + 1,
                                      m_big)
                st["a_mode"] = setrow(st["a_mode"], a1i, md3[:, None], z0 + 1,
                                      m_big)

                # <= 8x8: one tree from probs[a[a0]][l[l0]], splat bw/bh
                m_small = mm & ~big_bs
                rac, mds = ymode_slot(rac, m_small, a0i, None, l0i)
                smode = mds
                nw2 = bwh[0, jnp.clip(bs, 0, 12), 0]
                nh2 = bwh[0, jnp.clip(bs, 0, 12), 1]
                st["a_mode"] = splat1(st["a_mode"], a0i, smode, nw2, m_small,
                                      width=16)
                st["l_mode"] = splat1(st["l_mode"], l0i, smode, nh2, m_small,
                                      width=16)

                mode0 = jnp.where(big_bs, md0, smode)
                mode1 = jnp.where(big_bs, md1, smode)
                mode2 = jnp.where(big_bs, md2, smode)
                mode3 = jnp.where(big_bs, md3, smode)
                modes = jnp.stack([mode0, mode1, mode2, mode3], 1)
                st["b_modes"] = jnp.where(mm[:, None], modes, st["b_modes"])

                # --- uv mode ---
                uvp = kf_uvm[jnp.clip(mode3, 0, 9)]
                rac, uvmode = _rac_tree(rac, half16, _MTREE, _MDEPTH, uvp, mm)
                st["b_uvmode"] = jnp.where(mm, uvmode, st["b_uvmode"])

            # --- SET_CTXS splats ---
            st["a_skip"] = splat1(st["a_skip"], bc, b_skip, bw4, mm)
            st["a_txfm"] = splat1(st["a_txfm"], bc, b_tx, bw4, mm)
            st["a_part"] = splat1(st["a_part"], bc,
                                  actx_t[jnp.clip(bs, 0, 12)], bw4, mm)
            st["l_skip"] = splat1(st["l_skip"], row7, b_skip, bh4, mm)
            st["l_txfm"] = splat1(st["l_txfm"], row7, b_tx, bh4, mm)
            st["l_part"] = splat1(st["l_part"], row7,
                                  lctx_t[jnp.clip(bs, 0, 12)], bh4, mm)

            # --- transitions for lanes whose mode bundle finished here
            # (all lanes on keyframes; intra lanes on inter frames — the
            # inter lanes continue through the MV phase) ---
            emit_rec = m_blkdone
            do_ctx_nonkf = m_blkdone if inter else jnp.zeros((S,), bool)
            m_sk = m_blkdone & (b_skip == 1)
            st = zero_nnz(st, m_sk, bc, row7, bw4, bh4)
            st["phase"] = jnp.where(m_sk, PART,
                                    jnp.where(m_blkdone, COEF,
                                              st["phase"]))
            st["c_pl"] = jnp.where(m_blkdone, 0, st["c_pl"])
            st["c_x"] = jnp.where(m_blkdone, 0, st["c_x"])
            st["c_y"] = jnp.where(m_blkdone, 0, st["c_y"])
            st["c_init"] = jnp.where(m_blkdone, 1, st["c_init"])
            st["c_modeidx"] = jnp.where(m_blkdone, 0, st["c_modeidx"])
            return (rac, {kk: st[kk] for kk in _MDW}, entered_mv,
                    m_blkdone)

        def _mode_idle(carry):
            rac, sub = carry
            zf = jnp.zeros((S,), bool)
            return (rac, sub, zf, zf)

        rac, md_sub, entered_mv, m_blkdone = jax.lax.cond(
            jnp.any(mm), _mode_section, _mode_idle,
            (rac, {kk: st[kk] for kk in _MDW}))
        st.update(md_sub)
        emit_rec = m_blkdone
        do_ctx_nonkf = m_blkdone if inter else jnp.zeros((S,), bool)

        # ============ MV quantum (inter lanes only) ============
        # one quantum per (sub-block k, ref z): optional sub-block
        # inter-mode tree, find_ref_mvs candidate scan, hp rounding,
        # NEWMV joint+component reads (vp9block.c:626-677, vp9mvs.c)
        if inter:
            # The MV machinery (the 32-slot candidate scan + component
            # trees) dominates the while-body's op count; a lane is in
            # the MV phase for only ~2 quanta per inter block, so it
            # runs under a REAL branch (lax.cond with a scalar
            # predicate — XLA executes only the taken side), keeping
            # coefficient-quantum iterations at keyframe cost.
            _MVW = ("b_modes", "b_mv", "mv_k", "mv_z", "cnts",
                    "phase", "c_pl", "c_x", "c_y", "c_init",
                    "c_modeidx", "b_anycoef", "a_ynnz", "l_ynnz",
                    "a_unnz", "l_unnz")
            st_outer = st

            def _mv_section(carry):
                rac, sub = carry
                st = dict(st_outer)
                st.update(sub)
                phase = st["phase"]
                mk = (phase == MV) & ~entered_mv
                k = st["mv_k"]
                z = st["mv_z"]
                br, bc, bs = st["b_r"], st["b_c"], st["b_bs"]
                row7 = br & 7
                sub8 = bs > 9
                m_dmode = mk & sub8 & (z == 0)
                rac, mdk = _rac_tree(
                    rac, half16, _IMTREE, _IMDEPTH,
                    jnp.asarray(aux["mvmodep"])[
                        jnp.clip(st["b_modectx"], 0, 6)], m_dmode)
                if want_counts:
                    km_ = jnp.where(
                        m_dmode,
                        CNT_OFF["mv_mode"]
                        + jnp.clip(st["b_modectx"], 0, 6) * 4
                        + jnp.clip(mdk - 10, 0, 3), big)
                    st["cnts"] = st["cnts"].at[lane, km_].add(1,
                                                              mode="drop")
                kc = jnp.clip(k, 0, 3)
                bmcur = st["b_modes"][lane, kc]
                st["b_modes"] = st["b_modes"].at[lane, kc].set(
                    jnp.where(m_dmode, mdk, bmcur))
                mode_k = st["b_modes"][lane, kc]
                is_zmv = mode_k == 12
                m_scan = mk & ~is_zmv
                idxn = (mode_k == 11).astype(jnp.int32)     # NEARMV
                sbp = jnp.where(mode_k == 13, -1,
                                jnp.where(sub8, k, -1))
                refz = st["b_ref"][lane, jnp.clip(z, 0, 1)]

                # ---- find_ref_mvs slot walk (vp9mvs.c:37-234) ----
                bw4_ = bwh[1, jnp.clip(bs, 0, 12), 0]
                bh4_ = bwh[1, jnp.clip(bs, 0, 12), 1]
                minx = -(128 + bc * 64)
                miny = -(128 + br * 64)
                maxx = 128 + (cols - bc - bw4_) * 64
                maxy = 128 + (rows - br - bh4_) * 64
                pmv_t = jnp.asarray(aux["prev_mv"])
                pref_t = jnp.asarray(aux["prev_ref"])
                gmv = st["g_mv"]
                gref = st["g_ref"]
                pi = jnp.clip(br * cols + bc, 0, gmax - 1)

                def scan_body(j, carry):
                    (found, rx, ry, msets, mx, my, m8s, m8x, m8y) = carry
                    kind = kinds_t[j]
                    par = pars_t[j]
                    off = ptab[jnp.clip(bs, 0, 12), par]
                    nc = bc + off[:, 0]
                    nr = br + off[:, 1]
                    nb_ok = (nc >= c0l) & (nc < cols) & (nr >= 0) \
                        & (nr < rows)
                    gi = jnp.clip(nr * cols + nc, 0, gmax - 1)
                    gr0 = gref[gi, 0]
                    gr1 = gref[gi, 1]
                    gv0 = gmv[gi, 0]
                    gv1 = gmv[gi, 1]
                    ai = jnp.clip((br - 1) * cols + bc, 0, gmax - 1)
                    li = jnp.clip(br * cols + bc - 1, 0, gmax - 1)
                    ar0, ar1_ = gref[ai, 0], gref[ai, 1]
                    lr0, lr1_ = gref[li, 0], gref[li, 1]
                    sb_c = jnp.clip(sbp, 0, 3)
                    amv = st["a_mv"][lane,
                                     jnp.clip(2 * bc + (sb_c & 1), 0,
                                              2 * maxc + 15)]
                    lmv = st["l_mv"][lane,
                                     jnp.clip(2 * row7 + (sb_c >> 1), 0,
                                              15)]
                    pr0, pr1 = pref_t[pi, 0], pref_t[pi, 1]
                    pv0, pv1 = pmv_t[pi, 0], pmv_t[pi, 1]
                    dval = st["b_mv"][lane, jnp.clip(par, 0, 3),
                                      jnp.clip(z, 0, 1)]
                    act = jnp.where(
                        kind == 0,
                        jnp.where(par == 0, sbp >= 1, sbp == 3),
                        jnp.where(kind == 1, (sbp >= 0) & (br > 0),
                        jnp.where(kind == 2, (sbp >= 0) & (bc > c0l),
                        jnp.where(kind == 3,
                                  ((sbp < 0) | (par >= 2)) & nb_ok,
                        jnp.where((kind == 5) | (kind == 6), nb_ok,
                                  use_prev == 1)))))
                    h1 = (ar0 == refz) | (ar1_ == refz)
                    v1 = jnp.where((ar0 == refz)[:, None], amv[:, 0],
                                   amv[:, 1])
                    h2 = (lr0 == refz) | (lr1_ == refz)
                    v2 = jnp.where((lr0 == refz)[:, None], lmv[:, 0],
                                   lmv[:, 1])
                    h3 = (gr0 == refz) | (gr1 == refz)
                    v3 = jnp.where((gr0 == refz)[:, None], gv0, gv1)
                    h4 = (pr0 == refz) | (pr1 == refz)
                    v4 = jnp.where((pr0 == refz)[:, None], pv0, pv1)
                    h5 = (gr0 >= 0) & (gr0 != refz)
                    h6 = (gr1 >= 0) & (gr1 != refz) \
                        & ((gv0[:, 0] != gv1[:, 0])
                           | (gv0[:, 1] != gv1[:, 1]))
                    h7 = (pr0 >= 0) & (pr0 != refz)
                    h8 = (pr1 >= 0) & (pr1 != refz) \
                        & ((pv0[:, 0] != pv1[:, 0])
                           | (pv0[:, 1] != pv1[:, 1]))
                    sb_ref = sbias[jnp.clip(refz, 0, 2)]
                    fl5 = sbias[jnp.clip(gr0, 0, 2)] != sb_ref
                    fl6 = sbias[jnp.clip(gr1, 0, 2)] != sb_ref
                    fl7 = sbias[jnp.clip(pr0, 0, 2)] != sb_ref
                    fl8 = sbias[jnp.clip(pr1, 0, 2)] != sb_ref
                    present = jnp.where(
                        kind == 0, True,
                        jnp.where(kind == 1, h1,
                        jnp.where(kind == 2, h2,
                        jnp.where(kind == 3, h3,
                        jnp.where(kind == 4, h4,
                        jnp.where(kind == 5, h5,
                        jnp.where(kind == 6, h6,
                        jnp.where(kind == 7, h7, h8))))))))
                    vx = jnp.where(
                        kind == 0, dval[:, 0],
                        jnp.where(kind == 1, v1[:, 0],
                        jnp.where(kind == 2, v2[:, 0],
                        jnp.where(kind == 3, v3[:, 0],
                        jnp.where(kind == 4, v4[:, 0],
                        jnp.where(kind == 5, gv0[:, 0],
                        jnp.where(kind == 6, gv1[:, 0],
                        jnp.where(kind == 7, pv0[:, 0], pv1[:, 0]))))))))
                    vy = jnp.where(
                        kind == 0, dval[:, 1],
                        jnp.where(kind == 1, v1[:, 1],
                        jnp.where(kind == 2, v2[:, 1],
                        jnp.where(kind == 3, v3[:, 1],
                        jnp.where(kind == 4, v4[:, 1],
                        jnp.where(kind == 5, gv0[:, 1],
                        jnp.where(kind == 6, gv1[:, 1],
                        jnp.where(kind == 7, pv0[:, 1], pv1[:, 1]))))))))
                    flip = jnp.where(
                        kind == 5, fl5,
                        jnp.where(kind == 6, fl6,
                        jnp.where(kind == 7, fl7,
                        jnp.where(kind == 8, fl8, False))))
                    vx = jnp.where(flip, -vx, vx)
                    vy = jnp.where(flip, -vy, vy)
                    proc = m_scan & act & present & ~found
                    is_dir = kind == 0
                    # RETURN_DIRECT_MV: unclamped; idx 0 returns first
                    d_ret0 = proc & is_dir & (idxn == 0)
                    d_memnew = proc & is_dir & (idxn == 1) & ~msets
                    d_diff = proc & is_dir & (idxn == 1) & msets \
                        & ((vx != mx) | (vy != my))
                    # RETURN_MV: clamped result; sb>0 has the two-stage
                    # mem_sub8x8 compare incl. the libvpx zero-return bug
                    cx_ = jnp.clip(vx, minx, maxx)
                    cy_ = jnp.clip(vy, miny, maxy)
                    memdif = ~msets | ((cx_ != mx) | (cy_ != my))
                    nd = proc & ~is_dir
                    sbpos = sbp > 0
                    s_first = nd & sbpos & ~m8s
                    s_hit1 = s_first & memdif
                    s_mem8 = s_first & ~memdif
                    s_sec = nd & sbpos & m8s & ((vx != m8x) | (vy != m8y))
                    s_hit2 = s_sec & memdif
                    s_zero = s_sec & ~memdif
                    n_idx0 = nd & ~sbpos & (idxn == 0)
                    n_memnew = nd & ~sbpos & (idxn == 1) & ~msets
                    n_diff = nd & ~sbpos & (idxn == 1) & msets \
                        & ((vx != mx) | (vy != my))
                    newfound = d_ret0 | d_diff | s_hit1 | s_hit2 \
                        | s_zero | n_idx0 | n_diff
                    hitc = s_hit1 | s_hit2 | n_idx0 | n_diff
                    nrx = jnp.where(d_ret0 | d_diff, vx,
                                    jnp.where(hitc, cx_,
                                              jnp.where(s_zero, 0, rx)))
                    nry = jnp.where(d_ret0 | d_diff, vy,
                                    jnp.where(hitc, cy_,
                                              jnp.where(s_zero, 0, ry)))
                    nmx = jnp.where(d_memnew | n_memnew, vx, mx)
                    nmy = jnp.where(d_memnew | n_memnew, vy, my)
                    nmsets = msets | d_memnew | n_memnew
                    nm8x = jnp.where(s_mem8, vx, m8x)
                    nm8y = jnp.where(s_mem8, vy, m8y)
                    nm8s = m8s | s_mem8
                    return (found | newfound, nrx, nry, nmsets, nmx, nmy,
                            nm8s, nm8x, nm8y)

                zb = jnp.zeros((S,), bool)
                zi = jnp.zeros((S,), jnp.int32)
                found, rx, ry, _ms, _mx, _my, _m8, _x8, _y8 = \
                    jax.lax.fori_loop(0, _NSLOTS, scan_body,
                                      (zb, zi, zi, zb, zi, zi, zb, zi, zi))
                rx = jnp.where(found, rx, jnp.clip(zi, minx, maxx))
                ry = jnp.where(found, ry, jnp.clip(zi, miny, maxy))

                # hp + rounding (vp9mvs.c:291-321)
                do_rnd = (mode_k == 13) | ~sub8
                hp = (highprec == 1) & (jnp.abs(rx) < 64) \
                    & (jnp.abs(ry) < 64)
                m_rnd = m_scan & do_rnd & ~hp
                ry = jnp.where(m_rnd & ((ry & 1) == 1),
                               ry + jnp.where(ry < 0, 1, -1), ry)
                rx = jnp.where(m_rnd & ((rx & 1) == 1),
                               rx + jnp.where(rx < 0, 1, -1), rx)
                m_new = mk & (mode_k == 13)
                jp = jnp.broadcast_to(
                    jnp.asarray(aux["mvjointp"])[None, :], (S, 3))
                rac, jnt = _rac_tree(rac, half16, _JTREE, _JDEPTH, jp,
                                     m_new)
                if want_counts:
                    jc_ = jnp.where(m_new, CNT_OFF["mv_joint"]
                                    + jnp.clip(jnt, 0, 3), big)
                    st["cnts"] = st["cnts"].at[lane, jc_].add(1,
                                                              mode="drop")
                m_cy = m_new & (jnt >= 2)
                rac, dy, st = _read_mv_comp(rac, half16, aux, st, lane,
                                            m_cy, 0, hp, want_counts,
                                            big, S)
                m_cx = m_new & ((jnt & 1) == 1)
                rac, dx, st = _read_mv_comp(rac, half16, aux, st, lane,
                                            m_cx, 1, hp, want_counts,
                                            big, S)
                ry = jnp.where(m_cy, ry + dy, ry)
                rx = jnp.where(m_cx, rx + dx, rx)
                mvx = jnp.where(is_zmv, 0, rx)
                mvy = jnp.where(is_zmv, 0, ry)

                # store; ZEROMV zeroes both ref slots in one quantum
                cur = st["b_mv"][lane, kc]                  # [S,2,2]
                sel_z = jnp.arange(2)[None, :] == jnp.clip(z, 0, 1)[:, None]
                newpair = jnp.stack([mvx, mvy], -1)
                upd = jnp.where(sel_z[:, :, None], newpair[:, None, :],
                                cur)
                upd = jnp.where(is_zmv[:, None, None], 0, upd)
                st["b_mv"] = st["b_mv"].at[lane, kc].set(
                    jnp.where(mk[:, None, None], upd, cur))

                # advance (k, z)
                go_z1 = mk & (st["b_comp"] == 1) & (z == 0) & ~is_zmv
                stepk = jnp.where(bs == 10, 2, 1)
                lastk = jnp.where(bs == 12, 3,
                                  jnp.where(bs == 11, 1,
                                            jnp.where(bs == 10, 2, 0)))
                nk = k + stepk
                m_next = mk & ~go_z1 & (nk <= lastk) & sub8
                fin = mk & ~go_z1 & ~m_next
                st["mv_z"] = jnp.where(go_z1, 1,
                                       jnp.where(mk, 0, st["mv_z"]))
                st["mv_k"] = jnp.where(m_next, nk, st["mv_k"])

                # finalize: propagate shared sub-block slots
                # (vp9block.c:732-766), then the block's skip/coef path
                csrc_t = jnp.asarray(np.asarray(
                    [[0, 0, 0, 0]] * 10 + [[0, 0, 2, 2], [0, 1, 0, 1],
                                           [0, 1, 2, 3]], np.int32))
                src = csrc_t[jnp.clip(bs, 0, 12)]
                gmv_c = st["b_mv"][lane[:, None], src]
                st["b_mv"] = jnp.where(fin[:, None, None, None], gmv_c,
                                       st["b_mv"])
                gmd_c = st["b_modes"][lane[:, None], src]
                st["b_modes"] = jnp.where(fin[:, None], gmd_c,
                                          st["b_modes"])
                fin_skip = fin & (st["b_skip"] == 1)
                fin_coef = fin & (st["b_skip"] == 0)
                bw4f = bwh[1, jnp.clip(bs, 0, 12), 0]
                bh4f = bwh[1, jnp.clip(bs, 0, 12), 1]
                st = zero_nnz(st, fin_skip, bc, row7, bw4f, bh4f)
                st["phase"] = jnp.where(fin_skip, PART,
                                        jnp.where(fin_coef, COEF,
                                                  st["phase"]))
                st["c_pl"] = jnp.where(fin, 0, st["c_pl"])
                st["c_x"] = jnp.where(fin, 0, st["c_x"])
                st["c_y"] = jnp.where(fin, 0, st["c_y"])
                st["c_init"] = jnp.where(fin_coef, 1, st["c_init"])
                st["c_modeidx"] = jnp.where(fin, 0, st["c_modeidx"])
                st["b_anycoef"] = jnp.where(fin, 0, st["b_anycoef"])
                return (rac, {kk: st[kk] for kk in _MVW},
                        fin, fin_skip, fin_coef)

            def _mv_idle(carry):
                rac, sub = carry
                zf = jnp.zeros((S,), bool)
                return (rac, sub, zf, zf, zf)

            mv_pred = jnp.any((st["phase"] == MV) & ~entered_mv)
            rac, mv_sub, fin, fin_skip, fin_coef = jax.lax.cond(
                mv_pred, _mv_section, _mv_idle,
                (rac, {kk: st[kk] for kk in _MVW}))
            st.update(mv_sub)
            entered_coef = fin_coef
            emit_rec = emit_rec | fin_skip
            do_ctx_nonkf = do_ctx_nonkf | fin
        else:
            entered_coef = jnp.zeros((S,), bool)

        # ============ COEF quantum ============
        phase = st["phase"]
        mc = (phase == COEF) & ~mm & ~emit_block & ~entered_coef
        br, bc = st["b_r"], st["b_c"]
        row7 = br & 7
        bs = st["b_bs"]
        b_tx = st["b_tx"]
        b_uvtx = st["b_uvtx"]
        seg_id = st["b_seg"]
        pl = st["c_pl"]
        is_y = pl == 0
        sshp = jnp.where(is_y, 0, ss_h)
        ssvp = jnp.where(is_y, 0, ss_v)
        tx_p = jnp.where(is_y, b_tx, b_uvtx)
        step = 1 << tx_p
        w4b = bwh[1, jnp.clip(bs, 0, 12), 0] * 2
        h4b = bwh[1, jnp.clip(bs, 0, 12), 1] * 2
        end_x0 = jnp.minimum(2 * (cols - bc), w4b)
        end_y0 = jnp.minimum(2 * (rows - br), h4b)
        w4p = w4b >> sshp
        h4p = h4b >> ssvp
        end_x = end_x0 >> sshp
        end_y = end_y0 >> ssvp

        # ---- tx-block init (no symbols) ----
        m_init = mc & (st["c_init"] == 1)
        cx, cy = st["c_x"], st["c_y"]
        a_base = jnp.where(is_y, bc * 2,
                           (bc * 2) >> ss_h)
        l_base = jnp.where(is_y, row7 * 2,
                           (row7 * 2) >> ss_v)
        karr = jnp.arange(8)[None, :]

        a_arr = jnp.where(is_y[:, None], st["a_ynnz"],
                          jnp.where((pl == 1)[:, None],
                                    st["a_unnz"][:, 0],
                                    st["a_unnz"][:, 1]))
        l_arr = jnp.where(is_y[:, None], st["l_ynnz"],
                          jnp.where((pl == 1)[:, None],
                                    st["l_unnz"][:, 0],
                                    st["l_unnz"][:, 1]))

        # nnz pre-merge ONCE at the start of each plane walk (the C
        # does it before the loop): every step-anchor entry becomes
        # any() of its step range; non-anchor entries stay stale and
        # are never read until the post-walk splat overwrites them.
        m_pm = m_init & (cx == 0) & (cy == 0) & (step > 1)
        anch = jnp.arange(8)[None, :]          # anchor index
        kk2 = jnp.arange(8)[None, None, :]

        def premerge(arr, base, end):
            apos = anch * step[:, None]        # [S, 8]
            ok_a = (apos < end[:, None]) & m_pm[:, None]
            idx = (base[:, None, None] + apos[:, :, None] + kk2)
            okk = kk2 < step[:, None, None]
            v = arr[lane[:, None, None],
                    jnp.clip(idx, 0, arr.shape[1] - 1)]
            merged = (jnp.sum(jnp.where(okk, v, 0), axis=2) > 0) \
                .astype(jnp.int32)
            widx = jnp.where(ok_a, base[:, None] + apos, big)
            return arr.at[lane[:, None], widx].set(merged, mode="drop")

        a_arr = premerge(a_arr, a_base, end_x)
        l_arr = premerge(l_arr, l_base, end_y)
        # write the merged arrays back to their sources
        st["a_ynnz"] = jnp.where((m_pm & is_y)[:, None], a_arr,
                                 st["a_ynnz"])
        st["a_unnz"] = st["a_unnz"].at[:, 0].set(
            jnp.where((m_pm & (pl == 1))[:, None], a_arr,
                      st["a_unnz"][:, 0]))
        st["a_unnz"] = st["a_unnz"].at[:, 1].set(
            jnp.where((m_pm & (pl == 2))[:, None], a_arr,
                      st["a_unnz"][:, 1]))
        st["l_ynnz"] = jnp.where((m_pm & is_y)[:, None], l_arr,
                                 st["l_ynnz"])
        st["l_unnz"] = st["l_unnz"].at[:, 0].set(
            jnp.where((m_pm & (pl == 1))[:, None], l_arr,
                      st["l_unnz"][:, 0]))
        st["l_unnz"] = st["l_unnz"].at[:, 1].set(
            jnp.where((m_pm & (pl == 2))[:, None], l_arr,
                      st["l_unnz"][:, 1]))

        nnz_a = getcol(a_arr, a_base + cx)
        nnz_l = getcol(l_arr, l_base + cy)
        nnz0 = nnz_a + nnz_l
        st["c_nnz"] = jnp.where(m_init, nnz0, st["c_nnz"])
        st["c_i"] = jnp.where(m_init, 0, st["c_i"])
        st["c_skipeob"] = jnp.where(m_init, 0, st["c_skipeob"])
        st["c_count"] = jnp.where(m_init, 0, st["c_count"])
        st["c_done"] = jnp.where(m_init, 0, st["c_done"])
        st["cache"] = jnp.where(m_init[:, None], 0, st["cache"])
        st["c_init"] = jnp.where(m_init, 0, st["c_init"])

        # ---- one scan position ----
        ma = mc & (st["c_done"] == 0)
        n_tot = (4 << tx_p) * (4 << tx_p)
        i = st["c_i"]
        # txtype: Y tx4 in sub-8x8 blocks uses the per-4x4 mode
        midx = jnp.where((bs > 9) & (b_tx == 0), st["c_modeidx"], 0)
        mode_i = jnp.take_along_axis(
            st["b_modes"], jnp.clip(midx, 0, 3)[:, None], 1)[:, 0]
        # inter modes (10-13) map to DCT_DCT via the same 14-entry
        # table (ff_vp9_intra_txfm_type, vp9data.c:437)
        txtp = jnp.where(is_y, itx_t[jnp.clip(mode_i, 0, 13)], 0)
        scfg = (4 * lossless + tx_p) * 4 + txtp
        band = bands_t[jnp.clip(tx_p, 0, 3), jnp.clip(i, 0, 1023)]
        ctx = st["c_nnz"]
        if inter:
            isin = 1 - st["b_intra"]
            prow_idx = (tx_p * 2
                        + (1 - is_y.astype(jnp.int32))) * 2 + isin
            tp = jnp.asarray(aux["coef11i"])[
                jnp.clip(prow_idx, 0, 15),
                jnp.clip(band * 6 + ctx, 0, 35)]        # [S, 11]
        else:
            isin = jnp.zeros((S,), jnp.int32)
            prow_idx = tx_p * 2 + (1 - is_y.astype(jnp.int32))
            tp = coef11[jnp.clip(prow_idx, 0, 7),
                        jnp.clip(band * 6 + ctx, 0, 35)]  # [S, 11]

        def tpk(k):
            return tp[:, k]

        m_eob = ma & (st["c_skipeob"] == 0)
        rac, bb = _rac_get_prob(rac, half16, tpk(0), m_eob)
        hit_end = m_eob & (bb == 0)
        alive = ma & ~hit_end
        rac, zz = _rac_get_prob(rac, half16, tpk(1), alive)
        is_zero = alive & (zz == 0)
        nonzero = alive & (zz == 1)
        rac, b_one = _rac_get_prob(rac, half16, tpk(2), nonzero)
        m_one = nonzero & (b_one == 0)
        m_bigv = nonzero & (b_one == 1)
        rac, b3 = _rac_get_prob(rac, half16, tpk(3), m_bigv)
        m_234 = m_bigv & (b3 == 0)
        rac, b4 = _rac_get_prob(rac, half16, tpk(4), m_234)
        m_2 = m_234 & (b4 == 0)
        m_34 = m_234 & (b4 == 1)
        rac, b5 = _rac_get_prob(rac, half16, tpk(5), m_34)
        m_cat = m_bigv & (b3 == 1)
        rac, b6 = _rac_get_prob(rac, half16, tpk(6), m_cat)
        m_c12 = m_cat & (b6 == 0)
        rac, b7 = _rac_get_prob(rac, half16, tpk(7), m_c12)
        m_c36 = m_cat & (b6 == 1)
        rac, b8_ = _rac_get_prob(rac, half16, tpk(8), m_c36)
        m_c34 = m_c36 & (b8_ == 0)
        rac, b9 = _rac_get_prob(rac, half16, tpk(9), m_c34)
        m_c56 = m_c36 & (b8_ == 1)
        rac, b10 = _rac_get_prob(rac, half16, tpk(10), m_c56)
        if want_counts:
            # coefficient symbol counts at the (band, ctx) in effect
            # when each symbol was read (vp9block.c: eobcnt at every
            # eob probe; cnt[0/1/2] per token class)
            prow5 = (jnp.clip(tx_p, 0, 3) * 2
                     + (1 - is_y.astype(jnp.int32))) * 2 + isin
            bc36 = jnp.clip(band * 6 + ctx, 0, 35)
            e_idx = jnp.where(m_eob,
                              CNT_EOB + (prow5 * 36 + bc36) * 2 + bb,
                              big)
            st["cnts"] = st["cnts"].at[lane, e_idx].add(1, mode="drop")
            tok = jnp.where(is_zero, 0, jnp.where(m_one, 1, 2))
            t_act = is_zero | m_one | m_bigv
            t_idx = jnp.where(
                t_act, CNT_COEF + (prow5 * 36 + bc36) * 3 + tok, big)
            st["cnts"] = st["cnts"].at[lane, t_idx].add(1, mode="drop")
        # extra-bit classes cat1..cat6 decoded by ONE rolled ladder
        # with a per-class prob table (vp9block.c:839-899)
        cls = jnp.zeros((S,), jnp.int32)      # 1..6, 0 = none
        cls = jnp.where(m_c12, 1 + b7, cls)
        cls = jnp.where(m_c34, 3 + b9, cls)
        cls = jnp.where(m_c56, 5 + b10, cls)
        ctab = jnp.asarray(_cat_table(bpp))   # [7, K] probs
        cnbits = jnp.asarray(_CAT_NBITS[bpp]) # [7]
        cbase = jnp.asarray(_CAT_BASE)        # [7]
        probrow = ctab[cls]
        nb_cls = cnbits[cls]
        m_cls = (cls > 0)
        rac, ebits = _rac_bits(rac, half16, probrow, nb_cls, m_cls)
        val = jnp.zeros((S,), jnp.int32)
        val = jnp.where(m_one, 1, val)
        val = jnp.where(m_2, 2, val)
        val = jnp.where(m_34, 3 + b5, val)
        val = jnp.where(m_cls, cbase[cls] + ebits, val)
        rac, sgn = _rac_get_prob(rac, half16, 128, nonzero)
        qsel = qmul[jnp.clip(seg_id, 0, 7)]            # [S, 4]
        qdc = jnp.where(is_y, qsel[:, 0], qsel[:, 2])
        qac = jnp.where(is_y, qsel[:, 1], qsel[:, 3])
        q = jnp.where(i == 0, qdc, qac)
        sv = jnp.where(sgn == 1, -val, val)
        prod = sv * q
        is32 = tx_p == 3
        prod = jnp.where(is32,
                         jnp.where(prod < 0, -((-prod) >> 1),
                                   prod >> 1), prod)
        if bpp == 8:
            prod = ((prod + 0x8000) & 0xFFFF) - 0x8000
        # energy class
        energy = jnp.zeros((S,), jnp.int32)
        energy = jnp.where(m_one, 1, energy)
        energy = jnp.where(m_2, 2, energy)
        energy = jnp.where(m_34, 3, energy)
        energy = jnp.where(m_c12, 4, energy)
        energy = jnp.where(m_c36, 5, energy)
        proc = is_zero | nonzero
        sc = scans[jnp.clip(scfg, 0, 19), jnp.clip(i, 0, 1023)]
        st["cache"] = st["cache"].at[
            lane, jnp.where(proc, sc, big)].set(energy, mode="drop")
        # emit nonzero coefficient pair
        sz_p = 4 << tx_p
        py = jnp.where(is_y, br * 8, (br * 8) >> ss_v) + cy * 4
        px = jnp.where(is_y, bc * 8, (bc * 8) >> ss_h) + cx * 4
        Wp = jnp.where(is_y, W64, W64uv)
        base = jnp.where(is_y, 0, jnp.where(pl == 1, ysz, ysz + usz))
        cpos = base + (py + sc // sz_p) * Wp + (px + sc % sz_p)
        m_cv = nonzero & (prod != 0)
        ci = jnp.where(m_cv, st["ncp"], big)
        pairrow = jnp.stack([cpos, prod], 1)
        st["cpairs"] = st["cpairs"].at[
            lane, jnp.clip(ci, 0, cmax - 1)].set(
            jnp.where((m_cv & (ci < cmax))[:, None], pairrow,
                      st["cpairs"][lane, jnp.clip(ci, 0, cmax - 1)]))
        st["ncp"] = jnp.where(m_cv, st["ncp"] + 1, st["ncp"])
        st["err"] = st["err"] | jnp.where(m_cv & (ci >= cmax), 1, 0)
        # next-position ctx
        nb0 = nbs[jnp.clip(scfg, 0, 19), jnp.clip(i, 0, 1023), 0]
        nb1 = nbs[jnp.clip(scfg, 0, 19), jnp.clip(i, 0, 1023), 1]
        cv0 = st["cache"][lane, jnp.clip(nb0, 0, 1023)]
        cv1 = st["cache"][lane, jnp.clip(nb1, 0, 1023)]
        st["c_nnz"] = jnp.where(proc, (1 + cv0 + cv1) >> 1,
                                st["c_nnz"])
        st["c_skipeob"] = jnp.where(alive, is_zero.astype(jnp.int32),
                                    st["c_skipeob"])
        st["c_count"] = jnp.where(proc, i + 1, st["c_count"])
        i2 = i + 1
        st["c_i"] = jnp.where(ma, i2, st["c_i"])
        blk_done = hit_end | (ma & (i2 >= n_tot) & ~hit_end)
        # a zero-run that reaches n_coeffs ends the block too (the C
        # goto done) — covered by i2 >= n_tot
        st["c_done"] = jnp.where(blk_done, 1, st["c_done"])

        # ---- tx-block finish: nnz writeback, eob emit, advance ----
        m_fin = mc & (st["c_done"] == 1)
        ret = st["c_count"]
        nzflag = (ret > 0).astype(jnp.int32)
        a_idx = a_base + cx
        l_idx = l_base + cy
        # write the anchor entries
        a_new = a_arr.at[lane, jnp.where(m_fin, a_idx, big)].set(
            nzflag, mode="drop")
        l_new = l_arr.at[lane, jnp.where(m_fin, l_idx, big)].set(
            nzflag, mode="drop")
        # splat within the step range (C splats once per plane after
        # the loop; per-block splat of THIS anchor's range is
        # equivalent because anchors partition the range)
        kk = jnp.arange(8)[None, :]
        okk = (kk >= 1) & (kk < step[:, None]) \
            & ((cx[:, None] + kk) < jnp.maximum(end_x, w4p)[:, None])
        # full=end==w4: fill step-1 entries; else fill to end-1
        fill_a = jnp.where((end_x == w4p)[:, None], okk,
                           okk & ((cx[:, None] + kk)
                                  < end_x[:, None]))
        ia = jnp.where(m_fin[:, None] & fill_a,
                       a_base[:, None] + cx[:, None] + kk, big)
        a_new = a_new.at[lane[:, None], ia].set(
            jnp.broadcast_to(nzflag[:, None], (S, 8)), mode="drop")
        fill_l = jnp.where((end_y == h4p)[:, None], okk,
                           okk & ((cy[:, None] + kk)
                                  < end_y[:, None]))
        il = jnp.where(m_fin[:, None] & fill_l,
                       l_base[:, None] + cy[:, None] + kk, big)
        l_new = l_new.at[lane[:, None], il].set(
            jnp.broadcast_to(nzflag[:, None], (S, 8)), mode="drop")
        # scatter the merged array back into its source
        st["a_ynnz"] = jnp.where((m_fin & is_y)[:, None], a_new,
                                 st["a_ynnz"])
        st["a_unnz"] = st["a_unnz"].at[:, 0].set(
            jnp.where((m_fin & (pl == 1))[:, None], a_new,
                      st["a_unnz"][:, 0]))
        st["a_unnz"] = st["a_unnz"].at[:, 1].set(
            jnp.where((m_fin & (pl == 2))[:, None], a_new,
                      st["a_unnz"][:, 1]))
        st["l_ynnz"] = jnp.where((m_fin & is_y)[:, None], l_new,
                                 st["l_ynnz"])
        st["l_unnz"] = st["l_unnz"].at[:, 0].set(
            jnp.where((m_fin & (pl == 1))[:, None], l_new,
                      st["l_unnz"][:, 0]))
        st["l_unnz"] = st["l_unnz"].at[:, 1].set(
            jnp.where((m_fin & (pl == 2))[:, None], l_new,
                      st["l_unnz"][:, 1]))
        # eob pair
        ec16 = jnp.where(is_y, c16, c16uv)
        ebase = jnp.where(is_y, 0,
                          jnp.where(pl == 1, eysz, eysz + eusz))
        ey = jnp.where(is_y, br * 2, (br * 2) >> ss_v) + cy
        ex = jnp.where(is_y, bc * 2, (bc * 2) >> ss_h) + cx
        epos = ebase + ey * ec16 + ex
        m_ep = m_fin & (ret > 0)
        ei = jnp.where(m_ep, st["nep"], big)
        eprow = jnp.stack([epos, ret], 1)
        st["epairs"] = st["epairs"].at[
            lane, jnp.clip(ei, 0, emax - 1)].set(
            jnp.where((m_ep & (ei < emax))[:, None], eprow,
                      st["epairs"][lane, jnp.clip(ei, 0, emax - 1)]))
        st["nep"] = jnp.where(m_ep, st["nep"] + 1, st["nep"])
        st["err"] = st["err"] | jnp.where(m_ep & (ei >= emax), 1, 0)

        # advance (x, y, plane)
        st["c_modeidx"] = jnp.where(m_fin & is_y,
                                    st["c_modeidx"] + step * step,
                                    st["c_modeidx"])
        nx = cx + step
        x_wrap = nx >= end_x
        ny_ = cy + jnp.where(x_wrap, step, 0)
        y_wrap = x_wrap & (ny_ >= end_y)
        st["c_x"] = jnp.where(m_fin, jnp.where(x_wrap, 0, nx),
                              st["c_x"])
        st["c_y"] = jnp.where(m_fin, jnp.where(y_wrap, 0, ny_),
                              st["c_y"])
        next_pl = pl + 1
        st["c_pl"] = jnp.where(m_fin & y_wrap, next_pl, st["c_pl"])
        all_done = m_fin & y_wrap & (next_pl >= 3)
        st["phase"] = jnp.where(all_done, PART, st["phase"])
        st["c_init"] = jnp.where(m_fin & ~all_done, 1, st["c_init"])
        st["c_done"] = jnp.where(m_fin, 0, st["c_done"])
        if inter:
            # retroactive skip for coefficient-free >=8x8 inter blocks
            # (vp9block.c:1310-1314): flag + CLIPPED skip-ctx splat;
            # the block record (emitted below) carries the final skip
            st["b_anycoef"] = jnp.where(m_fin & (ret > 0), 1,
                                        st["b_anycoef"])
            w4r = jnp.minimum(cols - bc, bwh[1, jnp.clip(bs, 0, 12), 0])
            h4r = jnp.minimum(rows - br, bwh[1, jnp.clip(bs, 0, 12), 1])
            retro = all_done & (st["b_intra"] == 0) & (bs <= 9) \
                & (st["b_anycoef"] == 0)
            onev_ = jnp.ones((S,), jnp.int32)
            st["b_skip"] = jnp.where(retro, 1, st["b_skip"])
            st["a_skip"] = splat1(st["a_skip"], bc, onev_, w4r, retro)
            st["l_skip"] = splat1(st["l_skip"], row7, onev_, h4r,
                                  retro)
            emit_rec = emit_rec | (all_done & (st["b_intra"] == 0))

            # ===== deferred non-keyframe SET_CTXS + grid write-back
            # (vp9block.c:682-801) for lanes whose mode bundle became
            # final this quantum =====
            # runs under a real branch: a block finalizes once per
            # ~20 quanta, and this section is scatter-heavy
            _CXW = ("a_intra", "a_comp", "a_mode", "l_intra", "l_comp",
                    "l_mode", "a_ref", "l_ref", "a_filter", "l_filter",
                    "a_mv", "l_mv", "g_mv", "g_ref")
            st_outer2 = st

            def _ctx_section(sub):
                st = dict(st_outer2)
                st.update(sub)
                dcx = do_ctx_nonkf
                brf, bcf = st["b_r"], st["b_c"]
                bsf = st["b_bs"]
                row7f = brf & 7
                nwf = bwh[1, jnp.clip(bsf, 0, 12), 0]
                nhf = bwh[1, jnp.clip(bsf, 0, 12), 1]
                w4cf = jnp.minimum(cols - bcf, nwf)
                h4cf = jnp.minimum(rows - brf, nhf)
                dcx = do_ctx_nonkf
                bi_ = st["b_intra"]
                bcm = st["b_comp"]
                mode3v = st["b_modes"][:, 3]
                st["a_intra"] = splat1(st["a_intra"], bcf, bi_, nwf, dcx)
                st["a_comp"] = splat1(st["a_comp"], bcf, bcm, nwf, dcx)
                st["a_mode"] = splat1(st["a_mode"], bcf, mode3v, nwf, dcx)
                st["l_intra"] = splat1(st["l_intra"], row7f, bi_, nhf, dcx)
                st["l_comp"] = splat1(st["l_comp"], row7f, bcm, nhf, dcx)
                st["l_mode"] = splat1(st["l_mode"], row7f, mode3v, nhf,
                                      dcx)
                vidx = sbias[jnp.clip(varref0, 0, 2)]
                vref = jnp.where(bcm == 1,
                                 st["b_ref"][lane, jnp.clip(vidx, 0, 1)],
                                 st["b_ref"][:, 0])
                m_refctx = dcx & (bi_ == 0)
                st["a_ref"] = splat1(st["a_ref"], bcf, vref, nwf, m_refctx)
                st["l_ref"] = splat1(st["l_ref"], row7f, vref, nhf,
                                     m_refctx)
                m_fctx = m_refctx & (filtermode == 4)
                st["a_filter"] = splat1(st["a_filter"], bcf,
                                        st["b_filterid"], nwf, m_fctx)
                st["l_filter"] = splat1(st["l_filter"], row7f,
                                        st["b_filterid"], nhf, m_fctx)
                # mv ctx (vp9block.c:770-800); intra positions never read
                # (their grid refs are -1 and never match a candidate)
                mv3 = st["b_mv"][:, 3]
                mv1_ = st["b_mv"][:, 1]
                mv2_ = st["b_mv"][:, 2]
                sub8f = bsf > 9
                m_mvctx = dcx & (bi_ == 0)
                amvc = st["a_mv"]
                lmvc = st["l_mv"]
                m_splmv = m_mvctx & ~sub8f
                k16 = jnp.arange(16)[None, :]
                oks = m_splmv[:, None] & (k16 < (2 * w4cf)[:, None])
                tgt = jnp.where(oks, 2 * bcf[:, None] + k16, big)
                amvc = amvc.at[lane[:, None], tgt].set(
                    jnp.broadcast_to(mv3[:, None], (S, 16, 2, 2)),
                    mode="drop")
                okl = m_splmv[:, None] & (k16 < (2 * h4cf)[:, None])
                tgtl = jnp.where(okl, 2 * row7f[:, None] + k16, big)
                lmvc = lmvc.at[lane[:, None], tgtl].set(
                    jnp.broadcast_to(mv3[:, None], (S, 16, 2, 2)),
                    mode="drop")
                m_s8 = m_mvctx & sub8f
                lmvc = lmvc.at[lane, jnp.where(m_s8, 2 * row7f, big)].set(
                    mv1_, mode="drop")
                lmvc = lmvc.at[lane,
                               jnp.where(m_s8, 2 * row7f + 1, big)].set(
                    mv3, mode="drop")
                amvc = amvc.at[lane, jnp.where(m_s8, 2 * bcf, big)].set(
                    mv2_, mode="drop")
                amvc = amvc.at[lane,
                               jnp.where(m_s8, 2 * bcf + 1, big)].set(
                    mv3, mode="drop")
                st["a_mv"] = amvc
                st["l_mv"] = lmvc
                # frame MV/ref grids over the clipped block area
                kyy = jnp.arange(8)[None, :, None]
                kxx = jnp.arange(8)[None, None, :]
                okgw = dcx[:, None, None] & (kyy < h4cf[:, None, None]) \
                    & (kxx < w4cf[:, None, None])
                gidx = jnp.where(okgw,
                                 (brf[:, None, None] + kyy) * cols
                                 + bcf[:, None, None] + kxx, big)
                r0g = jnp.where(bi_ == 1, -1, st["b_ref"][:, 0])
                r1g = jnp.where((bi_ == 0) & (bcm == 1),
                                st["b_ref"][:, 1], -1)
                gref_ = st["g_ref"]
                gref_ = gref_.at[gidx, 0].set(
                    jnp.broadcast_to(r0g[:, None, None], (S, 8, 8)),
                    mode="drop")
                gref_ = gref_.at[gidx, 1].set(
                    jnp.broadcast_to(r1g[:, None, None], (S, 8, 8)),
                    mode="drop")
                st["g_ref"] = gref_
                m_mv0 = dcx & (bi_ == 0)
                g0idx = jnp.where(m_mv0[:, None, None], gidx, big)
                gmv_o = st["g_mv"]
                gmv_o = gmv_o.at[g0idx, 0].set(
                    jnp.broadcast_to(mv3[:, None, None, 0], (S, 8, 8, 2)),
                    mode="drop")
                m_mv1 = m_mv0 & (bcm == 1)
                g1idx = jnp.where(m_mv1[:, None, None], gidx, big)
                gmv_o = gmv_o.at[g1idx, 1].set(
                    jnp.broadcast_to(mv3[:, None, None, 1], (S, 8, 8, 2)),
                    mode="drop")
                st["g_mv"] = gmv_o
                return {kk: st[kk] for kk in _CXW}

            st.update(jax.lax.cond(
                jnp.any(do_ctx_nonkf), _ctx_section, lambda sub: sub,
                {kk: st[kk] for kk in _CXW}))

        # ===== emit finished block records (native 34-col layout) ====
        if inter:
            intra_v = st["b_intra"]
            comp_v = st["b_comp"]
            ref0v = st["b_ref"][:, 0]
            ref1v = st["b_ref"][:, 1]
            filtv = st["b_filter"]
            mvflat = st["b_mv"].reshape(S, 16)
        else:
            onevr = jnp.ones((S,), jnp.int32)
            zvr = jnp.zeros((S,), jnp.int32)
            intra_v, comp_v, ref0v, ref1v, filtv = \
                onevr, zvr, zvr, zvr, zvr
            mvflat = jnp.zeros((S, 16), jnp.int32)
        def _emit_section(sub):
            blocks_, nblk_, err_ = sub
            recf = jnp.concatenate([
                jnp.stack([st["b_r"], st["b_c"], c0l, st["b_bs"],
                           st["b_seg"], st["b_skip"], intra_v,
                           st["b_tx"], st["b_uvtx"]], 1),
                st["b_modes"],
                jnp.stack([st["b_uvmode"], comp_v, ref0v, ref1v,
                           filtv], 1),
                mvflat], axis=1)
            bi2 = jnp.where(emit_rec, nblk_, big)
            blocks_ = blocks_.at[
                lane, jnp.clip(bi2, 0, bmax - 1)].set(
                jnp.where(emit_rec[:, None] & (bi2 < bmax)[:, None],
                          recf,
                          blocks_[lane, jnp.clip(bi2, 0, bmax - 1)]))
            nblk_ = jnp.where(emit_rec, nblk_ + 1, nblk_)
            err_ = err_ | jnp.where(emit_rec & (bi2 >= bmax), 1, 0)
            return (blocks_, nblk_, err_)

        st["blocks"], st["nblk"], st["err"] = jax.lax.cond(
            jnp.any(emit_rec), _emit_section, lambda sub: sub,
            (st["blocks"], st["nblk"], st["err"]))

        st["rac"] = rac
        return st

    def cond(st):
        return jnp.any(st["phase"] != DONE) & (jnp.max(st["err"]) == 0)

    final = jax.lax.while_loop(cond, body, state)
    return (final["blocks"], final["nblk"], final["cpairs"],
            final["ncp"], final["epairs"], final["nep"], final["cnts"],
            final["err"])
