"""On-device pass A: the FULL keyframe block-syntax walk, S tile
streams in lockstep.

Extends the multi-stream bool/coefficient machinery (ops/rac_pallas.py)
from single transform blocks to the complete intra-frame tile decode:
partition quadtree, segment id, skip, tx size, the context-coupled
keyframe intra mode trees, uv mode, and every coefficient block with
live nnz-context maintenance — so one keyframe/intra-only vector's
pass A runs entirely on the device, bit-exact against the host
decoders (tests/test_passa_device.py).

Formulation: one `lax.while_loop` whose body executes ONE bounded
quantum per lane according to a per-lane phase machine —

  PART  one partition-tree node: decode the partition symbol (full
        tree / edge-forced single bit / forced split,
        vp9.c:1115-1193) or emit the node's next child/leaf block;
  MODE  the whole mode bundle of one block (seg id, skip, tx ladder,
        the 4-slot KF y-mode trees with above/left mode-context
        coupling, uv mode, SET_CTXS splats — vp9block.c:80-330,744);
  COEF  one scan position of the current transform block (the token
        cascade of vp9block.c:805-923), with transform-block and
        plane transitions (nnz merge/splat, per-4x4-mode tx type
        selection — the decode_coeffs walk) folded into the quantum.

Every lane is an independent VP9 tile bool stream (vp9.c:1342), so the
per-symbol scalar ops become [S]-vector ops; divergence (different
block sizes, different coefficient counts) is handled by predication,
and the loop runs until every lane's tile is drained.

This is the jnp/XLA instantiation of the lockstep design: it jits on
CPU and TPU as-is (gathers, scatters, while_loop). The Pallas kernel
in rac_pallas.py remains the hand-tiled fast path for the coefficient
inner loop; KERNEL_BENCH.json records the measured symbols/s of this
full walk vs the native C decoder and the resulting crossover.

Reference: /root/reference/libavcodec/vp9block.c:80-923 (decode_mode /
decode_coeffs / decode_block), vp9.c:1115-1193 (decode_sb),
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
PART, MODE, COEF, DONE = 0, 1, 2, 3

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
    """Run the full keyframe pass A on device. Returns numpy outputs:
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
        seg=meta["seg"],
        txfmmode=meta["txfmmode"], lossless=meta["lossless"],
        bpp=meta["bpp"], ss_h=meta["ss_h"], ss_v=meta["ss_v"],
        bmax=bmax, cmax=cmax, emax=emax, maxc=maxc,
        want_counts=meta.get("want_counts", 0))
    return [np.asarray(o) for o in out]


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


@partial(jax.jit, static_argnames=("seg", "txfmmode",
                                   "lossless", "bpp", "ss_h", "ss_v",
                                   "bmax", "cmax", "emax", "maxc",
                                   "want_counts"))
def _decode_jit(half16, rac0, bounds, skipp, tx8p, tx16p, tx32p,
                coef11, qmul, skipseg, segprob, scans, nbs,
                rows, cols, sb_cols,
                seg, txfmmode, lossless, bpp, ss_h, ss_v,
                bmax, cmax, emax, maxc=MAXC, want_counts=0):
    S = bounds.shape[0]
    lane = jnp.arange(S)
    big = jnp.int32(1 << 20)
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
        # above ctx (frame-absolute col indexing, per lane)
        a_part=jnp.zeros((S, maxc + 8), jnp.int32),
        a_skip=jnp.zeros((S, maxc + 8), jnp.int32),
        a_txfm=jnp.zeros((S, maxc + 8), jnp.int32),
        a_mode=jnp.full((S, 2 * maxc + 16), 2, jnp.int32),  # DC_PRED
        a_ynnz=jnp.zeros((S, 2 * maxc + 16), jnp.int32),
        a_unnz=jnp.zeros((S, 2, 2 * maxc + 16), jnp.int32),
        # left ctx (per SB row)
        l_part=jnp.zeros((S, 8), jnp.int32),
        l_skip=jnp.zeros((S, 8), jnp.int32),
        l_txfm=jnp.zeros((S, 8), jnp.int32),
        l_mode=jnp.full((S, 16), 2, jnp.int32),             # DC_PRED
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
        # outputs
        blocks=jnp.zeros((S, bmax, 12), jnp.int32),
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
        pp = kf_part[jnp.clip(t_bl, 0, 3), pctx]       # [S, 3]
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
        st["l_mode"] = jnp.where((root_done & wrap)[:, None], 2,
                                 st["l_mode"])   # DC_PRED (keyframe)
        st["l_ynnz"] = jnp.where((root_done & wrap)[:, None], 0,
                                 st["l_ynnz"])
        st["l_unnz"] = jnp.where((root_done & wrap)[:, None, None], 0,
                                 st["l_unnz"])

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

        # --- seg id ---
        if seg:
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
        # intra blocks: tx coded when (intra or !skip) — keyframe is
        # all intra, so tx is coded whenever switchable
        sel_tx = mm & (txfmmode == 4)
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

        # --- keyframe y modes (context-coupled trees) ---
        a0i, a1i = bc * 2, bc * 2 + 1
        l0i, l1i = (row7) * 2, (row7) * 2 + 1
        # bs indexing: larger index = smaller block (BS_8x8 == 9);
        # the 4-slot per-4x4-mode path is for SUB-8x8 blocks
        # (vp9block.c decode_mode_kf: b->bs > BS_8x8)
        big_bs = bs > 9      # sub-8x8: per-4x4 mode slots

        def ymode_slot(rac, msel, a_idx, l_from_a, l_idx):
            av = getcol(st["a_mode"], a_idx)
            lv = l_from_a if l_from_a is not None \
                else getcol(st["l_mode"], l_idx)
            probs = kf_ym[jnp.clip(av, 0, 9), jnp.clip(lv, 0, 9)]
            return _rac_tree(rac, half16, _MTREE, _MDEPTH, probs, msel)

        m_big = mm & big_bs
        # slot 0: probs[a[a0]][l[l0]]
        rac, md0 = ymode_slot(rac, m_big, a0i, None, l0i)
        st["a_mode"] = setrow(st["a_mode"], a0i, md0[:, None], z0 + 1,
                              m_big)
        # slot 1 (bs != BS_8x4): probs[a[a1]][mode0]
        is_8x4 = bs == 10
        is_4x8 = bs == 11
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

        # --- emit block record ---
        rec = jnp.stack([br, bc, bs, seg_id, b_skip, b_tx, mode0,
                         mode1, mode2, mode3, uvmode, uvtx], 1)
        bi = jnp.where(mm, st["nblk"], big)
        st["blocks"] = st["blocks"].at[lane, jnp.clip(bi, 0, bmax - 1)] \
            .set(jnp.where(mm[:, None] & (bi < bmax)[:, None], rec,
                           st["blocks"][lane,
                                        jnp.clip(bi, 0, bmax - 1)]))
        st["nblk"] = jnp.where(mm, st["nblk"] + 1, st["nblk"])
        st["err"] = st["err"] | jnp.where(mm & (bi >= bmax), 1, 0)

        # --- skip: zero nnz ctx and go back to PART; else COEF ---
        m_sk = mm & (b_skip == 1)
        zt = jnp.zeros((S,), jnp.int32)
        st["a_ynnz"] = splat1(st["a_ynnz"], bc * 2, zt, bw4 * 2, m_sk,
                              width=16)
        st["l_ynnz"] = splat1(st["l_ynnz"], row7 * 2, zt, bh4 * 2,
                              m_sk, width=16)
        au0 = bc * 2 >> ss_h
        lu0 = row7 * 2 >> ss_v
        for pl in range(2):
            st["a_unnz"] = st["a_unnz"].at[:, pl].set(
                splat1(st["a_unnz"][:, pl], au0, zt,
                       (bw4 * 2) >> ss_h, m_sk, width=16))
            st["l_unnz"] = st["l_unnz"].at[:, pl].set(
                splat1(st["l_unnz"][:, pl], lu0, zt,
                       (bh4 * 2) >> ss_v, m_sk, width=16))
        st["phase"] = jnp.where(m_sk, PART,
                                jnp.where(mm, COEF, st["phase"]))
        st["c_pl"] = jnp.where(mm, 0, st["c_pl"])
        st["c_x"] = jnp.where(mm, 0, st["c_x"])
        st["c_y"] = jnp.where(mm, 0, st["c_y"])
        st["c_init"] = jnp.where(mm, 1, st["c_init"])
        st["c_modeidx"] = jnp.where(mm, 0, st["c_modeidx"])

        # ============ COEF quantum ============
        phase = st["phase"]
        mc = (phase == COEF) & ~mm & ~emit_block
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
        txtp = jnp.where(is_y, itx_t[jnp.clip(mode_i, 0, 9)], 0)
        scfg = (4 * lossless + tx_p) * 4 + txtp
        band = bands_t[jnp.clip(tx_p, 0, 3), jnp.clip(i, 0, 1023)]
        ctx = st["c_nnz"]
        prow_idx = tx_p * 2 + (1 - is_y.astype(jnp.int32))
        tp = coef11[jnp.clip(prow_idx, 0, 7),
                    jnp.clip(band * 6 + ctx, 0, 35)]    # [S, 11]

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
                     + (1 - is_y.astype(jnp.int32))) * 2  # is_inter=0
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

        st["rac"] = rac
        return st

    def cond(st):
        return jnp.any(st["phase"] != DONE) & (jnp.max(st["err"]) == 0)

    final = jax.lax.while_loop(cond, body, state)
    return (final["blocks"], final["nblk"], final["cpairs"],
            final["ncp"], final["epairs"], final["nep"], final["cnts"],
            final["err"])
