"""Full-frame tile-column-sharded pass-B decode over a device mesh.

One jitted, shard_map-sharded step takes a real frame's pass-A tensors
and produces the FINAL filtered frame: each "tile" shard reconstructs
its tile-column stripe with the production kernels (batched inverse
transforms, per-cell 8-tap MC against replicated reference planes, and
the per-stripe intra wavefront — VP9 intra prediction never crosses a
tile column, so the stripe-local wavefront is exact), then the loop
filter — which DOES cross tile columns (reference: the frame-wide
serialized filter at vp9.c:1441-1552) — runs as a distributed wavefront:
the recorded edge-call schedule is replayed in its exact serial-order
wave structure with an 8-pixel column halo exchanged over ICI
(`jax.lax.ppermute`) after every wave step, in both directions (the
boundary vertical edges write up to 7 px into the left neighbour's
stripe, and the left stripe's next-row horizontal edges read those
pixels back).

Stripes follow the bitstream's real tile columns (`_tile_offset`,
vp9.c:1244-1250), padded to a common width for SPMD; the real tile
start offset is folded into the MV grid so MC gathers hit absolute
reference coordinates. The "gop" mesh axis runs independent frames
data-parallel (GOP sharding across hosts).

Wave-safety argument (why per-step halo exchange is exact): records on
one wave (2*sb_row + sb_col constant, lpf_tpu.pack_schedule) never
read or write the same pixels, including across a tile boundary —
same-wave superblocks in adjacent tile columns would need
2r' + c - 1 == 2r + c, which has no integer solution — so a step's
writes on the two sides of a boundary are disjoint and can be merged
by value comparison against the pre-step state.
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..ops import recon_tpu
from ..ops.lpf_tpu import filter_lanes_jnp
from ..utils.metrics import metrics

HALO = 8


# ---------------------------------------------------------------------------
# loop-filter edge recording (pure-Python fallback; mirrors
# native/vp9_lpf.c record mode so the driver dryrun needs no native lib)


class _Tag:
    pass


def record_lf_python(s):
    """Record the exact loop-filter edge-call sequence by driving the
    golden mask walker (ops/lpf.py) with a recording sink instead of
    the pixel filter. Returns (y_rec, ny, uv_rec, nuv): int16 [n, 8]
    rows (sb, py, px, dir, wd, E, I, H), 16-lane compound calls
    decomposed into their 8-lane halves — the same stream
    lpf_record_native emits (reference order: ff_vp9_loopfilter_sb,
    vp9lpf.c:183-230)."""
    from ..ops import lpf
    h = s.header
    y_recs, uv_recs = [], []
    ytag, utag, vtag = _Tag(), _Tag(), _Tag()
    cur_sb = [0]

    def rec(plane, py, px, dir_, wd, E, I, H, bpp, nlanes=8):
        if plane is vtag:
            return
        sink = y_recs if plane is ytag else uv_recs
        sink.append((cur_sb[0], py, px, dir_, wd, E, I, H))
        if nlanes == 16:
            if dir_ == 0:
                sink.append((cur_sb[0], py + 8, px, dir_, wd, E, I, H))
            else:
                sink.append((cur_sb[0], py, px + 8, dir_, wd, E, I, H))

    planes = [ytag, utag, vtag]
    for sbr in range(s.sb_rows):
        for sbc in range(s.sb_cols):
            cur_sb[0] = sbr * s.sb_cols + sbc
            lpf.loopfilter_sb(planes, s.lf_level[sbr, sbc],
                              s.lf_mask[sbr, sbc], sbr * 8, sbc * 8,
                              h.ss_h, h.ss_v, s.lim_lut, s.mblim_lut,
                              h.bpp, apply=rec)
    y = np.asarray(y_recs, np.int16).reshape(-1, 8)
    uv = np.asarray(uv_recs, np.int16).reshape(-1, 8)
    return y, len(y), uv, len(uv)


def record_lf(s):
    """Native recorder when available, Python fallback otherwise."""
    if getattr(s, "use_native", False):
        try:
            from ..passa_native import lpf_record_native
            return lpf_record_native(s)
        except Exception as e:  # any native failure (missing .so,
            # stale ctypes mirror, ...) falls back to the Python
            # recorder rather than killing the sharded decode
            import warnings
            warnings.warn(f"native LF recorder failed ({e!r}); "
                          "using Python recorder")
    return record_lf_python(s)


# ---------------------------------------------------------------------------
# per-tile schedule packing with GLOBAL wave/substep alignment


def pack_schedule_tiles(recs, n, sb_cols, tile_sb, x0_px, ss_h=0):
    """Split a recorded edge stream into per-tile step grids that share
    one global (wave, substep) numbering, so the sharded scan advances
    all tiles in lockstep and halo exchanges line up.

    recs: [n, 8] int16 (sb, py, px, dir, wd, E, I, H) in serial order.
    tile_sb: [ntile+1] tile SB-column boundaries. x0_px: [ntile] stripe
    pixel offsets in THIS plane's coordinates (Y or chroma). Returns
    [ntile, S, D, 7] int32 with px localized to stripe+HALO."""
    ntile = len(tile_sb) - 1
    if n == 0:
        return np.zeros((ntile, 64, 1, 7), np.int32)
    r = recs[:n].astype(np.int32)
    sb = r[:, 0]
    sbr = sb // sb_cols
    sbc = sb % sb_cols
    wave = 2 * sbr + sbc
    order = np.arange(n, dtype=np.int64)
    change = np.empty(n, bool)
    change[0] = True
    change[1:] = sb[1:] != sb[:-1]
    group_start = np.maximum.accumulate(np.where(change, order, 0))
    sub = order - group_start
    nwaves = int(wave.max()) + 1
    max_sub = np.zeros(nwaves, np.int64)
    np.maximum.at(max_sub, wave, sub + 1)
    base = np.zeros(nwaves, np.int64)
    base[1:] = np.cumsum(max_sub)[:-1]
    S = int(np.cumsum(max_sub)[-1])
    lane = sbr
    D = int(lane.max()) + 1
    tile = np.searchsorted(np.asarray(tile_sb[1:]), sbc, side="right")
    rows = base[wave] + sub
    steps = np.zeros((ntile, S, D, 7), np.int32)
    loc = r[:, 1:8].copy()
    loc[:, 1] = loc[:, 1] - np.asarray(x0_px)[tile] + HALO
    steps[tile, rows, lane] = loc
    S2 = 64
    while S2 < S:
        S2 *= 2
    if S2 != S:
        steps = np.concatenate(
            [steps, np.zeros((ntile, S2 - S, D, 7), np.int32)], axis=1)
    return steps


# ---------------------------------------------------------------------------
# sharded loop-filter scan (runs inside shard_map, axis "tile")


def _lf_apply_step(pl, rec, bpp):
    """One wave step of lpf_tpu._lf_scan, factored for reuse here.
    pl: [B, H, W]; rec: [D, 7]."""
    B = pl.shape[0]
    r8 = jnp.arange(8)
    r16 = jnp.arange(16)
    py, px, dr, wd, E, I, Ht = (rec[:, i] for i in range(7))
    rows0 = py[:, None] + r8[None, :]
    cols0 = px[:, None] + (r16 - 8)[None, :]
    w0 = pl[:, rows0[:, :, None], cols0[:, None, :]]
    rows1 = py[:, None] + (r16 - 8)[None, :]
    cols1 = px[:, None] + r8[None, :]
    w1 = pl[:, rows1[:, :, None], cols1[:, None, :]]
    w1t = jnp.swapaxes(w1, -1, -2)
    win = jnp.where((dr == 0)[None, :, None, None], w0, w1t)
    D = py.shape[0]
    filt = filter_lanes_jnp(win.reshape(B * D, 8, 16),
                            jnp.tile(E, B), jnp.tile(I, B),
                            jnp.tile(Ht, B), jnp.tile(wd, B), bpp)
    filt = filt.reshape(B, D, 8, 16)
    lo = jnp.where(wd >= 16, 1, jnp.where(wd >= 8, 5, 6))
    hi = jnp.where(wd >= 16, 15, jnp.where(wd >= 8, 11, 10))
    wmask = ((r16[None, :] >= lo[:, None])
             & (r16[None, :] < hi[:, None])
             & (wd > 0)[:, None])
    outw = jnp.where(wmask[None, :, None, :], filt, win)
    big = jnp.int32(1 << 20)
    srows0 = jnp.where((wd > 0) & (dr == 0), py, big)[:, None] \
        + r8[None, :]
    pl = pl.at[:, srows0[:, :, None], cols0[:, None, :]].set(
        outw, mode="drop")
    srows1 = jnp.where((wd > 0) & (dr == 1), py, big)[:, None] \
        + (r16 - 8)[None, :]
    pl = pl.at[:, srows1[:, :, None], cols1[:, None, :]].set(
        jnp.swapaxes(outw, -1, -2), mode="drop")
    return pl


def _lf_scan_sharded(pl, steps, wreal, ntile, bpp):
    """Distributed LF wavefront. pl: [B, H, HALO+Wpad] stripe buffer
    (cols 0..HALO hold a synced copy of the left neighbour's last HALO
    real columns). steps: [S, D, 7] this stripe's records, px local.
    wreal: traced scalar — this stripe's real width (own last-HALO
    columns live at cols wreal..wreal+HALO). After every wave step the
    boundary strips are exchanged both ways over ICI and merged by
    comparison against the pre-step state (wave-disjointness makes the
    merge exact; see module docstring)."""
    B, H = pl.shape[0], pl.shape[1]
    fwd = [(i, i + 1) for i in range(ntile - 1)]
    bwd = [(i + 1, i) for i in range(ntile - 1)]
    idx = jax.lax.axis_index("tile")
    not_first = idx > 0
    not_last = idx < ntile - 1

    def tail(p):
        return jax.lax.dynamic_slice(p, (0, 0, wreal), (B, H, HALO))

    if ntile > 1:
        halo0 = jax.lax.ppermute(tail(pl), "tile", fwd)
        pl = pl.at[:, :, :HALO].set(
            jnp.where(not_first, halo0, pl[:, :, :HALO]))

    def body(pl, rec):
        old_tail = tail(pl)
        old_halo = pl[:, :, :HALO]
        pl = _lf_apply_step(pl, rec, bpp)
        if ntile > 1:
            new_tail = tail(pl)
            new_halo = pl[:, :, :HALO]
            recv_tail = jax.lax.ppermute(new_tail, "tile", fwd)
            recv_halo = jax.lax.ppermute(new_halo, "tile", bwd)
            halo_m = jnp.where(not_first & (recv_tail != old_halo),
                               recv_tail, new_halo)
            tail_m = jnp.where(not_last & (recv_halo != old_tail),
                               recv_halo, new_tail)
            pl = jax.lax.dynamic_update_slice(pl, tail_m, (0, 0, wreal))
            pl = pl.at[:, :, :HALO].set(halo_m)
        return pl, None

    pl, _ = jax.lax.scan(body, pl, steps)
    return pl


# ---------------------------------------------------------------------------
# host-side input builder


def _tile_bounds(s):
    from ..codecs.vp9.decoder import _tile_offset
    h = s.header
    bounds = [0]
    for i in range(h.tile_cols):
        _c0, c1 = _tile_offset(i, h.log2_tile_cols, s.sb_cols)
        bounds.append(c1 // 8)  # SB units
    return bounds


def _dense_coef(s):
    """Dense coefficient planes + eob grids as numpy, from whichever
    representation pass A produced (dense host planes, or the native
    emit-mode (pos,value) pair stream)."""
    if getattr(s, "coef_pairs", None) is not None:
        merged = recon_tpu._merged_from_pairs(s)
        if merged is not None:
            cp_m, ep_m, geoms = merged
            scat = recon_tpu._scatter_pairs32 if cp_m.shape[1] == 4 \
                else recon_tpu._scatter_pairs16
            Lc = sum(sh[0] * sh[1] for sh, _e, _b, _eb in geoms)
            Le = sum(e[0] * e[1] for _sh, e, _b, _eb in geoms)
            flat_c = scat(jnp.asarray(cp_m), 1, Lc)
            flat_e = recon_tpu._scatter_pairs16(jnp.asarray(ep_m), 1, Le)
            out = []
            for p in range(3):
                sh, esh, bc, be = geoms[p]
                c, e = recon_tpu._slice_plane(flat_c, flat_e, bc, be,
                                              sh[0], sh[1], esh[0],
                                              esh[1])
                out.append((np.asarray(c), np.asarray(e)))
            return out
    return [(np.asarray(s.coef_y, np.int32), np.asarray(s.eob_y)),
            (np.asarray(s.coef_u, np.int32), np.asarray(s.eob_u)),
            (np.asarray(s.coef_v, np.int32), np.asarray(s.eob_v))]


def _split_levels(levels, x0, x1):
    """Stripe-local view of a frame-wide intra schedule: keep entries
    with px in [x0, x1) (plane pixels), px rebased. Level indices are
    preserved (a superset ordering stays valid)."""
    out = []
    for lvl in levels:
        d = {}
        for sz, ents in lvl.items():
            e = np.asarray(ents, np.int32).reshape(-1, 8)
            m = (e[:, 1] >= x0) & (e[:, 1] < x1)
            if m.any():
                e2 = e[m].astype(np.int16).copy()
                e2[:, 1] -= x0
                d[sz] = e2
        out.append(d)
    return out


def _pack_slabs_tiles(levels_per_tile, Hp, Wpad, unify=None):
    """pack_intra_slab across stripes with COMMON (L, sizes, caps) so
    one executable serves every shard. Returns (slabs [ntile, tot, 8],
    L, sizes, caps) or None if no stripe has intra blocks."""
    L = max((len(lv) for lv in levels_per_tile), default=0)
    maxn = {}
    for lvls in levels_per_tile:
        for lvl in lvls:
            for sz, e in lvl.items():
                maxn[sz] = max(maxn.get(sz, 0), len(e))
    if unify is not None:
        L = max(L, unify[0])
        for sz, n in unify[1].items():
            maxn[sz] = max(maxn.get(sz, 0), n)
    if not maxn or L == 0:
        return None
    sizes = tuple(sorted(maxn))
    caps = tuple(recon_tpu._pad_to_bucket(maxn[sz], base=8, mult=2)
                 for sz in sizes)
    tot = recon_tpu._pad_to_bucket(L * sum(caps), base=64, mult=2)
    ntile = len(levels_per_tile)
    slabs = np.zeros((ntile, tot, 8), np.int16)
    slabs[:, :, 0] = Hp + 64
    slabs[:, :, 1] = Wpad + 64
    slabs[:, :, 2] = 2
    slabs[:, :, 6:8] = 1
    for t, lvls in enumerate(levels_per_tile):
        b = 0
        for sz, cap in zip(sizes, caps):
            for i, lvl in enumerate(lvls):
                e = lvl.get(sz)
                if e is not None and len(e):
                    o = b + i * cap
                    slabs[t, o:o + len(e)] = e
            b += L * cap
    return slabs, L, sizes, caps


def frame_tensors(s):
    """Everything the sharded step needs, as numpy, stacked [ntile, ...]
    per stripe. Scaled references ride as the mixed MC dispatch
    inputs; only invalid-scale refs (the serial golden-fallback class)
    raise."""
    h = s.header
    mvsc = getattr(s, "mvscale", None)
    if mvsc is not None and any(sc[0] == -1 for sc in mvsc):
        # same contract as the serial path: invalid-scale refs (>2x /
        # >16x off) golden-fallback (vp9recon.c:661-669)
        raise ValueError("sharded path: invalid-scale refs unsupported")
    has_scaled = mvsc is not None and any(sc[0] != 0 for sc in mvsc)
    bounds = _tile_bounds(s)  # SB units
    ntile = len(bounds) - 1
    ss_h, ss_v = h.ss_h, h.ss_v
    Hy, Wy = s.sb_rows * 64, s.sb_cols * 64
    Hu, Wu = Hy >> ss_v, Wy >> ss_h
    r4, c4 = Hy // 4, Wy // 4

    x0 = np.asarray([b * 64 for b in bounds[:-1]], np.int32)
    x1 = np.asarray([b * 64 for b in bounds[1:]], np.int32)
    wreal = x1 - x0
    Wpad = int(wreal.max())
    x0u, wrealu = x0 >> ss_h, wreal >> ss_h
    Wpadu = Wpad >> ss_h

    # dense metadata grids from the block records (device splat, then
    # host views — this path trades a d2h for simplicity; it runs on
    # the CPU mesh and in the precompute stage, not per-frame on TPU)
    recs = getattr(s, "pre", None)
    recs = recs.get("recs") if recs else None
    if recs is None:
        recs = recon_tpu._pack_records(s)
    grids = recon_tpu._grids_from_records(jnp.asarray(recs), r4, c4,
                                          ss_h, ss_v)
    (inter4, txsz4, txtype4, comp4, filt4, refsel, mv16, inter4uv,
     uvtx4, txtypeuv, compuv, filtuv, refseluv, uvmv) = \
        [np.asarray(g) for g in grids]
    coefs = _dense_coef(s)

    def stack_y(a, unit):
        """[ntile, ...] stripe-stacked view of a Y-plane-shaped array;
        unit = pixels per array cell (1 px, 4 cells, etc.)."""
        out = np.zeros((ntile, a.shape[0], Wpad // unit) + a.shape[2:],
                       a.dtype)
        for t in range(ntile):
            w = wreal[t] // unit
            out[t, :, :w] = a[:, x0[t] // unit:x1[t] // unit]
        return out

    def stack_u(a, unit):
        out = np.zeros((ntile, a.shape[0], Wpadu // unit) + a.shape[2:],
                       a.dtype)
        for t in range(ntile):
            w = wrealu[t] // unit
            s0 = x0u[t] // unit
            out[t, :, :w] = a[:, s0:s0 + w]
        return out

    t = {
        "ycoef": stack_y(coefs[0][0], 1), "yeob": stack_y(coefs[0][1], 4),
        "ytxsz": stack_y(txsz4.astype(np.int32), 4),
        "ytxtype": stack_y(txtype4.astype(np.int32), 4),
        "yinter": stack_y(inter4.astype(np.int32), 4),
        "ycomp": stack_y(comp4.astype(np.int32), 4),
        "yfilt": stack_y(filt4.astype(np.int32), 4),
        "yrefsel": stack_y(refsel.astype(np.int32), 4),
        "ymv": stack_y(mv16.astype(np.int32), 4),
        "ucoef": stack_u(coefs[1][0], 1), "ueob": stack_u(coefs[1][1], 4),
        "vcoef": stack_u(coefs[2][0], 1), "veob": stack_u(coefs[2][1], 4),
        "uvtxsz": stack_u(uvtx4.astype(np.int32), 4),
        "uvtxtype": stack_u(txtypeuv.astype(np.int32), 4),
        "uvinter": stack_u(inter4uv.astype(np.int32), 4),
        "uvcomp": stack_u(compuv.astype(np.int32), 4),
        "uvfilt": stack_u(filtuv.astype(np.int32), 4),
        "uvrefsel": stack_u(refseluv.astype(np.int32), 4),
        "uvmv": stack_u(uvmv.astype(np.int32), 4),
        "x0": x0, "x0u": x0u.astype(np.int32),
        "wreal": wreal.astype(np.int32),
        "wrealu": wrealu.astype(np.int32),
    }

    # intra schedules, split per stripe
    levels = [None, None]
    pre = getattr(s, "pre", None)
    if pre is not None and pre.get("levels") is not None:
        levels = list(pre["levels"])
    if levels[0] is None:
        levels[0] = recon_tpu._build_intra_schedule_fast(s, 0)
    if levels[1] is None:
        levels[1] = recon_tpu._build_intra_schedule_fast(s, 1)
    lv_y = [_split_levels(levels[0], int(a), int(b))
            for a, b in zip(x0, x1)]
    lv_uv = [_split_levels(levels[1], int(a), int(a + w))
             for a, w in zip(x0u, wrealu)]

    # loop-filter schedules, split per tile with global wave alignment
    yrec = uvrec = None
    if h.filter_level:
        yrec, ny, uvrec, nuv = record_lf(s)
        ysteps = pack_schedule_tiles(yrec, ny, s.sb_cols, bounds, x0)
        uvsteps = pack_schedule_tiles(uvrec, nuv, s.sb_cols, bounds, x0u)
    else:
        ysteps = np.zeros((ntile, 0, 1, 7), np.int32)
        uvsteps = np.zeros((ntile, 0, 1, 7), np.int32)
    t["ysteps"] = ysteps
    t["uvsteps"] = uvsteps

    # reference planes (inter frames): device-pad to a common stack.
    # NOTE: np.asarray(rf.dev[p]) is a full-plane d2h per ref plane —
    # fine for the CPU virtual-mesh target this path serves, but d2h
    # through the axon tunnel is 1-40 MB/s and degrades the link for
    # the rest of the process: do NOT point this path at the tunneled
    # chip without first keeping refs host-resident (or device-resident
    # end-to-end on a real multi-chip pod where d2h never happens).
    has_inter = bool(inter4.any()) and not (h.keyframe or h.intraonly)
    refs = []
    if has_inter:
        for p in range(3):
            rp = []
            for i in range(3):
                rf = s.refs[h.refidx[i]]
                arr = None
                if rf is not None:
                    if rf.dev is not None:
                        arr = np.asarray(rf.dev[p])
                    else:
                        arr = np.asarray(rf.planes[p], np.int32)
                rp.append(arr)
            z = next(a for a in rp if a is not None)
            rp = [a if a is not None else z for a in rp]
            Hm = max(a.shape[0] for a in rp)
            Wm = max(a.shape[1] for a in rp)
            stack = np.zeros((3, Hm, Wm), np.int32)
            for i, a in enumerate(rp):
                stack[i, :a.shape[0], :a.shape[1]] = a
            refs.append(stack)
    else:
        refs = [np.zeros((3, 64, 64), np.int32) for _ in range(3)]
    t["refy"], t["refu"], t["refv"] = refs

    w, hh = s.cur_frame_obj.size
    if has_scaled:
        # scaled-reference MC inputs: per-cell call anchors + parent
        # clamp geometry (absolute plane px — valid across stripes),
        # per-slot scale factors/steps and visible ref dims
        anchors = [np.asarray(a) for a in recon_tpu._scaled_anchor_grids(
            jnp.asarray(recs), r4, c4, ss_h, ss_v)]
        ay, ax, by, bx, pw, ph = anchors[:6]
        ayu, axu, byu, bxu, pwu, phu = anchors[6:]
        for k, a in (("s_ay", ay), ("s_ax", ax), ("s_by", by),
                     ("s_bx", bx), ("s_pw", pw), ("s_ph", ph)):
            t[k] = stack_y(a.astype(np.int32), 4)
        for k, a in (("s_ayu", ayu), ("s_axu", axu), ("s_byu", byu),
                     ("s_bxu", bxu), ("s_pwu", pwu), ("s_phu", phu)):
            t[k] = stack_u(a.astype(np.int32), 4)
        t["mvscales"] = np.asarray(s.mvscale, np.int32)
        t["mvsteps"] = np.asarray(s.mvstep, np.int32)
        t["scalenz"] = np.asarray(
            [1 if sc[0] != 0 else 0 for sc in s.mvscale], np.int32)
        refw_y = np.zeros(3, np.int32)
        refh_y = np.zeros(3, np.int32)
        refw_u = np.zeros(3, np.int32)
        refh_u = np.zeros(3, np.int32)
        for i in range(3):
            rf = s.refs[h.refidx[i]]
            rw, rh = rf.size if rf is not None else (w, hh)
            refw_y[i], refh_y[i] = rw, rh
            refw_u[i] = (rw + ss_h) >> ss_h
            refh_u[i] = (rh + ss_v) >> ss_v
        t["refwy"], t["refhy"] = refw_y, refh_y
        t["refwu"], t["refhu"] = refw_u, refh_u
    cfg = {
        "ntile": ntile, "bpp": h.bpp, "lossless": bool(h.lossless),
        "has_inter": has_inter, "lf": bool(h.filter_level),
        "w": w, "hh": hh,
        "wu": (w + ss_h) >> ss_h, "hhu": (hh + ss_v) >> ss_v,
        "mvsx_uv": 1 << (1 - ss_h), "mvsy_uv": 1 << (1 - ss_v),
        "Hy": Hy, "Wpad": Wpad, "Hu": Hu, "Wpadu": Wpadu,
        "has_scaled": has_scaled, "ss_h": ss_h, "ss_v": ss_v,
        "cols": s.cols, "rows": s.rows,
    }
    return t, cfg, (lv_y, lv_uv)


# ---------------------------------------------------------------------------
# the sharded step


def _stripe_plane(coef, eob4, txsz4, txtype4, inter4, comp, filt, refsel,
                  mv16, refstack, x0, w, hh, lossless, bpp, mvsx, mvsy,
                  has_inter, slab, L, sizes, caps, mc_impl="gather",
                  scaled=None):
    """Reconstruct one stripe of one plane: residual + MC + intra.
    Mirrors recon_tpu._recon_plane_inter + run_intra_plane on the
    stripe, with the stripe's pixel offset folded into the MV grid so
    reference gathers hit absolute coordinates. mc_impl="mxu" routes
    MC through the one-hot-matmul kernel with stripe-aware windows
    (ops/mc_mxu.py x0 — 3.5x the gather path on real TPUs).
    scaled: (anchors_6tuple, scales, steps, refw, refh, scale_nz,
    cols, rows, ss_x, ss_y) when the frame has scaled references —
    the mixed per-ref dispatch (vp9recon.c:503-504) in frame
    coordinates via the stripe offset x0."""
    residual = recon_tpu.residual_plane(
        coef, eob4, txsz4, txtype4, lossless, bpp).astype(jnp.int32)
    plane = jnp.zeros(coef.shape, jnp.int32)
    if has_inter:
        inter_b = inter4.astype(bool)
        if scaled is not None:
            (anch, scales, steps, refw, refh, scale_nz,
             cols, rows, ss_x, ss_y) = scaled
            mc = recon_tpu._mc_cells_mixed(
                refstack, mv16, refsel, comp.astype(bool), filt,
                *anch, scales, steps, refw, refh,
                scale_nz.astype(bool), cols, rows, bpp, mvsx, mvsy,
                ss_x, ss_y, x0=x0)
        elif mc_impl == "mxu":
            from ..ops import mc_mxu
            mv16 = mv16.at[..., 0].add(x0 * (16 // mvsx))
            mc = mc_mxu.mc_cells(refstack, mv16, refsel,
                                 comp.astype(bool), filt, inter_b,
                                 w, hh, bpp, mvsx, mvsy, x0=x0)
        else:
            mv16 = mv16.at[..., 0].add(x0 * (16 // mvsx))
            mc = recon_tpu._mc_cells(refstack, mv16, refsel,
                                     comp.astype(bool), filt, inter_b,
                                     w, hh, bpp, mvsx, mvsy)
        maxp = (1 << bpp) - 1
        mcfull = jnp.clip(mc + residual[:mc.shape[0], :mc.shape[1]],
                          0, maxp)
        mask = jnp.repeat(jnp.repeat(inter_b, 4, 0), 4, 1)
        plane = plane.at[:mc.shape[0], :mc.shape[1]].set(
            jnp.where(mask, mcfull, plane[:mc.shape[0], :mc.shape[1]]))
    if slab is not None:
        plane = recon_tpu._intra_scan(plane, residual, slab, L, sizes,
                                      caps, bpp)
    return plane


def build_sharded_step(mesh, cfg, slab_cfg, mc_impl=None):
    """Jit-compile the full sharded pass-B step for one frame geometry.
    slab_cfg: ((Ly, sizes_y, caps_y) or None, (Luv, ...) or None).
    mc_impl: "mxu"/"gather"; None = platform default (mxu on real
    TPUs, gather on the CPU virtual mesh)."""
    ntile = cfg["ntile"]
    bpp = cfg["bpp"]
    y_slab, uv_slab = slab_cfg
    if mc_impl is None:
        from ..utils.config import get_config
        mc_impl = get_config().mc_impl
    if mc_impl is None:
        mc_impl = ("mxu" if jax.devices()[0].platform != "cpu"
                   else "gather")

    sp = P("gop", "tile")
    g3 = P("gop", "tile", None, None)     # [G, T, H, W]
    g4 = P("gop", "tile", None, None, None)
    g5 = P("gop", "tile", None, None, None, None)
    rep = P("gop", None, None, None)      # refstacks
    specs = dict(
        ycoef=g3, yeob=g3, ytxsz=g3, ytxtype=g3, yinter=g3, ycomp=g3,
        yfilt=g3, yrefsel=g4, ymv=g5,
        ucoef=g3, ueob=g3, vcoef=g3, veob=g3, uvtxsz=g3, uvtxtype=g3,
        uvinter=g3, uvcomp=g3, uvfilt=g3, uvrefsel=g4, uvmv=g5,
        x0=sp, x0u=sp, wreal=sp, wrealu=sp,
        dims=P("gop", None),
        ysteps=g4, uvsteps=g4,
        yslab=g3, uvslab=g3,
        refy=rep, refu=rep, refv=rep,
    )
    if cfg["has_scaled"]:
        gp2 = P("gop", None, None)
        gp1 = P("gop", None)
        for k in ("s_ay", "s_ax", "s_by", "s_bx", "s_pw", "s_ph",
                  "s_ayu", "s_axu", "s_byu", "s_bxu", "s_pwu",
                  "s_phu"):
            specs[k] = g3
        specs.update(mvscales=gp2, mvsteps=gp2, scalenz=gp1,
                     refwy=gp1, refhy=gp1, refwu=gp1, refhu=gp1)
    names = list(specs)
    in_specs = tuple(specs[n] for n in names)
    out_specs = (P("gop", "tile", None, None),) * 3

    @partial(shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=out_specs, check_rep=False)
    def step(*args):
        a = dict(zip(names, args))

        def one(k, idx=(0, 0)):
            return a[k][idx]

        x0 = a["x0"][0, 0]
        x0u = a["x0u"][0, 0]
        wreal = a["wreal"][0, 0]
        wrealu = a["wrealu"][0, 0]
        refy = a["refy"][0]
        refu = a["refu"][0]
        refv = a["refv"][0]
        dims = a["dims"][0]
        d_w, d_hh, d_wu, d_hhu = dims[0], dims[1], dims[2], dims[3]
        d_cols, d_rows = dims[4], dims[5]

        sc_y = sc_uv = None
        if cfg["has_scaled"]:
            scales = a["mvscales"][0]
            steps = a["mvsteps"][0]
            scnz = a["scalenz"][0]
            sc_y = ((one("s_ay"), one("s_ax"), one("s_by"),
                     one("s_bx"), one("s_pw"), one("s_ph")),
                    scales, steps, a["refwy"][0], a["refhy"][0], scnz,
                    d_cols, d_rows, 0, 0)
            sc_uv = ((one("s_ayu"), one("s_axu"), one("s_byu"),
                      one("s_bxu"), one("s_pwu"), one("s_phu")),
                    scales, steps, a["refwu"][0], a["refhu"][0], scnz,
                    d_cols, d_rows, cfg["ss_h"], cfg["ss_v"])

        if y_slab is not None:
            Ly, sizes_y, caps_y = y_slab
            yslab = one("yslab")
        else:
            Ly = sizes_y = caps_y = yslab = None
        y = _stripe_plane(
            one("ycoef"), one("yeob"), one("ytxsz"), one("ytxtype"),
            one("yinter"), one("ycomp"), one("yfilt"), one("yrefsel"),
            one("ymv"), refy, x0, d_w, d_hh, cfg["lossless"],
            bpp, 2, 2, cfg["has_inter"], yslab, Ly, sizes_y, caps_y,
            mc_impl=mc_impl, scaled=sc_y)

        if uv_slab is not None:
            Luv, sizes_uv, caps_uv = uv_slab
            uvslab = one("uvslab")
        else:
            Luv = sizes_uv = caps_uv = uvslab = None
        uv_args = (one("uvtxsz"), one("uvtxtype"), one("uvinter"),
                   one("uvcomp"), one("uvfilt"), one("uvrefsel"),
                   one("uvmv"))
        u = _stripe_plane(
            one("ucoef"), one("ueob"), *uv_args[:2], *uv_args[2:],
            refu, x0u, d_wu, d_hhu, cfg["lossless"], bpp,
            cfg["mvsx_uv"], cfg["mvsy_uv"], cfg["has_inter"],
            uvslab, Luv, sizes_uv, caps_uv, mc_impl=mc_impl,
            scaled=sc_uv)
        v = _stripe_plane(
            one("vcoef"), one("veob"), *uv_args[:2], *uv_args[2:],
            refv, x0u, d_wu, d_hhu, cfg["lossless"], bpp,
            cfg["mvsx_uv"], cfg["mvsy_uv"], cfg["has_inter"],
            uvslab, Luv, sizes_uv, caps_uv, mc_impl=mc_impl,
            scaled=sc_uv)

        if cfg["lf"]:
            yb = jnp.zeros((1, y.shape[0], HALO + y.shape[1]),
                           jnp.int32).at[0, :, HALO:].set(y)
            yb = _lf_scan_sharded(yb, one("ysteps"), wreal, ntile, bpp)
            y = yb[0, :, HALO:]
            uvb = jnp.zeros((2, u.shape[0], HALO + u.shape[1]),
                            jnp.int32)
            uvb = uvb.at[0, :, HALO:].set(u).at[1, :, HALO:].set(v)
            uvb = _lf_scan_sharded(uvb, one("uvsteps"), wrealu, ntile,
                                   bpp)
            u, v = uvb[0, :, HALO:], uvb[1, :, HALO:]
        return (y[None, None], u[None, None], v[None, None])

    return jax.jit(step), names


def sharded_decode_pass_b(jobs, mesh):
    """Decode pass B for `jobs` (list of FrameJob, one per gop shard)
    fully sharded over mesh axes (gop, tile): per-stripe residual + MC
    + intra, then the distributed cross-tile loop filter. Returns one
    [y, u, v] plane list (numpy, padded plane geometry) per job,
    bit-exact with the serial decode_pass_b.

    The gop axis is data-parallel. Shards may differ in frame
    geometry (dynamic-resize streams: tensors pad to the gop-wide max
    and per-frame dims ride as a dynamic tensor) and in scaled-ref
    status; show-existing shards pass their referenced frame through.
    Only bpp/lossless/subsampling/tile count must match.
    """
    gop, ntile = mesh.devices.shape
    assert len(jobs) == gop, (len(jobs), gop)
    # show-existing shards have no pass-B work: their output is the
    # referenced frame's pixels (vp9.c show_existing_frame path); an
    # active shard's tensors fill their mesh slot and the filler
    # output is discarded
    def _ready_planes(j):
        if not j.ready:
            return None      # nothing shown by this packet
        return [np.asarray(p, np.int32) for p in j.ready[0].planes]

    ready = [j.ready is not None for j in jobs]
    if all(ready):
        return [_ready_planes(j) for j in jobs]
    if any(ready):
        fill = next(j for j in jobs if j.ready is None)
        mesh_jobs = [fill if r else j for j, r in zip(jobs, ready)]
        outs = sharded_decode_pass_b(mesh_jobs, mesh)
        return [_ready_planes(j) if r else o
                for j, r, o in zip(jobs, ready, outs)]
    tensors, cfg, slab_cfg, built, reals = prepare_gop_tensors(
        jobs, ntile)

    step, names = build_sharded_step(mesh, cfg, slab_cfg)
    put = []
    for n in names:
        put.append(jax.device_put(tensors[n],
                                  NamedSharding(mesh, put_spec(n,
                                                tensors[n].ndim))))
    with metrics.timer("sharded.step"):
        y, u, v = step(*put)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), (y, u, v))

    y, u, v = np.asarray(y), np.asarray(u), np.asarray(v)
    outs = []
    for g, (t, c, _l) in enumerate(built):
        wr, wru = t["wreal"], t["wrealu"]
        Hyr, _Wr, Hur, _Wur = reals[g]   # crop gop-pad rows back off
        yp = np.concatenate(
            [y[g, i, :Hyr, :wr[i]] for i in range(ntile)], axis=1)
        up = np.concatenate(
            [u[g, i, :Hur, :wru[i]] for i in range(ntile)], axis=1)
        vp = np.concatenate(
            [v[g, i, :Hur, :wru[i]] for i in range(ntile)], axis=1)
        outs.append([yp, up, vp])
    return outs


_NON_TILED = ("refy", "refu", "refv", "mvscales", "mvsteps",
              "scalenz", "refwy", "refhy", "refwu", "refhu", "dims")


def put_spec(name, ndim):
    """PartitionSpec for one prepared gop tensor."""
    if name in _NON_TILED:
        return P("gop")
    if ndim == 2:
        return P("gop", "tile")
    return P("gop", "tile", *([None] * (ndim - 2)))


def prepare_gop_tensors(jobs, ntile):
    """Host-side preparation shared by the single-controller driver
    and the multi-process (multi-controller) mesh path: per-shard
    frame tensors, scaled-ref promotion, geometry harmonization, slab
    unification and gop stacking. Returns (tensors, cfg, slab_cfg,
    built, reals)."""
    gop = len(jobs)
    built = [frame_tensors(j) for j in jobs]
    # scaled refs are per-frame: if ANY gop shard has them, run every
    # shard through the mixed MC dispatch (scale_nz==0 shards take the
    # unscaled leg cell-by-cell — bit-exact, vp9recon.c:503-504)
    if any(c["has_scaled"] for _t, c, _l in built):
        for t, c, _l in built:
            if c["has_scaled"]:
                continue
            c["has_scaled"] = True
            nt = c["ntile"]
            r4c = (c["Hy"] // 4, c["Wpad"] // 4)
            r4u = (c["Hu"] // 4, c["Wpadu"] // 4)
            for k in ("s_ay", "s_ax", "s_by", "s_bx", "s_pw", "s_ph"):
                t[k] = np.zeros((nt,) + r4c, np.int32)
            for k in ("s_ayu", "s_axu", "s_byu", "s_bxu", "s_pwu",
                      "s_phu"):
                t[k] = np.zeros((nt,) + r4u, np.int32)
            t["mvscales"] = np.zeros((3, 2), np.int32)
            t["mvsteps"] = np.zeros((3, 2), np.int32)
            t["scalenz"] = np.zeros(3, np.int32)
            wd, hd = c["w"], c["hh"]
            t["refwy"] = np.full(3, wd, np.int32)
            t["refhy"] = np.full(3, hd, np.int32)
            t["refwu"] = np.full(3, c["wu"], np.int32)
            t["refhu"] = np.full(3, c["hhu"], np.int32)
    # geometry harmonization (dynamic-resize streams): pad every
    # shard's tensors to the gop-wide max dims; per-frame scalar
    # geometry (visible dims, block counts) rides as a dynamic "dims"
    # tensor so ONE executable serves every shard. Only the entropy-
    # level invariants (bpp / lossless / subsampling / tile count)
    # must match across the gop axis.
    reals = []
    for t, c, _l in built:
        reals.append((c["Hy"], c["Wpad"], c["Hu"], c["Wpadu"]))
        t["dims"] = np.asarray(
            [c.pop("w"), c.pop("hh"), c.pop("wu"), c.pop("hhu"),
             c.pop("cols"), c.pop("rows")], np.int32)
    for k in ("Hy", "Wpad", "Hu", "Wpadu"):
        m = max(c[k] for _t, c, _l in built)
        for _t, c, _l in built:
            c[k] = m
    any_inter = any(c["has_inter"] for _t, c, _l in built)
    any_lf = any(c["lf"] for _t, c, _l in built)
    for _t, c, _l in built:
        c["has_inter"] = any_inter
        c["lf"] = any_lf
    cfg = built[0][1]
    for _t, c, _l in built[1:]:
        if c != cfg:
            raise ValueError(
                "gop-sharded frames must share bpp/lossless/"
                "subsampling/tile count")
    if cfg["ntile"] != ntile:
        raise ValueError(
            f"stream has {cfg['ntile']} tile cols, mesh wants {ntile}")

    # unify intra slab statics across the gop axis
    def unify_pack(which, Hp, Wp):
        all_lv = [lv[which] for _t, _c, lv in built]
        L = max(max((len(l) for l in lvls), default=0)
                for lvls in all_lv)
        maxn = {}
        for lvls in all_lv:
            for l in lvls:
                for lvl in l:
                    for sz, e in lvl.items():
                        maxn[sz] = max(maxn.get(sz, 0), len(e))
        packs = [_pack_slabs_tiles(lvls, Hp, Wp, unify=(L, maxn))
                 for lvls in all_lv]
        return packs

    ypacks = unify_pack(0, cfg["Hy"], cfg["Wpad"])
    uvpacks = unify_pack(1, cfg["Hu"], cfg["Wpadu"])

    def slab_stack(packs, Hp, Wp):
        if packs[0] is None:
            return None, np.zeros((gop, ntile, 64, 8), np.int16)
        slabs = np.stack([p[0] for p in packs])
        return (packs[0][1], packs[0][2], packs[0][3]), slabs

    y_slabcfg, yslabs = slab_stack(ypacks, cfg["Hy"], cfg["Wpad"])
    uv_slabcfg, uvslabs = slab_stack(uvpacks, cfg["Hu"], cfg["Wpadu"])

    # stack the gop axis; zero-pad every key to the gop-wide max shape
    # (LF step counts, ref stacks, and ALL striped tensors when shard
    # geometries differ -- dynamic-resize streams)
    tensors = {}
    for key in built[0][0]:
        arrs = [t[key] for t, _c, _l in built]
        tgt = tuple(max(a.shape[d] for a in arrs)
                    for d in range(arrs[0].ndim))
        padded = []
        for a in arrs:
            if a.shape != tgt:
                z = np.zeros(tgt, a.dtype)
                z[tuple(slice(0, d) for d in a.shape)] = a
                a = z
            padded.append(a)
        tensors[key] = np.stack(padded)
    tensors["yslab"] = yslabs
    tensors["uvslab"] = uvslabs
    return tensors, cfg, (y_slabcfg, uv_slabcfg), built, reals
