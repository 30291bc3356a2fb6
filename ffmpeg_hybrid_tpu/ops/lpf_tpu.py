"""TPU loop filter: wavefront replay of the exact edge-call sequence.

The native pass-A side records the mask-walker's edge calls per superblock
(native/vp9_lpf.c record mode — py, px, dir, wd, E, I, H per 8-lane call,
in the reference's strict order). SB (r,c) depends on (r,c-1), (r-1,c)
and (r-1,c+1) — the top-right SB's vertical-edge pass modifies this SB's
left write margin — so superblocks on a wave of constant 2r+c are
independent. The schedule batches substep k of every wave-w superblock
into one step and lax.scan's over steps; the whole filter is a single
device dispatch and frame planes never leave the device.

The per-edge math is the vectorized jnp port of ops/lpf.py's
_filter_lanes (reference: loop_filter, vp9dsp_template.c:1780-1889).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def filter_lanes_jnp(win, E, I, H, wd, bpp):
    """win: [N, 8, 16] int32 (8 lanes x 16 across-edge samples, edge
    between cols 7|8). E/I/H/wd: [N] int32 (wd in {0,4,8,16}).
    Returns filtered [N, 8, 16]."""
    x = win
    F = 1 << (bpp - 8)
    sh = bpp - 8
    E = (E << sh)[:, None]
    I = (I << sh)[:, None]
    H = (H << sh)[:, None]
    wd = wd[:, None]
    p = [x[..., 7 - i] for i in range(8)]
    q = [x[..., 8 + i] for i in range(8)]
    ab = lambda a: jnp.abs(a)

    fm = ((ab(p[3] - p[2]) <= I) & (ab(p[2] - p[1]) <= I)
          & (ab(p[1] - p[0]) <= I) & (ab(q[1] - q[0]) <= I)
          & (ab(q[2] - q[1]) <= I) & (ab(q[3] - q[2]) <= I)
          & (ab(p[0] - q[0]) * 2 + (ab(p[1] - q[1]) >> 1) <= E))
    fm = fm & (wd > 0)

    flat8in = ((ab(p[3] - p[0]) <= F) & (ab(p[2] - p[0]) <= F)
               & (ab(p[1] - p[0]) <= F) & (ab(q[1] - q[0]) <= F)
               & (ab(q[2] - q[0]) <= F) & (ab(q[3] - q[0]) <= F))
    flat8out = ((ab(p[7] - p[0]) <= F) & (ab(p[6] - p[0]) <= F)
                & (ab(p[5] - p[0]) <= F) & (ab(p[4] - p[0]) <= F)
                & (ab(q[4] - q[0]) <= F) & (ab(q[5] - q[0]) <= F)
                & (ab(q[6] - q[0]) <= F) & (ab(q[7] - q[0]) <= F))
    w16 = fm & (wd >= 16) & flat8out & flat8in
    w8 = fm & (wd >= 8) & flat8in & ~w16
    wn = fm & ~w16 & ~w8

    out = x
    # wd16 (15-tap with edge replication): position k (1..14) in the
    # 16-wide window. (A prefix-sum reformulation was tried and
    # REVERTED: fewer ops but a 16-deep serial add chain — measured
    # lf_scan 60 -> 82 ms on-chip; the naive independent sums
    # parallelize better at these tiny shapes.)
    seq = [p[7 - i] for i in range(8)] + q  # positions 0..15
    for k in range(1, 15):
        acc = seq[k]  # self counted twice
        for t in range(-7, 8):
            idx = min(max(k + t, 0), 15)
            acc = acc + seq[idx]
        v = (acc + 8) >> 4
        out = out.at[..., k].set(jnp.where(w16, v, out[..., k]))

    # wd8 flat filter
    p_, q_ = p, q
    f8 = {
        -3: (p_[3] + p_[3] + p_[3] + 2 * p_[2] + p_[1] + p_[0] + q_[0] + 4)
        >> 3,
        -2: (p_[3] + p_[3] + p_[2] + 2 * p_[1] + p_[0] + q_[0] + q_[1] + 4)
        >> 3,
        -1: (p_[3] + p_[2] + p_[1] + 2 * p_[0] + q_[0] + q_[1] + q_[2] + 4)
        >> 3,
        0: (p_[2] + p_[1] + p_[0] + 2 * q_[0] + q_[1] + q_[2] + q_[3] + 4)
        >> 3,
        1: (p_[1] + p_[0] + q_[0] + 2 * q_[1] + q_[2] + q_[3] + q_[3] + 4)
        >> 3,
        2: (p_[0] + q_[0] + q_[1] + 2 * q_[2] + q_[3] + q_[3] + q_[3] + 4)
        >> 3,
    }
    for k, v in f8.items():
        out = out.at[..., 8 + k].set(jnp.where(w8, v, out[..., 8 + k]))

    # narrow filter
    maxs = (1 << (bpp - 1)) - 1
    mins = -(1 << (bpp - 1))
    maxp = (1 << bpp) - 1
    clip_s = lambda v: jnp.clip(v, mins, maxs)
    hev = (ab(p[1] - p[0]) > H) | (ab(q[1] - q[0]) > H)
    fh = clip_s(3 * (q[0] - p[0]) + clip_s(p[1] - q[1]))
    f1h = jnp.minimum(fh + 4, maxs) >> 3
    f2h = jnp.minimum(fh + 3, maxs) >> 3
    fn = clip_s(3 * (q[0] - p[0]))
    f1n = jnp.minimum(fn + 4, maxs) >> 3
    f2n = jnp.minimum(fn + 3, maxs) >> 3
    fo = (f1n + 1) >> 1
    f1 = jnp.where(hev, f1h, f1n)
    f2 = jnp.where(hev, f2h, f2n)
    np0 = jnp.clip(p[0] + f2, 0, maxp)
    nq0 = jnp.clip(q[0] - f1, 0, maxp)
    np1 = jnp.where(hev, p[1], jnp.clip(p[1] + fo, 0, maxp))
    nq1 = jnp.where(hev, q[1], jnp.clip(q[1] - fo, 0, maxp))
    out = out.at[..., 7].set(jnp.where(wn, np0, out[..., 7]))
    out = out.at[..., 8].set(jnp.where(wn, nq0, out[..., 8]))
    out = out.at[..., 6].set(jnp.where(wn, np1, out[..., 6]))
    out = out.at[..., 9].set(jnp.where(wn, nq1, out[..., 9]))
    return out


@partial(jax.jit, static_argnames=("bpp",))
def _lf_scan(plane, steps, bpp):
    """plane: [B, H, W] int32 (B=1 for Y, B=2 for stacked U+V — the UV
    record stream applies to both chroma planes). steps: [S, D, 7] int32
    records (py, px, dir, wd, E, I, H); wd==0 entries are no-ops."""
    B = plane.shape[0]
    r8 = jnp.arange(8)
    r16 = jnp.arange(16)

    def body(pl, rec):
        py, px, dr, wd, E, I, Ht = (rec[:, i] for i in range(7))
        D = py.shape[0]
        # gather both orientations (reads are in-bounds for real records;
        # fancy indexing clamps inside jit)
        rows0 = py[:, None] + r8[None, :]
        cols0 = px[:, None] + (r16 - 8)[None, :]
        w0 = pl[:, rows0[:, :, None], cols0[:, None, :]]  # [B, D, 8, 16]
        rows1 = py[:, None] + (r16 - 8)[None, :]
        cols1 = px[:, None] + r8[None, :]
        w1 = pl[:, rows1[:, :, None], cols1[:, None, :]]  # [B, D, 16, 8]
        w1t = jnp.swapaxes(w1, -1, -2)
        win = jnp.where((dr == 0)[None, :, None, None], w0, w1t)
        filt = filter_lanes_jnp(win.reshape(B * D, 8, 16),
                                jnp.tile(E, B), jnp.tile(I, B),
                                jnp.tile(Ht, B), jnp.tile(wd, B), bpp)
        filt = filt.reshape(B, D, 8, 16)
        # restrict writes to each record's modified range
        lo = jnp.where(wd >= 16, 1, jnp.where(wd >= 8, 5, 6))
        hi = jnp.where(wd >= 16, 15, jnp.where(wd >= 8, 11, 10))
        wmask = ((r16[None, :] >= lo[:, None])
                 & (r16[None, :] < hi[:, None])
                 & (wd > 0)[:, None])               # [D, 16]
        outw = jnp.where(wmask[None, :, None, :], filt, win)
        # scatter back; padded/no-op/other-direction records dropped
        big = jnp.int32(1 << 20)
        srows0 = jnp.where((wd > 0) & (dr == 0), py, big)[:, None] \
            + r8[None, :]
        pl = pl.at[:, srows0[:, :, None], cols0[:, None, :]].set(
            outw, mode="drop")
        srows1 = jnp.where((wd > 0) & (dr == 1), py, big)[:, None] \
            + (r16 - 8)[None, :]
        pl = pl.at[:, srows1[:, :, None], cols1[:, None, :]].set(
            jnp.swapaxes(outw, -1, -2), mode="drop")
        return pl, None

    plane, _ = jax.lax.scan(body, plane, steps)
    return plane


def pack_schedule(recs, n, sb_cols, bucket=True):
    """Group records [n, 8] (sb, py, px, dir, wd, E, I, H) into wavefront
    steps [S, D, 7]. Superblocks on the same 2r+c wave are
    independent; within a superblock the order is preserved."""
    if n == 0:
        return np.zeros((0, 1, 7), np.int32)
    r = recs[:n].astype(np.int32)
    sb = r[:, 0]
    sbr = sb // sb_cols
    sbc = sb % sb_cols
    # dependency set of SB (r,c): (r,c-1), (r-1,c) and (r-1,c+1) — the
    # top-right SB's vertical edges modify this SB's left write margin —
    # so the safe wavefront is w = 2r + c (all deps in waves w-1/w-2)
    wave = 2 * sbr + sbc
    # per-record substep index within its SB (records are emitted
    # contiguously per SB, in order)
    order = np.arange(n, dtype=np.int64)
    change = np.empty(n, bool)
    change[0] = True
    change[1:] = sb[1:] != sb[:-1]
    group_start = np.maximum.accumulate(np.where(change, order, 0))
    sub = order - group_start
    nwaves = int(wave.max()) + 1
    # step row base per wave = cumulative max substeps
    max_sub = np.zeros(nwaves, np.int64)
    np.maximum.at(max_sub, wave, sub + 1)
    base = np.zeros(nwaves, np.int64)
    base[1:] = np.cumsum(max_sub)[:-1]
    S = int(np.cumsum(max_sub)[-1])
    # lane within step: sbr is unique within an anti-diagonal wave
    lane = sbr
    D = int(lane.max()) + 1
    steps = np.zeros((S, D, 7), np.int32)
    rows = base[wave] + sub
    steps[rows, lane] = r[:, 1:8]
    if bucket:
        S2 = 64
        while S2 < S:
            S2 *= 2
        if S2 != S:
            pad = np.zeros((S2 - S, D, 7), np.int32)
            steps = np.concatenate([steps, pad], axis=0)
    return steps
