"""Dense wavefront loop filter: regular slices instead of per-record
gathers.

`lpf_tpu._lf_scan` replays the recorded edge calls with per-record
window gathers/scatters — and XLA gathers run at scalar-loop rate
(~27 ns per touched element measured: 60 ms per 1080p frame). This
formulation keeps the exact serial-order semantics but touches memory
only through REGULAR ops:

  * the recorded edge parameters (wd, E, I, H) are splatted into dense
    per-edge-position grids (V edges live at (py/8, px/4), H edges at
    (py/4, px/8) — each edge is filtered exactly once, so the splat is
    collision-free);
  * the frame is processed as a superblock wavefront (waves of
    constant 2r + c, the same dependency argument as lpf_tpu): each
    wave DYNAMIC-SLICES its diagonal's SB windows (plus 8-px margins)
    into a [lanes, B, SB+16, SB+16] stack — slices, not gathers;
  * within a wave, edges are applied in serial column (V) then row (H)
    position order — matching the reference's left-to-right /
    top-to-bottom chains — but VECTORIZED across lanes, planes, and
    the 8-px bands of each position: every sub-step is a static slice
    + filter_lanes_jnp + static masked write;
  * windows write back via dynamic_update_slice (same-wave windows are
    provably disjoint; off-grid lanes get zeroed parameters and a
    trash write region).

Bit-exact vs the golden loop filter (tests/test_lpf_dense.py).
Reference: ff_vp9_loopfilter_sb order (vp9lpf.c:183-230) + the per-sb
-row loop (vp9.c:1441-1552).
"""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .lpf_tpu import filter_lanes_jnp


def dense_params(recs, n, Hp, Wp):
    """Splat an edge-record stream [n, 8] (sb, py, px, dir, wd, E, I,
    H) into dense V [Hp/8, Wp/4, 4] and H [Hp/4, Wp/8, 4] grids."""
    V = np.zeros((Hp // 8, Wp // 4, 4), np.int32)
    Hg = np.zeros((Hp // 4, Wp // 8, 4), np.int32)
    if n:
        r = recs[:n].astype(np.int32)
        v = r[r[:, 3] == 0]
        hh = r[r[:, 3] == 1]
        V[v[:, 1] >> 3, v[:, 2] >> 2] = v[:, 4:8]
        Hg[hh[:, 1] >> 2, hh[:, 2] >> 3] = hh[:, 4:8]
    return V, Hg


_WLO = {0: 16, 4: 6, 8: 5, 16: 1}


def _apply_sub2(sub, par, bpp):
    """sub: [N, 8, 16] windows (edge between cols 7|8); par: [N, 4]
    (wd, E, I, H). Returns (filtered windows with writes restricted to
    each wd's modified range, the [N, 16] write mask)."""
    wd, E, I, H = (par[:, i] for i in range(4))
    filt = filter_lanes_jnp(sub, E, I, H, wd, bpp)
    r16 = jnp.arange(16)
    lo = jnp.where(wd >= 16, 1, jnp.where(wd >= 8, 5, 6))
    hi = jnp.where(wd >= 16, 15, jnp.where(wd >= 8, 11, 10))
    wmask = ((r16[None, :] >= lo[:, None]) & (r16[None, :] < hi[:, None])
             & (wd > 0)[:, None])
    return jnp.where(wmask[:, None, :], filt, sub), wmask


def _apply_sub(sub, par, bpp):
    return _apply_sub2(sub, par, bpp)[0]


@partial(jax.jit, static_argnames=("sb_rows", "sb_cols", "sbwx", "sbwy",
                                   "bpp"))
def lf_dense(planes, vpar, hpar, sb_rows, sb_cols, sbwx, sbwy, bpp):
    """planes: [B, Hp, Wp] int32 (B=1 for Y, 2 for stacked U+V).
    vpar/hpar: dense parameter grids (dense_params). sbwx/sbwy: the
    superblock span in THIS plane's pixels (64 for Y; chroma-scaled
    for U/V). Returns filtered planes."""
    B, Hp, Wp = planes.shape
    npos_v = sbwx // 4          # V edge positions per SB (x-serial)
    npos_h = sbwy // 4          # H edge positions per SB (y-serial)
    nb_v = sbwy // 8            # V row bands
    nb_h = sbwx // 8            # H col bands
    L = sb_rows
    wx, wy = sbwx + 16, sbwy + 16

    # pad: 8 all around + a trash region at the bottom for off-grid
    # lanes' write-back
    PH = 8 + Hp + 8 + wy
    PW = 8 + Wp + 8
    pad = jnp.zeros((B, PH, PW), planes.dtype)
    pad = pad.at[:, 8:8 + Hp, 8:8 + Wp].set(planes)
    trash_y = 8 + Hp + 8

    vz = jnp.zeros((nb_v, npos_v, 4), jnp.int32)
    hz = jnp.zeros((npos_h, nb_h, 4), jnp.int32)

    nwaves = 2 * (sb_rows - 1) + (sb_cols - 1) + 1

    def wave(pad, w):
        wins, vps, hps, y0s, x0s = [], [], [], [], []
        for l in range(L):
            r = l
            c = w - 2 * l
            valid = (c >= 0) & (c < sb_cols)
            cc = jnp.clip(c, 0, sb_cols - 1)
            y0 = jnp.where(valid, r * sbwy, trash_y)
            x0 = cc * sbwx
            win = jax.lax.dynamic_slice(pad, (0, y0, x0), (B, wy, wx))
            # params: V grid rows r*sbwy/8 .. +nb_v, cols cc*sbwx/4
            vp = jax.lax.dynamic_slice(
                vpar, (r * (sbwy // 8), cc * (sbwx // 4), 0),
                (nb_v, npos_v, 4))
            hp = jax.lax.dynamic_slice(
                hpar, (r * (sbwy // 4), cc * (sbwx // 8), 0),
                (npos_h, nb_h, 4))
            vp = jnp.where(valid, vp, vz)
            hp = jnp.where(valid, hp, hz)
            wins.append(win)
            vps.append(vp)
            hps.append(hp)
            y0s.append(y0)
            x0s.append(x0)
        win = jnp.stack(wins)          # [L, B, wy, wx]
        vp = jnp.stack(vps)            # [L, nb_v, npos_v, 4]
        hp = jnp.stack(hps)            # [L, npos_h, nb_h, 4]

        # V phase: serial left-to-right positions, vectorized over
        # (lane, plane, band)
        for t in range(npos_v):
            sub = win[:, :, 8:8 + sbwy, 4 * t:4 * t + 16] \
                .reshape(L, B, nb_v, 8, 16)
            par = vp[:, :, t]                       # [L, nb_v, 4]
            par_b = jnp.broadcast_to(par[:, None], (L, B, nb_v, 4))
            out = _apply_sub(sub.reshape(-1, 8, 16),
                             par_b.reshape(-1, 4), bpp)
            win = win.at[:, :, 8:8 + sbwy, 4 * t:4 * t + 16].set(
                out.reshape(L, B, sbwy, 16))
        # H phase: serial top-to-bottom positions
        for t in range(npos_h):
            sub = win[:, :, 4 * t:4 * t + 16, 8:8 + sbwx] \
                .reshape(L, B, 16, nb_h, 8)
            sub = jnp.moveaxis(sub, 2, 4)           # [L,B,nb_h,8,16]^T
            par = hp[:, t]                          # [L, nb_h, 4]
            par_b = jnp.broadcast_to(par[:, None], (L, B, nb_h, 4))
            out = _apply_sub(sub.reshape(-1, 8, 16),
                             par_b.reshape(-1, 4), bpp)
            out = jnp.moveaxis(out.reshape(L, B, nb_h, 8, 16), 4, 2)
            win = win.at[:, :, 4 * t:4 * t + 16, 8:8 + sbwx].set(
                out.reshape(L, B, 16, sbwx))

        for l in range(L):
            pad = jax.lax.dynamic_update_slice(
                pad, win[l], (0, y0s[l], x0s[l]))
        return pad

    pad = jax.lax.fori_loop(
        0, nwaves, lambda w, p: wave(p, w), pad)
    return pad[:, 8:8 + Hp, 8:8 + Wp]


@partial(jax.jit, static_argnames=("sb_rows", "sb_cols", "sbwx", "sbwy",
                                   "bpp"))
def lf_dense_par(planes, vpar, hpar, sb_rows, sb_cols, sbwx, sbwy, bpp):
    """8px-grid fast variant: each wave's V phase (then H phase) runs
    as ONE batched filter call over every 8-aligned edge position,
    instead of `lf_dense`'s serial position loop.

    EXACT only when no 4px-offset edge is active (the caller checks
    the recorded stream): 4px-offset edges (4x4-transform interiors)
    chain serially — edge e writes [e-2, e+1]; edge e+4 reads p3 = e —
    and must take the serial kernel.

    On the 8px grid each phase runs three ordered batched sub-steps:

      A. wd16 edges with NO active 8px left neighbour;
      B. wd4/wd8 edges;
      C. wd16 edges WITH an active 8px left neighbour.

    Independence inside each sub-step: wd4/8 writes reach +-2/3 px and
    the next edge's reads (decisions AND taps) start >= 4 px past the
    midpoint, so wd<=8 edges never interact; wd16 edges are 16-aligned
    (transform blocks align to their size) so two same-class wd16
    edges are >= 16 px apart and the +-7 px writes don't reach the
    neighbour's p7 tap. Cross-step order: a wd16 edge's big (>= 16 tx)
    side has no interior edge, so its only possible active 8-neighbour
    is on the small side — on the RIGHT for class A (reference order:
    wd16 first), on the LEFT for class C (neighbour first). A- and
    C-class edges never interact with each other (>= 16 px apart,
    writes stop 7 px short). Writes of adjacent overlapping windows
    are disjoint for the same reasons, so each write-back is two
    static masked block updates."""
    B, Hp, Wp = planes.shape
    n8v = sbwx // 8
    n8h = sbwy // 8
    nb_v = sbwy // 8
    nb_h = sbwx // 8
    L = sb_rows
    wx, wy = sbwx + 16, sbwy + 16

    PH = 8 + Hp + 8 + wy
    PW = 8 + Wp + 8
    pad = jnp.zeros((B, PH, PW), planes.dtype)
    pad = pad.at[:, 8:8 + Hp, 8:8 + Wp].set(planes)
    trash_y = 8 + Hp + 8

    vz = jnp.zeros((nb_v, sbwx // 4, 4), jnp.int32)
    hz = jnp.zeros((sbwy // 4, nb_h, 4), jnp.int32)
    nwaves = 2 * (sb_rows - 1) + (sb_cols - 1) + 1

    def wave(pad, w):
        wins, vps, hps, y0s, x0s = [], [], [], [], []
        for l in range(L):
            r = l
            c = w - 2 * l
            valid = (c >= 0) & (c < sb_cols)
            cc = jnp.clip(c, 0, sb_cols - 1)
            y0 = jnp.where(valid, r * sbwy, trash_y)
            x0 = cc * sbwx
            win = jax.lax.dynamic_slice(pad, (0, y0, x0), (B, wy, wx))
            vp = jax.lax.dynamic_slice(
                vpar, (r * (sbwy // 8), cc * (sbwx // 4), 0),
                (nb_v, sbwx // 4, 4))
            hp = jax.lax.dynamic_slice(
                hpar, (r * (sbwy // 4), cc * (sbwx // 8), 0),
                (sbwy // 4, nb_h, 4))
            vp = jnp.where(valid, vp, vz)
            hp = jnp.where(valid, hp, hz)
            wins.append(win)
            vps.append(vp[:, ::2])     # 8-aligned positions only
            hps.append(hp[::2])
            y0s.append(y0)
            x0s.append(x0)
        win = jnp.stack(wins)          # [L, B, wy, wx]
        vp = jnp.stack(vps)            # [L, nb_v, n8v, 4]
        hp = jnp.stack(hps)            # [L, n8h, nb_h, 4]

        def phase(A, par, npos, nb, span):
            """A: [L, B, span, width] rows-along-edge layout (V: rows
            x padded cols; H: cols x padded rows). par: [L, nb, npos,
            4]. Returns A with every position's edge filtered in one
            call (disjoint writes)."""
            width = A.shape[-1]
            nblk = width // 8
            Ab = A.reshape(L, B, span, nblk, 8)
            wl = Ab[..., 0:npos, :]
            wr = Ab[..., 1:npos + 1, :]
            w16 = jnp.concatenate([wl, wr], axis=-1)  # [L,B,span,npos,16]
            sub = w16.reshape(L, B, nb, 8, npos, 16) \
                .transpose(0, 1, 2, 4, 3, 5)          # [L,B,nb,npos,8,16]
            par_b = jnp.broadcast_to(par[:, None], (L, B, nb, npos, 4))
            filt, wm = _apply_sub2(sub.reshape(-1, 8, 16),
                                   par_b.reshape(-1, 4), bpp)
            filt = filt.reshape(L, B, nb, npos, 8, 16) \
                .transpose(0, 1, 2, 4, 3, 5) \
                .reshape(L, B, span, npos, 16)
            wm = jnp.broadcast_to(
                wm.reshape(L, B, nb, npos, 16)[:, :, :, None],
                (L, B, nb, 8, npos, 16)).reshape(L, B, span, npos, 16)
            fl, fr = filt[..., :8], filt[..., 8:]
            mL, mR = wm[..., :8], wm[..., 8:]
            Ab = Ab.at[..., 0:npos, :].set(
                jnp.where(mL, fl, Ab[..., 0:npos, :]))
            Ab = Ab.at[..., 1:npos + 1, :].set(
                jnp.where(mR, fr, Ab[..., 1:npos + 1, :]))
            return Ab.reshape(L, B, span, width)

        def split3(par):
            """par [L, nb, npos, 4] -> the A/B/C sub-step parameter
            grids (wd zeroed outside each class)."""
            wd = par[..., 0]
            act = wd > 0
            left_act = jnp.concatenate(
                [jnp.zeros_like(act[..., :1]), act[..., :-1]], axis=-1)
            m16 = wd >= 16
            mA = m16 & ~left_act
            mB = act & ~m16
            mC = m16 & left_act

            def sel(m):
                return par.at[..., 0].set(jnp.where(m, wd, 0))
            return sel(mA), sel(mB), sel(mC)

        def phase3(A, par, npos, nb, span):
            for p in split3(par):
                A = phase(A, p, npos, nb, span)
            return A

        # V phase: along-edge = rows, across = padded cols
        A = phase3(win[:, :, 8:8 + sbwy, :], vp, n8v, nb_v, sbwy)
        win = win.at[:, :, 8:8 + sbwy, :].set(A)
        # H phase: transpose so along-edge = cols, across = padded rows
        T = jnp.swapaxes(win[:, :, :, 8:8 + sbwx], 2, 3)
        hp_t = jnp.swapaxes(hp, 1, 2)             # [L, nb_h, n8h, 4]
        T = phase3(T, hp_t, n8h, nb_h, sbwx)
        win = win.at[:, :, :, 8:8 + sbwx].set(jnp.swapaxes(T, 2, 3))

        for l in range(L):
            pad = jax.lax.dynamic_update_slice(
                pad, win[l], (0, y0s[l], x0s[l]))
        return pad

    pad = jax.lax.fori_loop(0, nwaves, lambda w, p: wave(p, w), pad)
    return pad[:, 8:8 + Hp, 8:8 + Wp]


def has_offgrid_edges(recs, n):
    """True when any active recorded edge sits on a 4px offset (the
    4x4-transform interiors that force the serial position chain).
    recs: [n, 8] (sb, py, px, dir, wd, E, I, H)."""
    if n == 0:
        return False
    r = recs[:n]
    v = r[:, 3] == 0
    off = np.where(v, r[:, 2], r[:, 1]).astype(np.int64) & 4
    return bool((off != 0).any())


def has_offgrid_steps(steps):
    """Same check on a packed wavefront schedule [S, D, 7]
    (py, px, dir, wd, E, I, H); wd==0 entries are padding."""
    r = steps.reshape(-1, 7)
    act = r[:, 3] > 0
    off = np.where(r[:, 2] == 0, r[:, 1], r[:, 0]).astype(np.int64) & 4
    return bool((act & (off != 0)).any())


@partial(jax.jit, static_argnames=("Hp", "Wp"))
def dense_from_steps(steps, Hp, Wp):
    """Splat a packed wavefront schedule [S, D, 7] (py, px, dir, wd, E,
    I, H) into the dense V/H parameter grids ON DEVICE. The packed
    steps are already shipped for the scan path, so the dense LF costs
    zero extra h2d bytes; the splat is a single ~S*D-row scatter (each
    edge position is filtered exactly once, so it is collision-free)."""
    r = steps.reshape(-1, 7)
    py, px, dr, wd = r[:, 0], r[:, 1], r[:, 2], r[:, 3]
    par = r[:, 3:7]
    big = jnp.int32(1 << 20)
    okv = (wd > 0) & (dr == 0)
    okh = (wd > 0) & (dr == 1)
    V = jnp.zeros((Hp // 8, Wp // 4, 4), jnp.int32)
    Hg = jnp.zeros((Hp // 4, Wp // 8, 4), jnp.int32)
    V = V.at[jnp.where(okv, py >> 3, big),
             jnp.where(okv, px >> 2, big)].set(par, mode="drop")
    Hg = Hg.at[jnp.where(okh, py >> 2, big),
               jnp.where(okh, px >> 3, big)].set(par, mode="drop")
    return V, Hg


def loopfilter_frame_dense(s, planes_dev):
    """Device LF for one frame's [y, u, v] device planes using the
    recorded edge stream (native or Python recorder). Returns the
    filtered [y, u, v]."""
    from ..parallel.fullframe import record_lf
    h = s.header
    y_rec, ny, uv_rec, nuv = record_lf(s)
    Hy, Wy = planes_dev[0].shape
    Hu, Wu = planes_dev[1].shape
    Vy, Hgy = dense_params(y_rec, ny, Hy, Wy)
    Vu, Hgu = dense_params(uv_rec, nuv, Hu, Wu)
    y = lf_dense(planes_dev[0][None], jnp.asarray(Vy), jnp.asarray(Hgy),
                 s.sb_rows, s.sb_cols, 64, 64, h.bpp)[0]
    uv = jnp.stack([planes_dev[1], planes_dev[2]])
    uv = lf_dense(uv, jnp.asarray(Vu), jnp.asarray(Hgu),
                  s.sb_rows, s.sb_cols, 64 >> h.ss_h, 64 >> h.ss_v,
                  h.bpp)
    return [y, uv[0], uv[1]]
