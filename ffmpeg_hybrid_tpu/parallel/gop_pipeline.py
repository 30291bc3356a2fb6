"""Intra-GOP cross-device stripe pipeline: chained frames across the
"gop" mesh axis.

GOP sharding degenerates when keyframes are sparse: one shard owns a
long chained run while the rest idle. The reference's answer is frame
threading with row-granular progress waits — decoder state forwarded
thread-to-thread (pthread_frame.c:501) and frame N+1's MC for row r
blocking until frame N has decoded past r plus the refetch border
(progressframe.h:88-102, vp9recon.c:392-395). This module is the
mesh-native analogue designed in parallel/gop.py: consecutive CHAINED
frames (each referencing the previous, refresh_mask != 0) are
assigned to consecutive gop shards, each frame's pass B runs as
horizontal stripes of Hs pixels under a static lag-L software
pipeline, and after every step each shard `ppermute`s its freshly
reconstructed stripe to the next shard, which scatters it into its
local reference buffer — the ProgressFrame row-await contract turned
into dependency structure inside ONE jitted program.

Schedule: at step k, shard g reconstructs stripe j = k - g*L of frame
g (when 0 <= j < S_f). By then it has received stripes 0..j+L-1 of
frame g-1, i.e. reference rows < (j+L)*Hs. Exactness condition for
the static schedule (gop.py): MC of stripe j reads reference rows
<= (j+1)*Hs - 1 + maxmv + 7 (8-tap reach), so it is exact iff
maxmv <= (L-1)*Hs - 8. Bounded-MV content — the common case — runs
with L=2; unbounded MVs need the row-await fallback (not implemented;
the driver asserts the bound from the pass-A MV grids).

Reconstruction per stripe is the production fused inter pass
(ops/recon_tpu._recon_plane_inter: batched residual transforms +
per-cell 8-tap MC + clip), with the stripe's absolute row origin
folded into the MV grid so gathers hit frame coordinates. Hs must be
a multiple of 64 (luma) so transform blocks never cross stripes.

In-loop filtering composes with the schedule via the reference's
8-row finality guard (vp9recon.c:392-394): each stripe's recorded LF
edge calls (the exact serial-order stream of ff_vp9_loopfilter_sb)
replay on the shard's local frame buffer right after the stripe's
reconstruction — horizontal edges at the stripe's top modify the
previous stripe's last 8 rows, so the rows forwarded after stripe j
are [j*Hs-8, (j+1)*Hs+...) windows whose transiently non-final tail
is always overwritten by the next stripe's window before any read
the MV bound permits (hence the bound includes the 8-row guard:
|mv_y| <= (L-1)*Hs - 16).

Scope (honest): chained all-inter frames, unscaled refs, 4:2:0 (the
driver asserts it). Intra blocks inside chained frames additionally
need the above-row pixel handoff of the intra wavefront — not wired
yet; the driver rejects them.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def build_stripe_pipeline(mesh, G, S_f, Hs, lag, dims, lossless, bpp,
                          ss_h, ss_v):
    """Compile the pipelined chained-gop pass B.

    dims: (H64, W64, w, hh) luma padded + visible dims. Returns a
    function taking the stacked per-frame tensors (see
    decode_chained_gop) and the root frame's planes; yields decoded
    planes [G, H64, W64] x3."""
    H64, W64, w, hh = dims
    Hu = H64 >> ss_v
    Wu = W64 >> ss_h
    wu = (w + ss_h) >> ss_h
    hu = (hh + ss_v) >> ss_v
    Hs_u = Hs >> ss_v
    mvs_uv = (1 << (1 - ss_h), 1 << (1 - ss_v))
    nsteps = S_f + (G - 1) * lag

    from ..ops.recon_tpu import _recon_plane_inter
    from ..ops.lpf_tpu import _lf_scan

    gs = P("gop", None, None)
    g3 = P("gop", None, None, None)
    g4 = P("gop", None, None, None, None)
    g5 = P("gop", None, None, None, None)
    rep = P(None, None)
    in_specs = (gs, gs, gs, gs, gs, gs, gs, g3, g4,   # y plane set
                gs, gs, gs, gs, gs, gs, gs, g3, g4,   # uv grids + u
                gs, gs,                               # v coef/eob
                g5, g5,                               # LF schedules
                rep, rep, rep)                        # ref0 planes
    out_specs = (gs, gs, gs)

    @partial(shard_map, mesh=mesh, in_specs=in_specs,
             out_specs=out_specs, check_rep=False)
    def run(ycoef, yeob, ytxsz, ytxtype, yinter, ycomp, yfilt, yrefsel,
            ymv, ucoef, ueob, uvtxsz, uvtxtype, uvinter, uvcomp,
            uvfilt, uvrefsel, uvmv, vcoef, veob, ysched, uvsched,
            ref0y, ref0u, ref0v):
        g = jax.lax.axis_index("gop")
        z = jnp.zeros_like

        def init_ref(r0):
            return jnp.where(g == 0, r0, z(r0))

        def recon_stripe(jc, active, coef, eob4, txsz, txtype,
                         inter4, comp, filt, refsel, mv, refbuf, out,
                         Hs_p, w_p, h_p, mvsx, mvsy):
            y0 = jc * Hs_p
            r0 = jc * (Hs_p // 4)

            def sl(a, blk4):
                return jax.lax.dynamic_slice_in_dim(
                    a, r0 if blk4 else y0, Hs_p // 4 if blk4 else Hs_p,
                    0)

            mv_s = sl(mv, True).astype(jnp.int32)
            # fold the stripe's absolute row origin into the MV grid
            # (the vertical analogue of the tile-shard x0 fold)
            mv_s = mv_s.at[..., 1].add(y0 * 16 // mvsy)
            plane_s, _res = _recon_plane_inter(
                sl(coef, False), sl(eob4, True), sl(inter4, True),
                sl(txsz, True), sl(txtype, True), sl(comp, True),
                sl(filt, True), sl(refsel, True), mv_s,
                refbuf, refbuf, refbuf, w_p, h_p, lossless, bpp,
                mvsx, mvsy, has_comp=True, mc_impl="gather")
            pH, pW = plane_s.shape
            cur = jax.lax.dynamic_slice(out, (y0, 0), (pH, pW))
            return jax.lax.dynamic_update_slice(
                out, jnp.where(active, plane_s, cur), (y0, 0))

        def forward(k, out, refbuf, Hs_p):
            # forward the FINAL rows after this stripe's loop filter:
            # an (Hs_p + 8)-row window starting 8 rows above the
            # stripe (the reference's 8-row finality guard,
            # vp9recon.c:392-394); the window's transiently non-final
            # tail is overwritten by the next stripe's window before
            # any read the MV bound permits
            j = k - g * lag
            active = (j >= 0) & (j < S_f)
            jc = jnp.clip(j, 0, S_f - 1)
            W_p = out.shape[1]
            y0 = jnp.maximum(jc * Hs_p - 8, 0)
            send = jax.lax.dynamic_slice(out, (y0, 0), (Hs_p + 8, W_p))
            send = jnp.where(active, send, jnp.zeros_like(send))
            recv = jax.lax.ppermute(
                send, "gop", [(i, i + 1) for i in range(G - 1)])
            jsrc = k - (g - 1) * lag
            ok = (g > 0) & (jsrc >= 0) & (jsrc < S_f)
            y0s = jnp.maximum(jnp.clip(jsrc, 0, S_f - 1) * Hs_p - 8, 0)
            curr = jax.lax.dynamic_slice(refbuf, (y0s, 0),
                                         (Hs_p + 8, W_p))
            return jax.lax.dynamic_update_slice(
                refbuf, jnp.where(ok, recv, curr), (y0s, 0))

        def step(k, carry):
            ry, ru, rv, oy, ou, ov = carry
            j = k - g * lag
            active = (j >= 0) & (j < S_f)
            jc = jnp.clip(j, 0, S_f - 1)
            oy = recon_stripe(jc, active, ycoef[0], yeob[0], ytxsz[0],
                              ytxtype[0], yinter[0], ycomp[0],
                              yfilt[0], yrefsel[0], ymv[0], ry, oy,
                              Hs, w, hh, 2, 2)
            ou = recon_stripe(jc, active, ucoef[0], ueob[0],
                              uvtxsz[0], uvtxtype[0], uvinter[0],
                              uvcomp[0], uvfilt[0], uvrefsel[0],
                              uvmv[0], ru, ou, Hs_u, wu, hu, *mvs_uv)
            ov = recon_stripe(jc, active, vcoef[0], veob[0],
                              uvtxsz[0], uvtxtype[0], uvinter[0],
                              uvcomp[0], uvfilt[0], uvrefsel[0],
                              uvmv[0], rv, ov, Hs_u, wu, hu, *mvs_uv)
            # in-loop filter for this stripe: replay its recorded edge
            # calls (absolute coords) on the local frame buffer; wd==0
            # rows are no-ops, inactive lanes zero the schedule
            ystp = jnp.where(active, ysched[0][jc], 0)
            oy = jnp.where(active, _lf_scan(oy[None], ystp, bpp)[0],
                           oy)
            uvstp = jnp.where(active, uvsched[0][jc], 0)
            uvb = _lf_scan(jnp.stack([ou, ov]), uvstp, bpp)
            ou = jnp.where(active, uvb[0], ou)
            ov = jnp.where(active, uvb[1], ov)
            ry = forward(k, oy, ry, Hs)
            ru = forward(k, ou, ru, Hs_u)
            rv = forward(k, ov, rv, Hs_u)
            return (ry, ru, rv, oy, ou, ov)

        carry = (init_ref(ref0y), init_ref(ref0u), init_ref(ref0v),
                 jnp.zeros((H64, W64), jnp.int32),
                 jnp.zeros((Hu, Wu), jnp.int32),
                 jnp.zeros((Hu, Wu), jnp.int32))
        _ry, _ru, _rv, oy, ou, ov = jax.lax.fori_loop(0, nsteps, step,
                                                      carry)
        return oy[None], ou[None], ov[None]

    return run


def decode_chained_gop(packets, mesh, Hs=64, lag=2):
    """Decode [keyframe, inter_1..inter_G] with pass A on the host
    (frame-serial by spec) and the chained pass B pipelined across the
    mesh's "gop" shards. Returns the G decoded inter Frames' planes
    [G, H64, W64] x3 as numpy. G must equal the mesh's gop-axis size.

    Asserts the demo scope: all-inter chained frames, every reference
    the previous frame, loop filter off, unscaled refs, 4:2:0, and
    the static-lag MV bound |mv_y| <= (lag-1)*Hs - 8 px."""
    from ..codecs.vp9.decoder import VP9Decoder

    G = mesh.shape["gop"]
    dec = VP9Decoder(recon_backend="golden", use_native=False)
    [f0] = dec.decode(packets[0])
    assert dec.header.keyframe
    jobs = []
    for pkt in packets[1:]:
        job = dec.decode_pass_a(pkt)
        h = job.header
        assert not (h.keyframe or h.intraonly)
        assert h.ss_h == 1 and h.ss_v == 1, "demo scope: 4:2:0"
        assert all(sc == [0, 0] for sc in job.mvscale), "unscaled refs"
        for _row, _col, _tcs, b in job.blocks:
            assert not b.intra, "demo scope: all-inter frames"
        prev = jobs[-1].cur_frame_obj if jobs else f0
        for i in range(3):
            assert job.refs[h.refidx[i]] is prev, \
                "chained gop: every ref must be the previous frame"
        mvb = max(abs(int(np.asarray(job.mv4)[..., 1].min())),
                  abs(int(np.asarray(job.mv4)[..., 1].max()))) // 8
        # 8-tap reach + the 8-row loop-filter finality guard
        assert mvb <= (lag - 1) * Hs - 16, \
            f"|mv_y|={mvb}px exceeds the static lag-{lag} bound"
        jobs.append(job)
    assert len(jobs) == G, f"need exactly {G} chained inter frames"

    j0 = jobs[0]
    H64, W64 = j0.coef_y.shape
    w, hh = j0.cur_frame_obj.size
    S_f, rem = divmod(H64, Hs)
    assert rem == 0 and Hs % 64 == 0

    # per-stripe loop-filter schedules: the recorded serial-order LF
    # edge stream of each frame, split by SB-row band and packed into
    # wavefront steps (coords stay frame-absolute)
    from .fullframe import record_lf
    from ..ops.lpf_tpu import pack_schedule
    sb_cols = j0.sb_cols
    sbs_per = Hs // 64

    def _frame_scheds(job):
        y_rec, ny, uv_rec, nuv = record_lf(job)

        def split(rec, n):
            r = (np.asarray(rec[:n], np.int32) if n
                 else np.zeros((0, 8), np.int32))
            out = []
            for j in range(S_f):
                lo = j * sbs_per
                band = r[:, 0] // sb_cols
                m = (band >= lo) & (band < lo + sbs_per)
                rr = r[m].copy()
                rr[:, 0] -= lo * sb_cols
                out.append(pack_schedule(rr, len(rr), sb_cols,
                                         bucket=False))
            return out
        return split(y_rec, ny), split(uv_rec, nuv)

    per_frame = [_frame_scheds(j) for j in jobs]

    def _stack_sched(idx):
        mats = [pf[idx] for pf in per_frame]
        Smax = max(1, max(m.shape[0] for fr in mats for m in fr))
        Dmax = max([1] + [m.shape[1] for fr in mats for m in fr
                          if m.shape[0]])
        arr = np.zeros((G, S_f, Smax, Dmax, 7), np.int32)
        for gi, fr in enumerate(mats):
            for j, m in enumerate(fr):
                if m.shape[0]:
                    arr[gi, j, :m.shape[0], :m.shape[1]] = m
        return jnp.asarray(arr)

    ysched = _stack_sched(0)
    uvsched = _stack_sched(1)

    def stack(attr, dtype=np.int32):
        return jnp.asarray(np.stack([np.asarray(getattr(j, attr))
                                     .astype(dtype) for j in jobs]))

    def stack_uv_from_luma(attr):
        # uv grids at uv-cell resolution = the luma grid subsampled at
        # b8 anchors (values are constant per block)
        return jnp.asarray(np.stack(
            [np.asarray(getattr(j, attr))[::2, ::2].astype(np.int32)
             for j in jobs]))

    args = (
        stack("coef_y"), stack("eob_y"), stack("txsz4"),
        stack("txtype4"), stack("inter4"), stack("comp4"),
        stack("filter4"),
        jnp.asarray(np.stack([np.clip(np.asarray(j.ref4), 0, 2)
                              for j in jobs]).astype(np.int32)),
        stack("mv4"),
        stack("coef_u"), stack("eob_u"), stack("uvtx4"),
        jnp.asarray(np.zeros((G,) + jobs[0].uvtx4.shape, np.int32)),
        stack("inter4uv"), stack_uv_from_luma("comp4"),
        stack_uv_from_luma("filter4"),
        jnp.asarray(np.stack(
            [np.clip(np.asarray(j.ref4)[::2, ::2], 0, 2)
             for j in jobs]).astype(np.int32)),
        stack("uvmv4"),
        stack("coef_v"), stack("eob_v"),
        ysched, uvsched,
        jnp.asarray(np.asarray(f0.planes[0], np.int32)),
        jnp.asarray(np.asarray(f0.planes[1], np.int32)),
        jnp.asarray(np.asarray(f0.planes[2], np.int32)),
    )
    h = jobs[0].header
    run = build_stripe_pipeline(mesh, G, S_f, Hs, lag,
                                (H64, W64, w, hh), bool(h.lossless),
                                int(h.bpp), 1, 1)
    gspec = NamedSharding(mesh, P("gop", None, None))
    rspec = NamedSharding(mesh, P(None, None))
    placed = []
    for i, a in enumerate(args):
        placed.append(jax.device_put(
            a, rspec if i >= len(args) - 3 else
            NamedSharding(mesh, P(*(("gop",) + (None,) * (a.ndim - 1))))))
    oy, ou, ov = jax.jit(run)(*placed)
    return (np.asarray(oy), np.asarray(ou), np.asarray(ov)), jobs
