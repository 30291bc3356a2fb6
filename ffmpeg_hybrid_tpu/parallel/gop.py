"""GOP-parallel decode: the multi-host scaling strategy.

A VP9 keyframe resets every probability context and refreshes all eight
reference slots (vp9.c:882-897, keyframe refresh), so the stream factors
into independent keyframe-rooted GOPs. This is the TPU-native analogue
of the reference's frame threading (pthread_frame.c:501 forwards decoder
state thread-to-thread per frame; here NO state crosses the boundary at
all) at the granularity that maps onto hosts: each host/worker owns
whole GOPs, decodes them with a private VP9Decoder (its own pass-A
entropy state and device-resident reference planes), and the driver
re-emits frames in stream order.

Within a host, workers are threads: pass A runs in native code that
releases the GIL, and pass-B JAX dispatch is thread-safe, so two GOPs
overlap on one chip. Across hosts, the same `split_gops` assignment
drives one process per host (see `decode_gops_md5_multiprocess`, which
the tests use to emulate N single-chip hosts as separate processes —
no shared state, output merged by GOP index).

INTRA-GOP cross-device pipelining (design; the sparse-keyframe
scaling gap). GOP sharding degenerates when keyframes are sparse:
one gop shard owns a long chained run while others idle. The
reference's answer is frame threading with row-granular progress
waits (pthread_frame.c:501 state forwarding + progressframe.h:88-102
row-await: frame N+1's MC for row r blocks until frame N has decoded
past r + the refetch border). The mesh-native analogue:

  * assign CONSECUTIVE chained frames to consecutive gop shards;
    pass A stays frame-serial on the host (probability adaptation is
    sequential by spec), but pass B pipelines across shards;
  * split each frame's pass B into horizontal stripes of height Hs
    and run a software-pipelined schedule: at step k, shard g
    reconstructs stripe (k - g) of frame N+g; after every step each
    shard ppermutes its freshly filtered stripe (plus an 8px LF
    halo) to shard g+1, which uses it as reference rows;
  * exactness condition: a lag-1 schedule is exact iff frame N+1's
    MC for stripe j reads frame N rows < (j+1)*Hs - B, where B =
    max |mv_y|/8 + 4 (8-tap refetch border) + 8 (LF). VP9's spec MV
    clamp (vp9block.c:175-177) does NOT bound |mv_y| usefully, so
    the general schedule needs the reference's row-await — on a
    mesh, a per-stripe `all_gather` of "rows-done" counters and a
    masked retry for stripes whose dependencies are short. Bounded-
    MV content (the common case; encoders rarely exceed +-256 px)
    runs the static lag ceil(B/Hs) schedule with no waits;
  * the pipeline fills in G steps (G = gop shards) and then yields G
    stripes per step — steady-state efficiency (S_f)/(S_f + G) for
    S_f stripes per frame.

Implementation status (round 5): IMPLEMENTED in
parallel/gop_pipeline.py for bounded-MV chained inter content — the
static lag-L stripe schedule with per-step ppermute forwarding of
reconstructed stripes into the next shard's reference buffer, stripe
recon through the production fused inter pass
(recon_tpu._recon_plane_inter) with the stripe row origin folded into
the MV grid. Validated bit-exact vs serial on 4 chained frames x 4
gop shards (tests/test_gop_pipeline.py; driver leg
__graft_entry__.dryrun_gop_pipeline), INCLUDING the in-loop filter:
each stripe's recorded LF edge stream replays after its recon and
the forwarded windows shift by the reference's 8-row finality guard
(vp9recon.c:392-394). Remaining composition work: intra blocks need
the above-row pixel handoff, and unbounded-MV content needs the
row-await fallback.
"""
from __future__ import annotations

import hashlib

from ..formats.superframe import split_superframe


def packet_is_keyframe(data: bytes) -> bool:
    """True if the packet's FIRST frame is a keyframe (superframe-aware).
    reference: the frame-marker/profile/show-existing/frame-type bits of
    the uncompressed header (vp9.c:532-552)."""
    sub = split_superframe(data, 0)
    if not sub:
        return False
    d = sub[0][1]
    if len(d) < 1:
        return False
    b0 = d[0]
    if (b0 >> 6) != 0b10:  # frame marker
        return False
    profile = ((b0 >> 5) & 1) | (((b0 >> 4) & 1) << 1)
    bit = 4  # bits consumed so far in b0 (MSB-first)
    if profile == 3:
        bit += 1  # reserved bit
    show_existing = (b0 >> (7 - bit)) & 1
    bit += 1
    if show_existing:
        return False
    frame_type = (b0 >> (7 - bit)) & 1
    return frame_type == 0  # 0 = keyframe


def split_gops(packets):
    """Split a packet list into keyframe-rooted GOPs (list of lists).
    Leading non-keyframe packets (broken stream head) form their own
    group so decode errors surface exactly as in serial decode."""
    gops = []
    cur = []
    for pkt in packets:
        if packet_is_keyframe(pkt) and cur:
            gops.append(cur)
            cur = []
        cur.append(pkt)
    if cur:
        gops.append(cur)
    return gops


def _decode_gop(gop_packets, recon_backend, use_native, drain):
    """Decode one GOP with a private decoder; returns its Frames."""
    from ..codecs.vp9.decoder import VP9Decoder

    dec = VP9Decoder(recon_backend=recon_backend, use_native=use_native)
    frames = []
    for pkt in gop_packets:
        for _pts, fd in split_superframe(pkt, 0):
            for f in dec.decode(fd):
                if drain and f.dev is not None:
                    import jax
                    for p in f.dev:
                        jax.block_until_ready(p)
                frames.append(f)
    return frames


def decode_gops_parallel(packets, workers=2, recon_backend="tpu",
                         use_native=None, drain=False):
    """Decode GOPs on a pool of worker threads; yields output Frames in
    stream order. `drain=True` blocks each frame before the next starts
    (keeps the single-chip transfer queue shallow)."""
    from concurrent.futures import ThreadPoolExecutor

    gops = split_gops(list(packets))
    if len(gops) <= 1 or workers <= 1:
        for g in gops:
            yield from _decode_gop(g, recon_backend, use_native, drain)
        return
    with ThreadPoolExecutor(max_workers=workers) as ex:
        futs = [ex.submit(_decode_gop, g, recon_backend, use_native,
                          drain) for g in gops]
        for fut in futs:          # stream order == GOP submit order
            yield from fut.result()


def _gop_md5_worker(args):
    path, lo, hi, recon_backend = args
    from ..formats.ivf import read_ivf

    _info, pkts = read_ivf(path)
    packets = [d for _p, d in pkts]
    gops = split_gops(packets)
    out = []
    for gi in range(lo, hi):
        frames = _decode_gop(gops[gi], recon_backend, None, False)
        out.append([(len(b), hashlib.md5(b).hexdigest())
                    for b in (f.to_bytes() for f in frames)])
    return out


def decode_gops_md5_multiprocess(path, n_procs=2, recon_backend="tpu"):
    """Emulate an n-host GOP-sharded deployment: each process (its own
    interpreter, JAX runtime, and decoder — nothing shared) decodes a
    contiguous GOP range of the IVF at `path`; results merge in stream
    order. Returns [(size, md5)] per frame."""
    import multiprocessing as mp

    from ..formats.ivf import read_ivf

    _info, pkts = read_ivf(path)
    gops = split_gops([d for _p, d in pkts])
    n = len(gops)
    n_procs = max(1, min(n_procs, n))
    bounds = [(i * n) // n_procs for i in range(n_procs + 1)]
    jobs = [(path, bounds[i], bounds[i + 1], recon_backend)
            for i in range(n_procs)]
    ctx = mp.get_context("spawn")
    with ctx.Pool(n_procs) as pool:
        parts = pool.map(_gop_md5_worker, jobs)
    out = []
    for part in parts:
        for gop_md5s in part:
            out.extend(gop_md5s)
    return out
