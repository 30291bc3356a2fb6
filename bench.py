#!/usr/bin/env python3
"""Benchmark: VP9 1080p decode throughput on one TPU chip.

Pipeline: native C pass-A entropy decode -> TPU (JAX/XLA) pass-B recon
(batched inverse transforms, per-cell MC, intra matmul wavefront) ->
device-wavefront loop filter. Bit-exactness is asserted against the
reference decoder's framemd5 while timing.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target: 60 fps/chip at 1080p (BASELINE.json).
"""
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

# The axon sitecustomize imports jax at interpreter startup, BEFORE
# this file runs — the JAX_COMPILATION_CACHE_DIR env var would be read
# too late, so the cache dir must be set through jax.config (same
# gotcha as tests/conftest.py).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jaxcache"))


def _setup_jax_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


# BENCH_VEC=bench_4k selects the 4K 8-tile-column clip (BASELINE
# config 4); default is the 1080p 4-tile clip the targets quote.
_NAME = os.environ.get("BENCH_VEC", "bench_1080p")
VEC = os.path.join(ROOT, "vectors", _NAME + ".ivf")
REF = os.path.join(ROOT, "vectors", _NAME + ".framemd5")


def _verify(packets, ref):
    """Conformance-gate leg (run in a subprocess): golden==oracle md5
    plus TPU==golden via transfer-free digests. Prints
    BENCH_BITEXACT=0/1 on stdout."""
    import hashlib

    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
    from ffmpeg_hybrid_tpu.utils.digest import (plane_digest_host,
                                                plane_digest_dev)

    VERIFY_FRAMES = int(os.environ.get("BENCH_VERIFY_FRAMES", "30"))
    dec3 = VP9Decoder(recon_backend="tpu")
    decg = VP9Decoder(recon_backend="golden")
    n = 0
    bitexact = True
    for fd in packets[:VERIFY_FRAMES]:
        outs_t = dec3.decode(fd)
        outs_g = decg.decode(fd)
        for ft, fg in zip(outs_t, outs_g):
            raw = fg.to_bytes()
            if ref is not None and n < len(ref):
                if hashlib.md5(raw).hexdigest() != ref[n][1]:
                    print(f"[verify] frame {n}: golden != oracle md5",
                          file=sys.stderr)
                    bitexact = False
            w, h = ft.size
            for i in range(3):
                pw = w if i == 0 else (w + ft.ss_h) >> ft.ss_h
                ph = h if i == 0 else (h + ft.ss_v) >> ft.ss_v
                dg = plane_digest_host(fg.planes[i], ph, pw)
                if ft.dev is not None:
                    dd = plane_digest_dev(ft.dev[i], ph, pw)
                else:  # TPU backend fell back to host for this frame
                    dd = plane_digest_host(ft.planes[i], ph, pw)
                if dg != dd:
                    print(f"[verify] frame {n} plane {i}: tpu != golden",
                          file=sys.stderr)
                    bitexact = False
            n += 1
    print(f"BENCH_BITEXACT={1 if bitexact else 0} frames={n}")


def main():
    import faulthandler
    import signal
    faulthandler.register(signal.SIGUSR1, file=sys.stderr)
    _setup_jax_cache()

    from ffmpeg_hybrid_tpu.formats.ivf import read_ivf
    from ffmpeg_hybrid_tpu.formats.superframe import split_superframe
    from ffmpeg_hybrid_tpu.formats.framemd5 import parse_framemd5
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder

    ref = parse_framemd5(REF) if os.path.exists(REF) else None
    info, pkts = read_ivf(VEC)
    packets = []
    for pts, data in pkts:
        packets.extend(fd for _, fd in split_superframe(data, pts))

    import jax

    def drain(d):
        if d.cur_frame_obj is not None and d.cur_frame_obj.dev is not None:
            for p in d.cur_frame_obj.dev:
                jax.block_until_ready(p)

    # Pass 1 (conformance gate, untimed) — runs in a SUBPROCESS: d2h
    # traffic (even 4-byte scalars) degrades the tunnel for the rest of
    # the process in both directions (measured: scalar readbacks after
    # the timed pass stall for minutes; a timed pass after readbacks
    # drops 50x). Isolating the gate in its own process keeps the timed
    # pass's link clean. Bulk plane transfers are avoided entirely; the
    # gate has two transfer-free legs:
    #   golden (host numpy) decode == oracle md5    (no device traffic)
    #   TPU decode == golden decode                 via a weighted-sum
    #       digest computed on-device for the TPU planes and in numpy
    #       for the golden planes — only 2 scalars cross the link per
    #       plane. Two independent 32-bit linear hashes; collision odds
    #       for ANY pixel difference ~2^-64 (full bit-exactness is
    #       asserted byte-for-byte by tests/test_tpu_backend.py).
    # Together they certify TPU == oracle without any plane transfer.
    # The subprocess's compiles land in the shared compilation cache,
    # so the parent's warmup still loads everything quickly.
    t0 = time.time()
    if os.environ.get("BENCH_PHASE") == "verify":
        _verify(packets, ref)
        return
    import subprocess
    env = dict(os.environ, BENCH_PHASE="verify")
    r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=env, capture_output=True, text=True)
    bitexact = "BENCH_BITEXACT=1" in r.stdout
    if not bitexact:
        sys.stderr.write(r.stdout[-2000:] + r.stderr[-2000:])
    print(f"[bench] verify pass (subprocess): bitexact={bitexact}, "
          f"{time.time() - t0:.1f}s", file=sys.stderr)

    # Pass 2 (warmup): decode the clip once more single-threaded so
    # every executable/shape bucket is compiled and loaded before the
    # timed pass.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "45"))
    t0 = time.time()
    dec = VP9Decoder(recon_backend="tpu")
    for fd in packets:
        dec.decode(fd)
    drain(dec)
    print(f"[bench] warmup pass: {time.time() - t0:.1f}s", file=sys.stderr)

    # Pass 3 (timed): steady-state pipelined decode — pass A (host
    # entropy) of frame N+1 overlaps pass B (uploads + dispatch) of
    # frame N via decode_stream. Frames remain device-resident (the
    # production mode: decoded frames feed further TPU compute) but each
    # frame is drained before the next's uploads start: the host link
    # serializes transfers behind queued compute, so letting the queue
    # grow makes every upload wait out the backlog (measured: drain-per
    # -frame is ~2.4x faster than drain-every-8 on the axon tunnel).
    # The clip is looped to fill the time budget (each loop restarts at
    # the keyframe, so every loop decodes identically).
    def packet_loop():
        while True:
            yield from packets

    dec2 = VP9Decoder(recon_backend="tpu")
    timed_frames = 0
    t_start = time.time()
    for i, f in enumerate(dec2.decode_stream(packet_loop())):
        if f.dev is not None:
            for p in f.dev:
                jax.block_until_ready(p)
        timed_frames += 1
        if i == 7:  # restart after pipeline warm-up
            t_start = time.time()
            timed_frames = 0
        elif i > 7 and time.time() - t_start > budget_s:
            break
    dt = time.time() - t_start
    print(f"[bench] timed pass: {timed_frames} frames in {dt:.1f}s",
          file=sys.stderr)

    fps = timed_frames / dt if dt > 0 else 0.0
    if not bitexact:
        fps = 0.0  # a wrong decode doesn't count
    print(json.dumps({
        "metric": ("vp9_decode_4k_fps_per_chip" if _NAME == "bench_4k"
                   else "vp9_decode_1080p_fps_per_chip"),
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 4),
    }))


if __name__ == "__main__":
    main()
