#!/usr/bin/env python3
"""Per-kernel performance harness — the `checkasm --bench` half.

Times every hot device kernel (inverse transforms, per-cell MC, intra
wavefront scan, loop-filter wavefront scan) at representative 1080p
shapes and each bit depth, reporting median wall ms over repeated
dispatches plus a bytes-moved estimate -> effective GB/s. Results are
written to KERNEL_BENCH.json in-tree so regressions are detectable
across rounds. Correctness is NOT checked here — that is the
differential tests' job (tests/test_itxfm.py etc. against the real
reference libavcodec.a via tools/ref_harness.c).

Reference counterpart: tests/checkasm/vp9dsp.c:50,311,452,559 (the
bench_* loops around each checked DSP function).

Measurement rules (CLAUDE.md + measured): on the axon tunnel
block_until_ready acks BEFORE device execution finishes, so kernels
are timed as N-iteration data-dependent chains inside one jit, synced
by a 1-element readback, per-iter cost from the (T(n2)-T(n1)) slope —
dispatch and readback overheads cancel. Jitted chains are built once
and warmed (a fresh jit per rep would measure the compile relay).

Usage: python tools/kernel_bench.py [--reps N] [--json-only]
"""
import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jaxcache"))

import numpy as np


def _chain_ms(step, x0, extract, reps, n1=2, n2=10):
    """Median per-iteration device ms via CHAINED differential timing.

    On the axon tunnel, block_until_ready acks before device execution
    completes (measured: a 1.1-TFLOP matmul "finishes" in 0.03 ms), so
    single-dispatch wall timing measures dispatch latency, not compute.
    Instead the kernel is iterated n times inside one jit with a data
    dependency (fori_loop), completion is forced by a 1-element scalar
    readback, and the per-iteration cost is (T(n2)-T(n1))/(n2-n1) —
    the readback/dispatch overhead (~20-30 ms, tunnel weather) cancels
    in the difference."""
    import jax
    from functools import partial

    @partial(jax.jit, static_argnames="n")
    def chain(x, n):
        y = jax.lax.fori_loop(0, n, lambda i, a: step(a), x)
        return extract(y)

    float(chain(x0, n1))  # warm both executables (compile + load)
    float(chain(x0, n2))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(x0, n1))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(x0, n2))
        tb = time.perf_counter() - t0
        ts.append(max(tb - ta, 0.0) * 1e3 / (n2 - n1))
    ts.sort()
    return ts[len(ts) // 2], ts


def bench_itxfm(rows, bpp, reps):
    """residual_plane: all-tx-size batched inverse transforms over a
    1080p luma plane. Bytes: coef in + residual out (int32)."""
    import jax
    from ffmpeg_hybrid_tpu.ops import recon_tpu

    H, W = rows, 1920
    r4, c4 = H // 4, W // 4
    rng = np.random.RandomState(0)
    coef = np.asarray(rng.randint(-512, 512, (H, W)), np.int32)
    eob4 = np.asarray(rng.randint(1, 17, (r4, c4)), np.int32)
    txsz4 = np.zeros((r4, c4), np.int32)
    # realistic tx mix: 8x8/16x16 dominate
    txsz4[:] = rng.choice([0, 1, 1, 2, 2, 3], (r4, c4))
    # align each tx block to its size grid (grid value at block origin)
    txtype4 = np.asarray(rng.randint(0, 4, (r4, c4)), np.int32)

    import jax.numpy as jnp
    eob_d, txs_d, txt_d = (jnp.asarray(eob4), jnp.asarray(txsz4),
                           jnp.asarray(txtype4))

    def step(c):
        return recon_tpu.residual_plane(c, eob_d, txs_d, txt_d, False,
                                        bpp) & 1023

    ms, ts = _chain_ms(step, jnp.asarray(coef),
                       lambda y: y[0, 0], reps)
    byt = coef.nbytes * 2
    return {"kernel": "itxfm_plane", "shape": f"{H}x{W}", "bpp": bpp,
            "ms": round(ms, 3), "GBps": round(byt / ms / 1e6, 2),
            "all_ms": [round(t, 3) for t in ts]}


def bench_mc(rows, bpp, comp, reps):
    """_mc_cells: 8-tap MC for every 4x4 cell of a 1080p plane.
    Bytes: 11x11 int32 patch gathered per cell per ref + output."""
    import jax
    import jax.numpy as jnp
    from ffmpeg_hybrid_tpu.ops import recon_tpu

    H, W = rows, 1920
    r4, c4 = H // 4, W // 4
    rng = np.random.RandomState(1)
    refstack = jnp.asarray(rng.randint(0, 255, (3, H, W)), jnp.int32)
    mv16 = jnp.asarray(rng.randint(-64, 64, (r4, c4, 2, 2)), jnp.int32)
    refsel = jnp.asarray(rng.randint(0, 3, (r4, c4, 2)), jnp.int32)
    compa = jnp.full((r4, c4), bool(comp))
    filt = jnp.asarray(rng.randint(0, 4, (r4, c4)), jnp.int32)
    inter4 = jnp.ones((r4, c4), bool)

    def step(rs):
        mc = recon_tpu._mc_cells(rs, mv16, refsel, compa, filt, inter4,
                                 W, H, bpp, 2, 2)
        return rs.at[0].set(mc & 255)

    ms, ts = _chain_ms(step, refstack, lambda y: y[0, 0, 0], reps)
    nrefs = 2 if comp else 1
    byt = r4 * c4 * (11 * 11 * 4 * nrefs + 16 * 4)
    return {"kernel": f"mc_cells_{'comp' if comp else 'single'}",
            "shape": f"{H}x{W}", "bpp": bpp, "ms": round(ms, 3),
            "GBps": round(byt / ms / 1e6, 2),
            "all_ms": [round(t, 3) for t in ts]}


def bench_intra(rows, bpp, reps):
    """_intra_scan: a synthetic 60-level wavefront with a realistic
    per-level size mix (what a 1080p keyframe schedule looks like)."""
    import jax
    import jax.numpy as jnp
    from ffmpeg_hybrid_tpu.ops import recon_tpu

    H, W = rows, 1920
    rng = np.random.RandomState(2)
    L = 60
    sizes = (4, 8, 16, 32)
    caps = (128, 64, 32, 8)
    tot = recon_tpu._pad_to_bucket(L * sum(caps), base=64, mult=2)
    buf = np.zeros((tot, 8), np.int16)
    buf[:, 0] = H + 64
    buf[:, 1] = W + 64
    buf[:, 2] = 2
    buf[:, 6:8] = 1
    base = 0
    for sz, cap in zip(sizes, caps):
        for i in range(L):
            n = rng.randint(cap // 2, cap)
            o = base + i * cap
            buf[o:o + n, 0] = (rng.randint(1, H // sz, n)) * sz
            buf[o:o + n, 1] = (rng.randint(0, W // sz, n)) * sz
            buf[o:o + n, 2] = rng.randint(0, 10, n)
            buf[o:o + n, 3:6] = 1
            buf[o:o + n, 6] = 64
            buf[o:o + n, 7] = 64
        base += L * cap
    plane = jnp.asarray(rng.randint(0, 255, (H, W)), jnp.int32)
    residual = jnp.asarray(rng.randint(-32, 32, (H, W)), jnp.int32)
    slab = jnp.asarray(buf)

    def step(pl):
        return recon_tpu._intra_scan(pl, residual, slab, L, sizes,
                                     caps, bpp)

    ms, ts = _chain_ms(step, plane, lambda y: y[0, 0], reps)
    nblk = sum(int((buf[:, 0] < H).sum()) for _ in [0])
    byt = int((buf[:, 0] < H).sum()) * (64 * 4 * 3)
    return {"kernel": "intra_scan", "shape": f"{H}x{W} L={L}",
            "bpp": bpp, "ms": round(ms, 3),
            "GBps": round(byt / ms / 1e6, 2),
            "all_ms": [round(t, 3) for t in ts]}


def bench_lf(rows, bpp, reps):
    """_lf_scan: a synthetic wavefront schedule with 1080p-like step
    count and lane occupancy."""
    import jax
    import jax.numpy as jnp
    from ffmpeg_hybrid_tpu.ops import lpf_tpu

    H, W = rows, 1920
    rng = np.random.RandomState(3)
    S, D = 512, 17
    steps = np.zeros((S, D, 7), np.int32)
    occ = rng.rand(S, D) < 0.5
    steps[..., 0] = rng.randint(1, H // 8, (S, D)) * 8      # py
    steps[..., 1] = rng.randint(1, W // 8, (S, D)) * 8      # px
    steps[..., 2] = rng.randint(0, 2, (S, D))               # dir
    steps[..., 3] = np.where(occ, rng.choice([4, 8, 16], (S, D)), 0)
    steps[..., 4] = 120
    steps[..., 5] = 40
    steps[..., 6] = 2
    plane = jnp.asarray(rng.randint(0, 255, (1, H, W)), jnp.int32)
    sdev = jnp.asarray(steps)

    def step(pl):
        return lpf_tpu._lf_scan(pl, sdev, bpp)

    ms, ts = _chain_ms(step, plane, lambda y: y[0, 0, 0], reps)
    nrec = int(occ.sum())
    byt = nrec * 8 * 16 * 4 * 2
    return {"kernel": "lf_scan", "shape": f"{H}x{W} S={S}xD={D}",
            "bpp": bpp, "ms": round(ms, 3),
            "GBps": round(byt / ms / 1e6, 2),
            "all_ms": [round(t, 3) for t in ts]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--json-only", action="store_true")
    ap.add_argument("--out", default=os.path.join(ROOT,
                                                  "KERNEL_BENCH.json"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jaxcache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    platform = jax.devices()[0].platform

    rows = 1088
    results = []
    for bpp in (8, 10):
        results.append(bench_itxfm(rows, bpp, args.reps))
        results.append(bench_mc(rows, bpp, False, args.reps))
        results.append(bench_mc(rows, bpp, True, args.reps))
        results.append(bench_intra(rows, bpp, args.reps))
        results.append(bench_lf(rows, bpp, args.reps))

    doc = {"platform": platform, "reps": args.reps, "results": results}
    with open(args.out, "w") as fh:
        json.dump(doc, fh, indent=1)
    if args.json_only:
        print(json.dumps(doc))
        return
    hdr = f"{'kernel':22s} {'shape':16s} {'bpp':3s} {'ms':>8s} {'GB/s':>8s}"
    print(f"[kernel_bench] platform={platform}")
    print(hdr)
    print("-" * len(hdr))
    for r in results:
        print(f"{r['kernel']:22s} {r['shape']:16s} {r['bpp']:<3d} "
              f"{r['ms']:8.3f} {r['GBps']:8.2f}")
    print(f"written: {args.out}")


if __name__ == "__main__":
    main()
