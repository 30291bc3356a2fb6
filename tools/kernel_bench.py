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


def bench_mc_mxu(rows, bpp, comp, reps):
    """mc_mxu.mc_cells: the one-hot-matmul MC (production TPU default)
    on the same workload as bench_mc, so the A/B against the gather
    path is like-for-like. MVs within the window (the fixup pass still
    runs, on an empty set, as in production)."""
    import jax
    import jax.numpy as jnp
    from ffmpeg_hybrid_tpu.ops import mc_mxu

    H, W = rows, 1920
    r4, c4 = H // 4, W // 4
    rng = np.random.RandomState(1)
    maxp = (1 << bpp) - 1
    refstack = jnp.asarray(rng.randint(0, maxp, (3, H, W)), jnp.int32)
    mv16 = jnp.asarray(rng.randint(-64, 64, (r4, c4, 2, 2)), jnp.int32)
    refsel = jnp.asarray(rng.randint(0, 3, (r4, c4, 2)), jnp.int32)
    compa = jnp.full((r4, c4), bool(comp))
    filt = jnp.asarray(rng.randint(0, 4, (r4, c4)), jnp.int32)
    inter4 = jnp.ones((r4, c4), bool)

    def step(rs):
        mc = mc_mxu.mc_cells(rs, mv16, refsel, compa, filt, inter4,
                             W, H, bpp, 2, 2, has_comp=bool(comp))
        return rs.at[0].set(mc & maxp)

    ms, ts = _chain_ms(step, refstack, lambda y: y[0, 0, 0], reps)
    nrefs = 2 if comp else 1
    byt = r4 * c4 * (11 * 11 * 4 * nrefs + 16 * 4)
    return {"kernel": f"mc_mxu_{'comp' if comp else 'single'}",
            "shape": f"{H}x{W}", "bpp": bpp, "ms": round(ms, 3),
            "GBps": round(byt / ms / 1e6, 2),
            "all_ms": [round(t, 3) for t in ts]}


def bench_lf_dense(rows, bpp, reps):
    """lpf_dense.lf_dense on the SAME synthetic edge population as
    bench_lf (records splatted to dense grids + on-device), so scan vs
    dense is a like-for-like A/B."""
    import jax
    import jax.numpy as jnp
    from ffmpeg_hybrid_tpu.ops import lpf_dense

    H, W = rows, 1920
    rng = np.random.RandomState(3)
    sb_rows, sb_cols = H // 64, W // 64
    # realistic edge population: every 8-px position eligible, ~50% on
    V = np.zeros((H // 8, W // 4, 4), np.int32)
    Hg = np.zeros((H // 4, W // 8, 4), np.int32)
    vocc = rng.rand(H // 8, W // 8) < 0.5
    hocc = rng.rand(H // 8, W // 8) < 0.5
    wd_v = rng.choice([4, 8, 16], (H // 8, W // 8)) * vocc
    wd_h = rng.choice([4, 8, 16], (H // 8, W // 8)) * hocc
    V[:, ::2, 0] = wd_v
    V[:, ::2, 1] = 120
    V[:, ::2, 2] = 40
    V[:, ::2, 3] = 2
    Hg[::2, :, 0] = wd_h
    Hg[::2, :, 1] = 120
    Hg[::2, :, 2] = 40
    Hg[::2, :, 3] = 2
    plane = jnp.asarray(rng.randint(0, 255, (1, H, W)), jnp.int32)
    Vd, Hd = jnp.asarray(V), jnp.asarray(Hg)

    def step(pl):
        return lpf_dense.lf_dense(pl, Vd, Hd, sb_rows, sb_cols,
                                  64, 64, bpp)

    ms, ts = _chain_ms(step, plane, lambda y: y[0, 0, 0], reps)
    nrec = int(vocc.sum() + hocc.sum())
    byt = nrec * 8 * 16 * 4 * 2
    out = [{"kernel": "lf_dense", "shape": f"{H}x{W}",
            "bpp": bpp, "ms": round(ms, 3),
            "GBps": round(byt / ms / 1e6, 2),
            "all_ms": [round(t, 3) for t in ts]}]

    # batched-position variant (the population above is 8px-grid only,
    # its validity domain)
    def step_par(pl):
        return lpf_dense.lf_dense_par(pl, Vd, Hd, sb_rows, sb_cols,
                                      64, 64, bpp)

    ms, ts = _chain_ms(step_par, plane, lambda y: y[0, 0, 0], reps)
    out.append({"kernel": "lf_dense_par", "shape": f"{H}x{W}",
                "bpp": bpp, "ms": round(ms, 3),
                "GBps": round(byt / ms / 1e6, 2),
                "all_ms": [round(t, 3) for t in ts]})
    return out


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


def _capture_coef_blocks(bpp):
    """Real per-block coefficient payloads: decode a mini_encoder
    keyframe with the pure-Python pass A, snapshotting the bool state,
    probs, scan/nb tables, nnz ctx and dequant at every transform
    block (same capture as tests/test_coef_pallas.py)."""
    sys.path.insert(0, os.path.join(ROOT, "tools"))
    from mini_encoder import encode_keyframe_random
    sys.path.pop(0)
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
    from ffmpeg_hybrid_tpu.codecs.vp9.blockdec import TileDecoder

    pkt = encode_keyframe_random(256, 256, bpp=bpp, seed=7, txfmmode=3,
                                 yac_qi=60, filter_level=0)
    caps = []
    orig = TileDecoder.decode_coeffs_block

    def wrapper(self, plane_coef, py, px, tx, is32, probs11, nnz, scan,
                nb, band_counts, qmul, cnt, eobcnt):
        c = self.c
        snap = (c.data, c.byte_pos, c.bit_pos, c.value, c.range)
        eob = orig(self, plane_coef, py, px, tx, is32, probs11, nnz,
                   scan, nb, band_counts, qmul, cnt, eobcnt)
        sz = 4 << tx
        n = sz * sz
        caps.append({
            "snap": snap, "tx": tx, "is32": bool(is32),
            "probs": np.asarray(probs11, np.int32).reshape(36, 11),
            "nnz": int(nnz),
            "scan": np.asarray(scan[:n], np.int32),
            "nb": np.asarray(nb[:n], np.int32).reshape(n, 2),
            "qmul": np.asarray(qmul[:2], np.int32),
            "eob": int(eob)})
        return eob

    TileDecoder.decode_coeffs_block = wrapper
    try:
        dec = VP9Decoder(recon_backend="golden", use_native=False)
        dec.decode_pass_a(pkt)
    finally:
        TileDecoder.decode_coeffs_block = orig
    return pkt, caps


def bench_rac(bpp, lanes, reps):
    """decode_coeffs_multi on REAL captured block payloads, S lanes in
    lockstep, vs the native C pass A on the same frame. Reported as
    tokens/s (a token = one decoded coefficient position incl. the
    implicit eob checks — the unit both paths share). The native
    number times the WHOLE pass A (syntax walk + coeffs), so it
    UNDERSTATES the C coefficient rate — if the device kernel loses
    against it the negative result is robust."""
    import jax
    import jax.numpy as jnp
    import time as _time
    from ffmpeg_hybrid_tpu.ops.rac_pallas import (
        decode_coeffs_multi, pack_windows, snapshot_to_state)

    pkt, caps = _capture_coef_blocks(bpp)
    tokens = sum(c["eob"] + 1 for c in caps)

    # native bar: full pass A wall time on the same packet (warm ctx)
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
    native_ms = None
    try:
        dec = VP9Decoder(recon_backend="golden", use_native=True)
        dec.decode_pass_a(pkt)  # warm marshal cache
        ts = []
        for _ in range(reps):
            dec2 = VP9Decoder(recon_backend="golden", use_native=True)
            t0 = _time.perf_counter()
            dec2.decode_pass_a(pkt)
            ts.append((_time.perf_counter() - t0) * 1e3)
        ts.sort()
        native_ms = ts[len(ts) // 2]
    except Exception:
        pass

    # device: batch blocks of one tx size into S-lane groups (pad by
    # repeating); every group is decoded by one pallas dispatch
    by_tx = {}
    for c in caps:
        by_tx.setdefault(c["tx"], []).append(c)
    tx = max(by_tx, key=lambda k: len(by_tx[k]) * (16 << (2 * k)))
    group_all = by_tx[tx]
    n = (4 << tx) ** 2
    Lw = 4 * n + 64

    def build(group):
        S = len(group)
        starts = [g["snap"][1] + (1 if g["snap"][2] else 0)
                  for g in group]
        half16 = pack_windows([g["snap"][0] for g in group], starts, Lw)
        v0, r0, bb0, nb_0 = snapshot_to_state(
            [g["snap"] for g in group], starts)
        return (jnp.asarray(half16), jnp.asarray(v0), jnp.asarray(r0),
                jnp.asarray(bb0), jnp.asarray(nb_0),
                jnp.asarray(np.stack([g["probs"] for g in group])),
                jnp.asarray(np.stack([g["scan"] for g in group])),
                jnp.asarray(np.stack([g["nb"][:, 0] for g in group])),
                jnp.asarray(np.stack([g["nb"][:, 1] for g in group])),
                jnp.asarray(np.asarray([g["nnz"] for g in group],
                                       np.int32)),
                jnp.asarray(np.stack([g["qmul"] for g in group])))

    results = []
    for S in lanes:
        group = (group_all * ((S // len(group_all)) + 1))[:S]
        args_d = build(group)
        gtok = sum(g["eob"] + 1 for g in group)

        def step(v0):
            coef, eob = decode_coeffs_multi(
                args_d[0], v0, *args_d[2:], n=n, bpp=bpp,
                is32=group[0]["is32"])
            # data dependency that cannot constant-fold: eob >= 0
            # always, so the added term is 0 at runtime
            return args_d[1] + jnp.minimum(eob.min(), 0)

        ms, ts = _chain_ms(step, args_d[1], lambda y: y[0], reps)
        results.append({
            "kernel": f"rac_coef_S{S}", "shape": f"tx{tx} n={n}",
            "bpp": bpp, "ms": round(ms, 3),
            "tokens_per_s": round(gtok / (ms / 1e3)),
            "all_ms": [round(t, 3) for t in ts]})

    results.append({
        "kernel": "rac_native_passA", "shape": "256x256 frame",
        "bpp": bpp, "ms": round(native_ms, 3) if native_ms else None,
        "tokens_per_s": round(tokens / (native_ms / 1e3))
        if native_ms else None,
        "note": "full native pass A (syntax+coeffs) on the same "
                "frame; understates the C coefficient-only rate"})
    return results


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
    only = os.environ.get("KB_ONLY")  # comma-sep kernel filter

    def want(k):
        return only is None or any(o in k for o in only.split(","))

    for bpp in (8, 10):
        if want("itxfm"):
            results.append(bench_itxfm(rows, bpp, args.reps))
        if want("mc_cells"):
            results.append(bench_mc(rows, bpp, False, args.reps))
            results.append(bench_mc(rows, bpp, True, args.reps))
        if want("mc_mxu"):
            results.append(bench_mc_mxu(rows, bpp, False, args.reps))
            results.append(bench_mc_mxu(rows, bpp, True, args.reps))
        if want("intra"):
            results.append(bench_intra(rows, bpp, args.reps))
        if want("lf_scan"):
            results.append(bench_lf(rows, bpp, args.reps))
        if want("lf_dense"):
            results.extend(bench_lf_dense(rows, bpp, args.reps))
        if want("rac") and (platform != "cpu" or only):
            # real-pallas only by default (interpret mode on CPU is a
            # simulator, not a measurement)
            results.extend(bench_rac(bpp, (4, 16, 64), args.reps))

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
        rate = (f"{r['GBps']:8.2f}" if "GBps" in r
                else f"{(r.get('tokens_per_s') or 0) / 1e6:6.2f}Mt/s")
        ms = r["ms"] if r["ms"] is not None else float("nan")
        print(f"{r['kernel']:22s} {r['shape']:16s} {r['bpp']:<3d} "
              f"{ms:8.3f} {rate}")
    print(f"written: {args.out}")


if __name__ == "__main__":
    main()
