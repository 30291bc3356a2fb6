#!/usr/bin/env python3
"""FATE-breadth conformance sweep: the vector classes the reference's
FATE suite asserts (tests/fate/vpx.mak:96-154) that the local corpus
was missing, generated with the mini encoder and hashed by the oracle:

  * all 64 quantizer indices (vp90-2-00-quantizer-00..63): q0 is the
    normative lossless/WHT path, q1..63 random syntax at that index;
  * sharpness 1..7 (vp90-2-01-sharpness-*): the lim-LUT rebuild rule;
  * the odd-size grid 8..66 (vp90-2-02-size-WxH): every {8,10,16,18,
    32,34,64,66}^2 combination — 1/2-SB frames, partial edge blocks;
  * the large odd-size grid 196..226 (vp90-2-03-size-WxH);
  * a mid-stream multi-factor dynamic-resize chain (vp90-2-05-resize):
    each inter frame references the PREVIOUS frame at a different
    size (2.0x down, 1.5x up, 2x down, 1.78x up — scaled MC);
  * 10/12-bit 4:4:0 keyframes (the corpus had 8-bit 4:4:0 only).

Usage: python tools/make_fate_vectors.py [--only CLASS]
Writes vectors/fate_*.ivf + .framemd5 (oracle hashes).
"""
import os
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))

ORACLE = os.path.join(ROOT, ".oracle", "build", "ffmpeg")
VEC = os.path.join(ROOT, "vectors")


def emit(name, w, h, pkts, noautoscale=False):
    """Write an IVF + oracle framemd5; returns False on oracle error."""
    from ffmpeg_hybrid_tpu.formats.ivf import write_ivf
    path = os.path.join(VEC, name + ".ivf")
    write_ivf(path, b"VP90", w, h, 30, 1,
              [(i * 33, p) for i, p in enumerate(pkts)])
    cmd = [ORACLE, "-nostdin", "-bitexact", "-i", path, "-map", "0:v"]
    if noautoscale:
        cmd.append("-noautoscale")
    cmd += ["-f", "framemd5", "-"]
    out = subprocess.run(cmd, capture_output=True)
    if out.returncode != 0:
        print(name, "ORACLE FAILED:",
              out.stderr.decode().strip().splitlines()[-1])
        os.remove(path)
        return False
    with open(os.path.join(VEC, name + ".framemd5"), "wb") as fh:
        fh.write(out.stdout)
    return True


def gen_quantizers():
    from mini_encoder import (encode_keyframe_random,
                              encode_keyframe_lossless)
    n = 0
    rng = np.random.RandomState(900)
    y = rng.randint(0, 256, (144, 176))
    u = rng.randint(0, 256, (72, 88))
    v = rng.randint(0, 256, (72, 88))
    n += emit("fate_q00", 176, 144, [encode_keyframe_lossless(y, u, v)])
    for q in range(1, 64):
        pkt = encode_keyframe_random(176, 144, 8, seed=900 + q,
                                     yac_qi=q, filter_level=0)
        n += emit("fate_q%02d" % q, 176, 144, [pkt])
    print(f"quantizers: {n}/64")


def gen_sharpness():
    from mini_encoder import encode_keyframe_random
    n = 0
    for s in range(1, 8):
        pkt = encode_keyframe_random(176, 144, 8, seed=970 + s,
                                     yac_qi=50, filter_level=32,
                                     sharpness=s)
        n += emit("fate_sharp%d" % s, 176, 144, [pkt])
    print(f"sharpness: {n}/7")


SIZE_A = [8, 10, 16, 18, 32, 34, 64, 66]
SIZE_B = [196, 198, 200, 202, 208, 210, 224, 226]


def gen_sizes(sizes, tag, seed0):
    from mini_encoder import encode_keyframe_random
    n = tot = 0
    for w in sizes:
        for h in sizes:
            tot += 1
            pkt = encode_keyframe_random(
                w, h, 8, seed=seed0 + w * 997 + h, yac_qi=60,
                filter_level=24)
            n += emit("fate_%s_%dx%d" % (tag, w, h), w, h, [pkt])
    print(f"sizes {tag}: {n}/{tot}")


def gen_resize():
    """Multi-factor resize chain: every inter frame sources the
    previous frame at a different size via slot 0 (scaled MC both
    directions; reference: vp9recon.c:492-628 scaled path)."""
    from mini_encoder import (encode_keyframe_lossless,
                              encode_inter_flex)
    rng = np.random.RandomState(888)
    y = rng.randint(0, 256, (192, 192))
    u = rng.randint(0, 256, (96, 96))
    v = rng.randint(0, 256, (96, 96))
    pkts = [encode_keyframe_lossless(y, u, v)]   # 192x192, all slots
    chain = [96, 144, 72, 128]                   # /2, x1.5, /2, x1.78
    for i, sz in enumerate(chain):
        pkts.append(encode_inter_flex(
            sz, sz, seed=777 + i, refidx=(0, 0, 0),
            refresh_mask=0x01, coeffs=True, p_skip=0.2,
            mv_mags=(0, 2, 8, 24)))
    ok = emit("fate_resize", 192, 192, pkts, noautoscale=True)
    print(f"resize chain: {'ok' if ok else 'FAILED'}")


def gen_hbd_440():
    from mini_encoder import encode_keyframe_random
    n = 0
    for bpp in (10, 12):
        pkt = encode_keyframe_random(96, 64, bpp, seed=600 + bpp,
                                     yac_qi=40, filter_level=20,
                                     ss_h=0, ss_v=1)
        n += emit("fate_440_%d" % bpp, 96, 64, [pkt])
    print(f"10/12-bit 4:4:0: {n}/2")


def main():
    only = None
    if len(sys.argv) > 2 and sys.argv[1] == "--only":
        only = sys.argv[2]
    os.makedirs(VEC, exist_ok=True)
    jobs = {"quantizers": gen_quantizers,
            "sharpness": gen_sharpness,
            "size_a": lambda: gen_sizes(SIZE_A, "size", 1000),
            "size_b": lambda: gen_sizes(SIZE_B, "sizeb", 5000),
            "resize": gen_resize,
            "hbd440": gen_hbd_440}
    for name, fn in jobs.items():
        if only and name != only:
            continue
        fn()


if __name__ == "__main__":
    main()
