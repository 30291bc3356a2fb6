#!/usr/bin/env python3
"""bench_1080p_lf: a 1080p clip whose every frame runs the loop
filter hard (filter_level 24-63, mixed sharpness) — the committed
bench clips (cv2-encoded) carry filter_level=0 on every frame, so the
LF kernels never appear in the headline number. Keyframes come from
the mini encoder's random-syntax generator (all tx sizes incl. 4x4 —
the 4px-offset edges that force the serial LF chains).

    python tools/make_lf_bench_vector.py [n_frames]
"""
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tools"))


def main():
    from mini_encoder import encode_keyframe_random
    from ffmpeg_hybrid_tpu.formats.ivf import write_ivf

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    w, h = 1920, 1080
    specs = [(24, 0), (32, 2), (48, 0), (63, 5), (40, 7), (56, 1)]
    pkts = []
    for i in range(n):
        flt, sharp = specs[i % len(specs)]
        print(f"frame {i}: lf={flt} sharp={sharp}", flush=True)
        # 4 tile columns: the layout real 1080p encoders use, and what
        # keeps pass A threadable (a single-tile frame serializes the
        # whole entropy decode)
        pkts.append((i * 33, encode_keyframe_random(
            w, h, 8, seed=500 + i, txfmmode=3, yac_qi=60,
            filter_level=flt, sharpness=sharp, tile_cols_log2=2)))
    path = os.path.join(ROOT, "vectors", "bench_1080p_lf.ivf")
    write_ivf(path, b"VP90", w, h, 30, 1, pkts)
    oracle = os.path.join(ROOT, ".oracle", "build", "ffmpeg")
    out = subprocess.run(
        [oracle, "-nostdin", "-bitexact", "-i", path, "-map", "0:v",
         "-f", "framemd5", "-"], capture_output=True)
    if out.returncode != 0:
        print("ORACLE FAILED:", out.stderr.decode()[-400:])
        sys.exit(1)
    with open(os.path.join(ROOT, "vectors",
                           "bench_1080p_lf.framemd5"), "wb") as fh:
        fh.write(out.stdout)
    print(f"bench_1080p_lf: {n} frames, "
          f"{os.path.getsize(path) / 1e6:.1f} MB")


if __name__ == "__main__":
    main()
