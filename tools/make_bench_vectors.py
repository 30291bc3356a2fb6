#!/usr/bin/env python3
"""Generate the committed benchmark vectors (cv2/libvpx encode, oracle
remux + framemd5): bench_1080p (30 frames) and bench_4k (12 frames,
multi-tile). Mirrors tools/make_vectors.py's pipeline; the bench clips
are moving synthetic content so inter frames carry real MC + residuals.

Usage: python tools/make_bench_vectors.py [1080p|4k] ...
"""
import os
import subprocess
import sys

import cv2
import numpy as np

ORACLE = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "ffmpeg")
VEC = os.path.join(os.path.dirname(__file__), "..", "vectors")


def synth(w, h, n, seed):
    rng = np.random.RandomState(seed)
    bg = cv2.GaussianBlur(
        rng.randint(0, 255, (h, w, 3), dtype=np.uint8), (31, 31), 12)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        m = np.float32([[1, 0, (i * 3) % 32], [0, 1, (i * 2) % 32]])
        f = cv2.warpAffine(bg, m, (w, h), borderMode=cv2.BORDER_REFLECT)
        # moving blocks so residuals stay nonzero
        x0 = (i * 97) % max(1, w - 64)
        y0 = (i * 61) % max(1, h - 64)
        f[y0:y0 + 64, x0:x0 + 64] = (
            (xx[:64, :64] + yy[:64, :64] + i * 13) % 256
        ).astype(np.uint8)[..., None]
        frames.append(f)
    return frames


def make(name, w, h, n, seed):
    webm = os.path.join(VEC, name + ".webm")
    ivf = os.path.join(VEC, name + ".ivf")
    wr = cv2.VideoWriter(webm, cv2.VideoWriter_fourcc(*"VP90"), 30,
                         (w, h))
    assert wr.isOpened(), f"VideoWriter failed for {w}x{h}"
    for f in synth(w, h, n, seed):
        wr.write(f)
    wr.release()
    subprocess.run([ORACLE, "-nostdin", "-y", "-i", webm, "-c", "copy",
                    "-f", "ivf", ivf], check=True, capture_output=True)
    out = subprocess.run([ORACLE, "-nostdin", "-bitexact", "-i", ivf,
                          "-map", "0:v", "-f", "framemd5", "-"],
                         check=True, capture_output=True)
    with open(os.path.join(VEC, name + ".framemd5"), "wb") as fh:
        fh.write(out.stdout)
    os.remove(webm)
    print(f"{name}: {w}x{h} x{n} frames,",
          os.path.getsize(ivf), "bytes")


def main():
    which = sys.argv[1:] or ["4k"]
    if "1080p" in which:
        make("bench_1080p", 1920, 1080, 30, 77)
    if "4k" in which:
        make("bench_4k", 3840, 2160, 12, 78)


if __name__ == "__main__":
    main()
