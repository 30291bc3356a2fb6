#!/usr/bin/env python3
"""Generate local VP9 test vectors using OpenCV's bundled libvpx encoder,
remuxed to IVF via the oracle ffmpeg, with oracle framemd5 files alongside.

This stands in for the libvpx conformance corpus (no network access): the
oracle decoder (reference FFmpeg build) provides the bit-exactness hashes,
mirroring the FATE framemd5 mechanism (reference: tests/fate-run.sh:164-174).

Usage: python tools/make_vectors.py [outdir]
"""
import os
import subprocess
import sys

import cv2
import numpy as np

ORACLE = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "ffmpeg")


def synth_frames(w, h, n, seed, kind):
    rng = np.random.RandomState(seed)
    frames = []
    if kind == "blur":
        img = cv2.GaussianBlur(
            rng.randint(0, 255, (h, w, 3), dtype=np.uint8), (11, 11), 4)
        for i in range(n):
            m = np.float32([[1, 0, (i * 2) % 8], [0, 1, (i * 3) % 8]])
            frames.append(cv2.warpAffine(img, m, (w, h),
                                         borderMode=cv2.BORDER_REFLECT))
    elif kind == "gradient":
        yy, xx = np.mgrid[0:h, 0:w]
        for i in range(n):
            f = ((xx * 3 + yy * 2 + i * 11) % 256).astype(np.uint8)
            frames.append(np.stack(
                [f, 255 - f, ((f.astype(np.int32) * 2) % 256
                              ).astype(np.uint8)], axis=-1))
    elif kind == "noise":
        for i in range(n):
            frames.append(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
    elif kind == "moving":
        bg = cv2.GaussianBlur(
            rng.randint(0, 255, (h, w, 3), dtype=np.uint8), (15, 15), 6)
        for i in range(n):
            f = bg.copy()
            x0 = (i * 7) % max(1, w - 16)
            y0 = (i * 5) % max(1, h - 16)
            f[y0:y0 + 16, x0:x0 + 16] = (255, 64, 32)
            frames.append(f)
    return frames


def make_vector(outdir, name, w, h, n, seed=42, kind="blur"):
    webm = os.path.join(outdir, name + ".webm")
    ivf = os.path.join(outdir, name + ".ivf")
    md5f = os.path.join(outdir, name + ".framemd5")
    wr = cv2.VideoWriter(webm, cv2.VideoWriter_fourcc(*"VP90"), 30, (w, h))
    assert wr.isOpened(), f"VideoWriter failed for {w}x{h}"
    for f in synth_frames(w, h, n, seed, kind):
        wr.write(f)
    wr.release()
    subprocess.run([ORACLE, "-nostdin", "-y", "-i", webm, "-c", "copy",
                    "-f", "ivf", ivf], check=True, capture_output=True)
    out = subprocess.run([ORACLE, "-nostdin", "-bitexact", "-i", ivf,
                          "-map", "0:v", "-f", "framemd5", "-"],
                         check=True, capture_output=True)
    with open(md5f, "wb") as fh:
        fh.write(out.stdout)
    os.remove(webm)
    print(f"{name}: {w}x{h} x{n} frames")


INTRA_VECTORS = [
    # single-frame => keyframe-only (intra)
    ("intra_64", 64, 64, 1, 1, "blur"),
    ("intra_64_noise", 64, 64, 1, 2, "noise"),
    ("intra_66x66", 66, 66, 1, 3, "blur"),       # odd size: edge clipping
    ("intra_98x66", 98, 66, 1, 4, "gradient"),
    ("intra_130x98", 130, 98, 1, 5, "moving"),
    ("intra_176x144", 176, 144, 1, 6, "blur"),
    ("intra_200x120_noise", 200, 120, 1, 7, "noise"),
    ("intra_352x288", 352, 288, 1, 8, "moving"),
]

INTER_VECTORS = [
    ("inter_64_5f", 64, 64, 5, 11, "moving"),
    ("inter_66x66_5f", 66, 66, 5, 12, "moving"),
    ("inter_130x98_8f", 130, 98, 8, 13, "moving"),
    ("inter_176x144_10f", 176, 144, 10, 14, "moving"),
    ("inter_176x144_noise", 176, 144, 6, 15, "noise"),
    ("inter_352x288_10f", 352, 288, 10, 16, "moving"),
    ("inter_grad_8f", 160, 128, 8, 17, "gradient"),
]


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "vectors")
    os.makedirs(outdir, exist_ok=True)
    for spec in INTRA_VECTORS + INTER_VECTORS:
        make_vector(outdir, *spec)


if __name__ == "__main__":
    main()
