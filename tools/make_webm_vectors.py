#!/usr/bin/env python3
"""WebM container test vectors.

Three sources, all hash-validated by the oracle's matroska demuxer:
- cv2's own WebM writer (real-world muxer output, SimpleBlocks)
- our write_webm with SimpleBlock / BlockGroup layouts
- our write_webm with Xiph / fixed / EBML lacing

Each produces <name>.webm + <name>.framemd5 in vectors/.
"""
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ffmpeg_hybrid_tpu.formats.webm import write_webm  # noqa: E402

VEC = os.path.join(os.path.dirname(__file__), "..", "vectors")
ORACLE = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "ffmpeg")


def oracle_md5(path):
    out = subprocess.run(
        [ORACLE, "-nostdin", "-bitexact", "-i", path, "-map", "0:v",
         "-noautoscale", "-f", "framemd5", "-"], capture_output=True)
    if out.returncode != 0:
        return None, out.stderr.decode().strip().splitlines()[-1]
    return out.stdout, None


def emit(name, path):
    md5, err = oracle_md5(path)
    if md5 is None:
        print(name, "ORACLE FAILED:", err)
        return False
    with open(os.path.join(VEC, name + ".framemd5"), "wb") as fh:
        fh.write(md5)
    nf = len([l for l in md5.decode().splitlines()
              if l and not l.startswith("#")])
    print(name, f"{nf} frame(s)")
    return True


def main():
    # 1. cv2-muxed WebM (kept as .webm, not remuxed)
    import cv2
    name = "webm_cv2"
    path = os.path.join(VEC, name + ".webm")
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"VP90"), 30,
                         (176, 144))
    assert wr.isOpened()
    rng = np.random.RandomState(5)
    img = cv2.GaussianBlur(rng.randint(0, 255, (144, 176, 3),
                                       dtype=np.uint8), (11, 11), 4)
    for i in range(8):
        m = np.float32([[1, 0, (i * 2) % 8], [0, 1, (i * 3) % 8]])
        wr.write(cv2.warpAffine(img, m, (176, 144),
                                borderMode=cv2.BORDER_REFLECT))
    wr.release()
    emit(name, path)

    # 2. our muxer: SimpleBlock and BlockGroup layouts over mini-encoder
    # keyframes (different content per frame -> different sizes)
    import mini_encoder as me
    rng = np.random.RandomState(9)

    def kf(seed):
        r = np.random.RandomState(seed)
        return me.encode_keyframe_lossless(
            r.randint(0, 256, (64, 64)), r.randint(0, 256, (32, 32)),
            r.randint(0, 256, (32, 32)), 8)

    pkts = [(i * 33, kf(40 + i)) for i in range(4)]
    for name, kwargs in [
        ("webm_sb", dict()),
        ("webm_bg", dict(block_groups=True)),
        ("webm_lace_xiph", dict(lacing="xiph")),
        ("webm_lace_ebml", dict(lacing="ebml")),
    ]:
        path = os.path.join(VEC, name + ".webm")
        write_webm(path, 64, 64, pkts, **kwargs)
        emit(name, path)

    # fixed lacing needs equal frame sizes: repeat one keyframe
    p = kf(40)
    path = os.path.join(VEC, "webm_lace_fixed.webm")
    write_webm(path, 64, 64, [(i * 33, p) for i in range(3)],
               lacing="fixed")
    emit("webm_lace_fixed", path)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(__file__))
    main()
