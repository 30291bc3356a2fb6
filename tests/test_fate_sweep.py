"""FATE-breadth conformance sweep (tools/make_fate_vectors.py):
all 64 quantizer indices, sharpness 1-7, the two odd-size grids,
the multi-factor dynamic-resize chain and 10/12-bit 4:4:0 — decoded
bit-exactly on BOTH backends against the oracle's framemd5.

Mirrors the reference's FATE coverage (tests/fate/vpx.mak:109-123:
VP9_Q / VP9_SHARP / VP9_SIZE_A / VP9_SIZE_B / 05-resize)."""
import os

import pytest

from ffmpeg_hybrid_tpu.formats.framemd5 import (parse_framemd5,
                                                decode_file_md5s)

VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")

SIZE_A = [8, 10, 16, 18, 32, 34, 64, 66]
SIZE_B = [196, 198, 200, 202, 208, 210, 224, 226]

SWEEP = (["fate_q%02d" % q for q in range(64)]
         + ["fate_sharp%d" % s for s in range(1, 8)]
         + ["fate_size_%dx%d" % (w, h) for w in SIZE_A for h in SIZE_A]
         + ["fate_sizeb_%dx%d" % (w, h) for w in SIZE_B for h in SIZE_B]
         + ["fate_resize", "fate_440_10", "fate_440_12"])


def _check(name, backend):
    path = os.path.join(VEC_DIR, name + ".ivf")
    ref = os.path.join(VEC_DIR, name + ".framemd5")
    if not os.path.exists(path):
        pytest.skip("fate sweep corpus not generated "
                    "(tools/make_fate_vectors.py)")
    want = parse_framemd5(ref)
    got = decode_file_md5s(path, backend=backend)
    assert len(got) == len(want), \
        f"{name} [{backend}]: {len(got)} frames vs {len(want)}"
    for i, (w, g) in enumerate(zip(want, got)):
        assert g[1] == w[1], f"{name} [{backend}] frame {i}: md5 mismatch"


@pytest.mark.parametrize("name", SWEEP)
def test_fate_sweep_golden(name):
    _check(name, "golden")


@pytest.mark.parametrize("name", SWEEP)
def test_fate_sweep_tpu(name):
    _check(name, "tpu")
