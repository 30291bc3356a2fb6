"""WebM/Matroska demuxer tests: e2e conformance through real container
files (cv2-muxed + our muxer's SimpleBlock/BlockGroup/lacing layouts,
all hash-validated by the oracle's matroska demuxer), plus malformed-
input behavior (raise, never hang).

reference: libavformat/matroskadec.c (VP9 subset)."""
import os

import pytest

from ffmpeg_hybrid_tpu.formats.framemd5 import (parse_framemd5,
                                                decode_file_md5s)
from ffmpeg_hybrid_tpu.formats.webm import read_webm, write_webm

VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")

WEBM = ["webm_cv2", "webm_sb", "webm_bg", "webm_lace_xiph",
        "webm_lace_ebml", "webm_lace_fixed"]


@pytest.mark.parametrize("name", WEBM)
def test_webm_conformance(name):
    path = os.path.join(VEC_DIR, name + ".webm")
    if not os.path.exists(path):
        pytest.skip("webm vectors not generated "
                    "(tools/make_webm_vectors.py)")
    ref = parse_framemd5(os.path.join(VEC_DIR, name + ".framemd5"))
    got = decode_file_md5s(path)
    assert len(got) == len(ref), f"{name}: {len(got)} != {len(ref)} frames"
    for i, (r, g) in enumerate(zip(ref, got)):
        assert r == g, f"{name} frame {i}: mismatch"


def test_webm_roundtrip_packets(tmp_path):
    """Muxer->demuxer round trip returns the exact packet bytes in order
    for every layout."""
    pkts = [(i * 33, bytes([i]) * (20 + 7 * i)) for i in range(5)]
    for kwargs in (dict(), dict(block_groups=True), dict(lacing="xiph"),
                   dict(lacing="ebml")):
        p = tmp_path / "t.webm"
        write_webm(str(p), 64, 64, pkts, **kwargs)
        got = [d for _pts, d in read_webm(str(p))]
        assert got == [d for _, d in pkts], kwargs
    # fixed lacing (equal sizes)
    pkts = [(i * 33, b"\x42" * 33) for i in range(4)]
    p = tmp_path / "f.webm"
    write_webm(str(p), 64, 64, pkts, lacing="fixed")
    assert [d for _pts, d in read_webm(str(p))] == [d for _, d in pkts]


def test_webm_non_vp9_track_yields_nothing(tmp_path):
    p = tmp_path / "vp8.webm"
    write_webm(str(p), 64, 64, [(0, b"x" * 10)], codec=b"V_VP8")
    assert list(read_webm(str(p))) == []


def test_webm_not_ebml():
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".webm") as f:
        f.write(b"DKIF" + b"\x00" * 100)
        f.flush()
        with pytest.raises(ValueError):
            list(read_webm(f.name))


def test_webm_truncated_raises(tmp_path):
    """Every truncation point must raise (or yield fewer packets) in
    bounded time — never hang or read out of bounds."""
    p = tmp_path / "t.webm"
    pkts = [(i * 33, bytes([i]) * 40) for i in range(3)]
    write_webm(str(p), 64, 64, pkts, lacing="ebml")
    data = p.read_bytes()
    q = tmp_path / "trunc.webm"
    for cut in range(1, len(data), 7):
        q.write_bytes(data[:cut])
        try:
            list(read_webm(str(q)))
        except ValueError:
            pass


def test_webm_garbage_raises(tmp_path):
    """Bit-flipped headers raise or terminate; no hangs, no segfaults."""
    p = tmp_path / "t.webm"
    write_webm(str(p), 64, 64, [(0, b"k" * 64), (33, b"l" * 64)])
    data = bytearray(p.read_bytes())
    q = tmp_path / "fuzz.webm"
    for pos in range(0, min(len(data), 120)):
        mut = bytearray(data)
        mut[pos] ^= 0xFF
        q.write_bytes(bytes(mut))
        try:
            list(read_webm(str(q)))
        except ValueError:
            pass
