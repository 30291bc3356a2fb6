"""Decode CLI (python -m ffmpeg_hybrid_tpu) — the fftools equivalent.
framemd5 output must be line-identical to the oracle's from the data
rows down (header #software differs by design)."""
import os
import subprocess
import sys

import pytest

VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")
REPO = os.path.join(os.path.dirname(__file__), "..")


def run_cli(*args):
    return subprocess.run(
        [sys.executable, "-m", "ffmpeg_hybrid_tpu", *args],
        capture_output=True, cwd=REPO,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})


@pytest.mark.parametrize("name,pipeline", [
    ("mini_comp_sw", True), ("intra_98x66", True),
    ("superframe", False), ("show_existing", False)])
def test_cli_framemd5_matches_oracle(name, pipeline):
    ivf = os.path.join(VEC_DIR, name + ".ivf")
    if not os.path.exists(ivf):
        pytest.skip("vectors not generated")
    args = [ivf] if pipeline else [ivf, "--no-pipeline"]
    out = run_cli(*args)
    assert out.returncode == 0, out.stderr.decode()[-500:]
    got = [l for l in out.stdout.decode().splitlines()
           if not l.startswith("#")]
    ref = [l for l in open(os.path.join(VEC_DIR, name + ".framemd5"))
           .read().splitlines() if not l.startswith("#")]
    assert got == ref


def test_cli_webm_input():
    path = os.path.join(VEC_DIR, "webm_sb.webm")
    if not os.path.exists(path):
        pytest.skip("webm vectors not generated")
    out = run_cli(path)
    assert out.returncode == 0, out.stderr.decode()[-500:]
    from ffmpeg_hybrid_tpu.formats.framemd5 import parse_framemd5
    got = [(int(p[4]), p[5]) for p in
           ([q.strip() for q in l.split(",")]
            for l in out.stdout.decode().splitlines()
            if l and not l.startswith("#"))]
    ref = parse_framemd5(os.path.join(VEC_DIR, "webm_sb.framemd5"))
    assert got == ref


def test_cli_y4m(tmp_path):
    ivf = os.path.join(VEC_DIR, "intra_64.ivf")
    if not os.path.exists(ivf):
        pytest.skip("vectors not generated")
    dst = tmp_path / "o.y4m"
    out = run_cli(ivf, "-f", "y4m", "-o", str(dst))
    assert out.returncode == 0, out.stderr.decode()[-500:]
    data = dst.read_bytes()
    assert data.startswith(b"YUV4MPEG2 W64 H64 F30:1")
    assert b"FRAME\n" in data
    frame_sz = 64 * 64 * 3 // 2
    assert len(data.split(b"FRAME\n", 1)[1]) == frame_sz


def test_cli_parser_flags():
    from ffmpeg_hybrid_tpu.formats.parser import (parse_frame_flags,
                                                  parse_packet_flags)
    from ffmpeg_hybrid_tpu.formats.ivf import read_ivf
    ivf = os.path.join(VEC_DIR, "show_existing.ivf")
    if not os.path.exists(ivf):
        pytest.skip("vectors not generated")
    info, pkts = read_ivf(ivf)
    all_flags = [parse_packet_flags(d) for _pts, d in pkts]
    flat = [f for fl in all_flags for f in fl]
    assert flat[0].keyframe and flat[0].shows
    assert any(f.show_existing for f in flat)
    sf = os.path.join(VEC_DIR, "superframe.ivf")
    if os.path.exists(sf):
        info, pkts = read_ivf(sf)
        flat = [f for _pts, d in pkts for f in parse_packet_flags(d)]
        assert any(f.invisible for f in flat)
    with pytest.raises(ValueError):
        parse_frame_flags(b"\x00\x00")
