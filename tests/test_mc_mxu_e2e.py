"""End-to-end decode with the MXU MC kernel forced on (FFH_MC=mxu):
the full TPU-backend pipeline must stay bit-exact vs the oracle md5
when _recon_plane_inter routes MC through ops/mc_mxu.py — covering the
integration wiring (has_comp static flag, compound, switchable
filters, sub8x8 MVs) that tests/test_mc_mxu.py's unit grids do not."""
import hashlib
import os

import pytest

VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")


@pytest.mark.parametrize("vec", [
    "inter_176x144_10f",   # rich inter stream, no compound
    "mini_comp",           # compound prediction (2-ref MC path)
    "mini_filters",        # bilinear/sharp/regular filter banks
])
def test_e2e_mxu_mc(vec, monkeypatch):
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
    from ffmpeg_hybrid_tpu.formats.ivf import read_ivf
    from ffmpeg_hybrid_tpu.formats.superframe import split_superframe
    from ffmpeg_hybrid_tpu.formats.framemd5 import parse_framemd5

    path = os.path.join(VEC_DIR, vec + ".ivf")
    if not os.path.exists(path):
        pytest.skip("vector corpus not generated")
    monkeypatch.setenv("FFH_MC", "mxu")
    ref = parse_framemd5(os.path.join(VEC_DIR, vec + ".framemd5"))
    _i, pkts = read_ivf(path)
    dec = VP9Decoder(recon_backend="tpu")
    got = []
    for pts, data in pkts:
        for _p, fd in split_superframe(data, pts):
            for f in dec.decode(fd):
                got.append(hashlib.md5(f.to_bytes()).hexdigest())
    assert got == [m for _s, m in ref]
