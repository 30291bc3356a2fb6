"""Differential test: native compressed-header parser vs the Python
reference parser (header.parse_compressed_header), cross-checked on
every frame of a mix of vectors (keyframes, inter frames with mv/comp
updates, switchable filter, 10-bit)."""
import copy
import os

import numpy as np
import pytest

from ffmpeg_hybrid_tpu import passa_native
from ffmpeg_hybrid_tpu.codecs.vp9 import decoder as D
from ffmpeg_hybrid_tpu.codecs.vp9.header import parse_compressed_header
from ffmpeg_hybrid_tpu.codecs.vp9.probs import Probs
from ffmpeg_hybrid_tpu.formats.ivf import read_ivf
from ffmpeg_hybrid_tpu.formats.superframe import split_superframe

VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")

VECTORS = ["inter_176x144_noise", "inter_66x66_5f", "superframe",
           "mini_scaled", "mini_rand10_96x64", "inter_176x144_10f"]


@pytest.mark.skipif(not passa_native.available(),
                    reason="native pass A not built")
@pytest.mark.parametrize("name", VECTORS)
def test_chdr_native_matches_python(name, monkeypatch):
    path = os.path.join(VEC_DIR, name + ".ivf")
    if not os.path.exists(path):
        pytest.skip(f"vector {name} missing")
    real = passa_native.parse_chdr_native
    checked = [0]

    def checking(data, h, probs, **kw):
        py_probs = probs.copy()
        py_h = copy.copy(h)
        ok = real(data, h, probs)
        if not ok:
            return ok
        coef11, _ = parse_compressed_header(data, py_h, py_probs)
        assert py_h.txfmmode == h.txfmmode
        if not (h.keyframe or h.intraonly):
            assert py_h.comppredmode == h.comppredmode
        for f in Probs.FIELDS:
            assert np.array_equal(getattr(py_probs, f),
                                  getattr(probs, f)), (name, f)
        assert np.array_equal(py_probs.coef, probs.coef)
        checked[0] += 1
        return ok

    monkeypatch.setattr(passa_native, "parse_chdr_native", checking)
    dec = D.VP9Decoder(recon_backend="golden")
    info, pkts = read_ivf(path)
    for pts, data in pkts:
        for _, fd in split_superframe(data, pts):
            dec.decode(fd)
    assert checked[0] > 0
