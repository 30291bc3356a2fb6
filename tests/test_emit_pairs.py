"""Direct pair emission (native pass A, TPU mode): bit-exactness of the
overflow-retry path and emit/dense equivalence.

The native decode emits merged (pos, value) pair rows during the
coefficient decode itself (Ctx.emit_pairs). When a pathological frame
overflows the 1/3-density pair buffer the C decoder returns -3 and the
Python wrapper re-runs the frame densely; this must be bit-exact."""
import hashlib
import os

import numpy as np
import pytest

from ffmpeg_hybrid_tpu import passa_native
from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
from ffmpeg_hybrid_tpu.formats.framemd5 import parse_framemd5
from ffmpeg_hybrid_tpu.formats.ivf import read_ivf
from ffmpeg_hybrid_tpu.formats.superframe import split_superframe

VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")


def _packets(name):
    info, pkts = read_ivf(os.path.join(VEC_DIR, name + ".ivf"))
    out = []
    for pts, data in pkts:
        out.extend(fd for _, fd in split_superframe(data, pts))
    return out


def _hashes(dec, packets):
    out = []
    for fd in packets:
        for f in dec.decode(fd):
            out.append(hashlib.md5(f.to_bytes()).hexdigest())
    return out


@pytest.mark.skipif(not passa_native.available(),
                    reason="native pass A not built")
def test_overflow_retry_bitexact():
    name = "inter_176x144_noise"
    packets = _packets(name)
    ref = [h for _n, h in parse_framemd5(
        os.path.join(VEC_DIR, name + ".framemd5"))]

    dec = VP9Decoder(recon_backend="tpu")
    # first frame allocates the geometry pool; then shrink the pair
    # buffers so every later frame overflows and takes the dense retry
    for f in dec.decode(packets[0]):
        assert hashlib.md5(f.to_bytes()).hexdigest() == ref[0]
    key, gens = dec._geom_pool
    retried = []
    orig = passa_native.decode_tiles_native

    def counting(s, data):
        ok = orig(s, data)
        retried.append(s.coef_pairs is None)
        return ok

    for g in gens:
        g["coef_pairs_buf"] = np.zeros((64 * 4,), np.int16)
    passa_native.decode_tiles_native = counting
    try:
        hashes = _hashes(dec, packets[1:])
    finally:
        passa_native.decode_tiles_native = orig
    assert hashes == ref[1:len(hashes) + 1]
    assert any(retried), "tiny pair buffer never triggered the retry"


@pytest.mark.skipif(not passa_native.available(),
                    reason="native pass A not built")
def test_emit_matches_dense():
    """Force-disable emission; output must match the emitting decode."""
    name = "inter_66x66_5f"
    packets = _packets(name)
    d1 = VP9Decoder(recon_backend="tpu")
    h1 = _hashes(d1, packets)
    d2 = VP9Decoder(recon_backend="tpu")
    d2._emit_disable = True
    h2 = _hashes(d2, packets)
    assert h1 == h2
