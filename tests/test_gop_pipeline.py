"""Chained-GOP stripe pipeline (parallel/gop_pipeline.py): CONSECUTIVE
chained inter frames (each referencing the previous, refresh_mask=0x01)
decode across the "gop" mesh axis with per-step ppermute forwarding of
reconstructed stripes — bit-exact against the serial golden decoder.

This is the mesh-native analogue of the reference's frame threading
with row-granular progress (pthread_frame.c:501 + progressframe.h:88).
"""
import os
import sys

import numpy as np
import pytest
import jax
from jax.sharding import Mesh

from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
from ffmpeg_hybrid_tpu.parallel.gop_pipeline import decode_chained_gop

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _chained_stream(w, h, n_inter, seed=3, flt=0):
    sys.path.insert(0, TOOLS)
    try:
        from mini_encoder import encode_keyframe_random, encode_inter_flex
    finally:
        sys.path.pop(0)
    pkts = [encode_keyframe_random(w, h, 8, seed=seed, txfmmode=3,
                                   yac_qi=60, filter_level=flt)]
    for i in range(n_inter):
        pkts.append(encode_inter_flex(
            w, h, seed=seed + 10 + i, coeffs=True, p_intra=0.0,
            p_skip=0.3, mv_mags=(0, 2, 4, 8, 16),
            refresh_mask=0x01, filter_level=flt))
    return pkts


@pytest.mark.parametrize("gshape,flt", [((128, 192), 0),
                                        ((130, 134), 0),
                                        ((128, 192), 24),
                                        ((130, 134), 31)])
def test_chained_gop_stripe_pipeline(gshape, flt):
    w, h = gshape
    G = 4
    if jax.device_count() < G:
        pytest.skip("needs 4 devices")
    mesh = Mesh(np.asarray(jax.devices()[:G]), ("gop",))
    pkts = _chained_stream(w, h, G, flt=flt)

    # serial golden baseline
    dec = VP9Decoder(recon_backend="golden", use_native=False)
    frames = []
    for p in pkts:
        frames.extend(dec.decode(p))

    (oy, ou, ov), jobs = decode_chained_gop(pkts, mesh, Hs=64, lag=2)
    cw, ch = ((w + 7) >> 3) * 8, ((h + 7) >> 3) * 8
    cwu, chu = cw >> 1, ch >> 1
    for i in range(G):
        f = frames[1 + i]
        assert (oy[i][:ch, :cw]
                == np.asarray(f.planes[0][:ch, :cw])).all(), \
            f"frame {i}: Y diverges"
        assert (ou[i][:chu, :cwu]
                == np.asarray(f.planes[1][:chu, :cwu])).all(), \
            f"frame {i}: U diverges"
        assert (ov[i][:chu, :cwu]
                == np.asarray(f.planes[2][:chu, :cwu])).all(), \
            f"frame {i}: V diverges"
