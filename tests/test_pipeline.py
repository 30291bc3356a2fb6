"""Pipelined decode (decode_stream: pass A of frame N+1 overlapped with
pass B of frame N in a worker thread) must be bit-identical to the serial
decode() path on every stream shape: inter chains, superframes with
invisible frames, show-existing-frame, scaled references (golden
fallback), segmentation, and tiled 1080p."""
import hashlib
import os

import pytest

VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")

VECTORS = [
    "intra_352x288",       # multi-keyframe
    "inter_176x144_10f",   # inter chain, backward adaptation
    "inter_66x66_5f",      # odd size edges
    "superframe",          # invisible frames inside superframes
    "show_existing",       # show-existing-frame replay
    "mini_scaled",         # scaled-reference frames (TPU scaled MC)
    "mini_scaled_mv_odd",  # scaled MC with real MVs and odd sizes
    "mini_seg_128x72",     # segmentation state carried across frames
    "bench_1080p",         # 4 tile columns
]


def _md5s_stream(path, backend):
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
    from ffmpeg_hybrid_tpu.formats.ivf import read_ivf
    from ffmpeg_hybrid_tpu.formats.superframe import split_superframe

    info, pkts = read_ivf(path)
    packets = []
    for pts, data in pkts:
        packets.extend(fd for _f, fd in split_superframe(data, pts))
    dec = VP9Decoder(recon_backend=backend)
    out = []
    for f in dec.decode_stream(packets):
        raw = f.to_bytes()
        out.append((len(raw), hashlib.md5(raw).hexdigest()))
    return out


@pytest.mark.parametrize("name", VECTORS)
@pytest.mark.parametrize("backend", ["tpu", "golden"])
def test_stream_matches_serial(name, backend):
    from ffmpeg_hybrid_tpu.formats.framemd5 import decode_file_md5s

    ivf = os.path.join(VEC_DIR, name + ".ivf")
    if not os.path.exists(ivf):
        pytest.skip(f"vector {name} not generated")
    if backend == "golden" and name == "bench_1080p":
        pytest.skip("1080p golden decode is too slow for unit tests")
    serial = decode_file_md5s(ivf, backend=backend)
    streamed = _md5s_stream(ivf, backend)
    assert streamed == serial


def test_stream_early_abandon():
    """Abandoning the generator mid-stream must not deadlock or leak the
    worker thread."""
    import threading

    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
    from ffmpeg_hybrid_tpu.formats.ivf import read_ivf

    ivf = os.path.join(VEC_DIR, "inter_176x144_10f.ivf")
    if not os.path.exists(ivf):
        pytest.skip("vector not generated")
    info, pkts = read_ivf(ivf)
    packets = [d for _p, d in pkts]

    def loop():
        while True:
            yield from packets

    n_before = threading.active_count()
    dec = VP9Decoder(recon_backend="tpu")
    gen = dec.decode_stream(loop())
    for i, _f in enumerate(gen):
        if i == 5:
            break
    gen.close()
    assert threading.active_count() <= n_before + 1
