"""Error resilience: invalid data must raise ValueError (the analogue of
the reference's AVERROR_INVALIDDATA paths, vp9.c:534-546/904-915/
1340-1346), never crash or hang, and a failed frame must leave the
decoder usable for the next keyframe (vp9.c:1860-1862 unblock-on-error
contract)."""
import os

import pytest

VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")


def _packets(name):
    from ffmpeg_hybrid_tpu.formats.ivf import read_ivf
    from ffmpeg_hybrid_tpu.formats.superframe import split_superframe

    _info, pkts = read_ivf(os.path.join(VEC_DIR, name + ".ivf"))
    out = []
    for pts, data in pkts:
        out.extend(fd for _f, fd in split_superframe(data, pts))
    return out


def test_truncated_packets():
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder

    packets = _packets("inter_176x144_10f")
    for cut in (0, 1, 2, 3, 5, 9, 17, len(packets[0]) // 2):
        dec = VP9Decoder(recon_backend="golden")
        with pytest.raises(ValueError):
            dec.decode(packets[0][:cut])


def test_bitflips_raise_or_decode():
    """Flipping header bytes either decodes (different but valid syntax)
    or raises ValueError — never an unhandled crash."""
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder

    packets = _packets("inter_64_5f")
    base = bytearray(packets[0])
    for pos in range(min(24, len(base))):
        for bit in (0x01, 0x10, 0x80):
            data = bytearray(base)
            data[pos] ^= bit
            dec = VP9Decoder(recon_backend="golden")
            try:
                dec.decode(bytes(data))
            except ValueError:
                pass

    # corrupt the tile payload too (entropy decode area)
    for pos in range(30, min(len(base), 120), 7):
        data = bytearray(base)
        data[pos] ^= 0xFF
        dec = VP9Decoder(recon_backend="golden")
        try:
            dec.decode(bytes(data))
        except ValueError:
            pass


def test_decoder_survives_bad_frame():
    """A failed packet must not poison the decoder: the next keyframe
    decodes bit-exactly."""
    import hashlib

    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
    from ffmpeg_hybrid_tpu.formats.framemd5 import parse_framemd5

    packets = _packets("inter_64_5f")
    ref = parse_framemd5(os.path.join(VEC_DIR, "inter_64_5f.framemd5"))
    dec = VP9Decoder(recon_backend="tpu")
    with pytest.raises(ValueError):
        dec.decode(packets[0][:3])  # truncated keyframe
    got = []
    for fd in packets:
        for f in dec.decode(fd):
            got.append(hashlib.md5(f.to_bytes()).hexdigest())
    assert got == [m for _s, m in ref]


def test_show_existing_missing_ref():
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder

    dec = VP9Decoder(recon_backend="golden")
    # show-existing-frame packet referencing an empty slot
    pkt = bytes([(0b10 << 6) | (1 << 3) | 0])
    with pytest.raises(ValueError):
        dec.decode(pkt)
