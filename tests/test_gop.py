"""GOP-parallel decode (parallel/gop.py): keyframe-rooted GOPs decoded
by independent workers must reproduce the serial decode bit-exactly and
in order — the multi-host scaling strategy's correctness contract."""
import hashlib
import os

import pytest

VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")


def _multi_gop_stream(name, reps):
    """Concatenate an IVF's packets `reps` times: each repetition starts
    at the clip's keyframe, giving a valid multi-GOP stream whose serial
    decode is the per-clip decode repeated."""
    from ffmpeg_hybrid_tpu.formats.ivf import read_ivf

    _info, pkts = read_ivf(os.path.join(VEC_DIR, name + ".ivf"))
    packets = [d for _p, d in pkts]
    return packets * reps


def test_split_gops():
    from ffmpeg_hybrid_tpu.parallel.gop import split_gops, \
        packet_is_keyframe

    packets = _multi_gop_stream("inter_64_5f", 3)
    assert packet_is_keyframe(packets[0])
    assert not packet_is_keyframe(packets[1])
    gops = split_gops(packets)
    assert len(gops) == 3
    assert all(len(g) == len(packets) // 3 for g in gops)


@pytest.mark.parametrize("name,reps", [("inter_64_5f", 3),
                                       ("superframe", 2),
                                       ("mini_scaled", 2)])
def test_gop_parallel_matches_serial(name, reps):
    from ffmpeg_hybrid_tpu.formats.superframe import split_superframe
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder
    from ffmpeg_hybrid_tpu.parallel.gop import decode_gops_parallel

    if not os.path.exists(os.path.join(VEC_DIR, name + ".ivf")):
        pytest.skip("vector not generated")
    packets = _multi_gop_stream(name, reps)

    dec = VP9Decoder(recon_backend="tpu")
    serial = []
    for pkt in packets:
        for _pts, fd in split_superframe(pkt, 0):
            for f in dec.decode(fd):
                b = f.to_bytes()
                serial.append((len(b), hashlib.md5(b).hexdigest()))

    par = []
    for f in decode_gops_parallel(packets, workers=2,
                                  recon_backend="tpu"):
        b = f.to_bytes()
        par.append((len(b), hashlib.md5(b).hexdigest()))
    assert par == serial


def test_gop_multiprocess_matches_serial(tmp_path):
    """Two separate processes (emulated hosts: private interpreter, JAX
    runtime, decoder) over a GOP split merge to the serial result."""
    from ffmpeg_hybrid_tpu.formats.ivf import read_ivf, write_ivf
    from ffmpeg_hybrid_tpu.formats.framemd5 import decode_file_md5s
    from ffmpeg_hybrid_tpu.parallel.gop import \
        decode_gops_md5_multiprocess

    src = os.path.join(VEC_DIR, "inter_64_5f.ivf")
    info, pkts = read_ivf(src)
    packets = [(i, d) for i, (_p, d) in enumerate(list(pkts) * 2)]
    path = str(tmp_path / "twogop.ivf")
    write_ivf(path, b"VP90", info.width, info.height, info.timebase_num,
              info.timebase_den, packets)

    serial = decode_file_md5s(path, backend="tpu")
    par = decode_gops_md5_multiprocess(path, n_procs=2,
                                       recon_backend="tpu")
    assert par == serial


def test_concurrent_pass_a_stress():
    """Many decoders running pass A simultaneously (the GOP-parallel
    and decode_stream regimes) must not interfere: the native
    single-tile path once kept per-tile state in a C `static` and
    desynced under concurrency."""
    import hashlib
    import threading

    from ffmpeg_hybrid_tpu.formats.framemd5 import parse_framemd5
    from ffmpeg_hybrid_tpu.codecs.vp9.decoder import VP9Decoder

    packets = _multi_gop_stream("inter_176x144_10f", 1)
    ref = [m for _s, m in parse_framemd5(
        os.path.join(VEC_DIR, "inter_176x144_10f.framemd5"))]
    errs = []

    def worker():
        try:
            for _rep in range(3):
                dec = VP9Decoder(recon_backend="golden")
                got = []
                for pkt in packets:
                    for f in dec.decode(pkt):
                        got.append(hashlib.md5(f.to_bytes()).hexdigest())
                assert got == ref
        except BaseException as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs, errs[0]
