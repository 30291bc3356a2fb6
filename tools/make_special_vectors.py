#!/usr/bin/env python3
"""Synthesize VP9 streams exercising show-existing-frame, invisible
frames and superframes from an existing encoded clip, with oracle
framemd5 references (these encoder features aren't reachable through the
cv2 encoder).

- show_existing: original frames + an appended 2-byte show-existing-frame
  packet referencing the slot the last frame refreshed.
- superframe: one inter frame's show_frame bit is cleared (making it
  invisible) and it is merged with a show-existing packet into a single
  superframe (the altref pattern; reference:
  libavcodec/bsf/vp9_superframe.c).
"""
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ffmpeg_hybrid_tpu.formats.ivf import read_ivf, write_ivf
from ffmpeg_hybrid_tpu.formats.superframe import merge_superframe
from ffmpeg_hybrid_tpu.utils.bitreader import BitReader

ORACLE = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "ffmpeg")


def parse_bits_info(pkt: bytes):
    """Returns (profile, is_keyframe, show_frame_bit_pos, refresh_mask)
    for profile-0/2-style headers (enough for our generated streams)."""
    gb = BitReader(pkt)
    assert gb.get(2) == 2
    profile = gb.get_bit() | (gb.get_bit() << 1)
    assert profile == 0, "helper only handles profile 0"
    assert gb.get_bit() == 0, "unexpected show-existing frame"
    keyframe = not gb.get_bit()
    show_pos = gb.bits_consumed()
    return profile, keyframe, show_pos


def make_show_existing_pkt(idx: int) -> bytes:
    """2-byte show-existing-frame packet: marker(2)=2, profile(2)=0,
    show_existing(1)=1, idx(3)."""
    b0 = (0b10 << 6) | (0b00 << 4) | (1 << 3) | (idx & 7)
    return bytes([b0])


def clear_show_frame(pkt: bytes) -> bytes:
    """Only valid for KEYFRAMES: inter frames read an intra-only flag when
    invisible, which would shift the remaining header syntax."""
    _, kf, show_pos = parse_bits_info(pkt)
    assert kf, "only keyframes can be made invisible by bit-flip"
    b = bytearray(pkt)
    b[show_pos // 8] &= ~(1 << (7 - (show_pos % 8)))
    return bytes(b)


def refresh_mask_of(pkt: bytes) -> int:
    gb = BitReader(pkt)
    gb.get(2)
    gb.get_bit()
    gb.get_bit()
    gb.get_bit()  # show_existing
    keyframe = not gb.get_bit()
    gb.get_bit()  # show
    gb.get_bit()  # errorres
    if keyframe:
        return 0xFF
    intraonly = 0  # visible inter frame: no intraonly flag
    gb.get(2)  # resetctx
    return gb.get(8)


def first_slot(mask: int) -> int:
    for i in range(8):
        if mask & (1 << i):
            return i
    return 0


def oracle_md5(ivf_path: str, out_path: str):
    out = subprocess.run(
        [ORACLE, "-nostdin", "-bitexact", "-i", ivf_path, "-map", "0:v",
         "-f", "framemd5", "-"], check=True, capture_output=True)
    with open(out_path, "wb") as fh:
        fh.write(out.stdout)


def main():
    vec = os.path.join(os.path.dirname(__file__), "..", "vectors")
    src = os.path.join(vec, "inter_64_5f.ivf")
    info, pkts = read_ivf(src)
    packets = [(p, d) for p, d in pkts]

    # 1) show-existing: replay the slot refreshed by the last frame
    mask = refresh_mask_of(packets[-1][1])
    idx = first_slot(mask)
    dts = (packets[-1][0] - packets[-2][0]) if len(packets) > 1 else 33
    se = packets + [(packets[-1][0] + dts, make_show_existing_pkt(idx))]
    p1 = os.path.join(vec, "show_existing.ivf")
    write_ivf(p1, b"VP90", info.width, info.height, info.timebase_num,
              info.timebase_den, se)
    oracle_md5(p1, os.path.join(vec, "show_existing.framemd5"))
    print("show_existing.ivf: replay slot", idx)

    # 2) superframe: invisible keyframe + show-existing in one packet
    # (the altref pattern; keyframes refresh every slot)
    inv = clear_show_frame(packets[0][1])
    sf = merge_superframe([inv, make_show_existing_pkt(0)])
    out_pkts = [(packets[0][0], sf)] + packets[1:]
    p2 = os.path.join(vec, "superframe.ivf")
    write_ivf(p2, b"VP90", info.width, info.height, info.timebase_num,
              info.timebase_den, out_pkts)
    oracle_md5(p2, os.path.join(vec, "superframe.framemd5"))
    print("superframe.ivf: invisible keyframe + show-existing")


if __name__ == "__main__":
    main()
