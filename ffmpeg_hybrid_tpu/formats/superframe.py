"""VP9 superframe splitting (bitstream filter).

Behavioral reference: vp9_superframe_split_filter
(libavcodec/bsf/vp9_superframe_split.c:41-137): superframes carry an index
at the end (marker 0b110xxxxx) listing per-frame sizes; invisible frames
get pts=None.
"""
from typing import List, Optional, Tuple


def split_superframe(data: bytes, pts: Optional[int]
                     ) -> List[Tuple[Optional[int], bytes]]:
    """Split a (possibly) superframe packet into per-frame packets.
    Returns list of (pts, frame_bytes); invisible frames have pts None."""
    if not data:
        return [(pts, data)]
    marker = data[-1]
    frames: List[bytes] = []
    if (marker & 0xE0) == 0xC0:
        length_size = 1 + ((marker >> 3) & 0x3)
        nb_frames = 1 + (marker & 0x7)
        idx_size = 2 + nb_frames * length_size
        if len(data) >= idx_size and data[len(data) - idx_size] == marker:
            idx = data[len(data) + 1 - idx_size:]
            total = 0
            sizes = []
            ok = True
            for i in range(nb_frames):
                fs = 0
                for j in range(length_size):
                    fs |= idx[i * length_size + j] << (j * 8)
                total += fs
                if fs <= 0 or total > len(data) - idx_size:
                    ok = False
                    break
                sizes.append(fs)
            if ok:
                off = 0
                for fs in sizes:
                    frames.append(data[off:off + fs])
                    off += fs
    if not frames:
        return [(pts, data)]
    out = []
    for fr in frames:
        out.append((None if _is_invisible(fr) else pts, fr))
    return out


def _is_invisible(frame: bytes) -> bool:
    from ..utils.bitreader import BitReader
    if len(frame) < 2:
        return False
    gb = BitReader(frame)
    gb.get(2)  # frame marker
    profile = gb.get_bit() | (gb.get_bit() << 1)
    if profile == 3:
        gb.get_bit()
    if gb.get_bit():  # show_existing_frame
        return False
    gb.get_bit()  # keyframe flag
    return not gb.get_bit()  # !show_frame


def merge_superframe(frames: List[bytes]) -> bytes:
    """Re-merge frames into a superframe (reference:
    libavcodec/bsf/vp9_superframe.c behavior)."""
    if len(frames) == 1:
        return frames[0]
    max_size = max(len(f) for f in frames)
    length_size = 1
    while max_size >= (1 << (8 * length_size)):
        length_size += 1
    marker = 0xC0 | ((length_size - 1) << 3) | (len(frames) - 1)
    idx = bytearray([marker])
    for f in frames:
        s = len(f)
        for j in range(length_size):
            idx.append((s >> (8 * j)) & 0xFF)
    idx.append(marker)
    return b"".join(frames) + bytes(idx)
