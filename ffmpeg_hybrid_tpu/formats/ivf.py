"""IVF container demuxer/muxer (behavioral reference:
libavformat/ivfdec.c, ivfenc.c — 32-byte header 'DKIF', 12-byte frame
headers with LE32 size + LE64 pts)."""
import struct
from dataclasses import dataclass
from typing import Iterator, Tuple


@dataclass
class IVFInfo:
    fourcc: bytes
    width: int
    height: int
    timebase_num: int  # rate
    timebase_den: int  # scale
    nframes: int


def read_ivf(path: str) -> Tuple[IVFInfo, Iterator[Tuple[int, bytes]]]:
    f = open(path, "rb")
    hdr = f.read(32)
    if hdr[:4] != b"DKIF":
        raise ValueError("not an IVF file")
    (_ver, hdrlen, fourcc, w, h, rate, scale, nframes, _unused) = \
        struct.unpack("<HH4sHHIIII", hdr[4:32])
    info = IVFInfo(fourcc, w, h, rate, scale, nframes)

    def packets():
        while True:
            fh = f.read(12)
            if len(fh) < 12:
                break
            size, pts = struct.unpack("<IQ", fh)
            data = f.read(size)
            if len(data) < size:
                break
            yield pts, data
        f.close()

    return info, packets()


def write_ivf(path: str, fourcc: bytes, w: int, h: int, rate: int,
              scale: int, packets):
    """packets: iterable of (pts, bytes)."""
    pk = list(packets)
    with open(path, "wb") as f:
        f.write(b"DKIF")
        f.write(struct.pack("<HH4sHHIIII", 0, 32, fourcc, w, h, rate, scale,
                            len(pk), 0))
        for pts, data in pk:
            f.write(struct.pack("<IQ", len(data), pts))
            f.write(data)
