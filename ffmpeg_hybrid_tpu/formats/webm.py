"""Minimal WebM/Matroska demuxer for VP9 tracks.

Parses the EBML structure (behavioral reference: the subset of
libavformat/matroskadec.c needed for VP9-in-WebM: Segment/Tracks/Cluster/
SimpleBlock + BlockGroup), yielding (pts_ms, packet) for the first VP9
video track.
"""
from __future__ import annotations

from typing import Iterator, Optional, Tuple

# EBML element IDs (with length/marker bits, as read)
EBML_HEADER = 0x1A45DFA3
SEGMENT = 0x18538067
SEGMENT_INFO = 0x1549A966
TIMECODE_SCALE = 0x2AD7B1
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_TYPE = 0x83
CODEC_ID = 0x86
CLUSTER = 0x1F43B675
CLUSTER_TIMECODE = 0xE7
SIMPLE_BLOCK = 0xA3
BLOCK_GROUP = 0xA0
BLOCK = 0xA1


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0

    def eof(self) -> bool:
        return self.pos >= len(self.d)

    def read_id(self) -> int:
        b0 = self.d[self.pos]
        n = 1
        mask = 0x80
        while n <= 4 and not (b0 & mask):
            mask >>= 1
            n += 1
        v = 0
        for i in range(n):
            v = (v << 8) | self.d[self.pos + i]
        self.pos += n
        return v

    def read_size(self) -> int:
        b0 = self.d[self.pos]
        n = 1
        mask = 0x80
        while n <= 8 and not (b0 & mask):
            mask >>= 1
            n += 1
        v = b0 & (mask - 1)
        for i in range(1, n):
            v = (v << 8) | self.d[self.pos + i]
        self.pos += n
        return v

    def read_uint(self, size: int) -> int:
        v = 0
        for i in range(size):
            v = (v << 8) | self.d[self.pos + i]
        self.pos += size
        return v


def read_webm(path: str) -> Iterator[Tuple[Optional[int], bytes]]:
    """Yield (pts_ms, packet_bytes) for the first VP9 track."""
    data = open(path, "rb").read()
    r = _Reader(data)
    vp9_track: Optional[int] = None
    timecode_scale = 1000000  # ns per tick (default: 1 ms)

    def parse_tracks(end):
        nonlocal vp9_track
        while r.pos < end:
            eid = r.read_id()
            esz = r.read_size()
            eend = r.pos + esz
            if eid == TRACK_ENTRY:
                tnum = None
                ttype = None
                codec = None
                while r.pos < eend:
                    fid = r.read_id()
                    fsz = r.read_size()
                    if fid == TRACK_NUMBER:
                        tnum = r.read_uint(fsz)
                    elif fid == TRACK_TYPE:
                        ttype = r.read_uint(fsz)
                    elif fid == CODEC_ID:
                        codec = r.d[r.pos:r.pos + fsz]
                        r.pos += fsz
                    else:
                        r.pos += fsz
                if ttype == 1 and codec == b"V_VP9" and vp9_track is None:
                    vp9_track = tnum
            else:
                r.pos = eend

    def parse_block(blk, cluster_tc):
        br = _Reader(blk)
        track = br.read_size()
        rel_tc = int.from_bytes(blk[br.pos:br.pos + 2], "big", signed=True)
        br.pos += 2
        flags = blk[br.pos]
        br.pos += 1
        lacing = (flags >> 1) & 3
        if track != vp9_track:
            return None
        if lacing != 0:
            # lacing is not produced for VP9 (superframes are used
            # instead); treat the remainder as one frame
            pass
        pts = cluster_tc + rel_tc
        return pts, blk[br.pos:]

    while not r.eof():
        eid = r.read_id()
        esz = r.read_size()
        end = r.pos + esz
        if eid == SEGMENT:
            end = min(end, len(r.d))
            while r.pos < end:
                sid = r.read_id()
                ssz = r.read_size()
                send = r.pos + ssz
                if sid == TRACKS:
                    parse_tracks(send)
                    r.pos = send
                elif sid == SEGMENT_INFO:
                    while r.pos < send:
                        fid = r.read_id()
                        fsz = r.read_size()
                        if fid == TIMECODE_SCALE:
                            timecode_scale = r.read_uint(fsz)
                        else:
                            r.pos += fsz
                elif sid == CLUSTER:
                    cluster_tc = 0
                    while r.pos < send:
                        cid = r.read_id()
                        csz = r.read_size()
                        cend = r.pos + csz
                        if cid == CLUSTER_TIMECODE:
                            cluster_tc = r.read_uint(csz)
                        elif cid == SIMPLE_BLOCK:
                            out = parse_block(r.d[r.pos:cend], cluster_tc)
                            if out is not None:
                                yield out
                            r.pos = cend
                        elif cid == BLOCK_GROUP:
                            while r.pos < cend:
                                gid = r.read_id()
                                gsz = r.read_size()
                                gend = r.pos + gsz
                                if gid == BLOCK:
                                    out = parse_block(r.d[r.pos:gend],
                                                      cluster_tc)
                                    if out is not None:
                                        yield out
                                r.pos = gend
                            r.pos = cend
                        else:
                            r.pos = cend
                else:
                    r.pos = send
        else:
            r.pos = end
