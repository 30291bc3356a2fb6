"""Plain MSB-first bit reader for the VP9 uncompressed frame header.

Behavioral reference: the get_bits reader used by the reference decoder's
header parse (reference: libavcodec/vp9.c:528, libavcodec/get_bits.h).
"""


class BitstreamError(ValueError):
    """Invalid/truncated bitstream — the AVERROR_INVALIDDATA analogue;
    a ValueError so all decode-input failures share one catchable base."""


class BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = 8 * len(data)

    def get(self, n: int) -> int:
        """Read n bits MSB-first."""
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise BitstreamError("bitstream overread")
        v = 0
        pos = self.pos
        data = self.data
        for _ in range(n):
            v = (v << 1) | ((data[pos >> 3] >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return v

    def get_bit(self) -> int:
        return self.get(1)

    def get_sbits_inv(self, n: int) -> int:
        """Value followed by sign bit (sign-magnitude), as used by VP9 headers."""
        v = self.get(n)
        return -v if self.get_bit() else v

    def bits_consumed(self) -> int:
        return self.pos

    def bytes_consumed(self) -> int:
        return (self.pos + 7) >> 3
