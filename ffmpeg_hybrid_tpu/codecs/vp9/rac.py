"""VP9/VP8 boolean range decoder ("bool decoder"), spec-form implementation.

This is the readable reference implementation used for correctness tests and
as the fallback entropy path; the production pass-A path lives in the native
C extension (native/).

Behavioral reference: the range decoder the reference uses
(reference: libavcodec/vpx_rac.h:35-133, vpx_rac.c:43-53) and the tree/uint
readers (reference: libavcodec/vp89_rac.h:36-64). This implementation follows
the bitstream-spec formulation (BoolValue/BoolRange with per-bit renorm),
which decodes identical symbols; differential-tested against the reference
in tests/test_rac.py.
"""

import numpy as np


class BoolDecoder:
    __slots__ = ("data", "byte_pos", "bit_pos", "value", "range", "overread")

    def __init__(self, data):
        self.data = data
        self.byte_pos = 0
        self.bit_pos = 0  # bits of current byte already consumed
        self.value = 0
        self.range = 255
        self.overread = 0
        # init: read 8 bits
        for _ in range(8):
            self.value = (self.value << 1) | self._next_bit()

    def _next_bit(self) -> int:
        if self.byte_pos >= len(self.data):
            self.overread += 1
            return 0
        b = (self.data[self.byte_pos] >> (7 - self.bit_pos)) & 1
        self.bit_pos += 1
        if self.bit_pos == 8:
            self.bit_pos = 0
            self.byte_pos += 1
        return b

    def get_prob(self, prob: int) -> int:
        """Decode one bool with P(bit==0) = prob/256."""
        prob = int(prob)  # guard against numpy uint8 wraparound
        r = self.range
        split = 1 + (((r - 1) * prob) >> 8)
        v = self.value
        if v < split:
            bit = 0
            r = split
        else:
            bit = 1
            r -= split
            v -= split
        # renorm
        while r < 128:
            r <<= 1
            v = (v << 1) | self._next_bit()
        self.range = r
        self.value = v
        return bit

    def get(self) -> int:
        """Literal bit (prob 128)."""
        return self.get_prob(128)

    def get_uint(self, n: int) -> int:
        """n-bit unsigned literal, MSB first (vp89_rac_get_uint)."""
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get_prob(128)
        return v

    def get_sint(self, n: int) -> int:
        """n-bit magnitude followed by sign bit."""
        v = self.get_uint(n)
        return -v if self.get_prob(128) else v

    def get_tree(self, tree, probs) -> int:
        """Tree-structured symbol decode (vp89_rac_get_tree).

        tree[i] = (left, right) child entries; entry <= 0 encodes leaf value
        -entry, entry > 0 is the next node index.
        """
        i = 0
        while True:
            nxt = int(tree[i][self.get_prob(probs[i])])
            if nxt <= 0:
                return -nxt
            i = nxt

    def is_end(self) -> bool:
        """End/overread detection: mirrors vpx_rac_is_end's tolerance of up
        to 10 bits of overread past the buffer (reference:
        libavcodec/vpx_rac.h:51-56)."""
        return self.byte_pos >= len(self.data) and self.overread > 10


def inv_recenter_nonneg(v: int, m: int) -> int:
    """Subexponential prob-update recentering (reference: vp9.c:376-386)."""
    if v > 2 * m:
        return v
    if v & 1:
        return m - ((v + 1) >> 1)
    return m + (v >> 1)


# inv_map_table for delta-coded probability updates
# (reference: libavcodec/vp9.c:401-414)
INV_MAP_TABLE = np.array(
    [7, 20, 33, 46, 59, 72, 85, 98, 111, 124, 137, 150, 163, 176, 189,
     202, 215, 228, 241, 254, 1, 2, 3, 4, 5, 6, 8, 9, 10, 11, 12, 13,
     14, 15, 16, 17, 18, 19, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30,
     31, 32, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 47, 48,
     49, 50, 51, 52, 53, 54, 55, 56, 57, 58, 60, 61, 62, 63, 64, 65,
     66, 67, 68, 69, 70, 71, 73, 74, 75, 76, 77, 78, 79, 80, 81, 82,
     83, 84, 86, 87, 88, 89, 90, 91, 92, 93, 94, 95, 96, 97, 99, 100,
     101, 102, 103, 104, 105, 106, 107, 108, 109, 110, 112, 113, 114,
     115, 116, 117, 118, 119, 120, 121, 122, 123, 125, 126, 127, 128,
     129, 130, 131, 132, 133, 134, 135, 136, 138, 139, 140, 141, 142,
     143, 144, 145, 146, 147, 148, 149, 151, 152, 153, 154, 155, 156,
     157, 158, 159, 160, 161, 162, 164, 165, 166, 167, 168, 169, 170,
     171, 172, 173, 174, 175, 177, 178, 179, 180, 181, 182, 183, 184,
     185, 186, 187, 188, 190, 191, 192, 193, 194, 195, 196, 197, 198,
     199, 200, 201, 203, 204, 205, 206, 207, 208, 209, 210, 211, 212,
     213, 214, 216, 217, 218, 219, 220, 221, 222, 223, 224, 225, 226,
     227, 229, 230, 231, 232, 233, 234, 235, 236, 237, 238, 239, 240,
     242, 243, 244, 245, 246, 247, 248, 249, 250, 251, 252, 253, 253],
    dtype=np.uint8,
)


def update_prob(dec: BoolDecoder, p: int) -> int:
    """Delta-coded (subexponential) probability update, UNgated — callers
    first check the per-prob update flag `dec.get_prob(252)`.

    Behavioral reference: update_prob (reference: libavcodec/vp9.c:399-455).
    """
    if not dec.get():
        d = dec.get_uint(4)
    elif not dec.get():
        d = dec.get_uint(4) + 16
    elif not dec.get():
        d = dec.get_uint(5) + 32
    else:
        d = dec.get_uint(7)
        if d >= 65:
            d = (d << 1) - 65 + dec.get()
        d += 64
    m = int(INV_MAP_TABLE[d])
    if p <= 128:
        return 1 + inv_recenter_nonneg(m, p - 1)
    return 255 - inv_recenter_nonneg(m, 255 - p)
