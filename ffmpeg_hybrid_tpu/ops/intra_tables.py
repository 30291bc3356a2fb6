"""Matrix-form intra predictors for the TPU backend.

Every VP9 intra predictor except TM is a per-pixel weighted average of
edge pixels with a single rounding: out = (sum w_k * e_k + r) >> s with
w/2^s in {1, 1/2, 1/4, 3/4, 1/(2n)...}. Normalizing all weights to /64
gives one uniform formula for every mode and size:

    pred = (e @ W + 32) >> 6

with integer W (column sums 64) over the edge vector
    e = [tl, top[0..Ta-1], left_bottomup[0..sz-1], c128, 1]
where Ta = 2*sz for sz==4 (top-right zone) else sz, c128 = 128<<(bpp-8).
Since sum(w*e) <= 64*max_pixel < 2^19, the matmul is exact in float32 —
it runs on the MXU.

Behavioral reference: vp9dsp_template.c:33-1111; verified bit-exact
against ops/intra.py in tests/test_intra_mat.py.
"""
import numpy as np

(VERT, HOR, DC, DDL, DDR, VR, HD, VL, HU, TM,
 LEFT_DC, TOP_DC, DC_128, DC_127, DC_129) = range(15)

_cache = {}


def edge_len(sz):
    ta = 2 * sz if sz == 4 else sz
    return 1 + ta + sz + 2  # tl + top + left + c128 + one


def build_w(mode, sz):
    """Returns W [edge_len(sz), sz*sz] int32 for one (mode, size)."""
    key = (mode, sz)
    if key in _cache:
        return _cache[key]
    ta = 2 * sz if sz == 4 else sz
    ne = edge_len(sz)
    TL = 0

    def A(i):
        assert 0 <= i < ta
        return 1 + i

    def L(i):  # bottom-up storage
        assert 0 <= i < sz
        return 1 + ta + i

    C128 = 1 + ta + sz
    ONE = C128 + 1
    W = np.zeros((ne, sz * sz), np.int32)

    def put(y, x, terms):
        for idx, w in terms:
            W[idx, y * sz + x] += w

    cp = lambda i: [(i, 64)]
    avg2 = lambda i, j: [(i, 32), (j, 32)]
    avg3 = lambda i, j, k: [(i, 16), (j, 32), (k, 16)]
    avg31 = lambda i, j: [(i, 16), (j, 48)]  # (a + 3b + 2) >> 2

    if mode == VERT:
        for y in range(sz):
            for x in range(sz):
                put(y, x, cp(A(x)))
    elif mode == HOR:
        for y in range(sz):
            for x in range(sz):
                put(y, x, cp(L(sz - 1 - y)))
    elif mode in (DC, LEFT_DC, TOP_DC):
        terms = []
        if mode in (DC, TOP_DC):
            terms += [(A(i), 1) for i in range(sz)]
        if mode in (DC, LEFT_DC):
            terms += [(L(i), 1) for i in range(sz)]
        n = len(terms)
        w = 64 // n
        terms = [(i, w) for i, _ in terms]
        for y in range(sz):
            for x in range(sz):
                put(y, x, terms)
    elif mode == DC_128:
        for p in range(sz * sz):
            W[C128, p] = 64
    elif mode == DC_127:
        for p in range(sz * sz):
            W[C128, p] = 64
            W[ONE, p] = -64
    elif mode == DC_129:
        for p in range(sz * sz):
            W[C128, p] = 64
            W[ONE, p] = 64
    elif mode == DDL:
        if sz == 4:
            row = [avg3(A(0), A(1), A(2)), avg3(A(1), A(2), A(3)),
                   avg3(A(2), A(3), A(4)), avg3(A(3), A(4), A(5)),
                   avg3(A(4), A(5), A(6)), avg3(A(5), A(6), A(7)),
                   cp(A(7))]
            for y in range(4):
                for x in range(4):
                    put(y, x, row[x + y])
            W[:, 3 * 4 + 3] = 0
            put(3, 3, cp(A(7)))
        else:
            v = [avg3(A(i), A(i + 1), A(i + 2)) for i in range(sz - 2)]
            v.append(avg31(A(sz - 2), A(sz - 1)))
            for j in range(sz):
                n = sz - 1 - j
                for x in range(n):
                    put(j, x, v[j + x])
                for x in range(n, sz):
                    put(j, x, cp(A(sz - 1)))
    elif mode == DDR:
        v = [None] * (2 * sz - 1)
        for i in range(sz - 2):
            v[i] = avg3(L(i), L(i + 1), L(i + 2))
            v[sz + 1 + i] = avg3(A(i), A(i + 1), A(i + 2))
        v[sz - 2] = avg3(L(sz - 2), L(sz - 1), TL)
        v[sz - 1] = avg3(L(sz - 1), TL, A(0))
        v[sz] = avg3(TL, A(0), A(1))
        for j in range(sz):
            for x in range(sz):
                put(j, x, v[sz - 1 - j + x])
    elif mode == VR:
        half = sz // 2
        ve = [None] * (sz + half - 1)
        vo = [None] * (sz + half - 1)
        for i in range(half - 2):
            vo[i] = avg3(L(i * 2 + 3), L(i * 2 + 2), L(i * 2 + 1))
            ve[i] = avg3(L(i * 2 + 4), L(i * 2 + 3), L(i * 2 + 2))
        vo[half - 2] = avg3(L(sz - 1), L(sz - 2), L(sz - 3))
        ve[half - 2] = avg3(TL, L(sz - 1), L(sz - 2))
        ve[half - 1] = avg2(TL, A(0))
        vo[half - 1] = avg3(L(sz - 1), TL, A(0))
        for i in range(sz - 1):
            ve[half + i] = avg2(A(i), A(i + 1))
            vo[half + i] = avg3(A(i - 1) if i else TL, A(i), A(i + 1))
        for j in range(half):
            for x in range(sz):
                put(j * 2, x, ve[half - 1 - j + x])
                put(j * 2 + 1, x, vo[half - 1 - j + x])
    elif mode == HD:
        v = [None] * (sz * 3 - 2)
        for i in range(sz - 2):
            v[i * 2] = avg2(L(i + 1), L(i))
            v[i * 2 + 1] = avg3(L(i + 2), L(i + 1), L(i))
            v[sz * 2 + i] = avg3(A(i - 1) if i else TL, A(i), A(i + 1))
        v[sz * 2 - 2] = avg2(TL, L(sz - 1))
        v[sz * 2 - 4] = avg2(L(sz - 1), L(sz - 2))
        v[sz * 2 - 1] = avg3(A(0), TL, L(sz - 1))
        v[sz * 2 - 3] = avg3(TL, L(sz - 1), L(sz - 2))
        for j in range(sz):
            for x in range(sz):
                put(j, x, v[sz * 2 - 2 - j * 2 + x])
    elif mode == VL:
        if sz == 4:
            o = {}
            o[(0, 0)] = avg2(A(0), A(1))
            o[(1, 0)] = avg3(A(0), A(1), A(2))
            o[(0, 1)] = o[(2, 0)] = avg2(A(1), A(2))
            o[(1, 1)] = o[(3, 0)] = avg3(A(1), A(2), A(3))
            o[(0, 2)] = o[(2, 1)] = avg2(A(2), A(3))
            o[(1, 2)] = o[(3, 1)] = avg3(A(2), A(3), A(4))
            o[(0, 3)] = o[(2, 2)] = avg2(A(3), A(4))
            o[(1, 3)] = o[(3, 2)] = avg3(A(3), A(4), A(5))
            o[(2, 3)] = avg2(A(4), A(5))
            o[(3, 3)] = avg3(A(4), A(5), A(6))
            for (y, x), t in o.items():
                put(y, x, t)
        else:
            ve = [avg2(A(i), A(i + 1)) for i in range(sz - 1)]
            vo = [avg3(A(i), A(i + 1), A(i + 2)) for i in range(sz - 2)]
            vo.append(avg31(A(sz - 2), A(sz - 1)))
            for j in range(sz // 2):
                n = sz - j - 1
                for x in range(n):
                    put(j * 2, x, ve[j + x])
                    put(j * 2 + 1, x, vo[j + x])
                for x in range(n, sz):
                    put(j * 2, x, cp(A(sz - 1)))
                    put(j * 2 + 1, x, cp(A(sz - 1)))
    elif mode == HU:
        # left is top-down in the C kernel; canonical storage is bottom-up
        LT = lambda i: L(sz - 1 - i)
        v = [None] * (sz * 2 - 2)
        for i in range(sz - 2):
            v[i * 2] = avg2(LT(i), LT(i + 1))
            v[i * 2 + 1] = avg3(LT(i), LT(i + 1), LT(i + 2))
        v[sz * 2 - 4] = avg2(LT(sz - 2), LT(sz - 1))
        v[sz * 2 - 3] = avg31(LT(sz - 2), LT(sz - 1))
        for j in range(sz // 2):
            for x in range(sz):
                put(j, x, v[j * 2 + x])
        for j in range(sz // 2, sz):
            n = sz * 2 - 2 - j * 2
            for x in range(n):
                put(j, x, v[j * 2 + x])
            for x in range(n, sz):
                put(j, x, cp(LT(sz - 1)))
    else:
        raise ValueError(f"mode {mode} has no matrix form (TM handled "
                         "separately)")
    _cache[key] = W
    return W


MAT_MODES = [VERT, HOR, DC, DDL, DDR, VR, HD, VL, HU, LEFT_DC, TOP_DC,
             DC_128, DC_127, DC_129]


def build_all(sz):
    """Stack of W for all 15 modes (TM slot zero-filled) [15, ne, sz*sz]."""
    ne = edge_len(sz)
    out = np.zeros((15, ne, sz * sz), np.int32)
    for m in MAT_MODES:
        out[m] = build_w(m, sz)
    return out
