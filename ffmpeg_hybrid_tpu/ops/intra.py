"""VP9 intra prediction, exact integer math (numpy golden).

API: intra_pred(mode, sz, left, top, bpp) -> [sz, sz] int array.
  - `left`: int array of sz entries. For all modes except HOR_UP it is
    bottom-up (left[sz-1-y] = neighbor of row y), matching the edge
    assembly in recon (reference: check_intra_mode, vp9recon.c:190-217).
  - `top`: int array with top[-1] at index 0, i.e. top_buf[0] = topleft,
    top_buf[1 + i] = top[i]; length >= 2*sz + 1.

Behavioral reference: vp9dsp_template.c:33-1111. The mode set matches
IntraPredMode (reference: vp9.h:45-62).
"""
import numpy as np

(VERT_PRED, HOR_PRED, DC_PRED, DIAG_DOWN_LEFT_PRED, DIAG_DOWN_RIGHT_PRED,
 VERT_RIGHT_PRED, HOR_DOWN_PRED, VERT_LEFT_PRED, HOR_UP_PRED, TM_VP8_PRED,
 LEFT_DC_PRED, TOP_DC_PRED, DC_128_PRED, DC_127_PRED, DC_129_PRED) = range(15)


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + b * 2 + c + 2) >> 2


def intra_pred(mode, sz, left, topbuf, bpp):
    """Returns the predicted block [sz, sz] as int32."""
    left = np.asarray(left, dtype=np.int32)
    tl = int(topbuf[0])
    top = np.asarray(topbuf[1:], dtype=np.int32)
    out = np.zeros((sz, sz), np.int32)
    maxp = (1 << bpp) - 1

    if mode == VERT_PRED:
        out[:] = top[:sz][None, :]
    elif mode == HOR_PRED:
        out[:] = left[::-1][:, None]
    elif mode == DC_PRED:
        dc = (int(left[:sz].sum()) + int(top[:sz].sum()) + sz) >> \
            (int(np.log2(sz)) + 1)
        out[:] = dc
    elif mode == LEFT_DC_PRED:
        dc = (int(left[:sz].sum()) + (sz >> 1)) >> int(np.log2(sz))
        out[:] = dc
    elif mode == TOP_DC_PRED:
        dc = (int(top[:sz].sum()) + (sz >> 1)) >> int(np.log2(sz))
        out[:] = dc
    elif mode == DC_128_PRED:
        out[:] = 128 << (bpp - 8)
    elif mode == DC_127_PRED:
        out[:] = (128 << (bpp - 8)) - 1
    elif mode == DC_129_PRED:
        out[:] = (128 << (bpp - 8)) + 1
    elif mode == TM_VP8_PRED:
        l_m_tl = left[::-1][:, None] - tl
        out[:] = np.clip(top[:sz][None, :] + l_m_tl, 0, maxp)
    elif mode == DIAG_DOWN_LEFT_PRED:
        if sz == 4:
            # 4x4 reads 8 top pixels (incl. top-right), reference :815-830
            a = top[:8]
            row = [_avg3(a[0], a[1], a[2]), _avg3(a[1], a[2], a[3]),
                   _avg3(a[2], a[3], a[4]), _avg3(a[3], a[4], a[5]),
                   _avg3(a[4], a[5], a[6]), _avg3(a[5], a[6], a[7]),
                   int(a[7])]
            for y in range(4):
                for x in range(4):
                    out[y, x] = row[x + y]
            out[3, 3] = a[7]
        else:
            v = np.zeros(sz - 1, np.int32)
            for i in range(sz - 2):
                v[i] = _avg3(top[i], top[i + 1], top[i + 2])
            v[sz - 2] = (int(top[sz - 2]) + int(top[sz - 1]) * 3 + 2) >> 2
            for j in range(sz):
                n = sz - 1 - j
                out[j, :n] = v[j:j + n]
                out[j, n:] = top[sz - 1]
    elif mode == DIAG_DOWN_RIGHT_PRED:
        v = np.zeros(2 * sz - 1, np.int32)
        for i in range(sz - 2):
            v[i] = _avg3(left[i], left[i + 1], left[i + 2])
            v[sz + 1 + i] = _avg3(top[i], top[i + 1], top[i + 2])
        v[sz - 2] = _avg3(left[sz - 2], left[sz - 1], tl)
        v[sz - 1] = _avg3(left[sz - 1], tl, top[0])
        v[sz] = _avg3(tl, top[0], top[1])
        for j in range(sz):
            out[j] = v[sz - 1 - j:2 * sz - 1 - j]
    elif mode == VERT_RIGHT_PRED:
        half = sz // 2
        ve = np.zeros(sz + half - 1, np.int32)
        vo = np.zeros(sz + half - 1, np.int32)
        for i in range(half - 2):
            vo[i] = _avg3(left[i * 2 + 3], left[i * 2 + 2], left[i * 2 + 1])
            ve[i] = _avg3(left[i * 2 + 4], left[i * 2 + 3], left[i * 2 + 2])
        vo[half - 2] = _avg3(left[sz - 1], left[sz - 2], left[sz - 3])
        ve[half - 2] = _avg3(tl, left[sz - 1], left[sz - 2])
        ve[half - 1] = _avg2(tl, top[0])
        vo[half - 1] = _avg3(left[sz - 1], tl, top[0])
        for i in range(sz - 1):
            ve[half + i] = _avg2(top[i], top[i + 1])
            vo[half + i] = _avg3(top[i - 1] if i else tl, top[i], top[i + 1])
        for j in range(half):
            out[j * 2] = ve[half - 1 - j:half - 1 - j + sz]
            out[j * 2 + 1] = vo[half - 1 - j:half - 1 - j + sz]
    elif mode == HOR_DOWN_PRED:
        v = np.zeros(sz * 3 - 2, np.int32)
        for i in range(sz - 2):
            v[i * 2] = _avg2(left[i + 1], left[i])
            v[i * 2 + 1] = _avg3(left[i + 2], left[i + 1], left[i])
            v[sz * 2 + i] = _avg3(top[i - 1] if i else tl, top[i], top[i + 1])
        v[sz * 2 - 2] = _avg2(tl, left[sz - 1])
        v[sz * 2 - 4] = _avg2(left[sz - 1], left[sz - 2])
        v[sz * 2 - 1] = _avg3(top[0], tl, left[sz - 1])
        v[sz * 2 - 3] = _avg3(tl, left[sz - 1], left[sz - 2])
        for j in range(sz):
            out[j] = v[sz * 2 - 2 - j * 2:sz * 3 - 2 - j * 2]
    elif mode == VERT_LEFT_PRED:
        if sz == 4:
            a = top[:7]
            out[0, 0] = _avg2(a[0], a[1])
            out[1, 0] = _avg3(a[0], a[1], a[2])
            out[0, 1] = out[2, 0] = _avg2(a[1], a[2])
            out[1, 1] = out[3, 0] = _avg3(a[1], a[2], a[3])
            out[0, 2] = out[2, 1] = _avg2(a[2], a[3])
            out[1, 2] = out[3, 1] = _avg3(a[2], a[3], a[4])
            out[0, 3] = out[2, 2] = _avg2(a[3], a[4])
            out[1, 3] = out[3, 2] = _avg3(a[3], a[4], a[5])
            out[2, 3] = _avg2(a[4], a[5])
            out[3, 3] = _avg3(a[4], a[5], a[6])
        else:
            ve = np.zeros(sz - 1, np.int32)
            vo = np.zeros(sz - 1, np.int32)
            for i in range(sz - 2):
                ve[i] = _avg2(top[i], top[i + 1])
                vo[i] = _avg3(top[i], top[i + 1], top[i + 2])
            ve[sz - 2] = _avg2(top[sz - 2], top[sz - 1])
            vo[sz - 2] = (int(top[sz - 2]) + int(top[sz - 1]) * 3 + 2) >> 2
            for j in range(sz // 2):
                n = sz - j - 1
                out[j * 2, :n] = ve[j:j + n]
                out[j * 2, n:] = top[sz - 1]
                out[j * 2 + 1, :n] = vo[j:j + n]
                out[j * 2 + 1, n:] = top[sz - 1]
    elif mode == HOR_UP_PRED:
        # left is TOP-DOWN here (invert_left, reference vp9recon.c:90)
        if sz == 4:
            l0, l1, l2, l3 = (int(left[i]) for i in range(4))
            out[0, 0] = _avg2(l0, l1)
            out[0, 1] = _avg3(l0, l1, l2)
            out[1, 0] = out[0, 2] = _avg2(l1, l2)
            out[1, 1] = out[0, 3] = _avg3(l1, l2, l3)
            out[2, 0] = out[1, 2] = _avg2(l2, l3)
            out[2, 1] = out[1, 3] = (l2 + l3 * 3 + 2) >> 2
            out[3, 0] = out[3, 1] = out[2, 2] = out[3, 2] = out[2, 3] = \
                out[3, 3] = l3
        else:
            v = np.zeros(sz * 2 - 2, np.int32)
            for i in range(sz - 2):
                v[i * 2] = _avg2(left[i], left[i + 1])
                v[i * 2 + 1] = _avg3(left[i], left[i + 1], left[i + 2])
            v[sz * 2 - 4] = _avg2(left[sz - 2], left[sz - 1])
            v[sz * 2 - 3] = (int(left[sz - 2]) + int(left[sz - 1]) * 3 + 2) \
                >> 2
            for j in range(sz // 2):
                out[j] = v[j * 2:j * 2 + sz]
            for j in range(sz // 2, sz):
                n = sz * 2 - 2 - j * 2
                out[j, :n] = v[j * 2:j * 2 + n]
                out[j, n:] = left[sz - 1]
    else:
        raise ValueError(f"bad intra mode {mode}")
    return out
