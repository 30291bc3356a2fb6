"""VP9 inverse transforms (iDCT/iADST 4-32 + lossless iWHT), exact
fixed-point integer math.

The 1-D kernels are written once over an array-module `xp` (numpy or
jax.numpy) operating on the last axis, so the CPU golden implementation and
the batched TPU (XLA/Pallas) path share one source of truth. dtype carries
the C semantics: int32 for 8bpp (wraparound like C `int`), int64 for
10/12bpp (`dctint int64_t`, reference: libavcodec/vp9dsp_10bpp.c:25).

Behavioral reference: vp9dsp_template.c:1155-1777 (itxfm_wrapper and the
idct4/8/16/32, iadst4/8/16, iwht4 1-D kernels). Normative butterfly
constants (11585/15137/6270/...) are from the VP9 spec.
"""
from __future__ import annotations

import numpy as np

R = 1 << 13  # rounding constant before >> 14


def _rs(v):
    return (v + R) >> 14


def idct4_1d(xp, X):
    i0, i1, i2, i3 = (X[..., k] for k in range(4))
    t0 = _rs((i0 + i2) * 11585)
    t1 = _rs((i0 - i2) * 11585)
    t2 = _rs(i1 * 6270 - i3 * 15137)
    t3 = _rs(i1 * 15137 + i3 * 6270)
    return xp.stack([t0 + t3, t1 + t2, t1 - t2, t0 - t3], axis=-1)


def iadst4_1d(xp, X):
    i0, i1, i2, i3 = (X[..., k] for k in range(4))
    t0 = 5283 * i0 + 15212 * i2 + 9929 * i3
    t1 = 9929 * i0 - 5283 * i2 - 15212 * i3
    t2 = 13377 * (i0 - i2 + i3)
    t3 = 13377 * i1
    return xp.stack([_rs(t0 + t3), _rs(t1 + t3), _rs(t2),
                     _rs(t0 + t1 - t3)], axis=-1)


def idct8_1d(xp, X):
    I = [X[..., k] for k in range(8)]
    t0a = _rs((I[0] + I[4]) * 11585)
    t1a = _rs((I[0] - I[4]) * 11585)
    t2a = _rs(I[2] * 6270 - I[6] * 15137)
    t3a = _rs(I[2] * 15137 + I[6] * 6270)
    t4a = _rs(I[1] * 3196 - I[7] * 16069)
    t5a = _rs(I[5] * 13623 - I[3] * 9102)
    t6a = _rs(I[5] * 9102 + I[3] * 13623)
    t7a = _rs(I[1] * 16069 + I[7] * 3196)
    t0 = t0a + t3a
    t1 = t1a + t2a
    t2 = t1a - t2a
    t3 = t0a - t3a
    t4 = t4a + t5a
    t5a2 = t4a - t5a
    t7 = t7a + t6a
    t6a2 = t7a - t6a
    t5 = _rs((t6a2 - t5a2) * 11585)
    t6 = _rs((t6a2 + t5a2) * 11585)
    return xp.stack([t0 + t7, t1 + t6, t2 + t5, t3 + t4,
                     t3 - t4, t2 - t5, t1 - t6, t0 - t7], axis=-1)


def iadst8_1d(xp, X):
    I = [X[..., k] for k in range(8)]
    t0a = 16305 * I[7] + 1606 * I[0]
    t1a = 1606 * I[7] - 16305 * I[0]
    t2a = 14449 * I[5] + 7723 * I[2]
    t3a = 7723 * I[5] - 14449 * I[2]
    t4a = 10394 * I[3] + 12665 * I[4]
    t5a = 12665 * I[3] - 10394 * I[4]
    t6a = 4756 * I[1] + 15679 * I[6]
    t7a = 15679 * I[1] - 4756 * I[6]
    t0 = _rs(t0a + t4a)
    t1 = _rs(t1a + t5a)
    t2 = _rs(t2a + t6a)
    t3 = _rs(t3a + t7a)
    t4 = _rs(t0a - t4a)
    t5 = _rs(t1a - t5a)
    t6 = _rs(t2a - t6a)
    t7 = _rs(t3a - t7a)
    t4a = 15137 * t4 + 6270 * t5
    t5a = 6270 * t4 - 15137 * t5
    t6a = 15137 * t7 - 6270 * t6
    t7a = 6270 * t7 + 15137 * t6
    o0 = t0 + t2
    o7 = -(t1 + t3)
    t2 = t0 - t2
    t3 = t1 - t3
    o1 = -_rs(t4a + t6a)
    o6 = _rs(t5a + t7a)
    t6 = _rs(t4a - t6a)
    t7 = _rs(t5a - t7a)
    o3 = -_rs((t2 + t3) * 11585)
    o4 = _rs((t2 - t3) * 11585)
    o2 = _rs((t6 + t7) * 11585)
    o5 = -_rs((t6 - t7) * 11585)
    return xp.stack([o0, o1, o2, o3, o4, o5, o6, o7], axis=-1)


def idct16_1d(xp, X):
    I = [X[..., k] for k in range(16)]
    t0a = _rs((I[0] + I[8]) * 11585)
    t1a = _rs((I[0] - I[8]) * 11585)
    t2a = _rs(I[4] * 6270 - I[12] * 15137)
    t3a = _rs(I[4] * 15137 + I[12] * 6270)
    t4a = _rs(I[2] * 3196 - I[14] * 16069)
    t7a = _rs(I[2] * 16069 + I[14] * 3196)
    t5a = _rs(I[10] * 13623 - I[6] * 9102)
    t6a = _rs(I[10] * 9102 + I[6] * 13623)
    t8a = _rs(I[1] * 1606 - I[15] * 16305)
    t15a = _rs(I[1] * 16305 + I[15] * 1606)
    t9a = _rs(I[9] * 12665 - I[7] * 10394)
    t14a = _rs(I[9] * 10394 + I[7] * 12665)
    t10a = _rs(I[5] * 7723 - I[11] * 14449)
    t13a = _rs(I[5] * 14449 + I[11] * 7723)
    t11a = _rs(I[13] * 15679 - I[3] * 4756)
    t12a = _rs(I[13] * 4756 + I[3] * 15679)

    t0 = t0a + t3a
    t1 = t1a + t2a
    t2 = t1a - t2a
    t3 = t0a - t3a
    t4 = t4a + t5a
    t5 = t4a - t5a
    t6 = t7a - t6a
    t7 = t7a + t6a
    t8 = t8a + t9a
    t9 = t8a - t9a
    t10 = t11a - t10a
    t11 = t11a + t10a
    t12 = t12a + t13a
    t13 = t12a - t13a
    t14 = t15a - t14a
    t15 = t15a + t14a

    t5a = _rs((t6 - t5) * 11585)
    t6a = _rs((t6 + t5) * 11585)
    t9a = _rs(t14 * 6270 - t9 * 15137)
    t14a = _rs(t14 * 15137 + t9 * 6270)
    t10a = _rs(-(t13 * 15137 + t10 * 6270))
    t13a = _rs(t13 * 6270 - t10 * 15137)

    t0a = t0 + t7
    t1a = t1 + t6a
    t2a = t2 + t5a
    t3a = t3 + t4
    t4 = t3 - t4
    t5 = t2 - t5a
    t6 = t1 - t6a
    t7 = t0 - t7
    t8a = t8 + t11
    t9 = t9a + t10a
    t10 = t9a - t10a
    t11a = t8 - t11
    t12a = t15 - t12
    t13 = t14a - t13a
    t14 = t14a + t13a
    t15a = t15 + t12

    t10a = _rs((t13 - t10) * 11585)
    t13a = _rs((t13 + t10) * 11585)
    t11 = _rs((t12a - t11a) * 11585)
    t12 = _rs((t12a + t11a) * 11585)

    return xp.stack([
        t0a + t15a, t1a + t14, t2a + t13a, t3a + t12,
        t4 + t11, t5 + t10a, t6 + t9, t7 + t8a,
        t7 - t8a, t6 - t9, t5 - t10a, t4 - t11,
        t3a - t12, t2a - t13a, t1a - t14, t0a - t15a], axis=-1)


def iadst16_1d(xp, X):
    I = [X[..., k] for k in range(16)]
    t0 = I[15] * 16364 + I[0] * 804
    t1 = I[15] * 804 - I[0] * 16364
    t2 = I[13] * 15893 + I[2] * 3981
    t3 = I[13] * 3981 - I[2] * 15893
    t4 = I[11] * 14811 + I[4] * 7005
    t5 = I[11] * 7005 - I[4] * 14811
    t6 = I[9] * 13160 + I[6] * 9760
    t7 = I[9] * 9760 - I[6] * 13160
    t8 = I[7] * 11003 + I[8] * 12140
    t9 = I[7] * 12140 - I[8] * 11003
    t10 = I[5] * 8423 + I[10] * 14053
    t11 = I[5] * 14053 - I[10] * 8423
    t12 = I[3] * 5520 + I[12] * 15426
    t13 = I[3] * 15426 - I[12] * 5520
    t14 = I[1] * 2404 + I[14] * 16207
    t15 = I[1] * 16207 - I[14] * 2404

    t0a = _rs(t0 + t8)
    t1a = _rs(t1 + t9)
    t2a = _rs(t2 + t10)
    t3a = _rs(t3 + t11)
    t4a = _rs(t4 + t12)
    t5a = _rs(t5 + t13)
    t6a = _rs(t6 + t14)
    t7a = _rs(t7 + t15)
    t8a = _rs(t0 - t8)
    t9a = _rs(t1 - t9)
    t10a = _rs(t2 - t10)
    t11a = _rs(t3 - t11)
    t12a = _rs(t4 - t12)
    t13a = _rs(t5 - t13)
    t14a = _rs(t6 - t14)
    t15a = _rs(t7 - t15)

    t8 = t8a * 16069 + t9a * 3196
    t9 = t8a * 3196 - t9a * 16069
    t10 = t10a * 9102 + t11a * 13623
    t11 = t10a * 13623 - t11a * 9102
    t12 = t13a * 16069 - t12a * 3196
    t13 = t13a * 3196 + t12a * 16069
    t14 = t15a * 9102 - t14a * 13623
    t15 = t15a * 13623 + t14a * 9102

    t0 = t0a + t4a
    t1 = t1a + t5a
    t2 = t2a + t6a
    t3 = t3a + t7a
    t4 = t0a - t4a
    t5 = t1a - t5a
    t6 = t2a - t6a
    t7 = t3a - t7a
    t8a = _rs(t8 + t12)
    t9a = _rs(t9 + t13)
    t10a = _rs(t10 + t14)
    t11a = _rs(t11 + t15)
    t12a = _rs(t8 - t12)
    t13a = _rs(t9 - t13)
    t14a = _rs(t10 - t14)
    t15a = _rs(t11 - t15)

    t4a = t4 * 15137 + t5 * 6270
    t5a = t4 * 6270 - t5 * 15137
    t6a = t7 * 15137 - t6 * 6270
    t7a = t7 * 6270 + t6 * 15137
    t12 = t12a * 15137 + t13a * 6270
    t13 = t12a * 6270 - t13a * 15137
    t14 = t15a * 15137 - t14a * 6270
    t15 = t15a * 6270 + t14a * 15137

    o0 = t0 + t2
    o15 = -(t1 + t3)
    t2a = t0 - t2
    t3a = t1 - t3
    o3 = -_rs(t4a + t6a)
    o12 = _rs(t5a + t7a)
    t6 = _rs(t4a - t6a)
    t7 = _rs(t5a - t7a)
    o1 = -(t8a + t10a)
    o14 = t9a + t11a
    t10 = t8a - t10a
    t11 = t9a - t11a
    o2 = _rs(t12 + t14)
    o13 = -_rs(t13 + t15)
    t14a = _rs(t12 - t14)
    t15a = _rs(t13 - t15)

    o7 = _rs(-(t2a + t3a) * 11585)
    o8 = _rs((t2a - t3a) * 11585)
    o4 = _rs((t7 + t6) * 11585)
    o11 = _rs((t7 - t6) * 11585)
    o6 = _rs((t11 + t10) * 11585)
    o9 = _rs((t11 - t10) * 11585)
    o5 = _rs(-(t14a + t15a) * 11585)
    o10 = _rs((t14a - t15a) * 11585)
    return xp.stack([o0, o1, o2, o3, o4, o5, o6, o7, o8, o9, o10, o11,
                     o12, o13, o14, o15], axis=-1)


def idct32_1d(xp, X):
    I = [X[..., k] for k in range(32)]
    t0a = _rs((I[0] + I[16]) * 11585)
    t1a = _rs((I[0] - I[16]) * 11585)
    t2a = _rs(I[8] * 6270 - I[24] * 15137)
    t3a = _rs(I[8] * 15137 + I[24] * 6270)
    t4a = _rs(I[4] * 3196 - I[28] * 16069)
    t7a = _rs(I[4] * 16069 + I[28] * 3196)
    t5a = _rs(I[20] * 13623 - I[12] * 9102)
    t6a = _rs(I[20] * 9102 + I[12] * 13623)
    t8a = _rs(I[2] * 1606 - I[30] * 16305)
    t15a = _rs(I[2] * 16305 + I[30] * 1606)
    t9a = _rs(I[18] * 12665 - I[14] * 10394)
    t14a = _rs(I[18] * 10394 + I[14] * 12665)
    t10a = _rs(I[10] * 7723 - I[22] * 14449)
    t13a = _rs(I[10] * 14449 + I[22] * 7723)
    t11a = _rs(I[26] * 15679 - I[6] * 4756)
    t12a = _rs(I[26] * 4756 + I[6] * 15679)
    t16a = _rs(I[1] * 804 - I[31] * 16364)
    t31a = _rs(I[1] * 16364 + I[31] * 804)
    t17a = _rs(I[17] * 12140 - I[15] * 11003)
    t30a = _rs(I[17] * 11003 + I[15] * 12140)
    t18a = _rs(I[9] * 7005 - I[23] * 14811)
    t29a = _rs(I[9] * 14811 + I[23] * 7005)
    t19a = _rs(I[25] * 15426 - I[7] * 5520)
    t28a = _rs(I[25] * 5520 + I[7] * 15426)
    t20a = _rs(I[5] * 3981 - I[27] * 15893)
    t27a = _rs(I[5] * 15893 + I[27] * 3981)
    t21a = _rs(I[21] * 14053 - I[11] * 8423)
    t26a = _rs(I[21] * 8423 + I[11] * 14053)
    t22a = _rs(I[13] * 9760 - I[19] * 13160)
    t25a = _rs(I[13] * 13160 + I[19] * 9760)
    t23a = _rs(I[29] * 16207 - I[3] * 2404)
    t24a = _rs(I[29] * 2404 + I[3] * 16207)

    t0 = t0a + t3a
    t1 = t1a + t2a
    t2 = t1a - t2a
    t3 = t0a - t3a
    t4 = t4a + t5a
    t5 = t4a - t5a
    t6 = t7a - t6a
    t7 = t7a + t6a
    t8 = t8a + t9a
    t9 = t8a - t9a
    t10 = t11a - t10a
    t11 = t11a + t10a
    t12 = t12a + t13a
    t13 = t12a - t13a
    t14 = t15a - t14a
    t15 = t15a + t14a
    t16 = t16a + t17a
    t17 = t16a - t17a
    t18 = t19a - t18a
    t19 = t19a + t18a
    t20 = t20a + t21a
    t21 = t20a - t21a
    t22 = t23a - t22a
    t23 = t23a + t22a
    t24 = t24a + t25a
    t25 = t24a - t25a
    t26 = t27a - t26a
    t27 = t27a + t26a
    t28 = t28a + t29a
    t29 = t28a - t29a
    t30 = t31a - t30a
    t31 = t31a + t30a

    t5a = _rs((t6 - t5) * 11585)
    t6a = _rs((t6 + t5) * 11585)
    t9a = _rs(t14 * 6270 - t9 * 15137)
    t14a = _rs(t14 * 15137 + t9 * 6270)
    t10a = _rs(-(t13 * 15137 + t10 * 6270))
    t13a = _rs(t13 * 6270 - t10 * 15137)
    t17a = _rs(t30 * 3196 - t17 * 16069)
    t30a = _rs(t30 * 16069 + t17 * 3196)
    t18a = _rs(-(t29 * 16069 + t18 * 3196))
    t29a = _rs(t29 * 3196 - t18 * 16069)
    t21a = _rs(t26 * 13623 - t21 * 9102)
    t26a = _rs(t26 * 9102 + t21 * 13623)
    t22a = _rs(-(t25 * 9102 + t22 * 13623))
    t25a = _rs(t25 * 13623 - t22 * 9102)

    t0a = t0 + t7
    t1a = t1 + t6a
    t2a = t2 + t5a
    t3a = t3 + t4
    t4a = t3 - t4
    t5 = t2 - t5a
    t6 = t1 - t6a
    t7a = t0 - t7
    t8a = t8 + t11
    t9 = t9a + t10a
    t10 = t9a - t10a
    t11a = t8 - t11
    t12a = t15 - t12
    t13 = t14a - t13a
    t14 = t14a + t13a
    t15a = t15 + t12
    t16a = t16 + t19
    t17 = t17a + t18a
    t18 = t17a - t18a
    t19a = t16 - t19
    t20a = t23 - t20
    t21 = t22a - t21a
    t22 = t22a + t21a
    t23a = t23 + t20
    t24a = t24 + t27
    t25 = t25a + t26a
    t26 = t25a - t26a
    t27a = t24 - t27
    t28a = t31 - t28
    t29 = t30a - t29a
    t30 = t30a + t29a
    t31a = t31 + t28

    t10a = _rs((t13 - t10) * 11585)
    t13a = _rs((t13 + t10) * 11585)
    t11 = _rs((t12a - t11a) * 11585)
    t12 = _rs((t12a + t11a) * 11585)
    t18a = _rs(t29 * 6270 - t18 * 15137)
    t29a = _rs(t29 * 15137 + t18 * 6270)
    t19 = _rs(t28a * 6270 - t19a * 15137)
    t28 = _rs(t28a * 15137 + t19a * 6270)
    t20 = _rs(-(t27a * 15137 + t20a * 6270))
    t27 = _rs(t27a * 6270 - t20a * 15137)
    t21a = _rs(-(t26 * 15137 + t21 * 6270))
    t26a = _rs(t26 * 6270 - t21 * 15137)

    t0 = t0a + t15a
    t1 = t1a + t14
    t2 = t2a + t13a
    t3 = t3a + t12
    t4 = t4a + t11
    t5a = t5 + t10a
    t6a = t6 + t9
    t7 = t7a + t8a
    t8 = t7a - t8a
    t9a = t6 - t9
    t10 = t5 - t10a
    t11a = t4a - t11
    t12a = t3a - t12
    t13 = t2a - t13a
    t14a = t1a - t14
    t15 = t0a - t15a
    t16 = t16a + t23a
    t17a = t17 + t22
    t18 = t18a + t21a
    t19a = t19 + t20
    t20a = t19 - t20
    t21 = t18a - t21a
    t22a = t17 - t22
    t23 = t16a - t23a
    t24 = t31a - t24a
    t25a = t30 - t25
    t26 = t29a - t26a
    t27a = t28 - t27
    t28a = t28 + t27
    t29 = t29a + t26a
    t30a = t30 + t25
    t31 = t31a + t24a

    t20 = _rs((t27a - t20a) * 11585)
    t27 = _rs((t27a + t20a) * 11585)
    t21a = _rs((t26 - t21) * 11585)
    t26a = _rs((t26 + t21) * 11585)
    t22 = _rs((t25a - t22a) * 11585)
    t25 = _rs((t25a + t22a) * 11585)
    t23a = _rs((t24 - t23) * 11585)
    t24a = _rs((t24 + t23) * 11585)

    return xp.stack([
        t0 + t31, t1 + t30a, t2 + t29, t3 + t28a, t4 + t27, t5a + t26a,
        t6a + t25, t7 + t24a, t8 + t23a, t9a + t22, t10 + t21a, t11a + t20,
        t12a + t19a, t13 + t18, t14a + t17a, t15 + t16,
        t15 - t16, t14a - t17a, t13 - t18, t12a - t19a, t11a - t20,
        t10 - t21a, t9a - t22, t8 - t23a, t7 - t24a, t6a - t25, t5a - t26a,
        t4 - t27, t3 - t28a, t2 - t29, t1 - t30a, t0 - t31], axis=-1)


def iwht4_1d(xp, X, pass_):
    i0 = X[..., 0]
    i1 = X[..., 3]
    i2 = X[..., 1]
    i3 = X[..., 2]
    if pass_ == 0:
        i0 = i0 >> 2
        i1 = i1 >> 2
        i2 = i2 >> 2
        i3 = i3 >> 2
    t0 = i0 + i2
    t3 = i3 - i1
    t4 = (t0 - t3) >> 1
    t1 = t4 - i1
    t2 = t4 - i2
    t0 = t0 - t1
    t3 = t3 + t2
    return xp.stack([t0, t1, t2, t3], axis=-1)


_1D = {
    (0, "dct"): idct4_1d, (0, "adst"): iadst4_1d,
    (1, "dct"): idct8_1d, (1, "adst"): iadst8_1d,
    (2, "dct"): idct16_1d, (2, "adst"): iadst16_1d,
    (3, "dct"): idct32_1d,
}

# TxfmType -> (pass-a kernel kind, pass-b kernel kind)
# (reference: vp9dsp_template.c:1758-1770 init table:
#  DCT_DCT=(idct,idct), DCT_ADST=(iadst,idct), ADST_DCT=(idct,iadst),
#  ADST_ADST=(iadst,iadst); 32x32 and lossless are dct/wht only)
_TYPE_AB = {0: ("dct", "dct"), 1: ("adst", "dct"),
            2: ("dct", "adst"), 3: ("adst", "adst")}

FINAL_SHIFT = {0: 4, 1: 5, 2: 6, 3: 6}  # per tx size; lossless = 0


def _wrap16(v):
    """Wrap to int16 range keeping the wide dtype (dctcoef is int16_t at
    8bpp — inter-pass temporaries wrap, reference: bit_depth_template)."""
    return ((v + 0x8000) & 0xFFFF) - 0x8000


def _wrap32(v):
    return ((v + 0x80000000) & 0xFFFFFFFF) - 0x80000000


def itxfm_2d(xp, blocks, tx, txtype, bpp=8):
    """Inverse-transform a batch of coefficient blocks.

    blocks: [..., sz, sz] int32 (8bpp) / int64 (10/12bpp), raster layout
    (scan index rc at [rc // sz, rc % sz]). Returns the residual
    [..., sz, sz] BEFORE the final rounding shift (apply `round_residual`),
    matching the itxfm wrapper's two-pass structure: pass a over columns
    into a transposed temp (stored as dctcoef — wraps!), pass b over its
    columns again.
    """
    wrap = _wrap16 if bpp == 8 else _wrap32
    if tx == 4:  # lossless WHT
        tmp = wrap(iwht4_1d(xp, blocks.swapaxes(-1, -2), 0))
        res = wrap(iwht4_1d(xp, tmp.swapaxes(-1, -2), 1))
        return res.swapaxes(-1, -2)
    ka, kb = _TYPE_AB[txtype] if tx < 3 else ("dct", "dct")
    fa = _1D[(tx, ka)]
    fb = _1D[(tx, kb)]
    tmp = wrap(fa(xp, blocks.swapaxes(-1, -2)))
    res = wrap(fb(xp, tmp.swapaxes(-1, -2)))
    return res.swapaxes(-1, -2)


def round_residual(res, tx):
    """Final per-pixel rounding: (out + (1 << (bits-1))) >> bits."""
    bits = FINAL_SHIFT[tx] if tx < 4 else 0
    if bits == 0:
        return res
    return (res + (1 << (bits - 1))) >> bits


def dc_only_residual(dc, tx):
    """eob==1 DC fast path (reference: itxfm_wrapper has_dconly branch).
    dc: array of DC coefficients. Returns the scalar residual value(s)
    after the final shift."""
    t = _rs(_rs(dc * 11585) * 11585)
    bits = FINAL_SHIFT[tx]
    return (t + (1 << (bits - 1))) >> bits
