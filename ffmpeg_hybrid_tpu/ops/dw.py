"""Exact int64 arithmetic on the int32 VPU: double-word (hi, lo) pairs.

The 10/12-bit inverse transforms require C `int64_t` intermediate
semantics (reference: libavcodec/vp9dsp_10bpp.c:25 `#define dctint
int64_t`; vp9dsp_template.c:1202-1717 kernels). TPUs are int32-native
and JAX only exposes s64 behind global x64 mode, so DW represents each
64-bit value as two int32 arrays (hi = top 32 bits, lo = raw low 32
bits, value = hi * 2**32 + uint32(lo)) and implements the exact
operation set the transform kernels use: add/sub/neg, multiplication by
a small positive constant (the 14-bit butterfly constants), and
arithmetic right shift. The 1-D kernels in ops/itxfm.py are written
generically over an array-module `xp`, so they run unchanged on DW via
the XPDW shim — one source of truth for 8-bit (int32/int16-wrap), numpy
golden (int64), and TPU high-bit-depth (DW) paths.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import itxfm

_I32 = jnp.int32
_U32 = jnp.uint32


def _u(x):
    return x.astype(_U32)


def _i(x):
    return x.astype(_I32)


class DW:
    """Array of int64 values as (hi, lo) int32 pairs."""
    __slots__ = ("hi", "lo")

    def __init__(self, hi, lo):
        self.hi = hi
        self.lo = lo

    @staticmethod
    def from_i32(x):
        x = x.astype(_I32)
        return DW(x >> 31, x)

    # -- shape plumbing (the kernels index/stack/transpose only) -------
    def __getitem__(self, idx):
        return DW(self.hi[idx], self.lo[idx])

    def swapaxes(self, a, b):
        return DW(self.hi.swapaxes(a, b), self.lo.swapaxes(a, b))

    @property
    def shape(self):
        return self.lo.shape

    # -- arithmetic -----------------------------------------------------
    def __add__(self, o):
        o = _coerce(o)
        lo = self.lo + o.lo
        carry = _i(_u(lo) < _u(self.lo))
        return DW(self.hi + o.hi + carry, lo)

    __radd__ = __add__

    def __sub__(self, o):
        o = _coerce(o)
        borrow = _i(_u(self.lo) < _u(o.lo))
        return DW(self.hi - o.hi - borrow, self.lo - o.lo)

    def __rsub__(self, o):
        return _coerce(o).__sub__(self)

    def __neg__(self):
        z = DW(jnp.zeros_like(self.hi), jnp.zeros_like(self.lo))
        return z - self

    def __mul__(self, c):
        """Multiply by a Python int constant 0 < c < 2**15 (the largest
        butterfly constant is 16364). 16-bit limb products keep every
        intermediate below 2**30."""
        assert isinstance(c, int) and 0 < c < (1 << 15), c
        l0 = self.lo & 0xFFFF
        l1 = _i(_u(self.lo) >> 16)
        h0 = self.hi & 0xFFFF
        h1 = _i(_u(self.hi) >> 16)
        m0 = l0 * c
        m1 = l1 * c
        m2 = h0 * c
        m3 = h1 * c
        s1 = m1 + (m0 >> 16)
        s2 = m2 + (s1 >> 16)
        s3 = m3 + (s2 >> 16)
        lo = (m0 & 0xFFFF) | ((s1 & 0xFFFF) << 16)
        hi = (s2 & 0xFFFF) | ((s3 & 0xFFFF) << 16)
        return DW(hi, lo)

    __rmul__ = __mul__

    def __rshift__(self, k):
        """Arithmetic right shift by a static 1..31."""
        assert isinstance(k, int) and 0 < k < 32, k
        lo = _i(_u(self.lo) >> k) | (self.hi << (32 - k))
        return DW(self.hi >> k, lo)


def _coerce(o):
    if isinstance(o, DW):
        return o
    # non-negative Python int constants (rounding biases) only
    assert isinstance(o, int) and 0 <= o < (1 << 31), o
    return DW(jnp.int32(0), jnp.int32(o))


class _XPDW:
    """Array-module shim: the 1-D kernels only call xp.stack."""

    @staticmethod
    def stack(arrs, axis=-1):
        return DW(jnp.stack([a.hi for a in arrs], axis=axis),
                  jnp.stack([a.lo for a in arrs], axis=axis))


XPDW = _XPDW()


def where(mask, a: DW, b: DW) -> DW:
    return DW(jnp.where(mask, a.hi, b.hi), jnp.where(mask, a.lo, b.lo))


def _wrap32(d: DW) -> DW:
    """Wrap to int32 (the dctcoef store between the two 1-D passes at
    10/12 bpp, reference: bit_depth_template.c dctcoef=int32_t)."""
    return DW.from_i32(d.lo)


def itxfm_2d(blocks_i32, tx, txtype):
    """Exact high-bit-depth 2-D inverse transform of int32 coefficient
    blocks [..., sz, sz]. Returns the pre-round residual as int32 (the
    post-round value always fits; mirrors itxfm.itxfm_2d's pass
    structure with int64 intermediates and int32 inter-pass wrap)."""
    X = DW.from_i32(blocks_i32)
    if tx == 4:  # lossless WHT
        tmp = _wrap32(itxfm.iwht4_1d(XPDW, X.swapaxes(-1, -2), 0))
        res = _wrap32(itxfm.iwht4_1d(XPDW, tmp.swapaxes(-1, -2), 1))
        return res.swapaxes(-1, -2).lo
    ka, kb = itxfm._TYPE_AB[txtype] if tx < 3 else ("dct", "dct")
    fa = itxfm._1D[(tx, ka)]
    fb = itxfm._1D[(tx, kb)]
    tmp = _wrap32(fa(XPDW, X.swapaxes(-1, -2)))
    res = _wrap32(fb(XPDW, tmp.swapaxes(-1, -2)))
    return res.swapaxes(-1, -2).lo


def itxfm_2d_select(blocks_i32, use_adst_a, use_adst_b, tx):
    """Both-variant form for the batched per-tile selection (recon_tpu
    _residual_for_size): run dct and adst for each pass, select per
    tile. tx in 0..2."""
    X = DW.from_i32(blocks_i32.swapaxes(-1, -2))
    fa_d = itxfm._1D[(tx, "dct")]
    fa_a = itxfm._1D[(tx, "adst")]
    tmp = _wrap32(where(use_adst_a, fa_a(XPDW, X), fa_d(XPDW, X)))
    tmp_t = tmp.swapaxes(-1, -2)
    res = _wrap32(where(use_adst_b, fa_a(XPDW, tmp_t),
                        fa_d(XPDW, tmp_t)))
    return res.swapaxes(-1, -2).lo


def round_residual(res_i32, tx):
    """Final rounding shift. The pre-round value fits int32 for any
    stream (it is the int32-wrapped pass-b output)."""
    return itxfm.round_residual(res_i32, tx)


def dc_only_residual(dc_i32, tx):
    """eob==1 DC fast path with int64 products."""
    d = DW.from_i32(dc_i32)
    t = ((d * 11585 + itxfm.R) >> 14)
    t = ((t * 11585 + itxfm.R) >> 14)
    bits = itxfm.FINAL_SHIFT[tx]
    return ((t + (1 << (bits - 1))) >> bits).lo
