"""ctypes wrapper around .oracle/libref_harness.so — the reference decoder's
range coder and DSP kernels, used as the differential-test golden
(our checkasm equivalent; model: reference tests/checkasm/vp9dsp.c)."""
import ctypes
import os

import numpy as np

_LIB = None


def lib():
    global _LIB
    if _LIB is None:
        path = os.path.join(os.path.dirname(__file__), "..", ".oracle",
                            "libref_harness.so")
        _LIB = ctypes.CDLL(os.path.abspath(path))
    return _LIB


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def rac_decode(buf: bytes, ops):
    """ops: int32 array; 0..255 = get_prob(p), 256 = literal bit."""
    ops = np.asarray(ops, dtype=np.int32)
    data = np.frombuffer(bytes(buf), dtype=np.uint8)
    out = np.zeros(len(ops), dtype=np.uint8)
    state = np.zeros(4, dtype=np.int64)
    rc = lib().ref_rac_decode(_ptr(data), len(data), _ptr(ops), len(ops),
                              _ptr(out), _ptr(state))
    assert rc == 0
    return out, state


def itxfm_add(bpp, tx, typ, dst, block, eob):
    """dst: (h, stride_px) pixel array (uint8 or uint16, modified in place);
    block: coeff array (int16 for 8bpp else int32, modified in place)."""
    assert dst.flags["C_CONTIGUOUS"] and block.flags["C_CONTIGUOUS"]
    stride = dst.strides[0]
    lib().ref_itxfm_add(bpp, tx, typ, _ptr(dst), ctypes.c_long(stride),
                        _ptr(block), int(eob))


def intra_pred(bpp, tx, mode, dst, left, top_buf):
    """top_buf: array whose element [1] is 'top[0]' (so [0] is top[-1])."""
    stride = dst.strides[0]
    itemsize = dst.itemsize
    top_ptr = ctypes.c_void_p(top_buf.ctypes.data + itemsize)
    lib().ref_intra_pred(bpp, tx, mode, _ptr(dst), ctypes.c_long(stride),
                         _ptr(left), top_ptr)


def loop_filter_8(bpp, wd, dir_, dst, off_elems, mb_lim, lim, hev_thr):
    stride = dst.strides[0]
    p = ctypes.c_void_p(dst.ctypes.data + off_elems * dst.itemsize)
    lib().ref_loop_filter_8(bpp, wd, dir_, p, ctypes.c_long(stride),
                            int(mb_lim), int(lim), int(hev_thr))


def loop_filter_16(bpp, dir_, dst, off_elems, mb_lim, lim, hev_thr):
    stride = dst.strides[0]
    p = ctypes.c_void_p(dst.ctypes.data + off_elems * dst.itemsize)
    lib().ref_loop_filter_16(bpp, dir_, p, ctypes.c_long(stride),
                             int(mb_lim), int(lim), int(hev_thr))


def loop_filter_mix2(bpp, wd1, wd2, dir_, dst, off_elems, mb_lim, lim,
                     hev_thr):
    stride = dst.strides[0]
    p = ctypes.c_void_p(dst.ctypes.data + off_elems * dst.itemsize)
    lib().ref_loop_filter_mix2(bpp, wd1, wd2, dir_, p, ctypes.c_long(stride),
                               int(mb_lim), int(lim), int(hev_thr))


def mc(bpp, hsize, filt, avg, dst, ref_arr, ref_off_elems, h, mx, my):
    dst_stride = dst.strides[0]
    ref_stride = ref_arr.strides[0]
    rp = ctypes.c_void_p(ref_arr.ctypes.data + ref_off_elems * ref_arr.itemsize)
    lib().ref_mc(bpp, hsize, filt, avg, _ptr(dst), ctypes.c_long(dst_stride),
                 rp, ctypes.c_long(ref_stride), int(h), int(mx), int(my))


def smc(bpp, hsize, filt, avg, dst, ref_arr, ref_off_elems, h, mx, my, dx, dy):
    dst_stride = dst.strides[0]
    ref_stride = ref_arr.strides[0]
    rp = ctypes.c_void_p(ref_arr.ctypes.data + ref_off_elems * ref_arr.itemsize)
    lib().ref_smc(bpp, hsize, filt, avg, _ptr(dst), ctypes.c_long(dst_stride),
                  rp, ctypes.c_long(ref_stride), int(h), int(mx), int(my),
                  int(dx), int(dy))
