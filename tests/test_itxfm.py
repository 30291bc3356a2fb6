"""Differential test: inverse transforms vs the reference DSP kernels
(our checkasm equivalent of check_itxfm, reference tests/checkasm/vp9dsp.c:311)."""
import numpy as np
import pytest

from ffmpeg_hybrid_tpu.ops import itxfm

from conftest import requires_oracle
import ref_harness


def ref_itxfm(bpp, tx, typ, dst8, block, eob):
    d = dst8.copy()
    blk = block.copy()
    ref_harness.itxfm_add(bpp, tx, typ, d, blk, eob)
    return d


def my_itxfm(bpp, tx, typ, dst, block, eob):
    sz = 4 << (tx if tx < 4 else 0)
    dt = np.int32 if bpp == 8 else np.int64
    blk = block.astype(dt).reshape(sz, sz)
    if tx < 4 and typ == 0 and eob == 1:
        res = itxfm.dc_only_residual(blk[0, 0], tx)
        out = dst.astype(np.int64) + res
    else:
        r = itxfm.itxfm_2d(np, blk, tx, typ, bpp)
        out = dst.astype(np.int64) + itxfm.round_residual(r, tx)
    return np.clip(out, 0, (1 << bpp) - 1).astype(dst.dtype)


CASES = [(tx, typ) for tx in range(4) for typ in range(4)] + [(4, 0)]


@requires_oracle
@pytest.mark.parametrize("tx,typ", CASES)
def test_itxfm_8bpp(tx, typ):
    rng = np.random.RandomState(tx * 7 + typ)
    sz = 4 << (tx if tx < 4 else 0)
    for trial in range(8):
        dst = rng.randint(0, 256, (sz, sz), dtype=np.uint8)
        # in-range random coefficients (spec guarantees |coef| bounded)
        coef = rng.randint(-2048, 2048, sz * sz).astype(np.int16)
        if trial % 3 == 1:  # sparse
            mask = rng.rand(sz * sz) < 0.1
            coef = np.where(mask, coef, 0).astype(np.int16)
        eob = sz * sz
        ref = ref_itxfm(8, tx, typ, dst, coef, eob)
        mine = my_itxfm(8, tx, typ, dst, coef, eob)
        assert np.array_equal(ref, mine), \
            f"tx={tx} typ={typ} trial={trial}\n{ref}\n{mine}"


@requires_oracle
@pytest.mark.parametrize("tx", [0, 1, 2, 3])
def test_itxfm_dconly_8bpp(tx):
    rng = np.random.RandomState(99 + tx)
    sz = 4 << tx
    for trial in range(8):
        dst = rng.randint(0, 256, (sz, sz), dtype=np.uint8)
        coef = np.zeros(sz * sz, dtype=np.int16)
        coef[0] = rng.randint(-8192, 8192)
        ref = ref_itxfm(8, tx, 0, dst, coef, 1)
        mine = my_itxfm(8, tx, 0, dst, coef, 1)
        assert np.array_equal(ref, mine), f"tx={tx} dc trial={trial}"


@requires_oracle
@pytest.mark.parametrize("tx,typ", CASES)
@pytest.mark.parametrize("bpp", [10, 12])
def test_itxfm_hbd(tx, typ, bpp):
    rng = np.random.RandomState(1000 + tx * 7 + typ + bpp)
    sz = 4 << (tx if tx < 4 else 0)
    for trial in range(4):
        dst = rng.randint(0, 1 << bpp, (sz, sz)).astype(np.uint16)
        coef = rng.randint(-(1 << (bpp + 3)), 1 << (bpp + 3),
                           sz * sz).astype(np.int32)
        eob = sz * sz
        d = dst.copy()
        blk = coef.copy()
        ref_harness.itxfm_add(bpp, tx, typ, d, blk, eob)
        mine = my_itxfm(bpp, tx, typ, dst, coef, eob)
        assert np.array_equal(d, mine), f"bpp={bpp} tx={tx} typ={typ}"
