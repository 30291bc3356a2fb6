"""Differential test: intra predictors vs reference DSP
(checkasm check_ipred equivalent, reference tests/checkasm/vp9dsp.c:50)."""
import numpy as np
import pytest

from ffmpeg_hybrid_tpu.ops.intra import intra_pred

from conftest import requires_oracle
import ref_harness


@requires_oracle
@pytest.mark.parametrize("tx", [0, 1, 2, 3])
@pytest.mark.parametrize("mode", list(range(15)))
def test_intra_8bpp(tx, mode):
    sz = 4 << tx
    rng = np.random.RandomState(tx * 31 + mode)
    for trial in range(6):
        left = rng.randint(0, 256, 64, dtype=np.uint8)
        topbuf = rng.randint(0, 256, 2 * 64 + 16, dtype=np.uint8)
        dst = np.zeros((sz, sz + 12), dtype=np.uint8)  # stride sz+12...
        dst = np.zeros((sz, 64), dtype=np.uint8)
        ref_harness.intra_pred(8, tx, mode, dst, left, topbuf)
        mine = intra_pred(mode, sz, left[:sz].astype(np.int32),
                          topbuf[:2 * sz + 1].astype(np.int32), 8)
        assert np.array_equal(dst[:, :sz].astype(np.int32), mine), \
            f"tx={tx} mode={mode} trial={trial}\nref\n{dst[:,:sz]}\nmine\n{mine}"


@requires_oracle
@pytest.mark.parametrize("bpp", [10, 12])
@pytest.mark.parametrize("mode", list(range(15)))
def test_intra_hbd(bpp, mode):
    tx = 1
    sz = 8
    rng = np.random.RandomState(mode + bpp)
    for trial in range(4):
        left = rng.randint(0, 1 << bpp, 64).astype(np.uint16)
        topbuf = rng.randint(0, 1 << bpp, 2 * 64 + 16).astype(np.uint16)
        dst = np.zeros((sz, 64), dtype=np.uint16)
        ref_harness.intra_pred(bpp, tx, mode, dst, left, topbuf)
        mine = intra_pred(mode, sz, left[:sz].astype(np.int32),
                          topbuf[:2 * sz + 1].astype(np.int32), bpp)
        assert np.array_equal(dst[:, :sz].astype(np.int32), mine), \
            f"bpp={bpp} mode={mode}"
