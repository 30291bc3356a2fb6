"""Differential test: loop filter core vs reference DSP (checkasm
check_loopfilter equivalent, reference tests/checkasm/vp9dsp.c:452)."""
import numpy as np
import pytest

from ffmpeg_hybrid_tpu.ops import lpf

from conftest import requires_oracle
import ref_harness


def rand_near_edge(rng, sz, bpp, E, I, H):
    """Adversarial buffers straddling the E/I/H thresholds
    (model: randomize_loopfilter_buffers, vp9dsp.c:393)."""
    maxp = (1 << bpp) - 1
    buf = rng.randint(0, maxp + 1, (sz, sz)).astype(
        np.uint8 if bpp == 8 else np.uint16)
    # bias differences to be near the limits so all paths trigger
    base = rng.randint(0, maxp + 1)
    for i in range(sz):
        for j in range(sz):
            d = rng.randint(-2, 3) * rng.choice([1, I, E, 1, 1])
            buf[i, j] = np.clip(base + d, 0, maxp)
    return buf


@requires_oracle
@pytest.mark.parametrize("wd", [0, 1, 2])  # 4, 8, 16 wide
@pytest.mark.parametrize("dir_", [0, 1])
def test_loop_filter_8_8bpp(wd, dir_):
    rng = np.random.RandomState(wd * 2 + dir_)
    for trial in range(30):
        L = rng.randint(1, 64)
        lim = np.arange(64, dtype=np.int32)
        limit = np.maximum(np.minimum(lim, 9), 1)
        E = 2 * (L + 2) + min(L, 9)
        # use the real LUT semantics: sharpness 0
        I = max(min(L, 63), 1) if L else 0
        I = min(L, 63)
        I = max(I, 1)
        H = L >> 4
        buf = rand_near_edge(rng, 32, 8, E, I, H)
        ref = buf.copy()
        off = 8 * 32 + 16 if dir_ == 0 else 16 * 32 + 8
        ref_harness.loop_filter_8(8, wd, dir_, ref, off, E, I, H)
        mine = buf.copy().astype(np.int32)
        wdv = [4, 8, 16][wd]
        lpf._apply(mine, 8 if dir_ == 0 else 16, 16 if dir_ == 0 else 8,
                   dir_, wdv, E, I, H, 8, 8)
        assert np.array_equal(ref.astype(np.int32), mine), \
            f"wd={wdv} dir={dir_} trial={trial} L={L}"


@requires_oracle
@pytest.mark.parametrize("dir_", [0, 1])
def test_loop_filter_16(dir_):
    rng = np.random.RandomState(55 + dir_)
    for trial in range(20):
        L = rng.randint(1, 64)
        E = 2 * (L + 2) + max(min(L, 9), 1)
        I = max(min(L, 63), 1)
        H = L >> 4
        buf = rand_near_edge(rng, 48, 8, E, I, H)
        ref = buf.copy()
        off = 8 * 48 + 16 if dir_ == 0 else 16 * 48 + 8
        ref_harness.loop_filter_16(8, dir_, ref, off, E, I, H)
        mine = buf.copy().astype(np.int32)
        lpf._apply(mine, 8 if dir_ == 0 else 16, 16 if dir_ == 0 else 8,
                   dir_, 16, E, I, H, 8, 16)
        assert np.array_equal(ref.astype(np.int32), mine), \
            f"dir={dir_} trial={trial}"


@requires_oracle
@pytest.mark.parametrize("wd1,wd2", [(0, 0), (0, 1), (1, 0), (1, 1)])
@pytest.mark.parametrize("dir_", [0, 1])
def test_loop_filter_mix2(wd1, wd2, dir_):
    rng = np.random.RandomState(99 + wd1 * 4 + wd2 * 2 + dir_)
    for trial in range(15):
        L1, L2 = rng.randint(1, 64, 2)
        mk = lambda L: (2 * (L + 2) + max(min(L, 9), 1),
                        max(min(L, 63), 1), L >> 4)
        E1, I1, H1 = mk(L1)
        E2, I2, H2 = mk(L2)
        buf = rand_near_edge(rng, 48, 8, E1, I1, H1)
        ref = buf.copy()
        off = 8 * 48 + 16 if dir_ == 0 else 16 * 48 + 8
        ref_harness.loop_filter_mix2(
            8, wd1, wd2, dir_, ref, off,
            E1 | (E2 << 8), I1 | (I2 << 8), H1 | (H2 << 8))
        mine = buf.copy().astype(np.int32)
        w1 = [4, 8][wd1]
        w2 = [4, 8][wd2]
        if dir_ == 0:
            lpf._apply(mine, 8, 16, 0, w1, E1, I1, H1, 8, 8)
            lpf._apply(mine, 16, 16, 0, w2, E2, I2, H2, 8, 8)
        else:
            lpf._apply(mine, 16, 8, 1, w1, E1, I1, H1, 8, 8)
            lpf._apply(mine, 16, 16, 1, w2, E2, I2, H2, 8, 8)
        assert np.array_equal(ref.astype(np.int32), mine), \
            f"wd={w1},{w2} dir={dir_} trial={trial}"
