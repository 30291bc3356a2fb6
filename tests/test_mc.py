"""Differential test: MC kernels vs reference DSP (checkasm check_mc
equivalent, reference tests/checkasm/vp9dsp.c:559)."""
import numpy as np
import pytest

from ffmpeg_hybrid_tpu.ops import mc

from conftest import requires_oracle
import ref_harness

SIZES = [(0, 64), (1, 32), (2, 16), (3, 8), (4, 4)]


@requires_oracle
@pytest.mark.parametrize("hsize,bw", SIZES)
@pytest.mark.parametrize("filt", [0, 1, 2, 3])
@pytest.mark.parametrize("avg", [0, 1])
def test_mc_8bpp(hsize, bw, filt, avg):
    rng = np.random.RandomState(hsize * 16 + filt * 4 + avg)
    W = 160
    ref_plane = rng.randint(0, 256, (W, W), dtype=np.uint8)
    for mx, my in [(0, 0), (5, 0), (0, 9), (7, 13), (15, 15), (1, 8)]:
        dst_ref = rng.randint(0, 256, (bw, W), dtype=np.uint8)
        dst_my = dst_ref[:, :bw].astype(np.int32).copy()
        # reference call: ref pointer at interior position (40, 40)
        off = 40 * W + 40
        d = dst_ref.copy()
        ref_harness.mc(8, hsize, filt, avg, d, ref_plane, off, bw, mx, my)
        # my call: mv16 = (mx, my), position (40, 40), full-visible plane
        mc.mc_unscaled(dst_my, 0, 0, ref_plane.astype(np.int32), 40, 40,
                       bw, bw, mx, my, W, W, filt, avg, 8)
        assert np.array_equal(d[:, :bw].astype(np.int32), dst_my), \
            f"hsize={hsize} filt={filt} avg={avg} mx={mx} my={my}"


@requires_oracle
@pytest.mark.parametrize("filt", [0, 1, 2, 3])
def test_mc_edge_clamp(filt):
    """MC reading beyond frame edges must equal the reference's emulated
    edge path. Emulate by running the reference with an explicitly
    replicated plane."""
    rng = np.random.RandomState(77 + filt)
    w, h = 24, 20
    bw = 8
    plane = rng.randint(0, 256, (h, w), dtype=np.uint8)
    # build a big replicated canvas around the visible area
    PAD = 32
    canvas = np.pad(plane, PAD, mode="edge")
    for (x, y, mx, my) in [(-5, -4, 7, 9), (w - 2, h - 1, 15, 3),
                           (-8, h + 2, 4, 4), (w + 3, -6, 0, 11)]:
        dst_ref = np.zeros((bw, 64), dtype=np.uint8)
        d = dst_ref.copy()
        off = (y + PAD) * canvas.shape[1] + (x + PAD)
        ref_harness.mc(8, 3, filt, 0, d, canvas, off, bw, mx, my)
        dst_my = np.zeros((bw, bw), np.int32)
        mc.mc_unscaled(dst_my, 0, 0, plane.astype(np.int32), y, x,
                       bw, bw, mx, my, w, h, filt, 0, 8)
        assert np.array_equal(d[:, :bw].astype(np.int32), dst_my), \
            f"filt={filt} pos=({x},{y}) mv=({mx},{my})"


@requires_oracle
@pytest.mark.parametrize("filt", [0, 1, 3])
@pytest.mark.parametrize("avg", [0, 1])
def test_smc_8bpp(filt, avg):
    rng = np.random.RandomState(31 + filt * 2 + avg)
    W = 200
    ref_plane = rng.randint(0, 256, (W, W), dtype=np.uint8)
    for (mx, my, dx, dy) in [(3, 5, 20, 24), (0, 0, 16, 16), (15, 9, 9, 40),
                             (8, 8, 32, 32)]:
        bw = 16
        dst_ref = rng.randint(0, 256, (bw, W), dtype=np.uint8)
        d = dst_ref.copy()
        off = 60 * W + 60
        ref_harness.smc(8, 2, filt, avg, d, ref_plane, off, bw, mx, my,
                        dx, dy)
        dst_my = dst_ref[:, :bw].astype(np.int32).copy()
        mc.mc_scaled(dst_my, 0, 0, ref_plane.astype(np.int32), 60, 60,
                     bw, bw, mx, my, dx, dy, W, W, filt, avg, 8)
        assert np.array_equal(d[:, :bw].astype(np.int32), dst_my), \
            f"filt={filt} avg={avg} step=({dx},{dy}) phase=({mx},{my})"
