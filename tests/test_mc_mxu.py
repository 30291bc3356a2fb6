"""MXU one-hot MC (ops/mc_mxu.py) vs the gather reference
(recon_tpu._mc_cells), bit-exact on random cell grids — including
frame-edge clamping, compound averaging, all filter banks, sub-pel
phases, the out-of-window fixup path, and the overflow fallback."""
import numpy as np
import pytest
import jax.numpy as jnp

from ffmpeg_hybrid_tpu.ops import recon_tpu
from ffmpeg_hybrid_tpu.ops import mc_mxu


def _mk(r4, c4, H, W, seed, mvr, bpp=8, compfrac=0.5, mvsx=2, mvsy=2):
    rng = np.random.RandomState(seed)
    maxp = (1 << bpp) - 1
    refstack = jnp.asarray(rng.randint(0, maxp + 1, (3, H, W)),
                           jnp.int32)
    # mv16 units are pre-scale: px = mv*mvs/16
    lim = mvr * 16 // mvsx
    mv16 = jnp.asarray(rng.randint(-lim, lim + 1, (r4, c4, 2, 2)),
                       jnp.int32)
    refsel = jnp.asarray(rng.randint(0, 3, (r4, c4, 2)), jnp.int32)
    comp = jnp.asarray(rng.rand(r4, c4) < compfrac)
    filt = jnp.asarray(rng.randint(0, 4, (r4, c4)), jnp.int32)
    inter4 = jnp.asarray(rng.rand(r4, c4) < 0.9)
    return refstack, mv16, refsel, comp, filt, inter4


@pytest.mark.parametrize("case", [
    # (r4, c4, H, W, w, h, mvr_px, bpp)
    (16, 16, 64, 64, 64, 64, 16, 8),          # tiny, heavy clamping
    (24, 32, 96, 128, 98, 90, 40, 8),         # odd real dims, pad grids
    (32, 48, 128, 192, 192, 128, 63, 8),      # full window range
    (16, 16, 64, 64, 64, 64, 16, 10),         # high bit depth
])
def test_mxu_matches_gather(case):
    r4, c4, H, W, w, h, mvr, bpp = case
    refstack, mv16, refsel, comp, filt, inter4 = _mk(
        r4, c4, H, W, seed=r4 + c4, mvr=mvr, bpp=bpp)
    ref = np.asarray(recon_tpu._mc_cells(
        refstack, mv16, refsel, comp, filt, inter4, w, h, bpp, 2, 2))
    got, bad = mc_mxu.mc_cells_mxu_plane(
        refstack, mv16, refsel, comp, filt, inter4, w, h, bpp, 2, 2)
    got, overflow = mc_mxu.mc_cells_fixup(
        np.asarray(got) * 0 + got, bad, refstack, mv16, refsel, comp,
        filt, w, h, bpp, 2, 2)
    assert not bool(overflow)
    got = np.asarray(got)
    # compare only cells the production path uses (inter cells)
    m = np.repeat(np.repeat(np.asarray(inter4), 4, 0), 4, 1)
    ref4 = ref[:r4 * 4, :c4 * 4]
    bad_d = np.argwhere((ref4 != got) & m)
    assert len(bad_d) == 0, \
        f"{len(bad_d)} mismatches, first {bad_d[:3]}"


@pytest.mark.parametrize("case", [
    (16, 16, 64, 64, 64, 64, 16),
    (24, 32, 96, 128, 98, 90, 40),
    (32, 48, 128, 192, 192, 128, 63),
])
def test_bf16_path_matches_gather_on_cpu(case):
    """The production 8-bit TPU path (force_bf16=True: one-hot bf16
    matmuls + MXU tap selection) exercised off-chip. CPU XLA computes
    bf16 dots at f32-or-better internal precision, so the
    integers-in-bf16 exactness argument must hold here exactly as on
    the MXU; this covers the mask/HF construction of the exact path
    that the default CPU run never takes (mc_mxu.py force_bf16)."""
    r4, c4, H, W, w, h, mvr = case
    refstack, mv16, refsel, comp, filt, inter4 = _mk(
        r4, c4, H, W, seed=100 + r4, mvr=mvr, bpp=8)
    ref = np.asarray(recon_tpu._mc_cells(
        refstack, mv16, refsel, comp, filt, inter4, w, h, 8, 2, 2))
    got, bad = mc_mxu.mc_cells_mxu_plane(
        refstack, mv16, refsel, comp, filt, inter4, w, h, 8, 2, 2,
        force_bf16=True)
    got, overflow = mc_mxu.mc_cells_fixup(
        got, bad, refstack, mv16, refsel, comp, filt, w, h, 8, 2, 2)
    assert not bool(overflow)
    m = np.repeat(np.repeat(np.asarray(inter4), 4, 0), 4, 1)
    ref4 = ref[:r4 * 4, :c4 * 4]
    bad_d = np.argwhere((ref4 != np.asarray(got)) & m)
    assert len(bad_d) == 0, \
        f"{len(bad_d)} mismatches, first {bad_d[:3]}"


def test_fixup_path_exercised():
    """MVs beyond the window must be flagged and fixed up exactly."""
    r4 = c4 = 64
    H = W = 256
    refstack, mv16, refsel, comp, filt, inter4 = _mk(
        r4, c4, H, W, seed=9, mvr=16)
    mv = np.asarray(mv16).copy()
    # mid-frame cells with huge MVs: frame-edge clamping cannot pull
    # them back into the window, so they must take the fixup path
    mv[32, 32] = [[90 * 8, -100 * 8], [90 * 8, -100 * 8]]
    mv[40, 12] = [[-120 * 8, 100 * 8], [0, 0]]
    mv16 = jnp.asarray(mv)
    inter4 = jnp.asarray(np.asarray(inter4).copy() |
                         np.isin(np.arange(r4), [32, 40])[:, None])
    ref = np.asarray(recon_tpu._mc_cells(
        refstack, mv16, refsel, comp, filt, inter4, W, H, 8, 2, 2))
    out, bad = mc_mxu.mc_cells_mxu_plane(
        refstack, mv16, refsel, comp, filt, inter4, W, H, 8, 2, 2)
    assert bool(np.asarray(bad)[32, 32]) or bool(np.asarray(bad)[40, 12])
    out, overflow = mc_mxu.mc_cells_fixup(
        out, bad, refstack, mv16, refsel, comp, filt, W, H, 8, 2, 2)
    assert not bool(overflow)
    m = np.repeat(np.repeat(np.asarray(inter4), 4, 0), 4, 1)
    assert np.array_equal(ref[:r4 * 4, :c4 * 4] * m,
                          np.asarray(out) * m)


def test_overflow_falls_back():
    """More out-of-window cells than the fixup budget -> the wrapper
    must produce the gather path's result for the whole plane."""
    r4 = c4 = 32
    H = W = 256
    refstack, mv16, refsel, comp, filt, inter4 = _mk(
        r4, c4, H, W, seed=10, mvr=8)
    mv = np.asarray(mv16).copy()
    mv[:, :, :, 1] = 120 * 8   # every cell's dy beyond the window
    mv16 = jnp.asarray(mv)
    ref = np.asarray(recon_tpu._mc_cells(
        refstack, mv16, refsel, comp, filt, inter4, W, H, 8, 2, 2))
    got = np.asarray(mc_mxu.mc_cells(
        refstack, mv16, refsel, comp, filt, inter4, W, H, 8, 2, 2))
    m = np.repeat(np.repeat(np.asarray(inter4), 4, 0), 4, 1)
    assert np.array_equal(ref[:r4 * 4, :c4 * 4] * m, got * m)


def test_chroma_scale_units():
    """mvsx/mvsy = 1 (4:2:0 chroma MV units) path."""
    r4 = c4 = 16
    H = W = 64
    refstack, mv16, refsel, comp, filt, inter4 = _mk(
        r4, c4, H, W, seed=11, mvr=14, mvsx=1, mvsy=1)
    ref = np.asarray(recon_tpu._mc_cells(
        refstack, mv16, refsel, comp, filt, inter4, W, H, 8, 1, 1))
    out, bad = mc_mxu.mc_cells_mxu_plane(
        refstack, mv16, refsel, comp, filt, inter4, W, H, 8, 1, 1)
    out, overflow = mc_mxu.mc_cells_fixup(
        out, bad, refstack, mv16, refsel, comp, filt, W, H, 8, 1, 1)
    assert not bool(overflow)
    m = np.repeat(np.repeat(np.asarray(inter4), 4, 0), 4, 1)
    assert np.array_equal(ref[:r4 * 4, :c4 * 4] * m,
                          np.asarray(out) * m)
