"""Differential test: the double-word (int64-as-int32-pairs) transform
path (ops/dw.py, the TPU high-bit-depth backend) vs the numpy int64
golden (ops/itxfm.py with xp=numpy, dtype int64 — the `dctint int64_t`
semantics of libavcodec/vp9dsp_10bpp.c:25). Bit-exact over all sizes,
types, and wide coefficient ranges."""
import numpy as np
import pytest

from ffmpeg_hybrid_tpu.ops import itxfm


def golden(block_i32, tx, typ):
    r = itxfm.itxfm_2d(np, block_i32.astype(np.int64), tx, typ, 12)
    return itxfm.round_residual(r, tx if tx < 4 else 0).astype(np.int64)


CASES = [(tx, typ) for tx in range(3) for typ in range(4)] + \
    [(3, 0), (4, 0)]


@pytest.mark.parametrize("tx,typ", CASES)
def test_dw_matches_int64(tx, typ):
    from ffmpeg_hybrid_tpu.ops import dw
    rng = np.random.RandomState(tx * 11 + typ)
    sz = 4 << (tx if tx < 4 else 0)
    # dequantized 12-bit coefficients: |v| < 2**22 covers every legal
    # stream (dc_q/ac_q < 2**15 at 12-bit x |qcoef| < 2**7 bands) with
    # a wide margin; also probe the extremes
    for lim in (1 << 10, 1 << 18, 1 << 22):
        blocks = rng.randint(-lim, lim, (5, sz, sz)).astype(np.int32)
        blocks[1] = np.where(rng.rand(sz, sz) < 0.1, blocks[1], 0)
        blocks[2, 1:] = 0  # dc-ish
        ref = np.stack([golden(b, tx, typ) for b in blocks])
        if tx == 4:
            got = dw.itxfm_2d(blocks, 4, 0)
        else:
            got = dw.itxfm_2d(blocks, tx, typ)
        got = dw.round_residual(np.asarray(got), tx if tx < 4 else 0)
        assert np.array_equal(ref, np.asarray(got).astype(np.int64)), \
            f"tx={tx} typ={typ} lim={lim}"


@pytest.mark.parametrize("tx", range(3))
def test_dw_select_variants(tx):
    """itxfm_2d_select (per-tile dct/adst selection) against per-block
    single-variant calls."""
    from ffmpeg_hybrid_tpu.ops import dw
    rng = np.random.RandomState(tx)
    sz = 4 << tx
    blocks = rng.randint(-(1 << 20), 1 << 20, (2, 2, sz, sz)) \
        .astype(np.int32)
    for typ in range(4):
        ua = np.full((2, 2, 1, 1), typ in (1, 3))
        ub = np.full((2, 2, 1, 1), typ in (2, 3))
        got = np.asarray(dw.itxfm_2d_select(blocks, ua, ub, tx))
        ref = np.stack([np.stack([
            np.asarray(dw.itxfm_2d(blocks[i, j], tx, typ))
            for j in range(2)]) for i in range(2)])
        assert np.array_equal(got, ref), f"tx={tx} typ={typ}"


def test_dw_dc_only():
    from ffmpeg_hybrid_tpu.ops import dw
    rng = np.random.RandomState(0)
    for tx in range(4):
        dc = rng.randint(-(1 << 24), 1 << 24, 64).astype(np.int32)
        ref = itxfm.dc_only_residual(dc.astype(np.int64), tx)
        got = np.asarray(dw.dc_only_residual(dc, tx))
        assert np.array_equal(ref.astype(np.int64), got.astype(np.int64))


def test_dw_primitives():
    """add/sub/neg/mul/shift against numpy int64."""
    from ffmpeg_hybrid_tpu.ops.dw import DW
    rng = np.random.RandomState(1)
    a64 = rng.randint(-(1 << 52), 1 << 52, 256)
    b64 = rng.randint(-(1 << 52), 1 << 52, 256)

    def to_dw(v):
        return DW.from_i32(np.int32(0)) if v is None else DW(
            (v >> 32).astype(np.int32),
            (v & 0xFFFFFFFF).astype(np.uint32).astype(np.int64)
            .astype(np.int32))

    def val(d):
        import numpy as _np
        return (d.hi.astype(_np.int64) << 32) | (
            d.lo.astype(_np.int64) & 0xFFFFFFFF)

    # numpy arrays work through the same operator protocol as jnp
    import jax.numpy as jnp
    A = DW(jnp.asarray((a64 >> 32).astype(np.int32)),
           jnp.asarray((a64 & 0xFFFFFFFF).astype(np.uint32)
                       .view(np.int32)))
    B = DW(jnp.asarray((b64 >> 32).astype(np.int32)),
           jnp.asarray((b64 & 0xFFFFFFFF).astype(np.uint32)
                       .view(np.int32)))

    def v(d):
        return (np.asarray(d.hi).astype(np.int64) << 32) | (
            np.asarray(d.lo).astype(np.int64) & 0xFFFFFFFF)

    assert np.array_equal(v(A + B), a64 + b64)
    assert np.array_equal(v(A - B), a64 - b64)
    assert np.array_equal(v(-A), -a64)
    for c in (3, 11585, 16364):
        assert np.array_equal(v(A * c), a64 * c)
    for k in (1, 2, 13, 14, 31):
        assert np.array_equal(v(A >> k), a64 >> k)
    assert np.array_equal(v(A + 8192), a64 + 8192)
