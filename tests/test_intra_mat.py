"""Verify the matmul-form intra predictors against the scalar golden."""
import numpy as np
import pytest

from ffmpeg_hybrid_tpu.ops import intra_tables as it
from ffmpeg_hybrid_tpu.ops.intra import intra_pred


@pytest.mark.parametrize("sz", [4, 8, 16, 32])
@pytest.mark.parametrize("mode", it.MAT_MODES)
@pytest.mark.parametrize("bpp", [8, 12])
def test_mat_matches_golden(sz, mode, bpp):
    rng = np.random.RandomState(sz * 100 + mode + bpp)
    W = it.build_w(mode, sz)
    ta = 2 * sz if sz == 4 else sz
    for _ in range(5):
        topbuf = rng.randint(0, 1 << bpp, 2 * sz + 1).astype(np.int32)
        left = rng.randint(0, 1 << bpp, sz).astype(np.int32)
        # golden HU takes top-down left; canonical edge storage is bottom-up
        gleft = left[::-1] if mode == it.HU else left
        ref = intra_pred(mode, sz, gleft, topbuf, bpp)
        e = np.concatenate([
            topbuf[:1 + ta],
            left,
            [128 << (bpp - 8), 1],
        ]).astype(np.int64)
        got = ((e @ W + 32) >> 6).reshape(sz, sz)
        assert np.array_equal(ref, got), f"mode={mode} sz={sz}"
        # float32 exactness check (the TPU path uses f32 matmul)
        gotf = np.floor((e.astype(np.float32) @ W.astype(np.float32)
                         + 32) / 64).astype(np.int64).reshape(sz, sz)
        assert np.array_equal(ref, gotf)
