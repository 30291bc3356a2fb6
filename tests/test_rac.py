"""Differential test: our spec-form bool decoder vs the reference range coder."""
import numpy as np

from ffmpeg_hybrid_tpu.codecs.vp9.rac import BoolDecoder

from conftest import requires_oracle
import ref_harness


@requires_oracle
def test_rac_random_probs():
    rng = np.random.RandomState(1234)
    for trial in range(20):
        n = 5000
        buf = rng.randint(0, 256, size=2048, dtype=np.uint8).tobytes()
        # random probs in [1, 255]; sprinkle literal-bit ops (256)
        ops = rng.randint(1, 256, size=n).astype(np.int32)
        ops[rng.rand(n) < 0.2] = 256
        ref_bits, _state = ref_harness.rac_decode(buf, ops)

        dec = BoolDecoder(buf)
        mine = np.zeros(n, dtype=np.uint8)
        for i, op in enumerate(ops):
            mine[i] = dec.get() if op == 256 else dec.get_prob(int(op))
        assert np.array_equal(mine, ref_bits), f"trial {trial} mismatch"


@requires_oracle
def test_rac_extreme_probs():
    rng = np.random.RandomState(7)
    buf = rng.randint(0, 256, size=64, dtype=np.uint8).tobytes()
    ops = np.array([1, 255, 1, 1, 255, 128, 1, 255] * 40, dtype=np.int32)
    ref_bits, _ = ref_harness.rac_decode(buf, ops)
    dec = BoolDecoder(buf)
    mine = [dec.get_prob(int(p)) for p in ops]
    assert np.array_equal(np.array(mine, dtype=np.uint8), ref_bits)


@requires_oracle
def test_rac_overread_tolerance():
    # Tiny buffer, decode way past end; symbol sequence must still match
    buf = b"\xa5\x3c"
    ops = np.full(200, 128, dtype=np.int32)
    ref_bits, state = ref_harness.rac_decode(buf, ops)
    dec = BoolDecoder(buf)
    mine = [dec.get_prob(128) for _ in range(200)]
    assert np.array_equal(np.array(mine, dtype=np.uint8), ref_bits)
    assert dec.is_end()
