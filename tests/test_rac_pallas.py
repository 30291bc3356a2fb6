"""Differential test: the Pallas multi-stream bool decoder
(ops/rac_pallas.py) vs the spec decoder (codecs/vp9/rac.py) — bit-exact
symbol-for-symbol over random streams, probabilities, and trees."""
import sys
import os

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _encode_stream(bits_probs):
    """bits_probs: [(bit, prob)] -> bytes via the mini encoder's exact
    inverse bool coder."""
    from mini_encoder import BoolEncoder

    e = BoolEncoder()
    for bit, prob in bits_probs:
        e.put(int(bit), int(prob))
    return e.bytes()


def test_decode_bits_multi():
    from ffmpeg_hybrid_tpu.ops.rac_pallas import decode_bits_multi
    from ffmpeg_hybrid_tpu.codecs.vp9.rac import BoolDecoder

    rng = np.random.RandomState(7)
    S, K = 8, 200
    probs = rng.randint(1, 256, (S, K)).astype(np.uint8)
    bits = rng.randint(0, 2, (S, K))
    streams = []
    maxlen = 0
    for s in range(S):
        b = _encode_stream(list(zip(bits[s], probs[s])))
        streams.append(b)
        maxlen = max(maxlen, len(b))
    data = np.zeros((S, maxlen + 4), np.uint8)
    for s, b in enumerate(streams):
        data[s, :len(b)] = np.frombuffer(b, np.uint8)

    # sanity: spec decoder reproduces the bits
    for s in range(S):
        d = BoolDecoder(data[s].tobytes())
        got = [d.get_prob(int(p)) for p in probs[s]]
        assert got == list(bits[s])

    out = np.asarray(decode_bits_multi(data, probs))
    assert np.array_equal(out, bits)


@pytest.mark.parametrize("tree_name", ["INTRAMODE_TREE", "MV_CLASS_TREE",
                                       "PARTITION_TREE"])
def test_decode_tree_multi(tree_name):
    from ffmpeg_hybrid_tpu.codecs.vp9 import tables as T
    from ffmpeg_hybrid_tpu.codecs.vp9.rac import BoolDecoder
    from ffmpeg_hybrid_tpu.ops.rac_pallas import decode_tree_multi
    from mini_encoder import BoolEncoder

    tree = np.asarray(getattr(T, tree_name), np.int32)
    NN = tree.shape[0]
    rng = np.random.RandomState(hash(tree_name) % 1000)
    S, K = 8, 64
    probs = rng.randint(40, 220, (S, NN)).astype(np.uint8)
    # leaf values present in the tree
    leaves = sorted({-int(v) for v in tree.reshape(-1) if v <= 0})
    syms = rng.choice(leaves, (S, K))

    data = np.zeros((S, 512), np.uint8)
    for s in range(S):
        e = BoolEncoder()
        for v in syms[s]:
            e.put_tree(tree, probs[s], int(v))
        b = e.bytes()
        data[s, :len(b)] = np.frombuffer(b, np.uint8)

    # sanity vs spec decoder
    for s in range(S):
        d = BoolDecoder(data[s].tobytes())
        got = [d.get_tree(tree, probs[s]) for _ in range(K)]
        assert got == list(syms[s])

    out = np.asarray(decode_tree_multi(data, probs, tree, K))
    assert np.array_equal(out, syms)


def test_overread_matches_spec():
    """Streams of different lengths: exhausted lanes keep decoding
    zero-fed bits exactly like the spec decoder's overread behavior."""
    from ffmpeg_hybrid_tpu.codecs.vp9.rac import BoolDecoder
    from ffmpeg_hybrid_tpu.ops.rac_pallas import decode_bits_multi

    rng = np.random.RandomState(3)
    S, K = 4, 64
    probs = np.full((S, K), 128, np.uint8)
    data = np.zeros((S, 8), np.uint8)
    data[:, :3] = rng.randint(0, 256, (S, 3))  # only 3 real bytes

    ref = np.zeros((S, K), np.int64)
    for s in range(S):
        d = BoolDecoder(data[s, :3].tobytes())
        ref[s] = [d.get_prob(128) for _ in range(K)]
    # feed the kernel only the 3 real bytes' worth: pass L=3 buffers
    out = np.asarray(decode_bits_multi(data[:, :3], probs))
    assert np.array_equal(out, ref)
