"""Conformance through the TPU (JAX) pass-B backend — must equal the
oracle bit-for-bit, same as the golden path. Runs on CPU-jax in CI;
the same code path runs on real TPU."""
import os

import pytest

from ffmpeg_hybrid_tpu.formats.framemd5 import (parse_framemd5,
                                                decode_file_md5s)

VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")


@pytest.mark.parametrize("name", ["intra_64", "intra_66x66", "intra_98x66",
                                  "inter_64_5f", "inter_130x98_8f",
                                  "inter_grad_8f", "mini_lossless_64",
                                  "mini_lossless12_64",
                                  "mini_rand_130x70", "mini_rand10_96x64",
                                  "mini_rand10_tx4_64",
                                  "mini_rand12_130x70",
                                  "mini_rand12_444_64",
                                  "mini_rand_252q_64",
                                  "mini_inter_mv", "mini_scaled_mv_up",
                                  "mini_scaled_mv_dn",
                                  "mini_scaled_mv_odd"])
def test_tpu_backend_conformance(name):
    ivf = os.path.join(VEC_DIR, name + ".ivf")
    if not os.path.exists(ivf):
        pytest.skip("vectors not generated")
    ref = parse_framemd5(os.path.join(VEC_DIR, name + ".framemd5"))
    got = decode_file_md5s(ivf, backend="tpu")
    assert len(got) == len(ref)
    for i, (r, g) in enumerate(zip(ref, got)):
        assert r == g, f"{name} frame {i}: TPU backend mismatch"


@pytest.mark.parametrize("name", ["inter_66x66_5f", "intra_66x66"])
def test_tpu_backend_no_native(name):
    """TPU pass B fed by the pure-Python pass A (record synthesis, the
    numpy pair packer, and the host loop-filter fallback through
    sync_host's coded-area pull)."""
    ivf = os.path.join(VEC_DIR, name + ".ivf")
    if not os.path.exists(ivf):
        pytest.skip("vectors not generated")
    ref = parse_framemd5(os.path.join(VEC_DIR, name + ".framemd5"))
    got = decode_file_md5s(ivf, backend="tpu", use_native=False)
    assert len(got) == len(ref)
    for i, (r, g) in enumerate(zip(ref, got)):
        assert r == g, f"{name} frame {i}: no-native TPU mismatch"
