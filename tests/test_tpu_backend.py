"""Conformance through the TPU (JAX) pass-B backend — must equal the
oracle bit-for-bit, same as the golden path. Runs on CPU-jax in CI;
the same code path runs on real TPU.

The FULL vector corpus is gated here (VERDICT round-1 item 5): every
vector test_e2e.py runs on the golden backend also runs through
recon_backend="tpu". bench_1080p is the one exception by default (50
frames of 1080p through CPU-jax; enable with FULL_TPU_E2E=1) — the real
chip runs it on every `bench.py` invocation anyway.
"""
import os

import pytest

from ffmpeg_hybrid_tpu.formats.framemd5 import (parse_framemd5,
                                                decode_file_md5s)

from test_e2e import INTRA, INTER, SPECIAL, MINI

VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")

ALL = INTRA + INTER + MINI + [
    n for n in SPECIAL
    if not n.startswith("bench_") or os.environ.get("FULL_TPU_E2E")]


@pytest.mark.parametrize("name", ALL)
def test_tpu_backend_conformance(name):
    ivf = os.path.join(VEC_DIR, name + ".ivf")
    if not os.path.exists(ivf):
        pytest.skip("vectors not generated")
    ref = parse_framemd5(os.path.join(VEC_DIR, name + ".framemd5"))
    got = decode_file_md5s(ivf, backend="tpu")
    assert len(got) == len(ref)
    for i, (r, g) in enumerate(zip(ref, got)):
        assert r == g, f"{name} frame {i}: TPU backend mismatch"


@pytest.mark.parametrize("name", ["inter_66x66_5f", "intra_66x66",
                                  "mini_comp"])
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
