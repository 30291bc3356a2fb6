"""End-to-end conformance: decode generated vectors, compare per-frame MD5
against the oracle decoder (our FATE equivalent)."""
import os
import subprocess

import pytest

from ffmpeg_hybrid_tpu.formats.framemd5 import (parse_framemd5,
                                                decode_file_md5s)

VEC_DIR = os.path.join(os.path.dirname(__file__), "..", "vectors")
ORACLE = os.path.join(os.path.dirname(__file__), "..", ".oracle", "build",
                      "ffmpeg")


def ensure_vectors():
    if not os.path.exists(os.path.join(VEC_DIR, "intra_64.ivf")):
        if not os.path.exists(ORACLE):
            pytest.skip("oracle ffmpeg not built")
        subprocess.run(
            ["python", os.path.join(os.path.dirname(__file__), "..",
                                    "tools", "make_vectors.py")],
            check=True, capture_output=True)


INTRA = ["intra_64", "intra_64_noise", "intra_66x66", "intra_98x66",
         "intra_130x98", "intra_176x144", "intra_200x120_noise",
         "intra_352x288"]
INTER = ["inter_64_5f", "inter_66x66_5f", "inter_130x98_8f",
         "inter_176x144_10f", "inter_176x144_noise", "inter_352x288_10f",
         "inter_grad_8f"]
SPECIAL = ["show_existing", "superframe", "bench_1080p",
           "bench_1080p_lf"]
MINI = ["mini_gray_64", "mini_gray_130x70", "mini_gray10_128x72",
        "mini_gray12_64", "mini_lossless_64", "mini_lossless_130x70",
        "mini_lossless10_96x64", "mini_lossless12_64",
        "mini_intraonly", "mini_inter", "mini_scaled",
        "mini_444_64", "mini_422_64", "mini_440_64", "mini_422_98x66",
        "mini_444_12_64", "mini_422_10_64",
        "mini_seg_128x72", "mini_seg_130x70",
        "mini_rand_130x70", "mini_rand10_96x64", "mini_rand10_tx4_64",
        "mini_rand12_130x70", "mini_rand12_444_64", "mini_rand_252q_64",
        # TX_SWITCHABLE (txfmmode=4): per-block tx-size coding
        "mini_randsw_130x70", "mini_randsw10_96x64",
        "mini_randsw12_444_64",
        "mini_inter_mv", "mini_scaled_mv_up", "mini_scaled_mv_dn",
        "mini_scaled_mv_odd", "mini_seg_temporal",
        # flat-prob flex vectors: compound prediction, switchable/bilinear/
        # sharp filters, hp MVs, intra-in-inter, scaled compound
        "mini_comp", "mini_comp_sw", "mini_hp", "mini_filters",
        "mini_comp_scaled",
        # sharpness 1-7 (lim-LUT rebuild) and tile rows/cols
        "mini_sharp5_130x70", "mini_sharp7_96x64", "mini_sharpvar",
        "mini_tiles2x2", "mini_tilerows4",
        # segmentation FEATURES: per-segment Q/LF (delta + absolute),
        # skip, forced-REF (incl. compound interplay), lf_delta updates
        "mini_segq_130x70", "mini_segabs_96x64", "mini_lfdelta_130x70",
        "mini_segref", "mini_segref_comp"]


@pytest.mark.parametrize("name", INTRA)
def test_intra_conformance(name):
    ensure_vectors()
    ivf = os.path.join(VEC_DIR, name + ".ivf")
    ref = parse_framemd5(os.path.join(VEC_DIR, name + ".framemd5"))
    got = decode_file_md5s(ivf)
    assert len(got) == len(ref), f"{name}: frame count {len(got)} != {len(ref)}"
    for i, ((rs, rh), (gs, gh)) in enumerate(zip(ref, got)):
        assert gs == rs, f"{name} frame {i}: size {gs} != {rs}"
        assert gh == rh, f"{name} frame {i}: md5 mismatch"


@pytest.mark.parametrize("name", SPECIAL)
def test_special_conformance(name):
    """show-existing-frame replay, superframes with invisible frames,
    and the 4-tile-column 1080p stream."""
    ensure_vectors()
    ivf = os.path.join(VEC_DIR, name + ".ivf")
    if not os.path.exists(ivf):
        pytest.skip("special vectors not generated "
                    "(tools/make_special_vectors.py)")
    ref = parse_framemd5(os.path.join(VEC_DIR, name + ".framemd5"))
    got = decode_file_md5s(ivf)
    assert len(got) == len(ref)
    for i, (r, g) in enumerate(zip(ref, got)):
        assert r == g, f"{name} frame {i}: mismatch"


@pytest.mark.parametrize("name", MINI)
def test_mini_encoder_conformance(name):
    """Streams from the in-repo mini encoder: profile 2 (10/12-bit),
    lossless WHT coefficients, odd sizes with edge-implied partitions."""
    ensure_vectors()
    ivf = os.path.join(VEC_DIR, name + ".ivf")
    if not os.path.exists(ivf):
        pytest.skip("mini vectors not generated (tools/mini_encoder.py)")
    ref = parse_framemd5(os.path.join(VEC_DIR, name + ".framemd5"))
    got = decode_file_md5s(ivf)
    assert len(got) == len(ref)
    for i, (r, g) in enumerate(zip(ref, got)):
        assert r == g, f"{name} frame {i}: mismatch"


@pytest.mark.parametrize("name", INTER)
def test_inter_conformance(name):
    ensure_vectors()
    ivf = os.path.join(VEC_DIR, name + ".ivf")
    ref = parse_framemd5(os.path.join(VEC_DIR, name + ".framemd5"))
    got = decode_file_md5s(ivf)
    assert len(got) == len(ref)
    for i, ((rs, rh), (gs, gh)) in enumerate(zip(ref, got)):
        assert gs == rs and gh == rh, f"{name} frame {i}: mismatch"
