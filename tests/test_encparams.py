"""Encode-parameters side-data export (codecs/vp9/encparams.py):
byte-identical to the reference's AV_VIDEO_ENC_PARAMS_VP9 export
(vp9.c:1554-1604) as dumped by tools/venc_data_dump.c — the FATE
fate-vp9-encparams gate (tests/fate/vpx.mak:144) re-created against
the local oracle build."""
import os
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..")
DUMP = os.path.join(ROOT, ".oracle", "build", "tools", "venc_data_dump")
TOOLS = os.path.join(ROOT, "tools")

requires_dump_tool = pytest.mark.skipif(
    not os.path.exists(DUMP),
    reason="oracle venc_data_dump not built "
           "(cd .oracle/build && make tools/venc_data_dump)")


def _ours(path, use_native):
    from ffmpeg_hybrid_tpu.__main__ import main
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    argv = [path, "-f", "encparams"]
    if not use_native:
        argv.append("--no-native")
    with redirect_stdout(buf):
        main(argv)
    return buf.getvalue()


def _oracle(path):
    out = subprocess.run([DUMP, path, "0", "99"], capture_output=True,
                         text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    return out.stdout


@requires_dump_tool
@pytest.mark.parametrize("vec", ["mini_segq_130x70", "mini_segabs_96x64",
                                 "mini_seg_temporal", "mini_segref",
                                 "show_existing", "fate_q20"])
@pytest.mark.parametrize("use_native", [True, False],
                         ids=["native", "python"])
def test_encparams_matches_oracle(vec, use_native):
    path = os.path.join(ROOT, "vectors", vec + ".ivf")
    if not os.path.exists(path):
        pytest.skip(f"vector {vec} not generated")
    assert _ours(path, use_native) == _oracle(path)


@requires_dump_tool
def test_encparams_seg_with_tiles(tmp_path):
    """Block entries with 2 tile columns: export order must match the
    reference's block_structure order."""
    sys.path.insert(0, TOOLS)
    try:
        from mini_encoder import encode_keyframe_random
    finally:
        sys.path.pop(0)
    from ffmpeg_hybrid_tpu.formats.ivf import write_ivf
    pkt = encode_keyframe_random(
        512, 128, 8, seed=31, txfmmode=3, yac_qi=60, filter_level=8,
        tile_cols_log2=1,
        seg_feat=[(20, 0, -1, 0), (-30, 0, -1, 0), (15, 0, -1, 0),
                  (40, 0, -1, 0)] + [(0, 0, -1, 0)] * 4)
    path = str(tmp_path / "segtiles.ivf")
    write_ivf(path, b"VP90", 512, 128, 30, 1, [(0, pkt)])
    assert _ours(path, True) == _oracle(path)
