#!/usr/bin/env python3
"""Generate ffmpeg_hybrid_tpu/codecs/vp9/tables.py from the JSON emitted by
tools/dump_tables.c (normative VP9 constants, extracted mechanically from the
reference build so values are guaranteed exact).

Usage: python tools/gen_tables.py /tmp/vp9_tables.json
"""
import json
import sys

RENAME = {  # ff_vp9_foo -> FOO
}


def pyname(k: str) -> str:
    if k.startswith("ff_vp9_"):
        k = k[len("ff_vp9_"):]
    elif k.startswith("ff_vpx_"):
        k = k[len("ff_vpx_"):]
    return k.upper()


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vp9_tables.json"
    dst = sys.argv[2] if len(sys.argv) > 2 else "ffmpeg_hybrid_tpu/codecs/vp9/tables.py"
    d = json.load(open(src))
    d.pop("_end", None)
    out = []
    out.append('"""Normative VP9 constant tables (auto-generated — do not edit).\n')
    out.append("Values are the VP9 spec / libvpx constants, extracted mechanically from\n")
    out.append("the reference decoder's data tables (reference: libavcodec/vp9data.c,\n")
    out.append("vp9dsp.c:32-85 subpel filters, vpx_rac.c:27 norm shift) via\n")
    out.append("tools/dump_tables.c + tools/gen_tables.py.\n")
    out.append('"""\n')
    out.append("import numpy as np\n\n")
    for k, v in d.items():
        name = pyname(k)
        dims = v["dims"]
        data = v["data"]
        lo, hi = min(data), max(data)
        if lo >= -128 and hi <= 127:
            dt = "np.int8"
        elif lo >= 0 and hi <= 255:
            dt = "np.uint8"
        elif lo >= -32768 and hi <= 32767:
            dt = "np.int16"
        else:
            dt = "np.int32"
        flat = ",".join(str(x) for x in data)
        shape = tuple(dims)
        if len(shape) == 1:
            out.append(f"{name} = np.array([{flat}], dtype={dt})\n")
        else:
            out.append(
                f"{name} = np.array([{flat}], dtype={dt}).reshape{shape}\n")
    # Composite dispatchers mirroring ff_vp9_scans / ff_vp9_scans_nb
    out.append(
        """

def _pad_scan(a, n):
    out = np.zeros(n, dtype=np.int16)
    out[: a.size] = a
    return out


def _pad_nb(a, n):
    out = np.zeros((n, 2), dtype=np.int16)
    out[: a.shape[0]] = a
    return out


# SCANS[tx][txtype] -> int16 scan order (padded to 1024 for uniform shape);
# txtype order matches TxfmType: DCT_DCT, DCT_ADST(col), ADST_DCT(row), ADST_ADST
# (reference: libavcodec/vp9data.c:600-617)
SCANS = {
    0: [DEFAULT_SCAN_4X4, COL_SCAN_4X4, ROW_SCAN_4X4, DEFAULT_SCAN_4X4],
    1: [DEFAULT_SCAN_8X8, COL_SCAN_8X8, ROW_SCAN_8X8, DEFAULT_SCAN_8X8],
    2: [DEFAULT_SCAN_16X16, COL_SCAN_16X16, ROW_SCAN_16X16, DEFAULT_SCAN_16X16],
    3: [DEFAULT_SCAN_32X32] * 4,
    4: [DEFAULT_SCAN_4X4, COL_SCAN_4X4, ROW_SCAN_4X4, DEFAULT_SCAN_4X4],
}
SCANS_NB = {
    0: [DEFAULT_SCAN_4X4_NB, COL_SCAN_4X4_NB, ROW_SCAN_4X4_NB, DEFAULT_SCAN_4X4_NB],
    1: [DEFAULT_SCAN_8X8_NB, COL_SCAN_8X8_NB, ROW_SCAN_8X8_NB, DEFAULT_SCAN_8X8_NB],
    2: [DEFAULT_SCAN_16X16_NB, COL_SCAN_16X16_NB, ROW_SCAN_16X16_NB,
        DEFAULT_SCAN_16X16_NB],
    3: [DEFAULT_SCAN_32X32_NB] * 4,
    4: [DEFAULT_SCAN_4X4_NB, COL_SCAN_4X4_NB, ROW_SCAN_4X4_NB, DEFAULT_SCAN_4X4_NB],
}
"""
    )
    with open(dst, "w") as f:
        f.write("".join(out))
    print(f"wrote {dst}: {len(d)} tables")


if __name__ == "__main__":
    main()
