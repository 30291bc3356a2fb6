"""Decode CLI — the fftools front-end equivalent
(reference: fftools/ffmpeg.c:963 main; output formats mirror the
framemd5 / rawvideo / yuv4mpegpipe muxers used by FATE).

    python -m ffmpeg_hybrid_tpu IN.ivf|IN.webm [-f framemd5|y4m|rawvideo]
           [-o OUT] [-b golden|tpu] [--no-native] [--frames N] [-v]

framemd5 output is byte-compatible with `ffmpeg -bitexact -f framemd5`,
so `python -m ffmpeg_hybrid_tpu in.ivf | diff - ref.framemd5` is the
conformance check.
"""
import argparse
import hashlib
import sys
import time


def _open_packets(path):
    if path.endswith(".webm") or path.endswith(".mkv"):
        from .formats.webm import read_webm
        return None, read_webm(path)
    from .formats.ivf import read_ivf
    info, pkts = read_ivf(path)
    return info, pkts


def _split(pkts, pts_out):
    """Split superframes; append the pts of every output-producing frame
    (visible or show-existing) to pts_out, so output frame N maps to
    pts_out[N] even through the decode pipeline (the vp9_parser.c role —
    formats/parser.py)."""
    from .formats.parser import parse_frame_flags
    from .formats.superframe import split_superframe
    for pts, data in pkts:
        for spts, d in split_superframe(data, pts):
            try:
                if parse_frame_flags(d).shows:
                    pts_out.append(spts if spts is not None else 0)
            except ValueError:
                pass
            yield spts, d


_TB = {"ivf": (1, 30), "webm": (1, 1000)}  # matching the oracle muxers


def write_framemd5_header(out, w, h, bpp, ss_h, ss_v, tb=(1, 30)):
    pix = {(8, 1, 1): "yuv420p", (8, 1, 0): "yuv440p", (8, 0, 1): "yuv422p",
           (8, 0, 0): "yuv444p", (10, 1, 1): "yuv420p10le",
           (10, 0, 1): "yuv422p10le", (10, 0, 0): "yuv444p10le",
           (12, 1, 1): "yuv420p12le", (12, 0, 1): "yuv422p12le",
           (12, 0, 0): "yuv444p12le"}.get((bpp, ss_h, ss_v), "unknown")
    out.write("#format: frame checksums\n#version: 2\n#hash: MD5\n"
              "#software: ffmpeg_hybrid_tpu\n"
              f"#tb 0: {tb[0]}/{tb[1]}\n#media_type 0: video\n"
              "#codec_id 0: rawvideo\n"
              f"#dimensions 0: {w}x{h}\n#sar 0: 0/1\n"
              "#stream#, dts,        pts, duration,     "
              "size, hash\n")


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="python -m ffmpeg_hybrid_tpu",
        description="TPU-native VP9 decoder")
    ap.add_argument("input", help="input .ivf / .webm")
    ap.add_argument("-f", "--format", default="framemd5",
                    choices=["framemd5", "y4m", "rawvideo", "null",
                             "encparams"],
                    help="output format (default framemd5; encparams "
                         "dumps per-frame encode-parameters side data "
                         "in the venc_data_dump format)")
    ap.add_argument("-o", "--output", default="-",
                    help="output file (default stdout)")
    ap.add_argument("-b", "--backend", default="golden",
                    choices=["golden", "tpu"],
                    help="pass-B reconstruction backend")
    ap.add_argument("--no-native", action="store_true",
                    help="pure-Python pass A (no C fast path)")
    ap.add_argument("--no-pipeline", action="store_true",
                    help="decode serially instead of the 4-stage pipeline")
    ap.add_argument("--bsf", default=None,
                    help="bitstream filter chain, e.g. "
                         "vp9_superframe_split,vp9_raw_reorder or "
                         "vp9_metadata=color_space=bt709:color_range=pc")
    ap.add_argument("--frames", type=int, default=0,
                    help="stop after N output frames")
    ap.add_argument("-v", "--verbose", action="store_true",
                    help="per-stream stats on stderr")
    args = ap.parse_args(argv)

    from .codecs.vp9.decoder import VP9Decoder

    dec = VP9Decoder(recon_backend=args.backend,
                     use_native=not args.no_native,
                     export_enc_params=args.format == "encparams")
    _info, pkts = _open_packets(args.input)
    if args.bsf:
        from .formats.bsf import apply_bsf_chain
        pkts = apply_bsf_chain(pkts, args.bsf)

    binary = args.format in ("y4m", "rawvideo")
    if args.output == "-":
        out = sys.stdout.buffer if binary else sys.stdout
    else:
        out = open(args.output, "wb" if binary else "w")

    pts_list = []

    def frames():
        if args.no_pipeline:
            for _pts, data in _split(pkts, pts_list):
                yield from dec.decode(data)
        elif args.backend == "tpu":
            # Frames are device-resident; reading planes back per frame
            # would serialize d2h behind the pipeline's queued uploads
            # (and on the tunneled link, degrade it for the rest of the
            # process — see bench.py). Collect first, read back after
            # the pipeline drains.
            done = list(dec.decode_stream(
                p for _pts, p in _split(pkts, pts_list)))
            yield from done
        else:
            yield from dec.decode_stream(
                p for _pts, p in _split(pkts, pts_list))

    n = 0
    t0 = time.monotonic()
    hdr_done = False
    try:
        for f in frames():
            w, h = f.size
            if args.format == "framemd5":
                if not hdr_done:
                    tb = _TB["webm" if args.input.endswith(
                        (".webm", ".mkv")) else "ivf"]
                    write_framemd5_header(out, w, h, f.bpp, f.ss_h, f.ss_v,
                                          tb)
                    hdr_done = True
                raw = f.to_bytes()
                pts = pts_list[n] if n < len(pts_list) else n
                if _info is not None and _info.timebase_num:
                    # rescale container pts into the output 1/30 tb,
                    # nearest (av_rescale semantics)
                    num, den = _info.timebase_num, _info.timebase_den
                    pts = (pts * 30 * den + num // 2) // num
                out.write(f"0, {pts:10d}, {pts:10d},        1, "
                          f"{len(raw):8d}, "
                          f"{hashlib.md5(raw).hexdigest()}\n")
            elif args.format == "y4m":
                if not hdr_done:
                    if f.bpp != 8:
                        print("y4m output supports 8-bit only",
                              file=sys.stderr)
                        return 1
                    c = {(1, 1): "420jpeg", (0, 1): "422",
                         (0, 0): "444", (1, 0): "440"}[(f.ss_h, f.ss_v)]
                    out.write(f"YUV4MPEG2 W{w} H{h} F30:1 Ip A0:0 "
                              f"C{c}\n".encode())
                    hdr_done = True
                out.write(b"FRAME\n")
                out.write(f.to_bytes())
            elif args.format == "rawvideo":
                out.write(f.to_bytes())
            elif args.format == "encparams":
                from .codecs.vp9.encparams import format_enc_params
                out.write(format_enc_params(n, f.enc_params))
            n += 1
            if args.frames and n >= args.frames:
                break
    finally:
        if out not in (sys.stdout, getattr(sys.stdout, "buffer", None)):
            out.close()
    if args.verbose:
        dt = time.monotonic() - t0
        print(f"{n} frames in {dt:.2f}s ({n / dt:.1f} fps, "
              f"backend={args.backend})", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
