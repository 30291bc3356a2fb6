#!/bin/sh
# Build the reference FFmpeg ("oracle") into .oracle/build, VP9-decode-only.
# The fork links a WebGPU object unconditionally; an empty stub object
# satisfies the link since all call sites are behind #if CONFIG_WEBGPU.
# The stub must be re-created before AND after make (make regenerates it).
set -e
cd "$(dirname "$0")/.."
ROOT=$(pwd)
SRC=/root/reference
BUILD="$ROOT/.oracle/build"
mkdir -p "$BUILD"
cd "$BUILD"
"$SRC/configure" \
    --disable-x86asm --disable-everything \
    --enable-decoder=vp9,rawvideo \
    --enable-encoder=rawvideo,wrapped_avframe \
    --enable-parser=vp9 \
    --enable-demuxer=matroska,ivf,rawvideo \
    --enable-muxer=framemd5,framecrc,rawvideo,ivf,md5,null \
    --enable-protocol=file,pipe \
    --enable-bsf=vp9_superframe_split,vp9_superframe,vp9_raw_reorder,vp9_metadata \
    --enable-filter=scale,format,null \
    --disable-autodetect
mkdir -p libavcodec
gcc -x c -c /dev/null -o libavcodec/vp9_webgpu.o
make -j"$(nproc)" || true
gcc -x c -c /dev/null -o libavcodec/vp9_webgpu.o
make -j"$(nproc)"
echo "oracle built: $BUILD/ffmpeg"
