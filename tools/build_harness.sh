#!/bin/sh
# Build the reference-differential test harness (tools/ref_harness.c) as a
# shared lib. Requires the oracle ffmpeg build in .oracle/build (see
# tools/build_oracle.sh). Output: .oracle/libref_harness.so (test-only).
set -e
cd "$(dirname "$0")/.."
BUILD=.oracle/build
SRC=/root/reference
gcc -O2 -fPIC -shared -I"$BUILD" -I"$SRC" tools/ref_harness.c \
    -Wl,--whole-archive /dev/null -Wl,--no-whole-archive \
    "$BUILD/libavcodec/libavcodec.a" "$BUILD/libavutil/libavutil.a" \
    -lm -lpthread -o .oracle/libref_harness.so
echo built .oracle/libref_harness.so
