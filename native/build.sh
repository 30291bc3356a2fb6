#!/bin/sh
# Build the native pass-A entropy decoder shared library.
# -march=native buys ~7% on the pass-A hot loop (measured 4.31 ->
# 4.02 ms/frame @1080p); fall back to plain -O3 for toolchains or
# build hosts where it is unavailable.
set -e
cd "$(dirname "$0")"
if ! gcc -O3 -march=native -funroll-loops -fPIC -shared \
        -Wall -Wno-unused-function -Wno-unused-const-variable \
        vp9_entropy.c vp9_lpf.c -o libvp9passa.so 2>/dev/null; then
    gcc -O3 -fPIC -shared -Wall -Wno-unused-function \
        vp9_entropy.c vp9_lpf.c -o libvp9passa.so
fi
echo built native/libvp9passa.so
