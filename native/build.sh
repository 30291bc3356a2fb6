#!/bin/sh
# Build the native pass-A entropy decoder shared library.
set -e
cd "$(dirname "$0")"
gcc -O3 -fPIC -shared -Wall -Wno-unused-function vp9_entropy.c vp9_lpf.c -o libvp9passa.so
echo built native/libvp9passa.so
