#!/bin/sh
# Build the native pass-A entropy decoder shared library.
# -march=native buys ~7% on the pass-A hot loop (measured 4.31 ->
# 4.02 ms/frame @1080p); fall back to plain -O3 for toolchains or
# build hosts where it is unavailable.
#
# Writes libvp9passa.so.srchash (sha256 over the C sources) so
# passa_native.lib() can detect and rebuild a stale .so instead of
# loading one whose struct layout may not match the ctypes mirror.
set -e
cd "$(dirname "$0")"
if ! gcc -O3 -march=native -funroll-loops -fPIC -shared \
        -Wall -Wno-unused-function -Wno-unused-const-variable \
        vp9_entropy.c vp9_lpf.c -o libvp9passa.so 2>/dev/null; then
    gcc -O3 -fPIC -shared -Wall -Wno-unused-function \
        vp9_entropy.c vp9_lpf.c -o libvp9passa.so
fi
python3 - <<'EOF'
import hashlib, os
h = hashlib.sha256()
for name in sorted(os.listdir(".")):
    if name.endswith((".c", ".h")):
        with open(name, "rb") as f:
            h.update(name.encode() + b"\0" + f.read() + b"\0")
open("libvp9passa.so.srchash", "w").write(h.hexdigest() + "\n")
EOF
echo built native/libvp9passa.so
