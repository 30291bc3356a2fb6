#!/bin/sh
# Full-suite gate, one pytest process per test file.
#
# The single-process run compiles ~500 jax executables; even with
# per-module cache clearing (tests/conftest.py) a very long process
# accumulates jax/XLA state. This runner is the guaranteed-to-complete
# gate: each file runs in a fresh interpreter, all share the persistent
# compilation cache, and the script fails on the first red file.
#
#     sh tools/run_tests.sh [extra pytest args]
set -e
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
    echo "=== $f"
    if ! python -m pytest "$f" -q "$@"; then
        fail=1
    fi
done
if [ "$fail" -ne 0 ]; then
    echo "FAILED: at least one test file red"
    exit 1
fi

# optional heavyweight leg: the bench clips through the CPU-jax TPU
# backend (closes the loop the default suite leaves to bench.py's
# on-chip gate); enable with FULL_TPU_E2E=1
if [ -n "$FULL_TPU_E2E" ] && [ "$FULL_TPU_E2E" != "0" ]; then
    echo "=== FULL_TPU_E2E leg (bench clips on CPU-jax)"
    if ! FULL_TPU_E2E=1 python -m pytest tests/test_tpu_backend.py \
            -q -k "bench"; then
        echo "FAILED: FULL_TPU_E2E leg red"
        exit 1
    fi
fi
echo "ALL GREEN"
