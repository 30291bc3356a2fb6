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
echo "ALL GREEN"
