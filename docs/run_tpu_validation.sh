#!/bin/sh
# Round-3 real-chip validation (fire when the axon tunnel is up):
#   1. device sanity check
#   2. bench.py with variant autotune + profiling rooflines
#   3. conformance legs on the TPU backend (oracle matrix + v2 engine
#      tests via HTSCODECS_TEST_PLATFORM, VERDICT r2 item 6)
# Results land in /tmp/tpu_validation_r3/ for transcription into
# docs/PERF_NOTES.md and STATUS.md.
set -x
OUT=/tmp/tpu_validation_r3
mkdir -p "$OUT"

timeout 120 python -c "import jax; print(jax.devices())" \
    > "$OUT/devices.txt" 2>&1 || { echo "tunnel down"; exit 1; }

HTSCODECS_TPU_BENCH_PROFILE="$OUT/trace" \
    timeout 3600 python bench.py > "$OUT/bench.json" 2> "$OUT/bench_table.jsonl"

HTSCODECS_TEST_PLATFORM=axon timeout 3600 python -m pytest \
    tests/test_oracle_matrix.py tests/test_rans_v2.py -q \
    > "$OUT/tpu_suite.txt" 2>&1

tail -5 "$OUT/bench_table.jsonl"
tail -3 "$OUT/tpu_suite.txt"
