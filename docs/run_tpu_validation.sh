#!/bin/sh
# Round-5 real-chip validation (fire when the axon tunnel is up):
#   1. device sanity check
#   2. bench.py with variant autotune + profiling rooflines
#   3. conformance legs on the TPU backend (HTSCODECS_TEST_PLATFORM):
#      oracle matrix + v2 engine tests (VERDICT r2 item 6) PLUS the
#      Pallas VMEM suites — both chip-only Mosaic traps found so far
#      lived in the VMEM kernels (VERDICT r3 item 7)
# Results land in /tmp/tpu_validation_r5/ for transcription into
# docs/PERF_NOTES.md and STATUS.md.
set -x
OUT=/tmp/tpu_validation_r5
mkdir -p "$OUT"

timeout 120 python -c "import jax; print(jax.devices())" \
    > "$OUT/devices.txt" 2>&1 || { echo "tunnel down"; exit 1; }

HTSCODECS_TPU_BENCH_PROFILE="$OUT/trace" \
    timeout 3600 python bench.py > "$OUT/bench.json" 2> "$OUT/bench_table.jsonl"

HTSCODECS_TEST_PLATFORM=axon timeout 5400 python -m pytest \
    tests/test_oracle_matrix.py tests/test_rans_v2.py \
    tests/test_rans_vmem.py tests/test_rans8_v2.py \
    tests/test_arith_vmem.py tests/test_rc_vmem.py \
    tests/test_streaming.py -q \
    > "$OUT/tpu_suite.txt" 2>&1

tail -5 "$OUT/bench_table.jsonl"
tail -3 "$OUT/tpu_suite.txt"
