#!/bin/sh
# Build and run the ASan + edge-coverage fuzz harness over the native
# decode surface (CI-equivalent of the reference's libFuzzer targets,
# reference tests/Makefile.am:86-107).
#
# usage: tests/run_fuzz.sh [seconds] [max_len]
set -e
HERE=$(dirname "$0")
NATIVE="$HERE/../htscodecs_tpu/native"
SECONDS_ARG=${1:-60}
MAXLEN=${2:-16384}
BUILD=$(mktemp -d)
trap 'rm -rf "$BUILD"' EXIT

# the coverage callback must NOT be instrumented (see fuzz_cov.c)
gcc -O1 -g -fsanitize=address -c "$NATIVE/fuzz_cov.c" -o "$BUILD/fuzz_cov.o"
gcc -O1 -g -fsanitize=address -fsanitize-coverage=trace-pc \
    -o "$BUILD/fuzz_native" "$NATIVE/fuzz_native.c" "$BUILD/fuzz_cov.o" -lm

SEEDS="$BUILD/seeds"
mkdir -p "$SEEDS"
for d in /root/reference/tests/dat/r4x16 /root/reference/tests/dat/arith \
         /root/reference/tests/dat/fqzcomp; do
    [ -d "$d" ] && cp "$d"/* "$SEEDS"/ 2>/dev/null || true
done

"$BUILD/fuzz_native" "$SEEDS" "$SECONDS_ARG" "$MAXLEN"
