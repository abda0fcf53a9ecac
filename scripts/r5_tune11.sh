#!/bin/bash
# r5 session 11: cascaded frontier, final push.
set -u
cd "$(dirname "$0")/.."
out=R5_TUNE.log
run() {
  echo "== $*" | tee -a "$out" >&2
  env "$@" python bench.py 2>/dev/null | tail -1 | tee -a "$out"
}
run BENCH_CONFIG=cascaded BENCH_BATCH=2048 BENCH_INNER=6
run BENCH_CONFIG=cascaded BENCH_BATCH=2048 BENCH_INNER=7 BENCH_POLISH=3
run BENCH_CONFIG=cascaded BENCH_BATCH=2048 BENCH_INNER=6 BENCH_POLISH=3
