#!/bin/bash
# r5 tuning session 4: obstacles final stack toward >=99.5%.
set -u
cd "$(dirname "$0")/.."
out=R5_TUNE.log
run() {
  echo "== $*" | tee -a "$out" >&2
  env "$@" python bench.py 2>/dev/null | tail -1 | tee -a "$out"
}
run BENCH_CONFIG=cascaded_obstacles BENCH_BATCH=2048 BENCH_MU_SCALE=100 BENCH_INNER=10 BENCH_POLISH=6
run BENCH_CONFIG=cascaded_obstacles BENCH_BATCH=2048 BENCH_MU_SCALE=100 BENCH_OUTER=4 BENCH_POLISH=6
run BENCH_CONFIG=cascaded_obstacles BENCH_BATCH=2048 BENCH_MU_SCALE=100 BENCH_POLISH=8
