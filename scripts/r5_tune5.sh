#!/bin/bash
# r5 tuning session 5: recovery-threshold trial for obstacles.
set -u
cd "$(dirname "$0")/.."
out=R5_TUNE.log
run() {
  echo "== $*" | tee -a "$out" >&2
  env "$@" python bench.py 2>/dev/null | tail -1 | tee -a "$out"
}
run BENCH_CONFIG=cascaded_obstacles BENCH_BATCH=2048
run BENCH_CONFIG=cascaded_obstacles BENCH_BATCH=2048 BENCH_RECOVER=0.5
run BENCH_CONFIG=cascaded_obstacles BENCH_BATCH=2048 BENCH_INNER=8 BENCH_RECOVER=1.0
