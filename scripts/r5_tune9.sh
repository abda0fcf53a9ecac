#!/bin/bash
# r5 session 9: n_alpha=6 ladder + best budget for every cascaded family.
set -u
cd "$(dirname "$0")/.."
out=R5_TUNE.log
run() {
  echo "== $*" | tee -a "$out" >&2
  env "$@" python bench.py 2>/dev/null | tail -1 | tee -a "$out"
}
run BENCH_CONFIG=cascaded BENCH_BATCH=2048 BENCH_OUTER=2 BENCH_POLISH=4 BENCH_ALPHA=6
run BENCH_CONFIG=cascaded_kinematic BENCH_BATCH=2048 BENCH_ALPHA=6
run BENCH_CONFIG=cascaded_obstacles BENCH_BATCH=2048 BENCH_ALPHA=6
run BENCH_CONFIG=kinematic BENCH_ALPHA=6
