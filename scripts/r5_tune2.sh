#!/bin/bash
# r5 tuning session 2: obstacles >=99.5% push + budget trims with mu0=300.
# Run AFTER r5_tune.sh (ONE TPU process at a time).  Appends to R5_TUNE.log.
set -u
cd "$(dirname "$0")/.."
out=R5_TUNE.log
run() {
  echo "== $*" | tee -a "$out" >&2
  env "$@" python bench.py 2>/dev/null | tail -1 | tee -a "$out"
}
# obstacles: stack the levers that each helped (mu0 1000 + polish 6; 4 outer)
run BENCH_CONFIG=cascaded_obstacles BENCH_BATCH=2048 BENCH_MU0=1000 BENCH_POLISH=6
run BENCH_CONFIG=cascaded_obstacles BENCH_BATCH=2048 BENCH_OUTER=4 BENCH_POLISH=4
run BENCH_CONFIG=cascaded_obstacles BENCH_BATCH=2048 BENCH_MU_SCALE=100
# singletrack: combine the 2x5+3 mu300 winner with a shorter ladder
run BENCH_CONFIG=singletrack BENCH_MU0=300 BENCH_INNER=5 BENCH_POLISH=3 BENCH_ALPHA=5
run BENCH_CONFIG=singletrack BENCH_MU0=300 BENCH_INNER=4 BENCH_POLISH=4
# cascaded_kinematic: 99.95% at 4x10+6 mu300 has slack — trim budget
run BENCH_CONFIG=cascaded_kinematic BENCH_BATCH=2048 BENCH_OUTER=3 BENCH_INNER=8
run BENCH_CONFIG=cascaded_kinematic BENCH_BATCH=2048 BENCH_INNER=8 BENCH_POLISH=4
# kinematic: 100% at 2x4 — trim
run BENCH_CONFIG=kinematic BENCH_INNER=3
cat "$out"
