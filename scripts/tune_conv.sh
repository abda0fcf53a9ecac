#!/bin/bash
# Steady-state convergence probes for the families below 97% conv in the
# chunked bench (BENCH_MATRIX.jsonl): polish iterations against the final
# multipliers are the cheapest lever (singletrack: +polish=4 took 96.3% ->
# 99.8% for -23% throughput).  Run ONE at a time (tunnel serializes).
# Appends to BENCH_TUNE.jsonl.
set -u
cd "$(dirname "$0")/.."
out=BENCH_TUNE.jsonl
run() {
  echo "== $* " >&2
  env "$@" python bench.py 2>/dev/null | tail -1 | tee -a "$out"
}
# cascaded_obstacles: 88.1k @ 93.7% with polish=2 (config default)
run BENCH_CONFIG=cascaded_obstacles BENCH_BATCH=2048 BENCH_POLISH=4
run BENCH_CONFIG=cascaded_obstacles BENCH_BATCH=2048 BENCH_POLISH=6
# cascaded_kinematic: 106.9k @ 96.3% with no polish
run BENCH_CONFIG=cascaded_kinematic BENCH_BATCH=2048 BENCH_POLISH=2
run BENCH_CONFIG=cascaded_kinematic BENCH_BATCH=2048 BENCH_POLISH=4
# kinematic: 489.6k @ 96.9% at 2x4, no polish
run BENCH_CONFIG=kinematic BENCH_POLISH=2
run BENCH_CONFIG=kinematic BENCH_INNER=5
