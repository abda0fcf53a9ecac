#!/bin/bash
# r5 convergence/throughput tuning session (VERDICT r4 #1/#2/#7).
# Run AFTER scripts/verify_kernels_tpu.py — ONE TPU process at a time.
# Appends one labeled JSON line per experiment to R5_TUNE.log.
set -u
cd "$(dirname "$0")/.."
out=R5_TUNE.log
: > "$out"
run() {
  echo "== $*" | tee -a "$out" >&2
  env "$@" python bench.py 2>/dev/null | tail -1 | tee -a "$out"
}
# 1. flagship cascaded mu0 A/B at the shipped 3x8 budget
run BENCH_CONFIG=cascaded BENCH_BATCH=2048 BENCH_MU0=10
run BENCH_CONFIG=cascaded BENCH_BATCH=2048 BENCH_MU0=300
# 2. obstacles: push conv >= 99.5% (current schedule 3x8+4, mu_scale 30, mu0 300)
run BENCH_CONFIG=cascaded_obstacles BENCH_BATCH=2048
run BENCH_CONFIG=cascaded_obstacles BENCH_BATCH=2048 BENCH_MU0=1000
run BENCH_CONFIG=cascaded_obstacles BENCH_BATCH=2048 BENCH_POLISH=6
# 3. singletrack: spend the SOL.json headroom (target >=200k @ >=99.5%)
run BENCH_CONFIG=singletrack BENCH_MU0=300
run BENCH_CONFIG=singletrack BENCH_MU0=300 BENCH_INNER=5
run BENCH_CONFIG=singletrack BENCH_MU0=300 BENCH_INNER=5 BENCH_POLISH=3
run BENCH_CONFIG=singletrack BENCH_ALPHA=5
run BENCH_CONFIG=singletrack BENCH_LS_FAST=1
cat "$out"
