#!/bin/bash
# r5 session 12: cascaded frontier, edge probes.
set -u
cd "$(dirname "$0")/.."
out=R5_TUNE.log
run() {
  echo "== $*" | tee -a "$out" >&2
  env "$@" python bench.py 2>/dev/null | tail -1 | tee -a "$out"
}
run BENCH_CONFIG=cascaded BENCH_BATCH=2048 BENCH_INNER=5 BENCH_POLISH=4
run BENCH_CONFIG=cascaded BENCH_BATCH=2048 BENCH_INNER=5 BENCH_POLISH=3
