#!/bin/bash
# r5 session 7: dispatch/tile amortization knobs at the final budget.
set -u
cd "$(dirname "$0")/.."
out=R5_TUNE.log
run() {
  echo "== $*" | tee -a "$out" >&2
  env "$@" python bench.py 2>/dev/null | tail -1 | tee -a "$out"
}
run BENCH_BATCH=8192
run FM_SUB=32
run BENCH_UNROLL=8
run BENCH_BATCH=8192 FM_SUB=32
