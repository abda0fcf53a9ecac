#!/bin/bash
# Round-2 tuning probes (run AFTER bench_matrix.sh; one TPU process at a time).
# Appends to BENCH_TUNE.jsonl.
set -u
cd "$(dirname "$0")/.."
out=BENCH_TUNE.jsonl
run() {
  echo "== $* " >&2
  env "$@" python bench.py 2>/dev/null | tail -1 | tee -a "$out"
}
# alpha-ladder width: line-search sweep is ~40% of the iteration; warm
# steady-state solves mostly pick alpha~1, so a shorter ladder may be free
run BENCH_CONFIG=singletrack BENCH_ALPHA=4
run BENCH_CONFIG=singletrack BENCH_ALPHA=6
# inner-budget recheck at the steering-stop baseline
run BENCH_CONFIG=singletrack BENCH_INNER=5
# kinematic: is 2x4 enough post-stop?
run BENCH_CONFIG=kinematic BENCH_INNER=4
# cascaded: can 3x6 hold?
run BENCH_CONFIG=cascaded BENCH_BATCH=2048 BENCH_INNER=6
