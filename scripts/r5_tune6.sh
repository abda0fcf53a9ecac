#!/bin/bash
# r5 session 6: driver-default confirmation + latency fast-path + chunk-length probes.
set -u
cd "$(dirname "$0")/.."
out=R5_TUNE.log
run() {
  echo "== $*" | tee -a "$out" >&2
  env "$@" python bench.py 2>/dev/null | tail -1 | tee -a "$out"
}
# exactly what the driver runs at round end
run BENCH_NOTE=driver-default-confirmation
# longer scan chunks (more steps per dispatch)
run BENCH_STEPS=20
run BENCH_STEPS=40
# latency: alpha=1 fast path + shorter ladder at B=1
run BENCH_MODE=latency
run BENCH_MODE=latency BENCH_LS_FAST=1
run BENCH_MODE=latency BENCH_ALPHA=4
