#!/bin/bash
# Full TPU bench matrix — run ONE at a time (tunnel serializes).
# Writes one JSON line per config to BENCH_MATRIX.jsonl.
set -u
cd "$(dirname "$0")/.."
out=BENCH_MATRIX.jsonl
: > "$out"
run() {
  echo "== $* " >&2
  env "$@" python bench.py 2>/dev/null | tail -1 | tee -a "$out"
}
# headline + solve-kernel ablation
run BENCH_CONFIG=singletrack BENCH_SOLVE_KERNEL=1
run BENCH_CONFIG=singletrack BENCH_SOLVE_KERNEL=0
# flagship cascaded + variants (whole-solve kernel)
run BENCH_CONFIG=cascaded BENCH_SOLVE_KERNEL=1 BENCH_BATCH=2048
run BENCH_CONFIG=cascaded_obstacles BENCH_SOLVE_KERNEL=1 BENCH_BATCH=2048
run BENCH_CONFIG=cascaded_kinematic BENCH_SOLVE_KERNEL=1 BENCH_BATCH=2048
run BENCH_CONFIG=kinematic BENCH_SOLVE_KERNEL=1
# latency mode: whole-solve kernel at B=1 (padded tile, early-exit), then
# the XLA path with sequential / associative-scan Riccati
run BENCH_MODE=latency
run BENCH_MODE=latency BENCH_KERNEL=0
run BENCH_MODE=latency BENCH_KERNEL=0 BENCH_PAR_RICCATI=1
# bf16 finding — a shape-matched pair (XLA path, same B, same budget) so the
# dtype comparison is apples-to-apples; the Pallas kernels are f32-only, so
# the f32 comparator here is the XLA path too, NOT the kernel headline above.
run BENCH_DTYPE=f32 BENCH_KERNEL=0 BENCH_BATCH=4096
run BENCH_DTYPE=bf16 BENCH_KERNEL=0 BENCH_BATCH=4096
cat "$out"
