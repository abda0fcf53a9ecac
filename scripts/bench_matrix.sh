#!/bin/bash
# Full TPU bench matrix — run ONE at a time (tunnel serializes).
# Writes one JSON line per config to BENCH_MATRIX.jsonl.  Every line carries
# a "config" block emitted by bench.py plus the BENCH_NOTE below, so the
# artifact is interpretable standalone (VERDICT r3 Weak #4/#5).
set -u
cd "$(dirname "$0")/.."
out=BENCH_MATRIX.jsonl
: > "$out"
run() {
  echo "== $* " >&2
  env "$@" python bench.py 2>/dev/null | tail -1 | tee -a "$out"
}
# headline + solve-kernel ablation
run BENCH_NOTE="headline singletrack (whole-solve kernel; = BENCH_rNN/README number modulo run-to-run noise)" \
    BENCH_CONFIG=singletrack BENCH_SOLVE_KERNEL=1
run BENCH_NOTE="ablation: per-phase kernels instead of the whole-solve kernel" \
    BENCH_CONFIG=singletrack BENCH_SOLVE_KERNEL=0
# flagship cascaded + variants (whole-solve kernel)
run BENCH_NOTE="flagship cascaded N=20+M=40" \
    BENCH_CONFIG=cascaded BENCH_SOLVE_KERNEL=1 BENCH_BATCH=2048
run BENCH_NOTE="cascaded + obstacle barriers" \
    BENCH_CONFIG=cascaded_obstacles BENCH_SOLVE_KERNEL=1 BENCH_BATCH=2048
run BENCH_NOTE="cascaded with kinematic tail N=20+K=20" \
    BENCH_CONFIG=cascaded_kinematic BENCH_SOLVE_KERNEL=1 BENCH_BATCH=2048
run BENCH_NOTE="pure kinematic bicycle N=50, obstacles on" \
    BENCH_CONFIG=kinematic BENCH_SOLVE_KERNEL=1
# latency mode: whole-solve kernel at B=1 (padded tile, early-exit), then
# the XLA path with sequential / associative-scan Riccati
run BENCH_NOTE="latency: whole-solve kernel, B=1 padded tile" BENCH_MODE=latency
run BENCH_NOTE="latency ablation: XLA path, sequential Riccati" \
    BENCH_MODE=latency BENCH_KERNEL=0
run BENCH_NOTE="latency ablation: XLA path, associative-scan Riccati" \
    BENCH_MODE=latency BENCH_KERNEL=0 BENCH_PAR_RICCATI=1
# bf16 finding — a shape-matched pair (XLA path, same B, same budget) so the
# dtype comparison is apples-to-apples; the Pallas kernels are f32-only, so
# the f32 comparator here is the XLA path too, NOT the kernel headline above.
run BENCH_NOTE="bf16 experiment comparator: XLA path f32 (NOT the kernel headline)" \
    BENCH_DTYPE=f32 BENCH_KERNEL=0 BENCH_BATCH=4096
run BENCH_NOTE="bf16 experiment: XLA path bf16 vs the f32 line above" \
    BENCH_DTYPE=bf16 BENCH_KERNEL=0 BENCH_BATCH=4096
cat "$out"
