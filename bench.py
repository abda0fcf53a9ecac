"""Throughput bench: batched MPC solves/s on one chip.

Measures steady-state closed-loop control steps (warm-started AL-iLQR solve
+ plant step) for the dynamic single-track model at horizon N=30 — the
BASELINE.json headline metric — batched over scenarios with ``vmap``.

Baseline: the reference's singletrack IPOPT+MA27 solve, p50 55.7 ms/step on
its author's CPU => ~17.9 solves/s for the whole machine, single scenario
(BASELINE.md; experiments/data/race1_ippodromo/singletrack_elapsed.npy).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Env knobs: BENCH_BATCH (scenarios), BENCH_STEPS (timed steps),
BENCH_HORIZON (default 30), BENCH_DTYPE (f32|bf16|f64).
"""

import json
import os
import time

import jax

# the axon TPU plugin self-registers ahead of JAX_PLATFORMS; honor the env var
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# persistent compilation cache: TPU compiles of the nested solver scans are
# expensive through the tunnel; cache them across runs
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np

BASELINE_SOLVES_PER_S = 1000.0 / 55.7  # reference singletrack p50


def main():
    platform = jax.devices()[0].platform
    mode = os.environ.get("BENCH_MODE", "throughput")  # or "latency"
    if mode == "latency":
        B = 1
        K = int(os.environ.get("BENCH_STEPS", 50))
    else:
        B = int(os.environ.get("BENCH_BATCH", 4096 if platform == "tpu" else 32))
        K = int(os.environ.get("BENCH_STEPS", 5))
    N = int(os.environ.get("BENCH_HORIZON", 30))
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16, "f64": jnp.float64}[
        os.environ.get("BENCH_DTYPE", "f32")
    ]

    from vehicle_control_tpu.controllers.mpc import problems
    from vehicle_control_tpu.models import dynamic_car as dc
    from vehicle_control_tpu.parallel import make_batched_racing_step, tile_carry
    from vehicle_control_tpu.environment.track import Track
    from vehicle_control_tpu.solvers import ALILQRConfig
    from vehicle_control_tpu.utils.config import load_config, project_root

    root = project_root()
    track = Track(load_config(os.path.join(root, "configs/environment/ippodromo.yaml")))
    carcfg = load_config(os.path.join(root, "configs/models/dynamic_car.yaml"))
    ctrl = load_config(os.path.join(root, "configs/controllers/singletrack.yaml"))
    ctrl["obstacles"] = False
    ctrl["horizon"] = N
    problem = problems.build_cascaded_problem(carcfg, track, ctrl, "none", dtype)
    p = dc.DynamicCarParams.from_config(carcfg)
    temporal, _ = dc.make_transitions(p)

    # Pallas field-major kernels are the default hot path on TPU for the
    # batched throughput bench (measured +20% vs the XLA-only path, bitwise-
    # equal derivatives, 100% convergence); the single-scenario latency mode
    # keeps the XLA path (a B=1 solve would pad to the 1024-lane tile).
    use_kernels = bool(
        int(os.environ.get("BENCH_KERNEL", "1" if platform == "tpu" else "0"))
    ) and mode != "latency"
    solver_cfg = ALILQRConfig(
        n_outer=2,
        n_inner=6,
        use_ls_kernel=use_kernels,
        use_backward_kernel=use_kernels,  # fused derivs+Riccati kernel
    )
    step = jax.jit(
        make_batched_racing_step(problem, solver_cfg, temporal, track.data, 0.05, 4)
    )

    rng = np.random.default_rng(0)
    states = np.zeros((B, 8), np.float64)
    states[:, 0] = 6.0 + rng.uniform(0, 8, B)  # Ux spread
    states[:, 4] = rng.uniform(0, float(track.length), B)  # track position spread
    states[:, 5] = rng.uniform(-1.0, 1.0, B)  # ey spread
    states = jnp.asarray(states, dtype)
    carries = tile_carry(problem, B, dtype)

    # warmup: compile + 2 steps to reach warm-started steady state
    carries, states, actions, infos = step(carries, states)
    carries, states, actions, infos = step(carries, states)
    jax.block_until_ready(states)

    times = []
    for _ in range(K):
        t0 = time.perf_counter()
        carries, states, actions, infos = step(carries, states)
        jax.block_until_ready(states)
        times.append(time.perf_counter() - t0)

    step_ms = float(np.median(times) * 1e3)
    solves_per_s = B / np.median(times)
    conv = float(jnp.mean(infos.converged.astype(jnp.float32)))

    if mode == "latency":
        # reference singletrack p50 is 55.7 ms; real-time budget 50 ms
        out = {
            "metric": f"MPC p50 solve latency, dynamic bicycle N={N}, single scenario",
            "value": round(step_ms, 2),
            "unit": "ms",
            "vs_baseline": round(55.7 / step_ms, 2),
            "p95_ms": round(float(np.percentile(np.asarray(times) * 1e3, 95)), 2),
            "meets_50ms_budget": bool(step_ms < 50.0),
            "converged_frac": round(conv, 4),
            "platform": platform,
            "dtype": os.environ.get("BENCH_DTYPE", "f32"),
        }
    else:
        out = {
            "metric": f"MPC solves/s/chip, dynamic bicycle N={N}",
            "value": round(float(solves_per_s), 1),
            "unit": "solves/s",
            "vs_baseline": round(float(solves_per_s / BASELINE_SOLVES_PER_S), 2),
            "batch": B,
            "step_ms": round(step_ms, 2),
            "converged_frac": round(conv, 4),
            "platform": platform,
            "dtype": os.environ.get("BENCH_DTYPE", "f32"),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
