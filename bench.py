"""Throughput/latency bench: batched MPC solves/s on one chip.

Measures steady-state closed-loop control steps (warm-started AL-iLQR solve
+ plant step) batched over scenarios with ``vmap``, for any of the shipped
controller families (BENCH_CONFIG):

* ``singletrack``          dynamic bicycle, N=BENCH_HORIZON (default 30) — the
                           BASELINE.json headline metric
* ``cascaded``             flagship cascaded single-track + point-mass tail
                           (N=20, M=40 — the shipped cascaded.yaml)
* ``cascaded_obstacles``   same with obstacle barriers on
* ``cascaded_kinematic``   single-track + kinematic tail (N=20, K=20)
* ``kinematic``            pure kinematic bicycle (N=50, obstacles on)

Baselines: the reference's per-step IPOPT+MA27 wall-clock arrays
(BASELINE.md): singletrack p50 55.7 ms, cascaded race3 39.3 ms (N=20+M=35),
cascaded obstacles 41.0 ms — single scenario on the whole machine.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Env knobs: BENCH_CONFIG, BENCH_BATCH (scenarios), BENCH_STEPS (timed steps),
BENCH_HORIZON (singletrack only), BENCH_DTYPE (f32|bf16|f64),
BENCH_MODE (throughput|latency), BENCH_KERNEL (0/1 Pallas kernels);
budget overrides BENCH_OUTER/INNER/ALPHA/POLISH/MU0/MU_SCALE/RECOVER
(defaults = the per-family tuned schedules below, R5_TUNE.log).
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

# reference single-scenario p50 step latency per family (BASELINE.md)
BASELINE_MS = {
    "singletrack": 55.7,
    "cascaded": 39.3,  # race3: N=20+M=35, closest to the shipped M=40 config
    "cascaded_obstacles": 41.0,
    "cascaded_kinematic": 39.3,  # the reference ships no run for this
    # controller; the plain-cascaded baseline is the nearest comparator
    "kinematic": 55.7,  # no kinematic elapsed arrays shipped; singletrack
    # p50 is the only same-machine comparator
}


def build(config_name, N, dtype):
    from vehicle_control_tpu.controllers.mpc import problems
    from vehicle_control_tpu.controllers.mpc.controllers import _solver_config
    from vehicle_control_tpu.environment.track import Track
    from vehicle_control_tpu.models import dynamic_car as dc
    from vehicle_control_tpu.models import kinematic_car as kc
    from vehicle_control_tpu.utils.config import load_config, project_root

    root = project_root()
    track = Track(load_config(os.path.join(root, "configs/environment/ippodromo.yaml")))

    if config_name == "kinematic":
        carcfg = load_config(os.path.join(root, "configs/models/kinematic_car.yaml"))
        ctrl = load_config(os.path.join(root, "configs/controllers/kinematic.yaml"))
        problem = problems.build_kinematic_problem(carcfg, track, ctrl, dtype)
        p = kc.KinematicCarParams.from_config(carcfg)
        temporal, _ = kc.make_transitions(p)
        s_index, ns = 2, 6
        # the steering stop (problems._sat_col) makes the delta bound hold by
        # construction; cold mid-curve drops then converge far below the old
        # 3x8 budget (46% conv before the stop; 2x4 measured 100% on TPU,
        # r5 trims: 2x3 100% at 656k, + the 6-rung ladder 100% at 732.5k)
        solver = dict(n_outer=2, n_inner=3, n_alpha=6)
    else:
        carcfg = load_config(os.path.join(root, "configs/models/dynamic_car.yaml"))
        if config_name == "singletrack":
            ctrl = load_config(os.path.join(root, "configs/controllers/singletrack.yaml"))
            ctrl["obstacles"] = False
            ctrl["horizon"] = N
            tail = "none"
            # n_alpha=6: the 8-rung line-search ladder buys nothing at warm
            # steady state (61.0k@99.2% vs 57.5k@99.3% measured); 4 rungs is
            # too coarse (97.2%), 5 costs ~0.6pp conv at this budget.
            # r5 budget (R5_TUNE.log): mu0=300 penalty warm-starting lifts
            # 2x6+4 from 99.73% to 99.85%, and the conv slack buys a budget
            # cut — 2x5+4 191.9k@99.71%, 2x5+3 202.1k@99.66% (headline);
            # further cuts break the >=99.5% bar (2x5+3 a5 99.00%, 2x4+4
            # 215.4k@99.12%).
            solver = dict(n_outer=2, n_inner=5, n_alpha=6, n_polish=3, mu0=300.0)
        elif config_name in ("cascaded", "cascaded_obstacles"):
            ctrl = load_config(os.path.join(root, "configs/controllers/cascaded.yaml"))
            ctrl["obstacles"] = config_name == "cascaded_obstacles"
            tail = "pm"
            # mu0=300 penalty warm-start (r4 finding, applied to the flagship
            # in r5 — VERDICT r4 #1): warm-started lanes carry near-optimal
            # multipliers, so the large initial penalty is stable and shrinks
            # the steady-state AL residual flicker that TPU-f32 numerics push
            # past tol_con.  Measured A/B at 3x8 a8, B=2048 (R5_TUNE.log):
            # mu0=10 113.7k @ 99.07% -> mu0=300 106.0k @ 99.90% — then the
            # conv slack converts to budget + the 6-rung ladder (neutral on
            # conv for this family, unlike obstacles).  Frontier: 2x8+4p a6
            # 147.5k@99.76, 2x7+4 163.3k@99.80, 2x6+4 175.5k@99.61,
            # 2x6+3 186.5k@99.56 (default), 2x5+3 208.3k@98.88 (too far).
            solver = dict(
                n_outer=2, n_inner=6, n_polish=3, n_alpha=6, mu0=300.0
            )
            if config_name == "cascaded_obstacles":
                # obstacle barriers leave small AL residuals at mu_scale=10
                # (conv 86% on cold drops); faster penalty growth converges
                # the multipliers within the same iteration budget, and the
                # r5 dose-response (R5_TUNE.log) moved the optimum from
                # ms=30 to ms=100: 3x8+4 ms30 98.58% -> ms100 99.07%,
                # +6p 99.37%, 3x10+6 99.46% (ms=300 overshoots: 98.34%;
                # mu0=1000 also hurts: 98.63%).  The residual ~0.5pp tail
                # is the TPU-f32 XLU flicker band (CPU-f32 ceiling at this
                # protocol: 99.51%) — see PLAN.md round-5 log.
                solver["mu_scale"] = 100.0
                solver["mu0"] = 300.0
                solver["n_outer"] = 3  # the 2-outer flagship trim loses conv here
                solver["n_inner"] = 10
                solver["n_polish"] = 6
                solver["n_alpha"] = 8  # a6 ladder costs conv on obstacles
                # (99.51 -> 99.27); this family keeps the full 8 rungs
                # diagnose_conv census (r5, TPU): the non-conv tail is NOT
                # 1e-4 flicker — bad lanes carry violations 0.8-50 from
                # awkward warm-start carries, most BELOW the default 5.0
                # recovery threshold, and a drop-in cold start re-solve
                # converges 22/23 of them with violation 0.  A tighter
                # reset threshold converts stuck episodes into 1-step
                # transients: recover 5.0 -> 99.46%, 1.0 -> 99.46%,
                # 0.5 -> 99.51% at this budget (R5_TUNE.log).
                solver["recover_viol"] = 0.5
        elif config_name == "cascaded_kinematic":
            ctrl = load_config(
                os.path.join(root, "configs/controllers/cascaded_kinematic.yaml")
            )
            ctrl["obstacles"] = False
            tail = "kc"
            # 3x8 left ~4-5% of the steady-state fleet flickering on the
            # curve-entry friction circle (5-30 N marginal AL residuals,
            # scripts/diagnose_conv.py).  r4: penalty warm-starting closes
            # the TPU-f32 flicker band — mu0 dose-response on TPU at 4x10+6:
            # 10 -> 98.19%, 100 -> 98.88%, 300 -> 99.22%.  r5 trim
            # (R5_TUNE.log): with mu0=300 the smaller 3x8+6 budget measures
            # 102.1k @ 100.00% (4x10+6 was 70.1k @ 99.95%; 4x8+4 83.3k @
            # 99.90%) — polish + big-mu0 does the work, not outer count;
            # the 6-rung ladder is free here too: a6 115.2k @ 100.00%.
            solver = dict(
                n_outer=3, n_inner=8, n_polish=6, n_alpha=6, mu0=300.0
            )
        else:
            raise SystemExit(f"unknown BENCH_CONFIG {config_name}")
        problem = problems.build_cascaded_problem(carcfg, track, ctrl, tail, dtype)
        p = dc.DynamicCarParams.from_config(carcfg)
        temporal, _ = dc.make_transitions(p)
        s_index, ns = 4, 8
    return problem, temporal, track, solver, s_index, ns


def initial_states(track, ns, B, rng, avoid_obstacles=False):
    states = np.zeros((B, ns), np.float64)
    s_i, ey_i = (4, 5) if ns == 8 else (2, 3)
    s = rng.uniform(0, float(track.length), B)
    ey = rng.uniform(-1.0, 1.0, B)
    if avoid_obstacles:
        # dropping a car inside/adjacent to an obstacle disc is an infeasible
        # start, not a solvable scenario; resample clear of every disc
        obs = np.asarray(track.data.obstacles)
        for _ in range(50):
            bad = np.zeros(B, bool)
            for o in obs:
                d = np.sqrt((s - o[2]) ** 2 + (ey - o[3]) ** 2)
                bad |= d < (o[4] + 2.0)
            if not bad.any():
                break
            s[bad] = rng.uniform(0, float(track.length), int(bad.sum()))
            ey[bad] = rng.uniform(-1.0, 1.0, int(bad.sum()))
    states[:, s_i] = s
    states[:, ey_i] = ey
    if ns == 8:  # dynamic bicycle
        states[:, 0] = 6.0 + rng.uniform(0, 8, B)  # Ux spread
    else:  # kinematic
        states[:, 0] = 2.0 + rng.uniform(0, 6, B)
    return states


def main():
    platform = jax.devices()[0].platform
    mode = os.environ.get("BENCH_MODE", "throughput")  # or "latency"
    if platform == "tpu" and mode == "throughput":
        # wide solve-kernel tiles: the kernel is issue-bound, not op-bound;
        # 16 sublanes (2048 scenarios/instance) measures +6% over 8 and
        # saturates (32 is flat).  Must be set before the solver import.
        os.environ.setdefault("FM_SUB", "16")
    config_name = os.environ.get("BENCH_CONFIG", "singletrack")
    if mode == "latency":
        B = 1
        K = int(os.environ.get("BENCH_STEPS", 50))
    else:
        B = int(os.environ.get("BENCH_BATCH", 4096 if platform == "tpu" else 32))
        K = int(os.environ.get("BENCH_STEPS", 10))
    N = int(os.environ.get("BENCH_HORIZON", 30))
    dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16, "f64": jnp.float64}[
        os.environ.get("BENCH_DTYPE", "f32")
    ]

    from vehicle_control_tpu.parallel import aligned_carry, make_batched_racing_step
    from vehicle_control_tpu.solvers import ALILQRConfig

    problem, temporal, track, solver, s_index, ns = build(config_name, N, dtype)

    # Pallas field-major kernels are the default hot path on TPU.  In
    # latency mode a B=1 solve pads to the 1024-lane tile, but a padded tile
    # costs the same wall time as a full one — the whole-solve kernel is
    # still the fastest single-scenario path (BENCH_KERNEL=0 for the XLA
    # comparison).
    use_kernels = bool(
        int(os.environ.get("BENCH_KERNEL", "1" if platform == "tpu" else "0"))
    )
    # whole-solve fused kernel (one launch per MPC step) — the round-2 default
    # TPU hot path; BENCH_SOLVE_KERNEL=0 falls back to the per-phase kernels
    use_solve_kernel = use_kernels and bool(
        int(os.environ.get("BENCH_SOLVE_KERNEL", "1"))
    )
    solver_cfg = ALILQRConfig(
        n_outer=int(os.environ.get("BENCH_OUTER", solver["n_outer"])),
        n_inner=int(os.environ.get("BENCH_INNER", solver["n_inner"])),
        mu0=float(os.environ.get("BENCH_MU0", solver.get("mu0", 10.0))),
        mu_scale=float(os.environ.get("BENCH_MU_SCALE", solver.get("mu_scale", 10.0))),
        n_alpha=int(os.environ.get("BENCH_ALPHA", solver.get("n_alpha", 8))),
        n_polish=int(os.environ.get("BENCH_POLISH", solver.get("n_polish", 0))),
        polish_mu_boost=float(
            os.environ.get("BENCH_POLISH_BOOST", solver.get("polish_mu_boost", 1.0))
        ),
        use_solve_kernel=use_solve_kernel,
        use_ls_kernel=use_kernels and not use_solve_kernel,
        use_backward_kernel=use_kernels and not use_solve_kernel,
        # latency mode: associative-scan Riccati cuts the backward sweep's
        # serial depth from O(H) to O(log H) (BENCH_PAR_RICCATI=0 disables)
        # measured on v5e at N=30/B=1: sequential 41.9 ms vs scan 43.1 ms —
        # the scan's 10x10 combine solves pad onto the MXU and lose to the
        # closed-form sequential sweep below H~60; opt in for long horizons
        use_parallel_riccati=(
            mode == "latency"
            and bool(int(os.environ.get("BENCH_PAR_RICCATI", "0")))
        ),
        unroll=int(os.environ.get("BENCH_UNROLL", "4")),
        # solve-kernel inner loop exits once a whole tile is done (bitwise-
        # identical; see ALILQRConfig.early_exit).  BENCH_EARLY_EXIT=0 for A/B.
        early_exit=bool(int(os.environ.get("BENCH_EARLY_EXIT", "1"))),
        # alpha=1 fast path: sweep one candidate, cond-run the ladder only
        # when a live lane rejects it (ALILQRConfig.ls_fast_path)
        ls_fast_path=bool(int(os.environ.get("BENCH_LS_FAST", "0"))),
        recover_viol=float(
            os.environ.get("BENCH_RECOVER", solver.get("recover_viol", 5.0))
        ),
    )
    step_fn = make_batched_racing_step(
        problem, solver_cfg, temporal, track.data, 0.05, s_index
    )

    rng = np.random.default_rng(0)
    avoid = "obstacles" in config_name or config_name == "kinematic"
    states = jnp.asarray(initial_states(track, ns, B, rng, avoid), dtype)
    # physics-informed state-aligned warm start: scenarios are dropped
    # mid-track at speed, which the standing-start carry can't recover from
    # on the cascaded families (see parallel.aligned_carry)
    carries = aligned_carry(problem, states, dtype)

    if mode == "throughput" and not bool(int(os.environ.get("BENCH_SYNC", "0"))):
        # Sustained chunked throughput: K chained steps inside ONE jitted
        # lax.scan, one dispatch + one block per chunk — exactly how the
        # framework's own closed loops run (simulation/closed_loop.py,
        # RacingSimulator chunk=25).  Per-step host sync would add the full
        # host<->device round trip (~28 ms through this TPU tunnel — see
        # dispatch_rtt_ms in latency mode) to every step, which no
        # steady-state user pays; queued async dispatch through the tunnel
        # has unreliable barrier semantics, so the scan is also the only
        # trustworthy pipelined measurement here.  BENCH_SYNC=1 restores
        # blocking per-step timing for A/B.
        def chunk_body(cs, _):
            c, s = cs
            c2, s2, _a, info = step_fn(c, s)
            # the plant step accumulates in f32 even for bf16 solves; cast
            # the scan carry back so bf16 runs have a fixed carry type
            s2 = s2.astype(s.dtype)
            return (c2, s2), info.converged

        @jax.jit
        def chunk(c, s):
            (c, s), conv_steps = jax.lax.scan(
                chunk_body, (c, s), None, length=K
            )
            return c, s, conv_steps

        carries, states, conv_steps = chunk(carries, states)
        np.asarray(conv_steps[-1])  # compile + warm
        reps = int(os.environ.get("BENCH_REPS", 3))
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            carries, states, conv_steps = chunk(carries, states)
            # device->host fetch of the last step's convergence mask is the
            # barrier: block_until_ready alone has been observed returning
            # before the device finished on some paths through this tunnel
            # (a 0.1 ms/step "measurement"); a value copy cannot lie.
            conv_host = np.asarray(conv_steps[-1])
            times.append((time.perf_counter() - t0) / K)
        conv_last = conv_host
    else:
        step = jax.jit(step_fn)
        # warmup: compile + 2 steps to reach warm-started steady state
        carries, states, actions, infos = step(carries, states)
        carries, states, actions, infos = step(carries, states)
        jax.block_until_ready(states)
        times = []
        for _ in range(K):
            t0 = time.perf_counter()
            carries, states, actions, infos = step(carries, states)
            # host fetch as the barrier (see the scan branch's note)
            conv_host = np.asarray(infos.converged)
            times.append(time.perf_counter() - t0)
        conv_last = conv_host

    step_ms = float(np.median(times) * 1e3)
    solves_per_s = B / np.median(times)
    conv = float(jnp.mean(conv_last.astype(jnp.float32)))
    baseline_ms = BASELINE_MS[config_name]
    baseline_solves = 1000.0 / baseline_ms
    label = config_name if config_name != "singletrack" else f"dynamic bicycle N={N}"

    # Self-describing artifact (VERDICT r3 Weak #4/#5): every line carries the
    # exact experiment config so BENCH_MATRIX.jsonl is interpretable without
    # reading bench_matrix.sh, plus a free-form BENCH_NOTE.
    kernel_path = (
        "whole-solve" if use_solve_kernel
        else ("per-phase" if use_kernels else "xla")
    )
    cfg_desc = {
        "family": config_name,
        "budget": (
            f"{solver_cfg.n_outer}x{solver_cfg.n_inner}"
            + (f"+{solver_cfg.n_polish}p" if solver_cfg.n_polish else "")
        ),
        "n_alpha": solver_cfg.n_alpha,
        "mu0": solver_cfg.mu0,
        "mu_scale": solver_cfg.mu_scale,
        "kernel": kernel_path,
        "timing": (
            f"chunked-scan({K} steps/dispatch)"
            if mode == "throughput"
            and not bool(int(os.environ.get("BENCH_SYNC", "0")))
            else "per-step-blocking"
        ),
    }
    note = os.environ.get("BENCH_NOTE", "")

    if mode == "latency":
        # dispatch floor: the TPU sits behind a tunnel, so a large share of
        # single-scenario wall latency is host<->device round-trip, not chip
        # time; measure a trivial jitted dispatch to report both honestly
        tiny = jax.jit(lambda x: x + 1.0)
        y = jnp.zeros((8,), dtype)
        y = tiny(y)
        jax.block_until_ready(y)
        rtts = []
        for _ in range(20):
            t0 = time.perf_counter()
            y = tiny(y)
            jax.block_until_ready(y)
            rtts.append(time.perf_counter() - t0)
        rtt_ms = float(np.median(rtts) * 1e3)
        out = {
            "metric": f"MPC p50 solve latency, {label}, single scenario",
            "value": round(step_ms, 2),
            "unit": "ms",
            "vs_baseline": round(baseline_ms / step_ms, 2),
            "p95_ms": round(float(np.percentile(np.asarray(times) * 1e3, 95)), 2),
            "meets_50ms_budget": bool(step_ms < 50.0),
            "dispatch_rtt_ms": round(rtt_ms, 2),
            "device_ms_est": round(step_ms - rtt_ms, 2),
            "converged_frac": round(conv, 4),
            "platform": platform,
            "dtype": os.environ.get("BENCH_DTYPE", "f32"),
            "config": cfg_desc,
        }
    else:
        out = {
            "metric": f"MPC solves/s/chip, {label}",
            "value": round(float(solves_per_s), 1),
            "unit": "solves/s",
            "vs_baseline": round(float(solves_per_s / baseline_solves), 2),
            "batch": B,
            "step_ms": round(step_ms, 2),
            "converged_frac": round(conv, 4),
            "platform": platform,
            "dtype": os.environ.get("BENCH_DTYPE", "f32"),
            "config": cfg_desc,
        }
    if note:
        out["note"] = note
    print(json.dumps(out))


if __name__ == "__main__":
    main()
