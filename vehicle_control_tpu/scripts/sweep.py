"""Batched scenario sweep: thousands of MPC instances in parallel.

The capability the reference cannot express (one scenario per process,
SURVEY §2.3): sweep initial conditions x track positions x speeds across
all local devices, closed-loop, with fleet health statistics aggregated over
the mesh every step.

Usage:
  python -m vehicle_control_tpu.scripts.sweep [--batch 1024] [--steps 20]
      [--controller singletrack] [--horizon 30] [--track ippodromo]
"""

import argparse
import os
import time

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--controller", default="singletrack")
    ap.add_argument("--horizon", type=int, default=None)
    ap.add_argument("--track", default="ippodromo")
    ap.add_argument(
        "--frictions",
        default=None,
        help="comma-separated friction scale factors; runs one batched sweep "
        "per value (e.g. 0.8,1.0,1.1)",
    )
    args = ap.parse_args()

    from vehicle_control_tpu.controllers.mpc import problems
    from vehicle_control_tpu.controllers.mpc.controllers import _solver_config
    from vehicle_control_tpu.environment.track import Track
    from vehicle_control_tpu.models import dynamic_car as dc
    from vehicle_control_tpu.models import kinematic_car as kc
    from vehicle_control_tpu.parallel import (
        make_sharded_mpc_step,
        scenario_mesh,
        tile_carry,
    )
    from vehicle_control_tpu.utils.config import load_config, project_root
    from vehicle_control_tpu.utils.profiling import solver_stats

    root = project_root()
    track = Track(load_config(os.path.join(root, f"configs/environment/{args.track}.yaml")))
    ctrl = load_config(os.path.join(root, f"configs/controllers/{args.controller}.yaml"))
    ctrl["obstacles"] = False
    if args.horizon:
        ctrl["horizon"] = args.horizon

    friction_scales = (
        [float(x) for x in args.frictions.split(",")] if args.frictions else [1.0]
    )

    dtype = jnp.float32
    n_dev = jax.device_count()
    B = (args.batch // n_dev) * n_dev

    if len(friction_scales) > 1 and args.controller != "kinematic":
        # Per-scenario parameter batching (XLA path): every scenario carries
        # its own DynamicCarParams, so the whole friction sweep is ONE
        # compiled program — vs one compile per value (the per-value loop
        # below, still used for the Pallas kernel path and for kinematic).
        import dataclasses as _dcs

        from vehicle_control_tpu.controllers.mpc.controllers import _solver_config as _scfg
        from vehicle_control_tpu.parallel import make_param_batched_racing_step

        tail = "pm" if "horizon_pm" in ctrl and int(ctrl.get("horizon_pm", 0)) else "none"
        carcfg = load_config(os.path.join(root, "configs/models/dynamic_car.yaml"))
        base = dc.DynamicCarParams.from_config(carcfg)
        nv = len(friction_scales)
        scales = jnp.asarray(
            np.repeat(np.asarray(friction_scales, np.float64), -(-B // nv))[:B], dtype
        )
        pb = _dcs.replace(base, mu_f=base.mu_f * scales, mu_r=base.mu_r * scales)
        p_batch = jax.tree_util.tree_map(
            lambda f: jnp.broadcast_to(jnp.asarray(f, dtype), (B,)), pb
        )

        step, carry_for = make_param_batched_racing_step(
            carcfg, track, ctrl, tail, _scfg(ctrl), 0.05, dtype
        )
        step = jax.jit(step)

        rng = np.random.default_rng(0)
        states = np.zeros((B, 8), np.float32)
        states[:, 0] = 5.0 + rng.uniform(0, 8, B)
        states[:, 4] = rng.uniform(0, float(track.length), B)
        states[:, 5] = rng.uniform(-1, 1, B)
        states = jnp.asarray(states)
        carries = jax.jit(carry_for)(p_batch, states)

        print(
            f"param-batched sweep: {B} scenarios x {args.steps} steps, "
            f"{nv} friction values in ONE compiled program"
        )
        carries, states, actions, infos = step(p_batch, carries, states)
        jax.block_until_ready(states)
        t0 = time.perf_counter()
        conv = None
        for _ in range(args.steps):
            carries, states, actions, infos = step(p_batch, carries, states)
            conv = infos.converged
        conv = np.asarray(conv)
        wall = time.perf_counter() - t0
        print(f"throughput: {B * args.steps / wall:.0f} solves/s")
        vals = np.asarray(scales)
        for v in friction_scales:
            m = vals == np.float32(v)
            print(
                f"  friction x{v}: conv {conv[m].mean() * 100:.1f}% "
                f"({int(m.sum())} scenarios)"
            )
        return

    for mu_scale in friction_scales:
        if args.controller == "kinematic":
            carcfg = load_config(os.path.join(root, "configs/models/kinematic_car.yaml"))
            problem = problems.build_kinematic_problem(carcfg, track, ctrl, dtype)
            temporal, _ = kc.make_transitions(kc.KinematicCarParams.from_config(carcfg))
            s_index, ns = 2, 6
        else:
            tail = "pm" if "horizon_pm" in ctrl and int(ctrl.get("horizon_pm", 0)) else "none"
            carcfg = load_config(os.path.join(root, "configs/models/dynamic_car.yaml"))
            if mu_scale != 1.0:
                carcfg["env"]["mu"]["f"] = float(carcfg["env"]["mu"]["f"]) * mu_scale
                carcfg["env"]["mu"]["r"] = float(carcfg["env"]["mu"]["r"]) * mu_scale
            problem = problems.build_cascaded_problem(carcfg, track, ctrl, tail, dtype)
            temporal, _ = dc.make_transitions(dc.DynamicCarParams.from_config(carcfg))
            s_index, ns = 4, 8

        mesh = scenario_mesh()
        step = make_sharded_mpc_step(
            problem, _solver_config(ctrl), temporal, track.data, 0.05, s_index, mesh
        )

        rng = np.random.default_rng(0)
        states = np.zeros((B, ns), np.float32)
        states[:, 0] = 5.0 + rng.uniform(0, 8, B)
        states[:, s_index] = rng.uniform(0, float(track.length), B)
        states[:, s_index + 1] = rng.uniform(-1, 1, B)  # ey
        states = jnp.asarray(states)
        carries = tile_carry(problem, B, dtype)

        label = f" [friction x{mu_scale}]" if len(friction_scales) > 1 else ""
        print(f"sweep{label}: {B} scenarios x {args.steps} steps on {n_dev} device(s)")
        carries, states, actions, stats = step(carries, states)  # compile + warm
        jax.block_until_ready(states)
        t0 = time.perf_counter()
        viols, conv = [], []
        for i in range(args.steps):
            carries, states, actions, stats = step(carries, states)
            viols.append(float(stats.max_violation))
            conv.append(int(stats.n_converged))
        jax.block_until_ready(states)
        wall = time.perf_counter() - t0
        print(
            f"throughput{label}: {B * args.steps / wall:.0f} solves/s | "
            f"convergence {np.mean(conv) / B * 100:.1f}% | "
            f"fleet max violation p50 {np.percentile(viols, 50):.3g} "
            f"max {np.max(viols):.3g}"
        )


if __name__ == "__main__":
    main()
