"""Scenario-sharding scaling curve on a device mesh.

Measures batched closed-loop MPC throughput as the scenario axis is sharded
over 1/2/4/8 mesh devices (parallel.make_sharded_mpc_step), plus the
unsharded single-device vmap baseline, and writes ``SCALING.json``.

On real multi-chip hardware the curve measures actual scaling (the scenario
axis has zero cross-chip traffic except the FleetStats psum, so it should be
embarrassingly linear).  On this environment only a *virtual* CPU mesh is
available (8 XLA host devices time-sharing the same cores), so absolute
speedup is physically impossible; the meaningful quantity — recorded as
``efficiency`` — is sharding overhead: time(1 device, B) / time(n devices,
B) at fixed total batch, which is ~1.0 iff the sharded program adds no
communication/partitioning cost on top of the same total work.

Run:  python scripts/scaling_curve.py          (CPU virtual mesh)
Knobs: SCALE_BATCH (total scenarios), SCALE_HORIZON, SCALE_STEPS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEV = int(os.environ.get("SCALE_DEVICES", "8"))
if "JAX_PLATFORMS" not in os.environ:
    os.environ["JAX_PLATFORMS"] = "cpu"
if os.environ["JAX_PLATFORMS"] == "cpu":
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N_DEV}"
    )

import jax

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.environment.track import Track
from vehicle_control_tpu.models import dynamic_car as dc
from vehicle_control_tpu.parallel import (
    aligned_carry,
    make_batched_racing_step,
    make_sharded_mpc_step,
    scenario_mesh,
)
from vehicle_control_tpu.solvers import ALILQRConfig
from vehicle_control_tpu.utils.config import load_config, project_root


def main():
    B = int(os.environ.get("SCALE_BATCH", "64"))
    N = int(os.environ.get("SCALE_HORIZON", "12"))
    K = int(os.environ.get("SCALE_STEPS", "3"))
    root = project_root()
    track = Track(load_config(os.path.join(root, "configs/environment/ippodromo.yaml")))
    car = load_config(os.path.join(root, "configs/models/dynamic_car.yaml"))
    ctrl = load_config(os.path.join(root, "configs/controllers/singletrack.yaml"))
    ctrl["obstacles"] = False
    ctrl["horizon"] = N
    prob = problems.build_cascaded_problem(car, track, ctrl, "none", jnp.float32)
    p = dc.DynamicCarParams.from_config(car)
    temporal, _ = dc.make_transitions(p)
    scfg = ALILQRConfig(n_outer=2, n_inner=6)

    rng = np.random.default_rng(0)
    st = np.zeros((B, 8), np.float64)
    st[:, 0] = 6.0 + rng.uniform(0, 8, B)
    st[:, 4] = rng.uniform(0, float(track.length), B)
    states0 = jnp.asarray(st, jnp.float32)

    def bench(step_fn):
        carries = aligned_carry(prob, states0)
        states = states0
        out = step_fn(carries, states)
        jax.block_until_ready(out[1])
        carries, states = out[0], out[1]
        times = []
        for _ in range(K):
            t0 = time.perf_counter()
            out = step_fn(carries, states)
            jax.block_until_ready(out[1])
            carries, states = out[0], out[1]
            times.append(time.perf_counter() - t0)
        return B / float(np.median(times))

    # unsharded single-device vmap baseline
    base_step = jax.jit(
        make_batched_racing_step(prob, scfg, temporal, track.data, 0.05, 4)
    )
    base = bench(lambda c, s: base_step(c, s))

    devices = []
    solves = []
    n_avail = len(jax.devices())
    for n in (1, 2, 4, 8):
        if n > n_avail:
            break
        mesh = scenario_mesh(n)
        step = make_sharded_mpc_step(
            prob, scfg, temporal, track.data, 0.05, 4, mesh
        )
        devices.append(n)
        solves.append(bench(lambda c, s: step(c, s)))

    efficiency = [s / base for s in solves]
    out = {
        "platform": jax.devices()[0].platform,
        "batch_total": B,
        "horizon": N,
        "unsharded_solves_per_s": round(base, 1),
        "devices": devices,
        "sharded_solves_per_s": [round(s, 1) for s in solves],
        "efficiency_vs_unsharded": [round(e, 3) for e in efficiency],
        "note": (
            "virtual CPU mesh time-shares physical cores, so efficiency "
            "measures sharding overhead at fixed total batch (1.0 = none), "
            "not multi-chip speedup; on real multi-chip hardware the same "
            "harness measures the true scaling curve"
            if jax.devices()[0].platform == "cpu"
            else "real device mesh"
        ),
    }
    path = os.path.join(root, "SCALING.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
