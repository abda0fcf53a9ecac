"""bf16 speed-path guardrail (SURVEY §7.3).

The solver is dtype-polymorphic; this pins that a bf16-built problem still
converges closed-loop (accuracy guardrail for the BENCH_DTYPE=bf16 line).
bf16 halves mantissa to 8 bits, so tolerances are orders looser — the test
asserts the solver *works* (finite, bounded violation, car drives forward),
not f32-grade parity.  The measured TPU verdict lives in BENCH notes: the
hot path is VPU-arithmetic-bound, so bf16 buys little and f32 stays the
default speed dtype.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.models import dynamic_car as dc
from vehicle_control_tpu.parallel import aligned_carry, make_batched_racing_step
from vehicle_control_tpu.solvers import ALILQRConfig
from vehicle_control_tpu.utils.config import load_config, project_root


def test_bf16_singletrack_closed_loop(ippodromo_track):
    car = load_config(os.path.join(project_root(), "configs/models/dynamic_car.yaml"))
    ctrl = load_config(
        os.path.join(project_root(), "configs/controllers/singletrack.yaml")
    )
    ctrl["obstacles"] = False
    ctrl["horizon"] = 10
    prob = problems.build_cascaded_problem(
        car, ippodromo_track, ctrl, "none", jnp.bfloat16
    )
    p = dc.DynamicCarParams.from_config(car)
    temporal, _ = dc.make_transitions(p)
    step = jax.jit(
        make_batched_racing_step(
            prob, ALILQRConfig(n_outer=2, n_inner=6), temporal,
            ippodromo_track.data, 0.05, 4,
        )
    )
    B = 8
    rng = np.random.default_rng(0)
    st = np.zeros((B, 8))
    st[:, 0] = 6 + rng.uniform(0, 6, B)
    st[:, 4] = rng.uniform(0, 200, B)
    states = jnp.asarray(st, jnp.bfloat16)
    carries = aligned_carry(prob, states, jnp.bfloat16)
    v0 = np.asarray(states[:, 0].astype(jnp.float32))
    for _ in range(5):
        carries, states, actions, infos = step(carries, states)
    assert bool(jnp.all(jnp.isfinite(states.astype(jnp.float32))))
    assert bool(jnp.all(jnp.isfinite(actions.astype(jnp.float32))))
    # the fleet still races: cars keep moving forward at speed
    v = np.asarray(states[:, 0].astype(jnp.float32))
    assert (v > 3.0).all(), f"bf16 fleet stalled: speeds {v}"
    # violations bounded at bf16 resolution (tol_con is unreachable at 8-bit
    # mantissa; require no blow-up instead)
    assert float(jnp.max(infos.violation.astype(jnp.float32))) < 10.0
