"""Pure closed-loop racing core.

The reference's simulation loop is a matplotlib ``FuncAnimation`` callback
(racing.py:208-242) — rendering gates the physics.  Here the loop is a
``lax.scan`` over control steps: controller solve + plant step fused into one
jitted program, rendering fully decoupled (host-side, from saved arrays).
The scan is chunked so the host can poll lap completion between chunks while
every chunk stays a single static-shape XLA program; the same step function is
``vmap``-batched over scenarios by the parallel layer.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from vehicle_control_tpu.controllers.mpc.controllers import (
    MPCCarry,
    make_mpc_step,
)
from vehicle_control_tpu.environment import track as track_mod


class StepRecord(NamedTuple):
    """Per-step log (the reference's state/action/elapsed/preds arrays,
    racing.py:236-241)."""

    state: jnp.ndarray  # (ns,) plant state before the step
    action: jnp.ndarray  # (na,) applied action (physical units)
    violation: jnp.ndarray  # solver constraint violation
    iterations: jnp.ndarray  # accepted solver iterations
    cost: jnp.ndarray  # solver objective
    X_pred: jnp.ndarray  # (H, nz) predicted trajectory (for preds artifacts)


def make_racing_loop(problem, solver_cfg, transition, track_data, dt, s_index):
    """Build ``run_chunk(state, mpc_carry, n) -> (state', carry', records)``.

    ``transition``: the plant's *temporal* discrete transition
    (reference: car.drive, racing_car.py:34-46).  ``s_index``: index of the
    arclength coordinate in the plant state (4 for the single-track model,
    2 for the kinematic car).
    """
    mpc_step = make_mpc_step(problem, solver_cfg)

    def sim_step(carry, _):
        state, mc = carry
        mc, action, info = mpc_step(mc, state)
        k = track_mod.curvature(track_data, state[s_index])
        next_state = transition(state, action, k, dt)
        rec = StepRecord(
            state, action, info.violation, info.iterations, info.cost, info.X_pred
        )
        return (next_state, mc), rec

    def run_chunk(state, mc: MPCCarry, n: int):
        (state, mc), recs = lax.scan(sim_step, (state, mc), None, length=n)
        return state, mc, recs

    return jax.jit(run_chunk, static_argnums=2), sim_step
