"""Scenario batching: the primary TPU scaling axis.

The reference runs ONE scenario per process (SURVEY §2.3 — no parallelism of
any kind); beating its ~10-30 solves/s baseline by orders of magnitude comes
from ``vmap`` over scenarios (initial states x track positions x friction x
reference speeds), not from per-solve latency.  Everything in the solver and
problem layers is vmap-clean by construction; this module provides the
batched entry points the bench, sweeps, and the mesh layer build on.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vehicle_control_tpu.controllers.mpc import problems as problems_mod
from vehicle_control_tpu.controllers.mpc.controllers import (
    MPCCarry,
    initial_carry,
    make_mpc_step,
)
from vehicle_control_tpu.environment import track as track_mod


def tile_carry(problem, batch: int, dtype=None) -> MPCCarry:
    """Broadcast the initial warm-start carry across a scenario batch."""
    c = initial_carry(problem, dtype)
    return MPCCarry(*(jnp.broadcast_to(a, (batch,) + a.shape) for a in c))


def aligned_carry(problem, states, dtype=None) -> MPCCarry:
    """State-aligned warm-start carries for scenarios dropped mid-track.

    Uses the problem's physics-informed ``warm_start`` (speed-consistent ds
    horizon + curvature feed-forward controls) so a batch initialized at
    arbitrary physical states starts inside the solver's convergence basin —
    the standing-start ``tile_carry`` seed leaves long-tail cascaded solves
    unrecoverable (see problems.build_cascaded_problem.warm_start).
    """
    if problem.warm_start is None:
        return tile_carry(problem, jnp.shape(states)[0], dtype)
    X0, U0 = jax.vmap(problem.warm_start)(jnp.asarray(states))
    if dtype is not None:
        X0, U0 = X0.astype(dtype), U0.astype(dtype)
    lam0 = jnp.zeros((X0.shape[0], problem.horizon, problem.nc), X0.dtype)
    return MPCCarry(X0, U0, lam0)


def make_batched_mpc_step(problem, solver_cfg):
    """vmap of the pure MPC step over (carry, state) scenario batches.

    step(carries, states) -> (carries', actions, infos); states (B, ns).
    """
    return jax.vmap(make_mpc_step(problem, solver_cfg))


def make_batched_racing_step(problem, solver_cfg, transition, track_data, dt, s_index):
    """One batched closed-loop step: B MPC solves + B plant steps.

    This is the unit the throughput bench measures and the multi-chip mesh
    shards: scenario-parallel MPC with zero cross-scenario communication
    (metrics reductions live in the mesh layer).
    """
    mpc_step = make_mpc_step(problem, solver_cfg)

    def step(carry, state):
        mc, action, info = mpc_step(carry, state)
        k = track_mod.curvature(track_data, state[s_index])
        next_state = transition(state, action, k, dt)
        return mc, next_state, action, info

    return jax.vmap(step)


def make_param_batched_racing_step(
    car_config, track, cfg, tail, solver_cfg, dt, dtype=jnp.float32
):
    """Closed-loop racing step with PER-SCENARIO car/env parameters.

    Each scenario carries its own :class:`dc.DynamicCarParams` (friction,
    mass, tire stiffness, ... — a pytree with leading batch axes), so a
    parameter sweep is ONE compiled program + one ``vmap`` instead of one
    compiled problem per value (the reference re-builds its whole CasADi
    graph per parameter set; the float-literal Pallas kernels similarly
    need one build per value).  XLA solver path only — the problem builder
    is re-traced with tracer params (problems.build_cascaded_problem
    ``p_override``), and the plant dynamics use the same per-scenario
    params, so the sweep perturbs solver AND plant consistently.

    Returns ``step(p_batched, carries, states) ->
    (carries', states', actions, infos)`` plus a single-scenario
    ``carry_for(p, state)`` helper for building aligned warm starts.
    """
    from vehicle_control_tpu.models import dynamic_car as dc

    track_data = track.data
    s_index = 4

    def one(p, carry, state):
        problem = problems_mod.build_cascaded_problem(
            car_config, track, cfg, tail, dtype, p_override=p
        )
        mc, action, info = make_mpc_step(problem, solver_cfg)(carry, state)
        transition, _ = dc.make_transitions(p)
        k = track_mod.curvature(track_data, state[s_index])
        # under x64 the f64 track tables promote the plant step; keep the
        # scan-carry dtype fixed so chained jitted steps never retrace
        next_state = transition(state, action, k, dt).astype(state.dtype)
        return mc, next_state, action, info

    def carry_for(p, state):
        problem = problems_mod.build_cascaded_problem(
            car_config, track, cfg, tail, dtype, p_override=p
        )
        X0, U0 = problem.warm_start(state)
        lam0 = jnp.zeros((problem.horizon, problem.nc), X0.dtype)
        return MPCCarry(X0.astype(dtype), U0.astype(dtype), lam0)

    return jax.vmap(one), jax.vmap(carry_for)
