"""Device-mesh sharding for scenario sweeps.

Scales the batched MPC over a ``jax.sharding.Mesh``: the scenario axis is
sharded across chips (the DP analogue — SURVEY §2.3), solves run with zero
cross-chip communication, and only the aggregate health metrics (convergence
count, mean cost, worst violation) ride ICI as ``psum``/``pmax`` collectives.
Multi-host extends the same mesh over DCN via ``jax.distributed.initialize``
(hosts each feed their addressable shard of the scenario batch).

Nothing here is TPU-specific at trace time: the same code runs on the
virtual 8-device CPU mesh used by the tests and the driver's multi-chip
dry-run (``XLA_FLAGS=--xla_force_host_platform_device_count=N``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from vehicle_control_tpu.parallel.batch import make_batched_racing_step


class FleetStats(NamedTuple):
    """Cross-chip aggregated solver health (psum/pmax over the mesh).

    The reference's failure story is a swallowed exception per solve
    (racing.py:416-423); here non-convergence is a *counted, masked status*
    aggregated across the fleet every step (SURVEY §5)."""

    n_converged: jnp.ndarray  # scalar, global
    n_total: jnp.ndarray  # scalar, global
    mean_cost: jnp.ndarray  # scalar, global mean
    max_violation: jnp.ndarray  # scalar, global max
    mean_iterations: jnp.ndarray


def scenario_mesh(n_devices: int | None = None, axis: str = "scenario") -> Mesh:
    """1-D mesh over all (or the first n) local devices."""
    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def make_sharded_mpc_step(
    problem, solver_cfg, transition, track_data, dt, s_index, mesh: Mesh,
    axis: str = "scenario",
):
    """Shard the batched closed-loop step over ``mesh``.

    Returns ``step(carries, states) -> (carries', states', actions, stats)``
    where every array's leading axis is the *global* scenario batch (must be
    divisible by the mesh size) and ``stats`` is a :class:`FleetStats`
    aggregated with ICI collectives.
    """
    batched = make_batched_racing_step(
        problem, solver_cfg, transition, track_data, dt, s_index
    )

    def local_step(carries, states):
        mc, next_states, actions, infos = batched(carries, states)
        n_local = states.shape[0]
        stats = FleetStats(
            n_converged=jax.lax.psum(
                jnp.sum(infos.converged.astype(jnp.int32)), axis
            ),
            n_total=jax.lax.psum(jnp.asarray(n_local, jnp.int32), axis),
            mean_cost=jax.lax.pmean(jnp.mean(infos.cost), axis),
            max_violation=jax.lax.pmax(jnp.max(infos.violation), axis),
            mean_iterations=jax.lax.pmean(
                jnp.mean(infos.iterations.astype(jnp.float32)), axis
            ),
        )
        return mc, next_states, actions, stats

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
