"""Multi-host scaling: mesh over hosts, DCN between slices.

Single-host meshes (mesh.py) shard scenarios across the chips of one
process.  This module extends the same scenario axis across a multi-host
TPU pod slice:

* :func:`initialize` wraps ``jax.distributed.initialize`` (idempotent);
* :func:`global_scenario_mesh` builds a 1-D mesh over *all* devices in the
  job (ICI within a slice, DCN across slices — XLA routes collectives);
* :func:`host_local_batch` computes which slice of a global scenario batch
  this host must feed (jax.Array per-host data layout);
* :func:`make_global_sharded_step` is mesh.py's sharded step built on a
  global mesh with `jax.make_array_from_process_local_data` inputs.

On a single host all of this degrades to the mesh.py path (the tests and
the driver's dry run exercise exactly that), so the code is testable
without multi-host hardware.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vehicle_control_tpu.parallel.mesh import make_sharded_mpc_step


def initialize(
    coordinator_address=None,
    num_processes=None,
    process_id=None,
    cpu_collectives=None,
):
    """Idempotent jax.distributed.initialize (no-op on single process).

    MUST run before any other jax API touches the backend (even
    ``jax.process_count()`` initializes it — probing that here was the
    round-2 bug that made this path unreachable with process_count > 1;
    tests/test_multiprocess.py now executes it for real across 2 OS
    processes).  ``cpu_collectives``: set to ``"gloo"`` (or ``"mpi"``) for
    multi-process runs on the CPU backend — the DCN-emulation path; TPU
    jobs ignore it (ICI/DCN collectives are native).
    """
    if jax.distributed.is_initialized():
        return  # already initialized by the launcher
    if coordinator_address is None:
        return  # single-host run
    if cpu_collectives is not None:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_scenario_mesh(axis: str = "scenario") -> Mesh:
    """1-D mesh over every device in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def host_local_batch(global_batch: int) -> tuple[int, slice]:
    """(local_batch, global_slice) this process is responsible for."""
    n_proc = jax.process_count()
    if global_batch % n_proc:
        raise ValueError(f"global batch {global_batch} % {n_proc} processes != 0")
    local = global_batch // n_proc
    start = jax.process_index() * local
    return local, slice(start, start + local)


def make_global_array(mesh: Mesh, host_data, axis: str = "scenario"):
    """Assemble a global jax.Array from this host's shard of the batch."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(sharding, np.asarray(host_data))


def make_global_sharded_step(
    problem, solver_cfg, transition, track_data, dt, s_index, axis: str = "scenario"
):
    """Sharded closed-loop step over the global (multi-host) mesh.

    Returns (mesh, step).  Feed it global jax.Arrays built with
    :func:`make_global_array`; FleetStats are globally psum'd (ICI within a
    slice, DCN across slices)."""
    mesh = global_scenario_mesh(axis)
    step = make_sharded_mpc_step(
        problem, solver_cfg, transition, track_data, dt, s_index, mesh, axis
    )
    return mesh, step
