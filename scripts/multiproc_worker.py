"""Multi-process worker: the REAL parallel/distributed.py path end-to-end.

Launched (2+ copies) by tests/test_multiprocess.py — or by hand:

    python scripts/multiproc_worker.py <proc_id> <n_proc> <port> <outdir>

Each process: ``distributed.initialize`` over a local coordinator (CPU
backend, Gloo collectives — the DCN-emulation configuration), builds the
global scenario mesh spanning both processes' devices, feeds its
``host_local_batch`` slice of a global scenario batch through
``make_global_sharded_step`` for several closed-loop MPC steps, and saves
its local actions + the globally-psum'd FleetStats.  The launcher asserts
(a) both processes observed identical global stats (the psum really crossed
processes) and (b) the assembled global action set matches a single-process
vmap reference bitwise-tolerance.

env: MP_DEVS_PER_PROC (default 2), MP_BATCH (default 16), MP_STEPS (3),
MP_HORIZON (8).
"""

import os
import sys

pid = int(sys.argv[1])
n_proc = int(sys.argv[2])
port = int(sys.argv[3])
outdir = sys.argv[4]

DEVS = int(os.environ.get("MP_DEVS_PER_PROC", "2"))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={DEVS}"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# the axon TPU plugin self-registers ahead of JAX_PLATFORMS: force CPU
# BEFORE the backend exists, or 2 workers would race for the TPU tunnel
jax.config.update("jax_platforms", "cpu")

from vehicle_control_tpu.parallel import distributed

distributed.initialize(
    # n_proc == 1 exercises the single-process degradation branch
    # (coordinator_address=None -> no distributed runtime, local mesh)
    coordinator_address=f"127.0.0.1:{port}" if n_proc > 1 else None,
    num_processes=n_proc,
    process_id=pid,
    cpu_collectives="gloo" if n_proc > 1 else None,
)

import jax.numpy as jnp
import numpy as np

from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.environment.track import Track
from vehicle_control_tpu.models import kinematic_car as kc
from vehicle_control_tpu.parallel import aligned_carry
from vehicle_control_tpu.solvers import ALILQRConfig
from vehicle_control_tpu.utils.config import load_config, project_root


def main():
    assert jax.process_count() == n_proc, (
        f"distributed init failed: process_count={jax.process_count()}"
    )
    B = int(os.environ.get("MP_BATCH", "16"))
    K = int(os.environ.get("MP_STEPS", "3"))
    root = project_root()
    track = Track(
        load_config(os.path.join(root, "configs/environment/ippodromo.yaml"))
    )
    car = load_config(os.path.join(root, "configs/models/kinematic_car.yaml"))
    ctrl = load_config(os.path.join(root, "configs/controllers/kinematic.yaml"))
    ctrl["obstacles"] = False
    ctrl["horizon"] = int(os.environ.get("MP_HORIZON", "8"))
    prob = problems.build_kinematic_problem(car, track, ctrl, jnp.float32)
    p = kc.KinematicCarParams.from_config(car)
    temporal, _ = kc.make_transitions(p)
    scfg = ALILQRConfig(n_outer=2, n_inner=4)

    # deterministic global scenario set (same on every process)
    rng = np.random.default_rng(7)
    st = np.zeros((B, 6), np.float32)
    st[:, 0] = 2.0 + rng.uniform(0, 6, B)
    st[:, 2] = rng.uniform(0, float(track.length), B)

    mesh, step = distributed.make_global_sharded_step(
        prob, scfg, temporal, track.data, float(car["dt"]), s_index=2
    )
    local_n, sl = distributed.host_local_batch(B)
    assert local_n == B // n_proc and sl == slice(pid * local_n, (pid + 1) * local_n)

    local_states = st[sl]
    carries_local = jax.device_get(
        aligned_carry(prob, jnp.asarray(local_states))
    )
    g_states = distributed.make_global_array(mesh, local_states)
    g_carries = jax.tree.map(
        lambda a: distributed.make_global_array(mesh, np.asarray(a)), carries_local
    )

    acts_hist, stats_hist = [], []
    for _ in range(K):
        g_carries, g_states, actions, stats = step(g_carries, g_states)
        # each process can only read its addressable shards
        shards = sorted(
            actions.addressable_shards, key=lambda s: s.index[0].start or 0
        )
        local_act = np.concatenate([np.asarray(s.data) for s in shards], axis=0)
        acts_hist.append(local_act)
        stats_hist.append([float(jax.device_get(x)) for x in stats])

    np.savez(
        os.path.join(outdir, f"proc{pid}.npz"),
        actions=np.asarray(acts_hist),  # (K, local_B, nu)
        stats=np.asarray(stats_hist),  # (K, 5)
        process_count=jax.process_count(),
        n_devices=len(jax.devices()),
    )
    print(f"[{pid}] OK process_count={jax.process_count()} ndev={len(jax.devices())}")


if __name__ == "__main__":
    main()
