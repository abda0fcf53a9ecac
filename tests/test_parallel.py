"""Multi-chip layer tests on the virtual 8-device CPU mesh (SURVEY §4:
'multi-chip (same results under 1x / 8x meshes)')."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.models import kinematic_car as kc
from vehicle_control_tpu.parallel import (
    make_batched_racing_step,
    make_sharded_mpc_step,
    scenario_mesh,
    tile_carry,
)
from vehicle_control_tpu.solvers import ALILQRConfig
from vehicle_control_tpu.utils.config import load_config, project_root


@pytest.fixture(scope="module")
def setup(ippodromo_track):
    carcfg = load_config(
        os.path.join(project_root(), "configs/models/kinematic_car.yaml")
    )
    ctrl = load_config(
        os.path.join(project_root(), "configs/controllers/kinematic.yaml")
    )
    ctrl["obstacles"] = False
    ctrl["horizon"] = 12  # small for test speed
    prob = problems.build_kinematic_problem(carcfg, ippodromo_track, ctrl)
    p = kc.KinematicCarParams.from_config(carcfg)
    temporal, _ = kc.make_transitions(p)
    cfg = ALILQRConfig(n_outer=2, n_inner=5)
    return prob, cfg, temporal, ippodromo_track


def _states(batch):
    rng = np.random.default_rng(7)
    s = np.zeros((batch, 6))
    s[:, 0] = 2.0 + rng.uniform(0, 4, batch)  # v
    s[:, 2] = rng.uniform(1, 200, batch)  # s along track
    s[:, 3] = rng.uniform(-1, 1, batch)  # ey
    return jnp.asarray(s)


class TestShardedScenarios:
    def test_eight_device_mesh_matches_single_device_vmap(self, setup):
        prob, cfg, temporal, track = setup
        assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
        B = 16
        states = _states(B)
        carries = tile_carry(prob, B)

        batched = jax.jit(
            make_batched_racing_step(prob, cfg, temporal, track.data, 0.05, 2)
        )
        mc_ref, st_ref, act_ref, infos = batched(carries, states)

        mesh = scenario_mesh(8)
        sharded = make_sharded_mpc_step(
            prob, cfg, temporal, track.data, 0.05, 2, mesh
        )
        mc_sh, st_sh, act_sh, stats = sharded(carries, states)

        np.testing.assert_allclose(
            np.asarray(act_sh), np.asarray(act_ref), rtol=1e-10, atol=1e-10
        )
        np.testing.assert_allclose(
            np.asarray(st_sh), np.asarray(st_ref), rtol=1e-10, atol=1e-10
        )
        assert int(stats.n_total) == B
        assert int(stats.n_converged) == int(jnp.sum(infos.converged))
        np.testing.assert_allclose(
            float(stats.max_violation), float(jnp.max(infos.violation)), rtol=1e-9
        )

    def test_closed_loop_batch_progresses(self, setup):
        prob, cfg, temporal, track = setup
        B = 8
        states = _states(B)
        carries = tile_carry(prob, B)
        mesh = scenario_mesh(8)
        step = make_sharded_mpc_step(prob, cfg, temporal, track.data, 0.05, 2, mesh)
        s0 = np.asarray(states[:, 2]).copy()
        for _ in range(10):
            carries, states, actions, stats = step(carries, states)
        ds = np.asarray(states[:, 2]) - s0
        assert np.all(ds > 0.5)  # every scenario advanced along the track
        assert float(stats.max_violation) < 1.0


class TestDistributedSingleHost:
    def test_global_mesh_path(self, setup):
        """Multi-host API degrades to the local mesh on one process."""
        from vehicle_control_tpu.parallel import distributed as dist

        prob, cfg, temporal, track = setup
        mesh, step = dist.make_global_sharded_step(
            prob, cfg, temporal, track.data, 0.05, 2
        )
        B = 16
        local, sl = dist.host_local_batch(B)
        assert local == B and sl == slice(0, B)  # single process owns all
        states = dist.make_global_array(mesh, np.asarray(_states(B)))
        from vehicle_control_tpu.parallel import tile_carry
        import jax

        carries = jax.tree.map(
            lambda a: dist.make_global_array(mesh, np.asarray(a)),
            tile_carry(prob, B),
        )
        carries, states2, actions, stats = step(carries, states)
        assert int(stats.n_total) == B
        assert states2.shape == states.shape


class TestSweepCheckpoint:
    def test_roundtrip_continues_identically(self, setup, tmp_path):
        import jax

        from vehicle_control_tpu.parallel import (
            make_batched_racing_step,
            tile_carry,
        )
        from vehicle_control_tpu.utils.checkpoint import (
            load_sweep_checkpoint,
            save_sweep_checkpoint,
        )

        prob, cfg, temporal, track = setup
        B = 8
        step = jax.jit(
            make_batched_racing_step(prob, cfg, temporal, track.data, 0.05, 2)
        )
        carries = tile_carry(prob, B)
        states = _states(B)
        for _ in range(3):
            carries, states, actions, infos = step(carries, states)
        path = save_sweep_checkpoint(str(tmp_path / "ck.npz"), 3, carries, states)

        # continue directly
        c_direct, s_direct = carries, states
        c_direct, s_direct, a_direct, _ = step(c_direct, s_direct)

        # restore + continue
        n, c_rest, s_rest, _ = load_sweep_checkpoint(path, carries, states)
        assert n == 3
        c_rest = jax.tree.map(jnp.asarray, c_rest)
        c2, s2, a2, _ = step(c_rest, jnp.asarray(s_rest))
        np.testing.assert_allclose(np.asarray(s2), np.asarray(s_direct), atol=1e-12)
        np.testing.assert_allclose(np.asarray(a2), np.asarray(a_direct), atol=1e-12)
