"""Simulator-layer tests: multi-controller races, artifacts, summarize,
rendering (reference: simulation/racing.py behaviors)."""

import os

import numpy as np
import pytest

from vehicle_control_tpu.simulation import RacingSimulator
from vehicle_control_tpu.utils.config import ConfigDict, load_config, project_root


def _cfg(rel):
    return load_config(os.path.join(project_root(), "configs", rel))


@pytest.fixture(scope="module")
def short_race(tmp_path_factory):
    simconfig = ConfigDict(
        {
            "track_name": "ippodromo",
            "controller_names": ["cascaded", "singletrack"],
            "obstacles": False,
            "name": "testrun",
            "save_data": False,
            # trimmed horizons so the two-controller race stays fast on CPU
            "controller_overrides": {
                "cascaded": {"horizon": 10, "horizon_pm": 8},
                "singletrack": {"horizon": 14},
            },
        }
    )
    sim = RacingSimulator(simconfig, _cfg("models/dynamic_car.yaml"), _cfg("environment/ippodromo.yaml"))
    sim.run(max_steps=50, chunk=25)
    return sim


class TestMultiControllerRace:
    def test_both_controllers_progress(self, short_race):
        for name in ("cascaded", "singletrack"):
            st = short_race.state_traj[name]
            assert st.shape[0] == 50
            assert st[-1, 4] > st[0, 4] + 2.0  # s advanced
            assert np.all(np.isfinite(st))

    def test_summarize_runs(self, short_race, capsys):
        short_race.summarize()
        out = capsys.readouterr().out
        assert "cascaded" in out and "singletrack" in out

    def test_save_load_roundtrip(self, short_race, tmp_path):
        path = short_race.save(str(tmp_path / "run"))
        for name in ("cascaded", "singletrack"):
            for suffix in ("state_traj", "action_traj", "preds", "elapsed"):
                assert os.path.exists(os.path.join(path, f"{name}_{suffix}.npy"))
            assert os.path.exists(os.path.join(path, f"{name}_config.yaml"))
        reloaded = short_race.load(str(tmp_path / "run"))
        np.testing.assert_array_equal(
            reloaded.state_traj["cascaded"], short_race.state_traj["cascaded"]
        )

    def test_render_summary_png(self, short_race, tmp_path):
        from vehicle_control_tpu.simulation.render import plot_race_summary

        out = plot_race_summary(short_race, "cascaded", str(tmp_path / "s.png"))
        assert os.path.getsize(out) > 10000


class TestObstacleAvoidance:
    def test_raceline_clears_obstacles(self):
        """With obstacles enabled the closed-loop trajectory keeps clear of
        every obstacle disc; without them it cuts through (reference
        behavior: cascaded_obstacles runs vs race runs)."""
        import jax
        import jax.numpy as jnp

        from vehicle_control_tpu.controllers.mpc import problems
        from vehicle_control_tpu.controllers.mpc.controllers import (
            _solver_config,
            initial_carry,
            make_mpc_step,
        )
        from vehicle_control_tpu.environment.track import Track, curvature
        from vehicle_control_tpu.models import dynamic_car as dc

        track = Track(_cfg("environment/ippodromo.yaml"))
        carcfg = _cfg("models/dynamic_car.yaml")
        ctrl = _cfg("controllers/cascaded.yaml")
        ctrl["obstacles"] = True
        ctrl["horizon"], ctrl["horizon_pm"] = 12, 10
        prob = problems.build_cascaded_problem(carcfg, track, ctrl, "pm")
        step = jax.jit(make_mpc_step(prob, _solver_config(ctrl)))
        carry = initial_carry(prob)
        p = dc.DynamicCarParams.from_config(carcfg)
        temporal, _ = dc.make_transitions(p)
        # start just before the first obstacle at s=30
        state = jnp.zeros(8).at[0].set(8.0).at[4].set(15.0)
        traj = []
        for _ in range(60):
            carry, act, info = step(carry, state)
            state = temporal(state, act, curvature(track.data, state[4]), 0.05)
            traj.append(np.asarray(state))
        traj = np.asarray(traj)
        assert traj[-1, 4] > 35.0  # passed the obstacle zone
        obs = [o for o in track.obstacles if 20 < o.s < min(60, traj[-1, 4])]
        assert obs, "expected an obstacle in the traversed range"
        for o in obs:
            d = np.sqrt((traj[:, 4] - o.s) ** 2 + (traj[:, 5] - o.ey) ** 2).min()
            assert d > o.radius, f"hit obstacle at s={o.s}: min dist {d:.2f}"
