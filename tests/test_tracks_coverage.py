"""Coverage across all shipped track configs and the paper car parameters
(reference: config/environment/*.yaml, config/models/paper_dynamic_car.yaml)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.controllers.mpc.controllers import (
    _solver_config,
    initial_carry,
    make_mpc_step,
)
from vehicle_control_tpu.environment.track import Track, curvature
from vehicle_control_tpu.models import dynamic_car as dc
from vehicle_control_tpu.utils.config import load_config, project_root


def _cfg(rel):
    return load_config(os.path.join(project_root(), "configs", rel))


@pytest.mark.parametrize("name", ["ippodromo", "shoe", "bean", "gokart"])
class TestAllTracks:
    def test_geometry_sane(self, name):
        track = Track(_cfg(f"environment/{name}.yaml"))
        assert track.length > 50
        s = np.linspace(0, track.length - 0.2, 200)
        k = np.asarray(curvature(track.data, jnp.asarray(s)))
        assert np.all(np.isfinite(k))
        # closed circuit: start and end of centerline coincide
        import vehicle_control_tpu.environment.track as tm

        x0, y0 = tm.position(track.data, jnp.asarray(0.05))
        x1, y1 = tm.position(track.data, jnp.asarray(track.length - 0.15))
        assert np.hypot(float(x1 - x0), float(y1 - y0)) < 2.0


@pytest.mark.parametrize("name", ["shoe", "bean"])
def test_cascaded_drives_on_track(name):
    """Short closed loop on non-ippodromo tracks."""
    import jax

    track = Track(_cfg(f"environment/{name}.yaml"))
    carcfg = _cfg("models/dynamic_car.yaml")
    ctrl = _cfg("controllers/cascaded.yaml")
    ctrl["obstacles"] = False
    ctrl["horizon"], ctrl["horizon_pm"] = 10, 8  # fast CI config
    prob = problems.build_cascaded_problem(carcfg, track, ctrl, "pm")
    step = jax.jit(make_mpc_step(prob, _solver_config(ctrl)))
    carry = initial_carry(prob)
    p = dc.DynamicCarParams.from_config(carcfg)
    temporal, _ = dc.make_transitions(p)
    state = jnp.zeros(8).at[0].set(4.0).at[4].set(1.0)
    for _ in range(30):
        carry, act, info = step(carry, state)
        k = curvature(track.data, state[4])
        state = temporal(state, act, k, 0.05)
    assert float(state[4]) > 4.0
    assert abs(float(state[5])) < 3.5
    assert np.all(np.isfinite(np.asarray(state)))


def test_paper_car_parameters():
    """The paper's car parameters (reference: config/models/paper_dynamic_car.yaml)
    build and drive."""
    import jax

    track = Track(_cfg("environment/ippodromo.yaml"))
    carcfg = _cfg("models/paper_dynamic_car.yaml")
    p = dc.DynamicCarParams.from_config(carcfg)
    assert float(p.m) == 1778.0
    ctrl = _cfg("controllers/cascaded.yaml")
    ctrl["obstacles"] = False
    ctrl["horizon"], ctrl["horizon_pm"] = 8, 6
    prob = problems.build_cascaded_problem(carcfg, track, ctrl, "pm")
    step = jax.jit(make_mpc_step(prob, _solver_config(ctrl)))
    carry = initial_carry(prob)
    temporal, _ = dc.make_transitions(p)
    state = jnp.zeros(8).at[0].set(4.0).at[4].set(1.0)
    for _ in range(15):
        carry, act, info = step(carry, state)
        state = temporal(state, act, curvature(track.data, state[4]), 0.05)
    assert float(state[0]) > 4.5


def test_tire_diagnostics():
    carcfg = _cfg("models/dynamic_car.yaml")
    p = dc.DynamicCarParams.from_config(carcfg)
    x = jnp.asarray([15.0, 0.3, 0.1, 0.05, 10.0, 0.2, 0.01, 1.0])
    u = jnp.asarray([2000.0, 0.0])
    d = dc.diagnostics(x, u, p)
    assert set(d) >= {"Fy_f", "Fy_r", "alpha_f", "slipping_f"}
    # force balance sanity: drive split puts all drive on the front (Xd f=1)
    np.testing.assert_allclose(float(d["Fx_f"] + d["Fx_r"]), 2000.0, rtol=1e-2)
