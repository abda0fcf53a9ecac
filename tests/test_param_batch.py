"""Per-scenario parameter batching (VERDICT r4 #4).

The XLA solver path accepts a DynamicCarParams pytree with leading batch
axes (problems.build_cascaded_problem ``p_override`` +
parallel.make_param_batched_racing_step), so a friction/car sweep is ONE
compile + one vmap.  These tests pin that the batched program produces the
same closed-loop step as building one problem per parameter value (the
only path the reference — and our Pallas kernels — can express).
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.models import dynamic_car as dc
from vehicle_control_tpu.parallel import (
    aligned_carry,
    make_batched_racing_step,
    make_param_batched_racing_step,
)
from vehicle_control_tpu.solvers import ALILQRConfig
from vehicle_control_tpu.utils.config import load_config, project_root

DT = 0.05


def _cfg(rel):
    return load_config(os.path.join(project_root(), "configs", rel))


def _states(track, B, seed=3):
    rng = np.random.default_rng(seed)
    st = np.zeros((B, 8))
    st[:, 0] = 5.0 + rng.uniform(0, 6, B)
    st[:, 4] = rng.uniform(0, float(track.length), B)
    st[:, 5] = rng.uniform(-0.8, 0.8, B)
    return st


@pytest.mark.parametrize("tail", ["none", "pm", "kc"])
def test_param_batched_matches_per_value_builds(ippodromo_track, tail):
    track = ippodromo_track
    if tail == "none":
        ctrl = dict(_cfg("controllers/singletrack.yaml"), obstacles=False)
        ctrl["horizon"] = 8
    elif tail == "kc":
        # also covers the p_override-derived kc wheelbase
        # (problems.py: kc_p = KinematicCarParams(l=p.l))
        ctrl = dict(_cfg("controllers/cascaded_kinematic.yaml"), obstacles=False)
        ctrl["horizon"] = 6
        ctrl["horizon_kc"] = 6
    else:
        ctrl = dict(_cfg("controllers/cascaded.yaml"), obstacles=False)
        ctrl["horizon"] = 6
        ctrl["horizon_pm"] = 6
    carcfg = _cfg("models/dynamic_car.yaml")
    solver_cfg = ALILQRConfig(n_outer=2, n_inner=4, n_alpha=4)
    dtype = jnp.float64  # x64 on CPU: the comparison is then ~exact

    values = [0.8, 1.0, 1.15]
    B = 6  # 2 scenarios per friction value
    states_np = _states(track, B)
    scales = np.asarray([values[i % len(values)] for i in range(B)])

    # --- batched: one program over per-scenario params --------------------
    base = dc.DynamicCarParams.from_config(carcfg)
    pb = dataclasses.replace(
        base,
        mu_f=base.mu_f * jnp.asarray(scales, dtype),
        mu_r=base.mu_r * jnp.asarray(scales, dtype),
    )
    p_batch = jax.tree_util.tree_map(
        lambda f: jnp.broadcast_to(jnp.asarray(f, dtype), (B,)), pb
    )
    step, carry_for = make_param_batched_racing_step(
        carcfg, track, ctrl, tail, solver_cfg, DT, dtype
    )
    states = jnp.asarray(states_np, dtype)
    carries = jax.jit(carry_for)(p_batch, states)
    bc, bs, ba, bi = jax.jit(step)(p_batch, carries, states)
    # second step exercises the warm-start carry too
    bc2, bs2, ba2, _ = jax.jit(step)(p_batch, bc, bs)

    # --- reference: one problem build + compile per friction value --------
    for v in values:
        idx = np.nonzero(scales == v)[0]
        cfg_v = dict(carcfg, env=dict(carcfg["env"], mu=dict(carcfg["env"]["mu"])))
        cfg_v["env"]["mu"]["f"] = float(carcfg["env"]["mu"]["f"]) * v
        cfg_v["env"]["mu"]["r"] = float(carcfg["env"]["mu"]["r"]) * v
        prob_v = problems.build_cascaded_problem(cfg_v, track, ctrl, tail, dtype)
        p_v = dc.DynamicCarParams.from_config(cfg_v)
        temporal, _ = dc.make_transitions(p_v)
        step_v = jax.jit(
            make_batched_racing_step(
                prob_v, solver_cfg, temporal, track.data, DT, 4
            )
        )
        st_v = jnp.asarray(states_np[idx], dtype)
        car_v = aligned_carry(prob_v, st_v, dtype)
        vc, vs, va, vi = step_v(car_v, st_v)
        vc2, vs2, va2, _ = step_v(vc, vs)

        if tail == "kc":
            # the H=12 kc toy is multi-modal: the two traces (literal vs
            # tracer params) compute identical values but associate fp ops
            # differently, and one chaotic lane per seed can land in a
            # DIFFERENT equally-good basin (measured: batched cost 2.693 vs
            # per-value 2.991, both feasible).  Assert per-lane: bitwise-
            # tight match OR an equally-good converged solution.
            da = np.abs(np.asarray(ba)[idx] - np.asarray(va)).max(axis=1)
            cb = np.asarray(bi.cost)[idx]
            cv = np.asarray(vi.cost)
            tight = da < 1e-8
            good = (
                np.asarray(bi.converged)[idx]
                & np.asarray(vi.converged)
                & (cb <= cv + 1e-6 * (1.0 + np.abs(cv)))
            )
            assert np.all(tight | good), (da, cb, cv)
            assert tight.mean() >= 0.5, da
        else:
            np.testing.assert_allclose(
                np.asarray(ba)[idx], np.asarray(va), rtol=1e-9, atol=1e-9
            )
            np.testing.assert_allclose(
                np.asarray(bs)[idx], np.asarray(vs), rtol=1e-9, atol=1e-9
            )
            np.testing.assert_allclose(
                np.asarray(ba2)[idx], np.asarray(va2), rtol=1e-7, atol=1e-8
            )
            np.testing.assert_allclose(
                np.asarray(bs2)[idx], np.asarray(vs2), rtol=1e-7, atol=1e-8
            )
            np.testing.assert_array_equal(
                np.asarray(bi.converged)[idx], np.asarray(vi.converged)
            )


def test_param_batched_sweep_is_one_compile(ippodromo_track):
    """The whole point: N friction values, ONE jit trace/compile."""
    track = ippodromo_track
    ctrl = dict(_cfg("controllers/singletrack.yaml"), obstacles=False)
    ctrl["horizon"] = 6
    carcfg = _cfg("models/dynamic_car.yaml")
    solver_cfg = ALILQRConfig(n_outer=1, n_inner=2, n_alpha=4)
    dtype = jnp.float32
    B = 8
    values = np.linspace(0.7, 1.3, 8)

    base = dc.DynamicCarParams.from_config(carcfg)
    pb = dataclasses.replace(
        base,
        mu_f=base.mu_f * jnp.asarray(values, dtype),
        mu_r=base.mu_r * jnp.asarray(values, dtype),
    )
    p_batch = jax.tree_util.tree_map(
        lambda f: jnp.broadcast_to(jnp.asarray(f, dtype), (B,)), pb
    )
    step, carry_for = make_param_batched_racing_step(
        carcfg, track, ctrl, "none", solver_cfg, DT, dtype
    )

    traces = {"n": 0}

    def counted(p, c, s):
        traces["n"] += 1
        return step(p, c, s)

    jstep = jax.jit(counted)
    states = jnp.asarray(_states(track, B), dtype)
    carries = jax.jit(carry_for)(p_batch, states)
    c, s, a, i = jstep(p_batch, carries, states)
    c, s, a, i = jstep(p_batch, c, s)  # warm re-dispatch, no retrace
    assert traces["n"] == 1
    assert np.asarray(a).shape == (B, 2)
    assert np.isfinite(np.asarray(s)).all()
