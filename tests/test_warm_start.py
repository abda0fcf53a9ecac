"""Cold-start robustness: physics-informed warm starts for mid-track drops.

Round-1 regression class: a scenario dropped mid-track at speed with the
standing-start carry left the cascaded solver permanently stuck (f32 NaN
gradients at the exact origin through arctan + a diverging pm-tail rollout
outside the fixed iteration budget's basin).  These tests pin both fixes:
the arctan gradient and parallel.aligned_carry's curvature feed-forward.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vehicle_control_tpu.controllers.mpc import problems
from vehicle_control_tpu.models import dynamic_car as dc
from vehicle_control_tpu.parallel import aligned_carry, make_batched_racing_step
from vehicle_control_tpu.solvers import ALILQRConfig
from vehicle_control_tpu.utils.config import load_config, project_root
from vehicle_control_tpu.utils.math import arctan


def test_arctan_gradient_finite_and_correct_at_origin():
    for dtype in (jnp.float32, jnp.float64):
        g = jax.grad(arctan)(dtype(0.0))
        assert np.isfinite(float(g)) and abs(float(g) - 1.0) < 1e-6
    # parity with the library arctan away from the origin
    xs = jnp.asarray(np.linspace(-5, 5, 101), jnp.float64)
    np.testing.assert_allclose(
        np.asarray(arctan(xs)), np.arctan(np.asarray(xs)), atol=1e-10
    )


def test_cascaded_cold_drop_converges(ippodromo_track):
    import os

    track = ippodromo_track
    car = load_config(os.path.join(project_root(), "configs/models/dynamic_car.yaml"))
    cfg = load_config(
        os.path.join(project_root(), "configs/controllers/cascaded.yaml")
    )
    cfg["obstacles"] = False
    prob = problems.build_cascaded_problem(car, track, cfg, "pm", jnp.float32)
    p = dc.DynamicCarParams.from_config(car)
    temporal, _ = dc.make_transitions(p)
    step = jax.jit(
        make_batched_racing_step(
            prob, ALILQRConfig(n_outer=3, n_inner=8), temporal, track.data, 0.05, 4
        )
    )
    B = 8
    rng = np.random.default_rng(0)
    st = np.zeros((B, 8))
    st[:, 0] = 6 + rng.uniform(0, 8, B)
    st[:, 4] = rng.uniform(0, float(track.length), B)
    st[:, 5] = rng.uniform(-1, 1, B)
    states = jnp.asarray(st, jnp.float32)
    carries = aligned_carry(prob, states)
    for _ in range(5):
        carries, states, actions, infos = step(carries, states)
    conv = float(jnp.mean(infos.converged.astype(jnp.float32)))
    assert conv == 1.0, f"cold-drop convergence {conv} < 1.0"
    assert float(jnp.max(infos.violation)) < 1e-2


def test_poisoned_carry_recovers(ippodromo_track):
    """Per-lane failure recovery (ALILQRConfig.recover_viol): a NaN-poisoned
    warm-start carry must yield a finite, safe action and a reset carry, and
    the lane must converge again within a few steps — not zombie forever
    (measured pre-fix: ~2.6% of obstacle-fleet lanes stuck 20+ steps with
    violations of 1e1..1e16)."""
    import os

    track = ippodromo_track
    car = load_config(os.path.join(project_root(), "configs/models/dynamic_car.yaml"))
    cfg = load_config(
        os.path.join(project_root(), "configs/controllers/cascaded.yaml")
    )
    cfg["obstacles"] = False
    prob = problems.build_cascaded_problem(car, track, cfg, "pm", jnp.float32)
    p = dc.DynamicCarParams.from_config(car)
    temporal, _ = dc.make_transitions(p)
    step = jax.jit(
        make_batched_racing_step(
            prob, ALILQRConfig(n_outer=3, n_inner=8), temporal, track.data, 0.05, 4
        )
    )
    B = 4
    st = np.zeros((B, 8))
    st[:, 0] = 8.0
    st[:, 4] = np.linspace(10, 200, B)
    states = jnp.asarray(st, jnp.float32)
    carries = aligned_carry(prob, states)
    # poison lanes 0 and 2: NaN predictions + garbage multipliers (what a
    # diverged solve leaves behind)
    Xp = carries.X_pred.at[0].set(jnp.nan).at[2].mul(1e12)
    Up = carries.U_pred.at[0].set(jnp.nan).at[2].set(50.0)
    lam = carries.lam.at[2].set(1e9)
    carries = type(carries)(Xp, Up, lam)
    for _ in range(4):
        carries, states, actions, infos = step(carries, states)
        assert bool(jnp.all(jnp.isfinite(actions))), "recovery must gate actions"
        assert bool(jnp.all(jnp.isfinite(states))), "plant must never see NaN"
    assert bool(jnp.all(jnp.isfinite(carries.X_pred)))
    conv = float(jnp.mean(infos.converged.astype(jnp.float32)))
    assert conv == 1.0, f"poisoned lanes did not recover: conv {conv}"
